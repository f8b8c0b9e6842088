"""Driver-window layout contract (VERDICT r5 items 1 + 10).

The external correctness driver samples the FIRST ~50 registration
positions of ``registry.queries()`` each round, so registration order is
load-bearing. ``registry.WINDOW`` declares the current round's window
explicitly; these tests pin it so a module refactor or import-order
change can't silently rotate a query out of the verified set.
"""

from __future__ import annotations

from us_weather_energy_analysis_pipeline_spark.corpus import registry

# Round-13 must-haves (VERDICT r12 tasks 1/2/3): the two queries
# registered this round (perceptual-hash dedup, per-group weighted
# sampling), then the FULL 48-query cohort whose latest driver row is
# r10 — after this round the union has nothing staler than r11.
# (json_props_rollup / topk_per_group are r12-fresh; their weak-list
# replicates are bench recordings, not correctness slots. The r13
# plan-changed queries — decontaminate_bloom_prefilter, the two e2e
# pipelines' hint moves — are locally re-verified and queue for the
# r14 window head.)
ROTATED_R13 = (
    "multimodal_phash_dedup",
    "weighted_sample_by_group",
    "asof_join_last_view",
    "chunk_dedup_ratio",
    "cooccurrence_pairs",
    "corr_pearson",
    "count_distinct_users",
    "cube_priority_status",
    "dates_except",
    "dedup_keep_first",
    "grouped_quantiles",
    "heatmap_pivot",
    "hourly_profile",
    "html_boilerplate_strip",
    "join_dims_broadcast",
    "join_fact_orders",
    "last_per_group",
    "mean_impute_group",
    "missing_days_anti",
    "mode_event_type",
    "monthly_rollup",
    "moving_avg_7d",
    "multimodal_fake_decode",
    "multimodal_frame_sample",
    "ols_by_group",
    "ols_ci_frame",
    "ols_closed_form",
    "pivot_eav",
    "problem_rows",
    "quality_daily",
    "quality_report",
    "quantiles_exact",
    "regexp_normalize",
    "resample_hourly_daily",
    "revenue_share",
    "rollup_revenue",
    "sample_hash_mod",
    "scalar_stats",
    "semi_join_customers",
    "sessionize_gap",
    "skew_salted_agg",
    "tpch_q1_pricing_summary",
    "tpch_q5_local_supplier",
    "tpch_q6_forecast_revenue",
    "ts_daily_rollup",
    "tumbling_window_rollup",
    "unit_convert_project",
    "unpivot_measures",
    "user_journey_path",
    "weekday_profile",
)

# No declared tail this round: the window is exactly the 50 driver
# slots, and everything past it is r11/r12-driver-green (plan changes
# re-verified locally, queued for r14).
DISPLACED_R13 = ()


def test_window_occupies_leading_positions():
    order = list(registry.queries())
    assert order[: len(registry.WINDOW)] == list(registry.WINDOW)


def test_displaced_r13_tail_the_window():
    assert registry.WINDOW[len(ROTATED_R13):] == DISPLACED_R13


def test_rotated_r13_sit_in_driver_window():
    positions = {n: i for i, n in enumerate(registry.queries())}
    stragglers = {
        n: positions.get(n) for n in ROTATED_R13 if positions.get(n, 99) >= 50
    }
    assert not stragglers, f"outside driver window (first 50): {stragglers}"
    assert list(registry.WINDOW[: len(ROTATED_R13)]) == list(ROTATED_R13)


def test_window_has_no_duplicates_and_all_registered():
    assert len(set(registry.WINDOW)) == len(registry.WINDOW)
    names = set(registry.queries())
    assert set(registry.WINDOW) <= names
    # every rotated query stays oracle-twinned
    oracles = registry.oracle_sql()
    missing = [n for n in ROTATED_R13 if n not in oracles]
    assert not missing, f"rotated queries lost their oracle twin: {missing}"


def test_registry_complete_148():
    assert len(registry.queries()) >= 148
