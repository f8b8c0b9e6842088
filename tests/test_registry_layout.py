"""Driver-window layout contract (VERDICT r5 items 1 + 10).

The external correctness driver samples the FIRST ~50 registration
positions of ``registry.queries()`` each round, so registration order is
load-bearing. ``registry.WINDOW`` declares the current round's window
explicitly; these tests pin it so a module refactor or import-order
change can't silently rotate a query out of the verified set.
"""

from __future__ import annotations

from us_weather_energy_analysis_pipeline_spark.corpus import registry

# Round-10 must-haves (VERDICT r9 task 1): the two queries registered
# this round (never driver-verified), then the FULL 48-query cohort
# whose latest driver row is r07 — after this round the whole 141-query
# union is at most two rounds stale.
ROTATED_R10 = (
    "chunk_dedup_ratio",
    "html_boilerplate_strip",
    "asof_join_last_view",
    "cooccurrence_pairs",
    "corr_pearson",
    "count_distinct_users",
    "cube_priority_status",
    "dates_except",
    "dedup_keep_first",
    "grouped_quantiles",
    "heatmap_pivot",
    "hourly_profile",
    "join_dims_broadcast",
    "join_fact_orders",
    "lag_diff_pct",
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
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier",
    "tpch_q6_forecast_revenue",
    "ts_daily_rollup",
    "tumbling_window_rollup",
    "unit_convert_project",
    "unpivot_measures",
    "user_journey_path",
    "weekday_profile",
)

# Declared tail at positions 50+: r9-green driver rows whose plans the
# r10 tasks touch (ewma_daily window fusion, IVF fallback pre-prune +
# dim hint, ADVICE centroid/hard-negative width fixes) — displaced past
# the driver's ~50-position sample by the never-verified registrations
# and the r7 cohort, which take priority per the VERDICT staleness bar.
# They stay in WINDOW (declared layout) and in the local oracle gate.
DISPLACED_R10 = (
    "ewma_daily",
    "embed_ivf_topk",
    "embed_ivf_multiprobe_topk",
    "embed_nearest_centroid_assign",
    "embed_hard_negative_mine",
)


def test_window_occupies_leading_positions():
    order = list(registry.queries())
    assert order[: len(registry.WINDOW)] == list(registry.WINDOW)


def test_displaced_r10_tail_the_window():
    assert registry.WINDOW[len(ROTATED_R10):] == DISPLACED_R10


def test_rotated_r10_sit_in_driver_window():
    positions = {n: i for i, n in enumerate(registry.queries())}
    stragglers = {
        n: positions.get(n) for n in ROTATED_R10 if positions.get(n, 99) >= 50
    }
    assert not stragglers, f"outside driver window (first 50): {stragglers}"
    assert list(registry.WINDOW[: len(ROTATED_R10)]) == list(ROTATED_R10)


def test_window_has_no_duplicates_and_all_registered():
    assert len(set(registry.WINDOW)) == len(registry.WINDOW)
    names = set(registry.queries())
    assert set(registry.WINDOW) <= names
    # every rotated query stays oracle-twinned
    oracles = registry.oracle_sql()
    missing = [n for n in ROTATED_R10 if n not in oracles]
    assert not missing, f"rotated queries lost their oracle twin: {missing}"


def test_registry_complete_141():
    assert len(registry.queries()) >= 141
