"""Driver-window layout contract (VERDICT r5 items 1 + 10).

The external correctness driver samples the FIRST ~50 registration
positions of ``registry.queries()`` each round, so registration order is
load-bearing. ``registry.WINDOW`` declares the current round's window
explicitly; these tests pin it so a module refactor or import-order
change can't silently rotate a query out of the verified set.
"""

from __future__ import annotations

from us_weather_energy_analysis_pipeline_spark.corpus import registry

# Round-11 must-haves (VERDICT r10 task 2 + ADVICE r10 medium): the two
# queries registered this round (never driver-verified), the full set of
# r10 plan-touched queries whose latest driver row is r9, the two r11
# task targets, then the FULL 41-query cohort whose latest driver row is
# r08 — after this round the union has nothing staler than r9.
ROTATED_R11 = (
    "pii_redact_scrub",
    "url_domain_throttle",
    "gopher_quality_filter",
    "text_repetition_ratio",
    "dedup_pipeline_e2e",
    "embed_dedup_pipeline_e2e",
    "ewma_daily",
    "text_quality_score",
    "dedup_incremental_minhash",
    "above_group_avg",
    "approx_distinct_hll_sanity",
    "bin_quantity_case",
    "bin_quantity_case_low",
    "chi2_weekday_event",
    "corpus_mix_summary",
    "date_spine_completion",
    "decontamination_check",
    "dedup_cluster_assign",
    "dedup_edit_distance",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_substring_spans",
    "dedup_winnow_pairs",
    "dist_percent_rank",
    "distinct_event_types",
    "distinct_kmv_estimate",
    "doc_span_dup_ratio",
    "entropy_user_events",
    "filter_date_set",
    "filtered_agg_status",
    "full_outer_nation_counts",
    "gini_customer_revenue",
    "grouping_sets_flags",
    "histogram_price",
    "locf_gap_fill",
    "markov_event_transitions",
    "multimodal_blob_stats",
    "ntile_deciles",
    "pareto_revenue_concentration",
    "sql_revenue_by_nation",
    "sql_window_rank",
    "stratified_sample_hash",
    "streak_islands",
    "text_tfidf_topk",
    "text_winnow_fingerprint",
    "token_budget_packing",
    "top_k_orders",
    "union_slices",
    "zscore_outliers",
)

# Declared tail at positions 50+: r9-green driver rows rewritten by the
# r10 cogroup kernel — at driver SF they run the single-block fast path,
# so the kernel is pinned by local pytest probes + the plan-shape test
# rather than the driver sample; the r8-stale cohort takes priority.
DISPLACED_R11 = (
    "lag_diff_pct",
    "yoy_monthly",
    "dedup_minhash_lsh",
    "rfm_segments",
    "embed_ivf_topk",
    "embed_ivf_multiprobe_topk",
    "embed_nearest_centroid_assign",
    "embed_hard_negative_mine",
)


def test_window_occupies_leading_positions():
    order = list(registry.queries())
    assert order[: len(registry.WINDOW)] == list(registry.WINDOW)


def test_displaced_r11_tail_the_window():
    assert registry.WINDOW[len(ROTATED_R11):] == DISPLACED_R11


def test_rotated_r11_sit_in_driver_window():
    positions = {n: i for i, n in enumerate(registry.queries())}
    stragglers = {
        n: positions.get(n) for n in ROTATED_R11 if positions.get(n, 99) >= 50
    }
    assert not stragglers, f"outside driver window (first 50): {stragglers}"
    assert list(registry.WINDOW[: len(ROTATED_R11)]) == list(ROTATED_R11)


def test_window_has_no_duplicates_and_all_registered():
    assert len(set(registry.WINDOW)) == len(registry.WINDOW)
    names = set(registry.queries())
    assert set(registry.WINDOW) <= names
    # every rotated query stays oracle-twinned
    oracles = registry.oracle_sql()
    missing = [n for n in ROTATED_R11 if n not in oracles]
    assert not missing, f"rotated queries lost their oracle twin: {missing}"


def test_registry_complete_143():
    assert len(registry.queries()) >= 143
