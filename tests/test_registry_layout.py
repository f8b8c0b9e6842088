"""Driver-window layout contract (VERDICT r5 items 1 + 10).

The external correctness driver samples the FIRST ~50 registration
positions of ``registry.queries()`` each round, so registration order is
load-bearing. ``registry.WINDOW`` declares the round-6 window explicitly;
these tests pin it so a module refactor or import-order change can't
silently rotate a query out of the verified set.
"""

from __future__ import annotations

from us_weather_energy_analysis_pipeline_spark.corpus import registry

# The 24 queries VERDICT r5 demanded fresh driver rows for: the 10
# round-5 additions the driver never sampled + the 14 whose last driver
# row was round 2.
ROTATED_24 = (
    "text_winnow_fingerprint",
    "dedup_winnow_pairs",
    "dedup_substring_spans",
    "doc_span_dup_ratio",
    "corpus_temperature_resample",
    "decontaminate_ngram_overlap",
    "text_zipf_fit",
    "text_heaps_fit",
    "embed_dim_stats",
    "embed_corr_pairs_topk",
    "tpch_q4_order_priority",
    "tpch_q13_custdist",
    "tpch_q14_promo_revenue",
    "tpch_q17_small_qty_revenue",
    "tpch_q19_disjunctive",
    "tpch_q22_dormant_customers",
    "cohort_retention",
    "funnel_conversion",
    "cooccurrence_pairs",
    "grouped_quantiles",
    "moments_skew_kurt",
    "yoy_monthly",
    "trailing_range_7d",
    "argmax_supplier",
)


def test_window_occupies_leading_positions():
    order = list(registry.queries())
    assert order[: len(registry.WINDOW)] == list(registry.WINDOW)


def test_rotated_24_sit_in_driver_window():
    positions = {n: i for i, n in enumerate(registry.queries())}
    stragglers = {n: positions.get(n) for n in ROTATED_24 if positions.get(n, 99) >= 50}
    assert not stragglers, f"outside driver window (first 50): {stragglers}"
    assert list(registry.WINDOW[:24]) == list(ROTATED_24)


def test_window_has_no_duplicates_and_all_registered():
    assert len(set(registry.WINDOW)) == len(registry.WINDOW)
    names = set(registry.queries())
    assert set(registry.WINDOW) <= names
    # every windowed query with an oracle stays oracle-twinned
    oracles = registry.oracle_sql()
    missing = [n for n in ROTATED_24 if n not in oracles]
    assert not missing, f"rotated queries lost their oracle twin: {missing}"


def test_registry_complete_128():
    assert len(registry.queries()) >= 128
