"""Driver-window layout contract (VERDICT r5 items 1 + 10).

The external correctness driver samples the FIRST ~50 registration
positions of ``registry.queries()`` each round, so registration order is
load-bearing. ``registry.WINDOW`` declares the current round's window
explicitly; these tests pin it so a module refactor or import-order
change can't silently rotate a query out of the verified set.
"""

from __future__ import annotations

from us_weather_energy_analysis_pipeline_spark.corpus import registry

# Round-8 must-haves: the never-verified new registration, the five
# r04-stale stragglers the r7 rotation owed, and every query whose plan
# the r8 rewrites touched (tfidf/winnow/ngram/cluster/pipeline, the
# rank-gate family, the similarity query-block gates, the span and spine
# plan changes).
ROTATED_R8 = (
    "bin_quantity_case_low",
    "embed_lsh_multiprobe_topk",
    "embed_ivf_multiprobe_topk",
    "bin_quantity_case",
    "distinct_event_types",
    "filter_date_set",
    "top_k_orders",
    "union_slices",
    "text_tfidf_topk",
    "dedup_winnow_pairs",
    "text_winnow_fingerprint",
    "dedup_ngram_jaccard",
    "dedup_cluster_assign",
    "dedup_pipeline_e2e",
    "embed_dedup_pipeline_e2e",
    "dedup_substring_spans",
    "doc_span_dup_ratio",
    "date_spine_completion",
    "rfm_segments",
    "ntile_deciles",
    "pareto_revenue_concentration",
    "gini_customer_revenue",
    "dist_percent_rank",
    "embed_cosine_topk",
    "embed_ivf_topk",
    "embed_lsh_bucket_topk",
)


def test_window_occupies_leading_positions():
    order = list(registry.queries())
    assert order[: len(registry.WINDOW)] == list(registry.WINDOW)


def test_rotated_r8_sit_in_driver_window():
    positions = {n: i for i, n in enumerate(registry.queries())}
    stragglers = {
        n: positions.get(n) for n in ROTATED_R8 if positions.get(n, 99) >= 50
    }
    assert not stragglers, f"outside driver window (first 50): {stragglers}"
    assert list(registry.WINDOW[: len(ROTATED_R8)]) == list(ROTATED_R8)


def test_window_has_no_duplicates_and_all_registered():
    assert len(set(registry.WINDOW)) == len(registry.WINDOW)
    names = set(registry.queries())
    assert set(registry.WINDOW) <= names
    # every rotated query stays oracle-twinned
    oracles = registry.oracle_sql()
    missing = [n for n in ROTATED_R8 if n not in oracles]
    assert not missing, f"rotated queries lost their oracle twin: {missing}"


def test_registry_complete_128():
    assert len(registry.queries()) >= 128
