"""Driver-window layout contract (VERDICT r5 items 1 + 10).

The external correctness driver samples the FIRST ~50 registration
positions of ``registry.queries()`` each round, so registration order is
load-bearing. ``registry.WINDOW`` declares the current round's window
explicitly; these tests pin it so a module refactor or import-order
change can't silently rotate a query out of the verified set.
"""

from __future__ import annotations

from us_weather_energy_analysis_pipeline_spark.corpus import registry

# Round-9 must-haves: the 33 queries whose latest driver row is r06
# (VERDICT r8 task 1 — after this round the whole union is ≤2 rounds
# stale), then every query whose plan the r9 tasks touch (e2e pipeline
# job cuts, rfm expression-build rewrite, distributed ANN probe
# assignment, KMV pre-prune, brute-force fallback schema).
ROTATED_R9 = (
    "doc_chunk_overlap",
    "vocab_prune_df_bounds",
    "text_unigram_logprob",
    "embed_nearest_centroid_assign",
    "embed_hard_negative_mine",
    "dedup_incremental_minhash",
    "json_props_rollup",
    "dates_intersect",
    "argmax_supplier",
    "bigram_topk",
    "cohort_retention",
    "corpus_temperature_resample",
    "decontaminate_ngram_overlap",
    "dedup_embed_cosine",
    "dedup_minhash_lsh",
    "dedup_simhash_pairs",
    "embed_centroid_by_label",
    "embed_corr_pairs_topk",
    "embed_dim_stats",
    "embed_int8_quantize",
    "ewma_daily",
    "funnel_conversion",
    "gopher_quality_filter",
    "map_view_decorated",
    "moments_skew_kurt",
    "range_join_price_band",
    "text_fingerprint",
    "text_heaps_fit",
    "text_lang_id",
    "text_quality_score",
    "text_repetition_ratio",
    "text_token_count",
    "text_zipf_fit",
    "tpch_q13_custdist",
    "tpch_q14_promo_revenue",
    "tpch_q17_small_qty_revenue",
    "tpch_q19_disjunctive",
    "tpch_q22_dormant_customers",
    "tpch_q4_order_priority",
    "trailing_range_7d",
    "yoy_monthly",
    "embed_dedup_pipeline_e2e",
    "dedup_pipeline_e2e",
    "rfm_segments",
    "embed_cosine_topk",
    "embed_ivf_topk",
    "embed_lsh_bucket_topk",
    "embed_lsh_multiprobe_topk",
    "embed_ivf_multiprobe_topk",
    "topk_per_group",
)

# Displaced past the driver's ~50-position sample mid-r9 to admit the
# three new registrations above: r8-green driver rows whose plans the
# r9 commits did not touch (rank.py/similarity.py only; the KMV and
# winnow/ngram probes were measured dead ends, plans unchanged). They
# stay in WINDOW (declared layout) and in the local oracle gate.
DISPLACED_R9 = (
    "distinct_kmv_estimate",
    "dedup_winnow_pairs",
    "dedup_ngram_jaccard",
    "dedup_cluster_assign",
    "tpch_q5_local_supplier",
)


def test_window_occupies_leading_positions():
    order = list(registry.queries())
    assert order[: len(registry.WINDOW)] == list(registry.WINDOW)


def test_displaced_r9_tail_the_window():
    assert registry.WINDOW[len(ROTATED_R9):] == DISPLACED_R9


def test_rotated_r9_sit_in_driver_window():
    positions = {n: i for i, n in enumerate(registry.queries())}
    stragglers = {
        n: positions.get(n) for n in ROTATED_R9 if positions.get(n, 99) >= 50
    }
    assert not stragglers, f"outside driver window (first 50): {stragglers}"
    assert list(registry.WINDOW[: len(ROTATED_R9)]) == list(ROTATED_R9)


def test_window_has_no_duplicates_and_all_registered():
    assert len(set(registry.WINDOW)) == len(registry.WINDOW)
    names = set(registry.queries())
    assert set(registry.WINDOW) <= names
    # every rotated query stays oracle-twinned
    oracles = registry.oracle_sql()
    missing = [n for n in ROTATED_R9 if n not in oracles]
    assert not missing, f"rotated queries lost their oracle twin: {missing}"


def test_registry_complete_128():
    assert len(registry.queries()) >= 128
