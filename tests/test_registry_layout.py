"""Driver-window layout contract (VERDICT r5 items 1 + 10).

The external correctness driver samples the FIRST ~50 registration
positions of ``registry.queries()`` each round, so registration order is
load-bearing. ``registry.WINDOW`` declares the current round's window
explicitly; these tests pin it so a module refactor or import-order
change can't silently rotate a query out of the verified set.
"""

from __future__ import annotations

from us_weather_energy_analysis_pipeline_spark.corpus import registry

# Round-12 must-haves (VERDICT r11 tasks 1/2/3/6/7): the Bloom twin
# registered this round, the two r12 plan-changed queries, the two r11
# post-freeze plan changes (lag_diff_pct, yoy_monthly), the FULL
# 42-query r9-stale cohort, then the head of the r10 frontier
# (tpch_q3's task-3 replicate row) —
# after this round the union has nothing staler than r10.
ROTATED_R12 = (
    "decontaminate_bloom_prefilter",
    "quantile_sketch_sample",
    "weighted_sample_aexpj",
    "pii_redact_scrub",
    "url_domain_throttle",
    "lag_diff_pct",
    "yoy_monthly",
    "argmax_supplier",
    "bigram_topk",
    "cohort_retention",
    "corpus_temperature_resample",
    "dates_intersect",
    "decontaminate_ngram_overlap",
    "dedup_embed_cosine",
    "dedup_minhash_lsh",
    "dedup_simhash_pairs",
    "doc_chunk_overlap",
    "embed_centroid_by_label",
    "embed_corr_pairs_topk",
    "embed_cosine_topk",
    "embed_dim_stats",
    "embed_hard_negative_mine",
    "embed_int8_quantize",
    "embed_ivf_multiprobe_topk",
    "embed_ivf_topk",
    "embed_lsh_bucket_topk",
    "embed_lsh_multiprobe_topk",
    "embed_nearest_centroid_assign",
    "funnel_conversion",
    "json_props_rollup",
    "map_view_decorated",
    "moments_skew_kurt",
    "range_join_price_band",
    "rfm_segments",
    "text_fingerprint",
    "text_heaps_fit",
    "text_lang_id",
    "text_token_count",
    "text_unigram_logprob",
    "text_zipf_fit",
    "topk_per_group",
    "tpch_q13_custdist",
    "tpch_q14_promo_revenue",
    "tpch_q17_small_qty_revenue",
    "tpch_q19_disjunctive",
    "tpch_q22_dormant_customers",
    "tpch_q4_order_priority",
    "trailing_range_7d",
    "vocab_prune_df_bounds",
    "tpch_q3_shipping_priority",
)

# No declared tail this round: the window is exactly the 50 driver
# slots, and everything past it is r10/r11-driver-green with an
# unchanged plan (plan-equality gated for any r12 conversions).
DISPLACED_R12 = ()


def test_window_occupies_leading_positions():
    order = list(registry.queries())
    assert order[: len(registry.WINDOW)] == list(registry.WINDOW)


def test_displaced_r12_tail_the_window():
    assert registry.WINDOW[len(ROTATED_R12):] == DISPLACED_R12


def test_rotated_r12_sit_in_driver_window():
    positions = {n: i for i, n in enumerate(registry.queries())}
    stragglers = {
        n: positions.get(n) for n in ROTATED_R12 if positions.get(n, 99) >= 50
    }
    assert not stragglers, f"outside driver window (first 50): {stragglers}"
    assert list(registry.WINDOW[: len(ROTATED_R12)]) == list(ROTATED_R12)


def test_window_has_no_duplicates_and_all_registered():
    assert len(set(registry.WINDOW)) == len(registry.WINDOW)
    names = set(registry.queries())
    assert set(registry.WINDOW) <= names
    # every rotated query stays oracle-twinned
    oracles = registry.oracle_sql()
    missing = [n for n in ROTATED_R12 if n not in oracles]
    assert not missing, f"rotated queries lost their oracle twin: {missing}"


def test_registry_complete_146():
    assert len(registry.queries()) >= 146
