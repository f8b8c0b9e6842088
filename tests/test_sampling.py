"""Sampling-family behavior tests: the A-ES weighted sample must
actually weight (inclusion ∝ w), deterministically."""

from __future__ import annotations

from us_weather_energy_analysis_pipeline_spark.corpus.registry import REGISTRY
from us_weather_energy_analysis_pipeline_spark.corpus.sampling_q import (
    WSAMPLE_GROUP_K,
    WSAMPLE_K,
)
from us_weather_energy_analysis_pipeline_spark.session import local_df


def _write_documents(spark, tmp_path, rows):
    sf = str(tmp_path)
    df = local_df(spark, rows, "doc_id long, text string, lang string, source string")
    df.write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    return sf


def test_weighted_sample_favors_heavy_weights(spark, tmp_path):
    """200 docs at weight 97 (len % 97 == 96) vs 200 at weight 1
    (len % 97 == 0): heavy docs hold 99% of total weight, so the 64-row
    A-ES sample should be nearly all heavy — the md5-derived u makes the
    draw deterministic, so the assertion is exact-repeatable, and a
    bound of ≥ 55/64 heavy leaves room for the hash draw's variance
    without letting a uniform (unweighted) sample pass (uniform would
    put ~32 heavy docs in the sample)."""
    rows = [(i, "x" * 96, "en", "s") for i in range(200)]  # w = 97
    rows += [(1000 + i, "y" * 97, "en", "s") for i in range(200)]  # w = 1
    sf = _write_documents(spark, tmp_path, rows)
    got = REGISTRY["weighted_sample_aexpj"].spark_fn(spark, sf).collect()
    assert len(got) == WSAMPLE_K
    weights = {r["doc_id"]: r["w"] for r in got}
    heavy = sum(1 for w in weights.values() if w == 97.0)
    assert heavy >= 55, f"only {heavy}/{WSAMPLE_K} heavy-weight docs sampled"
    # deterministic: a second build returns the identical selection
    again = REGISTRY["weighted_sample_aexpj"].spark_fn(spark, sf).collect()
    assert {r["doc_id"] for r in again} == set(weights)


def test_weighted_sample_by_group_proportional_within_group(spark, tmp_path):
    """Per-group variant: weighting must hold WITHIN each stratum. Two
    languages, each with 150 heavy (w=97) and 150 light (w=1) docs —
    heavy docs carry 99% of each group's weight, so each group's 16-row
    sample should be dominated by heavy docs (≥ 12/16; a uniform sampler
    would pick ~8), every group returns exactly WSAMPLE_GROUP_K rows,
    ranks are 1..k dense, and the draw is exact-repeatable."""
    rows = []
    for g, lang in enumerate(("en", "de")):
        base = 10_000 * (g + 1)
        rows += [(base + i, "x" * 96, lang, "s") for i in range(150)]  # w = 97
        rows += [(base + 500 + i, "y" * 97, lang, "s") for i in range(150)]  # w = 1
    sf = _write_documents(spark, tmp_path, rows)
    got = REGISTRY["weighted_sample_by_group"].spark_fn(spark, sf).collect()
    by_lang: dict = {}
    for r in got:
        by_lang.setdefault(r["lang"], []).append(r)
    assert set(by_lang) == {"en", "de"}
    for lang, members in by_lang.items():
        assert len(members) == WSAMPLE_GROUP_K, (lang, len(members))
        assert sorted(m["rnk"] for m in members) == list(
            range(1, WSAMPLE_GROUP_K + 1)
        )
        heavy = sum(1 for m in members if m["w"] == 97.0)
        assert heavy >= 12, f"{lang}: only {heavy}/{WSAMPLE_GROUP_K} heavy docs"
    again = REGISTRY["weighted_sample_by_group"].spark_fn(spark, sf).collect()
    assert {(r["lang"], r["doc_id"]) for r in again} == {
        (r["lang"], r["doc_id"]) for r in got
    }


def test_weighted_sample_by_group_small_group_returns_all(spark, tmp_path):
    """A stratum smaller than k returns all of its rows (rnk ≤ k never
    pads), and a NULL lang forms its own group on the Spark side —
    Window.partitionBy pools NULLs exactly like the oracle's
    PARTITION BY."""
    rows = [(i, "z" * 10, "fr", "s") for i in range(5)]
    rows += [(100 + i, "z" * 11, None, "s") for i in range(3)]
    sf = _write_documents(spark, tmp_path, rows)
    got = REGISTRY["weighted_sample_by_group"].spark_fn(spark, sf).collect()
    by_lang: dict = {}
    for r in got:
        by_lang.setdefault(r["lang"], []).append(r)
    assert len(by_lang.get("fr", [])) == 5
    assert len(by_lang.get(None, [])) == 3
