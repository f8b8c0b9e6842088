"""Sampling-family behavior tests: the A-ES weighted sample must
actually weight (inclusion ∝ w), deterministically."""

from __future__ import annotations

from us_weather_energy_analysis_pipeline_spark.corpus.registry import REGISTRY
from us_weather_energy_analysis_pipeline_spark.corpus.sampling_q import WSAMPLE_K
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
