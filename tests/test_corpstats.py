"""Property tests for the corpus-statistics queries (corpstats_q):
fits recover planted parameters on synthetic corpora, and the guards
remove degenerate fits instead of dividing by zero."""

from __future__ import annotations

import math
import random
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq
import pandas as pd
import pytest

from us_weather_energy_analysis_pipeline_spark.corpus.registry import (
    REGISTRY,
    _ensure_loaded,
)


def _write_docs(tmpdir: str, docs: list[tuple[int, str]]) -> None:
    pq.write_table(
        pa.Table.from_pandas(
            pd.DataFrame(docs, columns=["doc_id", "text"]), preserve_index=False
        ),
        f"{tmpdir}/documents.parquet",
    )


def _run(spark, name: str, docs: list[tuple[int, str]]):
    _ensure_loaded()
    with tempfile.TemporaryDirectory() as tmpdir:
        _write_docs(tmpdir, docs)
        return REGISTRY[name].spark_fn(spark, tmpdir).collect()


def test_zipf_fit_recovers_planted_slope(spark):
    """A corpus whose token frequencies are constructed as n_r = C·r^s
    must fit zipf_slope ≈ s: freq of rank r token = round(1000·r^-0.8),
    so the log-log regression over the top ranks recovers -0.8 within
    the rounding distortion of small counts."""
    docs, did = [], 0
    toks = []
    for r in range(1, 61):
        n = max(1, round(1000 * r ** -0.8))
        toks.extend([f"w{r:03d}"] * n)
    rng = random.Random(7)
    rng.shuffle(toks)
    # split the token stream over several documents — the fit is
    # corpus-level, document boundaries must not matter
    chunk = len(toks) // 7 + 1
    for i in range(0, len(toks), chunk):
        docs.append((did, " ".join(toks[i : i + chunk])))
        did += 1
    rows = _run(spark, "text_zipf_fit", docs)
    assert len(rows) == 1
    got = rows[0]
    assert got["n_top"] == 60
    assert abs(got["zipf_slope"] - (-0.8)) < 0.05, got["zipf_slope"]


def test_zipf_fit_empty_and_tiny_corpus(spark):
    """Empty corpus and a single-distinct-token corpus (rank variance
    zero would need >= 2 points) both produce zero rows, not NaN."""
    assert _run(spark, "text_zipf_fit", []) == []
    assert _run(spark, "text_zipf_fit", [(1, "aaa aaa aaa")]) == []


def test_heaps_fit_recovers_planted_beta(spark):
    """Documents built so that types(doc) = tokens(doc)^beta exactly
    (beta=0.5: n distinct tokens each repeated n times -> n^2 total)
    must fit heaps_beta ≈ 0.5 and heaps_k ≈ 1."""
    docs = []
    for i, n in enumerate([4, 6, 9, 14, 20, 28]):
        toks = []
        for t in range(n):
            toks.extend([f"d{i}t{t}"] * n)  # n types x n reps = n^2 tokens
        random.Random(i).shuffle(toks)
        docs.append((i, " ".join(toks)))
    rows = _run(spark, "text_heaps_fit", docs)
    assert len(rows) == 1
    got = rows[0]
    assert got["n_docs"] == 6
    assert abs(got["heaps_beta"] - 0.5) < 1e-6, got["heaps_beta"]
    assert abs(got["heaps_k"] - 1.0) < 1e-6, got["heaps_k"]


def test_heaps_fit_zero_variance_guard(spark):
    """All documents the same length -> zero x-variance; the fit row
    must be removed by the shared guard (not a division by zero)."""
    docs = [(i, "alpha beta gamma delta") for i in range(5)]
    assert _run(spark, "text_heaps_fit", docs) == []


def test_embed_dim_stats_known_values(spark):
    """Hand-computable embeddings: per-dim mean/var_pop must match
    closed-form values, one row per dimension."""
    vecs = [[1.0, 0.0, 2.0], [3.0, 0.0, 4.0]]
    with tempfile.TemporaryDirectory() as tmpdir:
        pq.write_table(
            pa.Table.from_pandas(
                pd.DataFrame(
                    {"vec_id": [1, 2], "embedding": vecs}
                ),
                preserve_index=False,
            ),
            f"{tmpdir}/embeddings.parquet",
        )
        _ensure_loaded()
        rows = REGISTRY["embed_dim_stats"].spark_fn(spark, tmpdir).collect()
    got = {r["dim"]: (r["mean_v"], r["var_v"]) for r in rows}
    assert got == {0: (2.0, 1.0), 1: (0.0, 0.0), 2: (3.0, 1.0)}


def test_embed_corr_pairs_planted_correlation(spark):
    """Embeddings with dim1 = dim0 (corr +1) and dim3 = -dim2 (corr -1)
    planted among noise dims must surface those two pairs first, with
    the deterministic (dim_i, dim_j) tie-break between |1.0| ties."""
    rng = random.Random(11)
    vecs = []
    for _ in range(50):
        a, c = rng.uniform(-1, 1), rng.uniform(-1, 1)
        noise = [rng.uniform(-1, 1) for _ in range(4)]
        vecs.append([a, a, c, -c] + noise)
    with tempfile.TemporaryDirectory() as tmpdir:
        pq.write_table(
            pa.Table.from_pandas(
                pd.DataFrame(
                    {"vec_id": range(len(vecs)), "embedding": vecs}
                ),
                preserve_index=False,
            ),
            f"{tmpdir}/embeddings.parquet",
        )
        _ensure_loaded()
        from us_weather_energy_analysis_pipeline_spark.corpus import corpstats_q

        orig = corpstats_q.EMBED_WIDTH
        corpstats_q.EMBED_WIDTH = 8
        try:
            rows = (
                REGISTRY["embed_corr_pairs_topk"].spark_fn(spark, tmpdir).collect()
            )
        finally:
            corpstats_q.EMBED_WIDTH = orig
    assert (rows[0]["dim_i"], rows[0]["dim_j"], rows[0]["corr_ij"]) == (0, 1, 1.0)
    assert (rows[1]["dim_i"], rows[1]["dim_j"], rows[1]["corr_ij"]) == (2, 3, -1.0)
    # noise correlations over 50 samples stay well below the planted ones
    assert all(abs(r["corr_ij"]) < 0.9 for r in rows[2:])


def test_embed_corr_pairs_zero_variance_dim_excluded(spark):
    """A constant dimension (zero variance) has undefined correlation —
    every pair touching it must be absent, exactly like the oracle's
    NULL-corr filter."""
    rng = random.Random(13)
    vecs = [[5.0, rng.uniform(-1, 1), rng.uniform(-1, 1)] for _ in range(20)]
    with tempfile.TemporaryDirectory() as tmpdir:
        pq.write_table(
            pa.Table.from_pandas(
                pd.DataFrame(
                    {"vec_id": range(len(vecs)), "embedding": vecs}
                ),
                preserve_index=False,
            ),
            f"{tmpdir}/embeddings.parquet",
        )
        _ensure_loaded()
        from us_weather_energy_analysis_pipeline_spark.corpus import corpstats_q

        orig = corpstats_q.EMBED_WIDTH
        corpstats_q.EMBED_WIDTH = 3
        try:
            rows = (
                REGISTRY["embed_corr_pairs_topk"].spark_fn(spark, tmpdir).collect()
            )
        finally:
            corpstats_q.EMBED_WIDTH = orig
    assert {(r["dim_i"], r["dim_j"]) for r in rows} == {(1, 2)}
