"""Similarity search over embedding columns: exact baseline + two
sub-linear scale paths.

- ``brute_force_topk``: broadcast queries × one corpus scan — the exact
  baseline every ANN variant is measured against.
- ``ivf_topk``: inverted-file search — assign each query to its nearest
  coarse cell (centroids from a pretrained/partition-level quantizer),
  search only that cell. The corpus-side shuffle is ONE groupBy on the
  cell id; at 100 TB cells map to partitions, so a query touches
  1/n_cells of the data.
- ``lsh_hyperplane``: random-hyperplane LSH — P sign bits form a bucket
  code; candidates share the exact code. Planes are deterministic
  (md5-seeded, generated driver-side) so any engine recomputes them.

All dot products are native higher-order functions (zip_with+aggregate) —
JVM-side, codegen-friendly, no Python in the scoring loop.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    prod = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prod, F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column | str) -> Column:
    sq = F.transform(a, lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, v: acc + v))


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qv",
) -> DataFrame:
    """Exact cosine top-k: broadcast queries, scan corpus once, rank per
    query (rounded score + id tie-break → deterministic)."""
    from pyspark.sql import Window

    scored = (
        F.broadcast(queries)
        .crossJoin(corpus)
        .filter(F.col(id_col) != F.col(qid_col))
        .select(
            qid_col,
            id_col,
            F.round(cosine(qvec_col, vec_col), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy(qid_col).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


def label_centroids(
    corpus: DataFrame, label_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """Per-cell centroid vectors via posexplode + per-dim mean + re-collect
    (the reduce step of IVF coarse quantization). Returns
    (label, centroid array<double>)."""
    per_dim = corpus.select(
        label_col, F.posexplode(vec_col).alias("pos", "v")
    ).groupBy(label_col, "pos").agg(F.avg(F.col("v").cast("double")).alias("m"))
    return (
        per_dim.groupBy(label_col)
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("s"))
        .select(label_col, F.col("s.m").alias("centroid"))
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    label_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    qid_col: str = "qid",
    qvec_col: str = "qv",
) -> DataFrame:
    """IVF search: nearest centroid per query (ties → smallest label),
    then exact cosine top-k within that cell only.

    Probed fraction = 1/n_cells of the corpus; the assignment join is
    queries × centroids (both tiny, broadcast)."""
    from pyspark.sql import Window

    cents = label_centroids(corpus, label_col, vec_col)
    q_scored = F.broadcast(queries).crossJoin(F.broadcast(cents)).select(
        qid_col,
        qvec_col,
        label_col,
        F.round(cosine(qvec_col, "centroid"), 6).alias("c_sim"),
    )
    w_assign = Window.partitionBy(qid_col).orderBy(
        F.col("c_sim").desc(), F.col(label_col).asc()
    )
    assigned = (
        q_scored.withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select(qid_col, qvec_col, F.col(label_col).alias("cell"))
    )
    in_cell = F.broadcast(assigned).join(
        corpus, (F.col("cell") == F.col(label_col)) & (F.col(id_col) != F.col(qid_col))
    )
    scored = in_cell.select(
        qid_col,
        "cell",
        id_col,
        F.round(cosine(qvec_col, vec_col), 6).alias("cosine"),
    )
    w = Window.partitionBy(qid_col).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return scored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k)


def hyperplanes(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic md5-seeded hyperplanes: w[p][i] ∈ [-127.5, 127.5]
    from the first 2 hex digits of md5(f"{p}:{i}") — any engine (or the
    SQL oracle) regenerates the identical planes."""
    return [
        [
            int(hashlib.md5(f"{p}:{i}".encode()).hexdigest()[:2], 16) - 127.5
            for i in range(dim)
        ]
        for p in range(n_planes)
    ]


def lsh_bucket_code(vec_col: Column | str, planes: list[list[float]]) -> Column:
    """Σ 2^p · [dot(v, w_p) ≥ 0] — the P-bit hyperplane signature."""
    code = F.lit(0)
    for p, w in enumerate(planes):
        d = dot(vec_col, F.array(*[F.lit(x) for x in w]))
        code = code + F.when(d >= 0, F.lit(2**p)).otherwise(F.lit(0))
    return code.cast("int")


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    n_planes: int = 6,
    dim: int = 64,
    k: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    qid_col: str = "qid",
    qvec_col: str = "qv",
) -> DataFrame:
    """Bucketed ANN: candidates share the query's exact P-bit code, ranked
    by exact cosine within the bucket. The candidate join is an equi-join
    on the code — one shuffle, bucket-local pairs only."""
    from pyspark.sql import Window

    planes = hyperplanes(n_planes, dim)
    c_coded = corpus.withColumn("bucket", lsh_bucket_code(vec_col, planes))
    q_coded = queries.withColumn("bucket", lsh_bucket_code(qvec_col, planes))
    cand = F.broadcast(q_coded).join(
        c_coded, on="bucket"
    ).filter(F.col(id_col) != F.col(qid_col))
    scored = cand.select(
        qid_col,
        "bucket",
        id_col,
        F.round(cosine(qvec_col, vec_col), 6).alias("cosine"),
    )
    w = Window.partitionBy(qid_col).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return scored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k)


def cosine_pairs_filter_refine(
    emb: DataFrame,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    margin: float = 1e-6,
) -> DataFrame:
    """All pairs (id_a < id_b) with exact cosine >= threshold, via
    filter-and-refine: a vectorized numpy block product prunes the O(n²)
    pair space down to candidates above ``threshold - margin``, then the
    few survivors are re-scored EXACTLY with the sequential fold formula
    (``cosine()`` above), so the result is bit-identical to evaluating
    every pair — numpy's BLAS summation order differs from the fold only
    at ~1e-15 relative, far inside the margin.

    The filter stage is distributed: each partition multiplies its rows
    against the full broadcast matrix (fine while n·dim floats fit an
    executor — gigabytes at n=1M; beyond that, block candidates by LSH
    bucket first, see ``lsh_topk``). Returns (id_a, id_b, cosine) with the
    raw double cosine — callers round/alias as needed.
    """
    import numpy as np
    import pandas as pd

    spark = emb.sparkSession
    gathered = emb.select(id_col, vec_col).collect()
    ids = np.array([r[0] for r in gathered], dtype=np.int64)
    mat = np.array([list(r[1]) for r in gathered], dtype=np.float64)
    nrm = np.sqrt((mat * mat).sum(axis=1))
    bc = spark.sparkContext.broadcast((ids, mat, nrm))
    cut = threshold - margin

    def gen(batches):
        b_ids, b_mat, b_nrm = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = np.array([list(v) for v in pdf[vec_col]], dtype=np.float64)
            row_ids = pdf[id_col].to_numpy(dtype=np.int64)
            row_nrm = np.sqrt((rows * rows).sum(axis=1))
            cos = (rows @ b_mat.T) / np.outer(row_nrm, b_nrm)
            ii, jj = np.nonzero(cos >= cut)
            a, b = row_ids[ii], b_ids[jj]
            keep = a < b
            yield pd.DataFrame({"id_a": a[keep], "id_b": b[keep]})

    cand = emb.select(id_col, vec_col).mapInPandas(gen, "id_a long, id_b long")
    ea = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    eb = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    return (
        cand.join(ea, "id_a")
        .join(eb, "id_b")
        .withColumn("cosine", cosine("_va", "_vb"))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
