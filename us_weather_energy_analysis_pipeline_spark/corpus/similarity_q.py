"""Similarity-search corpus over ``embeddings`` (array<float>, 64-dim).

Brute-force cosine top-k is the exact baseline: broadcast the (small) query
set, one scan of the corpus, per-query top-k via window rank on the ROUNDED
score so ranking is deterministic across engines. The dot product is a
native higher-order function (``zip_with`` + ``aggregate``) — JVM-side, no
Python. The sub-linear scale paths (IVF cells, hyperplane-LSH buckets)
live in ``operators/similarity.py`` and appear below as
``embed_ivf_topk`` / ``embed_lsh_bucket_topk``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_weather_energy_analysis_pipeline_spark.corpus._util import r6
from us_weather_energy_analysis_pipeline_spark.corpus.registry import load, register
from us_weather_energy_analysis_pipeline_spark.operators.similarity import (
    cosine,  # noqa: F401 — re-exported: the corpus-level vector helpers
    dot,
    norm,
)

N_QUERIES = 10
TOP_K = 5


@register(
    "embed_cosine_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
               WHERE vec_id < {N_QUERIES}),
    scored AS (
      SELECT q.qid, e.vec_id, e.label,
             ROUND(list_cosine_similarity(q.qv::DOUBLE[], e.embedding::DOUBLE[]), 6) AS cosine
      FROM q CROSS JOIN embeddings e
      WHERE e.vec_id <> q.qid
    )
    SELECT qid, vec_id, label, cosine,
           CAST(rnk AS INTEGER) AS rnk
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                   ORDER BY cosine DESC, vec_id ASC) AS rnk
      FROM scored
    )
    WHERE rnk <= {TOP_K}
    """,
    tags=("similarity", "ann", "topk"),
)
def embed_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k (the exact ANN baseline): broadcast the
    query block, scan the corpus once, rank per query on the rounded score
    with vec_id tie-break. At scale: corpus-partition-parallel with a
    per-partition partial top-k folded by the final window."""
    emb = load(spark, sf_dir, "embeddings")
    q = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("qid"),
            F.col("embedding").alias("qv"),
            norm("embedding").alias("_qn"),
        )
    )
    scored = (
        F.broadcast(q)
        .crossJoin(emb.withColumn("_vn", norm("embedding")))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            "label",
            # norms hoisted to per-row projections: per-pair work is only
            # the dot fold — bit-identical quotient, ~3× less interpreted
            # HOF evaluation (these expressions run outside codegen)
            r6(dot("qv", "embedding") / (F.col("_qn") * F.col("_vn"))).alias(
                "cosine"
            ),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("qid", "vec_id", "label", "cosine", "rnk")
    )


@register(
    "embed_centroid_by_label",
    oracle="""
    SELECT label,
           COUNT(*) AS n,
           ROUND(AVG(embedding[1]), 6)  AS dim0_mean,
           ROUND(AVG(embedding[2]), 6)  AS dim1_mean,
           ROUND(AVG(list_aggregate(list_transform(embedding, x -> x * x), 'sum')), 6)
             AS mean_sq_norm
    FROM embeddings
    GROUP BY label
    """,
    tags=("similarity", "vector-agg"),
)
def embed_centroid_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid summary (the reduce step of IVF coarse
    quantization): element means + mean squared norm, all native exprs."""
    emb = load(spark, sf_dir, "embeddings")
    sq_norm = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return emb.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        r6(F.avg(F.element_at("embedding", 1).cast("double"))).alias("dim0_mean"),
        r6(F.avg(F.element_at("embedding", 2).cast("double"))).alias("dim1_mean"),
        r6(F.avg(sq_norm)).alias("mean_sq_norm"),
    )


def _plane_sql_literal(w: list[float]) -> str:
    return "[" + ", ".join(str(x) for x in w) + "]::DOUBLE[]"


def _lsh_oracle(n_planes: int = 6, dim: int = 64, k: int = 3, n_q: int = N_QUERIES) -> str:
    from us_weather_energy_analysis_pipeline_spark.operators.similarity import (
        hyperplanes,
    )

    planes = hyperplanes(n_planes, dim)
    code = " + ".join(
        f"(CASE WHEN list_dot_product(embedding::DOUBLE[], {_plane_sql_literal(w)}) >= 0 "
        f"THEN {2**p} ELSE 0 END)"
        for p, w in enumerate(planes)
    )
    return f"""
    WITH coded AS (
      SELECT vec_id, embedding, CAST({code} AS INTEGER) AS bucket FROM embeddings
    ),
    q AS (SELECT vec_id AS qid, embedding AS qv, bucket FROM coded WHERE vec_id < {n_q}),
    cand AS (
      SELECT q.qid, q.bucket, c.vec_id,
             ROUND(list_cosine_similarity(q.qv::DOUBLE[], c.embedding::DOUBLE[]), 6) AS cosine
      FROM q JOIN coded c USING (bucket)
      WHERE c.vec_id <> q.qid
    )
    SELECT qid, bucket, vec_id, cosine, CAST(rnk AS INTEGER) AS rnk
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                       ORDER BY cosine DESC, vec_id ASC) AS rnk
          FROM cand)
    WHERE rnk <= {k}
    """


@register(
    "embed_lsh_bucket_topk",
    oracle=_lsh_oracle(),
    tags=("similarity", "ann", "lsh"),
)
def embed_lsh_bucket_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH ANN (operators/similarity.lsh_topk): 6-bit
    md5-seeded sign codes → bucket equi-join → exact cosine rank within
    the bucket. The scale path: candidates collapse to bucket-local pairs,
    one shuffle on the code."""
    from us_weather_energy_analysis_pipeline_spark.operators.similarity import lsh_topk

    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    return lsh_topk(emb, q, n_planes=6, dim=64, k=3).select(
        "qid", "bucket", "vec_id", "cosine", "rnk"
    )


@register(
    "embed_ivf_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
               WHERE vec_id < {N_QUERIES}),
    per_dim AS (
      SELECT label, generate_subscripts(embedding, 1) AS pos, unnest(embedding) AS v
      FROM embeddings
    ),
    cent AS (
      SELECT label, pos, AVG(CAST(v AS DOUBLE)) AS m FROM per_dim GROUP BY label, pos
    ),
    cvec AS (SELECT label, list(m ORDER BY pos) AS centroid FROM cent GROUP BY label),
    assign AS (
      SELECT qid, qv, label AS cell FROM (
        SELECT q.qid, q.qv, c.label,
               ROW_NUMBER() OVER (
                 PARTITION BY q.qid
                 ORDER BY ROUND(list_cosine_similarity(q.qv::DOUBLE[], c.centroid), 6) DESC,
                          c.label ASC) AS rn
        FROM q CROSS JOIN cvec c
      ) WHERE rn = 1
    ),
    scored AS (
      SELECT a.qid, a.cell, e.vec_id,
             ROUND(list_cosine_similarity(a.qv::DOUBLE[], e.embedding::DOUBLE[]), 6) AS cosine
      FROM assign a JOIN embeddings e ON e.label = a.cell AND e.vec_id <> a.qid
    )
    SELECT qid, cell, vec_id, cosine, CAST(rnk AS INTEGER) AS rnk
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                       ORDER BY cosine DESC, vec_id ASC) AS rnk
          FROM scored)
    WHERE rnk <= 3
    """,
    tags=("similarity", "ann", "ivf"),
)
def embed_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse-quantized ANN (operators/similarity.ivf_topk): per-label
    centroids → nearest-cell assignment → exact top-3 within the cell.
    Probes 1/n_cells of the corpus; assignment join is broadcast×broadcast."""
    from us_weather_energy_analysis_pipeline_spark.operators.similarity import ivf_topk

    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    return ivf_topk(emb, q, k=3).select("qid", "cell", "vec_id", "cosine", "rnk")


@register(
    "embed_int8_quantize",
    oracle="""
    WITH v AS (
      SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]), x -> x) AS e
      FROM embeddings
    ),
    s AS (
      SELECT vec_id, e,
             127.0 / GREATEST(list_max(list_transform(e, x -> abs(x))), 1e-12)
               AS scale
      FROM v
    ),
    q AS (
      SELECT vec_id, scale,
             list_transform(e, x -> CAST(round(x * scale) AS BIGINT)) AS qv
      FROM s
    )
    SELECT vec_id,
           ROUND(scale, 6)                  AS scale_r,
           CAST(list_sum(qv) AS BIGINT)     AS q_sum,
           CAST(list_min(qv) AS BIGINT)     AS q_min,
           CAST(list_max(qv) AS BIGINT)     AS q_max
    FROM q
    """,
    tags=("similarity", "quantization", "vector"),
)
def embed_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 vector quantization — the storage/ANN preprocessing
    step that shrinks a 100 TB float corpus 4× (8× vs float64) before
    index build: per-vector scale = 127/max|x|, q = round(x·scale)
    ∈ [−127, 127]. Pure higher-order array expressions (transform /
    array_max / aggregate), zero shuffle, embarrassingly parallel.
    Rounding uses the binary half-away-from-zero form (`_util.dround`)
    so both engines emit identical integers; the query returns the
    per-vector audit scalars (scale + quantized sum/min/max), which
    hash-certify every element through the sum without comparing raw
    arrays."""
    from us_weather_energy_analysis_pipeline_spark.corpus._util import dround

    d = load(spark, sf_dir, "embeddings")
    e = F.transform("embedding", lambda x: x.cast("double"))
    amax = F.array_max(F.transform(e, lambda x: F.abs(x)))
    scale = 127.0 / F.greatest(amax, F.lit(1e-12))
    base = d.select("vec_id", e.alias("e"), scale.alias("scale"))
    qv = F.transform("e", lambda x: dround(x * F.col("scale"), 0).cast("long"))
    q = base.select("vec_id", "scale", qv.alias("qv"))
    return q.select(
        "vec_id",
        r6(F.col("scale")).alias("scale_r"),
        F.aggregate("qv", F.lit(0).cast("long"), lambda a, v: a + v).alias("q_sum"),
        F.array_min("qv").cast("long").alias("q_min"),
        F.array_max("qv").cast("long").alias("q_max"),
    )
