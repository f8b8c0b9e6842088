"""Similarity-search corpus over ``embeddings`` (array<float>, 64-dim).

Brute-force cosine top-k is the exact baseline: broadcast the (small) query
set, one scan of the corpus, per-query top-k via window rank on the ROUNDED
score so ranking is deterministic across engines. The dot product is a
native higher-order function (``zip_with`` + ``aggregate``) — JVM-side, no
Python. The LSH-bucketed variant (scale path) lives in
``operators/similarity.py`` and enters the corpus in a later wave.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_weather_energy_analysis_pipeline_spark.corpus._util import r6
from us_weather_energy_analysis_pipeline_spark.corpus.registry import load, register

N_QUERIES = 10
TOP_K = 5


def dot(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢ·bᵢ via zip_with + aggregate — stays in codegen, no UDF."""
    prod = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prod, F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column | str) -> Column:
    sq = F.transform(a, lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, v: acc + v))


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


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
        .select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qv"))
    )
    scored = (
        F.broadcast(q)
        .crossJoin(emb)
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            "label",
            r6(cosine("qv", "embedding")).alias("cosine"),
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
