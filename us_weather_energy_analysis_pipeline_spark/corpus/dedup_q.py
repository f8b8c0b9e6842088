"""Deduplication corpus over ``documents`` — exact and near-dup families.

Training-data dedup at 100 TB is shuffle-dominated; each variant here is
built around ONE well-chosen shuffle key:

- exact:       hash of normalized content (one groupBy on the digest);
- n-gram Jaccard: shingle-inverted-index self-join (shuffle on shingle,
  never on the doc pair space);
- MinHash/LSH:  band-bucket join (shuffle on (band, bucket-hash)) so the
  candidate pair space collapses from O(n²) to bucket-local pairs.

Hashes are md5-based so the DuckDB oracle computes bit-identical signatures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_weather_energy_analysis_pipeline_spark.corpus._util import r4
from us_weather_energy_analysis_pipeline_spark.corpus.registry import load, register

SHINGLE_K = 3  # words per shingle
JACCARD_THRESHOLD = 0.2


def word_shingles(df: DataFrame, text_col: str = "text", k: int = SHINGLE_K) -> DataFrame:
    """(doc_id, shingle) distinct pairs: k-word shingles of the lowercased
    text. transform over a 0..n-k index range keeps it all in one codegen
    stage — no UDF, no explode-then-window."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), " ")
    base = df.select("doc_id", toks.alias("t")).filter(F.size("t") >= k)
    idx = F.sequence(F.lit(0), F.size("t") - k)
    shingles = F.transform(idx, lambda i: F.array_join(F.slice("t", i + 1, k), " "))
    return base.select("doc_id", F.explode(shingles).alias("shingle")).distinct()


@register(
    "dedup_exact",
    oracle="""
    WITH fp AS (
      SELECT doc_id, md5(lower(trim(text))) AS fingerprint FROM documents
    )
    SELECT fingerprint,
           MIN(doc_id) AS canonical_doc_id,
           COUNT(*)    AS n_docs,
           COUNT(*) - 1 AS n_dropped
    FROM fp GROUP BY fingerprint
    """,
    tags=("dedup", "exact"),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via content-hash groupBy: canonical = min doc_id per
    digest. One shuffle on the digest; at scale the digest groupBy is
    near-perfectly distributed (hash keys)."""
    d = load(spark, sf_dir, "documents")
    fp = d.select("doc_id", F.md5(F.lower(F.trim(F.col("text")))).alias("fingerprint"))
    return fp.groupBy("fingerprint").agg(
        F.min("doc_id").alias("canonical_doc_id"),
        F.count(F.lit(1)).alias("n_docs"),
        (F.count(F.lit(1)) - 1).alias("n_dropped"),
    )


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(lower(trim(text)), ' ') AS t FROM documents
    ),
    shingles AS (
      SELECT DISTINCT doc_id,
             array_to_string(t[i:i+{SHINGLE_K}-1], ' ') AS shingle
      FROM toks, UNNEST(generate_series(1, len(t) - {SHINGLE_K} + 1)) AS g(i)
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
      FROM shingles a JOIN shingles b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT p.doc_a, p.doc_b,
           ROUND(CAST(p.inter AS DOUBLE) / (sa.n + sb.n - p.inter), 4) AS jaccard
    FROM pairs p
    JOIN sizes sa ON p.doc_a = sa.doc_id
    JOIN sizes sb ON p.doc_b = sb.doc_id
    WHERE CAST(p.inter AS DOUBLE) / (sa.n + sb.n - p.inter) >= {JACCARD_THRESHOLD}
    """,
    tags=("dedup", "jaccard", "ngram"),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by n-gram (word-shingle) Jaccard similarity via a
    shingle inverted index: shuffle on shingle (not on pairs), count
    co-occurrences per pair, |A∪B| = |A|+|B|−|A∩B|. Pairs sharing no
    shingle never materialize — the crucial scale property."""
    d = load(spark, sf_dir, "documents")
    sh = word_shingles(d)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    pairs = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("inter").cast("double") / (F.col("sa.n") + F.col("sb.n") - F.col("inter"))
    return (
        pairs.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .filter(jac >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", r4(jac).alias("jaccard"))
    )
