"""Data-quality corpus (reference §2.9 `data_processor.py:87-112`).

The reference's quality check is null counts + outlier counts + freshness,
computed in separate pandas passes; here each report is ONE aggregation pass
(conditional sums), so at 100 TB it is a single scan + single-row reduce.

The driver tables contain no physical nulls, so "missingness" is synthesized
deterministically (value < 1 → treated as missing) — identical CASE logic on
both engines, keeping the null-handling semantics (N3/P11) load-bearing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_weather_energy_analysis_pipeline_spark.corpus._util import iso_day, r2
from us_weather_energy_analysis_pipeline_spark.corpus.registry import load, register

# Fixed anchor so "days since latest" is deterministic (the reference uses
# wall-clock `datetime.now()` at data_processor.py:106 — pinned for replay).
ANCHOR_DAY = "2024-02-15"
OUTLIER_MAX = 90.0


def _flags(e: DataFrame) -> DataFrame:
    """Conditional 0/1 flag columns (reference P11 `app.py:459-461`,
    null-safe via explicit when/otherwise — N3)."""
    v = F.col("value")
    return e.select(
        "event_id",
        "user_id",
        "event_type",
        "ts",
        "value",
        F.when(v < 1, 1).otherwise(0).alias("missing_flag"),
        F.when(v > OUTLIER_MAX, 1).otherwise(0).alias("outlier_flag"),
        F.when(v < 0, 1).otherwise(0).alias("negative_flag"),
    )


@register(
    "quality_report",
    oracle=f"""
    SELECT COUNT(*)                                       AS total_rows,
           CAST(SUM(CASE WHEN value < 1 THEN 1 ELSE 0 END) AS BIGINT)     AS missing_count,
           CAST(SUM(CASE WHEN value > {OUTLIER_MAX} THEN 1 ELSE 0 END) AS BIGINT) AS outlier_count,
           CAST(SUM(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT)     AS negative_count,
           strftime(MAX(ts), '%Y-%m-%d')                  AS latest_day,
           datediff('day', CAST(MAX(ts) AS DATE), DATE '{ANCHOR_DAY}') AS days_since_latest
    FROM events
    """,
    tags=("quality", "A8", "A9", "A10"),
)
def quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass quality report (reference §2.9): row count, missing /
    outlier / negative counts, freshness — one scan, one single-row agg."""
    e = _flags(load(spark, sf_dir, "events"))
    return e.agg(
        F.count(F.lit(1)).alias("total_rows"),
        F.sum("missing_flag").cast("long").alias("missing_count"),
        F.sum("outlier_flag").cast("long").alias("outlier_count"),
        F.sum("negative_flag").cast("long").alias("negative_count"),
        iso_day(F.max("ts")).alias("latest_day"),
        F.datediff(F.lit(ANCHOR_DAY).cast("date"), F.to_date(F.max("ts")))
        .cast("long")
        .alias("days_since_latest"),
    )


@register(
    "quality_daily",
    oracle=f"""
    SELECT strftime(ts, '%Y-%m-%d') AS day,
           CAST(SUM(CASE WHEN value < 1 THEN 1 ELSE 0 END) AS BIGINT)             AS missing_count,
           CAST(SUM(CASE WHEN value > {OUTLIER_MAX} THEN 1 ELSE 0 END) AS BIGINT) AS outlier_count,
           CAST(SUM(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT)             AS negative_count,
           COUNT(*)                                               AS n_rows
    FROM events
    GROUP BY 1
    """,
    tags=("quality", "A7"),
)
def quality_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily quality rollup (reference A7 `compute_quality_timeseries`
    `app.py:453-468`): per-day sums of the three flag columns."""
    e = _flags(load(spark, sf_dir, "events"))
    return (
        # group on the native 4-byte date (map-side combine + narrow
        # shuffle key); the ISO string is formatted on the few hundred
        # post-agg rows, not per input row
        e.groupBy(F.to_date("ts").alias("_d"))
        .agg(
            F.sum("missing_flag").cast("long").alias("missing_count"),
            F.sum("outlier_flag").cast("long").alias("outlier_count"),
            F.sum("negative_flag").cast("long").alias("negative_count"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            iso_day("_d").alias("day"),
            "missing_count",
            "outlier_count",
            "negative_count",
            "n_rows",
        )
    )


@register(
    "problem_rows",
    oracle=f"""
    SELECT event_id, user_id, event_type, ROUND(value, 2) AS value
    FROM events
    WHERE value < 1 OR value > {OUTLIER_MAX} OR value < 0
    ORDER BY event_id
    LIMIT 50
    """,
    tags=("quality", "F5", "O2"),
)
def problem_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Problem-row extraction with deterministic limit (reference F5+O2
    `app.py:552-559`): OR of quality predicates, ordered head(50)."""
    e = load(spark, sf_dir, "events")
    v = F.col("value")
    return (
        e.filter((v < 1) | (v > OUTLIER_MAX) | (v < 0))
        .orderBy("event_id")
        .select("event_id", "user_id", "event_type", r2(v).alias("value"))
        .limit(50)
    )


@register(
    "mean_impute_group",
    oracle="""
    WITH base AS (
      SELECT event_id, event_type,
             CASE WHEN value < 1 THEN NULL ELSE value END AS v
      FROM events
    )
    -- order-independent mean (r7 null-fuzz found a 1-ulp float-sum-order
    -- flip at a 4dp rounding boundary): exact DECIMAL(28,10) sum, cast
    -- the SUM to double, ONE double division — both engines replicate
    SELECT event_id, event_type,
           ROUND(COALESCE(v,
             CAST(SUM(CAST(v AS DECIMAL(28,10))) OVER (PARTITION BY event_type) AS DOUBLE)
               / COUNT(v) OVER (PARTITION BY event_type)), 4) AS value_imputed,
           CASE WHEN v IS NULL THEN 1 ELSE 0 END AS was_imputed
    FROM base
    """,
    tags=("quality", "impute", "N1"),
)
def mean_impute_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group mean imputation (reference N1 `data_processor.py:59-60`):
    the mean is computed over PRESENT values only, per group, via a
    partition window — not a global aggregate (SURVEY §7.3 ordering trap)."""
    from pyspark.sql import Window

    from us_weather_energy_analysis_pipeline_spark.corpus._util import r4

    e = load(spark, sf_dir, "events")
    v = F.when(F.col("value") < 1, F.lit(None).cast("double")).otherwise(F.col("value"))
    base = e.select("event_id", "event_type", v.alias("v"))
    w = Window.partitionBy("event_type")
    # exact decimal sum → double → one division: float AVG's summation
    # order is plan-dependent and flipped a 4dp boundary under null-fuzz
    mean = F.sum(F.col("v").cast("decimal(28,10)")).over(w).cast(
        "double"
    ) / F.count("v").over(w)
    return base.select(
        "event_id",
        "event_type",
        r4(F.coalesce(F.col("v"), mean)).alias("value_imputed"),
        F.when(F.col("v").isNull(), 1).otherwise(0).alias("was_imputed"),
    )
