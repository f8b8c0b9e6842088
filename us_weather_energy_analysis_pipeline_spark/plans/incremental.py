"""Incremental view maintenance for the daily rollup — the reference's
realtime mode (`pipeline.py:24-28`) done as true incremental processing:
only days newer than the target's high-water mark are computed and
upserted, instead of recomputing history.

At 100 TB this is the difference between a daily job that scans one day
and one that scans three years. The high-water probe is a max() over the
(partition-pruned) output; the source scan is filtered BEFORE any shuffle.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_weather_energy_analysis_pipeline_spark.operators.upsert import upsert_parquet


def incremental_daily_rollup(
    spark: SparkSession,
    source: DataFrame,
    out_path: str,
    ts_col: str = "ts",
    value_col: str = "value",
    keys: tuple[str, ...] = ("city",),
    reprocess_last_day: bool = True,
) -> int:
    """Maintain a (day, *keys, daily_total, n_rows) parquet table from an
    append-only source: compute only days ≥ the high-water mark and upsert.

    ``reprocess_last_day`` recomputes the newest stored day (it may have
    been partial at the last run) — the batch analogue of a one-day
    watermark. Returns the table's row count after the merge.
    """
    high_water = None
    if os.path.exists(out_path):
        row = spark.read.parquet(out_path).agg(F.max("day").alias("hw")).collect()[0]
        high_water = row["hw"]

    src = source
    if high_water is not None:
        cutoff = F.lit(str(high_water)).cast("date")
        pred = F.to_date(ts_col) >= cutoff if reprocess_last_day else (
            F.to_date(ts_col) > cutoff
        )
        src = src.filter(pred)

    fresh = src.groupBy(F.to_date(ts_col).alias("day"), *keys).agg(
        F.sum(value_col).alias("daily_total"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    return upsert_parquet(spark, out_path, fresh, ["day", *keys])
