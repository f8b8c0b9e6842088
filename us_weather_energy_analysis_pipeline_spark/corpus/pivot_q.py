"""Pivot / resample corpus (reference A1, A2, A6).

The reference's EAV→wide pivot (`data_processor.py:48`), hourly→daily
resample (`data_processor.py:79`) and 2-D heatmap pivot (`analysis.py:59`)
all become ``groupBy(...).pivot(key, explicit_values)`` — passing the value
list avoids the extra distinct-collection job and keeps the column set
stable for the oracle (the DuckDB twin uses FILTER aggregates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_weather_energy_analysis_pipeline_spark.corpus._util import iso_day, r2, r4
from us_weather_energy_analysis_pipeline_spark.corpus.registry import load, register

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")
from us_weather_energy_analysis_pipeline_spark.functions.scalars import (  # noqa: F401
    DAY_ORDER,  # re-export: windows.py and tests import it from here
    DOW_INTS,
)


@register(
    "pivot_eav",
    oracle="""
    SELECT strftime(ts, '%Y-%m-%d') AS day,
           ROUND(AVG(value) FILTER (WHERE event_type = 'click'), 4)    AS click,
           ROUND(AVG(value) FILTER (WHERE event_type = 'error'), 4)    AS error,
           ROUND(AVG(value) FILTER (WHERE event_type = 'purchase'), 4) AS purchase,
           ROUND(AVG(value) FILTER (WHERE event_type = 'signup'), 4)   AS signup,
           ROUND(AVG(value) FILTER (WHERE event_type = 'view'), 4)     AS view
    FROM events
    GROUP BY 1
    """,
    tags=("pivot", "A1"),
)
def pivot_eav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EAV long→wide pivot with mean resolving duplicate (key, attr) pairs
    (reference A1 `data_processor.py:48` groupby.mean().unstack()).
    r14: pivot on the native date key; the ISO string is built on the
    ~day-count pivoted rows, not per event."""
    e = load(spark, sf_dir, "events")
    piv = (
        e.groupBy(F.col("ts").cast("date").alias("_day"))
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.avg("value"))
    )
    return piv.select(
        iso_day("_day").alias("day"),
        *[r4(F.col(t)).alias(t) for t in EVENT_TYPES],
    )


@register(
    "resample_hourly_daily",
    oracle="""
    SELECT user_id, strftime(ts, '%Y-%m-%d') AS day,
           ROUND(SUM(value), 2) AS daily_total,
           COUNT(*) AS n_events
    FROM events
    GROUP BY 1, 2
    """,
    tags=("agg", "A2", "resample"),
)
def resample_hourly_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time resample fine→daily grain (reference A2 `data_processor.py:79`
    resample('D').sum()): plain date-truncated groupBy — partial aggregation
    makes this one map-side combine + small shuffle at any scale. r14:
    the combine keys on the native 4-byte date (narrower shuffle key);
    the ISO string is built per output group."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.col("ts").cast("date").alias("_day"))
        .agg(
            r2(F.sum("value")).alias("daily_total"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "user_id",
            iso_day("_day").alias("day"),
            "daily_total",
            "n_events",
        )
    )


@register(
    "heatmap_pivot",
    oracle="""
    WITH binned AS (
      SELECT CASE WHEN l_quantity >= 40 THEN '40+'
                  WHEN l_quantity >= 30 THEN '30-40'
                  WHEN l_quantity >= 20 THEN '20-30'
                  WHEN l_quantity >= 10 THEN '10-20'
                  ELSE '<10' END AS qty_bin,
             dayname(l_shipdate) AS dow,
             l_extendedprice AS price
      FROM lineitem
    )
    SELECT qty_bin,
           ROUND(COALESCE(AVG(price) FILTER (WHERE dow = 'Monday'), 0), 4)    AS Monday,
           ROUND(COALESCE(AVG(price) FILTER (WHERE dow = 'Tuesday'), 0), 4)   AS Tuesday,
           ROUND(COALESCE(AVG(price) FILTER (WHERE dow = 'Wednesday'), 0), 4) AS Wednesday,
           ROUND(COALESCE(AVG(price) FILTER (WHERE dow = 'Thursday'), 0), 4)  AS Thursday,
           ROUND(COALESCE(AVG(price) FILTER (WHERE dow = 'Friday'), 0), 4)    AS Friday,
           ROUND(COALESCE(AVG(price) FILTER (WHERE dow = 'Saturday'), 0), 4)  AS Saturday,
           ROUND(COALESCE(AVG(price) FILTER (WHERE dow = 'Sunday'), 0), 4)    AS Sunday
    FROM binned
    GROUP BY qty_bin
    """,
    tags=("pivot", "A6", "P10", "P8"),
)
def heatmap_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D heatmap pivot: measure-bin × day-of-week, mean cell, empty cells
    filled 0 (reference A6 `analysis.py:59` unstack(fill_value=0),
    observed=False). Explicit pivot values keep all 7 weekday columns even
    if a weekday is absent in the slice."""
    li = load(spark, sf_dir, "lineitem")
    # pivot on the 1-7 dayofweek int (no per-row EEEE formatting); the
    # int pivot columns are renamed to day names on the 5 post-agg rows
    # via the shared DOW_INTS ↔ DAY_ORDER alignment. ONE spark.sql
    # statement — SQL PIVOT plans exactly like DataFrame .pivot with
    # explicit values (r11 build cut, BENCH_AB.md r11).
    from us_weather_energy_analysis_pipeline_spark.corpus._util import dround_sql

    dow_ints = list(DOW_INTS)
    out_cols = ", ".join(
        f"{dround_sql(f'coalesce(`{i}`, 0.0D)', 4)} AS {d}"
        for i, d in zip(dow_ints, DAY_ORDER)
    )
    return spark.sql(
        f"""
        SELECT qty_bin, {out_cols}
        FROM (
          SELECT CASE WHEN l_quantity >= 40 THEN '40+'
                      WHEN l_quantity >= 30 THEN '30-40'
                      WHEN l_quantity >= 20 THEN '20-30'
                      WHEN l_quantity >= 10 THEN '10-20'
                      ELSE '<10' END AS qty_bin,
                 dayofweek(l_shipdate) AS dow,
                 l_extendedprice AS price
          FROM {{li}}
        )
        PIVOT (avg(price) FOR dow IN ({', '.join(f'{i} AS `{i}`' for i in dow_ints)}))
        """,
        li=li,
    )


@register(
    "hourly_profile",
    oracle="""
    SELECT CAST(hour(ts) AS INTEGER) AS hour_of_day,
           event_type,
           ROUND(AVG(value), 4) AS avg_value,
           COUNT(*) AS n
    FROM events
    GROUP BY 1, 2
    """,
    tags=("agg", "timeseries", "seasonality"),
)
def hourly_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonality profile — the daily-cycle analytics behind
    the reference's U-shaped demand model (`debug_helper.py:301`), as a
    24×type aggregate."""
    e = load(spark, sf_dir, "events")
    return e.groupBy(
        F.hour("ts").alias("hour_of_day"), "event_type"
    ).agg(r4(F.avg("value")).alias("avg_value"), F.count(F.lit(1)).alias("n"))


@register(
    "unpivot_measures",
    oracle="""
    WITH long AS (
      SELECT l_returnflag, 'quantity' AS measure, l_quantity AS val FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'extendedprice', l_extendedprice FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'discount', l_discount FROM lineitem
    )
    SELECT l_returnflag, measure,
           COUNT(*) AS n,
           ROUND(SUM(val), 2) AS total,
           ROUND(AVG(val), 4) AS mean
    FROM long GROUP BY 1, 2
    """,
    tags=("unpivot", "melt", "A1-inverse"),
)
def unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot (the inverse of the A1 EAV pivot) via the native
    DataFrame.unpivot — one pass emits all measure rows (no self-union
    rescans), then a long-form aggregate."""
    li = load(spark, sf_dir, "lineitem")
    # aggregate FIRST (one scan, no 3× row expansion through the
    # exchange), then unpivot the 3-row wide result to long — the long
    # aggregate is algebraically identical because every measure sees the
    # same row set (sum/avg ignore nulls identically in both forms)
    wide = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        r2(F.sum("l_quantity")).alias("tq"),
        r4(F.avg("l_quantity")).alias("mq"),
        r2(F.sum("l_extendedprice")).alias("te"),
        r4(F.avg("l_extendedprice")).alias("me"),
        r2(F.sum("l_discount")).alias("td"),
        r4(F.avg("l_discount")).alias("md"),
    )
    return wide.select(
        "l_returnflag",
        F.expr(
            "stack(3, 'quantity', tq, mq, 'extendedprice', te, me, "
            "'discount', td, md) AS (measure, total, mean)"
        ),
        "n",
    ).select("l_returnflag", "measure", "n", "total", "mean")


@register(
    "user_journey_path",
    oracle="""
    SELECT user_id, strftime(ts, '%Y-%m-%d') AS day,
           string_agg(event_type, '->' ORDER BY ts, event_id) AS path,
           COUNT(*) AS n_steps
    FROM events
    WHERE user_id < 10
    GROUP BY 1, 2
    """,
    tags=("agg", "path", "collect-ordered"),
)
def user_journey_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered event-path aggregation (product-analytics journey strings):
    collect_list gives NO ordering guarantee in a distributed agg, so the
    deterministic construction is collect structs → array_sort → project —
    matching DuckDB's string_agg(... ORDER BY).

    NULL event_type contract (r7 event_type null-fuzz): string_agg skips
    NULL values and returns NULL when ALL values are NULL; array_join
    also skips NULL elements but returns '' for the all-NULL case — the
    count(event_type) gate (non-null count) restores the NULL, without
    the nullif('') trap that would corrupt a genuine empty-string type."""
    e = load(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    steps = F.array_sort(
        F.collect_list(F.struct("ts", "event_id", "event_type"))
    )
    joined = F.array_join(F.transform(steps, lambda s: s["event_type"]), "->")
    return (
        e.groupBy("user_id", iso_day("ts").alias("day"))
        .agg(
            F.when(F.count("event_type") > 0, joined).alias("path"),
            F.count(F.lit(1)).alias("n_steps"),
        )
    )
