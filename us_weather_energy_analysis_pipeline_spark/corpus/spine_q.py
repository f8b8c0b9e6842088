"""Date-spine corpus: calendar completion and missing-day detection.

The reference completes each city's daily calendar with
``set_index('date').reindex(all_dates)`` (reference ``data_processor.py:10-22``)
— a left outer join from a generated date spine (SURVEY.md J4) — and warns on
missing days via a set difference (J5, ``pipeline.py:42-45``). Both are
expressed fully in-plan here: the spine is ``sequence()``+``explode`` over
bounds computed by an aggregate subquery — no driver-side collect, so the
pattern survives any data range at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_weather_energy_analysis_pipeline_spark.corpus._util import day_spine, iso_day, r2
from us_weather_energy_analysis_pipeline_spark.corpus.registry import load, register



@register(
    "date_spine_completion",
    oracle="""
    WITH bounds AS (
      SELECT CAST(MIN(ts) AS DATE) AS lo, CAST(MAX(ts) AS DATE) AS hi FROM events
    ),
    spine AS (
      SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day FROM bounds
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             SUM(value) AS total, COUNT(*) AS n
      FROM events WHERE event_type IN ('purchase', 'signup') GROUP BY 1, 2
    )
    SELECT strftime(s.day, '%Y-%m-%d') AS day, t.event_type,
           ROUND(d.total, 2) AS total, d.n AS n
    FROM spine s
    CROSS JOIN (SELECT event_type FROM types WHERE event_type IN ('purchase','signup')) t
    LEFT JOIN daily d ON d.day = s.day AND d.event_type = t.event_type
    """,
    tags=("join", "spine", "J4"),
)
def date_spine_completion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar completion (reference J4 `data_processor.py:10-22`): generated
    day spine × key dimension, LEFT JOIN facts — unmatched days surface as
    null-measure rows exactly like pandas reindex.

    Plan (r8): the day bounds AND the key dimension come from ONE
    single-row aggregate over the scan (min/max date + a filtered
    collect_set of the event types), then the grid is two explodes off
    that row — the old separate spine-bounds and types-distinct branches
    (each its own scan + exchange) collapse into it. 6 → ~4 jobs."""
    from us_weather_energy_analysis_pipeline_spark.corpus._util import dround_sql

    e = load(spark, sf_dir, "events")
    # ONE spark.sql statement (r11 build cut — same single-row
    # bounds+types aggregate feeding two explodes, same left join)
    return spark.sql(
        f"""
        WITH bounds AS (
          SELECT min(to_date(ts)) AS lo, max(to_date(ts)) AS hi,
                 array_sort(collect_set(
                   CASE WHEN event_type IN ('purchase', 'signup')
                        THEN event_type END)) AS tps
          FROM {{e}}
        ),
        grid AS (
          SELECT day, explode(tps) AS event_type
          FROM (SELECT explode(sequence(lo, hi, interval 1 day)) AS day, tps
                FROM bounds)
        ),
        daily AS (
          SELECT event_type, to_date(ts) AS day,
                 sum(value) AS total, count(1) AS n
          FROM {{e}} WHERE event_type IN ('purchase', 'signup')
          GROUP BY event_type, to_date(ts)
        )
        SELECT CAST(CAST(day AS DATE) AS STRING) AS day, event_type,
               {dround_sql('total', 2)} AS total, n
        FROM grid LEFT JOIN daily USING (day, event_type)
        """,
        e=e,
    )


@register(
    "missing_days_anti",
    oracle="""
    WITH bounds AS (
      SELECT CAST(MIN(ts) AS DATE) AS lo, CAST(MAX(ts) AS DATE) AS hi FROM events
    ),
    spine AS (
      SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day FROM bounds
    ),
    present AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day FROM events
      WHERE user_id = 3 AND event_type = 'purchase'
    )
    SELECT strftime(s.day, '%Y-%m-%d') AS missing_day
    FROM spine s LEFT JOIN present p ON s.day = p.day
    WHERE p.day IS NULL
    """,
    tags=("join", "anti", "J5"),
)
def missing_days_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Missing-day detection as a left-anti join spine∖facts (reference J5
    `pipeline.py:42-45` set difference of expected vs observed days).
    The per-user slice guarantees a nonempty result at every sf — a 0-row
    pass would be a vacuous check."""
    e = load(spark, sf_dir, "events")
    spine = day_spine(e, "ts")
    present = (
        e.filter((F.col("user_id") == 3) & (F.col("event_type") == "purchase"))
        .select(F.to_date("ts").alias("day"))
        .distinct()
    )
    return spine.join(present, "day", "left_anti").select(
        iso_day("day").alias("missing_day")
    )
