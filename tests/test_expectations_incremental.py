"""Tests: declarative expectations (one-pass rule suite) and incremental
daily-rollup maintenance (high-water-mark upsert)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from us_weather_energy_analysis_pipeline_spark.plans.incremental import (
    incremental_daily_rollup,
)
from us_weather_energy_analysis_pipeline_spark.quality.expectations import (
    check,
    in_range,
    matches,
    non_negative,
    not_null,
    unique_key,
)


def test_expectations_one_pass(spark):
    df = spark.createDataFrame(
        [
            (1, "New York", 75.0, 12.0),
            (2, "Chicago", None, -3.0),     # null temp, negative energy
            (3, "chicago!", 200.0, 5.0),    # bad name, out-of-range temp
            (3, "Houston", 80.0, 8.0),      # duplicate id
        ],
        "id long, city string, temp double, energy double",
    )
    report = check(
        df,
        [
            not_null("temp"),
            in_range("temp", -50, 130),
            non_negative("energy"),
            matches("city", r"^[A-Z][A-Za-z ]+$"),
            unique_key(df, ["id"]),
        ],
    )
    assert report["__total_rows"] == 4
    assert report["not_null_temp"]["violations"] == 1
    assert report["in_range_temp"]["violations"] == 1   # null doesn't violate
    assert report["non_negative_energy"]["violations"] == 1
    assert report["matches_city"]["violations"] == 1
    assert report["unique_key_id"]["violations"] == 2   # both dup rows flagged
    assert report["__all_passed"] is False

    clean = df.filter("id = 1")
    assert check(clean, [not_null("temp"), non_negative("energy")])["__all_passed"]


def test_incremental_rollup_high_water(spark, tmp_path):
    out = str(tmp_path / "rollup")
    schema = "ts timestamp, city string, value double"
    d = dt.datetime

    day1 = [(d(2024, 1, 1, h), "A", 1.0) for h in range(3)]
    day2_partial = [(d(2024, 1, 2, 0), "A", 5.0)]
    src1 = spark.createDataFrame(day1 + day2_partial, schema)
    assert incremental_daily_rollup(spark, src1, out) == 2
    first = {
        r["day"]: r["daily_total"] for r in spark.read.parquet(out).collect()
    }
    assert first[dt.date(2024, 1, 1)] == 3.0
    assert first[dt.date(2024, 1, 2)] == 5.0

    # next run: day 2 completed + day 3 new; day 1 untouched (filtered out
    # BEFORE the aggregation — only days >= high-water recompute)
    day2_full = day2_partial + [(d(2024, 1, 2, h), "A", 5.0) for h in range(1, 3)]
    day3 = [(d(2024, 1, 3, 0), "A", 7.0)]
    src2 = spark.createDataFrame(day1 + day2_full + day3, schema)
    assert incremental_daily_rollup(spark, src2, out) == 3
    final = {
        r["day"]: (r["daily_total"], r["n_rows"])
        for r in spark.read.parquet(out).collect()
    }
    assert final[dt.date(2024, 1, 1)] == (3.0, 3)
    assert final[dt.date(2024, 1, 2)] == (15.0, 3)  # reprocessed, now complete
    assert final[dt.date(2024, 1, 3)] == (7.0, 1)
