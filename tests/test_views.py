"""Dashboard-view tests over the synthetic fact table (reference §3.2
views 2-7 as DataFrame plans)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from us_weather_energy_analysis_pipeline_spark.analytics.views import (
    DAY_ORDER,
    filter_view,
    heatmap_view,
    latest_per_city,
    timeseries_view,
    weekend_spans,
)
from us_weather_energy_analysis_pipeline_spark.quality.checks import (
    problem_rows,
    quality_timeseries,
)
from us_weather_energy_analysis_pipeline_spark.sources.datagen import (
    cities_dimension,
    generate_weather_energy,
)


@pytest.fixture(scope="module")
def fact(spark):
    df = generate_weather_energy(spark, "2024-01-01", "2024-03-31").cache()
    df.count()
    yield df
    df.unpersist()


def test_filter_view(fact):
    out = filter_view(fact, "2024-02-01", "2024-02-29", ["Chicago", "Seattle"])
    rows = out.select("city", "date").collect()
    assert {r["city"] for r in rows} == {"Chicago", "Seattle"}
    assert all(dt.date(2024, 2, 1) <= r["date"] <= dt.date(2024, 2, 29) for r in rows)
    assert len(rows) == 29 * 2


def test_latest_per_city_with_dim(spark, fact):
    out = latest_per_city(fact, cities_dimension(spark)).collect()
    assert len(out) == 5
    for r in out:
        assert r["date"] == dt.date(2024, 3, 31)
        assert r["lat"] is not None and r["lon"] is not None
        assert r["energy_pct_change"] is not None


def test_timeseries_all_cities_rollup(fact):
    out = timeseries_view(fact).collect()
    assert len(out) == 91  # one row per day
    # spot-check one day against a manual aggregate
    day = dt.date(2024, 1, 15)
    manual = (
        fact.filter(F.col("date") == day)
        .agg(F.avg("temp_avg_f"), F.sum("energy_demand_gwh"))
        .collect()[0]
    )
    got = next(r for r in out if r["date"] == day)
    assert got["temp_avg_f"] == pytest.approx(manual[0])
    assert got["energy_demand_gwh"] == pytest.approx(manual[1])


def test_timeseries_differenced(fact):
    plain = timeseries_view(fact, city="Phoenix").orderBy("date").collect()
    diffed = timeseries_view(fact, city="Phoenix", differenced=True).orderBy(
        "date"
    ).collect()
    assert len(diffed) == len(plain) - 1
    assert diffed[0]["temp_avg_f"] == pytest.approx(
        plain[1]["temp_avg_f"] - plain[0]["temp_avg_f"]
    )


def test_heatmap_shape_and_fill(fact):
    # Phoenix: warm enough that temps land inside the canonical [50,90+)
    # bins — sub-50 rows dropping out (null bin) is the analysis.py
    # semantic, tested in test_etl_semantics.
    out = heatmap_view(fact, city="Phoenix")
    assert out.columns == ["temp_range", *DAY_ORDER]
    rows = out.collect()
    assert 1 <= len(rows) <= 5
    for r in rows:
        for d in DAY_ORDER:
            assert r[d] is not None  # empty cells filled 0


def test_weekend_spans(fact):
    spans = weekend_spans(fact).collect()
    assert all((r["span_end"] - r["span_start"]).days == 2 for r in spans)
    assert all(r["span_start"].weekday() == 5 for r in spans)  # pandas Sat=5


def test_quality_timeseries_and_problems(fact):
    ts = quality_timeseries(fact)
    assert ts.count() == 91
    total_missing = ts.agg(F.sum("missing_count")).collect()[0][0]
    manual_missing = fact.filter(
        F.col("temp_max_f").isNull()
        | F.col("temp_min_f").isNull()
        | F.col("temp_avg_f").isNull()
        | F.col("energy_demand_gwh").isNull()
    ).count()
    assert total_missing == manual_missing
    probs = problem_rows(fact, limit=10)
    assert probs.count() <= 10
