"""Adaptive exact-quantile operator: both dispatch paths must agree with
Spark's built-in percentile (== DuckDB quantile_cont interpolation)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from us_weather_energy_analysis_pipeline_spark.operators.quantile import (
    exact_quantiles,
)

FRACS = [0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0]


@pytest.fixture(scope="module")
def values(spark):
    # duplicates, negatives, a skewed tail — and a null that must be dropped
    rows = [(float(x % 97),) for x in range(3000)] + [
        (-5.0,),
        (1e6,),
        (1e6,),
        (None,),
    ]
    return spark.createDataFrame(rows, "x double")


def _builtin(df):
    arr = df.agg(
        F.percentile("x", F.array(*[F.lit(f) for f in FRACS])).alias("qs")
    ).collect()[0]["qs"]
    return dict(zip(FRACS, arr))


def test_small_path_matches_builtin(values):
    got = {
        r["f"]: r["q"]
        for r in exact_quantiles(values, "x", FRACS, small_threshold=10**6).collect()
    }
    want = _builtin(values)
    assert got.keys() == want.keys()
    for f in FRACS:
        assert got[f] == pytest.approx(want[f], abs=1e-9), f


def test_distributed_path_matches_builtin(values):
    """small_threshold=0 forces the literal-boundary rank path."""
    got = {
        r["f"]: r["q"]
        for r in exact_quantiles(
            values, "x", FRACS, num_partitions=8, small_threshold=0
        ).collect()
    }
    want = _builtin(values)
    assert got.keys() == want.keys()
    for f in FRACS:
        assert got[f] == pytest.approx(want[f], abs=1e-9), f


def test_empty_and_single_value(spark):
    empty = spark.createDataFrame([], "x double")
    assert exact_quantiles(empty, "x", [0.5]).count() == 0
    one = spark.createDataFrame([(42.0,)], "x double")
    for thr in (0, 10):
        got = exact_quantiles(one, "x", [0.0, 0.5, 1.0], small_threshold=thr).collect()
        assert {r["q"] for r in got} == {42.0}


def test_nan_values_quantile_parity_small_vs_distributed(spark):
    """r6 (quantile twin of the rank NaN fix): NaN values order above
    every finite value on both engines' sorts; np.quantile would poison
    every fraction to NaN on the small path while the distributed path
    interpolates by rank. Both paths must agree: finite quantiles at
    low fractions, NaN only where the rank window touches NaN."""
    import math

    from us_weather_energy_analysis_pipeline_spark.operators.quantile import (
        exact_quantiles,
    )

    rows = [(float(v),) for v in range(1, 10)] + [(float("nan"),), (float("nan"),)]
    df = spark.createDataFrame(rows, "x double")
    fr = [0.0, 0.25, 0.5, 0.8, 1.0]
    small = {r["f"]: r["q"] for r in exact_quantiles(df, "x", fr).collect()}
    dist = {
        r["f"]: r["q"]
        for r in exact_quantiles(df, "x", fr, small_threshold=0).collect()
    }
    assert set(small) == set(dist) == set(fr)
    for f in fr:
        a, b = small[f], dist[f]
        assert (a == b) or (math.isnan(a) and math.isnan(b)), (f, a, b)
    # low fractions are finite (9 finite values of 11 → f<=0.8 finite)
    assert not math.isnan(small[0.5])
    assert math.isnan(small[1.0])


def test_infinite_values_exact_integer_ranks(spark):
    """ADVICE r6: at integer ranks over ±inf both paths must return inf
    (DuckDB quantile_cont parity), not inf + 0*(inf-inf) = NaN."""
    import math

    rows = [(float("-inf"),), (1.0,), (2.0,), (float("inf"),)]
    df = spark.createDataFrame(rows, "x double")
    # fractions hitting exact integer ranks 0 and 3, plus an interior one
    fracs = [0.0, 1.0 / 3.0, 1.0]
    for small_threshold in (10_000, 0):  # small path, then distributed
        got = {
            r["f"]: r["q"]
            for r in exact_quantiles(
                df, "x", fracs, small_threshold=small_threshold
            ).collect()
        }
        assert got[0.0] == float("-inf"), small_threshold
        assert got[1.0] == float("inf"), small_threshold
        assert math.isfinite(got[1.0 / 3.0]), small_threshold
