"""benchlib measurement primitives — deterministic logic only (the timed
paths run against the shared local session)."""

from __future__ import annotations

from us_weather_energy_analysis_pipeline_spark.benchlib import (
    settled_job_count,
    shuffled_order,
    timed_best,
)


class _LaggyTracker:
    """getJobIdsForGroup that grows between the first polls — the async
    listener-bus lag settled_job_count exists to absorb."""

    def __init__(self, series):
        self.series = list(series)

    def getJobIdsForGroup(self, group):
        n = self.series.pop(0) if len(self.series) > 1 else self.series[0]
        return list(range(n))


def test_settled_job_count_absorbs_listener_lag():
    t = _LaggyTracker([2, 3, 4, 4, 4])
    assert settled_job_count(t, "g", interval=0.0) == 4


def test_settled_job_count_bounded_tries():
    # monotonically growing forever: return the last observation instead
    # of hanging
    t = _LaggyTracker(list(range(1, 100)))
    assert settled_job_count(t, "g", tries=5, interval=0.0) >= 5


def test_shuffled_order_is_deterministic_and_complete():
    names = [f"q{i}" for i in range(40)]
    a = shuffled_order(names)
    b = shuffled_order(names)
    assert a == b and sorted(a) == sorted(names) and a != sorted(names)


def test_timed_best_runs_fn_and_releases_outside_timing(spark):
    calls = {"fn": 0, "after": 0}

    def fn():
        calls["fn"] += 1
        spark.range(10).groupBy().count().write.format("noop").mode(
            "overwrite"
        ).save()

    def after():
        calls["after"] += 1

    tracker = spark.sparkContext.statusTracker()
    best, jobs = timed_best(spark, tracker, "benchlib-test", fn, runs=2, after_run=after)
    assert calls == {"fn": 2, "after": 2}
    assert best > 0 and jobs >= 1
