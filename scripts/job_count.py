#!/usr/bin/env python
"""Per-query Spark JOB count + wall time at a given sf — the fixed-cost
profile. At tiny sf, wall ≈ scheduling floor × n_jobs, so a high job
count is the per-query overhead to attack (each job pays plan/schedule
latency even on a warm cluster).

Usage: python scripts/job_count.py [sf_dir] [q1,q2,...]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from us_weather_energy_analysis_pipeline_spark.benchlib import timed_best
from us_weather_energy_analysis_pipeline_spark.corpus.registry import (
    REGISTRY,
    _ensure_loaded,
)
from us_weather_energy_analysis_pipeline_spark.operators import cache
from us_weather_energy_analysis_pipeline_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    _ensure_loaded()
    names = (
        sys.argv[2].split(",") if len(sys.argv) > 2 else sorted(REGISTRY)
    )
    spark = get_spark("job-count")
    sc = spark.sparkContext
    spark.range(100).mapInPandas(lambda it: it, "id long").write.format(
        "noop"
    ).mode("overwrite").save()
    tracker = sc.statusTracker()
    print(f"{'query':34s} {'jobs':>4s} {'sec':>6s}")
    for name in names:
        q = REGISTRY[name]

        def _run(q=q):
            q.spark_fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

        best, jobs = timed_best(
            spark, tracker, name, _run, after_run=cache.release_all
        )
        print(f"{name:34s} {jobs:4d} {best:6.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
