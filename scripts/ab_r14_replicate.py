#!/usr/bin/env python
"""Interleaved replicate harness for r14 A/Bs.

Usage: python scripts/ab_r14_replicate.py q1,q2,... [rounds] [k=v ...]

Runs `rounds` interleaved min-of-3 measurements per named query inside ONE
session (same discipline as bench.py: warmup, noop sink, cache release
outside the timed window, floor probes bracketing each round), so paired
numbers share host state. Extra `k=v` args become session conf overrides —
that is the config-A/B entry point (run twice in separate processes, one
with overrides, one without; same query list).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from us_weather_energy_analysis_pipeline_spark.benchlib import (
    WARMUP_QUERIES,
    gc_paydown,
    probe_floor,
    silence_benign_window_warnings,
    timed_best,
)
from us_weather_energy_analysis_pipeline_spark.corpus.registry import (
    REGISTRY,
    _ensure_loaded,
)
from us_weather_energy_analysis_pipeline_spark.operators import cache
from us_weather_energy_analysis_pipeline_spark.session import get_spark


def main() -> None:
    names = sys.argv[1].split(",")
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    extra = dict(a.split("=", 1) for a in sys.argv[3:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    _ensure_loaded()
    spark = get_spark("ab-r14", extra_conf=extra or None)
    silence_benign_window_warnings(spark)
    tracker = spark.sparkContext.statusTracker()

    for fn in os.listdir(sf_dir):
        path = os.path.join(sf_dir, fn)
        if fn.endswith(".parquet") and os.path.isfile(path):
            with open(path, "rb") as f:
                while f.read(1 << 22):
                    pass
    spark.range(100).mapInPandas(lambda it: it, "id long").write.format(
        "noop"
    ).mode("overwrite").save()
    for w in WARMUP_QUERIES:
        if w in REGISTRY:
            REGISTRY[w].spark_fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            cache.release_all()

    results: dict[str, list[float]] = {n: [] for n in names}
    jobs: dict[str, int] = {}
    for r in range(rounds):
        f, pj = probe_floor(spark, tracker, sf_dir, n=1)
        print(f"-- round {r}: floor {f:.3f}s / {pj} jobs", flush=True)
        for name in names:
            q = REGISTRY[name]

            def _run(q=q):
                q.spark_fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()

            best, bj = timed_best(spark, tracker, name, _run, after_run=cache.release_all)
            results[name].append(round(best, 3))
            jobs[name] = bj
            print(f"   {name:38s} {best:6.3f}s  jobs={bj}", flush=True)
        gc_paydown(spark)
    f, pj = probe_floor(spark, tracker, sf_dir, n=1)
    print(f"-- end: floor {f:.3f}s / {pj} jobs")
    print("== summary (min over rounds) ==")
    for name in names:
        series = ",".join(f"{v:.2f}" for v in results[name])
        print(f"{name:38s} min={min(results[name]):6.3f}  jobs={jobs[name]:2d}  series=[{series}]")
    spark.stop()


if __name__ == "__main__":
    main()
