#!/usr/bin/env python
"""Benchmark runner: executes the corpus at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "corpus_total_sec", "value": N, "unit": "sec",
     "queries": {name: sec, ...}, "sf": 0.1}

Each query is forced end-to-end with a noop sink (full execution, no
driver-side collect cost)."""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from us_weather_energy_analysis_pipeline_spark.benchlib import (
    gc_paydown,
    probe_floor,
    silence_benign_window_warnings,
    shuffled_order,
    timed_best,
    WARMUP_QUERIES,
)
from us_weather_energy_analysis_pipeline_spark.corpus.registry import (
    REGISTRY,
    _ensure_loaded,
)
from us_weather_energy_analysis_pipeline_spark.operators import cache
from us_weather_energy_analysis_pipeline_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    _ensure_loaded()
    spark = get_spark("bench")

    silence_benign_window_warnings(spark)

    # Page-cache warmup: the host occasionally reclaims the guest's page
    # cache (balloon), and a cold parquet read mid-sweep skews one query
    # by disk latency. The whole sf dir is small; read it through once.
    for fn in os.listdir(sf_dir):
        path = os.path.join(sf_dir, fn)
        if fn.endswith(".parquet") and os.path.isfile(path):
            with open(path, "rb") as f:
                while f.read(1 << 22):
                    pass

    # JVM/codegen warmup + Python-worker prewarm (Arrow workers cost a few
    # seconds to spawn once per session; on a long-lived cluster they're warm)
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1000).write.format(
        "noop"
    ).mode("overwrite").save()
    spark.range(100).mapInPandas(lambda it: it, "id long").write.format("noop").mode(
        "overwrite"
    ).save()
    # C2 warmup: tiered compilation of the scan/hash-agg/sort/shuffle/
    # codegen paths takes real executed work, not one tiny noop — measured
    # r7: the floor probe read 0.26 s on a fresh JVM vs 0.17 s after a few
    # warm queries, and min-of-3 per query cannot fix it because all three
    # runs of the EARLY queries land cold. Run a few representative
    # queries once, untimed, so the probe and the sweep start steady-state.
    for _wname in WARMUP_QUERIES:
        if _wname in REGISTRY:
            REGISTRY[_wname].spark_fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            cache.release_all()

    # Empirical per-query scheduling FLOOR (benchlib.probe_floor): a
    # minimal-but-real query through the same plan/schedule/execute
    # path. In local mode every query pays this fixed cost regardless of
    # data volume; on a long-lived cluster it is amortized/overlapped.
    # Reported alongside the raw total so the data-bound cost is visible:
    # value_floor_adjusted = total − floor × n_queries; the probe's job
    # count further divides it into a per-JOB floor (multi-stage dedup
    # pipelines are 9-18 jobs under AQE's stage-by-stage
    # materialization, so per-query alone understates their fixed cost).
    tracker = spark.sparkContext.statusTracker()

    # The floor is re-probed every 20 queries: the host is multi-tenant
    # and its speed drifts 2-3× over minutes — the probe series is the
    # run's own machine-state record (floor_series below), and the
    # reported floor is the median of the series.
    f0, probe_jobs = probe_floor(spark, tracker, sf_dir)
    floor_series = [f0]

    order = shuffled_order(REGISTRY)

    # min-of-3 per query with cache release outside the timed window
    # (benchlib.timed_best), so every run pays its own cache fill
    # (honest accounting) and nothing leaks into later queries' budget
    timings: dict[str, float] = {}
    job_counts: dict[str, int] = {}
    wall0 = time.time()
    for qi, name in enumerate(order):
        if qi and qi % 10 == 0:
            gc_paydown(spark)
        if qi and qi % 20 == 0:
            floor_series.append(probe_floor(spark, tracker, sf_dir, n=1)[0])
        q = REGISTRY[name]

        def _run(q=q):
            q.spark_fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

        best, best_jobs = timed_best(
            spark, tracker, name, _run, after_run=cache.release_all
        )
        timings[name] = round(best, 3)
        job_counts[name] = best_jobs
    wall = round(time.time() - wall0, 3)

    total = round(sum(timings.values()), 3)
    floor_series = [round(f, 3) for f in floor_series]
    floor = sorted(floor_series)[len(floor_series) // 2]  # median
    floor_adj = round(max(0.0, total - floor * len(timings)), 3)
    # Job-aware decomposition: the probe floor is per QUERY of probe_jobs
    # jobs; a query scheduling J jobs pays ~J/probe_jobs × floor of pure
    # per-job latency. Σ over queries gives the job-aware fixed cost —
    # the sharper accounting for the multi-stage dedup pipelines.
    per_job_floor = floor / max(1, probe_jobs)
    total_jobs = sum(job_counts.values())
    floor_adj_jobs = round(max(0.0, total - per_job_floor * total_jobs), 3)
    # Full per-query detail goes to a file; the printed line must stay SHORT
    # (the driver tail-captures stdout — a 106-key JSON line gets truncated
    # and recorded as parsed:null, which is what happened in round 1).
    # sf0.1 is the recorded headline artifact; smoke runs at other SFs
    # write a suffixed file so they can't clobber the committed record
    detail_name = "BENCH_DETAIL.json" if sf == 0.1 else f"BENCH_DETAIL_sf{sf}.json"
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), detail_name
    )
    # sweep id (timestamp + HEAD): every per-query number in the artifact
    # is from THIS one sweep — cross-sweep comparison is invalid on this
    # 2-3×-drift host (same label scripts/bench_vs_duckdb.py stamps into
    # BENCH_NOTES.md, so the two artifacts are attributable)
    import subprocess

    try:
        head = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout.strip() or "unknown"
    except OSError:
        head = "unknown"
    sweep_id = f"{time.strftime('%Y%m%dT%H%M%S')}-{head}"
    with open(detail_path, "w") as f:
        json.dump(
            {
                "sweep_id": sweep_id,
                "metric": "corpus_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "job_counts": job_counts,
                "sf": sf,
                "n_queries": len(timings),
                "floor_sec_per_query": floor,
                "floor_series": floor_series,
                "probe_jobs": probe_jobs,
                "per_job_floor_sec": round(per_job_floor, 4),
                "total_jobs": total_jobs,
                "value_floor_adjusted": floor_adj,
                "value_floor_adjusted_jobs": floor_adj_jobs,
                "wall_sec_sweep": wall,  # all 3 runs/query + probes
            },
            f,
            indent=1,
            sort_keys=True,
        )
    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:10])
    print(
        json.dumps(
            {
                "metric": "corpus_total_sec",
                "value": total,
                "unit": "sec",
                "queries": {k: round(v, 2) for k, v in slowest.items()},
                "sf": sf,
                "n_queries": len(timings),
                "floor_sec_per_query": floor,
                "floor_series": floor_series,
                "per_job_floor_sec": round(per_job_floor, 4),
                "total_jobs": total_jobs,
                "value_floor_adjusted": floor_adj,
                "value_floor_adjusted_jobs": floor_adj_jobs,
                "detail": detail_name,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
