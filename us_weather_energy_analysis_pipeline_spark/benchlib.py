"""Shared measurement primitives for the bench harnesses.

`bench.py`, `scripts/bench_vs_duckdb.py`, `scripts/job_count.py` and
`scripts/bench_subset.py` all follow the same discipline — seeded-shuffle
execution order, min-of-N warm runs with cache release outside the timed
window, a minimal floor probe whose job count converts the per-query
floor into a per-JOB floor, and periodic GC paydown. Keeping the loop in
one place stops the copies drifting (they already had: re-probe cadence,
import placement) and lets methodology fixes land once.

Job counts come from `settled_job_count`, not a raw
``tracker.getJobIdsForGroup`` read: the status store is fed by the ASYNC
listener bus, so an immediate read after an action can miss trailing
jobs on a loaded host — silently deflating the job-aware floor
adjustment. The settle loop re-reads until two consecutive polls agree
(typically one extra 20 ms poll; bounded at ~0.4 s).
"""

from __future__ import annotations

import itertools
import random
import time
from collections.abc import Callable, Iterable

_SEQ = itertools.count()  # unique job-group ids across repeated calls

# C2/steady-state warmup set, shared by bench.py and bench_vs_duckdb.py
# (both engines warm the SAME queries so their numbers stay comparable):
# representative scan/agg/join/window/text paths plus one md5/posting-
# heavy query — without the last, the winnow/minhash family's
# md5+collect_list codegen lands cold and even min-of-3 reads ~2x high
# when those queries draw early order.
WARMUP_QUERIES = (
    "tpch_q1_pricing_summary",
    "join_fact_orders",
    "moving_avg_7d",
    "text_quality_score",
    "dedup_exact",
    "text_winnow_fingerprint",
)


def settled_job_count(tracker, group: str, tries: int = 20, interval: float = 0.02) -> int:
    """Length of ``getJobIdsForGroup(group)`` once stable across two
    consecutive polls (listener-bus lag guard)."""
    prev = len(tracker.getJobIdsForGroup(group))
    for _ in range(tries):
        time.sleep(interval)
        cur = len(tracker.getJobIdsForGroup(group))
        if cur == prev:
            return cur
        prev = cur
    return prev


def shuffled_order(names: Iterable[str], seed: int = 42) -> list[str]:
    """FIXED seeded shuffle of the execution order: alphabetical order
    runs the whole dedup_* family back-to-back, and the GC/allocator
    pressure from one heavy query measurably pollutes its successors.
    A deterministic interleave spreads the heavy hitters; the fixed seed
    keeps rounds comparable."""
    order = sorted(names)
    random.Random(seed).shuffle(order)
    return order


def silence_benign_window_warnings(spark) -> None:
    """Silence the WindowExec unpartitioned-window logger for bench
    recordings. The only unpartitioned windows in the corpus sit on
    calendar-grain aggregates (day/month spine — cardinality bounded by
    the calendar, not data volume), structurally pinned by
    tests/test_plans.py's window-sits-on-daily-series guards, so their
    8 per-sweep warnings are noise; with the logger off, any remaining
    warning in a recording tail is signal (VERDICT r13 task 7 — the
    partition-by-year-bucket alternative would reset rolling windows at
    year boundaries, changing semantics)."""
    try:
        jvm = spark.sparkContext._jvm
        jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
            "org.apache.spark.sql.execution.window.WindowExec",
            jvm.org.apache.logging.log4j.Level.ERROR,
        )
    except Exception:
        pass  # logging backend not log4j2: keep the warnings


def gc_paydown(spark) -> None:
    """Pay down JVM GC debt between queries, not inside a timing: a heavy
    sweep accumulates old-gen garbage (shuffle buffers, released caches)
    and queries measured mid-sweep otherwise read 25-60% over their
    isolated time."""
    spark.sparkContext._jvm.System.gc()


def timed_best(
    spark,
    tracker,
    name: str,
    fn: Callable[[], None],
    runs: int = 3,
    after_run: Callable[[], None] | None = None,
) -> tuple[float, int]:
    """(best seconds, job count of the best run) over ``runs`` executions
    of ``fn`` — min-of-3 by default: run 2 can still execute before C2
    compilation lands for big generated methods (measured 2× steady
    state); run 3 is reliably steady. ``after_run`` (e.g. cache release)
    executes OUTSIDE the timed window so harness bookkeeping is never
    billed to the engine."""
    sc = spark.sparkContext
    best, best_jobs = float("inf"), 0
    call_id = next(_SEQ)
    for run in range(runs):
        grp = f"{name}:{call_id}:{run}"
        sc.setJobGroup(grp, name)
        t0 = time.time()
        fn()
        dt = time.time() - t0
        if after_run is not None:
            after_run()
        if dt < best:
            best = dt
            best_jobs = settled_job_count(tracker, grp)
    return best, best_jobs


def probe_floor(spark, tracker, sf_dir: str, n: int = 3) -> tuple[float, int]:
    """(best seconds, jobs) for a minimal-but-real query (tiny scan →
    agg → noop) through the same plan/schedule/execute path every corpus
    query takes. In local mode every query pays this fixed cost
    regardless of data volume; a long-lived cluster amortizes/overlaps
    it. The probe's job count divides the time into a per-JOB floor —
    AQE materializes each exchange as its own job, so a J-job query pays
    ~J × the per-job floor."""

    def _probe() -> None:
        spark.read.parquet(f"{sf_dir}/region.parquet").groupBy().count().write.format(
            "noop"
        ).mode("overwrite").save()

    best, jobs = timed_best(spark, tracker, "floor-probe", _probe, runs=n)
    return best, max(1, jobs)
