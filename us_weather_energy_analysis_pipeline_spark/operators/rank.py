"""Range-partitioned EXACT global order statistics — rank / ntile /
cumulative sum with NO single-partition sort anywhere in the plan.

A global ``Window.orderBy(...)`` (ntile, row_number, running sum over a
whole table) funnels every row into ONE task — the classic 100 TB
straggler (Spark logs ``WindowExec: No Partition Defined`` for exactly
this reason). This operator computes the same results with a parallel
sort, the same two-pass trick as ``operators/quantile.py``:

1. bin boundaries come from ONE driver-side ``approxQuantile`` over the
   (direction-adjusted) sort key(s) and are baked into the plan as
   literals, so the bin id is a pure function of the key — no reliance
   on exchange reuse between plan branches. This is the ONLY driver
   action; everything else stays lazy in one plan;
2. per-bin row counts (and, when requested, per-bin value sums) are
   aggregated map-side into a ≤num_bins-row table; prefix offsets over
   the bins come from a bins×bins triangular self-join on that tiny
   table — in-plan, broadcast-sized, no driver collect and no
   unpartitioned window;
3. within each bin a PARTITIONED window (partitionBy bin) assigns
   ``row_number`` / running sums; global rank = bin offset + local rank.

Cumulative sums are computed over LONG columns (callers pre-scale
rounded decimals to integer cents) so the bin-parallel partial sums are
exactly associative — bit-identical to a sequential scan, no float
reordering hazard.

Reference parity: the reference has no distribution profiler at all
(``src/analysis.py:6-67`` stops at mean/median/OLS); these are the
corpus-statistics idioms (Pareto, Gini, NTILE segmentation) re-expressed
for Spark's execution model.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass, field
from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_BINS = 32


@dataclass
class OrderSpec:
    """One global ordering: ``key`` (numeric or castable to double; for
    timestamps pass e.g. ``F.unix_micros(col)``) in the given direction,
    ties broken by ``tiebreaks`` ascending."""

    key: Column | str
    ascending: bool = True
    tiebreaks: tuple[str, ...] = ()
    out_col: str = "ntile"
    cum_cols: tuple[str, ...] = field(default_factory=tuple)

    def sort_key(self) -> Column:
        sk = F.col(self.key) if isinstance(self.key, str) else self.key
        sk = sk.cast("double")
        return sk if self.ascending else -sk


def _pid_expr(sk_name: str, cuts: list[float]) -> Column:
    return reduce(
        lambda acc, b: acc + (F.col(sk_name) > F.lit(float(b))).cast("int"),
        sorted(set(cuts)),
        F.lit(0),
    )


def _attach_rank(
    df: DataFrame,
    stats_src: DataFrame,
    i: int,
    spec: OrderSpec,
    rank_col: str,
    n_col: str | None,
    tot: bool,
) -> DataFrame:
    """Assuming ``_sk{i}``/``_pid{i}`` are present, append the exact
    global rank (+ running sums / totals) for one ordering. Offsets come
    from a triangular self-join over the ≤num_bins-row per-bin stats —
    all in-plan, broadcast-sized. Bin counts aggregate over
    ``stats_src`` — the (persisted) binned input BEFORE any rank
    attachment — so when several orderings chain, an offsets branch
    never re-executes an earlier ordering's join/window stages."""
    sk, pid = f"_sk{i}", f"_pid{i}"
    aggs = [F.count(F.lit(1)).alias("_cnt")] + [
        F.sum(F.col(c)).cast("long").alias(f"_s_{c}") for c in spec.cum_cols
    ]
    counts = stats_src.groupBy(pid).agg(*aggs)
    a, b = counts.alias("a"), counts.alias("b")
    off_aggs = [F.coalesce(F.sum("b._cnt"), F.lit(0)).alias("_roff")] + [
        F.coalesce(F.sum(f"b._s_{c}"), F.lit(0)).alias(f"_coff_{c}")
        for c in spec.cum_cols
    ]
    off = (
        a.join(b, F.col(f"b.{pid}") < F.col(f"a.{pid}"), "left")
        .groupBy(F.col(f"a.{pid}").alias(pid))
        .agg(*off_aggs)
    )
    out = df.join(F.broadcast(off), pid)
    w = Window.partitionBy(pid).orderBy(
        F.col(sk).asc(), *[F.col(t).asc() for t in spec.tiebreaks]
    )
    out = out.withColumn(
        rank_col, (F.col("_roff") + F.row_number().over(w)).cast("long")
    )
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    for c in spec.cum_cols:
        out = out.withColumn(
            f"{c}_cum", (F.col(f"_coff_{c}") + F.sum(c).over(w_run)).cast("long")
        )
    drop = [sk, pid, "_roff"] + [f"_coff_{c}" for c in spec.cum_cols]
    if n_col or tot:
        tot_aggs = [F.sum("_cnt").alias("_nt")] + [
            F.sum(f"_s_{c}").alias(f"_tt_{c}") for c in spec.cum_cols
        ]
        totals = counts.agg(*tot_aggs)
        out = out.crossJoin(F.broadcast(totals))
        if n_col:
            out = out.withColumn(n_col, F.col("_nt").cast("long"))
        if tot:
            for c in spec.cum_cols:
                out = out.withColumn(f"{c}_tot", F.col(f"_tt_{c}").cast("long"))
        drop += ["_nt"] + [f"_tt_{c}" for c in spec.cum_cols]
    return out.drop(*drop)


def _ntile_from_rank(rank: Column, n: Column, k: int) -> Column:
    """SQL NTILE(k) bucket from a 1-based global rank: the first
    ``n mod k`` buckets get ``ceil(n/k)`` rows, the rest ``floor(n/k)``.
    Pure column arithmetic (double division only, so ANSI mode never
    sees an integral division by zero; the q=0 branch is guarded)."""
    q = F.floor(n / k)
    r = n % k
    head = r * (q + 1)
    big = F.floor((rank - 1) / (q + 1).cast("double")) + 1
    small = r + F.floor((rank - 1 - head) / q.cast("double")) + 1
    return (
        F.when(q == 0, rank)
        .when(rank <= head, big)
        .otherwise(small)
        .cast("int")
    )


def global_order_stats(
    df: DataFrame,
    key: Column | str,
    *,
    ascending: bool = True,
    tiebreaks: Sequence[str] = (),
    cum_cols: Sequence[str] = (),
    num_bins: int = DEFAULT_BINS,
    rank_col: str = "global_rn",
    n_col: str | None = None,
    totals: bool = False,
    persist: bool = True,
) -> DataFrame:
    """Append the exact global 1-based ``rank_col`` (ordered by ``key``
    in the given direction, then ``tiebreaks`` ascending) and, for each
    ``c`` in ``cum_cols`` (must be integer-typed), an exact running sum
    ``{c}_cum`` including the current row. ``n_col`` names an optional
    total-row-count column; ``totals=True`` adds ``{c}_tot`` grand-total
    columns — both broadcast single-row cross joins, not windows.

    ``persist=True`` caches the keyed input before the boundary probe so
    the probe and the final plan share one upstream computation — the
    input here is typically a small aggregate of a huge fact table
    (group-totals, per-doc stats), which is exactly what a production
    job would persist. Pass ``persist=False`` when the caller manages
    caching itself.
    """
    spec = OrderSpec(key, ascending, tuple(tiebreaks), cum_cols=tuple(cum_cols))
    base = df.withColumn("_sk0", spec.sort_key())
    if persist:
        base = base.persist()
    nb = max(2, num_bins)
    cuts = base.stat.approxQuantile("_sk0", [i / nb for i in range(1, nb)], 0.001)
    binned = base.withColumn("_pid0", _pid_expr("_sk0", cuts))
    return _attach_rank(binned, binned, 0, spec, rank_col, n_col, totals)


def global_ntile(
    df: DataFrame,
    key: Column | str,
    k: int,
    *,
    ascending: bool = True,
    tiebreaks: Sequence[str] = (),
    out_col: str = "ntile",
    num_bins: int = DEFAULT_BINS,
    persist: bool = True,
) -> DataFrame:
    """Exact SQL ``NTILE(k)`` over one global order, without the global
    window."""
    return multi_global_ntile(
        df,
        [OrderSpec(key, ascending, tuple(tiebreaks), out_col)],
        k,
        num_bins=num_bins,
        persist=persist,
    )


def multi_global_ntile(
    df: DataFrame,
    specs: Sequence[OrderSpec],
    k: int,
    *,
    num_bins: int = DEFAULT_BINS,
    persist: bool = True,
) -> DataFrame:
    """Exact ``NTILE(k)`` for SEVERAL global orderings over the same
    frame (the RFM shape: recency/frequency/monetary quartiles) with ONE
    driver action: all sort keys are probed in a single multi-column
    ``approxQuantile`` pass, and the per-key rank plumbing (bin counts,
    triangular offsets, partitioned windows) composes lazily into one
    plan."""
    base = df
    for i, s in enumerate(specs):
        base = base.withColumn(f"_sk{i}", s.sort_key())
    if persist:
        base = base.persist()
    nb = max(2, num_bins)
    sk_names = [f"_sk{i}" for i in range(len(specs))]
    all_cuts = base.stat.approxQuantile(
        sk_names, [i / nb for i in range(1, nb)], 0.001
    )
    binned = base
    for i, cuts in enumerate(all_cuts):
        binned = binned.withColumn(f"_pid{i}", _pid_expr(f"_sk{i}", cuts))
    out = binned
    for i, s in enumerate(specs):
        out = _attach_rank(out, binned, i, s, f"_gr{i}", f"_n{i}", False)
        out = out.withColumn(
            s.out_col, _ntile_from_rank(F.col(f"_gr{i}"), F.col(f"_n{i}"), k)
        ).drop(f"_gr{i}", f"_n{i}")
    return out
