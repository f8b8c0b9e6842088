"""Bucketed-grid range join: non-equi [lo, hi) interval matching rewritten
as an EQUI-join on a coarse grid cell + exact refine.

Spark plans a plain ``fact.value BETWEEN range.lo AND range.hi`` join as a
BroadcastNestedLoopJoin — every fact row is tested against every range row
(O(|facts|·|ranges|)), and with a non-broadcastable ranges table it
degrades to a cartesian product. The grid rewrite:

1. each range row explodes to the grid cells its interval overlaps
   (⌈(hi−lo)/grid⌉ rows — pick ``grid`` near the median interval width so
   this stays small);
2. each fact computes its single cell (``floor(value/grid)``);
3. equi-join on the cell — hash-joinable, so Catalyst picks
   BroadcastHashJoin for a small exploded side or a shuffled hash join for
   a big one (co-partitioned, skew-handled by AQE) instead of a nested
   loop;
4. the exact ``lo <= value < hi`` predicate refines cell-local candidates.

A fact meets each overlapping range in exactly one cell (its own), so no
post-join dedup is needed. This is the interval analogue of the as-of
join's time-bucket technique (operators/asof.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _try_inline_bands(
    facts: DataFrame,
    value_col: str,
    ranges: DataFrame,
    lo_col: str,
    hi_col: str,
    threshold: int,
) -> DataFrame | None:
    """Driver-inline path for tiny NON-OVERLAPPING range sets (price
    bands, age buckets — partitions of the number line): collapse the
    join into a codegen'd CASE that maps the value to its band index,
    plus one literal-array ``element_at`` per range column. No join, no
    broadcast exchange, no explode — the query becomes scan→project→agg.

    Profiled at sf0.1 (BENCH_NOTES r5): the 4-band corpus query runs 3×
    faster inline (0.21 s vs 0.62 s) — with so few ranges the grid
    join's fixed costs (local-relation job, explode, broadcast) dominate.

    Returns None (caller falls back to the grid join) when the ranges
    are more than ``threshold`` rows — the same smallness the broadcast
    already assumes, so the bounded collect adds no new scale hazard —
    or when any two intervals overlap (a fact could match several ranges;
    CASE picks one). Null/empty intervals never match in either path and
    are simply dropped from the CASE. Exact duplicate range rows count
    as overlapping and fall back (the join emits one row per duplicate).
    """
    # Plain limit+collect: for a LocalRelation ranges table (the expected
    # case — see session.local_df) this is job-free; for an RDD-backed one
    # the CollectLimit's partition waves are bounded and cheap. A
    # coalesce(1) here — tried for wave-count reasons — hits a
    # multi-second single-task scheduler pathology on parallelized local
    # lists (measured 4.5 s vs 0.05 s, BENCH_NOTES r5); never do that.
    rows = ranges.limit(threshold + 1).collect()
    if len(rows) > threshold:
        return None
    live = [r for r in rows if r[lo_col] is not None and r[hi_col] is not None
            and r[lo_col] < r[hi_col]]
    ordered = sorted(live, key=lambda r: (r[lo_col], r[hi_col]))
    for a, b in zip(ordered, ordered[1:]):
        if b[lo_col] < a[hi_col]:
            return None  # overlapping intervals: multi-match needs the join
    if not ordered:  # no matchable interval: schema-only empty result
        out = facts.filter(F.lit(False))
        for c in ranges.columns:
            out = out.withColumn(c, F.lit(None).cast(ranges.schema[c].dataType))
        return out
    v = F.col(value_col)
    idx = F.when(
        (v >= F.lit(ordered[0][lo_col])) & (v < F.lit(ordered[0][hi_col])),
        F.lit(1),
    )
    for i, r in enumerate(ordered[1:], start=2):
        idx = idx.when((v >= F.lit(r[lo_col])) & (v < F.lit(r[hi_col])), F.lit(i))
    out = facts.withColumn("_band_idx", idx).filter(F.col("_band_idx").isNotNull())
    for c in ranges.columns:
        dt = ranges.schema[c].dataType
        lits = F.array(*[F.lit(r[c]).cast(dt) for r in ordered])
        out = out.withColumn(c, F.element_at(lits, F.col("_band_idx")))
    return out.drop("_band_idx")


def grid_range_join(
    facts: DataFrame,
    value_col: str,
    ranges: DataFrame,
    lo_col: str = "lo",
    hi_col: str = "hi",
    grid: float = 50_000.0,
    broadcast_ranges: bool = True,
    inline_threshold: int = 64,
) -> DataFrame:
    """Inner-join ``facts`` to every range row with
    ``lo <= value < hi``, via the grid-cell equi-join. Returns the fact
    columns plus the range columns (minus the helper cell).

    ``broadcast_ranges`` should stay True while the EXPLODED ranges table
    is small (cells ≈ Σ⌈width/grid⌉); flip it off for huge range tables —
    the equi-join then shuffles both sides on the cell key, which is the
    scalable plan a nested loop can never reach.

    When the ranges table is tiny (≤ ``inline_threshold`` rows) AND its
    intervals don't overlap, the join is inlined into a CASE expression
    instead (see ``_try_inline_bands``); pass ``inline_threshold=0`` to
    force the grid plan.
    """
    if broadcast_ranges and inline_threshold > 0:
        inlined = _try_inline_bands(
            facts, value_col, ranges, lo_col, hi_col, inline_threshold
        )
        if inlined is not None:
            return inlined
    cells = ranges.withColumn(
        "cell",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / grid).cast("long"),
                (F.ceil(F.col(hi_col) / grid) - 1).cast("long"),
            )
        ),
    )
    if broadcast_ranges:
        cells = F.broadcast(cells)
    facted = facts.withColumn(
        "cell", F.floor(F.col(value_col) / grid).cast("long")
    )
    return (
        facted.join(cells, "cell")
        .filter(
            (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
        )
        .drop("cell")
    )
