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


def grid_range_join(
    facts: DataFrame,
    value_col: str,
    ranges: DataFrame,
    lo_col: str = "lo",
    hi_col: str = "hi",
    grid: float = 50_000.0,
    broadcast_ranges: bool = True,
) -> DataFrame:
    """Inner-join ``facts`` to every range row with
    ``lo <= value < hi``, via the grid-cell equi-join. Returns the fact
    columns plus the range columns (minus the helper cell).

    ``broadcast_ranges`` should stay True while the EXPLODED ranges table
    is small (cells ≈ Σ⌈width/grid⌉); flip it off for huge range tables —
    the equi-join then shuffles both sides on the cell key, which is the
    scalable plan a nested loop can never reach.
    """
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
