"""Distributed EXACT quantiles — no single-node sort, no single value
buffer.

Spark's built-in ``percentile`` aggregate is exact but funnels every value
into ONE aggregation buffer that is sorted on one task — at 100 TB that is
the job. This operator computes the same linearly-interpolated quantiles
(DuckDB ``quantile_cont`` semantics, reference A10 `data_processor.py:99`
median) with only narrow shuffles, all parallel:

1. range-partition the value column (equal keys stay together);
2. per-partition counts → prefix offsets (a ≤P-row table, broadcast);
3. per-partition ``row_number`` + offset = exact global 0-based rank —
   the sort parallelizes over P partitions instead of one;
4. the 2·|fractions| target ranks (floor/ceil of (n−1)·q) are joined back
   as a broadcast — the full column is never collected anywhere.

Cost: two shuffles of a single column (the range exchange + the window's
hash exchange) and a metadata-sized broadcast. Every stage scales out.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_quantiles(
    df: DataFrame,
    value_col: str,
    fractions: Sequence[float],
    num_partitions: int = 32,
) -> DataFrame:
    """Exact linear-interpolation quantiles of ``value_col``, computed
    distributedly. Returns one row per fraction: (f double, q double).

    Interpolation matches DuckDB quantile_cont / Spark percentile:
    rank = (n-1)·f; q = v[floor] + (rank - floor)·(v[ceil] - v[floor]).
    """
    vals = df.select(F.col(value_col).alias("v")).filter(F.col("v").isNotNull())
    parts = vals.repartitionByRange(num_partitions, "v").withColumn(
        "pid", F.spark_partition_id()
    )
    pc = parts.groupBy("pid").agg(F.count(F.lit(1)).alias("cnt"))
    w_off = Window.orderBy("pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = pc.select(
        "pid", F.coalesce(F.sum("cnt").over(w_off), F.lit(0)).alias("off")
    )
    ranked = (
        parts.withColumn(
            "rn", F.row_number().over(Window.partitionBy("pid").orderBy("v"))
        )
        .join(F.broadcast(offsets), "pid")
        .select("v", (F.col("off") + F.col("rn") - 1).alias("rank0"))
    )

    rank = (F.col("n") - 1) * F.col("f")
    fr = (
        pc.agg(F.sum("cnt").alias("n"))
        .select(
            F.explode(F.array(*[F.lit(float(f)) for f in fractions])).alias("f"),
            "n",
        )
        .select(
            "f",
            F.floor(rank).cast("long").alias("lo"),
            F.ceil(rank).cast("long").alias("hi"),
            (rank - F.floor(rank)).alias("wt"),
        )
    )
    lo = ranked.join(F.broadcast(fr), ranked.rank0 == fr.lo).select(
        "f", "wt", F.col("v").alias("v_lo")
    )
    hi = ranked.join(
        F.broadcast(fr.select(F.col("f").alias("f2"), "hi")),
        ranked.rank0 == F.col("hi"),
    ).select("f2", F.col("v").alias("v_hi"))
    return lo.join(hi, lo.f == hi.f2).select(
        "f",
        (F.col("v_lo") + F.col("wt") * (F.col("v_hi") - F.col("v_lo"))).alias("q"),
    )


def exact_quantiles_row(
    df: DataFrame,
    value_col: str,
    fractions: Sequence[float],
    names: Sequence[str],
    round_expr=None,
    num_partitions: int = 32,
) -> DataFrame:
    """One-row pivot of :func:`exact_quantiles`: column ``names[i]`` holds
    the ``fractions[i]`` quantile (optionally rounded via ``round_expr``)."""
    q = exact_quantiles(df, value_col, fractions, num_partitions)
    cols = []
    for f, name in zip(fractions, names):
        c = F.max(F.when(F.col("f") == float(f), F.col("q")))
        cols.append((round_expr(c) if round_expr is not None else c).alias(name))
    return q.agg(*cols)
