"""Mergeable distinct-count sketches with DETERMINISTIC state.

``kmv_k_smallest`` produces the K-Minimum-Values sketch state (Bar-Yossef
et al. 2002): the k smallest distinct hash values of a column. The naive
plan (``distinct().orderBy().limit(k)``) shuffles EVERY distinct hash;
at 100 TB that exchange is the whole cost. This one never shuffles the
hash set at all:

1. TakeOrdered(m = k·over_factor) keeps the m smallest ROWS (duplicates
   included) — per-partition top-m partial fold, O(m) state per
   partition, no exchange.
2. One bounded aggregate over those ≤ m rows (groupBy hash → counts →
   global collect+sort of ≤ m values) yields the k smallest distinct
   values plus the validity evidence.

Exactness: the m smallest rows contain every distinct value strictly
below their max, so if they hold ≥ k distinct values the k smallest
distinct values are all present; likewise if fewer than m rows exist the
input was exhausted and the set is trivially complete. Otherwise (dup
factor above ``over_factor`` — pathological key skew) the plan RAISES
inside the query rather than return a silently-wrong sketch; retry with
a larger ``over_factor``.

Driver/TakeOrdered note: TakeOrderedAndProject merges per-partition
top-m lists (m rows × partitions through the final merge) — bounded by
``m × n_partitions`` values of fixed width. For very wide clusters, cut
``over_factor`` or insert a coalesce before the take.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def kmv_k_smallest(
    df: DataFrame,
    key: Column | str,
    k: int = 256,
    over_factor: int = 32,
) -> DataFrame:
    """One-row sketch state over ``md5(key)``: ``(ks array<string>,
    n_kept int, u_k string)`` — the ≤ k smallest distinct hashes in
    ascending order, how many there are, and the largest of them."""
    m = k * over_factor
    # backticks in the name are doubled so an odd identifier can't break
    # out of the quoting (ADVICE r11)
    key_sql = f"`{key.replace('`', '``')}`" if isinstance(key, str) else None
    if key_sql is None:
        # Column-typed key: keep the staged form (no SQL identifier)
        c = key
        s = df.select(F.md5(c.cast("string")).alias("h")).orderBy("h").limit(m)
        g = s.groupBy("h").agg(F.count(F.lit(1)).alias("cnt"))
        agg = g.agg(
            F.sum("cnt").alias("nr"),
            F.count(F.lit(1)).alias("nd"),
            F.slice(F.array_sort(F.collect_list("h")), 1, k).alias("ks"),
        )
        valid = (F.col("nd") >= k) | (F.coalesce(F.col("nr"), F.lit(0)) < m)
        guard = F.when(valid, F.col("ks")).otherwise(
            F.raise_error(F.lit(_KMV_ERR.format(m=m, k=k, of=over_factor)))
        )
        n_kept = F.least(F.col("nd"), F.lit(k)).cast("int")
        return agg.select(
            guard.alias("ks"),
            n_kept.alias("n_kept"),
            F.get(guard, n_kept - 1).alias("u_k"),
        )
    # string key: ONE spark.sql statement (r11 build cut — identical
    # plan, the CASE guard is evaluated per output column exactly as the
    # Column form's shared guard expression was).
    # empty input → nr is NULL sum / nd = 0: trivially complete;
    # 0-based get → NULL (not an index error) on empty input.
    # single quotes doubled: the literal lands inside raise_error('...')
    err = _KMV_ERR.format(m=m, k=k, of=over_factor).replace("'", "''")
    return df.sparkSession.sql(
        f"""
        WITH s AS (
          SELECT md5(CAST({key_sql} AS STRING)) AS h FROM {{df}}
          ORDER BY h LIMIT {m}
        ),
        g AS (SELECT h, count(1) AS cnt FROM s GROUP BY h),
        agg AS (
          SELECT sum(cnt) AS nr, count(1) AS nd,
                 slice(array_sort(collect_list(h)), 1, {k}) AS ks
          FROM g
        )
        SELECT guard AS ks, n_kept, get(guard, n_kept - 1) AS u_k
        FROM (
          SELECT CASE WHEN nd >= {k} OR coalesce(nr, 0) < {m} THEN ks
                      ELSE raise_error('{err}') END AS guard,
                 CAST(least(nd, {k}) AS INT) AS n_kept
          FROM agg
        )
        """,
        df=df,
    )


_KMV_ERR = (
    "kmv_k_smallest: {m} smallest rows held fewer than {k} "
    "distinct hashes with input not exhausted — duplicate "
    "factor exceeds over_factor={of}; retry larger"
)
