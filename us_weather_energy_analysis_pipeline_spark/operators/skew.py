"""Skew-mitigation operators.

A groupBy on a low-cardinality or Zipf-skewed key concentrates whole
partitions on one reducer. Two mitigations:

- AQE skew-join splitting (on by default in ``session.py``) handles join
  skew at runtime;
- for aggregation skew, ``salted_agg`` is the classic two-phase rewrite:
  key → (key, salt) partial agg (spreads the hot key over N reducers) →
  re-agg by key. Works for any algebraic aggregate (sum/count/min/max;
  avg via sum+count).

The result is EXACTLY the plain aggregation's result — only the shuffle
distribution changes — so the corpus oracle for the salted query is the
plain SQL aggregate.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_sum_count(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe sum/count per key.

    Phase 1 groups by (keys…, salt) — the hot key's rows spread across
    ``n_salts`` reducers; phase 2 folds the partials by key. The salt is
    ``pmod(hash of a uniform random), n_salts`` — any spreading column
    works because phase 2 re-aggregates exactly.
    """
    salted = df.withColumn("__salt", (F.rand(7) * n_salts).cast("int"))
    partial = salted.groupBy(*keys, "__salt").agg(
        F.sum(value_col).alias("__psum"),
        F.count(F.lit(1)).alias("__pcnt"),
    )
    return partial.groupBy(*keys).agg(
        F.sum("__psum").alias(f"sum_{value_col}"),
        F.sum("__pcnt").cast("long").alias("n_rows"),
    )
