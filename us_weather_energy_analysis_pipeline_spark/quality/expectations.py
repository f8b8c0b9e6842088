"""Declarative data-quality expectations — the reference's hard-coded
checks (`data_processor.py:87-112`) generalized into configurable rules.

All rules evaluate in ONE aggregation pass (each rule is a conditional
sum over the same scan), so adding rules costs columns, not scans —
the property that keeps a 100-rule suite viable on 100 TB.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Expectation:
    """A named row-level predicate that should hold; violations counted."""

    name: str
    predicate: Column  # True = row OK
    max_violations: int = 0


def not_null(col: str) -> Expectation:
    return Expectation(f"not_null_{col}", F.col(col).isNotNull())


def in_range(col: str, lo: float, hi: float) -> Expectation:
    """Null-safe: nulls don't violate range rules (pair with not_null)."""
    return Expectation(
        f"in_range_{col}",
        F.coalesce(F.col(col).between(lo, hi), F.lit(True)),
    )


def non_negative(col: str) -> Expectation:
    return Expectation(
        f"non_negative_{col}", F.coalesce(F.col(col) >= 0, F.lit(True))
    )


def matches(col: str, pattern: str) -> Expectation:
    return Expectation(
        f"matches_{col}",
        F.coalesce(F.col(col).rlike(pattern), F.lit(True)),
    )


def unique_key(df: DataFrame, cols: list[str]) -> Expectation:
    """Key-uniqueness needs its own (group-by) pass — expressed as a
    predicate over a window count so it still composes with check()."""
    from pyspark.sql import Window

    w = Window.partitionBy(*cols)
    return Expectation("unique_key_" + "_".join(cols), F.count(F.lit(1)).over(w) == 1)


def check(df: DataFrame, expectations: list[Expectation]) -> dict:
    """Evaluate all expectations in one pass. Returns
    {rule: {"violations": n, "passed": bool}, "__total_rows": N,
     "__all_passed": bool}."""
    # evaluate predicates in a projection first (window-based rules like
    # unique_key are legal in select, not inside agg), then one-pass sum
    flags = df.select(
        *[(~e.predicate).cast("long").alias(e.name) for e in expectations]
    )
    row = flags.agg(
        F.count(F.lit(1)).alias("__total"),
        *[F.sum(e.name).alias(e.name) for e in expectations],
    ).collect()[0].asDict()
    report: dict = {"__total_rows": row["__total"]}
    all_ok = True
    for e in expectations:
        n = row[e.name] or 0
        ok = n <= e.max_violations
        all_ok = all_ok and ok
        report[e.name] = {"violations": n, "passed": ok}
    report["__all_passed"] = all_ok
    return report
