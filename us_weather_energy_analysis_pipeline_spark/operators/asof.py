"""As-of (backward) join — align each left row with the most recent right
row at-or-before its timestamp, per key.

Spark has no native ASOF JOIN; the scalable construction is the
union-and-carry pattern: tag both sides, union, then one window pass per
key carrying the last right-side values forward (``last(..., ignorenulls)``
over rows unbounded-preceding..current). Cost: ONE shuffle on the key —
never a range cross-join, never per-row lookups. Equal timestamps order
the right row first, so ties match (<= semantics, like DuckDB ASOF).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts_col: str,
    right_value_cols: Sequence[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Left rows + the latest right values with right.ts <= left.ts per key.

    Right value columns appear as ``{col}{suffix}`` (including the right
    timestamp as ``{ts_col}{suffix}``); left rows with no prior right row
    keep NULLs (left-outer asof).
    """
    lcols = left.columns
    tagged_l = left.withColumn("__side", F.lit(1))
    for c in right_value_cols:
        tagged_l = tagged_l.withColumn(f"__r_{c}", F.lit(None).cast(dict(right.dtypes)[c]))
    tagged_l = tagged_l.withColumn("__r_ts", F.lit(None).cast(dict(right.dtypes)[ts_col]))

    # A NULL-ts right row can never satisfy r.ts <= l.ts (SQL ASOF joins
    # never match it), but the ASC sort would place it NULLS FIRST —
    # ahead of every left row — and the carry would adopt it as the
    # "most recent" match. Drop such rows up front. Same for NULL join
    # keys (r7 user_id null-fuzz): ASOF's equality condition never
    # matches NULL = NULL, but partitionBy groups all NULL-key rows into
    # one partition where they would serve as carries — dropping NULL-key
    # RIGHT rows restores equality semantics while NULL-key LEFT rows
    # stay (left-outer, NULL carry, their partition has no right rows).
    r_ok = F.col(ts_col).isNotNull()
    for k in on:
        r_ok = r_ok & F.col(k).isNotNull()
    tagged_r = right.filter(r_ok).select(
        *on,
        F.col(ts_col),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in right_value_cols],
        F.col(ts_col).alias("__r_ts"),
    )
    for c in lcols:
        if c not in [*on, ts_col]:
            tagged_r = tagged_r.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    unioned = tagged_l.unionByName(tagged_r)

    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts_col).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Carry ONE struct per right ROW, not per-column lasts: a right row
    # whose value column is NULL must still be "the most recent right
    # row" (ASOF matches rows, values ride along) — per-column
    # last(ignorenulls) would skip it and stitch together values from
    # DIFFERENT right rows. The struct is non-null exactly for
    # right-side rows, so ignorenulls keys on row presence alone.
    payload = F.when(
        F.col("__side") == 0,
        F.struct(
            *[F.col(f"__r_{c}").alias(c) for c in right_value_cols],
            F.col("__r_ts").alias("__ts"),
        ),
    )
    carried = unioned.select(
        *lcols,
        "__side",
        F.last(payload, ignorenulls=True).over(w).alias("__car"),
    ).select(
        *lcols,
        "__side",
        *[F.col("__car")[c].alias(f"{c}{suffix}") for c in right_value_cols],
        F.col("__car")["__ts"].alias(f"{ts_col}{suffix}"),
    )
    return carried.filter(F.col("__side") == 1).drop("__side")


def asof_backward_same_source(
    events: DataFrame,
    on: Sequence[str],
    ts_col: str,
    left_pred,
    right_pred,
    left_cols: Sequence[str],
    right_value_cols: Sequence[str],
    suffix: str = "_asof",
    overlap: str = "disjoint",
) -> DataFrame:
    """``asof_join_backward`` for the common case where BOTH sides are
    predicates over ONE event stream (purchases vs views of the same
    table): a single scan with a CASE side tag replaces the two filtered
    scans + unionByName — the union-and-carry window is identical, so
    results match ``asof_join_backward(events.filter(left_pred),
    events.filter(right_pred), ...)`` exactly (equality-tested).

    ``overlap`` states the contract for rows satisfying BOTH predicates
    (ADVICE r6): the default ``"disjoint"`` requires that no row can
    satisfy both — under the single CASE tag such a row would be tagged
    left only and never serve as a right-side carry, silently diverging
    from the two-frame form (the in-repo caller, purchase vs view on
    ``event_type``, is disjoint by construction). Pass ``"both"`` for
    overlapping predicates: rows matching both are tagged on both sides
    via an array tag + explode (still one scan; the right copy sorts
    before the left copy at equal ts, so a both-row carries itself —
    exactly the two-frame ``r.ts <= l.ts`` semantics, equality-tested).

    ``left_cols`` are the left-side output columns (must include ``on``
    and ``ts_col``); right value columns appear as ``{col}{suffix}`` plus
    ``{ts_col}{suffix}``. NULL-ts right rows are dropped up front (they
    can never satisfy r.ts <= l.ts; the ASC sort would otherwise adopt
    them NULLS FIRST as a bogus carry).
    """
    if overlap not in ("disjoint", "both"):
        raise ValueError(f"overlap must be 'disjoint' or 'both', got {overlap!r}")
    # NULL-key right rows never match under ASOF equality semantics
    # (see asof_join_backward); NULL-key left rows pass through with
    # NULL carries since their partition then holds no right rows.
    key_ok = F.lit(True)
    for k in on:
        key_ok = key_ok & F.col(k).isNotNull()
    if overlap == "both":
        r_ok = right_pred & F.col(ts_col).isNotNull() & key_ok
        tags = (
            F.when(left_pred & r_ok, F.array(F.lit(1), F.lit(0)))
            .when(left_pred, F.array(F.lit(1)))
            .when(r_ok, F.array(F.lit(0)))
        )
        base = (
            events.withColumn("__sides", tags)
            .filter(F.col("__sides").isNotNull())
            .withColumn("__side", F.explode("__sides"))
            .drop("__sides")
        )
    else:
        side = F.when(left_pred, 1).when(
            right_pred & F.col(ts_col).isNotNull() & key_ok, 0
        )
        base = events.withColumn("__side", side).filter(F.col("__side").isNotNull())
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts_col).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    payload = F.when(
        F.col("__side") == 0,
        F.struct(
            *[F.col(c).alias(c) for c in right_value_cols],
            F.col(ts_col).alias("__ts"),
        ),
    )
    carried = base.select(
        *left_cols,
        "__side",
        F.last(payload, ignorenulls=True).over(w).alias("__car"),
    ).select(
        *left_cols,
        "__side",
        *[F.col("__car")[c].alias(f"{c}{suffix}") for c in right_value_cols],
        F.col("__car")["__ts"].alias(f"{ts_col}{suffix}"),
    )
    return carried.filter(F.col("__side") == 1).drop("__side")
