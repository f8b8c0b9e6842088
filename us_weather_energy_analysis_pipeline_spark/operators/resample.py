"""Time-grain resampling with pandas-resample parity (reference A2,
`data_processor.py:79`).

pandas ``set_index(ts).resample('D').sum()`` has two load-bearing quirks
(SURVEY §7.3):

1. it creates a row for EVERY day between the observed min and max per
   group — days with no readings sum to 0.0;
2. a day whose readings are all NaN also sums to 0.0 (skipna, min_count=0).

Truly-missing days outside the observed range only appear after the
requested-range spine join (J4), as NULL. The distinction 0.0-vs-NULL
propagates into quality counts, so it is replicated exactly:
group-aggregate → per-key observed spine filled with 0.0.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resample_daily_sum(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    out_col: str,
    keys: Sequence[str] = ("city",),
    observed_fill: float = 0.0,
) -> DataFrame:
    """Hourly(or finer)→daily sum per key with pandas resample semantics.

    Returns one row per (key, day) for every day in each key's OWN observed
    [min, max]; absent/all-null days carry ``observed_fill``. The per-key
    spine is ``sequence()`` over the group's min/max — generated in-plan,
    proportional to days×keys, always the small side of the join.
    """
    day = F.to_date(ts_col).alias("date")
    daily = df.groupBy(*keys, day).agg(
        F.coalesce(F.sum(value_col), F.lit(observed_fill)).alias(out_col)
    )
    bounds = daily.groupBy(*keys).agg(
        F.min("date").alias("lo"), F.max("date").alias("hi")
    )
    spine = bounds.select(
        *keys, F.explode(F.sequence("lo", "hi", F.expr("interval 1 day"))).alias("date")
    )
    return (
        spine.join(daily, [*keys, "date"], "left")
        .withColumn(out_col, F.coalesce(F.col(out_col), F.lit(observed_fill)))
    )
