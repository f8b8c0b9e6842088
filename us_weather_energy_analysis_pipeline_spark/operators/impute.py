"""Per-group mean imputation (reference N1, `data_processor.py:59-60`).

The reference computes the fill mean AFTER the spine join, over present
values only, per city — order matters because the injected-null spine days
must not dilute the mean (SURVEY §7.3). A partition window reproduces that
in one pass with no extra shuffle beyond the window's own partitioning.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def impute_group_mean(
    df: DataFrame,
    cols: Sequence[str],
    keys: Sequence[str] = ("city",),
    flag_suffix: str | None = None,
) -> DataFrame:
    """Fill NULLs in ``cols`` with the per-``keys`` mean of present values.

    ``avg`` ignores NULLs, so the window mean is exactly pandas
    ``df[col].mean()`` over the group. Optionally emits ``{col}{flag_suffix}``
    0/1 markers of which cells were imputed.
    """
    w = Window.partitionBy(*keys)
    out = df
    for c in cols:
        if flag_suffix:
            out = out.withColumn(
                f"{c}{flag_suffix}", F.when(F.col(c).isNull(), 1).otherwise(0)
            )
        out = out.withColumn(c, F.coalesce(F.col(c), F.avg(c).over(w)))
    return out
