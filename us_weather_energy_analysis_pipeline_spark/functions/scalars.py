"""Scalar column functions mirroring the reference's derived columns.

Reference citations per function; each is a pure Column expression so
Catalyst sees through it (constant folding, pushdown) and whole-stage
codegen keeps it JVM-side.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def celsius_to_fahrenheit(col: Column | str) -> Column:
    """F = C·9/5 + 32 (reference P1 `data_processor.py:6-8`; explicitly NOT
    the ÷10 GHCND-units variant, per the comment at `data_processor.py:34`)."""
    c = F.col(col) if isinstance(col, str) else col
    return c * 9 / 5 + 32


def row_avg(a: Column | str, b: Column | str) -> Column:
    """Row-wise mean of two columns (reference P7 `data_processor.py:61`,
    `pipeline.py:89`). NULL if either side is NULL — matching pandas
    mean(axis=1) ONLY when both present is NOT the reference behavior:
    pandas skips NaN (mean of one value is that value), so replicate that:
    mean over present values."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    both = (ca + cb) / 2
    return (
        F.when(ca.isNotNull() & cb.isNotNull(), both)
        .when(ca.isNotNull(), ca)
        .otherwise(cb)
    )


def temp_range_bin(
    col: Column | str,
    edges: Sequence[float] = (50.0, 60.0, 70.0, 80.0, 90.0),
    labels: Sequence[str] = ("50-60°F", "60-70°F", "70-80°F", "80-90°F", "90°F+"),
) -> Column:
    """Left-closed binning `[e_i, e_{i+1})` with values below the first edge
    → NULL (reference P10 `analysis.py:47-54`, pd.cut right=False; the
    canonical src variant per SURVEY §7.3 — the dashboard's extra `<50°F`
    bucket at app.py:63-65 is the documented discrepancy, available by
    prepending an edge of -inf)."""
    c = F.col(col) if isinstance(col, str) else col
    assert len(labels) == len(edges)
    expr = F.lit(None).cast("string")
    # Build from the top: >= last edge → last label, else walk down.
    branches = list(zip(edges, labels))
    out = F.when(c >= branches[-1][0], branches[-1][1])
    for edge, label in reversed(branches[:-1]):
        out = out.when(c >= edge, label)
    return out.otherwise(expr)


# Canonical weekday ordering (pandas/reference convention, Monday first)
# and the matching Spark dayofweek() ints (Sunday=1 convention) — the
# single source both pivot layouts and name lookups derive from.
DAY_ORDER = (
    "Monday",
    "Tuesday",
    "Wednesday",
    "Thursday",
    "Friday",
    "Saturday",
    "Sunday",
)
DOW_INTS = tuple((i + 1) % 7 + 1 for i in range(7))  # (2,3,4,5,6,7,1)


def day_name(col: Column | str) -> Column:
    """Full weekday name (reference P8 `analysis.py:55` dt.day_name())."""
    return F.date_format(col, "EEEE")


def is_saturday(col: Column | str) -> Column:
    """Saturday predicate (reference P9 `app.py:739`, pandas dayofweek==5).
    Spark's dayofweek is Sunday=1..Saturday=7 — the off-by-convention trap
    is resolved here once (SURVEY §7.3)."""
    return F.dayofweek(col) == 7


def pct_change(cur: Column | str, prev: Column | str) -> Column:
    """Percent change vs previous value with div-by-zero guard → 0
    (reference P14 `app.py:610-613`)."""
    c = F.col(cur) if isinstance(cur, str) else cur
    p = F.col(prev) if isinstance(prev, str) else prev
    return F.when(p > 0, (c - p) / p * 100).otherwise(F.lit(0.0))


def html_escape(col: Column | str) -> Column:
    """HTML-escape a string column — Python ``html.escape(s, quote=True)``
    semantics (reference P18 `dashboards/app.py:490`, escaping report-table
    cell text). `&` is replaced first so entity ampersands are not
    double-escaped; then the four markup-significant characters."""
    c = F.col(col) if isinstance(col, str) else col
    for raw, ent in [
        ("&", "&amp;"),
        ("<", "&lt;"),
        (">", "&gt;"),
        ('"', "&quot;"),
        ("'", "&#x27;"),
    ]:
        c = F.replace(c, F.lit(raw), F.lit(ent))
    return c


def html_escape_sql(expr: str) -> str:
    """SQL-string twin of :func:`html_escape` — identical replace chain,
    for single-statement builders (r11 build cut)."""
    out = expr
    for raw, ent in [
        ("&", "&amp;"),
        ("<", "&lt;"),
        (">", "&gt;"),
        ('\\"', "&quot;"),
        ("\\'", "&#x27;"),
    ]:
        out = f"replace({out}, '{raw}', '{ent}')"
    return out
