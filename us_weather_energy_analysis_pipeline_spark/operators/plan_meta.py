"""Driver-side plan metadata probes — no Spark job.

``input_bytes`` / ``input_rows`` read the scan's FileIndex and parquet
footers (the same statistics AQE and the broadcast-join planner consult)
so adaptive operators can pick a plan WITHOUT paying a count() job: on
this host a settled job costs 0.05–0.11 s, which dominates every
floor-bound corpus query (BENCH_NOTES).

``small_scan`` is the gate the driver-collecting small paths use. It
bounds BOTH dimensions: file bytes (Arrow transfer size) and footer row
counts (parquet compression is unbounded, so a narrow highly-compressible
64 MB scan can decode to tens of millions of rows — bytes alone are not a
driver-memory bound). It also verifies the "plan rows ≤ scan rows"
contract structurally instead of by convention: any row-expanding node
(Join, Generate/explode, Expand, python co-group/flat-map) in the
optimized plan fails the gate and the caller falls back to its count-gated
or fully distributed path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

# Scans below this are safely driver-collectable after aggregation:
# 64 MB of columnar parquet upper-bounds the probe collect (keys + cum
# columns only) at tens of MB of Arrow — within one executor task's
# working set, let alone the driver. Above it (sf ≥ ~1 for lineitem) the
# count-gated / fully distributed paths engage.
SMALL_INPUT_BYTES = 64 << 20

# Plan nodes that can emit more rows than they consume. Substring match
# against the optimized logical plan — conservative by design: a false
# positive merely routes the caller to its (always-correct) distributed
# or count-gated path.
_ROW_EXPANDING_NODES = (
    "Join",  # all join flavors incl. LateralJoin
    "Generate",  # explode / posexplode / inline / lateral view
    "Expand",  # grouping sets / cube / rollup
    "CoGroup",  # applyInPandas cogroup
    "FlatMap",  # flatMapGroupsInPandas and friends
    "MapInPandas",  # arbitrary batch → batch cardinality
    "PythonMapInArrow",
    "MapPartitions",
    # non-file leaves / mixed sources (ADVICE r6): a plan unioning a
    # parquet scan with a Range/LocalRelation/InMemoryRelation branch has
    # non-empty inputFiles() while footer rows undercount the non-file
    # branch — footer rows would NOT bound plan output. Rejecting these
    # tokens keeps "footer rows ≥ plan rows" true for every accepted plan;
    # a false positive (e.g. a column name containing one of these words)
    # merely routes to the count-gated path.
    "Union",
    "Range",
    "OneRowRelation",
    "LocalRelation",
    "InMemoryRelation",
    "LogicalRDD",
)

_LARGE = 1 << 60


def input_bytes(df: DataFrame) -> int:
    """Total size of the plan's input files — FileIndex metadata, no job.
    Returns a large sentinel when the plan has no file inputs (pure
    in-memory fixtures) or a file is unreadable, so callers conservatively
    take their distributed path."""
    try:
        files = df.inputFiles()
    except Exception:
        return _LARGE
    if not files:
        return _LARGE
    total = 0
    for f in files:
        p = f.removeprefix("file:")
        try:
            total += os.path.getsize(p)
        except OSError:
            return _LARGE
    return total


def input_rows(df: DataFrame) -> int:
    """Total row count of the plan's parquet input files — footer
    metadata only (pyarrow reads the footer, never the pages), no Spark
    job. Returns a large sentinel for non-parquet inputs, plans without
    file inputs, or unreadable files, so callers conservatively take
    their distributed path."""
    try:
        files = df.inputFiles()
    except Exception:
        return _LARGE
    if not files:
        return _LARGE
    try:
        import pyarrow.parquet as pq
    except ImportError:  # pragma: no cover - pyarrow is baked in
        return _LARGE
    total = 0
    for f in files:
        p = f.removeprefix("file:")
        if not p.endswith(".parquet"):
            return _LARGE
        try:
            total += pq.ParquetFile(p).metadata.num_rows
        except Exception:
            return _LARGE
    return total


def _plan_row_bounded(df: DataFrame) -> bool:
    """True when the optimized logical plan contains no row-expanding
    node, making footer rows a true upper bound on plan output rows.
    Unresolvable plans answer False (conservative)."""
    try:
        plan = df._jdf.queryExecution().optimizedPlan().toString()
    except Exception:
        return False
    return not any(tok in plan for tok in _ROW_EXPANDING_NODES)


def small_scan(
    df: DataFrame,
    max_rows: int,
    max_bytes: int = SMALL_INPUT_BYTES,
) -> bool:
    """Job-free driver-collectability gate: input files under
    ``max_bytes`` AND footer rows under ``max_rows`` AND no row-expanding
    plan node. On False the caller must count-gate or stay distributed."""
    return (
        input_bytes(df) < max_bytes
        and input_rows(df) <= max_rows
        and _plan_row_bounded(df)
    )
