"""Driver-side plan metadata probes — no Spark job.

``input_bytes`` reads the scan's FileIndex (the same statistics AQE and
the broadcast-join planner consult) so adaptive operators can pick a
plan WITHOUT paying a count() job: on this host a settled job costs
0.05–0.11 s, which dominates every floor-bound corpus query (BENCH_NOTES).

The bytes → rows bound is only an upper bound for plans that never
multiply rows (filter / project / aggregate pipelines over the scanned
files — every in-repo caller). A caller feeding a row-expanding join or
explode through a small-scan plan must keep the count gate instead; the
operators fall back to it automatically above ``SMALL_INPUT_BYTES`` or
when the plan has no file inputs.
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


def input_bytes(df: DataFrame) -> int:
    """Total size of the plan's input files — FileIndex metadata, no job.
    Returns a large sentinel when the plan has no file inputs (pure
    in-memory fixtures) or a file is unreadable, so callers conservatively
    take their distributed path."""
    try:
        files = df.inputFiles()
    except Exception:
        return 1 << 60
    if not files:
        return 1 << 60
    total = 0
    for f in files:
        p = f.removeprefix("file:")
        try:
            total += os.path.getsize(p)
        except OSError:
            return 1 << 60
    return total
