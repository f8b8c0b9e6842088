"""Small-file compaction — the maintenance op every long-lived
incremental table needs (each realtime upsert/append adds files; scan
cost grows with file count, not data size).

Write-then-swap like operators/upsert.py: rewrite into ``target_files``
per partition, fully materialize staging, then atomically replace. With a
table format (Delta/Iceberg) this becomes OPTIMIZE/rewrite_data_files;
the call-site contract stays the same.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import SparkSession


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_files: int = 1,
    partition_by: tuple[str, ...] = (),
    sort_within_by: tuple[str, ...] = (),
) -> int:
    """Rewrite the parquet table at ``path`` into ``target_files`` files
    (per partition when partitioned), optionally sorted within files for
    min/max row-group pruning. Returns the row count."""
    df = spark.read.parquet(path)
    out = df.repartition(target_files, *partition_by) if partition_by else df.repartition(
        target_files
    )
    if sort_within_by:
        out = out.sortWithinPartitions(*sort_within_by)
    staging = f"{path}__compact_{uuid.uuid4().hex[:8]}"
    w = out.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(staging)
    n = spark.read.parquet(staging).count()
    shutil.rmtree(path)
    os.rename(staging, path)
    return n
