"""Key-based upsert into a parquet table — the reference's realtime mode
(yesterday-only append, `pipeline.py:24-28`) done safely.

Plain parquet has no MERGE; the batch-rewrite pattern is: materialize
(existing ∖ new-keys) ∪ new into a staging dir, then atomically swap.
At real scale this is exactly what Delta/Iceberg MERGE INTO does with
transaction-log bookkeeping instead of a directory swap — swap to a table
format when one is available; the call-site contract stays the same.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


def upsert_parquet(
    spark: SparkSession,
    path: str,
    new_df: DataFrame,
    keys: list[str],
    partition_by: tuple[str, ...] = (),
) -> int:
    """Upsert ``new_df`` into the parquet table at ``path`` by ``keys``:
    existing rows with a key present in ``new_df`` are replaced, all other
    rows kept. Returns the resulting row count.

    The staging write fully materializes BEFORE the old directory is
    touched, so a failed job never corrupts the table (write-then-swap,
    the poor man's snapshot isolation).
    """
    staging = f"{path}__staging_{uuid.uuid4().hex[:8]}"
    if os.path.exists(path):
        existing = spark.read.parquet(path)
        keep = existing.join(new_df.select(*keys).distinct(), keys, "left_anti")
        merged = keep.unionByName(new_df)
    else:
        merged = new_df
    w = merged.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(staging)
    n = spark.read.parquet(staging).count()
    if os.path.exists(path):
        shutil.rmtree(path)
    os.rename(staging, path)
    return n
