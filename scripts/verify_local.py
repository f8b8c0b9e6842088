#!/usr/bin/env python
"""Local replica of the driver's correctness gate.

For every corpus query: run the Spark DataFrame and the DuckDB oracle on the
same parquet tables, then compare row count, column names (sorted), and the
order-insensitive multiset of stringified rows. Usage:

    python scripts/verify_local.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from us_weather_energy_analysis_pipeline_spark.corpus.registry import (
    REGISTRY,
    _ensure_loaded,
)
from us_weather_energy_analysis_pipeline_spark.operators import cache
from us_weather_energy_analysis_pipeline_spark.session import get_spark
from us_weather_energy_analysis_pipeline_spark.testing import diff_report, register_views


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    _ensure_loaded()

    spark = get_spark("verify-local")
    con = duckdb.connect()
    register_views(con, sf_dir)

    n_pass = n_fail = n_nosql = 0
    for name, q in sorted(REGISTRY.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = q.spark_fn(spark, sf_dir).toPandas()
        except Exception:
            print(f"FAIL  {name}: spark error")
            traceback.print_exc()
            n_fail += 1
            continue
        finally:
            # release on EVERY path — rows-only and failing queries must
            # not leak their operator persists into later queries' memory
            cache.release_all()
        if q.oracle is None:
            print(f"nosql {name}: {len(sdf)} rows ({time.time()-t0:.1f}s) — rows-only check")
            n_nosql += 1
            continue
        try:
            odf = con.execute(q.oracle).fetchdf()
        except Exception:
            print(f"FAIL  {name}: oracle error")
            traceback.print_exc()
            n_fail += 1
            continue
        msg = diff_report(sdf, odf)
        if msg is None:
            print(f"PASS  {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
            n_pass += 1
        else:
            print(f"FAIL  {name}: {msg}")
            n_fail += 1

    print(f"\n{n_pass} pass, {n_fail} fail, {n_nosql} rows-only")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
