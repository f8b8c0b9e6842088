#!/usr/bin/env python
"""One-line plan census for EVERY registered query — the r14 optimization
checklist. For each query: Exchange count (shuffle vs broadcast), join
strategies, Python-boundary nodes, window/sort nodes, and whether the scan
carries pushed filters. Runs explain only (no execution) on local[4]."""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from us_weather_energy_analysis_pipeline_spark.corpus.registry import (
    REGISTRY,
    _ensure_loaded,
)
from us_weather_energy_analysis_pipeline_spark.operators import cache
from us_weather_energy_analysis_pipeline_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    _ensure_loaded()
    spark = get_spark("plan-census", master=os.environ.get("PLANS_MASTER", "local[4]"))
    rows = []
    for name in sorted(REGISTRY):
        q = REGISTRY[name]
        try:
            df = q.spark_fn(spark, sf_dir)
            p = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # noqa: BLE001
            rows.append((name, f"ERROR {e}"))
            cache.release_all()
            continue
        cache.release_all()
        n_sh = len(re.findall(r"\(\d+\) Exchange\b", p))
        n_bc = len(re.findall(r"\(\d+\) BroadcastExchange\b", p))
        smj = p.count("SortMergeJoin")
        bhj = p.count("BroadcastHashJoin")
        shj = p.count("ShuffledHashJoin")
        bnl = p.count("BroadcastNestedLoopJoin")
        cart = p.count("CartesianProduct")
        py = p.count("BatchEvalPython")
        arrow = p.count("ArrowEvalPython") + p.count("MapInPandas") + p.count("MapInArrow")
        win = p.count("Window")
        sort = p.count("+- Sort") + p.count("- * Sort")
        gen = p.count("Generate")
        agg = p.count("HashAggregate")
        objagg = p.count("ObjectHashAggregate") + p.count("SortAggregate")
        scans = p.count("Scan parquet")
        mem = p.count("InMemoryRelation")
        pushed_none = len(re.findall(r"PushedFilters: \[\]", p))
        rows.append(
            (
                name,
                f"sh={n_sh} bc={n_bc} smj={smj} bhj={bhj} shj={shj} bnl={bnl} cart={cart} "
                f"py={py} arrow={arrow} win={win} sort={sort} gen={gen} hagg={agg} oagg={objagg} "
                f"scan={scans} mem={mem} nofilter={pushed_none}",
            )
        )
    for name, info in rows:
        print(f"{name:40s} {info}")
    spark.stop()


if __name__ == "__main__":
    main()
