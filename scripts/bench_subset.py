#!/usr/bin/env python
"""A/B harness: run a representative query subset under conf overrides.

Usage: python scripts/bench_subset.py '{"spark.sql.shuffle.partitions":"8"}' \\
           [comma,separated,query,names]
Prints per-query warm-min timings + total for the subset; used to pick
session defaults (and to A/B code changes across git stash flips)
without paying a full corpus bench per variant.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from us_weather_energy_analysis_pipeline_spark.corpus.registry import (
    REGISTRY,
    _ensure_loaded,
)
from us_weather_energy_analysis_pipeline_spark.operators import cache
from us_weather_energy_analysis_pipeline_spark.session import get_spark

SUBSET = [
    "bin_quantity_case",
    "distinct_event_types",
    "corr_pearson",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier",
    "heatmap_pivot",
    "asof_join_last_view",
    "dates_except",
    "quantiles_exact",
    "distinct_kmv_estimate",
    "dedup_minhash_lsh",
    "dedup_simhash_pairs",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_embed_cosine",
    "dedup_cluster_assign",
    "embed_lsh_bucket_topk",
    "embed_cosine_topk",
    "embed_ivf_topk",
]


def main() -> None:
    overrides = json.loads(sys.argv[1]) if len(sys.argv) > 1 else {}
    subset = sys.argv[2].split(",") if len(sys.argv) > 2 else SUBSET
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    _ensure_loaded()
    spark = get_spark("bench-subset", extra_conf=overrides)
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1000).write.format(
        "noop"
    ).mode("overwrite").save()
    spark.range(100).mapInPandas(lambda it: it, "id long").write.format("noop").mode(
        "overwrite"
    ).save()
    from us_weather_energy_analysis_pipeline_spark.benchlib import timed_best

    tracker = spark.sparkContext.statusTracker()
    timings: dict[str, float] = {}
    for name in subset:
        q = REGISTRY[name]

        def _run(q=q):
            q.spark_fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

        best, _ = timed_best(spark, tracker, name, _run, after_run=cache.release_all)
        timings[name] = round(best, 3)
    for name, sec in sorted(timings.items(), key=lambda kv: -kv[1]):
        print(f"{sec:7.3f}  {name}")
    print(json.dumps({"subset_total_sec": round(sum(timings.values()), 3)}))


if __name__ == "__main__":
    main()
