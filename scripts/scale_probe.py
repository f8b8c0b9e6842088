#!/usr/bin/env python
"""Scale probe: run representative plans on 1×/4×/16× the sf0.1 fact data
(synthesized by unioning the lineitem scan with shifted keys — no writes)
and record wall-clock scaling into SCALE_PROBE.md.

The point is the CURVE, not the absolute numbers: a plan whose cost grows
superlinearly here will not survive the 100 TB target. Shuffle-bound
plans should scale ~linearly (partial aggregation, bucket-local joins);
anything quadratic shows immediately.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from us_weather_energy_analysis_pipeline_spark.session import get_spark


def scaled_lineitem(spark, sf_dir: str, factor: int) -> DataFrame:
    """factor copies of lineitem with disjoint order keys — same value
    distributions, genuinely larger key space (not just duplicated keys)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    max_key = 6_000_000
    parts = [
        li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * max_key))
        for i in range(factor)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def q1(df: DataFrame) -> DataFrame:
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return df.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity"), F.sum(disc), F.avg("l_discount"), F.count(F.lit(1))
    )


def window_lag(df: DataFrame) -> DataFrame:
    daily = df.groupBy(
        "l_returnflag", F.to_date("l_shipdate").alias("d")
    ).agg(F.sum("l_extendedprice").alias("t"))
    w = Window.partitionBy("l_returnflag").orderBy("d")
    return daily.select("l_returnflag", "d", (F.col("t") - F.lag("t").over(w)).alias("diff"))


def self_join_agg(df: DataFrame) -> DataFrame:
    a = df.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    b = df.groupBy("l_orderkey").agg(F.sum("l_extendedprice").alias("p"))
    return a.join(b, "l_orderkey").agg(F.corr("q", "p"))


def simhash_fp(df: DataFrame) -> DataFrame:
    """SimHash fingerprints over a synthetic text column — codegen'd
    explode + partially-aggregated groupBy (32 longs/doc cross the wire):
    must be ~linear. (A zero-shuffle HOF fold variant measured 4-10×
    slower here — interpreted lambdas lose to codegen + tiny shuffle.)"""
    from us_weather_energy_analysis_pipeline_spark.operators.dedup import simhash32

    text = F.concat_ws(
        " ",
        "l_returnflag",
        "l_linestatus",
        F.col("l_quantity").cast("string"),
        F.col("l_partkey").cast("string"),
        F.col("l_suppkey").cast("string"),
        F.col("l_extendedprice").cast("string"),
    )
    docs = df.select(F.col("l_orderkey").alias("doc_id"), text.alias("text"))
    return simhash32(docs)


def kmv_sketch(df: DataFrame) -> DataFrame:
    """KMV distinct-count sketch over the scaled key space: the
    TakeOrdered row prune (operators/sketch.kmv_k_smallest) never
    shuffles the distinct-hash set — growth must track the md5 scan."""
    from us_weather_energy_analysis_pipeline_spark.operators.sketch import (
        kmv_k_smallest,
    )

    return kmv_k_smallest(df, "l_orderkey", k=256).select("u_k", "n_kept")


def grid_range(df: DataFrame) -> DataFrame:
    """Bucketed-grid range join against a 4-band table — broadcast hash
    join on the cell, so growth tracks the probe-side scan."""
    from us_weather_energy_analysis_pipeline_spark.operators.rangejoin import (
        grid_range_join,
    )

    spark = df.sparkSession
    bands = spark.createDataFrame(
        [("lo", 0.0, 20000.0), ("mid", 20000.0, 45000.0), ("hi", 45000.0, 100000.0)],
        "band string, lo double, hi double",
    )
    return (
        grid_range_join(df, "l_extendedprice", bands, grid=10_000.0)
        .groupBy("band")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def quantiles_dist(df: DataFrame) -> DataFrame:
    """Distributed exact-quantile path (size gate forced off): two narrow
    single-column shuffles — must stay ≲linear."""
    from us_weather_energy_analysis_pipeline_spark.operators.quantile import (
        exact_quantiles,
    )

    return exact_quantiles(
        df, "l_extendedprice", [0.25, 0.5, 0.9, 0.99], small_threshold=0
    )


PROBES = {
    "q1_agg": q1,
    "window_lag": window_lag,
    "selfjoin_corr": self_join_agg,
    "simhash_map": simhash_fp,
    "kmv_sketch": kmv_sketch,
    "grid_range_join": grid_range,
    "quantiles_distributed": quantiles_dist,
}


def scaled_embeddings(spark, sf_dir: str, factor: int) -> DataFrame:
    """factor copies of the embeddings table with disjoint vec_ids."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    shift = 1_000_000
    parts = [
        emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * shift))
        for i in range(factor)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def scaled_documents(spark, sf_dir: str, factor: int) -> DataFrame:
    """factor copies of documents with disjoint doc_ids AND mostly
    disjoint token spaces: each copy rotates vowels via translate (cheap,
    in-plan), so shingle document frequencies stay realistic instead of
    multiplying by ``factor`` and tripping the df-cap on everything."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    shift = 10_000_000
    vowels = "aeiou"
    parts = []
    for i in range(factor):
        rot = vowels[i % 5:] + vowels[: i % 5]
        parts.append(
            d.select(
                (F.col("doc_id") + F.lit(i * shift)).alias("doc_id"),
                F.translate("text", vowels, rot).alias("text"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def ngram_probe(spark, sf_dir: str) -> list[str]:
    """Growth curve of the posting-list ngram-Jaccard plan (the r4
    rewrite: df-cap → bounded collect_list → map-side pair expansion).
    Shingle volume grows linearly with documents and every exchange key
    is bounded (cap-row posting lists), so the curve must stay
    ≲linear."""
    from us_weather_energy_analysis_pipeline_spark.corpus.dedup_q import (
        ngram_jaccard_pairs,
    )
    from us_weather_energy_analysis_pipeline_spark.operators import cache

    lines = [
        "\n## N-gram Jaccard posting-list plan (documents ×1/×4/×16, "
        "vowel-rotated copies)\n\n",
        "| scale | sec | vs ×1 |\n|---|---|---|\n",
    ]
    base = None
    for factor in (1, 4, 16):
        d = scaled_documents(spark, sf_dir, factor)
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            ngram_jaccard_pairs(d).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
            cache.release_all()
        if base is None:
            base = best
        lines.append(f"| ×{factor} | {best:.2f} | {best / base:.1f}× |\n")
        print(f"ngram_posting x{factor}: {round(best, 2)}s")
    return lines


def block_pair_probes(spark, sf_dir: str) -> list[str]:
    """Two experiments on cosine_pairs_filter_refine (the exact all-pairs
    verifier):

    1. BLOCK SWEEP — fixed ×16 data (32k vectors), block count B varied
       4×/16× via block_rows. Total pairwise compute is constant (n²);
       shuffle volume grows ∝B (each block replicated ~B/2×). If
       wall-clock grows ≲2× per 4× blocks, the stage is compute/
       scheduling-bound, NOT shuffle-bound — the property that lets the
       block size be tuned to executor memory without a shuffle penalty.
    2. DATA CURVE — fixed block_rows, ×1/×4/×16 data. Growth is
       inherently quadratic (exact all-pairs IS n²); this row documents
       it honestly. Above ~10⁵ vectors route candidates through LSH
       buckets (``lsh_topk``) and use this verifier per bucket — the
       composition certified end-to-end by ``dedup_pipeline_e2e``.
    """
    from us_weather_energy_analysis_pipeline_spark.operators.similarity import (
        cosine_pairs_filter_refine,
    )

    lines = [
        "\n## Block-pair verifier (cosine_pairs_filter_refine, embeddings ×16 = 32k vecs, dim 64)\n",
        "\n| experiment | setting | sec | vs base |\n|---|---|---|---|\n",
    ]
    emb16 = scaled_embeddings(spark, sf_dir, 16)
    base_t = None
    for block_rows in (8192, 2048, 512):
        # min of 2 — the session's first heavy dgemm/Arrow run reads up
        # to 5× high before C2 compiles the hot loops (r9)
        dt = float("inf")
        for _ in range(2):
            t0 = time.time()
            cosine_pairs_filter_refine(
                emb16, threshold=0.8, block_rows=block_rows
            ).write.format("noop").mode("overwrite").save()
            dt = min(dt, time.time() - t0)
        dt = round(dt, 2)
        base_t = base_t or dt
        lines.append(
            f"| block sweep (B ∝ 1/block_rows) | block_rows={block_rows} "
            f"| {dt} | {round(dt / base_t, 1)}× |\n"
        )
        print(f"block_sweep rows={block_rows}: {dt}s")
    base_t = None
    for factor in (1, 4, 16):
        # force_blocked: the ×1 point must run the SAME blocked machinery
        # as ×4/×16 or the growth curve mixes plans (the footer-gated fast
        # path at ×1 would distort apparent growth — and review r9 showed
        # a sample(1.0) wrapper does NOT defeat the gate: Sample is
        # row-bounded and footer rows remain the bound)
        df = scaled_embeddings(spark, sf_dir, factor)
        dt = float("inf")
        for _ in range(2):
            t0 = time.time()
            cosine_pairs_filter_refine(
                df, threshold=0.8, block_rows=2048, force_blocked=True
            ).write.format("noop").mode("overwrite").save()
            dt = min(dt, time.time() - t0)
        dt = round(dt, 2)
        base_t = base_t or dt
        lines.append(
            f"| data curve (quadratic by definition) | ×{factor} "
            f"| {dt} | {round(dt / base_t, 1)}× |\n"
        )
        print(f"data_curve x{factor}: {dt}s")
    lines.append(
        "\nBlock-sweep reading: the curve is U-shaped in B — too FEW blocks\n"
        "starves parallelism (B² pairs < cores), too many pays task overhead;\n"
        "on the fine-grained leg wall-clock grows ≲2× per 4× blocks, i.e. the\n"
        "stage is compute/scheduling-bound, NOT shuffle-bound — block size can\n"
        "be tuned to executor memory without a shuffle penalty (pick\n"
        "block_rows so B² ≈ a few × total cores). Data curve is quadratic —\n"
        "inherent to EXACT all-pairs; at corpus scale run LSH bucketing first\n"
        "and this verifier per bucket (see dedup_pipeline_e2e).\n"
    )
    return lines


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("scale-probe")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").write.format("noop").mode(
        "overwrite"
    ).save()

    results: dict[str, dict[int, float]] = {n: {} for n in PROBES}
    for factor in (1, 4, 16):
        df = scaled_lineitem(spark, sf_dir, factor)
        for name, fn in PROBES.items():
            # min of 2: single-shot readings on the big generated methods
            # (simhash's 33-agg groupBy) can execute before C2 compiles
            # them — a single cold run once read 5× its steady state,
            # which misreads as a growth-curve violation
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                fn(df).write.format("noop").mode("overwrite").save()
                best = min(best, time.time() - t0)
            results[name][factor] = round(best, 2)
            print(f"{name} x{factor}: {results[name][factor]}s")

    with open("SCALE_PROBE.md", "w") as f:
        f.write(
            "# SCALE_PROBE — wall-clock vs data volume (sf0.1 lineitem ×1/×4/×16)\n\n"
            "Synthesized by unioning the scan with disjoint key ranges (~600k/2.4M/9.6M\n"
            "rows). The check is the growth CURVE: shuffle-bound plans must scale\n"
            "≲linearly with volume.\n\n| probe | ×1 | ×4 | ×16 | ×16/×1 |\n|---|---|---|---|---|\n"
        )
        for name, r in results.items():
            ratio = round(r[16] / r[1], 1) if r[1] else float("nan")
            f.write(f"| {name} | {r[1]} | {r[4]} | {r[16]} | {ratio}× |\n")
        f.writelines(ngram_probe(spark, sf_dir))
        f.writelines(block_pair_probes(spark, sf_dir))
    print("wrote SCALE_PROBE.md")
    spark.stop()


if __name__ == "__main__":
    main()
