"""Isolated stage-split micro-benchmark for cooccurrence_pairs (VERDICT
r5 task 4): where do the 0.35 s of data-time go — the events scan, the
to_date projection, the (user, day) collect_set shuffle (ObjectHashAgg),
or the pair expansion? Plus a bit_or-bitmask alternative that keeps the
aggregation inside whole-stage codegen. Min-of-N, interleaved reps.

    python scripts/probe_cooccurrence.py [sf_dir] [reps]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from us_weather_energy_analysis_pipeline_spark.corpus.registry import load
from us_weather_energy_analysis_pipeline_spark.functions.text import ordered_pairs
from us_weather_energy_analysis_pipeline_spark.session import get_spark

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3

spark = get_spark("probe-cooc", master="local[32]")
e = load(spark, SF, "events")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


base = e.select("user_id", F.to_date("ts").alias("day"), "event_type")
no_date = e.select("user_id", "event_type")

sets = (
    base.groupBy("user_id", "day")
    .agg(F.sort_array(F.collect_set("event_type")).alias("ts_"))
    .filter(F.size("ts_") >= 2)
)
full = (
    sets.select(F.explode(ordered_pairs("ts_", "type_a", "type_b")).alias("p"))
    .groupBy(F.col("p.type_a").alias("type_a"), F.col("p.type_b").alias("type_b"))
    .agg(F.count(F.lit(1)).alias("n"))
)

# bitmask variant: dict of types (1 tiny job), bit_or agg (codegen),
# pair expansion from set bits
types = sorted(
    r["event_type"] for r in e.select("event_type").distinct().collect()
)
T = len(types)
tarr = "array(" + ", ".join(f"'{t}'" for t in types) + ")"
bit = F.expr(
    f"shiftleft(1L, cast(array_position({tarr}, event_type) as int) - 1)"
)
masked = (
    base.select("user_id", "day", bit.alias("b"))
    .groupBy("user_id", "day")
    .agg(F.bit_or("b").alias("m"))
    .filter(F.bit_count("m") >= 2)
)
bits = f"filter(sequence(0, {T - 1}), i -> ((m >> i) & 1) = 1)"
pair_expr = F.expr(
    f"flatten(transform({bits}, (x, i) -> "
    f"transform(slice({bits}, i + 2, {T}), "
    f"y -> struct(element_at({tarr}, x + 1) AS type_a, "
    f"element_at({tarr}, y + 1) AS type_b))))"
)
full_mask = (
    masked.select(F.explode(pair_expr).alias("p"))
    .groupBy(F.col("p.type_a").alias("type_a"), F.col("p.type_b").alias("type_b"))
    .agg(F.count(F.lit(1)).alias("n"))
)

# C3: aggregate masks to their count first (≤2^T distinct masks), THEN
# expand pairs on the tiny mask table — pair HOF runs on ≤2^T rows.
mask_counts = masked.groupBy("m").agg(F.count(F.lit(1)).alias("cnt"))
full_mask_rollup = (
    mask_counts.select("cnt", F.explode(pair_expr).alias("p"))
    .groupBy(F.col("p.type_a").alias("type_a"), F.col("p.type_b").alias("type_b"))
    .agg(F.sum("cnt").alias("n"))
)

PROBES = [
    ("A  scan+project u,to_date,type -> noop", lambda: noop(base)),
    ("A2 scan+project u,type only -> noop", lambda: noop(no_date)),
    ("B  + groupBy(u,d).collect_set -> noop", lambda: noop(sets)),
    ("B2 + groupBy(u,d).bit_or mask -> noop", lambda: noop(masked)),
    ("C  full current (collect_set+pairs)", lambda: noop(full)),
    ("C2 full bitmask (bit_or+bit pairs)", lambda: noop(full_mask)),
    ("C3 bitmask + mask-count rollup", lambda: noop(full_mask_rollup)),
]

best = {name: 1e9 for name, _ in PROBES}
for rep in range(REPS):
    for name, fn in PROBES:
        t0 = time.perf_counter()
        fn()
        best[name] = min(best[name], time.perf_counter() - t0)
for name, _ in PROBES:
    print(f"{name:45s} {best[name]:6.3f}s")

# sanity: both plans emit identical results
a = {tuple(r) for r in full.collect()}
b = {tuple(r) for r in full_mask.collect()}
print("plans agree:", a == b, f"({len(a)} pairs)")
n_events = e.count()
n_keys = base.groupBy("user_id", "day").count().count()
print(f"events rows: {n_events:,}; (user,day) keys: {n_keys:,}; types: {T}")
spark.stop()
