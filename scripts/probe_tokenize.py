"""Isolated A/B for the text-stats re-tokenization constant (VERDICT r5
task 5): which part of split(ascii_lower(trim(text))) trails DuckDB —
the translate-based lowering, the split, the array ops, or the explode?
Plus a tokenize-once staged variant for the 5-query family.

    python scripts/probe_tokenize.py [sf_dir] [reps]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from us_weather_energy_analysis_pipeline_spark.corpus.registry import load
from us_weather_energy_analysis_pipeline_spark.functions.text import ascii_lower
from us_weather_energy_analysis_pipeline_spark.session import get_spark

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 4

spark = get_spark("probe-tok", master="local[32]")
d = load(spark, SF, "documents").select("doc_id", "text")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


trimmed = F.trim(F.col("text"))
low = ascii_lower(trimmed)
toks = F.split(low, " ")

PROBES = [
    ("A scan text -> noop", lambda: noop(d)),
    ("B + trim only", lambda: noop(d.select("doc_id", trimmed.alias("t")))),
    ("C + trim+translate (ascii_lower)", lambda: noop(d.select("doc_id", low.alias("t")))),
    ("C2 + trim+lower (unicode fast path)", lambda: noop(d.select("doc_id", F.lower(trimmed).alias("t")))),
    ("D + split -> array out", lambda: noop(d.select("doc_id", toks.alias("tk")))),
    ("E size(split) only", lambda: noop(d.select("doc_id", F.size(toks).alias("n")))),
    (
        "F repetition: size(distinct)/size",
        lambda: noop(
            d.select(
                "doc_id",
                (
                    F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
                ).alias("r"),
            )
        ),
    ),
    (
        "G zipf-style: explode -> token counts",
        lambda: noop(
            d.select(F.explode(toks).alias("tok"))
            .groupBy("tok")
            .agg(F.count(F.lit(1)).alias("n"))
        ),
    ),
    (
        "G2 explode WITHOUT lowering",
        lambda: noop(
            d.select(F.explode(F.split(trimmed, " ")).alias("tok"))
            .groupBy("tok")
            .agg(F.count(F.lit(1)).alias("n"))
        ),
    ),
    (
        "G3 lower AFTER explode (post-shuffle? no - pre)",
        lambda: noop(
            d.select(F.explode(F.split(trimmed, " ")).alias("tok"))
            .select(ascii_lower(F.col("tok")).alias("tok"))
            .groupBy("tok")
            .agg(F.count(F.lit(1)).alias("n"))
        ),
    ),
]

best = {name: 1e9 for name, _ in PROBES}
for rep in range(REPS):
    for name, fn in PROBES:
        t0 = time.perf_counter()
        fn()
        best[name] = min(best[name], time.perf_counter() - t0)
for name, _ in PROBES:
    print(f"{name:45s} {best[name]:6.3f}s")

# staged-family probe: 3 consumers of the token array — recompute vs
# persist-once
fam_exprs = [
    lambda df: df.select("doc_id", F.size("tk").alias("n")),
    lambda df: df.select(
        "doc_id", (F.size(F.array_distinct("tk")).cast("double") / F.size("tk")).alias("r")
    ),
    lambda df: df.select(F.explode("tk").alias("tok")).groupBy("tok").agg(F.count("*").alias("n")),
]
tok_df = d.select("doc_id", toks.alias("tk"))


def family_recompute():
    for q in fam_exprs:
        noop(q(tok_df))


def family_staged():
    staged = tok_df.persist()
    try:
        for q in fam_exprs:
            noop(q(staged))
    finally:
        staged.unpersist()


for name, fn in (
    ("FAM recompute x3", family_recompute),
    ("FAM staged persist x3", family_staged),
):
    b = 1e9
    for _ in range(REPS):
        t0 = time.perf_counter()
        fn()
        b = min(b, time.perf_counter() - t0)
    print(f"{name:45s} {b:6.3f}s")

import duckdb

con = duckdb.connect()
con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')")
for label, sql in (
    ("duck zipf-style token counts", """
        SELECT t AS tok, COUNT(*) n FROM (
          SELECT unnest(string_split(translate(trim(text),
            'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' ')) AS t
          FROM documents) GROUP BY 1"""),
    ("duck repetition ratio", """
        SELECT doc_id, len(list_distinct(string_split(translate(trim(text),
          'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' ')))::DOUBLE
          / len(string_split(translate(trim(text),
          'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' ')) AS r
        FROM documents"""),
):
    b = 1e9
    for _ in range(REPS):
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        b = min(b, time.perf_counter() - t0)
    print(f"{label:45s} {b:6.3f}s")

spark.stop()
