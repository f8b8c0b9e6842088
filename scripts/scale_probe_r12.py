"""Training-side ×1/×4/×16 scale probe for the Bloom-prefilter
decontamination twin (VERDICT r11 item 7), paired against the broadcast
variant on the identical scaled input. Eval slice (the filter build
side) held constant at the copy-0 original, exactly like the r6 probe.
Appends a result table to SCALE_PROBE.md.

    python scripts/scale_probe_r12.py [sf_dir]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from us_weather_energy_analysis_pipeline_spark.corpus.cleanse_q import (
    EVAL_SOURCE,
    decontaminate_bloom_from,
    decontaminate_from,
)
from us_weather_energy_analysis_pipeline_spark.operators import cache
from us_weather_energy_analysis_pipeline_spark.session import get_spark

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

spark = get_spark("scale-probe-r12", master="local[32]")
docs = spark.read.parquet(f"{SF}/documents.parquet")
docs.write.format("noop").mode("overwrite").save()  # warm


def timed(df) -> float:
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        cache.release_all()
        best = min(best, time.time() - t0)
    return round(best, 2)


def decon_scaled(factor: int):
    """Training side ×factor (doc_id-shifted, vowel-rotated copies of the
    non-eval sources); the eval slice stays the copy-0 original, so the
    Bloom build side is CONSTANT across factors."""
    d = docs.select("doc_id", "source", "text")
    ev = d.filter(F.col("source") == EVAL_SOURCE)
    tr = d.filter(F.col("source") != EVAL_SOURCE)
    shift = 10_000_000
    vowels = "aeiou"
    parts = [ev]
    for i in range(factor):
        rot = vowels[i % 5 :] + vowels[: i % 5]
        parts.append(
            tr.select(
                (F.col("doc_id") + F.lit(i * shift)).alias("doc_id"),
                "source",
                F.translate("text", vowels, rot).alias("text"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


lines = [
    "\n## r12: Bloom-prefilter decontamination, training side ×1/×4/×16"
    " (eval/filter build side constant)\n\n",
    "| scale | bloom sec | broadcast sec | bloom vs ×1 |\n|---|---|---|---|\n",
]
base = None
for factor in (1, 4, 16):
    d = decon_scaled(factor)
    sec_bloom = timed(decontaminate_bloom_from(d))
    sec_bcast = timed(decontaminate_from(d))
    if base is None:
        base = sec_bloom
    lines.append(
        f"| ×{factor} | {sec_bloom} | {sec_bcast} | {round(sec_bloom / base, 1)}× |\n"
    )
    print(lines[-1], end="")

lines += [
    "\nThe Bloom vector build (eval side) is constant by construction;\n",
    "the training stream pays k O(1) array probes per gram inside the\n",
    "scan stage, and only Bloom survivors (~99.3% pruned at ×1, see\n",
    "BENCH_AB.md r12) reach the SHUFFLE_HASH exact-join exchange — the\n",
    "curve is the linear gram-explode + probe cost, no pairwise term.\n",
]

with open(Path(__file__).resolve().parents[1] / "SCALE_PROBE.md", "a") as f:
    f.writelines(lines)
print("appended to SCALE_PROBE.md")
