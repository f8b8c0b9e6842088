"""Scale probes for the two plans VERDICT r5 flagged as unprobed
(task 9): decontaminate_ngram_overlap with the TRAINING side grown
×1/×4/×16 (eval slice — the broadcast build side — held constant), and
dedup_simhash_pairs over ×1/×4/×16 documents. Appends result tables to
SCALE_PROBE.md.

    python scripts/scale_probe_r6.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from scale_probe import scaled_documents  # vowel-rotated disjoint copies

from us_weather_energy_analysis_pipeline_spark.corpus.cleanse_q import (
    EVAL_SOURCE,
    decontaminate_from,
)
from us_weather_energy_analysis_pipeline_spark.operators import cache
from us_weather_energy_analysis_pipeline_spark.operators.dedup import (
    simhash_near_dups,
)
from us_weather_energy_analysis_pipeline_spark.session import get_spark

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

sys.path.insert(0, "scripts")

spark = get_spark("scale-probe-r6", master="local[32]")
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
    broadcast gram set is CONSTANT across factors."""
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
    "\n## r6: decontamination, training side ×1/×4/×16 (eval/broadcast side constant)\n\n",
    "| scale | train docs | sec | vs ×1 |\n|---|---|---|---|\n",
]
base = None
for factor in (1, 4, 16):
    d = decon_scaled(factor)
    sec = timed(decontaminate_from(d))
    n = 4750 * factor
    if base is None:
        base = sec
    lines.append(f"| ×{factor} | {n:,} | {sec} | {round(sec / base, 1)}× |\n")
    print(lines[-1], end="")

lines += [
    "\nThe eval gram set (the broadcast build) is held at the copy-0\n",
    "slice, so its size is constant by construction; the curve above is\n",
    "the training-stream cost only — gram explode, per-doc distinct and\n",
    "the broadcast probe are all linear in training volume, no pairwise\n",
    "term anywhere in the plan.\n",
    "\n## r6: simhash banded pairs, documents ×1/×4/×16 (vowel-rotated copies)\n\n",
    "| scale | docs | sec | vs ×1 |\n|---|---|---|---|\n",
]
base = None
for factor in (1, 4, 16):
    d = scaled_documents(spark, SF, factor)
    sec = timed(simhash_near_dups(d, max_hamming=6))
    if base is None:
        base = sec
    lines.append(f"| ×{factor} | {5000 * factor:,} | {sec} | {round(sec / base, 1)}× |\n")
    print(lines[-1], end="")

lines += [
    "\nSimHash reading: the fingerprint map stage is linear; the banded\n",
    "bucket join grows with per-band bucket occupancy (rotated copies\n",
    "share band bytes at random-collision rates, the realistic regime).\n",
]

with open("SCALE_PROBE.md", "a") as f:
    f.writelines(lines)
print("appended to SCALE_PROBE.md")
spark.stop()
