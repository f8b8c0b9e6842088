"""Training-side ×1/×4/×16 scale probe for the two r13 registrations:
perceptual-hash dedup (multimodal_phash_dedup) and per-group weighted
sampling (weighted_sample_by_group). Documents scaled by doc_id-shifted,
vowel-rotated copies — exactly the r12 Bloom probe's corpus growth.
Appends a result table to SCALE_PROBE.md.

    python scripts/scale_probe_r13.py [sf_dir]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from us_weather_energy_analysis_pipeline_spark.corpus.mm_stream_q import (
    multimodal_phash_dedup_from,
)
from us_weather_energy_analysis_pipeline_spark.corpus.sampling_q import (
    weighted_sample_by_group_from,
)
from us_weather_energy_analysis_pipeline_spark.operators import cache
from us_weather_energy_analysis_pipeline_spark.session import get_spark

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

spark = get_spark("scale-probe-r13", master="local[32]")
docs = spark.read.parquet(f"{SF}/documents.parquet")
docs.write.format("noop").mode("overwrite").save()  # warm
# warm the Arrow worker pool so ×1 isn't charged the cold fork
spark.range(100).mapInPandas(lambda it: it, "id long").write.format(
    "noop"
).mode("overwrite").save()


def timed(df) -> float:
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        cache.release_all()
        best = min(best, time.time() - t0)
    return round(best, 2)


def docs_scaled(factor: int):
    """Corpus ×factor: doc_id-shifted, vowel-rotated AND per-copy-salted
    copies. The salt suffix makes every copy's payload distinct even
    where the vowel rotation is the identity (i % 5 == 0 — at ×16 that
    is copies 0/5/10/15, which would otherwise form 4-way exact phash
    clusters and skew the measurement; ADVICE r13); lang kept so the
    sampler's strata grow in place."""
    d = docs.select("doc_id", "lang", "text")
    shift = 10_000_000
    vowels = "aeiou"
    parts = []
    for i in range(factor):
        rot = vowels[i % 5 :] + vowels[: i % 5]
        parts.append(
            d.select(
                (F.col("doc_id") + F.lit(i * shift)).alias("doc_id"),
                "lang",
                F.concat(
                    F.translate("text", vowels, rot), F.lit(f" ~{i}")
                ).alias("text"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


lines = [
    "\n## r13: phash dedup + per-group weighted sample, corpus ×1/×4/×16\n\n",
    "| scale | phash sec | phash vs ×1 | group-sample sec | sample vs ×1 |\n"
    "|---|---|---|---|---|\n",
]
base_ph = base_ws = None
for factor in (1, 4, 16):
    d = docs_scaled(factor)
    sec_ph = timed(multimodal_phash_dedup_from(d))
    sec_ws = timed(weighted_sample_by_group_from(d))
    if base_ph is None:
        base_ph, base_ws = sec_ph, sec_ws
    lines.append(
        f"| ×{factor} | {sec_ph} | {sec_ph / base_ph:.1f}× | "
        f"{sec_ws} | {sec_ws / base_ws:.1f}× |\n"
    )
    print(lines[-1], end="")

with open(Path(__file__).resolve().parents[1] / "SCALE_PROBE.md", "a") as f:
    f.writelines(lines)
