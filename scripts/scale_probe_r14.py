"""Corpus ×1/×4/×16 scale probe for the r14 registration:
embed_kmeans_round (the end-to-end Lloyd iteration). Embeddings grown by
vec_id-shifted copies with a per-copy deterministic perturbation of the
first dimension (distinct payloads; labels KEPT, so the cell count — and
with it every exchange bound in the plan — stays constant while the scan
grows). Appends a result table to SCALE_PROBE.md.

    python scripts/scale_probe_r14.py [sf_dir]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from us_weather_energy_analysis_pipeline_spark.corpus.similarity_q import (
    embed_kmeans_round_from,
)
from us_weather_energy_analysis_pipeline_spark.operators import cache
from us_weather_energy_analysis_pipeline_spark.session import get_spark

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

spark = get_spark("scale-probe-r14", master="local[32]")
emb = spark.read.parquet(f"{SF}/embeddings.parquet")
emb.write.format("noop").mode("overwrite").save()  # warm
spark.range(100).mapInPandas(lambda it: it, "id long").write.format(
    "noop"
).mode("overwrite").save()  # warm the Arrow worker pool


def timed(df) -> float:
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        cache.release_all()
        best = min(best, time.time() - t0)
    return round(best, 2)


def emb_scaled(factor: int):
    """Embeddings ×factor: vec_id-shifted copies whose dim-0 value is
    nudged by a per-copy epsilon (distinct vectors, same cluster
    structure); labels kept so n_cells — the bound on every exchange in
    the plan — is constant across factors."""
    shift = 10_000_000
    parts = []
    for i in range(factor):
        parts.append(
            emb.select(
                (F.col("vec_id") + F.lit(i * shift)).alias("vec_id"),
                "label",
                F.expr(
                    f"transform(embedding, (x, j) -> CASE WHEN j = 0 "
                    f"THEN cast(x + {i} * 1e-4 as float) ELSE x END)"
                ).alias("embedding"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


lines = [
    "\n## r14: end-to-end k-means Lloyd round, corpus ×1/×4/×16 (cells constant)\n\n",
    "| scale | kmeans sec | vs ×1 |\n|---|---|---|\n",
]
base = None
for factor in (1, 4, 16):
    sec = timed(embed_kmeans_round_from(spark, emb_scaled(factor)))
    if base is None:
        base = sec
    lines.append(f"| ×{factor} | {sec} | {sec / base:.1f}× |\n")
    print(lines[-1], end="")

with open(Path(__file__).resolve().parents[1] / "SCALE_PROBE.md", "a") as f:
    f.writelines(lines)
