"""Corpus-wide pure plan-BUILD survey (VERDICT r10 task 1).

Times each registered query's ``spark_fn(spark, sf_dir)`` call alone —
no action executed — min-of-N per query. This is the py4j/analysis cost
the bench pays on every timed run (bench rebuilds each DataFrame per
run); at 100 TB it amortizes to zero, on the sf0.1 bench it was ~16 s of
the 45.6 s r9 corpus total.

Usage: python scripts/build_survey.py [sf_dir] [reps]
Prints one line per query (slowest first) + the total, and a final JSON
line for the round log.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from us_weather_energy_analysis_pipeline_spark.corpus.registry import (  # noqa: E402
    REGISTRY,
    _ensure_loaded,
)
from us_weather_energy_analysis_pipeline_spark.operators import cache  # noqa: E402
from us_weather_energy_analysis_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark()
    _ensure_loaded()
    # warm the table-catalog cache + py4j so query 1 isn't charged for it
    for q in list(REGISTRY.values())[:3]:
        q.spark_fn(spark, sf_dir)
        cache.release_all()
    out: dict[str, float] = {}
    for name, q in REGISTRY.items():
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            q.spark_fn(spark, sf_dir)
            dt = time.perf_counter() - t0
            cache.release_all()
            best = min(best, dt)
        out[name] = best
    total = sum(out.values())
    for name, dt in sorted(out.items(), key=lambda kv: -kv[1]):
        print(f"{dt:8.3f}  {name}")
    print(f"{total:8.3f}  TOTAL ({len(out)} queries, min-of-{reps})")
    print(json.dumps({"build_total_sec": round(total, 3), "n": len(out)}))


if __name__ == "__main__":
    main()
