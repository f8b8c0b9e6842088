"""Randomized fuzz gate for the Structured Streaming jobs (VERDICT r4
item 10): the fixed-fixture tests in test_streaming.py pin one trace
each — this module drives the same jobs over SEEDED RANDOM event streams
cut into RANDOM micro-batch splits, checking micro-batch results against
the batch-equivalent plan on the union of the input. The invariant under
test is split-invariance: with no late data (watermark looser than any
disorder in the stream), a streaming job must produce exactly what the
batch plan produces on the same rows, no matter how the rows were
chopped into micro-batches.

Null injection is part of the generator — this gate found the
state-poisoning bug in stateful_running_total (NaN carried forever once
a null value ended a batch) and pinned the null-event-time drop
semantics of the windowed rollup.
"""

from __future__ import annotations

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

from us_weather_energy_analysis_pipeline_spark.streaming.jobs import (
    sessionize,
    stateful_running_total,
    stream_daily_rollup,
    stream_dedup,
    stream_interval_join,
)

BASE = dt.datetime(2024, 3, 1)


def _write_batches(spark, path, rows, schema, rng, max_batches=4):
    """Split rows into 1..max_batches random contiguous chunks, one
    part-file each (maxFilesPerTrigger=1 turns each into a micro-batch,
    in file order — parquet file listing is lexicographic by write time
    here because `append` names parts uniquely and the source sorts by
    modification time; chunk order is what we rely on)."""
    n_b = rng.randint(1, max_batches)
    cuts = sorted(rng.sample(range(len(rows) + 1), min(n_b - 1, len(rows))))
    chunks = [
        rows[a:b] for a, b in zip([0] + cuts, cuts + [len(rows)])
    ]
    chunks = [rng.sample(c, len(c)) for c in chunks]  # disorder WITHIN a batch
    for chunk in chunks:
        df = spark.createDataFrame(chunk, schema) if chunk else None
        if df is not None:
            df.repartition(1).write.mode("append").parquet(path)
    return len([c for c in chunks if c])


def _drain(spark, sdf, name, ckpt, mode):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(f"SELECT * FROM {name}")


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_fuzz_running_total_split_invariant(spark, tmp_path, seed):
    """Random values (10% null), random micro-batch split of an
    IN-ORDER stream (the operator accumulates in arrival order — rows
    are shuffled within each batch, never across batches): per-row
    totals must equal the batch window SUM(value) OVER (ORDER BY ts),
    i.e. the result is a function of the data, not of the split."""
    rng = random.Random(seed)
    rows = []
    # unique ts per user: ties across batch boundaries are documented as
    # caller-resolved (see stateful_running_total docstring)
    for uid in range(1, 4 + rng.randint(0, 2)):
        for i in rng.sample(range(200), rng.randint(0, 40)):
            val = None if rng.random() < 0.10 else round(rng.uniform(-5, 5), 3)
            rows.append((BASE + dt.timedelta(minutes=i), uid, val))
    rows.sort(key=lambda r: r[0])
    schema = "ts timestamp, user_id long, value double"
    src = str(tmp_path / "src")
    _write_batches(spark, src, rows, schema, rng)
    if not rows:
        return
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    got = {
        (r["user_id"], r["ts"]): r["running_total"]
        for r in _drain(
            spark, stateful_running_total(stream), f"fz_rt_{seed}",
            str(tmp_path / "ck"), "append",
        ).collect()
    }
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = {
        (r["user_id"], r["ts"]): r["rt"]
        for r in spark.createDataFrame(rows, schema)
        .select("user_id", "ts", F.sum("value").over(w).alias("rt"))
        .collect()
    }
    assert set(got) == set(want)
    for k in want:
        if want[k] is None:
            assert got[k] is None, k
        else:
            assert got[k] == pytest.approx(want[k], abs=1e-9), k


@pytest.mark.parametrize("seed", [21, 22, 23])
def test_fuzz_daily_rollup_split_invariant(spark, tmp_path, seed):
    """Random events over 5 days (5% null ts, null city groups kept),
    random split, watermark far looser than the disorder: streaming
    result == batch groupBy on the non-null-ts rows."""
    rng = random.Random(seed)
    schema = "ts timestamp, city string, value double"
    rows = []
    for _ in range(rng.randint(1, 120)):
        ts = (
            None
            if rng.random() < 0.05
            else BASE + dt.timedelta(hours=rng.randint(0, 120))
        )
        city = rng.choice(["A", "B", None, "Ωmega"])
        rows.append((ts, city, round(rng.uniform(0, 100), 2)))
    src = str(tmp_path / "src")
    _write_batches(spark, src, rows, schema, rng)
    sdf = stream_daily_rollup(
        spark, src, schema, "ts", "value", ("city",), watermark="30 days"
    )
    got = {
        (r["day_start"], r["city"]): (r["daily_total"], r["n_rows"])
        for r in _drain(
            spark, sdf, f"fz_roll_{seed}", str(tmp_path / "ck"), "complete"
        ).collect()
    }
    want = {
        (r["d"], r["city"]): (r["t"], r["n"])
        for r in spark.createDataFrame(rows, schema)
        .filter(F.col("ts").isNotNull())
        .groupBy(F.date_trunc("day", "ts").alias("d"), "city")
        .agg(F.sum("value").alias("t"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # null-ts rows dropped, null-city group preserved; sums compared with
    # a tolerance (parallel summation order differs between the plans)
    assert set(got) == set(want)
    for k, (t, n) in want.items():
        assert got[k][1] == n and got[k][0] == pytest.approx(t, rel=1e-12), k


@pytest.mark.parametrize("seed", [31, 32, 33])
def test_fuzz_stream_dedup_split_invariant(spark, tmp_path, seed):
    """Duplicate event_ids injected across random batch splits, loose
    watermark: exactly one survivor per key, and every survivor is a
    genuine input row for that key."""
    rng = random.Random(seed)
    schema = "ts timestamp, event_id long, payload string"
    rows = []
    for _ in range(rng.randint(1, 80)):
        eid = rng.randint(1, 25)
        rows.append(
            (
                BASE + dt.timedelta(minutes=rng.randint(0, 59)),
                eid,
                f"p{eid}-{rng.randint(0, 9)}",
            )
        )
    src = str(tmp_path / "src")
    _write_batches(spark, src, rows, schema, rng)
    if not rows:
        return
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    out = _drain(
        spark,
        stream_dedup(stream, ("event_id",), "ts", watermark="1 hour"),
        f"fz_dedup_{seed}",
        str(tmp_path / "ck"),
        "append",
    ).collect()
    assert sorted(r["event_id"] for r in out) == sorted({r[1] for r in rows})
    inputs = {(r[0], r[1], r[2]) for r in rows}
    for r in out:
        assert (r["ts"], r["event_id"], r["payload"]) in inputs


@pytest.mark.parametrize("seed", [41, 42, 43])
def test_fuzz_interval_join_split_invariant(spark, tmp_path, seed):
    """Random view/purchase streams, random splits on BOTH sides, loose
    watermarks: stream-stream join == the batch join under the same
    interval condition."""
    rng = random.Random(seed)
    schema = "ts timestamp, user_id long, value double"
    mk = lambda n: [
        (
            BASE + dt.timedelta(minutes=rng.randint(0, 300)),
            rng.randint(1, 8),
            round(rng.uniform(1, 50), 2),
        )
        for _ in range(n)
    ]
    views, purchases = mk(rng.randint(1, 40)), mk(rng.randint(1, 40))
    vsrc, psrc = str(tmp_path / "v"), str(tmp_path / "p")
    _write_batches(spark, vsrc, views, schema, rng)
    _write_batches(spark, psrc, purchases, schema, rng)
    vs = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(vsrc)
    ps = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(psrc)
    out = _drain(
        spark,
        stream_interval_join(vs, ps, max_gap="1 hour", watermark="100 hours"),
        f"fz_ij_{seed}",
        str(tmp_path / "ck"),
        "append",
    ).collect()
    got = sorted(
        (r["user_id"], r["view_ts"], r["purchase_ts"], r["purchase_value"])
        for r in out
    )
    vb = spark.createDataFrame(views, schema)
    pb = spark.createDataFrame(purchases, schema)
    want = sorted(
        (r["user_id"], r["view_ts"], r["purchase_ts"], r["purchase_value"])
        for r in stream_interval_join(
            vb, pb, max_gap="1 hour", watermark="100 hours"
        ).collect()
    )
    assert got == want


@pytest.mark.parametrize("seed", [51, 52])
def test_fuzz_sessionize_matches_bruteforce(spark, seed):
    """session_window vs a driver-side brute force: per-user sort, split
    where the gap to the previous event is >= the session gap (session
    windows are half-open [ts, ts+gap) — touching windows do NOT merge).
    Ties in ts collapse into one event time, so they are allowed."""
    rng = random.Random(seed)
    gap_min = 30
    rows = [
        (
            BASE + dt.timedelta(minutes=rng.randint(0, 2000)),
            rng.randint(1, 6),
            round(rng.uniform(0, 10), 2),
        )
        for _ in range(rng.randint(1, 150))
    ]
    df = spark.createDataFrame(rows, "ts timestamp, user_id long, value double")
    got = sorted(
        (
            r["user_id"],
            r["session_start"],
            r["session_last_event"],
            r["n_events"],
            round(r["total_value"], 6),
        )
        for r in sessionize(df, "ts", ("user_id",), "value", f"{gap_min} minutes").collect()
    )
    by_user: dict[int, list[tuple[dt.datetime, float]]] = {}
    for ts, uid, val in rows:
        by_user.setdefault(uid, []).append((ts, val))
    want = []
    for uid, evs in by_user.items():
        evs.sort()
        sess: list[list[tuple[dt.datetime, float]]] = []
        for ev in evs:
            if sess and (ev[0] - sess[-1][-1][0]) < dt.timedelta(minutes=gap_min):
                sess[-1].append(ev)
            else:
                sess.append([ev])
        for s in sess:
            want.append(
                (
                    uid,
                    s[0][0],
                    s[-1][0],
                    len(s),
                    round(sum(v for _, v in s), 6),
                )
            )
    assert got == sorted(want)
