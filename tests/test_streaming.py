"""Structured Streaming tests: availableNow drains over temp-dir file
sources, checked against the batch-equivalent plans."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from us_weather_energy_analysis_pipeline_spark.streaming.jobs import (
    sessionize,
    stateful_running_total,
    stream_daily_rollup,
)

SCHEMA = "ts timestamp, city string, value double"


@pytest.fixture()
def events_dir(spark, tmp_path):
    rows = []
    base = dt.datetime(2024, 1, 1)
    for d in range(3):
        for h in range(0, 24, 3):
            for city in ("A", "B"):
                rows.append((base + dt.timedelta(days=d, hours=h), city, 10.0 + h))
    df = spark.createDataFrame(rows, SCHEMA)
    path = str(tmp_path / "events")
    df.write.mode("overwrite").parquet(path)
    return path


def test_stream_daily_rollup_matches_batch(spark, events_dir, tmp_path):
    sdf = stream_daily_rollup(spark, events_dir, SCHEMA, "ts", "value", ("city",))
    assert sdf.isStreaming
    q = (
        sdf.writeStream.format("memory")
        .queryName("rollup_test")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["day_start"].date(), r["city"]): (r["daily_total"], r["n_rows"])
        for r in spark.sql("SELECT * FROM rollup_test").collect()
    }
    batch = (
        spark.read.parquet(events_dir)
        .groupBy(F.to_date("ts").alias("day"), "city")
        .agg(F.sum("value").alias("t"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    want = {(r["day"], r["city"]): (r["t"], r["n"]) for r in batch}
    assert got == want
    assert len(got) == 6  # 3 days × 2 cities


def test_sessionize_batch_gap_split(spark):
    rows = [
        (dt.datetime(2024, 1, 1, 10, 0), 1, 1.0),
        (dt.datetime(2024, 1, 1, 10, 10), 1, 2.0),  # same session (gap 10m)
        (dt.datetime(2024, 1, 1, 11, 0), 1, 3.0),   # 50m gap → new session
        (dt.datetime(2024, 1, 1, 10, 0), 2, 5.0),
    ]
    df = spark.createDataFrame(rows, "ts timestamp, user_id long, value double")
    out = sessionize(df, "ts", ("user_id",), "value", "30 minutes").collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    assert len(by_user[1]) == 2
    first = min(by_user[1], key=lambda r: r["session_start"])
    assert first["n_events"] == 2 and first["total_value"] == 3.0
    assert first["session_last_event"] == dt.datetime(2024, 1, 1, 10, 10)
    assert len(by_user[2]) == 1


def test_stateful_running_total_across_batches(spark, tmp_path):
    """applyInPandasWithState keeps per-user state across micro-batches:
    feed two files, drain with availableNow (processed as separate
    batches), check totals accumulate."""
    src = str(tmp_path / "src")
    schema = "ts timestamp, user_id long, value double"
    df1 = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1, 10), 1, 1.0), (dt.datetime(2024, 1, 1, 11), 1, 2.0)],
        schema,
    )
    # one part-file per logical batch — with maxFilesPerTrigger=1 each file
    # becomes its own micro-batch, in file order
    df1.repartition(1).write.mode("append").parquet(src)
    df2 = spark.createDataFrame([(dt.datetime(2024, 1, 2, 10), 1, 4.0)], schema)
    df2.repartition(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    out = stateful_running_total(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("rt_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM rt_test ORDER BY ts").collect()
    assert [r["running_total"] for r in rows] == [1.0, 3.0, 7.0]


def test_multimodal_fake_decode_plumbing(spark):
    from us_weather_energy_analysis_pipeline_spark.operators.multimodal import (
        decode_image,
        fake_decode_meta,
        to_blob_table,
    )

    docs = spark.createDataFrame([(1, "hello world"), (2, "abc")], "doc_id long, text string")
    blobs = to_blob_table(docs)
    meta = {r["doc_id"]: r for r in fake_decode_meta(blobs).collect()}
    assert meta[1]["n_bytes"] == 11
    import hashlib

    h = hashlib.md5(b"hello world").hexdigest()
    assert meta[1]["width"] == 64 + int(h[0:4], 16) % 960
    assert meta[1]["height"] == 64 + int(h[4:8], 16) % 960
    with pytest.raises(NotImplementedError):
        decode_image(blobs)


def test_watermark_drops_late_rows(spark, tmp_path):
    """Late-data semantics: a row arriving AFTER the watermark passed its
    window is dropped deterministically (append mode) instead of mutating
    emitted history.

    NB Trigger.AvailableNow plans all pending batches with the watermark
    as of query START, so the late filter only engages across RUNS — this
    drains twice over one checkpoint (restart restores the watermark from
    the offset log), which is exactly the incremental-batch deployment
    shape."""
    src = str(tmp_path / "late_src")
    ckpt = str(tmp_path / "ckpt_late")
    out = str(tmp_path / "late_out")
    schema = "ts timestamp, city string, value double"
    out_schema = "day_start timestamp, city string, daily_total double, n_rows bigint"
    d = dt.datetime

    def drain():
        sdf = stream_daily_rollup(spark, src, schema, "ts", "value", ("city",))
        q = (
            sdf.writeStream.format("parquet")
            .outputMode("append")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {
            r["day_start"].date(): r["daily_total"]
            for r in spark.read.schema(out_schema).parquet(out).collect()
        }

    # run 1: days 1 and 3 → watermark checkpointed at Jan 2 10:00
    spark.createDataFrame(
        [(d(2024, 1, 1, 10), "A", 1.0), (d(2024, 1, 3, 10), "A", 3.0)], schema
    ).repartition(1).write.mode("append").parquet(src)
    drain()

    # run 2: one on-time row (day 4) + one LATE row for day 1 — the
    # restored watermark (Jan 2 10:00) must drop the late row
    spark.createDataFrame(
        [(d(2024, 1, 4, 10), "A", 4.0), (d(2024, 1, 1, 23), "A", 100.0)], schema
    ).repartition(1).write.mode("append").parquet(src)
    got2 = drain()

    # day-1's window closed in run 2 with ONLY the on-time value
    assert got2.get(dt.date(2024, 1, 1)) == 1.0
    assert 100.0 not in got2.values()
    assert 101.0 not in got2.values()
