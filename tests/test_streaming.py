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


def test_stream_dedup_within_watermark(spark, tmp_path):
    """Replayed (at-least-once) events collapse to one row per event_id;
    batch fallback uses plain dropDuplicates."""
    from us_weather_energy_analysis_pipeline_spark.streaming.jobs import stream_dedup

    src = str(tmp_path / "dup_src")
    schema = "ts timestamp, event_id long, value double"
    d = dt.datetime
    rows = [
        (d(2024, 1, 1, 10, 0), 1, 1.0),
        (d(2024, 1, 1, 10, 0), 1, 1.0),  # exact replay
        (d(2024, 1, 1, 10, 5), 2, 2.0),
        (d(2024, 1, 1, 10, 6), 2, 2.0),  # replay within watermark
        (d(2024, 1, 1, 10, 9), 3, 3.0),
    ]
    # one FILE per row + maxFilesPerTrigger=1 → each replay arrives in a
    # LATER micro-batch, so the watermark-scoped dedup state (not plain
    # in-batch dropDuplicates) is what collapses it
    for row in rows:
        spark.createDataFrame([row], schema).repartition(1).write.mode(
            "append"
        ).parquet(src)
    sdf = stream_dedup(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        ("event_id",),
        "ts",
        "1 hour",
    )
    q = (
        sdf.writeStream.format("memory")
        .queryName("dedup_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_dd"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT event_id, COUNT(*) AS n FROM dedup_test GROUP BY event_id").collect()
    assert {r["event_id"]: r["n"] for r in got} == {1: 1, 2: 1, 3: 1}

    # batch fallback
    bdf = stream_dedup(spark.createDataFrame(rows, schema), ("event_id",))
    assert bdf.count() == 3


def test_stream_dedup_state_evicts_after_watermark(spark, tmp_path):
    """Pins the WATERMARK-SCOPED semantics (and bounded state) of
    dropDuplicatesWithinWatermark: once the watermark passes a key's
    expiry (event ts + delay), its dedup state is EVICTED, so a
    re-occurrence of the same key with a fresh timestamp is emitted
    again. Plain dropDuplicates keeps key state forever (unbounded at
    100 TB) and would suppress the re-occurrence — this test FAILS if
    the implementation is swapped to it."""
    from us_weather_energy_analysis_pipeline_spark.streaming.jobs import stream_dedup

    src = str(tmp_path / "evict_src")
    schema = "ts timestamp, event_id long, value double"
    d = dt.datetime
    batches = [
        (d(2024, 1, 1, 10, 0), 1, 1.0),  # b1: first occurrence of key 1
        (d(2024, 1, 1, 10, 5), 1, 1.0),  # b2: replay within delay → dropped
        (d(2024, 1, 1, 13, 0), 2, 2.0),  # b3: watermark → 12:00 (> key-1 expiry)
        (d(2024, 1, 1, 13, 5), 3, 3.0),  # b4: state cleanup applies (1-batch lag)
        (d(2024, 1, 1, 13, 10), 1, 9.0),  # b5: key 1 again, fresh ts → EMITTED
    ]
    for row in batches:
        spark.createDataFrame([row], schema).repartition(1).write.mode(
            "append"
        ).parquet(src)
    sdf = stream_dedup(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        ("event_id",),
        "ts",
        "1 hour",
    )
    q = (
        sdf.writeStream.format("memory")
        .queryName("dedup_evict_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_ev"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["event_id"]: r["n"]
        for r in spark.sql(
            "SELECT event_id, COUNT(*) AS n FROM dedup_evict_test GROUP BY event_id"
        ).collect()
    }
    assert got == {1: 2, 2: 1, 3: 1}


def test_stream_interval_join_matches_batch(spark, tmp_path):
    """Stream-stream interval join: purchase within 1h after a view.
    Checked against the identical batch join."""
    from us_weather_energy_analysis_pipeline_spark.streaming.jobs import (
        stream_interval_join,
    )

    d = dt.datetime
    schema = "ts timestamp, user_id long, value double"
    views = [
        (d(2024, 1, 1, 10, 0), 1, 0.0),
        (d(2024, 1, 1, 12, 0), 1, 0.0),
        (d(2024, 1, 1, 10, 0), 2, 0.0),
    ]
    purchases = [
        (d(2024, 1, 1, 10, 30), 1, 9.99),   # matches view@10 only
        (d(2024, 1, 1, 12, 45), 1, 19.99),  # matches view@12 only
        (d(2024, 1, 1, 15, 0), 2, 5.0),     # no view within 1h → dropped
    ]
    v_src, p_src = str(tmp_path / "v"), str(tmp_path / "p")
    spark.createDataFrame(views, schema).repartition(1).write.parquet(v_src)
    spark.createDataFrame(purchases, schema).repartition(1).write.parquet(p_src)

    out = stream_interval_join(
        spark.readStream.schema(schema).parquet(v_src),
        spark.readStream.schema(schema).parquet(p_src),
    )
    q = (
        out.writeStream.format("memory")
        .queryName("ssj_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_ssj"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r["user_id"], r["view_ts"], r["purchase_value"])
        for r in spark.sql("SELECT * FROM ssj_test").collect()
    )
    batch = stream_interval_join(
        spark.createDataFrame(views, schema), spark.createDataFrame(purchases, schema)
    )
    want = sorted(
        (r["user_id"], r["view_ts"], r["purchase_value"]) for r in batch.collect()
    )
    assert got == want
    assert got == [
        (1, d(2024, 1, 1, 10, 0), 9.99),
        (1, d(2024, 1, 1, 12, 0), 19.99),
    ]


def test_foreach_batch_upsert_idempotent_merge(spark, tmp_path):
    """Micro-batches merge into the parquet target by key: a re-sent key
    replaces the old row instead of duplicating it."""
    from us_weather_energy_analysis_pipeline_spark.streaming.jobs import (
        foreach_batch_upsert,
    )

    d = dt.datetime
    schema = "ts timestamp, k long, value double"
    src = str(tmp_path / "up_src")
    target = str(tmp_path / "target")

    # batch 1: keys 1, 2 — batch 2: key 2 updated + key 3 new
    spark.createDataFrame(
        [(d(2024, 1, 1, 10), 1, 1.0), (d(2024, 1, 1, 10), 2, 2.0)], schema
    ).repartition(1).write.mode("append").parquet(src)
    spark.createDataFrame(
        [(d(2024, 1, 1, 11), 2, 22.0), (d(2024, 1, 1, 11), 3, 3.0)], schema
    ).repartition(1).write.mode("append").parquet(src)

    sdf = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    q = foreach_batch_upsert(sdf, target, ("k",), str(tmp_path / "ckpt_up"))
    q.awaitTermination()

    got = {r["k"]: r["value"] for r in spark.read.parquet(target).collect()}
    assert got == {1: 1.0, 2: 22.0, 3: 3.0}
