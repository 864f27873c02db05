"""T-row semantics (SURVEY §2 T1-T6) — batch-equivalence and the watermark
late-drop behavior under a controlled two-batch replay."""

import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import TESTDATA_ROOT

SF = f"{TESTDATA_ROOT}/sf0.001"


def test_stream_counts_equal_batch(spark):
    from scalemine_spark.streaming import stream_type_counts

    got = {r["event_type"]: r["n"] for r in stream_type_counts(spark, SF).collect()}
    ev = spark.read.parquet(f"{SF}/events.parquet")
    exp = {r["event_type"]: r["count"] for r in ev.groupBy("event_type").count().collect()}
    assert got == exp


def test_stream_dedup_equals_distinct(spark):
    from scalemine_spark.streaming import stream_dedup_count

    got = stream_dedup_count(spark, SF).collect()[0]["n_unique"]
    ev = spark.read.parquet(f"{SF}/events.parquet")
    assert got == ev.select("event_id").distinct().count()


def test_stateful_counts_equal_batch(spark):
    from scalemine_spark.streaming import stateful_user_counts

    got = {r["user_id"]: r["n_events"] for r in stateful_user_counts(spark, SF).collect()}
    ev = spark.read.parquet(f"{SF}/events.parquet")
    exp = {r["user_id"]: r["count"] for r in ev.groupBy("user_id").count().collect()}
    assert got == exp


def test_watermark_drops_late_rows(spark, tmp_path):
    """Two-file replay, maxFilesPerTrigger=1: batch 1 advances the watermark;
    a batch-2 row older than (max_ts_batch1 - delay) must be dropped from the
    windowed aggregation, a fresh row must not be."""
    import uuid

    base = "2024-01-01 10:{m:02d}:00"
    b1 = [(1, base.format(m=0)), (2, base.format(m=50))]  # watermark -> 10:40
    b2 = [(3, base.format(m=5)), (4, base.format(m=55))]  # 10:05 late, 10:55 ok
    d1 = spark.createDataFrame(b1, "id long, ts_s string").select(
        "id", F.col("ts_s").cast("timestamp").alias("ts")
    )
    d2 = spark.createDataFrame(b2, "id long, ts_s string").select(
        "id", F.col("ts_s").cast("timestamp").alias("ts")
    )
    src = str(tmp_path / "src")
    d1.coalesce(1).write.mode("append").parquet(src)

    name = "wm" + uuid.uuid4().hex[:8]
    stream = (
        spark.readStream.schema("id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "10 minutes"))
        .agg(F.count("*").alias("n"))
    )
    q = (
        stream.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        q.processAllAvailable()  # batch 1 -> watermark advances to 10:40
        d2.coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()  # batch 2: id=3 (10:05) late -> dropped
    finally:
        q.stop()
    rows = spark.table(name).select(
        F.date_format("window.start", "HH:mm").alias("w"), "n"
    ).collect()
    counts: dict[str, int] = {}
    for r in rows:
        counts[r["w"]] = max(counts.get(r["w"], 0), r["n"])
    assert counts.get("10:00") == 1  # id=3 NOT added to the 10:00 window
    assert counts.get("10:50") == 2  # id=4 joined id=2's window
