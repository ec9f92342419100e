"""Streaming source option builders + stateful operator tests."""

import tempfile
import time

from pyspark.sql import functions as F

from truthound_spark.streaming.sources import (
    kafka_options,
    kinesis_options,
    pubsub_options,
    read_rate_stream,
)


def test_kafka_option_assembly():
    opts = kafka_options("k1:9092,k2:9092", topic="events", max_offsets_per_trigger=500)
    assert opts["kafka.bootstrap.servers"] == "k1:9092,k2:9092"
    assert opts["subscribe"] == "events"
    assert opts["maxOffsetsPerTrigger"] == "500"
    pat = kafka_options("k:9092", topic_pattern="ev.*", starting_offsets="earliest")
    assert pat["subscribePattern"] == "ev.*" and pat["startingOffsets"] == "earliest"
    try:
        kafka_options("k:9092")
        assert False, "should require topic xor pattern"
    except ValueError:
        pass


def test_kinesis_pubsub_options():
    assert kinesis_options("s", "us-east-1")["startingPosition"] == "LATEST"
    assert pubsub_options("p", "sub")["subscriptionId"] == "sub"


def test_stateful_running_stats(spark):
    """applyInPandasWithState keeps per-key state across micro-batches."""
    from truthound_spark.streaming.stateful import running_column_stats

    rate = read_rate_stream(spark, rows_per_second=500)
    keyed = rate.select(
        (F.col("value") % 4).alias("k"), F.col("value").cast("double").alias("v")
    )
    stats = running_column_stats(keyed, "k", "v", min_value=0, max_value=10)

    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            stats.writeStream.format("memory")
            .queryName("running_stats")
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            deadline = time.time() + 60
            rows = []
            while time.time() < deadline:
                q.processAllAvailable()
                rows = spark.sql(
                    "SELECT key, max(count) AS c, max(violations) AS viol "
                    "FROM running_stats GROUP BY key"
                ).collect()
                if len(rows) == 4 and all(r["c"] >= 3 for r in rows):
                    break
                time.sleep(1)
        finally:
            q.stop()
    assert len(rows) == 4
    # values beyond 10 violate the [0, 10] range per key
    assert any(r["viol"] > 0 for r in rows)


def test_watermark_drops_late_data(spark, tmp_path):
    """withWatermark + windowed agg: events later than the watermark delay
    must be dropped from closed windows (SURVEY §2.10 lateness mapping)."""
    import json
    import os

    src = tmp_path / "stream_in"
    src.mkdir()
    out_ckpt = str(tmp_path / "ckpt")

    schema = "ts TIMESTAMP, v INT"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    agged = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").cast("string").alias("start"), "n")
    )

    def write_batch(name, rows):
        with open(src / name, "w") as f:
            for ts, v in rows:
                f.write(json.dumps({"ts": ts, "v": v}) + "\n")

    # batch 1: events in window 10:00 + one at 11:00 (advances watermark
    # to 10:50 → the 10:00-10:10 window is closed)
    write_batch("b1.json", [("2024-01-01 10:01:00", 1), ("2024-01-01 10:02:00", 2),
                            ("2024-01-01 11:00:00", 3)])
    q = (
        agged.writeStream.format("memory")
        .queryName("wm_agg")
        .outputMode("append")
        .option("checkpointLocation", out_ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: a VERY late event for the closed 10:00 window
        write_batch("b2.json", [("2024-01-01 10:03:00", 4)])
        q.processAllAvailable()
        # batch 3: advance watermark far so all open windows emit
        write_batch("b3.json", [("2024-01-01 12:00:00", 5)])
        q.processAllAvailable()
        rows = {r["start"]: r["n"] for r in spark.sql("SELECT * FROM wm_agg").collect()}
    finally:
        q.stop()
    # the 10:00 window emitted with ONLY the 2 on-time events — the late
    # arrival (v=4) was dropped past the watermark
    ten_oclock = [v for k, v in rows.items() if "10:00" in k]
    assert ten_oclock == [2], rows


def test_streaming_near_dedup_cross_batch(spark, tmp_path):
    """MinHash+LSH dedup state persists across micro-batches: a near-dup
    arriving in batch 2 is flagged against batch 1's canonical."""
    import json

    from truthound_spark.streaming.stateful import streaming_near_dedup

    src = tmp_path / "docs_in"
    src.mkdir()
    ckpt = str(tmp_path / "dedup_ckpt")

    base = ("the quick brown fox jumps over the lazy dog while the rain "
            "falls gently on the quiet green meadow beside the old stone bridge")
    variant = base.replace("old stone bridge", "old stone wall")
    other = ("completely different content about distributed sql engines "
             "catalyst optimizer whole stage codegen and parquet column pruning")

    def write_batch(name, rows):
        with open(src / name, "w") as f:
            for i, txt in rows:
                f.write(json.dumps({"doc_id": i, "text": txt}) + "\n")

    write_batch("b1.json", [(1, base), (2, other)])

    stream = (
        spark.readStream.schema("doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    alerts = streaming_near_dedup(stream, threshold=0.5, num_hashes=64, bands=16)
    q = (
        alerts.writeStream.format("memory")
        .queryName("near_dedup_alerts")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.sql("SELECT * FROM near_dedup_alerts").count() == 0

        write_batch("b2.json", [(3, variant)])
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT DISTINCT doc_id, dup_of FROM near_dedup_alerts"
        ).collect()
        assert rows and all(r["doc_id"] == 3 and r["dup_of"] == 1 for r in rows)
        est = spark.sql("SELECT max(est_jaccard) AS e FROM near_dedup_alerts").collect()[0]["e"]
        assert est >= 0.5
    finally:
        q.stop()


def test_streaming_near_dedup_validates_bands(spark):
    import pytest as _pytest

    from truthound_spark.streaming.stateful import streaming_near_dedup

    stream = spark.readStream.format("rate").load().selectExpr(
        "value AS doc_id", "CAST(value AS STRING) AS text"
    )
    with _pytest.raises(ValueError):
        streaming_near_dedup(stream, num_hashes=64, bands=7)
