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
