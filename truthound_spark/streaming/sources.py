"""Streaming source wiring (reference: datasources/streaming/kafka.py,
realtime/streaming.py:191-330 Kafka, :348-424 Kinesis, :492-558 PubSub).

Each builder returns a configured ``readStream`` DataFrame. Connector
availability differs per deployment (the Kafka integration jar, the
kinesis/pubsub connectors), so builders validate + assemble options —
pure config plumbing, unit-testable without the connector — and only touch
the network when ``load()`` runs on a cluster that ships the jar.

JSON payload decoding follows the reference's envelope: value bytes →
``from_json(schema)`` columns + kafka metadata columns.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def kafka_options(
    bootstrap_servers: str,
    topic: str | None = None,
    topic_pattern: str | None = None,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = None,
    extra: dict[str, str] | None = None,
) -> dict[str, str]:
    """Assemble spark-sql-kafka reader options (reference kafka.py poll
    config → Structured Streaming option names)."""
    if (topic is None) == (topic_pattern is None):
        raise ValueError("exactly one of topic / topic_pattern is required")
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "startingOffsets": starting_offsets,
    }
    if topic is not None:
        opts["subscribe"] = topic
    else:
        opts["subscribePattern"] = topic_pattern
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    opts.update(extra or {})
    return opts


def read_kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str | None = None,
    value_schema: Any | None = None,
    **kwargs: Any,
) -> DataFrame:
    """Kafka → streaming DataFrame. With ``value_schema`` the JSON value is
    decoded into columns alongside (topic, partition, offset, timestamp)."""
    opts = kafka_options(bootstrap_servers, topic=topic, **kwargs)
    reader = spark.readStream.format("kafka")
    for k, v in opts.items():
        reader = reader.option(k, v)
    raw = reader.load()
    if value_schema is None:
        return raw
    return decode_kafka_envelope(raw, value_schema)


def decode_kafka_envelope(raw: DataFrame, value_schema: Any) -> DataFrame:
    """Kafka message envelope → typed columns: value bytes decode via
    ``from_json(schema)`` next to the (topic, partition, offset,
    timestamp) metadata. Factored out of :func:`read_kafka_stream` so the
    IDENTICAL decode plan runs against any kafka-SHAPED frame — the live
    broker reader, a file-replayed topic dump (how the e2e test drives
    it without a broker in the sandbox, the same move that closed the
    JDBC gap with a file-backed DuckDB), or a batch backfill of archived
    messages. Map-only; the JSON parse is JVM-side ``from_json``, never
    a Python UDF."""
    return raw.select(
        F.col("topic"),
        F.col("partition"),
        F.col("offset"),
        F.col("timestamp"),
        F.from_json(F.col("value").cast("string"), value_schema).alias("payload"),
    ).select("topic", "partition", "offset", "timestamp", "payload.*")


def kinesis_options(
    stream_name: str,
    region: str,
    endpoint_url: str | None = None,
    starting_position: str = "LATEST",
    extra: dict[str, str] | None = None,
) -> dict[str, str]:
    """spark-kinesis connector options (reference realtime/streaming.py:348)."""
    opts = {
        "streamName": stream_name,
        "region": region,
        "startingPosition": starting_position,
    }
    if endpoint_url:
        opts["endpointUrl"] = endpoint_url
    opts.update(extra or {})
    return opts


def pubsub_options(
    project_id: str,
    subscription: str,
    extra: dict[str, str] | None = None,
) -> dict[str, str]:
    """GCP Pub/Sub Lite / pubsub connector options
    (reference realtime/streaming.py:492)."""
    opts = {"projectId": project_id, "subscriptionId": subscription}
    opts.update(extra or {})
    return opts


def read_file_stream(
    spark: SparkSession,
    path: str,
    schema: Any,
    format: str = "json",
    max_files_per_trigger: int | None = None,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """File-source streaming reader: poll a growing directory (reference
    datasources/streaming file-watch role; Structured Streaming's
    broker-free ingestion path — each newly landed file becomes part of
    the next micro-batch, exactly-once via the checkpoint's file log).

    ``schema`` is required: streaming reads cannot infer (Spark would
    have to list-and-sample on every trigger). ``max_files_per_trigger``
    bounds batch size for backfills over large landings."""
    if format not in ("json", "csv", "parquet", "text", "orc"):
        raise ValueError(f"unsupported file stream format: {format}")
    reader = spark.readStream.schema(schema).format(format)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    return reader.load(path)


def read_rate_stream(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    """Built-in rate source — the connector-free stand-in used by tests and
    local development (reference MockStreamingSource role)."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
    )
