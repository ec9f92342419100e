"""Training-data export operators: sharding, packing, split, streaming dedup."""

from __future__ import annotations

import os
import tempfile
import time

from pyspark.sql import functions as F

from truthound_spark.pipeline.export import (
    pack_sequences,
    shard_by_hash,
    streaming_dedup,
    train_val_split,
    write_shards,
)


def _docs(spark, n=200):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("document body "), (F.col("id") % 50).cast("string")).alias("text"),
    )


def test_shard_by_hash_stable_and_complete(spark):
    df = _docs(spark)
    a = shard_by_hash(df, 8).select("doc_id", "shard").collect()
    b = shard_by_hash(df.repartition(13), 8).select("doc_id", "shard").collect()
    assert dict((r["doc_id"], r["shard"]) for r in a) == dict(
        (r["doc_id"], r["shard"]) for r in b
    )
    shards = {r["shard"] for r in a}
    assert shards <= set(range(8)) and len(shards) > 1


def test_write_shards_layout(spark):
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "out")
        write_shards(_docs(spark), path, n_shards=4)
        back = spark.read.parquet(path)
        assert back.count() == 200
        assert sorted(r["shard"] for r in back.select("shard").distinct().collect()) == [
            0,
            1,
            2,
            3,
        ]
        # partition pruning: reading one shard touches one directory
        one = spark.read.parquet(path).filter(F.col("shard") == 2)
        assert one.count() == shard_by_hash(_docs(spark), 4).filter(
            F.col("shard") == 2
        ).count()


def test_train_val_split_no_content_leak(spark):
    df = _docs(spark)  # 50 distinct texts, each appears 4x
    train, val = train_val_split(df, val_fraction=0.3)
    t_texts = {r["text"] for r in train.select("text").distinct().collect()}
    v_texts = {r["text"] for r in val.select("text").distinct().collect()}
    assert not (t_texts & v_texts)
    assert train.count() + val.count() == 200


def test_pack_sequences_budget_and_coverage(spark):
    df = _docs(spark, 100)
    packed = pack_sequences(df, max_tokens=12, n_shards=4)
    rows = packed.collect()
    assert all(r["total_tokens"] <= 12 for r in rows)
    all_ids = sorted(i for r in rows for i in r["doc_ids"])
    assert all_ids == list(range(100))
    # greedy fill: bins per shard should be far fewer than docs per shard
    assert len(rows) < 100


def test_streaming_dedup_drops_repeats(spark, tmp_path):
    src = str(tmp_path / "in")
    os.makedirs(src)
    batch = spark.createDataFrame(
        [(1, "same text", "2024-01-01 00:00:00"),
         (2, "same text", "2024-01-01 00:00:01"),
         (3, "other", "2024-01-01 00:00:02")],
        "doc_id long, text string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    batch.write.parquet(src + "/f1")
    stream = (
        spark.readStream.schema("doc_id long, text string, ts timestamp")
        .parquet(src + "/*")
    )
    deduped = streaming_dedup(stream, watermark="1 hour")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM dedup_out").collect()
    texts = sorted(r["text"] for r in out)
    assert texts == ["other", "same text"]


def test_clean_text_and_scrub(spark):
    from truthound_spark.pipeline.text import clean_text, scrub_pii_text

    df = spark.createDataFrame(
        [("<b>Hello</b>   world https://x.io/a?b=1 mail me: a.b@c.io or +1 (555) 123-4567",)],
        "text string",
    )
    out = df.select(
        scrub_pii_text(clean_text(F.col("text"))).alias("t")
    ).collect()[0]["t"]
    assert out == "Hello world mail me: <EMAIL> or <PHONE>"


def test_repetition_signals_and_gopher_filter(spark):
    from truthound_spark.pipeline.text import gopher_filter, repetition_signals

    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam spam spam spam spam"),
            (2, "a perfectly ordinary sentence with mostly unique words here"),
            (3, "line\nline\nline\nline"),
        ],
        "doc_id long, text string",
    )
    sig = {r["doc_id"]: r for r in repetition_signals(df).collect()}
    assert sig[1]["top_word_fraction"] == 1.0
    assert sig[1]["dup_word_fraction"] > 0.8
    assert sig[3]["dup_line_fraction"] == 0.75
    assert sig[2]["dup_word_fraction"] < 0.2
    kept = [r["doc_id"] for r in gopher_filter(df).collect()]
    assert kept == [2]


def test_pack_sequences_null_text_and_string_ids(spark):
    from truthound_spark.pipeline.export import pack_sequences

    df = spark.createDataFrame(
        [("doc:a", "one two three"), ("doc:b", None), ("doc:c", "four five")],
        "doc_id string, text string",
    )
    rows = pack_sequences(df, max_tokens=10, n_shards=2).collect()
    packed = sorted(i for r in rows for i in r["doc_ids"])
    assert packed == ["doc:a", "doc:b", "doc:c"]  # null text packed at 0 tokens


def test_train_val_split_bounds(spark):
    import pytest

    from truthound_spark.pipeline.export import train_val_split

    df = _docs(spark, 500)
    # a tiny fraction floors to 1 bucket (not 0) — still a valid partition
    train, val = train_val_split(df, val_fraction=0.00001, buckets=100)
    assert train.count() + val.count() == 500
    with pytest.raises(ValueError):
        train_val_split(df, val_fraction=1.5)
    # fraction 0 is an explicit no-validation split
    tr0, va0 = train_val_split(df, val_fraction=0.0)
    assert va0.count() == 0 and tr0.count() == 500
