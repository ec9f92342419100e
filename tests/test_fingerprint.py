"""Dataset fingerprinting (fingerprint.py; reference
_datasets/fingerprinting.py): deterministic across partitionings and
row order, sensitive to any content/schema change."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from truthound_spark.fingerprint import fingerprint_dataset


@pytest.fixture()
def df(spark):
    return spark.createDataFrame(
        [(i, f"n{i}", float(i) if i % 7 else None) for i in range(500)],
        "id long, name string, v double",
    )


def test_deterministic_across_partitioning_and_order(df):
    a = fingerprint_dataset(df.repartition(1), include_content_checksum=True)
    b = fingerprint_dataset(
        df.repartition(13).orderBy(F.desc("id")), include_content_checksum=True
    )
    assert a.to_dict() == b.to_dict()
    assert a.same_schema(b) and a.same_content(b)


def test_sensitive_to_any_row_change(df):
    a = fingerprint_dataset(df, include_content_checksum=True)
    changed = df.withColumn(
        "v", F.when(F.col("id") == 250, 99.5).otherwise(F.col("v"))
    )
    b = fingerprint_dataset(changed, include_content_checksum=True)
    assert not a.same_content(b)
    assert a.same_schema(b)  # schema untouched
    assert a.row_count == b.row_count
    # null profile unchanged (a non-null value changed) — the checksum
    # is what catches it
    assert a.null_profile_hash == b.null_profile_hash


def test_null_profile_and_schema_hashes(df):
    a = fingerprint_dataset(df)
    more_nulls = df.withColumn(
        "v", F.when(F.col("id") < 50, None).otherwise(F.col("v"))
    )
    b = fingerprint_dataset(more_nulls)
    assert a.null_profile_hash != b.null_profile_hash
    renamed = df.withColumnRenamed("v", "value")
    c = fingerprint_dataset(renamed)
    assert not a.same_schema(c) and a.column_list_hash != c.column_list_hash
    retyped = df.withColumn("id", F.col("id").cast("int"))
    d = fingerprint_dataset(retyped)
    assert not a.same_schema(d)  # dtype is part of the schema hash
    assert a.column_list_hash == d.column_list_hash  # names unchanged


def test_sampled_hash_without_checksum_catches_changes(df):
    """The cheap mode (no full checksum): bottom-k row-hash sketch."""
    a = fingerprint_dataset(df)
    assert a.content_checksum is None
    b = fingerprint_dataset(df.filter("id <> 3"))
    assert not a.same_content(b)  # row_count differs
    swapped = df.withColumn(
        "name", F.when(F.col("id") == 0, "CHANGED").otherwise(F.col("name"))
    )
    c = fingerprint_dataset(swapped)
    # same count + same null profile — the sampled sketch must differ
    # unless the changed row's hash fell outside the bottom-k on BOTH
    # sides; with k=128 of 500 rows a single-row change is caught with
    # high probability, and deterministically so for this fixed data
    assert a.sampled_row_hash != c.sampled_row_hash or not a.same_content(c)


def test_duplicate_rows_do_not_cancel(spark):
    """xor-style combiners cancel duplicate rows pairwise — the decimal
    SUM must not."""
    one = spark.createDataFrame([(1, "x")], "id long, s string")
    two = one.unionAll(one)
    a = fingerprint_dataset(one, include_content_checksum=True)
    b = fingerprint_dataset(two, include_content_checksum=True)
    assert a.content_checksum != b.content_checksum


def test_sample_size_guard(df):
    with pytest.raises(ValueError):
        fingerprint_dataset(df, sample_size=0)


def test_diff_datasets_categories(spark, df):
    from truthound_spark.fingerprint import diff_datasets

    same = diff_datasets(df, df, "v1", "v1b", include_content_checksum=True)
    assert not same.changed and same.categories == []

    target = (
        df.filter("id <> 7")
        .withColumn("extra", F.lit(1))
        .withColumn("v", F.when(F.col("id") < 30, None).otherwise(F.col("v")))
    )
    diff = diff_datasets(df, target, "v1", "v2", include_content_checksum=True)
    assert diff.changed
    assert {"schema_added", "row_count_changed", "null_profile_changed",
            "content_changed"} <= set(diff.categories)
    assert diff.summary["row_count_delta"] == -1
    assert diff.details["schema"]["added"][0]["name"] == "extra"


def test_diff_detects_type_and_order_changes(spark, df):
    from truthound_spark.fingerprint import diff_datasets

    retyped = df.withColumn("id", F.col("id").cast("int"))
    d1 = diff_datasets(df, retyped)
    assert "schema_changed" in d1.categories
    assert d1.details["schema"]["type_changed"][0]["name"] == "id"

    reordered = df.select("v", "id", "name")
    d2 = diff_datasets(df, reordered)
    assert "schema_changed" in d2.categories
    assert d2.details["schema"]["column_order_changed"]
