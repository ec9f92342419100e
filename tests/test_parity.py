"""Reference-name parity: aliases resolve, new validators behave."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import truthound_spark as th
from truthound_spark.core.registry import get_validator, list_validators


def test_reference_core7_names_resolve():
    for name in ["null", "duplicate", "type", "range", "outlier", "format", "unique"]:
        assert get_validator(name) is not None


def test_alias_targets_share_class():
    pairs = [
        ("ks_test", "ks_drift"),
        ("type", "mixed_type"),
        ("swift", "swift_bic"),
        ("streaming_null", "null"),
        ("optimized_mahalanobis", "mahalanobis"),
        ("composite_foreign_key", "foreign_key"),
    ]
    for alias, target in pairs:
        assert get_validator(alias) is get_validator(target)


def test_alias_does_not_rehome_category():
    assert get_validator("null").category == "completeness"
    assert get_validator("mahalanobis").category == "anomaly"


def test_registry_size_at_least_reference():
    # reference registers 263 built-in validators (SURVEY.md §2)
    assert len(list_validators()) >= 263


def test_column_mean_validator(spark):
    df = spark.createDataFrame(
        [(1.0, 3.0, 2.0), (2.0, 4.0, 3.0), (1.0, 2.0, 9.0)],
        "a double, b double, m double",
    )
    v = get_validator("column_mean")(["a", "b"], "m")
    issues = v.validate(df)
    assert issues and issues[0].count == 1


def test_polygon_distance_validator(spark):
    # square around origin; (0,0) inside -> 0 km; (0, 0.5) within ~56 km;
    # (50, 50) thousands of km away
    square = [(-1.0, -1.0), (-1.0, 1.0), (1.0, 1.0), (1.0, -1.0)]
    df = spark.createDataFrame(
        [(0.0, 0.0), (0.0, 0.5), (50.0, 50.0)], "lat double, lon double"
    )
    v = get_validator("polygon_distance")("lat", "lon", square, max_distance_km=200.0)
    issues = v.validate(df)
    assert issues and issues[0].count == 1


def test_schema_validator_flags_out_of_range(spark):
    from truthound_spark.schema import learn

    clean = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") % 10).cast("double").alias("v")
    )
    baseline = learn(clean)
    drifted = clean.union(
        spark.createDataFrame([(100, 999.0)], "k long, v double")
    )
    v = get_validator("schema")(baseline)
    issues = v.validate(drifted)
    assert any("v" == i.column for i in issues)


def test_streaming_positive_validator(spark):
    df = spark.createDataFrame([(1.0,), (-2.0,), (0.0,), (None,)], "x double")
    res = th.check(df, validators=[get_validator("streaming_positive")(["x"])])
    assert res.issues and res.issues[0].count == 2


def test_online_svm_gated(spark):
    pytest.importorskip("sklearn")
    df = spark.range(500).select(
        (F.col("id") % 50).cast("double").alias("a"),
        (F.col("id") % 7).cast("double").alias("b"),
    )
    issues = get_validator("online_svm")(["a", "b"], sample_rows=500).validate(df)
    assert isinstance(issues, list)  # flags some fraction or none; no crash


def test_polygon_distance_ignores_null_coords(spark):
    square = [(-1.0, -1.0), (-1.0, 1.0), (1.0, 1.0), (1.0, -1.0)]
    df = spark.createDataFrame(
        [(0.0, 0.0), (None, 5.0), (50.0, None)], "lat double, lon double"
    )
    from truthound_spark.core.registry import get_validator

    issues = get_validator("polygon_distance")("lat", "lon", square, 10.0).validate(df)
    assert issues == []  # null-coordinate rows are not distance violations
