"""Mongo extended-JSON dump replay (sources/mongo_dump.py; reference
datasources/nosql/mongodb.py _normalize_document): the file-backed
closure of the NoSQL gap — dump → typed DataFrame → check() e2e,
broker-free (the JDBC/Kafka stand-in pattern)."""

from __future__ import annotations

import datetime
import json
import os

import pytest

from truthound_spark.sources.factory import DataSource, data_source
from truthound_spark.sources.mongo_dump import read_mongo_dump


def _write_dump(path: str) -> None:
    """Canonical + relaxed extended-JSON v2, incl. nested docs/arrays."""
    docs = [
        {
            "_id": {"$oid": "64d2b1f4e13e4a2f9c8b4567"},
            "name": "alice",
            "age": {"$numberInt": "34"},
            "balance": {"$numberDecimal": "1250.75"},
            "visits": {"$numberLong": "9876543210"},
            "score": {"$numberDouble": "0.875"},
            "joined": {"$date": "2023-08-11T17:54:14.692Z"},
            "last_seen": {"$date": {"$numberLong": "1691776454692"}},
            "blob": {"$binary": {"base64": "aGVsbG8=", "subType": "00"}},
            "address": {"city": "seoul", "zip": {"$numberInt": "04524"}},
            "tags": ["a", "b"],
            "events": [
                {"ts": {"$date": {"$numberLong": "1691776454000"}}, "kind": "login"}
            ],
        },
        {
            "_id": {"$oid": "64d2b1f4e13e4a2f9c8b4568"},
            "name": "bob",
            "age": {"$numberInt": "41"},
            "balance": {"$numberDecimal": "-3.5"},
            "visits": {"$numberLong": "12"},
            "score": {"$numberDouble": "0.5"},
            "joined": {"$date": "2024-01-01T00:00:00Z"},
            "last_seen": {"$date": {"$numberLong": "1704067200000"}},
            "blob": {"$binary": {"base64": "d29ybGQ=", "subType": "00"}},
            "address": {"city": "tokyo", "zip": {"$numberInt": "10001"}},
            "tags": ["c"],
            "events": [],
        },
    ]
    with open(path, "w") as f:
        for d in docs:
            f.write(json.dumps(d) + "\n")


@pytest.fixture()
def dump(tmp_path):
    p = str(tmp_path / "users.jsonl")
    _write_dump(p)
    return p


def test_dump_replay_delivers_connector_dtypes(spark, dump):
    df = read_mongo_dump(spark, dump)
    dt = dict(df.dtypes)
    assert dt["_id"] == "string"
    assert dt["age"] == "int"
    assert dt["visits"] == "bigint"
    assert dt["balance"] == "double"  # Decimal128 → float, reference :498
    assert dt["score"] == "double"
    assert dt["joined"] == "timestamp" and dt["last_seen"] == "timestamp"
    assert dt["blob"] == "binary"
    assert dt["address"] == "struct<city:string,zip:int>"
    assert "array<struct<kind:string,ts:timestamp>>" in dt["events"] or dt[
        "events"
    ].startswith("array<struct")

    rows = {r["name"]: r for r in df.collect()}
    a = rows["alice"]
    assert a["_id"] == "64d2b1f4e13e4a2f9c8b4567"
    assert a["age"] == 34 and a["visits"] == 9876543210
    assert a["balance"] == 1250.75
    assert bytes(a["blob"]) == b"hello"
    assert a["address"]["zip"] == 4524
    # relaxed ISO date and canonical millis land on the same instant
    assert a["joined"] == datetime.datetime(2023, 8, 11, 17, 54, 14, 692000)
    assert a["last_seen"] == datetime.datetime(2023, 8, 11, 17, 54, 14, 692000)
    assert a["events"][0]["kind"] == "login"
    assert rows["bob"]["events"] == []


def test_datasource_kind_mongodb_dump_path_e2e_check(spark, dump):
    """The full loop: data_source(mongodb dump config) → load → the
    public check() API over the replayed collection."""
    from truthound_spark.api import check
    from truthound_spark.validators.distribution import RangeValidator
    from truthound_spark.validators.uniqueness import UniqueValidator

    src = data_source(
        {"kind": "mongodb", "options": {"dump_path": dump}}
    )
    assert isinstance(src, DataSource)
    df = src.load(spark)
    res = check(df, validators=[UniqueValidator(columns=["_id"]), "null"])
    assert res.success
    bad = check(df, validators=[RangeValidator("age", 0, 40)])
    assert not bad.success and bad.issues[0].count == 1  # bob is 41


def test_sampling_contract_applies_to_dump_replay(spark, dump):
    src = DataSource(kind="mongodb", options={"dump_path": dump}, max_rows=1)
    assert src.load(spark).count() == 1


def test_normalization_is_map_only(spark, dump):
    plan = (
        read_mongo_dump(spark, dump)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
