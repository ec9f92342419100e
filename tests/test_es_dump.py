"""Elasticsearch dump replay (sources/es_dump.py; reference
datasources/nosql/elasticsearch.py _source unwrap + ES_TYPE_MAPPING +
_parse_mapping_properties): the file-backed closure of the last NoSQL
sub-partial — export file → typed, flattened DataFrame → check() e2e,
cluster-free (the JDBC/Kafka/Mongo stand-in pattern)."""

from __future__ import annotations

import datetime
import json

import pytest

from truthound_spark.sources.es_dump import parse_mapping, read_es_dump
from truthound_spark.sources.factory import DataSource, data_source

MAPPING = {
    "logs": {
        "mappings": {
            "properties": {
                "user": {"type": "keyword"},
                "age": {"type": "integer"},
                "visits": {"type": "long"},
                "score": {"type": "scaled_float", "scaling_factor": 100},
                "active": {"type": "boolean"},
                "joined": {"type": "date"},
                "last_seen": {"type": "date", "format": "epoch_millis"},
                "payload": {"type": "binary"},
                "vec": {"type": "dense_vector", "dims": 3},
                "geo": {
                    "properties": {
                        "city": {"type": "keyword"},
                        "zip": {"type": "integer"},
                    }
                },
            }
        }
    }
}

DOCS = [
    {
        "user": "alice",
        "age": 34,
        "visits": 9876543210,
        "score": 0.875,
        "active": True,
        "joined": "2023-08-11T17:54:14.692Z",
        "last_seen": 1691776454692,
        "payload": "aGVsbG8=",
        "vec": [0.1, 0.2, 0.3],
        "geo": {"city": "seoul", "zip": 4524},
    },
    {
        "user": "bob",
        "age": 41,
        "visits": 12,
        "score": 0.5,
        "active": False,
        "joined": "2024-01-01T00:00:00Z",
        "last_seen": 1704067200000,
        "payload": "d29ybGQ=",
        "vec": [1.0, 0.0, 0.0],
        "geo": {"city": "tokyo", "zip": 10001},
    },
]


@pytest.fixture()
def dumps(tmp_path):
    hits = tmp_path / "hits.ndjson"
    with open(hits, "w") as f:
        for i, d in enumerate(DOCS):
            f.write(
                json.dumps(
                    {"_index": "logs", "_id": f"doc{i}", "_score": None, "_source": d}
                )
                + "\n"
            )
    src = tmp_path / "source.ndjson"
    with open(src, "w") as f:
        for d in DOCS:
            f.write(json.dumps(d) + "\n")
    bulk = tmp_path / "bulk.ndjson"
    with open(bulk, "w") as f:
        for i, d in enumerate(DOCS):
            f.write(json.dumps({"index": {"_index": "logs", "_id": f"doc{i}"}}) + "\n")
            f.write(json.dumps(d) + "\n")
    mp = tmp_path / "mapping.json"
    mp.write_text(json.dumps(MAPPING))
    return {
        "hits": str(hits),
        "source": str(src),
        "bulk": str(bulk),
        "mapping": str(mp),
    }


def test_parse_mapping_flattens_dotted_names():
    types = parse_mapping(MAPPING)
    assert types["geo.city"] == "keyword" and types["geo.zip"] == "integer"
    assert types["vec"] == "dense_vector" and types["joined"] == "date"


def _assert_typed(df):
    dt = dict(df.dtypes)
    assert dt["user"] == "string"
    assert dt["age"] == "int" and dt["visits"] == "bigint"
    assert dt["score"] == "double" and dt["active"] == "boolean"
    assert dt["joined"] == "timestamp" and dt["last_seen"] == "timestamp"
    assert dt["payload"] == "binary"
    assert dt["vec"] == "array<double>"
    assert dt["geo_city"] == "string" and dt["geo_zip"] == "int"
    rows = {r["user"]: r for r in df.collect()}
    a = rows["alice"]
    assert a["age"] == 34 and a["visits"] == 9876543210
    assert bytes(a["payload"]) == b"hello"
    # ISO string and epoch-millis date fields land on the same instant
    assert a["joined"] == datetime.datetime(2023, 8, 11, 17, 54, 14, 692000)
    assert a["last_seen"] == datetime.datetime(2023, 8, 11, 17, 54, 14, 692000)
    assert a["geo_zip"] == 4524 and rows["bob"]["geo_city"] == "tokyo"


def test_hits_replay_delivers_connector_dtypes(spark, dumps):
    df = read_es_dump(spark, dumps["hits"], mapping_path=dumps["mapping"])
    assert set(df.columns) == {
        "user", "age", "visits", "score", "active", "joined", "last_seen",
        "payload", "vec", "geo_city", "geo_zip",
    }
    _assert_typed(df)


def test_hits_include_meta_keeps_id_and_index(spark, dumps):
    df = read_es_dump(
        spark, dumps["hits"], mapping_path=dumps["mapping"], include_meta=True
    )
    rows = {r["user"]: r for r in df.collect()}
    assert rows["alice"]["_es_id"] == "doc0"
    assert rows["bob"]["_es_index"] == "logs"


def test_source_and_bulk_formats_auto_detect(spark, dumps):
    for kind in ("source", "bulk"):
        df = read_es_dump(spark, dumps[kind], mapping_path=dumps["mapping"])
        _assert_typed(df)
        assert df.count() == 2  # bulk action envelopes dropped


def test_bulk_include_meta_raises(spark, dumps):
    with pytest.raises(ValueError, match="hits format"):
        read_es_dump(spark, dumps["bulk"], format="bulk", include_meta=True)


def test_reference_dot_separator_available(spark, dumps):
    df = read_es_dump(
        spark, dumps["hits"], mapping_path=dumps["mapping"], separator="."
    )
    dt = dict(df.dtypes)
    assert dt["geo.city"] == "string" and dt["geo.zip"] == "int"


def test_unflattened_keeps_struct(spark, dumps):
    df = read_es_dump(
        spark, dumps["hits"], mapping_path=dumps["mapping"], flatten_nested=False
    )
    assert dict(df.dtypes)["geo"].startswith("struct<")


def test_datasource_kind_elasticsearch_dump_path_e2e_check(spark, dumps):
    """The full loop: data_source(elasticsearch dump config) → load →
    the public check() API over the replayed index."""
    from truthound_spark.api import check
    from truthound_spark.validators.distribution import RangeValidator
    from truthound_spark.validators.uniqueness import UniqueValidator

    src = data_source(
        {
            "kind": "elasticsearch",
            "options": {
                "dump_path": dumps["hits"],
                "mapping_path": dumps["mapping"],
                "include_meta": "true",
            },
        }
    )
    assert isinstance(src, DataSource)
    df = src.load(spark)
    res = check(df, validators=[UniqueValidator(columns=["_es_id"]), "null"])
    assert res.success
    bad = check(df, validators=[RangeValidator("age", 0, 40)])
    assert not bad.success and bad.issues[0].count == 1  # bob is 41


def test_sampling_contract_applies_to_es_replay(spark, dumps):
    src = DataSource(
        kind="elasticsearch", options={"dump_path": dumps["source"]}, max_rows=1
    )
    assert src.load(spark).count() == 1


def test_replay_is_map_only(spark, dumps):
    plan = (
        read_es_dump(spark, dumps["hits"], mapping_path=dumps["mapping"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_bulk_update_doc_wrapper_unwraps(spark, tmp_path):
    """_bulk update actions carry the document inside {"doc": ...};
    the replay merges wrapper and bare docs onto one schema."""
    bulk = tmp_path / "upd.ndjson"
    with open(bulk, "w") as f:
        f.write(json.dumps({"index": {"_index": "logs", "_id": "a"}}) + "\n")
        f.write(json.dumps({"user": "alice", "age": 34}) + "\n")
        f.write(json.dumps({"update": {"_index": "logs", "_id": "b"}}) + "\n")
        f.write(json.dumps({"doc": {"user": "bob", "age": 41}}) + "\n")
    df = read_es_dump(spark, str(bulk), format="bulk")
    rows = {r["user"]: r["age"] for r in df.collect()}
    assert rows == {"alice": 34, "bob": 41}
    assert "doc" not in df.columns
