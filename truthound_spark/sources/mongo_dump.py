"""Mongo extended-JSON dump replay: the file-backed NoSQL path.

Reference: datasources/nosql/mongodb.py — MongoDBDataSource fetches
documents and ``_normalize_document`` (:475-514) converts BSON types
(ObjectId→str, Binary→bytes, Decimal128→float, datetime kept) before
validation. Without a live cluster (none in this sandbox — the same
constraint the JDBC and Kafka gaps closed file-backed), the equivalent
e2e surface is a ``mongoexport``/``mongodump`` NDJSON dump in MongoDB
Extended JSON v2 (https://www.mongodb.com/docs/manual/reference/
mongodb-extended-json/): Spark reads the dump, and the SAME
normalization contract is applied as COLUMN EXPRESSIONS over the
inferred wrapper structs —

  {"$oid": ...}                           → string
  {"$date": "<ISO8601>"} (relaxed)        → timestamp
  {"$date": {"$numberLong": "<ms>"}}      → timestamp (canonical)
  {"$numberInt"/"$numberLong": "<n>"}     → int / bigint
  {"$numberDouble"/"$numberDecimal": ...} → double (reference casts
                                            Decimal128 → float, :498)
  {"$binary": {"base64": ..., ...}}       → binary (unbase64)

recursively through nested structs and arrays (``F.transform``), so a
dump-replayed collection lands with the dtypes the live connector would
deliver — map-only normalization, no UDFs, schema-bounded work.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DataType, StructType


def _wrapper_expr(col: Column, dt: StructType) -> Column | None:
    """Extended-JSON wrapper struct → native column, or None if the
    struct is not a recognized wrapper."""
    names = sorted(f.name for f in dt.fields)
    by_name = {f.name: f.dataType for f in dt.fields}
    if names == ["$oid"]:
        return col.getField("$oid").cast("string")
    if names == ["$uuid"]:
        return col.getField("$uuid").cast("string")
    if names == ["$date"]:
        inner = by_name["$date"]
        if isinstance(inner, StructType) and [f.name for f in inner.fields] == [
            "$numberLong"
        ]:
            # canonical: epoch millis as a string
            return F.timestamp_millis(
                col.getField("$date").getField("$numberLong").cast("long")
            )
        return F.to_timestamp(col.getField("$date"))
    if names == ["$numberInt"]:
        return col.getField("$numberInt").cast("int")
    if names == ["$numberLong"]:
        return col.getField("$numberLong").cast("long")
    if names == ["$numberDouble"]:
        return col.getField("$numberDouble").cast("double")
    if names == ["$numberDecimal"]:
        # reference _normalize_document: Decimal128 → float (:498)
        return col.getField("$numberDecimal").cast("double")
    if "$binary" in names:
        inner = by_name["$binary"]
        if isinstance(inner, StructType):
            return F.unbase64(col.getField("$binary").getField("base64"))
        return F.unbase64(col.getField("$binary"))
    return None


def _norm_expr(col: Column, dt: DataType) -> Column:
    if isinstance(dt, StructType):
        wrapped = _wrapper_expr(col, dt)
        if wrapped is not None:
            return wrapped
        return F.struct(
            *[
                _norm_expr(col.getField(f.name), f.dataType).alias(f.name)
                for f in dt.fields
            ]
        )
    if isinstance(dt, ArrayType):
        return F.transform(col, lambda x: _norm_expr(x, dt.elementType))
    return col


def normalize_extended_json(df: DataFrame) -> DataFrame:
    """Rewrite every extended-JSON wrapper struct in the schema to its
    native type (recursive; one map-only projection)."""
    return df.select(
        *[
            _norm_expr(F.col(f"`{f.name}`"), f.dataType).alias(f.name)
            for f in df.schema.fields
        ]
    )


def read_mongo_dump(
    spark: SparkSession, path: str, multiline: bool = False
) -> DataFrame:
    """mongoexport NDJSON dump (one document per line; ``multiline``
    for array-wrapped exports) → normalized DataFrame."""
    reader = spark.read
    if multiline:
        reader = reader.option("multiLine", "true")
    return normalize_extended_json(reader.json(path))
