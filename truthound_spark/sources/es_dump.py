"""Elasticsearch dump replay: the file-backed NoSQL path for ES.

Reference: datasources/nosql/elasticsearch.py — ElasticsearchDataSource
scrolls an index (``_scroll_documents`` :531-599), unwraps each hit's
``_source`` (:526, :575), flattens nested objects to dotted field names
when ``flatten_nested`` (:622-634, ``_parse_mapping_properties``
:437-467) and types columns from the index mapping via
``ES_TYPE_MAPPING`` (:117-155). Without a live cluster (none in this
sandbox — the same constraint the JDBC/Kafka/Mongo gaps closed
file-backed), the equivalent e2e surface is an export file:

* ``hits`` — elasticdump ``--type=data`` / scroll-export NDJSON: one
  hit object per line carrying ``_index``/``_id``/``_source``;
* ``source`` — bare documents, one per line (``jq '._source'`` style);
* ``bulk`` — the ``_bulk`` API file of alternating action envelopes
  and documents. Action lines are dropped with a map-only filter —
  pairing a doc with ITS action line needs global line adjacency,
  which does not distribute; ids live in the hit wrapper, so use the
  ``hits`` format when ``_id`` matters (documented, not silently
  lossy: ``include_meta=True`` on bulk raises).

Typing replays the reference contract as COLUMN EXPRESSIONS: the index
mapping (elasticdump ``--type=mapping`` JSON, or a bare
``{"properties": ...}``) is walked exactly like
``_parse_mapping_properties`` into dotted-name → ES type, then each
column is cast per ``ES_TYPE_MAPPING`` — date→timestamp (ISO strings
AND epoch-millis longs, the two shapes ES serializes),
long/integer/short/byte→integral, *float→double, boolean→boolean,
binary (base64 string)→binary, dense_vector→array<double>. Map-only
normalization, no UDFs, schema-bounded work.
"""

from __future__ import annotations

import json

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructType

_BULK_ACTIONS = {"index", "create", "update", "delete"}

# reference ES_TYPE_MAPPING (elasticsearch.py:117-155), restricted to
# leaf types a JSON dump can carry; struct-ish types stay as inferred.
_ES_CASTS = {
    "text": "string",
    "keyword": "string",
    "ip": "string",
    "completion": "string",
    "search_as_you_type": "string",
    "long": "long",
    "unsigned_long": "long",
    "integer": "int",
    "short": "smallint",
    "byte": "tinyint",
    "double": "double",
    "float": "double",
    "half_float": "double",
    "scaled_float": "double",
    "boolean": "boolean",
}


def parse_mapping(mapping: dict) -> dict[str, str]:
    """Index-mapping JSON → {dotted field name: es type}, recursively —
    the reference's ``_parse_mapping_properties`` (:437-467) with
    ``flatten_nested`` semantics (nested ``properties`` recurse under a
    dotted prefix). Accepts elasticdump ``--type=mapping`` wrappers
    ({index: {mappings: {properties: ...}}}) or bare {properties: ...}."""
    props = mapping.get("properties")
    if props is None and "mappings" in mapping:
        props = mapping["mappings"].get("properties")
    if props is None and len(mapping) == 1:
        # elasticdump wraps under the index name
        return parse_mapping(next(iter(mapping.values())))
    if props is None:
        return {}
    out: dict[str, str] = {}

    def walk(properties: dict, prefix: str) -> None:
        for name, fdef in properties.items():
            full = f"{prefix}.{name}" if prefix else name
            if "properties" in fdef:
                walk(fdef["properties"], full)
            else:
                out[full] = fdef.get("type", "object")

    walk(props, "")
    return out


def _flatten(df: DataFrame, sep: str) -> DataFrame:
    """Struct columns → flat top-level columns (recursive), the
    reference's ``flatten_document`` shape. One map-only projection.

    The reference joins path segments with "." (Polars is happy with
    dotted names); in Spark an unquoted "." is a STRUCT-PATH separator,
    so dotted top-level columns break every downstream ``F.col(name)``
    — the idiomatic default here is "_", with ``separator="."``
    available for exact reference-name parity (names then need
    backticks in SQL/exprs)."""
    cols: list[Column] = []

    def walk(col: Column, dt, name: str) -> None:
        if isinstance(dt, StructType):
            for f in dt.fields:
                walk(col.getField(f.name), f.dataType, f"{name}{sep}{f.name}")
        else:
            cols.append(col.alias(name))

    for f in df.schema.fields:
        walk(F.col(f"`{f.name}`"), f.dataType, f.name)
    return df.select(*cols)


def _typed(col: Column, dt, es_type: str) -> Column:
    if es_type == "date":
        # ES serializes dates as ISO-8601 strings or epoch millis —
        # reference normalizes both to datetime (ES_TYPE_MAPPING date →
        # DATETIME). Integral json infers long → millis.
        if isinstance(dt, LongType):
            return F.timestamp_millis(col)
        return F.to_timestamp(col)
    if es_type == "binary":
        if isinstance(dt, StringType):
            return F.unbase64(col)
        return col.cast("binary")
    if es_type == "dense_vector":
        return col.cast("array<double>")
    cast = _ES_CASTS.get(es_type)
    return col.cast(cast) if cast else col


def _detect(df: DataFrame) -> str:
    names = set(df.schema.fieldNames())
    if "_source" in names:
        return "hits"
    if names & _BULK_ACTIONS:
        return "bulk"
    return "source"


def read_es_dump(
    spark: SparkSession,
    path: str,
    format: str = "auto",
    mapping: dict | None = None,
    mapping_path: str | None = None,
    include_meta: bool = False,
    flatten_nested: bool = True,
    separator: str = "_",
) -> DataFrame:
    """ES export file → DataFrame with connector dtypes.

    format: auto | hits | source | bulk (see module docstring).
    mapping / mapping_path: index mapping JSON for reference-true column
    typing; without it, columns keep spark.read.json's inference.
    include_meta: keep ``_id``/``_index`` as ``_es_id``/``_es_index``
    (hits format only — a bulk file's ids do not distribute).
    flatten_nested: flatten object fields to top-level columns
    (reference default), joined by ``separator`` ("_" here; "." for
    reference-exact names — see ``_flatten``)."""
    raw = spark.read.json(path)
    fmt = _detect(raw) if format == "auto" else format
    if fmt == "hits":
        meta = (
            [
                F.col("_id").cast("string").alias("_es_id"),
                F.col("_index").cast("string").alias("_es_index"),
            ]
            if include_meta
            else []
        )
        df = raw.select(*meta, "_source.*")
    elif fmt == "bulk":
        if include_meta:
            raise ValueError(
                "bulk dumps can't recover per-doc _id distributively — "
                "export with the hits format (elasticdump --type=data) "
                "when metadata matters"
            )
        action_fields = sorted(set(raw.schema.fieldNames()) & _BULK_ACTIONS)
        doc_fields = [f for f in raw.schema.fieldNames() if f not in _BULK_ACTIONS]
        # an action envelope line populates ONLY its action field; doc
        # lines leave them all null — a map-only filter, no pairing.
        # Caveat (documented, rare): a DOCUMENT whose own top-level
        # field is literally named index/create/update/delete would be
        # dropped by this filter — such corpora must replay via the
        # hits format, whose _source nesting keeps doc fields apart
        # from envelope keys.
        df = raw
        for a in action_fields:
            df = df.filter(F.col(f"`{a}`").isNull())
        df = df.select(*[f"`{f}`" for f in doc_fields])
        # _bulk "update" actions carry their document inside a
        # {"doc": {...}} wrapper line (index/create docs are bare) —
        # merge wrapper fields with the bare fields in one map-only
        # coalesce projection so both action styles land on one schema
        doc_dt = {f.name: f.dataType for f in df.schema.fields}.get("doc")
        if "update" in action_fields and isinstance(doc_dt, StructType):
            direct = [f for f in df.columns if f != "doc"]
            wrapped = [f.name for f in doc_dt.fields]
            names = list(dict.fromkeys(direct + wrapped))
            df = df.select(
                *[
                    F.coalesce(F.col(f"`{n}`"), F.col("doc").getField(n)).alias(n)
                    if (n in direct and n in wrapped)
                    else (
                        F.col("doc").getField(n).alias(n)
                        if n in wrapped
                        else F.col(f"`{n}`")
                    )
                    for n in names
                ]
            )
    elif fmt == "source":
        df = raw
    else:
        raise ValueError(f"unknown es dump format {fmt!r}")
    if flatten_nested:
        # meta columns are plain strings — _flatten passes non-struct
        # top-level columns through unchanged
        df = _flatten(df, separator)
    if mapping_path is not None and mapping is None:
        with open(mapping_path) as fh:
            mapping = json.load(fh)
    if mapping:
        types = parse_mapping(mapping)
        if separator != ".":
            types = {k.replace(".", separator): v for k, v in types.items()}
        by_name = {f.name: f.dataType for f in df.schema.fields}
        df = df.select(
            *[
                _typed(F.col(f"`{c}`"), by_name[c], types[c]).alias(c)
                if c in types
                else F.col(f"`{c}`")
                for c in df.columns
            ]
        )
    return df
