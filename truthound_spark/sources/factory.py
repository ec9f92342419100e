"""DataSource factory (reference: src/truthound/datasources/factory.py —
path/config → DataSource with sampling config ``max_rows``; NoSQL configs
datasources/nosql/{mongodb,elasticsearch}.py; JDBC sql/base.py).

``DataSource.load(spark)`` yields a DataFrame with the sampling contract
applied: ``sample_fraction`` (seeded, distributed Bernoulli sample — the
scale-safe way to bound work) and/or ``max_rows`` (limit). Connector-backed
kinds (jdbc/mongodb/elasticsearch) assemble reader options; the actual
connector jar ships with the cluster, so option assembly is unit-testable
without it.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession


def jdbc_options(
    url: str,
    table: str | None = None,
    query: str | None = None,
    user: str | None = None,
    password: str | None = None,
    fetch_size: int = 10000,
    partition_column: str | None = None,
    num_partitions: int | None = None,
    lower_bound: Any = None,
    upper_bound: Any = None,
) -> dict[str, str]:
    """spark.read.jdbc options incl. parallel-read partitioning (reference
    sql/base.py connection config → JDBC reader contract). Passing
    ``query`` pushes the (aggregate) SQL INTO the database — the pushdown
    carrier at cluster scale."""
    if (table is None) == (query is None):
        raise ValueError("exactly one of table / query is required")
    opts: dict[str, str] = {"url": url, "fetchsize": str(fetch_size)}
    if table is not None:
        opts["dbtable"] = table
    else:
        opts["query"] = query
    if user is not None:
        opts["user"] = user
    if password is not None:
        opts["password"] = password
    if partition_column is not None:
        if num_partitions is None or lower_bound is None or upper_bound is None:
            raise ValueError(
                "partition_column needs num_partitions + lower_bound + upper_bound"
            )
        opts.update(
            {
                "partitionColumn": partition_column,
                "numPartitions": str(num_partitions),
                "lowerBound": str(lower_bound),
                "upperBound": str(upper_bound),
            }
        )
    return opts


def mongodb_options(
    uri: str, database: str, collection: str, extra: dict[str, str] | None = None
) -> dict[str, str]:
    """mongo-spark connector options (reference datasources/nosql/mongodb.py)."""
    opts = {
        "connection.uri": uri,
        "database": database,
        "collection": collection,
    }
    opts.update(extra or {})
    return opts


def elasticsearch_options(
    nodes: str, resource: str, extra: dict[str, str] | None = None
) -> dict[str, str]:
    """elasticsearch-hadoop connector options (reference nosql/elasticsearch.py)."""
    opts = {"es.nodes": nodes, "es.resource": resource}
    opts.update(extra or {})
    return opts


_CONNECTOR_FORMATS = {
    "jdbc": "jdbc",
    "mongodb": "mongodb",
    "elasticsearch": "org.elasticsearch.spark.sql",
}


@dataclass
class DataSource:
    """Declarative source + sampling config (reference factory.py).

    kind: file | jdbc | mongodb | elasticsearch
    """

    kind: str = "file"
    path: str | None = None
    options: dict[str, str] = field(default_factory=dict)
    sample_fraction: float | None = None
    max_rows: int | None = None
    seed: int = 42

    def load(self, spark: SparkSession) -> DataFrame:
        if self.kind == "file":
            if not self.path:
                raise ValueError("file source needs a path")
            from truthound_spark.adapters import _read_path

            df = _read_path(spark, self.path)
        elif self.kind == "mongodb" and "dump_path" in self.options:
            # file-backed replay of a mongoexport extended-JSON dump —
            # the broker-free e2e path (same pattern as the DuckDB-file
            # JDBC and file-replayed Kafka stand-ins); delivers the
            # dtypes the live connector would
            from truthound_spark.sources.mongo_dump import read_mongo_dump

            df = read_mongo_dump(
                spark,
                self.options["dump_path"],
                multiline=self.options.get("multiline", "false") == "true",
            )
        elif self.kind == "elasticsearch" and "dump_path" in self.options:
            # file-backed replay of an ES export (elasticdump data /
            # scroll NDJSON / bulk file) — closes the NoSQL surface the
            # way mongo_dump did for Mongo: _source unwrap + mapping-
            # driven dtype normalization as column expressions
            from truthound_spark.sources.es_dump import read_es_dump

            df = read_es_dump(
                spark,
                self.options["dump_path"],
                format=self.options.get("format", "auto"),
                mapping_path=self.options.get("mapping_path"),
                include_meta=self.options.get("include_meta", "false") == "true",
                flatten_nested=self.options.get("flatten_nested", "true") == "true",
                separator=self.options.get("separator", "_"),
            )
        elif self.kind in _CONNECTOR_FORMATS:
            reader = spark.read.format(_CONNECTOR_FORMATS[self.kind])
            for k, v in self.options.items():
                reader = reader.option(k, v)
            df = reader.load()
        else:
            raise ValueError(f"unknown source kind {self.kind!r}")
        return self._apply_sampling(df)

    def _apply_sampling(self, df: DataFrame) -> DataFrame:
        if self.sample_fraction is not None:
            df = df.sample(fraction=self.sample_fraction, seed=self.seed)
        if self.max_rows is not None:
            df = df.limit(self.max_rows)
        return df


def data_source(path_or_config: Any, **kwargs: Any) -> DataSource:
    """Factory entry (reference factory.py): a path string or a config dict
    → DataSource."""
    if isinstance(path_or_config, str):
        return DataSource(kind="file", path=path_or_config, **kwargs)
    if isinstance(path_or_config, dict):
        cfg = dict(path_or_config)
        cfg.update(kwargs)
        return DataSource(**cfg)
    raise TypeError("data_source takes a path or a config dict")
