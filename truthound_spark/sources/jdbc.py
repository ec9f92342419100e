"""Live JDBC connectivity (reference: src/truthound/datasources/sql/base.py:275-833
— pooled live SQL sources executing pushdown aggregates in-database).

Spark-first design: the cluster path for a SQL database is
``spark.read.format("jdbc")`` — Spark's own JDBC source handles connection
pooling per partition, fetch-size batching, and predicate pushdown. Two
surfaces here:

* :class:`JDBCSparkSource` — the pushdown carrier: each metric query
  (``build_null_count_query`` etc.) is shipped INTO the database via the
  JDBC ``query`` option, so the database aggregates and Spark pulls back
  one scalar row. Plugs into :class:`PushdownValidationEngine` exactly
  like the in-process sources, but over a real wire-protocol connection.
* :func:`read_jdbc_table` — full-table distributed read (``dbtable`` +
  optional partitioned-read bounds) for running the regular Spark-side
  validator suite against a live database.

DDL (loading a test fixture into the database) goes through a raw
``java.sql.DriverManager`` connection in the driver JVM — Spark's JDBC
relation is read-only by design, and a real round-trip needs the table to
exist first. Driver jars are discovered on disk / via ``TRUTHOUND_JDBC_JARS``
so environments without one skip cleanly.
"""

from __future__ import annotations

import glob
import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from .factory import jdbc_options
from .pushdown import DUCKDB, SQLDialect, _BaseSQLSource

# Well-known local maven/coursier cache layouts, searched in order. The
# first match wins; set TRUTHOUND_JDBC_JARS (path-separated) to override.
_JAR_SEARCH_GLOBS = [
    os.path.expanduser("~/.m2/repository/**/duckdb_jdbc*.jar"),
    os.path.expanduser("~/.m2/repository/**/sqlite-jdbc*.jar"),
    os.path.expanduser("~/.cache/coursier/**/duckdb_jdbc*.jar"),
    os.path.expanduser("~/.cache/coursier/**/sqlite-jdbc*.jar"),
    "/opt/jars/*jdbc*.jar",
]

_DRIVER_CLASSES = {
    "duckdb": "org.duckdb.DuckDBDriver",
    "sqlite": "org.sqlite.JDBC",
}


def find_jdbc_driver_jar() -> str | None:
    """Locate a JDBC driver jar for tests (duckdb or sqlite). Returns the
    first hit or None — callers skip when no driver is installed."""
    env = os.environ.get("TRUTHOUND_JDBC_JARS")
    if env:
        for p in env.split(os.pathsep):
            if os.path.exists(p):
                return p
    for pattern in _JAR_SEARCH_GLOBS:
        hits = sorted(glob.glob(pattern, recursive=True))
        if hits:
            return hits[0]
    return None


def driver_class_for_url(url: str) -> str:
    """jdbc:duckdb:… / jdbc:sqlite:… → driver class name."""
    for key, cls in _DRIVER_CLASSES.items():
        if url.startswith(f"jdbc:{key}:"):
            return cls
    raise ValueError(f"no known driver class for JDBC url: {url}")


def execute_ddl(spark: SparkSession, url: str, statements: list[str]) -> None:
    """Run DDL/DML over a raw java.sql connection in the driver JVM.

    Spark's JDBC relation is read-only; fixture loading and table creation
    need a plain connection. The driver class is registered explicitly so
    jars added via spark.jars (outside the system classloader) resolve."""
    jvm = spark._jvm  # noqa: SLF001 — py4j gateway is the supported bridge
    jvm.java.lang.Class.forName(driver_class_for_url(url))
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        stmt = conn.createStatement()
        try:
            for sql in statements:
                stmt.execute(sql)
        finally:
            stmt.close()
    finally:
        conn.close()


def read_jdbc_query(spark: SparkSession, url: str, query: str, **kw: Any) -> DataFrame:
    """Ship ``query`` into the database; Spark reads back the result set."""
    opts = jdbc_options(url=url, query=query, **kw)
    reader = spark.read.format("jdbc").option("driver", driver_class_for_url(url))
    for k, v in opts.items():
        reader = reader.option(k, v)
    return reader.load()


def read_jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int | None = None,
    lower_bound: Any = None,
    upper_bound: Any = None,
    **kw: Any,
) -> DataFrame:
    """Distributed full-table read. With partition bounds, Spark opens
    ``num_partitions`` parallel connections each scanning one stride —
    the reference's chunked SQL iteration (sql/base.py:441-529) expressed
    as Spark's native partitioned JDBC read."""
    opts = jdbc_options(
        url=url,
        table=table,
        partition_column=partition_column,
        num_partitions=num_partitions,
        lower_bound=lower_bound,
        upper_bound=upper_bound,
        **kw,
    )
    reader = spark.read.format("jdbc").option("driver", driver_class_for_url(url))
    for k, v in opts.items():
        reader = reader.option(k, v)
    return reader.load()


class JDBCSparkSource(_BaseSQLSource):
    """Pushdown source over a live JDBC connection, Spark as the carrier.

    ``execute`` sends each aggregate query through spark.read.format("jdbc")
    with the ``query`` option — the database computes, Spark collects the
    scalar row(s). Satisfies the same contract as the in-process sources,
    so :class:`PushdownValidationEngine` runs unchanged against a real
    database (reference sql/base.py:791-833 metric methods)."""

    def __init__(
        self, spark: SparkSession, url: str, dialect: SQLDialect = DUCKDB
    ) -> None:
        self._spark = spark
        self._url = url
        self.dialect = dialect

    def execute(self, sql: str) -> list[dict[str, Any]]:
        df = read_jdbc_query(self._spark, self._url, sql)
        return [row.asDict() for row in df.collect()]

    def close(self) -> None:  # no pooled state held python-side
        return None
