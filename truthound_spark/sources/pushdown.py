"""SQL pushdown: per-check SQL generation + in-database execution.

Reference surface: the pushdown mixins generate one aggregate SQL string per
check — Null → ``COUNT(*) WHERE c IS NULL``; Duplicate/Unique →
``COUNT(*) − COUNT(DISTINCT c)``; Range → ``MIN(c), MAX(c)`` plus an
out-of-range count; Stats → ``COUNT/AVG/MIN/MAX/SUM`` (reference
src/truthound/validators/pushdown_support.py:448-465, 487-508, 530-547,
569-594), with dialect-aware identifier quoting (:467-479) and batched
execution (:331-398). The engine converts scalar results into issues via
each validator's result processing (e.g. completeness/null.py:85-104).

Spark-first position: on a cluster these same query strings go through
``spark.read.jdbc(url, query, properties)`` so the DATABASE does the
aggregation and only scalars cross the wire — the 100 TB-side contract.
Locally we execute on stdlib sqlite3 / in-process DuckDB (DuckDB doubles
as the driver's oracle engine), which is what the sqlite-* BASELINE.md
workloads measure.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from truthound_spark.core.results import ValidationIssue
from truthound_spark.types import Severity, severity_from_ratio

# ---------------------------------------------------------------------------
# dialects + quoting (reference pushdown_support.py:467-479)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class SQLDialect:
    name: str
    quote_char: str = '"'

    def quote(self, identifier: str) -> str:
        q = self.quote_char
        return f"{q}{identifier.replace(q, q * 2)}{q}"


SQLITE = SQLDialect("sqlite", '"')
DUCKDB = SQLDialect("duckdb", '"')
POSTGRES = SQLDialect("postgresql", '"')
MYSQL = SQLDialect("mysql", "`")
BIGQUERY = SQLDialect("bigquery", "`")
SNOWFLAKE = SQLDialect("snowflake", '"')
DATABRICKS = SQLDialect("databricks", "`")
REDSHIFT = SQLDialect("redshift", '"')
ORACLE = SQLDialect("oracle", '"')
MSSQL = SQLDialect("sqlserver", '"')  # ANSI QUOTED_IDENTIFIER mode

DIALECTS = {
    d.name: d
    for d in (
        SQLITE, DUCKDB, POSTGRES, MYSQL, BIGQUERY, SNOWFLAKE,
        DATABRICKS, REDSHIFT, ORACLE, MSSQL,
    )
}


# ---------------------------------------------------------------------------
# per-check SQL generation (reference pushdown_support.py:448-594)
# ---------------------------------------------------------------------------


def build_count_query(table: str, dialect: SQLDialect = DUCKDB) -> str:
    return f"SELECT COUNT(*) AS row_count FROM {dialect.quote(table)}"


def build_null_count_query(
    table: str, column: str, dialect: SQLDialect = DUCKDB
) -> str:
    """reference pushdown_support.py:448-465 (Null mixin)."""
    c = dialect.quote(column)
    return (
        f"SELECT COUNT(*) AS row_count, "
        f"CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_count "
        f"FROM {dialect.quote(table)}"
    )


def build_distinct_count_query(
    table: str, column: str, dialect: SQLDialect = DUCKDB
) -> str:
    """reference pushdown_support.py:487-508 (Duplicate/Unique mixin)."""
    c = dialect.quote(column)
    return (
        f"SELECT COUNT({c}) AS non_null_count, "
        f"COUNT(DISTINCT {c}) AS distinct_count "
        f"FROM {dialect.quote(table)}"
    )


def build_range_count_query(
    table: str,
    column: str,
    min_value: float | None,
    max_value: float | None,
    dialect: SQLDialect = DUCKDB,
) -> str:
    """reference pushdown_support.py:530-547 (Range mixin) + violation count."""
    c = dialect.quote(column)
    conds = []
    if min_value is not None:
        conds.append(f"{c} < {min_value!r}")
    if max_value is not None:
        conds.append(f"{c} > {max_value!r}")
    out_pred = " OR ".join(conds) if conds else "1=0"
    return (
        f"SELECT MIN({c}) AS min_value, MAX({c}) AS max_value, "
        f"CAST(SUM(CASE WHEN ({out_pred}) AND {c} IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS out_of_range_count, "
        f"COUNT({c}) AS non_null_count "
        f"FROM {dialect.quote(table)}"
    )


def build_stats_query(table: str, column: str, dialect: SQLDialect = DUCKDB) -> str:
    """reference pushdown_support.py:569-594 (Stats mixin)."""
    c = dialect.quote(column)
    return (
        f"SELECT COUNT({c}) AS count_value, AVG({c}) AS avg_value, "
        f"MIN({c}) AS min_value, MAX({c}) AS max_value, "
        f"CAST(SUM({c}) AS DOUBLE) AS sum_value "
        f"FROM {dialect.quote(table)}"
    )


# ---------------------------------------------------------------------------
# sources
# ---------------------------------------------------------------------------


class _BaseSQLSource:
    """Minimal DB-API source: execute pushdown SQL, fetch scalar rows.

    Mirrors reference BaseSQLDataSource's contract (sql/base.py:275-833) at
    the metric level; Spark-side JDBC replaces this on a cluster."""

    dialect: SQLDialect

    def execute(self, sql: str) -> list[dict[str, Any]]:
        cur = self._conn.execute(sql)
        cols = [d[0] for d in cur.description]
        return [dict(zip(cols, row)) for row in cur.fetchall()]

    def close(self) -> None:
        self._conn.close()

    # -- pushdown metric helpers (reference sql/base.py:791-833) --------
    def row_count(self, table: str) -> int:
        return int(self.execute(build_count_query(table, self.dialect))[0]["row_count"])

    def null_count(self, table: str, column: str) -> dict[str, int]:
        r = self.execute(build_null_count_query(table, column, self.dialect))[0]
        return {k: int(v or 0) for k, v in r.items()}

    def distinct_count(self, table: str, column: str) -> dict[str, int]:
        r = self.execute(build_distinct_count_query(table, column, self.dialect))[0]
        return {k: int(v or 0) for k, v in r.items()}

    def range_stats(
        self, table: str, column: str, min_value: float | None, max_value: float | None
    ) -> dict[str, Any]:
        return self.execute(
            build_range_count_query(table, column, min_value, max_value, self.dialect)
        )[0]

    def stats(self, table: str, column: str) -> dict[str, Any]:
        return self.execute(build_stats_query(table, column, self.dialect))[0]


class SQLiteSource(_BaseSQLSource):
    """stdlib sqlite3-backed source (the sqlite-* BASELINE workloads)."""

    dialect = SQLITE

    def __init__(self, database: str = ":memory:") -> None:
        import sqlite3

        self._conn = sqlite3.connect(database)

    def load_rows(self, table: str, columns: list[str], rows: list[tuple]) -> None:
        cols = ", ".join(self.dialect.quote(c) for c in columns)
        ph = ", ".join("?" for _ in columns)
        self._conn.execute(
            f"CREATE TABLE IF NOT EXISTS {self.dialect.quote(table)} ({cols})"
        )
        self._conn.executemany(
            f"INSERT INTO {self.dialect.quote(table)} ({cols}) VALUES ({ph})", rows
        )
        self._conn.commit()


class DuckDBSource(_BaseSQLSource):
    """In-process DuckDB source — reads parquet in place, so pushdown runs
    directly against the same files Spark scans (and the driver's oracle)."""

    dialect = DUCKDB

    def __init__(self, database: str = ":memory:") -> None:
        import duckdb

        self._conn = duckdb.connect(database)

    @staticmethod
    def _path_literal(path: str) -> str:
        """Escape a filesystem path for a single-quoted SQL literal —
        apostrophes in legitimate paths must not terminate the string."""
        return path.replace("'", "''")

    def register_parquet(self, table: str, path: str) -> None:
        self._conn.execute(
            f"CREATE OR REPLACE VIEW {self.dialect.quote(table)} AS "
            f"SELECT * FROM read_parquet('{self._path_literal(path)}')"
        )

    def register_csv(self, table: str, path: str) -> None:
        self._conn.execute(
            f"CREATE OR REPLACE VIEW {self.dialect.quote(table)} AS "
            f"SELECT * FROM read_csv_auto('{self._path_literal(path)}', nullstr=['', 'NULL'])"
        )


# ---------------------------------------------------------------------------
# pushdown validation engine (reference pushdown_support.py:173-424)
# ---------------------------------------------------------------------------


@dataclass
class PushdownCheck:
    kind: str  # null | unique | range
    column: str
    min_value: float | None = None
    max_value: float | None = None
    params: dict[str, Any] = field(default_factory=dict)


class PushdownValidationEngine:
    """Generate per-check SQL, execute it IN the database, convert scalar
    results into ValidationIssues (reference pushdown_support.py:173-424).
    Control crosses the process boundary to the DB server here — Spark never
    scans the rows."""

    def __init__(self, source: _BaseSQLSource, table: str) -> None:
        self.source = source
        self.table = table

    def validate(self, checks: list[PushdownCheck]) -> list[ValidationIssue]:
        issues: list[ValidationIssue] = []
        for check in checks:
            if check.kind == "null":
                m = self.source.null_count(self.table, check.column)
                n, total = m["null_count"], m["row_count"]
                if n > 0:
                    issues.append(
                        ValidationIssue(
                            column=check.column,
                            issue_type="null_values",
                            count=n,
                            severity=severity_from_ratio(n / total if total else 0.0),
                            validator_name="null",
                            expected="no nulls",
                            actual=n,
                            details=f"{n} nulls (pushdown)",
                        )
                    )
            elif check.kind == "unique":
                m = self.source.distinct_count(self.table, check.column)
                dup = m["non_null_count"] - m["distinct_count"]
                if dup > 0:
                    issues.append(
                        ValidationIssue(
                            column=check.column,
                            issue_type="duplicate_values",
                            count=dup,
                            severity=severity_from_ratio(
                                dup / m["non_null_count"] if m["non_null_count"] else 0.0
                            ),
                            validator_name="unique",
                            expected="all values unique",
                            actual=dup,
                            details=f"{dup} duplicate values (pushdown)",
                        )
                    )
            elif check.kind == "range":
                m = self.source.range_stats(
                    self.table, check.column, check.min_value, check.max_value
                )
                n = int(m["out_of_range_count"] or 0)
                nn = int(m["non_null_count"] or 0)
                if n > 0:
                    issues.append(
                        ValidationIssue(
                            column=check.column,
                            issue_type="out_of_range",
                            count=n,
                            severity=severity_from_ratio(n / nn if nn else 0.0),
                            validator_name="range",
                            expected=f"[{check.min_value}, {check.max_value}]",
                            actual={"min": m["min_value"], "max": m["max_value"]},
                            details=f"{n} out-of-range values (pushdown)",
                        )
                    )
            else:
                issues.append(
                    ValidationIssue(
                        column=check.column,
                        issue_type="execution_error",
                        count=0,
                        severity=Severity.HIGH,
                        validator_name=check.kind,
                        details=f"unsupported pushdown check kind {check.kind!r}",
                    )
                )
        return issues
