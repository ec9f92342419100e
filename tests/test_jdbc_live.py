"""Live JDBC round-trip (reference: datasources/sql/base.py:275-833 — live
pooled SQL sources). A file-backed DuckDB database is created over a raw
java.sql connection, the golden-workload fixture is loaded IN-database, and
the three sqlite-* golden workloads run end-to-end through
PushdownValidationEngine with spark.read.format("jdbc") as the carrier —
no in-process DB-API shim anywhere in the path. A full-table partitioned
read then drives the regular Spark-side validators against the same table.

Skips cleanly when no JDBC driver jar is installed."""

from __future__ import annotations

import glob
import json
import os

import pytest

from truthound_spark.sources.jdbc import (
    JDBCSparkSource,
    execute_ddl,
    find_jdbc_driver_jar,
    read_jdbc_table,
)
from truthound_spark.sources.pushdown import PushdownCheck, PushdownValidationEngine

WORKLOAD_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "benchmarks",
    "workloads",
)

pytestmark = pytest.mark.skipif(
    find_jdbc_driver_jar() is None, reason="no JDBC driver jar installed"
)


@pytest.fixture(scope="module")
def jdbc_url(spark, tmp_path_factory):
    """File-backed DuckDB database with the workload fixture loaded via a
    live JDBC connection (the database parses the CSV itself)."""
    jar = find_jdbc_driver_jar()
    if "duckdb" not in os.path.basename(jar):
        pytest.skip("round-trip fixture is written for the duckdb driver")
    db = str(tmp_path_factory.mktemp("jdbc") / "workload.db")
    url = f"jdbc:duckdb:{db}"
    csv = os.path.join(WORKLOAD_DIR, "data", "local_core.csv").replace("'", "''")
    execute_ddl(
        spark,
        url,
        [
            "CREATE TABLE workload AS "
            f"SELECT * FROM read_csv_auto('{csv}', nullstr=['', 'NULL'])"
        ],
    )
    return url


def _sqlite_workloads():
    out = []
    for p in sorted(glob.glob(os.path.join(WORKLOAD_DIR, "sqlite-*.json"))):
        with open(p) as f:
            out.append(json.load(f))
    return out


@pytest.mark.parametrize("wl", _sqlite_workloads(), ids=lambda w: w["id"])
def test_golden_pushdown_workload_over_live_jdbc(spark, jdbc_url, wl):
    src = JDBCSparkSource(spark, jdbc_url)
    p = wl["pushdown"]
    check = PushdownCheck(
        kind=p["kind"],
        column=p["column"],
        min_value=p.get("min_value"),
        max_value=p.get("max_value"),
    )
    issues = PushdownValidationEngine(src, "workload").validate([check])
    assert len(issues) == wl["expected"]["issue_count"]


def test_full_table_partitioned_read_drives_spark_validators(spark, jdbc_url):
    df = read_jdbc_table(
        spark,
        jdbc_url,
        "workload",
        partition_column="customer_id",
        num_partitions=2,
        lower_bound=1,
        upper_bound=5,
    )
    assert df.rdd.getNumPartitions() == 2
    from truthound_spark.api import check
    from truthound_spark.validators.completeness import NullValidator
    from truthound_spark.validators.uniqueness import UniqueValidator

    report = check(
        df, validators=[NullValidator(["email"]), UniqueValidator(["customer_id"])]
    )
    kinds = sorted(i.validator_name for i in report.issues)
    assert len(report.issues) == 2, kinds  # 1 null email + 1 dup customer_id


def test_jdbc_query_pushes_aggregate_into_database(spark, jdbc_url):
    src = JDBCSparkSource(spark, jdbc_url)
    assert src.row_count("workload") == 4
    nc = src.null_count("workload", "email")
    assert nc["null_count"] == 1 and nc["row_count"] == 4
