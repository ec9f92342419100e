"""SQL pushdown layer: SQL generation + in-database execution parity with
the DataFrame path (reference pushdown_support.py:448-594)."""

from pyspark.sql import functions as F

from truthound_spark.sources import (
    DuckDBSource,
    PushdownValidationEngine,
    SQLiteSource,
    build_distinct_count_query,
    build_null_count_query,
    build_range_count_query,
)
from truthound_spark.sources.pushdown import MYSQL, PushdownCheck

SF_DIR = "/root/testdata/sf0.001"


def test_sql_generation_quoting():
    sql = build_null_count_query("t", "email")
    assert 'SUM(CASE WHEN "email" IS NULL THEN 1 ELSE 0 END)' in sql
    assert build_distinct_count_query("t", "id").count('COUNT(DISTINCT "id")') == 1
    assert "`c`" in build_null_count_query("t", "c", MYSQL)
    rq = build_range_count_query("t", "age", 0, 120)
    assert '"age" < 0' in rq and '"age" > 120' in rq


def test_sqlite_pushdown_counts():
    src = SQLiteSource()
    src.load_rows(
        "customers",
        ["customer_id", "email", "age"],
        [(1, "a@example.com", 25), (2, "b@example.com", 35), (2, None, 151), (4, "d@example.com", 40)],
    )
    engine = PushdownValidationEngine(src, "customers")
    issues = engine.validate(
        [
            PushdownCheck("null", "email"),
            PushdownCheck("unique", "customer_id"),
            PushdownCheck("range", "age", 0, 120),
        ]
    )
    # the BASELINE.md golden table: exactly 3 issues, one per check
    assert sorted(i.issue_type for i in issues) == [
        "duplicate_values",
        "null_values",
        "out_of_range",
    ]
    assert all(i.count == 1 for i in issues)
    src.close()


def test_duckdb_pushdown_matches_dataframe_path(spark):
    src = DuckDBSource()
    src.register_parquet("orders", f"{SF_DIR}/orders.parquet")
    m = src.distinct_count("orders", "o_custkey")

    df = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    row = df.agg(
        F.count("o_custkey").alias("nn"), F.countDistinct("o_custkey").alias("nd")
    ).collect()[0]
    assert m["non_null_count"] == row["nn"]
    assert m["distinct_count"] == row["nd"]

    r = src.range_stats("orders", "o_totalprice", 0, 100000)
    pred = ((F.col("o_totalprice") < 0) | (F.col("o_totalprice") > 100000)) & F.col(
        "o_totalprice"
    ).isNotNull()
    n = df.agg(F.sum(F.when(pred, 1).otherwise(0)).alias("n")).collect()[0]["n"]
    assert int(r["out_of_range_count"] or 0) == int(n or 0)
    src.close()


def test_data_source_factory(spark):
    from truthound_spark.sources.factory import (
        DataSource,
        data_source,
        elasticsearch_options,
        jdbc_options,
        mongodb_options,
    )

    src = data_source(f"{SF_DIR}/orders.parquet", max_rows=100)
    df = src.load(spark)
    assert df.count() == 100

    sampled = DataSource(kind="file", path=f"{SF_DIR}/orders.parquet", sample_fraction=0.1)
    n = sampled.load(spark).count()
    assert 0 < n < 1500  # ~10% of 1500 sf0.001 orders

    opts = jdbc_options(
        "jdbc:postgresql://h/db",
        query="SELECT COUNT(*) FROM t",
        partition_column=None,
    )
    assert opts["query"].startswith("SELECT")
    par = jdbc_options(
        "jdbc:postgresql://h/db",
        table="t",
        partition_column="id",
        num_partitions=8,
        lower_bound=0,
        upper_bound=1000,
    )
    assert par["numPartitions"] == "8"
    assert mongodb_options("mongodb://h", "db", "c")["collection"] == "c"
    assert elasticsearch_options("es:9200", "idx")["es.resource"] == "idx"
