"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship fused data-quality suite + pricing
summary on sf0.001. ``queries()`` / ``oracle_sql()`` expose one
driver-verifiable entry per implemented operator (SURVEY.md §2 and the
training-data pipeline operators), registered in the
``truthound_spark/entry_queries/`` package (split per-family in r13).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H-Q1-style pricing/quality summary over sf0.001
    lineitem — one fused groupBy aggregation (the engine's single-pass
    plan shape), grouped by returnflag/linestatus."""
    from pyspark.sql import functions as F

    df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    return (
        df.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("count_order"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.sum(F.when(F.col("l_quantity").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("null_qty"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordered for the driver's bounded verification prefix: family
    composites (each verifying every member 1-row query's full metric
    vector in one slot) first, then the multi-row showcase queries, then
    rows-only entries, then every granular query individually."""
    from truthound_spark.entry_families import build_registries

    return build_registries()[0]


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted entries are
    genuinely non-SQL-expressible → driver's weaker rows-only check)."""
    from truthound_spark.entry_families import build_registries

    return build_registries()[1]
