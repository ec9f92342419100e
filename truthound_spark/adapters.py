"""Input adaptation: anything → pyspark DataFrame.

Reference: src/truthound/adapters.py:12-118 ``to_lazyframe`` accepts path /
DataFrame / dict / pandas; file loading dispatches on extension
(.csv→scan_csv, .parquet→scan_parquet, .ndjson/.jsonl→scan_ndjson).
Spark-first: ``spark.read.*`` readers keep scans lazy + partitioned; schema
inference only where the format requires it.
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession


def get_spark(app_name: str = "truthound-spark") -> SparkSession:
    """Session bootstrap with scale-appropriate defaults.

    AQE on (runtime re-plan / skew-join handling), shuffle partitions sized
    for the local harness; on a real cluster these come from spark-submit.
    """
    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .getOrCreate()
    )


def to_dataframe(data: Any, spark: SparkSession | None = None) -> DataFrame:
    """Adapt path / DataFrame / dict / pandas / list-of-rows → DataFrame."""
    if isinstance(data, DataFrame):
        return data
    spark = spark or get_spark()
    if isinstance(data, str):
        return _read_path(spark, data)
    if isinstance(data, dict):
        cols = list(data.keys())
        n = max((len(v) for v in data.values()), default=0)
        rows = [tuple(data[c][i] for c in cols) for i in range(n)]
        return spark.createDataFrame(rows, schema=cols)
    try:  # pandas without a hard dependency at import time
        import pandas as pd

        if isinstance(data, pd.DataFrame):
            return spark.createDataFrame(data)
    except ImportError:  # pragma: no cover
        pass
    if isinstance(data, list):
        return spark.createDataFrame(data)
    raise TypeError(f"cannot adapt {type(data).__name__} to a Spark DataFrame")


def _read_path(spark: SparkSession, path: str) -> DataFrame:
    """Extension dispatch (reference adapters.py:58-90)."""
    lower = path.lower()
    if lower.endswith(".parquet") or lower.rstrip("/").endswith(".parquet"):
        return spark.read.parquet(path)
    if lower.endswith(".csv"):
        return spark.read.csv(path, header=True, inferSchema=True)
    if lower.endswith((".ndjson", ".jsonl", ".json")):
        return spark.read.json(path)
    if lower.endswith(".orc"):
        return spark.read.orc(path)
    # directory of parquet (the common lake layout)
    return spark.read.parquet(path)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one synthetic test table (TESTDATA.md layout)."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
