import os

import pytest
from pyspark.sql import SparkSession


@pytest.fixture(scope="session")
def spark():
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    b = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("truthound-spark-tests")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    # Put a JDBC driver jar (if one is installed locally) on the driver
    # classpath so the live-JDBC round-trip tests can run; everything else
    # is unaffected when absent.
    from truthound_spark.sources.jdbc import find_jdbc_driver_jar

    jar = find_jdbc_driver_jar()
    if jar:
        b = b.config("spark.jars", jar).config("spark.driver.extraClassPath", jar)
    s = b.getOrCreate()
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
