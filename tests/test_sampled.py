"""Sampled validation with Wilson intervals (sampled.py)."""

import math

import pytest
from pyspark.sql import functions as F

from truthound_spark.sampled import (
    sampled_check_report,
    wilson_interval,
    z_for_confidence,
)
from truthound_spark.validators.aggregate import MeanBetweenValidator
from truthound_spark.validators.completeness import NullValidator
from truthound_spark.validators.distribution import RangeValidator


class TestZ:
    def test_textbook_values(self):
        assert z_for_confidence(0.95) == pytest.approx(1.959963984540054, abs=1e-12)
        assert z_for_confidence(0.99) == pytest.approx(2.5758293035489004, abs=1e-12)
        assert z_for_confidence(0.90) == pytest.approx(1.6448536269514722, abs=1e-12)

    def test_consistent_with_erfc(self):
        # two-sided: P(|Z| <= z) = confidence
        for conf in (0.8, 0.92, 0.95, 0.98, 0.999):
            z = z_for_confidence(conf)
            assert math.erfc(z / math.sqrt(2)) == pytest.approx(1 - conf, abs=1e-14)

    def test_rejects_out_of_range(self):
        with pytest.raises(ValueError):
            z_for_confidence(1.0)
        with pytest.raises(ValueError):
            z_for_confidence(0.0)


class TestWilson:
    def test_zero_violations_has_informative_upper_bound(self):
        # the reason Wilson over Wald: a clean sample still bounds the rate
        p, lo, hi = wilson_interval(0, 100_000, 1.96)
        assert p == 0.0 and lo == 0.0
        assert 0 < hi < 1e-4

    def test_contains_true_rate(self):
        p, lo, hi = wilson_interval(50, 1000, 1.96)
        assert lo < 0.05 < hi
        assert p == 0.05

    def test_clamped_to_unit_interval(self):
        _, lo, hi = wilson_interval(1000, 1000, 1.96)
        assert hi == 1.0
        _, lo2, _ = wilson_interval(0, 10, 1.96)
        assert lo2 == 0.0

    def test_empty_sample(self):
        assert wilson_interval(0, 0, 1.96) == (None, None, None)


class TestReport:
    @pytest.fixture(scope="class")
    def lineitem(self, spark, sf_dir):
        return spark.read.parquet(f"{sf_dir}/lineitem.parquet")

    def test_keymod_sample_estimates_match_exact_counts(self, spark, lineitem):
        rep = sampled_check_report(
            lineitem,
            [NullValidator(columns=["l_returnflag"]), RangeValidator("l_quantity", 1, 30)],
            key_col="l_orderkey",
            modulus=10,
            residue=1,
        ).collect()
        by_check = {(r["check"], r["column"]): r for r in rep}
        sample = lineitem.filter(F.pmod(F.col("l_orderkey"), F.lit(10)) == 1)
        n = sample.count()
        exact_range = sample.filter(
            (F.col("l_quantity") < 1) | (F.col("l_quantity") > 30)
        ).count()
        r = by_check[("range", "l_quantity")]
        assert r["sample_rows"] == n
        assert r["violations"] == exact_range
        assert r["ci_low"] <= r["ratio"] <= r["ci_high"]
        assert by_check[("null", "l_returnflag")]["violations"] == 0

    def test_interval_covers_full_table_ratio(self, lineitem):
        # the whole point: the sample's CI should cover the true ratio
        rep = sampled_check_report(
            lineitem,
            [RangeValidator("l_quantity", 1, 30)],
            key_col="l_orderkey",
            modulus=20,
            residue=3,
        ).collect()[0]
        full_n = lineitem.count()
        full_v = lineitem.filter(
            (F.col("l_quantity") < 1) | (F.col("l_quantity") > 30)
        ).count()
        true_ratio = full_v / full_n
        assert rep["ci_low"] <= true_ratio <= rep["ci_high"]

    def test_fraction_mode_is_seeded(self, lineitem):
        a = sampled_check_report(
            lineitem, [NullValidator(columns=["l_linestatus"])], fraction=0.1, seed=7
        ).collect()
        b = sampled_check_report(
            lineitem, [NullValidator(columns=["l_linestatus"])], fraction=0.1, seed=7
        ).collect()
        assert a == b

    def test_scalar_judge_checks_are_skipped(self, lineitem):
        rep = sampled_check_report(
            lineitem,
            [MeanBetweenValidator("l_quantity", 1, 100)],
            key_col="l_orderkey",
        )
        assert rep.count() == 0

    def test_file_level_sample_reads_fewer_files(self, spark, sf_dir, tmp_path):
        # files mode is the IO-cutting path: the sampled frame's input
        # file list must be a strict, deterministic subset
        from truthound_spark.sampled import _file_sample

        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        path = str(tmp_path / "li_many_files")
        li.repartition(8).write.parquet(path)
        many = spark.read.parquet(path)
        sub = _file_sample(many, 0.2, 3)
        assert set(sub.inputFiles()) < set(many.inputFiles())
        assert set(_file_sample(many, 0.2, 3).inputFiles()) == set(sub.inputFiles())
        rep = sampled_check_report(
            many, [NullValidator(columns=["l_linestatus"])], level="files", fraction=0.2, seed=3
        ).collect()
        assert 0 < rep[0]["sample_rows"] < many.count()

    def test_file_level_sample_never_empty(self, spark, tmp_path):
        # self-written path: a shared sf_dir read can be cache-substituted
        # by other modules, which blanks inputFiles() (see _file_sample)
        path = str(tmp_path / "few")
        spark.range(100).withColumn("s", F.lit("x")).write.parquet(path)
        few = spark.read.parquet(path)
        rep = sampled_check_report(
            few, [NullValidator(columns=["s"])], level="files", fraction=1e-9
        ).collect()
        assert rep[0]["sample_rows"] > 0  # falls back to one file

    def test_validates_args(self, lineitem):
        with pytest.raises(ValueError):
            sampled_check_report(lineitem, [], key_col="l_orderkey", modulus=1)
        with pytest.raises(ValueError):
            sampled_check_report(
                lineitem, [], key_col="l_orderkey", modulus=10, residue=10
            )
        with pytest.raises(ValueError):
            sampled_check_report(lineitem, [], level="blocks")


class TestPartitionedFileSample:
    def test_partition_columns_survive_file_sampling(self, spark, tmp_path):
        # r12 fix: a direct leaf-file read skips partition discovery, so
        # partition columns came back all-NULL — every sampled check on a
        # partition column silently miscounted. basePath pins the table
        # root so the directory-borne values are recovered.
        path = str(tmp_path / "parted")
        spark.range(300).select(
            F.col("id"), (F.col("id") % 3).cast("string").alias("part")
        ).write.partitionBy("part").parquet(path)
        parted = spark.read.parquet(path)
        rep = sampled_check_report(
            parted,
            [NullValidator(columns=["part"])],
            level="files",
            fraction=0.6,
            seed=1,
        ).collect()
        assert rep[0]["sample_rows"] > 0
        assert rep[0]["violations"] == 0  # all-NULL bug would report 100%

    def test_single_partition_sample_keeps_value(self, spark, tmp_path):
        # edge: every sampled file under ONE partition dir — a naive
        # commonpath would fold `part=a` into basePath and lose the column
        from truthound_spark.sampled import _file_sample

        path = str(tmp_path / "one_part")
        spark.range(100).select(
            F.col("id"), F.lit("a").alias("part")
        ).write.partitionBy("part").parquet(path)
        parted = spark.read.parquet(path)
        sub = _file_sample(parted, 1.0, 0)
        assert {r["part"] for r in sub.select("part").distinct().collect()} == {"a"}

    def test_table_base_path_strips_partition_dirs(self):
        from truthound_spark.sampled import _table_base_path

        assert (
            _table_base_path(
                [
                    "file:/data/t/part=a/f1.parquet",
                    "file:/data/t/part=b/f2.parquet",
                ]
            )
            == "file:/data/t"
        )
        assert (
            _table_base_path(["file:/data/t/part=a/day=3/f1.parquet"])
            == "file:/data/t"
        )
        assert _table_base_path(["file:/data/t/f1.parquet"]) == "file:/data/t"
