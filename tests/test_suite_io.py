"""Suite serialization (suite_io.py; reference profiler/generators/
suite_generator.py ValidationSuite): learn → save → load → enforce."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from truthound_spark.suite_io import (
    SuiteSerializationError,
    ValidationSuite,
    load_suite,
    save_suite,
    validator_to_dict,
)


@pytest.fixture(scope="module")
def cust(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/customer.parquet").cache()


def _learned_suite(cust):
    from truthound_spark.ml import DataProfileRuleLearner, rules_to_suite

    res = DataProfileRuleLearner(strictness="loose").learn_rules(
        cust, columns=["c_custkey", "c_acctbal", "c_name"]
    )
    return rules_to_suite(res.rules)


def test_roundtrip_json_and_yaml(cust, tmp_path):
    suite = _learned_suite(cust)
    for ext in ("json", "yaml"):
        path = str(tmp_path / f"suite.{ext}")
        save_suite(suite, path, name="customer-learned", origin="test")
        loaded = load_suite(path)
        assert loaded.name == "customer-learned"
        assert len(loaded) == len(suite)
        # loaded validators are the same classes with the same params
        assert [type(v).__name__ for v in loaded] == [type(v).__name__ for v in suite]
        d1 = [validator_to_dict(v) for v in suite]
        d2 = [validator_to_dict(v) for v in loaded]
        assert d1 == d2


def test_loaded_suite_enforces_identically(spark, cust, tmp_path):
    suite = _learned_suite(cust)
    path = str(tmp_path / "s.json")
    save_suite(suite, path)
    loaded = load_suite(path)

    ok = loaded.check(cust)
    assert ok.success
    broken = cust.withColumn(
        "c_acctbal",
        F.when(F.col("c_custkey") % 40 == 0, F.lit(9e9)).otherwise(F.col("c_acctbal")),
    )
    r1 = loaded.check(broken)
    from truthound_spark.api import check

    r2 = check(broken, validators=suite)
    assert not r1.success and not r2.success
    assert {(i.issue_type, i.column, i.count) for i in r1.issues} == {
        (i.issue_type, i.column, i.count) for i in r2.issues
    }


def test_history_thresholds_suite_roundtrips(spark, tmp_path):
    """The full learning loop artifact: history thresholds → suite →
    file → reload → enforce."""
    import random

    from truthound_spark.ml import HistoryThresholdLearner, thresholds_to_suite
    from truthound_spark.profiler.table_profiler import profile

    rng = random.Random(5)
    snaps = [
        spark.createDataFrame(
            [(i, float(rng.gauss(50, 3))) for i in range(1000)], "id long, v double"
        )
        for _ in range(3)
    ]
    tt = HistoryThresholdLearner().learn([profile(s, with_duplicates=False) for s in snaps])
    suite = thresholds_to_suite(tt)
    path = str(tmp_path / "hist.yaml")
    save_suite(suite, path, name="hist")
    loaded = load_suite(path)
    assert loaded.check(snaps[0]).success
    drifted = spark.createDataFrame(
        [(i, float(rng.gauss(90, 3))) for i in range(1000)], "id long, v double"
    )
    assert not loaded.check(drifted).success


def test_filters(cust):
    suite = ValidationSuite(name="s", validators=_learned_suite(cust))
    only_bal = suite.filter_by_columns("c_acctbal")
    assert 0 < len(only_bal) < len(suite)
    only_range = suite.filter_by_validator("range")
    assert all(type(v).__name__ == "RangeValidator" for v in only_range)


def test_runtime_only_validator_rejected(spark, cust):
    from truthound_spark.validators.referential import ForeignKeyValidator

    v = ForeignKeyValidator(cust, "c_nationkey")
    with pytest.raises(SuiteSerializationError):
        validator_to_dict(v)


def test_mined_rule_name_roundtrips(spark, tmp_path):
    """Review finding: class-level registry name masked the instance's
    mined-rule name for CustomExpressionValidator."""
    from truthound_spark.validators.query import CustomExpressionValidator

    v = CustomExpressionValidator(
        "a IS NULL OR b IS NULL OR a <= b", name="order_a_leq_b", mostly=0.99
    )
    d = validator_to_dict(v)
    assert d["params"]["name"] == "order_a_leq_b"
    assert d["params"]["mostly"] == 0.99
    from truthound_spark.suite_io import validator_from_dict

    back = validator_from_dict(d)
    assert back._name == "order_a_leq_b" and back.mostly == 0.99
