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


def test_fd_and_implication_validators_roundtrip(spark, tmp_path):
    """ADVICE r7: validators that pluralize a scalar-or-list ctor arg
    (determinant→determinants, condition_value→condition_values,
    antecedent_value→antecedent_values) must serialize — these are
    exactly the rule types ConstraintMiner emits."""
    from truthound_spark.suite_io import validator_from_dict
    from truthound_spark.validators.multi_column import (
        ColumnDependencyValidator,
        ColumnImplicationValidator,
        FunctionalDependencyValidator,
    )

    vs = [
        FunctionalDependencyValidator("nation", "region"),
        FunctionalDependencyValidator(["nation", "city"], "region"),
        ColumnDependencyValidator("status", "shipped", ["ship_date"]),
        ColumnDependencyValidator("status", ["shipped", "billed"], ["ship_date"]),
        ColumnImplicationValidator("a", 1, "b", [2, 3]),
    ]
    for v in vs:
        back = validator_from_dict(validator_to_dict(v))
        assert vars(back) == vars(v), type(v).__name__
    path = str(tmp_path / "fd.json")
    save_suite(vs, path, name="fd-suite")
    loaded = load_suite(path)
    assert [vars(v) for v in loaded] == [vars(v) for v in vs]

    df = spark.createDataFrame(
        [("kr", "asia", "seoul"), ("jp", "asia", "tokyo"), ("fr", "eu", "paris")],
        "nation string, region string, city string",
    )
    assert loaded.filter_by_validator("functional_dependency").check(df).success


def test_mined_fd_rule_suite_saves(spark, tmp_path):
    """End-to-end: ConstraintMiner-mined FD rules → rules_to_suite →
    save_suite must not raise SuiteSerializationError (ADVICE r7)."""
    from truthound_spark.ml import rules_to_suite
    from truthound_spark.ml.rule_learning import ConstraintMiner

    df = spark.createDataFrame(
        [(i, f"n{i % 5}", f"r{(i % 5) // 3}") for i in range(200)],
        "id long, nation string, region string",
    )
    res = ConstraintMiner().learn_rules(df, columns=["nation", "region"])
    fd_rules = [r for r in res.rules if r.rule_type == "functional_dependency"]
    assert fd_rules, "miner should find nation→region"
    suite = rules_to_suite(fd_rules)
    path = str(tmp_path / "mined.json")
    save_suite(suite, path, name="mined-fd")
    loaded = load_suite(path)
    assert len(loaded) == len(suite)
    assert loaded.check(df).success


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
