"""SDK templates + testing harness (reference sdk/templates.py, testing.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from truthound_spark.core.base import NUMERIC_TYPES
from truthound_spark.core.registry import get_validator
from truthound_spark.sdk_templates import (
    CompositeValidator,
    SimpleColumnValidator,
    SimpleComparisonValidator,
    SimplePatternValidator,
    SimpleRangeValidator,
)
from truthound_spark.sdk_testing import (
    ValidatorTestCase,
    benchmark_validator,
    create_edge_case_data,
    create_test_dataframe,
)


class PositiveValidator(SimpleColumnValidator):
    name = "sdk_test_positive"
    category = "numeric"
    issue_type = "non_positive_value"
    dtype_filter = NUMERIC_TYPES

    def violation_expr(self, col):
        return col <= 0


class NoSSN(SimplePatternValidator):
    name = "sdk_test_no_ssn"
    category = "privacy"
    pattern = r"\d{3}-\d{2}-\d{4}"
    match_full = False
    invert_match = True
    issue_type = "contains_ssn"


class Percentage(SimpleRangeValidator):
    name = "sdk_test_percentage"
    min_value = 0
    max_value = 100
    issue_type = "invalid_percentage"


class StartBeforeEnd(SimpleComparisonValidator):
    name = "sdk_test_start_before_end"
    left_column = "start"
    right_column = "end"
    operator = "<="


def test_simple_column_template(spark):
    df = spark.createDataFrame([(1.0,), (-2.0,), (0.0,), (5.0,)], "v double")
    issues = PositiveValidator().validate(df)
    assert len(issues) == 1 and issues[0].count == 2


def test_simple_pattern_invert_match(spark):
    df = spark.createDataFrame(
        [("123-45-6789",), ("hello",), ("ssn 987-65-4321 inline",)], "t string"
    )
    issues = NoSSN().validate(df)
    assert issues and issues[0].count == 2
    assert issues[0].issue_type == "contains_ssn"


def test_simple_pattern_requires_pattern():
    class Bad(SimplePatternValidator):
        name = "sdk_test_bad_pattern"

    with pytest.raises(ValueError):
        Bad()


def test_simple_range_edges(spark):
    df = spark.createDataFrame([(0.0,), (100.0,), (-0.1,), (100.1,)], "p double")
    issues = Percentage().validate(df)
    assert issues and issues[0].count == 2

    class StrictlyPositive(SimpleRangeValidator):
        name = "sdk_test_strict_pos"
        min_value = 0
        inclusive_min = False

    issues = StrictlyPositive().validate(df)  # 0.0 and -0.1 violate
    assert issues and issues[0].count == 2


def test_simple_comparison(spark):
    df = spark.createDataFrame(
        [(1, 2), (5, 3), (4, 4), (None, 9)], "start int, end int"
    )
    issues = StartBeforeEnd().validate(df)
    assert issues and issues[0].count == 1  # only (5,3); null row skipped


def test_composite_fuses_members(spark):
    from truthound_spark.validators.completeness import NullValidator

    class Bundle(CompositeValidator):
        name = "sdk_test_bundle"

        def get_validators(self):
            return [NullValidator(columns=["v"]), PositiveValidator(columns=["v"])]

    df = spark.createDataFrame([(1.0,), (None,), (-3.0,)], "v double")
    issues = Bundle().validate(df)
    assert {i.issue_type for i in issues} == {"null_values", "non_positive_value"}
    # member specs concatenate — the whole bundle is one fused spec list
    assert len(Bundle().specs(df)) == 2


def test_templates_registered_and_subclasses_autoregister():
    for n in ["simple_column", "simple_pattern", "simple_range",
              "simple_comparison", "composite"]:
        assert get_validator(n) is not None
    assert get_validator("sdk_test_positive") is PositiveValidator


def test_validator_testcase_harness(spark):
    from truthound_spark.validators.completeness import NullValidator

    class TC(ValidatorTestCase):
        validator_class = NullValidator

    tc = TC()
    tc.spark = spark
    tc.validate({"name": ["a", None, "b", None]}, validator=NullValidator(columns=["name"]))
    tc.assert_has_issue(column="name", min_count=2)
    tc.assert_total_violations(2)
    tc.assert_no_error()
    with pytest.raises(AssertionError):
        tc.assert_no_issues()

    res = tc.validate_safe({"name": ["a", "b"]}, validator=NullValidator(columns=["name"]))
    assert res.error is None and res.issue_count == 0
    tc.assert_no_issues()


def test_edge_case_fixtures_and_bench(spark):
    cases = create_edge_case_data(spark)
    assert set(cases) >= {"empty", "all_null", "extremes", "nan", "unicode"}
    # every edge frame survives a template validator without raising
    for name, df in cases.items():
        if "value" in df.columns:
            PositiveValidator().validate(df)
    big = create_test_dataframe(spark, n_rows=500, null_ratio=0.1)
    assert big.count() == 500
    from truthound_spark.validators.completeness import NullValidator

    r = benchmark_validator(NullValidator(columns=["value"]), big, runs=2, warmup=1)
    assert r.n_rows == 500 and r.min_s > 0 and r.rows_per_s > 0


def test_plugin_based_privacy(spark):
    from truthound_spark.validators.privacy import (
        PIIFieldDefinition,
        PluginBasedPrivacyValidator,
        PrivacyRegulationPlugin,
        get_privacy_plugin,
        register_privacy_plugin,
    )

    df = spark.createDataFrame(
        [("a@x.com", "111-22-3333"), ("b@y.org", "hello")],
        "email string, note string",
    )
    # built-in code path
    v = PluginBasedPrivacyValidator(regulation_code="gdpr")
    issues = v.validate(df)
    assert any("email" == i.column for i in issues)
    # custom plugin path (HIPAA-ish)
    register_privacy_plugin(
        PrivacyRegulationPlugin(
            "hipaa_test",
            "HIPAA",
            [PIIFieldDefinition("ssn", pattern=r"^\d{3}-\d{2}-\d{4}$",
                                column_hints=["ssn"])],
        )
    )
    v2 = PluginBasedPrivacyValidator(plugin=get_privacy_plugin("hipaa_test"))
    issues2 = v2.validate(df)
    assert any(i.column == "note" for i in issues2)
    assert issues2[0].issue_type.startswith("hipaa_test")
    with pytest.raises(ValueError):
        PluginBasedPrivacyValidator()
    with pytest.raises(KeyError):
        PluginBasedPrivacyValidator(regulation_code="nope")
