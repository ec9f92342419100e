"""Per-validator unit tests with tiny known-count frames.

Style of the reference's tests/test_validators.py:17-49 (NullValidator on
[1, None, 3, None, 5] asserts count == 2, severity tiers at ratio
thresholds).
"""

import pytest

import truthound_spark as th
from truthound_spark.types import ResultFormat, Severity


def _df(spark, data, schema):
    return spark.createDataFrame(data, schema)


def test_null_counts(spark):
    df = _df(spark, [(1,), (None,), (3,), (None,), (5,)], "col int")
    res = th.check(df, validators=[th.validators.get_validator("null")()])
    assert len(res.issues) == 1
    issue = res.issues[0]
    assert issue.count == 2
    assert issue.column == "col"
    # 40% nulls → high (>0.2)
    assert issue.severity == Severity.HIGH


def test_null_severity_tiers(spark):
    # 20% nulls → medium (>0.05, <=0.2 boundary: 1/5=0.2 is NOT > 0.2)
    df = _df(spark, [(None,), (2,), (3,), (4,), (5,)], "col int")
    res = th.check(df, validators=["null"])
    assert res.issues[0].severity == Severity.MEDIUM
    # 60% nulls → critical (>0.5)
    df = _df(spark, [(None,), (None,), (None,), (4,), (5,)], "col int")
    res = th.check(df, validators=["null"])
    assert res.issues[0].severity == Severity.CRITICAL


def test_clean_data_passes(spark):
    df = _df(spark, [(1, "a"), (2, "b")], "id int, name string")
    res = th.check(df, validators=["null"])
    assert res.success
    assert res.row_count == 2


def test_unique(spark):
    from truthound_spark.validators.uniqueness import UniqueValidator

    df = _df(spark, [(1,), (2,), (2,), (4,)], "customer_id int")
    res = th.check(df, validators=[UniqueValidator(columns=["customer_id"])])
    assert len(res.issues) == 1
    assert res.issues[0].count == 1  # one surplus duplicate


def test_range(spark):
    from truthound_spark.validators.distribution import RangeValidator

    df = _df(spark, [(25,), (35,), (151,), (40,), (-3,)], "age int")
    res = th.check(df, validators=[RangeValidator(column="age", min_value=0, max_value=120)])
    assert res.issues[0].count == 2


def test_mixed_core_suite_benchmark_parity(spark):
    """The reference's local-mixed-core-suite golden workload: 3 issues
    (BASELINE.md / FIXTURES.md F1: dup customer_id, null email, age 151)."""
    from truthound_spark.validators.completeness import NullValidator
    from truthound_spark.validators.distribution import RangeValidator
    from truthound_spark.validators.uniqueness import UniqueValidator

    df = _df(
        spark,
        [
            (1, "a@example.com", 25, "active"),
            (2, "b@example.com", 35, "active"),
            (2, None, 151, "inactive"),
            (4, "d@example.com", 40, "active"),
        ],
        "customer_id int, email string, age int, status string",
    )
    res = th.check(
        df,
        validators=[
            NullValidator(columns=["email"]),
            UniqueValidator(columns=["customer_id"]),
            RangeValidator(column="age", min_value=0, max_value=120),
        ],
    )
    assert len(res.issues) == 3
    assert not res.success
    counts = {i.validator_name: i.count for i in res.issues}
    assert counts == {"null": 1, "unique": 1, "range": 1}


def test_in_set_and_not_in_set(spark):
    from truthound_spark.validators.distribution import InSetValidator, NotInSetValidator

    df = _df(spark, [("O",), ("F",), ("X",), ("P",)], "status string")
    res = th.check(df, validators=[InSetValidator("status", ["O", "F", "P"])])
    assert res.issues[0].count == 1
    res = th.check(df, validators=[NotInSetValidator("status", ["X"])])
    assert res.issues[0].count == 1


def test_regex_email(spark):
    from truthound_spark.validators.string import EmailValidator

    df = _df(
        spark,
        [("a@b.com",), ("bad-email",), ("x@y.org",), ("also@bad@bad.com",)],
        "email string",
    )
    res = th.check(df, validators=[EmailValidator("email")])
    assert res.issues[0].count == 2


def test_length_and_empty(spark):
    from truthound_spark.validators.completeness import EmptyStringValidator, WhitespaceOnlyValidator
    from truthound_spark.validators.string import LengthValidator

    df = _df(spark, [("",), ("  ",), ("abc",), ("toolongvalue",)], "s string")
    res = th.check(
        df,
        validators=[
            EmptyStringValidator(columns=["s"]),
            WhitespaceOnlyValidator(columns=["s"]),
            LengthValidator("s", min_length=1, max_length=5),
        ],
    )
    by_type = {i.issue_type: i.count for i in res.issues}
    assert by_type["empty_strings"] == 1
    assert by_type["whitespace_only"] == 1
    assert by_type["length_out_of_range"] == 2  # "" and "toolongvalue"


def test_duplicate_rows(spark):
    from truthound_spark.validators.uniqueness import DuplicateValidator

    df = _df(spark, [(1, "a"), (1, "a"), (2, "b")], "id int, v string")
    issues = DuplicateValidator().validate(df)
    assert issues[0].count == 2  # both rows of the dup group


def test_primary_key(spark):
    from truthound_spark.validators.uniqueness import PrimaryKeyValidator

    df = _df(spark, [(1,), (2,), (2,), (None,)], "id int")
    res = th.check(df, validators=[PrimaryKeyValidator("id")])
    assert len(res.issues) == 1
    assert res.issues[0].severity == Severity.CRITICAL


def test_mean_between(spark):
    from truthound_spark.validators.aggregate import MeanBetweenValidator

    df = _df(spark, [(10.0,), (20.0,), (30.0,)], "v double")
    res = th.check(df, validators=[MeanBetweenValidator("v", 15, 25)])
    assert res.success
    res = th.check(df, validators=[MeanBetweenValidator("v", 0, 10)])
    assert not res.success
    assert res.issues[0].actual == 20.0


def test_column_pair_and_sum(spark):
    from truthound_spark.validators.multi_column import ColumnPairValidator, ColumnSumValidator

    df = _df(spark, [(1.0, 2.0, 3.0), (5.0, 1.0, 7.0)], "a double, b double, total double")
    res = th.check(df, validators=[ColumnPairValidator("a", "b", "<=")])
    assert res.issues[0].count == 1
    res = th.check(df, validators=[ColumnSumValidator(["a", "b"], "total", tolerance=1e-9)])
    assert res.issues[0].count == 1


def test_outlier_iqr(spark):
    from truthound_spark.validators.distribution import IQROutlierValidator

    rows = [(float(i),) for i in range(1, 21)] + [(1000.0,)]
    df = _df(spark, rows, "v double")
    issues = IQROutlierValidator(columns=["v"]).validate(df)
    assert issues[0].count == 1


def test_foreign_key_orphans(spark):
    from truthound_spark.validators.referential import ForeignKeyValidator

    parent = _df(spark, [(1,), (2,), (3,)], "id int")
    child = _df(spark, [(1,), (2,), (9,), (9,)], "parent_id int")
    issues = ForeignKeyValidator(parent, "parent_id", "id").validate(child)
    assert issues[0].count == 2


def test_circular_reference(spark):
    from truthound_spark.validators.referential import CircularReferenceValidator

    # 1→2→3→1 cycle plus 4→1 chain
    df = _df(spark, [(1, 2), (2, 3), (3, 1), (4, 1)], "id int, parent_id int")
    issues = CircularReferenceValidator("id", "parent_id").validate(df)
    assert issues and issues[0].issue_type == "circular_reference"
    # acyclic
    df2 = _df(spark, [(1, None), (2, 1), (3, 2)], "id int, parent_id int")
    assert CircularReferenceValidator("id", "parent_id").validate(df2) == []


def test_custom_expression(spark):
    from truthound_spark.validators.query import CustomExpressionValidator

    df = _df(spark, [(1, 10), (5, 2)], "a int, b int")
    res = th.check(df, validators=[CustomExpressionValidator("a < b")])
    assert res.issues[0].count == 1


def test_conditional_expression(spark):
    from truthound_spark.validators.query import ConditionalExpressionValidator

    df = _df(spark, [("US", 10), ("US", -5), ("KR", -1)], "country string, v int")
    res = th.check(df, validators=[ConditionalExpressionValidator("country = 'US'", "v > 0")])
    assert res.issues[0].count == 1


def test_sql_query_validators(spark):
    from truthound_spark.validators.query import QueryReturnsNoRowsValidator, check_sql_safety

    df = _df(spark, [(1,), (-2,), (3,)], "v int")
    issues = QueryReturnsNoRowsValidator("SELECT * FROM data WHERE v < 0").validate(df)
    assert issues[0].count == 1
    with pytest.raises(ValueError):
        check_sql_safety("DROP TABLE x")


def test_luhn(spark):
    from truthound_spark.validators.business import LuhnValidator

    # 4539578763621486 valid; 4539578763621487 invalid
    df = _df(spark, [("4539578763621486",), ("4539578763621487",)], "card string")
    res = th.check(df, validators=[LuhnValidator("card")])
    assert res.issues[0].count == 1


def test_evidence_result_format(spark):
    df = _df(spark, [(None,), (2,), (None,)], "col int")
    res = th.check(df, validators=["null"], result_format=ResultFormat.BASIC)
    assert res.issues[0].sample_values == [None, None]


def test_json_parseable(spark):
    from truthound_spark.validators.string import JsonParseableValidator

    df = _df(spark, [('{"k": 1}',), ("not json",), ("[1,2]",)], "j string")
    res = th.check(df, validators=[JsonParseableValidator("j")])
    assert res.issues[0].count == 1


def test_timeseries_gap(spark):
    import datetime as dt

    from truthound_spark.validators.timeseries import TimeSeriesGapValidator

    base = dt.datetime(2024, 1, 1)
    rows = [(base + dt.timedelta(minutes=m),) for m in [0, 1, 2, 30, 31]]
    df = spark.createDataFrame(rows, "ts timestamp")
    issues = TimeSeriesGapValidator("ts", max_gap_seconds=120).validate(df)
    assert issues[0].count == 1


def test_auto_suite_runs(spark):
    df = _df(spark, [(1, "a@b.com"), (2, None)], "user_id int, email string")
    res = th.check(df)
    assert res.checks_run >= 2
