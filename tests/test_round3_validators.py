"""Unit tests for round-3 validator additions: table family, schema
structure, multi-column arithmetic/consistency, privacy/compliance,
localization checksums, and misc long-tail (reference test style:
tiny inline frames with hand-countable defects)."""

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F


# --- table family ----------------------------------------------------------


def test_table_row_counts(spark):
    from truthound_spark.validators.table import (
        TableNotEmptyValidator,
        TableRowCountCompareValidator,
        TableRowCountExactValidator,
        TableRowCountRangeValidator,
    )

    df = spark.createDataFrame([(i,) for i in range(10)], ["x"])
    assert TableRowCountRangeValidator(min_rows=5, max_rows=20).validate(df) == []
    assert TableRowCountRangeValidator(min_rows=11).validate(df)
    assert TableRowCountExactValidator(10).validate(df) == []
    assert TableRowCountExactValidator(12, tolerance=1).validate(df)
    assert TableNotEmptyValidator().validate(df) == []
    empty = spark.createDataFrame([], "x int")
    assert TableNotEmptyValidator().validate(empty)
    ref = spark.createDataFrame([(i,) for i in range(10)], ["y"])
    assert TableRowCountCompareValidator(ref, "equal").validate(df) == []
    assert TableRowCountCompareValidator(5, "greater").validate(df) == []
    assert TableRowCountCompareValidator(100, "greater").validate(df)


def test_table_schema_shape(spark):
    from truthound_spark.validators.table import (
        TableColumnCountValidator,
        TableColumnTypesValidator,
        TableForbiddenColumnsValidator,
        TableRequiredColumnsValidator,
        TableSchemaCompareValidator,
        TableSchemaMatchValidator,
    )

    df = spark.createDataFrame([(1, "a", 2.0)], ["id", "name", "score"])
    assert TableColumnCountValidator(expected_count=3).validate(df) == []
    assert TableColumnCountValidator(max_count=2).validate(df)
    assert TableRequiredColumnsValidator(["id", "name"]).validate(df) == []
    assert TableRequiredColumnsValidator(["id", "missing"]).validate(df)
    assert TableForbiddenColumnsValidator(["ssn"]).validate(df) == []
    assert TableForbiddenColumnsValidator(["name"]).validate(df)

    ok = TableSchemaMatchValidator(
        {"id": "bigint", "name": "string", "score": "double"}
    ).validate(df)
    assert ok == []
    bad = TableSchemaMatchValidator({"id": "string", "name": "string"}).validate(df)
    types = {i.issue_type for i in bad}
    assert "schema_type_mismatch" in types and "schema_extra_columns" in types

    assert TableSchemaCompareValidator(df).validate(df) == []
    df2 = df.withColumn("extra", F.lit(1))
    assert TableSchemaCompareValidator(df).validate(df2)

    assert TableColumnTypesValidator({"id": ["bigint", "int"]}).validate(df) == []
    assert TableColumnTypesValidator({"score": "string"}).validate(df)


def test_table_size_and_dimensions(spark):
    from truthound_spark.validators.table import (
        TableDimensionsValidator,
        TableMemorySizeValidator,
        TableRowToColumnRatioValidator,
    )

    df = spark.createDataFrame([(i, i * 2) for i in range(100)], ["a", "b"])
    assert TableDimensionsValidator(min_rows=10, max_cols=3).validate(df) == []
    assert TableDimensionsValidator(max_rows=50).validate(df)
    assert TableRowToColumnRatioValidator(min_ratio=10).validate(df) == []
    assert TableRowToColumnRatioValidator(min_ratio=1000).validate(df)
    size = TableMemorySizeValidator.estimated_size_bytes(df)
    assert size > 0
    assert TableMemorySizeValidator(max_size_mb=1024).validate(df) == []
    assert TableMemorySizeValidator(max_size_bytes=1).validate(df)


def test_table_freshness(spark):
    from truthound_spark.validators.table import (
        TableDataRecencyValidator,
        TableFreshnessValidator,
        TableUpdateFrequencyValidator,
    )

    now = datetime(2026, 8, 13, 12, 0, 0)
    rows = [(now - timedelta(hours=h),) for h in range(24)]
    df = spark.createDataFrame(rows, ["ts"])
    assert (
        TableFreshnessValidator("ts", max_age_hours=2, reference_time=now).validate(df)
        == []
    )
    stale_ref = now + timedelta(days=5)
    assert TableFreshnessValidator(
        "ts", max_age_hours=2, reference_time=stale_ref
    ).validate(df)

    assert (
        TableDataRecencyValidator(
            "ts", max_age_days=2, min_recent_ratio=0.9, reference_time=now
        ).validate(df)
        == []
    )
    # hourly cadence with no gaps
    assert TableUpdateFrequencyValidator("ts", "hourly").validate(df) == []
    # drop half the hours -> gaps
    gappy = df.filter(F.hour("ts") % 2 == 0)
    assert TableUpdateFrequencyValidator("ts", "hourly").validate(gappy)


# --- schema structure ------------------------------------------------------


def test_schema_structure(spark):
    from truthound_spark.validators.schema_structure import (
        ColumnCountValidator,
        ColumnExistsValidator,
        ColumnNotExistsValidator,
        ColumnOrderValidator,
        ColumnTypeValidator,
        CompoundKeyValidator,
        MultiColumnCalculationValidator,
    )

    df = spark.createDataFrame([(1, "a", 2.0)], ["id", "name", "score"])
    assert ColumnExistsValidator(["id"]).validate(df) == []
    assert ColumnExistsValidator(["nope"]).validate(df)
    assert ColumnNotExistsValidator(["nope"]).validate(df) == []
    assert ColumnNotExistsValidator(["id"]).validate(df)
    assert ColumnOrderValidator(["id", "name", "score"]).validate(df) == []
    assert ColumnOrderValidator(["name", "id"]).validate(df)
    assert ColumnOrderValidator(["id", "score"], strict=False).validate(df) == []
    assert ColumnTypeValidator({"id": "int", "score": "float"}).validate(df) == []
    assert ColumnTypeValidator({"id": "string"}).validate(df)
    assert ColumnCountValidator(expected_count=3).validate(df) == []

    calc = spark.createDataFrame(
        [(2.0, 3.0, 6.0), (2.0, 2.0, 5.0)], ["a", "b", "total"]
    )
    issues = MultiColumnCalculationValidator("a", "*", "b", equals_column="total").validate(calc)
    assert issues[0].count == 1

    keys = spark.createDataFrame(
        [(1, "x"), (1, "x"), (2, None)], ["k1", "k2"]
    )
    issues = CompoundKeyValidator(["k1", "k2"]).validate(keys)
    assert issues and issues[0].actual["duplicates"] == 1 and issues[0].actual["nulls"] == 1


# --- multi-column arithmetic / comparison / consistency --------------------


def test_arithmetic_family(spark):
    from truthound_spark.validators.multi_column import (
        ColumnDifferenceValidator,
        ColumnPercentageValidator,
        ColumnProductValidator,
        ColumnRatioValidator,
        MultiColumnSumValidator,
    )

    df = spark.createDataFrame(
        [(10.0, 2.0, 20.0, 8.0), (10.0, 3.0, 31.0, 7.0)],
        ["a", "b", "prod", "diff"],
    )
    assert ColumnProductValidator(["a", "b"], result_column="prod").validate(df)[0].count == 1
    assert ColumnDifferenceValidator(["a", "b"], result_column="diff").validate(df) == []
    assert ColumnRatioValidator(["a", "b"], min_value=4.0).validate(df)[0].count == 1
    assert ColumnPercentageValidator(["b", "a"], max_value=25.0).validate(df)[0].count == 1
    assert MultiColumnSumValidator(["a", "b"], min_value=11.0).validate(df) == []
    with pytest.raises(ValueError):
        ColumnProductValidator(["a", "b"]).validate(df)


def test_comparison_family(spark):
    from truthound_spark.validators.multi_column import (
        ColumnChainComparisonValidator,
        ColumnComparisonValidator,
        ColumnMaxValidator,
        ColumnMinValidator,
    )

    df = spark.createDataFrame(
        [(1.0, 5.0, 10.0, 10.0, 1.0), (3.0, 2.0, 9.0, 9.0, 2.0)],
        ["lo", "mid", "hi", "mx", "mn"],
    )
    assert ColumnComparisonValidator(["lo", "mid"], "<").validate(df)[0].count == 1
    assert (
        ColumnChainComparisonValidator(["lo", "mid", "hi"], ["<=", "<="]).validate(df)[0].count
        == 1
    )
    assert ColumnMaxValidator(["lo", "mid", "hi"], "mx").validate(df) == []
    issues = ColumnMinValidator(["lo", "mid", "hi"], "mn").validate(df)
    assert issues == []  # mins are 1.0 and 2.0
    with pytest.raises(ValueError):
        ColumnComparisonValidator(["a"], "<")


def test_consistency_family(spark):
    from truthound_spark.validators.multi_column import (
        ColumnCoexistenceValidator,
        ColumnConsistencyValidator,
        ColumnDependencyValidator,
        ColumnImplicationValidator,
        ColumnMutualExclusivityValidator,
        MultiColumnUniqueValidator,
    )

    df = spark.createDataFrame(
        [
            ("shipped", "2024-01-01", "a@b.com", None),
            ("shipped", None, None, "x"),
            ("pending", None, None, None),
        ],
        ["status", "ship_date", "email", "phone"],
    )
    issues = ColumnDependencyValidator("status", "shipped", ["ship_date"]).validate(df)
    assert issues[0].count == 1
    issues = ColumnConsistencyValidator(
        [{"when": "status = 'shipped'", "then": "ship_date is not null"}]
    ).validate(df)
    assert issues[0].count == 1
    # email/phone: row1 has email only, row2 phone only, row3 neither
    issues = ColumnMutualExclusivityValidator(
        ["email", "phone"], allow_none=True
    ).validate(df)
    assert issues == []
    issues = ColumnMutualExclusivityValidator(["email", "phone"]).validate(df)
    assert issues[0].count == 1  # the all-null row
    issues = ColumnCoexistenceValidator(["ship_date", "email"]).validate(df)
    assert issues == []  # row1 both, row2 neither... wait row2 has neither
    issues = ColumnImplicationValidator("status", "pending", "phone", "x").validate(df)
    assert issues[0].count == 1

    dup = spark.createDataFrame([(1, "a"), (1, "a"), (2, "b")], ["x", "y"])
    issues = MultiColumnUniqueValidator(["x", "y"]).validate(dup)
    assert issues[0].actual == 1


# --- privacy / compliance --------------------------------------------------


@pytest.fixture(scope="module")
def pii_df(spark):
    return spark.createDataFrame(
        [
            ("a@example.com", "123-45-6789", "deleted", None, 35.2),
            ("b@example.com", "987-65-4321", "active", "yes", 37.8),
            ("not-an-email", "nope", "active", "yes", 36.1),
        ],
        ["email", "ssn", "status", "consent", "latitude"],
    )


def test_gdpr_ccpa_detection(spark, pii_df):
    from truthound_spark.validators.privacy import (
        CCPAComplianceValidator,
        GDPRComplianceValidator,
        GDPRSpecialCategoryValidator,
        GlobalPrivacyValidator,
    )

    issues = GDPRComplianceValidator().validate(pii_df)
    flagged = {i.column for i in issues}
    assert "email" in flagged and "latitude" in flagged
    issues = CCPAComplianceValidator().validate(pii_df)
    assert any(i.column == "ssn" for i in issues)
    issues = GlobalPrivacyValidator().validate(pii_df)
    assert any(i.column == "email" for i in issues)
    health = spark.createDataFrame([("flu",)], ["diagnosis_code"])
    issues = GDPRSpecialCategoryValidator(check_column_names_only=True).validate(health)
    assert issues and issues[0].severity.name == "CRITICAL"


def test_gdpr_minimization_and_erasure(spark, pii_df):
    from truthound_spark.validators.privacy import (
        GDPRDataMinimizationValidator,
        GDPRRightToErasureValidator,
    )

    # consent column: 1 null of 3 -> below default 0.95 threshold: pass
    assert GDPRDataMinimizationValidator().validate(pii_df) == []
    mostly_null = spark.createDataFrame(
        [("a@x.com",)] + [(None,)] * 19, ["email"]
    )
    issues = GDPRDataMinimizationValidator(max_null_ratio=0.9).validate(mostly_null)
    assert issues and issues[0].issue_type == "gdpr_unnecessary_pii_column"

    issues = GDPRRightToErasureValidator(deletion_flag_column="status").validate(pii_df)
    assert issues and issues[0].issue_type == "gdpr_erasure_pii_retained"
    assert issues[0].count == 1  # the 'deleted' row still has email+ssn
    issues = GDPRRightToErasureValidator(deletion_flag_column="gone").validate(pii_df)
    assert issues[0].issue_type == "gdpr_erasure_flag_missing"


def test_ccpa_consent_retention(spark, pii_df):
    from truthound_spark.validators.privacy import (
        CCPAConsumerRightsValidator,
        CCPADoNotSellValidator,
        ConsentValidator,
        DataRetentionValidator,
    )

    issues = CCPADoNotSellValidator(optout_column="consent").validate(pii_df)
    assert issues and issues[0].count == 1  # deleted row has PI, null consent
    issues = CCPAConsumerRightsValidator().validate(pii_df)
    assert issues and issues[0].issue_type == "ccpa_rights_tracking_missing"

    issues = ConsentValidator("consent", ["email", "ssn"]).validate(pii_df)
    assert issues[0].count == 1
    issues = ConsentValidator("missing_col", ["email"]).validate(pii_df)
    assert issues[0].issue_type == "consent_column_missing"

    old = spark.createDataFrame(
        [("a@x.com", datetime(2020, 1, 1)), ("b@x.com", datetime(2026, 8, 1))],
        ["email", "created"],
    )
    issues = DataRetentionValidator("created", retention_days=365).validate(old)
    assert issues[0].count == 1


def test_regional_compliance(spark):
    from truthound_spark.validators.privacy import (
        APPIComplianceValidator,
        LGPDComplianceValidator,
        PIPEDAComplianceValidator,
    )

    br = spark.createDataFrame([("123.456.789-09",)], ["cpf"])
    assert any(i.column == "cpf" for i in LGPDComplianceValidator().validate(br))
    ca = spark.createDataFrame([("046-454-286",)], ["sin"])
    assert any(i.column == "sin" for i in PIPEDAComplianceValidator().validate(ca))
    jp = spark.createDataFrame([("123456789012",)], ["my_number"])
    assert any(i.column == "my_number" for i in APPIComplianceValidator().validate(jp))


# --- localization checksums ------------------------------------------------


def _valid_kr_business_number() -> str:
    digits = [1, 2, 3, 4, 5, 6, 7, 8, 9]
    weights = [1, 3, 7, 1, 3, 7, 1, 3, 5]
    total = sum(d * w for d, w in zip(digits, weights)) + (digits[8] * 5) // 10
    check = (10 - total % 10) % 10
    return "".join(map(str, digits)) + str(check)


def test_korean_business_and_bank(spark):
    from truthound_spark.validators.business import (
        KoreanBankAccountValidator,
        KoreanBusinessNumberValidator,
    )

    good = _valid_kr_business_number()
    bad = good[:-1] + str((int(good[-1]) + 1) % 10)
    df = spark.createDataFrame([(good,), (bad,), ("12345",)], ["bn"])
    issues = KoreanBusinessNumberValidator("bn").validate(df)
    assert issues[0].count == 2
    formatted = spark.createDataFrame([(f"{good[:3]}-{good[3:5]}-{good[5:]}",)], ["bn"])
    assert KoreanBusinessNumberValidator("bn").validate(formatted) == []

    acct = spark.createDataFrame(
        [("1234567890123", "KAKAO"), ("123", "KB"), ("12345678901234567", None)],
        ["acct", "bank"],
    )
    issues = KoreanBankAccountValidator("acct", bank_column="bank").validate(acct)
    assert issues[0].count == 2


# --- misc long tail --------------------------------------------------------


def test_sign_validators(spark):
    from truthound_spark.validators.distribution import (
        NonNegativeValidator,
        PositiveValidator,
    )

    df = spark.createDataFrame([(1.0,), (0.0,), (-2.0,), (None,)], ["x"])
    assert NonNegativeValidator("x").validate(df)[0].count == 1
    assert PositiveValidator("x").validate(df)[0].count == 2


def test_distinct_count_family(spark):
    from truthound_spark.validators.uniqueness import (
        ApproximateUniqueRatioValidator,
        DistinctCountBetweenValidator,
        StreamingDistinctCountValidator,
    )

    df = spark.createDataFrame([(i % 10,) for i in range(100)], ["x"])
    assert DistinctCountBetweenValidator("x", 5, 15).validate(df) == []
    assert DistinctCountBetweenValidator("x", min_count=20).validate(df)
    assert DistinctCountBetweenValidator("x", 5, 15, approx=True).validate(df) == []
    issues = ApproximateUniqueRatioValidator("x", min_ratio=0.9).validate(df)
    assert issues and issues[0].actual <= 0.2
    assert StreamingDistinctCountValidator("x", max_count=15).validate(df) == []


def test_coordinate_and_geo_distance(spark):
    from truthound_spark.validators.geospatial import (
        CoordinateValidator,
        GeoDistanceValidator,
    )

    df = spark.createDataFrame(
        [(37.5, 127.0), (95.0, 127.0), (None, 10.0)], ["lat", "lon"]
    )
    assert CoordinateValidator("lat", "lon").validate(df)[0].count == 2

    trips = spark.createDataFrame(
        [
            (37.5665, 126.9780, 35.1796, 129.0756),  # Seoul -> Busan ~325 km
            (37.5665, 126.9780, 37.5665, 126.9780),  # zero distance
        ],
        ["lat1", "lon1", "lat2", "lon2"],
    )
    issues = GeoDistanceValidator(
        "lat1", "lon1", "lat2", "lon2", min_distance=1.0, unit="km"
    ).validate(trips)
    assert issues[0].count == 1
    issues = GeoDistanceValidator(
        "lat1", "lon1", "lat2", "lon2", max_distance=400.0, unit="km"
    ).validate(trips)
    assert issues == []


def test_timeseries_order_and_decomposition(spark):
    from truthound_spark.validators.timeseries import (
        SeasonalDecompositionValidator,
        TimeSeriesOrderValidator,
    )

    base = datetime(2026, 1, 1)
    rows = [(i, base + timedelta(hours=i)) for i in range(50)]
    rows[10] = (10, base - timedelta(hours=1))  # out of order vs seq
    df = spark.createDataFrame(rows, ["seq", "ts"])
    issues = TimeSeriesOrderValidator("ts", order_by="seq").validate(df)
    assert issues and issues[0].count >= 1

    import math

    seasonal_rows = [
        (base + timedelta(days=i), 10.0 + 5.0 * math.sin(2 * math.pi * i / 7))
        for i in range(70)
    ]
    sdf = spark.createDataFrame(seasonal_rows, ["ts", "v"])
    assert (
        SeasonalDecompositionValidator("v", "ts", period=7).validate(sdf) == []
    )


def test_new_validators_in_fused_suite(spark):
    """Table + multi-column + privacy specs all fuse into one agg batch."""
    from truthound_spark.core.executor import BatchExpressionExecutor
    from truthound_spark.validators.multi_column import ColumnComparisonValidator
    from truthound_spark.validators.privacy import GDPRComplianceValidator
    from truthound_spark.validators.table import (
        TableDimensionsValidator,
        TableRowCountRangeValidator,
    )

    df = spark.createDataFrame(
        [(1.0, 2.0, "a@b.com"), (3.0, 1.0, "x")], ["a", "b", "email"]
    )
    issues = BatchExpressionExecutor(
        [
            TableRowCountRangeValidator(min_rows=1),
            TableDimensionsValidator(max_cols=5),
            ColumnComparisonValidator(["a", "b"], "<"),
            GDPRComplianceValidator(),
        ]
    ).execute(df)
    types = {i.issue_type for i in issues}
    assert "column_comparison_violation" in types
    assert "gdpr_pii_detected" in types
    assert "table_row_count_out_of_range" not in types


def test_registry_reaches_242(spark):
    import truthound_spark.validators  # noqa: F401
    from truthound_spark.core.registry import get_validator, list_validators

    names = list_validators()
    assert len(names) >= 240
    for n in (
        "table_freshness",
        "gdpr_compliance",
        "column_product",
        "compound_key",
        "korean_business_number",
        "geo_distance",
        "column_exists",
        "streaming_distinct_count",
    ):
        assert get_validator(n) is not None
