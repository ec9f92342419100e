"""Unit tests for round-2 validator additions (reference test style:
tiny inline frames with hand-countable defects, tests/test_validators.py)."""

import pytest
from pyspark.sql import functions as F


# --- completeness ----------------------------------------------------------


def test_nan_ratio_and_finite(spark):
    from truthound_spark.validators.completeness import FiniteValidator, NaNRatioValidator

    df = spark.createDataFrame(
        [(1.0,), (float("nan"),), (float("inf"),), (4.0,)], ["x"]
    )
    issues = NaNRatioValidator(max_ratio=0.1).validate(df)
    assert issues and issues[0].count == 1  # 1 NaN of 4 = 25% > 10%
    issues = FiniteValidator().validate(df)
    assert issues[0].count == 2  # NaN + inf


# --- distribution pair sets ------------------------------------------------


def test_column_pair_in_set(spark):
    from truthound_spark.validators.distribution import (
        ColumnPairInSetValidator,
        ColumnPairNotInSetValidator,
    )

    df = spark.createDataFrame(
        [("US", "USD"), ("KR", "KRW"), ("US", "KRW")], ["country", "currency"]
    )
    issues = ColumnPairInSetValidator(
        "country", "currency", [("US", "USD"), ("KR", "KRW")]
    ).validate(df)
    assert issues[0].count == 1
    issues = ColumnPairNotInSetValidator(
        "country", "currency", [("US", "KRW")]
    ).validate(df)
    assert issues[0].count == 1


# --- string ----------------------------------------------------------------


def test_not_match_regex_list(spark):
    from truthound_spark.validators.string import NotMatchRegexListValidator

    df = spark.createDataFrame([("secret-key",), ("ok",), ("password123",)], ["s"])
    issues = NotMatchRegexListValidator("s", ["secret", "password"]).validate(df)
    assert issues[0].count == 2


def test_ipv6_and_alphanumeric(spark):
    from truthound_spark.validators.string import AlphanumericValidator, Ipv6Validator

    df = spark.createDataFrame(
        [("2001:0db8:85a3:0000:0000:8a2e:0370:7334",), ("not-ipv6",)], ["ip"]
    )
    assert Ipv6Validator("ip").validate(df)[0].count == 1
    df2 = spark.createDataFrame([("abc123",), ("no spaces!",)], ["s"])
    assert AlphanumericValidator("s").validate(df2)[0].count == 1


def test_json_schema(spark):
    from truthound_spark.validators.string import JsonSchemaValidator

    df = spark.createDataFrame(
        [
            ('{"k": 1, "name": "a"}',),
            ('{"name": "b"}',),          # missing required k
            ('{"k": "oops", "name": 3}',),  # k not a number
            ("not json",),
        ],
        ["j"],
    )
    schema = {"required": ["k"], "properties": {"k": {"type": "number"}}}
    issues = JsonSchemaValidator("j", schema).validate(df)
    assert issues[0].count == 3


# --- business / localization ----------------------------------------------


def test_vat_swift(spark):
    from truthound_spark.validators.business import SwiftBicValidator, VatValidator

    df = spark.createDataFrame([("DE123456789",), ("XX1",)], ["vat"])
    assert VatValidator("vat").validate(df)[0].count == 1
    df2 = spark.createDataFrame([("DEUTDEFF",), ("DEUTDEFF500",), ("bad",)], ["bic"])
    assert SwiftBicValidator("bic").validate(df2)[0].count == 1


def test_japanese_postal_and_chinese_id(spark):
    from truthound_spark.validators.business import (
        ChineseIdValidator,
        JapanesePostalValidator,
    )

    df = spark.createDataFrame([("123-4567",), ("1234567",)], ["postal"])
    assert JapanesePostalValidator("postal").validate(df)[0].count == 1

    # 11010519491231002X is the canonical valid example ID
    df2 = spark.createDataFrame(
        [("11010519491231002X",), ("110105194912310021",)], ["cid"]
    )
    issues = ChineseIdValidator("cid").validate(df2)
    assert issues[0].count == 1


# --- timeseries trend / seasonality ---------------------------------------


def test_trend_slope(spark):
    import datetime as dt

    from truthound_spark.validators.timeseries import TrendValidator

    base = dt.datetime(2024, 1, 1)
    rows = [(base + dt.timedelta(seconds=i), float(2 * i)) for i in range(100)]
    df = spark.createDataFrame(rows, ["ts", "y"])
    # slope is 2/s — require <= 1/s to trigger
    issues = TrendValidator("y", "ts", max_slope=1.0).validate(df)
    assert issues and abs(issues[0].actual - 2.0) < 1e-6
    assert TrendValidator("y", "ts", max_slope=3.0).validate(df) == []


def test_seasonality_deviation(spark):
    import datetime as dt

    from truthound_spark.validators.timeseries import SeasonalityValidator

    rows = []
    for day in range(28):
        d = dt.datetime(2024, 1, 1 + day)
        v = 100.0 if d.weekday() == 6 else 10.0  # sundays spike
        rows.append((d, v))
    df = spark.createDataFrame(rows, ["ts", "y"])
    issues = SeasonalityValidator("y", "ts", part="dayofweek").validate(df)
    assert issues and issues[0].count >= 1


# --- ml_feature ------------------------------------------------------------


def test_target_leakage(spark):
    from truthound_spark.validators.ml_feature import TargetLeakageValidator

    rows = [(float(i), float(i) * 2.0, float(i % 7)) for i in range(50)]
    df = spark.createDataFrame(rows, ["target", "leaky", "ok"])
    issues = TargetLeakageValidator("target").validate(df)
    assert issues and issues[0].actual[0]["column"] == "leaky"


def test_feature_scale_and_corr_matrix(spark):
    from truthound_spark.validators.ml_feature import (
        FeatureCorrelationMatrixValidator,
        FeatureScaleValidator,
    )

    rows = [(float(i), float(i) * 1e6, float(i * i % 13)) for i in range(60)]
    df = spark.createDataFrame(rows, ["a", "b", "c"])
    issues = FeatureScaleValidator(max_ratio=100).validate(df)
    assert issues and "b" in issues[0].column
    issues = FeatureCorrelationMatrixValidator(max_abs_corr=0.9).validate(df)
    assert issues and issues[0].actual[0]["a"] == "a"


def test_feature_null_impact(spark):
    from truthound_spark.validators.ml_feature import FeatureNullImpactValidator

    rows = []
    for i in range(100):
        f = None if i < 20 else float(i)
        target = 100.0 if f is None else 1.0
        rows.append((f, target))
    df = spark.createDataFrame(rows, ["feat", "y"])
    issues = FeatureNullImpactValidator("y", min_null_count=5).validate(df)
    assert issues and issues[0].column == "feat"


# --- query family ----------------------------------------------------------


def test_query_family(spark):
    from truthound_spark.validators.query import (
        QueryAggregateCompareValidator,
        QueryAggregateValidator,
        QueryColumnNotNullValidator,
        QueryColumnUniqueValidator,
        QueryColumnValuesValidator,
        QueryMatchesValidator,
        QueryReturnsRowsValidator,
        QueryRowCountCompareValidator,
        QueryRowCountRatioValidator,
    )

    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (2, None, 30.0)], ["id", "tag", "v"]
    )
    assert QueryReturnsRowsValidator("SELECT * FROM data").validate(df) == []
    assert QueryReturnsRowsValidator("SELECT * FROM data WHERE id > 99").validate(df)

    assert (
        QueryMatchesValidator(
            "SELECT id FROM data WHERE v > 15 ORDER BY id", [(2,), (2,)]
        ).validate(df)
        == []
    )
    assert QueryRowCountRatioValidator(
        "SELECT * FROM data WHERE v > 15", 0.0, 0.5
    ).validate(df)  # 2/3 > 0.5 → issue
    assert (
        QueryRowCountCompareValidator(
            "SELECT * FROM data WHERE v > 15", "SELECT * FROM data WHERE id = 2", "=="
        ).validate(df)
        == []
    )
    assert QueryColumnValuesValidator("SELECT tag FROM data", ["a"]).validate(df)[0].count == 1
    assert QueryColumnUniqueValidator("SELECT id FROM data").validate(df)[0].count == 1
    assert QueryColumnNotNullValidator("SELECT tag FROM data").validate(df)[0].count == 1
    assert (
        QueryAggregateValidator("SELECT v FROM data", "sum", 50, 70).validate(df) == []
    )
    assert (
        QueryAggregateCompareValidator(
            "SELECT v FROM data WHERE id = 2",
            "SELECT v FROM data WHERE id = 2",
            "sum",
        ).validate(df)
        == []
    )


# --- drift validators (registered) ----------------------------------------


def test_registered_drift_validators(spark):
    from truthound_spark.drift.validators import (
        FeatureDriftValidator,
        MeanDriftValidator,
        QuantileDriftValidator,
        RangeDriftValidator,
    )

    base = spark.createDataFrame([(float(i),) for i in range(100)], ["x"])
    shifted = spark.createDataFrame([(float(i) + 200,) for i in range(100)], ["x"])
    assert MeanDriftValidator(base).validate(shifted)
    assert MeanDriftValidator(base).validate(base) == []
    assert QuantileDriftValidator(base).validate(shifted)
    assert RangeDriftValidator(base, threshold=0.1).validate(base) == []
    issues = FeatureDriftValidator(base, method="psi").validate(shifted)
    assert issues and issues[0].issue_type == "psi_drift"


def test_check_reaches_drift_by_name(spark):
    """th.check(..., validators=[PSIValidator(baseline)]) path works."""
    from truthound_spark import api
    from truthound_spark.drift.validators import PSIValidator

    base = spark.createDataFrame([(float(i),) for i in range(50)], ["x"])
    cur = spark.createDataFrame([(float(i) + 500,) for i in range(50)], ["x"])
    res = api.check(cur, validators=[PSIValidator(base)])
    assert any(i.issue_type == "psi_drift" for i in res.issues)


# --- multivariate anomaly / cascade / auto-suite ---------------------------


def test_zscore_multivariate_and_pca(spark):
    from truthound_spark.validators.anomaly import (
        PCAAnomalyValidator,
        ZScoreMultivariateValidator,
    )

    rows = [(float(i % 10), float((i * 3) % 10)) for i in range(100)]
    rows.append((500.0, -500.0))  # gross outlier
    df = spark.createDataFrame(rows, ["a", "b"])
    issues = ZScoreMultivariateValidator(["a", "b"], k=3.5).validate(df)
    assert issues and issues[0].count >= 1
    issues = PCAAnomalyValidator(["a", "b"], threshold_quantile=0.9).validate(df)
    assert issues and issues[0].count >= 1


def test_cascade_integrity(spark):
    from truthound_spark.validators.referential import CascadeIntegrityValidator

    parents = spark.createDataFrame(
        [(1, True), (2, False), (3, True)], ["pid", "deleted"]
    )
    children = spark.createDataFrame(
        [(10, 1, False), (11, 2, False), (12, 3, True)], ["cid", "pid", "deleted"]
    )
    issues = CascadeIntegrityValidator(
        parents, "pid", "pid", "deleted", "deleted"
    ).validate(children)
    # child 10 references deleted parent 1 but is not flagged
    assert issues and issues[0].count == 1


def test_cascade_depth(spark):
    from truthound_spark.validators.referential import CascadeDepthValidator

    rows = [(0, None), (1, 0), (2, 1), (3, 2), (4, 3)]
    df = spark.createDataFrame(rows, ["id", "parent"])
    assert CascadeDepthValidator("id", "parent", max_depth=10).validate(df) == []
    issues = CascadeDepthValidator("id", "parent", max_depth=2).validate(df)
    assert issues and issues[0].actual > 2


def test_auto_suite_uses_learned_baseline(spark):
    """Reference parity: learn() on clean data must auto-flag an injected
    out-of-range row (VERDICT round-1 item 8)."""
    from truthound_spark import api
    from truthound_spark.schema import learn

    clean = spark.createDataFrame(
        [(i, float(20 + i % 30)) for i in range(200)], ["user_id", "age"]
    )
    baseline = learn(clean)
    dirty = clean.union(spark.createDataFrame([(999, 5000.0)], ["user_id", "age"]))
    res = api.check(dirty, baseline=baseline)
    assert any(i.issue_type == "out_of_range" and i.column == "age" for i in res.issues)

    # learn=True path: learns on the (dirty) data itself — no range issue
    # (fences widen around observed data) but the suite still runs
    res2 = api.check(dirty, learn=True)
    assert res2.checks_run > 0


def test_geo_country_and_multipolygon(spark):
    from truthound_spark.validators.geospatial import (
        GeoCountryValidator,
        MultiPolygonValidator,
    )

    df = spark.createDataFrame(
        [(37.5, 127.0), (51.5, -0.1), (0.0, 0.0)], ["lat", "lon"]
    )
    issues = GeoCountryValidator("lat", "lon", "KR").validate(df)
    assert issues and issues[0].count == 2  # only Seoul inside KR

    square_kr = [(33.0, 124.0), (33.0, 132.0), (39.0, 132.0), (39.0, 124.0)]
    square_uk = [(49.0, -9.0), (49.0, 2.0), (61.0, 2.0), (61.0, -9.0)]
    issues = MultiPolygonValidator("lat", "lon", [square_kr, square_uk]).validate(df)
    assert issues and issues[0].count == 1  # null island outside both


def test_one_sample_distribution(spark):
    from truthound_spark.validators.distribution import DistributionValidator

    rows = [("a",)] * 50 + [("b",)] * 50
    df = spark.createDataFrame(rows, ["cat"])
    ok = DistributionValidator("cat", {"a": 0.5, "b": 0.5}).validate(df)
    assert ok == []
    bad = DistributionValidator("cat", {"a": 0.95, "b": 0.05}).validate(df)
    assert bad and bad[0].issue_type == "distribution_mismatch"


def test_multi_table_orphan(spark):
    from truthound_spark.validators.referential import MultiTableOrphanValidator

    parents_a = spark.createDataFrame([(1,), (2,)], ["pk"])
    parents_b = spark.createDataFrame([(10,), (20,)], ["qk"])
    child = spark.createDataFrame([(1, 10), (2, 99), (3, 20)], ["a_id", "b_id"])
    issues = MultiTableOrphanValidator(
        [(parents_a, "a_id", "pk"), (parents_b, "b_id", "qk")]
    ).validate(child)
    assert len(issues) == 2
    by_col = {i.column: i.count for i in issues}
    assert by_col == {"a_id": 1, "b_id": 1}


def test_sklearn_gated_validators_skip_cleanly(spark):
    from truthound_spark.validators.anomaly import (
        EllipticEnvelopeValidator,
        LOFValidator,
        OneClassSVMValidator,
    )

    df = spark.createDataFrame([(1.0, 2.0)], ["a", "b"])
    for cls in (LOFValidator, OneClassSVMValidator, EllipticEnvelopeValidator):
        issues = cls(["a", "b"]).validate(df)
        # environment has no sklearn: must skip with a LOW execution_error
        assert issues and issues[0].issue_type == "execution_error"


def test_phone_region_ssn_zip(spark):
    from truthound_spark.validators.string import (
        PhoneRegionValidator,
        UsSsnValidator,
        UsZipValidator,
    )

    df = spark.createDataFrame(
        [("(212) 555-0123",), ("010-1234-5678",), ("junk",)], ["phone"]
    )
    assert PhoneRegionValidator("phone", "US").validate(df)[0].count == 2
    assert PhoneRegionValidator("phone", "KR").validate(df)[0].count == 2

    df2 = spark.createDataFrame(
        [("123-45-6789",), ("000-12-3456",), ("666-12-3456",), ("987-65-4320",)], ["ssn"]
    )
    # 000 and 666 areas invalid; 9xx area invalid
    assert UsSsnValidator("ssn").validate(df2)[0].count == 3
    df3 = spark.createDataFrame([("12345",), ("12345-6789",), ("1234",)], ["zip"])
    assert UsZipValidator("zip").validate(df3)[0].count == 1


def test_cramer_von_mises(spark):
    from truthound_spark.drift.detectors import cramer_von_mises
    from truthound_spark.drift.validators import CramerVonMisesValidator

    base = spark.createDataFrame([(float(i % 200),) for i in range(1000)], ["x"])
    same = spark.createDataFrame([(float(i % 200) + 0.5,) for i in range(1000)], ["x"])
    shifted = spark.createDataFrame([(float(i % 200) + 150,) for i in range(1000)], ["x"])
    r_same = cramer_von_mises(base, same, "x")
    r_shift = cramer_von_mises(base, shifted, "x")
    assert not r_same.drifted
    assert r_shift.drifted and r_shift.statistic > r_same.statistic
    issues = CramerVonMisesValidator(base).validate(shifted)
    assert issues and issues[0].issue_type == "cramer_von_mises_drift"


def test_increasing_distributed_matches_window(spark):
    """Range-partitioned monotonic check == single-window semantics."""
    import random

    from pyspark.sql import Window as W

    from truthound_spark.validators.distribution import (
        DecreasingValidator,
        IncreasingValidator,
    )

    rng = random.Random(7)
    rows = [(i, float(i) + (50.0 if rng.random() < 0.05 else 0.0) * rng.choice([-1, 1]))
            for i in range(2000)]
    df = spark.createDataFrame(rows, ["o", "v"])

    # ground truth via the naive single-partition window
    prev = F.lag("v").over(W.orderBy("o"))
    expected = df.select(
        F.when((F.col("v") < prev) & prev.isNotNull(), 1).otherwise(0).alias("b")
    ).agg(F.sum("b")).collect()[0][0]

    issues = IncreasingValidator("v", "o", num_partitions=8).validate(df)
    got = issues[0].count if issues else 0
    assert got == int(expected or 0)

    # decreasing over a mostly-increasing series flags most steps
    issues = DecreasingValidator("v", "o", num_partitions=8).validate(df)
    assert issues and issues[0].count > 1500
