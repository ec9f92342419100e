"""Model-quality validators: AUC / calibration / threshold gates as
check() citizens over (score, label) columns."""

from __future__ import annotations

from truthound_spark.api import check


def _scored(spark, auc_good=True):
    rows = []
    for i in range(200):
        y = 1.0 if i % 2 == 0 else 0.0
        if auc_good:
            s = 0.7 + (i % 7) * 0.04 if y else 0.2 + (i % 7) * 0.04
        else:
            s = (i % 10) / 10.0  # independent of label → AUC ~0.5
        rows.append((round(s, 2), y))
    return spark.createDataFrame(rows, "score double, y double")


def test_auc_validator_pass_and_fail(spark):
    from truthound_spark.validators.model_quality import AucValidator

    good = check(_scored(spark, True), validators=[AucValidator("score", "y", 0.9)])
    assert good.success
    bad = check(_scored(spark, False), validators=[AucValidator("score", "y", 0.7)])
    assert not bad.success
    assert bad.issues[0].issue_type == "auc_below_threshold"


def test_auc_validator_single_class_fails_loudly(spark):
    from truthound_spark.validators.model_quality import AucValidator

    df = spark.createDataFrame([(0.9, 1.0), (0.8, 1.0)], "score double, y double")
    res = check(df, validators=[AucValidator("score", "y", 0.5)])
    assert not res.success and "single-class" in res.issues[0].details


def test_calibration_validator(spark):
    from truthound_spark.validators.model_quality import CalibrationValidator

    # perfectly calibrated: 100 rows at 0.3 with 30% positives
    rows = [(0.3, 1.0 if i < 30 else 0.0) for i in range(100)]
    df = spark.createDataFrame(rows, "score double, y double")
    assert check(df, validators=[CalibrationValidator("score", "y", max_gap=0.05)]).success
    # badly calibrated: score 0.9 but 10% positives
    rows = [(0.9, 1.0 if i < 10 else 0.0) for i in range(100)]
    df = spark.createDataFrame(rows, "score double, y double")
    res = check(df, validators=[CalibrationValidator("score", "y", max_gap=0.2)])
    assert not res.success
    assert res.issues[0].issue_type == "calibration_gap"
    # small bins below min_bin_n never fire (noise guard)
    tiny = spark.createDataFrame([(0.9, 0.0)] * 5, "score double, y double")
    assert check(tiny, validators=[CalibrationValidator("score", "y", max_gap=0.2)]).success


def test_classifier_threshold_validator(spark):
    from truthound_spark.validators.model_quality import ClassifierThresholdValidator

    df = _scored(spark, True)
    ok = check(
        df,
        validators=[ClassifierThresholdValidator("score", "y", 0.5, 0.9, 0.9)],
    )
    assert ok.success
    bad = check(
        _scored(spark, False),
        validators=[ClassifierThresholdValidator("score", "y", 0.5, 0.9, 0.0)],
    )
    assert not bad.success and bad.issues[0].issue_type == "precision_below_threshold"


def test_model_quality_registry_names(spark):
    from truthound_spark.core.registry import list_validators

    assert {"auc", "calibration", "classifier_threshold"} <= set(
        list_validators("model_quality")
    )
