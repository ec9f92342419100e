"""FeatureDriftDetector (ml/feature_drift.py; reference
ml/drift_detection/feature.py): fit-once profiles, detect without
re-scanning the reference, numeric + categorical scoring."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from truthound_spark.ml import FeatureDriftDetector, ModelRegistry


def _frame(spark, n, mean, cats=("a", "b", "c"), null_every=0, seed=1):
    """Fixed-support values (a shuffled grid around ``mean``): the
    range-exceeded term (reference feature.py:365 — fires 0.5 whenever
    current extremes exceed the OBSERVED reference range) must not trip
    on ordinary sampling-tail differences in the no-drift tests."""
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        v = None if null_every and i % null_every == 0 else mean + (i % 21) - 10.0
        rows.append((v, cats[i % len(cats)]))
    rng.shuffle(rows)
    return spark.createDataFrame(rows, "v double, c string")


def test_no_drift_between_like_windows(spark):
    det = FeatureDriftDetector(threshold=0.1).fit(_frame(spark, 2000, 100, seed=2))
    res = det.detect(_frame(spark, 2000, 100, seed=3))
    assert not res.is_drifted and res.drift_type == "none"
    assert res.confidence == 1.0


def test_numeric_mean_std_range_null_signals(spark):
    ref = _frame(spark, 2000, 100, seed=4)
    det = FeatureDriftDetector(threshold=0.3).fit(ref)
    # mean shifted 6 sigma -> mean term 2.0 capped at 1.0
    res = det.detect(_frame(spark, 2000, 130, seed=5))
    fs = {f.feature: f for f in res.feature_scores}
    assert fs["v"].is_drifted and fs["v"].drift_score == 1.0
    assert "mean:" in fs["v"].details
    assert res.drift_type == "single_feature"
    # nulls appear in current -> null_ratio term
    res2 = det.detect(_frame(spark, 2000, 100, null_every=3, seed=6))
    fs2 = {f.feature: f for f in res2.feature_scores}
    assert "null_ratio" in fs2["v"].details
    assert fs2["v"].drift_score == pytest.approx(1 / 3, abs=0.05)


def test_categorical_new_missing_values(spark):
    ref = _frame(spark, 1500, 100, cats=("a", "b", "c"), seed=7)
    det = FeatureDriftDetector(threshold=0.2).fit(ref)
    res = det.detect(_frame(spark, 1500, 100, cats=("a", "b", "NEW"), seed=8))
    fs = {f.feature: f for f in res.feature_scores}
    # 'NEW' carries 1/3 of current mass; 'c' (1/3 of ref) disappeared
    assert fs["c"].is_drifted and fs["c"].drift_score == pytest.approx(1 / 3, abs=0.01)
    assert "new values" in fs["c"].details and "missing values" in fs["c"].details


def test_detect_never_scans_reference_again(spark):
    """The point of the fitted profile: detection works after the
    reference frame is GONE (unpersisted/dropped view) — profiles are
    driver state."""
    ref = _frame(spark, 1000, 100, seed=9)
    det = FeatureDriftDetector().fit(ref)
    del ref
    res = det.detect(_frame(spark, 1000, 140, seed=10))
    assert res.is_drifted


def test_registry_roundtrip_identical_results(spark, tmp_path):
    ref = _frame(spark, 1000, 100, seed=11)
    cur = _frame(spark, 1000, 115, cats=("a", "x", "c"), seed=12)
    det = FeatureDriftDetector(threshold=0.2).fit(ref)
    reg = ModelRegistry(root=str(tmp_path / "m"))
    v = reg.save_feature_drift("fd", det)
    back = reg.load_feature_drift("fd", v)
    assert back.detect(cur).to_dict() == det.detect(cur).to_dict()


def test_profile_shapes_and_fused_aggregate(spark):
    ref = _frame(spark, 500, 50, seed=13)
    det = FeatureDriftDetector().fit(ref)
    p = det.profiles_
    assert p["v"]["type"] == "numeric" and p["c"]["type"] == "categorical"
    assert p["v"]["count"] == 500 and p["v"]["q1"] < p["v"]["median"] < p["v"]["q3"]
    assert set(p["c"]["proportions"]) == {"a", "b", "c"}
    assert sum(p["c"]["proportions"].values()) == pytest.approx(1.0)
