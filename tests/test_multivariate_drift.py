"""Multivariate drift detector (ml/multivariate_drift.py; reference
ml/drift_detection/multivariate.py): correlation rotation / manifold
tilt / joint-mean shift that univariate marginals can't see."""

from __future__ import annotations

import random

import pytest

from truthound_spark.ml import (
    ModelRegistry,
    MultivariateDriftDetector,
    correlation_drift_table,
)


def _corr_rotated(spark, n, rho, seed):
    """(x, y) with corr ≈ rho; x and y marginals are N(0,1) regardless."""
    rng = random.Random(seed)
    rows = []
    for _ in range(n):
        a, b = rng.gauss(0, 1), rng.gauss(0, 1)
        rows.append((a, rho * a + (1 - rho**2) ** 0.5 * b, rng.gauss(5, 2)))
    return spark.createDataFrame(rows, "x double, y double, z double")


def test_correlation_rotation_detected_marginals_silent(spark):
    ref = _corr_rotated(spark, 3000, 0.9, seed=1)
    cur = _corr_rotated(spark, 3000, -0.9, seed=2)
    det = MultivariateDriftDetector(method="correlation").fit(ref)
    res = det.detect(cur)
    assert res.is_drifted and res.drift_type == "correlation_shift"
    assert res.drift_score == 1.0  # |Δcorr| ≈ 1.8 ≫ 0.5 cap
    scores = dict(res.column_scores)
    # x and y carry the rotation; z is uninvolved
    assert scores["x"] > 0.5 and scores["y"] > 0.5 and scores["z"] < 0.2
    assert "x-y" in res.details

    # the univariate marginals really are silent
    from truthound_spark.drift.detectors import psi

    assert not psi(ref, cur, "x").drifted and not psi(ref, cur, "y").drifted


def test_no_drift_between_like_windows(spark):
    ref = _corr_rotated(spark, 2000, 0.6, seed=3)
    cur = _corr_rotated(spark, 2000, 0.6, seed=4)
    det = MultivariateDriftDetector(method="correlation", threshold=0.2).fit(ref)
    res = det.detect(cur)
    assert not res.is_drifted and res.drift_type == "none"


def test_mahalanobis_mean_shift(spark):
    ref = _corr_rotated(spark, 2000, 0.5, seed=5)
    cur = _corr_rotated(spark, 2000, 0.5, seed=6).selectExpr(
        "x + 3 AS x", "y + 3 AS y", "z"
    )
    det = MultivariateDriftDetector(method="mahalanobis", threshold=0.3).fit(ref)
    res = det.detect(cur)
    assert res.is_drifted and res.drift_type == "multivariate_shift"
    scores = dict(res.column_scores)
    assert scores["x"] > 0.8 and scores["z"] < 0.3
    assert "Mahalanobis" in res.details


def test_pca_variance_shift(spark):
    ref = _corr_rotated(spark, 3000, 0.9, seed=7)
    det = MultivariateDriftDetector(method="pca", n_components=2).fit(ref)
    assert det.pca_explained_var_ is not None
    # first component of a strongly-correlated pair dominates
    assert det.pca_explained_var_[0] > det.pca_explained_var_[1]
    # same distribution → small score; decorrelated data shifts variance
    same = det.detect(_corr_rotated(spark, 3000, 0.9, seed=8))
    rotated = det.detect(_corr_rotated(spark, 3000, -0.9, seed=9))
    assert rotated.drift_score > same.drift_score
    assert rotated.is_drifted and rotated.drift_type == "manifold_shift"


def test_pca_is_deterministic_given_seed(spark):
    ref = _corr_rotated(spark, 1000, 0.7, seed=10)
    d1 = MultivariateDriftDetector(method="pca", seed=5).fit(ref)
    d2 = MultivariateDriftDetector(method="pca", seed=5).fit(ref)
    assert d1.pca_explained_var_ == pytest.approx(d2.pca_explained_var_)
    assert all(
        a == pytest.approx(b)
        for ca, cb in zip(d1.pca_components_, d2.pca_components_)
        for a, b in zip(ca, cb)
    )


def test_requires_two_numeric_columns(spark):
    df = spark.createDataFrame([(1.0, "a")], "x double, s string")
    with pytest.raises(ValueError):
        MultivariateDriftDetector().fit(df)


def test_persistence_roundtrip(spark, tmp_path):
    ref = _corr_rotated(spark, 1000, 0.8, seed=11)
    cur = _corr_rotated(spark, 1000, -0.4, seed=12)
    for method in ("correlation", "pca", "mahalanobis"):
        det = MultivariateDriftDetector(method=method, threshold=0.2).fit(ref)
        reg = ModelRegistry(root=str(tmp_path / f"m_{method}"))
        v = reg.save_multivariate_drift("mv", det)
        back = reg.load_multivariate_drift("mv", v)
        assert back.detect(cur).to_dict() == det.detect(cur).to_dict(), method


def test_correlation_drift_table_matches_detector(spark):
    ref = _corr_rotated(spark, 800, 0.9, seed=13)
    cur = _corr_rotated(spark, 800, -0.2, seed=14)
    det = MultivariateDriftDetector(method="correlation").fit(ref)
    res = det.detect(cur)
    tbl = correlation_drift_table(ref, cur, ["x", "y", "z"]).collect()
    assert len(tbl) == 3  # 3 pairs
    assert all(r["drift_score"] == pytest.approx(round(res.drift_score, 6)) for r in tbl)
    xy = next(r for r in tbl if r["col_a"] == "x" and r["col_b"] == "y")
    assert xy["diff"] == pytest.approx(
        abs(xy["cur_corr"] - xy["ref_corr"]), abs=2e-6
    )
