"""Fitted DistributionDriftDetector (ml/distribution_drift.py; reference
ml/drift_detection/distribution.py): PSI/KS/JS/Wasserstein from stored
histograms + quantile-grid ECDFs — the reference never re-scanned."""

from __future__ import annotations

import random

import pytest

from truthound_spark.ml import DistributionDriftDetector, ModelRegistry


def _df(spark, n, mu, sigma=5.0, seed=1):
    rng = random.Random(seed)
    return spark.createDataFrame(
        [(rng.gauss(mu, sigma), rng.uniform(0, 1)) for _ in range(n)],
        "v double, u double",
    )


@pytest.mark.parametrize("method", ["psi", "ks", "jensen_shannon", "wasserstein"])
def test_each_method_fires_on_shift_and_stays_quiet_on_none(spark, method):
    ref = _df(spark, 3000, 100, seed=2)
    det = DistributionDriftDetector(method=method, threshold=0.1).fit(ref)
    same = det.detect(_df(spark, 3000, 100, seed=3))
    shifted = det.detect(_df(spark, 3000, 115, seed=4))
    assert shifted.drift_score > same.drift_score, method
    assert shifted.is_drifted, method
    scores = dict(shifted.column_scores)
    assert scores["v"] >= 0.1 and scores["u"] < scores["v"], method
    assert shifted.drift_type in ("single_feature", "partial"), method
    assert "v" in shifted.details


def test_detect_without_reference_and_profile_is_bounded(spark):
    ref = _df(spark, 2000, 50, seed=5)
    det = DistributionDriftDetector(method="psi", n_bins=10, grid=50).fit(ref)
    # fitted state is O(cols × (bins + grid)), never raw values
    st = det.stats_["v"]
    assert len(st["bins"]) == 10 and len(st["quantiles"]) == 49
    assert "values" not in st
    del ref
    assert det.detect(_df(spark, 2000, 80, seed=6)).is_drifted


def test_ks_grid_tracks_exact_ks(spark):
    """The grid ECDF bounds the exact statistic: for a clean mean shift
    the grid-KS must land near the exact two-sample KS."""
    from truthound_spark.drift.detectors import ks_test

    ref = _df(spark, 2000, 0, sigma=1.0, seed=7).select("v")
    cur = _df(spark, 2000, 1.0, sigma=1.0, seed=8).select("v")
    det = DistributionDriftDetector(method="ks", grid=200).fit(ref)
    grid_ks = dict(det.detect(cur).column_scores)["v"]
    exact = ks_test(ref, cur, "v").statistic
    assert grid_ks == pytest.approx(exact, abs=0.03)


def test_registry_roundtrip(spark, tmp_path):
    ref = _df(spark, 1000, 10, seed=9)
    cur = _df(spark, 1000, 14, seed=10)
    det = DistributionDriftDetector(method="jensen_shannon", threshold=0.1).fit(ref)
    reg = ModelRegistry(root=str(tmp_path / "m"))
    v = reg.save_distribution_drift("dd", det)
    back = reg.load_distribution_drift("dd", v)
    assert back.detect(cur).to_dict() == det.detect(cur).to_dict()


def test_constant_column_single_bin(spark):
    df = spark.createDataFrame([(1.0, float(i)) for i in range(200)], "k double, v double")
    det = DistributionDriftDetector(method="psi").fit(df)
    assert det.stats_["k"]["bins"] == [pytest.approx(1.0)]
    res = det.detect(df)
    assert dict(res.column_scores)["k"] == pytest.approx(0.0)
