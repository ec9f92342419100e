"""Ensemble anomaly detector (ml/ensemble.py; reference
ml/anomaly_models/ensemble.py): strategy semantics, fitted-component
persistence, map-only scoring plan."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from truthound_spark.ml import (
    EnsembleAnomalyDetector,
    IQRDetector,
    MADDetector,
    ModelRegistry,
    ZScoreDetector,
)


@pytest.fixture(scope="module")
def planted(spark):
    """Gaussian bulk + 5 extreme outliers."""
    rng = random.Random(21)
    rows = [(i, rng.gauss(100.0, 5.0)) for i in range(2000)]
    rows += [(2000 + j, 100.0 + 200.0 * (j + 1)) for j in range(5)]
    return spark.createDataFrame(rows, "id long, v double").cache()


def _fitted(df):
    return [
        ZScoreDetector(["v"]).fit(df),
        IQRDetector(["v"]).fit(df),
        MADDetector(["v"]).fit(df),
    ]


def test_planted_outliers_flagged_by_every_strategy(planted):
    dets = _fitted(planted)
    for strat in ("average", "weighted_average", "max", "min", "vote", "unanimous"):
        ens = EnsembleAnomalyDetector.from_fitted(dets, strat)
        pred = ens.predict(planted)
        flagged = {r["id"] for r in pred.filter("is_anomaly").select("id").collect()}
        assert {2000, 2001, 2002, 2003, 2004} <= flagged, strat
        # the bulk stays clean: <1% false-positive mass
        assert len(flagged) <= 25, strat


def test_strategy_combination_formulas(spark):
    """Pin the combiners against hand-computed scores on a 1-row frame
    with known component stats."""
    df = spark.createDataFrame([(50.0,)], "v double")
    dz, di, dm = ZScoreDetector(["v"]), IQRDetector(["v"]), MADDetector(["v"])
    dz.stats_ = {"v": {"mean": 0.0, "std": 10.0}}  # z = min(1, 5/3) = 1.0
    di.stats_ = {
        "v": {"q1": 0.0, "median": 5.0, "q3": 10.0, "iqr": 10.0,
              "lower": -15.0, "upper": 25.0}
    }  # dist 25 / iqr 10 → capped 1.0 → actually 2.5 → 1.0
    dm.stats_ = {"v": {"median": 0.0, "mad": 100.0}}  # 0.6745*50/100/3 = 0.112417

    m_score = 0.6745 * 50 / 100 / 3.0
    expect = {
        "average": (1.0 + 1.0 + m_score) / 3,
        "weighted_average": 1.0 * 0.5 + 1.0 * 0.3 + m_score * 0.2,
        "max": 1.0,
        "min": m_score,
        # votes: z,i flag (≥0.9), m does not → ratio 2/3 ≥ 0.5 → mean of agreeing
        "vote": (1.0 + 1.0) / 2,
        "unanimous": 0.0,  # m below its 0.9 threshold
    }
    for strat, want in expect.items():
        ens = EnsembleAnomalyDetector.from_fitted(
            [dz, di, dm], strat,
            weights=[0.5, 0.3, 0.2] if strat == "weighted_average" else None,
        )
        got = ens.with_scores(df).collect()[0]["anomaly_score"]
        assert got == pytest.approx(want, abs=1e-12), strat


def test_predict_votes_confidence_type(planted):
    ens = EnsembleAnomalyDetector.from_fitted(_fitted(planted), "average")
    rows = {r["id"]: r for r in ens.predict(planted).collect()}
    out = rows[2004]  # most extreme outlier: all three agree
    assert out["detector_votes"] == 3
    assert out["confidence"] == pytest.approx(1.0)
    assert out["anomaly_type"] == "collective"
    bulk = rows[0]
    assert bulk["detector_votes"] == 0 and bulk["anomaly_type"] == "point"


def test_default_fit_builds_zscore_iqr_mad(planted):
    ens = EnsembleAnomalyDetector().fit(planted.select("v"))
    assert [d.kind for d in ens.detectors] == ["zscore", "iqr", "mad"]
    assert ens.weights_ == pytest.approx([1 / 3] * 3)


def test_registry_roundtrip_identical_scores(planted, tmp_path):
    ens = EnsembleAnomalyDetector(strategy="vote").fit(planted.select("v"))
    reg = ModelRegistry(root=str(tmp_path / "models"))
    v = reg.save_ensemble("ens", ens)
    back = reg.load_ensemble("ens", v)
    assert back.strategy == "vote" and back.weights_ == ens.weights_
    a = ens.with_scores(planted).select("id", "anomaly_score")
    b = back.with_scores(planted).select("id", "anomaly_score")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_scoring_plan_is_map_only(planted):
    """predict() must add no Exchange — pure column math over literals."""
    ens = EnsembleAnomalyDetector.from_fitted(_fitted(planted), "vote")
    plan = ens.predict(planted)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_weight_normalization_and_mismatch(planted):
    ens = EnsembleAnomalyDetector(weights=[2.0, 1.0, 1.0]).fit(planted.select("v"))
    assert ens.weights_ == pytest.approx([0.5, 0.25, 0.25])
    with pytest.raises(ValueError):
        EnsembleAnomalyDetector(
            detectors=_fitted(planted), weights=[1.0]
        ).fit(planted.select("v"))
