"""Model persistence + monitoring (ml/persistence.py, ml/monitoring.py;
reference ml/anomaly_models/*.save/load, ml/monitoring/monitor.py)."""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from truthound_spark.ml.persistence import (
    ModelRegistry,
    iforest_from_payload,
    iforest_to_payload,
)
from truthound_spark.ml.monitoring import ModelMonitor, summarize_scores
from truthound_spark.validators.iforest import fit_isolation_forest


@pytest.fixture(scope="module")
def fitted():
    rng = np.random.RandomState(0)
    x = rng.normal(size=(500, 3))
    return fit_isolation_forest(x, ["a", "b", "c"], n_trees=20, seed=7)


def test_iforest_payload_roundtrip_scores_identical(fitted):
    back = iforest_from_payload(iforest_to_payload(fitted))
    rng = np.random.RandomState(1)
    probe = rng.normal(size=(50, 3))
    assert np.allclose(fitted.scores(probe), back.scores(probe))
    assert back.columns == fitted.columns
    assert back.score_threshold == fitted.score_threshold


def test_registry_versioning(tmp_path, fitted):
    reg = ModelRegistry(root=str(tmp_path / "models"))
    v1 = reg.save_iforest("fraud", fitted, n_trees=20)
    v2 = reg.save_iforest("fraud", fitted, n_trees=20)
    assert (v1, v2) == ("v0001", "v0002")
    assert reg.list_models() == ["fraud"]
    assert reg.latest_version("fraud") == "v0002"
    loaded = reg.load_iforest("fraud")  # latest
    rng = np.random.RandomState(2)
    probe = rng.normal(size=(10, 3))
    assert np.allclose(loaded.scores(probe), fitted.scores(probe))
    _, meta = reg.load("fraud", "v0001")
    assert meta["kind"] == "isolation_forest" and meta["params"]["n_trees"] == 20
    reg.delete_version("fraud", "v0001")
    assert reg.list_versions("fraud") == ["v0002"]


def test_registry_kind_mismatch_and_missing(tmp_path):
    reg = ModelRegistry(root=str(tmp_path / "m2"))
    reg.save_centroids("km", [[0.0, 1.0], [2.0, 3.0]], k=2)
    assert reg.load_centroids("km") == [[0.0, 1.0], [2.0, 3.0]]
    with pytest.raises(ValueError):
        reg.load_iforest("km")
    with pytest.raises(FileNotFoundError):
        reg.load("nope")


def test_persisted_model_drives_validator(spark, tmp_path, fitted):
    """Save → load → inject into IsolationForestValidator (no refit):
    the anomaly-model persistence loop the reference carries."""
    from truthound_spark.api import check
    from truthound_spark.validators.anomaly import IsolationForestValidator

    reg = ModelRegistry(root=str(tmp_path / "m3"))
    reg.save_iforest("if", fitted)
    model = reg.load_iforest("if")

    rng = np.random.RandomState(3)
    normal = rng.normal(size=(300, 3))
    outliers = np.full((5, 3), 12.0)
    rows = [tuple(map(float, r)) for r in np.vstack([normal, outliers])]
    df = spark.createDataFrame(rows, "a double, b double, c double")
    v = IsolationForestValidator(["a", "b", "c"], model=model)
    res = check(df, validators=[v])
    assert not res.success
    assert res.issues[0].count >= 5  # planted outliers flagged


def test_monitor_healthy_then_drift_alerts(spark, tmp_path):
    rng = np.random.RandomState(4)
    ref = spark.createDataFrame(
        [(float(v),) for v in rng.normal(0.2, 0.05, 2000)], "score double"
    )
    mon = ModelMonitor(root=str(tmp_path / "mon"))
    mon.register_model("m1", ref, threshold=0.5)

    clean = spark.createDataFrame(
        [(float(v),) for v in rng.normal(0.2, 0.05, 1000)], "score double"
    )
    s1 = mon.record_scores("m1", clean)
    assert mon.health("m1") == "healthy"
    assert s1.anomaly_rate == pytest.approx(0.0, abs=0.01)

    drifted = spark.createDataFrame(
        [(float(v),) for v in rng.normal(0.75, 0.05, 1000)], "score double"
    )
    mon.record_scores("m1", drifted)
    assert mon.health("m1") == "critical"
    rules = {a.rule for a in mon.alerts("m1")}
    assert "score_psi" in rules and "anomaly_rate" in rules

    metrics = mon.get_metrics("m1")
    assert len(metrics["batches"]) == 2
    # persisted summaries recoverable
    assert len(mon.load_history("m1")) == 2


def test_monitor_psi_matches_detector_without_reference_rescan(spark, tmp_path):
    """ADVICE r7: the PSI alert value must equal drift.detectors.psi on
    the same frames, computed from the histogram precomputed at
    register_model — record_scores never re-aggregates the reference."""
    import random

    from truthound_spark.drift.detectors import psi as psi_detector

    rng = random.Random(13)
    ref = spark.createDataFrame(
        [(float(rng.gauss(0.2, 0.05)),) for _ in range(1500)], "score double"
    )
    batch = spark.createDataFrame(
        [(float(rng.gauss(0.45, 0.05)),) for _ in range(600)], "score double"
    )
    mon = ModelMonitor(root=str(tmp_path / "mon3"))
    mon.register_model("m", ref)
    assert mon._ref_hist["m"] is not None  # histogram captured at register
    mon.record_scores("m", batch)
    psi_alerts = [a for a in mon.alerts("m") if a.rule == "score_psi"]
    assert psi_alerts
    expected = psi_detector(ref.select("score"), batch.select("score"), "score")
    assert psi_alerts[0].value == pytest.approx(round(expected.statistic, 6))


def test_summarize_scores_one_aggregate(spark):
    df = spark.range(1000).select((F.col("id") / 1000.0).alias("score"))
    s = summarize_scores(df, "score", threshold=0.9)
    assert s.n == 1000
    assert s.mean == pytest.approx(0.4995, abs=0.001)
    assert s.q50 == pytest.approx(0.5, abs=0.02)
    assert s.anomaly_rate == pytest.approx(0.1, abs=0.01)


def test_registry_version_after_delete_no_collision(tmp_path, fitted):
    """Review finding: len+1 versioning collided after delete_version."""
    reg = ModelRegistry(root=str(tmp_path / "m4"))
    reg.save_iforest("m", fitted)
    reg.save_iforest("m", fitted)
    reg.delete_version("m", "v0001")
    v3 = reg.save_iforest("m", fitted)  # must NOT collide with v0002
    assert v3 == "v0003"
    assert reg.list_versions("m") == ["v0002", "v0003"]


def test_monitor_health_ages_out_by_batch_not_wallclock(spark, tmp_path):
    """Review finding: two batches within 1s — the drifted batch's
    alerts must not bleed into the clean batch's health."""
    import random

    rng = random.Random(8)
    ref = spark.createDataFrame(
        [(float(rng.gauss(0.2, 0.05)),) for _ in range(1500)], "score double"
    )
    mon = ModelMonitor(root=str(tmp_path / "mon2"))
    mon.register_model("m", ref, threshold=0.5)
    drifted = spark.createDataFrame(
        [(float(rng.gauss(0.8, 0.05)),) for _ in range(500)], "score double"
    )
    clean = spark.createDataFrame(
        [(float(rng.gauss(0.2, 0.05)),) for _ in range(500)], "score double"
    )
    mon.record_scores("m", drifted)
    assert mon.health("m") == "critical"
    mon.record_scores("m", clean)  # recorded well under 1s later
    assert mon.health("m") == "healthy"


def test_monitor_alerts_route_through_checkpoint_actions(spark, tmp_path):
    """VERDICT r7 #9: ModelMonitor alerts fire the engine's checkpoint
    actions (Slack/webhook payload builders), not bare dicts — drifted
    batch posts, clean batch is skipped by only_on_failure."""
    import json
    import random

    from truthound_spark.checkpoint import SlackAction, WebhookAction
    from truthound_spark.ml.monitoring import alerts_to_result

    sent = []
    hook = WebhookAction("http://x/hook", sender=lambda url, body: sent.append((url, json.loads(body))))
    slack = SlackAction("http://x/slack", sender=lambda url, body: sent.append((url, json.loads(body))))

    rng = random.Random(31)
    ref = spark.createDataFrame(
        [(float(rng.gauss(0.2, 0.05)),) for _ in range(1500)], "score double"
    )
    mon = ModelMonitor(root=str(tmp_path / "mon4"), actions=[hook, slack])
    mon.register_model("m", ref, threshold=0.5)

    clean = spark.createDataFrame(
        [(float(rng.gauss(0.2, 0.05)),) for _ in range(500)], "score double"
    )
    mon.record_scores("m", clean)
    assert sent == []  # success result → only_on_failure skips

    drifted = spark.createDataFrame(
        [(float(rng.gauss(0.8, 0.05)),) for _ in range(500)], "score double"
    )
    mon.record_scores("m", drifted)
    urls = [u for u, _ in sent]
    assert urls == ["http://x/hook", "http://x/slack"]
    generic = sent[0][1]
    assert generic["checkpoint"] == "model:m" and not generic["success"]
    assert generic["issues"] >= 2  # psi + anomaly_rate at least
    assert "FAIL" in sent[1][1]["text"]  # Slack Block Kit summary

    # payload contract of the adapter itself
    alerts = [a for a in mon.alerts("m") if a.batch_idx == 1]
    res = alerts_to_result("m", alerts, mon._history["m"][-1])
    assert res.source == "model:m" and not res.success
    by_rule = {i.issue_type: i for i in res.issues}
    assert str(by_rule["score_psi"].severity) == "critical"
    assert by_rule["score_psi"].actual == alerts[0].value


def test_prometheus_exposition_contract(spark, tmp_path):
    """ml/prometheus.py (reference ml/monitoring/stores/prometheus.py):
    exposition text pinned — HELP/TYPE headers, labeled samples, health
    codes, counters; atomic textfile write."""
    import random
    import re

    from truthound_spark.ml.prometheus import prometheus_metrics, write_textfile

    rng = random.Random(41)
    ref = spark.createDataFrame(
        [(float(rng.gauss(0.2, 0.05)),) for _ in range(1500)], "score double"
    )
    mon = ModelMonitor(root=str(tmp_path / "mon5"))
    mon.register_model("fraud_v1", ref, threshold=0.5)
    mon.record_scores(
        "fraud_v1",
        spark.createDataFrame(
            [(float(rng.gauss(0.8, 0.05)),) for _ in range(400)], "score double"
        ),
    )

    text = prometheus_metrics(mon)
    assert "# HELP truthound_model_score_mean Mean of the last scored batch" in text
    assert "# TYPE truthound_model_score_mean gauge" in text
    assert "# TYPE truthound_model_batches_total counter" in text
    assert re.search(
        r'truthound_model_score_mean\{model_id="fraud_v1"\} 0\.\d+', text
    )
    assert 'truthound_model_health{model_id="fraud_v1"} 2' in text  # critical
    assert 'truthound_model_batches_total{model_id="fraud_v1"} 1' in text
    assert re.search(
        r'truthound_model_alerts_total\{level="critical",model_id="fraud_v1"\} \d+',
        text,
    )
    psi = re.search(
        r'truthound_model_score_psi\{model_id="fraud_v1"\} ([\d.]+)', text
    )
    assert psi and float(psi.group(1)) > 0.25
    # every non-comment line is a valid exposition sample
    for line in text.strip().splitlines():
        if line.startswith("#"):
            continue
        assert re.fullmatch(r'[a-zA-Z_:][a-zA-Z0-9_:]*\{[^}]*\} -?[\d.e+-]+', line), line

    out = str(tmp_path / "model.prom")
    written = write_textfile(mon, out)
    assert open(out).read() == written == text
    assert not os.path.exists(out + ".tmp")  # atomic rename cleaned up


def test_configurable_alert_rules(spark, tmp_path):
    """reference ml/monitoring/alerting/rules.py Threshold/Anomaly/Trend
    rules evaluated over the batch-summary series — stateless, replay-
    deterministic, batch-indexed for_batches."""
    import random

    from truthound_spark.ml.monitoring import AnomalyRule, ThresholdRule, TrendRule

    rng = random.Random(61)

    def batch(mu, n=400):
        return spark.createDataFrame(
            [(float(rng.gauss(mu, 0.02)),) for _ in range(n)], "score double"
        )

    mon = ModelMonitor(
        root=str(tmp_path / "mon6"),
        psi_warn=1e9,  # silence built-ins; this test drives custom rules
        psi_critical=1e9,
        mean_shift_sigmas=1e9,
        rules=[
            ThresholdRule("mean_floor", "mean", 0.3, "lt", for_batches=2,
                          level="critical"),
            TrendRule("mean_rising", "mean", "increasing", window_size=4,
                      min_change_percent=20.0),
        ],
    )
    mon.add_rule(AnomalyRule("mean_outlier", "mean", z_threshold=3.0, min_history=5))
    mon.register_model("m", batch(0.5, 1500))

    # rising means: 0.4, 0.5, 0.6, 0.72 → second-half mean ≥ 20% over first
    for mu in (0.4, 0.5, 0.6, 0.72):
        mon.record_scores("m", batch(mu))
    rules_fired = {a.rule for a in mon.alerts("m")}
    assert "mean_rising" in rules_fired
    assert "mean_floor" not in rules_fired  # single 0.4 batch, for_batches=2

    # two consecutive sub-0.3 batches → threshold rule fires critical
    mon.record_scores("m", batch(0.2))
    assert "mean_floor" not in {a.rule for a in mon.alerts("m")}
    mon.record_scores("m", batch(0.2))
    floor = [a for a in mon.alerts("m") if a.rule == "mean_floor"]
    assert floor and floor[0].level == "critical"
    assert mon.health("m") == "critical"

    # anomaly rule: a wild outlier vs the rolling window
    mon2 = ModelMonitor(
        psi_warn=1e9, psi_critical=1e9, mean_shift_sigmas=1e9,
        rules=[AnomalyRule("mean_outlier", "mean", z_threshold=3.0, min_history=5)],
    )
    mon2.register_model("m", batch(0.5, 1000))
    # the rolling window INCLUDES the current value (reference rules.py:
    # 234-261), which inflates the window std — enough clean batches are
    # needed before a 10x spike clears z=3
    for _ in range(12):
        mon2.record_scores("m", batch(0.5))
    assert not [a for a in mon2.alerts("m") if a.rule == "mean_outlier"]
    mon2.record_scores("m", batch(5.0))
    assert [a for a in mon2.alerts("m") if a.rule == "mean_outlier"]


def test_monitor_feature_drift_collector(spark, tmp_path):
    """reference ml/monitoring/collectors/drift.py role: register a
    feature reference, score feature batches, per-feature alerts ride
    the same health path."""
    import random

    rng = random.Random(71)

    def feats(mu_x):
        # fixed-support grid: the range-exceeded term must not trip on
        # sampling-tail differences in the clean batch
        rows = [
            (mu_x + (i % 100) / 50.0 - 1.0, (i % 80) / 40.0 - 1.0)
            for i in range(800)
        ]
        rng.shuffle(rows)
        return spark.createDataFrame(rows, "x double, y double")

    ref_scores = spark.createDataFrame(
        [(float(rng.gauss(0.5, 0.05)),) for _ in range(1000)], "score double"
    )
    mon = ModelMonitor(root=str(tmp_path / "mon7"))
    mon.register_model(
        "m", ref_scores, feature_reference=feats(0.0), feature_columns=["x", "y"]
    )
    clean = mon.record_features("m", feats(0.0))
    assert not clean.is_drifted
    assert not [a for a in mon.alerts("m") if a.rule.startswith("feature_drift")]

    shifted = mon.record_features("m", feats(5.0))  # x shifts 5 sigma
    assert shifted.is_drifted
    fd = [a for a in mon.alerts("m") if a.rule.startswith("feature_drift")]
    assert {a.rule for a in fd} == {"feature_drift:x"}
    with pytest.raises(KeyError):
        ModelMonitor().record_features("m", feats(0.0))
