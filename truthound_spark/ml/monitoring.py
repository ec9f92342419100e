"""Model monitoring: score-distribution tracking + drift alerting.

Reference: ml/monitoring/{monitor.py,collectors,stores,alerting} —
ModelMonitor.register_model / record_prediction / set_reference_data /
get_metrics with health scoring. Re-expressed synchronously (the
reference is asyncio around the same bookkeeping) and Spark-first: a
score batch is summarized by ONE distributed aggregate (count/mean/std/
approx quantiles) and drift vs the registered reference is the engine's
own PSI detector over DataFrames — the monitor never collects scores,
only O(1) summaries per batch.
"""

from __future__ import annotations

import json
import math
import os
import time
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HEALTH_LEVELS = ("healthy", "degraded", "critical")


@dataclass
class ScoreSummary:
    """O(1) summary of one scored batch."""

    ts: float
    n: int
    mean: float
    std: float
    q05: float
    q50: float
    q95: float
    anomaly_rate: float | None = None

    def to_dict(self) -> dict[str, Any]:
        return {
            "ts": self.ts,
            "n": self.n,
            "mean": self.mean,
            "std": self.std,
            "q05": self.q05,
            "q50": self.q50,
            "q95": self.q95,
            "anomaly_rate": self.anomaly_rate,
        }


def summarize_scores(
    scores: DataFrame, column: str = "score", threshold: float | None = None
) -> ScoreSummary:
    """ONE aggregate over the scored frame (approx quantile sketch — the
    100 TB path; scores never reach the driver)."""
    aggs = [
        F.count(column).alias("n"),
        F.mean(column).alias("mean"),
        F.stddev(column).alias("std"),
        F.expr(f"percentile_approx({column}, array(0.05, 0.5, 0.95))").alias("q"),
    ]
    if threshold is not None:
        aggs.append(
            F.avg((F.col(column) > threshold).cast("double")).alias("rate")
        )
    r = scores.agg(*aggs).collect()[0]
    q = list(r["q"] or [0.0, 0.0, 0.0])
    return ScoreSummary(
        ts=time.time(),
        n=int(r["n"]),
        mean=float(r["mean"] or 0.0),
        std=float(r["std"] or 0.0),
        q05=float(q[0]),
        q50=float(q[1]),
        q95=float(q[2]),
        anomaly_rate=float(r["rate"]) if threshold is not None else None,
    )


@dataclass
class Alert:
    model_id: str
    rule: str
    level: str
    value: float
    threshold: float
    batch_idx: int = -1
    ts: float = field(default_factory=time.time)

    def to_dict(self) -> dict[str, Any]:
        return {
            "model_id": self.model_id,
            "rule": self.rule,
            "level": self.level,
            "value": self.value,
            "threshold": self.threshold,
            "batch_idx": self.batch_idx,
            "ts": self.ts,
        }


class AlertRule:
    """Configurable alert rule over the batch-summary series (reference
    ml/monitoring/alerting/rules.py:25 AlertRule). Metrics are the
    ScoreSummary fields: n / mean / std / q05 / q50 / q95 /
    anomaly_rate. Rules are STATELESS — they read the monitor's own
    history, so a reloaded monitor evaluates identically."""

    def __init__(self, name: str, metric: str, level: str = "warning") -> None:
        self.name = name
        self.metric = metric
        self.level = level

    def _value(self, s: ScoreSummary) -> float | None:
        v = getattr(s, self.metric, None)
        return float(v) if v is not None else None

    def evaluate(
        self, history: list[ScoreSummary]
    ) -> tuple[bool, float, float]:
        """→ (fired, observed value, threshold)."""
        raise NotImplementedError


class ThresholdRule(AlertRule):
    """metric ⋛ threshold, optionally sustained for N consecutive
    batches (reference rules.py:96 ThresholdRule; its wall-clock
    for_duration becomes batch-indexed ``for_batches`` — deterministic
    under replay, consistent with the monitor's batch-indexed health)."""

    _OPS = {
        "gt": lambda a, b: a > b,
        "lt": lambda a, b: a < b,
        "gte": lambda a, b: a >= b,
        "lte": lambda a, b: a <= b,
        "eq": lambda a, b: a == b,
    }

    def __init__(
        self,
        name: str,
        metric: str,
        threshold: float,
        comparison: str = "gt",
        for_batches: int = 1,
        level: str = "warning",
    ) -> None:
        super().__init__(name, metric, level)
        if comparison not in self._OPS:
            raise ValueError(f"comparison must be one of {sorted(self._OPS)}")
        self.threshold = threshold
        self.comparison = comparison
        self.for_batches = max(1, for_batches)

    def evaluate(self, history: list[ScoreSummary]) -> tuple[bool, float, float]:
        if not history:
            return False, 0.0, self.threshold
        value = self._value(history[-1])
        if value is None:
            return False, 0.0, self.threshold
        op = self._OPS[self.comparison]
        tail = history[-self.for_batches :]
        fired = len(tail) >= self.for_batches and all(
            (v := self._value(s)) is not None and op(v, self.threshold) for s in tail
        )
        return fired, value, self.threshold


class AnomalyRule(AlertRule):
    """Latest batch's metric is a z-score outlier vs its own rolling
    window (reference rules.py:206; window includes the current value,
    min 10 observations)."""

    def __init__(
        self,
        name: str,
        metric: str,
        z_threshold: float = 3.0,
        window_size: int = 100,
        min_history: int = 10,
        level: str = "warning",
    ) -> None:
        super().__init__(name, metric, level)
        self.z_threshold = z_threshold
        self.window_size = window_size
        self.min_history = min_history

    def evaluate(self, history: list[ScoreSummary]) -> tuple[bool, float, float]:
        values = [
            v for s in history[-self.window_size :] if (v := self._value(s)) is not None
        ]
        if not values or len(values) < self.min_history:
            return False, values[-1] if values else 0.0, self.z_threshold
        cur = values[-1]
        mean = sum(values) / len(values)
        var = sum((x - mean) ** 2 for x in values) / len(values)
        std = var**0.5 if var > 0 else 1.0
        z = abs(cur - mean) / std if std > 0 else 0.0
        return z > self.z_threshold, round(z, 6), self.z_threshold


class TrendRule(AlertRule):
    """Sustained increase/decrease: second-half mean vs first-half mean
    over the last ``window_size`` batches (reference rules.py:307)."""

    def __init__(
        self,
        name: str,
        metric: str,
        trend: str = "increasing",
        window_size: int = 10,
        min_change_percent: float = 10.0,
        level: str = "warning",
    ) -> None:
        super().__init__(name, metric, level)
        if trend not in ("increasing", "decreasing"):
            raise ValueError("trend must be increasing | decreasing")
        self.trend = trend
        self.window_size = window_size
        self.min_change_percent = min_change_percent

    def evaluate(self, history: list[ScoreSummary]) -> tuple[bool, float, float]:
        values = [
            v for s in history[-self.window_size :] if (v := self._value(s)) is not None
        ]
        if len(values) < self.window_size:
            return False, 0.0, self.min_change_percent
        first = values[: len(values) // 2]
        second = values[len(values) // 2 :]
        fm = sum(first) / len(first)
        sm = sum(second) / len(second)
        if fm == 0:
            return False, 0.0, self.min_change_percent
        change = (sm - fm) / abs(fm) * 100
        fired = (
            change >= self.min_change_percent
            if self.trend == "increasing"
            else change <= -self.min_change_percent
        )
        return fired, round(change, 6), self.min_change_percent


def alerts_to_result(model_id: str, alerts: list[Alert], summary: ScoreSummary):
    """Render one batch's alerts as a ValidationRunResult so the
    CHECKPOINT ACTIONS (checkpoint.py Slack/Teams/PagerDuty/webhook/email
    payload builders — reference ml/monitoring/alerting routes through
    the same notifier fleet) fire for model alerts with zero new payload
    code: warning → HIGH, critical → CRITICAL; a clean batch is a
    success-result, which only_on_failure actions skip."""
    from truthound_spark.core.results import ValidationIssue, ValidationRunResult
    from truthound_spark.types import Severity

    issues = [
        ValidationIssue(
            column="score",
            issue_type=a.rule,
            count=1,
            severity=Severity.CRITICAL if a.level == "critical" else Severity.HIGH,
            validator_name="model_monitor",
            expected=a.threshold,
            actual=a.value,
            details=f"model {model_id}: {a.rule} {a.value} vs {a.threshold}",
        )
        for a in alerts
    ]
    return ValidationRunResult(
        issues=issues,
        source=f"model:{model_id}",
        row_count=summary.n,
        column_count=1,
        checks_run=3,  # psi / mean-shift / anomaly-rate rules
        metadata={"model_id": model_id, "batch": summary.to_dict()},
    )


class ModelMonitor:
    """Track per-model score batches; alert on drift/shift
    (reference monitor.py:60-430). ``actions`` — the checkpoint-action
    callables (checkpoint.py) — fire once per recorded batch with that
    batch's alerts rendered as a ValidationRunResult (reference
    ml/monitoring/alerting notifiers, reusing the engine's own payload
    builders instead of bare dicts)."""

    def __init__(
        self,
        root: str | None = None,
        psi_warn: float = 0.1,
        psi_critical: float = 0.25,
        mean_shift_sigmas: float = 3.0,
        anomaly_rate_max: float = 0.05,
        actions: list[Any] | None = None,
        rules: list["AlertRule"] | None = None,
    ) -> None:
        self.root = root
        if root:
            os.makedirs(root, exist_ok=True)
        self.psi_warn = psi_warn
        self.psi_critical = psi_critical
        self.mean_shift_sigmas = mean_shift_sigmas
        self.anomaly_rate_max = anomaly_rate_max
        self.actions = list(actions or [])
        self.rules: list[AlertRule] = list(rules or [])
        self._reference: dict[str, DataFrame] = {}
        self._feature_detector: dict[str, Any] = {}
        self._ref_hist: dict[str, tuple[float, float, list[float]] | None] = {}
        self._ref_summary: dict[str, ScoreSummary] = {}
        self._history: dict[str, list[ScoreSummary]] = {}
        self._alerts: dict[str, list[Alert]] = {}
        self._meta: dict[str, dict[str, Any]] = {}

    # -- registration ---------------------------------------------------------
    def register_model(
        self,
        model_id: str,
        reference_scores: DataFrame,
        column: str = "score",
        threshold: float | None = None,
        feature_reference: DataFrame | None = None,
        feature_columns: list[str] | None = None,
        feature_drift_threshold: float = 0.3,
        **metadata: Any,
    ) -> None:
        """Reference scores define 'normal' (reference
        set_reference_data :257). The reference frame is scanned ONCE
        here — its O(1) summary and its 10-bin PSI histogram are what
        every later record_scores() batch compares against, so per-batch
        cost is one aggregate over the BATCH only, never a re-scan of
        the (potentially huge) reference.

        ``feature_reference`` additionally fits a FeatureDriftDetector
        (the reference ml/monitoring/collectors/drift.py role): every
        ``record_features`` batch is scored against those O(columns)
        profiles and per-feature drift raises ``feature_drift:<col>``
        alerts through the same action/health path."""
        from truthound_spark.drift.detectors import _freqs, _hist_counts, _numeric_range

        ref = reference_scores.select(F.col(column).alias("score"))
        self._reference[model_id] = ref
        self._ref_summary[model_id] = summarize_scores(ref, "score", threshold)
        rng = _numeric_range(ref, "score")
        self._ref_hist[model_id] = (
            (rng[0], rng[1], _freqs(_hist_counts(ref, "score", rng[0], rng[1], 10)))
            if rng is not None
            else None
        )
        self._history[model_id] = []
        self._alerts[model_id] = []
        self._meta[model_id] = {"column": column, "threshold": threshold, **metadata}
        if feature_reference is not None:
            from truthound_spark.ml.feature_drift import FeatureDriftDetector

            self._feature_detector[model_id] = FeatureDriftDetector(
                columns=feature_columns, threshold=feature_drift_threshold
            ).fit(feature_reference)

    def record_features(self, model_id: str, batch: DataFrame) -> Any:
        """Score one feature batch against the registered feature
        profiles (reference DriftCollector.collect) — per-feature alerts
        land on the model's CURRENT batch index so health() sees them."""
        det = self._feature_detector.get(model_id)
        if det is None:
            raise KeyError(f"model {model_id!r} has no feature reference")
        res = det.detect(batch)
        batch_idx = len(self._history.get(model_id, [])) - 1
        for fs in res.feature_scores:
            if fs.is_drifted:
                self._alerts[model_id].append(
                    Alert(
                        model_id,
                        f"feature_drift:{fs.feature}",
                        "warning",
                        round(fs.drift_score, 6),
                        det.threshold,
                        batch_idx,
                    )
                )
        return res

    def unregister_model(self, model_id: str) -> None:
        for d in (
            self._reference,
            self._feature_detector,
            self._ref_hist,
            self._ref_summary,
            self._history,
            self._alerts,
            self._meta,
        ):
            d.pop(model_id, None)

    def models(self) -> list[str]:
        return sorted(self._reference)

    # -- recording --------------------------------------------------------------
    def record_scores(self, model_id: str, scores: DataFrame, column: str | None = None) -> ScoreSummary:
        """Summarize a batch, evaluate alert rules, persist the summary."""
        if model_id not in self._reference:
            raise KeyError(f"model {model_id!r} not registered")
        meta = self._meta[model_id]
        col = column or meta["column"]
        batch = scores.select(F.col(col).alias("score"))
        summary = summarize_scores(batch, "score", meta["threshold"])
        self._history[model_id].append(summary)
        batch_idx = len(self._history[model_id]) - 1
        self._evaluate(model_id, batch, summary, batch_idx)
        if self.actions:
            batch_alerts = [
                a for a in self._alerts[model_id] if a.batch_idx == batch_idx
            ]
            result = alerts_to_result(model_id, batch_alerts, summary)
            for action in self.actions:
                action(f"model:{model_id}", result)
        if self.root:
            with open(self._history_path(model_id), "a") as f:
                f.write(json.dumps(summary.to_dict()) + "\n")
        return summary

    def _history_path(self, model_id: str) -> str:
        # model ids like "fraud/v1" are legal labels but not filenames
        safe = model_id.replace(os.sep, "_").replace("/", "_")
        return os.path.join(self.root, f"{safe}.jsonl")

    # -- rules ------------------------------------------------------------------
    def _evaluate(
        self, model_id: str, batch: DataFrame, summary: ScoreSummary, batch_idx: int
    ) -> None:
        from truthound_spark.drift.detectors import EPS, _freqs, _hist_counts

        alerts = self._alerts[model_id]
        ref_sum = self._ref_summary[model_id]

        # score-distribution PSI vs the reference histogram precomputed at
        # register time (same edges/ε-smoothing as drift.detectors.psi, so
        # the statistic is bit-identical to re-running the detector — minus
        # the reference re-scan)
        hist = self._ref_hist.get(model_id)
        if hist is not None:
            lo, hi, p = hist
            q = _freqs(_hist_counts(batch, "score", lo, hi, len(p)))
            stat = sum(
                (pi - qi) * math.log((pi + EPS) / (qi + EPS)) for pi, qi in zip(p, q)
            )
            if stat > self.psi_critical:
                alerts.append(
                    Alert(model_id, "score_psi", "critical", round(stat, 6),
                          self.psi_critical, batch_idx)
                )
            elif stat > self.psi_warn:
                alerts.append(
                    Alert(model_id, "score_psi", "warning", round(stat, 6),
                          self.psi_warn, batch_idx)
                )

        # mean shift in reference-σ units
        if ref_sum.std > 0:
            shift = abs(summary.mean - ref_sum.mean) / ref_sum.std
            if shift > self.mean_shift_sigmas:
                alerts.append(
                    Alert(model_id, "mean_shift", "warning", round(shift, 4),
                          self.mean_shift_sigmas, batch_idx)
                )

        # anomaly-rate breach
        if summary.anomaly_rate is not None and summary.anomaly_rate > self.anomaly_rate_max:
            alerts.append(
                Alert(
                    model_id,
                    "anomaly_rate",
                    "critical",
                    round(summary.anomaly_rate, 6),
                    self.anomaly_rate_max,
                    batch_idx,
                )
            )

        # user-configured rules over the batch-summary series (reference
        # ml/monitoring/alerting/rules.py — Threshold/Anomaly/Trend)
        history = self._history[model_id]
        for rule in self.rules:
            fired, value, threshold = rule.evaluate(history)
            if fired:
                alerts.append(
                    Alert(model_id, rule.name, rule.level, value, threshold, batch_idx)
                )

    def add_rule(self, rule: "AlertRule") -> None:
        self.rules.append(rule)

    # -- status ------------------------------------------------------------------
    def alerts(self, model_id: str) -> list[Alert]:
        return list(self._alerts.get(model_id, []))

    def health(self, model_id: str) -> str:
        """reference _calculate_health_score (:367): critical alert →
        critical; any alert → degraded; else healthy. Only alerts from
        the LAST recorded batch count — indexed by batch, not wall
        clock, so two micro-batches landing within the same second
        (availableNow drains) still age out the earlier batch's alerts
        deterministically."""
        last_idx = len(self._history.get(model_id, [])) - 1
        recent = [
            a for a in self._alerts.get(model_id, []) if a.batch_idx == last_idx
        ]
        if any(a.level == "critical" for a in recent):
            return "critical"
        if recent:
            return "degraded"
        return "healthy"

    def get_metrics(self, model_id: str) -> dict[str, Any]:
        hist = self._history.get(model_id, [])
        return {
            "model_id": model_id,
            "reference": self._ref_summary[model_id].to_dict()
            if model_id in self._ref_summary
            else None,
            "batches": [s.to_dict() for s in hist],
            "alerts": [a.to_dict() for a in self._alerts.get(model_id, [])],
            "health": self.health(model_id),
        }

    def load_history(self, model_id: str) -> list[dict[str, Any]]:
        """Re-read persisted summaries (restart recovery)."""
        if not self.root:
            return []
        path = self._history_path(model_id)
        if not os.path.exists(path):
            return []
        with open(path) as f:
            return [json.loads(line) for line in f if line.strip()]
