"""Prometheus exposition for model monitoring.

Reference: ml/monitoring/stores/prometheus.py:38 ``PrometheusMetricStore``
— per-model gauges/counters in a Prometheus registry plus an HTTP scrape
endpoint (it hard-requires ``prometheus_client``, :62-76). This sandbox
has no prometheus_client and no scrape network, so the equivalent
surface is the OPEN TEXT EXPOSITION FORMAT itself
(https://prometheus.io/docs/instrumenting/exposition_formats/) rendered
directly from :class:`~truthound_spark.ml.monitoring.ModelMonitor`
state — O(models × metrics) strings, no dependency — plus the standard
node_exporter *textfile collector* integration (atomic write to a
``.prom`` file), which is how file-based producers feed Prometheus in
production. Every number comes from the monitor's O(1) batch summaries;
nothing data-sized is rendered.

Metric set (reference :84-160 tracks serving gauges — latency /
throughput / accuracy; this monitor tracks score-distribution health,
so the gauges are its summaries):

  {prefix}score_mean/std/q05/q50/q95{model_id=...}   last batch summary
  {prefix}anomaly_rate{model_id=...}                 last batch rate
  {prefix}score_psi{model_id=...}                    latest PSI alert value (0 when quiet)
  {prefix}health{model_id=...}                       0 healthy / 1 degraded / 2 critical
  {prefix}batches_total{model_id=...}                counter
  {prefix}alerts_total{model_id=..., level=...}      counter per level
"""

from __future__ import annotations

import os
from typing import Any

HEALTH_CODE = {"healthy": 0, "degraded": 1, "critical": 2}


def _escape_label(v: str) -> str:
    return v.replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n")


def _fmt(v: float) -> str:
    # Prometheus floats: repr-style, no exponent games needed here
    return repr(float(v)) if v != int(v) else str(int(v))


def prometheus_metrics(monitor: Any, prefix: str = "truthound_model_") -> str:
    """Render the monitor's current state in exposition format."""
    gauges: dict[str, tuple[str, list[tuple[dict[str, str], float]]]] = {}

    def add(name: str, help_: str, labels: dict[str, str], value: float) -> None:
        gauges.setdefault(name, (help_, []))[1].append((labels, value))

    for model_id in monitor.models():
        hist = monitor._history.get(model_id, [])
        alerts = monitor.alerts(model_id)
        lab = {"model_id": model_id}
        if hist:
            s = hist[-1]
            add("score_mean", "Mean of the last scored batch", lab, s.mean)
            add("score_std", "Std of the last scored batch", lab, s.std)
            add("score_q05", "5th percentile of the last scored batch", lab, s.q05)
            add("score_q50", "Median of the last scored batch", lab, s.q50)
            add("score_q95", "95th percentile of the last scored batch", lab, s.q95)
            if s.anomaly_rate is not None:
                add(
                    "anomaly_rate",
                    "Share of last batch above the anomaly threshold",
                    lab,
                    s.anomaly_rate,
                )
        last_idx = len(hist) - 1
        psi_alerts = [
            a for a in alerts if a.rule == "score_psi" and a.batch_idx == last_idx
        ]
        add(
            "score_psi",
            "PSI of the last batch vs the registered reference (0 when under the warn gate)",
            lab,
            psi_alerts[-1].value if psi_alerts else 0.0,
        )
        add(
            "health",
            "Model health: 0 healthy, 1 degraded, 2 critical",
            lab,
            HEALTH_CODE[monitor.health(model_id)],
        )
        add("batches_total", "Scored batches recorded", lab, len(hist))
        for level in ("warning", "critical"):
            add(
                "alerts_total",
                "Alerts raised, by level",
                {"model_id": model_id, "level": level},
                sum(1 for a in alerts if a.level == level),
            )

    lines: list[str] = []
    counters = {"batches_total", "alerts_total"}
    for name, (help_, samples) in gauges.items():
        full = f"{prefix}{name}"
        lines.append(f"# HELP {full} {help_}")
        lines.append(f"# TYPE {full} {'counter' if name in counters else 'gauge'}")
        for labels, value in samples:
            label_str = ",".join(
                f'{k}="{_escape_label(str(v))}"' for k, v in sorted(labels.items())
            )
            lines.append(f"{full}{{{label_str}}} {_fmt(value)}")
    return "\n".join(lines) + "\n"


def write_textfile(
    monitor: Any, path: str, prefix: str = "truthound_model_"
) -> str:
    """Atomic write for the node_exporter textfile collector (write to
    ``path + '.tmp'`` then rename — the collector must never scrape a
    half-written file)."""
    text = prometheus_metrics(monitor, prefix=prefix)
    tmp = f"{path}.tmp"
    with open(tmp, "w") as f:
        f.write(text)
    os.replace(tmp, path)
    return text
