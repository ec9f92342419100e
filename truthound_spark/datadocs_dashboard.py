"""Dashboard-lite: the version store + run history as ONE static page.

Reference surfaces re-expressed: datadocs/dashboard/{app.py:44-576,
components.py:32-584, state.py:16-240} — the reference ships a Reflex
(reactive web-server) dashboard whose useful content is four views:
summary stat tiles, a runs table, per-metric trend charts, and alerts.
This module renders the SAME content as one self-contained static HTML
page over the repo's real artifacts — :class:`RunRecord` history (check
runs × quality gates), drift-score sparklines per metric, and the
``DocsVersionStore`` version table — with ZERO server, zero JS
dependencies, inline SVG micro-charts. A static page can be written by
a 1000-executor batch job's driver and dropped on any object store /
CI artifact tab, which is where data-quality dashboards actually get
read; the Reflex shell (menu toggles, theme switch, websocket state) is
deliberately out of scope (SURVEY §7: render shells, zero query
capability).

Everything here is driver-side string assembly over model-sized inputs
(runs, gates, versions — never row-scaled data).
"""

from __future__ import annotations

import html as _html
import json
import os
from dataclasses import dataclass, field
from typing import Any

from truthound_spark.datadocs_versioning import DocsVersionStore

__all__ = [
    "RunRecord",
    "run_record_from_check",
    "render_dashboard",
    "save_dashboard",
]

_CSS = (
    "body{font-family:sans-serif;margin:2em;color:#222;max-width:1100px}"
    "table{border-collapse:collapse;margin:1em 0;width:100%}"
    "td,th{border:1px solid #ccc;padding:4px 10px;text-align:left}"
    "th{background:#f4f4f4}.num{text-align:right}"
    "h1{border-bottom:2px solid #eee;padding-bottom:6px}"
    "h2{margin-top:1.6em}"
    ".meta{color:#666;font-size:90%}"
    ".tiles{display:flex;gap:14px;flex-wrap:wrap;margin:1em 0}"
    ".tile{border:1px solid #ddd;border-radius:8px;padding:10px 18px;"
    "min-width:120px;background:#fafafa}"
    ".tile .v{font-size:170%;font-weight:bold}"
    ".tile .k{color:#666;font-size:85%}"
    ".badge{display:inline-block;padding:1px 9px;border-radius:10px;"
    "font-size:85%}"
    ".ok{background:#e6ffe6;color:#135c13}"
    ".warn{background:#fff4d6;color:#7a5b00}"
    ".fail{background:#ffe6e6;color:#8a1010}"
    ".none{background:#eee;color:#666}"
)

_STATUS_CLASS = {
    "passed": "ok",
    "ok": "ok",
    "skipped": "none",
    "warning": "warn",
    "warn": "warn",
    "failed": "fail",
    "fail": "fail",
    "error": "fail",
}


def _esc(v: Any) -> str:
    return _html.escape(str(v))


def _badge(status: str) -> str:
    cls = _STATUS_CLASS.get(str(status).lower(), "none")
    return f"<span class='badge {cls}'>{_esc(status)}</span>"


@dataclass
class RunRecord:
    """One validation run's dashboard-relevant summary (the reference
    DashboardState fields, state.py:136-158, minus the UI toggles)."""

    run_id: str
    ts: str = ""
    row_count: int = 0
    success: bool = True
    issue_count: int = 0
    gates: dict[str, str] = field(default_factory=dict)  # gate_id -> status
    drift_scores: dict[str, float] = field(default_factory=dict)
    metadata: dict[str, Any] = field(default_factory=dict)

    def to_dict(self) -> dict[str, Any]:
        return {
            "run_id": self.run_id,
            "ts": self.ts,
            "row_count": self.row_count,
            "success": self.success,
            "issue_count": self.issue_count,
            "gates": dict(self.gates),
            "drift_scores": dict(self.drift_scores),
            "metadata": dict(self.metadata),
        }

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "RunRecord":
        return cls(
            run_id=str(d["run_id"]),
            ts=str(d.get("ts", "")),
            row_count=int(d.get("row_count", 0)),
            success=bool(d.get("success", True)),
            issue_count=int(d.get("issue_count", 0)),
            gates={str(k): str(v) for k, v in (d.get("gates") or {}).items()},
            drift_scores={
                str(k): float(v)
                for k, v in (d.get("drift_scores") or {}).items()
            },
            metadata=dict(d.get("metadata") or {}),
        )


def run_record_from_check(
    result: Any,
    run_id: str,
    ts: str = "",
    gate_results: list[Any] | None = None,
    drift_scores: dict[str, float] | None = None,
) -> RunRecord:
    """Adapter: ``th.check`` ValidationResult (+ optional
    QualityGateResult list + drift scores) → one dashboard row."""
    gates = {}
    for g in gate_results or []:
        gates[str(getattr(g, "gate_id", "gate"))] = str(
            getattr(g, "status", "passed")
        )
    return RunRecord(
        run_id=run_id,
        ts=ts,
        row_count=int(getattr(result, "row_count", 0) or 0),
        success=bool(getattr(result, "success", True)),
        issue_count=len(getattr(result, "issues", []) or []),
        gates=gates,
        drift_scores=dict(drift_scores or {}),
    )


def _sparkline_svg(
    values: list[float],
    width: int = 180,
    height: int = 34,
    threshold: float | None = None,
) -> str:
    """Inline-SVG sparkline (the static form of the reference's trend
    chart component, components.py metric_chart): polyline over the run
    series, dashed threshold line, end-point dot."""
    if not values:
        return ""
    lo = min(values + ([threshold] if threshold is not None else []))
    hi = max(values + ([threshold] if threshold is not None else []))
    span = (hi - lo) or 1.0
    pad = 4

    def x(i: int) -> float:
        return pad + (i / max(1, len(values) - 1)) * (width - 2 * pad)

    def y(v: float) -> float:
        return pad + (1 - (v - lo) / span) * (height - 2 * pad)

    pts = " ".join(f"{x(i):.1f},{y(v):.1f}" for i, v in enumerate(values))
    parts = []
    if threshold is not None:
        ty = y(threshold)
        parts.append(
            f"<line x1='{pad}' y1='{ty:.1f}' x2='{width - pad}' y2='{ty:.1f}'"
            " stroke='#c33' stroke-dasharray='3,3' stroke-width='1'/>"
        )
    if len(values) == 1:
        parts.append(
            f"<circle cx='{x(0):.1f}' cy='{y(values[0]):.1f}' r='2.5'"
            " fill='#36c'/>"
        )
    else:
        parts.append(
            f"<polyline points='{pts}' fill='none' stroke='#36c'"
            " stroke-width='1.5'/>"
        )
        parts.append(
            f"<circle cx='{x(len(values) - 1):.1f}'"
            f" cy='{y(values[-1]):.1f}' r='2.5' fill='#36c'/>"
        )
    return (
        f"<svg width='{width}' height='{height}' role='img'"
        f" aria-label='trend'>" + "".join(parts) + "</svg>"
    )


def _tiles(runs: list[RunRecord]) -> str:
    """Summary stat tiles (reference components.py stat_card row)."""
    total = len(runs)
    passed = sum(1 for r in runs if r.success)
    pass_rate = f"{100.0 * passed / total:.0f}%" if total else "–"
    latest = runs[-1] if runs else None
    open_fails = (
        sum(
            1
            for s in latest.gates.values()
            if _STATUS_CLASS.get(str(s).lower()) == "fail"
        )
        if latest
        else 0
    )
    tiles = [
        ("runs", str(total)),
        ("pass rate", pass_rate),
        ("latest rows", f"{latest.row_count:,}" if latest else "–"),
        ("latest issues", str(latest.issue_count) if latest else "–"),
        ("failing gates", str(open_fails)),
    ]
    cells = "".join(
        f"<div class='tile'><div class='v'>{_esc(v)}</div>"
        f"<div class='k'>{_esc(k)}</div></div>"
        for k, v in tiles
    )
    return f"<div class='tiles'>{cells}</div>"


def _runs_table(runs: list[RunRecord]) -> str:
    """Runs × gates matrix, latest first (the reference runs view)."""
    if not runs:
        return "<p class='meta'>no runs recorded</p>"
    gate_ids = sorted({g for r in runs for g in r.gates})
    head = (
        "<tr><th>run</th><th>ts</th><th class='num'>rows</th>"
        "<th class='num'>issues</th><th>status</th>"
        + "".join(f"<th>{_esc(g)}</th>" for g in gate_ids)
        + "</tr>"
    )
    body = []
    for r in reversed(runs):
        cells = "".join(
            f"<td>{_badge(r.gates[g]) if g in r.gates else ''}</td>"
            for g in gate_ids
        )
        body.append(
            f"<tr><td>{_esc(r.run_id)}</td><td class='meta'>{_esc(r.ts)}</td>"
            f"<td class='num'>{r.row_count:,}</td>"
            f"<td class='num'>{r.issue_count}</td>"
            f"<td>{_badge('passed' if r.success else 'failed')}</td>"
            f"{cells}</tr>"
        )
    return f"<table>{head}{''.join(body)}</table>"


def _drift_table(runs: list[RunRecord], threshold: float) -> str:
    """Per-metric drift sparkline over the run series (the reference
    trend-chart view reduced to its content)."""
    metrics = sorted({m for r in runs for m in r.drift_scores})
    if not metrics:
        return "<p class='meta'>no drift metrics recorded</p>"
    rows = []
    for m in metrics:
        series = [
            float(r.drift_scores[m]) for r in runs if m in r.drift_scores
        ]
        latest = series[-1]
        drifted = latest >= threshold
        rows.append(
            f"<tr><td>{_esc(m)}</td>"
            f"<td>{_sparkline_svg(series, threshold=threshold)}</td>"
            f"<td class='num'>{latest:.6g}</td>"
            f"<td class='num'>{max(series):.6g}</td>"
            f"<td>{_badge('drifted' if drifted else 'ok')}</td></tr>"
        )
    return (
        "<table><tr><th>metric</th><th>trend</th><th class='num'>latest</th>"
        "<th class='num'>max</th><th>state</th></tr>" + "".join(rows) + "</table>"
    )


def _versions_table(store: DocsVersionStore, report_id: str) -> str:
    """Version-store history with links into the stored pages + the
    v-to-v diff pages ``cmd_docs --version-store`` writes alongside."""
    versions = store.list_versions(report_id)
    if not versions:
        return "<p class='meta'>no stored versions</p>"
    rows = []
    prev = None
    for v in versions:
        diff_link = (
            f"<a href='v{prev}_v{v.version}_diff.html'>diff v{prev}→v{v.version}</a>"
            if prev is not None
            else ""
        )
        rows.append(
            f"<tr><td><a href='v{v.version}.{_esc(v.format)}'>"
            f"v{v.version}</a></td>"
            f"<td class='meta'>{_esc(v.created_at)}</td>"
            f"<td class='meta'>{_esc(v.checksum[:12])}</td>"
            f"<td>{diff_link}</td></tr>"
        )
        prev = v.version
    return (
        "<table><tr><th>version</th><th>created</th><th>checksum</th>"
        "<th>diff</th></tr>" + "".join(rows) + "</table>"
    )


def render_dashboard(
    runs: list[RunRecord],
    store: DocsVersionStore | None = None,
    report_id: str | None = None,
    title: str = "Data quality dashboard",
    drift_threshold: float = 0.05,
) -> str:
    """One static page: tiles + runs×gates + drift sparklines
    (+ version history when a store/report_id is given)."""
    parts = [
        "<!doctype html><html><head><meta charset='utf-8'>",
        f"<title>{_esc(title)}</title><style>{_CSS}</style></head><body>",
        f"<h1>{_esc(title)}</h1>",
        _tiles(runs),
        "<h2>Runs × gates</h2>",
        _runs_table(runs),
        "<h2>Drift</h2>",
        _drift_table(runs, drift_threshold),
    ]
    if store is not None and report_id is not None:
        parts.append(f"<h2>Docs versions — {_esc(report_id)}</h2>")
        parts.append(_versions_table(store, report_id))
    parts.append("</body></html>")
    return "".join(parts)


def save_dashboard(
    path: str,
    runs: list[RunRecord],
    store: DocsVersionStore | None = None,
    report_id: str | None = None,
    title: str = "Data quality dashboard",
    drift_threshold: float = 0.05,
) -> str:
    """Render + write; when a store/report_id is given and ``path`` is
    a bare filename, the page lands inside the report's version
    directory so its relative v<N> links resolve."""
    if (
        store is not None
        and report_id is not None
        and os.path.basename(path) == path
    ):
        path = os.path.join(store.report_dir(report_id), path)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    html = render_dashboard(
        runs,
        store=store,
        report_id=report_id,
        title=title,
        drift_threshold=drift_threshold,
    )
    with open(path, "w") as fh:
        fh.write(html)
    return path


def load_runs(path: str) -> list[RunRecord]:
    """Load a run-history JSON file (a list of RunRecord dicts) — the
    CLI `dashboard` input format; runs append naturally from CI."""
    with open(path) as fh:
        data = json.load(fh)
    if not isinstance(data, list):
        raise ValueError("run history must be a JSON list of run records")
    return [RunRecord.from_dict(d) for d in data]
