"""Section-based data-docs reports (reference: src/truthound/datadocs/ —
base.py ReportSpec/SectionSpec/ThemeConfig, sections.py Overview/Columns/
Quality/Distribution/Correlations/Recommendations/Alerts renderers,
exporters/{html_reporter,markdown,json_exporter}.py, versioning/diff.py).

Spark-first split: ALL data reduction happens in the profiler's fused
aggregations / the validation run (one pass over the cluster); everything
in this module renders driver-side over the resulting kilobyte-sized
summaries. At 100 TB the report costs exactly one profile pass — no
renderer ever touches a DataFrame.

Charts are dependency-free inline SVG (no JS chart library), so the
artifacts are self-contained files publishable from any object store.
"""

from __future__ import annotations

import html as _html
import json
from dataclasses import dataclass, field
from typing import Any

from truthound_spark.profiler.table_profiler import ColumnProfile, TableProfile

# ---------------------------------------------------------------------------
# themes (reference base.py:96-209 ThemeConfig.to_css_vars)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ThemeConfig:
    name: str = "default"
    bg: str = "#ffffff"
    fg: str = "#1a202c"
    muted: str = "#64748b"
    accent: str = "#2563eb"
    good: str = "#16a34a"
    warn: str = "#d97706"
    bad: str = "#dc2626"
    surface: str = "#f8fafc"
    border: str = "#e2e8f0"
    font: str = "system-ui, sans-serif"

    def to_css_vars(self) -> str:
        return (
            f":root{{--bg:{self.bg};--fg:{self.fg};--muted:{self.muted};"
            f"--accent:{self.accent};--good:{self.good};--warn:{self.warn};"
            f"--bad:{self.bad};--surface:{self.surface};--border:{self.border};"
            f"--font:{self.font}}}"
        )


DEFAULT_THEME = ThemeConfig()
DARK_THEME = ThemeConfig(
    name="dark",
    bg="#0f172a",
    fg="#e2e8f0",
    muted="#94a3b8",
    accent="#60a5fa",
    good="#4ade80",
    warn="#fbbf24",
    bad="#f87171",
    surface="#1e293b",
    border="#334155",
)

_BASE_CSS = (
    "body{font-family:var(--font);margin:2em auto;max-width:1100px;"
    "background:var(--bg);color:var(--fg)}"
    "table{border-collapse:collapse;margin:1em 0;width:100%}"
    "td,th{border:1px solid var(--border);padding:4px 10px;text-align:left}"
    "th{background:var(--surface)}.num{text-align:right}"
    "h1{border-bottom:2px solid var(--border);padding-bottom:6px}"
    "h2{margin-top:1.6em}"
    ".cards{display:flex;gap:12px;flex-wrap:wrap}"
    ".card{background:var(--surface);border:1px solid var(--border);"
    "border-radius:8px;padding:12px 18px;min-width:120px}"
    ".card .v{font-size:1.5em;font-weight:700}"
    ".card .l{color:var(--muted);font-size:.85em}"
    ".good{color:var(--good)}.warn{color:var(--warn)}.bad{color:var(--bad)}"
    ".muted{color:var(--muted)}"
    ".pill{border-radius:10px;padding:1px 8px;font-size:.8em;"
    "background:var(--surface);border:1px solid var(--border)}"
)


# ---------------------------------------------------------------------------
# report spec (reference base.py:212-356)
# ---------------------------------------------------------------------------


@dataclass
class Section:
    section_id: str
    title: str
    html: str
    data: dict[str, Any] = field(default_factory=dict)  # for md/json export


@dataclass
class ReportSpec:
    title: str
    sections: list[Section] = field(default_factory=list)
    metadata: dict[str, Any] = field(default_factory=dict)


def _esc(v: Any) -> str:
    return _html.escape(str(v))


def _fmt(v: Any) -> str:
    if v is None:
        return ""
    if isinstance(v, float):
        return f"{v:.4g}"
    return str(v)


# ---------------------------------------------------------------------------
# inline-SVG micro-charts
# ---------------------------------------------------------------------------


def _bar_svg(values: list[float], labels: list[str], width: int = 360) -> str:
    """Horizontal bar chart, pure SVG (reference ChartSpec bar type)."""
    if not values:
        return ""
    mx = max(values) or 1.0
    bar_h, gap = 16, 4
    h = len(values) * (bar_h + gap)
    rows = []
    for i, (v, lab) in enumerate(zip(values, labels)):
        w = max(1.0, (v / mx) * (width - 150))
        y = i * (bar_h + gap)
        rows.append(
            f"<rect x='150' y='{y}' width='{w:.1f}' height='{bar_h}' fill='var(--accent)'/>"
            f"<text x='146' y='{y + 12}' text-anchor='end' font-size='11' "
            f"fill='var(--fg)'>{_esc(lab)[:22]}</text>"
            f"<text x='{150 + w + 4:.1f}' y='{y + 12}' font-size='11' "
            f"fill='var(--muted)'>{_fmt(v)}</text>"
        )
    return (
        f"<svg width='{width + 60}' height='{h}' role='img'>" + "".join(rows) + "</svg>"
    )


def _quantile_strip_svg(q: dict[str, float], width: int = 360) -> str:
    """min..max strip with p25/p50/p75 ticks (a box-plot reduced to the
    five numbers the sketch pass already computed)."""
    keys = ["min", "p25", "p50", "p75", "max"]
    vals = [q.get(k) for k in keys]
    if any(v is None for v in vals):
        return ""
    lo, hi = float(vals[0]), float(vals[-1])
    span = (hi - lo) or 1.0
    x = lambda v: 10 + (float(v) - lo) / span * (width - 20)  # noqa: E731
    p25, p50, p75 = (x(v) for v in vals[1:4])
    return (
        f"<svg width='{width}' height='34' role='img'>"
        f"<line x1='{x(lo)}' y1='17' x2='{x(hi)}' y2='17' stroke='var(--muted)'/>"
        f"<rect x='{p25:.1f}' y='8' width='{max(1.0, p75 - p25):.1f}' height='18' "
        "fill='var(--surface)' stroke='var(--accent)'/>"
        f"<line x1='{p50:.1f}' y1='6' x2='{p50:.1f}' y2='28' stroke='var(--accent)' stroke-width='2'/>"
        f"<text x='2' y='33' font-size='10' fill='var(--muted)'>{_fmt(lo)}</text>"
        f"<text x='{width - 4}' y='33' font-size='10' text-anchor='end' "
        f"fill='var(--muted)'>{_fmt(hi)}</text></svg>"
    )


# ---------------------------------------------------------------------------
# section builders (reference sections.py:31-688)
# ---------------------------------------------------------------------------


def overview_section(profile: TableProfile) -> Section:
    total_cells = profile.row_count * max(profile.column_count, 1)
    nulls = sum(c.null_count for c in profile.columns.values())
    null_pct = nulls / total_cells if total_cells else 0.0
    dup_pct = profile.duplicate_row_count / profile.row_count if profile.row_count else 0.0
    cards = [
        ("rows", f"{profile.row_count:,}"),
        ("columns", str(profile.column_count)),
        ("null cells", f"{null_pct:.2%}"),
        ("duplicate rows", f"{dup_pct:.2%}"),
    ]
    html = "<div class='cards'>" + "".join(
        f"<div class='card'><div class='v'>{_esc(v)}</div>"
        f"<div class='l'>{_esc(l)}</div></div>"
        for l, v in cards
    ) + "</div>"
    return Section("overview", "Overview", html, data=dict(cards))


def _quality_class(null_ratio: float) -> str:
    return "good" if null_ratio < 0.05 else ("warn" if null_ratio < 0.2 else "bad")


def columns_section(profile: TableProfile) -> Section:
    rows, data = [], []
    for name, c in profile.columns.items():
        qc = _quality_class(c.null_ratio)
        top = ", ".join(
            f"{_esc(t['value'])} ({t['count']})" for t in (c.top_values or [])[:3]
        )
        rows.append(
            f"<tr><td>{_esc(name)}</td><td><span class='pill'>{_esc(c.dtype)}</span></td>"
            f"<td class='num {qc}'>{c.null_ratio:.2%}</td>"
            f"<td class='num'>{c.distinct_count:,}</td>"
            f"<td class='num'>{_fmt(c.min)}</td><td class='num'>{_fmt(c.max)}</td>"
            f"<td class='num'>{_fmt(c.mean)}</td><td>{top}</td></tr>"
        )
        data.append({"column": name, "dtype": c.dtype, "null_ratio": c.null_ratio,
                     "distinct": c.distinct_count})
    html = (
        "<table><tr><th>column</th><th>type</th><th>nulls</th><th>distinct</th>"
        "<th>min</th><th>max</th><th>mean</th><th>top values</th></tr>"
        + "".join(rows) + "</table>"
    )
    return Section("columns", "Columns", html, data={"columns": data})


def quality_score(c: ColumnProfile, row_count: int) -> float:
    """0-100 column quality (reference QualitySection:320-390): completeness
    dominates; constant columns and single-char noise penalized."""
    score = 100.0 * (1.0 - c.null_ratio)
    if row_count > 1 and c.distinct_count <= 1:
        score -= 30.0  # constant column carries no signal
    if c.unique_ratio > 0.999 and c.dtype in ("double", "float"):
        score -= 5.0  # every-value-distinct float → likely unvalidated measure
    return max(0.0, min(100.0, score))


def quality_section(profile: TableProfile) -> Section:
    rows, data = [], []
    for name, c in profile.columns.items():
        s = quality_score(c, profile.row_count)
        cls = "good" if s >= 80 else ("warn" if s >= 60 else "bad")
        rows.append(
            f"<tr><td>{_esc(name)}</td><td class='num {cls}'>{s:.0f}</td>"
            f"<td class='num'>{c.null_ratio:.2%}</td>"
            f"<td class='num'>{c.unique_ratio:.2%}</td></tr>"
        )
        data.append({"column": name, "score": round(s, 1)})
    html = (
        "<table><tr><th>column</th><th>score</th><th>nulls</th>"
        "<th>unique ratio</th></tr>" + "".join(rows) + "</table>"
    )
    return Section("quality", "Quality scores", html, data={"scores": data})


def distribution_section(profile: TableProfile) -> Section:
    parts, data = [], []
    for name, c in profile.columns.items():
        if c.quantiles:
            svg = _quantile_strip_svg(c.quantiles)
            if svg:
                parts.append(f"<h3>{_esc(name)}</h3>{svg}")
                data.append({"column": name, "quantiles": c.quantiles})
        elif c.top_values:
            vals = [float(t["count"]) for t in c.top_values[:8]]
            labs = [str(t["value"]) for t in c.top_values[:8]]
            parts.append(f"<h3>{_esc(name)}</h3>{_bar_svg(vals, labs)}")
            data.append({"column": name, "top_values": c.top_values[:8]})
    return Section("distribution", "Distributions", "".join(parts), data={"charts": data})


def correlations_section(profile: TableProfile) -> Section:
    corr = profile.correlations or {}
    rows, data = [], []
    for pair, r in sorted(corr.items(), key=lambda kv: -abs(kv[1] or 0)):
        if r is None:
            continue
        cls = "bad" if abs(r) >= 0.8 else ("warn" if abs(r) >= 0.5 else "muted")
        rows.append(f"<tr><td>{_esc(pair)}</td><td class='num {cls}'>{r:+.3f}</td></tr>")
        data.append({"pair": pair, "r": round(r, 4)})
    html = (
        "<table><tr><th>pair</th><th>r</th></tr>" + "".join(rows) + "</table>"
        if rows
        else "<p class='muted'>no numeric pairs profiled</p>"
    )
    return Section("correlations", "Correlations", html, data={"pairs": data})


def recommendations(profile: TableProfile) -> list[dict[str, str]]:
    """Suite suggestions from the profile (reference RecommendationsSection
    :582-650) — each maps to a registered validator name, so the output
    plugs straight into ``check(df, validators=[...])``."""
    recs: list[dict[str, str]] = []
    n = profile.row_count
    for name, c in profile.columns.items():
        if c.null_ratio == 0 and n > 0:
            recs.append({"column": name, "validator": "not_null",
                         "reason": "observed fully populated — pin it"})
        elif c.null_ratio > 0.2:
            recs.append({"column": name, "validator": "completeness_ratio",
                         "reason": f"{c.null_ratio:.0%} nulls — decide a floor"})
        if n > 1 and c.unique_ratio >= 1.0:
            recs.append({"column": name, "validator": "unique",
                         "reason": "every value distinct — key candidate"})
        if 1 < c.distinct_count <= 20 and c.dtype == "string":
            recs.append({"column": name, "validator": "in_set",
                         "reason": f"only {c.distinct_count} values — enumerable domain"})
        if c.mean is not None and c.std not in (None, 0.0):
            recs.append({"column": name, "validator": "zscore_outlier",
                         "reason": "numeric with spread — outlier guard"})
    return recs


def recommendations_section(profile: TableProfile) -> Section:
    recs = recommendations(profile)
    rows = "".join(
        f"<tr><td>{_esc(r['column'])}</td><td><code>{_esc(r['validator'])}</code></td>"
        f"<td>{_esc(r['reason'])}</td></tr>"
        for r in recs
    )
    html = (
        "<table><tr><th>column</th><th>suggested check</th><th>why</th></tr>"
        + rows + "</table>"
        if recs
        else "<p class='muted'>no recommendations</p>"
    )
    return Section("recommendations", "Suggested checks", html, data={"recommendations": recs})


def alerts_section(runs: list[tuple[str, Any]]) -> Section:
    """Validation-run alert roll-up (reference AlertsSection:652-688)."""
    rows, data = [], []
    for run_id, result in runs:
        by_sev: dict[str, int] = {}
        for i in result.issues:
            by_sev[str(i.severity)] = by_sev.get(str(i.severity), 0) + 1
        cls = "good" if result.success else "bad"
        sev = ", ".join(f"{k}: {v}" for k, v in sorted(by_sev.items()))
        rows.append(
            f"<tr><td>{_esc(run_id)}</td>"
            f"<td class='{cls}'>{'PASS' if result.success else 'FAIL'}</td>"
            f"<td class='num'>{len(result.issues)}</td><td>{_esc(sev)}</td></tr>"
        )
        data.append({"run": run_id, "success": result.success,
                     "issues": len(result.issues), "by_severity": by_sev})
    html = (
        "<table><tr><th>run</th><th>status</th><th>issues</th>"
        "<th>by severity</th></tr>" + "".join(rows) + "</table>"
        if rows
        else "<p class='muted'>no runs recorded</p>"
    )
    return Section("alerts", "Validation alerts", html, data={"runs": data})


# ---------------------------------------------------------------------------
# report assembly + exporters (reference exporters/*)
# ---------------------------------------------------------------------------


def build_report(
    profile: TableProfile,
    runs: list[tuple[str, Any]] | None = None,
    title: str = "Data profile",
    sections: list[str] | None = None,
    corpus: dict[str, Any] | None = None,
    comparison: Any | None = None,
    thresholds: Any | None = None,
) -> ReportSpec:
    """Assemble a ReportSpec; ``sections`` selects/reorders by id.
    ``corpus`` (a ``corpus_stats`` dict) adds the corpus-health section;
    ``comparison`` (ProfileComparison) adds the evolution section;
    ``thresholds`` (TableThresholds) adds the learned-gates section."""
    builders = {
        "overview": lambda: overview_section(profile),
        "columns": lambda: columns_section(profile),
        "quality": lambda: quality_section(profile),
        "distribution": lambda: distribution_section(profile),
        "correlations": lambda: correlations_section(profile),
        "recommendations": lambda: recommendations_section(profile),
        "alerts": lambda: alerts_section(runs or []),
    }
    if corpus is not None:
        builders["corpus"] = lambda: corpus_section(corpus)
    if comparison is not None:
        builders["evolution"] = lambda: evolution_section(comparison)
    if thresholds is not None:
        builders["thresholds"] = lambda: thresholds_section(thresholds)
    chosen = sections or list(builders)
    unknown = [s for s in chosen if s not in builders]
    if unknown:
        raise ValueError(f"unknown sections {unknown}; known: {sorted(builders)}")
    return ReportSpec(
        title=title,
        sections=[builders[s]() for s in chosen],
        metadata={"row_count": profile.row_count, "column_count": profile.column_count},
    )


def render_report_html(spec: ReportSpec, theme: ThemeConfig = DEFAULT_THEME) -> str:
    body = "".join(
        f"<h2 id='{_esc(s.section_id)}'>{_esc(s.title)}</h2>{s.html}"
        for s in spec.sections
    )
    nav = " · ".join(
        f"<a href='#{_esc(s.section_id)}'>{_esc(s.title)}</a>" for s in spec.sections
    )
    return (
        "<!doctype html><html><head><meta charset='utf-8'>"
        f"<title>{_esc(spec.title)}</title>"
        f"<style>{theme.to_css_vars()}{_BASE_CSS}</style></head><body>"
        f"<h1>{_esc(spec.title)}</h1><p class='muted'>{nav}</p>{body}</body></html>"
    )


def render_report_markdown(spec: ReportSpec) -> str:
    out = [f"# {spec.title}", ""]
    for s in spec.sections:
        out.append(f"## {s.title}")
        out.append("```json")
        out.append(json.dumps(s.data, indent=2, default=str))
        out.append("```")
        out.append("")
    return "\n".join(out)


def render_report_json(spec: ReportSpec) -> str:
    return json.dumps(
        {
            "title": spec.title,
            "metadata": spec.metadata,
            "sections": {s.section_id: s.data for s in spec.sections},
        },
        indent=2,
        default=str,
    )


# ---------------------------------------------------------------------------
# versioned diff (reference versioning/diff.py StructuralDiffStrategy)
# ---------------------------------------------------------------------------


@dataclass
class ProfileChange:
    kind: str  # column_added | column_removed | dtype_changed | stat_drift | row_count
    column: str | None
    before: Any
    after: Any
    detail: str = ""

    def to_dict(self) -> dict[str, Any]:
        return {"kind": self.kind, "column": self.column, "before": self.before,
                "after": self.after, "detail": self.detail}


def diff_profiles(
    old: TableProfile,
    new: TableProfile,
    null_ratio_eps: float = 0.01,
    mean_shift_stds: float = 0.5,
) -> list[ProfileChange]:
    """Structural + statistical diff between two profiles of the same
    table — the docs-versioning primitive. Statistical drift thresholds
    are in interpretable units (absolute null-ratio delta; mean shift in
    units of the OLD std)."""
    changes: list[ProfileChange] = []
    if old.row_count != new.row_count:
        changes.append(ProfileChange("row_count", None, old.row_count, new.row_count))
    for name in new.columns.keys() - old.columns.keys():
        changes.append(ProfileChange("column_added", name, None, new.columns[name].dtype))
    for name in old.columns.keys() - new.columns.keys():
        changes.append(ProfileChange("column_removed", name, old.columns[name].dtype, None))
    for name in old.columns.keys() & new.columns.keys():
        o, c = old.columns[name], new.columns[name]
        if o.dtype != c.dtype:
            changes.append(ProfileChange("dtype_changed", name, o.dtype, c.dtype))
        if abs(o.null_ratio - c.null_ratio) > null_ratio_eps:
            changes.append(
                ProfileChange(
                    "stat_drift", name, round(o.null_ratio, 4), round(c.null_ratio, 4),
                    detail="null_ratio",
                )
            )
        if (
            o.mean is not None
            and c.mean is not None
            and o.std not in (None, 0.0)
            and abs(c.mean - o.mean) > mean_shift_stds * abs(o.std)
        ):
            changes.append(
                ProfileChange(
                    "stat_drift", name, round(o.mean, 4), round(c.mean, 4),
                    detail=f"mean shifted > {mean_shift_stds}σ",
                )
            )
    return sorted(changes, key=lambda ch: (ch.kind, ch.column or ""))


def render_diff_html(
    changes: list[ProfileChange],
    title: str = "Profile diff",
    theme: ThemeConfig = DEFAULT_THEME,
) -> str:
    rows = "".join(
        f"<tr><td><span class='pill'>{_esc(ch.kind)}</span></td>"
        f"<td>{_esc(ch.column or '—')}</td><td>{_fmt(ch.before)}</td>"
        f"<td>{_fmt(ch.after)}</td><td class='muted'>{_esc(ch.detail)}</td></tr>"
        for ch in changes
    )
    body = (
        "<table><tr><th>change</th><th>column</th><th>before</th><th>after</th>"
        "<th>detail</th></tr>" + rows + "</table>"
        if changes
        else "<p class='good'>no changes</p>"
    )
    return (
        "<!doctype html><html><head><meta charset='utf-8'>"
        f"<title>{_esc(title)}</title>"
        f"<style>{theme.to_css_vars()}{_BASE_CSS}</style></head><body>"
        f"<h1>{_esc(title)}</h1>{body}</body></html>"
    )


# ---------------------------------------------------------------------------
# corpus section (round 4: LLM-corpus gating surfaced in the docs site)
# ---------------------------------------------------------------------------


def corpus_stats(df: Any, text_col: str = "text") -> dict[str, Any]:
    """One-pass corpus metrics for the report: the SAME column math as
    validators/corpus.py, reduced to kilobytes driver-side. Two Spark
    jobs: the fused scalar agg + a per-language count."""
    from pyspark.sql import functions as F

    from truthound_spark.pipeline.dedup import content_fingerprint, normalized_text
    from truthound_spark.pipeline.text import bpe_ish_token_count, language_id
    from truthound_spark.validators.corpus import _quality_score_expr

    c = F.col(text_col)
    tok = bpe_ish_token_count(c)
    row = df.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.count(content_fingerprint(c)) - F.count_distinct(content_fingerprint(c))).alias("dup_excess"),
        F.sum(F.coalesce(tok, F.lit(0))).alias("total_tokens"),
        F.round(F.avg(tok), 1).alias("avg_tokens"),
        F.max(tok).alias("max_tokens"),
        F.sum((F.coalesce(normalized_text(c), F.lit("")) == "").cast("long")).alias("empty_docs"),
        F.round(F.avg(_quality_score_expr(c)), 4).alias("avg_quality"),
        F.sum((_quality_score_expr(c) < 0.3).cast("long")).alias("low_quality"),
    ).collect()[0]
    langs = {
        r["lang"]: r["n"]
        for r in df.select(language_id(c).alias("lang"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    out = row.asDict()
    out["languages"] = dict(sorted(langs.items(), key=lambda kv: -kv[1]))
    try:
        from truthound_spark.pipeline.retrieval import boilerplate_ngrams

        out["boilerplate"] = [
            {"gram": r["gram"], "n_docs": int(r["n_docs"])}
            for r in boilerplate_ngrams(
                df.select(F.monotonically_increasing_id().alias("doc_id"), c.alias("text")),
                n=5,
                min_docs=max(2, int(0.05 * (out["n_docs"] or 1))),
                k=5,
            ).collect()
        ]
    except Exception:  # boilerplate is advisory — never fail the report
        out["boilerplate"] = []
    return out


def corpus_section(stats: dict[str, Any]) -> Section:
    """Corpus health cards + language distribution bar chart."""
    n = stats.get("n_docs") or 0
    dup_pct = (stats.get("dup_excess") or 0) / n if n else 0.0
    low_pct = (stats.get("low_quality") or 0) / n if n else 0.0
    cards = [
        ("documents", f"{n:,}"),
        ("total tokens", f"{stats.get('total_tokens') or 0:,}"),
        ("avg tokens/doc", _fmt(stats.get("avg_tokens"))),
        ("exact-dup rate", f"{dup_pct:.2%}"),
        ("low quality", f"{low_pct:.2%}"),
        ("empty docs", str(stats.get("empty_docs") or 0)),
        ("avg quality", _fmt(stats.get("avg_quality"))),
    ]
    html = "<div class='cards'>" + "".join(
        f"<div class='card'><div class='v'>{_esc(v)}</div>"
        f"<div class='l'>{_esc(l)}</div></div>"
        for l, v in cards
    ) + "</div>"
    langs: dict[str, int] = stats.get("languages") or {}
    if langs:
        html += "<h3>Languages</h3>" + _bar_svg(
            [float(v) for v in langs.values()], list(langs)
        )
    bp = stats.get("boilerplate") or []
    if bp:
        html += "<h3>Top boilerplate 5-grams (doc spread)</h3><table>" + "".join(
            f"<tr><td>{_esc(e['gram'])}</td><td>{e['n_docs']}</td></tr>" for e in bp
        ) + "</table>"
    return Section("corpus", "Corpus health", html, data={**stats})


# ---------------------------------------------------------------------------
# round 7: evolution + learned-thresholds sections (reference profiler
# comparison/evolution HTML surfaces; dashboards stay a non-goal — these
# are report SECTIONS riding the existing datadocs renderer)
# ---------------------------------------------------------------------------


def evolution_section(cmp: Any) -> Section:
    """Render a profiler/evolution.py ProfileComparison: schema changes
    (renames called out, breaking changes flagged) + stat drifts."""
    rows = []
    for c in cmp.added_columns:
        rows.append(("column added", c, "", "", "good", ""))
    for c in cmp.removed_columns:
        rows.append(("column removed", c, "", "", "bad", "breaking"))
    for old, new in cmp.renamed_columns.items():
        rows.append(("column renamed", f"{old} → {new}", "", "", "warn", ""))
    for c, (a, b) in cmp.type_changes.items():
        rows.append(("type changed", c, a, b, "bad", "breaking"))
    for d in cmp.drifts:
        cls = "bad" if d.severity == "critical" else "warn"
        rows.append(
            (d.drift_type, d.column or "<table>", _fmt(d.old_value), _fmt(d.new_value), cls, d.severity)
        )
    body = "".join(
        f"<tr><td>{_esc(k)}</td><td>{_esc(col)}</td><td>{_esc(a)}</td>"
        f"<td>{_esc(b)}</td><td class='{cls}'>{_esc(sev)}</td></tr>"
        for k, col, a, b, cls, sev in rows
    ) or "<tr><td colspan='5' class='muted'>no changes</td></tr>"
    html = (
        "<table><tr><th>change</th><th>column</th><th>before</th>"
        f"<th>after</th><th>severity</th></tr>{body}</table>"
    )
    return Section(
        section_id="evolution",
        title="Profile evolution",
        html=html,
        data=cmp.to_dict(),
    )


def thresholds_section(tt: Any) -> Section:
    """Render ml/auto_threshold.py TableThresholds — the learned gates a
    reviewer signs off on before the suite goes live."""
    rows = []
    for name, th in sorted(tt.columns.items()):
        gates = []
        if th.null_ratio_max is not None:
            gates.append(f"null ≤ {th.null_ratio_max:.2%}")
        if th.min_value is not None or th.max_value is not None:
            gates.append(f"range [{_fmt(th.min_value)}, {_fmt(th.max_value)}]")
        if th.mean_min is not None:
            gates.append(f"mean ∈ [{_fmt(th.mean_min)}, {_fmt(th.mean_max)}]")
        if th.unique_ratio_min is not None:
            gates.append(f"unique ≥ {th.unique_ratio_min:.3f}")
        if th.min_length is not None:
            gates.append(f"len [{th.min_length}, {th.max_length}]")
        rows.append(
            f"<tr><td>{_esc(name)}</td><td>{_esc('; '.join(gates) or '—')}</td>"
            f"<td>{th.confidence:.2f}</td>"
            f"<td class='muted'>{_esc(', '.join(th.reasoning))}</td></tr>"
        )
    meta = []
    if tt.row_count_min is not None:
        meta.append(
            f"<p>row count gate: [{tt.row_count_min:,} – {tt.row_count_max:,}]"
            f" · strategy: <span class='pill'>{_esc(tt.strategy)}</span></p>"
        )
    html = "".join(meta) + (
        "<table><tr><th>column</th><th>learned gates</th><th>confidence</th>"
        f"<th>reasoning</th></tr>{''.join(rows)}</table>"
    )
    return Section(
        section_id="thresholds",
        title="Learned thresholds",
        html=html,
        data=tt.to_dict(),
    )
