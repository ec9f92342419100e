"""Static HTML data-docs (reference: src/truthound/datadocs/ — profile +
validation documentation pages; ported at the artifact level)."""

from __future__ import annotations

import html as _html
from typing import Any

from truthound_spark.profiler.table_profiler import TableProfile

_CSS = (
    "body{font-family:sans-serif;margin:2em;color:#222}"
    "table{border-collapse:collapse;margin:1em 0}"
    "td,th{border:1px solid #ccc;padding:4px 10px;text-align:left}"
    "th{background:#f4f4f4}.num{text-align:right}"
    "h1{border-bottom:2px solid #eee;padding-bottom:6px}"
)


def profile_docs(profile: TableProfile, title: str = "Data profile") -> str:
    """Render a TableProfile to a standalone HTML document."""
    rows = []
    for name, c in profile.columns.items():
        top = ", ".join(
            f"{_html.escape(str(t['value']))} ({t['count']})"
            for t in (c.top_values or [])[:3]
        )
        rows.append(
            f"<tr><td>{_html.escape(name)}</td><td>{c.dtype}</td>"
            f"<td class='num'>{c.null_ratio:.2%}</td>"
            f"<td class='num'>{c.distinct_count}</td>"
            f"<td class='num'>{c.min if c.min is not None else ''}</td>"
            f"<td class='num'>{c.max if c.max is not None else ''}</td>"
            f"<td class='num'>{f'{c.mean:.4g}' if c.mean is not None else ''}</td>"
            f"<td>{top}</td></tr>"
        )
    return (
        "<!doctype html><html><head><meta charset='utf-8'>"
        f"<title>{_html.escape(title)}</title><style>{_CSS}</style></head><body>"
        f"<h1>{_html.escape(title)}</h1>"
        f"<p>{profile.row_count} rows × {profile.column_count} columns; "
        f"{profile.duplicate_row_count} duplicate rows</p>"
        "<table><tr><th>column</th><th>type</th><th>nulls</th>"
        "<th>distinct</th><th>min</th><th>max</th><th>mean</th>"
        f"<th>top values</th></tr>{''.join(rows)}</table></body></html>"
    )


def save_profile_docs(profile: TableProfile, path: str, title: str = "Data profile") -> None:
    with open(path, "w") as f:
        f.write(profile_docs(profile, title))


# ---------------------------------------------------------------------------
# multi-page docs site (reference: datadocs/ site builder — index page,
# per-table profile pages, validation-run history)
# ---------------------------------------------------------------------------


def build_site(
    out_dir: str,
    profiles: dict[str, TableProfile] | None = None,
    runs: list[tuple[str, Any]] | None = None,
    title: str = "truthound data docs",
    theme: Any = None,
    previous_profiles: dict[str, TableProfile] | None = None,
) -> str:
    """Write a static docs site: ``index.html`` linking per-table profile
    pages (``table_<name>.html`` — full section reports: overview cards,
    quality scores, SVG distributions, correlations, suggested checks),
    per-run validation reports (``run_<id>.html``), and — when
    ``previous_profiles`` carries an earlier snapshot — a versioned
    ``diff_<name>.html`` per table. Returns the index path.

    ``runs``: list of (run_id, ValidationRunResult). The artifacts are
    plain HTML files — publishable from any object store."""
    import os

    from truthound_spark.datadocs_report import (
        DEFAULT_THEME,
        build_report,
        diff_profiles,
        render_diff_html,
        render_report_html,
    )
    from truthound_spark.reporters import render_html

    theme = theme or DEFAULT_THEME
    os.makedirs(out_dir, exist_ok=True)
    profiles = profiles or {}
    runs = runs or []
    previous_profiles = previous_profiles or {}

    table_links = []
    for name, prof in profiles.items():
        page = f"table_{name}.html"
        spec = build_report(prof, runs=runs, title=f"Profile: {name}")
        with open(os.path.join(out_dir, page), "w") as f:
            f.write(render_report_html(spec, theme))
        diff_cell = ""
        if name in previous_profiles:
            diff_page = f"diff_{name}.html"
            changes = diff_profiles(previous_profiles[name], prof)
            with open(os.path.join(out_dir, diff_page), "w") as f:
                f.write(render_diff_html(changes, title=f"Diff: {name}", theme=theme))
            diff_cell = f" <a href='{diff_page}'>(diff: {len(changes)})</a>"
        table_links.append(
            f"<tr><td><a href='{page}'>{_html.escape(name)}</a>{diff_cell}</td>"
            f"<td class='num'>{prof.row_count}</td>"
            f"<td class='num'>{prof.column_count}</td>"
            f"<td class='num'>{prof.duplicate_row_count}</td></tr>"
        )

    run_links = []
    for run_id, result in runs:
        page = f"run_{run_id}.html"
        with open(os.path.join(out_dir, page), "w") as f:
            f.write(render_html(result))
        status = "PASS" if result.success else "FAIL"
        run_links.append(
            f"<tr><td><a href='{page}'>{_html.escape(str(run_id))}</a></td>"
            f"<td>{status}</td><td class='num'>{len(result.issues)}</td>"
            f"<td class='num'>{result.checks_run}</td></tr>"
        )

    index = (
        "<!doctype html><html><head><meta charset='utf-8'>"
        f"<title>{_html.escape(title)}</title><style>{_CSS}</style></head><body>"
        f"<h1>{_html.escape(title)}</h1>"
        "<h2>Tables</h2><table><tr><th>table</th><th>rows</th><th>cols</th>"
        f"<th>dup rows</th></tr>{''.join(table_links)}</table>"
        "<h2>Validation runs</h2><table><tr><th>run</th><th>status</th>"
        f"<th>issues</th><th>checks</th></tr>{''.join(run_links)}</table>"
        "</body></html>"
    )
    index_path = os.path.join(out_dir, "index.html")
    with open(index_path, "w") as f:
        f.write(index)
    return index_path
