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
