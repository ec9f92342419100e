"""Result reporters (reference: src/truthound/reporters/{console,json,
markdown,html}_reporter.py — engine-agnostic rendering of a
ValidationRunResult; ported at the format level, not line-level)."""

from __future__ import annotations

import json
from typing import Any

from truthound_spark.core.results import ValidationRunResult


def render(result: ValidationRunResult, format: str = "console") -> str:
    return {
        "console": render_console,
        "json": render_json,
        "markdown": render_markdown,
        "html": render_html,
    }[format](result)


def render_console(result: ValidationRunResult) -> str:
    lines = [
        f"Validation: {'PASS' if result.success else 'FAIL'} "
        f"({len(result.issues)} issues, {result.checks_run} checks, "
        f"{result.row_count} rows x {result.column_count} cols)"
    ]
    for i in result.issues:
        lines.append(
            f"  [{i.severity.name:<8}] {i.validator_name:<24} "
            f"{i.column or '-':<24} {i.issue_type}: {i.details}"
        )
    for i in result.execution_issues:
        lines.append(f"  [ERROR   ] {i.validator_name}: {i.details}")
    return "\n".join(lines)


def render_json(result: ValidationRunResult) -> str:
    return json.dumps(result.to_dict(), indent=2, default=str)


def render_markdown(result: ValidationRunResult) -> str:
    out = [
        f"# Validation report — {'✅ PASS' if result.success else '❌ FAIL'}",
        "",
        f"- rows: **{result.row_count}**, columns: **{result.column_count}**",
        f"- checks run: **{result.checks_run}**, issues: **{len(result.issues)}**",
        "",
    ]
    if result.issues:
        out += [
            "| severity | validator | column | issue | count | details |",
            "|---|---|---|---|---:|---|",
        ]
        for i in result.issues:
            details = str(i.details).replace("|", "\\|")
            out.append(
                f"| {i.severity.name} | {i.validator_name} | {i.column or ''} "
                f"| {i.issue_type} | {i.count} | {details} |"
            )
    return "\n".join(out)


def render_html(result: ValidationRunResult) -> str:
    rows = "".join(
        f"<tr><td>{i.severity.name}</td><td>{i.validator_name}</td>"
        f"<td>{i.column or ''}</td><td>{i.issue_type}</td>"
        f"<td>{i.count}</td><td>{i.details}</td></tr>"
        for i in result.issues
    )
    status = "PASS" if result.success else "FAIL"
    color = "#2e7d32" if result.success else "#c62828"
    return (
        "<!doctype html><html><head><meta charset='utf-8'>"
        "<title>truthound-spark report</title>"
        "<style>body{font-family:sans-serif;margin:2em}"
        "table{border-collapse:collapse}td,th{border:1px solid #ccc;"
        "padding:4px 8px}</style></head><body>"
        f"<h1 style='color:{color}'>Validation {status}</h1>"
        f"<p>{result.row_count} rows × {result.column_count} columns, "
        f"{result.checks_run} checks, {len(result.issues)} issues</p>"
        "<table><tr><th>severity</th><th>validator</th><th>column</th>"
        f"<th>issue</th><th>count</th><th>details</th></tr>{rows}</table>"
        "</body></html>"
    )


def save_report(result: ValidationRunResult, path: str, format: str | None = None) -> None:
    if format is None:
        format = {
            "json": "json",
            "md": "markdown",
            "html": "html",
        }.get(path.rsplit(".", 1)[-1], "console")
    with open(path, "w") as f:
        f.write(render(result, format))
