"""Versioned data-docs + version diff pages.

Reference: datadocs/versioning/version.py (VersionInfo / ReportVersion
/ incremental strategy), versioning/storage.py (file-backed version
store with manifest), versioning/diff.py (TextDiffStrategy unified-line
changes, DiffResult summary, ReportDiffer.format_diff) and the
dashboard's version-to-version diff pages.

Artifact-level port, driver-side only: docs pages are KB-sized render
shells regardless of data scale, so nothing here touches the cluster.
Three layers:

* ``DocsVersionStore`` — a directory of ``<report_id>/v<N>.<fmt>``
  files plus a ``manifest.json`` of :class:`VersionInfo` rows
  (sha256 checksums, auto-incremented versions; saving byte-identical
  content is a no-op returning the existing version, the reference's
  dedup-on-checksum behavior).
* ``diff_versions`` — unified text diff of two stored versions →
  :class:`DocsDiff` (added/removed/modified counts + hunks), and
  ``render_diff_page`` → a standalone HTML page linking both versions.
* ``render_dataset_diff_page`` — the fingerprint/summary diff
  (``fingerprint.diff_datasets`` / a ``DiffBundle`` envelope) rendered
  as a versioned docs page linking the two run artifacts it compares —
  the user-visible face of the r8 diff payloads.
"""

from __future__ import annotations

import difflib
import hashlib
import html as _html
import json
import os
from dataclasses import dataclass, field
from typing import Any

__all__ = [
    "VersionInfo",
    "DocsVersionStore",
    "DocsDiff",
    "diff_versions",
    "render_diff_page",
    "render_dataset_diff_page",
]

_CSS = (
    "body{font-family:sans-serif;margin:2em;color:#222}"
    "table{border-collapse:collapse;margin:1em 0}"
    "td,th{border:1px solid #ccc;padding:4px 10px;text-align:left}"
    "th{background:#f4f4f4}.num{text-align:right}"
    "h1{border-bottom:2px solid #eee;padding-bottom:6px}"
    ".add{background:#e6ffe6}.del{background:#ffe6e6}"
    ".meta{color:#666;font-size:90%}"
    "pre{background:#f8f8f8;padding:8px;overflow-x:auto}"
    ".badge{display:inline-block;padding:2px 8px;border-radius:10px;"
    "background:#eee;margin-right:6px}"
)


@dataclass
class VersionInfo:
    """One stored docs version (reference versioning/version.py:17)."""

    report_id: str
    version: int
    checksum: str
    format: str = "html"
    created_at: str = ""
    metadata: dict[str, Any] = field(default_factory=dict)

    def to_dict(self) -> dict[str, Any]:
        return {
            "report_id": self.report_id,
            "version": self.version,
            "checksum": self.checksum,
            "format": self.format,
            "created_at": self.created_at,
            "metadata": dict(self.metadata),
        }

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "VersionInfo":
        return cls(
            report_id=str(d["report_id"]),
            version=int(d["version"]),
            checksum=str(d["checksum"]),
            format=str(d.get("format", "html")),
            created_at=str(d.get("created_at", "")),
            metadata=dict(d.get("metadata") or {}),
        )


class DocsVersionStore:
    """File-backed docs version store (reference versioning/storage.py
    FileVersionStorage): ``<root>/<report_id>/v<N>.<fmt>`` +
    ``manifest.json``. Incremental versions; saving content whose
    sha256 matches the latest version is a no-op that returns the
    existing :class:`VersionInfo` (no duplicate versions for unchanged
    docs)."""

    def __init__(self, root: str) -> None:
        self.root = root
        os.makedirs(root, exist_ok=True)

    def report_dir(self, report_id: str) -> str:
        """Directory holding this report's versions + manifest. When
        sanitization changes the name, a short hash of the ORIGINAL id
        disambiguates — otherwise 'a/b' and 'a_b' would silently share
        one manifest and interleave their version histories."""
        safe = "".join(c if (c.isalnum() or c in "-_.") else "_" for c in report_id)
        if safe != report_id:
            safe += "-" + hashlib.sha256(report_id.encode("utf-8")).hexdigest()[:8]
        return os.path.join(self.root, safe)

    # backwards-internal alias
    _dir = report_dir

    def _manifest_path(self, report_id: str) -> str:
        return os.path.join(self._dir(report_id), "manifest.json")

    def list_versions(self, report_id: str) -> list[VersionInfo]:
        path = self._manifest_path(report_id)
        if not os.path.exists(path):
            return []
        with open(path) as fh:
            return [VersionInfo.from_dict(d) for d in json.load(fh)]

    def latest(self, report_id: str) -> VersionInfo | None:
        versions = self.list_versions(report_id)
        return versions[-1] if versions else None

    def save(
        self,
        report_id: str,
        content: str,
        format: str = "html",
        created_at: str = "",
        metadata: dict[str, Any] | None = None,
    ) -> VersionInfo:
        checksum = hashlib.sha256(content.encode("utf-8")).hexdigest()
        versions = self.list_versions(report_id)
        if versions and versions[-1].checksum == checksum:
            return versions[-1]
        info = VersionInfo(
            report_id=report_id,
            version=(versions[-1].version + 1) if versions else 1,
            checksum=checksum,
            format=format,
            created_at=created_at,
            metadata=metadata or {},
        )
        d = self._dir(report_id)
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, f"v{info.version}.{format}"), "w") as fh:
            fh.write(content)
        versions.append(info)
        with open(self._manifest_path(report_id), "w") as fh:
            json.dump([v.to_dict() for v in versions], fh, indent=1)
        return info

    def load(self, report_id: str, version: int) -> str:
        infos = {v.version: v for v in self.list_versions(report_id)}
        if version not in infos:
            raise KeyError(f"{report_id} has no version {version}")
        path = os.path.join(
            self._dir(report_id), f"v{version}.{infos[version].format}"
        )
        with open(path) as fh:
            return fh.read()


@dataclass
class DocsDiff:
    """Unified-diff summary of two stored versions (reference
    versioning/diff.py DiffResult)."""

    report_id: str
    from_version: int
    to_version: int
    added: int
    removed: int
    hunks: list[str]

    @property
    def has_changes(self) -> bool:
        return bool(self.added or self.removed)

    def to_dict(self) -> dict[str, Any]:
        return {
            "report_id": self.report_id,
            "from_version": self.from_version,
            "to_version": self.to_version,
            "added": self.added,
            "removed": self.removed,
            "has_changes": self.has_changes,
            "hunks": list(self.hunks),
        }


def diff_versions(
    store: DocsVersionStore, report_id: str, from_version: int, to_version: int
) -> DocsDiff:
    """Line-level unified diff of two stored versions (reference
    TextDiffStrategy: difflib unified_diff, whitespace-normalized)."""
    a = store.load(report_id, from_version).splitlines()
    b = store.load(report_id, to_version).splitlines()
    hunks = list(
        difflib.unified_diff(
            a, b, fromfile=f"v{from_version}", tofile=f"v{to_version}", lineterm=""
        )
    )
    added = sum(1 for h in hunks if h.startswith("+") and not h.startswith("+++"))
    removed = sum(1 for h in hunks if h.startswith("-") and not h.startswith("---"))
    return DocsDiff(
        report_id=report_id,
        from_version=from_version,
        to_version=to_version,
        added=added,
        removed=removed,
        hunks=hunks,
    )


def render_diff_page(diff: DocsDiff, title: str | None = None) -> str:
    """Standalone HTML diff page linking the two versions it compares
    (the dashboard's version-to-version diff view)."""
    title = title or f"{diff.report_id}: v{diff.from_version} → v{diff.to_version}"
    lines = []
    for h in diff.hunks:
        esc = _html.escape(h)
        if h.startswith("+") and not h.startswith("+++"):
            lines.append(f"<div class='add'>{esc}</div>")
        elif h.startswith("-") and not h.startswith("---"):
            lines.append(f"<div class='del'>{esc}</div>")
        else:
            lines.append(f"<div>{esc}</div>")
    status = (
        f"<span class='badge'>+{diff.added}</span>"
        f"<span class='badge'>−{diff.removed}</span>"
        if diff.has_changes
        else "<span class='badge'>no changes</span>"
    )
    return (
        "<!doctype html><html><head><meta charset='utf-8'>"
        f"<title>{_html.escape(title)}</title><style>{_CSS}</style></head><body>"
        f"<h1>{_html.escape(title)}</h1><p>{status}</p>"
        "<p class='meta'>"
        f"<a href='v{diff.from_version}.html'>v{diff.from_version}</a> → "
        f"<a href='v{diff.to_version}.html'>v{diff.to_version}</a></p>"
        f"<pre>{''.join(lines)}</pre></body></html>"
    )


def render_dataset_diff_page(
    diff: Any,
    source_href: str | None = None,
    target_href: str | None = None,
    title: str = "Dataset diff",
) -> str:
    """The fingerprint/summary diff (``fingerprint.DatasetDiff`` /
    ``diff_datasets`` output, a ``DiffBundle``, or either's dict) as a
    versioned docs page linking the two run artifacts it compares —
    category badges, the summary table, and per-category details."""
    d = diff.to_dict() if hasattr(diff, "to_dict") else dict(diff)
    if "diff" in d and isinstance(d["diff"], dict):  # DiffBundle envelope payload
        d = {**d["diff"], "blocking": d.get("blocking")}
    src = str(d.get("source_snapshot_id") or "source")
    tgt = str(d.get("target_snapshot_id") or "target")
    cats = list(d.get("categories") or [])
    badges = (
        "".join(f"<span class='badge'>{_html.escape(c)}</span>" for c in cats)
        or "<span class='badge'>no changes</span>"
    )
    src_a = (
        f"<a href='{_html.escape(source_href)}'>{_html.escape(src)}</a>"
        if source_href
        else _html.escape(src)
    )
    tgt_a = (
        f"<a href='{_html.escape(target_href)}'>{_html.escape(tgt)}</a>"
        if target_href
        else _html.escape(tgt)
    )
    summary_rows = "".join(
        f"<tr><td>{_html.escape(str(k))}</td>"
        f"<td>{_html.escape(json.dumps(v, default=str))}</td></tr>"
        for k, v in (d.get("summary") or {}).items()
    )
    detail_rows = "".join(
        f"<tr><td>{_html.escape(str(k))}</td>"
        f"<td><pre>{_html.escape(json.dumps(v, indent=1, default=str))}</pre></td></tr>"
        for k, v in (d.get("details") or {}).items()
    )
    return (
        "<!doctype html><html><head><meta charset='utf-8'>"
        f"<title>{_html.escape(title)}</title><style>{_CSS}</style></head><body>"
        f"<h1>{_html.escape(title)}</h1>"
        f"<p class='meta'>{src_a} → {tgt_a}</p>"
        f"<p>{badges}</p>"
        f"<h2>Summary</h2><table><tr><th>key</th><th>value</th></tr>"
        f"{summary_rows}</table>"
        + (
            f"<h2>Details</h2><table><tr><th>category</th><th>detail</th></tr>"
            f"{detail_rows}</table>"
            if detail_rows
            else ""
        )
        + "</body></html>"
    )
