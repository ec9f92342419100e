"""Profile comparison + schema/stat evolution over time.

Reference surfaces re-expressed:
  * profiler/comparison.py:34-500 — DriftType/DriftSeverity/DriftResult,
    ColumnComparison, ProfileComparison, DriftThresholds (default /
    strict :366 / loose :380);
  * profiler/evolution/changes.py:15-44 — ChangeType / ChangeSeverity
    schema-change taxonomy;
  * profiler/evolution/rename_detector.py — removed+added columns with
    matching statistical fingerprints are reported as renames;
  * profiler/evolution/history.py — profile history with per-stat trends.

Everything operates on stored TableProfile scalars (O(columns) per run)
— the data was scanned once by the distributed profiler; evolution math
never touches it again. Trend slopes are closed-form least squares;
anomaly gating reuses the HistoryThresholdLearner formulas so "evolution
alert" and "learned suite violation" agree by construction.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any

from truthound_spark.profiler.table_profiler import ColumnProfile, TableProfile

# ---------------------------------------------------------------------------
# drift/change taxonomy (reference comparison.py:34-66, changes.py:15-44)
# ---------------------------------------------------------------------------

SEVERITIES = ("info", "warning", "critical")


@dataclass
class DriftResult:
    column: str | None
    drift_type: str
    severity: str
    old_value: Any
    new_value: Any
    change: float | None = None
    details: str = ""

    def to_dict(self) -> dict[str, Any]:
        return {
            "column": self.column,
            "drift_type": self.drift_type,
            "severity": self.severity,
            "old_value": self.old_value,
            "new_value": self.new_value,
            "change": self.change,
            "details": self.details,
        }


@dataclass
class DriftThresholds:
    """Relative-change gates (reference comparison.py:319-397)."""

    null_ratio_abs: float = 0.05
    distinct_rel: float = 0.30
    mean_sigmas: float = 3.0
    std_rel: float = 0.50
    row_count_rel: float = 0.30
    length_rel: float = 0.50
    rename_distinct_rel: float = 0.05
    rename_mean_sigmas: float = 1.0

    @classmethod
    def strict(cls) -> "DriftThresholds":
        return cls(
            null_ratio_abs=0.01,
            distinct_rel=0.10,
            mean_sigmas=2.0,
            std_rel=0.25,
            row_count_rel=0.10,
            length_rel=0.25,
        )

    @classmethod
    def loose(cls) -> "DriftThresholds":
        return cls(
            null_ratio_abs=0.10,
            distinct_rel=0.50,
            mean_sigmas=4.0,
            std_rel=1.00,
            row_count_rel=0.50,
            length_rel=1.00,
        )


@dataclass
class ProfileComparison:
    """reference comparison.py:168-316."""

    drifts: list[DriftResult] = field(default_factory=list)
    added_columns: list[str] = field(default_factory=list)
    removed_columns: list[str] = field(default_factory=list)
    renamed_columns: dict[str, str] = field(default_factory=dict)  # old -> new
    type_changes: dict[str, tuple[str, str]] = field(default_factory=dict)

    @property
    def has_drift(self) -> bool:
        return bool(self.drifts)

    @property
    def has_schema_changes(self) -> bool:
        return bool(
            self.added_columns or self.removed_columns or self.renamed_columns or self.type_changes
        )

    def get_by_severity(self, severity: str) -> list[DriftResult]:
        return [d for d in self.drifts if d.severity == severity]

    def get_by_type(self, drift_type: str) -> list[DriftResult]:
        return [d for d in self.drifts if d.drift_type == drift_type]

    @property
    def breaking(self) -> bool:
        """critical schema changes (reference changes.py ChangeSeverity):
        removed columns and type changes break readers; adds don't."""
        return bool(self.removed_columns or self.type_changes) or bool(
            self.get_by_severity("critical")
        )

    def to_dict(self) -> dict[str, Any]:
        return {
            "drifts": [d.to_dict() for d in self.drifts],
            "added_columns": self.added_columns,
            "removed_columns": self.removed_columns,
            "renamed_columns": self.renamed_columns,
            "type_changes": {k: list(v) for k, v in self.type_changes.items()},
            "breaking": self.breaking,
        }

    def to_report(self) -> str:
        lines = ["profile comparison:"]
        for c in self.added_columns:
            lines.append(f"  + column added: {c}")
        for c in self.removed_columns:
            lines.append(f"  - column removed: {c} [CRITICAL]")
        for old, new in self.renamed_columns.items():
            lines.append(f"  ~ column renamed: {old} -> {new}")
        for c, (a, b) in self.type_changes.items():
            lines.append(f"  ! type changed: {c} {a} -> {b} [CRITICAL]")
        for d in self.drifts:
            lines.append(
                f"  * {d.column or '<table>'}: {d.drift_type} "
                f"{d.old_value} -> {d.new_value} [{d.severity}]"
            )
        if len(lines) == 1:
            lines.append("  (no changes)")
        return "\n".join(lines)


# ---------------------------------------------------------------------------
# comparison
# ---------------------------------------------------------------------------


def _fingerprint_match(a: ColumnProfile, b: ColumnProfile, th: DriftThresholds) -> bool:
    """Rename heuristic (reference evolution/rename_detector.py): same
    dtype, null ratios within the abs gate, distinct counts within the
    rename gate, means within ±1σ for numerics."""
    if a.dtype != b.dtype:
        return False
    if abs(a.null_ratio - b.null_ratio) > th.null_ratio_abs:
        return False
    if a.distinct_count and b.distinct_count:
        rel = abs(a.distinct_count - b.distinct_count) / max(a.distinct_count, 1)
        if rel > th.rename_distinct_rel:
            return False
    if a.mean is not None and b.mean is not None:
        sigma = max(float(a.std or 0.0), 1e-12)
        if abs(float(a.mean) - float(b.mean)) > th.rename_mean_sigmas * sigma:
            return False
    return True


def _sev(change: float, gate: float) -> str:
    """warning at the gate, critical at 3× the gate."""
    return "critical" if change > 3 * gate else "warning"


def compare_profiles(
    old: TableProfile, new: TableProfile, thresholds: DriftThresholds | None = None
) -> ProfileComparison:
    """Stat + schema diff of two profile runs (reference
    comparison.py ProfileComparator.compare)."""
    th = thresholds or DriftThresholds()
    cmp = ProfileComparison()

    old_cols, new_cols = set(old.columns), set(new.columns)
    removed = sorted(old_cols - new_cols)
    added = sorted(new_cols - old_cols)

    # rename detection: pair removed/added by statistical fingerprint
    for oc in list(removed):
        for nc in list(added):
            if _fingerprint_match(old.columns[oc], new.columns[nc], th):
                cmp.renamed_columns[oc] = nc
                removed.remove(oc)
                added.remove(nc)
                break
    cmp.removed_columns = removed
    cmp.added_columns = added

    # table-level row count drift
    if old.row_count:
        rel = abs(new.row_count - old.row_count) / old.row_count
        if rel > th.row_count_rel:
            cmp.drifts.append(
                DriftResult(
                    column=None,
                    drift_type="row_count",
                    severity=_sev(rel, th.row_count_rel),
                    old_value=old.row_count,
                    new_value=new.row_count,
                    change=round(rel, 6),
                )
            )

    for name in sorted(old_cols & new_cols):
        a, b = old.columns[name], new.columns[name]
        if a.dtype != b.dtype:
            cmp.type_changes[name] = (a.dtype, b.dtype)
            continue
        # null ratio (absolute)
        d_null = abs(b.null_ratio - a.null_ratio)
        if d_null > th.null_ratio_abs:
            cmp.drifts.append(
                DriftResult(
                    column=name,
                    drift_type="null_ratio",
                    severity=_sev(d_null, th.null_ratio_abs),
                    old_value=a.null_ratio,
                    new_value=b.null_ratio,
                    change=round(d_null, 6),
                )
            )
        # distinct count (relative)
        if a.distinct_count:
            d_dis = abs(b.distinct_count - a.distinct_count) / a.distinct_count
            if d_dis > th.distinct_rel:
                cmp.drifts.append(
                    DriftResult(
                        column=name,
                        drift_type="distinct_count",
                        severity=_sev(d_dis, th.distinct_rel),
                        old_value=a.distinct_count,
                        new_value=b.distinct_count,
                        change=round(d_dis, 6),
                    )
                )
        # mean (in old-σ units) and std (relative)
        if a.mean is not None and b.mean is not None:
            sigma = float(a.std or 0.0)
            if sigma > 0:
                d_mean = abs(float(b.mean) - float(a.mean)) / sigma
                if d_mean > th.mean_sigmas:
                    cmp.drifts.append(
                        DriftResult(
                            column=name,
                            drift_type="mean",
                            severity=_sev(d_mean, th.mean_sigmas),
                            old_value=float(a.mean),
                            new_value=float(b.mean),
                            change=round(d_mean, 6),
                            details=f"{d_mean:.2f}σ shift",
                        )
                    )
            if a.std and b.std is not None:
                d_std = abs(float(b.std) - float(a.std)) / float(a.std)
                if d_std > th.std_rel:
                    cmp.drifts.append(
                        DriftResult(
                            column=name,
                            drift_type="std",
                            severity=_sev(d_std, th.std_rel),
                            old_value=float(a.std),
                            new_value=float(b.std),
                            change=round(d_std, 6),
                        )
                    )
        # avg string length (relative)
        if a.avg_length and b.avg_length is not None:
            d_len = abs(float(b.avg_length) - float(a.avg_length)) / float(a.avg_length)
            if d_len > th.length_rel:
                cmp.drifts.append(
                    DriftResult(
                        column=name,
                        drift_type="avg_length",
                        severity=_sev(d_len, th.length_rel),
                        old_value=float(a.avg_length),
                        new_value=float(b.avg_length),
                        change=round(d_len, 6),
                    )
                )
    return cmp


# ---------------------------------------------------------------------------
# evolution over a run history
# ---------------------------------------------------------------------------


@dataclass
class StatTrend:
    column: str
    stat: str
    slope: float
    values: list[float]

    @property
    def direction(self) -> str:
        if abs(self.slope) < 1e-12:
            return "stable"
        return "increasing" if self.slope > 0 else "decreasing"


class ProfileEvolution:
    """Profile-over-time watcher (reference profiler/evolution/
    history.py + watcher.py + detector.py): append runs, diff
    consecutive runs, fit per-stat trends, and gate new runs against the
    history band (shared formulas with HistoryThresholdLearner so alerts
    and learned-suite violations agree)."""

    STATS = ("null_ratio", "distinct_count", "mean", "std")

    def __init__(self, thresholds: DriftThresholds | None = None) -> None:
        self.thresholds = thresholds or DriftThresholds()
        self.history: list[TableProfile] = []

    def add(self, profile: TableProfile) -> ProfileComparison | None:
        """Append a run; returns the diff vs the previous run (None for
        the first)."""
        cmp = (
            compare_profiles(self.history[-1], profile, self.thresholds)
            if self.history
            else None
        )
        self.history.append(profile)
        return cmp

    def trend(self, column: str, stat: str = "mean") -> StatTrend:
        """Least-squares slope of a column stat across runs."""
        ys = []
        for p in self.history:
            cp = p.columns.get(column)
            v = getattr(cp, stat, None) if cp else None
            ys.append(float(v) if v is not None else math.nan)
        xs = [float(i) for i in range(len(ys))]
        pairs = [(x, y) for x, y in zip(xs, ys) if not math.isnan(y)]
        if len(pairs) < 2:
            return StatTrend(column=column, stat=stat, slope=0.0, values=ys)
        n = len(pairs)
        sx = sum(x for x, _ in pairs)
        sy = sum(y for _, y in pairs)
        sxx = sum(x * x for x, _ in pairs)
        sxy = sum(x * y for x, y in pairs)
        denom = n * sxx - sx * sx
        slope = (n * sxy - sx * sy) / denom if denom else 0.0
        return StatTrend(column=column, stat=stat, slope=slope, values=ys)

    def detect_anomalies(self, profile: TableProfile) -> list[DriftResult]:
        """Gate a candidate run against the learned history band WITHOUT
        appending it."""
        from truthound_spark.ml.auto_threshold import HistoryThresholdLearner

        if len(self.history) < 2:
            return []
        tt = HistoryThresholdLearner().learn(self.history)
        out: list[DriftResult] = []
        if not (tt.row_count_min <= profile.row_count <= tt.row_count_max):
            out.append(
                DriftResult(
                    column=None,
                    drift_type="row_count",
                    severity="critical",
                    old_value=[tt.row_count_min, tt.row_count_max],
                    new_value=profile.row_count,
                )
            )
        for name, th in tt.columns.items():
            cp = profile.columns.get(name)
            if cp is None:
                continue
            if th.null_ratio_max is not None and cp.null_ratio > th.null_ratio_max:
                out.append(
                    DriftResult(
                        column=name,
                        drift_type="null_ratio",
                        severity="critical",
                        old_value=th.null_ratio_max,
                        new_value=cp.null_ratio,
                    )
                )
            if (
                th.mean_min is not None
                and cp.mean is not None
                and not (th.mean_min <= float(cp.mean) <= th.mean_max)
            ):
                out.append(
                    DriftResult(
                        column=name,
                        drift_type="mean",
                        severity="critical",
                        old_value=[round(th.mean_min, 6), round(th.mean_max, 6)],
                        new_value=float(cp.mean),
                    )
                )
            if (
                th.min_value is not None
                and cp.min is not None
                and cp.mean is not None
                and (float(cp.min) < th.min_value or float(cp.max) > th.max_value)
            ):
                out.append(
                    DriftResult(
                        column=name,
                        drift_type="range",
                        severity="warning",
                        old_value=[round(th.min_value, 6), round(th.max_value, 6)],
                        new_value=[cp.min, cp.max],
                    )
                )
        return out
