"""Result-model primitives: Severity, ResultFormat, ValidationDetail.

Engine-agnostic dataclasses mirroring the reference's result model
(reference: src/truthound/types.py:18-280). Pure Python — no Spark imports.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field
from typing import Any


class Severity(enum.IntEnum):
    """Issue severity with total ordering (reference: types.py:18-40)."""

    LOW = 1
    MEDIUM = 2
    HIGH = 3
    CRITICAL = 4

    def __str__(self) -> str:  # pragma: no cover - trivial
        return self.name.lower()


#: Default failure-ratio → severity thresholds
#: (reference: validators/base.py:2281-2306, defaults at base.py:1796).
SEVERITY_RATIO_THRESHOLDS: tuple[tuple[float, Severity], ...] = (
    (0.5, Severity.CRITICAL),
    (0.2, Severity.HIGH),
    (0.05, Severity.MEDIUM),
)


def severity_from_ratio(
    ratio: float,
    thresholds: tuple[tuple[float, Severity], ...] = SEVERITY_RATIO_THRESHOLDS,
) -> Severity:
    """Map a violation ratio to a Severity (reference: base.py:2281-2306)."""
    for cutoff, sev in thresholds:
        if ratio > cutoff:
            return sev
    return Severity.LOW


class ResultFormat(enum.IntEnum):
    """4-level evidence ladder (reference: types.py:51-92).

    BOOLEAN_ONLY: pass/fail + counts only (phase 1 aggregate).
    BASIC: + sample unexpected values (phase 2 filter+limit).
    SUMMARY: + value-frequency counts of unexpected values (phase 3).
    COMPLETE: + full unexpected rows, bounded (phase 4).
    """

    BOOLEAN_ONLY = 0
    BASIC = 1
    SUMMARY = 2
    COMPLETE = 3


@dataclass
class ValidationDetail:
    """GX-style result payload (reference: types.py:182-280)."""

    element_count: int = 0
    missing_count: int = 0
    unexpected_count: int = 0
    unexpected_percent: float = 0.0
    observed_value: Any = None
    partial_unexpected_list: list[Any] = field(default_factory=list)
    partial_unexpected_counts: list[dict[str, Any]] = field(default_factory=list)
    unexpected_rows: list[dict[str, Any]] = field(default_factory=list)
    debug_query: str | None = None

    def to_dict(self) -> dict[str, Any]:
        return {
            "element_count": self.element_count,
            "missing_count": self.missing_count,
            "unexpected_count": self.unexpected_count,
            "unexpected_percent": self.unexpected_percent,
            "observed_value": self.observed_value,
            "partial_unexpected_list": self.partial_unexpected_list,
            "partial_unexpected_counts": self.partial_unexpected_counts,
            "unexpected_rows": self.unexpected_rows,
            "debug_query": self.debug_query,
        }
