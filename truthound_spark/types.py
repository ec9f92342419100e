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

    @classmethod
    def from_string(cls, value: str) -> "ResultFormat":
        try:
            return cls[value.upper()]
        except KeyError:
            valid = ", ".join(m.name for m in cls)
            raise ValueError(
                f"Invalid result_format: {value!r}. Must be one of: {valid}"
            ) from None


@dataclass(frozen=True)
class ResultFormatConfig:
    """Fine-grained control over result detail (reference: types.py:95-174).

    Extends the ResultFormat ladder with knobs the enum alone cannot
    express — e.g. capping returned failure rows even at COMPLETE, or
    pulling full rows at a lower level. Frozen for thread safety.

    * ``partial_unexpected_count`` — size of the sample-values list
      (BASIC+) and the value-frequency list (SUMMARY+).
    * ``include_unexpected_rows`` — force full-row evidence below
      COMPLETE.
    * ``max_unexpected_rows`` — cap on collected failure rows.
    * ``include_unexpected_index`` — attach a ``__row_index`` column to
      unexpected rows. Spark note: the id is partition-encoded
      (monotonically_increasing_id) — unique and ordered within a
      partition, not a global row position like the reference's
      single-node index.
    * ``return_debug_query`` — attach the violation predicate's compiled
      expression text for debugging.
    """

    format: ResultFormat = ResultFormat.SUMMARY
    partial_unexpected_count: int = 20
    include_unexpected_rows: bool = False
    max_unexpected_rows: int = 1000
    include_unexpected_index: bool = False
    return_debug_query: bool = False

    def __post_init__(self) -> None:
        if self.partial_unexpected_count < 0:
            raise ValueError(
                f"partial_unexpected_count must be >= 0, got {self.partial_unexpected_count}"
            )
        if self.max_unexpected_rows < 1:
            raise ValueError(
                f"max_unexpected_rows must be >= 1, got {self.max_unexpected_rows}"
            )

    # -- what to include at each level (reference types.py:124-141) --
    def includes_observed_value(self) -> bool:
        return self.format >= ResultFormat.BASIC

    def includes_unexpected_samples(self) -> bool:
        return self.format >= ResultFormat.BASIC

    def includes_unexpected_counts(self) -> bool:
        return self.format >= ResultFormat.SUMMARY

    def includes_full_results(self) -> bool:
        return self.format >= ResultFormat.COMPLETE or self.include_unexpected_rows

    # -- factory helpers (reference types.py:143-174) --
    def replace(self, **kwargs: Any) -> "ResultFormatConfig":
        from dataclasses import asdict

        current = asdict(self)
        current.update(kwargs)
        if isinstance(current.get("format"), str):
            current["format"] = ResultFormat.from_string(current["format"])
        return ResultFormatConfig(**current)

    @classmethod
    def from_any(
        cls, value: "str | ResultFormat | ResultFormatConfig | None"
    ) -> "ResultFormatConfig":
        if value is None:
            return cls()
        if isinstance(value, ResultFormatConfig):
            return value
        if isinstance(value, ResultFormat):
            return cls(format=value)
        if isinstance(value, str):
            return cls(format=ResultFormat.from_string(value))
        raise TypeError(
            f"Cannot convert {type(value).__name__} to ResultFormatConfig. "
            "Expected str, ResultFormat, ResultFormatConfig, or None."
        )


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
