"""ValidationIssue + run-level result containers.

Mirrors reference result model (src/truthound/validators/base.py:787-878
ValidationIssue; src/truthound/core/results.py:95-318 ValidationRunResult)
as engine-agnostic dataclasses.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any

from truthound_spark.types import Severity, ValidationDetail


@dataclass
class ValidationIssue:
    """One failed (or errored) check (reference: validators/base.py:787-878)."""

    column: str | None
    issue_type: str
    count: int
    severity: Severity
    validator_name: str
    success: bool = False
    expected: Any = None
    actual: Any = None
    details: str = ""
    sample_values: list[Any] = field(default_factory=list)
    result: ValidationDetail | None = None
    exception_info: dict[str, Any] | None = None

    def to_dict(self) -> dict[str, Any]:
        return {
            "column": self.column,
            "issue_type": self.issue_type,
            "count": self.count,
            "severity": str(self.severity),
            "validator_name": self.validator_name,
            "success": self.success,
            "expected": self.expected,
            "actual": self.actual,
            "details": self.details,
            "sample_values": self.sample_values,
            "result": self.result.to_dict() if self.result else None,
            "exception_info": self.exception_info,
        }


@dataclass
class ValidationRunResult:
    """Run-level aggregate (reference: core/results.py:95-318)."""

    issues: list[ValidationIssue] = field(default_factory=list)
    execution_issues: list[ValidationIssue] = field(default_factory=list)
    source: str = ""
    row_count: int = 0
    column_count: int = 0
    execution_mode: str = "batched"
    checks_run: int = 0
    metadata: dict[str, Any] = field(default_factory=dict)

    @property
    def success(self) -> bool:
        return not self.issues and not self.execution_issues

    def filter_by_severity(self, min_severity: Severity) -> list[ValidationIssue]:
        return [i for i in self.issues if i.severity >= min_severity]

    def to_dict(self) -> dict[str, Any]:
        return {
            "success": self.success,
            "source": self.source,
            "row_count": self.row_count,
            "column_count": self.column_count,
            "execution_mode": self.execution_mode,
            "checks_run": self.checks_run,
            "issue_count": len(self.issues),
            "issues": [i.to_dict() for i in self.issues],
            "execution_issues": [i.to_dict() for i in self.execution_issues],
            "metadata": self.metadata,
        }

    def to_json(self, indent: int | None = None) -> str:
        return json.dumps(self.to_dict(), indent=indent, default=str)
