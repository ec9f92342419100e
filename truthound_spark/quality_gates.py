"""Quality gates: project a validation run into a deterministic
pass / warn / block decision for CI-CD and orchestration.

Reference: _datasets/gates.py — QualityGateDisposition (:30),
QualityGatePolicy (:37) with per-severity / per-validator /
per-issue-type disposition maps resolved most-specific-first (:101),
``evaluate_quality_gate`` (:193) projecting a ValidationRunResult into
a QualityGateResult with blocking failures, warnings, informational
counts, an empty-check-set guard, and a deterministic status. This is
the piece between ``check()`` and a deploy pipeline: the POLICY — not
the caller's ad-hoc ifs — decides which issues block a promotion,
which warn, and which are informational.

Pure driver-side policy math over the run result (O(issues)); nothing
touches the data again."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Mapping

from truthound_spark.types import Severity

DISPOSITIONS = ("blocking", "warning", "informational")
STATUSES = ("passed", "warning", "blocked", "errored", "skipped")


def _coerce_disposition(value: str) -> str:
    v = str(value).lower()
    if v not in DISPOSITIONS:
        raise ValueError(f"disposition must be one of {DISPOSITIONS}, got {value!r}")
    return v


def _norm_sev(key: Any) -> str:
    if isinstance(key, Severity):
        return key.name.lower()
    return str(key).lower()


@dataclass(frozen=True)
class QualityGatePolicy:
    """How issues classify (reference gates.py:37). Resolution order is
    most-specific-first: validator > issue_type > severity > default
    (the reference's check-level tier folds into validator here — this
    engine's run result identifies issues by validator_name)."""

    default_issue_disposition: str = "blocking"
    severity_dispositions: Mapping[Any, str] = field(default_factory=dict)
    validator_dispositions: Mapping[str, str] = field(default_factory=dict)
    issue_type_dispositions: Mapping[str, str] = field(default_factory=dict)
    execution_issue_disposition: str = "blocking"
    allow_empty_checks: bool = False

    def __post_init__(self) -> None:
        object.__setattr__(
            self,
            "default_issue_disposition",
            _coerce_disposition(self.default_issue_disposition),
        )
        object.__setattr__(
            self,
            "severity_dispositions",
            {_norm_sev(k): _coerce_disposition(v) for k, v in self.severity_dispositions.items()},
        )
        object.__setattr__(
            self,
            "validator_dispositions",
            {
                str(k).lower(): _coerce_disposition(v)
                for k, v in self.validator_dispositions.items()
            },
        )
        object.__setattr__(
            self,
            "issue_type_dispositions",
            {
                str(k).lower(): _coerce_disposition(v)
                for k, v in self.issue_type_dispositions.items()
            },
        )
        object.__setattr__(
            self,
            "execution_issue_disposition",
            _coerce_disposition(self.execution_issue_disposition),
        )

    def disposition_for_issue(self, issue: Any) -> str:
        """validator > issue_type > severity > default (gates.py:101)."""
        if issue.validator_name:
            d = self.validator_dispositions.get(issue.validator_name.lower())
            if d is not None:
                return d
        d = self.issue_type_dispositions.get(str(issue.issue_type).lower())
        if d is not None:
            return d
        d = self.severity_dispositions.get(_norm_sev(issue.severity))
        if d is not None:
            return d
        return self.default_issue_disposition


@dataclass
class QualityGateResult:
    """reference gates.py QualityGateResult shape (deterministic — the
    same run + policy always projects identically)."""

    gate_id: str
    status: str
    blocking_failures: list[dict[str, Any]]
    warnings: list[dict[str, Any]]
    informational_count: int
    summary: dict[str, Any]
    metadata: dict[str, Any] = field(default_factory=dict)

    @property
    def passed(self) -> bool:
        return self.status in ("passed", "warning", "skipped")

    def to_dict(self) -> dict[str, Any]:
        return {
            "gate_id": self.gate_id,
            "status": self.status,
            "passed": self.passed,
            "blocking_failures": self.blocking_failures,
            "warnings": self.warnings,
            "informational_count": self.informational_count,
            "summary": self.summary,
            "metadata": self.metadata,
        }


def _issue_item(issue: Any, disposition: str) -> dict[str, Any]:
    return {
        "source": "validation",
        "validator": issue.validator_name,
        "issue_type": issue.issue_type,
        "column": issue.column,
        "count": issue.count,
        "severity": str(issue.severity),
        "disposition": disposition,
    }


def evaluate_quality_gate(
    run_result: Any,
    gate_id: str = "gate",
    policy: QualityGatePolicy | None = None,
    skip_reason: str | None = None,
) -> QualityGateResult:
    """ValidationRunResult → QualityGateResult (reference gates.py:193).

    Status ladder: skipped (explicit reason) → errored (blocking
    execution issues or an empty check set without allow_empty_checks)
    → blocked (any blocking validation failure) → warning → passed."""
    pol = policy or QualityGatePolicy()
    if skip_reason:
        return QualityGateResult(
            gate_id=gate_id,
            status="skipped",
            blocking_failures=[],
            warnings=[],
            informational_count=0,
            summary={"skipped": True, "skip_reason": skip_reason},
            metadata={"skip_reason": skip_reason},
        )

    blocking: list[dict[str, Any]] = []
    warnings: list[dict[str, Any]] = []
    informational = 0
    for issue in run_result.issues:
        d = pol.disposition_for_issue(issue)
        item = _issue_item(issue, d)
        if d == "blocking":
            blocking.append(item)
        elif d == "warning":
            warnings.append(item)
        else:
            informational += 1

    blocking_execution = 0
    for ex in run_result.execution_issues:
        d = pol.execution_issue_disposition
        item = {
            "source": "execution",
            "validator": ex.validator_name,
            "issue_type": ex.issue_type,
            "details": ex.details,
            "disposition": d,
        }
        if d == "blocking":
            blocking_execution += 1
            blocking.append(item)
        elif d == "warning":
            warnings.append(item)
        else:
            informational += 1

    empty_check_error = 0
    if run_result.checks_run == 0 and not pol.allow_empty_checks:
        empty_check_error = 1
        blocking.append(
            {
                "source": "gate_policy",
                "reason": "empty_check_set",
                "disposition": "blocking",
            }
        )

    if blocking_execution or empty_check_error:
        status = "errored"
    elif blocking:
        status = "blocked"
    elif warnings:
        status = "warning"
    else:
        status = "passed"
    return QualityGateResult(
        gate_id=gate_id,
        status=status,
        blocking_failures=blocking,
        warnings=warnings,
        informational_count=informational,
        summary={
            "row_count": run_result.row_count,
            "checks_run": run_result.checks_run,
            "issue_count": len(run_result.issues),
            "blocking_count": len(blocking),
            "warning_count": len(warnings),
            "informational_count": informational,
            "error_count": blocking_execution + empty_check_error,
            "skipped": False,
        },
        metadata={
            "policy": {
                "default": pol.default_issue_disposition,
                "allow_empty_checks": pol.allow_empty_checks,
            }
        },
    )


def gate_check(
    data: Any,
    validators: Any = None,
    gate_id: str = "gate",
    policy: QualityGatePolicy | None = None,
    **check_kwargs: Any,
) -> QualityGateResult:
    """check() + gate projection in one call — the CI entrypoint
    (exit-code discipline belongs to the caller: ``0 if result.passed
    else 1``)."""
    from truthound_spark import api

    result = api.check(data, validators=validators, **check_kwargs)
    return evaluate_quality_gate(result, gate_id=gate_id, policy=policy)
