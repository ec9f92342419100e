"""Resilience policies around validator execution (reference:
validators/resilience_bridge.py ValidationResiliencePolicy,
common/resilience/{retry,circuit_breaker}.py, validators/timeout/
{deadline,degradation}.py).

Spark-first stance: transient-failure retry and circuit-breaking are
DRIVER-side concerns (a Spark action either returns or raises after its
own task-level retries — ``spark.task.maxFailures`` already handles
executor flakiness). What belongs here is the layer above: retrying a
whole validator's job on transient driver/cluster errors, refusing to
hammer a failing dependency, and degrading a suite gracefully when a
wall-clock budget runs out.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Callable

from truthound_spark.core.results import ValidationIssue
from truthound_spark.types import Severity


@dataclass
class RetryPolicy:
    """Exponential-backoff retry (reference: common/resilience/retry)."""

    max_attempts: int = 3
    base_delay: float = 0.5
    backoff: float = 2.0
    retryable: tuple[type[BaseException], ...] = (Exception,)

    def __post_init__(self) -> None:
        if self.max_attempts < 1:
            raise ValueError(
                f"max_attempts must be >= 1 (got {self.max_attempts}); "
                "1 means 'no retries', not 0"
            )

    def execute(self, fn: Callable[[], Any]) -> Any:
        delay = self.base_delay
        for attempt in range(1, self.max_attempts + 1):
            try:
                return fn()
            except self.retryable:
                if attempt == self.max_attempts:
                    raise
                time.sleep(delay)
                delay *= self.backoff


@dataclass
class CircuitBreaker:
    """Open after ``failure_threshold`` consecutive failures; half-open
    after ``reset_seconds`` (reference: common/resilience/circuit_breaker)."""

    failure_threshold: int = 5
    reset_seconds: float = 60.0
    _failures: int = field(default=0, init=False)
    _opened_at: float | None = field(default=None, init=False)

    @property
    def state(self) -> str:
        if self._opened_at is None:
            return "closed"
        if time.time() - self._opened_at >= self.reset_seconds:
            return "half_open"
        return "open"

    def execute(self, fn: Callable[[], Any]) -> Any:
        if self.state == "open":
            raise RuntimeError("circuit breaker open: dependency failing")
        try:
            out = fn()
        except Exception:
            self._failures += 1
            if self._failures >= self.failure_threshold:
                self._opened_at = time.time()
            raise
        self._failures = 0
        self._opened_at = None
        return out


class SuiteDeadline:
    """Graceful degradation under a wall-clock budget (reference:
    validators/timeout/{deadline,degradation}.py).

    Wraps a list of validators: each is run while budget remains; once the
    deadline passes, remaining validators are SKIPPED with a LOW-severity
    'skipped_deadline' issue instead of silently vanishing — the suite
    result stays honest about what did not run."""

    def __init__(self, budget_seconds: float) -> None:
        self.budget_seconds = budget_seconds

    def run(self, df, validators: list[Any]) -> list[ValidationIssue]:
        t0 = time.time()
        issues: list[ValidationIssue] = []
        for v in validators:
            if time.time() - t0 > self.budget_seconds:
                issues.append(
                    ValidationIssue(
                        column=None,
                        issue_type="skipped_deadline",
                        count=0,
                        severity=Severity.LOW,
                        validator_name=getattr(v, "name", type(v).__name__),
                        expected=f"run within {self.budget_seconds}s suite budget",
                        actual="skipped",
                        details="suite wall-clock budget exhausted before this validator",
                    )
                )
                continue
            issues.extend(v.validate(df) if hasattr(v, "validate") else [])
        return issues


@dataclass
class ValidationResiliencePolicy:
    """Composition: retry inside a circuit breaker (reference:
    resilience_bridge.py create_default_policy)."""

    retry: RetryPolicy = field(default_factory=RetryPolicy)
    breaker: CircuitBreaker = field(default_factory=CircuitBreaker)

    def execute(self, validator: Any, df) -> list[ValidationIssue]:
        return self.breaker.execute(lambda: self.retry.execute(lambda: validator.validate(df)))


def create_default_policy() -> ValidationResiliencePolicy:
    return ValidationResiliencePolicy()
