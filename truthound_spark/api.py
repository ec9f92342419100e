"""Public API: th.check / th.learn / th.profile / th.scan / th.mask.

Mirrors the reference entry points (src/truthound/api.py): the check
lifecycle is context → asset → suite synthesis → plan → execute → result
(reference api.py:97-147, SURVEY §3.1). Execution stage 5 is replaced by the
fused single-aggregation BatchExpressionExecutor.
"""

from __future__ import annotations

from typing import Any, Iterable

from pyspark.sql import DataFrame, SparkSession

from truthound_spark.adapters import get_spark, to_dataframe
from truthound_spark.core.executor import BatchExpressionExecutor
from truthound_spark.core.registry import resolve
from truthound_spark.core.results import ValidationRunResult
from truthound_spark.types import ResultFormat, Severity

# ensure all built-ins are registered
import truthound_spark.validators  # noqa: F401  (registration side effect)


def _auto_suite(df: DataFrame) -> list[object]:
    """Zero-config suite (reference: core/suite.py:438-578 AutoSuiteBuilder).

    Deterministic rules ported from suite.py:512-578: always `null`; `range`
    (observed min/max fences widened) is deferred to learned baselines —
    without one we emit null + duplicate + format + key-like unique checks.
    """
    from truthound_spark.core.base import NUMERIC_TYPES, STRING_TYPES
    from truthound_spark.validators.completeness import NullValidator
    from truthound_spark.validators.string import FormatValidator
    from truthound_spark.validators.uniqueness import UniqueValidator

    suite: list[object] = [NullValidator()]
    key_patterns = ("id", "key", "uuid", "guid", "email", "code", "slug")
    key_like = [
        f.name
        for f in df.schema.fields
        if any(p in f.name.lower() for p in key_patterns)
        and f.name.lower().endswith(("id", "key", "uuid", "guid", "code", "slug"))
    ]
    if key_like:
        suite.append(UniqueValidator(columns=key_like[:1]))
    suite.append(FormatValidator())
    return suite


def check(
    data: Any,
    validators: Iterable[Any] | None = None,
    spark: SparkSession | None = None,
    result_format: ResultFormat | str = ResultFormat.BOOLEAN_ONLY,
    min_severity: Severity | None = None,
    cache: bool = False,
) -> ValidationRunResult:
    """Validate ``data`` and return a ValidationRunResult.

    ``validators``: names / classes / instances; None → auto-suite.
    ``cache``: persist the DataFrame when evidence phases will re-scan it.
    """
    df = to_dataframe(data, spark)
    if isinstance(result_format, str):
        result_format = ResultFormat[result_format.upper()]
    vs = resolve(validators) if validators is not None else _auto_suite(df)
    cached = cache or result_format >= ResultFormat.BASIC
    if cached:
        df = df.cache()

    # split: spec-compiled validators run fused; the rest run standalone
    from truthound_spark.core.base import Validator as _V

    spec_validators = [v for v in vs if type(v).validate is _V.validate]
    other_validators = [v for v in vs if type(v).validate is not _V.validate]

    try:
        executor = BatchExpressionExecutor(spec_validators, result_format=result_format)
        issues, stats = executor.execute_with_stats(df)
        for v in other_validators:
            try:
                issues.extend(v.validate(df, row_count=stats["row_count"]))
            except Exception as exc:
                from truthound_spark.core.results import ValidationIssue

                issues.append(
                    ValidationIssue(
                        column=None,
                        issue_type="execution_error",
                        count=0,
                        severity=Severity.HIGH,
                        validator_name=getattr(v, "name", type(v).__name__),
                        details=str(exc),
                        exception_info={"type": type(exc).__name__, "message": str(exc)},
                    )
                )
    finally:
        if cached:
            # evidence phases are done — release cached partitions so
            # repeated check() calls don't leak storage in long sessions
            df.unpersist(blocking=True)

    if min_severity is not None:
        issues = [i for i in issues if i.severity >= min_severity or i.issue_type == "execution_error"]

    exec_issues = [i for i in issues if i.issue_type == "execution_error"]
    real_issues = [i for i in issues if i.issue_type != "execution_error"]
    return ValidationRunResult(
        issues=real_issues,
        execution_issues=exec_issues,
        source="dataframe",
        row_count=stats["row_count"],
        column_count=len(df.columns),
        execution_mode="batched",
        checks_run=stats["checks"] + len(other_validators),
    )


__all__ = ["check", "get_spark"]
