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


def _auto_suite(df: DataFrame, baseline=None) -> list[object]:
    """Zero-config suite (reference: core/suite.py:438-578 AutoSuiteBuilder).

    Deterministic rules ported from suite.py:512-578: always ``null``;
    with a learned baseline (``baseline`` Schema, or one learned on the
    spot when ``learn=True`` is passed to check()):
      * ``type``  — mixed-type smell for string columns,
      * ``range`` — numeric columns fenced at the learned min/max widened
        by 3σ (suite.py:530-545 widening rule),
      * ``unique`` — key-like columns: learned unique==True, or
        unique_ratio ≥ 0.98 + name patterns (id/key/uuid/guid/email/
        code/slug — suite.py:552-571).
    Without a baseline: null + key-name-pattern unique + format.
    """
    from truthound_spark.core.base import STRING_TYPES
    from truthound_spark.validators.aggregate import MixedTypeValidator
    from truthound_spark.validators.completeness import NullValidator
    from truthound_spark.validators.distribution import RangeValidator
    from truthound_spark.validators.string import FormatValidator
    from truthound_spark.validators.uniqueness import UniqueValidator

    suite: list[object] = [NullValidator()]
    key_patterns = ("id", "key", "uuid", "guid", "email", "code", "slug")

    if baseline is not None:
        unique_cols: list[str] = []
        for name, cs in baseline.columns.items():
            if name not in df.columns:
                continue
            if cs.dtype == "string":
                suite.append(MixedTypeValidator(name))
            if cs.min_value is not None and cs.max_value is not None and cs.mean is not None:
                pad = 3.0 * float(cs.std or 0.0)
                # float() — learn() yields decimal.Decimal for DecimalType
                # columns, and Decimal - float raises TypeError
                suite.append(
                    RangeValidator(
                        name, float(cs.min_value) - pad, float(cs.max_value) + pad
                    )
                )
            key_named = any(p in name.lower() for p in key_patterns)
            if cs.unique or (cs.unique_ratio >= 0.98 and key_named):
                unique_cols.append(name)
        if unique_cols:
            suite.append(UniqueValidator(columns=unique_cols))
        suite.append(FormatValidator())
        return suite

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
    result_format: "ResultFormat | str | Any" = ResultFormat.BOOLEAN_ONLY,
    min_severity: Severity | None = None,
    cache: bool = False,
    baseline=None,
    learn: bool = False,
    lineage=None,
    asset: str | None = None,
) -> ValidationRunResult:
    """Validate ``data`` and return a ValidationRunResult.

    ``validators``: names / classes / instances; None → auto-suite.
    ``baseline``: a learned Schema driving type/range/unique auto-checks
    (reference core/suite.py:496-578); ``learn=True`` learns one from the
    data first (reference AutoSuiteBuilder fallback, suite.py:496-510).
    ``cache``: persist the DataFrame when evidence phases will re-scan it.
    """
    df = to_dataframe(data, spark)
    from truthound_spark.types import ResultFormatConfig

    format_config = ResultFormatConfig.from_any(result_format)
    result_format = format_config.format
    if validators is None and baseline is None and learn:
        from truthound_spark.schema import learn as learn_schema

        baseline = learn_schema(df)
    vs = resolve(validators) if validators is not None else _auto_suite(df, baseline)
    # respect a caller-established cache: if the frame is already
    # persisted, caching is a no-op and unpersisting would destroy the
    # CALLER's cache — so only manage the lifecycle we created ourselves
    cached = (
        cache
        or result_format >= ResultFormat.BASIC
        or format_config.include_unexpected_rows
    ) and not df.is_cached
    if cached:
        df = df.cache()

    # split: spec-compiled validators run fused; the rest run standalone
    from truthound_spark.core.base import Validator as _V

    spec_validators = [v for v in vs if type(v).validate is _V.validate]
    other_validators = [v for v in vs if type(v).validate is not _V.validate]

    try:
        executor = BatchExpressionExecutor(spec_validators, result_format=format_config)
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
    result = ValidationRunResult(
        issues=real_issues,
        execution_issues=exec_issues,
        source="dataframe",
        row_count=stats["row_count"],
        column_count=len(df.columns),
        execution_mode="batched",
        checks_run=stats["checks"] + len(other_validators),
    )
    if lineage is not None:
        # record the run into the lineage graph (reference
        # lineage/tracker.py:248 track_validation): validator names +
        # the union of columns they target, so impact_of_column can
        # answer blast-radius queries later
        touched: set[str] = set()
        for v in vs:
            cols = getattr(v, "columns", None) or []
            one = getattr(v, "column", None)
            for c in list(cols) + ([one] if isinstance(one, str) else []):
                if isinstance(c, str) and c in df.columns:
                    touched.add(c)
        lineage.track_validation(
            asset=asset or "dataframe",
            validators=[getattr(v, "name", type(v).__name__) for v in vs],
            columns=touched,
            success=result.success,
            issue_count=len(real_issues),
        )
    return result


__all__ = ["check", "get_spark"]
