"""Datetime validators (reference: src/truthound/validators/datetime/).

Freshness / range / format / coverage checks, all fused aggregates.
"""

from __future__ import annotations

import datetime as dt
from typing import Any

import pandas as pd  # noqa: F401 (pandas_udf type-hint resolution)

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from truthound_spark.core.base import (
    DATETIME_TYPES,
    ExpressionSpec,
    Validator,
    violation_count,
)
from truthound_spark.core.registry import register_validator
from truthound_spark.core.results import ValidationIssue
from truthound_spark.types import Severity, severity_from_ratio


@register_validator("date_between", category="datetime")
class DateBetweenValidator(Validator):
    """Date within [min,max] (reference: datetime/range.py:18)."""

    def __init__(self, column: str, min_date: str | None = None, max_date: str | None = None) -> None:
        self.column = column
        self.min_date = min_date
        self.max_date = max_date

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        col = F.col(self.column)
        pred = F.lit(False)
        if self.min_date is not None:
            pred = pred | (col < F.lit(self.min_date).cast("timestamp"))
        if self.max_date is not None:
            pred = pred | (col > F.lit(self.max_date).cast("timestamp"))
        pred = pred & col.isNotNull()
        return [
            ExpressionSpec(
                name="date_between",
                issue_type="date_out_of_range",
                column=self.column,
                count_expr=violation_count(pred),
                non_null_expr=F.count(col),
                filter_expr=pred,
                extra_exprs={"min": F.min(col).cast("string"), "max": F.max(col).cast("string")},
                expected=f"[{self.min_date}, {self.max_date}]",
            )
        ]


@register_validator("future_date", category="datetime")
class FutureDateValidator(Validator):
    """No dates in the future (reference: datetime/range.py:92).
    ``now`` injectable for deterministic tests/oracles."""

    def __init__(self, column: str, now: str | dt.datetime | None = None) -> None:
        self.column = column
        self.now = now

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        col = F.col(self.column)
        ref = F.lit(str(self.now)).cast("timestamp") if self.now else F.current_timestamp()
        pred = (col > ref) & col.isNotNull()
        return [
            ExpressionSpec(
                name="future_date",
                issue_type="future_date",
                column=self.column,
                count_expr=violation_count(pred),
                non_null_expr=F.count(col),
                filter_expr=pred,
                expected="no future dates",
            )
        ]


@register_validator("past_date", category="datetime")
class PastDateValidator(Validator):
    """No dates before a floor (reference: range.py:146)."""

    def __init__(self, column: str, floor: str = "1900-01-01") -> None:
        self.column = column
        self.floor = floor

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        col = F.col(self.column)
        pred = (col < F.lit(self.floor).cast("timestamp")) & col.isNotNull()
        return [
            ExpressionSpec(
                name="past_date",
                issue_type="ancient_date",
                column=self.column,
                count_expr=violation_count(pred),
                non_null_expr=F.count(col),
                filter_expr=pred,
                expected=f"dates >= {self.floor}",
            )
        ]


@register_validator("recent_data", category="datetime")
class RecentDataValidator(Validator):
    """max(ts) within freshness window (reference: datetime/freshness.py:14)."""

    def __init__(self, column: str, max_age_hours: float = 24.0, now: str | None = None) -> None:
        self.column = column
        self.max_age_hours = max_age_hours
        self.now = now

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        max_age = self.max_age_hours
        now = self.now

        def judge(m: dict[str, Any]) -> tuple[bool, Any, str]:
            latest = m.get("latest")
            if latest is None:
                return False, None, "no timestamps present"
            ref = dt.datetime.fromisoformat(now) if now else dt.datetime.now()
            if latest.tzinfo is not None:
                latest = latest.replace(tzinfo=None)
            age_h = (ref - latest).total_seconds() / 3600.0
            return age_h <= max_age, str(latest), f"latest record is {age_h:.1f}h old (> {max_age}h)"

        return [
            ExpressionSpec(
                name="recent_data",
                issue_type="stale_data",
                column=self.column,
                extra_exprs={"latest": F.max(F.col(self.column))},
                expected=f"data within {max_age}h",
                judge=judge,
                fixed_severity=Severity.HIGH,
            )
        ]


@register_validator("grouped_recent_data", category="datetime")
class GroupedRecentDataValidator(Validator):
    """max(ts) per group within window (reference: freshness.py:211).
    groupBy(g).agg(max(ts)) — one shuffle on the group key; violating
    groups counted distributively, only the count + samples collected."""

    def __init__(self, column: str, group_by: list[str], max_age_hours: float = 24.0, now: str | None = None) -> None:
        self.column = column
        self.group_by = group_by
        self.max_age_hours = max_age_hours
        self.now = now

    def validate(self, df: DataFrame, row_count: int | None = None) -> list[ValidationIssue]:
        ref = (
            F.lit(self.now).cast("timestamp") if self.now else F.current_timestamp()
        )
        cutoff = ref - F.expr(f"INTERVAL {int(self.max_age_hours * 3600)} SECOND")
        per_group = df.groupBy(*self.group_by).agg(F.max(self.column).alias("__latest"))
        stale = per_group.filter(F.col("__latest") < cutoff)
        n = stale.count()
        if n == 0:
            return []
        samples = [r.asDict() for r in stale.limit(10).collect()]
        return [
            ValidationIssue(
                column=self.column,
                issue_type="stale_groups",
                count=int(n),
                severity=Severity.HIGH,
                validator_name="grouped_recent_data",
                expected=f"every {self.group_by} group fresh within {self.max_age_hours}h",
                actual=int(n),
                details=f"{n} stale groups",
                sample_values=samples,
            )
        ]


@register_validator("date_format", category="datetime")
class DateFormatValidator(Validator):
    """String parses with given format (reference: datetime/format.py:17).
    Spark: try_to_timestamp stays JVM-side (no dateutil UDF needed for
    fixed formats)."""

    def __init__(self, column: str, fmt: str = "yyyy-MM-dd") -> None:
        self.column = column
        self.fmt = fmt

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        col = F.col(self.column)
        parsed = F.try_to_timestamp(col, F.lit(self.fmt))
        pred = parsed.isNull() & col.isNotNull()
        return [
            ExpressionSpec(
                name="date_format",
                issue_type="unparseable_date",
                column=self.column,
                count_expr=violation_count(pred),
                non_null_expr=F.count(col),
                filter_expr=pred,
                expected=f"parseable as {self.fmt}",
            )
        ]


@register_validator("date_order", category="datetime")
class DateOrderValidator(Validator):
    """Column A <= column B per row (reference: datetime/order.py:13)."""

    def __init__(self, earlier: str, later: str) -> None:
        self.earlier = earlier
        self.later = later

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        pred = (F.col(self.earlier) > F.col(self.later)) & F.col(self.earlier).isNotNull() & F.col(self.later).isNotNull()
        return [
            ExpressionSpec(
                name="date_order",
                issue_type="date_order_violation",
                column=f"{self.earlier},{self.later}",
                count_expr=violation_count(pred),
                non_null_expr=F.count(F.lit(1)),
                filter_expr=pred,
                expected=f"{self.earlier} <= {self.later}",
            )
        ]


@register_validator("datepart_coverage", category="datetime")
class DatePartCoverageValidator(Validator):
    """All expected date-parts present (reference: freshness.py:98),
    e.g. every weekday 1-7 appears. collect_set of a tiny domain — bounded."""

    PARTS = {"dayofweek": F.dayofweek, "month": F.month, "hour": F.hour}

    def __init__(self, column: str, part: str = "dayofweek", expected: list[int] | None = None) -> None:
        self.column = column
        self.part = part
        self.expected = expected or (list(range(1, 8)) if part == "dayofweek" else list(range(1, 13)))

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        fn = self.PARTS[self.part]
        exp = set(self.expected)

        def judge(m: dict[str, Any]) -> tuple[bool, Any, str]:
            observed = set(m.get("parts") or [])
            missing = exp - observed
            return not missing, sorted(observed), f"missing {self.part} values {sorted(missing)}"

        return [
            ExpressionSpec(
                name="datepart_coverage",
                issue_type="datepart_gap",
                column=self.column,
                extra_exprs={"parts": F.collect_set(fn(F.col(self.column)))},
                expected=sorted(exp),
                judge=judge,
            )
        ]


@register_validator("timezone_consistent", category="datetime")
class TimezoneValidator(Validator):
    """Tz-awareness consistency (reference: datetime/timezone.py:13).
    Spark timestamps are UTC-normalized — mapped to a dtype check
    (TimestampType = tz-aware instant vs TimestampNTZType = naive)."""

    def __init__(self, column: str, require_aware: bool = True) -> None:
        self.column = column
        self.require_aware = require_aware

    def validate(self, df: DataFrame, row_count: int | None = None) -> list[ValidationIssue]:
        import pyspark.sql.types as T

        field = df.schema[self.column]
        is_aware = isinstance(field.dataType, T.TimestampType)
        ok = is_aware if self.require_aware else not is_aware
        if ok:
            return []
        return [
            ValidationIssue(
                column=self.column,
                issue_type="timezone_mismatch",
                count=1,
                severity=Severity.LOW,
                validator_name="timezone_consistent",
                expected="tz-aware (TimestampType)" if self.require_aware else "naive (TimestampNTZ)",
                actual=str(field.dataType),
                details="timestamp tz-awareness does not match requirement",
            )
        ]


@register_validator("dateutil_parseable", category="datetime")
class DateutilParseableValidator(Validator):
    """Flexible date parsing (reference: datetime/parseable.py:14 uses
    dateutil). Spark-first: an Arrow-batched pandas UDF over pd.to_datetime
    (format='mixed') — the sanctioned vectorized path for genuinely
    non-relational parsing; everything around it stays JVM-side."""

    def __init__(self, column: str) -> None:
        self.column = column

    def validate(self, df: DataFrame, row_count: int | None = None) -> list[ValidationIssue]:
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("boolean")
        def parseable(s: pd.Series) -> pd.Series:
            return pd.to_datetime(s, errors="coerce", format="mixed").notna()

        col = F.col(self.column)
        pred = ~parseable(col) & col.isNotNull()
        n = df.agg(
            F.sum(F.when(pred, 1).otherwise(0)).cast("long").alias("n"),
            F.count(col).alias("nn"),
        ).collect()[0]
        if not n["n"]:
            return []
        ratio = n["n"] / n["nn"] if n["nn"] else 0.0
        return [
            ValidationIssue(
                column=self.column,
                issue_type="unparseable_dates",
                count=int(n["n"]),
                severity=severity_from_ratio(ratio),
                validator_name="dateutil_parseable",
                expected="flexibly parseable date strings",
                actual=int(n["n"]),
                details=f"{n['n']} unparseable values ({ratio:.2%})",
            )
        ]
