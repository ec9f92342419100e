"""Time-series validators (reference: src/truthound/validators/timeseries/).

Spark DataFrames are unordered (SURVEY §7 hard-part 1): every sequential
check takes an explicit timestamp/order column and computes diffs with a
lag window. For per-key series pass ``partition_by`` — the window then
shuffles once on the key and sorts within partitions (scalable); a global
un-partitioned window is only advisable on pre-aggregated/small frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from truthound_spark.core.base import Validator
from truthound_spark.core.registry import register_validator
from truthound_spark.core.results import ValidationIssue
from truthound_spark.types import Severity, severity_from_ratio


def _lag_window(order_by: list[str], partition_by: list[str] | None):
    w = Window.orderBy(*[F.col(c) for c in order_by])
    if partition_by:
        w = Window.partitionBy(*partition_by).orderBy(*[F.col(c) for c in order_by])
    return w


@register_validator("timeseries_gap", category="timeseries")
class TimeSeriesGapValidator(Validator):
    """Gaps larger than max_gap between consecutive timestamps
    (reference: timeseries/gap.py:23)."""

    def __init__(
        self,
        column: str,
        max_gap_seconds: float,
        partition_by: list[str] | None = None,
        tiebreak: str | None = None,
    ) -> None:
        self.column = column
        self.max_gap_seconds = max_gap_seconds
        self.partition_by = partition_by
        self.tiebreak = tiebreak

    def validate(self, df: DataFrame, row_count: int | None = None) -> list[ValidationIssue]:
        order = [self.column] + ([self.tiebreak] if self.tiebreak else [])
        w = _lag_window(order, self.partition_by)
        ts = F.col(self.column).cast("double")
        gap = ts - F.lag(ts).over(w)
        n = (
            df.select(F.when(gap > self.max_gap_seconds, 1).otherwise(0).alias("g"))
            .agg(F.sum("g").alias("n"))
            .collect()[0]["n"]
            or 0
        )
        if n == 0:
            return []
        return [
            ValidationIssue(
                column=self.column,
                issue_type="timeseries_gaps",
                count=int(n),
                severity=Severity.MEDIUM,
                validator_name="timeseries_gap",
                expected=f"gaps <= {self.max_gap_seconds}s",
                actual=int(n),
                details=f"{n} gaps exceed {self.max_gap_seconds}s",
            )
        ]


@register_validator("timeseries_interval", category="timeseries")
class TimeSeriesIntervalValidator(Validator):
    """Consecutive diffs equal expected interval ± tolerance
    (reference: gap.py:215)."""

    def __init__(
        self,
        column: str,
        interval_seconds: float,
        tolerance_seconds: float = 0.0,
        partition_by: list[str] | None = None,
        tiebreak: str | None = None,
    ) -> None:
        self.column = column
        self.interval_seconds = interval_seconds
        self.tolerance_seconds = tolerance_seconds
        self.partition_by = partition_by
        self.tiebreak = tiebreak

    def validate(self, df: DataFrame, row_count: int | None = None) -> list[ValidationIssue]:
        order = [self.column] + ([self.tiebreak] if self.tiebreak else [])
        w = _lag_window(order, self.partition_by)
        ts = F.col(self.column).cast("double")
        diff = ts - F.lag(ts).over(w)
        bad = F.abs(diff - self.interval_seconds) > self.tolerance_seconds
        n = (
            df.select(F.when(bad & diff.isNotNull(), 1).otherwise(0).alias("g"))
            .agg(F.sum("g").alias("n"))
            .collect()[0]["n"]
            or 0
        )
        if n == 0:
            return []
        return [
            ValidationIssue(
                column=self.column,
                issue_type="irregular_intervals",
                count=int(n),
                severity=Severity.MEDIUM,
                validator_name="timeseries_interval",
                expected=f"interval {self.interval_seconds}s ± {self.tolerance_seconds}s",
                actual=int(n),
                details=f"{n} irregular intervals",
            )
        ]


@register_validator("timeseries_duplicate", category="timeseries")
class TimeSeriesDuplicateValidator(Validator):
    """Duplicate timestamps (reference: gap.py:376) — groupBy(ts), no window."""

    def __init__(self, column: str, partition_by: list[str] | None = None) -> None:
        self.column = column
        self.partition_by = partition_by

    def validate(self, df: DataFrame, row_count: int | None = None) -> list[ValidationIssue]:
        keys = (self.partition_by or []) + [self.column]
        agg = (
            df.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("__n"))
            .agg(F.sum(F.when(F.col("__n") > 1, F.col("__n") - 1).otherwise(0)).alias("d"))
            .collect()[0]
        )
        n = int(agg["d"] or 0)
        if n == 0:
            return []
        return [
            ValidationIssue(
                column=self.column,
                issue_type="duplicate_timestamps",
                count=n,
                severity=Severity.MEDIUM,
                validator_name="timeseries_duplicate",
                expected="unique timestamps",
                actual=n,
                details=f"{n} surplus duplicate timestamps",
            )
        ]


@register_validator("timeseries_monotonic", category="timeseries")
class TimeSeriesMonotonicValidator(Validator):
    """Value monotonic along time (reference: timeseries/monotonic.py:32)."""

    def __init__(
        self,
        value_column: str,
        time_column: str,
        direction: str = "increasing",
        partition_by: list[str] | None = None,
        tiebreak: str | None = None,
    ) -> None:
        self.value_column = value_column
        self.time_column = time_column
        self.direction = direction
        self.partition_by = partition_by
        self.tiebreak = tiebreak

    def validate(self, df: DataFrame, row_count: int | None = None) -> list[ValidationIssue]:
        order = [self.time_column] + ([self.tiebreak] if self.tiebreak else [])
        w = _lag_window(order, self.partition_by)
        cur = F.col(self.value_column)
        prev = F.lag(cur).over(w)
        bad = (cur < prev) if self.direction == "increasing" else (cur > prev)
        n = (
            df.select(F.when(bad & prev.isNotNull(), 1).otherwise(0).alias("v"))
            .agg(F.sum("v").alias("n"))
            .collect()[0]["n"]
            or 0
        )
        if n == 0:
            return []
        return [
            ValidationIssue(
                column=self.value_column,
                issue_type="timeseries_not_monotonic",
                count=int(n),
                severity=Severity.MEDIUM,
                validator_name="timeseries_monotonic",
                expected=f"{self.direction} over {self.time_column}",
                actual=int(n),
                details=f"{n} monotonicity violations",
            )
        ]


@register_validator("timeseries_completeness", category="timeseries")
class TimeSeriesCompletenessValidator(Validator):
    """Expected time buckets all present between min/max at frequency
    (reference: timeseries/completeness.py:24). Spark: count distinct
    buckets vs the arithmetic expectation — no sequence explosion needed
    for the count form; the explode+anti-join form lists the gaps."""

    def __init__(self, column: str, bucket: str = "hour") -> None:
        self.column = column
        self.bucket = bucket  # date_trunc unit

    def validate(self, df: DataFrame, row_count: int | None = None) -> list[ValidationIssue]:
        secs = {"minute": 60, "hour": 3600, "day": 86400}[self.bucket]
        agg = df.agg(
            F.countDistinct(F.date_trunc(self.bucket, F.col(self.column))).alias("present"),
            (
                (F.unix_timestamp(F.date_trunc(self.bucket, F.max(self.column)))
                 - F.unix_timestamp(F.date_trunc(self.bucket, F.min(self.column)))) / secs + 1
            ).cast("long").alias("expected"),
        ).collect()[0]
        present, expected = int(agg["present"] or 0), int(agg["expected"] or 0)
        missing = expected - present
        if missing <= 0:
            return []
        ratio = missing / expected if expected else 0.0
        return [
            ValidationIssue(
                column=self.column,
                issue_type="missing_time_buckets",
                count=missing,
                severity=severity_from_ratio(ratio),
                validator_name="timeseries_completeness",
                expected=f"{expected} {self.bucket} buckets",
                actual=present,
                details=f"{missing}/{expected} {self.bucket} buckets missing",
            )
        ]
