"""Time-series validators (reference: src/truthound/validators/timeseries/).

Spark DataFrames are unordered (SURVEY §7 hard-part 1): every sequential
check takes an explicit timestamp/order column and computes diffs with a
lag window. For per-key series pass ``partition_by`` — the window then
shuffles once on the key and sorts within partitions (scalable); a global
un-partitioned window is only advisable on pre-aggregated/small frames.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from truthound_spark.core.base import Validator, pct_agg
from truthound_spark.core.registry import register_validator
from truthound_spark.core.results import ValidationIssue
from truthound_spark.types import Severity, severity_from_ratio


def _per_partition_lag_frame(
    df: DataFrame,
    order_by: list[str],
    carry: Column,
    predicate: Callable[[Column, Column], Column],
    num_partitions: int | None = None,
) -> DataFrame:
    """Per-range-partition lag-violation counts + boundary carries.

    One row per non-empty partition: (__pid, __viol, __first, __last,
    __kmin). Plan contains NO single-partition exchange — asserted by
    tests/test_round6_fixes.py.
    """
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ocols = [f"__o{i}" for i in range(len(order_by))]
    ordered = (
        df.select(
            *[F.col(c).alias(o) for c, o in zip(order_by, ocols)], carry.alias("__c")
        )
        .repartitionByRange(parts, *[F.col(o) for o in ocols])
        .sortWithinPartitions(*ocols)
        .withColumn("__pid", F.spark_partition_id())
    )
    w = Window.partitionBy("__pid").orderBy(*ocols)
    prev = F.lag("__c").over(w)
    okey = F.struct(*[F.col(o) for o in ocols])
    return (
        ordered.select(
            "__pid",
            "__c",
            okey.alias("__k"),
            F.when(predicate(F.col("__c"), prev), 1).otherwise(0).alias("__b"),
        )
        .groupBy("__pid")
        .agg(
            F.sum("__b").alias("__viol"),
            F.min_by("__c", F.col("__k")).alias("__first"),
            F.max_by("__c", F.col("__k")).alias("__last"),
            F.min("__k").alias("__kmin"),
        )
    )


def _count_lag_violations(
    df: DataFrame,
    order_by: list[str],
    partition_by: list[str] | None,
    carry: Column,
    predicate: Callable[[Column, Column], Column],
    num_partitions: int | None = None,
) -> int:
    """Count ``predicate(cur, prev)`` over consecutive pairs in order.

    ``carry`` is the single column whose previous value the predicate
    needs; a NULL predicate result (e.g. first row, prev NULL) is not
    counted.

    With ``partition_by`` the lag window shuffles once on the series key —
    already scalable. Without a key, a bare ``Window.orderBy`` would
    funnel every row through ONE task; instead we range-partition on the
    order columns, count lag violations within each sorted partition, and
    evaluate the SAME Column predicate over the per-partition (first,
    last) boundary rows — N-1 scalar pairs — so no logic is duplicated
    driver-side (pattern: IncreasingValidator, distribution.py:314).
    """
    if partition_by:
        w = Window.partitionBy(*partition_by).orderBy(*[F.col(c) for c in order_by])
        prev = F.lag(carry).over(w)
        n = (
            df.select(F.when(predicate(carry, prev), 1).otherwise(0).alias("__b"))
            .agg(F.sum("__b").alias("n"))
            .collect()[0]["n"]
        )
        return int(n or 0)

    spark = df.sparkSession
    per_part = _per_partition_lag_frame(df, order_by, carry, predicate, num_partitions)
    rows = per_part.collect()
    rows.sort(key=lambda r: tuple(r["__kmin"]))
    n = sum(int(r["__viol"] or 0) for r in rows)
    pairs = [(a["__last"], b["__first"]) for a, b in zip(rows, rows[1:])]
    if pairs:
        carry_type = per_part.schema["__first"].dataType
        schema = T.StructType(
            [T.StructField("__p", carry_type), T.StructField("__c", carry_type)]
        )
        nb = (
            spark.createDataFrame(pairs, schema)
            .select(
                F.when(predicate(F.col("__c"), F.col("__p")), 1).otherwise(0).alias("__b")
            )
            .agg(F.sum("__b").alias("n"))
            .collect()[0]["n"]
        )
        n += int(nb or 0)
    return n


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
        n = _count_lag_violations(
            df,
            order,
            self.partition_by,
            F.col(self.column),
            lambda cur, prev: (cur.cast("double") - prev.cast("double"))
            > self.max_gap_seconds,
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
        n = _count_lag_violations(
            df,
            order,
            self.partition_by,
            F.col(self.column),
            lambda cur, prev: F.abs(
                cur.cast("double") - prev.cast("double") - self.interval_seconds
            )
            > self.tolerance_seconds,
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
        if self.direction == "increasing":
            pred = lambda cur, prev: cur < prev  # noqa: E731
        else:
            pred = lambda cur, prev: cur > prev  # noqa: E731
        n = _count_lag_violations(
            df, order, self.partition_by, F.col(self.value_column), pred
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


@register_validator("trend", category="timeseries")
class TrendValidator(Validator):
    """Linear-regression slope over time within bounds
    (reference: timeseries/trend.py:32). slope = covar_pop(t, y)/var_pop(t)
    — ONE distributed aggregate, no collection of the series."""

    def __init__(
        self,
        column: str,
        time_column: str,
        min_slope: float | None = None,
        max_slope: float | None = None,
    ) -> None:
        self.column = column
        self.time_column = time_column
        self.min_slope = min_slope
        self.max_slope = max_slope

    def validate(self, df: DataFrame, row_count: int | None = None) -> list[ValidationIssue]:
        tsec = F.col(self.time_column).cast("double")
        row = df.agg(
            F.covar_pop(tsec, F.col(self.column)).alias("cov"),
            F.var_pop(tsec).alias("var"),
        ).collect()[0]
        if row["var"] is None or row["var"] == 0:
            return []
        slope = row["cov"] / row["var"]
        ok = (self.min_slope is None or slope >= self.min_slope) and (
            self.max_slope is None or slope <= self.max_slope
        )
        if ok:
            return []
        return [
            ValidationIssue(
                column=self.column,
                issue_type="trend_out_of_range",
                count=1,
                severity=Severity.MEDIUM,
                validator_name="trend",
                expected=f"slope in [{self.min_slope},{self.max_slope}] per second",
                actual=round(slope, 10),
                details=f"OLS slope {slope:.3e}/s",
            )
        ]


@register_validator("trend_break", category="timeseries")
class TrendBreakValidator(Validator):
    """Structural break: slope of first vs second half differs by more than
    a factor (reference: timeseries/trend.py:319). Two windowed OLS slopes,
    both distributed aggregates over a median-split."""

    def __init__(self, column: str, time_column: str, max_slope_change: float = 2.0) -> None:
        self.column = column
        self.time_column = time_column
        self.max_slope_change = max_slope_change

    def _slope(self, df: DataFrame) -> float | None:
        tsec = F.col(self.time_column).cast("double")
        row = df.agg(
            F.covar_pop(tsec, F.col(self.column)).alias("cov"),
            F.var_pop(tsec).alias("var"),
        ).collect()[0]
        if row["var"] is None or row["var"] == 0:
            return None
        return row["cov"] / row["var"]

    def validate(self, df: DataFrame, row_count: int | None = None) -> list[ValidationIssue]:
        mid = df.agg(
            pct_agg(
                F.col(self.time_column).cast("double"), 0.5, approx=True
            ).alias("m")
        ).collect()[0]["m"]
        if mid is None:
            return []
        tsec = F.col(self.time_column).cast("double")
        s1 = self._slope(df.filter(tsec <= mid))
        s2 = self._slope(df.filter(tsec > mid))
        if s1 is None or s2 is None:
            return []
        denom = abs(s1) + 1e-12
        change = abs(s2 - s1) / denom
        if change <= self.max_slope_change:
            return []
        return [
            ValidationIssue(
                column=self.column,
                issue_type="trend_break",
                count=1,
                severity=Severity.MEDIUM,
                validator_name="trend_break",
                expected=f"slope change <= {self.max_slope_change}x",
                actual=round(change, 4),
                details=f"slope {s1:.3e} → {s2:.3e} across median split",
            )
        ]


@register_validator("seasonality", category="timeseries")
class SeasonalityValidator(Validator):
    """Seasonal bucket means must stay within a band of the global mean
    (reference: timeseries/seasonality.py:33): groupBy(date-part) means —
    the distributed decomposition of the reference's per-season averages."""

    PARTS = {
        "hour": F.hour,
        "dayofweek": F.dayofweek,
        "month": F.month,
    }

    def __init__(
        self,
        column: str,
        time_column: str,
        part: str = "dayofweek",
        max_relative_deviation: float = 0.5,
    ) -> None:
        self.column = column
        self.time_column = time_column
        self.part = part
        self.max_relative_deviation = max_relative_deviation

    def validate(self, df: DataFrame, row_count: int | None = None) -> list[ValidationIssue]:
        part_fn = self.PARTS[self.part]
        buckets = (
            df.groupBy(part_fn(F.col(self.time_column)).alias("bucket"))
            .agg(F.mean(F.col(self.column)).alias("mu"))
        )
        joined = buckets.crossJoin(
            F.broadcast(df.agg(F.mean(F.col(self.column)).alias("global_mu")))
        )
        bad = joined.filter(
            F.abs(F.col("mu") - F.col("global_mu"))
            > self.max_relative_deviation * F.abs(F.col("global_mu"))
        )
        rows = bad.collect()
        if not rows:
            return []
        return [
            ValidationIssue(
                column=self.column,
                issue_type="seasonal_deviation",
                count=len(rows),
                severity=Severity.MEDIUM,
                validator_name="seasonality",
                expected=f"per-{self.part} mean within ±{self.max_relative_deviation:.0%} of global",
                actual=[
                    {"bucket": r["bucket"], "mean": round(r["mu"], 4)} for r in rows[:5]
                ],
                details=f"{len(rows)} {self.part} buckets deviate",
            )
        ]


@register_validator("timeseries_value_completeness", category="timeseries")
class TimeSeriesValueCompletenessValidator(Validator):
    """Non-null value ratio per time bucket ≥ threshold
    (reference: timeseries/completeness.py:275)."""

    def __init__(
        self,
        time_column: str,
        value_column: str,
        bucket: str = "hour",
        min_ratio: float = 0.9,
    ) -> None:
        self.time_column = time_column
        self.value_column = value_column
        self.bucket = bucket
        self.min_ratio = min_ratio

    def validate(self, df: DataFrame, row_count: int | None = None) -> list[ValidationIssue]:
        b = F.date_trunc(self.bucket, F.col(self.time_column))
        per = df.groupBy(b.alias("bucket")).agg(
            (F.count(F.col(self.value_column)) / F.count(F.lit(1))).alias("ratio")
        )
        bad = per.filter(F.col("ratio") < self.min_ratio)
        n = bad.count()
        if n == 0:
            return []
        return [
            ValidationIssue(
                column=self.value_column,
                issue_type="bucket_value_incomplete",
                count=int(n),
                severity=Severity.MEDIUM,
                validator_name="timeseries_value_completeness",
                expected=f"per-{self.bucket} non-null ratio >= {self.min_ratio}",
                actual=int(n),
                details=f"{n} buckets below completeness threshold",
            )
        ]


@register_validator("timeseries_date_range", category="timeseries")
class TimeSeriesDateRangeValidator(Validator):
    """Observed [min,max] timestamp must cover an expected range
    (reference: timeseries/completeness.py:445)."""

    def __init__(self, column: str, expected_start: str, expected_end: str) -> None:
        self.column = column
        self.expected_start = expected_start
        self.expected_end = expected_end

    def validate(self, df: DataFrame, row_count: int | None = None) -> list[ValidationIssue]:
        row = df.agg(
            F.min(self.column).alias("lo"), F.max(self.column).alias("hi")
        ).collect()[0]
        lo, hi = row["lo"], row["hi"]
        start = F.lit(self.expected_start).cast("timestamp")
        end = F.lit(self.expected_end).cast("timestamp")
        chk = df.sparkSession.range(1).select(
            (F.lit(lo).cast("timestamp") <= start).alias("covers_start"),
            (F.lit(hi).cast("timestamp") >= end).alias("covers_end"),
        ).collect()[0]
        if lo is not None and chk["covers_start"] and chk["covers_end"]:
            return []
        return [
            ValidationIssue(
                column=self.column,
                issue_type="date_range_not_covered",
                count=1,
                severity=Severity.MEDIUM,
                validator_name="timeseries_date_range",
                expected=f"[{self.expected_start}, {self.expected_end}]",
                actual={"min": str(lo), "max": str(hi)},
                details="observed range does not cover expected range",
            )
        ]


@register_validator("timeseries_order", category="timeseries")
class TimeSeriesOrderValidator(Validator):
    """Timestamps strictly ordered by a sequence column (reference:
    timeseries/order.py TimeSeriesOrderValidator). Distributed via the
    same range-partition + boundary-stitch plan as Increasing/Decreasing:
    a window lag per partition plus a per-partition boundary pass — no
    single-partition global window at scale."""

    name = "timeseries_order"

    def __init__(
        self, time_column: str, order_by: str | None = None, strict: bool = False
    ) -> None:
        self.time_column = time_column
        self.order_by = order_by
        self.strict = strict

    def validate(self, df: DataFrame, row_count: int | None = None) -> list[ValidationIssue]:
        order_col = self.order_by or self.time_column
        if self.strict:
            pred = lambda cur, prev: prev >= cur  # noqa: E731
        else:
            pred = lambda cur, prev: prev > cur  # noqa: E731
        n_bad = _count_lag_violations(
            df, [order_col], None, F.col(self.time_column), pred
        )
        if not n_bad:
            return []
        total = row_count if row_count is not None else df.count()
        return [
            ValidationIssue(
                column=self.time_column,
                issue_type="timeseries_out_of_order",
                count=int(n_bad),
                severity=severity_from_ratio(n_bad / total if total else 0.0),
                validator_name=self.name,
                expected=f"{self.time_column} non-decreasing along {order_col}",
                details=f"{n_bad} out-of-order timestamps",
            )
        ]


@register_validator("seasonal_decomposition", category="timeseries")
class SeasonalDecompositionValidator(Validator):
    """Additive decomposition sanity: detrend with a centered moving
    average, average the detrended values per seasonal position, and
    bound the residual variance share (reference:
    timeseries/seasonality.py:249-420 SeasonalDecompositionValidator).

    Spark plan (no single-partition Window anywhere): per-series windows
    when ``series_key`` is given (shuffle on the key, scalable); without a
    key the global sequence is assigned distributed-ly (range-partition on
    time + per-partition row_number + driver-cumulated offsets — N scalars)
    and the centered moving average becomes an explode(±half)/groupBy —
    (2·half+1)× row fan-out, keyed shuffles only.
    """

    name = "seasonal_decomposition"

    def __init__(
        self,
        column: str,
        time_column: str,
        period: int = 7,
        max_residual_variance_ratio: float = 0.8,
        series_key: str | None = None,
        num_partitions: int | None = None,
    ) -> None:
        self.column = column
        self.time_column = time_column
        self.period = period
        self.max_residual_variance_ratio = max_residual_variance_ratio
        self.series_key = series_key
        self.num_partitions = num_partitions

    def _detrended_keyed(self, df: DataFrame) -> DataFrame:
        """Per-series decomposition: windows partitioned by the key."""
        val, ts = F.col(self.column), F.col(self.time_column)
        half = self.period // 2
        w = Window.partitionBy("__key").orderBy("__t").rowsBetween(-half, half)
        seq = F.row_number().over(Window.partitionBy("__key").orderBy("__t"))
        return (
            df.select(
                F.col(self.series_key).alias("__key"), ts.alias("__t"), val.alias("__v")
            )
            .withColumn("__trend", F.avg("__v").over(w))
            .withColumn("__detrended", F.col("__v") - F.col("__trend"))
            .withColumn("__pos", seq % self.period)
        )

    def _detrended_global(self, df: DataFrame) -> DataFrame:
        """Global series: distributed sequence + explode moving average."""
        val, ts = F.col(self.column), F.col(self.time_column)
        half = self.period // 2
        spark = df.sparkSession
        parts = self.num_partitions or spark.sparkContext.defaultParallelism
        ordered = (
            df.select(ts.alias("__t"), val.alias("__v"))
            .repartitionByRange(parts, F.col("__t"))
            .sortWithinPartitions("__t")
            .withColumn("__pid", F.spark_partition_id())
        )
        counts = {
            r["__pid"]: r["c"]
            for r in ordered.groupBy("__pid").agg(F.count(F.lit(1)).alias("c")).collect()
        }
        offsets, acc = {}, 0
        for pid in sorted(counts):
            offsets[pid] = acc
            acc += counts[pid]
        off = F.coalesce(
            F.element_at(
                F.create_map(
                    *[F.lit(x) for kv in offsets.items() for x in kv]
                ),
                F.col("__pid"),
            ),
            F.lit(0),
        )
        local = F.row_number().over(Window.partitionBy("__pid").orderBy("__t"))
        with_seq = ordered.withColumn("__seq", (local + off).cast("long"))
        contrib = with_seq.select(
            F.explode(
                F.array(*[F.col("__seq") + F.lit(j) for j in range(-half, half + 1)])
            ).alias("__tgt"),
            F.col("__v").alias("__cv"),
        )
        trend = contrib.groupBy("__tgt").agg(F.avg("__cv").alias("__trend"))
        return (
            with_seq.join(trend, with_seq["__seq"] == trend["__tgt"])
            .withColumn("__detrended", F.col("__v") - F.col("__trend"))
            .withColumn("__pos", F.col("__seq") % self.period)
        )

    def validate(self, df: DataFrame, row_count: int | None = None) -> list[ValidationIssue]:
        if self.series_key:
            detrended = self._detrended_keyed(df)
            seasonal_keys = ["__key", "__pos"]
        else:
            detrended = self._detrended_global(df)
            seasonal_keys = ["__pos"]
        seasonal = detrended.groupBy(*seasonal_keys).agg(
            F.avg("__detrended").alias("__seasonal")
        )
        resid = detrended.join(F.broadcast(seasonal), seasonal_keys).withColumn(
            "__resid", F.col("__detrended") - F.col("__seasonal")
        )
        stats = resid.agg(
            F.var_samp("__v").alias("var_total"),
            F.var_samp("__resid").alias("var_resid"),
        ).collect()[0]
        var_total = stats["var_total"] or 0.0
        var_resid = stats["var_resid"] or 0.0
        ratio = var_resid / var_total if var_total else 0.0
        if ratio <= self.max_residual_variance_ratio:
            return []
        return [
            ValidationIssue(
                column=self.column,
                issue_type="decomposition_poor_fit",
                count=1,
                severity=Severity.MEDIUM,
                validator_name=self.name,
                expected=(
                    f"residual variance <= "
                    f"{self.max_residual_variance_ratio:.0%} of total"
                ),
                actual=round(ratio, 4),
                details=(
                    f"trend+seasonal(period={self.period}) explain only "
                    f"{1 - ratio:.0%} of variance"
                ),
            )
        ]
