"""Distribution validators: range, sets, outliers, quantiles, monotonicity.

Reference: src/truthound/validators/distribution/{range,set,outlier,
quantile,monotonic,statistical}.py. Outlier checks are two-pass: one
aggregate job for fences (percentile/mean/stddev), one fused count job —
both distributed, nothing collected but scalars.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from truthound_spark.core.base import (
    NUMERIC_TYPES,
    ExpressionSpec,
    Validator,
    pct_agg,
    violation_count,
)
from truthound_spark.core.registry import register_validator
from truthound_spark.core.results import ValidationIssue
from truthound_spark.types import Severity, severity_from_ratio


@register_validator("range", category="distribution")
class RangeValidator(Validator):
    """Values within [min,max] (reference: distribution/range.py:87-93:
    `(col < min)|(col > max) & is_not_null()`)."""

    def __init__(
        self,
        column: str | None = None,
        min_value: float | None = None,
        max_value: float | None = None,
        columns: list[str] | None = None,
    ) -> None:
        self.column = column
        self.min_value = min_value
        self.max_value = max_value
        self.columns = columns or ([column] if column else None)

    def _pred(self, c: str):
        col = F.col(c)
        pred = F.lit(False)
        if self.min_value is not None:
            pred = pred | (col < self.min_value)
        if self.max_value is not None:
            pred = pred | (col > self.max_value)
        return pred & col.isNotNull()

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        out = []
        for c in self._target_columns(df, self.columns, NUMERIC_TYPES):
            pred = self._pred(c)
            out.append(
                ExpressionSpec(
                    name="range",
                    issue_type="out_of_range",
                    column=c,
                    count_expr=violation_count(pred),
                    non_null_expr=F.count(F.col(c)),
                    filter_expr=pred,
                    extra_exprs={"min": F.min(c), "max": F.max(c)},
                    expected=f"[{self.min_value}, {self.max_value}]",
                )
            )
        return out


#: alias matching the reference benchmark workload name ("between")
@register_validator("between", category="distribution")
class BetweenValidator(RangeValidator):
    pass


@register_validator("in_set", category="distribution")
class InSetValidator(Validator):
    """Values ∈ allowed set (reference: distribution/set.py:13)."""

    def __init__(self, column: str, values: list[Any]) -> None:
        self.column = column
        self.values = values

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        pred = ~F.col(self.column).isin(self.values) & F.col(self.column).isNotNull()
        return [
            ExpressionSpec(
                name="in_set",
                issue_type="value_not_in_set",
                column=self.column,
                count_expr=violation_count(pred),
                non_null_expr=F.count(F.col(self.column)),
                filter_expr=pred,
                expected=self.values,
            )
        ]


@register_validator("not_in_set", category="distribution")
class NotInSetValidator(Validator):
    """Values ∉ forbidden set (reference: set.py:83)."""

    def __init__(self, column: str, values: list[Any]) -> None:
        self.column = column
        self.values = values

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        pred = F.col(self.column).isin(self.values)
        return [
            ExpressionSpec(
                name="not_in_set",
                issue_type="forbidden_value",
                column=self.column,
                count_expr=violation_count(pred),
                non_null_expr=F.count(F.col(self.column)),
                filter_expr=pred,
                expected=f"none of {self.values}",
            )
        ]


@register_validator("outlier", category="distribution")
class IQROutlierValidator(Validator):
    """IQR-fence outliers (reference: distribution/outlier.py:18).

    Pass 1: exact percentiles (single agg). Pass 2: fused violation count.
    At scale, swap `percentile` → `percentile_approx` (mergeable KLL-style
    sketch) via approx=True.
    """

    def __init__(self, columns: list[str] | None = None, k: float = 1.5, approx: bool = False) -> None:
        self.columns = columns
        self.k = k
        self.approx = approx

    def validate(self, df: DataFrame, row_count: int | None = None) -> list[ValidationIssue]:
        cols = self._target_columns(df, self.columns, NUMERIC_TYPES)
        if not cols:
            return []
        aggs = []
        for c in cols:
            aggs.append(pct_agg(c, 0.25, self.approx).alias(f"{c}__q1"))
            aggs.append(pct_agg(c, 0.75, self.approx).alias(f"{c}__q3"))
        fences = df.agg(*aggs).collect()[0].asDict()
        counts = []
        preds = {}
        for c in cols:
            q1, q3 = fences[f"{c}__q1"], fences[f"{c}__q3"]
            if q1 is None or q3 is None:
                continue
            iqr = q3 - q1
            lo, hi = q1 - self.k * iqr, q3 + self.k * iqr
            pred = ((F.col(c) < lo) | (F.col(c) > hi)) & F.col(c).isNotNull()
            preds[c] = (pred, lo, hi)
            counts.append(violation_count(pred).alias(f"{c}__out"))
            counts.append(F.count(F.col(c)).alias(f"{c}__nn"))
        if not counts:
            return []
        row = df.agg(*counts).collect()[0].asDict()
        issues = []
        for c, (pred, lo, hi) in preds.items():
            n = int(row[f"{c}__out"] or 0)
            nn = int(row[f"{c}__nn"] or 0)
            if n > 0:
                ratio = n / nn if nn else 0.0
                issues.append(
                    ValidationIssue(
                        column=c,
                        issue_type="outliers",
                        count=n,
                        severity=severity_from_ratio(ratio),
                        validator_name="outlier",
                        expected=f"within IQR fences [{lo:.4g}, {hi:.4g}]",
                        actual=n,
                        details=f"{n} IQR outliers ({ratio:.2%})",
                    )
                )
        return issues


@register_validator("zscore_outlier", category="distribution")
class ZScoreOutlierValidator(Validator):
    """|x - mean| > k*stddev (reference: outlier.py:135). Two agg passes."""

    def __init__(self, columns: list[str] | None = None, k: float = 3.0) -> None:
        self.columns = columns
        self.k = k

    def validate(self, df: DataFrame, row_count: int | None = None) -> list[ValidationIssue]:
        cols = self._target_columns(df, self.columns, NUMERIC_TYPES)
        if not cols:
            return []
        aggs = []
        for c in cols:
            aggs.append(F.mean(c).alias(f"{c}__mu"))
            aggs.append(F.stddev(c).alias(f"{c}__sd"))
        stats = df.agg(*aggs).collect()[0].asDict()
        counts = []
        active = []
        for c in cols:
            mu, sd = stats[f"{c}__mu"], stats[f"{c}__sd"]
            if mu is None or sd is None or sd == 0:
                continue
            pred = (F.abs(F.col(c) - mu) > self.k * sd) & F.col(c).isNotNull()
            active.append(c)
            counts.append(violation_count(pred).alias(f"{c}__out"))
            counts.append(F.count(F.col(c)).alias(f"{c}__nn"))
        if not counts:
            return []
        row = df.agg(*counts).collect()[0].asDict()
        issues = []
        for c in active:
            n = int(row[f"{c}__out"] or 0)
            nn = int(row[f"{c}__nn"] or 0)
            if n > 0:
                ratio = n / nn if nn else 0.0
                issues.append(
                    ValidationIssue(
                        column=c,
                        issue_type="zscore_outliers",
                        count=n,
                        severity=severity_from_ratio(ratio),
                        validator_name="zscore_outlier",
                        expected=f"|z| <= {self.k}",
                        actual=n,
                        details=f"{n} z-score outliers ({ratio:.2%})",
                    )
                )
        return issues


@register_validator("quantile", category="distribution")
class QuantileValidator(Validator):
    """quantile(q) within [min,max] (reference: distribution/quantile.py:17)."""

    def __init__(
        self,
        column: str,
        q: float = 0.5,
        min_value: float | None = None,
        max_value: float | None = None,
        approx: bool = False,
    ) -> None:
        self.column = column
        self.q = q
        self.min_value = min_value
        self.max_value = max_value
        self.approx = approx

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        lo, hi = self.min_value, self.max_value

        def judge(m: dict[str, Any]) -> tuple[bool, Any, str]:
            v = m.get("quantile")
            ok = v is not None and (lo is None or v >= lo) and (hi is None or v <= hi)
            return ok, v, f"quantile({self.q}) = {v} ∉ [{lo},{hi}]"

        return [
            ExpressionSpec(
                name="quantile",
                issue_type="quantile_out_of_range",
                column=self.column,
                extra_exprs={"quantile": pct_agg(self.column, self.q, self.approx)},
                expected=f"quantile({self.q}) in [{lo},{hi}]",
                judge=judge,
            )
        ]


@register_validator("most_common_value", category="distribution")
class MostCommonValueValidator(Validator):
    """Top value(s) ∈ expected set (reference: distribution/statistical.py:412).

    groupBy(col).count().orderBy(desc).limit(k) — distributed top-k with
    partial aggregation; only k rows reach the driver.
    """

    def __init__(self, column: str, expected_values: list[Any], top_k: int = 1) -> None:
        self.column = column
        self.expected_values = expected_values
        self.top_k = top_k

    def validate(self, df: DataFrame, row_count: int | None = None) -> list[ValidationIssue]:
        top = (
            df.groupBy(self.column)
            .agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy(F.desc("cnt"))
            .limit(self.top_k)
            .collect()
        )
        observed = [r[self.column] for r in top]
        bad = [v for v in observed if v not in set(self.expected_values)]
        if not bad:
            return []
        return [
            ValidationIssue(
                column=self.column,
                issue_type="unexpected_most_common",
                count=len(bad),
                severity=Severity.MEDIUM,
                validator_name="most_common_value",
                expected=self.expected_values,
                actual=observed,
                details=f"top-{self.top_k} values {observed} include unexpected {bad}",
            )
        ]


@register_validator("increasing", category="distribution")
class IncreasingValidator(Validator):
    """Monotonic non-decreasing along an explicit order column
    (reference: distribution/monotonic.py:17; SURVEY §7 hard-part 1: Spark
    DataFrames are unordered, so an order column is required).

    Scale design: a bare ``Window.orderBy`` funnels every row through ONE
    partition. This validator instead range-partitions on the order column
    and counts lag violations within each sorted partition; the only
    cross-partition comparisons are the per-partition (first, last)
    boundary rows — N scalars to the driver. Identical semantics, fully
    distributed sort.
    """

    strictly = False
    direction = "increasing"

    def __init__(
        self,
        column: str,
        order_by: str,
        strictly: bool | None = None,
        num_partitions: int | None = None,
    ) -> None:
        self.column = column
        self.order_by = order_by
        if strictly is not None:
            self.strictly = strictly
        self.num_partitions = num_partitions

    def _bad(self, cur, prev):
        if self.direction == "increasing":
            return (cur < prev) if not self.strictly else (cur <= prev)
        return (cur > prev) if not self.strictly else (cur >= prev)

    def validate(self, df: DataFrame, row_count: int | None = None) -> list[ValidationIssue]:
        parts = self.num_partitions or df.sparkSession.sparkContext.defaultParallelism
        ordered = (
            df.select(F.col(self.order_by).alias("__o"), F.col(self.column).alias("__v"))
            .repartitionByRange(parts, F.col("__o"))
            .sortWithinPartitions("__o")
        )
        tagged = ordered.withColumn("__pid", F.spark_partition_id())
        w = Window.partitionBy("__pid").orderBy("__o")
        prev = F.lag("__v").over(w)
        bad = self._bad(F.col("__v"), prev)
        flagged = tagged.select(
            "__pid",
            "__o",
            "__v",
            F.when(bad & prev.isNotNull(), 1).otherwise(0).alias("__b"),
        )
        per_part = flagged.groupBy("__pid").agg(
            F.sum("__b").alias("__viol"),
            F.min_by(F.col("__v"), F.col("__o")).alias("__first"),
            F.max_by(F.col("__v"), F.col("__o")).alias("__last"),
            F.min("__o").alias("__o_min"),
        )
        rows = sorted(per_part.collect(), key=lambda r: r["__o_min"])
        n = sum(int(r["__viol"] or 0) for r in rows)
        # boundary comparisons between adjacent partitions (driver-side:
        # one pair per partition boundary)
        for a, b in zip(rows, rows[1:]):
            prev_last, cur_first = a["__last"], b["__first"]
            if prev_last is None or cur_first is None:
                continue
            if self.direction == "increasing":
                viol = cur_first <= prev_last if self.strictly else cur_first < prev_last
            else:
                viol = cur_first >= prev_last if self.strictly else cur_first > prev_last
            if viol:
                n += 1
        if n == 0:
            return []
        return [
            ValidationIssue(
                column=self.column,
                issue_type=f"not_{self.direction}",
                count=int(n),
                severity=Severity.MEDIUM,
                validator_name=self.name,
                expected=f"{'strictly ' if self.strictly else ''}{self.direction} by {self.order_by}",
                actual=int(n),
                details=f"{n} consecutive-pair violations",
            )
        ]


@register_validator("decreasing", category="distribution")
class DecreasingValidator(IncreasingValidator):
    direction = "decreasing"


@register_validator("column_pair_in_set", category="distribution")
class ColumnPairInSetValidator(Validator):
    """(a, b) value pair ∈ allowed set of pairs
    (reference: schema/column_pair_set.py:13)."""

    def __init__(self, column_a: str, column_b: str, allowed_pairs: list[tuple]) -> None:
        self.column_a = column_a
        self.column_b = column_b
        self.allowed_pairs = [tuple(p) for p in allowed_pairs]

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        pair_ok = F.lit(False)
        for a, b in self.allowed_pairs:
            pair_ok = pair_ok | ((F.col(self.column_a) == F.lit(a)) & (F.col(self.column_b) == F.lit(b)))
        pred = (
            ~pair_ok
            & F.col(self.column_a).isNotNull()
            & F.col(self.column_b).isNotNull()
        )
        return [
            ExpressionSpec(
                name="column_pair_in_set",
                issue_type="pair_not_in_set",
                column=f"{self.column_a},{self.column_b}",
                count_expr=violation_count(pred),
                non_null_expr=F.count(F.lit(1)),
                filter_expr=pred,
                expected=f"pairs ⊆ {self.allowed_pairs[:5]}...",
            )
        ]


@register_validator("column_pair_not_in_set", category="distribution")
class ColumnPairNotInSetValidator(Validator):
    """(a, b) pair ∉ forbidden set (reference: schema/column_pair_set.py:119)."""

    def __init__(self, column_a: str, column_b: str, forbidden_pairs: list[tuple]) -> None:
        self.column_a = column_a
        self.column_b = column_b
        self.forbidden_pairs = [tuple(p) for p in forbidden_pairs]

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        pred = F.lit(False)
        for a, b in self.forbidden_pairs:
            pred = pred | ((F.col(self.column_a) == F.lit(a)) & (F.col(self.column_b) == F.lit(b)))
        return [
            ExpressionSpec(
                name="column_pair_not_in_set",
                issue_type="forbidden_pair",
                column=f"{self.column_a},{self.column_b}",
                count_expr=violation_count(pred),
                non_null_expr=F.count(F.lit(1)),
                filter_expr=pred,
                expected=f"no pairs in {self.forbidden_pairs[:5]}",
            )
        ]


@register_validator("distribution", category="distribution")
class DistributionValidator(Validator):
    """One-sample categorical distribution vs an expected frequency map,
    χ² goodness-of-fit (reference: distribution/distribution.py:17 +
    critical-value table statistical.py:17). One groupBy; χ² on the driver
    with the Wilson–Hilferty p-value approximation."""

    def __init__(
        self,
        column: str,
        expected_freqs: dict,
        threshold_pvalue: float = 0.05,
    ) -> None:
        self.column = column
        self.expected_freqs = expected_freqs
        self.threshold_pvalue = threshold_pvalue

    def validate(self, df: DataFrame, row_count: int | None = None) -> list[ValidationIssue]:
        from truthound_spark.drift.detectors import _chi2_sf

        counts = {
            r[self.column]: r["n"]
            for r in df.groupBy(self.column).agg(F.count(F.lit(1)).alias("n")).collect()
        }
        total = sum(counts.values())
        if not total:
            return []
        norm = sum(self.expected_freqs.values())
        stat = 0.0
        for cat, w in self.expected_freqs.items():
            expected = total * (w / norm)
            observed = counts.get(cat, 0)
            if expected > 0:
                stat += (observed - expected) ** 2 / expected
        extra = sum(n for c, n in counts.items() if c not in self.expected_freqs)
        stat += extra  # unexpected categories contribute fully
        dof = max(len(self.expected_freqs) - 1, 1)
        p = _chi2_sf(stat, dof)
        if p >= self.threshold_pvalue:
            return []
        return [
            ValidationIssue(
                column=self.column,
                issue_type="distribution_mismatch",
                count=extra,
                severity=Severity.MEDIUM,
                validator_name="distribution",
                expected=self.expected_freqs,
                actual={c: n / total for c, n in sorted(counts.items(), key=str)[:10]},
                details=f"chi2={stat:.4f} dof={dof} p={p:.6f} < {self.threshold_pvalue}",
            )
        ]


@register_validator("non_negative", category="distribution")
class NonNegativeValidator(Validator):
    """All values >= 0 (reference: distribution/sign.py NonNegativeValidator)."""

    name = "non_negative"

    def __init__(self, column: str) -> None:
        self.column = column

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        pred = F.col(self.column) < 0
        return [
            ExpressionSpec(
                name=self.name,
                issue_type="negative_values",
                column=self.column,
                count_expr=violation_count(pred),
                non_null_expr=F.count(F.col(self.column)),
                filter_expr=pred,
                expected=f"{self.column} >= 0",
            )
        ]


@register_validator("positive", category="distribution")
class PositiveValidator(Validator):
    """All values > 0 (reference: distribution/sign.py PositiveValidator)."""

    name = "positive"

    def __init__(self, column: str) -> None:
        self.column = column

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        pred = F.col(self.column) <= 0
        return [
            ExpressionSpec(
                name=self.name,
                issue_type="non_positive_values",
                column=self.column,
                count_expr=violation_count(pred),
                non_null_expr=F.count(F.col(self.column)),
                filter_expr=pred,
                expected=f"{self.column} > 0",
            )
        ]
