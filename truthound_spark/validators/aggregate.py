"""Scalar-aggregate validators: mean/median/std/var/min/max/sum between.

Reference: src/truthound/validators/aggregate/{central,spread,extremes,
sum,type}.py — scalar aggregate computed lazily, compared on driver
(central.py:33-64). All specs fuse into the suite's single agg job.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from truthound_spark.core.base import ExpressionSpec, Validator, pct_agg, violation_count
from truthound_spark.core.registry import register_validator


class _ScalarAggValidator(Validator):
    issue_type = "aggregate_out_of_range"
    metric = "value"

    def __init__(self, column: str, min_value: float | None = None, max_value: float | None = None) -> None:
        self.column = column
        self.min_value = min_value
        self.max_value = max_value

    def _agg(self) -> Column:  # pragma: no cover - abstract
        raise NotImplementedError

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        lo, hi, metric = self.min_value, self.max_value, self.metric

        def judge(m: dict[str, Any]) -> tuple[bool, Any, str]:
            v = m.get("value")
            ok = v is not None and (lo is None or v >= lo) and (hi is None or v <= hi)
            return ok, v, f"{metric} = {v} ∉ [{lo},{hi}]"

        return [
            ExpressionSpec(
                name=self.name,
                issue_type=self.issue_type,
                column=self.column,
                extra_exprs={"value": self._agg()},
                expected=f"{metric} in [{lo},{hi}]",
                judge=judge,
            )
        ]


@register_validator("mean_between", category="aggregate")
class MeanBetweenValidator(_ScalarAggValidator):
    """reference: aggregate/central.py:16"""

    metric = "mean"

    def _agg(self) -> Column:
        return F.mean(self.column)


@register_validator("median_between", category="aggregate")
class MedianBetweenValidator(_ScalarAggValidator):
    """reference: aggregate/central.py:68 — exact percentile by default
    (SURVEY §7.2); use quantile validator with approx=True at scale."""

    metric = "median"

    def _agg(self) -> Column:
        return pct_agg(self.column, 0.5)


@register_validator("std_between", category="aggregate")
class StdBetweenValidator(_ScalarAggValidator):
    """reference: aggregate/spread.py:16 (sample stddev)."""

    metric = "std"

    def _agg(self) -> Column:
        return F.stddev(self.column)


@register_validator("variance_between", category="aggregate")
class VarianceBetweenValidator(_ScalarAggValidator):
    """reference: aggregate/spread.py:68"""

    metric = "variance"

    def _agg(self) -> Column:
        return F.variance(self.column)


@register_validator("min_between", category="aggregate")
class MinBetweenValidator(_ScalarAggValidator):
    """reference: aggregate/extremes.py:16"""

    metric = "min"

    def _agg(self) -> Column:
        return F.min(self.column)


@register_validator("max_between", category="aggregate")
class MaxBetweenValidator(_ScalarAggValidator):
    """reference: aggregate/extremes.py:68"""

    metric = "max"

    def _agg(self) -> Column:
        return F.max(self.column)


@register_validator("sum_between", category="aggregate")
class SumBetweenValidator(_ScalarAggValidator):
    """reference: aggregate/sum.py:16"""

    metric = "sum"

    def _agg(self) -> Column:
        return F.sum(self.column)


@register_validator("row_count_between", category="aggregate")
class RowCountBetweenValidator(Validator):
    """Row count within range (reference: validators/table/ row-count checks)."""

    def __init__(self, min_count: int = 0, max_count: int | None = None) -> None:
        self.min_count = min_count
        self.max_count = max_count

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        lo, hi = self.min_count, self.max_count

        def judge(m: dict[str, Any]) -> tuple[bool, Any, str]:
            n = m.get("n") or 0
            ok = n >= lo and (hi is None or n <= hi)
            return ok, n, f"row count {n} ∉ [{lo},{hi}]"

        return [
            ExpressionSpec(
                name="row_count_between",
                issue_type="row_count_out_of_range",
                column=None,
                extra_exprs={"n": F.count(F.lit(1))},
                expected=f"row count in [{lo},{hi}]",
                judge=judge,
            )
        ]


@register_validator("mixed_type", category="aggregate")
class MixedTypeValidator(Validator):
    """String column containing numeric-parseable values = mixed-type smell
    (reference: aggregate/type.py:17). Spark: try-cast count, fused."""

    def __init__(self, column: str, max_ratio: float = 0.0) -> None:
        self.column = column
        self.max_ratio = max_ratio

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        col = F.col(self.column)
        numeric_like = col.try_cast("double").isNotNull() & col.isNotNull()
        mr = self.max_ratio

        def judge(m: dict[str, Any]) -> tuple[bool, Any, str]:
            nn = m.get("denom") or 0
            cnt = m.get("count") or 0
            ratio = cnt / nn if nn else 0.0
            return ratio <= mr, round(ratio, 6), f"numeric-like ratio {ratio:.4f} > {mr}"

        return [
            ExpressionSpec(
                name="mixed_type",
                issue_type="mixed_types",
                column=self.column,
                count_expr=violation_count(numeric_like),
                non_null_expr=F.count(col),
                filter_expr=numeric_like,
                expected="consistent (non-numeric) string values",
                judge=judge,
            )
        ]
