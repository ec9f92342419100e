"""Completeness validators (reference: src/truthound/validators/completeness/).

All compile to fused aggregate expressions — zero extra scans per check.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from truthound_spark.core.base import (
    FLOAT_TYPES,
    STRING_TYPES,
    ExpressionSpec,
    Validator,
    violation_count,
)
from truthound_spark.core.registry import register_validator


@register_validator("null", category="completeness")
class NullValidator(Validator):
    """Count nulls per column (reference: completeness/null.py:24-104).

    count_expr = null_count, non_null = len (null.py:73-82) → Spark:
    SUM(isNull) vs COUNT(*) in the fused suite agg.
    """

    def __init__(self, columns: list[str] | None = None, mostly: float = 1.0) -> None:
        self.columns = columns
        self.mostly = mostly

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        out = []
        mostly = self.mostly

        def judge(m):
            # tolerance mode (reference null.py `mostly`): pass while the
            # non-null share stays >= mostly; count>0 alone is not a fail
            denom = m.get("denom") or 0
            count = int(m.get("count") or 0)
            ok_ratio = 1.0 - (count / denom) if denom else 1.0
            return (
                ok_ratio >= mostly,
                count,
                f"{count}/{denom} nulls ({1 - ok_ratio:.2%} > {1 - mostly:.2%} allowed)",
            )

        for c in self._target_columns(df, self.columns):
            pred = F.col(c).isNull()
            out.append(
                ExpressionSpec(
                    name="null",
                    issue_type="null_values",
                    column=c,
                    count_expr=violation_count(pred),
                    non_null_expr=F.count(F.lit(1)),
                    filter_expr=pred,
                    expected="no nulls" if self.mostly >= 1.0 else f"≥{self.mostly:.0%} non-null",
                    judge=judge if self.mostly < 1.0 else None,
                )
            )
        return out


@register_validator("not_null", category="completeness")
class NotNullValidator(NullValidator):
    """Strict zero-null variant (reference: null.py:115)."""


@register_validator("completeness_ratio", category="completeness")
class CompletenessRatioValidator(Validator):
    """Non-null ratio ≥ threshold (reference: null.py:184)."""

    def __init__(self, columns: list[str] | None = None, min_ratio: float = 0.95) -> None:
        self.columns = columns
        self.min_ratio = min_ratio

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        out = []
        for c in self._target_columns(df, self.columns):
            mr = self.min_ratio

            def judge(m: dict[str, Any], mr: float = mr) -> tuple[bool, Any, str]:
                denom = m.get("denom") or 0
                nn = m.get("nn") or 0
                ratio = (nn / denom) if denom else 1.0
                return (
                    ratio >= mr,
                    round(ratio, 6),
                    f"completeness {ratio:.4f} < required {mr}",
                )

            out.append(
                ExpressionSpec(
                    name="completeness_ratio",
                    issue_type="low_completeness",
                    column=c,
                    count_expr=violation_count(F.col(c).isNull()),
                    non_null_expr=F.count(F.lit(1)),
                    extra_exprs={"nn": F.count(F.col(c))},
                    filter_expr=F.col(c).isNull(),
                    expected=f"non-null ratio >= {self.min_ratio}",
                    judge=judge,
                )
            )
        return out


@register_validator("nan", category="completeness")
class NaNValidator(Validator):
    """NaN counts in float columns (reference: completeness/nan.py:29)."""

    def __init__(self, columns: list[str] | None = None) -> None:
        self.columns = columns

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        out = []
        for c in self._target_columns(df, self.columns, FLOAT_TYPES):
            pred = F.isnan(F.col(c))
            out.append(
                ExpressionSpec(
                    name="nan",
                    issue_type="nan_values",
                    column=c,
                    count_expr=violation_count(pred),
                    filter_expr=pred,
                    expected="no NaN",
                )
            )
        return out


@register_validator("infinity", category="completeness")
class InfinityValidator(Validator):
    """±inf counts (reference: nan.py:230); finite check is its complement."""

    def __init__(self, columns: list[str] | None = None) -> None:
        self.columns = columns

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        out = []
        for c in self._target_columns(df, self.columns, FLOAT_TYPES):
            pred = F.col(c).isin(float("inf"), float("-inf"))
            out.append(
                ExpressionSpec(
                    name="infinity",
                    issue_type="infinite_values",
                    column=c,
                    count_expr=violation_count(pred),
                    filter_expr=pred,
                    expected="finite values",
                )
            )
        return out


@register_validator("empty_string", category="completeness")
class EmptyStringValidator(Validator):
    """len(str)==0 (reference: completeness/empty.py:17)."""

    def __init__(self, columns: list[str] | None = None) -> None:
        self.columns = columns

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        out = []
        for c in self._target_columns(df, self.columns, STRING_TYPES):
            pred = F.length(F.col(c)) == 0
            out.append(
                ExpressionSpec(
                    name="empty_string",
                    issue_type="empty_strings",
                    column=c,
                    count_expr=violation_count(pred),
                    filter_expr=pred,
                    expected="non-empty strings",
                )
            )
        return out


@register_validator("whitespace_only", category="completeness")
class WhitespaceOnlyValidator(Validator):
    """Trimmed-empty but non-empty (reference: empty.py:71)."""

    def __init__(self, columns: list[str] | None = None) -> None:
        self.columns = columns

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        out = []
        for c in self._target_columns(df, self.columns, STRING_TYPES):
            pred = (F.length(F.trim(F.col(c))) == 0) & (F.length(F.col(c)) > 0)
            out.append(
                ExpressionSpec(
                    name="whitespace_only",
                    issue_type="whitespace_only",
                    column=c,
                    count_expr=violation_count(pred),
                    filter_expr=pred,
                    expected="non-whitespace strings",
                )
            )
        return out


@register_validator("conditional_null", category="completeness")
class ConditionalNullValidator(Validator):
    """Null allowed only when condition holds (reference: conditional.py:13)."""

    def __init__(self, column: str, condition: str) -> None:
        self.column = column
        self.condition = condition  # SQL boolean expression string

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        cond = F.expr(self.condition)
        pred = (~cond | cond.isNull()) & F.col(self.column).isNull()
        return [
            ExpressionSpec(
                name="conditional_null",
                issue_type="conditional_null",
                column=self.column,
                count_expr=violation_count(pred),
                filter_expr=pred,
                expected=f"null only when ({self.condition})",
            )
        ]


@register_validator("default_value", category="completeness")
class DefaultValueValidator(Validator):
    """Placeholder-value over-use (reference: completeness/default.py:13)."""

    DEFAULTS = ["", "null", "NULL", "None", "N/A", "n/a", "unknown", "-", "0000-00-00"]

    def __init__(
        self,
        columns: list[str] | None = None,
        defaults: list[Any] | None = None,
        max_ratio: float = 0.5,
    ) -> None:
        self.columns = columns
        self.defaults = defaults if defaults is not None else self.DEFAULTS
        self.max_ratio = max_ratio

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        out = []
        for c in self._target_columns(df, self.columns, STRING_TYPES):
            pred = F.col(c).isin(self.defaults)
            mr = self.max_ratio

            def judge(m: dict[str, Any], mr: float = mr) -> tuple[bool, Any, str]:
                denom = m.get("denom") or 0
                cnt = m.get("count") or 0
                ratio = (cnt / denom) if denom else 0.0
                return ratio <= mr, round(ratio, 6), f"default-value ratio {ratio:.4f} > {mr}"

            out.append(
                ExpressionSpec(
                    name="default_value",
                    issue_type="default_value_overuse",
                    column=c,
                    count_expr=violation_count(pred),
                    non_null_expr=F.count(F.lit(1)),
                    filter_expr=pred,
                    expected=f"placeholder ratio <= {self.max_ratio}",
                    judge=judge,
                )
            )
        return out


@register_validator("not_nan", category="completeness")
class NotNaNValidator(NaNValidator):
    """Strict no-NaN variant (reference: completeness/nan.py:99)."""


@register_validator("nan_ratio", category="completeness")
class NaNRatioValidator(Validator):
    """NaN ratio ≤ threshold (reference: completeness/nan.py:154)."""

    def __init__(self, columns: list[str] | None = None, max_ratio: float = 0.0) -> None:
        self.columns = columns
        self.max_ratio = max_ratio

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        out = []
        for c in self._target_columns(df, self.columns, FLOAT_TYPES):
            pred = F.isnan(F.col(c))
            mr = self.max_ratio

            def judge(m: dict[str, Any], mr: float = mr) -> tuple[bool, Any, str]:
                denom = m.get("denom") or 0
                cnt = m.get("count") or 0
                ratio = (cnt / denom) if denom else 0.0
                return ratio <= mr, round(ratio, 6), f"NaN ratio {ratio:.4f} > {mr}"

            out.append(
                ExpressionSpec(
                    name="nan_ratio",
                    issue_type="nan_ratio_exceeded",
                    column=c,
                    count_expr=violation_count(pred),
                    non_null_expr=F.count(F.lit(1)),
                    filter_expr=pred,
                    expected=f"NaN ratio <= {self.max_ratio}",
                    judge=judge,
                )
            )
        return out


@register_validator("finite", category="completeness")
class FiniteValidator(Validator):
    """All float values finite: no NaN, no ±inf (reference: nan.py:291)."""

    def __init__(self, columns: list[str] | None = None) -> None:
        self.columns = columns

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        out = []
        for c in self._target_columns(df, self.columns, FLOAT_TYPES):
            pred = F.isnan(F.col(c)) | F.col(c).isin(float("inf"), float("-inf"))
            out.append(
                ExpressionSpec(
                    name="finite",
                    issue_type="non_finite_values",
                    column=c,
                    count_expr=violation_count(pred),
                    filter_expr=pred,
                    expected="finite values only",
                )
            )
        return out
