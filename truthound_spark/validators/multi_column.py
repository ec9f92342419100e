"""Multi-column / in-row relation validators.

Reference: src/truthound/validators/multi_column/statistical.py (corr,
covariance), arithmetic.py (column sums), schema/column_pair.py (pairwise
relations), uniqueness/within_record.py (intra-row uniqueness).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from truthound_spark.core.base import ExpressionSpec, Validator, violation_count
from truthound_spark.core.registry import register_validator

_OPS = {
    "<": lambda a, b: a < b,
    "<=": lambda a, b: a <= b,
    ">": lambda a, b: a > b,
    ">=": lambda a, b: a >= b,
    "==": lambda a, b: a == b,
    "!=": lambda a, b: a != b,
}


@register_validator("column_pair", category="multi_column")
class ColumnPairValidator(Validator):
    """Pairwise column relation a OP b (reference: schema/column_pair.py:13)."""

    def __init__(self, column_a: str, column_b: str, op: str = "<=") -> None:
        self.column_a = column_a
        self.column_b = column_b
        self.op = op

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        a, b = F.col(self.column_a), F.col(self.column_b)
        ok = _OPS[self.op](a, b)
        pred = ~ok & a.isNotNull() & b.isNotNull()
        return [
            ExpressionSpec(
                name="column_pair",
                issue_type="column_pair_violation",
                column=f"{self.column_a},{self.column_b}",
                count_expr=violation_count(pred),
                non_null_expr=F.count(F.lit(1)),
                filter_expr=pred,
                expected=f"{self.column_a} {self.op} {self.column_b}",
            )
        ]


@register_validator("column_sum", category="multi_column")
class ColumnSumValidator(Validator):
    """a + b (+...) == total within tolerance
    (reference: multi_column/arithmetic.py:15)."""

    def __init__(self, addends: list[str], total: str, tolerance: float = 1e-9) -> None:
        self.addends = addends
        self.total = total
        self.tolerance = tolerance

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        s = F.col(self.addends[0])
        for c in self.addends[1:]:
            s = s + F.col(c)
        pred = F.abs(s - F.col(self.total)) > self.tolerance
        return [
            ExpressionSpec(
                name="column_sum",
                issue_type="arithmetic_mismatch",
                column=self.total,
                count_expr=violation_count(pred),
                non_null_expr=F.count(F.lit(1)),
                filter_expr=pred,
                expected=f"sum({self.addends}) == {self.total} ± {self.tolerance}",
            )
        ]


@register_validator("column_correlation", category="multi_column")
class ColumnCorrelationValidator(Validator):
    """Pearson r within bounds (reference: multi_column/statistical.py:16).
    F.corr is a single fused aggregate (Welford-style partial agg)."""

    def __init__(self, column_a: str, column_b: str, min_corr: float = -1.0, max_corr: float = 1.0) -> None:
        self.column_a = column_a
        self.column_b = column_b
        self.min_corr = min_corr
        self.max_corr = max_corr

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        lo, hi = self.min_corr, self.max_corr

        def judge(m: dict[str, Any]) -> tuple[bool, Any, str]:
            r = m.get("corr")
            ok = r is not None and lo <= r <= hi
            return ok, round(r, 6) if r is not None else None, f"corr = {r} ∉ [{lo},{hi}]"

        return [
            ExpressionSpec(
                name="column_correlation",
                issue_type="correlation_out_of_range",
                column=f"{self.column_a},{self.column_b}",
                extra_exprs={"corr": F.corr(self.column_a, self.column_b)},
                expected=f"corr in [{lo},{hi}]",
                judge=judge,
            )
        ]


@register_validator("column_covariance", category="multi_column")
class ColumnCovarianceValidator(Validator):
    """Sample covariance within bounds (reference: statistical.py:140)."""

    def __init__(self, column_a: str, column_b: str, min_cov: float | None = None, max_cov: float | None = None) -> None:
        self.column_a = column_a
        self.column_b = column_b
        self.min_cov = min_cov
        self.max_cov = max_cov

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        lo, hi = self.min_cov, self.max_cov

        def judge(m: dict[str, Any]) -> tuple[bool, Any, str]:
            v = m.get("cov")
            ok = v is not None and (lo is None or v >= lo) and (hi is None or v <= hi)
            return ok, v, f"covariance = {v} ∉ [{lo},{hi}]"

        return [
            ExpressionSpec(
                name="column_covariance",
                issue_type="covariance_out_of_range",
                column=f"{self.column_a},{self.column_b}",
                extra_exprs={"cov": F.covar_samp(self.column_a, self.column_b)},
                expected=f"covariance in [{lo},{hi}]",
                judge=judge,
            )
        ]


@register_validator("unique_within_record", category="multi_column")
class UniqueWithinRecordValidator(Validator):
    """Values unique across columns within each row
    (reference: uniqueness/within_record.py:251). Row-local array op —
    embarrassingly parallel, no shuffle."""

    def __init__(self, columns: list[str]) -> None:
        self.columns = columns

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        arr = F.array(*[F.col(c) for c in self.columns])
        pred = F.size(F.array_distinct(arr)) < F.size(arr)
        return [
            ExpressionSpec(
                name="unique_within_record",
                issue_type="intra_row_duplicates",
                column=",".join(self.columns),
                count_expr=violation_count(pred),
                non_null_expr=F.count(F.lit(1)),
                filter_expr=pred,
                expected=f"distinct values across {self.columns} per row",
            )
        ]


@register_validator("multi_column_variance", category="multi_column")
class MultiColumnVarianceValidator(Validator):
    """Variance of each column within a shared band — scale-consistency
    across features (reference: multi_column/statistical.py:213)."""

    def __init__(
        self,
        columns: list[str],
        min_variance: float | None = None,
        max_variance: float | None = None,
    ) -> None:
        self.columns = columns
        self.min_variance = min_variance
        self.max_variance = max_variance

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        out = []
        for c in self.columns:
            lo, hi = self.min_variance, self.max_variance

            def judge(m, lo=lo, hi=hi):
                v = m.get("var")
                ok = v is not None and (lo is None or v >= lo) and (hi is None or v <= hi)
                return ok, v, f"variance {v} ∉ [{lo},{hi}]"

            out.append(
                ExpressionSpec(
                    name="multi_column_variance",
                    issue_type="variance_out_of_range",
                    column=c,
                    extra_exprs={"var": F.var_samp(F.col(c))},
                    expected=f"variance in [{lo},{hi}]",
                    judge=judge,
                )
            )
        return out


@register_validator("all_columns_unique_within_record", category="multi_column")
class AllColumnsUniqueWithinRecordValidator(Validator):
    """Every column value distinct within each row
    (reference: uniqueness/within_record.py:409)."""

    def __init__(self, columns: list[str] | None = None) -> None:
        self.columns = columns

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        cols = self.columns or df.columns
        arr = F.array(*[F.col(c).cast("string") for c in cols])
        pred = F.size(F.array_distinct(arr)) < F.size(arr)
        return [
            ExpressionSpec(
                name="all_columns_unique_within_record",
                issue_type="intra_row_duplicates",
                column=",".join(cols),
                count_expr=violation_count(pred),
                non_null_expr=F.count(F.lit(1)),
                filter_expr=pred,
                expected="all values distinct within each row",
            )
        ]


@register_validator("column_pair_unique", category="multi_column")
class ColumnPairUniqueValidator(Validator):
    """a ≠ b per row (reference: uniqueness/within_record.py:499)."""

    def __init__(self, column_a: str, column_b: str) -> None:
        self.column_a = column_a
        self.column_b = column_b

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        pred = (
            (F.col(self.column_a) == F.col(self.column_b))
            & F.col(self.column_a).isNotNull()
            & F.col(self.column_b).isNotNull()
        )
        return [
            ExpressionSpec(
                name="column_pair_unique",
                issue_type="pair_values_equal",
                column=f"{self.column_a},{self.column_b}",
                count_expr=violation_count(pred),
                non_null_expr=F.count(F.lit(1)),
                filter_expr=pred,
                expected=f"{self.column_a} != {self.column_b} per row",
            )
        ]
