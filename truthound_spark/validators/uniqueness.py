"""Uniqueness validators (reference: src/truthound/validators/uniqueness/).

Exact paths use count_distinct (oracle-parity default, SURVEY §7.2);
``approx_*`` variants use Spark's built-in HLL++ sketch
(``approx_count_distinct``), replacing the reference's pure-Python
HyperLogLog (uniqueness/approximate.py:27-163) with a mergeable,
distributed implementation — the correct 100 TB scale path.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from truthound_spark.core.base import ExpressionSpec, Validator
from truthound_spark.core.registry import register_validator
from truthound_spark.core.results import ValidationIssue
from truthound_spark.types import Severity, severity_from_ratio


@register_validator("unique", category="uniqueness")
class UniqueValidator(Validator):
    """n_unique == non_null count (reference: uniqueness/unique.py:18-66)."""

    def __init__(self, columns: list[str] | None = None) -> None:
        self.columns = columns

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        out = []
        for c in self._target_columns(df, self.columns):
            def judge(m: dict[str, Any]) -> tuple[bool, Any, str]:
                dup = (m.get("denom") or 0) - (m.get("n_unique") or 0)
                return dup <= 0, dup, f"{dup} duplicate values"

            out.append(
                ExpressionSpec(
                    name="unique",
                    issue_type="duplicate_values",
                    column=c,
                    # count = non_null - n_unique (duplicated extras)
                    count_expr=F.count(F.col(c)) - F.countDistinct(F.col(c)),
                    non_null_expr=F.count(F.col(c)),
                    extra_exprs={"n_unique": F.countDistinct(F.col(c))},
                    expected="all values unique",
                    judge=judge,
                )
            )
        return out


@register_validator("unique_ratio", category="uniqueness")
class UniqueRatioValidator(Validator):
    """n_unique / non_null within range (reference: unique.py:189)."""

    def __init__(self, column: str, min_ratio: float = 0.0, max_ratio: float = 1.0) -> None:
        self.column = column
        self.min_ratio = min_ratio
        self.max_ratio = max_ratio

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        lo, hi = self.min_ratio, self.max_ratio

        def judge(m: dict[str, Any]) -> tuple[bool, Any, str]:
            denom = m.get("denom") or 0
            ratio = ((m.get("n_unique") or 0) / denom) if denom else 0.0
            return lo <= ratio <= hi, round(ratio, 6), f"unique ratio {ratio:.4f} ∉ [{lo},{hi}]"

        return [
            ExpressionSpec(
                name="unique_ratio",
                issue_type="unique_ratio_out_of_range",
                column=self.column,
                non_null_expr=F.count(F.col(self.column)),
                extra_exprs={"n_unique": F.countDistinct(F.col(self.column))},
                expected=f"unique ratio in [{lo},{hi}]",
                judge=judge,
            )
        ]


@register_validator("distinct_count", category="uniqueness")
class DistinctCountValidator(Validator):
    """n_unique within [min,max] (reference: unique.py:299)."""

    def __init__(self, column: str, min_count: int = 0, max_count: int | None = None) -> None:
        self.column = column
        self.min_count = min_count
        self.max_count = max_count

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        lo, hi = self.min_count, self.max_count

        def judge(m: dict[str, Any]) -> tuple[bool, Any, str]:
            n = m.get("n_unique") or 0
            ok = n >= lo and (hi is None or n <= hi)
            return ok, n, f"distinct count {n} ∉ [{lo},{hi}]"

        return [
            ExpressionSpec(
                name="distinct_count",
                issue_type="distinct_count_out_of_range",
                column=self.column,
                extra_exprs={"n_unique": F.countDistinct(F.col(self.column))},
                expected=f"distinct count in [{lo},{hi}]",
                judge=judge,
            )
        ]


@register_validator("approx_distinct_count", category="uniqueness")
class ApproxDistinctCountValidator(Validator):
    """HLL++ distinct estimate within range (reference: approximate.py:164).

    Spark's approx_count_distinct is a mergeable HyperLogLog++ sketch
    (partial-aggregated per partition) — the scale path for 100 TB columns
    where exact countDistinct would shuffle every value.
    """

    def __init__(self, column: str, min_count: int = 0, max_count: int | None = None, rsd: float = 0.05) -> None:
        self.column = column
        self.min_count = min_count
        self.max_count = max_count
        self.rsd = rsd

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        lo, hi, rsd = self.min_count, self.max_count, self.rsd

        def judge(m: dict[str, Any]) -> tuple[bool, Any, str]:
            n = m.get("approx") or 0
            slack = 1.0 + 2 * rsd
            ok = n >= lo / slack and (hi is None or n <= hi * slack)
            return ok, n, f"approx distinct {n} ∉ [{lo},{hi}] (rsd={rsd})"

        return [
            ExpressionSpec(
                name="approx_distinct_count",
                issue_type="distinct_count_out_of_range",
                column=self.column,
                extra_exprs={"approx": F.approx_count_distinct(self.column, rsd)},
                expected=f"approx distinct in [{lo},{hi}]",
                judge=judge,
            )
        ]


@register_validator("duplicate", category="uniqueness")
class DuplicateValidator(Validator):
    """Whole-row duplicate count (reference: uniqueness/duplicate.py:13-40,
    `pl.struct(cols).is_duplicated().sum()`).

    Spark: groupBy(all columns).count() keeps the computation distributed
    (one shuffle on the row-hash, map-side partial aggregation) — never a
    driver-side collect.
    """

    def __init__(self, columns: list[str] | None = None) -> None:
        self.columns = columns

    def validate(self, df: DataFrame, row_count: int | None = None) -> list[ValidationIssue]:
        cols = self.columns or df.columns
        grouped = df.groupBy(*cols).agg(F.count(F.lit(1)).alias("__n"))
        agg = grouped.agg(
            F.sum(F.when(F.col("__n") > 1, F.col("__n")).otherwise(F.lit(0))).alias("dup_rows"),
            F.sum("__n").alias("total"),
        ).collect()[0]
        dup = int(agg["dup_rows"] or 0)
        total = int(agg["total"] or 0)
        if dup == 0:
            return []
        ratio = dup / total if total else 0.0
        return [
            ValidationIssue(
                column=",".join(cols) if self.columns else None,
                issue_type="duplicate_rows",
                count=dup,
                severity=severity_from_ratio(ratio),
                validator_name="duplicate",
                expected="no duplicate rows",
                actual=dup,
                details=f"{dup} rows participate in duplicate groups ({ratio:.2%})",
            )
        ]


@register_validator("duplicate_within_group", category="uniqueness")
class DuplicateWithinGroupValidator(Validator):
    """Per-group duplicates of a check column (reference: duplicate.py:75-112
    grouped `count - n_unique`). Spark: groupBy(group).agg(count-countDistinct)."""

    def __init__(self, group_columns: list[str], column: str) -> None:
        self.group_columns = group_columns
        self.column = column

    def validate(self, df: DataFrame, row_count: int | None = None) -> list[ValidationIssue]:
        per_group = df.groupBy(*self.group_columns).agg(
            (F.count(F.col(self.column)) - F.countDistinct(F.col(self.column))).alias("__dups")
        )
        total = per_group.agg(F.sum("__dups").alias("d")).collect()[0]["d"] or 0
        if total == 0:
            return []
        return [
            ValidationIssue(
                column=self.column,
                issue_type="duplicate_within_group",
                count=int(total),
                severity=Severity.MEDIUM,
                validator_name="duplicate_within_group",
                expected=f"unique {self.column} within {self.group_columns}",
                actual=int(total),
                details=f"{total} duplicated values within groups",
            )
        ]


@register_validator("primary_key", category="uniqueness")
class PrimaryKeyValidator(Validator):
    """Unique AND not-null, single or compound key
    (reference: uniqueness/primary_key.py:13,94)."""

    def __init__(self, columns: list[str] | str) -> None:
        self.columns = [columns] if isinstance(columns, str) else list(columns)

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        key = F.struct(*[F.col(c) for c in self.columns]) if len(self.columns) > 1 else F.col(self.columns[0])
        null_pred = None
        for c in self.columns:
            p = F.col(c).isNull()
            null_pred = p if null_pred is None else (null_pred | p)

        def judge(m: dict[str, Any]) -> tuple[bool, Any, str]:
            nulls = m.get("nulls") or 0
            dups = (m.get("denom") or 0) - (m.get("n_unique") or 0)
            ok = nulls == 0 and dups <= 0
            return ok, {"nulls": nulls, "duplicates": max(dups, 0)}, (
                f"{nulls} null keys, {max(dups, 0)} duplicate keys"
            )

        return [
            ExpressionSpec(
                name="primary_key",
                issue_type="primary_key_violation",
                column=",".join(self.columns),
                count_expr=F.count(F.lit(1)) - F.countDistinct(key),
                non_null_expr=F.count(F.lit(1)),
                extra_exprs={
                    "n_unique": F.countDistinct(key),
                    "nulls": F.sum(F.when(null_pred, 1).otherwise(0)),
                },
                filter_expr=null_pred,
                expected="unique, non-null key",
                judge=judge,
                fixed_severity=Severity.CRITICAL,
            )
        ]


@register_validator("distinct_values_in_set", category="uniqueness")
class DistinctValuesInSetValidator(Validator):
    """distinct(col) ⊆ allowed set (reference: distinct_values.py:13)."""

    def __init__(self, column: str, allowed: list[Any]) -> None:
        self.column = column
        self.allowed = allowed

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        pred = ~F.col(self.column).isin(self.allowed) & F.col(self.column).isNotNull()
        return [
            ExpressionSpec(
                name="distinct_values_in_set",
                issue_type="unexpected_values",
                column=self.column,
                count_expr=F.sum(F.when(pred, 1).otherwise(0)),
                non_null_expr=F.count(F.col(self.column)),
                filter_expr=pred,
                expected=f"values ⊆ {self.allowed}",
            )
        ]


@register_validator("distinct_values_equal_set", category="uniqueness")
class DistinctValuesEqualSetValidator(Validator):
    """distinct(col) == expected set (reference: distinct_values.py:81).

    collect_set is bounded by the expected-set cardinality in practice;
    violation rows (values outside the set) are counted distributively.
    """

    def __init__(self, column: str, expected_set: list[Any]) -> None:
        self.column = column
        self.expected_set = expected_set

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        exp = set(self.expected_set)

        def judge(m: dict[str, Any]) -> tuple[bool, Any, str]:
            observed = set(m.get("observed") or [])
            missing = exp - observed
            extra = observed - exp
            ok = not missing and not extra
            return ok, sorted(observed), f"missing={sorted(missing)} extra={sorted(extra)}"

        return [
            ExpressionSpec(
                name="distinct_values_equal_set",
                issue_type="distinct_set_mismatch",
                column=self.column,
                extra_exprs={"observed": F.collect_set(F.col(self.column))},
                expected=sorted(exp),
                judge=judge,
            )
        ]


@register_validator("distinct_values_contain_set", category="uniqueness")
class DistinctValuesContainSetValidator(Validator):
    """expected set ⊆ distinct(col) (reference: distinct_values.py:173)."""

    def __init__(self, column: str, required: list[Any]) -> None:
        self.column = column
        self.required = required

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        req = set(self.required)

        def judge(m: dict[str, Any]) -> tuple[bool, Any, str]:
            observed = set(m.get("observed") or [])
            missing = req - observed
            return not missing, sorted(observed), f"missing required values {sorted(missing)}"

        return [
            ExpressionSpec(
                name="distinct_values_contain_set",
                issue_type="missing_required_values",
                column=self.column,
                extra_exprs={
                    # only collect values in the (small) required set — bounded
                    "observed": F.collect_set(
                        F.when(F.col(self.column).isin(list(req)), F.col(self.column))
                    )
                },
                expected=sorted(req),
                judge=judge,
            )
        ]


@register_validator("distinct_count_between", category="uniqueness")
class DistinctCountBetweenValidator(Validator):
    """Distinct count within [min, max] (reference:
    uniqueness/distinct_count.py DistinctCountBetweenValidator)."""

    name = "distinct_count_between"

    def __init__(
        self,
        column: str,
        min_count: int | None = None,
        max_count: int | None = None,
        approx: bool = False,
    ) -> None:
        self.column = column
        self.min_count = min_count
        self.max_count = max_count
        self.approx = approx

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        lo, hi = self.min_count, self.max_count
        distinct = (
            F.approx_count_distinct(F.col(self.column))
            if self.approx
            else F.count_distinct(F.col(self.column))
        )

        def judge(m: dict[str, Any]) -> tuple[bool, Any, str]:
            d = m.get("distinct") or 0
            ok = (lo is None or d >= lo) and (hi is None or d <= hi)
            return ok, d, f"distinct count {d} ∉ [{lo},{hi}]"

        return [
            ExpressionSpec(
                name=self.name,
                issue_type="distinct_count_out_of_range",
                column=self.column,
                extra_exprs={"distinct": distinct},
                expected=f"distinct count in [{lo},{hi}]",
                judge=judge,
            )
        ]


@register_validator("approximate_unique_ratio", category="uniqueness")
class ApproximateUniqueRatioValidator(Validator):
    """HLL-sketched unique ratio >= threshold (reference:
    uniqueness/approximate.py ApproximateUniqueRatioValidator). The 100 TB
    path: approx_count_distinct is a fixed-size sketch with map-side
    partial merge — no shuffle of values, only of sketches."""

    name = "approximate_unique_ratio"

    def __init__(self, column: str, min_ratio: float = 1.0, rsd: float = 0.05) -> None:
        self.column = column
        self.min_ratio = min_ratio
        self.rsd = rsd

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        min_ratio = self.min_ratio

        def judge(m: dict[str, Any]) -> tuple[bool, Any, str]:
            nn = m.get("nn") or 0
            d = m.get("distinct") or 0
            ratio = d / nn if nn else 1.0
            # sketch can overcount slightly past the exact cardinality
            ratio = min(ratio, 1.0)
            return (
                ratio >= min_ratio,
                round(ratio, 6),
                f"approx unique ratio {ratio:.4f} < {min_ratio}",
            )

        return [
            ExpressionSpec(
                name=self.name,
                issue_type="unique_ratio_too_low",
                column=self.column,
                extra_exprs={
                    "nn": F.count(F.col(self.column)),
                    "distinct": F.approx_count_distinct(F.col(self.column), self.rsd),
                },
                expected=f"approx unique ratio >= {min_ratio}",
                judge=judge,
            )
        ]


@register_validator("streaming_distinct_count", category="uniqueness")
class StreamingDistinctCountValidator(Validator):
    """Bounded-memory distinct count for unbounded/streaming input
    (reference: validators/memory/streaming.py StreamingDistinctCountValidator,
    which maintains an incremental HLL). Spark's approx_count_distinct is
    the same HyperLogLog++ sketch and is legal in streaming aggregations,
    so batch and foreachBatch paths share this validator unchanged."""

    name = "streaming_distinct_count"

    def __init__(
        self,
        column: str,
        min_count: int | None = None,
        max_count: int | None = None,
        rsd: float = 0.05,
    ) -> None:
        self.column = column
        self.min_count = min_count
        self.max_count = max_count
        self.rsd = rsd

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        lo, hi = self.min_count, self.max_count

        def judge(m: dict[str, Any]) -> tuple[bool, Any, str]:
            d = m.get("distinct") or 0
            ok = (lo is None or d >= lo) and (hi is None or d <= hi)
            return ok, d, f"streaming distinct ~{d} ∉ [{lo},{hi}]"

        return [
            ExpressionSpec(
                name=self.name,
                issue_type="distinct_count_out_of_range",
                column=self.column,
                extra_exprs={
                    "distinct": F.approx_count_distinct(F.col(self.column), self.rsd)
                },
                expected=f"distinct count in [{lo},{hi}] (HLL rsd={self.rsd})",
                judge=judge,
            )
        ]
