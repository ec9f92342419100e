"""Schema-structure validators: column existence / order / type / count and
the two-column calculation check.

Reference: src/truthound/validators/schema/column_exists.py:16-90,
column_order.py:16-100, column_type.py:16-150, column_count.py,
multi_column_aggregate.py:113-210.

All structural checks here read ``df.schema`` on the driver — zero Spark
jobs at any scale. Only ``multi_column_calculation`` scans data (fused
single-agg conditional sum).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from truthound_spark.core.base import ExpressionSpec, Validator, violation_count
from truthound_spark.core.registry import register_validator
from truthound_spark.core.results import ValidationIssue
from truthound_spark.types import Severity

#: Friendly type aliases → Spark simpleString sets
#: (reference: schema/column_type.py:23-40 TYPE_ALIASES for Polars dtypes).
TYPE_ALIASES: dict[str, set[str]] = {
    "int": {"tinyint", "smallint", "int", "bigint"},
    "integer": {"tinyint", "smallint", "int", "bigint"},
    "float": {"float", "double"},
    "numeric": {"tinyint", "smallint", "int", "bigint", "float", "double", "decimal"},
    "str": {"string"},
    "string": {"string"},
    "bool": {"boolean"},
    "boolean": {"boolean"},
    "date": {"date"},
    "datetime": {"timestamp", "timestamp_ntz"},
    "timestamp": {"timestamp", "timestamp_ntz"},
    "binary": {"binary"},
}


def _accepts(declared: str, actual_simple: str) -> bool:
    d = declared.lower()
    if d in TYPE_ALIASES:
        return actual_simple.split("(")[0] in TYPE_ALIASES[d]
    return actual_simple == d or actual_simple.startswith(d)


@register_validator("column_exists", category="schema")
class ColumnExistsValidator(Validator):
    """Required columns present (reference: schema/column_exists.py:16-52)."""

    name = "column_exists"

    def __init__(self, columns: list[str]) -> None:
        self.expected_columns = columns

    def validate(self, df: DataFrame, row_count: int | None = None) -> list[ValidationIssue]:
        missing = [c for c in self.expected_columns if c not in df.columns]
        if not missing:
            return []
        return [
            ValidationIssue(
                column=c,
                issue_type="column_missing",
                count=1,
                severity=Severity.CRITICAL,
                validator_name=self.name,
                expected=f"column '{c}' present",
                details=f"Required column '{c}' not found",
            )
            for c in missing
        ]


@register_validator("column_not_exists", category="schema")
class ColumnNotExistsValidator(Validator):
    """Forbidden columns absent (reference: schema/column_exists.py:57-90)."""

    name = "column_not_exists"

    def __init__(self, columns: list[str]) -> None:
        self.forbidden_columns = columns

    def validate(self, df: DataFrame, row_count: int | None = None) -> list[ValidationIssue]:
        present = [c for c in self.forbidden_columns if c in df.columns]
        return [
            ValidationIssue(
                column=c,
                issue_type="forbidden_column_present",
                count=1,
                severity=Severity.HIGH,
                validator_name=self.name,
                expected=f"column '{c}' absent",
                details=f"Forbidden column '{c}' present",
            )
            for c in present
        ]


@register_validator("column_order", category="schema")
class ColumnOrderValidator(Validator):
    """Columns appear in expected order (reference: schema/column_order.py:16-100).
    ``strict=False`` allows extra columns interleaved (subsequence match)."""

    name = "column_order"

    def __init__(self, expected_order: list[str], strict: bool = True) -> None:
        self.expected_order = expected_order
        self.strict = strict

    def validate(self, df: DataFrame, row_count: int | None = None) -> list[ValidationIssue]:
        actual = df.columns
        if self.strict:
            relevant = [c for c in actual if c in set(self.expected_order)]
            ok = relevant == [c for c in self.expected_order if c in set(actual)]
        else:
            it = iter(actual)
            ok = all(c in it for c in self.expected_order if c in set(actual))
        if ok:
            return []
        return [
            ValidationIssue(
                column=None,
                issue_type="column_order_mismatch",
                count=1,
                severity=Severity.LOW,
                validator_name=self.name,
                expected=self.expected_order,
                actual=actual,
                details=f"Column order {actual} does not match expected {self.expected_order}",
            )
        ]


@register_validator("column_type", category="schema")
class ColumnTypeValidator(Validator):
    """Column types match expected, with friendly aliases ("int", "float",
    "datetime"…) (reference: schema/column_type.py:16-150)."""

    name = "column_type"

    def __init__(self, column_types: dict[str, str]) -> None:
        self.column_types = column_types

    def validate(self, df: DataFrame, row_count: int | None = None) -> list[ValidationIssue]:
        actual = {f.name: f.dataType.simpleString().lower() for f in df.schema.fields}
        issues: list[ValidationIssue] = []
        for col, want in self.column_types.items():
            if col not in actual:
                issues.append(
                    ValidationIssue(
                        column=col,
                        issue_type="column_missing",
                        count=1,
                        severity=Severity.CRITICAL,
                        validator_name=self.name,
                        expected=f"column '{col}' of type {want}",
                        details=f"Column '{col}' not found",
                    )
                )
            elif not _accepts(want, actual[col]):
                issues.append(
                    ValidationIssue(
                        column=col,
                        issue_type="column_type_mismatch",
                        count=1,
                        severity=Severity.HIGH,
                        validator_name=self.name,
                        expected=want,
                        actual=actual[col],
                        details=f"Column '{col}' is {actual[col]}, expected {want}",
                    )
                )
        return issues


@register_validator("column_count", category="schema")
class ColumnCountValidator(Validator):
    """Schema column count (reference: schema/column_count.py). Same
    contract as table_column_count; registered under the schema-category
    name for reference parity."""

    name = "column_count"

    def __init__(
        self,
        expected_count: int | None = None,
        min_count: int | None = None,
        max_count: int | None = None,
    ) -> None:
        from truthound_spark.validators.table import TableColumnCountValidator

        self._inner = TableColumnCountValidator(
            expected_count=expected_count, min_count=min_count, max_count=max_count
        )

    def validate(self, df: DataFrame, row_count: int | None = None) -> list[ValidationIssue]:
        issues = self._inner.validate(df, row_count)
        for i in issues:
            i.validator_name = self.name
        return issues


@register_validator("multi_column_calculation", category="schema")
class MultiColumnCalculationValidator(Validator):
    """left OP right == equals_column/equals_value ± tolerance
    (reference: schema/multi_column_aggregate.py:113-210)."""

    name = "multi_column_calculation"
    OPERATORS = ("+", "-", "*", "/")

    def __init__(
        self,
        left_column: str,
        operator: str,
        right_column: str,
        equals_column: str | None = None,
        equals_value: float | None = None,
        tolerance: float = 0.0,
    ) -> None:
        if operator not in self.OPERATORS:
            raise ValueError(f"operator must be one of {self.OPERATORS}")
        if equals_column is None and equals_value is None:
            raise ValueError("One of equals_column/equals_value required")
        self.left_column = left_column
        self.operator = operator
        self.right_column = right_column
        self.equals_column = equals_column
        self.equals_value = equals_value
        self.tolerance = tolerance

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        a, b = F.col(self.left_column), F.col(self.right_column)
        calc = {
            "+": a + b,
            "-": a - b,
            "*": a * b,
            "/": a / F.nullif(b, F.lit(0)),
        }[self.operator]
        target = (
            F.col(self.equals_column)
            if self.equals_column is not None
            else F.lit(self.equals_value)
        )
        pred = (
            (F.abs(calc - target) > self.tolerance)
            & a.isNotNull()
            & b.isNotNull()
        )
        expected = (
            f"{self.left_column} {self.operator} {self.right_column} == "
            f"{self.equals_column or self.equals_value} ± {self.tolerance}"
        )
        return [
            ExpressionSpec(
                name=self.name,
                issue_type="calculation_mismatch",
                column=f"{self.left_column},{self.right_column}",
                count_expr=violation_count(pred),
                non_null_expr=F.count(F.lit(1)),
                filter_expr=pred,
                expected=expected,
            )
        ]


@register_validator("compound_key", category="uniqueness")
class CompoundKeyValidator(Validator):
    """Multi-column key: unique and fully non-null (reference:
    uniqueness/primary_key.py CompoundKeyValidator). One fused agg:
    count, count_distinct(struct), per-column null counts."""

    name = "compound_key"

    def __init__(self, columns: list[str]) -> None:
        self.columns = columns

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        combo = F.struct(*[F.col(c) for c in self.columns])
        any_null = F.lit(False)
        for c in self.columns:
            any_null = any_null | F.col(c).isNull()

        def judge(m: dict[str, Any]) -> tuple[bool, Any, str]:
            n = m.get("n") or 0
            d = m.get("distinct") or 0
            nulls = m.get("nulls") or 0
            # count_distinct over a struct counts every row (a struct of
            # nulls is still a non-null struct), so duplicates are n - d.
            dupes = max(n - d, 0)
            problems = []
            if nulls:
                problems.append(f"{nulls} rows with null key parts")
            if dupes > 0:
                problems.append(f"{dupes} duplicate key combinations")
            return (
                not problems,
                {"duplicates": dupes, "nulls": nulls},
                "; ".join(problems),
            )

        return [
            ExpressionSpec(
                name=self.name,
                issue_type="compound_key_violation",
                column=",".join(self.columns),
                extra_exprs={
                    "n": F.count(F.lit(1)),
                    "distinct": F.count_distinct(combo),
                    "nulls": F.sum(F.when(any_null, 1).otherwise(0)),
                },
                filter_expr=any_null,
                expected=f"{self.columns} unique and non-null",
                judge=judge,
                fixed_severity=Severity.CRITICAL,
            )
        ]
