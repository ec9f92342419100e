"""Query / expression validators (reference: src/truthound/validators/query/).

The UDF-and-SQL surface: arbitrary boolean Column expressions, conditional
checks, Spark SQL queries with result-shape assertions. SQL strings pass a
string-level injection guard ported from the reference
(validators/security/sql_security.py:361 SQLQueryValidator, policies :70).
"""

from __future__ import annotations

import re
from typing import Any, Callable

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from truthound_spark.core.base import ExpressionSpec, Validator, violation_count
from truthound_spark.core.registry import register_validator
from truthound_spark.core.results import ValidationIssue
from truthound_spark.types import Severity

# -- SQL security guard (string-level, reference sql_security.py) -----------
_FORBIDDEN_SQL = re.compile(
    r"\b(insert|update|delete|drop|alter|create|truncate|grant|revoke|merge)\b|;",
    re.IGNORECASE,
)


def check_sql_safety(query: str) -> None:
    m = _FORBIDDEN_SQL.search(query)
    if m:
        raise ValueError(f"query contains forbidden token {m.group(0)!r}; SELECT-only")


def _to_column(expr: str | Column) -> Column:
    return F.expr(expr) if isinstance(expr, str) else expr


@register_validator("custom_expression", category="query")
class CustomExpressionValidator(Validator):
    """Arbitrary boolean expression = pass predicate
    (reference: query/expression.py:17)."""

    def __init__(self, expression: str | Column, name: str | None = None) -> None:
        self.expression = expression
        self._name = name or "custom_expression"

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        ok = _to_column(self.expression)
        pred = ~ok | ok.isNull()
        return [
            ExpressionSpec(
                name=self._name,
                issue_type="expression_violation",
                column=None,
                count_expr=violation_count(pred),
                non_null_expr=F.count(F.lit(1)),
                filter_expr=pred,
                expected=str(self.expression),
            )
        ]


@register_validator("conditional_expression", category="query")
class ConditionalExpressionValidator(Validator):
    """IF cond THEN check; counts `cond & ~then` in one fused agg
    (reference: query/expression.py:41-101, count at :72-77)."""

    def __init__(self, condition: str | Column, then: str | Column) -> None:
        self.condition = condition
        self.then = then

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        cond = _to_column(self.condition)
        then = _to_column(self.then)
        pred = cond & (~then | then.isNull())
        return [
            ExpressionSpec(
                name="conditional_expression",
                issue_type="conditional_violation",
                column=None,
                count_expr=violation_count(pred),
                non_null_expr=violation_count(cond),
                filter_expr=pred,
                expected=f"WHEN {self.condition} THEN {self.then}",
            )
        ]


@register_validator("multi_condition", category="query")
class MultiConditionValidator(Validator):
    """AND/OR composition of conditions (reference: expression.py:103)."""

    def __init__(self, conditions: list[str | Column], combine: str = "and") -> None:
        self.conditions = conditions
        self.combine = combine

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        cols = [_to_column(c) for c in self.conditions]
        combined = cols[0]
        for c in cols[1:]:
            combined = (combined & c) if self.combine == "and" else (combined | c)
        pred = ~combined | combined.isNull()
        return [
            ExpressionSpec(
                name="multi_condition",
                issue_type="multi_condition_violation",
                column=None,
                count_expr=violation_count(pred),
                non_null_expr=F.count(F.lit(1)),
                filter_expr=pred,
                expected=f" {self.combine.upper()} ".join(str(c) for c in self.conditions),
            )
        ]


@register_validator("row_level", category="query")
class RowLevelValidator(Validator):
    """Per-row Python predicate — the explicit UDF surface
    (reference: query/expression.py:187).

    Deliberately Arrow-vectorized: the user function receives a pandas
    Series batch and returns a boolean Series (10-100x faster than
    row-at-a-time; pyspark_guide 'UDFs are the slow path').
    """

    def __init__(self, column: str, fn: Callable, vectorized: bool = True) -> None:
        self.column = column
        self.fn = fn
        self.vectorized = vectorized

    def validate(self, df: DataFrame, row_count: int | None = None) -> list[ValidationIssue]:
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        fn = self.fn
        if self.vectorized:
            @pandas_udf("boolean")
            def ok_udf(s: pd.Series) -> pd.Series:
                return s.map(lambda v: bool(fn(v)))
        else:  # row-at-a-time escape hatch
            ok_udf = F.udf(lambda v: bool(fn(v)), "boolean")
        agg = df.select(ok_udf(F.col(self.column)).alias("__ok")).agg(
            F.sum(F.when(~F.col("__ok") | F.col("__ok").isNull(), 1).otherwise(0)).alias("bad"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        bad, n = int(agg["bad"] or 0), int(agg["n"] or 0)
        if bad == 0:
            return []
        return [
            ValidationIssue(
                column=self.column,
                issue_type="row_level_violation",
                count=bad,
                severity=Severity.MEDIUM,
                validator_name="row_level",
                expected="custom predicate true",
                actual=bad,
                details=f"{bad}/{n} rows fail custom predicate",
            )
        ]


class _SQLBase(Validator):
    """Run user SQL over the frame via a temp view (reference: query/base.py:59
    runs SQL via pl.SQLContext at base.py:133 → Spark: spark.sql)."""

    def __init__(self, query: str, view_name: str = "data") -> None:
        check_sql_safety(query)
        self.query = query
        self.view_name = view_name

    def _run(self, df: DataFrame) -> DataFrame:
        df.createOrReplaceTempView(self.view_name)
        return df.sparkSession.sql(self.query)


@register_validator("query_returns_no_rows", category="query")
class QueryReturnsNoRowsValidator(_SQLBase):
    """Violation query must return 0 rows (reference: query/result.py:109)."""

    def validate(self, df: DataFrame, row_count: int | None = None) -> list[ValidationIssue]:
        res = self._run(df)
        n = res.limit(100000).count()
        if n == 0:
            return []
        return [
            ValidationIssue(
                column=None,
                issue_type="query_returned_rows",
                count=int(n),
                severity=Severity.HIGH,
                validator_name="query_returns_no_rows",
                expected="0 rows",
                actual=int(n),
                details=f"violation query returned {n} rows",
                sample_values=[r.asDict() for r in res.limit(5).collect()],
            )
        ]


@register_validator("query_returns_single_value", category="query")
class QueryReturnsSingleValueValidator(_SQLBase):
    """Scalar query result equals expected (reference: query/result.py:18)."""

    def __init__(self, query: str, expected_value: Any, view_name: str = "data") -> None:
        super().__init__(query, view_name)
        self.expected_value = expected_value

    def validate(self, df: DataFrame, row_count: int | None = None) -> list[ValidationIssue]:
        rows = self._run(df).limit(2).collect()
        value = rows[0][0] if rows else None
        if len(rows) == 1 and value == self.expected_value:
            return []
        return [
            ValidationIssue(
                column=None,
                issue_type="query_value_mismatch",
                count=1,
                severity=Severity.HIGH,
                validator_name="query_returns_single_value",
                expected=self.expected_value,
                actual=value,
                details=f"query returned {value!r}, expected {self.expected_value!r}",
            )
        ]


@register_validator("query_row_count", category="query")
class QueryRowCountValidator(_SQLBase):
    """Query row count within bounds (reference: query/row_count.py:17)."""

    def __init__(self, query: str, min_count: int = 0, max_count: int | None = None, view_name: str = "data") -> None:
        super().__init__(query, view_name)
        self.min_count = min_count
        self.max_count = max_count

    def validate(self, df: DataFrame, row_count: int | None = None) -> list[ValidationIssue]:
        n = self._run(df).count()
        ok = n >= self.min_count and (self.max_count is None or n <= self.max_count)
        if ok:
            return []
        return [
            ValidationIssue(
                column=None,
                issue_type="query_row_count_out_of_range",
                count=int(n),
                severity=Severity.MEDIUM,
                validator_name="query_row_count",
                expected=f"[{self.min_count},{self.max_count}]",
                actual=int(n),
                details=f"query returned {n} rows",
            )
        ]


@register_validator("query_group_aggregate", category="query")
class QueryGroupAggregateValidator(Validator):
    """Per-group aggregate within bounds (reference: query/aggregate.py:144).
    groupBy(keys).agg(...) + violation filter — fully distributed."""

    def __init__(
        self,
        group_by: list[str],
        column: str,
        agg: str = "mean",
        min_value: float | None = None,
        max_value: float | None = None,
    ) -> None:
        self.group_by = group_by
        self.column = column
        self.agg = agg
        self.min_value = min_value
        self.max_value = max_value

    def validate(self, df: DataFrame, row_count: int | None = None) -> list[ValidationIssue]:
        fn = {"mean": F.mean, "sum": F.sum, "min": F.min, "max": F.max, "count": F.count}[self.agg]
        grouped = df.groupBy(*self.group_by).agg(fn(self.column).alias("__v"))
        pred = F.lit(False)
        if self.min_value is not None:
            pred = pred | (F.col("__v") < self.min_value)
        if self.max_value is not None:
            pred = pred | (F.col("__v") > self.max_value)
        bad = grouped.filter(pred)
        n = bad.count()
        if n == 0:
            return []
        return [
            ValidationIssue(
                column=self.column,
                issue_type="group_aggregate_out_of_range",
                count=int(n),
                severity=Severity.MEDIUM,
                validator_name="query_group_aggregate",
                expected=f"{self.agg}({self.column}) in [{self.min_value},{self.max_value}] per {self.group_by}",
                actual=int(n),
                details=f"{n} groups out of range",
                sample_values=[r.asDict() for r in bad.limit(10).collect()],
            )
        ]
