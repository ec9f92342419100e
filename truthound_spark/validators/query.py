"""Query / expression validators (reference: src/truthound/validators/query/).

The UDF-and-SQL surface: arbitrary boolean Column expressions, conditional
checks, Spark SQL queries with result-shape assertions. SQL strings pass a
string-level injection guard ported from the reference
(validators/security/sql_security.py:361 SQLQueryValidator, policies :70).
"""

from __future__ import annotations

import logging
import re
from typing import Any, Callable

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from truthound_spark.core.base import ExpressionSpec, Validator, violation_count
from truthound_spark.core.registry import register_validator
from truthound_spark.core.results import ValidationIssue
from truthound_spark.types import Severity

logger = logging.getLogger(__name__)

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

    def __init__(
        self, expression: str | Column, name: str | None = None, mostly: float = 1.0
    ) -> None:
        self.expression = expression
        self._name = name or "custom_expression"
        self.mostly = mostly

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        ok = _to_column(self.expression)
        pred = ~ok | ok.isNull()
        mostly = self.mostly

        def judge(m):
            denom = m.get("denom") or 0
            count = int(m.get("count") or 0)
            ok_ratio = 1.0 - (count / denom) if denom else 1.0
            return (
                ok_ratio >= mostly,
                count,
                f"{count}/{denom} rows violate ({ok_ratio:.2%} pass < {mostly:.2%})",
            )

        return [
            ExpressionSpec(
                name=self._name,
                issue_type="expression_violation",
                column=None,
                count_expr=violation_count(pred),
                non_null_expr=F.count(F.lit(1)),
                filter_expr=pred,
                expected=str(self.expression),
                judge=judge if self.mostly < 1.0 else None,
            )
        ]


@register_validator("conditional_expression", category="query")
class ConditionalExpressionValidator(Validator):
    """IF cond THEN check; counts `cond & ~then` in one fused agg
    (reference: query/expression.py:41-101, count at :72-77)."""

    def __init__(
        self, condition: str | Column, then: str | Column, mostly: float = 1.0
    ) -> None:
        self.condition = condition
        self.then = then
        self.mostly = mostly

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        cond = _to_column(self.condition)
        then = _to_column(self.then)
        pred = cond & (~then | then.isNull())
        mostly = self.mostly

        def judge(m):
            # denom = rows where the condition holds; tolerate up to
            # (1-mostly) of them violating (mined-rule enforcement at
            # the rule's own confidence)
            denom = m.get("denom") or 0
            count = int(m.get("count") or 0)
            ok_ratio = 1.0 - (count / denom) if denom else 1.0
            return (
                ok_ratio >= mostly,
                count,
                f"{count}/{denom} conditioned rows violate",
            )

        return [
            ExpressionSpec(
                name="conditional_expression",
                issue_type="conditional_violation",
                column=None,
                count_expr=violation_count(pred),
                non_null_expr=violation_count(cond),
                filter_expr=pred,
                expected=f"WHEN {self.condition} THEN {self.then}",
                judge=judge if self.mostly < 1.0 else None,
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

    Deliberately Arrow-vectorized BY DEFAULT while keeping the exact
    per-row contract: the user function is still called once per value,
    but inside Arrow-batched pandas Series (the batching alone is ~10x
    over a row-at-a-time F.udf — serialization dominates, not the
    Python call). Contract parity details the fast path must honor:

    * NULLs arrive as ``None`` and genuine NaN doubles arrive as ``nan``
      on BOTH transports: the null mask is computed JVM-side with
      ``isNull()`` and shipped alongside the values, because after Arrow
      transfer a float pandas Series cannot tell SQL NULL from NaN — a
      predicate like ``v is not None`` must count identically either way.
    * a callable whose values break Arrow conversion falls back to the
      row-at-a-time path AUTOMATICALLY (one retry per validate call);
      ``vectorized=False`` pins the slow path up front.
    """

    def __init__(self, column: str, fn: Callable, vectorized: bool = True) -> None:
        self.column = column
        self.fn = fn
        self.vectorized = vectorized

    def _agg_row(self, df: DataFrame, ok_col: Column):
        return (
            df.select(ok_col.alias("__ok"))
            .agg(
                F.sum(
                    F.when(~F.col("__ok") | F.col("__ok").isNull(), 1).otherwise(0)
                ).alias("bad"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()[0]
        )

    def validate(self, df: DataFrame, row_count: int | None = None) -> list[ValidationIssue]:
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        fn = self.fn

        def slow_col():
            return F.udf(lambda v: bool(fn(v)), "boolean")(F.col(self.column))

        if self.vectorized:
            @pandas_udf("boolean")
            def ok_udf(s: pd.Series, isnull: pd.Series) -> pd.Series:
                # Restore the F.udf null contract EXACTLY: only rows that
                # are null JVM-side become None — the null mask is computed
                # with isNull() BEFORE Arrow transfer, because a pandas
                # float Series cannot tell an SQL NULL from a genuine NaN
                # double (both arrive as nan; `s.notna()` would hand fn
                # None for real NaN values, where F.udf hands it nan —
                # ADVICE r12). Non-null values keep their pandas scalar
                # form (real NaN stays nan) via the object-dtype cast.
                vals = s.astype(object)
                vals[isnull.astype(bool).values] = None
                return vals.map(lambda v: bool(fn(v)))

            try:
                agg = self._agg_row(
                    df, ok_udf(F.col(self.column), F.col(self.column).isNull())
                )
            except Exception as exc:
                # Arrow conversion failed for this callable/column — same
                # per-row contract, row-at-a-time transport. Logged, not
                # swallowed: if the failure was a user-predicate bug the
                # slow path re-raises it, but the FIRST traceback (which
                # may differ, e.g. an executor-side transient) must stay
                # visible rather than be masked by the retry (ADVICE r12).
                logger.warning(
                    "vectorized row_level path failed on column %r (%s: %s); "
                    "retrying with row-at-a-time F.udf transport",
                    self.column,
                    type(exc).__name__,
                    exc,
                )
                agg = self._agg_row(df, slow_col())
        else:  # row-at-a-time pinned by the caller
            agg = self._agg_row(df, slow_col())
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


@register_validator("query_returns_rows", category="query")
class QueryReturnsRowsValidator(_SQLBase):
    """Query must return ≥1 row (reference: query/result.py:168)."""

    def validate(self, df: DataFrame, row_count: int | None = None) -> list[ValidationIssue]:
        if not self._run(df).limit(1).isEmpty():
            return []
        return [
            ValidationIssue(
                column=None,
                issue_type="query_returned_no_rows",
                count=0,
                severity=Severity.HIGH,
                validator_name="query_returns_rows",
                expected=">= 1 row",
                actual=0,
                details="query returned no rows",
            )
        ]


@register_validator("query_matches", category="query")
class QueryMatchesValidator(_SQLBase):
    """Query result must equal an expected list of rows, order-insensitive
    (reference: query/result.py:230)."""

    def __init__(self, query: str, expected_rows: list[tuple], view_name: str = "data") -> None:
        super().__init__(query, view_name)
        self.expected_rows = expected_rows

    def validate(self, df: DataFrame, row_count: int | None = None) -> list[ValidationIssue]:
        got = sorted(tuple(r) for r in self._run(df).limit(len(self.expected_rows) + 101).collect())
        exp = sorted(tuple(r) for r in self.expected_rows)
        if got == exp:
            return []
        return [
            ValidationIssue(
                column=None,
                issue_type="query_result_mismatch",
                count=abs(len(got) - len(exp)) or 1,
                severity=Severity.HIGH,
                validator_name="query_matches",
                expected=exp[:10],
                actual=got[:10],
                details=f"query returned {len(got)} rows, expected {len(exp)}",
            )
        ]


@register_validator("query_row_count_ratio", category="query")
class QueryRowCountRatioValidator(_SQLBase):
    """count(query) / count(data) within bounds (reference: query/row_count.py:104)."""

    def __init__(
        self,
        query: str,
        min_ratio: float = 0.0,
        max_ratio: float = 1.0,
        view_name: str = "data",
    ) -> None:
        super().__init__(query, view_name)
        self.min_ratio = min_ratio
        self.max_ratio = max_ratio

    def validate(self, df: DataFrame, row_count: int | None = None) -> list[ValidationIssue]:
        n = self._run(df).count()
        total = row_count if row_count is not None else df.count()
        ratio = n / total if total else 0.0
        if self.min_ratio <= ratio <= self.max_ratio:
            return []
        return [
            ValidationIssue(
                column=None,
                issue_type="query_row_count_ratio_out_of_range",
                count=int(n),
                severity=Severity.MEDIUM,
                validator_name="query_row_count_ratio",
                expected=f"ratio in [{self.min_ratio},{self.max_ratio}]",
                actual=round(ratio, 6),
                details=f"{n}/{total} rows = {ratio:.4f}",
            )
        ]


@register_validator("query_row_count_compare", category="query")
class QueryRowCountCompareValidator(_SQLBase):
    """Row counts of two queries compared (reference: query/row_count.py:180)."""

    OPS = {
        "==": lambda a, b: a == b,
        "<=": lambda a, b: a <= b,
        ">=": lambda a, b: a >= b,
        "<": lambda a, b: a < b,
        ">": lambda a, b: a > b,
    }

    def __init__(self, query: str, other_query: str, op: str = "==", view_name: str = "data") -> None:
        super().__init__(query, view_name)
        check_sql_safety(other_query)
        self.other_query = other_query
        self.op = op

    def validate(self, df: DataFrame, row_count: int | None = None) -> list[ValidationIssue]:
        df.createOrReplaceTempView(self.view_name)
        spark = df.sparkSession
        a = spark.sql(self.query).count()
        b = spark.sql(self.other_query).count()
        if self.OPS[self.op](a, b):
            return []
        return [
            ValidationIssue(
                column=None,
                issue_type="query_row_count_compare_failed",
                count=int(abs(a - b)),
                severity=Severity.MEDIUM,
                validator_name="query_row_count_compare",
                expected=f"count(q1) {self.op} count(q2)",
                actual={"q1": int(a), "q2": int(b)},
                details=f"{a} {self.op} {b} is false",
            )
        ]


@register_validator("query_column_values", category="query")
class QueryColumnValuesValidator(_SQLBase):
    """First result column values ⊆ allowed set (reference: query/column.py:17)."""

    def __init__(self, query: str, allowed: list[Any], view_name: str = "data") -> None:
        super().__init__(query, view_name)
        self.allowed = allowed

    def validate(self, df: DataFrame, row_count: int | None = None) -> list[ValidationIssue]:
        res = self._run(df)
        col = res.columns[0]
        bad = res.filter(~F.col(col).isin(self.allowed) & F.col(col).isNotNull())
        n = bad.count()
        if n == 0:
            return []
        return [
            ValidationIssue(
                column=col,
                issue_type="query_column_unexpected_values",
                count=int(n),
                severity=Severity.MEDIUM,
                validator_name="query_column_values",
                expected=f"values ⊆ {self.allowed}",
                actual=int(n),
                details=f"{n} result values outside allowed set",
                sample_values=[r[col] for r in bad.limit(10).collect()],
            )
        ]


@register_validator("query_column_unique", category="query")
class QueryColumnUniqueValidator(_SQLBase):
    """First result column must be unique (reference: query/column.py:118)."""

    def validate(self, df: DataFrame, row_count: int | None = None) -> list[ValidationIssue]:
        res = self._run(df)
        col = res.columns[0]
        agg = res.agg(
            (F.count(F.col(col)) - F.countDistinct(F.col(col))).alias("dups")
        ).collect()[0]
        dups = int(agg["dups"] or 0)
        if dups == 0:
            return []
        return [
            ValidationIssue(
                column=col,
                issue_type="query_column_duplicates",
                count=dups,
                severity=Severity.MEDIUM,
                validator_name="query_column_unique",
                expected="unique result column",
                actual=dups,
                details=f"{dups} duplicate values in query result",
            )
        ]


@register_validator("query_column_not_null", category="query")
class QueryColumnNotNullValidator(_SQLBase):
    """First result column must contain no nulls (reference: query/column.py:188)."""

    def validate(self, df: DataFrame, row_count: int | None = None) -> list[ValidationIssue]:
        res = self._run(df)
        col = res.columns[0]
        n = res.filter(F.col(col).isNull()).count()
        if n == 0:
            return []
        return [
            ValidationIssue(
                column=col,
                issue_type="query_column_nulls",
                count=int(n),
                severity=Severity.MEDIUM,
                validator_name="query_column_not_null",
                expected="no nulls in result column",
                actual=int(n),
                details=f"{n} null values in query result",
            )
        ]


@register_validator("query_aggregate", category="query")
class QueryAggregateValidator(_SQLBase):
    """Aggregate of the first result column within bounds
    (reference: query/aggregate.py:17)."""

    def __init__(
        self,
        query: str,
        agg: str = "mean",
        min_value: float | None = None,
        max_value: float | None = None,
        view_name: str = "data",
    ) -> None:
        super().__init__(query, view_name)
        self.agg = agg
        self.min_value = min_value
        self.max_value = max_value

    def validate(self, df: DataFrame, row_count: int | None = None) -> list[ValidationIssue]:
        res = self._run(df)
        col = res.columns[0]
        fn = {"mean": F.mean, "sum": F.sum, "min": F.min, "max": F.max, "count": F.count}[self.agg]
        v = res.agg(fn(F.col(col)).alias("v")).collect()[0]["v"]
        ok = (
            v is not None
            and (self.min_value is None or v >= self.min_value)
            and (self.max_value is None or v <= self.max_value)
        )
        if ok:
            return []
        return [
            ValidationIssue(
                column=col,
                issue_type="query_aggregate_out_of_range",
                count=1,
                severity=Severity.MEDIUM,
                validator_name="query_aggregate",
                expected=f"{self.agg} in [{self.min_value},{self.max_value}]",
                actual=v,
                details=f"{self.agg}({col}) = {v}",
            )
        ]


@register_validator("query_aggregate_compare", category="query")
class QueryAggregateCompareValidator(_SQLBase):
    """Aggregates of two queries compared within tolerance
    (reference: query/aggregate.py:248)."""

    def __init__(
        self,
        query: str,
        other_query: str,
        agg: str = "sum",
        rel_tolerance: float = 0.0,
        view_name: str = "data",
    ) -> None:
        super().__init__(query, view_name)
        check_sql_safety(other_query)
        self.other_query = other_query
        self.agg = agg
        self.rel_tolerance = rel_tolerance

    def validate(self, df: DataFrame, row_count: int | None = None) -> list[ValidationIssue]:
        df.createOrReplaceTempView(self.view_name)
        spark = df.sparkSession
        fn = {"mean": F.mean, "sum": F.sum, "min": F.min, "max": F.max, "count": F.count}[self.agg]
        ra = spark.sql(self.query)
        rb = spark.sql(self.other_query)
        va = ra.agg(fn(F.col(ra.columns[0])).alias("v")).collect()[0]["v"]
        vb = rb.agg(fn(F.col(rb.columns[0])).alias("v")).collect()[0]["v"]
        if va is not None and vb is not None:
            rel = abs(va - vb) / (abs(vb) + 1e-10)
            if rel <= self.rel_tolerance:
                return []
        return [
            ValidationIssue(
                column=None,
                issue_type="query_aggregate_compare_failed",
                count=1,
                severity=Severity.MEDIUM,
                validator_name="query_aggregate_compare",
                expected=f"|Δ{self.agg}| rel <= {self.rel_tolerance}",
                actual={"q1": va, "q2": vb},
                details=f"{self.agg}: {va} vs {vb}",
            )
        ]
