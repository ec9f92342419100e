"""Multi-column / in-row relation validators.

Reference: src/truthound/validators/multi_column/statistical.py (corr,
covariance), arithmetic.py (column sums), schema/column_pair.py (pairwise
relations), uniqueness/within_record.py (intra-row uniqueness).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
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


# ---------------------------------------------------------------------------
# Arithmetic family (reference: multi_column/arithmetic.py:15-260).
# Computed expression vs result column/constant within tolerance, or within
# [min_value, max_value] bounds — all pure column math, fused single agg.
# ---------------------------------------------------------------------------
class _ArithmeticValidator(Validator):
    """Shared plumbing: computed expr compared to result_column /
    expected_value / bounds (reference: multi_column/arithmetic.py base)."""

    issue_type = "arithmetic_mismatch"

    def __init__(
        self,
        columns: list[str],
        result_column: str | None = None,
        expected_value: float | None = None,
        min_value: float | None = None,
        max_value: float | None = None,
        tolerance: float = 1e-9,
    ) -> None:
        if (
            result_column is None
            and expected_value is None
            and min_value is None
            and max_value is None
        ):
            raise ValueError(
                "One of result_column/expected_value/min_value/max_value required"
            )
        self.columns = columns
        self.result_column = result_column
        self.expected_value = expected_value
        self.min_value = min_value
        self.max_value = max_value
        self.tolerance = tolerance

    def computed(self) -> Column:
        raise NotImplementedError

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        calc = self.computed()
        checks: list[Column] = []
        desc: list[str] = []
        if self.result_column is not None:
            checks.append(F.abs(calc - F.col(self.result_column)) > self.tolerance)
            desc.append(f"== {self.result_column} ± {self.tolerance}")
        if self.expected_value is not None:
            checks.append(F.abs(calc - F.lit(self.expected_value)) > self.tolerance)
            desc.append(f"== {self.expected_value} ± {self.tolerance}")
        if self.min_value is not None:
            checks.append(calc < F.lit(self.min_value))
            desc.append(f">= {self.min_value}")
        if self.max_value is not None:
            checks.append(calc > F.lit(self.max_value))
            desc.append(f"<= {self.max_value}")
        if not checks:
            raise ValueError(
                "One of result_column/expected_value/min_value/max_value required"
            )
        bad = checks[0]
        for c in checks[1:]:
            bad = bad | c
        non_null = F.lit(True)
        for c in self.columns:
            non_null = non_null & F.col(c).isNotNull()
        pred = bad & non_null
        return [
            ExpressionSpec(
                name=self.name,
                issue_type=self.issue_type,
                column=",".join(self.columns),
                count_expr=violation_count(pred),
                non_null_expr=F.count(F.lit(1)),
                filter_expr=pred,
                expected=f"{self.name}({self.columns}) {' and '.join(desc)}",
            )
        ]


@register_validator("column_product", category="multi_column")
class ColumnProductValidator(_ArithmeticValidator):
    """Product of columns equals result/constant
    (reference: multi_column/arithmetic.py:67-110)."""

    name = "column_product"
    issue_type = "product_mismatch"

    def computed(self) -> Column:
        r = F.col(self.columns[0])
        for c in self.columns[1:]:
            r = r * F.col(c)
        return r


@register_validator("column_difference", category="multi_column")
class ColumnDifferenceValidator(_ArithmeticValidator):
    """first − rest meets criteria (reference: arithmetic.py:113-156)."""

    name = "column_difference"
    issue_type = "difference_out_of_range"

    def computed(self) -> Column:
        r = F.col(self.columns[0])
        for c in self.columns[1:]:
            r = r - F.col(c)
        return r


@register_validator("column_ratio", category="multi_column")
class ColumnRatioValidator(_ArithmeticValidator):
    """columns[0] / columns[1] meets criteria (reference: arithmetic.py:159-210).
    Division-by-zero rows are excluded (null propagates out of the predicate)."""

    name = "column_ratio"
    issue_type = "ratio_out_of_range"

    def computed(self) -> Column:
        return F.col(self.columns[0]) / F.nullif(F.col(self.columns[1]), F.lit(0))


@register_validator("column_percentage", category="multi_column")
class ColumnPercentageValidator(_ArithmeticValidator):
    """columns[0] as % of columns[1] meets criteria
    (reference: arithmetic.py:213-260)."""

    name = "column_percentage"
    issue_type = "percentage_out_of_range"

    def computed(self) -> Column:
        return F.col(self.columns[0]) / F.nullif(F.col(self.columns[1]), F.lit(0)) * 100.0


@register_validator("multi_column_sum", category="multi_column")
class MultiColumnSumValidator(_ArithmeticValidator):
    """Sum of columns vs result/constant — alias surface of column_sum with
    the full bounds contract (reference: arithmetic.py:15-64)."""

    name = "multi_column_sum"
    issue_type = "sum_mismatch"

    def computed(self) -> Column:
        r = F.col(self.columns[0])
        for c in self.columns[1:]:
            r = r + F.col(c)
        return r


# ---------------------------------------------------------------------------
# Comparison family (reference: multi_column/comparison.py:17-260)
# ---------------------------------------------------------------------------
@register_validator("column_comparison", category="multi_column")
class ColumnComparisonValidator(Validator):
    """Exactly-two-column comparison a OP b
    (reference: multi_column/comparison.py:17-74)."""

    name = "column_comparison"

    def __init__(self, columns: list[str], operator: str) -> None:
        if len(columns) != 2:
            raise ValueError("ColumnComparisonValidator requires exactly 2 columns")
        if operator not in _OPS:
            raise ValueError(f"Invalid operator {operator!r}; use one of {list(_OPS)}")
        self.columns = columns
        self.operator = operator

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        a, b = F.col(self.columns[0]), F.col(self.columns[1])
        ok = _OPS[self.operator](a, b)
        pred = ~ok & a.isNotNull() & b.isNotNull()
        return [
            ExpressionSpec(
                name=self.name,
                issue_type="column_comparison_violation",
                column=",".join(self.columns),
                count_expr=violation_count(pred),
                non_null_expr=F.count(F.lit(1)),
                filter_expr=pred,
                expected=f"{self.columns[0]} {self.operator} {self.columns[1]}",
            )
        ]


@register_validator("column_chain_comparison", category="multi_column")
class ColumnChainComparisonValidator(Validator):
    """Chained comparison c0 op0 c1 op1 c2 ... (reference: comparison.py:77-149)."""

    name = "column_chain_comparison"

    def __init__(self, columns: list[str], operators: list[str]) -> None:
        if len(operators) != len(columns) - 1:
            raise ValueError("Need exactly len(columns)-1 operators")
        for op in operators:
            if op not in ("<", "<=", ">", ">="):
                raise ValueError(f"Invalid chain operator {op!r}")
        self.columns = columns
        self.operators = operators

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        ok = F.lit(True)
        non_null = F.col(self.columns[0]).isNotNull()
        for i, op in enumerate(self.operators):
            a, b = F.col(self.columns[i]), F.col(self.columns[i + 1])
            ok = ok & _OPS[op](a, b)
            non_null = non_null & b.isNotNull()
        pred = ~ok & non_null
        chain = " ".join(
            x for pair in zip(self.columns, self.operators + [""]) for x in pair if x
        )
        return [
            ExpressionSpec(
                name=self.name,
                issue_type="chain_comparison_violation",
                column=",".join(self.columns),
                count_expr=violation_count(pred),
                non_null_expr=F.count(F.lit(1)),
                filter_expr=pred,
                expected=chain,
            )
        ]


@register_validator("column_max", category="multi_column")
class ColumnMaxValidator(Validator):
    """result_column == greatest(columns) ± tolerance
    (reference: comparison.py:152-191). F.greatest is row-local column math."""

    name = "column_max"
    _agg = staticmethod(F.greatest)
    issue_type = "not_row_maximum"

    def __init__(self, columns: list[str], result_column: str, tolerance: float = 0.0) -> None:
        self.columns = columns
        self.result_column = result_column
        self.tolerance = tolerance

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        combined = self._agg(*[F.col(c) for c in self.columns])
        pred = F.abs(F.col(self.result_column) - combined) > self.tolerance
        non_null = F.col(self.result_column).isNotNull()
        for c in self.columns:
            non_null = non_null & F.col(c).isNotNull()
        pred = pred & non_null
        return [
            ExpressionSpec(
                name=self.name,
                issue_type=self.issue_type,
                column=self.result_column,
                count_expr=violation_count(pred),
                non_null_expr=F.count(F.lit(1)),
                filter_expr=pred,
                expected=f"{self.result_column} == {self.name.split('_')[-1]}({self.columns})",
            )
        ]


@register_validator("column_min", category="multi_column")
class ColumnMinValidator(ColumnMaxValidator):
    """result_column == least(columns) ± tolerance
    (reference: comparison.py:194-233)."""

    name = "column_min"
    _agg = staticmethod(F.least)
    issue_type = "not_row_minimum"


# ---------------------------------------------------------------------------
# Consistency family (reference: multi_column/consistency.py:17-330)
# ---------------------------------------------------------------------------
@register_validator("column_consistency", category="multi_column")
class ColumnConsistencyValidator(Validator):
    """when/then SQL-expression rules: rows matching `when` must satisfy
    `then` (reference: multi_column/consistency.py:17-102). Each rule is a
    fused conditional-sum; the sanctioned expression surface is Spark SQL."""

    name = "column_consistency"

    def __init__(self, rules: list[dict[str, Any]], fail_on_first: bool = False) -> None:
        self.rules = rules
        self.fail_on_first = fail_on_first  # kept for surface parity; fused
        # execution evaluates every rule in the same single pass anyway.

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        out = []
        for i, rule in enumerate(self.rules):
            when, then = F.expr(rule["when"]), F.expr(rule["then"])
            pred = when & ~F.coalesce(then, F.lit(False))
            out.append(
                ExpressionSpec(
                    name=self.name,
                    issue_type="consistency_rule_violation",
                    column=rule.get("description") or f"rule_{i}",
                    count_expr=violation_count(pred),
                    non_null_expr=F.count(F.lit(1)),
                    filter_expr=pred,
                    expected=f"WHEN {rule['when']} THEN {rule['then']}",
                )
            )
        return out


@register_validator("column_mutual_exclusivity", category="multi_column")
class ColumnMutualExclusivityValidator(Validator):
    """At most allow_multiple of the columns non-null per row
    (reference: consistency.py:105-159)."""

    name = "column_mutual_exclusivity"

    def __init__(
        self, columns: list[str], allow_none: bool = False, allow_multiple: int = 1
    ) -> None:
        self.columns = columns
        self.allow_none = allow_none
        self.allow_multiple = allow_multiple

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        filled = sum(
            (F.when(F.col(c).isNotNull(), 1).otherwise(0) for c in self.columns),
            F.lit(0),
        )
        pred = filled > self.allow_multiple
        if not self.allow_none:
            pred = pred | (filled == 0)
        return [
            ExpressionSpec(
                name=self.name,
                issue_type="mutual_exclusivity_violation",
                column=",".join(self.columns),
                count_expr=violation_count(pred),
                non_null_expr=F.count(F.lit(1)),
                filter_expr=pred,
                expected=(
                    f"<= {self.allow_multiple} of {self.columns} filled per row"
                    + ("" if self.allow_none else ", at least one filled")
                ),
            )
        ]


@register_validator("column_coexistence", category="multi_column")
class ColumnCoexistenceValidator(Validator):
    """Columns filled together or empty together
    (reference: consistency.py:162-195)."""

    name = "column_coexistence"

    def __init__(self, columns: list[str]) -> None:
        self.columns = columns

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        filled = sum(
            (F.when(F.col(c).isNotNull(), 1).otherwise(0) for c in self.columns),
            F.lit(0),
        )
        pred = (filled > 0) & (filled < len(self.columns))
        return [
            ExpressionSpec(
                name=self.name,
                issue_type="coexistence_violation",
                column=",".join(self.columns),
                count_expr=violation_count(pred),
                non_null_expr=F.count(F.lit(1)),
                filter_expr=pred,
                expected=f"{self.columns} all filled or all empty per row",
            )
        ]


@register_validator("column_dependency", category="multi_column")
class ColumnDependencyValidator(Validator):
    """If condition_column ∈ condition_values then required_columns non-null
    (reference: consistency.py:198-261)."""

    name = "column_dependency"

    def __init__(
        self,
        condition_column: str,
        condition_value: Any,
        required_columns: list[str],
    ) -> None:
        self.condition_column = condition_column
        self.condition_values = (
            condition_value if isinstance(condition_value, list) else [condition_value]
        )
        self.required_columns = required_columns

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        cond = F.col(self.condition_column).isin(self.condition_values)
        missing = F.lit(False)
        for c in self.required_columns:
            missing = missing | F.col(c).isNull()
        pred = cond & missing
        return [
            ExpressionSpec(
                name=self.name,
                issue_type="dependency_violation",
                column=",".join(self.required_columns),
                count_expr=violation_count(pred),
                non_null_expr=F.count(F.lit(1)),
                filter_expr=pred,
                expected=(
                    f"{self.required_columns} filled when "
                    f"{self.condition_column} ∈ {self.condition_values}"
                ),
            )
        ]


@register_validator("column_implication", category="multi_column")
class ColumnImplicationValidator(Validator):
    """antecedent=value ⇒ consequent ∈ values (reference: consistency.py:264-330)."""

    name = "column_implication"

    def __init__(
        self,
        antecedent_column: str,
        antecedent_value: Any,
        consequent_column: str,
        consequent_value: Any,
    ) -> None:
        self.antecedent_column = antecedent_column
        self.antecedent_values = (
            antecedent_value if isinstance(antecedent_value, list) else [antecedent_value]
        )
        self.consequent_column = consequent_column
        self.consequent_values = (
            consequent_value if isinstance(consequent_value, list) else [consequent_value]
        )

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        ante = F.col(self.antecedent_column).isin(self.antecedent_values)
        cons = F.col(self.consequent_column).isin(self.consequent_values)
        pred = ante & ~F.coalesce(cons, F.lit(False))
        return [
            ExpressionSpec(
                name=self.name,
                issue_type="implication_violation",
                column=f"{self.antecedent_column},{self.consequent_column}",
                count_expr=violation_count(pred),
                non_null_expr=F.count(F.lit(1)),
                filter_expr=pred,
                expected=(
                    f"{self.antecedent_column} ∈ {self.antecedent_values} ⇒ "
                    f"{self.consequent_column} ∈ {self.consequent_values}"
                ),
            )
        ]


@register_validator("multi_column_unique", category="multi_column")
class MultiColumnUniqueValidator(Validator):
    """N-column combination unique across rows (reference:
    uniqueness/multi_column.py). Spark: count - count_distinct(struct) in
    the fused agg — one shuffle-free partial-agg pass with HLL fallback
    available via approx; exact here to mirror the reference."""

    name = "multi_column_unique"

    def __init__(self, columns: list[str]) -> None:
        self.columns = columns

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        combo = F.struct(*[F.col(c) for c in self.columns])

        def judge(m: dict[str, Any]) -> tuple[bool, Any, str]:
            dupes = (m.get("n") or 0) - (m.get("distinct") or 0)
            return (
                dupes == 0,
                dupes,
                f"{dupes} duplicate {self.columns} combinations",
            )

        return [
            ExpressionSpec(
                name=self.name,
                issue_type="multi_column_duplicates",
                column=",".join(self.columns),
                extra_exprs={
                    "n": F.count(F.lit(1)),
                    "distinct": F.count_distinct(combo),
                },
                expected=f"unique combinations of {self.columns}",
                judge=judge,
            )
        ]


@register_validator("functional_dependency", category="multi_column")
class FunctionalDependencyValidator(Validator):
    """X → Y must hold: every determinant value maps to exactly one
    dependent value (reference: ml/rule_learning/constraint_miner.py:
    163-260 mines these; this validator ENFORCES a mined FD).

    Needs a groupBy (countDistinct per determinant group), so it is a
    standalone validate() — one shuffle keyed on the determinant, then a
    count over the (tiny) violating-group relation. At scale the shuffle
    carries (X, Y) pairs only, never whole rows."""

    def __init__(self, determinant: str | list[str], dependent: str) -> None:
        self.determinants = (
            [determinant] if isinstance(determinant, str) else list(determinant)
        )
        self.dependent = dependent

    def validate(self, df, row_count=None):
        from truthound_spark.core.results import ValidationIssue
        from truthound_spark.types import severity_from_ratio

        keys = [F.col(c) for c in self.determinants]
        grouped = (
            df.where(F.greatest(*[k.isNotNull() for k in keys]) if len(keys) > 1 else keys[0].isNotNull())
            .groupBy(*self.determinants)
            .agg(F.countDistinct(F.col(self.dependent)).alias("__u"))
        )
        stat = grouped.agg(
            F.count(F.lit(1)).alias("groups"),
            F.sum((F.col("__u") > 1).cast("long")).alias("violating"),
        ).collect()[0]
        groups, violating = int(stat["groups"]), int(stat["violating"] or 0)
        if violating == 0:
            return []
        samples = [
            r.asDict()
            for r in grouped.where(F.col("__u") > 1)
            .select(*self.determinants, "__u")
            .orderBy(F.desc("__u"))
            .limit(10)
            .collect()
        ]
        det = ",".join(self.determinants)
        return [
            ValidationIssue(
                column=f"{det}->{self.dependent}",
                issue_type="functional_dependency_violated",
                count=violating,
                severity=severity_from_ratio(violating / groups if groups else 0.0),
                validator_name="functional_dependency",
                expected=f"{det} -> {self.dependent}",
                actual=violating,
                details=(
                    f"{violating}/{groups} determinant groups map to "
                    f"multiple {self.dependent} values"
                ),
                sample_values=samples,
            )
        ]


@register_validator("value_implication", category="multi_column")
class ValueImplicationValidator(Validator):
    """If X = x then Y must equal y (reference: constraint_miner.py:
    262-326 value implications; enforcement side). Spec-compiled — rides
    the fused single-aggregation plan."""

    def __init__(
        self,
        condition_column: str,
        condition_value: Any,
        expected_column: str,
        expected_value: Any,
        mostly: float = 1.0,
    ) -> None:
        self.condition_column = condition_column
        self.condition_value = condition_value
        self.expected_column = expected_column
        self.expected_value = expected_value
        self.mostly = mostly

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        cond = F.col(self.condition_column) == F.lit(self.condition_value)
        bad = cond & (
            ~F.col(self.expected_column).eqNullSafe(F.lit(self.expected_value))
        )
        mostly = self.mostly

        def judge(m: dict[str, Any]) -> tuple[bool, Any, str]:
            n_cond = m.get("n_cond") or 0
            n_bad = m.get("value") or 0
            ok_ratio = 1.0 - (n_bad / n_cond) if n_cond else 1.0
            return (
                ok_ratio >= mostly,
                n_bad,
                f"{n_bad}/{n_cond} rows violate the implication",
            )

        return [
            ExpressionSpec(
                name="value_implication",
                issue_type="value_implication_violated",
                column=f"{self.condition_column}->{self.expected_column}",
                count_expr=violation_count(bad),
                non_null_expr=F.sum(cond.cast("long")),
                filter_expr=bad,
                extra_exprs={
                    "value": violation_count(bad),
                    "n_cond": F.sum(cond.cast("long")),
                },
                expected=(
                    f"{self.condition_column}={self.condition_value!r} ⇒ "
                    f"{self.expected_column}={self.expected_value!r}"
                ),
                judge=judge,
            )
        ]
