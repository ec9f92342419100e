"""Pre-built validator templates (reference: validators/sdk/templates.py:42-660).

The reference ships five subclass-and-go templates so third-party
validators need near-zero boilerplate:

  * SimpleColumnValidator     — one predicate per column
  * SimplePatternValidator    — regex match / anti-match over strings
  * SimpleRangeValidator      — numeric bounds with open/closed edges
  * SimpleComparisonValidator — cross-column comparison
  * CompositeValidator        — bundle of validators under one name

Spark-first: unlike the reference's per-column ``collect()`` loops, every
template compiles to ``ExpressionSpec``s, so a subclassed template FUSES
into the suite's single ``df.agg`` like any built-in validator — a
template-derived check costs no extra scan.

Subclasses are registered automatically (``__init_subclass__``) when they
declare their own ``name``, mirroring the reference registry's pickup of
any class with a ``name`` attribute (registry.py:125-137).
"""

from __future__ import annotations

import re
from typing import Any, Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from truthound_spark.core.base import (
    NUMERIC_TYPES,
    STRING_TYPES,
    ExpressionSpec,
    Validator,
    columns_of_type,
    violation_count,
)
from truthound_spark.core.registry import register_validator
from truthound_spark.types import Severity

_TEMPLATE_NAMES = {
    "simple_column",
    "simple_pattern",
    "simple_range",
    "simple_comparison",
    "composite",
}


class _AutoRegister:
    """Concrete template subclasses self-register under their declared
    name; the templates themselves are registered below so the reference's
    registry name set resolves 1:1."""

    def __init_subclass__(cls, **kwargs: Any) -> None:
        super().__init_subclass__(**kwargs)
        name = cls.__dict__.get("name")
        if name and name not in _TEMPLATE_NAMES:
            register_validator(name, category=getattr(cls, "category", "custom"))(cls)


class SimpleColumnValidator(Validator, _AutoRegister):
    """Template: one check per column (reference templates.py:42-160).

    Subclass and implement ``violation_expr`` returning a Column predicate
    that is True for VIOLATING values:

    >>> class PositiveValidator(SimpleColumnValidator):
    ...     name = "positive"
    ...     category = "numeric"
    ...     issue_type = "non_positive_value"
    ...     dtype_filter = NUMERIC_TYPES
    ...     def violation_expr(self, col):
    ...         return col <= 0
    """

    name = "simple_column"
    category = "custom"
    issue_type = "validation_failed"
    dtype_filter: tuple[type, ...] | None = None
    fixed_severity: Severity | None = None

    def __init__(self, columns: list[str] | None = None) -> None:
        self.columns = columns

    def violation_expr(self, col: Column) -> Column:  # pragma: no cover - abstract
        raise NotImplementedError(
            f"{type(self).__name__} must implement violation_expr(col)"
        )

    def _cols(self, df: DataFrame) -> list[str]:
        if self.columns is not None:
            return [c for c in self.columns if c in df.columns]
        if self.dtype_filter is not None:
            return columns_of_type(df, self.dtype_filter)
        return list(df.columns)

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        out: list[ExpressionSpec] = []
        for c in self._cols(df):
            pred = self.violation_expr(F.col(c)) & F.col(c).isNotNull()
            out.append(
                ExpressionSpec(
                    name=self.name,
                    issue_type=self.issue_type,
                    column=c,
                    count_expr=violation_count(pred),
                    non_null_expr=F.count(F.col(c)),
                    filter_expr=pred,
                    expected=self.expected_description(),
                    fixed_severity=self.fixed_severity,
                )
            )
        return out

    def expected_description(self) -> str:
        return self.issue_type.replace("_", " ")


class SimplePatternValidator(SimpleColumnValidator):
    """Template: regex-based string validation (templates.py:162-295).

    Class attributes: ``pattern`` (required), ``match_full`` (anchor the
    pattern, default True), ``invert_match`` (flag values that DO match —
    e.g. a contains-SSN detector), ``case_sensitive``.

    >>> class NoSSNValidator(SimplePatternValidator):
    ...     name = "no_ssn"
    ...     category = "privacy"
    ...     pattern = r"\\d{3}-\\d{2}-\\d{4}"
    ...     invert_match = True
    ...     issue_type = "contains_ssn"
    """

    name = "simple_pattern"
    category = "string"
    issue_type = "pattern_mismatch"
    pattern: str = ""
    match_full: bool = True
    invert_match: bool = False
    case_sensitive: bool = True
    dtype_filter = STRING_TYPES

    def __init__(self, columns: list[str] | None = None) -> None:
        super().__init__(columns)
        if not self.pattern:
            raise ValueError(f"{type(self).__name__} must define 'pattern'")
        re.compile(self.pattern)  # fail fast on malformed regex
        p = self.pattern
        if self.match_full and not p.startswith("^"):
            p = f"^(?:{p})$"
        if not self.case_sensitive:
            p = f"(?i){p}"
        self._spark_pattern = p

    def violation_expr(self, col: Column) -> Column:
        matched = col.rlike(self._spark_pattern)
        return matched if self.invert_match else ~matched

    def expected_description(self) -> str:
        return f"NOT {self.pattern}" if self.invert_match else self.pattern


class SimpleRangeValidator(SimpleColumnValidator):
    """Template: numeric bounds with open/closed edges (templates.py:303-430).

    >>> class PercentageValidator(SimpleRangeValidator):
    ...     name = "percentage"
    ...     min_value = 0
    ...     max_value = 100
    ...     issue_type = "invalid_percentage"
    """

    name = "simple_range"
    category = "numeric"
    issue_type = "out_of_range"
    min_value: float | int | None = None
    max_value: float | int | None = None
    inclusive_min: bool = True
    inclusive_max: bool = True
    dtype_filter = NUMERIC_TYPES

    def __init__(self, columns: list[str] | None = None) -> None:
        super().__init__(columns)
        if self.min_value is None and self.max_value is None:
            raise ValueError(
                f"{type(self).__name__} must define 'min_value' or 'max_value'"
            )

    def violation_expr(self, col: Column) -> Column:
        conds: list[Column] = []
        if self.min_value is not None:
            conds.append(
                col < self.min_value if self.inclusive_min else col <= self.min_value
            )
        if self.max_value is not None:
            conds.append(
                col > self.max_value if self.inclusive_max else col >= self.max_value
            )
        out = conds[0]
        for c in conds[1:]:
            out = out | c
        return out

    def expected_description(self) -> str:
        lo = "[" if self.inclusive_min else "("
        hi = "]" if self.inclusive_max else ")"
        return f"{lo}{self.min_value}, {self.max_value}{hi}"


class SimpleComparisonValidator(Validator, _AutoRegister):
    """Template: cross-column comparison (templates.py:428-580).

    Declare ``left_column``, ``right_column``, and ``operator`` (one of
    ``< <= > >= == !=``), or override ``holds(lhs, rhs)``:

    >>> class StartBeforeEndValidator(SimpleComparisonValidator):
    ...     name = "start_before_end"
    ...     left_column = "start_date"
    ...     right_column = "end_date"
    ...     operator = "<="
    """

    name = "simple_comparison"
    category = "custom"
    issue_type = "comparison_failed"
    left_column: str | None = None
    right_column: str | None = None
    operator: str = "=="
    fixed_severity: Severity | None = None

    _OPS: dict[str, Callable[[Column, Column], Column]] = {
        "<": lambda a, b: a < b,
        "<=": lambda a, b: a <= b,
        ">": lambda a, b: a > b,
        ">=": lambda a, b: a >= b,
        "==": lambda a, b: a == b,
        "!=": lambda a, b: a != b,
    }

    def __init__(
        self, left_column: str | None = None, right_column: str | None = None
    ) -> None:
        self.left_column = left_column or self.left_column
        self.right_column = right_column or self.right_column
        if not self.left_column or not self.right_column:
            raise ValueError(
                f"{type(self).__name__} must define 'left_column' and 'right_column'"
            )
        if self.operator not in self._OPS:
            raise ValueError(
                f"operator must be one of {sorted(self._OPS)}, got {self.operator!r}"
            )

    def holds(self, lhs: Column, rhs: Column) -> Column:
        """True where the relation HOLDS; override for custom relations."""
        return self._OPS[self.operator](lhs, rhs)

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        missing = [c for c in (self.left_column, self.right_column) if c not in df.columns]
        if missing:
            return []
        lhs, rhs = F.col(self.left_column), F.col(self.right_column)
        pred = ~self.holds(lhs, rhs) & lhs.isNotNull() & rhs.isNotNull()
        return [
            ExpressionSpec(
                name=self.name,
                issue_type=self.issue_type,
                column=f"{self.left_column},{self.right_column}",
                count_expr=violation_count(pred),
                non_null_expr=F.count(F.when(lhs.isNotNull() & rhs.isNotNull(), 1)),
                filter_expr=pred,
                expected=f"{self.left_column} {self.operator} {self.right_column}",
                fixed_severity=self.fixed_severity,
            )
        ]


class CompositeValidator(Validator, _AutoRegister):
    """Template: bundle of validators under one name (templates.py:602-660).

    Override ``get_validators`` (class-level composition) and/or chain
    ``add_validator``. The composite's specs are the CONCATENATION of its
    members' specs, so the whole bundle still fuses into one scan —
    strictly better than the reference's sequential member loop.

    >>> class CustomerDataValidator(CompositeValidator):
    ...     name = "customer_data"
    ...     def get_validators(self):
    ...         return [NullValidator(columns=["id"]), EmailFormat("email")]
    """

    name = "composite"
    category = "composite"

    def __init__(self, validators: list[Validator] | None = None) -> None:
        self._validators: list[Validator] = list(validators or [])

    def get_validators(self) -> list[Validator]:
        """Class-level member list; instance ``add_validator`` appends."""
        return []

    def add_validator(self, v: Validator) -> "CompositeValidator":
        self._validators.append(v)
        return self

    def members(self) -> list[Validator]:
        return [*self.get_validators(), *self._validators]

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        out: list[ExpressionSpec] = []
        for v in self.members():
            out.extend(v.specs(df))
        return out


for _name, _cls in [
    ("simple_column", SimpleColumnValidator),
    ("simple_pattern", SimplePatternValidator),
    ("simple_range", SimpleRangeValidator),
    ("simple_comparison", SimpleComparisonValidator),
    ("composite", CompositeValidator),
]:
    register_validator(_name, category="sdk")(_cls)
