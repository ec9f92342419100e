"""Custom-validator SDK (reference: src/truthound/decorators.py ``@validator``
+ validators/sdk/{builder,templates,testing}.py).

Five surfaces:
  * ``@validator`` — wrap a predicate-factory function into a registered
    Validator class (the reference decorator surface).
  * ``ValidatorBuilder`` — fluent builder composing column predicates.
  * ``assert_validator`` — micro test-harness running a validator on an
    inline dict frame and asserting the expected violation count
    (reference sdk/testing.py).
  * templates — subclass-and-go validator scaffolds
    (``truthound_spark.sdk_templates``, reference sdk/templates.py).
  * testing — ``ValidatorTestCase`` + fixtures + benchmark harness
    (``truthound_spark.sdk_testing``, reference sdk/testing.py).
"""

from __future__ import annotations

from truthound_spark.sdk_templates import (  # noqa: F401
    CompositeValidator,
    SimpleColumnValidator,
    SimpleComparisonValidator,
    SimplePatternValidator,
    SimpleRangeValidator,
)
from truthound_spark.sdk_testing import (  # noqa: F401
    BenchmarkResult,
    ValidatorTestCase,
    ValidatorTestResult,
    assert_has_issue,
    assert_issue_count,
    assert_no_issues,
    benchmark_validator,
    create_edge_case_data,
    create_test_dataframe,
)

from typing import Any, Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from truthound_spark.core.base import ExpressionSpec, Validator, violation_count
from truthound_spark.core.registry import register_validator


def validator(
    name: str,
    column: str | None = None,
    category: str = "custom",
    severity_is_fixed: bool = False,
):
    """Decorator: turn ``fn(column_expr) -> violation_predicate`` into a
    registered validator (reference: decorators.py).

    >>> @validator("positive")
    ... def positive(col):
    ...     return col <= 0
    ...
    >>> positive("amount").validate(df)
    """

    def deco(fn: Callable[[Column], Column]):
        class _Custom(Validator):
            __doc__ = fn.__doc__

            def __init__(self, column: str | None = column) -> None:
                if column is None:
                    raise ValueError(f"validator {name!r} needs a target column")
                self.column = column

            def specs(self, df: DataFrame) -> list[ExpressionSpec]:
                pred = fn(F.col(self.column)) & F.col(self.column).isNotNull()
                return [
                    ExpressionSpec(
                        name=name,
                        issue_type=f"{name}_violation",
                        column=self.column,
                        count_expr=violation_count(pred),
                        non_null_expr=F.count(F.col(self.column)),
                        filter_expr=pred,
                        expected=fn.__doc__ or name,
                    )
                ]

        _Custom.__name__ = f"{name.title().replace('_', '')}Validator"
        _Custom.__qualname__ = _Custom.__name__
        register_validator(name, category=category)(_Custom)
        return _Custom

    return deco


class ValidatorBuilder:
    """Fluent custom-check builder (reference: sdk/builder.py:64).

    >>> v = (ValidatorBuilder("age_check").column("age")
    ...      .must(lambda c: (c >= 0) & (c <= 120)).build())
    """

    def __init__(self, name: str, category: str = "custom") -> None:
        self._name = name
        self._category = category
        self._column: str | None = None
        self._must: list[Callable[[Column], Column]] = []

    def column(self, column: str) -> "ValidatorBuilder":
        self._column = column
        return self

    def must(self, predicate: Callable[[Column], Column]) -> "ValidatorBuilder":
        """predicate returns True for VALID values."""
        self._must.append(predicate)
        return self

    def build(self) -> Validator:
        if self._column is None or not self._must:
            raise ValueError("builder needs .column() and at least one .must()")
        name, column, musts = self._name, self._column, list(self._must)

        class _Built(Validator):
            def specs(self, df: DataFrame) -> list[ExpressionSpec]:
                col = F.col(column)
                valid = F.lit(True)
                for m in musts:
                    valid = valid & m(col)
                pred = ~valid & col.isNotNull()
                return [
                    ExpressionSpec(
                        name=name,
                        issue_type=f"{name}_violation",
                        column=column,
                        count_expr=violation_count(pred),
                        non_null_expr=F.count(col),
                        filter_expr=pred,
                        expected=f"{len(musts)} predicates hold",
                    )
                ]

        _Built.name = name
        _Built.category = self._category
        return _Built()


def assert_validator(
    spark,
    validator_obj: Validator,
    data: dict[str, list[Any]],
    expected_count: int,
) -> None:
    """SDK test harness (reference: sdk/testing.py:97): run on an inline
    frame, assert the total violation count."""
    import pandas as pd

    df = spark.createDataFrame(pd.DataFrame(data))
    issues = validator_obj.validate(df)
    got = sum(i.count for i in issues)
    if got != expected_count:
        raise AssertionError(
            f"{getattr(validator_obj, 'name', validator_obj)}: expected "
            f"{expected_count} violations, got {got} ({issues})"
        )
