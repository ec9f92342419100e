"""Validator test + benchmark harness (reference: validators/sdk/testing.py).

The reference gives third-party validator authors a unittest base class,
fixture factories, standalone assertion helpers, and a benchmark utility
(testing.py:97 ValidatorTestCase, 434 create_test_dataframe, 492
create_edge_case_data, 550-634 assert_* helpers, 635-807 benchmark).
This is the same surface over Spark DataFrames; ``ValidatorTestCase`` is
framework-neutral (works as a plain mixin under pytest OR unittest).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from truthound_spark.core.base import Validator
from truthound_spark.core.results import ValidationIssue


@dataclass
class ValidatorTestResult:
    """Outcome of one harness run (reference testing.py:46-94)."""

    issues: list[ValidationIssue] = field(default_factory=list)
    error: Exception | None = None
    duration_s: float = 0.0

    @property
    def issue_count(self) -> int:
        return len(self.issues)

    @property
    def total_violations(self) -> int:
        return sum(i.count for i in self.issues)

    def get_issues_for_column(self, column: str) -> list[ValidationIssue]:
        return [i for i in self.issues if i.column == column]

    def get_issues_by_type(self, issue_type: str) -> list[ValidationIssue]:
        return [i for i in self.issues if i.issue_type == issue_type]

    def has_issue(
        self,
        column: str | None = None,
        issue_type: str | None = None,
        min_count: int = 1,
    ) -> bool:
        for i in self.issues:
            if column is not None and i.column != column:
                continue
            if issue_type is not None and i.issue_type != issue_type:
                continue
            if i.count >= min_count:
                return True
        return False


def assert_no_issues(issues: list[ValidationIssue]) -> None:
    """Standalone helper (reference testing.py:550)."""
    if issues:
        raise AssertionError(
            f"expected no issues, got {len(issues)}: "
            + "; ".join(f"{i.column}/{i.issue_type}×{i.count}" for i in issues[:5])
        )


def assert_has_issue(
    issues: list[ValidationIssue],
    column: str | None = None,
    issue_type: str | None = None,
    min_count: int = 1,
) -> None:
    """Standalone helper (reference testing.py:566)."""
    r = ValidatorTestResult(issues=issues)
    if not r.has_issue(column, issue_type, min_count):
        raise AssertionError(
            f"no issue matching column={column!r} issue_type={issue_type!r} "
            f"min_count={min_count}; got "
            + "; ".join(f"{i.column}/{i.issue_type}×{i.count}" for i in issues[:10])
        )


def assert_issue_count(issues: list[ValidationIssue], expected: int) -> None:
    """Standalone helper (reference testing.py:613)."""
    if len(issues) != expected:
        raise AssertionError(f"expected {expected} issues, got {len(issues)}")


class ValidatorTestCase:
    """Base/mixin for validator unit tests (reference testing.py:97-432).

    Framework-neutral: use as a pytest mixin (set ``spark`` on the class
    or rely on a ``spark`` attribute injected by a fixture) or mix into
    ``unittest.TestCase``.

    >>> class TestNullValidator(ValidatorTestCase):
    ...     validator_class = NullValidator
    ...     def test_finds_nulls(self, spark):
    ...         self.spark = spark
    ...         res = self.validate({"name": ["a", None, "b", None]})
    ...         self.assert_has_issue(column="name", min_count=2)
    """

    validator_class: type[Validator] | None = None
    spark: SparkSession | None = None
    _last: ValidatorTestResult | None = None

    # -- fixtures -----------------------------------------------------
    def _spark(self) -> SparkSession:
        s = self.spark or SparkSession.getActiveSession()
        if s is None:
            raise RuntimeError(
                "no SparkSession: set self.spark or start one before validate()"
            )
        return s

    def create_validator(self, *args: Any, **kwargs: Any) -> Validator:
        if self.validator_class is None:
            raise ValueError(
                "validator_class must be set on the test class, or pass a "
                "validator instance to validate()"
            )
        return self.validator_class(*args, **kwargs)

    def create_df(self, data: dict[str, list[Any]]) -> DataFrame:
        import pandas as pd

        return self._spark().createDataFrame(pd.DataFrame(data))

    # -- run ----------------------------------------------------------
    def validate(
        self,
        data: dict[str, list[Any]] | DataFrame,
        validator: Validator | None = None,
        **validator_kwargs: Any,
    ) -> ValidatorTestResult:
        """Run the validator; assertion state is kept on the instance."""
        df = data if isinstance(data, DataFrame) else self.create_df(data)
        v = validator or self.create_validator(**validator_kwargs)
        t0 = time.time()
        issues = v.validate(df)
        self._last = ValidatorTestResult(issues=issues, duration_s=time.time() - t0)
        return self._last

    def validate_safe(
        self,
        data: dict[str, list[Any]] | DataFrame,
        validator: Validator | None = None,
        **validator_kwargs: Any,
    ) -> ValidatorTestResult:
        """Like validate() but captures exceptions (reference :255)."""
        try:
            return self.validate(data, validator, **validator_kwargs)
        except Exception as e:  # noqa: BLE001 — harness records ANY failure
            self._last = ValidatorTestResult(error=e)
            return self._last

    @property
    def last_result(self) -> ValidatorTestResult:
        if self._last is None:
            raise RuntimeError("call validate() first")
        return self._last

    # -- assertions ---------------------------------------------------
    def assert_no_issues(self) -> None:
        assert_no_issues(self.last_result.issues)

    def assert_has_issue(
        self,
        column: str | None = None,
        issue_type: str | None = None,
        min_count: int = 1,
    ) -> None:
        assert_has_issue(self.last_result.issues, column, issue_type, min_count)

    def assert_issue_count(self, expected: int) -> None:
        assert_issue_count(self.last_result.issues, expected)

    def assert_total_violations(self, expected: int) -> None:
        got = self.last_result.total_violations
        if got != expected:
            raise AssertionError(f"expected {expected} total violations, got {got}")

    def assert_no_error(self) -> None:
        if self.last_result.error is not None:
            raise AssertionError(f"validator errored: {self.last_result.error!r}")

    def assert_error(self, error_type: type[Exception] | None = None) -> None:
        err = self.last_result.error
        if err is None:
            raise AssertionError("expected the validator to error; it did not")
        if error_type is not None and not isinstance(err, error_type):
            raise AssertionError(
                f"expected {error_type.__name__}, got {type(err).__name__}: {err}"
            )

    def assert_performance(self, max_seconds: float) -> None:
        d = self.last_result.duration_s
        if d > max_seconds:
            raise AssertionError(f"validator took {d:.3f}s > budget {max_seconds}s")


def create_test_dataframe(
    spark: SparkSession,
    n_rows: int = 1000,
    columns: list[str] | None = None,
    null_ratio: float = 0.0,
    seed: int = 42,
) -> DataFrame:
    """Deterministic fixture frame (reference testing.py:434-490): typed
    columns id/name/value/date with an optional planted null ratio."""
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(seed)
    columns = columns or ["id", "name", "value", "date"]
    data: dict[str, Any] = {}
    for col in columns:
        if col == "id":
            data[col] = np.arange(n_rows, dtype="int64")
        elif col == "name":
            data[col] = [f"name_{i % 97}" for i in range(n_rows)]
        elif col == "value":
            data[col] = rng.standard_normal(n_rows) * 100.0
        elif col == "date":
            data[col] = pd.to_datetime("2024-01-01") + pd.to_timedelta(
                rng.randint(0, 365, n_rows), unit="D"
            )
        else:
            data[col] = rng.randint(0, 1000, n_rows).astype("int64")
    pdf = pd.DataFrame(data)
    if null_ratio > 0:
        for col in columns:
            if col == "id":
                continue
            mask = rng.random_sample(n_rows) < null_ratio
            pdf.loc[mask, col] = None
    return spark.createDataFrame(pdf)


def create_edge_case_data(spark: SparkSession) -> dict[str, DataFrame]:
    """Named adversarial frames (reference testing.py:492-548): run a new
    validator across all of these before shipping it."""
    import pandas as pd

    def mk(d: dict[str, list[Any]], schema: str | None = None) -> DataFrame:
        if schema:
            return spark.createDataFrame(list(zip(*d.values())) or [], schema)
        return spark.createDataFrame(pd.DataFrame(d))

    return {
        "empty": mk({"value": []}, "value double"),
        "single_row": mk({"value": [1.0]}),
        "all_null": mk({"value": [None, None, None]}, "value double"),
        "all_same": mk({"value": [7.0, 7.0, 7.0, 7.0]}),
        "extremes": mk({"value": [float("-inf"), -1e308, 0.0, 1e308, float("inf")]}),
        "nan": mk({"value": [float("nan"), 1.0, float("nan")]}),
        "unicode": mk({"text": ["héllo", "χαίρε", "🙂", "", " "]}),
        "long_strings": mk({"text": ["x" * 10_000, "y" * 100_000]}),
    }


@dataclass
class BenchmarkResult:
    """(reference testing.py:635-668)"""

    validator_name: str
    n_rows: int
    runs: int
    mean_s: float
    min_s: float
    max_s: float
    rows_per_s: float

    def to_dict(self) -> dict[str, Any]:
        return {
            "validator": self.validator_name,
            "n_rows": self.n_rows,
            "runs": self.runs,
            "mean_s": round(self.mean_s, 4),
            "min_s": round(self.min_s, 4),
            "max_s": round(self.max_s, 4),
            "rows_per_s": round(self.rows_per_s),
        }


def benchmark_validator(
    validator: Validator,
    df: DataFrame,
    runs: int = 3,
    warmup: int = 1,
) -> BenchmarkResult:
    """Wall-clock a validator on a frame (reference testing.py:671-717).
    Warm-up runs are excluded — the first pass pays Spark codegen."""
    n_rows = df.count()
    for _ in range(warmup):
        validator.validate(df, row_count=n_rows)
    times: list[float] = []
    for _ in range(runs):
        t0 = time.time()
        validator.validate(df, row_count=n_rows)
        times.append(time.time() - t0)
    mean = sum(times) / len(times)
    return BenchmarkResult(
        validator_name=getattr(validator, "name", type(validator).__name__),
        n_rows=n_rows,
        runs=runs,
        mean_s=mean,
        min_s=min(times),
        max_s=max(times),
        rows_per_s=n_rows / mean if mean > 0 else 0.0,
    )
