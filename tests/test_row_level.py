"""RowLevelValidator contract parity: the Arrow-vectorized default must
be behaviorally identical to the row-at-a-time F.udf path (r12)."""

import pytest
from pyspark.sql import functions as F

from truthound_spark.validators.query import RowLevelValidator


@pytest.fixture(scope="module")
def frame(spark):
    return spark.range(1000).select(
        F.col("id"),
        F.when(F.col("id") % 10 == 0, None)
        .otherwise(F.col("id") % 97)
        .cast("double")
        .alias("v"),
        F.when(F.col("id") % 7 == 0, None)
        .otherwise(F.concat(F.lit("s"), F.col("id")))
        .alias("s"),
    )


def _count(issues):
    return issues[0].count if issues else 0


class TestVectorizedParity:
    def test_numeric_predicate_identical(self, frame):
        fn = lambda v: v is not None and v < 50  # noqa: E731
        fast = _count(RowLevelValidator("v", fn).validate(frame))
        slow = _count(RowLevelValidator("v", fn, vectorized=False).validate(frame))
        assert fast == slow > 0

    def test_null_arrives_as_none_not_nan(self, frame):
        # the nan-vs-None trap: a numeric pandas Series surfaces NULL as
        # nan, and `nan is not None` is True — the object-dtype restore
        # must hand the predicate a real None on BOTH paths
        fn = lambda v: v is not None  # noqa: E731
        fast = _count(RowLevelValidator("v", fn).validate(frame))
        slow = _count(RowLevelValidator("v", fn, vectorized=False).validate(frame))
        assert fast == slow == 100  # exactly the planted nulls

    def test_nan_stays_nan_null_stays_none(self, spark):
        # the OTHER half of the null contract (ADVICE r12): a genuine NaN
        # double is NOT an SQL NULL — F.udf hands the predicate nan, so
        # the vectorized path must too. `s.notna()` is False for both, so
        # a notna-based restore silently upgraded NaN to None; the mask
        # must come from isNull() computed JVM-side.
        import math

        df = spark.createDataFrame(
            [(1, float("nan")), (2, None), (3, 5.0)], "id long, v double"
        )
        fn = lambda v: v is not None  # noqa: E731
        fast = _count(RowLevelValidator("v", fn).validate(df))
        slow = _count(RowLevelValidator("v", fn, vectorized=False).validate(df))
        assert fast == slow == 1  # only the real NULL violates

        is_nan = lambda v: v is not None and isinstance(v, float) and math.isnan(v)  # noqa: E731
        fn2 = lambda v: not is_nan(v)  # noqa: E731
        fast2 = _count(RowLevelValidator("v", fn2).validate(df))
        slow2 = _count(RowLevelValidator("v", fn2, vectorized=False).validate(df))
        assert fast2 == slow2 == 1  # only the real NaN violates

    def test_string_predicate_identical(self, frame):
        fn = lambda v: v is not None and v.endswith("7")  # noqa: E731
        fast = _count(RowLevelValidator("s", fn).validate(frame))
        slow = _count(RowLevelValidator("s", fn, vectorized=False).validate(frame))
        assert fast == slow > 0

    def test_predicate_raising_on_values_falls_back(self, frame, monkeypatch):
        # force the vectorized path to fail at execution: the validator
        # must retry row-at-a-time and return the same verdict
        calls = {"n": 0}
        orig = RowLevelValidator._agg_row

        def flaky(self, df, ok_udf):
            calls["n"] += 1
            if calls["n"] == 1:
                raise RuntimeError("simulated Arrow conversion failure")
            return orig(self, df, ok_udf)

        monkeypatch.setattr(RowLevelValidator, "_agg_row", flaky)
        fn = lambda v: v is None or v < 90  # noqa: E731
        got = _count(RowLevelValidator("v", fn).validate(frame))
        monkeypatch.undo()
        want = _count(RowLevelValidator("v", fn, vectorized=False).validate(frame))
        assert calls["n"] == 2 and got == want

    def test_clean_column_returns_no_issues(self, frame):
        assert RowLevelValidator("id", lambda v: v >= 0).validate(frame) == []
