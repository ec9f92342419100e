"""Property-based tests (hypothesis) — beyond the reference's test
strategy (SURVEY §5 notes it has none): algebraic invariants of checksum
validators, dedup estimators, and packing that must hold for ARBITRARY
inputs, not just fixtures."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# Luhn: Spark expression chain == pure-Python reference implementation
# ---------------------------------------------------------------------------
def _luhn_ok(digits: str) -> bool:
    total = 0
    for i, ch in enumerate(reversed(digits)):
        d = int(ch)
        if i % 2 == 1:
            d *= 2
            if d > 9:
                d -= 9
        total += d
    return total % 10 == 0


@settings(max_examples=30, deadline=None)
@given(st.lists(st.text("0123456789", min_size=8, max_size=19), min_size=1, max_size=20))
def test_luhn_expression_matches_python(spark, numbers):
    from truthound_spark.validators.business import LuhnValidator

    df = spark.createDataFrame([(n,) for n in numbers], "s string")
    issues = LuhnValidator("s").validate(df)
    spark_invalid = issues[0].count if issues else 0
    py_invalid = sum(0 if _luhn_ok(n) else 1 for n in numbers)
    assert spark_invalid == py_invalid


# ---------------------------------------------------------------------------
# Exact dedup: fingerprint grouping == python normalization grouping
# ---------------------------------------------------------------------------
def _norm(s: str) -> str:
    import re

    return re.sub(r"\s+", " ", re.sub(r"[^a-z0-9\s]", " ", s.lower())).strip()


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.text(
            st.characters(codec="ascii", exclude_categories=["Cc", "Cs"]),
            min_size=1,
            max_size=40,
        ),
        min_size=2,
        max_size=30,
    )
)
def test_exact_dedup_matches_python_grouping(spark, texts):
    from collections import Counter

    from truthound_spark.pipeline.dedup import exact_duplicates

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    groups = exact_duplicates(df).collect()
    spark_dup_rows = sum(r["dup_count"] for r in groups)
    counts = Counter(_norm(t) for t in texts)
    py_dup_rows = sum(c for c in counts.values() if c > 1)
    assert spark_dup_rows == py_dup_rows


# ---------------------------------------------------------------------------
# Sequence packing: budget + permutation coverage hold for any token sizes
# ---------------------------------------------------------------------------
@settings(max_examples=10, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=400), min_size=1, max_size=60))
def test_pack_sequences_invariants(spark, sizes):
    from truthound_spark.pipeline.export import pack_sequences

    docs = [(i, "w " * n) for i, n in enumerate(sizes)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    packed = pack_sequences(df, max_tokens=128, n_shards=4).collect()
    assert all(r["total_tokens"] <= 128 for r in packed)
    packed_ids = sorted(i for r in packed for i in r["doc_ids"])
    assert packed_ids == list(range(len(sizes)))


# ---------------------------------------------------------------------------
# Range validator: count equals the count of any equivalent python filter
# ---------------------------------------------------------------------------
@settings(max_examples=20, deadline=None)
@given(
    st.lists(st.one_of(st.none(), st.floats(allow_nan=False, allow_infinity=False,
                                            min_value=-1e6, max_value=1e6)),
             min_size=1, max_size=50),
    st.floats(min_value=-100, max_value=0),
    st.floats(min_value=1, max_value=100),
)
def test_range_validator_matches_python(spark, values, lo, hi):
    from truthound_spark.validators.distribution import RangeValidator

    df = spark.createDataFrame([(v,) for v in values], "x double")
    issues = RangeValidator("x", lo, hi).validate(df)
    spark_bad = issues[0].count if issues else 0
    py_bad = sum(1 for v in values if v is not None and (v < lo or v > hi))
    assert spark_bad == py_bad
