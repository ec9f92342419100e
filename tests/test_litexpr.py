"""litexpr: fast literal-expression construction must be BIT-IDENTICAL
to the F.lit chain it replaces (r14 optimization — the PQ/LSH/IVF/k-means
codebook inlining paths now render literals as one SQL string; the whole
optimization is void if a single double parses to different IEEE bits)."""

import math
import struct

import pytest
from pyspark.sql import functions as F

from truthound_spark.litexpr import lit_double_array, lit_struct_array, sql_double

EXTREMES = [
    0.0,
    -0.0,
    1.0,
    -1.0,
    5e-324,  # smallest subnormal
    -5e-324,
    2.2250738585072014e-308,  # smallest normal
    1.7976931348623157e308,  # max double
    -1.7976931348623157e308,
    1 / 3,
    -2 / 3,
    1e-06,
    2.5e-07,
    123456789.123456789,
    float("inf"),
    float("-inf"),
    float("nan"),
]


def _bits(v: float) -> bytes:
    return struct.pack(">d", v)


def test_lit_double_array_bit_identical(spark):
    import random

    rng = random.Random(14)
    vals = EXTREMES + [rng.uniform(-1e9, 1e9) for _ in range(200)]
    df = spark.range(1)
    fast = df.select(lit_double_array(vals).alias("a")).first()["a"]
    slow = df.select(
        F.array(*[F.lit(float(v)) for v in vals]).alias("a")
    ).first()["a"]
    assert len(fast) == len(slow) == len(vals)
    for f, s in zip(fast, slow):
        assert _bits(f) == _bits(s)


def test_sql_double_nonfinite():
    assert "Infinity" in sql_double(float("inf"))
    assert "-Infinity" in sql_double(float("-inf"))
    assert "NaN" in sql_double(float("nan"))
    assert sql_double(1.5) == "1.5D"


def test_lit_struct_array_matches_struct_chain(spark):
    rows = [
        {"cell": str(i), "cv": "array(" + ",".join(sql_double(v) for v in cv) + ")",
         "cc": sql_double(sum((v * v for v in cv), 0.0))}
        for i, cv in enumerate([[1.25, -2.5], [1 / 3, 5e-324], [0.0, -0.0]])
    ]
    df = spark.range(1)
    fast = df.select(lit_struct_array(rows).alias("a")).first()["a"]
    slow = df.select(
        F.array(
            *[
                F.struct(
                    F.lit(i).cast("int").alias("cell"),
                    F.array(*[F.lit(float(v)) for v in cv]).alias("cv"),
                    F.lit(float(sum((v * v for v in cv), 0.0))).alias("cc"),
                )
                for i, cv in enumerate([[1.25, -2.5], [1 / 3, 5e-324], [0.0, -0.0]])
            ]
        ).alias("a")
    ).first()["a"]
    for f, s in zip(fast, slow):
        assert f["cell"] == s["cell"]
        assert _bits(f["cc"]) == _bits(s["cc"])
        for fv, sv in zip(f["cv"], s["cv"]):
            assert _bits(fv) == _bits(sv)


def test_pq_codebooks_unchanged_by_litexpr(spark):
    """pq_train on a fixed frame returns the same codebooks regardless of
    how the argmin literals are constructed — guards the r14 rewiring."""
    from truthound_spark.pipeline.similarity import pq_train

    rows = [(i, [((i * 7 + j * 13) % 29) / 7.0 for j in range(8)]) for i in range(64)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    books = pq_train(df, m=2, k=4, iters=2)
    assert len(books) == 2
    for cb in books:
        assert [c for c, _v in cb] == sorted(c for c, _v in cb)
        for _ci, vec in cb:
            assert len(vec) == 4
            assert all(math.isfinite(v) for v in vec)
    # determinism: a second run is bit-identical
    books2 = pq_train(df, m=2, k=4, iters=2)
    assert [
        [(c, [_bits(v) for v in vec]) for c, vec in cb] for cb in books
    ] == [[(c, [_bits(v) for v in vec]) for c, vec in cb] for cb in books2]
