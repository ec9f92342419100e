"""Measure: is the HOF dot product (aggregate(zip_with(...))) a real
per-row eval cost vs an unrolled, codegen-able arithmetic expression?

Higher-order functions are CodegenFallback in Spark — every row pays
interpreted lambda evaluation plus a boxed-array round per zip_with.
An unrolled sum over arr[i] terms compiles into whole-stage codegen.
Bit-exactness: the HOF fold computes ((0.0 + a0*b0) + a1*b1) + ... ;
the unrolled expression is rendered with the same association and the
same 0.0 seed, so the IEEE result is identical bit-for-bit.

Usage: python benchmarks/hof_dot_probe.py [rows] [dim] [reps]
"""

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")
from truthound_spark import get_spark  # noqa: E402

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
DIM = int(sys.argv[2]) if len(sys.argv) > 2 else 64
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 3


def unrolled_dot_sql(a: str, b: str, dim: int) -> str:
    """((0.0 + a[0]*b[0]) + a[1]*b[1]) + ... — same association as the
    HOF fold with seed 0.0, hence bit-identical."""
    expr = f"(0.0 + ({a}[0] * {b}[0]))"
    for i in range(1, dim):
        expr = f"({expr} + ({a}[{i}] * {b}[{i}]))"
    return expr


def unrolled_dot_lit_sql(a: str, lit: list, dim: int) -> str:
    expr = f"(0.0 + ({a}[0] * {lit[0]!r}))"
    for i in range(1, dim):
        expr = f"({expr} + ({a}[{i}] * {lit[i]!r}))"
    return expr


def main():
    spark = get_spark()
    sc = spark.sparkContext

    # deterministic dim-DIM vectors from id, materialized once
    base = (
        spark.range(ROWS)
        .select(
            "id",
            F.expr(
                f"transform(sequence(1, {DIM}), "
                "j -> cast(pmod(id * 2654435761 + j * 40503, 1000003) as double)"
                " / 1000003.0)"
            ).alias("va"),
            F.expr(
                f"transform(sequence(1, {DIM}), "
                "j -> cast(pmod(id * 97 + j * 1299721, 999983) as double)"
                " / 999983.0)"
            ).alias("vb"),
        )
        .localCheckpoint()
    )
    base.count()

    lit = [((i * 2654435761 + 7) % 1000003) / 1000003.0 for i in range(DIM)]
    lit_arr = "array(" + ",".join(repr(x) for x in lit) + ")"

    hof_col = F.expr(
        "aggregate(zip_with(va, vb, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)"
    )
    unr_col = F.expr(unrolled_dot_sql("va", "vb", DIM))
    hof_lit = F.expr(
        f"aggregate(zip_with(va, {lit_arr}, (x, y) -> x * y), 0.0D,"
        " (acc, v) -> acc + v)"
    )
    unr_lit = F.expr(unrolled_dot_lit_sql("va", lit, DIM))

    # bit-exactness check first, on a slice
    chk = (
        base.limit(50_000)
        .select(
            (hof_col - unr_col).alias("d1"),
            (hof_lit - unr_lit).alias("d2"),
        )
        .agg(
            F.sum(F.when(F.col("d1") != 0.0, 1).otherwise(0)).alias("n1"),
            F.sum(F.when(F.col("d2") != 0.0, 1).otherwise(0)).alias("n2"),
        )
        .collect()[0]
    )
    print(f"bit-exactness: col-col mismatches={chk['n1']}, lit mismatches={chk['n2']}")

    variants = {
        "hof_col_col": hof_col,
        "unrolled_col_col": unr_col,
        "hof_lit": hof_lit,
        "unrolled_lit": unr_lit,
    }
    times = {k: [] for k in variants}
    for rep in range(REPS):
        for name, e in variants.items():
            df = base.select(F.sum(e).alias("s"))
            sc.setJobDescription(f"probe:{name}:rep{rep}")
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            times[name].append(time.perf_counter() - t0)
    for name, ts in times.items():
        ts = sorted(ts)
        print(f"{name:20s} median {ts[len(ts)//2]:.3f}s  samples {[round(t,3) for t in ts]}")


if __name__ == "__main__":
    main()
