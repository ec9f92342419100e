"""Measure the _pq_subspace_code argmin shapes: the dot products run
INSIDE a transform lambda (HOFs are CodegenFallback, so everything in
there is interpreted). Three variants over the same 2M dim-8 subvectors
and the same k=16 literal centroids:

  A) current: transform(cents, e -> xx - 2*fold_dot(x, e.cv) + e.cc)
  B) fold dot replaced by an unrolled sum inside the same transform
  C) no transform at all: k expanded struct expressions + array_min,
     the whole argmin in whole-stage codegen

All three must agree bit-for-bit (same association, same seed).

Usage: python benchmarks/pq_argmin_probe.py [rows] [sub_d] [k] [reps]
"""

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")
from truthound_spark import get_spark  # noqa: E402
from truthound_spark.litexpr import lit_struct_array, sql_double  # noqa: E402

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
SUB_D = int(sys.argv[2]) if len(sys.argv) > 2 else 8
K = int(sys.argv[3]) if len(sys.argv) > 3 else 16
REPS = int(sys.argv[4]) if len(sys.argv) > 4 else 3


def fold_dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda p, q: p * q), F.lit(0.0), lambda acc, v: acc + v
    )


def unrolled_dot(a, b, dim):
    acc = F.lit(0.0) + (a[0] * b[0])
    for i in range(1, dim):
        acc = acc + (a[i] * b[i])
    return acc


def main():
    spark = get_spark()
    sc = spark.sparkContext

    base = (
        spark.range(ROWS)
        .select(
            "id",
            F.expr(
                f"transform(sequence(1, {SUB_D}), "
                "j -> cast(pmod(id * 2654435761 + j * 40503, 1000003) as double)"
                " / 1000003.0)"
            ).alias("x"),
        )
        .localCheckpoint()
    )
    base.count()

    cents = [
        (ci, [((ci * 7919 + j * 104729 + 13) % 999983) / 999983.0 for j in range(SUB_D)])
        for ci in range(K)
    ]
    cents_lit = lit_struct_array(
        [
            {
                "cell": str(int(ci)),
                "cv": "array(" + ",".join(sql_double(v) for v in c) + ")",
                "cc": sql_double(sum((v * v for v in c), 0.0)),
            }
            for ci, c in cents
        ]
    )

    xx = fold_dot(F.col("x"), F.col("x"))
    xx_unr = unrolled_dot(F.col("x"), F.col("x"), SUB_D)

    # A: current shape
    a_scored = F.transform(
        cents_lit,
        lambda e: F.struct(
            (xx - 2 * fold_dot(F.col("x"), e["cv"]) + e["cc"]).alias("dist"),
            e["cell"].alias("cell"),
        ),
    )
    va = F.array_min(a_scored)["cell"]

    # B: unrolled inner dot, same transform
    b_scored = F.transform(
        cents_lit,
        lambda e: F.struct(
            (xx_unr - 2 * unrolled_dot(F.col("x"), e["cv"], SUB_D) + e["cc"]).alias(
                "dist"
            ),
            e["cell"].alias("cell"),
        ),
    )
    vb = F.array_min(b_scored)["cell"]

    # C: fully expanded — k struct expressions, no HOF anywhere
    c_structs = [
        F.struct(
            (
                xx_unr
                - 2
                * unrolled_dot(
                    F.col("x"), F.array(*[F.lit(v) for v in c]), SUB_D
                )
                + F.lit(sum((v * v for v in c), 0.0))
            ).alias("dist"),
            F.lit(ci).alias("cell"),
        )
        for ci, c in cents
    ]
    vc = F.array_min(F.array(*c_structs))["cell"]

    chk = (
        base.limit(50_000)
        .agg(
            F.sum(F.when(va != vb, 1).otherwise(0)).alias("ab"),
            F.sum(F.when(va != vc.cast("string"), 1).otherwise(0)).alias("ac"),
        )
        .collect()[0]
    )
    print(f"agreement: A!=B rows={chk['ab']}, A!=C rows={chk['ac']}")

    variants = {"A_transform_fold": va, "B_transform_unrolled": vb, "C_expanded": vc}
    times = {kk: [] for kk in variants}
    for rep in range(REPS):
        for name, e in variants.items():
            df = base.select(e.cast("string").alias("c")).groupBy("c").count()
            sc.setJobDescription(f"pqprobe:{name}:rep{rep}")
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            times[name].append(time.perf_counter() - t0)
    for name, ts in times.items():
        ts = sorted(ts)
        print(f"{name:22s} median {ts[len(ts)//2]:.3f}s  samples {[round(t,3) for t in ts]}")


if __name__ == "__main__":
    main()
