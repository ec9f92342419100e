"""Measure the coarse-assign hoist (_nearest_cell_pairs vs inline l2_sq
in the crossJoin projection): N rows x CELLS centroids, dim-DIM vectors,
top-1 window — the exact ivf/semantic_dedup assignment shape.

Usage: python benchmarks/assign_hoist_probe.py [rows] [dim] [cells] [reps]
"""

import sys
import time

from pyspark.sql import functions as F
from pyspark.sql import Window

sys.path.insert(0, "/root/repo")
from truthound_spark import get_spark  # noqa: E402
from truthound_spark.pipeline.similarity import (  # noqa: E402
    _nearest_cell_pairs,
    l2_sq,
)

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
DIM = int(sys.argv[2]) if len(sys.argv) > 2 else 64
CELLS = int(sys.argv[3]) if len(sys.argv) > 3 else 16
REPS = int(sys.argv[4]) if len(sys.argv) > 4 else 3


def main():
    spark = get_spark()
    sc = spark.sparkContext

    corpus = (
        spark.range(ROWS)
        .select(
            "id",
            F.expr(
                f"transform(sequence(1, {DIM}), "
                "j -> cast(pmod(id * 2654435761 + j * 40503, 1000003) as double)"
                " / 1000003.0)"
            ).alias("v"),
        )
        .localCheckpoint()
    )
    corpus.count()
    cents = (
        corpus.orderBy("id")
        .limit(CELLS)
        .select(F.col("id").alias("cell"), F.col("v").alias("cv"))
        .localCheckpoint()
    )
    cents.count()

    w = Window.partitionBy("id").orderBy("d2", "cell")

    def old_assign():
        return (
            corpus.crossJoin(F.broadcast(cents))
            .select("id", "cell", l2_sq(F.col("v"), F.col("cv")).alias("d2"))
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select("id", "cell")
        )

    def new_assign():
        pairs, d2 = _nearest_cell_pairs(corpus, cents, "v")
        return (
            pairs.select("id", "cell", d2.alias("d2"))
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select("id", "cell")
        )

    mism = (
        old_assign()
        .withColumnRenamed("cell", "c_old")
        .join(new_assign().withColumnRenamed("cell", "c_new"), "id")
        .filter(F.col("c_old") != F.col("c_new"))
        .count()
    )
    print(f"assignment agreement: {mism} mismatching rows")

    times = {"old_inline_l2sq": [], "new_hoisted": []}
    for rep in range(REPS):
        for name, fn in (("old_inline_l2sq", old_assign), ("new_hoisted", new_assign)):
            sc.setJobDescription(f"hoist:{name}:rep{rep}")
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            times[name].append(time.perf_counter() - t0)
    for name, ts in times.items():
        ts = sorted(ts)
        print(f"{name:18s} median {ts[len(ts)//2]:.3f}s  samples {[round(t,3) for t in ts]}")


if __name__ == "__main__":
    main()
