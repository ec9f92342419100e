"""Isolated A/B of pq_search's Arrow ADC kernel (VERDICT r14 #3).

Alternating literal-expression vs ``mapInArrow`` NumPy kernel runs of
the bench's exact pq body (train m=8 k=16 iters=1, search k=10, 8
queries), at 1× and at the replica-perturbed 100× embeddings corpus,
plus the bit-exactness gate: ``exceptAll`` both ways over the FULL
(query_id, id, adc_dist, rank) result must be 0 at both scales before
the kernel default may flip.

Run: python benchmarks/pq_adc_kernel_probe.py [mult] [reps]
Prints one JSON object per repetition + the equivalence verdict.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import SF_DIR, make_spark  # noqa: E402

MULT = int(sys.argv[1]) if len(sys.argv) > 1 else 1
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def main():
    spark = make_spark()
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    from truthound_spark.pipeline.similarity import pq_search, pq_train

    embeddings = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    if MULT > 1:
        reps = spark.range(MULT).select(F.col("id").cast("int").alias("rep"))
        embeddings = (
            embeddings.crossJoin(F.broadcast(reps))
            .select(
                (F.col("vec_id") * MULT + F.col("rep")).alias("vec_id"),
                F.expr(
                    "transform(embedding, (x, i) -> "
                    "IF(i = rep % size(embedding), "
                    "cast(x + (rep + 1) * 0.0003 as float), x))"
                ).alias("embedding"),
                "label",
            )
            .persist()
        )
    n = embeddings.count()
    q = embeddings.filter(F.col("vec_id") < 8).withColumnRenamed(
        "vec_id", "query_id"
    )

    def run(kernel: bool):
        books = pq_train(embeddings, m=8, k=16, iters=1)
        pq_search(embeddings, q, books, k=10, arrow_kernel=kernel).count()
        return books

    for rep in range(REPS):
        t: dict = {"rows": n}
        for name, kernel in (("literal", False), ("kernel", True)):
            spark.sparkContext.setJobDescription(f"pq probe rep{rep}: {name}")
            t0 = time.time()
            run(kernel)
            t[name] = round(time.time() - t0, 3)
        # search-only split (train excluded): same codebooks, both paths
        books = pq_train(embeddings, m=8, k=16, iters=1)
        for name, kernel in (("literal_search", False), ("kernel_search", True)):
            spark.sparkContext.setJobDescription(f"pq probe rep{rep}: {name}")
            t0 = time.time()
            pq_search(embeddings, q, books, k=10, arrow_kernel=kernel).count()
            t[name] = round(time.time() - t0, 3)
        print(json.dumps(t), flush=True)

    books = pq_train(embeddings, m=8, k=16, iters=1)
    a = pq_search(embeddings, q, books, k=10, arrow_kernel=False)
    b = pq_search(embeddings, q, books, k=10, arrow_kernel=True)
    d1 = a.exceptAll(b).count()
    d2 = b.exceptAll(a).count()
    print(
        json.dumps(
            {"mult": MULT, "exceptAll_lit_minus_kernel": d1,
             "exceptAll_kernel_minus_lit": d2, "bit_identical": d1 == 0 and d2 == 0}
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
