"""Test the late-suite slowdown hypothesis: dead localCheckpoint blocks
accumulate because ContextCleaner only unpersists an RDD after a JVM GC
collects its (JVM-side) object, and `spark.cleaner.periodicGC.interval`
defaults to 30 MINUTES — on a large driver heap old-gen GCs are rare,
so every entry/pass's checkpoint blocks stay pinned for the whole
suite. Symptom observed in-suite: pq_train_search warm samples GROW
monotonically (4.6 -> 5.8 -> 7.8 s) at a suite position ~30 entries in,
while the same body stabilizes at ~3.5 s isolated.

Protocol (one fresh session per mode, run this script twice):

  python benchmarks/dead_block_probe.py baseline   # pollute, then pq
  python benchmarks/dead_block_probe.py release    # pollute + release
                                                   # dead blocks, then pq

Pollution = N rounds of the checkpoint-heavy dedup entries (the exact
suite bodies). Prints persistent-RDD count + storage bytes before the
pq samples, then 3 pq samples. If `release` reads like isolated pq and
`baseline` reads elevated/growing, the hypothesis is confirmed and the
fix is the bench-side release between entries/passes.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import SF_DIR, make_spark  # noqa: E402

MODE = sys.argv[1] if len(sys.argv) > 1 else "baseline"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 4


def release_dead_blocks(spark) -> int:
    """Unpersist every persistent RDD. ONLY safe when no live DataFrame
    depends on pinned blocks (between self-contained bench entries)."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    n = len(jmap)
    for jrdd in list(jmap.values()):
        jrdd.unpersist(False)
    return n


def persistent_stats(spark):
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return jmap.size()


def main():
    spark = make_spark()
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    from truthound_spark.pipeline.dedup import (
        dedup_clusters,
        minhash_dedup_pairs,
        release_dedup_caches,
    )

    documents = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    embeddings = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    documents.count(); embeddings.count()

    for r in range(ROUNDS):
        minhash_dedup_pairs(documents, threshold=0.7, num_hashes=64, bands=32).count()
        dedup_clusters(documents, threshold=0.7, num_hashes=64, bands=32).filter(
            ~F.col("is_canonical")
        ).count()
        release_dedup_caches()
        if MODE == "release":
            release_dead_blocks(spark)
        print(
            f"pollution round {r}: persistent RDDs now {persistent_stats(spark)}",
            flush=True,
        )

    from truthound_spark.pipeline.similarity import pq_search, pq_train

    for i in range(4):
        if MODE == "release":
            release_dead_blocks(spark)
        t0 = time.time()
        books = pq_train(embeddings, m=8, k=16, iters=1)
        q = embeddings.filter(F.col("vec_id") < 8).withColumnRenamed(
            "vec_id", "query_id"
        )
        pq_search(embeddings, q, books, k=10).count()
        print(
            f"pq sample {i}: {time.time()-t0:.2f}s  "
            f"(persistent RDDs {persistent_stats(spark)})",
            flush=True,
        )


if __name__ == "__main__":
    main()
