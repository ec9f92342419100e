"""Isolated per-entry probe: the bench's EXACT entry bodies and warm
protocol (cold + 3 warm + spread guard) for a named subset of suite
entries, each measured in its own fresh run order — the evidence
harness for driver-vs-isolated regression dispositions (VERDICT r13 #2
and #6: pq_train_search gap; tumbling_windows_events /
lof_native_customer sub-threshold drift pins).

Two modes:

* default — run each named entry alone (after the shared table loads),
  idle-machine isolated numbers;
* ``--mid-suite`` — first run the suite entries that PRECEDE the probe
  targets in bench.py order (one pass each, untimed), then measure the
  targets: a position probe separating "the query regressed" from "the
  query inherits mid-suite cache/GC state".

Run: python benchmarks/isolated_probe.py [--mid-suite] [entry ...]
Prints one JSON object {entry: {cold, warm_samples, median}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import (  # noqa: E402
    SF_DIR,
    apply_spread_guard,
    best_recorded_canary,
    canary_fn,
    make_spark,
    spread_guard_triggers,
)

DEFAULT_ENTRIES = [
    "pq_train_search",
    "tumbling_windows_events",
    "lof_native_customer",
]


def entry_fns(spark):
    """The probe-able entry bodies, byte-equivalent to bench.py's."""
    from pyspark.sql import functions as F

    customer = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    embeddings = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    documents = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    def tumbling():
        events.groupBy(F.window("ts", "1 hour")).agg(
            F.count(F.lit(1)).alias("n"), F.avg("value").alias("a")
        ).collect()

    def lof_bench():
        from truthound_spark.pipeline.neighbors import lof

        feats = customer.select(
            F.col("c_custkey").alias("cid"),
            (F.col("c_acctbal") / 1000).alias("x"),
            F.col("c_nationkey").cast("double").alias("y"),
        )
        lof(feats, ["x", "y"], k=5, id_col="cid").filter(
            F.col("lof") > 1.5
        ).count()

    def pq_bench():
        from truthound_spark.pipeline.similarity import pq_search, pq_train

        books = pq_train(embeddings, m=8, k=16, iters=1)
        q = embeddings.filter(F.col("vec_id") < 8).withColumnRenamed(
            "vec_id", "query_id"
        )
        pq_search(embeddings, q, books, k=10).count()

    # untimed warm-up bodies for --mid-suite position simulation: the
    # heavy entries that precede pq_train_search in suite order
    def semantic_decon():
        from truthound_spark.pipeline.dedup import semantic_decontaminate

        semantic_decontaminate(
            embeddings.filter(F.col("vec_id") % 5 != 0),
            embeddings.filter(F.col("vec_id") % 5 == 0),
            threshold=0.45,
        ).count()

    def self_dedup():
        from truthound_spark.pipeline.dedup import self_dedup_spans

        self_dedup_spans(documents, n=8).agg(
            F.sum("removed_tokens"), F.count(F.lit(1))
        ).collect()

    def winnow():
        from truthound_spark.pipeline.text import winnow_overlap_pairs

        winnow_overlap_pairs(documents, k=4, w=4, min_shared=2).count()

    def minhash():
        from truthound_spark.pipeline.dedup import minhash_dedup_pairs

        minhash_dedup_pairs(
            documents, threshold=0.7, num_hashes=64, bands=32
        ).count()

    def dedup_clusters_bench():
        from truthound_spark.pipeline.dedup import dedup_clusters

        dedup_clusters(documents, threshold=0.7, num_hashes=64, bands=32).filter(
            ~F.col("is_canonical")
        ).count()

    def decontaminate_bench():
        from truthound_spark.pipeline.dedup import decontaminate

        decontaminate(
            documents.filter(F.col("doc_id") % 2 == 0),
            documents.filter(F.col("doc_id") % 2 == 1),
        ).count()

    def semantic_dedup_bench():
        from truthound_spark.pipeline.dedup import semantic_dedup

        semantic_dedup(embeddings, num_cells=16, threshold=0.4).filter(
            "NOT keep"
        ).count()

    return (
        {
            "pq_train_search": pq_bench,
            "tumbling_windows_events": tumbling,
            "lof_native_customer": lof_bench,
            "minhash_dedup_documents": minhash,
            "dedup_clusters_documents": dedup_clusters_bench,
            "decontamination_documents": decontaminate_bench,
            "semantic_dedup_embeddings": semantic_dedup_bench,
            "self_dedup_spans": self_dedup,
            "winnow_overlap": winnow,
            "semantic_decontaminate": semantic_decon,
        },
        [minhash, lof_bench, self_dedup, winnow, semantic_decon],
    )


def measure(fn):
    t0 = time.time()
    fn()
    cold = time.time() - t0
    warm = []
    for _ in range(3):
        t0 = time.time()
        fn()
        warm.append(time.time() - t0)
    if spread_guard_triggers(warm):
        t0 = time.time()
        fn()
        warm.append(time.time() - t0)
        warm = apply_spread_guard(warm)
    return {
        "cold": round(cold, 3),
        "warm_samples": [round(x, 3) for x in warm],
        "median": round(sorted(warm)[1], 3),
    }


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    mid_suite = "--mid-suite" in sys.argv
    entries = args or DEFAULT_ENTRIES
    spark = make_spark()
    spark.sparkContext.setLogLevel("ERROR")
    fns, preceding = entry_fns(spark)
    out = {"sf_dir": SF_DIR, "mid_suite": mid_suite}
    # same CPU canary as the bench: readings are only comparable across
    # runs/trees after dividing by the machine's capability at run time.
    # Bracketed like the bench (min of several samples — a single
    # early-session sample is JIT/GC-inflated: the r14 probe's first
    # attempt read 0.80 where the bench's min-of-bracket read 0.38).
    def canary_sample():
        canary_fn(spark)  # codegen warm-up
        samples = []
        for _ in range(3):
            t0 = time.time()
            canary_fn(spark)
            samples.append(time.time() - t0)
        return round(min(samples), 3)

    out["canary_start"] = canary_sample()
    if mid_suite:
        t0 = time.time()
        for fn in preceding:
            fn()
        out["preceding_pass_seconds"] = round(time.time() - t0, 1)
    for name in entries:
        if name not in fns:
            out[name] = {"err": "unknown entry"}
            continue
        out[name] = measure(fns[name])
    out["canary_end"] = canary_sample()
    canary = min(out["canary_start"], out["canary_end"])
    out["canary"] = canary
    best = best_recorded_canary(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    if best:
        out["canary_load_factor"] = round(canary / best, 3)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
