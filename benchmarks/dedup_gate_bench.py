"""sf10-lane measurement of the r12 dedup verify-stage changes
(VERDICT r11 #1/#2 "Done" criteria): the candidate-pair broadcast vs
the size-gated shuffle path, and the bucketed shingle-table mode.

Builds the same 100x replica-perturbed documents corpus as bench.py's
sf10 lane (500k docs from sf0.1) and measures minhash_dedup_pairs one
cold pass per mode:

* forced-broadcast  — broadcast_pairs_budget=2**40 (the pre-r12 plan:
  every attach broadcasts the ~35M-pair relation),
* gated (default)   — 64MB budget, the pair count trips the gate and
  the attaches become shuffle-hash joins,
* gated + bucketed  — shingle table persisted with write_shingle_layout
  (bucketBy id), localCheckpoint replaced by the stored layout.

Run: python benchmarks/dedup_gate_bench.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import make_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def main():
    from pyspark.sql import functions as F

    from truthound_spark.pipeline.dedup import (
        minhash_dedup_pairs,
        write_shingle_layout,
    )

    spark = make_spark()
    spark.sparkContext.setLogLevel("ERROR")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").repartition(cpus)
    reps = spark.range(100).select(F.col("id").cast("int").alias("rep"))
    documents100 = (
        base.crossJoin(F.broadcast(reps))
        .select(
            (F.col("doc_id") * 100 + F.col("rep")).alias("doc_id"),
            F.concat_ws(
                " ",
                F.expr(
                    "transform(split(text, ' '), (w, i) -> "
                    "IF((i + rep) % 7 = 0, concat(w, '_', rep), w))"
                ),
            ).alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        .persist()
    )
    n = documents100.count()
    out = {"rows": n, "sf_dir": SF_DIR}

    def timed(label, **kwargs):
        t0 = time.time()
        c = minhash_dedup_pairs(
            documents100, threshold=0.7, num_hashes=64, bands=32, **kwargs
        ).count()
        out[label] = round(time.time() - t0, 1)
        out[f"{label}_pairs"] = c

    timed("forced_broadcast", broadcast_pairs_budget=1 << 40)
    timed("gated_shuffle", )  # default 64MB budget -> shuffle path at 35M pairs
    t0 = time.time()
    table = write_shingle_layout(
        documents100,
        "bench_doc_shingles_x100",
        buckets=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        location=os.path.join("/tmp", "spark_graft_shingle_layout_x100"),
    )
    out["shingle_layout_write_once"] = round(time.time() - t0, 1)
    timed("gated_bucketed", shingle_table=table)
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
