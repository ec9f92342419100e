"""A/B for the r14 ngram_novelty rewrite (ADVICE r13): the r13 count
window over partitionBy(gram) vs HEAD's two partial-agg groupBys over a
persisted shingle relation.

The window form is one pass with no persist but serializes every
occurrence of a hot gram into one window task (no AQE skew splitting on
window exchanges); the groupBy form pays a tracked persist of the
shingle arrays and gets map-side partial aggregation — a hot gram
collapses to one partial row per task. This measures both at sf0.1
(documents) AND on a synthetic hot-gram corpus (every doc shares one
boilerplate sentence — the workload the ADVICE finding is about).

Run: python benchmarks/ngram_novelty_ab.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import SF_DIR, make_spark  # noqa: E402


def window_form(df, text_col="text", id_col="doc_id", n=3):
    """The r13 implementation, verbatim semantics."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from truthound_spark.pipeline.dedup import _shingle_arrays

    sh = _shingle_arrays(df, text_col, id_col, n)
    inv = (
        sh.select("id", F.explode_outer("sh").alias("g"))
        .filter(F.col("g").isNotNull() & (F.col("g") != ""))
    )
    wg = Window.partitionBy("g")
    per_doc = (
        inv.withColumn("df", F.count(F.lit(1)).over(wg))
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum((F.col("df") == 1).cast("long")).alias("novel_grams"),
        )
    )
    ids = df.select(F.col(id_col).cast("long").alias("id"))
    return ids.join(per_doc, "id", "left").select(
        "id",
        F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
        F.coalesce("novel_grams", F.lit(0)).alias("novel_grams"),
        F.round(
            F.coalesce(F.col("novel_grams") / F.col("n_grams"), F.lit(0.0)), 6
        ).alias("novelty"),
    )


def timed(fn, reps=3):
    times = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        times.append(round(time.time() - t0, 3))
    return {"samples": times, "median": sorted(times)[len(times) // 2]}


def main():
    from pyspark.sql import functions as F

    from truthound_spark.pipeline.dedup import release_dedup_caches
    from truthound_spark.pipeline.text import ngram_novelty

    spark = make_spark()
    spark.sparkContext.setLogLevel("ERROR")
    out = {"sf_dir": SF_DIR}

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    def run_head():
        ngram_novelty(docs, n=3).agg(
            F.sum("novel_grams"), F.sum("n_grams")
        ).collect()
        release_dedup_caches()

    def run_window():
        window_form(docs, n=3).agg(
            F.sum("novel_grams"), F.sum("n_grams")
        ).collect()

    out["documents_head_groupby"] = timed(run_head)
    out["documents_r13_window"] = timed(run_window)

    # hot-gram corpus: 200k docs, EVERY doc carries the same boilerplate
    # sentence (8 shared grams x 200k occurrences each) plus a unique
    # tail — the skew shape the ADVICE finding targets
    hot = spark.range(200_000).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit(
                "this document is provided as is without warranty of any "
                "kind either express or "
            ),
            F.col("id").cast("string"),
            F.lit(" unique tail words "),
            (F.col("id") * 7919).cast("string"),
        ).alias("text"),
    ).localCheckpoint(eager=True)

    def run_head_hot():
        ngram_novelty(hot, n=3).agg(
            F.sum("novel_grams"), F.sum("n_grams")
        ).collect()
        release_dedup_caches()

    def run_window_hot():
        window_form(hot, n=3).agg(
            F.sum("novel_grams"), F.sum("n_grams")
        ).collect()

    out["hotgram_head_groupby"] = timed(run_head_hot)
    out["hotgram_r13_window"] = timed(run_window_hot)

    # results must be identical on both shapes
    a = sorted(ngram_novelty(hot, n=3).collect())
    b = sorted(window_form(hot, n=3).collect())
    out["hotgram_results_identical"] = a == b
    release_dedup_caches()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
