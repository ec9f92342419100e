"""Stage split of the fused document tagger across scale decades
(VERDICT r11 #7: tag_documents_fused measured 13.6x for 10x data at the
sf10 lane — name the superlinear stage or pin a disposition).

tag_documents is a single projection over one scan (no join/shuffle),
so a "stage" here is one tagger's column stack measured alone: each
tagger is applied to the bare corpus and reduced with the same
aggregate, one cold pass per (tagger, decade). Per-tagger decade ratios
then attribute any superlinearity to a specific expression stack —
or, if every stack scales the same, to allocation/GC pressure of the
decade itself. Run: python benchmarks/tag_stage_split.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import make_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def replicate(spark, documents, mult):
    from pyspark.sql import functions as F

    reps = spark.range(mult).select(F.col("id").cast("int").alias("rep"))
    return (
        documents.crossJoin(F.broadcast(reps))
        .select(
            (F.col("doc_id") * mult + F.col("rep")).alias("doc_id"),
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
    )


def main():
    from pyspark.sql import functions as F

    from truthound_spark.pipeline import text as T

    spark = make_spark()
    spark.sparkContext.setLogLevel("ERROR")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    base = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet").repartition(cpus)
    )

    stages = {
        "quality_score": lambda df: T.quality_score(df).agg(
            F.avg("quality_score")
        ),
        "detect_languages": lambda df: T.detect_languages(df).agg(
            F.count(F.lit(1)), F.max("predicted_lang")
        ),
        "fingerprint_documents": lambda df: T.fingerprint_documents(df).agg(
            F.count(F.lit(1)), F.max("fingerprint")
        ),
        "repetition_signals": lambda df: T.repetition_signals(df).agg(
            F.avg("dup_line_fraction")
        ),
        "classifier_quality_score": lambda df: T.classifier_quality_score(
            df
        ).agg(F.avg("classifier_score")),
        "FUSED_tag_documents": lambda df: T.tag_documents(df).agg(
            F.avg("quality_score"), F.avg("classifier_score")
        ),
    }

    out: dict = {"sf_dir": SF_DIR}
    for label, mult in (("sf1", 10), ("sf10", 100)):
        docs = replicate(spark, base, mult).persist()
        n = docs.count()
        decade = {"rows": n}
        for name, fn in stages.items():
            t0 = time.time()
            fn(docs).collect()
            decade[name] = round(time.time() - t0, 2)
        docs.unpersist()
        out[label] = decade
    for name in stages:
        a, b = out["sf1"].get(name), out["sf10"].get(name)
        if a and b:
            out[f"{name}_x_per_decade"] = round(b / a, 2)
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
