"""Capture .explain("formatted") output for declared queries → plans/<round>/.

Usage:
    python scripts/capture_plans.py <outdir> [suffix] [name ...]

Builds each named declared query's DataFrame at $SPARK_GRAFT_SF_DIR
(default sf0.1) and writes ``<outdir>/<name>_<suffix>.txt`` (suffix
defaults to "after"). With no names, captures the default headline set
(the bench-visible declared queries). explain only — nothing executes,
so plan capture is cheap and side-effect-free.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

HEADLINE = [
    "ngram_novelty_documents",
    "minhash_lsh_pairs_documents",
    "dedup_clusters_documents",
    "incremental_dedup_indexed_documents",
    "delta_check_fp_keys_colocated_orders",
    "lof_native_customer",
    "pq_search_embeddings",
    "bpe_token_counts_documents",
    "bitext_mining_embeddings",
    "dsir_select_documents",
    "winnow_overlap_documents",
    "self_dedup_spans_documents",
    "semantic_dedup_embeddings",
    "tag_documents_fused",
    "decontamination_overlap_documents",
]


def main() -> None:
    if len(sys.argv) < 2:
        raise SystemExit(__doc__)
    outdir = sys.argv[1]
    suffix = sys.argv[2] if len(sys.argv) > 2 else "after"
    names = sys.argv[3:] or HEADLINE
    os.makedirs(outdir, exist_ok=True)

    from pyspark.sql import SparkSession

    from truthound_spark.entry_families import build_registries

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("plan_capture")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry = build_registries()[0]
    for name in names:
        fn = registry.get(name)
        if fn is None:
            print(f"SKIP {name}: not a declared query")
            continue
        try:
            df = fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as exc:  # capture build-time failures visibly
            plan = f"PLAN CAPTURE FAILED: {type(exc).__name__}: {exc}"
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        n_ex = plan.count("Exchange")
        n_py = plan.count("EvalPython") + plan.count("MapInPandas") + plan.count(
            "MapInArrow"
        )
        print(f"WROTE {path}  ({len(plan)} chars, Exchange≈{n_ex}, PythonNodes≈{n_py})")
    spark.stop()


if __name__ == "__main__":
    main()
