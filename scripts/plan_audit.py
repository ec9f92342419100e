"""Mechanical plan audit over EVERY declared query (OPTIMIZATION_r14).

For each entry in ``__spark_entry__.queries()``: build the DataFrame at
$SPARK_GRAFT_VERIFY_SF_DIR (default sf0.01 — plan SHAPE is what is
audited, not scan size), render explain("formatted"), and count the
red-flag signals the guide tells us to look for (§2.4 unexpected
Exchange, §3.1 join strategy, §4.1 Python-boundary nodes, §3.3
cartesian products, §6 pushed filters). Prints one summary line per
query and a final aggregate; exits nonzero only on build failures.

Usage: python scripts/plan_audit.py [out_json]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_VERIFY_SF_DIR", "/root/testdata/sf0.01")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

SIGNALS = [
    "Exchange",
    "BroadcastExchange",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
    "BatchEvalPython",
    "ArrowEvalPython",
    "MapInPandas",
    "MapInArrow",
    "InMemoryRelation",
]


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    from pyspark.sql import SparkSession

    from truthound_spark.entry_families import build_registries

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("plan_audit")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry = build_registries()[0]
    results: dict[str, dict] = {}
    failures: list[str] = []
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name, fn in registry.items():
        try:
            df = fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().explainString(mode)
        except Exception as exc:
            failures.append(name)
            print(f"FAIL  {name}: {type(exc).__name__}: {exc}")
            continue
        row = {s: plan.count(s) for s in SIGNALS}
        # plain (shuffle) Exchange count: subtract broadcast mentions
        row["Exchange"] -= row["BroadcastExchange"]
        row["py_nodes"] = (
            row["BatchEvalPython"]
            + row["ArrowEvalPython"]
            + row["MapInPandas"]
            + row["MapInArrow"]
        )
        results[name] = row
        flags = []
        if row["CartesianProduct"]:
            flags.append(f"CARTESIAN×{row['CartesianProduct']}")
        if row["BatchEvalPython"]:
            flags.append(f"BatchEvalPython×{row['BatchEvalPython']}")
        print(
            f"OK    {name}: shuffles={row['Exchange']} "
            f"bhj={row['BroadcastHashJoin']} smj={row['SortMergeJoin']} "
            f"bnlj={row['BroadcastNestedLoopJoin']} py={row['py_nodes']}"
            + ("  <== " + ",".join(flags) if flags else "")
        )
    agg = {
        "n_queries": len(results),
        "n_failures": len(failures),
        "failures": failures,
        "with_cartesian": [n for n, r in results.items() if r["CartesianProduct"]],
        "with_batch_eval_python": [
            n for n, r in results.items() if r["BatchEvalPython"]
        ],
        "with_python_nodes": [n for n, r in results.items() if r["py_nodes"]],
        "max_shuffles": max(
            ((r["Exchange"], n) for n, r in results.items()), default=(0, "")
        ),
    }
    print(json.dumps(agg, indent=1))
    if out_path:
        with open(out_path, "w") as fh:
            json.dump({"summary": agg, "per_query": results}, fh, indent=1)
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
