"""Golden-workload runner (reference: benchmarks/workloads/*.json +
test_benchmark_parity.py): load each workload JSON, run it through the
engine, compare issue counts against ``expected.issue_count``.

The catalog mirrors the reference's 8 release-ga workload shapes
(BASELINE.md): null / unique / range / schema / mixed suite on the 4-row
local_core.csv, plus the 3 pushdown variants executed IN-database
(DuckDB stands in for sqlite — it is also the driver's oracle engine).

Usage: python benchmarks/run_workloads.py  → one line per workload + exit 0/1.
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORKLOAD_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "workloads")


def build_validators(spec: list[dict]):
    from truthound_spark.core.registry import get_validator

    out = []
    for v in spec:
        out.append(get_validator(v["name"])(**v.get("config", {})))
    return out


def run_workload(spark, wl: dict) -> tuple[int, int]:
    """Returns (actual_issue_count, expected_issue_count)."""
    data_path = os.path.join(WORKLOAD_DIR, wl["dataset"])
    expected = wl["expected"]["issue_count"]

    if wl["backend"] == "pushdown":
        from truthound_spark.sources.pushdown import (
            DuckDBSource,
            PushdownCheck,
            PushdownValidationEngine,
        )

        src = DuckDBSource()
        try:
            src.register_csv("workload", data_path)
            p = wl["pushdown"]
            check = PushdownCheck(
                kind=p["kind"],
                column=p["column"],
                min_value=p.get("min_value"),
                max_value=p.get("max_value"),
            )
            issues = PushdownValidationEngine(src, "workload").validate([check])
        finally:
            src.close()
        return len(issues), expected

    df = (
        spark.read.option("header", True)
        .option("inferSchema", True)
        .option("nullValue", "")
        .csv(data_path)
    )
    if "schema" in wl:
        from truthound_spark.schema import ColumnSchema, Schema, validate_against

        baseline = Schema(
            columns={
                name: ColumnSchema(name=name, dtype=c["dtype"], nullable=c["nullable"])
                for name, c in wl["schema"].items()
            }
        )
        problems = [
            p for p in validate_against(df, baseline) if p["problem"] == "missing_column"
        ]
        return len(problems), expected

    import truthound_spark as th

    result = th.check(df, validators=build_validators(wl["validators"]))
    return len(result.issues), expected


def main() -> int:
    import truthound_spark as th

    spark = th.get_spark()
    rc = 0
    for path in sorted(glob.glob(os.path.join(WORKLOAD_DIR, "*.json"))):
        wl = json.load(open(path))
        actual, expected = run_workload(spark, wl)
        ok = actual == expected
        rc |= 0 if ok else 1
        print(f"{'PASS' if ok else 'FAIL'}  {wl['id']}: issues={actual} expected={expected}")
    return rc


if __name__ == "__main__":
    sys.exit(main())
