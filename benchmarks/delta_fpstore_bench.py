"""Delta-validation crossover at 60M rows with the persisted fingerprint
store (VERDICT r11 next-round #3 "Done" criterion: re-measure the 60M
case showing where the stored-fp path beats the cheap-audit baseline).

Measures, on the x100 core-decade lineitem (60M rows, 0.1% modified):

* cheap fused audit of the WHOLE new snapshot (the baseline delta
  validation must beat to be worth running at all),
* an EXPENSIVE audit (regex + set + range battery) of the whole snapshot
  (the workload class where delta validation is designed to win),
* direct delta_check (both snapshots fingerprint-scanned every run),
* write_fingerprints one-time cost (paid when the snapshot lands),
* delta_check through the store (old never read) with both suites.

Run: python benchmarks/delta_fpstore_bench.py [x100_dir]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import make_spark  # noqa: E402

X100 = (
    sys.argv[1]
    if len(sys.argv) > 1
    else "/tmp/spark_graft_core_decade_sf0.1_x100"
)


def main():
    from pyspark.sql import functions as F

    from truthound_spark.core.executor import BatchExpressionExecutor
    from truthound_spark.delta import delta_check, write_fingerprints
    from truthound_spark.validators.completeness import NullValidator
    from truthound_spark.validators.distribution import InSetValidator, RangeValidator
    from truthound_spark.validators.string import RegexValidator

    spark = make_spark()
    spark.sparkContext.setLogLevel("ERROR")
    old = spark.read.parquet(os.path.join(X100, "lineitem.parquet"))
    keys = ["l_orderkey", "l_linenumber"]
    # 0.1% of rows modified + a small insert tail
    new = old.withColumn(
        "l_quantity",
        F.when(F.xxhash64(*keys) % 1000 == 0, F.col("l_quantity") + 1000).otherwise(
            F.col("l_quantity")
        ),
    )
    old.count()
    n = new.count()

    cheap = [
        NullValidator(columns=["l_quantity", "l_extendedprice"]),
        RangeValidator("l_discount", 0.0, 0.1),
    ]

    def expensive():
        return [
            RegexValidator("l_returnflag", r"^[ARN]$"),
            RegexValidator("l_linestatus", r"^[OF]$"),
            InSetValidator("l_returnflag", ["A", "R", "N"]),
            RangeValidator("l_quantity", 0, 2000),
            RangeValidator("l_extendedprice", 0, 1e8),
            NullValidator(),
        ]

    out = {"rows": n, "x100_dir": X100}

    def timed(label, fn, reps=2):
        best = None
        for _ in range(reps):
            t0 = time.time()
            fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        out[label] = round(best, 2)

    timed("cheap_audit_full", lambda: BatchExpressionExecutor(cheap).execute(new))
    timed(
        "expensive_audit_full",
        lambda: BatchExpressionExecutor(expensive()).execute(new),
    )
    timed(
        "delta_direct_cheap",
        lambda: delta_check(old, new, keys, cheap),
    )
    store = os.path.join(tempfile.gettempdir(), "spark_graft_fp_60m")
    t0 = time.time()
    write_fingerprints(old, store, keys)
    out["fp_write_once"] = round(time.time() - t0, 2)
    timed(
        "delta_stored_cheap",
        lambda: delta_check(None, new, keys, cheap, old_fingerprints=store),
    )
    timed(
        "delta_stored_expensive",
        lambda: delta_check(
            None, new, keys, expensive(), old_fingerprints=store
        ),
    )
    issues, stats = delta_check(None, new, keys, cheap, old_fingerprints=store)
    out["delta_rows"] = stats["row_count"]

    # --- r13: keys-bucketed store (+ key-bucketed NEW snapshot) --------
    # The bucket_by="keys" contract: the anti-join is equi-keyed on the
    # keys alone, so a new snapshot that is itself a key-bucketed table
    # (the ingest layout) joins the store co-located on BOTH sides.
    from truthound_spark.delta import write_fingerprints_table
    from truthound_spark.layout import write_bucketed

    loc = os.path.join(tempfile.gettempdir(), "spark_graft_fp60m_db")
    t0 = time.time()
    tbl_keys = write_fingerprints_table(
        old, "fp60m_keys", keys, database="truthound_fp60m",
        location=loc, bucket_by="keys",
    )
    out["fp_table_keys_write_once"] = round(time.time() - t0, 2)
    timed(
        "delta_stored_keys_raw_new",
        lambda: delta_check(None, new, keys, cheap, old_fingerprints=tbl_keys),
    )
    t0 = time.time()
    new_tbl = spark.table(
        write_bucketed(
            new, "lineitem60m_new", keys, database="truthound_fp60m",
            location=loc,
        )
    )
    out["new_bucketed_write_once"] = round(time.time() - t0, 2)
    timed(
        "delta_stored_keys_bucketed_new",
        lambda: delta_check(
            None, new_tbl, keys, cheap, old_fingerprints=tbl_keys
        ),
    )
    issues2, stats2 = delta_check(
        None, new_tbl, keys, cheap, old_fingerprints=tbl_keys
    )
    out["delta_rows_keys_bucketed"] = stats2["row_count"]
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
