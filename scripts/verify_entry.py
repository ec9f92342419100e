"""Local stand-in for the driver's t2 correctness gate.

Runs every entry in ``__spark_entry__.queries()`` at sf0.01, runs the
matching ``oracle_sql()`` in DuckDB over the same parquet tables, and
compares row count, column names, and (column-name-sorted, row-sorted)
values — mirroring the driver's row-count + schema + value-hash check.

Usage: python scripts/verify_entry.py [name_filter ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

SF_DIR = os.environ.get("SPARK_GRAFT_VERIFY_SF_DIR", "/root/testdata/sf0.01")


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 vs 0.0 and represent consistently
        if v == 0:
            return "0.0"
        return repr(float(v))
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return repr(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out), [cols[i] for i in order]


def main():
    filters = sys.argv[1:]
    import __spark_entry__ as entry

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("verify_entry")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for tb in TABLES:
        con.execute(
            f"CREATE VIEW {tb} AS SELECT * FROM '{SF_DIR}/{tb}.parquet'"
        )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    n_pass = n_fail = n_weak = 0
    failures = []
    for name, fn in qs.items():
        if filters and not any(f in name for f in filters):
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:
            n_fail += 1
            failures.append(name)
            print(f"FAIL  {name}: spark error: {type(exc).__name__}: {exc}")
            continue
        if name not in oracles:
            n_weak += 1
            print(f"weak  {name}: rows={len(srows)} (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as exc:
            n_fail += 1
            failures.append(name)
            print(f"FAIL  {name}: oracle error: {exc}")
            continue
        s_canon, s_cols = canon(srows, scols)
        o_canon, o_cols = canon(orows, ocols)
        if s_cols != o_cols:
            n_fail += 1
            failures.append(name)
            print(f"FAIL  {name}: schema mismatch spark={s_cols} oracle={o_cols}")
            continue
        if len(s_canon) != len(o_canon):
            n_fail += 1
            failures.append(name)
            print(
                f"FAIL  {name}: row count spark={len(s_canon)} oracle={len(o_canon)}"
            )
            continue
        if s_canon != o_canon:
            n_fail += 1
            failures.append(name)
            diffs = [
                (a, b) for a, b in zip(s_canon, o_canon) if a != b
            ][:3]
            print(f"FAIL  {name}: value mismatch; first diffs (spark vs oracle):")
            for a, b in diffs:
                print(f"      {a}")
                print(f"   != {b}")
            continue
        n_pass += 1
        print(f"PASS  {name}: rows={len(s_canon)} [{time.time()-t0:.1f}s]")

    print(
        f"\n== {n_pass} pass, {n_weak} weak (rows-only), {n_fail} fail"
        + (f": {failures}" if failures else "")
    )
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
