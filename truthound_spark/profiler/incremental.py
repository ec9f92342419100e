"""Incremental profiling via MERGEABLE partial profiles.

Reference: profiler/incremental.py:230-519 (IncrementalProfiler skips
unchanged columns via fingerprints, ProfileMerger combines partials) and
the sketch layer profiler/sketches/hyperloglog.py.

Spark-first inversion: instead of fingerprint-and-skip on one machine,
each snapshot/partition gets a PARTIAL PROFILE — a tiny per-column
relation of mergeable aggregates (count / non-null / sum / sum² /
min / max / Datasketches HLL binary via ``hll_sketch_agg``). Partials
persist as parquet; the current table profile is ONE aggregate over the
union of partials (``hll_union_agg`` merges distinct-count sketches
exactly the way sum merges counts). At 100 TB this is the only sane
shape: profiling a new daily partition costs one scan of THAT partition,
never a rescan of history, and the merge is O(snapshots × columns)
scalars + sketch unions.

Exactness contract (certified by the ``incremental_profile_merge_lineitem``
oracle slot): count / null-count / sum / min / max / mean / variance are
EXACT under merge (sum/sum² are algebraic); distinct counts are HLL
estimates flagged ``approx`` — same tradeoff the one-shot profiler makes
with ``approx=True``.
"""

from __future__ import annotations

import math
import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from truthound_spark.core.base import DATETIME_TYPES, NUMERIC_TYPES, STRING_TYPES
from truthound_spark.profiler.table_profiler import ColumnProfile, TableProfile

#: long-format partial schema — one row per (snapshot, column)
PARTIAL_SCHEMA = (
    "snapshot_id string, column string, dtype string, n long, nn long,"
    " sum double, sum2 double, min_v double, max_v double,"
    " min_s string, max_s string, len_sum long, len_min long, len_max long,"
    " hll binary"
)


def partial_profile(
    df: DataFrame, snapshot_id: str, columns: list[str] | None = None
) -> DataFrame:
    """ONE wide distributed aggregate → a per-column long relation of
    mergeable stats. The returned frame is O(columns) rows — save it as
    parquet next to the snapshot and never rescan the data."""
    fields = [f for f in df.schema.fields if columns is None or f.name in columns]
    aggs: list = [F.count(F.lit(1)).alias("__n")]
    for f_ in fields:
        c = f_.name
        aggs.append(F.count(F.col(c)).alias(f"{c}__nn"))
        aggs.append(F.hll_sketch_agg(F.col(c).cast("string")).alias(f"{c}__hll"))
        if isinstance(f_.dataType, NUMERIC_TYPES):
            dc = F.col(c).cast("double")
            aggs.extend(
                [
                    F.sum(dc).alias(f"{c}__sum"),
                    F.sum(dc * dc).alias(f"{c}__sum2"),
                    F.min(dc).alias(f"{c}__min"),
                    F.max(dc).alias(f"{c}__max"),
                ]
            )
        elif isinstance(f_.dataType, STRING_TYPES):
            ln = F.length(F.col(c))
            aggs.extend(
                [
                    F.min(F.col(c)).alias(f"{c}__mins"),
                    F.max(F.col(c)).alias(f"{c}__maxs"),
                    F.sum(ln.cast("long")).alias(f"{c}__lensum"),
                    F.min(ln).alias(f"{c}__lenmin"),
                    F.max(ln).alias(f"{c}__lenmax"),
                ]
            )
        elif isinstance(f_.dataType, DATETIME_TYPES):
            aggs.extend(
                [
                    F.min(F.col(c).cast("string")).alias(f"{c}__mins"),
                    F.max(F.col(c).cast("string")).alias(f"{c}__maxs"),
                ]
            )
    row = df.agg(*aggs).collect()[0].asDict()
    n = int(row["__n"])
    out_rows = []
    for f_ in fields:
        c = f_.name
        out_rows.append(
            (
                snapshot_id,
                c,
                f_.dataType.simpleString(),
                n,
                int(row.get(f"{c}__nn") or 0),
                float(row[f"{c}__sum"]) if row.get(f"{c}__sum") is not None else None,
                float(row[f"{c}__sum2"]) if row.get(f"{c}__sum2") is not None else None,
                float(row[f"{c}__min"]) if row.get(f"{c}__min") is not None else None,
                float(row[f"{c}__max"]) if row.get(f"{c}__max") is not None else None,
                row.get(f"{c}__mins"),
                row.get(f"{c}__maxs"),
                int(row[f"{c}__lensum"]) if row.get(f"{c}__lensum") is not None else None,
                int(row[f"{c}__lenmin"]) if row.get(f"{c}__lenmin") is not None else None,
                int(row[f"{c}__lenmax"]) if row.get(f"{c}__lenmax") is not None else None,
                bytes(row[f"{c}__hll"]) if row.get(f"{c}__hll") is not None else None,
            )
        )
    spark = df.sparkSession
    return spark.createDataFrame(out_rows, PARTIAL_SCHEMA)


def merged_stats(partials: DataFrame) -> DataFrame:
    """Merge a union of partial relations into one row per column —
    algebraic sums/extremes + ``hll_union_agg`` for distincts. This is a
    DataFrame-in/DataFrame-out operator so the merge itself distributes
    (relevant when 'columns' means thousands and snapshots means years)."""
    return (
        partials.groupBy("column")
        .agg(
            F.max("dtype").alias("dtype"),
            F.sum("n").cast("long").alias("n"),
            F.sum("nn").cast("long").alias("nn"),
            F.sum("sum").alias("sum"),
            F.sum("sum2").alias("sum2"),
            F.min("min_v").alias("min_v"),
            F.max("max_v").alias("max_v"),
            F.min("min_s").alias("min_s"),
            F.max("max_s").alias("max_s"),
            F.sum("len_sum").cast("long").alias("len_sum"),
            F.min("len_min").alias("len_min"),
            F.max("len_max").alias("len_max"),
            F.hll_sketch_estimate(F.hll_union_agg("hll")).alias("distinct_est"),
            # a partial carries exactly ONE row per (snapshot, column), so
            # count == distinct snapshots — count_distinct(snapshot_id)
            # would force a second (column, snapshot)-keyed Exchange
            F.count(F.lit(1)).cast("long").alias("n_snapshots"),
        )
    )


def merge_partials(partials: DataFrame) -> TableProfile:
    """Union-of-partials → TableProfile (reference ProfileMerger
    :466-517). Exact for count/null/sum/mean/std/min/max; distinct via
    HLL union estimate.

    ``row_count`` is the MAX of the per-column summed ``n`` values: when
    every partial covered the same column set these are all equal, but
    if snapshots profiled different column subsets (partial_profile's
    ``columns`` param) a column missing from some snapshots undercounts —
    max is the per-column n that saw the most snapshots, not whichever
    column happened to iterate last. Per-column null ratios stay against
    that column's OWN n (rows the column was actually profiled over)."""
    prof = TableProfile()
    rows = merged_stats(partials).collect()
    for r in rows:
        n, nn = int(r["n"]), int(r["nn"])
        mean = std = None
        if r["sum"] is not None and nn > 0:
            mean = r["sum"] / nn
            if nn > 1 and r["sum2"] is not None:
                var = max(0.0, (r["sum2"] - r["sum"] * r["sum"] / nn) / (nn - 1))
                std = math.sqrt(var)
        nu = int(r["distinct_est"] or 0)
        cp = ColumnProfile(
            name=r["column"],
            dtype=r["dtype"],
            null_count=n - nn,
            null_ratio=round((n - nn) / n, 6) if n else 0.0,
            distinct_count=nu,
            unique_ratio=round(nu / nn, 6) if nn else 0.0,
            min=r["min_v"] if r["min_v"] is not None else r["min_s"],
            max=r["max_v"] if r["max_v"] is not None else r["max_s"],
            mean=mean,
            std=std,
            min_length=r["len_min"],
            max_length=r["len_max"],
            avg_length=(r["len_sum"] / nn) if r["len_sum"] is not None and nn else None,
        )
        prof.columns[cp.name] = cp
        prof.row_count = max(prof.row_count, n)
    prof.column_count = len(prof.columns)
    return prof


class IncrementalProfiler:
    """Snapshot-oriented incremental profiling (reference
    IncrementalProfiler :230-464, re-keyed from column fingerprints to
    snapshot partials). Partials persist under ``root`` as parquet; a
    re-profiled snapshot_id REPLACES its previous partial (idempotent
    backfills)."""

    def __init__(self, root: str) -> None:
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _path(self, snapshot_id: str) -> str:
        return os.path.join(self.root, f"partial-{snapshot_id}.parquet")

    def profile_snapshot(
        self, df: DataFrame, snapshot_id: str, columns: list[str] | None = None
    ) -> DataFrame:
        part = partial_profile(df, snapshot_id, columns)
        part.write.mode("overwrite").parquet(self._path(snapshot_id))
        return part

    def snapshots(self) -> list[str]:
        return sorted(
            f[len("partial-") : -len(".parquet")]
            for f in os.listdir(self.root)
            if f.startswith("partial-") and f.endswith(".parquet")
        )

    def load_partials(self, spark: SparkSession) -> DataFrame:
        snaps = self.snapshots()
        if not snaps:
            raise ValueError(f"no partial profiles under {self.root}")
        return spark.read.parquet(*[self._path(s) for s in snaps])

    def current_profile(self, spark: SparkSession) -> TableProfile:
        return merge_partials(self.load_partials(spark))

    def remove_snapshot(self, snapshot_id: str) -> None:
        """Drop one snapshot's contribution (data retention / backfill
        corrections) — possible BECAUSE partials are kept per snapshot;
        a single merged sketch could never subtract."""
        import shutil

        path = self._path(snapshot_id)
        if os.path.isdir(path):
            shutil.rmtree(path)


def validate_merge(
    partials: DataFrame,
    full_df: DataFrame,
    rel_tol: float = 1e-9,
    hll_tol: float = 0.05,
) -> dict[str, Any]:
    """Merge-correctness self-check (reference profiler/
    incremental_validation.py — profile-merge correctness validation):
    re-aggregates the FULL data once and compares every exact-mergeable
    stat of the merged partials against it; distinct counts compare at
    the HLL tolerance. Returns {column: {stat: ok}} plus an overall
    ``passed`` flag — run it after a backfill or retention change to
    prove the partial set still reconstructs the truth."""
    merged = merge_partials(partials)
    cols = [c for c in merged.columns if c in full_df.columns]
    aggs: list = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"{c}__nn"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"{c}__nu"))
        if isinstance(full_df.schema[c].dataType, NUMERIC_TYPES):
            dc = F.col(c).cast("double")
            aggs.extend(
                [
                    F.min(dc).alias(f"{c}__min"),
                    F.max(dc).alias(f"{c}__max"),
                    F.avg(dc).alias(f"{c}__mean"),
                    F.stddev(dc).alias(f"{c}__std"),
                ]
            )
    row = full_df.agg(*aggs).collect()[0].asDict()

    def _close(a, b, tol):
        if a is None or b is None:
            return a is None and b is None
        if b == 0:
            return abs(a) <= tol
        return abs(a - b) <= tol * abs(b)

    report: dict[str, Any] = {"passed": True, "columns": {}}
    n = int(row["__n"])
    if merged.row_count != n:
        report["passed"] = False
    report["row_count_ok"] = merged.row_count == n
    for c in cols:
        cp = merged.columns[c]
        nn = int(row.get(f"{c}__nn") or 0)
        checks = {
            "null_count": cp.null_count == n - nn,
            "distinct_within_tol": _close(
                float(cp.distinct_count), float(row.get(f"{c}__nu") or 0), hll_tol
            ),
        }
        if row.get(f"{c}__min") is not None:
            checks["min"] = _close(float(cp.min), float(row[f"{c}__min"]), rel_tol)
            checks["max"] = _close(float(cp.max), float(row[f"{c}__max"]), rel_tol)
            checks["mean"] = _close(cp.mean, float(row[f"{c}__mean"]), rel_tol)
            if cp.std is not None and row.get(f"{c}__std") is not None:
                checks["std"] = _close(cp.std, float(row[f"{c}__std"]), 1e-6)
        report["columns"][c] = checks
        if not all(checks.values()):
            report["passed"] = False
    return report


def foreach_batch_profiler(
    profiler: "IncrementalProfiler", columns: list[str] | None = None
):
    """Structured-Streaming glue (reference realtime/incremental.py:322
    IncrementalValidator's running column stats + checkpointed state):
    a ``foreachBatch`` sink that partial-profiles each micro-batch into
    the profiler's store — ``current_profile()`` is then the exact
    running profile of everything the stream has seen.

    State story: the partials ARE the state (one tiny parquet per
    batch), so restart recovery is free — Structured Streaming's own
    checkpoint guarantees each batch id lands exactly once, and
    re-processed batch ids OVERWRITE their partial (idempotent), which
    is the reference CheckpointManager.restore contract without a
    separate state snapshot format."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        profiler.profile_snapshot(batch_df, f"batch-{batch_id:012d}", columns)

    return sink
