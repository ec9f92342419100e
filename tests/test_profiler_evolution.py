"""Profiler evolution (comparison/rename/trends) + incremental
mergeable partial profiles (reference profiler/comparison.py,
profiler/evolution/*, profiler/incremental.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from truthound_spark.profiler.evolution import (
    DriftThresholds,
    ProfileEvolution,
    compare_profiles,
)
from truthound_spark.profiler.incremental import (
    IncrementalProfiler,
    merge_partials,
    partial_profile,
)
from truthound_spark.profiler.table_profiler import profile


@pytest.fixture(scope="module")
def li(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/lineitem.parquet").cache()


# ---------------------------------------------------------------------------
# comparison / evolution
# ---------------------------------------------------------------------------


def _mk(spark, n, mean, null_every=0, extra_col=False, rename=False):
    import random

    rng = random.Random(3)
    rows = []
    for i in range(n):
        amount = None if null_every and i % null_every == 0 else float(rng.gauss(mean, 5))
        base = [i, amount, f"tag{i % 7}"]
        if extra_col:
            base.append(i % 3)
        rows.append(tuple(base))
    schema = "id long, amount double, " + ("label string" if rename else "tag string")
    if extra_col:
        schema += ", grp long"
    return spark.createDataFrame(rows, schema)


def test_compare_no_drift(spark):
    a = profile(_mk(spark, 1000, 100), with_duplicates=False)
    b = profile(_mk(spark, 1000, 100), with_duplicates=False)
    cmp = compare_profiles(a, b)
    assert not cmp.has_drift and not cmp.has_schema_changes and not cmp.breaking


def test_compare_detects_mean_null_rowcount(spark):
    a = profile(_mk(spark, 1000, 100), with_duplicates=False)
    b = profile(_mk(spark, 2000, 160, null_every=5), with_duplicates=False)
    cmp = compare_profiles(a, b)
    types = {d.drift_type for d in cmp.drifts}
    assert {"row_count", "mean", "null_ratio"} <= types
    mean_drift = cmp.get_by_type("mean")[0]
    assert mean_drift.severity == "critical"  # 60/5 = 12σ > 3×gate
    assert "mean" in cmp.to_report()


def test_compare_schema_changes_and_rename(spark):
    a = profile(_mk(spark, 1000, 100), with_duplicates=False)
    b = profile(_mk(spark, 1000, 100, extra_col=True, rename=True), with_duplicates=False)
    cmp = compare_profiles(a, b)
    # 'tag' -> 'label' has identical stats → rename, not remove+add
    assert cmp.renamed_columns == {"tag": "label"}
    assert cmp.added_columns == ["grp"]
    assert not cmp.removed_columns
    assert not cmp.breaking  # adds + renames are non-breaking


def test_compare_type_change_is_breaking(spark):
    a = profile(spark.createDataFrame([(1, 1)], "id long, v long"), with_duplicates=False)
    b = profile(spark.createDataFrame([(1, "x")], "id long, v string"), with_duplicates=False)
    cmp = compare_profiles(a, b)
    assert cmp.type_changes == {"v": ("bigint", "string")}
    assert cmp.breaking


def test_thresholds_presets_order():
    s, d, l = DriftThresholds.strict(), DriftThresholds(), DriftThresholds.loose()
    assert s.mean_sigmas < d.mean_sigmas < l.mean_sigmas
    assert s.null_ratio_abs < d.null_ratio_abs < l.null_ratio_abs


def test_evolution_trend_and_anomaly_gate(spark):
    evo = ProfileEvolution()
    for i, mean in enumerate((100, 102, 104)):
        cmp = evo.add(profile(_mk(spark, 1000, mean), with_duplicates=False))
        assert (cmp is None) == (i == 0)
    tr = evo.trend("amount", "mean")
    assert tr.direction == "increasing"
    assert tr.slope == pytest.approx(2.0, abs=0.5)

    drifted = profile(_mk(spark, 1000, 170), with_duplicates=False)
    alerts = evo.detect_anomalies(drifted)
    assert any(a.drift_type == "mean" and a.column == "amount" for a in alerts)
    clean = profile(_mk(spark, 1000, 102), with_duplicates=False)
    assert not [a for a in evo.detect_anomalies(clean) if a.drift_type == "mean"]


# ---------------------------------------------------------------------------
# incremental partial profiles
# ---------------------------------------------------------------------------


def test_partial_merge_matches_full_profile(spark, li):
    """Exact-mergeable stats (count/null/min/max/mean/std) from 3 merged
    partials must equal the one-shot profile of the whole table."""
    cols = ["l_quantity", "l_extendedprice", "l_returnflag"]
    parts = [
        partial_profile(li.filter(F.col("l_orderkey") % 3 == i), f"s{i}", cols)
        for i in range(3)
    ]
    merged = merge_partials(parts[0].unionByName(parts[1]).unionByName(parts[2]))
    full = profile(li.select(*cols), with_duplicates=False)

    assert merged.row_count == full.row_count
    for c in ("l_quantity", "l_extendedprice"):
        m, f_ = merged.columns[c], full.columns[c]
        assert m.null_count == f_.null_count
        assert float(m.min) == pytest.approx(float(f_.min))
        assert float(m.max) == pytest.approx(float(f_.max))
        assert m.mean == pytest.approx(f_.mean, rel=1e-9)
        assert m.std == pytest.approx(f_.std, rel=1e-6)
        # HLL estimate within 5% of exact
        assert m.distinct_count == pytest.approx(f_.distinct_count, rel=0.05)
    s = merged.columns["l_returnflag"]
    fs = full.columns["l_returnflag"]
    assert (s.min_length, s.max_length) == (fs.min_length, fs.max_length)
    assert s.avg_length == pytest.approx(fs.avg_length, rel=1e-9)


def test_merge_partials_mixed_column_subsets_row_count(spark, li):
    """ADVICE r7: partials profiling DIFFERENT column subsets — row_count
    must be the max per-column n (the column present in every snapshot),
    not whichever column iterated last; per-column null ratios stay
    against that column's own n."""
    full = partial_profile(li, "s0", ["l_quantity", "l_returnflag"])
    half = partial_profile(
        li.filter(F.col("l_orderkey") % 2 == 0), "s1", ["l_quantity"]
    )
    merged = merge_partials(full.unionByName(half))
    n_all = li.count()
    n_half = li.filter(F.col("l_orderkey") % 2 == 0).count()
    assert merged.row_count == n_all + n_half  # l_quantity saw both snapshots
    # l_returnflag's ratio is against its own n (one snapshot), not row_count
    assert merged.columns["l_returnflag"].null_ratio == pytest.approx(
        li.filter(F.col("l_returnflag").isNull()).count() / n_all
    )


def test_incremental_profiler_snapshots(spark, li, tmp_path):
    prof = IncrementalProfiler(root=str(tmp_path / "partials"))
    for i in range(3):
        prof.profile_snapshot(
            li.filter(F.col("l_orderkey") % 3 == i), f"day{i}", ["l_quantity"]
        )
    assert prof.snapshots() == ["day0", "day1", "day2"]
    merged = prof.current_profile(spark)
    assert merged.row_count == li.count()

    # idempotent re-profile of one snapshot (backfill correction)
    prof.profile_snapshot(li.filter(F.col("l_orderkey") % 3 == 1), "day1", ["l_quantity"])
    assert merged.row_count == prof.current_profile(spark).row_count

    # retention: dropping a snapshot subtracts its contribution
    prof.remove_snapshot("day2")
    remaining = prof.current_profile(spark)
    expect = li.filter(F.col("l_orderkey") % 3 != 2).count()
    assert remaining.row_count == expect


def test_incremental_profile_feeds_history_learner(spark, li, tmp_path):
    """Partial profiles + HistoryThresholdLearner: merged per-snapshot
    profiles are valid learner inputs (the production loop: daily
    partial → daily merged profile → learned thresholds)."""
    from truthound_spark.ml import HistoryThresholdLearner

    prof = IncrementalProfiler(root=str(tmp_path / "p2"))
    history = []
    for i in range(3):
        part = prof.profile_snapshot(
            li.filter(F.col("l_orderkey") % 3 == i), f"d{i}", ["l_quantity"]
        )
        history.append(merge_partials(part))
    tt = HistoryThresholdLearner().learn(history)
    th = tt.get_column("l_quantity")
    assert th.min_value is not None and th.mean_min is not None


def test_validate_merge_self_check(spark, li, tmp_path):
    from truthound_spark.profiler.incremental import validate_merge

    cols = ["l_quantity"]
    parts = [
        partial_profile(li.filter(F.col("l_orderkey") % 2 == i), f"s{i}", cols)
        for i in range(2)
    ]
    union = parts[0].unionByName(parts[1])
    rep = validate_merge(union, li.select(*cols))
    assert rep["passed"] and rep["row_count_ok"]
    assert all(all(c.values()) for c in rep["columns"].values())

    # a corrupted partial set (one half missing) must FAIL the check
    rep_bad = validate_merge(parts[0], li.select(*cols))
    assert not rep_bad["passed"]


def test_streaming_incremental_profile(spark, tmp_path):
    """File stream → foreach_batch_profiler → running profile equals the
    batch profile of all data seen; restart replay stays idempotent."""
    import json as _json
    import os

    from truthound_spark.profiler.incremental import (
        IncrementalProfiler,
        foreach_batch_profiler,
    )
    from truthound_spark.streaming.sources import read_file_stream

    src = str(tmp_path / "in")
    os.makedirs(src)
    for b in range(2):
        with open(os.path.join(src, f"b{b}.jsonl"), "w") as f:
            for i in range(300):
                f.write(_json.dumps({"v": float(b * 1000 + i)}) + "\n")

    prof = IncrementalProfiler(root=str(tmp_path / "state"))
    stream = read_file_stream(spark, src, "v double", format="json", max_files_per_trigger=1)
    q = (
        stream.writeStream.foreachBatch(foreach_batch_profiler(prof, ["v"]))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    cur = prof.current_profile(spark)
    assert cur.row_count == 600
    assert float(cur.columns["v"].min) == 0.0
    assert float(cur.columns["v"].max) == 1299.0
    assert cur.columns["v"].mean == pytest.approx((sum(range(300)) + sum(range(1000, 1300))) / 600)
