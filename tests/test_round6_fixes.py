"""Round-6 fixes (VERDICT r5 items 1-3 + ADVICE r5 lows).

Covers: distributed timeseries lag windows (no single-partition funnel),
chi-square category cap, KS sketch-by-default threshold, blocklist NULL
coalesce, empty-queries early return in pq/ivfpq search.
"""

from __future__ import annotations

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F


def _events(spark, n=400, seed=7, shuffle_parts=16):
    """A deliberately multi-partition, shuffled event series with known
    lag-violation counts computed in plain Python."""
    rng = random.Random(seed)
    base = dt.datetime(2024, 1, 1)
    rows = []
    t = 0.0
    for i in range(n):
        t += rng.choice([60.0, 60.0, 60.0, 1200.0])  # some gaps > 900s
        v = i + (-5 if i % 37 == 0 else 0)  # some monotonic dips
        rows.append((i, base + dt.timedelta(seconds=t), float(v)))
    df = spark.createDataFrame(rows, ["seq", "ts", "value"]).repartition(shuffle_parts)
    return rows, df


def _py_counts(rows):
    srt = sorted(rows, key=lambda r: r[1])
    gaps = irregular = dips = order_viol = 0
    for a, b in zip(srt, srt[1:]):
        d = (b[1] - a[1]).total_seconds()
        if d > 900:
            gaps += 1
        if abs(d - 60.0) > 30.0:
            irregular += 1
        if b[2] < a[2]:
            dips += 1
    by_seq = sorted(rows, key=lambda r: r[0])
    for a, b in zip(by_seq, by_seq[1:]):
        if a[1] > b[1]:
            order_viol += 1
    return gaps, irregular, dips, order_viol


def test_timeseries_lag_validators_distributed(spark):
    from truthound_spark.validators.timeseries import (
        TimeSeriesGapValidator,
        TimeSeriesIntervalValidator,
        TimeSeriesMonotonicValidator,
        TimeSeriesOrderValidator,
    )

    rows, df = _events(spark)
    gaps, irregular, dips, order_viol = _py_counts(rows)
    assert gaps > 0 and irregular > 0 and dips > 0

    g = TimeSeriesGapValidator("ts", max_gap_seconds=900).validate(df)
    assert (g[0].count if g else 0) == gaps

    iv = TimeSeriesIntervalValidator(
        "ts", interval_seconds=60.0, tolerance_seconds=30.0
    ).validate(df)
    assert (iv[0].count if iv else 0) == irregular

    m = TimeSeriesMonotonicValidator("value", "ts").validate(df)
    assert (m[0].count if m else 0) == dips

    o = TimeSeriesOrderValidator("ts", order_by="seq").validate(df)
    assert (o[0].count if o else 0) == order_viol


def test_timeseries_lag_plan_no_single_partition(spark):
    from truthound_spark.validators.timeseries import _per_partition_lag_frame

    _, df = _events(spark, n=200)
    per_part = _per_partition_lag_frame(
        df, ["ts"], F.col("value"), lambda cur, prev: cur < prev, num_partitions=8
    )
    plan = per_part._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_timeseries_boundary_violations_counted(spark):
    """A violation that falls exactly on a range-partition boundary must
    still be counted (boundary-stitch path)."""
    from truthound_spark.validators.timeseries import TimeSeriesMonotonicValidator

    base = dt.datetime(2024, 1, 1)
    # strictly increasing timestamps, value dips once at every position
    rows = [
        (i, base + dt.timedelta(seconds=60 * i), float(-i))  # globally decreasing
        for i in range(64)
    ]
    df = spark.createDataFrame(rows, ["seq", "ts", "value"]).repartition(8)
    out = TimeSeriesMonotonicValidator(
        "value", "ts", direction="increasing"
    ).validate(df)
    assert out and out[0].count == 63  # every consecutive pair violates


def test_seasonal_decomposition_distributed_matches_reference_shape(spark):
    """Global path (no series key): distributed seq + explode trend must
    reproduce the classic window-decomposition residual ratio."""
    import math

    from truthound_spark.validators.timeseries import SeasonalDecompositionValidator

    base = dt.datetime(2024, 1, 1)
    period = 7
    n = 210
    rows = [
        (
            base + dt.timedelta(days=i),
            10.0 + 0.1 * i + 5.0 * math.sin(2 * math.pi * (i % period) / period),
        )
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, ["ts", "value"]).repartition(16)
    out = SeasonalDecompositionValidator(
        "value", "ts", period=period, max_residual_variance_ratio=0.2
    ).validate(df)
    # trend+seasonal explain nearly everything → no issue
    assert out == []

    noise = random.Random(3)
    noisy = [(t, v + noise.gauss(0, 50.0)) for t, v in rows]
    dfn = spark.createDataFrame(noisy, ["ts", "value"]).repartition(16)
    out = SeasonalDecompositionValidator(
        "value", "ts", period=period, max_residual_variance_ratio=0.2
    ).validate(dfn)
    assert out and out[0].issue_type == "decomposition_poor_fit"


def test_chi_square_cap_identical_below_and_bounded_above(spark):
    from truthound_spark.drift.detectors import chi_square_drift

    b = spark.range(0, 5000).select((F.col("id") % 7).cast("string").alias("cat"))
    c = spark.range(0, 5000).select((F.col("id") % 5).cast("string").alias("cat"))
    uncapped = chi_square_drift(b, c, "cat", max_categories=1000)
    capped_noop = chi_square_drift(b, c, "cat", max_categories=7)
    assert abs(uncapped.statistic - capped_noop.statistic) < 1e-12
    assert not uncapped.details["capped"] and not capped_noop.details["capped"]

    # high-cardinality column mistyped as categorical: cap engages,
    # bounded driver collection, still detects the shifted head
    bh = spark.range(0, 30000).select(
        F.when(F.col("id") < 10000, F.lit("headA")).otherwise(F.col("id").cast("string")).alias("cat")
    )
    ch = spark.range(30000, 60000).select(
        F.when(F.col("id") < 40000, F.lit("headB")).otherwise(F.col("id").cast("string")).alias("cat")
    )
    r = chi_square_drift(bh, ch, "cat", max_categories=500)
    assert r.details["capped"] and r.drifted
    assert r.details["dof"] == 500  # 500 top cats + 1 other bucket - 1


def test_ks_auto_sketch_threshold(spark, monkeypatch):
    from truthound_spark.drift import detectors
    from truthound_spark.drift.validators import KSDriftValidator

    seen = {}
    real = detectors.ks_test

    def spy(baseline, current, column, **kw):
        seen.update(kw)
        return real(baseline, current, column, **kw)

    monkeypatch.setitem(detectors._METHODS, "ks", spy)
    b = spark.range(0, 2000).select(F.col("id").cast("double").alias("v"))
    c = spark.range(0, 2000).select((F.col("id") * 1.5).cast("double").alias("v"))

    KSDriftValidator(b, columns=["v"], auto_sketch_rows=500).validate(c)
    assert seen.get("grid") == KSDriftValidator.AUTO_GRID  # sketch engaged

    seen.clear()
    KSDriftValidator(b, columns=["v"], auto_sketch_rows=10_000).validate(c)
    assert "grid" not in seen  # small data stays exact

    seen.clear()
    KSDriftValidator(b, columns=["v"], auto_sketch_rows=500, grid=0).validate(c)
    assert seen.get("grid") == 0  # explicit grid always wins


def test_blocklist_filter_null_text(spark):
    from truthound_spark.pipeline.text import blocklist_filter

    df = spark.createDataFrame(
        [(1, "clean words here"), (2, "the spam term"), (3, None)],
        ["doc_id", "text"],
    )
    for mode in ("word", "phrase"):
        out = {
            r["id"]: r
            for r in blocklist_filter(df, ["spam"], mode=mode).collect()
        }
        assert out[3]["matched_terms"] == []
        assert out[3]["n_matched"] == 0 and out[3]["blocked"] is False
        assert out[2]["blocked"] is True and out[1]["blocked"] is False


def test_pq_ivfpq_search_empty_queries(spark):
    from truthound_spark.pipeline.similarity import ivfpq_search, pq_search, pq_train

    rng = random.Random(11)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(64)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    empty = spark.createDataFrame([], "query_id long, embedding array<double>")

    codebooks = pq_train(df, m=2, k=4)
    out = pq_search(df, empty, codebooks, k=3)
    assert out.columns == ["query_id", "id", "adc_dist", "rank"]
    assert out.count() == 0

    out2 = ivfpq_search(df, empty, k=3, num_cells=4, nprobe=2, m=2, pq_k=4)
    assert out2.columns == ["query_id", "id", "adc_dist", "rank"]
    assert out2.count() == 0

    out3 = ivfpq_search(df, empty, k=3, num_cells=4, nprobe=2, m=2, pq_k=4, residual=True)
    assert out3.count() == 0


def test_curriculum_order_unbounded_score_coarsens(spark):
    from truthound_spark.pipeline.export import curriculum_order

    rng = random.Random(5)
    rows = [(i, rng.uniform(0, 1e9)) for i in range(500)]  # perplexity-like
    df = spark.createDataFrame(rows, ["doc_id", "score"])
    out = curriculum_order(df, "score", n_bands=4, n_shards=2, max_hist_rows=10_000)
    got = {r["id"]: r["band"] for r in out.collect()}
    assert len(got) == 500
    # band 0 = highest scores: check quantile ordering survives coarsening
    srt = sorted(rows, key=lambda r: -r[1])
    top, bottom = srt[:50], srt[-50:]
    assert all(got[i] == 0 for i, _ in top)
    assert all(got[i] == 3 for i, _ in bottom)


def test_seasonal_decomposition_series_key(spark):
    import math

    from truthound_spark.validators.timeseries import SeasonalDecompositionValidator

    base = dt.datetime(2024, 1, 1)
    period = 7
    rows = []
    for key in ("a", "b", "c"):
        off = {"a": 0.0, "b": 100.0, "c": -50.0}[key]
        for i in range(140):
            rows.append(
                (
                    key,
                    base + dt.timedelta(days=i),
                    off + 0.2 * i + 3.0 * math.sin(2 * math.pi * (i % period) / period),
                )
            )
    df = spark.createDataFrame(rows, ["series", "ts", "value"]).repartition(16)
    out = SeasonalDecompositionValidator(
        "value", "ts", period=period, max_residual_variance_ratio=0.2, series_key="series"
    ).validate(df)
    assert out == []
