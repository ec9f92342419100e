"""psi_grouped: per-segment drift in constant passes."""

from __future__ import annotations

from pyspark.sql import functions as F

from truthound_spark.drift.detectors import psi, psi_grouped


def test_psi_grouped_matches_per_group_psi(spark):
    rows = []
    for i in range(600):
        g = ["a", "b", "c"][i % 3]
        side = i % 2  # 0 = baseline, 1 = current
        v = float((i // 6) % 50)  # independent of side within each group
        if g == "b" and side == 1:
            v += 40.0  # b drifts hard in the current half
        rows.append((i, g, v, side))
    df = spark.createDataFrame(rows, "id long, g string, v double, side int")
    base, cur = df.filter("side = 0"), df.filter("side = 1")

    grouped = {r["group"]: r for r in psi_grouped(base, cur, "v", "g").collect()}
    for g in ("a", "b", "c"):
        single = psi(base.filter(F.col("g") == g), cur.filter(F.col("g") == g), "v")
        assert grouped[g]["psi"] == round(single.statistic, 6), g
        assert grouped[g]["drifted"] == single.drifted
    assert grouped["b"]["drifted"] and not grouped["a"]["drifted"]


def test_psi_grouped_segment_membership_edges(spark):
    base = spark.createDataFrame(
        [(i, "old", float(i)) for i in range(50)], "id long, g string, v double"
    )
    cur = spark.createDataFrame(
        [(i, "new", float(i)) for i in range(50)]
        + [(100 + i, "old", float(i) + 100.0) for i in range(50)],
        "id long, g string, v double",
    )
    out = {r["group"]: r for r in psi_grouped(base, cur, "v", "g").collect()}
    # brand-new segment: no baseline edges → NULL psi, not invented bins
    assert out["new"]["psi"] is None and out["new"]["drifted"] is None
    # fully shifted segment clamps into the top bin → massive psi
    assert out["old"]["psi"] > 1.0 and out["old"]["drifted"]


def test_psi_grouped_disappeared_segment_is_maximal_drift(spark):
    base = spark.createDataFrame(
        [(i, "gone" if i < 50 else "stays", float(i % 10)) for i in range(100)],
        "id long, g string, v double",
    )
    cur = spark.createDataFrame(
        [(i, "stays", float(i % 10)) for i in range(50)], "id long, g string, v double"
    )
    out = {r["group"]: r for r in psi_grouped(base, cur, "v", "g").collect()}
    assert out["gone"]["drifted"]  # all-zero current side → loud signal
    assert not out["stays"]["drifted"]


def test_mean_variance_drift_grouped_gates_and_membership(spark):
    from truthound_spark.drift.detectors import mean_variance_drift_grouped

    base = spark.createDataFrame(
        [(i, "stable", float(i % 10)) for i in range(100)]
        + [(i, "shifts", float(i % 10)) for i in range(100, 200)]
        + [(i, "gone", 1.0) for i in range(200, 220)],
        "id long, g string, v double",
    )
    cur = spark.createDataFrame(
        [(i, "stable", float(i % 10)) for i in range(100)]
        + [(i, "shifts", float(i % 10) + 5.0) for i in range(100)]
        + [(i, "new", 2.0) for i in range(50)],
        "id long, g string, v double",
    )
    out = {r["group"]: r for r in mean_variance_drift_grouped(base, cur, "v", "g").collect()}
    assert not out["stable"]["drifted"]
    assert out["shifts"]["drifted"] and out["shifts"]["mean_shift"] > 1.0
    # one-sided segments: NULL shifts, NULL verdict — never invented
    assert out["gone"]["mean_shift"] is None and out["gone"]["drifted"] is None
    assert out["new"]["n_base"] == 0 and out["new"]["drifted"] is None


def test_mean_variance_drift_grouped_partitioning_invariant(spark):
    from truthound_spark.drift.detectors import mean_variance_drift_grouped

    rows = [(i, f"g{i % 3}", float((i * 7) % 23)) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, g string, v double")
    a = mean_variance_drift_grouped(
        df.filter("id % 2 = 0").repartition(1), df.filter("id % 2 = 1").repartition(1), "v", "g"
    ).collect()
    b = mean_variance_drift_grouped(
        df.filter("id % 2 = 0").repartition(13), df.filter("id % 2 = 1").repartition(13), "v", "g"
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
