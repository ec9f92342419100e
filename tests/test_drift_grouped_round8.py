"""js_grouped / ks_grouped: per-segment two-sample drift, one pass for
any number of segments, per-group values pinned to the ungrouped
detectors (drift/detectors.py; reference drift/statistical.py looped
per segment)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from truthound_spark.drift.detectors import js_divergence, js_grouped, ks_grouped, ks_test


def _mk(spark):
    rows = []
    for i in range(600):
        g = ["a", "b", "c"][i % 3]
        side = i % 2
        v = float((i // 6) % 50)
        if g == "b" and side == 1:
            v += 40.0  # segment b drifts hard
        rows.append((i, g, v, side))
    df = spark.createDataFrame(rows, "id long, g string, v double, side int")
    return df.filter("side = 0"), df.filter("side = 1")


def test_js_grouped_matches_per_group_js(spark):
    base, cur = _mk(spark)
    grouped = {r["group"]: r for r in js_grouped(base, cur, "v", "g").collect()}
    for g in ("a", "b", "c"):
        single = js_divergence(
            base.filter(F.col("g") == g), cur.filter(F.col("g") == g), "v"
        )
        assert grouped[g]["js"] == round(single.statistic, 6), g
        assert grouped[g]["drifted"] == single.drifted
    assert grouped["b"]["drifted"] and not grouped["a"]["drifted"]


def test_ks_grouped_matches_per_group_exact_ks(spark):
    base, cur = _mk(spark)
    grouped = {r["group"]: r for r in ks_grouped(base, cur, "v", "g").collect()}
    for g in ("a", "b", "c"):
        single = ks_test(
            base.filter(F.col("g") == g), cur.filter(F.col("g") == g), "v"
        )
        assert grouped[g]["ks"] == round(single.statistic, 6), g
        assert grouped[g]["crit"] == round(single.threshold, 6), g
        assert grouped[g]["drifted"] == single.drifted
        assert grouped[g]["n_base"] == single.details["n_baseline"]
    assert grouped["b"]["drifted"] and not grouped["a"]["drifted"]


def test_js_grouped_membership_edges(spark):
    base = spark.createDataFrame(
        [(i, "old", float(i % 10)) for i in range(50)], "id long, g string, v double"
    )
    cur = spark.createDataFrame(
        [(i, "new", float(i % 10)) for i in range(50)]
        + [(100 + i, "old", float(i % 10) + 100.0) for i in range(50)],
        "id long, g string, v double",
    )
    out = {r["group"]: r for r in js_grouped(base, cur, "v", "g").collect()}
    assert out["new"]["js"] is None and out["new"]["drifted"] is None
    assert out["old"]["js"] > 0.3 and out["old"]["drifted"]
    # disappeared segment → all-zero current → near-ln2 divergence, loud
    base2 = base.withColumn("g", F.lit("gone"))
    out2 = {r["group"]: r for r in js_grouped(base2, cur, "v", "g").collect()}
    assert out2["gone"]["drifted"]


def test_ks_grouped_one_sided_segments_are_null(spark):
    base = spark.createDataFrame(
        [(i, "only_base", float(i)) for i in range(30)]
        + [(50 + i, "both", float(i)) for i in range(30)],
        "id long, g string, v double",
    )
    cur = spark.createDataFrame(
        [(i, "only_cur", float(i)) for i in range(30)]
        + [(50 + i, "both", float(i)) for i in range(30)],
        "id long, g string, v double",
    )
    out = {r["group"]: r for r in ks_grouped(base, cur, "v", "g").collect()}
    assert out["only_base"]["ks"] is None and out["only_base"]["drifted"] is None
    assert out["only_cur"]["ks"] is None
    assert out["both"]["ks"] == 0.0 and not out["both"]["drifted"]


def test_ks_grouped_window_is_partitioned_by_group(spark):
    """Plan check: the cumulative window must carry a partition spec —
    never a global single-partition Window.orderBy."""
    base, cur = _mk(spark)
    plan = (
        ks_grouped(base, cur, "v", "g")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    for m in re.finditer(r"Window \[(.*?)\], \[(.*?)\], \[(.*?)\]", plan):
        assert "group" in m.group(2), plan[:2000]


def test_wasserstein_grouped_matches_per_group(spark):
    from truthound_spark.drift.detectors import wasserstein, wasserstein_grouped

    base, cur = _mk(spark)
    grouped = {
        r["group"]: r for r in wasserstein_grouped(base, cur, "v", "g").collect()
    }
    for g in ("a", "b", "c"):
        single = wasserstein(
            base.filter(F.col("g") == g), cur.filter(F.col("g") == g), "v"
        )
        assert grouped[g]["emd"] == round(single.statistic, 6), g
        assert grouped[g]["threshold"] == round(single.threshold, 6), g
        assert grouped[g]["drifted"] == single.drifted
    assert grouped["b"]["drifted"] and not grouped["a"]["drifted"]


def test_wasserstein_grouped_one_sided_null_and_window_partitioned(spark):
    from truthound_spark.drift.detectors import wasserstein_grouped

    base = spark.createDataFrame(
        [(i, "only_base" if i < 30 else "both", float(i % 10)) for i in range(60)],
        "id long, g string, v double",
    )
    cur = spark.createDataFrame(
        [(i, "only_cur" if i < 30 else "both", float(i % 10)) for i in range(60)],
        "id long, g string, v double",
    )
    res = wasserstein_grouped(base, cur, "v", "g")
    out = {r["group"]: r for r in res.collect()}
    assert out["only_base"]["emd"] is None and out["only_base"]["drifted"] is None
    assert out["only_cur"]["emd"] is None
    assert out["both"]["emd"] == 0.0 and not out["both"]["drifted"]
    import re

    plan = res._jdf.queryExecution().executedPlan().toString()
    for m in re.finditer(r"Window \[(.*?)\], \[(.*?)\], \[(.*?)\]", plan):
        assert "group" in m.group(2), plan[:2000]


def test_chi_square_grouped_matches_per_group(spark):
    from truthound_spark.drift.detectors import chi_square_drift, chi_square_grouped

    rows = []
    for i in range(900):
        g = ["a", "b", "c"][i % 3]
        side = i % 2
        cat = f"k{(i // 6) % 5}"
        if g == "b" and side == 1:
            cat = f"k{(i // 6) % 2}"  # b's current collapses to 2 categories
        rows.append((i, g, cat, side))
    df = spark.createDataFrame(rows, "id long, g string, cat string, side int")
    base, cur = df.filter("side = 0"), df.filter("side = 1")
    grouped = {
        r["group"]: r for r in chi_square_grouped(base, cur, "cat", "g").collect()
    }
    for g in ("a", "b", "c"):
        single = chi_square_drift(
            base.filter(F.col("g") == g), cur.filter(F.col("g") == g), "cat"
        )
        assert grouped[g]["chi2"] == round(single.statistic, 6), g
        assert grouped[g]["dof"] == single.details["dof"]
        assert grouped[g]["drifted"] == single.drifted, g
    assert grouped["b"]["drifted"] and not grouped["a"]["drifted"]


def test_chi_square_grouped_caps_per_group_and_one_sided(spark):
    from truthound_spark.drift.detectors import chi_square_grouped

    base = spark.createDataFrame(
        [(i, "wide", f"c{i}") for i in range(200)]
        + [(i, "only_base", "x") for i in range(20)],
        "id long, g string, cat string",
    )
    cur = spark.createDataFrame(
        [(i, "wide", "HOT" if i < 100 else f"c{i + 100}") for i in range(200)],
        "id long, g string, cat string",
    )
    out = {
        r["group"]: r
        for r in chi_square_grouped(base, cur, "cat", "g", max_categories=50).collect()
    }
    # wide segment: ~300 distinct categories capped at 50 + other → dof 50
    assert out["wide"]["dof"] == 50
    # the concentrated HOT category (absent from baseline) tops the kept
    # set and drives the statistic
    assert out["wide"]["drifted"] and out["wide"]["chi2"] > 50
    assert out["only_base"]["chi2"] is None and out["only_base"]["drifted"] is None


def test_compare_grouped_dispatch_and_plan_partition_specs(spark):
    from truthound_spark.drift.detectors import compare_grouped

    base, cur = _mk(spark)
    import re

    for method in ("psi", "js", "ks", "wasserstein", "mean_variance"):
        out = compare_grouped(base, cur, "v", "g", method=method)
        rows = {r["group"]: r for r in out.collect()}
        assert rows["b"]["drifted"] and not rows["a"]["drifted"], method
        # every window in every grouped plan partitions by group
        plan = out._jdf.queryExecution().executedPlan().toString()
        for m in re.finditer(r"Window \[(.*?)\], \[(.*?)\], \[(.*?)\]", plan):
            assert "group" in m.group(2), (method, plan[:1500])
    import pytest as _pytest

    with _pytest.raises(ValueError):
        compare_grouped(base, cur, "v", "g", method="nope")


def test_chi_square_grouped_windows_partition_by_group(spark):
    from truthound_spark.drift.detectors import chi_square_grouped

    base = spark.createDataFrame(
        [(i, f"g{i % 3}", f"c{i % 5}") for i in range(150)],
        "id long, g string, cat string",
    )
    cur = spark.createDataFrame(
        [(i, f"g{i % 3}", f"c{(i + 1) % 5}") for i in range(150)],
        "id long, g string, cat string",
    )
    import re

    plan = (
        chi_square_grouped(base, cur, "cat", "g")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for m in re.finditer(r"Window \[(.*?)\], \[(.*?)\], \[(.*?)\]", plan):
        assert "group" in m.group(2), plan[:1500]


@pytest.mark.parametrize(
    "method,kwargs",
    [
        ("js", {}),
        ("ks", {}),
        ("wasserstein", {"bins": 20}),
        ("chi_square", {}),
    ],
)
def test_grouped_detectors_partitioning_invariant(spark, method, kwargs):
    """Quantized terms / exact counts: every grouped statistic must be
    bit-identical under different partitionings (the determinism
    property the oracle hashes rely on)."""
    from truthound_spark.drift.detectors import compare_grouped

    rows = [
        (i, f"g{i % 3}", float((i * 7) % 23), f"c{(i * 5) % 11}")
        for i in range(600)
    ]
    df = spark.createDataFrame(rows, "id long, g string, v double, cat string")
    col = "cat" if method == "chi_square" else "v"
    a = compare_grouped(
        df.filter("id % 2 = 0").repartition(1),
        df.filter("id % 2 = 1").repartition(1),
        col, "g", method=method, **kwargs,
    ).collect()
    b = compare_grouped(
        df.filter("id % 2 = 0").repartition(13),
        df.filter("id % 2 = 1").repartition(13),
        col, "g", method=method, **kwargs,
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b)), method


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_grouped_detectors_match_ungrouped_on_random_data(spark, seed):
    """Randomized differential pin: for every grouped detector and every
    group of random mixed-shape data, the per-group value equals the
    ungrouped detector on that group's slice — across seeds, not just
    the handcrafted fixtures."""
    import random

    from truthound_spark.drift.detectors import (
        chi_square_drift,
        chi_square_grouped,
        js_divergence,
        js_grouped,
        ks_grouped,
        ks_test,
        psi,
        psi_grouped,
        wasserstein,
        wasserstein_grouped,
    )

    rng = random.Random(seed)
    rows = []
    for i in range(500):
        g = rng.choice(["a", "b", "c", "d"])
        side = rng.random() < 0.5
        shape = {"a": rng.gauss(0, 1), "b": rng.uniform(-2, 5),
                 "c": rng.expovariate(1.0), "d": rng.gauss(3, 0.5)}[g]
        if g == "b" and side:
            shape += rng.uniform(0, 4)  # b drifts
        rows.append((i, g, float(shape), f"k{rng.randint(0, 6)}", int(side)))
    df = spark.createDataFrame(rows, "id long, g string, v double, cat string, side int")
    base, cur = df.filter("side = 0"), df.filter("side = 1")
    groups = sorted({r[1] for r in rows})

    psi_g = {r["group"]: r for r in psi_grouped(base, cur, "v", "g").collect()}
    js_g = {r["group"]: r for r in js_grouped(base, cur, "v", "g").collect()}
    ks_g = {r["group"]: r for r in ks_grouped(base, cur, "v", "g").collect()}
    wa_g = {r["group"]: r for r in wasserstein_grouped(base, cur, "v", "g").collect()}
    ch_g = {r["group"]: r for r in chi_square_grouped(base, cur, "cat", "g").collect()}
    for g in groups:
        b = base.filter(F.col("g") == g)
        c = cur.filter(F.col("g") == g)
        assert psi_g[g]["psi"] == round(psi(b, c, "v").statistic, 6), (seed, g)
        assert js_g[g]["js"] == round(js_divergence(b, c, "v").statistic, 6), (seed, g)
        assert ks_g[g]["ks"] == round(ks_test(b, c, "v").statistic, 6), (seed, g)
        assert wa_g[g]["emd"] == round(wasserstein(b, c, "v").statistic, 6), (seed, g)
        single = chi_square_drift(b, c, "cat")
        assert ch_g[g]["chi2"] == round(single.statistic, 6), (seed, g)
        assert ch_g[g]["dof"] == single.details["dof"], (seed, g)


def test_ks_grouped_sketch_tracks_exact(spark):
    """The per-group quantile-grid sketch lower-bounds exact grouped KS
    with a 1/grid-order gap — the 100 TB path for high-cardinality
    segments."""
    import random

    from truthound_spark.drift.detectors import ks_grouped, ks_grouped_sketch

    rng = random.Random(23)
    rows = []
    for i in range(3000):
        g = ["a", "b"][i % 2]
        side = i % 3 == 0
        v = rng.gauss(0, 1)
        if g == "b" and side:
            v += 1.2  # b's current shifts
        rows.append((i, g, float(v), int(side)))
    df = spark.createDataFrame(rows, "id long, g string, v double, side int")
    base, cur = df.filter("side = 0"), df.filter("side = 1")

    exact = {r["group"]: r for r in ks_grouped(base, cur, "v", "g").collect()}
    sk = {r["group"]: r for r in ks_grouped_sketch(base, cur, "v", "g", grid=200).collect()}
    for g in ("a", "b"):
        assert sk[g]["ks"] <= exact[g]["ks"] + 1e-9, g  # lower bound
        assert sk[g]["ks"] == pytest.approx(exact[g]["ks"], abs=0.03), g
        assert sk[g]["crit"] == exact[g]["crit"], g
        assert (sk[g]["n_base"], sk[g]["n_cur"]) == (
            exact[g]["n_base"], exact[g]["n_cur"],
        )
    assert sk["b"]["drifted"] and not sk["a"]["drifted"]


def test_ks_grouped_sketch_one_sided_null_and_invariance(spark):
    from truthound_spark.drift.detectors import ks_grouped_sketch

    base = spark.createDataFrame(
        [(i, "only_base" if i < 40 else "both", float(i % 17)) for i in range(200)],
        "id long, g string, v double",
    )
    cur = spark.createDataFrame(
        [(i, "only_cur" if i < 40 else "both", float(i % 17)) for i in range(200)],
        "id long, g string, v double",
    )
    out = {r["group"]: r for r in ks_grouped_sketch(base, cur, "v", "g", grid=50).collect()}
    assert out["only_base"]["ks"] is None and out["only_cur"]["ks"] is None
    assert out["both"]["ks"] == 0.0 and not out["both"]["drifted"]
    a = sorted(map(tuple, ks_grouped_sketch(
        base.repartition(1), cur.repartition(1), "v", "g", grid=50).collect()))
    b = sorted(map(tuple, ks_grouped_sketch(
        base.repartition(7), cur.repartition(7), "v", "g", grid=50).collect()))
    assert a == b  # percentile_approx sketch is deterministic for exact-fit data
    import pytest as _p

    with _p.raises(ValueError):
        ks_grouped_sketch(base, cur, "v", "g", grid=1)


# --- round-9: cvm_grouped ---------------------------------------------------


def test_cvm_grouped_matches_per_group(spark):
    from truthound_spark.drift.detectors import cramer_von_mises, cvm_grouped

    base, cur = _mk(spark)
    grouped = {r["group"]: r for r in cvm_grouped(base, cur, "v", "g").collect()}
    for g in ("a", "b", "c"):
        single = cramer_von_mises(
            base.filter(F.col("g") == g), cur.filter(F.col("g") == g), "v"
        )
        assert grouped[g]["cvm"] == round(single.statistic, 6), g
        assert grouped[g]["drifted"] == single.drifted
    assert grouped["b"]["drifted"] and not grouped["a"]["drifted"]


def test_cvm_grouped_one_sided_null_and_window_partitioned(spark):
    from truthound_spark.drift.detectors import cvm_grouped

    base, cur = _mk(spark)
    base2 = base.unionByName(
        spark.createDataFrame([(9999, "only_base", 1.0, 0)], base.schema)
    )
    rows = {r["group"]: r for r in cvm_grouped(base2, cur, "v", "g").collect()}
    ob = rows["only_base"]
    assert ob["cvm"] is None and ob["drifted"] is None  # absence ≠ agreement
    assert ob["n_base"] == 1 and ob["n_cur"] == 0
    # the cumulative window must be group-partitioned, never global
    plan = (
        cvm_grouped(base, cur, "v", "g")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    for m in re.finditer(r"Window \[(.*?)\], \[(.*?)\], \[(.*?)\]", plan):
        assert "group" in m.group(2), plan[:2000]
