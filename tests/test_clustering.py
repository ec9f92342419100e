"""Exact distributed DBSCAN tests (pipeline/clustering.py).

Correctness: the grid construction must reproduce brute-force DBSCAN
exactly (same cores, same min-id cluster labels, same noise set) — proven
against a pure-Python union-find implementation on seeded random blobs.
Scale: the candidate-pair join must be an equi-join on cell coordinates
(never a cartesian product).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from truthound_spark.pipeline.clustering import dbscan


def _py_dbscan(rows, eps, min_pts):
    """Brute-force reference: rows = [(id, *coords)]."""
    nbrs = {r[0]: [] for r in rows}
    for i, *xi in rows:
        for j, *xj in rows:
            if i != j and sum((a - b) ** 2 for a, b in zip(xi, xj)) <= eps * eps:
                nbrs[i].append(j)
    core = {i for i in nbrs if len(nbrs[i]) + 1 >= min_pts}
    parent = {i: i for i in core}

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for i in core:
        for j in nbrs[i]:
            if j in core:
                ra, rb = find(i), find(j)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    comp: dict[int, list[int]] = {}
    for i in core:
        comp.setdefault(find(i), []).append(i)
    label = {}
    for members in comp.values():
        m = min(members)
        for i in members:
            label[i] = m
    out = {}
    for i, *_ in rows:
        if i in core:
            out[i] = (True, label[i])
        else:
            cands = [label[j] for j in nbrs[i] if j in core]
            out[i] = (False, min(cands) if cands else None)
    return out


def _blobs(seed, d=2, n_noise=15):
    rnd = random.Random(seed)
    centers = [(0,) * d, (5,) * d, tuple(9 - 8 * (i % 2) for i in range(d))]
    pts = []
    for c in centers:
        for _ in range(40):
            pts.append(tuple(x + rnd.gauss(0, 0.3) for x in c))
    for _ in range(n_noise):
        pts.append(tuple(rnd.uniform(-2, 11) for _ in range(d)))
    return [(i, *p) for i, p in enumerate(pts)]


@pytest.mark.parametrize("seed", [7, 8])
def test_dbscan_matches_bruteforce_2d(spark, seed):
    rows = _blobs(seed)
    expected = _py_dbscan(rows, 0.6, 4)
    df = spark.createDataFrame(rows, "id long, x double, y double")
    got = {
        r.id: (r.is_core, r.cluster_id)
        for r in dbscan(df, ["x", "y"], 0.6, 4, id_col="id").collect()
    }
    assert got == expected


def test_dbscan_matches_bruteforce_1d(spark):
    rnd = random.Random(3)
    rows = [(i, float(rnd.choice([0, 0, 0, 50]) + rnd.gauss(0, 1))) for i in range(80)]
    expected = _py_dbscan(rows, 1.0, 3)
    df = spark.createDataFrame(rows, "id long, x double")
    got = {
        r.id: (r.is_core, r.cluster_id)
        for r in dbscan(df, ["x"], 1.0, 3, id_col="id").collect()
    }
    assert got == expected


def test_dbscan_matches_bruteforce_3d(spark):
    rows = _blobs(11, d=3, n_noise=8)
    expected = _py_dbscan(rows, 0.8, 4)
    df = spark.createDataFrame(rows, "id long, x double, y double, z double")
    got = {
        r.id: (r.is_core, r.cluster_id)
        for r in dbscan(df, ["x", "y", "z"], 0.8, 4, id_col="id").collect()
    }
    assert got == expected


def test_dbscan_all_noise(spark):
    # far-apart points, min_pts too high -> everything is noise
    rows = [(i, float(i * 100)) for i in range(10)]
    df = spark.createDataFrame(rows, "id long, x double")
    res = dbscan(df, ["x"], 1.0, 3, id_col="id").collect()
    assert all(r.cluster_id is None and not r.is_core for r in res)


def test_dbscan_min_pts_1_singletons(spark):
    # min_pts=1: every point is core; isolated points become singleton
    # clusters labeled by their own id
    rows = [(1, 0.0), (2, 100.0), (3, 100.2)]
    df = spark.createDataFrame(rows, "id long, x double")
    got = {r.id: r.cluster_id for r in dbscan(df, ["x"], 1.0, 1, id_col="id").collect()}
    assert got == {1: 1, 2: 2, 3: 2}


def test_dbscan_null_features_dropped(spark):
    rows = [(1, 0.0), (2, 0.1), (3, 0.2), (4, None)]
    df = spark.createDataFrame(rows, "id long, x double")
    res = dbscan(df, ["x"], 1.0, 2, id_col="id")
    assert res.count() == 3


def test_dbscan_validation_errors(spark):
    df = spark.createDataFrame([(1, 0.0)], "id long, x double")
    with pytest.raises(ValueError, match="eps"):
        dbscan(df, ["x"], 0.0, 3)
    with pytest.raises(ValueError, match="min_pts"):
        dbscan(df, ["x"], 1.0, 0)
    with pytest.raises(ValueError, match="dimensions"):
        dbscan(df, ["x"] * 5, 1.0, 3)


def test_dbscan_plan_is_equi_join(spark):
    rows = _blobs(5)
    df = spark.createDataFrame(rows, "id long, x double, y double")
    plan = (
        dbscan(df, ["x", "y"], 0.6, 4, id_col="id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dbscan_validator_flags_noise(spark):
    from truthound_spark.validators.anomaly import DBSCANValidator

    rows = _blobs(9)
    df = spark.createDataFrame(rows, "id long, x double, y double")
    issues = DBSCANValidator(["x", "y"], eps=0.6, min_pts=4).validate(df)
    assert len(issues) == 1
    expected_noise = sum(
        1 for _, (core, cl) in _py_dbscan(rows, 0.6, 4).items() if cl is None
    )
    assert issues[0].count == expected_noise
    assert issues[0].validator_name == "dbscan"


def test_dbscan_validator_auto_eps(spark):
    from truthound_spark.validators.anomaly import DBSCANValidator

    rows = _blobs(10)
    df = spark.createDataFrame(rows, "id long, x double, y double")
    issues = DBSCANValidator(["x", "y"], min_pts=4).validate(df)
    # auto-eps is span/20 — exact count depends on scale, but the dense
    # blobs must not be flagged wholesale
    if issues:
        assert issues[0].count < len(rows) // 2


# -- native isolation forest (validators/iforest.py) -------------------------


def test_iforest_flags_planted_outliers(spark):
    import numpy as np

    from truthound_spark.validators.anomaly import IsolationForestValidator

    rng = np.random.RandomState(0)
    blob = rng.normal(0, 1, size=(500, 2))
    rows = [(float(a), float(b)) for a, b in blob] + [(9.0, 9.0), (-10.0, 8.0)]
    df = spark.createDataFrame(rows, "x double, y double")
    issues = IsolationForestValidator(["x", "y"], contamination=0.01, seed=7).validate(df)
    assert len(issues) == 1
    # the 2 planted outliers plus at most ~1% of the blob
    assert 2 <= issues[0].count <= 10
    assert "native trees" in issues[0].details


def test_iforest_deterministic_across_runs(spark):
    import numpy as np

    from truthound_spark.validators.anomaly import IsolationForestValidator

    rng = np.random.RandomState(3)
    rows = [(float(a), float(b)) for a, b in rng.normal(0, 1, size=(300, 2))]
    df = spark.createDataFrame(rows, "x double, y double")
    v = IsolationForestValidator(["x", "y"], contamination=0.05, seed=11)
    c1 = v.validate(df)
    c2 = v.validate(df)
    assert [i.count for i in c1] == [i.count for i in c2]


def test_iforest_model_score_properties():
    import numpy as np

    from truthound_spark.validators.iforest import fit_isolation_forest

    rng = np.random.RandomState(1)
    data = np.vstack([rng.normal(0, 1, size=(400, 3)), [[12.0, -12.0, 12.0]]])
    m = fit_isolation_forest(data, ["a", "b", "c"], seed=5)
    s = m.scores(data)
    assert (s > 0).all() and (s < 1).all()
    # the isolated point must out-score the entire blob
    assert s[-1] > s[:-1].max()
    # deeper points average below 0.5 (the classic "clearly not anomalous" band)
    assert s[:-1].mean() < 0.55
