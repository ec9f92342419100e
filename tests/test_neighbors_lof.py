"""Exact distributed kNN + LOF (pipeline/neighbors.py) vs a brute-force
Python reference implementing the identical arithmetic contract."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from truthound_spark.pipeline.neighbors import knn_edges, lof

SCALE = 1e6


def _brute_lof(rows, k):
    pts = {i: tuple(xs) for i, *xs in rows}

    def dist(a, b):
        return math.sqrt(
            sum((p - q) * (p - q) for p, q in zip(pts[a], pts[b]))
        )

    kdist, edges = {}, {}
    for p in pts:
        ds = sorted((dist(p, o), o) for o in pts if o != p)
        kdist[p] = ds[k - 1][0]
        edges[p] = [o for dd, o in ds if dd <= kdist[p]]
    lrd = {}
    for p in pts:
        qs = [round(max(kdist[o], dist(p, o)) * SCALE) for o in edges[p]]
        s = sum(qs)
        lrd[p] = (float(len(qs)) * SCALE / float(s)) if s else None
    qlrd = {p: (round(v * SCALE) if v is not None else None) for p, v in lrd.items()}
    out = {}
    for p in pts:
        os = [qlrd[o] for o in edges[p] if qlrd[o] is not None]
        if lrd[p] is None or not os:
            out[p] = None
        else:
            out[p] = (float(sum(os)) / len(os) / SCALE) / lrd[p]
    return kdist, edges, out


@pytest.mark.parametrize("seed", [3, 17])
def test_lof_matches_brute_force(spark, seed):
    rng = random.Random(seed)
    rows = [(i, rng.uniform(0, 10), rng.uniform(0, 10)) for i in range(70)]
    rows.append((900, 60.0, 60.0))  # isolated -> multiple doubling rounds
    kdist_want, edges_want, lof_want = _brute_lof(rows, k=5)
    df = spark.createDataFrame(rows, "id long, x double, y double").repartition(5)

    edges, kdist = knn_edges(df, ["x", "y"], k=5, id_col="id")
    got_kdist = {r["id"]: r["k_dist"] for r in kdist.collect()}
    assert got_kdist == pytest.approx(kdist_want, abs=1e-12)
    got_edges: dict[int, set[int]] = {}
    for r in edges.collect():
        got_edges.setdefault(r["id"], set()).add(r["nbr"])
    assert got_edges == {p: set(v) for p, v in edges_want.items()}

    got = {r["id"]: r["lof"] for r in lof(df, ["x", "y"], k=5, id_col="id").collect()}
    assert set(got) == set(lof_want)
    for p, want in lof_want.items():
        if want is None:
            assert got[p] is None, p
        else:
            assert got[p] == pytest.approx(want, abs=1e-9), p
    # the isolated point is a strong outlier; bulk sits near 1
    assert got[900] > 5
    inliers = [v for p, v in got.items() if p != 900]
    assert sum(1 for v in inliers if v < 2) > len(inliers) * 0.9


def test_lof_duplicate_cluster_yields_null(spark):
    # 6 identical points (> k): mean reach 0 -> lrd NULL -> lof NULL,
    # deterministic and documented
    rows = [(i, 1.0, 1.0) for i in range(6)] + [
        (10, 5.0, 5.0),
        (11, 5.1, 5.0),
        (12, 5.0, 5.1),
        (13, 5.1, 5.1),
        (14, 4.9, 5.0),
        (15, 4.9, 5.1),
    ]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    got = {r["id"]: r["lof"] for r in lof(df, ["x", "y"], k=3, id_col="id").collect()}
    for i in range(6):
        assert got[i] is None
    assert got[10] is not None


def test_knn_validates_args(spark):
    df = spark.createDataFrame([(1, 0.0)], "id long, x double")
    with pytest.raises(ValueError):
        knn_edges(df, ["x"], k=0)
    with pytest.raises(ValueError):
        knn_edges(df, [], k=1)
    with pytest.raises(ValueError):
        knn_edges(df, ["x"], k=5)  # not enough points


def test_native_lof_validator_flags_outlier(spark):
    from truthound_spark.validators.anomaly import NativeLOFValidator

    rng = random.Random(9)
    rows = [(i, rng.gauss(0, 1), rng.gauss(0, 1)) for i in range(60)]
    rows.append((999, 40.0, 40.0))
    df = spark.createDataFrame(rows, "rid long, a double, b double")
    issues = NativeLOFValidator(
        columns=["a", "b"], k=5, threshold=3.0, id_column="rid"
    ).validate(df)
    assert len(issues) == 1
    assert issues[0].count >= 1
    assert issues[0].validator_name == "lof_native"


def test_lof_embeddings_flags_isolated_vector(spark):
    """Approximate embedding LOF: a vector far from two tight clusters
    scores highest (when LSH buckets give it neighbors at all); cluster
    members sit near 1."""
    import math

    from truthound_spark.pipeline.neighbors import lof_embeddings

    rng = random.Random(2)
    rows = []
    i = 0
    for base_angle in (0.0, math.pi / 2):
        for _ in range(25):
            a = base_angle + rng.gauss(0, 0.02)
            rows.append((i, [math.cos(a) * 5, math.sin(a) * 5, rng.gauss(0, 0.05)]))
            i += 1
    rows.append((99, [-40.0, -40.0, 30.0]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r["id"]: r["lof"]
        for r in lof_embeddings(df, k=4, num_planes=4, num_bands=4).collect()
    }
    assert set(got) == {r[0] for r in rows}
    inliers = [v for p, v in got.items() if p != 99 and v is not None]
    assert inliers and sum(1 for v in inliers if v < 2) > len(inliers) * 0.8
    if got[99] is not None:  # bucket recall permitting, the outlier pops
        assert got[99] > max(inliers)


def test_lof_embeddings_deterministic_across_layouts(spark):
    from truthound_spark.pipeline.neighbors import lof_embeddings

    rng = random.Random(4)
    rows = [
        (i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    a = {r["id"]: r["lof"] for r in lof_embeddings(df, k=3).collect()}
    b = {
        r["id"]: r["lof"]
        for r in lof_embeddings(df.repartition(7), k=3).collect()
    }
    assert a == b
