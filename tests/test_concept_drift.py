"""Concept-drift detector (ml/concept_drift.py; reference
ml/drift_detection/concept.py): the label-conditional drift feature
drift cannot see — correlation flips with stable marginals, target
shifts, persistence round-trip."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from truthound_spark.ml import ConceptDriftDetector, ModelRegistry, concept_drift_table


def _xy(spark, n, slope, seed, mean=0.0):
    """y = slope*x + noise: same x marginal for any slope."""
    rng = random.Random(seed)
    rows = [
        (x, slope * x + rng.gauss(mean, 0.3))
        for x in (rng.gauss(0, 1) for _ in range(n))
    ]
    return spark.createDataFrame(rows, "x double, y double")


def test_degraded_model_correlation_flip(spark):
    """x's marginal is identical in both windows; only the x→y
    relationship reverses. Feature drift is silent; concept drift must
    fire with the sign-change penalty."""
    ref = _xy(spark, 2000, +1.0, seed=1)
    cur = _xy(spark, 2000, -1.0, seed=2)

    det = ConceptDriftDetector("y").fit(ref)
    res = det.detect(cur)
    assert res.is_drifted
    assert res.drift_score == 1.0  # |Δcorr| ≈ 1.9 + 0.5 penalty, capped
    assert res.drift_type in ("concept_shift", "partial_concept_drift")
    assert "sign changed" in res.details

    # marginal check: feature drift genuinely silent on x
    from truthound_spark.drift.detectors import psi

    assert not psi(ref, cur, "x").drifted


def test_no_drift_between_like_windows(spark):
    ref = _xy(spark, 2000, 1.0, seed=3)
    cur = _xy(spark, 2000, 1.0, seed=4)
    det = ConceptDriftDetector("y", threshold=0.1).fit(ref)
    res = det.detect(cur)
    assert not res.is_drifted
    assert res.drift_type == "none"
    assert res.confidence > 0.8


def test_numeric_target_shift(spark):
    """Relationship intact, target mean moved 5σ → target_shift
    (reference concept.py:306 mean_drift/3 term)."""
    ref = _xy(spark, 2000, 1.0, seed=5)
    cur = _xy(spark, 2000, 1.0, seed=6, mean=6.0)
    det = ConceptDriftDetector("y", threshold=0.5).fit(ref)
    res = det.detect(cur)
    assert res.is_drifted
    assert res.drift_type == "target_shift"
    assert ("_target_distribution", res.drift_score) in res.column_scores


def test_categorical_target_new_and_shifted_classes(spark):
    rng = random.Random(7)
    ref = spark.createDataFrame(
        [(rng.gauss(0, 1), "a" if i % 4 else "b") for i in range(2000)],
        "x double, label string",
    )
    cur = spark.createDataFrame(
        [(rng.gauss(0, 1), "c" if i % 2 else "a") for i in range(2000)],
        "x double, label string",
    )
    det = ConceptDriftDetector("label", feature_columns=["x"]).fit(ref)
    assert det.reference_.target_type == "categorical"
    assert det.reference_.proportions["a"] == pytest.approx(0.75)
    res = det.detect(cur)
    # new class 'c' carries 0.5 of current mass → target score ≥ 0.5
    assert res.is_drifted and res.drift_type == "target_shift"
    assert res.drift_score >= 0.5


def test_corr_matches_exact_pearson(spark):
    """F.corr summary equals the reference's driver-side formula."""
    rows = [(float(i), float(i * i % 7)) for i in range(50)]
    df = spark.createDataFrame(rows, "x double, y double")
    det = ConceptDriftDetector("y").fit(df)
    xs, ys = zip(*rows)
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    cov = sum((a - mx) * (b - my) for a, b in zip(xs, ys))
    sx = math.sqrt(sum((a - mx) ** 2 for a in xs))
    sy = math.sqrt(sum((b - my) ** 2 for b in ys))
    assert det.reference_.correlations["x"] == pytest.approx(cov / (sx * sy), rel=1e-9)


def test_constant_feature_scores_zero_corr(spark):
    df = spark.createDataFrame([(1.0, float(i)) for i in range(100)], "x double, y double")
    det = ConceptDriftDetector("y").fit(df)
    assert det.reference_.correlations["x"] == 0.0  # zero variance → 0, not NaN


def test_persistence_roundtrip(spark, tmp_path):
    ref = _xy(spark, 1000, 1.0, seed=8)
    det = ConceptDriftDetector("y", threshold=0.2).fit(ref)
    reg = ModelRegistry(root=str(tmp_path / "models"))
    v = reg.save_concept_drift("cd", det)
    back = reg.load_concept_drift("cd", v)
    assert back.threshold == det.threshold
    assert back.reference_.correlations == det.reference_.correlations
    cur = _xy(spark, 1000, -1.0, seed=9)
    r1, r2 = det.detect(cur), back.detect(cur)
    assert r1.to_dict() == r2.to_dict()


def test_concept_drift_table_matches_detector_scores(spark):
    ref = _xy(spark, 500, 1.0, seed=10)
    cur = _xy(spark, 500, -0.5, seed=11)
    tbl = {
        r["feature"]: r
        for r in concept_drift_table(ref, cur, "y", ["x"]).collect()
    }
    det = ConceptDriftDetector("y").fit(ref)
    res = det.detect(cur)
    score = dict(res.column_scores)["x"]
    assert tbl["x"]["score"] == pytest.approx(score, abs=1e-6)


def test_concept_drift_grouped_matches_per_group_table(spark):
    """Per-group rows pinned to concept_drift_table on each segment's
    slice; segments missing from one side report NULL scores."""
    import random

    from truthound_spark.ml import concept_drift_grouped, concept_drift_table
    from pyspark.sql import functions as F

    rng = random.Random(17)
    rows = []
    for i in range(600):
        g = ["s1", "s2"][i % 2]
        x = rng.gauss(0, 1)
        slope = 1.0 if g == "s1" else -1.0
        side = i % 3 == 0
        if g == "s2" and side:
            slope = 1.0  # s2's relationship flips between sides
        rows.append((i, g, x, slope * x + rng.gauss(0, 0.2), int(side)))
    rows.append((999, "only_base", 1.0, 1.0, 0))
    df = spark.createDataFrame(rows, "id long, g string, x double, y double, side int")
    base, cur = df.filter("side = 0"), df.filter("side = 1")

    grouped = {
        (r["group"], r["feature"]): r
        for r in concept_drift_grouped(base, cur, "y", ["x"], "g").collect()
    }
    for g in ("s1", "s2"):
        single = concept_drift_table(
            base.filter(F.col("g") == g), cur.filter(F.col("g") == g), "y", ["x"]
        ).collect()[0]
        got = grouped[(g, "x")]
        for c in ("ref_corr", "cur_corr", "corr_change", "score"):
            assert got[c] == single[c], (g, c)
    assert grouped[("s2", "x")]["score"] == 1.0  # flipped relationship
    assert grouped[("s1", "x")]["score"] < 0.1
    assert grouped[("only_base", "x")]["cur_corr"] is None
    assert grouped[("only_base", "x")]["score"] is None
