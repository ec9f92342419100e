"""pipeline/regression.py: distributed logistic GD + closed-form linear
fit. Determinism is the contract under test — the same data must yield
bit-identical weights under any partitioning (the quantized-long
gradient design), and the linear fit is pinned against an independent
pure-Python replay of the same fixed-point arithmetic."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from truthound_spark.pipeline.regression import (
    linreg_simple,
    logreg_score,
    logreg_train,
)


def _toy(spark, parts):
    # separable-ish: y correlates with x1
    rows = [
        ((i % 20) / 10.0, (i * 37 % 11) / 10.0, 1.0 if i % 3 == 0 else 0.0)
        for i in range(200)
    ]
    return spark.createDataFrame(rows, "x1 double, x2 double, y double").repartition(
        parts
    )


def test_logreg_partitioning_invariant(spark):
    """Bit-identical trajectory on 1 vs 13 partitions — the exact-long
    gradient contract that makes the oracle replay possible."""
    h1, w1 = logreg_train(_toy(spark, 1), ["x1", "x2"], "y", iters=3)
    h13, w13 = logreg_train(_toy(spark, 13), ["x1", "x2"], "y", iters=3)
    assert w1 == w13
    assert [tuple(r) for r in h1.collect()] == [tuple(r) for r in h13.collect()]


def test_logreg_descends_loss(spark):
    """Each GD round must not increase log-loss on the training set."""
    df = _toy(spark, 4)
    losses = []
    for iters in (1, 2, 3, 4):
        _h, w = logreg_train(df, ["x1", "x2"], "y", iters=iters, lr=0.1)
        scored = logreg_score(df, ["x1", "x2"], w).collect()
        eps = 1e-9
        loss = -sum(
            r["y"] * math.log(max(r["score"], eps))
            + (1 - r["y"]) * math.log(max(1 - r["score"], eps))
            for r in scored
        ) / len(scored)
        losses.append(loss)
    assert losses == sorted(losses, reverse=True)


def test_logreg_first_round_matches_hand_computation(spark):
    """With w=0 the sigmoid is exactly 0.5 — round 1 is closed-form."""
    rows = [(1.0, 0.0), (2.0, 1.0), (3.0, 1.0), (4.0, 0.0)]
    df = spark.createDataFrame(rows, "x1 double, y double")
    h, _w = logreg_train(df, ["x1"], "y", iters=1, lr=0.5, quant=1_000_000)
    r = h.collect()[0]
    # residual r_i = 0.5 - y_i; g0 = sum round(r*1e6); g1 = sum round(r*x*1e6)
    g0 = sum(round((0.5 - y) * 1e6) for _x, y in rows)
    g1 = sum(round((0.5 - y) * x * 1e6) for x, y in rows)
    assert r["w_bias"] == round(0.0 - 0.5 * ((g0 / 1e6) / 4), 6)
    assert r["w_x1"] == round(0.0 - 0.5 * ((g1 / 1e6) / 4), 6)


def test_logreg_validation_errors(spark):
    df = _toy(spark, 2)
    with pytest.raises(ValueError, match="non-empty"):
        logreg_train(df, [], "y")
    with pytest.raises(ValueError, match="iters"):
        logreg_train(df, ["x1"], "y", iters=0)
    with pytest.raises(ValueError, match="empty input"):
        logreg_train(df.filter(F.lit(False)), ["x1"], "y")
    with pytest.raises(ValueError, match="weights"):
        logreg_score(df, ["x1", "x2"], [0.1, 0.2])


def test_logreg_score_is_map_only(spark):
    """Inference must add zero Exchange nodes — pure projection."""
    df = spark.createDataFrame([(1.0, 2.0)], "x1 double, x2 double")
    plan = logreg_score(df, ["x1", "x2"], [0.1, -0.2, 0.3])._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_linreg_exact_line(spark):
    """Noise-free y = 3x + 2 must be recovered exactly with r2 = 1."""
    df = spark.createDataFrame(
        [(float(i) / 10, 3.0 * i / 10 + 2.0) for i in range(1, 50)],
        "x double, y double",
    )
    r = linreg_simple(df, "x", "y").collect()[0]
    assert r["n"] == 49
    assert r["slope"] == pytest.approx(3.0, abs=1e-5)
    assert r["intercept"] == pytest.approx(2.0, abs=1e-5)
    assert r["r2"] == pytest.approx(1.0, abs=1e-6)


def test_linreg_partitioning_invariant(spark):
    rows = [(float(i % 17) / 3, float((i * 7) % 23)) for i in range(500)]
    a = linreg_simple(
        spark.createDataFrame(rows, "x double, y double").repartition(1), "x", "y"
    ).collect()
    b = linreg_simple(
        spark.createDataFrame(rows, "x double, y double").repartition(11), "x", "y"
    ).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


# ---------------------------------------------------------------------------
# bpe_fertility (tokenizer equity) — rides this module to avoid another
# Spark-session test file
# ---------------------------------------------------------------------------


def test_bpe_fertility_consistent_with_per_doc_counts(spark):
    from truthound_spark.pipeline.tokenizer import (
        bpe_fertility,
        bpe_token_counts,
        bpe_train,
    )

    df = spark.createDataFrame(
        [
            (0, "low lower lowest", "en"),
            (1, "low low low newer new", "en"),
            (2, "bajo bajito bajo", "es"),
            (3, None, "es"),
        ],
        "doc_id long, text string, lang string",
    )
    merges = bpe_train(df, rounds=3)
    per = {r["id"]: r for r in bpe_token_counts(df, merges).collect()}
    fert = {r["group"]: r for r in bpe_fertility(df, merges, "lang").collect()}
    assert fert["en"]["n_docs"] == 2
    assert fert["es"]["n_docs"] == 2
    assert fert["en"]["n_tokens"] == per[0]["n_tokens"] + per[1]["n_tokens"]
    assert fert["en"]["n_words"] == per[0]["n_words"] + per[1]["n_words"]
    # null text contributes 0 tokens and NULL words (skipped by sum)
    assert fert["es"]["n_tokens"] == per[2]["n_tokens"] + per[3]["n_tokens"]
    assert fert["en"]["fertility"] == round(
        fert["en"]["n_tokens"] / fert["en"]["n_words"], 6
    )
    assert fert["en"]["chars_per_token"] <= 10


# ---------------------------------------------------------------------------
# evaluation operators: metrics / calibration / AUC
# ---------------------------------------------------------------------------


def _scored(spark):
    # score, label pairs with a known confusion matrix at t=0.5
    rows = [
        (0.9, 1.0),  # tp
        (0.8, 1.0),  # tp
        (0.7, 0.0),  # fp
        (0.4, 1.0),  # fn
        (0.2, 0.0),  # tn
        (0.1, 0.0),  # tn
        (None, 1.0),  # excluded
    ]
    return spark.createDataFrame(rows, "score double, y double")


def test_classification_metrics_hand_checked(spark):
    from truthound_spark.pipeline.regression import classification_metrics

    r = classification_metrics(_scored(spark), "score", "y", 0.5).collect()[0]
    assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (2, 1, 1, 2)
    assert r["n_scored"] == 6
    assert r["precision"] == round(2 / 3, 6)
    assert r["recall"] == round(2 / 3, 6)
    assert r["f1"] == pytest.approx(2 / 3, abs=1e-6)
    assert r["accuracy"] == round(4 / 6, 6)


def test_classification_metrics_degenerate_threshold_yields_null(spark):
    from truthound_spark.pipeline.regression import classification_metrics

    r = classification_metrics(_scored(spark), "score", "y", 2.0).collect()[0]
    assert r["tp"] == 0 and r["fp"] == 0
    assert r["precision"] is None  # no predicted positives → undefined, not crash


def test_auc_matches_sklearn_free_reference(spark):
    """AUC vs a hand pairwise count: P(score_pos > score_neg) + ½ ties."""
    from truthound_spark.pipeline.regression import auc_binned

    rows = [(s, y) for s, y in [
        (0.9, 1.0), (0.8, 1.0), (0.7, 0.0), (0.4, 1.0), (0.4, 0.0),
        (0.2, 0.0), (0.1, 0.0),
    ]]
    pos = [s for s, y in rows if y == 1.0]
    neg = [s for s, y in rows if y == 0.0]
    expect = sum(
        1.0 if p > n_ else (0.5 if p == n_ else 0.0) for p in pos for n_ in neg
    ) / (len(pos) * len(neg))
    df = spark.createDataFrame(rows, "score double, y double")
    r = auc_binned(df, "score", "y").collect()[0]
    assert (r["n_pos"], r["n_neg"]) == (3, 4)
    assert r["auc"] == round(expect, 6)


def test_auc_extremes_and_single_class(spark):
    from truthound_spark.pipeline.regression import auc_binned

    perfect = spark.createDataFrame(
        [(0.9, 1.0), (0.8, 1.0), (0.2, 0.0)], "score double, y double"
    )
    assert auc_binned(perfect, "score", "y").collect()[0]["auc"] == 1.0
    single = spark.createDataFrame([(0.9, 1.0), (0.1, 1.0)], "score double, y double")
    assert auc_binned(single, "score", "y").collect()[0]["auc"] is None


def test_calibration_bins_perfectly_calibrated_scores(spark):
    from truthound_spark.pipeline.regression import calibration_bins

    # 10 rows at score 0.3 with 3 positives → bin 3 gap ≈ 0
    rows = [(0.3, 1.0 if i < 3 else 0.0) for i in range(10)]
    rows += [(0.85, 1.0), (0.85, 0.0)]  # bin 8, frac 0.5, gap 0.35
    df = spark.createDataFrame(rows, "score double, y double")
    out = {r["bin"]: r for r in calibration_bins(df, "score", "y", bins=10).collect()}
    assert out[3]["n"] == 10
    assert out[3]["mean_score"] == 0.3
    assert out[3]["frac_positive"] == 0.3
    assert out[3]["gap"] == 0.0
    assert out[8]["gap"] == pytest.approx(0.35, abs=1e-6)
    assert out[8]["bin_lo"] == 0.8


def test_calibration_score_one_lands_in_top_bin(spark):
    from truthound_spark.pipeline.regression import calibration_bins

    df = spark.createDataFrame([(1.0, 1.0)], "score double, y double")
    out = calibration_bins(df, "score", "y", bins=10).collect()
    assert len(out) == 1 and out[0]["bin"] == 9


def test_threshold_sweep_matches_single_metrics_and_is_one_scan(spark):
    from truthound_spark.pipeline.regression import (
        classification_metrics,
        threshold_sweep,
    )

    df = _scored(spark)
    sweep = {r["threshold"]: r for r in threshold_sweep(df, "score", "y", [0.3, 0.5, 0.75]).collect()}
    for t in (0.3, 0.5, 0.75):
        single = classification_metrics(df, "score", "y", t).collect()[0]
        row = sweep[t]
        assert (row["tp"], row["fp"], row["fn"], row["tn"]) == (
            single["tp"], single["fp"], single["fn"], single["tn"]
        )
        assert row["precision"] == single["precision"]
        assert row["f1"] == single["f1"]
    # fused: the whole curve is ONE aggregate over one scan
    import pytest as _pytest

    with _pytest.raises(ValueError, match="non-empty"):
        threshold_sweep(df, "score", "y", [])
    plan = (
        threshold_sweep(df, "score", "y", [0.3, 0.5, 0.75])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Scan") == 1


def test_linreg_grouped_matches_per_group_simple(spark):
    from truthound_spark.pipeline.regression import linreg_grouped, linreg_simple

    rows = []
    for g, slope, icept in (("a", 2.0, 1.0), ("b", -0.5, 3.0)):
        rows += [(g, i / 10, slope * i / 10 + icept) for i in range(1, 30)]
    rows.append((None, 1.0, 1.0))  # null group, single row → degenerate
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = {r["group"]: r for r in linreg_grouped(df, "x", "y", "g").collect()}
    for g in ("a", "b"):
        single = linreg_simple(df.filter(F.col("g") == g), "x", "y").collect()[0]
        assert out[g]["slope"] == single["slope"]
        assert out[g]["intercept"] == single["intercept"]
        assert out[g]["r2"] == single["r2"]
    assert out["__null__"]["n"] == 1
    assert out["__null__"]["slope"] is None  # degenerate, not a crash


def test_weighted_sample_properties(spark):
    from truthound_spark.pipeline.export import weighted_sample

    rows = [(i, "heavy" if i % 10 == 0 else "light", 1000 if i % 10 == 0 else 1)
            for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, kind string, w long")

    out = weighted_sample(df, "w", k=60, key_col="doc_id", seed=0).collect()
    assert len(out) == 60
    assert len({r["doc_id"] for r in out}) == 60  # without replacement
    assert [r["rank"] for r in sorted(out, key=lambda r: r["rank"])] == list(range(1, 61))
    # 100 heavy rows carry ~99% of the mass → they must dominate the draw
    heavy = sum(1 for r in out if r["kind"] == "heavy")
    assert heavy >= 45

    # determinism across partitionings; independence across seeds
    again = weighted_sample(df.repartition(17), "w", k=60, key_col="doc_id", seed=0).collect()
    assert {r["doc_id"] for r in again} == {r["doc_id"] for r in out}
    other = weighted_sample(df, "w", k=60, key_col="doc_id", seed=1).collect()
    assert {r["doc_id"] for r in other} != {r["doc_id"] for r in out}


def test_weighted_sample_grouped_and_guards(spark):
    from truthound_spark.pipeline.export import weighted_sample

    df = spark.createDataFrame(
        [(i, "s" + str(i % 3), (i % 7) + 1) for i in range(90)]
        + [(900, "s0", 0), (901, "s0", None)],  # excluded: zero / null weight
        "doc_id long, src string, w long",
    )
    out = weighted_sample(df, "w", k=4, group_col="src", key_col="doc_id").collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["src"], []).append(r["rank"])
    assert set(by_src) == {"s0", "s1", "s2"}
    for ranks in by_src.values():
        assert sorted(ranks) == [1, 2, 3, 4]
    assert not any(r["doc_id"] in (900, 901) for r in out)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="k must be"):
        weighted_sample(df, "w", k=0)


def test_standardize_zero_mean_unit_var_and_constant_null(spark):
    from truthound_spark.pipeline.regression import standardize

    df = spark.createDataFrame(
        [(float(i), 7.0) for i in range(100)], "x double, c double"
    )
    out = standardize(df, ["x", "c"]).collect()
    xs = [r["x"] for r in out]
    assert abs(sum(xs) / len(xs)) < 1e-9
    assert abs(sum(v * v for v in xs) / len(xs) - 1.0) < 1e-9
    assert all(r["c"] is None for r in out)  # constant column → NULL, not 0
    import pytest as _pytest

    with _pytest.raises(ValueError, match="non-empty"):
        standardize(df, [])


def test_standardize_partitioning_invariant(spark):
    from truthound_spark.pipeline.regression import standardize

    rows = [(float(i % 31) / 7,) for i in range(300)]
    a = standardize(spark.createDataFrame(rows, "x double").repartition(1), ["x"]).collect()
    b = standardize(spark.createDataFrame(rows, "x double").repartition(13), ["x"]).collect()
    assert sorted(r["x"] for r in a) == sorted(r["x"] for r in b)


def test_logreg_l2_shrinks_weights_and_zero_is_identity(spark):
    df = _toy(spark, 4)
    _h0, w0 = logreg_train(df, ["x1", "x2"], "y", iters=4, lr=0.1)
    _hz, wz = logreg_train(df, ["x1", "x2"], "y", iters=4, lr=0.1, l2=0.0)
    assert w0 == wz  # l2=0 reproduces plain GD bit-identically
    _hr, wr = logreg_train(df, ["x1", "x2"], "y", iters=4, lr=0.1, l2=1.0)
    # decayed coefficient norm strictly smaller; bias not decayed
    assert wr[1] ** 2 + wr[2] ** 2 < w0[1] ** 2 + w0[2] ** 2


def test_auc_grouped_matches_per_group_auc_binned(spark):
    from truthound_spark.pipeline.regression import auc_binned, auc_grouped

    rows = []
    for i in range(400):
        g = ["a", "b"][i % 2]
        y = 1.0 if i % 3 == 0 else 0.0
        s = (0.6 if y else 0.3) + (i % 7) * 0.02 if g == "a" else (i % 10) / 10.0
        rows.append((round(s, 3), y, g))
    rows.append((0.9, 1.0, "single"))  # single-class segment
    df = spark.createDataFrame(rows, "score double, y double, g string")
    grouped = {r["group"]: r for r in auc_grouped(df, "score", "y", "g").collect()}
    for g in ("a", "b"):
        single = auc_binned(df.filter(F.col("g") == g), "score", "y").collect()[0]
        assert grouped[g]["auc"] == single["auc"], g
        assert (grouped[g]["n_pos"], grouped[g]["n_neg"]) == (
            single["n_pos"], single["n_neg"],
        )
    assert grouped["single"]["auc"] is None  # undefined, loud
    assert grouped["a"]["auc"] > grouped["b"]["auc"]  # a separates, b is noise


def test_calibration_grouped_matches_per_group(spark):
    from truthound_spark.pipeline.regression import calibration_bins, calibration_grouped

    rows = []
    for i in range(300):
        g = ["a", "b"][i % 2]
        s = round((i % 10) / 10 + 0.05, 3)
        y = 1.0 if (i % 10) / 10 > (0.4 if g == "a" else 0.7) else 0.0
        rows.append((s, y, g))
    df = spark.createDataFrame(rows, "score double, y double, g string")
    grouped = {(r["group"], r["bin"]): r for r in calibration_grouped(df, "score", "y", "g").collect()}
    for g in ("a", "b"):
        for r in calibration_bins(df.filter(F.col("g") == g), "score", "y").collect():
            gr = grouped[(g, r["bin"])]
            assert (gr["n"], gr["mean_score"], gr["frac_positive"], gr["gap"]) == (
                r["n"], r["mean_score"], r["frac_positive"], r["gap"]
            ), (g, r["bin"])


def test_threshold_sweep_grouped_matches_per_group(spark):
    from truthound_spark.pipeline.regression import threshold_sweep, threshold_sweep_grouped

    rows = []
    for i in range(400):
        g = ["a", "b"][i % 2]
        y = 1.0 if i % 3 == 0 else 0.0
        s = (0.6 if y else 0.3) + (i % 7) * 0.02 if g == "a" else (i % 10) / 10.0
        rows.append((round(s, 3), y, g))
    rows.append((0.9, 1.0, "single"))  # single-class segment
    df = spark.createDataFrame(rows, "score double, y double, g string")
    ts = [0.25, 0.5, 0.75]
    grouped = {
        (r["group"], r["threshold"]): r
        for r in threshold_sweep_grouped(df, "score", "y", "g", ts).collect()
    }
    for g in ("a", "b", "single"):
        for r in threshold_sweep(df.filter(F.col("g") == g), "score", "y", ts).collect():
            gr = grouped[(g, r["threshold"])]
            for c in ("tp", "fp", "fn", "tn", "precision", "recall", "f1"):
                assert gr[c] == r[c], (g, r["threshold"], c)
    # degenerate segment: all-positive → precision NULL below its score
    assert grouped[("single", 0.25)]["recall"] == 1.0
    assert grouped[("single", 0.25)]["tn"] == 0
