"""Distributed, deterministic regression fits — logistic (iterative
batch gradient descent) and simple linear (closed-form) — built the same
way as the repo's other hash-certified iterative algorithms
(``clustering.kmeans``, ``tokenizer.bpe_train``): every per-row
contribution is quantized to a fixed-point long BEFORE the aggregate, so
the sums are exact and order-independent, and the whole training
trajectory is bit-identical across engines, partitionings, and reruns.

Reference surface: ``validators/security/redos/ml/models.py:645``
(LogisticRegressionReDoSModel) and ``profiler/ml/base.py`` fit sklearn
models on driver-collected matrices; here EVERY row participates in
every gradient step and nothing but (d+1) longs ever reaches the driver.

Scale design (100 TB): per iteration the plan is one scan of the cached
narrow feature projection → map-side partial aggregation → ONE final
row of (d+1) long counters. No shuffle of data rows, no UDFs — the
sigmoid/residual math is whole-stage-codegen'd column arithmetic.
Cost is iterations × scan, the canonical distributed batch GD.

Exactness contract: gradient sums are exact longs as long as
``|residual| · |x_j| · quant · n_rows`` stays under 2^63 (documented
per call); the driver-side weight update mirrors the oracle's
``CAST(long AS DOUBLE) / quant / n`` IEEE arithmetic operation-for-
operation, so weights — not just predictions — hash-match cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _sigmoid(z):
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def logreg_train(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    iters: int = 3,
    lr: float = 0.5,
    quant: int = 1_000_000,
    l2: float = 0.0,
):
    """Batch-gradient-descent logistic regression, full-corpus, exact.

    Weights start at 0 (so iteration 1's sigmoid is exactly 0.5 — no
    transcendental enters until round 2) and update as

        w_j ← w_j·(1 − lr·l2) − lr · (Σ_i round((σ(w·x_i) − y_i) · x_ij · quant)) / quant / n

    (``l2`` is standard weight decay — the bias is NOT decayed, per
    convention; 0 disables it and reproduces plain GD exactly.)

    The inner sum is a LONG — order-independent, partition-count-
    independent — which is what makes the trajectory reproducible on a
    1000-executor cluster and replayable as a DuckDB CTE chain. The
    label must be 0/1; callers pre-drop null features.

    Returns ``(history, weights)``: history is a driver-built DataFrame
    with one row per iteration — (iter, w_bias, w_<feature>...) rounded
    to 6 decimals — and ``weights`` is the final ``[bias, w_1, ...]``
    floats for :func:`logreg_score`.
    """
    if not feature_cols:
        raise ValueError("feature_cols must be non-empty")
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    spark = df.sparkSession
    feats = df.select(
        *[F.col(c).cast("double").alias(c) for c in feature_cols],
        F.col(label_col).cast("double").alias("__y"),
    )
    feats.persist()
    try:
        w = [0.0] * (len(feature_cols) + 1)  # [bias, w_1, ...]
        history: list[tuple] = []
        for it in range(1, iters + 1):
            z = F.lit(w[0])
            for j, c in enumerate(feature_cols):
                z = z + F.lit(w[j + 1]) * F.col(c)
            r = _sigmoid(z) - F.col("__y")
            aggs = [
                F.count(F.lit(1)).alias("n"),
                F.sum(F.round(r * quant).cast("long")).alias("g0"),
            ]
            for j, c in enumerate(feature_cols):
                aggs.append(
                    F.sum(F.round(r * F.col(c) * quant).cast("long")).alias(f"g{j + 1}")
                )
            row = feats.agg(*aggs).collect()[0]
            n = row["n"]
            if not n:
                raise ValueError("logreg_train: empty input")
            for j in range(len(w)):
                # mirrors the oracle's CAST(g AS DOUBLE) / quant / n exactly
                decay = 1.0 if (j == 0 or not l2) else (1.0 - lr * l2)
                w[j] = w[j] * decay - lr * ((float(row[f"g{j}"]) / float(quant)) / n)
            history.append((it, *w))
    finally:
        feats.unpersist()
    cols = ["iter", "w_bias"] + [f"w_{c}" for c in feature_cols]
    hist = spark.createDataFrame(history, cols).select(
        F.col("iter").cast("int").alias("iter"),
        *[F.round(F.col(c), 6).alias(c) for c in cols[1:]],
    )
    return hist, w


def logreg_score(
    df: DataFrame,
    feature_cols: list[str],
    weights: list[float],
    output_col: str = "score",
) -> DataFrame:
    """Apply trained weights as a map-only sigmoid projection — the
    classifier inference pass (quality gating, probe scoring). Pure
    column math, zero shuffles; composes with ``text.quantile_gate``
    for threshold selection."""
    if len(weights) != len(feature_cols) + 1:
        raise ValueError(
            f"weights must be [bias]+{len(feature_cols)} coefs, got {len(weights)}"
        )
    z = F.lit(weights[0])
    for j, c in enumerate(feature_cols):
        z = z + F.lit(weights[j + 1]) * F.col(c)
    return df.withColumn(output_col, F.round(_sigmoid(z), 6))


def linreg_simple(
    df: DataFrame,
    x_col: str,
    y_col: str,
    quant: int = 1_000_000,
) -> DataFrame:
    """Closed-form simple linear regression (slope / intercept / r²) in
    ONE aggregate over fixed-point sums — the trend-fit primitive
    (reference ``validators/timeseries/trend.py`` fits on driver
    arrays; here the five sufficient statistics Σx Σy Σxy Σx² Σy² are
    exact quantized longs, so the fit is bit-identical cross-engine).

    slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²), intercept = ȳ − slope·x̄,
    r² = slope² · Sxx / Syy. Returns one row
    (n, slope, intercept, r2) rounded to 6 decimals.

    Scale: one scan, map-side partials, 5 longs to the driver. The
    quantized cross-sums bound: |x·y|·quant²·n must stay < 2^63 (the
    per-row term is (x·quant)·(y·quant)) — at the default quant=1e6,
    unit-scale data overflows around ~9M rows, so at corpus scale
    RESCALE the features toward O(1) and LOWER quant (the lineitem
    entry uses quant=1e3 on decascaled features: exact to 1e-3 feature
    resolution with ~1.7e12-row headroom). Overflow raises under ANSI
    mode rather than corrupting silently.
    """
    qx = F.round(F.col(x_col).cast("double") * quant).cast("long")
    qy = F.round(F.col(y_col).cast("double") * quant).cast("long")
    g = (
        df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
        .select(qx.alias("qx"), qy.alias("qy"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("qx").alias("sx"),
            F.sum("qy").alias("sy"),
            F.sum(F.col("qx") * F.col("qy")).alias("sxy"),
            F.sum(F.col("qx") * F.col("qx")).alias("sxx"),
            F.sum(F.col("qy") * F.col("qy")).alias("syy"),
        )
    )
    n = F.col("n").cast("double")
    q = F.lit(float(quant))
    sx, sy = F.col("sx") / q, F.col("sy") / q
    sxy = F.col("sxy") / q / q
    sxx = F.col("sxx") / q / q
    syy = F.col("syy") / q / q
    cov_n = n * sxy - sx * sy
    var_n = n * sxx - sx * sx
    vary_n = n * syy - sy * sy
    # try_divide: constant-x (or empty) input reports NULL under ANSI
    # instead of crashing; oracle mirrors with NULLIF denominators
    slope = F.try_divide(cov_n, var_n)
    intercept = F.try_divide(sy - slope * sx, n)
    r2 = F.try_divide(cov_n * cov_n, var_n * vary_n)
    return g.select(
        F.col("n").cast("long").alias("n"),
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
        F.round(r2, 6).alias("r2"),
    )


def classification_metrics(
    df: DataFrame,
    score_col: str,
    label_col: str,
    threshold: float = 0.5,
) -> DataFrame:
    """Confusion matrix + precision/recall/F1/accuracy at a threshold —
    ONE aggregate of four exact long counters (reference
    redos/ml/base.py ReDoSModelMetrics computes these on driver arrays).
    Null scores/labels are excluded (counted in ``n_scored`` vs the
    caller's row count if they care). Map-side partials, O(1) result."""
    y = F.col(label_col).cast("double")
    pred = (F.col(score_col) >= threshold).cast("int")
    # restrict to the binary label domain: a stray label=2 would count in
    # n_scored but in NO confusion cell (silently deflating accuracy)
    ok = F.col(score_col).isNotNull() & y.isin(0.0, 1.0)
    g = df.filter(ok).agg(
        F.count(F.lit(1)).alias("n_scored"),
        F.sum(((y == 1.0) & (pred == 1)).cast("long")).alias("tp"),
        F.sum(((y == 0.0) & (pred == 1)).cast("long")).alias("fp"),
        F.sum(((y == 1.0) & (pred == 0)).cast("long")).alias("fn"),
        F.sum(((y == 0.0) & (pred == 0)).cast("long")).alias("tn"),
    )
    # try_divide: a degenerate threshold (zero predicted positives / no
    # actual positives) reports NULL, not an ANSI divide-by-zero crash
    prec = F.try_divide(F.col("tp"), F.col("tp") + F.col("fp"))
    rec = F.try_divide(F.col("tp"), F.col("tp") + F.col("fn"))
    return g.select(
        "n_scored",
        "tp",
        "fp",
        "fn",
        "tn",
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(F.try_divide(2 * prec * rec, prec + rec), 6).alias("f1"),
        F.round(
            F.try_divide(F.col("tp") + F.col("tn"), F.col("n_scored")), 6
        ).alias("accuracy"),
    )


def calibration_bins(
    df: DataFrame,
    score_col: str,
    label_col: str,
    bins: int = 10,
) -> DataFrame:
    """Reliability diagram: equal-width score bins with mean predicted
    score vs observed positive rate — the calibration audit behind "is
    0.9 really 90%?" (quality-classifier gating trusts the score as a
    probability; an uncalibrated one silently shifts the corpus mix).

    Exactness: scores quantize to 1e-6 longs for the in-bin mean, labels
    sum as longs — bin rows are deterministic integer arithmetic, so the
    whole diagram hash-matches cross-engine. One groupBy to a
    ``bins``-sized table; no window, no sort.

    Returns (bin, bin_lo, n, mean_score, frac_positive, gap)."""
    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("double")
    b = F.greatest(
        F.least(F.floor(s * bins).cast("long"), F.lit(bins - 1)), F.lit(0)
    )  # out-of-range scores clamp to the edge bins instead of minting bin -3
    g = (
        df.filter(s.isNotNull() & y.isin(0.0, 1.0))
        .select(
            b.alias("bin"),
            F.round(s * 1_000_000).cast("long").alias("__q"),
            y.cast("long").alias("__y"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("__q").alias("__sq"),
            F.sum("__y").alias("__sy"),
        )
    )
    mean_score = F.col("__sq") / 1_000_000.0 / F.col("n")
    frac_pos = F.col("__sy") / F.col("n")
    return g.select(
        "bin",
        F.round(F.col("bin") / bins, 6).alias("bin_lo"),
        "n",
        F.round(mean_score, 6).alias("mean_score"),
        F.round(frac_pos, 6).alias("frac_positive"),
        F.round(mean_score - frac_pos, 6).alias("gap"),
    )


def auc_binned(
    df: DataFrame,
    score_col: str,
    label_col: str,
    quant: int = 1_000_000,
) -> DataFrame:
    """Exact ROC-AUC WITHOUT a global sort — the rank-sum (Mann-Whitney)
    statistic computed from a quantized score histogram: AUC =
    Σ_bins pos_in · (neg_below + neg_in/2) / (P·N), ties (same quantized
    score) credited the canonical half. Scores must live in [0, 1]
    (sigmoid / quality scores), so the histogram is bounded at quant+1
    rows regardless of corpus size: corpus-scale work is ONE groupBy;
    the cumulative window runs over histogram rows only — the same
    histogram-not-sort move as export.curriculum_order.

    Returns one row (n_pos, n_neg, auc)."""
    from pyspark.sql import Window

    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("double")
    g = (
        df.filter(s.isNotNull() & y.isin(0.0, 1.0))
        .select(F.round(s * quant).cast("long").alias("q"), y.cast("long").alias("__y"))
        .groupBy("q")
        .agg(
            F.sum("__y").alias("pos"),
            (F.count(F.lit(1)) - F.sum("__y")).alias("neg"),
        )
    )
    w = Window.orderBy("q").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    contrib = (
        g.withColumn("cum_neg", F.sum("neg").over(w))
        .select(
            F.sum("pos").alias("n_pos"),
            F.sum("neg").alias("n_neg"),
            # 2× the U statistic stays integral: 2·neg_below + neg_in
            F.sum(F.col("pos") * (2 * (F.col("cum_neg") - F.col("neg")) + F.col("neg"))).alias(
                "__u2"
            ),
        )
    )
    return contrib.select(
        F.col("n_pos").cast("long").alias("n_pos"),
        F.col("n_neg").cast("long").alias("n_neg"),
        # single-class input → NULL auc (undefined), not an ANSI crash
        F.round(
            F.try_divide(F.col("__u2") / 2.0, F.col("n_pos") * F.col("n_neg")), 6
        ).alias("auc"),
    )


def threshold_sweep(
    df: DataFrame,
    score_col: str,
    label_col: str,
    thresholds: list[float] | None = None,
) -> DataFrame:
    """Precision/recall curve over a threshold grid in ONE fused
    aggregate — the operating-point picker (which gate keeps 90% of the
    good documents?). Every threshold's confusion counters are
    conditional sums in the SAME ``agg`` (the fused-suite executor move
    applied to model evaluation): one scan for the whole curve, however
    many thresholds. Exact long counters; NULL metrics on degenerate
    rows (try_divide), never a crash.

    Returns (threshold, tp, fp, fn, tn, precision, recall, f1) ordered
    by threshold."""
    ts = sorted(thresholds if thresholds is not None else [i / 10 for i in range(1, 10)])
    if not ts:
        raise ValueError("thresholds must be non-empty")
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("double")
    base = df.filter(s.isNotNull() & y.isin(0.0, 1.0))
    aggs = []
    for i, t in enumerate(ts):
        pred = s >= t
        aggs += [
            F.sum(((y == 1.0) & pred).cast("long")).alias(f"tp{i}"),
            F.sum(((y == 0.0) & pred).cast("long")).alias(f"fp{i}"),
            F.sum(((y == 1.0) & ~pred).cast("long")).alias(f"fn{i}"),
            F.sum(((y == 0.0) & ~pred).cast("long")).alias(f"tn{i}"),
        ]
    one = base.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(float(t)).alias("threshold"),
                F.col(f"tp{i}").alias("tp"),
                F.col(f"fp{i}").alias("fp"),
                F.col(f"fn{i}").alias("fn"),
                F.col(f"tn{i}").alias("tn"),
            )
            for i, t in enumerate(ts)
        ]
    )
    e = one.select(F.explode(rows).alias("r")).select("r.*")
    prec = F.try_divide(F.col("tp"), F.col("tp") + F.col("fp"))
    rec = F.try_divide(F.col("tp"), F.col("tp") + F.col("fn"))
    return e.select(
        "threshold",
        "tp",
        "fp",
        "fn",
        "tn",
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(F.try_divide(2 * prec * rec, prec + rec), 6).alias("f1"),
    )


def linreg_grouped(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_col: str,
    quant: int = 1_000_000,
) -> DataFrame:
    """Per-group simple linear regression — the per-series trend fit at
    scale (quality drift per source, value trend per entity): the same
    five fixed-point sufficient statistics as :func:`linreg_simple`, in
    ONE ``groupBy(group)`` — a million series cost one shuffle keyed on
    the group, never a loop, never a per-series driver fit (reference
    ``validators/timeseries/trend.py`` fits one driver array per call).

    Returns (group, n, slope, intercept, r2) — NULL fit columns for
    degenerate groups (constant x, single row), 6dp-rounded, exact-long
    sums so every group's fit is deterministic cross-engine."""
    qx = F.round(F.col(x_col).cast("double") * quant).cast("long")
    qy = F.round(F.col(y_col).cast("double") * quant).cast("long")
    grp = F.coalesce(F.col(group_col).cast("string"), F.lit("__null__"))
    g = (
        df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
        .select(grp.alias("group"), qx.alias("qx"), qy.alias("qy"))
        .groupBy("group")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("qx").alias("sx"),
            F.sum("qy").alias("sy"),
            F.sum(F.col("qx") * F.col("qy")).alias("sxy"),
            F.sum(F.col("qx") * F.col("qx")).alias("sxx"),
            F.sum(F.col("qy") * F.col("qy")).alias("syy"),
        )
    )
    n = F.col("n").cast("double")
    q = F.lit(float(quant))
    sx, sy = F.col("sx") / q, F.col("sy") / q
    sxy = F.col("sxy") / q / q
    sxx = F.col("sxx") / q / q
    syy = F.col("syy") / q / q
    cov_n = n * sxy - sx * sy
    var_n = n * sxx - sx * sx
    vary_n = n * syy - sy * sy
    slope = F.try_divide(cov_n, var_n)
    intercept = F.try_divide(sy - slope * sx, n)
    r2 = F.try_divide(cov_n * cov_n, var_n * vary_n)
    return g.select(
        "group",
        F.col("n").cast("long").alias("n"),
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
        F.round(r2, 6).alias("r2"),
    )


def standardize(
    df: DataFrame,
    cols: list[str],
    quant: int = 1_000_000,
) -> DataFrame:
    """Z-score feature standardization in ONE statistics pass: per-column
    mean/std from exact quantized sums (population σ, the GD-conditioning
    convention), then a map-only ``(x − μ)/σ`` projection — the
    preconditioning step in front of :func:`logreg_train` / ``kmeans`` /
    Mahalanobis-style distances so one wide-range column can't dominate.

    Constant columns (σ = 0) standardize to NULL (try_divide), surfacing
    the do-not-fit-on-this signal instead of fabricating zeros. Stats
    are computed once and inlined as literals — the output plan adds NO
    aggregate, join, or shuffle to the consumer's plan.

    Bound: the Σq² term is |x|²·quant²·n < 2^63 — lower ``quant`` for
    wide-range columns or huge corpora (ANSI raises on overflow).

    Returns df with each col replaced by its standardized value."""
    if not cols:
        raise ValueError("cols must be non-empty")
    aggs = []
    for c in cols:
        q = F.round(F.col(c).cast("double") * quant).cast("long")
        aggs += [
            F.count(F.col(c)).alias(f"n_{c}"),
            F.sum(q).alias(f"s_{c}"),
            F.sum(q * q).alias(f"ss_{c}"),
        ]
    row = df.agg(*aggs).collect()[0]
    out = df
    for c in cols:
        n = row[f"n_{c}"]
        if not n:
            out = out.withColumn(c, F.lit(None).cast("double"))
            continue
        s = float(row[f"s_{c}"]) / float(quant)
        ss = float(row[f"ss_{c}"]) / float(quant) / float(quant)
        mean = s / n
        var = ss / n - mean * mean
        std = var**0.5 if var > 0 else 0.0
        out = out.withColumn(
            c, F.try_divide(F.col(c).cast("double") - F.lit(mean), F.lit(std))
        )
    return out


def auc_grouped(
    df: DataFrame,
    score_col: str,
    label_col: str,
    group_col: str,
    quant: int = 1_000_000,
) -> DataFrame:
    """Per-SEGMENT ROC-AUC — the fairness / segment-evaluation gate (a
    classifier with corpus AUC 0.8 that scores 0.5 on one language is a
    mixing bug, not a model): the same histogram Mann-Whitney statistic
    as :func:`auc_binned`, computed for EVERY group in one pass — one
    groupBy(group, score_q) histogram, cumulative window partitioned BY
    GROUP over histogram rows, one final group aggregate. N segments
    cost the same three stages as one.

    Single-class segments report NULL auc (undefined, loudly — same
    contract as auc_binned). Doubled-U stays integral until the final
    division. Returns (group, n_pos, n_neg, auc)."""
    from pyspark.sql import Window

    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("double")
    grp = F.coalesce(F.col(group_col).cast("string"), F.lit("__null__"))
    g = (
        df.filter(s.isNotNull() & y.isin(0.0, 1.0))
        .select(
            grp.alias("group"),
            F.round(s * quant).cast("long").alias("q"),
            y.cast("long").alias("__y"),
        )
        .groupBy("group", "q")
        .agg(
            F.sum("__y").alias("pos"),
            (F.count(F.lit(1)) - F.sum("__y")).alias("neg"),
        )
    )
    w = (
        Window.partitionBy("group")
        .orderBy("q")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        g.withColumn("cum_neg", F.sum("neg").over(w))
        .groupBy("group")
        .agg(
            F.sum("pos").cast("long").alias("n_pos"),
            F.sum("neg").cast("long").alias("n_neg"),
            F.sum(
                F.col("pos") * (2 * (F.col("cum_neg") - F.col("neg")) + F.col("neg"))
            ).alias("__u2"),
        )
    )
    return out.select(
        "group",
        "n_pos",
        "n_neg",
        F.round(
            F.try_divide(F.col("__u2") / 2.0, F.col("n_pos") * F.col("n_neg")), 6
        ).alias("auc"),
    )


def calibration_grouped(
    df: DataFrame,
    score_col: str,
    label_col: str,
    group_col: str,
    bins: int = 10,
) -> DataFrame:
    """Per-SEGMENT reliability diagram — completes the segment-eval trio
    (psi_grouped drift, auc_grouped separation, this calibration): a
    score can be calibrated globally while wildly over-confident on one
    source. One groupBy(group, bin) of quantized-long sums; output is
    (groups × bins)-sized, nothing corpus-scale after the aggregate.

    Returns (group, bin, bin_lo, n, mean_score, frac_positive, gap)."""
    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("double")
    grp = F.coalesce(F.col(group_col).cast("string"), F.lit("__null__"))
    b = F.greatest(
        F.least(F.floor(s * bins).cast("long"), F.lit(bins - 1)), F.lit(0)
    )
    g = (
        df.filter(s.isNotNull() & y.isin(0.0, 1.0))
        .select(
            grp.alias("group"),
            b.alias("bin"),
            F.round(s * 1_000_000).cast("long").alias("__q"),
            y.cast("long").alias("__y"),
        )
        .groupBy("group", "bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("__q").alias("__sq"),
            F.sum("__y").alias("__sy"),
        )
    )
    mean_score = F.col("__sq") / 1_000_000.0 / F.col("n")
    frac_pos = F.col("__sy") / F.col("n")
    return g.select(
        "group",
        "bin",
        F.round(F.col("bin") / bins, 6).alias("bin_lo"),
        "n",
        F.round(mean_score, 6).alias("mean_score"),
        F.round(frac_pos, 6).alias("frac_positive"),
        F.round(mean_score - frac_pos, 6).alias("gap"),
    )


def threshold_sweep_grouped(
    df: DataFrame,
    score_col: str,
    label_col: str,
    group_col: str,
    thresholds: list[float] | None = None,
) -> DataFrame:
    """Per-SEGMENT precision/recall curve — the last ungrouped member of
    the eval family joins psi/auc/calibration_grouped: the operating
    point that keeps 90% of good documents globally can silently drop a
    minority language to 40% recall; this surfaces every segment's whole
    curve from ONE ``groupBy(group)`` whose conditional confusion sums
    cover every threshold (the :func:`threshold_sweep` fused-agg design
    with group in the key — N segments × T thresholds cost one scan).

    Per-group rows are bit-identical to :func:`threshold_sweep` on that
    segment (exact long counters; NULL metrics on degenerate groups via
    try_divide). Returns (group, threshold, tp, fp, fn, tn, precision,
    recall, f1)."""
    ts = sorted(thresholds if thresholds is not None else [i / 10 for i in range(1, 10)])
    if not ts:
        raise ValueError("thresholds must be non-empty")
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("double")
    grp = F.coalesce(F.col(group_col).cast("string"), F.lit("__null__"))
    base = df.filter(s.isNotNull() & y.isin(0.0, 1.0)).select(
        grp.alias("group"), s.alias("__s"), y.alias("__y")
    )
    sc, yc = F.col("__s"), F.col("__y")
    aggs = []
    for i, t in enumerate(ts):
        pred = sc >= t
        aggs += [
            F.sum(((yc == 1.0) & pred).cast("long")).alias(f"tp{i}"),
            F.sum(((yc == 0.0) & pred).cast("long")).alias(f"fp{i}"),
            F.sum(((yc == 1.0) & ~pred).cast("long")).alias(f"fn{i}"),
            F.sum(((yc == 0.0) & ~pred).cast("long")).alias(f"tn{i}"),
        ]
    one = base.groupBy("group").agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(float(t)).alias("threshold"),
                F.col(f"tp{i}").alias("tp"),
                F.col(f"fp{i}").alias("fp"),
                F.col(f"fn{i}").alias("fn"),
                F.col(f"tn{i}").alias("tn"),
            )
            for i, t in enumerate(ts)
        ]
    )
    e = one.select("group", F.explode(rows).alias("r")).select("group", "r.*")
    prec = F.try_divide(F.col("tp"), F.col("tp") + F.col("fp"))
    rec = F.try_divide(F.col("tp"), F.col("tp") + F.col("fn"))
    return e.select(
        "group",
        "threshold",
        "tp",
        "fp",
        "fn",
        "tn",
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(F.try_divide(2 * prec * rec, prec + rec), 6).alias("f1"),
    )
