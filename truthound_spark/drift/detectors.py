"""Drift detectors: two-sample statistics between baseline and current.

Reference: src/truthound/drift/compare.py:30 ``compare(baseline, current,
method, threshold)``; detectors drift/detectors.py (KSTest :82, PSI :175,
ChiSquare :281, JensenShannon :384, KLDivergence :503, Wasserstein :605).

Spark-first strategy (SURVEY §2.9): the reference collects both columns to
the driver; we never do. Each detector reduces both sides to a SMALL
distributional summary with distributed aggregates —
  * numeric: shared histogram bin counts (one groupBy per side), or exact
    sorted ECDF merge for KS at oracle scale
  * categorical: per-category counts
— and computes the scalar statistic from those summaries on the driver.
Bin/count summaries are O(bins), independent of row count: 100 TB safe.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EPS = 1e-10


@dataclass
class DriftResult:
    method: str
    statistic: float
    threshold: float
    drifted: bool
    details: dict[str, Any]

    def to_dict(self) -> dict[str, Any]:
        return {
            "method": self.method,
            "statistic": self.statistic,
            "threshold": self.threshold,
            "drifted": self.drifted,
            "details": self.details,
        }


# ---------------------------------------------------------------------------
# histogram helper: shared fixed bins from the baseline's min/max
# ---------------------------------------------------------------------------
def _hist_counts(df: DataFrame, column: str, lo: float, hi: float, bins: int) -> list[int]:
    """Per-bin counts with clamped fixed-width bins — one distributed agg."""
    width = (hi - lo) / bins if hi > lo else 1.0
    # floor() already yields long; casting to int would wrap (or raise
    # under ANSI) for outliers whose scaled offset exceeds 2^31
    b = F.least(
        F.greatest(F.floor((F.col(column) - lo) / width), F.lit(0)),
        F.lit(bins - 1),
    )
    rows = (
        df.filter(F.col(column).isNotNull())
        .groupBy(b.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    counts = [0] * bins
    for r in rows:
        counts[int(r["bin"])] = int(r["n"])
    return counts


def _numeric_range(df: DataFrame, column: str) -> tuple[float, float] | None:
    """(lo, hi) of the column, or None when it is empty / all-null."""
    row = df.agg(F.min(column).alias("lo"), F.max(column).alias("hi")).collect()[0]
    if row["lo"] is None or row["hi"] is None:
        return None
    return float(row["lo"]), float(row["hi"])


def _freqs(counts: list[int]) -> list[float]:
    total = sum(counts)
    return [(c / total) if total else 0.0 for c in counts]


# ---------------------------------------------------------------------------
# detectors
# ---------------------------------------------------------------------------
def psi(baseline: DataFrame, current: DataFrame, column: str, bins: int = 10, threshold: float = 0.1) -> DriftResult:
    """Population Stability Index, 10-bin (reference: detectors.py:175).

    Bin edges from the baseline's range; Σ (p−q)·ln(p/q) with ε-smoothing.
    """
    rng = _numeric_range(baseline, column)
    if rng is None:
        return DriftResult("psi", 0.0, threshold, False, {"bins": bins, "empty_baseline": True})
    lo, hi = rng
    p = _freqs(_hist_counts(baseline, column, lo, hi, bins))
    q = _freqs(_hist_counts(current, column, lo, hi, bins))
    stat = sum((pi - qi) * math.log((pi + EPS) / (qi + EPS)) for pi, qi in zip(p, q))
    return DriftResult("psi", stat, threshold, stat > threshold, {"bins": bins, "baseline": p, "current": q})


def ks_test(
    baseline: DataFrame,
    current: DataFrame,
    column: str,
    alpha: float = 0.05,
    grid: int = 0,
) -> DriftResult:
    """Kolmogorov–Smirnov sup|F1−F2| (reference: detectors.py:82, asymptotic
    p-value :162).

    grid=0 → EXACT via distributed ECDF merge: union of distinct values,
    per-side cumulative counts with a window — the sup is over all jump
    points, never collecting raw rows (only the per-value ECDF table
    aggregates, and the max reduces to a scalar).
    grid>0 → quantile-grid approximation (mergeable percentile_approx
    sketch; the 100 TB path, matching the reference's t-digest variant
    validators/memory/streaming_ecdf.py).
    """
    if grid:
        probs = [i / grid for i in range(1, grid)]
        nb = baseline.filter(F.col(column).isNotNull()).count()
        nc = current.filter(F.col(column).isNotNull()).count()
        if nb == 0 or nc == 0:
            return DriftResult("ks", 0.0, float("inf"), False, {"n_baseline": nb, "n_current": nc, "empty_side": True})
        qb = baseline.agg(F.percentile_approx(column, probs, 10000).alias("q")).collect()[0]["q"]
        qc = current.agg(F.percentile_approx(column, probs, 10000).alias("q")).collect()[0]["q"]
        # evaluate each side's ECDF on the union grid via counts <= x
        pts = sorted(set(qb) | set(qc))
        conds_b = [F.sum((F.col(column) <= x).cast("long")).alias(f"b{i}") for i, x in enumerate(pts)]
        conds_c = [F.sum((F.col(column) <= x).cast("long")).alias(f"c{i}") for i, x in enumerate(pts)]
        rb = baseline.agg(*conds_b).collect()[0]
        rc = current.agg(*conds_c).collect()[0]
        stat = max(abs(rb[f"b{i}"] / nb - rc[f"c{i}"] / nc) for i in range(len(pts)))
    else:
        b = baseline.select(F.col(column).alias("v")).filter(F.col("v").isNotNull()).withColumn("s", F.lit(0))
        c = current.select(F.col(column).alias("v")).filter(F.col("v").isNotNull()).withColumn("s", F.lit(1))
        nb = b.count()
        nc = c.count()
        if nb == 0 or nc == 0:
            return DriftResult("ks", 0.0, float("inf"), False, {"n_baseline": nb, "n_current": nc, "empty_side": True})
        from pyspark.sql import Window

        u = b.unionAll(c).groupBy("v").agg(
            F.sum(F.when(F.col("s") == 0, 1).otherwise(0)).alias("nb"),
            F.sum(F.when(F.col("s") == 1, 1).otherwise(0)).alias("nc"),
        )
        w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ecdf = u.select(
            (F.sum("nb").over(w) / nb).alias("fb"),
            (F.sum("nc").over(w) / nc).alias("fc"),
        )
        stat = ecdf.agg(F.max(F.abs(F.col("fb") - F.col("fc"))).alias("d")).collect()[0]["d"]
    # asymptotic critical value (reference detectors.py:162)
    c_alpha = math.sqrt(-0.5 * math.log(alpha / 2))
    crit = c_alpha * math.sqrt((nb + nc) / (nb * nc)) if nb and nc else float("inf")
    return DriftResult("ks", float(stat), crit, float(stat) > crit, {"n_baseline": nb, "n_current": nc, "alpha": alpha})


def chi_square_drift(
    baseline: DataFrame,
    current: DataFrame,
    column: str,
    threshold_pvalue: float = 0.05,
    max_categories: int = 1000,
) -> DriftResult:
    """Categorical χ² homogeneity test (reference: detectors.py:281).

    One union + groupBy builds the per-category count table distributed;
    only the top ``max_categories`` categories (by combined count, stable
    string tie-break) reach the driver — the tail is folded into a single
    "other" bucket via two subtraction scalars, so a high-cardinality
    column mistyped as categorical (user_id) can never OOM the driver.
    Below the cap the statistic is bit-identical to the uncapped form.
    """
    u = (
        baseline.select(F.col(column).alias("v")).withColumn("s", F.lit(0))
        .unionAll(current.select(F.col(column).alias("v")).withColumn("s", F.lit(1)))
        .groupBy("v")
        .agg(
            F.sum(F.when(F.col("s") == 0, 1).otherwise(0)).alias("nb"),
            F.sum(F.when(F.col("s") == 1, 1).otherwise(0)).alias("nc"),
        )
    )
    top = (
        u.orderBy(F.desc(F.col("nb") + F.col("nc")), F.col("v").cast("string"))
        .limit(max_categories + 1)
        .collect()
    )
    capped = len(top) > max_categories
    top = top[:max_categories]
    bc = {r["v"]: int(r["nb"]) for r in top}
    cc = {r["v"]: int(r["nc"]) for r in top}
    nb = int(baseline.count())
    nc = int(current.count())
    pairs = [(bc[cat], cc[cat]) for cat in bc]
    if capped:
        pairs.append((nb - sum(bc.values()), nc - sum(cc.values())))
    stat = 0.0
    for o_b, o_c in pairs:
        tot = o_b + o_c
        e_b = tot * nb / (nb + nc)
        e_c = tot * nc / (nb + nc)
        if e_b > 0:
            stat += (o_b - e_b) ** 2 / e_b
        if e_c > 0:
            stat += (o_c - e_c) ** 2 / e_c
    dof = max(len(pairs) - 1, 1)
    pvalue = _chi2_sf(stat, dof)
    return DriftResult(
        "chi_square",
        stat,
        threshold_pvalue,
        pvalue < threshold_pvalue,
        {"dof": dof, "p_value": pvalue, "capped": capped, "max_categories": max_categories},
    )


def _chi2_sf(x: float, k: int) -> float:
    """Chi-square survival function via Wilson–Hilferty normal approx."""
    if x <= 0:
        return 1.0
    z = ((x / k) ** (1.0 / 3.0) - (1 - 2.0 / (9 * k))) / math.sqrt(2.0 / (9 * k))
    return 0.5 * math.erfc(z / math.sqrt(2))


def js_divergence(baseline: DataFrame, current: DataFrame, column: str, bins: int = 10, threshold: float = 0.1) -> DriftResult:
    """Jensen–Shannon divergence over shared histogram (reference: detectors.py:384)."""
    rng = _numeric_range(baseline, column)
    if rng is None:
        return DriftResult("js_divergence", 0.0, threshold, False, {"bins": bins, "empty_baseline": True})
    lo, hi = rng
    p = _freqs(_hist_counts(baseline, column, lo, hi, bins))
    q = _freqs(_hist_counts(current, column, lo, hi, bins))
    m = [(pi + qi) / 2 for pi, qi in zip(p, q)]
    def kl(a, b):
        return sum(ai * math.log((ai + EPS) / (bi + EPS)) for ai, bi in zip(a, b))
    stat = 0.5 * kl(p, m) + 0.5 * kl(q, m)
    return DriftResult("js_divergence", stat, threshold, stat > threshold, {"bins": bins})


def kl_divergence(baseline: DataFrame, current: DataFrame, column: str, bins: int = 10, threshold: float = 0.5) -> DriftResult:
    """KL(baseline ‖ current) over shared histogram (reference: detectors.py:503)."""
    rng = _numeric_range(baseline, column)
    if rng is None:
        return DriftResult("kl_divergence", 0.0, threshold, False, {"bins": bins, "empty_baseline": True})
    lo, hi = rng
    p = _freqs(_hist_counts(baseline, column, lo, hi, bins))
    q = _freqs(_hist_counts(current, column, lo, hi, bins))
    stat = sum(pi * math.log((pi + EPS) / (qi + EPS)) for pi, qi in zip(p, q))
    return DriftResult("kl_divergence", stat, threshold, stat > threshold, {"bins": bins})


def wasserstein(baseline: DataFrame, current: DataFrame, column: str, bins: int = 100, threshold: float | None = None) -> DriftResult:
    """Earth-mover distance via histogram CDF difference
    (reference: detectors.py:605; quantile-grid approximation per SURVEY §2.9)."""
    rng_b = _numeric_range(baseline, column)
    rng_c = _numeric_range(current, column)
    if rng_b is None or rng_c is None:
        return DriftResult(
            "wasserstein", 0.0, threshold or 0.0, False, {"bins": bins, "empty_side": True}
        )
    lo, hi = min(rng_b[0], rng_c[0]), max(rng_b[1], rng_c[1])
    p = _freqs(_hist_counts(baseline, column, lo, hi, bins))
    q = _freqs(_hist_counts(current, column, lo, hi, bins))
    width = (hi - lo) / bins if hi > lo else 1.0
    cdf_p = cdf_q = 0.0
    emd = 0.0
    for pi, qi in zip(p, q):
        cdf_p += pi
        cdf_q += qi
        emd += abs(cdf_p - cdf_q) * width
    thr = threshold if threshold is not None else 0.1 * (hi - lo)
    return DriftResult("wasserstein", emd, thr, emd > thr, {"bins": bins, "range": [lo, hi]})


def mean_drift(baseline: DataFrame, current: DataFrame, column: str, threshold: float = 0.1) -> DriftResult:
    """Relative mean change (reference: drift/numeric.py:17)."""
    mb = baseline.agg(F.mean(column).alias("m")).collect()[0]["m"]
    mc = current.agg(F.mean(column).alias("m")).collect()[0]["m"]
    rel = abs(mc - mb) / (abs(mb) + EPS)
    return DriftResult("mean_drift", rel, threshold, rel > threshold, {"baseline_mean": mb, "current_mean": mc})


def variance_drift(baseline: DataFrame, current: DataFrame, column: str, threshold: float = 0.2) -> DriftResult:
    """Relative variance change (reference: drift/numeric.py:117)."""
    vb = baseline.agg(F.variance(column).alias("v")).collect()[0]["v"]
    vc = current.agg(F.variance(column).alias("v")).collect()[0]["v"]
    rel = abs(vc - vb) / (abs(vb) + EPS)
    return DriftResult("variance_drift", rel, threshold, rel > threshold, {"baseline_var": vb, "current_var": vc})


_METHODS = {
    "psi": psi,
    "ks": ks_test,
    "chi_square": chi_square_drift,
    "js": js_divergence,
    "kl": kl_divergence,
    "wasserstein": wasserstein,
    "mean": mean_drift,
    "variance": variance_drift,
}


def compare(
    baseline: DataFrame,
    current: DataFrame,
    columns: list[str] | None = None,
    method: str = "psi",
    **kwargs: Any,
) -> dict[str, DriftResult]:
    """Multi-column drift sweep (reference API: drift/compare.py:30;
    FeatureDriftValidator drift/multi_feature.py:18)."""
    fn = _METHODS[method]
    if columns is None:
        from truthound_spark.core.base import NUMERIC_TYPES, columns_of_type

        columns = [c for c in columns_of_type(baseline, NUMERIC_TYPES) if c in current.columns]
    return {c: fn(baseline, current, c, **kwargs) for c in columns}


def cramer_von_mises(
    baseline: DataFrame,
    current: DataFrame,
    column: str,
    threshold: float = 0.461,
) -> DriftResult:
    """Two-sample Cramér–von Mises criterion (reference: detectors.py:709).

    ECDF form: T = n·m/(n+m)² · Σ_x g(x)·(F_b(x) − F_c(x))², summed over
    the pooled sample (g(x) = multiplicity of the distinct value x). This
    definition is equivalent to Anderson's rank formula on continuous data
    and — unlike the rank form, whose (4nm−1)/(6(n+m)) centering assumes
    no ties — is deterministic AND exactly 0 for identical samples under
    arbitrary ties. One groupBy + one cumulative sort-window over DISTINCT
    values; two aggregate scalars to the driver.
    threshold 0.461 ≈ 5% critical value of the limiting distribution.

    Scale note: the global cumulative window funnels the distinct values
    through one partition — exact CvM is an oracle-scale tool (like exact
    KS). At 100 TB use the sketch-ECDF path (``ks_test(grid=...)`` /
    StreamingKSValidator); a CvM analogue over the same quantile grid
    bounds the statistic with O(grid) work.
    """
    from pyspark.sql import Window

    b = baseline.select(F.col(column).alias("v")).filter(F.col("v").isNotNull()).withColumn("side", F.lit(0))
    c = current.select(F.col(column).alias("v")).filter(F.col("v").isNotNull()).withColumn("side", F.lit(1))
    pooled = b.unionAll(c)
    grouped = pooled.groupBy("v").agg(
        F.sum(F.when(F.col("side") == 0, 1).otherwise(0)).alias("gb"),
        F.sum(F.when(F.col("side") == 1, 1).otherwise(0)).alias("gc"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = grouped.select(
        "gb",
        "gc",
        F.sum("gb").over(w).alias("cum_b"),
        F.sum("gc").over(w).alias("cum_c"),
    )
    agg = cum.agg(
        F.sum("gb").alias("n"),
        F.sum("gc").alias("m"),
        F.max("cum_b").alias("nb_total"),
        F.max("cum_c").alias("nc_total"),
        F.sum(
            (F.col("gb") + F.col("gc")) * F.pow(F.col("cum_b"), 2)
        ).alias("sbb"),
        F.sum(
            (F.col("gb") + F.col("gc")) * F.col("cum_b") * F.col("cum_c")
        ).alias("sbc"),
        F.sum(
            (F.col("gb") + F.col("gc")) * F.pow(F.col("cum_c"), 2)
        ).alias("scc"),
    ).collect()[0]
    n, m = int(agg["n"] or 0), int(agg["m"] or 0)
    if not n or not m:
        return DriftResult("cramer_von_mises", 0.0, threshold, False, {"n": n, "m": m})
    # Σ g·(cum_b/n − cum_c/m)² expanded into the three aggregate scalars
    ssq = (
        float(agg["sbb"]) / (n * n)
        - 2.0 * float(agg["sbc"]) / (n * m)
        + float(agg["scc"]) / (m * m)
    )
    u = ssq  # Σ g (Fb − Fc)²
    t = (n * m) / float((n + m) ** 2) * ssq
    return DriftResult(
        "cramer_von_mises", t, threshold, t > threshold, {"n": n, "m": m, "U": u}
    )


_METHODS["cramer_von_mises"] = cramer_von_mises


def psi_grouped(
    baseline: DataFrame,
    current: DataFrame,
    column: str,
    group_col: str,
    bins: int = 10,
    threshold: float = 0.1,
) -> DataFrame:
    """Per-SEGMENT Population Stability Index — drift per source / day /
    tenant in a CONSTANT number of passes (the grouped-one-pass design
    of profile_grouped/check_grouped applied to drift): a per-day loop
    over plain :func:`psi` costs 3 jobs × N segments; this costs one
    range aggregate + one histogram aggregate per side + group-sized
    joins, for ANY number of segments.

    Semantics per group mirror :func:`psi` exactly: bin edges from the
    group's BASELINE range, clamped fixed-width bins, Σ (p−q)·ln((p+ε)/
    (q+ε)). Per-group terms quantize to 1e-9 longs before the final sum
    (order-independent, engine-portable). Groups absent from the current
    side score against all-zero q (maximal drift — the disappeared-
    segment signal); groups absent from the BASELINE have no edges and
    are reported with NULL psi rather than invented bins.

    Returns (group, psi, drifted) — fully relational, nothing collected;
    the only shuffles are keyed on (group) or (group, bin).

    Plan shape (r8 audit): THREE scans total — one baseline range pass
    plus one tagged-union histogram pass. Both sides bin through ONE
    conditional-sum aggregate (no per-side relations full-joined back
    together — every lazy reuse re-executes its subtree), totals are
    group-partitioned window sums, and baseline-absent groups fold into
    the SAME aggregate as NULL-bin rows (has_edges flag) instead of a
    separate anti-join arm re-scanning the current side."""
    cells = _grouped_hist_cells(baseline, current, column, group_col, bins)
    p = F.coalesce(F.try_divide(F.col("pn"), F.col("__tp")), F.lit(0.0))
    q = F.coalesce(F.try_divide(F.col("qn"), F.col("__tq")), F.lit(0.0))
    term = F.round(
        (p - q) * F.log((p + F.lit(EPS)) / (q + F.lit(EPS))) * 1_000_000_000
    ).cast("long")
    agg = cells.groupBy("group").agg(
        F.sum(F.when(F.col("bin").isNotNull(), term)).alias("__t"),
        F.max(F.col("bin").isNotNull().cast("int")).alias("__has"),
    )
    psi_col = F.when(
        F.col("__has") == 1, F.round(F.col("__t") / 1_000_000_000, 6)
    )
    return agg.select(
        "group",
        psi_col.alias("psi"),
        F.when(F.col("__has") == 1, psi_col > threshold).alias("drifted"),
    )


def _grouped_hist_cells(
    baseline: DataFrame,
    current: DataFrame,
    column: str,
    group_col: str,
    bins: int,
) -> DataFrame:
    """Shared binning core for psi_grouped/js_grouped: (group, bin, pn,
    qn, __tp, __tq) cells from ONE tagged-union conditional aggregate
    over baseline-range edges. Rows of groups ABSENT from the baseline
    carry a NULL bin (no edges) — callers fold them into their final
    aggregate as the NULL-result signal. Totals __tp/__tq are
    group-partitioned window sums over non-null-bin cells."""
    from pyspark.sql import Window as _W

    grp = F.coalesce(F.col(group_col).cast("string"), F.lit("__null__"))
    rng = (
        baseline.select(grp.alias("group"), F.col(column).alias("__x"))
        .filter(F.col("__x").isNotNull())
        .groupBy("group")
        .agg(F.min("__x").alias("__lo"), F.max("__x").alias("__hi"))
    )
    tagged = (
        baseline.select(grp.alias("group"), F.col(column).alias("__x"))
        .filter(F.col("__x").isNotNull())
        .withColumn("__s", F.lit(0))
        .unionAll(
            current.select(grp.alias("group"), F.col(column).alias("__x"))
            .filter(F.col("__x").isNotNull())
            .withColumn("__s", F.lit(1))
        )
    )
    j = tagged.join(F.broadcast(rng), "group", "left")
    width = F.when(
        F.col("__hi") > F.col("__lo"), (F.col("__hi") - F.col("__lo")) / bins
    ).otherwise(F.lit(1.0))
    b = F.when(
        F.col("__lo").isNotNull(),
        F.least(
            F.greatest(F.floor((F.col("__x") - F.col("__lo")) / width), F.lit(0)),
            F.lit(bins - 1),
        ),
    )
    cells = j.groupBy("group", b.alias("bin")).agg(
        F.sum(F.when(F.col("__s") == 0, 1).otherwise(0)).alias("pn"),
        F.sum(F.when(F.col("__s") == 1, 1).otherwise(0)).alias("qn"),
    )
    wg = _W.partitionBy("group")
    return cells.withColumn(
        "__tp", F.sum(F.when(F.col("bin").isNotNull(), F.col("pn"))).over(wg)
    ).withColumn(
        "__tq", F.sum(F.when(F.col("bin").isNotNull(), F.col("qn"))).over(wg)
    )


def mean_variance_drift_grouped(
    baseline: DataFrame,
    current: DataFrame,
    column: str,
    group_col: str,
    mean_threshold: float = 0.1,
    var_threshold: float = 0.2,
    quant: int = 1000,
) -> DataFrame:
    """Per-segment mean/variance drift — the O(1)-state screen you run on
    EVERY segment before paying for a per-segment histogram
    (:func:`psi_grouped`): one moments aggregate per side, a group-sized
    join, relative-shift gates per group (same gates as
    :func:`mean_drift` / :func:`variance_drift`).

    Segments missing from either side report NULL shifts (no basis for a
    ratio) with drifted=NULL — the appeared/disappeared signal belongs
    to psi_grouped; this screen never invents a number. Baselines with
    zero mean/variance also yield NULL (relative shift undefined) rather
    than a division crash. Moments come from quantized-long sums
    (order-independent → engine-portable; |x|²·quant²·n must stay under
    2^63 — lower ``quant`` for wide-range columns). Returns (group,
    n_base, n_cur, mean_shift, var_shift, drifted)."""
    grp = F.coalesce(F.col(group_col).cast("string"), F.lit("__null__"))

    def moments(df: DataFrame, tag: str) -> DataFrame:
        q = F.round(F.col("__x") * quant).cast("long")
        g = (
            df.select(grp.alias("group"), F.col(column).cast("double").alias("__x"))
            .filter(F.col("__x").isNotNull())
            .select("group", q.alias("__q"))
            .groupBy("group")
            .agg(
                F.count(F.lit(1)).alias(f"n_{tag}"),
                F.sum("__q").alias("__s"),
                F.sum(F.col("__q") * F.col("__q")).alias("__ss"),
            )
        )
        mean = F.col("__s") / float(quant) / F.col(f"n_{tag}")
        ss = F.col("__ss") / float(quant) / float(quant) / F.col(f"n_{tag}")
        return g.select(
            "group",
            f"n_{tag}",
            mean.alias(f"mean_{tag}"),
            (ss - mean * mean).alias(f"var_{tag}"),
        )

    j = moments(baseline, "base").join(moments(current, "cur"), "group", "full")
    mean_shift = F.round(
        F.abs(
            F.try_divide(
                F.col("mean_cur") - F.col("mean_base"), F.abs(F.col("mean_base"))
            )
        ),
        6,
    )
    var_shift = F.round(
        F.abs(F.try_divide(F.col("var_cur") - F.col("var_base"), F.col("var_base"))),
        6,
    )
    return j.select(
        "group",
        F.coalesce("n_base", F.lit(0)).alias("n_base"),
        F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
        mean_shift.alias("mean_shift"),
        var_shift.alias("var_shift"),
        (
            (mean_shift > mean_threshold) | (var_shift > var_threshold)
        ).alias("drifted"),
    )


def js_grouped(
    baseline: DataFrame,
    current: DataFrame,
    column: str,
    group_col: str,
    bins: int = 10,
    threshold: float = 0.1,
) -> DataFrame:
    """Per-segment Jensen–Shannon divergence — :func:`psi_grouped`'s
    one-pass design applied to the JS statistic (reference runs
    drift/statistical.py detectors in a per-segment loop; here N
    segments cost one range aggregate + one histogram aggregate per
    side). Per-group semantics mirror :func:`js_divergence` exactly:
    bin edges from the group's BASELINE range, m = (p+q)/2, per-bin
    0.5·p·ln((p+ε)/(m+ε)) + 0.5·q·ln((q+ε)/(m+ε)) terms quantized to
    1e-9 longs before the order-independent sum. Groups absent from the
    baseline report NULL js (no edges); groups absent from the current
    score against all-zero q (ln 2-bounded maximal-divergence signal).
    Returns (group, js, drifted); shuffles keyed on (group) / (group,
    bin) only. Same three-scan single-consumption plan shape as
    :func:`psi_grouped` (shared :func:`_grouped_hist_cells` core)."""
    cells = _grouped_hist_cells(baseline, current, column, group_col, bins)
    p = F.coalesce(F.try_divide(F.col("pn"), F.col("__tp")), F.lit(0.0))
    q = F.coalesce(F.try_divide(F.col("qn"), F.col("__tq")), F.lit(0.0))
    m = (p + q) / 2
    term = F.round(
        (
            F.lit(0.5) * p * F.log((p + F.lit(EPS)) / (m + F.lit(EPS)))
            + F.lit(0.5) * q * F.log((q + F.lit(EPS)) / (m + F.lit(EPS)))
        )
        * 1_000_000_000
    ).cast("long")
    agg = cells.groupBy("group").agg(
        F.sum(F.when(F.col("bin").isNotNull(), term)).alias("__t"),
        F.max(F.col("bin").isNotNull().cast("int")).alias("__has"),
    )
    js_col = F.when(
        F.col("__has") == 1, F.round(F.col("__t") / 1_000_000_000, 6)
    )
    return agg.select(
        "group",
        js_col.alias("js"),
        F.when(F.col("__has") == 1, js_col > threshold).alias("drifted"),
    )


def ks_grouped(
    baseline: DataFrame,
    current: DataFrame,
    column: str,
    group_col: str,
    alpha: float = 0.05,
) -> DataFrame:
    """Per-segment EXACT Kolmogorov–Smirnov — :func:`ks_test`'s
    distributed ECDF merge with the cumulative window PARTITIONED BY
    GROUP (never the single-partition global window): every segment's
    sup|F_b − F_c| and asymptotic critical value in one pass. One-sided
    segments (n_base or n_cur = 0) report NULL ks/drifted — try_divide
    propagates the NULL; no invented statistic.

    Scale: the shuffle is keyed (group, value); each group's DISTINCT
    values sort within that group's partition — exact per-segment KS is
    a segment-scale tool (same contract as exact :func:`ks_test`); at
    extreme per-segment cardinality use the quantile-grid sketch path.
    Returns (group, n_base, n_cur, ks, crit, drifted)."""
    from pyspark.sql import Window

    grp = F.coalesce(F.col(group_col).cast("string"), F.lit("__null__"))
    b = (
        baseline.select(grp.alias("group"), F.col(column).alias("v"))
        .filter(F.col("v").isNotNull())
        .withColumn("s", F.lit(0))
    )
    c = (
        current.select(grp.alias("group"), F.col(column).alias("v"))
        .filter(F.col("v").isNotNull())
        .withColumn("s", F.lit(1))
    )
    u = (
        b.unionAll(c)
        .groupBy("group", "v")
        .agg(
            F.sum(F.when(F.col("s") == 0, 1).otherwise(0)).alias("gb"),
            F.sum(F.when(F.col("s") == 1, 1).otherwise(0)).alias("gc"),
        )
    )
    # cumulative AND total sums as two window specs over the SAME
    # (group)-partitioned sort — an aggregate re-joined to u would make
    # Spark recompute the whole union subtree (double scans; r8 plan
    # audit); same partition spec → one Exchange serves both windows
    w = (
        Window.partitionBy("group")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wg = Window.partitionBy("group")
    j = u.select(
        "group",
        F.sum("gb").over(w).alias("cb"),
        F.sum("gc").over(w).alias("cc"),
        F.sum("gb").over(wg).alias("n_base"),
        F.sum("gc").over(wg).alias("n_cur"),
    )
    return _ks_grouped_finish(j, alpha)


def ks_grouped_sketch(
    baseline: DataFrame,
    current: DataFrame,
    column: str,
    group_col: str,
    alpha: float = 0.05,
    grid: int = 200,
) -> DataFrame:
    """Per-segment KS over a per-group QUANTILE GRID — the 100 TB path
    :func:`ks_grouped`'s docstring defers to: exact grouped KS shuffles
    every DISTINCT (group, value) pair, which a high-cardinality segment
    can make arbitrarily wide; here each group's ECDFs are evaluated
    only at its own ``grid`` pooled percentile_approx points (the
    mergeable-sketch analogue of ``ks_test(grid=...)``), so the
    post-scan state is (segments × grid) regardless of cardinality.

    Mechanics: one pooled quantile aggregate per group (edges array),
    broadcast back; each row maps to its grid cell via a map-only
    O(grid) array filter (idx = #edges < x — no row×grid join blowup);
    (group, cell) counts, then the same group-partitioned cumulative/
    total windows and sup as the exact form, with the beyond-last-point
    bucket kept for the totals but excluded from the sup (it is not a
    grid point). The sketch sup lower-bounds the exact statistic with a
    gap that shrinks as 1/grid. One-sided segments report NULL.

    Scan count (audited r9): TWO scans of the tagged union — one for
    the per-group quantile edges (the fit), one for cell assignment
    (the replay). That is the honest linear price of a sketch pass +
    assignment pass; to pay only the replay scan per detect() at
    scale, fit once and use :func:`ks_grouped_at_edges` with the
    stored edges.
    Returns (group, n_base, n_cur, ks, crit, drifted)."""
    from pyspark.sql import Window

    if grid < 2:
        raise ValueError(f"grid must be >= 2, got {grid}")
    grp = F.coalesce(F.col(group_col).cast("string"), F.lit("__null__"))
    tagged = (
        baseline.select(grp.alias("group"), F.col(column).alias("v"))
        .filter(F.col("v").isNotNull())
        .withColumn("s", F.lit(0))
        .unionAll(
            current.select(grp.alias("group"), F.col(column).alias("v"))
            .filter(F.col("v").isNotNull())
            .withColumn("s", F.lit(1))
        )
    )
    probs = F.array(*[F.lit(i / grid) for i in range(1, grid)])
    edges = tagged.groupBy("group").agg(
        F.percentile_approx("v", probs, F.lit(10000)).alias("__edges")
    )
    jd = tagged.join(F.broadcast(edges), "group")
    return _ks_grouped_cells(jd, alpha)


def ks_grouped_at_edges(
    baseline: DataFrame,
    current: DataFrame,
    column: str,
    group_col: str,
    group_edges: dict[str, list[float]],
    alpha: float = 0.05,
) -> DataFrame:
    """The detect/replay phase of :func:`ks_grouped_sketch` against
    ALREADY-FITTED per-group edges — the fit-then-replay split the
    fitted drift detectors use: at 100 TB the quantile sketch runs once
    on the baseline corpus and its edges (segments × grid doubles,
    model-sized) are stored; every later detect() replays only the
    map-only cell assignment + group-partitioned windows below, no
    re-sketching. Also the oracle surface: ``percentile_approx`` is not
    reproducible cross-engine, but given the same literal edges the
    cell/window/sup machinery is — so this path is hash-certified and
    the sketch fit is pinned against exact KS in pytest.

    ``group_edges``: {group value: sorted edge list}. Groups without an
    entry are dropped (they can't be scored against a fitted grid).
    Scan count: ONE pass over each side's rows (the tagged union),
    edges broadcast as a literal relation."""
    grp = F.coalesce(F.col(group_col).cast("string"), F.lit("__null__"))
    tagged = (
        baseline.select(grp.alias("group"), F.col(column).alias("v"))
        .filter(F.col("v").isNotNull())
        .withColumn("s", F.lit(0))
        .unionAll(
            current.select(grp.alias("group"), F.col(column).alias("v"))
            .filter(F.col("v").isNotNull())
            .withColumn("s", F.lit(1))
        )
    )
    spark = baseline.sparkSession
    edges = spark.createDataFrame(
        [(g, [float(x) for x in es]) for g, es in sorted(group_edges.items())],
        "group string, __edges array<double>",
    )
    jd = tagged.join(F.broadcast(edges), "group")
    return _ks_grouped_cells(jd, alpha)


def _ks_grouped_cells(jd: DataFrame, alpha: float) -> DataFrame:
    """Shared sketch-KS tail: rows with a per-group ``__edges`` array →
    cell index via a map-only O(grid) array filter, (group, cell)
    counts, group-partitioned cumulative/total windows, sup. The
    beyond-last-point bucket rides the totals but is excluded from the
    sup (it is not a grid point)."""
    from pyspark.sql import Window

    idx = F.size(F.filter(F.col("__edges"), lambda e: e < F.col("v")))
    u = jd.groupBy(
        "group", idx.alias("__i"), F.size("__edges").alias("__m")
    ).agg(
        F.sum(F.when(F.col("s") == 0, 1).otherwise(0)).alias("gb"),
        F.sum(F.when(F.col("s") == 1, 1).otherwise(0)).alias("gc"),
    )
    w = (
        Window.partitionBy("group")
        .orderBy("__i")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wg = Window.partitionBy("group")
    j = u.select(
        "group",
        "__i",
        "__m",
        F.sum("gb").over(w).alias("cb"),
        F.sum("gc").over(w).alias("cc"),
        F.sum("gb").over(wg).alias("n_base"),
        F.sum("gc").over(wg).alias("n_cur"),
    ).filter(F.col("__i") < F.col("__m"))
    return _ks_grouped_finish(j.drop("__i", "__m"), alpha)


def _ks_grouped_finish(j: DataFrame, alpha: float) -> DataFrame:
    d = F.abs(
        F.try_divide(F.col("cb"), F.col("n_base"))
        - F.try_divide(F.col("cc"), F.col("n_cur"))
    )
    c_alpha = math.sqrt(-0.5 * math.log(alpha / 2))
    agg = j.groupBy("group").agg(
        F.max(d).alias("__raw"),
        F.max("n_base").alias("n_base"),
        F.max("n_cur").alias("n_cur"),
    )
    crit = F.lit(c_alpha) * F.sqrt(
        F.try_divide(
            F.col("n_base") + F.col("n_cur"), F.col("n_base") * F.col("n_cur")
        )
    )
    return agg.select(
        "group",
        "n_base",
        "n_cur",
        F.round("__raw", 6).alias("ks"),
        F.round(crit, 6).alias("crit"),
        (F.col("__raw") > crit).alias("drifted"),
    )


def wasserstein_grouped(
    baseline: DataFrame,
    current: DataFrame,
    column: str,
    group_col: str,
    bins: int = 100,
    threshold: float | None = None,
) -> DataFrame:
    """Per-segment earth-mover distance — completes the grouped family
    (psi/js/ks/moments + this): :func:`wasserstein`'s histogram-CDF
    integral per group in one histogram pass per side. Per-group
    semantics mirror the ungrouped form exactly: edges span BOTH sides'
    range (min of mins → max of maxs), the CDF difference integrates
    over a DENSE bin grid (empty bins carry the standing CDF gap —
    dropping them would under-count the distance), per-bin |ΔCDF|·width
    terms quantize to 1e-9 longs, default threshold 0.1·(hi−lo) per
    group. Groups present on only one side report NULL emd/drifted (the
    ungrouped empty-side convention, made loud). Returns (group, emd,
    threshold, drifted); shuffles keyed on (group) / (group, bin), the
    cumulative window partitions by group over ≤``bins`` rows.

    Plan shape (r8 audit): the segment-sized per-group range table is
    needed by THREE consumers (bin edges, the dense grid, the one-sided
    arm) — each lazy reuse would re-execute its subtree (the original
    shape ran 16 scans at runtime). It is ``localCheckpoint``-
    materialized once (executor blocks, never the driver — group
    cardinality stays unbounded-safe; the referential pointer-doubling
    precedent), and both sides bin through ONE tagged-union conditional
    aggregate: four scans total regardless of bins or segments."""
    from pyspark.sql import Window

    grp = F.coalesce(F.col(group_col).cast("string"), F.lit("__null__"))
    tagged = (
        baseline.select(grp.alias("group"), F.col(column).alias("__x"))
        .filter(F.col("__x").isNotNull())
        .withColumn("__s", F.lit(0))
        .unionAll(
            current.select(grp.alias("group"), F.col(column).alias("__x"))
            .filter(F.col("__x").isNotNull())
            .withColumn("__s", F.lit(1))
        )
    )
    ranges = (
        tagged.groupBy("group")
        .agg(
            F.min(F.when(F.col("__s") == 0, F.col("__x"))).alias("__lob"),
            F.max(F.when(F.col("__s") == 0, F.col("__x"))).alias("__hib"),
            F.min(F.when(F.col("__s") == 1, F.col("__x"))).alias("__loc"),
            F.max(F.when(F.col("__s") == 1, F.col("__x"))).alias("__hic"),
        )
        .localCheckpoint(eager=True)
    )
    both = ranges.filter(
        F.col("__lob").isNotNull() & F.col("__loc").isNotNull()
    ).select(
        "group",
        F.least("__lob", "__loc").alias("__lo"),
        F.greatest("__hib", "__hic").alias("__hi"),
    )
    width = F.when(
        F.col("__hi") > F.col("__lo"), (F.col("__hi") - F.col("__lo")) / bins
    ).otherwise(F.lit(1.0))
    b = F.least(
        F.greatest(F.floor((F.col("__x") - F.col("__lo")) / width), F.lit(0)),
        F.lit(bins - 1),
    )
    hist = (
        tagged.join(F.broadcast(both), "group")
        .groupBy("group", b.alias("bin"))
        .agg(
            F.sum(F.when(F.col("__s") == 0, 1).otherwise(0)).alias("pn"),
            F.sum(F.when(F.col("__s") == 1, 1).otherwise(0)).alias("qn"),
        )
    )
    spark = baseline.sparkSession
    grid = both.crossJoin(
        spark.range(bins).select(F.col("id").alias("bin"))
    )
    cells = grid.join(hist, ["group", "bin"], "left").select(
        "group",
        "bin",
        "__lo",
        "__hi",
        F.coalesce("pn", F.lit(0)).alias("pn"),
        F.coalesce("qn", F.lit(0)).alias("qn"),
    )
    # totals as group-partitioned window sums (an aggregate re-joined to
    # cells would recompute the grid+histogram subtree — double scans;
    # r8 plan audit); same partition spec as the cumulative window
    w = (
        Window.partitionBy("group")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wg = Window.partitionBy("group")
    j = cells.withColumn("__tp", F.sum("pn").over(wg)).withColumn(
        "__tq", F.sum("qn").over(wg)
    )
    # cumulative sums of the per-bin FREQUENCIES (same float-addition
    # sequence as the ungrouped Python loop, not counts-then-divide)
    cdf_p = F.sum(F.try_divide(F.col("pn"), F.col("__tp"))).over(w)
    cdf_q = F.sum(F.try_divide(F.col("qn"), F.col("__tq"))).over(w)
    wexpr = F.when(
        F.col("__hi") > F.col("__lo"), (F.col("__hi") - F.col("__lo")) / bins
    ).otherwise(F.lit(1.0))
    term = F.round(F.abs(cdf_p - cdf_q) * wexpr * 1_000_000_000).cast("long")
    out = (
        j.select("group", "__lo", "__hi", term.alias("__t"))
        .groupBy("group")
        .agg(
            F.round(F.sum("__t") / 1_000_000_000, 6).alias("emd"),
            F.max("__lo").alias("__lo"),
            F.max("__hi").alias("__hi"),
        )
    )
    thr = (
        F.lit(float(threshold))
        if threshold is not None
        else F.lit(0.1) * (F.col("__hi") - F.col("__lo"))
    )
    out = out.select(
        "group",
        "emd",
        F.round(thr, 6).alias("threshold"),
        (F.col("emd") > thr).alias("drifted"),
    )
    one_sided = ranges.filter(
        F.col("__lob").isNull() | F.col("__loc").isNull()
    ).select(
        "group",
        F.lit(None).cast("double").alias("emd"),
        F.lit(None).cast("double").alias("threshold"),
        F.lit(None).cast("boolean").alias("drifted"),
    )
    return out.unionByName(one_sided)


def chi_square_grouped(
    baseline: DataFrame,
    current: DataFrame,
    column: str,
    group_col: str,
    alpha: float = 0.05,
    max_categories: int = 1000,
) -> DataFrame:
    """Per-segment categorical χ² homogeneity — the CATEGORICAL member
    of the grouped drift family (psi/js/ks/wasserstein cover numerics):
    every segment's chi-square statistic from ONE (group, value) count
    pass, with the ungrouped detector's top-K + "other"-fold discipline
    applied PER GROUP (WindowGroupLimit keeps ≤``max_categories``
    categories per segment; the tail folds into one cell via the
    group-total subtraction, so a high-cardinality column can never blow
    up any segment).

    The drift gate is the Wilson–Hilferty normal transform z of the
    statistic (the same monotone map :func:`_chi2_sf` inverts), compared
    to the alpha critical value — p < α ⟺ z > z_α, expressed as column
    math so the whole relation stays engine-portable (no erfc needed in
    SQL). Terms quantize to 1e-9 longs. One-sided segments report NULL.
    Returns (group, chi2, dof, z, drifted)."""
    from pyspark.sql import Window

    grp = F.coalesce(F.col(group_col).cast("string"), F.lit("__null__"))
    u = (
        baseline.select(grp.alias("group"), F.col(column).alias("v")).withColumn(
            "s", F.lit(0)
        )
        .unionAll(
            current.select(grp.alias("group"), F.col(column).alias("v")).withColumn(
                "s", F.lit(1)
            )
        )
        .groupBy("group", "v")
        .agg(
            F.sum(F.when(F.col("s") == 0, 1).otherwise(0)).alias("nb"),
            F.sum(F.when(F.col("s") == 1, 1).otherwise(0)).alias("nc"),
        )
    )
    # per-group totals as WINDOW columns (no tots re-join — a self-join
    # on the same u lineage trips AMBIGUOUS_REFERENCE); the partition-by
    # window is group-keyed, never global
    wg = Window.partitionBy("group")
    w = Window.partitionBy("group").orderBy(
        F.desc(F.col("nb") + F.col("nc")), F.col("v").cast("string")
    )
    ranked = (
        u.withColumn("tb", F.sum("nb").over(wg))
        .withColumn("tc", F.sum("nc").over(wg))
        .withColumn("__rk", F.row_number().over(w))
    )
    kept = ranked.filter(F.col("__rk") <= max_categories)
    # kept-cell χ² terms sum inside ONE aggregate; the "other" tail cell
    # is reconstructed ANALYTICALLY from the aggregate's own sums (group
    # totals minus kept mass) instead of a separate relation unioned
    # back — any lazy reuse of `kept` would re-execute the whole count
    # subtree (r8 plan audit: the original shape ran the scans twice)
    tot = F.col("nb") + F.col("nc")
    e_b = tot * F.col("tb") / (F.col("tb") + F.col("tc"))
    e_c = tot * F.col("tc") / (F.col("tb") + F.col("tc"))
    term = F.round(
        (
            F.when(e_b > 0, F.pow(F.col("nb") - e_b, 2) / e_b).otherwise(0.0)
            + F.when(e_c > 0, F.pow(F.col("nc") - e_c, 2) / e_c).otherwise(0.0)
        )
        * 1_000_000_000
    ).cast("long")
    agg0 = kept.groupBy("group").agg(
        F.sum(term).alias("__tk"),
        F.sum("nb").alias("__kb"),
        F.sum("nc").alias("__kc"),
        F.max("tb").alias("tb"),
        F.max("tc").alias("tc"),
        F.count(F.lit(1)).alias("__cells"),
    )
    onb = F.col("tb") - F.col("__kb")
    onc = F.col("tc") - F.col("__kc")
    has_other = (onb > 0) | (onc > 0)
    otot = onb + onc
    oe_b = otot * F.col("tb") / (F.col("tb") + F.col("tc"))
    oe_c = otot * F.col("tc") / (F.col("tb") + F.col("tc"))
    oterm = F.round(
        (
            F.when(oe_b > 0, F.pow(onb - oe_b, 2) / oe_b).otherwise(0.0)
            + F.when(oe_c > 0, F.pow(onc - oe_c, 2) / oe_c).otherwise(0.0)
        )
        * 1_000_000_000
    ).cast("long")
    agg = agg0.select(
        "group",
        F.round(
            (F.col("__tk") + F.when(has_other, oterm).otherwise(F.lit(0)))
            / 1_000_000_000,
            6,
        ).alias("chi2"),
        F.greatest(
            F.col("__cells") + F.when(has_other, 1).otherwise(0) - 1, F.lit(1)
        )
        .cast("long")
        .alias("dof"),
        "tb",
        "tc",
    )
    # Wilson–Hilferty: z = ((x/k)^(1/3) − (1 − 2/(9k))) / sqrt(2/(9k));
    # p < α ⟺ z > z_α (same transform _chi2_sf applies)
    k = F.col("dof").cast("double")
    z = (
        F.cbrt(F.try_divide(F.col("chi2"), k))
        - (F.lit(1.0) - F.lit(2.0) / (F.lit(9.0) * k))
    ) / F.sqrt(F.lit(2.0) / (F.lit(9.0) * k))
    z_alpha = math.sqrt(2.0) * _erfc_inv(2.0 * alpha)
    # one-sided segments fold into the SAME projection as conditional
    # NULLs (two filtered arms of `agg` unioned back would re-execute
    # the aggregate subtree twice)
    present = (F.col("tb") > 0) & (F.col("tc") > 0)
    return agg.select(
        "group",
        F.when(present, F.col("chi2")).alias("chi2"),
        F.when(present, F.col("dof")).alias("dof"),
        F.when(present, F.round(z, 6)).alias("z"),
        F.when(present, z > F.lit(z_alpha)).alias("drifted"),
    )


def cvm_grouped(
    baseline: DataFrame,
    current: DataFrame,
    column: str,
    group_col: str,
    threshold: float = 0.461,
) -> DataFrame:
    """Per-segment Cramér–von Mises — completes the grouped family
    (psi/js/ks/wasserstein/chi²/moments + this): :func:`cramer_von_mises`'s
    ECDF form T = n·m/(n+m)² · Σ_x g(x)·(F_b(x) − F_c(x))² per group,
    with the squared-difference sum expanded into the same three
    integer-valued aggregate scalars as the ungrouped form (sbb, sbc,
    scc) so every term is exact and order-independent.

    Single-consumption shape (the r8 audit rule): one (group, value)
    ECDF merge; cumulative AND total sums as two window specs over the
    SAME group-partitioned sort (no aggregate-join-back); ONE final
    groupBy. Unlike the ungrouped form's global window, the cumulative
    sort is partitioned by group — N segments cost one pass. One-sided
    segments (a group present on only one side) report NULL statistic /
    NULL drifted, never 0 (absence of evidence is not agreement).
    Per-group values are pinned bit-identical to cramer_von_mises() on
    the slice (same pow/sum arithmetic shapes).

    Returns (group, n_base, n_cur, cvm, drifted)."""
    from pyspark.sql import Window

    grp = F.coalesce(F.col(group_col).cast("string"), F.lit("__null__"))
    u = (
        baseline.select(grp.alias("group"), F.col(column).alias("v"))
        .filter(F.col("v").isNotNull())
        .withColumn("s", F.lit(0))
        .unionAll(
            current.select(grp.alias("group"), F.col(column).alias("v"))
            .filter(F.col("v").isNotNull())
            .withColumn("s", F.lit(1))
        )
        .groupBy("group", "v")
        .agg(
            F.sum(F.when(F.col("s") == 0, 1).otherwise(0)).alias("gb"),
            F.sum(F.when(F.col("s") == 1, 1).otherwise(0)).alias("gc"),
        )
    )
    w = (
        Window.partitionBy("group")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wg = Window.partitionBy("group")
    j = u.select(
        "group",
        "gb",
        "gc",
        F.sum("gb").over(w).alias("cum_b"),
        F.sum("gc").over(w).alias("cum_c"),
        F.sum("gb").over(wg).alias("n"),
        F.sum("gc").over(wg).alias("m"),
    )
    g = F.col("gb") + F.col("gc")
    agg = j.groupBy("group").agg(
        F.max("n").alias("n_base"),
        F.max("m").alias("n_cur"),
        F.sum(g * F.pow(F.col("cum_b"), 2)).alias("sbb"),
        F.sum(g * F.col("cum_b") * F.col("cum_c")).alias("sbc"),
        F.sum(g * F.pow(F.col("cum_c"), 2)).alias("scc"),
    )
    n, m = F.col("n_base"), F.col("n_cur")
    # Σ g·(cum_b/n − cum_c/m)² expanded; try_divide NULLs the one-sided
    # case (m or n = 0) and the NULL propagates through t and drifted
    ssq = (
        F.try_divide(F.col("sbb"), n * n)
        - F.lit(2.0) * F.try_divide(F.col("sbc"), n * m)
        + F.try_divide(F.col("scc"), m * m)
    )
    t = F.try_divide(n * m, F.pow(n + m, 2)) * ssq
    return agg.select(
        "group",
        "n_base",
        "n_cur",
        F.round(t, 6).alias("cvm"),
        (t > F.lit(threshold)).alias("drifted"),
    )


def _erfc_inv(y: float) -> float:
    """Inverse complementary error function via bisection on math.erfc
    (driver-side scalar; only used to precompute the z_α critical
    value)."""
    lo, hi = -10.0, 10.0
    for _ in range(200):
        mid = (lo + hi) / 2
        if math.erfc(mid) > y:
            lo = mid
        else:
            hi = mid
    return (lo + hi) / 2


_GROUPED_METHODS = {
    "psi": psi_grouped,
    "js": js_grouped,
    "ks": ks_grouped,
    "wasserstein": wasserstein_grouped,
    "chi_square": chi_square_grouped,
    "cramer_von_mises": cvm_grouped,
    "mean_variance": mean_variance_drift_grouped,
}


def compare_grouped(
    baseline: DataFrame,
    current: DataFrame,
    column: str,
    group_col: str,
    method: str = "psi",
    **kwargs: Any,
) -> DataFrame:
    """Per-segment drift sweep dispatcher — the grouped mirror of
    :func:`compare`: one name for the whole per-segment family
    (psi / js / ks / wasserstein / chi_square / cramer_von_mises /
    mean_variance), each a
    constant number of passes for ANY number of segments. Returns the
    method's relational per-group result (always carrying ``group`` and
    ``drifted``)."""
    if method not in _GROUPED_METHODS:
        raise ValueError(
            f"unknown grouped method {method!r}; one of {sorted(_GROUPED_METHODS)}"
        )
    return _GROUPED_METHODS[method](baseline, current, column, group_col, **kwargs)
