"""Multivariate drift: correlation-structure / manifold / joint-mean shift.

Reference: ml/drift_detection/multivariate.py:46
``MultivariateDriftDetector`` — the drift univariate detectors miss:
feature CORRELATIONS rotate, the data manifold tilts, the joint mean
moves along a direction no single marginal flags. Three methods
(multivariate.py:34):

  * ``correlation`` — pairwise Pearson matrix per side; score
    min(1, max|Δcorr| / 0.5), per-column scores = that column's mean
    |Δcorr| against the others (:335-384)
  * ``pca`` — reference-fitted principal components; current data
    projected onto them, score = max relative variance change per
    component (:386-445)
  * ``mahalanobis`` — diagonal-approx distance of the mean vector in
    reference-σ units, score min(1, d/3) (:447-486)

Spark-first: the reference collects both frames and loops rows in
Python (its PCA builds the covariance matrix row-by-row, :220-228).
Here every statistic reduces to ONE aggregate per side:

  * all n(n−1)/2 pairwise correlations + per-column moments in a single
    ``agg`` (Catalyst shares the scan; ANSI-safe covar/std corr)
  * the PCA covariance matrix as one agg of standardized cross-product
    sums over all-features-non-null rows; power iteration then runs
    driver-side on the f×f matrix (model-sized, seeded → deterministic)
  * detect-side PCA variance per component via E[p²]−E[p]² of the
    projection EXPRESSION p = Σ wᵢ·zᵢ — current rows never move

Driver state is O(features²); 100 TB frames contribute aggregates only.
"""

from __future__ import annotations

import math
import random
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from truthound_spark.ml.concept_drift import _is_numeric, _safe_corr


class MultivariateDriftResult:
    def __init__(
        self,
        is_drifted: bool,
        drift_score: float,
        column_scores: list[tuple[str, float]],
        drift_type: str,
        details: str,
    ) -> None:
        self.is_drifted = is_drifted
        self.drift_score = drift_score
        self.column_scores = column_scores
        self.drift_type = drift_type
        self.details = details

    def to_dict(self) -> dict[str, Any]:
        return {
            "is_drifted": self.is_drifted,
            "drift_score": self.drift_score,
            "column_scores": list(self.column_scores),
            "drift_type": self.drift_type,
            "details": self.details,
        }


class MultivariateDriftDetector:
    """fit() on reference, detect() on current (reference
    multivariate.py:46-486; scoring formulas cited per method).
    ``threshold`` is the DriftConfig default (ml/base.py:184)."""

    def __init__(
        self,
        method: str = "correlation",
        columns: list[str] | None = None,
        threshold: float = 0.05,
        correlation_threshold: float = 0.3,
        n_components: int | None = None,
        seed: int = 42,
    ) -> None:
        if method not in ("correlation", "pca", "mahalanobis"):
            raise ValueError("method must be correlation | pca | mahalanobis")
        self.method = method
        self.columns = columns
        self.threshold = threshold
        self.correlation_threshold = correlation_threshold
        self.n_components = n_components
        self.seed = seed
        self.columns_: list[str] = []
        self.corr_: list[list[float]] = []
        self.means_: list[float] = []
        self.stds_: list[float] = []
        self.pca_components_: list[list[float]] | None = None
        self.pca_explained_var_: list[float] | None = None

    # -- one-aggregate side summaries -----------------------------------------
    def _corr_and_moments(
        self, df: DataFrame, cols: list[str]
    ) -> tuple[list[list[float]], list[float], list[float]]:
        """Full pairwise correlation matrix + per-column mean/std from
        ONE distributed aggregate."""
        n = len(cols)
        aggs = []
        for i, c in enumerate(cols):
            x = F.col(c).cast("double")
            aggs += [F.mean(x).alias(f"m{i}"), F.stddev(x).alias(f"s{i}")]
        for i in range(n):
            for j in range(i + 1, n):
                aggs.append(
                    _safe_corr(
                        F.col(cols[i]).cast("double"), F.col(cols[j]).cast("double")
                    ).alias(f"c{i}_{j}")
                )
        row = df.agg(*aggs).collect()[0]
        matrix = [[1.0 if i == j else 0.0 for j in range(n)] for i in range(n)]
        for i in range(n):
            for j in range(i + 1, n):
                v = row[f"c{i}_{j}"]
                corr = 0.0 if v is None or math.isnan(v) else float(v)
                matrix[i][j] = matrix[j][i] = corr
        means = [float(row[f"m{i}"] or 0.0) for i in range(n)]
        stds = [float(row[f"s{i}"] or 1.0) for i in range(n)]
        return matrix, means, stds

    def _z_exprs(self, cols: list[str]) -> list:
        return [
            (F.col(c).cast("double") - self.means_[i]) / (self.stds_[i] or 1.0)
            for i, c in enumerate(cols)
        ]

    def _all_non_null(self, df: DataFrame, cols: list[str]) -> DataFrame:
        cond = F.lit(True)
        for c in cols:
            cond = cond & F.col(c).isNotNull()
        return df.filter(cond)

    # -- fit --------------------------------------------------------------------
    def fit(self, reference: DataFrame) -> "MultivariateDriftDetector":
        dtypes = dict(reference.dtypes)
        if self.columns:
            cols = [c for c in self.columns if c in dtypes and _is_numeric(dtypes[c])]
        else:
            cols = [c for c, t in reference.dtypes if _is_numeric(t)]
        if len(cols) < 2:
            raise ValueError("multivariate drift requires >= 2 numeric columns")
        self.columns_ = cols
        self.corr_, self.means_, self.stds_ = self._corr_and_moments(reference, cols)
        if self.method == "pca":
            self._fit_pca(reference)
        return self

    def _fit_pca(self, reference: DataFrame) -> None:
        """Covariance of the standardized features from one agg of
        cross-product sums (all-features-non-null rows — the reference's
        per-column null-drop + truncate, :202-208, silently MISALIGNS
        rows; complete-case is the defensible variant), then seeded
        power iteration with deflation on the f×f matrix driver-side
        (reference :230-268)."""
        cols = self.columns_
        n = len(cols)
        z = self._z_exprs(cols)
        d = self._all_non_null(reference, cols)
        aggs = [F.count(F.lit(1)).alias("n")]
        for i in range(n):
            for j in range(i, n):
                aggs.append(F.sum(z[i] * z[j]).alias(f"zz{i}_{j}"))
        row = d.agg(*aggs).collect()[0]
        m = int(row["n"])
        denom = max(m - 1, 1)
        cov = [[0.0] * n for _ in range(n)]
        for i in range(n):
            for j in range(i, n):
                v = float(row[f"zz{i}_{j}"] or 0.0) / denom
                cov[i][j] = cov[j][i] = v
        k = self.n_components or min(5, n)
        rng = random.Random(self.seed)
        self.pca_components_ = []
        self.pca_explained_var_ = []
        remaining = [r[:] for r in cov]
        for _ in range(k):
            v = [rng.gauss(0, 1) for _ in range(n)]
            for _ in range(100):
                nv = [sum(remaining[i][j] * v[j] for j in range(n)) for i in range(n)]
                norm = math.sqrt(sum(x * x for x in nv))
                if norm > 0:
                    v = [x / norm for x in nv]
            eig = sum(
                v[i] * sum(remaining[i][j] * v[j] for j in range(n)) for i in range(n)
            )
            self.pca_components_.append(v)
            self.pca_explained_var_.append(max(0.0, eig))
            for i in range(n):
                for j in range(n):
                    remaining[i][j] -= eig * v[i] * v[j]

    # -- detect -------------------------------------------------------------------
    def detect(self, current: DataFrame) -> MultivariateDriftResult:
        if not self.columns_:
            raise ValueError("fit() must run before detect()")
        cols = [c for c in self.columns_ if c in current.columns]
        if len(cols) < 2:
            return MultivariateDriftResult(
                False, 0.0, [], "error", "Not enough numeric columns"
            )
        if self.method == "pca":
            score, col_scores, details = self._detect_pca(current)
        elif self.method == "mahalanobis":
            score, col_scores, details = self._detect_mahalanobis(current)
        else:
            score, col_scores, details = self._detect_correlation(current)
        is_drifted = score >= self.threshold
        drift_type = (
            "none"
            if not is_drifted
            else {
                "correlation": "correlation_shift",
                "pca": "manifold_shift",
                "mahalanobis": "multivariate_shift",
            }[self.method]
        )
        return MultivariateDriftResult(is_drifted, score, col_scores, drift_type, details)

    def _detect_correlation(self, current: DataFrame):
        cur_corr, _, _ = self._corr_and_moments(current, self.columns_)
        n = len(self.columns_)
        max_diff = total = 0.0
        pairs = 0
        changed = []
        for i in range(n):
            for j in range(i + 1, n):
                diff = abs(cur_corr[i][j] - self.corr_[i][j])
                max_diff = max(max_diff, diff)
                total += diff
                pairs += 1
                if diff > self.correlation_threshold:
                    changed.append(
                        f"{self.columns_[i]}-{self.columns_[j]}: "
                        f"{self.corr_[i][j]:.2f}->{cur_corr[i][j]:.2f}"
                    )
        col_scores = []
        for i, c in enumerate(self.columns_):
            diffs = [
                abs(self.corr_[i][j] - cur_corr[i][j]) for j in range(n) if j != i
            ]
            col_scores.append((c, sum(diffs) / len(diffs) if diffs else 0.0))
        score = min(1.0, max_diff / 0.5)
        details = f"Max correlation change: {max_diff:.3f}"
        if changed:
            details += f", Changed pairs: {', '.join(changed[:3])}"
        return score, col_scores, details

    def _detect_pca(self, current: DataFrame):
        if not self.pca_components_:
            return self._detect_correlation(current)
        cols = self.columns_
        z = self._z_exprs(cols)
        d = self._all_non_null(current, cols)
        # projection variance per component from E[p²] − E[p]² of the
        # projection EXPRESSION — one aggregate, rows stay distributed
        aggs = [F.count(F.lit(1)).alias("n")]
        for ci, comp in enumerate(self.pca_components_):
            p = sum((z[i] * w for i, w in enumerate(comp[1:], 1)), z[0] * comp[0])
            aggs += [F.sum(p).alias(f"p{ci}"), F.sum(p * p).alias(f"pp{ci}")]
        row = d.agg(*aggs).collect()[0]
        m = int(row["n"])
        max_rel = 0.0
        for ci, ref_var in enumerate(self.pca_explained_var_ or []):
            if m < 2 or ref_var <= 0:
                continue
            s, ss = float(row[f"p{ci}"] or 0.0), float(row[f"pp{ci}"] or 0.0)
            cur_var = (ss - s * s / m) / (m - 1)
            max_rel = max(max_rel, abs(cur_var - ref_var) / ref_var)
        score = min(1.0, max_rel)
        col_scores = [
            (c, sum(abs(comp[i]) for comp in self.pca_components_) * score)
            for i, c in enumerate(cols)
        ]
        return score, col_scores, f"Max variance change ratio: {max_rel:.3f}"

    def _detect_mahalanobis(self, current: DataFrame):
        cols = self.columns_
        row = current.agg(
            *[F.mean(F.col(c).cast("double")).alias(f"m{i}") for i, c in enumerate(cols)]
        ).collect()[0]
        cur_means = [float(row[f"m{i}"] or 0.0) for i in range(len(cols))]
        sd = [
            (cur_means[i] - self.means_[i]) / (self.stds_[i] or 1.0)
            for i in range(len(cols))
        ]
        n = len(cols)
        mahal = math.sqrt(sum(d * d for d in sd) / n) if n else 0.0
        col_scores = [(cols[i], abs(sd[i]) / 3.0) for i in range(n)]
        score = min(1.0, mahal / 3.0)
        return score, col_scores, f"Mahalanobis distance: {mahal:.3f}"

    # -- persistence ----------------------------------------------------------
    def to_payload(self) -> dict[str, Any]:
        if not self.columns_:
            raise ValueError("fit() before saving")
        return {
            "method": self.method,
            "columns": self.columns,
            "threshold": self.threshold,
            "correlation_threshold": self.correlation_threshold,
            "n_components": self.n_components,
            "seed": self.seed,
            "fit_columns": self.columns_,
            "corr": self.corr_,
            "means": self.means_,
            "stds": self.stds_,
            "pca_components": self.pca_components_,
            "pca_explained_var": self.pca_explained_var_,
        }

    @classmethod
    def from_payload(cls, payload: dict[str, Any]) -> "MultivariateDriftDetector":
        det = cls(
            method=payload["method"],
            columns=payload.get("columns"),
            threshold=float(payload["threshold"]),
            correlation_threshold=float(payload["correlation_threshold"]),
            n_components=payload.get("n_components"),
            seed=int(payload.get("seed", 42)),
        )
        det.columns_ = list(payload["fit_columns"])
        det.corr_ = [list(r) for r in payload["corr"]]
        det.means_ = [float(x) for x in payload["means"]]
        det.stds_ = [float(x) for x in payload["stds"]]
        det.pca_components_ = payload.get("pca_components")
        det.pca_explained_var_ = payload.get("pca_explained_var")
        return det


def correlation_drift_table(
    baseline: DataFrame,
    current: DataFrame,
    columns: list[str],
    decimals: int = 6,
) -> DataFrame:
    """Relational pairwise correlation-shift table — the oracle surface
    for the ``correlation`` method: (col_a, col_b, ref_corr, cur_corr,
    diff, drift_score) per pair, drift_score = min(1, max(diff)/0.5)
    repeated on every row (the detector's scalar). One aggregate per
    side; pairs-sized result; everything DuckDB-certifiable."""

    def side(df: DataFrame, tag: str) -> DataFrame:
        aggs = []
        for i in range(len(columns)):
            for j in range(i + 1, len(columns)):
                aggs.append(
                    F.coalesce(
                        _safe_corr(
                            F.col(columns[i]).cast("double"),
                            F.col(columns[j]).cast("double"),
                        ),
                        F.lit(0.0),
                    ).alias(f"{tag}_{i}_{j}")
                )
        return df.agg(*aggs)

    wide = side(baseline, "b").crossJoin(side(current, "c"))
    # ONE explode + the max-|Δ| as a static GREATEST over the known pair
    # set — per-pair selects unioned back and an aggregate re-joined for
    # the max consumed `wide` 2·pairs times (12 scans; r8 lazy-reuse
    # audit). The pair list is compile-time known, so the detector's
    # scalar is pure column math on the single wide row.
    pair_idx = [
        (i, j)
        for i in range(len(columns))
        for j in range(i + 1, len(columns))
    ]
    diffs = [
        F.abs(F.col(f"c_{i}_{j}") - F.col(f"b_{i}_{j}")) for i, j in pair_idx
    ]
    mx = F.greatest(*diffs) if len(diffs) > 1 else diffs[0]
    score = F.round(F.least(F.lit(1.0), mx / 0.5), decimals)
    structs = []
    for i, j in pair_idx:
        rb, rc = F.col(f"b_{i}_{j}"), F.col(f"c_{i}_{j}")
        structs.append(
            F.struct(
                F.lit(columns[i]).alias("col_a"),
                F.lit(columns[j]).alias("col_b"),
                F.round(rb, decimals).alias("ref_corr"),
                F.round(rc, decimals).alias("cur_corr"),
                F.round(F.abs(rc - rb), decimals).alias("diff"),
                score.alias("drift_score"),
            )
        )
    return wide.select(F.explode(F.array(*structs)).alias("r")).select("r.*")
