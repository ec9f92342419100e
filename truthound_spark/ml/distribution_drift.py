"""Fitted distribution drift: stored histograms + quantile-grid ECDFs.

Reference: ml/drift_detection/distribution.py:45
``DistributionDriftDetector`` — fit() profiles every numeric column,
detect() scores PSI / KS / Jensen–Shannon / Wasserstein per column with
max-score overall and none/single_feature/partial/global drift typing
(:172-250). The reference's fitted state stores the RAW VALUES of every
column (:142 ``"values": data``) — data-sized driver state, the exact
anti-pattern at scale.

Spark-first fitted state is O(columns × (bins + grid)):

  * histogram proportions over the reference's own edges with the
    reference's smoothing ((c + 1e-4) / (total + 1e-4·n_bins), :165)
    → PSI (Σ (q−p)·ln(q/p) over positive cells, |·|, :256-284) and
    Jensen–Shannon (0.5·KL(p‖m)+0.5·KL(q‖m) over positive cells,
    normalized by ln 2, :308-331) need nothing else;
  * a ``grid``-point exact-percentile ECDF grid → KS (max |F_ref−F_cur|
    over the grid; F_cur from ONE aggregate of count(≤x) conditional
    sums — the sketch form of the reference's exact all-values loop,
    :287-306) and Wasserstein (∫|F_ref−F_cur| over grid segments,
    normalized by the reference range, :333-359).

fit() costs two fused aggregates (ranges+quantiles, then histograms —
every column shares each scan); detect() costs ONE fused aggregate over
the current side for all columns and all methods' inputs. The baseline
is never re-scanned.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from truthound_spark.core.base import pct_agg
from truthound_spark.ml.concept_drift import _is_numeric

METHODS = ("psi", "ks", "jensen_shannon", "wasserstein")


@dataclass
class DistributionDriftResult:
    is_drifted: bool
    drift_score: float
    column_scores: list[tuple[str, float]]
    drift_type: str
    confidence: float
    details: str

    def to_dict(self) -> dict[str, Any]:
        return {
            "is_drifted": self.is_drifted,
            "drift_score": self.drift_score,
            "column_scores": list(self.column_scores),
            "drift_type": self.drift_type,
            "confidence": self.confidence,
            "details": self.details,
        }


class DistributionDriftDetector:
    """fit() once → detect() any number of current batches from the
    stored profile (reference distribution.py:45; scoring formulas per
    method cited above)."""

    def __init__(
        self,
        method: str = "psi",
        columns: list[str] | None = None,
        threshold: float = 0.05,
        n_bins: int = 10,
        grid: int = 100,
    ) -> None:
        if method not in METHODS:
            raise ValueError(f"method must be one of {METHODS}")
        self.method = method
        self.columns = columns
        self.threshold = threshold
        self.n_bins = n_bins
        self.grid = grid
        self.stats_: dict[str, dict[str, Any]] = {}

    # -- fit (two fused aggregates for every column) ---------------------------
    def fit(self, reference: DataFrame) -> "DistributionDriftDetector":
        """Scan count (audited r9): TWO scans of the reference — one
        fused moments/range/quantile aggregate over ALL columns, then
        one fused histogram aggregate (its bin edges need the first
        pass's min/max; the two-phase shape is inherent, never
        per-column). ``detect()`` is ONE scan of the current side."""
        dtypes = dict(reference.dtypes)
        cols = [
            c
            for c in (self.columns or list(dtypes))
            if c in dtypes and _is_numeric(dtypes[c])
        ]
        if not cols:
            raise ValueError("no numeric columns to profile")
        probs = [i / self.grid for i in range(1, self.grid)]
        aggs = []
        for i, c in enumerate(cols):
            x = F.col(c).cast("double")
            aggs += [
                F.count(x).alias(f"n{i}"),
                F.mean(x).alias(f"m{i}"),
                F.min(x).alias(f"lo{i}"),
                F.max(x).alias(f"hi{i}"),
                pct_agg(x, probs).alias(f"q{i}"),
            ]
        row = reference.agg(*aggs).collect()[0]
        pre: dict[str, dict[str, Any]] = {}
        hist_aggs = []
        for i, c in enumerate(cols):
            n = int(row[f"n{i}"])
            if n == 0:
                pre[c] = {"empty": True}
                continue
            lo, hi = float(row[f"lo{i}"]), float(row[f"hi{i}"])
            pre[c] = {
                "count": n,
                "mean": float(row[f"m{i}"]),
                "min": lo,
                "max": hi,
                "quantiles": [float(v) for v in (row[f"q{i}"] or [])],
            }
            hist_aggs += self._hist_exprs(c, lo, hi, f"h{i}")
        if hist_aggs:
            hrow = reference.agg(*hist_aggs).collect()[0]
        self.stats_ = {}
        for i, c in enumerate(cols):
            st = pre[c]
            if st.get("empty"):
                self.stats_[c] = st
                continue
            counts = [int(hrow[f"h{i}_{b}"] or 0) for b in range(self._bins_of(st))]
            st["bins"] = self._smooth(counts)
            self.stats_[c] = st
        return self

    def _bins_of(self, st: dict[str, Any]) -> int:
        return 1 if st["min"] == st["max"] else self.n_bins

    def _hist_exprs(self, c: str, lo: float, hi: float, tag: str) -> list:
        """Per-bin conditional-sum aggregates over the reference edges
        (edge semantics mirror the reference: [e_i, e_{i+1}) with the
        last edge nudged past max so the maximum lands in the top bin,
        :152; values OUTSIDE the reference range fall in no bin)."""
        x = F.col(c).cast("double")
        if lo == hi:
            return [
                F.sum(((x >= lo) & (x < hi + 1)).cast("long")).alias(f"{tag}_0")
            ]
        width = (hi - lo) / self.n_bins
        edges = [lo + i * width for i in range(self.n_bins + 1)]
        edges[-1] = hi + 0.001
        return [
            F.sum(((x >= edges[b]) & (x < edges[b + 1])).cast("long")).alias(
                f"{tag}_{b}"
            )
            for b in range(self.n_bins)
        ]

    def _smooth(self, counts: list[int]) -> list[float]:
        total = sum(counts)
        n = len(counts)
        return [(c + 0.0001) / (total + 0.0001 * n) for c in counts]

    # -- detect (one fused aggregate over the current side) ---------------------
    def detect(
        self, current: DataFrame, columns: list[str] | None = None
    ) -> DistributionDriftResult:
        if not self.stats_:
            raise ValueError("fit() must run before detect()")
        check = [
            c
            for c in (columns or list(self.stats_))
            if c in current.columns and not self.stats_[c].get("empty")
        ]
        aggs = []
        need_grid = self.method in ("ks", "wasserstein")
        for i, c in enumerate(check):
            st = self.stats_[c]
            x = F.col(c).cast("double")
            aggs.append(F.count(x).alias(f"n{i}"))
            aggs += self._hist_exprs(c, st["min"], st["max"], f"h{i}")
            if need_grid:
                for g, pt in enumerate(st["quantiles"]):
                    aggs.append(F.sum((x <= pt).cast("long")).alias(f"e{i}_{g}"))
        if not aggs:
            return DistributionDriftResult(False, 0.0, [], "none", 1.0, "no columns")
        row = current.agg(*aggs).collect()[0]

        column_scores: list[tuple[str, float]] = []
        for i, c in enumerate(check):
            st = self.stats_[c]
            n_cur = int(row[f"n{i}"])
            if n_cur == 0:
                column_scores.append((c, 0.0))
                continue
            counts = [int(row[f"h{i}_{b}"] or 0) for b in range(self._bins_of(st))]
            q = self._smooth(counts)
            p = st["bins"]
            if self.method == "psi":
                score = abs(
                    sum(
                        (qi - pi) * math.log(qi / pi)
                        for pi, qi in zip(p, q)
                        if pi > 0 and qi > 0
                    )
                )
            elif self.method == "jensen_shannon":
                m = [(pi + qi) / 2 for pi, qi in zip(p, q)]

                def kl(a: list[float], b: list[float]) -> float:
                    return sum(
                        ai * math.log(ai / bi)
                        for ai, bi in zip(a, b)
                        if ai > 0 and bi > 0
                    )

                score = min(1.0, (0.5 * kl(p, m) + 0.5 * kl(q, m)) / 0.693)
            else:
                # reference-side ECDF at grid point g is (g+1)/grid by
                # construction (exact percentiles); current-side from the
                # count(≤x) sums
                f_ref = [(g + 1) / self.grid for g in range(len(st["quantiles"]))]
                f_cur = [
                    int(row[f"e{i}_{g}"] or 0) / n_cur
                    for g in range(len(st["quantiles"]))
                ]
                if self.method == "ks":
                    score = max(
                        (abs(a - b) for a, b in zip(f_ref, f_cur)), default=0.0
                    )
                else:  # wasserstein over grid segments / reference range
                    pts = st["quantiles"]
                    dist = sum(
                        abs(f_ref[g] - f_cur[g]) * (pts[g + 1] - pts[g])
                        for g in range(len(pts) - 1)
                    )
                    rng = st["max"] - st["min"]
                    score = dist / rng if rng > 0 else 0.0
            column_scores.append((c, score))

        max_score = max((s for _, s in column_scores), default=0.0)
        avg_score = (
            sum(s for _, s in column_scores) / len(column_scores)
            if column_scores
            else 0.0
        )
        drifted_cols = [c for c, s in column_scores if s >= self.threshold]
        if not drifted_cols:
            drift_type = "none"
        elif len(drifted_cols) == 1:
            drift_type = "single_feature"
        elif len(drifted_cols) < len(check) / 2:
            drift_type = "partial"
        else:
            drift_type = "global"
        return DistributionDriftResult(
            is_drifted=max_score >= self.threshold,
            drift_score=max_score,
            column_scores=column_scores,
            drift_type=drift_type,
            confidence=1.0 - avg_score if avg_score < 1 else 0.0,
            details=f"Method: {self.method}, Drifted columns: {drifted_cols}",
        )

    # -- persistence -----------------------------------------------------------
    def to_payload(self) -> dict[str, Any]:
        if not self.stats_:
            raise ValueError("fit() before saving")
        return {
            "method": self.method,
            "columns": self.columns,
            "threshold": self.threshold,
            "n_bins": self.n_bins,
            "grid": self.grid,
            "stats": self.stats_,
        }

    @classmethod
    def from_payload(cls, payload: dict[str, Any]) -> "DistributionDriftDetector":
        det = cls(
            method=payload["method"],
            columns=payload.get("columns"),
            threshold=float(payload["threshold"]),
            n_bins=int(payload["n_bins"]),
            grid=int(payload["grid"]),
        )
        det.stats_ = payload["stats"]
        return det
