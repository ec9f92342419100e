"""Concept drift: feature↔target relationship shift between fit and detect.

Reference: ml/drift_detection/concept.py:49 ``ConceptDriftDetector`` —
different from feature drift (input-distribution change): the CONCEPT
drifts when the correlation structure between features and the label
moves, or the label's own distribution shifts, even while every input
marginal looks stable. This is the signal that a model needs retraining.

Reference semantics preserved exactly (concept.py:159-222, 262-326):
  * per-feature Pearson correlation with the target over pairwise
    non-null rows; a correlation-change score min(1, |Δcorr| / 0.5),
    +0.5 sign-change penalty when both |corr| > 0.1 and signs differ
  * target-distribution score — categorical: max over new-value mass,
    missing-value mass, and per-value proportion deltas; numeric:
    min(1, max(|Δmean|/ref_std / 3, |cur_std/ref_std − 1|))
  * drift when the max score ≥ threshold (reference DriftConfig
    threshold default, ml/base.py:184); drift_type target_shift /
    concept_shift / partial_concept_drift per concept.py:305-315.

Spark-first execution: the reference collects both frames to the driver
and loops features in Python. Here each side is reduced by ONE
distributed aggregate — ``F.corr`` per feature plus the target moments,
all in the same ``agg`` (Catalyst fuses them into a single scan) — and,
for categorical targets only, one groupBy capped at ``max_categories``
(the chi-square top-K discipline, drift/detectors.py:160). Driver state
is O(features + categories); 100 TB reference frames never move.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NUMERIC = {"tinyint", "smallint", "int", "bigint", "float", "double", "decimal"}


def _is_numeric(dtype: str) -> bool:
    return dtype.split("(")[0] in _NUMERIC


def _safe_corr(x, y):
    """Pearson corr that is NULL (not a DIVIDE_BY_ZERO crash — ANSI mode
    is on) under zero variance: covar_samp / (std·std), the same formula
    F.corr evaluates."""
    return F.try_divide(F.covar_samp(x, y), F.stddev_samp(x) * F.stddev_samp(y))


@dataclass
class ConceptSummary:
    """O(features)-sized summary of one side (the detector's only state)."""

    n: int
    correlations: dict[str, float]
    target_type: str  # "numeric" | "categorical"
    mean: float | None = None
    std: float | None = None
    min: float | None = None
    max: float | None = None
    proportions: dict[str, float] = field(default_factory=dict)

    def to_dict(self) -> dict[str, Any]:
        return {
            "n": self.n,
            "correlations": self.correlations,
            "target_type": self.target_type,
            "mean": self.mean,
            "std": self.std,
            "min": self.min,
            "max": self.max,
            "proportions": self.proportions,
        }

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "ConceptSummary":
        return cls(
            n=int(d["n"]),
            correlations={k: float(v) for k, v in d["correlations"].items()},
            target_type=d["target_type"],
            mean=d.get("mean"),
            std=d.get("std"),
            min=d.get("min"),
            max=d.get("max"),
            proportions={k: float(v) for k, v in (d.get("proportions") or {}).items()},
        )


@dataclass
class ConceptDriftResult:
    """Mirrors reference DriftResult (ml/base.py:292)."""

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


class ConceptDriftDetector:
    """fit() on reference data, detect() on current (reference
    concept.py:49-326; scoring formulas cited per method).

    Parameters mirror ConceptDriftConfig (concept.py:29): threshold is
    the reference DriftConfig default 0.05 (ml/base.py:184) — the
    max-score gate, NOT a p-value.

    Scan count (audited r9): ONE scan per side — fit() is a single
    fused correlation/moments aggregate over the reference, detect()
    the same single aggregate over the current side."""

    def __init__(
        self,
        target_column: str,
        feature_columns: list[str] | None = None,
        threshold: float = 0.05,
        max_categories: int = 1000,
    ) -> None:
        self.target_column = target_column
        self.feature_columns = feature_columns
        self.threshold = threshold
        self.max_categories = max_categories
        self.reference_: ConceptSummary | None = None
        self._fit_features: list[str] = []

    # -- one-aggregate side summary -----------------------------------------
    def _features_of(self, df: DataFrame) -> list[str]:
        dtypes = dict(df.dtypes)
        if self.feature_columns is not None:
            return [
                c
                for c in self.feature_columns
                if c in dtypes and c != self.target_column
            ]
        return [
            c
            for c, t in df.dtypes
            if c != self.target_column and _is_numeric(t)
        ]

    def summarize(self, df: DataFrame, features: list[str]) -> ConceptSummary:
        """ONE agg: every feature's corr with the target + target moments
        (+ one capped groupBy for categorical targets)."""
        tgt = self.target_column
        dtypes = dict(df.dtypes)
        if tgt not in dtypes:
            raise ValueError(f"target column {tgt!r} not found")
        categorical = not _is_numeric(dtypes[tgt])

        aggs = [F.count(F.lit(1)).alias("__n")]
        if categorical:
            # reference casts the target to float per feature and the cast
            # raises for strings → every corr lands on 0.0 via its
            # except-arm (concept.py:136-141); skip the aggregate work
            corr_feats: list[str] = []
        else:
            corr_feats = features
            t = F.col(tgt).cast("double")
            for i, c in enumerate(corr_feats):
                aggs.append(
                    _safe_corr(F.col(c).cast("double"), t).alias(f"__c{i}")
                )
            aggs += [
                F.mean(t).alias("__mean"),
                F.stddev(t).alias("__std"),
                F.min(t).alias("__min"),
                F.max(t).alias("__max"),
            ]
        row = df.agg(*aggs).collect()[0]
        # corr over <2 pairwise-valid rows / zero variance → reference
        # returns 0.0 (concept.py:140,173,183); Spark yields NULL or NaN
        corrs = {c: 0.0 for c in features}
        for i, c in enumerate(corr_feats):
            v = row[f"__c{i}"]
            corrs[c] = 0.0 if v is None or math.isnan(v) else float(v)

        if categorical:
            top = (
                df.filter(F.col(tgt).isNotNull())
                .groupBy(F.col(tgt).cast("string").alias("v"))
                .agg(F.count(F.lit(1)).alias("n"))
                .orderBy(F.desc("n"), "v")
                .limit(self.max_categories)
                .collect()
            )
            total = sum(int(r["n"]) for r in top)
            props = {r["v"]: int(r["n"]) / total for r in top} if total else {}
            return ConceptSummary(
                n=int(row["__n"]),
                correlations=corrs,
                target_type="categorical",
                proportions=props,
            )
        return ConceptSummary(
            n=int(row["__n"]),
            correlations=corrs,
            target_type="numeric",
            mean=float(row["__mean"]) if row["__mean"] is not None else None,
            std=float(row["__std"]) if row["__std"] is not None else None,
            min=float(row["__min"]) if row["__min"] is not None else None,
            max=float(row["__max"]) if row["__max"] is not None else None,
        )

    # -- fit / detect ---------------------------------------------------------
    def fit(self, reference: DataFrame) -> "ConceptDriftDetector":
        self._fit_features = self._features_of(reference)
        self.reference_ = self.summarize(reference, self._fit_features)
        return self

    def detect(
        self, current: DataFrame, columns: list[str] | None = None
    ) -> ConceptDriftResult:
        if self.reference_ is None:
            raise ValueError("fit() must run before detect()")
        ref = self.reference_
        check = [
            c
            for c in (columns or self._fit_features)
            if c in current.columns
        ]
        cur = self.summarize(current, check)

        column_scores: list[tuple[str, float]] = []
        changes: list[str] = []
        for c in check:
            ref_corr = ref.correlations.get(c, 0.0)
            cur_corr = cur.correlations.get(c, 0.0)
            diff = abs(cur_corr - ref_corr)
            # relationship reversal penalty (concept.py:273)
            if ref_corr * cur_corr < 0 and abs(ref_corr) > 0.1 and abs(cur_corr) > 0.1:
                diff += 0.5
                changes.append(f"{c}: sign changed")
            score = min(1.0, diff / 0.5)  # 0.5 corr change → score 1.0
            column_scores.append((c, score))
            if score > 0.3:
                changes.append(f"{c}: {ref_corr:.2f} -> {cur_corr:.2f}")

        target_score = self._target_drift(ref, cur)
        if target_score > 0.3:
            column_scores.append(("_target_distribution", target_score))

        max_score = max((s for _, s in column_scores), default=0.0)
        avg_score = (
            sum(s for _, s in column_scores) / len(column_scores)
            if column_scores
            else 0.0
        )
        is_drifted = max_score >= self.threshold
        if target_score >= self.threshold:
            drift_type = "target_shift"
        elif max_score >= self.threshold:
            drifted = [c for c, s in column_scores if s >= self.threshold]
            drift_type = (
                "concept_shift"
                if len(drifted) > len(check) / 2
                else "partial_concept_drift"
            )
        else:
            drift_type = "none"
        return ConceptDriftResult(
            is_drifted=is_drifted,
            drift_score=max_score,
            column_scores=column_scores,
            drift_type=drift_type,
            confidence=1.0 - avg_score,
            details="; ".join(changes) if changes else "No significant changes",
        )

    # -- target-distribution score (concept.py:328-381) ----------------------
    @staticmethod
    def _target_drift(ref: ConceptSummary, cur: ConceptSummary) -> float:
        if ref.target_type != cur.target_type:
            return 1.0
        if ref.target_type == "categorical":
            ref_vals, cur_vals = set(ref.proportions), set(cur.proportions)
            score = 0.0
            new_mass = sum(cur.proportions.get(v, 0.0) for v in cur_vals - ref_vals)
            missing_mass = sum(
                ref.proportions.get(v, 0.0) for v in ref_vals - cur_vals
            )
            score = max(score, new_mass, missing_mass)
            for v in ref_vals & cur_vals:
                score = max(score, abs(cur.proportions[v] - ref.proportions[v]))
            return min(1.0, score)
        ref_std = ref.std or 1.0
        mean_drift = abs((cur.mean or 0.0) - (ref.mean or 0.0)) / ref_std
        cur_std = cur.std if cur.std is not None else ref_std
        std_drift = abs(cur_std / ref_std - 1.0) if ref_std > 0 else 0.0
        return min(1.0, max(mean_drift / 3.0, std_drift))

    # -- persistence (ml/persistence.py registry) -----------------------------
    def to_payload(self) -> dict[str, Any]:
        if self.reference_ is None:
            raise ValueError("fit() before saving")
        return {
            "target_column": self.target_column,
            "feature_columns": self.feature_columns,
            "threshold": self.threshold,
            "max_categories": self.max_categories,
            "fit_features": self._fit_features,
            "reference": self.reference_.to_dict(),
        }

    @classmethod
    def from_payload(cls, payload: dict[str, Any]) -> "ConceptDriftDetector":
        det = cls(
            target_column=payload["target_column"],
            feature_columns=payload.get("feature_columns"),
            threshold=float(payload["threshold"]),
            max_categories=int(payload["max_categories"]),
        )
        det._fit_features = list(payload["fit_features"])
        det.reference_ = ConceptSummary.from_dict(payload["reference"])
        return det


def concept_drift_table(
    baseline: DataFrame,
    current: DataFrame,
    target_column: str,
    feature_columns: list[str],
    decimals: int = 6,
) -> DataFrame:
    """Relational per-feature concept-drift table — the oracle-friendly
    surface: (feature, ref_corr, cur_corr, corr_change, score) per
    feature, scores per the reference formula (sign-change penalty
    included). Correlations are Pearson over pairwise non-null rows —
    exactly SQL ``corr(feature, target)`` — so DuckDB certifies every
    value; one aggregate per side, a features-sized result."""

    def side(df: DataFrame, tag: str) -> DataFrame:
        t = F.col(target_column).cast("double")
        aggs = [
            F.coalesce(
                _safe_corr(F.col(c).cast("double"), t), F.lit(0.0)
            ).alias(f"{tag}_{i}")
            for i, c in enumerate(feature_columns)
        ]
        return df.agg(*aggs)

    b, c = side(baseline, "b"), side(current, "c")
    wide = b.crossJoin(c)
    # ONE explode over a per-feature struct array — a unionByName of
    # per-feature selects would consume `wide` N times and re-run both
    # side aggregates N times (r8 lazy-reuse audit)
    structs = []
    for i, feat in enumerate(feature_columns):
        rb, rc = F.col(f"b_{i}"), F.col(f"c_{i}")
        diff = F.abs(rc - rb) + F.when(
            (rb * rc < 0) & (F.abs(rb) > 0.1) & (F.abs(rc) > 0.1), F.lit(0.5)
        ).otherwise(F.lit(0.0))
        structs.append(
            F.struct(
                F.lit(feat).alias("feature"),
                F.round(rb, decimals).alias("ref_corr"),
                F.round(rc, decimals).alias("cur_corr"),
                F.round(F.abs(rc - rb), decimals).alias("corr_change"),
                F.round(F.least(F.lit(1.0), diff / 0.5), decimals).alias("score"),
            )
        )
    return wide.select(F.explode(F.array(*structs)).alias("r")).select("r.*")


def concept_drift_grouped(
    baseline: DataFrame,
    current: DataFrame,
    target_column: str,
    feature_columns: list[str],
    group_col: str,
    decimals: int = 6,
) -> DataFrame:
    """Per-SEGMENT concept drift — the grouped-one-pass design applied
    to the feature↔target correlation shift: every segment's whole
    per-feature drift table from ONE ``groupBy(group)`` correlation
    batch per side (``F.corr`` is an aggregate function, so N segments
    cost the same two aggregates as one), a group-sized join, and one
    explode. A model can hold its global feature↔target structure while
    one tenant's relationship quietly inverts — this is the audit that
    sees it.

    Per-(group, feature) scores mirror :func:`concept_drift_table`
    exactly (|Δcorr|/0.5, sign-change penalty); segments missing from
    either side report NULL scores (inner join semantics would drop
    them — the full join + NULL convention keeps them loud). Returns
    (group, feature, ref_corr, cur_corr, corr_change, score)."""
    grp = F.coalesce(F.col(group_col).cast("string"), F.lit("__null__"))
    t = F.col(target_column).cast("double")

    def side(df: DataFrame, tag: str) -> DataFrame:
        aggs = [
            F.coalesce(
                _safe_corr(F.col(c).cast("double"), t), F.lit(0.0)
            ).alias(f"{tag}_{i}")
            for i, c in enumerate(feature_columns)
        ]
        return df.groupBy(grp.alias("group")).agg(*aggs)

    wide = side(baseline, "b").join(side(current, "c"), "group", "full")
    structs = []
    for i, feat in enumerate(feature_columns):
        rb, rc = F.col(f"b_{i}"), F.col(f"c_{i}")
        diff = F.abs(rc - rb) + F.when(
            (rb * rc < 0) & (F.abs(rb) > 0.1) & (F.abs(rc) > 0.1), F.lit(0.5)
        ).otherwise(F.lit(0.0))
        # one-sided groups: NULL score, explicitly — F.least SKIPS nulls,
        # so least(1.0, NULL/0.5) would silently read as maximal drift
        score = F.when(
            rb.isNotNull() & rc.isNotNull(),
            F.round(F.least(F.lit(1.0), diff / 0.5), decimals),
        )
        structs.append(
            F.struct(
                F.lit(feat).alias("feature"),
                F.round(rb, decimals).alias("ref_corr"),
                F.round(rc, decimals).alias("cur_corr"),
                F.round(F.abs(rc - rb), decimals).alias("corr_change"),
                score.alias("score"),
            )
        )
    return wide.select(
        "group", F.explode(F.array(*structs)).alias("r")
    ).select("group", "r.*")
