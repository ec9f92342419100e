"""Ensemble anomaly detection: combine fitted detectors' scores.

Reference: ml/anomaly_models/ensemble.py:58 ``EnsembleAnomalyDetector``
(strategies AVERAGE / WEIGHTED_AVERAGE / MAX / MIN / VOTE / UNANIMOUS,
ensemble.py:31) over the statistical detectors of
ml/anomaly_models/statistical.py (ZScore :227, IQR :274, MAD :339).
Reference users tune ensembles, not single detectors — this is the
combiner the per-model persistence layer (ml/persistence.py) was
missing.

Spark-first: the reference scores row-by-row in Python
(ensemble.py:230-234 loops every row per detector). Here each fitted
component is MODEL-sized state (per-column means/stds/quantiles from
one exact aggregate at fit time) whose scoring surface is a pure
COLUMN EXPRESSION — ensemble combination is just more column math
(greatest/least/weighted sums over the per-detector score columns), so
predict() is a map-only plan: no shuffle, no UDF, whole-stage codegen,
identical cost at 100 TB per-row. Per-detector normalized scores and
the combination formulas mirror the reference exactly (formula
citations on each method).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from truthound_spark.core.base import pct_agg

STRATEGIES = ("average", "weighted_average", "max", "min", "vote", "unanimous")


# ---------------------------------------------------------------------------
# fitted component detectors (model-sized state, Column-expression scoring)
# ---------------------------------------------------------------------------
class _FittedDetector:
    """Base: fit() reduces the training frame to per-column scalars; a
    score expression is built from those literals. ``threshold`` is the
    reference's per-detector anomaly gate (ml/base.py:828:
    score_threshold or 1 − contamination)."""

    kind = "base"

    def __init__(
        self,
        columns: list[str],
        score_threshold: float | None = None,
        contamination: float = 0.1,
    ) -> None:
        self.columns = list(columns)
        self.score_threshold = score_threshold
        self.contamination = contamination
        self.stats_: dict[str, dict[str, float]] = {}

    @property
    def threshold(self) -> float:
        if self.score_threshold is not None:
            return self.score_threshold
        return 1.0 - self.contamination

    @property
    def is_fitted(self) -> bool:
        return bool(self.stats_)

    def fit(self, df: DataFrame) -> "_FittedDetector":
        raise NotImplementedError

    def _column_score(self, c: str) -> Column:
        raise NotImplementedError

    def score_col(self) -> Column:
        """Per-row score = max over fitted columns (reference
        statistical.py:164-205); null values score 0.0."""
        if not self.is_fitted:
            raise ValueError(f"{self.kind}: fit() before scoring")
        exprs = [
            F.coalesce(self._column_score(c), F.lit(0.0)) for c in self.columns
        ]
        return exprs[0] if len(exprs) == 1 else F.greatest(*exprs)

    # -- persistence -----------------------------------------------------------
    def to_dict(self) -> dict[str, Any]:
        return {
            "kind": self.kind,
            "columns": self.columns,
            "score_threshold": self.score_threshold,
            "contamination": self.contamination,
            "stats": self.stats_,
            "params": self._params(),
        }

    def _params(self) -> dict[str, Any]:
        return {}


class ZScoreDetector(_FittedDetector):
    """|x−μ|/σ normalized by z_threshold, capped at 1
    (reference statistical.py:227-269). σ==0 → 0 at the mean else 1
    (the reference's ``inf`` is ≥ every threshold; the cap keeps scores
    in [0,1] with identical classifications)."""

    kind = "zscore"

    def __init__(self, columns: list[str], z_threshold: float = 3.0, **kw: Any) -> None:
        super().__init__(columns, **kw)
        self.z_threshold = z_threshold

    def _params(self) -> dict[str, Any]:
        return {"z_threshold": self.z_threshold}

    def fit(self, df: DataFrame) -> "ZScoreDetector":
        aggs = []
        for c in self.columns:
            x = F.col(c).cast("double")
            aggs += [F.mean(x).alias(f"{c}__mean"), F.stddev(x).alias(f"{c}__std")]
        row = df.agg(*aggs).collect()[0]
        self.stats_ = {
            c: {
                "mean": float(row[f"{c}__mean"] or 0.0),
                "std": float(row[f"{c}__std"] or 1.0),
            }
            for c in self.columns
        }
        return self

    def _column_score(self, c: str) -> Column:
        s = self.stats_[c]
        x = F.col(c).cast("double")
        if s["std"] == 0:
            return F.when(x == s["mean"], 0.0).otherwise(1.0)
        return F.least(
            F.lit(1.0), F.abs(x - s["mean"]) / s["std"] / self.z_threshold
        )


class IQRDetector(_FittedDetector):
    """Distance beyond [q1−k·IQR, q3+k·IQR] in IQR units, capped at 1
    (reference statistical.py:274-336). Exact percentiles by default —
    ``approx=True`` switches to the mergeable sketch (the 100 TB fit
    path; scoring is unaffected)."""

    kind = "iqr"

    def __init__(
        self, columns: list[str], k: float = 1.5, approx: bool = False, **kw: Any
    ) -> None:
        super().__init__(columns, **kw)
        self.k = k
        self.approx = approx

    def _params(self) -> dict[str, Any]:
        return {"k": self.k, "approx": self.approx}

    def fit(self, df: DataFrame) -> "IQRDetector":
        aggs = [
            pct_agg(F.col(c).cast("double"), [0.25, 0.5, 0.75], self.approx).alias(
                f"{c}__q"
            )
            for c in self.columns
        ]
        row = df.agg(*aggs).collect()[0]
        self.stats_ = {}
        for c in self.columns:
            q = list(row[f"{c}__q"] or [0.0, 0.0, 0.0])
            q1, med, q3 = float(q[0] or 0.0), float(q[1] or 0.0), float(q[2] or 0.0)
            iqr = q3 - q1
            self.stats_[c] = {
                "q1": q1,
                "median": med,
                "q3": q3,
                "iqr": iqr,
                "lower": q1 - self.k * iqr,
                "upper": q3 + self.k * iqr,
            }
        return self

    def _column_score(self, c: str) -> Column:
        s = self.stats_[c]
        x = F.col(c).cast("double")
        if s["iqr"] == 0:
            return F.when((x >= s["lower"]) & (x <= s["upper"]), 0.0).otherwise(1.0)
        return (
            F.when(x < s["lower"], F.least(F.lit(1.0), (s["lower"] - x) / s["iqr"]))
            .when(x > s["upper"], F.least(F.lit(1.0), (x - s["upper"]) / s["iqr"]))
            .otherwise(0.0)
        )


class MADDetector(_FittedDetector):
    """Modified z-score 0.6745·|x−median|/MAD normalized by z_threshold
    (reference statistical.py:339-412). MAD==0 → 0 at the median else 1."""

    kind = "mad"

    def __init__(self, columns: list[str], z_threshold: float = 3.0, **kw: Any) -> None:
        super().__init__(columns, **kw)
        self.z_threshold = z_threshold

    def _params(self) -> dict[str, Any]:
        return {"z_threshold": self.z_threshold}

    def fit(self, df: DataFrame) -> "MADDetector":
        med_row = df.agg(
            *[
                pct_agg(F.col(c).cast("double"), 0.5).alias(f"{c}__med")
                for c in self.columns
            ]
        ).collect()[0]
        meds = {c: float(med_row[f"{c}__med"] or 0.0) for c in self.columns}
        mad_row = df.agg(
            *[
                pct_agg(F.abs(F.col(c).cast("double") - meds[c]), 0.5).alias(
                    f"{c}__mad"
                )
                for c in self.columns
            ]
        ).collect()[0]
        self.stats_ = {
            c: {"median": meds[c], "mad": float(mad_row[f"{c}__mad"] or 0.0)}
            for c in self.columns
        }
        return self

    def _column_score(self, c: str) -> Column:
        s = self.stats_[c]
        x = F.col(c).cast("double")
        if s["mad"] == 0:
            return F.when(x == s["median"], 0.0).otherwise(1.0)
        return F.least(
            F.lit(1.0),
            F.lit(0.6745) * F.abs(x - s["median"]) / s["mad"] / self.z_threshold,
        )


_DETECTOR_KINDS = {"zscore": ZScoreDetector, "iqr": IQRDetector, "mad": MADDetector}


def detector_from_dict(d: dict[str, Any]) -> _FittedDetector:
    cls = _DETECTOR_KINDS[d["kind"]]
    det = cls(
        d["columns"],
        score_threshold=d.get("score_threshold"),
        contamination=float(d.get("contamination", 0.1)),
        **(d.get("params") or {}),
    )
    det.stats_ = {c: {k: float(v) for k, v in s.items()} for c, s in d["stats"].items()}
    return det


# ---------------------------------------------------------------------------
# ensemble
# ---------------------------------------------------------------------------
class EnsembleAnomalyDetector:
    """Combine component detectors (reference ensemble.py:58).

    default components when none given: ZScore + IQR + MAD
    (ensemble.py:155-167). Weights normalize to sum 1 at fit
    (ensemble.py:182-187)."""

    def __init__(
        self,
        detectors: list[_FittedDetector] | None = None,
        strategy: str = "average",
        weights: list[float] | None = None,
        vote_threshold: float = 0.5,
        score_threshold: float | None = None,
        contamination: float = 0.1,
    ) -> None:
        if strategy not in STRATEGIES:
            raise ValueError(f"strategy must be one of {STRATEGIES}")
        self.detectors = list(detectors or [])
        self.strategy = strategy
        self.weights = list(weights) if weights else None
        self.vote_threshold = vote_threshold
        self.score_threshold = score_threshold
        self.contamination = contamination
        self.weights_: list[float] = []
        self._fitted = False

    @property
    def threshold(self) -> float:
        if self.score_threshold is not None:
            return self.score_threshold
        return 1.0 - self.contamination

    def add_detector(self, det: _FittedDetector, weight: float = 1.0) -> None:
        self.detectors.append(det)
        if self.weights is None:
            self.weights = [1.0] * (len(self.detectors) - 1)
        self.weights.append(weight)

    def _ensure_weights(self) -> list[float]:
        if self.weights is None:
            self.weights = [1.0] * len(self.detectors)
        return self.weights

    @classmethod
    def from_fitted(
        cls,
        detectors: list[_FittedDetector],
        strategy: str = "average",
        weights: list[float] | None = None,
        **kw: Any,
    ) -> "EnsembleAnomalyDetector":
        """Assemble already-fitted components (fit each detector once,
        combine under several strategies without refitting)."""
        if not all(d.is_fitted for d in detectors):
            raise ValueError("all detectors must be fitted")
        ens = cls(detectors=detectors, strategy=strategy, weights=weights, **kw)
        w = ens._ensure_weights()
        if len(w) != len(detectors):
            raise ValueError("weights length != number of detectors")
        total = sum(w)
        ens.weights_ = [x / total for x in w] if total > 0 else list(w)
        ens._fitted = True
        return ens

    def fit(self, df: DataFrame, columns: list[str] | None = None) -> "EnsembleAnomalyDetector":
        if not self.detectors:
            cols = columns or [
                c for c, t in df.dtypes
                if t.split("(")[0]
                in ("tinyint", "smallint", "int", "bigint", "float", "double", "decimal")
            ]
            self.detectors = [
                ZScoreDetector(cols),
                IQRDetector(cols),
                MADDetector(cols),
            ]
        for d in self.detectors:
            d.fit(df)
        w = self._ensure_weights()
        if len(w) != len(self.detectors):
            raise ValueError("weights length != number of detectors")
        total = sum(w)
        self.weights_ = [x / total for x in w] if total > 0 else w
        self._fitted = True
        return self

    # -- score combination (reference _combine_scores{,_with_votes}) ---------
    def _combined_col(self, score_cols: list[Column]) -> Column:
        n = len(score_cols)
        avg = sum(score_cols[1:], score_cols[0]) / n
        if self.strategy == "average":
            return avg
        if self.strategy == "weighted_average":
            parts = [s * w for s, w in zip(score_cols, self.weights_)]
            return sum(parts[1:], parts[0])
        if self.strategy == "max":
            return F.greatest(*score_cols) if n > 1 else score_cols[0]
        if self.strategy == "min":
            return F.least(*score_cols) if n > 1 else score_cols[0]
        flags = [
            (s >= d.threshold).cast("int")
            for s, d in zip(score_cols, self.detectors)
        ]
        votes = sum(flags[1:], flags[0])
        if self.strategy == "vote":
            # weighted avg of AGREEING detectors' scores when the vote
            # ratio clears vote_threshold, else 0 (ensemble.py:287-295)
            agreeing_sum = sum(
                (s * f for s, f in zip(score_cols[1:], flags[1:])),
                score_cols[0] * flags[0],
            )
            return F.when(
                votes / F.lit(float(n)) >= self.vote_threshold,
                F.coalesce(F.try_divide(agreeing_sum, votes.cast("double")), F.lit(0.0)),
            ).otherwise(0.0)
        # unanimous (ensemble.py:297-300)
        return F.when(votes == n, avg).otherwise(0.0)

    def with_scores(
        self, df: DataFrame, out: str = "anomaly_score", per_detector: bool = False
    ) -> DataFrame:
        """Append the combined score column (and optionally each
        component's) — map-only column math."""
        if not self._fitted:
            raise ValueError("fit() before scoring")
        names = []
        for i, d in enumerate(self.detectors):
            names.append(f"__s{i}")
            df = df.withColumn(f"__s{i}", d.score_col())
        score_cols = [F.col(x) for x in names]
        df = df.withColumn(out, self._combined_col(score_cols))
        if per_detector:
            for i, d in enumerate(self.detectors):
                df = df.withColumnRenamed(f"__s{i}", f"{out}_{d.kind}")
        else:
            df = df.drop(*names)
        return df

    def predict(self, df: DataFrame, out: str = "anomaly_score") -> DataFrame:
        """Scores + is_anomaly + votes/confidence/anomaly_type columns
        (reference predict(), ensemble.py:305-400) — still map-only."""
        if not self._fitted:
            raise ValueError("fit() before scoring")
        n = len(self.detectors)
        names = []
        for i, d in enumerate(self.detectors):
            names.append(f"__s{i}")
            df = df.withColumn(f"__s{i}", d.score_col())
        score_cols = [F.col(x) for x in names]
        flags = [
            (s >= d.threshold).cast("int")
            for s, d in zip(score_cols, self.detectors)
        ]
        votes = sum(flags[1:], flags[0])
        df = df.withColumn(out, self._combined_col(score_cols))
        df = df.withColumn("detector_votes", votes)
        if self.strategy in ("vote", "unanimous"):
            is_anom = F.col(out) > 0
        else:
            is_anom = F.col(out) >= self.threshold
        df = df.withColumn("is_anomaly", is_anom)
        df = df.withColumn(
            "confidence", F.col("detector_votes").cast("double") / n
        )
        df = df.withColumn(
            "anomaly_type",
            F.when(F.col("detector_votes") == n, "collective")
            .when(F.col("detector_votes") >= n // 2, "contextual")
            .otherwise("point"),
        )
        return df.drop(*names)

    # -- persistence -----------------------------------------------------------
    def to_payload(self) -> dict[str, Any]:
        if not self._fitted:
            raise ValueError("fit() before saving")
        return {
            "strategy": self.strategy,
            "vote_threshold": self.vote_threshold,
            "score_threshold": self.score_threshold,
            "contamination": self.contamination,
            "weights": self.weights_,
            "detectors": [d.to_dict() for d in self.detectors],
        }

    @classmethod
    def from_payload(cls, payload: dict[str, Any]) -> "EnsembleAnomalyDetector":
        ens = cls(
            detectors=[detector_from_dict(d) for d in payload["detectors"]],
            strategy=payload["strategy"],
            weights=payload["weights"],
            vote_threshold=float(payload["vote_threshold"]),
            score_threshold=payload.get("score_threshold"),
            contamination=float(payload.get("contamination", 0.1)),
        )
        ens.weights_ = [float(w) for w in payload["weights"]]
        ens._fitted = True
        return ens
