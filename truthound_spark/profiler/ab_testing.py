"""A/B threshold experiments: variants, fused evaluation, statistics, tracking.

Reference surfaces re-expressed (NOT translated):
  * profiler/ab_testing/base.py:19-257 — ExperimentStatus / MetricType /
    VariantType enums, ThresholdVariant / ExperimentConfig / MetricResult /
    StatisticalAnalysis / ExperimentResult containers;
  * profiler/ab_testing/experiment.py:32-395 — ABExperiment /
    MultiVariantExperiment / ExperimentRunner lifecycle and the default
    null/min/max threshold validation semantics;
  * profiler/ab_testing/analysis.py:21-449 — StatisticalAnalyzer (Welch
    z-test, Cohen's d, power, confidence interval, winner/recommendation,
    guardrails) plus calculate_sample_size / is_significant helpers;
  * profiler/ab_testing/tracking.py:26-368 — ExperimentStore (file/memory)
    and ExperimentTracker.

Spark-first design — the reference runs ONE FULL VALIDATION PASS PER
VARIANT (experiment.py:112-127 loops variants, each `_run_variant` walks
every column of the materialized frame). Here every variant's metrics
come out of a SINGLE fused aggregate over the DataFrame: each (variant,
column, gate) contributes one `sum(when(...))` / `count` expression to
one `df.agg(...)`, so an experiment with 1 control + 9 treatments costs
exactly one scan — the same shape the repo's fused validator suite uses.
At 100 TB that is the difference between 1 scan and N_variants scans;
the per-variant work after the scan is O(variants × columns) driver-side
arithmetic on a handful of longs. Scan count: 1 (plus nothing else —
precision/recall confusion counts ride the same aggregate when a label
column is given).

Traffic-split assignment (`assign_variants`) is pure column math
(xxhash64 bucket → weighted cumulative ranges), deterministic under
`seed`, no UDF, no shuffle.

All analysis statistics are closed-form (normal CDF via math.erf), so
the fused violation counts are SQL-replayable — the
`ab_experiment_customer` oracle slot certifies the per-variant metric
vector against DuckDB.
"""

from __future__ import annotations

import json
import math
import os
import threading
import time
import uuid
from dataclasses import dataclass, field
from enum import Enum
from typing import Any, Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

import logging

logger = logging.getLogger(__name__)

__all__ = [
    "ExperimentStatus",
    "MetricType",
    "VariantType",
    "ThresholdVariant",
    "ExperimentConfig",
    "MetricResult",
    "StatisticalAnalysis",
    "ExperimentResult",
    "ABExperiment",
    "MultiVariantExperiment",
    "ExperimentRunner",
    "StatisticalAnalyzer",
    "ExperimentStore",
    "FileExperimentStore",
    "MemoryExperimentStore",
    "ExperimentTracker",
    "variant_metrics_df",
    "assign_variants",
    "analyze_results",
    "calculate_sample_size",
    "is_significant",
]


# ---------------------------------------------------------------------------
# enums + containers (reference ab_testing/base.py)
# ---------------------------------------------------------------------------


class ExperimentStatus(str, Enum):
    DRAFT = "draft"
    RUNNING = "running"
    PAUSED = "paused"
    COMPLETED = "completed"
    FAILED = "failed"
    CANCELLED = "cancelled"


class MetricType(str, Enum):
    VIOLATION_COUNT = "violation_count"
    VIOLATION_RATE = "violation_rate"
    FALSE_POSITIVE_RATE = "false_positive_rate"
    FALSE_NEGATIVE_RATE = "false_negative_rate"
    PRECISION = "precision"
    RECALL = "recall"
    F1_SCORE = "f1_score"
    EXECUTION_TIME = "execution_time"
    FLAGGED_ROW_RATE = "flagged_row_rate"
    DATA_QUALITY_SCORE = "data_quality_score"
    CUSTOM = "custom"


#: metrics where a LOWER value wins (analysis.py:144-150)
_LOWER_IS_BETTER = {
    MetricType.VIOLATION_COUNT,
    MetricType.VIOLATION_RATE,
    MetricType.FALSE_POSITIVE_RATE,
    MetricType.FALSE_NEGATIVE_RATE,
    MetricType.EXECUTION_TIME,
    MetricType.FLAGGED_ROW_RATE,
}


class VariantType(str, Enum):
    CONTROL = "control"
    TREATMENT = "treatment"


@dataclass
class ThresholdVariant:
    """One threshold configuration under test (base.py:67-89).

    ``thresholds`` keys:
      * ``null_threshold`` — global max null ratio per column;
      * ``min_value`` / ``max_value`` — global numeric range gates;
      * ``<column>: {...}`` — per-column overrides of any of the above.
    """

    name: str
    variant_type: VariantType = VariantType.TREATMENT
    thresholds: dict[str, Any] = field(default_factory=dict)
    description: str = ""
    weight: float = 0.5
    metadata: dict[str, Any] = field(default_factory=dict)

    def gate(self, column: str, key: str, default: Any = None) -> Any:
        """Per-column override wins over the global key (experiment.py:221-226)."""
        over = self.thresholds.get(column)
        if isinstance(over, dict) and key in over:
            return over[key]
        return self.thresholds.get(key, default)

    def to_dict(self) -> dict[str, Any]:
        return {
            "name": self.name,
            "variant_type": self.variant_type.value,
            "thresholds": self.thresholds,
            "description": self.description,
            "weight": self.weight,
            "metadata": self.metadata,
        }


@dataclass
class ExperimentConfig:
    """Experiment configuration (base.py:92-137)."""

    name: str
    description: str = ""
    control: ThresholdVariant | None = None
    treatments: list[ThresholdVariant] = field(default_factory=list)
    primary_metric: MetricType = MetricType.VIOLATION_RATE
    secondary_metrics: list[MetricType] = field(default_factory=list)
    confidence_level: float = 0.95
    minimum_effect_size: float = 0.05
    minimum_sample_size: int = 100
    maximum_sample_size: int = 100_000
    allocation_strategy: str = "equal"  # equal | weighted
    early_stopping: bool = True
    early_stopping_threshold: float = 0.01
    guardrail_metrics: list[tuple[MetricType, str, float]] = field(
        default_factory=list
    )
    tags: list[str] = field(default_factory=list)
    metadata: dict[str, Any] = field(default_factory=dict)

    def variants(self) -> list[ThresholdVariant]:
        out = []
        if self.control is not None:
            out.append(self.control)
        out.extend(self.treatments)
        return out

    def to_dict(self) -> dict[str, Any]:
        return {
            "name": self.name,
            "description": self.description,
            "control": self.control.to_dict() if self.control else None,
            "treatments": [t.to_dict() for t in self.treatments],
            "primary_metric": self.primary_metric.value,
            "secondary_metrics": [m.value for m in self.secondary_metrics],
            "confidence_level": self.confidence_level,
            "minimum_effect_size": self.minimum_effect_size,
            "minimum_sample_size": self.minimum_sample_size,
            "early_stopping": self.early_stopping,
            "tags": self.tags,
            "metadata": self.metadata,
        }


@dataclass
class MetricResult:
    """One (variant, metric) observation (base.py:145-166)."""

    metric_type: MetricType
    variant_name: str
    value: float
    sample_size: int
    std_dev: float = 0.0
    confidence_interval: tuple[float, float] = (0.0, 0.0)

    def to_dict(self) -> dict[str, Any]:
        return {
            "metric_type": self.metric_type.value,
            "variant_name": self.variant_name,
            "value": self.value,
            "sample_size": self.sample_size,
            "std_dev": self.std_dev,
            "confidence_interval": list(self.confidence_interval),
        }


@dataclass
class StatisticalAnalysis:
    """Control-vs-treatment comparison (base.py:169-206)."""

    metric_type: MetricType
    treatment_name: str
    control_mean: float
    treatment_mean: float
    absolute_difference: float
    relative_difference: float
    p_value: float
    is_significant: bool
    confidence_level: float
    confidence_interval: tuple[float, float]
    effect_size: float
    power: float
    sample_size_control: int
    sample_size_treatment: int
    winner: str | None = None
    recommendation: str = ""

    def to_dict(self) -> dict[str, Any]:
        d = dict(self.__dict__)
        d["metric_type"] = self.metric_type.value
        d["confidence_interval"] = list(self.confidence_interval)
        return d


@dataclass
class ExperimentResult:
    """Complete experiment outcome (base.py:209-257)."""

    experiment_id: str
    experiment_name: str
    status: ExperimentStatus
    started_at: float
    ended_at: float | None
    control_metrics: dict[MetricType, MetricResult] = field(default_factory=dict)
    treatment_metrics: dict[str, dict[MetricType, MetricResult]] = field(
        default_factory=dict
    )
    primary_analysis: StatisticalAnalysis | None = None
    secondary_analyses: list[StatisticalAnalysis] = field(default_factory=list)
    winner: str | None = None
    recommendation: str = ""
    guardrail_violations: list[str] = field(default_factory=list)
    total_samples: int = 0
    metadata: dict[str, Any] = field(default_factory=dict)

    def to_dict(self) -> dict[str, Any]:
        return {
            "experiment_id": self.experiment_id,
            "experiment_name": self.experiment_name,
            "status": self.status.value,
            "started_at": self.started_at,
            "ended_at": self.ended_at,
            "control_metrics": {
                k.value: v.to_dict() for k, v in self.control_metrics.items()
            },
            "treatment_metrics": {
                name: {k.value: v.to_dict() for k, v in m.items()}
                for name, m in self.treatment_metrics.items()
            },
            "primary_analysis": (
                self.primary_analysis.to_dict() if self.primary_analysis else None
            ),
            "secondary_analyses": [a.to_dict() for a in self.secondary_analyses],
            "winner": self.winner,
            "recommendation": self.recommendation,
            "guardrail_violations": self.guardrail_violations,
            "total_samples": self.total_samples,
            "metadata": self.metadata,
        }


# ---------------------------------------------------------------------------
# fused variant evaluation — the Spark-side core
# ---------------------------------------------------------------------------

_NUMERIC_TYPES = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
)


def _variant_exprs(
    variant: ThresholdVariant,
    vi: int,
    columns: list[str],
    numeric: set[str],
    label_col: str | None,
):
    """Fused aggregate expressions + driver-side decoders for ONE variant.

    Returns (exprs, decode) where ``decode(row) -> dict[str, float]`` turns
    the single aggregate row into the reference's metric dict
    (experiment.py:204-266 semantics: a column CHECK is violated when its
    null ratio exceeds the gate, or any value falls below min_value /
    above max_value; checks are counted per gate actually configured).
    A row is FLAGGED when any of its configured gates trips on that row
    (null where a null gate exists, or out-of-range) — flagged rows drive
    precision/recall against ``label_col`` in the SAME aggregate.
    """
    exprs: list = []
    gates: list[tuple[str, str]] = []  # (kind, column) in expr order
    flag_parts: list = []
    for c in columns:
        nt = variant.gate(c, "null_threshold", 0.1)
        if nt is not None:
            # emitted only when the gate is active — an explicitly
            # disabled null gate (None) must not cost aggregate work
            exprs.append(
                F.sum(
                    F.when(F.col(c).isNull(), F.lit(1)).otherwise(F.lit(0))
                ).alias(f"v{vi}_null_{c}")
            )
            gates.append(("null", c))
            flag_parts.append(F.col(c).isNull())
        if c in numeric:
            mn = variant.gate(c, "min_value")
            mx = variant.gate(c, "max_value")
            if mn is not None:
                exprs.append(
                    F.sum(
                        F.when(F.col(c) < F.lit(mn), F.lit(1)).otherwise(F.lit(0))
                    ).alias(f"v{vi}_min_{c}")
                )
                gates.append(("min", c))
                flag_parts.append(F.col(c) < F.lit(mn))
            if mx is not None:
                exprs.append(
                    F.sum(
                        F.when(F.col(c) > F.lit(mx), F.lit(1)).otherwise(F.lit(0))
                    ).alias(f"v{vi}_max_{c}")
                )
                gates.append(("max", c))
                flag_parts.append(F.col(c) > F.lit(mx))

    flag = flag_parts[0] if flag_parts else F.lit(False)
    for p in flag_parts[1:]:
        flag = flag | p
    exprs.append(F.sum(F.when(flag, 1).otherwise(0)).alias(f"v{vi}_flagged"))
    if label_col is not None:
        lbl = F.col(label_col).cast("boolean")
        exprs.append(
            F.sum(F.when(flag & lbl, 1).otherwise(0)).alias(f"v{vi}_tp")
        )
        exprs.append(
            F.sum(F.when(flag & ~lbl, 1).otherwise(0)).alias(f"v{vi}_fp")
        )
        exprs.append(
            F.sum(F.when(~flag & lbl, 1).otherwise(0)).alias(f"v{vi}_fn")
        )
        exprs.append(
            F.sum(F.when(~flag & ~lbl, 1).otherwise(0)).alias(f"v{vi}_tn")
        )

    def decode(row: dict, n_rows: int) -> dict[str, float]:
        violations = 0
        checks = 0
        for kind, c in gates:
            cnt = row.get(f"v{vi}_{kind}_{c}") or 0
            if kind == "null":
                nt = variant.gate(c, "null_threshold", 0.1)
                checks += 1
                if nt is not None and n_rows > 0 and cnt / n_rows > nt:
                    violations += 1
            else:
                checks += 1
                if cnt > 0:
                    violations += 1
        flagged = row.get(f"v{vi}_flagged") or 0
        out = {
            "violation_count": float(violations),
            "violation_rate": violations / checks if checks else 0.0,
            "flagged_row_rate": flagged / n_rows if n_rows else 0.0,
        }
        if label_col is not None:
            tp = row.get(f"v{vi}_tp") or 0
            fp = row.get(f"v{vi}_fp") or 0
            fn = row.get(f"v{vi}_fn") or 0
            tn = row.get(f"v{vi}_tn") or 0
            prec = tp / (tp + fp) if (tp + fp) else 1.0
            rec = tp / (tp + fn) if (tp + fn) else 1.0
            out["precision"] = prec
            out["recall"] = rec
            out["f1_score"] = (
                2 * prec * rec / (prec + rec) if (prec + rec) else 0.0
            )
            out["false_positive_rate"] = fp / (fp + tn) if (fp + tn) else 0.0
            out["false_negative_rate"] = fn / (fn + tp) if (fn + tp) else 0.0
        return out

    return exprs, decode


def run_fused_variants(
    df: DataFrame,
    variants: list[ThresholdVariant],
    columns: list[str] | None = None,
    label_col: str | None = None,
) -> tuple[dict[str, dict[str, float]], int]:
    """Evaluate EVERY variant's threshold metrics in one aggregate scan.

    Returns ({variant_name: metrics_dict}, n_rows). Scan count: 1.
    Duplicate variant names are rejected loudly — results are keyed by
    name, so two same-named variants would silently collapse to one
    entry (last decoder wins) and skew the analysis unnoticed.
    """
    names = [v.name for v in variants]
    if len(set(names)) != len(names):
        dupes = sorted({n for n in names if names.count(n) > 1})
        raise ValueError(f"duplicate variant names: {dupes}")
    schema = {f.name: f.dataType for f in df.schema.fields}
    if columns is None:
        columns = [c for c in schema if c != label_col]
    numeric = {
        c for c in columns if isinstance(schema.get(c), _NUMERIC_TYPES)
    }
    exprs: list = [F.count(F.lit(1)).alias("n_rows")]
    decoders: list[tuple[str, Callable]] = []
    for vi, v in enumerate(variants):
        ve, dec = _variant_exprs(v, vi, columns, numeric, label_col)
        exprs.extend(ve)
        decoders.append((v.name, dec))
    row = df.agg(*exprs).collect()[0].asDict()
    n_rows = int(row["n_rows"])
    return {name: dec(row, n_rows) for name, dec in decoders}, n_rows


def variant_metrics_df(
    df: DataFrame,
    variants: list[ThresholdVariant],
    columns: list[str] | None = None,
    label_col: str | None = None,
) -> DataFrame:
    """Relational surface of the fused evaluation: one row per variant with
    the full metric vector — the shape the ``ab_experiment_customer``
    oracle slot certifies against DuckDB. Scan count: 1 (the fused
    aggregate); the per-variant pivot is a driver-side createDataFrame of
    ``len(variants)`` rows (model-sized, never row-scaled)."""
    metrics, n_rows = run_fused_variants(df, variants, columns, label_col)
    fields = [
        "violation_count",
        "violation_rate",
        "flagged_row_rate",
    ] + (
        [
            "precision",
            "recall",
            "f1_score",
            "false_positive_rate",
            "false_negative_rate",
        ]
        if label_col is not None
        else []
    )
    # no rounding: each metric is a ratio of exact counts, so the IEEE
    # division is bit-identical to the oracle's SQL division — rounding
    # here (Python half-even) could only ADD cross-engine divergence.
    rows = [
        tuple([v.name] + [float(metrics[v.name][f]) for f in fields])
        for v in variants
    ]
    spark = df.sparkSession
    schema = T.StructType(
        [T.StructField("variant", T.StringType())]
        + [T.StructField(f, T.DoubleType()) for f in fields]
    )
    return spark.createDataFrame(rows, schema)


def assign_variants(
    df: DataFrame,
    variants: list[ThresholdVariant],
    id_col: str,
    strategy: str = "equal",
    seed: int = 42,
    out_col: str = "variant",
) -> DataFrame:
    """Deterministic traffic-split assignment — pure column math, no UDF.

    ``xxhash64(id, seed) pmod 10_000`` → cumulative weighted ranges, so
    the same id always lands in the same variant (sticky assignment, the
    property the reference's allocation_strategy contract needs for
    repeated runs). ``equal`` ignores weights; ``weighted`` uses them.
    """
    if not variants:
        raise ValueError("assign_variants requires at least one variant")
    if strategy == "equal":
        weights = [1.0] * len(variants)
    elif strategy == "weighted":
        weights = [max(float(v.weight), 0.0) for v in variants]
        if sum(weights) <= 0:
            weights = [1.0] * len(variants)
    else:
        raise ValueError(f"unknown allocation strategy: {strategy!r}")
    total = sum(weights)
    bucket = F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(10_000))
    expr = None
    acc = 0.0
    for v, w in zip(variants, weights):
        acc += w / total * 10_000
        cond = bucket < F.lit(int(round(acc)))
        expr = (
            F.when(cond, F.lit(v.name))
            if expr is None
            else expr.when(cond, F.lit(v.name))
        )
    return df.withColumn(out_col, expr.otherwise(F.lit(variants[-1].name)))


# ---------------------------------------------------------------------------
# statistics (reference ab_testing/analysis.py)
# ---------------------------------------------------------------------------


def _normal_cdf(x: float) -> float:
    """Exact-to-double normal CDF (the reference uses the
    Abramowitz–Stegun polynomial, analysis.py:231-240; math.erf is the
    same function without the approximation error). Tail probabilities
    must NOT be computed as 2*(1-_normal_cdf(z)) — that rounds to 0 by
    z≈6; use :func:`_normal_tail`, the erfc form drift/detectors.py's
    Wilson–Hilferty gate also uses, which keeps precision to z≈37."""
    return 0.5 * (1.0 + math.erf(x / math.sqrt(2.0)))


def _normal_tail(z: float) -> float:
    """Two-tailed normal p-value for |z|, precision-safe in the far tail."""
    return math.erfc(abs(z) / math.sqrt(2.0))


def _z_for(confidence: float) -> float:
    """Exact two-tailed critical z for ANY confidence level: the z with
    erfc(z/√2) = alpha, i.e. the true inverse of :func:`_normal_tail`.

    A lookup table falling back to 1.96 (the reference's approach,
    analysis.py:243-247) breaks the is_significant ⟺ "CI excludes 0"
    invariant for any level outside the table (e.g. 0.98: p≈0.028 >
    alpha=0.02 under z≈2.2 yet a 1.96·SE interval excludes 0). A
    Winitzki inverse-erf start refined by Newton on the SAME erfc the
    p-value uses makes the two boundaries bit-consistent to float
    rounding. One shared kernel (truthound_spark/stats.py) serves this
    and sampled.py's Wilson pre-checks, so the two CI layers cannot
    drift apart."""
    from truthound_spark.stats import z_for_confidence

    return z_for_confidence(confidence)


class StatisticalAnalyzer:
    """Welch z-test + effect size + power over an ExperimentResult
    (analysis.py:21-351)."""

    def __init__(self, config: ExperimentConfig):
        self.config = config

    def analyze(self, result: ExperimentResult) -> ExperimentResult:
        primary = self.config.primary_metric
        control = result.control_metrics.get(primary)
        if control is not None:
            analyses = [
                self._analyze_metric(control, tr, primary)
                for tm in result.treatment_metrics.values()
                if (tr := tm.get(primary)) is not None
            ]
            if analyses:
                # primary_analysis = the BEST treatment on the primary
                # metric (significant treatment-wins first), not merely
                # the first configured one — with N treatments the
                # winner must be the best of them, and control wins only
                # when no treatment significantly beats it
                lower = primary in _LOWER_IS_BETTER

                def goodness(a: StatisticalAnalysis) -> float:
                    return -a.treatment_mean if lower else a.treatment_mean

                sig_wins = [
                    a
                    for a in analyses
                    if a.is_significant and a.winner == a.treatment_name
                ]
                best = max(sig_wins or analyses, key=goodness)
                result.primary_analysis = best
                result.secondary_analyses.extend(
                    a for a in analyses if a is not best
                )
        for metric in self.config.secondary_metrics:
            c = result.control_metrics.get(metric)
            if c is None:
                continue
            for name, tm in result.treatment_metrics.items():
                tr = tm.get(metric)
                if tr is not None:
                    result.secondary_analyses.append(
                        self._analyze_metric(c, tr, metric)
                    )
        if result.primary_analysis is not None:
            result.winner = result.primary_analysis.winner
            result.recommendation = result.primary_analysis.recommendation
        result.guardrail_violations = self._check_guardrails(result)
        return result

    def _analyze_metric(
        self,
        control: MetricResult,
        treatment: MetricResult,
        metric_type: MetricType,
    ) -> StatisticalAnalysis:
        cm, tm = control.value, treatment.value
        diff = tm - cm
        rel = diff / cm if cm != 0 else (1.0 if tm > 0 else 0.0)
        pooled = (
            math.sqrt((control.std_dev**2 + treatment.std_dev**2) / 2)
            if (control.std_dev > 0 or treatment.std_dev > 0)
            else 0.1
        )
        effect = diff / pooled if pooled > 0 else 0.0
        se = self._welch_se(
            cm,
            tm,
            control.std_dev,
            treatment.std_dev,
            control.sample_size,
            treatment.sample_size,
        )
        p_value = _normal_tail(diff / se) if se else 1.0
        alpha = 1 - self.config.confidence_level
        significant = p_value < alpha
        # the CI uses the SAME standard error as the z-test, so
        # is_significant and "CI excludes 0" can never disagree (the
        # reference's z*pooled/sqrt(n1+n2) margin is half the
        # test-consistent width at equal n)
        z = _z_for(self.config.confidence_level)
        margin = z * se if se else 0.0
        ci = (diff - margin, diff + margin)
        power = self._power(
            effect, control.sample_size, treatment.sample_size, alpha
        )
        winner = None
        if significant:
            lower_wins = metric_type in _LOWER_IS_BETTER
            better = (tm < cm) if lower_wins else (tm > cm)
            winner = treatment.variant_name if better else control.variant_name
            rec = (
                f"Statistically significant difference detected "
                f"(p={p_value:.4f}). Recommend adopting '{winner}' "
                f"configuration."
            )
        else:
            rec = (
                f"No statistically significant difference (p={p_value:.4f}). "
                f"Consider running experiment longer or with more samples."
            )
        return StatisticalAnalysis(
            metric_type=metric_type,
            treatment_name=treatment.variant_name,
            control_mean=cm,
            treatment_mean=tm,
            absolute_difference=diff,
            relative_difference=rel,
            p_value=p_value,
            is_significant=significant,
            confidence_level=self.config.confidence_level,
            confidence_interval=ci,
            effect_size=effect,
            power=power,
            sample_size_control=control.sample_size,
            sample_size_treatment=treatment.sample_size,
            winner=winner,
            recommendation=rec,
        )

    @staticmethod
    def _welch_se(
        mean1: float,
        mean2: float,
        std1: float,
        std2: float,
        n1: int,
        n2: int,
    ) -> float | None:
        """Welch standard error of the mean difference; when both stds
        are 0 (single-pass proportion metrics), fall back to pooled
        Bernoulli variance (analysis.py:207-215). None = undefined."""
        if n1 <= 0 or n2 <= 0:
            return None
        if std1 == 0 and std2 == 0:
            p_pooled = (mean1 * n1 + mean2 * n2) / (n1 + n2)
            if 0 < p_pooled < 1:
                std1 = std2 = math.sqrt(p_pooled * (1 - p_pooled))
            else:
                return None
        se = math.sqrt(std1**2 / n1 + std2**2 / n2)
        return se if se > 0 else None

    @classmethod
    def _p_value(
        cls,
        mean1: float,
        mean2: float,
        std1: float,
        std2: float,
        n1: int,
        n2: int,
    ) -> float:
        """Two-tailed Welch z-test over :meth:`_welch_se`."""
        se = cls._welch_se(mean1, mean2, std1, std2, n1, n2)
        return _normal_tail((mean2 - mean1) / se) if se else 1.0

    @staticmethod
    def _power(effect_size: float, n1: int, n2: int, alpha: float) -> float:
        if n1 <= 0 or n2 <= 0:
            return 0.0
        n_harmonic = 2 * n1 * n2 / (n1 + n2)
        noncentrality = effect_size * math.sqrt(n_harmonic / 2)
        z_alpha = _z_for(1 - alpha)
        return max(0.0, min(1.0, _normal_cdf(abs(noncentrality) - z_alpha)))

    def _check_guardrails(self, result: ExperimentResult) -> list[str]:
        ops: dict[str, Callable[[float, float], bool]] = {
            "<": lambda v, t: v < t,
            "<=": lambda v, t: v <= t,
            ">": lambda v, t: v > t,
            ">=": lambda v, t: v >= t,
            "==": lambda v, t: abs(v - t) < 1e-4,
        }
        violations: list[str] = []
        for metric, op, threshold in self.config.guardrail_metrics:
            check = ops.get(op)
            if check is None:
                continue
            m = result.control_metrics.get(metric)
            if m is not None and not check(m.value, threshold):
                violations.append(
                    f"Control violates guardrail: {metric.value} {op} {threshold}"
                )
            for name, tm in result.treatment_metrics.items():
                m = tm.get(metric)
                if m is not None and not check(m.value, threshold):
                    violations.append(
                        f"Treatment '{name}' violates guardrail: "
                        f"{metric.value} {op} {threshold}"
                    )
        return violations


def analyze_results(
    result: ExperimentResult, config: ExperimentConfig | None = None
) -> ExperimentResult:
    return StatisticalAnalyzer(config or ExperimentConfig(name="analysis")).analyze(
        result
    )


def calculate_sample_size(
    baseline_rate: float,
    minimum_effect: float,
    power: float = 0.8,
    alpha: float = 0.05,
) -> int:
    """Two-proportion sample size (analysis.py:380-416)."""
    z_alpha = _z_for(1 - alpha)
    z_beta = {0.8: 0.84, 0.9: 1.28}.get(round(power, 2), 0.52)
    p1 = baseline_rate
    p2 = baseline_rate * (1 - minimum_effect)
    p_pooled = (p1 + p2) / 2
    if 0 < p_pooled < 1 and p1 != p2:
        n = (2 * p_pooled * (1 - p_pooled) * (z_alpha + z_beta) ** 2) / (
            (p1 - p2) ** 2
        )
    else:
        n = 10_000
    return max(100, int(math.ceil(n)))


def is_significant(
    control_value: float,
    treatment_value: float,
    control_n: int,
    treatment_n: int,
    alpha: float = 0.05,
) -> bool:
    p = StatisticalAnalyzer._p_value(
        control_value, treatment_value, 0.1, 0.1, control_n, treatment_n
    )
    return p < alpha


# ---------------------------------------------------------------------------
# experiment lifecycle (reference ab_testing/experiment.py)
# ---------------------------------------------------------------------------


class ABExperiment:
    """Threshold A/B experiment over a Spark DataFrame.

    One ``run(df)`` = one fused aggregate scan covering control + every
    treatment (vs the reference's scan-per-variant loop,
    experiment.py:112-127). ``run_batches`` accumulates per-batch metric
    samples (so std_dev is real, not the Bernoulli fallback) and honors
    ``config.early_stopping``: once the primary-metric p-value drops
    under ``early_stopping_threshold`` with at least
    ``minimum_sample_size`` rows seen, remaining batches are skipped.
    """

    def __init__(self, config: ExperimentConfig):
        if config.control is None:
            raise ValueError("ExperimentConfig.control is required")
        self.config = config
        self.experiment_id = uuid.uuid4().hex[:8]
        self.status = ExperimentStatus.DRAFT
        self._validators: dict[str, Callable] = {}
        self._samples: dict[str, list[dict[str, float]]] = {}
        self._rows_seen = 0

    @property
    def is_running(self) -> bool:
        return self.status == ExperimentStatus.RUNNING

    def set_validator(
        self,
        variant_name: str,
        validator: Callable[[DataFrame, dict[str, Any]], dict[str, float]],
    ) -> None:
        """Custom metric function for one variant — takes (df, thresholds),
        returns a metrics dict. A variant with a custom validator runs its
        own pass (it is user code); fused evaluation still covers the rest."""
        self._validators[variant_name] = validator

    # -- single-shot -------------------------------------------------------
    def run(
        self,
        df: DataFrame,
        label_col: str | None = None,
        columns: list[str] | None = None,
    ) -> ExperimentResult:
        self.status = ExperimentStatus.RUNNING
        self._reset()
        started = time.time()
        try:
            metrics, n_rows = self._evaluate(df, label_col, columns)
            for name, m in metrics.items():
                self._samples.setdefault(name, []).append(m)
            self._rows_seen += n_rows
            result = self._build_result(started, n_rows)
            result = StatisticalAnalyzer(self.config).analyze(result)
            self.status = ExperimentStatus.COMPLETED
            result.status = ExperimentStatus.COMPLETED
            return result
        except Exception:
            self.status = ExperimentStatus.FAILED
            raise

    # -- batched with early stopping ----------------------------------------
    def run_batches(
        self,
        batches: list[DataFrame],
        label_col: str | None = None,
        columns: list[str] | None = None,
    ) -> ExperimentResult:
        self.status = ExperimentStatus.RUNNING
        self._reset()
        started = time.time()
        n_rows = 0
        try:
            for df in batches:
                m, n = self._evaluate(df, label_col, columns)
                for name, sample in m.items():
                    self._samples.setdefault(name, []).append(sample)
                n_rows += n
                self._rows_seen += n
                if (
                    self.config.early_stopping
                    and self._rows_seen >= self.config.minimum_sample_size
                ):
                    interim = StatisticalAnalyzer(self.config).analyze(
                        self._build_result(started, n_rows)
                    )
                    pa = interim.primary_analysis
                    if (
                        pa is not None
                        and pa.p_value < self.config.early_stopping_threshold
                    ):
                        interim.metadata["early_stopped"] = True
                        interim.status = ExperimentStatus.COMPLETED
                        self.status = ExperimentStatus.COMPLETED
                        return interim
            result = StatisticalAnalyzer(self.config).analyze(
                self._build_result(started, n_rows)
            )
            result.status = ExperimentStatus.COMPLETED
            self.status = ExperimentStatus.COMPLETED
            return result
        except Exception:
            self.status = ExperimentStatus.FAILED
            raise

    # -- internals -----------------------------------------------------------
    def _reset(self) -> None:
        """run()/run_batches() measure ONE dataset each: accumulated
        per-batch samples and the rows-seen counter must not leak into a
        repeated invocation (doubled n would inflate significance, and
        duplicated identical samples would collapse std toward 0)."""
        self._samples = {}
        self._rows_seen = 0

    def _evaluate(
        self,
        df: DataFrame,
        label_col: str | None,
        columns: list[str] | None,
    ) -> tuple[dict[str, dict[str, float]], int]:
        variants = self.config.variants()
        fused = [v for v in variants if v.name not in self._validators]
        t0 = time.time()
        metrics: dict[str, dict[str, float]] = {}
        n_rows = 0
        if fused:
            metrics, n_rows = run_fused_variants(df, fused, columns, label_col)
            elapsed = time.time() - t0
            for m in metrics.values():
                m["execution_time"] = elapsed
        for v in variants:
            fn = self._validators.get(v.name)
            if fn is not None:
                t1 = time.time()
                m = dict(fn(df, v.thresholds))
                m.setdefault("execution_time", time.time() - t1)
                metrics[v.name] = m
                if n_rows == 0:
                    n_rows = df.count()
        return metrics, n_rows

    def _build_result(self, started: float, n_rows: int) -> ExperimentResult:
        control_name = self.config.control.name
        result = ExperimentResult(
            experiment_id=self.experiment_id,
            experiment_name=self.config.name,
            status=ExperimentStatus.RUNNING,
            started_at=started,
            ended_at=time.time(),
            total_samples=self._rows_seen,
        )
        result.control_metrics = self._aggregate_samples(
            control_name, self._samples.get(control_name, []), result
        )
        for t in self.config.treatments:
            result.treatment_metrics[t.name] = self._aggregate_samples(
                t.name, self._samples.get(t.name, []), result
            )
        return result

    def _aggregate_samples(
        self,
        variant_name: str,
        samples: list[dict[str, float]],
        result: ExperimentResult,
    ) -> dict[MetricType, MetricResult]:
        """Mean + std over per-batch samples → MetricResult per metric.
        Keys that are not MetricType values (a custom validator is free
        to return any dict) are NOT silently dropped: their aggregated
        means surface under ``result.metadata['custom_metrics']`` keyed
        by variant."""
        out: dict[MetricType, MetricResult] = {}
        if not samples:
            return out
        keys = set().union(*(s.keys() for s in samples))
        for key in keys:
            vals = [float(s[key]) for s in samples if key in s]
            mean = sum(vals) / len(vals)
            var = (
                sum((x - mean) ** 2 for x in vals) / (len(vals) - 1)
                if len(vals) > 1
                else 0.0
            )
            try:
                metric = MetricType(key)
            except ValueError:
                result.metadata.setdefault("custom_metrics", {}).setdefault(
                    variant_name, {}
                )[key] = mean
                continue
            out[metric] = MetricResult(
                metric_type=metric,
                variant_name=variant_name,
                value=mean,
                sample_size=self._rows_seen,
                std_dev=math.sqrt(var),
            )
        return out


class MultiVariantExperiment(ABExperiment):
    """Control vs N treatments — identical fused path (the single-scan
    evaluation already covers any variant count; kept for reference API
    parity, experiment.py:302-320)."""


class ExperimentRunner:
    """Run a queue of experiments and pick the global best variant
    (experiment.py:323-395)."""

    def __init__(self) -> None:
        self._experiments: list[ABExperiment] = []
        self.results: list[ExperimentResult] = []
        #: (experiment_id, repr(error)) per experiment that crashed in
        #: run_all — a silently-vanished experiment is indistinguishable
        #: from "ran clean" otherwise (the reference logs the failure
        #: with the experiment id, experiment.py:355).
        self.errors: list[tuple[str, str]] = []

    def add_experiment(self, experiment: ABExperiment) -> None:
        self._experiments.append(experiment)

    def run_all(
        self,
        df: DataFrame,
        label_col: str | None = None,
        columns: list[str] | None = None,
    ) -> list[ExperimentResult]:
        self.results = []
        self.errors = []
        for exp in self._experiments:
            try:
                self.results.append(exp.run(df, label_col, columns))
            except Exception as e:  # noqa: BLE001 — queue keeps draining
                exp_id = getattr(exp, "experiment_id", repr(exp))
                self.errors.append((str(exp_id), f"{type(e).__name__}: {e}"))
                logger.warning("experiment %s failed: %s", exp_id, e)
        return self.results

    def get_best_variant(
        self,
        metric: MetricType = MetricType.VIOLATION_RATE,
        minimize: bool = True,
    ) -> tuple[str, str, float] | None:
        best: tuple[str, str, float] | None = None
        for result in self.results:
            candidates = [("control-slot", result.control_metrics)] + list(
                result.treatment_metrics.items()
            )
            for name, metrics in candidates:
                m = metrics.get(metric)
                if m is None:
                    continue
                value = m.value
                if (
                    best is None
                    or (minimize and value < best[2])
                    or (not minimize and value > best[2])
                ):
                    best = (result.experiment_id, m.variant_name, value)
        return best


# ---------------------------------------------------------------------------
# tracking (reference ab_testing/tracking.py)
# ---------------------------------------------------------------------------


class ExperimentStore:
    """Storage backend contract (tracking.py:26-46)."""

    def save_experiment(self, experiment_id: str, data: dict[str, Any]) -> None:
        raise NotImplementedError

    def load_experiment(self, experiment_id: str) -> dict[str, Any] | None:
        raise NotImplementedError

    def list_experiments(self) -> list[str]:
        raise NotImplementedError

    def delete_experiment(self, experiment_id: str) -> bool:
        raise NotImplementedError


class FileExperimentStore(ExperimentStore):
    """One JSON file per experiment under ``directory`` (tracking.py:49-111)."""

    def __init__(self, directory: str) -> None:
        self.directory = directory
        os.makedirs(directory, exist_ok=True)

    def _path(self, experiment_id: str) -> str:
        """One file per id, collision-free: stripping non-alphanumerics
        alone maps distinct ids onto one file ('a/b' and 'ab' → ab.json,
        silently overwriting each other; an all-symbol id → '.json').
        When sanitization changes the name, a short hash of the ORIGINAL
        id disambiguates — same scheme as DocsVersionStore.report_dir."""
        safe = "".join(ch for ch in experiment_id if ch.isalnum() or ch in "-_")
        if safe != experiment_id:
            import hashlib

            safe += "-" + hashlib.sha256(
                experiment_id.encode("utf-8")
            ).hexdigest()[:8]
        return os.path.join(self.directory, f"{safe}.json")

    def save_experiment(self, experiment_id: str, data: dict[str, Any]) -> None:
        with open(self._path(experiment_id), "w") as fh:
            json.dump(data, fh, indent=2, default=str)

    def load_experiment(self, experiment_id: str) -> dict[str, Any] | None:
        path = self._path(experiment_id)
        if not os.path.exists(path):
            return None
        with open(path) as fh:
            return json.load(fh)

    def list_experiments(self) -> list[str]:
        return sorted(
            f[:-5] for f in os.listdir(self.directory) if f.endswith(".json")
        )

    def delete_experiment(self, experiment_id: str) -> bool:
        path = self._path(experiment_id)
        if os.path.exists(path):
            os.remove(path)
            return True
        return False


class MemoryExperimentStore(ExperimentStore):
    """In-memory store for tests / short-lived experiments
    (tracking.py:114-146)."""

    def __init__(self) -> None:
        self._data: dict[str, dict[str, Any]] = {}
        self._lock = threading.Lock()

    def save_experiment(self, experiment_id: str, data: dict[str, Any]) -> None:
        with self._lock:
            self._data[experiment_id] = data

    def load_experiment(self, experiment_id: str) -> dict[str, Any] | None:
        with self._lock:
            return self._data.get(experiment_id)

    def list_experiments(self) -> list[str]:
        with self._lock:
            return list(self._data)

    def delete_experiment(self, experiment_id: str) -> bool:
        with self._lock:
            return self._data.pop(experiment_id, None) is not None

    def clear(self) -> None:
        with self._lock:
            self._data.clear()


class ExperimentTracker:
    """Experiment lifecycle + result registry (tracking.py:149-356).

    NOT a singleton — the reference's process-global ``__new__`` singleton
    (tracking.py:176-182) makes store injection racy in tests; an explicit
    instance with an injected store has the same API surface without the
    shared-state footgun.
    """

    def __init__(self, store: ExperimentStore | None = None) -> None:
        self._store = store if store is not None else MemoryExperimentStore()

    def register(self, config: ExperimentConfig, experiment_id: str) -> None:
        now = time.time()
        self._store.save_experiment(
            experiment_id,
            {
                "experiment_id": experiment_id,
                "config": config.to_dict(),
                "status": ExperimentStatus.DRAFT.value,
                "created_at": now,
                "updated_at": now,
                "results": None,
            },
        )

    def update_status(self, experiment_id: str, status: ExperimentStatus) -> None:
        data = self._store.load_experiment(experiment_id)
        if data is not None:
            data["status"] = status.value
            data["updated_at"] = time.time()
            self._store.save_experiment(experiment_id, data)

    def save_result(self, result: ExperimentResult) -> None:
        data = self._store.load_experiment(result.experiment_id)
        if data is None:
            data = {
                "experiment_id": result.experiment_id,
                "config": {},
                "created_at": result.started_at,
            }
        data["results"] = result.to_dict()
        data["status"] = result.status.value
        data["updated_at"] = time.time()
        self._store.save_experiment(result.experiment_id, data)

    def get_experiment(self, experiment_id: str) -> dict[str, Any] | None:
        return self._store.load_experiment(experiment_id)

    def get_result(self, experiment_id: str) -> dict[str, Any] | None:
        data = self._store.load_experiment(experiment_id)
        return data.get("results") if data else None

    def get_experiments(
        self, status: ExperimentStatus | None = None, limit: int = 100
    ) -> list[dict[str, Any]]:
        out: list[dict[str, Any]] = []
        for exp_id in self._store.list_experiments():
            data = self._store.load_experiment(exp_id)
            if data is None:
                continue
            if status is None or data.get("status") == status.value:
                out.append(data)
                if len(out) >= limit:
                    break
        return out

    def delete_experiment(self, experiment_id: str) -> bool:
        return self._store.delete_experiment(experiment_id)

    def get_summary(self) -> dict[str, Any]:
        experiments = self.get_experiments(limit=10_000)
        status_counts: dict[str, int] = {}
        winner_counts: dict[str, int] = {}
        for exp in experiments:
            status_counts[exp.get("status", "unknown")] = (
                status_counts.get(exp.get("status", "unknown"), 0) + 1
            )
            winner = (exp.get("results") or {}).get("winner")
            if winner:
                winner_counts[winner] = winner_counts.get(winner, 0) + 1
        return {
            "total_experiments": len(experiments),
            "status_counts": status_counts,
            "winner_counts": winner_counts,
        }
