"""Profiling validators: cardinality, entropy, frequency, shape
(reference: src/truthound/validators/profiling/{cardinality,entropy,
frequency}.py).

Entropy is computed distributively: groupBy(col).count() → Σ -p ln p as a
second aggregate over the (small) frequency table — never collecting values.
"""

from __future__ import annotations

import math
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from truthound_spark.core.base import ExpressionSpec, Validator
from truthound_spark.core.registry import register_validator
from truthound_spark.core.results import ValidationIssue
from truthound_spark.types import Severity


def shannon_entropy(df: DataFrame, column: str, base: float = math.e) -> float:
    """Distributed Shannon entropy of a column's value distribution."""
    freq = df.groupBy(column).agg(F.count(F.lit(1)).alias("__n"))
    row = freq.agg(
        F.sum("__n").alias("total"),
        F.sum(F.col("__n") * F.log(F.col("__n").cast("double"))).alias("nlogn"),
    ).collect()[0]
    total, nlogn = row["total"], row["nlogn"]
    if not total:
        return 0.0
    # H = ln(N) - Σ n·ln(n)/N  (algebraic form avoids a second shuffle)
    h = math.log(total) - (nlogn or 0.0) / total
    return h / math.log(base)


@register_validator("cardinality", category="profiling")
class CardinalityValidator(Validator):
    """n_unique within bounds (reference: profiling/cardinality.py:21)."""

    def __init__(self, column: str, min_cardinality: int = 1, max_cardinality: int | None = None) -> None:
        self.column = column
        self.min_cardinality = min_cardinality
        self.max_cardinality = max_cardinality

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        lo, hi = self.min_cardinality, self.max_cardinality

        def judge(m: dict[str, Any]) -> tuple[bool, Any, str]:
            n = m.get("n_unique") or 0
            ok = n >= lo and (hi is None or n <= hi)
            return ok, n, f"cardinality {n} ∉ [{lo},{hi}]"

        return [
            ExpressionSpec(
                name="cardinality",
                issue_type="cardinality_out_of_range",
                column=self.column,
                extra_exprs={"n_unique": F.countDistinct(F.col(self.column))},
                expected=f"cardinality in [{lo},{hi}]",
                judge=judge,
            )
        ]


@register_validator("entropy", category="profiling")
class EntropyValidator(Validator):
    """Shannon entropy within bounds (reference: profiling/entropy.py:22)."""

    def __init__(self, column: str, min_entropy: float = 0.0, max_entropy: float | None = None) -> None:
        self.column = column
        self.min_entropy = min_entropy
        self.max_entropy = max_entropy

    def validate(self, df: DataFrame, row_count: int | None = None) -> list[ValidationIssue]:
        h = shannon_entropy(df, self.column)
        ok = h >= self.min_entropy and (self.max_entropy is None or h <= self.max_entropy)
        if ok:
            return []
        return [
            ValidationIssue(
                column=self.column,
                issue_type="entropy_out_of_range",
                count=1,
                severity=Severity.LOW,
                validator_name="entropy",
                expected=f"entropy in [{self.min_entropy},{self.max_entropy}]",
                actual=round(h, 6),
                details=f"Shannon entropy {h:.4f} out of range",
            )
        ]


@register_validator("distribution_shape", category="profiling")
class DistributionShapeValidator(Validator):
    """Skewness/kurtosis bounds (reference: profiling/frequency.py:279).
    F.skewness/F.kurtosis are single-pass moment aggregates."""

    def __init__(
        self,
        column: str,
        max_abs_skewness: float | None = None,
        max_kurtosis: float | None = None,
    ) -> None:
        self.column = column
        self.max_abs_skewness = max_abs_skewness
        self.max_kurtosis = max_kurtosis

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        mx_skew, mx_kurt = self.max_abs_skewness, self.max_kurtosis

        def judge(m: dict[str, Any]) -> tuple[bool, Any, str]:
            skew, kurt = m.get("skew"), m.get("kurt")
            problems = []
            if mx_skew is not None and skew is not None and abs(skew) > mx_skew:
                problems.append(f"|skewness| {abs(skew):.3f} > {mx_skew}")
            if mx_kurt is not None and kurt is not None and kurt > mx_kurt:
                problems.append(f"kurtosis {kurt:.3f} > {mx_kurt}")
            return not problems, {"skewness": skew, "kurtosis": kurt}, "; ".join(problems)

        return [
            ExpressionSpec(
                name="distribution_shape",
                issue_type="distribution_shape_anomaly",
                column=self.column,
                extra_exprs={"skew": F.skewness(self.column), "kurt": F.kurtosis(self.column)},
                expected=f"|skew|<={mx_skew}, kurt<={mx_kurt}",
                judge=judge,
            )
        ]


@register_validator("value_frequency", category="profiling")
class ValueFrequencyValidator(Validator):
    """Dominant-value concentration ≤ bound (reference: frequency.py:22).
    Distributed top-1 via groupBy+max — only one scalar to the driver."""

    def __init__(self, column: str, max_top_ratio: float = 0.99) -> None:
        self.column = column
        self.max_top_ratio = max_top_ratio

    def validate(self, df: DataFrame, row_count: int | None = None) -> list[ValidationIssue]:
        freq = df.groupBy(self.column).agg(F.count(F.lit(1)).alias("__n"))
        row = freq.agg(F.max("__n").alias("top"), F.sum("__n").alias("total")).collect()[0]
        top, total = int(row["top"] or 0), int(row["total"] or 0)
        ratio = top / total if total else 0.0
        if ratio <= self.max_top_ratio:
            return []
        return [
            ValidationIssue(
                column=self.column,
                issue_type="value_concentration",
                count=top,
                severity=Severity.MEDIUM,
                validator_name="value_frequency",
                expected=f"top-value ratio <= {self.max_top_ratio}",
                actual=round(ratio, 4),
                details=f"most frequent value covers {ratio:.2%} of rows",
            )
        ]


@register_validator("information_gain", category="profiling")
class InformationGainValidator(Validator):
    """Information gain of a categorical feature w.r.t. a categorical
    target: IG = H(target) − H(target|feature) (reference:
    profiling/entropy.py:205 InformationGain). One groupBy(feature, target)
    count — all entropy terms from the joint-count table; 100 TB safe."""

    def __init__(
        self,
        feature: str,
        target: str,
        min_gain: float | None = None,
        max_gain: float | None = None,
    ) -> None:
        self.feature = feature
        self.target = target
        self.min_gain = min_gain
        self.max_gain = max_gain

    @staticmethod
    def _entropy(counts: dict) -> float:
        total = sum(counts.values())
        if not total:
            return 0.0
        return -sum((n / total) * math.log(n / total) for n in counts.values() if n)

    def information_gain(self, df: DataFrame) -> float:
        joint = {
            (r[self.feature], r[self.target]): r["n"]
            for r in df.groupBy(self.feature, self.target)
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        target_counts: dict = {}
        feature_counts: dict = {}
        for (f_, t_), n in joint.items():
            target_counts[t_] = target_counts.get(t_, 0) + n
            feature_counts[f_] = feature_counts.get(f_, 0) + n
        total = sum(target_counts.values())
        h_target = self._entropy(target_counts)
        h_cond = 0.0
        for f_, nf in feature_counts.items():
            cond = {t_: n for (ff, t_), n in joint.items() if ff == f_}
            h_cond += (nf / total) * self._entropy(cond)
        return h_target - h_cond

    def validate(self, df: DataFrame, row_count: int | None = None) -> list[ValidationIssue]:
        ig = self.information_gain(df)
        ok = (self.min_gain is None or ig >= self.min_gain) and (
            self.max_gain is None or ig <= self.max_gain
        )
        if ok:
            return []
        return [
            ValidationIssue(
                column=self.feature,
                issue_type="information_gain_out_of_range",
                count=1,
                severity=Severity.MEDIUM,
                validator_name="information_gain",
                expected=f"IG({self.feature}→{self.target}) in [{self.min_gain},{self.max_gain}]",
                actual=round(ig, 6),
                details=f"information gain {ig:.6f} nats",
            )
        ]
