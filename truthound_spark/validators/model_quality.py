"""Model-quality gates as first-class check() citizens: does a score
column actually separate / calibrate against a label column?

The training-data pipeline produces scored corpora (quality classifiers,
dedup confidences, probe models); these validators gate them the same
way null/unique gate raw columns — reference surface:
``validators/security/redos/ml/base.py`` ReDoSModelMetrics computes the
same statistics on driver arrays after an sklearn fit; here they are the
distributed, sort-free aggregates from ``pipeline/regression.py``
(histogram-exact Mann-Whitney AUC, decile calibration bins, exact long
confusion counters), so the gates run at corpus scale inside a normal
``check()`` call.

These are plan-running validators (like DBSCANValidator), not fused-agg
specs: AUC/calibration need a groupBy stage of their own. Their corpus-
scale work is one groupBy each; the windows touch bounded histogram /
decile tables only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from truthound_spark.core.base import Validator
from truthound_spark.core.registry import register_validator
from truthound_spark.core.results import ValidationIssue
from truthound_spark.types import Severity


@register_validator("auc", category="model_quality")
class AucValidator(Validator):
    """Score column must separate the 0/1 label with ROC-AUC ≥ min_auc
    (pipeline/regression.py auc_binned — histogram rank-sum, no sort).
    An undefined AUC (single-class label) fails loudly: a quality gate
    that never sees a negative example is not evidence of quality."""

    def __init__(self, score_col: str, label_col: str, min_auc: float = 0.7) -> None:
        self.score_col = score_col
        self.label_col = label_col
        self.min_auc = min_auc

    def validate(self, df: DataFrame, row_count: int | None = None) -> list[ValidationIssue]:
        from truthound_spark.pipeline.regression import auc_binned

        row = auc_binned(df, self.score_col, self.label_col).collect()[0]
        auc = row["auc"]
        if auc is not None and auc >= self.min_auc:
            return []
        return [
            ValidationIssue(
                column=self.score_col,
                issue_type="auc_below_threshold",
                count=1,
                severity=Severity.HIGH if auc is None else Severity.MEDIUM,
                validator_name="auc",
                expected=f"auc >= {self.min_auc}",
                actual=auc,
                details=(
                    f"ROC-AUC {auc} vs {self.label_col} "
                    f"(n_pos={row['n_pos']}, n_neg={row['n_neg']})"
                    + ("; undefined — single-class label" if auc is None else "")
                ),
            )
        ]


@register_validator("calibration", category="model_quality")
class CalibrationValidator(Validator):
    """Score column must be calibrated as a probability: in every decile
    bin with at least ``min_bin_n`` rows, |mean score − positive rate| ≤
    max_gap (pipeline/regression.py calibration_bins). The gate before
    treating a classifier score as a mixing weight or keep-probability."""

    def __init__(
        self,
        score_col: str,
        label_col: str,
        max_gap: float = 0.1,
        bins: int = 10,
        min_bin_n: int = 30,
    ) -> None:
        self.score_col = score_col
        self.label_col = label_col
        self.max_gap = max_gap
        self.bins = bins
        self.min_bin_n = min_bin_n

    def validate(self, df: DataFrame, row_count: int | None = None) -> list[ValidationIssue]:
        from truthound_spark.pipeline.regression import calibration_bins

        rows = calibration_bins(
            df, self.score_col, self.label_col, bins=self.bins
        ).collect()
        bad = [
            r
            for r in rows
            if r["n"] >= self.min_bin_n and abs(r["gap"]) > self.max_gap
        ]
        if not bad:
            return []
        worst = max(bad, key=lambda r: abs(r["gap"]))
        return [
            ValidationIssue(
                column=self.score_col,
                issue_type="calibration_gap",
                count=len(bad),
                severity=Severity.MEDIUM,
                validator_name="calibration",
                expected=f"|mean_score - frac_positive| <= {self.max_gap} per bin",
                actual=float(worst["gap"]),
                details=(
                    f"{len(bad)}/{len(rows)} bins out of calibration; worst: "
                    f"bin_lo={worst['bin_lo']} mean_score={worst['mean_score']} "
                    f"frac_positive={worst['frac_positive']} (n={worst['n']})"
                ),
            )
        ]


@register_validator("classifier_threshold", category="model_quality")
class ClassifierThresholdValidator(Validator):
    """Precision AND recall floors at an operating threshold
    (pipeline/regression.py classification_metrics — one aggregate of
    exact long counters). The ship-gate for a quality filter: keep rate
    means nothing if precision collapsed."""

    def __init__(
        self,
        score_col: str,
        label_col: str,
        threshold: float = 0.5,
        min_precision: float = 0.0,
        min_recall: float = 0.0,
    ) -> None:
        self.score_col = score_col
        self.label_col = label_col
        self.threshold = threshold
        self.min_precision = min_precision
        self.min_recall = min_recall

    def validate(self, df: DataFrame, row_count: int | None = None) -> list[ValidationIssue]:
        from truthound_spark.pipeline.regression import classification_metrics

        r = classification_metrics(
            df, self.score_col, self.label_col, self.threshold
        ).collect()[0]
        issues: list[ValidationIssue] = []
        for metric, floor in (
            ("precision", self.min_precision),
            ("recall", self.min_recall),
        ):
            if floor <= 0:
                continue
            val = r[metric]
            if val is not None and val >= floor:
                continue
            issues.append(
                ValidationIssue(
                    column=self.score_col,
                    issue_type=f"{metric}_below_threshold",
                    count=1,
                    severity=Severity.HIGH if val is None else Severity.MEDIUM,
                    validator_name="classifier_threshold",
                    expected=f"{metric} >= {floor} at t={self.threshold}",
                    actual=val,
                    details=(
                        f"tp={r['tp']} fp={r['fp']} fn={r['fn']} tn={r['tn']}"
                        f" (n_scored={r['n_scored']})"
                        + ("; undefined — degenerate threshold" if val is None else "")
                    ),
                )
            )
        return issues
