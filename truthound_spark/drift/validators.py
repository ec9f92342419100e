"""Drift detectors exposed as REGISTERED validators so ``th.check(data,
validators=["psi", ...])`` reaches them (reference: drift validators in
validators/drift/statistical.py:21-426, psi.py:29,298, numeric.py:17-395,
multi_feature.py:18 — the reference registers drift as first-class
validators, not just functions).

Each validator holds a ``baseline`` DataFrame and compares the validated
frame against it with the distributed detectors from
``truthound_spark.drift.detectors`` (histogram/count aggregates only — no
raw-row collection; 100 TB safe).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from truthound_spark.core.base import NUMERIC_TYPES, Validator, columns_of_type, pct_agg
from truthound_spark.core.registry import register_validator
from truthound_spark.core.results import ValidationIssue
from truthound_spark.drift import detectors
from truthound_spark.types import Severity


class _DriftValidator(Validator):
    """Shared shell: run a detector per target column, convert DriftResult
    to a ValidationIssue on drift."""

    method = "psi"
    severity = Severity.HIGH

    def __init__(
        self,
        baseline: DataFrame,
        columns: list[str] | None = None,
        **kwargs,
    ) -> None:
        self.baseline = baseline
        self.columns = columns
        self.kwargs = kwargs

    def _target(self, df: DataFrame) -> list[str]:
        cols = self._target_columns(df, self.columns, NUMERIC_TYPES)
        return [c for c in cols if c in self.baseline.columns]

    def validate(self, df: DataFrame, row_count: int | None = None) -> list[ValidationIssue]:
        fn = detectors._METHODS[self.method]
        issues = []
        for c in self._target(df):
            r = fn(self.baseline, df, c, **self.kwargs)
            if r.drifted:
                issues.append(
                    ValidationIssue(
                        column=c,
                        issue_type=f"{self.method}_drift",
                        count=0,
                        severity=self.severity,
                        validator_name=self.name,
                        expected=f"{self.method} <= {r.threshold}",
                        actual=round(r.statistic, 6),
                        details=f"{self.method} statistic {r.statistic:.6f} exceeds {r.threshold}",
                    )
                )
        return issues


@register_validator("psi", category="drift")
class PSIValidator(_DriftValidator):
    """reference: drift/psi.py:29"""

    method = "psi"


@register_validator("ks_drift", category="drift")
class KSDriftValidator(_DriftValidator):
    """reference: drift/statistical.py:21.

    Sketch-by-default at scale: when neither caller nor kwargs pin
    ``grid`` and either side exceeds ``auto_sketch_rows`` (default 1M),
    the quantile-grid ECDF sketch (grid=200) replaces the exact
    distinct-value window — the reference's own streaming variant
    (validators/memory/streaming_ecdf.py:52) is the precedent. Exact
    remains the oracle/small-data default; pass ``grid=0`` explicitly to
    force exact at any size.
    """

    method = "ks"
    AUTO_SKETCH_ROWS = 1_000_000
    AUTO_GRID = 200

    def __init__(
        self,
        baseline: DataFrame,
        columns: list[str] | None = None,
        auto_sketch_rows: int | None = None,
        **kwargs,
    ) -> None:
        super().__init__(baseline, columns, **kwargs)
        self.auto_sketch_rows = (
            self.AUTO_SKETCH_ROWS if auto_sketch_rows is None else auto_sketch_rows
        )

    def validate(self, df: DataFrame, row_count: int | None = None) -> list[ValidationIssue]:
        saved = self.kwargs
        try:
            if "grid" not in saved:
                nb = self.baseline.count()
                nc = row_count if row_count is not None else df.count()
                if max(nb, nc) > self.auto_sketch_rows:
                    self.kwargs = {**saved, "grid": self.AUTO_GRID}
            return super().validate(df, row_count)
        finally:
            self.kwargs = saved


@register_validator("js_drift", category="drift")
class JSDriftValidator(_DriftValidator):
    """reference: drift/multi_feature.py:289"""

    method = "js"


@register_validator("kl_drift", category="drift")
class KLDriftValidator(_DriftValidator):
    """reference: drift/statistical.py KL"""

    method = "kl"


@register_validator("wasserstein_drift", category="drift")
class WassersteinDriftValidator(_DriftValidator):
    """reference: drift/statistical.py:426"""

    method = "wasserstein"


@register_validator("mean_drift", category="drift")
class MeanDriftValidator(_DriftValidator):
    """reference: drift/numeric.py:17"""

    method = "mean"


@register_validator("variance_drift", category="drift")
class VarianceDriftValidator(_DriftValidator):
    """reference: drift/numeric.py:117"""

    method = "variance"


@register_validator("chi_square_drift", category="drift")
class ChiSquareDriftValidator(Validator):
    """Categorical χ² drift (reference: drift/statistical.py:312) — string
    columns, per-category counts both sides."""

    def __init__(
        self,
        baseline: DataFrame,
        columns: list[str] | None = None,
        threshold_pvalue: float = 0.05,
    ) -> None:
        self.baseline = baseline
        self.columns = columns
        self.threshold_pvalue = threshold_pvalue

    def validate(self, df: DataFrame, row_count: int | None = None) -> list[ValidationIssue]:
        from pyspark.sql import types as T

        cols = self.columns or [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, T.StringType) and f.name in self.baseline.columns
        ]
        issues = []
        for c in cols:
            r = detectors.chi_square_drift(
                self.baseline, df, c, threshold_pvalue=self.threshold_pvalue
            )
            if r.drifted:
                issues.append(
                    ValidationIssue(
                        column=c,
                        issue_type="chi_square_drift",
                        count=0,
                        severity=Severity.HIGH,
                        validator_name="chi_square_drift",
                        expected=f"p >= {self.threshold_pvalue}",
                        actual=round(r.details["p_value"], 6),
                        details=f"chi2={r.statistic:.4f} p={r.details['p_value']:.6f}",
                    )
                )
        return issues


@register_validator("quantile_drift", category="drift")
class QuantileDriftValidator(Validator):
    """Relative change of a quantile (reference: drift/numeric.py:200).
    percentile_approx both sides — mergeable sketch, 100 TB safe."""

    def __init__(
        self,
        baseline: DataFrame,
        columns: list[str] | None = None,
        q: float = 0.5,
        threshold: float = 0.1,
    ) -> None:
        self.baseline = baseline
        self.columns = columns
        self.q = q
        self.threshold = threshold

    def validate(self, df: DataFrame, row_count: int | None = None) -> list[ValidationIssue]:
        cols = [
            c
            for c in self._target_columns(df, self.columns, NUMERIC_TYPES)
            if c in self.baseline.columns
        ]
        issues = []
        for c in cols:
            qb = self.baseline.agg(
                pct_agg(c, self.q, approx=True).alias("q")
            ).collect()[0]["q"]
            qc = df.agg(pct_agg(c, self.q, approx=True).alias("q")).collect()[0]["q"]
            if qb is None or qc is None:
                continue
            rel = abs(qc - qb) / (abs(qb) + detectors.EPS)
            if rel > self.threshold:
                issues.append(
                    ValidationIssue(
                        column=c,
                        issue_type="quantile_drift",
                        count=0,
                        severity=Severity.HIGH,
                        validator_name="quantile_drift",
                        expected=f"relative q{self.q} change <= {self.threshold}",
                        actual=round(rel, 6),
                        details=f"q{self.q}: baseline {qb:.4g} vs current {qc:.4g}",
                    )
                )
        return issues


@register_validator("range_drift", category="drift")
class RangeDriftValidator(Validator):
    """Relative change of (max−min) span (reference: drift/numeric.py:295)."""

    def __init__(
        self,
        baseline: DataFrame,
        columns: list[str] | None = None,
        threshold: float = 0.2,
    ) -> None:
        self.baseline = baseline
        self.columns = columns
        self.threshold = threshold

    def validate(self, df: DataFrame, row_count: int | None = None) -> list[ValidationIssue]:
        cols = [
            c
            for c in self._target_columns(df, self.columns, NUMERIC_TYPES)
            if c in self.baseline.columns
        ]
        issues = []
        for c in cols:
            b = self.baseline.agg(
                F.min(c).alias("lo"), F.max(c).alias("hi")
            ).collect()[0]
            u = df.agg(F.min(c).alias("lo"), F.max(c).alias("hi")).collect()[0]
            if b["lo"] is None or u["lo"] is None:
                continue
            span_b = float(b["hi"]) - float(b["lo"])
            span_c = float(u["hi"]) - float(u["lo"])
            rel = abs(span_c - span_b) / (abs(span_b) + detectors.EPS)
            if rel > self.threshold:
                issues.append(
                    ValidationIssue(
                        column=c,
                        issue_type="range_drift",
                        count=0,
                        severity=Severity.MEDIUM,
                        validator_name="range_drift",
                        expected=f"relative span change <= {self.threshold}",
                        actual=round(rel, 6),
                        details=f"span baseline {span_b:.4g} vs current {span_c:.4g}",
                    )
                )
        return issues


@register_validator("csi", category="drift")
class CSIValidator(Validator):
    """Characteristic Stability Index: per-bin contribution report, flags
    bins whose |(p−q)·ln(p/q)| exceeds bin_threshold (reference:
    drift/psi.py:298 CSIValidator)."""

    def __init__(
        self,
        baseline: DataFrame,
        columns: list[str] | None = None,
        bins: int = 10,
        bin_threshold: float = 0.05,
    ) -> None:
        self.baseline = baseline
        self.columns = columns
        self.bins = bins
        self.bin_threshold = bin_threshold

    def validate(self, df: DataFrame, row_count: int | None = None) -> list[ValidationIssue]:
        import math

        issues = []
        cols = [
            c
            for c in self._target_columns(df, self.columns, NUMERIC_TYPES)
            if c in self.baseline.columns
        ]
        for c in cols:
            lo, hi = detectors._numeric_range(self.baseline, c)
            p = detectors._freqs(detectors._hist_counts(self.baseline, c, lo, hi, self.bins))
            q = detectors._freqs(detectors._hist_counts(df, c, lo, hi, self.bins))
            bad_bins = []
            for i, (pi, qi) in enumerate(zip(p, q)):
                csi = (pi - qi) * math.log((pi + detectors.EPS) / (qi + detectors.EPS))
                if abs(csi) > self.bin_threshold:
                    bad_bins.append({"bin": i, "csi": round(csi, 6)})
            if bad_bins:
                issues.append(
                    ValidationIssue(
                        column=c,
                        issue_type="csi_drift",
                        count=len(bad_bins),
                        severity=Severity.MEDIUM,
                        validator_name="csi",
                        expected=f"per-bin |CSI| <= {self.bin_threshold}",
                        actual=bad_bins[:5],
                        details=f"{len(bad_bins)} unstable bins of {self.bins}",
                    )
                )
        return issues


@register_validator("feature_drift", category="drift")
class FeatureDriftValidator(Validator):
    """Multi-column drift sweep (reference: drift/multi_feature.py:18):
    numeric columns via the chosen method, string columns via χ² — one
    report per drifted feature."""

    def __init__(
        self,
        baseline: DataFrame,
        method: str = "psi",
        columns: list[str] | None = None,
        **kwargs,
    ) -> None:
        self.baseline = baseline
        self.method = method
        self.columns = columns
        self.kwargs = kwargs

    def validate(self, df: DataFrame, row_count: int | None = None) -> list[ValidationIssue]:
        from pyspark.sql import types as T

        issues: list[ValidationIssue] = []
        numeric = [
            c
            for c in columns_of_type(df, NUMERIC_TYPES)
            if c in self.baseline.columns and (self.columns is None or c in self.columns)
        ]
        if numeric:
            num_v = _DriftValidator(self.baseline, columns=numeric, **self.kwargs)
            num_v.method = self.method
            num_v.name = f"feature_drift[{self.method}]"
            issues.extend(num_v.validate(df))
        categorical = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, T.StringType)
            and f.name in self.baseline.columns
            and (self.columns is None or f.name in self.columns)
        ]
        if categorical:
            issues.extend(
                ChiSquareDriftValidator(self.baseline, columns=categorical).validate(df)
            )
        return issues


@register_validator("streaming_ks", category="drift")
class StreamingKSValidator(Validator):
    """Sketch-based KS for unbounded/huge data (reference: StreamingKSTest
    drift/statistical.py:129 + t-digest ECDF memory/streaming_ecdf.py:52).

    Spark-first: percentile_approx IS a mergeable quantile sketch (KLL-
    style), the same role the reference's t-digest plays — both sides'
    ECDFs are evaluated on a shared quantile grid; sup-diff on the driver.
    O(grid) driver data regardless of row count."""

    def __init__(
        self,
        baseline: DataFrame,
        columns: list[str] | None = None,
        grid: int = 200,
        alpha: float = 0.05,
    ) -> None:
        self.baseline = baseline
        self.columns = columns
        self.grid = grid
        self.alpha = alpha

    def validate(self, df: DataFrame, row_count: int | None = None) -> list[ValidationIssue]:
        issues = []
        cols = [
            c
            for c in self._target_columns(df, self.columns, NUMERIC_TYPES)
            if c in self.baseline.columns
        ]
        for c in cols:
            r = detectors.ks_test(self.baseline, df, c, alpha=self.alpha, grid=self.grid)
            if r.drifted:
                issues.append(
                    ValidationIssue(
                        column=c,
                        issue_type="streaming_ks_drift",
                        count=0,
                        severity=Severity.HIGH,
                        validator_name="streaming_ks",
                        expected=f"KS <= {r.threshold:.6f}",
                        actual=round(r.statistic, 6),
                        details=f"sketch-ECDF KS {r.statistic:.6f} (grid={self.grid})",
                    )
                )
        return issues


@register_validator("cramer_von_mises", category="drift")
class CramerVonMisesValidator(_DriftValidator):
    """reference: drift detectors.py:709 (CvM two-sample criterion)."""

    method = "cramer_von_mises"
