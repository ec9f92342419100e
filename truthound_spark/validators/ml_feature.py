"""ML feature-quality validators (reference:
src/truthound/validators/ml_feature/{correlation,leakage,null_impact,
scale}.py).

All statistics are computed with distributed aggregates (F.corr pairs /
pyspark.ml.stat.Correlation on an assembled vector); only the k×k matrix
reaches the driver — 100 TB safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from truthound_spark.core.base import NUMERIC_TYPES, Validator, columns_of_type
from truthound_spark.core.registry import register_validator
from truthound_spark.core.results import ValidationIssue
from truthound_spark.types import Severity


def correlation_matrix(df: DataFrame, columns: list[str]) -> list[list[float]]:
    """Pearson correlation matrix via pyspark.ml.stat.Correlation — one
    distributed job over an assembled vector column."""
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.stat import Correlation

    assembled = VectorAssembler(
        inputCols=columns, outputCol="__features", handleInvalid="skip"
    ).transform(df.select(*columns))
    mat = Correlation.corr(assembled, "__features").collect()[0][0]
    return mat.toArray().tolist()


@register_validator("feature_correlation_matrix", category="ml_feature")
class FeatureCorrelationMatrixValidator(Validator):
    """Flag multicollinear feature pairs |r| > threshold
    (reference: ml_feature/correlation.py:19)."""

    def __init__(self, columns: list[str] | None = None, max_abs_corr: float = 0.95) -> None:
        self.columns = columns
        self.max_abs_corr = max_abs_corr

    def validate(self, df: DataFrame, row_count: int | None = None) -> list[ValidationIssue]:
        cols = self.columns or columns_of_type(df, NUMERIC_TYPES)
        if len(cols) < 2:
            return []
        m = correlation_matrix(df, cols)
        bad = []
        for i in range(len(cols)):
            for j in range(i + 1, len(cols)):
                r = m[i][j]
                if r is not None and abs(r) > self.max_abs_corr:
                    bad.append({"a": cols[i], "b": cols[j], "r": round(r, 4)})
        if not bad:
            return []
        return [
            ValidationIssue(
                column=",".join(cols),
                issue_type="multicollinearity",
                count=len(bad),
                severity=Severity.MEDIUM,
                validator_name="feature_correlation_matrix",
                expected=f"|r| <= {self.max_abs_corr} for all pairs",
                actual=bad[:5],
                details=f"{len(bad)} highly-correlated feature pairs",
            )
        ]


@register_validator("target_leakage", category="ml_feature")
class TargetLeakageValidator(Validator):
    """Feature↔target correlation too high = leakage smell
    (reference: ml_feature/leakage.py:19)."""

    def __init__(
        self,
        target: str,
        columns: list[str] | None = None,
        max_abs_corr: float = 0.98,
    ) -> None:
        self.target = target
        self.columns = columns
        self.max_abs_corr = max_abs_corr

    def validate(self, df: DataFrame, row_count: int | None = None) -> list[ValidationIssue]:
        cols = [
            c
            for c in (self.columns or columns_of_type(df, NUMERIC_TYPES))
            if c != self.target
        ]
        if not cols:
            return []
        aggs = [F.corr(c, self.target).alias(c) for c in cols]
        row = df.agg(*aggs).collect()[0].asDict()
        leaks = [
            {"column": c, "r": round(r, 4)}
            for c, r in row.items()
            if r is not None and abs(r) > self.max_abs_corr
        ]
        if not leaks:
            return []
        return [
            ValidationIssue(
                column=self.target,
                issue_type="target_leakage",
                count=len(leaks),
                severity=Severity.CRITICAL,
                validator_name="target_leakage",
                expected=f"|corr(feature, {self.target})| <= {self.max_abs_corr}",
                actual=leaks[:5],
                details=f"{len(leaks)} features nearly duplicate the target",
            )
        ]


@register_validator("feature_null_impact", category="ml_feature")
class FeatureNullImpactValidator(Validator):
    """Does target mean shift when a feature is null?
    (reference: ml_feature/null_impact.py:19) — one grouped agg per feature."""

    def __init__(
        self,
        target: str,
        columns: list[str] | None = None,
        max_relative_shift: float = 0.2,
        min_null_count: int = 10,
    ) -> None:
        self.target = target
        self.columns = columns
        self.max_relative_shift = max_relative_shift
        self.min_null_count = min_null_count

    def validate(self, df: DataFrame, row_count: int | None = None) -> list[ValidationIssue]:
        cols = [
            c
            for c in (self.columns or [f.name for f in df.schema.fields])
            if c != self.target
        ]
        issues = []
        aggs = []
        for c in cols:
            is_null = F.col(c).isNull()
            aggs.append(F.sum(F.when(is_null, 1).otherwise(0)).alias(f"{c}__n"))
            aggs.append(F.avg(F.when(is_null, F.col(self.target))).alias(f"{c}__mu_null"))
            aggs.append(F.avg(F.when(~is_null, F.col(self.target))).alias(f"{c}__mu_notnull"))
        row = df.agg(*aggs).collect()[0].asDict()
        for c in cols:
            n_null = int(row[f"{c}__n"] or 0)
            mu_n, mu_nn = row[f"{c}__mu_null"], row[f"{c}__mu_notnull"]
            if n_null < self.min_null_count or mu_n is None or mu_nn is None:
                continue
            shift = abs(mu_n - mu_nn) / (abs(mu_nn) + 1e-10)
            if shift > self.max_relative_shift:
                issues.append(
                    ValidationIssue(
                        column=c,
                        issue_type="null_impact",
                        count=n_null,
                        severity=Severity.MEDIUM,
                        validator_name="feature_null_impact",
                        expected=f"target shift <= {self.max_relative_shift:.0%} when {c} is null",
                        actual=round(shift, 4),
                        details=(
                            f"target mean {mu_nn:.4g} (non-null) vs {mu_n:.4g} "
                            f"(null, n={n_null})"
                        ),
                    )
                )
        return issues


@register_validator("feature_scale", category="ml_feature")
class FeatureScaleValidator(Validator):
    """Feature magnitudes must be within max_ratio orders of each other
    (reference: ml_feature/scale.py:30)."""

    def __init__(self, columns: list[str] | None = None, max_ratio: float = 1e4) -> None:
        self.columns = columns
        self.max_ratio = max_ratio

    def validate(self, df: DataFrame, row_count: int | None = None) -> list[ValidationIssue]:
        cols = self.columns or columns_of_type(df, NUMERIC_TYPES)
        if len(cols) < 2:
            return []
        aggs = [F.stddev_samp(c).alias(c) for c in cols]
        row = df.agg(*aggs).collect()[0].asDict()
        scales = {c: s for c, s in row.items() if s is not None and s > 0}
        if len(scales) < 2:
            return []
        lo_c = min(scales, key=scales.get)
        hi_c = max(scales, key=scales.get)
        ratio = scales[hi_c] / scales[lo_c]
        if ratio <= self.max_ratio:
            return []
        return [
            ValidationIssue(
                column=f"{lo_c},{hi_c}",
                issue_type="feature_scale_mismatch",
                count=1,
                severity=Severity.LOW,
                validator_name="feature_scale",
                expected=f"stddev ratio <= {self.max_ratio:g}",
                actual=round(ratio, 2),
                details=f"stddev({hi_c})/stddev({lo_c}) = {ratio:.3g}",
            )
        ]
