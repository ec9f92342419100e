"""Anomaly validators (reference: src/truthound/validators/anomaly/).

Robust univariate rules (IQR/MAD/Tukey/percentile) as two-pass distributed
aggregates; Mahalanobis via a driver-assembled covariance matrix scored with
broadcast column math; sklearn-style model validators follow the reference's
own strategy (sample → fit on driver → broadcast model → score in
mapInPandas; reference anomaly/ml_based.py:102 LargeDatasetMixin samples
past a threshold too).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from truthound_spark.core.base import NUMERIC_TYPES, Validator, pct_agg, violation_count
from truthound_spark.core.registry import register_validator
from truthound_spark.core.results import ValidationIssue
from truthound_spark.types import Severity, severity_from_ratio


@register_validator("mad_anomaly", category="anomaly")
class MADAnomalyValidator(Validator):
    """Median absolute deviation rule (reference: anomaly/statistical.py:136).

    Pass 1: median. Pass 2: MAD = median(|x - med|). Pass 3: fused count of
    |x - med| > k * 1.4826 * MAD. Exact percentile by default; approx=True
    switches to the mergeable sketch for scale.
    """

    def __init__(self, column: str, k: float = 3.5, approx: bool = False) -> None:
        self.column = column
        self.k = k
        self.approx = approx

    def validate(self, df: DataFrame, row_count: int | None = None) -> list[ValidationIssue]:
        med = df.agg(
            pct_agg(self.column, 0.5, self.approx).alias("m")
        ).collect()[0]["m"]
        if med is None:
            return []
        mad = (
            df.select(F.abs(F.col(self.column) - med).alias("__ad"))
            .agg(pct_agg("__ad", 0.5, self.approx).alias("mad"))
            .collect()[0]["mad"]
        )
        if not mad:
            return []
        cutoff = self.k * 1.4826 * mad
        pred = (F.abs(F.col(self.column) - med) > cutoff) & F.col(self.column).isNotNull()
        row = df.agg(
            violation_count(pred).alias("bad"), F.count(F.col(self.column)).alias("nn")
        ).collect()[0]
        n, nn = int(row["bad"] or 0), int(row["nn"] or 0)
        if n == 0:
            return []
        ratio = n / nn if nn else 0.0
        return [
            ValidationIssue(
                column=self.column,
                issue_type="mad_anomalies",
                count=n,
                severity=severity_from_ratio(ratio),
                validator_name="mad_anomaly",
                expected=f"|x - median| <= {cutoff:.4g}",
                actual=n,
                details=f"{n} MAD anomalies ({ratio:.2%})",
            )
        ]


@register_validator("tukey_fences", category="anomaly")
class TukeyFencesValidator(Validator):
    """Inner/outer Tukey fences (reference: anomaly/statistical.py:385)."""

    def __init__(self, column: str, far: bool = False, approx: bool = False) -> None:
        self.column = column
        self.k = 3.0 if far else 1.5
        self.approx = approx

    def validate(self, df: DataFrame, row_count: int | None = None) -> list[ValidationIssue]:
        from truthound_spark.validators.distribution import IQROutlierValidator

        issues = IQROutlierValidator(columns=[self.column], k=self.k, approx=self.approx).validate(df)
        for i in issues:
            i.validator_name = "tukey_fences"
            i.issue_type = "tukey_outliers"
        return issues


@register_validator("percentile_anomaly", category="anomaly")
class PercentileAnomalyValidator(Validator):
    """Values outside [p_lo, p_hi] percentiles
    (reference: anomaly/statistical.py:504)."""

    def __init__(self, column: str, lower: float = 0.01, upper: float = 0.99, approx: bool = False) -> None:
        self.column = column
        self.lower = lower
        self.upper = upper
        self.approx = approx

    def validate(self, df: DataFrame, row_count: int | None = None) -> list[ValidationIssue]:
        row = df.agg(
            pct_agg(self.column, self.lower, self.approx).alias("lo"),
            pct_agg(self.column, self.upper, self.approx).alias("hi"),
        ).collect()[0]
        lo, hi = row["lo"], row["hi"]
        if lo is None or hi is None:
            return []
        pred = ((F.col(self.column) < lo) | (F.col(self.column) > hi)) & F.col(self.column).isNotNull()
        agg = df.agg(violation_count(pred).alias("bad"), F.count(F.col(self.column)).alias("nn")).collect()[0]
        n, nn = int(agg["bad"] or 0), int(agg["nn"] or 0)
        if n == 0:
            return []
        return [
            ValidationIssue(
                column=self.column,
                issue_type="percentile_anomalies",
                count=n,
                severity=severity_from_ratio(n / nn if nn else 0.0),
                validator_name="percentile_anomaly",
                expected=f"within [{lo:.4g}, {hi:.4g}] (p{self.lower}-p{self.upper})",
                actual=n,
                details=f"{n} rows outside percentile band",
            )
        ]


@register_validator("grubbs_test", category="anomaly")
class GrubbsTestValidator(Validator):
    """Grubbs' max-deviation test (reference: anomaly/statistical.py:239,
    scipy.stats at :287-297). Aggregates distributed; the t-quantile is a
    driver-side scalar via scipy when available, else a normal-tail
    approximation."""

    def __init__(self, column: str, alpha: float = 0.05) -> None:
        self.column = column
        self.alpha = alpha

    def validate(self, df: DataFrame, row_count: int | None = None) -> list[ValidationIssue]:
        row = df.agg(
            F.mean(self.column).alias("mu"),
            F.stddev(self.column).alias("sd"),
            F.count(F.col(self.column)).alias("n"),
        ).collect()[0]
        mu, sd, n = row["mu"], row["sd"], int(row["n"] or 0)
        if not sd or n < 3:
            return []
        maxdev = df.agg(F.max(F.abs(F.col(self.column) - mu)).alias("d")).collect()[0]["d"]
        g = maxdev / sd
        try:
            from scipy import stats as sstats

            t = sstats.t.ppf(1 - self.alpha / (2 * n), n - 2)
        except ImportError:  # normal-tail fallback
            p = 1 - self.alpha / (2 * n)
            t = math.sqrt(2) * _erfinv(2 * p - 1) if p < 1 else 8.0
        g_crit = ((n - 1) / math.sqrt(n)) * math.sqrt(t * t / (n - 2 + t * t))
        if g <= g_crit:
            return []
        return [
            ValidationIssue(
                column=self.column,
                issue_type="grubbs_outlier",
                count=1,
                severity=Severity.MEDIUM,
                validator_name="grubbs_test",
                expected=f"G <= {g_crit:.4f}",
                actual=round(g, 4),
                details=f"Grubbs statistic {g:.4f} exceeds critical {g_crit:.4f} (α={self.alpha})",
            )
        ]


def _erfinv(x: float) -> float:
    """Winitzki approximation of inverse erf (driver-side scalar only)."""
    a = 0.147
    ln1mx2 = math.log(1 - x * x)
    term = 2 / (math.pi * a) + ln1mx2 / 2
    return math.copysign(math.sqrt(math.sqrt(term * term - ln1mx2 / a) - term), x)


@register_validator("mahalanobis", category="anomaly")
class MahalanobisValidator(Validator):
    """Multivariate distance vs covariance (reference: anomaly/
    multivariate.py:22). Covariance matrix assembled from F.covar_pop pairs
    (one fused agg of d*(d+1)/2 aggregates); rows scored with broadcast
    Σ⁻¹ as pure column math — no Python in the row path."""

    def __init__(self, columns: list[str], threshold: float | None = None) -> None:
        self.columns = columns
        self.threshold = threshold

    def validate(self, df: DataFrame, row_count: int | None = None) -> list[ValidationIssue]:
        import numpy as np

        cols = self.columns
        d = len(cols)
        aggs = [F.mean(c).alias(f"mu_{i}") for i, c in enumerate(cols)]
        for i in range(d):
            for j in range(i, d):
                aggs.append(F.covar_pop(cols[i], cols[j]).alias(f"cov_{i}_{j}"))
        row = df.agg(*aggs).collect()[0].asDict()
        mu = np.array([row[f"mu_{i}"] for i in range(d)], dtype=float)
        cov = np.zeros((d, d))
        for i in range(d):
            for j in range(i, d):
                cov[i, j] = cov[j, i] = row[f"cov_{i}_{j}"]
        try:
            inv = np.linalg.inv(cov + 1e-9 * np.eye(d))
        except np.linalg.LinAlgError:
            return []
        thr = self.threshold if self.threshold is not None else float(d + 3 * math.sqrt(2 * d))
        # dist² = (x-mu)ᵀ Σ⁻¹ (x-mu) as a Column expression
        diffs = [F.col(c) - float(mu[i]) for i, c in enumerate(cols)]
        dist2 = F.lit(0.0)
        for i in range(d):
            for j in range(d):
                dist2 = dist2 + diffs[i] * diffs[j] * float(inv[i, j])
        nn = F.lit(True)
        for c in cols:
            nn = nn & F.col(c).isNotNull()
        pred = (dist2 > thr) & nn
        agg = df.agg(violation_count(pred).alias("bad"), F.sum(F.when(nn, 1).otherwise(0)).alias("nn")).collect()[0]
        n, total = int(agg["bad"] or 0), int(agg["nn"] or 0)
        if n == 0:
            return []
        return [
            ValidationIssue(
                column=",".join(cols),
                issue_type="mahalanobis_anomalies",
                count=n,
                severity=severity_from_ratio(n / total if total else 0.0),
                validator_name="mahalanobis",
                expected=f"dist² <= {thr:.4g}",
                actual=n,
                details=f"{n} multivariate anomalies",
            )
        ]


@register_validator("isolation_forest", category="anomaly")
class IsolationForestValidator(Validator):
    """Isolation forest (reference: anomaly/ml_based.py:263,344; sampling
    strategy ml_based.py:102). The reference wraps sklearn; this fits the
    NATIVE numpy forest (validators/iforest.py — flat-array trees,
    vectorized traversal) on a seeded driver-side sample, broadcasts the
    packed forest, and scores every Arrow batch with pure numpy — no
    sklearn dependency, deterministic for a fixed seed."""

    def __init__(
        self,
        columns: list[str],
        contamination: float = 0.01,
        sample_rows: int = 100_000,
        seed: int = 42,
        n_trees: int = 100,
        model=None,
    ) -> None:
        self.columns = [columns] if isinstance(columns, str) else list(columns)
        self.contamination = contamination
        self.sample_rows = sample_rows
        self.seed = seed
        self.n_trees = n_trees
        # pre-fitted model (e.g. ml/persistence.py ModelRegistry.load_iforest)
        # → skip the sampled fit and score with the persisted forest
        self.model = model

    def validate(self, df: DataFrame, row_count: int | None = None) -> list[ValidationIssue]:
        import numpy as np
        import pandas as pd

        from truthound_spark.validators.iforest import fit_isolation_forest

        total = row_count if row_count is not None else df.count()
        if self.model is not None:
            model = self.model
        else:
            frac = min(1.0, self.sample_rows / max(total, 1))
            sample_pdf = (
                df.select(*self.columns).dropna().sample(fraction=frac, seed=self.seed).toPandas()
            )
            if len(sample_pdf) < 10:
                return []
            model = fit_isolation_forest(
                sample_pdf.values.astype("float64"),
                self.columns,
                n_trees=self.n_trees,
                contamination=self.contamination,
                seed=self.seed,
            )
        bc = df.sparkSession.sparkContext.broadcast(model)
        cols = self.columns

        def score(batches):
            for pdf in batches:
                x = pdf[cols].fillna(0.0).values.astype("float64")
                flags = bc.value.predict_anomaly(x)
                yield pd.DataFrame({"anomaly": flags.astype("int64")})

        scored = df.select(*cols).mapInPandas(score, schema="anomaly long")
        n = scored.agg(F.sum("anomaly").alias("n")).collect()[0]["n"] or 0
        if n == 0:
            return []
        return [
            ValidationIssue(
                column=",".join(cols),
                issue_type="ml_anomalies",
                count=int(n),
                severity=severity_from_ratio(n / total if total else 0.0),
                validator_name="isolation_forest",
                expected=f"contamination <= {self.contamination}",
                actual=int(n),
                details=(
                    f"{n} isolation-forest anomalies "
                    f"({self.n_trees} native trees, sampled fit, distributed scoring)"
                ),
            )
        ]


@register_validator("zscore_multivariate", category="anomaly")
class ZScoreMultivariateValidator(Validator):
    """Multivariate z-score: rows whose max per-column |z| exceeds k
    (reference: anomaly/multivariate.py:409). One agg for means/stds, one
    fused count — all column math."""

    def __init__(self, columns: list[str], k: float = 3.5) -> None:
        self.columns = columns
        self.k = k

    def validate(self, df: DataFrame, row_count: int | None = None) -> list[ValidationIssue]:
        aggs = []
        for c in self.columns:
            aggs.append(F.mean(c).alias(f"{c}__mu"))
            aggs.append(F.stddev_samp(c).alias(f"{c}__sd"))
        stats = df.agg(*aggs).collect()[0].asDict()
        pred = F.lit(False)
        for c in self.columns:
            mu, sd = stats[f"{c}__mu"], stats[f"{c}__sd"]
            if mu is None or sd is None or sd == 0:
                continue
            pred = pred | (F.abs((F.col(c) - mu) / sd) > self.k)
        n = df.agg(
            F.sum(F.when(pred, 1).otherwise(0)).cast("long").alias("n")
        ).collect()[0]["n"] or 0
        if n == 0:
            return []
        total = row_count if row_count is not None else df.count()
        return [
            ValidationIssue(
                column=",".join(self.columns),
                issue_type="multivariate_zscore_outliers",
                count=int(n),
                severity=severity_from_ratio(n / total if total else 0.0),
                validator_name="zscore_multivariate",
                expected=f"max |z| <= {self.k}",
                actual=int(n),
                details=f"{n} rows exceed |z|>{self.k} in ≥1 of {len(self.columns)} columns",
            )
        ]


@register_validator("pca_anomaly", category="anomaly")
class PCAAnomalyValidator(Validator):
    """PCA reconstruction-error anomalies (reference: multivariate.py:327).

    Covariance matrix from DISTRIBUTED covar_pop aggregates (k² scalars to
    the driver), numpy eigendecomposition, then the reconstruction error of
    each row against the top-m principal components is scored as broadcast
    column math — the 100 TB plan: no row ever leaves the executors."""

    def __init__(
        self,
        columns: list[str],
        n_components: int | None = None,
        threshold_quantile: float = 0.99,
    ) -> None:
        self.columns = columns
        self.n_components = n_components
        self.threshold_quantile = threshold_quantile

    def validate(self, df: DataFrame, row_count: int | None = None) -> list[ValidationIssue]:
        import numpy as np

        cols = self.columns
        k = len(cols)
        aggs = [F.mean(c).alias(f"mu_{i}") for i, c in enumerate(cols)]
        for i in range(k):
            for j in range(i, k):
                aggs.append(F.covar_pop(cols[i], cols[j]).alias(f"c_{i}_{j}"))
        row = df.agg(*aggs).collect()[0].asDict()
        mu = [row[f"mu_{i}"] for i in range(k)]
        if any(m is None for m in mu):
            return []
        cov = np.zeros((k, k))
        for i in range(k):
            for j in range(i, k):
                cov[i, j] = cov[j, i] = row[f"c_{i}_{j}"] or 0.0
        evals, evecs = np.linalg.eigh(cov)
        order = np.argsort(evals)[::-1]
        m = self.n_components or max(1, k // 2)
        top = evecs[:, order[:m]]  # k × m
        # residual projector R = I - V V^T ; err(x) = || R (x - mu) ||²
        resid = np.eye(k) - top @ top.T

        centered = [F.col(c) - float(mu[i]) for i, c in enumerate(cols)]
        err = F.lit(0.0)
        for i in range(k):
            comp = F.lit(0.0)
            for j in range(k):
                comp = comp + F.lit(float(resid[i, j])) * centered[j]
            err = err + comp * comp
        scored = df.select(err.alias("__err"))
        thr = scored.agg(
            F.expr(f"percentile_approx(__err, {self.threshold_quantile}, 10000)").alias("t")
        ).collect()[0]["t"]
        if thr is None:
            return []
        n = scored.filter(F.col("__err") > thr).count()
        if n == 0:
            return []
        total = row_count if row_count is not None else df.count()
        return [
            ValidationIssue(
                column=",".join(cols),
                issue_type="pca_anomalies",
                count=int(n),
                severity=severity_from_ratio(n / total if total else 0.0),
                validator_name="pca_anomaly",
                expected=f"reconstruction error <= q{self.threshold_quantile}",
                actual=int(n),
                details=f"{n} rows above the q{self.threshold_quantile} residual threshold",
            )
        ]


class _SklearnScoredValidator(Validator):
    """Shared shell for sklearn-backed row scorers (reference
    anomaly/ml_based.py LargeDatasetMixin:102): fit on a driver-side sample,
    score distributed via broadcast model in mapInPandas. Skips with an
    execution_error issue when sklearn is absent (not installed here)."""

    model_name = "sklearn"

    def __init__(
        self,
        columns: list[str],
        contamination: float = 0.01,
        sample_rows: int = 100_000,
        seed: int = 42,
    ) -> None:
        self.columns = columns
        self.contamination = contamination
        self.sample_rows = sample_rows
        self.seed = seed

    def _make_model(self):  # pragma: no cover - needs sklearn
        raise NotImplementedError

    def validate(self, df: DataFrame, row_count: int | None = None) -> list[ValidationIssue]:
        try:
            import sklearn  # noqa: F401
        except ImportError:
            return [
                ValidationIssue(
                    column=",".join(self.columns),
                    issue_type="execution_error",
                    count=0,
                    severity=Severity.LOW,
                    validator_name=self.model_name,
                    details="sklearn not installed; validator skipped",
                    exception_info={"type": "ImportError", "message": "sklearn"},
                )
            ]
        return self._validate_with_sklearn(df, row_count)  # pragma: no cover

    def _validate_with_sklearn(self, df, row_count):  # pragma: no cover
        import pandas as pd

        n = df.count()
        frac = min(1.0, self.sample_rows / max(n, 1))
        sample = (
            df.select(*self.columns)
            .sample(fraction=frac, seed=self.seed)
            .limit(self.sample_rows)
            .toPandas()
            .dropna()
        )
        model = self._make_model()
        model.fit(sample.values)

        cols = self.columns
        bmodel = df.sparkSession.sparkContext.broadcast(model)

        def score(batches):
            for pdf in batches:
                x = pdf[cols].fillna(0.0).values
                pred = bmodel.value.predict(x)
                yield pd.DataFrame({"anomaly": (pred == -1).astype("int64")})

        flagged = (
            df.select(*cols)
            .mapInPandas(score, schema="anomaly long")
            .agg(F.sum("anomaly").alias("n"))
            .collect()[0]["n"]
            or 0
        )
        if not flagged:
            return []
        return [
            ValidationIssue(
                column=",".join(cols),
                issue_type=f"{self.model_name}_anomalies",
                count=int(flagged),
                severity=severity_from_ratio(flagged / n if n else 0.0),
                validator_name=self.model_name,
                expected=f"contamination ~{self.contamination}",
                actual=int(flagged),
                details=f"{flagged} rows flagged by sampled {self.model_name}",
            )
        ]


@register_validator("lof", category="anomaly")
class LOFValidator(_SklearnScoredValidator):
    """Local Outlier Factor (reference: anomaly/ml_based.py:445)."""

    model_name = "lof"

    def _make_model(self):  # pragma: no cover
        from sklearn.neighbors import LocalOutlierFactor

        return LocalOutlierFactor(novelty=True, contamination=self.contamination)


@register_validator("lof_native", category="anomaly")
class NativeLOFValidator(Validator):
    """EXACT distributed Local Outlier Factor — no sklearn, no sampling:
    grid-kNN + relational reach/lrd chain over every row
    (pipeline/neighbors.py; oracle-certified by lof_native_customer).
    Flags rows with LOF > threshold. Prefer this over the sampled
    ``lof`` validator whenever features are ≤ 4 numeric columns."""

    def __init__(
        self,
        columns: list[str] | None = None,
        k: int = 10,
        threshold: float = 1.5,
        id_column: str | None = None,
    ) -> None:
        self.columns = columns
        self.k = k
        self.threshold = threshold
        self.id_column = id_column

    def validate(
        self, df: DataFrame, row_count: int | None = None
    ) -> list[ValidationIssue]:
        from truthound_spark.pipeline.neighbors import lof

        cols = self._target_columns(df, self.columns, NUMERIC_TYPES)[:4]
        scores = lof(df, cols, k=self.k, id_col=self.id_column)
        n = row_count if row_count is not None else df.count()
        flagged = scores.filter(F.col("lof") > self.threshold).count()
        if flagged == 0:
            return []
        return [
            ValidationIssue(
                column=",".join(cols),
                issue_type="lof_anomalies",
                count=int(flagged),
                severity=severity_from_ratio(flagged / n if n else 0.0),
                validator_name="lof_native",
                expected=f"LOF <= {self.threshold}",
                actual=int(flagged),
                details=(
                    f"{flagged} rows with exact LOF > {self.threshold} "
                    f"(k={self.k}, full-data distributed kNN)"
                ),
            )
        ]


@register_validator("one_class_svm", category="anomaly")
class OneClassSVMValidator(_SklearnScoredValidator):
    """One-class SVM (reference: anomaly/ml_based.py:612)."""

    model_name = "one_class_svm"

    def _make_model(self):  # pragma: no cover
        from sklearn.svm import OneClassSVM

        return OneClassSVM(nu=self.contamination)


@register_validator("elliptic_envelope", category="anomaly")
class EllipticEnvelopeValidator(_SklearnScoredValidator):
    """Robust-covariance envelope (reference: anomaly/multivariate.py:212)."""

    model_name = "elliptic_envelope"

    def _make_model(self):  # pragma: no cover
        from sklearn.covariance import EllipticEnvelope

        return EllipticEnvelope(contamination=self.contamination)


@register_validator("dbscan", category="anomaly")
class DBSCANValidator(Validator):
    """DBSCAN noise points as anomalies (reference: anomaly/ml_based.py:777).

    The reference fits sklearn DBSCAN on a driver sample and extrapolates
    the noise count by the sample fraction. This runs the EXACT algorithm
    over the full table instead: the distributed grid-partitioned DBSCAN
    in ``pipeline/clustering.py`` (eps-cell equi-join for candidate
    pairs, one groupBy for core points, connected components for
    clusters). No sklearn, no sampling error, deterministic counts.

    ``eps=None`` auto-scales to a fraction of the observed feature span —
    mirroring sklearn's "0.5 on standardized features" default spirit
    without requiring standardized input.
    """

    def __init__(
        self,
        columns: list[str],
        eps: float | None = None,
        min_pts: int = 5,
        max_noise_ratio: float = 0.0,
    ) -> None:
        self.columns = [columns] if isinstance(columns, str) else list(columns)
        self.eps = eps
        self.min_pts = min_pts
        self.max_noise_ratio = max_noise_ratio

    def validate(self, df: DataFrame, row_count: int | None = None) -> list[ValidationIssue]:
        from truthound_spark.pipeline.clustering import dbscan

        eps = self.eps
        if eps is None:
            # one agg: max per-dimension span / 20 (heuristic grid scale)
            aggs = []
            for c in self.columns:
                aggs += [F.max(c).alias(f"mx_{c}"), F.min(c).alias(f"mn_{c}")]
            row = df.agg(*aggs).collect()[0].asDict()
            spans = [
                float(row[f"mx_{c}"] or 0) - float(row[f"mn_{c}"] or 0)
                for c in self.columns
            ]
            eps = max(max(spans), 1e-9) / 20.0

        with_id = df.select(*self.columns).withColumn(
            "__row_id", F.monotonically_increasing_id()
        )
        labels = dbscan(
            with_id, self.columns, eps=eps, min_pts=self.min_pts, id_col="__row_id"
        )
        agg = labels.agg(
            F.count(F.lit(1)).alias("n"),
            violation_count(F.col("cluster_id").isNull()).alias("noise"),
        ).collect()[0]
        n, noise = int(agg["n"]), int(agg["noise"] or 0)
        if n == 0 or noise / n <= self.max_noise_ratio:
            return []
        return [
            ValidationIssue(
                column=",".join(self.columns),
                issue_type="dbscan_anomalies",
                count=noise,
                severity=severity_from_ratio(noise / n),
                validator_name="dbscan",
                expected=f"noise ratio <= {self.max_noise_ratio}",
                actual=noise,
                details=(
                    f"{noise} density-noise points "
                    f"(eps={eps:.6g}, min_pts={self.min_pts}, exact distributed DBSCAN)"
                ),
            )
        ]
