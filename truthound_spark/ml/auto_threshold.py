"""Threshold tuning from profiles + learning from profile HISTORY.

Reference surfaces re-expressed:
  * profiler/auto_threshold.py:59-828 — TuningStrategy presets
    (conservative :244, balanced :310, permissive :384, adaptive :443,
    statistical :571) and the Strictness multipliers (:161-199);
  * profiler/auto_threshold.py:876-1014 ThresholdTuner / tune_thresholds;
  * ml/rule_learning/profile_learner.py:299-458 — profile→rule emission
    (the suite-synthesis half lives in ``thresholds_to_suite``).

Spark-first split: the expensive part (profiling) is the distributed
one-pass aggregate in ``profiler/table_profiler.py``; everything in this
module is O(columns) scalar arithmetic on the driver. Learning from a
RUN HISTORY (N stored profiles) is the reference's
"zero-config gets smarter over time" story: thresholds come from
quantiles/extremes OVER THE HISTORY, so a value that was normal in any
past run never trips the suite, while a drifted snapshot does.

Every formula is deterministic and closed-form so the learned bounds are
SQL-replayable (the ``learned_thresholds_lineitem`` oracle slot certifies
the min/max/null/mean paths end-to-end against DuckDB).
"""

from __future__ import annotations

import itertools
import json
import math
import os
import time
from dataclasses import asdict, dataclass, field
from typing import Any, Iterable

from truthound_spark.profiler.table_profiler import ColumnProfile, TableProfile

# ---------------------------------------------------------------------------
# threshold containers
# ---------------------------------------------------------------------------


@dataclass
class ColumnThresholds:
    """Learned per-column gates (reference auto_threshold.py:90-122)."""

    column: str
    null_ratio_max: float | None = None
    unique_ratio_min: float | None = None
    min_value: float | None = None
    max_value: float | None = None
    mean_min: float | None = None
    mean_max: float | None = None
    min_length: int | None = None
    max_length: int | None = None
    confidence: float = 0.5
    reasoning: list[str] = field(default_factory=list)

    def to_dict(self) -> dict[str, Any]:
        return asdict(self)


@dataclass
class TableThresholds:
    """Learned table gates (reference auto_threshold.py:124-158)."""

    table: str = ""
    columns: dict[str, ColumnThresholds] = field(default_factory=dict)
    row_count_min: int | None = None
    row_count_max: int | None = None
    duplicate_ratio_max: float = 0.0
    strategy: str = "balanced"
    metadata: dict[str, Any] = field(default_factory=dict)

    def get_column(self, name: str) -> ColumnThresholds | None:
        return self.columns.get(name)

    def to_dict(self) -> dict[str, Any]:
        return {
            "table": self.table,
            "columns": {k: v.to_dict() for k, v in self.columns.items()},
            "row_count_min": self.row_count_min,
            "row_count_max": self.row_count_max,
            "duplicate_ratio_max": self.duplicate_ratio_max,
            "strategy": self.strategy,
            "metadata": self.metadata,
        }

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "TableThresholds":
        tt = cls(
            table=d.get("table", ""),
            row_count_min=d.get("row_count_min"),
            row_count_max=d.get("row_count_max"),
            duplicate_ratio_max=d.get("duplicate_ratio_max", 0.0),
            strategy=d.get("strategy", "balanced"),
            metadata=d.get("metadata", {}),
        )
        for name, cd in (d.get("columns") or {}).items():
            tt.columns[name] = ColumnThresholds(**cd)
        return tt


# ---------------------------------------------------------------------------
# single-profile strategies (reference auto_threshold.py:244-828)
# ---------------------------------------------------------------------------

#: per-strategy knobs: (null_mult, null_eps, range_buffer, uniq_floor, conf)
#: — the reference's formula constants, one row per strategy class.
_STRATEGY_KNOBS: dict[str, tuple[float, float, float, float, float]] = {
    # reference ConservativeStrategy (:261 null*0.5; :268 2% buffer)
    "conservative": (0.5, 0.0, 0.02, 1.0, 0.8),
    # reference BalancedStrategy (:328 null*1.2+0.01; :337 10% buffer)
    "balanced": (1.2, 0.01, 0.10, 0.99, 0.7),
    # reference PermissiveStrategy (:404 null*2+0.05; :412 25% buffer)
    "permissive": (2.0, 0.05, 0.25, 0.95, 0.6),
}

#: strictness multipliers (reference StrictnessPreset.for_strictness :171)
_STRICTNESS = {
    "loose": (1.5, 0.2),
    "medium": (1.0, 0.1),
    "strict": (0.5, 0.05),
}


#: domain-specific gate defaults (reference DomainAwareStrategy
#: DOMAIN_DEFAULTS :685-744 — the KR-specific entries ride the same
#: table; keys absent here fall back to the balanced formulas)
_DOMAIN_DEFAULTS: dict[str, dict[str, Any]] = {
    "email": {"null_ratio_max": 0.1, "min_length": 5, "max_length": 254},
    "phone": {"null_ratio_max": 0.2, "min_length": 7, "max_length": 20},
    "uuid": {
        "null_ratio_max": 0.0,
        "unique_ratio_min": 1.0,
        "min_length": 36,
        "max_length": 36,
    },
    "date": {"null_ratio_max": 0.1},
    "identifier": {"null_ratio_max": 0.0, "unique_ratio_min": 1.0},
    "categorical": {"null_ratio_max": 0.05},
    "currency": {"null_ratio_max": 0.05, "min_value": 0.0},
    "percentage": {"null_ratio_max": 0.05, "min_value": 0.0, "max_value": 100.0},
    "boolean": {"null_ratio_max": 0.0},
    "korean_phone": {"null_ratio_max": 0.1, "min_length": 10, "max_length": 13},
    "korean_rrn": {"null_ratio_max": 0.0, "min_length": 13, "max_length": 14},
}


def detect_domain(cp: ColumnProfile) -> str | None:
    """Infer a column's domain from name/dtype/profile stats (reference
    infers via its type-inference layer; the same signals — key-like
    names, cardinality, fixed lengths — are already in the profile)."""
    name = cp.name.lower()
    if "email" in name:
        return "email"
    if "uuid" in name or "guid" in name or (
        cp.min_length == 36 and cp.max_length == 36 and cp.dtype == "string"
    ):
        return "uuid"
    if "phone" in name or "tel" in name:
        return "phone"
    if cp.dtype in ("date", "timestamp", "timestamp_ntz"):
        return "date"
    if cp.dtype == "boolean" or (cp.distinct_count in (1, 2) and cp.dtype != "string"):
        return "boolean" if cp.dtype == "boolean" else None
    if (
        cp.unique_ratio >= 0.999
        and cp.distinct_count > 1
        and (name.endswith(("id", "key", "code")) or "uuid" in name)
    ):
        return "identifier"
    if any(t in name for t in ("price", "amount", "cost", "balance", "bal", "revenue")):
        return "currency"
    if any(t in name for t in ("pct", "percent", "ratio", "rate", "discount")):
        return "percentage"
    if cp.dtype == "string" and 0 < cp.distinct_count <= 20:
        return "categorical"
    return None


def _tune_domain_aware(cp: ColumnProfile) -> ColumnThresholds:
    """reference DomainAwareStrategy.tune_column (:745-793): domain
    defaults first, balanced-formula fallback per field."""
    th = ColumnThresholds(column=cp.name)
    domain = detect_domain(cp)
    defaults = _DOMAIN_DEFAULTS.get(domain or "", {})
    th.reasoning.append(f"domain={domain or 'generic'}")
    th.null_ratio_max = defaults.get(
        "null_ratio_max", min(1.0, cp.null_ratio * 1.2 + 0.01)
    )
    if "min_length" in defaults:
        th.min_length = defaults["min_length"]
    elif cp.min_length is not None:
        th.min_length = int(cp.min_length)
    if "max_length" in defaults:
        th.max_length = defaults["max_length"]
    elif cp.max_length is not None:
        th.max_length = int(cp.max_length)
    if "unique_ratio_min" in defaults:
        th.unique_ratio_min = defaults["unique_ratio_min"]
    elif cp.unique_ratio >= 0.999 and cp.distinct_count > 1:
        th.unique_ratio_min = 0.99
    if "min_value" in defaults:
        th.min_value = defaults["min_value"]
    elif cp.min is not None and cp.mean is not None:
        pad = (float(cp.max) - float(cp.min)) * 0.1
        th.min_value = float(cp.min) - pad
    if "max_value" in defaults:
        th.max_value = defaults["max_value"]
    elif cp.max is not None and cp.mean is not None:
        th.max_value = float(cp.max) * 1.1 if float(cp.max) > 0 else float(cp.max) * 0.9
    th.confidence = 0.75
    return th


def _assess_quality(cp: ColumnProfile) -> float:
    """reference AdaptiveStrategy._assess_quality (:545-568):
    mean of completeness, uniqueness-appropriateness."""
    scores = [1.0 - cp.null_ratio]
    if cp.unique_ratio >= 0.9:
        scores.append(0.9)
    elif cp.unique_ratio < 0.01:
        scores.append(0.3 if cp.distinct_count <= 1 else 0.5)
    else:
        scores.append(0.7)
    return sum(scores) / len(scores)


def _tune_column(cp: ColumnProfile, strategy: str, strictness: str) -> ColumnThresholds:
    if strategy == "domain_aware":
        return _tune_domain_aware(cp)
    th = ColumnThresholds(column=cp.name)
    if strategy == "adaptive":
        # reference AdaptiveStrategy (:464-477): quality picks the knobs
        q = _assess_quality(cp)
        if q > 0.8:
            null_mult, null_eps, buf = 0.8, 0.01, 0.05
        elif q > 0.5:
            null_mult, null_eps, buf = 1.2, 0.01, 0.10
        else:
            null_mult, null_eps, buf = 1.5, 0.01, 0.20
        uniq_floor, conf = (1.0 if q > 0.7 else 0.99), q
        th.reasoning.append(f"quality={q:.2f}")
    elif strategy == "statistical":
        # reference StatisticalStrategy (:589-648): Wilson CI for nulls,
        # IQR fence for ranges, 3σ fallback
        null_mult, null_eps, buf, uniq_floor, conf = 1.0, 0.0, 0.0, 0.99, 0.85
    else:
        null_mult, null_eps, buf, uniq_floor, conf = _STRATEGY_KNOBS[strategy]
    s_null, s_buf = _STRICTNESS[strictness]
    null_mult *= s_null

    if strategy == "statistical":
        # Wilson 99% upper bound on the null ratio (reference :601-611);
        # ColumnProfile carries null_count+ratio → reconstruct n (falls
        # back to a 10k prior for all-non-null columns, which only widens
        # the CI slightly)
        n = int(round(cp.null_count / cp.null_ratio)) if cp.null_ratio > 0 else 10_000
        z = 2.576
        p = cp.null_ratio
        denom = 1 + z * z / n
        centre = p + z * z / (2 * n)
        margin = z * math.sqrt((p * (1 - p) + z * z / (4 * n)) / n)
        th.null_ratio_max = min(1.0, (centre + margin) / denom)
        th.reasoning.append(f"null<=Wilson99({th.null_ratio_max:.4f})")
        if cp.quantiles and cp.quantiles.get("q25") is not None:
            q1, q3 = float(cp.quantiles["q25"]), float(cp.quantiles["q75"])
            iqr = q3 - q1
            th.min_value = q1 - 1.5 * iqr
            th.max_value = q3 + 1.5 * iqr
            th.reasoning.append("range=IQR*1.5")
        elif cp.min is not None and cp.max is not None and cp.mean is not None:
            pad = 3.0 * float(cp.std or 0.0)
            th.min_value = float(cp.min) - pad
            th.max_value = float(cp.max) + pad
            th.reasoning.append("range=minmax±3σ")
    else:
        th.null_ratio_max = min(1.0, cp.null_ratio * null_mult + null_eps)
        if cp.min is not None and cp.max is not None and cp.mean is not None:
            lo, hi = float(cp.min), float(cp.max)
            pad = (hi - lo) * buf * (s_buf / 0.1 if strictness != "medium" else 1.0)
            th.min_value = lo - pad
            th.max_value = hi + pad
            th.reasoning.append(f"range=minmax±{buf:.0%}")
    if cp.unique_ratio >= 0.999 and cp.distinct_count > 1:
        th.unique_ratio_min = uniq_floor
        th.reasoning.append(f"unique>={uniq_floor}")
    if cp.min_length is not None and cp.max_length is not None:
        th.min_length = max(0, int(cp.min_length) - 1)
        th.max_length = int(cp.max_length) + 5
    th.confidence = conf
    return th


class ThresholdTuner:
    """Profile → thresholds (reference ThresholdTuner :876-1014)."""

    STRATEGIES = (
        "conservative",
        "balanced",
        "permissive",
        "adaptive",
        "statistical",
        "domain_aware",
    )

    def __init__(self, strategy: str = "balanced", strictness: str = "medium") -> None:
        if strategy not in self.STRATEGIES:
            raise ValueError(f"unknown strategy {strategy!r}; choose from {self.STRATEGIES}")
        if strictness not in _STRICTNESS:
            raise ValueError(f"unknown strictness {strictness!r}")
        self.strategy = strategy
        self.strictness = strictness

    def tune(self, profile: TableProfile, table: str = "") -> TableThresholds:
        tt = TableThresholds(table=table, strategy=self.strategy)
        for name, cp in profile.columns.items():
            tt.columns[name] = _tune_column(cp, self.strategy, self.strictness)
        n = profile.row_count
        # reference tune_table: duplicates gated at observed*1.1 (balanced)
        dup_ratio = (profile.duplicate_row_count / n) if n else 0.0
        tt.duplicate_ratio_max = 0.0 if self.strategy == "conservative" else dup_ratio * 1.1
        tt.metadata["row_count_observed"] = n
        return tt

    def compare_strategies(self, profile: TableProfile) -> dict[str, TableThresholds]:
        """reference ThresholdTuner.compare_strategies (:982-1014)."""
        return {
            s: ThresholdTuner(s, self.strictness).tune(profile) for s in self.STRATEGIES
        }


def tune_thresholds(
    profile: TableProfile, strategy: str = "balanced", strictness: str = "medium"
) -> TableThresholds:
    """reference auto_threshold.py:1130 module-level convenience."""
    return ThresholdTuner(strategy, strictness).tune(profile)


# ---------------------------------------------------------------------------
# history learner — quantile-of-history thresholds
# ---------------------------------------------------------------------------


def _quantile(values: list[float], q: float) -> float:
    """Linear-interpolation quantile over a tiny scalar list (q=0 → min,
    q=1 → max, matching percentile_cont semantics)."""
    xs = sorted(values)
    if not xs:
        raise ValueError("empty history stat")
    if len(xs) == 1:
        return xs[0]
    pos = q * (len(xs) - 1)
    lo = int(math.floor(pos))
    hi = min(lo + 1, len(xs) - 1)
    frac = pos - lo
    return xs[lo] * (1 - frac) + xs[hi] * frac


class HistoryThresholdLearner:
    """Learn thresholds from N stored profile runs.

    The per-run profile is the distributed one-pass aggregate; this
    learner reduces the N×C scalar history. Formulas (all closed-form,
    certified by the ``learned_thresholds_lineitem`` oracle slot):

      * range:  g_lo = min over runs of per-run min, g_hi = max of maxes,
        bounds = [g_lo − buf·(g_hi−g_lo), g_hi + buf·(g_hi−g_lo)]
      * nulls:  null_ratio_max = max over runs · null_mult + null_eps
      * mean band: [min of means − σ_mult·max of stds,
                    max of means + σ_mult·max of stds] — the drift gate
      * uniqueness: if every run's unique_ratio ≥ 0.999 →
        unique_ratio_min = min over runs − uniq_tol
      * rows:   [floor(min·(1−row_tol)), ceil(max·(1+row_tol))]

    ``history`` order doesn't matter (pure extremes/quantiles), so
    late-arriving backfilled profiles don't change the result — important
    when profile runs land from different schedules.
    """

    def __init__(
        self,
        range_buffer: float = 0.1,
        null_mult: float = 1.2,
        null_eps: float = 0.01,
        sigma_mult: float = 3.0,
        uniq_tol: float = 0.001,
        row_tol: float = 0.2,
        min_history: int = 2,
        history_quantile: float = 1.0,
    ) -> None:
        self.range_buffer = range_buffer
        self.null_mult = null_mult
        self.null_eps = null_eps
        self.sigma_mult = sigma_mult
        self.uniq_tol = uniq_tol
        self.row_tol = row_tol
        self.min_history = min_history
        if not 0.5 < history_quantile <= 1.0:
            raise ValueError("history_quantile must be in (0.5, 1.0]")
        # 1.0 = exact extremes over the history (default; every past-
        # normal value stays legal). < 1.0 = robust mode: the q-quantile
        # of per-run stats on each side, so a single anomalous PAST run
        # (that slipped into history before anyone noticed) doesn't
        # permanently widen the learned gates. With long histories
        # (daily runs for a year) 0.95 is the production setting.
        self.history_quantile = history_quantile

    def _lo(self, values: list[float]) -> float:
        return _quantile(values, 1.0 - self.history_quantile)

    def _hi(self, values: list[float]) -> float:
        return _quantile(values, self.history_quantile)

    def learn(self, history: list[TableProfile], table: str = "") -> TableThresholds:
        if len(history) < self.min_history:
            raise ValueError(
                f"need >= {self.min_history} profile runs, got {len(history)}"
            )
        tt = TableThresholds(table=table, strategy="history")
        tt.metadata["n_runs"] = len(history)

        counts = [float(p.row_count) for p in history]
        tt.row_count_min = int(math.floor(self._lo(counts) * (1 - self.row_tol)))
        tt.row_count_max = int(math.ceil(self._hi(counts) * (1 + self.row_tol)))

        # columns present in EVERY run (a column must have full history)
        common = set(history[0].columns)
        for p in history[1:]:
            common &= set(p.columns)

        for name in sorted(common):
            cps = [p.columns[name] for p in history]
            th = ColumnThresholds(column=name)
            th.null_ratio_max = min(
                1.0,
                self._hi([c.null_ratio for c in cps]) * self.null_mult + self.null_eps,
            )
            th.reasoning.append(f"null<=hist_q*{self.null_mult}+{self.null_eps}")
            mins = [float(c.min) for c in cps if c.min is not None and c.mean is not None]
            maxs = [float(c.max) for c in cps if c.max is not None and c.mean is not None]
            if mins and maxs and len(mins) == len(cps):
                g_lo, g_hi = self._lo(mins), self._hi(maxs)
                pad = (g_hi - g_lo) * self.range_buffer
                th.min_value, th.max_value = g_lo - pad, g_hi + pad
                th.reasoning.append(f"range=hist_minmax±{self.range_buffer:.0%}")
                means = [float(c.mean) for c in cps if c.mean is not None]
                stds = [float(c.std or 0.0) for c in cps]
                if means:
                    band = self.sigma_mult * self._hi(stds)
                    th.mean_min = self._lo(means) - band
                    th.mean_max = self._hi(means) + band
                    th.reasoning.append(f"mean∈hist±{self.sigma_mult}σ")
            if all(c.unique_ratio >= 0.999 and c.distinct_count > 1 for c in cps):
                th.unique_ratio_min = max(
                    0.0, min(c.unique_ratio for c in cps) - self.uniq_tol
                )
            lens_lo = [c.min_length for c in cps if c.min_length is not None]
            lens_hi = [c.max_length for c in cps if c.max_length is not None]
            if lens_lo and lens_hi and len(lens_lo) == len(cps):
                th.min_length = int(min(lens_lo))
                th.max_length = int(max(lens_hi))
            th.confidence = min(0.95, 0.5 + 0.1 * len(history))
            tt.columns[name] = th
        return tt


# ---------------------------------------------------------------------------
# thresholds → validator suite
# ---------------------------------------------------------------------------


def thresholds_to_suite(tt: TableThresholds) -> list[object]:
    """Emit the learned thresholds as validator instances (the
    AutoSuiteBuilder upgrade — reference profile_learner.py:299-458 maps
    each rule to a validator_config the same way). All emitted validators
    are spec-compiled, so the whole learned suite fuses into ONE
    distributed aggregate in check()."""
    from truthound_spark.validators.aggregate import (
        MeanBetweenValidator,
        RowCountBetweenValidator,
    )
    from truthound_spark.validators.completeness import NullValidator
    from truthound_spark.validators.distribution import RangeValidator
    from truthound_spark.validators.string import LengthValidator
    from truthound_spark.validators.uniqueness import UniqueRatioValidator

    suite: list[object] = []
    if tt.row_count_min is not None or tt.row_count_max is not None:
        suite.append(
            RowCountBetweenValidator(
                min_count=tt.row_count_min or 0, max_count=tt.row_count_max
            )
        )
    for name, th in sorted(tt.columns.items()):
        if th.null_ratio_max is not None and th.null_ratio_max < 1.0:
            suite.append(NullValidator(columns=[name], mostly=1.0 - th.null_ratio_max))
        if th.min_value is not None or th.max_value is not None:
            suite.append(RangeValidator(name, th.min_value, th.max_value))
        if th.mean_min is not None or th.mean_max is not None:
            suite.append(MeanBetweenValidator(name, th.mean_min, th.mean_max))
        if th.unique_ratio_min is not None:
            suite.append(UniqueRatioValidator(name, min_ratio=th.unique_ratio_min))
        if th.min_length is not None and th.max_length is not None:
            suite.append(
                LengthValidator(name, min_length=th.min_length, max_length=th.max_length)
            )
    return suite


# ---------------------------------------------------------------------------
# profile history persistence
# ---------------------------------------------------------------------------


class ProfileHistoryStore:
    """Store profile runs per table; feed them back to the learner.

    One JSON per run under ``root/<table>/`` (reference keeps history in
    profiler/evolution/history.py against its stores). Profiles are tiny
    (O(columns) scalars) regardless of data scale, so local JSON is the
    right layer even for 100 TB tables — point ``root`` at a mounted
    object store for durability.
    """

    def __init__(self, root: str = ".truthound/profiles") -> None:
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _dir(self, table: str) -> str:
        d = os.path.join(self.root, table)
        os.makedirs(d, exist_ok=True)
        return d

    _seq = itertools.count()  # disambiguates same-millisecond saves

    def save(self, table: str, profile: TableProfile, run_id: str | None = None) -> str:
        # ms timestamp alone collides when two saves land in the same
        # millisecond (silently overwriting a history run); a process-wide
        # monotonic counter keeps generated ids unique while preserving
        # the sortable time prefix that list_runs() ordering relies on.
        run_id = run_id or f"p-{int(time.time() * 1000):016d}-{next(self._seq):06d}"
        with open(os.path.join(self._dir(table), f"{run_id}.json"), "w") as f:
            json.dump(profile.to_dict(), f, default=str)
        return run_id

    def list_runs(self, table: str) -> list[str]:
        d = self._dir(table)
        return sorted(f[:-5] for f in os.listdir(d) if f.endswith(".json"))

    def load(self, table: str, run_id: str) -> TableProfile:
        with open(os.path.join(self._dir(table), f"{run_id}.json")) as f:
            return _profile_from_dict(json.load(f))

    def load_history(self, table: str, last_n: int | None = None) -> list[TableProfile]:
        runs = self.list_runs(table)
        if last_n is not None:
            runs = runs[-last_n:]
        return [self.load(table, r) for r in runs]

    def learn(
        self, table: str, last_n: int | None = None, **learner_kwargs: Any
    ) -> TableThresholds:
        history = self.load_history(table, last_n)
        return HistoryThresholdLearner(**learner_kwargs).learn(history, table=table)


def _profile_from_dict(d: dict[str, Any]) -> TableProfile:
    tp = TableProfile(
        row_count=d.get("row_count", 0),
        column_count=d.get("column_count", 0),
        duplicate_row_count=d.get("duplicate_row_count", 0),
        correlations=d.get("correlations"),
    )
    for name, cd in (d.get("columns") or {}).items():
        known = {f for f in ColumnProfile.__dataclass_fields__}
        tp.columns[name] = ColumnProfile(**{k: v for k, v in cd.items() if k in known})
    return tp
