"""Data profiler (reference: src/truthound/profiler/table_profiler.py:253
DataProfiler.profile; column analyzers column_profiler.py:173-366).

One wide distributed aggregate for all per-column stats (basic/numeric/
string/datetime analyzers fused), one bounded groupBy pass per
low-cardinality column for value frequencies, one whole-row duplicate
check. The reference's sketches (HyperLogLog profiler/sketches/
hyperloglog.py:25) map to approx_count_distinct.
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass, field
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from truthound_spark.core.base import (
    DATETIME_TYPES,
    NUMERIC_TYPES,
    STRING_TYPES,
    pct_agg,
)


@dataclass
class ColumnProfile:
    name: str
    dtype: str
    null_count: int = 0
    null_ratio: float = 0.0
    distinct_count: int = 0
    unique_ratio: float = 0.0
    min: Any = None
    max: Any = None
    mean: float | None = None
    std: float | None = None
    quantiles: dict[str, float] | None = None
    min_length: int | None = None
    max_length: int | None = None
    avg_length: float | None = None
    top_values: list[dict[str, Any]] | None = None
    skewness: float | None = None
    kurtosis: float | None = None


@dataclass
class TableProfile:
    row_count: int = 0
    column_count: int = 0
    duplicate_row_count: int = 0
    columns: dict[str, ColumnProfile] = field(default_factory=dict)
    correlations: dict[str, float] | None = None

    def to_dict(self) -> dict[str, Any]:
        return {
            "row_count": self.row_count,
            "column_count": self.column_count,
            "duplicate_row_count": self.duplicate_row_count,
            "columns": {k: asdict(v) for k, v in self.columns.items()},
            "correlations": self.correlations,
        }

    def to_json(self, indent: int = 2) -> str:
        return json.dumps(self.to_dict(), indent=indent, default=str)


def _stat_aggs(fields, approx: bool):
    """The fused per-column agg lists shared by profile() and
    profile_grouped().

    Returns ``(aggs, pct_aggs, numeric, string)``: the percentile
    aggregates are SPLIT into their own list (r14, guide §1.2/§7.2)
    because ``percentile`` / ``approx_percentile`` are
    TypedImperativeAggregate functions — any aggregate containing one is
    planned as ObjectHashAggregateExec, which does NOT support
    whole-stage codegen, so every OTHER aggregate in the same job
    (min/max/mean/std/skew/kurt, and with distinct counts an Expand ×
    (distinct cols + 1) of the input) degrades to interpreted per-row
    evaluation — and with countDistinct in the mix the planner inserted
    two SortAggregate levels over the expanded rows. Running the
    percentiles as a second, narrow aggregate keeps the wide job fully
    codegen'd: measured 3.95 s → 1.57 s (2.5×) on the 450k-row
    3-snapshot profile_grouped bench shape, plan audit 2 SortAggregate →
    0. The values are bit-identical (same aggregate expressions, same
    inputs — only the job boundary moved)."""
    aggs: list = [F.count(F.lit(1)).alias("__n")]
    pct_aggs: list = []
    numeric, string = [], []
    distinct = (
        (lambda c: F.approx_count_distinct(c).alias(f"{c}__nu"))
        if approx
        else (lambda c: F.countDistinct(F.col(c)).alias(f"{c}__nu"))
    )

    for f_ in fields:
        c = f_.name
        aggs.append(F.count(F.col(c)).alias(f"{c}__nn"))
        aggs.append(distinct(c))
        if isinstance(f_.dataType, NUMERIC_TYPES):
            numeric.append(c)
            aggs.extend(
                [
                    F.min(c).alias(f"{c}__min"),
                    F.max(c).alias(f"{c}__max"),
                    F.mean(c).alias(f"{c}__mean"),
                    F.stddev(c).alias(f"{c}__std"),
                    F.skewness(c).alias(f"{c}__skew"),
                    F.kurtosis(c).alias(f"{c}__kurt"),
                ]
            )
            pct_aggs.append(pct_agg(c, [0.25, 0.5, 0.75], approx).alias(f"{c}__q"))
        elif isinstance(f_.dataType, STRING_TYPES):
            string.append(c)
            ln = F.length(F.col(c))
            aggs.extend(
                [
                    F.min(ln).alias(f"{c}__minlen"),
                    F.max(ln).alias(f"{c}__maxlen"),
                    F.avg(ln).alias(f"{c}__avglen"),
                ]
            )
        elif isinstance(f_.dataType, DATETIME_TYPES):
            aggs.extend([F.min(c).alias(f"{c}__min"), F.max(c).alias(f"{c}__max")])
    return aggs, pct_aggs, numeric, string


def _row_to_profile(row: dict, fields) -> TableProfile:
    n = int(row["__n"])
    prof = TableProfile(row_count=n, column_count=len(fields))
    for f_ in fields:
        c = f_.name
        nn = int(row.get(f"{c}__nn") or 0)
        nu = int(row.get(f"{c}__nu") or 0)
        cp = ColumnProfile(
            name=c,
            dtype=f_.dataType.simpleString(),
            null_count=n - nn,
            null_ratio=round((n - nn) / n, 6) if n else 0.0,
            distinct_count=nu,
            unique_ratio=round(nu / nn, 6) if nn else 0.0,
            min=row.get(f"{c}__min"),
            max=row.get(f"{c}__max"),
            mean=row.get(f"{c}__mean"),
            std=row.get(f"{c}__std"),
            skewness=row.get(f"{c}__skew"),
            kurtosis=row.get(f"{c}__kurt"),
            min_length=row.get(f"{c}__minlen"),
            max_length=row.get(f"{c}__maxlen"),
            avg_length=row.get(f"{c}__avglen"),
        )
        q = row.get(f"{c}__q")
        if q:
            cp.quantiles = {"q25": q[0], "q50": q[1], "q75": q[2]}
        prof.columns[c] = cp
    return prof


def profile(
    df: DataFrame,
    approx: bool = False,
    top_k: int = 10,
    with_correlations: bool = False,
    with_duplicates: bool = True,
) -> TableProfile:
    """Profile a DataFrame; ``approx=True`` switches distinct counts to
    HLL++ and percentiles to the mergeable sketch (the 100 TB mode)."""
    aggs, pct_aggs, numeric, string = _stat_aggs(df.schema.fields, approx)
    row = df.agg(*aggs).collect()[0].asDict()
    if pct_aggs:
        # second, narrow aggregate for the percentile sketches only — see
        # _stat_aggs for why fusing them would de-codegen the wide job
        row.update(df.agg(*pct_aggs).collect()[0].asDict())
    n = int(row["__n"])
    prof = _row_to_profile(row, df.schema.fields)

    # value frequencies for low-cardinality columns (ValueFrequencyAnalyzer,
    # reference column_profiler.py:311) — bounded groupBy per column;
    # top_k=0 skips the whole phase (threshold learners don't consume
    # top_values, and each low-cardinality column otherwise costs one
    # extra job — material when profiling N snapshots in a loop)
    for c, cp in prof.columns.items():
        if 0 < cp.distinct_count <= 100 and top_k > 0:
            top = (
                df.groupBy(c)
                .agg(F.count(F.lit(1)).alias("n"))
                .orderBy(F.desc("n"), F.col(c))
                .limit(top_k)
                .collect()
            )
            cp.top_values = [{"value": r[c], "count": int(r["n"])} for r in top]

    if with_duplicates and df.columns:
        # DuplicateRowAnalyzer (reference table_profiler.py:86)
        distinct_rows = df.dropDuplicates().count()
        prof.duplicate_row_count = n - distinct_rows

    if with_correlations and len(numeric) >= 2:
        # CorrelationAnalyzer (reference table_profiler.py:193): fused pairwise corr
        pairs = [(a, b) for i, a in enumerate(numeric) for b in numeric[i + 1:]]
        corr_aggs = [F.corr(a, b).alias(f"{a}|{b}") for a, b in pairs]
        crow = df.agg(*corr_aggs).collect()[0].asDict()
        prof.correlations = {k: v for k, v in crow.items() if v is not None}
    return prof


def profile_grouped(
    df: DataFrame,
    group_col: str,
    approx: bool = False,
    max_groups: int = 10_000,
) -> dict[Any, TableProfile]:
    """Profile every group/segment of ``df`` in ONE scan — the snapshot /
    daily-partition profiling primitive (reference ProfileMerger
    "profiles from ... different data partitions",
    profiler/incremental.py:465-470, and the distributed profiler's
    PartitionStrategy, profiler/distributed.py:93; the reference
    materializes per-partition frames and profiles each — here the whole
    history is ONE groupBy aggregate, so N snapshots cost one table scan
    instead of N).

    Returns {group_value: TableProfile}. The group column itself is not
    profiled. Stats are bit-identical to per-snapshot ``profile()`` calls
    (same fused agg expressions, grouped), which is what lets
    HistoryThresholdLearner consume either form interchangeably.

    Driver safety: one collected row per group (~a few KB of scalars);
    ``max_groups`` bounds it — snapshot keys are calendar-bounded by
    design, and a mistyped high-cardinality group column raises instead
    of OOMing the driver."""
    fields = [f_ for f_ in df.schema.fields if f_.name != group_col]
    if not fields:
        raise ValueError("profile_grouped needs at least one non-group column")
    aggs, pct_aggs, _, _ = _stat_aggs(fields, approx)
    rows = df.groupBy(group_col).agg(*aggs).limit(max_groups + 1).collect()
    if len(rows) > max_groups:
        raise ValueError(
            f"profile_grouped: more than {max_groups} groups in {group_col!r}; "
            "raise max_groups or use a coarser snapshot key"
        )
    merged = {r[group_col]: r.asDict() for r in rows}
    if pct_aggs:
        # percentile sketches in their own grouped aggregate (same group
        # set by construction — same rows, same key); see _stat_aggs
        for r in df.groupBy(group_col).agg(*pct_aggs).limit(max_groups + 1).collect():
            merged[r[group_col]].update(r.asDict())
    return {g: _row_to_profile(d, fields) for g, d in merged.items()}


#: Pattern classes for the string pattern analyzer
#: (reference: profiler/column_profiler.py:366 PatternAnalyzer).
PATTERN_CLASSES: dict[str, str] = {
    "numeric": r"^-?[0-9]+(\.[0-9]+)?$",
    "alpha": r"^[A-Za-z]+$",
    "alphanumeric": r"^[A-Za-z0-9]+$",
    "email": r"^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}$",
    "uuid": r"^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$",
    "date_iso": r"^\d{4}-\d{2}-\d{2}",
    "whitespace_padded": r"^\s+.*|.*\s+$",
}


def pattern_profile(
    df: DataFrame, columns: list[str] | None = None
) -> dict[str, dict[str, Any]]:
    """Per-column pattern-class ratios + dominant class — ONE fused agg over
    all (column × class) rlike counters (reference PatternAnalyzer,
    profiler/column_profiler.py:366)."""
    cols = columns or [
        f.name for f in df.schema.fields if isinstance(f.dataType, STRING_TYPES)
    ]
    if not cols:
        return {}
    aggs = []
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"{c}__nn"))
        for cls, pat in PATTERN_CLASSES.items():
            aggs.append(
                F.sum(F.when(F.col(c).rlike(pat), 1).otherwise(0)).alias(f"{c}__{cls}")
            )
    row = df.agg(*aggs).collect()[0].asDict()
    out: dict[str, dict[str, Any]] = {}
    for c in cols:
        nn = int(row[f"{c}__nn"] or 0)
        ratios = {
            cls: round((row[f"{c}__{cls}"] or 0) / nn, 6) if nn else 0.0
            for cls in PATTERN_CLASSES
        }
        dominant = max(ratios, key=ratios.get) if nn else None
        out[c] = {
            "ratios": ratios,
            "dominant": dominant if ratios.get(dominant, 0) > 0 else None,
        }
    return out


def sketch_profile(
    df: DataFrame,
    columns: list[str] | None = None,
    support: float = 0.01,
) -> dict[str, dict[str, Any]]:
    """Sketch-based profile for 100 TB columns (reference sketches:
    profiler/sketches/{hyperloglog,countmin,bloom}.py → Spark built-ins):
    HLL++ distinct estimates (approx_count_distinct) + heavy hitters
    (df.stat.freqItems — the count-min-sketch role)."""
    cols = columns or df.columns
    aggs = [F.approx_count_distinct(c).alias(f"{c}__nu") for c in cols]
    row = df.agg(*aggs).collect()[0].asDict()
    freq = df.stat.freqItems(cols, support).collect()[0].asDict()
    return {
        c: {
            "approx_distinct": int(row[f"{c}__nu"] or 0),
            "heavy_hitters": sorted(
                (v for v in (freq.get(f"{c}_freqItems") or []) if v is not None),
                key=str,
            )[:20],
        }
        for c in cols
    }


def suggest_suite(profile: TableProfile) -> list:
    """Profile → suggested validator suite (reference: profiler/suite_*.py
    generation): null checks everywhere nulls are rare, unique for
    key-like cardinality, range fenced at observed min/max ± 3σ for
    numerics, in_set for low-cardinality strings."""
    from truthound_spark.validators.completeness import NullValidator
    from truthound_spark.validators.distribution import InSetValidator, RangeValidator
    from truthound_spark.validators.uniqueness import UniqueValidator

    suite: list = []
    null_cols = [c.name for c in profile.columns.values() if c.null_ratio <= 0.01]
    if null_cols:
        suite.append(NullValidator(columns=null_cols))
    unique_cols = [
        c.name for c in profile.columns.values() if c.unique_ratio >= 0.999 and c.distinct_count > 1
    ]
    if unique_cols:
        suite.append(UniqueValidator(columns=unique_cols))
    for c in profile.columns.values():
        if c.mean is not None and c.min is not None and c.max is not None:
            pad = 3.0 * (c.std or 0.0)
            suite.append(RangeValidator(c.name, float(c.min) - pad, float(c.max) + pad))
        elif (
            c.top_values
            and c.distinct_count
            and c.distinct_count <= 20
            and c.dtype == "string"
        ):
            suite.append(
                InSetValidator(c.name, [t["value"] for t in c.top_values])
            )
    return suite
