"""Reference-data caching for drift/anomaly validators (reference:
validators/cache.py — LRU + TTL + memory-bounded statistics cache).

The reference memoizes BASELINE-side statistics (not raw data) per
(validator, column, data-fingerprint) so repeated validations against a
fixed baseline pay the baseline scan once. Spark-first translation:

  * ``NumericStatistics.from_dataframe`` — one fused ``df.agg`` for the
    scalar stats + mergeable ``percentile_approx`` quantiles, then one
    width-bucket groupBy for the histogram (two jobs total, each a single
    column scan; cached thereafter).
  * ``CategoricalStatistics.from_dataframe`` — one groupBy(count) with a
    top-k cap so hub categories can't blow driver memory.
  * ``ReferenceCache`` — thread-safe LRU with TTL and an approximate
    memory ceiling (entries store only O(bins + quantiles + top-k)
    scalars — never rows).
  * ``cached_psi`` — drift integration: the baseline's bin edges/counts
    come from the cache on a hit, so only the CURRENT side is scanned.

At 100 TB the baseline side of a drift check is the expensive half; this
cache turns every re-validation into a current-side-only job.
"""

from __future__ import annotations

import hashlib
import json
import math
import threading
import time
from collections import OrderedDict
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class CacheConfig:
    """(reference cache.py:49-71)"""

    max_entries: int = 100
    max_memory_mb: float = 512.0
    ttl_seconds: float | None = None
    n_histogram_bins: int = 10
    quantiles: tuple[float, ...] = (0.01, 0.05, 0.25, 0.5, 0.75, 0.95, 0.99)


@dataclass
class NumericStatistics:
    """Summary of a numeric baseline column (reference cache.py:73-230):
    everything PSI/KS/quantile/range/mean/variance drift needs, no rows."""

    column: str
    count: int
    null_count: int
    mean: float | None
    std: float | None
    min: float | None
    max: float | None
    quantile_probs: list[float] = field(default_factory=list)
    quantile_values: list[float] = field(default_factory=list)
    histogram_edges: list[float] = field(default_factory=list)
    histogram_counts: list[int] = field(default_factory=list)

    def estimate_memory_bytes(self) -> int:
        return 200 + 8 * (
            len(self.quantile_probs)
            + len(self.quantile_values)
            + len(self.histogram_edges)
            + len(self.histogram_counts)
        )

    @classmethod
    def from_dataframe(
        cls,
        df: DataFrame,
        column: str,
        n_bins: int = 10,
        quantiles: tuple[float, ...] = CacheConfig.quantiles,
    ) -> "NumericStatistics":
        probs = list(quantiles)
        row = df.agg(
            F.count(F.lit(1)).alias("rc"),
            F.count(column).alias("nn"),
            F.avg(column).alias("mean"),
            F.stddev_samp(column).alias("std"),
            F.min(column).alias("mn"),
            F.max(column).alias("mx"),
            F.percentile_approx(column, probs, 10_000).alias("q"),
        ).collect()[0]
        count = int(row["rc"])
        mn, mx = row["mn"], row["mx"]
        edges: list[float] = []
        counts: list[int] = []
        if mn is not None and mx is not None:
            # the drift module's binning, verbatim — cached_psi must
            # reproduce psi() bit-for-bit on the baseline side
            from truthound_spark.drift.detectors import _hist_counts

            lo, hi = float(mn), float(mx)
            width = (hi - lo) / n_bins if hi > lo else 1.0
            edges = [lo + i * width for i in range(n_bins + 1)]
            counts = _hist_counts(df, column, lo, hi, n_bins)
        return cls(
            column=column,
            count=count,
            null_count=count - int(row["nn"]),
            mean=float(row["mean"]) if row["mean"] is not None else None,
            std=float(row["std"]) if row["std"] is not None else None,
            min=float(mn) if mn is not None else None,
            max=float(mx) if mx is not None else None,
            quantile_probs=probs,
            quantile_values=[float(v) for v in (row["q"] or [])],
            histogram_edges=edges,
            histogram_counts=counts,
        )


@dataclass
class CategoricalStatistics:
    """Top-k value frequencies of a categorical baseline column
    (reference cache.py:232-326); capped so hub columns stay O(k)."""

    column: str
    count: int
    null_count: int
    distinct_count: int
    value_counts: dict[str, int] = field(default_factory=dict)
    truncated: bool = False

    def estimate_memory_bytes(self) -> int:
        return 120 + sum(len(k) + 24 for k in self.value_counts)

    @classmethod
    def from_dataframe(
        cls, df: DataFrame, column: str, max_categories: int = 1000
    ) -> "CategoricalStatistics":
        row = df.agg(
            F.count(F.lit(1)).alias("rc"),
            F.count(column).alias("nn"),
            F.countDistinct(column).alias("dc"),
        ).collect()[0]
        top = (
            df.filter(F.col(column).isNotNull())
            .groupBy(F.col(column).cast("string").alias("v"))
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), "v")
            .limit(max_categories + 1)
            .collect()
        )
        truncated = len(top) > max_categories
        vc = {r["v"]: int(r["n"]) for r in top[:max_categories]}
        return cls(
            column=column,
            count=int(row["rc"]),
            null_count=int(row["rc"]) - int(row["nn"]),
            distinct_count=int(row["dc"]),
            value_counts=vc,
            truncated=truncated,
        )


@dataclass
class CacheEntry:
    """(reference cache.py:429-458)"""

    value: Any
    created_at: float = field(default_factory=time.time)
    last_access: float = field(default_factory=time.time)
    hits: int = 0

    def is_expired(self, ttl_seconds: float | None) -> bool:
        return ttl_seconds is not None and (time.time() - self.created_at) > ttl_seconds

    def touch(self) -> None:
        self.last_access = time.time()
        self.hits += 1

    def estimate_memory_bytes(self) -> int:
        est = getattr(self.value, "estimate_memory_bytes", None)
        return int(est()) if callable(est) else 256


class ReferenceCache:
    """Thread-safe LRU statistics cache (reference cache.py:460-634)."""

    def __init__(self, config: CacheConfig | None = None) -> None:
        self.config = config or CacheConfig()
        self._entries: OrderedDict[str, CacheEntry] = OrderedDict()
        self._lock = threading.RLock()
        self._hits = 0
        self._misses = 0
        self._evictions = 0

    def get(self, key: str) -> Any | None:
        with self._lock:
            e = self._entries.get(key)
            if e is None:
                self._misses += 1
                return None
            if e.is_expired(self.config.ttl_seconds):
                del self._entries[key]
                self._misses += 1
                return None
            e.touch()
            self._entries.move_to_end(key)
            self._hits += 1
            return e.value

    def put(self, key: str, value: Any) -> None:
        with self._lock:
            entry = CacheEntry(value)
            self._evict_if_needed(entry.estimate_memory_bytes())
            self._entries[key] = entry
            self._entries.move_to_end(key)

    def remove(self, key: str) -> bool:
        with self._lock:
            return self._entries.pop(key, None) is not None

    def clear(self) -> None:
        with self._lock:
            self._entries.clear()

    def memory_bytes(self) -> int:
        with self._lock:
            return sum(e.estimate_memory_bytes() for e in self._entries.values())

    def get_stats(self) -> dict[str, Any]:
        with self._lock:
            total = self._hits + self._misses
            return {
                "entries": len(self._entries),
                "hits": self._hits,
                "misses": self._misses,
                "hit_rate": (self._hits / total) if total else 0.0,
                "evictions": self._evictions,
                "memory_bytes": self.memory_bytes(),
            }

    def _evict_if_needed(self, incoming_bytes: int) -> None:
        max_bytes = self.config.max_memory_mb * 1024 * 1024
        while self._entries and (
            len(self._entries) >= self.config.max_entries
            or self.memory_bytes() + incoming_bytes > max_bytes
        ):
            self._entries.popitem(last=False)  # LRU head
            self._evictions += 1

    def __contains__(self, key: str) -> bool:
        with self._lock:
            e = self._entries.get(key)
            return e is not None and not e.is_expired(self.config.ttl_seconds)

    def __len__(self) -> int:
        return len(self._entries)


_global_cache: ReferenceCache | None = None
_global_lock = threading.Lock()


def get_global_cache(config: CacheConfig | None = None) -> ReferenceCache:
    """(reference cache.py:636-652)"""
    global _global_cache
    with _global_lock:
        if _global_cache is None:
            _global_cache = ReferenceCache(config)
        return _global_cache


def clear_global_cache() -> None:
    with _global_lock:
        if _global_cache is not None:
            _global_cache.clear()


def reset_global_cache(config: CacheConfig | None = None) -> ReferenceCache:
    global _global_cache
    with _global_lock:
        _global_cache = ReferenceCache(config)
        return _global_cache


def make_cache_key(
    validator_name: str,
    column: str | list[str],
    version: str = "v1",
    extra: str = "",
) -> str:
    """(reference cache.py:682-706)"""
    col_str = ":".join(sorted(column)) if isinstance(column, list) else column
    parts = [validator_name, col_str, version]
    if extra:
        parts.append(extra)
    return "|".join(parts)


def hash_dataframe(df: DataFrame, sample_size: int = 1000) -> str:
    """Cheap frame fingerprint for cache keys (reference cache.py:708-760):
    schema + a bounded head sample — never a full materialization."""
    schema_str = ",".join(f"{f.name}:{f.dataType.simpleString()}" for f in df.schema.fields)
    sample = [
        tuple(str(v) for v in row) for row in df.limit(sample_size).collect()
    ]
    data_str = json.dumps(sample, sort_keys=True, separators=(",", ":"))
    return hashlib.md5(f"{schema_str}:{data_str}".encode()).hexdigest()[:16]


# ---------------------------------------------------------------------------
# drift integration: baseline side from the cache, current side scanned
# ---------------------------------------------------------------------------


def cached_numeric_statistics(
    df: DataFrame,
    column: str,
    cache: ReferenceCache | None = None,
    key: str | None = None,
    n_bins: int = 10,
) -> NumericStatistics:
    """Fetch-or-compute a column's NumericStatistics. ``key`` defaults to
    (column, schema+head fingerprint) — pass an explicit key (e.g.
    'model_v1:price') to skip even the fingerprint job on reruns."""
    # NOT `cache or ...`: __len__ makes an EMPTY cache falsy
    cache = cache if cache is not None else get_global_cache()
    key = key or make_cache_key("numeric_stats", column, extra=hash_dataframe(df))
    hit = cache.get(key)
    if isinstance(hit, NumericStatistics):
        return hit
    stats = NumericStatistics.from_dataframe(df, column, n_bins=n_bins)
    cache.put(key, stats)
    return stats


def cached_psi(
    baseline: DataFrame,
    current: DataFrame,
    column: str,
    bins: int = 10,
    threshold: float = 0.1,
    cache: ReferenceCache | None = None,
    baseline_key: str | None = None,
):
    """PSI where the baseline histogram comes from the cache on a hit —
    repeated validations against a fixed baseline scan ONLY the current
    frame (the reference cache's headline use, cache.py module doc)."""
    from truthound_spark.drift.detectors import EPS, DriftResult, _freqs, _hist_counts

    stats = cached_numeric_statistics(
        baseline, column, cache=cache, key=baseline_key, n_bins=bins
    )
    if stats.min is None or stats.max is None or not stats.histogram_counts:
        return DriftResult("psi", 0.0, threshold, False, {"bins": bins, "empty_baseline": True})
    p = _freqs(stats.histogram_counts)
    q = _freqs(_hist_counts(current, column, stats.min, stats.max, bins))
    stat = sum((pi - qi) * math.log((pi + EPS) / (qi + EPS)) for pi, qi in zip(p, q))
    return DriftResult(
        "psi", stat, threshold, stat > threshold,
        {"bins": bins, "baseline": p, "current": q, "cached_baseline": True},
    )
