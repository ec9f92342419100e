"""SharedMetricStore — cross-validator metric deduplication
(reference: src/truthound/validators/metrics.py SharedMetricStore +
MetricKey, the GX resolved-metrics pattern; module docstring :13-15;
thread-safe compute-once :162-201; SURVEY §4.3 calls this the single most
important port).

Two layers of dedup exist in this engine:
  1. WITHIN one suite run, the BatchExpressionExecutor fuses every spec's
     aggregates into one ``df.agg`` and Catalyst eliminates identical
     sub-expressions — that dedup is free and always on.
  2. ACROSS runs/validators that consult metrics imperatively (profilers,
     judges, auto-suite), this store batches the union of requested
     MetricKeys into ONE job per flush and memoizes results for the
     DataFrame's lifetime.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class MetricKey:
    """(metric, column, param) identity (reference metrics.py MetricKey)."""

    metric: str
    column: str | None = None
    param: Any = None

    def alias(self) -> str:
        p = "" if self.param is None else f"_{self.param}"
        c = "" if self.column is None else f"__{self.column}"
        return f"{self.metric}{c}{p}".replace(".", "_")


#: metric name → Column-expression factory (reference metrics.py:266-361)
METRIC_EXPRS: dict[str, Any] = {
    "row_count": lambda c, p: F.count(F.lit(1)),
    "null_count": lambda c, p: F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)),
    "non_null_count": lambda c, p: F.count(F.col(c)),
    "n_unique": lambda c, p: F.countDistinct(F.col(c)),
    "approx_n_unique": lambda c, p: F.approx_count_distinct(c),
    "mean": lambda c, p: F.mean(c),
    "std": lambda c, p: F.stddev_samp(c),
    "min": lambda c, p: F.min(c),
    "max": lambda c, p: F.max(c),
    "sum": lambda c, p: F.sum(c),
    "median": lambda c, p: F.expr(f"percentile({c}, 0.5)"),
    "quantile": lambda c, p: F.expr(f"percentile({c}, {p})"),
    "approx_quantile": lambda c, p: F.expr(f"percentile_approx({c}, {p}, 10000)"),
}


class SharedMetricStore:
    """Thread-safe, compute-once metric cache over one DataFrame.

    ``request`` registers keys; ``get`` flushes every pending key in ONE
    ``df.agg`` job, then serves memoized values. Repeated ``get``s of the
    same key never touch the cluster again.
    """

    def __init__(self, df: DataFrame) -> None:
        self.df = df
        self._lock = threading.Lock()
        self._values: dict[MetricKey, Any] = {}
        self._pending: set[MetricKey] = set()

    def request(self, *keys: MetricKey) -> None:
        with self._lock:
            for k in keys:
                if k not in self._values:
                    self._pending.add(k)

    def get(self, key: MetricKey) -> Any:
        self.request(key)
        self.flush()
        return self._values[key]

    def get_many(self, keys: list[MetricKey]) -> dict[MetricKey, Any]:
        self.request(*keys)
        self.flush()
        return {k: self._values[k] for k in keys}

    def flush(self) -> int:
        """Compute all pending keys in one fused aggregation job.
        Returns the number of metrics computed."""
        with self._lock:
            pending = list(self._pending)
            self._pending.clear()
        if not pending:
            return 0
        aggs: list[Column] = []
        for k in pending:
            factory = METRIC_EXPRS.get(k.metric)
            if factory is None:
                raise KeyError(f"unknown metric {k.metric!r}; known: {sorted(METRIC_EXPRS)}")
            aggs.append(factory(k.column, k.param).alias(k.alias()))
        row = self.df.agg(*aggs).collect()[0].asDict()
        with self._lock:
            for k in pending:
                self._values[k] = row[k.alias()]
        return len(pending)

    @property
    def computed(self) -> int:
        return len(self._values)
