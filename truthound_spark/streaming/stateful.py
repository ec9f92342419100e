"""Custom stateful streaming operators via applyInPandasWithState
(reference: the realtime/ state layer — StateStore ABC + accumulators,
realtime/incremental.py:38-160, streaming ECDF/online stats
validators/memory/*; SURVEY §2.10 maps these to applyInPandasWithState).

``running_column_stats`` keeps per-key running count/sum/min/max (+ a
range-violation counter) in the Spark state store across micro-batches —
the engine-native replacement for the reference's CountingAccumulator /
StreamingRange validators. State lives in the built-in (HDFS/RocksDB)
state store: fault-tolerant, exactly-once with checkpointLocation.
"""

from __future__ import annotations

from typing import Any, Iterator

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

STATS_STATE_SCHEMA = "count LONG, sum DOUBLE, min DOUBLE, max DOUBLE, violations LONG"
STATS_OUTPUT_SCHEMA = (
    "key LONG, count LONG, mean DOUBLE, min DOUBLE, max DOUBLE, violations LONG"
)


def running_column_stats(
    stream_df: DataFrame,
    key_col: str,
    value_col: str,
    min_value: float | None = None,
    max_value: float | None = None,
) -> DataFrame:
    """Per-key running stats + out-of-range counter with persistent state.

    Returns a streaming DataFrame (key, count, mean, min, max, violations)
    emitting the UPDATED state per key per micro-batch."""

    lo = float("-inf") if min_value is None else float(min_value)
    hi = float("inf") if max_value is None else float(max_value)

    def update(key: Any, pdfs: Iterator["pd.DataFrame"], state: GroupState):
        import pandas as pd

        if state.exists:
            count, total, mn, mx, viol = state.get
        else:
            count, total, mn, mx, viol = 0, 0.0, float("inf"), float("-inf"), 0
        for pdf in pdfs:
            vals = pdf[value_col].dropna()
            if len(vals):
                count += int(len(vals))
                total += float(vals.sum())
                mn = min(mn, float(vals.min()))
                mx = max(mx, float(vals.max()))
                viol += int(((vals < lo) | (vals > hi)).sum())
        state.update((count, total, mn, mx, viol))
        yield pd.DataFrame(
            [
                {
                    "key": key[0],
                    "count": count,
                    "mean": (total / count) if count else None,
                    "min": mn if count else None,
                    "max": mx if count else None,
                    "violations": viol,
                }
            ]
        )

    return (
        stream_df.groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=STATS_OUTPUT_SCHEMA,
            stateStructType=STATS_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
