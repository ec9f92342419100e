"""Streaming drift monitoring: fitted detectors per micro-batch.

Reference: ml/monitoring/monitor.py (the record/evaluate loop) +
realtime/base.py's validate_stream shape — re-expressed as a
foreachBatch sink over the r8 fitted-detector quartet
(``FeatureDriftDetector`` / ``DistributionDriftDetector`` /
``ConceptDriftDetector`` — anything exposing ``detect(df) ->
result`` with ``is_drifted``/``drift_score``).

The 100 TB monitoring shape: the baseline is profiled ONCE into
O(columns)/O(cols×(bins+grid)) driver-side state at fit() time; every
micro-batch's detect() is then a single fused aggregate over that
batch only — the reference corpus is never re-scanned, no state store
is needed beyond the streaming checkpoint, and the per-batch result is
one summary row, so driver memory is bounded by ``max_results``
regardless of stream length. Idempotent per batch_id: Structured
Streaming replays the last uncommitted batch after failure recovery,
and re-alerting it would duplicate notifications.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import DataFrame

__all__ = ["DriftDetection", "StreamingDriftSink", "monitor_stream"]


class DriftDetection:
    """One detector's verdict on one micro-batch."""

    __slots__ = ("batch_id", "detector", "drift_score", "is_drifted", "result")

    def __init__(
        self,
        batch_id: int,
        detector: str,
        drift_score: float,
        is_drifted: bool,
        result: Any,
    ) -> None:
        self.batch_id = batch_id
        self.detector = detector
        self.drift_score = drift_score
        self.is_drifted = is_drifted
        self.result = result

    def to_dict(self) -> dict[str, Any]:
        return {
            "batch_id": self.batch_id,
            "detector": self.detector,
            "drift_score": self.drift_score,
            "is_drifted": self.is_drifted,
        }


class StreamingDriftSink:
    """foreachBatch sink running FITTED drift detectors on every
    micro-batch.

    ``detectors``: {name: fitted detector}. ``min_rows`` skips
    under-filled batches (drift statistics on a handful of rows are
    noise, and a trailing near-empty batch at shutdown would
    false-alarm). ``on_drift`` fires per drifted detection — the
    checkpoint-action surface (`checkpoint.py` targets plug in
    directly)."""

    def __init__(
        self,
        detectors: dict[str, Any],
        on_drift: Callable[[DriftDetection], None] | None = None,
        min_rows: int = 100,
        max_results: int = 1000,
    ) -> None:
        if not detectors:
            raise ValueError("need at least one fitted detector")
        self.detectors = dict(detectors)
        self.on_drift = on_drift
        self.min_rows = min_rows
        self.max_results = max_results
        self.detections: list[DriftDetection] = []
        # batch ids are monotonically increasing per checkpoint and only
        # the LAST uncommitted batch can replay — a high-water mark is
        # the O(1) form of the seen-set (an int per batch forever would
        # contradict the bounded-driver-memory contract)
        self._max_seen: int = -1

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= self._max_seen:
            return
        # each detector's detect() is its own aggregate — persist the
        # micro-batch once so the source isn't re-read n_detectors+1
        # times (count + every detect) on the hot path
        batch_df.persist()
        try:
            if batch_df.count() < self.min_rows:
                return
            batch = [
                DriftDetection(
                    batch_id=batch_id,
                    detector=name,
                    drift_score=float(getattr(res, "drift_score", 0.0)),
                    is_drifted=bool(getattr(res, "is_drifted", False)),
                    result=res,
                )
                for name, res in (
                    (n, det.detect(batch_df)) for n, det in self.detectors.items()
                )
            ]
        finally:
            # a detector failure leaves the batch UNMARKED, so the
            # replayed batch re-runs every detector instead of being
            # silently committed with partial results; alerts are
            # therefore at-least-once, detections never lost
            batch_df.unpersist()
        self._max_seen = batch_id
        self.detections.extend(batch)
        if len(self.detections) > self.max_results:
            del self.detections[: -self.max_results]
        if self.on_drift is not None:
            for detection in batch:
                if detection.is_drifted:
                    self.on_drift(detection)

    @property
    def drifted(self) -> list[DriftDetection]:
        return [d for d in self.detections if d.is_drifted]


def monitor_stream(
    stream_df: DataFrame,
    detectors: dict[str, Any],
    checkpoint_location: str,
    on_drift: Callable[[DriftDetection], None] | None = None,
    min_rows: int = 100,
    max_results: int = 1000,
    trigger_seconds: int | None = None,
    query_name: str = "truthound_drift_monitor",
):
    """Attach fitted-detector drift monitoring to a streaming DataFrame
    — the streaming companion of ``validate_stream`` (same
    exactly-once bookkeeping via checkpointLocation + per-batch-id
    idempotence). Returns (StreamingQuery, StreamingDriftSink)."""
    sink = StreamingDriftSink(
        detectors, on_drift=on_drift, min_rows=min_rows, max_results=max_results
    )
    writer = (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_location)
        .queryName(query_name)
    )
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start(), sink
