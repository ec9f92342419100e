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
        self._seen_batches: set[int] = set()

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_id in self._seen_batches:
            return
        self._seen_batches.add(batch_id)
        if batch_df.count() < self.min_rows:
            return
        for name, det in self.detectors.items():
            res = det.detect(batch_df)
            detection = DriftDetection(
                batch_id=batch_id,
                detector=name,
                drift_score=float(getattr(res, "drift_score", 0.0)),
                is_drifted=bool(getattr(res, "is_drifted", False)),
                result=res,
            )
            self.detections.append(detection)
            if len(self.detections) > self.max_results:
                del self.detections[: -self.max_results]
            if detection.is_drifted and self.on_drift is not None:
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
    trigger_seconds: int | None = None,
    query_name: str = "truthound_drift_monitor",
):
    """Attach fitted-detector drift monitoring to a streaming DataFrame
    — the streaming companion of ``validate_stream`` (same
    exactly-once bookkeeping via checkpointLocation + per-batch-id
    idempotence). Returns (StreamingQuery, StreamingDriftSink)."""
    sink = StreamingDriftSink(detectors, on_drift=on_drift, min_rows=min_rows)
    writer = (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_location)
        .queryName(query_name)
    )
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start(), sink
