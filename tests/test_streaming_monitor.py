"""First-class streaming drift monitoring (streaming/monitor.py;
reference ml/monitoring record/evaluate loop + realtime validate_stream
shape): fit once, detect per micro-batch, alert callbacks, min_rows
guard, per-batch-id idempotence."""

from __future__ import annotations

import json
import os
import random

import pytest

from truthound_spark.streaming.monitor import StreamingDriftSink, monitor_stream
from truthound_spark.streaming.sources import read_file_stream


def _write_batch(path: str, name: str, values: list[float]) -> None:
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, name), "w") as f:
        for v in values:
            f.write(json.dumps({"score": v}) + "\n")


def test_monitor_stream_detects_shifted_batch(spark, tmp_path):
    from truthound_spark.ml import DistributionDriftDetector
    from truthound_spark.ml.feature_drift import FeatureDriftDetector

    rng = random.Random(7)
    ref = spark.createDataFrame(
        [(rng.gauss(0.3, 0.05),) for _ in range(2000)], "score double"
    )
    detectors = {
        "psi": DistributionDriftDetector(method="psi", threshold=0.1).fit(ref),
        # threshold 0.6: an in-distribution batch can still exceed the
        # reference min/max (range-exceeded contributes a flat 0.5)
        "feature": FeatureDriftDetector(threshold=0.6).fit(ref),
    }

    src = str(tmp_path / "in")
    _write_batch(src, "b1.jsonl", [rng.gauss(0.3, 0.05) for _ in range(500)])
    _write_batch(src, "b2.jsonl", [rng.gauss(0.75, 0.05) for _ in range(500)])

    alerts = []
    stream = read_file_stream(
        spark, src, "score double", format="json", max_files_per_trigger=1
    )
    q, sink = monitor_stream(
        stream,
        detectors,
        checkpoint_location=str(tmp_path / "ck"),
        on_drift=alerts.append,
        min_rows=100,
        query_name="t_drift",
    )
    # availableNow semantics: drive via the returned query
    q.processAllAvailable()
    q.stop()

    # 2 batches × 2 detectors
    assert len(sink.detections) == 4
    drifted = sink.drifted
    assert drifted and all(d.is_drifted for d in drifted)
    # only the shifted batch alerts, through both detectors
    assert {d.detector for d in drifted} == {"psi", "feature"}
    assert len({d.batch_id for d in drifted}) == 1
    assert alerts and alerts[0].to_dict()["is_drifted"] is True


def test_sink_min_rows_and_idempotence(spark):
    class FakeDet:
        calls = 0

        def detect(self, df):
            FakeDet.calls += 1

            class R:
                drift_score = 1.0
                is_drifted = True

            return R()

    sink = StreamingDriftSink({"f": FakeDet()}, min_rows=10)
    small = spark.range(3)
    big = spark.range(50)
    sink(small, 0)  # under min_rows: skipped
    assert FakeDet.calls == 0 and sink.detections == []
    sink(big, 1)
    assert FakeDet.calls == 1 and len(sink.detections) == 1
    sink(big, 1)  # replayed batch: idempotent
    assert FakeDet.calls == 1

    with pytest.raises(ValueError, match="at least one"):
        StreamingDriftSink({})
