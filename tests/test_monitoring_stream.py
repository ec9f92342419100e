"""Streaming model monitoring: file-source readStream → per-microbatch
score summaries + drift alerts through ModelMonitor (reference
ml/monitoring/monitor.py record_prediction loop, re-expressed as a
foreachBatch sink — the scores never leave the executors; each batch
contributes one O(1) summary)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from truthound_spark.ml.monitoring import ModelMonitor
from truthound_spark.streaming.sources import read_file_stream


def _write_batch(path: str, name: str, values: list[float]) -> None:
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, name), "w") as f:
        for v in values:
            f.write(json.dumps({"score": v}) + "\n")


def test_streaming_monitor_alerts_on_drifted_batch(spark, tmp_path):
    import random

    rng = random.Random(11)
    src = str(tmp_path / "scores")
    ckpt = str(tmp_path / "ckpt")

    ref = spark.createDataFrame(
        [(rng.gauss(0.2, 0.05),) for _ in range(2000)], "score double"
    )
    mon = ModelMonitor(root=str(tmp_path / "mon"))
    mon.register_model("m", ref, threshold=0.5)

    # batch 1: in-distribution; batch 2: drifted high scores
    _write_batch(src, "b1.jsonl", [rng.gauss(0.2, 0.05) for _ in range(800)])

    stream = read_file_stream(
        spark, src, "score double", format="json", max_files_per_trigger=1
    )

    def sink(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        mon.record_scores("m", batch_df)

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert mon.health("m") == "healthy"
    n_batches_clean = len(mon.get_metrics("m")["batches"])
    assert n_batches_clean >= 1

    _write_batch(src, "b2.jsonl", [rng.gauss(0.8, 0.05) for _ in range(800)])
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)  # same checkpoint → only b2 is new
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    assert mon.health("m") == "critical"
    rules = {a.rule for a in mon.alerts("m")}
    assert "score_psi" in rules and "anomaly_rate" in rules
    # exactly one NEW batch was summarized (checkpoint replay safety)
    assert len(mon.get_metrics("m")["batches"]) == n_batches_clean + 1
    # persisted JSONL matches in-memory history
    assert len(mon.load_history("m")) == n_batches_clean + 1


def test_streaming_fitted_distribution_drift(spark, tmp_path):
    """Fitted DistributionDriftDetector in the streaming loop: profile
    the reference ONCE, then every micro-batch costs one aggregate over
    the batch — the scan-once contract under foreachBatch."""
    import random

    from truthound_spark.ml import DistributionDriftDetector

    rng = random.Random(91)
    ref = spark.createDataFrame(
        [(rng.gauss(0.3, 0.05),) for _ in range(2000)], "score double"
    )
    det = DistributionDriftDetector(method="psi", threshold=0.1).fit(ref)

    src = str(tmp_path / "in")
    ckpt = str(tmp_path / "ck")
    _write_batch(src, "b1.jsonl", [rng.gauss(0.3, 0.05) for _ in range(500)])
    _write_batch(src, "b2.jsonl", [rng.gauss(0.75, 0.05) for _ in range(500)])

    results = []
    stream = read_file_stream(
        spark, src, "score double", format="json", max_files_per_trigger=1
    )

    def sink(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        results.append(det.detect(batch_df))

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert len(results) == 2
    drifted = sorted(r.is_drifted for r in results)
    assert drifted == [False, True]  # in-dist batch quiet, shifted batch loud
