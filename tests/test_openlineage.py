"""OpenLineage emitter (lineage_openlineage.py; reference
lineage/integrations/openlineage.py): payload contracts pinned against
golden RunEvent JSON (visualization stays a non-goal)."""

from __future__ import annotations

import itertools
import json

import pytest

from truthound_spark.lineage import LineageTracker
from truthound_spark.lineage_openlineage import (
    DatasetFacets,
    OpenLineageConfig,
    OpenLineageEmitter,
    emit_tracker,
    file_transport,
)

SPEC = "https://openlineage.io/spec/1-0-5/OpenLineage.json#/$defs/RunEvent"


def _emitter(**kw):
    seq = itertools.count(1)
    return OpenLineageEmitter(
        run_id_factory=lambda: f"run-{next(seq):04d}",
        clock=lambda: "2026-01-01T00:00:00+00:00",
        **kw,
    )


def test_start_complete_golden_events():
    em = _emitter()
    run = em.start_run(
        "validate-orders", inputs=[em.build_input_dataset("orders")]
    )
    em.emit_complete(
        run, outputs=[em.build_output_dataset("orders_validated", row_count=42)]
    )
    assert em.events == [
        {
            "eventType": "START",
            "eventTime": "2026-01-01T00:00:00+00:00",
            "producer": "https://openlineage.io/producers/truthound-spark",
            "schemaURL": SPEC,
            "run": {"runId": "run-0001", "facets": {}},
            "job": {"namespace": "truthound", "name": "validate-orders"},
            "inputs": [{"namespace": "truthound", "name": "orders"}],
            "outputs": [],
        },
        {
            "eventType": "COMPLETE",
            "eventTime": "2026-01-01T00:00:00+00:00",
            "producer": "https://openlineage.io/producers/truthound-spark",
            "schemaURL": SPEC,
            "run": {"runId": "run-0001", "facets": {}},
            "job": {"namespace": "truthound", "name": "validate-orders"},
            "inputs": [{"namespace": "truthound", "name": "orders"}],
            "outputs": [
                {
                    "namespace": "truthound",
                    "name": "orders_validated",
                    "facets": {
                        "dataQualityMetrics": {
                            "_producer": "truthound-spark",
                            "_schemaURL": "https://openlineage.io/spec/facets/1-0-0/DataQualityMetricsInputDatasetFacet.json",
                            "rowCount": 42,
                        }
                    },
                }
            ],
        },
    ]


def test_fail_event_carries_error_facet_and_closes_run():
    em = _emitter()
    run = em.start_run("job")
    em.emit_fail(run, ValueError("boom"))
    fail = em.events[-1]
    assert fail["eventType"] == "FAIL"
    ef = fail["run"]["facets"]["errorMessage"]
    assert ef["message"] == "boom" and ef["programmingLanguage"] == "python"
    assert run.run_id not in em._active_runs


def test_abort_and_running_events():
    em = _emitter()
    run = em.start_run("job")
    em.emit_running(run, facets={"progress": {"pct": 50}})
    em.emit_abort(run, reason="user cancel")
    assert [e["eventType"] for e in em.events] == ["START", "RUNNING", "ABORT"]
    assert em.events[1]["run"]["facets"]["progress"] == {"pct": 50}
    assert em.events[2]["run"]["facets"]["abortInfo"]["reason"] == "user cancel"


def test_parent_run_facet():
    em = _emitter()
    parent = em.start_run("pipeline")
    child = em.start_run("pipeline:step1", parent_run_id=parent.run_id)
    ev = em.events[-1]
    assert ev["run"]["facets"]["parent"] == {
        "run": {"runId": "run-0001"},
        "job": {"namespace": "truthound", "name": "pipeline"},
    }
    assert child.run_id == "run-0002"


def test_schema_facet_and_namespace_override():
    em = _emitter(config=OpenLineageConfig(namespace="prod"))
    ds = em.build_input_dataset(
        "customer", namespace="warehouse", schema=[{"name": "id", "type": "bigint"}]
    )
    assert ds["namespace"] == "warehouse"
    assert ds["facets"]["schema"]["fields"] == [{"name": "id", "type": "bigint"}]
    assert ds["facets"]["schema"]["_schemaURL"].endswith("SchemaDatasetFacet.json")
    # lifecycle / ownership / dataSource facets render under spec keys
    f = DatasetFacets(
        data_source={"name": "s3", "uri": "s3://bucket"},
        lifecycle_state="CREATE",
        ownership={"owners": [{"name": "team-data"}]},
    ).to_dict()
    assert set(f) == {"dataSource", "lifecycleStateChange", "ownership"}


def test_emit_from_tracker_graph(tmp_path):
    tracker = LineageTracker()
    tracker.track_source("raw_orders", columns=["o_orderkey", "o_totalprice"])
    tracker.track_source("raw_customer", columns=["c_custkey"])
    tracker.track_transformation(
        ["raw_orders", "raw_customer"], "orders_enriched", row_count=7
    )
    path = str(tmp_path / "events.jsonl")
    em = emit_tracker(tracker, job_name="nightly", path=path)
    lines = [json.loads(line) for line in open(path)]
    assert [e["eventType"] for e in lines] == ["START", "COMPLETE"]
    start, comp = lines
    assert start["job"]["name"] == "nightly:orders_enriched"
    assert {i["name"] for i in start["inputs"]} == {"raw_orders", "raw_customer"}
    in_by_name = {i["name"]: i for i in start["inputs"]}
    assert in_by_name["raw_orders"]["facets"]["schema"]["fields"] == [
        {"name": "o_orderkey", "type": "string"},
        {"name": "o_totalprice", "type": "string"},
    ]
    assert comp["outputs"][0]["name"] == "orders_enriched"
    # row_count metadata rides the quality facet
    assert comp["outputs"][0]["facets"]["dataQualityMetrics"]["rowCount"] == 7


def test_file_transport_appends_jsonl(tmp_path):
    path = str(tmp_path / "ev.jsonl")
    send = file_transport(path)
    send({"a": 1})
    send({"b": 2})
    assert [json.loads(x) for x in open(path)] == [{"a": 1}, {"b": 2}]


def test_http_transport_degrades_without_requests(monkeypatch):
    """No requests in the sandbox: emit must warn, never raise."""
    import builtins

    from truthound_spark.lineage_openlineage import http_transport

    real_import = builtins.__import__

    def fake_import(name, *a, **kw):
        if name == "requests":
            raise ImportError("no requests")
        return real_import(name, *a, **kw)

    monkeypatch.setattr(builtins, "__import__", fake_import)
    send = http_transport(OpenLineageConfig())
    send({"eventType": "START"})  # must not raise


def test_checkpoint_action_emits_quality_assertions(spark):
    """OpenLineageAction: a Checkpoint run becomes START + COMPLETE/FAIL
    events with the dataQualityAssertions facet."""
    from truthound_spark.checkpoint import Checkpoint
    from truthound_spark.lineage_openlineage import OpenLineageAction

    em = _emitter()
    action = OpenLineageAction(em, dataset="warehouse.users")
    cp = Checkpoint("daily-users", validators=["null", "unique"], actions=[action])

    clean = spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string")
    cp.run(clean)
    assert [e["eventType"] for e in em.events] == ["START", "COMPLETE"]
    facet = em.events[0]["inputs"][0]["facets"]["dataQualityAssertions"]
    assert facet["assertions"] == [{"assertion": "suite", "success": True}]
    assert em.events[0]["run"]["facets"]["truthound"]["issueCount"] == 0

    em.events.clear()
    dirty = spark.createDataFrame(
        [(1, "a"), (1, None)], "id long, name string"
    )
    cp.run(dirty)
    assert [e["eventType"] for e in em.events] == ["START", "FAIL"]
    facet = em.events[0]["inputs"][0]["facets"]["dataQualityAssertions"]
    by = {(a["assertion"], a.get("column")): a["success"] for a in facet["assertions"]}
    assert by[("suite", None)] is False
    assert any(not ok for k, ok in by.items() if k[0] != "suite")
    assert "errorMessage" in em.events[1]["run"]["facets"]
