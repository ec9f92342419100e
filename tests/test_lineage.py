"""Lineage tracker + impact analysis (truthound_spark/lineage.py;
reference lineage/tracker.py, lineage/impact_analysis.py)."""

from __future__ import annotations

import pytest

from truthound_spark.lineage import (
    ImpactAnalyzer,
    LineageEdge,
    LineageError,
    LineageNode,
    LineageTracker,
    NodeNotFoundError,
    get_tracker,
    set_tracker,
)


@pytest.fixture()
def tracker():
    t = LineageTracker()
    t.track_source("raw_events", node_type="file", columns=["ts", "user_id", "value"])
    t.track_transformation(["raw_events"], "events_clean", operation="filter")
    t.track_transformation(["events_clean"], "events_daily", operation="aggregate")
    t.track_output("events_daily", "daily_report")
    return t


def test_graph_traversal(tracker):
    up = [n.id for n in tracker.graph.get_upstream("daily_report")]
    assert set(up) == {"events_daily", "events_clean", "raw_events"}
    down = [n.id for n in tracker.graph.get_downstream("raw_events")]
    assert set(down) == {"events_clean", "events_daily", "daily_report"}
    # depth-limited
    assert [n.id for n in tracker.graph.get_downstream("raw_events", depth=1)] == [
        "events_clean"
    ]


def test_get_path_and_lineage(tracker):
    path = tracker.get_path("raw_events", "daily_report")
    assert [n.id for n in path] == [
        "raw_events",
        "events_clean",
        "events_daily",
        "daily_report",
    ]
    assert tracker.get_path("daily_report", "raw_events") is None
    lin = tracker.get_lineage("events_clean")
    assert {n["id"] for n in lin["upstream"]} == {"raw_events"}
    assert {n["id"] for n in lin["downstream"]} == {"events_daily", "daily_report"}


def test_cycle_rejected(tracker):
    with pytest.raises(LineageError):
        tracker.add_dependency("daily_report", "raw_events")
    with pytest.raises(NodeNotFoundError):
        tracker.add_dependency("nope", "raw_events")


def test_validation_tracking_and_column_impact(tracker):
    tracker.track_validation(
        "events_clean",
        run_id="check-1",
        validators=["null", "range"],
        columns=["value"],
        success=False,
        issue_count=2,
    )
    tracker.track_validation(
        "events_clean",
        run_id="check-2",
        validators=["unique"],
        columns=["user_id"],
        success=True,
    )
    analyzer = ImpactAnalyzer(tracker)
    res = analyzer.impact_of_column("events_clean", "value")
    ids = [a.node.id for a in res.affected]
    assert "check-1" in ids and "check-2" not in ids
    res2 = analyzer.impact_of_column("events_clean", "user_id")
    assert [a.node.id for a in res2.affected] == ["check-2"]


def test_impact_levels_and_what_if_delete(tracker):
    res = ImpactAnalyzer(tracker).analyze_impact("raw_events")
    by_id = {a.node.id: a for a in res.affected}
    assert by_id["daily_report"].level in ("high", "medium")  # 3 hops → decayed
    assert by_id["events_clean"].level == "medium"
    assert "affected" in res.summary() or res.summary()

    wid = ImpactAnalyzer(tracker).what_if_delete("events_daily")
    assert wid["recommendation"] in ("review_required", "caution", "do_not_delete")
    leaf = ImpactAnalyzer(tracker).what_if_delete("daily_report")
    assert leaf["recommendation"] == "safe_to_delete"


def test_save_load_roundtrip(tracker, tmp_path):
    p = str(tmp_path / "lineage.json")
    tracker.save(p)
    t2 = LineageTracker()
    t2.load(p)
    assert set(t2.graph.nodes) == set(tracker.graph.nodes)
    assert len(t2.graph.edges) == len(tracker.graph.edges)
    # traversal still works after load
    assert [n.id for n in t2.graph.get_downstream("events_daily")] == ["daily_report"]


def test_current_tracker_helpers():
    set_tracker(None)
    t = get_tracker()
    assert get_tracker() is t
    set_tracker(None)


def test_track_dataframe_input_files(spark, sf_dir, tmp_path):
    # write a private copy: a .cache()d identical scan elsewhere in the
    # session would make Spark substitute the InMemoryRelation, whose
    # inputFiles() is empty (documented caveat on track_dataframe)
    src = str(tmp_path / "cust_lineage.parquet")
    spark.read.parquet(f"{sf_dir}/customer.parquet").write.parquet(src)
    t = LineageTracker()
    df = spark.read.parquet(src)
    node = t.track_dataframe("customer", df)
    assert node.columns == df.columns
    files = [n for n in t.graph.get_upstream("customer") if n.node_type == "file"]
    assert len(files) >= 1
    assert any("cust_lineage.parquet" in n.id for n in files)


def test_check_lineage_integration(spark, sf_dir):
    from truthound_spark.api import check
    from truthound_spark.validators.completeness import NullValidator
    from truthound_spark.validators.distribution import RangeValidator

    t = LineageTracker()
    df = spark.read.parquet(f"{sf_dir}/customer.parquet")
    res = check(
        df,
        validators=[NullValidator(columns=["c_custkey"]), RangeValidator("c_acctbal", -20000, 20000)],
        lineage=t,
        asset="customer",
    )
    runs = t.validations_for("customer")
    assert len(runs) == 1
    v = runs[0]
    assert v.metadata["success"] == res.success
    assert set(v.columns) == {"c_custkey", "c_acctbal"}
    impact = ImpactAnalyzer(t).impact_of_column("customer", "c_acctbal")
    assert impact.affected and impact.affected[0].node.id == v.id
