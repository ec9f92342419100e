"""Dashboard-lite render contracts (reference datadocs/dashboard/* as a
static page; VERDICT r9 #7)."""

from __future__ import annotations

import json

import pytest

from truthound_spark.datadocs_dashboard import (
    RunRecord,
    _sparkline_svg,
    load_runs,
    render_dashboard,
    run_record_from_check,
    save_dashboard,
)
from truthound_spark.datadocs_versioning import DocsVersionStore


def _runs():
    return [
        RunRecord(
            run_id="r1",
            ts="2026-08-01T00:00:00",
            row_count=1000,
            success=True,
            issue_count=0,
            gates={"release": "passed", "privacy": "passed"},
            drift_scores={"value_psi": 0.01, "amount_ks": 0.02},
        ),
        RunRecord(
            run_id="r2",
            ts="2026-08-02T00:00:00",
            row_count=1100,
            success=True,
            issue_count=2,
            gates={"release": "warning", "privacy": "passed"},
            drift_scores={"value_psi": 0.03, "amount_ks": 0.04},
        ),
        RunRecord(
            run_id="r3",
            ts="2026-08-03T00:00:00",
            row_count=1250,
            success=False,
            issue_count=7,
            gates={"release": "failed", "privacy": "passed"},
            drift_scores={"value_psi": 0.22, "amount_ks": 0.01},
        ),
    ]


class TestRender:
    def test_core_content_present(self):
        html = render_dashboard(_runs(), title="My dash")
        assert "<title>My dash</title>" in html
        # tiles
        for tile in ("runs", "pass rate", "failing gates"):
            assert tile in html
        assert "67%" in html  # 2/3 pass rate
        # runs × gates matrix: every run id, every gate column
        for rid in ("r1", "r2", "r3"):
            assert rid in html
        for gate in ("release", "privacy"):
            assert f"<th>{gate}</th>" in html
        # status badges map to css classes
        assert "badge warn" in html and "badge fail" in html
        # drift sparklines: one svg polyline per metric + drifted badge
        assert html.count("<polyline") == 2
        assert ">drifted<" in html  # value_psi latest 0.22 >= 0.05
        assert "value_psi" in html and "amount_ks" in html

    def test_latest_run_first(self):
        html = render_dashboard(_runs())
        assert html.index(">r3<") < html.index(">r2<") < html.index(">r1<")

    def test_empty_history(self):
        html = render_dashboard([])
        assert "no runs recorded" in html
        assert "no drift metrics recorded" in html

    def test_escapes_hostile_strings(self):
        runs = [
            RunRecord(
                run_id="<script>alert(1)</script>",
                gates={"<b>g</b>": "failed"},
                drift_scores={},
            )
        ]
        html = render_dashboard(runs, title="<img src=x>")
        assert "<script>" not in html
        assert "<img src=x>" not in html
        assert "&lt;script&gt;" in html

    def test_version_table(self, tmp_path):
        store = DocsVersionStore(str(tmp_path / "docs"))
        store.save("events", "<html>v1</html>", created_at="2026-08-01")
        store.save("events", "<html>v2</html>", created_at="2026-08-02")
        html = render_dashboard(_runs(), store=store, report_id="events")
        assert "Docs versions" in html
        assert "href='v1.html'" in html and "href='v2.html'" in html
        assert "v1_v2_diff.html" in html  # diff link between consecutive
        # unknown report renders gracefully
        assert "no stored versions" in render_dashboard(
            [], store=store, report_id="nope"
        )


class TestSparkline:
    def test_shapes(self):
        svg = _sparkline_svg([0.1, 0.2, 0.05], threshold=0.15)
        assert "<polyline" in svg and "stroke-dasharray" in svg
        assert "<circle" in svg  # end-point dot
        # single point → dot only, no polyline
        one = _sparkline_svg([0.3])
        assert "<circle" in one and "<polyline" not in one
        assert _sparkline_svg([]) == ""

    def test_flat_series_no_div_by_zero(self):
        svg = _sparkline_svg([0.5, 0.5, 0.5])
        assert "<polyline" in svg


class TestIO:
    def test_save_into_version_store_dir(self, tmp_path):
        store = DocsVersionStore(str(tmp_path / "docs"))
        store.save("events", "<html>v1</html>")
        path = save_dashboard(
            "dashboard.html", _runs(), store=store, report_id="events"
        )
        assert path.startswith(store.report_dir("events"))
        assert "<polyline" in open(path).read()

    def test_load_runs_round_trip(self, tmp_path):
        p = tmp_path / "runs.json"
        p.write_text(json.dumps([r.to_dict() for r in _runs()]))
        loaded = load_runs(str(p))
        assert [r.run_id for r in loaded] == ["r1", "r2", "r3"]
        assert loaded[2].gates["release"] == "failed"
        p.write_text("{}")
        with pytest.raises(ValueError):
            load_runs(str(p))

    def test_cli_dashboard(self, tmp_path, capsys):
        from truthound_spark.cli import main

        runs_path = tmp_path / "runs.json"
        runs_path.write_text(json.dumps([r.to_dict() for r in _runs()]))
        out = tmp_path / "dash.html"
        rc = main(["dashboard", str(runs_path), "--out", str(out)])
        assert rc == 0
        html = out.read_text()
        assert "Runs × gates" in html and "<polyline" in html


def test_run_record_from_check_adapter():
    class FakeIssue:
        pass

    class FakeResult:
        row_count = 42
        success = False
        issues = [FakeIssue(), FakeIssue()]

    class FakeGate:
        gate_id = "release"
        status = "failed"

    rec = run_record_from_check(
        FakeResult(),
        "r9",
        ts="2026-08-15",
        gate_results=[FakeGate()],
        drift_scores={"psi": 0.3},
    )
    assert rec.row_count == 42 and not rec.success and rec.issue_count == 2
    assert rec.gates == {"release": "failed"}
    assert rec.drift_scores == {"psi": 0.3}
