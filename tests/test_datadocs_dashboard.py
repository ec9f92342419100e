"""Dashboard-lite render contracts (reference datadocs/dashboard/* as a
static page; VERDICT r9 #7)."""

from __future__ import annotations

import json
import os

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


class TestRealWorkspaceE2E:
    """VERDICT r10 #6: dashboard rendered from an ACTUAL multi-run
    workspace produced by repeated check() + gate + fitted-monitor runs
    — not synthetic RunRecords — so a field-name drift between the run
    artifacts (check result / gate result / detector output / stored
    run JSON) and the dashboard reader fails HERE."""

    def test_dashboard_from_real_multi_run_workspace(self, spark, tmp_path):
        import json

        from pyspark.sql import functions as F

        from truthound_spark import api
        from truthound_spark.datadocs import profile_docs
        from truthound_spark.datadocs_dashboard import (
            load_runs,
            run_record_from_check,
            save_dashboard,
        )
        from truthound_spark.datadocs_versioning import (
            DocsVersionStore,
            diff_versions,
            render_diff_page,
        )
        from truthound_spark.ml.feature_drift import FeatureDriftDetector
        from truthound_spark.profiler import profile
        from truthound_spark.quality_gates import evaluate_quality_gate
        from truthound_spark.validators.distribution import RangeValidator
        from truthound_spark.validators.uniqueness import UniqueValidator

        workspace = tmp_path / ".truthound"
        workspace.mkdir()
        store = DocsVersionStore(str(workspace / "docs"))
        runs_path = workspace / "runs.json"

        def batch(shift: float, dup: bool):
            df = spark.range(200).select(
                (F.col("id") + (1 if dup else 0) * (F.col("id") % 2)).alias("uid"),
                (F.col("id") % 50 + F.lit(shift)).cast("double").alias("v"),
            )
            return df

        baseline = batch(0.0, False)
        detector = FeatureDriftDetector(threshold=0.05).fit(
            baseline.select("v")
        )

        history = []
        for i, (shift, dup) in enumerate([(0.0, False), (0.5, False), (40.0, True)]):
            df = batch(shift, dup)
            result = api.check(
                df,
                validators=[
                    UniqueValidator(columns=["uid"]),
                    RangeValidator("v", 0.0, 60.0),
                ],
            )
            gate = evaluate_quality_gate(result, gate_id="release")
            drift = detector.detect(df.select("v"))
            rec = run_record_from_check(
                result,
                run_id=f"run-{i}",
                ts=f"2026-08-{10 + i}",
                gate_results=[gate],
                drift_scores={"v": float(drift.drift_score)},
            )
            history.append(rec.to_dict())
            # version-store page per run (what cmd_docs writes in CI)
            ver = store.save(
                "events", profile_docs(profile(df), title=f"run {i}"), "html"
            )
            if ver.version > 1:
                d = diff_versions(store, "events", ver.version - 1, ver.version)
                with open(
                    os.path.join(
                        store.report_dir("events"),
                        f"v{ver.version - 1}_v{ver.version}_diff.html",
                    ),
                    "w",
                ) as fh:
                    fh.write(render_diff_page(d))
        runs_path.write_text(json.dumps(history))

        # reload THROUGH the dashboard reader (catches to_dict/from_dict drift)
        runs = load_runs(str(runs_path))
        assert [r.run_id for r in runs] == ["run-0", "run-1", "run-2"]
        assert runs[0].success and not runs[2].success
        assert runs[2].issue_count >= 2  # planted dup + out-of-range
        assert runs[2].drift_scores["v"] > runs[0].drift_scores["v"]
        assert runs[2].gates["release"] == "blocked"
        assert all(r.row_count == 200 for r in runs)

        out = save_dashboard(
            "dashboard.html", runs, store=store, report_id="events"
        )
        html = open(out).read()
        # page landed inside the report's version dir so links resolve
        assert os.path.dirname(out) == store.report_dir("events")
        for link in ("v1.html", "v2.html", "v1_v2_diff.html"):
            assert link in html, link
            assert os.path.exists(os.path.join(store.report_dir("events"), link))
        assert "run-2" in html and "blocked" in html
        assert "<svg" in html  # drift sparkline rendered from real scores
