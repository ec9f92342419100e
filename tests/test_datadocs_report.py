"""Section-report pipeline, exporters, theming, and profile diff
(reference: datadocs/base.py, sections.py, exporters/*, versioning/diff.py)."""

from __future__ import annotations

import copy
import json
import os

import pytest

from truthound_spark.datadocs import build_site
from truthound_spark.datadocs_report import (
    DARK_THEME,
    DEFAULT_THEME,
    ProfileChange,
    build_report,
    diff_profiles,
    recommendations,
    render_diff_html,
    render_report_html,
    render_report_json,
    render_report_markdown,
)
from truthound_spark.profiler.table_profiler import profile


@pytest.fixture(scope="module")
def prof(spark):
    df = spark.createDataFrame(
        [
            (1, "a@x.com", 10.0, "active"),
            (2, None, 20.0, "active"),
            (3, "c@x.com", 30.0, "inactive"),
            (4, "d@x.com", 40.0, "active"),
        ],
        "id int, email string, score double, status string",
    )
    return profile(df, with_correlations=True)


def test_report_sections_and_html(prof):
    spec = build_report(prof, title="t1")
    ids = [s.section_id for s in spec.sections]
    assert ids == [
        "overview", "columns", "quality", "distribution",
        "correlations", "recommendations", "alerts",
    ]
    html = render_report_html(spec)
    assert "<svg" in html  # inline chart, no JS dependency
    assert "email" in html and "25.00%" in html  # 1/4 nulls
    assert "score" in html


def test_section_selection_and_unknown(prof):
    spec = build_report(prof, sections=["overview", "quality"])
    assert len(spec.sections) == 2
    with pytest.raises(ValueError, match="unknown sections"):
        build_report(prof, sections=["nope"])


def test_exporters_round_trip(prof):
    spec = build_report(prof)
    md = render_report_markdown(spec)
    assert md.startswith("# Data profile") and "## Quality scores" in md
    data = json.loads(render_report_json(spec))
    assert data["metadata"]["row_count"] == 4
    assert {"overview", "columns", "quality"} <= set(data["sections"])


def test_theming_css_vars(prof):
    spec = build_report(prof, sections=["overview"])
    light = render_report_html(spec, DEFAULT_THEME)
    dark = render_report_html(spec, DARK_THEME)
    assert "--bg:#ffffff" in light and "--bg:#0f172a" in dark


def test_recommendations_map_to_registered_validators(prof):
    from truthound_spark.core.registry import get_validator

    recs = recommendations(prof)
    assert recs, "profile with a key candidate + enum column must recommend"
    for r in recs:
        get_validator(r["validator"])  # raises if not a real validator
    by_col = {(r["column"], r["validator"]) for r in recs}
    assert ("id", "unique") in by_col
    assert ("status", "in_set") in by_col


def test_diff_profiles_detects_structural_and_stat_changes(prof):
    new = copy.deepcopy(prof)
    new.row_count += 10
    new.columns["extra"] = copy.deepcopy(new.columns["id"])
    new.columns["extra"].name = "extra"
    del new.columns["status"]
    new.columns["score"].null_ratio += 0.5
    kinds = {(c.kind, c.column) for c in diff_profiles(prof, new)}
    assert ("row_count", None) in kinds
    assert ("column_added", "extra") in kinds
    assert ("column_removed", "status") in kinds
    assert ("stat_drift", "score") in kinds
    assert diff_profiles(prof, prof) == []


def test_diff_html_renders_changes():
    html = render_diff_html(
        [ProfileChange("column_added", "x", None, "int")], title="d"
    )
    assert "column_added" in html and "no changes" not in html
    assert "no changes" in render_diff_html([])


def test_build_site_with_reports_and_diff(prof, tmp_path):
    prev = copy.deepcopy(prof)
    prev.columns["score"].null_ratio += 0.3
    idx = build_site(
        str(tmp_path),
        profiles={"t": prof},
        previous_profiles={"t": prev},
    )
    assert os.path.exists(idx)
    page = open(tmp_path / "table_t.html").read()
    assert "Suggested checks" in page and "<svg" in page
    diff = open(tmp_path / "diff_t.html").read()
    assert "stat_drift" in diff
    assert "diff_t.html" in open(idx).read()


def test_corpus_section_in_report(spark):
    from truthound_spark.datadocs_report import (
        build_report,
        corpus_stats,
        render_report_html,
        render_report_markdown,
    )
    from truthound_spark.profiler.table_profiler import profile as profile_table

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again"),
            (2, "the quick brown fox jumps over the lazy dog again and again"),
            (3, "der hund und die katze sind von den besten ein beispiel"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    stats = corpus_stats(docs)
    assert stats["n_docs"] == 4
    assert stats["dup_excess"] == 1
    assert stats["empty_docs"] == 1
    assert stats["languages"].get("en") == 2
    profile = profile_table(docs)
    spec = build_report(profile, corpus=stats, title="corpus docs")
    html = render_report_html(spec)
    assert "Corpus health" in html and "exact-dup rate" in html
    md = render_report_markdown(spec)
    assert "Corpus health" in md


def test_corpus_section_surfaces_boilerplate(spark):
    from truthound_spark.datadocs_report import corpus_section, corpus_stats

    footer = "all rights reserved by the example publishing company today"
    df = spark.createDataFrame(
        [(i, f"unique body text number {i} with several distinct filler words {footer}")
         for i in range(12)],
        ["doc_id", "text"],
    )
    stats = corpus_stats(df)
    assert stats["boilerplate"], "shared footer must surface"
    assert all(e["n_docs"] == 12 for e in stats["boilerplate"][:1])
    sec = corpus_section(stats)
    assert "boilerplate" in sec.html.lower()


# --- round 7: evolution + learned-thresholds sections ------------------------


def test_evolution_and_thresholds_sections(spark):
    import random

    from truthound_spark.datadocs_report import (
        build_report,
        render_report_html,
        render_report_json,
    )
    from truthound_spark.ml import HistoryThresholdLearner
    from truthound_spark.profiler.evolution import compare_profiles
    from truthound_spark.profiler.table_profiler import profile

    rng = random.Random(2)
    old_df = spark.createDataFrame(
        [(i, float(rng.gauss(10, 1))) for i in range(500)], "id long, v double"
    )
    new_df = spark.createDataFrame(
        [(i, float(rng.gauss(25, 1))) for i in range(500)], "id long, v double"
    )
    p_old = profile(old_df, with_duplicates=False)
    p_new = profile(new_df, with_duplicates=False)
    cmp = compare_profiles(p_old, p_new)
    tt = HistoryThresholdLearner().learn([p_old, p_old])

    spec = build_report(
        p_new,
        title="t",
        comparison=cmp,
        thresholds=tt,
        sections=["overview", "evolution", "thresholds"],
    )
    html = render_report_html(spec)
    assert "Profile evolution" in html and "Learned thresholds" in html
    assert "mean" in html and "critical" in html  # 15σ shift flagged
    assert "row count gate" in html
    # machine-readable export carries the same payloads
    import json as _json

    j = _json.loads(render_report_json(spec))
    assert set(j["sections"]) == {"overview", "evolution", "thresholds"}
    assert j["sections"]["evolution"]["drifts"]  # the 15σ mean drift


def test_evolution_section_empty_comparison(spark):
    from truthound_spark.datadocs_report import evolution_section
    from truthound_spark.profiler.evolution import ProfileComparison

    s = evolution_section(ProfileComparison())
    assert "no changes" in s.html
