"""End-to-end pipeline paths (reference test strategy:
tests/e2e/test_core_paths.py — six core paths, module docstring :1-13)."""

import json

from truthound_spark import api


def _mixed_df(spark):
    rows = []
    for i in range(200):
        rows.append(
            (
                i,
                None if i == 7 else f"user{i}@example.com",
                999.0 if i == 13 else float(20 + i % 40),
                "active" if i % 2 else "inactive",
            )
        )
    rows.append((42, "dup@example.com", 30.0, "active"))  # duplicate id
    return spark.createDataFrame(rows, ["user_id", "email", "age", "status"])


def test_path_profile_save_load(spark, tmp_path):
    from truthound_spark.profiler.table_profiler import profile

    p = profile(_mixed_df(spark))
    path = tmp_path / "profile.json"
    path.write_text(p.to_json())
    loaded = json.loads(path.read_text())
    assert loaded["row_count"] == 201
    assert loaded["columns"]["age"]["max"] == 999.0


def test_path_profile_to_suite(spark):
    from truthound_spark.profiler.table_profiler import profile, suggest_suite

    df = _mixed_df(spark)
    suite = suggest_suite(profile(df))
    assert suite
    result = api.check(df, validators=suite)
    # the profiled fences were learned on the dirty data → no range issues,
    # but the duplicate id still trips the unique check if suggested
    assert result.checks_run >= len(suite)


def test_path_schema_learn_validate_report(spark, tmp_path):
    from truthound_spark.reporters import save_report
    from truthound_spark.schema import learn

    clean = _mixed_df(spark).filter("age < 500 AND user_id != 42")
    baseline = learn(clean.dropDuplicates(["user_id"]))
    result = api.check(_mixed_df(spark), baseline=baseline)
    assert not result.success
    assert any(i.issue_type == "out_of_range" for i in result.issues)
    out = tmp_path / "report.md"
    save_report(result, str(out))
    assert out.read_text().startswith("# Validation report")


def test_path_quick_suite(spark):
    result = api.check(_mixed_df(spark))  # zero-config auto-suite
    assert result.checks_run > 0
    # null email and duplicate user_id are both auto-caught
    issue_types = {i.issue_type for i in result.issues}
    assert "null_values" in issue_types
    assert "duplicate_values" in issue_types


def test_path_pii_scan_mask(spark):
    from truthound_spark.maskers import mask
    from truthound_spark.scanners import scan

    df = _mixed_df(spark)
    report = scan(df)
    assert any(f.column == "email" and f.pii_type == "email" for f in report.findings)
    masked = mask(df, columns=["email"], strategy="redact")
    vals = {r["email"] for r in masked.select("email").distinct().collect()}
    assert vals <= {"***", None}


def test_path_full_pipeline(spark, tmp_path):
    """learn → check → persist run → render docs — the full lifecycle."""
    from truthound_spark.context import Context
    from truthound_spark.reporters import render

    ctx = Context(str(tmp_path / ".truthound"))
    df = _mixed_df(spark)
    baseline = ctx.resolve_baseline(df, learn_if_missing=True)
    result = api.check(df, baseline=baseline)
    run_id = ctx.persist_run(result)
    assert run_id in ctx.run_store.list_runs()
    html = render(result, "html")
    assert "Validation" in html
    assert ctx.metric_history()[-1]["checks_run"] == result.checks_run
