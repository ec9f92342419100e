"""CLI, datadocs, pattern/sketch profiler tests."""

import json
import os


def _write_parquet(spark, tmp_path, name="t.parquet"):
    df = spark.createDataFrame(
        [(1, "a@example.com", 10.0), (2, "bad-email", 20.0), (2, None, 999.0)],
        ["user_id", "email", "score"],
    )
    path = str(tmp_path / name)
    df.coalesce(1).write.mode("overwrite").parquet(path)
    return path


def test_cli_check_and_profile(spark, tmp_path, capsys):
    from truthound_spark.cli import main

    path = _write_parquet(spark, tmp_path)
    rc = main(["check", path, "--validators", "null,unique"])
    out = capsys.readouterr().out
    assert rc == 1 and "FAIL" in out

    html_out = str(tmp_path / "profile.html")
    rc = main(["profile", path, "--output", html_out])
    assert rc == 0 and os.path.exists(html_out)
    assert "<table>" in open(html_out).read()


def test_cli_learn_and_mask(spark, tmp_path, capsys):
    from truthound_spark.cli import main

    path = _write_parquet(spark, tmp_path)
    baseline = str(tmp_path / "baseline.json")
    rc = main(["learn", path, "--output", baseline])
    assert rc == 0
    assert json.load(open(baseline))["row_count"] == 3

    masked_out = str(tmp_path / "masked")
    rc = main(["mask", path, masked_out, "--columns", "email", "--strategy", "hash"])
    assert rc == 0
    masked = spark.read.parquet(masked_out)
    vals = [r["email"] for r in masked.collect() if r["email"]]
    assert all(len(v) == 64 for v in vals)  # sha2-256 hex


def test_pattern_profile(spark):
    from truthound_spark.profiler.table_profiler import pattern_profile

    df = spark.createDataFrame(
        [("123", "a@b.co"), ("456", "c@d.io"), ("abc", "not-email")],
        ["code", "email"],
    )
    p = pattern_profile(df)
    assert p["code"]["ratios"]["numeric"] == round(2 / 3, 6)
    assert p["email"]["dominant"] == "email"


def test_sketch_profile(spark):
    from truthound_spark.profiler.table_profiler import sketch_profile

    df = spark.createDataFrame(
        [("a",)] * 50 + [("b",)] * 5 + [(str(i),) for i in range(20)], ["v"]
    )
    s = sketch_profile(df, ["v"], support=0.3)
    assert s["v"]["approx_distinct"] >= 20
    assert "a" in s["v"]["heavy_hitters"]


def test_cli_curate_end_to_end(spark, tmp_path, capsys):
    import json

    from truthound_spark.cli import main

    src = str(tmp_path / "docs.parquet")
    rows = [
        (i, f"a perfectly ordinary document number {i} with enough distinct words to pass the gates")
        for i in range(40)
    ]
    rows += [(100, rows[0][1]), (101, rows[0][1])]  # exact dups of doc 0
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(src)
    out = str(tmp_path / "curated")
    rc = main(["curate", src, out, "--n-shards", "4", "--min-quality", "0.1"])
    assert rc == 0
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    c = payload["counts"]
    assert c["input"] == 42
    assert c["after_dedup"] == 40  # the two copies collapse onto doc 0
    assert c["written"] <= c["after_dedup"]
    back = spark.read.parquet(out)
    assert back.count() == c["written"]
    assert {"doc_id", "text", "position"} <= set(back.columns)


def test_cli_curate_with_self_dedup_and_quantile_gate(spark, tmp_path, capsys):
    import json

    from truthound_spark.cli import main

    footer = "standard footer all rights reserved by the example publishing company"
    rows = [
        (i, f"document body number {i} with plenty of distinct ordinary words here {footer}")
        for i in range(30)
    ]
    src = str(tmp_path / "docs2.parquet")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(src)
    out = str(tmp_path / "curated2")
    rc = main([
        "curate", src, out, "--n-shards", "2", "--min-quality", "0.0",
        "--self-dedup", "8", "--quantile-gate", "0.5",
    ])
    assert rc == 0
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    c = payload["counts"]
    assert c["after_self_dedup"] == c["input"] == 30   # docs survive, spans excised
    assert c["after_quantile_gate"] == 15              # top half kept
    back = spark.read.parquet(out)
    assert back.count() == c["written"] == 15
    # the shared footer span was excised from all but one owner doc
    with_footer = back.filter(back.text.contains("rights reserved")).count()
    assert with_footer <= 1


def test_cli_docs_site(spark, tmp_path, capsys):
    from truthound_spark.cli import main

    path = _write_parquet(spark, tmp_path)
    out_dir = str(tmp_path / "site")
    rc = main(["docs", path, out_dir, "--with-check"])
    out = capsys.readouterr().out
    assert rc == 0 and "index.html" in out
    assert os.path.exists(os.path.join(out_dir, "index.html"))
    assert any(f.startswith("table_") for f in os.listdir(out_dir))
    assert any(f.startswith("run_") for f in os.listdir(out_dir))


def test_cli_lineage_list_and_impact(tmp_path, capsys):
    from truthound_spark.cli import main
    from truthound_spark.lineage import LineageTracker

    t = LineageTracker()
    s = t.track_source("raw")
    t.track_transformation([s.id], "clean", "filter")
    graph = str(tmp_path / "lineage.json")
    t.save(graph)

    rc = main(["lineage", graph])
    out = capsys.readouterr().out
    assert rc == 0 and "raw" in out and "clean" in out

    rc = main(["lineage", graph, "--impact", "raw"])
    out = capsys.readouterr().out
    assert rc == 0
    assert json.loads(out)["affected"][0]["id"] == "clean"

    rc = main(["lineage", graph, "--impact", "clean", "--direction", "upstream"])
    out = capsys.readouterr().out
    assert rc == 0 and "raw" in out


def test_cli_checkpoint_runs_actions(spark, tmp_path, capsys):
    from truthound_spark.cli import main

    path = _write_parquet(spark, tmp_path)
    store = str(tmp_path / "runs")
    report = str(tmp_path / "report.html")
    rc = main(
        ["checkpoint", "nightly", path, "--store", store, "--report", report,
         "--validators", "null,unique"]
    )
    out = capsys.readouterr().out
    assert rc == 1  # seeded defects → issues found
    assert "[checkpoint nightly]" in out
    assert os.listdir(store) and os.path.exists(report)


def test_cli_stream_validates_landing_dir(spark, tmp_path, capsys):
    import json as _json

    from truthound_spark.cli import main

    landing = tmp_path / "landing"
    landing.mkdir()
    (landing / "b1.json").write_text(
        '{"id": 1, "email": "a@x.com"}\n{"id": 1, "email": null}\n'
    )
    rc = main([
        "stream", str(landing), "--schema", "id LONG, email STRING",
        "--checkpoint", str(tmp_path / "ckpt"), "--validators", "null,duplicate",
    ])
    out = capsys.readouterr().out.strip().splitlines()
    batches = [_json.loads(l) for l in out if l.startswith("{")]
    assert rc == 1
    assert len(batches) == 1 and batches[0]["rows"] == 2 and not batches[0]["success"]


def test_cli_anomaly_detects_planted_outliers(spark, tmp_path, capsys):
    """reference cli_modules/advanced/ml.py:43 `truthound ml anomaly`:
    zscore / mad / ensemble over a frame with planted extremes."""
    import json
    import random

    from truthound_spark.cli import main

    rng = random.Random(51)
    rows = [(i, rng.gauss(100.0, 5.0)) for i in range(1000)]
    rows += [(1000 + j, 1000.0) for j in range(4)]
    path = str(tmp_path / "a.parquet")
    spark.createDataFrame(rows, "id long, v double").write.parquet(path)

    rc = main(["anomaly", path, "--method", "zscore", "--columns", "v"])
    out = capsys.readouterr().out
    assert rc == 0 and "Anomalies found: 4" in out

    out_json = str(tmp_path / "res.json")
    rc = main(
        ["anomaly", path, "--method", "ensemble", "--strategy", "vote",
         "--columns", "v", "--format", "json", "--output", out_json]
    )
    capsys.readouterr()
    assert rc == 0
    res = json.loads(open(out_json).read())
    assert res["anomaly_count"] == 4 and res["total_points"] == 1004
    assert all(t["votes"] >= 2 for t in res["top"])


def test_cli_fingerprint_and_diff(spark, tmp_path, capsys):
    """th fingerprint / th diff: stable digests, CI exit codes."""
    import json

    from truthound_spark.cli import main

    p1 = str(tmp_path / "a.parquet")
    p2 = str(tmp_path / "b.parquet")
    df = spark.createDataFrame([(i, f"n{i}") for i in range(100)], "id long, s string")
    df.write.parquet(p1)
    df.filter("id <> 5").write.parquet(p2)

    out_json = str(tmp_path / "fp.json")
    rc = main(["fingerprint", p1, "--checksum", "--output", out_json])
    capsys.readouterr()
    assert rc == 0
    fp = json.loads(open(out_json).read())
    assert fp["row_count"] == 100 and fp["content_checksum"]

    rc = main(["diff", p1, p1])
    capsys.readouterr()
    assert rc == 0  # identical → exit 0

    rc = main(["diff", p1, p2])
    out = json.loads(capsys.readouterr().out)
    assert rc == 1 and "row_count_changed" in out["categories"]


def test_cli_concept_drift(spark, tmp_path, capsys):
    """th concept-drift: relationship flip -> exit 1; like windows -> 0."""
    import json
    import random

    from truthound_spark.cli import main

    rng = random.Random(61)

    def snap(path, slope):
        rows = [(x, slope * x + rng.gauss(0, 0.2))
                for x in (rng.gauss(0, 1) for _ in range(800))]
        spark.createDataFrame(rows, "x double, y double").write.parquet(path)

    p_base, p_same, p_flip = (str(tmp_path / n) for n in ("b.parquet", "s.parquet", "f.parquet"))
    snap(p_base, 1.0)
    snap(p_same, 1.0)
    snap(p_flip, -1.0)

    rc = main(["concept-drift", p_base, p_same, "--target", "y", "--threshold", "0.2"])
    assert rc == 0 and "ok" in capsys.readouterr().out

    rc = main(["concept-drift", p_base, p_flip, "--target", "y", "--format", "json"])
    out = json.loads(capsys.readouterr().out)
    assert rc == 1 and out["is_drifted"] and out["drift_score"] == 1.0


def test_cli_sample_check(spark, tmp_path, capsys):
    """th sample-check: sampled pre-check, CI-aware exit codes."""
    from truthound_spark.cli import main

    p = str(tmp_path / "sc.parquet")
    rows = [(i, None if i % 4 == 0 else f"v{i}") for i in range(2000)]
    spark.createDataFrame(rows, "id long, s string").write.parquet(p)

    # ~25% null rate: ci_low clears --fail-above 0.05 -> exit 1
    rc = main(
        ["sample-check", p, "--validators", "null", "--key-col", "id",
         "--modulus", "5", "--residue", "2", "--fail-above", "0.05"]
    )
    out = capsys.readouterr().out
    assert rc == 1
    assert "violates" in out

    # generous bound: clean verdicts, exit 0
    rc = main(
        ["sample-check", p, "--validators", "null", "--key-col", "id",
         "--modulus", "5", "--residue", "2", "--fail-above", "0.9"]
    )
    capsys.readouterr()
    assert rc == 0

    # no validators -> usage error
    rc = main(["sample-check", p])
    assert rc == 2
