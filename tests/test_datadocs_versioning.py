"""Versioned data-docs + diff pages (datadocs_versioning.py; reference
datadocs/versioning/{version,storage,diff}.py + dashboard diff pages):
store round-trip, checksum dedup, unified diff, and the render
contracts for both the docs diff page and the dataset-diff page."""

from __future__ import annotations

import pytest

from truthound_spark.datadocs_versioning import (
    DocsVersionStore,
    diff_versions,
    render_dataset_diff_page,
    render_diff_page,
)


@pytest.fixture()
def store(tmp_path):
    return DocsVersionStore(str(tmp_path / "docs"))


def test_store_increments_and_roundtrips(store):
    v1 = store.save("profile", "<html>one</html>", created_at="2026-01-01")
    v2 = store.save("profile", "<html>two</html>", created_at="2026-01-02")
    assert (v1.version, v2.version) == (1, 2)
    assert store.load("profile", 1) == "<html>one</html>"
    assert store.load("profile", 2) == "<html>two</html>"
    assert store.latest("profile").version == 2
    assert [v.version for v in store.list_versions("profile")] == [1, 2]
    with pytest.raises(KeyError):
        store.load("profile", 9)


def test_identical_content_is_not_reversioned(store):
    v1 = store.save("r", "same")
    v2 = store.save("r", "same")
    assert v2.version == v1.version == 1
    assert len(store.list_versions("r")) == 1
    # a change after the no-op still increments
    assert store.save("r", "different").version == 2


def test_diff_versions_counts_and_page(store):
    store.save("r", "a\nb\nc\n")
    store.save("r", "a\nB\nc\nd\n")
    d = diff_versions(store, "r", 1, 2)
    assert d.has_changes and d.added == 2 and d.removed == 1
    page = render_diff_page(d)
    assert "<div class='add'>+B</div>" in page
    assert "<div class='del'>-b</div>" in page
    assert "v1.html" in page and "v2.html" in page  # links both versions

    same = diff_versions(store, "r", 1, 1)
    assert not same.has_changes
    assert "no changes" in render_diff_page(same)


def test_dataset_diff_page_renders_fingerprint_diff(spark):
    """VERDICT r8 #8: the fingerprint/summary diff rendered as a docs
    page linking the two run artifacts."""
    from truthound_spark.fingerprint import diff_datasets

    a = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    d = diff_datasets(
        a,
        a.limit(10).drop("n_regionkey"),
        source_snapshot_id="run-1",
        target_snapshot_id="run-2",
    )
    page = render_dataset_diff_page(
        d, source_href="runs/run-1.html", target_href="runs/run-2.html"
    )
    assert "run-1" in page and "run-2" in page
    assert "runs/run-1.html" in page and "runs/run-2.html" in page
    assert "row_count_changed" in page and "schema_removed" in page
    assert "<h2>Summary</h2>" in page


def test_dataset_diff_page_accepts_diff_bundle(spark):
    from truthound_spark.artifacts import DiffBundle
    from truthound_spark.fingerprint import diff_datasets

    a = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    d = diff_datasets(a, a, source_snapshot_id="x", target_snapshot_id="y")
    page = render_dataset_diff_page(DiffBundle.from_diff(d))
    assert "no changes" in page and "x" in page and "y" in page


def test_versioned_profile_docs_end_to_end(spark, store):
    """Real flow: profile → render → version → re-profile (changed) →
    diff page."""
    from truthound_spark.datadocs import profile_docs
    from truthound_spark.profiler.table_profiler import profile as profile_table

    df = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    p1 = profile_table(df)
    store.save("nation", profile_docs(p1, title="nation"))
    p2 = profile_table(df.limit(10))
    v2 = store.save("nation", profile_docs(p2, title="nation"))
    assert v2.version == 2
    d = diff_versions(store, "nation", 1, 2)
    assert d.has_changes
    assert "25 rows" in store.load("nation", 1)


def test_cli_docs_version_store(spark, tmp_path, capsys):
    from truthound_spark.cli import main

    site = str(tmp_path / "site")
    vs = str(tmp_path / "vs")
    rc = main(
        ["docs", "/root/testdata/sf0.001/nation.parquet", site,
         "--title", "nation", "--version-store", vs]
    )
    assert rc == 0
    out1 = capsys.readouterr().out
    assert "versioned nation v1" in out1
    # second identical run: no new version, no diff page
    rc = main(
        ["docs", "/root/testdata/sf0.001/nation.parquet", site,
         "--title", "nation", "--version-store", vs]
    )
    assert rc == 0
    assert "versioned nation v1" in capsys.readouterr().out
    # changed input: v2 + a diff page linking both versions
    rc = main(
        ["docs", "/root/testdata/sf0.001/region.parquet", site,
         "--title", "nation", "--version-store", vs]
    )
    assert rc == 0
    out3 = capsys.readouterr().out
    assert "versioned nation v2" in out3 and "v1_v2_diff.html" in out3
    import os

    # the diff page lives in the REPORT's directory so its relative
    # v<N>.html links resolve
    report_dir = os.path.join(vs, "nation")
    assert os.path.exists(os.path.join(report_dir, "v1_v2_diff.html"))
    assert os.path.exists(os.path.join(report_dir, "v1.html"))
    assert os.path.exists(os.path.join(report_dir, "v2.html"))


def test_sanitized_report_ids_do_not_collide(store):
    a = store.save("a/b", "content-one")
    b = store.save("a_b", "content-two")
    assert a.version == 1 and b.version == 1
    assert store.load("a/b", 1) == "content-one"
    assert store.load("a_b", 1) == "content-two"
    assert [v.report_id for v in store.list_versions("a/b")] == ["a/b"]
    assert store.report_dir("a/b") != store.report_dir("a_b")
