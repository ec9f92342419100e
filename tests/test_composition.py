"""pipeline/report.py corpus_composition / concentration_report: the
mixture-audit operators. The oracle slot certifies the full-table path;
these tests pin the scale path (top_n head + __other__ fold) against the
full computation and the determinism/shape contracts."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from truthound_spark.pipeline.report import concentration_report, corpus_composition


def _corpus(spark):
    rows = []
    sizes = {"a": 50, "b": 30, "c": 12, "d": 5, "e": 3}
    i = 0
    for src, n in sizes.items():
        for _ in range(n):
            rows.append((i, src, 100 + i % 7))
            i += 1
    rows.append((i, None, 10))  # null source → __null__
    return spark.createDataFrame(rows, "doc_id long, source string, n_chars long")


def test_composition_shares_sum_and_order(spark):
    out = corpus_composition(_corpus(spark), "source", weight_col="n_chars").collect()
    assert [r["rank"] for r in out] == list(range(1, len(out) + 1))
    assert sum(r["doc_share"] for r in out) == pytest_approx(1.0)
    assert sum(r["weight_share"] for r in out) == pytest_approx(1.0)
    assert out[-1]["cum_share"] == pytest_approx(1.0)
    assert out[0]["group"] == "a"  # heaviest first
    assert any(r["group"] == "__null__" for r in out)


def pytest_approx(x):
    import pytest

    return pytest.approx(x, abs=2e-5)


def test_composition_top_n_other_fold(spark):
    """top_n head + __other__ must reconstruct the full-table totals."""
    df = _corpus(spark)
    full = corpus_composition(df, "source", weight_col="n_chars").collect()
    top = corpus_composition(df, "source", weight_col="n_chars", top_n=2).collect()
    assert [r["group"] for r in top[:2]] == [r["group"] for r in full[:2]]
    other = [r for r in top if r["group"] == "__other__"]
    assert len(other) == 1
    o = other[0]
    assert o["rank"] == 3
    assert o["n_docs"] == sum(r["n_docs"] for r in full[2:])
    assert o["weight"] == sum(r["weight"] for r in full[2:])
    assert o["cum_share"] == 1.0


def test_composition_top_n_no_fold_when_head_covers_all(spark):
    df = _corpus(spark)
    out = corpus_composition(df, "source", weight_col="n_chars", top_n=100).collect()
    assert not any(r["group"] == "__other__" for r in out)


def test_composition_doc_count_mode(spark):
    out = corpus_composition(_corpus(spark), "source").collect()
    for r in out:
        assert r["weight"] == r["n_docs"]


def test_concentration_matches_hand_math(spark):
    df = _corpus(spark)
    comp = corpus_composition(df, "source", weight_col="n_chars").collect()
    shares = [r["weight"] for r in comp]
    tot = sum(shares)
    shares = [w / tot for w in shares]
    rep = concentration_report(df, "source", weight_col="n_chars").collect()[0]
    assert rep["n_groups"] == len(comp)
    assert rep["total_weight"] == tot
    assert rep["hhi"] == pytest_approx(sum(s * s for s in shares))
    assert rep["entropy_bits"] == pytest_approx(
        -sum(s * math.log2(s) for s in shares if s > 0)
    )
    assert rep["top1_share"] == pytest_approx(max(shares))
    assert rep["effective_groups"] == pytest_approx(1.0 / sum(s * s for s in shares))


def test_concentration_single_source_extremes(spark):
    df = spark.createDataFrame(
        [(i, "only", 10) for i in range(20)], "doc_id long, source string, n_chars long"
    )
    r = concentration_report(df, "source", weight_col="n_chars").collect()[0]
    assert r["hhi"] == 1.0
    assert r["effective_groups"] == 1.0
    assert r["entropy_bits"] == 0.0
    assert r["top1_share"] == 1.0


def test_composition_partitioning_invariant(spark):
    df = _corpus(spark)
    a = corpus_composition(df.repartition(1), "source", weight_col="n_chars").collect()
    b = corpus_composition(df.repartition(9), "source", weight_col="n_chars").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_composition_top_n_plan_has_no_global_window_over_groups(spark):
    """The top_n path must rank via TakeOrdered+limit, with the window
    only over the ≤ top_n head rows (never a full-group-table sort)."""
    df = _corpus(spark)
    plan = (
        corpus_composition(df, "source", weight_col="n_chars", top_n=2)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "GlobalLimit" in plan or "Limit" in plan


def test_corpus_card_end_to_end(spark):
    from truthound_spark.pipeline.report import corpus_card, render_corpus_card

    rows = [
        (i, f"the quick brown fox {i % 4}", ["en", "es"][i % 2], f"src{i % 3}")
        for i in range(60)
    ]
    rows.append((60, None, "en", "src0"))
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    card = corpus_card(df)
    assert card["docs"] == 61 and card["null_text"] == 1
    assert card["tokens_est"] > 0 and card["chars"] > 0
    # 60 docs over 4 distinct texts → 56 excess copies
    assert card["exact_dup_ratio"] == round(56 / 60, 6)
    assert {r["group"] for r in card["by_language"]} == {"en", "es"}
    assert card["source_concentration"]["n_groups"] == 3
    md = render_corpus_card(card)
    assert "# Corpus card" in md and "| src0 |" in md and "Exact-duplicate" in md


def test_corpus_card_skips_missing_grouping_columns(spark):
    from truthound_spark.pipeline.report import corpus_card

    df = spark.createDataFrame([(0, "hello world")], "doc_id long, text string")
    card = corpus_card(df)
    assert "by_source" not in card and "by_language" not in card
    assert card["docs"] == 1
