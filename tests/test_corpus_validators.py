"""Corpus-quality validators (validators/corpus.py): exact counts on
crafted frames, check() integration (fused suite), name resolution, and
score parity with pipeline/text.quality_score."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import truthound_spark as th
from truthound_spark.validators.corpus import (
    ContaminationValidator,
    CorpusDuplicateRatioValidator,
    CorpusQualityValidator,
    CorpusTokenCountValidator,
    EmptyDocumentValidator,
    LanguageBalanceValidator,
)


@pytest.fixture()
def corpus(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog and it is fine for now"),
        (2, "The quick brown fox jumps over the lazy dog and it is fine for now"),
        (3, "der hund und die katze sind von den besten ein gutes beispiel"),
        (4, "!!! ???"),
        (5, None),
        (6, "12345 67890 11111 22222 33333 44444 55555 66666 77777 88888"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_duplicate_ratio_counts_excess(spark, corpus):
    # docs 1 and 2 normalize identically; 4 and 5 both normalize to ''
    # (empty) -> fingerprints: {d1, d3, '', d6} over 5 non-null md5s
    # (null text -> null fingerprint, excluded): count=5, distinct=4
    issues = CorpusDuplicateRatioValidator(max_ratio=0.0).validate(corpus)
    assert len(issues) == 1
    assert issues[0].count == 1
    assert CorpusDuplicateRatioValidator(max_ratio=0.5).validate(corpus) == []


def test_quality_validator_matches_pipeline_score(spark, corpus):
    from truthound_spark.pipeline.text import quality_score
    from truthound_spark.validators.corpus import _quality_score_expr

    got = corpus.select(
        "doc_id", _quality_score_expr(F.col("text")).alias("s")
    ).collect()
    want = {r["doc_id"]: r["quality_score"] for r in quality_score(corpus).collect()}
    for r in got:
        assert r["s"] == want[r["doc_id"]], r["doc_id"]


def test_quality_validator_flags_low_scores(spark, corpus):
    issues = CorpusQualityValidator(min_score=0.5, max_low_quality_ratio=0.0).validate(
        corpus
    )
    assert len(issues) == 1
    assert issues[0].count >= 2  # punct-only + digits docs at least
    assert CorpusQualityValidator(min_score=0.0).validate(corpus) == []


def test_token_count_bounds(spark, corpus):
    # BPE-ish counts: docs 1,2 -> 15; doc 3 -> 12; '!!! ???' -> 6 (each
    # char a token); digits doc -> 10; null text -> null predicate (row
    # not counted — nulls are the empty_document validator's job)
    issues = CorpusTokenCountValidator(min_tokens=7, max_tokens=14).validate(corpus)
    assert len(issues) == 1
    assert issues[0].count == 3  # doc4 below, docs 1+2 above
    assert CorpusTokenCountValidator(min_tokens=1, max_tokens=100).validate(corpus) == []


def test_empty_document_counts(spark, corpus):
    issues = EmptyDocumentValidator().validate(corpus)
    assert len(issues) == 1
    assert issues[0].count == 2  # punct-only + null


def test_language_balance(spark, corpus):
    # lang ids: en,en,de,unknown,unknown,unknown -> dominant 'unknown' 0.5
    strict = LanguageBalanceValidator(max_share=0.3).validate(corpus)
    assert len(strict) == 1
    assert strict[0].actual == {"language": "unknown", "share": 0.5}
    lax = LanguageBalanceValidator(max_share=0.9).validate(corpus)
    assert lax == []


def test_contamination_broadcast_probe(spark, corpus):
    probe = spark.createDataFrame(
        [(100, "the quick brown fox appears here too")], "doc_id long, text string"
    )
    issues = ContaminationValidator(probe, min_overlap=1).validate(corpus)
    assert len(issues) == 1
    assert issues[0].count == 2  # docs 1 and 2 share 'the quick brown' etc.
    clean_probe = spark.createDataFrame(
        [(101, "zebra xylophone quartz vortex jumble")], "doc_id long, text string"
    )
    assert ContaminationValidator(clean_probe).validate(corpus) == []


def test_check_integration_fused(spark, corpus):
    res = th.check(
        corpus,
        validators=[
            CorpusDuplicateRatioValidator(max_ratio=0.5),
            CorpusQualityValidator(min_score=0.1, max_low_quality_ratio=0.5),
            CorpusTokenCountValidator(min_tokens=1, max_tokens=1000),
            EmptyDocumentValidator(),
        ],
    )
    # empty_document fires (2 docs); the relaxed others pass
    names = {i.validator_name for i in res.issues}
    assert "empty_document" in names
    assert not res.success


def test_names_resolve_via_registry(spark, corpus):
    res = th.check(
        corpus,
        validators=[
            "corpus_duplicate_ratio",
            "corpus_quality",
            "corpus_token_count",
            "empty_document",
            "language_balance",
        ],
    )
    assert res is not None  # all five resolve and run fused


def test_corpus_drift_flags_shifted_snapshot(spark):
    from truthound_spark.pipeline.text import corpus_drift

    base = spark.createDataFrame(
        [(i, "a normal document with about ten reasonable words here") for i in range(60)],
        "doc_id long, text string",
    )
    same = spark.createDataFrame(
        [(1000 + i, "a normal document with about ten reasonable words here") for i in range(60)],
        "doc_id long, text string",
    )
    shifted = spark.createDataFrame(
        [(2000 + i, "1234 5678 " * 40) for i in range(60)],
        "doc_id long, text string",
    )
    stable = {r["signal"]: r["drifted"] for r in corpus_drift(base, same).collect()}
    assert set(stable) == {"quality_score", "token_count", "char_length"}
    assert not any(stable.values())
    moved = {r["signal"]: r["drifted"] for r in corpus_drift(base, shifted).collect()}
    assert any(moved.values())
