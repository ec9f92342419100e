"""Round-4 text-curation operators: hashed classifier, paragraph dedup,
token chunking (pipeline/text.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from truthound_spark.pipeline.text import (
    chunk_documents,
    classifier_quality_score,
    paragraph_dedup,
)


@pytest.fixture()
def docs(spark):
    rows = [
        (1, "the quick brown fox\n\nthe quick brown fox\n\njumps over"),
        (2, "the quick brown fox\n\nsomething else entirely"),
        (3, "   "),
        (4, "one two three four five six seven eight nine ten"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestClassifierScore:
    def test_scores_bounded_and_deterministic(self, docs):
        r1 = {r.doc_id: r.classifier_score for r in classifier_quality_score(docs).collect()}
        r2 = {r.doc_id: r.classifier_score for r in classifier_quality_score(docs).collect()}
        assert r1 == r2
        assert all(0.0 < v < 1.0 for v in r1.values())

    def test_blank_doc_scores_sigmoid_of_bias(self, docs):
        got = {r.doc_id: r.classifier_score for r in classifier_quality_score(docs).collect()}
        assert got[3] == 0.5  # no tokens -> sigmoid(0)
        got_b = {
            r.doc_id: r.classifier_score
            for r in classifier_quality_score(docs, bias=1.0).collect()
        }
        assert got_b[3] == pytest.approx(0.731059, abs=1e-6)

    def test_trained_weights_override(self, spark):
        df = spark.createDataFrame([(1, "good good good")], "doc_id long, text string")
        # all-positive weights force score > 0.5; all-negative force < 0.5
        hi = classifier_quality_score(df, weights=[2.0] * 64, num_buckets=64).collect()
        lo = classifier_quality_score(df, weights=[-2.0] * 64, num_buckets=64).collect()
        assert hi[0].classifier_score > 0.8 > 0.2 > lo[0].classifier_score

    def test_weights_length_validated(self, docs):
        with pytest.raises(ValueError, match="weights"):
            classifier_quality_score(docs, weights=[0.1], num_buckets=64)

    def test_no_udf_in_plan(self, docs):
        plan = (
            classifier_quality_score(docs)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestParagraphDedup:
    def test_first_occurrence_wins(self, docs):
        got = {
            r.doc_id: (r.text, r.paragraphs_kept, r.paragraphs_removed)
            for r in paragraph_dedup(docs).collect()
        }
        # doc 1 keeps its first copy + unique paragraph
        assert got[1] == ("the quick brown fox\n\njumps over", 2, 1)
        # doc 2 loses the paragraph doc 1 owns
        assert got[2] == ("something else entirely", 1, 1)
        # blank doc -> empty text, zero counts, row preserved
        assert got[3] == ("", 0, 0)
        assert got[4][1:] == (1, 0)

    def test_idempotent(self, docs):
        once = paragraph_dedup(docs)
        twice = paragraph_dedup(once.select("doc_id", "text"))
        t1 = {r.doc_id: r.text for r in once.collect()}
        t2 = {r.doc_id: r.text for r in twice.collect()}
        assert t1 == t2
        assert all(r.paragraphs_removed == 0 for r in twice.collect())

    def test_original_columns_survive(self, spark):
        df = spark.createDataFrame(
            [(1, "a\n\nb", "keep-me")], "doc_id long, text string, extra string"
        )
        row = paragraph_dedup(df).collect()[0]
        assert row.extra == "keep-me"


class TestChunkDocuments:
    def test_no_overlap_partitions_tokens(self, docs):
        got = [
            (r.chunk_index, r.chunk_text, r.chunk_tokens)
            for r in chunk_documents(docs, max_tokens=4)
            .filter("doc_id = 4")
            .orderBy("chunk_index")
            .collect()
        ]
        assert got == [
            (0, "one two three four", 4),
            (1, "five six seven eight", 4),
            (2, "nine ten", 2),
        ]

    def test_overlap_shares_tokens(self, docs):
        got = [
            r.chunk_text
            for r in chunk_documents(docs, max_tokens=4, overlap=1)
            .filter("doc_id = 4")
            .orderBy("chunk_index")
            .collect()
        ]
        # stride 3: each chunk repeats the previous chunk's last token
        assert got == [
            "one two three four",
            "four five six seven",
            "seven eight nine ten",
        ]
        # no tail chunk fully contained in its predecessor
        assert all(len(c.split()) > 1 for c in got)

    def test_blank_docs_produce_no_chunks(self, docs):
        assert chunk_documents(docs, max_tokens=4).filter("doc_id = 3").count() == 0

    def test_doc_shorter_than_chunk(self, spark):
        df = spark.createDataFrame([(1, "just three words")], "doc_id long, text string")
        got = chunk_documents(df, max_tokens=100, overlap=10).collect()
        assert len(got) == 1 and got[0].chunk_tokens == 3

    def test_parameter_validation(self, docs):
        with pytest.raises(ValueError, match="max_tokens"):
            chunk_documents(docs, max_tokens=0)
        with pytest.raises(ValueError, match="overlap"):
            chunk_documents(docs, max_tokens=4, overlap=4)

    def test_no_shuffle_in_plan(self, docs):
        plan = (
            chunk_documents(docs, max_tokens=4)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan  # pure map-side projection + explode


def test_train_quality_weights_separates_classes(spark):
    """Closed-form NB training: docs resembling the positive corpus score
    above docs resembling the negative one."""
    from pyspark.sql import functions as F

    from truthound_spark.pipeline.text import (
        classifier_quality_score,
        train_quality_weights,
    )

    pos = spark.createDataFrame(
        [(i, "thoughtful encyclopedic prose about science history and culture") for i in range(20)],
        "doc_id long, text string",
    )
    neg = spark.createDataFrame(
        [(i, "click here buy now free casino winner jackpot prize") for i in range(20)],
        "doc_id long, text string",
    )
    weights = train_quality_weights(pos, neg)
    assert len(weights) == 4096
    probe = spark.createDataFrame(
        [
            (1, "encyclopedic prose about science and culture"),
            (2, "free casino jackpot click here now"),
            (3, "completely unrelated neutral vocabulary entirely"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["classifier_score"]
        for r in classifier_quality_score(probe, weights=weights).collect()
    }
    assert got[1] > got[3] > got[2]
    assert got[1] > 0.5 > got[2]


# ---------------------------------------------------------------------------
# winnowing fingerprints (Schleimer et al. 2003)
# ---------------------------------------------------------------------------


def test_winnow_guarantee_shared_run_yields_shared_fingerprint(spark):
    from truthound_spark.pipeline.text import winnow_fingerprints, winnow_overlap_pairs

    # shared run of 12 tokens >= w + k - 1 = 7 -> at least one shared hash
    run = "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu"
    docs = spark.createDataFrame(
        [(1, f"{run} ending one"), (2, f"prefix words here {run}")],
        ["doc_id", "text"],
    )
    pairs = winnow_overlap_pairs(docs, k=4, w=4, min_shared=1).collect()
    assert len(pairs) == 1 and pairs[0]["shared_fingerprints"] >= 1

    # density: selected <= grams, >= 1 for docs with >= k tokens
    for r in winnow_fingerprints(docs, k=4, w=4).collect():
        assert 1 <= len(r["fingerprints"])


def test_winnow_short_and_empty_docs(spark):
    from truthound_spark.pipeline.text import winnow_fingerprints

    docs = spark.createDataFrame(
        [(1, "one two three"), (2, ""), (3, "exactly four tokens here")],
        ["doc_id", "text"],
    )
    out = {r["id"]: r["fingerprints"] for r in winnow_fingerprints(docs, k=4, w=4).collect()}
    assert out[1] == [] and out[2] == []     # < k tokens -> no grams
    assert len(out[3]) == 1                  # one gram -> one window -> one pick


def test_winnow_deterministic_and_position_invariant_hashes(spark):
    from truthound_spark.pipeline.text import winnow_fingerprints

    text = "the quick brown fox jumps over the lazy dog again and again today"
    docs = spark.createDataFrame(
        [(1, text), (2, "shift " + text)], ["doc_id", "text"]
    )
    out = {r["id"]: r["fingerprints"] for r in winnow_fingerprints(docs, k=4, w=4).collect()}
    h1 = {f["h"] for f in out[1]}
    h2 = {f["h"] for f in out[2]}
    # same content at shifted offset selects (almost) the same hash set;
    # every doc-1 hash not near the new prefix boundary must reappear
    assert len(h1 & h2) >= len(h1) - 2


# ---------------------------------------------------------------------------
# DSIR importance resampling (Xie et al. 2023)
# ---------------------------------------------------------------------------


def test_dsir_importance_favors_target_like_docs(spark):
    from truthound_spark.pipeline.text import dsir_log_importance, train_quality_weights

    target = spark.createDataFrame(
        [(i, "science research physics theory experiment") for i in range(10)],
        ["doc_id", "text"],
    )
    raw = spark.createDataFrame(
        [(100, "science research physics theory experiment"),
         (101, "buy cheap pills online casino bonus")],
        ["doc_id", "text"],
    )
    weights = train_quality_weights(target, raw)
    out = {r["doc_id"]: r["log_importance"]
           for r in dsir_log_importance(raw, weights).collect()}
    assert out[100] > out[101]


def test_dsir_select_deterministic_and_target_biased(spark):
    from truthound_spark.pipeline.text import dsir_select

    target = spark.createDataFrame(
        [(1000 + i, "alpha beta gamma delta epsilon") for i in range(5)],
        ["doc_id", "text"],
    )
    raw = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon") for i in range(20)]
        + [(100 + i, "zig zag zoom completely other words") for i in range(20)],
        ["doc_id", "text"],
    )
    sel1 = [(r["id"], r["rank"]) for r in dsir_select(raw, target, n_select=10).collect()]
    sel2 = [(r["id"], r["rank"]) for r in dsir_select(raw, target, n_select=10).collect()]
    assert sel1 == sel2                                  # md5-Gumbel: no RNG state
    ids = {i for i, _ in sel1}
    assert len(ids) == 10
    assert sum(1 for i in ids if i < 100) >= 8           # softmax mass on target-like


def test_quantile_gate_exact_membership_per_group(spark):
    from truthound_spark.pipeline.text import quantile_gate

    rows = [(i, "a", float(i)) for i in range(10)] + [(100 + i, "b", float(i)) for i in range(4)]
    df = spark.createDataFrame(rows, ["doc_id", "src", "s"])
    out = quantile_gate(df, "s", group_col="src", keep_fraction=0.5)
    kept = {r["id"] for r in out.collect() if r["kept"]}
    # group a: top 5 of 10 by score desc -> ids 5..9; group b: top 2 of 4 -> 102,103
    assert kept == {5, 6, 7, 8, 9, 102, 103}


def test_quantile_gate_validates_fraction(spark):
    import pytest as _pytest
    from truthound_spark.pipeline.text import quantile_gate

    df = spark.createDataFrame([(1, 1.0)], ["doc_id", "s"])
    with _pytest.raises(ValueError):
        quantile_gate(df, "s", keep_fraction=0.0)
    # global gate (no group): one stratum
    out = quantile_gate(df, "s", keep_fraction=1.0).collect()
    assert out[0]["kept"] is True and out[0]["group"] == "__all__"


def test_tfidf_keywords_rank_rare_terms_highest(spark):
    from truthound_spark.pipeline.retrieval import tfidf_keywords

    docs = spark.createDataFrame(
        [
            (1, "common common common zebra"),
            (2, "common words appear here"),
            (3, "common words appear there"),
        ],
        ["doc_id", "text"],
    )
    out = tfidf_keywords(docs, k=2).collect()
    top1 = {r["id"]: r["term"] for r in out if r["rank"] == 1}
    # 'zebra' (df=1) beats 'common' (df=3) despite tf=3 for common in doc 1?
    # tf*idf: common 3*(ln(4/4)+1)=3.0; zebra 1*(ln(4/2)+1)=1.69 -> common wins on tf
    assert top1[1] == "common"
    # doc 2/3: unique terms (df=1) outrank shared 'common'/'words'/'appear' (df>=2)
    assert top1[2] == "here" and top1[3] == "there"


def test_boilerplate_ngrams_finds_shared_template(spark):
    from truthound_spark.pipeline.retrieval import boilerplate_ngrams

    footer = "copyright two thousand example company all rights reserved"
    docs = spark.createDataFrame(
        [(i, f"body text number {i} words vary a lot {footer}") for i in range(6)]
        + [(99, "entirely unrelated document content")],
        ["doc_id", "text"],
    )
    out = boilerplate_ngrams(docs, n=5, min_docs=3, k=10).collect()
    assert out, "expected shared footer grams"
    assert all(r["n_docs"] == 6 for r in out if "copyright" in r["gram"] or "rights" in r["gram"])
    ranks = [r["rank"] for r in out]
    assert ranks == sorted(ranks) and ranks[0] == 1


def test_char_entropy_separates_noise_and_spam(spark):
    import math

    from truthound_spark.pipeline.text import char_entropy

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog and more normal prose"),
            (2, "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa"),                # run-length spam
            (3, "abcdefghij klmnopqrst uvwxyz0123 456789abcd efghijklmn"),  # near-uniform
            (4, ""),
        ],
        ["doc_id", "text"],
    )
    out = {r["id"]: r for r in char_entropy(docs).collect()}
    assert 3.5 < out[1]["entropy_bits"] < 4.6          # typical English prose
    assert out[2]["entropy_bits"] < 0.5                # one-symbol spam
    assert out[3]["entropy_bits"] > out[1]["entropy_bits"]  # near-uniform alphabet
    assert out[4]["entropy_bits"] == 0.0 and out[4]["n_chars"] == 0
    # exact check: doc 2 = 36 'a' chars -> entropy exactly 0
    assert out[2]["entropy_bits"] == 0.0 or out[2]["entropy_bits"] < 1e-6


class TestHashFnFastPath:
    def test_xxhash64_same_shape_different_buckets(self, docs):
        from truthound_spark.pipeline.text import hashed_feature_buckets

        md5 = docs.select(
            hashed_feature_buckets("text", hash_fn="md5").alias("b")
        ).collect()
        xx = docs.select(
            hashed_feature_buckets("text", hash_fn="xxhash64").alias("b")
        ).collect()
        # same token count per doc, every bucket id in range on both paths
        for a, b in zip(md5, xx):
            assert len(a["b"]) == len(b["b"])
            assert all(0 <= v < 4096 for v in a["b"])
            assert all(0 <= v < 4096 for v in b["b"])
        # and the assignments genuinely differ (weights are NOT portable
        # across hash_fn — the reason it is a parameter, not a default)
        assert any(a["b"] != b["b"] for a, b in zip(md5, xx) if a["b"])

    def test_scores_bounded_under_xxhash64(self, docs):
        scored = classifier_quality_score(docs, hash_fn="xxhash64").collect()
        assert all(0.0 <= r["classifier_score"] <= 1.0 for r in scored)

    def test_train_score_consistency_under_xxhash64(self, spark):
        from truthound_spark.pipeline.text import train_quality_weights

        pos = spark.createDataFrame(
            [(i, "excellent well written prose here") for i in range(8)],
            "doc_id long, text string",
        )
        neg = spark.createDataFrame(
            [(i, "buy cheap pills now click here") for i in range(8, 16)],
            "doc_id long, text string",
        )
        w = train_quality_weights(pos, neg, hash_fn="xxhash64")
        scored = {
            r["doc_id"]: r["classifier_score"]
            for r in classifier_quality_score(
                pos.unionByName(neg), weights=w, hash_fn="xxhash64"
            ).collect()
        }
        # trained under the same hash: positives outscore negatives
        assert min(scored[i] for i in range(8)) > max(
            scored[i] for i in range(8, 16)
        )

    def test_bad_hash_fn_rejected(self, docs):
        with pytest.raises(ValueError, match="hash_fn"):
            classifier_quality_score(docs, hash_fn="sha1").collect()
