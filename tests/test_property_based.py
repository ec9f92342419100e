"""Property-based tests (hypothesis) — beyond the reference's test
strategy (SURVEY §5 notes it has none): algebraic invariants of checksum
validators, dedup estimators, and packing that must hold for ARBITRARY
inputs, not just fixtures."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# Luhn: Spark expression chain == pure-Python reference implementation
# ---------------------------------------------------------------------------
def _luhn_ok(digits: str) -> bool:
    total = 0
    for i, ch in enumerate(reversed(digits)):
        d = int(ch)
        if i % 2 == 1:
            d *= 2
            if d > 9:
                d -= 9
        total += d
    return total % 10 == 0


@settings(max_examples=30, deadline=None)
@given(st.lists(st.text("0123456789", min_size=8, max_size=19), min_size=1, max_size=20))
def test_luhn_expression_matches_python(spark, numbers):
    from truthound_spark.validators.business import LuhnValidator

    df = spark.createDataFrame([(n,) for n in numbers], "s string")
    issues = LuhnValidator("s").validate(df)
    spark_invalid = issues[0].count if issues else 0
    py_invalid = sum(0 if _luhn_ok(n) else 1 for n in numbers)
    assert spark_invalid == py_invalid


# ---------------------------------------------------------------------------
# Exact dedup: fingerprint grouping == python normalization grouping
# ---------------------------------------------------------------------------
def _norm(s: str) -> str:
    import re

    return re.sub(r"\s+", " ", re.sub(r"[^a-z0-9\s]", " ", s.lower())).strip()


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.text(
            st.characters(codec="ascii", exclude_categories=["Cc", "Cs"]),
            min_size=1,
            max_size=40,
        ),
        min_size=2,
        max_size=30,
    )
)
def test_exact_dedup_matches_python_grouping(spark, texts):
    from collections import Counter

    from truthound_spark.pipeline.dedup import exact_duplicates

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    groups = exact_duplicates(df).collect()
    spark_dup_rows = sum(r["dup_count"] for r in groups)
    counts = Counter(_norm(t) for t in texts)
    py_dup_rows = sum(c for c in counts.values() if c > 1)
    assert spark_dup_rows == py_dup_rows


# ---------------------------------------------------------------------------
# Sequence packing: budget + permutation coverage hold for any token sizes
# ---------------------------------------------------------------------------
@settings(max_examples=10, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=400), min_size=1, max_size=60))
def test_pack_sequences_invariants(spark, sizes):
    from truthound_spark.pipeline.export import pack_sequences

    docs = [(i, "w " * n) for i, n in enumerate(sizes)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    packed = pack_sequences(df, max_tokens=128, n_shards=4).collect()
    assert all(r["total_tokens"] <= 128 for r in packed)
    packed_ids = sorted(i for r in packed for i in r["doc_ids"])
    assert packed_ids == list(range(len(sizes)))


# ---------------------------------------------------------------------------
# Range validator: count equals the count of any equivalent python filter
# ---------------------------------------------------------------------------
@settings(max_examples=20, deadline=None)
@given(
    st.lists(st.one_of(st.none(), st.floats(allow_nan=False, allow_infinity=False,
                                            min_value=-1e6, max_value=1e6)),
             min_size=1, max_size=50),
    st.floats(min_value=-100, max_value=0),
    st.floats(min_value=1, max_value=100),
)
def test_range_validator_matches_python(spark, values, lo, hi):
    from truthound_spark.validators.distribution import RangeValidator

    df = spark.createDataFrame([(v,) for v in values], "x double")
    issues = RangeValidator("x", lo, hi).validate(df)
    spark_bad = issues[0].count if issues else 0
    py_bad = sum(1 for v in values if v is not None and (v < lo or v > hi))
    assert spark_bad == py_bad


# ---------------------------------------------------------------------------
# round-4 operators: permutation / quantization / planning invariants
# ---------------------------------------------------------------------------


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.text(st.characters(codec="ascii", exclude_characters="\x00"), min_size=1, max_size=12),
        min_size=2,
        max_size=40,
        unique=True,
    ),
    st.integers(min_value=1, max_value=5),
    st.integers(min_value=0, max_value=3),
)
def test_global_shuffle_is_bijection_for_any_keys(spark, keys, n_shards, seed):
    """For ARBITRARY unique string keys: every row appears exactly once,
    per-shard positions are 1..n_s contiguous, and the permutation is a
    pure function of (key, seed)."""
    from truthound_spark.pipeline.export import global_shuffle

    df = spark.createDataFrame([(k,) for k in keys], "doc_id string")
    out = [
        (r["doc_id"], r["shard"], r["position"])
        for r in global_shuffle(df, n_shards=n_shards, seed=seed).collect()
    ]
    assert sorted(k for k, _, _ in out) == sorted(keys)
    per_shard: dict[int, list[int]] = {}
    for _, s, p in out:
        assert 0 <= s < n_shards
        per_shard.setdefault(s, []).append(p)
    for ps in per_shard.values():
        assert sorted(ps) == list(range(1, len(ps) + 1))
    again = [
        (r["doc_id"], r["shard"], r["position"])
        for r in global_shuffle(df.repartition(3), n_shards=n_shards, seed=seed).collect()
    ]
    assert sorted(out) == sorted(again)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.lists(
            st.floats(min_value=-100, max_value=100, allow_nan=False, width=64),
            min_size=1,
            max_size=8,
        ),
        min_size=1,
        max_size=15,
    )
)
def test_quantize_bounds_and_reconstruction(spark, vectors):
    """int8 codes stay in [-127, 127]; reconstruction error <= scale/2 per
    component for ANY finite vectors."""
    from truthound_spark.pipeline.similarity import (
        dequantize_embeddings,
        quantize_embeddings,
    )

    rows = [(i, v) for i, v in enumerate(vectors)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = {r["id"]: (r["scale"], list(r["q"])) for r in quantize_embeddings(df).collect()}
    rec = {
        r["id"]: list(r["embedding"])
        for r in dequantize_embeddings(quantize_embeddings(df)).collect()
    }
    for i, v in rows:
        scale, codes = q[i]
        assert all(-127 <= c <= 127 for c in codes)
        for orig, back in zip(v, rec[i]):
            assert abs(orig - back) <= scale / 2 + 1e-9


@settings(max_examples=10, deadline=None)
@given(
    st.integers(min_value=0, max_value=6),
    st.integers(min_value=1, max_value=4),
)
def test_repetition_plan_monotone_in_budget(spark, mult, max_epochs):
    """Planned tokens never decrease as the budget grows, and never exceed
    max_epochs x corpus."""
    from truthound_spark.pipeline.export import repetition_plan
    from truthound_spark.pipeline.text import bpe_ish_token_count

    df = spark.createDataFrame(
        [(i, "seven words of text in each doc") for i in range(20)],
        "doc_id long, text string",
    )
    tok = F.coalesce(bpe_ish_token_count(F.col("text")), F.lit(0))
    available = df.agg(F.sum(tok)).collect()[0][0]

    def planned(budget):
        out = repetition_plan(df, budget, max_epochs=max_epochs)
        return out.agg(F.sum(F.col("repeats") * tok)).collect()[0][0] or 0

    lo = planned(int(available * mult / 2))
    hi = planned(int(available * mult))
    assert lo <= hi
    assert hi <= max_epochs * available


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.text(alphabet="ab c", min_size=1, max_size=12),
        min_size=1,
        max_size=8,
    ),
    st.integers(min_value=1, max_value=6),
)
def test_bpe_train_matches_reference_on_random_corpora(spark, texts, rounds):
    """Distributed bpe_train == the canonical pure-Python BPE on random
    tiny-alphabet corpora (small alphabet maximizes merge collisions and
    tie-breaks — the hard cases)."""
    from collections import Counter

    from tests.test_round5_ops import _ref_bpe, _tokenize_words
    from truthound_spark.pipeline.tokenizer import bpe_train

    freqs = Counter()
    for t in texts:
        freqs.update(_tokenize_words(t))
    expected, _ = _ref_bpe(dict(freqs), rounds=rounds)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [
        (r["round"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in bpe_train(df, rounds=rounds).orderBy("round").collect()
    ]
    assert got == expected


# ---------------------------------------------------------------------------
# ROC-AUC: histogram rank-sum == brute-force pairwise probability
# ---------------------------------------------------------------------------
@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=100),  # score in %
            st.booleans(),
        ),
        min_size=2,
        max_size=60,
    )
)
def test_auc_binned_matches_pairwise_probability(spark, pairs):
    from truthound_spark.pipeline.regression import auc_binned

    rows = [(s / 100.0, 1.0 if y else 0.0) for s, y in pairs]
    pos = [s for s, y in rows if y == 1.0]
    neg = [s for s, y in rows if y == 0.0]
    df = spark.createDataFrame(rows, "score double, y double")
    r = auc_binned(df, "score", "y").collect()[0]
    if not pos or not neg:
        assert r["auc"] is None
        return
    expect = sum(
        1.0 if p > q else (0.5 if p == q else 0.0) for p in pos for q in neg
    ) / (len(pos) * len(neg))
    assert r["auc"] == round(expect, 6)


# ---------------------------------------------------------------------------
# Composition: shares are exact ratios; cum_share monotone; totals conserved
# ---------------------------------------------------------------------------
@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.sampled_from("abcdef"), st.integers(min_value=0, max_value=500)),
        min_size=1,
        max_size=40,
    )
)
def test_corpus_composition_share_algebra(spark, rows):
    from truthound_spark.pipeline.report import corpus_composition

    df = spark.createDataFrame(
        [(i, g, w) for i, (g, w) in enumerate(rows)],
        "doc_id long, source string, n_chars long",
    )
    out = corpus_composition(df, "source", weight_col="n_chars").collect()
    assert sum(r["n_docs"] for r in out) == len(rows)
    assert sum(r["weight"] for r in out) == sum(w for _g, w in rows)
    cums = [r["cum_share"] for r in out]
    assert cums == sorted(cums)
    for r in out:
        tot = sum(w for _g, w in rows)
        if tot:
            expect = sum(w for g, w in rows if g == r["group"]) / tot
            assert abs(r["weight_share"] - expect) < 1e-6


# ---------------------------------------------------------------------------
# Weighted sampling: zero weights never selected; k >= n keeps everything
# positive; determinism under re-run
# ---------------------------------------------------------------------------
@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=30),
    st.integers(min_value=1, max_value=40),
)
def test_weighted_sample_selection_laws(spark, weights, k):
    from truthound_spark.pipeline.export import weighted_sample

    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(weights)], "doc_id long, w long"
    )
    out = weighted_sample(df, "w", k=k, key_col="doc_id").collect()
    positive = [i for i, w in enumerate(weights) if w > 0]
    assert len(out) == min(k, len(positive))
    ids = {r["doc_id"] for r in out}
    assert all(weights[i] > 0 for i in ids)
    again = {r["doc_id"] for r in weighted_sample(df, "w", k=k, key_col="doc_id").collect()}
    assert again == ids


# ---------------------------------------------------------------------------
# Threshold sweep: tp+fn is the constant positive count; tp/fp monotone
# nonincreasing as the threshold rises
# ---------------------------------------------------------------------------
@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=100), st.booleans()),
        min_size=1,
        max_size=50,
    )
)
def test_threshold_sweep_confusion_invariants(spark, pairs):
    from truthound_spark.pipeline.regression import threshold_sweep

    rows = [(s / 100.0, 1.0 if y else 0.0) for s, y in pairs]
    df = spark.createDataFrame(rows, "score double, y double")
    out = sorted(
        threshold_sweep(df, "score", "y", [0.25, 0.5, 0.75]).collect(),
        key=lambda r: r["threshold"],
    )
    n_pos = sum(1 for _s, y in rows if y == 1.0)
    n_neg = len(rows) - n_pos
    for r in out:
        assert r["tp"] + r["fn"] == n_pos
        assert r["fp"] + r["tn"] == n_neg
    tps = [r["tp"] for r in out]
    fps = [r["fp"] for r in out]
    assert tps == sorted(tps, reverse=True)
    assert fps == sorted(fps, reverse=True)
