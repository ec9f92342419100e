"""Data-mixing + bloom-decontamination operators (pipeline/export.py
stratified_sample / mixture_weights, pipeline/dedup.py decontaminate_bloom)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from truthound_spark.pipeline.dedup import decontaminate, decontaminate_bloom
from truthound_spark.pipeline.export import mixture_weights, stratified_sample


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (i, f"src{i % 3}", " ".join(f"w{(i * 7 + j) % 50}" for j in range(30)))
        for i in range(90)
    ]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_stratified_quota_deterministic(corpus):
    s1 = stratified_sample(corpus, "source", k_per_group=5)
    s2 = stratified_sample(corpus, "source", k_per_group=5)
    ids1 = sorted(r.doc_id for r in s1.collect())
    assert ids1 == sorted(r.doc_id for r in s2.collect())
    per_group = {r["source"]: r["c"] for r in s1.groupBy("source").agg(F.count("*").alias("c")).collect()}
    assert per_group == {"src0": 5, "src1": 5, "src2": 5}


def test_stratified_fractions_mapside_no_shuffle(corpus):
    s = stratified_sample(corpus, "source", fractions={"src0": 1.0, "src1": 0.0})
    got = {r["source"] for r in s.select("source").distinct().collect()}
    assert got == {"src0"}  # src1 rate 0, src2 unlisted -> dropped
    assert s.count() == 30
    plan = s._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "fraction mode must be pure map-side"


def test_stratified_sample_validates_args(corpus):
    with pytest.raises(ValueError, match="exactly one"):
        stratified_sample(corpus, "source")
    with pytest.raises(ValueError, match="exactly one"):
        stratified_sample(corpus, "source", k_per_group=1, fractions={"a": 0.5})
    with pytest.raises(ValueError, match="fractions"):
        stratified_sample(corpus, "source", fractions={"a": 1.5})


def test_mixture_weights_binding_source(corpus):
    out = {r["source"]: r.asDict() for r in mixture_weights(
        corpus, {"src0": 0.6, "src1": 0.2, "src2": 0.2}
    ).collect()}
    assert set(out) == {"src0", "src1", "src2"}
    # all sources have ~equal tokens, so the heaviest weight binds
    binding = out["src0"]
    assert binding["sample_rate"] == pytest.approx(1.0, abs=1e-6)
    for r in out.values():
        assert 0 < r["sample_rate"] <= 1.0 + 1e-9
        assert r["target_tokens"] <= r["available_tokens"]
    # realized mixture matches the target proportions
    total = sum(r["target_tokens"] for r in out.values())
    assert out["src0"]["target_tokens"] / total == pytest.approx(0.6, abs=0.01)


def test_mixture_weights_rejects_zero_sum(corpus):
    with pytest.raises(ValueError, match="sum > 0"):
        mixture_weights(corpus, {"src0": 0.0})


def test_bloom_equals_exact_decontamination(corpus):
    train = corpus.filter("doc_id % 2 = 0")
    test = corpus.filter("doc_id % 2 = 1")
    exact = {(r["doc_id"], r["overlap_ngrams"]) for r in decontaminate(
        train, test, "text", "doc_id", n=3
    ).collect()}
    bloom = {(r["doc_id"], r["overlap_ngrams"]) for r in decontaminate_bloom(
        train, test, "text", "doc_id", n=3
    ).collect()}
    assert exact == bloom and len(exact) > 0


def test_bloom_empty_test_set(corpus, spark):
    empty = spark.createDataFrame([], "doc_id long, source string, text string")
    assert decontaminate_bloom(corpus, empty, "text", "doc_id", n=3).count() == 0


def test_build_training_mix_end_to_end(spark, tmp_path):
    """mixture plan -> map-side sample -> deterministic shuffle -> sharded
    parquet, with the realized token mixture near the target."""
    import random

    from truthound_spark.pipeline.export import build_training_mix
    from truthound_spark.pipeline.text import bpe_ish_token_count
    from pyspark.sql import functions as F

    rng = random.Random(5)
    rows = []
    for i in range(1200):
        src = "web" if i % 3 else "code"
        words = " ".join(rng.choice(["alpha", "beta", "gamma", "delta"]) for _ in range(20))
        rows.append((i, src, words))
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")

    out_path = str(tmp_path / "mix")
    mixed = build_training_mix(
        df, {"web": 0.5, "code": 0.5}, path=out_path, n_shards=4, seed=1
    )
    got = (
        mixed.groupBy("source")
        .agg(F.sum(bpe_ish_token_count(F.col("text"))).alias("tok"))
        .collect()
    )
    toks = {r["source"]: r["tok"] for r in got}
    total = sum(toks.values())
    # 'code' (400 docs) binds the mixture; each side should be ~50%
    assert abs(toks["web"] / total - 0.5) < 0.1
    assert abs(toks["code"] / total - 0.5) < 0.1

    back = spark.read.parquet(out_path)
    assert back.count() == mixed.count()
    assert set(back.select("shard").distinct().toPandas()["shard"]) <= {0, 1, 2, 3}
    # deterministic: same seed reproduces the identical sample + order
    again = build_training_mix(df, {"web": 0.5, "code": 0.5}, n_shards=4, seed=1)
    assert sorted(
        (r["doc_id"], r["shard"], r["position"]) for r in mixed.collect()
    ) == sorted((r["doc_id"], r["shard"], r["position"]) for r in again.collect())


def test_repetition_plan_budget_and_determinism(spark):
    from pyspark.sql import functions as F

    from truthound_spark.pipeline.export import repetition_plan
    from truthound_spark.pipeline.text import bpe_ish_token_count

    df = spark.createDataFrame(
        [(i, "ten short words appear in this document exactly as planned") for i in range(100)],
        "doc_id long, text string",
    )
    tok = F.coalesce(bpe_ish_token_count(F.col("text")), F.lit(0))
    available = df.agg(F.sum(tok)).collect()[0][0]

    # budget = 2.5 corpora -> 2 full epochs + ~half the docs once more
    out = repetition_plan(df, target_tokens=int(available * 2.5))
    planned = out.agg(F.sum(F.col("repeats") * tok)).collect()[0][0]
    reps = {r["doc_id"]: r["repeats"] for r in out.collect()}
    assert set(reps.values()) <= {2, 3}
    assert abs(planned - available * 2.5) / (available * 2.5) < 0.15
    # deterministic across layouts
    again = repetition_plan(df.repartition(9), target_tokens=int(available * 2.5))
    assert reps == {r["doc_id"]: r["repeats"] for r in again.collect()}

    # budget beyond max_epochs caps at max_epochs everywhere
    capped = repetition_plan(df, target_tokens=available * 10, max_epochs=4)
    assert {r["repeats"] for r in capped.collect()} == {4}
    # sub-corpus budget -> 0 base epochs, partial extra pass
    small = repetition_plan(df, target_tokens=available // 2)
    assert {r["repeats"] for r in small.collect()} <= {0, 1}


def test_repetition_plan_validates_and_empty(spark):
    import pytest as _pytest

    from truthound_spark.pipeline.export import repetition_plan

    df = spark.createDataFrame([(1, None)], "doc_id long, text string")
    assert repetition_plan(df, 100).collect()[0]["repeats"] == 0
    with _pytest.raises(ValueError):
        repetition_plan(df, -1)
    with _pytest.raises(ValueError):
        repetition_plan(df, 10, max_epochs=0)
