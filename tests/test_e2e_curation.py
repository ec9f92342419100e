"""End-to-end LLM-corpus curation pipeline: the full composition a real
pretraining-data job runs, with row-conservation invariants at every
stage — hygiene filter → exact dedup → fuzzy dedup clusters →
decontamination → quality gate → deterministic shuffle → sequence
packing. Each stage is individually oracle-verified; this test pins that
they COMPOSE (schemas line up, ids survive, nothing double-drops)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from truthound_spark.pipeline.dedup import dedup_clusters, decontaminate
from truthound_spark.pipeline.export import global_shuffle, pack_sequences
from truthound_spark.pipeline.text import clean_text, gopher_filter, quality_score


@pytest.fixture()
def raw_docs(spark, sf_dir):
    import os

    path = f"{sf_dir}/documents.parquet"
    if not os.path.exists(path):
        pytest.skip(f"test dataset not present: {path}")
    return spark.read.parquet(path)


def test_full_curation_pipeline_composes(spark, raw_docs):
    n0 = raw_docs.count()

    # 1. hygiene: C4-style cleanup + Gopher repetition gate
    cleaned = raw_docs.withColumn("text", clean_text(F.col("text")))
    hygienic = gopher_filter(cleaned)
    n1 = hygienic.count()
    assert 0 < n1 <= n0

    # 2. fuzzy dedup: keep one canonical doc per near-dup cluster
    clusters = dedup_clusters(hygienic, threshold=0.7)
    assert clusters.count() == n1  # one row per surviving doc
    canon = hygienic.join(
        clusters.filter("is_canonical").select("doc_id"), "doc_id", "left_semi"
    )
    n2 = canon.count()
    assert 0 < n2 <= n1

    # 3. decontamination against a held-out probe set
    probe = raw_docs.filter(F.col("doc_id") % 97 == 0)
    contaminated = decontaminate(canon, probe, min_overlap=5)
    kept = canon.join(contaminated.select("doc_id"), "doc_id", "left_anti")
    n3 = kept.count()
    assert n3 + contaminated.count() == n2

    # 4. quality gate
    scored = quality_score(kept, "text")
    final = scored.filter(F.col("quality_score") >= 0.2).select("doc_id", "text")
    n4 = final.count()
    assert 0 < n4 <= n3

    # 5. deterministic global shuffle: a full permutation of the corpus
    shuffled = global_shuffle(final, n_shards=8)
    assert shuffled.count() == n4
    assert (
        shuffled.groupBy("shard", "position").count().filter("count > 1").count()
        == 0
    )

    # 6. pack into training sequences: token conservation
    packed = pack_sequences(final, max_tokens=512, n_shards=8)
    total_docs_packed = packed.agg(F.sum(F.size("doc_ids"))).collect()[0][0]
    assert total_docs_packed == n4  # every doc lands in exactly one pack
    over = packed.filter(F.col("total_tokens") > 512)
    # single docs longer than the budget get their own pack; multi-doc
    # packs must respect it
    assert over.filter(F.size("doc_ids") > 1).count() == 0


def test_pipeline_is_deterministic_across_partitionings(spark, raw_docs):
    """The whole front half of the pipeline (hygiene -> dedup -> quality)
    must give the SAME surviving id set regardless of input layout."""

    def run(df):
        hygienic = gopher_filter(df.withColumn("text", clean_text(F.col("text"))))
        clusters = dedup_clusters(hygienic, threshold=0.7)
        canon = hygienic.join(
            clusters.filter("is_canonical").select("doc_id"), "doc_id", "left_semi"
        )
        scored = quality_score(canon, "text")
        return {
            r["doc_id"]
            for r in scored.filter(F.col("quality_score") >= 0.2)
            .select("doc_id")
            .collect()
        }

    a = run(raw_docs)
    b = run(raw_docs.repartition(17))
    assert a == b and len(a) > 0


def test_streaming_corpus_gate(spark, tmp_path):
    """Corpus validators ride the streaming path unchanged: a file-source
    stream of documents is gated per micro-batch by the SAME fused-agg
    corpus suite used in batch (availableNow trigger = bounded test)."""
    from truthound_spark.streaming.validate import validate_stream
    from truthound_spark.validators.corpus import (
        CorpusTokenCountValidator,
        EmptyDocumentValidator,
    )

    src = str(tmp_path / "in")
    rows = [
        (1, "a healthy document with plenty of ordinary words to pass"),
        (2, "   "),
        (3, "another perfectly reasonable document streaming through here"),
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    query, sink = validate_stream(
        stream,
        validators=[
            CorpusTokenCountValidator(min_tokens=3, max_tokens=500),
            EmptyDocumentValidator(),
        ],
        checkpoint_location=str(tmp_path / "ckpt"),
    )
    try:
        query.processAllAvailable()
    finally:
        query.stop()
    assert len(sink.results) >= 1
    issues = [i for _, res in sink.results for i in res.issues]
    kinds = {i.validator_name: i.count for i in issues}
    assert kinds.get("empty_document") == 1  # the whitespace-only doc


def test_minhash_survives_pathological_skew(spark):
    """The documented scale guards must hold under skew: 2000 contentless
    docs (all normalizing to '') + 500 copies of one boilerplate doc must
    not send the LSH self-join quadratic — empty shingles are filtered
    before signatures, and the exact-dup mass resolves via the hash
    groupBy path, not pairwise comparison."""
    import time

    from truthound_spark.pipeline.dedup import dedup_clusters, exact_duplicates

    rows = [(i, "!!! ??? ...") for i in range(2000)]
    rows += [(10_000 + i, "identical boilerplate text repeated verbatim in every copy") for i in range(500)]
    rows += [(20_000 + i, f"unique document number {i} with its own distinct words here") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    t0 = time.time()
    groups = exact_duplicates(df).collect()
    clusters = dedup_clusters(df, threshold=0.7)
    canonical = clusters.filter("is_canonical").count()
    elapsed = time.time() - t0
    # all 2000 contentless docs are ONE exact-dup group; 500 boilerplate
    # another; minhash sees only the contentful docs
    counts = sorted(g["dup_count"] for g in groups)
    assert counts[-2:] == [500, 2000]
    # boilerplate cluster collapses to 1 canonical; contentless docs have
    # no shingles so each keeps itself (exact-dedup is their tool)
    assert canonical == 2000 + 1 + 300
    assert elapsed < 120, f"skew guard failed: took {elapsed:.0f}s"


def test_round5_curation_stages_compose(spark, raw_docs):
    """Round-5 stages in one flow: fused tagging → per-source quality
    gate → near-dup clusters → cluster-aware split → curriculum order
    → tokenizer-true token budget. Pins schema/id survival across the
    new operators exactly like the round-4 composition above."""
    from truthound_spark.pipeline.dedup import dedup_clusters
    from truthound_spark.pipeline.export import curriculum_order, split_by_cluster
    from truthound_spark.pipeline.text import quantile_gate, tag_documents
    from truthound_spark.pipeline.tokenizer import bpe_token_counts, bpe_train

    n0 = raw_docs.count()

    # 1. ONE tagging pass provides every downstream signal
    tagged = tag_documents(raw_docs).localCheckpoint(eager=True)
    assert tagged.count() == n0

    # 2. adaptive quality gate on the tagger's composite score
    gated = quantile_gate(tagged, "quality_score", group_col="source", keep_fraction=0.8)
    keep_ids = gated.filter(F.col("kept")).select("id")
    survivors = tagged.join(
        keep_ids.withColumnRenamed("id", "doc_id"), "doc_id"
    )
    n2 = survivors.count()
    assert 0 < n2 <= n0

    # 3. near-dup clusters → leak-proof cluster-aware split
    clusters = dedup_clusters(survivors, threshold=0.7).select(
        F.col("doc_id").alias("id"), "cluster_id"
    )
    split = split_by_cluster(survivors, clusters, val_fraction=0.1)
    assert split.count() == n2
    straddle = (
        split.groupBy("cluster_key")
        .agg(F.countDistinct("side").alias("ns"))
        .filter(F.col("ns") > 1)
        .count()
    )
    assert straddle == 0

    # 4. curriculum order over the train side
    train_ids = split.filter(F.col("side") == "train").select("id")
    train = survivors.join(train_ids.withColumnRenamed("id", "doc_id"), "doc_id")
    ordered = curriculum_order(train, "quality_score", n_bands=3, n_shards=4)
    assert ordered.count() == train.count()

    # 5. tokenizer-true token budget of the final corpus
    merges = bpe_train(train, rounds=4)
    budget = bpe_token_counts(train, merges).agg(F.sum("n_tokens")).collect()[0][0]
    assert budget and budget > 0
