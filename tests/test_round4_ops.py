"""Round-4 operators: distributed k-means, SemDeDup semantic dedup,
deterministic global shuffle, embedding-column stats.

kmeans correctness is proven against a pure-numpy Lloyd reference that
replicates the operator's contract (fixed-point quantization, k-lowest-id
init, (dist, cell) argmin tie-break) on seeded random blobs; the other
operators assert exact expected outputs on crafted frames plus the
determinism properties the docstrings promise.
"""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from truthound_spark.pipeline.clustering import kmeans
from truthound_spark.pipeline.dedup import semantic_dedup
from truthound_spark.pipeline.export import global_shuffle
from truthound_spark.pipeline.similarity import embedding_stats


# ---------------------------------------------------------------------------
# kmeans
# ---------------------------------------------------------------------------


def _py_kmeans(rows, k, iters, scale=1e6):
    """Reference Lloyd's under the operator's exact arithmetic contract."""
    pts = [(i, [round(x * scale) for x in xs]) for i, xs in rows]
    d = len(rows[0][1])
    init = sorted(pts)[:k]
    cents = [(ci, [q / scale for q in row[1]]) for ci, row in enumerate(init)]

    def assign_of(p):
        best = None
        for ci, c in cents:
            dist = 0.0
            for j in range(d):
                dist += (p[j] / scale - c[j]) * (p[j] / scale - c[j])
            if best is None or (dist, ci) < best[:2]:
                best = (dist, ci)
        return best[1]

    for _ in range(iters):
        groups: dict[int, list[list[int]]] = {}
        for _i, q in pts:
            groups.setdefault(assign_of(q), []).append(q)
        cents = sorted(
            (
                (ci, [(float(sum(q[j] for q in g)) / float(len(g))) / scale for j in range(d)])
                for ci, g in groups.items()
            ),
            key=lambda t: t[0],
        )
    return {i: assign_of(q) for i, q in pts}


@pytest.mark.parametrize("seed", [1, 7])
def test_kmeans_matches_reference_lloyd(spark, seed):
    rng = random.Random(seed)
    rows = []
    i = 0
    for cx, cy in [(0.0, 0.0), (5.0, 5.0), (-4.0, 3.0)]:
        for _ in range(40):
            rows.append((i, [cx + rng.gauss(0, 0.6), cy + rng.gauss(0, 0.6)]))
            i += 1
    expected = _py_kmeans(rows, k=3, iters=4)
    df = spark.createDataFrame(
        [(i, xs[0], xs[1]) for i, xs in rows], "id long, x0 double, x1 double"
    ).repartition(5)
    assigned, cents = kmeans(df, ["x0", "x1"], k=3, iters=4, id_col="id")
    got = {r["id"]: r["cluster"] for r in assigned.collect()}
    assert got == expected
    # three well-separated blobs must resolve to three distinct clusters
    assert len(set(got.values())) == 3
    assert len(cents) == 3


def test_kmeans_iters_zero_is_init_assignment(spark):
    df = spark.createDataFrame(
        [(1, 0.0), (2, 10.0), (3, 0.1), (4, 9.9)], "id long, x double"
    )
    assigned, cents = kmeans(df, ["x"], k=2, iters=0, id_col="id")
    got = {r["id"]: r["cluster"] for r in assigned.collect()}
    # centroids = points 1 (cell 0) and 2 (cell 1), no update rounds
    assert got == {1: 0, 2: 1, 3: 0, 4: 1}
    assert [c for c, _ in cents] == [0, 1]


def test_kmeans_empty_cluster_drops_out(spark):
    # init takes the 3 lowest ids: duplicate locations (ids 1,2 both at
    # 0.0) mean cell 1 never wins a tie-break — it must vanish from the
    # centroid table without error (no reseeding: determinism over
    # cleverness), and the two real blobs still separate
    df = spark.createDataFrame(
        [(1, 0.0), (2, 0.0), (3, 100.0), (4, 0.2), (5, 99.8)],
        "id long, x double",
    )
    assigned, cents = kmeans(df, ["x"], k=3, iters=3, id_col="id")
    got = {r["id"]: r["cluster"] for r in assigned.collect()}
    assert set(got) == {1, 2, 3, 4, 5}
    assert got[1] == got[2] == got[4] == 0
    assert got[3] == got[5] == 2
    assert [c for c, _ in cents] == [0, 2]  # cell 1 dropped out


def test_kmeans_validates_args(spark):
    df = spark.createDataFrame([(1, 0.0)], "id long, x double")
    with pytest.raises(ValueError):
        kmeans(df, ["x"], k=0)
    with pytest.raises(ValueError):
        kmeans(df, ["x"], k=1, iters=-1)
    with pytest.raises(ValueError):
        kmeans(df, [], k=1)


# ---------------------------------------------------------------------------
# semantic_dedup
# ---------------------------------------------------------------------------


def _vec(angle):
    return [math.cos(angle), math.sin(angle)]


def test_semantic_dedup_drops_higher_id_near_dups(spark):
    # ids 0,1 are centroids (num_cells=2). 10 and 11 are near-identical
    # to 0's direction -> same cell, cosine ~1: 10 survives (lowest of the
    # dup group after 0), everything >= threshold vs a lower id drops.
    rows = [
        (0, _vec(0.0)),
        (1, _vec(math.pi / 2)),
        (10, _vec(0.01)),
        (11, _vec(0.02)),
        (20, _vec(math.pi / 2 + 0.01)),
        (30, _vec(math.pi / 4)),  # between cells, no near-dup
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        r["id"]: (r["cell"], r["keep"])
        for r in semantic_dedup(df, num_cells=2, threshold=0.99).collect()
    }
    assert out[0] == (0, True)
    assert out[1] == (1, True)
    assert out[10][1] is False  # cos(0, 10) ~ 1 > .99, 0 is lower id
    assert out[11][1] is False
    assert out[20] == (1, False)  # dup of centroid 1
    assert out[30][1] is True  # cos(pi/4 vs anything) ~ .92 < .99


def test_semantic_dedup_threshold_gates_drops(spark):
    rows = [(0, _vec(0.0)), (1, _vec(1.5)), (2, _vec(0.3))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    lax = semantic_dedup(df, num_cells=2, threshold=0.9).filter("NOT keep").count()
    strict = semantic_dedup(df, num_cells=2, threshold=0.9999).filter("NOT keep").count()
    assert lax == 1 and strict == 0  # cos(0.3) ~ .955


def test_semantic_dedup_custom_centroids(spark):
    rows = [(5, _vec(0.0)), (6, _vec(math.pi / 2))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = spark.createDataFrame(
        [(100, _vec(0.0)), (200, _vec(math.pi / 2))], "cell long, cv array<double>"
    )
    out = {r["id"]: r["cell"] for r in semantic_dedup(df, centroids=cents).collect()}
    assert out == {5: 100, 6: 200}


# ---------------------------------------------------------------------------
# global_shuffle
# ---------------------------------------------------------------------------


def test_global_shuffle_contiguous_positions_and_determinism(spark):
    df = spark.createDataFrame([(i, f"d{i}") for i in range(200)], "doc_id long, text string")
    out = global_shuffle(df, n_shards=4, key_col="doc_id", seed=3)
    rows = [(r["shard"], r["position"], r["doc_id"]) for r in out.collect()]
    by_shard: dict[int, list[int]] = {}
    for s, p, _ in rows:
        by_shard.setdefault(s, []).append(p)
    assert sum(len(v) for v in by_shard.values()) == 200
    for positions in by_shard.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))
    # layout-independence: a different partitioning yields the SAME permutation
    again = global_shuffle(df.repartition(13), n_shards=4, key_col="doc_id", seed=3)
    assert sorted(rows) == sorted(
        (r["shard"], r["position"], r["doc_id"]) for r in again.collect()
    )
    # a different seed is a different permutation
    other = global_shuffle(df, n_shards=4, key_col="doc_id", seed=4)
    assert sorted(rows) != sorted(
        (r["shard"], r["position"], r["doc_id"]) for r in other.collect()
    )


def test_global_shuffle_validates_args(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        global_shuffle(df, n_shards=0)


# ---------------------------------------------------------------------------
# embedding_stats
# ---------------------------------------------------------------------------


def test_embedding_stats_counts_each_failure_mode(spark):
    nan = float("nan")
    rows = [
        (1, [3.0, 4.0]),       # norm 5
        (2, [0.0, 0.0]),       # zero vector
        (3, [1.0, nan]),       # NaN component
        (4, None),             # null
        (5, [6.0, 8.0, 0.0]),  # dim 3 != expected 2, norm 10
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    r = embedding_stats(df, "embedding", expected_dim=2).collect()[0]
    assert r["n_vectors"] == 5
    assert r["n_null"] == 1
    assert r["n_dim_mismatch"] == 1
    assert r["n_nan"] == 1
    assert r["n_zero"] == 1
    assert r["avg_norm"] == 5.0  # (5 + 0 + 10) / 3
    assert r["min_norm"] == 0.0
    assert r["max_norm"] == 10.0


def test_embedding_stats_infers_max_dim(spark):
    rows = [(1, [1.0, 0.0]), (2, [1.0]), (3, [0.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    r = embedding_stats(df, "embedding").collect()[0]
    assert r["n_dim_mismatch"] == 1
    assert r["avg_norm"] == 1.0


# ---------------------------------------------------------------------------
# incremental_dedup
# ---------------------------------------------------------------------------


def test_incremental_dedup_exact_near_and_kept(spark):
    from truthound_spark.pipeline.dedup import incremental_dedup

    base = spark.createDataFrame(
        [
            (2, "the quick brown fox jumps over the lazy dog again today"),
            (4, "an entirely different historical document about databases"),
            (6, "shared boilerplate text that appears verbatim everywhere"),
        ],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            # exact dup of base 6 (same normalized content)
            (11, "Shared boilerplate text that appears VERBATIM everywhere"),
            # near dup of base 2 (one word changed)
            (13, "the quick brown fox jumps over the lazy cat again today"),
            # genuinely new
            (15, "completely novel content never seen in the base corpus"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["id"]: (r["dup_of"], r["match_kind"])
        for r in incremental_dedup(new, base, threshold=0.5).collect()
    }
    assert out[11] == (6, "exact")
    assert out[13] == (2, "near")
    assert out[15] == (None, None)


def test_incremental_dedup_exact_wins_and_min_base_id(spark):
    from truthound_spark.pipeline.dedup import incremental_dedup

    txt = "identical content in every snapshot of this corpus today"
    base = spark.createDataFrame(
        [(8, txt), (2, txt)], "doc_id long, text string"
    )
    new = spark.createDataFrame([(9, txt)], "doc_id long, text string")
    rows = incremental_dedup(new, base).collect()
    assert [(r["id"], r["dup_of"], r["match_kind"]) for r in rows] == [
        (9, 2, "exact")
    ]


# ---------------------------------------------------------------------------
# kmeans_vec
# ---------------------------------------------------------------------------


def _py_kmeans_vec(rows, k, iters, scale=1e6):
    """Reference Lloyd's for the array-column variant (same contract)."""
    pts = [(i, [round(x * scale) for x in v]) for i, v in rows]
    d = len(rows[0][1])
    cents = [(ci, [q / scale for q in row[1]]) for ci, row in enumerate(sorted(pts)[:k])]

    def assign_of(q):
        x = [qi / scale for qi in q]
        best = None
        for ci, c in cents:
            dxx = 0.0
            for j in range(d):
                dxx += x[j] * x[j]
            dxc = 0.0
            for j in range(d):
                dxc += x[j] * c[j]
            dcc = 0.0
            for j in range(d):
                dcc += c[j] * c[j]
            dist = dxx - 2 * dxc + dcc
            if best is None or (dist, ci) < best[:2]:
                best = (dist, ci)
        return best[1]

    for _ in range(iters):
        groups: dict[int, list[list[int]]] = {}
        for _i, q in pts:
            groups.setdefault(assign_of(q), []).append(q)
        cents = sorted(
            (
                (ci, [(float(sum(q[j] for q in g)) / float(len(g))) / scale for j in range(d)])
                for ci, g in groups.items()
            ),
            key=lambda t: t[0],
        )
    return {i: assign_of(q) for i, q in pts}, cents


def test_kmeans_vec_matches_reference_on_64_dims(spark):
    from truthound_spark.pipeline.clustering import kmeans_vec

    rng = random.Random(11)
    rows = []
    i = 0
    for center in range(3):
        base = [math.sin(center * 7 + j) * 3 for j in range(64)]
        for _ in range(25):
            rows.append((i, [b + rng.gauss(0, 0.3) for b in base]))
            i += 1
    expected, exp_cents = _py_kmeans_vec(rows, k=3, iters=3)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>").repartition(7)
    assigned, cents = kmeans_vec(df, "embedding", k=3, iters=3)
    got = {r["id"]: r["cluster"] for r in assigned.collect()}
    # the equivalence is the contract; how many clusters survive is a
    # property of the data (overlapping blobs may merge — same both sides)
    assert got == expected
    got_cents = {r["cell"]: r["cv"] for r in cents.collect()}
    for ci, cv in exp_cents:
        assert got_cents[ci] == pytest.approx(cv, abs=1e-12)


def test_kmeans_vec_feeds_semantic_dedup(spark):
    """The production SemDeDup path: kmeans_vec centroids -> semantic_dedup.
    Near-identical vectors must land in the same kmeans cell and dedup."""
    from truthound_spark.pipeline.clustering import kmeans_vec

    rows = [
        (0, _vec(0.0)),
        (1, _vec(math.pi / 2)),
        (2, _vec(math.pi)),
        (10, _vec(0.005)),
        (11, _vec(math.pi + 0.005)),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    _, cents = kmeans_vec(df, "embedding", k=3, iters=2)
    out = {
        r["id"]: r["keep"]
        for r in semantic_dedup(df, centroids=cents, threshold=0.99).collect()
    }
    assert out[0] is True and out[1] is True and out[2] is True
    assert out[10] is False and out[11] is False


# ---------------------------------------------------------------------------
# int8 embedding quantization
# ---------------------------------------------------------------------------


def test_quantize_roundtrip_and_recall(spark, sf_dir):
    import os

    from truthound_spark.pipeline.similarity import (
        brute_force_topk,
        dequantize_embeddings,
        quantize_embeddings,
    )

    path = f"{sf_dir}/embeddings.parquet"
    if not os.path.exists(path):
        pytest.skip("embeddings dataset absent")
    emb = spark.read.parquet(path)
    q = quantize_embeddings(emb)
    # codes bounded to int8 symmetric range
    bad = q.filter(
        F.exists(F.col("q"), lambda c: (c < -127) | (c > 127))
    ).count()
    assert bad == 0
    # reconstruction error bounded by scale/2 per component
    deq = dequantize_embeddings(q)
    joined = emb.select(
        F.col("vec_id").cast("long").alias("id"),
        F.col("embedding").cast("array<double>").alias("orig"),
    ).join(deq.select("id", "scale", F.col("embedding").alias("rec")), "id")
    worst = joined.select(
        F.array_max(
            F.zip_with(F.col("orig"), F.col("rec"), lambda a, b: F.abs(a - b))
        ).alias("err"),
        (F.col("scale") / 2 + F.lit(1e-12)).alias("bound"),
    )
    assert worst.filter(F.col("err") > F.col("bound")).count() == 0
    # top-1 recall of dequantized search vs exact search
    queries = emb.filter(F.col("vec_id") < 20)
    exact = {
        r["query_id"]: r["id"]
        for r in brute_force_topk(emb, queries, k=1).collect()
    }
    deq_corpus = deq.select(F.col("id").alias("vec_id"), "embedding")
    approx = {
        r["query_id"]: r["id"]
        for r in brute_force_topk(deq_corpus, queries, k=1).collect()
    }
    agree = sum(1 for k_ in exact if approx.get(k_) == exact[k_])
    assert agree >= len(exact) * 0.8


def test_quantize_zero_vector_guard(spark):
    from truthound_spark.pipeline.similarity import quantize_embeddings

    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, -2.0])], "vec_id long, embedding array<double>"
    )
    rows = {r["id"]: (r["scale"], list(r["q"])) for r in quantize_embeddings(df).collect()}
    assert rows[1] == (0.0, [0, 0])
    assert rows[2][1][1] == -127


# ---------------------------------------------------------------------------
# media dedup (exact payload + perceptual-hash blocking)
# ---------------------------------------------------------------------------


def test_media_exact_and_phash_near_dup(spark):
    from truthound_spark.pipeline.multimodal import (
        fake_perceptual_hash,
        media_exact_duplicates,
        media_near_duplicates,
    )

    rows = [
        (1, bytearray(b"image-bytes-alpha")),
        (2, bytearray(b"image-bytes-alpha")),  # byte-identical re-fetch
        (3, bytearray(b"image-bytes-beta")),
        (4, bytearray(b"image-bytes-gamma")),
    ]
    df = spark.createDataFrame(rows, "asset_id long, payload binary")
    groups = media_exact_duplicates(df).collect()
    assert len(groups) == 1
    assert groups[0]["dup_count"] == 2 and list(groups[0]["asset_ids"]) == [1, 2]

    pairs = media_near_duplicates(df).collect()
    assert [(p["id_a"], p["id_b"], p["hamming"]) for p in pairs] == [(1, 2, 0)]

    # a custom phash column wires through: force two assets to hamming 1
    sig = F.when(F.col("asset_id") == 3, F.lit(0b1001))
    sig = sig.when(F.col("asset_id") == 4, F.lit(0b1000)).otherwise(
        fake_perceptual_hash(F.col("payload"))
    )
    pairs2 = media_near_duplicates(df, phash_col=sig.cast("long")).collect()
    got = {(p["id_a"], p["id_b"]): p["hamming"] for p in pairs2}
    assert got[(3, 4)] == 1 and got[(1, 2)] == 0


def test_fake_phash_is_positive_63bit(spark):
    from truthound_spark.pipeline.multimodal import fake_perceptual_hash

    df = spark.createDataFrame(
        [(i, bytearray(f"payload-{i}".encode())) for i in range(50)],
        "asset_id long, payload binary",
    )
    sigs = df.select(fake_perceptual_hash(F.col("payload")).alias("s")).collect()
    for r in sigs:
        assert 0 <= r["s"] < (1 << 63)


# ---------------------------------------------------------------------------
# BM25 retrieval
# ---------------------------------------------------------------------------


def test_bm25_ranks_relevant_docs_first(spark):
    from truthound_spark.pipeline.retrieval import bm25_search

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "a fast auburn fox leaps above a sleepy canine"),
            (3, "quantum entanglement in superconducting qubits"),
            (4, "the dog sleeps while the fox runs through the forest"),
        ],
        "doc_id long, text string",
    )
    qs = spark.createDataFrame(
        [(100, "fox dog"), (200, "quantum qubits")], "query_id long, text string"
    )
    out = {
        (r["query_id"], r["rank"]): r["doc_id"]
        for r in bm25_search(docs, qs, k=3).collect()
    }
    # both fox+dog docs outrank the fox-only doc; quantum query hits doc 3 only
    assert {out[(100, 1)], out[(100, 2)]} == {1, 4}
    assert out[(100, 3)] == 2
    assert out[(200, 1)] == 3 and (200, 2) not in out


def test_bm25_rare_terms_outweigh_common(spark):
    from truthound_spark.pipeline.retrieval import bm25_search

    docs = spark.createDataFrame(
        [(i, "common words everywhere in all documents") for i in range(9)]
        + [(9, "common words everywhere plus the rare zyzzyva")],
        "doc_id long, text string",
    )
    qs = spark.createDataFrame([(1, "zyzzyva common")], "query_id long, text string")
    top = bm25_search(docs, qs, k=1).collect()[0]
    assert top["doc_id"] == 9 and top["score"] > 0


def test_bm25_self_retrieval_and_determinism(spark, sf_dir):
    import os

    from truthound_spark.pipeline.retrieval import bm25_search

    path = f"{sf_dir}/documents.parquet"
    if not os.path.exists(path):
        pytest.skip("documents dataset absent")
    docs = spark.read.parquet(path)
    qs = docs.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"), "text"
    )
    out = bm25_search(docs, qs, k=3, query_id_col="query_id")
    rows = sorted(
        (r["query_id"], r["rank"], r["doc_id"], r["score"]) for r in out.collect()
    )
    # a query made of a doc's own text retrieves that doc or one of its
    # seeded near-duplicates at the top — the doc itself is in the top 3
    for qid in (0, 1, 2):
        hits = [r[2] for r in rows if r[0] == qid]
        assert qid in hits, (qid, hits)
    again = bm25_search(docs.repartition(13), qs, k=3, query_id_col="query_id")
    assert rows == sorted(
        (r["query_id"], r["rank"], r["doc_id"], r["score"]) for r in again.collect()
    )


# ---------------------------------------------------------------------------
# span-level decontamination
# ---------------------------------------------------------------------------


def test_decontaminate_spans_surgical_removal(spark):
    from truthound_spark.pipeline.dedup import decontaminate_spans

    train = spark.createDataFrame(
        [
            (1, "intro words THEN the secret eval answer is forty two exactly HERE plus clean tail text"),
            (2, "totally clean document with nothing shared at all"),
            (3, None),
        ],
        "doc_id long, text string",
    )
    test = spark.createDataFrame(
        [(9, "the secret eval answer is forty two exactly")],
        "doc_id long, text string",
    )
    out = {r["id"]: r for r in decontaminate_spans(train, test, n=5).collect()}
    # the full 8-token contaminated run is excised (overlapping 5-gram
    # windows union into one span); original casing survives elsewhere
    assert out[1]["text"] == "intro words THEN HERE plus clean tail text"
    assert out[1]["removed_tokens"] == 8
    assert out[2]["removed_tokens"] == 0
    assert out[2]["text"] == "totally clean document with nothing shared at all"
    assert out[3]["total_tokens"] == 0 and out[3]["text"] == ""


def test_decontaminate_spans_normalized_matching(spark):
    from truthound_spark.pipeline.dedup import decontaminate_spans

    train = spark.createDataFrame(
        [(1, "The SECRET, eval! answer; is FORTY two... and more words beyond")],
        "doc_id long, text string",
    )
    test = spark.createDataFrame(
        [(9, "the secret eval answer is forty two")], "doc_id long, text string"
    )
    out = decontaminate_spans(train, test, n=7).collect()[0]
    # punctuation/casing differences don't hide the overlap
    assert out["removed_tokens"] == 7
    assert out["text"] == "and more words beyond"


def test_corpus_diff_statuses(spark):
    from truthound_spark.pipeline.dedup import corpus_diff

    old = spark.createDataFrame(
        [(1, "alpha text"), (2, "beta text"), (3, "gamma text")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "alpha text"), (2, "beta text CHANGED"), (4, "delta text")],
        "doc_id long, text string",
    )
    got = {r["id"]: r["status"] for r in corpus_diff(old, new).collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def test_ngram_novelty_separates_copies_from_originals(spark):
    from truthound_spark.pipeline.text import ngram_novelty

    rows = [
        (1, "completely original text about distributed query optimization strategies"),
        (2, "the shared boilerplate sentence appears in multiple documents here"),
        (3, "the shared boilerplate sentence appears in multiple documents here"),
        (4, "x"),  # too short for a 3-gram? (single word -> 1 shingle of itself)
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["id"]: r for r in ngram_novelty(df, n=3).collect()}
    assert got[1]["novelty"] == 1.0
    assert got[2]["novelty"] == 0.0 and got[3]["novelty"] == 0.0
    assert got[5]["n_grams"] == 0 and got[5]["novelty"] == 0.0
    # doc 4: one single-word shingle unique to it
    assert got[4]["n_grams"] == 1 and got[4]["novelty"] == 1.0


def test_ngram_novelty_plan_has_no_window(spark):
    """ADVICE r13: the gram-frequency path must be a groupBy (map-side
    partial agg; a hot stop-word gram collapses to one partial row per
    task), never a count window over partitionBy(gram) — window
    exchanges get no AQE skew splitting, so one corpus-common trigram
    serialized the stage."""
    from truthound_spark.pipeline.text import ngram_novelty

    df = spark.createDataFrame(
        [(i, f"some text body {i % 3}") for i in range(30)],
        "doc_id long, text string",
    )
    out = ngram_novelty(df, n=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    # and the single tokenize pass is persisted, not re-evaluated
    assert "InMemoryTableScan" in plan or "TableCacheQueryStage" in plan
    from truthound_spark.pipeline.dedup import release_dedup_caches

    out.collect()
    assert release_dedup_caches() >= 1


def test_bigram_perplexity_orders_gibberish_above_fluent(spark):
    from truthound_spark.pipeline.text import bigram_perplexity

    fluent = "the cat sat on the mat and then the cat sat on the mat again"
    rows = [(i, fluent) for i in range(10)]
    rows.append((90, "zqx wvu bnm plo ikj uhy tgb rfv edc wsx"))
    rows.append((91, None))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["id"]: r for r in bigram_perplexity(df).collect()}
    fluent_ppl = got[0]["perplexity"]
    assert got[90]["perplexity"] > fluent_ppl  # unseen bigrams cost more
    assert got[91]["n_bigrams"] == 0 and got[91]["perplexity"] is None
    # repeated fluent docs all share the same score (same bigrams)
    assert len({got[i]["perplexity"] for i in range(10)}) == 1


def test_evaluate_recall_against_exact_topk(spark, sf_dir):
    import os

    from truthound_spark.pipeline.similarity import (
        brute_force_topk,
        evaluate_recall,
        lsh_topk,
    )

    path = f"{sf_dir}/embeddings.parquet"
    if not os.path.exists(path):
        pytest.skip("embeddings dataset absent")
    emb = spark.read.parquet(path)
    qs = emb.filter(F.col("vec_id") < 5)
    exact = brute_force_topk(emb, qs, k=5)
    approx = lsh_topk(emb, qs, k=5, num_planes=4)
    rep = {r[0]: (r["hits"], r["expected"], r["recall"]) for r in evaluate_recall(approx, exact, id_col="id").collect()}
    overall = rep["__overall__"]
    assert overall[1] == 25  # 5 queries x k=5 expected
    assert 0.0 <= overall[2] <= 1.0
    # identity check: exact vs itself is perfect
    perfect = {r[0]: r["recall"] for r in evaluate_recall(exact, exact, id_col="id").collect()}
    assert perfect["__overall__"] == 1.0


# ---------------------------------------------------------------------------
# self_dedup_spans (within-corpus repeated-span excision)
# ---------------------------------------------------------------------------


def test_self_dedup_spans_owner_keeps_span(spark):
    from truthound_spark.pipeline.dedup import self_dedup_spans

    boiler = "all rights reserved by the example corporation"  # 7 tokens
    docs = spark.createDataFrame(
        [
            (1, f"alpha beta {boiler} gamma"),
            (2, f"delta epsilon {boiler} zeta eta"),
            (3, "totally unique text with no repeats at all"),
        ],
        ["doc_id", "text"],
    )
    out = {r["id"]: r for r in self_dedup_spans(docs, n=7).collect()}
    # doc 1 owns the first (id,start)-ordered occurrence: text unchanged
    assert out[1]["removed_tokens"] == 0
    assert out[1]["text"] == f"alpha beta {boiler} gamma"
    # doc 2 loses exactly the 7-token duplicated span
    assert out[2]["removed_tokens"] == 7
    assert out[2]["text"] == "delta epsilon zeta eta"
    # unique doc untouched
    assert out[3]["removed_tokens"] == 0
    assert out[3]["text"] == "totally unique text with no repeats at all"


def test_self_dedup_spans_overlapping_windows_merge(spark):
    from truthound_spark.pipeline.dedup import self_dedup_spans

    # 5 shared tokens with n=4 -> two overlapping duplicated windows in
    # doc 2 merge into ONE maximal 5-token excision (position union).
    shared = "one two three four five"
    docs = spark.createDataFrame(
        [(1, f"{shared} tail"), (2, f"head {shared}")], ["doc_id", "text"]
    )
    out = {r["id"]: r for r in self_dedup_spans(docs, n=4).collect()}
    assert out[1]["removed_tokens"] == 0
    assert out[2]["removed_tokens"] == 5
    assert out[2]["text"] == "head"


def test_self_dedup_spans_normalized_matching(spark):
    from truthound_spark.pipeline.dedup import self_dedup_spans

    # punctuation/case differences don't protect the duplicate; the
    # ORIGINAL tokens are what get removed/kept.
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over it"),
            (2, "intro The, Quick! Brown; Fox? jumps... OVER outro"),
        ],
        ["doc_id", "text"],
    )
    out = {r["id"]: r for r in self_dedup_spans(docs, n=6).collect()}
    assert out[1]["removed_tokens"] == 0
    assert out[2]["removed_tokens"] == 6
    assert out[2]["text"] == "intro outro"


# ---------------------------------------------------------------------------
# semantic_decontaminate (embedding-space decontamination)
# ---------------------------------------------------------------------------


def test_semantic_decontaminate_flags_similar_vectors(spark):
    from truthound_spark.pipeline.dedup import semantic_decontaminate

    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),   # identical to probe 100
            (2, [0.9, 0.1, 0.0]),   # near probe 100 (cos ~0.994)
            (3, [0.0, 0.0, 1.0]),   # orthogonal to both probes
            (4, [0.0, 1.0, 0.0]),   # identical to probe 101
        ],
        ["vec_id", "embedding"],
    )
    probe = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0]), (101, [0.0, 1.0, 0.0])],
        ["vec_id", "embedding"],
    )
    out = {r["id"]: r for r in semantic_decontaminate(corpus, probe, threshold=0.9).collect()}
    assert set(out) == {1, 2, 4}
    assert out[1]["n_matches"] == 1 and out[1]["max_cosine"] == 1.0
    assert out[2]["n_matches"] == 1 and out[2]["max_cosine"] > 0.99
    assert out[4]["n_matches"] == 1 and out[4]["max_cosine"] == 1.0


def test_semantic_decontaminate_broadcasts_probe(spark):
    from truthound_spark.pipeline.dedup import semantic_decontaminate

    corpus = spark.createDataFrame([(1, [1.0, 0.0])], ["vec_id", "embedding"])
    probe = spark.createDataFrame([(2, [1.0, 0.0])], ["vec_id", "embedding"])
    plan = semantic_decontaminate(corpus, probe)._jdf.queryExecution().executedPlan().toString()
    # probe rides a broadcast nested-loop join: the corpus side never shuffles
    assert "BroadcastNestedLoopJoin" in plan


# ---------------------------------------------------------------------------
# product quantization (Jégou et al. 2011)
# ---------------------------------------------------------------------------


def _pq_blobs(spark, seed=7):
    rng = random.Random(seed)
    rows = []
    for i in range(30):
        center = [0.0, 0.0, 10.0, 10.0] if i % 2 == 0 else [10.0, 10.0, 0.0, 0.0]
        rows.append((i, [c + rng.uniform(-0.5, 0.5) for c in center]))
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_pq_encode_matches_trainer_assignment(spark):
    from pyspark.sql import functions as F
    from truthound_spark.pipeline.clustering import kmeans_vec
    from truthound_spark.pipeline.similarity import pq_encode, pq_train

    df = _pq_blobs(spark)
    books = pq_train(df, m=2, k=2, iters=2)
    codes = {r["id"]: list(r["codes"]) for r in pq_encode(df, books).collect()}
    for s in range(2):
        sub = df.select(
            "vec_id", F.slice(F.col("embedding").cast("array<double>"), s * 2 + 1, 2).alias("embedding")
        )
        assigned, _ = kmeans_vec(sub, k=2, iters=2)
        for r in assigned.collect():
            assert codes[r["id"]][s] == r["cluster"]


def test_pq_search_separated_clusters(spark):
    from pyspark.sql import functions as F
    from truthound_spark.pipeline.similarity import pq_search, pq_train

    df = _pq_blobs(spark)
    books = pq_train(df, m=2, k=2, iters=2)
    queries = df.filter(F.col("vec_id") < 2).withColumnRenamed("vec_id", "query_id")
    out = pq_search(df, queries, books, k=10).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r["id"])
    # query 0 is even (cluster A) -> all top-10 even ids; query 1 odd -> odd ids
    assert all(i % 2 == 0 for i in by_q[0])
    assert all(i % 2 == 1 for i in by_q[1])


def test_pq_train_validates_divisibility(spark):
    from truthound_spark.pipeline.similarity import pq_train

    df = spark.createDataFrame([(1, [1.0, 2.0, 3.0])], ["vec_id", "embedding"])
    with pytest.raises(ValueError):
        pq_train(df, m=2, k=2, iters=1)


def test_dedup_keep_best_prefers_high_quality_member(spark):
    from truthound_spark.pipeline.dedup import dedup_keep_best

    base = ("the quick brown fox jumps over the lazy dog while rain falls "
            "gently on the quiet green meadow beside the old stone bridge")
    docs = spark.createDataFrame(
        [
            (1, base + " 111 222 333 444 555"),   # digit-heavy -> lower quality
            (2, base + " and calm winds drift"),  # clean near-dup -> higher quality
            (3, "entirely different text about query engines and columnar storage"),
        ],
        ["doc_id", "text"],
    )
    out = {r["id"]: r for r in dedup_keep_best(docs, threshold=0.5).collect()}
    # docs 1 and 2 cluster together; the cleaner doc 2 wins despite higher id
    assert out[1]["cluster_id"] == out[2]["cluster_id"]
    assert out[2]["keep"] and not out[1]["keep"]
    assert out[2]["score"] > out[1]["score"]
    # singleton keeps itself
    assert out[3]["keep"]


def test_dedup_keep_best_with_explicit_score(spark):
    from truthound_spark.pipeline.dedup import dedup_keep_best

    t1 = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [(1, t1, 0.2), (2, t1 + " iota", 0.9)], ["doc_id", "text", "s"]
    )
    out = {r["id"]: r["keep"] for r in dedup_keep_best(docs, score_col="s", threshold=0.5).collect()}
    assert out == {1: False, 2: True}


# ---------------------------------------------------------------------------
# set_similarity_join (SSJoin/PPJoin prefix filtering)
# ---------------------------------------------------------------------------


def test_set_similarity_join_equals_brute_force(spark):
    from truthound_spark.pipeline.dedup import set_similarity_join

    rng = random.Random(11)
    vocab = [f"t{i}" for i in range(40)]
    rows = []
    for i in range(60):
        base = rng.sample(vocab, rng.randint(4, 12))
        rows.append((i, base))
        if i % 3 == 0:  # seeded near-dups: drop/add one element
            mutated = base[:-1] + [rng.choice(vocab)]
            rows.append((1000 + i, mutated))
    df = spark.createDataFrame(rows, ["doc_id", "s"])

    for t in (0.5, 0.8):
        got = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in set_similarity_join(df, "s", "doc_id", threshold=t).collect()
        }
        sets = {i: set(s) for i, s in rows}
        ids = sorted(sets)
        expect = {}
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                a, b = sets[ids[x]], sets[ids[y]]
                inter = len(a & b)
                j = round(inter / (len(a) + len(b) - inter), 6)
                if j >= t:
                    expect[(ids[x], ids[y])] = j
        assert got == expect, f"threshold {t}: mismatch"


def test_set_similarity_join_validates_threshold(spark):
    from truthound_spark.pipeline.dedup import set_similarity_join

    df = spark.createDataFrame([(1, ["a"])], ["doc_id", "s"])
    with pytest.raises(ValueError):
        set_similarity_join(df, "s", threshold=0.0)
