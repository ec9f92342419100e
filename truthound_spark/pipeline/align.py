"""Cross-corpus embedding alignment: margin-based bitext mining.

The LASER/CCMatrix parallel-corpus construction recipe (Artetxe &
Schwenk 2019, arXiv:1811.01136): raw cosine is a poor mining criterion
because some embeddings sit in dense "hub" neighborhoods where every
cosine is high. The margin criterion normalizes each candidate pair's
cosine by the mean cosine of both endpoints' k-NN neighborhoods
(ratio margin), so a pair only wins when it stands OUT of its
neighborhoods — the scoring that made web-scale mined bitext (CCMatrix,
WikiMatrix) usable for MT training.

Spark-first shape: the two corpora never cross-shuffle — both k-NN
passes are the broadcast-query brute-force top-k (WindowGroupLimit
collapses per-partition), neighborhood means are tiny per-id aggregates
joined back by id, and the final argmax is one per-source window. All
cosines are the same sequential JVM fold as the rest of the similarity
module, and the ranking margin is 1e-6-quantized — deterministic,
oracle-certifiable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from truthound_spark.pipeline.similarity import brute_force_topk

__all__ = ["mine_bitext", "mine_hard_negatives"]


def mine_bitext(
    src: DataFrame,
    tgt: DataFrame,
    k: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    min_margin: float | None = None,
    mutual: bool = True,
) -> DataFrame:
    """Mine aligned (src, tgt) pairs by ratio margin over k-NN
    neighborhoods.

    margin(x, y) = cos(x, y) / ((mean_k cos(x, NN_tgt(x)) +
    mean_k cos(y, NN_src(y))) / 2)

    Each src doc nominates its max-margin tgt candidate (ties break by
    tgt id); ``mutual=True`` keeps only pairs where the tgt doc's own
    max-margin src nomination agrees — the forward∩backward rule the
    paper found most precise. ``min_margin`` additionally thresholds
    (the paper's operating points are ~1.04-1.06).

    Plan: two broadcast-query top-k passes (src→tgt, tgt→src) — the
    corpora are scanned, never cross-joined at corpus scale; everything
    after runs on candidate-sized relations (≤ |src|·k rows).
    Neighborhood means sum 1e-6-quantized cosines (exact longs, order-
    independent), and the margin quantizes before the argmax window, so
    results are reproducible cross-engine.

    Returns (src_id, tgt_id, cosine, margin) — margin rounded 6dp."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    fwd = brute_force_topk(
        tgt, src, k=k, vec_col=vec_col, id_col=id_col,
        query_vec_col=vec_col, query_id_col=id_col, exclude_self=False,
    ).select(
        F.col("query_id").alias("src_id"),
        F.col("id").alias("tgt_id"),
        "cosine",
    )
    bwd = brute_force_topk(
        src, tgt, k=k, vec_col=vec_col, id_col=id_col,
        query_vec_col=vec_col, query_id_col=id_col, exclude_self=False,
    ).select(
        F.col("query_id").alias("tgt_id"),
        F.col("id").alias("src_id"),
        "cosine",
    )
    # each k-NN table feeds its neighborhood mean AND the candidate join
    # (forward and backward) — lazy reuse re-runs the top-k passes per
    # consumer (12 scans measured, r8 audit). A localCheckpoint here
    # fixed the scans but left never-unpersisted executor blocks that
    # turned later same-session queries into intermittent 15-20s
    # spill-stalls (measured) — worse than the recompute for a lazily
    # returned relation. At production scale, persist the two candidate
    # tables EXPLICITLY around the call:
    #   fwd.persist(); bwd.persist(); ... ; fwd.unpersist()
    # (candidates are skinny: (id, id, cosine) × corpus·k rows).
    # neighborhood means over exact quantized longs: the sum of k values
    # is order-independent, so avg_src/avg_tgt hash-match cross-engine
    q = lambda c: F.round(F.col(c) * 1e6).cast("long")  # noqa: E731
    avg_src = fwd.groupBy("src_id").agg(
        (F.sum(q("cosine")) / F.count(F.lit(1)) / 1e6).alias("nbhd_src")
    )
    avg_tgt = bwd.groupBy("tgt_id").agg(
        (F.sum(q("cosine")) / F.count(F.lit(1)) / 1e6).alias("nbhd_tgt")
    )
    cand = (
        fwd.join(avg_src, "src_id")
        .join(avg_tgt, "tgt_id")
        .withColumn(
            "margin",
            F.round(
                F.col("cosine") / ((F.col("nbhd_src") + F.col("nbhd_tgt")) / 2),
                6,
            ),
        )
    )
    wf = Window.partitionBy("src_id").orderBy(F.desc("margin"), "tgt_id")
    best_fwd = (
        cand.withColumn("__rn", F.row_number().over(wf))
        .filter(F.col("__rn") == 1)
        .select("src_id", "tgt_id", F.round("cosine", 6).alias("cosine"), "margin")
    )
    if mutual:
        bcand = (
            bwd.join(avg_src, "src_id")
            .join(avg_tgt, "tgt_id")
            .withColumn(
                "margin",
                F.round(
                    F.col("cosine") / ((F.col("nbhd_src") + F.col("nbhd_tgt")) / 2),
                    6,
                ),
            )
        )
        wb = Window.partitionBy("tgt_id").orderBy(F.desc("margin"), "src_id")
        best_bwd = (
            bcand.withColumn("__rn", F.row_number().over(wb))
            .filter(F.col("__rn") == 1)
            .select("tgt_id", F.col("src_id").alias("__b_src"))
        )
        best_fwd = best_fwd.join(best_bwd, "tgt_id").filter(
            F.col("src_id") == F.col("__b_src")
        ).drop("__b_src")
    out = best_fwd.select("src_id", "tgt_id", "cosine", "margin")
    if min_margin is not None:
        out = out.filter(F.col("margin") >= float(min_margin))
    return out


def mine_hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    positives: DataFrame,
    k: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    min_cosine: float | None = None,
    max_cosine: float | None = None,
) -> DataFrame:
    """Hard-negative mining for contrastive/retriever training (the DPR /
    sentence-transformers recipe): for each query, the top-k most similar
    corpus documents that are NOT its labeled positives — the negatives
    that actually move a bi-encoder, unlike random ones.

    ``positives`` is (query_id, id) gold pairs; they are anti-joined out
    BEFORE the rank window, so every returned rank is a usable negative
    (no holes where a positive was removed). The optional
    ``min_cosine``/``max_cosine`` band selects SEMI-hard negatives —
    similar enough to be informative, not so similar they're likely
    unlabeled positives (the false-negative guard production mining
    uses).

    Plan: one broadcast-query scored pass over the corpus (same
    WindowGroupLimit shape as ``brute_force_topk``), one broadcast
    anti-join against the (tiny) gold set, one per-query window. The
    corpus is scanned once and never shuffled beyond the per-query
    top-k rows.

    Returns (query_id, id, cosine, rank), rank 1-based per query."""
    from truthound_spark.pipeline.dedup import cosine_pair, l2_norm

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    c = corpus.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    q = queries.select(
        F.col(query_id_col).cast("long").alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    pos = positives.select(
        F.col(query_id_col).cast("long").alias("query_id"),
        F.col(id_col).cast("long").alias("id"),
    )
    scored = (
        c.withColumn("__na", l2_norm(F.col("v")))
        .crossJoin(F.broadcast(q.withColumn("__nb", l2_norm(F.col("qv")))))
        .select(
            "query_id",
            "id",
            cosine_pair(F.col("v"), F.col("qv"), F.col("__na"), F.col("__nb")).alias(
                "cosine"
            ),
        )
        .join(F.broadcast(pos), ["query_id", "id"], "left_anti")
    )
    if min_cosine is not None:
        scored = scored.filter(F.col("cosine") >= float(min_cosine))
    if max_cosine is not None:
        scored = scored.filter(F.col("cosine") <= float(max_cosine))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "id", F.round("cosine", 6).alias("cosine"),
            F.col("rank").cast("long").alias("rank"),
        )
    )
