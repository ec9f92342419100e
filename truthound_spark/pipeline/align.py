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
collapses per-partition), and everything downstream runs over ONE
tagged union of the two candidate tables: neighborhood means are
conditional window averages, per-direction argmaxes are rank windows,
and mutual agreement is a pair-count aggregate — a single consumption
of each top-k pass, no join-backs, no self-joins. All cosines are the
same sequential JVM fold as the rest of the similarity module, and the
ranking margin is 1e-6-quantized — deterministic, oracle-certifiable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from truthound_spark.pipeline.similarity import brute_force_topk

__all__ = ["mine_bitext", "mine_hard_negatives", "filter_bitext_pairs"]


def mine_bitext(
    src: DataFrame,
    tgt: DataFrame,
    k: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    min_margin: float | None = None,
    mutual: bool = True,
    persist: bool = False,
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

    Plan (single-consumption — r9 restructure of the r8 audit's last
    multi-scan): two broadcast-query top-k passes (src→tgt, tgt→src)
    feed ONE direction-tagged union; each pass executes exactly once
    (4 FileScans total, down from the 12 the join-back shape re-ran).
    On the union, candidate-sized throughout (≤ (|src|+|tgt|)·k rows):

    * neighborhood means = conditional window averages —
      ``avg(fwd cosine) over (partition by src_id)`` lands nbhd_src on
      the BACKWARD rows of the same src too (and symmetrically for
      nbhd_tgt), which is what made the old shape join back;
    * per-direction argmax = rank windows partitioned (dir, query id);
    * mutual agreement = ``groupBy(src_id, tgt_id) HAVING n_dirs = 2``
      — a mutual pair is nominated once per direction with bit-identical
      cosine/margin (the cosine fold and na·nb product are symmetric),
      so the pair-count aggregate replaces the forward⋈backward
      self-join that re-ran both subtrees.

    Neighborhood means sum 1e-6-quantized cosines (exact longs, order-
    independent), and the margin quantizes before the argmax window, so
    results are reproducible cross-engine.

    ``persist=True`` eagerly materializes the result via
    ``localCheckpoint`` so callers that consume it multiple times
    (count + write, iterative filtering) don't re-run the mining.
    Resident blocks are RESULT-sized (≤ min(|src|,|tgt|) skinny rows,
    not corpus·k candidates) — the bounded version of the r8
    experiment whose candidate-sized checkpoint blocks caused measured
    15-20s spill-stalls in later same-session queries and was reverted.
    Default False: lazily returned, single-consumer plan is already
    single-scan.

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
        F.lit("f").alias("dir"),
    )
    bwd = brute_force_topk(
        src, tgt, k=k, vec_col=vec_col, id_col=id_col,
        query_vec_col=vec_col, query_id_col=id_col, exclude_self=False,
    ).select(
        F.col("query_id").alias("tgt_id"),
        F.col("id").alias("src_id"),
        "cosine",
        F.lit("b").alias("dir"),
    )
    allk = fwd.unionByName(bwd)
    # neighborhood means over exact quantized longs: the sum of k values
    # is order-independent, so nbhd_src/nbhd_tgt hash-match cross-engine.
    # Conditional over the union: only forward rows define a src's
    # neighborhood (resp. backward for a tgt's), but the window attaches
    # the mean to BOTH directions' rows sharing that id — every src_id
    # has k forward rows and every tgt_id k backward rows, so the means
    # are never NULL.
    qcos = F.round(F.col("cosine") * 1e6).cast("long")
    w_src = Window.partitionBy("src_id")
    w_tgt = Window.partitionBy("tgt_id")
    is_f = F.col("dir") == "f"
    scored = allk.select(
        "src_id",
        "tgt_id",
        "cosine",
        "dir",
        (
            F.sum(F.when(is_f, qcos)).over(w_src)
            / F.count(F.when(is_f, F.lit(1))).over(w_src)
            / 1e6
        ).alias("nbhd_src"),
        (
            F.sum(F.when(~is_f, qcos)).over(w_tgt)
            / F.count(F.when(~is_f, F.lit(1))).over(w_tgt)
            / 1e6
        ).alias("nbhd_tgt"),
    ).withColumn(
        "margin",
        F.round(
            F.col("cosine") / ((F.col("nbhd_src") + F.col("nbhd_tgt")) / 2), 6
        ),
    )
    # per-direction argmax: rank inside (dir, query id). Forward rows
    # nominate per src, backward per tgt; partitioning by dir keeps the
    # two rankings from seeing each other's rows.
    wf = Window.partitionBy("dir", "src_id").orderBy(F.desc("margin"), "tgt_id")
    wb = Window.partitionBy("dir", "tgt_id").orderBy(F.desc("margin"), "src_id")
    nominated = scored.withColumn(
        "__rn",
        F.when(is_f, F.row_number().over(wf)).otherwise(F.row_number().over(wb)),
    ).filter(F.col("__rn") == 1)
    if mutual:
        # a mutual pair is nominated by both directions with identical
        # (cosine, margin) — max() just collapses the two copies
        out = (
            nominated.groupBy("src_id", "tgt_id")
            .agg(
                F.round(F.max("cosine"), 6).alias("cosine"),
                F.max("margin").alias("margin"),
                F.count(F.lit(1)).alias("__n_dirs"),
            )
            .filter(F.col("__n_dirs") == 2)
            .drop("__n_dirs")
        )
    else:
        out = nominated.filter(is_f).select(
            "src_id", "tgt_id", F.round("cosine", 6).alias("cosine"), "margin"
        )
    out = out.select("src_id", "tgt_id", "cosine", "margin")
    if min_margin is not None:
        out = out.filter(F.col("margin") >= float(min_margin))
    if persist:
        out = out.localCheckpoint(eager=True)
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


def filter_bitext_pairs(
    pairs: DataFrame,
    src: DataFrame,
    tgt: DataFrame,
    id_col: str = "vec_id",
    text_col: str | None = None,
    len_col: str | None = None,
    max_len_ratio: float = 2.0,
    min_len: int = 1,
    min_margin: float | None = None,
    require_lang_cols: tuple[str, str] | None = None,
) -> DataFrame:
    """CCMatrix-style post-filters over mined pairs (Schwenk et al.
    2021 §3.3: after margin mining, pairs are kept only when their
    lengths are comparable and each side is in its expected language —
    the cheap gates that remove most of the remaining noise before MT
    training).

    ``pairs`` is :func:`mine_bitext` output (src_id, tgt_id, cosine,
    margin). Lengths come from ``len_col`` (precomputed) or
    ``length(text_col)``; the ratio gate keeps pairs with
    max(len)/min(len) <= max_len_ratio and both sides >= min_len.
    ``require_lang_cols=(src_lang, tgt_lang)`` keeps pairs whose side
    tables' language columns differ (a bitext PAIR should be
    cross-lingual; same-language pairs are usually near-duplicates the
    miner mistook for translations). ``min_margin`` re-thresholds.

    Plan: two broadcast-eligible joins of the (skinny) pair table to
    per-id length/lang projections — the corpora are projected to
    (id, len, lang) before joining, so payloads never ride the join;
    everything else is row-local column math. Returns the input
    columns + (src_len, tgt_len, len_ratio)."""
    if max_len_ratio < 1.0:
        raise ValueError(f"max_len_ratio must be >= 1, got {max_len_ratio}")
    if text_col is None and len_col is None:
        raise ValueError("need text_col or len_col to derive lengths")

    def side(df: DataFrame, lang_col: str | None, prefix: str) -> DataFrame:
        length = (
            F.col(len_col).cast("long")
            if len_col is not None
            else F.length(F.col(text_col)).cast("long")
        )
        cols = [F.col(id_col).alias(f"{prefix}_id"), length.alias(f"{prefix}_len")]
        if lang_col is not None:
            cols.append(F.col(lang_col).alias(f"__{prefix}_lang"))
        return df.select(*cols)

    sl, tl = (require_lang_cols or (None, None))
    out = (
        pairs.join(side(src, sl, "src"), "src_id")
        .join(side(tgt, tl, "tgt"), "tgt_id")
        .withColumn(
            "len_ratio",
            F.round(
                F.greatest("src_len", "tgt_len")
                / F.least("src_len", "tgt_len"),
                6,
            ),
        )
        .filter(
            (F.col("src_len") >= min_len)
            & (F.col("tgt_len") >= min_len)
            & (F.col("len_ratio") <= float(max_len_ratio))
        )
    )
    if require_lang_cols is not None:
        out = out.filter(F.col("__src_lang") != F.col("__tgt_lang")).drop(
            "__src_lang", "__tgt_lang"
        )
    if min_margin is not None:
        out = out.filter(F.col("margin") >= float(min_margin))
    return out.select(
        "src_id", "tgt_id", "cosine", "margin", "src_len", "tgt_len", "len_ratio"
    )
