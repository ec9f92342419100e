"""Training-data export operators: sharding, packing, streaming dedup.

The last mile of a 100 TB pretraining pipeline (BASELINE.json north star:
"operations a large-scale training-data pipeline would need"):

* ``shard_by_hash``      — deterministic hash-sharding so a document always
                           lands in the same shard across reruns (stable
                           train/validation splits, resumable exports);
* ``write_shards``       — size-balanced parquet layout: one shuffle to
                           ``n_shards`` partitions, one file per shard;
* ``pack_sequences``     — greedy token-budget packing (pretraining sample
                           packing) via applyInPandas, shard-local so no
                           cross-partition coordination;
* ``train_val_split``    — leak-proof split on the SAME hash (a near-dup of
                           a train doc can never fall into validation when
                           splits follow the content fingerprint);
* ``streaming_dedup``    — exactly-once streaming ingestion dedup with
                           ``dropDuplicatesWithinWatermark`` (RocksDB/HDFS
                           state store holds only fingerprints within the
                           watermark horizon — bounded state at any rate).

Everything here is JVM-side column math except the packing UDF (Arrow
batches, shard-local greedy loop — the one genuinely imperative step).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from truthound_spark.pipeline.dedup import content_fingerprint
from truthound_spark.pipeline.text import bpe_ish_token_count


def md5_bucket6(col, n: int):
    """First 6 md5 hex digits of ``col`` (a string Column) as a long,
    mod ``n`` — THE engine-portable bucket/shard idiom shared by
    global_shuffle / split_by_cluster / repetition_plan /
    curriculum_order (DuckDB spells it
    ``CAST(('0x'||substr(md5(x),1,6)) AS BIGINT) %% n``). One definition
    so the arithmetic can never drift between operators."""
    return F.conv(F.substring(F.md5(col), 1, 6), 16, 10).cast("long") % F.lit(n)


def shard_by_hash(
    df: DataFrame,
    n_shards: int,
    key_col: str = "doc_id",
    shard_col: str = "shard",
) -> DataFrame:
    """Stable shard id = xxhash64(key) mod n_shards.

    Content-independent of cluster layout: reruns, repartitions, and scale
    changes never move a document between shards. ``pmod`` keeps negative
    hashes in [0, n_shards)."""
    return df.withColumn(
        shard_col, F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_shards)).cast("int")
    )


def write_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    key_col: str = "doc_id",
    mode: str = "overwrite",
) -> None:
    """Size-balanced sharded parquet export.

    ``repartitionByRange(n_shards, shard)`` is ONE shuffle whose range
    boundaries put each shard value in its own task (plain
    ``repartition(n, col)`` hash-partitions the VALUE, colliding ~1/e of
    shards into shared tasks and leaving others empty), so each task
    writes one shard file under ``shard=k/`` (partition pruning on read).
    At 100 TB pick n_shards so each shard is 0.5–2 GB — the parquet sweet
    spot for downstream loaders."""
    sharded = shard_by_hash(df, n_shards, key_col)
    (
        sharded.repartitionByRange(n_shards, F.col("shard"))
        .write.mode(mode)
        .partitionBy("shard")
        .parquet(path)
    )


def train_val_split(
    df: DataFrame,
    val_fraction: float = 0.01,
    text_col: str = "text",
    buckets: int = 10_000,
) -> tuple[DataFrame, DataFrame]:
    """Leak-proof content-hash split: bucket = xxhash64(fingerprint) mod
    buckets; validation = first ``val_fraction`` of buckets. Exact
    duplicates (same normalized content) always land on the SAME side —
    the split a row-random ``randomSplit`` cannot guarantee."""
    if val_fraction < 0 or val_fraction >= 1:
        raise ValueError(f"val_fraction must be in [0, 1), got {val_fraction}")
    # floor at 1 bucket so a tiny fraction can't silently yield an EMPTY
    # validation set (int() would truncate e.g. 0.5 buckets to 0)
    cutoff = max(1, int(buckets * val_fraction)) if val_fraction > 0 else 0
    b = F.pmod(F.xxhash64(content_fingerprint(F.col(text_col))), F.lit(buckets))
    with_b = df.withColumn("__b", b)
    train = with_b.filter(F.col("__b") >= cutoff).drop("__b")
    val = with_b.filter(F.col("__b") < cutoff).drop("__b")
    return train, val


def split_by_cluster(
    df: DataFrame,
    clusters: DataFrame,
    val_fraction: float = 0.01,
    id_col: str = "doc_id",
    buckets: int = 10_000,
) -> DataFrame:
    """NEAR-DUP-AWARE leak-proof split: the whole duplicate CLUSTER goes
    to one side. ``train_val_split`` already pins exact duplicates
    together (content hash), but two near-duplicate documents hash
    differently and can still straddle the split — the classic silent
    eval leak. Here the split key is the document's cluster id from
    :func:`truthound_spark.pipeline.dedup.dedup_clusters` (or any
    (id/doc_id, cluster_id) frame, e.g. semantic cells), so everything
    the dedup pass considers "the same document" lands on the same side;
    docs absent from the cluster frame (singletons) key on their own id.

    The bucket is md5-derived (first 6 hex digits of ``md5(cluster_key)``
    mod ``buckets`` — same engine-portable arithmetic as
    ``global_shuffle``), so membership is exactly reproducible across
    reruns AND engines — the oracle certifies the exact assignment, not
    just invariants.

    Scale: one equi-join against the (small, pair-derived) cluster frame
    + map-side arithmetic; the corpus is never shuffled.

    Returns (id, cluster_key, side) with side ∈ {'train', 'val'}."""
    if val_fraction < 0 or val_fraction >= 1:
        raise ValueError(f"val_fraction must be in [0, 1), got {val_fraction}")
    cutoff = max(1, int(buckets * val_fraction)) if val_fraction > 0 else 0
    cid = "id" if "id" in clusters.columns else id_col
    c = clusters.select(
        F.col(cid).cast("long").alias("__k"),
        F.col("cluster_id").cast("long").alias("__cluster"),
    )
    base = df.select(F.col(id_col).cast("long").alias("id"))
    joined = base.join(c, base["id"] == c["__k"], "left")
    key = F.coalesce(F.col("__cluster"), F.col("id"))
    b = md5_bucket6(key.cast("string"), buckets)
    return joined.select(
        "id",
        key.alias("cluster_key"),
        F.when(b < cutoff, F.lit("val")).otherwise(F.lit("train")).alias("side"),
    )


def pack_sequences(
    df: DataFrame,
    max_tokens: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_shards: int | None = None,
    token_count: "F.Column | str | None" = None,
) -> DataFrame:
    """Greedy sample packing: concatenate documents into bins of at most
    ``max_tokens`` (by the BPE-ish token estimate), shard-locally.

    Plan: ONE range shuffle puts each shard value in its own task
    (``repartitionByRange(n, shard)`` — the same 1:1 shard/task trick as
    ``write_shards``; a ``groupBy(shard)`` hash shuffle instead collides
    ~1/e of shards into shared tasks, leaving others idle and the collided
    ones straggling), then an Arrow-batched mapInPandas greedy first-fit
    pass per shard — the classic packing used to build pretraining
    batches. Returns (shard, bin_id, doc_ids, total_tokens).

    Cross-shard packing would need a global sort + sequential scan; greedy
    per-shard loses <1/max_tokens of fill on real corpora and keeps the
    operator embarrassingly parallel at any scale.

    Null text counts as 0 tokens (the document is still packed); ids keep
    their input type (string ids work — ``doc_ids`` takes the id column's
    element type).

    ``token_count``: override the BPE-ish estimate with any token-count
    Column or column name — e.g. ``tokenizer.bpe_token_count_expr(...)``
    for TOKENIZER-TRUE packing, so bin budgets match what the trainer
    actually sees."""
    import pandas as pd

    n = n_shards or max(df.sparkSession.sparkContext.defaultParallelism, 1)
    id_type = df.schema[id_col].dataType.simpleString()
    if token_count is None:
        tok = bpe_ish_token_count(F.col(text_col))
    elif isinstance(token_count, str):
        tok = F.col(token_count)
    else:
        tok = token_count
    prepped = shard_by_hash(df, n, key_col=id_col).select(
        "shard",
        F.col(id_col).alias("id"),
        F.coalesce(tok.cast("int"), F.lit(0)).alias("tokens"),
    )

    def pack_partition(iterator):
        # a partition streams in as multiple Arrow batches that can split
        # a shard — concat before packing (a partition is one shard's
        # (id, tokens) pairs: small even when its documents are not)
        chunks = list(iterator)
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True)
        out_rows: list[dict] = []
        for shard, g in pdf.groupby("shard", sort=True):
            g = g.sort_values("id")
            cur_ids: list = []
            cur_tok = 0
            bin_id = 0
            for doc_id, tokens in g[["id", "tokens"]].itertuples(index=False, name=None):
                t = min(int(tokens), max_tokens)
                if cur_tok + t > max_tokens and cur_ids:
                    out_rows.append(
                        {"shard": int(shard), "bin_id": bin_id, "doc_ids": cur_ids, "total_tokens": cur_tok}
                    )
                    bin_id += 1
                    cur_ids, cur_tok = [], 0
                cur_ids.append(doc_id)
                cur_tok += t
            if cur_ids:
                out_rows.append(
                    {"shard": int(shard), "bin_id": bin_id, "doc_ids": cur_ids, "total_tokens": cur_tok}
                )
        yield pd.DataFrame(
            out_rows, columns=["shard", "bin_id", "doc_ids", "total_tokens"]
        )

    return prepped.repartitionByRange(n, "shard").mapInPandas(
        pack_partition,
        schema=f"shard int, bin_id int, doc_ids array<{id_type}>, total_tokens int",
    )


def streaming_dedup(
    stream_df: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Exactly-once ingestion dedup for document streams.

    ``dropDuplicatesWithinWatermark`` on the content fingerprint keeps ONLY
    fingerprints newer than the watermark in the state store (RocksDB at
    scale) — bounded state regardless of stream length, unlike a plain
    ``dropDuplicates`` whose state grows forever. Late duplicates beyond
    the horizon are an accepted miss — the same trade every streaming
    dedup at this scale makes."""
    with_fp = stream_df.withColumn(
        "__fp", content_fingerprint(F.col(text_col))
    ).withWatermark(ts_col, watermark)
    return with_fp.dropDuplicatesWithinWatermark(["__fp"]).drop("__fp")


def stratified_sample(
    df: DataFrame,
    group_col: str = "source",
    k_per_group: int | None = None,
    fractions: dict[str, float] | None = None,
    key_col: str = "doc_id",
) -> DataFrame:
    """Deterministic stratified sampling — the data-mixing primitive.

    Two modes (exactly one):

    * ``k_per_group`` — quota sampling: the k docs per group that sort
      first by ``md5(key)`` (an engine-portable pseudo-random order, so
      the sample is reproducible across reruns AND engines). Spark plans
      the row_number window as a WindowGroupLimit: the per-group limit is
      applied map-side before the shuffle, so a billion-doc group ships
      ~k rows per input partition, not the group.
    * ``fractions`` — per-group rate sampling: keep iff
      ``pmod(xxhash64(key), 1e6) < rate·1e6``. Pure map-side column math —
      NO shuffle at all, the right mode for 100 TB mixing by rate.
    """
    if (k_per_group is None) == (fractions is None):
        raise ValueError("exactly one of k_per_group / fractions is required")
    if k_per_group is not None:
        from pyspark.sql import Window

        w = Window.partitionBy(group_col).orderBy(
            F.md5(F.col(key_col).cast("string")), F.col(key_col)
        )
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k_per_group)
            .drop("__rn")
        )
    bad = {g: r for g, r in fractions.items() if not 0.0 <= r <= 1.0}
    if bad:
        raise ValueError(f"fractions must be in [0,1]: {bad}")
    denom = 1_000_000
    rate_map = F.create_map(
        *[x for g, r in sorted(fractions.items()) for x in (F.lit(g), F.lit(float(r)))]
    )
    rate = F.coalesce(F.element_at(rate_map, F.col(group_col)), F.lit(0.0))
    keep = F.pmod(F.xxhash64(F.col(key_col)), F.lit(denom)) < (rate * denom)
    return df.filter(keep)


def global_shuffle(
    df: DataFrame,
    n_shards: int = 1024,
    key_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Deterministic global training-order shuffle — the "randomize the
    corpus before training" step, reproducible across reruns, engines,
    and cluster layouts.

    Order key = ``md5(seed || ':' || key)``: cryptographic diffusion makes
    the order indistinguishable from random w.r.t. any data attribute, yet
    a (seed, key) pair always lands at the same position — resumable
    exports, auditable sample order, and a different ``seed`` gives an
    independent epoch order. shard = first 6 hex digits mod n_shards
    (uniform), position = rank of the order key within the shard; the
    training loader reads shards in index order, rows by position, for the
    full deterministic permutation.

    Scale: ONE shuffle keyed by shard + an in-shard sort (the window's
    rank is per-shard, never global — a global row_number would serialize
    on one task at 100 TB). n_shards bounds per-task sort memory: pick
    corpus_size / n_shards ≈ 0.5–2 GB.

    Returns df + (shard int, position long) — sort key (shard, position).
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    from pyspark.sql import Window

    okey = F.md5(F.concat(F.lit(str(seed)), F.lit(":"), F.col(key_col).cast("string")))
    shard = (F.conv(F.substring(okey, 1, 6), 16, 10).cast("long") % n_shards).cast("int")  # = md5_bucket6 on the precomputed okey
    w = Window.partitionBy("shard").orderBy(F.col("__okey"), F.col(key_col))
    return (
        df.withColumn("__okey", okey)
        .withColumn("shard", shard)
        .withColumn("position", F.row_number().over(w).cast("long"))
        .drop("__okey")
    )



def temperature_weights(
    df: DataFrame,
    alpha: float = 0.3,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Temperature-based mixture weights (the mT5/XLM-R multilingual
    recipe, arXiv:1910.10683 / 1911.02116): w_g proportional to
    available_tokens_g ** alpha. alpha=1 reproduces natural proportions,
    alpha -> 0 approaches uniform — the standard knob for up-weighting
    low-resource sources without hand-tuning per-source targets. Feed the
    result straight into ``mixture_weights`` /
    ``stratified_sample(fractions=...)``.

    Determinism: the powered sizes are quantized to 1e-6 longs before the
    cross-group normalization sum, so the denominator is exact and
    addition-order-independent — weights hash-match across engines.

    One fused aggregate over the corpus; the normalization runs on the
    tiny per-group relation (broadcast 1-row join).

    Returns (group, available_tokens, weight) with weights summing to 1
    (up to 6dp rounding)."""
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    from truthound_spark.pipeline.text import bpe_ish_token_count

    avail = df.groupBy(group_col).agg(
        F.sum(bpe_ish_token_count(F.col(text_col))).cast("long").alias(
            "available_tokens"
        )
    )
    qpow = F.round(
        F.pow(F.col("available_tokens").cast("double"), F.lit(float(alpha))) * 1e6
    ).cast("long")
    powed = avail.withColumn("__qp", qpow)
    tot = powed.agg(F.sum("__qp").alias("__tot"))
    return (
        powed.join(F.broadcast(tot))
        .select(
            group_col,
            "available_tokens",
            F.round(F.col("__qp") / F.col("__tot"), 6).alias("weight"),
        )
    )


def mixture_weights(
    df: DataFrame,
    target_weights: dict[str, float],
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-source sampling rates that realize a target token mixture.

    Given target proportions w_g, finds the largest total token budget S
    with S·w_g ≤ available_g for every source (the binding source caps
    the mixture), then rate_g = S·w_g / available_g. One fused aggregate
    over the corpus computes available tokens per source; the closed-form
    scalar fold happens on the grouped (tiny) result. Returns
    (source, available_tokens, target_weight, target_tokens, sample_rate)
    — feed ``sample_rate`` straight into ``stratified_sample(fractions=…)``.
    """
    total_w = sum(target_weights.values())
    if total_w <= 0:
        raise ValueError("target weights must sum > 0")
    norm = {g: w / total_w for g, w in target_weights.items()}
    wmap = F.create_map(
        *[x for g, w in sorted(norm.items()) for x in (F.lit(g), F.lit(float(w)))]
    )
    avail = (
        df.filter(F.col(group_col).isin(list(norm)))
        .groupBy(group_col)
        .agg(F.sum(bpe_ish_token_count(F.col(text_col))).cast("long").alias("available_tokens"))
        .withColumn("target_weight", F.element_at(wmap, F.col(group_col)))
    )
    # S = min over groups of available/weight — a 1-row aggregate joined
    # back (broadcast: the grouped table is ≤ n_sources rows)
    s = avail.agg(
        F.min(F.col("available_tokens") / F.col("target_weight")).alias("__s")
    )
    return (
        avail.join(F.broadcast(s))
        .select(
            group_col,
            "available_tokens",
            F.round("target_weight", 6).alias("target_weight"),
            F.floor(F.col("__s") * F.col("target_weight")).cast("long").alias("target_tokens"),
            F.round(
                F.col("__s") * F.col("target_weight") / F.col("available_tokens"), 6
            ).alias("sample_rate"),
        )
    )


def build_training_mix(
    df: DataFrame,
    target_weights: dict[str, float],
    path: str | None = None,
    group_col: str = "source",
    text_col: str = "text",
    key_col: str = "doc_id",
    n_shards: int = 1024,
    seed: int = 0,
) -> DataFrame:
    """One-call mixing-to-disk: plan per-source rates for a target token
    mixture (``mixture_weights``), sample map-side at those rates
    (``stratified_sample`` — zero extra shuffles), impose a deterministic
    global training order (``global_shuffle``), and, when ``path`` is
    given, write one parquet file per shard partition.

    Every stage is individually oracle-verified; this composes them with
    the rate plan computed ON THE SAME FRAME the sample draws from, so
    the realized token mixture tracks the target up to per-doc token
    granularity. Returns the shuffled (and sampled) frame with
    (shard, position) — write or iterate shards in (shard, position)
    order for the training loader."""
    plan = mixture_weights(df, target_weights, group_col, text_col)
    rates = {
        r[group_col]: float(r["sample_rate"]) for r in plan.collect()
    }
    sampled = stratified_sample(df, group_col, fractions=rates, key_col=key_col)
    shuffled = global_shuffle(sampled, n_shards=n_shards, key_col=key_col, seed=seed)
    if path is not None:
        (
            shuffled.repartitionByRange(n_shards, F.col("shard"))
            .sortWithinPartitions("shard", "position")
            .write.mode("overwrite")
            .partitionBy("shard")
            .parquet(path)
        )
    return shuffled


def repetition_plan(
    df: DataFrame,
    target_tokens: int,
    text_col: str = "text",
    key_col: str = "doc_id",
    max_epochs: int = 4,
) -> DataFrame:
    """Data-constrained epoch planning: per-document repeat counts that
    realize a token budget larger than the corpus (the "repeat your data
    N epochs plus a bit" recipe of data-constrained scaling).

    base epochs = min(target // available, max_epochs); the remainder
    budget selects a deterministic md5-keyed subset for one extra pass:
    doc joins the extra epoch iff ``md5_frac(key) < remainder/available``
    — pure map-side column math (no global sort, no cumulative window:
    a token-exact remainder would need an md5-ordered running sum, which
    serializes on one task at scale; the hash-rate subset hits the budget
    in expectation with per-doc-token variance, the right trade at
    100 TB). Total planned tokens is capped at max_epochs · available.

    Returns df + (repeats int) with repeats ≥ base (0 when the budget is
    smaller than the corpus — then use ``stratified_sample`` instead).
    One aggregate job plans; the projection assigns."""
    if target_tokens < 0:
        raise ValueError(f"target_tokens must be >= 0, got {target_tokens}")
    if max_epochs < 1:
        raise ValueError(f"max_epochs must be >= 1, got {max_epochs}")
    tok = F.coalesce(bpe_ish_token_count(F.col(text_col)), F.lit(0))
    available = df.agg(F.sum(tok).cast("long")).collect()[0][0] or 0
    if available == 0:
        return df.withColumn("repeats", F.lit(0))
    base = min(target_tokens // available, max_epochs)
    remainder = target_tokens - base * available if base < max_epochs else 0
    frac = min(max(remainder / available, 0.0), 1.0)
    denom = 1_000_000
    # same engine-portable md5 idiom as global_shuffle / stratified_sample
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("rep:"), F.col(key_col).cast("string"))), 1, 6),
        16,
        10,
    ).cast("long") % denom
    extra = (h < F.lit(int(frac * denom))).cast("int")
    return df.withColumn("repeats", (F.lit(int(base)) + extra).cast("int"))


def curriculum_order(
    df: DataFrame,
    score_col: str,
    n_bands: int = 4,
    n_shards: int = 8,
    key_col: str = "doc_id",
    seed: int = 0,
    max_hist_rows: int = 2_000_000,
) -> DataFrame:
    """Curriculum export order: band the corpus into ``n_bands`` exact
    score quantile bins (band 0 = highest scores — train on the cleanest
    data first, the quality-staged pretraining schedule), then give each
    band its own deterministic ``global_shuffle``-style order so training
    within a stage is still well-mixed.

    The 1e-6 quantization grid assumes a BOUNDED score (quality scores in
    [0, 1] → ≤1e6+1 histogram rows, broadcastable). For unbounded scores
    (perplexity) the grid auto-coarsens so the histogram stays under
    ``max_hist_rows`` — one min/max scalar aggregate decides; bounded
    scores keep the exact 1e-6 grid bit-identically.

    EXACT banding WITHOUT a global sort: scores quantize to 1e-6 longs
    and aggregate into a value histogram — a relation the size of the
    DISTINCT score set, tiny next to the corpus — whose running count
    (one window over the small histogram) yields each score value's
    rank range; band = floor(rank_start · n_bands / total), so ties
    share a band deterministically. The corpus then gets its band by a
    broadcast join on the quantized score: no corpus-wide sort ever
    happens (the trap a cume_dist/ntile formulation falls into — one
    task sorting 100 TB).

    Returns (id, band, shard, position); the loader reads bands in
    order, shards within a band in index order, rows by position."""
    if n_bands < 1 or n_shards < 1:
        raise ValueError("n_bands and n_shards must be >= 1")
    from pyspark.sql import Window

    scale = 1e6
    rng = df.agg(
        F.min(score_col).alias("lo"), F.max(score_col).alias("hi")
    ).collect()[0]
    if (
        rng["lo"] is not None
        and rng["hi"] is not None
        and (float(rng["hi"]) - float(rng["lo"])) * scale > max_hist_rows
    ):
        scale = max_hist_rows / (float(rng["hi"]) - float(rng["lo"]))
    # NULL scores sort LAST (lowest band) instead of silently vanishing
    # from the export AND inflating the band denominator (review r5):
    # coalesce to a sentinel below any real quantized score.
    qs = F.coalesce(
        F.round(F.col(score_col) * scale).cast("long"),
        F.lit(-(2 ** 62)),
    )
    hist = df.groupBy(qs.alias("__qs")).agg(F.count(F.lit(1)).alias("__c"))
    wcum = Window.orderBy(F.desc("__qs")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    total = hist.agg(F.sum("__c").alias("__t"))
    bands = (
        hist.withColumn("__cum", F.sum("__c").over(wcum))
        .join(F.broadcast(total))
        .select(
            "__qs",
            F.least(
                F.floor((F.col("__cum") - F.col("__c")) * n_bands / F.col("__t")),
                F.lit(n_bands - 1),
            )
            .cast("int")
            .alias("band"),
        )
    )
    return (
        df.select(F.col(key_col).cast("long").alias("id"), qs.alias("__qs"))
        .join(F.broadcast(bands), "__qs")
        .withColumn(
            "__okey",
            F.md5(F.concat(F.lit(str(seed)), F.lit(":"), F.col("id").cast("string"))),
        )
        .withColumn(
            "shard",
            (F.conv(F.substring("__okey", 1, 6), 16, 10).cast("long") % n_shards).cast(
                "int"
            ),  # = md5_bucket6 on the precomputed __okey
        )
        .withColumn(
            "position",
            F.row_number()
            .over(Window.partitionBy("band", "shard").orderBy("__okey", "id"))
            .cast("long"),
        )
        .select("id", "band", "shard", "position")
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    group_col: str | None = None,
    key_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement — Efraimidis &
    Spirakis 2006 (A-ES): each row draws priority ``ln(u)/w`` with ``u``
    a cryptographic (seed, key)-derived uniform, and the k highest
    priorities win; inclusion probability is proportional to weight,
    no row repeats. THE primitive for "keep 1M documents, quality- (or
    temperature-) weighted" — plain ``fractions`` sampling can't do
    without-replacement weighting, and a multinomial draw can't do
    determinism.

    Determinism: u = (md5(seed:key)[:24 bits]+1)/2^24 — the same
    engine-portable hash-uniform as ``global_shuffle``, so the selected
    SET is reproducible across reruns, partitionings, and engines, and a
    different ``seed`` yields an independent draw.

    Scale: weights/priorities are map-only column math. Global mode
    ranks via ``orderBy().limit(k)`` (TakeOrdered — per-partition top-k
    then a k-row merge, never a full sort); grouped mode is a
    ``row_number`` window that Spark plans as WindowGroupLimit (map-side
    per-group limit before the shuffle). Rows with NULL or
    non-positive weight are excluded (zero weight = zero inclusion
    probability; A-ES priority is undefined there).

    Returns the sampled rows + (__priority, rank), rank 1..k per group
    (or globally)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = F.col(weight_col).cast("double")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(str(seed)), F.lit(":"), F.col(key_col).cast("string"))),
            1,
            6,
        ),
        16,
        10,
    ).cast("double")
    u = (h + 1.0) / float(1 << 24)
    pri = F.log(u) / w
    base = df.filter(w.isNotNull() & (w > 0)).withColumn("__priority", pri)
    from pyspark.sql import Window

    if group_col is None:
        # TakeOrdered path: deterministic (priority, key) order
        top = base.orderBy(F.desc("__priority"), F.col(key_col)).limit(k)
        win = Window.orderBy(F.desc("__priority"), F.col(key_col))
        return top.withColumn("rank", F.row_number().over(win).cast("long"))
    win = Window.partitionBy(group_col).orderBy(F.desc("__priority"), F.col(key_col))
    return (
        base.withColumn("rank", F.row_number().over(win).cast("long"))
        .filter(F.col("rank") <= k)
    )
