"""Entry-query registry section 2 (split from the single entry_queries module, r13). Import order = registration order = the original module's order."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from truthound_spark.entry_queries._core import (  # noqa: F401
    EV,
    _DRIFT_BASE,
    _DRIFT_CURR,
    _NORM_SQL,
    _SHINGLES_SQL,
    _drift_frames,
    _lsh_near_dup_oracle,
    _lsh_topk_oracle,
    _media_df,
    _scalar_df,
    fused_counts,
    register,
    t,
)



# ===========================================================================
# Training-data pipeline: dedup
# ===========================================================================


@register(
    "exact_dedup_documents",
    f"""
    WITH fp AS (SELECT doc_id, md5({_NORM_SQL.format(c='text')}) AS fingerprint FROM documents),
    g AS (SELECT fingerprint, COUNT(*) AS dup_count FROM fp GROUP BY 1)
    SELECT
      CAST((SELECT COUNT(*) FROM g WHERE dup_count > 1) AS BIGINT) AS dup_groups,
      CAST((SELECT COALESCE(SUM(dup_count), 0) FROM g WHERE dup_count > 1) AS BIGINT) AS docs_in_dup_groups,
      CAST((SELECT COUNT(*) FROM g) AS BIGINT) AS distinct_docs
    """,
)
def q_exact_dedup_documents(spark, sf_dir):
    """Exact dedup by content fingerprint groupBy (pipeline/dedup.py:66-86):
    shuffle keys are 32-byte hashes, never documents."""
    from truthound_spark.pipeline.dedup import content_fingerprint

    df = t(spark, sf_dir, "documents")
    g = (
        df.select(content_fingerprint(F.col("text")).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("dup_count"))
    )
    return g.agg(
        F.sum(F.when(F.col("dup_count") > 1, 1).otherwise(0)).cast("long").alias("dup_groups"),
        F.coalesce(
            F.sum(F.when(F.col("dup_count") > 1, F.col("dup_count"))), F.lit(0)
        )
        .cast("long")
        .alias("docs_in_dup_groups"),
        F.count(F.lit(1)).cast("long").alias("distinct_docs"),
    )


@register(
    "ngram_jaccard_pairs_documents",
    f"""
    WITH sh AS ({_SHINGLES_SQL}),
    inv AS (SELECT id, unnest(sh) AS g FROM sh),
    pairs AS (
      SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS inter
      FROM inv a JOIN inv b ON a.g = b.g AND a.id < b.id
      GROUP BY 1, 2
    ),
    sz AS (SELECT id, len(sh) AS sz FROM sh)
    SELECT p.id_a, p.id_b,
           ROUND(inter / CAST(sa.sz + sb.sz - inter AS DOUBLE), 6) AS jaccard
    FROM pairs p JOIN sz sa ON p.id_a = sa.id JOIN sz sb ON p.id_b = sb.id
    WHERE inter / CAST(sa.sz + sb.sz - inter AS DOUBLE) >= 0.4
    ORDER BY 1, 2
    """,
)
def q_ngram_jaccard_pairs_documents(spark, sf_dir):
    """n-gram Jaccard near-dup pairs via inverted-index join
    (pipeline/dedup.py:194-231), exact verification ≥ 0.4."""
    from truthound_spark.pipeline.dedup import ngram_jaccard_pairs

    df = t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(df, "text", "doc_id", n=3, threshold=0.4)
    return pairs.select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    ).orderBy("id_a", "id_b")


@register(
    "minhash_lsh_pairs_documents",
    f"""
    WITH sh AS ({_SHINGLES_SQL}),
    inv AS (SELECT id, unnest(sh) AS g FROM sh),
    pairs AS (
      SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS inter
      FROM inv a JOIN inv b ON a.g = b.g AND a.id < b.id
      GROUP BY 1, 2
    ),
    sz AS (SELECT id, len(sh) AS sz FROM sh)
    SELECT p.id_a, p.id_b,
           ROUND(inter / CAST(sa.sz + sb.sz - inter AS DOUBLE), 6) AS jaccard
    FROM pairs p JOIN sz sa ON p.id_a = sa.id JOIN sz sb ON p.id_b = sb.id
    WHERE inter / CAST(sa.sz + sb.sz - inter AS DOUBLE) >= 0.7
    ORDER BY 1, 2
    """,
)
def q_minhash_lsh_pairs_documents(spark, sf_dir):
    """MinHash+LSH candidates verified with exact Jaccard ≥ 0.7
    (pipeline/dedup.py:94-186). 32 bands × 2 rows: candidate-recall ≈
    1-(1-s²)³² (> 1-4e-10 at s=0.7), so the verified output equals the
    oracle's exhaustive pair set; the LSH plan only prunes the search."""
    from truthound_spark.pipeline.dedup import minhash_dedup_pairs

    df = t(spark, sf_dir, "documents")
    pairs = minhash_dedup_pairs(
        df, "text", "doc_id", threshold=0.7, num_hashes=64, bands=32,
        max_bucket_size=None,  # exact all-pairs: the oracle-certified mode
    )
    return pairs.select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    ).orderBy("id_a", "id_b")


@register(
    "simhash_pairs_documents",
    r"""
    WITH w AS (
      SELECT doc_id AS id,
             list_filter(regexp_split_to_array(lower(coalesce(text, '')), '\s+'),
                         x -> x <> '') AS ws
      FROM documents
    ),
    tok AS (SELECT id, unnest(ws) AS wd FROM w),
    h AS (SELECT id, ('0x' || substr(md5(wd), 1, 16))::UBIGINT AS hv FROM tok),
    bits AS (
      SELECT id, i, SUM(CASE WHEN (hv >> i) & 1 = 1 THEN 1 ELSE -1 END) AS vote
      FROM h, range(64) t(i) GROUP BY 1, 2
    ),
    sig AS (
      SELECT w.id,
             COALESCE((SELECT SUM(CASE WHEN vote > 0
                                       THEN (1::UBIGINT << i) ELSE 0::UBIGINT END)
                       FROM bits b WHERE b.id = w.id), 0)::UBIGINT AS v
      FROM w
    )
    SELECT a.id AS id_a, b.id AS id_b,
           CAST(bit_count(xor(a.v, b.v)) AS INT) AS hamming
    FROM sig a JOIN sig b ON a.id < b.id
    WHERE bit_count(xor(a.v, b.v)) <= 3
    ORDER BY 1, 2
    """,
)
def q_simhash_pairs_documents(spark, sf_dir):
    """SimHash near-dup pairs (pipeline/dedup.py:239-315). The md5
    bit-voting signature is replicated bit-exactly in the oracle (md5
    first-8-bytes big-endian word hash, ±1 votes per bit, vote>0 sets the
    bit), and the oracle's EXHAUSTIVE hamming≤3 pair join must equal the
    engine's 4-segment pigeonhole plan — the blocking is exact (not
    approximate) at distance ≤ 3, which this oracle proves."""
    from truthound_spark.pipeline.dedup import simhash_near_duplicates

    df = t(spark, sf_dir, "documents")
    return simhash_near_duplicates(df, "text", "doc_id", max_hamming=3).orderBy(
        "id_a", "id_b"
    )


# ===========================================================================
# Training-data pipeline: embedding similarity
# ===========================================================================


@register(
    "embedding_topk_cosine",
    """
    WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id < 5),
    c AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    scored AS (
      SELECT query_id, id,
             list_dot_product(qv, v) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))) AS cosine
      FROM q, c WHERE id <> query_id
    ),
    ranked AS (
      SELECT query_id, id, cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, id) AS rank
      FROM scored
    )
    SELECT query_id, id, ROUND(cosine, 6) AS cosine, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= 5 ORDER BY query_id, rank
    """,
)
def q_embedding_topk_cosine(spark, sf_dir):
    """Brute-force cosine top-k ANN baseline (pipeline/similarity.py:20-45):
    broadcast queries, one corpus scan, per-query top-k window."""
    from truthound_spark.pipeline.similarity import brute_force_topk

    df = t(spark, sf_dir, "embeddings")
    queries = df.filter(F.col("vec_id") < 5)
    topk = brute_force_topk(df, queries, k=5)
    return topk.select(
        "query_id",
        "id",
        F.round("cosine", 6).alias("cosine"),
        F.col("rank").cast("long").alias("rank"),
    ).orderBy("query_id", "rank")


@register(
    "embedding_near_duplicates",
    """
    WITH v AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    p AS (
      SELECT a.id AS id_a, b.id AS id_b,
             list_dot_product(a.e, b.e) / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))) AS cosine
      FROM v a, v b WHERE a.id < b.id
    )
    SELECT id_a, id_b, ROUND(cosine, 6) AS cosine
    FROM p WHERE cosine >= 0.9 ORDER BY id_a, id_b
    """,
)
def q_embedding_near_duplicates(spark, sf_dir):
    """Embedding near-dup pairs, cosine ≥ 0.9 (pipeline/dedup.py:332-362;
    exact mode — the oracle-verifiable baseline; LSH-bucketed variant is the
    scale path, registered rows-only)."""
    from truthound_spark.pipeline.dedup import embedding_near_duplicates

    df = t(spark, sf_dir, "embeddings")
    pairs = embedding_near_duplicates(df, threshold=0.9, exact=True)
    return pairs.select(
        "id_a", "id_b", F.round("cosine", 6).alias("cosine")
    ).orderBy("id_a", "id_b")


@register("embedding_lsh_near_duplicates", _lsh_near_dup_oracle())
def q_embedding_lsh_near_duplicates(spark, sf_dir):
    """Sign-LSH-bucketed embedding near-dup (pipeline/dedup.py:488-525 —
    the 100 TB path: candidates only from random-hyperplane buckets, the
    O(n²) cross-join never materializes). The oracle replicates the
    bucketing itself (seeded planes as literals), so the bucket-join
    candidate set AND the verified cosines must match exactly — threshold
    0.3 keeps the result non-trivial on the random test embeddings."""
    from truthound_spark.pipeline.dedup import embedding_near_duplicates

    df = t(spark, sf_dir, "embeddings")
    # pinned to the single-band 8-plane configuration the oracle inlines
    # (band 0 at seed 42 == the library's pre-banding behavior); the
    # library DEFAULT is the banded OR-construction (16 planes × 8 bands)
    pairs = embedding_near_duplicates(df, threshold=0.3, num_planes=8, num_bands=1)
    return pairs.select(
        "id_a", "id_b", F.round("cosine", 6).alias("cosine")
    ).orderBy("id_a", "id_b")


@register("ann_lsh_topk", _lsh_topk_oracle())
def q_ann_lsh_topk(spark, sf_dir):
    """Sign-LSH bucketed top-k (pipeline/similarity.py:88-116 lsh_topk).
    The plan is deterministic end-to-end — seeded planes, bucket-equality
    candidates, row_number over (cosine DESC, id) — so the oracle
    replicates it exactly: same buckets, same candidates, same ranks."""
    from truthound_spark.pipeline.similarity import lsh_topk

    df = t(spark, sf_dir, "embeddings")
    queries = df.filter(F.col("vec_id") < 5)
    res = lsh_topk(df, queries, k=5, num_planes=6)
    return res.select(
        "query_id", "id", F.round("cosine", 6).alias("cosine"), "rank"
    ).orderBy("query_id", "rank")


# ===========================================================================
# §2.12 PII scan / masking
# ===========================================================================


@register(
    "pii_scan_derived_contacts",
    """
    WITH d AS (
      SELECT lower(replace(c_name, '#', '.')) || '@example.com' || ' ' ||
             printf('010-%04d-%04d', CAST(c_custkey % 10000 AS INT), CAST((c_custkey * 7) % 10000 AS INT))
             AS contact
      FROM customer
    )
    SELECT
      CAST(SUM(CASE WHEN regexp_matches(contact, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}') THEN 1 ELSE 0 END) AS BIGINT) AS email_hits,
      CAST(SUM(CASE WHEN regexp_matches(contact, '01[016789]-?[0-9]{3,4}-?[0-9]{4}') THEN 1 ELSE 0 END) AS BIGINT) AS korean_phone_hits
    FROM d
    """,
)
def q_pii_scan_derived_contacts(spark, sf_dir):
    """PII scan batched rlike aggregation (scanners.py:84-127; reference
    scanners.py:21-91) over a derived contact column."""
    df = t(spark, sf_dir, "customer").select(
        F.concat(
            F.lower(F.replace(F.col("c_name"), F.lit("#"), F.lit("."))),
            F.lit("@example.com "),
            F.format_string(
                "010-%04d-%04d",
                (F.col("c_custkey") % 10000).cast("int"),
                ((F.col("c_custkey") * 7) % 10000).cast("int"),
            ),
        ).alias("contact")
    )
    email_p = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    phone_p = r"01[016789]-?[0-9]{3,4}-?[0-9]{4}"
    return df.agg(
        F.sum(F.when(F.col("contact").rlike(email_p), 1).otherwise(0))
        .cast("long")
        .alias("email_hits"),
        F.sum(F.when(F.col("contact").rlike(phone_p), 1).otherwise(0))
        .cast("long")
        .alias("korean_phone_hits"),
    )


@register(
    "mask_hash_names",
    """
    SELECT sha256(c_name) AS masked, CAST(COUNT(*) AS BIGINT) AS n
    FROM customer WHERE c_custkey < 10 GROUP BY 1 ORDER BY 1
    """,
)
def q_mask_hash_names(spark, sf_dir):
    """Hash masking strategy (maskers.py; reference api.py:206-268) —
    sha2-256, JVM-side, deterministic."""
    df = t(spark, sf_dir, "customer").filter(F.col("c_custkey") < 10)
    return (
        df.select(F.sha2(F.col("c_name"), 256).alias("masked"))
        .groupBy("masked")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy("masked")
    )


# ===========================================================================
# schema learn() profile
# ===========================================================================


@register(
    "learn_schema_customer",
    """
    SELECT 'c_acctbal' AS column_name,
           ROUND(1.0 - COUNT(c_acctbal) / CAST(COUNT(*) AS DOUBLE), 6) AS null_ratio,
           CAST(COUNT(DISTINCT c_acctbal) AS BIGINT) AS n_unique,
           ROUND(MIN(c_acctbal), 4) AS min_v, ROUND(MAX(c_acctbal), 4) AS max_v,
           ROUND(AVG(c_acctbal), 4) AS mean_v
    FROM customer
    UNION ALL
    SELECT 'c_nationkey', ROUND(1.0 - COUNT(c_nationkey) / CAST(COUNT(*) AS DOUBLE), 6),
           COUNT(DISTINCT c_nationkey),
           ROUND(MIN(c_nationkey), 4), ROUND(MAX(c_nationkey), 4), ROUND(AVG(c_nationkey), 4)
    FROM customer
    ORDER BY column_name
    """,
)
def q_learn_schema_customer(spark, sf_dir):
    """Schema learn() single-pass aggregate profile (schema.py:244-277 in
    the reference; truthound_spark.schema.learn) — numeric column stats."""
    df = t(spark, sf_dir, "customer")
    rows = []
    for c in ["c_acctbal", "c_nationkey"]:
        agg = df.agg(
            F.round(
                1.0 - F.count(F.col(c)).cast("double") / F.count(F.lit(1)), 6
            ).alias("null_ratio"),
            F.countDistinct(F.col(c)).alias("n_unique"),
            F.round(F.min(c).cast("double"), 4).alias("min_v"),
            F.round(F.max(c).cast("double"), 4).alias("max_v"),
            F.round(F.avg(c), 4).alias("mean_v"),
        ).select(F.lit(c).alias("column_name"), "*")
        rows.append(agg)
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out.orderBy("column_name")


# ===========================================================================
# §2.3 graph: hierarchy depth + cycle detection (derived edge tables)
# ===========================================================================


@register(
    "hierarchy_depth_derived",
    """
    WITH RECURSIVE e AS (
      SELECT c_custkey AS id,
             CASE WHEN c_custkey = 0 THEN NULL ELSE CAST((c_custkey - 1) / 2 AS BIGINT) END AS parent
      FROM customer
    ),
    walk(id, depth) AS (
      SELECT id, 0 FROM e WHERE parent IS NULL
      UNION ALL
      SELECT e.id, w.depth + 1 FROM e JOIN walk w ON e.parent = w.id
    )
    SELECT CAST(MAX(depth) AS BIGINT) AS max_depth,
           CAST(COUNT(*) AS BIGINT) AS reachable_nodes,
           CAST(SUM(CASE WHEN depth > 8 THEN 1 ELSE 0 END) AS BIGINT) AS nodes_deeper_than_8
    FROM walk
    """,
)
def q_hierarchy_depth_derived(spark, sf_dir):
    """Hierarchy depth via iterative BFS joins (referential/circular.py:290;
    engine HierarchyDepthValidator plan shape) over a derived binary-tree
    edge table (parent = (id-1)//2)."""
    df = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        F.when(F.col("c_custkey") == 0, F.lit(None).cast("long"))
        .otherwise(F.floor((F.col("c_custkey") - 1) / 2).cast("long"))
        .alias("parent"),
    )
    edges = df.localCheckpoint(eager=True)
    frontier = edges.filter(F.col("parent").isNull()).select("id").withColumn(
        "depth", F.lit(0)
    )
    all_levels = frontier
    depth = 0
    while True:
        nxt = (
            edges.join(
                F.broadcast(frontier.select(F.col("id").alias("parent"))), on="parent"
            )
            .select("id")
            .withColumn("depth", F.lit(depth + 1))
        )
        nxt = nxt.localCheckpoint(eager=True)
        if nxt.isEmpty():
            break
        depth += 1
        all_levels = all_levels.unionAll(nxt)
        frontier = nxt
        if depth > 40:  # safety bound
            break
    return all_levels.agg(
        F.max("depth").cast("long").alias("max_depth"),
        F.count(F.lit(1)).cast("long").alias("reachable_nodes"),
        F.sum(F.when(F.col("depth") > 8, 1).otherwise(0))
        .cast("long")
        .alias("nodes_deeper_than_8"),
    )


@register(
    "circular_reference_derived",
    """
    WITH RECURSIVE e AS (
      SELECT n_nationkey AS id, (n_nationkey + 1) % 25 AS parent FROM nation
    ),
    walk(start, node, steps) AS (
      SELECT id, parent, 1 FROM e
      UNION ALL
      SELECT w.start, e.parent, w.steps + 1
      FROM walk w JOIN e ON e.id = w.node
      WHERE w.steps < 30 AND w.node <> w.start
    )
    SELECT CAST(COUNT(DISTINCT start) AS BIGINT) AS nodes_in_cycles
    FROM walk WHERE node = start
    """,
)
def q_circular_reference_derived(spark, sf_dir):
    """Cycle detection by pointer doubling (engine
    CircularReferenceValidator; reference referential/circular.py:24) over a
    derived 25-node ring (parent = (id+1) mod 25)."""
    from truthound_spark.validators.referential import CircularReferenceValidator

    df = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("id"),
        ((F.col("n_nationkey") + 1) % 25).alias("parent"),
    )
    issues = CircularReferenceValidator("id", "parent", max_iterations=8).validate(df)
    n = issues[0].count if issues and issues[0].issue_type == "circular_reference" else 0
    return _scalar_df(spark, nodes_in_cycles=n)


# ===========================================================================
# §4.4 SQL pushdown (the sqlite-*/duckdb-* BASELINE workload shapes)
# ===========================================================================


@register(
    "pushdown_null_counts",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS row_count,
           CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_count
    FROM orders
    """,
)
def q_pushdown_null_counts(spark, sf_dir):
    """SQL pushdown null-count (reference pushdown_support.py:448-465):
    the generated SQL executes IN the database (DuckDB over the same
    parquet); only scalars cross the boundary."""
    from truthound_spark.sources import DuckDBSource

    src = DuckDBSource()
    src.register_parquet("orders", f"{sf_dir}/orders.parquet")
    m = src.null_count("orders", "o_totalprice")
    src.close()
    return _scalar_df(spark, row_count=m["row_count"], null_count=m["null_count"])


@register(
    "pushdown_unique_counts",
    """
    SELECT CAST(COUNT(c_custkey) AS BIGINT) AS non_null_count,
           CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS distinct_count
    FROM customer
    """,
)
def q_pushdown_unique_counts(spark, sf_dir):
    """SQL pushdown distinct-count (pushdown_support.py:487-508)."""
    from truthound_spark.sources import DuckDBSource

    src = DuckDBSource()
    src.register_parquet("customer", f"{sf_dir}/customer.parquet")
    m = src.distinct_count("customer", "c_custkey")
    src.close()
    return _scalar_df(
        spark, non_null_count=m["non_null_count"], distinct_count=m["distinct_count"]
    )


@register(
    "pushdown_range_stats",
    """
    SELECT ROUND(MIN(l_quantity), 4) AS min_value, ROUND(MAX(l_quantity), 4) AS max_value,
           CAST(SUM(CASE WHEN (l_quantity < 1 OR l_quantity > 30) AND l_quantity IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS out_of_range_count,
           CAST(COUNT(l_quantity) AS BIGINT) AS non_null_count
    FROM lineitem
    """,
)
def q_pushdown_range_stats(spark, sf_dir):
    """SQL pushdown MIN/MAX + out-of-range count (pushdown_support.py:530-547)."""
    from truthound_spark.sources import DuckDBSource

    src = DuckDBSource()
    src.register_parquet("lineitem", f"{sf_dir}/lineitem.parquet")
    m = src.range_stats("lineitem", "l_quantity", 1, 30)
    src.close()
    return _scalar_df(
        spark,
        min_value=round(float(m["min_value"]), 4),
        max_value=round(float(m["max_value"]), 4),
        out_of_range_count=int(m["out_of_range_count"] or 0),
        non_null_count=int(m["non_null_count"] or 0),
    )


# ===========================================================================
# sliding windows
# ===========================================================================


@register(
    "sliding_window_counts_events",
    f"""
    WITH {EV},
    starts AS (
      SELECT epoch(date_trunc('hour', ts)) AS s FROM ev
      UNION ALL
      SELECT epoch(date_trunc('hour', ts - INTERVAL 30 MINUTE)) + 1800 FROM ev
    )
    SELECT CAST(s AS BIGINT) AS window_start, CAST(COUNT(*) AS BIGINT) AS n
    FROM starts GROUP BY s ORDER BY s
    """,
)
def q_sliding_window_counts_events(spark, sf_dir):
    """Sliding windows 1h/30min (F.window(ts, '1 hour', '30 minutes');
    realtime/processing/windows.py sliding semantics) — each event lands in
    exactly two windows."""
    df = t(spark, sf_dir, "events")
    return (
        df.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(
            F.unix_timestamp(F.col("w.start")).cast("long").alias("window_start"), "n"
        )
        .orderBy("window_start")
    )


# ===========================================================================
# round-2 widened operators: trend / seasonality / variance / scale / drift
# ===========================================================================


@register(
    "trend_slope_events",
    f"""
    WITH {EV},
    tv AS (SELECT epoch_us(ts) / 1e6 AS t, value AS v FROM ev WHERE value IS NOT NULL)
    SELECT ROUND((covar_pop(t, v) / var_pop(t)) * 86400, 6) AS slope_per_day
    FROM tv
    """,
)
def q_trend_slope_events(spark, sf_dir):
    """TrendValidator OLS slope = covar_pop/var_pop — ONE distributed agg
    (reference: timeseries/trend.py:32)."""
    df = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    tsec = F.col("ts").cast("double")
    return df.agg(
        F.round((F.covar_pop(tsec, F.col("value")) / F.var_pop(tsec)) * 86400, 6).alias(
            "slope_per_day"
        )
    )


@register(
    "seasonality_buckets_events",
    f"""
    WITH {EV}
    SELECT CAST(isodow(ts) % 7 + 1 AS INT) AS dow,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG(value), 4) AS avg_value
    FROM ev GROUP BY 1 ORDER BY 1
    """,
)
def q_seasonality_buckets_events(spark, sf_dir):
    """SeasonalityValidator per-day-of-week bucket means
    (reference: timeseries/seasonality.py:33)."""
    df = t(spark, sf_dir, "events")
    return (
        df.groupBy(F.dayofweek("ts").alias("dow"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
        .orderBy("dow")
    )


@register(
    "multi_column_variance_lineitem",
    """
    SELECT
      ROUND(VAR_SAMP(l_quantity), 4) AS var_quantity,
      ROUND(VAR_SAMP(l_discount), 8) AS var_discount,
      ROUND(VAR_SAMP(l_tax), 8) AS var_tax,
      ROUND(STDDEV_SAMP(l_extendedprice) / STDDEV_SAMP(l_quantity), 2) AS scale_ratio
    FROM lineitem
    """,
)
def q_multi_column_variance_lineitem(spark, sf_dir):
    """MultiColumnVariance + FeatureScale stddev-ratio metrics
    (reference: multi_column/statistical.py:213, ml_feature/scale.py:30)."""
    df = t(spark, sf_dir, "lineitem")
    return df.agg(
        F.round(F.var_samp("l_quantity"), 4).alias("var_quantity"),
        F.round(F.var_samp("l_discount"), 8).alias("var_discount"),
        F.round(F.var_samp("l_tax"), 8).alias("var_tax"),
        F.round(F.stddev_samp("l_extendedprice") / F.stddev_samp("l_quantity"), 2).alias(
            "scale_ratio"
        ),
    )


@register(
    "target_leakage_derived",
    """
    WITH d AS (
      SELECT o_totalprice AS target, o_totalprice * 2.0 + 1.0 AS leaky,
             CAST(o_custkey % 97 AS DOUBLE) AS noise
      FROM orders
    )
    SELECT ROUND(corr(target, leaky), 6) AS leaky_corr,
           ROUND(corr(target, noise), 4) AS noise_corr
    FROM d
    """,
)
def q_target_leakage_derived(spark, sf_dir):
    """TargetLeakage feature↔target correlations (ml_feature/leakage.py:19):
    the derived 'leaky' feature is an affine copy (r = 1)."""
    df = t(spark, sf_dir, "orders").select(
        F.col("o_totalprice").alias("target"),
        (F.col("o_totalprice") * 2.0 + 1.0).alias("leaky"),
        (F.col("o_custkey") % 97).cast("double").alias("noise"),
    )
    return df.agg(
        F.round(F.corr("target", "leaky"), 6).alias("leaky_corr"),
        F.round(F.corr("target", "noise"), 4).alias("noise_corr"),
    )


@register(
    "feature_null_impact_derived",
    """
    WITH d AS (
      SELECT CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_acctbal END AS feat,
             c_acctbal + CASE WHEN c_custkey % 7 = 0 THEN 1000.0 ELSE 0.0 END AS y
      FROM customer
    )
    SELECT
      CAST(SUM(CASE WHEN feat IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
      ROUND(AVG(CASE WHEN feat IS NULL THEN y END), 4) AS mu_null,
      ROUND(AVG(CASE WHEN feat IS NOT NULL THEN y END), 4) AS mu_notnull
    FROM d
    """,
)
def q_feature_null_impact_derived(spark, sf_dir):
    """FeatureNullImpact grouped-mean shift (ml_feature/null_impact.py:19)."""
    df = t(spark, sf_dir, "customer").select(
        F.when(F.col("c_custkey") % 7 == 0, F.lit(None).cast("double"))
        .otherwise(F.col("c_acctbal"))
        .alias("feat"),
        (
            F.col("c_acctbal")
            + F.when(F.col("c_custkey") % 7 == 0, 1000.0).otherwise(0.0)
        ).alias("y"),
    )
    is_null = F.col("feat").isNull()
    return df.agg(
        F.sum(F.when(is_null, 1).otherwise(0)).cast("long").alias("n_null"),
        F.round(F.avg(F.when(is_null, F.col("y"))), 4).alias("mu_null"),
        F.round(F.avg(F.when(~is_null, F.col("y"))), 4).alias("mu_notnull"),
    )


@register(
    "zscore_multivariate_lineitem",
    """
    WITH s AS (
      SELECT AVG(l_quantity) AS mu_q, STDDEV_SAMP(l_quantity) AS sd_q,
             AVG(l_extendedprice) AS mu_p, STDDEV_SAMP(l_extendedprice) AS sd_p
      FROM lineitem
    )
    SELECT CAST(SUM(CASE WHEN ABS((l_quantity - mu_q) / sd_q) > 2.5
                           OR ABS((l_extendedprice - mu_p) / sd_p) > 2.5
                         THEN 1 ELSE 0 END) AS BIGINT) AS multivariate_outliers
    FROM lineitem, s
    """,
)
def q_zscore_multivariate_lineitem(spark, sf_dir):
    """ZScoreMultivariate fused count (anomaly/multivariate.py:409)."""
    df = t(spark, sf_dir, "lineitem")
    stats = df.agg(
        F.mean("l_quantity").alias("mu_q"),
        F.stddev_samp("l_quantity").alias("sd_q"),
        F.mean("l_extendedprice").alias("mu_p"),
        F.stddev_samp("l_extendedprice").alias("sd_p"),
    ).collect()[0]
    pred = (
        F.abs((F.col("l_quantity") - stats["mu_q"]) / stats["sd_q"]) > 2.5
    ) | (F.abs((F.col("l_extendedprice") - stats["mu_p"]) / stats["sd_p"]) > 2.5)
    return df.agg(
        F.sum(F.when(pred, 1).otherwise(0)).cast("long").alias("multivariate_outliers")
    )


@register(
    "quantile_range_drift_events",
    f"""
    WITH b AS ({_DRIFT_BASE}), c AS ({_DRIFT_CURR})
    SELECT
      ROUND(ABS((SELECT quantile_cont(value, 0.5) FROM c) - (SELECT quantile_cont(value, 0.5) FROM b))
            / (ABS((SELECT quantile_cont(value, 0.5) FROM b)) + 1e-10), 6) AS median_rel_drift,
      ROUND(ABS(((SELECT MAX(value) - MIN(value) FROM c)) - ((SELECT MAX(value) - MIN(value) FROM b)))
            / (ABS((SELECT MAX(value) - MIN(value) FROM b)) + 1e-10), 6) AS span_rel_drift
    """,
)
def q_quantile_range_drift_events(spark, sf_dir):
    """QuantileDrift + RangeDrift relative changes (drift/numeric.py:200,295)
    — exact percentile here for oracle parity; the registered validator's
    default is the mergeable percentile_approx sketch (the scale path)."""
    baseline, current = _drift_frames(spark, sf_dir)
    mb = baseline.agg(F.expr("percentile(value, 0.5)").alias("m")).collect()[0]["m"]
    mc = current.agg(F.expr("percentile(value, 0.5)").alias("m")).collect()[0]["m"]
    rb = baseline.agg((F.max("value") - F.min("value")).alias("s")).collect()[0]["s"]
    rc = current.agg((F.max("value") - F.min("value")).alias("s")).collect()[0]["s"]
    return _scalar_df(
        spark,
        median_rel_drift=round(abs(mc - mb) / (abs(mb) + 1e-10), 6),
        span_rel_drift=round(abs(rc - rb) / (abs(rb) + 1e-10), 6),
    )


@register(
    "csi_bins_events",
    f"""
    WITH b AS ({_DRIFT_BASE}), c AS ({_DRIFT_CURR}),
    r AS (SELECT MIN(value) AS lo, MAX(value) AS hi FROM b),
    bins AS (SELECT i FROM generate_series(0, 9) AS gs(i)),
    bh AS (
      SELECT LEAST(GREATEST(CAST(FLOOR((value - lo) / ((hi - lo) / 10)) AS INT), 0), 9) AS bin, COUNT(*) AS n
      FROM b, r GROUP BY 1
    ),
    ch AS (
      SELECT LEAST(GREATEST(CAST(FLOOR((value - lo) / ((hi - lo) / 10)) AS INT), 0), 9) AS bin, COUNT(*) AS n
      FROM c, r GROUP BY 1
    )
    SELECT bins.i AS bin,
           ROUND((COALESCE(bh.n, 0) / CAST((SELECT SUM(n) FROM bh) AS DOUBLE)
                - COALESCE(ch.n, 0) / CAST((SELECT SUM(n) FROM ch) AS DOUBLE))
               * LN((COALESCE(bh.n, 0) / CAST((SELECT SUM(n) FROM bh) AS DOUBLE) + 1e-10)
                  / (COALESCE(ch.n, 0) / CAST((SELECT SUM(n) FROM ch) AS DOUBLE) + 1e-10)), 6) AS csi
    FROM bins LEFT JOIN bh ON bins.i = bh.bin LEFT JOIN ch ON bins.i = ch.bin
    ORDER BY bin
    """,
)
def q_csi_bins_events(spark, sf_dir):
    """CSI per-bin stability contributions (drift/psi.py:298) — the
    engine's histogram aggregates, one row per bin."""
    import math

    from truthound_spark.drift import detectors

    baseline, current = _drift_frames(spark, sf_dir)
    lo, hi = detectors._numeric_range(baseline, "value")
    p = detectors._freqs(detectors._hist_counts(baseline, "value", lo, hi, 10))
    q = detectors._freqs(detectors._hist_counts(current, "value", lo, hi, 10))
    rows = [
        (i, round((pi - qi) * math.log((pi + 1e-10) / (qi + 1e-10)), 6))
        for i, (pi, qi) in enumerate(zip(p, q))
    ]
    from pyspark.sql import types as T

    return spark.createDataFrame(
        rows,
        T.StructType(
            [
                T.StructField("bin", T.LongType()),
                T.StructField("csi", T.DoubleType()),
            ]
        ),
    ).orderBy("bin")


@register(
    "vat_swift_derived",
    """
    WITH d AS (
      SELECT CASE WHEN c_custkey % 89 = 0 THEN 'XX' || lpad(CAST(c_custkey % 1000000000 AS VARCHAR), 9, '0')
                  ELSE 'DE' || lpad(CAST((c_custkey * 37) % 1000000000 AS VARCHAR), 9, '0') END AS vat,
             CASE WHEN c_custkey % 97 = 0 THEN 'bad!'
                  WHEN c_custkey % 2 = 0 THEN 'DEUTDEFF'
                  ELSE 'DEUTDEFF500' END AS bic
      FROM customer
    )
    SELECT
      CAST(SUM(CASE WHEN NOT regexp_matches(vat, '^DE[0-9]{9}$') THEN 1 ELSE 0 END) AS BIGINT) AS invalid_vat,
      CAST(SUM(CASE WHEN NOT regexp_matches(bic, '^[A-Z]{4}[A-Z]{2}[A-Z0-9]{2}([A-Z0-9]{3})?$') THEN 1 ELSE 0 END) AS BIGINT) AS invalid_bic
    FROM d
    """,
)
def q_vat_swift_derived(spark, sf_dir):
    """VAT + SWIFT/BIC structure checks (business_rule/financial.py:189,372)
    over derived columns with seeded invalids."""
    from truthound_spark.validators.business import SwiftBicValidator, VatValidator

    df = t(spark, sf_dir, "customer").select(
        F.when(
            F.col("c_custkey") % 89 == 0,
            F.concat(
                F.lit("XX"),
                F.lpad((F.col("c_custkey") % 1000000000).cast("string"), 9, "0"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("DE"),
                F.lpad(((F.col("c_custkey") * 37) % 1000000000).cast("string"), 9, "0"),
            )
        )
        .alias("vat"),
        F.when(F.col("c_custkey") % 97 == 0, F.lit("bad!"))
        .when(F.col("c_custkey") % 2 == 0, F.lit("DEUTDEFF"))
        .otherwise(F.lit("DEUTDEFF500"))
        .alias("bic"),
    )
    return fused_counts(
        df,
        [
            (VatValidator("vat", countries=["DE"]), ["invalid_vat"]),
            (SwiftBicValidator("bic"), ["invalid_bic"]),
        ],
    )


@register(
    "json_schema_events_props",
    """
    WITH d AS (
      SELECT CASE WHEN event_id % 89 = 0 THEN substr(props, 1, length(props) - 1)
                  ELSE props END AS j
      FROM events
    )
    SELECT CAST(SUM(CASE WHEN NOT (json_valid(j)
                              AND TRY_CAST((CASE WHEN json_valid(j)
                                            THEN json_extract_string(j, '$.k') END) AS DOUBLE)
                                  IS NOT NULL)
                         THEN 1 ELSE 0 END) AS BIGINT) AS schema_violations
    FROM d
    """,
)
def q_json_schema_events_props(spark, sf_dir):
    """JsonSchema conformance via JVM-side get_json_object
    (string/json_schema.py:14), seeded corruption every 89th event."""
    from truthound_spark.validators.string import JsonSchemaValidator

    df = t(spark, sf_dir, "events").select(
        F.when(
            F.col("event_id") % 89 == 0,
            F.expr("substring(props, 1, length(props) - 1)"),
        )
        .otherwise(F.col("props"))
        .alias("j")
    )
    v = JsonSchemaValidator("j", {"required": ["k"], "properties": {"k": {"type": "number"}}})
    return fused_counts(df, [(v, ["schema_violations"])])


@register(
    "media_size_stats",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_assets,
           CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           ROUND(AVG(octet_length(encode(text))), 4) AS avg_bytes,
           CAST(MAX(octet_length(encode(text))) AS BIGINT) AS max_bytes
    FROM documents
    """,
)
def q_media_size_stats(spark, sf_dir):
    """Binary-payload size stats (pipeline/multimodal.py media_size_stats) —
    the partition-sizing signal; payloads never leave the executors."""
    from truthound_spark.pipeline.multimodal import media_size_stats

    m = media_size_stats(_media_df(spark, sf_dir))
    return m.select(
        F.col("n_assets").cast("long"),
        F.col("total_bytes").cast("long"),
        F.round("avg_bytes", 4).alias("avg_bytes"),
        F.col("max_bytes").cast("long"),
    )


@register(
    "media_image_features",
    """
    WITH m AS (
      SELECT doc_id AS asset_id, md5(text) AS h FROM documents WHERE doc_id < 50
    ),
    v AS (
      SELECT asset_id,
             (instr('0123456789abcdef', substr(h, 1, 1)) - 1) * 16
               + (instr('0123456789abcdef', substr(h, 2, 1)) - 1) AS b0,
             (instr('0123456789abcdef', substr(h, 3, 1)) - 1) * 16
               + (instr('0123456789abcdef', substr(h, 4, 1)) - 1) AS b1
      FROM m
    )
    SELECT asset_id,
           CAST(64 + b0 % 192 AS INT) AS width,
           CAST(64 + b1 % 192 AS INT) AS height,
           CAST(3 AS INT) AS channels
    FROM v ORDER BY asset_id
    """,
)
def q_media_image_features(spark, sf_dir):
    """Image decode/feature-extract plumbing via mapInPandas
    (pipeline/multimodal.py extract_image_features). The deterministic fake
    decoder (md5-derived dims) lets the oracle verify the full Arrow-batch
    pipeline; a real decoder drops into the same slot."""
    from truthound_spark.pipeline.multimodal import extract_image_features

    media = _media_df(spark, sf_dir).filter(F.col("asset_id") < 50)
    feats = extract_image_features(media)
    return feats.select("asset_id", "width", "height", "channels").orderBy("asset_id")


@register(
    "media_video_frames",
    """
    SELECT doc_id AS asset_id, gs.i AS frame_index,
           md5(text || CAST(gs.i AS VARCHAR)) AS frame_fingerprint
    FROM documents, generate_series(0, 3) AS gs(i)
    WHERE doc_id < 20
    ORDER BY asset_id, frame_index
    """,
)
def q_media_video_frames(spark, sf_dir):
    """Video frame-sampling plumbing (pipeline/multimodal.py
    sample_video_frames): one row per sampled frame, deterministic
    per-frame fingerprints."""
    from truthound_spark.pipeline.multimodal import sample_video_frames

    media = _media_df(spark, sf_dir).filter(F.col("asset_id") < 20)
    frames = sample_video_frames(media, frames_per_video=4)
    return frames.select(
        "asset_id", F.col("frame_index").cast("long").alias("frame_index"), "frame_fingerprint"
    ).orderBy("asset_id", "frame_index")


# ===========================================================================
# checksum family (derived columns, engine validators vs SQL re-computation)
# ===========================================================================


@register(
    "isbn_checksum_derived",
    """
    WITH tt AS (SELECT lpad(CAST((c_custkey * 991 + 7) % 10000000000000 AS VARCHAR), 13, '0') AS s
                FROM customer),
    sc AS (
      SELECT s, list_sum([CAST(s[i] AS INT) * (CASE WHEN i % 2 = 1 THEN 1 ELSE 3 END)
                          FOR i IN range(1, 14)]) AS tot
      FROM tt
    )
    SELECT CAST(SUM(CASE WHEN tot % 10 = 0 THEN 0 ELSE 1 END) AS BIGINT) AS invalid_isbn,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM sc
    """,
)
def q_isbn_checksum_derived(spark, sf_dir):
    """ISBN-13 weighted checksum (reference checksum.py:162) — engine
    IsbnValidator over derived 13-digit strings."""
    from truthound_spark.validators.business import IsbnValidator

    df = t(spark, sf_dir, "customer").select(
        F.lpad(((F.col("c_custkey") * 991 + 7) % 10000000000000).cast("string"), 13, "0").alias("s")
    )
    base = fused_counts(df, [(IsbnValidator("s"), ["invalid_isbn"])])
    return base.crossJoin(df.agg(F.count(F.lit(1)).cast("long").alias("n")))


@register(
    "credit_card_derived",
    """
    WITH tt AS (SELECT '4' || lpad(CAST((c_custkey * 7919) % 1000000000000000 AS VARCHAR), 15, '0') AS s
                FROM customer),
    sc AS (
      SELECT s, list_sum([CASE WHEN (length(s) - i) % 2 = 1 THEN
                            CASE WHEN CAST(s[i] AS INT) * 2 > 9 THEN CAST(s[i] AS INT) * 2 - 9
                                 ELSE CAST(s[i] AS INT) * 2 END
                          ELSE CAST(s[i] AS INT) END
                          FOR i IN range(1, length(s) + 1)]) AS tot
      FROM tt
    )
    SELECT CAST(SUM(CASE WHEN regexp_matches(s, '^4[0-9]{12}([0-9]{3})?$') AND tot % 10 = 0
                         THEN 0 ELSE 1 END) AS BIGINT) AS invalid_cards
    FROM sc
    """,
)
def q_credit_card_derived(spark, sf_dir):
    """CreditCard = brand pattern + Luhn (reference checksum.py:340) over
    derived 16-digit Visa-prefixed strings (~10% pass Luhn)."""
    from truthound_spark.validators.business import CreditCardValidator

    df = t(spark, sf_dir, "customer").select(
        F.concat(
            F.lit("4"),
            F.lpad(((F.col("c_custkey") * 7919) % 1000000000000000).cast("string"), 15, "0"),
        ).alias("s")
    )
    return fused_counts(df, [(CreditCardValidator("s"), ["invalid_cards"])])


@register(
    "iban_mod97_derived",
    """
    WITH tt AS (
      SELECT 'DE' || lpad(CAST(c_custkey % 97 AS VARCHAR), 2, '0')
             || lpad(CAST((c_custkey * 37) % 10000000000000000 AS VARCHAR), 16, '0') AS iban
      FROM customer
    ),
    v AS (
      SELECT iban,
             CAST(substr(iban, 5) || '1314' || substr(iban, 3, 2) AS HUGEINT) % 97 AS m
      FROM tt
    )
    SELECT CAST(SUM(CASE WHEN m = 1 THEN 0 ELSE 1 END) AS BIGINT) AS invalid_iban,
           CAST(SUM(CASE WHEN m = 1 THEN 1 ELSE 0 END) AS BIGINT) AS valid_iban
    FROM v
    """,
)
def q_iban_mod97_derived(spark, sf_dir):
    """IBAN mod-97 (reference financial.py:19): engine computes the mod
    incrementally with aggregate() (stays in long range); the oracle casts
    the 22-digit rearranged number to HUGEINT — same arithmetic."""
    from truthound_spark.validators.business import IbanValidator

    df = t(spark, sf_dir, "customer").select(
        F.concat(
            F.lit("DE"),
            F.lpad((F.col("c_custkey") % 97).cast("string"), 2, "0"),
            F.lpad(((F.col("c_custkey") * 37) % 10000000000000000).cast("string"), 16, "0"),
        ).alias("iban")
    )
    base = fused_counts(df, [(IbanValidator("iban"), ["invalid_iban"])])
    valid = df.agg(
        (
            F.count(F.lit(1))
            - fused_counts(df, [(IbanValidator("iban"), ["x"])]).collect()[0]["x"]
        )
        .cast("long")
        .alias("valid_iban")
    )
    return base.crossJoin(valid)


@register(
    "korean_rrn_derived",
    """
    WITH tt AS (
      SELECT lpad(CAST(400000 + c_custkey % 500000 AS VARCHAR), 6, '0') || '-'
             || CAST(1 + c_custkey % 8 AS VARCHAR)
             || lpad(CAST((c_custkey * 13) % 1000000 AS VARCHAR), 6, '0') AS rrn
      FROM customer
    ),
    v AS (
      SELECT rrn, replace(rrn, '-', '') AS d FROM tt
    ),
    sc AS (
      SELECT rrn, d,
             list_sum([CAST(d[i] AS INT) * ([2,3,4,5,6,7,8,9,2,3,4,5])[i]
                       FOR i IN range(1, 13)]) AS tot
      FROM v
    )
    SELECT CAST(SUM(CASE WHEN (11 - tot % 11) % 10 = CAST(d[13] AS INT)
                         THEN 0 ELSE 1 END) AS BIGINT) AS invalid_rrn
    FROM sc
    """,
)
def q_korean_rrn_derived(spark, sf_dir):
    """Korean RRN weighted checksum (reference localization/korean.py:98)
    over derived RRN-formatted strings (~10% checksum-valid)."""
    from truthound_spark.validators.business import KoreanRRNValidator

    df = t(spark, sf_dir, "customer").select(
        F.concat(
            F.lpad((400000 + F.col("c_custkey") % 500000).cast("string"), 6, "0"),
            F.lit("-"),
            (1 + F.col("c_custkey") % 8).cast("string"),
            F.lpad(((F.col("c_custkey") * 13) % 1000000).cast("string"), 6, "0"),
        ).alias("rrn")
    )
    return fused_counts(df, [(KoreanRRNValidator("rrn"), ["invalid_rrn"])])


# ===========================================================================
# set relations / ratios / grouped freshness / composite quality
# ===========================================================================


@register(
    "distinct_set_relations_orders",
    """
    SELECT string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS observed_statuses,
           CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS n_statuses
    FROM orders
    """,
)
def q_distinct_set_relations_orders(spark, sf_dir):
    """DistinctValuesEqual/ContainSet set algebra (uniqueness/
    distinct_values.py:81,173): bounded collect_set of the distinct values."""
    df = t(spark, sf_dir, "orders")
    return df.agg(
        F.concat_ws(",", F.sort_array(F.collect_set("o_orderstatus"))).alias(
            "observed_statuses"
        ),
        F.countDistinct("o_orderstatus").alias("n_statuses"),
    )


@register(
    "unique_ratio_metrics",
    """
    SELECT
      ROUND(CAST(COUNT(DISTINCT o_custkey) AS DOUBLE) / COUNT(o_custkey), 6) AS custkey_unique_ratio,
      ROUND(CAST(COUNT(DISTINCT o_orderkey) AS DOUBLE) / COUNT(o_orderkey), 6) AS orderkey_unique_ratio,
      CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS priority_cardinality
    FROM orders
    """,
)
def q_unique_ratio_metrics(spark, sf_dir):
    """UniqueRatio + Cardinality observation metrics (uniqueness/unique.py:189,
    profiling/cardinality.py:21)."""
    df = t(spark, sf_dir, "orders")
    return df.agg(
        F.round(
            F.countDistinct("o_custkey").cast("double") / F.count("o_custkey"), 6
        ).alias("custkey_unique_ratio"),
        F.round(
            F.countDistinct("o_orderkey").cast("double") / F.count("o_orderkey"), 6
        ).alias("orderkey_unique_ratio"),
        F.countDistinct("o_orderpriority").alias("priority_cardinality"),
    )


@register(
    "grouped_recent_data_events",
    f"""
    WITH {EV}
    SELECT event_type,
           CAST(FLOOR((epoch(TIMESTAMP '2024-02-15 00:00:00') - epoch(MAX(ts))) / 3600) AS BIGINT) AS age_hours
    FROM ev GROUP BY event_type ORDER BY event_type
    """,
)
def q_grouped_recent_data_events(spark, sf_dir):
    """GroupedRecentData per-group freshness (datetime/freshness.py:211):
    groupBy(g).agg(max(ts)) vs a fixed now."""
    df = t(spark, sf_dir, "events")
    now = F.to_timestamp(F.lit("2024-02-15 00:00:00"))
    return (
        df.groupBy("event_type")
        .agg(
            F.floor((now.cast("double") - F.max("ts").cast("double")) / 3600.0)
            .cast("long")
            .alias("age_hours")
        )
        .orderBy("event_type")
    )


@register(
    "quality_score_documents",
    """
    WITH w AS (
      SELECT doc_id, text,
             string_split(CASE WHEN LEN(TRIM(text)) = 0 THEN '' ELSE
               trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g'))
             END, ' ') AS words,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_words
      FROM documents
    ),
    f AS (
      SELECT doc_id, n_words,
        CASE WHEN len(words) > 0 THEN
          len(list_filter(words, x -> list_contains(['the','a','of','and','to','in','is','that','it','for'], x)))
          / CAST(len(words) AS DOUBLE) ELSE 0.0 END AS stop_r,
        CASE WHEN length(text) > 0 THEN
          len(regexp_extract_all(text, '[^\\x{30}-\\x{39}a-zA-Z_\\s]')) / CAST(length(text) AS DOUBLE)
          ELSE 0.0 END AS punct_r,
        CASE WHEN length(text) > 0 THEN
          len(regexp_extract_all(text, '[0-9]')) / CAST(length(text) AS DOUBLE)
          ELSE 0.0 END AS digit_r,
        CASE WHEN len(words) > 0 THEN len(list_distinct(words)) / CAST(len(words) AS DOUBLE)
             ELSE 0.0 END AS uniq_r
      FROM w
    )
    SELECT doc_id,
      ROUND(LEAST(n_words / 50.0, 1.0) * 0.3
          + LEAST(stop_r * 4.0, 1.0) * 0.2
          + (1.0 - LEAST(punct_r * 5.0, 1.0)) * 0.2
          + (1.0 - LEAST(digit_r * 5.0, 1.0)) * 0.1
          + LEAST(uniq_r * 1.25, 1.0) * 0.2, 6) AS quality_score
    FROM f ORDER BY doc_id
    """,
)
def q_quality_score_documents(spark, sf_dir):
    """Composite 0-1 quality score (pipeline/text.py quality_score) — the
    LLM-curation filter signal, per document."""
    from truthound_spark.pipeline.text import quality_score

    df = t(spark, sf_dir, "documents")
    return (
        quality_score(df, "text")
        .select("doc_id", F.round("quality_score", 6).alias("quality_score"))
        .orderBy("doc_id")
    )


@register(
    "dedup_keep_one_documents",
    f"""
    WITH fp AS (SELECT doc_id, md5({_NORM_SQL.format(c='text')}) AS f FROM documents),
    keep AS (SELECT MIN(doc_id) AS kept FROM fp GROUP BY f)
    SELECT CAST(COUNT(*) AS BIGINT) AS kept_docs, CAST(SUM(kept) AS BIGINT) AS kept_id_sum
    FROM keep
    """,
)
def q_dedup_keep_one_documents(spark, sf_dir):
    """dedup_exact keep-one-representative (pipeline/dedup.py:81-86):
    min-id per fingerprint via a window, verified by count + id-sum."""
    from truthound_spark.pipeline.dedup import dedup_exact

    df = t(spark, sf_dir, "documents")
    kept = dedup_exact(df, "text", "doc_id")
    return kept.agg(
        F.count(F.lit(1)).cast("long").alias("kept_docs"),
        F.sum("doc_id").cast("long").alias("kept_id_sum"),
    )


# ===========================================================================
# anomaly fences / custom expressions / row-level UDF / formats
# ===========================================================================


@register(
    "robust_anomaly_fences_events",
    """
    WITH med AS (SELECT quantile_cont(value, 0.5) AS m FROM events),
    mad AS (SELECT quantile_cont(ABS(value - m), 0.5) AS d FROM events, med),
    q AS (SELECT quantile_cont(value, 0.25) AS q1, quantile_cont(value, 0.75) AS q3,
                 quantile_cont(value, 0.01) AS p01, quantile_cont(value, 0.99) AS p99
          FROM events)
    SELECT
      CAST((SELECT SUM(CASE WHEN ABS(value - m) / (d * 1.4826) > 3.5 THEN 1 ELSE 0 END)
            FROM events, med, mad WHERE value IS NOT NULL) AS BIGINT) AS mad_outliers,
      CAST((SELECT SUM(CASE WHEN value < q1 - 3.0 * (q3 - q1) OR value > q3 + 3.0 * (q3 - q1)
                            THEN 1 ELSE 0 END)
            FROM events, q WHERE value IS NOT NULL) AS BIGINT) AS tukey_far_outliers,
      CAST((SELECT SUM(CASE WHEN value < p01 OR value > p99 THEN 1 ELSE 0 END)
            FROM events, q WHERE value IS NOT NULL) AS BIGINT) AS percentile_outliers
    """,
)
def q_robust_anomaly_fences_events(spark, sf_dir):
    """MAD / Tukey-far / Percentile anomaly fences (reference:
    anomaly/statistical.py:136,385,504) — exact-percentile two-pass plans."""
    df = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    med = df.agg(F.expr("percentile(value, 0.5)").alias("m")).collect()[0]["m"]
    mad = df.agg(
        F.expr(f"percentile(abs(value - {med!r}), 0.5)").alias("d")
    ).collect()[0]["d"]
    q = df.agg(
        F.expr("percentile(value, 0.25)").alias("q1"),
        F.expr("percentile(value, 0.75)").alias("q3"),
        F.expr("percentile(value, 0.01)").alias("p01"),
        F.expr("percentile(value, 0.99)").alias("p99"),
    ).collect()[0]
    iqr = q["q3"] - q["q1"]
    mad_pred = F.abs(F.col("value") - med) / (mad * 1.4826) > 3.5
    tukey_pred = (F.col("value") < q["q1"] - 3.0 * iqr) | (
        F.col("value") > q["q3"] + 3.0 * iqr
    )
    pct_pred = (F.col("value") < q["p01"]) | (F.col("value") > q["p99"])
    return df.agg(
        F.sum(F.when(mad_pred, 1).otherwise(0)).cast("long").alias("mad_outliers"),
        F.sum(F.when(tukey_pred, 1).otherwise(0)).cast("long").alias("tukey_far_outliers"),
        F.sum(F.when(pct_pred, 1).otherwise(0)).cast("long").alias("percentile_outliers"),
    )


@register(
    "custom_expression_counts",
    """
    SELECT
      CAST(SUM(CASE WHEN NOT (o_totalprice > 0) THEN 1 ELSE 0 END) AS BIGINT) AS nonpositive_price,
      CAST(SUM(CASE WHEN o_orderstatus = 'O' AND NOT (o_totalprice < 400000) THEN 1 ELSE 0 END) AS BIGINT) AS open_but_huge,
      CAST(SUM(CASE WHEN NOT (o_totalprice > 0 AND o_custkey >= 0) THEN 1 ELSE 0 END) AS BIGINT) AS multi_condition_violations
    FROM orders
    """,
)
def q_custom_expression_counts(spark, sf_dir):
    """CustomExpression / ConditionalExpression / MultiCondition
    (reference query/expression.py:17,41,103) — engine validators fused."""
    from truthound_spark.validators.query import (
        ConditionalExpressionValidator,
        CustomExpressionValidator,
        MultiConditionValidator,
    )

    df = t(spark, sf_dir, "orders")
    return fused_counts(
        df,
        [
            (CustomExpressionValidator("o_totalprice > 0"), ["nonpositive_price"]),
            (
                ConditionalExpressionValidator("o_orderstatus = 'O'", "o_totalprice < 400000"),
                ["open_but_huge"],
            ),
            (
                MultiConditionValidator(["o_totalprice > 0", "o_custkey >= 0"]),
                ["multi_condition_violations"],
            ),
        ],
    )


@register(
    "row_level_udf_counts",
    """
    SELECT CAST(SUM(CASE WHEN c_custkey % 7 = 0 THEN 0 ELSE 1 END) AS BIGINT) AS udf_violations
    FROM customer
    """,
)
def q_row_level_udf_counts(spark, sf_dir):
    """RowLevelValidator vectorized pandas-UDF surface (reference
    query/expression.py:187): arbitrary per-row Python — here a
    SQL-mirrorable predicate so the oracle can verify the Arrow path."""
    from truthound_spark.validators.query import RowLevelValidator

    df = t(spark, sf_dir, "customer")
    v = RowLevelValidator("c_custkey", lambda s: s % 7 == 0, vectorized=True)
    issues = v.validate(df)
    n = issues[0].count if issues else 0
    return _scalar_df(spark, udf_violations=n)


@register(
    "date_format_violations_derived",
    """
    WITH d AS (
      SELECT CASE WHEN o_orderkey % 83 = 0 THEN strftime(o_orderdate, '%d/%m/%Y')
                  ELSE strftime(o_orderdate, '%Y-%m-%d') END AS ds
      FROM orders
    )
    SELECT CAST(SUM(CASE WHEN try_strptime(ds, '%Y-%m-%d') IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS format_violations
    FROM d
    """,
)
def q_date_format_violations_derived(spark, sf_dir):
    """DateFormat strptime-match (reference datetime/format.py:17): derived
    date strings, every 83rd in the wrong format."""
    df = t(spark, sf_dir, "orders").select(
        F.when(
            F.col("o_orderkey") % 83 == 0,
            F.date_format("o_orderdate", "dd/MM/yyyy"),
        )
        .otherwise(F.date_format("o_orderdate", "yyyy-MM-dd"))
        .alias("ds")
    )
    from truthound_spark.validators.datetime_checks import DateFormatValidator

    return fused_counts(df, [(DateFormatValidator("ds", "yyyy-MM-dd"), ["format_violations"])])


@register(
    "url_uuid_ip_formats_derived",
    """
    WITH d AS (
      SELECT
        CASE WHEN c_custkey % 91 = 0 THEN 'not a url'
             ELSE 'https://example.com/c/' || CAST(c_custkey AS VARCHAR) END AS url,
        CASE WHEN c_custkey % 93 = 0 THEN 'not-a-uuid'
             ELSE substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8) || '-'
                  || substr(md5(CAST(c_custkey AS VARCHAR)), 9, 4) || '-'
                  || substr(md5(CAST(c_custkey AS VARCHAR)), 13, 4) || '-'
                  || substr(md5(CAST(c_custkey AS VARCHAR)), 17, 4) || '-'
                  || substr(md5(CAST(c_custkey AS VARCHAR)), 21, 12) END AS uid,
        CASE WHEN c_custkey % 95 = 0 THEN '999.999.999.999'
             ELSE CAST(c_custkey % 256 AS VARCHAR) || '.' || CAST((c_custkey * 3) % 256 AS VARCHAR)
                  || '.' || CAST((c_custkey * 7) % 256 AS VARCHAR) || '.'
                  || CAST((c_custkey * 11) % 256 AS VARCHAR) END AS ip
      FROM customer
    )
    SELECT
      CAST(SUM(CASE WHEN NOT regexp_matches(url, '^https?://[^\\s/$.?#].[^\\s]*$') THEN 1 ELSE 0 END) AS BIGINT) AS invalid_urls,
      CAST(SUM(CASE WHEN NOT regexp_matches(uid, '^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$') THEN 1 ELSE 0 END) AS BIGINT) AS invalid_uuids,
      CAST(SUM(CASE WHEN NOT regexp_matches(ip, '^((25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\\.){3}(25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)$') THEN 1 ELSE 0 END) AS BIGINT) AS invalid_ips
    FROM d
    """,
)
def q_url_uuid_ip_formats_derived(spark, sf_dir):
    """Url / Uuid / IpAddress format validators (reference string/
    format.py:207,356,378) over derived columns with seeded invalids."""
    from truthound_spark.validators.string import (
        IpAddressValidator,
        UrlValidator,
        UuidValidator,
    )

    k = F.col("c_custkey")
    m = F.md5(k.cast("string"))
    df = t(spark, sf_dir, "customer").select(
        F.when(k % 91 == 0, F.lit("not a url"))
        .otherwise(F.concat(F.lit("https://example.com/c/"), k.cast("string")))
        .alias("url"),
        F.when(k % 93 == 0, F.lit("not-a-uuid"))
        .otherwise(
            F.concat_ws(
                "-",
                F.substring(m, 1, 8),
                F.substring(m, 9, 4),
                F.substring(m, 13, 4),
                F.substring(m, 17, 4),
                F.substring(m, 21, 12),
            )
        )
        .alias("uid"),
        F.when(k % 95 == 0, F.lit("999.999.999.999"))
        .otherwise(
            F.concat_ws(
                ".",
                (k % 256).cast("string"),
                ((k * 3) % 256).cast("string"),
                ((k * 7) % 256).cast("string"),
                ((k * 11) % 256).cast("string"),
            )
        )
        .alias("ip"),
    )
    return fused_counts(
        df,
        [
            (UrlValidator("url"), ["invalid_urls"]),
            (UuidValidator("uid"), ["invalid_uuids"]),
            (IpAddressValidator("ip"), ["invalid_ips"]),
        ],
    )


@register(
    "sql_view_query_counts",
    """
    SELECT CAST((SELECT COUNT(*) FROM orders WHERE o_totalprice > 300000) AS BIGINT) AS big_orders,
           CAST((SELECT COUNT(*) FROM orders WHERE o_orderstatus NOT IN ('O', 'F', 'P')) AS BIGINT) AS bad_status_rows
    """,
)
def q_sql_view_query_counts(spark, sf_dir):
    """QuerySQL family path: user SQL over a temp view through spark.sql
    (reference query/base.py:59; engine _SQLBase._run)."""
    df = t(spark, sf_dir, "orders")
    df.createOrReplaceTempView("data")
    big = df.sparkSession.sql(
        "SELECT COUNT(*) AS n FROM data WHERE o_totalprice > 300000"
    ).collect()[0]["n"]
    bad = df.sparkSession.sql(
        "SELECT COUNT(*) AS n FROM data WHERE o_orderstatus NOT IN ('O', 'F', 'P')"
    ).collect()[0]["n"]
    return _scalar_df(spark, big_orders=int(big), bad_status_rows=int(bad))
