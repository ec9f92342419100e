"""Entry-query registry section 7 (split from the single entry_queries module, r13). Import order = registration order = the original module's order."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from truthound_spark.entry_queries._core import (  # noqa: F401
    EV,
    ORACLES,
    _URL_RAW_SQL,
    _ab_variant_sql,
    _media_df,
    _replay_dump_dir,
    _scalar_df,
    register,
    t,
)



@register(
    "media_audio_features",
    """
    WITH m AS (
      SELECT doc_id AS asset_id, md5(text) AS h,
             octet_length(encode(text)) AS nbytes
      FROM documents WHERE doc_id < 50
    ),
    v AS (
      SELECT asset_id, nbytes,
             (instr('0123456789abcdef', substr(h, 1, 1)) - 1) * 16
               + (instr('0123456789abcdef', substr(h, 2, 1)) - 1) AS b0,
             (instr('0123456789abcdef', substr(h, 3, 1)) - 1) * 16
               + (instr('0123456789abcdef', substr(h, 4, 1)) - 1) AS b1
      FROM m
    )
    SELECT asset_id,
           CAST(CASE b0 % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
                            WHEN 2 THEN 22050 ELSE 44100 END AS INT)
             AS sample_rate,
           ROUND(nbytes / 1000.0, 3) AS duration_s,
           CAST(1 + b1 % 2 AS INT) AS channels
    FROM v ORDER BY asset_id
    """,
)
def q_media_audio_features(spark, sf_dir):
    """Audio decode/feature-extract plumbing via mapInPandas
    (pipeline/multimodal.py extract_audio_features — the audio sibling
    of the image slot): deterministic fake decoder (md5-derived rate/
    channels, byte-length duration) lets the oracle verify the full
    Arrow-batch pipeline; librosa drops into the same decoder slot."""
    from truthound_spark.pipeline.multimodal import extract_audio_features

    media = _media_df(spark, sf_dir).filter(F.col("asset_id") < 50)
    feats = extract_audio_features(media)
    return feats.select(
        "asset_id", "sample_rate", F.round("duration_s", 3).alias("duration_s"),
        "channels",
    ).orderBy("asset_id")


@register(
    "media_audio_chunks",
    """
    WITH m AS (
      SELECT doc_id AS asset_id, text,
             GREATEST(1, CAST(CEIL(octet_length(encode(text)) / 64.0) AS INT))
               AS n_chunks
      FROM documents WHERE doc_id < 20
    )
    -- series bound 4095 caps verifiable docs at 256 KiB of text
    -- (generate_series can't take a lateral column bound in DuckDB);
    -- chunk_audio itself has no such cap
    SELECT asset_id, gs.i AS chunk_index, n_chunks,
           md5(text || ':' || CAST(gs.i AS VARCHAR)) AS chunk_fingerprint
    FROM m, generate_series(0, 4095) AS gs(i)
    WHERE gs.i < n_chunks
    ORDER BY asset_id, chunk_index
    """,
)
def q_media_audio_chunks(spark, sf_dir):
    """Audio segmentation plumbing (pipeline/multimodal.py chunk_audio):
    one row per fixed-size chunk — ceil(bytes/chunk) fan-out with
    deterministic per-chunk fingerprints, the bounded-work-unit pre-step
    for ASR/diarization at corpus scale."""
    from truthound_spark.pipeline.multimodal import chunk_audio

    media = _media_df(spark, sf_dir).filter(F.col("asset_id") < 20)
    # 64-byte chunks so the multi-chunk fan-out is actually
    # exercised at verify scale (4096 would make every doc 1 chunk)
    chunks = chunk_audio(media, chunk_bytes=64)
    return chunks.select(
        "asset_id",
        F.col("chunk_index").cast("long").alias("chunk_index"),
        F.col("n_chunks").cast("int").alias("n_chunks"),
        "chunk_fingerprint",
    ).orderBy("asset_id", "chunk_index")


@register(
    "media_resize_images",
    """
    SELECT doc_id AS asset_id, CAST(224 AS INT) AS width,
           CAST(224 AS INT) AS height,
           md5(text || ':224x224') AS resized_fingerprint
    FROM documents WHERE doc_id < 20
    ORDER BY asset_id
    """,
)
def q_media_resize_images(spark, sf_dir):
    """Image resize plumbing (pipeline/multimodal.py resize_images):
    mapInPandas payload → resized payload at the target geometry plus a
    lineage fingerprint of (original, dims); PIL drops into the resizer
    slot unchanged. The oracle verifies the fingerprint fan-through
    (payload bytes stay executor-side)."""
    from truthound_spark.pipeline.multimodal import resize_images

    media = _media_df(spark, sf_dir).filter(F.col("asset_id") < 20)
    out = resize_images(media, width=224, height=224)
    return out.select(
        "asset_id", "width", "height", "resized_fingerprint"
    ).orderBy("asset_id")


_BITEXT_FILTER_ORACLE = (
    "WITH pairs AS (\n"
    + ORACLES["bitext_mining_embeddings"].replace("ORDER BY f.src_id", "")
    + """),
    d AS (SELECT CAST(doc_id AS BIGINT) AS id, CAST(n_chars AS BIGINT) AS len
          FROM documents)
    SELECT p.src_id, p.tgt_id, p.cosine, p.margin,
           ds.len AS src_len, dt.len AS tgt_len,
           ROUND(GREATEST(ds.len, dt.len)
                 / CAST(LEAST(ds.len, dt.len) AS DOUBLE), 6) AS len_ratio
    FROM pairs p JOIN d ds ON p.src_id = ds.id JOIN d dt ON p.tgt_id = dt.id
    WHERE ds.len >= 1 AND dt.len >= 1
      AND ROUND(GREATEST(ds.len, dt.len)
                / CAST(LEAST(ds.len, dt.len) AS DOUBLE), 6) <= 1.5
    ORDER BY p.src_id
    """
)


@register("bitext_filtered_pairs_embeddings", _BITEXT_FILTER_ORACLE)
def q_bitext_filtered_pairs_embeddings(spark, sf_dir):
    """CCMatrix-style post-filter over mined pairs (pipeline/align.py
    filter_bitext_pairs; Schwenk et al. 2021 §3.3): after margin
    mining, keep only pairs whose side lengths are comparable
    (max/min ≤ 1.5 here) — the cheap noise gate before MT training.
    Lengths join in from the documents table (vec_id aligns with
    doc_id); payloads never ride the join (id/len projections only)."""
    from truthound_spark.pipeline.align import filter_bitext_pairs, mine_bitext

    emb = t(spark, sf_dir, "embeddings")
    docs = t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("vec_id"), "n_chars"
    )
    pairs = mine_bitext(
        emb.filter(F.col("vec_id") % 2 == 0),
        emb.filter(F.col("vec_id") % 2 == 1),
        k=4,
    )
    return filter_bitext_pairs(
        pairs,
        docs.filter(F.col("vec_id") % 2 == 0),
        docs.filter(F.col("vec_id") % 2 == 1),
        len_col="n_chars",
        max_len_ratio=1.5,
    ).orderBy("src_id")


@register(
    "canonical_url_dedup_customer",
    f"""
    WITH raw AS (SELECT c_custkey AS id, {_URL_RAW_SQL} AS u FROM customer),
    parts AS (
      SELECT id,
        lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
        lower(regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1))
          AS host0,
        regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)', 1)
          AS path0,
        regexp_extract(u, '\\?([^#]*)', 1) AS query
      FROM raw
    ),
    norm AS (
      SELECT id, scheme,
        CASE WHEN scheme = 'http' AND host0 LIKE '%:80'
               THEN regexp_replace(host0, ':80$', '')
             WHEN scheme = 'https' AND host0 LIKE '%:443'
               THEN regexp_replace(host0, ':443$', '')
             ELSE host0 END AS host,
        CASE WHEN length(path0) > 1 AND path0 LIKE '%/'
               THEN regexp_replace(path0, '/$', '')
             ELSE path0 END AS path,
        array_to_string(list_sort(list_filter(string_split(query, '&'),
          x -> length(x) > 0 AND NOT (
            starts_with(lower(x), 'utm_') OR starts_with(lower(x), 'fbclid=')
            OR starts_with(lower(x), 'gclid=')
            OR starts_with(lower(x), 'msclkid=')
            OR starts_with(lower(x), 'mc_eid=')
            OR starts_with(lower(x), 'ref=')))), '&') AS q
      FROM parts
    ),
    canon AS (
      SELECT scheme || '://' || host || path
               || CASE WHEN length(q) > 0 THEN '?' || q ELSE '' END
               AS url_canonical
      FROM norm
    )
    SELECT url_canonical, CAST(COUNT(*) AS BIGINT) AS dup_count
    FROM canon GROUP BY 1 HAVING COUNT(*) > 1
    ORDER BY url_canonical
    """,
)
def q_canonical_url_dedup_customer(spark, sf_dir):
    """URL canonicalization → exact-dedup key (pipeline/text.py
    canonicalize_url — the CommonCrawl/C4 first dedup pass): derived
    URLs with mixed-case scheme/host, default ports, trailing slashes,
    unsorted + tracking query params, and fragments all collapse onto
    one canonical form; the oracle recomputes the normalization
    independently in SQL. Output = canonical URLs fetched more than
    once + their multiplicity (the dedup mass)."""
    from truthound_spark.pipeline.text import canonicalize_url

    c = t(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    raw = F.concat(
        F.when(k % 2 == 0, F.lit("HTTP")).otherwise(F.lit("https")),
        F.lit("://WWW.Example"),
        (k % 5).cast("string"),
        F.lit(".COM"),
        F.when(k % 2 == 0, F.lit(":80")).otherwise(F.lit(":443")),
        F.lit("/Products/"),
        (k % 7).cast("string"),
        F.when(k % 3 == 0, F.lit("/")).otherwise(F.lit("")),
        F.lit("?utm_source=news&b="),
        (k % 3).cast("string"),
        F.lit("&a=1"),
        F.when(k % 4 == 0, F.lit("&gclid=xyz")).otherwise(F.lit("")),
        F.lit("#frag"),
    )
    return (
        c.select(canonicalize_url(raw).alias("url_canonical"))
        .groupBy("url_canonical")
        .agg(F.count(F.lit(1)).cast("long").alias("dup_count"))
        .filter(F.col("dup_count") > 1)
        .orderBy("url_canonical")
    )


@register(
    "cvm_grouped_events",
    """
    WITH ub AS (
      SELECT COALESCE(CAST(event_type AS VARCHAR), '__null__') AS g, value AS v,
             0 AS s
      FROM events WHERE event_id % 2 = 0 AND value IS NOT NULL
      UNION ALL
      SELECT COALESCE(CAST(event_type AS VARCHAR), '__null__') AS g, value AS v,
             1 AS s
      FROM events WHERE event_id % 2 = 1 AND value IS NOT NULL
    ),
    u AS (
      SELECT g, v,
             SUM(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS gb,
             SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS gc
      FROM ub GROUP BY g, v
    ),
    e AS (
      SELECT g, gb, gc,
             SUM(gb) OVER (PARTITION BY g ORDER BY v
                           ROWS UNBOUNDED PRECEDING) AS cb,
             SUM(gc) OVER (PARTITION BY g ORDER BY v
                           ROWS UNBOUNDED PRECEDING) AS cc,
             SUM(gb) OVER (PARTITION BY g) AS n,
             SUM(gc) OVER (PARTITION BY g) AS m
      FROM u
    ),
    agg AS (
      SELECT g, MAX(n) AS n_base, MAX(m) AS n_cur,
             SUM((gb + gc) * cb * cb) AS sbb,
             SUM((gb + gc) * cb * cc) AS sbc,
             SUM((gb + gc) * cc * cc) AS scc
      FROM e GROUP BY g
    ),
    st AS (
      SELECT g, n_base, n_cur,
             CASE WHEN n_base = 0 OR n_cur = 0 THEN NULL
                  ELSE (CAST(n_base AS DOUBLE) * n_cur
                        / POW(n_base + n_cur, 2))
                       * (sbb / CAST(n_base * n_base AS DOUBLE)
                          - 2 * sbc / CAST(n_base * n_cur AS DOUBLE)
                          + scc / CAST(n_cur * n_cur AS DOUBLE))
             END AS t
      FROM agg
    )
    SELECT g AS "group", CAST(n_base AS BIGINT) AS n_base,
           CAST(n_cur AS BIGINT) AS n_cur,
           ROUND(t, 6) AS cvm, t > 0.461 AS drifted
    FROM st ORDER BY "group"
    """,
)
def q_cvm_grouped_events(spark, sf_dir):
    """Per-segment Cramér–von Mises (drift/detectors.py cvm_grouped):
    T = n·m/(n+m)² · Σ g(x)·(F_b−F_c)² per event_type from ONE
    (group, value) ECDF merge — the squared-difference sum expands into
    three exact integer aggregate scalars, cumulative/total sums ride
    two window specs over one group-partitioned sort; values pinned
    bit-identical to cramer_von_mises() per slice."""
    from truthound_spark.drift.detectors import cvm_grouped

    ev = t(spark, sf_dir, "events")
    return cvm_grouped(
        ev.filter(F.col("event_id") % 2 == 0),
        ev.filter(F.col("event_id") % 2 == 1),
        "value",
        "event_type",
    ).orderBy("group")


@register(
    "ab_experiment_customer",
    "SELECT * FROM (\n"
    + _ab_variant_sql("loose", -1000.0)
    + "\nUNION ALL\n"
    + _ab_variant_sql("overtight", 500.0)
    + "\nUNION ALL\n"
    + _ab_variant_sql("strict", 0.0)
    + "\n) ORDER BY variant",
)
def q_ab_experiment_customer(spark, sf_dir):
    """A/B threshold-experiment fused evaluation (profiler/ab_testing.py
    variant_metrics_df; reference profiler/ab_testing/experiment.py
    default-validation semantics): three min_value variants over
    c_acctbal — 'loose' flags nothing, 'strict' flags exactly the
    negative balances (the planted is_bad label, so perfect
    precision/recall), 'overtight' over-flags. ALL variants' violation
    and confusion metrics come from ONE fused aggregate scan (the
    reference loops a full validation pass per variant); the oracle
    recomputes every count and ratio independently. Scan count: 1."""
    from truthound_spark.profiler.ab_testing import (
        ThresholdVariant,
        variant_metrics_df,
    )

    c = t(spark, sf_dir, "customer").withColumn(
        "is_bad", F.col("c_acctbal") < 0
    )
    variants = [
        ThresholdVariant(
            name="loose", thresholds={"c_acctbal": {"min_value": -1000.0}}
        ),
        ThresholdVariant(
            name="strict", thresholds={"c_acctbal": {"min_value": 0.0}}
        ),
        ThresholdVariant(
            name="overtight", thresholds={"c_acctbal": {"min_value": 500.0}}
        ),
    ]
    return variant_metrics_df(
        c, variants, columns=["c_acctbal"], label_col="is_bad"
    ).orderBy("variant")


@register(
    "streaming_drift_monitor_events",
    f"""
    WITH {EV},
    b AS (
      SELECT CAST(value AS DOUBLE) AS v FROM ev WHERE event_id % 2 = 0
    ),
    nb AS (
      SELECT COUNT(*) AS total, COUNT(v) AS nv, AVG(v) AS m,
             STDDEV_SAMP(v) AS s, MIN(v) AS lo, MAX(v) AS hi
      FROM b
    ),
    cur AS (
      SELECT (event_id % 8 - 1) / 2 AS batch_id,
             CASE WHEN event_id % 8 IN (5, 7)
                  THEN CAST(value AS DOUBLE) * 1.5
                  ELSE CAST(value AS DOUBLE) END AS v
      FROM ev WHERE event_id % 2 = 1
    ),
    nc AS (
      SELECT batch_id, COUNT(*) AS total, COUNT(v) AS nv, AVG(v) AS m,
             STDDEV_SAMP(v) AS s, MIN(v) AS lo, MAX(v) AS hi
      FROM cur GROUP BY batch_id
    ),
    scored AS (
      SELECT nc.batch_id,
        GREATEST(
          LEAST(1.0, ABS(nc.m - nb.m)
            / (CASE WHEN nb.s IS NULL OR nb.s = 0 THEN 1.0 ELSE nb.s END)
            / 3.0),
          CASE WHEN nb.s > 0 THEN LEAST(1.0, ABS(nc.s / nb.s - 1.0))
               ELSE 0.0 END,
          CASE WHEN nc.lo < nb.lo OR nc.hi > nb.hi THEN 0.5 ELSE 0.0 END,
          CASE WHEN ABS((nc.total - nc.nv) / CAST(nc.total AS DOUBLE)
                        - (nb.total - nb.nv) / CAST(nb.total AS DOUBLE)) > 0.1
               THEN ABS((nc.total - nc.nv) / CAST(nc.total AS DOUBLE)
                        - (nb.total - nb.nv) / CAST(nb.total AS DOUBLE))
               ELSE 0.0 END
        ) AS raw
      FROM nc, nb
    )
    SELECT CAST(batch_id AS BIGINT) AS batch_id,
           'feature' AS detector,
           ROUND(raw, 6) AS drift_score,
           raw >= 0.05 AS is_drifted
    FROM scored ORDER BY batch_id
    """,
)
def q_streaming_drift_monitor_events(spark, sf_dir):
    """Streaming drift monitoring replayed batch-by-batch
    (streaming/monitor.py StreamingDriftSink; reference
    ml/monitoring/monitor.py record/evaluate loop): a
    FeatureDriftDetector is fitted ONCE on the baseline half of events
    (O(columns) driver state, the baseline is never re-scanned), then
    the sink is invoked exactly as Structured Streaming's foreachBatch
    would — four micro-batches (the last two with a planted 1.5× value
    scale) plus a REPLAYED batch_id 0 that the high-water-mark
    idempotence guard must drop. The oracle recomputes every batch's
    detect() score relationally over the same batch boundaries — the
    slot certifies the per-batch drift math AND the replay bookkeeping
    (4 output rows, not 5). VERDICT r9 #6."""
    from truthound_spark.ml.feature_drift import FeatureDriftDetector
    from truthound_spark.streaming.monitor import StreamingDriftSink

    ev = t(spark, sf_dir, "events")
    base = ev.filter(F.col("event_id") % 2 == 0).select(
        F.col("value").cast("double").alias("value")
    )
    det = FeatureDriftDetector(threshold=0.05).fit(base)
    sink = StreamingDriftSink({"feature": det}, min_rows=100)
    for k in range(4):
        batch = ev.filter(F.col("event_id") % 8 == 2 * k + 1).select(
            (
                F.col("value") * 1.5 if k >= 2 else F.col("value")
            ).cast("double").alias("value")
        )
        sink(batch, k)
    # crash-recovery replay of the first batch: must be a no-op
    sink(
        ev.filter(F.col("event_id") % 8 == 1).select(
            F.col("value").cast("double").alias("value")
        ),
        0,
    )
    rows = [
        (int(d.batch_id), d.detector, round(d.drift_score, 6), bool(d.is_drifted))
        for d in sink.detections
    ]
    schema = (
        "batch_id long, detector string, drift_score double, is_drifted boolean"
    )
    return spark.createDataFrame(rows, schema).orderBy("batch_id")


@register(
    "es_dump_replay_customer",
    """
    SELECT c_custkey AS custkey, c_name AS name,
           CAST(c_acctbal AS DOUBLE) AS acctbal,
           c_mktsegment AS segment,
           CAST(epoch(TIMESTAMP '2020-01-01 00:00:00'
                + (c_custkey % 365) * INTERVAL 1 DAY) AS BIGINT)
             AS epoch_joined
    FROM customer WHERE c_custkey % 5 = 0 ORDER BY custkey
    """,
)
def q_es_dump_replay_customer(spark, sf_dir):
    """Elasticsearch dump replay end-to-end (sources/es_dump.py
    read_es_dump; reference datasources/nosql/elasticsearch.py): a
    hits-format NDJSON export is DERIVED from the customer table
    executor-side (to_json over nested structs, written as text — no
    driver collect), then replayed through the real source: format
    auto-detect, _source explode, nested-object flatten ('_'
    separator), and mapping-driven casts (keyword/long/double/date —
    the date column lands as a timestamp from its ISO string). The
    oracle recomputes every projected value straight from customer, so
    a cast or flatten defect anywhere in the replay path breaks the
    hash. Scan count: 1 write + 2 reads of the fixture (inference +
    replay) — fixture-sized, not corpus-sized."""
    from truthound_spark.sources.es_dump import read_es_dump

    c = t(spark, sf_dir, "customer").filter(F.col("c_custkey") % 5 == 0)
    k = F.col("c_custkey")
    joined_iso = F.date_format(
        F.date_add(F.lit("2020-01-01").cast("date"), (k % 365).cast("int")),
        "yyyy-MM-dd'T'HH:mm:ss",
    )
    line = F.to_json(
        F.struct(
            F.lit("customers").alias("_index"),
            k.cast("string").alias("_id"),
            F.struct(
                k.alias("custkey"),
                F.col("c_name").alias("name"),
                F.col("c_acctbal").cast("double").alias("acctbal"),
                F.struct(
                    F.col("c_mktsegment").alias("segment"),
                    joined_iso.alias("joined"),
                ).alias("profile"),
            ).alias("_source"),
        )
    )
    path = _replay_dump_dir(sf_dir, "es")
    c.select(line.alias("value")).write.mode("overwrite").text(path)
    mapping = {
        "properties": {
            "custkey": {"type": "long"},
            "name": {"type": "keyword"},
            "acctbal": {"type": "double"},
            "profile": {
                "properties": {
                    "segment": {"type": "keyword"},
                    "joined": {"type": "date"},
                }
            },
        }
    }
    replayed = read_es_dump(spark, path, format="auto", mapping=mapping)
    return replayed.select(
        F.col("custkey"),
        F.col("name"),
        F.col("acctbal"),
        F.col("profile_segment").alias("segment"),
        F.unix_timestamp("profile_joined").alias("epoch_joined"),
    ).orderBy("custkey")


@register(
    "mongo_dump_replay_customer",
    """
    SELECT lower(lpad(to_hex(c_custkey), 24, '0')) AS oid,
           c_custkey AS custkey,
           CAST(c_acctbal AS DOUBLE) AS acctbal,
           c_mktsegment AS segment,
           CAST(epoch(TIMESTAMP '2020-01-01 00:00:00'
                + (c_custkey % 365) * INTERVAL 1 DAY) AS BIGINT)
             AS epoch_joined
    FROM customer WHERE c_custkey % 7 = 3 ORDER BY custkey
    """,
)
def q_mongo_dump_replay_customer(spark, sf_dir):
    """MongoDB extended-JSON dump replay end-to-end
    (sources/mongo_dump.py read_mongo_dump; reference
    datasources/nosql/mongodb.py _normalize_document:475-514): a
    mongoexport-style NDJSON dump is derived from customer
    executor-side with canonical extended-JSON wrappers — $oid,
    $numberLong, and the canonical $date:{$numberLong:"<ms>"} — then
    replayed through the real source, whose recursive wrapper
    normalization must land ObjectId→string, $numberLong→bigint and
    $date→timestamp. The oracle recomputes every value from customer
    (the oid hex from to_hex, the epoch from the same date math), so
    any wrapper-unwrap defect breaks the hash."""
    from truthound_spark.sources.mongo_dump import read_mongo_dump

    c = t(spark, sf_dir, "customer").filter(F.col("c_custkey") % 7 == 3)
    k = F.col("c_custkey")
    epoch_joined = (
        F.lit(1577836800)  # 2020-01-01T00:00:00Z
        + (k % 365).cast("long") * F.lit(86400)
    )
    line = F.to_json(
        F.struct(
            F.struct(
                F.lower(F.lpad(F.hex(k), 24, "0")).alias("$oid")
            ).alias("_id"),
            F.struct(k.cast("string").alias("$numberLong")).alias("custkey"),
            F.col("c_acctbal").cast("double").alias("acctbal"),
            F.struct(
                F.struct(
                    (epoch_joined * 1000).cast("string").alias("$numberLong")
                ).alias("$date")
            ).alias("joined"),
            F.col("c_mktsegment").alias("segment"),
        )
    )
    path = _replay_dump_dir(sf_dir, "mongo")
    c.select(line.alias("value")).write.mode("overwrite").text(path)
    replayed = read_mongo_dump(spark, path)
    return replayed.select(
        F.col("_id").alias("oid"),
        F.col("custkey"),
        F.col("acctbal"),
        F.col("segment"),
        F.unix_timestamp("joined").alias("epoch_joined"),
    ).orderBy("custkey")


@register(
    "quality_gate_orders",
    """
    WITH facts AS (
      SELECT
        CAST((SELECT COUNT(*) FROM (
          SELECT o_custkey FROM orders GROUP BY o_custkey HAVING COUNT(*) > 1
        )) > 0 AS BOOLEAN) AS dup_exists,
        CAST((SELECT COUNT(*) FROM orders WHERE o_totalprice > 100000.0) > 0
          AS BOOLEAN) AS range_exists
    )
    SELECT * FROM (
      SELECT 'lenient' AS gate_id,
        CASE WHEN range_exists THEN 'warning' ELSE 'passed' END AS status,
        CAST(0 AS BIGINT) AS blocking_count,
        CAST(CASE WHEN range_exists THEN 1 ELSE 0 END AS BIGINT)
          AS warning_count,
        CAST(CASE WHEN dup_exists THEN 1 ELSE 0 END AS BIGINT)
          AS informational_count,
        CAST((CASE WHEN dup_exists THEN 1 ELSE 0 END)
             + (CASE WHEN range_exists THEN 1 ELSE 0 END) AS BIGINT)
          AS issue_count
      FROM facts
      UNION ALL
      SELECT 'strict',
        CASE WHEN dup_exists OR range_exists THEN 'blocked'
             ELSE 'passed' END,
        CAST((CASE WHEN dup_exists THEN 1 ELSE 0 END)
             + (CASE WHEN range_exists THEN 1 ELSE 0 END) AS BIGINT),
        CAST(0 AS BIGINT),
        CAST(0 AS BIGINT),
        CAST((CASE WHEN dup_exists THEN 1 ELSE 0 END)
             + (CASE WHEN range_exists THEN 1 ELSE 0 END) AS BIGINT)
      FROM facts
    ) ORDER BY gate_id
    """,
)
def q_quality_gate_orders(spark, sf_dir):
    """Quality-gate evaluation end-to-end (quality_gates.py
    evaluate_quality_gate; reference gates.py:37-243): ONE real check()
    run over orders (fused agg — duplicate o_custkey + planted
    out-of-range o_totalprice both fire) is projected through TWO
    policies: 'strict' (default blocking → status ladder lands on
    blocked) and 'lenient' (out_of_range → warning, duplicate_values →
    informational → lands on warning). The oracle recomputes the
    planted facts from orders and replays the disposition arithmetic
    and status ladder in SQL — a defect in either the run's issue
    detection or the gate classification breaks the hash."""
    from truthound_spark import api
    from truthound_spark.quality_gates import (
        QualityGatePolicy,
        evaluate_quality_gate,
    )
    from truthound_spark.validators.distribution import RangeValidator
    from truthound_spark.validators.uniqueness import UniqueValidator

    df = t(spark, sf_dir, "orders")
    run = api.check(
        df,
        validators=[
            UniqueValidator(columns=["o_custkey"]),
            RangeValidator(column="o_totalprice", min_value=0.0, max_value=100000.0),
        ],
    )
    strict = evaluate_quality_gate(run, gate_id="strict")
    lenient = evaluate_quality_gate(
        run,
        gate_id="lenient",
        policy=QualityGatePolicy(
            issue_type_dispositions={
                "out_of_range": "warning",
                "duplicate_values": "informational",
            }
        ),
    )
    rows = [
        (
            g.gate_id,
            g.status,
            len(g.blocking_failures),
            len(g.warnings),
            g.informational_count,
            g.summary["issue_count"],
        )
        for g in (lenient, strict)
    ]
    return spark.createDataFrame(
        rows,
        "gate_id string, status string, blocking_count long, "
        "warning_count long, informational_count long, issue_count long",
    ).orderBy("gate_id")


@register(
    "sdk_custom_validators_customer",
    """
    SELECT name, cnt, non_null FROM (
      SELECT 'acctbal_positive' AS name,
        CAST((SELECT COUNT(*) FROM customer
              WHERE c_acctbal <= 0 AND c_acctbal IS NOT NULL) AS BIGINT)
          AS cnt,
        CAST((SELECT COUNT(c_acctbal) FROM customer) AS BIGINT) AS non_null
      UNION ALL
      SELECT 'segment_not_building',
        CAST((SELECT COUNT(*) FROM customer
              WHERE NOT (c_mktsegment <> 'BUILDING')
                AND c_mktsegment IS NOT NULL) AS BIGINT),
        CAST((SELECT COUNT(c_mktsegment) FROM customer) AS BIGINT)
    ) ORDER BY name
    """,
)
def q_sdk_custom_validators_customer(spark, sf_dir):
    """Custom-validator SDK executed end-to-end (sdk.py @validator
    decorator + ValidatorBuilder; reference decorators.py +
    sdk/builder.py:64): a decorator-defined predicate validator and a
    fluent-builder .must() validator BOTH compile into the same fused
    single-aggregate plan as the built-ins (their ExpressionSpecs ride
    one df.agg), and the oracle recomputes each violation count + the
    non-null denominator independently — certifying the SDK's
    predicate-to-spec compilation, not just its registration."""
    from truthound_spark.core.executor import BatchExpressionExecutor
    from truthound_spark.sdk import ValidatorBuilder, validator

    @validator("acctbal_positive")
    def acctbal_positive(col):
        return col <= 0  # violation predicate

    built = (
        ValidatorBuilder("segment_not_building")
        .column("c_mktsegment")
        .must(lambda c: c != "BUILDING")
        .build()
    )
    df = t(spark, sf_dir, "customer")
    issues, stats = BatchExpressionExecutor(
        [acctbal_positive("c_acctbal"), built]
    ).execute_with_stats(df)
    by_name = {
        i.issue_type.replace("_violation", ""): i for i in issues
    }
    nn = {
        "acctbal_positive": df.agg(F.count("c_acctbal")).collect()[0][0],
        "segment_not_building": df.agg(F.count("c_mktsegment")).collect()[0][0],
    }
    rows = [
        (name, int(by_name[name].count) if name in by_name else 0, int(nn[name]))
        for name in ("acctbal_positive", "segment_not_building")
    ]
    return spark.createDataFrame(
        rows, "name string, cnt long, non_null long"
    ).orderBy("name")


@register(
    "adopted_rows_roundtrip",
    """
    SELECT * FROM (
      SELECT 'dict' AS src, * FROM (VALUES (1, 'a', 10), (2, 'b', 20),
        (3, 'c', 30)) AS t(id, tag, amount)
      UNION ALL
      SELECT 'list', * FROM (VALUES (1, 'a', 10), (2, 'b', 20),
        (3, 'c', 30)) AS t(id, tag, amount)
      UNION ALL
      SELECT 'pandas', * FROM (VALUES (1, 'a', 10), (2, 'b', 20),
        (3, 'c', 30)) AS t(id, tag, amount)
    ) ORDER BY src, id
    """,
)
def q_adopted_rows_roundtrip(spark, sf_dir):
    """In-memory adoption paths (adapters.py to_dataframe; reference
    adapters.py dict/pandas/list handling): the SAME three rows adopted
    as a dict-of-columns, a list of row dicts, and a pandas DataFrame
    must land as identical Spark rows — the oracle is the literal
    VALUES relation. Certifies column ordering, row assembly, and type
    mapping across all three adoption shapes."""
    import pandas as pd

    from truthound_spark.adapters import to_dataframe

    data_dict = {"id": [1, 2, 3], "tag": ["a", "b", "c"], "amount": [10, 20, 30]}
    data_list = [
        {"id": 1, "tag": "a", "amount": 10},
        {"id": 2, "tag": "b", "amount": 20},
        {"id": 3, "tag": "c", "amount": 30},
    ]
    data_pd = pd.DataFrame(data_dict)
    out = None
    for src, data in (("dict", data_dict), ("list", data_list), ("pandas", data_pd)):
        adopted = to_dataframe(data, spark).select(
            F.lit(src).alias("src"),
            F.col("id").cast("int").alias("id"),
            F.col("tag"),
            F.col("amount").cast("int").alias("amount"),
        )
        out = adopted if out is None else out.unionAll(adopted)
    return out.orderBy("src", "id")


@register(
    "kafka_envelope_decode_events",
    f"""
    WITH {EV}
    SELECT 'events' AS topic,
           CAST(event_id % 4 AS INTEGER) AS partition,
           event_id AS "offset",
           event_id AS evt_id,
           event_type,
           CAST(value AS DOUBLE) AS value
    FROM ev ORDER BY "offset"
    """,
)
def q_kafka_envelope_decode_events(spark, sf_dir):
    """Kafka message-envelope decode (streaming/sources.py
    decode_kafka_envelope; reference realtime/kafka source shape): a
    kafka-SHAPED frame — (topic, partition, offset, timestamp, value
    BYTES) — is derived from events executor-side (payload =
    to_json(...) cast binary, exactly what a producer would have
    written), then run through the IDENTICAL decode plan the live
    broker reader uses: from_json over the declared value schema next
    to the passthrough metadata, map-only, JVM-side. The oracle
    recomputes every decoded field straight from events — a defect in
    the envelope projection or the JSON decode breaks the hash."""
    from truthound_spark.streaming.sources import decode_kafka_envelope

    ev = t(spark, sf_dir, "events")
    kafka_shaped = ev.select(
        F.lit("events").alias("topic"),
        (F.col("event_id") % 4).cast("int").alias("partition"),
        F.col("event_id").alias("offset"),
        F.col("ts").alias("timestamp"),
        F.to_json(
            F.struct(
                F.col("event_id").alias("evt_id"),
                F.col("event_type"),
                F.col("value").cast("double").alias("value"),
            )
        )
        .cast("binary")
        .alias("value"),
    )
    decoded = decode_kafka_envelope(
        kafka_shaped, "evt_id long, event_type string, value double"
    )
    return decoded.select(
        "topic", "partition", "offset", "evt_id", "event_type", "value"
    ).orderBy("offset")


@register(
    "streaming_near_dedup_customer",
    """
    SELECT c_custkey + 10000000 AS doc_id,
           c_custkey AS dup_of,
           CAST(1.0 AS DOUBLE) AS est_jaccard
    FROM customer WHERE c_custkey % 11 = 5 ORDER BY doc_id
    """,
)
def q_streaming_near_dedup_customer(spark, sf_dir):
    """Streaming near-duplicate detection driven through a REAL
    Structured Streaming query with a live state store
    (streaming/stateful.py streaming_near_dedup; reference
    realtime/processors dedup shape): batch 1 ingests one uniquely-texted
    doc per selected customer (all become bucket canonicals — texts are
    pairwise distinct, so no within-batch order dependence), batch 2
    ingests an EXACT duplicate of each under a shifted doc_id. The
    per-bucket canonical signatures must survive the micro-batch
    boundary in the state store, and each batch-2 doc must alert
    against its batch-1 canonical with signature agreement EXACTLY 1.0
    (identical text ⇒ identical 64-hash signature — the only way est
    reaches 1.0, so filtering on it is order- and engine-independent;
    near-misses between distinct texts cannot produce it). Alerts are
    collapsed across a doc's LSH buckets to DISTINCT (doc_id, dup_of).
    The oracle is the planted pairing recomputed from customer. File
    mtimes are set explicitly so maxFilesPerTrigger=1 yields the batch
    order the state-store semantics are being certified against."""
    import json as _json
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile
    import uuid as _uuid

    from truthound_spark.streaming.stateful import streaming_near_dedup

    c = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 11 == 5)
        .select("c_custkey")
        .collect()
    )  # fixture-sized driver collect: one id per planted doc
    keys = sorted(r["c_custkey"] for r in c)

    def text_for(k: int) -> str:
        return (
            f"alpha tok{k} beta tok{k % 7} gamma tok{k % 11} "
            f"delta tok{k % 13} epsilon"
        )

    root = _os.path.join(
        _tempfile.gettempdir(), f"spark_graft_stream_dedup_{_uuid.uuid4().hex[:8]}"
    )
    in_dir = _os.path.join(root, "in")
    _os.makedirs(in_dir, exist_ok=True)
    f1 = _os.path.join(in_dir, "batch1.json")
    f2 = _os.path.join(in_dir, "batch2.json")
    with open(f1, "w") as fh:
        for k in keys:
            fh.write(_json.dumps({"doc_id": k, "text": text_for(k)}) + "\n")
    with open(f2, "w") as fh:
        for k in keys:
            fh.write(
                _json.dumps({"doc_id": k + 10_000_000, "text": text_for(k)})
                + "\n"
            )
    _os.utime(f1, (1_700_000_000, 1_700_000_000))
    _os.utime(f2, (1_700_000_100, 1_700_000_100))

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .json(in_dir)
    )
    alerts = streaming_near_dedup(stream, threshold=0.7)
    qname = f"near_dedup_{_uuid.uuid4().hex[:8]}"
    query = (
        alerts.writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .option("checkpointLocation", _os.path.join(root, "ckpt"))
        .start()
    )
    try:
        query.processAllAvailable()
    finally:
        query.stop()
    out = (
        spark.table(qname)
        .filter(F.col("est_jaccard") == 1.0)
        .select("doc_id", "dup_of", "est_jaccard")
        .distinct()
        .orderBy("doc_id")
        # state-store output materialized BEFORE the temp inputs vanish
        .localCheckpoint(eager=True)
    )
    _shutil.rmtree(root, ignore_errors=True)
    return out


@register(
    "streaming_running_stats_customer",
    """
    SELECT c_custkey % 5 AS key,
           CAST(COUNT(*) AS BIGINT) AS count,
           CAST(SUM(c_custkey % 97) AS DOUBLE) / COUNT(*) AS mean,
           CAST(MIN(c_custkey % 97) AS DOUBLE) AS min,
           CAST(MAX(c_custkey % 97) AS DOUBLE) AS max,
           CAST(SUM(CASE WHEN c_custkey % 97 < 10 OR c_custkey % 97 > 80
                         THEN 1 ELSE 0 END) AS BIGINT) AS violations
    FROM customer GROUP BY 1 ORDER BY key
    """,
)
def q_streaming_running_stats_customer(spark, sf_dir):
    """Per-key running stats with persistent state across micro-batches
    (streaming/stateful.py running_column_stats; reference
    realtime/base.py stateful accumulation shape): a two-batch file
    stream (even custkeys then odd custkeys) drives the REAL
    applyInPandasWithState query; each batch emits the UPDATED
    cumulative state per key, so the final emission per key (selected
    as the max-count row — batch 2 strictly grows every key's count)
    must equal the whole-dataset aggregate: the partial-state
    composition contract, certified relationally. Values are integers
    carried as doubles (exact in IEEE754), so count/mean/min/max/
    violation arithmetic is bit-identical to DuckDB's."""
    import json as _json
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile
    import uuid as _uuid

    from truthound_spark.streaming.stateful import running_column_stats

    rows = (
        t(spark, sf_dir, "customer").select("c_custkey").collect()
    )  # fixture-sized driver collect: ids only, builds the replay files
    keys = sorted(r["c_custkey"] for r in rows)
    root = _os.path.join(
        _tempfile.gettempdir(), f"spark_graft_stream_stats_{_uuid.uuid4().hex[:8]}"
    )
    in_dir = _os.path.join(root, "in")
    _os.makedirs(in_dir, exist_ok=True)
    for batch, parity in (("batch1.json", 0), ("batch2.json", 1)):
        with open(_os.path.join(in_dir, batch), "w") as fh:
            for k in keys:
                if k % 2 == parity:
                    fh.write(
                        _json.dumps({"key": k % 5, "v": float(k % 97)}) + "\n"
                    )
    _os.utime(
        _os.path.join(in_dir, "batch1.json"), (1_700_000_000, 1_700_000_000)
    )
    _os.utime(
        _os.path.join(in_dir, "batch2.json"), (1_700_000_100, 1_700_000_100)
    )

    stream = (
        spark.readStream.schema("key long, v double")
        .option("maxFilesPerTrigger", "1")
        .json(in_dir)
    )
    stats = running_column_stats(stream, "key", "v", min_value=10, max_value=80)
    qname = f"running_stats_{_uuid.uuid4().hex[:8]}"
    query = (
        stats.writeStream.format("memory")
        .queryName(qname)
        .outputMode("update")
        .option("checkpointLocation", _os.path.join(root, "ckpt"))
        .start()
    )
    try:
        query.processAllAvailable()
    finally:
        query.stop()
    from pyspark.sql.window import Window

    tbl = spark.table(qname)
    final = tbl.withColumn(
        "__rn",
        F.row_number().over(
            Window.partitionBy("key").orderBy(F.col("count").desc())
        ),
    ).filter(F.col("__rn") == 1)
    out = (
        final.select("key", "count", "mean", "min", "max", "violations")
        .orderBy("key")
        .localCheckpoint(eager=True)
    )
    _shutil.rmtree(root, ignore_errors=True)
    return out


# ---------------------------------------------------------------------------
# round 11: oracle conversions for formerly pytest-only surfaces
# (VERDICT r10 #4) — suite serialization, profile-history store feed,
# artifact envelope/diff numerics, checkpoint action payloads
# ---------------------------------------------------------------------------


@register(
    "suite_roundtrip_enforce_orders",
    """
    SELECT * FROM (
      SELECT 'in_set' AS validator_name, 'o_orderstatus' AS column_name,
        'value_not_in_set' AS issue_type,
        CAST((SELECT COUNT(*) FROM orders
              WHERE o_orderstatus NOT IN ('F', 'O')
                AND o_orderstatus IS NOT NULL) AS BIGINT) AS count,
        CAST(3 AS BIGINT) AS checks_run
      UNION ALL
      SELECT 'range', 'o_totalprice', 'out_of_range',
        CAST((SELECT COUNT(*) FROM orders
              WHERE (o_totalprice < 0.0 OR o_totalprice > 100000.0)
                AND o_totalprice IS NOT NULL) AS BIGINT),
        CAST(3 AS BIGINT)
      UNION ALL
      SELECT 'unique', 'o_custkey', 'duplicate_values',
        CAST((SELECT COUNT(o_custkey) - COUNT(DISTINCT o_custkey)
              FROM orders) AS BIGINT),
        CAST(3 AS BIGINT)
    ) ORDER BY validator_name
    """,
)
def q_suite_roundtrip_enforce_orders(spark, sf_dir):
    """Suite serialization enforced IDENTICALLY after a JSON round trip
    (suite_io.py save_suite/load_suite/ValidationSuite.filter_by_columns;
    reference profiler/generators/suite_generator.py:65-349): four
    validators — unique(o_custkey), range(o_totalprice), in_set
    (o_orderstatus) and a fourth on o_orderkey — are serialized to a
    suite JSON file, reloaded, column-filtered down to three (the
    o_orderkey validator must drop), and run through the REAL fused
    check() path. The oracle recomputes every surviving validator's
    violation count from orders AND pins checks_run=3 — a defect in
    validator_to_dict/from_dict parameter round-tripping, in the column
    filter, or in the reloaded validators' compiled counts breaks the
    hash. VERDICT r10 #4."""
    import os
    import tempfile

    from truthound_spark.suite_io import load_suite, save_suite
    from truthound_spark.validators.distribution import (
        InSetValidator,
        RangeValidator,
    )
    from truthound_spark.validators.uniqueness import UniqueValidator

    df = t(spark, sf_dir, "orders")
    path = os.path.join(tempfile.mkdtemp(prefix="th_suite_"), "suite.json")
    save_suite(
        [
            UniqueValidator(columns=["o_custkey"]),
            RangeValidator("o_totalprice", 0.0, 100000.0),
            InSetValidator("o_orderstatus", ["F", "O"]),
            RangeValidator("o_orderkey", 0.0, 1e15),  # filtered out below
        ],
        path,
        name="orders_gates",
    )
    suite = load_suite(path).filter_by_columns(
        "o_custkey", "o_totalprice", "o_orderstatus"
    )
    run = suite.check(df)
    rows = sorted(
        (i.validator_name, i.column, i.issue_type, int(i.count), int(run.checks_run))
        for i in run.issues
    )
    return spark.createDataFrame(
        rows,
        "validator_name string, column_name string, issue_type string, "
        "count long, checks_run long",
    ).orderBy("validator_name")


@register(
    "profile_history_store_feed_lineitem",
    """
    WITH runs AS (
      SELECT l_orderkey % 4 AS snap,
             MIN(l_quantity) AS qmin, MAX(l_quantity) AS qmax,
             MIN(l_discount) AS dmin, MAX(l_discount) AS dmax,
             COUNT(*) AS n
      FROM lineitem WHERE l_orderkey % 4 IN (0, 1, 2)
      GROUP BY 1
    )
    SELECT CAST(3 AS BIGINT) AS n_runs,
           ROUND(MIN(qmin) - 0.1 * (MAX(qmax) - MIN(qmin)), 6) AS qty_lo,
           ROUND(MAX(qmax) + 0.1 * (MAX(qmax) - MIN(qmin)), 6) AS qty_hi,
           ROUND(MIN(dmin) - 0.1 * (MAX(dmax) - MIN(dmin)), 6) AS disc_lo,
           ROUND(MAX(dmax) + 0.1 * (MAX(dmax) - MIN(dmin)), 6) AS disc_hi,
           CAST(FLOOR(MIN(n) * 0.8) AS BIGINT) AS rows_lo,
           CAST(CEIL(MAX(n) * 1.2) AS BIGINT) AS rows_hi
    FROM runs
    """,
)
def q_profile_history_store_feed_lineitem(spark, sf_dir):
    """Profile-history store feeding the threshold learner e2e
    (ml/auto_threshold.py ProfileHistoryStore save/list_runs/
    load_history/learn; reference profiler/evolution/history.py): three
    lineitem snapshot profiles (l_orderkey%4 ∈ {0,1,2}, computed in ONE
    grouped scan) are SAVED as per-run JSON files, then the learner is
    fed exclusively FROM THE STORE — the learned range gates for both
    columns and the row-count band must equal the closed-form history
    formulas DuckDB recomputes from the raw table. A defect in the
    profile JSON round trip (a float that doesn't survive, a dropped
    field, wrong run ordering) shifts a learned bound and breaks the
    hash. The existing learned_thresholds_lineitem slot certifies the
    learner math; THIS slot certifies the persistence loop around it.
    VERDICT r10 #4."""
    import tempfile

    from truthound_spark.ml.auto_threshold import ProfileHistoryStore
    from truthound_spark.profiler.table_profiler import profile_grouped

    df = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_discount"
    )
    snaps = profile_grouped(
        df.filter(F.col("l_orderkey") % 4 != 3).select(
            (F.col("l_orderkey") % 4).alias("__snap"), "l_quantity", "l_discount"
        ),
        "__snap",
    )
    store = ProfileHistoryStore(root=tempfile.mkdtemp(prefix="th_hist_"))
    for k in sorted(snaps):
        store.save("lineitem", snaps[k], run_id=f"run-{k:03d}")
    tt = store.learn("lineitem")
    qty = tt.get_column("l_quantity")
    disc = tt.get_column("l_discount")
    return _scalar_df(
        spark,
        n_runs=len(store.list_runs("lineitem")),
        qty_lo=round(qty.min_value, 6),
        qty_hi=round(qty.max_value, 6),
        disc_lo=round(disc.min_value, 6),
        disc_hi=round(disc.max_value, 6),
        rows_lo=int(tt.row_count_min),
        rows_hi=int(tt.row_count_max),
    )


@register(
    "artifact_diff_envelope_orders",
    """
    WITH src AS (SELECT COUNT(*) AS n FROM orders),
    tgt AS (SELECT COUNT(*) AS n FROM orders WHERE o_totalprice <= 100000.0)
    SELECT
      CAST(s.n AS BIGINT) AS source_row_count,
      CAST(g.n AS BIGINT) AS target_row_count,
      CAST(g.n - s.n AS BIGINT) AS row_count_delta,
      (s.n <> g.n) AS row_count_changed,
      CAST(0 AS BIGINT) AS schema_added_count,
      CAST(1 AS BIGINT) AS schema_removed_count,
      -- dropping a column changes the null-profile dict too, so the
      -- diff must ALSO flag null_profile_changed
      'null_profile_changed,row_count_changed,sample_changed,schema_removed'
        AS categories,
      TRUE AS blocking,
      TRUE AS restored_changed
    FROM src s, tgt g
    """,
)
def q_artifact_diff_envelope_orders(spark, sf_dir):
    """Dataset fingerprint → summary diff → versioned artifact envelope
    → restore, with every numeric field recomputed by the oracle
    (fingerprint.py fingerprint_dataset/diff_fingerprints + artifacts.py
    DiffBundle/restore_artifact; reference _datasets/{fingerprinting,
    diffing}.py + bundles.py): orders is fingerprinted twice — as-is,
    and with the over-100k rows dropped plus o_orderpriority removed
    (planted row-count + schema drift). The diff is wrapped in a
    DiffBundle with row_count_changed as a BLOCKING category, serialized
    THROUGH the envelope JSON (version pins + redaction boundary
    enforced in validate()), and restored; the returned row reads
    exclusively from the RESTORED bundle. DuckDB recomputes both row
    counts, the delta, the changed flag, and the category list — a
    defect in the fingerprint aggregate, the diff classifier, the
    envelope round trip, or the blocking projection breaks the hash.
    VERDICT r10 #4."""
    from truthound_spark.artifacts import DiffBundle, restore_artifact
    from truthound_spark.fingerprint import diff_fingerprints, fingerprint_dataset

    df = t(spark, sf_dir, "orders")
    fp_src = fingerprint_dataset(df)
    fp_tgt = fingerprint_dataset(
        df.filter(F.col("o_totalprice") <= 100000.0).drop("o_orderpriority")
    )
    diff = diff_fingerprints(fp_src, fp_tgt)
    bundle = DiffBundle.from_diff(
        diff, blocking_categories=["row_count_changed", "schema_changed"]
    )
    restored = restore_artifact(bundle.to_json())
    s = restored.diff["summary"]
    return _scalar_df(
        spark,
        source_row_count=int(s["source_row_count"]),
        target_row_count=int(s["target_row_count"]),
        row_count_delta=int(s["row_count_delta"]),
        row_count_changed=bool(
            restored.diff["details"]["row_count"]["changed"]
        ),
        schema_added_count=int(s["schema_added_count"]),
        schema_removed_count=int(s["schema_removed_count"]),
        categories=",".join(sorted(restored.diff["categories"])),
        blocking=bool(restored.blocking),
        restored_changed=bool(s["changed"]),
    )


@register(
    "checkpoint_actions_payload_orders",
    """
    WITH facts AS (
      SELECT
        CAST((SELECT COUNT(*) FROM (
          SELECT o_custkey FROM orders GROUP BY o_custkey HAVING COUNT(*) > 1
        )) > 0 AS INTEGER) AS dup_fires,
        CAST((SELECT COUNT(*) FROM orders
              WHERE o_totalprice < 0.0 OR o_totalprice > 100000.0) > 0
          AS INTEGER) AS range_fires
    )
    SELECT * FROM (
      SELECT 'failing:generic' AS action,
        TRUE AS fired,
        CAST(dup_fires + range_fires AS BIGINT) AS issues,
        (dup_fires + range_fires = 0) AS success
      FROM facts
      UNION ALL
      SELECT 'failing:slack', TRUE,
        CAST(dup_fires + range_fires AS BIGINT),
        (dup_fires + range_fires = 0)
      FROM facts
      UNION ALL
      SELECT 'passing:generic', FALSE, CAST(NULL AS BIGINT),
        CAST(NULL AS BOOLEAN)
      UNION ALL
      SELECT 'passing:slack', FALSE, CAST(NULL AS BIGINT),
        CAST(NULL AS BOOLEAN)
    ) ORDER BY action
    """,
)
def q_checkpoint_actions_payload_orders(spark, sf_dir):
    """Checkpoint orchestration with action payloads captured off the
    wire (checkpoint.py Checkpoint.run + WebhookAction payload contracts;
    reference checkpoint/checkpoint.py:220 + checkpoint/actions/*): a
    FAILING checkpoint (duplicate o_custkey + out-of-range o_totalprice)
    and a PASSING one (wide-open range gate) each run with a generic
    webhook and a Slack action whose senders are capture hooks. The
    output rows come from the CAPTURED payload bytes: the failing run's
    payloads must carry the issue count DuckDB re-derives from orders
    (one issue per firing validator) and success=false; the passing
    run's actions must NOT fire at all (only_on_failure gating → NULL
    payload fields). A defect in Checkpoint.run's action loop, the
    payload builders, or the failure gating breaks the hash.
    VERDICT r10 #4."""
    import json as _json

    from truthound_spark.checkpoint import Checkpoint, WebhookAction
    from truthound_spark.validators.distribution import RangeValidator
    from truthound_spark.validators.uniqueness import UniqueValidator

    df = t(spark, sf_dir, "orders")
    captured: dict[str, dict] = {}

    def _capture(tag):
        def send(url, body):
            captured[tag] = _json.loads(body.decode())

        return send

    def actions(tag):
        return [
            WebhookAction(
                "https://example.invalid/hook",
                payload_format="generic",
                sender=_capture(f"{tag}:generic"),
            ),
            WebhookAction(
                "https://example.invalid/hook",
                payload_format="slack",
                sender=_capture(f"{tag}:slack"),
            ),
        ]

    Checkpoint(
        "orders_gate",
        validators=[
            UniqueValidator(columns=["o_custkey"]),
            RangeValidator("o_totalprice", 0.0, 100000.0),
        ],
        actions=actions("failing"),
    ).run(df)
    Checkpoint(
        "orders_gate_pass",
        validators=[RangeValidator("o_totalprice", 0.0, 1e12)],
        actions=actions("passing"),
    ).run(df)

    rows = []
    for tag in ("failing:generic", "failing:slack", "passing:generic", "passing:slack"):
        p = captured.get(tag)
        if p is None:
            rows.append((tag, False, None, None))
        elif "text" in p:  # slack payload: parse the summary line
            # "checkpoint <name>: FAIL (2 issues / 2 checks)"
            txt = p["text"]
            n = int(txt.split("(")[1].split(" issues")[0])
            rows.append((tag, True, n, "PASS" in txt))
        else:
            rows.append((tag, True, int(p["issues"]), bool(p["success"])))
    return spark.createDataFrame(
        rows, "action string, fired boolean, issues long, success boolean"
    ).orderBy("action")


@register(
    "streaming_incremental_profile_customer",
    """
    WITH vals AS (
      SELECT CASE WHEN c_custkey % 11 = 0 THEN NULL
                  ELSE CAST(c_custkey % 97 AS DOUBLE) END AS v1,
             CAST(c_nationkey * 3 AS DOUBLE) AS v2
      FROM customer
    ),
    s AS (
      SELECT 'v1' AS col_name, COUNT(*) AS n, COUNT(v1) AS nn,
             SUM(v1) AS s, SUM(v1 * v1) AS s2,
             MIN(v1) AS mn, MAX(v1) AS mx
      FROM vals
      UNION ALL
      SELECT 'v2', COUNT(*), COUNT(v2), SUM(v2), SUM(v2 * v2),
             MIN(v2), MAX(v2)
      FROM vals
    )
    SELECT col_name, CAST(n AS BIGINT) AS n, CAST(nn AS BIGINT) AS nn,
           ROUND(s / nn, 6) AS mean_v,
           ROUND(SQRT((s2 - s * s / nn) / (nn - 1)), 6) AS std_v,
           mn AS min_v, mx AS max_v
    FROM s ORDER BY col_name
    """,
)
def q_streaming_incremental_profile_customer(spark, sf_dir):
    """Incremental profiling partials merged ACROSS a real micro-batch
    boundary in the live state store (streaming/stateful.py
    streaming_incremental_profile — the streaming form of
    profiler/incremental.py's mergeable-partials contract; reference
    realtime/incremental.py:38-160): a two-batch file stream (even then
    odd custkeys, v1 = custkey%97 with planted NULLs at custkey%11=0,
    v2 = nationkey*3) drives the REAL applyInPandasWithState query;
    batch 2's emission per column merges batch 1's persisted state, so
    the final (max-n) row per column must equal the whole-dataset
    single-pass profile DuckDB recomputes — n/nn/sum/min/max exact
    (integer-valued doubles), mean and the explicit
    sqrt((Σx²−(Σx)²/nn)/(nn−1)) std identical double arithmetic on both
    engines, 6-dp rounded. VERDICT r10 #8 (stretch)."""
    import json as _json
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile
    import uuid as _uuid

    from truthound_spark.streaming.stateful import streaming_incremental_profile

    rows = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey").collect()
    root = _os.path.join(
        _tempfile.gettempdir(), f"spark_graft_stream_prof_{_uuid.uuid4().hex[:8]}"
    )
    in_dir = _os.path.join(root, "in")
    _os.makedirs(in_dir, exist_ok=True)
    for batch, parity in (("batch1.json", 0), ("batch2.json", 1)):
        with open(_os.path.join(in_dir, batch), "w") as fh:
            for r in sorted(rows, key=lambda x: x["c_custkey"]):
                k = r["c_custkey"]
                if k % 2 == parity:
                    fh.write(
                        _json.dumps(
                            {
                                "v1": None if k % 11 == 0 else float(k % 97),
                                "v2": float(r["c_nationkey"] * 3),
                            }
                        )
                        + "\n"
                    )
    _os.utime(_os.path.join(in_dir, "batch1.json"), (1_700_000_000, 1_700_000_000))
    _os.utime(_os.path.join(in_dir, "batch2.json"), (1_700_000_100, 1_700_000_100))

    stream = (
        spark.readStream.schema("v1 double, v2 double")
        .option("maxFilesPerTrigger", "1")
        .json(in_dir)
    )
    prof = streaming_incremental_profile(stream, ["v1", "v2"])
    qname = f"inc_profile_{_uuid.uuid4().hex[:8]}"
    query = (
        prof.writeStream.format("memory")
        .queryName(qname)
        .outputMode("update")
        .option("checkpointLocation", _os.path.join(root, "ckpt"))
        .start()
    )
    try:
        query.processAllAvailable()
    finally:
        query.stop()
    from pyspark.sql.window import Window

    tbl = spark.table(qname)
    final = tbl.withColumn(
        "__rn",
        F.row_number().over(
            Window.partitionBy("column").orderBy(F.col("n").desc())
        ),
    ).filter(F.col("__rn") == 1)
    out = (
        final.select(
            F.col("column").alias("col_name"),
            "n",
            "nn",
            F.round("mean", 6).alias("mean_v"),
            F.round("std", 6).alias("std_v"),
            F.col("min").alias("min_v"),
            F.col("max").alias("max_v"),
        )
        .orderBy("col_name")
        .localCheckpoint(eager=True)
    )
    _shutil.rmtree(root, ignore_errors=True)
    return out


@register(
    "bucketed_fk_orphans_lineitem",
    """
    SELECT l_returnflag AS returnflag,
           COUNT(*) AS orphans,
           ROUND(SUM(l_quantity), 2) AS orphan_qty
    FROM lineitem l
    WHERE NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_orderkey = l.l_orderkey AND (o.o_orderkey % 7) <> 0
    )
    GROUP BY l_returnflag ORDER BY returnflag
    """,
)
def q_bucketed_fk_orphans_lineitem(spark, sf_dir):
    """FK orphan check over a BUCKETED co-located layout (layout.py;
    single-run equivalent: validators/referential.py FKValidator, whose
    reference counterpart is validators/integrity/foreign_key.py). Both
    sides are written once with bucketBy(8, l_orderkey) — the one layout
    shuffle — and the orphan anti-join is then pinned Exchange-free IN
    THIS SLOT (a RuntimeError if the co-located plan ever regresses to a
    shuffle), which is the plan shape a per-ingest-batch FK re-check
    needs at 100 TB. Every 7th parent is dropped so the check finds real
    orphans; the oracle recomputes them with NOT EXISTS straight from
    the raw tables, so bucketed writes that lost/duplicated rows, a
    wrong-keyed layout, or a broken anti-join all break the hash."""
    import os as _os
    import tempfile as _tempfile

    from truthound_spark.layout import (
        fk_orphans_bucketed,
        plan_exchanges,
        write_bucketed,
    )

    tag = _os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    loc = _os.path.join(_tempfile.gettempdir(), f"spark_graft_layout_{tag}")
    child_t = write_bucketed(
        t(spark, sf_dir, "lineitem"),
        f"fk_child_{tag}",
        "l_orderkey",
        buckets=8,
        location=loc,
    )
    parent_t = write_bucketed(
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 7 != 0)
        .withColumnRenamed("o_orderkey", "l_orderkey"),
        f"fk_parent_{tag}",
        "l_orderkey",
        buckets=8,
        location=loc,
    )
    orphans = fk_orphans_bucketed(spark, child_t, parent_t, "l_orderkey")
    n_exchanges = plan_exchanges(orphans)
    if n_exchanges != 0:
        raise RuntimeError(
            f"co-located FK anti-join regressed to {n_exchanges} Exchange(s)"
        )
    return (
        orphans.groupBy(F.col("l_returnflag").alias("returnflag"))
        .agg(
            F.count(F.lit(1)).alias("orphans"),
            F.round(F.sum("l_quantity"), 2).alias("orphan_qty"),
        )
        .orderBy("returnflag")
    )


@register(
    "partition_pruned_check_events",
    """
    SELECT COUNT(*) AS n,
           CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS value_nulls,
           ROUND(MIN(value), 6) AS min_value,
           ROUND(MAX(value), 6) AS max_value,
           ROUND(AVG(value), 6) AS avg_value
    FROM events WHERE event_type = 'click'
    """,
)
def q_partition_pruned_check_events(spark, sf_dir):
    """Partition-pruned incremental check (layout.py write_partitioned /
    read_pruned / incremental_check): events are laid out once as
    parquet partitioned by event_type, then ONLY the 'click' partition
    is validated — the slot asserts the predicate landed in the scan's
    PartitionFilters (file-listing-time pruning, the property that makes
    "validate today's partition of a 100 TB table" touch only today's
    bytes) and that the fused executor saw exactly the partition's rows.
    The oracle recomputes the same metric vector from the unpartitioned
    table with a WHERE clause, so a layout that dropped, duplicated, or
    mis-binned rows breaks the hash."""
    import os as _os
    import tempfile as _tempfile

    from truthound_spark.layout import (
        incremental_check,
        read_pruned,
        scan_partition_filters,
        write_partitioned,
    )
    from truthound_spark.validators.completeness import NullValidator

    tag = _os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    path = _os.path.join(
        _tempfile.gettempdir(), f"spark_graft_layout_events_{tag}"
    )
    write_partitioned(t(spark, sf_dir, "events"), path, "event_type")
    pruned = read_pruned(spark, path, {"event_type": "click"})
    filters = scan_partition_filters(pruned)
    if "event_type" not in filters:
        raise RuntimeError(
            f"partition predicate did not reach file listing: {filters!r}"
        )
    _issues, stats = incremental_check(
        spark, path, [NullValidator(columns=["value"])], {"event_type": "click"}
    )
    agg = pruned.groupBy().agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.col("value").isNull(), F.lit(1)).otherwise(F.lit(0))
        ).alias("value_nulls"),
        F.round(F.min("value"), 6).alias("min_value"),
        F.round(F.max("value"), 6).alias("max_value"),
        F.round(F.avg("value"), 6).alias("avg_value"),
    )
    row_count = agg.collect()[0]["n"]
    if stats["row_count"] != row_count:
        raise RuntimeError(
            f"incremental check saw {stats['row_count']} rows, "
            f"partition holds {row_count}"
        )
    return agg


@register(
    "range_clustered_scan_lineitem",
    """
    SELECT l_returnflag AS returnflag,
           COUNT(*) AS n,
           ROUND(SUM(l_extendedprice), 2) AS revenue
    FROM lineitem
    WHERE l_orderkey BETWEEN 2000 AND 8000
    GROUP BY l_returnflag ORDER BY returnflag
    """,
)
def q_range_clustered_scan_lineitem(spark, sf_dir):
    """Range-clustered layout (layout.py write_range_clustered): lineitem
    is rewritten once with repartitionByRange + sortWithinPartitions on
    l_orderkey — disjoint per-file key ranges and tight row-group min/max
    stats, so the selective key-range filter below skips whole files at
    the parquet reader (measured 8x at 60M rows, SCALING.md r11). The
    slot pins the pushed filter into the scan (RuntimeError if
    PushedFilters loses the key predicate) and the oracle recomputes the
    same aggregate from the UNCLUSTERED table, so a clustered write that
    dropped, duplicated, or re-binned rows breaks the hash."""
    import os as _os
    import tempfile as _tempfile

    from truthound_spark.layout import write_range_clustered

    tag = _os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    path = _os.path.join(
        _tempfile.gettempdir(), f"spark_graft_layout_rc_{tag}"
    )
    write_range_clustered(
        t(spark, sf_dir, "lineitem"), path, "l_orderkey", num_partitions=4
    )
    rc = spark.read.parquet(path).filter(
        (F.col("l_orderkey") >= 2000) & (F.col("l_orderkey") <= 8000)
    )
    plan = rc._jdf.queryExecution().executedPlan().toString()
    pushed = plan.split("PushedFilters: [", 1)
    if len(pushed) < 2 or "l_orderkey" not in pushed[1][:200]:
        raise RuntimeError("key predicate missing from PushedFilters")
    return (
        rc.groupBy(F.col("l_returnflag").alias("returnflag"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
        )
        .orderBy("returnflag")
    )


@register(
    "sampled_check_report_lineitem",
    """
    WITH s AS (SELECT * FROM lineitem WHERE l_orderkey % 20 = 3),
    m AS (
      SELECT 'null' AS "check", 'l_returnflag' AS col_name,
             (SELECT COUNT(*) FROM s) AS sample_rows,
             COUNT(*) AS denom,
             CAST(SUM(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS violations
      FROM s
      UNION ALL
      SELECT 'range', 'l_discount', (SELECT COUNT(*) FROM s),
             COUNT(l_discount),
             CAST(SUM(CASE WHEN (l_discount < 0.0 OR l_discount > 0.05)
                           AND l_discount IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT)
      FROM s
      UNION ALL
      SELECT 'range', 'l_quantity', (SELECT COUNT(*) FROM s),
             COUNT(l_quantity),
             CAST(SUM(CASE WHEN (l_quantity < 1.0 OR l_quantity > 30.0)
                           AND l_quantity IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT)
      FROM s
    ),
    w AS (
      SELECT *, violations / CAST(denom AS DOUBLE) AS p,
             1.959963984540054 * 1.959963984540054 AS z2
      FROM m
    ),
    w2 AS (
      SELECT *,
             (p + z2 / (2.0 * denom)) / (1.0 + z2 / denom) AS center,
             (1.959963984540054 / (1.0 + z2 / denom))
               * SQRT(p * (1.0 - p) / denom + z2 / (4.0 * denom * denom))
               AS half
      FROM w
    )
    SELECT "check", col_name, sample_rows, denom, violations,
           CAST(FLOOR(p * 1000000.0) AS BIGINT) AS ratio_ppm,
           CAST(FLOOR(GREATEST(0.0, center - half) * 1000000.0) AS BIGINT)
             AS ci_low_ppm,
           CAST(FLOOR(LEAST(1.0, center + half) * 1000000.0) AS BIGINT)
             AS ci_high_ppm
    FROM w2 ORDER BY "check", col_name
    """,
)
def q_sampled_check_report_lineitem(spark, sf_dir):
    """Sampled validation with Wilson confidence intervals (sampled.py
    sampled_check_report; reference analog: the DataSource factory's
    sample/max_rows profiling subsample, datasources/base.py — here run
    through the SAME compiled ExpressionSpecs as the full fused path).
    Deterministic key-mod sample (l_orderkey % 20 = 3 — saves the
    aggregation CPU of heavy expression batteries; the module's
    level="files" mode is the one that cuts scan IO, certified by pytest
    since file paths aren't cross-engine), ONE fused aggregate over the
    sample, then exact Wilson bounds. The oracle replays the sample predicate, every violation/
    denominator count, AND the Wilson formula itself (same z to the last
    bit, same operation order) in DuckDB; bounds compare at floor-to-ppm
    granularity, so a sampling, counting, or interval-math defect breaks
    the hash."""
    from truthound_spark.sampled import sampled_check_report
    from truthound_spark.validators.completeness import NullValidator
    from truthound_spark.validators.distribution import RangeValidator

    rep = sampled_check_report(
        t(spark, sf_dir, "lineitem"),
        [
            NullValidator(columns=["l_returnflag"]),
            RangeValidator("l_quantity", 1.0, 30.0),
            RangeValidator("l_discount", 0.0, 0.05),
        ],
        key_col="l_orderkey",
        modulus=20,
        residue=3,
        round_to=None,
    )
    ppm = lambda c: F.floor(F.col(c) * F.lit(1000000.0)).cast("long")  # noqa: E731
    return (
        rep.select(
            "check",
            F.col("column").alias("col_name"),
            "sample_rows",
            "denom",
            "violations",
            ppm("ratio").alias("ratio_ppm"),
            ppm("ci_low").alias("ci_low_ppm"),
            ppm("ci_high").alias("ci_high_ppm"),
        ).orderBy("check", "col_name")
    )


@register(
    "wap_gate_orders",
    """
    SELECT COUNT(*) AS published_rows,
           ROUND(SUM(o_totalprice), 2) AS published_revenue,
           1 AS clean_published,
           0 AS dirty_published,
           CAST((SELECT COUNT(*) FROM orders WHERE o_orderkey % 11 = 0)
                AS BIGINT) AS dirty_violations
    FROM orders
    """,
)
def q_wap_gate_orders(spark, sf_dir):
    """Write-audit-publish gate (layout.py write_audit_publish — the WAP
    pattern; no reference counterpart: a single-node engine returns
    issues, a pipeline engine must gate the WRITE). Two gated writes run
    against the REAL staging/rename machinery: a clean orders write must
    publish (its row count + revenue are then read back FROM THE
    PUBLISHED PARQUET and recomputed by the oracle from the source
    table, so a staging write that dropped or mangled rows breaks the
    hash), and a write with every 11th o_totalprice negated must be
    rejected by the audit with exactly count(o_orderkey % 11 = 0)
    violations and leave NO published table. The slot raises if either
    gate decision is wrong or the aborted path leaves residue."""
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile

    from truthound_spark.layout import write_audit_publish
    from truthound_spark.validators.distribution import RangeValidator

    orders = t(spark, sf_dir, "orders")
    tag = _os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    root = _os.path.join(_tempfile.gettempdir(), f"spark_graft_wap_{tag}")
    _shutil.rmtree(root, ignore_errors=True)
    _os.makedirs(root)
    gate = [RangeValidator("o_totalprice", min_value=0.0)]

    clean_path = _os.path.join(root, "orders_clean")
    ok, issues, where = write_audit_publish(orders, clean_path, gate)
    if not ok or issues or where != clean_path:
        raise RuntimeError(f"clean write failed to publish: {issues}")

    dirty = orders.withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 11 == 0, -F.col("o_totalprice")
        ).otherwise(F.col("o_totalprice")),
    )
    dirty_path = _os.path.join(root, "orders_dirty")
    ok2, issues2, where2 = write_audit_publish(dirty, dirty_path, gate)
    if ok2 or _os.path.exists(dirty_path) or where2 != "":
        raise RuntimeError("dirty write escaped the audit gate")
    dirty_violations = sum(i.count for i in issues2)

    published = spark.read.parquet(clean_path)
    return published.groupBy().agg(
        F.count(F.lit(1)).alias("published_rows"),
        F.round(F.sum("o_totalprice"), 2).alias("published_revenue"),
        F.lit(1).alias("clean_published"),
        F.lit(0).alias("dirty_published"),
        F.lit(int(dirty_violations)).cast("long").alias("dirty_violations"),
    )


@register(
    "delta_check_orders",
    """
    WITH p AS (SELECT o_orderkey, o_custkey, o_totalprice FROM orders),
    n AS (
      SELECT o_orderkey, o_custkey,
             CASE WHEN o_orderkey % 13 = 0 THEN -o_totalprice
                  ELSE o_totalprice END AS o_totalprice
      FROM p WHERE o_orderkey % 17 <> 0
      UNION ALL
      SELECT o_orderkey + 1000000000, o_custkey, o_totalprice
      FROM p WHERE o_orderkey % 19 = 0
    ),
    d AS (
      SELECT * FROM n WHERE NOT EXISTS (
        SELECT 1 FROM p
        WHERE p.o_orderkey = n.o_orderkey
          AND p.o_custkey IS NOT DISTINCT FROM n.o_custkey
          AND p.o_totalprice IS NOT DISTINCT FROM n.o_totalprice
      )
    )
    SELECT COUNT(*) AS n_changed,
           CAST(SUM(CASE WHEN o_orderkey < 1000000000 THEN 1 ELSE 0 END)
                AS BIGINT) AS modified_rows,
           CAST(SUM(CASE WHEN o_orderkey >= 1000000000 THEN 1 ELSE 0 END)
                AS BIGINT) AS added_rows,
           CAST(SUM(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS negative_prices,
           ROUND(SUM(o_totalprice), 2) AS changed_revenue
    FROM d
    """,
)
def q_delta_check_orders(spark, sf_dir):
    """Delta validation (delta.py changed_rows / delta_check — validate
    ONLY the rows that changed between snapshots; CDC-style incremental
    audit over plain parquet, no reference counterpart). A synthetic new
    snapshot plants every change class against orders: every 13th key's
    price negated (updates the audit must catch), every 17th key deleted
    (must NOT appear — no row to validate), every 19th key re-inserted
    under a shifted key (clean additions). changed_rows reduces both
    snapshots to (key, xxhash64 fingerprint) projections — the anti-join
    shuffles hashes, never rows — and the oracle recomputes the same
    delta with NOT EXISTS over full column equality, so fingerprint
    collisions, null-handling or framing defects in the canonical
    encoding, and wrong join semantics all break the hash. The slot also
    runs the fused audit over the delta and RAISES unless it reports
    exactly the planted negative prices."""
    from truthound_spark.delta import changed_rows, delta_check
    from truthound_spark.validators.distribution import RangeValidator

    p = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    k = F.col("o_orderkey")
    new = (
        p.filter(k % 17 != 0)
        .withColumn(
            "o_totalprice",
            F.when(k % 13 == 0, -F.col("o_totalprice")).otherwise(
                F.col("o_totalprice")
            ),
        )
        .unionByName(
            p.filter(k % 19 == 0).select(
                (k + 1000000000).alias("o_orderkey"),
                "o_custkey",
                "o_totalprice",
            )
        )
    )
    delta = changed_rows(p, new, "o_orderkey")
    issues, stats = delta_check(
        p, new, "o_orderkey", [RangeValidator("o_totalprice", min_value=0.0)]
    )
    agg = delta.groupBy().agg(
        F.count(F.lit(1)).alias("n_changed"),
        F.sum(F.when(k < 1000000000, 1).otherwise(0))
        .cast("long")
        .alias("modified_rows"),
        F.sum(F.when(k >= 1000000000, 1).otherwise(0))
        .cast("long")
        .alias("added_rows"),
        F.sum(F.when(F.col("o_totalprice") < 0, 1).otherwise(0))
        .cast("long")
        .alias("negative_prices"),
        F.round(F.sum("o_totalprice"), 2).alias("changed_revenue"),
    )
    row = agg.collect()[0]
    audit_count = sum(i.count for i in issues)
    if audit_count != row["negative_prices"] or stats["row_count"] != row["n_changed"]:
        raise RuntimeError(
            f"delta audit mismatch: audit={audit_count} rows={stats['row_count']} "
            f"vs relational {row['negative_prices']}/{row['n_changed']}"
        )
    return agg


@register(
    "delta_check_fp_store_orders",
    """
    WITH p AS (SELECT o_orderkey, o_custkey, o_totalprice FROM orders),
    n AS (
      SELECT o_orderkey, o_custkey,
             CASE WHEN o_orderkey % 13 = 0 THEN -o_totalprice
                  ELSE o_totalprice END AS o_totalprice
      FROM p WHERE o_orderkey % 17 <> 0
      UNION ALL
      SELECT o_orderkey + 1000000000, o_custkey, o_totalprice
      FROM p WHERE o_orderkey % 19 = 0
    ),
    d AS (
      SELECT * FROM n WHERE NOT EXISTS (
        SELECT 1 FROM p
        WHERE p.o_orderkey = n.o_orderkey
          AND p.o_custkey IS NOT DISTINCT FROM n.o_custkey
          AND p.o_totalprice IS NOT DISTINCT FROM n.o_totalprice
      )
    )
    SELECT COUNT(*) AS n_changed,
           CAST(SUM(CASE WHEN o_orderkey < 1000000000 THEN 1 ELSE 0 END)
                AS BIGINT) AS modified_rows,
           CAST(SUM(CASE WHEN o_orderkey >= 1000000000 THEN 1 ELSE 0 END)
                AS BIGINT) AS added_rows,
           CAST(SUM(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS negative_prices,
           ROUND(SUM(o_totalprice), 2) AS changed_revenue
    FROM d
    """,
)
def q_delta_check_fp_store_orders(spark, sf_dir):
    """Delta validation through the PERSISTED fingerprint store (delta.py
    write_fingerprints / old_fingerprints — the r11 SCALING conclusion's
    missing half: delta validation only beats a cheap full audit when the
    old snapshot's fingerprints are precomputed and stored). Same planted
    change classes as delta_check_orders (13th price negated, 17th
    deleted, 19th re-keyed), but the old snapshot's (key, xxhash64)
    projection is WRITTEN TO DISK with its column-list sidecar and the
    delta is derived from the STORE — the old frame is never passed in.
    The NOT-EXISTS oracle replays full column equality, so a store that
    round-trips fingerprints wrongly (schema, sidecar, hash framing)
    breaks the hash; the slot raises unless the fused audit over the
    store-derived delta reports exactly the planted negatives."""
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile

    from truthound_spark.delta import delta_check, write_fingerprints
    from truthound_spark.validators.distribution import RangeValidator

    p = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    k = F.col("o_orderkey")
    new = (
        p.filter(k % 17 != 0)
        .withColumn(
            "o_totalprice",
            F.when(k % 13 == 0, -F.col("o_totalprice")).otherwise(
                F.col("o_totalprice")
            ),
        )
        .unionByName(
            p.filter(k % 19 == 0).select(
                (k + 1000000000).alias("o_orderkey"),
                "o_custkey",
                "o_totalprice",
            )
        )
    )
    tag = _os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    root = _os.path.join(_tempfile.gettempdir(), f"spark_graft_fpstore_{tag}")
    _shutil.rmtree(root, ignore_errors=True)
    store = write_fingerprints(p, _os.path.join(root, "orders_fp"), "o_orderkey")

    from truthound_spark.delta import changed_rows

    delta = changed_rows(None, new, "o_orderkey", old_fingerprints=store)
    issues, stats = delta_check(
        None,
        new,
        "o_orderkey",
        [RangeValidator("o_totalprice", min_value=0.0)],
        old_fingerprints=store,
    )
    agg = delta.groupBy().agg(
        F.count(F.lit(1)).alias("n_changed"),
        F.sum(F.when(k < 1000000000, 1).otherwise(0))
        .cast("long")
        .alias("modified_rows"),
        F.sum(F.when(k >= 1000000000, 1).otherwise(0))
        .cast("long")
        .alias("added_rows"),
        F.sum(F.when(F.col("o_totalprice") < 0, 1).otherwise(0))
        .cast("long")
        .alias("negative_prices"),
        F.round(F.sum("o_totalprice"), 2).alias("changed_revenue"),
    )
    row = agg.collect()[0]
    audit_count = sum(i.count for i in issues)
    if audit_count != row["negative_prices"] or stats["row_count"] != row["n_changed"]:
        raise RuntimeError(
            f"fp-store delta audit mismatch: audit={audit_count} "
            f"rows={stats['row_count']} vs relational "
            f"{row['negative_prices']}/{row['n_changed']}"
        )
    return agg


@register(
    "incremental_dedup_indexed_documents",
    ORACLES["incremental_dedup_documents"],
)
def q_incremental_dedup_indexed_documents(spark, sf_dir):
    """Indexed cross-snapshot dedup (pipeline/dedup.py write_dedup_index
    + incremental_dedup_indexed — r12: the base corpus is indexed ONCE
    into three bucketed tables (content fingerprints by fp, hashed
    shingles by id, LSH band entries by (band, bucket)) and the delta is
    deduped against the STORED artifacts in delta-sized time — the base
    is never re-shingled or re-banded. Same odd/even split and the SAME
    exhaustive NOT-EXISTS/Jaccard oracle as incremental_dedup_documents:
    a stored index whose banding, fingerprints, shingle round-trip, or
    candidate orientation drifts from the live path breaks the hash.
    Exact mode (no write-time bucket cap) so the oracle replay is
    complete."""
    from truthound_spark.pipeline.dedup import (
        incremental_dedup_indexed,
        write_dedup_index,
    )

    docs = t(spark, sf_dir, "documents")
    new = docs.filter(F.col("doc_id") % 2 == 1)
    base = docs.filter(F.col("doc_id") % 2 == 0)
    import os as _os
    import tempfile as _tempfile

    tag = _os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    loc = _os.path.join(_tempfile.gettempdir(), f"spark_graft_dedup_idx_{tag}")
    idx = write_dedup_index(
        base, f"entry_dedup_idx_{tag}", max_bucket_size=None, buckets=8,
        location=loc,
    )
    return incremental_dedup_indexed(
        new, idx, threshold=0.7, max_bucket_size=None
    ).orderBy("id")


@register(
    "wap_partition_gate_orders",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS published_rows,
           ROUND(SUM(o_totalprice), 2) AS published_revenue,
           CAST(COUNT(DISTINCT o_orderkey % 3) AS BIGINT) AS published_parts,
           CAST((SELECT COUNT(*) FROM orders WHERE o_orderkey % 3 = 2)
                AS BIGINT) AS dirty_violations
    FROM orders WHERE o_orderkey % 3 IN (0, 1)
    """,
)
def q_wap_partition_gate_orders(spark, sf_dir):
    """Partition-scoped write-audit-publish (layout.py
    write_audit_publish_partition — the per-ingest WAP pattern: gate each
    day's partition while earlier partitions keep serving reads). Orders
    are split into three shards (o_orderkey % 3) published as separate
    partitions through the REAL stage→audit→rename machinery: shards 0
    and 1 publish cleanly, shard 2 arrives with every price negated and
    must be rejected WITHOUT touching the two published partitions. The
    result is read back FROM THE PUBLISHED PARQUET (so a publish that
    dropped, duplicated, or misfiled rows breaks the hash) and the oracle
    recomputes rows/revenue/partition-count from the source table; the
    slot raises if the dirty shard publishes, leaves residue under the
    table root, or reports the wrong violation count."""
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile

    from truthound_spark.layout import write_audit_publish_partition
    from truthound_spark.validators.distribution import RangeValidator

    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", (F.col("o_orderkey") % 3).alias("shard")
    )
    gate = [RangeValidator("o_totalprice", min_value=0.0)]
    tag = _os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    root = _os.path.join(_tempfile.gettempdir(), f"spark_graft_wap_part_{tag}")
    _shutil.rmtree(root, ignore_errors=True)
    table = _os.path.join(root, "orders_sharded")

    for shard in (0, 1):
        ok, issues, _ = write_audit_publish_partition(
            orders.filter(F.col("shard") == shard), table, gate, {"shard": shard}
        )
        if not ok or issues:
            raise RuntimeError(f"clean shard {shard} failed to publish: {issues}")
    dirty = orders.filter(F.col("shard") == 2).withColumn(
        "o_totalprice", -F.col("o_totalprice")
    )
    ok2, issues2, where2 = write_audit_publish_partition(
        dirty, table, gate, {"shard": 2}
    )
    if ok2 or where2 != "":
        raise RuntimeError("dirty shard escaped the partition audit gate")
    resid = [d for d in _os.listdir(table) if not d.startswith("shard=")]
    parts = sorted(d for d in _os.listdir(table) if d.startswith("shard="))
    if resid or parts != ["shard=0", "shard=1"]:
        raise RuntimeError(f"partition publish residue: {resid} parts={parts}")
    dirty_violations = sum(i.count for i in issues2)

    published = spark.read.parquet(table)
    return published.groupBy().agg(
        F.count(F.lit(1)).alias("published_rows"),
        F.round(F.sum("o_totalprice"), 2).alias("published_revenue"),
        F.countDistinct("shard").cast("long").alias("published_parts"),
        F.lit(int(dirty_violations)).cast("long").alias("dirty_violations"),
    )


@register(
    "minhash_shingle_table_documents",
    ORACLES["minhash_lsh_pairs_documents"],
)
def q_minhash_shingle_table_documents(spark, sf_dir):
    """MinHash dedup through the PERSISTED bucketed shingle layout (r12
    write_shingle_layout + minhash_dedup_pairs(shingle_table=...)): the
    hashed-shingle table is written once bucketBy(id) and the whole
    pipeline — signatures, banding, exact-Jaccard verification — runs
    off the STORED table instead of the in-memory recompute. Same
    exhaustive inverted-index oracle as minhash_lsh_pairs_documents, so
    a shingle round-trip defect (array encoding, id mapping, bucketed
    read) breaks the hash. Exact mode; attaches ride the size gate."""
    import os as _os
    import tempfile as _tempfile

    from truthound_spark.pipeline.dedup import (
        minhash_dedup_pairs,
        write_shingle_layout,
    )

    df = t(spark, sf_dir, "documents")
    tag = _os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    loc = _os.path.join(_tempfile.gettempdir(), f"spark_graft_shingle_{tag}")
    table = write_shingle_layout(
        df, f"entry_shingles_{tag}", buckets=8, location=loc
    )
    pairs = minhash_dedup_pairs(
        df, "text", "doc_id", threshold=0.7, num_hashes=64, bands=32,
        max_bucket_size=None, shingle_table=table,
    )
    return pairs.select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    ).orderBy("id_a", "id_b")


@register(
    "delta_check_fp_table_orders",
    ORACLES["delta_check_fp_store_orders"],
)
def q_delta_check_fp_table_orders(spark, sf_dir):
    """Delta validation through the BUCKETED fingerprint-store table (r12
    write_fingerprints_table — (key, __fp) bucketBy exactly the anti-join
    keys, column lists pinned in table properties; the split anti-join
    keeps the store side Exchange-free). Same planted change classes and
    the same NOT-EXISTS oracle as the path-store slot: a table
    round-trip, properties-metadata, or split-join defect breaks the
    hash. The slot raises unless the fused audit over the table-derived
    delta reports exactly the planted negatives."""
    import os as _os
    import tempfile as _tempfile

    from truthound_spark.delta import (
        changed_rows,
        delta_check,
        write_fingerprints_table,
    )
    from truthound_spark.validators.distribution import RangeValidator

    p = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    k = F.col("o_orderkey")
    new = (
        p.filter(k % 17 != 0)
        .withColumn(
            "o_totalprice",
            F.when(k % 13 == 0, -F.col("o_totalprice")).otherwise(
                F.col("o_totalprice")
            ),
        )
        .unionByName(
            p.filter(k % 19 == 0).select(
                (k + 1000000000).alias("o_orderkey"),
                "o_custkey",
                "o_totalprice",
            )
        )
    )
    tag = _os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    loc = _os.path.join(_tempfile.gettempdir(), f"spark_graft_fptab_{tag}")
    store = write_fingerprints_table(
        p, f"entry_fp_orders_{tag}", "o_orderkey", buckets=8, location=loc
    )
    delta = changed_rows(None, new, "o_orderkey", old_fingerprints=store)
    issues, stats = delta_check(
        None,
        new,
        "o_orderkey",
        [RangeValidator("o_totalprice", min_value=0.0)],
        old_fingerprints=store,
    )
    agg = delta.groupBy().agg(
        F.count(F.lit(1)).alias("n_changed"),
        F.sum(F.when(k < 1000000000, 1).otherwise(0))
        .cast("long")
        .alias("modified_rows"),
        F.sum(F.when(k >= 1000000000, 1).otherwise(0))
        .cast("long")
        .alias("added_rows"),
        F.sum(F.when(F.col("o_totalprice") < 0, 1).otherwise(0))
        .cast("long")
        .alias("negative_prices"),
        F.round(F.sum("o_totalprice"), 2).alias("changed_revenue"),
    )
    row = agg.collect()[0]
    audit_count = sum(i.count for i in issues)
    if audit_count != row["negative_prices"] or stats["row_count"] != row["n_changed"]:
        raise RuntimeError(
            f"fp-table delta audit mismatch: audit={audit_count} "
            f"rows={stats['row_count']} vs relational "
            f"{row['negative_prices']}/{row['n_changed']}"
        )
    return agg


@register(
    "row_level_transport_lineitem",
    """
    SELECT CAST(SUM(CASE WHEN l_quantity IS NULL OR l_quantity <= 0
                          OR l_quantity >= 25 THEN 1 ELSE 0 END) AS BIGINT)
             AS violations,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           1 AS transports_agree
    FROM lineitem
    """,
)
def q_row_level_transport_lineitem(spark, sf_dir):
    """RowLevelValidator transport certification (r12: the Arrow-
    vectorized default must be bit-identical to the row-at-a-time F.udf
    contract — including NULLs arriving as None, never nan). The SAME
    per-row Python predicate runs through BOTH transports in-slot; the
    slot RAISES if they disagree, and the violation count is recomputed
    relationally by the oracle — so a nan-coercion or batching defect on
    either path breaks the hash."""
    from truthound_spark.validators.query import RowLevelValidator

    li = t(spark, sf_dir, "lineitem")
    fn = lambda v: v is not None and 0 < v < 25  # noqa: E731
    fast = RowLevelValidator("l_quantity", fn).validate(li)
    slow = RowLevelValidator("l_quantity", fn, vectorized=False).validate(li)
    n_fast = fast[0].count if fast else 0
    n_slow = slow[0].count if slow else 0
    if n_fast != n_slow:
        raise RuntimeError(
            f"row-level transports disagree: vectorized={n_fast} udf={n_slow}"
        )
    return li.groupBy().agg(
        F.lit(int(n_fast)).cast("long").alias("violations"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.lit(1).alias("transports_agree"),
    )
