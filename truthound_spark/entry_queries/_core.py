"""Driver-verifiable query registry: Spark queries routed through the
engine's operators, each paired with an ANSI-SQL DuckDB oracle.

Every entry here is one operator from SURVEY.md §2 (or a pipeline operator
from BASELINE.json's north star) exercised end-to-end:

  * the Spark side compiles through the REAL engine path — validator
    ``specs()`` expressions fused into one ``df.agg`` (the
    BatchExpressionExecutor plan shape), referential anti-joins, window
    lags, drift histogram aggregates, pipeline dedup/similarity plans;
  * the oracle side is an equivalent standalone SQL string that DuckDB
    runs on the same parquet tables.

Column-name parity rule: every computed column is aliased identically on
both sides (the driver sorts columns by name before hashing). Floating
aggregates are rounded on BOTH sides to make value hashes stable.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet carries TIMESTAMP(NANOS). Spark ≤4.1.0 needs the
    ``nanosAsLong`` legacy conf (nanos arrive as bigint → convert); Spark
    ≥4.1.2 ignores that conf and reads nanos natively as TIMESTAMP_NTZ
    (truncated to micros) → cast to a session-timezone (UTC) timestamp so
    downstream epoch math (``cast(ts as double)``, ``unix_micros``) stays
    legal. Both paths land on the same UTC microsecond instants; oracle
    side mirrors with make_timestamp(epoch_ns(ts)//1000)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    dt = dict(df.dtypes).get("ts")
    if dt == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif dt == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


#: Oracle-side CTE mirroring load_events' nanos→micros truncation.
EV = "ev AS (SELECT event_id, make_timestamp(epoch_ns(ts)//1000) AS ts, user_id, event_type, value, props FROM events)"


def fused_counts(df: DataFrame, items: list[tuple[object, list[str]]]) -> DataFrame:
    """ONE df.agg over the union of all validators' compiled count_exprs —
    the engine's fused single-aggregation plan (core/executor.py), returned
    as an uncollected 1-row DataFrame for the oracle compare."""
    aggs: list[Column] = []
    for validator, aliases in items:
        specs = validator.specs(df)
        if len(specs) != len(aliases):
            raise ValueError(
                f"{type(validator).__name__}: {len(specs)} specs vs {len(aliases)} aliases"
            )
        for spec, alias in zip(specs, aliases):
            aggs.append(spec.count_expr.cast("long").alias(alias))
    return df.agg(*aggs)


# ===========================================================================
# §2.9 drift / statistics (events split into even/odd event_id halves)
# ===========================================================================

_DRIFT_BASE = "SELECT value FROM events WHERE event_id % 2 = 0 AND value IS NOT NULL"
_DRIFT_CURR = "SELECT value FROM events WHERE event_id % 2 = 1 AND value IS NOT NULL"


def _drift_frames(spark, sf_dir):
    df = t(spark, sf_dir, "events")
    baseline = df.filter((F.col("event_id") % 2 == 0) & F.col("value").isNotNull())
    current = df.filter((F.col("event_id") % 2 == 1) & F.col("value").isNotNull())
    return baseline, current


def _scalar_df(spark, **cols):
    """1-row DataFrame from driver-computed scalar statistics."""
    from pyspark.sql import types as T

    fields = []
    row = []
    for k, v in cols.items():
        if isinstance(v, bool):
            fields.append(T.StructField(k, T.BooleanType()))
        elif isinstance(v, int):
            fields.append(T.StructField(k, T.LongType()))
        elif isinstance(v, float):
            fields.append(T.StructField(k, T.DoubleType()))
        else:
            fields.append(T.StructField(k, T.StringType()))
        row.append(v)
    return spark.createDataFrame([tuple(row)], T.StructType(fields))


# ===========================================================================
# §2.8 geospatial (derived lat/lon columns — identical derivation both sides)
# ===========================================================================

_GEO_SQL_BASE = """
      SELECT c_acctbal % 90 AS lat, (c_acctbal * 3) % 180 AS lon FROM customer
"""


def _geo_df(spark, sf_dir):
    df = t(spark, sf_dir, "customer")
    return df.select(
        (F.col("c_acctbal") % 90).alias("lat"),
        ((F.col("c_acctbal") * 3) % 180).alias("lon"),
    )


# ===========================================================================
# Training-data pipeline: text quality / language ID / fingerprints
# ===========================================================================

#: SQL mirror of dedup.normalized_text (lower, strip non-alnum, collapse ws)
_NORM_SQL = "trim(regexp_replace(regexp_replace(lower({c}), '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g'))"


#: SQL computing word 3-gram shingle lists per doc, mirroring
#: dedup.word_shingles (slice semantics incl. short-doc edge case).
_SHINGLES_SQL = f"""
      SELECT doc_id AS id,
             list_distinct([array_to_string(list_slice(words, i, i + 2), ' ')
                            FOR i IN range(1, GREATEST(len(words) - 2, 1) + 1)]) AS sh
      FROM (SELECT doc_id, string_split({_NORM_SQL.format(c='text')}, ' ') AS words FROM documents)
"""


def _lsh_near_dup_oracle() -> str:
    """Oracle replicating the sign-LSH bucketing EXACTLY: the seeded
    hyperplanes (make_planes(64, 8, 42) — deterministic) are inlined as
    SQL literals, bucket bit i = (v · plane_i >= 0), and candidate pairs
    come from the same bucket-equality join the engine uses. Both engines
    fold the dot product left-to-right over the same element order, so
    bucket bits and (6-digit-rounded) cosines agree bit-for-bit."""
    from truthound_spark.pipeline.similarity import make_planes

    planes = make_planes(64, 8, 42)

    def lit(p):
        return "[" + ", ".join(repr(float(x)) for x in p) + "]"

    bits = " + ".join(
        f"(CASE WHEN list_dot_product(v, {lit(p)}) >= 0 THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    )
    cos = (
        "list_dot_product(a.v, bb.v) / (sqrt(list_dot_product(a.v, a.v))"
        " * sqrt(list_dot_product(bb.v, bb.v)))"
    )
    return f"""
    WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
    b AS (SELECT id, v, {bits} AS bucket FROM e)
    SELECT a.id AS id_a, bb.id AS id_b, ROUND({cos}, 6) AS cosine
    FROM b a JOIN b bb ON a.bucket = bb.bucket AND a.id < bb.id
    WHERE {cos} >= 0.3
    ORDER BY 1, 2
    """


def _lsh_topk_oracle() -> str:
    """Oracle replicating lsh_topk's deterministic plan: seeded 6-plane
    bucketing as SQL literals, bucket-equality candidate join, and the
    same (cosine DESC, id) row_number ranking."""
    from truthound_spark.pipeline.similarity import make_planes

    planes = make_planes(64, 6, 42)

    def lit(p):
        return "[" + ", ".join(repr(float(x)) for x in p) + "]"

    bits = " + ".join(
        f"(CASE WHEN list_dot_product(v, {lit(p)}) >= 0 THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    )
    cos = (
        "list_dot_product(c.v, q.v) / (sqrt(list_dot_product(c.v, c.v))"
        " * sqrt(list_dot_product(q.v, q.v)))"
    )
    return f"""
    WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
    b AS (SELECT id, v, {bits} AS bucket FROM e),
    scored AS (
      SELECT q.id AS query_id, c.id AS id, {cos} AS cosine
      FROM b c JOIN b q ON c.bucket = q.bucket AND c.id <> q.id
      WHERE q.id < 5
    ),
    ranked AS (
      SELECT query_id, id, cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, id) AS rank
      FROM scored
    )
    SELECT query_id, id, ROUND(cosine, 6) AS cosine, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= 5 ORDER BY query_id, rank
    """


# ===========================================================================
# multimodal plumbing (binary payload columns derived from documents.text)
# ===========================================================================


def _media_df(spark, sf_dir):
    df = t(spark, sf_dir, "documents")
    return df.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("image").alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )


# ===========================================================================
# Round-3 additions: table family, schema structure, multi-column
# arithmetic/consistency, privacy/compliance, localization, misc long tail
# ===========================================================================


def judge_counts(df: DataFrame, validator, aliases: dict[str, str]) -> DataFrame:
    """ONE df.agg over a judge-based validator's extra_exprs (the fused
    plan shape for metric-judged specs): ``aliases`` maps extra-expr key →
    output column name."""
    spec = validator.specs(df)[0]
    aggs = [
        expr.cast("long").alias(aliases[key])
        for key, expr in spec.extra_exprs.items()
        if key in aliases
    ]
    return df.agg(*aggs)


_IVF_D2 = (
    "list_dot_product({a}, {a}) - 2 * list_dot_product({a}, {b})"
    " + list_dot_product({b}, {b})"
)


# ===========================================================================
# round-4 data-mixing + bloom-decontamination operators
# ===========================================================================

_BPE_SQL = "len(regexp_extract_all({c}, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]'))"


# ===========================================================================
# Round 4: hashed-feature classifier, paragraph dedup, RAG chunking
# ===========================================================================

_WORDS_SQL = (
    "list_filter(string_split(trim(regexp_replace(regexp_replace(lower({t}),"
    " '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g')), ' '), x -> x <> '')"
)


# ===========================================================================
# Round 4 (cont.): distributed k-means, SemDeDup, global shuffle, embedding QA
# ===========================================================================


def _kmeans_oracle_sql(k: int, iters: int) -> str:
    """Relational replay of clustering.kmeans on customer(acctbal/1000,
    nationkey): same fixed-point quantization (exact, order-independent
    long sums -> bit-identical centroids), same k-lowest-id init, same
    (dist, cell) argmin tie-break — generated as one CTE chain per Lloyd
    iteration."""
    dist = "(p.x0 - c.k0) * (p.x0 - c.k0) + (p.x1 - c.k1) * (p.x1 - c.k1)"
    ctes = [
        """pts AS (
      SELECT CAST(c_custkey AS BIGINT) AS id,
             CAST(round(c_acctbal / 1000.0 * 1000000.0) AS BIGINT) AS q0,
             CAST(round(CAST(c_nationkey AS DOUBLE) * 1000000.0) AS BIGINT) AS q1
      FROM customer
      WHERE c_acctbal IS NOT NULL AND c_nationkey IS NOT NULL
    )""",
        "pv AS (SELECT id, q0, q1, q0 / 1000000.0 AS x0, q1 / 1000000.0 AS x1 FROM pts)",
        f"""c0 AS (
      SELECT ROW_NUMBER() OVER (ORDER BY id) - 1 AS cell, x0 AS k0, x1 AS k1
      FROM pv ORDER BY id LIMIT {k}
    )""",
    ]
    for it in range(1, iters + 1):
        ctes.append(
            f"""a{it} AS (
      SELECT id, q0, q1, x0, x1, cell FROM (
        SELECT p.*, c.cell,
               ROW_NUMBER() OVER (PARTITION BY p.id ORDER BY {dist}, c.cell) AS rn
        FROM pv p, c{it - 1} c
      ) WHERE rn = 1
    )"""
        )
        ctes.append(
            f"""c{it} AS (
      SELECT cell, CAST(SUM(q0) AS DOUBLE) / COUNT(*) / 1000000.0 AS k0,
                   CAST(SUM(q1) AS DOUBLE) / COUNT(*) / 1000000.0 AS k1
      FROM a{it} GROUP BY cell
    )"""
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT id, cell AS cluster FROM (
      SELECT p.id, c.cell,
             ROW_NUMBER() OVER (PARTITION BY p.id ORDER BY {dist}, c.cell) AS rn
      FROM pv p, c{iters} c
    ) WHERE rn = 1 ORDER BY id"""
    )


def _pq_oracle_ctes(
    m: int, k: int, iters: int, dim: int, source: str = "embeddings"
) -> list[str]:
    """Per-subspace relational replay of pq_train+assign (kmeans_vec per
    slice — same quantized grid, k-lowest-id init, (dist, cell) argmin).
    ``source`` is any relation/CTE with (vec_id, embedding DOUBLE[])
    columns — the residual IVF-PQ oracle feeds a residual CTE here."""
    sub_d = dim // m
    dist = (
        "list_dot_product(p.xv, p.xv) - 2 * list_dot_product(p.xv, c.cv)"
        " + list_dot_product(c.cv, c.cv)"
    )
    ctes: list[str] = []
    for s in range(m):
        lo = s * sub_d
        sums = ", ".join(f"SUM(qv[{j + 1}]) AS s{j}" for j in range(sub_d))
        cvec = (
            "["
            + ", ".join(f"CAST(s{j} AS DOUBLE) / n / 1000000.0" for j in range(sub_d))
            + "]"
        )
        ctes.append(
            f"""pts{s} AS (
      SELECT CAST(vec_id AS BIGINT) AS id,
             list_transform(CAST(embedding AS DOUBLE[])[{lo + 1}:{lo + sub_d}],
                            x -> CAST(round(x * 1000000.0) AS BIGINT)) AS qv
      FROM {source} WHERE embedding IS NOT NULL
    )"""
        )
        ctes.append(
            f"pv{s} AS (SELECT id, qv, list_transform(qv, q -> q / 1000000.0) AS xv FROM pts{s})"
        )
        ctes.append(
            f"""c0v{s} AS (
      SELECT ROW_NUMBER() OVER (ORDER BY id) - 1 AS cell, xv AS cv
      FROM pv{s} ORDER BY id LIMIT {k}
    )"""
        )
        for it in range(1, iters + 1):
            ctes.append(
                f"""a{it}s{s} AS (
      SELECT id, qv, xv, cell FROM (
        SELECT p.id, p.qv, p.xv, c.cell,
               ROW_NUMBER() OVER (PARTITION BY p.id ORDER BY {dist}, c.cell) AS rn
        FROM pv{s} p, c{it - 1}v{s} c
      ) WHERE rn = 1
    )"""
            )
            ctes.append(
                f"""cn{it}s{s} AS (
      SELECT cell, COUNT(*) AS n, {sums} FROM a{it}s{s} GROUP BY cell
    )"""
            )
            ctes.append(
                f"c{it}v{s} AS (SELECT cell, {cvec} AS cv FROM cn{it}s{s})"
            )
        ctes.append(
            f"""fin{s} AS (
      SELECT id, cell FROM (
        SELECT p.id, c.cell,
               ROW_NUMBER() OVER (PARTITION BY p.id ORDER BY {dist}, c.cell) AS rn
        FROM pv{s} p, c{iters}v{s} c
      ) WHERE rn = 1
    )"""
        )
    return ctes


def _pq_encode_oracle_sql(m: int, k: int, iters: int, dim: int) -> str:
    ctes = _pq_oracle_ctes(m, k, iters, dim)
    codes = "[" + ", ".join(f"CAST(fin{s}.cell AS INT)" for s in range(m)) + "]"
    joins = "fin0" + "".join(f" JOIN fin{s} USING (id)" for s in range(1, m))
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT id, {codes} AS codes FROM {joins} ORDER BY id"""
    )


def _pq_search_oracle_sql(m: int, k: int, iters: int, dim: int, n_queries: int, topk: int) -> str:
    sub_d = dim // m
    ctes = _pq_oracle_ctes(m, k, iters, dim)
    for s in range(m):
        lo = s * sub_d
        ctes.append(
            f"""q{s} AS (
      SELECT CAST(vec_id AS BIGINT) AS qid,
             list_transform(CAST(embedding AS DOUBLE[])[{lo + 1}:{lo + sub_d}],
                            x -> round(x * 1000000.0) / 1000000.0) AS xv
      FROM embeddings WHERE vec_id < {n_queries}
    )"""
        )
        sq = " + ".join(
            f"(q.xv[{j + 1}] - c.cv[{j + 1}]) * (q.xv[{j + 1}] - c.cv[{j + 1}])"
            for j in range(sub_d)
        )
        ctes.append(
            f"lut{s} AS (SELECT q.qid, c.cell, {sq} AS d FROM q{s} q, c{iters}v{s} c)"
        )
    dsum = " + ".join(f"l{s}.d" for s in range(m))
    j = "fin0"
    for s in range(1, m):
        j += f" JOIN fin{s} USING (id)"
    lut_joins = " ".join(
        f"JOIN lut{s} l{s} ON l{s}.cell = fin{s}.cell AND l{s}.qid = l0.qid"
        for s in range(1, m)
    )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    , scored AS (
      SELECT l0.qid AS query_id, fin0.id,
             round(({dsum}) * 1000000.0) / 1000000.0 AS adc_dist
      FROM {j} JOIN lut0 l0 ON l0.cell = fin0.cell {lut_joins}
    )
    SELECT query_id, id, adc_dist,
           CAST(rnk AS INT) AS rank
    FROM (
      SELECT query_id, id, adc_dist,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adc_dist, id) AS rnk
      FROM scored
    ) WHERE rnk <= {topk} ORDER BY query_id, rnk"""
    )


def _kmeans_vec_oracle_sql(k: int, iters: int, dim: int) -> str:
    """Relational replay of clustering.kmeans_vec on dim-sliced embeddings
    (same quantized-long sums, k-lowest-id init, dot-form distance)."""
    dist = (
        "list_dot_product(p.xv, p.xv) - 2 * list_dot_product(p.xv, c.cv)"
        " + list_dot_product(c.cv, c.cv)"
    )
    sums = ", ".join(f"SUM(qv[{j + 1}]) AS s{j}" for j in range(dim))
    cvec = (
        "["
        + ", ".join(f"CAST(s{j} AS DOUBLE) / n / 1000000.0" for j in range(dim))
        + "]"
    )
    ctes = [
        f"""pts AS (
      SELECT CAST(vec_id AS BIGINT) AS id,
             list_transform(CAST(embedding AS DOUBLE[])[1:{dim}],
                            x -> CAST(round(x * 1000000.0) AS BIGINT)) AS qv
      FROM embeddings WHERE embedding IS NOT NULL
    )""",
        "pv AS (SELECT id, qv, list_transform(qv, q -> q / 1000000.0) AS xv FROM pts)",
        f"""c0v AS (
      SELECT ROW_NUMBER() OVER (ORDER BY id) - 1 AS cell, xv AS cv
      FROM pv ORDER BY id LIMIT {k}
    )""",
    ]
    for it in range(1, iters + 1):
        ctes.append(
            f"""a{it} AS (
      SELECT id, qv, xv, cell FROM (
        SELECT p.id, p.qv, p.xv, c.cell,
               ROW_NUMBER() OVER (PARTITION BY p.id ORDER BY {dist}, c.cell) AS rn
        FROM pv p, c{it - 1}v c
      ) WHERE rn = 1
    )""",
        )
        ctes.append(
            f"""c{it} AS (
      SELECT cell, COUNT(*) AS n, {sums} FROM a{it} GROUP BY cell
    )""",
        )
        ctes.append(f"c{it}v AS (SELECT cell, {cvec} AS cv FROM c{it})")
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT id, cell AS cluster FROM (
      SELECT p.id, c.cell,
             ROW_NUMBER() OVER (PARTITION BY p.id ORDER BY {dist}, c.cell) AS rn
      FROM pv p, c{iters}v c
    ) WHERE rn = 1 ORDER BY id"""
    )


_QSCORE_SQL = """
      SELECT doc_id,
        LEAST(n_words / 50.0, 1.0) * 0.3
          + LEAST(stop_r * 4.0, 1.0) * 0.2
          + (1.0 - LEAST(punct_r * 5.0, 1.0)) * 0.2
          + (1.0 - LEAST(digit_r * 5.0, 1.0)) * 0.1
          + LEAST(uniq_r * 1.25, 1.0) * 0.2 AS score
      FROM (
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
        FROM (
          SELECT doc_id, text,
                 string_split(CASE WHEN LEN(TRIM(text)) = 0 THEN '' ELSE
                   trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g'))
                 END, ' ') AS words,
                 CASE WHEN length(trim(text)) = 0 THEN 0
                      ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_words
          FROM documents
        )
      )
"""


_LANG_PRED_SQL = f"""
      SELECT doc_id, CASE WHEN GREATEST(de, en, es, fr) = 0 THEN 'unknown'
                  WHEN de >= en AND de >= es AND de >= fr THEN 'de'
                  WHEN en >= es AND en >= fr THEN 'en'
                  WHEN es >= fr THEN 'es'
                  ELSE 'fr' END AS predicted_lang
      FROM (
        SELECT doc_id,
          len(list_filter(dw, x -> list_contains(['der','die','das','und','ist','von','mit','den','ein','eine'], x))) AS de,
          len(list_filter(dw, x -> list_contains(['the','a','of','and','to','in','is','that','it','for'], x))) AS en,
          len(list_filter(dw, x -> list_contains(['el','la','de','que','y','en','un','una','los','por'], x))) AS es,
          len(list_filter(dw, x -> list_contains(['le','la','de','et','les','des','un','une','du','que'], x))) AS fr
        FROM (SELECT doc_id, list_distinct(string_split({_NORM_SQL.format(c='text')}, ' ')) AS dw FROM documents)
      )
"""



def _corpus_psi_block(col: str) -> str:
    """PSI-over-signal SQL block: baseline = even doc_ids, current = odd,
    10 bins from the baseline's range — mirrors drift.detectors.psi
    (same clamp, same eps smoothing) applied to the ``sig`` CTE."""
    return f"""
    SELECT '{col}' AS signal, ROUND(SUM((p - q) * LN((p + 1e-10) / (q + 1e-10))), 6) AS psi
    FROM (
      SELECT bins.i,
             COALESCE(bh.n, 0) / CAST((SELECT SUM(n) FROM hist WHERE side = 0 AND name = '{col}') AS DOUBLE) AS p,
             COALESCE(ch.n, 0) / CAST((SELECT SUM(n) FROM hist WHERE side = 1 AND name = '{col}') AS DOUBLE) AS q
      FROM (SELECT i FROM generate_series(0, 9) AS gs(i)) bins
      LEFT JOIN (SELECT bin, n FROM hist WHERE side = 0 AND name = '{col}') bh ON bins.i = bh.bin
      LEFT JOIN (SELECT bin, n FROM hist WHERE side = 1 AND name = '{col}') ch ON bins.i = ch.bin
    )
    """


_CORPUS_SIG_SQL = f"""
    sigbase AS (
      SELECT doc_id,
        LEAST(n_words / 50.0, 1.0) * 0.3
          + LEAST(stop_r * 4.0, 1.0) * 0.2
          + (1.0 - LEAST(punct_r * 5.0, 1.0)) * 0.2
          + (1.0 - LEAST(digit_r * 5.0, 1.0)) * 0.1
          + LEAST(uniq_r * 1.25, 1.0) * 0.2 AS quality_score,
        tok AS token_count, chars AS char_length
      FROM (
        SELECT doc_id, n_words,
          CASE WHEN len(words) > 0 THEN
            len(list_filter(words, x -> list_contains(['the','a','of','and','to','in','is','that','it','for'], x)))
            / CAST(len(words) AS DOUBLE) ELSE 0.0 END AS stop_r,
          CASE WHEN length(text) > 0 THEN
            len(regexp_extract_all(text, '[^\\x{{30}}-\\x{{39}}a-zA-Z_\\s]')) / CAST(length(text) AS DOUBLE)
            ELSE 0.0 END AS punct_r,
          CASE WHEN length(text) > 0 THEN
            len(regexp_extract_all(text, '[0-9]')) / CAST(length(text) AS DOUBLE)
            ELSE 0.0 END AS digit_r,
          CASE WHEN len(words) > 0 THEN len(list_distinct(words)) / CAST(len(words) AS DOUBLE)
               ELSE 0.0 END AS uniq_r,
          CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS DOUBLE) AS tok,
          CAST(COALESCE(length(text), 0) AS DOUBLE) AS chars
        FROM (
          SELECT doc_id, text,
                 string_split(CASE WHEN LEN(TRIM(text)) = 0 THEN '' ELSE
                   trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g'))
                 END, ' ') AS words,
                 CASE WHEN length(trim(text)) = 0 THEN 0
                      ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_words
          FROM documents
        )
      )
    ),
    melted AS (
      SELECT doc_id % 2 AS side, 'quality_score' AS name, quality_score AS value FROM sigbase
      UNION ALL SELECT doc_id % 2, 'token_count', token_count FROM sigbase
      UNION ALL SELECT doc_id % 2, 'char_length', char_length FROM sigbase
    ),
    rng AS (
      SELECT name, MIN(value) AS lo, MAX(value) AS hi FROM melted WHERE side = 0 GROUP BY name
    ),
    hist AS (
      SELECT m.side, m.name,
             LEAST(GREATEST(CAST(FLOOR((m.value - r.lo) / ((r.hi - r.lo) / 10)) AS INT), 0), 9) AS bin,
             COUNT(*) AS n
      FROM melted m JOIN rng r ON m.name = r.name
      GROUP BY 1, 2, 3
    )
"""


def _lof_embeddings_oracle(k: int, num_planes: int, num_bands: int, seed: int) -> str:
    """Relational replay of neighbors.lof_embeddings: the seeded LSH
    planes inline as literals (bucket bit i = sign(v · plane_i), same
    fold), banded directed candidates, (d, nbr)-ranked kNN with the
    fewer-than-k fallback, then the identical quantized reach/lrd/LOF
    chain as the lof_native oracle."""
    from truthound_spark.pipeline.similarity import make_planes

    def lit(p):
        return "[" + ", ".join(repr(float(x)) for x in p) + "]"

    band_exprs = []
    for band in range(num_bands):
        planes = make_planes(64, num_planes, seed + 7919 * band)
        bits = " + ".join(
            f"(CASE WHEN list_dot_product(v, {lit(p)}) >= 0 THEN {1 << i} ELSE 0 END)"
            for i, p in enumerate(planes)
        )
        band_exprs.append(f"SELECT id, v, {band} AS band, ({bits}) AS bucket FROM ed")
    entries = " UNION ALL ".join(band_exprs)
    d2 = (
        "list_dot_product(a.v_a, a.v_a) - 2 * list_dot_product(a.v_a, b.v_b)"
        " + list_dot_product(b.v_b, b.v_b)"
    )
    return f"""
    WITH ed AS (
      SELECT CAST(vec_id AS BIGINT) AS id, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings
    ),
    ent AS ({entries}),
    cand AS (
      SELECT DISTINCT x.id AS id_a, y.id AS id_b
      FROM ent x JOIN ent y ON x.band = y.band AND x.bucket = y.bucket AND x.id <> y.id
    ),
    scored AS (
      SELECT a.id_a AS id, a.id_b AS nbr, sqrt({d2}) AS d
      FROM (SELECT c.id_a, c.id_b, e.v AS v_a FROM cand c JOIN ed e ON c.id_a = e.id) a
      JOIN (SELECT id AS id_b2, v AS v_b FROM ed) b ON a.id_b = b.id_b2
    ),
    ranked AS (
      SELECT id, nbr, d, ROW_NUMBER() OVER (PARTITION BY id ORDER BY d, nbr) AS rn
      FROM scored
    ),
    kd AS (
      SELECT id, MAX(CASE WHEN rn <= {k} THEN d END) AS k_dist FROM ranked GROUP BY id
    ),
    e AS (
      SELECT s.id, s.nbr, s.d FROM scored s JOIN kd ON s.id = kd.id
      WHERE s.d <= kd.k_dist
    ),
    r AS (
      SELECT e.id, e.nbr,
             CAST(round(GREATEST(ko.k_dist, e.d) * 1000000.0) AS BIGINT) AS qreach
      FROM e JOIN kd ko ON e.nbr = ko.id
    ),
    l AS (
      SELECT id, CAST(COUNT(*) AS DOUBLE) * 1000000.0
                   / NULLIF(CAST(SUM(qreach) AS DOUBLE), 0.0) AS lrd
      FROM r GROUP BY id
    ),
    q AS (SELECT id, lrd, CAST(round(lrd * 1000000.0) AS BIGINT) AS qlrd FROM l),
    m AS (
      SELECT e.id, CAST(SUM(qo.qlrd) AS DOUBLE) / COUNT(qo.qlrd) / 1000000.0 AS mean_lrd_o
      FROM e JOIN q qo ON e.nbr = qo.id GROUP BY e.id
    )
    SELECT ed.id, ROUND(m.mean_lrd_o / q.lrd, 6) AS lof
    FROM ed
    LEFT JOIN q ON ed.id = q.id
    LEFT JOIN m ON ed.id = m.id
    ORDER BY ed.id
    """


# ===========================================================================
# Round 5: tokenizer training, cluster-aware split, ANN evaluation
# ===========================================================================


def _bpe_oracle_ctes(rounds: int, min_pair_count: int = 2) -> str:
    """The shared CTE chain replaying bpe_train: per-round pair-count
    argmax + delimiter-wrapped string replace, in the SAME operations
    DuckDB has (string replace is greedy left-to-right non-overlapping
    in both engines — the exact BPE merge fold).

    Early-stop parity: each m{r} filters ``c >= min_pair_count`` exactly
    like bpe_train's stop condition, and w{r} applies the merge via a
    LEFT JOIN ON TRUE — when no pair qualifies, m{r} is empty, w{r}
    passes w{r-1} through UNCHANGED (a cross join would silently EMPTY
    the relation), and every later round is identically empty — the
    relational image of the Spark loop's break. Returns the "WITH ..."
    prefix ending at w{rounds}; callers append their own final SELECT
    against m1..m{rounds} / w{rounds}."""
    norm = _NORM_SQL.format(c="text")
    pair_cte = """p{r} AS (
      SELECT p[1] AS x, p[2] AS y, SUM(n) AS c FROM (
        SELECT n, unnest(list_zip(syms[1:len(syms)-1], syms[2:len(syms)])) AS p
        FROM (SELECT n, string_split(trim(sym,'|'),'||') AS syms FROM w{prev})
      ) GROUP BY 1,2
    )"""
    ctes = [
        f"""wc AS (
      SELECT word, COUNT(*) AS n FROM (
        SELECT unnest(string_split({norm}, ' ')) AS word FROM documents
      ) WHERE word <> '' GROUP BY word
    )""",
        "w0 AS (SELECT '|' || array_to_string(string_split(word,''),'||') || '|'"
        " AS sym, n FROM wc)",
    ]
    for r in range(1, rounds + 1):
        ctes.append(pair_cte.format(r=r, prev=r - 1))
        ctes.append(
            f"m{r} AS (SELECT x, y, c FROM p{r} WHERE c >= {min_pair_count}"
            f" ORDER BY c DESC, x, y LIMIT 1)"
        )
        ctes.append(
            f"w{r} AS (SELECT CASE WHEN m.x IS NULL THEN sym ELSE"
            f" replace(sym, '|'||m.x||'||'||m.y||'|', '|'||m.x||m.y||'|')"
            f" END AS sym, n FROM w{r-1} LEFT JOIN m{r} m ON TRUE)"
        )
    return "WITH " + ",\n".join(ctes)


def _bpe_oracle_sql(rounds: int) -> str:
    """Full bpe_train oracle: the CTE chain + one row per learned merge."""
    selects = [
        f'SELECT {r} AS round, x AS "left", y AS "right", x||y AS merged,'
        f" c AS pair_count FROM m{r}"
        for r in range(1, rounds + 1)
    ]
    return (
        _bpe_oracle_ctes(rounds)
        + "\n"
        + "\nUNION ALL ".join(selects)
        + " ORDER BY round"
    )


_BPE_ROUNDS = 6


_COS_SQL = (
    "list_dot_product({a}, {b})"
    " / (sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
)


def _ivfpq_oracle_sql(
    m: int, pq_k: int, iters: int, dim: int,
    num_cells: int, nprobe: int, n_queries: int, topk: int,
) -> str:
    """IVF-PQ relational replay: the seeded coarse quantizer's
    assignment/probe CTEs (same as the IVF slots) composed with the PQ
    training/encode/LUT CTEs (same as the PQ slots), scored only where
    the candidate's cell is probed by the query."""
    sub_d = dim // m
    ctes = _pq_oracle_ctes(m, pq_k, iters, dim)
    ctes.append(
        f"""ed AS (
      SELECT CAST(vec_id AS BIGINT) AS id,
             CAST(embedding AS DOUBLE[])[1:{dim}] AS v
      FROM embeddings
    )"""
    )
    ctes.append(
        f"cc AS (SELECT id AS cell, v AS cv FROM ed ORDER BY id LIMIT {num_cells})"
    )
    d2 = _IVF_D2.format(a="e.v", b="c.cv")
    ctes.append(
        f"""ca AS (
      SELECT id, cell FROM (
        SELECT e.id, c.cell,
               ROW_NUMBER() OVER (PARTITION BY e.id ORDER BY {d2}, c.cell) AS rn
        FROM ed e, cc c
      ) WHERE rn = 1
    )"""
    )
    ctes.append(
        f"""pb AS (
      SELECT qid, cell FROM (
        SELECT e.id AS qid, c.cell,
               ROW_NUMBER() OVER (PARTITION BY e.id ORDER BY {d2}, c.cell) AS rn
        FROM ed e, cc c WHERE e.id < {n_queries}
      ) WHERE rn <= {nprobe}
    )"""
    )
    for s in range(m):
        lo = s * sub_d
        ctes.append(
            f"""q{s} AS (
      SELECT CAST(vec_id AS BIGINT) AS qid,
             list_transform(CAST(embedding AS DOUBLE[])[{lo + 1}:{lo + sub_d}],
                            x -> round(x * 1000000.0) / 1000000.0) AS xv
      FROM embeddings WHERE vec_id < {n_queries}
    )"""
        )
        sq = " + ".join(
            f"(q.xv[{j + 1}] - c.cv[{j + 1}]) * (q.xv[{j + 1}] - c.cv[{j + 1}])"
            for j in range(sub_d)
        )
        ctes.append(
            f"lut{s} AS (SELECT q.qid, c.cell, {sq} AS d FROM q{s} q, c{iters}v{s} c)"
        )
    dsum = " + ".join(f"l{s}.d" for s in range(m))
    j = "fin0"
    for s in range(1, m):
        j += f" JOIN fin{s} USING (id)"
    lut_joins = " ".join(
        f"JOIN lut{s} l{s} ON l{s}.cell = fin{s}.cell AND l{s}.qid = l0.qid"
        for s in range(1, m)
    )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    , scored AS (
      SELECT l0.qid AS query_id, fin0.id,
             round(({dsum}) * 1000000.0) / 1000000.0 AS adc_dist
      FROM {j} JOIN lut0 l0 ON l0.cell = fin0.cell {lut_joins}
           JOIN ca ON ca.id = fin0.id
      WHERE EXISTS (SELECT 1 FROM pb WHERE pb.qid = l0.qid AND pb.cell = ca.cell)
    )
    SELECT query_id, id, adc_dist, CAST(rnk AS BIGINT) AS rank
    FROM (
      SELECT query_id, id, adc_dist,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adc_dist, id) AS rnk
      FROM scored
    ) WHERE rnk <= {topk} ORDER BY query_id, rnk"""
    )


def _ivfpq_residual_oracle_sql(
    m: int, pq_k: int, iters: int, dim: int,
    num_cells: int, nprobe: int, n_queries: int, topk: int,
) -> str:
    """Residual IVF-PQ replay: coarse assignment/probe CTEs feed a
    residual relation (x − centroid(cell)) into the SAME PQ training
    CTEs (source-parameterized), and each (query, probed cell) pair
    carries its own LUT over q − centroid(cell)."""
    sub_d = dim // m
    d2 = _IVF_D2.format(a="e.v", b="c.cv")
    pre = [
        f"""ed AS (
      SELECT CAST(vec_id AS BIGINT) AS id,
             CAST(embedding AS DOUBLE[])[1:{dim}] AS v
      FROM embeddings
    )""",
        f"cc AS (SELECT id AS cell, v AS cv FROM ed ORDER BY id LIMIT {num_cells})",
        f"""ca AS (
      SELECT id, cell FROM (
        SELECT e.id, c.cell,
               ROW_NUMBER() OVER (PARTITION BY e.id ORDER BY {d2}, c.cell) AS rn
        FROM ed e, cc c
      ) WHERE rn = 1
    )""",
        """resid AS (
      SELECT e.id AS vec_id,
             list_transform(list_zip(e.v, c.cv), p -> p[1] - p[2]) AS embedding
      FROM ed e JOIN ca ON ca.id = e.id JOIN cc c ON c.cell = ca.cell
    )""",
        f"""pb AS (
      SELECT qid, cell FROM (
        SELECT e.id AS qid, c.cell,
               ROW_NUMBER() OVER (PARTITION BY e.id ORDER BY {d2}, c.cell) AS rn
        FROM ed e, cc c WHERE e.id < {n_queries}
      ) WHERE rn <= {nprobe}
    )""",
    ]
    ctes = pre + _pq_oracle_ctes(m, pq_k, iters, dim, source="resid")
    for s in range(m):
        lo = s * sub_d
        sq = " + ".join(
            f"(round((q.v[{lo + j + 1}] - b.cv[{lo + j + 1}]) * 1000000.0) / 1000000.0"
            f" - c.cv[{j + 1}])"
            f" * (round((q.v[{lo + j + 1}] - b.cv[{lo + j + 1}]) * 1000000.0) / 1000000.0"
            f" - c.cv[{j + 1}])"
            for j in range(sub_d)
        )
        ctes.append(
            f"""lut{s} AS (
      SELECT q.id AS qid, pb.cell AS pcell, c.cell, {sq} AS d
      FROM ed q JOIN pb ON pb.qid = q.id JOIN cc b ON b.cell = pb.cell,
           c{iters}v{s} c
      WHERE q.id < {n_queries}
    )"""
        )
    dsum = " + ".join(f"l{s}.d" for s in range(m))
    j = "fin0"
    for s in range(1, m):
        j += f" JOIN fin{s} USING (id)"
    lut_joins = " ".join(
        f"JOIN lut{s} l{s} ON l{s}.cell = fin{s}.cell AND l{s}.qid = l0.qid"
        f" AND l{s}.pcell = l0.pcell"
        for s in range(1, m)
    )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    , scored AS (
      SELECT l0.qid AS query_id, fin0.id,
             round(({dsum}) * 1000000.0) / 1000000.0 AS adc_dist
      FROM {j} JOIN ca ON ca.id = fin0.id
           JOIN lut0 l0 ON l0.cell = fin0.cell AND l0.pcell = ca.cell
           {lut_joins}
    )
    SELECT query_id, id, adc_dist, CAST(rnk AS BIGINT) AS rank
    FROM (
      SELECT query_id, id, adc_dist,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adc_dist, id) AS rnk
      FROM scored
    ) WHERE rnk <= {topk} ORDER BY query_id, rnk"""
    )


def _lsh_multiprobe_oracle() -> str:
    """Multi-probe replay: same seeded planes as SQL literals; a corpus
    doc is a candidate when its bucket is the query's own bucket or any
    Hamming-1 flip of it."""
    from truthound_spark.pipeline.similarity import make_planes

    planes = make_planes(64, 6, 42)

    def lit(p):
        return "[" + ", ".join(repr(float(x)) for x in p) + "]"

    bits = " + ".join(
        f"(CASE WHEN list_dot_product(v, {lit(p)}) >= 0 THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    )
    probes = "[q.bucket" + "".join(
        f", xor(q.bucket, {1 << i})" for i in range(6)
    ) + "]"
    cos = (
        "list_dot_product(c.v, q.v) / (sqrt(list_dot_product(c.v, c.v))"
        " * sqrt(list_dot_product(q.v, q.v)))"
    )
    return f"""
    WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
    b AS (SELECT id, v, {bits} AS bucket FROM e),
    scored AS (
      SELECT q.id AS query_id, c.id AS id, {cos} AS cosine
      FROM b c JOIN b q ON list_contains({probes}, c.bucket) AND c.id <> q.id
      WHERE q.id < 5
    ),
    ranked AS (
      SELECT query_id, id, cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, id) AS rank
      FROM scored
    )
    SELECT query_id, id, ROUND(cosine, 6) AS cosine, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= 5 ORDER BY query_id, rank
    """


def _cond_rule_sql() -> str:
    """Conditional-mining oracle: per-pair gate arithmetic mirrored
    generically (no hardcoded expected rule set — the SQL applies the
    same coverage/confidence gates the miner does, so the slot stays
    correct if the data distribution shifts across scale factors)."""
    cols = {"q": "l_quantity", "p": "l_extendedprice", "d": "l_discount"}
    pairs = [(a, b) for a in cols for b in cols if a != b]
    stats = ["COUNT(*) AS n"]
    for k, c in cols.items():
        stats.append(f"COUNT({c}) AS nx_{k}")
        stats.append(f"SUM(CASE WHEN {c} > 0 THEN 1 ELSE 0 END) AS px_{k}")
    for a, b in pairs:
        ca, cb = cols[a], cols[b]
        stats.append(
            f"SUM(CASE WHEN {ca} IS NOT NULL AND {cb} IS NOT NULL THEN 1 ELSE 0 END)"
            f" AS nxy_{a}{b}"
        )
        stats.append(
            f"SUM(CASE WHEN {ca} > 0 AND {cb} > 0 THEN 1 ELSE 0 END) AS pxy_{a}{b}"
        )
        stats.append(
            f"SUM(CASE WHEN {ca} IS NOT NULL AND {cb} IS NOT NULL AND {ca} <= {cb}"
            f" THEN 1 ELSE 0 END) AS ord_{a}{b}"
        )
    branches = []
    for a, b in pairs:
        ca, cb = cols[a], cols[b]
        branches.append(
            f"SELECT 'null_impl_{ca}_to_{cb}' AS name,"
            f" 'null_implication' AS rule_type,"
            f" ROUND(nxy_{a}{b} * 1.0 / nx_{a}, 6) AS confidence,"
            f" ROUND(nxy_{a}{b} * 1.0 / n, 6) AS support FROM s"
            f" WHERE nx_{a} > n * 0.1 AND nxy_{a}{b} * 1.0 / nx_{a} >= 0.99"
        )
        branches.append(
            f"SELECT 'positive_impl_{ca}_to_{cb}', 'comparison_implication',"
            f" ROUND(pxy_{a}{b} * 1.0 / px_{a}, 6),"
            f" ROUND(pxy_{a}{b} * 1.0 / n, 6) FROM s"
            f" WHERE px_{a} >= n * 0.1 AND px_{a} > 0"
            f" AND pxy_{a}{b} * 1.0 / px_{a} >= 0.95"
        )
        branches.append(
            f"SELECT 'order_{ca}_leq_{cb}', 'ordering',"
            f" ROUND(ord_{a}{b} * 1.0 / nxy_{a}{b}, 6),"
            f" ROUND(ord_{a}{b} * 1.0 / n, 6) FROM s"
            f" WHERE nxy_{a}{b} >= n * 0.5 AND ord_{a}{b} * 1.0 / nxy_{a}{b} >= 0.99"
        )
    return (
        "WITH s AS (SELECT " + ", ".join(stats) + " FROM lineitem)\n"
        "SELECT * FROM (\n" + "\nUNION ALL\n".join(branches) + "\n) ORDER BY name"
    )


# ---------------------------------------------------------------------------
# round 7 (cont.): distributed regression fits — logistic GD + closed-form
# linear — hash-certified through the arithmetic (pipeline/regression.py)
# ---------------------------------------------------------------------------

#: documents feature CTE shared by the logreg slots: x1 = kilochars,
#: x2 = hectospaces, y = 1 iff lang='en'. Engine-portable char math only.
_LOGREG_F = """f AS (
      SELECT CAST(doc_id AS BIGINT) AS id,
             n_chars / 1000.0 AS x1,
             (length(text) - length(replace(text, ' ', ''))) / 100.0 AS x2,
             CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
      FROM documents
      WHERE text IS NOT NULL AND n_chars IS NOT NULL AND lang IS NOT NULL
    )"""


def _logreg_weight_ctes(iters: int, lr: str = "0.5", q: str = "1000000") -> str:
    """CTE chain replaying pipeline/regression.logreg_train: w0 = zeros,
    then per GD round one aggregate of quantized-long gradient sums and
    a weight-update CTE mirroring the driver's IEEE arithmetic
    operation-for-operation (CAST(long AS DOUBLE) / q / n)."""
    z = "(w.wb + w.w1 * f.x1 + w.w2 * f.x2)"
    p = f"(1.0 / (1.0 + exp(-{z})))"
    ctes = [_LOGREG_F, "w0 AS (SELECT 0.0 AS wb, 0.0 AS w1, 0.0 AS w2)"]
    for it in range(1, iters + 1):
        ctes.append(
            f"""g{it} AS (
      SELECT COUNT(*) AS n,
             SUM(CAST(round(({p} - f.y) * {q}) AS BIGINT)) AS g0,
             SUM(CAST(round(({p} - f.y) * f.x1 * {q}) AS BIGINT)) AS g1,
             SUM(CAST(round(({p} - f.y) * f.x2 * {q}) AS BIGINT)) AS g2
      FROM f, w{it - 1} w
    )"""
        )
        ctes.append(
            f"""w{it} AS (
      SELECT w.wb - {lr} * ((CAST(g.g0 AS DOUBLE) / {q}) / g.n) AS wb,
             w.w1 - {lr} * ((CAST(g.g1 AS DOUBLE) / {q}) / g.n) AS w1,
             w.w2 - {lr} * ((CAST(g.g2 AS DOUBLE) / {q}) / g.n) AS w2
      FROM w{it - 1} w, g{it} g
    )"""
        )
    return "WITH " + ",\n    ".join(ctes)


_LOGREG_ITERS = 3


def _logreg_feats(spark, sf_dir):
    d = t(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
        & F.col("n_chars").isNotNull()
        & F.col("lang").isNotNull()
    )
    return d.select(
        F.col("doc_id").cast("long").alias("id"),
        (F.col("n_chars") / 1000.0).alias("x1"),
        (
            (
                F.length("text")
                - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
            )
            / 100.0
        ).alias("x2"),
        F.when(F.col("lang") == "en", 1.0).otherwise(0.0).alias("y"),
    )


# ---------------------------------------------------------------------------
# round 7 (cont.): classifier evaluation — confusion metrics, calibration,
# histogram-exact AUC (pipeline/regression.py)
# ---------------------------------------------------------------------------

#: fixed probe weights (no training cost in the eval slots): the eval
#: operators are model-agnostic; any [0,1] score column works.
_EVAL_SC = (
    _LOGREG_F
    + """,
    sc AS (
      SELECT f.id,
             round(1.0 / (1.0 + exp(-(-1.1 + 2.0 * f.x1 + 1.0 * f.x2))), 6)
               AS score,
             f.y AS y
      FROM f
    )"""
)


def _eval_scored(spark, sf_dir):
    from truthound_spark.pipeline.regression import logreg_score

    return logreg_score(_logreg_feats(spark, sf_dir), ["x1", "x2"], [-1.1, 2.0, 1.0])


def _fd_conf_sql(where: str, det: str, dep: str) -> str:
    return (
        f"(SELECT ROUND(SUM(CASE WHEN u <= 1 THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6)"
        f" FROM (SELECT {det} AS k, COUNT(DISTINCT {dep}) AS u FROM orders"
        f" WHERE {where} GROUP BY 1))"
    )


# per-group quantile-grid edges FITTED ONCE Spark-side (percentile_approx,
# probs i/8, accuracy 10000, sf0.01 events — the fit half of the sketch;
# provenance: VERDICT r8 #5 fit-then-replay). The replay below is what the
# oracle certifies: percentile_approx itself is not cross-engine
# reproducible (pytest pins it within 0.03 of exact KS instead), but given
# the same literal edges the cell-assignment + window + sup machinery is.
_KS_SKETCH_EDGES = {
    "click": [6.43, 14.7, 23.84, 35.28, 49.23, 70.48, 107.84],
    "error": [6.37, 14.24, 23.7, 34.38, 48.25, 70.05, 102.27],
    "purchase": [6.99, 14.41, 23.26, 33.95, 48.49, 66.44, 97.86],
    "signup": [6.7, 15.4, 25.47, 35.92, 50.05, 70.45, 101.67],
    "view": [6.39, 14.24, 22.9, 33.83, 47.72, 68.15, 102.28],
}

_KS_SKETCH_EDGE_VALUES = ", ".join(
    f"('{g}', {e!r})" for g, es in sorted(_KS_SKETCH_EDGES.items()) for e in es
)


_URL_RAW_SQL = (
    "(CASE WHEN c_custkey % 2 = 0 THEN 'HTTP' ELSE 'https' END) || "
    "'://WWW.Example' || CAST(c_custkey % 5 AS VARCHAR) || '.COM' || "
    "(CASE WHEN c_custkey % 2 = 0 THEN ':80' ELSE ':443' END) || "
    "'/Products/' || CAST(c_custkey % 7 AS VARCHAR) || "
    "(CASE WHEN c_custkey % 3 = 0 THEN '/' ELSE '' END) || "
    "'?utm_source=news&b=' || CAST(c_custkey % 3 AS VARCHAR) || '&a=1' || "
    "(CASE WHEN c_custkey % 4 = 0 THEN '&gclid=xyz' ELSE '' END) || '#frag'"
)


def _ab_variant_sql(name: str, mn: float) -> str:
    """One variant's metric row recomputed independently in SQL: the
    fused-aggregate counts (below-min / confusion vs the is_bad label)
    become CASE sums, and every ratio mirrors the Python expression
    shape bit-for-bit (tp/(tp+fp) etc. are exact-integer → double
    divisions in both engines)."""
    return f"""
      SELECT '{name}' AS variant,
        CAST(CASE WHEN below > 0 THEN 1.0 ELSE 0.0 END
             AS DOUBLE) AS violation_count,
        CAST(CASE WHEN below > 0 THEN 1.0 ELSE 0.0 END AS DOUBLE)
          / 2 AS violation_rate,
        CAST(below AS DOUBLE) / n AS flagged_row_rate,
        CASE WHEN tp + fp = 0 THEN 1.0
             ELSE CAST(tp AS DOUBLE) / (tp + fp) END AS "precision",
        CASE WHEN tp + fn = 0 THEN 1.0
             ELSE CAST(tp AS DOUBLE) / (tp + fn) END AS recall,
        CASE WHEN (CASE WHEN tp + fp = 0 THEN 1.0
                        ELSE CAST(tp AS DOUBLE) / (tp + fp) END)
                  + (CASE WHEN tp + fn = 0 THEN 1.0
                          ELSE CAST(tp AS DOUBLE) / (tp + fn) END) = 0
             THEN 0.0
             ELSE 2 * (CASE WHEN tp + fp = 0 THEN 1.0
                            ELSE CAST(tp AS DOUBLE) / (tp + fp) END)
                    * (CASE WHEN tp + fn = 0 THEN 1.0
                            ELSE CAST(tp AS DOUBLE) / (tp + fn) END)
                  / ((CASE WHEN tp + fp = 0 THEN 1.0
                           ELSE CAST(tp AS DOUBLE) / (tp + fp) END)
                     + (CASE WHEN tp + fn = 0 THEN 1.0
                             ELSE CAST(tp AS DOUBLE) / (tp + fn) END))
        END AS f1_score,
        CASE WHEN fp + tn = 0 THEN 0.0
             ELSE CAST(fp AS DOUBLE) / (fp + tn) END AS false_positive_rate,
        CASE WHEN fn + tp = 0 THEN 0.0
             ELSE CAST(fn AS DOUBLE) / (fn + tp) END AS false_negative_rate
      FROM (
        SELECT COUNT(*) AS n,
          SUM(CASE WHEN c_acctbal < {mn} THEN 1 ELSE 0 END) AS below,
          SUM(CASE WHEN c_acctbal < {mn} AND c_acctbal < 0
                   THEN 1 ELSE 0 END) AS tp,
          SUM(CASE WHEN c_acctbal < {mn} AND NOT (c_acctbal < 0)
                   THEN 1 ELSE 0 END) AS fp,
          SUM(CASE WHEN NOT (c_acctbal < {mn}) AND c_acctbal < 0
                   THEN 1 ELSE 0 END) AS fn,
          SUM(CASE WHEN NOT (c_acctbal < {mn}) AND NOT (c_acctbal < 0)
                   THEN 1 ELSE 0 END) AS tn
        FROM customer
      )
    """


def _replay_dump_dir(sf_dir: str, kind: str) -> str:
    import os as _os
    import tempfile as _tempfile

    return _os.path.join(
        _tempfile.gettempdir(),
        f"spark_graft_{kind}_replay_{_os.path.basename(sf_dir.rstrip('/'))}",
    )
