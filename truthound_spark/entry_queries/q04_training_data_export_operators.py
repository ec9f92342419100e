"""Entry-query registry section 4 (split from the single entry_queries module, r13). Import order = registration order = the original module's order."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from truthound_spark.entry_queries._core import (  # noqa: F401
    EV,
    _BPE_SQL,
    _CORPUS_SIG_SQL,
    _IVF_D2,
    _LANG_PRED_SQL,
    _NORM_SQL,
    _QSCORE_SQL,
    _SHINGLES_SQL,
    _WORDS_SQL,
    _corpus_psi_block,
    _kmeans_oracle_sql,
    _kmeans_vec_oracle_sql,
    _lof_embeddings_oracle,
    _media_df,
    _pq_encode_oracle_sql,
    _pq_search_oracle_sql,
    _scalar_df,
    fused_counts,
    register,
    t,
)



# ===========================================================================
# training-data export operators (pipeline/export.py)
# ===========================================================================


@register(
    "shard_balance_documents",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS total_docs,
           8 AS n_shards,
           TRUE AS all_docs_sharded,
           TRUE AS balanced_within_2x
    FROM documents
    """,
)
def q_shard_balance_documents(spark, sf_dir):
    """shard_by_hash (pipeline/export.py): deterministic xxhash64 sharding.
    Oracle pins exact totals plus the balance/coverage invariants (the hash
    itself is Spark-side xxhash64, not reproducible in DuckDB)."""
    from truthound_spark.pipeline.export import shard_by_hash

    df = t(spark, sf_dir, "documents")
    sharded = shard_by_hash(df, 8)
    per = sharded.groupBy("shard").agg(F.count(F.lit(1)).alias("n")).collect()
    counts = [r["n"] for r in per]
    total = sum(counts)
    return _scalar_df(
        spark,
        total_docs=int(total),
        n_shards=len(counts),
        all_docs_sharded=bool(total == df.count()),
        balanced_within_2x=bool(max(counts) <= 2 * min(counts)),
    )


@register(
    "pack_sequences_documents",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS total_docs,
           TRUE AS all_docs_packed,
           TRUE AS budget_respected,
           TRUE AS fill_at_least_half
    FROM documents
    """,
)
def q_pack_sequences_documents(spark, sf_dir):
    """pack_sequences greedy token-budget packing (pipeline/export.py):
    shard-local applyInPandas first-fit. Oracle pins exact document count
    + the packing invariants (budget, full coverage, ≥50% mean fill)."""
    from truthound_spark.pipeline.export import pack_sequences

    df = t(spark, sf_dir, "documents")
    budget = 256
    packed = pack_sequences(df, max_tokens=budget, n_shards=8).cache()
    try:
        stats = packed.agg(
            F.sum(F.size("doc_ids")).alias("docs"),
            F.max("total_tokens").alias("max_tok"),
            F.avg("total_tokens").alias("avg_tok"),
        ).collect()[0]
        total = df.count()
        return _scalar_df(
            spark,
            total_docs=int(stats["docs"]),
            all_docs_packed=bool(stats["docs"] == total),
            budget_respected=bool(stats["max_tok"] <= budget),
            fill_at_least_half=bool(stats["avg_tok"] >= budget / 2),
        )
    finally:
        packed.unpersist()


@register(
    "train_val_split_documents",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS total_docs,
           TRUE AS partition_exact,
           TRUE AS no_content_leak,
           TRUE AS val_fraction_sane
    FROM documents
    """,
)
def q_train_val_split_documents(spark, sf_dir):
    """train_val_split content-hash split (pipeline/export.py): the same
    normalized content can never appear on both sides. Oracle pins the
    exact total + partition/leak-freedom/fraction invariants."""
    from truthound_spark.pipeline.dedup import content_fingerprint
    from truthound_spark.pipeline.export import train_val_split

    df = t(spark, sf_dir, "documents")
    train, val = train_val_split(df, val_fraction=0.1)
    n, tr, va = df.count(), train.count(), val.count()
    t_fp = train.select(content_fingerprint(F.col("text")).alias("fp")).distinct()
    v_fp = val.select(content_fingerprint(F.col("text")).alias("fp")).distinct()
    overlap = t_fp.join(v_fp, "fp").count()
    return _scalar_df(
        spark,
        total_docs=int(n),
        partition_exact=bool(tr + va == n),
        no_content_leak=bool(overlap == 0),
        val_fraction_sane=bool(0.02 <= va / n <= 0.5),
    )


@register(
    "chinese_uscc_checksum_derived",
    """
    WITH d AS (
      SELECT lpad(CAST((c_custkey * 91) % 100000000000000000 AS VARCHAR), 17, '0')
             || substr('0123456789ABCDEFGHJKLMNPQRTUWXY', CAST(c_custkey % 31 AS INT) + 1, 1) AS uscc
      FROM customer
    ),
    chk AS (SELECT uscc, (strpos('0123456789ABCDEFGHJKLMNPQRTUWXY', uscc[1]) - 1) * 1 + (strpos('0123456789ABCDEFGHJKLMNPQRTUWXY', uscc[2]) - 1) * 3 + (strpos('0123456789ABCDEFGHJKLMNPQRTUWXY', uscc[3]) - 1) * 9 + (strpos('0123456789ABCDEFGHJKLMNPQRTUWXY', uscc[4]) - 1) * 27 + (strpos('0123456789ABCDEFGHJKLMNPQRTUWXY', uscc[5]) - 1) * 19 + (strpos('0123456789ABCDEFGHJKLMNPQRTUWXY', uscc[6]) - 1) * 26 + (strpos('0123456789ABCDEFGHJKLMNPQRTUWXY', uscc[7]) - 1) * 16 + (strpos('0123456789ABCDEFGHJKLMNPQRTUWXY', uscc[8]) - 1) * 17 + (strpos('0123456789ABCDEFGHJKLMNPQRTUWXY', uscc[9]) - 1) * 20 + (strpos('0123456789ABCDEFGHJKLMNPQRTUWXY', uscc[10]) - 1) * 29 + (strpos('0123456789ABCDEFGHJKLMNPQRTUWXY', uscc[11]) - 1) * 25 + (strpos('0123456789ABCDEFGHJKLMNPQRTUWXY', uscc[12]) - 1) * 13 + (strpos('0123456789ABCDEFGHJKLMNPQRTUWXY', uscc[13]) - 1) * 8 + (strpos('0123456789ABCDEFGHJKLMNPQRTUWXY', uscc[14]) - 1) * 24 + (strpos('0123456789ABCDEFGHJKLMNPQRTUWXY', uscc[15]) - 1) * 10 + (strpos('0123456789ABCDEFGHJKLMNPQRTUWXY', uscc[16]) - 1) * 30 + (strpos('0123456789ABCDEFGHJKLMNPQRTUWXY', uscc[17]) - 1) * 28 AS tot FROM d)
    SELECT CAST(SUM(CASE WHEN uscc[18] =
                 substr('0123456789ABCDEFGHJKLMNPQRTUWXY', ((31 - (tot % 31)) % 31) + 1, 1)
               THEN 0 ELSE 1 END) AS BIGINT) AS invalid_uscc
    FROM chk
    """,
)
def q_chinese_uscc_checksum_derived(spark, sf_dir):
    """ChineseUscc mod-31 weighted checksum (business.py:448; reference
    localization/chinese.py:270) — charset-position arithmetic as one
    fused expression chain; oracle recomputes all 17 weighted terms."""
    from truthound_spark.validators.business import ChineseUsccValidator

    k = F.col("c_custkey")
    df = t(spark, sf_dir, "customer").select(
        F.concat(
            F.lpad(((k * 91) % 100000000000000000).cast("string"), 17, "0"),
            F.substring(F.lit("0123456789ABCDEFGHJKLMNPQRTUWXY"), 1, 31).substr(
                ((k % 31) + 1).cast("int"), F.lit(1)
            ),
        ).alias("uscc")
    )
    return fused_counts(df, [(ChineseUsccValidator("uscc"), ["invalid_uscc"])])


@register(
    "intl_privacy_patterns_derived",
    r"""
    WITH d AS (
      SELECT
        lpad(CAST(c_custkey % 1000 AS VARCHAR), 3, '0') || '.'
          || lpad(CAST((c_custkey * 3) % 1000 AS VARCHAR), 3, '0') || '.'
          || lpad(CAST((c_custkey * 7) % 1000 AS VARCHAR), 3, '0') || '-'
          || lpad(CAST(c_custkey % 100 AS VARCHAR), 2, '0') AS cpf,
        CASE WHEN c_custkey % 2 = 0
             THEN lpad(CAST(c_custkey % 1000 AS VARCHAR), 3, '0') || ' '
                  || lpad(CAST((c_custkey * 3) % 1000 AS VARCHAR), 3, '0') || ' '
                  || lpad(CAST((c_custkey * 7) % 1000 AS VARCHAR), 3, '0')
             ELSE 'id-' || CAST(c_custkey AS VARCHAR) END AS sin,
        CASE WHEN c_custkey % 3 = 0
             THEN lpad(CAST((c_custkey * 37) % 1000000000000 AS VARCHAR), 12, '0')
             ELSE CAST(c_custkey AS VARCHAR) END AS mynum
      FROM customer
    )
    SELECT
      CAST(SUM(CASE WHEN regexp_matches(cpf, '^[0-9]{3}\.?[0-9]{3}\.?[0-9]{3}-?[0-9]{2}$')
                    THEN 1 ELSE 0 END) AS BIGINT) AS cpf_matches,
      CAST(SUM(CASE WHEN regexp_matches(sin, '^[0-9]{3}[\s-]?[0-9]{3}[\s-]?[0-9]{3}$')
                    THEN 1 ELSE 0 END) AS BIGINT) AS sin_matches,
      CAST(SUM(CASE WHEN regexp_matches(mynum, '^[0-9]{12}$')
                    THEN 1 ELSE 0 END) AS BIGINT) AS mynumber_matches,
      CAST(2 AS BIGINT) AS special_category_columns
    FROM d
    """,
)
def q_intl_privacy_patterns_derived(spark, sf_dir):
    """LGPD CPF + PIPEDA SIN + APPI MyNumber pattern scans (privacy.py
    regulation catalogs; reference global_patterns.py:30-190) fused in one
    agg, plus the GDPR special-category COLUMN-NAME path (privacy.py:328,
    hint-only, zero Spark jobs) on a frame with 'diagnosis'/'race'
    columns — the oracle pins that schema-derived count."""
    from truthound_spark.core.registry import get_validator

    k = F.col("c_custkey")
    df = t(spark, sf_dir, "customer").select(
        F.concat(
            F.lpad((k % 1000).cast("string"), 3, "0"), F.lit("."),
            F.lpad(((k * 3) % 1000).cast("string"), 3, "0"), F.lit("."),
            F.lpad(((k * 7) % 1000).cast("string"), 3, "0"), F.lit("-"),
            F.lpad((k % 100).cast("string"), 2, "0"),
        ).alias("cpf"),
        F.when(
            k % 2 == 0,
            F.concat(
                F.lpad((k % 1000).cast("string"), 3, "0"), F.lit(" "),
                F.lpad(((k * 3) % 1000).cast("string"), 3, "0"), F.lit(" "),
                F.lpad(((k * 7) % 1000).cast("string"), 3, "0"),
            ),
        ).otherwise(F.concat(F.lit("id-"), k.cast("string"))).alias("sin"),
        F.when(
            k % 3 == 0,
            F.lpad(((k * 37) % 1000000000000).cast("string"), 12, "0"),
        ).otherwise(k.cast("string")).alias("mynum"),
    )
    lgpd = get_validator("lgpd_compliance")(columns=["cpf"])
    pipeda = get_validator("pipeda_compliance")(columns=["sin"])
    appi = get_validator("appi_compliance")(columns=["mynum"])
    cpf_e = lgpd.specs(df)[0].extra_exprs["cpf"]
    sin_e = pipeda.specs(df)[0].extra_exprs["sin"]
    my_e = appi.specs(df)[0].extra_exprs["my_number"]
    counts = df.agg(
        cpf_e.cast("long").alias("cpf_matches"),
        sin_e.cast("long").alias("sin_matches"),
        my_e.cast("long").alias("mynumber_matches"),
    )
    # hint-only special-category detection on a renamed 2-col frame
    special_df = df.select(
        F.col("cpf").alias("diagnosis"), F.col("sin").alias("race")
    )
    findings = get_validator("gdpr_special_category")(
        check_column_names_only=True
    ).validate(special_df)
    return counts.select(
        "*", F.lit(len(findings)).cast("long").alias("special_category_columns")
    )


@register(
    "cross_table_distinct_count_orders",
    """
    SELECT
      CAST((SELECT COUNT(DISTINCT o_custkey) FROM orders) AS BIGINT) AS ordering_customers,
      CAST((SELECT COUNT(DISTINCT c_custkey) FROM customer) AS BIGINT) AS total_customers,
      ROUND((SELECT COUNT(DISTINCT o_custkey) FROM orders)
            / CAST((SELECT COUNT(DISTINCT c_custkey) FROM customer) AS DOUBLE), 6)
        AS customer_coverage
    """,
)
def q_cross_table_distinct_count_orders(spark, sf_dir):
    """CrossTableDistinctCount (referential.py; reference cross_table/
    aggregate.py distinct-count compare): two distinct aggregates, one
    driver-side ratio — no join of the tables themselves."""
    from truthound_spark.validators.referential import CrossTableDistinctCountValidator

    orders = t(spark, sf_dir, "orders")
    customer = t(spark, sf_dir, "customer")
    v = CrossTableDistinctCountValidator(
        reference_data=customer, column="o_custkey", reference_column="c_custkey"
    )
    v.validate(orders)  # engine path (issue emission depends on tolerance)
    a = orders.agg(F.countDistinct("o_custkey").alias("n")).collect()[0]["n"]
    b = customer.agg(F.countDistinct("c_custkey").alias("n")).collect()[0]["n"]
    return _scalar_df(
        spark,
        ordering_customers=int(a),
        total_customers=int(b),
        customer_coverage=round(a / b, 6),
    )


@register(
    "seasonal_value_completeness_events",
    f"""
    WITH {EV},
    hourly AS (
      SELECT EXTRACT(hour FROM ts) AS hr,
             AVG(value) AS mean_v,
             COUNT(value) / CAST(COUNT(*) AS DOUBLE) AS completeness
      FROM ev GROUP BY 1
    ),
    g AS (SELECT AVG(value) AS gmean FROM ev)
    SELECT
      ROUND(MAX(ABS(mean_v - gmean)), 4) AS max_seasonal_amplitude,
      ROUND(MIN(completeness), 4) AS min_bucket_completeness,
      CAST(COUNT(*) AS BIGINT) AS buckets
    FROM hourly, g
    """,
)
def q_seasonal_value_completeness_events(spark, sf_dir):
    """SeasonalDecomposition amplitude + TimeSeriesValueCompleteness
    (timeseries.py seasonality/value-completeness; reference timeseries/
    seasonality.py:249, completeness.py): per-date-part groupBy means and
    value-fill ratios — the distributed decomposition, O(buckets) out."""
    df = t(spark, sf_dir, "events")
    hourly = df.groupBy(F.hour("ts").alias("hr")).agg(
        F.avg("value").alias("mean_v"),
        (F.count("value") / F.count(F.lit(1))).alias("completeness"),
    )
    gmean = df.agg(F.avg("value")).collect()[0][0]
    return hourly.agg(
        F.round(F.max(F.abs(F.col("mean_v") - gmean)), 4).alias("max_seasonal_amplitude"),
        F.round(F.min("completeness"), 4).alias("min_bucket_completeness"),
        F.count(F.lit(1)).cast("long").alias("buckets"),
    )


# ===========================================================================
# corpus hygiene: cleaning, PII scrub, Gopher repetition filters
# ===========================================================================


@register(
    "clean_scrub_text_derived",
    r"""
    WITH d AS (
      SELECT doc_id,
             '<p>' || text || '</p> see https://example.com/' || CAST(doc_id AS VARCHAR)
               || CASE WHEN doc_id % 3 = 0
                       THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@mail.com'
                       ELSE '' END AS raw
      FROM documents
    ),
    cleaned AS (
      SELECT doc_id,
             trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
               raw, '<[^>]{0,500}>', ' ', 'g'), 'https?://[^\s]+', ' ', 'g'),
               '[\x00-\x08\x0b\x0c\x0e-\x1f]', '', 'g'), '\s+', ' ', 'g')) AS ct
      FROM d
    ),
    scrubbed AS (
      SELECT doc_id, ct,
             regexp_replace(ct, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                            '<EMAIL>', 'g') AS st
      FROM cleaned
    )
    SELECT
      CAST(SUM(CASE WHEN ct LIKE '%<p>%' OR regexp_matches(ct, 'https?://')
               THEN 1 ELSE 0 END) AS BIGINT) AS residual_markup,
      CAST(SUM(CASE WHEN st LIKE '%<EMAIL>%' THEN 1 ELSE 0 END) AS BIGINT) AS docs_scrubbed,
      CAST(SUM(length(ct)) AS BIGINT) AS total_clean_chars
    FROM scrubbed
    """,
)
def q_clean_scrub_text_derived(spark, sf_dir):
    """clean_text + scrub_pii_text (pipeline/text.py): C4-style markup/URL
    strip and free-text PII replacement as codegen'd regexp chains — the
    oracle re-runs the identical RE2 patterns in DuckDB."""
    from truthound_spark.pipeline.text import clean_text, scrub_pii_text

    k = F.col("doc_id")
    df = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("<p>"), F.col("text"), F.lit("</p> see https://example.com/"),
            k.cast("string"),
            F.when(
                k % 3 == 0,
                F.concat(F.lit(" contact user"), k.cast("string"), F.lit("@mail.com")),
            ).otherwise(F.lit("")),
        ).alias("raw"),
    )
    out = df.select(
        "doc_id", clean_text(F.col("raw")).alias("ct")
    ).select("doc_id", "ct", scrub_pii_text(F.col("ct")).alias("st"))
    return out.agg(
        F.sum(
            F.when(
                F.col("ct").contains("<p>") | F.col("ct").rlike("https?://"), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("residual_markup"),
        F.sum(F.when(F.col("st").contains("<EMAIL>"), 1).otherwise(0))
        .cast("long")
        .alias("docs_scrubbed"),
        F.sum(F.length("ct")).cast("long").alias("total_clean_chars"),
    )


@register(
    "gopher_repetition_documents",
    """
    WITH w AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(regexp_replace(lower(text),
               '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g')), ' ') AS ws,
             string_split(text, chr(10)) AS lines
      FROM documents
    ),
    sig AS (
      SELECT doc_id,
             CASE WHEN len(lines) > 0
                  THEN 1.0 - len(list_distinct(lines)) / CAST(len(lines) AS DOUBLE)
                  ELSE 0.0 END AS dup_line_fraction,
             CASE WHEN len(ws) > 0
                  THEN 1.0 - len(list_distinct(ws)) / CAST(len(ws) AS DOUBLE)
                  ELSE 0.0 END AS dup_word_fraction
      FROM w
    )
    SELECT
      ROUND(AVG(dup_line_fraction), 6) AS avg_dup_line_fraction,
      ROUND(AVG(dup_word_fraction), 6) AS avg_dup_word_fraction,
      CAST(SUM(CASE WHEN dup_word_fraction > 0.5 THEN 1 ELSE 0 END) AS BIGINT)
        AS highly_repetitive_docs
    FROM sig
    """,
)
def q_gopher_repetition_documents(spark, sf_dir):
    """repetition_signals (pipeline/text.py, Gopher corpus filters):
    dup-line / dup-word fractions as pure higher-order-function column
    math — per-document features with zero shuffle."""
    from truthound_spark.pipeline.text import repetition_signals

    df = t(spark, sf_dir, "documents")
    sig = repetition_signals(df)
    return sig.agg(
        F.round(F.avg("dup_line_fraction"), 6).alias("avg_dup_line_fraction"),
        F.round(F.avg("dup_word_fraction"), 6).alias("avg_dup_word_fraction"),
        F.sum(F.when(F.col("dup_word_fraction") > 0.5, 1).otherwise(0))
        .cast("long")
        .alias("highly_repetitive_docs"),
    )


# ===========================================================================
# batch 15: the full Query-SQL result-shape family (reference
# query/result.py, row_count.py, column.py, aggregate.py — 13 validators)
# driven end-to-end through the REAL validator classes
# ===========================================================================


@register(
    "query_result_shape_family_orders",
    """
    WITH tot AS (SELECT COUNT(*) AS n FROM orders),
    big AS (SELECT COUNT(*) AS n FROM orders WHERE o_totalprice > 100000),
    po AS (SELECT COUNT(*) AS n FROM orders WHERE o_orderstatus = 'O'),
    pp AS (SELECT COUNT(*) AS n FROM orders WHERE o_orderstatus = 'P'),
    mo AS (SELECT AVG(o_totalprice) AS v FROM orders WHERE o_orderstatus = 'O'),
    mf AS (SELECT AVG(o_totalprice) AS v FROM orders WHERE o_orderstatus = 'F'),
    ga AS (
      SELECT COUNT(*) AS n FROM (
        SELECT o_orderpriority, AVG(o_totalprice) AS v FROM orders GROUP BY 1
      ) WHERE v < 50000 OR v > 250000
    )
    SELECT
      CAST((SELECT COUNT(*) FROM orders WHERE o_totalprice < 0) AS BIGINT)
        AS no_rows_violations,
      (SELECT COUNT(DISTINCT o_orderstatus) FROM orders) = 3 AS single_value_ok,
      (SELECT n FROM po) > 0 AS returns_rows_ok,
      (SELECT string_agg(s, ',' ORDER BY s) FROM (
         SELECT DISTINCT o_orderstatus AS s FROM orders)) = 'F,O,P'
        AS matches_ok,
      (SELECT n FROM big) >= 1 AS row_count_ok,
      (SELECT n FROM big) * 1.0 / (SELECT n FROM tot) BETWEEN 0.05 AND 1.0
        AS row_count_ratio_ok,
      (SELECT n FROM po) >= (SELECT n FROM pp) AS row_count_compare_ok,
      CAST((SELECT COUNT(*) FROM orders
            WHERE o_orderpriority NOT IN ('1-URGENT','2-HIGH','3-MEDIUM',
                                          '4-NOT SPECIFIED','5-LOW')
              AND o_orderpriority IS NOT NULL) AS BIGINT)
        AS column_values_violations,
      CAST((SELECT COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey) FROM orders)
           AS BIGINT) AS column_unique_dups,
      CAST((SELECT COUNT(*) FROM orders WHERE o_custkey IS NULL) AS BIGINT)
        AS column_not_null_nulls,
      (SELECT AVG(o_totalprice) FROM orders) BETWEEN 1000 AND 1000000
        AS aggregate_ok,
      ABS((SELECT v FROM mo) - (SELECT v FROM mf))
        / (ABS((SELECT v FROM mf)) + 1e-10) <= 0.5 AS aggregate_compare_ok,
      CAST((SELECT n FROM ga) AS BIGINT) AS group_agg_violating_groups
    FROM tot
    """,
)
def q_query_result_shape_family_orders(spark, sf_dir):
    """All 13 Query-SQL result-shape validators (validators/query.py:181-554;
    reference query/result.py:18-230, row_count.py:17-180, column.py:17-188,
    aggregate.py:17-248) driven through their real ``validate()`` paths over
    a temp view of ``orders``. Each validator's outcome is reduced to a
    deterministic scalar (violation count or pass flag) so the whole family
    is oracle-checkable in one row. The user-SQL plans stay fully
    distributed: every query compiles through spark.sql over the view, and
    result-shape checks are aggregate/limit jobs, never driver row loops."""
    from truthound_spark.validators.query import (
        QueryAggregateCompareValidator,
        QueryAggregateValidator,
        QueryColumnNotNullValidator,
        QueryColumnUniqueValidator,
        QueryColumnValuesValidator,
        QueryGroupAggregateValidator,
        QueryMatchesValidator,
        QueryReturnsNoRowsValidator,
        QueryReturnsRowsValidator,
        QueryRowCountCompareValidator,
        QueryRowCountRatioValidator,
        QueryRowCountValidator,
        QueryReturnsSingleValueValidator,
    )

    df = t(spark, sf_dir, "orders")

    def n_violations(issues):
        return int(issues[0].count) if issues else 0

    def passed(issues):
        return not issues

    no_rows = QueryReturnsNoRowsValidator(
        "SELECT * FROM data WHERE o_totalprice < 0"
    ).validate(df)
    single = QueryReturnsSingleValueValidator(
        "SELECT COUNT(DISTINCT o_orderstatus) FROM data", expected_value=3
    ).validate(df)
    has_rows = QueryReturnsRowsValidator(
        "SELECT * FROM data WHERE o_orderstatus = 'O'"
    ).validate(df)
    matches = QueryMatchesValidator(
        "SELECT DISTINCT o_orderstatus FROM data",
        expected_rows=[("F",), ("O",), ("P",)],
    ).validate(df)
    row_count = QueryRowCountValidator(
        "SELECT * FROM data WHERE o_totalprice > 100000", min_count=1
    ).validate(df)
    ratio = QueryRowCountRatioValidator(
        "SELECT * FROM data WHERE o_totalprice > 100000",
        min_ratio=0.05,
        max_ratio=1.0,
    ).validate(df)
    compare = QueryRowCountCompareValidator(
        "SELECT * FROM data WHERE o_orderstatus = 'O'",
        "SELECT * FROM data WHERE o_orderstatus = 'P'",
        op=">=",
    ).validate(df)
    col_values = QueryColumnValuesValidator(
        "SELECT o_orderpriority FROM data",
        allowed=["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
    ).validate(df)
    col_unique = QueryColumnUniqueValidator(
        "SELECT o_orderkey FROM data"
    ).validate(df)
    col_not_null = QueryColumnNotNullValidator(
        "SELECT o_custkey FROM data"
    ).validate(df)
    agg = QueryAggregateValidator(
        "SELECT o_totalprice FROM data",
        agg="mean",
        min_value=1000,
        max_value=1_000_000,
    ).validate(df)
    agg_cmp = QueryAggregateCompareValidator(
        "SELECT o_totalprice FROM data WHERE o_orderstatus = 'O'",
        "SELECT o_totalprice FROM data WHERE o_orderstatus = 'F'",
        agg="mean",
        rel_tolerance=0.5,
    ).validate(df)
    grp = QueryGroupAggregateValidator(
        group_by=["o_orderpriority"],
        column="o_totalprice",
        agg="mean",
        min_value=50_000,
        max_value=250_000,
    ).validate(df)

    return _scalar_df(
        spark,
        no_rows_violations=n_violations(no_rows),
        single_value_ok=passed(single),
        returns_rows_ok=passed(has_rows),
        matches_ok=passed(matches),
        row_count_ok=passed(row_count),
        row_count_ratio_ok=passed(ratio),
        row_count_compare_ok=passed(compare),
        column_values_violations=n_violations(col_values),
        column_unique_dups=n_violations(col_unique),
        column_not_null_nulls=n_violations(col_not_null),
        aggregate_ok=passed(agg),
        aggregate_compare_ok=passed(agg_cmp),
        group_agg_violating_groups=n_violations(grp),
    )


@register(
    "cascade_depth_derived",
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
    ),
    d AS (SELECT MAX(depth) AS md FROM walk)
    SELECT (SELECT md FROM d) > 4 AS depth_exceeds_4,
           (SELECT md FROM d) <= 64 AS depth_within_64,
           CAST(LEAST((SELECT md FROM d), 6) AS BIGINT) AS reported_depth_at_bound_4
    FROM d
    """,
)
def q_cascade_depth_derived(spark, sf_dir):
    """CascadeDepthValidator (validators/referential.py:444; reference
    referential/cascade.py:297): FK dependency-chain depth over same-table
    id→parent edges, walked with broadcast frontier joins + localCheckpoint
    per level (bounded lineage — the BFS plan that survives deep chains).
    The derived edge table is the customer binary tree (parent=(id-1)//2).
    The validator caps its walk at max_depth+2 levels, so the violation's
    reported depth is min(true_depth, bound+2) — mirrored in the oracle
    with LEAST(max_depth, 6) at bound 4."""
    from truthound_spark.validators.referential import CascadeDepthValidator

    df = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        F.when(F.col("c_custkey") == 0, F.lit(None).cast("long"))
        .otherwise(F.floor((F.col("c_custkey") - 1) / 2).cast("long"))
        .alias("parent"),
    )
    tight = CascadeDepthValidator("id", "parent", max_depth=4).validate(df)
    loose = CascadeDepthValidator("id", "parent", max_depth=64).validate(df)
    return _scalar_df(
        spark,
        depth_exceeds_4=bool(tight),
        depth_within_64=not loose,
        reported_depth_at_bound_4=int(tight[0].actual) if tight else 0,
    )


@register(
    "feature_scale_lineitem",
    """
    WITH s AS (
      SELECT stddev_samp(l_quantity) AS s_qty,
             stddev_samp(l_extendedprice) AS s_price,
             stddev_samp(l_discount) AS s_disc
      FROM lineitem
    )
    SELECT ROUND(GREATEST(s_qty, s_price, s_disc)
                 / LEAST(s_qty, s_price, s_disc), 2) AS scale_ratio,
           GREATEST(s_qty, s_price, s_disc)
             / LEAST(s_qty, s_price, s_disc) > 100 AS exceeds_100,
           GREATEST(s_qty, s_price, s_disc)
             / LEAST(s_qty, s_price, s_disc) <= 1e9 AS within_1e9
    FROM s
    """,
)
def q_feature_scale_lineitem(spark, sf_dir):
    """FeatureScaleValidator (validators/ml_feature.py:173; reference
    ml_feature/scale.py:30): stddev-magnitude spread across numeric
    features from ONE fused agg — price vs discount spans >100x, so the
    tight bound flags and the loose bound passes; the flagged ratio is
    oracle-checked exactly."""
    from truthound_spark.validators.ml_feature import FeatureScaleValidator

    df = t(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    tight = FeatureScaleValidator(columns=cols, max_ratio=100).validate(df)
    loose = FeatureScaleValidator(columns=cols, max_ratio=1e9).validate(df)
    return _scalar_df(
        spark,
        scale_ratio=float(tight[0].actual) if tight else 0.0,
        exceeds_100=bool(tight),
        within_1e9=not loose,
    )


@register(
    "table_contracts_nation",
    """
    WITH d AS (SELECT * FROM (DESCRIBE SELECT * FROM nation))
    SELECT
      (SELECT COUNT(*) FROM nation) >= 1 AS not_empty_ok,
      (SELECT COUNT(*) FROM d) = 3 AS column_count_ok,
      (SELECT COUNT(*) FROM d
        WHERE (column_name = 'n_nationkey' AND column_type = 'INTEGER')
           OR (column_name = 'n_name' AND column_type = 'VARCHAR')
           OR (column_name = 'n_regionkey' AND column_type = 'INTEGER')) = 3
        AS schema_match_ok,
      (SELECT COUNT(*) FROM d
        WHERE column_type IN ('INTEGER', 'BIGINT', 'VARCHAR')) = 3
        AS types_allowed_ok,
      (SELECT COUNT(*) FROM nation) / 3.0 >= 1.0 AS row_col_ratio_ok
    """,
)
def q_table_contracts_nation(spark, sf_dir):
    """Table-contract family (validators/table.py:106-626; reference
    table/row_count.py:224, column_count.py:17, schema.py:17-330,
    size.py:115): TableNotEmpty (bounded ``limit(n).take(n)`` scan — never
    a full count), TableColumnCount / TableSchemaMatch / TableColumnTypes
    (pure schema checks, zero data jobs), and TableRowToColumnRatio (one
    fused count agg). The DuckDB oracle mirrors each contract against the
    same parquet via DESCRIBE introspection — Spark 'int'/'string' map to
    DuckDB INTEGER/VARCHAR."""
    from truthound_spark.validators.table import (
        TableColumnCountValidator,
        TableColumnTypesValidator,
        TableNotEmptyValidator,
        TableRowToColumnRatioValidator,
        TableSchemaMatchValidator,
    )

    df = t(spark, sf_dir, "nation")
    not_empty = TableNotEmptyValidator(min_rows=1).validate(df)
    col_count = TableColumnCountValidator(expected_count=3).validate(df)
    schema_match = TableSchemaMatchValidator(
        {"n_nationkey": "int", "n_name": "string", "n_regionkey": "int"},
        strict=True,
    ).validate(df)
    types_ok = TableColumnTypesValidator(
        {
            "n_nationkey": ["int", "bigint"],
            "n_name": "string",
            "n_regionkey": ["int", "bigint"],
        }
    ).validate(df)
    ratio = TableRowToColumnRatioValidator(min_ratio=1.0)
    from truthound_spark.core.executor import BatchExpressionExecutor

    ratio_issues = BatchExpressionExecutor([ratio]).execute(df)
    return _scalar_df(
        spark,
        not_empty_ok=not not_empty,
        column_count_ok=not col_count,
        schema_match_ok=not schema_match,
        types_allowed_ok=not types_ok,
        row_col_ratio_ok=not ratio_issues,
    )


@register(
    "streaming_microbatch_validation_events",
    f"""
    WITH {EV}
    SELECT CAST((SELECT COUNT(*) FROM ev WHERE value IS NULL) AS BIGINT)
             AS total_null_value,
           CAST((SELECT COUNT(*) FROM ev) AS BIGINT) AS total_rows,
           CAST(4 AS BIGINT) AS batches_processed,
           TRUE AS replay_ignored
    """,
)
def q_streaming_microbatch_validation_events(spark, sf_dir):
    """Micro-batch validation surface (streaming/validate.py:24-57;
    reference realtime/base.py:369-551): StreamingValidationSink invoked
    exactly as Structured Streaming's foreachBatch would — one call per
    micro-batch plus a REPLAYED batch_id (crash-recovery semantics) that
    the idempotence guard must drop. Per-batch suites run through the real
    ``th.check`` fused-agg path; summed per-batch null counts must equal
    the whole-table oracle count (partial results compose exactly — the
    property that makes incremental validation trustworthy)."""
    from truthound_spark.streaming.validate import StreamingValidationSink
    from truthound_spark.validators.completeness import NullValidator

    ev = t(spark, sf_dir, "events")
    sink = StreamingValidationSink([NullValidator(columns=["value"])])
    for batch_id in range(4):
        sink(ev.filter(F.col("event_id") % 4 == batch_id), batch_id)
    sink(ev.filter(F.col("event_id") % 4 == 0), 0)  # replayed batch

    def nulls(res):
        return sum(i.count for i in res.issues if i.issue_type == "null_values")

    total_null = sum(nulls(r) for _, r in sink.results)
    total_rows = sum(r.row_count for _, r in sink.results)
    return _scalar_df(
        spark,
        total_null_value=int(total_null),
        total_rows=int(total_rows),
        batches_processed=len(sink.results),
        replay_ignored=len(sink.results) == 4,
    )


# ===========================================================================
# Round 3: duplicate-cluster resolution + decontamination
# ===========================================================================


@register(
    "dedup_clusters_documents",
    # DuckDB disallows UNNEST anywhere inside a WITH RECURSIVE block, so
    # the edge list is built unnest-free: pairwise list_intersect Jaccard
    # over the shingle arrays (exhaustive — fine at oracle scale).
    f"""
    WITH RECURSIVE reach(node, root) AS (
      SELECT CAST(doc_id AS BIGINT), CAST(doc_id AS BIGINT) FROM documents
      UNION
      SELECT e.v, r.root FROM reach r JOIN (
        WITH shf AS (
          SELECT id, list_filter(sh, x -> x <> '') AS sh FROM ({_SHINGLES_SQL})
        ),
        p AS (
          SELECT a.id AS id_a, b.id AS id_b
          FROM shf a JOIN shf b ON a.id < b.id
          WHERE len(list_intersect(a.sh, b.sh))
                / CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS DOUBLE) >= 0.7
        )
        SELECT id_a AS u, id_b AS v FROM p
        UNION SELECT id_b, id_a FROM p
      ) e ON e.u = r.node
    )
    SELECT node AS doc_id, MIN(root) AS cluster_id,
           (MIN(root) = node) AS is_canonical
    FROM reach GROUP BY node ORDER BY doc_id
    """,
)
def q_dedup_clusters_documents(spark, sf_dir):
    """Fuzzy-dedup cluster resolution (pipeline/dedup.py dedup_clusters):
    MinHash-LSH pairs ≥ 0.7 → distributed connected components (min-label
    propagation + pointer jumping, localCheckpoint per round) →
    (doc_id, cluster_id, is_canonical). The oracle recomputes components
    with a recursive CTE over the exhaustive exact-Jaccard pair set — the
    transitive closure must match exactly, proving both the LSH recall
    argument AND the iterative component algorithm."""
    from truthound_spark.pipeline.dedup import dedup_clusters

    df = t(spark, sf_dir, "documents")
    return dedup_clusters(
        df, "text", "doc_id", threshold=0.7, num_hashes=64, bands=32,
        max_bucket_size=None,  # exact all-pairs: the oracle-certified mode
    ).orderBy("doc_id")


@register(
    "decontamination_overlap_documents",
    f"""
    WITH sh AS ({_SHINGLES_SQL}),
    tr AS (SELECT id, unnest(sh) AS g FROM sh WHERE id % 2 = 0),
    te AS (SELECT DISTINCT unnest(sh) AS g FROM sh WHERE id % 2 = 1)
    SELECT tr.id AS doc_id, CAST(COUNT(*) AS BIGINT) AS overlap_ngrams
    FROM tr JOIN te ON tr.g = te.g AND tr.g <> ''
    GROUP BY 1 ORDER BY 1
    """,
)
def q_decontamination_overlap_documents(spark, sf_dir):
    """Benchmark decontamination (pipeline/dedup.py decontaminate):
    training docs (even doc_ids) sharing any word 3-gram with the held-out
    set (odd doc_ids). The distinct test n-gram probe set is broadcast
    against the train inverted index — the training corpus itself is
    never shuffled, the property that makes this runnable at 100 TB."""
    from truthound_spark.pipeline.dedup import decontaminate

    df = t(spark, sf_dir, "documents")
    train = df.filter(F.col("doc_id") % 2 == 0)
    test = df.filter(F.col("doc_id") % 2 == 1)
    return decontaminate(train, test, "text", "doc_id", n=3).orderBy("doc_id")


@register(
    "ivf_seeded_topk_embeddings",
    f"""
    WITH ed AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding FROM embeddings
    ),
    c AS (
      SELECT CAST(vec_id AS BIGINT) AS cell, embedding AS cv
      FROM ed ORDER BY vec_id LIMIT 16
    ),
    a AS (
      SELECT id, v, cell FROM (
        SELECT CAST(e.vec_id AS BIGINT) AS id, e.embedding AS v, c.cell,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {_IVF_D2.format(a='e.embedding', b='c.cv')}, c.cell
               ) AS rn
        FROM ed e, c
      ) WHERE rn = 1
    ),
    probe AS (
      SELECT query_id, qv, cell FROM (
        SELECT CAST(q.vec_id AS BIGINT) AS query_id, q.embedding AS qv, c.cell,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY {_IVF_D2.format(a='q.embedding', b='c.cv')}, c.cell
               ) AS rn
        FROM ed q, c WHERE q.vec_id < 8
      ) WHERE rn <= 2
    ),
    s AS (
      SELECT p.query_id, a.id,
             list_dot_product(a.v, p.qv)
               / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(p.qv, p.qv)))
             AS cosine
      FROM probe p JOIN a ON a.cell = p.cell
      WHERE a.id <> p.query_id
    )
    SELECT query_id, id, ROUND(cosine, 6) AS cosine, CAST(rank AS BIGINT) AS rank
    FROM (
      SELECT query_id, id, cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, id) AS rank
      FROM s
    ) WHERE rank <= 5
    ORDER BY query_id, rank
    """,
)
def q_ivf_seeded_topk_embeddings(spark, sf_dir):
    """IVF ANN, fully oracle-verified (pipeline/similarity.py
    ivf_seeded_topk): deterministic seed centroids (16 lowest vec_ids, no
    Lloyd iterations) make assignment + probing closed-form; the unrounded
    argmin cell assignment hash-matches because both engines compute the
    distance in the same dot-product fold form. The production
    ``ivf_assign`` path (sampled k-means) shares this probe/search plan
    and stays covered by the rows-only ``ivf_topk_embeddings`` entry."""
    from truthound_spark.pipeline.similarity import ivf_seeded_topk

    df = t(spark, sf_dir, "embeddings")
    q = df.filter(F.col("vec_id") < 8)
    out = ivf_seeded_topk(df, q, k=5, num_cells=16, nprobe=2)
    return out.select(
        "query_id", "id", F.round("cosine", 6).alias("cosine"),
        F.col("rank").cast("long").alias("rank"),
    ).orderBy("query_id", "rank")


@register(
    "pca_power_anomaly_lineitem",
    """
    WITH stats AS (
      SELECT AVG(l_quantity) AS mu0, AVG(l_extendedprice) AS mu1, AVG(l_discount) AS mu2,
             covar_pop(l_quantity, l_quantity) AS c00,
             covar_pop(l_quantity, l_extendedprice) AS c01,
             covar_pop(l_quantity, l_discount) AS c02,
             covar_pop(l_extendedprice, l_extendedprice) AS c11,
             covar_pop(l_extendedprice, l_discount) AS c12,
             covar_pop(l_discount, l_discount) AS c22
      FROM lineitem
    ),
    it1 AS (
      SELECT *, c00 + c01 + c02 AS s0, c01 + c11 + c12 AS s1, c02 + c12 + c22 AS s2
      FROM stats
    ),
    it2 AS (
      SELECT *, c00 * s0 + c01 * s1 + c02 * s2 AS t0,
                c01 * s0 + c11 * s1 + c12 * s2 AS t1,
                c02 * s0 + c12 * s1 + c22 * s2 AS t2
      FROM it1
    ),
    pc AS (
      SELECT *, t0 / sqrt(t0 * t0 + t1 * t1 + t2 * t2) AS v0,
                t1 / sqrt(t0 * t0 + t1 * t1 + t2 * t2) AS v1,
                t2 / sqrt(t0 * t0 + t1 * t1 + t2 * t2) AS v2,
                c00 + c11 + c22 AS trace
      FROM it2
    ),
    scored AS (
      SELECT l.l_orderkey, l.l_linenumber,
             ((l.l_quantity - p.mu0) * (l.l_quantity - p.mu0)
              + (l.l_extendedprice - p.mu1) * (l.l_extendedprice - p.mu1)
              + (l.l_discount - p.mu2) * (l.l_discount - p.mu2)
              - ((l.l_quantity - p.mu0) * p.v0 + (l.l_extendedprice - p.mu1) * p.v1
                 + (l.l_discount - p.mu2) * p.v2)
                * ((l.l_quantity - p.mu0) * p.v0 + (l.l_extendedprice - p.mu1) * p.v1
                   + (l.l_discount - p.mu2) * p.v2)) / p.trace AS err
      FROM lineitem l, pc p
    )
    SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
           CAST(l_linenumber AS BIGINT) AS l_linenumber,
           r6 AS resid_ratio,
           CAST(rank AS BIGINT) AS rank
    FROM (
      SELECT l_orderkey, l_linenumber, ROUND(err, 6) AS r6,
             ROW_NUMBER() OVER (ORDER BY ROUND(err, 6) DESC, l_orderkey, l_linenumber) AS rank
      FROM scored
    ) WHERE rank <= 10 ORDER BY rank
    """,
)
def q_pca_power_anomaly_lineitem(spark, sf_dir):
    """PCA reconstruction-error anomaly ranking, fully oracle-verified:
    top principal component via TWO fixed power-iteration steps from the
    all-ones start vector (closed-form — same literal arithmetic both
    engines, normalization deferred to the end so scaling cancels), then
    the top-10 rows by residual ratio ||x-mu||² - ((x-mu)·v)² over
    trace(Σ). The production PCAAnomalyValidator (numpy eigh, m
    components, approx-quantile threshold — iterative, genuinely non-SQL)
    stays covered by the rows-only pca_anomaly_lineitem entry."""
    df = t(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    aggs = [F.avg(c).alias(f"mu{i}") for i, c in enumerate(cols)]
    for i in range(3):
        for j in range(i, 3):
            aggs.append(F.covar_pop(cols[i], cols[j]).alias(f"c{i}{j}"))
    st = df.agg(*aggs).collect()[0].asDict()
    mu = [st["mu0"], st["mu1"], st["mu2"]]
    c = [[st["c00"], st["c01"], st["c02"]],
         [st["c01"], st["c11"], st["c12"]],
         [st["c02"], st["c12"], st["c22"]]]
    # two power-iteration steps, all-ones start, same operation order as
    # the SQL (left-to-right adds, no interim normalization)
    s = [c[i][0] + c[i][1] + c[i][2] for i in range(3)]
    tv = [c[i][0] * s[0] + c[i][1] * s[1] + c[i][2] * s[2] for i in range(3)]
    import math

    nrm = math.sqrt(tv[0] * tv[0] + tv[1] * tv[1] + tv[2] * tv[2])
    v = [x / nrm for x in tv]
    trace = c[0][0] + c[1][1] + c[2][2]

    centered = [F.col(cols[i]) - F.lit(float(mu[i])) for i in range(3)]
    proj = (
        centered[0] * F.lit(v[0]) + centered[1] * F.lit(v[1]) + centered[2] * F.lit(v[2])
    )
    err = (
        centered[0] * centered[0]
        + centered[1] * centered[1]
        + centered[2] * centered[2]
        - proj * proj
    ) / F.lit(float(trace))
    from pyspark.sql import Window

    # rank on the 6-dp-ROUNDED residual (ties broken by key) in BOTH
    # engines: the unrounded values differ between Spark's distributed
    # avg/covar_pop fold order and DuckDB's sequential one at sub-ulp
    # magnitudes, so an unrounded rank could flip on boundary values at
    # other scale factors / partition counts (ADVICE r3)
    # top-k first via orderBy+limit (TakeOrdered: per-partition heads,
    # driver merge of 10 rows), THEN row_number over the 10-row result —
    # the repo idiom (retrieval.py:186); a full-table rank window would
    # funnel every row through one partition (VERDICT r7 #8)
    scored = df.select(
        F.col("l_orderkey").cast("long"),
        F.col("l_linenumber").cast("long"),
        F.round(err, 6).alias("resid_ratio"),
    )
    order = [F.desc("resid_ratio"), F.col("l_orderkey"), F.col("l_linenumber")]
    top = scored.orderBy(*order).limit(10)
    w = Window.orderBy(*order)
    return (
        top.withColumn("rank", F.row_number().over(w).cast("long"))
        .select("l_orderkey", "l_linenumber", "resid_ratio", "rank")
        .orderBy("rank")
    )


# ===========================================================================
# round-4 oracle-ization of previously pytest-only surfaces:
# the full check() API path, evidence sampling, and fake masking
# ===========================================================================


@register(
    "check_report_orders",
    """
    SELECT * FROM (
      SELECT 'range' AS validator_name, 'o_totalprice' AS column_name,
             CAST(SUM(CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END) AS BIGINT) AS n
      FROM orders
      UNION ALL
      SELECT 'in_set', 'o_orderstatus',
             CAST(SUM(CASE WHEN o_orderstatus IS NOT NULL
                            AND o_orderstatus NOT IN ('O','F') THEN 1 ELSE 0 END) AS BIGINT)
      FROM orders
      UNION ALL
      SELECT 'regex', 'o_orderpriority',
             CAST(SUM(CASE WHEN o_orderpriority IS NOT NULL
                            AND NOT regexp_matches(o_orderpriority, '^[1-3]') THEN 1 ELSE 0 END) AS BIGINT)
      FROM orders
    ) ORDER BY validator_name
    """,
)
def q_check_report_orders(spark, sf_dir):
    """The PUBLIC ``th.check`` entrypoint end-to-end (api.py check →
    executor fused agg → ValidationRunResult), not just the spec layer:
    the emitted issue rows themselves are the verified output (reference
    core engine run loop, validators/base.py:787-878)."""
    from truthound_spark.api import check
    from truthound_spark.core.registry import get_validator

    df = t(spark, sf_dir, "orders")
    res = check(
        df,
        validators=[
            get_validator("range")(column="o_totalprice", min_value=0, max_value=200000),
            get_validator("in_set")(column="o_orderstatus", values=["O", "F"]),
            get_validator("regex")(column="o_orderpriority", pattern="^[1-3]"),
        ],
    )
    rows = [(i.validator_name, i.column, int(i.count)) for i in res.issues]
    return spark.createDataFrame(
        sorted(rows), "validator_name string, column_name string, n long"
    )


@register(
    "evidence_samples_customer",
    """
    SELECT ROUND(c_acctbal, 2) AS sample_value FROM customer
    WHERE c_acctbal < -990 ORDER BY 1
    """,
)
def q_evidence_samples_customer(spark, sf_dir):
    """Evidence sampling path (core/executor.py _enrich; reference
    ResultFormat partial_unexpected_list, types.py:95-174): the
    sample_values a failing check attaches ARE the verified output. The
    cap is set above the failing-set size so the collected sample is the
    complete (order-normalized) violation set."""
    from truthound_spark.api import check
    from truthound_spark.core.registry import get_validator
    from truthound_spark.types import ResultFormatConfig, ResultFormat

    df = t(spark, sf_dir, "customer")
    res = check(
        df,
        validators=[
            get_validator("range")(column="c_acctbal", min_value=-990.0, max_value=1e18)
        ],
        result_format=ResultFormatConfig(
            format=ResultFormat.SUMMARY, partial_unexpected_count=100000
        ),
    )
    vals = sorted(round(float(v), 2) for i in res.issues for v in i.sample_values)
    return spark.createDataFrame([(v,) for v in vals], "sample_value double")


@register(
    "mask_fake_customers",
    """
    WITH h AS (
      SELECT c_custkey,
             ('0x' || substr(md5(c_name), 1, 6))::BIGINT AS hn,
             ('0x' || substr(md5(c_mktsegment), 1, 6))::BIGINT AS hc
      FROM customer WHERE c_custkey <= 25
    )
    SELECT c_custkey,
           (['Alex Kim','Sam Lee','Jordan Park','Casey Choi','Riley Jung',
             'Morgan Han','Taylor Shin','Drew Kang','Jamie Cho','Avery Yoon'])[(hn % 10) + 1]
             AS masked_name,
           'user' || (hc % 100000)::VARCHAR || '@' ||
             (['example.com','example.org','example.net','mail.test','post.test'])[(hc % 5) + 1]
             AS masked_contact
    FROM h ORDER BY c_custkey
    """,
)
def q_mask_fake_customers(spark, sf_dir):
    """Fake-masking strategy through the real ``mask()`` API (maskers.py;
    reference api.py:206-268): md5-derived stable index → pseudonym
    lookup, reproducible across engines/runs — the oracle recomputes the
    identical pseudonyms in SQL."""
    from truthound_spark.maskers import mask

    df = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 25)
        .withColumn("contact", F.col("c_mktsegment"))
    )
    masked = mask(
        df,
        columns=["c_name", "contact"],
        strategy="fake",
        pii_types={"c_name": "name", "contact": "email"},
    )
    return masked.select(
        F.col("c_custkey").cast("long"),
        F.col("c_name").alias("masked_name"),
        F.col("contact").alias("masked_contact"),
    ).orderBy("c_custkey")


@register(
    "stratified_sample_documents",
    """
    SELECT doc_id, source FROM (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (
               PARTITION BY source ORDER BY md5(doc_id::VARCHAR), doc_id
             ) AS rn
      FROM documents
    ) WHERE rn <= 3 ORDER BY source, doc_id
    """,
)
def q_stratified_sample_documents(spark, sf_dir):
    """Deterministic per-source quota sampling (pipeline/export.py
    stratified_sample — data-mixing primitive): 3 docs per source in
    engine-portable md5 pseudo-random order; Spark plans the window as a
    WindowGroupLimit (per-group limit applied map-side pre-shuffle)."""
    from truthound_spark.pipeline.export import stratified_sample

    df = t(spark, sf_dir, "documents")
    return (
        stratified_sample(df, group_col="source", k_per_group=3)
        .select("doc_id", "source")
        .orderBy("source", "doc_id")
    )


@register(
    "mixture_weights_documents",
    f"""
    WITH avail AS (
      SELECT source,
             CAST(SUM({_BPE_SQL.format(c='text')}) AS BIGINT) AS available_tokens,
             CAST(CASE source WHEN 'src0' THEN 0.5 WHEN 'src1' THEN 0.3 ELSE 0.2 END AS DOUBLE) AS w
      FROM documents WHERE source IN ('src0','src1','src2') GROUP BY source
    ), s AS (SELECT MIN(available_tokens / w) AS s FROM avail)
    SELECT source, available_tokens, ROUND(w, 6) AS target_weight,
           CAST(FLOOR(s.s * w) AS BIGINT) AS target_tokens,
           ROUND(s.s * w / available_tokens, 6) AS sample_rate
    FROM avail, s ORDER BY source
    """,
)
def q_mixture_weights_documents(spark, sf_dir):
    """Token-mixture planning (pipeline/export.py mixture_weights): the
    largest token budget whose target proportions fit every source's
    available tokens, and the per-source sampling rate realizing it —
    one fused agg over the corpus, scalar fold on the tiny grouped
    result."""
    from truthound_spark.pipeline.export import mixture_weights

    df = t(spark, sf_dir, "documents")
    return mixture_weights(
        df, {"src0": 0.5, "src1": 0.3, "src2": 0.2}, group_col="source"
    ).orderBy("source")


@register(
    "decontamination_bloom_documents",
    f"""
    WITH sh AS ({_SHINGLES_SQL}),
    tr AS (SELECT id, unnest(sh) AS g FROM sh WHERE id % 2 = 0),
    te AS (SELECT DISTINCT unnest(sh) AS g FROM sh WHERE id % 2 = 1)
    SELECT tr.id AS doc_id, CAST(COUNT(*) AS BIGINT) AS overlap_ngrams
    FROM tr JOIN te ON tr.g = te.g AND tr.g <> ''
    GROUP BY 1 ORDER BY 1
    """,
)
def q_decontamination_bloom_documents(spark, sf_dir):
    """Bloom-prescreened decontamination (pipeline/dedup.py
    decontaminate_bloom): test n-grams fold into one bloom_filter_agg
    bitmap broadcast to the corpus; might_contain prescreens map-side and
    an exact-confirm join removes false positives — result is provably
    identical to the exact path, so the SAME oracle certifies it."""
    from truthound_spark.pipeline.dedup import decontaminate_bloom

    df = t(spark, sf_dir, "documents")
    train = df.filter(F.col("doc_id") % 2 == 0)
    test = df.filter(F.col("doc_id") % 2 == 1)
    return decontaminate_bloom(train, test, "text", "doc_id", n=3).orderBy("doc_id")


# ===========================================================================
# Round 4: exact distributed DBSCAN
# ===========================================================================


@register(
    "dbscan_clusters_customer",
    # eps = 0.25 (power-of-two fraction: eps² = 0.0625 is exact in IEEE
    # double, so the distance comparison cannot straddle a rounding
    # boundary between engines). The oracle recomputes DBSCAN relationally:
    # brute-force eps-pairs (fine at oracle scale), degree -> core points,
    # recursive-CTE transitive closure over core-core edges (min-root
    # labels = the engine's min-id cluster ids), min-cluster border
    # adoption. The Spark side must reproduce it EXACTLY via the grid
    # construction — proving cell partitioning loses no pairs.
    """
    WITH RECURSIVE
    pts AS (
      SELECT CAST(c_custkey AS BIGINT) AS id,
             c_acctbal / 1000 AS x0,
             CAST(c_nationkey AS DOUBLE) AS x1
      FROM customer
    ),
    pairs AS (
      SELECT a.id AS u, b.id AS v
      FROM pts a JOIN pts b
      ON a.id <> b.id
      AND (a.x0-b.x0)*(a.x0-b.x0) + (a.x1-b.x1)*(a.x1-b.x1)
          <= CAST(0.0625 AS DOUBLE)
    ),
    deg AS (SELECT u AS id, COUNT(*) AS nbrs FROM pairs GROUP BY u),
    lab AS (
      SELECT p.id, COALESCE(d.nbrs, 0) + 1 >= 4 AS is_core
      FROM pts p LEFT JOIN deg d USING (id)
    ),
    ce AS (
      SELECT u, v FROM pairs
      WHERE u IN (SELECT id FROM lab WHERE is_core)
        AND v IN (SELECT id FROM lab WHERE is_core)
    ),
    reach(node, root) AS (
      SELECT id, id FROM lab WHERE is_core
      UNION
      SELECT e.v, r.root FROM reach r JOIN ce e ON e.u = r.node
    ),
    comp AS (SELECT node AS id, MIN(root) AS cluster_id FROM reach GROUP BY node),
    border AS (
      SELECT p.u AS id, MIN(c.cluster_id) AS border_cluster
      FROM pairs p JOIN comp c ON p.v = c.id
      GROUP BY p.u
    )
    SELECT l.id, l.is_core,
           CASE WHEN l.is_core THEN comp.cluster_id
                ELSE border.border_cluster END AS cluster_id
    FROM lab l
    LEFT JOIN comp ON l.id = comp.id
    LEFT JOIN border ON l.id = border.id
    ORDER BY l.id
    """,
)
def q_dbscan_clusters_customer(spark, sf_dir):
    """Exact distributed DBSCAN (pipeline/clustering.py dbscan): customers
    embedded at (acctbal/1000, nationkey), eps=0.25, min_pts=4. Candidate
    pairs come from the eps-grid equi-join (3^d neighbor cells — never a
    cross join), core points from one degree groupBy, clusters from the
    audited connected-components rounds, border points adopt the min
    in-range core cluster. Exercises grid partitioning, degree counting,
    iterative CC, and deterministic label assignment end-to-end against a
    relational recomputation."""
    from truthound_spark.pipeline.clustering import dbscan

    c = t(spark, sf_dir, "customer")
    feats = c.select(
        F.col("c_custkey").alias("cid"),
        (F.col("c_acctbal") / 1000).alias("x0"),
        F.col("c_nationkey").cast("double").alias("x1"),
    )
    return dbscan(feats, ["x0", "x1"], eps=0.25, min_pts=4, id_col="cid").orderBy(
        "id"
    )


@register(
    "classifier_scores_documents",
    # fastText-style hashed linear scorer replicated relationally: same
    # md5-bucket hash, same stand-in weight function, same fold order
    # (unigrams then bigrams, document order)
    f"""
    WITH w AS (
      SELECT doc_id, {_WORDS_SQL.format(t='text')} AS ws FROM documents
    ),
    f AS (
      SELECT doc_id,
             ws || list_transform(range(1, len(ws)), i -> ws[i] || '_' || ws[i+1]) AS feats
      FROM w
    ),
    b AS (
      SELECT doc_id,
             list_transform(feats,
               t -> CAST(('0x' || substr(md5(t), 1, 6)) AS BIGINT) % 4096) AS bk
      FROM f
    )
    SELECT doc_id,
           ROUND(1.0 / (1.0 + EXP(-(CASE WHEN len(bk) > 0 THEN
             list_sum(list_transform(bk, x -> ((x % 2001) - 1000) / 1000.0)) / len(bk)
             ELSE 0.0 END))), 6) AS classifier_score
    FROM b ORDER BY doc_id
    """,
)
def q_classifier_scores_documents(spark, sf_dir):
    """Hashed-feature quality classifier (pipeline/text.py
    classifier_quality_score): word unigram+bigram features hash into 4096
    md5 buckets, document score = sigmoid(mean bucket weight) — the
    fastText quality-filter shape as ONE codegen'd projection (hashing
    trick + F.aggregate fold, zero UDFs). The deterministic stand-in
    weight function stands where trained weights plug in; the oracle
    replays the identical hash/weight/fold pipeline in SQL."""
    from truthound_spark.pipeline.text import classifier_quality_score

    df = t(spark, sf_dir, "documents")
    return classifier_quality_score(df).select("doc_id", "classifier_score").orderBy(
        "doc_id"
    )


@register(
    "paragraph_dedup_documents",
    # documents are single-line word streams; a deterministic break
    # (replace ' table ' -> blank line, same left-to-right non-overlapping
    # semantics in both engines) yields paragraphs that REPEAT across the
    # corpus' seeded near-duplicates, so the dedup is exercised for real
    """
    WITH src AS (
      SELECT doc_id, replace(text, ' table ', chr(10) || chr(10)) AS text
      FROM documents
    ),
    paras AS (
      SELECT doc_id, u.pos, u.para FROM (
        SELECT doc_id, regexp_split_to_array(text, '\\n{2,}') AS arr FROM src
      ), UNNEST(list_transform(range(1, len(arr)+1),
                i -> {'pos': i, 'para': arr[i]})) AS t(u)
      WHERE trim(u.para) <> ''
    ),
    ranked AS (
      SELECT doc_id, pos, para,
             ROW_NUMBER() OVER (PARTITION BY md5(para) ORDER BY doc_id, pos) AS rk
      FROM paras
    ),
    reb AS (
      SELECT doc_id,
             COALESCE(string_agg(para, chr(10) || chr(10) ORDER BY pos)
                      FILTER (rk = 1), '') AS text,
             COUNT(*) FILTER (rk = 1) AS paragraphs_kept,
             COUNT(*) FILTER (rk > 1) AS paragraphs_removed
      FROM ranked GROUP BY doc_id
    )
    SELECT s.doc_id, COALESCE(r.text, '') AS text,
           CAST(COALESCE(r.paragraphs_kept, 0) AS BIGINT) AS paragraphs_kept,
           CAST(COALESCE(r.paragraphs_removed, 0) AS BIGINT) AS paragraphs_removed
    FROM src s LEFT JOIN reb r ON s.doc_id = r.doc_id
    ORDER BY s.doc_id
    """,
)
def q_paragraph_dedup_documents(spark, sf_dir):
    """Corpus-wide paragraph-level exact dedup (pipeline/text.py
    paragraph_dedup — the C4/RefinedWeb paragraph-hash pass): every
    paragraph survives only at its first (doc_id, position) occurrence;
    documents are reassembled in original order with kept/removed counts.
    The shuffle key is the paragraph's md5, so the window moves 32-char
    hashes plus each paragraph exactly once."""
    from truthound_spark.pipeline.text import paragraph_dedup

    df = t(spark, sf_dir, "documents").withColumn(
        "text", F.expr("replace(text, ' table ', '\\n\\n')")
    )
    return (
        paragraph_dedup(df)
        .select("doc_id", "text", "paragraphs_kept", "paragraphs_removed")
        .orderBy("doc_id")
    )


@register(
    "chunk_documents_documents",
    """
    WITH d AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
      FROM documents WHERE length(trim(text)) > 0
    ),
    s AS (
      SELECT doc_id, toks,
             range(1, greatest(len(toks) - 16, 1) + 1, 48) AS starts
      FROM d
    )
    SELECT doc_id, u.pos - 1 AS chunk_index,
           array_to_string(toks[u.s:u.s+63], ' ') AS chunk_text,
           CAST(len(toks[u.s:u.s+63]) AS INT) AS chunk_tokens
    FROM s, UNNEST(list_transform(range(1, len(starts)+1),
              i -> {'pos': i, 's': starts[i]})) AS t(u)
    ORDER BY doc_id, chunk_index
    """,
)
def q_chunk_documents_documents(spark, sf_dir):
    """Token-bounded chunking (pipeline/text.py chunk_documents — the RAG
    / context-window primitive): 64-token windows with 16-token overlap,
    every boundary computed in one sequence+slice projection (no UDF, no
    shuffle), posexplode to (doc_id, chunk_index, chunk_text,
    chunk_tokens). Tail chunks are never fully contained in their
    predecessor."""
    from truthound_spark.pipeline.text import chunk_documents

    df = t(spark, sf_dir, "documents")
    return chunk_documents(df, max_tokens=64, overlap=16).orderBy(
        "doc_id", "chunk_index"
    )


@register("kmeans_clusters_customer", _kmeans_oracle_sql(k=8, iters=3))
def q_kmeans_clusters_customer(spark, sf_dir):
    """Distributed Lloyd's k-means, hash-certified END-TO-END THROUGH THE
    ITERATIONS (pipeline/clustering.py kmeans): customers at
    (acctbal/1000, nationkey), k=8, 3 full Lloyd rounds. Quantized-long
    centroid sums make every iteration's float state bit-identical across
    engines — this upgrades an iterative ML algorithm from the usual
    rows-only check to a value-hash match. Per iteration the plan is one
    cached narrow scan + literal-math argmin projection + k-row shuffle.
    Reference surface: anomaly/ml_based.py KMeans anomaly fits sklearn on
    a driver sample; here every row participates in every round."""
    from truthound_spark.pipeline.clustering import kmeans

    c = t(spark, sf_dir, "customer")
    feats = c.select(
        F.col("c_custkey").alias("cid"),
        (F.col("c_acctbal") / 1000).alias("x0"),
        F.col("c_nationkey").cast("double").alias("x1"),
    )
    assigned, _cents = kmeans(feats, ["x0", "x1"], k=8, iters=3, id_col="cid")
    return assigned.orderBy("id")


@register(
    "semantic_dedup_embeddings",
    f"""
    WITH ed AS (
      SELECT CAST(vec_id AS BIGINT) AS id, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings
    ),
    c AS (SELECT id AS cell, v AS cv FROM ed ORDER BY id LIMIT 16),
    a AS (
      SELECT id, v, cell FROM (
        SELECT e.id, e.v, c.cell,
               ROW_NUMBER() OVER (
                 PARTITION BY e.id
                 ORDER BY {_IVF_D2.format(a='e.v', b='c.cv')}, c.cell
               ) AS rn
        FROM ed e, c
      ) WHERE rn = 1
    ),
    drops AS (
      SELECT DISTINCT y.id
      FROM a x JOIN a y ON x.cell = y.cell AND x.id < y.id
      WHERE list_dot_product(x.v, y.v)
              / (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v)))
            >= 0.4
    )
    SELECT a.id, a.cell, d.id IS NULL AS keep
    FROM a LEFT JOIN drops d ON a.id = d.id
    ORDER BY a.id
    """,
)
def q_semantic_dedup_embeddings(spark, sf_dir):
    """SemDeDup semantic deduplication (pipeline/dedup.py semantic_dedup,
    Abbas et al. 2023): coarse-cluster the embedding space (closed-form
    seeded centroids here; kmeans cells in production), drop any document
    whose cell contains a lower-id document with cosine >= threshold.
    Threshold 0.4 because the synthetic corpus holds no true semantic
    duplicates (max in-cell cosine ~=0.49) — the production default 0.95
    exercises the identical plan. The O(n^2) pairing never materializes:
    only in-cell pairs are scored, partitioned by cell."""
    from truthound_spark.pipeline.dedup import semantic_dedup

    df = t(spark, sf_dir, "embeddings")
    return semantic_dedup(df, num_cells=16, threshold=0.4).orderBy("id")


@register(
    "global_shuffle_documents",
    """
    WITH k AS (
      SELECT doc_id, md5('7:' || CAST(doc_id AS VARCHAR)) AS okey FROM documents
    )
    SELECT doc_id,
           CAST(CAST(('0x' || substr(okey, 1, 6)) AS BIGINT) % 8 AS INT) AS shard,
           ROW_NUMBER() OVER (
             PARTITION BY CAST(('0x' || substr(okey, 1, 6)) AS BIGINT) % 8
             ORDER BY okey, doc_id
           ) AS position
    FROM k ORDER BY doc_id
    """,
)
def q_global_shuffle_documents(spark, sf_dir):
    """Deterministic global training-order shuffle (pipeline/export.py
    global_shuffle): order key = md5(seed:doc_id), shard = 6-hex-digit
    prefix mod n_shards, position = in-shard rank. The permutation is
    reproducible across engines, reruns, and partitionings — the property
    a training-data export needs for resumability and audit. The window
    ranks PER SHARD (one shuffle, bounded per-task sort); a global
    row_number would serialize at scale."""
    from truthound_spark.pipeline.export import global_shuffle

    df = t(spark, sf_dir, "documents")
    return (
        global_shuffle(df, n_shards=8, seed=7)
        .select("doc_id", "shard", "position")
        .orderBy("doc_id")
    )


@register(
    "embedding_stats_embeddings",
    """
    WITH ed AS (
      SELECT CAST(vec_id AS BIGINT) AS id, CAST(embedding AS DOUBLE[]) AS v0
      FROM embeddings
    ),
    mut AS (
      SELECT id,
             CASE
               WHEN id % 53 = 0 THEN NULL
               WHEN id % 71 = 0 THEN list_transform(v0, x -> 0.0)
               WHEN id % 89 = 0 THEN list_append(v0[2:], CAST('nan' AS DOUBLE))
               WHEN id % 61 = 0 THEN v0[1:len(v0) - 1]
               ELSE v0
             END AS v
      FROM ed
    ),
    dref AS (
      SELECT dim AS dim_ref FROM (
        SELECT len(v) AS dim, COUNT(*) AS c FROM mut WHERE v IS NOT NULL
        GROUP BY 1 ORDER BY c DESC, dim LIMIT 1
      )
    ),
    b AS (
      SELECT v,
             len(v) AS dim,
             len(list_filter(v, x -> isnan(x))) > 0 AS has_nan,
             len(v) > 0 AND len(list_filter(v, x -> x <> 0.0)) = 0 AS is_zero,
             sqrt(list_dot_product(v, v)) AS norm
      FROM mut
    ),
    g AS (
      SELECT v, dim, has_nan, is_zero,
             CASE WHEN v IS NOT NULL AND NOT has_nan
                  THEN CAST(round(norm * 1000000.0) AS BIGINT) END AS qnorm,
             CASE WHEN v IS NOT NULL AND NOT has_nan THEN norm END AS norm_ok
      FROM b
    )
    SELECT COUNT(*) AS n_vectors,
           SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS n_null,
           SUM(CASE WHEN v IS NOT NULL AND dim <> (SELECT dim_ref FROM dref)
                    THEN 1 ELSE 0 END) AS n_dim_mismatch,
           SUM(CASE WHEN COALESCE(has_nan, FALSE) THEN 1 ELSE 0 END) AS n_nan,
           SUM(CASE WHEN COALESCE(is_zero, FALSE) THEN 1 ELSE 0 END) AS n_zero,
           ROUND(SUM(qnorm) / COUNT(qnorm) / 1000000.0, 6) AS avg_norm,
           ROUND(MIN(norm_ok), 6) AS min_norm,
           ROUND(MAX(norm_ok), 6) AS max_norm
    FROM g
    """,
)
def q_embedding_stats_embeddings(spark, sf_dir):
    """Embedding-column health report (pipeline/similarity.py
    embedding_stats): nulls, dimension drift, NaN components, zero
    vectors, norm stats — ONE fused aggregate, the engine's standard
    validation plan shape applied to array<float>. The entry INJECTS each
    failure mode deterministically (null @ id%53, zero vector @ id%71,
    NaN @ id%89, truncated dim @ id%61 — same CASE chain in the oracle)
    so every counter is exercised nonzero. avg_norm sums quantized longs
    (exact, order-independent) — the determinism trick that lets a float
    mean hash-match across engines."""
    from truthound_spark.pipeline.similarity import embedding_stats

    df = t(spark, sf_dir, "embeddings")
    idc = F.col("vec_id").cast("long")
    v = F.col("embedding").cast("array<double>")
    mut = df.select(
        F.when(idc % 53 == 0, F.lit(None).cast("array<double>"))
        .when(idc % 71 == 0, F.transform(v, lambda x: F.lit(0.0)))
        .when(
            idc % 89 == 0,
            F.concat(
                F.slice(v, 2, F.size(v)), F.array(F.lit(float("nan")))
            ),
        )
        .when(idc % 61 == 0, F.slice(v, 1, F.size(v) - 1))
        .otherwise(v)
        .alias("embedding")
    )
    return embedding_stats(mut, "embedding")


@register(
    "incremental_dedup_documents",
    f"""
    WITH nfp AS (
      SELECT doc_id AS id, md5({_NORM_SQL.format(c='text')}) AS fp
      FROM documents WHERE doc_id % 2 = 1
    ),
    bfp AS (
      SELECT doc_id AS id, md5({_NORM_SQL.format(c='text')}) AS fp
      FROM documents WHERE doc_id % 2 = 0
    ),
    ex AS (
      SELECT n.id, MIN(b.id) AS exact_of
      FROM nfp n JOIN bfp b ON n.fp = b.fp GROUP BY n.id
    ),
    sh AS ({_SHINGLES_SQL}),
    inv AS (SELECT id, unnest(sh) AS g FROM sh),
    pairs AS (
      SELECT a.id AS id, b.id AS base_id, COUNT(*) AS inter
      FROM inv a JOIN inv b ON a.g = b.g AND a.id % 2 = 1 AND b.id % 2 = 0
      GROUP BY 1, 2
    ),
    sz AS (SELECT id, len(sh) AS sz FROM sh),
    near AS (
      SELECT p.id, MIN(p.base_id) AS near_of
      FROM pairs p JOIN sz sa ON p.id = sa.id JOIN sz sb ON p.base_id = sb.id
      WHERE inter / CAST(sa.sz + sb.sz - inter AS DOUBLE) >= 0.7
      GROUP BY p.id
    )
    SELECT n.id, COALESCE(ex.exact_of, near.near_of) AS dup_of,
           CASE WHEN ex.exact_of IS NOT NULL THEN 'exact'
                WHEN near.near_of IS NOT NULL THEN 'near' END AS match_kind
    FROM nfp n
    LEFT JOIN ex ON n.id = ex.id
    LEFT JOIN near ON n.id = near.id
    ORDER BY n.id
    """,
)
def q_incremental_dedup_documents(spark, sf_dir):
    """Cross-snapshot incremental dedup (pipeline/dedup.py
    incremental_dedup — the daily-crawl-delta primitive): odd doc_ids play
    the new batch, even ids the historical base. Exact matches via
    fingerprint equi-join; near matches via ONE side-tagged banded-LSH
    pass kept only for cross-side pairs and verified with exact Jaccard
    >= 0.7 (32x2 banding => per-pair miss < 4e-10, so the verified output
    equals the oracle's exhaustive cross-side pair set)."""
    from truthound_spark.pipeline.dedup import incremental_dedup

    docs = t(spark, sf_dir, "documents")
    new = docs.filter(F.col("doc_id") % 2 == 1)
    base = docs.filter(F.col("doc_id") % 2 == 0)
    return incremental_dedup(
        new, base, threshold=0.7, max_bucket_size=None
    ).orderBy("id")  # exact mode for the oracle


@register("kmeans_vec_embeddings", _kmeans_vec_oracle_sql(k=4, iters=2, dim=4))
def q_kmeans_vec_embeddings(spark, sf_dir):
    """kmeans over an embedding array column (pipeline/clustering.py
    kmeans_vec — the production SemDeDup/IVF clustering step): embeddings
    sliced to 4 dims (keeps the generated oracle readable; the operator
    itself is dimension-generic and pytest covers 64-dim vs numpy), k=4,
    two full Lloyd rounds, distances in the l2 dot-product fold form.
    Hash-certified THROUGH the iterations like kmeans_clusters_customer."""
    from truthound_spark.pipeline.clustering import kmeans_vec

    emb = t(spark, sf_dir, "embeddings")
    sliced = emb.select(
        "vec_id", F.slice(F.col("embedding").cast("array<double>"), 1, 4).alias("embedding")
    )
    assigned, _cents = kmeans_vec(sliced, "embedding", k=4, iters=2)
    return assigned.orderBy("id")

@register(
    "dedup_keep_best_documents",
    f"""
    WITH RECURSIVE reach(node, root) AS (
      SELECT CAST(doc_id AS BIGINT), CAST(doc_id AS BIGINT) FROM documents
      UNION
      SELECT e.v, r.root FROM reach r JOIN (
        WITH shf AS (
          SELECT id, list_filter(sh, x -> x <> '') AS sh FROM ({_SHINGLES_SQL})
        ),
        p AS (
          SELECT a.id AS id_a, b.id AS id_b
          FROM shf a JOIN shf b ON a.id < b.id
          WHERE len(list_intersect(a.sh, b.sh))
                / CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS DOUBLE) >= 0.7
        )
        SELECT id_a AS u, id_b AS v FROM p
        UNION SELECT id_b, id_a FROM p
      ) e ON e.u = r.node
    )
    SELECT id, cluster_id, score, (rn = 1) AS keep FROM (
      SELECT cl.id, cl.cluster_id, q.score,
             ROW_NUMBER() OVER (PARTITION BY cl.cluster_id ORDER BY q.score DESC, cl.id) AS rn
      FROM (SELECT node AS id, MIN(root) AS cluster_id FROM reach GROUP BY node) cl
      JOIN (SELECT doc_id AS id, ROUND(score, 6) AS score FROM ({_QSCORE_SQL})) q
      USING (id)
    ) ORDER BY id
    """,
)
def q_dedup_keep_best_documents(spark, sf_dir):
    """Quality-aware canonical selection (pipeline/dedup.py
    dedup_keep_best): the certified cluster resolution unchanged, then
    each cluster keeps its highest-quality member ((6-dp score desc, id)
    rank — deterministic). Oracle = the recursive-CTE transitive closure
    joined with the relational quality score and the identical window
    rank."""
    from truthound_spark.pipeline.dedup import dedup_keep_best

    df = t(spark, sf_dir, "documents")
    return dedup_keep_best(
        df, threshold=0.7, num_hashes=64, bands=32, max_bucket_size=None
    ).orderBy("id")  # exact mode for the oracle


@register(
    "corpus_validators_documents",
    f"""
    WITH q AS ({_QSCORE_SQL}),
    lang AS ({_LANG_PRED_SQL}),
    fp AS (SELECT md5({_NORM_SQL.format(c='text')}) AS fp FROM documents),
    tok AS (SELECT len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS nt FROM documents)
    SELECT
      (SELECT CAST(COUNT(fp) - COUNT(DISTINCT fp) AS BIGINT) FROM fp) AS dup_excess,
      (SELECT CAST(SUM(CASE WHEN score < 0.3 THEN 1 ELSE 0 END) AS BIGINT) FROM q) AS low_quality,
      (SELECT CAST(SUM(CASE WHEN nt < 10 OR nt > 1000 THEN 1 ELSE 0 END) AS BIGINT) FROM tok) AS token_violations,
      (SELECT CAST(SUM(nt) AS BIGINT) FROM tok) AS total_tokens,
      (SELECT CAST(SUM(CASE WHEN COALESCE({_NORM_SQL.format(c='text')}, '') = '' THEN 1 ELSE 0 END) AS BIGINT)
       FROM documents) AS empty_docs,
      (SELECT CAST(SUM(CASE WHEN predicted_lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) FROM lang) AS n_en,
      (SELECT CAST(SUM(CASE WHEN predicted_lang = 'de' THEN 1 ELSE 0 END) AS BIGINT) FROM lang) AS n_de,
      (SELECT CAST(SUM(CASE WHEN predicted_lang = 'fr' THEN 1 ELSE 0 END) AS BIGINT) FROM lang) AS n_fr,
      (SELECT CAST(SUM(CASE WHEN predicted_lang = 'es' THEN 1 ELSE 0 END) AS BIGINT) FROM lang) AS n_es,
      (SELECT CAST(SUM(CASE WHEN predicted_lang = 'unknown' THEN 1 ELSE 0 END) AS BIGINT) FROM lang) AS n_unknown,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_docs
    """,
)
def q_corpus_validators_documents(spark, sf_dir):
    """Corpus validators (validators/corpus.py) as ONE fused aggregate —
    the engine's single-scan suite plan applied to LLM-corpus gating:
    exact-dup excess, low-quality share, token-budget violations + total
    token inventory, empty docs, and per-language counts, all compiled
    from the REAL validator specs() layer. The avg-score observation
    stays in the validator but out of this compare (a cross-engine float
    mean; counts are the contract)."""
    from truthound_spark.validators.corpus import (
        CorpusDuplicateRatioValidator,
        CorpusQualityValidator,
        CorpusTokenCountValidator,
        EmptyDocumentValidator,
        LanguageBalanceValidator,
    )

    df = t(spark, sf_dir, "documents")
    dup = CorpusDuplicateRatioValidator().specs(df)[0]
    qual = CorpusQualityValidator(min_score=0.3).specs(df)[0]
    tokc = CorpusTokenCountValidator(min_tokens=10, max_tokens=1000).specs(df)[0]
    empty = EmptyDocumentValidator().specs(df)[0]
    lang = LanguageBalanceValidator().specs(df)[0]
    return df.agg(
        dup.count_expr.cast("long").alias("dup_excess"),
        qual.count_expr.cast("long").alias("low_quality"),
        tokc.count_expr.cast("long").alias("token_violations"),
        tokc.extra_exprs["total_tokens"].alias("total_tokens"),
        empty.count_expr.cast("long").alias("empty_docs"),
        lang.extra_exprs["n_en"].alias("n_en"),
        lang.extra_exprs["n_de"].alias("n_de"),
        lang.extra_exprs["n_fr"].alias("n_fr"),
        lang.extra_exprs["n_es"].alias("n_es"),
        lang.extra_exprs["n_unknown"].alias("n_unknown"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
    )


@register(
    "lof_native_customer",
    """
    WITH p AS (
      SELECT CAST(c_custkey AS BIGINT) AS id, c_acctbal / 1000.0 AS x,
             CAST(c_nationkey AS DOUBLE) AS y
      FROM customer
    ),
    d AS (
      SELECT a.id AS id, b.id AS nbr,
             sqrt((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)) AS d
      FROM p a JOIN p b ON a.id <> b.id
    ),
    kd AS (
      SELECT id, d AS k_dist FROM (
        SELECT id, d, ROW_NUMBER() OVER (PARTITION BY id ORDER BY d, nbr) AS rn
        FROM d
      ) WHERE rn = 5
    ),
    e AS (
      SELECT d.id, d.nbr, d.d FROM d JOIN kd ON d.id = kd.id
      WHERE d.d <= kd.k_dist
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
    SELECT q.id, ROUND(m.mean_lrd_o / q.lrd, 6) AS lof
    FROM q LEFT JOIN m ON q.id = m.id ORDER BY q.id
    """,
)
def q_lof_native_customer(spark, sf_dir):
    """EXACT distributed Local Outlier Factor (pipeline/neighbors.py lof;
    reference anomaly/ml_based.py:445 fits sklearn LOF on a driver
    sample). kNN comes from the grid + radius-doubling rounds (frontier
    shrinks each round; candidate pairs only inside 3^d cell
    neighborhoods), LOF from the relational reach/lrd chain whose means
    sum quantized longs — which is why the distributed result value-hash
    matches this exhaustive O(n^2) recomputation. k=5 on customer
    (acctbal/1000, nationkey)."""
    from truthound_spark.pipeline.neighbors import lof

    c = t(spark, sf_dir, "customer")
    feats = c.select(
        F.col("c_custkey").alias("cid"),
        (F.col("c_acctbal") / 1000).alias("x"),
        F.col("c_nationkey").cast("double").alias("y"),
    )
    out = lof(feats, ["x", "y"], k=5, id_col="cid")
    return out.select("id", F.round("lof", 6).alias("lof")).orderBy("id")


@register(
    "ivf_index_search_embeddings",
    # identical semantics (and oracle) to ivf_seeded_topk_embeddings:
    # the index just persists the same seeded assignment partitioned by
    # cell, so search-over-index returns the same rows
    f"""
    WITH ed AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding FROM embeddings
    ),
    c AS (
      SELECT CAST(vec_id AS BIGINT) AS cell, embedding AS cv
      FROM ed ORDER BY vec_id LIMIT 16
    ),
    a AS (
      SELECT id, v, cell FROM (
        SELECT CAST(e.vec_id AS BIGINT) AS id, e.embedding AS v, c.cell,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {_IVF_D2.format(a='e.embedding', b='c.cv')}, c.cell
               ) AS rn
        FROM ed e, c
      ) WHERE rn = 1
    ),
    probe AS (
      SELECT query_id, qv, cell FROM (
        SELECT CAST(q.vec_id AS BIGINT) AS query_id, q.embedding AS qv, c.cell,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY {_IVF_D2.format(a='q.embedding', b='c.cv')}, c.cell
               ) AS rn
        FROM ed q, c WHERE q.vec_id < 8
      ) WHERE rn <= 2
    ),
    s AS (
      SELECT p.query_id, a.id,
             list_dot_product(a.v, p.qv)
               / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(p.qv, p.qv)))
             AS cosine
      FROM probe p JOIN a ON a.cell = p.cell
      WHERE a.id <> p.query_id
    )
    SELECT query_id, id, ROUND(cosine, 6) AS cosine, CAST(rank AS BIGINT) AS rank
    FROM (
      SELECT query_id, id, cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, id) AS rank
      FROM s
    ) WHERE rank <= 5
    ORDER BY query_id, rank
    """,
)
def q_ivf_index_search_embeddings(spark, sf_dir):
    """PERSISTED IVF index round-trip (pipeline/similarity.py
    ivf_build_index + ivf_search_index): vectors written partitioned by
    cell, then searched — the probed-cell isin filter prunes the scan to
    the probed partitions (plan-tested), which is what makes ANN search
    I/O independent of corpus size at 100 TB. Same seeded centroids as
    ivf_seeded_topk, so the same oracle certifies the whole
    build→persist→search cycle."""
    import tempfile

    from truthound_spark.pipeline.similarity import (
        ivf_build_index,
        ivf_search_index,
    )

    df = t(spark, sf_dir, "embeddings")
    path = tempfile.mkdtemp(prefix="ivf_index_")
    ivf_build_index(df, path, num_cells=16)
    q = df.filter(F.col("vec_id") < 8)
    out = ivf_search_index(spark, path, q, k=5, nprobe=2)
    return out.select(
        "query_id", "id", F.round("cosine", 6).alias("cosine"),
        F.col("rank").cast("long").alias("rank"),
    ).orderBy("query_id", "rank")


@register(
    "quantize_embeddings_int8",
    """
    WITH ed AS (
      SELECT CAST(vec_id AS BIGINT) AS id, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings
    ),
    s AS (
      SELECT id, v, list_max(list_transform(v, x -> abs(x))) AS amax FROM ed
    )
    SELECT id, ROUND(amax / 127.0, 9) AS scale,
           CASE WHEN amax / 127.0 > 0
                THEN list_transform(v, x -> CAST(round(x / (amax / 127.0)) AS TINYINT))
                ELSE list_transform(v, x -> CAST(0 AS TINYINT)) END AS q
    FROM s ORDER BY id
    """,
)
def q_quantize_embeddings_int8(spark, sf_dir):
    """Symmetric int8 embedding quantization (pipeline/similarity.py
    quantize_embeddings): per-vector scale = max|x|/127, codes as
    array<tinyint> — the 4x embedding-storage compression, certified
    value-exact (same division + half-away rounding in both engines)."""
    from truthound_spark.pipeline.similarity import quantize_embeddings

    df = t(spark, sf_dir, "embeddings")
    out = quantize_embeddings(df)
    return out.select("id", F.round("scale", 9).alias("scale"), "q").orderBy("id")


@register(
    "corpus_drift_documents",
    "WITH "
    + _CORPUS_SIG_SQL
    + _corpus_psi_block("char_length")
    + " UNION ALL "
    + _corpus_psi_block("quality_score")
    + " UNION ALL "
    + _corpus_psi_block("token_count")
    + " ORDER BY signal",
)
def q_corpus_drift_documents(spark, sf_dir):
    """Corpus-version drift (pipeline/text.py corpus_drift): PSI between
    the even-id and odd-id halves of the documents table over quality
    score, token count, and char length — the snapshot-refresh gate a
    training pipeline runs on every crawl update. Each signal reduces
    both sides to 10-bin histogram aggregates; the oracle replays the
    identical baseline-range clamp + eps-smoothed sum per signal."""
    from truthound_spark.pipeline.text import corpus_drift

    docs = t(spark, sf_dir, "documents")
    out = corpus_drift(
        docs.filter(F.col("doc_id") % 2 == 0),
        docs.filter(F.col("doc_id") % 2 == 1),
    )
    return out.select("signal", "psi").orderBy("signal")


@register(
    "repetition_plan_documents",
    """
    WITH tok AS (
      SELECT doc_id,
             COALESCE(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')), 0) AS nt
      FROM documents
    ),
    avail AS (
      SELECT CAST(SUM(nt) AS BIGINT) AS a,
             -- target replicates the entry's int(available * 2.5)
             -- truncation, then frac = (target - 2a)/a as double math
             CAST(FLOOR(CAST(SUM(nt) AS BIGINT) * 2.5) AS BIGINT) AS tgt
      FROM tok
    )
    SELECT t.doc_id,
           CAST(2 + CASE WHEN CAST(('0x' || substr(md5('rep:' || CAST(t.doc_id AS VARCHAR)), 1, 6)) AS BIGINT) % 1000000
                         < CAST(FLOOR(CAST(tgt - 2 * a AS DOUBLE) / a * 1000000) AS BIGINT)
                    THEN 1 ELSE 0 END AS INT) AS repeats
    FROM tok t, avail
    ORDER BY t.doc_id
    """,
)
def q_repetition_plan_documents(spark, sf_dir):
    """Data-constrained epoch planning (pipeline/export.py
    repetition_plan): a 2.5x-corpus token budget plans 2 full epochs plus
    a deterministic md5-keyed half-corpus extra pass — map-side column
    math, no global sort. The oracle replays the identical base/remainder
    arithmetic and hash-rate subset."""
    from truthound_spark.pipeline.export import repetition_plan

    docs = t(spark, sf_dir, "documents")
    from truthound_spark.pipeline.text import bpe_ish_token_count

    available = docs.agg(
        F.sum(F.coalesce(bpe_ish_token_count(F.col("text")), F.lit(0))).cast("long")
    ).collect()[0][0]
    target = int(available * 2.5)
    out = repetition_plan(docs, target_tokens=target, max_epochs=4)
    return out.select("doc_id", "repeats").orderBy("doc_id")


@register(
    "media_exact_dedup",
    # corpus = documents' bytes + a re-fetched copy of the doc_id%3==0
    # third under new asset ids -> guaranteed dup groups to verify
    """
    WITH m AS (
      SELECT doc_id AS asset_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 3 = 0
    )
    SELECT payload_md5, dup_count, asset_ids FROM (
      SELECT md5(text) AS payload_md5,
             CAST(COUNT(*) AS BIGINT) AS dup_count,
             array_agg(asset_id ORDER BY asset_id) AS asset_ids
      FROM m GROUP BY 1
    ) WHERE dup_count > 1 ORDER BY payload_md5
    """,
)
def q_media_exact_dedup(spark, sf_dir):
    """Byte-identical media dedup (pipeline/multimodal.py
    media_exact_duplicates): md5 over the BINARY payload, bounded dup
    groups — the crawl-refetch pass every image/audio pipeline runs
    first. Payloads here are the documents' UTF-8 bytes (same stand-in
    as the other media entries), so DuckDB's md5(text) replays the hash
    over identical bytes."""
    from truthound_spark.pipeline.multimodal import media_exact_duplicates

    media = _media_df(spark, sf_dir)
    refetched = media.filter(F.col("asset_id") % 3 == 0).withColumn(
        "asset_id", F.col("asset_id") + 1_000_000
    )
    return media_exact_duplicates(media.unionByName(refetched)).orderBy("payload_md5")


@register(
    "media_phash_near_dup",
    """
    WITH m AS (
      SELECT doc_id AS id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 3 = 0
    ),
    p AS (
      SELECT id,
             CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 2147483648 * 4294967296
               + CAST(('0x' || substr(md5(text), 9, 8)) AS BIGINT) AS sig
      FROM m
    )
    SELECT a.id AS id_a, b.id AS id_b,
           CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
    FROM p a JOIN p b ON a.id < b.id
    WHERE bit_count(xor(a.sig, b.sig)) <= 3
    ORDER BY 1, 2
    """,
)
def q_media_phash_near_dup(spark, sf_dir):
    """Perceptual-hash media near-dup (pipeline/multimodal.py
    media_near_duplicates): 64-bit signatures blocked with the SAME
    4-segment pigeonhole join as SimHash (dedup.hamming_blocked_pairs),
    verified by bit_count(xor). The deterministic fake pHash stands where
    a real decoder-backed pHash drops in; the oracle is the EXHAUSTIVE
    pairwise Hamming scan, which the pigeonhole guarantee says the
    blocked plan must reproduce exactly at distance <= 3."""
    from truthound_spark.pipeline.multimodal import media_near_duplicates

    media = _media_df(spark, sf_dir)
    refetched = media.filter(F.col("asset_id") % 3 == 0).withColumn(
        "asset_id", F.col("asset_id") + 1_000_000
    )
    return media_near_duplicates(media.unionByName(refetched)).orderBy("id_a", "id_b")


@register(
    "lof_embeddings_lsh",
    _lof_embeddings_oracle(k=5, num_planes=8, num_bands=4, seed=42),
)
def q_lof_embeddings_lsh(spark, sf_dir):
    """Approximate LOF over embeddings (pipeline/neighbors.py
    lof_embeddings): banded sign-LSH candidates stand in for exact kNN
    (the standard scalable form in embedding space — exact kNN is itself
    approximated in practice), then the SAME quantized density chain as
    the grid-exact lof_native. Approximation lives ONLY in neighbor
    selection and is fully deterministic (seeded planes), so the oracle
    hash-certifies the whole thing; isolated-by-LSH points come back
    NULL."""
    from truthound_spark.pipeline.neighbors import lof_embeddings

    emb = t(spark, sf_dir, "embeddings")
    out = lof_embeddings(emb, k=5, num_planes=8, num_bands=4, seed=42)
    return out.select("id", F.round("lof", 6).alias("lof")).orderBy("id")


@register(
    "bm25_topk_documents",
    f"""
    WITH toks AS (
      SELECT doc_id AS id, t.term FROM (
        SELECT doc_id,
               list_filter(string_split({_NORM_SQL.format(c='text')}, ' '), x -> x <> '') AS ws
        FROM documents
      ), UNNEST(ws) AS t(term)
    ),
    tf AS (SELECT id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
    dl AS (SELECT id, COUNT(*) AS dl FROM toks GROUP BY 1),
    tfl AS (SELECT tf.id, tf.term, tf.tf, dl.dl FROM tf JOIN dl ON tf.id = dl.id),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tfl GROUP BY 1),
    stats AS (
      SELECT (SELECT CAST(COUNT(*) AS DOUBLE) FROM documents) AS n,
             CAST((SELECT SUM(dl) FROM dl) AS DOUBLE)
               / (SELECT COUNT(*) FROM documents) AS avgdl
    ),
    qt AS (
      SELECT DISTINCT doc_id AS query_id, t.term FROM (
        SELECT doc_id,
               list_filter(string_split({_NORM_SQL.format(c='text')}, ' '), x -> x <> '') AS ws
        FROM documents WHERE doc_id < 3
      ), UNNEST(ws) AS t(term)
    ),
    contrib AS (
      SELECT qt.query_id, tfl.id AS doc_id,
             CAST(round(
               LN((stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
               * (tfl.tf * 2.2)
               / (tfl.tf + 1.2 * (1.0 - 0.75 + 0.75 * tfl.dl / stats.avgdl))
               * 1000000000.0
             ) AS BIGINT) AS qc
      FROM qt JOIN tfl ON qt.term = tfl.term, stats, dfreq
      WHERE dfreq.term = qt.term
    ),
    scored AS (
      SELECT query_id, doc_id, CAST(SUM(qc) AS DOUBLE) / 1000000000.0 AS score
      FROM contrib GROUP BY 1, 2
    )
    SELECT query_id, doc_id, ROUND(score, 6) AS score, CAST(rank AS BIGINT) AS rank
    FROM (
      SELECT query_id, doc_id, score,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank
      FROM scored
    ) WHERE rank <= 5
    ORDER BY query_id, rank
    """,
)
def q_bm25_topk_documents(spark, sf_dir):
    """Distributed BM25 retrieval (pipeline/retrieval.py bm25_search):
    inverted-index tf/df aggregates, broadcast query terms joined on term
    (only query-term postings are touched), per-(query, doc) scores as
    quantized-long sums — which is why ranks AND scores hash-match the
    relational oracle. Queries = documents 0-2 searching the corpus
    (self-retrieval: each query's own doc ranks at or near the top).
    k1=1.2, b=0.75."""
    from truthound_spark.pipeline.retrieval import bm25_search

    docs = t(spark, sf_dir, "documents")
    qs = docs.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"), "text"
    )
    out = bm25_search(docs, qs, k=5, query_id_col="query_id")
    return out.select(
        "query_id", "doc_id", F.round("score", 6).alias("score"),
        F.col("rank").cast("long").alias("rank"),
    ).orderBy("query_id", "rank")


@register(
    "decontaminate_spans_documents",
    """
    WITH src AS (
      SELECT doc_id AS id, text,
             CASE WHEN length(trim(text)) > 0
                  THEN string_split_regex(trim(text), '\\s+')
                  ELSE [] END AS raw
      FROM documents
    ),
    nrm AS (
      SELECT id, raw,
             list_transform(raw, t -> regexp_replace(lower(t), '[^a-z0-9]', '', 'g')) AS nt
      FROM src
    ),
    grams AS (
      SELECT id, u.s AS start, array_to_string(nt[u.s:u.s + 7], ' ') AS gram
      FROM (
        SELECT id, nt,
               CASE WHEN len(nt) >= 8 THEN range(1, len(nt) - 8 + 2) ELSE [] END AS starts
        FROM nrm
      ), UNNEST(starts) AS u(s)
    ),
    probe AS (SELECT DISTINCT gram FROM grams WHERE id % 2 = 1),
    matches AS (
      SELECT g.id, g.start FROM grams g JOIN probe p ON g.gram = p.gram
      WHERE g.id % 2 = 0
    ),
    covered AS (
      SELECT DISTINCT id, u.pos FROM matches, UNNEST(range(start, start + 8)) AS u(pos)
    ),
    toks AS (
      SELECT id, u.pos, raw[u.pos] AS tok
      FROM nrm, UNNEST(range(1, len(raw) + 1)) AS u(pos)
      WHERE id % 2 = 0
    ),
    kept AS (
      SELECT t.id, t.pos, t.tok FROM toks t
      LEFT JOIN covered c ON t.id = c.id AND t.pos = c.pos
      WHERE c.id IS NULL
    ),
    reb AS (
      SELECT id, string_agg(tok, ' ' ORDER BY pos) AS text,
             COUNT(*) AS kept FROM kept GROUP BY id
    )
    SELECT s.id, COALESCE(r.text, '') AS text,
           CAST(len(s.raw) - COALESCE(r.kept, 0) AS BIGINT) AS removed_tokens,
           CAST(len(s.raw) AS BIGINT) AS total_tokens
    FROM src s LEFT JOIN reb r ON s.id = r.id
    WHERE s.id % 2 = 0
    ORDER BY s.id
    """,
)
def q_decontaminate_spans_documents(spark, sf_dir):
    """Span-level decontamination (pipeline/dedup.py decontaminate_spans):
    even-id docs are the training side, odd-id docs the probe; every
    8-gram span (normalized-token match) shared with the probe set is
    surgically excised and the surviving ORIGINAL tokens re-spliced in
    order — whole-doc removal's production-grade refinement. The corpus'
    seeded near-duplicates guarantee real span hits across the parity
    split."""
    from truthound_spark.pipeline.dedup import decontaminate_spans

    docs = t(spark, sf_dir, "documents")
    out = decontaminate_spans(
        docs.filter(F.col("doc_id") % 2 == 0),
        docs.filter(F.col("doc_id") % 2 == 1),
        n=8,
    )
    return out.orderBy("id")


@register("pq_encode_embeddings", _pq_encode_oracle_sql(m=2, k=4, iters=1, dim=4))
def q_pq_encode_embeddings(spark, sf_dir):
    """Product-quantization train+encode (pipeline/similarity.py pq_train
    / pq_encode — Jégou et al. 2011, the FAISS PQ compressor): embeddings
    sliced to 4 dims, m=2 subspaces, k=4 codes, one Lloyd round per
    subspace (kmeans_vec per slice, shared determinism contract). The
    oracle replays BOTH subspace trainings relationally and joins the
    final assignments into the codes array — train→encode hash-certified
    end-to-end."""
    from truthound_spark.pipeline.similarity import pq_encode, pq_train

    emb = t(spark, sf_dir, "embeddings")
    sliced = emb.select(
        "vec_id",
        F.slice(F.col("embedding").cast("array<double>"), 1, 4).alias("embedding"),
    )
    books = pq_train(sliced, m=2, k=4, iters=1)
    return pq_encode(sliced, books).orderBy("id")


@register(
    "pq_search_embeddings",
    _pq_search_oracle_sql(m=2, k=4, iters=1, dim=4, n_queries=3, topk=5),
)
def q_pq_search_embeddings(spark, sf_dir):
    """PQ asymmetric-distance search (pipeline/similarity.py pq_search):
    full-precision queries vs PQ-coded corpus, distance = Σ_s
    ||q_s − centroid(code_s)||² via per-query lookup tables — no corpus
    vectors touched after encoding. 1e-6-quantized distances ranked with
    (dist, id) tie-break; the oracle recomputes codebooks, codes, LUTs
    and ranks relationally — the full compress→search path certified."""
    from truthound_spark.pipeline.similarity import pq_search, pq_train

    emb = t(spark, sf_dir, "embeddings")
    sliced = emb.select(
        "vec_id",
        F.slice(F.col("embedding").cast("array<double>"), 1, 4).alias("embedding"),
    )
    books = pq_train(sliced, m=2, k=4, iters=1)
    queries = sliced.filter(F.col("vec_id") < 3).withColumnRenamed(
        "vec_id", "query_id"
    )
    out = pq_search(sliced, queries, books, k=5)
    return out.orderBy("query_id", "rank")


@register(
    "tfidf_keywords_documents",
    f"""
    WITH t AS (SELECT doc_id AS id, unnest({_WORDS_SQL.format(t='text')}) AS term FROM documents),
    tf AS (SELECT id, term, COUNT(*) AS tf FROM t GROUP BY 1, 2),
    dfr AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nd FROM documents),
    s AS (
      SELECT tf.id, tf.term,
             CAST(round(tf.tf * (LN((1.0 + n.nd) / (1.0 + dfr.df)) + 1.0) * 1000000000.0) AS BIGINT) AS q
      FROM tf JOIN dfr USING (term), n
    ),
    r AS (SELECT id, term, q, ROW_NUMBER() OVER (PARTITION BY id ORDER BY q DESC, term) AS rnk FROM s)
    SELECT id, term, q / 1000000000.0 AS tfidf, CAST(rnk AS INT) AS rank
    FROM r WHERE rnk <= 5 ORDER BY id, rnk
    """,
)
def q_tfidf_keywords_documents(spark, sf_dir):
    """Per-doc top-5 TF-IDF keywords (pipeline/retrieval.py
    tfidf_keywords): smoothed idf, 1e-9-quantized scores ranked with
    (score desc, term) tie-break — WindowGroupLimit top-k, ranks AND
    scores hash-certified."""
    from truthound_spark.pipeline.retrieval import tfidf_keywords

    docs = t(spark, sf_dir, "documents")
    return tfidf_keywords(docs, k=5).orderBy("id", "rank")


@register(
    "boilerplate_ngrams_documents",
    f"""
    WITH sh AS (
      SELECT doc_id AS id,
             list_distinct([array_to_string(list_slice(words, i, i + 4), ' ')
                            FOR i IN range(1, GREATEST(len(words) - 4, 1) + 1)]) AS sh
      FROM (SELECT doc_id, string_split({_NORM_SQL.format(c='text')}, ' ') AS words FROM documents)
    ),
    inv AS (SELECT id, unnest(sh) AS g FROM sh),
    sp AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM inv WHERE g <> '' GROUP BY g HAVING COUNT(*) >= 2
    ),
    r AS (SELECT g AS gram, n_docs, ROW_NUMBER() OVER (ORDER BY n_docs DESC, g) AS rnk FROM sp)
    SELECT gram, n_docs, CAST(rnk AS INT) AS rank FROM r WHERE rnk <= 100 ORDER BY rnk
    """,
)
def q_boilerplate_ngrams_documents(spark, sf_dir):
    """Corpus boilerplate report (pipeline/retrieval.py
    boilerplate_ngrams): top-100 5-gram shingles by distinct-doc spread
    (>= 2 docs), deterministic (spread desc, gram) rank — the
    surface self_dedup_spans would excise, surfaced for review."""
    from truthound_spark.pipeline.retrieval import boilerplate_ngrams

    docs = t(spark, sf_dir, "documents")
    return boilerplate_ngrams(docs, n=5, min_docs=2, k=100).orderBy("rank")


@register(
    "set_similarity_join_documents",
    f"""
    WITH sh AS ({_SHINGLES_SQL}),
    nz AS (SELECT id, list_filter(sh, x -> x <> '') AS s FROM sh WHERE len(list_filter(sh, x -> x <> '')) > 0),
    p AS (
      SELECT a.id AS id_a, b.id AS id_b,
             len(list_intersect(a.s, b.s))
             / CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS DOUBLE) AS j
      FROM nz a JOIN nz b ON a.id < b.id
    )
    SELECT id_a, id_b, ROUND(j, 6) AS jaccard FROM p WHERE ROUND(j, 6) >= 0.4 ORDER BY 1, 2
    """,
)
def q_set_similarity_join_documents(spark, sf_dir):
    """Prefix-filtered exact set-similarity self-join (pipeline/dedup.py
    set_similarity_join — the SSJoin/PPJoin prefix-filtering principle):
    3-gram shingle Jaccard ≥ 0.4, the same semantics ngram_jaccard_pairs
    computes with a full inverted index — here the engine indexes only
    each set's rarest-first prefix (n − ⌈t·n⌉ + 1 tokens), and the
    EXHAUSTIVE oracle must equal the pruned plan's output, certifying
    the prefix-filtering theorem's completeness end-to-end."""
    from truthound_spark.pipeline.dedup import set_similarity_join, word_shingles

    docs = t(spark, sf_dir, "documents")
    with_sets = docs.select(
        "doc_id",
        F.filter(word_shingles(F.col("text"), 3), lambda x: x != F.lit("")).alias(
            "sh"
        ),
    )
    return set_similarity_join(with_sets, "sh", "doc_id", threshold=0.4).orderBy(
        "id_a", "id_b"
    )


@register(
    "char_entropy_documents",
    f"""
    WITH src AS (SELECT doc_id AS id, {_NORM_SQL.format(c='text')} AS nt FROM documents),
    ch AS (
      SELECT id, unnest(string_split(nt, '')) AS c FROM src WHERE length(nt) > 0
    ),
    cc AS (SELECT id, c, COUNT(*) AS n FROM ch WHERE c <> '' GROUP BY 1, 2),
    tot AS (SELECT id, SUM(n) AS t FROM cc GROUP BY id),
    terms AS (
      SELECT cc.id, tot.t,
             CAST(round(-((cc.n / CAST(tot.t AS DOUBLE)) * LN(cc.n / CAST(tot.t AS DOUBLE)) / LN(2.0)) * 1000000000.0) AS BIGINT) AS q
      FROM cc JOIN tot USING (id)
    ),
    e AS (
      SELECT id, CAST(MAX(t) AS BIGINT) AS n_chars,
             ROUND(SUM(q) / 1000000000.0, 6) AS entropy_bits
      FROM terms GROUP BY id
    )
    SELECT d.doc_id AS id,
           COALESCE(e.n_chars, 0) AS n_chars,
           COALESCE(e.entropy_bits, 0.0) AS entropy_bits
    FROM documents d LEFT JOIN e ON d.doc_id = e.id
    ORDER BY id
    """,
)
def q_char_entropy_documents(spark, sf_dir):
    """Per-doc Shannon entropy of the normalized char distribution
    (pipeline/text.py char_entropy — bits/char over the pinned ASCII
    alphabet): the model-free noise/spam signal; per-char -p·log2 p
    terms sum as 1e-9-quantized longs, hash-certified floats."""
    from truthound_spark.pipeline.text import char_entropy

    docs = t(spark, sf_dir, "documents")
    return char_entropy(docs).orderBy("id")


@register(
    "quantile_gate_documents",
    """
    WITH w AS (
      SELECT doc_id, text, source,
             string_split(CASE WHEN LEN(TRIM(text)) = 0 THEN '' ELSE
               trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g'))
             END, ' ') AS words,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_words
      FROM documents
    ),
    f AS (
      SELECT doc_id, source, n_words,
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
    ),
    q AS (
      SELECT doc_id AS id, source,
        ROUND(LEAST(n_words / 50.0, 1.0) * 0.3
            + LEAST(stop_r * 4.0, 1.0) * 0.2
            + (1.0 - LEAST(punct_r * 5.0, 1.0)) * 0.2
            + (1.0 - LEAST(digit_r * 5.0, 1.0)) * 0.1
            + LEAST(uniq_r * 1.25, 1.0) * 0.2, 6) AS score
      FROM f
    )
    SELECT id, source AS "group", score,
           (CUME_DIST() OVER (PARTITION BY source ORDER BY score DESC, id) <= 0.6) AS kept
    FROM q ORDER BY id
    """,
)
def q_quantile_gate_documents(spark, sf_dir):
    """Per-source adaptive quality gating (pipeline/text.py
    quantile_gate — the CCNet per-bucket recipe): keep the top 60% of
    docs by 6-dp-rounded quality score WITHIN each source, exact
    cume_dist membership with deterministic id tie-break — source
    composition survives filtering while each source drops its worst
    tail. Oracle replays the identical windowed cume_dist."""
    from truthound_spark.pipeline.text import quality_score, quantile_gate

    docs = t(spark, sf_dir, "documents")
    scored = quality_score(docs, "text").withColumn(
        "qs", F.round("quality_score", 6)
    )
    out = quantile_gate(scored, "qs", group_col="source", keep_fraction=0.6)
    return out.orderBy("id")


@register(
    "dsir_select_documents",
    f"""
    WITH w AS (
      SELECT doc_id, lang, {_WORDS_SQL.format(t='text')} AS ws FROM documents
    ),
    f AS (
      SELECT doc_id, lang,
             ws || list_transform(range(1, len(ws)), i -> ws[i] || '_' || ws[i+1]) AS feats
      FROM w
    ),
    b AS (
      SELECT doc_id, lang,
             list_transform(feats,
               t -> CAST(('0x' || substr(md5(t), 1, 6)) AS BIGINT) % 4096) AS bk
      FROM f
    ),
    m AS (SELECT doc_id, lang, u.bucket FROM b, UNNEST(bk) AS u(bucket)),
    cp AS (SELECT bucket, COUNT(*) AS n FROM m WHERE lang = 'en' GROUP BY 1),
    cn AS (SELECT bucket, COUNT(*) AS n FROM m GROUP BY 1),
    tot AS (
      SELECT (SELECT COALESCE(SUM(n), 0) FROM cp) + 4096 AS pt,
             (SELECT COALESCE(SUM(n), 0) FROM cn) + 4096 AS nt
    ),
    wfull AS (
      SELECT gs.i AS bucket,
             LN((COALESCE(cp.n, 0) + 1) / tot.pt) - LN((COALESCE(cn.n, 0) + 1) / tot.nt) AS wt
      FROM generate_series(0, 4095) AS gs(i)
      LEFT JOIN cp ON gs.i = cp.bucket
      LEFT JOIN cn ON gs.i = cn.bucket, tot
    ),
    warr AS (SELECT list(wt ORDER BY bucket) AS ws FROM wfull),
    sc AS (
      SELECT doc_id AS id,
             CASE WHEN len(bk) > 0
                  THEN list_sum(list_transform(bk, x -> warr.ws[x + 1]))
                  ELSE 0.0 END AS logw
      FROM b, warr
    ),
    g AS (
      SELECT id, logw,
             -LN(-LN((CAST(('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 12)) AS BIGINT) + 0.5)
                     / 281474976710656.0)) AS gum
      FROM sc
    ),
    k AS (SELECT id, logw, CAST(round((logw + gum) * 1000000.0) AS BIGINT) AS key_q FROM g),
    r AS (SELECT id, logw, ROW_NUMBER() OVER (ORDER BY key_q DESC, id) AS rnk FROM k)
    SELECT id, ROUND(logw, 6) AS log_importance, CAST(rnk AS INT) AS rank
    FROM r WHERE rnk <= 100 ORDER BY rnk
    """,
)
def q_dsir_select_documents(spark, sf_dir):
    """DSIR importance resampling (pipeline/text.py dsir_select — Xie et
    al. 2023): English-language docs play the target distribution, the
    whole corpus the raw pool; per-doc log importance is the hashed
    n-gram Naive Bayes log-odds sum (trainer shared verbatim with the
    quality classifier), and selection is deterministic Gumbel top-100
    (md5-derived noise, 1e-6-quantized sampling key) so inclusion follows
    softmax(log_importance). Oracle retrains the weights relationally and
    replays the identical fold + ranking."""
    from truthound_spark.pipeline.text import dsir_select

    docs = t(spark, sf_dir, "documents")
    out = dsir_select(docs, docs.filter(F.col("lang") == "en"), n_select=100)
    return out.orderBy("rank")


@register(
    "winnow_overlap_documents",
    f"""
    WITH src AS (SELECT doc_id AS id, {_NORM_SQL.format(c='text')} AS ntext FROM documents),
    tok AS (SELECT id, string_split(ntext, ' ') AS nt FROM src WHERE length(ntext) > 0),
    grams AS (
      SELECT id, u.s AS pos, substr(md5(array_to_string(nt[u.s:u.s+3], ' ')), 1, 16) AS h
      FROM (SELECT id, nt, CASE WHEN len(nt) >= 4 THEN range(1, len(nt) - 4 + 2) ELSE [] END AS starts FROM tok),
      UNNEST(starts) AS u(s)
    ),
    winm AS (
      SELECT id, pos,
             MIN(struct_pack(h := h, np := -pos)) OVER (PARTITION BY id ORDER BY pos ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS m,
             COUNT(*) OVER (PARTITION BY id) AS ng
      FROM grams
    ),
    sel AS (SELECT DISTINCT id, (m).h AS h FROM winm WHERE pos <= GREATEST(ng - 4 + 1, 1)),
    pairs AS (SELECT a.id id_a, b.id id_b, COUNT(*) shared FROM sel a JOIN sel b ON a.h = b.h AND a.id < b.id GROUP BY 1, 2),
    sz AS (SELECT id, COUNT(*) n FROM sel GROUP BY id)
    SELECT p.id_a, p.id_b, CAST(p.shared AS BIGINT) AS shared_fingerprints,
           ROUND(p.shared / CAST(LEAST(sa.n, sb.n) AS DOUBLE), 6) AS containment
    FROM pairs p JOIN sz sa ON p.id_a = sa.id JOIN sz sb ON p.id_b = sb.id
    WHERE p.shared >= 2 ORDER BY 1, 2
    """,
)
def q_winnow_overlap_documents(spark, sf_dir):
    """Winnowing fingerprint overlap (pipeline/text.py winnow_fingerprints
    / winnow_overlap_pairs — Schleimer et al. 2003 MOSS): k=4-token gram
    md5 hashes, w=4 window minima with rightmost tie-break, pairs sharing
    ≥ 2 selected hashes with containment score. The oracle replicates
    selection with a struct-min window frame (hash asc, -pos asc ==
    rightmost minimal) and must produce the identical pair set — the
    engine's HOF extraction is map-only and never shuffles text."""
    from truthound_spark.pipeline.text import winnow_overlap_pairs

    docs = t(spark, sf_dir, "documents")
    return winnow_overlap_pairs(docs, k=4, w=4, min_shared=2).orderBy(
        "id_a", "id_b"
    )
