"""Entry-query registry section 1 (split from the single entry_queries module, r13). Import order = registration order = the original module's order."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from truthound_spark.entry_queries._core import (  # noqa: F401
    EV,
    _DRIFT_BASE,
    _DRIFT_CURR,
    _GEO_SQL_BASE,
    _NORM_SQL,
    _drift_frames,
    _geo_df,
    _scalar_df,
    fused_counts,
    register,
    t,
)



# ===========================================================================
# §2.4 completeness
# ===========================================================================


@register(
    "null_counts_customer",
    """
    SELECT
      CAST(SUM(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS custkey_nulls,
      CAST(SUM(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS name_nulls,
      CAST(SUM(CASE WHEN c_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nationkey_nulls,
      CAST(SUM(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS acctbal_nulls,
      CAST(SUM(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS mktsegment_nulls
    FROM customer
    """,
)
def q_null_counts_customer(spark, sf_dir):
    """NullValidator specs fused into one agg (reference completeness/null.py:24)."""
    from truthound_spark.validators.completeness import NullValidator

    df = t(spark, sf_dir, "customer")
    return fused_counts(
        df,
        [
            (
                NullValidator(),
                [
                    "custkey_nulls",
                    "name_nulls",
                    "nationkey_nulls",
                    "acctbal_nulls",
                    "mktsegment_nulls",
                ],
            )
        ],
    )


@register(
    "completeness_ratio_events",
    """
    SELECT
      ROUND(CAST(COUNT(value) AS DOUBLE) / COUNT(*), 6) AS value_completeness,
      ROUND(CAST(COUNT(props) AS DOUBLE) / COUNT(*), 6) AS props_completeness,
      CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM events
    """,
)
def q_completeness_ratio_events(spark, sf_dir):
    df = t(spark, sf_dir, "events")
    return df.agg(
        F.round(F.count("value").cast("double") / F.count(F.lit(1)), 6).alias(
            "value_completeness"
        ),
        F.round(F.count("props").cast("double") / F.count(F.lit(1)), 6).alias(
            "props_completeness"
        ),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
    )


@register(
    "empty_whitespace_documents",
    """
    SELECT
      CAST(SUM(CASE WHEN length(text) = 0 THEN 1 ELSE 0 END) AS BIGINT) AS empty_text,
      CAST(SUM(CASE WHEN length(trim(text)) = 0 AND length(text) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS ws_only_text,
      CAST(SUM(CASE WHEN length(lang) = 0 THEN 1 ELSE 0 END) AS BIGINT) AS empty_lang,
      CAST(SUM(CASE WHEN length(trim(lang)) = 0 AND length(lang) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS ws_only_lang,
      CAST(SUM(CASE WHEN length(source) = 0 THEN 1 ELSE 0 END) AS BIGINT) AS empty_source,
      CAST(SUM(CASE WHEN length(trim(source)) = 0 AND length(source) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS ws_only_source
    FROM documents
    """,
)
def q_empty_whitespace_documents(spark, sf_dir):
    """EmptyString + WhitespaceOnly fused in one suite agg."""
    from truthound_spark.validators.completeness import (
        EmptyStringValidator,
        WhitespaceOnlyValidator,
    )

    df = t(spark, sf_dir, "documents")
    cols = ["text", "lang", "source"]
    return fused_counts(
        df,
        [
            (EmptyStringValidator(columns=cols), ["empty_text", "empty_lang", "empty_source"]),
            (
                WhitespaceOnlyValidator(columns=cols),
                ["ws_only_text", "ws_only_lang", "ws_only_source"],
            ),
        ],
    )


@register(
    "conditional_null_orders",
    """
    SELECT CAST(SUM(CASE WHEN NOT (o_orderstatus = 'O') AND o_totalprice IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS cond_null_violations
    FROM orders
    """,
)
def q_conditional_null_orders(spark, sf_dir):
    from truthound_spark.validators.completeness import ConditionalNullValidator

    df = t(spark, sf_dir, "orders")
    v = ConditionalNullValidator("o_totalprice", "o_orderstatus = 'O'")
    return fused_counts(df, [(v, ["cond_null_violations"])])


@register(
    "default_value_overuse_part",
    """
    SELECT
      CAST(SUM(CASE WHEN p_brand IN ('', 'null', 'NULL', 'None', 'N/A', 'n/a', 'unknown', '-', '0000-00-00') THEN 1 ELSE 0 END) AS BIGINT) AS brand_defaults,
      CAST(SUM(CASE WHEN p_type IN ('', 'null', 'NULL', 'None', 'N/A', 'n/a', 'unknown', '-', '0000-00-00') THEN 1 ELSE 0 END) AS BIGINT) AS type_defaults
    FROM part
    """,
)
def q_default_value_overuse_part(spark, sf_dir):
    from truthound_spark.validators.completeness import DefaultValueValidator

    df = t(spark, sf_dir, "part")
    v = DefaultValueValidator(columns=["p_brand", "p_type"])
    return fused_counts(df, [(v, ["brand_defaults", "type_defaults"])])


# ===========================================================================
# §2.4 uniqueness
# ===========================================================================


@register(
    "unique_violations_orders",
    """
    SELECT
      CAST(COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS orderkey_dups,
      CAST(COUNT(o_custkey) - COUNT(DISTINCT o_custkey) AS BIGINT) AS custkey_dups,
      CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS orderkey_distinct,
      CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS custkey_distinct
    FROM orders
    """,
)
def q_unique_violations_orders(spark, sf_dir):
    """UniqueValidator count_expr = count - countDistinct (uniqueness/unique.py:18)."""
    from truthound_spark.validators.uniqueness import UniqueValidator

    df = t(spark, sf_dir, "orders")
    base = fused_counts(
        df.select("o_orderkey", "o_custkey"),
        [(UniqueValidator(), ["orderkey_dups", "custkey_dups"])],
    )
    extra = df.agg(
        F.countDistinct("o_orderkey").alias("orderkey_distinct"),
        F.countDistinct("o_custkey").alias("custkey_distinct"),
    )
    return base.crossJoin(extra)


@register(
    "duplicate_rows_documents",
    """
    SELECT
      CAST(COALESCE(SUM(CASE WHEN n > 1 THEN n ELSE 0 END), 0) AS BIGINT) AS dup_rows,
      CAST(COALESCE(SUM(n), 0) AS BIGINT) AS total_rows
    FROM (SELECT COUNT(*) AS n FROM documents GROUP BY text)
    """,
)
def q_duplicate_rows_documents(spark, sf_dir):
    """DuplicateValidator plan: groupBy(cols) → sum counts>1 (duplicate.py:13)."""
    df = t(spark, sf_dir, "documents")
    grouped = df.groupBy("text").agg(F.count(F.lit(1)).alias("__n"))
    return grouped.agg(
        F.coalesce(
            F.sum(F.when(F.col("__n") > 1, F.col("__n")).otherwise(F.lit(0))), F.lit(0)
        )
        .cast("long")
        .alias("dup_rows"),
        F.coalesce(F.sum("__n"), F.lit(0)).cast("long").alias("total_rows"),
    )


@register(
    "duplicate_within_group_events",
    f"""
    WITH {EV}
    SELECT CAST(COALESCE(SUM(d), 0) AS BIGINT) AS dup_ts_within_user
    FROM (SELECT COUNT(ts) - COUNT(DISTINCT ts) AS d FROM ev GROUP BY user_id)
    """,
)
def q_duplicate_within_group_events(spark, sf_dir):
    """DuplicateWithinGroup: per-group count - countDistinct (duplicate.py:75)."""
    df = t(spark, sf_dir, "events")
    per_group = df.groupBy("user_id").agg(
        (F.count(F.col("ts")) - F.countDistinct(F.col("ts"))).alias("__dups")
    )
    return per_group.agg(
        F.coalesce(F.sum("__dups"), F.lit(0)).cast("long").alias("dup_ts_within_user")
    )


@register(
    "primary_key_lineitem",
    """
    SELECT
      CAST((SELECT COUNT(*) FROM lineitem)
         - (SELECT COUNT(*) FROM (SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem)) AS BIGINT) AS dup_keys,
      CAST((SELECT SUM(CASE WHEN l_orderkey IS NULL OR l_linenumber IS NULL THEN 1 ELSE 0 END) FROM lineitem) AS BIGINT) AS null_keys
    """,
)
def q_primary_key_lineitem(spark, sf_dir):
    """PrimaryKeyValidator compound key spec (primary_key.py:13,94)."""
    from truthound_spark.validators.uniqueness import PrimaryKeyValidator

    df = t(spark, sf_dir, "lineitem")
    v = PrimaryKeyValidator(["l_orderkey", "l_linenumber"])
    spec = v.specs(df)[0]
    return df.agg(
        spec.count_expr.cast("long").alias("dup_keys"),
        spec.extra_exprs["nulls"].cast("long").alias("null_keys"),
    )


@register(
    "distinct_in_set_orders",
    """
    SELECT
      CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P') AND o_orderstatus IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS status_violations,
      CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH', '3-MEDIUM') AND o_orderpriority IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS priority_violations
    FROM orders
    """,
)
def q_distinct_in_set_orders(spark, sf_dir):
    from truthound_spark.validators.distribution import InSetValidator

    df = t(spark, sf_dir, "orders")
    return fused_counts(
        df,
        [
            (InSetValidator("o_orderstatus", ["O", "F", "P"]), ["status_violations"]),
            (
                InSetValidator("o_orderpriority", ["1-URGENT", "2-HIGH", "3-MEDIUM"]),
                ["priority_violations"],
            ),
        ],
    )


@register(
    "most_common_event_types",
    """
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM events GROUP BY event_type ORDER BY cnt DESC, event_type LIMIT 3
    """,
)
def q_most_common_event_types(spark, sf_dir):
    """MostCommonValue top-k plan (distribution/statistical.py:412)."""
    df = t(spark, sf_dir, "events")
    return (
        df.groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .orderBy(F.desc("cnt"), F.col("event_type"))
        .limit(3)
    )


# ===========================================================================
# §2.4 aggregates / §2.8 range
# ===========================================================================


@register(
    "range_violations_lineitem",
    """
    SELECT
      CAST(SUM(CASE WHEN (l_quantity < 1 OR l_quantity > 30) AND l_quantity IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS quantity_violations,
      CAST(SUM(CASE WHEN (l_discount < 0.0 OR l_discount > 0.08) AND l_discount IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS discount_violations,
      CAST(SUM(CASE WHEN (l_tax < 0.0 OR l_tax > 0.05) AND l_tax IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS tax_violations
    FROM lineitem
    """,
)
def q_range_violations_lineitem(spark, sf_dir):
    """RangeValidator predicate (distribution/range.py:87-93) fused x3."""
    from truthound_spark.validators.distribution import RangeValidator

    df = t(spark, sf_dir, "lineitem")
    return fused_counts(
        df,
        [
            (RangeValidator("l_quantity", 1, 30), ["quantity_violations"]),
            (RangeValidator("l_discount", 0.0, 0.08), ["discount_violations"]),
            (RangeValidator("l_tax", 0.0, 0.05), ["tax_violations"]),
        ],
    )


@register(
    "scalar_aggregates_lineitem",
    """
    SELECT
      ROUND(AVG(l_extendedprice), 4) AS mean_price,
      ROUND(CAST(SUM(l_extendedprice) AS DOUBLE), 0) AS sum_price,
      ROUND(MIN(l_extendedprice), 4) AS min_price,
      ROUND(MAX(l_extendedprice), 4) AS max_price,
      ROUND(STDDEV_SAMP(l_extendedprice), 4) AS std_price,
      ROUND(VAR_SAMP(l_extendedprice), 0) AS var_price
    FROM lineitem
    """,
)
def q_scalar_aggregates_lineitem(spark, sf_dir):
    """Mean/Sum/Min/Max/Std/Variance Between observation aggregates
    (reference aggregate/{central,spread,extremes,sum}.py) in one agg."""
    df = t(spark, sf_dir, "lineitem")
    c = F.col("l_extendedprice")
    return df.agg(
        F.round(F.mean(c), 4).alias("mean_price"),
        F.round(F.sum(c), 0).alias("sum_price"),
        F.round(F.min(c), 4).alias("min_price"),
        F.round(F.max(c), 4).alias("max_price"),
        F.round(F.stddev_samp(c), 4).alias("std_price"),
        F.round(F.var_samp(c), 0).alias("var_price"),
    )


@register(
    "row_counts_all_tables",
    """
    SELECT 'customer' AS table_name, CAST(COUNT(*) AS BIGINT) AS n FROM customer
    UNION ALL SELECT 'events', COUNT(*) FROM events
    UNION ALL SELECT 'lineitem', COUNT(*) FROM lineitem
    UNION ALL SELECT 'nation', COUNT(*) FROM nation
    UNION ALL SELECT 'orders', COUNT(*) FROM orders
    UNION ALL SELECT 'part', COUNT(*) FROM part
    UNION ALL SELECT 'region', COUNT(*) FROM region
    UNION ALL SELECT 'supplier', COUNT(*) FROM supplier
    """,
)
def q_row_counts_all_tables(spark, sf_dir):
    """RowCountBetween / CrossTableRowCount observation metric per table."""
    names = ["customer", "events", "lineitem", "nation", "orders", "part", "region", "supplier"]
    out = None
    for n in names:
        one = t(spark, sf_dir, n).agg(F.count(F.lit(1)).cast("long").alias("n")).select(
            F.lit(n).alias("table_name"), F.col("n")
        )
        out = one if out is None else out.unionAll(one)
    return out


@register(
    "quantiles_lineitem",
    """
    SELECT
      ROUND(quantile_cont(l_extendedprice, 0.25), 4) AS q25,
      ROUND(quantile_cont(l_extendedprice, 0.50), 4) AS q50,
      ROUND(quantile_cont(l_extendedprice, 0.75), 4) AS q75
    FROM lineitem
    """,
)
def q_quantiles_lineitem(spark, sf_dir):
    """QuantileValidator exact percentile (distribution/quantile.py:17)."""
    df = t(spark, sf_dir, "lineitem")
    return df.agg(
        F.round(F.expr("percentile(l_extendedprice, 0.25)"), 4).alias("q25"),
        F.round(F.expr("percentile(l_extendedprice, 0.50)"), 4).alias("q50"),
        F.round(F.expr("percentile(l_extendedprice, 0.75)"), 4).alias("q75"),
    )


@register(
    "iqr_outliers_events_value",
    """
    WITH q AS (
      SELECT quantile_cont(value, 0.25) AS q1, quantile_cont(value, 0.75) AS q3 FROM events
    )
    SELECT CAST(SUM(CASE WHEN (value < q1 - 1.5 * (q3 - q1) OR value > q3 + 1.5 * (q3 - q1))
                          AND value IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS iqr_outliers
    FROM events, q
    """,
)
def q_iqr_outliers_events_value(spark, sf_dir):
    """IQROutlierValidator two-pass plan (distribution/outlier.py:18)."""
    df = t(spark, sf_dir, "events")
    fences = df.agg(
        F.expr("percentile(value, 0.25)").alias("q1"),
        F.expr("percentile(value, 0.75)").alias("q3"),
    ).collect()[0]
    q1, q3 = fences["q1"], fences["q3"]
    iqr = q3 - q1
    lo, hi = q1 - 1.5 * iqr, q3 + 1.5 * iqr
    pred = ((F.col("value") < lo) | (F.col("value") > hi)) & F.col("value").isNotNull()
    return df.agg(
        F.sum(F.when(pred, 1).otherwise(0)).cast("long").alias("iqr_outliers")
    )


@register(
    "zscore_outliers_events_value",
    """
    WITH s AS (SELECT AVG(value) AS mu, STDDEV_SAMP(value) AS sd FROM events)
    SELECT CAST(SUM(CASE WHEN ABS(value - mu) > 3.0 * sd AND value IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS z_outliers
    FROM events, s
    """,
)
def q_zscore_outliers_events_value(spark, sf_dir):
    """ZScoreOutlierValidator two-pass plan (outlier.py:135)."""
    df = t(spark, sf_dir, "events")
    stats = df.agg(F.mean("value").alias("mu"), F.stddev("value").alias("sd")).collect()[0]
    mu, sd = stats["mu"], stats["sd"]
    pred = (F.abs(F.col("value") - mu) > 3.0 * sd) & F.col("value").isNotNull()
    return df.agg(F.sum(F.when(pred, 1).otherwise(0)).cast("long").alias("z_outliers"))


@register(
    "mixed_type_part_name",
    """
    SELECT CAST(SUM(CASE WHEN TRY_CAST(p_name AS DOUBLE) IS NOT NULL AND p_name IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS numeric_like_strings
    FROM part
    """,
)
def q_mixed_type_part_name(spark, sf_dir):
    """TypeValidator mixed-type smell (aggregate/type.py:17)."""
    df = t(spark, sf_dir, "part")
    pred = F.col("p_name").try_cast("double").isNotNull() & F.col("p_name").isNotNull()
    return df.agg(
        F.sum(F.when(pred, 1).otherwise(0)).cast("long").alias("numeric_like_strings")
    )


# ===========================================================================
# §2.8 string / format
# ===========================================================================


@register(
    "regex_violations_names",
    """
    SELECT
      CAST(SUM(CASE WHEN NOT regexp_matches(c_name, '^Customer#[0-9]{9}$') AND c_name IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS bad_customer_names,
      CAST(SUM(CASE WHEN regexp_matches(c_name, '^Customer#0{5}') AND c_name IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS low_key_names
    FROM customer
    """,
)
def q_regex_violations_names(spark, sf_dir):
    """Regex / NotMatchRegex rlike compilation (string/regex.py:33)."""
    from truthound_spark.validators.string import NotMatchRegexValidator, RegexValidator

    df = t(spark, sf_dir, "customer")
    return fused_counts(
        df,
        [
            (RegexValidator("c_name", r"^Customer#[0-9]{9}$"), ["bad_customer_names"]),
            (NotMatchRegexValidator("c_name", r"^Customer#0{5}"), ["low_key_names"]),
        ],
    )


@register(
    "like_pattern_part_type",
    """
    SELECT
      CAST(SUM(CASE WHEN p_type NOT LIKE '%ECO%' AND p_type IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS not_eco,
      CAST(SUM(CASE WHEN p_type LIKE 'SMALL%' AND p_type IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS small_prefixed
    FROM part
    """,
)
def q_like_pattern_part_type(spark, sf_dir):
    """LikePattern / NotLikePattern (string/like_pattern.py:19,195)."""
    from truthound_spark.validators.string import (
        LikePatternValidator,
        NotLikePatternValidator,
    )

    df = t(spark, sf_dir, "part")
    return fused_counts(
        df,
        [
            (LikePatternValidator("p_type", "%ECO%"), ["not_eco"]),
            (NotLikePatternValidator("p_type", "SMALL%"), ["small_prefixed"]),
        ],
    )


@register(
    "length_violations_documents",
    """
    SELECT CAST(SUM(CASE WHEN (length(text) < 60 OR length(text) > 400) AND text IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS length_violations
    FROM documents
    """,
)
def q_length_violations_documents(spark, sf_dir):
    from truthound_spark.validators.string import LengthValidator

    df = t(spark, sf_dir, "documents")
    return fused_counts(df, [(LengthValidator("text", 60, 400), ["length_violations"])])


@register(
    "email_format_derived",
    """
    WITH d AS (
      SELECT CASE WHEN c_custkey % 97 = 0 THEN c_name
                  ELSE lower(replace(c_name, '#', '.')) || '@example.com' END AS email
      FROM customer
    )
    SELECT CAST(SUM(CASE WHEN NOT regexp_matches(email, '^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}$')
                          AND email IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS invalid_emails
    FROM d
    """,
)
def q_email_format_derived(spark, sf_dir):
    """EmailValidator rlike spec (string/format.py:179) over a derived
    email column with seeded invalids (every 97th key keeps the raw name)."""
    from truthound_spark.validators.string import EmailValidator

    df = t(spark, sf_dir, "customer").select(
        F.when(F.col("c_custkey") % 97 == 0, F.col("c_name"))
        .otherwise(F.concat(F.lower(F.replace(F.col("c_name"), F.lit("#"), F.lit("."))), F.lit("@example.com")))
        .alias("email")
    )
    return fused_counts(df, [(EmailValidator("email"), ["invalid_emails"])])


@register(
    "casing_consistency_part_type",
    """
    SELECT
      CAST(SUM(CASE WHEN p_type = lower(p_type) THEN 1 ELSE 0 END) AS BIGINT) AS lower_n,
      CAST(SUM(CASE WHEN p_type = upper(p_type) THEN 1 ELSE 0 END) AS BIGINT) AS upper_n,
      CAST(COUNT(p_type) AS BIGINT) AS nn
    FROM part
    """,
)
def q_casing_consistency_part_type(spark, sf_dir):
    """ConsistentCasing dominant-case metrics (string/casing.py:13)."""
    df = t(spark, sf_dir, "part")
    c = F.col("p_type")
    return df.agg(
        F.sum(F.when(c == F.lower(c), 1).otherwise(0)).cast("long").alias("lower_n"),
        F.sum(F.when(c == F.upper(c), 1).otherwise(0)).cast("long").alias("upper_n"),
        F.count(c).cast("long").alias("nn"),
    )


@register(
    "json_parseable_events_props",
    """
    WITH d AS (
      SELECT CASE WHEN event_id % 89 = 0 THEN substr(props, 1, length(props) - 1)
                  ELSE props END AS j
      FROM events
    )
    SELECT
      CAST(SUM(CASE WHEN json_valid(j) THEN 0 ELSE 1 END) AS BIGINT) AS unparseable,
      CAST(COUNT(j) AS BIGINT) AS nn
    FROM d
    """,
)
def q_json_parseable_events_props(spark, sf_dir):
    """JsonParseable (string/json.py:24): seeded corruption on every 89th
    event (truncated brace) so the violation count is nonzero."""
    df = t(spark, sf_dir, "events").select(
        F.when(
            F.col("event_id") % 89 == 0,
            F.expr("substring(props, 1, length(props) - 1)"),
        )
        .otherwise(F.col("props"))
        .alias("j")
    )
    unparseable = F.try_parse_json(F.col("j")).isNull() & F.col("j").isNotNull()
    return df.agg(
        F.sum(F.when(unparseable, 1).otherwise(0)).cast("long").alias("unparseable"),
        F.count("j").cast("long").alias("nn"),
    )


@register(
    "phone_format_derived",
    """
    WITH d AS (
      SELECT CASE WHEN c_custkey % 101 = 0 THEN 'not-a-phone'
                  ELSE printf('010-%04d-%04d', CAST(c_custkey % 10000 AS INT), CAST((c_custkey * 7) % 10000 AS INT)) END AS phone
      FROM customer
    )
    SELECT CAST(SUM(CASE WHEN NOT regexp_matches(phone, '^01[016789]-?[0-9]{3,4}-?[0-9]{4}$')
                          AND phone IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS invalid_phones
    FROM d
    """,
)
def q_phone_format_derived(spark, sf_dir):
    """KoreanPhone-style regex check (localization/korean.py:250) over a
    derived phone column with seeded invalids."""
    df = t(spark, sf_dir, "customer").select(
        F.when(F.col("c_custkey") % 101 == 0, F.lit("not-a-phone"))
        .otherwise(
            F.format_string(
                "010-%04d-%04d",
                (F.col("c_custkey") % 10000).cast("int"),
                ((F.col("c_custkey") * 7) % 10000).cast("int"),
            )
        )
        .alias("phone")
    )
    pred = ~F.col("phone").rlike(r"^01[016789]-?[0-9]{3,4}-?[0-9]{4}$") & F.col(
        "phone"
    ).isNotNull()
    return df.agg(
        F.sum(F.when(pred, 1).otherwise(0)).cast("long").alias("invalid_phones")
    )


@register(
    "luhn_checksum_derived",
    """
    WITH tt AS (SELECT CAST(c_custkey * 7919 + 13 AS VARCHAR) AS s FROM customer),
    sc AS (
      SELECT s, length(s) AS ln,
             list_sum([CASE WHEN (length(s) - i) % 2 = 1 THEN
                         CASE WHEN CAST(s[i] AS INT) * 2 > 9 THEN CAST(s[i] AS INT) * 2 - 9
                              ELSE CAST(s[i] AS INT) * 2 END
                       ELSE CAST(s[i] AS INT) END
                       FOR i IN range(1, length(s) + 1)]) AS tot
      FROM tt
    )
    SELECT CAST(SUM(CASE WHEN tot % 10 = 0 AND ln >= 8 THEN 1 ELSE 0 END) AS BIGINT) AS luhn_valid_n,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM sc
    """,
)
def q_luhn_checksum_derived(spark, sf_dir):
    """Luhn mod-10 as a pure SQL expression chain (business.py _luhn_expr;
    reference business_rule/checksum.py:19)."""
    from truthound_spark.validators.business import _luhn_expr

    df = t(spark, sf_dir, "customer").select(
        (F.col("c_custkey") * 7919 + 13).cast("string").alias("s")
    )
    valid = _luhn_expr("s")
    return df.agg(
        F.sum(F.when(valid, 1).otherwise(0)).cast("long").alias("luhn_valid_n"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )


# ===========================================================================
# §2.8 datetime / §2.5 ordered checks
# ===========================================================================


@register(
    "future_past_dates_orders",
    """
    SELECT
      CAST(SUM(CASE WHEN o_orderdate > TIMESTAMP '1998-01-01 00:00:00' THEN 1 ELSE 0 END) AS BIGINT) AS future_dates,
      CAST(SUM(CASE WHEN o_orderdate < TIMESTAMP '1996-01-01 00:00:00' THEN 1 ELSE 0 END) AS BIGINT) AS past_dates
    FROM orders
    """,
)
def q_future_past_dates_orders(spark, sf_dir):
    """FutureDate / PastDate (datetime/range.py:92,146) with a fixed 'now'
    so the check is deterministic."""
    from truthound_spark.validators.datetime_checks import (
        FutureDateValidator,
        PastDateValidator,
    )

    df = t(spark, sf_dir, "orders")
    return fused_counts(
        df.select(F.col("o_orderdate")),
        [
            (FutureDateValidator("o_orderdate", now="1998-01-01 00:00:00"), ["future_dates"]),
            (PastDateValidator("o_orderdate", floor="1996-01-01 00:00:00"), ["past_dates"]),
        ],
    )


@register(
    "date_between_orders",
    """
    SELECT CAST(SUM(CASE WHEN (o_orderdate < TIMESTAMP '1995-06-01 00:00:00'
                            OR o_orderdate > TIMESTAMP '2000-12-31 00:00:00')
                          AND o_orderdate IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS out_of_window
    FROM orders
    """,
)
def q_date_between_orders(spark, sf_dir):
    from truthound_spark.validators.datetime_checks import DateBetweenValidator

    df = t(spark, sf_dir, "orders")
    v = DateBetweenValidator("o_orderdate", "1995-06-01 00:00:00", "2000-12-31 00:00:00")
    return fused_counts(df, [(v, ["out_of_window"])])


@register(
    "freshness_events",
    f"""
    WITH {EV}
    SELECT
      CAST(FLOOR((epoch(TIMESTAMP '2024-02-15 00:00:00') - epoch(MAX(ts))) / 3600) AS BIGINT) AS age_hours,
      CAST(COUNT(DISTINCT CAST(isodow(ts) % 7 + 1 AS INT)) AS BIGINT) AS weekday_coverage
    FROM ev
    """,
)
def q_freshness_events(spark, sf_dir):
    """RecentData max-ts age + DatePartCoverage weekday coverage
    (datetime/freshness.py:14,98)."""
    df = t(spark, sf_dir, "events")
    now = F.to_timestamp(F.lit("2024-02-15 00:00:00"))
    age_h = F.floor(
        (now.cast("double") - F.max("ts").cast("double")) / 3600.0
    ).cast("long")
    return df.agg(
        age_h.alias("age_hours"),
        F.countDistinct(F.dayofweek("ts")).alias("weekday_coverage"),
    )


@register(
    "date_order_orders_lineitem",
    """
    SELECT CAST(SUM(CASE WHEN l_shipdate < o_orderdate THEN 1 ELSE 0 END) AS BIGINT) AS shipped_before_ordered,
           CAST(COUNT(*) AS BIGINT) AS joined_rows
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    """,
)
def q_date_order_orders_lineitem(spark, sf_dir):
    """DateOrder across a join (datetime/order.py:13): ship date must not
    precede order date."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    joined = li.join(o, li.l_orderkey == o.o_orderkey)
    return joined.agg(
        F.sum(F.when(F.col("l_shipdate") < F.col("o_orderdate"), 1).otherwise(0))
        .cast("long")
        .alias("shipped_before_ordered"),
        F.count(F.lit(1)).cast("long").alias("joined_rows"),
    )


# ===========================================================================
# §2.5 timeseries (lag windows)
# ===========================================================================


@register(
    "timeseries_gaps_events",
    f"""
    WITH {EV},
    d AS (
      SELECT epoch(ts) - lag(epoch(ts)) OVER (ORDER BY ts, event_id) AS gap FROM ev
    )
    SELECT
      CAST(SUM(CASE WHEN gap > 900 THEN 1 ELSE 0 END) AS BIGINT) AS gaps_over_15min,
      CAST(SUM(CASE WHEN ABS(gap - 260.0) > 250.0 THEN 1 ELSE 0 END) AS BIGINT) AS irregular_intervals
    FROM d WHERE gap IS NOT NULL
    """,
)
def q_timeseries_gaps_events(spark, sf_dir):
    """TimeSeriesGap + Interval lag-window plans (timeseries/gap.py:23,215)."""
    from pyspark.sql import Window

    df = t(spark, sf_dir, "events")
    w = Window.orderBy(F.col("ts"), F.col("event_id"))
    ts = F.col("ts").cast("double")
    gap = ts - F.lag(ts).over(w)
    d = df.select(gap.alias("gap")).filter(F.col("gap").isNotNull())
    return d.agg(
        F.sum(F.when(F.col("gap") > 900, 1).otherwise(0)).cast("long").alias("gaps_over_15min"),
        F.sum(F.when(F.abs(F.col("gap") - 260.0) > 250.0, 1).otherwise(0))
        .cast("long")
        .alias("irregular_intervals"),
    )


@register(
    "timeseries_monotonic_events",
    f"""
    WITH {EV},
    d AS (
      SELECT value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS diff
      FROM ev
    )
    SELECT CAST(SUM(CASE WHEN diff < 0 THEN 1 ELSE 0 END) AS BIGINT) AS decreasing_steps,
           CAST(SUM(CASE WHEN diff IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS steps
    FROM d
    """,
)
def q_timeseries_monotonic_events(spark, sf_dir):
    """TimeSeriesMonotonic per-user lag check (timeseries/monotonic.py:32)."""
    from pyspark.sql import Window

    df = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts"), F.col("event_id"))
    diff = F.col("value") - F.lag("value").over(w)
    d = df.select(diff.alias("diff"))
    return d.agg(
        F.sum(F.when(F.col("diff") < 0, 1).otherwise(0)).cast("long").alias("decreasing_steps"),
        F.sum(F.when(F.col("diff").isNotNull(), 1).otherwise(0)).cast("long").alias("steps"),
    )


@register(
    "increasing_orders_totalprice",
    """
    WITH d AS (
      SELECT o_totalprice - lag(o_totalprice) OVER (ORDER BY o_orderkey) AS diff FROM orders
    )
    SELECT CAST(SUM(CASE WHEN diff < 0 THEN 1 ELSE 0 END) AS BIGINT) AS violations
    FROM d WHERE diff IS NOT NULL
    """,
)
def q_increasing_orders_totalprice(spark, sf_dir):
    """IncreasingValidator lag plan (distribution/monotonic.py:17) — order
    column o_orderkey (unique), so the lag sequence is deterministic."""
    from pyspark.sql import Window

    df = t(spark, sf_dir, "orders")
    w = Window.orderBy("o_orderkey")
    prev = F.lag("o_totalprice").over(w)
    bad = (F.col("o_totalprice") < prev) & prev.isNotNull()
    return df.select(F.when(bad, 1).otherwise(0).alias("v")).agg(
        F.sum("v").cast("long").alias("violations")
    )


@register(
    "tumbling_window_counts_events",
    f"""
    WITH {EV}
    SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS window_start,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG(value), 4) AS avg_value
    FROM ev GROUP BY 1 ORDER BY 1
    """,
)
def q_tumbling_window_counts_events(spark, sf_dir):
    """Tumbling window aggregation — identical expression batch & stream
    (F.window; realtime/processing/windows.py:30-57). Batch-mode here."""
    df = t(spark, sf_dir, "events")
    return (
        df.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).cast("long").alias("window_start"),
            "n",
            "avg_value",
        )
        .orderBy("window_start")
    )


@register(
    "session_window_counts_events",
    f"""
    WITH {EV},
    s AS (
      SELECT user_id, ts,
             CASE WHEN epoch(ts) - lag(epoch(ts)) OVER (PARTITION BY user_id ORDER BY ts) > 1800
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM ev
    )
    SELECT CAST(SUM(new_session) AS BIGINT) AS n_sessions,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM s
    """,
)
def q_session_window_counts_events(spark, sf_dir):
    """Session windows (gap 30 min) — F.session_window batch parity with
    the lag/cumsum sessionization the oracle uses."""
    df = t(spark, sf_dir, "events")
    sess = df.groupBy("user_id", F.session_window("ts", "30 minutes")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return sess.agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum("cnt").cast("long").alias("n_events"),
    )


# ===========================================================================
# §2.3 referential / cross-table joins
# ===========================================================================


@register(
    "fk_orphans",
    """
    SELECT
      (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l ANTI JOIN orders o ON l.l_orderkey = o.o_orderkey) AS lineitem_orphans,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM orders o ANTI JOIN customer c ON o.o_custkey = c.c_custkey) AS order_orphans,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM orders o ANTI JOIN customer c
         ON o.o_custkey = c.c_custkey AND c.c_mktsegment = 'BUILDING') AS orphans_vs_building_parents
    """,
)
def q_fk_orphans(spark, sf_dir):
    """ForeignKeyValidator anti-join orphans (referential/foreign_key.py:158
    'Find orphans using anti-join'), incl. a filtered-parent variant with a
    guaranteed nonzero count."""
    from truthound_spark.validators.referential import orphans

    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    a = orphans(li, o, [("l_orderkey", "o_orderkey")]).agg(
        F.count(F.lit(1)).cast("long").alias("lineitem_orphans")
    )
    b = orphans(o, c, [("o_custkey", "c_custkey")]).agg(
        F.count(F.lit(1)).cast("long").alias("order_orphans")
    )
    d = orphans(o, c.filter(F.col("c_mktsegment") == "BUILDING"), [("o_custkey", "c_custkey")]).agg(
        F.count(F.lit(1)).cast("long").alias("orphans_vs_building_parents")
    )
    return a.crossJoin(b).crossJoin(d)


@register(
    "dangling_parents",
    """
    SELECT
      (SELECT CAST(COUNT(*) AS BIGINT) FROM customer c ANTI JOIN orders o ON c.c_custkey = o.o_custkey) AS customers_without_orders,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM part p ANTI JOIN lineitem l ON p.p_partkey = l.l_partkey) AS parts_never_ordered
    """,
)
def q_dangling_parents(spark, sf_dir):
    """DanglingReference reverse anti-join (referential/orphan.py:349)."""
    from truthound_spark.validators.referential import orphans

    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    p = t(spark, sf_dir, "part")
    li = t(spark, sf_dir, "lineitem")
    a = orphans(c, o, [("c_custkey", "o_custkey")], broadcast_parent=False).agg(
        F.count(F.lit(1)).cast("long").alias("customers_without_orders")
    )
    b = orphans(p, li, [("p_partkey", "l_partkey")], broadcast_parent=False).agg(
        F.count(F.lit(1)).cast("long").alias("parts_never_ordered")
    )
    return a.crossJoin(b)


@register(
    "referential_nation_region",
    """
    SELECT
      (SELECT CAST(COUNT(*) AS BIGINT) FROM nation n ANTI JOIN region r ON n.n_regionkey = r.r_regionkey) AS nation_orphans,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM supplier s ANTI JOIN nation n ON s.s_nationkey = n.n_nationkey) AS supplier_orphans,
      (SELECT CAST(COUNT(DISTINCT n_regionkey) AS BIGINT) FROM nation) AS regions_referenced
    """,
)
def q_referential_nation_region(spark, sf_dir):
    from truthound_spark.validators.referential import orphans

    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    s = t(spark, sf_dir, "supplier")
    a = orphans(n, r, [("n_regionkey", "r_regionkey")]).agg(
        F.count(F.lit(1)).cast("long").alias("nation_orphans")
    )
    b = orphans(s, n, [("s_nationkey", "n_nationkey")]).agg(
        F.count(F.lit(1)).cast("long").alias("supplier_orphans")
    )
    d = n.agg(F.countDistinct("n_regionkey").alias("regions_referenced"))
    return a.crossJoin(b).crossJoin(d)


@register(
    "cross_table_aggregates",
    """
    SELECT
      ROUND(CAST((SELECT SUM(o_totalprice) FROM orders) AS DOUBLE), 0) AS orders_total,
      ROUND(CAST((SELECT SUM(l_extendedprice) FROM lineitem) AS DOUBLE), 0) AS lineitem_total,
      CAST((SELECT COUNT(DISTINCT o_custkey) FROM orders) AS BIGINT) AS ordering_customers,
      CAST((SELECT COUNT(DISTINCT c_custkey) FROM customer) AS BIGINT) AS all_customers,
      ROUND(CAST((SELECT COUNT(*) FROM lineitem) AS DOUBLE) / (SELECT COUNT(*) FROM orders), 6) AS lineitem_per_order
    """,
)
def q_cross_table_aggregates(spark, sf_dir):
    """CrossTableAggregate / DistinctCount / row-count-factor metrics
    (cross_table/{row_count,aggregate}.py)."""
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    c = t(spark, sf_dir, "customer")
    a = o.agg(
        F.round(F.sum("o_totalprice"), 0).alias("orders_total"),
        F.countDistinct("o_custkey").alias("ordering_customers"),
        F.count(F.lit(1)).alias("__no"),
    )
    b = li.agg(
        F.round(F.sum("l_extendedprice"), 0).alias("lineitem_total"),
        F.count(F.lit(1)).alias("__nl"),
    )
    d = c.agg(F.countDistinct("c_custkey").alias("all_customers"))
    return (
        a.crossJoin(b)
        .crossJoin(d)
        .select(
            "orders_total",
            "lineitem_total",
            "ordering_customers",
            "all_customers",
            F.round(F.col("__nl").cast("double") / F.col("__no"), 6).alias("lineitem_per_order"),
        )
    )


@register(
    "cross_table_group_aggregate",
    """
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(AVG(o_totalprice), 4) AS avg_price
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def q_cross_table_group_aggregate(spark, sf_dir):
    """QueryGroupAggregate per-group bounds surface (query/aggregate.py:144)."""
    df = t(spark, sf_dir, "orders")
    return (
        df.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "column_pair_lineitem",
    """
    SELECT
      CAST(SUM(CASE WHEN NOT (l_discount <= l_tax) AND l_discount IS NOT NULL AND l_tax IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS discount_gt_tax,
      CAST(SUM(CASE WHEN ABS(l_extendedprice - l_quantity * (l_extendedprice / l_quantity)) > 0.01
                     AND l_quantity > 0 THEN 1 ELSE 0 END) AS BIGINT) AS arithmetic_violations
    FROM lineitem
    """,
)
def q_column_pair_lineitem(spark, sf_dir):
    """ColumnPair in-row relation (schema/column_pair.py:13) + ColumnSum
    arithmetic consistency (multi_column/arithmetic.py:15)."""
    df = t(spark, sf_dir, "lineitem")
    pair_bad = (
        ~(F.col("l_discount") <= F.col("l_tax"))
        & F.col("l_discount").isNotNull()
        & F.col("l_tax").isNotNull()
    )
    arith_bad = (
        F.abs(
            F.col("l_extendedprice")
            - F.col("l_quantity") * (F.col("l_extendedprice") / F.col("l_quantity"))
        )
        > 0.01
    ) & (F.col("l_quantity") > 0)
    return df.agg(
        F.sum(F.when(pair_bad, 1).otherwise(0)).cast("long").alias("discount_gt_tax"),
        F.sum(F.when(arith_bad, 1).otherwise(0)).cast("long").alias("arithmetic_violations"),
    )


@register(
    "correlation_covariance_lineitem",
    """
    SELECT
      ROUND(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
      ROUND(covar_samp(l_quantity, l_extendedprice), 2) AS qty_price_covar,
      ROUND(corr(l_discount, l_tax), 6) AS disc_tax_corr
    FROM lineitem
    """,
)
def q_correlation_covariance_lineitem(spark, sf_dir):
    """ColumnCorrelation / ColumnCovariance (multi_column/statistical.py:16,140)."""
    df = t(spark, sf_dir, "lineitem")
    return df.agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("qty_price_covar"),
        F.round(F.corr("l_discount", "l_tax"), 6).alias("disc_tax_corr"),
    )


@register(
    "unique_within_record_lineitem",
    """
    SELECT CAST(SUM(CASE WHEN l_orderkey = l_partkey OR l_orderkey = l_suppkey OR l_partkey = l_suppkey
                         THEN 1 ELSE 0 END) AS BIGINT) AS intra_row_collisions
    FROM lineitem
    """,
)
def q_unique_within_record_lineitem(spark, sf_dir):
    """UniqueWithinRecord intra-row uniqueness (uniqueness/within_record.py:251):
    array_distinct size check across the key columns."""
    df = t(spark, sf_dir, "lineitem")
    arr = F.array("l_orderkey", "l_partkey", "l_suppkey")
    pred = F.size(F.array_distinct(arr)) < F.size(arr)
    return df.agg(
        F.sum(F.when(pred, 1).otherwise(0)).cast("long").alias("intra_row_collisions")
    )


@register(
    "psi_drift_events_value",
    f"""
    WITH b AS ({_DRIFT_BASE}), c AS ({_DRIFT_CURR}),
    r AS (SELECT MIN(value) AS lo, MAX(value) AS hi FROM b),
    bins AS (SELECT i FROM generate_series(0, 9) AS gs(i)),
    bh AS (
      SELECT LEAST(GREATEST(CAST(FLOOR((value - lo) / ((hi - lo) / 10)) AS INT), 0), 9) AS bin,
             COUNT(*) AS n
      FROM b, r GROUP BY 1
    ),
    ch AS (
      SELECT LEAST(GREATEST(CAST(FLOOR((value - lo) / ((hi - lo) / 10)) AS INT), 0), 9) AS bin,
             COUNT(*) AS n
      FROM c, r GROUP BY 1
    ),
    f AS (
      SELECT bins.i,
             COALESCE(bh.n, 0) / CAST((SELECT SUM(n) FROM bh) AS DOUBLE) AS p,
             COALESCE(ch.n, 0) / CAST((SELECT SUM(n) FROM ch) AS DOUBLE) AS q
      FROM bins LEFT JOIN bh ON bins.i = bh.bin LEFT JOIN ch ON bins.i = ch.bin
    )
    SELECT ROUND(SUM((p - q) * LN((p + 1e-10) / (q + 1e-10))), 6) AS psi
    FROM f
    """,
)
def q_psi_drift_events_value(spark, sf_dir):
    """PSI 10-bin drift (drift/psi.py:29): histogram aggregates per side,
    driver-side Σ(p−q)ln(p/q). Engine: drift.detectors.psi."""
    from truthound_spark.drift.detectors import psi

    baseline, current = _drift_frames(spark, sf_dir)
    r = psi(baseline, current, "value", bins=10)
    return _scalar_df(spark, psi=round(r.statistic, 6))


@register(
    "ks_drift_events_value",
    f"""
    WITH b AS ({_DRIFT_BASE}), c AS ({_DRIFT_CURR}),
    u AS (
      SELECT value AS v,
             SUM(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS nb,
             SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS nc
      FROM (SELECT value, 0 AS side FROM b UNION ALL SELECT value, 1 FROM c)
      GROUP BY value
    ),
    e AS (
      SELECT SUM(nb) OVER (ORDER BY v) / CAST((SELECT COUNT(*) FROM b) AS DOUBLE) AS fb,
             SUM(nc) OVER (ORDER BY v) / CAST((SELECT COUNT(*) FROM c) AS DOUBLE) AS fc
      FROM u
    )
    SELECT ROUND(MAX(ABS(fb - fc)), 6) AS ks_stat
    FROM e
    """,
)
def q_ks_drift_events_value(spark, sf_dir):
    """Exact KS via distributed ECDF merge (drift/detectors.py ks_test;
    reference detectors.py:82)."""
    from truthound_spark.drift.detectors import ks_test

    baseline, current = _drift_frames(spark, sf_dir)
    r = ks_test(baseline, current, "value")
    return _scalar_df(spark, ks_stat=round(r.statistic, 6))


@register(
    "chi_square_drift_event_type",
    """
    WITH b AS (SELECT event_type FROM events WHERE event_id % 2 = 0),
    c AS (SELECT event_type FROM events WHERE event_id % 2 = 1),
    cats AS (SELECT DISTINCT event_type FROM events),
    bc AS (SELECT event_type, COUNT(*) AS n FROM b GROUP BY 1),
    cc AS (SELECT event_type, COUNT(*) AS n FROM c GROUP BY 1),
    tot AS (SELECT (SELECT COUNT(*) FROM b) AS nb, (SELECT COUNT(*) FROM c) AS nc),
    f AS (
      SELECT COALESCE(bc.n, 0) AS ob, COALESCE(cc.n, 0) AS oc,
             (COALESCE(bc.n, 0) + COALESCE(cc.n, 0)) * nb / CAST(nb + nc AS DOUBLE) AS eb,
             (COALESCE(bc.n, 0) + COALESCE(cc.n, 0)) * nc / CAST(nb + nc AS DOUBLE) AS ec
      FROM cats LEFT JOIN bc USING (event_type) LEFT JOIN cc USING (event_type), tot
    )
    SELECT ROUND(SUM(CASE WHEN eb > 0 THEN (ob - eb) * (ob - eb) / eb ELSE 0 END
                   + CASE WHEN ec > 0 THEN (oc - ec) * (oc - ec) / ec ELSE 0 END), 6) AS chi2,
           CAST((SELECT COUNT(*) - 1 FROM cats) AS BIGINT) AS dof
    FROM f
    """,
)
def q_chi_square_drift_event_type(spark, sf_dir):
    """Categorical χ² homogeneity (drift/statistical.py:312): per-category
    counts per side, driver χ²."""
    from truthound_spark.drift.detectors import chi_square_drift

    df = t(spark, sf_dir, "events")
    baseline = df.filter(F.col("event_id") % 2 == 0)
    current = df.filter(F.col("event_id") % 2 == 1)
    r = chi_square_drift(baseline, current, "event_type")
    return _scalar_df(spark, chi2=round(r.statistic, 6), dof=int(r.details["dof"]))


@register(
    "mean_variance_drift_events",
    f"""
    WITH b AS ({_DRIFT_BASE}), c AS ({_DRIFT_CURR})
    SELECT
      ROUND(ABS((SELECT AVG(value) FROM c) - (SELECT AVG(value) FROM b))
            / (ABS((SELECT AVG(value) FROM b)) + 1e-10), 6) AS mean_rel_drift,
      ROUND(ABS((SELECT VAR_SAMP(value) FROM c) - (SELECT VAR_SAMP(value) FROM b))
            / (ABS((SELECT VAR_SAMP(value) FROM b)) + 1e-10), 6) AS var_rel_drift
    """,
)
def q_mean_variance_drift_events(spark, sf_dir):
    """MeanDrift / VarianceDrift relative change (drift/numeric.py:17,117)."""
    from truthound_spark.drift.detectors import mean_drift, variance_drift

    baseline, current = _drift_frames(spark, sf_dir)
    m = mean_drift(baseline, current, "value")
    v = variance_drift(baseline, current, "value")
    return _scalar_df(
        spark,
        mean_rel_drift=round(m.statistic, 6),
        var_rel_drift=round(v.statistic, 6),
    )


@register(
    "js_kl_divergence_events",
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
    ),
    f AS (
      SELECT COALESCE(bh.n, 0) / CAST((SELECT SUM(n) FROM bh) AS DOUBLE) AS p,
             COALESCE(ch.n, 0) / CAST((SELECT SUM(n) FROM ch) AS DOUBLE) AS q
      FROM bins LEFT JOIN bh ON bins.i = bh.bin LEFT JOIN ch ON bins.i = ch.bin
    )
    SELECT
      ROUND(SUM(0.5 * p * LN((p + 1e-10) / ((p + q) / 2 + 1e-10))
              + 0.5 * q * LN((q + 1e-10) / ((p + q) / 2 + 1e-10))), 6) AS js,
      ROUND(SUM(p * LN((p + 1e-10) / (q + 1e-10))), 6) AS kl
    FROM f
    """,
)
def q_js_kl_divergence_events(spark, sf_dir):
    """JS + KL divergence over the shared histogram (detectors.py:384,503)."""
    from truthound_spark.drift.detectors import js_divergence, kl_divergence

    baseline, current = _drift_frames(spark, sf_dir)
    js = js_divergence(baseline, current, "value", bins=10)
    kl = kl_divergence(baseline, current, "value", bins=10)
    return _scalar_df(spark, js=round(js.statistic, 6), kl=round(kl.statistic, 6))


@register(
    "wasserstein_drift_events",
    f"""
    WITH b AS ({_DRIFT_BASE}), c AS ({_DRIFT_CURR}),
    r AS (SELECT LEAST((SELECT MIN(value) FROM b), (SELECT MIN(value) FROM c)) AS lo,
                 GREATEST((SELECT MAX(value) FROM b), (SELECT MAX(value) FROM c)) AS hi),
    bins AS (SELECT i FROM generate_series(0, 99) AS gs(i)),
    bh AS (
      SELECT LEAST(GREATEST(CAST(FLOOR((value - lo) / ((hi - lo) / 100)) AS INT), 0), 99) AS bin, COUNT(*) AS n
      FROM b, r GROUP BY 1
    ),
    ch AS (
      SELECT LEAST(GREATEST(CAST(FLOOR((value - lo) / ((hi - lo) / 100)) AS INT), 0), 99) AS bin, COUNT(*) AS n
      FROM c, r GROUP BY 1
    ),
    f AS (
      SELECT bins.i,
             SUM(COALESCE(bh.n, 0) / CAST((SELECT SUM(n) FROM bh) AS DOUBLE)) OVER (ORDER BY bins.i) AS cp,
             SUM(COALESCE(ch.n, 0) / CAST((SELECT SUM(n) FROM ch) AS DOUBLE)) OVER (ORDER BY bins.i) AS cq
      FROM bins LEFT JOIN bh ON bins.i = bh.bin LEFT JOIN ch ON bins.i = ch.bin
    ),
    w AS (SELECT SUM(ABS(cp - cq)) * ((SELECT (hi - lo) FROM r) / 100) AS emd FROM f)
    SELECT ROUND(emd, 6) AS wasserstein FROM w
    """,
)
def q_wasserstein_drift_events(spark, sf_dir):
    """Wasserstein EMD via histogram CDF difference (detectors.py:605)."""
    from truthound_spark.drift.detectors import wasserstein

    baseline, current = _drift_frames(spark, sf_dir)
    r = wasserstein(baseline, current, "value", bins=100)
    return _scalar_df(spark, wasserstein=round(r.statistic, 6))


# ===========================================================================
# §2.9 profiling: entropy / cardinality / distribution shape
# ===========================================================================


@register(
    "entropy_cardinality_events",
    """
    WITH f AS (SELECT event_type, COUNT(*) AS n FROM events GROUP BY 1),
    tot AS (SELECT SUM(n) AS total FROM f)
    SELECT
      ROUND(-SUM((n / CAST(total AS DOUBLE)) * LN(n / CAST(total AS DOUBLE))), 6) AS entropy_nats,
      CAST((SELECT COUNT(*) FROM f) AS BIGINT) AS cardinality,
      ROUND(MAX(n) / CAST(total AS DOUBLE), 6) AS top_value_ratio
    FROM f, tot GROUP BY total
    """,
)
def q_entropy_cardinality_events(spark, sf_dir):
    """Entropy / Cardinality / ValueFrequency (profiling/{entropy,cardinality,
    frequency}.py): distributed Σ p·ln p over groupBy counts."""
    df = t(spark, sf_dir, "events")
    freq = df.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    tot = freq.agg(F.sum("n").alias("total"))
    joined = freq.crossJoin(F.broadcast(tot))
    p = F.col("n") / F.col("total")
    return joined.agg(
        F.round(-F.sum(p * F.log(p)), 6).alias("entropy_nats"),
        F.count(F.lit(1)).cast("long").alias("cardinality"),
        F.round(F.max("n") / F.max("total"), 6).alias("top_value_ratio"),
    )


@register(
    "distribution_shape_events_value",
    """
    WITH s AS (SELECT AVG(value) AS mu FROM events),
    m AS (
      SELECT AVG(POW(value - mu, 2)) AS m2, AVG(POW(value - mu, 3)) AS m3,
             AVG(POW(value - mu, 4)) AS m4
      FROM events, s WHERE value IS NOT NULL
    )
    SELECT ROUND(m3 / POW(m2, 1.5), 4) AS skewness,
           ROUND(m4 / (m2 * m2) - 3, 4) AS kurtosis
    FROM m
    """,
)
def q_distribution_shape_events_value(spark, sf_dir):
    """DistributionShape skew/kurtosis (profiling/frequency.py:279):
    Spark's population skewness/kurtosis formulas."""
    df = t(spark, sf_dir, "events")
    return df.agg(
        F.round(F.skewness("value"), 4).alias("skewness"),
        F.round(F.kurtosis("value"), 4).alias("kurtosis"),
    )


@register(
    "geo_range_bbox",
    f"""
    WITH g AS ({_GEO_SQL_BASE})
    SELECT
      CAST(SUM(CASE WHEN (lat < -90 OR lat > 90) AND lat IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS bad_lat,
      CAST(SUM(CASE WHEN (lon < -180 OR lon > 180) AND lon IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS bad_lon,
      CAST(SUM(CASE WHEN lat = 0 AND lon = 0 THEN 1 ELSE 0 END) AS BIGINT) AS null_island,
      CAST(SUM(CASE WHEN lat BETWEEN 0 AND 45 AND lon BETWEEN 0 AND 90 THEN 1 ELSE 0 END) AS BIGINT) AS in_bbox
    FROM g
    """,
)
def q_geo_range_bbox(spark, sf_dir):
    """Latitude/Longitude/NotNullIsland/GeoBoundingBox range checks
    (geospatial/{coordinate,boundary}.py)."""
    g = _geo_df(spark, sf_dir)
    lat, lon = F.col("lat"), F.col("lon")
    return g.agg(
        F.sum(F.when(((lat < -90) | (lat > 90)) & lat.isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("bad_lat"),
        F.sum(F.when(((lon < -180) | (lon > 180)) & lon.isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("bad_lon"),
        F.sum(F.when((lat == 0) & (lon == 0), 1).otherwise(0)).cast("long").alias("null_island"),
        F.sum(F.when(lat.between(0, 45) & lon.between(0, 90), 1).otherwise(0))
        .cast("long")
        .alias("in_bbox"),
    )


@register(
    "geo_haversine_distance",
    f"""
    WITH g AS ({_GEO_SQL_BASE}),
    d AS (
      SELECT 6371.0 * 2 * ASIN(SQRT(
               POW(SIN(RADIANS(lat - 37.5) / 2), 2)
               + COS(RADIANS(37.5)) * COS(RADIANS(lat)) * POW(SIN(RADIANS(lon - 127.0) / 2), 2)
             )) AS km
      FROM g
    )
    SELECT CAST(SUM(CASE WHEN km <= 5000 THEN 1 ELSE 0 END) AS BIGINT) AS within_5000km,
           ROUND(AVG(km), 0) AS avg_km
    FROM d
    """,
)
def q_geo_haversine_distance(spark, sf_dir):
    """GeoDistanceFromPoint haversine column math (geospatial/distance.py:20;
    engine geospatial.haversine_km)."""
    from truthound_spark.validators.geospatial import haversine_km

    g = _geo_df(spark, sf_dir)
    km = haversine_km(F.col("lat"), F.col("lon"), F.lit(37.5), F.lit(127.0))
    d = g.select(km.alias("km"))
    return d.agg(
        F.sum(F.when(F.col("km") <= 5000, 1).otherwise(0)).cast("long").alias("within_5000km"),
        F.round(F.avg("km"), 0).alias("avg_km"),
    )


@register(
    "text_token_counts_documents",
    f"""
    SELECT doc_id,
      CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS INT) AS n_words,
      CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS INT) AS n_tokens_bpe,
      CAST(length(text) AS INT) AS n_chars_obs
    FROM documents ORDER BY doc_id
    """,
)
def q_text_token_counts_documents(spark, sf_dir):
    """Token counting: whitespace + BPE-ish regex (pipeline/text.py:30,36) —
    pure codegen'd column math, zero UDFs."""
    from truthound_spark.pipeline.text import bpe_ish_token_count, whitespace_token_count

    df = t(spark, sf_dir, "documents")
    return df.select(
        "doc_id",
        whitespace_token_count(F.col("text")).cast("int").alias("n_words"),
        bpe_ish_token_count(F.col("text")).cast("int").alias("n_tokens_bpe"),
        F.length("text").cast("int").alias("n_chars_obs"),
    ).orderBy("doc_id")


@register(
    "text_quality_documents",
    """
    WITH w AS (
      SELECT doc_id, text, string_split(CASE WHEN LEN(TRIM(text)) = 0 THEN '' ELSE """
    + "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g'))"
    + """ END, ' ') AS words
      FROM documents
    )
    SELECT doc_id,
      ROUND(CASE WHEN len(words) > 0 THEN
        len(list_filter(words, x -> list_contains(['the','a','of','and','to','in','is','that','it','for'], x)))
        / CAST(len(words) AS DOUBLE) ELSE 0.0 END, 6) AS stopword_ratio,
      ROUND(CASE WHEN length(text) > 0 THEN
        len(regexp_extract_all(text, '[^\\x{30}-\\x{39}a-zA-Z_\\s]')) / CAST(length(text) AS DOUBLE)
        ELSE 0.0 END, 6) AS punct_ratio,
      ROUND(CASE WHEN len(words) > 0 THEN len(list_distinct(words)) / CAST(len(words) AS DOUBLE)
            ELSE 0.0 END, 6) AS uniq_word_ratio
    FROM w ORDER BY doc_id
    """,
)
def q_text_quality_documents(spark, sf_dir):
    """Quality features (pipeline/text.py quality_features): stopword /
    punctuation / lexical-diversity ratios per document."""
    from truthound_spark.pipeline.text import quality_features

    df = t(spark, sf_dir, "documents")
    feats = quality_features(df, "text")
    return feats.select(
        "doc_id",
        F.round("stopword_ratio", 6).alias("stopword_ratio"),
        F.round("punct_ratio", 6).alias("punct_ratio"),
        F.round("uniq_word_ratio", 6).alias("uniq_word_ratio"),
    ).orderBy("doc_id")


@register(
    "language_id_documents",
    f"""
    WITH w AS (
      SELECT doc_id, list_distinct(string_split({_NORM_SQL.format(c='text')}, ' ')) AS dw
      FROM documents
    ),
    s AS (
      SELECT doc_id,
        len(list_filter(dw, x -> list_contains(['der','die','das','und','ist','von','mit','den','ein','eine'], x))) AS de,
        len(list_filter(dw, x -> list_contains(['the','a','of','and','to','in','is','that','it','for'], x))) AS en,
        len(list_filter(dw, x -> list_contains(['el','la','de','que','y','en','un','una','los','por'], x))) AS es,
        len(list_filter(dw, x -> list_contains(['le','la','de','et','les','des','un','une','du','que'], x))) AS fr
      FROM w
    ),
    p AS (
      SELECT CASE WHEN GREATEST(de, en, es, fr) = 0 THEN 'unknown'
                  WHEN de >= en AND de >= es AND de >= fr THEN 'de'
                  WHEN en >= es AND en >= fr THEN 'en'
                  WHEN es >= fr THEN 'es'
                  ELSE 'fr' END AS predicted_lang
      FROM s
    )
    SELECT predicted_lang, CAST(COUNT(*) AS BIGINT) AS n
    FROM p GROUP BY 1 ORDER BY 1
    """,
)
def q_language_id_documents(spark, sf_dir):
    """Language-ID n-gram/stopword heuristic (pipeline/text.py language_id):
    argmax stopword overlap, earliest-language tie-break."""
    from truthound_spark.pipeline.text import detect_languages

    df = t(spark, sf_dir, "documents")
    return (
        detect_languages(df, "text")
        .groupBy("predicted_lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy("predicted_lang")
    )


@register(
    "fingerprint_documents",
    f"""
    SELECT doc_id, md5({_NORM_SQL.format(c='text')}) AS fingerprint
    FROM documents WHERE doc_id < 25 ORDER BY doc_id
    """,
)
def q_fingerprint_documents(spark, sf_dir):
    """Document fingerprinting (pipeline/text.py fingerprint_documents):
    md5 of normalized content — deterministic rolling-hash surface."""
    from truthound_spark.pipeline.text import fingerprint_documents

    df = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 25)
    return fingerprint_documents(df, "text").select("doc_id", "fingerprint").orderBy("doc_id")
