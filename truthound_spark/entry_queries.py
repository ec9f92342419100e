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


# ===========================================================================
# Training-data pipeline: text quality / language ID / fingerprints
# ===========================================================================

#: SQL mirror of dedup.normalized_text (lower, strip non-alnum, collapse ws)
_NORM_SQL = "trim(regexp_replace(regexp_replace(lower({c}), '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g'))"


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


#: SQL computing word 3-gram shingle lists per doc, mirroring
#: dedup.word_shingles (slice semantics incl. short-doc edge case).
_SHINGLES_SQL = f"""
      SELECT doc_id AS id,
             list_distinct([array_to_string(list_slice(words, i, i + 2), ' ')
                            FOR i IN range(1, GREATEST(len(words) - 2, 1) + 1)]) AS sh
      FROM (SELECT doc_id, string_split({_NORM_SQL.format(c='text')}, ' ') AS words FROM documents)
"""


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


# ===========================================================================
# batch 9: one-sample distribution, multi-table orphans, pattern profile,
# charset/ipv6/regex-list/pair-set derived checks
# ===========================================================================


@register(
    "one_sample_distribution_events",
    """
    WITH f AS (SELECT event_type, COUNT(*) AS n FROM events GROUP BY 1),
    tot AS (SELECT SUM(n) AS total FROM f)
    SELECT ROUND(SUM(POW(n - total * 0.2, 2) / (total * 0.2)), 6) AS chi2_vs_uniform
    FROM f, tot GROUP BY total
    """,
)
def q_one_sample_distribution_events(spark, sf_dir):
    """One-sample χ² vs an expected uniform distribution over the 5 event
    types (reference distribution/distribution.py:17)."""
    df = t(spark, sf_dir, "events")
    freq = df.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    tot = freq.agg(F.sum("n").alias("total"))
    joined = freq.crossJoin(F.broadcast(tot))
    expected = F.col("total") * 0.2
    return joined.agg(
        F.round(F.sum(F.pow(F.col("n") - expected, 2) / expected), 6).alias(
            "chi2_vs_uniform"
        )
    )


@register(
    "multi_table_orphans",
    """
    SELECT
      (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l ANTI JOIN part p ON l.l_partkey = p.p_partkey) AS part_orphans,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l ANTI JOIN supplier s ON l.l_suppkey = s.s_suppkey) AS supplier_orphans
    """,
)
def q_multi_table_orphans(spark, sf_dir):
    """MultiTableOrphan: one child vs several parents (referential/
    orphan.py:191) — engine validator, per-relation anti-joins."""
    from truthound_spark.validators.referential import MultiTableOrphanValidator

    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    s = t(spark, sf_dir, "supplier")
    v = MultiTableOrphanValidator(
        [(p, "l_partkey", "p_partkey"), (s, "l_suppkey", "s_suppkey")]
    )
    issues = {i.column: i.count for i in v.validate(li)}
    return _scalar_df(
        spark,
        part_orphans=int(issues.get("l_partkey", 0)),
        supplier_orphans=int(issues.get("l_suppkey", 0)),
    )


@register(
    "pattern_profile_customer",
    """
    SELECT
      ROUND(SUM(CASE WHEN regexp_matches(c_mktsegment, '^[A-Za-z]+$') THEN 1 ELSE 0 END)
            / CAST(COUNT(c_mktsegment) AS DOUBLE), 6) AS segment_alpha_ratio,
      ROUND(SUM(CASE WHEN regexp_matches(c_name, '^[A-Za-z0-9]+$') THEN 1 ELSE 0 END)
            / CAST(COUNT(c_name) AS DOUBLE), 6) AS name_alnum_ratio,
      ROUND(SUM(CASE WHEN regexp_matches(c_name, '^-?[0-9]+(\\.[0-9]+)?$') THEN 1 ELSE 0 END)
            / CAST(COUNT(c_name) AS DOUBLE), 6) AS name_numeric_ratio
    FROM customer
    """,
)
def q_pattern_profile_customer(spark, sf_dir):
    """Profiler pattern analyzer ratios (reference profiler/
    column_profiler.py:366) — fused rlike counters via pattern_profile."""
    from truthound_spark.profiler.table_profiler import pattern_profile

    df = t(spark, sf_dir, "customer")
    prof = pattern_profile(df, ["c_mktsegment", "c_name"])
    return _scalar_df(
        spark,
        segment_alpha_ratio=prof["c_mktsegment"]["ratios"]["alpha"],
        name_alnum_ratio=prof["c_name"]["ratios"]["alphanumeric"],
        name_numeric_ratio=prof["c_name"]["ratios"]["numeric"],
    )


@register(
    "charset_ipv6_derived",
    """
    WITH d AS (
      SELECT
        CASE WHEN c_custkey % 88 = 0 THEN 'has space!' ELSE 'token' || CAST(c_custkey AS VARCHAR) END AS tok,
        CASE WHEN c_custkey % 90 = 0 THEN 'not:ipv6'
             ELSE lpad(substr(md5(CAST(c_custkey AS VARCHAR)), 1, 4), 4, '0') || ':' ||
                  substr(md5(CAST(c_custkey AS VARCHAR)), 5, 4) || ':' ||
                  substr(md5(CAST(c_custkey AS VARCHAR)), 9, 4) || ':' ||
                  substr(md5(CAST(c_custkey AS VARCHAR)), 13, 4) || ':' ||
                  substr(md5(CAST(c_custkey AS VARCHAR)), 17, 4) || ':' ||
                  substr(md5(CAST(c_custkey AS VARCHAR)), 21, 4) || ':' ||
                  substr(md5(CAST(c_custkey AS VARCHAR)), 25, 4) || ':' ||
                  substr(md5(CAST(c_custkey AS VARCHAR)), 29, 4) END AS ip6
      FROM customer
    )
    SELECT
      CAST(SUM(CASE WHEN NOT regexp_matches(tok, '^[A-Za-z0-9]*$') THEN 1 ELSE 0 END) AS BIGINT) AS non_alphanumeric,
      CAST(SUM(CASE WHEN NOT regexp_matches(ip6, '^([0-9a-fA-F]{1,4}:){7}[0-9a-fA-F]{1,4}$') THEN 1 ELSE 0 END) AS BIGINT) AS invalid_ipv6
    FROM d
    """,
)
def q_charset_ipv6_derived(spark, sf_dir):
    """Alphanumeric charset + IPv6 format validators (string/charset.py:17,
    format.py:400) over derived columns."""
    from truthound_spark.validators.string import AlphanumericValidator, Ipv6Validator

    k = F.col("c_custkey")
    m = F.md5(k.cast("string"))
    df = t(spark, sf_dir, "customer").select(
        F.when(k % 88 == 0, F.lit("has space!"))
        .otherwise(F.concat(F.lit("token"), k.cast("string")))
        .alias("tok"),
        F.when(k % 90 == 0, F.lit("not:ipv6"))
        .otherwise(
            F.concat_ws(
                ":",
                *[F.substring(m, 1 + 4 * i, 4) for i in range(8)],
            )
        )
        .alias("ip6"),
    )
    return fused_counts(
        df,
        [
            (AlphanumericValidator("tok"), ["non_alphanumeric"]),
            (Ipv6Validator("ip6"), ["invalid_ipv6"]),
        ],
    )


@register(
    "regex_list_pair_set_derived",
    """
    WITH d AS (
      SELECT CASE WHEN c_custkey % 3 = 0 THEN 'alpha' WHEN c_custkey % 3 = 1 THEN 'beta' ELSE 'gamma' END AS grp,
             CASE WHEN c_custkey % 2 = 0 THEN 'even' ELSE 'odd' END AS par,
             'doc_' || CAST(c_custkey AS VARCHAR) ||
             CASE WHEN c_custkey % 77 = 0 THEN '_secret' ELSE '' END AS label
      FROM customer
    )
    SELECT
      CAST(SUM(CASE WHEN regexp_matches(label, 'secret') OR regexp_matches(label, 'password')
                    THEN 1 ELSE 0 END) AS BIGINT) AS forbidden_matches,
      CAST(SUM(CASE WHEN NOT ((grp = 'alpha' AND par = 'odd') OR (grp = 'beta' AND par = 'even')
                           OR (grp = 'gamma' AND par = 'even') OR (grp = 'gamma' AND par = 'odd'))
                    THEN 1 ELSE 0 END) AS BIGINT) AS pair_violations
    FROM d
    """,
)
def q_regex_list_pair_set_derived(spark, sf_dir):
    """NotMatchRegexList + ColumnPairInSet (string/regex_extended.py:312,
    schema/column_pair_set.py:13) over derived columns."""
    from truthound_spark.validators.distribution import ColumnPairInSetValidator
    from truthound_spark.validators.string import NotMatchRegexListValidator

    k = F.col("c_custkey")
    df = t(spark, sf_dir, "customer").select(
        F.when(k % 3 == 0, F.lit("alpha"))
        .when(k % 3 == 1, F.lit("beta"))
        .otherwise(F.lit("gamma"))
        .alias("grp"),
        F.when(k % 2 == 0, F.lit("even")).otherwise(F.lit("odd")).alias("par"),
        F.concat(
            F.lit("doc_"),
            k.cast("string"),
            F.when(k % 77 == 0, F.lit("_secret")).otherwise(F.lit("")),
        ).alias("label"),
    )
    return fused_counts(
        df,
        [
            (NotMatchRegexListValidator("label", ["secret", "password"]), ["forbidden_matches"]),
            (
                ColumnPairInSetValidator(
                    "grp",
                    "par",
                    [("alpha", "odd"), ("beta", "even"), ("gamma", "even"), ("gamma", "odd")],
                ),
                ["pair_violations"],
            ),
        ],
    )


@register(
    "timeseries_completeness_events",
    f"""
    WITH {EV}
    SELECT
      CAST(COUNT(DISTINCT date_trunc('hour', ts)) AS BIGINT) AS present_buckets,
      CAST((epoch(date_trunc('hour', MAX(ts))) - epoch(date_trunc('hour', MIN(ts)))) / 3600 + 1 AS BIGINT) AS expected_buckets
    FROM ev
    """,
)
def q_timeseries_completeness_events(spark, sf_dir):
    """TimeSeriesCompleteness bucket coverage (timeseries/completeness.py:24):
    distinct hour buckets vs the arithmetic expectation between min/max."""
    df = t(spark, sf_dir, "events")
    return df.agg(
        F.countDistinct(F.date_trunc("hour", F.col("ts"))).alias("present_buckets"),
        (
            (
                F.unix_timestamp(F.date_trunc("hour", F.max("ts")))
                - F.unix_timestamp(F.date_trunc("hour", F.min("ts")))
            )
            / 3600
            + 1
        )
        .cast("long")
        .alias("expected_buckets"),
    )


@register(
    "flagship_check_lineitem",
    """
    SELECT
      CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_values,
      CAST(COUNT(l_orderkey) - COUNT(DISTINCT l_orderkey) AS BIGINT) AS duplicate_values,
      CAST(SUM(CASE WHEN (l_quantity < 1 OR l_quantity > 30) AND l_quantity IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS out_of_range,
      CAST(SUM(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R') AND l_returnflag IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS value_not_in_set
    FROM lineitem
    """,
)
def q_flagship_check_lineitem(spark, sf_dir):
    """The MAIN API end-to-end: th.check() with an explicit suite; issue
    counts from the ValidationRunResult are oracle-verified — the check
    lifecycle (suite → fused executor → result) is itself under the gate."""
    from truthound_spark import api
    from truthound_spark.validators.completeness import NullValidator
    from truthound_spark.validators.distribution import InSetValidator, RangeValidator
    from truthound_spark.validators.uniqueness import UniqueValidator

    df = t(spark, sf_dir, "lineitem")
    result = api.check(
        df,
        validators=[
            NullValidator(columns=["l_quantity"]),
            UniqueValidator(columns=["l_orderkey"]),
            RangeValidator("l_quantity", 1, 30),
            InSetValidator("l_returnflag", ["A", "N", "R"]),
        ],
    )
    counts = {"null_values": 0, "duplicate_values": 0, "out_of_range": 0, "value_not_in_set": 0}
    for issue in result.issues:
        if issue.issue_type in counts:
            counts[issue.issue_type] += issue.count
    return _scalar_df(spark, **{k: int(v) for k, v in counts.items()})


@register(
    "information_gain_events",
    """
    WITH j AS (
      SELECT CASE WHEN value > 245 THEN 'hi' ELSE 'lo' END AS feat, event_type AS tgt, COUNT(*) AS n
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    tot AS (SELECT CAST(SUM(n) AS DOUBLE) AS total FROM j),
    ht AS (
      SELECT -SUM(p * LN(p)) AS h FROM (
        SELECT SUM(n) / (SELECT total FROM tot) AS p FROM j GROUP BY tgt)
    ),
    perf AS (SELECT feat, SUM(n) AS nf FROM j GROUP BY feat),
    hcond AS (
      SELECT SUM((nf / (SELECT total FROM tot)) * hf) AS h
      FROM (
        SELECT j.feat, perf.nf,
               -SUM((j.n / CAST(perf.nf AS DOUBLE)) * LN(j.n / CAST(perf.nf AS DOUBLE))) AS hf
        FROM j JOIN perf ON j.feat = perf.feat
        GROUP BY j.feat, perf.nf
      )
    )
    SELECT ROUND((SELECT h FROM ht) - (SELECT h FROM hcond), 6) AS information_gain
    """,
)
def q_information_gain_events(spark, sf_dir):
    """InformationGain of a derived binary feature vs event_type
    (profiling/entropy.py:205) — joint-count entropy terms."""
    from truthound_spark.validators.profiling import InformationGainValidator

    df = t(spark, sf_dir, "events").filter(F.col("value").isNotNull()).select(
        F.when(F.col("value") > 245, F.lit("hi")).otherwise(F.lit("lo")).alias("feat"),
        F.col("event_type").alias("tgt"),
    )
    ig = InformationGainValidator("feat", "tgt").information_gain(df)
    return _scalar_df(spark, information_gain=round(ig, 6))


@register(
    "cramer_von_mises_events",
    f"""
    WITH b AS ({_DRIFT_BASE}), c AS ({_DRIFT_CURR}),
    pooled AS (
      SELECT value AS v, 0 AS side FROM b UNION ALL SELECT value, 1 FROM c
    ),
    grouped AS (
      SELECT v,
             SUM(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS gb,
             SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS gc
      FROM pooled GROUP BY v
    ),
    cum AS (
      SELECT gb, gc,
             SUM(gb) OVER (ORDER BY v) AS cum_b,
             SUM(gc) OVER (ORDER BY v) AS cum_c
      FROM grouped
    ),
    s AS (
      SELECT SUM(gb) AS n, SUM(gc) AS m,
             SUM((gb + gc) * POW(cum_b, 2)) AS sbb,
             SUM((gb + gc) * cum_b * cum_c) AS sbc,
             SUM((gb + gc) * POW(cum_c, 2)) AS scc
      FROM cum
    )
    SELECT ROUND((n * m) / POW(n + m, 2)
                 * (sbb / (n * n) - 2.0 * sbc / (n * m) + scc / (m * m)),
                 6) AS cvm
    FROM s
    """,
)
def q_cramer_von_mises_events(spark, sf_dir):
    """Two-sample Cramér–von Mises criterion (reference detectors.py:709):
    ECDF-form T (deterministic and exactly 0 on identical samples under
    ties) from one cumulative sort-window over per-value group counts."""
    from truthound_spark.drift.detectors import cramer_von_mises

    baseline, current = _drift_frames(spark, sf_dir)
    r = cramer_von_mises(baseline, current, "value")
    return _scalar_df(spark, cvm=round(r.statistic, 6))


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


@register(
    "table_shape_lineitem",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(11 AS BIGINT) AS n_cols,
           COUNT(*) >= 1000 AS rows_in_range
    FROM lineitem
    """,
)
def q_table_shape_lineitem(spark, sf_dir):
    """TableRowCountRange + TableDimensions (reference table/row_count.py:17,
    size.py:190): fused count agg + driver-side schema width."""
    from truthound_spark.validators.table import (
        TableDimensionsValidator,
        TableRowCountRangeValidator,
    )

    df = t(spark, sf_dir, "lineitem")
    v = TableRowCountRangeValidator(min_rows=1000)
    ok = not v.validate(df)
    ncols = len(df.columns)
    assert TableDimensionsValidator(max_cols=20).validate(df) == []
    return judge_counts(df, v, {"n": "n_rows"}).select(
        F.col("n_rows"),
        F.lit(ncols).cast("long").alias("n_cols"),
        F.lit(ok).alias("rows_in_range"),
    )


@register(
    "column_product_derived",
    """
    WITH tt AS (
      SELECT l_quantity AS a, l_extendedprice AS b,
             l_quantity * l_extendedprice
               + CASE WHEN l_linenumber = 1 THEN 1 ELSE 0 END AS prod
      FROM lineitem
    )
    SELECT CAST(SUM(CASE WHEN abs(a * b - prod) > 1e-6 THEN 1 ELSE 0 END) AS BIGINT)
             AS product_violations
    FROM tt
    """,
)
def q_column_product_derived(spark, sf_dir):
    """ColumnProductValidator (reference multi_column/arithmetic.py:67):
    perturbed product column — violations = rows with l_linenumber=1."""
    from truthound_spark.validators.multi_column import ColumnProductValidator

    df = t(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").alias("a"),
        F.col("l_extendedprice").alias("b"),
        (
            F.col("l_quantity") * F.col("l_extendedprice")
            + F.when(F.col("l_linenumber") == 1, 1).otherwise(0)
        ).alias("prod"),
    )
    return fused_counts(
        df, [(ColumnProductValidator(["a", "b"], result_column="prod", tolerance=1e-6),
              ["product_violations"])]
    )


@register(
    "mutual_exclusivity_orders",
    """
    WITH tt AS (
      SELECT CASE WHEN o_orderstatus = 'O' THEN 1 END AS is_open,
             CASE WHEN o_orderstatus = 'F' THEN 1 END AS is_filled
      FROM orders
    )
    SELECT CAST(SUM(CASE WHEN is_open IS NULL AND is_filled IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS exclusivity_violations
    FROM tt
    """,
)
def q_mutual_exclusivity_orders(spark, sf_dir):
    """ColumnMutualExclusivityValidator (reference consistency.py:105):
    open/filled flags are exclusive; 'P' orders have neither → violations."""
    from truthound_spark.validators.multi_column import ColumnMutualExclusivityValidator

    df = t(spark, sf_dir, "orders").select(
        F.when(F.col("o_orderstatus") == "O", 1).alias("is_open"),
        F.when(F.col("o_orderstatus") == "F", 1).alias("is_filled"),
    )
    return fused_counts(
        df,
        [(ColumnMutualExclusivityValidator(["is_open", "is_filled"]),
          ["exclusivity_violations"])],
    )


@register(
    "implication_orders",
    """
    SELECT CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' AND o_orderstatus <> 'F'
                         THEN 1 ELSE 0 END) AS BIGINT) AS implication_violations,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' AND o_orderpriority IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS dependency_violations
    FROM orders
    """,
)
def q_implication_orders(spark, sf_dir):
    """ColumnImplication + ColumnDependency (reference consistency.py:198,264)
    fused into one agg."""
    from truthound_spark.validators.multi_column import (
        ColumnDependencyValidator,
        ColumnImplicationValidator,
    )

    df = t(spark, sf_dir, "orders")
    return fused_counts(
        df,
        [
            (ColumnImplicationValidator("o_orderpriority", "1-URGENT", "o_orderstatus", "F"),
             ["implication_violations"]),
            (ColumnDependencyValidator("o_orderstatus", "O", ["o_orderpriority"]),
             ["dependency_violations"]),
        ],
    )


@register(
    "privacy_phone_detection_derived",
    """
    WITH tt AS (
      SELECT CASE WHEN c_custkey % 7 = 0 THEN 'not-a-phone'
             ELSE '010-' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
                  || '-' || lpad(CAST((c_custkey * 31) % 10000 AS VARCHAR), 4, '0')
             END AS phone
      FROM customer
    )
    SELECT CAST(SUM(CASE WHEN regexp_matches(phone, '^\\+?[0-9][0-9\\s().-]{6,18}$')
                         THEN 1 ELSE 0 END) AS BIGINT) AS phone_matches,
           CAST(COUNT(phone) AS BIGINT) AS scanned,
           TRUE AS flagged
    FROM tt
    """,
)
def q_privacy_phone_detection(spark, sf_dir):
    """GDPRComplianceValidator (reference privacy/gdpr.py:372): fused rlike
    aggregate over a derived phone column; 'flagged' asserts the validator's
    verdict on both the pattern ratio and the column-name hint."""
    from truthound_spark.validators.privacy import GDPRComplianceValidator

    df = t(spark, sf_dir, "customer").select(
        F.when(F.col("c_custkey") % 7 == 0, F.lit("not-a-phone"))
        .otherwise(
            F.concat(
                F.lit("010-"),
                F.lpad((F.col("c_custkey") % 10000).cast("string"), 4, "0"),
                F.lit("-"),
                F.lpad(((F.col("c_custkey") * 31) % 10000).cast("string"), 4, "0"),
            )
        )
        .alias("phone")
    )
    issues = GDPRComplianceValidator().validate(df)
    flagged = any(i.column == "phone" for i in issues)
    spec = GDPRComplianceValidator().specs(df)[0]
    return df.agg(
        spec.extra_exprs["phone"].cast("long").alias("phone_matches"),
        spec.extra_exprs["nn"].cast("long").alias("scanned"),
    ).select("phone_matches", "scanned", F.lit(flagged).alias("flagged"))


@register(
    "table_freshness_events",
    f"""
    WITH {EV}
    SELECT strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS max_ts,
           MAX(ts) >= TIMESTAMP '2024-02-15 00:00:00' - INTERVAL 30 DAY AS is_fresh
    FROM ev
    """,
)
def q_table_freshness_events(spark, sf_dir):
    """TableFreshnessValidator (reference table/freshness.py:18): single
    max() aggregate judged against a fixed reference time."""
    from datetime import datetime

    from truthound_spark.validators.table import TableFreshnessValidator

    df = load_events(spark, sf_dir)
    ref = datetime(2024, 2, 15)
    fresh = not TableFreshnessValidator(
        "ts", max_age_days=30, reference_time=ref
    ).validate(df)
    return df.agg(
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("max_ts"),
        F.lit(fresh).alias("is_fresh"),
    )


@register(
    "update_frequency_events",
    f"""
    WITH {EV}
    SELECT CAST(COUNT(DISTINCT date_trunc('hour', ts)) AS BIGINT) AS hour_buckets,
           CAST(date_diff('second', MIN(ts), MAX(ts)) // 3600 + 1
                - COUNT(DISTINCT date_trunc('hour', ts)) AS BIGINT) AS gaps
    FROM ev
    """,
)
def q_update_frequency_events(spark, sf_dir):
    """TableUpdateFrequencyValidator (reference table/freshness.py:251):
    distinct hourly buckets vs expected span — one aggregate, no window."""
    from truthound_spark.validators.table import TableUpdateFrequencyValidator

    df = load_events(spark, sf_dir)
    v = TableUpdateFrequencyValidator("ts", "hourly", max_gaps=10**9)
    assert v.validate(df) == []  # routed through the engine path
    return df.agg(
        F.count_distinct(F.date_trunc("hour", F.col("ts"))).cast("long").alias(
            "hour_buckets"
        ),
        (
            (
                F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))
            ) / 3600
        ).cast("long").alias("__span"),
    ).select(
        "hour_buckets",
        (F.col("__span") + 1 - F.col("hour_buckets")).cast("long").alias("gaps"),
    )


@register(
    "korean_business_checksum_derived",
    """
    WITH tt AS (
      SELECT lpad(CAST(c_custkey * 131 % 10000000000 AS VARCHAR), 10, '0') AS bn
      FROM customer
    ),
    d AS (
      SELECT bn,
             CAST(substr(bn, 1, 1) AS INT) AS d1, CAST(substr(bn, 2, 1) AS INT) AS d2,
             CAST(substr(bn, 3, 1) AS INT) AS d3, CAST(substr(bn, 4, 1) AS INT) AS d4,
             CAST(substr(bn, 5, 1) AS INT) AS d5, CAST(substr(bn, 6, 1) AS INT) AS d6,
             CAST(substr(bn, 7, 1) AS INT) AS d7, CAST(substr(bn, 8, 1) AS INT) AS d8,
             CAST(substr(bn, 9, 1) AS INT) AS d9, CAST(substr(bn, 10, 1) AS INT) AS d10
      FROM tt
    ),
    v AS (
      SELECT (10 - ((d1*1 + d2*3 + d3*7 + d4*1 + d5*3 + d6*7 + d7*1 + d8*3 + d9*5
                     + (d9 * 5) // 10) % 10)) % 10 = d10 AS ok
      FROM d
    )
    SELECT CAST(SUM(CASE WHEN ok THEN 0 ELSE 1 END) AS BIGINT) AS invalid_business_numbers,
           CAST(SUM(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS valid_business_numbers
    FROM v
    """,
)
def q_korean_business_checksum(spark, sf_dir):
    """KoreanBusinessNumberValidator (reference localization/korean.py:22):
    weighted mod-10 checksum as a pure SQL expression chain."""
    from truthound_spark.validators.business import KoreanBusinessNumberValidator

    df = t(spark, sf_dir, "customer").select(
        F.lpad(((F.col("c_custkey") * 131) % 10000000000).cast("string"), 10, "0").alias(
            "bn"
        )
    )
    base = fused_counts(
        df, [(KoreanBusinessNumberValidator("bn"), ["invalid_business_numbers"])]
    )
    total = df.count()
    return base.select(
        "invalid_business_numbers",
        (F.lit(total) - F.col("invalid_business_numbers"))
        .cast("long")
        .alias("valid_business_numbers"),
    )


@register(
    "compound_key_lineitem",
    """
    SELECT CAST(COUNT(*) - COUNT(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT)
             AS key_duplicates,
           CAST(COUNT(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT) AS distinct_keys
    FROM lineitem
    """,
)
def q_compound_key_lineitem(spark, sf_dir):
    """CompoundKeyValidator (reference uniqueness/primary_key.py): one fused
    agg of count + count_distinct(struct) + null parts."""
    from truthound_spark.validators.schema_structure import CompoundKeyValidator

    df = t(spark, sf_dir, "lineitem")
    v = CompoundKeyValidator(["l_orderkey", "l_linenumber"])
    spec = v.specs(df)[0]
    return df.agg(
        (spec.extra_exprs["n"] - spec.extra_exprs["distinct"])
        .cast("long")
        .alias("key_duplicates"),
        spec.extra_exprs["distinct"].cast("long").alias("distinct_keys"),
    )


@register(
    "distinct_count_between_orders",
    """
    SELECT CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS status_distinct,
           COUNT(DISTINCT o_orderstatus) BETWEEN 2 AND 5 AS in_range
    FROM orders
    """,
)
def q_distinct_count_between_orders(spark, sf_dir):
    """DistinctCountBetweenValidator (reference uniqueness/distinct_count.py)."""
    from truthound_spark.validators.uniqueness import DistinctCountBetweenValidator

    df = t(spark, sf_dir, "orders")
    v = DistinctCountBetweenValidator("o_orderstatus", 2, 5)
    ok = not v.validate(df)
    return judge_counts(df, v, {"distinct": "status_distinct"}).select(
        "status_distinct", F.lit(ok).alias("in_range")
    )


@register(
    "sign_checks_lineitem",
    """
    SELECT CAST(SUM(CASE WHEN l_extendedprice < 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS negative_price,
           CAST(SUM(CASE WHEN l_discount <= 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS nonpositive_discount
    FROM lineitem
    """,
)
def q_sign_checks_lineitem(spark, sf_dir):
    """NonNegative + Positive (reference distribution/sign.py) fused."""
    from truthound_spark.validators.distribution import (
        NonNegativeValidator,
        PositiveValidator,
    )

    df = t(spark, sf_dir, "lineitem")
    return fused_counts(
        df,
        [
            (NonNegativeValidator("l_extendedprice"), ["negative_price"]),
            (PositiveValidator("l_discount"), ["nonpositive_discount"]),
        ],
    )


@register(
    "geo_distance_derived",
    """
    WITH tt AS (
      SELECT ((user_id % 170) - 85) + 0.25 AS lat1,
             ((event_id % 360) - 180) + 0.25 AS lon1,
             ((user_id % 140) - 70) + 0.5 AS lat2,
             (((event_id * 7) % 360) - 180) + 0.5 AS lon2
      FROM events
    ),
    d AS (
      SELECT 2 * 6371.0088 * asin(sqrt(
               pow(sin(radians(lat2 - lat1) / 2), 2)
               + cos(radians(lat1)) * cos(radians(lat2))
                 * pow(sin(radians(lon2 - lon1) / 2), 2))) AS km
      FROM tt
    )
    SELECT CAST(SUM(CASE WHEN km > 5000 THEN 1 ELSE 0 END) AS BIGINT) AS far_pairs,
           CAST(SUM(CASE WHEN km <= 5000 THEN 1 ELSE 0 END) AS BIGINT) AS near_pairs
    FROM d
    """,
)
def q_geo_distance_derived(spark, sf_dir):
    """GeoDistanceValidator (reference geospatial/distance.py:20): row-pair
    haversine as one codegen'd expression — counts of >5000 km pairs."""
    from truthound_spark.validators.geospatial import GeoDistanceValidator

    ev = t(spark, sf_dir, "events")
    df = ev.select(
        ((F.col("user_id") % 170) - 85 + 0.25).alias("lat1"),
        ((F.col("event_id") % 360) - 180 + 0.25).alias("lon1"),
        ((F.col("user_id") % 140) - 70 + 0.5).alias("lat2"),
        (((F.col("event_id") * 7) % 360) - 180 + 0.5).alias("lon2"),
    )
    base = fused_counts(
        df,
        [(GeoDistanceValidator("lat1", "lon1", "lat2", "lon2", max_distance=5000.0),
          ["far_pairs"])],
    )
    total = df.count()
    return base.select(
        "far_pairs",
        (F.lit(total) - F.col("far_pairs")).cast("long").alias("near_pairs"),
    )


@register(
    "consent_tracking_derived",
    """
    WITH tt AS (
      SELECT CASE WHEN o_custkey % 10 = 0 THEN NULL ELSE 'yes' END AS consent,
             o_orderpriority AS pii
      FROM orders
    )
    SELECT CAST(SUM(CASE WHEN pii IS NOT NULL AND consent IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS consent_violations
    FROM tt
    """,
)
def q_consent_tracking_derived(spark, sf_dir):
    """ConsentValidator (reference privacy/base.py:526): PII rows must carry
    valid consent — one fused conditional-sum."""
    from truthound_spark.validators.privacy import ConsentValidator

    df = t(spark, sf_dir, "orders").select(
        F.when(F.col("o_custkey") % 10 == 0, F.lit(None)).otherwise(F.lit("yes")).alias(
            "consent"
        ),
        F.col("o_orderpriority").alias("pii"),
    )
    return fused_counts(
        df, [(ConsentValidator("consent", ["pii"]), ["consent_violations"])]
    )


@register(
    "data_retention_events",
    f"""
    WITH {EV}
    SELECT CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-03-01 00:00:00' - INTERVAL 45 DAY
                          AND user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS retained_beyond_policy
    FROM ev
    """,
)
def q_data_retention_events(spark, sf_dir):
    """DataRetentionValidator (reference privacy/base.py:417) with a fixed
    reference time: rows with PII older than the retention window."""
    from truthound_spark.validators.privacy import DataRetentionValidator

    df = load_events(spark, sf_dir)
    v = DataRetentionValidator(
        "ts", retention_days=45, pii_columns=["user_id"],
        reference_time="2024-03-01 00:00:00",
    )
    return fused_counts(df, [(v, ["retained_beyond_policy"])])


# ===========================================================================
# wave-4: anomaly statistics, column arithmetic/comparison, special values,
# localization checksums, polygons, cascade, query-surface compares
# ===========================================================================


@register(
    "grubbs_statistic_events",
    f"""
    WITH {EV},
    s AS (SELECT AVG(value) AS mu, STDDEV_SAMP(value) AS sd,
                 CAST(COUNT(value) AS BIGINT) AS n
          FROM ev)
    SELECT ROUND(MAX(ABS(value - mu)) / sd, 4) AS grubbs_g, n
    FROM ev, s WHERE value IS NOT NULL GROUP BY sd, n
    """,
)
def q_grubbs_statistic_events(spark, sf_dir):
    """Grubbs max-deviation statistic (GrubbsTestValidator plan,
    anomaly.py:131; reference anomaly/statistical.py:239) — two fused
    aggregate passes, no row data to the driver."""
    df = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    s = df.agg(
        F.mean("value").alias("mu"),
        F.stddev_samp("value").alias("sd"),
        F.count("value").alias("n"),
    ).collect()[0]
    g = df.agg(F.max(F.abs(F.col("value") - s["mu"])).alias("d")).collect()[0]["d"]
    return _scalar_df(spark, grubbs_g=round(g / s["sd"], 4), n=int(s["n"]))


@register(
    "mahalanobis_count_lineitem",
    """
    WITH s AS (
      SELECT AVG(l_quantity) AS mu_q, AVG(l_extendedprice) AS mu_p,
             COVAR_POP(l_quantity, l_quantity) + 1e-9 AS vqq,
             COVAR_POP(l_extendedprice, l_extendedprice) + 1e-9 AS vpp,
             COVAR_POP(l_quantity, l_extendedprice) AS vqp
      FROM lineitem
    ),
    inv AS (
      SELECT mu_q, mu_p,
             vpp / (vqq * vpp - vqp * vqp) AS ia,
             -vqp / (vqq * vpp - vqp * vqp) AS ib,
             vqq / (vqq * vpp - vqp * vqp) AS id
      FROM s
    )
    SELECT CAST(SUM(CASE WHEN
        (l_quantity - mu_q) * (l_quantity - mu_q) * ia
        + 2 * (l_quantity - mu_q) * (l_extendedprice - mu_p) * ib
        + (l_extendedprice - mu_p) * (l_extendedprice - mu_p) * id > 8.0
        THEN 1 ELSE 0 END) AS BIGINT) AS mahalanobis_anomalies
    FROM lineitem, inv
    WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
    """,
)
def q_mahalanobis_count_lineitem(spark, sf_dir):
    """MahalanobisValidator (anomaly.py:188; reference anomaly/
    multivariate.py:22): covariance from one fused agg, broadcast 2x2
    inverse scored as pure column math. Threshold d+3*sqrt(2d)=8.0."""
    from truthound_spark.validators.anomaly import MahalanobisValidator

    df = t(spark, sf_dir, "lineitem")
    issues = MahalanobisValidator(["l_quantity", "l_extendedprice"]).validate(df)
    return _scalar_df(
        spark, mahalanobis_anomalies=int(issues[0].count) if issues else 0
    )


@register(
    "column_arithmetic_lineitem",
    """
    SELECT
      CAST(SUM(CASE WHEN l_extendedprice - l_quantity < 0
                     AND l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
                    THEN 1 ELSE 0 END) AS BIGINT) AS diff_negative,
      CAST(SUM(CASE WHEN l_extendedprice / nullif(l_quantity, 0) > 2000
                     AND l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
                    THEN 1 ELSE 0 END) AS BIGINT) AS ratio_violations,
      CAST(SUM(CASE WHEN l_discount / nullif(l_tax, 0) * 100.0 > 100
                     AND l_discount IS NOT NULL AND l_tax IS NOT NULL
                    THEN 1 ELSE 0 END) AS BIGINT) AS percentage_violations,
      CAST(SUM(CASE WHEN l_tax + l_discount > 0.1
                     AND l_tax IS NOT NULL AND l_discount IS NOT NULL
                    THEN 1 ELSE 0 END) AS BIGINT) AS sum_violations,
      CAST(SUM(CASE WHEN NOT (l_quantity < l_extendedprice)
                     AND l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
                    THEN 1 ELSE 0 END) AS BIGINT) AS comparison_violations,
      CAST(SUM(CASE WHEN NOT (l_discount <= l_tax AND l_tax < l_quantity)
                     AND l_discount IS NOT NULL AND l_tax IS NOT NULL
                     AND l_quantity IS NOT NULL
                    THEN 1 ELSE 0 END) AS BIGINT) AS chain_violations,
      CAST(SUM(CASE WHEN l_orderkey % 7 = 0
                     AND l_tax IS NOT NULL AND l_discount IS NOT NULL
                    THEN 1 ELSE 0 END) AS BIGINT) AS row_max_violations
    FROM lineitem
    """,
)
def q_column_arithmetic_lineitem(spark, sf_dir):
    """Column arithmetic/comparison family fused into ONE agg:
    ColumnDifference/Ratio/Percentage/MultiColumnSum (multi_column.py:
    352-406; reference multi_column/arithmetic.py), ColumnComparison/
    ChainComparison (multi_column.py:408-477; reference comparison.py),
    ColumnMax with a derived result column (multi_column.py:479)."""
    from truthound_spark.validators.multi_column import (
        ColumnChainComparisonValidator,
        ColumnComparisonValidator,
        ColumnDifferenceValidator,
        ColumnMaxValidator,
        ColumnPercentageValidator,
        ColumnRatioValidator,
        MultiColumnSumValidator,
    )

    df = t(spark, sf_dir, "lineitem").withColumn(
        "max_td",
        F.greatest("l_tax", "l_discount")
        + F.when(F.col("l_orderkey") % 7 == 0, 0.01).otherwise(0.0),
    )
    return fused_counts(
        df,
        [
            (ColumnDifferenceValidator(["l_extendedprice", "l_quantity"], min_value=0), ["diff_negative"]),
            (ColumnRatioValidator(["l_extendedprice", "l_quantity"], max_value=2000), ["ratio_violations"]),
            (ColumnPercentageValidator(["l_discount", "l_tax"], max_value=100), ["percentage_violations"]),
            (MultiColumnSumValidator(["l_tax", "l_discount"], max_value=0.1), ["sum_violations"]),
            (ColumnComparisonValidator(["l_quantity", "l_extendedprice"], "<"), ["comparison_violations"]),
            (
                ColumnChainComparisonValidator(
                    ["l_discount", "l_tax", "l_quantity"], ["<=", "<"]
                ),
                ["chain_violations"],
            ),
            (
                ColumnMaxValidator(["l_tax", "l_discount"], "max_td", tolerance=0.001),
                ["row_max_violations"],
            ),
        ],
    )


@register(
    "multi_column_consistency_orders",
    """
    WITH d AS (
      SELECT o_orderkey, o_custkey, o_orderstatus,
             CASE WHEN o_custkey % 3 = 0 THEN NULL ELSE o_totalprice END AS a,
             CASE WHEN o_custkey % 5 = 0 THEN NULL ELSE o_orderkey END AS b,
             CASE WHEN o_orderkey % 11 = 0 THEN NULL ELSE o_totalprice END AS tp
      FROM orders
    )
    SELECT
      CAST(SUM(CASE WHEN (CASE WHEN a IS NOT NULL THEN 1 ELSE 0 END
                          + CASE WHEN b IS NOT NULL THEN 1 ELSE 0 END) = 1
                    THEN 1 ELSE 0 END) AS BIGINT) AS coexistence_violations,
      CAST(SUM(CASE WHEN o_orderstatus = 'F' AND tp IS NULL
                    THEN 1 ELSE 0 END) AS BIGINT) AS dependency_violations,
      CAST((SELECT COUNT(*) - COUNT(DISTINCT (o_custkey, o_orderstatus)) FROM d)
           AS BIGINT) AS combo_duplicates
    FROM d
    """,
)
def q_multi_column_consistency_orders(spark, sf_dir):
    """ColumnCoexistence + ColumnDependency + MultiColumnUnique fused
    (multi_column.py:596,625,708; reference multi_column/consistency.py:
    162-261, uniqueness/multi_column.py) on derived nullable columns."""
    from truthound_spark.validators.multi_column import (
        ColumnCoexistenceValidator,
        ColumnDependencyValidator,
        MultiColumnUniqueValidator,
    )

    df = (
        t(spark, sf_dir, "orders")
        .withColumn("a", F.when(F.col("o_custkey") % 3 == 0, None).otherwise(F.col("o_totalprice")))
        .withColumn("b", F.when(F.col("o_custkey") % 5 == 0, None).otherwise(F.col("o_orderkey")))
        .withColumn("tp", F.when(F.col("o_orderkey") % 11 == 0, None).otherwise(F.col("o_totalprice")))
    )
    co = fused_counts(
        df,
        [
            (ColumnCoexistenceValidator(["a", "b"]), ["coexistence_violations"]),
            (ColumnDependencyValidator("o_orderstatus", "F", ["tp"]), ["dependency_violations"]),
        ],
    ).collect()[0]
    mcu = MultiColumnUniqueValidator(["o_custkey", "o_orderstatus"])
    spec = mcu.specs(df)[0]
    row = df.agg(
        spec.extra_exprs["n"].alias("n"), spec.extra_exprs["distinct"].alias("d")
    ).collect()[0]
    return _scalar_df(
        spark,
        coexistence_violations=int(co["coexistence_violations"]),
        dependency_violations=int(co["dependency_violations"]),
        combo_duplicates=int(row["n"] - row["d"]),
    )


@register(
    "special_values_events",
    f"""
    WITH {EV},
    d AS (
      SELECT CASE WHEN event_id % 97 = 0 THEN 'NaN'::DOUBLE
                  WHEN event_id % 101 = 0 THEN 'Infinity'::DOUBLE
                  WHEN event_id % 103 = 0 THEN '-Infinity'::DOUBLE
                  ELSE value END AS dval
      FROM ev
    )
    SELECT
      CAST(SUM(CASE WHEN isnan(dval) THEN 1 ELSE 0 END) AS BIGINT) AS nan_count,
      CAST(SUM(CASE WHEN dval = 'Infinity'::DOUBLE OR dval = '-Infinity'::DOUBLE
                    THEN 1 ELSE 0 END) AS BIGINT) AS inf_count,
      CAST(SUM(CASE WHEN isnan(dval) OR dval = 'Infinity'::DOUBLE
                     OR dval = '-Infinity'::DOUBLE
                    THEN 1 ELSE 0 END) AS BIGINT) AS nonfinite_count,
      ROUND(SUM(CASE WHEN isnan(dval) THEN 1 ELSE 0 END)
            / CAST(COUNT(*) AS DOUBLE), 6) AS nan_ratio
    FROM d
    """,
)
def q_special_values_events(spark, sf_dir):
    """NaN / Infinity / Finite / NaNRatio validators (completeness.py:97,
    121,264,299; reference completeness/nan.py) over injected IEEE special
    values — fused single agg, isnan/isin stay JVM-side."""
    from truthound_spark.validators.completeness import (
        FiniteValidator,
        InfinityValidator,
        NaNValidator,
    )

    df = t(spark, sf_dir, "events").withColumn(
        "dval",
        F.when(F.col("event_id") % 97 == 0, F.lit(float("nan")))
        .when(F.col("event_id") % 101 == 0, F.lit(float("inf")))
        .when(F.col("event_id") % 103 == 0, F.lit(float("-inf")))
        .otherwise(F.col("value")),
    ).select("dval")
    base = fused_counts(
        df,
        [
            (NaNValidator(columns=["dval"]), ["nan_count"]),
            (InfinityValidator(columns=["dval"]), ["inf_count"]),
            (FiniteValidator(columns=["dval"]), ["nonfinite_count"]),
        ],
    )
    total = df.count()
    return base.select(
        "*",
        (F.col("nan_count") / F.lit(float(total))).alias("__r"),
    ).select(
        "nan_count", "inf_count", "nonfinite_count", F.round("__r", 6).alias("nan_ratio")
    )


@register(
    "japanese_chinese_ids_derived",
    """
    WITH d AS (
      SELECT
        CASE WHEN c_custkey % 5 = 0
             THEN lpad(CAST((c_custkey * 7) % 1000 AS VARCHAR), 3, '0')
                  || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
             ELSE lpad(CAST((c_custkey * 7) % 1000 AS VARCHAR), 3, '0') || '-'
                  || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') END AS jp_postal,
        lpad(CAST((c_custkey * 37) % 100000000000 AS VARCHAR), 11, '0')
          || CAST(c_custkey % 10 AS VARCHAR) AS my,
        lpad(CAST((c_custkey * 73) % 100000000000000000 AS VARCHAR), 17, '0')
          || substr('10X98765432', (c_custkey % 11) + 1, 1) AS cn
      FROM customer
    ),
    chk AS (
      SELECT jp_postal, my, cn,
             CAST(my[11] AS INT) * 2 + CAST(my[10] AS INT) * 3 + CAST(my[9] AS INT) * 4 + CAST(my[8] AS INT) * 5 + CAST(my[7] AS INT) * 6 + CAST(my[6] AS INT) * 7 + CAST(my[5] AS INT) * 2 + CAST(my[4] AS INT) * 3 + CAST(my[3] AS INT) * 4 + CAST(my[2] AS INT) * 5 + CAST(my[1] AS INT) * 6 AS my_tot,
             CAST(cn[1] AS INT) * 7 + CAST(cn[2] AS INT) * 9 + CAST(cn[3] AS INT) * 10 + CAST(cn[4] AS INT) * 5 + CAST(cn[5] AS INT) * 8 + CAST(cn[6] AS INT) * 4 + CAST(cn[7] AS INT) * 2 + CAST(cn[8] AS INT) * 1 + CAST(cn[9] AS INT) * 6 + CAST(cn[10] AS INT) * 3 + CAST(cn[11] AS INT) * 7 + CAST(cn[12] AS INT) * 9 + CAST(cn[13] AS INT) * 10 + CAST(cn[14] AS INT) * 5 + CAST(cn[15] AS INT) * 8 + CAST(cn[16] AS INT) * 4 + CAST(cn[17] AS INT) * 2 AS cn_tot
      FROM d
    )
    SELECT
      CAST(SUM(CASE WHEN NOT regexp_matches(jp_postal, '^[0-9]{3}-[0-9]{4}$')
                    THEN 1 ELSE 0 END) AS BIGINT) AS invalid_jp_postal,
      CAST(SUM(CASE WHEN CAST(my[12] AS INT)
                         = (CASE WHEN 11 - (my_tot % 11) > 9 THEN 0
                                 ELSE 11 - (my_tot % 11) END)
                    THEN 0 ELSE 1 END) AS BIGINT) AS invalid_mynumber,
      CAST(SUM(CASE WHEN cn[18] = substr('10X98765432', (cn_tot % 11) + 1, 1)
                    THEN 0 ELSE 1 END) AS BIGINT) AS invalid_chinese_id
    FROM chk
    """,
)
def q_japanese_chinese_ids_derived(spark, sf_dir):
    """JapanesePostal + JapaneseMyNumber (mod-11) + ChineseId (mod-11
    charmap) checksum validators (business.py:338,361,404; reference
    localization/japanese.py:20,180, chinese.py:21) — pure expression
    chains fused into one agg, oracle recomputes both checksums digit by
    digit."""
    from truthound_spark.validators.business import (
        ChineseIdValidator,
        JapaneseMyNumberValidator,
        JapanesePostalValidator,
    )

    k = F.col("c_custkey")
    df = t(spark, sf_dir, "customer").select(
        F.when(
            k % 5 == 0,
            F.concat(
                F.lpad(((k * 7) % 1000).cast("string"), 3, "0"),
                F.lpad((k % 10000).cast("string"), 4, "0"),
            ),
        )
        .otherwise(
            F.concat(
                F.lpad(((k * 7) % 1000).cast("string"), 3, "0"),
                F.lit("-"),
                F.lpad((k % 10000).cast("string"), 4, "0"),
            )
        )
        .alias("jp_postal"),
        F.concat(
            F.lpad(((k * 37) % 100000000000).cast("string"), 11, "0"),
            (k % 10).cast("string"),
        ).alias("my"),
        F.concat(
            F.lpad(((k * 73) % 100000000000000000).cast("string"), 17, "0"),
            F.substring(F.lit("10X98765432"), 1, 11).substr(
                ((k % 11) + 1).cast("int"), F.lit(1)
            ),
        ).alias("cn"),
    )
    return fused_counts(
        df,
        [
            (JapanesePostalValidator("jp_postal"), ["invalid_jp_postal"]),
            (JapaneseMyNumberValidator("my"), ["invalid_mynumber"]),
            (ChineseIdValidator("cn"), ["invalid_chinese_id"]),
        ],
    )


@register(
    "us_regional_formats_derived",
    """
    WITH d AS (
      SELECT
        lpad(CAST((c_custkey * 7) % 1000 AS VARCHAR), 3, '0') AS area,
        lpad(CAST(c_custkey % 100 AS VARCHAR), 2, '0') AS grp,
        lpad(CAST((c_custkey * 3) % 10000 AS VARCHAR), 4, '0') AS ser,
        CASE c_custkey % 4
          WHEN 0 THEN lpad(CAST(c_custkey % 100000 AS VARCHAR), 5, '0')
          WHEN 1 THEN lpad(CAST(c_custkey % 100000 AS VARCHAR), 5, '0') || '-'
                      || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
          WHEN 2 THEN lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
          ELSE lpad(CAST(c_custkey % 100000 AS VARCHAR), 5, '0') || '-'
               || lpad(CAST(c_custkey % 1000 AS VARCHAR), 3, '0') END AS zip
      FROM customer
    )
    SELECT
      CAST(SUM(CASE WHEN area IN ('000', '666') OR area LIKE '9%'
                     OR grp = '00' OR ser = '0000'
                    THEN 1 ELSE 0 END) AS BIGINT) AS invalid_ssn,
      CAST(SUM(CASE WHEN regexp_matches(zip, '^[0-9]{5}(-[0-9]{4})?$')
                    THEN 0 ELSE 1 END) AS BIGINT) AS invalid_zip
    FROM d
    """,
)
def q_us_regional_formats_derived(spark, sf_dir):
    """UsSsn (area/group/serial exclusions via Java lookaheads; the oracle
    re-expresses them as RE2-safe substring predicates) + UsZip
    (string.py:490,516) fused."""
    from truthound_spark.validators.string import UsSsnValidator, UsZipValidator

    k = F.col("c_custkey")
    df = t(spark, sf_dir, "customer").select(
        F.concat_ws(
            "-",
            F.lpad(((k * 7) % 1000).cast("string"), 3, "0"),
            F.lpad((k % 100).cast("string"), 2, "0"),
            F.lpad(((k * 3) % 10000).cast("string"), 4, "0"),
        ).alias("ssn"),
        F.when(k % 4 == 0, F.lpad((k % 100000).cast("string"), 5, "0"))
        .when(
            k % 4 == 1,
            F.concat(
                F.lpad((k % 100000).cast("string"), 5, "0"),
                F.lit("-"),
                F.lpad((k % 10000).cast("string"), 4, "0"),
            ),
        )
        .when(k % 4 == 2, F.lpad((k % 10000).cast("string"), 4, "0"))
        .otherwise(
            F.concat(
                F.lpad((k % 100000).cast("string"), 5, "0"),
                F.lit("-"),
                F.lpad((k % 1000).cast("string"), 3, "0"),
            )
        )
        .alias("zip"),
    )
    return fused_counts(
        df,
        [
            (UsSsnValidator("ssn"), ["invalid_ssn"]),
            (UsZipValidator("zip"), ["invalid_zip"]),
        ],
    )


@register(
    "dateutil_parseable_derived",
    """
    WITH d AS (
      SELECT CASE o_orderkey % 4
               WHEN 0 THEN strftime(o_orderdate, '%Y-%m-%d')
               WHEN 1 THEN strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')
               WHEN 2 THEN '2024-13-45'
               ELSE 'not a date' END AS ds
      FROM orders
    )
    SELECT CAST(SUM(CASE WHEN TRY_CAST(ds AS TIMESTAMP) IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS unparseable_dates
    FROM d
    """,
)
def q_dateutil_parseable_derived(spark, sf_dir):
    """DateutilParseableValidator (datetime_checks.py:297; reference
    datetime/parseable.py:14): Arrow-batched pandas UDF over
    pd.to_datetime(format='mixed') — the sanctioned vectorized Python
    path; unambiguous formats keep pandas and DuckDB TRY_CAST in
    agreement."""
    from truthound_spark.validators.datetime_checks import DateutilParseableValidator

    k = F.col("o_orderkey")
    df = t(spark, sf_dir, "orders").select(
        F.when(k % 4 == 0, F.date_format("o_orderdate", "yyyy-MM-dd"))
        .when(k % 4 == 1, F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss"))
        .when(k % 4 == 2, F.lit("2024-13-45"))
        .otherwise(F.lit("not a date"))
        .alias("ds")
    )
    issues = DateutilParseableValidator("ds").validate(df)
    return _scalar_df(
        spark, unparseable_dates=int(issues[0].count) if issues else 0
    )


@register(
    "timeseries_regularity_events",
    f"""
    WITH {EV},
    lagged AS (
      SELECT user_id, event_id, epoch_us(ts) AS us,
             lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us,
             lag(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_id
      FROM ev
    )
    SELECT
      CAST(SUM(CASE WHEN us - prev_us = 0 THEN 1 ELSE 0 END) AS BIGINT) AS duplicate_ts,
      CAST(SUM(CASE WHEN us - prev_us > 3600000000 THEN 1 ELSE 0 END) AS BIGINT) AS gap_count,
      CAST(SUM(CASE WHEN event_id < prev_id THEN 1 ELSE 0 END) AS BIGINT) AS order_violations,
      CAST(MIN(us) AS BIGINT) AS min_us, CAST(MAX(us) AS BIGINT) AS max_us
    FROM lagged
    """,
)
def q_timeseries_regularity_events(spark, sf_dir):
    """TimeSeriesDuplicate / Interval(gap) / Order / DateRange
    (timeseries.py; reference timeseries/regularity.py) in one
    window+agg plan: per-user lag over (ts, event_id) — the partition key
    distributes the sort; no global ordering anywhere."""
    from pyspark.sql import Window

    df = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    lagged = df.select(
        "event_id",
        us.alias("us"),
        F.lag(us).over(w).alias("prev_us"),
        F.lag("event_id").over(w).alias("prev_id"),
    )
    return lagged.agg(
        F.sum(F.when(F.col("us") - F.col("prev_us") == 0, 1).otherwise(0))
        .cast("long")
        .alias("duplicate_ts"),
        F.sum(F.when(F.col("us") - F.col("prev_us") > 3600000000, 1).otherwise(0))
        .cast("long")
        .alias("gap_count"),
        F.sum(F.when(F.col("event_id") < F.col("prev_id"), 1).otherwise(0))
        .cast("long")
        .alias("order_violations"),
        F.min("us").cast("long").alias("min_us"),
        F.max("us").cast("long").alias("max_us"),
    )


@register(
    "schema_structure_events",
    """
    SELECT
      CAST((SELECT COUNT(*) FROM (DESCRIBE events)) AS BIGINT) AS n_cols,
      EXISTS(SELECT 1 FROM (DESCRIBE events) WHERE column_name = 'value') AS has_value,
      (SELECT column_type = 'DOUBLE' FROM (DESCRIBE events)
       WHERE column_name = 'value') AS value_is_double,
      NOT EXISTS(SELECT 1 FROM (DESCRIBE events)
                 WHERE column_name IN ('ssn', 'password')) AS forbidden_absent,
      EXISTS(SELECT 1 FROM (DESCRIBE events)
             WHERE column_name IN ('event_id', 'ts', 'user_id')) AS required_present
    """,
)
def q_schema_structure_events(spark, sf_dir):
    """ColumnExists/Count/Type + TableRequired/ForbiddenColumns
    (schema_structure.py:50-179, table.py:266,293; reference schema/
    column_exists.py, table/columns.py) — all driver-side schema reads,
    ZERO Spark jobs; the oracle reads DuckDB's catalog the same way."""
    from truthound_spark.validators.schema_structure import (
        ColumnCountValidator,
        ColumnExistsValidator,
        ColumnTypeValidator,
    )
    from truthound_spark.validators.table import (
        TableForbiddenColumnsValidator,
        TableRequiredColumnsValidator,
    )

    df = t(spark, sf_dir, "events")
    n_cols = len(df.columns)
    has_value = not ColumnExistsValidator(["value"]).validate(df)
    value_is_double = not ColumnTypeValidator({"value": "double"}).validate(df)
    forbidden_absent = not TableForbiddenColumnsValidator(["ssn", "password"]).validate(df)
    required_present = not TableRequiredColumnsValidator(
        ["event_id", "ts", "user_id"]
    ).validate(df)
    assert not ColumnCountValidator(expected_count=n_cols).validate(df)
    return _scalar_df(
        spark,
        n_cols=n_cols,
        has_value=bool(has_value),
        value_is_double=bool(value_is_double),
        forbidden_absent=bool(forbidden_absent),
        required_present=bool(required_present),
    )


@register(
    "query_surface_compares_orders",
    """
    SELECT
      CAST((SELECT COUNT(*) FROM orders WHERE o_orderstatus = 'O') AS BIGINT) AS open_count,
      CAST((SELECT COUNT(*) FROM orders WHERE o_orderstatus = 'F') AS BIGINT) AS finished_count,
      ROUND((SELECT COUNT(*) FROM orders WHERE o_orderstatus = 'O')
            / CAST((SELECT COUNT(*) FROM orders) AS DOUBLE), 6) AS open_ratio,
      ROUND(ABS((SELECT AVG(o_totalprice) FROM orders WHERE o_orderstatus = 'O')
                - (SELECT AVG(o_totalprice) FROM orders))
            / ((SELECT AVG(o_totalprice) FROM orders) + 1e-10), 6) AS avg_tp_rel_diff
    FROM (SELECT 1)
    """,
)
def q_query_surface_compares_orders(spark, sf_dir):
    """QueryRowCount / RowCountRatio / RowCountCompare / AggregateCompare
    surface (query.py:231,354,389,553; reference query/row_count.py,
    aggregate.py): user SQL over the registered 'data' view, compared
    driver-side exactly as the validators do."""
    df = t(spark, sf_dir, "orders")
    df.createOrReplaceTempView("data")
    spark_ = df.sparkSession
    open_count = spark_.sql("SELECT * FROM data WHERE o_orderstatus = 'O'").count()
    finished_count = spark_.sql("SELECT * FROM data WHERE o_orderstatus = 'F'").count()
    total = df.count()
    avg_open = spark_.sql(
        "SELECT AVG(o_totalprice) AS v FROM data WHERE o_orderstatus = 'O'"
    ).collect()[0]["v"]
    avg_all = spark_.sql("SELECT AVG(o_totalprice) AS v FROM data").collect()[0]["v"]
    return _scalar_df(
        spark,
        open_count=int(open_count),
        finished_count=int(finished_count),
        open_ratio=round(open_count / total, 6),
        avg_tp_rel_diff=round(abs(avg_open - avg_all) / (avg_all + 1e-10), 6),
    )


@register(
    "self_referential_fk_customer",
    """
    WITH d AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 10 = 0 THEN c_custkey + 1000000
                  WHEN c_custkey < 25 THEN NULL
                  ELSE CAST(c_custkey // 2 AS BIGINT) END AS parent_key
      FROM customer
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS dangling_parents
    FROM d
    WHERE parent_key IS NOT NULL
      AND parent_key NOT IN (SELECT c_custkey FROM d)
    """,
)
def q_self_referential_fk_customer(spark, sf_dir):
    """SelfReferentialFKValidator (referential.py:99; reference
    referential/foreign_key.py:458): anti-join of parent pointers against
    the same table's keys — broadcast of deduplicated keys when small."""
    from truthound_spark.validators.referential import SelfReferentialFKValidator

    k = F.col("c_custkey")
    df = t(spark, sf_dir, "customer").withColumn(
        "parent_key",
        F.when(k % 10 == 0, k + 1000000)
        .when(k < 25, None)
        .otherwise(F.floor(k / 2).cast("long")),
    )
    issues = SelfReferentialFKValidator("c_custkey", "parent_key").validate(df)
    return _scalar_df(
        spark, dangling_parents=int(issues[0].count) if issues else 0
    )


@register(
    "polygon_membership_derived",
    """
    WITH d AS (
      SELECT ((c_custkey * 7) % 180) - 90 + 0.25 AS lat,
             ((c_custkey * 13) % 360) - 180 + 0.25 AS lon
      FROM customer
    )
    SELECT
      CAST(SUM(CASE WHEN lat >= -30 AND lat < 40 AND lon >= -100 AND lon < 60
                    THEN 0 ELSE 1 END) AS BIGINT) AS outside_rect,
      CAST(SUM(CASE WHEN (lat >= -30 AND lat < 40 AND lon >= -100 AND lon < 60)
                      OR (lat >= -80 AND lat < -50 AND lon >= 100 AND lon < 170)
                    THEN 0 ELSE 1 END) AS BIGINT) AS outside_any_rect,
      CAST(SUM(CASE WHEN lat BETWEEN 24.5 AND 49.4 AND lon BETWEEN -125.0 AND -66.9
                    THEN 0 ELSE 1 END) AS BIGINT) AS outside_us_bbox
    FROM d
    """,
)
def q_polygon_membership_derived(spark, sf_dir):
    """PointInPolygon + MultiPolygon (vectorized ray-casting pandas UDF,
    geospatial.py:157,263; reference geospatial/polygon.py:85,386) +
    GeoCountry bbox (geospatial.py:232). For axis-aligned rectangles the
    ray-cast reduces to half-open box membership — the oracle states that
    closed form."""
    from truthound_spark.validators.geospatial import (
        GeoCountryValidator,
        MultiPolygonValidator,
        PointInPolygonValidator,
    )

    k = F.col("c_custkey")
    df = t(spark, sf_dir, "customer").select(
        (((k * 7) % 180) - 90 + 0.25).alias("lat"),
        (((k * 13) % 360) - 180 + 0.25).alias("lon"),
    )
    rect = [(-30.0, -100.0), (-30.0, 60.0), (40.0, 60.0), (40.0, -100.0)]
    rect_b = [(-80.0, 100.0), (-80.0, 170.0), (-50.0, 170.0), (-50.0, 100.0)]
    i1 = PointInPolygonValidator("lat", "lon", rect).validate(df)
    i2 = MultiPolygonValidator("lat", "lon", [rect, rect_b]).validate(df)
    geo_out = fused_counts(
        df, [(GeoCountryValidator("lat", "lon", "US"), ["outside_us_bbox"])]
    ).collect()[0]["outside_us_bbox"]
    return _scalar_df(
        spark,
        outside_rect=int(i1[0].count) if i1 else 0,
        outside_any_rect=int(i2[0].count) if i2 else 0,
        outside_us_bbox=int(geo_out),
    )


@register(
    "cascade_integrity_orders_lineitem",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS cascade_violations
    FROM lineitem l
    JOIN (SELECT DISTINCT o_orderkey FROM orders WHERE o_orderstatus = 'F') d
      ON l.l_orderkey = d.o_orderkey
    WHERE NOT (l.l_returnflag IN ('R', 'A'))
    """,
)
def q_cascade_integrity_orders_lineitem(spark, sf_dir):
    """CascadeIntegrityValidator (referential.py:391; reference
    referential/cascade.py:51): children of 'deleted' parents must satisfy
    the child predicate — broadcast inner join on deduplicated parent
    keys, one distributed count."""
    from truthound_spark.validators.referential import CascadeIntegrityValidator

    orders = t(spark, sf_dir, "orders")
    lineitem = t(spark, sf_dir, "lineitem")
    issues = CascadeIntegrityValidator(
        parent_data=orders,
        parent_key="o_orderkey",
        child_key="l_orderkey",
        deleted_predicate="o_orderstatus = 'F'",
        child_deleted_predicate="l_returnflag IN ('R', 'A')",
    ).validate(lineitem)
    return _scalar_df(
        spark, cascade_violations=int(issues[0].count) if issues else 0
    )


@register(
    "table_factor_metrics",
    """
    SELECT
      ROUND((SELECT COUNT(*) FROM lineitem)
            / CAST((SELECT COUNT(*) FROM orders) AS DOUBLE), 4) AS lineitem_orders_factor,
      ROUND((SELECT COUNT(*) FROM lineitem) / 11.0, 2) AS rows_per_column,
      (SELECT COUNT(*) FROM lineitem) >= (SELECT COUNT(*) FROM orders) AS compare_ok
    """,
)
def q_table_factor_metrics(spark, sf_dir):
    """CrossTableRowCountFactor + TableRowToColumnRatio +
    TableRowCountCompare observations (referential.py, table.py:136,592;
    reference cross_table/row_count.py, table/dimensions.py) — two
    metadata-cheap counts, driver-side compare like the validators."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    n_li = li.count()
    n_o = orders.count()
    return _scalar_df(
        spark,
        lineitem_orders_factor=round(n_li / n_o, 4),
        rows_per_column=round(n_li / len(li.columns), 2),
        compare_ok=bool(n_li >= n_o),
    )


@register(
    "approx_distinct_tolerance_events",
    f"""
    WITH {EV}
    SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS approx_within_5pct
    FROM ev
    """,
)
def q_approx_distinct_tolerance_events(spark, sf_dir):
    """ApproxDistinctCount HLL sketch vs exact (uniqueness.py:112,393;
    reference memory/hyperloglog.py): the approx path must land within 5%
    of truth — the scale path for per-column cardinality at 100 TB (no
    Expand, constant memory)."""
    df = t(spark, sf_dir, "events")
    row = df.agg(
        F.countDistinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id", 0.02).alias("approx"),
    ).collect()[0]
    exact, approx = int(row["exact"]), int(row["approx"])
    return _scalar_df(
        spark,
        exact_users=exact,
        approx_within_5pct=bool(abs(approx - exact) <= 0.05 * exact),
    )


@register(
    "feature_drift_sweep_events",
    f"""
    WITH {EV}
    
    SELECT 'value' AS column_name, ROUND(SUM((p - q) * LN((p + 1e-10) / (q + 1e-10))), 6) AS psi
    FROM (
      WITH b AS (SELECT value AS v FROM ev WHERE event_id % 2 = 0 AND value IS NOT NULL),
      c AS (SELECT value AS v FROM ev WHERE event_id % 2 = 1 AND value IS NOT NULL),
      r AS (SELECT MIN(v) AS lo, MAX(v) AS hi FROM b),
      bins AS (SELECT i FROM generate_series(0, 9) AS gs(i)),
      bh AS (SELECT LEAST(GREATEST(CAST(FLOOR((v - lo) / ((hi - lo) / 10)) AS INT), 0), 9) AS bin,
                    COUNT(*) AS n FROM b, r GROUP BY 1),
      ch AS (SELECT LEAST(GREATEST(CAST(FLOOR((v - lo) / ((hi - lo) / 10)) AS INT), 0), 9) AS bin,
                    COUNT(*) AS n FROM c, r GROUP BY 1)
      SELECT bins.i,
             COALESCE(bh.n, 0) / CAST((SELECT SUM(n) FROM bh) AS DOUBLE) AS p,
             COALESCE(ch.n, 0) / CAST((SELECT SUM(n) FROM ch) AS DOUBLE) AS q
      FROM bins LEFT JOIN bh ON bins.i = bh.bin LEFT JOIN ch ON bins.i = ch.bin
    )
    
    UNION ALL
    
    SELECT 'user_id' AS column_name, ROUND(SUM((p - q) * LN((p + 1e-10) / (q + 1e-10))), 6) AS psi
    FROM (
      WITH b AS (SELECT user_id AS v FROM ev
                 WHERE event_id % 2 = 0 AND value IS NOT NULL AND user_id IS NOT NULL),
      c AS (SELECT user_id AS v FROM ev
            WHERE event_id % 2 = 1 AND value IS NOT NULL AND user_id IS NOT NULL),
      r AS (SELECT MIN(v) AS lo, MAX(v) AS hi FROM b),
      bins AS (SELECT i FROM generate_series(0, 9) AS gs(i)),
      bh AS (SELECT LEAST(GREATEST(CAST(FLOOR((v - lo) / ((hi - lo) / 10)) AS INT), 0), 9) AS bin,
                    COUNT(*) AS n FROM b, r GROUP BY 1),
      ch AS (SELECT LEAST(GREATEST(CAST(FLOOR((v - lo) / ((hi - lo) / 10)) AS INT), 0), 9) AS bin,
                    COUNT(*) AS n FROM c, r GROUP BY 1)
      SELECT bins.i,
             COALESCE(bh.n, 0) / CAST((SELECT SUM(n) FROM bh) AS DOUBLE) AS p,
             COALESCE(ch.n, 0) / CAST((SELECT SUM(n) FROM ch) AS DOUBLE) AS q
      FROM bins LEFT JOIN bh ON bins.i = bh.bin LEFT JOIN ch ON bins.i = ch.bin
    )
    
    ORDER BY column_name
    """,
)
def q_feature_drift_sweep_events(spark, sf_dir):
    """FeatureDriftValidator multi-column sweep (drift/validators.py:309;
    reference drift/multi_feature.py:18): one PSI histogram-aggregate pair
    per numeric column — O(bins) driver transfer per feature, never the
    column data."""
    from truthound_spark.drift.detectors import psi

    baseline, current = _drift_frames(spark, sf_dir)
    rows = []
    for col in ["user_id", "value"]:
        r = psi(baseline, current, col, bins=10)
        rows.append((col, round(r.statistic, 6)))
    out = None
    for col, v in rows:
        one = _scalar_df(spark, psi=v).select(
            F.lit(col).alias("column_name"), "psi"
        )
        out = one if out is None else out.unionAll(one)
    return out.orderBy("column_name")


@register(
    "trend_break_events",
    f"""
    WITH {EV},
    rng AS (SELECT (MIN(epoch_us(ts)) + MAX(epoch_us(ts))) / 2.0 AS mid FROM ev
            WHERE value IS NOT NULL),
    h1 AS (SELECT COVAR_POP(epoch_us(ts), value) / VAR_POP(epoch_us(ts)) AS s
           FROM ev, rng WHERE value IS NOT NULL AND epoch_us(ts) <= mid),
    h2 AS (SELECT COVAR_POP(epoch_us(ts), value) / VAR_POP(epoch_us(ts)) AS s
           FROM ev, rng WHERE value IS NOT NULL AND epoch_us(ts) > mid)
    SELECT ROUND((SELECT s FROM h1) * 1e12, 6) AS slope_first_pico,
           ROUND((SELECT s FROM h2) * 1e12, 6) AS slope_second_pico,
           ABS((SELECT s FROM h2) - (SELECT s FROM h1))
             / (ABS((SELECT s FROM h1)) + 1e-12) <= 2.0 AS no_break
    """,
)
def q_trend_break_events(spark, sf_dir):
    """TrendBreakValidator plan (timeseries.py:284; reference
    timeseries/trend.py:319): OLS slope = covar_pop/var_pop per half —
    two distributed aggregates; range-midpoint split keeps the oracle
    deterministic (the registered validator uses the approx median)."""
    df = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    us = F.unix_micros(F.col("ts")).cast("double")
    r = df.agg(F.min(us).alias("lo"), F.max(us).alias("hi")).collect()[0]
    mid = (r["lo"] + r["hi"]) / 2.0

    def slope(part):
        row = part.agg(
            F.covar_pop(us, F.col("value")).alias("cov"),
            F.var_pop(us).alias("var"),
        ).collect()[0]
        return row["cov"] / row["var"]

    s1 = slope(df.filter(us <= mid))
    s2 = slope(df.filter(us > mid))
    return _scalar_df(
        spark,
        slope_first_pico=round(s1 * 1e12, 6),
        slope_second_pico=round(s2 * 1e12, 6),
        no_break=bool(abs(s2 - s1) / (abs(s1) + 1e-12) <= 2.0),
    )


@register(
    "correlation_matrix_lineitem",
    """
    SELECT 'l_extendedprice' AS col_a, 'l_quantity' AS col_b,
           ROUND(CORR(l_extendedprice, l_quantity), 6) AS r FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice', 'l_discount',
           ROUND(CORR(l_extendedprice, l_discount), 6) FROM lineitem
    UNION ALL
    SELECT 'l_quantity', 'l_discount',
           ROUND(CORR(l_quantity, l_discount), 6) FROM lineitem
    ORDER BY col_a, col_b
    """,
)
def q_correlation_matrix_lineitem(spark, sf_dir):
    """FeatureCorrelationMatrix (ml_feature.py:34; reference ml_feature/
    correlation.py:19): pyspark.ml.stat.Correlation over one assembled
    vector — the full Pearson matrix in a single distributed job."""
    from truthound_spark.validators.ml_feature import correlation_matrix

    cols = ["l_extendedprice", "l_quantity", "l_discount"]
    df = t(spark, sf_dir, "lineitem")
    m = correlation_matrix(df, cols)
    rows = []
    for i in range(len(cols)):
        for j in range(i + 1, len(cols)):
            rows.append((cols[i], cols[j], round(m[i][j], 6)))
    out = None
    for a, b, r in rows:
        one = _scalar_df(spark, r=r).select(
            F.lit(a).alias("col_a"), F.lit(b).alias("col_b"), "r"
        )
        out = one if out is None else out.unionAll(one)
    return out.orderBy("col_a", "col_b")


@register(
    "consistency_rules_bank_orders",
    """
    WITH d AS (
      SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority, o_totalprice,
             substr('12345678901234567890', 1, 7 + CAST(o_custkey % 10 AS INT)) AS acct
      FROM orders
    )
    SELECT
      CAST(SUM(CASE WHEN o_orderstatus = 'F' AND NOT COALESCE(o_totalprice > 0, FALSE)
                    THEN 1 ELSE 0 END) AS BIGINT) AS rule_finished_paid,
      CAST(SUM(CASE WHEN o_orderpriority LIKE '1%'
                     AND NOT COALESCE(o_totalprice < 450000, FALSE)
                    THEN 1 ELSE 0 END) AS BIGINT) AS rule_urgent_bounded,
      CAST(SUM(CASE WHEN CAST(o_orderkey AS VARCHAR) = CAST(o_custkey AS VARCHAR)
                    THEN 1 ELSE 0 END) AS BIGINT) AS intra_row_duplicates,
      CAST(SUM(CASE WHEN NOT (length(acct) >= 10 AND length(acct) <= 16)
                    THEN 1 ELSE 0 END) AS BIGINT) AS invalid_bank_accounts
    FROM d
    """,
)
def q_consistency_rules_bank_orders(spark, sf_dir):
    """ColumnConsistency when/then rules + AllColumnsUniqueWithinRecord +
    KoreanBankAccount length table (multi_column.py:526,206,
    business.py:535; reference multi_column/consistency.py:17,
    uniqueness/within_record.py:409, localization/korean.py:352) — all
    fused into ONE aggregate pass."""
    from truthound_spark.validators.business import KoreanBankAccountValidator
    from truthound_spark.validators.multi_column import (
        AllColumnsUniqueWithinRecordValidator,
        ColumnConsistencyValidator,
    )

    k = F.col("o_custkey")
    df = t(spark, sf_dir, "orders").withColumn(
        "acct", F.expr("substr('12345678901234567890', 1, 7 + CAST(o_custkey % 10 AS INT))")
    )
    rules = [
        {"when": "o_orderstatus = 'F'", "then": "o_totalprice > 0"},
        {"when": "o_orderpriority LIKE '1%'", "then": "o_totalprice < 450000"},
    ]
    return fused_counts(
        df,
        [
            (ColumnConsistencyValidator(rules), ["rule_finished_paid", "rule_urgent_bounded"]),
            (
                AllColumnsUniqueWithinRecordValidator(["o_orderkey", "o_custkey"]),
                ["intra_row_duplicates"],
            ),
            (KoreanBankAccountValidator("acct"), ["invalid_bank_accounts"]),
        ],
    )


@register(
    "global_privacy_scan_derived",
    r"""
    WITH d AS (
      SELECT CASE CAST(c_custkey % 4 AS INT)
               WHEN 0 THEN 'user' || CAST(c_custkey AS VARCHAR) || '@example.com'
               WHEN 1 THEN '+82 10-' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
                           || '-' || lpad(CAST(c_custkey % 9999 AS VARCHAR), 4, '0')
               WHEN 2 THEN CAST((c_custkey * 7) % 256 AS VARCHAR) || '.'
                           || CAST((c_custkey * 13) % 256 AS VARCHAR) || '.'
                           || CAST((c_custkey * 17) % 256 AS VARCHAR) || '.'
                           || CAST(c_custkey % 256 AS VARCHAR)
               ELSE 'record ' || CAST(c_custkey AS VARCHAR) END AS contact
      FROM customer
    )
    SELECT
      CAST(SUM(CASE WHEN regexp_matches(contact,
        '^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}$') THEN 1 ELSE 0 END) AS BIGINT)
        AS email_matches,
      CAST(SUM(CASE WHEN regexp_matches(contact,
        '^\+?[0-9][0-9\s().-]{6,18}$') THEN 1 ELSE 0 END) AS BIGINT) AS phone_matches,
      CAST(SUM(CASE WHEN regexp_matches(contact,
        '^([0-9]{1,3}\.){3}[0-9]{1,3}$') THEN 1 ELSE 0 END) AS BIGINT) AS ip_matches
    FROM d
    """,
)
def q_global_privacy_scan_derived(spark, sf_dir):
    """GDPR/global privacy pattern scan (privacy.py:191 PrivacyValidator;
    reference privacy/base.py:146-415): ALL (column × pattern) rlike
    counters fuse into one aggregate — full-scan distributed detection,
    unlike the reference's driver-side sample loop."""
    from truthound_spark.core.registry import get_validator

    k = F.col("c_custkey")
    df = t(spark, sf_dir, "customer").select(
        F.when(k % 4 == 0, F.concat(F.lit("user"), k.cast("string"), F.lit("@example.com")))
        .when(
            k % 4 == 1,
            F.concat(
                F.lit("+82 10-"),
                F.lpad((k % 10000).cast("string"), 4, "0"),
                F.lit("-"),
                F.lpad((k % 9999).cast("string"), 4, "0"),
            ),
        )
        .when(
            k % 4 == 2,
            F.concat(
                ((k * 7) % 256).cast("string"), F.lit("."),
                ((k * 13) % 256).cast("string"), F.lit("."),
                ((k * 17) % 256).cast("string"), F.lit("."),
                (k % 256).cast("string"),
            ),
        )
        .otherwise(F.concat(F.lit("record "), k.cast("string")))
        .alias("contact")
    )
    v = get_validator("gdpr_compliance")(columns=["contact"])
    spec = v.specs(df)[0]
    extras = spec.extra_exprs
    return df.agg(
        extras["email"].cast("long").alias("email_matches"),
        extras["phone"].cast("long").alias("phone_matches"),
        extras["ip_address"].cast("long").alias("ip_matches"),
    )


# Formerly rows-only entries (numpy eigendecomposition / sampled k-means
# are not SQL-replayable) — reshaped to invariant oracles (the
# shard_balance_documents precedent): the exact totals come from the
# data, the numeric invariants of the non-SQL part are pinned as
# booleans, so the driver hash-verifies them like any other slot.
@register(
    "pca_anomaly_lineitem",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           TRUE AS anomalies_positive,
           TRUE AS anomaly_fraction_near_tail
    FROM lineitem
    """,
)
def q_pca_anomaly_lineitem(spark, sf_dir):
    """PCAAnomalyValidator (anomaly.py:353; reference multivariate.py:327):
    distributed covariance, numpy eigh on the driver (k² scalars), residual
    error as broadcast column math, approx-quantile threshold. Oracle pins
    the exact row count plus the quantile-threshold contract: with
    threshold_quantile=0.99 the flagged fraction must sit near the 1% tail
    (±0.5% absolute — percentile_approx tolerance). The exact top-10
    ranking sibling (pca_power_anomaly_lineitem) hash-certifies the
    reconstruction-error arithmetic itself."""
    from truthound_spark.validators.anomaly import PCAAnomalyValidator

    df = t(spark, sf_dir, "lineitem")
    issues = PCAAnomalyValidator(
        ["l_quantity", "l_extendedprice", "l_discount"]
    ).validate(df)
    n_anom = int(issues[0].count) if issues else 0
    n = df.count()
    frac = n_anom / n if n else 0.0
    return _scalar_df(
        spark,
        n_rows=int(n),
        anomalies_positive=bool(n_anom > 0),
        anomaly_fraction_near_tail=bool(abs(frac - 0.01) < 0.005),
    )


@register(
    "ivf_topk_embeddings",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS total_assigned,
           TRUE AS cells_le_requested,
           TRUE AS multiple_cells_used,
           TRUE AS balanced_within_4x
    FROM embeddings WHERE embedding IS NOT NULL
    """,
)
def q_ivf_topk_embeddings(spark, sf_dir):
    """IVF coarse-quantizer ANN (pipeline/similarity.py:ivf_assign):
    seeded sampled k-means centroids, cell assignment via broadcast-literal
    column math. Oracle pins the exact assignment total (every non-null
    vector lands in exactly one cell) plus the quantizer invariants — at
    most num_cells cells, more than one used, max cell ≤ 4× the mean. The
    closed-form sibling (ivf_seeded_topk_embeddings) hash-certifies the
    probe/search arithmetic itself."""
    from truthound_spark.pipeline.similarity import ivf_assign

    df = t(spark, sf_dir, "embeddings")
    assigned, _cents = ivf_assign(df, num_cells=8)
    hist = assigned.groupBy("cell").agg(F.count(F.lit(1)).alias("n"))
    return hist.agg(
        F.sum("n").cast("long").alias("total_assigned"),
        (F.count(F.lit(1)) <= 8).alias("cells_le_requested"),
        (F.count(F.lit(1)) >= 2).alias("multiple_cells_used"),
        (F.max("n") <= 4 * F.avg("n")).alias("balanced_within_4x"),
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


_IVF_D2 = (
    "list_dot_product({a}, {a}) - 2 * list_dot_product({a}, {b})"
    " + list_dot_product({b}, {b})"
)


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


# ===========================================================================
# round-4 data-mixing + bloom-decontamination operators
# ===========================================================================

_BPE_SQL = "len(regexp_extract_all({c}, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]'))"


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


# ===========================================================================
# Round 4: hashed-feature classifier, paragraph dedup, RAG chunking
# ===========================================================================

_WORDS_SQL = (
    "list_filter(string_split(trim(regexp_replace(regexp_replace(lower({t}),"
    " '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g')), ' '), x -> x <> '')"
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


@register(
    "semantic_decontaminate_embeddings",
    """
    WITH v AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    c AS (SELECT * FROM v WHERE id % 5 <> 0),
    p AS (SELECT * FROM v WHERE id % 5 = 0),
    m AS (
      SELECT c.id,
             list_dot_product(c.e, p.e) / (sqrt(list_dot_product(c.e, c.e)) * sqrt(list_dot_product(p.e, p.e))) AS cosine
      FROM c, p
    )
    SELECT id, CAST(COUNT(*) AS BIGINT) AS n_matches, MAX(ROUND(cosine, 6)) AS max_cosine
    FROM m WHERE cosine >= 0.45 GROUP BY id ORDER BY id
    """,
)
def q_semantic_decontaminate_embeddings(spark, sf_dir):
    """Embedding-space decontamination (pipeline/dedup.py
    semantic_decontaminate): corpus vectors (vec_id % 5 != 0) whose
    cosine to ANY probe vector (vec_id % 5 == 0) reaches 0.45 — the
    semantic complement to n-gram collision decontamination, catching
    paraphrased benchmark leakage. Probe side broadcast, cosine rides
    the nested-loop join, corpus never shuffles."""
    from truthound_spark.pipeline.dedup import semantic_decontaminate

    emb = t(spark, sf_dir, "embeddings")
    out = semantic_decontaminate(
        emb.filter(F.col("vec_id") % 5 != 0),
        emb.filter(F.col("vec_id") % 5 == 0),
        threshold=0.45,
    )
    return out.orderBy("id")


@register(
    "self_dedup_spans_documents",
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
    ranked AS (
      SELECT id, start,
             COUNT(*) OVER (PARTITION BY gram) AS occ,
             ROW_NUMBER() OVER (PARTITION BY gram ORDER BY id, start) AS rn
      FROM grams
    ),
    covered AS (
      SELECT DISTINCT id, u.pos
      FROM (SELECT id, start FROM ranked WHERE occ >= 2 AND rn > 1) m,
           UNNEST(range(start, start + 8)) AS u(pos)
    ),
    toks AS (
      SELECT id, u.pos, raw[u.pos] AS tok
      FROM nrm, UNNEST(range(1, len(raw) + 1)) AS u(pos)
    ),
    kept AS (
      SELECT t.id, t.pos, t.tok FROM toks t
      LEFT JOIN covered c ON t.id = c.id AND t.pos = c.pos
      WHERE c.id IS NULL
    ),
    reb AS (
      SELECT id, string_agg(tok, ' ' ORDER BY pos) AS text, COUNT(*) AS kept
      FROM kept GROUP BY id
    )
    SELECT s.id, COALESCE(r.text, '') AS text,
           CAST(len(s.raw) - COALESCE(r.kept, 0) AS BIGINT) AS removed_tokens,
           CAST(len(s.raw) AS BIGINT) AS total_tokens
    FROM src s LEFT JOIN reb r ON s.id = r.id
    ORDER BY s.id
    """,
)
def q_self_dedup_spans_documents(spark, sf_dir):
    """Within-corpus repeated-span self-dedup (pipeline/dedup.py
    self_dedup_spans — Lee et al. 2022 substring dedup, relational form):
    every 8-token normalized span occurring more than once in the corpus
    keeps its globally-first (id, start) occurrence; all other
    occurrences are excised and the surviving original tokens re-spliced.
    The oracle replicates owner selection with a window (ROW_NUMBER over
    (id, start) per gram == Spark's min-struct) and must match the
    rebuilt text byte-for-byte. The corpus' seeded near-duplicates
    guarantee real repeated spans."""
    from truthound_spark.pipeline.dedup import self_dedup_spans

    docs = t(spark, sf_dir, "documents")
    return self_dedup_spans(docs, n=8).orderBy("id")


@register(
    "corpus_diff_documents",
    f"""
    WITH o AS (
      SELECT doc_id AS id, md5({_NORM_SQL.format(c='text')}) AS fp FROM documents
    ),
    n AS (
      SELECT doc_id AS id,
             md5({_NORM_SQL.format(c="CASE WHEN doc_id % 5 = 0 THEN text || ' edited' ELSE text END")}) AS fp
      FROM documents WHERE doc_id % 7 <> 0
      UNION ALL
      SELECT doc_id + 1000000, md5({_NORM_SQL.format(c='text')})
      FROM documents WHERE doc_id < 20
    )
    SELECT COALESCE(o.id, n.id) AS id,
           CASE WHEN o.id IS NULL THEN 'added'
                WHEN n.id IS NULL THEN 'removed'
                WHEN o.fp = n.fp THEN 'unchanged'
                ELSE 'changed' END AS status
    FROM o FULL OUTER JOIN n ON o.id = n.id
    ORDER BY id
    """,
)
def q_corpus_diff_documents(spark, sf_dir):
    """Corpus snapshot diff (pipeline/dedup.py corpus_diff): the new
    version drops every 7th doc, edits every 5th, and adds 20 fresh ids —
    the diff reports added/removed/changed/unchanged per id from ONE
    fingerprint-only full-outer join (the incremental-revalidation and
    release-note primitive)."""
    from truthound_spark.pipeline.dedup import corpus_diff

    docs = t(spark, sf_dir, "documents")
    new = (
        docs.filter(F.col("doc_id") % 7 != 0)
        .withColumn(
            "text",
            F.when(
                F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit(" edited"))
            ).otherwise(F.col("text")),
        )
        .unionByName(
            docs.filter(F.col("doc_id") < 20).withColumn(
                "doc_id", F.col("doc_id") + 1_000_000
            )
        )
    )
    return corpus_diff(docs, new).orderBy("id")


@register(
    "ngram_novelty_documents",
    f"""
    WITH sh AS ({_SHINGLES_SQL}),
    inv AS (
      SELECT id, g FROM (SELECT id, unnest(sh) AS g FROM sh) WHERE g IS NOT NULL AND g <> ''
    ),
    dfreq AS (SELECT g, COUNT(*) AS df FROM inv GROUP BY 1),
    per_doc AS (
      SELECT inv.id,
             CAST(COUNT(*) AS BIGINT) AS n_grams,
             CAST(SUM(CASE WHEN dfreq.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS novel_grams
      FROM inv JOIN dfreq ON inv.g = dfreq.g GROUP BY 1
    )
    SELECT d.doc_id AS id,
           COALESCE(p.n_grams, 0) AS n_grams,
           COALESCE(p.novel_grams, 0) AS novel_grams,
           ROUND(COALESCE(CAST(p.novel_grams AS DOUBLE) / p.n_grams, 0.0), 6) AS novelty
    FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.id
    ORDER BY id
    """,
)
def q_ngram_novelty_documents(spark, sf_dir):
    """Per-document n-gram novelty (pipeline/text.py ngram_novelty): the
    fraction of a doc's distinct 3-grams unique to it corpus-wide — the
    self-information curation signal (seeded near-duplicates score low,
    original docs high). One shingle pass + one df aggregate + one join;
    shuffle keys are n-grams."""
    from truthound_spark.pipeline.text import ngram_novelty

    docs = t(spark, sf_dir, "documents")
    return ngram_novelty(docs, n=3).orderBy("id")


@register(
    "bigram_perplexity_documents",
    f"""
    WITH w AS (
      SELECT doc_id AS id,
             list_filter(string_split({_NORM_SQL.format(c='text')}, ' '), x -> x <> '') AS ws
      FROM documents
    ),
    bg AS (
      SELECT id, u.b[1] AS w1, u.b[2] AS w2 FROM (
        SELECT id,
               CASE WHEN len(ws) >= 2
                    THEN list_transform(range(1, len(ws)), i -> [ws[i], ws[i + 1]])
                    ELSE [] END AS bs
        FROM w
      ), UNNEST(bs) AS u(b)
    ),
    uni AS (
      SELECT t AS w1, COUNT(*) AS c1 FROM (SELECT unnest(ws) AS t FROM w) GROUP BY 1
    ),
    v AS (SELECT CAST(COUNT(*) AS DOUBLE) AS vocab FROM uni),
    big AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY 1, 2),
    lp AS (
      SELECT bg.id,
             CAST(round(-LN((big.c12 + 1.0) / (uni.c1 + v.vocab)) * 1000000.0) AS BIGINT) AS qlp
      FROM bg JOIN big ON bg.w1 = big.w1 AND bg.w2 = big.w2
      JOIN uni ON bg.w1 = uni.w1, v
    ),
    s AS (
      SELECT id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
             CAST(SUM(qlp) AS DOUBLE) / COUNT(*) / 1000000.0 AS anl
      FROM lp GROUP BY id
    )
    SELECT d.doc_id AS id, COALESCE(s.n_bigrams, 0) AS n_bigrams,
           ROUND(s.anl, 6) AS avg_neg_logprob,
           ROUND(EXP(s.anl), 4) AS perplexity
    FROM documents d LEFT JOIN s ON d.doc_id = s.id
    ORDER BY id
    """,
)
def q_bigram_perplexity_documents(spark, sf_dir):
    """Corpus-self-trained bigram-LM perplexity (pipeline/text.py
    bigram_perplexity — the relational CCNet/KenLM filter shape):
    add-one-smoothed p(w2|w1) from corpus-wide counts, per-doc mean
    -ln p over ALL bigram positions as a quantized-long sum (the exact
    mean that lets the oracle certify the floats), perplexity = e^score.
    Outlier-high = noise; outlier-low = boilerplate."""
    from truthound_spark.pipeline.text import bigram_perplexity

    docs = t(spark, sf_dir, "documents")
    return bigram_perplexity(docs).orderBy("id")


@register(
    "trained_classifier_scores_documents",
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
    ),
    m AS (SELECT doc_id, u.bucket FROM b, UNNEST(bk) AS u(bucket)),
    cp AS (SELECT bucket, COUNT(*) AS n FROM m WHERE doc_id % 2 = 0 GROUP BY 1),
    cn AS (SELECT bucket, COUNT(*) AS n FROM m WHERE doc_id % 2 = 1 GROUP BY 1),
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
    warr AS (SELECT list(wt ORDER BY bucket) AS ws FROM wfull)
    SELECT doc_id,
           ROUND(1.0 / (1.0 + EXP(-(CASE WHEN len(bk) > 0 THEN
             list_sum(list_transform(bk, x -> warr.ws[x + 1])) / len(bk)
             ELSE 0.0 END))), 6) AS classifier_score
    FROM b, warr ORDER BY doc_id
    """,
)
def q_trained_classifier_scores_documents(spark, sf_dir):
    """END-TO-END trained quality classifier (pipeline/text.py
    train_quality_weights + classifier_quality_score): even-id docs play
    the high-quality exemplar corpus, odd-id docs the raw crawl; training
    is the closed-form Naive Bayes log-odds over hashed features (one
    count aggregate per side, no gradient loop), scoring inlines the
    4096 trained weights as a literal array. The oracle retrains
    relationally and replays the identical list-fold scoring — the full
    train->apply cycle hash-certified."""
    from truthound_spark.pipeline.text import (
        classifier_quality_score,
        train_quality_weights,
    )

    docs = t(spark, sf_dir, "documents")
    weights = train_quality_weights(
        docs.filter(F.col("doc_id") % 2 == 0),
        docs.filter(F.col("doc_id") % 2 == 1),
    )
    out = classifier_quality_score(docs, weights=weights)
    return out.select("doc_id", "classifier_score").orderBy("doc_id")


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


@register("bpe_train_documents", _bpe_oracle_sql(_BPE_ROUNDS))
def q_bpe_train_documents(spark, sf_dir):
    """Distributed BPE tokenizer training (pipeline/tokenizer.py
    bpe_train — Sennrich et al. 2016): the corpus collapses to a
    (word, count) table in ONE pass, then each merge round is one
    aggregate over that vocabulary-sized table (most-frequent adjacent
    symbol pair, ties (left, right)-lexicographic) plus a literal string
    replace on delimiter-wrapped symbol strings — which IS the greedy
    left-to-right merge fold, in both engines. The oracle replays all 6
    rounds as generated CTEs; counts are exact integers, so the whole
    iterative training loop hash-matches."""
    from truthound_spark.pipeline.tokenizer import bpe_train

    df = t(spark, sf_dir, "documents")
    return bpe_train(df, rounds=_BPE_ROUNDS).orderBy("round")


@register(
    "bpe_token_counts_documents",
    _bpe_oracle_ctes(_BPE_ROUNDS)
    + f""",
    enc AS (
      SELECT doc_id,
             len(list_filter(string_split({_NORM_SQL.format(c='text')}, ' '),
                             w -> w <> '')) AS n_words,
             {"".join("replace(" for _ in range(_BPE_ROUNDS))}array_to_string(
               list_transform(
                 list_filter(string_split({_NORM_SQL.format(c='text')}, ' '),
                             w -> w <> ''),
                 w -> '|' || array_to_string(string_split(w,''),'||') || '|'
               ), ' ')"""
    + "".join(
        f""",
               COALESCE((SELECT '|'||x||'||'||y||'|' FROM m{r}), chr(1)),
               COALESCE((SELECT '|'||x||y||'|' FROM m{r}), chr(1)))"""
        for r in range(1, _BPE_ROUNDS + 1)
    )
    + """ AS s
      FROM documents
    )
    SELECT doc_id AS id, CAST(n_words AS BIGINT) AS n_words,
           CASE WHEN n_words > 0 THEN
             CAST((length(s) - length(replace(s, '||', ''))) / 2 + n_words AS BIGINT)
           ELSE 0 END AS n_tokens
    FROM enc ORDER BY id
    """,
)
def q_bpe_token_counts_documents(spark, sf_dir):
    """Tokenizer-true token budget (pipeline/tokenizer.py
    bpe_token_counts): the 6 trained merges apply to every document as
    nested literal replaces inside ONE map-only projection — no
    tokenized array materializes; the count falls out of delimiter
    arithmetic. The oracle retrains the merges (same CTEs as
    bpe_train_documents) and replays the replace chain + length
    arithmetic — training AND application certified end-to-end."""
    from truthound_spark.pipeline.tokenizer import bpe_token_counts, bpe_train

    df = t(spark, sf_dir, "documents")
    merges = bpe_train(df, rounds=_BPE_ROUNDS)
    return bpe_token_counts(df, merges).orderBy("id")


@register(
    "cluster_split_documents",
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
    ),
    cl AS (SELECT node AS id, MIN(root) AS cluster_id FROM reach GROUP BY node)
    SELECT cl.id, cl.cluster_id AS cluster_key,
           CASE WHEN CAST(('0x' || substr(md5(CAST(cl.cluster_id AS VARCHAR)), 1, 6)) AS BIGINT)
                     % 10000 < 1000
                THEN 'val' ELSE 'train' END AS side
    FROM cl ORDER BY cl.id
    """,
)
def q_cluster_split_documents(spark, sf_dir):
    """Near-dup-aware leak-proof split (pipeline/export.py
    split_by_cluster): the split key is the MinHash-dedup CLUSTER id, so
    near-duplicate documents — which content-hash splitting cannot pin
    together — always land on the same side of train/val. The md5-bucket
    arithmetic is engine-portable, so the oracle certifies the EXACT
    membership (recursive-CTE clusters + identical bucket math), not
    just invariants."""
    from truthound_spark.pipeline.dedup import dedup_clusters
    from truthound_spark.pipeline.export import split_by_cluster

    df = t(spark, sf_dir, "documents")
    clusters = dedup_clusters(
        df, "text", "doc_id", threshold=0.7, num_hashes=64, bands=32,
        max_bucket_size=None,  # exact all-pairs: the oracle-certified mode
    ).select(F.col("doc_id").alias("id"), "cluster_id")
    return split_by_cluster(df, clusters, val_fraction=0.1).orderBy("id")


@register(
    "ann_recall_embeddings",
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
      ) WHERE rn <= 1
    ),
    approx AS (
      SELECT query_id, id FROM (
        SELECT p.query_id, a.id,
               ROW_NUMBER() OVER (
                 PARTITION BY p.query_id
                 ORDER BY list_dot_product(a.v, p.qv)
                   / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(p.qv, p.qv))) DESC,
                   a.id
               ) AS rank
        FROM probe p JOIN a ON a.cell = p.cell WHERE a.id <> p.query_id
      ) WHERE rank <= 5
    ),
    q AS (SELECT CAST(vec_id AS BIGINT) AS query_id, embedding AS qv FROM ed WHERE vec_id < 8),
    ex AS (
      SELECT query_id, id FROM (
        SELECT q.query_id, CAST(c2.vec_id AS BIGINT) AS id,
               ROW_NUMBER() OVER (
                 PARTITION BY q.query_id
                 ORDER BY list_dot_product(c2.embedding, q.qv)
                   / (sqrt(list_dot_product(c2.embedding, c2.embedding)) * sqrt(list_dot_product(q.qv, q.qv))) DESC,
                   CAST(c2.vec_id AS BIGINT)
               ) AS rank
        FROM q, ed c2 WHERE CAST(c2.vec_id AS BIGINT) <> q.query_id
      ) WHERE rank <= 5
    ),
    hits AS (
      SELECT ap.query_id, COUNT(*) AS n_hit
      FROM approx ap JOIN ex ON ap.query_id = ex.query_id AND ap.id = ex.id
      GROUP BY 1
    ),
    den AS (SELECT query_id, COUNT(*) AS n_exact FROM ex GROUP BY 1)
    SELECT den.query_id, CAST(COALESCE(hits.n_hit, 0) AS BIGINT) AS n_hit,
           CAST(den.n_exact AS BIGINT) AS n_exact,
           ROUND(COALESCE(hits.n_hit, 0) / den.n_exact, 6) AS recall
    FROM den LEFT JOIN hits ON den.query_id = hits.query_id
    ORDER BY den.query_id
    """,
)
def q_ann_recall_embeddings(spark, sf_dir):
    """ANN recall@k evaluation (pipeline/similarity.py ann_recall): the
    1-probe seeded IVF's top-5 measured against brute-force cosine
    top-5 per query — the tuning loop that decides nprobe/num_planes
    before an index replaces brute force. The oracle recomputes both
    sides relationally and the same hit/denominator join; deliberately
    nprobe=1 so recall is genuinely < 1 for some queries and the metric
    is exercised off the trivial fixed point."""
    from truthound_spark.pipeline.similarity import (
        ann_recall,
        brute_force_topk,
        ivf_seeded_topk,
    )

    df = t(spark, sf_dir, "embeddings")
    q = df.filter(F.col("vec_id") < 8)
    approx = ivf_seeded_topk(df, q, k=5, num_cells=16, nprobe=1)
    exact = brute_force_topk(df, q, k=5)
    return ann_recall(approx, exact, k=5).orderBy("query_id")


@register(
    "temperature_weights_documents",
    f"""
    WITH avail AS (
      SELECT source,
             CAST(SUM({_BPE_SQL.format(c='text')}) AS BIGINT) AS available_tokens
      FROM documents GROUP BY source
    ),
    q AS (
      SELECT source, available_tokens,
             CAST(round(pow(CAST(available_tokens AS DOUBLE), 0.3) * 1000000.0)
                  AS BIGINT) AS qp
      FROM avail
    ),
    tot AS (SELECT SUM(qp) AS t FROM q)
    SELECT source, available_tokens, ROUND(qp / tot.t, 6) AS weight
    FROM q, tot ORDER BY source
    """,
)
def q_temperature_weights_documents(spark, sf_dir):
    """Temperature mixture weights (pipeline/export.py
    temperature_weights — the mT5/XLM-R alpha-sampling recipe): source
    weight ∝ available_tokens^0.3, up-weighting low-resource sources
    without per-source hand targets. The powered sizes quantize to 1e-6
    longs BEFORE the normalization sum, so the denominator is exact and
    order-independent — the weights hash-match across engines."""
    from truthound_spark.pipeline.export import temperature_weights

    df = t(spark, sf_dir, "documents")
    return temperature_weights(df, alpha=0.3).orderBy("source")


@register(
    "decontaminate_multi_documents",
    f"""
    WITH sh AS ({_SHINGLES_SQL}),
    tr AS (SELECT id, unnest(sh) AS g FROM sh WHERE id % 2 = 0),
    pa AS (SELECT DISTINCT 'suite_a' AS benchmark, unnest(sh) AS g
           FROM sh WHERE id % 4 = 1),
    pb AS (SELECT DISTINCT 'suite_b' AS benchmark, unnest(sh) AS g
           FROM sh WHERE id % 4 = 3),
    pr AS (SELECT * FROM pa UNION ALL SELECT * FROM pb)
    SELECT tr.id AS doc_id, pr.benchmark, CAST(COUNT(*) AS BIGINT) AS overlap_ngrams
    FROM tr JOIN pr ON tr.g = pr.g AND tr.g <> ''
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def q_decontaminate_multi_documents(spark, sf_dir):
    """Multi-benchmark decontamination (pipeline/dedup.py
    decontaminate_multi): the whole eval battery screens in ONE corpus
    pass — every suite's distinct n-grams union with a suite tag into a
    single broadcast probe, grouped by (doc, suite). Per-suite results
    equal K separate decontaminate() runs at 1/K the corpus scans
    (equality pinned by tests); here suites are the odd doc_ids split
    %4 into two batteries."""
    from truthound_spark.pipeline.dedup import decontaminate_multi

    df = t(spark, sf_dir, "documents")
    return decontaminate_multi(
        df.filter(F.col("doc_id") % 2 == 0),
        {
            "suite_a": df.filter(F.col("doc_id") % 4 == 1),
            "suite_b": df.filter(F.col("doc_id") % 4 == 3),
        },
    ).orderBy("doc_id", "benchmark")


@register(
    "tag_documents_documents",
    f"""
    WITH w AS (
      SELECT doc_id, text,
             string_split(CASE WHEN LEN(TRIM(text)) = 0 THEN ''
                  ELSE {_NORM_SQL.format(c='text')} END, ' ') AS words,
             string_split(text, chr(10)) AS lines
      FROM documents
    ),
    lang AS (
      SELECT doc_id,
        len(list_filter(list_distinct(words), x -> list_contains(['der','die','das','und','ist','von','mit','den','ein','eine'], x))) AS de,
        len(list_filter(list_distinct(words), x -> list_contains(['the','a','of','and','to','in','is','that','it','for'], x))) AS en,
        len(list_filter(list_distinct(words), x -> list_contains(['el','la','de','que','y','en','un','una','los','por'], x))) AS es,
        len(list_filter(list_distinct(words), x -> list_contains(['le','la','de','et','les','des','un','une','du','que'], x))) AS fr
      FROM w
    ),
    clf AS (
      SELECT doc_id,
             list_transform(
               fw || list_transform(range(1, len(fw)), i -> fw[i] || '_' || fw[i+1]),
               t -> CAST(('0x' || substr(md5(t), 1, 6)) AS BIGINT) % 4096) AS bk
      FROM (SELECT doc_id, list_filter(words, x -> x <> '') AS fw FROM w)
    )
    SELECT w.doc_id,
      ROUND(CASE WHEN len(words) > 0 THEN
        len(list_filter(words, x -> list_contains(['the','a','of','and','to','in','is','that','it','for'], x)))
        / CAST(len(words) AS DOUBLE) ELSE 0.0 END, 6) AS stopword_ratio,
      ROUND(CASE WHEN length(text) > 0 THEN
        len(regexp_extract_all(text, '[^\\x{{30}}-\\x{{39}}a-zA-Z_\\s]')) / CAST(length(text) AS DOUBLE)
        ELSE 0.0 END, 6) AS punct_ratio,
      ROUND(CASE WHEN len(words) > 0 THEN len(list_distinct(words)) / CAST(len(words) AS DOUBLE)
            ELSE 0.0 END, 6) AS uniq_word_ratio,
      CASE WHEN GREATEST(lang.de, lang.en, lang.es, lang.fr) = 0 THEN 'unknown'
           WHEN lang.de >= lang.en AND lang.de >= lang.es AND lang.de >= lang.fr THEN 'de'
           WHEN lang.en >= lang.es AND lang.en >= lang.fr THEN 'en'
           WHEN lang.es >= lang.fr THEN 'es'
           ELSE 'fr' END AS predicted_lang,
      md5({_NORM_SQL.format(c='text')}) AS fingerprint,
      ROUND(CASE WHEN len(lines) > 0
            THEN 1.0 - len(list_distinct(lines)) / CAST(len(lines) AS DOUBLE)
            ELSE 0.0 END, 6) AS dup_line_fraction,
      ROUND(CASE WHEN len(words) > 0
            THEN 1.0 - len(list_distinct(words)) / CAST(len(words) AS DOUBLE)
            ELSE 0.0 END, 6) AS dup_word_fraction,
      ROUND(1.0 / (1.0 + EXP(-(CASE WHEN len(clf.bk) > 0 THEN
        list_sum(list_transform(clf.bk, x -> ((x % 2001) - 1000) / 1000.0)) / len(clf.bk)
        ELSE 0.0 END))), 6) AS classifier_score
    FROM w JOIN lang ON w.doc_id = lang.doc_id
           JOIN clf ON w.doc_id = clf.doc_id
    ORDER BY w.doc_id
    """,
)
def q_tag_documents_documents(spark, sf_dir):
    """Fused one-pass document tagger (pipeline/text.py tag_documents —
    the Dolma 'taggers' stage shape): quality ratios, language id,
    content fingerprint, Gopher repetition signals, and the classifier
    score in ONE projection over ONE scan (CollapseProject folds the
    whole helper stack; a plan test pins zero exchanges). Each signal's
    expression is byte-identical to its individually-certified slot —
    this slot certifies they stay identical when fused."""
    from truthound_spark.pipeline.text import tag_documents

    df = t(spark, sf_dir, "documents")
    out = tag_documents(df)
    return out.select(
        "doc_id",
        F.round("stopword_ratio", 6).alias("stopword_ratio"),
        F.round("punct_ratio", 6).alias("punct_ratio"),
        F.round("uniq_word_ratio", 6).alias("uniq_word_ratio"),
        "predicted_lang",
        "fingerprint",
        F.round("dup_line_fraction", 6).alias("dup_line_fraction"),
        F.round("dup_word_fraction", 6).alias("dup_word_fraction"),
        "classifier_score",
    ).orderBy("doc_id")


@register(
    "bpe_vocab_documents",
    _bpe_oracle_ctes(_BPE_ROUNDS)
    + f""",
    toks AS (
      SELECT t AS token, SUM(n) AS n FROM (
        SELECT n, unnest(string_split(trim(sym,'|'),'||')) AS t
        FROM w{_BPE_ROUNDS}
      ) GROUP BY 1
    ),
    tot AS (SELECT SUM(n) AS t FROM toks),
    ranked AS (
      SELECT token, n,
             ROW_NUMBER() OVER (ORDER BY n DESC, token) AS rank,
             SUM(n) OVER (ORDER BY n DESC, token
                          ROWS UNBOUNDED PRECEDING) AS cum
      FROM toks
    )
    SELECT token, n, CAST(rank AS BIGINT) AS rank,
           ROUND(cum / tot.t, 6) AS cum_coverage
    FROM ranked, tot WHERE rank <= 50 ORDER BY rank
    """,
)
def q_bpe_vocab_documents(spark, sf_dir):
    """BPE vocabulary + coverage curve (pipeline/tokenizer.py bpe_vocab):
    the surviving symbols after the 6 trained merges, ranked by corpus
    occurrence with the cumulative coverage fraction — the freeze-check
    a tokenizer ships with (does top-V cover enough?). Vocabulary-scale
    work throughout; exact long counts make the curve hash-certifiable.
    The oracle replays training (same CTEs) then the token explosion +
    window."""
    from truthound_spark.pipeline.tokenizer import bpe_train, bpe_vocab

    df = t(spark, sf_dir, "documents")
    merges = bpe_train(df, rounds=_BPE_ROUNDS)
    return bpe_vocab(df, merges, top_v=50).orderBy("rank")


_COS_SQL = (
    "list_dot_product({a}, {b})"
    " / (sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
)


@register(
    "bitext_mining_embeddings",
    f"""
    WITH ed AS (
      SELECT CAST(vec_id AS BIGINT) AS id, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings
    ),
    s AS (SELECT * FROM ed WHERE id % 2 = 0),
    tt AS (SELECT * FROM ed WHERE id % 2 = 1),
    fwd AS (
      SELECT src_id, tgt_id, cosine FROM (
        SELECT s.id AS src_id, tt.id AS tgt_id,
               {_COS_SQL.format(a='s.v', b='tt.v')} AS cosine,
               ROW_NUMBER() OVER (
                 PARTITION BY s.id
                 ORDER BY {_COS_SQL.format(a='s.v', b='tt.v')} DESC, tt.id
               ) AS rn
        FROM s, tt
      ) WHERE rn <= 4
    ),
    bwd AS (
      SELECT src_id, tgt_id, cosine FROM (
        SELECT tt.id AS tgt_id, s.id AS src_id,
               {_COS_SQL.format(a='tt.v', b='s.v')} AS cosine,
               ROW_NUMBER() OVER (
                 PARTITION BY tt.id
                 ORDER BY {_COS_SQL.format(a='tt.v', b='s.v')} DESC, s.id
               ) AS rn
        FROM tt, s
      ) WHERE rn <= 4
    ),
    asrc AS (
      SELECT src_id,
             SUM(CAST(round(cosine * 1000000.0) AS BIGINT)) / COUNT(*) / 1000000.0
               AS nbhd_src
      FROM fwd GROUP BY 1
    ),
    atgt AS (
      SELECT tgt_id,
             SUM(CAST(round(cosine * 1000000.0) AS BIGINT)) / COUNT(*) / 1000000.0
               AS nbhd_tgt
      FROM bwd GROUP BY 1
    ),
    cand AS (
      SELECT f.src_id, f.tgt_id, f.cosine,
             ROUND(f.cosine / ((a.nbhd_src + b.nbhd_tgt) / 2), 6) AS margin
      FROM fwd f JOIN asrc a ON f.src_id = a.src_id
                 JOIN atgt b ON f.tgt_id = b.tgt_id
    ),
    bestf AS (
      SELECT src_id, tgt_id, ROUND(cosine, 6) AS cosine, margin FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY src_id ORDER BY margin DESC, tgt_id) AS rn
        FROM cand
      ) WHERE rn = 1
    ),
    bcand AS (
      SELECT w.src_id, w.tgt_id,
             ROUND(w.cosine / ((a.nbhd_src + b.nbhd_tgt) / 2), 6) AS margin
      FROM bwd w JOIN asrc a ON w.src_id = a.src_id
                 JOIN atgt b ON w.tgt_id = b.tgt_id
    ),
    bestb AS (
      SELECT tgt_id, src_id AS b_src FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY tgt_id ORDER BY margin DESC, src_id) AS rn
        FROM bcand
      ) WHERE rn = 1
    )
    SELECT f.src_id, f.tgt_id, f.cosine, f.margin
    FROM bestf f JOIN bestb b ON f.tgt_id = b.tgt_id AND f.src_id = b.b_src
    ORDER BY f.src_id
    """,
)
def q_bitext_mining_embeddings(spark, sf_dir):
    """Margin-based bitext mining (pipeline/align.py mine_bitext —
    Artetxe & Schwenk 2019, the LASER/CCMatrix parallel-corpus recipe):
    even vec_ids play the source corpus, odd the target; each side's
    k-NN neighborhood mean (exact quantized sums) normalizes the cosine
    into the ratio margin, each src nominates its max-margin tgt, and
    only MUTUAL nominations survive. Two broadcast-query top-k passes —
    the corpora never cross-shuffle; all post-candidate work is
    candidate-sized. The oracle replays both passes and the margin/
    mutual chain."""
    from truthound_spark.pipeline.align import mine_bitext

    df = t(spark, sf_dir, "embeddings")
    src = df.filter(F.col("vec_id") % 2 == 0)
    tgt = df.filter(F.col("vec_id") % 2 == 1)
    return mine_bitext(src, tgt, k=4).orderBy("src_id")


@register(
    "hard_negatives_embeddings",
    f"""
    WITH ed AS (
      SELECT CAST(vec_id AS BIGINT) AS id, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings
    ),
    q AS (SELECT id AS query_id, v AS qv FROM ed WHERE id < 6),
    pos AS (
      SELECT id AS query_id, id + 1 AS id FROM ed WHERE id < 6
    ),
    scored AS (
      SELECT q.query_id, c.id, {_COS_SQL.format(a='c.v', b='q.qv')} AS cosine
      FROM ed c, q
      WHERE NOT EXISTS (
        SELECT 1 FROM pos p WHERE p.query_id = q.query_id AND p.id = c.id
      )
    )
    SELECT query_id, id, ROUND(cosine, 6) AS cosine, CAST(rank AS BIGINT) AS rank
    FROM (
      SELECT query_id, id, cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, id) AS rank
      FROM scored WHERE cosine <= 0.98
    ) WHERE rank <= 8 ORDER BY query_id, rank
    """,
)
def q_hard_negatives_embeddings(spark, sf_dir):
    """Hard-negative mining (pipeline/align.py mine_hard_negatives — the
    DPR/bi-encoder training recipe): per query the top-8 most-similar
    corpus vectors that are NOT labeled positives (gold = each query's
    id+1 neighbor here), anti-joined BEFORE ranking so every rank is a
    usable negative, with a 0.98 cosine ceiling as the false-negative
    guard. One scored corpus pass + broadcast anti-join + per-query
    window; the oracle replays scoring, NOT EXISTS, band, and ranks."""
    from truthound_spark.pipeline.align import mine_hard_negatives

    df = t(spark, sf_dir, "embeddings")
    q = df.filter(F.col("vec_id") < 6).withColumnRenamed("vec_id", "query_id")
    pos = (
        df.filter(F.col("vec_id") < 6)
        .select(
            F.col("vec_id").alias("query_id"),
            (F.col("vec_id") + 1).alias("vec_id"),
        )
    )
    return mine_hard_negatives(
        df, q, pos, k=8, max_cosine=0.98
    ).orderBy("query_id", "rank")


@register(
    "curriculum_order_documents",
    """
    WITH sc AS (
      SELECT doc_id,
             CAST(round((CASE WHEN n_chars > 0 THEN LEAST(n_chars / 200.0, 1.0)
                         ELSE 0.0 END) * 1000000.0) AS BIGINT) AS qs
      FROM documents
    ),
    hist AS (SELECT qs, COUNT(*) AS c FROM sc GROUP BY qs),
    tot AS (SELECT SUM(c) AS t FROM hist),
    bands AS (
      SELECT qs,
             CAST(LEAST(
               FLOOR((SUM(c) OVER (ORDER BY qs DESC
                                   ROWS UNBOUNDED PRECEDING) - c) * 4 / tot.t),
               3) AS INT) AS band
      FROM hist, tot
    ),
    keyed AS (
      SELECT sc.doc_id AS id, b.band,
             md5('0:' || CAST(sc.doc_id AS VARCHAR)) AS okey
      FROM sc JOIN bands b ON sc.qs = b.qs
    )
    SELECT id, band,
           CAST(CAST(('0x' || substr(okey, 1, 6)) AS BIGINT) % 8 AS INT) AS shard,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY band, CAST(('0x' || substr(okey, 1, 6)) AS BIGINT) % 8
             ORDER BY okey, id
           ) AS BIGINT) AS position
    FROM keyed ORDER BY id
    """,
)
def q_curriculum_order_documents(spark, sf_dir):
    """Curriculum export order (pipeline/export.py curriculum_order):
    exact quality-quantile bands WITHOUT a global sort — scores quantize
    to 1e-6 longs into a value histogram (distinct-score-sized), whose
    running count gives each value's rank range and band; the corpus
    gets its band via broadcast join, then a per-(band, shard)
    deterministic md5 order. Score here = bounded length signal
    least(n_chars/200, 1). The oracle replays histogram, band
    arithmetic, and the md5 shuffle — exact membership and positions."""
    from truthound_spark.pipeline.export import curriculum_order

    df = t(spark, sf_dir, "documents")
    scored = df.withColumn(
        "score",
        F.when(F.col("n_chars") > 0, F.least(F.col("n_chars") / 200.0, F.lit(1.0)))
        .otherwise(F.lit(0.0)),
    )
    return curriculum_order(scored, "score", n_bands=4, n_shards=8).orderBy("id")


@register(
    "curation_funnel_documents",
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
    ),
    canon AS (
      SELECT node AS id FROM (
        SELECT node, MIN(root) AS root FROM reach GROUP BY node
      ) WHERE root = node
    ),
    c0 AS (SELECT COUNT(*) AS n FROM documents),
    c1 AS (
      SELECT COUNT(DISTINCT md5({_NORM_SQL.format(c='text')})) AS n FROM documents
    ),
    c2 AS (SELECT COUNT(*) AS n FROM canon),
    c3 AS (
      SELECT COUNT(*) AS n FROM canon JOIN documents d ON canon.id = d.doc_id
      WHERE d.n_chars >= 100
    ),
    f(stage_idx, stage, rows) AS (
      SELECT 0, 'raw', (SELECT n FROM c0)
      UNION ALL SELECT 1, 'exact_canonical', (SELECT n FROM c1)
      UNION ALL SELECT 2, 'fuzzy_canonical', (SELECT n FROM c2)
      UNION ALL SELECT 3, 'length_gated', (SELECT n FROM c3)
    )
    SELECT stage_idx, stage, CAST(rows AS BIGINT) AS rows,
           CAST(COALESCE(LAG(rows) OVER (ORDER BY stage_idx) - rows, 0) AS BIGINT)
             AS dropped,
           CASE WHEN LAG(rows) OVER (ORDER BY stage_idx) IS NULL THEN 0.0
                ELSE ROUND(
                  CAST(LAG(rows) OVER (ORDER BY stage_idx) - rows AS DOUBLE)
                    / NULLIF(LAG(rows) OVER (ORDER BY stage_idx), 0), 6)
           END AS drop_rate,
           ROUND(CAST(rows AS DOUBLE) / NULLIF((SELECT n FROM c0), 0), 6)
             AS keep_rate
    FROM f ORDER BY stage_idx
    """,
)
def q_curation_funnel_documents(spark, sf_dir):
    """Curation funnel report (pipeline/report.py curation_funnel): row
    accounting across raw → exact-canonical (distinct fingerprints) →
    fuzzy-canonical (MinHash cluster representatives) → length-gated.
    One O(1)-result count per stage — the audit that catches a silent
    40%% drop no validator would flag. The oracle recomputes each
    stage's membership relationally (recursive-CTE clusters for the
    fuzzy stage) and the same dropped/drop_rate/keep_rate arithmetic."""
    from truthound_spark.pipeline.dedup import content_fingerprint, dedup_clusters
    from truthound_spark.pipeline.report import curation_funnel

    df = t(spark, sf_dir, "documents")
    exact = df.withColumn("__fp", content_fingerprint(F.col("text"))).dropDuplicates(
        ["__fp"]
    )
    clusters = dedup_clusters(df, threshold=0.7, max_bucket_size=None)
    canon = df.join(
        clusters.filter(F.col("is_canonical")).select("doc_id"), "doc_id"
    )
    gated = canon.filter(F.col("n_chars") >= 100)
    return curation_funnel(
        [("raw", df), ("exact_canonical", exact), ("fuzzy_canonical", canon),
         ("length_gated", gated)]
    ).orderBy("stage_idx")


@register(
    "soft_dedup_weights_documents",
    f"""
    WITH fp AS (
      SELECT CAST(doc_id AS BIGINT) AS id,
             md5({_NORM_SQL.format(c='text')}) AS f
      FROM documents
    ),
    sz AS (SELECT f, COUNT(*) AS n FROM fp GROUP BY f)
    SELECT fp.id, CAST(sz.n AS BIGINT) AS n_copies,
           ROUND(1.0 / sz.n, 6) AS weight
    FROM fp JOIN sz ON fp.f = sz.f ORDER BY fp.id
    """,
)
def q_soft_dedup_weights_documents(spark, sf_dir):
    """Soft deduplication (pipeline/dedup.py soft_dedup_weights): every
    copy kept, weighted 1/n_copies so a duplicate family contributes one
    document's worth of training mass — the drop-free alternative that
    preserves the family's best member and its frequency signal.
    Fingerprint groupBy shuffles 32-byte hashes only. The Spark side
    groups on xxhash64(fingerprint) (shorter shuffle key); n_copies is
    identical because md5 fingerprints are already distinct per content,
    so the oracle groups on the fingerprint itself."""
    from truthound_spark.pipeline.dedup import soft_dedup_weights

    df = t(spark, sf_dir, "documents")
    return soft_dedup_weights(df).orderBy("id")


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


@register(
    "ivfpq_search_embeddings",
    _ivfpq_oracle_sql(
        m=2, pq_k=4, iters=1, dim=8, num_cells=8, nprobe=2, n_queries=6, topk=5
    ),
)
def q_ivfpq_search_embeddings(spark, sf_dir):
    """IVF-PQ search (pipeline/similarity.py ivfpq_search — the FAISS
    IVFx,PQy billion-scale layout): seeded coarse cells prune candidates
    to nprobe cells, PQ ADC lookups score them from m-byte codes — the
    corpus vectors are read ONCE (cell + codes in one combined pass) and
    never touched again. Vectors sliced to 8 dims so the generated
    oracle (coarse assignment/probe CTEs composed with the PQ
    train/encode/LUT CTEs) stays reviewable; every stage — Lloyd
    training, coarse argmin, probing, ADC, ranking — hash-matches."""
    from truthound_spark.pipeline.similarity import ivfpq_search

    df = t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.slice(F.col("embedding").cast("array<double>"), 1, 8).alias("embedding"),
    )
    q = df.filter(F.col("vec_id") < 6)
    out = ivfpq_search(
        df, q, k=5, num_cells=8, nprobe=2, m=2, pq_k=4, iters=1,
        query_id_col="vec_id",
    )
    return out.select(
        "query_id", "id", "adc_dist", F.col("rank").cast("long").alias("rank")
    ).orderBy("query_id", "rank")


@register(
    "blocklist_filter_documents",
    f"""
    WITH base AS (
      SELECT CAST(doc_id AS BIGINT) AS id,
             list_distinct(string_split({_NORM_SQL.format(c='text')}, ' ')) AS dw
      FROM documents
    )
    SELECT id,
           list_sort(list_intersect(dw, ['fast', 'shuffle', 'window'])) AS matched_terms,
           CAST(len(list_intersect(dw, ['fast', 'shuffle', 'window'])) AS BIGINT)
             AS n_matched,
           len(list_intersect(dw, ['fast', 'shuffle', 'window'])) > 0 AS blocked
    FROM base ORDER BY id
    """,
)
def q_blocklist_filter_documents(spark, sf_dir):
    """Blocklist screening (pipeline/text.py blocklist_filter — the C4
    bad-words filter shape): whole-word matches against a normalized
    term list that rides in as a broadcast one-row array column (O(1)
    plan size at 10k+ terms), one array_intersect per document. Terms
    here are common corpus words so matches are exercised nonzero. The
    oracle replays the distinct-words intersect and the match
    arithmetic."""
    from truthound_spark.pipeline.text import blocklist_filter

    df = t(spark, sf_dir, "documents")
    return blocklist_filter(df, ["fast", "Shuffle!", "window"]).orderBy("id")


@register(
    "bpe_tokenize_documents",
    _bpe_oracle_ctes(_BPE_ROUNDS)
    + ",\n    mp AS (SELECT "
    + ", ".join(
        f"COALESCE((SELECT '|'||x||'||'||y||'|' FROM m{r}), chr(1)) AS f{r}, "
        f"COALESCE((SELECT '|'||x||y||'|' FROM m{r}), chr(1)) AS t{r}"
        for r in range(1, _BPE_ROUNDS + 1)
    )
    + ")"
    + f""",
    enc AS (
      SELECT doc_id,
             flatten(list_transform(
               list_filter(string_split({_NORM_SQL.format(c='text')}, ' '),
                           w -> w <> ''),
               w -> string_split(trim(
                 {"".join("replace(" for _ in range(_BPE_ROUNDS))}'|' || array_to_string(string_split(w,''),'||') || '|'"""
    + "".join(f", mp.f{r}, mp.t{r})" for r in range(1, _BPE_ROUNDS + 1))
    + """, '|'), '||')
             )) AS tokens
      FROM documents, mp
    )
    SELECT doc_id AS id, tokens, CAST(len(tokens) AS BIGINT) AS n_tokens
    FROM enc ORDER BY id
    """,
)
def q_bpe_tokenize_documents(spark, sf_dir):
    """Materialized BPE tokenization (pipeline/tokenizer.py bpe_tokenize):
    the actual per-document token sequences under the 6 trained merges —
    the trainer-input export form. Map-only (per-word replace chain +
    split + flatten, no shuffles, no UDFs); the oracle retrains the
    merges and replays the identical per-word chain, so token ARRAYS —
    not just counts — hash-match."""
    from truthound_spark.pipeline.tokenizer import bpe_tokenize, bpe_train

    df = t(spark, sf_dir, "documents")
    merges = bpe_train(df, rounds=_BPE_ROUNDS)
    return bpe_tokenize(df, merges).orderBy("id")


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


@register(
    "ivfpq_residual_search_embeddings",
    _ivfpq_residual_oracle_sql(
        m=2, pq_k=4, iters=1, dim=8, num_cells=8, nprobe=2, n_queries=6, topk=5
    ),
)
def q_ivfpq_residual_search_embeddings(spark, sf_dir):
    """RESIDUAL IVF-PQ (pipeline/similarity.py ivfpq_search(residual=
    True) — the canonical FAISS refinement): PQ trains on and encodes
    x − centroid(cell), whose norms are far smaller than raw vectors,
    so the same m·log2(k) bits quantize much more finely; each (query,
    probed cell) pair gets its own ADC LUT over q − centroid(cell).
    The oracle feeds a residual CTE into the source-parameterized PQ
    training replay and scores per probed cell — coarse assignment,
    residual computation, Lloyd training, encoding, per-cell LUTs, and
    ranking all hash-match."""
    from truthound_spark.pipeline.similarity import ivfpq_search

    df = t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.slice(F.col("embedding").cast("array<double>"), 1, 8).alias("embedding"),
    )
    q = df.filter(F.col("vec_id") < 6)
    out = ivfpq_search(
        df, q, k=5, num_cells=8, nprobe=2, m=2, pq_k=4, iters=1,
        query_id_col="vec_id", residual=True,
    )
    return out.select(
        "query_id", "id", "adc_dist", F.col("rank").cast("long").alias("rank")
    ).orderBy("query_id", "rank")


@register(
    "pool_embeddings_by_label",
    """
    WITH ex AS (
      SELECT label, u.pos - 1 AS pos, u.x
      FROM embeddings,
           LATERAL (SELECT unnest(CAST(embedding AS DOUBLE[])) AS x,
                           generate_subscripts(CAST(embedding AS DOUBLE[]), 1) AS pos) u
    ),
    pd AS (
      SELECT label AS "group", pos, COUNT(*) AS n,
             ROUND(SUM(CAST(round(x * 1000000.0) AS BIGINT)) / COUNT(*) / 1000000.0, 6) AS v
      FROM ex GROUP BY 1, 2
    )
    SELECT "group", CAST(MAX(n) AS BIGINT) AS n_vectors,
           list(v ORDER BY pos) AS pooled
    FROM pd GROUP BY 1 ORDER BY 1
    """,
)
def q_pool_embeddings_by_label(spark, sf_dir):
    """Embedding pooling (pipeline/similarity.py pool_embeddings): the
    chunk→document rollup — one mean vector per label group, quantized
    per-dimension long sums so the distributed mean is exact and
    order-independent (the kmeans_vec centroid trick applied to
    pooling). One (group, dim)-keyed shuffle with map-side partials; no
    UDFs. The oracle replays the explode/quantize/mean/ordered-collect
    chain."""
    from truthound_spark.pipeline.similarity import pool_embeddings

    df = t(spark, sf_dir, "embeddings")
    return pool_embeddings(df, "label").orderBy("group")


@register(
    "embedding_drift_embeddings",
    """
    WITH cur AS (
      SELECT list_transform(
               list_zip(CAST(embedding AS DOUBLE[]),
                        range(len(CAST(embedding AS DOUBLE[])))),
               p -> p[1] + p[2] / 100.0) AS v
      FROM embeddings
    ),
    bas AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    exc AS (
      SELECT u.pos - 1 AS pos, u.x FROM cur,
        LATERAL (SELECT unnest(v) AS x, generate_subscripts(v, 1) AS pos) u
    ),
    exb AS (
      SELECT u.pos - 1 AS pos, u.x FROM bas,
        LATERAL (SELECT unnest(v) AS x, generate_subscripts(v, 1) AS pos) u
    ),
    sc AS (
      SELECT pos, COUNT(*) AS n,
             SUM(CAST(round(x * 1000000.0) AS BIGINT)) AS s,
             SUM(CAST(round(x * x * 1000000.0) AS BIGINT)) AS ss
      FROM exc GROUP BY pos
    ),
    sb AS (
      SELECT pos, COUNT(*) AS n,
             SUM(CAST(round(x * 1000000.0) AS BIGINT)) AS s,
             SUM(CAST(round(x * x * 1000000.0) AS BIGINT)) AS ss
      FROM exb GROUP BY pos
    ),
    m AS (
      SELECT sc.pos,
             sb.s / sb.n / 1000000.0 AS mb, sc.s / sc.n / 1000000.0 AS mc,
             GREATEST(sb.ss / sb.n / 1000000.0
               - (sb.s / sb.n / 1000000.0) * (sb.s / sb.n / 1000000.0), 0.0) AS vb,
             GREATEST(sc.ss / sc.n / 1000000.0
               - (sc.s / sc.n / 1000000.0) * (sc.s / sc.n / 1000000.0), 0.0) AS vc
      FROM sc JOIN sb ON sc.pos = sb.pos
    )
    SELECT pos, ROUND(mb, 6) AS mean_base, ROUND(mc, 6) AS mean_cur,
           ROUND(sqrt(vb), 6) AS std_base, ROUND(sqrt(vc), 6) AS std_cur,
           ROUND(CASE WHEN sqrt((vc + vb) / 2) > 0
                 THEN abs(mc - mb) / sqrt((vc + vb) / 2)
                 WHEN abs(mc - mb) > 0 THEN CAST('infinity' AS DOUBLE)
                 ELSE 0.0 END, 6) AS shift
    FROM m ORDER BY pos
    """,
)
def q_embedding_drift_embeddings(spark, sf_dir):
    """Embedding-snapshot drift (pipeline/similarity.py embedding_drift):
    per-dimension mean/std on both sides from exact quantized-long sums
    plus the standardized shift — the regression check after an
    embedding-model update. The entry injects a deterministic
    index-proportional perturbation (x + pos/100) as the 'current'
    snapshot so every dimension's shift is nonzero and grows with pos;
    the oracle replays the mutation and the whole moment arithmetic."""
    from truthound_spark.pipeline.similarity import embedding_drift

    df = t(spark, sf_dir, "embeddings")
    cur = df.select(
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x, i: x + i / F.lit(100.0),
        ).alias("embedding")
    )
    return embedding_drift(cur, df).orderBy("pos")


@register(
    "dedup_pair_evidence_documents",
    f"""
    WITH shf AS (
      SELECT id, list_filter(sh, x -> x <> '') AS sh FROM ({_SHINGLES_SQL})
    ),
    p AS (
      SELECT a.id AS id_a, b.id AS id_b, a.sh AS sa, b.sh AS sb
      FROM shf a JOIN shf b ON a.id < b.id
      WHERE len(list_intersect(a.sh, b.sh))
            / CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS DOUBLE) >= 0.7
    )
    SELECT id_a, id_b,
           CAST(len(list_intersect(sa, sb)) AS BIGINT) AS n_shared,
           list_sort(list_intersect(sa, sb))[1:10] AS shared_ngrams
    FROM p ORDER BY id_a, id_b
    """,
)
def q_dedup_pair_evidence_documents(spark, sf_dir):
    """Near-dup pair EVIDENCE (pipeline/dedup.py dedup_pair_evidence):
    for every flagged MinHash pair, the concrete shared word 3-grams —
    the reviewer-facing WHY behind a deletion decision (the dedup-side
    analogue of the validator layer's evidence sampling). Only docs
    appearing in pairs are shingled (semi-join); the oracle recomputes
    the exhaustive >= 0.7 pair set and the identical sorted/truncated
    intersection."""
    from truthound_spark.pipeline.dedup import dedup_pair_evidence, minhash_dedup_pairs

    df = t(spark, sf_dir, "documents")
    pairs = minhash_dedup_pairs(
        df, threshold=0.7, num_hashes=64, bands=32, max_bucket_size=None
    )
    return dedup_pair_evidence(df, pairs).orderBy("id_a", "id_b")


@register(
    "trigram_backoff_documents",
    f"""
    WITH wd AS (
      SELECT doc_id AS id,
             list_filter(string_split({_NORM_SQL.format(c='text')}, ' '),
                         x -> x <> '') AS w
      FROM documents
    ),
    score_w AS (SELECT * FROM wd WHERE id % 2 = 1),
    ref_w AS (SELECT * FROM wd WHERE id % 2 = 0),
    uni AS (
      SELECT t, COUNT(*) AS c1 FROM (SELECT unnest(w) AS t FROM ref_w) GROUP BY t
    ),
    vt AS (SELECT COUNT(*) AS vocab, (SELECT COUNT(*) FROM (SELECT unnest(w) FROM ref_w)) AS total FROM uni),
    bi AS (
      SELECT p[1] AS wa, p[2] AS wb, COUNT(*) AS cb FROM (
        SELECT unnest(list_zip(w[1:len(w)-1], w[2:len(w)])) AS p FROM ref_w
        WHERE len(w) >= 2
      ) GROUP BY 1, 2
    ),
    rtri AS (
      SELECT p[1] AS w1, p[2] AS w2, p[3] AS w3, COUNT(*) AS c123 FROM (
        SELECT unnest(list_zip(w[1:len(w)-2], w[2:len(w)-1], w[3:len(w)])) AS p
        FROM ref_w WHERE len(w) >= 3
      ) GROUP BY 1, 2, 3
    ),
    pos AS (
      SELECT id, p[1] AS w1, p[2] AS w2, p[3] AS w3 FROM (
        SELECT id, unnest(list_zip(w[1:len(w)-2], w[2:len(w)-1], w[3:len(w)])) AS p
        FROM score_w WHERE len(w) >= 3
      )
    ),
    lp AS (
      SELECT pos.id,
             CAST(round(1000000.0 * (
               CASE WHEN COALESCE(rtri.c123, 0) > 0
                    THEN -ln(rtri.c123 / CAST(b12.cb AS DOUBLE))
                    WHEN COALESCE(b23.cb, 0) > 0
                    THEN -ln(b23.cb / CAST(u2.c1 AS DOUBLE)) - ln(0.4)
                    ELSE -ln((COALESCE(u3.c1, 0) + 1.0)
                             / (vt.total + vt.vocab)) - 2 * ln(0.4)
               END)) AS BIGINT) AS qlp
      FROM pos
      LEFT JOIN rtri ON rtri.w1 = pos.w1 AND rtri.w2 = pos.w2 AND rtri.w3 = pos.w3
      LEFT JOIN bi b12 ON b12.wa = pos.w1 AND b12.wb = pos.w2
      LEFT JOIN bi b23 ON b23.wa = pos.w2 AND b23.wb = pos.w3
      LEFT JOIN uni u2 ON u2.t = pos.w2
      LEFT JOIN uni u3 ON u3.t = pos.w3, vt
    ),
    sc AS (
      SELECT id, COUNT(*) AS n_trigrams,
             SUM(qlp) / COUNT(*) / 1000000.0 AS alp
      FROM lp GROUP BY id
    )
    SELECT w.id, CAST(COALESCE(sc.n_trigrams, 0) AS BIGINT) AS n_trigrams,
           ROUND(sc.alp, 6) AS avg_neg_logprob,
           ROUND(EXP(sc.alp), 6) AS perplexity
    FROM score_w w LEFT JOIN sc ON w.id = sc.id ORDER BY w.id
    """,
)
def q_trigram_backoff_documents(spark, sf_dir):
    """Trigram LM with stupid backoff (pipeline/text.py
    trigram_backoff_score — Brants et al. 2007): the model trains on
    even-id docs, odd-id docs are scored, so unseen grams genuinely
    exercise every backoff level (trigram → α·bigram → α²·add-one
    unigram). Exact corpus counts + quantized per-position −ln p means
    make the whole three-level model hash-certifiable. A sharper
    noise/boilerplate signal than the bigram model — 3-gram context
    separates fluent text from locally-plausible garble."""
    from truthound_spark.pipeline.text import trigram_backoff_score

    df = t(spark, sf_dir, "documents")
    return trigram_backoff_score(
        df.filter(F.col("doc_id") % 2 == 1),
        reference=df.filter(F.col("doc_id") % 2 == 0),
    ).orderBy("id")


@register(
    "embedding_health_check_embeddings",
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
    )
    SELECT
      CAST(SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
      CAST(SUM(CASE WHEN v IS NOT NULL
                     AND len(list_filter(v, x -> isnan(x))) > 0
               THEN 1 ELSE 0 END) AS BIGINT) AS n_nan,
      CAST(SUM(CASE WHEN v IS NOT NULL AND len(v) > 0
                     AND len(list_filter(v, x -> x <> 0.0)) = 0
               THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
      CAST(SUM(CASE WHEN v IS NOT NULL AND len(v) <> (SELECT dim_ref FROM dref)
               THEN 1 ELSE 0 END) AS BIGINT) AS n_dim_mismatch,
      FALSE AS check_success
    FROM mut
    """,
)
def q_embedding_health_check_embeddings(spark, sf_dir):
    """Vector-column validation through the PUBLIC check() path
    (validators/corpus.py EmbeddingHealthValidator): the same injected
    failure modes as the embedding_stats slot (null @ id%53, zero @
    id%71, NaN @ id%89, truncated dim @ id%61), but counted by the
    fused-agg validator inside th.check — certifying that embedding
    health runs as a first-class suite member, not just a pipeline
    report. Oracle recomputes all four counters + the failing verdict."""
    import truthound_spark as th
    from truthound_spark.validators.corpus import EmbeddingHealthValidator

    df = t(spark, sf_dir, "embeddings")
    idc = F.col("vec_id").cast("long")
    v = F.col("embedding").cast("array<double>")
    mut = df.select(
        F.when(idc % 53 == 0, F.lit(None).cast("array<double>"))
        .when(idc % 71 == 0, F.transform(v, lambda x: F.lit(0.0)))
        .when(
            idc % 89 == 0,
            F.concat(F.slice(v, 2, F.size(v)), F.array(F.lit(float("nan")))),
        )
        .when(idc % 61 == 0, F.slice(v, 1, F.size(v) - 1))
        .otherwise(v)
        .alias("embedding")
    )
    res = th.check(mut, validators=[EmbeddingHealthValidator()])
    by_type = {i.issue_type: i.count for i in res.issues}
    return _scalar_df(
        spark,
        n_null=int(by_type.get("null_vectors", 0)),
        n_nan=int(by_type.get("nan_components", 0)),
        n_zero=int(by_type.get("zero_vectors", 0)),
        n_dim_mismatch=int(by_type.get("dim_mismatch", 0)),
        check_success=bool(res.success),
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


@register("ann_lsh_multiprobe_topk", _lsh_multiprobe_oracle())
def q_ann_lsh_multiprobe_topk(spark, sf_dir):
    """Multi-probe sign-LSH top-k (pipeline/similarity.py lsh_topk with
    probe_hamming=1 — Lv et al. 2007): each query additionally probes
    the num_planes buckets one sign-flip away, recovering the near-miss
    neighbors a single-bucket probe loses WITHOUT coarsening the
    bucketing — the corpus side (and any persisted bucketed layout) is
    untouched; only the tiny broadcast query side fans out. Same seeded
    planes as literals in the oracle; candidates = Hamming ≤ 1 bucket
    match, identical ranks."""
    from truthound_spark.pipeline.similarity import lsh_topk

    df = t(spark, sf_dir, "embeddings")
    queries = df.filter(F.col("vec_id") < 5)
    res = lsh_topk(df, queries, k=5, num_planes=6, probe_hamming=1)
    return res.select(
        "query_id", "id", F.round("cosine", 6).alias("cosine"), "rank"
    ).orderBy("query_id", "rank")


@register(
    "dedup_threshold_curve_documents",
    f"""
    WITH shf AS (
      SELECT id, list_filter(sh, x -> x <> '') AS sh FROM ({_SHINGLES_SQL})
    ),
    p AS (
      SELECT a.id AS id_a, b.id AS id_b,
             len(list_intersect(a.sh, b.sh))
               / CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS DOUBLE)
               AS jaccard
      FROM shf a JOIN shf b ON a.id < b.id
      WHERE len(list_intersect(a.sh, b.sh)) > 0
    ),
    binned AS (
      SELECT ROUND(FLOOR(round(jaccard * 1000000.0) / 1000000.0 / 0.05) * 0.05, 6)
               AS bin_lo
      FROM p WHERE jaccard >= 0.05
    ),
    hist AS (SELECT bin_lo, COUNT(*) AS n_pairs FROM binned GROUP BY bin_lo)
    SELECT bin_lo, CAST(n_pairs AS BIGINT) AS n_pairs,
           CAST(SUM(n_pairs) OVER (ORDER BY bin_lo DESC
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS n_pairs_at_least
    FROM hist ORDER BY bin_lo DESC
    """,
)
def q_dedup_threshold_curve_documents(spark, sf_dir):
    """Dedup threshold calibration curve (pipeline/dedup.py
    dedup_threshold_curve): binned pair counts by exact Jaccard with the
    cumulative from-the-top totals — the evidence behind choosing 0.7
    instead of guessing. Exact down to min_jaccard because the
    inverted-index path's candidates are complete (any overlapping pair
    shares a shingle); the oracle recomputes the exhaustive pair set
    and the identical binning/cumulative arithmetic."""
    from truthound_spark.pipeline.dedup import dedup_threshold_curve

    df = t(spark, sf_dir, "documents")
    return dedup_threshold_curve(df).orderBy(F.desc("bin_lo"))


# ===========================================================================
# rule/threshold learning (truthound_spark/ml/ — reference
# profiler/auto_threshold.py, ml/rule_learning/*)
# ===========================================================================


@register(
    "learned_thresholds_lineitem",
    """
    WITH runs AS (
      SELECT l_orderkey % 4 AS snap,
             MIN(l_quantity) AS qmin, MAX(l_quantity) AS qmax,
             AVG(l_quantity) AS qmean, STDDEV(l_quantity) AS qstd,
             COUNT(*) AS n
      FROM lineitem WHERE l_orderkey % 4 IN (0, 1, 2)
      GROUP BY 1
    ),
    learned AS (
      SELECT MIN(qmin) - 0.1 * (MAX(qmax) - MIN(qmin)) AS qty_lo,
             MAX(qmax) + 0.1 * (MAX(qmax) - MIN(qmin)) AS qty_hi,
             MIN(qmean) - 3 * MAX(qstd) AS qmean_lo,
             MAX(qmean) + 3 * MAX(qstd) AS qmean_hi,
             CAST(FLOOR(MIN(n) * 0.8) AS BIGINT) AS rows_lo,
             CAST(CEIL(MAX(n) * 1.2) AS BIGINT) AS rows_hi
      FROM runs
    ),
    probe AS (
      SELECT CASE WHEN l_orderkey % 8 = 7 THEN l_quantity + 30
                  ELSE l_quantity END AS q
      FROM lineitem WHERE l_orderkey % 4 = 3
    ),
    pstat AS (SELECT AVG(q) AS pmean, COUNT(*) AS pn FROM probe),
    viol AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS v
      FROM probe, learned WHERE q < qty_lo OR q > qty_hi
    )
    SELECT ROUND(l.qty_lo, 6) AS qty_lo,
           ROUND(l.qty_hi, 6) AS qty_hi,
           v.v AS qty_viol,
           ROUND(l.qmean_lo, 4) AS qmean_lo,
           ROUND(l.qmean_hi, 4) AS qmean_hi,
           (p.pmean >= l.qmean_lo AND p.pmean <= l.qmean_hi) AS mean_ok,
           l.rows_lo AS rows_lo, l.rows_hi AS rows_hi,
           (p.pn >= l.rows_lo AND p.pn <= l.rows_hi) AS rows_ok
    FROM learned l, pstat p, viol v
    """,
)
def q_learned_thresholds_lineitem(spark, sf_dir):
    """History-based threshold learning e2e (ml/auto_threshold.py
    HistoryThresholdLearner; reference profiler/auto_threshold.py +
    "learn from run history" evolution loop): profile snapshots 0..2 of
    lineitem (l_orderkey%4) with the distributed one-pass profiler, learn
    range/mean-band/row-count gates via the closed-form history formulas,
    emit the suite with thresholds_to_suite, and run it through the REAL
    fused check() path against a probe snapshot (%4==3) with an injected
    +30 quantity shift on half its rows. The oracle replays the profile
    aggregates, the learned-bound arithmetic, and the violation counts."""
    from truthound_spark.api import check
    from truthound_spark.ml import HistoryThresholdLearner, thresholds_to_suite
    from truthound_spark.profiler.table_profiler import profile_grouped

    df = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity", "l_discount")
    cols = ["l_quantity", "l_discount"]
    # whole history in ONE grouped scan (profile_grouped) — bit-identical
    # stats to three per-snapshot profile() calls
    snaps = profile_grouped(
        df.filter(F.col("l_orderkey") % 4 != 3).select(
            (F.col("l_orderkey") % 4).alias("__snap"), *cols
        ),
        "__snap",
    )
    history = [snaps[k] for k in sorted(snaps)]
    tt = HistoryThresholdLearner().learn(history, table="lineitem")
    probe = df.filter(F.col("l_orderkey") % 4 == 3).select(
        F.when(F.col("l_orderkey") % 8 == 7, F.col("l_quantity") + 30)
        .otherwise(F.col("l_quantity"))
        .alias("l_quantity"),
        F.col("l_discount"),
    )
    res = check(probe, validators=thresholds_to_suite(tt))
    qty = tt.get_column("l_quantity")
    qty_viol = next(
        (
            i.count
            for i in res.issues
            if i.issue_type == "out_of_range" and i.column == "l_quantity"
        ),
        0,
    )
    mean_ok = not any(
        i.issue_type == "aggregate_out_of_range" and i.column == "l_quantity"
        for i in res.issues
    )
    rows_ok = not any(i.issue_type == "row_count_out_of_range" for i in res.issues)
    return _scalar_df(
        spark,
        qty_lo=round(qty.min_value, 6),
        qty_hi=round(qty.max_value, 6),
        qty_viol=int(qty_viol),
        qmean_lo=round(qty.mean_min, 4),
        qmean_hi=round(qty.mean_max, 4),
        mean_ok=bool(mean_ok),
        rows_lo=int(tt.row_count_min),
        rows_hi=int(tt.row_count_max),
        rows_ok=bool(rows_ok),
    )


@register(
    "fd_mining_orders",
    """
    WITH g1 AS (
      SELECT o_custkey AS k, COUNT(DISTINCT o_orderstatus) AS u
      FROM orders GROUP BY 1
    ),
    g2 AS (
      SELECT o_custkey AS k, COUNT(DISTINCT o_orderpriority) AS u
      FROM orders GROUP BY 1
    ),
    g3 AS (
      SELECT o_orderstatus AS k, COUNT(DISTINCT o_orderpriority) AS u
      FROM orders GROUP BY 1
    )
    SELECT * FROM (
      SELECT 'o_custkey' AS determinant, 'o_orderstatus' AS dependent,
             ROUND(SUM(CASE WHEN u <= 1 THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6)
               AS confidence,
             (MAX(u) <= 1) AS holds
      FROM g1
      UNION ALL
      SELECT 'o_custkey', 'o_orderpriority',
             ROUND(SUM(CASE WHEN u <= 1 THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6),
             (MAX(u) <= 1)
      FROM g2
      UNION ALL
      SELECT 'o_orderstatus', 'o_orderpriority',
             ROUND(SUM(CASE WHEN u <= 1 THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6),
             (MAX(u) <= 1)
      FROM g3
    ) ORDER BY determinant, dependent
    """,
)
def q_fd_mining_orders(spark, sf_dir):
    """Functional-dependency mining (ml/rule_learning.py ConstraintMiner;
    reference constraint_miner.py:163-260): X→Y confidence = fraction of
    determinant groups with a single dependent value. The Spark plan is
    ONE groupBy per determinant covering all its dependents (o_custkey's
    two dependents share one shuffle) — exact over the full table, never
    a sampled driver collect like the reference."""
    from truthound_spark.ml import ConstraintMiner

    df = t(spark, sf_dir, "orders")
    res = ConstraintMiner(
        min_confidence=0.0, min_support=0.0, discover_value_implications=False
    ).learn_rules(
        df,
        fd_candidates=[
            ("o_custkey", "o_orderstatus"),
            ("o_custkey", "o_orderpriority"),
            ("o_orderstatus", "o_orderpriority"),
        ],
    )
    rows = [
        (r.column[0], r.column[1], round(r.confidence, 6), r.confidence == 1.0)
        for r in res.by_type("functional_dependency")
    ]
    return (
        spark.createDataFrame(
            rows, "determinant string, dependent string, confidence double, holds boolean"
        )
        .orderBy("determinant", "dependent")
    )


@register(
    "grouped_check_lineitem",
    """
    SELECT l_returnflag AS grp,
           CAST(COUNT(*) AS BIGINT) AS row_count,
           CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 30 THEN 1 ELSE 0 END)
                AS BIGINT) AS qty_viol,
           CAST(SUM(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS disc_nulls,
           (AVG(l_extendedprice) BETWEEN 20000 AND 60000) AS price_mean_ok
    FROM lineitem
    GROUP BY 1 ORDER BY 1
    """,
)
def q_grouped_check_lineitem(spark, sf_dir):
    """Segmented validation (api.check_grouped): one suite evaluated per
    segment in a SINGLE grouped aggregate — the per-day/per-source
    quality-gate primitive. Generalizes the fused-suite executor
    (reference base.py:2309-2471 batch execution; the reference's grouped
    validators are ad-hoc only, freshness.py:211). The oracle replays the
    per-group violation counts and the judged mean gate in plain SQL."""
    from truthound_spark.api import check_grouped
    from truthound_spark.validators.aggregate import MeanBetweenValidator
    from truthound_spark.validators.completeness import NullValidator
    from truthound_spark.validators.distribution import RangeValidator

    df = t(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_discount", "l_extendedprice"
    )
    res = check_grouped(
        df,
        "l_returnflag",
        [
            RangeValidator("l_quantity", 1, 30),
            NullValidator("l_discount"),
            MeanBetweenValidator("l_extendedprice", 20000, 60000),
        ],
    )
    rows = []
    for grp in sorted(res):
        r = res[grp]
        qty = next(
            (i.count for i in r.issues if i.issue_type == "out_of_range"), 0
        )
        nulls = next(
            (i.count for i in r.issues if i.issue_type == "null_values"), 0
        )
        mean_ok = not any(
            i.issue_type == "aggregate_out_of_range" for i in r.issues
        )
        rows.append((grp, r.row_count, int(qty), int(nulls), bool(mean_ok)))
    return spark.createDataFrame(
        rows,
        "grp string, row_count bigint, qty_viol bigint, disc_nulls bigint, "
        "price_mean_ok boolean",
    ).orderBy("grp")


@register(
    "value_implications_orders",
    """
    WITH base AS (
      SELECT substr(o_orderpriority, 1, 1) AS prio_digit,
             o_orderpriority, o_orderstatus
      FROM orders
    ),
    n AS (SELECT COUNT(*) AS total FROM base),
    pairs AS (
      SELECT 'prio_digit' AS cond_col, prio_digit AS cond_val,
             'o_orderpriority' AS exp_col, o_orderpriority AS exp_val,
             COUNT(*) AS c,
             SUM(COUNT(*)) OVER (PARTITION BY prio_digit) AS xt
      FROM base GROUP BY prio_digit, o_orderpriority
      UNION ALL
      SELECT 'prio_digit', prio_digit, 'o_orderstatus', o_orderstatus,
             COUNT(*), SUM(COUNT(*)) OVER (PARTITION BY prio_digit)
      FROM base GROUP BY prio_digit, o_orderstatus
      UNION ALL
      SELECT 'o_orderpriority', o_orderpriority, 'prio_digit', prio_digit,
             COUNT(*), SUM(COUNT(*)) OVER (PARTITION BY o_orderpriority)
      FROM base GROUP BY o_orderpriority, prio_digit
      UNION ALL
      SELECT 'o_orderpriority', o_orderpriority, 'o_orderstatus', o_orderstatus,
             COUNT(*), SUM(COUNT(*)) OVER (PARTITION BY o_orderpriority)
      FROM base GROUP BY o_orderpriority, o_orderstatus
      UNION ALL
      SELECT 'o_orderstatus', o_orderstatus, 'prio_digit', prio_digit,
             COUNT(*), SUM(COUNT(*)) OVER (PARTITION BY o_orderstatus)
      FROM base GROUP BY o_orderstatus, prio_digit
      UNION ALL
      SELECT 'o_orderstatus', o_orderstatus, 'o_orderpriority', o_orderpriority,
             COUNT(*), SUM(COUNT(*)) OVER (PARTITION BY o_orderstatus)
      FROM base GROUP BY o_orderstatus, o_orderpriority
    )
    SELECT cond_col, cond_val, exp_col, exp_val,
           ROUND(c * 1.0 / xt, 6) AS confidence,
           ROUND(c * 1.0 / (SELECT total FROM n), 6) AS support
    FROM pairs
    WHERE c * 1.0 / xt >= 0.9
      AND c * 1.0 / (SELECT total FROM n) >= 0.01
      AND cond_val IS NOT NULL
    ORDER BY cond_col, cond_val, exp_col, exp_val
    """,
)
def q_value_implications_orders(spark, sf_dir):
    """Value-implication mining (ConstraintMiner._mine_implications;
    reference constraint_miner.py:262-326): X=x ⇒ Y=y rules with
    confidence ≥ 0.9 and support ≥ 1%. Ground truth: the priority
    digit and the full o_orderpriority string determine each other
    (10 perfect rules), while pairs involving o_orderstatus fall under
    the confidence gate and are filtered. groupBy(X,Y) + a window over
    X computes confidence distributed; only mined rules reach the
    driver."""
    from truthound_spark.ml import ConstraintMiner

    df = t(spark, sf_dir, "orders").select(
        F.substring("o_orderpriority", 1, 1).alias("prio_digit"),
        "o_orderpriority",
        "o_orderstatus",
    )
    res = ConstraintMiner(
        min_confidence=0.9, min_support=0.01, discover_functional_deps=False
    ).learn_rules(df)
    rows = [
        (
            r.validator_config["condition_column"],
            r.validator_config["condition_value"],
            r.validator_config["expected_column"],
            r.validator_config["expected_value"],
            round(r.confidence, 6),
            round(r.support, 6),
        )
        for r in res.by_type("value_implication")
    ]
    return spark.createDataFrame(
        rows,
        "cond_col string, cond_val string, exp_col string, exp_val string,"
        " confidence double, support double",
    ).orderBy("cond_col", "cond_val", "exp_col", "exp_val")


@register(
    "pattern_rules_customer",
    r"""
    WITH h AS (
      SELECT regexp_replace(
               regexp_replace(
                 regexp_replace(c_name, '[0-9]+', '9', 'g'),
                 '[A-Za-z]+', 'A', 'g'),
               '\s+', ' ', 'g') AS pattern,
             COUNT(*) AS n
      FROM customer WHERE c_name IS NOT NULL GROUP BY 1
    ),
    tot AS (SELECT SUM(n) AS total FROM h)
    SELECT pattern, CAST(n AS BIGINT) AS n,
           ROUND(n * 1.0 / (SELECT total FROM tot), 6) AS coverage
    FROM h ORDER BY n DESC, pattern LIMIT 3
    """,
)
def q_pattern_rules_customer(spark, sf_dir):
    """Pattern learning (ml/rule_learning.py PatternRuleLearner;
    reference pattern_learner.py:343-425 D/A/S class generalization):
    strings collapse to character-class patterns via a JVM-side
    regexp_replace chain (digit runs→'9', letter runs→'A', whitespace
    →'_'), histogrammed by ONE groupBy over the generalized pattern —
    distinct patterns ≪ distinct values, so driver traffic is
    pattern-count rows. 'Customer#000000042' → 'A#9'."""
    from truthound_spark.ml.rule_learning import PatternRuleLearner

    df = t(spark, sf_dir, "customer")
    hist = PatternRuleLearner().pattern_histogram(df, "c_name")
    return hist.select(
        "pattern", F.col("n").cast("long").alias("n"), F.round("coverage", 6).alias("coverage")
    ).limit(3)


@register(
    "profile_rules_customer",
    """
    WITH rng_bal AS (
      SELECT quantile_cont(c_acctbal, 0.01) AS lo, quantile_cont(c_acctbal, 0.99) AS hi
      FROM customer
    ),
    rng_key AS (
      SELECT quantile_cont(c_custkey, 0.01) AS lo, quantile_cont(c_custkey, 0.99) AS hi
      FROM customer
    )
    SELECT * FROM (
      SELECT 'not_null_c_acctbal' AS name, 'not_null' AS rule_type,
             'c_acctbal' AS column_name,
             CAST(NULL AS DOUBLE) AS lo, CAST(NULL AS DOUBLE) AS hi
      UNION ALL
      SELECT 'not_null_c_custkey', 'not_null', 'c_custkey', NULL, NULL
      UNION ALL
      SELECT 'unique_c_custkey', 'unique', 'c_custkey', NULL, NULL
      WHERE (SELECT ROUND(COUNT(DISTINCT c_custkey) * 1.0 / COUNT(c_custkey), 6)
             FROM customer) >= 0.999
      UNION ALL
      SELECT 'unique_c_acctbal', 'unique', 'c_acctbal', NULL, NULL
      WHERE (SELECT ROUND(COUNT(DISTINCT c_acctbal) * 1.0 / COUNT(c_acctbal), 6)
             FROM customer) >= 0.999
      UNION ALL
      SELECT 'range_c_acctbal', 'range', 'c_acctbal', ROUND(lo, 6), ROUND(hi, 6)
      FROM rng_bal
      UNION ALL
      SELECT 'range_c_custkey', 'range', 'c_custkey', ROUND(lo, 6), ROUND(hi, 6)
      FROM rng_key
      UNION ALL
      SELECT 'non_negative_c_custkey', 'min_value', 'c_custkey', 0.0, NULL
    ) ORDER BY name
    """,
)
def q_profile_rules_customer(spark, sf_dir):
    """Profile→rule learning (ml/rule_learning.py DataProfileRuleLearner;
    reference profile_learner.py:299-458): strict strictness fences
    ranges at exact p01/p99 (one fused percentile aggregate across all
    numeric columns), emits not_null (null_ratio < 1%), unique
    (unique_ratio ≥ 0.999), and non-negative (observed min ≥ 0) rules.
    The oracle replays every learned bound."""
    from truthound_spark.ml import DataProfileRuleLearner

    df = t(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    res = DataProfileRuleLearner(strictness="strict").learn_rules(df)
    rows = [
        (
            r.name,
            r.rule_type,
            r.column,
            (
                round(float(r.validator_config["min_value"]), 6)
                if r.validator_config.get("min_value") is not None
                else None
            ),
            (
                round(float(r.validator_config["max_value"]), 6)
                if r.validator_config.get("max_value") is not None
                else None
            ),
        )
        for r in res.rules
    ]
    return spark.createDataFrame(
        rows, "name string, rule_type string, column_name string, lo double, hi double"
    ).orderBy("name")


@register(
    "incremental_profile_merge_lineitem",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) - COUNT(l_quantity) AS BIGINT) AS qty_nulls,
           ROUND(MIN(l_quantity), 6) AS qty_min,
           ROUND(MAX(l_quantity), 6) AS qty_max,
           TRUE AS mean_merge_exact,
           TRUE AS std_merge_exact,
           ROUND(AVG(LENGTH(l_returnflag)), 6) AS flag_avg_len,
           TRUE AS distinct_within_5pct
    FROM lineitem
    """,
)
def q_incremental_profile_merge_lineitem(spark, sf_dir):
    """Incremental profiling (profiler/incremental.py; reference
    profiler/incremental.py:230-519 ProfileMerger): three snapshot
    partial profiles (l_orderkey%3 splits — each ONE scan of its split,
    mergeable count/sum/sum²/min/max + Datasketches HLL binary) merged
    by hll_union_agg + algebraic sums into the full-table profile. The
    oracle certifies counts/nulls/extremes/avg-length against one-shot
    full-table SQL aggregates by VALUE; mean/std are pinned as
    merge-exactness booleans vs Spark's own full-table aggregate (the
    3-way partial-sum association shifts the last float ulp, which a
    fixed decimal rounding can land on — e.g. mean 25.40225); the HLL
    distinct estimate is pinned to within 5% of exact (the documented
    sketch contract)."""
    from truthound_spark.profiler.incremental import merge_partials, partial_profile

    df = t(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_returnflag"]
    parts = [
        partial_profile(df.filter(F.col("l_orderkey") % 3 == i), f"s{i}", cols)
        for i in range(3)
    ]
    merged = merge_partials(parts[0].unionByName(parts[1]).unionByName(parts[2]))
    qty = merged.columns["l_quantity"]
    flag = merged.columns["l_returnflag"]
    full = df.agg(
        F.countDistinct("l_quantity").alias("d"),
        F.avg("l_quantity").alias("m"),
        F.stddev("l_quantity").alias("s"),
    ).collect()[0]
    close = abs(qty.distinct_count - full["d"]) / full["d"] < 0.05
    mean_exact = abs(qty.mean - full["m"]) <= 1e-9 * abs(full["m"])
    std_exact = abs(qty.std - full["s"]) <= 1e-6 * abs(full["s"])
    return _scalar_df(
        spark,
        n_rows=int(merged.row_count),
        qty_nulls=int(qty.null_count),
        qty_min=round(float(qty.min), 6),
        qty_max=round(float(qty.max), 6),
        mean_merge_exact=bool(mean_exact),
        std_merge_exact=bool(std_exact),
        flag_avg_len=round(flag.avg_length, 6),
        distinct_within_5pct=bool(close),
    )


@register(
    "profile_evolution_drift_lineitem",
    """
    WITH old_h AS (
      SELECT AVG(l_quantity) AS m, STDDEV(l_quantity) AS s, COUNT(*) AS n
      FROM lineitem WHERE l_orderkey % 2 = 0
    ),
    new_h AS (
      SELECT AVG(l_quantity + 50) AS m, COUNT(*) AS n
      FROM lineitem WHERE l_orderkey % 2 = 1
    )
    SELECT ROUND(ABS(n2.m - o.m) / o.s, 2) AS mean_shift_sigmas,
           (ABS(n2.m - o.m) / o.s > 3.0) AS mean_flagged,
           CASE WHEN ABS(n2.m - o.m) / o.s > 9.0 THEN 'critical'
                WHEN ABS(n2.m - o.m) / o.s > 3.0 THEN 'warning'
                ELSE 'none' END AS mean_severity,
           (ABS(n2.n - o.n) * 1.0 / o.n > 0.3) AS rows_flagged
    FROM old_h o, new_h n2
    """,
)
def q_profile_evolution_drift_lineitem(spark, sf_dir):
    """Profile-over-time comparison (profiler/evolution.py
    compare_profiles; reference profiler/comparison.py DriftDetector +
    DriftThresholds): two profile runs (even/odd orderkey halves, the
    'new' half shifted +50) diffed driver-side — mean drift measured in
    old-σ units, warning at the 3σ gate, critical at 3× the gate. The
    oracle replays the per-half aggregates and the drift arithmetic."""
    from truthound_spark.profiler.evolution import compare_profiles
    from truthound_spark.profiler.table_profiler import profile as profile_fn

    df = t(spark, sf_dir, "lineitem")
    old = profile_fn(
        df.filter(F.col("l_orderkey") % 2 == 0).select("l_quantity"),
        with_duplicates=False,
        top_k=0,
    )
    new = profile_fn(
        df.filter(F.col("l_orderkey") % 2 == 1).select(
            (F.col("l_quantity") + 50).alias("l_quantity")
        ),
        with_duplicates=False,
        top_k=0,
    )
    cmp = compare_profiles(old, new)
    mean_drifts = cmp.get_by_type("mean")
    flagged = bool(mean_drifts)
    sev = mean_drifts[0].severity if mean_drifts else "none"
    shift = (
        abs(float(new.columns["l_quantity"].mean) - float(old.columns["l_quantity"].mean))
        / float(old.columns["l_quantity"].std)
    )
    rows_flagged = any(d.drift_type == "row_count" for d in cmp.drifts)
    return _scalar_df(
        spark,
        mean_shift_sigmas=round(shift, 2),
        mean_flagged=flagged,
        mean_severity=sev,
        rows_flagged=bool(rows_flagged),
    )


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


@register("conditional_rules_lineitem", _cond_rule_sql())
def q_conditional_rules_lineitem(spark, sf_dir):
    """Conditional-constraint mining (ml/rule_learning.py
    ConstraintMiner._mine_conditionals; reference constraint_miner.py:
    328-455): null implications, positive implications, and X≤Y
    orderings over (quantity, price, discount). The reference runs
    3·C² filter passes over collected rows; here the entire candidate
    grid costs ONE fused aggregate (every stat is a sum of boolean
    products). The oracle replays each pair's coverage and confidence
    gates."""
    from truthound_spark.ml import ConstraintMiner

    df = t(spark, sf_dir, "lineitem").select(
        "l_quantity", "l_extendedprice", "l_discount"
    )
    res = ConstraintMiner(
        min_confidence=0.0,
        min_support=0.0,
        max_rules=1000,
        discover_functional_deps=False,
        discover_value_implications=False,
        discover_conditional_rules=True,
    ).learn_rules(df)
    rows = [
        (r.name, r.rule_type, round(r.confidence, 6), round(r.support, 6))
        for r in res.rules
    ]
    return spark.createDataFrame(
        rows, "name string, rule_type string, confidence double, support double"
    ).orderBy("name")


@register(
    "composite_fd_orders",
    """
    WITH base AS (
      SELECT o_orderkey % 10 AS k_lo,
             CAST(FLOOR(o_orderkey / 10) AS BIGINT) AS k_hi,
             o_orderpriority
      FROM orders
    ),
    g2 AS (
      SELECT k_lo, k_hi, COUNT(DISTINCT o_orderpriority) AS u
      FROM base GROUP BY k_lo, k_hi
    ),
    g1 AS (
      SELECT k_lo, COUNT(DISTINCT o_orderpriority) AS u
      FROM base GROUP BY k_lo
    )
    SELECT * FROM (
      SELECT 'fd_k_lo_k_hi_to_o_orderpriority' AS name,
             ROUND(SUM(CASE WHEN u <= 1 THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6)
               AS confidence,
             (MAX(u) <= 1) AS holds
      FROM g2
      UNION ALL
      SELECT 'fd_k_lo_to_o_orderpriority',
             ROUND(SUM(CASE WHEN u <= 1 THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6),
             (MAX(u) <= 1)
      FROM g1
    ) ORDER BY name
    """,
)
def q_composite_fd_orders(spark, sf_dir):
    """Composite-determinant FD mining (ml/rule_learning.py
    ConstraintMiner._mine_fds; reference constraint_miner.py:222-254
    (X1,X2)→Y): the derived (k_lo, k_hi) decomposition of o_orderkey is
    jointly a unique key — the composite FD holds at confidence 1.0
    while k_lo alone (10 groups) fails. Same one-groupBy-per-determinant
    plan as single FDs, shuffle keyed on the determinant columns."""
    from truthound_spark.ml import ConstraintMiner

    df = t(spark, sf_dir, "orders").select(
        (F.col("o_orderkey") % 10).alias("k_lo"),
        F.floor(F.col("o_orderkey") / 10).cast("long").alias("k_hi"),
        "o_orderpriority",
    )
    res = ConstraintMiner(
        min_confidence=0.0, min_support=0.0, discover_value_implications=False
    ).learn_rules(
        df,
        fd_candidates=[
            (("k_lo", "k_hi"), "o_orderpriority"),
            ("k_lo", "o_orderpriority"),
        ],
    )
    rows = [
        (r.name, round(r.confidence, 6), r.confidence == 1.0)
        for r in res.by_type("functional_dependency")
    ]
    return spark.createDataFrame(
        rows, "name string, confidence double, holds boolean"
    ).orderBy("name")


@register(
    "lsh_recall_eval_documents",
    f"""
    WITH sh AS ({_SHINGLES_SQL}),
    inv AS (SELECT id, unnest(sh) AS g FROM sh),
    pairs AS (
      SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS inter
      FROM inv a JOIN inv b ON a.g = b.g AND a.id < b.id
      GROUP BY 1, 2
    ),
    sz AS (SELECT id, len(sh) AS sz FROM sh),
    jp AS (
      SELECT round(inter / CAST(sa.sz + sb.sz - inter AS DOUBLE) * 1000000.0)
               / 1000000.0 AS j
      FROM pairs p JOIN sz sa ON p.id_a = sa.id JOIN sz sb ON p.id_b = sb.id
      WHERE inter / CAST(sa.sz + sb.sz - inter AS DOUBLE) >= 0.2
    )
    SELECT ROUND(FLOOR(j / 0.1) * 0.1, 6) AS bin_lo,
           CAST(COUNT(*) AS BIGINT) AS n_true,
           TRUE AS coverage_sane,
           TRUE AS full_recall_above_bands_knee
    FROM jp GROUP BY 1 ORDER BY bin_lo DESC
    """,
)
def q_lsh_recall_eval_documents(spark, sf_dir):
    """Measured LSH recall per Jaccard bin (pipeline/dedup.py
    lsh_recall_eval) — the (num_hashes, bands) tuning loop: exact
    inverted-index pairs are ground truth, banded candidates are
    measured against them. The exact side (bin_lo, n_true) hash-matches
    the SQL replay; the candidate side rides Spark xxhash64 (not
    reproducible in DuckDB), so its contract is pinned as invariants:
    0 ≤ n_covered ≤ n_true per bin (coverage_sane), and every bin at or
    above the 32-band S-curve knee (≥ 0.65, where theoretical recall
    exceeds 1−1e-8) is fully covered. The recall-degradation behavior at
    low similarity is pytest-pinned with a seeded corpus."""
    from truthound_spark.pipeline.dedup import lsh_recall_eval

    df = t(spark, sf_dir, "documents")
    r = lsh_recall_eval(
        df, num_hashes=64, bands=32, min_jaccard=0.2, bin_width=0.1
    ).orderBy(F.desc("bin_lo"))
    return r.select(
        "bin_lo",
        "n_true",
        ((F.col("n_covered") >= 0) & (F.col("n_covered") <= F.col("n_true"))).alias(
            "coverage_sane"
        ),
        ((F.col("bin_lo") < 0.65) | (F.col("n_covered") == F.col("n_true"))).alias(
            "full_recall_above_bands_knee"
        ),
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


@register(
    "logreg_train_documents",
    _logreg_weight_ctes(_LOGREG_ITERS)
    + "\n    SELECT * FROM (\n    "
    + "\n    UNION ALL ".join(
        f"SELECT {it} AS iter, round(wb, 6) AS w_bias, round(w1, 6) AS w_x1,"
        f" round(w2, 6) AS w_x2 FROM w{it}"
        for it in range(1, _LOGREG_ITERS + 1)
    )
    + "\n    ) ORDER BY iter",
)
def q_logreg_train_documents(spark, sf_dir):
    """Distributed batch-GD logistic regression, hash-certified THROUGH
    THE ITERATIONS (pipeline/regression.py logreg_train): is-English
    probe over (kilochars, hectospaces), 3 full gradient rounds.
    Quantized-long gradient sums make every round's weight vector
    bit-identical across engines — the third iterative algorithm (after
    Lloyd k-means and BPE) certified beyond rows-only. Reference
    surface: redos/ml/models.py:645 LogisticRegressionReDoSModel fits
    sklearn on a driver matrix; here every row joins every gradient and
    only 4 longs reach the driver per round."""
    from truthound_spark.pipeline.regression import logreg_train

    hist, _w = logreg_train(
        _logreg_feats(spark, sf_dir), ["x1", "x2"], "y", iters=_LOGREG_ITERS
    )
    return hist.orderBy("iter")


@register(
    "logreg_score_documents",
    _logreg_weight_ctes(_LOGREG_ITERS)
    + f"""
    SELECT f.id,
           round(1.0 / (1.0 + exp(-(w.wb + w.w1 * f.x1 + w.w2 * f.x2))), 6)
             AS score
    FROM f, w{_LOGREG_ITERS} w ORDER BY f.id""",
)
def q_logreg_score_documents(spark, sf_dir):
    """Classifier inference pass (pipeline/regression.py logreg_score):
    the trained round-3 weights re-enter the plan as literals and score
    every document in one map-only sigmoid projection — per-row
    hash-match proves train AND apply end-to-end. Composes with
    text.quantile_gate for threshold selection at 100 TB (no shuffle
    anywhere in the scoring path)."""
    from truthound_spark.pipeline.regression import logreg_score, logreg_train

    feats = _logreg_feats(spark, sf_dir)
    _hist, w = logreg_train(feats, ["x1", "x2"], "y", iters=_LOGREG_ITERS)
    return logreg_score(feats, ["x1", "x2"], w).select("id", "score").orderBy("id")


@register(
    "linreg_lineitem",
    """
    WITH q AS (
      SELECT CAST(round(l_quantity / 10.0 * 1000) AS BIGINT) AS qx,
             CAST(round(l_extendedprice / 100000.0 * 1000) AS BIGINT) AS qy
      FROM lineitem
      WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
    ),
    g AS (
      SELECT COUNT(*) AS n, SUM(qx) AS sx, SUM(qy) AS sy,
             SUM(qx * qy) AS sxy, SUM(qx * qx) AS sxx, SUM(qy * qy) AS syy
      FROM q
    ),
    s AS (
      SELECT n, sx / 1000.0 AS sxd, sy / 1000.0 AS syd,
             sxy / 1000.0 / 1000.0 AS sxyd,
             sxx / 1000.0 / 1000.0 AS sxxd,
             syy / 1000.0 / 1000.0 AS syyd
      FROM g
    ),
    c AS (
      SELECT n, sxd, syd,
             n * sxyd - sxd * syd AS covn,
             n * sxxd - sxd * sxd AS varn,
             n * syyd - syd * syd AS varyn
      FROM s
    )
    SELECT CAST(n AS BIGINT) AS n,
           round(covn / NULLIF(varn, 0), 6) AS slope,
           round((syd - covn / NULLIF(varn, 0) * sxd) / NULLIF(n, 0), 6) AS intercept,
           round(covn * covn / NULLIF(varn * varyn, 0), 6) AS r2
    FROM c
    """,
)
def q_linreg_lineitem(spark, sf_dir):
    """Closed-form simple linear regression (pipeline/regression.py
    linreg_simple): decaquantity → extendedprice/1e5 fit in ONE
    aggregate of five exact fixed-point sufficient statistics — the
    trend-fit primitive, bit-identical cross-engine (reference
    timeseries/trend.py fits driver arrays). Slope recovers the mean
    unit price; r² certifies the variance algebra."""
    from truthound_spark.pipeline.regression import linreg_simple

    li = t(spark, sf_dir, "lineitem").select(
        (F.col("l_quantity") / 10.0).alias("x"),
        (F.col("l_extendedprice") / 100000.0).alias("y"),
    )
    return linreg_simple(li, "x", "y", quant=1000)


# ---------------------------------------------------------------------------
# round 7 (cont.): corpus composition / concentration diagnostics
# ---------------------------------------------------------------------------


@register(
    "corpus_composition_documents",
    """
    WITH g AS (
      SELECT COALESCE(CAST(source AS VARCHAR), '__null__') AS "group",
             COUNT(*) AS n_docs,
             SUM(COALESCE(CAST(n_chars AS BIGINT), 0)) AS weight
      FROM documents GROUP BY 1
    ),
    t AS (SELECT SUM(n_docs) AS td, SUM(weight) AS tw FROM g)
    SELECT g."group",
           CAST(g.n_docs AS BIGINT) AS n_docs,
           CAST(g.weight AS BIGINT) AS weight,
           round(g.n_docs / CAST(t.td AS DOUBLE), 6) AS doc_share,
           round(g.weight / CAST(t.tw AS DOUBLE), 6) AS weight_share,
           round(SUM(g.weight) OVER (ORDER BY g.weight DESC, g."group"
                                     ROWS UNBOUNDED PRECEDING)
                 / CAST(t.tw AS DOUBLE), 6) AS cum_share,
           CAST(ROW_NUMBER() OVER (ORDER BY g.weight DESC, g."group") AS BIGINT)
             AS rank
    FROM g, t ORDER BY rank
    """,
)
def q_corpus_composition_documents(spark, sf_dir):
    """Data-mixture composition audit (pipeline/report.py
    corpus_composition): char-mass share per source with the cumulative
    head curve — exact long mass sums make every share a deterministic
    integer ratio. One groupBy to a source-sized table; the window runs
    over groups, never documents (and the top_n mode drops even that,
    pytest-pinned)."""
    from truthound_spark.pipeline.report import corpus_composition

    df = t(spark, sf_dir, "documents")
    return corpus_composition(df, "source", weight_col="n_chars").orderBy("rank")


@register(
    "concentration_report_documents",
    """
    WITH g AS (
      SELECT COALESCE(CAST(source AS VARCHAR), '__null__') AS grp,
             SUM(COALESCE(CAST(n_chars AS BIGINT), 0)) AS weight
      FROM documents GROUP BY 1
    ),
    t AS (SELECT SUM(weight) AS tw FROM g),
    terms AS (
      SELECT g.weight, t.tw,
             CAST(round(g.weight / CAST(t.tw AS DOUBLE)
                        * (g.weight / CAST(t.tw AS DOUBLE))
                        * 1000000000) AS BIGINT) AS hq,
             CASE WHEN g.weight > 0 THEN
               CAST(round(-(g.weight / CAST(t.tw AS DOUBLE))
                          * log2(g.weight / CAST(t.tw AS DOUBLE))
                          * 1000000000) AS BIGINT)
             ELSE 0 END AS eq
      FROM g, t
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(MAX(tw) AS BIGINT) AS total_weight,
           round(SUM(hq) / 1000000000.0, 6) AS hhi,
           round(1.0 / (SUM(hq) / 1000000000.0), 6) AS effective_groups,
           round(SUM(eq) / 1000000000.0, 6) AS entropy_bits,
           round(MAX(weight) / CAST(MAX(tw) AS DOUBLE), 6) AS top1_share
    FROM terms
    """,
)
def q_concentration_report_documents(spark, sf_dir):
    """Source-concentration diagnostics (pipeline/report.py
    concentration_report): HHI, effective source count, mix entropy and
    top-1 dominance in ONE aggregate over the group table — per-group
    hhi/entropy terms quantized to 1e-9 longs before summing (the
    char_entropy pattern) so the report is order-independent and
    engine-portable. No window, no sort, no driver rows."""
    from truthound_spark.pipeline.report import concentration_report

    df = t(spark, sf_dir, "documents")
    return concentration_report(df, "source", weight_col="n_chars")


@register(
    "bpe_fertility_documents",
    _bpe_oracle_ctes(_BPE_ROUNDS)
    + f""",
    enc AS (
      SELECT COALESCE(CAST(lang AS VARCHAR), '__null__') AS "group",
             len(list_filter(string_split({_NORM_SQL.format(c='text')}, ' '),
                             w -> w <> '')) AS n_words,
             length(array_to_string(
               list_filter(string_split({_NORM_SQL.format(c='text')}, ' '),
                           w -> w <> ''), '')) AS n_chars,
             {"".join("replace(" for _ in range(_BPE_ROUNDS))}array_to_string(
               list_transform(
                 list_filter(string_split({_NORM_SQL.format(c='text')}, ' '),
                             w -> w <> ''),
                 w -> '|' || array_to_string(string_split(w,''),'||') || '|'
               ), ' ')"""
    + "".join(
        f""",
               COALESCE((SELECT '|'||x||'||'||y||'|' FROM m{r}), chr(1)),
               COALESCE((SELECT '|'||x||y||'|' FROM m{r}), chr(1)))"""
        for r in range(1, _BPE_ROUNDS + 1)
    )
    + """ AS s
      FROM documents
    ),
    per AS (
      SELECT "group", n_words, n_chars,
             CASE WHEN n_words > 0 THEN
               CAST((length(s) - length(replace(s, '||', ''))) / 2 + n_words
                    AS BIGINT)
             ELSE 0 END AS n_tokens
      FROM enc
    )
    SELECT "group",
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS n_words,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars,
           round(SUM(n_tokens) / CAST(SUM(n_words) AS DOUBLE), 6) AS fertility,
           round(SUM(n_chars) / CAST(SUM(n_tokens) AS DOUBLE), 6)
             AS chars_per_token
    FROM per GROUP BY 1 ORDER BY 1
    """,
)
def q_bpe_fertility_documents(spark, sf_dir):
    """Per-language tokenizer fertility under the trained merges
    (pipeline/tokenizer.py bpe_fertility): tokens/word + chars/token by
    lang — the multilingual tokenizer-equity audit. The oracle retrains
    the merges (shared bpe_train CTEs) and replays the whole
    count-and-ratio pipeline; exact long sums make each group's ratios
    deterministic quotients."""
    from truthound_spark.pipeline.tokenizer import bpe_fertility, bpe_train

    df = t(spark, sf_dir, "documents")
    merges = bpe_train(df, rounds=_BPE_ROUNDS)
    return bpe_fertility(df, merges, group_col="lang").orderBy("group")


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


@register(
    "classifier_eval_metrics_documents",
    "WITH "
    + _EVAL_SC
    + """,
    m AS (
      SELECT COUNT(*) AS n_scored,
             SUM(CASE WHEN y = 1.0 AND score >= 0.5 THEN 1 ELSE 0 END) AS tp,
             SUM(CASE WHEN y = 0.0 AND score >= 0.5 THEN 1 ELSE 0 END) AS fp,
             SUM(CASE WHEN y = 1.0 AND score < 0.5 THEN 1 ELSE 0 END) AS fn,
             SUM(CASE WHEN y = 0.0 AND score < 0.5 THEN 1 ELSE 0 END) AS tn
      FROM sc WHERE score IS NOT NULL AND y IS NOT NULL
    ),
    pr AS (
      SELECT *, tp / CAST(NULLIF(tp + fp, 0) AS DOUBLE) AS p,
                tp / CAST(NULLIF(tp + fn, 0) AS DOUBLE) AS r
      FROM m
    )
    SELECT CAST(n_scored AS BIGINT) AS n_scored,
           CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
           CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
           round(p, 6) AS precision,
           round(r, 6) AS recall,
           round(2 * p * r / NULLIF(p + r, 0), 6) AS f1,
           round((tp + tn) / CAST(NULLIF(n_scored, 0) AS DOUBLE), 6) AS accuracy
    FROM pr
    """,
)
def q_classifier_eval_metrics_documents(spark, sf_dir):
    """Threshold evaluation (pipeline/regression.py
    classification_metrics): confusion counts + P/R/F1/accuracy in ONE
    aggregate of exact long counters — reference redos/ml/base.py
    ReDoSModelMetrics does this on driver arrays; here it's map-side
    partials and an O(1) result at any corpus size."""
    from truthound_spark.pipeline.regression import classification_metrics

    return classification_metrics(_eval_scored(spark, sf_dir), "score", "y", 0.5)


@register(
    "calibration_bins_documents",
    "WITH "
    + _EVAL_SC
    + """,
    g AS (
      SELECT GREATEST(LEAST(CAST(floor(score * 10) AS BIGINT), 9), 0) AS bin,
             COUNT(*) AS n,
             SUM(CAST(round(score * 1000000) AS BIGINT)) AS sq,
             SUM(CAST(y AS BIGINT)) AS sy
      FROM sc WHERE score IS NOT NULL AND y IS NOT NULL
      GROUP BY 1
    )
    SELECT bin,
           round(bin / 10.0, 6) AS bin_lo,
           CAST(n AS BIGINT) AS n,
           round(sq / 1000000.0 / n, 6) AS mean_score,
           round(sy / CAST(n AS DOUBLE), 6) AS frac_positive,
           round(sq / 1000000.0 / n - sy / CAST(n AS DOUBLE), 6) AS gap
    FROM g ORDER BY bin
    """,
)
def q_calibration_bins_documents(spark, sf_dir):
    """Reliability diagram (pipeline/regression.py calibration_bins):
    mean predicted score vs observed positive rate per decile — the
    is-0.9-really-90% audit before score-gated corpus mixing. Quantized
    long sums per bin; one groupBy to a 10-row table."""
    from truthound_spark.pipeline.regression import calibration_bins

    return calibration_bins(_eval_scored(spark, sf_dir), "score", "y", bins=10).orderBy(
        "bin"
    )


@register(
    "auc_documents",
    "WITH "
    + _EVAL_SC
    + """,
    h AS (
      SELECT CAST(round(score * 1000000) AS BIGINT) AS q,
             SUM(CAST(y AS BIGINT)) AS pos,
             COUNT(*) - SUM(CAST(y AS BIGINT)) AS neg
      FROM sc WHERE score IS NOT NULL AND y IS NOT NULL
      GROUP BY 1
    ),
    c AS (
      SELECT pos, neg,
             SUM(neg) OVER (ORDER BY q ROWS UNBOUNDED PRECEDING) AS cum_neg
      FROM h
    ),
    a AS (
      SELECT SUM(pos) AS n_pos, SUM(neg) AS n_neg,
             SUM(pos * (2 * (cum_neg - neg) + neg)) AS u2
      FROM c
    )
    SELECT CAST(n_pos AS BIGINT) AS n_pos,
           CAST(n_neg AS BIGINT) AS n_neg,
           round(u2 / 2.0 / NULLIF(n_pos * n_neg, 0), 6) AS auc
    FROM a
    """,
)
def q_auc_documents(spark, sf_dir):
    """Exact ROC-AUC with NO global sort (pipeline/regression.py
    auc_binned): Mann-Whitney rank-sum over a bounded quantized-score
    histogram — corpus-scale work is one groupBy; the cumulative window
    touches histogram rows only (the curriculum_order histogram-not-sort
    move applied to model evaluation). Doubled-U stays integral until
    the final division, so the statistic is deterministic cross-engine."""
    from truthound_spark.pipeline.regression import auc_binned

    return auc_binned(_eval_scored(spark, sf_dir), "score", "y")


@register(
    "threshold_sweep_documents",
    "WITH "
    + _EVAL_SC
    + """,
    th AS (SELECT CAST(UNNEST([0.2, 0.35, 0.5, 0.65, 0.8]) AS DOUBLE) AS threshold),
    m AS (
      SELECT th.threshold,
             SUM(CASE WHEN sc.y = 1.0 AND sc.score >= th.threshold THEN 1 ELSE 0 END) AS tp,
             SUM(CASE WHEN sc.y = 0.0 AND sc.score >= th.threshold THEN 1 ELSE 0 END) AS fp,
             SUM(CASE WHEN sc.y = 1.0 AND sc.score < th.threshold THEN 1 ELSE 0 END) AS fn,
             SUM(CASE WHEN sc.y = 0.0 AND sc.score < th.threshold THEN 1 ELSE 0 END) AS tn
      FROM sc, th
      WHERE sc.score IS NOT NULL AND sc.y IS NOT NULL
      GROUP BY th.threshold
    ),
    pr AS (
      SELECT *, tp / CAST(NULLIF(tp + fp, 0) AS DOUBLE) AS p,
                tp / CAST(NULLIF(tp + fn, 0) AS DOUBLE) AS r
      FROM m
    )
    SELECT threshold,
           CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
           CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
           round(p, 6) AS precision,
           round(r, 6) AS recall,
           round(2 * p * r / NULLIF(p + r, 0), 6) AS f1
    FROM pr ORDER BY threshold
    """,
)
def q_threshold_sweep_documents(spark, sf_dir):
    """Operating-point sweep (pipeline/regression.py threshold_sweep):
    the whole precision/recall curve from ONE fused aggregate — every
    threshold's confusion counters are conditional sums in the same agg
    (the fused-suite executor move applied to evaluation), so 5
    thresholds or 50 cost one corpus scan. The oracle computes the same
    grid via a cross-joined threshold table."""
    from truthound_spark.pipeline.regression import threshold_sweep

    return threshold_sweep(
        _eval_scored(spark, sf_dir), "score", "y", [0.2, 0.35, 0.5, 0.65, 0.8]
    ).orderBy("threshold")


@register(
    "linreg_grouped_lineitem",
    """
    WITH q AS (
      SELECT COALESCE(CAST(l_returnflag AS VARCHAR), '__null__') AS "group",
             CAST(round(l_quantity / 10.0 * 1000) AS BIGINT) AS qx,
             CAST(round(l_extendedprice / 100000.0 * 1000) AS BIGINT) AS qy
      FROM lineitem
      WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
    ),
    g AS (
      SELECT "group", COUNT(*) AS n, SUM(qx) AS sx, SUM(qy) AS sy,
             SUM(qx * qy) AS sxy, SUM(qx * qx) AS sxx, SUM(qy * qy) AS syy
      FROM q GROUP BY 1
    ),
    s AS (
      SELECT "group", n, sx / 1000.0 AS sxd, sy / 1000.0 AS syd,
             sxy / 1000.0 / 1000.0 AS sxyd,
             sxx / 1000.0 / 1000.0 AS sxxd,
             syy / 1000.0 / 1000.0 AS syyd
      FROM g
    ),
    c AS (
      SELECT "group", n, sxd, syd,
             n * sxyd - sxd * syd AS covn,
             n * sxxd - sxd * sxd AS varn,
             n * syyd - syd * syd AS varyn
      FROM s
    )
    SELECT "group",
           CAST(n AS BIGINT) AS n,
           round(covn / NULLIF(varn, 0), 6) AS slope,
           round((syd - covn / NULLIF(varn, 0) * sxd) / NULLIF(n, 0), 6) AS intercept,
           round(covn * covn / NULLIF(varn * varyn, 0), 6) AS r2
    FROM c ORDER BY "group"
    """,
)
def q_linreg_grouped_lineitem(spark, sf_dir):
    """Per-group trend fit (pipeline/regression.py linreg_grouped): one
    groupBy carries every return-flag's five fixed-point sufficient
    statistics — a million series would cost this same single shuffle.
    Reference timeseries/trend.py fits one driver array per series."""
    from truthound_spark.pipeline.regression import linreg_grouped

    li = t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        (F.col("l_quantity") / 10.0).alias("x"),
        (F.col("l_extendedprice") / 100000.0).alias("y"),
    )
    return linreg_grouped(li, "x", "y", "l_returnflag", quant=1000).orderBy("group")


@register(
    "weighted_sample_documents",
    """
    WITH b AS (
      SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(n_chars AS BIGINT) AS n_chars,
             ln((CAST(('0x' || substr(md5('0:' || CAST(doc_id AS VARCHAR)), 1, 6))
                      AS BIGINT) + 1.0) / 16777216.0)
               / CAST(n_chars AS DOUBLE) AS pri
      FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0
    ),
    top AS (SELECT * FROM b ORDER BY pri DESC, doc_id LIMIT 50)
    SELECT doc_id, n_chars,
           round(pri, 6) AS priority,
           CAST(ROW_NUMBER() OVER (ORDER BY pri DESC, doc_id) AS BIGINT) AS rank
    FROM top ORDER BY rank
    """,
)
def q_weighted_sample_documents(spark, sf_dir):
    """Deterministic weighted sampling without replacement (pipeline/
    export.py weighted_sample — Efraimidis & Spirakis 2006 A-ES):
    char-mass-weighted 50-doc draw whose selected SET, priorities, and
    ranks all hash-match the SQL replay (the md5-uniform makes the draw
    engine-portable). Map-only priorities + TakeOrdered top-k — no full
    sort at any corpus size."""
    from truthound_spark.pipeline.export import weighted_sample

    df = t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    out = weighted_sample(df, "n_chars", k=50, key_col="doc_id", seed=0)
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("n_chars").cast("long").alias("n_chars"),
        F.round("__priority", 6).alias("priority"),
        "rank",
    ).orderBy("rank")


def _fd_conf_sql(where: str, det: str, dep: str) -> str:
    return (
        f"(SELECT ROUND(SUM(CASE WHEN u <= 1 THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6)"
        f" FROM (SELECT {det} AS k, COUNT(DISTINCT {dep}) AS u FROM orders"
        f" WHERE {where} GROUP BY 1))"
    )


@register(
    "holdout_rule_eval_orders",
    f"""
    WITH pairs AS (
      SELECT 'o_custkey' AS determinant, 'o_orderstatus' AS dependent,
             {_fd_conf_sql('o_orderkey % 2 = 0', 'o_custkey', 'o_orderstatus')} AS tc,
             {_fd_conf_sql('o_orderkey % 2 = 1', 'o_custkey', 'o_orderstatus')} AS ec
      UNION ALL
      SELECT 'o_custkey', 'o_orderpriority',
             {_fd_conf_sql('o_orderkey % 2 = 0', 'o_custkey', 'o_orderpriority')},
             {_fd_conf_sql('o_orderkey % 2 = 1', 'o_custkey', 'o_orderpriority')}
      UNION ALL
      SELECT 'o_orderstatus', 'o_orderpriority',
             {_fd_conf_sql('o_orderkey % 2 = 0', 'o_orderstatus', 'o_orderpriority')},
             {_fd_conf_sql('o_orderkey % 2 = 1', 'o_orderstatus', 'o_orderpriority')}
    )
    SELECT determinant, dependent,
           tc AS trained_confidence,
           ec AS eval_confidence,
           round(tc - ec, 6) AS drop,
           (tc - ec > 0.02) AS degraded
    FROM pairs ORDER BY determinant, dependent
    """,
)
def q_holdout_rule_eval_orders(spark, sf_dir):
    """Holdout rule confirmation (ml/rule_learning.py holdout_rule_eval;
    reference cli_modules/advanced/quality.py rule-quality reporting):
    FDs mined on even orderkeys re-measured on odd ones — the
    did-the-learned-rule-survive gate before enforcing mined suites.
    Both sides are the same bounded one-groupBy-per-determinant
    aggregates; the oracle replays train AND eval confidences."""
    from truthound_spark.ml import ConstraintMiner, holdout_rule_eval

    df = t(spark, sf_dir, "orders")
    train = df.filter(F.col("o_orderkey") % 2 == 0)
    res = ConstraintMiner(
        min_confidence=0.0, min_support=0.0, discover_value_implications=False
    ).learn_rules(
        train,
        fd_candidates=[
            ("o_custkey", "o_orderstatus"),
            ("o_custkey", "o_orderpriority"),
            ("o_orderstatus", "o_orderpriority"),
        ],
    )
    rows = holdout_rule_eval(res, df.filter(F.col("o_orderkey") % 2 == 1))
    return spark.createDataFrame(
        [
            (
                r["determinant"],
                r["dependent"],
                r["trained_confidence"],
                r["eval_confidence"],
                r["drop"],
                r["degraded"],
            )
            for r in rows
        ],
        "determinant string, dependent string, trained_confidence double,"
        " eval_confidence double, drop double, degraded boolean",
    ).orderBy("determinant", "dependent")


@register(
    "model_quality_check_documents",
    "WITH "
    + _EVAL_SC
    + """,
    h AS (
      SELECT CAST(round(score * 1000000) AS BIGINT) AS q,
             SUM(CAST(y AS BIGINT)) AS pos,
             COUNT(*) - SUM(CAST(y AS BIGINT)) AS neg
      FROM sc WHERE score IS NOT NULL AND y IS NOT NULL GROUP BY 1
    ),
    c AS (
      SELECT pos, neg,
             SUM(neg) OVER (ORDER BY q ROWS UNBOUNDED PRECEDING) AS cum_neg
      FROM h
    ),
    a AS (
      SELECT round(SUM(pos * (2 * (cum_neg - neg) + neg)) / 2.0
                   / NULLIF(SUM(pos) * SUM(neg), 0), 6) AS auc
      FROM c
    ),
    g AS (
      SELECT GREATEST(LEAST(CAST(floor(score * 10) AS BIGINT), 9), 0) AS bin,
             COUNT(*) AS n,
             SUM(CAST(round(score * 1000000) AS BIGINT)) AS sq,
             SUM(CAST(y AS BIGINT)) AS sy
      FROM sc WHERE score IS NOT NULL AND y IS NOT NULL GROUP BY 1
    ),
    gaps AS (
      SELECT n, round(sq / 1000000.0 / n - sy / CAST(n AS DOUBLE), 6) AS gap
      FROM g
    ),
    bad AS (SELECT * FROM gaps WHERE n >= 30 AND abs(gap) > 0.15)
    SELECT * FROM (
      SELECT 'auc' AS validator, 'auc_below_threshold' AS issue_type,
             CAST(1 AS BIGINT) AS n, (SELECT auc FROM a) AS actual
      UNION ALL
      SELECT 'calibration', 'calibration_gap',
             (SELECT CAST(COUNT(*) AS BIGINT) FROM bad),
             (SELECT gap FROM bad ORDER BY abs(gap) DESC, gap LIMIT 1)
    ) ORDER BY validator
    """,
)
def q_model_quality_check_documents(spark, sf_dir):
    """Model-quality gates through the PUBLIC check() path (validators/
    model_quality.py AucValidator + CalibrationValidator over
    pipeline/regression.py aggregates): the probe scores genuinely fail
    both gates on this corpus (AUC ≈ 0.49 — the label is independent of
    the probe features; 2 deciles out of calibration), and the oracle
    replays the exact issue counts and actuals — certifying validator
    WIRING (thresholds, bin guards, worst-gap selection), not just the
    underlying statistics (those are the auc/calibration slots)."""
    from truthound_spark.api import check
    from truthound_spark.validators.model_quality import (
        AucValidator,
        CalibrationValidator,
    )

    res = check(
        _eval_scored(spark, sf_dir),
        validators=[
            AucValidator("score", "y", min_auc=0.6),
            CalibrationValidator("score", "y", max_gap=0.15, min_bin_n=30),
        ],
    )
    rows = sorted(
        (i.validator_name, i.issue_type, i.count, float(i.actual)) for i in res.issues
    )
    return spark.createDataFrame(
        rows, "validator string, issue_type string, n long, actual double"
    ).orderBy("validator")


@register(
    "psi_grouped_events",
    """
    WITH b AS (
      SELECT COALESCE(CAST(event_type AS VARCHAR), '__null__') AS g, value AS x
      FROM events WHERE event_id % 2 = 0 AND value IS NOT NULL
    ),
    c AS (
      SELECT COALESCE(CAST(event_type AS VARCHAR), '__null__') AS g, value AS x
      FROM events WHERE event_id % 2 = 1 AND value IS NOT NULL
    ),
    rng AS (SELECT g, MIN(x) AS lo, MAX(x) AS hi FROM b GROUP BY 1),
    pb AS (
      SELECT b.g,
             LEAST(GREATEST(floor((b.x - r.lo)
               / (CASE WHEN r.hi > r.lo THEN (r.hi - r.lo) / 10 ELSE 1.0 END)),
               0), 9) AS bin,
             COUNT(*) AS pn
      FROM b JOIN rng r ON b.g = r.g GROUP BY 1, 2
    ),
    qb AS (
      SELECT c.g,
             LEAST(GREATEST(floor((c.x - r.lo)
               / (CASE WHEN r.hi > r.lo THEN (r.hi - r.lo) / 10 ELSE 1.0 END)),
               0), 9) AS bin,
             COUNT(*) AS qn
      FROM c JOIN rng r ON c.g = r.g GROUP BY 1, 2
    ),
    cells AS (
      SELECT COALESCE(pb.g, qb.g) AS g, COALESCE(pb.bin, qb.bin) AS bin,
             COALESCE(pn, 0) AS pn, COALESCE(qn, 0) AS qn
      FROM pb FULL JOIN qb ON pb.g = qb.g AND pb.bin = qb.bin
    ),
    tots AS (SELECT g, SUM(pn) AS tp, SUM(qn) AS tq FROM cells GROUP BY 1),
    terms AS (
      SELECT cells.g,
             CAST(round(
               (COALESCE(pn / CAST(tp AS DOUBLE), 0.0)
                  - COALESCE(qn / CAST(tq AS DOUBLE), 0.0))
               * ln((COALESCE(pn / CAST(tp AS DOUBLE), 0.0) + 1e-10)
                    / (COALESCE(qn / CAST(tq AS DOUBLE), 0.0) + 1e-10))
               * 1000000000) AS BIGINT) AS t
      FROM cells JOIN tots ON cells.g = tots.g
    ),
    agg AS (SELECT g, round(SUM(t) / 1000000000.0, 6) AS psi FROM terms GROUP BY 1)
    SELECT * FROM (
      SELECT g AS "group", psi, psi > 0.1 AS drifted FROM agg
      UNION ALL
      SELECT g, CAST(NULL AS DOUBLE), CAST(NULL AS BOOLEAN)
      FROM (SELECT DISTINCT g FROM c) cg
      WHERE g NOT IN (SELECT g FROM rng)
    ) ORDER BY "group"
    """,
)
def q_psi_grouped_events(spark, sf_dir):
    """Per-segment drift (drift/detectors.py psi_grouped): PSI per
    event_type between the even/odd event halves — N segments cost ONE
    range aggregate + one histogram aggregate per side (the
    grouped-one-pass design applied to drift; a per-segment psi() loop
    would cost 3 jobs × N). Quantized 1e-9 long terms; per-group edges
    from the segment's own baseline range."""
    from truthound_spark.drift.detectors import psi_grouped

    ev = t(spark, sf_dir, "events")
    return psi_grouped(
        ev.filter(F.col("event_id") % 2 == 0),
        ev.filter(F.col("event_id") % 2 == 1),
        "value",
        "event_type",
        bins=10,
        threshold=0.1,
    ).orderBy("group")


@register(
    "weighted_sample_grouped_documents",
    """
    WITH b AS (
      SELECT CAST(doc_id AS BIGINT) AS doc_id,
             CAST(source AS VARCHAR) AS source,
             CAST(n_chars AS BIGINT) AS n_chars,
             ln((CAST(('0x' || substr(md5('0:' || CAST(doc_id AS VARCHAR)), 1, 6))
                      AS BIGINT) + 1.0) / 16777216.0)
               / CAST(n_chars AS DOUBLE) AS pri
      FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0
    ),
    r AS (
      SELECT *, CAST(ROW_NUMBER() OVER (
                  PARTITION BY source ORDER BY pri DESC, doc_id
                ) AS BIGINT) AS rank
      FROM b
    )
    SELECT doc_id, source, n_chars, round(pri, 6) AS priority, rank
    FROM r WHERE rank <= 3 ORDER BY source, rank
    """,
)
def q_weighted_sample_grouped_documents(spark, sf_dir):
    """Per-stratum A-ES weighted sampling (pipeline/export.py
    weighted_sample grouped mode): 3 char-mass-weighted draws per source,
    rank filter planned as WindowGroupLimit (map-side per-group top-k
    before the shuffle). Set, priorities, and ranks hash-match the SQL
    replay — certifying the grouped path the global slot doesn't touch."""
    from truthound_spark.pipeline.export import weighted_sample

    df = t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    out = weighted_sample(df, "n_chars", k=3, group_col="source", key_col="doc_id")
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("source").cast("string").alias("source"),
        F.col("n_chars").cast("long").alias("n_chars"),
        F.round("__priority", 6).alias("priority"),
        "rank",
    ).orderBy("source", "rank")


@register(
    "auc_grouped_documents",
    "WITH "
    + _EVAL_SC.replace(
        "SELECT f.id,", "SELECT f.id, f.lang,"
    ).replace(
        """             f.y AS y
      FROM f""",
        """             f.y AS y
      FROM f""",
    ).replace(
        "f AS (\n      SELECT CAST(doc_id AS BIGINT) AS id,",
        "f AS (\n      SELECT CAST(doc_id AS BIGINT) AS id, lang,",
    )
    + """,
    h AS (
      SELECT COALESCE(CAST(lang AS VARCHAR), '__null__') AS "group",
             CAST(round(score * 1000000) AS BIGINT) AS q,
             SUM(CAST(y AS BIGINT)) AS pos,
             COUNT(*) - SUM(CAST(y AS BIGINT)) AS neg
      FROM sc WHERE score IS NOT NULL AND y IN (0.0, 1.0)
      GROUP BY 1, 2
    ),
    c AS (
      SELECT "group", pos, neg,
             SUM(neg) OVER (PARTITION BY "group" ORDER BY q
                            ROWS UNBOUNDED PRECEDING) AS cum_neg
      FROM h
    )
    SELECT "group",
           CAST(SUM(pos) AS BIGINT) AS n_pos,
           CAST(SUM(neg) AS BIGINT) AS n_neg,
           round(SUM(pos * (2 * (cum_neg - neg) + neg)) / 2.0
                 / NULLIF(SUM(pos) * SUM(neg), 0), 6) AS auc
    FROM c GROUP BY 1 ORDER BY 1
    """,
)
def q_auc_grouped_documents(spark, sf_dir):
    """Per-segment ROC-AUC (pipeline/regression.py auc_grouped): the
    probe classifier's separation measured per LANGUAGE in one pass —
    the fairness gate that catches a model working only on the dominant
    segment. Same quantized-histogram Mann-Whitney as auc_documents;
    the cumulative window partitions by group over histogram rows only.
    'en' segments are single-class here (the label IS lang='en') →
    NULL auc, certifying the loud-undefined contract cross-engine."""
    from truthound_spark.pipeline.regression import auc_grouped, logreg_score

    d = t(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
        & F.col("n_chars").isNotNull()
        & F.col("lang").isNotNull()
    )
    feats = d.select(
        "lang",
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
    scored = logreg_score(feats, ["x1", "x2"], [-1.1, 2.0, 1.0])
    return auc_grouped(scored, "score", "y", "lang").orderBy("group")


@register(
    "calibration_grouped_documents",
    "WITH "
    + _EVAL_SC.replace(
        "f AS (\n      SELECT CAST(doc_id AS BIGINT) AS id,",
        "f AS (\n      SELECT CAST(doc_id AS BIGINT) AS id, lang,",
    ).replace("SELECT f.id,", "SELECT f.id, f.lang,")
    + """,
    g AS (
      SELECT COALESCE(CAST(lang AS VARCHAR), '__null__') AS "group",
             GREATEST(LEAST(CAST(floor(score * 10) AS BIGINT), 9), 0) AS bin,
             COUNT(*) AS n,
             SUM(CAST(round(score * 1000000) AS BIGINT)) AS sq,
             SUM(CAST(y AS BIGINT)) AS sy
      FROM sc WHERE score IS NOT NULL AND y IN (0.0, 1.0)
      GROUP BY 1, 2
    )
    SELECT "group", bin,
           round(bin / 10.0, 6) AS bin_lo,
           CAST(n AS BIGINT) AS n,
           round(sq / 1000000.0 / n, 6) AS mean_score,
           round(sy / CAST(n AS DOUBLE), 6) AS frac_positive,
           round(sq / 1000000.0 / n - sy / CAST(n AS DOUBLE), 6) AS gap
    FROM g ORDER BY "group", bin
    """,
)
def q_calibration_grouped_documents(spark, sf_dir):
    """Per-language reliability diagram (pipeline/regression.py
    calibration_grouped): the probe's calibration per segment in one
    groupBy(group, decile) — a score calibrated on the majority language
    can be over-confident on a minority one; this is the audit that
    catches it before score-gated mixing."""
    from truthound_spark.pipeline.regression import calibration_grouped, logreg_score

    d = t(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
        & F.col("n_chars").isNotNull()
        & F.col("lang").isNotNull()
    )
    feats = d.select(
        "lang",
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
    scored = logreg_score(feats, ["x1", "x2"], [-1.1, 2.0, 1.0])
    return calibration_grouped(scored, "score", "y", "lang").orderBy("group", "bin")


@register(
    "mean_variance_drift_grouped_events",
    """
    WITH b AS (
      SELECT COALESCE(CAST(event_type AS VARCHAR), '__null__') AS g,
             CAST(round(value * 1000) AS BIGINT) AS q
      FROM events WHERE event_id % 2 = 0 AND value IS NOT NULL
    ),
    c AS (
      SELECT COALESCE(CAST(event_type AS VARCHAR), '__null__') AS g,
             CAST(round(value * 1000) AS BIGINT) AS q
      FROM events WHERE event_id % 2 = 1 AND value IS NOT NULL
    ),
    mb AS (
      SELECT g, COUNT(*) AS n_base,
             SUM(q) / 1000.0 / COUNT(*) AS mean_base,
             SUM(q * q) / 1000.0 / 1000.0 / COUNT(*)
               - (SUM(q) / 1000.0 / COUNT(*)) * (SUM(q) / 1000.0 / COUNT(*))
               AS var_base
      FROM b GROUP BY 1
    ),
    mc AS (
      SELECT g, COUNT(*) AS n_cur,
             SUM(q) / 1000.0 / COUNT(*) AS mean_cur,
             SUM(q * q) / 1000.0 / 1000.0 / COUNT(*)
               - (SUM(q) / 1000.0 / COUNT(*)) * (SUM(q) / 1000.0 / COUNT(*))
               AS var_cur
      FROM c GROUP BY 1
    ),
    j AS (
      SELECT COALESCE(mb.g, mc.g) AS "group",
             COALESCE(n_base, 0) AS n_base, COALESCE(n_cur, 0) AS n_cur,
             round(abs((mean_cur - mean_base) / NULLIF(abs(mean_base), 0)), 6)
               AS mean_shift,
             round(abs((var_cur - var_base) / NULLIF(var_base, 0)), 6) AS var_shift
      FROM mb FULL JOIN mc ON mb.g = mc.g
    )
    SELECT "group", CAST(n_base AS BIGINT) AS n_base, CAST(n_cur AS BIGINT) AS n_cur,
           mean_shift, var_shift,
           (mean_shift > 0.1 OR var_shift > 0.2) AS drifted
    FROM j ORDER BY "group"
    """,
)
def q_mean_variance_drift_grouped_events(spark, sf_dir):
    """Per-segment moment-drift screen (drift/detectors.py
    mean_variance_drift_grouped): every event_type's relative mean and
    variance shift between the even/odd halves from ONE quantized-moment
    aggregate per side — the O(1)-state gate you run on all segments
    before paying for psi_grouped histograms."""
    from truthound_spark.drift.detectors import mean_variance_drift_grouped

    ev = t(spark, sf_dir, "events")
    return mean_variance_drift_grouped(
        ev.filter(F.col("event_id") % 2 == 0),
        ev.filter(F.col("event_id") % 2 == 1),
        "value",
        "event_type",
        quant=1000,
    ).orderBy("group")


@register(
    "concept_drift_lineitem",
    """
    WITH b AS (
      SELECT CAST(l_quantity AS DOUBLE) AS q, CAST(l_discount AS DOUBLE) AS d,
             CAST(l_tax AS DOUBLE) AS t, CAST(l_extendedprice AS DOUBLE) AS y
      FROM lineitem WHERE l_orderkey % 2 = 0
    ),
    c AS (
      SELECT CAST(l_quantity AS DOUBLE) AS q, CAST(l_discount AS DOUBLE) AS d,
             CAST(l_tax AS DOUBLE) AS t, CAST(l_extendedprice AS DOUBLE) AS y
      FROM lineitem WHERE l_orderkey % 2 = 1
    ),
    cb AS (SELECT COALESCE(CORR(q, y), 0) AS c0, COALESCE(CORR(d, y), 0) AS c1,
                  COALESCE(CORR(t, y), 0) AS c2 FROM b),
    cc AS (SELECT COALESCE(CORR(q, y), 0) AS c0, COALESCE(CORR(d, y), 0) AS c1,
                  COALESCE(CORR(t, y), 0) AS c2 FROM c),
    pairs AS (
      SELECT 'l_quantity' AS feature, cb.c0 AS rb, cc.c0 AS rc FROM cb, cc
      UNION ALL SELECT 'l_discount', cb.c1, cc.c1 FROM cb, cc
      UNION ALL SELECT 'l_tax', cb.c2, cc.c2 FROM cb, cc
    )
    SELECT feature, ROUND(rb, 6) AS ref_corr, ROUND(rc, 6) AS cur_corr,
           ROUND(ABS(rc - rb), 6) AS corr_change,
           ROUND(LEAST(1.0,
                 (ABS(rc - rb) + CASE WHEN rb * rc < 0 AND ABS(rb) > 0.1
                                       AND ABS(rc) > 0.1
                                      THEN 0.5 ELSE 0.0 END) / 0.5), 6) AS score
    FROM pairs ORDER BY feature
    """,
)
def q_concept_drift_lineitem(spark, sf_dir):
    """Concept drift: feature↔target correlation shift (ml/concept_drift.py
    concept_drift_table; reference ml/drift_detection/concept.py:159-285) —
    every feature's Pearson corr with the target from ONE aggregate per
    side (Catalyst fuses the F.corr batch into a single scan), scored with
    the reference's |Δcorr|/0.5 + sign-change-penalty formula. The input
    marginals of the even/odd halves match; only the RELATIONSHIP is
    probed — the signal feature drift cannot see."""
    from truthound_spark.ml.concept_drift import concept_drift_table

    li = t(spark, sf_dir, "lineitem")
    return concept_drift_table(
        li.filter(F.col("l_orderkey") % 2 == 0),
        li.filter(F.col("l_orderkey") % 2 == 1),
        "l_extendedprice",
        ["l_quantity", "l_discount", "l_tax"],
    ).orderBy("feature")


@register(
    "ensemble_anomaly_customer",
    """
    WITH st AS (
      SELECT avg(CAST(c_acctbal AS DOUBLE)) AS mu,
             stddev_samp(CAST(c_acctbal AS DOUBLE)) AS sd,
             quantile_cont(CAST(c_acctbal AS DOUBLE), 0.25) AS q1,
             quantile_cont(CAST(c_acctbal AS DOUBLE), 0.5) AS med,
             quantile_cont(CAST(c_acctbal AS DOUBLE), 0.75) AS q3
      FROM customer
    ),
    md AS (
      SELECT quantile_cont(ABS(CAST(c_acctbal AS DOUBLE) - (SELECT med FROM st)),
                           0.5) AS mad
      FROM customer
    ),
    sc AS (
      SELECT c_custkey,
        COALESCE(LEAST(1.0, ABS(CAST(c_acctbal AS DOUBLE) - mu) / sd / 3.0),
                 0.0) AS z,
        COALESCE(CASE
          WHEN CAST(c_acctbal AS DOUBLE) < q1 - 1.5 * (q3 - q1)
            THEN LEAST(1.0, (q1 - 1.5 * (q3 - q1) - CAST(c_acctbal AS DOUBLE))
                            / (q3 - q1))
          WHEN CAST(c_acctbal AS DOUBLE) > q3 + 1.5 * (q3 - q1)
            THEN LEAST(1.0, (CAST(c_acctbal AS DOUBLE) - (q3 + 1.5 * (q3 - q1)))
                            / (q3 - q1))
          ELSE 0.0 END, 0.0) AS i,
        COALESCE(LEAST(1.0, 0.6745 * ABS(CAST(c_acctbal AS DOUBLE) - med)
                            / mad / 3.0), 0.0) AS m
      FROM customer, st, md
    ),
    cmb AS (
      SELECT c_custkey, z, i, m,
        (z + i + m) / 3 AS avg_score,
        z * 0.5 + i * 0.3 + m * 0.2 AS wavg_score,
        GREATEST(z, i, m) AS max_score,
        LEAST(z, i, m) AS min_score,
        CASE WHEN z >= 0.9 THEN 1 ELSE 0 END AS fz,
        CASE WHEN i >= 0.9 THEN 1 ELSE 0 END AS fi,
        CASE WHEN m >= 0.9 THEN 1 ELSE 0 END AS fm
      FROM sc
    )
    SELECT c_custkey,
      ROUND(avg_score, 6) AS avg_score,
      ROUND(wavg_score, 6) AS wavg_score,
      ROUND(max_score, 6) AS max_score,
      ROUND(min_score, 6) AS min_score,
      ROUND(CASE WHEN (fz + fi + fm) / 3.0 >= 0.5
                 THEN (z * fz + i * fi + m * fm)
                      / CAST(fz + fi + fm AS DOUBLE)
                 ELSE 0.0 END, 6) AS vote_score,
      ROUND(CASE WHEN fz + fi + fm = 3 THEN avg_score ELSE 0.0 END, 6)
        AS unanimous_score,
      CAST(fz + fi + fm AS BIGINT) AS detector_votes,
      avg_score >= 0.9 AS is_anomaly,
      ROUND((fz + fi + fm) / 3.0, 6) AS confidence,
      CASE WHEN fz + fi + fm = 3 THEN 'collective'
           WHEN fz + fi + fm >= 1 THEN 'contextual'
           ELSE 'point' END AS anomaly_type
    FROM cmb ORDER BY c_custkey
    """,
)
def q_ensemble_anomaly_customer(spark, sf_dir):
    """Ensemble anomaly detection (ml/ensemble.py; reference
    ml/anomaly_models/ensemble.py:58): ZScore + IQR + MAD fitted once
    (three bounded aggregates), then ALL SIX combination strategies —
    average / weighted / max / min / vote / unanimous — plus predict()'s
    votes/confidence/anomaly_type, every one a map-only column
    expression over the fitted literals: no shuffle, no UDF, the same
    per-row cost at 100 TB."""
    from truthound_spark.ml.ensemble import (
        EnsembleAnomalyDetector,
        IQRDetector,
        MADDetector,
        ZScoreDetector,
    )

    df = t(spark, sf_dir, "customer")
    dets = [
        ZScoreDetector(["c_acctbal"]).fit(df),
        IQRDetector(["c_acctbal"]).fit(df),
        MADDetector(["c_acctbal"]).fit(df),
    ]
    out = EnsembleAnomalyDetector.from_fitted(dets, "average").predict(
        df.select("c_custkey", "c_acctbal"), out="avg_score"
    )
    for alias, strat, w in [
        ("wavg_score", "weighted_average", [0.5, 0.3, 0.2]),
        ("max_score", "max", None),
        ("min_score", "min", None),
        ("vote_score", "vote", None),
        ("unanimous_score", "unanimous", None),
    ]:
        out = EnsembleAnomalyDetector.from_fitted(dets, strat, weights=w).with_scores(
            out, out=alias
        )
    return out.select(
        "c_custkey",
        F.round("avg_score", 6).alias("avg_score"),
        F.round("wavg_score", 6).alias("wavg_score"),
        F.round("max_score", 6).alias("max_score"),
        F.round("min_score", 6).alias("min_score"),
        F.round("vote_score", 6).alias("vote_score"),
        F.round("unanimous_score", 6).alias("unanimous_score"),
        F.col("detector_votes").cast("long").alias("detector_votes"),
        "is_anomaly",
        F.round("confidence", 6).alias("confidence"),
        "anomaly_type",
    ).orderBy("c_custkey")


@register(
    "js_grouped_events",
    """
    WITH b AS (
      SELECT COALESCE(CAST(event_type AS VARCHAR), '__null__') AS g, value AS x
      FROM events WHERE event_id % 2 = 0 AND value IS NOT NULL
    ),
    c AS (
      SELECT COALESCE(CAST(event_type AS VARCHAR), '__null__') AS g, value AS x
      FROM events WHERE event_id % 2 = 1 AND value IS NOT NULL
    ),
    rng AS (SELECT g, MIN(x) AS lo, MAX(x) AS hi FROM b GROUP BY 1),
    pb AS (
      SELECT b.g,
             LEAST(GREATEST(floor((b.x - r.lo)
               / (CASE WHEN r.hi > r.lo THEN (r.hi - r.lo) / 10 ELSE 1.0 END)),
               0), 9) AS bin,
             COUNT(*) AS pn
      FROM b JOIN rng r ON b.g = r.g GROUP BY 1, 2
    ),
    qb AS (
      SELECT c.g,
             LEAST(GREATEST(floor((c.x - r.lo)
               / (CASE WHEN r.hi > r.lo THEN (r.hi - r.lo) / 10 ELSE 1.0 END)),
               0), 9) AS bin,
             COUNT(*) AS qn
      FROM c JOIN rng r ON c.g = r.g GROUP BY 1, 2
    ),
    cells AS (
      SELECT COALESCE(pb.g, qb.g) AS g, COALESCE(pb.bin, qb.bin) AS bin,
             COALESCE(pn, 0) AS pn, COALESCE(qn, 0) AS qn
      FROM pb FULL JOIN qb ON pb.g = qb.g AND pb.bin = qb.bin
    ),
    tots AS (SELECT g, SUM(pn) AS tp, SUM(qn) AS tq FROM cells GROUP BY 1),
    freqs AS (
      SELECT cells.g,
             COALESCE(pn / CAST(tp AS DOUBLE), 0.0) AS p,
             COALESCE(qn / CAST(tq AS DOUBLE), 0.0) AS q
      FROM cells JOIN tots ON cells.g = tots.g
    ),
    terms AS (
      SELECT g,
             CAST(round(
               (0.5 * p * ln((p + 1e-10) / ((p + q) / 2 + 1e-10))
                + 0.5 * q * ln((q + 1e-10) / ((p + q) / 2 + 1e-10)))
               * 1000000000) AS BIGINT) AS t
      FROM freqs
    ),
    agg AS (SELECT g, round(SUM(t) / 1000000000.0, 6) AS js FROM terms GROUP BY 1)
    SELECT * FROM (
      SELECT g AS "group", js, js > 0.1 AS drifted FROM agg
      UNION ALL
      SELECT g, CAST(NULL AS DOUBLE), CAST(NULL AS BOOLEAN)
      FROM (SELECT DISTINCT g FROM c) cg
      WHERE g NOT IN (SELECT g FROM rng)
    ) ORDER BY "group"
    """,
)
def q_js_grouped_events(spark, sf_dir):
    """Per-segment Jensen–Shannon divergence (drift/detectors.py
    js_grouped): every event_type's JS between the even/odd halves in
    ONE histogram pass per side — psi_grouped's constant-pass design on
    the symmetric, ln2-bounded statistic; per-group values pinned
    bit-identical to js_divergence()."""
    from truthound_spark.drift.detectors import js_grouped

    ev = t(spark, sf_dir, "events")
    return js_grouped(
        ev.filter(F.col("event_id") % 2 == 0),
        ev.filter(F.col("event_id") % 2 == 1),
        "value",
        "event_type",
        bins=10,
        threshold=0.1,
    ).orderBy("group")


@register(
    "ks_grouped_events",
    """
    WITH b AS (
      SELECT COALESCE(CAST(event_type AS VARCHAR), '__null__') AS g, value AS v,
             0 AS s
      FROM events WHERE event_id % 2 = 0 AND value IS NOT NULL
    ),
    c AS (
      SELECT COALESCE(CAST(event_type AS VARCHAR), '__null__') AS g, value AS v,
             1 AS s
      FROM events WHERE event_id % 2 = 1 AND value IS NOT NULL
    ),
    u AS (
      SELECT g, v,
             SUM(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS gb,
             SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS gc
      FROM (SELECT * FROM b UNION ALL SELECT * FROM c) GROUP BY g, v
    ),
    tots AS (SELECT g, SUM(gb) AS n_base, SUM(gc) AS n_cur FROM u GROUP BY 1),
    ecdf AS (
      SELECT g,
             SUM(gb) OVER (PARTITION BY g ORDER BY v
                           ROWS UNBOUNDED PRECEDING) AS cb,
             SUM(gc) OVER (PARTITION BY g ORDER BY v
                           ROWS UNBOUNDED PRECEDING) AS cc
      FROM u
    ),
    agg AS (
      SELECT ecdf.g,
             MAX(ABS(cb / CAST(NULLIF(n_base, 0) AS DOUBLE)
                     - cc / CAST(NULLIF(n_cur, 0) AS DOUBLE))) AS raw,
             MAX(n_base) AS n_base, MAX(n_cur) AS n_cur
      FROM ecdf JOIN tots ON ecdf.g = tots.g GROUP BY 1
    )
    SELECT g AS "group", CAST(n_base AS BIGINT) AS n_base,
           CAST(n_cur AS BIGINT) AS n_cur,
           ROUND(raw, 6) AS ks,
           ROUND(sqrt(-0.5 * ln(0.05 / 2))
                 * sqrt((n_base + n_cur)
                        / CAST(NULLIF(n_base * n_cur, 0) AS DOUBLE)), 6) AS crit,
           raw > sqrt(-0.5 * ln(0.05 / 2))
                 * sqrt((n_base + n_cur)
                        / CAST(NULLIF(n_base * n_cur, 0) AS DOUBLE)) AS drifted
    FROM agg ORDER BY "group"
    """,
)
def q_ks_grouped_events(spark, sf_dir):
    """Per-segment EXACT Kolmogorov–Smirnov (drift/detectors.py
    ks_grouped): sup|F_b − F_c| per event_type from ONE (group, value)
    ECDF merge with the cumulative window PARTITIONED BY GROUP — the
    per-segment design of psi_grouped applied to the distribution-free
    test; values pinned bit-identical to exact ks_test() per group."""
    from truthound_spark.drift.detectors import ks_grouped

    ev = t(spark, sf_dir, "events")
    return ks_grouped(
        ev.filter(F.col("event_id") % 2 == 0),
        ev.filter(F.col("event_id") % 2 == 1),
        "value",
        "event_type",
        alpha=0.05,
    ).orderBy("group")


@register(
    "threshold_sweep_grouped_documents",
    "WITH "
    + _EVAL_SC.replace(
        "f AS (\n      SELECT CAST(doc_id AS BIGINT) AS id,",
        "f AS (\n      SELECT CAST(doc_id AS BIGINT) AS id, lang,",
    ).replace("SELECT f.id,", "SELECT f.id, f.lang,")
    + """,
    th AS (SELECT CAST(UNNEST([0.2, 0.35, 0.5, 0.65, 0.8]) AS DOUBLE) AS threshold),
    m AS (
      SELECT COALESCE(CAST(sc.lang AS VARCHAR), '__null__') AS "group",
             th.threshold,
             SUM(CASE WHEN sc.y = 1.0 AND sc.score >= th.threshold THEN 1 ELSE 0 END) AS tp,
             SUM(CASE WHEN sc.y = 0.0 AND sc.score >= th.threshold THEN 1 ELSE 0 END) AS fp,
             SUM(CASE WHEN sc.y = 1.0 AND sc.score < th.threshold THEN 1 ELSE 0 END) AS fn,
             SUM(CASE WHEN sc.y = 0.0 AND sc.score < th.threshold THEN 1 ELSE 0 END) AS tn
      FROM sc, th
      WHERE sc.score IS NOT NULL AND sc.y IN (0.0, 1.0)
      GROUP BY 1, 2
    ),
    pr AS (
      SELECT *, tp / CAST(NULLIF(tp + fp, 0) AS DOUBLE) AS p,
                tp / CAST(NULLIF(tp + fn, 0) AS DOUBLE) AS r
      FROM m
    )
    SELECT "group", threshold,
           CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
           CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
           round(p, 6) AS precision,
           round(r, 6) AS recall,
           round(2 * p * r / NULLIF(p + r, 0), 6) AS f1
    FROM pr ORDER BY "group", threshold
    """,
)
def q_threshold_sweep_grouped_documents(spark, sf_dir):
    """Per-segment operating-point sweep (pipeline/regression.py
    threshold_sweep_grouped — the last ungrouped member of the eval
    family joins psi/auc/calibration_grouped): every language's whole
    precision/recall curve from ONE groupBy(group) whose conditional
    confusion sums cover every threshold. Single-class segments (the
    probe label IS lang='en') certify the NULL-not-crash metric
    contract per group cross-engine."""
    from truthound_spark.pipeline.regression import logreg_score, threshold_sweep_grouped

    d = t(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
        & F.col("n_chars").isNotNull()
        & F.col("lang").isNotNull()
    )
    feats = d.select(
        "lang",
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
    scored = logreg_score(feats, ["x1", "x2"], [-1.1, 2.0, 1.0])
    return threshold_sweep_grouped(
        scored, "score", "y", "lang", [0.2, 0.35, 0.5, 0.65, 0.8]
    ).orderBy("group", "threshold")


@register(
    "multivariate_corr_drift_lineitem",
    """
    WITH b AS (
      SELECT CAST(l_quantity AS DOUBLE) AS q, CAST(l_extendedprice AS DOUBLE) AS e,
             CAST(l_discount AS DOUBLE) AS d
      FROM lineitem WHERE l_orderkey % 2 = 0
    ),
    c AS (
      SELECT CAST(l_quantity AS DOUBLE) AS q, CAST(l_extendedprice AS DOUBLE) AS e,
             CAST(l_discount AS DOUBLE) AS d
      FROM lineitem WHERE l_orderkey % 2 = 1
    ),
    cb AS (SELECT COALESCE(CORR(q, e), 0) AS c01, COALESCE(CORR(q, d), 0) AS c02,
                  COALESCE(CORR(e, d), 0) AS c12 FROM b),
    cc AS (SELECT COALESCE(CORR(q, e), 0) AS c01, COALESCE(CORR(q, d), 0) AS c02,
                  COALESCE(CORR(e, d), 0) AS c12 FROM c),
    pairs AS (
      SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b,
             cb.c01 AS rb, cc.c01 AS rc FROM cb, cc
      UNION ALL SELECT 'l_quantity', 'l_discount', cb.c02, cc.c02 FROM cb, cc
      UNION ALL SELECT 'l_extendedprice', 'l_discount', cb.c12, cc.c12 FROM cb, cc
    ),
    mx AS (SELECT MAX(ABS(rc - rb)) AS m FROM pairs)
    SELECT col_a, col_b, ROUND(rb, 6) AS ref_corr, ROUND(rc, 6) AS cur_corr,
           ROUND(ABS(rc - rb), 6) AS diff,
           ROUND(LEAST(1.0, mx.m / 0.5), 6) AS drift_score
    FROM pairs, mx ORDER BY col_a, col_b
    """,
)
def q_multivariate_corr_drift_lineitem(spark, sf_dir):
    """Multivariate correlation-structure drift (ml/multivariate_drift.py
    correlation_drift_table; reference ml/drift_detection/
    multivariate.py:335-384): every feature PAIR's Pearson shift between
    the even/odd halves from ONE aggregate per side — the drift
    univariate marginals cannot see (a correlation can rotate while
    every histogram stays put); drift_score = min(1, max|Δcorr|/0.5)."""
    from truthound_spark.ml.multivariate_drift import correlation_drift_table

    li = t(spark, sf_dir, "lineitem")
    return correlation_drift_table(
        li.filter(F.col("l_orderkey") % 2 == 0),
        li.filter(F.col("l_orderkey") % 2 == 1),
        ["l_quantity", "l_extendedprice", "l_discount"],
    ).orderBy("col_a", "col_b")


@register(
    "multivariate_mahalanobis_drift_lineitem",
    """
    WITH b AS (
      SELECT avg(CAST(l_quantity AS DOUBLE)) AS m0,
             stddev_samp(CAST(l_quantity AS DOUBLE)) AS s0,
             avg(CAST(l_extendedprice AS DOUBLE)) AS m1,
             stddev_samp(CAST(l_extendedprice AS DOUBLE)) AS s1,
             avg(CAST(l_discount AS DOUBLE)) AS m2,
             stddev_samp(CAST(l_discount AS DOUBLE)) AS s2
      FROM lineitem WHERE l_orderkey % 2 = 0
    ),
    c AS (
      SELECT avg(CAST(l_quantity AS DOUBLE)) AS m0,
             avg(CAST(l_extendedprice AS DOUBLE)) AS m1,
             avg(CAST(l_discount AS DOUBLE)) AS m2
      FROM lineitem WHERE l_orderkey % 2 = 1
    ),
    sd AS (
      SELECT (c.m0 - b.m0) / b.s0 AS d0, (c.m1 - b.m1) / b.s1 AS d1,
             (c.m2 - b.m2) / b.s2 AS d2
      FROM b, c
    )
    SELECT ROUND(sqrt((d0 * d0 + d1 * d1 + d2 * d2) / 3), 6) AS mahalanobis,
           ROUND(LEAST(1.0, sqrt((d0 * d0 + d1 * d1 + d2 * d2) / 3) / 3.0), 6)
             AS drift_score,
           ROUND(ABS(d0) / 3.0, 6) AS score_l_quantity,
           ROUND(ABS(d1) / 3.0, 6) AS score_l_extendedprice,
           ROUND(ABS(d2) / 3.0, 6) AS score_l_discount
    FROM sd
    """,
)
def q_multivariate_mahalanobis_drift_lineitem(spark, sf_dir):
    """Joint-mean multivariate shift (ml/multivariate_drift.py
    MultivariateDriftDetector method='mahalanobis'; reference
    multivariate.py:447-486): diagonal-approx Mahalanobis distance of
    the current mean vector in reference-σ units — one moments
    aggregate per side, O(features) driver state."""
    import math as _math

    from truthound_spark.ml.multivariate_drift import MultivariateDriftDetector

    li = t(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    det = MultivariateDriftDetector(method="mahalanobis", columns=cols).fit(
        li.filter(F.col("l_orderkey") % 2 == 0)
    )
    res = det.detect(li.filter(F.col("l_orderkey") % 2 == 1))
    # raw distance from the column scores' invariant: score_i = |sd_i|/3
    sds = [s * 3.0 for _, s in res.column_scores]
    raw = _math.sqrt(sum(d * d for d in sds) / len(sds))
    return _scalar_df(
        spark,
        mahalanobis=round(raw, 6),
        drift_score=round(res.drift_score, 6),
        score_l_quantity=round(dict(res.column_scores)["l_quantity"], 6),
        score_l_extendedprice=round(dict(res.column_scores)["l_extendedprice"], 6),
        score_l_discount=round(dict(res.column_scores)["l_discount"], 6),
    )


@register(
    "wasserstein_grouped_events",
    """
    WITH b AS (
      SELECT COALESCE(CAST(event_type AS VARCHAR), '__null__') AS g, value AS x
      FROM events WHERE event_id % 2 = 0 AND value IS NOT NULL
    ),
    c AS (
      SELECT COALESCE(CAST(event_type AS VARCHAR), '__null__') AS g, value AS x
      FROM events WHERE event_id % 2 = 1 AND value IS NOT NULL
    ),
    rb AS (SELECT g, MIN(x) AS lob, MAX(x) AS hib FROM b GROUP BY 1),
    rc AS (SELECT g, MIN(x) AS loc, MAX(x) AS hic FROM c GROUP BY 1),
    bt AS (
      SELECT rb.g, LEAST(lob, loc) AS lo, GREATEST(hib, hic) AS hi
      FROM rb JOIN rc ON rb.g = rc.g
    ),
    pb AS (
      SELECT b.g,
             LEAST(GREATEST(floor((b.x - t.lo)
               / (CASE WHEN t.hi > t.lo THEN (t.hi - t.lo) / 20 ELSE 1.0 END)),
               0), 19) AS bin,
             COUNT(*) AS pn
      FROM b JOIN bt t ON b.g = t.g GROUP BY 1, 2
    ),
    qb AS (
      SELECT c.g,
             LEAST(GREATEST(floor((c.x - t.lo)
               / (CASE WHEN t.hi > t.lo THEN (t.hi - t.lo) / 20 ELSE 1.0 END)),
               0), 19) AS bin,
             COUNT(*) AS qn
      FROM c JOIN bt t ON c.g = t.g GROUP BY 1, 2
    ),
    grid AS (
      SELECT bt.g, bt.lo, bt.hi, gs.bin
      FROM bt, (SELECT UNNEST(range(20)) AS bin) gs
    ),
    cells AS (
      SELECT grid.g, grid.bin, grid.lo, grid.hi,
             COALESCE(pn, 0) AS pn, COALESCE(qn, 0) AS qn
      FROM grid
      LEFT JOIN pb ON grid.g = pb.g AND grid.bin = pb.bin
      LEFT JOIN qb ON grid.g = qb.g AND grid.bin = qb.bin
    ),
    tots AS (SELECT g, SUM(pn) AS tp, SUM(qn) AS tq FROM cells GROUP BY 1),
    cum AS (
      SELECT cells.g, cells.bin, cells.lo, cells.hi,
             SUM(pn / CAST(tp AS DOUBLE)) OVER (PARTITION BY cells.g ORDER BY cells.bin
                                                ROWS UNBOUNDED PRECEDING) AS cp,
             SUM(qn / CAST(tq AS DOUBLE)) OVER (PARTITION BY cells.g ORDER BY cells.bin
                                                ROWS UNBOUNDED PRECEDING) AS cq
      FROM cells JOIN tots ON cells.g = tots.g
    ),
    terms AS (
      SELECT g, lo, hi,
             CAST(round(ABS(cp - cq)
               * (CASE WHEN hi > lo THEN (hi - lo) / 20 ELSE 1.0 END)
               * 1000000000) AS BIGINT) AS t
      FROM cum
    ),
    agg AS (
      SELECT g, round(SUM(t) / 1000000000.0, 6) AS emd,
             MAX(lo) AS lo, MAX(hi) AS hi
      FROM terms GROUP BY 1
    )
    SELECT * FROM (
      SELECT g AS "group", emd, ROUND(0.1 * (hi - lo), 6) AS threshold,
             emd > 0.1 * (hi - lo) AS drifted
      FROM agg
      UNION ALL
      SELECT COALESCE(rb.g, rc.g), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
             CAST(NULL AS BOOLEAN)
      FROM rb FULL JOIN rc ON rb.g = rc.g
      WHERE rb.g IS NULL OR rc.g IS NULL
    ) ORDER BY "group"
    """,
)
def q_wasserstein_grouped_events(spark, sf_dir):
    """Per-segment earth-mover distance (drift/detectors.py
    wasserstein_grouped): every event_type's EMD between the even/odd
    halves from one histogram pass per side — completes the grouped
    drift family (psi/js/ks/moments); dense bin grid so empty bins keep
    carrying the standing CDF gap; per-group values pinned bit-identical
    to wasserstein()."""
    from truthound_spark.drift.detectors import wasserstein_grouped

    ev = t(spark, sf_dir, "events")
    return wasserstein_grouped(
        ev.filter(F.col("event_id") % 2 == 0),
        ev.filter(F.col("event_id") % 2 == 1),
        "value",
        "event_type",
        bins=20,
    ).orderBy("group")


@register(
    "chi_square_grouped_events",
    """
    WITH ub AS (
      SELECT COALESCE(CAST(event_type AS VARCHAR), '__null__') AS g,
             CAST(user_id % 20 AS VARCHAR) AS v, 0 AS s
      FROM events WHERE event_id % 2 = 0
      UNION ALL
      SELECT COALESCE(CAST(event_type AS VARCHAR), '__null__') AS g,
             CAST(user_id % 20 AS VARCHAR) AS v, 1 AS s
      FROM events WHERE event_id % 2 = 1
    ),
    u AS (
      SELECT g, v,
             SUM(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS nb,
             SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS nc
      FROM ub GROUP BY g, v
    ),
    r AS (
      SELECT g, v, nb, nc,
             SUM(nb) OVER (PARTITION BY g) AS tb,
             SUM(nc) OVER (PARTITION BY g) AS tc,
             ROW_NUMBER() OVER (PARTITION BY g
                                ORDER BY nb + nc DESC, CAST(v AS VARCHAR)) AS rk
      FROM u
    ),
    kept AS (SELECT * FROM r WHERE rk <= 1000),
    oth AS (
      SELECT g, MAX(tb) - SUM(nb) AS nb, MAX(tc) - SUM(nc) AS nc,
             MAX(tb) AS tb, MAX(tc) AS tc
      FROM kept GROUP BY g
      HAVING MAX(tb) - SUM(nb) > 0 OR MAX(tc) - SUM(nc) > 0
    ),
    j AS (
      SELECT g, nb, nc, tb, tc FROM kept
      UNION ALL SELECT g, nb, nc, tb, tc FROM oth
    ),
    terms AS (
      SELECT g, tb, tc,
             CAST(round((
               CASE WHEN (nb + nc) * tb / (tb + tc) > 0
                    THEN POW(nb - (nb + nc) * tb / (tb + tc), 2)
                         / ((nb + nc) * tb / (tb + tc))
                    ELSE 0.0 END
               + CASE WHEN (nb + nc) * tc / (tb + tc) > 0
                      THEN POW(nc - (nb + nc) * tc / (tb + tc), 2)
                           / ((nb + nc) * tc / (tb + tc))
                      ELSE 0.0 END) * 1000000000) AS BIGINT) AS t
      FROM j
    ),
    agg AS (
      SELECT g, round(SUM(t) / 1000000000.0, 6) AS chi2,
             GREATEST(COUNT(*) - 1, 1) AS dof,
             MAX(tb) AS tb, MAX(tc) AS tc
      FROM terms GROUP BY g
    )
    SELECT * FROM (
      SELECT g AS "group", chi2, CAST(dof AS BIGINT) AS dof,
             ROUND((cbrt(chi2 / dof) - (1 - 2.0 / (9 * dof)))
                   / sqrt(2.0 / (9 * dof)), 6) AS z,
             (cbrt(chi2 / dof) - (1 - 2.0 / (9 * dof)))
                   / sqrt(2.0 / (9 * dof)) > 1.6448536269514729 AS drifted
      FROM agg WHERE tb > 0 AND tc > 0
      UNION ALL
      SELECT g, CAST(NULL AS DOUBLE), CAST(NULL AS BIGINT),
             CAST(NULL AS DOUBLE), CAST(NULL AS BOOLEAN)
      FROM agg WHERE tb = 0 OR tc = 0
    ) ORDER BY "group"
    """,
)
def q_chi_square_grouped_events(spark, sf_dir):
    """Per-segment categorical χ² (drift/detectors.py chi_square_grouped)
    — the categorical member of the grouped drift family: every
    event_type's homogeneity statistic over the user_id%20 category
    distribution from ONE (group, value) count pass, top-K + "other"
    fold PER GROUP, Wilson–Hilferty z gate (p < α ⟺ z > z_α) so the
    whole decision stays relational column math."""
    from truthound_spark.drift.detectors import chi_square_grouped

    ev = t(spark, sf_dir, "events").withColumn(
        "cat", (F.col("user_id") % 20).cast("string")
    )
    return chi_square_grouped(
        ev.filter(F.col("event_id") % 2 == 0),
        ev.filter(F.col("event_id") % 2 == 1),
        "cat",
        "event_type",
        alpha=0.05,
    ).orderBy("group")


@register(
    "feature_drift_fitted_lineitem",
    """
    WITH bq AS (
      SELECT CAST(l_quantity AS DOUBLE) AS q, CAST(l_extendedprice AS DOUBLE) AS e,
             l_returnflag AS rf
      FROM lineitem WHERE l_orderkey % 2 = 0
    ),
    cq AS (
      SELECT CAST(l_quantity AS DOUBLE) * 1.5 AS q,
             CAST(l_extendedprice AS DOUBLE) AS e,
             CASE WHEN l_returnflag = 'R' THEN 'X' ELSE l_returnflag END AS rf
      FROM lineitem WHERE l_orderkey % 2 = 1
    ),
    nb AS (
      SELECT COUNT(*) AS total,
             COUNT(q) AS nq, AVG(q) AS mq, STDDEV_SAMP(q) AS sq,
             MIN(q) AS loq, MAX(q) AS hiq,
             COUNT(e) AS ne, AVG(e) AS me, STDDEV_SAMP(e) AS se,
             MIN(e) AS loe, MAX(e) AS hie
      FROM bq
    ),
    nc AS (
      SELECT COUNT(*) AS total,
             COUNT(q) AS nq, AVG(q) AS mq, STDDEV_SAMP(q) AS sq,
             MIN(q) AS loq, MAX(q) AS hiq,
             COUNT(e) AS ne, AVG(e) AS me, STDDEV_SAMP(e) AS se,
             MIN(e) AS loe, MAX(e) AS hie
      FROM cq
    ),
    num AS (
      SELECT 'l_quantity' AS feature,
             nb.mq AS mb, nb.sq AS sb, nb.loq AS lob, nb.hiq AS hib,
             (nb.total - nb.nq) / CAST(nb.total AS DOUBLE) AS nrb,
             nc.mq AS mc, nc.sq AS sc, nc.loq AS loc, nc.hiq AS hic,
             (nc.total - nc.nq) / CAST(nc.total AS DOUBLE) AS nrc
      FROM nb, nc
      UNION ALL
      SELECT 'l_extendedprice',
             nb.me, nb.se, nb.loe, nb.hie,
             (nb.total - nb.ne) / CAST(nb.total AS DOUBLE),
             nc.me, nc.se, nc.loe, nc.hie,
             (nc.total - nc.ne) / CAST(nc.total AS DOUBLE)
      FROM nb, nc
    ),
    num_scores AS (
      SELECT feature,
             GREATEST(
               LEAST(1.0, ABS(mc - mb)
                 / (CASE WHEN sb IS NULL OR sb = 0 THEN 1.0 ELSE sb END) / 3.0),
               CASE WHEN sb > 0 THEN LEAST(1.0, ABS(sc / sb - 1.0)) ELSE 0.0 END,
               CASE WHEN loc < lob OR hic > hib THEN 0.5 ELSE 0.0 END,
               CASE WHEN ABS(nrc - nrb) > 0.1 THEN ABS(nrc - nrb) ELSE 0.0 END
             ) AS raw
      FROM num
    ),
    pb AS (
      SELECT rf AS v, COUNT(*) / CAST((SELECT total FROM nb) AS DOUBLE) AS p
      FROM bq WHERE rf IS NOT NULL GROUP BY rf
    ),
    pc AS (
      SELECT rf AS v, COUNT(*) / CAST((SELECT total FROM nc) AS DOUBLE) AS p
      FROM cq WHERE rf IS NOT NULL GROUP BY rf
    ),
    cat_terms AS (
      SELECT
        COALESCE((SELECT SUM(p) FROM pc WHERE v NOT IN (SELECT v FROM pb)), 0)
          AS new_mass,
        COALESCE((SELECT SUM(p) FROM pb WHERE v NOT IN (SELECT v FROM pc)), 0)
          AS missing_mass,
        COALESCE((SELECT MAX(ABS(pc.p - pb.p)) FROM pb JOIN pc ON pb.v = pc.v), 0)
          AS max_prop,
        ABS((SELECT (total - COUNT(*)) / CAST(total AS DOUBLE)
             FROM cq, nc WHERE rf IS NOT NULL GROUP BY total)
            - (SELECT (total - COUNT(*)) / CAST(total AS DOUBLE)
               FROM bq, nb WHERE rf IS NOT NULL GROUP BY total)) AS null_drift
    ),
    cat_scores AS (
      SELECT 'l_returnflag' AS feature,
             GREATEST(
               CASE WHEN new_mass > 0.05 THEN new_mass ELSE 0.0 END,
               CASE WHEN missing_mass > 0.1 THEN missing_mass ELSE 0.0 END,
               CASE WHEN max_prop > 0.1 THEN max_prop ELSE 0.0 END,
               CASE WHEN null_drift > 0.1 THEN null_drift ELSE 0.0 END
             ) AS raw
      FROM cat_terms
    )
    SELECT feature, ROUND(raw, 6) AS drift_score, raw >= 0.05 AS is_drifted
    FROM (SELECT * FROM num_scores UNION ALL SELECT * FROM cat_scores)
    ORDER BY feature
    """,
)
def q_feature_drift_fitted_lineitem(spark, sf_dir):
    """Fitted feature-drift detection (ml/feature_drift.py
    FeatureDriftDetector; reference ml/drift_detection/feature.py:80):
    fit() reduces the reference to O(columns) profiles in ONE fused
    aggregate — detection against a 100 TB baseline never re-scans it —
    then detect() scores mean/std/range/null shifts per numeric feature
    and new/missing/proportion shifts per categorical. The current side
    plants a 1.5× quantity scale and an R→X category swap; the oracle
    replays both profile passes and the reference's max-of-gated-terms
    scoring."""
    from truthound_spark.ml.feature_drift import FeatureDriftDetector

    li = t(spark, sf_dir, "lineitem")
    base = li.filter(F.col("l_orderkey") % 2 == 0).select(
        "l_quantity", "l_extendedprice", "l_returnflag"
    )
    cur = li.filter(F.col("l_orderkey") % 2 == 1).select(
        (F.col("l_quantity") * 1.5).alias("l_quantity"),
        "l_extendedprice",
        F.when(F.col("l_returnflag") == "R", "X")
        .otherwise(F.col("l_returnflag"))
        .alias("l_returnflag"),
    )
    det = FeatureDriftDetector(threshold=0.05).fit(base)
    res = det.detect(cur)
    out = None
    for fs in sorted(res.feature_scores, key=lambda f: f.feature):
        one = _scalar_df(
            spark,
            drift_score=round(fs.drift_score, 6),
            is_drifted=bool(fs.is_drifted),
        ).select(F.lit(fs.feature).alias("feature"), "drift_score", "is_drifted")
        out = one if out is None else out.unionAll(one)
    return out.orderBy("feature")


@register(
    "distribution_drift_fitted_lineitem",
    """
    WITH b AS (
      SELECT CAST(l_quantity AS DOUBLE) AS q, CAST(l_discount AS DOUBLE) AS d
      FROM lineitem WHERE l_orderkey % 2 = 0
    ),
    c AS (
      SELECT CAST(l_quantity AS DOUBLE) * 1.2 AS q, CAST(l_discount AS DOUBLE) AS d
      FROM lineitem WHERE l_orderkey % 2 = 1
    ),
    stq AS (SELECT MIN(q) AS lo, MAX(q) AS hi FROM b),
    std AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM b),
    binq AS (
      SELECT t.b AS bin, lo + t.b * ((hi - lo) / 10) AS e_lo,
             CASE WHEN t.b < 9 THEN lo + (t.b + 1) * ((hi - lo) / 10)
                  ELSE hi + 0.001 END AS e_hi
      FROM stq, (SELECT UNNEST(range(10)) AS b) t
    ),
    bind AS (
      SELECT t.b AS bin, lo + t.b * ((hi - lo) / 10) AS e_lo,
             CASE WHEN t.b < 9 THEN lo + (t.b + 1) * ((hi - lo) / 10)
                  ELSE hi + 0.001 END AS e_hi
      FROM std, (SELECT UNNEST(range(10)) AS b) t
    ),
    hq AS (
      SELECT 'l_quantity' AS col, binq.bin,
             (SELECT COUNT(*) FROM b WHERE b.q >= e_lo AND b.q < e_hi) AS pn,
             (SELECT COUNT(*) FROM c WHERE c.q >= e_lo AND c.q < e_hi) AS qn
      FROM binq
    ),
    hd AS (
      SELECT 'l_discount' AS col, bind.bin,
             (SELECT COUNT(*) FROM b WHERE b.d >= e_lo AND b.d < e_hi) AS pn,
             (SELECT COUNT(*) FROM c WHERE c.d >= e_lo AND c.d < e_hi) AS qn
      FROM bind
    ),
    cells AS (SELECT * FROM hq UNION ALL SELECT * FROM hd),
    sm AS (
      SELECT col, bin,
             (pn + 0.0001) / (SUM(pn) OVER (PARTITION BY col) + 0.0001 * 10) AS p,
             (qn + 0.0001) / (SUM(qn) OVER (PARTITION BY col) + 0.0001 * 10) AS q
      FROM cells
    ),
    terms AS (
      SELECT col,
             CAST(round(CASE WHEN p > 0 AND q > 0
                             THEN (q - p) * ln(q / p) ELSE 0.0 END
                        * 1000000000) AS BIGINT) AS t
      FROM sm
    ),
    scores AS (
      SELECT col, ABS(SUM(t) / 1000000000.0) AS raw FROM terms GROUP BY col
    ),
    dt AS (
      SELECT CASE SUM(CASE WHEN raw >= 0.1 THEN 1 ELSE 0 END)
             WHEN 0 THEN 'none' WHEN 1 THEN 'single_feature'
             ELSE 'global' END AS drift_type
      FROM scores
    )
    SELECT col AS "column", ROUND(raw, 6) AS drift_score,
           raw >= 0.1 AS is_drifted, dt.drift_type
    FROM scores, dt ORDER BY "column"
    """,
)
def q_distribution_drift_fitted_lineitem(spark, sf_dir):
    """Fitted distribution drift (ml/distribution_drift.py
    DistributionDriftDetector; reference ml/drift_detection/
    distribution.py:45): fit() stores O(cols × bins) smoothed reference
    histograms — never the reference's raw ``values`` list — and
    detect() scores PSI per column from ONE fused aggregate over the
    current side (here with a planted 1.2× quantity scale). The oracle
    replays the reference-edge binning (+0.001 top-edge nudge), the
    (c+1e-4)/(total+1e-3) smoothing, and |Σ (q−p)·ln(q/p)|."""
    from truthound_spark.ml.distribution_drift import DistributionDriftDetector

    li = t(spark, sf_dir, "lineitem")
    base = li.filter(F.col("l_orderkey") % 2 == 0).select("l_quantity", "l_discount")
    cur = li.filter(F.col("l_orderkey") % 2 == 1).select(
        (F.col("l_quantity") * 1.2).alias("l_quantity"), "l_discount"
    )
    det = DistributionDriftDetector(method="psi", threshold=0.1).fit(base)
    res = det.detect(cur)
    out = None
    for col, score in sorted(res.column_scores):
        one = _scalar_df(
            spark,
            drift_score=round(score, 6),
            is_drifted=bool(score >= det.threshold),
        ).select(
            F.lit(col).alias("column"),
            "drift_score",
            "is_drifted",
            F.lit(res.drift_type).alias("drift_type"),
        )
        out = one if out is None else out.unionAll(one)
    return out.orderBy("column")


@register(
    "concept_drift_grouped_lineitem",
    """
    WITH b AS (
      SELECT COALESCE(CAST(l_returnflag AS VARCHAR), '__null__') AS g,
             CAST(l_quantity AS DOUBLE) AS q, CAST(l_discount AS DOUBLE) AS d,
             CAST(l_extendedprice AS DOUBLE) AS y
      FROM lineitem WHERE l_orderkey % 2 = 0
    ),
    c AS (
      SELECT COALESCE(CAST(l_returnflag AS VARCHAR), '__null__') AS g,
             CAST(l_quantity AS DOUBLE) AS q, CAST(l_discount AS DOUBLE) AS d,
             CAST(l_extendedprice AS DOUBLE) AS y
      FROM lineitem WHERE l_orderkey % 2 = 1
    ),
    cb AS (SELECT g, COALESCE(CORR(q, y), 0) AS c0, COALESCE(CORR(d, y), 0) AS c1
           FROM b GROUP BY g),
    cc AS (SELECT g, COALESCE(CORR(q, y), 0) AS c0, COALESCE(CORR(d, y), 0) AS c1
           FROM c GROUP BY g),
    wide AS (
      SELECT COALESCE(cb.g, cc.g) AS g, cb.c0 AS b0, cb.c1 AS b1,
             cc.c0 AS k0, cc.c1 AS k1
      FROM cb FULL JOIN cc ON cb.g = cc.g
    ),
    pairs AS (
      SELECT g, 'l_quantity' AS feature, b0 AS rb, k0 AS rc FROM wide
      UNION ALL SELECT g, 'l_discount', b1, k1 FROM wide
    )
    SELECT g AS "group", feature, ROUND(rb, 6) AS ref_corr,
           ROUND(rc, 6) AS cur_corr, ROUND(ABS(rc - rb), 6) AS corr_change,
           CASE WHEN rb IS NOT NULL AND rc IS NOT NULL THEN
             ROUND(LEAST(1.0,
                   (ABS(rc - rb) + CASE WHEN rb * rc < 0 AND ABS(rb) > 0.1
                                         AND ABS(rc) > 0.1
                                        THEN 0.5 ELSE 0.0 END) / 0.5), 6)
           END AS score
    FROM pairs ORDER BY "group", feature
    """,
)
def q_concept_drift_grouped_lineitem(spark, sf_dir):
    """Per-segment concept drift (ml/concept_drift.py
    concept_drift_grouped): every l_returnflag segment's feature↔target
    correlation shift between the even/odd halves from ONE
    groupBy(group) correlation batch per side — a model can hold its
    global feature↔target structure while one segment's relationship
    quietly inverts; N segments cost the same two aggregates as one."""
    from truthound_spark.ml.concept_drift import concept_drift_grouped

    li = t(spark, sf_dir, "lineitem")
    return concept_drift_grouped(
        li.filter(F.col("l_orderkey") % 2 == 0),
        li.filter(F.col("l_orderkey") % 2 == 1),
        "l_extendedprice",
        ["l_quantity", "l_discount"],
        "l_returnflag",
    ).orderBy("group", "feature")


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


@register(
    "ks_grouped_sketch_events",
    f"""
    WITH edges(g, e) AS (VALUES {_KS_SKETCH_EDGE_VALUES}),
    ub AS (
      SELECT COALESCE(CAST(event_type AS VARCHAR), '__null__') AS g, value AS v,
             0 AS s
      FROM events WHERE event_id % 2 = 0 AND value IS NOT NULL
      UNION ALL
      SELECT COALESCE(CAST(event_type AS VARCHAR), '__null__') AS g, value AS v,
             1 AS s
      FROM events WHERE event_id % 2 = 1 AND value IS NOT NULL
    ),
    u0 AS (
      SELECT g, v,
             SUM(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS gb,
             SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS gc
      FROM ub WHERE g IN (SELECT g FROM edges) GROUP BY g, v
    ),
    idx AS (
      SELECT u0.g, u0.v, u0.gb, u0.gc, COUNT(e.e) AS i
      FROM u0 LEFT JOIN edges e ON e.g = u0.g AND e.e < u0.v
      GROUP BY u0.g, u0.v, u0.gb, u0.gc
    ),
    cells AS (SELECT g, i, SUM(gb) AS gb, SUM(gc) AS gc FROM idx GROUP BY g, i),
    m AS (SELECT g, COUNT(*) AS m FROM edges GROUP BY g),
    tots AS (SELECT g, SUM(gb) AS n_base, SUM(gc) AS n_cur FROM cells GROUP BY g),
    ecdf AS (
      SELECT g, i,
             SUM(gb) OVER (PARTITION BY g ORDER BY i
                           ROWS UNBOUNDED PRECEDING) AS cb,
             SUM(gc) OVER (PARTITION BY g ORDER BY i
                           ROWS UNBOUNDED PRECEDING) AS cc
      FROM cells
    ),
    agg AS (
      SELECT ecdf.g,
             MAX(ABS(cb / CAST(NULLIF(n_base, 0) AS DOUBLE)
                     - cc / CAST(NULLIF(n_cur, 0) AS DOUBLE))) AS raw,
             MAX(n_base) AS n_base, MAX(n_cur) AS n_cur
      FROM ecdf JOIN tots ON ecdf.g = tots.g JOIN m ON ecdf.g = m.g
      WHERE i < m.m GROUP BY ecdf.g
    )
    SELECT g AS "group", CAST(n_base AS BIGINT) AS n_base,
           CAST(n_cur AS BIGINT) AS n_cur,
           ROUND(raw, 6) AS ks,
           ROUND(sqrt(-0.5 * ln(0.05 / 2))
                 * sqrt((n_base + n_cur)
                        / CAST(NULLIF(n_base * n_cur, 0) AS DOUBLE)), 6) AS crit,
           raw > sqrt(-0.5 * ln(0.05 / 2))
                 * sqrt((n_base + n_cur)
                        / CAST(NULLIF(n_base * n_cur, 0) AS DOUBLE)) AS drifted
    FROM agg ORDER BY "group"
    """,
)
def q_ks_grouped_sketch_events(spark, sf_dir):
    """Per-segment SKETCH KS, fit-then-replay (drift/detectors.py
    ks_grouped_at_edges; the detect phase of ks_grouped_sketch): rows
    map onto FITTED per-group quantile edges via a map-only O(grid)
    array filter, then the same group-partitioned cumulative/total
    windows and sup as exact ks_grouped — (segments × grid) post-scan
    state regardless of value cardinality. The edges are literals fitted
    once by percentile_approx (see _KS_SKETCH_EDGES); the oracle replays
    cell assignment relationally (edge-count join), certifying the whole
    replay path hash-identically."""
    from truthound_spark.drift.detectors import ks_grouped_at_edges

    ev = t(spark, sf_dir, "events")
    return ks_grouped_at_edges(
        ev.filter(F.col("event_id") % 2 == 0),
        ev.filter(F.col("event_id") % 2 == 1),
        "value",
        "event_type",
        _KS_SKETCH_EDGES,
        alpha=0.05,
    ).orderBy("group")


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


_URL_RAW_SQL = (
    "(CASE WHEN c_custkey % 2 = 0 THEN 'HTTP' ELSE 'https' END) || "
    "'://WWW.Example' || CAST(c_custkey % 5 AS VARCHAR) || '.COM' || "
    "(CASE WHEN c_custkey % 2 = 0 THEN ':80' ELSE ':443' END) || "
    "'/Products/' || CAST(c_custkey % 7 AS VARCHAR) || "
    "(CASE WHEN c_custkey % 3 = 0 THEN '/' ELSE '' END) || "
    "'?utm_source=news&b=' || CAST(c_custkey % 3 AS VARCHAR) || '&a=1' || "
    "(CASE WHEN c_custkey % 4 = 0 THEN '&gclid=xyz' ELSE '' END) || '#frag'"
)


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


def _replay_dump_dir(sf_dir: str, kind: str) -> str:
    import os as _os
    import tempfile as _tempfile

    return _os.path.join(
        _tempfile.gettempdir(),
        f"spark_graft_{kind}_replay_{_os.path.basename(sf_dir.rstrip('/'))}",
    )


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
