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
    """events.parquet carries TIMESTAMP(NANOS) which Spark's vectorized
    parquet reader rejects; read nanos as long and convert to a proper
    (microsecond) timestamp column. Oracle side mirrors with
    make_timestamp(epoch_ns(ts)//1000)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
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
