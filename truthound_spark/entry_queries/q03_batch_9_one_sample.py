"""Entry-query registry section 3 (split from the single entry_queries module, r13). Import order = registration order = the original module's order."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from truthound_spark.entry_queries._core import (  # noqa: F401
    EV,
    _DRIFT_BASE,
    _DRIFT_CURR,
    _drift_frames,
    _scalar_df,
    fused_counts,
    judge_counts,
    load_events,
    register,
    t,
)



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
