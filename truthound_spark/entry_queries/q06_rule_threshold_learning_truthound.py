"""Entry-query registry section 6 (split from the single entry_queries module, r13). Import order = registration order = the original module's order."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from truthound_spark.entry_queries._core import (  # noqa: F401
    _BPE_ROUNDS,
    _EVAL_SC,
    _KS_SKETCH_EDGES,
    _KS_SKETCH_EDGE_VALUES,
    _LOGREG_ITERS,
    _NORM_SQL,
    _SHINGLES_SQL,
    _bpe_oracle_ctes,
    _cond_rule_sql,
    _eval_scored,
    _fd_conf_sql,
    _logreg_feats,
    _logreg_weight_ctes,
    _scalar_df,
    register,
    t,
)



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
