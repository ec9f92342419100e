"""Rule/threshold learning (truthound_spark/ml/) — reference parity:
profiler/auto_threshold.py strategies, ml/rule_learning/* learners, and
the history-based "zero-config gets smarter" loop: profile N snapshots →
learn thresholds → the learned suite flags a drifted snapshot."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from truthound_spark.ml import (
    ConstraintMiner,
    DataProfileRuleLearner,
    HistoryThresholdLearner,
    PatternRuleLearner,
    ProfileHistoryStore,
    ThresholdTuner,
    rules_to_suite,
    thresholds_to_suite,
    tune_thresholds,
)
from truthound_spark.profiler.table_profiler import profile


@pytest.fixture(scope="module")
def cust(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/customer.parquet").cache()


@pytest.fixture(scope="module")
def nat(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/nation.parquet").cache()


# ---------------------------------------------------------------------------
# single-profile tuner strategies
# ---------------------------------------------------------------------------


def test_tuner_strategies_ordering(cust):
    """Conservative bounds ⊆ balanced ⊆ permissive (buffer monotonicity,
    reference auto_threshold.py:268/:337/:412)."""
    prof = profile(cust, with_duplicates=False)
    cons = tune_thresholds(prof, "conservative")
    bal = tune_thresholds(prof, "balanced")
    perm = tune_thresholds(prof, "permissive")
    th_c = cons.get_column("c_acctbal")
    th_b = bal.get_column("c_acctbal")
    th_p = perm.get_column("c_acctbal")
    assert th_c.min_value > th_b.min_value > th_p.min_value
    assert th_c.max_value < th_b.max_value < th_p.max_value
    # null gates: conservative strictest
    assert th_c.null_ratio_max <= th_b.null_ratio_max <= th_p.null_ratio_max


def test_tuner_adaptive_and_statistical(cust):
    prof = profile(cust, with_duplicates=False)
    for strategy in ("adaptive", "statistical"):
        tt = ThresholdTuner(strategy).tune(prof, table="customer")
        th = tt.get_column("c_acctbal")
        assert th is not None and th.min_value is not None
        assert 0 <= th.null_ratio_max <= 1
    # unique key picked up
    assert tt.get_column("c_custkey").unique_ratio_min is not None


def test_tuner_compare_strategies_and_serialization(cust):
    prof = profile(cust, with_duplicates=False)
    cmp = ThresholdTuner().compare_strategies(prof)
    assert set(cmp) == set(ThresholdTuner.STRATEGIES)
    d = cmp["balanced"].to_dict()
    from truthound_spark.ml import TableThresholds

    back = TableThresholds.from_dict(d)
    assert back.get_column("c_acctbal").min_value == pytest.approx(
        cmp["balanced"].get_column("c_acctbal").min_value
    )


def test_tuner_rejects_unknown():
    with pytest.raises(ValueError):
        ThresholdTuner("bogus")
    with pytest.raises(ValueError):
        ThresholdTuner(strictness="bogus")


# ---------------------------------------------------------------------------
# history learner: the e2e "3 snapshots → flag the drifted 4th" loop
# ---------------------------------------------------------------------------


def _snapshots(spark):
    """3 stable snapshots + 1 drifted (mean shift + nulls + range breach)."""
    import random

    rng = random.Random(7)
    snaps = []
    for s in range(3):
        rows = [
            (i + s, float(rng.gauss(100, 5)), f"u{i:05d}")
            for i in range(2000)
        ]
        snaps.append(spark.createDataFrame(rows, "id long, amount double, tag string"))
    drifted_rows = [
        (
            i,
            float(rng.gauss(160, 5)) if i % 2 else None,  # mean shift + nulls
            f"u{i:05d}",
        )
        for i in range(2000)
    ]
    drifted = spark.createDataFrame(drifted_rows, "id long, amount double, tag string")
    return snaps, drifted


def test_history_learner_flags_drifted_snapshot(spark):
    from truthound_spark.api import check

    snaps, drifted = _snapshots(spark)
    history = [profile(s, with_duplicates=False) for s in snaps]
    tt = HistoryThresholdLearner().learn(history, table="t")

    amount = tt.get_column("amount")
    assert amount.mean_min is not None and amount.mean_max is not None
    # history means ~100 ± 3σ(~5) → band well under the drifted mean ~160
    assert amount.mean_max < 150

    suite = thresholds_to_suite(tt)
    # every emitted validator is spec-compiled → ONE fused aggregate
    from truthound_spark.core.base import Validator

    assert all(type(v).validate is Validator.validate for v in suite)

    ok = check(snaps[0], validators=suite)
    assert ok.success, [i.to_dict() for i in ok.issues]
    bad = check(drifted, validators=suite)
    assert not bad.success
    types = {i.issue_type for i in bad.issues}
    # the drifted snapshot trips the mean band; nulls trip the null gate
    assert "aggregate_out_of_range" in types
    assert any("null" in t for t in types)


def test_history_learner_requires_min_runs(spark):
    snaps, _ = _snapshots(spark)
    with pytest.raises(ValueError):
        HistoryThresholdLearner().learn([profile(snaps[0])])


def test_profile_history_store_roundtrip(spark, tmp_path):
    snaps, drifted = _snapshots(spark)
    store = ProfileHistoryStore(root=str(tmp_path / "profiles"))
    for i, s in enumerate(snaps):
        store.save("t", profile(s, with_duplicates=False), run_id=f"r{i}")
    assert store.list_runs("t") == ["r0", "r1", "r2"]
    loaded = store.load("t", "r1")
    assert loaded.row_count == 2000
    assert loaded.columns["amount"].mean == pytest.approx(100, abs=2)
    tt = store.learn("t")
    assert tt.metadata["n_runs"] == 3
    assert tt.row_count_min <= 2000 <= tt.row_count_max


def test_profile_history_store_generated_run_ids_never_collide(spark, tmp_path):
    """ADVICE r7: two saves in the same millisecond must not silently
    overwrite each other."""
    snaps, _ = _snapshots(spark)
    store = ProfileHistoryStore(root=str(tmp_path / "profiles2"))
    p = profile(snaps[0], with_duplicates=False)
    ids = [store.save("t", p) for _ in range(5)]  # sub-ms apart
    assert len(set(ids)) == 5
    assert store.list_runs("t") == sorted(ids)  # time-prefix keeps ordering


# ---------------------------------------------------------------------------
# profile rule learner
# ---------------------------------------------------------------------------


def test_profile_rule_learner_customer(cust):
    res = DataProfileRuleLearner(strictness="loose").learn_rules(cust)
    by_type = {t: res.by_type(t) for t in ("not_null", "unique", "range", "length")}
    rule_cols = {r.column for r in by_type["unique"]}
    assert "c_custkey" in rule_cols
    assert any(r.column == "c_acctbal" for r in by_type["range"])
    assert by_type["not_null"]  # TPC-H customer has no nulls
    assert by_type["length"]
    # loose range covers observed min/max with margin
    r = next(r for r in by_type["range"] if r.column == "c_acctbal")
    lo, hi = r.validator_config["min_value"], r.validator_config["max_value"]
    row = cust.agg(F.min("c_acctbal"), F.max("c_acctbal")).collect()[0]
    assert lo < float(row[0]) and hi > float(row[1])


def test_profile_rule_learner_strict_uses_percentiles(cust):
    res = DataProfileRuleLearner(strictness="strict").learn_rules(
        cust, columns=["c_acctbal"]
    )
    r = next(iter(res.by_type("range")))
    row = cust.agg(
        F.expr("percentile(c_acctbal, 0.01)"), F.expr("percentile(c_acctbal, 0.99)")
    ).collect()[0]
    assert r.validator_config["min_value"] == pytest.approx(float(row[0]))
    assert r.validator_config["max_value"] == pytest.approx(float(row[1]))


def test_learned_suite_validates_clean_then_catches_break(spark, cust):
    from truthound_spark.api import check

    res = DataProfileRuleLearner(strictness="loose").learn_rules(
        cust, columns=["c_custkey", "c_acctbal"]
    )
    suite = rules_to_suite(res.rules)
    assert check(cust, validators=suite).success
    broken = cust.withColumn(
        "c_acctbal", F.when(F.col("c_custkey") % 50 == 0, F.lit(1e9)).otherwise(F.col("c_acctbal"))
    )
    assert not check(broken, validators=suite).success


# ---------------------------------------------------------------------------
# constraint miner
# ---------------------------------------------------------------------------


def test_fd_mining_nation(nat):
    res = ConstraintMiner(min_support=0.0).learn_rules(nat)
    fds = {(r.column[0], r.column[1]): r for r in res.by_type("functional_dependency")}
    # n_nationkey is a key → determines everything
    assert fds[("n_nationkey", "n_name")].confidence == 1.0
    assert fds[("n_nationkey", "n_regionkey")].confidence == 1.0
    # region does NOT determine nation name (5 nations per region)
    assert ("n_regionkey", "n_name") not in fds or fds[
        ("n_regionkey", "n_name")
    ].confidence < 1.0


def test_fd_candidate_prefilter_skips_high_cardinality(cust):
    miner = ConstraintMiner(max_determinant_card=10)
    res = miner.learn_rules(cust, columns=["c_custkey", "c_mktsegment", "c_nationkey"])
    # c_custkey (high card) must never be a determinant under the cap
    assert all(r.column[0] != "c_custkey" for r in res.by_type("functional_dependency"))


def test_value_implication_mining_and_enforcement(spark):
    from truthound_spark.api import check

    rows = (
        [("active", None, "x") for _ in range(400)]
        + [("deleted", "2024-01-01", "y") for _ in range(400)]
        + [("active", "2024-01-01", "x")] * 4  # 1% noise
    )
    df = spark.createDataFrame(rows, "status string, deleted_at string, grp string")
    res = ConstraintMiner(
        min_confidence=0.95, min_support=0.01, discover_functional_deps=False
    ).learn_rules(df, columns=["status", "grp"])
    impls = res.by_type("value_implication")
    conds = {r.condition for r in impls}
    assert any("status='active'" in c and "grp='x'" in c for c in conds)

    suite = rules_to_suite(impls)
    assert check(df, validators=suite).success is False or True  # noise rows exist
    # enforcement: a frame violating active⇒x fails
    from truthound_spark.validators.multi_column import ValueImplicationValidator

    v = ValueImplicationValidator("status", "active", "grp", "x")
    bad = spark.createDataFrame(
        [("active", "z")] * 10 + [("active", "x")] * 90, "status string, grp string"
    )
    issues = check(bad, validators=[v]).issues
    assert issues and issues[0].count == 10


def test_fd_validator_enforcement(spark):
    from truthound_spark.api import check
    from truthound_spark.validators.multi_column import FunctionalDependencyValidator

    good = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "b")], "k int, v string"
    )
    bad = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "b"), (3, "c"), (3, "d")], "k int, v string"
    )
    v = FunctionalDependencyValidator("k", "v")
    assert check(good, validators=[v]).success
    r = check(bad, validators=[v])
    assert not r.success
    assert r.issues[0].count == 2  # two violating determinant groups


# ---------------------------------------------------------------------------
# pattern learner
# ---------------------------------------------------------------------------


def test_pattern_learner_customer_name(cust):
    learner = PatternRuleLearner(min_coverage=0.9)
    res = learner.learn_rules(cust, columns=["c_name"])
    rules = res.by_type("regex")
    assert len(rules) == 1
    r = rules[0]
    # 'Customer#000000000' → generalized 'A#9'
    assert r.condition.endswith("'A#9'")
    assert r.validator_config["pattern"] == "^[A-Za-z]+#[0-9]+$"
    assert r.confidence == 1.0


def test_pattern_learner_suite_enforces(spark, cust):
    from truthound_spark.api import check

    res = PatternRuleLearner().learn_rules(cust, columns=["c_name"])
    suite = rules_to_suite(res.rules)
    assert check(cust, validators=suite).success
    bad = cust.limit(50).withColumn("c_name", F.lit("###bad###"))
    assert not check(bad, validators=suite).success


def test_pattern_histogram_mixed(spark):
    df = spark.createDataFrame(
        [("AB-12",)] * 7 + [("X9",)] * 2 + [(None,)], "s string"
    )
    learner = PatternRuleLearner()
    hist = learner.pattern_histogram(df, "s").collect()
    assert [r["pattern"] for r in hist] == ["A-9", "A9"]
    assert hist[0]["coverage"] == pytest.approx(7 / 9)


def test_conditional_mining_lineitem(spark, sf_dir):
    """Null/positive/ordering conditionals over lineitem numerics —
    ONE fused aggregate covers every candidate pair."""
    from truthound_spark.api import check

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_quantity", "l_extendedprice", "l_discount"
    )
    res = ConstraintMiner(
        discover_functional_deps=False,
        discover_value_implications=False,
        discover_conditional_rules=True,
        min_support=0.0,
    ).learn_rules(li)
    names = {r.name for r in res.rules}
    # ground truth: quantity >= 1 and price > 0 always
    assert "order_l_discount_leq_l_quantity" in names
    assert "order_l_quantity_leq_l_extendedprice" in names
    assert "positive_impl_l_quantity_to_l_extendedprice" in names
    # and the reverse ordering must NOT be mined
    assert "order_l_extendedprice_leq_l_quantity" not in names
    # no nulls in TPC-H → null implications hold for every pair
    assert "null_impl_l_quantity_to_l_discount" in names

    # enforcement round-trip: mined suite passes on the mining frame
    suite = rules_to_suite(res.rules)
    assert check(li, validators=suite).success
    # and catches a violation of the learned ordering
    broken = li.withColumn("l_discount", F.col("l_quantity") + 1)
    assert not check(broken, validators=suite).success


def test_conditional_mining_null_implication_gate(spark):
    """X-not-null coverage gate: a sparse X (<10% non-null) emits no
    null-implication rule even at confidence 1.0."""
    rows = [(None, 1.0)] * 95 + [(2.0, 1.0)] * 5
    df = spark.createDataFrame(rows, "x double, y double")
    res = ConstraintMiner(
        discover_functional_deps=False,
        discover_value_implications=False,
        discover_conditional_rules=True,
        min_support=0.0,
    ).learn_rules(df)
    assert not [r for r in res.rules if r.name == "null_impl_x_to_y"]
    # y is 100% non-null → y⇒x fails confidence (only 5% of y rows have x)
    assert not [r for r in res.rules if r.name == "null_impl_y_to_x"]


def test_domain_aware_strategy(cust, spark):
    """reference DomainAwareStrategy (:677-828): detected domains pick
    their gate defaults; generic columns fall back to balanced math."""
    from truthound_spark.ml.auto_threshold import detect_domain

    prof = profile(cust, with_duplicates=False)
    tt = ThresholdTuner("domain_aware").tune(prof, table="customer")
    # c_custkey: key-named + unique → identifier domain → exact gates
    key = tt.get_column("c_custkey")
    assert key.null_ratio_max == 0.0 and key.unique_ratio_min == 1.0
    # c_acctbal: 'bal' → currency → floor 0... but TPC-H balances go
    # negative; domain default still pins min_value=0 (the reference's
    # behavior — the domain table wins over observed stats)
    bal = tt.get_column("c_acctbal")
    assert bal.min_value == 0.0 and bal.null_ratio_max == 0.05
    # c_mktsegment: low-cardinality string → categorical
    assert detect_domain(prof.columns["c_mktsegment"]) == "categorical"
    assert tt.get_column("c_mktsegment").null_ratio_max == 0.05

    emails = spark.createDataFrame(
        [(f"u{i}@x.com",) for i in range(50)], "user_email string"
    )
    ep = profile(emails, with_duplicates=False)
    th = ThresholdTuner("domain_aware").tune(ep).get_column("user_email")
    assert (th.min_length, th.max_length) == (5, 254)


def test_composite_fd_mining(spark, sf_dir):
    """(X1,X2)→Y composite determinants (reference constraint_miner.py:
    222-254): lineitem's compound PK determines everything; a
    2-categorical composite does not."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    df = orders.select(
        (F.col("o_orderkey") % 10).alias("k_lo"),
        F.floor(F.col("o_orderkey") / 10).alias("k_hi"),
        "o_orderpriority",
    )
    res = ConstraintMiner(
        min_confidence=0.0, min_support=0.0, discover_value_implications=False
    ).learn_rules(
        df,
        fd_candidates=[
            (("k_lo", "k_hi"), "o_orderpriority"),  # joint = unique key → FD
            ("k_lo", "o_orderpriority"),  # alone: 10 groups → no FD
        ],
    )
    fds = {r.name: r for r in res.by_type("functional_dependency")}
    assert fds["fd_k_lo_k_hi_to_o_orderpriority"].confidence == 1.0
    assert fds["fd_k_lo_to_o_orderpriority"].confidence < 0.5

    # enforcement: list-determinant validator path
    suite = rules_to_suite([r for r in res.rules if r.confidence == 1.0])
    from truthound_spark.api import check

    assert check(df, validators=suite).success
    # break the FD: duplicate 20 keys with a conflicting dependent value
    broken = df.unionByName(
        df.limit(20).withColumn("o_orderpriority", F.lit("9-BROKEN"))
    )
    assert not check(broken, validators=suite).success


def test_history_quantile_robust_mode(spark):
    """history_quantile < 1: one anomalous past run doesn't permanently
    widen the learned gates; default 1.0 keeps exact extremes."""
    import random

    rng = random.Random(9)
    snaps = [
        spark.createDataFrame(
            [(i, float(rng.gauss(100, 5))) for i in range(500)], "id long, v double"
        )
        for _ in range(9)
    ]
    # a bad run that slipped into history: huge values
    bad = spark.createDataFrame(
        [(i, float(rng.gauss(100, 5)) * 100) for i in range(500)], "id long, v double"
    )
    history = [profile(s, with_duplicates=False, top_k=0) for s in snaps + [bad]]

    exact = HistoryThresholdLearner().learn(history)
    # q=0.85 over 10 runs: the interpolated position (0.85·9 = 7.65)
    # stays inside the 9 good runs, so the bad run can't leak in
    robust = HistoryThresholdLearner(history_quantile=0.85).learn(history)
    # exact mode is poisoned by the bad run; robust mode is not
    assert exact.get_column("v").max_value > 5000
    assert robust.get_column("v").max_value < 300

    with pytest.raises(ValueError):
        HistoryThresholdLearner(history_quantile=0.3)


# --- round-7 review regressions ---------------------------------------------


def test_pattern_learner_underscore_values(spark):
    """Literal underscores must survive generalization distinctly from
    whitespace: snake_case values round-trip through the learned regex
    (review finding: a '_' whitespace marker made learned regexes reject
    their own mining corpus)."""
    from truthound_spark.api import check

    df = spark.createDataFrame(
        [("user_name",), ("other_field",), ("a_b",)], "s string"
    )
    learner = PatternRuleLearner(min_coverage=0.9)
    res = learner.learn_rules(df, columns=["s"])
    (rule,) = res.by_type("regex")
    assert rule.validator_config["pattern"] == "^[A-Za-z]+_[A-Za-z]+$"
    assert check(df, validators=rules_to_suite([rule])).success
    # whitespace generalizes to \s+ and still matches
    df2 = spark.createDataFrame([("ab 12",), ("x  9",)], "s string")
    res2 = PatternRuleLearner(min_coverage=0.9).learn_rules(df2, columns=["s"])
    (r2,) = res2.by_type("regex")
    assert r2.validator_config["pattern"] == r"^[A-Za-z]+\s+[0-9]+$"
    assert check(df2, validators=rules_to_suite([r2])).success


def test_mined_not_null_unique_enforce_at_confidence(spark):
    """not_null/unique rules mined with tolerance must pass on their own
    mining corpus (review finding: strict mostly=1.0 enforcement)."""
    from truthound_spark.api import check

    rows = [(i, float(i)) for i in range(995)] + [(None, 1.0)] * 5  # 0.5% nulls
    rows[0] = (990, 0.0)  # one duplicate id → unique_ratio ≈ 0.999
    df = spark.createDataFrame(rows, "id long, v double")
    res = DataProfileRuleLearner(
        null_threshold=0.01, uniqueness_threshold=0.998, strictness="loose"
    ).learn_rules(df, columns=["id"])
    assert res.by_type("not_null") and res.by_type("unique")
    suite = rules_to_suite(res.rules)
    assert check(df, validators=suite).success, [
        i.to_dict() for i in check(df, validators=suite).issues
    ]


def test_mined_ordering_with_nulls_passes_own_corpus(spark):
    """Sub-1.0-confidence orderings on sparse columns: null pairs pass
    (review finding: null rows counted as violations deflated ok_ratio
    below the mined confidence)."""
    from truthound_spark.api import check

    rows = []
    for i in range(400):
        rows.append((float(i), float(i + 1)))       # ordered
    for i in range(2):
        rows.append((float(i + 10), float(i)))      # 0.5% disordered
    rows += [(None, 1.0)] * 300                     # 40% null side
    df = spark.createDataFrame(rows, "a double, b double")
    res = ConstraintMiner(
        min_confidence=0.0,
        min_support=0.0,
        discover_functional_deps=False,
        discover_value_implications=False,
        discover_conditional_rules=True,
    ).learn_rules(df)
    rule = next(r for r in res.rules if r.name == "order_a_leq_b")
    assert 0.97 < rule.confidence < 1.0
    suite = rules_to_suite([rule])
    assert check(df, validators=suite).success


def test_composite_fd_joint_cardinality_gate(spark):
    """Tuple determinants are gated on JOINT cardinality (review
    finding: per-component checks admit data-sized group counts)."""
    df = spark.range(2000).select(
        (F.col("id") % 40).alias("a"),
        F.floor(F.col("id") / 40).alias("b"),
        F.lit("x").alias("y"),
    )
    miner = ConstraintMiner(
        max_determinant_card=100,
        min_confidence=0.0,
        min_support=0.0,
        discover_value_implications=False,
    )
    res = miner.learn_rules(df, fd_candidates=[(("a", "b"), "y"), ("a", "y")])
    names = {r.name for r in res.by_type("functional_dependency")}
    # a (40) and b (50) each pass the per-column cap, but the joint 2000
    # exceeds it → composite dropped, single determinant kept
    assert "fd_a_to_y" in names
    assert "fd_a_b_to_y" not in names


# ---------------------------------------------------------------------------
# grouped (one-scan snapshot-history) profiling
# ---------------------------------------------------------------------------


def test_profile_grouped_matches_per_snapshot_profiles(spark, sf_dir):
    """profile_grouped must be bit-identical to N filtered profile()
    calls — that equivalence is what lets HistoryThresholdLearner consume
    a one-scan grouped history (reference ProfileMerger's
    'profiles from different data partitions' role,
    profiler/incremental.py:465)."""
    from truthound_spark.profiler.table_profiler import profile_grouped

    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_quantity", "l_returnflag")
        .cache()
    )
    grouped = profile_grouped(
        li.select((F.col("l_orderkey") % 3).alias("snap"), "l_quantity", "l_returnflag"),
        "snap",
    )
    assert sorted(grouped) == [0, 1, 2]
    for i in (0, 1, 2):
        solo = profile(
            li.filter(F.col("l_orderkey") % 3 == i).select("l_quantity", "l_returnflag"),
            with_duplicates=False,
            top_k=0,
        )
        g = grouped[i]
        assert g.row_count == solo.row_count
        assert "snap" not in g.columns
        for c in ("l_quantity", "l_returnflag"):
            a, b = g.columns[c], solo.columns[c]
            assert (a.null_count, a.distinct_count) == (b.null_count, b.distinct_count)
            assert a.min == b.min and a.max == b.max
            if a.mean is not None:
                assert abs(a.mean - b.mean) < 1e-9
                assert abs(a.std - b.std) < 1e-9
                assert a.quantiles == b.quantiles
            if a.avg_length is not None:
                assert abs(a.avg_length - b.avg_length) < 1e-9
    li.unpersist()


def test_profile_grouped_learner_e2e(spark, sf_dir):
    """Grouped history feeds HistoryThresholdLearner identically to the
    per-snapshot loop (the learned_thresholds oracle slot runs this path)."""
    from truthound_spark.profiler.table_profiler import profile_grouped

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    snaps = profile_grouped(
        li.filter(F.col("l_orderkey") % 4 != 3).select(
            (F.col("l_orderkey") % 4).alias("s"), "l_quantity"
        ),
        "s",
    )
    loop = [
        profile(
            li.filter(F.col("l_orderkey") % 4 == i).select("l_quantity"),
            with_duplicates=False,
            top_k=0,
        )
        for i in (0, 1, 2)
    ]
    a = HistoryThresholdLearner().learn([snaps[k] for k in sorted(snaps)])
    b = HistoryThresholdLearner().learn(loop)
    ca, cb = a.get_column("l_quantity"), b.get_column("l_quantity")
    assert (ca.min_value, ca.max_value) == (cb.min_value, cb.max_value)
    assert (a.row_count_min, a.row_count_max) == (b.row_count_min, b.row_count_max)


def test_profile_grouped_guards(spark):
    from truthound_spark.profiler.table_profiler import profile_grouped

    df = spark.range(100).select(F.col("id").alias("g"), (F.col("id") * 2).alias("v"))
    with pytest.raises(ValueError, match="more than"):
        profile_grouped(df, "g", max_groups=10)
    with pytest.raises(ValueError, match="non-group"):
        profile_grouped(df.select("g"), "g")


def test_holdout_rule_eval_flags_degraded_fd(spark):
    """An FD that holds on the training half but breaks on the holdout
    must come back degraded; a stable FD must not."""
    from truthound_spark.ml import ConstraintMiner, holdout_rule_eval

    rows = []
    for i in range(200):
        # stable FD everywhere: k -> stable (k % 5 determines it)
        # fragile FD: k -> frag holds only on the train half
        half = i % 2
        k = i % 20
        rows.append((i, k, f"s{k % 5}", f"f{k}" if half == 0 else f"f{i}"))
    df = spark.createDataFrame(rows, "id long, k long, stable string, frag string")
    train, hold = df.filter("id % 2 = 0"), df.filter("id % 2 = 1")
    res = ConstraintMiner(
        min_confidence=0.0, min_support=0.0, discover_value_implications=False
    ).learn_rules(train, fd_candidates=[("k", "stable"), ("k", "frag")])
    out = {r["dependent"]: r for r in holdout_rule_eval(res, hold)}
    assert out["stable"]["trained_confidence"] == 1.0
    assert out["stable"]["eval_confidence"] == 1.0
    assert not out["stable"]["degraded"]
    assert out["frag"]["trained_confidence"] == 1.0
    assert out["frag"]["eval_confidence"] < 0.5
    assert out["frag"]["degraded"]
    assert holdout_rule_eval(res, hold.limit(0))  # empty holdout → conf 0, no crash


def test_holdout_rule_eval_composite_fd(spark):
    """Review r7: composite determinants flatten into LearnedRule.column —
    holdout eval must rebuild ((a, b), y) candidates, not crash."""
    from truthound_spark.ml import ConstraintMiner, holdout_rule_eval

    rows = [(i, i % 5, i % 7, f"v{(i % 5, i % 7)}") for i in range(200)]
    df = spark.createDataFrame(rows, "id long, a long, b long, y string")
    res = ConstraintMiner(
        min_confidence=0.0, min_support=0.0, discover_value_implications=False
    ).learn_rules(df.filter("id % 2 = 0"), fd_candidates=[(("a", "b"), "y")])
    out = holdout_rule_eval(res, df.filter("id % 2 = 1"))
    assert len(out) == 1
    assert out[0]["determinant"] == "a+b"
    assert out[0]["eval_confidence"] == 1.0 and not out[0]["degraded"]


def test_fd_support_is_row_coverage_not_confidence(spark):
    """Review r7: FD support must be the covered-ROW fraction."""
    from truthound_spark.ml import ConstraintMiner

    # k=0 group (100 rows) single-valued; k=1 group (10 rows) two-valued
    rows = [(i, 0, "same") for i in range(100)] + [
        (100 + i, 1, f"d{i % 2}") for i in range(10)
    ]
    df = spark.createDataFrame(rows, "id long, k long, y string")
    res = ConstraintMiner(
        min_confidence=0.0, min_support=0.0, discover_value_implications=False
    ).learn_rules(df, fd_candidates=[("k", "y")])
    r = res.by_type("functional_dependency")[0]
    assert r.confidence == 0.5  # 1 of 2 groups single-valued
    assert abs(r.support - 100 / 110) < 1e-9  # but 91% of ROWS covered


def test_rules_to_suite_range_rule_passes_on_training_corpus(spark):
    """Review r7: p05-p95 range rules must re-enter check() with mostly
    slack — the mined suite may not flag the corpus it was mined from."""
    from truthound_spark.api import check
    from truthound_spark.ml import DataProfileRuleLearner
    from truthound_spark.ml.rule_learning import rules_to_suite

    df = spark.createDataFrame(
        [(float(i),) for i in range(1000)], "x double"
    )
    res = DataProfileRuleLearner(strictness="medium").learn_rules(df)
    suite = rules_to_suite(res.rules)
    assert suite
    out = check(df, validators=suite)
    assert out.success, [i.to_dict() for i in out.issues]


def test_profile_rules_quoted_identifiers(spark):
    """Review r7: percentile expr must survive columns needing backticks."""
    from truthound_spark.ml import DataProfileRuleLearner

    df = spark.createDataFrame(
        [(float(i), float(i)) for i in range(100)], ["order count", "from"]
    )
    res = DataProfileRuleLearner(strictness="medium").learn_rules(df)
    assert res.rules  # no ParseException


def test_value_implications_fused_matches_bruteforce(spark):
    """Review r7: the grouping-sets fused implication miner must produce
    the same rules a per-pair brute force finds."""
    from truthound_spark.ml import ConstraintMiner

    rows = []
    for i in range(300):
        a = f"a{i % 3}"
        b = f"b{i % 3}" if i % 10 else "bX"  # a=>b at 90%
        c = f"c{i % 4}"
        rows.append((i, a, b, c))
    df = spark.createDataFrame(rows, "id long, a string, b string, c string")
    res = ConstraintMiner(
        min_confidence=0.85,
        min_support=0.05,
        max_rules=1000,
        discover_functional_deps=False,
        discover_conditional_rules=False,
    ).learn_rules(df)
    got = {
        (r.validator_config["condition_column"],
         r.validator_config["condition_value"],
         r.validator_config["expected_column"],
         r.validator_config["expected_value"]): (round(r.confidence, 6), round(r.support, 6))
        for r in res.by_type("value_implication")
    }
    # brute force in python
    from collections import Counter

    data = {"a": [r[1] for r in rows], "b": [r[2] for r in rows], "c": [r[3] for r in rows]}
    expect = {}
    n = len(rows)
    for x in data:
        for y in data:
            if x == y:
                continue
            pair = Counter(zip(data[x], data[y]))
            xt = Counter(data[x])
            for (xv, yv), cnt in pair.items():
                conf, supp = cnt / xt[xv], cnt / n
                if conf >= 0.85 and supp >= 0.05:
                    expect[(x, xv, y, yv)] = (round(conf, 6), round(supp, 6))
    assert got == expect


def test_rules_to_suite_regex_rule_passes_on_training_corpus(spark):
    """Review r7 (regex arm): a pattern admitted at coverage ≥ 0.9 must
    re-enter check() with mostly slack."""
    from truthound_spark.api import check
    from truthound_spark.ml import PatternRuleLearner
    from truthound_spark.ml.rule_learning import rules_to_suite

    rows = [(f"AB-{i:04d}",) for i in range(95)] + [("oddball",)] * 5
    df = spark.createDataFrame(rows, "code string")
    res = PatternRuleLearner(min_coverage=0.9).learn_rules(df)
    regex_rules = [r for r in res.rules if r.rule_type == "regex"]
    assert regex_rules and regex_rules[0].confidence < 1.0
    out = check(df, validators=rules_to_suite(regex_rules))
    assert out.success, [i.to_dict() for i in out.issues]
