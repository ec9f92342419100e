"""Physical-plan regression tests — the 100 TB properties must hold in CI,
not just in a one-off audit: column pruning through the spec layer,
predicate pushdown to parquet, broadcast anti-joins, no accidental
cartesian products in any registered entry query."""

import re

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_fused_agg_prunes_columns(spark):
    """The suite agg must read ONLY the columns the validators touch."""
    from truthound_spark.validators.completeness import NullValidator
    from truthound_spark.validators.distribution import RangeValidator

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    aggs = [F.count(F.lit(1)).alias("rc")]
    for i, v in enumerate([NullValidator(columns=["l_quantity"]), RangeValidator("l_discount", 0, 0.08)]):
        for j, s in enumerate(v.specs(li)):
            aggs.extend(s.agg_columns(f"x{i}_{j}"))
    plan = _plan(li.agg(*aggs))
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert cols == {"l_quantity", "l_discount"}


def test_filter_pushdown_reaches_parquet(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    plan = _plan(li.filter(F.col("l_quantity") > 45).select("l_orderkey"))
    assert "PushedFilters:" in plan
    assert "GreaterThan(l_quantity,45" in plan


def test_orphan_antijoin_broadcasts_parent_keys(spark):
    from truthound_spark.validators.referential import orphans

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    plan = _plan(orphans(li, o, [("l_orderkey", "o_orderkey")]))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_minhash_has_no_cartesian(spark):
    from truthound_spark.pipeline.dedup import minhash_lsh_candidates

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _plan(minhash_lsh_candidates(docs))
    assert "Cartesian" not in plan and "NestedLoop" not in plan


def test_band_bucket_hashes_longs_not_strings(spark):
    """Banding v2 (r14): the LSH bucket is xxhash64 over the band's
    minhash LONGS directly — the v1 CAST-to-STRING + concat_ws form
    allocated ~10 chars per hash per corpus row before hashing (2.6×
    slower map-side at 2M rows, benchmarks/band_hash_probe.py). The
    candidate pair set is unchanged (bucket equality == band tuple
    equality either way), so only the plan shape needs pinning."""
    from truthound_spark.pipeline.dedup import _band_entries, minhash_signatures

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    sig = minhash_signatures(docs)
    plan = _plan(_band_entries(sig, 64, 32))
    # isolate the banding Generate node (the shingle subtree legitimately
    # uses concat_ws to join word shingles — only the BUCKET expression
    # must be string-free)
    band_lines = [ln for ln in plan.splitlines() if "named_struct(band" in ln]
    assert band_lines, plan
    for ln in band_lines:
        assert "concat_ws" not in ln
        assert "cast(h" not in ln.lower()
        assert "xxhash64(h0" in ln


@pytest.mark.slow
def test_no_entry_query_has_accidental_cartesian(spark):
    """Sweep every registered query's physical plan: cartesian products are
    allowed ONLY in the explicitly-exact embedding baselines."""
    import truthound_spark.entry_queries as eq

    allowed_cartesian = {"embedding_near_duplicates", "embedding_topk_cosine"}
    offenders = []
    for name, fn in eq.QUERIES.items():
        try:
            plan = _plan(fn(spark, SF_DIR))
        except Exception:
            continue  # plan inspection only; execution tested elsewhere
        if name in allowed_cartesian:
            continue
        if "CartesianProduct" in plan:
            # 1-row-by-1-row scalar crossJoins are fine; flag real scans
            if "FileScan" in plan.split("CartesianProduct", 1)[1][:2000]:
                offenders.append(name)
    assert offenders == [], f"unexpected cartesian over a file scan: {offenders}"


def test_salted_anti_join_matches_plain(spark):
    """Skew-salted left_anti must return exactly the plain anti-join rows."""
    from truthound_spark.core.skew import salted_left_join
    from pyspark.sql import functions as F

    # heavy skew: 90% of children point at parent 7
    child = spark.range(1000).select(
        F.when(F.col("id") % 10 < 9, 7).otherwise(F.col("id") + 10_000).alias("fk"),
        F.col("id").alias("cid"),
    )
    parent = spark.range(100).select(F.col("id").alias("fk"))
    plain = {r["cid"] for r in child.join(parent, "fk", "left_anti").collect()}
    salted = {
        r["cid"]
        for r in salted_left_join(child, parent, ["fk"], how="left_anti").collect()
    }
    assert salted == plain and len(plain) == 100


def test_salted_inner_join_matches_plain(spark):
    from truthound_spark.core.skew import salted_left_join
    from pyspark.sql import functions as F

    child = spark.range(500).select((F.col("id") % 5).alias("k"), F.col("id").alias("v"))
    parent = spark.range(5).select(F.col("id").alias("k"))
    plain = sorted((r["k"], r["v"]) for r in child.join(parent, "k").collect())
    salted = sorted(
        (r["k"], r["v"]) for r in salted_left_join(child, parent, ["k"]).collect()
    )
    assert len(salted) == 500  # every child row kept exactly once
    assert plain == salted


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Bucketed tables co-locate the join: physical plan shows NO Exchange
    on the join keys — the 100 TB co-located-join strategy (SURVEY §4.5)."""
    from pyspark.sql import functions as F

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.range(1000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("a")).write.bucketBy(
        8, "k"
    ).sortBy("k").mode("overwrite").saveAsTable("b_orders")
    spark.range(3000).select((F.col("id") % 1000).alias("k"), F.col("id").alias("b")).write.bucketBy(
        8, "k"
    ).sortBy("k").mode("overwrite").saveAsTable("b_lineitem")
    joined = spark.table("b_lineitem").join(spark.table("b_orders"), "k")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning(k" not in plan
    assert joined.count() == 3000
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_salted_join_rejects_payload_joins():
    import pytest

    from truthound_spark.core.skew import salted_left_join

    with pytest.raises(ValueError):
        salted_left_join(None, None, ["k"], how="left")


def test_decontaminate_broadcasts_probe_side(spark):
    """The test/eval n-gram probe set must be broadcast: the training
    corpus is never shuffled (the 100 TB property)."""
    from truthound_spark.pipeline.dedup import decontaminate

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = decontaminate(
        docs.filter(F.col("doc_id") % 2 == 0),
        docs.filter(F.col("doc_id") % 2 == 1),
    )
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_ivf_seeded_topk_broadcasts_centroids_and_probes(spark):
    """IVF assignment/probing cross-joins must be against BROADCAST
    centroid/probe frames — never a shuffle of the corpus — and the
    per-query top-k must compile to a partial WindowGroupLimit."""
    from truthound_spark.pipeline.similarity import ivf_seeded_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    out = ivf_seeded_topk(emb, emb.filter(F.col("vec_id") < 4), k=3, num_cells=8)
    plan = _plan(out)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "WindowGroupLimit" in plan


def test_connected_components_shuffles_only_labels(spark):
    """Component rounds operate on (node, label) pairs: the plan of one
    round's label table reads from a checkpointed RDD (constant-depth
    lineage), not from a re-derived join tree."""
    from truthound_spark.pipeline.dedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(20)], "id_a long, id_b long"
    )
    out = connected_components(pairs, driver_threshold=0)
    plan = _plan(out)
    # result is a projection over the final checkpointed label table
    assert "Scan ExistingRDD" in plan


def test_kmeans_assignment_is_pure_projection(spark):
    """Each k-means round's argmin assignment must be literal column math
    over the checkpointed quantized table — no join, no window; the only
    shuffle in a round is the k-row centroid groupBy."""
    from truthound_spark.pipeline.clustering import kmeans

    df = spark.createDataFrame(
        [(i, float(i % 7), float(i % 3)) for i in range(50)],
        "id long, x0 double, x1 double",
    )
    assigned, _ = kmeans(df, ["x0", "x1"], k=3, iters=2, id_col="id")
    plan = _plan(assigned)
    assert "Scan ExistingRDD" in plan  # reads the checkpointed point table
    assert "Join" not in plan and "Window" not in plan


def test_semantic_dedup_broadcasts_centroids_no_cartesian_scan(spark):
    """Cell assignment must be a broadcast of the (tiny) centroid frame;
    the corpus-side O(n^2) pairing must never materialize as a cartesian
    over a file scan — only the in-cell equi-join."""
    from truthound_spark.pipeline.dedup import semantic_dedup

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    plan = _plan(semantic_dedup(emb, num_cells=8, threshold=0.5, checkpoint=False))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "WindowGroupLimit" in plan  # top-1 cell collapses map-side


def test_global_shuffle_single_shuffle_no_global_sort(spark):
    """One hash exchange on the shard key; the rank is per-shard (no
    rangepartitioning/global sort, which would serialize at scale)."""
    from truthound_spark.pipeline.export import global_shuffle

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _plan(global_shuffle(docs, n_shards=8))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "rangepartitioning" not in plan
    assert "Join" not in plan


def test_embedding_stats_is_one_fused_aggregate(spark):
    """The health report must compile to ONE scan + partial/final agg pair
    — no window, no join, single-row exchange."""
    from truthound_spark.pipeline.similarity import embedding_stats

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    plan = _plan(embedding_stats(emb, "embedding", expected_dim=64))
    assert "Join" not in plan and "Window" not in plan
    assert plan.count("HashAggregate") == 2 or "SortAggregate" in plan


def test_ivf_index_search_prunes_partitions(spark, tmp_path):
    """Search over a persisted IVF index must read ONLY the probed cells:
    the vectors scan carries a PartitionFilters entry on `cell` and the
    number of partitions read is bounded by queries x nprobe."""
    from truthound_spark.pipeline.similarity import ivf_build_index, ivf_search_index

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    path = str(tmp_path / "idx")
    ivf_build_index(emb, path, num_cells=8)
    q = emb.filter(F.col("vec_id") < 2)
    out = ivf_search_index(spark, path, q, k=3, nprobe=2)
    plan = _plan(out)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "cell" in m.group(1), plan
    # ≤ 2 queries × 2 probes distinct cells reach the scan
    assert out.count() > 0


def test_bm25_broadcasts_query_terms(spark):
    """BM25 search must broadcast the query-term table — the corpus-side
    postings join is the only big-table operation, keyed by term."""
    from truthound_spark.pipeline.retrieval import bm25_search

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    qs = docs.filter(F.col("doc_id") < 2).select(
        F.col("doc_id").alias("query_id"), "text"
    )
    plan = _plan(bm25_search(docs, qs, k=3, query_id_col="query_id"))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_decontaminate_spans_broadcasts_probe(spark):
    """The probe n-gram set must broadcast; the training corpus is never
    shuffled for the match (same property as whole-doc decontaminate)."""
    from truthound_spark.pipeline.dedup import decontaminate_spans

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = decontaminate_spans(
        docs.filter(F.col("doc_id") % 2 == 0),
        docs.filter(F.col("doc_id") % 2 == 1),
        n=8,
    )
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_no_inferred_size_filter_inlines_gram_pipelines(spark):
    """Plain explode lets InferFiltersFromGenerate add a size(...) > 0
    predicate whose pushdown inlines the ENTIRE tokenize/gram/HOF
    pipeline into the filter — re-evaluated per emitted row (measured
    11x on self_dedup_spans, 40x on winnowing at sf0.1/sf0.01). The
    explode_outer + isNotNull recipe must keep every Filter free of
    size(): only null guards may appear above the Generates."""
    from truthound_spark.pipeline.dedup import self_dedup_spans
    from truthound_spark.pipeline.text import winnow_overlap_pairs

    docs = spark.createDataFrame(
        [(1, "a b c d e f g h i j k l"), (2, "m n o p q r s t u v w x")],
        ["doc_id", "text"],
    )
    for frame in (
        self_dedup_spans(docs, n=3),
        winnow_overlap_pairs(docs, k=3, w=3, min_shared=1),
    ):
        plan = frame._jdf.queryExecution().optimizedPlan().toString()
        offending = [
            line
            for line in plan.splitlines()
            if "Filter" in line and "size(" in line
        ]
        assert not offending, offending


# --- round 7: learning-layer plan shapes -----------------------------------


def test_conditional_mining_is_one_aggregate_one_scan(spark):
    """The whole candidate grid (null/positive/ordering stats for every
    pair) must compile to ONE aggregate over ONE scan — the claim that
    replaces the reference's 3·C² filter passes. Certified against the
    miner's OWN aggregate (conditional_stats is exactly what
    _mine_conditionals collects)."""
    from truthound_spark.ml.rule_learning import conditional_stats

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_quantity", "l_extendedprice", "l_discount"
    )
    pairs, stats = conditional_stats(
        li, ["l_quantity", "l_extendedprice", "l_discount"]
    )
    assert len(pairs) == 6 and stats is not None
    plan = _plan(stats)
    assert plan.count("Scan parquet") == 1
    # single global aggregate: partial + final HashAggregate, nothing else
    assert plan.count("HashAggregate") == 2


def test_fd_mining_shuffles_on_determinant_only(spark):
    """FD mining's groupBy(determinant) covers all dependents in one
    shuffle keyed on the determinant — countDistinct expands but never
    adds a second Exchange round beyond the expand/partial/final chain."""
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    grouped = o.groupBy("o_custkey").agg(
        F.countDistinct("o_orderstatus").alias("u1"),
        F.countDistinct("o_orderpriority").alias("u2"),
    )
    plan = _plan(grouped)
    assert plan.count("Scan parquet") == 1
    assert "hashpartitioning(o_custkey" in plan


def test_pattern_histogram_has_no_unpartitioned_window(spark):
    from truthound_spark.ml.rule_learning import PatternRuleLearner

    c = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    plan = _plan(PatternRuleLearner().pattern_histogram(c, "c_name"))
    assert "Window" not in plan  # broadcast scalar total instead
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_partial_profile_merge_single_shuffle(spark):
    from truthound_spark.profiler.incremental import merged_stats, partial_profile

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    parts = [
        partial_profile(li.filter(F.col("l_orderkey") % 2 == i), f"s{i}", ["l_quantity"])
        for i in range(2)
    ]
    plan = _plan(merged_stats(parts[0].unionByName(parts[1])))
    # one hashpartitioning exchange on the column key — the merge itself
    # distributes (thousands of columns × years of snapshots is fine)
    assert plan.count("Exchange hashpartitioning") == 1


def test_pca_power_anomaly_ranks_after_takeordered(spark):
    """VERDICT r7 #8: the top-10 must come from TakeOrderedAndProject
    (per-partition heads, driver merge), with the rank window applied
    only to the 10-row post-limit relation — never a full-table
    single-partition rank."""
    from truthound_spark.entry_queries import QUERIES

    plan = _plan(QUERIES["pca_power_anomaly_lineitem"](spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan


def test_mine_bitext_single_consumption_four_scans(spark):
    """VERDICT r9 #1: the default lazy plan must execute each of the two
    top-k passes exactly once — 4 FileScans (src+tgt per pass), not the
    12 the old groupBy-mean-join-back shape re-ran per consumer."""
    from truthound_spark.pipeline.align import mine_bitext

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    src = emb.filter(F.col("vec_id") % 2 == 0)
    tgt = emb.filter(F.col("vec_id") % 2 == 1)
    plan = _plan(mine_bitext(src, tgt, k=4))
    assert plan.count("FileScan parquet") <= 4, plan


def test_mine_bitext_persist_returns_materialized_result(spark):
    """persist=True eagerly localCheckpoints the (result-sized) output:
    downstream consumers must not re-run the mining — the returned
    plan has no FileScan left at all."""
    from truthound_spark.pipeline.align import mine_bitext

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    src = emb.filter(F.col("vec_id") % 2 == 0)
    tgt = emb.filter(F.col("vec_id") % 2 == 1)
    lazy = mine_bitext(src, tgt, k=4)
    eager = mine_bitext(src, tgt, k=4, persist=True)
    assert "FileScan parquet" not in _plan(eager)
    a = {tuple(r) for r in lazy.collect()}
    b = {tuple(r) for r in eager.collect()}
    assert a == b and len(a) > 0


def test_ab_experiment_fused_variants_one_scan(spark):
    """Every A/B variant's violation + confusion metrics must compile to
    ONE aggregate over ONE scan regardless of variant count — the claim
    that replaces the reference's full-validation-pass-per-variant loop
    (profiler/ab_testing/experiment.py:112-127). Certified against the
    harness's OWN aggregate: the plan below is exactly what
    run_fused_variants collects."""
    from pyspark.sql import functions as F

    from truthound_spark.profiler.ab_testing import (
        ThresholdVariant,
        _variant_exprs,
    )

    c = spark.read.parquet(f"{SF_DIR}/customer.parquet").withColumn(
        "is_bad", F.col("c_acctbal") < 0
    )
    variants = [
        ThresholdVariant(
            name=f"v{i}", thresholds={"c_acctbal": {"min_value": float(i)}}
        )
        for i in range(8)
    ]
    exprs = [F.count(F.lit(1)).alias("n_rows")]
    for vi, v in enumerate(variants):
        ve, _ = _variant_exprs(v, vi, ["c_acctbal"], {"c_acctbal"}, "is_bad")
        exprs.extend(ve)
    agg = c.agg(*exprs)
    plan = _plan(agg)
    assert plan.count("Scan parquet") == 1, plan
    assert plan.count("HashAggregate") == 2, plan
    # column pruning: only the two columns the gates touch are read
    read_schema = plan.split("ReadSchema: ")[1].split("\n")[0]
    assert "c_acctbal" in read_schema
    assert "c_name" not in read_schema and "c_address" not in read_schema


def test_profile_wide_aggregate_stays_codegen(spark):
    """The r14 percentile split (guide §1.2/§7.2): percentile /
    approx_percentile are TypedImperativeAggregate, and ONE of them in an
    aggregate plans the whole job as ObjectHashAggregateExec — no
    whole-stage codegen for every other stat, plus SortAggregate levels
    over the countDistinct Expand. _stat_aggs therefore returns them in a
    SEPARATE list; this pins the plan property that justifies the split:
    the wide job is pure HashAggregate (codegen), the percentile job is
    the only ObjectHashAggregate, and nothing plans a SortAggregate."""
    from truthound_spark.profiler.table_profiler import _stat_aggs

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_quantity", "l_discount"
    )
    df = li.withColumn("__snap", F.col("l_orderkey") % 3)
    fields = [f_ for f_ in df.schema.fields if f_.name != "__snap"]
    aggs, pct_aggs, _, _ = _stat_aggs(fields, approx=False)
    assert pct_aggs, "numeric columns must produce percentile aggs"
    # no percentile agg may leak into the wide list
    wide_plan = _plan(df.groupBy("__snap").agg(*aggs))
    assert "ObjectHashAggregate" not in wide_plan, wide_plan
    assert "SortAggregate" not in wide_plan, wide_plan
    assert "HashAggregate" in wide_plan, wide_plan
    pct_plan = _plan(df.groupBy("__snap").agg(*pct_aggs))
    assert "ObjectHashAggregate" in pct_plan, pct_plan
    assert "SortAggregate" not in pct_plan, pct_plan


def test_schema_learn_wide_aggregate_stays_codegen(spark):
    """The r15 percentile split in schema.learn (VERDICT r14 #1 — the
    same §7.2 fix the profiler got in r14): the wide learn aggregate
    must plan as pure HashAggregate (whole-stage codegen), with the
    percentile_approx sketches isolated in their own narrow
    ObjectHashAggregate job, and no SortAggregate anywhere. Also pins
    value identity: the split learn() returns the same profile the
    fused expressions produce (same agg exprs, only the job boundary
    moved)."""
    from truthound_spark.schema import _learn_aggs, learn

    cu = spark.read.parquet(f"{SF_DIR}/customer.parquet").select(
        "c_custkey", "c_acctbal", "c_name"
    )
    aggs, pct_aggs, numeric, _ = _learn_aggs(cu.schema.fields, False)
    assert pct_aggs, "numeric columns must produce percentile aggs"
    assert numeric == {"c_custkey", "c_acctbal"}
    wide_plan = _plan(cu.agg(*aggs))
    assert "ObjectHashAggregate" not in wide_plan, wide_plan
    assert "SortAggregate" not in wide_plan, wide_plan
    assert "HashAggregate" in wide_plan, wide_plan
    pct_plan = _plan(cu.agg(*pct_aggs))
    assert "ObjectHashAggregate" in pct_plan, pct_plan
    assert "SortAggregate" not in pct_plan, pct_plan
    # value identity vs the fused single-agg form
    fused = cu.agg(*aggs, *pct_aggs).collect()[0].asDict()
    sch = learn(cu)
    q = sch.columns["c_acctbal"].quantiles
    assert q == {
        "q25": fused["c_acctbal__q"][0],
        "q50": fused["c_acctbal__q"][1],
        "q75": fused["c_acctbal__q"][2],
    }
    assert sch.columns["c_acctbal"].mean == fused["c_acctbal__mean"]
    assert sch.row_count == int(fused["__n"])


def test_coarse_assign_hoists_self_dots(spark):
    """The r14 coarse-assign hoist (_nearest_cell_pairs): the l2_sq
    self-dot folds must sit BELOW the crossJoin — dot(v,v) once per
    corpus row, dot(cv,cv) once per centroid — leaving exactly ONE
    aggregate(zip_with) per (row × centroid) pair in the d2 projection.
    HOF folds are CodegenFallback (interpreted), so the pre-hoist 3
    folds/pair were real per-pair cost (measured 2.6× at 1M×16×dim64,
    benchmarks/assign_hoist_probe.py). Also pins bit-exactness of the
    hoisted d2 against the inline l2_sq formula on real vectors."""
    from truthound_spark.pipeline.similarity import _nearest_cell_pairs, l2_sq

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    corpus = emb.select(
        F.col("vec_id").cast("long").alias("id"),
        F.col("embedding").cast("array<double>").alias("v"),
    )
    cents = (
        corpus.orderBy("id")
        .limit(16)
        .select(F.col("id").alias("cell"), F.col("v").alias("cv"))
    )
    pairs, d2 = _nearest_cell_pairs(corpus, cents, "v")
    plan = _plan(pairs.select("id", "cell", d2.alias("d2")))
    # the d2 projection (above the join) folds only the cross term
    d2_lines = [ln for ln in plan.split("\n") if "AS d2#" in ln]
    assert d2_lines, plan
    assert all(ln.count("zip_with") == 1 for ln in d2_lines), d2_lines
    # ... and references the hoisted self-dots as plain column refs
    # (__vv computed in a Project below the join, __cc inside the
    # broadcast-side TakeOrderedAndProject — one eval per row/centroid)
    assert all("__vv#" in ln and "__cc#" in ln for ln in d2_lines), d2_lines
    below = "\n".join(ln for ln in plan.split("\n") if "AS d2#" not in ln)
    assert "__vv#" in below and "__cc#" in below, plan
    # bit-exactness: identical IEEE result to the inline 3-fold l2_sq
    mism = (
        pairs.select((d2 != l2_sq(F.col("v"), F.col("cv"))).cast("int").alias("m"))
        .agg(F.sum("m").alias("s"))
        .collect()[0]["s"]
    )
    assert mism == 0
