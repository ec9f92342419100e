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
