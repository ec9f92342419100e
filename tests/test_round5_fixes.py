"""Round-5 regression tests: the ADVICE r4 fixes stay fixed.

1. connected_components' small-graph fast path collects edges via
   DataFrame.toArrow() (two int64 columns, ~16 B/edge) instead of Row
   objects — no session-conf involvement at all (the conf-restore
   assertions below pin that the session state is untouched either
   way) — and defaults to a 500k-edge ceiling (ADVICE r4 medium: the
   old 2M default under-estimated Row overhead by 10-30x).
2. semantic_dedup / ivf_seeded_topk / ivf_build_index default centroids
   are the num_cells LOWEST-id vectors, not filter(id < num_cells) — so
   a snowflake-style id space (ids nowhere near 0) no longer silently
   yields an empty centroid set, an empty cross join, and zero output
   rows (ADVICE r4 low).
3. embedding_stats with expected_dim=None uses the MODAL dimension, not
   MAX — one corrupted over-long vector flips its own counter to 1, not
   every healthy vector to mismatched (n-1); empty/all-null input keeps
   n_dim_mismatch at 0, not null (ADVICE r4 low).
4. streaming_near_dedup sorts the WHOLE micro-batch key group before
   canonical selection, not per-pandas-chunk (ADVICE r4 low) — asserted
   structurally on the concat-then-sort order over a simulated multi-
   chunk iterator.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# 1. connected_components fast path: Arrow collect + conf restore
# ---------------------------------------------------------------------------


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "id_a long, id_b long")


def test_cc_fast_path_restores_arrow_conf(spark):
    from truthound_spark.pipeline.dedup import connected_components

    key = "spark.sql.execution.arrow.pyspark.enabled"
    spark.conf.set(key, "false")
    out = connected_components(_pairs(spark, [(1, 2), (2, 3), (10, 11)]))
    got = {(r["id"], r["cluster_id"]) for r in out.collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}
    assert spark.conf.get(key) == "false"


def test_cc_fast_path_restores_arrow_conf_true(spark):
    from truthound_spark.pipeline.dedup import connected_components

    key = "spark.sql.execution.arrow.pyspark.enabled"
    prev = spark.conf.get(key, "false")
    spark.conf.set(key, "true")
    try:
        out = connected_components(_pairs(spark, [(5, 6)]))
        assert out.count() == 2
        assert spark.conf.get(key) == "true"
    finally:
        spark.conf.set(key, prev)


def test_cc_default_threshold_lowered():
    import inspect

    from truthound_spark.pipeline.dedup import connected_components

    sig = inspect.signature(connected_components)
    assert sig.parameters["driver_threshold"].default == 500_000


def test_cc_fast_path_matches_distributed_on_snowflake_ids(spark):
    from truthound_spark.pipeline.dedup import connected_components

    base = 9_000_000_000_000
    edges = [(base + i, base + i + 1) for i in range(0, 40, 2)] + [
        (base + 1, base + 2)
    ]
    fast = connected_components(_pairs(spark, edges))
    dist = connected_components(_pairs(spark, edges), driver_threshold=0)
    assert sorted(map(tuple, fast.collect())) == sorted(map(tuple, dist.collect()))


# ---------------------------------------------------------------------------
# 2. default centroids from lowest ids, not id < num_cells
# ---------------------------------------------------------------------------


def _vecs(spark, ids, dim=4):
    rows = [(int(i), [float((i * 7 + j * 3) % 11) / 11 + 0.1 for j in range(dim)]) for i in ids]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_semantic_dedup_snowflake_ids_full_output(spark):
    from truthound_spark.pipeline.dedup import semantic_dedup

    ids = [7_000_000_000 + i for i in range(30)]
    out = semantic_dedup(_vecs(spark, ids), num_cells=4, threshold=0.999)
    # one row per input vector — the documented contract (old bug: 0 rows)
    assert out.count() == 30
    assert out.select("id").distinct().count() == 30
    # exact-duplicate vectors (the synthetic pattern repeats every 11 ids)
    # drop, but every cluster keeps its lowest-id representative
    assert out.filter(F.col("keep")).count() >= 4


def test_semantic_dedup_empty_input_raises(spark):
    from truthound_spark.pipeline.dedup import semantic_dedup

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="no vectors"):
        semantic_dedup(empty, num_cells=4)


def test_ivf_seeded_topk_snowflake_ids(spark):
    from truthound_spark.pipeline.similarity import ivf_seeded_topk

    ids = [5_000_000_000 + i for i in range(40)]
    corpus = _vecs(spark, ids)
    queries = _vecs(spark, ids[:3])
    out = ivf_seeded_topk(corpus, queries, k=2, num_cells=4, nprobe=4)
    assert out.count() > 0
    # every query got at least one neighbor
    assert out.select("query_id").distinct().count() == 3


def test_ivf_build_index_snowflake_ids(spark, tmp_path):
    from truthound_spark.pipeline.similarity import ivf_build_index, ivf_search_index

    ids = [3_000_000_000 + i for i in range(24)]
    corpus = _vecs(spark, ids)
    path = str(tmp_path / "ivf_snowflake")
    ivf_build_index(corpus, path, num_cells=3)
    # all 24 vectors must land in the index (old bug: zero assigned)
    assert spark.read.parquet(f"{path}/vectors").count() == 24
    out = ivf_search_index(spark, path, _vecs(spark, ids[:2]), k=2, nprobe=3)
    assert out.select("query_id").distinct().count() == 2


def test_ivf_build_index_empty_raises(spark, tmp_path):
    from truthound_spark.pipeline.similarity import ivf_build_index

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="no vectors"):
        ivf_build_index(empty, str(tmp_path / "ivf_empty"), num_cells=3)


# ---------------------------------------------------------------------------
# 3. embedding_stats modal dimension + empty guard
# ---------------------------------------------------------------------------


def test_embedding_stats_one_overlong_vector_counts_one(spark):
    from truthound_spark.pipeline.similarity import embedding_stats

    rows = [(i, [0.1, 0.2, 0.3]) for i in range(9)] + [(9, [0.1, 0.2, 0.3, 0.4, 0.5])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    r = embedding_stats(df, "embedding").collect()[0]
    assert r["n_dim_mismatch"] == 1  # old MAX-reference behavior: 9
    assert r["n_vectors"] == 10


def test_embedding_stats_empty_input_zero_mismatch(spark):
    from truthound_spark.pipeline.similarity import embedding_stats

    df = spark.createDataFrame([], "vec_id long, embedding array<double>")
    r = embedding_stats(df, "embedding").collect()[0]
    assert r["n_vectors"] == 0
    assert r["n_dim_mismatch"] == 0  # strict: the documented contract
    assert r["n_null"] == 0 and r["n_nan"] == 0 and r["n_zero"] == 0


def test_embedding_stats_all_null_zero_mismatch(spark):
    from truthound_spark.pipeline.similarity import embedding_stats

    df = spark.createDataFrame(
        [(1, None), (2, None)], "vec_id long, embedding array<double>"
    )
    r = embedding_stats(df, "embedding").collect()[0]
    assert r["n_null"] == 2
    assert r["n_dim_mismatch"] == 0


def test_embedding_stats_explicit_dim_still_wins(spark):
    from truthound_spark.pipeline.similarity import embedding_stats

    rows = [(i, [0.1] * 3) for i in range(5)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    r = embedding_stats(df, "embedding", expected_dim=4).collect()[0]
    assert r["n_dim_mismatch"] == 5


# ---------------------------------------------------------------------------
# 4. streaming_near_dedup whole-group sort (structural)
# ---------------------------------------------------------------------------


def test_streaming_near_dedup_sorts_across_chunks():
    """The update closure must concat all pandas chunks BEFORE sorting;
    a per-chunk sort makes canonical selection depend on arbitrary chunk
    boundaries. Asserted on the source (the closure is not importable),
    plus a direct simulation of the concat-then-sort order."""
    import inspect

    import pandas as pd

    from truthound_spark.streaming import stateful

    src = inspect.getsource(stateful.streaming_near_dedup)
    assert "pd.concat" in src
    assert "for pdf in pdfs:\n            for _, row in pdf.sort_values" not in src

    # simulate: two chunks whose concat-sort differs from chunk-wise sort
    c1 = pd.DataFrame({"doc_id": [5, 9]})
    c2 = pd.DataFrame({"doc_id": [1, 7]})
    whole = pd.concat([c1, c2], ignore_index=True).sort_values("doc_id")
    assert list(whole["doc_id"]) == [1, 5, 7, 9]
