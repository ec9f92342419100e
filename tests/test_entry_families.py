"""Family-composite registry invariants + round-3 operator unit tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from truthound_spark.entry_families import (
    FAMILIES,
    MULTI_ROW_SLOTS,
    ROWS_ONLY_SLOTS,
    build_registries,
)
from truthound_spark.entry_queries import ORACLES, QUERIES


#: Genuinely non-SQL iterative entries (numpy eigh / sampled k-means);
#: registered after the verified prefix, whose closed-form variants
#: (ivf_seeded_topk, pca_power_anomaly) cover the same operators.
POST_PREFIX_ROWS_ONLY = {"ivf_topk_embeddings", "pca_anomaly_lineitem"}


def test_families_cover_every_granular_query_exactly_once():
    fam_members = [m for ms in FAMILIES.values() for m in ms]
    assert len(fam_members) == len(set(fam_members)), "duplicate family member"
    from truthound_spark.entry_families import POST_PREFIX_ORACLE_SLOTS

    slotted = (
        set(fam_members)
        | set(MULTI_ROW_SLOTS)
        | set(ROWS_ONLY_SLOTS)
        | set(POST_PREFIX_ORACLE_SLOTS)
        | POST_PREFIX_ROWS_ONLY
    )
    granular = set(QUERIES)
    assert slotted == granular, (
        f"uncovered={sorted(granular - slotted)} unknown={sorted(slotted - granular)}"
    )


def test_every_family_member_has_an_oracle():
    for fam, members in FAMILIES.items():
        missing = [m for m in members if m not in ORACLES]
        assert not missing, f"{fam}: members without oracle {missing}"
    for name in MULTI_ROW_SLOTS:
        assert name in ORACLES, f"multi-row slot {name} lost its oracle"


def test_driver_prefix_is_50_slots_with_oracles():
    qs, os = build_registries()
    names = list(qs)
    prefix = names[:50]
    # composites first, then showcases, then the two rows-only entries
    assert prefix[: len(FAMILIES)] == list(FAMILIES)
    for name in prefix:
        if name in ROWS_ONLY_SLOTS:
            assert name not in os
        else:
            assert name in os, f"verified-prefix entry {name} has no oracle"
    # every granular query is still individually registered after the prefix
    assert set(names) >= set(QUERIES)


def test_composite_oracle_sql_is_wellformed_duckdb(sf_dir):
    import os as _os

    import duckdb

    if not _os.path.isdir(sf_dir):
        pytest.skip(f"test dataset not present: {sf_dir}")
    con = duckdb.connect()
    for tb in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {tb} AS SELECT * FROM '{sf_dir}/{tb}.parquet'"
        )
    _, os = build_registries()
    for fam in FAMILIES:
        cur = con.execute(f"SELECT * FROM ({os[fam]}) LIMIT 0")
        cols = [d[0] for d in cur.description]
        assert len(cols) == len(set(cols)), f"{fam}: duplicate composite columns"
        for c in cols:
            assert "__" in c, f"{fam}: unprefixed column {c}"


def test_connected_components_chain_and_islands(spark):
    from truthound_spark.pipeline.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (12, 11)],
        "id_a long, id_b long",
    )
    got = {
        (r.id, r.cluster_id)
        for r in connected_components(pairs).collect()
    }
    assert got == {
        (1, 1), (2, 1), (3, 1), (4, 1), (5, 1),
        (10, 10), (11, 10), (12, 10),
    }


def test_connected_components_long_chain_pointer_jumping(spark):
    from truthound_spark.pipeline.dedup import connected_components

    n = 40  # a 40-node chain needs ~log2(40) jumped rounds, not 40
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id_a long, id_b long"
    )
    rows = connected_components(pairs, max_iterations=10, driver_threshold=0).collect()
    assert {r.cluster_id for r in rows} == {0}
    assert len(rows) == n + 1


def test_dedup_clusters_keeps_min_id_canonical(spark):
    from truthound_spark.pipeline.dedup import dedup_clusters

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again today"),
            (2, "the quick brown fox jumps over the lazy dog again today"),
            (3, "a completely different document about spark partitions"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: (r.cluster_id, r.is_canonical) for r in dedup_clusters(df).collect()}
    assert rows[1] == (1, True)
    assert rows[2] == (1, False)
    assert rows[3] == (3, True)


def test_decontaminate_flags_overlapping_train_docs(spark):
    from truthound_spark.pipeline.dedup import decontaminate

    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps high"),
            (2, "totally unrelated training material here"),
        ],
        "doc_id long, text string",
    )
    test = spark.createDataFrame(
        [(100, "watch the quick brown fox jumps far away")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r.overlap_ngrams for r in decontaminate(train, test).collect()}
    # train doc 1 shares 3-grams "the quick brown", "quick brown fox",
    # "brown fox jumps"; doc 2 shares none
    assert rows == {1: 3}


def test_decontaminate_min_overlap_threshold(spark):
    from truthound_spark.pipeline.dedup import decontaminate

    train = spark.createDataFrame(
        [(1, "the quick brown fox jumps high")], "doc_id long, text string"
    )
    test = spark.createDataFrame(
        [(100, "watch the quick brown cat run")], "doc_id long, text string"
    )
    out = decontaminate(train, test, min_overlap=2)
    assert out.count() == 0


def test_connected_components_matches_union_find_on_random_graphs(spark):
    """Distributed CC vs a pure-Python union-find oracle on seeded random
    graphs (mixed chains, stars, islands, self-contained cliques)."""
    import random

    from truthound_spark.pipeline.dedup import connected_components

    for seed in (7, 23, 99):
        rng = random.Random(seed)
        n = 60
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(45)
        ]
        edges = [(a, b) for a, b in edges if a != b]

        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        expected = {}
        for a, b in edges:
            for x in (a, b):
                expected[x] = find(x)
        # canonical root = min node of component
        comp_min = {}
        for x, r in expected.items():
            comp_min.setdefault(find(r), set()).add(x)
        want = {
            x: min(members)
            for root, members in comp_min.items()
            for x in members
        }

        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
        # BOTH execution paths must match the oracle: the distributed
        # label-propagation rounds and the small-graph driver fast path
        got_dist = {
            r.id: r.cluster_id
            for r in connected_components(pairs, driver_threshold=0).collect()
        }
        assert got_dist == want, f"seed {seed} (distributed): {got_dist} != {want}"
        got_fast = {
            r.id: r.cluster_id for r in connected_components(pairs).collect()
        }
        assert got_fast == want, f"seed {seed} (driver): {got_fast} != {want}"
