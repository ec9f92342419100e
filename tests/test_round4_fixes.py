"""Round-4 regression tests: the ADVICE/VERDICT r3 fixes stay fixed.

1. MinHash Jaccard verification never broadcasts shingle payloads — only
   the bare (id_a, id_b) candidate list rides a BroadcastExchange
   (ADVICE r3 medium; at corpus scale a payload broadcast blows the 8 GB
   broadcast cap).
2. embedding_near_duplicates defaults to banded sign-LSH
   (OR-construction): bucket space scales with 2^num_planes while recall
   is recovered across bands (VERDICT r3 "What's wrong" #2).
3. minhash bands default is the verified 32 (ADVICE r3: library users on
   the old bands=16 default got ~1.2% per-pair miss at threshold 0.7;
   the oracle-verified entry always ran 32).
"""

from __future__ import annotations

import io
import re
import contextlib

import pytest
from pyspark.sql import functions as F


def _formatted_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _broadcast_nodes(plan: str) -> list[str]:
    """Each '(N) BroadcastExchange' section of a formatted plan."""
    return [
        s
        for s in re.split(r"\n(?=\(\d+\) )", plan)
        if s.startswith("(") and "BroadcastExchange" in s.split("\n", 1)[0]
    ]


def test_minhash_verification_broadcasts_only_bare_pairs(spark, sf_dir):
    """No BroadcastExchange in the minhash_dedup_pairs plan may carry a
    shingle-array column: only bare id pairs are broadcast; the two
    enriched candidate sides meet in a shuffle join."""
    from truthound_spark.pipeline.dedup import minhash_dedup_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _formatted_plan(minhash_dedup_pairs(docs))
    nodes = _broadcast_nodes(plan)
    assert nodes, "expected the bare candidate list to be broadcast"
    offenders = [n.split("\n", 1)[0] for n in nodes if re.search(r"\bsh(_a|_b)?#", n)]
    assert offenders == [], f"shingle payload on a broadcast: {offenders}"


def test_minhash_default_bands_is_verified_32(spark):
    import inspect

    from truthound_spark.pipeline.dedup import (
        dedup_clusters,
        minhash_dedup_pairs,
        minhash_lsh_candidates,
    )

    for fn in (minhash_lsh_candidates, minhash_dedup_pairs, dedup_clusters):
        assert inspect.signature(fn).parameters["bands"].default == 32, fn.__name__


def test_minhash_pairs_unchanged_by_broadcast_fix(spark):
    """The join-strategy change must not change results: near-identical
    doc pairs are still found with exact Jaccard values."""
    from truthound_spark.pipeline.dedup import minhash_dedup_pairs

    rows = []
    for i in range(30):
        base = f"the quick brown fox {i} jumps over the lazy dog " * 5
        rows.append((2 * i, base))
        rows.append((2 * i + 1, base + "extra trailing words here"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in minhash_dedup_pairs(df, threshold=0.5).collect()
    }
    for i in range(30):
        assert (2 * i, 2 * i + 1) in pairs
        assert pairs[(2 * i, 2 * i + 1)] > 0.5


def _perturbed_embeddings(spark, n_pairs=40, dim=32):
    """Deterministic near-dup pairs: vec 2i and 2i+1 differ by a tiny
    perturbation (cosine ≈ 0.999); cross-pair cosines are near 0."""
    import numpy as np

    rng = np.random.RandomState(7)
    rows = []
    for i in range(n_pairs):
        v = rng.standard_normal(dim)
        w = v + 0.02 * rng.standard_normal(dim)
        rows.append((2 * i, [float(x) for x in v]))
        rows.append((2 * i + 1, [float(x) for x in w]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_embedding_banded_lsh_recall(spark):
    """Banded OR-construction must recover the recall a single wide plane
    set destroys: at cosine≈0.999 per-bit agreement is ~0.99, so the
    16-plane-per-band default finds essentially every planted pair."""
    from truthound_spark.pipeline.dedup import embedding_near_duplicates

    df = _perturbed_embeddings(spark)
    exact = {
        (r.id_a, r.id_b)
        for r in embedding_near_duplicates(df, threshold=0.95, exact=True).collect()
    }
    assert len(exact) == 40  # every planted pair, no cross-pair
    banded = {
        (r.id_a, r.id_b)
        for r in embedding_near_duplicates(df, threshold=0.95).collect()
    }
    assert banded <= exact  # LSH candidates are exact-verified: no false pairs
    assert len(banded) >= 36  # ≥90% recall on planted near-dups


def test_embedding_lsh_single_band_matches_pre_banding_behavior(spark):
    """num_planes=8, num_bands=1 must reproduce the oracle-pinned
    pre-banding candidates: band 0 uses seed 42 exactly as before."""
    from truthound_spark.pipeline.dedup import embedding_near_duplicates
    from truthound_spark.pipeline.similarity import make_planes, sign_lsh_signature

    df = _perturbed_embeddings(spark, n_pairs=20)
    planes = make_planes(32, 8, 42)
    v = df.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("v")
    ).withColumn("bucket", sign_lsh_signature(F.col("v"), planes))
    ba = v.select(F.col("id").alias("id_a"), "bucket")
    bb = v.select(F.col("id").alias("id_b"), "bucket")
    legacy_cands = {
        (r.id_a, r.id_b)
        for r in ba.join(bb, "bucket").filter(F.col("id_a") < F.col("id_b")).collect()
    }
    from truthound_spark.pipeline.dedup import cosine_sim

    got = {
        (r.id_a, r.id_b)
        for r in embedding_near_duplicates(
            df, threshold=0.9, num_planes=8, num_bands=1
        ).collect()
    }
    # every returned pair is a legacy candidate, and every legacy candidate
    # above threshold is returned
    assert got <= legacy_cands
    a = df.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = df.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    verified = {
        (r.id_a, r.id_b)
        for r in spark.createDataFrame(
            list(legacy_cands), "id_a long, id_b long"
        )
        .join(a, "id_a")
        .join(b, "id_b")
        .filter(cosine_sim(F.col("va"), F.col("vb")) >= 0.9)
        .collect()
    } if legacy_cands else set()
    assert got == verified


def test_embedding_banded_lsh_has_no_cartesian(spark):
    from truthound_spark.pipeline.dedup import embedding_near_duplicates

    df = _perturbed_embeddings(spark, n_pairs=10)
    plan = df.sparkSession._jvm and embedding_near_duplicates(
        df, threshold=0.9
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan


# -- bare-string column targeting (silent-pass hazard) -----------------------
#
# NullValidator("email") used to store the bare string in ``columns`` and
# iterate it character-by-character — matching no real column and passing
# SILENTLY. A validator that validates nothing must either target what the
# user named or fail loudly.


def test_bare_string_column_targeting(spark):
    import truthound_spark as th
    from truthound_spark.core.registry import get_validator

    rows = [
        (1, "a@example.com", 25),
        (2, "b@example.com", 35),
        (2, None, 151),
        (4, "d@example.com", 40),
    ]
    f = spark.createDataFrame(rows, ["customer_id", "email", "age"])
    res = th.check(
        f,
        validators=[
            get_validator("not_null")("email"),
            get_validator("unique")("customer_id"),
            get_validator("between")("age", 0, 120),
        ],
    )
    assert not res.success
    assert len(res.issues) == 3  # FIXTURES.md F1: one issue per seeded defect
    assert {i.validator_name for i in res.issues} == {"null", "unique", "range"}


def test_missing_explicit_column_surfaces_execution_error(spark):
    import truthound_spark as th
    from truthound_spark.core.registry import get_validator

    f = spark.createDataFrame([(1,)], ["a"])
    res = th.check(f, validators=[get_validator("null")("nonexistent")])
    assert not res.success
    assert res.execution_issues and "nonexistent" in res.execution_issues[0].details


def test_partial_column_match_still_filters(spark):
    # schema-drift tolerance: when SOME named columns exist, the validator
    # runs on the intersection instead of raising
    from truthound_spark.validators.completeness import NullValidator

    f = spark.createDataFrame([(1, None)], "a int, b string")
    specs = NullValidator(["b", "dropped_col"]).specs(f)
    assert [s.column for s in specs] == ["b"]
