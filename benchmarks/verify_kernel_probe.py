"""Isolated A/B of the exact-Jaccard VERIFY stage (VERDICT r14 #2).

The r14 decade stage split measured verify at 32.2 s for 35.3 M pairs.
Hypothesis under test (guide §8 / §2.3): the cost is NOT the per-pair
array_intersect compute — it is the exchange that ships a ~1.6 KB
shingle array PER PAIR (35 M × 1.6 KB ≈ 56 GB) into the pair-key
shuffle-hash join. If true, the fix is to broadcast the b-side shingle
table (≈ 850 MB at the decade corpus — size-gated, guide §3.1) so the
enriched a-side never moves.

Variants, all producing the identical (id_a, id_b, jaccard) relation:

* v0_current   — the shipped shape: attach sh_a to pairs (SHJ), attach
                 sh_b to distinct id_b (SHJ), pair-key shuffle_hash join.
* v0_floor     — v0 with the intersect replaced by a constant: isolates
                 join/shuffle cost from intersect compute.
* v1_broadcast — attach sh_a to pairs (SHJ), then ONE BroadcastHashJoin
                 against the full b-side shingle table; the 56 GB
                 enriched a-side never re-shuffles.

Equivalence check: v1 vs v0 pair sets via exceptAll both ways (run with
CHECK=1; skipped by default at decade scale — the check itself is two
more verify passes).

Run: python benchmarks/verify_kernel_probe.py <corpus_parquet_or_sf_dir>
Prints one JSON object per repetition.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import SF_DIR, make_spark  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else SF_DIR
    spark = make_spark()
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    from truthound_spark.pipeline import dedup as dd

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    import tempfile

    if os.path.exists(os.path.join(sf_dir, "_SUCCESS")) or sf_dir.endswith(
        ".parquet"
    ):
        documents = spark.read.parquet(sf_dir).select("doc_id", "text")
    else:
        relayout = os.path.join(
            tempfile.gettempdir(),
            f"spark_graft_bench_relayout_{os.path.basename(sf_dir)}",
        )
        if not os.path.exists(f"{relayout}/documents.parquet"):
            spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
                cpus
            ).write.mode("overwrite").parquet(f"{relayout}/documents.parquet")
        documents = spark.read.parquet(f"{relayout}/documents.parquet")
    documents.count()

    # --- shared setup (not timed per variant): shingles + candidates,
    # exactly the pipeline's own shapes
    sh = dd._hashed_shingle_arrays(
        documents, "text", "doc_id", 3
    ).localCheckpoint(eager=True)
    sig = dd.minhash_signatures(
        documents, "text", "doc_id", 64, 3, _hashed_shingles=sh
    )
    cands = dd.minhash_lsh_candidates(
        documents, "text", "doc_id", 64, 32, 3,
        max_bucket_size=dd.DEFAULT_MAX_BUCKET_SIZE, _hashed_shingles=sh,
    )
    cands, n_pairs = dd._materialize_pairs(cands)
    print(json.dumps({"setup": "done", "n_pairs": n_pairs}), flush=True)

    a = sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a")
    b = sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    jac = (
        F.col("__inter") / (F.col("__na") + F.col("__nb") - F.col("__inter"))
    ).alias("jaccard")

    def v0(intersect_expr):
        with_a = dd._attach_pairs(
            a, cands, "id_a", n_pairs, dd.DEFAULT_PAIR_BROADCAST_BUDGET
        ).select("id_a", "id_b", "sh_a")
        with_b = dd._attach_pairs(
            b,
            cands.select("id_b").dropDuplicates(),
            "id_b",
            n_pairs,
            dd.DEFAULT_PAIR_BROADCAST_BUDGET,
        ).select("id_b", "sh_b")
        return (
            with_a.join(with_b.hint("shuffle_hash"), "id_b")
            .select(
                "id_a",
                "id_b",
                F.size("sh_a").alias("__na"),
                F.size("sh_b").alias("__nb"),
                intersect_expr.alias("__inter"),
            )
            .select("id_a", "id_b", jac)
            .filter(F.col("jaccard") >= 0.7)
        )

    def v1():
        with_a = dd._attach_pairs(
            a, cands, "id_a", n_pairs, dd.DEFAULT_PAIR_BROADCAST_BUDGET
        ).select("id_a", "id_b", "sh_a")
        return (
            with_a.join(F.broadcast(b), "id_b")
            .select(
                "id_a",
                "id_b",
                F.size("sh_a").alias("__na"),
                F.size("sh_b").alias("__nb"),
                inter.alias("__inter"),
            )
            .select("id_a", "id_b", jac)
            .filter(F.col("jaccard") >= 0.7)
        )

    def v2():
        jac2 = (
            F.col("__inter").cast("double")
            / (F.col("__na") + F.col("__nb") - F.col("__inter").cast("double"))
        ).alias("jaccard")
        return (
            dd._verify_pairs_arrow(sh, cands, dd.DEFAULT_PAIR_BROADCAST_BUDGET)
            .select("id_a", "id_b", jac2)
            .filter(F.col("jaccard") >= 0.7)
        )

    variants = [
        ("v0_current", lambda: v0(inter)),
        ("v0_floor", lambda: v0(F.lit(1.0))),
        ("v1_broadcast", v1),
        ("v2_kernel", v2),
    ]

    for rep in range(3):
        t: dict[str, float] = {"n_pairs": n_pairs}
        for name, build in variants:
            spark.sparkContext.setJobDescription(f"verify probe rep{rep}: {name}")
            t0 = time.time()
            build().write.format("noop").mode("overwrite").save()
            t[name] = round(time.time() - t0, 3)
        print(json.dumps(t), flush=True)

    if os.environ.get("CHECK", "0") == "1":
        x = v0(inter)
        y = v2()
        d1 = x.exceptAll(y).count()
        d2 = y.exceptAll(x).count()
        print(json.dumps({"exceptAll_v0_minus_v2": d1, "exceptAll_v2_minus_v0": d2}))

    dd.release_dedup_caches()


if __name__ == "__main__":
    main()
