"""Stage-split timing of the minhash_dedup_pairs / dedup_clusters
pipeline at bench scale: where do the ~4-7 s actually go?

Replays the bench's exact inputs (relayout'd sf documents) and forces
each internal stage of the pair pipeline in sequence with its own
timer — shingle+hash checkpoint, signature aggregate, band-bucket
grouping, candidate materialization, Jaccard verify, connected
components — so the per-stage cost is visible without the Spark UI
(disabled in bench runs). Stages are forced the same way the pipeline
itself forces them (localCheckpoint / persist+count); the final verify
and CC read those materialized inputs, so no stage is double-counted.

Run: python benchmarks/dedup_stage_probe.py [sf_dir_or_corpus_parquet]
Prints one JSON object {stage: seconds, ...} per repetition.

Pass a DIRECT parquet path (e.g. the bench's sf10 corpus
``/tmp/spark_graft_docs100_sf0.1``) to stage-split at decade scale —
the r14 continuation session measured 500 k docs there as: shingle
18.6 / signature 2.0 / band+group 4.5 / candidate materialization 21.3
/ exact-Jaccard verify 32.2 / CC 3.0 s with n_pairs = 35.3 M (warm
rep; the duplicate-heavy decade corpus keeps ~70 candidates per doc,
so the pair shuffle and the per-pair intersects dominate — inherent to
exact verification, see OPTIMIZATION_r14.md "Decade-scale stage
split").
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

    # a direct corpus parquet (doc_id, text, ...) stages as-is; an sf dir
    # goes through the bench-identical relayout (CPUS-way) so parallelism
    # matches the suite
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

    for rep in range(3):
        t: dict[str, float] = {}

        def mark(name, t0):
            t[name] = round(time.time() - t0, 3)

        spark.sparkContext.setJobDescription(f"probe rep{rep}: shingle+hash")
        t0 = time.time()
        sh = dd._hashed_shingle_arrays(
            documents, "text", "doc_id", 3
        ).localCheckpoint(eager=True)
        mark("shingle_hash_checkpoint", t0)

        spark.sparkContext.setJobDescription(f"probe rep{rep}: signatures")
        t0 = time.time()
        sig = dd.minhash_signatures(
            documents, "text", "doc_id", 64, 3, _hashed_shingles=sh
        ).localCheckpoint(eager=True)
        mark("signature_agg_checkpoint", t0)

        spark.sparkContext.setJobDescription(f"probe rep{rep}: band grouping")
        t0 = time.time()
        band_entries = dd._band_entries(sig, 64, 32)
        grouped = (
            band_entries.groupBy("band", "bucket")
            .agg(F.sort_array(F.collect_list("id")).alias("ids"))
            .filter(F.size("ids") > 1)
            .localCheckpoint(eager=True)
        )
        mark("band_group_checkpoint", t0)

        spark.sparkContext.setJobDescription(f"probe rep{rep}: pair expand")
        t0 = time.time()
        cap = dd.DEFAULT_MAX_BUCKET_SIZE
        # byte-equivalent to minhash_lsh_candidates' capped branch (r14):
        # pairs expand from DISTINCT member sets
        expand = grouped.dropDuplicates(["ids"])
        small_pairs = (
            expand.filter(F.size("ids") <= cap)
            .select(
                F.explode(
                    F.expr(
                        "flatten(transform(ids, (x, i) -> "
                        "transform(slice(ids, i + 2, size(ids)), "
                        "y -> struct(x AS id_a, y AS id_b))))"
                    )
                ).alias("p")
            )
            .select("p.id_a", "p.id_b")
        )
        star_pairs = (
            expand.filter(F.size("ids") > cap)
            .select(
                F.explode(
                    F.expr(
                        "transform(slice(ids, 2, size(ids) - 1), "
                        "y -> struct(ids[0] AS id_a, y AS id_b))"
                    )
                ).alias("p")
            )
            .select("p.id_a", "p.id_b")
        )
        cands = small_pairs.unionByName(star_pairs).dropDuplicates()
        cands, n_pairs = dd._materialize_pairs(cands)
        mark("cands_materialize", t0)
        t["n_pairs"] = n_pairs

        spark.sparkContext.setJobDescription(f"probe rep{rep}: verify")
        t0 = time.time()
        a = sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a")
        b = sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b")
        inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
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
        pairs = (
            with_a.join(with_b.hint("shuffle_hash"), "id_b")
            .select(
                "id_a",
                "id_b",
                F.size("sh_a").alias("__na"),
                F.size("sh_b").alias("__nb"),
                inter.alias("__inter"),
            )
            .select(
                "id_a",
                "id_b",
                (
                    F.col("__inter")
                    / (F.col("__na") + F.col("__nb") - F.col("__inter"))
                ).alias("jaccard"),
            )
            .filter(F.col("jaccard") >= 0.7)
        )
        pairs = pairs.localCheckpoint(eager=True)
        mark("verify_checkpoint", t0)

        spark.sparkContext.setJobDescription(f"probe rep{rep}: connected components")
        t0 = time.time()
        comp = dd.connected_components(pairs)
        ids = documents.select(F.col("doc_id").cast("long").alias("id"))
        out = ids.join(comp, "id", "left").select(
            F.col("id").alias("doc_id"),
            F.coalesce(F.col("cluster_id"), F.col("id")).alias("cluster_id"),
        )
        out.withColumn(
            "is_canonical", F.col("doc_id") == F.col("cluster_id")
        ).write.format("noop").mode("overwrite").save()
        mark("cc_and_join", t0)

        dd.release_dedup_caches()
        spark.sparkContext.setJobDescription(None)
        t["total"] = round(sum(v for k, v in t.items() if k != "n_pairs"), 3)
        print(json.dumps(t))


if __name__ == "__main__":
    main()
