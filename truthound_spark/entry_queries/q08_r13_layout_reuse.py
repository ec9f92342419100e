"""Entry-query registry section 8 (r13): layout auto-detection and the
keys-bucketed fingerprint store, certified end-to-end."""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401

from truthound_spark.entry_queries._core import (  # noqa: F401
    ORACLES,
    register,
    t,
)


@register(
    "minhash_autodetect_documents",
    ORACLES["minhash_lsh_pairs_documents"],
)
def q_minhash_autodetect_documents(spark, sf_dir):
    """MinHash dedup with the r13 AUTO-DETECTED shingle layout: a layout
    of the bare documents scan is written (source fingerprint = md5 of
    the sorted file list, recorded in table properties), then
    ``minhash_dedup_pairs`` runs with DEFAULT arguments — no opt-in —
    and must probe-select the stored bucketed table
    (``find_shingle_layout``). The slot raises unless the probe actually
    engaged, and the exhaustive inverted-index oracle certifies the
    auto-selected path produces byte-identical pairs: a fingerprint,
    properties-metadata, or bucketed round-trip defect breaks either the
    raise or the hash."""
    import os as _os
    import tempfile as _tempfile

    from truthound_spark.pipeline.dedup import (
        find_shingle_layout,
        minhash_dedup_pairs,
        write_shingle_layout,
    )

    df = t(spark, sf_dir, "documents")
    tag = _os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    loc = _os.path.join(_tempfile.gettempdir(), f"spark_graft_autosh_{tag}")
    table = write_shingle_layout(
        df, f"entry_auto_shingles_{tag}", buckets=8, location=loc
    )
    found = find_shingle_layout(df)
    if found is None:
        raise RuntimeError(
            "auto-detect probe found no layout for the bare documents scan "
            f"(expected one of the written tables, e.g. {table!r})"
        )
    pairs = minhash_dedup_pairs(
        df, "text", "doc_id", threshold=0.7, num_hashes=64, bands=32,
        max_bucket_size=None,  # shingle_table defaults to "auto"
    )
    return pairs.select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    ).orderBy("id_a", "id_b")


@register(
    "attached_layout_fk_orphans",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_orphans,
           CAST(COALESCE(SUM(l_quantity), 0) AS DOUBLE) AS orphan_qty
    FROM lineitem l
    WHERE NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_orderkey = l.l_orderkey AND o.o_orderkey % 7 != 0
    )
    """,
)
def q_attached_layout_fk_orphans(spark, sf_dir):
    """FK orphan check over RE-ATTACHED bucketed layouts (r13
    layout.attach_layout): both sides are written bucketed, then
    re-registered under NEW names purely from their on-disk sidecars —
    the session-restart recovery path — and the Exchange-free anti-join
    runs over the attached tables. The NOT-EXISTS oracle certifies that
    an attached layout computes byte-identical results; the slot raises
    unless the attached plan actually reads the bucketed distribution
    (a silent bucketing-metadata loss would degrade co-location without
    changing results)."""
    import os as _os
    import tempfile as _tempfile

    from truthound_spark.layout import (
        _table_location,
        attach_layout,
        fk_orphans_bucketed,
        write_bucketed,
    )

    tag = _os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    loc = _os.path.join(_tempfile.gettempdir(), f"spark_graft_attach_{tag}")
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    od = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 7 != 0)
        .select(F.col("o_orderkey").alias("l_orderkey"))
    )
    child_src = write_bucketed(
        li, f"entry_att_li_{tag}", "l_orderkey", buckets=8, location=loc
    )
    parent_src = write_bucketed(
        od, f"entry_att_od_{tag}", "l_orderkey", buckets=8, location=loc
    )
    child = attach_layout(
        spark, _table_location(spark, child_src), table=f"entry_att_li2_{tag}"
    )
    parent = attach_layout(
        spark, _table_location(spark, parent_src), table=f"entry_att_od2_{tag}"
    )
    orphans = fk_orphans_bucketed(spark, child, parent, "l_orderkey")
    plan = orphans._jdf.queryExecution().executedPlan().toString()
    if "Bucketed: true" not in plan:
        raise RuntimeError(
            "attached layout lost its bucketing metadata — the anti-join "
            "plan does not read a bucketed scan"
        )
    return orphans.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n_orphans"),
        F.coalesce(F.sum("l_quantity"), F.lit(0)).cast("double").alias("orphan_qty"),
    )


@register(
    "delta_check_fp_keys_colocated_orders",
    ORACLES["delta_check_fp_store_orders"],
)
def q_delta_check_fp_keys_colocated_orders(spark, sf_dir):
    """Delta validation through the r13 KEYS-bucketed fingerprint store
    with the new snapshot itself a key-bucketed table — the co-located
    shape that closed the 60M crossover (SCALING.md r13: 29.8 → 7.7 s).
    The anti-join is equi-keyed on the key alone with the fingerprint
    compared as a bitwise-XOR non-equi condition, so this slot certifies
    exactly the join formulation the layout depends on: same planted
    change classes and the same NOT-EXISTS oracle as the path-store
    slot — an XOR-equality, metadata, or bucketed round-trip defect
    breaks the hash."""
    import os as _os
    import tempfile as _tempfile

    from truthound_spark.delta import (
        changed_rows,
        delta_check,
        write_fingerprints_table,
    )
    from truthound_spark.layout import write_bucketed
    from truthound_spark.validators.distribution import RangeValidator

    p = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    k = F.col("o_orderkey")
    new = (
        p.filter(k % 17 != 0)
        .withColumn(
            "o_totalprice",
            F.when(k % 13 == 0, -F.col("o_totalprice")).otherwise(
                F.col("o_totalprice")
            ),
        )
        .unionByName(
            p.filter(k % 19 == 0).select(
                (k + 1000000000).alias("o_orderkey"),
                "o_custkey",
                "o_totalprice",
            )
        )
    )
    tag = _os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    loc = _os.path.join(_tempfile.gettempdir(), f"spark_graft_fpkeys_{tag}")
    store = write_fingerprints_table(
        p, f"entry_fpkeys_orders_{tag}", "o_orderkey", buckets=8,
        location=loc, bucket_by="keys",
    )
    new_tbl = spark.table(
        write_bucketed(
            new, f"entry_new_orders_{tag}", "o_orderkey", buckets=8,
            database="truthound_layout", location=loc,
        )
    )
    delta = changed_rows(None, new_tbl, "o_orderkey", old_fingerprints=store)
    issues, stats = delta_check(
        None,
        new_tbl,
        "o_orderkey",
        [RangeValidator("o_totalprice", min_value=0.0)],
        old_fingerprints=store,
    )
    agg = delta.groupBy().agg(
        F.count(F.lit(1)).alias("n_changed"),
        F.sum(F.when(k < 1000000000, 1).otherwise(0))
        .cast("long")
        .alias("modified_rows"),
        F.sum(F.when(k >= 1000000000, 1).otherwise(0))
        .cast("long")
        .alias("added_rows"),
        F.sum(F.when(F.col("o_totalprice") < 0, 1).otherwise(0))
        .cast("long")
        .alias("negative_prices"),
        F.round(F.sum("o_totalprice"), 2).alias("changed_revenue"),
    )
    row = agg.collect()[0]
    audit_count = sum(i.count for i in issues)
    if audit_count != row["negative_prices"] or stats["row_count"] != row["n_changed"]:
        raise RuntimeError(
            f"keys-colocated delta audit mismatch: audit={audit_count} "
            f"rows={stats['row_count']} vs relational "
            f"{row['negative_prices']}/{row['n_changed']}"
        )
    return agg


@register(
    "media_audio_wav_real_decode",
    """
    SELECT doc_id AS asset_id,
           16000 AS sample_rate,
           ROUND((1600.0 * (1 + doc_id % 4)) / 16000, 3) AS duration_s,
           1 AS channels,
           (1000.0 + (doc_id % 20) * 500) / 32767 AS rms0
    FROM documents WHERE doc_id < 40 ORDER BY asset_id
    """,
)
def q_media_audio_wav_real_decode(spark, sf_dir):
    """REAL audio codec end-to-end (VERDICT r13 #7, r14): deterministic
    16-bit PCM WAV payloads are synthesized per document (constant
    amplitude 1000 + (id%20)*500, 1600*(1 + id%4) frames @16kHz mono)
    inside the same mapInPandas decode stage, then
    ``real_audio_decoder`` — stdlib ``wave`` + vectorized numpy RMS, no
    fake — parses the RIFF headers back and computes per-segment RMS.
    Constant amplitude makes every quantity closed-form (segment RMS =
    amplitude exactly in float64), so the DuckDB oracle certifies a real
    codec round-trip with no audio library on the oracle side. Output:
    (asset_id, sample_rate, duration_s, channels, rms0)."""
    from truthound_spark.pipeline.multimodal import (
        extract_audio_features,
        real_audio_decoder,
        synth_wav,
    )

    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)

    def synth_then_decode(payload: bytes) -> dict:
        # payload carries the asset id as ASCII digits (the media-frame
        # contract is binary payload in, features out; synthesizing from
        # the id INSIDE the decode stage keeps the WAV bytes off the
        # driver and out of the shuffle)
        doc_id = int(payload.decode("ascii"))
        wav = synth_wav(1000 + (doc_id % 20) * 500, 1600 * (1 + doc_id % 4))
        return real_audio_decoder(wav)

    media = docs.select(
        F.col("doc_id").alias("asset_id"),
        F.encode(F.col("doc_id").cast("string"), "UTF-8").alias("payload"),
    )
    feats = extract_audio_features(media, decoder=synth_then_decode)
    return feats.select(
        "asset_id",
        "sample_rate",
        "duration_s",
        "channels",
        F.element_at("features", 1).alias("rms0"),
    ).orderBy("asset_id")
