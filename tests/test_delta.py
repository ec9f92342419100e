"""Delta validation (delta.py): validate only added/changed rows."""

import pytest
from pyspark.sql import functions as F

from truthound_spark.delta import changed_rows, delta_check, row_fingerprint
from truthound_spark.validators.distribution import RangeValidator


@pytest.fixture(scope="module")
def snapshots(spark):
    old = spark.range(1000).select(
        F.col("id").alias("k"),
        (F.col("id") % 97).cast("double").alias("v"),
        F.concat(F.lit("s"), F.col("id")).alias("s"),
    )
    # 50 updates (k % 20 == 0 -> v negated), 10 deletes (k in [990,1000)),
    # 30 inserts (k in [2000, 2030))
    new = (
        old.filter(F.col("k") < 990)
        .withColumn(
            "v",
            F.when(F.col("k") % 20 == 0, -F.col("v") - 1).otherwise(F.col("v")),
        )
        .unionByName(
            spark.range(2000, 2030).select(
                F.col("id").alias("k"),
                F.lit(5.0).alias("v"),
                F.lit("new").alias("s"),
            )
        )
    )
    return old, new


class TestChangedRows:
    def test_exactly_updates_plus_inserts(self, snapshots):
        old, new = snapshots
        delta = changed_rows(old, new, "k")
        keys = {r["k"] for r in delta.select("k").collect()}
        expected = {k for k in range(0, 990, 20)} | set(range(2000, 2030))
        assert keys == expected

    def test_unchanged_table_yields_empty_delta(self, snapshots):
        old, _ = snapshots
        assert changed_rows(old, old, "k").count() == 0

    def test_compare_cols_subset_ignores_other_changes(self, snapshots):
        old, _ = snapshots
        renamed = old.withColumn("s", F.lit("different"))
        # comparing only v: the s rewrite is invisible
        assert changed_rows(old, renamed, "k", compare_cols=["v"]).count() == 0
        # comparing s: every row changed
        assert changed_rows(old, renamed, "k", compare_cols=["s"]).count() == 1000

    def test_null_vs_value_is_a_change(self, spark):
        old = spark.createDataFrame([(1, "a"), (2, None)], "k long, s string")
        new = spark.createDataFrame([(1, None), (2, None)], "k long, s string")
        keys = {r["k"] for r in changed_rows(old, new, "k").collect()}
        assert keys == {1}

    def test_framing_prevents_concat_aliasing(self, spark):
        # ("ab","c") must not fingerprint-collide with ("a","bc")
        old = spark.createDataFrame([(1, "ab", "c")], "k long, a string, b string")
        new = spark.createDataFrame([(1, "a", "bc")], "k long, a string, b string")
        assert changed_rows(old, new, "k").count() == 1

    def test_validates_args(self, snapshots):
        old, new = snapshots
        with pytest.raises(ValueError):
            changed_rows(old, new, [])
        with pytest.raises(ValueError):
            changed_rows(
                old.select("k"), new.select("k"), "k"
            )  # nothing but keys
        with pytest.raises(ValueError):
            row_fingerprint([])


class TestDeltaCheck:
    def test_audits_only_the_delta(self, snapshots):
        old, new = snapshots
        issues, stats = delta_check(
            old, new, "k", [RangeValidator("v", 0, 1e9)]
        )
        # 50 negated updates violate; 30 inserts are clean
        assert stats["row_count"] == 80
        assert issues and issues[0].count == 50

    def test_clean_delta_passes(self, snapshots):
        old, _ = snapshots
        grown = old.unionByName(
            old.sparkSession.range(5000, 5010).select(
                F.col("id").alias("k"),
                F.lit(1.0).alias("v"),
                F.lit("x").alias("s"),
            )
        )
        issues, stats = delta_check(old, grown, "k", [RangeValidator("v", 0, 10)])
        assert stats["row_count"] == 10
        assert issues == []


class TestNullKeys:
    def test_unchanged_null_key_row_is_not_reflagged(self, spark):
        old = spark.createDataFrame([(1, "a"), (None, "x")], "k int, v string")
        new = spark.createDataFrame([(1, "a"), (None, "x")], "k int, v string")
        assert changed_rows(old, new, "k").count() == 0

    def test_null_key_inserts_survive_into_the_delta(self, spark):
        # r12 fix: with plain `=` joins the anti-join flagged NULL-key rows
        # but the final semi-join dropped them — exactly the dirtiest rows
        # vanished from the audit. eqNullSafe keeps them.
        old = spark.createDataFrame([(1, "a"), (None, "x")], "k int, v string")
        new = spark.createDataFrame(
            [(1, "a"), (None, "x"), (None, "y"), (2, "b")], "k int, v string"
        )
        got = {(r["k"], r["v"]) for r in changed_rows(old, new, "k").collect()}
        assert (2, "b") in got
        assert (None, "y") in got  # NULL-key insert must be audited
        # key-granular semantics: the changed NULL key conservatively pulls
        # its sibling row too (same rule as any non-unique key)
        assert (None, "x") in got
        assert (1, "a") not in got

    def test_null_key_delta_rows_are_audited(self, spark):
        old = spark.createDataFrame([(1, 5.0)], "k int, v double")
        new = spark.createDataFrame([(1, 5.0), (None, 999.0)], "k int, v double")
        issues, stats = delta_check(old, new, "k", [RangeValidator("v", 0, 100)])
        assert stats["row_count"] == 1
        assert any(not i.success for i in issues)


class TestFingerprintStore:
    @pytest.fixture()
    def store(self, spark, snapshots, tmp_path):
        from truthound_spark.delta import write_fingerprints

        old, _ = snapshots
        path = str(tmp_path / "fp_store")
        return write_fingerprints(old, path, "k")

    def test_stored_path_matches_direct_delta(self, spark, snapshots, store):
        old, new = snapshots
        direct = {r["k"] for r in changed_rows(old, new, "k").select("k").collect()}
        stored = {
            r["k"]
            for r in changed_rows(None, new, "k", old_fingerprints=store)
            .select("k")
            .collect()
        }
        assert stored == direct

    def test_stored_path_never_scans_old(self, spark, snapshots, store):
        _, new = snapshots
        # the whole point: `old` is not needed at all
        delta = changed_rows(None, new, "k", old_fingerprints=store)
        assert delta.count() > 0

    def test_meta_is_enforced(self, spark, snapshots, store):
        _, new = snapshots
        with pytest.raises(ValueError, match="keyed by"):
            changed_rows(None, new, "s", old_fingerprints=store)
        with pytest.raises(ValueError, match="covers columns"):
            changed_rows(None, new, "k", compare_cols=["v"], old_fingerprints=store)
        # identical explicit list is fine
        assert (
            changed_rows(
                None, new, "k", compare_cols=["v", "s"], old_fingerprints=store
            ).count()
            > 0
        )

    def test_missing_column_in_new_raises(self, spark, snapshots, store):
        _, new = snapshots
        with pytest.raises(ValueError, match="lacks fingerprinted"):
            changed_rows(None, new.drop("s"), "k", old_fingerprints=store)

    def test_delta_check_through_store(self, spark, snapshots, store):
        old, new = snapshots
        direct = delta_check(old, new, "k", [RangeValidator("v", 0, 200)])
        stored = delta_check(
            None, new, "k", [RangeValidator("v", 0, 200)], old_fingerprints=store
        )
        assert stored[1]["row_count"] == direct[1]["row_count"]
        assert sum(i.count for i in stored[0]) == sum(i.count for i in direct[0])

    def test_requires_old_or_store(self, snapshots):
        _, new = snapshots
        with pytest.raises(ValueError, match="old or old_fingerprints"):
            changed_rows(None, new, "k")


class TestBucketedFingerprintStore:
    @pytest.fixture()
    def table_store(self, spark, snapshots, tmp_path):
        from truthound_spark.delta import write_fingerprints_table

        old, _ = snapshots
        return write_fingerprints_table(
            old, "t_fp_snap", "k", buckets=4, location=str(tmp_path / "fpdb")
        )

    def test_table_store_matches_direct_delta(self, spark, snapshots, table_store):
        old, new = snapshots
        direct = {r["k"] for r in changed_rows(old, new, "k").select("k").collect()}
        stored = {
            r["k"]
            for r in changed_rows(None, new, "k", old_fingerprints=table_store)
            .select("k")
            .collect()
        }
        assert stored == direct

    def test_meta_enforced_for_tables(self, spark, snapshots, table_store):
        _, new = snapshots
        with pytest.raises(ValueError, match="keyed by"):
            changed_rows(None, new, "s", old_fingerprints=table_store)

    def test_store_side_joins_without_exchange(self, spark, snapshots, table_store):
        # the point of the bucketed store: the anti-join's store side
        # reads its bucketed distribution — no shuffle Exchange above the
        # store scan. At test scale Catalyst would just broadcast the
        # tiny store (also fine, also Exchange-free in the shuffle
        # sense), so disable broadcast to force the large-large shape the
        # layout exists for.
        _, new = snapshots
        old_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            d = changed_rows(None, new, "k", old_fingerprints=table_store)
            plan = d._jdf.queryExecution().executedPlan().toString()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thr)
        scan_lines = [
            ln for ln in plan.splitlines() if "t_fp_snap" in ln and "Scan" in ln
        ]
        assert scan_lines and any("Bucketed: true" in ln for ln in scan_lines), plan

    def test_table_store_needs_fewer_exchanges_than_path_store(
        self, spark, snapshots, table_store, tmp_path
    ):
        from truthound_spark.delta import write_fingerprints
        from truthound_spark.layout import plan_exchanges

        old, new = snapshots
        path_store = write_fingerprints(old, str(tmp_path / "fp_plain"), "k")
        thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            via_table = changed_rows(None, new, "k", old_fingerprints=table_store)
            via_path = changed_rows(None, new, "k", old_fingerprints=path_store)
            # the bucketed store removes exactly the store-side shuffle
            assert plan_exchanges(via_table) < plan_exchanges(via_path)
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)

    def test_keys_fp_variant_matches_keys_default(
        self, spark, snapshots, table_store, tmp_path
    ):
        # both bucketing contracts must produce identical deltas; "keys"
        # is the r13 default (table_store), "keys_fp" the r12 layout
        from truthound_spark.delta import write_fingerprints_table

        old, new = snapshots
        legacy = write_fingerprints_table(
            old, "t_fp_snap_kfp", "k", buckets=4,
            location=str(tmp_path / "fpdb_kfp"), bucket_by="keys_fp",
        )
        a = {r["k"] for r in changed_rows(None, new, "k", old_fingerprints=table_store).select("k").collect()}
        b = {r["k"] for r in changed_rows(None, new, "k", old_fingerprints=legacy).select("k").collect()}
        direct = {r["k"] for r in changed_rows(old, new, "k").select("k").collect()}
        assert a == b == direct

    def test_keys_store_with_null_keys(self, spark, tmp_path):
        # NULL-key battery through the keys-bucketed store: the non-equi
        # fp comparison lives only in the non-NULL branch; NULL keys ride
        # the separate eqNullSafe join exactly as before
        from truthound_spark.delta import write_fingerprints_table

        old = spark.createDataFrame(
            [(1, "a"), (None, "b"), (None, "c")], "k long, s string"
        )
        new = spark.createDataFrame(
            [(1, "a2"), (None, "b"), (None, "d"), (2, "e")], "k long, s string"
        )
        store = write_fingerprints_table(
            old, "t_fp_nullkeys", "k", buckets=2,
            location=str(tmp_path / "fpdb_nk"),
        )
        got = {
            (r["k"], r["s"])
            for r in changed_rows(None, new, "k", old_fingerprints=store).collect()
        }
        want = {
            (r["k"], r["s"]) for r in changed_rows(old, new, "k").collect()
        }
        # key-granular semantics: the changed NULL key conservatively
        # pulls its sibling NULL-key row too (same rule as any
        # non-unique key — pinned by test_null_key_inserts_survive...)
        assert got == want == {(1, "a2"), (None, "b"), (None, "d"), (2, "e")}

    def test_keys_store_plus_key_bucketed_new_joins_colocated(
        self, spark, snapshots, table_store, tmp_path
    ):
        # the r13 point: a NEW snapshot that is itself a key-bucketed
        # table (the ingest layout contract, same bucket count) must
        # anti-join the keys-bucketed store with BOTH scans serving the
        # join's hash(k) distribution — strictly fewer Exchanges than the
        # r12 (keys, fp) store, whose superset equi-keys no natural
        # snapshot layout can serve
        from truthound_spark.delta import write_fingerprints_table
        from truthound_spark.layout import plan_exchanges, write_bucketed

        old, new = snapshots
        new_tbl = spark.table(
            write_bucketed(
                new, "t_new_snap_b", "k", buckets=4,
                location=str(tmp_path / "newdb"),
            )
        )
        legacy = write_fingerprints_table(
            old, "t_fp_snap_kfp2", "k", buckets=4,
            location=str(tmp_path / "fpdb_kfp2"), bucket_by="keys_fp",
        )
        thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            via_keys = changed_rows(None, new_tbl, "k", old_fingerprints=table_store)
            via_kfp = changed_rows(None, new_tbl, "k", old_fingerprints=legacy)
            assert plan_exchanges(via_keys) < plan_exchanges(via_kfp)
            # and the anti-join region itself is Exchange-free: both its
            # scans are bucketed
            plan = via_keys._jdf.queryExecution().executedPlan().toString()
            assert plan.count("Bucketed: true") >= 2, plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)

    def test_bad_bucket_by_rejected(self, spark, snapshots, tmp_path):
        from truthound_spark.delta import write_fingerprints_table

        old, _ = snapshots
        with pytest.raises(ValueError, match="bucket_by"):
            write_fingerprints_table(
                old, "t_fp_bad", "k", location=str(tmp_path / "bad"),
                bucket_by="fp",
            )

    def test_non_store_table_rejected(self, spark, snapshots, tmp_path):
        from truthound_spark.layout import write_bucketed

        old, new = snapshots
        t = write_bucketed(
            old, "t_not_a_store", "k", buckets=4, location=str(tmp_path / "nsdb")
        )
        with pytest.raises(ValueError, match="truthound.fp.meta"):
            changed_rows(None, new, "k", old_fingerprints=t)
