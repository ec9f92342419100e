"""Storage-layout tests: bucketed co-located joins (zero-Exchange pins)
and partition-pruned incremental checks (PartitionFilters pins)."""

import os

import pytest
from pyspark.sql import functions as F

from truthound_spark.layout import (
    colocated_join,
    fk_orphans_bucketed,
    incremental_check,
    plan_exchanges,
    read_pruned,
    scan_partition_filters,
    write_bucketed,
    write_partitioned,
    write_range_clustered,
)
from truthound_spark.validators.completeness import NullValidator
from truthound_spark.validators.distribution import RangeValidator


@pytest.fixture(scope="module")
def orders(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/orders.parquet")


@pytest.fixture(scope="module")
def lineitem(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/lineitem.parquet")


@pytest.fixture(scope="module")
def bucketed_pair(spark, orders, lineitem, tmp_path_factory):
    loc = str(tmp_path_factory.mktemp("layout_db"))
    # Drop every 7th parent so the FK check has real orphans to find.
    parent = orders.filter(F.col("o_orderkey") % 7 != 0)
    child_t = write_bucketed(
        lineitem, "t_lineitem", "l_orderkey", buckets=8, location=loc
    )
    parent_t = write_bucketed(
        parent.withColumnRenamed("o_orderkey", "l_orderkey"),
        "t_orders",
        "l_orderkey",
        buckets=8,
        location=loc,
    )
    return child_t, parent_t


class TestBucketed:
    def test_colocated_join_has_no_exchange(self, spark, bucketed_pair):
        child_t, parent_t = bucketed_pair
        joined = colocated_join(spark, child_t, parent_t, "l_orderkey")
        assert plan_exchanges(joined) == 0

    def test_unbucketed_same_join_does_shuffle(self, spark, orders, lineitem):
        joined = lineitem.hint("merge").join(
            orders.withColumnRenamed("o_orderkey", "l_orderkey").select(
                "l_orderkey"
            ),
            on="l_orderkey",
        )
        assert plan_exchanges(joined) >= 1

    def test_fk_orphans_bucketed_no_exchange_and_correct(
        self, spark, bucketed_pair, lineitem
    ):
        child_t, parent_t = bucketed_pair
        orphans = fk_orphans_bucketed(
            spark, child_t, parent_t, "l_orderkey"
        )
        assert plan_exchanges(orphans) == 0
        expected = lineitem.filter(F.col("l_orderkey") % 7 == 0).count()
        assert orphans.count() == expected
        assert expected > 0  # the fixture really planted orphans

    def test_colocated_join_matches_plain_join(
        self, spark, bucketed_pair, orders, lineitem
    ):
        child_t, parent_t = bucketed_pair
        got = (
            colocated_join(spark, child_t, parent_t, "l_orderkey")
            .groupBy()
            .agg(
                F.count("*").alias("n"),
                F.sum("l_quantity").alias("q"),
            )
            .collect()[0]
        )
        want = (
            lineitem.join(
                orders.filter(F.col("o_orderkey") % 7 != 0),
                lineitem.l_orderkey == F.col("o_orderkey"),
            )
            .groupBy()
            .agg(
                F.count("*").alias("n"),
                F.sum("l_quantity").alias("q"),
            )
            .collect()[0]
        )
        assert got["n"] == want["n"]
        assert got["q"] == want["q"]

    def test_bucketed_groupby_has_no_exchange(self, spark, bucketed_pair, lineitem):
        # the other bucketing win: aggregation on the bucket key is
        # map-side only — no shuffle between scan and final agg
        child_t, _ = bucketed_pair
        agg = (
            spark.table(child_t)
            .groupBy("l_orderkey")
            .agg(F.sum("l_quantity").alias("q"))
        )
        assert plan_exchanges(agg) == 0
        plain = lineitem.groupBy("l_orderkey").agg(
            F.sum("l_quantity").alias("q")
        )
        assert plan_exchanges(plain) >= 1
        assert agg.count() == plain.count()

    def test_write_bucketed_clears_stale_location(self, spark, lineitem, tmp_path):
        # a fresh session's catalog forgets tables but managed dirs
        # persist; overwrite must not die with LOCATION_ALREADY_EXISTS
        loc = str(tmp_path)
        stale = os.path.join(loc, "t_stale")
        os.makedirs(stale, exist_ok=True)
        with open(os.path.join(stale, "junk.parquet"), "w") as fh:
            fh.write("not parquet")
        t = write_bucketed(
            lineitem.limit(10),
            "t_stale",
            "l_orderkey",
            buckets=2,
            database="truthound_layout_stale",
            location=loc,
        )
        assert spark.table(t).count() == 10

    def test_write_bucketed_validates_args(self, lineitem):
        with pytest.raises(ValueError):
            write_bucketed(lineitem, "t", [], buckets=8)
        with pytest.raises(ValueError):
            write_bucketed(lineitem, "t", "l_orderkey", buckets=0)


class TestAttachLayout:
    """Re-attachable layouts (r13): the on-disk sidecar restores the
    bucket spec + TBLPROPERTIES a session-bound catalog would lose."""

    @pytest.fixture(scope="class")
    def written(self, spark, orders, tmp_path_factory):
        loc = str(tmp_path_factory.mktemp("attach_db"))
        fq = write_bucketed(
            orders, "t_attach_src", "o_orderkey", buckets=8, location=loc,
            properties={"truthound.test.meta": '{"answer": 42}'},
        )
        from truthound_spark.layout import _table_location

        return fq, _table_location(spark, fq)

    def test_sidecar_written(self, spark, written):
        _, tbl_loc = written
        assert tbl_loc is not None
        path = tbl_loc[len("file:"):] if tbl_loc.startswith("file:") else tbl_loc
        assert os.path.exists(os.path.join(path, "_truthound_layout_spec.json"))

    def test_attach_under_new_name_restores_everything(self, spark, written):
        from truthound_spark.layout import attach_layout

        src_fq, tbl_loc = written
        fq = attach_layout(spark, tbl_loc, table="t_attach_again")
        # rows identical
        assert spark.table(fq).count() == spark.table(src_fq).count()
        # bucketing restored: scan reads the bucketed distribution
        df = spark.table(fq).hint("merge").groupBy("o_orderkey").count()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan
        # properties restored from the sidecar
        rows = spark.sql(
            f"SHOW TBLPROPERTIES {fq} ('truthound.test.meta')"
        ).collect()
        assert '"answer": 42' in rows[0]["value"]

    def test_attached_table_joins_colocated(self, spark, written, bucketed_pair):
        from truthound_spark.layout import attach_layout

        child_t, _ = bucketed_pair
        _, tbl_loc = written
        fq = attach_layout(spark, tbl_loc, table="t_attach_join")
        child = spark.table(child_t).hint("merge")
        attached = spark.table(fq)
        joined = child.join(
            attached, child["l_orderkey"] == attached["o_orderkey"]
        )
        # both scans serve hash(key): the only acceptable Exchange count
        # is zero for a same-bucket-count join
        assert plan_exchanges(joined) == 0

    def test_overwrite_replaces_attached_external_table(
        self, spark, orders, tmp_path_factory
    ):
        # the stale-attach path (hit by the r13 bench): attach registers
        # an EXTERNAL table, the content turns out stale, and the fresh
        # write_bucketed(mode=overwrite) must replace it — saveAsTable
        # alone would die with LOCATION_ALREADY_EXISTS over the occupied
        # external location
        from truthound_spark.layout import _table_location, attach_layout

        loc = str(tmp_path_factory.mktemp("ext_ow"))
        src = write_bucketed(
            orders.limit(100), "t_ext_src", "o_orderkey", buckets=2,
            location=loc, database="truthound_extow",
        )
        tbl_loc = _table_location(spark, src)
        att = attach_layout(
            spark, tbl_loc, table="t_ext_again", database="truthound_extow"
        )
        # now overwrite the ATTACHED name with fresh (different) content
        fq = write_bucketed(
            orders.limit(250), "t_ext_again", "o_orderkey", buckets=2,
            location=loc, database="truthound_extow",
        )
        assert fq == att
        assert spark.table(fq).count() == 250

    def test_attach_layout_database_recovers_warehouse(
        self, spark, orders, tmp_path_factory
    ):
        from truthound_spark.layout import attach_layout_database

        loc = str(tmp_path_factory.mktemp("attach_wh"))
        write_bucketed(
            orders, "t_wh_a", "o_orderkey", buckets=4, location=loc,
            database="truthound_attach_wh",
        )
        write_bucketed(
            orders.select("o_orderkey", "o_totalprice"), "t_wh_b",
            "o_orderkey", buckets=4, location=loc,
            database="truthound_attach_wh",
        )
        got = attach_layout_database(
            spark, loc, database="truthound_attach_wh2"
        )
        assert sorted(t.split(".")[-1] for t in got) == ["t_wh_a", "t_wh_b"]
        for t in got:
            assert spark.table(t).count() == orders.count()

    def test_rewrite_after_attach_lands_at_attach_root(
        self, spark, orders, tmp_path_factory
    ):
        """r14: attach_layout_database must pin the database's home to
        the attach root, so a post-attach overwrite (the stale-version
        re-index path) writes its files and sidecar back where the NEXT
        session will attach from — not at the database's default
        location, which left the stale sidecars in place and made every
        future session re-pay the rewrite."""
        import json

        from truthound_spark.layout import attach_layout_database, write_bucketed

        loc = str(tmp_path_factory.mktemp("reattach_root"))
        write_bucketed(
            orders.limit(50), "t_rewrite_cycle", "o_orderkey", buckets=2,
            location=loc, database="truthound_rw1",
            properties={"truthound.test.gen": "1"},
        )
        # session 2: attach, decide the content is stale, rewrite into
        # the SAME database+location with new content/properties
        got = attach_layout_database(spark, loc, database="truthound_rw2")
        assert [t.split(".")[-1] for t in got] == ["t_rewrite_cycle"]
        write_bucketed(
            orders.limit(125), "t_rewrite_cycle", "o_orderkey", buckets=2,
            location=loc, database="truthound_rw2",
            properties={"truthound.test.gen": "2"},
        )
        # session 3: a fresh attach from the SAME root must see gen 2
        got3 = attach_layout_database(spark, loc, database="truthound_rw3")
        assert [t.split(".")[-1] for t in got3] == ["t_rewrite_cycle"]
        fq3 = got3[0]
        assert spark.table(fq3).count() == 125
        rows = spark.sql(
            f"SHOW TBLPROPERTIES {fq3} ('truthound.test.gen')"
        ).collect()
        assert rows and rows[0]["value"] == "2"
        # on-disk sidecar at the attach root carries gen 2 as well
        spec = json.loads(
            open(f"{loc}/t_rewrite_cycle/_truthound_layout_spec.json").read()
        )
        assert spec["properties"]["truthound.test.gen"] == "2"

    def test_attach_same_location_is_idempotent(self, spark, written):
        from truthound_spark.layout import attach_layout

        _, tbl_loc = written
        a = attach_layout(spark, tbl_loc, table="t_attach_idem")
        b = attach_layout(spark, tbl_loc, table="t_attach_idem")
        assert a == b

    def test_attach_name_collision_raises(self, spark, orders, tmp_path_factory):
        """ADVICE r13: the same name attached from TWO different
        directories must raise, not silently serve the first directory's
        data under the second attach."""
        from truthound_spark.layout import attach_layout, write_bucketed

        loc_a = str(tmp_path_factory.mktemp("collide_a"))
        loc_b = str(tmp_path_factory.mktemp("collide_b"))
        fq_a = write_bucketed(
            orders.limit(50), "t_collide_src_a", "o_orderkey", buckets=2,
            location=loc_a, database="truthound_collide",
        )
        write_bucketed(
            orders.limit(120), "t_collide_src_b", "o_orderkey", buckets=2,
            location=loc_b, database="truthound_collide",
        )
        from truthound_spark.layout import _table_location

        attach_layout(
            spark, _table_location(spark, fq_a), table="t_collided",
            database="truthound_collide",
        )
        with pytest.raises(ValueError, match="already exists at"):
            attach_layout(
                spark,
                _table_location(spark, "truthound_collide.t_collide_src_b"),
                table="t_collided",
                database="truthound_collide",
            )

    def test_attach_bucket_spec_mismatch_raises(
        self, spark, orders, tmp_path_factory
    ):
        """A catalog entry at the RIGHT location whose bucket spec
        disagrees with the sidecar (stale entry predating a re-layout)
        must raise, not silently serve the wrong distribution."""
        from truthound_spark.layout import (
            _table_location,
            attach_layout,
            write_bucketed,
        )

        loc = str(tmp_path_factory.mktemp("spec_mismatch"))
        fq = write_bucketed(
            orders.limit(30), "t_spec_src", "o_orderkey", buckets=4,
            location=loc, database="truthound_specmm",
        )
        tbl_loc = _table_location(spark, fq)
        # register a table under the attach name at the SAME location but
        # with a DIFFERENT bucket count (the stale-catalog shape)
        loc_sql = tbl_loc.replace("'", "''")
        spark.sql(
            "CREATE TABLE truthound_specmm.t_spec_stale "
            "(o_orderkey BIGINT) USING parquet "
            "CLUSTERED BY (o_orderkey) INTO 2 BUCKETS "
            f"LOCATION '{loc_sql}'"
        )
        with pytest.raises(ValueError, match="bucket spec"):
            attach_layout(
                spark, tbl_loc, table="t_spec_stale",
                database="truthound_specmm",
            )

    def test_backslash_property_round_trips(self, spark, orders, tmp_path_factory):
        """ADVICE r13: a backslash in a TBLPROPERTY value (JSON-escaped
        char, windows path) must survive the SQL literal and come back
        byte-identical from SHOW TBLPROPERTIES — and survive re-attach."""
        from truthound_spark.layout import _table_location, attach_layout

        raw = 'c:\\data\\corpus and {"esc": "a\\tb"} and a lone \\'
        loc = str(tmp_path_factory.mktemp("bslash"))
        fq = write_bucketed(
            orders.limit(10), "t_bslash", "o_orderkey", buckets=2,
            location=loc, database="truthound_bslash",
            properties={"truthound.test.path": raw},
        )
        got = spark.sql(
            f"SHOW TBLPROPERTIES {fq} ('truthound.test.path')"
        ).collect()[0]["value"]
        assert got == raw
        att = attach_layout(
            spark, _table_location(spark, fq), table="t_bslash_again",
            database="truthound_bslash",
        )
        got2 = spark.sql(
            f"SHOW TBLPROPERTIES {att} ('truthound.test.path')"
        ).collect()[0]["value"]
        assert got2 == raw

    def test_fp_store_meta_survives_attach(self, spark, orders, tmp_path_factory):
        # the point of the sidecar: a fingerprint store re-attached in a
        # "new session" still enforces its column/bucketing contract
        from truthound_spark.delta import changed_rows, write_fingerprints_table
        from truthound_spark.layout import _table_location, attach_layout

        loc = str(tmp_path_factory.mktemp("attach_fp"))
        p = orders.select("o_orderkey", "o_totalprice")
        store = write_fingerprints_table(
            p, "t_fp_attach", "o_orderkey", buckets=4, location=loc
        )
        tbl_loc = _table_location(spark, store)
        again = attach_layout(spark, tbl_loc, table="t_fp_attached")
        new = p.withColumn(
            "o_totalprice",
            F.when(F.col("o_orderkey") % 50 == 0, -F.col("o_totalprice"))
            .otherwise(F.col("o_totalprice")),
        )
        via_src = changed_rows(None, new, "o_orderkey", old_fingerprints=store)
        via_att = changed_rows(None, new, "o_orderkey", old_fingerprints=again)
        assert via_att.count() == via_src.count() > 0
        # and the meta contract still raises on a wrong key
        with pytest.raises(ValueError, match="keyed by"):
            changed_rows(None, new, "o_totalprice", old_fingerprints=again)


class TestPartitioned:
    @pytest.fixture(scope="class")
    def events_path(self, spark, sf_dir, tmp_path_factory):
        events = spark.read.parquet(f"{sf_dir}/events.parquet")
        path = str(tmp_path_factory.mktemp("layout_part") / "events")
        write_partitioned(events, path, "event_type")
        return path

    def test_pruned_read_carries_partition_filters(self, spark, events_path):
        df = read_pruned(spark, events_path, {"event_type": "click"})
        filters = scan_partition_filters(df)
        assert "event_type" in filters
        # the predicate reached file listing, not a post-scan Filter
        assert "click" in filters

    def test_pruned_read_matches_plain_filter(self, spark, sf_dir, events_path):
        events = spark.read.parquet(f"{sf_dir}/events.parquet")
        got = read_pruned(spark, events_path, {"event_type": "click"}).count()
        want = events.filter(F.col("event_type") == "click").count()
        assert got == want > 0

    def test_pruned_read_lists_only_matching_partition(self, spark, events_path):
        # directory layout really is one dir per value
        dirs = [d for d in os.listdir(events_path) if d.startswith("event_type=")]
        assert len(dirs) >= 2
        df = read_pruned(spark, events_path, {"event_type": "click"})
        assert "event_type=click" not in scan_partition_filters(df)  # sanity: filters hold exprs, not paths
        assert df.select("event_type").distinct().collect()[0][0] == "click"

    def test_incremental_check_runs_on_partition_only(self, spark, events_path):
        issues, stats = incremental_check(
            spark,
            events_path,
            [NullValidator(columns=["value"]), RangeValidator("value", -1e9, 1e9)],
            {"event_type": "click"},
        )
        # fused executor ran; row_count matches the single partition
        got = read_pruned(spark, events_path, {"event_type": "click"}).count()
        assert stats["row_count"] == got


class TestRangeClustered:
    @pytest.fixture(scope="class")
    def clustered_path(self, spark, sf_dir, tmp_path_factory):
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        path = str(tmp_path_factory.mktemp("layout_rc") / "lineitem")
        write_range_clustered(li, path, "l_orderkey", num_partitions=4)
        return path

    def test_rows_preserved_and_filter_matches(self, spark, sf_dir, clustered_path):
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        rc = spark.read.parquet(clustered_path)
        assert rc.count() == li.count()
        lo, hi = 100, 500
        pred = (F.col("l_orderkey") >= lo) & (F.col("l_orderkey") <= hi)
        assert rc.filter(pred).count() == li.filter(pred).count()

    def test_filter_is_pushed_to_scan(self, spark, clustered_path):
        rc = spark.read.parquet(clustered_path).filter(
            (F.col("l_orderkey") >= 100) & (F.col("l_orderkey") <= 500)
        )
        plan = rc._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters: [" in plan
        assert "l_orderkey" in plan.split("PushedFilters: [", 1)[1][:120]

    def test_file_ranges_are_disjoint(self, spark, clustered_path):
        # every output file covers a disjoint l_orderkey range, so a
        # selective pushed filter can skip whole files via statistics
        rc = spark.read.parquet(clustered_path)
        ranges = (
            rc.groupBy(F.input_file_name().alias("f"))
            .agg(F.min("l_orderkey").alias("lo"), F.max("l_orderkey").alias("hi"))
            .orderBy("lo")
            .collect()
        )
        assert len(ranges) >= 2
        for prev, cur in zip(ranges, ranges[1:]):
            assert prev["hi"] <= cur["lo"]

    def test_validates_args(self, spark, sf_dir):
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        with pytest.raises(ValueError):
            write_range_clustered(li, "/tmp/x", [])


class TestWriteAuditPublish:
    def _vals(self):
        return [
            NullValidator(columns=["s"]),
            RangeValidator("v", 0, 100),
        ]

    def test_clean_publish(self, spark, tmp_path):
        from truthound_spark.layout import write_audit_publish

        df = spark.range(500).select(
            F.col("id"), F.lit("ok").alias("s"), (F.col("id") % 50).cast("double").alias("v")
        )
        final = str(tmp_path / "t_clean")
        published, issues, where = write_audit_publish(df, final, self._vals())
        assert published and issues == [] and where == final
        assert spark.read.parquet(final).count() == 500
        # no staging residue
        assert [d for d in os.listdir(tmp_path) if "__staging__" in d] == []

    def test_dirty_abort_leaves_no_published_table(self, spark, tmp_path):
        from truthound_spark.layout import write_audit_publish

        df = spark.range(500).select(
            F.col("id"),
            F.when(F.col("id") % 10 == 0, None).otherwise(F.lit("ok")).alias("s"),
            (F.col("id") % 50).cast("double").alias("v"),
        )
        final = str(tmp_path / "t_dirty")
        published, issues, where = write_audit_publish(df, final, self._vals())
        assert not published and where == ""
        assert issues and issues[0].count == 50
        assert not os.path.exists(final)
        assert [d for d in os.listdir(tmp_path) if "__staging__" in d] == []

    def test_keep_failed_staging_for_debugging(self, spark, tmp_path):
        from truthound_spark.layout import write_audit_publish

        df = spark.range(100).select(
            F.col("id"), F.lit(None).cast("string").alias("s"),
            F.lit(1.0).alias("v"),
        )
        final = str(tmp_path / "t_keep")
        published, issues, where = write_audit_publish(
            df, final, self._vals(), keep_failed_staging=True
        )
        assert not published and "__staging__" in where
        assert spark.read.parquet(where).count() == 100

    def test_overwrite_replaces_atomically(self, spark, tmp_path):
        from truthound_spark.layout import write_audit_publish

        final = str(tmp_path / "t_over")
        v1 = spark.range(10).select(
            F.col("id"), F.lit("a").alias("s"), F.lit(1.0).alias("v")
        )
        v2 = spark.range(20).select(
            F.col("id"), F.lit("b").alias("s"), F.lit(2.0).alias("v")
        )
        assert write_audit_publish(v1, final, self._vals())[0]
        with pytest.raises(FileExistsError):
            write_audit_publish(v2, final, self._vals())
        assert spark.read.parquet(final).count() == 10  # untouched
        assert write_audit_publish(v2, final, self._vals(), overwrite=True)[0]
        assert spark.read.parquet(final).count() == 20
        # a FAILED overwrite keeps the old version published
        dirty = v2.withColumn("v", F.lit(999.0))
        published, _, _ = write_audit_publish(
            dirty, final, self._vals(), overwrite=True
        )
        assert not published
        assert spark.read.parquet(final).count() == 20

    def test_object_store_scheme_refused(self, spark):
        from truthound_spark.layout import write_audit_publish

        df = spark.range(1)
        with pytest.raises(NotImplementedError):
            write_audit_publish(df, "s3a://bucket/table", [])

    def test_partitioned_publish(self, spark, tmp_path):
        from truthound_spark.layout import write_audit_publish

        df = spark.range(100).select(
            F.col("id"), F.lit("ok").alias("s"),
            (F.col("id") % 50).cast("double").alias("v"),
            (F.col("id") % 3).cast("string").alias("part"),
        )
        final = str(tmp_path / "t_part")
        published, _, _ = write_audit_publish(
            df, final, self._vals(), partition_cols="part"
        )
        assert published
        assert len([d for d in os.listdir(final) if d.startswith("part=")]) == 3


class TestIdentifierAndPathSafety:
    def test_quote_in_location_is_escaped(self, spark, tmp_path):
        from truthound_spark.layout import ensure_layout_database

        loc = str(tmp_path / "o'brien db")
        db = ensure_layout_database(spark, "t_quote_db", location=loc)
        desc = " ".join(str(r) for r in spark.sql("DESCRIBE DATABASE t_quote_db").collect())
        assert "brien" in desc
        spark.sql(f"DROP DATABASE {db}")

    def test_bad_table_name_rejected(self, spark):
        from truthound_spark.layout import write_bucketed

        with pytest.raises(ValueError):
            write_bucketed(spark.range(1), "bad-name; DROP TABLE x", "id")

    def test_nonlocal_default_fs_refused_for_schemeless_path(self, spark, tmp_path):
        # scheme-less path would stage to defaultFS but publish with a
        # driver-local os.rename — different filesystems, refuse up front
        from truthound_spark.layout import write_audit_publish

        hconf = spark._jsc.hadoopConfiguration()
        old = hconf.get("fs.defaultFS", "file:///")
        hconf.set("fs.defaultFS", "hdfs://nameservice1/")
        try:
            with pytest.raises(NotImplementedError):
                write_audit_publish(spark.range(1), str(tmp_path / "t_hdfs"), [])
        finally:
            hconf.set("fs.defaultFS", old)

    def test_failed_publish_rename_restores_old_version(
        self, spark, tmp_path, monkeypatch
    ):
        # crash window between the two overwrite renames: the old version
        # must be restored, never left stranded under __replaced__
        from truthound_spark import layout

        final = str(tmp_path / "t_restore")
        v1 = spark.range(10).select(
            F.col("id"), F.lit("a").alias("s"), F.lit(1.0).alias("v")
        )
        v2 = spark.range(20).select(
            F.col("id"), F.lit("b").alias("s"), F.lit(2.0).alias("v")
        )
        vals = [NullValidator(columns=["s"]), RangeValidator("v", 0, 100)]
        assert layout.write_audit_publish(v1, final, vals)[0]

        real_rename = os.rename

        def failing(src, dst):
            if dst == final and "__staging__" in src:
                raise OSError("injected: publish rename failed")
            return real_rename(src, dst)

        monkeypatch.setattr(os, "rename", failing)
        with pytest.raises(OSError, match="injected"):
            layout.write_audit_publish(v2, final, vals, overwrite=True)
        monkeypatch.undo()
        assert spark.read.parquet(final).count() == 10  # old version restored
        assert [d for d in os.listdir(tmp_path) if "__replaced__" in d] == []


class TestWapPartition:
    def _vals(self):
        return [
            NullValidator(columns=["s"]),
            RangeValidator("v", 0, 100),
        ]

    def _day(self, spark, day, n=100, v=1.0, s="ok"):
        return spark.range(n).select(
            F.col("id"),
            F.lit(s).alias("s"),
            F.lit(v).alias("v"),
            F.lit(day).alias("day"),
        )

    def test_partition_publish_and_isolation(self, spark, tmp_path):
        from truthound_spark.layout import write_audit_publish_partition

        final = str(tmp_path / "t_days")
        ok1, _, where1 = write_audit_publish_partition(
            self._day(spark, "d1"), final, self._vals(), {"day": "d1"}
        )
        ok2, _, where2 = write_audit_publish_partition(
            self._day(spark, "d2", n=50), final, self._vals(), {"day": "d2"}
        )
        assert ok1 and ok2
        assert where1.endswith("day=d1") and where2.endswith("day=d2")
        table = spark.read.parquet(final)
        assert table.count() == 150
        assert table.filter(F.col("day") == "d1").count() == 100
        # a DIRTY publish of d3 must leave d1/d2 serving and put NOTHING
        # under the table root (staging is a sibling directory)
        dirty = self._day(spark, "d3", v=999.0)
        ok3, issues, _ = write_audit_publish_partition(
            dirty, final, self._vals(), {"day": "d3"}
        )
        assert not ok3 and issues
        assert sorted(d for d in os.listdir(final) if d.startswith("day=")) == [
            "day=d1",
            "day=d2",
        ]
        assert all("__staging__" not in d for d in os.listdir(final))
        assert spark.read.parquet(final).count() == 150

    def test_partition_overwrite_replaces_only_that_partition(self, spark, tmp_path):
        from truthound_spark.layout import write_audit_publish_partition

        final = str(tmp_path / "t_days_ow")
        write_audit_publish_partition(
            self._day(spark, "d1"), final, self._vals(), {"day": "d1"}
        )
        write_audit_publish_partition(
            self._day(spark, "d2", n=40), final, self._vals(), {"day": "d2"}
        )
        with pytest.raises(FileExistsError):
            write_audit_publish_partition(
                self._day(spark, "d1", n=7), final, self._vals(), {"day": "d1"}
            )
        ok, _, _ = write_audit_publish_partition(
            self._day(spark, "d1", n=7, s="v2"),
            final,
            self._vals(),
            {"day": "d1"},
            overwrite=True,
        )
        assert ok
        table = spark.read.parquet(final)
        assert table.filter(F.col("day") == "d1").count() == 7
        assert table.filter(F.col("day") == "d2").count() == 40

    def test_mixed_partition_data_refused(self, spark, tmp_path):
        from truthound_spark.layout import write_audit_publish_partition

        final = str(tmp_path / "t_mixed")
        mixed = self._day(spark, "d1").unionByName(self._day(spark, "d2"))
        with pytest.raises(ValueError, match="not exactly partition"):
            write_audit_publish_partition(
                mixed, final, self._vals(), {"day": "d1"}
            )
        # nothing published, no staging residue anywhere
        assert not os.path.exists(final)
        assert [d for d in os.listdir(tmp_path) if "__staging__" in d] == []

    def test_missing_partition_column_refused(self, spark, tmp_path):
        from truthound_spark.layout import write_audit_publish_partition

        df = spark.range(5).select(F.col("id"), F.lit("ok").alias("s"), F.lit(1.0).alias("v"))
        with pytest.raises(ValueError, match="lacks partition column"):
            write_audit_publish_partition(
                df, str(tmp_path / "t"), self._vals(), {"day": "d1"}
            )

    def test_multi_level_partition(self, spark, tmp_path):
        from truthound_spark.layout import write_audit_publish_partition

        final = str(tmp_path / "t_multi")
        df = self._day(spark, "d1").withColumn("region", F.lit("eu"))
        ok, _, where = write_audit_publish_partition(
            df, final, self._vals(), {"day": "d1", "region": "eu"}
        )
        assert ok and where.endswith(os.path.join("day=d1", "region=eu"))
        got = spark.read.parquet(final)
        assert got.count() == 100
        assert {r["region"] for r in got.select("region").distinct().collect()} == {"eu"}


class TestAutoColocatedFK:
    def test_orphans_auto_routes_on_bucketed_tables(self, spark, bucketed_pair):
        from truthound_spark.layout import plan_exchanges
        from truthound_spark.validators.referential import orphans

        child_t, parent_t = bucketed_pair
        child = spark.table(child_t)
        parent = spark.table(parent_t)
        auto = orphans(child, parent, [("l_orderkey", "l_orderkey")])
        assert plan_exchanges(auto) == 0  # co-located path selected
        # opting out restores the broadcast/shuffle form
        manual = orphans(
            child, parent, [("l_orderkey", "l_orderkey")], auto_colocated=False
        )
        assert plan_exchanges(manual) > 0
        assert auto.count() == manual.count() > 0

    def test_fk_validator_end_to_end_on_bucketed_tables(self, spark, bucketed_pair):
        from truthound_spark.validators.referential import ForeignKeyValidator

        child_t, parent_t = bucketed_pair
        child = spark.table(child_t)
        parent = spark.table(parent_t)
        issues = ForeignKeyValidator(parent, "l_orderkey").validate(child)
        baseline = ForeignKeyValidator(
            parent, "l_orderkey", broadcast_parent=False
        )
        baseline_issues = baseline.validate(child.hint("shuffle_hash"))
        assert issues and issues[0].count == baseline_issues[0].count

    def test_unbucketed_frames_fall_back(self, spark, orders, lineitem):
        from truthound_spark.layout import plan_exchanges
        from truthound_spark.validators.referential import orphans

        got = orphans(
            lineitem,
            orders.withColumnRenamed("o_orderkey", "l_orderkey"),
            [("l_orderkey", "l_orderkey")],
        )
        assert plan_exchanges(got) > 0  # probe rejected, broadcast path kept
