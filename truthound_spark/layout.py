"""Storage layout for repeated validation at scale: bucketed co-located
joins and partition-pruned incremental checks.

No reference counterpart — the reference is a single-node engine, so
physical layout never appears in its API (the closest is its chunked
out-of-core reader, src/truthound/datasources/spark.py, which Spark
subsumes natively). Layout IS a first-class concern for THIS engine:

* **Bucketing (co-located joins).** At 100 TB a referential check re-runs
  on every ingest batch; a shuffled anti-join moves every child key across
  the cluster on EVERY run. Writing both sides once with
  ``bucketBy(n, key)`` makes every subsequent FK check / join on that key
  Exchange-free: each task reads matching bucket files from both tables
  and joins locally. The one-time layout shuffle is amortized across all
  later runs — ``fk_orphans_bucketed`` on bucketed tables shows ZERO
  Exchange nodes (pinned in tests/test_layout.py).

* **Partitioning (pruned incremental checks).** ``partitionBy(day)`` at
  write time turns "validate only today's data" into a metadata operation:
  the partition predicate is applied at FILE LISTING (``PartitionFilters``
  in the scan node), before any row IO, so an incremental check on a
  100 TB table touches only the new partition's bytes.

Both helpers are plain wiring around the DataFrame writer/reader — the
point is the PLAN SHAPE they guarantee, and the plan-introspection helpers
(`plan_exchanges`, `scan_partition_filters`) that let tests and callers
pin it.
"""

from __future__ import annotations

import os
import tempfile
from typing import Any, Mapping, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "ensure_layout_database",
    "write_bucketed",
    "attach_layout",
    "attach_layout_database",
    "colocated_join",
    "fk_orphans_bucketed",
    "write_partitioned",
    "write_range_clustered",
    "read_pruned",
    "write_audit_publish",
    "write_audit_publish_partition",
    "incremental_check",
    "plan_exchanges",
    "scan_partition_filters",
]

#: Default bucket count. Production guidance: pick so that one bucket of the
#: LARGER table is a few hundred MB (100 TB / 65536 buckets ≈ 1.5 GB — size
#: up from here); both sides of a co-located join MUST use the same count.
DEFAULT_BUCKETS = 64

_DEFAULT_DB = "truthound_layout"

#: On-disk sidecar (``_``-prefixed = invisible to parquet readers) written
#: into every bucketed table's directory: the bucket spec + table
#: properties that otherwise live ONLY in the session catalog. Without a
#: durable metastore the catalog dies with the session — and with it the
#: bucketing metadata (co-location silently degrades to shuffles) and the
#: safety properties the dedup index / fingerprint store / shingle layout
#: enforce at read time. ``attach_layout`` restores both from this file.
_LAYOUT_SPEC_FILE = "_truthound_layout_spec.json"


def _hadoop_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    return jvm.org.apache.hadoop.fs.Path(path), spark._jsc.hadoopConfiguration()


def write_fs_text(spark: SparkSession, path: str, text: str) -> None:
    """Write a small text file through the Hadoop FileSystem API (works on
    local paths and any FS Spark can reach — no driver-local assumption)."""
    p, conf = _hadoop_path(spark, path)
    fs = p.getFileSystem(conf)
    out = fs.create(p, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def read_fs_text(spark: SparkSession, path: str) -> str:
    p, conf = _hadoop_path(spark, path)
    fs = p.getFileSystem(conf)
    stream = fs.open(p)
    try:
        return spark._jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()


def _plan_string(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def plan_exchanges(df: DataFrame) -> int:
    """Number of Exchange (shuffle or broadcast) nodes in df's physical plan.

    0 for a co-located bucketed join; >=1 for any shuffled/broadcast join.
    Counted on the pre-execution plan, so it is cheap and side-effect free
    (under AQE this is the initial physical plan — bucketed scans remove
    the Exchange statically, so the pin does not depend on runtime
    re-planning).
    """
    plan = _plan_string(df)
    return sum(line.count("Exchange") for line in plan.splitlines())


def scan_partition_filters(df: DataFrame) -> str:
    """The ``PartitionFilters: [...]`` clauses of df's scan nodes (joined),
    '' when no partition pruning applies. Lets callers/tests assert a
    predicate was pushed to file listing rather than row filtering."""
    plan = _plan_string(df)
    out = []
    for line in plan.splitlines():
        idx = line.find("PartitionFilters: [")
        if idx >= 0:
            end = line.find("]", idx)
            out.append(line[idx : end + 1 if end >= 0 else len(line)])
    return "; ".join(out)


def ensure_layout_database(
    spark: SparkSession,
    database: str = _DEFAULT_DB,
    location: str | None = None,
) -> str:
    """Create (if needed) the catalog database that holds layout tables.

    An explicit LOCATION keeps table data out of the session's default
    ``spark-warehouse`` directory (which defaults to the process cwd in
    local mode); on a cluster, point it at the object-store prefix the
    layout tables should live under.
    """
    if not database.replace("_", "").isalnum():
        raise ValueError(f"database must be an identifier, got {database!r}")
    loc = location or os.path.join(
        tempfile.gettempdir(), f"truthound_layout_{database}"
    )
    # the location is interpolated into SQL inside single quotes — escape
    # embedded quotes (tempdir- or caller-derived paths can contain them)
    loc_sql = loc.replace("'", "''")
    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS {database} LOCATION '{loc_sql}'"
    )
    return database


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: str | Sequence[str],
    buckets: int = DEFAULT_BUCKETS,
    sort: bool = True,
    database: str = _DEFAULT_DB,
    location: str | None = None,
    mode: str = "overwrite",
    properties: Mapping[str, str] | None = None,
) -> str:
    """Write ``df`` as a bucketed (and bucket-sorted) parquet table; returns
    the fully-qualified table name.

    This is the ONE shuffle a co-located layout pays. Every later join or
    groupBy on ``keys`` between tables bucketed with the SAME count reads
    matching bucket files side by side — no Exchange (and, when ``sort``,
    no Sort for a single-file-per-bucket layout). Bucket count is part of
    the layout contract: joins across different counts re-shuffle.

    ``properties`` are applied as TBLPROPERTIES (raw strings; quoting is
    handled here) AND recorded, with the bucket spec and schema, in an
    on-disk sidecar in the table directory — so a layout survives its
    session: a fresh session (or a restarted cluster without a durable
    metastore) recovers the table, its co-location guarantee, and its
    safety metadata with :func:`attach_layout` instead of re-paying the
    layout shuffle (r13)."""
    if isinstance(keys, str):
        keys = [keys]
    if not keys:
        raise ValueError("at least one bucket key is required")
    if buckets < 1:
        raise ValueError(f"buckets must be >= 1, got {buckets}")
    if not table.replace("_", "").isalnum():
        raise ValueError(f"table must be an identifier, got {table!r}")
    db = ensure_layout_database(df.sparkSession, database, location)
    fq = f"{db}.{table}"
    if mode == "overwrite" and df.sparkSession.catalog.tableExists(fq):
        # replacing an EXTERNAL table (e.g. one re-registered by
        # attach_layout whose content turned out stale): saveAsTable
        # would try to create a MANAGED table over the still-occupied
        # location and fail with LOCATION_ALREADY_EXISTS. Drop the
        # catalog entry — external drops leave the files, which the
        # stale-dir cleanup below then clears (local scheme only, same
        # rules as the catalog-forgot case).
        try:
            rows = df.sparkSession.sql(f"DESCRIBE TABLE EXTENDED {fq}").collect()
            is_external = any(
                str(r[0]).strip().lower() == "type"
                and "external" in str(r[1]).lower()
                for r in rows
            )
        except Exception:
            is_external = False
        if is_external:
            df.sparkSession.sql(f"DROP TABLE {fq}")
    if mode == "overwrite" and not df.sparkSession.catalog.tableExists(fq):
        # A fresh session's in-memory catalog forgets tables but their
        # managed-table directories persist; saveAsTable then fails with
        # LOCATION_ALREADY_EXISTS. Clear the stale local directory (an
        # overwrite would have replaced it anyway). Non-local schemes are
        # left alone — on a cluster the catalog is durable, so a table
        # unknown to it with data at its location deserves the error.
        import shutil

        for row in df.sparkSession.sql(f"DESCRIBE DATABASE {db}").collect():
            if "location" in str(row[0]).lower():
                db_loc = str(row[1])
                if db_loc.startswith("file:"):
                    stale = os.path.join(db_loc[len("file:") :], table.lower())
                    if os.path.isdir(stale):
                        shutil.rmtree(stale, ignore_errors=True)
                break
    writer = (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(buckets, keys[0], *keys[1:])
    )
    if sort:
        writer = writer.sortBy(keys[0], *keys[1:])
    writer.saveAsTable(fq)
    spark = df.sparkSession
    props = {str(k): str(v) for k, v in (properties or {}).items()}
    for k, v in props.items():
        spark.sql(
            f"ALTER TABLE {fq} SET TBLPROPERTIES "
            f"('{_sql_str(k)}' = '{_sql_str(v)}')"
        )
    # durable sidecar: bucket spec + schema + properties, in the table dir
    tbl_loc = _table_location(spark, fq)
    if tbl_loc:
        import json as _json

        spec = {
            "version": 1,
            "table": table,
            "keys": list(keys),
            "buckets": int(buckets),
            "sort": bool(sort),
            "schema_ddl": spark.table(fq)._jdf.schema().toDDL(),
            "properties": props,
        }
        try:
            write_fs_text(
                spark,
                f"{tbl_loc.rstrip('/')}/{_LAYOUT_SPEC_FILE}",
                _json.dumps(spec),
            )
        except Exception:  # pragma: no cover - sidecar is best-effort
            pass
    return fq


def _sql_str(s) -> str:
    """Escape a value for interpolation into a single-quoted SQL string
    literal. Backslashes must be doubled as well as quotes (ADVICE r13):
    with the default ``spark.sql.parser.escapedStringLiterals=false`` the
    parser interprets ``\\n``/``\\t``/``\\\\`` inside literals, so a raw
    backslash in a property value (JSON-escaped char, windows path) would
    not round-trip back out of SHOW TBLPROPERTIES."""
    return str(s).replace("\\", "\\\\").replace("'", "''")


def _norm_location(loc: str | None) -> str | None:
    """Comparable form of a storage location: URI path component (scheme
    spellings differ — ``file:/x`` vs ``file:///x`` vs ``/x``), trailing
    slashes stripped."""
    if loc is None:
        return None
    from urllib.parse import urlparse

    parsed = urlparse(str(loc))
    path = parsed.path if parsed.scheme else str(loc)
    return path.rstrip("/") or "/"


def _table_location(spark: SparkSession, fq: str) -> str | None:
    """The table's storage location URI from DESCRIBE EXTENDED, or None."""
    try:
        for row in spark.sql(f"DESCRIBE TABLE EXTENDED {fq}").collect():
            if str(row[0]).strip().lower() == "location":
                return str(row[1])
    except Exception:
        return None
    return None


def attach_layout(
    spark: SparkSession,
    location: str,
    table: str | None = None,
    database: str = _DEFAULT_DB,
) -> str:
    """Register an EXISTING bucketed table directory (written by
    :func:`write_bucketed` in some earlier session) in this session's
    catalog, restoring the bucket spec and every recorded TBLPROPERTY.

    Without a durable metastore, the catalog — and with it the bucketing
    metadata and the read-time safety properties of the dedup index /
    fingerprint store / shingle layout — dies with the session, leaving
    only the files. This reads the table's on-disk sidecar and issues
    ``CREATE TABLE ... USING parquet CLUSTERED BY ... INTO n BUCKETS
    LOCATION ...`` (an EXTERNAL table: dropping it later leaves the data)
    plus the recorded properties, so co-located plans and metadata
    checks work exactly as in the writing session — for the cost of a
    metadata read instead of a re-layout shuffle. Bucket file names carry
    their bucket ids, which is how Spark re-associates the existing
    files with the declared spec.

    ``table`` overrides the recorded name (attach the same files under a
    second name); returns the fully-qualified table name. A table that
    already exists under that name is returned as-is ONLY if it points at
    the requested location with the sidecar's bucket spec — a name
    collision (same name previously attached from a DIFFERENT directory,
    or a leftover session table) raises instead of silently serving
    different data under the attached name (ADVICE r13)."""
    import json as _json

    spec = _json.loads(
        read_fs_text(spark, f"{location.rstrip('/')}/{_LAYOUT_SPEC_FILE}")
    )
    name = table or spec["table"]
    if not name.replace("_", "").isalnum():
        raise ValueError(f"table must be an identifier, got {name!r}")
    db = ensure_layout_database(spark, database)
    fq = f"{db}.{name}"
    if spark.catalog.tableExists(fq):
        existing_loc = _norm_location(_table_location(spark, fq))
        if existing_loc != _norm_location(location):
            raise ValueError(
                f"attach_layout: table {fq!r} already exists at "
                f"{existing_loc!r}, not at the requested location "
                f"{_norm_location(location)!r} — returning it would serve "
                "different data under the attached name; drop it or attach "
                "under another name (table=)"
            )
        existing_spec = _bucket_spec(spark, fq)
        want = (int(spec["buckets"]), [str(k) for k in spec["keys"]])
        if existing_spec is not None and existing_spec != want:
            raise ValueError(
                f"attach_layout: table {fq!r} at the requested location has "
                f"bucket spec {existing_spec!r} but the sidecar records "
                f"{want!r} — the catalog entry predates a re-layout; drop "
                "and re-attach"
            )
        return fq
    keys = ", ".join(f"`{k}`" for k in spec["keys"])
    sorted_by = f" SORTED BY ({keys})" if spec.get("sort") else ""
    spark.sql(
        f"CREATE TABLE {fq} ({spec['schema_ddl']}) USING parquet "
        f"CLUSTERED BY ({keys}){sorted_by} INTO {int(spec['buckets'])} BUCKETS "
        f"LOCATION '{_sql_str(location)}'"
    )
    for k, v in (spec.get("properties") or {}).items():
        spark.sql(
            f"ALTER TABLE {fq} SET TBLPROPERTIES "
            f"('{_sql_str(k)}' = '{_sql_str(v)}')"
        )
    return fq


def _bucket_spec(spark: SparkSession, fq: str) -> tuple[int, list[str]] | None:
    """(num_buckets, bucket_columns) from DESCRIBE EXTENDED, or None when
    the table is unbucketed or the rows are absent."""
    try:
        buckets = None
        cols: list[str] | None = None
        for row in spark.sql(f"DESCRIBE TABLE EXTENDED {fq}").collect():
            label = str(row[0]).strip().lower()
            if label == "num buckets":
                buckets = int(str(row[1]).strip())
            elif label == "bucket columns":
                cols = [
                    c.strip().strip("`")
                    for c in str(row[1]).strip().strip("[]").split(",")
                    if c.strip()
                ]
        if buckets is None or cols is None:
            return None
        return buckets, cols
    except Exception:
        return None


def attach_layout_database(
    spark: SparkSession,
    location: str,
    database: str = _DEFAULT_DB,
) -> list[str]:
    """Attach every sidecar-carrying table directory under ``location`` —
    one call recovers a whole layout warehouse (shingle layouts, dedup
    indexes, fingerprint stores, FK layouts) after a session/cluster
    restart. Directories without a sidecar are skipped; returns the
    attached fully-qualified names.

    The database is (re-)ensured AT the attach root: attaching a
    warehouse re-establishes ``location`` as the database's home, so a
    LATER ``write_bucketed(mode="overwrite")`` of an attached table —
    the stale-content / stale-version re-index path — writes its fresh
    files and sidecar back under THIS root. Without the pin the rewrite
    lands at the database's DEFAULT location while every future session
    re-attaches the stale sidecars from here and re-pays the rewrite:
    a permanent re-index loop (r14, found when the dedup-index banding
    version gate first exercised the rewrite-after-attach path)."""
    p, conf = _hadoop_path(spark, location)
    fs = p.getFileSystem(conf)
    if not fs.exists(p):
        return []
    ensure_layout_database(spark, database, location)
    out: list[str] = []
    for status in fs.listStatus(p):
        if not status.isDirectory():
            continue
        child = status.getPath().toString()
        spec_path, _ = _hadoop_path(spark, f"{child}/{_LAYOUT_SPEC_FILE}")
        if not fs.exists(spec_path):
            continue
        out.append(attach_layout(spark, child, database=database))
    return out


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join two bucketed tables on their bucket keys without an Exchange.

    The ``merge`` hint forces a sort-merge join (a small side would
    otherwise broadcast, which also avoids the shuffle but would not
    exercise — or prove — the co-located layout); with both scans already
    hash-distributed by bucket, Catalyst drops both Exchange nodes.
    """
    if isinstance(on, str):
        on = [on]
    left = spark.table(left_table).hint("merge")
    right = spark.table(right_table)
    return left.join(right, on=list(on), how=how)


def fk_orphans_bucketed(
    spark: SparkSession,
    child_table: str,
    parent_table: str,
    child_key: str,
    parent_key: str | None = None,
) -> DataFrame:
    """Child rows whose key has no parent — the FK orphan check — as an
    Exchange-free anti-join over a bucketed layout.

    Equivalent single-run plan: ``validators/referential.py`` FKValidator
    (shuffled or broadcast anti-join). Use THIS form when the check re-runs
    per ingest batch over layout-managed tables: per-run cost drops from
    "shuffle every child key" to "stream matching bucket files".
    """
    parent_key = parent_key or child_key
    child = spark.table(child_table).hint("merge")
    parent = spark.table(parent_table).select(parent_key)
    if parent_key != child_key:
        parent = parent.withColumnRenamed(parent_key, child_key)
    return child.join(parent, on=child_key, how="left_anti")


def write_range_clustered(
    df: DataFrame,
    path: str,
    cols: str | Sequence[str],
    mode: str = "overwrite",
    num_partitions: int | None = None,
) -> str:
    """Write ``df`` as parquet range-clustered on ``cols`` — the layout
    that makes parquet ROW-GROUP statistics (min/max) skip selective
    filters on those columns.

    ``repartitionByRange`` gives each output file a disjoint value range
    and ``sortWithinPartitions`` makes every row group's min/max tight, so
    a pushed filter like ``col BETWEEN a AND b`` (visible as
    ``PushedFilters`` in the scan) eliminates whole row groups — and, with
    disjoint file ranges, whole files — at the reader, before decoding.
    The complement to ``write_partitioned``: partitioning prunes on LOW
    cardinality columns at file listing; range clustering skips on HIGH
    cardinality columns (ids, timestamps) at the parquet reader. One
    range-exchange at write time, repaid on every selective read.
    """
    if isinstance(cols, str):
        cols = [cols]
    if not cols:
        raise ValueError("at least one clustering column is required")
    key_cols = [F.col(c) for c in cols]
    clustered = (
        df.repartitionByRange(num_partitions, *key_cols)
        if num_partitions
        else df.repartitionByRange(*key_cols)
    )
    clustered.sortWithinPartitions(*key_cols).write.mode(mode).parquet(path)
    return path


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: str | Sequence[str],
    mode: str = "overwrite",
) -> str:
    """Write ``df`` as parquet partitioned by ``partition_cols`` (directory
    per value — the layout that makes incremental checks prunable)."""
    if isinstance(partition_cols, str):
        partition_cols = [partition_cols]
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)
    return path


def read_pruned(
    spark: SparkSession,
    path: str,
    partition_equals: Mapping[str, Any] | None = None,
    where: Column | str | None = None,
) -> DataFrame:
    """Read a partitioned parquet table keeping only matching partitions.

    ``partition_equals`` maps partition column -> value (combined with AND);
    ``where`` is any extra predicate. Equality on partition columns lands in
    the scan's ``PartitionFilters`` — directories for other values are never
    listed or read.
    """
    df = spark.read.parquet(path)
    if partition_equals:
        for col, val in partition_equals.items():
            df = df.filter(F.col(col) == F.lit(val))
    if where is not None:
        df = df.filter(where)
    return df


def _refuse_nonlocal(df: DataFrame, path: str) -> None:
    """Write-audit-publish publishes with driver-side os.rename: refuse
    explicit non-file schemes (no atomic rename on object stores) AND
    scheme-less paths when fs.defaultFS is non-local (the Spark staging
    write would land on defaultFS while the publish rename runs on the
    driver's local filesystem — two different filesystems)."""
    if "://" in path and not path.startswith("file:"):
        raise NotImplementedError(
            "write_audit_publish publishes with a filesystem rename; "
            f"scheme of {path!r} has no atomic rename — use a table "
            "format with a commit protocol (Iceberg/Delta) there"
        )
    if not path.startswith("file:"):
        default_fs = (
            df.sparkSession._jsc.hadoopConfiguration().get(
                "fs.defaultFS", "file:///"
            )
            or "file:///"
        )
        if not default_fs.startswith("file:"):
            raise NotImplementedError(
                f"scheme-less path {path!r} resolves against "
                f"fs.defaultFS={default_fs!r} for the write but against "
                "the local filesystem for the publish rename — pass an "
                "explicit file: URI for a local table, or use a table "
                "format with a commit protocol for non-local filesystems"
            )


def write_audit_publish(
    df: DataFrame,
    path: str,
    validators: list,
    partition_cols: str | Sequence[str] | None = None,
    overwrite: bool = False,
    keep_failed_staging: bool = False,
    result_format: Any = None,
):
    """Stage → audit → publish: the write gate that keeps bad data out of
    a published table (the WAP pattern popularized by Netflix's Iceberg
    deployments; no reference counterpart — a single-node engine returns
    issues to its caller, a pipeline engine must gate the WRITE).

    ``df`` is written to a staging directory NEXT TO ``path``, the audit
    re-reads the staged files (so it validates the bytes that actually
    landed — catching write-path surprises and non-deterministic upstream
    plans, which an audit of the in-memory frame would miss), and only a
    clean audit publishes staging to ``path`` via same-filesystem
    rename(s). A failed audit deletes staging (or keeps it for debugging
    with ``keep_failed_staging``) and the published path is never touched
    — downstream readers see the previous version or nothing, never a
    half-validated table. An ``overwrite`` publish is TWO renames
    (old → aside, staging → path): readers may observe a brief ENOENT
    window between them, and a crash inside the window is repaired by
    restoring the old version (so the table is never left unpublished) —
    a single-rename atomic replace would need renameat2(RENAME_EXCHANGE),
    which Python/HDFS don't expose portably.

    Returns ``(published: bool, issues: list, final_path: str)`` —
    ``final_path`` is ``path`` on publish, the retained staging directory
    on a kept failure, else "".

    Local/HDFS-style filesystems only (rename is atomic there); for
    object stores use a table format with a real commit protocol
    (Iceberg/Delta) — a rename on S3 is a copy, and this function refuses
    to pretend otherwise.
    """
    import shutil
    import uuid

    from truthound_spark.core.executor import BatchExpressionExecutor

    _refuse_nonlocal(df, path)
    local = path[len("file:") :] if path.startswith("file:") else path
    staging = f"{local}__staging__{uuid.uuid4().hex[:12]}"

    writer = df.write.mode("errorifexists")
    if partition_cols:
        if isinstance(partition_cols, str):
            partition_cols = [partition_cols]
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(staging)

    staged = df.sparkSession.read.parquet(staging)
    kwargs = {} if result_format is None else {"result_format": result_format}
    issues = BatchExpressionExecutor(validators, **kwargs).execute(staged)
    failed = [i for i in issues if not i.success]
    if failed:
        if keep_failed_staging:
            return False, failed, staging
        shutil.rmtree(staging, ignore_errors=True)
        return False, failed, ""
    if os.path.exists(local):
        if not overwrite:
            shutil.rmtree(staging, ignore_errors=True)
            raise FileExistsError(
                f"{local} exists; pass overwrite=True to replace it"
            )
        old = f"{local}__replaced__{uuid.uuid4().hex[:12]}"
        os.rename(local, old)
        try:
            os.rename(staging, local)
        except BaseException:
            # repair the ENOENT window: restore the previous version so a
            # failed second rename never leaves the table unpublished
            os.rename(old, local)
            raise
        shutil.rmtree(old, ignore_errors=True)
    else:
        os.rename(staging, local)
    return True, [], local


def write_audit_publish_partition(
    df: DataFrame,
    path: str,
    validators: list,
    partition: Mapping[str, Any],
    overwrite: bool = False,
    keep_failed_staging: bool = False,
    result_format: Any = None,
):
    """Stage → audit → publish ONE partition of a partitioned table — the
    per-ingest WAP pattern (``write_audit_publish`` gates whole tables;
    a daily pipeline gates each day's partition while yesterday's data
    keeps serving reads).

    ``partition`` maps partition column(s) → the single value being
    published (e.g. ``{"day": "2024-06-01"}``). ``df`` must contain ONLY
    that partition's rows: it is staged ``partitionBy`` the partition
    columns into a SIBLING staging directory (never under ``path``, so
    concurrent readers of other partitions can never list it), the audit
    re-reads the staged bytes, the staged layout is checked to contain
    exactly the requested partition directory (mixed or mislabeled data
    aborts), and only then is that one directory renamed into place —
    other partitions are never touched. Replacing an existing partition
    needs ``overwrite=True`` and uses the same two-rename + crash-repair
    protocol as the table-level gate.

    Returns ``(published: bool, issues: list, final_path: str)`` —
    ``final_path`` is the published partition directory on success."""
    import shutil
    import urllib.parse
    import uuid

    from truthound_spark.core.executor import BatchExpressionExecutor

    if not partition:
        raise ValueError("partition must name at least one column=value")
    _refuse_nonlocal(df, path)
    local = path[len("file:") :] if path.startswith("file:") else path
    staging = f"{local}__staging__{uuid.uuid4().hex[:12]}"
    cols = list(partition.keys())
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"df lacks partition column(s) {missing}")

    df.write.mode("errorifexists").partitionBy(*cols).parquet(staging)

    try:
        staged = df.sparkSession.read.option("basePath", staging).parquet(staging)
        kwargs = {} if result_format is None else {"result_format": result_format}
        issues = BatchExpressionExecutor(validators, **kwargs).execute(staged)
        failed = [i for i in issues if not i.success]
        if failed:
            if keep_failed_staging:
                return False, failed, staging
            shutil.rmtree(staging, ignore_errors=True)
            return False, failed, ""
        # descend the staged layout: each level must hold exactly the one
        # requested partition directory — anything else means df carried
        # rows of OTHER partitions (publishing them under this partition's
        # name would silently misfile data)
        src_dir = staging
        rel_parts = []
        for c in cols:
            subdirs = [
                d
                for d in os.listdir(src_dir)
                if os.path.isdir(os.path.join(src_dir, d)) and "=" in d
            ]
            want = str(partition[c])
            ok = (
                len(subdirs) == 1
                and subdirs[0].split("=", 1)[0] == c
                and urllib.parse.unquote(subdirs[0].split("=", 1)[1]) == want
            )
            if not ok:
                shutil.rmtree(staging, ignore_errors=True)
                raise ValueError(
                    f"staged data is not exactly partition {c}={want!r}: "
                    f"found {sorted(subdirs)!r} — df must contain only the "
                    "published partition's rows"
                )
            rel_parts.append(subdirs[0])
            src_dir = os.path.join(src_dir, subdirs[0])
    except BaseException:
        if not keep_failed_staging:
            shutil.rmtree(staging, ignore_errors=True)
        raise

    target = os.path.join(local, *rel_parts)
    os.makedirs(os.path.dirname(target), exist_ok=True)
    if os.path.exists(target):
        if not overwrite:
            shutil.rmtree(staging, ignore_errors=True)
            raise FileExistsError(
                f"partition {target} exists; pass overwrite=True to replace it"
            )
        old = f"{target}__replaced__{uuid.uuid4().hex[:12]}"
        os.rename(target, old)
        try:
            os.rename(src_dir, target)
        except BaseException:
            os.rename(old, target)
            raise
        shutil.rmtree(old, ignore_errors=True)
    else:
        os.rename(src_dir, target)
    shutil.rmtree(staging, ignore_errors=True)
    return True, [], target


def incremental_check(
    spark: SparkSession,
    path: str,
    validators: list,
    partition_equals: Mapping[str, Any] | None = None,
    where: Column | str | None = None,
    result_format: Any = None,
):
    """Run a validator suite on ONLY the matching partitions of a
    partitioned table — the incremental-validation entry point.

    Returns ``(issues, stats)`` from the fused single-aggregation executor;
    the scan under it carries the partition predicate as PartitionFilters,
    so cost scales with the new partition, not the table.
    """
    from truthound_spark.core.executor import BatchExpressionExecutor

    df = read_pruned(spark, path, partition_equals, where)
    kwargs = {} if result_format is None else {"result_format": result_format}
    return BatchExpressionExecutor(validators, **kwargs).execute_with_stats(df)
