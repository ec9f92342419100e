"""Dataset fingerprinting: deterministic did-the-data-change digests.

Reference: _datasets/fingerprinting.py:76 ``fingerprint_dataset`` —
schema_hash, column_list_hash, row_count, null_profile_hash,
sampled_row_hash and an optional full content_checksum, packaged as the
artifact a depot/orchestrator compares between pipeline runs instead of
re-reading the data.

Spark-first adjustments (the reference digests the ORDERED list of
per-row hashes, :114 — Spark DataFrames have no row order, so an
order-dependent digest would be nondeterministic across partitionings):

  * content_checksum = sha256 of the SUM of per-row ``xxhash64`` values
    accumulated in decimal(38,0) (commutative and overflow-free under
    ANSI — plain long sums would throw; xor would cancel duplicate
    rows pairwise) — order- and partitioning-independent, sensitive to
    any row change, computed in the same single aggregate;
  * sampled_row_hash = sha256 over the k SMALLEST row hashes
    (TakeOrdered — a deterministic bottom-k sketch, the minhash
    argument; the reference's head-N depends on physical row order).

One fused aggregate over the data (+ one TakeOrdered for the sample);
everything else is driver-side schema math. NULL-safe: per-row hashes
feed every column through xxhash64, which hashes NULL deterministically.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _digest(payload: Any) -> str:
    return hashlib.sha256(
        json.dumps(payload, sort_keys=True, default=str).encode()
    ).hexdigest()


@dataclass
class DatasetFingerprint:
    """reference fingerprinting.py DatasetFingerprint shape."""

    schema_hash: str
    column_list_hash: str
    row_count: int
    null_profile_hash: str
    sampled_row_hash: str
    content_checksum: str | None = None
    metadata: dict[str, Any] = field(default_factory=dict)

    def to_dict(self) -> dict[str, Any]:
        return {
            "schema_hash": self.schema_hash,
            "column_list_hash": self.column_list_hash,
            "row_count": self.row_count,
            "null_profile_hash": self.null_profile_hash,
            "sampled_row_hash": self.sampled_row_hash,
            "content_checksum": self.content_checksum,
            "metadata": self.metadata,
        }

    def same_schema(self, other: "DatasetFingerprint") -> bool:
        return self.schema_hash == other.schema_hash

    def same_content(self, other: "DatasetFingerprint") -> bool:
        """Strongest available comparison: full checksum when both carry
        one, else the (row_count, null profile, sampled hash) triple."""
        if self.content_checksum and other.content_checksum:
            return self.content_checksum == other.content_checksum
        return (
            self.row_count == other.row_count
            and self.null_profile_hash == other.null_profile_hash
            and self.sampled_row_hash == other.sampled_row_hash
        )


def fingerprint_dataset(
    df: DataFrame,
    sample_size: int = 128,
    include_content_checksum: bool = False,
    metadata: dict[str, Any] | None = None,
) -> DatasetFingerprint:
    """One-aggregate deterministic fingerprint (reference :76).

    Scan count (audited r9): TWO scans — the fused count/null/checksum
    aggregate, plus the bottom-k row-hash sketch (a TakeOrdered pass;
    it needs per-row hashes, not aggregates, so it cannot fold into
    the first). Both are independent of column count."""
    if sample_size <= 0:
        raise ValueError("sample_size must be greater than zero")
    cols = df.columns
    schema_items = [{"name": f.name, "dtype": f.dataType.simpleString()} for f in df.schema.fields]

    row_hash = F.xxhash64(*[F.col(c) for c in cols])
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        aggs.append((F.count(F.lit(1)) - F.count(F.col(c))).alias(f"__nulls{i}"))
    if include_content_checksum:
        aggs.append(
            F.sum(row_hash.cast("decimal(38,0)")).alias("__content")
        )
    row = df.agg(*aggs).collect()[0]
    n = int(row["__n"])
    null_profile = {
        c: {
            "null_count": int(row[f"__nulls{i}"]),
            "null_ratio": round(int(row[f"__nulls{i}"]) / n, 9) if n else 0.0,
        }
        for i, c in enumerate(cols)
    }
    sampled = [
        r["h"]
        for r in df.select(row_hash.alias("h")).orderBy("h").limit(sample_size).collect()
    ]
    content = None
    if include_content_checksum:
        content = _digest({"sum": str(row["__content"]), "rows": n})
    return DatasetFingerprint(
        schema_hash=_digest(sorted(schema_items, key=lambda s: s["name"])),
        column_list_hash=_digest(cols),
        row_count=n,
        null_profile_hash=_digest(null_profile),
        sampled_row_hash=_digest(sampled),
        content_checksum=content,
        metadata={
            "engine": "truthound_spark.fingerprint",
            "schema": schema_items,
            "sample_size": sample_size,
            "content_checksum_included": include_content_checksum,
            **(metadata or {}),
        },
    )


# ---------------------------------------------------------------------------
# summary diffing (reference _datasets/diffing.py)
# ---------------------------------------------------------------------------
DIFF_CATEGORIES = (
    "schema_added",
    "schema_removed",
    "schema_changed",
    "row_count_changed",
    "null_profile_changed",
    "sample_changed",
    "content_changed",
    "unknown_changed",
)


@dataclass
class DatasetDiff:
    """Summary-level diff between two fingerprints (reference
    diffing.py:58 — explicitly NOT a row-level diff; corpus_diff in
    pipeline/dedup.py is the per-document form)."""

    source_snapshot_id: str
    target_snapshot_id: str
    categories: list[str]
    summary: dict[str, Any]
    details: dict[str, Any]

    @property
    def changed(self) -> bool:
        return bool(self.categories)

    def to_dict(self) -> dict[str, Any]:
        return {
            "source_snapshot_id": self.source_snapshot_id,
            "target_snapshot_id": self.target_snapshot_id,
            "categories": list(self.categories),
            "summary": self.summary,
            "details": self.details,
        }


def diff_fingerprints(
    source: DatasetFingerprint,
    target: DatasetFingerprint,
    source_snapshot_id: str = "source",
    target_snapshot_id: str = "target",
) -> DatasetDiff:
    """Deterministic summary diff (reference diffing.py:58-163):
    schema added/removed/retyped + column-order drift, row-count delta,
    null-profile/sample/content hash changes, categorized."""
    s_items = source.metadata.get("schema") or []
    t_items = target.metadata.get("schema") or []
    s_by = {i["name"]: i for i in s_items}
    t_by = {i["name"]: i for i in t_items}
    added = [i for i in t_items if i["name"] not in s_by]
    removed = [i for i in s_items if i["name"] not in t_by]
    type_changed = [
        {
            "name": n,
            "source_dtype": s_by[n]["dtype"],
            "target_dtype": t_by[n]["dtype"],
        }
        for n in (i["name"] for i in s_items)
        if n in t_by and s_by[n]["dtype"] != t_by[n]["dtype"]
    ]
    order_changed = (
        source.column_list_hash != target.column_list_hash
        and not added
        and not removed
        and not type_changed
    )
    categories: list[str] = []
    if added:
        categories.append("schema_added")
    if removed:
        categories.append("schema_removed")
    if type_changed or order_changed:
        categories.append("schema_changed")
    if source.row_count != target.row_count:
        categories.append("row_count_changed")
    if source.null_profile_hash != target.null_profile_hash:
        categories.append("null_profile_changed")
    if source.sampled_row_hash != target.sampled_row_hash:
        categories.append("sample_changed")
    if (
        source.content_checksum
        and target.content_checksum
        and source.content_checksum != target.content_checksum
    ):
        categories.append("content_changed")
    if not categories and source.to_dict() != target.to_dict():
        categories.append("unknown_changed")
    return DatasetDiff(
        source_snapshot_id=source_snapshot_id,
        target_snapshot_id=target_snapshot_id,
        categories=categories,
        summary={
            "changed": bool(categories),
            "category_count": len(categories),
            "categories": categories,
            "source_row_count": source.row_count,
            "target_row_count": target.row_count,
            "row_count_delta": target.row_count - source.row_count,
            "schema_added_count": len(added),
            "schema_removed_count": len(removed),
            "schema_type_changed_count": len(type_changed),
            "scope": "summary_fingerprint",
            "row_level_diff_available": False,
        },
        details={
            "schema": {
                "added": added,
                "removed": removed,
                "type_changed": type_changed,
                "column_order_changed": order_changed,
            },
            "row_count": {
                "changed": source.row_count != target.row_count,
                "source": source.row_count,
                "target": target.row_count,
                "delta": target.row_count - source.row_count,
            },
            "null_profile": {
                "changed": source.null_profile_hash != target.null_profile_hash
            },
            "sampled_row_digest": {
                "changed": source.sampled_row_hash != target.sampled_row_hash
            },
            "content_checksum": {
                "available": bool(source.content_checksum and target.content_checksum),
                "changed": bool(
                    source.content_checksum
                    and target.content_checksum
                    and source.content_checksum != target.content_checksum
                ),
            },
        },
    )


def diff_datasets(
    source: DataFrame,
    target: DataFrame,
    source_snapshot_id: str = "source",
    target_snapshot_id: str = "target",
    sample_size: int = 128,
    include_content_checksum: bool = False,
) -> DatasetDiff:
    """Fingerprint both sides, then diff (reference diffing.py:20)."""
    return diff_fingerprints(
        fingerprint_dataset(
            source,
            sample_size=sample_size,
            include_content_checksum=include_content_checksum,
        ),
        fingerprint_dataset(
            target,
            sample_size=sample_size,
            include_content_checksum=include_content_checksum,
        ),
        source_snapshot_id=source_snapshot_id,
        target_snapshot_id=target_snapshot_id,
    )
