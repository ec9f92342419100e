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
    """One-aggregate deterministic fingerprint (reference :76)."""
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
