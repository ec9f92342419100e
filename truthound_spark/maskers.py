"""PII masking (reference: src/truthound/maskers.py; API th.mask
api.py:206-268). Strategies: redact → literal, hash → sha2 (JVM-side),
fake → deterministic hash-indexed lookup arrays (pure column math, no UDF).

The fake index derives from md5 (not Spark's Murmur3 ``F.hash``) so the
same input masks to the same fake value on ANY engine/version — pipeline
reruns, backfills, and cross-engine audits see stable pseudonyms. md5 here
is an index derivation, not a security boundary (use strategy='hash' with
sha2 for irreversibility).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

REDACTED = "***"

_FAKE_NAMES = [
    "Alex Kim", "Sam Lee", "Jordan Park", "Casey Choi", "Riley Jung",
    "Morgan Han", "Taylor Shin", "Drew Kang", "Jamie Cho", "Avery Yoon",
]
_FAKE_DOMAINS = ["example.com", "example.org", "example.net", "mail.test", "post.test"]


def _stable_index(col: Column) -> Column:
    """First 6 hex digits of md5 as a long (24 bits — engine-portable:
    the SQL mirror is ('0x' || substr(md5(x),1,6))::BIGINT)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 6), 16, 10).cast("int")


def _fake_email(col: Column) -> Column:
    h = _stable_index(col)
    local = F.concat(F.lit("user"), (h % 100000).cast("string"))
    domain_arr = F.array(*[F.lit(d) for d in _FAKE_DOMAINS])
    return F.concat(local, F.lit("@"), F.element_at(domain_arr, (h % len(_FAKE_DOMAINS)) + 1))


def _fake_name(col: Column) -> Column:
    arr = F.array(*[F.lit(x) for x in _FAKE_NAMES])
    return F.element_at(arr, (_stable_index(col) % len(_FAKE_NAMES)) + 1)


def _fake_phone(col: Column) -> Column:
    h = _stable_index(col)
    return F.concat(
        F.lit("555-"),
        F.lpad((h % 1000).cast("string"), 3, "0"),
        F.lit("-"),
        F.lpad(((h / F.lit(1000)).cast("long") % 10000).cast("string"), 4, "0"),
    )


def mask(
    df: DataFrame,
    columns: list[str] | None = None,
    strategy: str = "redact",
    pii_types: dict[str, str] | None = None,
) -> DataFrame:
    """Mask columns (reference api.py:206-268).

    strategy: 'redact' | 'hash' | 'fake'. With columns=None, scans for PII
    first and masks every flagged column. ``pii_types`` maps column→type to
    pick the fake generator. Returns a DataFrame — fully distributed.
    """
    if columns is None:
        from truthound_spark.scanners import scan

        report = scan(df)
        columns = sorted({f.column for f in report.findings})
        pii_types = pii_types or {f.column: f.pii_type for f in report.findings}
    pii_types = pii_types or {}

    out = df
    for c in columns:
        col = F.col(c)
        if strategy == "redact":
            masked = F.when(col.isNotNull(), F.lit(REDACTED))
        elif strategy == "hash":
            masked = F.when(col.isNotNull(), F.sha2(col.cast("string"), 256))
        elif strategy == "fake":
            t = pii_types.get(c, "")
            if "email" in t or "email" in c.lower():
                masked = F.when(col.isNotNull(), _fake_email(col))
            elif "phone" in t or "phone" in c.lower():
                masked = F.when(col.isNotNull(), _fake_phone(col))
            else:
                masked = F.when(col.isNotNull(), _fake_name(col))
        else:
            raise ValueError(f"unknown strategy {strategy!r}")
        out = out.withColumn(c, masked)
    return out
