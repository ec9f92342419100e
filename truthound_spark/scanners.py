"""PII scanning (reference: src/truthound/scanners.py:21-91 PII_PATTERNS +
column-name hints; API th.scan api.py:152-203).

All patterns evaluate as JVM-side rlike counts fused into ONE aggregate job
over all (string column × pattern) pairs — no sampling round-trips unless
requested.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from truthound_spark.core.base import STRING_TYPES, columns_of_type

#: PII regex patterns (reference: scanners.py:21-77).
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone_us": r"(\+?1[-.\s]?)?(\(?[0-9]{3}\)?[-.\s]?)[0-9]{3}[-.\s]?[0-9]{4}",
    "ssn": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
    "credit_card": r"\b[0-9]{4}[- ]?[0-9]{4}[- ]?[0-9]{4}[- ]?[0-9]{4}\b",
    "ipv4": r"\b(25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)(\.(25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)){3}\b",
    "date_of_birth": r"\b(19|20)[0-9]{2}[-/](0[1-9]|1[0-2])[-/](0[1-9]|[12][0-9]|3[01])\b",
    "korean_rrn": r"\b[0-9]{6}-[1-8][0-9]{6}\b",
    "korean_phone": r"\b01[016789]-?[0-9]{3,4}-?[0-9]{4}\b",
    "passport": r"\b[A-Z]{1,2}[0-9]{7,8}\b",
}

#: Column-name hints (reference: scanners.py:81-91).
NAME_HINTS: dict[str, str] = {
    "email": "email",
    "phone": "phone_us",
    "ssn": "ssn",
    "social": "ssn",
    "card": "credit_card",
    "ip": "ipv4",
    "birth": "date_of_birth",
    "dob": "date_of_birth",
    "rrn": "korean_rrn",
    "passport": "passport",
}


@dataclass
class PIIFinding:
    column: str
    pii_type: str
    match_count: int
    match_ratio: float
    via: str  # "pattern" | "column_name"

    def to_dict(self) -> dict[str, Any]:
        return {
            "column": self.column,
            "pii_type": self.pii_type,
            "match_count": self.match_count,
            "match_ratio": self.match_ratio,
            "via": self.via,
        }


@dataclass
class PIIReport:
    findings: list[PIIFinding] = field(default_factory=list)
    row_count: int = 0
    scanned_columns: list[str] = field(default_factory=list)

    @property
    def has_pii(self) -> bool:
        return bool(self.findings)

    def to_dict(self) -> dict[str, Any]:
        return {
            "has_pii": self.has_pii,
            "row_count": self.row_count,
            "scanned_columns": self.scanned_columns,
            "findings": [f.to_dict() for f in self.findings],
        }


def scan(
    df: DataFrame,
    columns: list[str] | None = None,
    min_ratio: float = 0.1,
    sample_rows: int | None = None,
) -> PIIReport:
    """Scan string columns for PII (reference api.py:152-203).

    ``sample_rows`` limits the scan (reference samples for speed); None
    scans everything — at 100 TB prefer a sampled scan then a targeted
    full pass on flagged columns.
    """
    cols = columns or columns_of_type(df, STRING_TYPES)
    if sample_rows:
        df = df.limit(sample_rows)
    if not cols:
        return PIIReport()
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"{c}__nn"))
        for pii, pat in PII_PATTERNS.items():
            aggs.append(
                F.sum(F.when(F.col(c).rlike(pat), 1).otherwise(0)).alias(f"{c}__{pii}")
            )
    row = df.agg(*aggs).collect()[0].asDict()
    n = int(row["__n"])
    report = PIIReport(row_count=n, scanned_columns=cols)
    for c in cols:
        nn = int(row[f"{c}__nn"] or 0)
        hinted = next((p for hint, p in NAME_HINTS.items() if hint in c.lower()), None)
        for pii in PII_PATTERNS:
            cnt = int(row[f"{c}__{pii}"] or 0)
            ratio = cnt / nn if nn else 0.0
            if cnt and (ratio >= min_ratio or pii == hinted):
                report.findings.append(
                    PIIFinding(
                        column=c,
                        pii_type=pii,
                        match_count=cnt,
                        match_ratio=round(ratio, 6),
                        via="column_name" if pii == hinted else "pattern",
                    )
                )
    return report
