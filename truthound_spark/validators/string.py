"""String / format validators (reference: src/truthound/validators/string/).

All regex checks compile to ``rlike`` Column expressions — JVM-side,
whole-stage-codegen'd, no Python in the hot path. Patterns are guarded by a
lightweight ReDoS check (reference: validators/base.py:140-165; full
analyzer validators/security/redos.py:160-587) since rlike uses backtracking
java.util.regex.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from truthound_spark.core.base import (
    STRING_TYPES,
    ExpressionSpec,
    Validator,
    violation_count,
)
from truthound_spark.core.registry import register_validator

# -- ReDoS guard --------------------------------------------------------------
# Full parse-tree static analyzer in validators/redos.py (capability parity
# with reference validators/security/redos.py:160-587). rlike runs on
# java.util.regex inside executor tasks, so rejecting a catastrophic pattern
# on the driver is the distributed defense.


def check_redos(pattern: str) -> None:
    """Raise on patterns the static analyzer rates HIGH/CRITICAL."""
    from truthound_spark.validators.redos import ReDoSRisk, analyze_regex_complexity

    analysis = analyze_regex_complexity(pattern)
    if analysis.risk >= ReDoSRisk.HIGH:
        detail = analysis.issues[0] if analysis.issues else analysis.risk.name
        raise ValueError(
            f"pattern {pattern!r} risks catastrophic backtracking: {detail}"
        )


#: Precompiled format patterns (reference: string/format.py:179-432).
FORMAT_PATTERNS: dict[str, str] = {
    "email": r"^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}$",
    "url": r"^https?://[^\s/$.?#].[^\s]*$",
    "uuid": r"^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$",
    "ipv4": r"^((25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}(25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)$",
    "ipv6": r"^([0-9a-fA-F]{1,4}:){7}[0-9a-fA-F]{1,4}$",
    "phone": r"^\+?[0-9][0-9\-\s()]{6,18}[0-9]$",
    "date_iso": r"^\d{4}-\d{2}-\d{2}$",
    "alphanumeric": r"^[A-Za-z0-9]*$",
}

#: Column-name → format auto-detect table (reference: format.py:432 heuristic).
NAME_FORMAT_HINTS: dict[str, str] = {
    "email": "email",
    "mail": "email",
    "url": "url",
    "website": "url",
    "uuid": "uuid",
    "guid": "uuid",
    "ip": "ipv4",
    "ip_address": "ipv4",
    "phone": "phone",
    "tel": "phone",
}


@register_validator("regex", category="string")
class RegexValidator(Validator):
    """Values must match pattern (reference: string/regex.py:33).

    NOTE: matches the reference's `str.contains` semantics — the pattern is
    a *search*, anchor with ^...$ for full match. Spark rlike is also a
    search, so semantics align 1:1.
    """

    issue_type = "regex_mismatch"
    negate = False

    def __init__(self, column: str, pattern: str) -> None:
        check_redos(pattern)
        self.column = column
        self.pattern = pattern

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        col = F.col(self.column)
        match = col.rlike(self.pattern)
        pred = (match if self.negate else ~match) & col.isNotNull()
        return [
            ExpressionSpec(
                name=self.name,
                issue_type=self.issue_type,
                column=self.column,
                count_expr=violation_count(pred),
                non_null_expr=F.count(col),
                filter_expr=pred,
                expected=("not " if self.negate else "") + f"matching {self.pattern!r}",
            )
        ]


@register_validator("not_match_regex", category="string")
class NotMatchRegexValidator(RegexValidator):
    """reference: string/regex_extended.py:185"""

    issue_type = "regex_forbidden_match"
    negate = True


@register_validator("regex_list", category="string")
class RegexListValidator(Validator):
    """Match ANY/ALL of a pattern list (reference: regex_extended.py:38)."""

    def __init__(self, column: str, patterns: list[str], match: str = "any") -> None:
        for p in patterns:
            check_redos(p)
        self.column = column
        self.patterns = patterns
        self.match = match

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        col = F.col(self.column)
        matches = [col.rlike(p) for p in self.patterns]
        combined = matches[0]
        for m in matches[1:]:
            combined = (combined | m) if self.match == "any" else (combined & m)
        pred = ~combined & col.isNotNull()
        return [
            ExpressionSpec(
                name="regex_list",
                issue_type="regex_list_mismatch",
                column=self.column,
                count_expr=violation_count(pred),
                non_null_expr=F.count(col),
                filter_expr=pred,
                expected=f"{self.match} of {self.patterns}",
            )
        ]


@register_validator("like_pattern", category="string")
class LikePatternValidator(Validator):
    """SQL LIKE %/_ pattern (reference: string/like_pattern.py:19).
    Spark has native LIKE — no regex translation needed."""

    negate = False

    def __init__(self, column: str, pattern: str) -> None:
        self.column = column
        self.pattern = pattern

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        col = F.col(self.column)
        match = col.like(self.pattern)
        pred = (match if self.negate else ~match) & col.isNotNull()
        return [
            ExpressionSpec(
                name=self.name,
                issue_type="like_mismatch",
                column=self.column,
                count_expr=violation_count(pred),
                non_null_expr=F.count(col),
                filter_expr=pred,
                expected=f"LIKE {self.pattern!r}",
            )
        ]


@register_validator("not_like_pattern", category="string")
class NotLikePatternValidator(LikePatternValidator):
    """reference: like_pattern.py:195"""

    negate = True


@register_validator("length", category="string")
class LengthValidator(Validator):
    """len ∈ [min,max] (reference: string/length.py:17)."""

    def __init__(self, column: str, min_length: int = 0, max_length: int | None = None) -> None:
        self.column = column
        self.min_length = min_length
        self.max_length = max_length

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        col = F.col(self.column)
        ln = F.length(col)
        pred = ln < self.min_length
        if self.max_length is not None:
            pred = pred | (ln > self.max_length)
        pred = pred & col.isNotNull()
        return [
            ExpressionSpec(
                name="length",
                issue_type="length_out_of_range",
                column=self.column,
                count_expr=violation_count(pred),
                non_null_expr=F.count(col),
                filter_expr=pred,
                extra_exprs={"min_len": F.min(ln), "max_len": F.max(ln)},
                expected=f"length in [{self.min_length},{self.max_length}]",
            )
        ]


class _FormatValidator(Validator):
    fmt: str = "email"

    def __init__(self, column: str) -> None:
        self.column = column

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        col = F.col(self.column)
        pred = ~col.rlike(FORMAT_PATTERNS[self.fmt]) & col.isNotNull()
        return [
            ExpressionSpec(
                name=self.name,
                issue_type=f"invalid_{self.fmt}",
                column=self.column,
                count_expr=violation_count(pred),
                non_null_expr=F.count(col),
                filter_expr=pred,
                expected=f"valid {self.fmt}",
            )
        ]


@register_validator("email", category="string")
class EmailValidator(_FormatValidator):
    """reference: string/format.py:179"""

    fmt = "email"


@register_validator("url", category="string")
class UrlValidator(_FormatValidator):
    """reference: string/format.py:207"""

    fmt = "url"


@register_validator("uuid", category="string")
class UuidValidator(_FormatValidator):
    """reference: string/format.py:356"""

    fmt = "uuid"


@register_validator("ip_address", category="string")
class IpAddressValidator(_FormatValidator):
    """reference: string/format.py:378"""

    fmt = "ipv4"


@register_validator("phone", category="string")
class PhoneValidator(_FormatValidator):
    """reference: string/format.py:279"""

    fmt = "phone"


@register_validator("format", category="string")
class FormatValidator(Validator):
    """Auto-detect format by column name (reference: format.py:432)."""

    def __init__(self, columns: list[str] | None = None) -> None:
        self.columns = columns

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        out: list[ExpressionSpec] = []
        for c in self._target_columns(df, self.columns, STRING_TYPES):
            lower = c.lower()
            fmt = None
            for hint, f in NAME_FORMAT_HINTS.items():
                if hint in lower:
                    fmt = f
                    break
            if fmt is None:
                continue
            col = F.col(c)
            pred = ~col.rlike(FORMAT_PATTERNS[fmt]) & col.isNotNull()
            out.append(
                ExpressionSpec(
                    name="format",
                    issue_type=f"invalid_{fmt}",
                    column=c,
                    count_expr=violation_count(pred),
                    non_null_expr=F.count(col),
                    filter_expr=pred,
                    expected=f"valid {fmt} (auto-detected)",
                )
            )
        return out


@register_validator("consistent_casing", category="string")
class ConsistentCasingValidator(Validator):
    """Dominant-case ratio (reference: string/casing.py:13)."""

    def __init__(self, column: str, min_dominance: float = 0.9) -> None:
        self.column = column
        self.min_dominance = min_dominance

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        col = F.col(self.column)
        md = self.min_dominance

        def judge(m):
            nn = m.get("denom") or 0
            if not nn:
                return True, None, ""
            dom = max(m.get("lower") or 0, m.get("upper") or 0, m.get("title") or 0) / nn
            return dom >= md, round(dom, 4), f"dominant casing ratio {dom:.3f} < {md}"

        return [
            ExpressionSpec(
                name="consistent_casing",
                issue_type="inconsistent_casing",
                column=self.column,
                non_null_expr=F.count(col),
                extra_exprs={
                    "lower": F.sum(F.when(col == F.lower(col), 1).otherwise(0)),
                    "upper": F.sum(F.when(col == F.upper(col), 1).otherwise(0)),
                    "title": F.sum(F.when(col == F.initcap(col), 1).otherwise(0)),
                },
                expected=f"dominant case >= {md:.0%}",
                judge=judge,
            )
        ]


@register_validator("json_parseable", category="string")
class JsonParseableValidator(Validator):
    """Value parses as JSON (reference: string/json.py:24).

    Spark-native: try_parse_json / get_json_object round-trip — stays
    JVM-side (no Python UDF).
    """

    def __init__(self, column: str) -> None:
        self.column = column

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        col = F.col(self.column)
        # get_json_object returns null for malformed JSON; json_tuple-style
        # probe on '$' validates the document root.
        parsed = F.get_json_object(col, "$")
        pred = parsed.isNull() & col.isNotNull()
        return [
            ExpressionSpec(
                name="json_parseable",
                issue_type="invalid_json",
                column=self.column,
                count_expr=violation_count(pred),
                non_null_expr=F.count(col),
                filter_expr=pred,
                expected="valid JSON",
            )
        ]


@register_validator("not_match_regex_list", category="string")
class NotMatchRegexListValidator(Validator):
    """No value may match ANY forbidden pattern
    (reference: string/regex_extended.py:312)."""

    def __init__(self, column: str, patterns: list[str]) -> None:
        for p in patterns:
            check_redos(p)
        self.column = column
        self.patterns = patterns

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        col = F.col(self.column)
        hit = F.lit(False)
        for p in self.patterns:
            hit = hit | col.rlike(p)
        pred = hit & col.isNotNull()
        return [
            ExpressionSpec(
                name="not_match_regex_list",
                issue_type="forbidden_pattern_match",
                column=self.column,
                count_expr=violation_count(pred),
                non_null_expr=F.count(col),
                filter_expr=pred,
                expected=f"no match of {len(self.patterns)} forbidden patterns",
            )
        ]


@register_validator("ipv6", category="string")
class Ipv6Validator(_FormatValidator):
    """reference: string/format.py:400"""

    fmt = "ipv6"


@register_validator("alphanumeric", category="string")
class AlphanumericValidator(_FormatValidator):
    """Charset check (reference: string/charset.py:17)."""

    fmt = "alphanumeric"


@register_validator("json_schema", category="string")
class JsonSchemaValidator(Validator):
    """Lightweight JSON-Schema conformance (reference: string/json_schema.py:14):
    required keys present + primitive type checks, evaluated with JVM-side
    get_json_object / from_json — no Python in the row path. Supports the
    common subset: {"required": [...], "properties": {k: {"type": t}}}."""

    _TYPE_CAST = {
        "string": "string",
        "number": "double",
        "integer": "long",
        "boolean": "boolean",
    }

    def __init__(self, column: str, schema: dict) -> None:
        self.column = column
        self.schema = schema

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        col = F.col(self.column)
        ok = F.try_parse_json(col).isNotNull()
        for key in self.schema.get("required", []):
            ok = ok & F.get_json_object(col, f"$.{key}").isNotNull()
        for key, prop in self.schema.get("properties", {}).items():
            t = self._TYPE_CAST.get(prop.get("type"))
            if t is None:
                continue
            raw = F.get_json_object(col, f"$.{key}")
            # present values must cast cleanly to the declared type
            ok = ok & (raw.isNull() | raw.try_cast(t).isNotNull())
        pred = ~ok & col.isNotNull()
        return [
            ExpressionSpec(
                name="json_schema",
                issue_type="json_schema_violation",
                column=self.column,
                count_expr=violation_count(pred),
                non_null_expr=F.count(col),
                filter_expr=pred,
                expected="conforms to JSON schema",
            )
        ]


#: Region-specific phone patterns (reference: string/format.py:279
#: PhoneValidator region patterns).
PHONE_REGION_PATTERNS: dict[str, str] = {
    "US": r"^(\+?1[-.\s]?)?(\([0-9]{3}\)|[0-9]{3})[-.\s]?[0-9]{3}[-.\s]?[0-9]{4}$",
    "KR": r"^0(2|[3-6][1-5]|70|1[016789])-?[0-9]{3,4}-?[0-9]{4}$",
    "JP": r"^0[0-9]{1,4}-?[0-9]{1,4}-?[0-9]{3,4}$",
    "UK": r"^(\+44\s?|0)[0-9]{2,5}[\s-]?[0-9]{3,4}[\s-]?[0-9]{3,4}$",
    "DE": r"^(\+49\s?|0)[0-9]{2,5}[\s/-]?[0-9]{3,8}$",
    "INTL": r"^\+[1-9][0-9]{0,2}[-.\s]?[0-9][0-9\-\s()]{5,17}[0-9]$",
}


@register_validator("phone_region", category="string")
class PhoneRegionValidator(Validator):
    """Region-specific phone format (reference: format.py:279 region
    patterns)."""

    def __init__(self, column: str, region: str = "US") -> None:
        if region not in PHONE_REGION_PATTERNS:
            raise ValueError(
                f"unknown region {region!r}; known: {sorted(PHONE_REGION_PATTERNS)}"
            )
        self.column = column
        self.region = region

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        col = F.col(self.column)
        pred = ~col.rlike(PHONE_REGION_PATTERNS[self.region]) & col.isNotNull()
        return [
            ExpressionSpec(
                name="phone_region",
                issue_type=f"invalid_phone_{self.region.lower()}",
                column=self.column,
                count_expr=violation_count(pred),
                non_null_expr=F.count(col),
                filter_expr=pred,
                expected=f"valid {self.region} phone",
            )
        ]


@register_validator("us_ssn", category="localization")
class UsSsnValidator(Validator):
    """US SSN structure: AAA-GG-SSSS, area not 000/666/9xx, group/serial
    nonzero (reference: localization patterns; scanners.py ssn)."""

    PATTERN = r"^(?!000|666|9[0-9]{2})[0-9]{3}-(?!00)[0-9]{2}-(?!0000)[0-9]{4}$"

    def __init__(self, column: str) -> None:
        self.column = column

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        col = F.col(self.column)
        pred = ~col.rlike(self.PATTERN) & col.isNotNull()
        return [
            ExpressionSpec(
                name="us_ssn",
                issue_type="invalid_ssn",
                column=self.column,
                count_expr=violation_count(pred),
                non_null_expr=F.count(col),
                filter_expr=pred,
                expected="valid SSN (AAA-GG-SSSS)",
            )
        ]


@register_validator("us_zip", category="localization")
class UsZipValidator(Validator):
    """US ZIP / ZIP+4."""

    def __init__(self, column: str) -> None:
        self.column = column

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        col = F.col(self.column)
        pred = ~col.rlike(r"^[0-9]{5}(-[0-9]{4})?$") & col.isNotNull()
        return [
            ExpressionSpec(
                name="us_zip",
                issue_type="invalid_zip",
                column=self.column,
                count_expr=violation_count(pred),
                non_null_expr=F.count(col),
                filter_expr=pred,
                expected="valid ZIP or ZIP+4",
            )
        ]
