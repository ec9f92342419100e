"""Privacy / regulatory-compliance validators (GDPR, CCPA, LGPD, PIPEDA,
APPI, consent, retention).

Reference: src/truthound/validators/privacy/base.py:146-560 (PrivacyValidator,
DataRetentionValidator, ConsentValidator), gdpr.py:372-680, ccpa.py:301-600,
global_patterns.py:368-600.

Spark-first design: the reference samples ``sample_size`` rows to the driver
and regex-matches in Python; here every (column × pattern) pair compiles to
a JVM-side ``rlike`` conditional-sum and ALL pairs for a validator fuse into
ONE ``df.agg`` job — full-data scan distributed across executors, no
sampling round-trip, no Python in the row path. Column-name hints are
driver-side schema reads (free).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from truthound_spark.core.base import STRING_TYPES, ExpressionSpec, Validator, columns_of_type
from truthound_spark.core.registry import register_validator
from truthound_spark.core.results import ValidationIssue
from truthound_spark.types import Severity


@dataclass
class PIIFieldDefinition:
    """One PII pattern for a regulation (reference: privacy/base.py:85-110).

    ``pattern`` is a Spark-compatible (Java) regex matched with rlike;
    ``column_hints`` are substrings matched against column names;
    ``is_special_category`` marks GDPR Art. 9-style sensitive data.
    """

    name: str
    pattern: str | None = None
    column_hints: list[str] = field(default_factory=list)
    category: str = "direct_identifier"
    is_special_category: bool = False
    severity: Severity = Severity.HIGH


# -- Pattern catalogs (public formats; reference: privacy/gdpr.py:20-370,
#    ccpa.py:20-300, global_patterns.py:20-360) -----------------------------
_EMAIL = PIIFieldDefinition(
    "email",
    pattern=r"^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}$",
    column_hints=["email", "e_mail", "mail"],
)
_PHONE_INTL = PIIFieldDefinition(
    "phone",
    pattern=r"^\+?[0-9][0-9\s().-]{6,18}$",
    column_hints=["phone", "mobile", "tel"],
)
_IP = PIIFieldDefinition(
    "ip_address",
    pattern=r"^([0-9]{1,3}\.){3}[0-9]{1,3}$",
    column_hints=["ip", "ip_address", "ipaddr"],
    category="indirect_identifier",
)
_NAME = PIIFieldDefinition(
    "person_name", column_hints=["first_name", "last_name", "full_name", "surname"]
)
_DOB = PIIFieldDefinition(
    "date_of_birth",
    pattern=r"^(19|20)[0-9]{2}[-/](0[1-9]|1[0-2])[-/](0[1-9]|[12][0-9]|3[01])$",
    column_hints=["birth", "dob", "birthdate"],
)
_PASSPORT = PIIFieldDefinition(
    "passport",
    pattern=r"^[A-Z]{1,2}[0-9]{6,8}$",
    column_hints=["passport"],
)
_CREDIT_CARD = PIIFieldDefinition(
    "credit_card",
    pattern=r"^[0-9]{4}[\s-]?[0-9]{4}[\s-]?[0-9]{4}[\s-]?[0-9]{4}$",
    column_hints=["card", "credit_card", "cc_number", "pan"],
    category="financial",
)
_SSN_US = PIIFieldDefinition(
    "us_ssn",
    pattern=r"^[0-9]{3}-[0-9]{2}-[0-9]{4}$",
    column_hints=["ssn", "social_security"],
)
_HEALTH = PIIFieldDefinition(
    "health_data",
    column_hints=["diagnosis", "medical", "health", "icd", "prescription", "blood_type"],
    category="special_category",
    is_special_category=True,
    severity=Severity.CRITICAL,
)
_RELIGION = PIIFieldDefinition(
    "religion",
    column_hints=["religion", "religious"],
    category="special_category",
    is_special_category=True,
    severity=Severity.CRITICAL,
)
_ETHNICITY = PIIFieldDefinition(
    "ethnicity",
    column_hints=["ethnicity", "ethnic", "race", "racial"],
    category="special_category",
    is_special_category=True,
    severity=Severity.CRITICAL,
)
_POLITICAL = PIIFieldDefinition(
    "political_opinion",
    column_hints=["political", "party_affiliation"],
    category="special_category",
    is_special_category=True,
    severity=Severity.CRITICAL,
)
_SEXUAL = PIIFieldDefinition(
    "sexual_orientation",
    column_hints=["sexual_orientation", "sexuality"],
    category="special_category",
    is_special_category=True,
    severity=Severity.CRITICAL,
)
_BIOMETRIC = PIIFieldDefinition(
    "biometric",
    column_hints=["fingerprint", "biometric", "face_id", "iris_scan"],
    category="special_category",
    is_special_category=True,
    severity=Severity.CRITICAL,
)
_GEOLOCATION = PIIFieldDefinition(
    "geolocation",
    column_hints=["latitude", "longitude", "geo", "gps", "precise_location"],
    category="indirect_identifier",
    severity=Severity.MEDIUM,
)
_DEVICE = PIIFieldDefinition(
    "device_id",
    column_hints=["device_id", "imei", "mac_address", "advertising_id", "cookie"],
    category="indirect_identifier",
    severity=Severity.MEDIUM,
)
# Brazil (LGPD) — reference global_patterns.py:30-80
_CPF = PIIFieldDefinition(
    "cpf",
    pattern=r"^[0-9]{3}\.?[0-9]{3}\.?[0-9]{3}-?[0-9]{2}$",
    column_hints=["cpf", "cadastro_pessoa"],
)
_CNPJ = PIIFieldDefinition(
    "cnpj",
    pattern=r"^[0-9]{2}\.?[0-9]{3}\.?[0-9]{3}/?[0-9]{4}-?[0-9]{2}$",
    column_hints=["cnpj"],
    category="business_identifier",
    severity=Severity.MEDIUM,
)
# Canada (PIPEDA) — reference global_patterns.py:85-130
_SIN = PIIFieldDefinition(
    "sin",
    pattern=r"^[0-9]{3}[\s-]?[0-9]{3}[\s-]?[0-9]{3}$",
    column_hints=["sin", "social_insurance"],
)
# Japan (APPI) — reference global_patterns.py:140-190
_MYNUMBER = PIIFieldDefinition(
    "my_number",
    pattern=r"^[0-9]{12}$",
    column_hints=["my_number", "mynumber", "kojin_bango", "individual_number"],
)

GDPR_PII_DEFINITIONS = [
    _EMAIL, _PHONE_INTL, _IP, _NAME, _DOB, _PASSPORT, _CREDIT_CARD,
    _HEALTH, _RELIGION, _ETHNICITY, _POLITICAL, _SEXUAL, _BIOMETRIC,
    _GEOLOCATION, _DEVICE,
]
GDPR_SPECIAL_CATEGORIES = [
    _HEALTH, _RELIGION, _ETHNICITY, _POLITICAL, _SEXUAL, _BIOMETRIC,
]
CCPA_PII_DEFINITIONS = [
    _EMAIL, _PHONE_INTL, _IP, _NAME, _SSN_US, _CREDIT_CARD,
    _GEOLOCATION, _DEVICE, _BIOMETRIC, _HEALTH,
]
CCPA_SENSITIVE = [_SSN_US, _CREDIT_CARD, _GEOLOCATION, _BIOMETRIC, _HEALTH, _ETHNICITY]
LGPD_PII_DEFINITIONS = [_EMAIL, _PHONE_INTL, _NAME, _CPF, _CNPJ, _HEALTH, _ETHNICITY]
PIPEDA_PII_DEFINITIONS = [_EMAIL, _PHONE_INTL, _NAME, _SIN, _CREDIT_CARD, _HEALTH]
APPI_PII_DEFINITIONS = [_EMAIL, _PHONE_INTL, _NAME, _MYNUMBER, _HEALTH]
GLOBAL_PII_DEFINITIONS = [
    _EMAIL, _PHONE_INTL, _IP, _NAME, _DOB, _PASSPORT, _CREDIT_CARD,
    _SSN_US, _CPF, _CNPJ, _SIN, _MYNUMBER,
] + GDPR_SPECIAL_CATEGORIES


class PrivacyValidator(Validator):
    """Base: detect regulation-specific PII via fused rlike aggregates +
    column-name hints (reference: privacy/base.py:146-415).

    ``min_match_ratio`` gates pattern findings (hint-only findings always
    reported, as the reference's column-name path does).
    """

    category = "privacy"
    regulation = "GDPR"
    issue_prefix = "gdpr"

    def __init__(
        self,
        columns: list[str] | None = None,
        min_match_ratio: float = 0.1,
        detect_special_categories: bool = True,
    ) -> None:
        self.columns = columns
        self.min_match_ratio = min_match_ratio
        self.detect_special_categories = detect_special_categories

    def get_pii_definitions(self) -> list[PIIFieldDefinition]:
        return GDPR_PII_DEFINITIONS

    def _defs(self) -> list[PIIFieldDefinition]:
        return [
            d
            for d in self.get_pii_definitions()
            if self.detect_special_categories or not d.is_special_category
        ]

    def _hint_findings(
        self, df: DataFrame, defs: list[PIIFieldDefinition]
    ) -> list[tuple[str, PIIFieldDefinition]]:
        cols = self.columns or df.columns
        out = []
        for c in cols:
            cl = c.lower()
            for d in defs:
                if any(h in cl for h in d.column_hints):
                    out.append((c, d))
                    break
        return out

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        defs = self._defs()
        string_cols = self.columns or columns_of_type(df, STRING_TYPES)
        string_cols = [c for c in string_cols if c in df.columns]
        hints = dict(self._hint_findings(df, defs))
        pattern_defs = [d for d in defs if d.pattern]
        min_ratio = self.min_match_ratio
        prefix = self.issue_prefix
        regulation = self.regulation

        specs: list[ExpressionSpec] = []
        # One spec per column: extra aggregates carry per-pattern match
        # counts; all columns' specs fuse into one df.agg with the rest of
        # the suite.
        for c in string_cols:
            extras = {"nn": F.count(F.col(c))}
            for d in pattern_defs:
                extras[d.name] = F.sum(
                    F.when(F.col(c).rlike(d.pattern), 1).otherwise(0)
                )
            hinted = hints.get(c)

            def judge(
                m: dict[str, Any],
                _c=c,
                _hinted=hinted,
                _pattern_defs=pattern_defs,
            ) -> tuple[bool, Any, str]:
                nn = m.get("nn") or 0
                found: list[str] = []
                for d in _pattern_defs:
                    cnt = int(m.get(d.name) or 0)
                    ratio = cnt / nn if nn else 0.0
                    if cnt and ratio >= min_ratio:
                        found.append(f"{d.name}({ratio:.0%})")
                if _hinted is not None and _hinted.name not in [
                    f.split("(")[0] for f in found
                ]:
                    found.append(f"{_hinted.name}(column-name)")
                if not found:
                    return True, None, ""
                return (
                    False,
                    found,
                    f"{regulation}: column '{_c}' appears to contain {', '.join(found)}",
                )

            specs.append(
                ExpressionSpec(
                    name=self.name,
                    issue_type=f"{prefix}_pii_detected",
                    column=c,
                    extra_exprs=extras,
                    expected=f"no unprotected {regulation} personal data",
                    judge=judge,
                    fixed_severity=Severity.HIGH,
                )
            )
        # Hint-only findings on non-string columns (e.g. latitude double).
        for c, d in hints.items():
            if c in string_cols:
                continue
            specs.append(
                ExpressionSpec(
                    name=self.name,
                    issue_type=f"{prefix}_pii_detected",
                    column=c,
                    extra_exprs={"one": F.lit(1)},
                    expected=f"no unprotected {regulation} personal data",
                    judge=lambda m, _c=c, _d=d: (
                        False,
                        [f"{_d.name}(column-name)"],
                        f"{regulation}: column '{_c}' name suggests {_d.name}",
                    ),
                    fixed_severity=d.severity,
                )
            )
        return specs


@register_validator("gdpr_compliance", category="privacy")
class GDPRComplianceValidator(PrivacyValidator):
    """GDPR Art. 4 personal-data detection (reference: privacy/gdpr.py:372-430)."""

    name = "gdpr_compliance"
    regulation = "GDPR"
    issue_prefix = "gdpr"

    def get_pii_definitions(self) -> list[PIIFieldDefinition]:
        return GDPR_PII_DEFINITIONS


@register_validator("gdpr_special_category", category="privacy")
class GDPRSpecialCategoryValidator(PrivacyValidator):
    """GDPR Art. 9 special categories (reference: privacy/gdpr.py:433-506)."""

    name = "gdpr_special_category"
    regulation = "GDPR"
    issue_prefix = "gdpr_special"

    def __init__(self, check_column_names_only: bool = False, **kw: Any) -> None:
        super().__init__(**kw)
        self.check_column_names_only = check_column_names_only

    def get_pii_definitions(self) -> list[PIIFieldDefinition]:
        return GDPR_SPECIAL_CATEGORIES

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        if not self.check_column_names_only:
            return super().specs(df)
        # Name-only path: zero Spark jobs.
        return []

    def validate(self, df: DataFrame, row_count: int | None = None) -> list[ValidationIssue]:
        if not self.check_column_names_only:
            return super().validate(df, row_count)
        return [
            ValidationIssue(
                column=c,
                issue_type="gdpr_special_pii_detected",
                count=1,
                severity=d.severity,
                validator_name=self.name,
                expected="no GDPR Art. 9 special-category columns",
                actual=d.name,
                details=f"GDPR: column '{c}' name suggests {d.name}",
            )
            for c, d in self._hint_findings(df, self._defs())
        ]


@register_validator("gdpr_data_minimization", category="privacy")
class GDPRDataMinimizationValidator(PrivacyValidator):
    """GDPR Art. 5(1)(c): flag mostly-null PII columns and PII sprawl
    (reference: privacy/gdpr.py:509-609). One fused null-count agg."""

    name = "gdpr_data_minimization"

    def __init__(
        self, max_null_ratio: float = 0.95, max_pii_columns: int = 10, **kw: Any
    ) -> None:
        super().__init__(**kw)
        self.max_null_ratio = max_null_ratio
        self.max_pii_columns = max_pii_columns

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        hints = self._hint_findings(df, self.get_pii_definitions())
        pii_cols = [c for c, _ in hints]
        max_nr, max_pc = self.max_null_ratio, self.max_pii_columns
        specs: list[ExpressionSpec] = []
        for c in pii_cols:
            specs.append(
                ExpressionSpec(
                    name=self.name,
                    issue_type="gdpr_unnecessary_pii_column",
                    column=c,
                    extra_exprs={
                        "n": F.count(F.lit(1)),
                        "nulls": F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)),
                    },
                    expected=f"null ratio <= {max_nr} for PII columns",
                    judge=lambda m, _c=c: (
                        ((m.get("nulls") or 0) / m["n"] if m.get("n") else 0.0) <= max_nr,
                        round((m.get("nulls") or 0) / m["n"], 4) if m.get("n") else 0.0,
                        f"PII column '{_c}' is "
                        f"{(m.get('nulls') or 0) / m['n']:.0%} null — likely unnecessary"
                        if m.get("n")
                        else "empty table",
                    ),
                    fixed_severity=Severity.MEDIUM,
                )
            )
        if len(pii_cols) > max_pc:
            specs.append(
                ExpressionSpec(
                    name=self.name,
                    issue_type="gdpr_pii_sprawl",
                    column=",".join(pii_cols),
                    extra_exprs={"one": F.lit(1)},
                    expected=f"<= {max_pc} PII columns",
                    judge=lambda m: (
                        False,
                        len(pii_cols),
                        f"{len(pii_cols)} PII columns exceeds minimization "
                        f"threshold {max_pc}",
                    ),
                    fixed_severity=Severity.MEDIUM,
                )
            )
        return specs


@register_validator("gdpr_right_to_erasure", category="privacy")
class GDPRRightToErasureValidator(PrivacyValidator):
    """GDPR Art. 17: records marked deleted must not retain PII
    (reference: privacy/gdpr.py:612-680). Fused conditional-sum agg."""

    name = "gdpr_right_to_erasure"

    def __init__(
        self,
        deletion_flag_column: str | None = None,
        deleted_values: list[str] | None = None,
        **kw: Any,
    ) -> None:
        super().__init__(**kw)
        self.deletion_flag_column = deletion_flag_column
        self.deleted_values = [
            v.lower() for v in (deleted_values or ["deleted", "erased", "true", "1", "yes", "removed"])
        ]

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        if not self.deletion_flag_column:
            return []
        flag_col = self.deletion_flag_column
        if flag_col not in df.columns:
            return [
                ExpressionSpec(
                    name=self.name,
                    issue_type="gdpr_erasure_flag_missing",
                    column=flag_col,
                    extra_exprs={"one": F.lit(1)},
                    expected=f"deletion flag column '{flag_col}' present",
                    judge=lambda m: (
                        False,
                        None,
                        f"Deletion flag column '{flag_col}' not found — GDPR "
                        "Art. 17 requires erasure support",
                    ),
                    fixed_severity=Severity.HIGH,
                )
            ]
        pii_cols = [
            c
            for c, _ in self._hint_findings(df, self.get_pii_definitions())
            if c != flag_col
        ]
        is_deleted = F.lower(F.col(flag_col).cast("string")).isin(self.deleted_values)
        retains_pii = F.lit(False)
        for c in pii_cols:
            retains_pii = retains_pii | F.col(c).isNotNull()
        pred = is_deleted & retains_pii
        return [
            ExpressionSpec(
                name=self.name,
                issue_type="gdpr_erasure_pii_retained",
                column=",".join(pii_cols) or None,
                count_expr=F.sum(F.when(pred, 1).otherwise(0)),
                non_null_expr=F.count(F.lit(1)),
                filter_expr=pred,
                expected="records marked deleted contain no PII",
                fixed_severity=Severity.CRITICAL,
            )
        ]


@register_validator("ccpa_compliance", category="privacy")
class CCPAComplianceValidator(PrivacyValidator):
    """CCPA personal-information detection (reference: privacy/ccpa.py:301-356)."""

    name = "ccpa_compliance"
    regulation = "CCPA"
    issue_prefix = "ccpa"

    def get_pii_definitions(self) -> list[PIIFieldDefinition]:
        return CCPA_PII_DEFINITIONS


@register_validator("ccpa_sensitive_info", category="privacy")
class CCPASensitiveInfoValidator(PrivacyValidator):
    """CCPA §1798.121 sensitive personal information
    (reference: privacy/ccpa.py:359-417)."""

    name = "ccpa_sensitive_info"
    regulation = "CCPA"
    issue_prefix = "ccpa_sensitive"

    def get_pii_definitions(self) -> list[PIIFieldDefinition]:
        return CCPA_SENSITIVE


@register_validator("ccpa_do_not_sell", category="privacy")
class CCPADoNotSellValidator(PrivacyValidator):
    """CCPA §1798.120 opt-out support (reference: privacy/ccpa.py:420-538):
    flags a missing opt-out column, sharing-indicator columns, and rows
    with PI but null opt-out status."""

    name = "ccpa_do_not_sell"
    regulation = "CCPA"

    def __init__(
        self,
        optout_column: str | None = None,
        opted_out_values: list[str] | None = None,
        sharing_indicator_columns: list[str] | None = None,
        **kw: Any,
    ) -> None:
        super().__init__(**kw)
        self.optout_column = optout_column
        self.opted_out_values = opted_out_values or [
            "true", "1", "yes", "opted_out", "do_not_sell"
        ]
        self.sharing_indicator_columns = sharing_indicator_columns or [
            "shared_with", "third_party", "partner", "sold_to", "disclosed_to"
        ]

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        specs: list[ExpressionSpec] = []
        sharing_present = [
            c
            for c in df.columns
            if any(ind in c.lower() for ind in self.sharing_indicator_columns)
        ]
        if sharing_present:
            specs.append(
                ExpressionSpec(
                    name=self.name,
                    issue_type="ccpa_sharing_indicators",
                    column=",".join(sharing_present),
                    extra_exprs={"one": F.lit(1)},
                    expected="no data-sharing indicator columns without opt-out tracking",
                    judge=lambda m: (
                        self.optout_column is not None,
                        sharing_present,
                        f"Sharing indicator columns {sharing_present} present "
                        "without an opt-out tracking column",
                    ),
                    fixed_severity=Severity.HIGH,
                )
            )
        if self.optout_column and self.optout_column in df.columns:
            pii_cols = [
                c
                for c, _ in self._hint_findings(df, CCPA_PII_DEFINITIONS)
                if c != self.optout_column
            ]
            has_pi = F.lit(False)
            for c in pii_cols:
                has_pi = has_pi | F.col(c).isNotNull()
            pred = has_pi & F.col(self.optout_column).isNull()
            specs.append(
                ExpressionSpec(
                    name=self.name,
                    issue_type="ccpa_missing_optout_status",
                    column=self.optout_column,
                    count_expr=F.sum(F.when(pred, 1).otherwise(0)),
                    non_null_expr=F.count(F.lit(1)),
                    filter_expr=pred,
                    expected="every row with PI has an opt-out status",
                    fixed_severity=Severity.HIGH,
                )
            )
        elif self.optout_column:
            specs.append(
                ExpressionSpec(
                    name=self.name,
                    issue_type="ccpa_optout_column_missing",
                    column=self.optout_column,
                    extra_exprs={"one": F.lit(1)},
                    expected=f"opt-out column '{self.optout_column}' present",
                    judge=lambda m: (
                        False,
                        None,
                        f"Opt-out column '{self.optout_column}' not found",
                    ),
                    fixed_severity=Severity.HIGH,
                )
            )
        return specs


@register_validator("ccpa_consumer_rights", category="privacy")
class CCPAConsumerRightsValidator(PrivacyValidator):
    """CCPA §1798.100-110 consumer-rights support columns
    (reference: privacy/ccpa.py:541-600): checks request-tracking columns
    exist when PI is present. Schema-only — zero Spark jobs."""

    name = "ccpa_consumer_rights"
    regulation = "CCPA"

    def __init__(self, request_columns: list[str] | None = None, **kw: Any) -> None:
        super().__init__(**kw)
        self.request_columns = request_columns or [
            "access_request", "deletion_request", "optout_request"
        ]

    def get_pii_definitions(self) -> list[PIIFieldDefinition]:
        return CCPA_PII_DEFINITIONS

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        return []

    def validate(self, df: DataFrame, row_count: int | None = None) -> list[ValidationIssue]:
        has_pi = bool(self._hint_findings(df, CCPA_PII_DEFINITIONS))
        if not has_pi:
            return []
        missing = [
            want
            for want in self.request_columns
            if not any(want in c.lower() for c in df.columns)
        ]
        if not missing:
            return []
        return [
            ValidationIssue(
                column=",".join(missing),
                issue_type="ccpa_rights_tracking_missing",
                count=len(missing),
                severity=Severity.MEDIUM,
                validator_name=self.name,
                expected=f"request-tracking columns {self.request_columns}",
                actual=missing,
                details=(
                    "Table contains personal information but lacks consumer-"
                    f"rights tracking columns: {missing}"
                ),
            )
        ]


@register_validator("lgpd_compliance", category="privacy")
class LGPDComplianceValidator(PrivacyValidator):
    """Brazil LGPD detection incl. CPF/CNPJ
    (reference: privacy/global_patterns.py:480-520)."""

    name = "lgpd_compliance"
    regulation = "LGPD"
    issue_prefix = "lgpd"

    def get_pii_definitions(self) -> list[PIIFieldDefinition]:
        return LGPD_PII_DEFINITIONS


@register_validator("pipeda_compliance", category="privacy")
class PIPEDAComplianceValidator(PrivacyValidator):
    """Canada PIPEDA detection incl. SIN
    (reference: privacy/global_patterns.py:523-562)."""

    name = "pipeda_compliance"
    regulation = "PIPEDA"
    issue_prefix = "pipeda"

    def get_pii_definitions(self) -> list[PIIFieldDefinition]:
        return PIPEDA_PII_DEFINITIONS


@register_validator("appi_compliance", category="privacy")
class APPIComplianceValidator(PrivacyValidator):
    """Japan APPI detection incl. My Number
    (reference: privacy/global_patterns.py:565-600)."""

    name = "appi_compliance"
    regulation = "APPI"
    issue_prefix = "appi"

    def get_pii_definitions(self) -> list[PIIFieldDefinition]:
        return APPI_PII_DEFINITIONS


@register_validator("global_privacy", category="privacy")
class GlobalPrivacyValidator(PrivacyValidator):
    """All-regulation PII sweep (reference: privacy/global_patterns.py:368-477)."""

    name = "global_privacy"
    regulation = "GLOBAL"
    issue_prefix = "global"

    def get_pii_definitions(self) -> list[PIIFieldDefinition]:
        return GLOBAL_PII_DEFINITIONS


@register_validator("data_retention", category="privacy")
class DataRetentionValidator(PrivacyValidator):
    """GDPR Art. 5(1)(e): PII rows older than retention_days
    (reference: privacy/base.py:417-523). One fused conditional-sum agg."""

    name = "data_retention"

    def __init__(
        self,
        date_column: str,
        retention_days: int,
        pii_columns: list[str] | None = None,
        reference_time: Any = None,
        **kw: Any,
    ) -> None:
        super().__init__(**kw)
        self.date_column = date_column
        self.retention_days = retention_days
        self.pii_columns = pii_columns
        self.reference_time = reference_time

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        ref = (
            F.lit(self.reference_time).cast("timestamp")
            if self.reference_time is not None
            else F.current_timestamp()
        )
        cutoff = ref - F.expr(f"INTERVAL {self.retention_days} DAYS")
        expired = F.col(self.date_column).cast("timestamp") < cutoff
        pii_cols = self.pii_columns or [
            c for c, _ in self._hint_findings(df, GLOBAL_PII_DEFINITIONS)
        ]
        if pii_cols:
            has_pii = F.lit(False)
            for c in pii_cols:
                has_pii = has_pii | F.col(c).isNotNull()
            pred = expired & has_pii
        else:
            pred = expired
        return [
            ExpressionSpec(
                name=self.name,
                issue_type="retention_period_exceeded",
                column=self.date_column,
                count_expr=F.sum(F.when(pred, 1).otherwise(0)),
                non_null_expr=F.count(F.lit(1)),
                filter_expr=pred,
                expected=f"no PII retained beyond {self.retention_days} days",
                fixed_severity=Severity.HIGH,
            )
        ]


@register_validator("consent_tracking", category="privacy")
class ConsentValidator(PrivacyValidator):
    """GDPR Art. 7 consent tracking: rows with PII must carry valid consent
    (reference: privacy/base.py:526-560). One fused conditional-sum agg."""

    name = "consent_tracking"

    def __init__(
        self,
        consent_column: str,
        pii_columns: list[str],
        valid_consent_values: list[str] | None = None,
        require_explicit: bool = True,
        **kw: Any,
    ) -> None:
        super().__init__(**kw)
        self.consent_column = consent_column
        self.pii_columns = pii_columns
        self.valid_consent_values = [
            v.lower()
            for v in (
                valid_consent_values
                or ["yes", "true", "1", "explicit", "granted", "accepted"]
            )
        ]
        self.require_explicit = require_explicit

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        if self.consent_column not in df.columns:
            return [
                ExpressionSpec(
                    name=self.name,
                    issue_type="consent_column_missing",
                    column=self.consent_column,
                    extra_exprs={"one": F.lit(1)},
                    expected=f"consent column '{self.consent_column}' present",
                    judge=lambda m: (
                        False,
                        None,
                        f"Consent column '{self.consent_column}' not found — "
                        "GDPR Art. 7 requires consent records",
                    ),
                    fixed_severity=Severity.CRITICAL,
                )
            ]
        has_pii = F.lit(False)
        for c in self.pii_columns:
            if c in df.columns:
                has_pii = has_pii | F.col(c).isNotNull()
        consent = F.lower(F.col(self.consent_column).cast("string"))
        valid = consent.isin(self.valid_consent_values)
        pred = has_pii & (F.col(self.consent_column).isNull() | ~valid)
        return [
            ExpressionSpec(
                name=self.name,
                issue_type="consent_missing_or_invalid",
                column=self.consent_column,
                count_expr=F.sum(F.when(pred, 1).otherwise(0)),
                non_null_expr=F.count(F.lit(1)),
                filter_expr=pred,
                expected="valid consent for every row containing PII",
                fixed_severity=Severity.HIGH,
            )
        ]


# ---------------------------------------------------------------------------
# Plugin-based privacy validation (reference: privacy/plugins.py:260-340 —
# PII definitions come from a pluggable regulation object, not hardcoded
# catalogs, so users can ship e.g. a HIPAA plugin without forking)
# ---------------------------------------------------------------------------


@dataclass
class PrivacyRegulationPlugin:
    """A pluggable regulation: code + display name + PII definitions
    (reference: privacy/plugins.py PrivacyRegulationPlugin protocol)."""

    code: str
    regulation: str
    definitions: list[PIIFieldDefinition]
    issue_prefix: str | None = None

    def __post_init__(self) -> None:
        if self.issue_prefix is None:
            self.issue_prefix = self.code


_PRIVACY_PLUGINS: dict[str, PrivacyRegulationPlugin] = {}


def register_privacy_plugin(plugin: PrivacyRegulationPlugin) -> None:
    """Register (or override) a regulation plugin under its code."""
    _PRIVACY_PLUGINS[plugin.code] = plugin


def get_privacy_plugin(code: str) -> PrivacyRegulationPlugin:
    if code not in _PRIVACY_PLUGINS:
        raise KeyError(
            f"unknown privacy regulation {code!r}; known: {sorted(_PRIVACY_PLUGINS)}"
        )
    return _PRIVACY_PLUGINS[code]


def list_privacy_plugins() -> list[str]:
    return sorted(_PRIVACY_PLUGINS)


for _code, _reg, _defs in [
    ("gdpr", "GDPR", GDPR_PII_DEFINITIONS),
    ("ccpa", "CCPA", CCPA_PII_DEFINITIONS),
    ("lgpd", "LGPD", LGPD_PII_DEFINITIONS),
    ("pipeda", "PIPEDA", PIPEDA_PII_DEFINITIONS),
    ("appi", "APPI", APPI_PII_DEFINITIONS),
    ("global", "Global", GLOBAL_PII_DEFINITIONS),
]:
    register_privacy_plugin(PrivacyRegulationPlugin(_code, _reg, list(_defs)))


@register_validator("plugin_based_privacy", category="privacy")
class PluginBasedPrivacyValidator(PrivacyValidator):
    """PII scan driven by a regulation plugin (reference:
    privacy/plugins.py:260 PluginBasedValidator).

    >>> v = PluginBasedPrivacyValidator(regulation_code="gdpr")
    >>> v = PluginBasedPrivacyValidator(plugin=my_hipaa_plugin)
    """

    name = "plugin_based_privacy"

    def __init__(
        self,
        plugin: PrivacyRegulationPlugin | None = None,
        regulation_code: str | None = None,
        **kwargs: Any,
    ) -> None:
        if plugin is None and regulation_code is None:
            raise ValueError("provide either plugin or regulation_code")
        self._plugin = plugin or get_privacy_plugin(regulation_code)
        self.regulation = self._plugin.regulation
        self.issue_prefix = self._plugin.issue_prefix
        super().__init__(**kwargs)

    def get_pii_definitions(self) -> list[PIIFieldDefinition]:
        return list(self._plugin.definitions)
