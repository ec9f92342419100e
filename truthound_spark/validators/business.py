"""Business-rule / checksum validators (reference:
src/truthound/validators/business_rule/{checksum,financial}.py,
localization/*.py).

Digit-algorithm checks (Luhn mod-10, IBAN mod-97) are implemented as pure
Spark SQL expression chains — JVM-side, codegen'd, no Python UDF in the hot
path. The aggregate/transform higher-order functions carry the per-digit
state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from truthound_spark.core.base import ExpressionSpec, Validator, violation_count
from truthound_spark.core.registry import register_validator


def luhn_valid(col: Column) -> Column:
    """Luhn mod-10 checksum as a pure column expression
    (reference algorithm: business_rule/checksum.py:19).

    Digits-only input assumed; reverse the string, double every 2nd digit,
    subtract 9 when >9, sum % 10 == 0.
    """
    digits = F.expr(
        """
        aggregate(
          zip_with(
            split(reverse(regexp_replace({c}, '[^0-9]', '')), ''),
            sequence(0, length(regexp_replace({c}, '[^0-9]', '')) - 1),
            (d, i) -> struct(d as d, i as i)
          ),
          0L,
          (acc, x) -> acc + CASE
              WHEN x.d = '' THEN 0L
              WHEN x.i % 2 = 1 THEN
                CASE WHEN cast(x.d as int) * 2 > 9
                     THEN cast(x.d as int) * 2 - 9
                     ELSE cast(x.d as int) * 2 END
              ELSE cast(x.d as int) END
        )
        """.replace("{c}", col._jc.toString() if hasattr(col, "_jc") else str(col))
    )
    return (digits % 10) == 0


def _luhn_expr(colname: str) -> Column:
    """Luhn checksum over a named column (SQL-expression form)."""
    cleaned = f"regexp_replace({colname}, '[^0-9]', '')"
    return F.expr(
        f"""
        aggregate(
          zip_with(
            filter(split(reverse({cleaned}), ''), d -> d != ''),
            sequence(0, greatest(length({cleaned}) - 1, 0)),
            (d, i) -> CASE
              WHEN d IS NULL THEN 0
              WHEN i % 2 = 1 THEN
                CASE WHEN cast(d as int) * 2 > 9 THEN cast(d as int) * 2 - 9
                     ELSE cast(d as int) * 2 END
              ELSE cast(d as int) END
          ),
          0,
          (acc, x) -> acc + coalesce(x, 0)
        ) % 10 = 0 AND length({cleaned}) >= 8
        """
    )


@register_validator("luhn", category="business_rule")
class LuhnValidator(Validator):
    """Luhn mod-10 (credit cards, IMEI) — reference: checksum.py:19."""

    def __init__(self, column: str) -> None:
        self.column = column

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        valid = _luhn_expr(self.column)
        pred = ~valid & F.col(self.column).isNotNull()
        return [
            ExpressionSpec(
                name="luhn",
                issue_type="invalid_checksum",
                column=self.column,
                count_expr=violation_count(pred),
                non_null_expr=F.count(F.col(self.column)),
                filter_expr=pred,
                expected="valid Luhn checksum",
            )
        ]


@register_validator("credit_card", category="business_rule")
class CreditCardValidator(Validator):
    """Brand-pattern + Luhn (reference: checksum.py:340)."""

    BRAND_PATTERNS = {
        "visa": r"^4[0-9]{12}(?:[0-9]{3})?$",
        "mastercard": r"^5[1-5][0-9]{14}$",
        "amex": r"^3[47][0-9]{13}$",
        "discover": r"^6(?:011|5[0-9]{2})[0-9]{12}$",
    }

    def __init__(self, column: str) -> None:
        self.column = column

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        col = F.col(self.column)
        cleaned = F.regexp_replace(col, "[^0-9]", "")
        brand_ok = F.lit(False)
        for pat in self.BRAND_PATTERNS.values():
            brand_ok = brand_ok | cleaned.rlike(pat)
        pred = (~brand_ok | ~_luhn_expr(self.column)) & col.isNotNull()
        return [
            ExpressionSpec(
                name="credit_card",
                issue_type="invalid_credit_card",
                column=self.column,
                count_expr=violation_count(pred),
                non_null_expr=F.count(col),
                filter_expr=pred,
                expected="known brand + valid Luhn",
            )
        ]


@register_validator("isbn", category="business_rule")
class IsbnValidator(Validator):
    """ISBN-13 check digit (reference: checksum.py:162): Σ digit·(1,3,...) % 10 == 0."""

    def __init__(self, column: str) -> None:
        self.column = column

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        cleaned = f"regexp_replace({self.column}, '[^0-9]', '')"
        valid = F.expr(
            f"""
            length({cleaned}) = 13 AND
            aggregate(
              zip_with(
                filter(split({cleaned}, ''), d -> d != ''),
                sequence(0, 12),
                (d, i) -> cast(d as int) * CASE WHEN i % 2 = 0 THEN 1 ELSE 3 END
              ),
              0, (acc, x) -> acc + coalesce(x, 0)
            ) % 10 = 0
            """
        )
        pred = ~valid & F.col(self.column).isNotNull()
        return [
            ExpressionSpec(
                name="isbn",
                issue_type="invalid_isbn",
                column=self.column,
                count_expr=violation_count(pred),
                non_null_expr=F.count(F.col(self.column)),
                filter_expr=pred,
                expected="valid ISBN-13",
            )
        ]


@register_validator("iban", category="business_rule")
class IbanValidator(Validator):
    """IBAN mod-97 == 1 (reference: business_rule/financial.py:19).

    The rearranged IBAN's letters map to numbers (A=10..Z=35); the mod-97 of
    the (potentially 38-digit) number is computed incrementally with
    aggregate() to stay in long range — still pure SQL expressions.
    """

    def __init__(self, column: str) -> None:
        self.column = column

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        c = self.column
        # rearrange: body = substr(5..) || substr(1,4); map chars to digit strings
        rearranged = (
            f"concat(upper(substring(regexp_replace({c}, '\\\\s', ''), 5)), "
            f"upper(substring(regexp_replace({c}, '\\\\s', ''), 1, 4)))"
        )
        valid = F.expr(
            f"""
            length(regexp_replace({c}, '\\\\s', '')) BETWEEN 15 AND 34 AND
            {c} rlike '^[A-Za-z]{{2}}[0-9]{{2}}[A-Za-z0-9 ]+$' AND
            aggregate(
              filter(split({rearranged}, ''), ch -> ch != ''),
              0L,
              (acc, ch) -> CASE
                WHEN ch rlike '[0-9]' THEN (acc * 10 + cast(ch as long)) % 97
                WHEN ch rlike '[A-Z]' THEN (acc * 100 + (ascii(ch) - 55)) % 97
                ELSE acc END
            ) = 1
            """
        )
        pred = ~valid & F.col(c).isNotNull()
        return [
            ExpressionSpec(
                name="iban",
                issue_type="invalid_iban",
                column=c,
                count_expr=violation_count(pred),
                non_null_expr=F.count(F.col(c)),
                filter_expr=pred,
                expected="valid IBAN (mod-97)",
            )
        ]


@register_validator("korean_rrn", category="localization")
class KoreanRRNValidator(Validator):
    """Korean resident registration number: format + weighted checksum
    (reference: localization/korean.py:98)."""

    def __init__(self, column: str) -> None:
        self.column = column

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        c = self.column
        cleaned = f"regexp_replace({c}, '-', '')"
        # weights 2,3,4,5,6,7,8,9,2,3,4,5 over first 12 digits;
        # check digit = (11 - (sum % 11)) % 10
        valid = F.expr(
            f"""
            {c} rlike '^[0-9]{{6}}-?[1-8][0-9]{{6}}$' AND
            (11 - aggregate(
              zip_with(
                filter(split(substring({cleaned}, 1, 12), ''), d -> d != ''),
                array(2,3,4,5,6,7,8,9,2,3,4,5),
                (d, w) -> cast(d as int) * w
              ),
              0, (acc, x) -> acc + coalesce(x, 0)
            ) % 11) % 10 = cast(substring({cleaned}, 13, 1) as int)
            """
        )
        pred = ~valid & F.col(c).isNotNull()
        return [
            ExpressionSpec(
                name="korean_rrn",
                issue_type="invalid_korean_rrn",
                column=c,
                count_expr=violation_count(pred),
                non_null_expr=F.count(F.col(c)),
                filter_expr=pred,
                expected="valid Korean RRN",
            )
        ]


@register_validator("korean_phone", category="localization")
class KoreanPhoneValidator(Validator):
    """Korean phone format (reference: localization/korean.py:250)."""

    def __init__(self, column: str) -> None:
        self.column = column

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        col = F.col(self.column)
        pred = ~col.rlike(r"^0(2|[3-6][1-5]|70|1[016789])-?[0-9]{3,4}-?[0-9]{4}$") & col.isNotNull()
        return [
            ExpressionSpec(
                name="korean_phone",
                issue_type="invalid_korean_phone",
                column=self.column,
                count_expr=violation_count(pred),
                non_null_expr=F.count(col),
                filter_expr=pred,
                expected="valid Korean phone number",
            )
        ]


@register_validator("vat", category="business_rule")
class VatValidator(Validator):
    """EU VAT number structure (reference: business_rule/financial.py:189):
    2-letter country code + country-specific digit pattern."""

    PATTERNS = {
        "DE": r"^DE[0-9]{9}$",
        "FR": r"^FR[A-Z0-9]{2}[0-9]{9}$",
        "GB": r"^GB([0-9]{9}|[0-9]{12})$",
        "NL": r"^NL[0-9]{9}B[0-9]{2}$",
        "IT": r"^IT[0-9]{11}$",
        "ES": r"^ES[A-Z0-9][0-9]{7}[A-Z0-9]$",
    }

    def __init__(self, column: str, countries: list[str] | None = None) -> None:
        self.column = column
        self.countries = countries or list(self.PATTERNS)

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        col = F.col(self.column)
        valid = F.lit(False)
        for c in self.countries:
            valid = valid | col.rlike(self.PATTERNS[c])
        pred = ~valid & col.isNotNull()
        return [
            ExpressionSpec(
                name="vat",
                issue_type="invalid_vat",
                column=self.column,
                count_expr=violation_count(pred),
                non_null_expr=F.count(col),
                filter_expr=pred,
                expected=f"valid VAT ({'/'.join(self.countries)})",
            )
        ]


@register_validator("swift_bic", category="business_rule")
class SwiftBicValidator(Validator):
    """SWIFT/BIC code: 4 bank + 2 country + 2 location + optional 3 branch
    (reference: business_rule/financial.py:372)."""

    PATTERN = r"^[A-Z]{4}[A-Z]{2}[A-Z0-9]{2}([A-Z0-9]{3})?$"

    def __init__(self, column: str) -> None:
        self.column = column

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        col = F.col(self.column)
        pred = ~col.rlike(self.PATTERN) & col.isNotNull()
        return [
            ExpressionSpec(
                name="swift_bic",
                issue_type="invalid_swift_bic",
                column=self.column,
                count_expr=violation_count(pred),
                non_null_expr=F.count(col),
                filter_expr=pred,
                expected="valid SWIFT/BIC",
            )
        ]


@register_validator("japanese_postal", category="localization")
class JapanesePostalValidator(Validator):
    """Japanese postal code NNN-NNNN (reference: localization/japanese.py:20)."""

    def __init__(self, column: str) -> None:
        self.column = column

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        col = F.col(self.column)
        pred = ~col.rlike(r"^[0-9]{3}-[0-9]{4}$") & col.isNotNull()
        return [
            ExpressionSpec(
                name="japanese_postal",
                issue_type="invalid_jp_postal",
                column=self.column,
                count_expr=violation_count(pred),
                non_null_expr=F.count(col),
                filter_expr=pred,
                expected="NNN-NNNN",
            )
        ]


@register_validator("japanese_mynumber", category="localization")
class JapaneseMyNumberValidator(Validator):
    """Japanese MyNumber: 12 digits + mod-11 check digit
    (reference: localization/japanese.py:180). Check-digit arithmetic as a
    pure SQL expression chain (weights 6..2,7..2 per spec)."""

    def __init__(self, column: str) -> None:
        self.column = column

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        c = self.column
        # sum over first 11 digits (from the right, position n=1..11):
        # weight = n<=6 ? n+1 : n-5; check = 11 - (sum % 11); >9 -> 0
        weighted = F.expr(
            f"""
            aggregate(
              zip_with(
                slice(split(reverse(substring({c}, 1, 11)), ''), 1, 11),
                sequence(1, 11),
                (d, n) -> CASE WHEN d = '' THEN 0
                               ELSE cast(d as int) * (CASE WHEN n <= 6 THEN n + 1 ELSE n - 5 END) END
              ), 0, (acc, x) -> acc + x)
            """
        )
        check = 11 - (weighted % 11)
        check = F.when(check > 9, F.lit(0)).otherwise(check)
        col = F.col(c)
        structural = col.rlike(r"^[0-9]{12}$")
        valid = structural & (F.substring(col, 12, 1).cast("int") == check)
        pred = ~valid & col.isNotNull()
        return [
            ExpressionSpec(
                name="japanese_mynumber",
                issue_type="invalid_mynumber",
                column=c,
                count_expr=violation_count(pred),
                non_null_expr=F.count(col),
                filter_expr=pred,
                expected="12-digit MyNumber with valid check digit",
            )
        ]


@register_validator("chinese_id", category="localization")
class ChineseIdValidator(Validator):
    """Chinese resident ID: 17 digits + mod-11 check char
    (reference: localization/chinese.py:21). Weights 2^(18-i) mod 11;
    checksum map 1,0,X,9..2 — all JVM-side expression math."""

    _CHECK_CHARS = ["1", "0", "X", "9", "8", "7", "6", "5", "4", "3", "2"]
    _WEIGHTS = [7, 9, 10, 5, 8, 4, 2, 1, 6, 3, 7, 9, 10, 5, 8, 4, 2]

    def __init__(self, column: str) -> None:
        self.column = column

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        c = self.column
        col = F.col(c)
        weights = ",".join(str(w) for w in self._WEIGHTS)
        weighted = F.expr(
            f"""
            aggregate(
              zip_with(
                slice(split(substring({c}, 1, 17), ''), 1, 17),
                array({weights}),
                (d, w) -> CASE WHEN d = '' THEN 0 ELSE cast(d as int) * w END
              ), 0, (acc, x) -> acc + x)
            """
        )
        check_arr = F.array(*[F.lit(x) for x in self._CHECK_CHARS])
        expected_check = F.element_at(check_arr, (weighted % 11) + 1)
        structural = col.rlike(r"^[0-9]{17}[0-9Xx]$")
        valid = structural & (F.upper(F.substring(col, 18, 1)) == expected_check)
        pred = ~valid & col.isNotNull()
        return [
            ExpressionSpec(
                name="chinese_id",
                issue_type="invalid_chinese_id",
                column=c,
                count_expr=violation_count(pred),
                non_null_expr=F.count(col),
                filter_expr=pred,
                expected="18-char resident ID with valid checksum",
            )
        ]


@register_validator("chinese_uscc", category="localization")
class ChineseUsccValidator(Validator):
    """Chinese Unified Social Credit Code: 18 chars, mod-31 check
    (reference: localization/chinese.py:270)."""

    _CHARSET = "0123456789ABCDEFGHJKLMNPQRTUWXY"
    _WEIGHTS = [1, 3, 9, 27, 19, 26, 16, 17, 20, 29, 25, 13, 8, 24, 10, 30, 28]

    def __init__(self, column: str) -> None:
        self.column = column

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        c = self.column
        col = F.col(c)
        charset = self._CHARSET
        weights = ",".join(str(w) for w in self._WEIGHTS)
        # value of char = position in charset - 1 (instr is 1-based, 0 if absent)
        weighted = F.expr(
            f"""
            aggregate(
              zip_with(
                slice(split(substring({c}, 1, 17), ''), 1, 17),
                array({weights}),
                (ch, w) -> (instr('{charset}', ch) - 1) * w
              ), 0, (acc, x) -> acc + x)
            """
        )
        check_idx = (31 - (weighted % 31)) % 31
        expected_check = F.substring(F.lit(charset), 1, 31).substr(check_idx + 1, F.lit(1))
        structural = col.rlike(r"^[0-9A-HJ-NP-RT-UW-Y]{18}$")
        valid = structural & (F.substring(col, 18, 1) == expected_check)
        pred = ~valid & col.isNotNull()
        return [
            ExpressionSpec(
                name="chinese_uscc",
                issue_type="invalid_uscc",
                column=c,
                count_expr=violation_count(pred),
                non_null_expr=F.count(col),
                filter_expr=pred,
                expected="18-char USCC with valid mod-31 checksum",
            )
        ]


@register_validator("korean_business_number", category="localization")
class KoreanBusinessNumberValidator(Validator):
    """Korean business registration number (사업자등록번호) XXX-XX-XXXXX
    with weighted mod-10 checksum (reference: localization/korean.py:22-96,
    weights [1,3,7,1,3,7,1,3,5] + (d9*5)//10 carry term).

    Pure SQL expression chain — JVM-side, whole-stage codegen, no UDF.
    """

    name = "korean_business_number"
    WEIGHTS = [1, 3, 7, 1, 3, 7, 1, 3, 5]

    def __init__(self, column: str) -> None:
        self.column = column

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        col = F.col(self.column)
        digits = F.regexp_replace(col.cast("string"), r"[^0-9]", "")

        def d(i: int) -> Column:  # 1-based digit extraction (ANSI-safe)
            return F.substring(digits, i, 1).try_cast("int")

        total = F.lit(0)
        for i, w in enumerate(self.WEIGHTS, start=1):
            total = total + d(i) * w
        total = total + F.floor(d(9) * 5 / 10).cast("int")
        check = (10 - (total % 10)) % 10
        valid = (F.length(digits) == 10) & (check == d(10))
        pred = ~F.coalesce(valid, F.lit(False)) & col.isNotNull()
        return [
            ExpressionSpec(
                name=self.name,
                issue_type="invalid_korean_business_number",
                column=self.column,
                count_expr=violation_count(pred),
                non_null_expr=F.count(col),
                filter_expr=pred,
                expected="valid Korean business registration number (XXX-XX-XXXXX)",
            )
        ]


@register_validator("korean_bank_account", category="localization")
class KoreanBankAccountValidator(Validator):
    """Korean bank account number length check, optionally per-bank
    (reference: localization/korean.py:352-470 BANK_LENGTHS table)."""

    name = "korean_bank_account"
    BANK_LENGTHS: dict[str, tuple[int, int]] = {
        "KB": (12, 14),
        "SHINHAN": (11, 14),
        "WOORI": (13, 13),
        "HANA": (14, 14),
        "NH": (11, 16),
        "IBK": (11, 14),
        "SC": (11, 11),
        "KAKAO": (13, 13),
        "KBANK": (13, 13),
        "TOSS": (12, 13),
    }
    MIN_LENGTH, MAX_LENGTH = 10, 16

    def __init__(
        self,
        column: str,
        bank_column: str | None = None,
        bank_code: str | None = None,
    ) -> None:
        self.column = column
        self.bank_column = bank_column
        self.bank_code = bank_code.upper() if bank_code else None

    def specs(self, df: DataFrame) -> list[ExpressionSpec]:
        col = F.col(self.column)
        digits = F.regexp_replace(col.cast("string"), r"[^0-9]", "")
        ln = F.length(digits)
        if self.bank_code is not None:
            lo, hi = self.BANK_LENGTHS.get(
                self.bank_code, (self.MIN_LENGTH, self.MAX_LENGTH)
            )
            valid = (ln >= lo) & (ln <= hi)
            expected = f"{self.bank_code} account of {lo}-{hi} digits"
        elif self.bank_column is not None and self.bank_column in df.columns:
            bank = F.upper(F.col(self.bank_column).cast("string"))
            valid = (ln >= self.MIN_LENGTH) & (ln <= self.MAX_LENGTH)
            # per-bank refinement as a CASE chain (still pure column math)
            expr = None
            for code, (lo, hi) in self.BANK_LENGTHS.items():
                cond = bank == code
                rng = (ln >= lo) & (ln <= hi)
                expr = F.when(cond, rng) if expr is None else expr.when(cond, rng)
            valid = expr.otherwise(valid)
            expected = "account length valid for bank in " + ",".join(self.BANK_LENGTHS)
        else:
            valid = (ln >= self.MIN_LENGTH) & (ln <= self.MAX_LENGTH)
            expected = f"account of {self.MIN_LENGTH}-{self.MAX_LENGTH} digits"
        pred = ~F.coalesce(valid, F.lit(False)) & col.isNotNull()
        return [
            ExpressionSpec(
                name=self.name,
                issue_type="invalid_korean_bank_account",
                column=self.column,
                count_expr=violation_count(pred),
                non_null_expr=F.count(col),
                filter_expr=pred,
                expected=expected,
            )
        ]
