"""Message internationalization (reference: validators/enterprise.py #20
i18n support). Issue summaries and report headings resolve through a
message catalog; unknown locales fall back to English. Driver-side only —
no executor involvement."""

from __future__ import annotations

_CATALOG: dict[str, dict[str, str]] = {
    "en": {
        "report.title": "Validation report",
        "report.pass": "PASS",
        "report.fail": "FAIL",
        "report.issues": "{n} issues across {checks} checks on {rows} rows",
        "issue.null_values": "{count} null values in '{column}'",
        "issue.duplicate_values": "{count} duplicate values in '{column}'",
        "issue.out_of_range": "{count} out-of-range values in '{column}'",
    },
    "ko": {
        "report.title": "검증 보고서",
        "report.pass": "통과",
        "report.fail": "실패",
        "report.issues": "{rows}행 {checks}개 검사에서 {n}건의 문제",
        "issue.null_values": "'{column}' 컬럼에 널 값 {count}건",
        "issue.duplicate_values": "'{column}' 컬럼에 중복 값 {count}건",
        "issue.out_of_range": "'{column}' 컬럼에 범위 밖 값 {count}건",
    },
    "ja": {
        "report.title": "検証レポート",
        "report.pass": "合格",
        "report.fail": "不合格",
        "report.issues": "{rows}行・{checks}件の検査で{n}件の問題",
        "issue.null_values": "「{column}」列にNULL値{count}件",
        "issue.duplicate_values": "「{column}」列に重複値{count}件",
        "issue.out_of_range": "「{column}」列に範囲外の値{count}件",
    },
}

_locale = "en"


def set_locale(locale: str) -> None:
    global _locale
    _locale = locale if locale in _CATALOG else "en"


def get_locale() -> str:
    return _locale


def t(key: str, **kwargs) -> str:
    """Translate ``key`` in the active locale (English fallback per key)."""
    msg = _CATALOG.get(_locale, {}).get(key) or _CATALOG["en"].get(key) or key
    try:
        return msg.format(**kwargs)
    except (KeyError, IndexError):
        return msg


def localize_issue(issue) -> str:
    """Best-effort localized one-liner for a ValidationIssue."""
    key = f"issue.{issue.issue_type}"
    if key.replace("issue.", "") not in ("null_values", "duplicate_values", "out_of_range"):
        return issue.details or issue.issue_type
    return t(key, count=issue.count, column=issue.column)
