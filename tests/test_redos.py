"""ReDoS static analyzer tests (reference: validators/security/redos.py).

The analyzer must (a) reject every classic catastrophic-backtracking
pattern, (b) accept every format/business/privacy pattern the repo itself
compiles into rlike expressions, and (c) expose the reference's API
surface (risk levels, complexity score, safety checker, safe executor).
"""

from __future__ import annotations

import re

import pytest

from truthound_spark.validators.redos import (
    RegexSafetyChecker,
    ReDoSRisk,
    SafeRegexConfig,
    SafeRegexExecutor,
    analyze_regex_complexity,
    check_regex_safety,
    create_safe_regex,
    safe_search,
)
from truthound_spark.validators.string import FORMAT_PATTERNS, check_redos

EVIL = [
    r"(a+)+$",          # nested unbounded quantifier
    r"(\d*)*x",         # nested, zero-min
    r"(.*)*",           # nested over ANY
    r"([a-zA-Z]+)*$",   # nested over class
    r"(a+){10,}",       # {n,} acts unbounded
    r"(a|a)*$",         # duplicate branches (factored to epsilon-ambiguity)
    r"(a|aa)*$",        # branch can re-start loop body
    r"(a?a)*$",         # optional element trades with continuation
    r"(aa?)*$",         # trailing optional wraps into next iteration
    r"(\w+\s?)*$",      # Django email ReDoS shape
    r"(.+,)*x$",        # '.' swallows its own delimiter
    r"((a+)b?)*$",      # nested with optional separator
]

POLYNOMIAL = [
    r".*.*=.*",  # Stack Overflow outage pattern
    r"\d+\d+x",
]

SAFE = [
    r"(a|ab)*c",        # prefix-factored => deterministic
    r"^(\d+,)*\d+$",    # delimited list
    r"^\d+(\.\d+)*$",   # version number
    r"^(ab+)*$",        # 'a' delimits iterations
    r"^(a?b)*$",        # optional never trades with 'b'
    r"^(a+b+)*$",       # ba boundary is unique
    r"^(x(a+)y)*$",     # fully delimited inner repeat
]


class TestRiskClassification:
    @pytest.mark.parametrize("pattern", EVIL)
    def test_evil_patterns_critical(self, pattern):
        a = analyze_regex_complexity(pattern)
        assert a.risk == ReDoSRisk.CRITICAL, (pattern, a.issues)
        assert a.issues
        assert not a.is_safe

    @pytest.mark.parametrize("pattern", POLYNOMIAL)
    def test_polynomial_patterns_medium(self, pattern):
        a = analyze_regex_complexity(pattern)
        assert a.risk == ReDoSRisk.MEDIUM, (pattern, a.issues)
        assert a.is_safe  # slow, not hanging: allowed through the gate

    @pytest.mark.parametrize("pattern", SAFE)
    def test_safe_shapes_low(self, pattern):
        a = analyze_regex_complexity(pattern)
        assert a.risk <= ReDoSRisk.LOW, (pattern, a.issues)

    @pytest.mark.parametrize("pattern", sorted(FORMAT_PATTERNS.values()))
    def test_repo_format_patterns_accepted(self, pattern):
        ok, _ = check_regex_safety(pattern)
        assert ok
        check_redos(pattern)  # must not raise

    def test_uncompilable_pattern_critical(self):
        a = analyze_regex_complexity(r"([unclosed")
        assert a.risk == ReDoSRisk.CRITICAL

    def test_metrics_populated(self):
        a = analyze_regex_complexity(r"^(foo|bar){1,3}[a-z]+\d*$")
        m = a.metrics
        assert m["groups"] == 1
        assert m["alternations"] == 1
        assert m["max_branches"] == 2
        assert m["quantifiers"] == 3
        assert m["backreferences"] == 0
        assert a.complexity_score > 0

    def test_backreference_detected(self):
        a = analyze_regex_complexity(r"(\w+)\s+\1")
        assert a.metrics["backreferences"] == 1

    def test_to_dict_round_trip(self):
        d = analyze_regex_complexity(r"(a+)+").to_dict()
        assert d["risk"] == "CRITICAL"
        assert isinstance(d["issues"], list)


class TestCheckRedosGate:
    @pytest.mark.parametrize("pattern", EVIL)
    def test_gate_raises_on_evil(self, pattern):
        with pytest.raises(ValueError, match="catastrophic"):
            check_redos(pattern)

    @pytest.mark.parametrize("pattern", POLYNOMIAL + SAFE)
    def test_gate_allows_non_exponential(self, pattern):
        check_redos(pattern)


class TestSafetyChecker:
    def test_structural_caps(self):
        strict = SafeRegexConfig.strict()
        ok, warning = check_regex_safety("(a)" * 15, strict)
        assert not ok and "groups" in warning

    def test_quantifier_range_cap(self):
        ok, warning = check_regex_safety(r"a{0,500}", SafeRegexConfig())
        assert not ok and "range" in warning

    def test_backreference_policy(self):
        ok, warning = check_regex_safety(r"(\w)\1", SafeRegexConfig())
        assert not ok and "backreference" in warning
        ok, _ = check_regex_safety(r"(\w)\1", SafeRegexConfig.lenient())
        assert ok

    def test_lookaround_policy(self):
        ok, warning = check_regex_safety(r"(?=a)b", SafeRegexConfig.strict())
        assert not ok and "lookaround" in warning

    def test_strict_rejects_polynomial(self):
        ok, _ = check_regex_safety(r".*.*=.*", SafeRegexConfig.strict())
        assert not ok

    def test_validate_and_compile(self):
        checker = RegexSafetyChecker()
        pat = checker.validate_and_compile(r"^\d+$")
        assert pat.match("123")
        with pytest.raises(ValueError, match="unsafe regex"):
            checker.validate_and_compile(r"(a+)+$")


class TestSafeExecutor:
    def test_normal_match(self):
        ex = SafeRegexExecutor(r"^\w+@\w+\.com$")
        assert ex.match("a@b.com")
        assert ex.search("a@b.com")
        assert ex.findall("a@b.com") == ["a@b.com"]

    def test_rejects_evil_at_construction(self):
        with pytest.raises(ValueError):
            SafeRegexExecutor(r"(a+)+$")

    def test_input_length_cap(self):
        ex = SafeRegexExecutor(r"^a+$", config=SafeRegexConfig(max_input_length=10))
        with pytest.raises(ValueError, match="input longer"):
            ex.match("a" * 11)

    def test_timeout_enforced(self):
        # CPython's sre holds the GIL for the whole C-level match, so the
        # timeout can only be exercised against a matcher that yields —
        # substitute a Python-level slow callable to test the machinery.
        import time

        cfg = SafeRegexConfig(timeout_seconds=0.2)
        ex = SafeRegexExecutor(r"^a$", config=cfg)
        with pytest.raises(TimeoutError):
            ex._run(lambda text: time.sleep(2), "a")

    def test_module_helpers(self):
        assert safe_search(r"\d+", "abc123") is not None
        assert create_safe_regex(r"^x$").match("x")


class TestRegexValidatorIntegration:
    def test_regex_validator_rejects_evil(self):
        from truthound_spark.validators.string import RegexValidator

        with pytest.raises(ValueError, match="catastrophic"):
            RegexValidator("c", r"(\w+\s?)*$")

    def test_regex_validator_accepts_formats(self):
        from truthound_spark.validators.string import RegexValidator

        for pattern in FORMAT_PATTERNS.values():
            RegexValidator("c", pattern)
