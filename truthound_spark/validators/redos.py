"""Static ReDoS analysis for regex validators.

Capability parity with the reference's ReDoS protection pipeline
(reference: src/truthound/validators/security/redos.py:160-587 — static
analysis, complexity estimation, quantifier/alternation analysis, safe
compile, timeout-bounded execution), built differently: instead of
matching the pattern *text* against a catalogue of dangerous-shape
regexes, this analyzer walks the actual parse tree Python's regex engine
produces (``re._parser``), so detection survives arbitrary nesting,
non-capturing groups, and character-class spellings that textual
heuristics miss.

Why this matters for Spark: ``rlike`` / ``regexp_extract`` run on
java.util.regex — a backtracking engine — inside executor tasks. One
catastrophic pattern against a 100 TB string column wedges every core in
the cluster simultaneously, and Spark's task reaper is the only way out.
Rejecting the pattern on the driver, before the job is even submitted, is
the only cheap place to stop it.

Detection classes (standard results from the ReDoS literature):

* **Exponential — nested unbounded quantifiers.** An unbounded repeat
  whose body can itself match variable-length input via another unbounded
  repeat (``(a+)+``, ``(\\d*)*``): the number of ways to split the input
  grows exponentially.
* **Exponential — quantified overlapping alternation.** An unbounded
  repeat over a branch whose alternatives can start with the same
  character (``(a|a)*``, ``(a|ab)+``): each character doubles the
  backtracking frontier.
* **Polynomial — adjacent overlapping quantifiers.** Two unbounded
  repeats in sequence whose character sets overlap (``.*.*=``,
  ``\\d+\\d+``): O(n²) backtracking on failure — slow, not hanging, so
  flagged MEDIUM rather than rejected.

First-character sets are approximated conservatively: ``.``, negated
classes, and unknown categories are treated as overlapping everything, so
the analyzer can miss *safety* (false positive) but is designed never to
certify a genuinely ambiguous quantifier as safe.
"""

from __future__ import annotations

import re
import threading
from dataclasses import dataclass, field
from enum import IntEnum
from functools import lru_cache
from typing import Any, Iterable

try:  # Python 3.11+
    from re import _parser as sre_parse  # type: ignore[attr-defined]
except ImportError:  # pragma: no cover - older interpreters
    import sre_parse  # type: ignore[no-redef]


class ReDoSRisk(IntEnum):
    """Ordered risk level — comparisons like ``risk >= HIGH`` are valid."""

    NONE = 0
    LOW = 1
    MEDIUM = 2
    HIGH = 3
    CRITICAL = 4


@dataclass(frozen=True)
class SafeRegexConfig:
    """Structural limits applied before risk analysis.

    Mirrors the reference's config surface (redos.py:66-121): hard caps
    on pattern size/shape plus feature switches for backreferences and
    lookaround, and a match timeout for the driver-side executor.
    """

    max_pattern_length: int = 1000
    max_groups: int = 20
    max_quantifier_range: int = 100
    max_alternations: int = 50
    max_nested_depth: int = 10
    allow_backreferences: bool = False
    allow_lookaround: bool = True
    timeout_seconds: float = 1.0
    max_input_length: int = 100_000
    reject_at: ReDoSRisk = ReDoSRisk.HIGH

    @classmethod
    def strict(cls) -> "SafeRegexConfig":
        return cls(
            max_pattern_length=500,
            max_groups=10,
            max_quantifier_range=50,
            max_alternations=20,
            max_nested_depth=5,
            allow_backreferences=False,
            allow_lookaround=False,
            timeout_seconds=0.5,
            max_input_length=10_000,
            reject_at=ReDoSRisk.MEDIUM,
        )

    @classmethod
    def lenient(cls) -> "SafeRegexConfig":
        return cls(
            max_pattern_length=5000,
            max_groups=50,
            max_quantifier_range=1000,
            max_alternations=100,
            max_nested_depth=20,
            allow_backreferences=True,
            allow_lookaround=True,
            timeout_seconds=5.0,
            max_input_length=1_000_000,
            reject_at=ReDoSRisk.CRITICAL,
        )


@dataclass
class RegexAnalysis:
    """Full analysis result (reference RegexAnalysisResult, redos.py:123)."""

    pattern: str
    risk: ReDoSRisk
    complexity_score: float
    issues: list[str] = field(default_factory=list)
    metrics: dict[str, Any] = field(default_factory=dict)
    recommendation: str = ""

    @property
    def is_safe(self) -> bool:
        return self.risk < ReDoSRisk.HIGH

    def to_dict(self) -> dict[str, Any]:
        return {
            "pattern": self.pattern,
            "risk": self.risk.name,
            "complexity_score": self.complexity_score,
            "issues": list(self.issues),
            "metrics": dict(self.metrics),
            "recommendation": self.recommendation,
        }


# --------------------------------------------------------------------------
# First-character-set approximation
# --------------------------------------------------------------------------

_CATEGORY_DISJOINT: dict[tuple[str, str], bool] = {}


def _cat_name(c: Any) -> str:
    return str(c).rsplit("_", 1)[-1].lower()  # CATEGORY_DIGIT -> 'digit'


# Pairs of sre categories that provably cannot match the same character.
_DISJOINT_CATS = {
    frozenset({"digit", "space"}),
    frozenset({"word", "space"}),
    frozenset({"digit", "not_digit"}),
    frozenset({"word", "not_word"}),
    frozenset({"space", "not_space"}),
}

# Which plain characters a category can match — only what's needed for
# disjointness proofs against literal sets.
def _cat_matches_char(cat: str, ch: int) -> bool:
    c = chr(ch)
    if cat == "digit":
        return c.isdigit()
    if cat == "space":
        return c.isspace()
    if cat == "word":
        return c.isalnum() or c == "_"
    if cat == "not_digit":
        return not c.isdigit()
    if cat == "space" or cat == "not_space":
        return not c.isspace() if cat == "not_space" else c.isspace()
    if cat == "not_word":
        return not (c.isalnum() or c == "_")
    return True  # unknown category: conservatively matches anything


class _FirstSet:
    """Approximate set of characters a subpattern can start with.

    ``universal`` marks ``.``/negated-class/unknown constructs: overlaps
    with everything. ``epsilon`` marks that the subpattern can match the
    empty string (so the *following* element's first set leaks in — the
    caller handles that by unioning).
    """

    __slots__ = ("chars", "ranges", "cats", "universal", "epsilon")

    def __init__(self) -> None:
        self.chars: set[int] = set()
        self.ranges: list[tuple[int, int]] = []
        self.cats: set[str] = set()
        self.universal = False
        self.epsilon = False

    def union(self, other: "_FirstSet") -> "_FirstSet":
        out = _FirstSet()
        out.chars = self.chars | other.chars
        out.ranges = self.ranges + other.ranges
        out.cats = self.cats | other.cats
        out.universal = self.universal or other.universal
        out.epsilon = self.epsilon or other.epsilon
        return out

    def _contains_char(self, ch: int) -> bool:
        if ch in self.chars:
            return True
        if any(lo <= ch <= hi for lo, hi in self.ranges):
            return True
        return any(_cat_matches_char(c, ch) for c in self.cats)

    def overlaps(self, other: "_FirstSet") -> bool:
        """Conservative: True unless disjointness is provable."""
        if self.universal or other.universal:
            return True
        # char/range vs char/range
        for ch in self.chars:
            if other._contains_char(ch):
                return True
        for ch in other.chars:
            if self._contains_char(ch):
                return True
        for lo, hi in self.ranges:
            for lo2, hi2 in other.ranges:
                if lo <= hi2 and lo2 <= hi:
                    return True
            # range vs category: conservative unless small range proven out
            for c in other.cats:
                if hi - lo > 256:
                    return True
                if any(_cat_matches_char(c, x) for x in range(lo, hi + 1)):
                    return True
        for lo, hi in other.ranges:
            for c in self.cats:
                if hi - lo > 256:
                    return True
                if any(_cat_matches_char(c, x) for x in range(lo, hi + 1)):
                    return True
        # category vs category
        for a in self.cats:
            for b in other.cats:
                if a == b:
                    return True
                if frozenset({a, b}) not in _DISJOINT_CATS:
                    return True
        return False


# --------------------------------------------------------------------------
# Parse-tree walk
# --------------------------------------------------------------------------

_UNBOUNDED = sre_parse.MAXREPEAT


def _op(name: str) -> Any:
    return getattr(sre_parse, name, None) or name


class _TreeAnalyzer:
    """Single walk collecting metrics + risk findings from the sre tree."""

    def __init__(self, pattern: str, big_repeat: int = 50) -> None:
        self.pattern = pattern
        self.big_repeat = big_repeat  # {n,m} with m >= this acts unbounded
        self.issues: list[str] = []
        self.max_depth = 0
        self.quantifiers = 0
        self.unbounded_quantifiers = 0
        self.alternations = 0
        self.max_branches = 0
        self.backrefs = 0
        self.lookarounds = 0
        self.max_quant_range = 0
        self.exponential = False
        self.polynomial = False

    # -- helpers ----------------------------------------------------------
    def _is_unbounded(self, maxr: int) -> bool:
        return maxr == _UNBOUNDED or maxr >= self.big_repeat

    def first_set(self, items: Iterable[Any]) -> _FirstSet:
        """First set of a *sequence* of parsed items."""
        fs = _FirstSet()
        fs.epsilon = True
        for item in items:
            ifs = self._item_first(item)
            fs.chars |= ifs.chars
            fs.ranges += ifs.ranges
            fs.cats |= ifs.cats
            fs.universal = fs.universal or ifs.universal
            if not ifs.epsilon:
                fs.epsilon = False
                break
        return fs

    def _item_first(self, item: Any) -> _FirstSet:
        op, av = item
        name = str(op)
        fs = _FirstSet()
        if name == "LITERAL":
            fs.chars.add(av)
        elif name == "NOT_LITERAL":
            fs.universal = True
        elif name == "ANY":
            fs.universal = True
        elif name == "IN":
            negate = False
            for sub_op, sub_av in av:
                sname = str(sub_op)
                if sname == "NEGATE":
                    negate = True
                elif sname == "LITERAL":
                    fs.chars.add(sub_av)
                elif sname == "RANGE":
                    fs.ranges.append(sub_av)
                elif sname == "CATEGORY":
                    fs.cats.add(_cat_name(sub_av))
                else:
                    fs.universal = True
            if negate:
                # a negated class overlaps almost anything — conservative
                fs = _FirstSet()
                fs.universal = True
        elif name in ("MAX_REPEAT", "MIN_REPEAT", "POSSESSIVE_REPEAT"):
            minr, _maxr, body = av
            inner = self.first_set(body)
            fs = inner
            if minr == 0:
                fs.epsilon = True
        elif name == "SUBPATTERN":
            body = av[3] if len(av) == 4 else av[1]
            fs = self.first_set(body)
        elif name == "ATOMIC_GROUP":
            fs = self.first_set(av)
        elif name == "BRANCH":
            _, branches = av
            out = _FirstSet()
            for b in branches:
                out = out.union(self.first_set(b))
            fs = out
        elif name in ("AT",):  # anchors match empty
            fs.epsilon = True
        elif name in ("ASSERT", "ASSERT_NOT"):
            fs.epsilon = True  # zero-width
        elif name == "GROUPREF":
            fs.universal = True  # unknown content
        else:
            fs.universal = True
        return fs

    def last_set(self, items: Iterable[Any]) -> _FirstSet:
        """Last-character set of a sequence (mirror of :meth:`first_set`)."""
        fs = _FirstSet()
        fs.epsilon = True
        for item in reversed(list(items)):
            ifs = self._item_last(item)
            fs.chars |= ifs.chars
            fs.ranges += ifs.ranges
            fs.cats |= ifs.cats
            fs.universal = fs.universal or ifs.universal
            if not ifs.epsilon:
                fs.epsilon = False
                break
        return fs

    def _item_last(self, item: Any) -> _FirstSet:
        op, av = item
        name = str(op)
        if name in ("MAX_REPEAT", "MIN_REPEAT", "POSSESSIVE_REPEAT"):
            minr, _maxr, body = av
            fs = self.last_set(body)
            if minr == 0:
                fs.epsilon = True
            return fs
        if name == "SUBPATTERN":
            body = av[3] if len(av) == 4 else av[1]
            return self.last_set(body)
        if name == "ATOMIC_GROUP":
            return self.last_set(av)
        if name == "BRANCH":
            _, branches = av
            out = _FirstSet()
            for b in branches:
                out = out.union(self.last_set(b))
            return out
        return self._item_first(item)  # single-char / zero-width items

    def _can_vary_length(self, items: Iterable[Any]) -> bool:
        """True if the sequence can match more than one length (has an
        unbounded or min!=max repeat anywhere inside)."""
        for item in items:
            op, av = item
            name = str(op)
            if name in ("MAX_REPEAT", "MIN_REPEAT", "POSSESSIVE_REPEAT"):
                minr, maxr, body = av
                if maxr != minr:
                    return True
                if self._can_vary_length(body):
                    return True
            elif name == "SUBPATTERN":
                body = av[3] if len(av) == 4 else av[1]
                if self._can_vary_length(body):
                    return True
            elif name == "BRANCH":
                _, branches = av
                lens = set()
                for b in branches:
                    if self._can_vary_length(b):
                        return True
                    lens.add(self._fixed_len(b))
                if len(lens) > 1:
                    return True
            elif name == "ATOMIC_GROUP":
                if self._can_vary_length(av):
                    return True
        return False

    def _fixed_len(self, items: Iterable[Any]) -> int:
        n = 0
        for item in items:
            op, av = item
            name = str(op)
            if name in ("LITERAL", "NOT_LITERAL", "ANY", "IN"):
                n += 1
            elif name in ("MAX_REPEAT", "MIN_REPEAT", "POSSESSIVE_REPEAT"):
                minr, maxr, body = av
                n += minr * self._fixed_len(body)
            elif name == "SUBPATTERN":
                body = av[3] if len(av) == 4 else av[1]
                n += self._fixed_len(body)
        return n

    # -- main walk --------------------------------------------------------
    def walk(self, items: list[Any], depth: int = 0) -> None:
        self.max_depth = max(self.max_depth, depth)
        prev_repeat_fs: _FirstSet | None = None
        for item in items:
            op, av = item
            name = str(op)
            if name in ("MAX_REPEAT", "MIN_REPEAT", "POSSESSIVE_REPEAT"):
                minr, maxr, body = av
                self.quantifiers += 1
                if maxr != _UNBOUNDED:
                    self.max_quant_range = max(self.max_quant_range, maxr - minr)
                unbounded = name != "POSSESSIVE_REPEAT" and self._is_unbounded(maxr)
                if unbounded:
                    self.unbounded_quantifiers += 1
                    # exponential class 2: quantified ambiguous alternation.
                    # NB: sre_parse factors common branch prefixes, so
                    # (a|a)* arrives as a(ε|ε) and (a|aa)* as a(ε|a) —
                    # the epsilon rules below catch the factored forms.
                    body_first = self.first_set(body)
                    for sub in self._iter_branches(body):
                        _, (_grp, branches) = sub
                        firsts = [self.first_set(b) for b in branches]
                        flagged = False
                        # (a) two branches can start with the same char
                        for i in range(len(firsts)):
                            for j in range(i + 1, len(firsts)):
                                fi, fj = firsts[i], firsts[j]
                                if (fi.chars or fi.ranges or fi.cats or fi.universal) and (
                                    fj.chars or fj.ranges or fj.cats or fj.universal
                                ) and fi.overlaps(fj):
                                    flagged = True
                        # (b) >=2 branches can match empty: iteration
                        # count becomes a free choice ((a|a)* factored)
                        eps = sum(1 for f in firsts if f.epsilon)
                        if eps >= 2:
                            flagged = True
                        # (c) an empty-capable branch plus a branch that
                        # can re-start the loop body ((a|aa)* factored):
                        # iterations of different lengths interchange
                        if eps >= 1 and any(
                            not f.epsilon and f.overlaps(body_first)
                            for f in firsts
                        ):
                            flagged = True
                        if flagged:
                            self.exponential = True
                            self.issues.append(
                                "alternation with overlapping or "
                                "empty-ambiguous branches under an unbounded "
                                "quantifier (exponential backtracking)"
                            )
                    # exponential class 3: a variable-length element whose
                    # tail characters are interchangeable with the loop
                    # continuation ((a+)+, (a?a)*, (\w+\s?)* splits) —
                    # iterations can trade characters, so the number of
                    # parses multiplies per iteration. NOTE this subsumes
                    # the naive "nested unbounded quantifier" rule while
                    # staying silent on delimited loops like (\d+,)* where
                    # the delimiter makes every split unique. The loop body
                    # is unwrapped through group nodes so the capture group
                    # wrapping the whole body isn't treated as one opaque
                    # variable element.
                    body_list = self._flatten_group_body(list(body))
                    for i, elem in enumerate(body_list):
                        if not self._can_vary_length([elem]):
                            continue
                        tail_fs = self.first_set(body_list[i + 1:])
                        if tail_fs.epsilon:
                            tail_fs = tail_fs.union(body_first)
                        if self._item_last(elem).overlaps(tail_fs):
                            self.exponential = True
                            self.issues.append(
                                "variable-length element inside an unbounded "
                                "quantifier can trade characters with the "
                                "loop continuation (exponential backtracking)"
                            )
                            break
                    # polynomial class: adjacent overlapping repeats.
                    # Compare the PREVIOUS repeat's last-char set (what its
                    # final iteration can give back) against this repeat's
                    # first-char set — (\d+,)*\d+ is safe (',' vs digit)
                    # while .*.*= and \d+\d+ are the real O(n²) shapes.
                    if prev_repeat_fs is not None and prev_repeat_fs.overlaps(body_first):
                        self.polynomial = True
                        self.issues.append(
                            "adjacent unbounded quantifiers over overlapping "
                            "character sets (polynomial backtracking)"
                        )
                    prev_repeat_fs = self.last_set(body)
                else:
                    prev_repeat_fs = None
                self.walk(body, depth + 1)
            elif name == "SUBPATTERN":
                body = av[3] if len(av) == 4 else av[1]
                self.walk(body, depth + 1)
                prev_repeat_fs = None
            elif name == "BRANCH":
                _, branches = av
                self.alternations += 1
                self.max_branches = max(self.max_branches, len(branches))
                for b in branches:
                    self.walk(b, depth + 1)
                prev_repeat_fs = None
            elif name == "GROUPREF":
                self.backrefs += 1
                prev_repeat_fs = None
            elif name in ("ASSERT", "ASSERT_NOT"):
                self.lookarounds += 1
                _, body = av
                self.walk(body, depth + 1)
                prev_repeat_fs = None
            elif name == "ATOMIC_GROUP":
                self.walk(av, depth + 1)
                prev_repeat_fs = None
            elif name in ("LITERAL", "NOT_LITERAL", "ANY", "IN", "AT", "CATEGORY"):
                prev_repeat_fs = None
            else:
                prev_repeat_fs = None

    def _flatten_group_body(self, items: list[Any]) -> list[Any]:
        """Unwrap [SUBPATTERN([...])] / [ATOMIC([...])] single-element
        bodies so the loop's real element sequence is analyzed."""
        while len(items) == 1:
            op, av = items[0]
            name = str(op)
            if name == "SUBPATTERN":
                items = list(av[3] if len(av) == 4 else av[1])
            elif name == "ATOMIC_GROUP":
                items = list(av)
            else:
                break
        return items

    def _iter_branches(self, items: Iterable[Any]):
        """Yield every BRANCH node at any depth below (not crossing
        another quantifier — that's already handled by the nested check)."""
        for item in items:
            op, av = item
            name = str(op)
            if name == "BRANCH":
                yield item
            elif name == "SUBPATTERN":
                body = av[3] if len(av) == 4 else av[1]
                yield from self._iter_branches(body)
            elif name == "ATOMIC_GROUP":
                yield from self._iter_branches(av)


# --------------------------------------------------------------------------
# Public analyzer
# --------------------------------------------------------------------------


@lru_cache(maxsize=2048)
def analyze_regex_complexity(pattern: str) -> RegexAnalysis:
    """Analyze ``pattern`` and return risk, score, issues, metrics.

    Reference: analyze_regex_complexity / RegexComplexityAnalyzer.analyze
    (redos.py:249-433) — same result surface, parse-tree implementation.
    """
    try:
        tree = sre_parse.parse(pattern)
    except re.error as exc:
        return RegexAnalysis(
            pattern=pattern,
            risk=ReDoSRisk.CRITICAL,
            complexity_score=10.0,
            issues=[f"pattern does not compile: {exc}"],
            recommendation="Fix the regex syntax error before use.",
        )

    an = _TreeAnalyzer(pattern)
    an.walk(list(tree))
    groups = tree.state.groups - 1

    if an.exponential:
        risk = ReDoSRisk.CRITICAL
    elif an.polynomial and an.backrefs:
        risk = ReDoSRisk.HIGH
    elif an.polynomial:
        risk = ReDoSRisk.MEDIUM
    elif an.backrefs or an.unbounded_quantifiers >= 4:
        risk = ReDoSRisk.MEDIUM
    elif an.unbounded_quantifiers or an.lookarounds:
        risk = ReDoSRisk.LOW
    else:
        risk = ReDoSRisk.NONE

    score = min(
        10.0,
        0.5 * an.unbounded_quantifiers
        + 0.2 * an.quantifiers
        + 0.3 * an.max_branches
        + 0.2 * an.max_depth
        + 0.5 * an.backrefs
        + (6.0 if an.exponential else 0.0)
        + (3.0 if an.polynomial else 0.0),
    )

    recs = []
    if an.exponential:
        recs.append(
            "Rewrite so no two paths can consume the same characters: make "
            "alternation branches start with disjoint characters, replace "
            "nested quantifiers like (x+)+ with x+, or use a possessive/"
            "atomic group."
        )
    if an.polynomial:
        recs.append(
            "Separate adjacent unbounded quantifiers with a mandatory "
            "delimiter character so they cannot trade characters on "
            "backtracking."
        )
    if an.backrefs:
        recs.append("Avoid backreferences in validation patterns.")
    if not recs and risk <= ReDoSRisk.LOW:
        recs.append("Pattern looks safe for backtracking engines.")

    return RegexAnalysis(
        pattern=pattern,
        risk=risk,
        complexity_score=round(score, 2),
        issues=an.issues,
        metrics={
            "length": len(pattern),
            "groups": groups,
            "quantifiers": an.quantifiers,
            "unbounded_quantifiers": an.unbounded_quantifiers,
            "max_quantifier_range": an.max_quant_range,
            "alternations": an.alternations,
            "max_branches": an.max_branches,
            "max_nested_depth": an.max_depth,
            "backreferences": an.backrefs,
            "lookarounds": an.lookarounds,
        },
        recommendation=" ".join(recs),
    )


def check_regex_safety(
    pattern: str, config: SafeRegexConfig | None = None
) -> tuple[bool, str | None]:
    """(is_safe, warning) — reference check_regex_safety (redos.py:763)."""
    cfg = config or SafeRegexConfig()
    if len(pattern) > cfg.max_pattern_length:
        return False, f"pattern longer than {cfg.max_pattern_length} chars"
    analysis = analyze_regex_complexity(pattern)
    m = analysis.metrics
    if m:
        if m["groups"] > cfg.max_groups:
            return False, f"too many groups ({m['groups']} > {cfg.max_groups})"
        if m["max_quantifier_range"] > cfg.max_quantifier_range:
            return False, (
                f"quantifier range {m['max_quantifier_range']} exceeds "
                f"{cfg.max_quantifier_range}"
            )
        if m["max_branches"] > cfg.max_alternations:
            return False, (
                f"alternation width {m['max_branches']} exceeds "
                f"{cfg.max_alternations}"
            )
        if m["max_nested_depth"] > cfg.max_nested_depth:
            return False, (
                f"nesting depth {m['max_nested_depth']} exceeds "
                f"{cfg.max_nested_depth}"
            )
        if m["backreferences"] and not cfg.allow_backreferences:
            return False, "backreferences are not allowed"
        if m["lookarounds"] and not cfg.allow_lookaround:
            return False, "lookaround is not allowed"
    if analysis.risk >= cfg.reject_at:
        issue = analysis.issues[0] if analysis.issues else analysis.risk.name
        return False, issue
    if analysis.risk >= ReDoSRisk.MEDIUM:
        return True, analysis.issues[0] if analysis.issues else None
    return True, None


class RegexSafetyChecker:
    """Check + compile gate (reference RegexSafetyChecker, redos.py:483)."""

    def __init__(self, config: SafeRegexConfig | None = None) -> None:
        self.config = config or SafeRegexConfig()

    def check(self, pattern: str) -> tuple[bool, str | None]:
        return check_regex_safety(pattern, self.config)

    def analyze(self, pattern: str) -> RegexAnalysis:
        return analyze_regex_complexity(pattern)

    def validate_and_compile(self, pattern: str, flags: int = 0) -> re.Pattern:
        ok, warning = self.check(pattern)
        if not ok:
            raise ValueError(f"unsafe regex {pattern!r}: {warning}")
        return re.compile(pattern, flags)


def create_safe_regex(
    pattern: str, flags: int = 0, config: SafeRegexConfig | None = None
) -> re.Pattern:
    """Validate-and-compile helper (reference create_safe_regex)."""
    return RegexSafetyChecker(config).validate_and_compile(pattern, flags)


class SafeRegexExecutor:
    """Timeout-bounded driver-side matching (reference SafeRegexExecutor,
    redos.py:587-760).

    Only for *driver-side* uses (pattern auto-detection, profiling
    samples). Executor-side matching goes through ``rlike`` after the
    static gate — a timeout thread per row would be absurd at scale; the
    static analysis IS the distributed defense.

    LIMITATION (true of any thread-based regex timeout on CPython,
    including the reference's): ``sre`` runs one uninterruptible C call
    holding the GIL, so an in-flight match cannot be preempted — the
    timeout fires only for matching strategies that yield (or after the
    call returns). The effective driver-side defenses are the ordering:
    static risk gate at construction, then the input-length cap, then the
    timeout as a last-resort detector.
    """

    def __init__(
        self, pattern: str, flags: int = 0, config: SafeRegexConfig | None = None
    ) -> None:
        self.config = config or SafeRegexConfig()
        self.regex = create_safe_regex(pattern, flags, self.config)

    def _run(self, fn, text: str):
        if len(text) > self.config.max_input_length:
            raise ValueError(
                f"input longer than {self.config.max_input_length} chars"
            )
        result: list[Any] = [None]
        error: list[BaseException] = []

        def target() -> None:
            try:
                result[0] = fn(text)
            except BaseException as exc:  # pragma: no cover - defensive
                error.append(exc)

        t = threading.Thread(target=target, daemon=True)
        t.start()
        t.join(self.config.timeout_seconds)
        if t.is_alive():
            raise TimeoutError(
                f"regex exceeded {self.config.timeout_seconds}s on input"
            )
        if error:
            raise error[0]
        return result[0]

    def match(self, text: str):
        return self._run(self.regex.match, text)

    def search(self, text: str):
        return self._run(self.regex.search, text)

    def findall(self, text: str):
        return self._run(self.regex.findall, text)


def safe_match(pattern: str, text: str, timeout: float = 1.0):
    cfg = SafeRegexConfig(timeout_seconds=timeout)
    return SafeRegexExecutor(pattern, config=cfg).match(text)


def safe_search(pattern: str, text: str, timeout: float = 1.0):
    cfg = SafeRegexConfig(timeout_seconds=timeout)
    return SafeRegexExecutor(pattern, config=cfg).search(text)
