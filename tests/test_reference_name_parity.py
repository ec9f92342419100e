"""Reference validator-name enumeration parity (VERDICT r3 "missing" #3).

Extracts every concrete validator ``name`` attribute from the reference's
validator tree (the strings its registry keys on — registry.py:162
``getattr(cls, "name", ...)``) and asserts each resolves in OUR registry.
Abstract bases/templates the reference never exposes as runnable checks
are excluded explicitly — the exclusion list is the complete audited set,
so a new unresolved name fails the test rather than slipping through.
"""

from __future__ import annotations

import pathlib
import re

import pytest

from truthound_spark.core.registry import get_validator

REFERENCE_VALIDATORS = pathlib.Path("/root/reference/src/truthound/validators")

# Abstract intermediate classes that carry a ``name`` attr but are never
# instantiated as checks (subclasses override the name; the reference
# requires subclassing — e.g. SimpleColumnValidator.check_column_values is
# @abstractmethod). Audited by hand against the reference source.
ABSTRACT_BASE_NAMES = {
    "base",
    "column_arithmetic_base",
    "column_drift_base",
    "drift_base",
    "expression_base",
    "geo_base",
    "multi_column_base",
    "query_base",
    "streaming_base",
    "table_base",
    "table_schema_base",
}


def extract_reference_names() -> set[str]:
    names: set[str] = set()
    for p in REFERENCE_VALIDATORS.rglob("*.py"):
        src = p.read_text(errors="ignore")
        for m in re.finditer(
            r'class (\w*Validator)\b[^\n]*:\n(?:    [^\n]*\n|\n)*?'
            r'    name(?:: str)? = "([a-z0-9_]+)"',
            src,
        ):
            names.add(m.group(2))
    return names


@pytest.mark.skipif(
    not REFERENCE_VALIDATORS.is_dir(), reason="reference source not present"
)
def test_every_reference_validator_name_resolves():
    names = extract_reference_names()
    # the extraction is the COVERAGE.md claim's source of truth — keep the
    # floor pinned so a silent extraction regression can't hollow the test
    assert len(names) >= 270, f"extraction shrank: {len(names)}"
    runnable = names - ABSTRACT_BASE_NAMES
    missing = sorted(n for n in runnable if not _resolves(n))
    assert missing == [], f"{len(missing)} reference names unresolved: {missing}"


@pytest.mark.skipif(
    not REFERENCE_VALIDATORS.is_dir(), reason="reference source not present"
)
def test_excluded_names_are_really_abstract():
    """Every excluded name must still exist in the reference AND look like
    a base (name endswith _base/base) or be covered by a template we DO
    register — guards the exclusion list from rotting."""
    names = extract_reference_names()
    for n in ABSTRACT_BASE_NAMES:
        assert n in names, f"exclusion {n!r} no longer exists in reference"
        assert n == "base" or n.endswith("_base"), f"exclusion {n!r} is not a base"


def _resolves(name: str) -> bool:
    try:
        get_validator(name)
        return True
    except KeyError:
        return False
