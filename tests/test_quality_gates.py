"""Quality gates (quality_gates.py; reference _datasets/gates.py):
policy-resolved dispositions, deterministic status ladder, CI
projection of check() runs."""

from __future__ import annotations

import pytest

from truthound_spark.quality_gates import (
    QualityGatePolicy,
    evaluate_quality_gate,
    gate_check,
)


@pytest.fixture()
def dirty(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (1, None, 10.0), (3, "c", 9e9)],
        "id long, name string, bal double",
    )


def test_default_policy_blocks_on_any_issue(spark, dirty):
    res = gate_check(dirty, validators=["null", "unique"], gate_id="g1")
    assert res.status == "blocked" and not res.passed
    assert res.summary["blocking_count"] >= 2
    assert all(i["disposition"] == "blocking" for i in res.blocking_failures)
    d = res.to_dict()
    assert d["gate_id"] == "g1" and d["passed"] is False


def test_validator_and_severity_dispositions(spark, dirty):
    """Resolution order validator > issue_type > severity > default
    (reference gates.py:101)."""
    policy = QualityGatePolicy(
        default_issue_disposition="warning",
        validator_dispositions={"unique": "informational"},
        severity_dispositions={"critical": "blocking"},
    )
    res = gate_check(dirty, validators=["null", "unique"], policy=policy)
    # unique's duplicate issue → informational (validator tier wins over
    # the critical-severity tier); null issue → severity/default tier
    assert res.informational_count >= 1
    assert not any(i["validator"] == "unique" for i in res.blocking_failures)


def test_warning_only_run_passes_the_gate(spark, dirty):
    policy = QualityGatePolicy(default_issue_disposition="warning")
    res = gate_check(dirty, validators=["null", "unique"], policy=policy)
    assert res.status == "warning" and res.passed
    assert res.blocking_failures == [] and len(res.warnings) >= 2


def test_clean_run_passes(spark):
    clean = spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string")
    res = gate_check(clean, validators=["null", "unique"])
    assert res.status == "passed" and res.passed
    assert res.summary["issue_count"] == 0


def test_empty_check_set_errors_unless_allowed():
    from truthound_spark.core.results import ValidationRunResult

    empty = ValidationRunResult(checks_run=0, row_count=10)
    res = evaluate_quality_gate(empty, gate_id="g")
    assert res.status == "errored" and not res.passed
    assert res.blocking_failures[0]["reason"] == "empty_check_set"
    ok = evaluate_quality_gate(
        empty, policy=QualityGatePolicy(allow_empty_checks=True)
    )
    assert ok.status == "passed"


def test_skip_reason_short_circuits():
    from truthound_spark.core.results import ValidationRunResult

    res = evaluate_quality_gate(
        ValidationRunResult(checks_run=3), skip_reason="upstream rollback"
    )
    assert res.status == "skipped" and res.passed
    assert res.summary["skip_reason"] == "upstream rollback"


def test_execution_issue_errors_the_gate():
    from truthound_spark.core.results import ValidationIssue, ValidationRunResult
    from truthound_spark.types import Severity

    ex = ValidationIssue(
        column=None,
        issue_type="execution_error",
        count=1,
        severity=Severity.CRITICAL,
        validator_name="regex",
        details="bad pattern",
    )
    run = ValidationRunResult(checks_run=2, execution_issues=[ex])
    res = evaluate_quality_gate(run)
    assert res.status == "errored"
    assert res.blocking_failures[0]["source"] == "execution"
    # demoted execution issues stop erroring the gate
    res2 = evaluate_quality_gate(
        run, policy=QualityGatePolicy(execution_issue_disposition="warning")
    )
    assert res2.status == "warning" and res2.passed


def test_bad_disposition_rejected():
    with pytest.raises(ValueError):
        QualityGatePolicy(default_issue_disposition="fatal")
