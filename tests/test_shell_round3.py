"""Shell breadth: service actions, database/object stores, CLI read/doctor."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

import truthound_spark as th
from truthound_spark.checkpoint import (
    Checkpoint,
    DiscordAction,
    EmailAction,
    GitHubActionAction,
    OpsgenieAction,
    PagerDutyAction,
    SlackAction,
    TeamsAction,
    TelegramAction,
)
from truthound_spark.stores import DatabaseStore, ObjectStoreStore


def _failing_df(spark):
    return spark.createDataFrame([(1, None), (1, "x")], "id int, email string")


def _run(spark, action):
    from truthound_spark.core.registry import get_validator

    cp = Checkpoint(
        "t",
        validators=[
            get_validator("null")(columns=["email"]),
            get_validator("unique")(columns=["id"]),
        ],
        actions=[action],
    )
    return cp.run(_failing_df(spark))


def test_service_action_payload_shapes(spark):
    sent: list[tuple[str, bytes]] = []
    sender = lambda url, body: sent.append((url, body))
    actions = [
        SlackAction("http://hooks/slack", sender=sender),
        TeamsAction("http://hooks/teams", sender=sender),
        DiscordAction("http://hooks/discord", sender=sender),
        TelegramAction("http://api/bot/sendMessage", chat_id="42", sender=sender),
        PagerDutyAction("rk-123", sender=sender),
        OpsgenieAction("http://api/opsgenie", sender=sender),
    ]
    for a in actions:
        _run(spark, a)
    assert len(sent) == 6
    payloads = [json.loads(b) for _, b in sent]
    assert "blocks" in payloads[0]
    assert payloads[1]["@type"] == "MessageCard"
    assert "embeds" in payloads[2]
    assert payloads[3]["chat_id"] == "42"
    assert payloads[4]["routing_key"] == "rk-123"
    assert payloads[5]["priority"].startswith("P")


def test_email_action_builds_mime(spark):
    captured = {}

    def transport(host, port, sender, to, message):
        captured.update(host=host, to=to, message=message)

    _run(spark, EmailAction(["ops@example.com"], transport=transport))
    assert captured["to"] == ["ops@example.com"]
    assert "Subject: [truthound] checkpoint t: FAIL" in captured["message"]


def test_github_action_writes_summary(spark, tmp_path, capsys):
    summary = tmp_path / "summary.md"
    _run(spark, GitHubActionAction(summary_path=str(summary)))
    out = capsys.readouterr().out
    assert "::error title=truthound checkpoint t::" in out
    assert "## Checkpoint t" in summary.read_text()


def test_database_store_roundtrip(spark, tmp_path):
    store = DatabaseStore(db_path=str(tmp_path / "runs.db"))
    res = th.check(_failing_df(spark), validators=["null"])
    run_id = store.save(res)
    assert store.load(run_id)["row_count"] == 2
    assert run_id in store.list_runs()


def test_object_store_local_fallback(spark, tmp_path):
    store = ObjectStoreStore(str(tmp_path / "runs"))
    res = th.check(_failing_df(spark), validators=["null"])
    run_id = store.save(res)
    assert (tmp_path / "runs" / f"{run_id}.json").exists()


def test_cli_read_and_doctor(tmp_path, spark, capsys):
    from truthound_spark.cli import main

    p = str(tmp_path / "d.parquet")
    spark.range(5).select(F.col("id").alias("k")).write.parquet(p)
    assert main(["read", p, "-n", "3"]) == 0
    out = capsys.readouterr().out
    assert "rows: 5" in out and "k: bigint" in out
    assert main(["doctor"]) == 0
    assert "doctor: healthy" in capsys.readouterr().out


def test_audit_log_and_metrics(spark, tmp_path):
    from truthound_spark.observability import AuditLog, MetricsEmitter

    res = th.check(_failing_df(spark), validators=["null"])
    log = AuditLog(path=str(tmp_path / "audit.jsonl"))
    log.record("check", res, dataset="test_df")
    entries = log.entries()
    assert len(entries) == 1 and entries[0]["action"] == "check"
    assert entries[0]["issues"] == len(res.issues)

    lines: list[str] = []
    m = MetricsEmitter(transport=lines.append)
    m.emit_result("suite1", res, elapsed=1.5)
    assert any(line.startswith("truthound.runs:1|c|#") for line in lines)
    assert any("|ms" in line for line in lines)
    assert any("status:pass" in line or "status:fail" in line for line in lines)


def test_retry_and_circuit_breaker():
    from truthound_spark.resilience import CircuitBreaker, RetryPolicy

    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise ValueError("transient")
        return "ok"

    assert RetryPolicy(max_attempts=3, base_delay=0.01).execute(flaky) == "ok"

    cb = CircuitBreaker(failure_threshold=2, reset_seconds=60)
    for _ in range(2):
        try:
            cb.execute(lambda: (_ for _ in ()).throw(ValueError()))
        except ValueError:
            pass
    assert cb.state == "open"
    try:
        cb.execute(lambda: "x")
        raise AssertionError("expected open circuit")
    except RuntimeError:
        pass


def test_suite_deadline_degrades(spark):
    from truthound_spark.core.registry import get_validator
    from truthound_spark.resilience import SuiteDeadline

    df = _failing_df(spark)
    vs = [get_validator("null")(columns=["email"]) for _ in range(3)]
    issues = SuiteDeadline(budget_seconds=0.0).run(df, vs)
    skipped = [i for i in issues if i.issue_type == "skipped_deadline"]
    assert len(skipped) >= 2  # budget gone after the first check at most


def test_datadocs_site(spark, tmp_path):
    from truthound_spark.datadocs import build_site
    from truthound_spark.profiler.table_profiler import profile

    df = _failing_df(spark)
    prof = profile(df)
    res = th.check(df, validators=["null"])
    idx = build_site(str(tmp_path / "docs"), profiles={"users": prof}, runs=[("r1", res)])
    html = open(idx).read()
    assert "table_users.html" in html and "run_r1.html" in html
    assert (tmp_path / "docs" / "table_users.html").exists()
    assert (tmp_path / "docs" / "run_r1.html").exists()


def test_i18n_catalog(spark):
    from truthound_spark import i18n

    res = th.check(_failing_df(spark), validators=["null"])
    issue = res.issues[0]
    i18n.set_locale("ko")
    assert "널 값" in i18n.localize_issue(issue)
    i18n.set_locale("ja")
    assert "NULL値" in i18n.localize_issue(issue)
    i18n.set_locale("nope")  # falls back to en
    assert i18n.get_locale() == "en"
    assert "null values" in i18n.localize_issue(issue)
    assert i18n.t("report.issues", n=1, checks=2, rows=3) == "1 issues across 2 checks on 3 rows"


def test_retry_policy_rejects_zero_attempts():
    import pytest

    from truthound_spark.resilience import RetryPolicy

    with pytest.raises(ValueError):
        RetryPolicy(max_attempts=0)
