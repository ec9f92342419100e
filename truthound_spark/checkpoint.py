"""Checkpoint orchestration (reference: src/truthound/checkpoint/
checkpoint.py:220 Checkpoint — a named suite + data + post-run actions;
action implementations checkpoint/actions/*.py).

Actions are engine-agnostic callables receiving the run result. Network
actions (slack/webhook/email/pagerduty/teams/...) share one WebhookAction
shape — the HTTP POST is injected so environments without network access
(and unit tests) can capture the payload instead of sending it.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any, Callable

from truthound_spark.core.results import ValidationRunResult


class ConsoleAction:
    """reference: checkpoint/actions (console reporter action)."""

    def __call__(self, name: str, result: ValidationRunResult) -> None:
        from truthound_spark.reporters import render_console

        print(f"[checkpoint {name}]")
        print(render_console(result))


class StoreResultAction:
    """reference: checkpoint/actions/store_result.py"""

    def __init__(self, store) -> None:
        self.store = store

    def __call__(self, name: str, result: ValidationRunResult) -> str:
        return self.store.save(result)


class SaveReportAction:
    """reference: checkpoint/actions/update_docs.py (datadocs refresh)."""

    def __init__(self, path: str, format: str | None = None) -> None:
        self.path = path
        self.format = format

    def __call__(self, name: str, result: ValidationRunResult) -> None:
        from truthound_spark.reporters import save_report

        save_report(result, self.path, self.format)


class WebhookAction:
    """reference: checkpoint/actions/{slack,webhook,teams,discord,...}.py —
    all are a JSON POST with a service-specific payload shape."""

    def __init__(
        self,
        url: str,
        payload_format: str = "generic",
        only_on_failure: bool = True,
        sender: Callable[[str, bytes], Any] | None = None,
    ) -> None:
        self.url = url
        self.payload_format = payload_format
        self.only_on_failure = only_on_failure
        self._sender = sender or self._default_sender

    @staticmethod
    def _default_sender(url: str, body: bytes):
        from urllib.request import Request, urlopen

        req = Request(url, data=body, headers={"Content-Type": "application/json"})
        return urlopen(req, timeout=10)

    def payload(self, name: str, result: ValidationRunResult) -> dict[str, Any]:
        summary = (
            f"checkpoint {name}: {'PASS' if result.success else 'FAIL'} "
            f"({len(result.issues)} issues / {result.checks_run} checks)"
        )
        if self.payload_format == "slack":
            return {"text": summary}
        return {"checkpoint": name, "success": result.success, "summary": summary,
                "issues": len(result.issues)}

    def __call__(self, name: str, result: ValidationRunResult) -> Any:
        if self.only_on_failure and result.success:
            return None
        body = json.dumps(self.payload(name, result)).encode()
        return self._sender(self.url, body)


@dataclass
class Checkpoint:
    """Named validation checkpoint (reference: checkpoint/checkpoint.py:220).

    >>> cp = Checkpoint("daily", validators=["null", "unique"],
    ...                 actions=[ConsoleAction()])
    >>> result = cp.run(df)
    """

    name: str
    validators: list[Any] | None = None
    actions: list[Callable[[str, ValidationRunResult], Any]] = field(default_factory=list)
    min_severity: Any = None

    def run(self, data: Any, **check_kwargs: Any) -> ValidationRunResult:
        from truthound_spark import api

        result = api.check(
            data,
            validators=self.validators,
            min_severity=self.min_severity,
            **check_kwargs,
        )
        for action in self.actions:
            action(self.name, result)
        return result


# ---------------------------------------------------------------------------
# triggers (reference: checkpoint/triggers/{schedule,event}.py)
# ---------------------------------------------------------------------------


class ScheduleTrigger:
    """Interval schedule (reference triggers/schedule.py:53): fires when
    ``interval_seconds`` have elapsed since the last run. Poll-style —
    call ``due(now)``; an external scheduler (cron/airflow) owns the loop."""

    def __init__(self, interval_seconds: float) -> None:
        self.interval_seconds = interval_seconds
        self.last_fired: float | None = None

    def due(self, now: float | None = None) -> bool:
        import time as _time

        now = _time.time() if now is None else now
        if self.last_fired is None or now - self.last_fired >= self.interval_seconds:
            self.last_fired = now
            return True
        return False


class FileWatchTrigger:
    """File-modification trigger (reference triggers/event.py:46): fires
    when the watched path's mtime advances past the last seen value."""

    def __init__(self, path: str) -> None:
        self.path = path
        self._last_mtime: float | None = None

    def due(self, now: float | None = None) -> bool:
        import os as _os

        try:
            mtime = _os.stat(self.path).st_mtime
        except FileNotFoundError:
            return False
        if self._last_mtime is None or mtime > self._last_mtime:
            self._last_mtime = mtime
            return True
        return False


def run_when_due(
    checkpoint: "Checkpoint", trigger, data: Any, **check_kwargs: Any
):
    """One poll step: run the checkpoint iff the trigger is due."""
    if trigger.due():
        return checkpoint.run(data, **check_kwargs)
    return None


# ---------------------------------------------------------------------------
# service-specific notification actions (reference: checkpoint/actions/
# {slack,teams,discord,telegram,pagerduty,opsgenie,email,github_action}.py)
# — each is the generic WebhookAction with that service's payload contract.
# ---------------------------------------------------------------------------


class SlackAction(WebhookAction):
    """reference: checkpoint/actions/slack.py — Block Kit message."""

    def payload(self, name: str, result: ValidationRunResult) -> dict[str, Any]:
        status = ":white_check_mark: PASS" if result.success else ":x: FAIL"
        return {
            "text": f"{status} checkpoint {name}",
            "blocks": [
                {
                    "type": "section",
                    "text": {
                        "type": "mrkdwn",
                        "text": (
                            f"*{status}* `{name}` — {len(result.issues)} issues "
                            f"/ {result.checks_run} checks / {result.row_count} rows"
                        ),
                    },
                }
            ],
        }


class TeamsAction(WebhookAction):
    """reference: checkpoint/actions/teams.py — MessageCard."""

    def payload(self, name: str, result: ValidationRunResult) -> dict[str, Any]:
        return {
            "@type": "MessageCard",
            "@context": "https://schema.org/extensions",
            "themeColor": "2EB886" if result.success else "CC0000",
            "summary": f"checkpoint {name}",
            "sections": [
                {
                    "activityTitle": f"Checkpoint {name}: "
                    + ("PASS" if result.success else "FAIL"),
                    "facts": [
                        {"name": "issues", "value": str(len(result.issues))},
                        {"name": "checks", "value": str(result.checks_run)},
                        {"name": "rows", "value": str(result.row_count)},
                    ],
                }
            ],
        }


class DiscordAction(WebhookAction):
    """reference: checkpoint/actions/discord.py — embed payload."""

    def payload(self, name: str, result: ValidationRunResult) -> dict[str, Any]:
        return {
            "embeds": [
                {
                    "title": f"Checkpoint {name}",
                    "description": ("PASS" if result.success else "FAIL")
                    + f" — {len(result.issues)} issues / {result.checks_run} checks",
                    "color": 3066993 if result.success else 15158332,
                }
            ]
        }


class TelegramAction(WebhookAction):
    """reference: checkpoint/actions/telegram.py — sendMessage body
    (url should be https://api.telegram.org/bot<token>/sendMessage)."""

    def __init__(self, url: str, chat_id: str, **kw: Any) -> None:
        super().__init__(url, **kw)
        self.chat_id = chat_id

    def payload(self, name: str, result: ValidationRunResult) -> dict[str, Any]:
        status = "PASS" if result.success else "FAIL"
        return {
            "chat_id": self.chat_id,
            "text": f"checkpoint {name}: {status} "
            f"({len(result.issues)} issues / {result.checks_run} checks)",
        }


class PagerDutyAction(WebhookAction):
    """reference: checkpoint/actions/pagerduty.py — Events API v2."""

    def __init__(self, routing_key: str, url: str = "https://events.pagerduty.com/v2/enqueue", **kw: Any) -> None:
        super().__init__(url, **kw)
        self.routing_key = routing_key

    def payload(self, name: str, result: ValidationRunResult) -> dict[str, Any]:
        return {
            "routing_key": self.routing_key,
            "event_action": "trigger",
            "payload": {
                "summary": f"checkpoint {name} failed: {len(result.issues)} issues",
                "source": "truthound_spark",
                "severity": "error",
                "custom_details": {
                    "checks_run": result.checks_run,
                    "row_count": result.row_count,
                },
            },
        }


class OpsgenieAction(WebhookAction):
    """reference: checkpoint/actions/opsgenie.py — alert create body."""

    def payload(self, name: str, result: ValidationRunResult) -> dict[str, Any]:
        return {
            "message": f"checkpoint {name} failed",
            "description": f"{len(result.issues)} issues / {result.checks_run} checks",
            "priority": "P3" if len(result.issues) < 10 else "P2",
        }


class EmailAction:
    """reference: checkpoint/actions/email.py — SMTP notification; the
    transport is injected (like WebhookAction's sender) so tests and
    offline environments capture the message instead of sending."""

    def __init__(
        self,
        to: list[str],
        sender: str = "truthound@localhost",
        smtp_host: str = "localhost",
        smtp_port: int = 25,
        only_on_failure: bool = True,
        transport: Callable[[str, int, str, list[str], str], Any] | None = None,
    ) -> None:
        self.to = to
        self.sender = sender
        self.smtp_host = smtp_host
        self.smtp_port = smtp_port
        self.only_on_failure = only_on_failure
        self._transport = transport or self._smtp_transport

    @staticmethod
    def _smtp_transport(host: str, port: int, sender: str, to: list[str], message: str):
        import smtplib

        with smtplib.SMTP(host, port, timeout=10) as s:
            s.sendmail(sender, to, message)

    def message(self, name: str, result: ValidationRunResult) -> str:
        from email.mime.text import MIMEText

        from truthound_spark.reporters import render_markdown

        status = "PASS" if result.success else "FAIL"
        msg = MIMEText(render_markdown(result))
        msg["Subject"] = f"[truthound] checkpoint {name}: {status}"
        msg["From"] = self.sender
        msg["To"] = ", ".join(self.to)
        return msg.as_string()

    def __call__(self, name: str, result: ValidationRunResult) -> Any:
        if self.only_on_failure and result.success:
            return None
        return self._transport(
            self.smtp_host, self.smtp_port, self.sender, self.to, self.message(name, result)
        )


class GitHubActionAction:
    """reference: checkpoint/actions/github_action.py — workflow-command
    annotations on stdout + step summary to $GITHUB_STEP_SUMMARY."""

    def __init__(self, summary_path: str | None = None) -> None:
        import os as _os

        self.summary_path = summary_path or _os.environ.get("GITHUB_STEP_SUMMARY")

    def __call__(self, name: str, result: ValidationRunResult) -> None:
        from truthound_spark.reporters import render_markdown

        level = "notice" if result.success else "error"
        print(
            f"::{level} title=truthound checkpoint {name}::"
            f"{len(result.issues)} issues / {result.checks_run} checks"
        )
        if self.summary_path:
            with open(self.summary_path, "a") as f:
                f.write(f"## Checkpoint {name}\n\n{render_markdown(result)}\n")
