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
