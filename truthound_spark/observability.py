"""Audit logging + metrics emission (reference: validators/enterprise.py
#14 audit integration, #15 Prometheus/StatsD metrics; common/audit,
common/observability).

Engine-agnostic periphery kept deliberately thin: an append-only JSONL
audit trail of who ran what on which data, and a StatsD-line metrics
emitter with an injected transport (UDP in production, a list in tests —
same pattern as the checkpoint actions' injected senders).
"""

from __future__ import annotations

import getpass
import json
import os
import socket
import time
from typing import Any, Callable

from truthound_spark.core.results import ValidationRunResult


class AuditLog:
    """Append-only who/when/what trail (reference enterprise.py #14)."""

    def __init__(self, path: str = ".truthound/audit.jsonl") -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self.path = path

    def record(
        self,
        action: str,
        result: ValidationRunResult | None = None,
        **context: Any,
    ) -> dict[str, Any]:
        try:
            user = getpass.getuser()
        except (KeyError, OSError):  # containers with no passwd entry / env
            user = f"uid:{os.getuid()}" if hasattr(os, "getuid") else "unknown"
        entry = {
            "ts": time.time(),
            "user": user,
            "host": socket.gethostname(),
            "action": action,
            **context,
        }
        if result is not None:
            entry.update(
                success=result.success,
                issues=len(result.issues),
                checks_run=result.checks_run,
                row_count=result.row_count,
            )
        with open(self.path, "a") as f:
            f.write(json.dumps(entry, default=str) + "\n")
        return entry

    def entries(self) -> list[dict[str, Any]]:
        if not os.path.exists(self.path):
            return []
        with open(self.path) as f:
            return [json.loads(line) for line in f if line.strip()]


class MetricsEmitter:
    """StatsD line-protocol metrics (reference enterprise.py #15).

    ``transport`` receives each formatted line; the default sends UDP to
    a StatsD agent, tests inject a collector."""

    def __init__(
        self,
        prefix: str = "truthound",
        host: str = "127.0.0.1",
        port: int = 8125,
        transport: Callable[[str], Any] | None = None,
    ) -> None:
        self.prefix = prefix
        self.host = host
        self.port = port
        self._transport = transport or self._udp

    def _udp(self, line: str) -> None:  # pragma: no cover - needs an agent
        sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        try:
            sock.sendto(line.encode(), (self.host, self.port))
        finally:
            sock.close()

    def gauge(self, name: str, value: float, **tags: str) -> None:
        self._send(name, value, "g", tags)

    def count(self, name: str, value: int = 1, **tags: str) -> None:
        self._send(name, value, "c", tags)

    def timing(self, name: str, seconds: float, **tags: str) -> None:
        self._send(name, seconds * 1000.0, "ms", tags)

    def _send(self, name: str, value: float, kind: str, tags: dict[str, str]) -> None:
        line = f"{self.prefix}.{name}:{value}|{kind}"
        if tags:
            line += "|#" + ",".join(f"{k}:{v}" for k, v in sorted(tags.items()))
        self._transport(line)

    def emit_result(self, name: str, result: ValidationRunResult, elapsed: float | None = None) -> None:
        """Standard per-run metric set."""
        self.count("runs", 1, suite=name, status="pass" if result.success else "fail")
        self.gauge("issues", len(result.issues), suite=name)
        self.gauge("checks", result.checks_run, suite=name)
        self.gauge("rows", result.row_count, suite=name)
        if elapsed is not None:
            self.timing("run_seconds", elapsed, suite=name)
