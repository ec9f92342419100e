"""Workspace context (reference: src/truthound/context.py:158-213 — the
zero-config ``.truthound/`` project dir with catalog/baselines/runs/docs,
plus ``metric-history.json``; data fingerprinting src/truthound/cache.py).

``check(..., workspace=...)`` wiring happens through Checkpoint/api callers;
the context itself is engine-agnostic persistence:
  * baselines: learned Schema JSON keyed by a stable source fingerprint
  * runs: ValidationRunResult JSON (FilesystemStore)
  * metric history: per-run scalar metrics appended for trend monitoring
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from typing import Any

from truthound_spark.core.results import ValidationRunResult
from truthound_spark.schema import Schema
from truthound_spark.stores import FilesystemStore


def source_fingerprint(df) -> str:
    """Stable identity for baseline lookup (reference cache.py role):
    hash of the schema (names + types). Content-independent by design —
    a baseline applies to the evolving table, not one snapshot."""
    sig = ",".join(f"{f.name}:{f.dataType.simpleString()}" for f in df.schema.fields)
    return hashlib.sha256(sig.encode()).hexdigest()[:16]


class Context:
    """``.truthound/`` workspace (reference context.py:158-213)."""

    def __init__(self, root: str = ".truthound") -> None:
        self.root = root
        for sub in ("baselines", "runs", "docs"):
            os.makedirs(os.path.join(root, sub), exist_ok=True)
        self.run_store = FilesystemStore(os.path.join(root, "runs"))
        self._history_path = os.path.join(root, "baselines", "metric-history.json")

    # -- baselines ------------------------------------------------------
    def baseline_path(self, key: str) -> str:
        return os.path.join(self.root, "baselines", f"{key}.json")

    def save_baseline(self, key: str, schema: Schema) -> None:
        schema.save(self.baseline_path(key))

    def load_baseline(self, key: str) -> Schema | None:
        path = self.baseline_path(key)
        return Schema.load(path) if os.path.exists(path) else None

    def resolve_baseline(self, df, learn_if_missing: bool = False) -> Schema | None:
        """Baseline for this source (reference suite.py:496-510 resolution):
        fingerprint lookup, optionally learning + persisting on miss."""
        key = source_fingerprint(df)
        baseline = self.load_baseline(key)
        if baseline is None and learn_if_missing:
            from truthound_spark.schema import learn

            baseline = learn(df)
            self.save_baseline(key, baseline)
        return baseline

    # -- runs + metric history -----------------------------------------
    def persist_run(self, result: ValidationRunResult, run_id: str | None = None) -> str:
        run_id = self.run_store.save(result, run_id)
        self._append_history(run_id, result)
        return run_id

    def _append_history(self, run_id: str, result: ValidationRunResult) -> None:
        history = self.metric_history()
        history.append(
            {
                "run_id": run_id,
                "ts": int(time.time()),
                "success": result.success,
                "row_count": result.row_count,
                "issues": len(result.issues),
                "checks_run": result.checks_run,
            }
        )
        with open(self._history_path, "w") as f:
            json.dump(history, f, indent=2)

    def metric_history(self) -> list[dict[str, Any]]:
        if not os.path.exists(self._history_path):
            return []
        with open(self._history_path) as f:
            return json.load(f)
