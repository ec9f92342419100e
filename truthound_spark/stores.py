"""Result stores (reference: src/truthound/stores/backends/{filesystem,
memory,database,s3,gcs,azure}.py — pluggable ValidationRunResult
persistence).

Local backends implemented fully (filesystem, memory). Object-store
backends reuse FilesystemStore against a mounted/fuse path or any
fsspec-style mount; a native S3/GCS client is deliberately out of scope
(engine-agnostic periphery, no cloud SDKs in this environment).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

from truthound_spark.core.results import ValidationRunResult


class MemoryStore:
    """reference: stores/backends/memory.py"""

    def __init__(self) -> None:
        self._runs: dict[str, dict[str, Any]] = {}

    def save(self, result: ValidationRunResult, run_id: str | None = None) -> str:
        run_id = run_id or f"run-{len(self._runs):06d}-{int(time.time())}"
        self._runs[run_id] = result.to_dict()
        return run_id

    def load(self, run_id: str) -> dict[str, Any]:
        return self._runs[run_id]

    def list_runs(self) -> list[str]:
        return sorted(self._runs)


class FilesystemStore:
    """reference: stores/backends/filesystem.py — one JSON per run under
    ``root`` (point root at a mounted object store for S3/GCS parity)."""

    def __init__(self, root: str = ".truthound/runs") -> None:
        self.root = root
        os.makedirs(root, exist_ok=True)

    def save(self, result: ValidationRunResult, run_id: str | None = None) -> str:
        run_id = run_id or f"run-{int(time.time() * 1000)}"
        path = os.path.join(self.root, f"{run_id}.json")
        with open(path, "w") as f:
            json.dump(result.to_dict(), f, indent=2, default=str)
        return run_id

    def load(self, run_id: str) -> dict[str, Any]:
        with open(os.path.join(self.root, f"{run_id}.json")) as f:
            return json.load(f)

    def list_runs(self) -> list[str]:
        return sorted(
            f[:-5] for f in os.listdir(self.root) if f.endswith(".json")
        )
