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


class DatabaseStore:
    """reference: stores/backends/database.py — run rows in a SQL table.

    Local engine is stdlib sqlite3 (also the oracle dialect); on a
    cluster point ``db_path`` at any DB the driver can reach, or persist
    results with spark.write.jdbc — the store schema is one (run_id,
    created_at, success, payload JSON) row either way."""

    def __init__(self, db_path: str = ".truthound/runs.db", table: str = "validation_runs") -> None:
        import sqlite3

        os.makedirs(os.path.dirname(db_path) or ".", exist_ok=True)
        self.db_path = db_path
        self.table = table
        with sqlite3.connect(self.db_path) as con:
            con.execute(
                f"CREATE TABLE IF NOT EXISTS {self.table} ("
                "run_id TEXT PRIMARY KEY, created_at REAL, success INTEGER, payload TEXT)"
            )

    def save(self, result: ValidationRunResult, run_id: str | None = None) -> str:
        import sqlite3

        run_id = run_id or f"run-{int(time.time() * 1000)}"
        with sqlite3.connect(self.db_path) as con:
            con.execute(
                f"INSERT OR REPLACE INTO {self.table} VALUES (?, ?, ?, ?)",
                (
                    run_id,
                    time.time(),
                    1 if result.success else 0,
                    json.dumps(result.to_dict(), default=str),
                ),
            )
        return run_id

    def load(self, run_id: str) -> dict[str, Any]:
        import sqlite3

        with sqlite3.connect(self.db_path) as con:
            row = con.execute(
                f"SELECT payload FROM {self.table} WHERE run_id = ?", (run_id,)
            ).fetchone()
        if row is None:
            raise KeyError(run_id)
        return json.loads(row[0])

    def list_runs(self) -> list[str]:
        import sqlite3

        with sqlite3.connect(self.db_path) as con:
            return sorted(
                r[0] for r in con.execute(f"SELECT run_id FROM {self.table}")
            )


class ObjectStoreStore(FilesystemStore):
    """reference: stores/backends/{s3,gcs,azure}.py — object-store run
    persistence. Spark-first: results are tiny JSON docs, so the store
    writes through the JVM's Hadoop filesystem layer (``s3a://``,
    ``gs://``, ``abfss://`` URIs all work wherever the cluster's Hadoop
    connectors are configured) with a local-path fallback."""

    def __init__(self, root: str, spark=None) -> None:
        self.root = root
        self.spark = spark
        if "://" not in root:
            os.makedirs(root, exist_ok=True)

    def _write(self, path: str, text: str) -> None:
        if "://" in self.root and self.spark is not None:
            # one-row text write through the cluster's Hadoop connector
            self.spark.createDataFrame([(text,)], "payload string").coalesce(
                1
            ).write.mode("overwrite").text(path)
        else:
            with open(path, "w") as f:
                f.write(text)

    def save(self, result: ValidationRunResult, run_id: str | None = None) -> str:
        run_id = run_id or f"run-{int(time.time() * 1000)}"
        sep = "" if self.root.endswith("/") else "/"
        self._write(
            f"{self.root}{sep}{run_id}.json",
            json.dumps(result.to_dict(), indent=2, default=str),
        )
        return run_id
