"""Contract tests for the driver-facing query registry.

Fast (no Spark): every oracle must PARSE AND BIND in DuckDB against the
real sf0.001 tables (EXPLAIN — no execution), and the registry must be
internally consistent. Catches oracle syntax/typo regressions in
milliseconds instead of a failed driver round.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from truthound_spark.entry_queries import ORACLES, QUERIES

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
        )
    return c


def test_every_oracle_has_a_query():
    assert set(ORACLES) <= set(QUERIES), sorted(set(ORACLES) - set(QUERIES))


def test_registry_nonempty_and_callable():
    assert len(QUERIES) >= 160
    assert all(callable(fn) for fn in QUERIES.values())


def test_rows_only_entries_are_the_declared_exceptions():
    # Entries without an oracle get the driver's weaker rows-only check;
    # keep that set explicit so a forgotten oracle fails loudly. Since
    # round 6 the two former iterative rows-only entries carry invariant
    # oracles — the registry is 100% oracle-backed.
    rows_only = sorted(set(QUERIES) - set(ORACLES))
    assert rows_only == [], rows_only


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parses_and_binds(con, name):
    # EXPLAIN parses, binds columns/tables, and plans — without executing.
    con.execute(f"EXPLAIN {ORACLES[name]}")
