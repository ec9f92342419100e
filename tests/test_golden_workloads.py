"""Golden-workload issue-count parity (reference: benchmarks/workloads +
test_benchmark_parity.py): every release-ga workload shape from
BASELINE.md must produce exactly the expected issue count."""

from __future__ import annotations

import glob
import json
import os

import pytest

WORKLOAD_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "benchmarks",
    "workloads",
)

WORKLOADS = sorted(glob.glob(os.path.join(WORKLOAD_DIR, "*.json")))


@pytest.mark.parametrize("path", WORKLOADS, ids=[os.path.basename(p)[:-5] for p in WORKLOADS])
def test_golden_workload(spark, path):
    from benchmarks.run_workloads import run_workload

    wl = json.load(open(path))
    actual, expected = run_workload(spark, wl)
    assert actual == expected, f"{wl['id']}: {actual} != {expected}"
