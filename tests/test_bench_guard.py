"""bench.py warm-sample spread guard (VERDICT r9 #1) — rule pins.

Importing bench.py defines its helpers without starting Spark or
running main(); these tests pin the guard's trigger condition and its
drop-the-slowest semantics against the two motivating series."""

from __future__ import annotations

import importlib.util
import os
import sys


def _bench():
    path = os.path.join(os.path.dirname(__file__), "..", "bench.py")
    spec = importlib.util.spec_from_file_location("bench_under_test", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench_under_test"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_guard_triggers_only_past_ratio():
    b = _bench()
    assert b.spread_guard_triggers([13.6, 3.74, 0.78])  # 17x spread
    assert b.spread_guard_triggers([0.80, 0.79, 3.2])  # late contention
    assert not b.spread_guard_triggers([1.0, 1.2, 0.9])  # tight series
    assert not b.spread_guard_triggers([1.0, 2.9, 1.5])  # under 3x
    assert not b.spread_guard_triggers([0.0, 1.0, 1.0])  # degenerate min


def test_guard_drops_slowest_not_first():
    b = _bench()
    # the r9 pin series: cold first pass — extra pass came in warm
    kept = b.apply_spread_guard([13.6, 3.74, 0.78, 0.82])
    assert sorted(kept) == [0.78, 0.82, 3.74]
    assert sorted(kept)[1] < 1.0  # median no longer polluted
    # late contention: dropping the FIRST would median 3.0 into the pin
    kept = b.apply_spread_guard([0.80, 0.79, 3.2, 3.0])
    assert sorted(kept) == [0.79, 0.80, 3.0]
    assert sorted(kept)[1] == 0.80  # median = clean sample


def test_sf10_lane_env_defaults():
    b = _bench()
    # the lane and its budget knob exist (regression guard for the
    # driver-run default path)
    assert b.SPREAD_GUARD_RATIO == 3.0
    src = open(os.path.join(os.path.dirname(__file__), "..", "bench.py")).read()
    assert "SPARK_GRAFT_SF10_BUDGET" in src
    assert "skipped_budget" in src
