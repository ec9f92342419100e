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


def test_canary_normalization_rule():
    """VERDICT r10 #2: ratios divide by the canary's own round-over-best
    ratio — ambient load moves both together (normalized flat), a real
    regression moves only its query (normalized still flags it)."""
    b = _bench()
    ratios = {"a": 1.3, "b": 1.25, "real_regression": 2.6}
    # ambient-load round: canary 30% slower than its best
    norm, load = b.normalize_ratios(ratios, canary_seconds=1.3, best_canary=1.0)
    assert load == 1.3
    assert norm["a"] == 1.0 and norm["b"] == 0.96  # drift explained away
    assert norm["real_regression"] == 2.0  # still flagged after normalizing
    # idle round: canary at its best → normalization is the identity
    norm, load = b.normalize_ratios(ratios, canary_seconds=1.0, best_canary=1.0)
    assert load == 1.0 and norm == ratios
    # no canary history yet → identity with load 1.0
    norm, load = b.normalize_ratios(ratios, canary_seconds=1.2, best_canary=None)
    assert load == 1.0 and norm == ratios


def test_best_recorded_canary_parses_history(tmp_path):
    import json

    b = _bench()
    (tmp_path / "BENCH_r11.json").write_text(
        json.dumps({"parsed": {"canary": 1.4}})
    )
    (tmp_path / "BENCH_r12.json").write_text(
        json.dumps({"parsed": {"canary": 1.1}})
    )
    (tmp_path / "BENCH_r13.json").write_text(json.dumps({"parsed": {}}))
    (tmp_path / "BENCH_r14.json").write_text("not json")
    assert b.best_recorded_canary(str(tmp_path)) == 1.1
    assert b.best_recorded_canary(str(tmp_path / "empty_missing")) is None


def test_canary_is_pinned_and_io_free():
    """The canary must never be edited: pin its constants and assert its
    plan uses no file source (spark.range only)."""
    b = _bench()
    assert b.CANARY_ROWS == 10_000_000
    assert b.CANARY_SEED == 0x5EED11
    import inspect

    src = inspect.getsource(b.canary_fn)
    assert "spark.range" in src and "read" not in src and "parquet" not in src


def test_core_decades_lane_wired():
    src = open(os.path.join(os.path.dirname(__file__), "..", "bench.py")).read()
    assert "SPARK_GRAFT_CORE_LANE" in src
    assert "SPARK_GRAFT_CORE_BUDGET" in src
    assert "core_lane" in src


def test_bracket_canary_rule():
    """r11: min of the start/end canary drives normalization; the spread
    records intra-run burstiness a single start-of-run sample misses."""
    b = _bench()
    lo, spread = b.bracket_canary(0.42, 0.42)
    assert lo == 0.42 and spread == 1.0
    # burst arrived mid-run: end canary slower
    lo, spread = b.bracket_canary(0.42, 1.26)
    assert lo == 0.42 and spread == 3.0
    # burst present at start, gone by the end
    lo, spread = b.bracket_canary(1.26, 0.42)
    assert lo == 0.42 and spread == 3.0
    # degenerate zero never divides
    lo, spread = b.bracket_canary(0.0, 0.5)
    assert spread == 1.0


def test_bracket_canary_mid_sample():
    import bench as b

    # the mid sample participates in both the min and the spread
    lo, spread = b.bracket_canary(0.42, 0.44, 0.40)
    assert lo == 0.40 and spread == round(0.44 / 0.40, 3)
    # a burst visible ONLY at the mid sample still widens the spread
    lo, spread = b.bracket_canary(0.42, 0.42, 1.3)
    assert lo == 0.42 and spread == round(1.3 / 0.42, 3)
