"""Cron scheduling tests (VERDICT r5 item 9): parser semantics, preset
table parity against the reference source, and the checkpoint trigger."""

from __future__ import annotations

import re
from datetime import datetime
from pathlib import Path

import pytest

from truthound_spark.scheduling import (
    CronExpression,
    CronParseError,
    CronTrigger,
    PRESETS,
    _PRESET_STRINGS,
    get_preset,
    list_presets,
)

REF_PRESETS = Path("/root/reference/src/truthound/scheduling/presets.py")


def test_preset_table_parity_with_reference():
    """Name-for-name and expression-for-expression parity with the
    reference's PRESETS dict (presets.py:151), extracted by regex from the
    source (same approach as test_reference_name_parity)."""
    if not REF_PRESETS.exists():
        pytest.skip("reference source not present")
    src = REF_PRESETS.read_text()
    const_exprs = dict(
        re.findall(r'^([A-Z_0-9]+) = CronExpression\.parse\("([^"]+)"\)', src, re.M)
    )
    for alias, target in re.findall(r"^([A-Z_0-9]+) = ([A-Z_0-9]+)$", src, re.M):
        if target in const_exprs:
            const_exprs[alias] = const_exprs[target]
    table = re.search(r"PRESETS: dict\[str, CronExpression\] = \{(.*?)\n\}", src, re.S)
    assert table
    ref = dict(re.findall(r'"([a-z_0-9]+)": ([A-Z_0-9]+)', table.group(1)))
    ref_named = {name: const_exprs[const] for name, const in ref.items()}
    assert ref_named == _PRESET_STRINGS


def test_every_preset_parses_and_fires():
    after = datetime(2026, 3, 10, 10, 30)  # a Tuesday
    for name in list_presets():
        expr = PRESETS[name]
        nxt = expr.next(after)
        assert nxt is not None and nxt > after, name
        assert expr.matches(nxt), name


@pytest.mark.parametrize(
    "preset,after,expected",
    [
        ("daily", datetime(2026, 3, 10, 10, 30), datetime(2026, 3, 11, 0, 0)),
        ("hourly", datetime(2026, 3, 10, 10, 30), datetime(2026, 3, 10, 11, 0)),
        ("weekdays_9am", datetime(2026, 3, 13, 10, 0), datetime(2026, 3, 16, 9, 0)),  # Fri 10am → Mon
        ("weekly", datetime(2026, 3, 10, 0, 0), datetime(2026, 3, 15, 0, 0)),  # → Sunday
        ("last_of_month", datetime(2026, 2, 1, 0, 0), datetime(2026, 2, 28, 6, 0)),
        ("first_monday", datetime(2026, 3, 3, 0, 0), datetime(2026, 4, 6, 9, 0)),  # Mar 1st-Mon passed (Mar 2)
        ("last_friday", datetime(2026, 3, 1, 0, 0), datetime(2026, 3, 27, 17, 0)),
        ("end_of_quarter", datetime(2026, 1, 15, 0, 0), datetime(2026, 3, 31, 0, 0)),
        ("quarterly", datetime(2026, 2, 1, 0, 0), datetime(2026, 4, 1, 0, 0)),
        ("twice_daily", datetime(2026, 3, 10, 13, 0), datetime(2026, 3, 11, 0, 0)),
        ("business_hours_15min", datetime(2026, 3, 10, 9, 7), datetime(2026, 3, 10, 9, 15)),
        ("weekends_noon", datetime(2026, 3, 10, 0, 0), datetime(2026, 3, 14, 12, 0)),  # → Saturday
    ],
)
def test_preset_next_fire_times(preset, after, expected):
    assert get_preset(preset).next(after) == expected


def test_cron_grammar():
    e = CronExpression("*/15 9-17 * * 1-5")
    assert e.matches(datetime(2026, 3, 10, 9, 45))
    assert not e.matches(datetime(2026, 3, 10, 18, 0))
    assert not e.matches(datetime(2026, 3, 14, 9, 15))  # Saturday

    # names, 7=Sunday, wrap-around ranges, aliases
    assert CronExpression("0 0 * JAN *").matches(datetime(2026, 1, 5))
    assert CronExpression("0 0 * * SUN").matches(datetime(2026, 3, 15))
    assert CronExpression("0 0 * * 7").matches(datetime(2026, 3, 15))
    wrap = CronExpression("0 0 * * FRI-MON")
    for day in (13, 14, 15, 16):  # Fri..Mon in Mar 2026
        assert wrap.matches(datetime(2026, 3, day)), day
    assert not wrap.matches(datetime(2026, 3, 17))  # Tuesday
    assert CronExpression("@daily").next(datetime(2026, 3, 10, 5)) == datetime(2026, 3, 11)

    # seconds field
    s = CronExpression("*/30 * * * * *")
    assert s.has_seconds
    assert s.next(datetime(2026, 3, 10, 0, 0, 1)) == datetime(2026, 3, 10, 0, 0, 30)

    # step with start: "10/20 * * * *" = minutes 10,30,50
    st = CronExpression("10/20 * * * *")
    assert st.matches(datetime(2026, 1, 1, 0, 30))
    assert not st.matches(datetime(2026, 1, 1, 0, 20))

    with pytest.raises(CronParseError):
        CronExpression("* * * *")
    with pytest.raises(CronParseError):
        CronExpression("61 * * * *")
    with pytest.raises(CronParseError):
        CronExpression("* * * * 1#6")


def test_next_n_and_leap_february():
    e = CronExpression("0 6 L * *")  # last day of month, 06:00
    runs = e.next_n(3, datetime(2028, 1, 1))
    assert runs == [
        datetime(2028, 1, 31, 6, 0),
        datetime(2028, 2, 29, 6, 0),  # leap year
        datetime(2028, 3, 31, 6, 0),
    ]


def test_cron_trigger_due():
    trig = CronTrigger("hourly")
    t0 = datetime(2026, 3, 10, 10, 30)
    assert trig.due(t0) is False  # arms, no retroactive fire
    assert trig.due(datetime(2026, 3, 10, 10, 59)) is False
    assert trig.due(datetime(2026, 3, 10, 11, 0)) is True  # boundary crossed
    assert trig.due(datetime(2026, 3, 10, 11, 30)) is False  # not again
    assert trig.due(datetime(2026, 3, 10, 13, 5)) is True  # missed ones coalesce

    # raw expression accepted too
    raw = CronTrigger("*/5 * * * *")
    raw.due(datetime(2026, 3, 10, 10, 1))
    assert raw.due(datetime(2026, 3, 10, 10, 6)) is True


def test_preset_lookup_forms():
    assert get_preset("WEEKDAYS-9AM") is PRESETS["weekdays_9am"]
    assert get_preset("nope") is None
    # reference scheduling/presets.py defines exactly 33 named presets;
    # parity is 1:1 (verified by name-set diff against the reference)
    assert len(list_presets()) == 33
