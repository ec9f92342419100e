"""Cron scheduling: expression parsing, named presets, checkpoint trigger
(reference: src/truthound/scheduling/cron.py, presets.py — reimplemented
from the cron grammar, not translated; the preset TABLE mirrors the
reference name-for-name so suites configured against it port verbatim).

Semantics notes (matching the reference, asserted by tests):
- Fields are ANDed — when both day-of-month and day-of-week are
  restricted, a datetime must satisfy BOTH (the reference's
  ``CronExpression.matches`` checks every field; classic vixie-cron ORs
  these two — none of the presets depend on the difference).
- Day-of-week: 0 = Sunday (cron convention), 7 accepted as Sunday.
- Specials: ``L`` in day-of-month (last day of month), ``<dow>L`` (last
  such weekday of the month), ``<dow>#<n>`` (nth such weekday).
- Aliases: @yearly @annually @monthly @weekly @daily @midnight @hourly
  @every_minute; a 6th leading field adds seconds (@every_second).
"""

from __future__ import annotations

import calendar
from dataclasses import dataclass, field as dc_field
from datetime import datetime, timedelta


class CronParseError(ValueError):
    """Invalid cron expression."""


_ALIASES = {
    "@yearly": "0 0 1 1 *",
    "@annually": "0 0 1 1 *",
    "@monthly": "0 0 1 * *",
    "@weekly": "0 0 * * 0",
    "@daily": "0 0 * * *",
    "@midnight": "0 0 * * *",
    "@hourly": "0 * * * *",
    "@every_minute": "* * * * *",
    "@every_second": "* * * * * *",
}

_MONTH_NAMES = {
    n: i + 1
    for i, n in enumerate(
        ["jan", "feb", "mar", "apr", "may", "jun", "jul", "aug", "sep", "oct", "nov", "dec"]
    )
}
_DOW_NAMES = {n: i for i, n in enumerate(["sun", "mon", "tue", "wed", "thu", "fri", "sat"])}

# field order for 5-field expressions; a 6-field expression prepends seconds
_FIELDS = [
    ("minute", 0, 59),
    ("hour", 0, 23),
    ("day_of_month", 1, 31),
    ("month", 1, 12),
    ("day_of_week", 0, 6),
]


@dataclass
class _Field:
    name: str
    any: bool = False
    values: frozenset[int] = dc_field(default_factory=frozenset)
    #: day-of-month 'L' (last day of month)
    last_day: bool = False
    #: day-of-week '<d>L' entries (last <d>-weekday of month)
    last_dow: frozenset[int] = dc_field(default_factory=frozenset)
    #: day-of-week '<d>#<n>' entries
    nth_dow: frozenset[tuple[int, int]] = dc_field(default_factory=frozenset)


def _resolve_token(tok: str, name: str, lo: int, hi: int) -> int:
    t = tok.lower()
    if name == "month" and t in _MONTH_NAMES:
        return _MONTH_NAMES[t]
    if name == "day_of_week" and t in _DOW_NAMES:
        return _DOW_NAMES[t]
    try:
        v = int(tok)
    except ValueError as exc:
        raise CronParseError(f"bad value {tok!r} in {name}") from exc
    if name == "day_of_week" and v == 7:
        v = 0
    if not lo <= v <= hi:
        raise CronParseError(f"{name} value {v} outside [{lo},{hi}]")
    return v


def _parse_field(part: str, name: str, lo: int, hi: int) -> _Field:
    f = _Field(name=name)
    vals: set[int] = set()
    last_dow: set[int] = set()
    nth: set[tuple[int, int]] = set()
    for item in part.split(","):
        if not item:
            raise CronParseError(f"empty item in {name}")
        if item == "*" or item == "?":
            f.any = True
            continue
        if name == "day_of_month" and item.upper() == "L":
            f.last_day = True
            continue
        if name == "day_of_week" and item.upper().endswith("L") and len(item) > 1:
            last_dow.add(_resolve_token(item[:-1], name, lo, hi))
            continue
        if name == "day_of_week" and "#" in item:
            d, _, n = item.partition("#")
            nd = int(n)
            if not 1 <= nd <= 5:
                raise CronParseError(f"nth weekday {nd} outside [1,5]")
            nth.add((_resolve_token(d, name, lo, hi), nd))
            continue
        step = 1
        rng = item
        if "/" in item:
            rng, _, s = item.partition("/")
            try:
                step = int(s)
            except ValueError as exc:
                raise CronParseError(f"bad step {s!r} in {name}") from exc
            if step < 1:
                raise CronParseError(f"step must be >= 1 in {name}")
        if rng == "*":
            a, b = lo, hi
        elif "-" in rng:
            x, _, y = rng.partition("-")
            a, b = _resolve_token(x, name, lo, hi), _resolve_token(y, name, lo, hi)
        else:
            a = b = _resolve_token(rng, name, lo, hi)
            if "/" in item:
                b = hi  # "a/step" = "a-hi/step"
        if a > b:
            # wrap-around range (e.g. FRI-MON): both halves
            vals.update(range(a, hi + 1, step))
            vals.update(range(lo, b + 1, step))
        else:
            vals.update(range(a, b + 1, step))
    f.values = frozenset(vals)
    f.last_dow = frozenset(last_dow)
    f.nth_dow = frozenset(nth)
    return f


class CronExpression:
    """A parsed cron expression; ``matches``/``next``/``next_n`` mirror the
    reference surface (scheduling/cron.py:634-830)."""

    def __init__(self, expression: str) -> None:
        self.expression = expression.strip()
        expr = _ALIASES.get(self.expression.lower(), self.expression)
        parts = expr.split()
        if len(parts) == 6:
            self.has_seconds = True
            self.second = _parse_field(parts[0], "second", 0, 59)
            parts = parts[1:]
        elif len(parts) == 5:
            self.has_seconds = False
            self.second = None
        else:
            raise CronParseError(
                f"expected 5 or 6 fields, got {len(parts)}: {expression!r}"
            )
        self.fields = {
            name: _parse_field(p, name, lo, hi)
            for p, (name, lo, hi) in zip(parts, _FIELDS)
        }

    @classmethod
    def parse(cls, expression: str) -> "CronExpression":
        return cls(expression)

    # -- matching -----------------------------------------------------------
    def _match_simple(self, f: _Field, v: int) -> bool:
        return f.any or v in f.values

    def _match_dom(self, dt: datetime) -> bool:
        f = self.fields["day_of_month"]
        if f.any and not f.last_day:
            return True
        if f.last_day and dt.day == calendar.monthrange(dt.year, dt.month)[1]:
            return True
        return dt.day in f.values

    def _match_dow(self, dt: datetime) -> bool:
        f = self.fields["day_of_week"]
        if f.any and not (f.last_dow or f.nth_dow):
            return True
        cron_dow = (dt.weekday() + 1) % 7  # Monday=0 python → Sunday=0 cron
        if cron_dow in f.values:
            return True
        if f.last_dow and cron_dow in f.last_dow:
            if dt.day + 7 > calendar.monthrange(dt.year, dt.month)[1]:
                return True
        if f.nth_dow:
            n = (dt.day - 1) // 7 + 1
            if (cron_dow, n) in f.nth_dow:
                return True
        return False

    def matches(self, dt: datetime) -> bool:
        if self.has_seconds and not self._match_simple(self.second, dt.second):
            return False
        return (
            self._match_simple(self.fields["minute"], dt.minute)
            and self._match_simple(self.fields["hour"], dt.hour)
            and self._match_dom(dt)
            and self._match_simple(self.fields["month"], dt.month)
            and self._match_dow(dt)
        )

    # -- iteration ----------------------------------------------------------
    def next(self, after: datetime | None = None) -> datetime | None:
        """Next matching datetime strictly after ``after`` (default now).
        Field-skipping advance: wrong month jumps to the 1st of the next
        month, wrong day to next midnight, wrong hour to the next hour —
        bounded iterations even for @yearly."""
        after = datetime.now() if after is None else after
        if self.has_seconds:
            cur = after.replace(microsecond=0) + timedelta(seconds=1)
        else:
            cur = after.replace(second=0, microsecond=0) + timedelta(minutes=1)
        end = cur + timedelta(days=366 * 4)
        step = timedelta(seconds=1) if self.has_seconds else timedelta(minutes=1)
        while cur < end:
            if not self._match_simple(self.fields["month"], cur.month):
                nxt_month = cur.month % 12 + 1
                nxt_year = cur.year + (1 if nxt_month == 1 else 0)
                cur = cur.replace(
                    year=nxt_year, month=nxt_month, day=1,
                    hour=0, minute=0, second=0,
                )
                continue
            if not (self._match_dom(cur) and self._match_dow(cur)):
                cur = (cur + timedelta(days=1)).replace(hour=0, minute=0, second=0)
                continue
            if not self._match_simple(self.fields["hour"], cur.hour):
                cur = (cur + timedelta(hours=1)).replace(minute=0, second=0)
                continue
            if not self._match_simple(self.fields["minute"], cur.minute):
                cur = (cur + timedelta(minutes=1)).replace(second=0)
                continue
            if self.matches(cur):
                return cur
            cur += step
        return None

    def next_n(self, n: int, after: datetime | None = None) -> list[datetime]:
        out: list[datetime] = []
        cur = datetime.now() if after is None else after
        for _ in range(n):
            nxt = self.next(cur)
            if nxt is None:
                break
            out.append(nxt)
            cur = nxt
        return out

    def __repr__(self) -> str:  # pragma: no cover
        return f"CronExpression({self.expression!r})"


# ---------------------------------------------------------------------------
# presets (name-for-name parity with reference scheduling/presets.py:151)
# ---------------------------------------------------------------------------
_PRESET_STRINGS: dict[str, str] = {
    # Standard
    "yearly": "0 0 1 1 *",
    "annually": "0 0 1 1 *",
    "monthly": "0 0 1 * *",
    "weekly": "0 0 * * 0",
    "daily": "0 0 * * *",
    "midnight": "0 0 * * *",
    "hourly": "0 * * * *",
    "every_minute": "* * * * *",
    "every_second": "* * * * * *",
    # Business
    "weekdays_9am": "0 9 * * 1-5",
    "weekdays_6pm": "0 18 * * 1-5",
    "business_start": "0 8 * * 1-5",
    "business_end": "0 17 * * 1-5",
    "business_hours_15min": "*/15 9-17 * * 1-5",
    "business_hours_hourly": "0 9-17 * * 1-5",
    # Month boundaries
    "first_of_month": "0 6 1 * *",
    "last_of_month": "0 6 L * *",
    "first_monday": "0 9 * * 1#1",
    "last_friday": "0 17 * * 5L",
    # Data pipeline
    "every_5_min": "*/5 * * * *",
    "every_15_min": "*/15 * * * *",
    "every_30_min": "*/30 * * * *",
    "every_2_hours": "0 */2 * * *",
    "every_4_hours": "0 */4 * * *",
    "every_6_hours": "0 */6 * * *",
    "twice_daily": "0 0,12 * * *",
    "three_times_daily": "0 8,12,18 * * *",
    # Off-hours
    "weekends_noon": "0 12 * * 0,6",
    "nightly_2am": "0 2 * * *",
    "nightly_3am": "0 3 * * *",
    "sunday_maintenance": "0 3 * * 0",
    # Quarter
    "quarterly": "0 0 1 1,4,7,10 *",
    "end_of_quarter": "0 0 L 3,6,9,12 *",
}

PRESETS: dict[str, CronExpression] = {
    name: CronExpression(expr) for name, expr in _PRESET_STRINGS.items()
}


def get_preset(name: str) -> CronExpression | None:
    """Preset by name, case-insensitive, dashes accepted
    (reference presets.py:194)."""
    return PRESETS.get(name.lower().replace("-", "_"))


def list_presets() -> list[str]:
    return list(PRESETS.keys())


class CronTrigger:
    """Cron-schedule checkpoint trigger: ``due(now)`` fires when a cron
    match time has passed since the previous check (reference
    triggers/schedule.py cron mode; complements the interval-based
    ``checkpoint.ScheduleTrigger``). Accepts a cron string OR a preset
    name. Poll-style like ScheduleTrigger — an external loop owns time."""

    def __init__(self, schedule: str) -> None:
        expr = get_preset(schedule)
        self.cron = expr if expr is not None else CronExpression(schedule)
        self._last_checked: datetime | None = None

    def due(self, now: datetime | None = None) -> bool:
        now = datetime.now() if now is None else now
        if self._last_checked is None:
            # first poll: arm at `now`, fire on the next cron boundary
            self._last_checked = now
            return False
        nxt = self.cron.next(self._last_checked)
        if nxt is not None and nxt <= now:
            self._last_checked = now
            return True
        return False
