"""Cron-expression schedule for the `cron` operator (reference:
operators/every_cron.cpp and web docs operators/cron.md — 6-field
`<sec> <min> <hour> <dom> <month> <dow>` expressions with `*`, lists,
ranges, steps, JAN-DEC / SUN-SAT literals, `?`, and `L` on the day
fields).

Pure-datetime implementation: :func:`parse_cron` compiles the
expression to small allowed-value sets, :func:`next_fire` searches
hierarchically (days first, then the ≤60-element time sets) — never a
second-by-second scan. `W` (nearest weekday) and `#` (nth weekday) are
rejected loudly; the reference's croncpp backend supports them but no
pipeline in its test tree uses either.
"""

from __future__ import annotations

import calendar
import datetime as dt
from dataclasses import dataclass

_MONTHS = {m: i + 1 for i, m in enumerate(
    "JAN FEB MAR APR MAY JUN JUL AUG SEP OCT NOV DEC".split())}
_DOWS = {d: i for i, d in enumerate(
    "SUN MON TUE WED THU FRI SAT".split())}

_RANGES = {  # field -> (lo, hi)
    "second": (0, 59), "minute": (0, 59), "hour": (0, 23),
    "dom": (1, 31), "month": (1, 12), "dow": (0, 6),
}


@dataclass(frozen=True)
class CronSpec:
    seconds: frozenset
    minutes: frozenset
    hours: frozenset
    dom: frozenset          # may contain "L" marker via dom_last
    months: frozenset
    dow: frozenset
    dom_last: bool          # `L` in day-of-month: last day of month
    dow_last: bool          # `L` in day-of-week: Saturday (croncpp: 6)
    dom_any: bool           # `?` / `*`: day-of-month unrestricted
    dow_any: bool


def _literal(tok: str, field: str) -> int:
    tok = tok.strip().upper()
    if field == "month" and tok in _MONTHS:
        return _MONTHS[tok]
    if field == "dow" and tok in _DOWS:
        return _DOWS[tok]
    try:
        v = int(tok)
    except ValueError:
        raise ValueError(f"cron: bad {field} value {tok!r}")
    if field == "dow" and v == 7:  # both 0 and 7 mean Sunday in practice
        v = 0
    lo, hi = _RANGES[field]
    if not lo <= v <= hi:
        raise ValueError(f"cron: {field} value {v} outside {lo}-{hi}")
    return v


def _field(expr: str, field: str) -> tuple[frozenset, bool, bool]:
    """Parse one field → (allowed-set, is_any, has_L)."""
    lo, hi = _RANGES[field]
    out: set[int] = set()
    has_l = False
    # Vixie cron's "star flag": a field whose spec STARTS with `*`
    # (including `*/N`) or is `?` counts as unrestricted for the
    # either-day-field quirk — `0 0 0 */1 * MON` must fire on Mondays
    # only, not every day
    is_any = expr == "?" or expr.startswith("*")
    for part in expr.split(","):
        part = part.strip()
        if part in ("*", "?"):
            out.update(range(lo, hi + 1))
            continue
        if part.upper() == "L":
            if field not in ("dom", "dow"):
                raise ValueError(f"cron: L not allowed in {field}")
            has_l = True
            continue
        if "W" in part.upper() or "#" in part:
            raise ValueError(
                "cron: W and # day modifiers are not supported")
        step = 1
        if "/" in part:
            part, s = part.split("/", 1)
            step = int(s)
            if step <= 0:
                raise ValueError("cron: step must be positive")
            if part in ("*", "?", ""):
                part = f"{lo}-{hi}"
        if "-" in part and not part.lstrip().startswith("-"):
            a, b = part.split("-", 1)
            va, vb = _literal(a, field), _literal(b, field)
            if va <= vb:
                out.update(range(va, vb + 1, step))
            else:  # wrap-around range (e.g. FRI-MON, 22-2)
                out.update(range(va, hi + 1, step))
                # continue the stride past the wrap point
                off = (hi + 1 - va) % step
                out.update(range(lo + (step - off) % step, vb + 1, step))
        else:
            v = _literal(part, field)
            if step > 1:
                out.update(range(v, hi + 1, step))
            else:
                out.add(v)
    return frozenset(out), is_any, has_l


def parse_cron(expr: str) -> CronSpec:
    fields = expr.split()
    if len(fields) != 6:
        raise ValueError(
            f"cron: expected 6 fields `sec min hour dom month dow`, "
            f"got {len(fields)} in {expr!r}")
    sec, _, _ = _field(fields[0], "second")
    mnt, _, _ = _field(fields[1], "minute")
    hrs, _, _ = _field(fields[2], "hour")
    dom, dom_any, dom_l = _field(fields[3], "dom")
    mon, _, _ = _field(fields[4], "month")
    dow, dow_any, dow_l = _field(fields[5], "dow")
    if not (sec and mnt and hrs and mon):
        raise ValueError(f"cron: an empty field set in {expr!r}")
    if not dom and not dom_l and not dom_any:
        raise ValueError(f"cron: empty day-of-month in {expr!r}")
    return CronSpec(sec, mnt, hrs, dom, mon, dow,
                    dom_l, dow_l, dom_any, dow_any)


def _day_matches(spec: CronSpec, d: dt.date) -> bool:
    if d.month not in spec.months:
        return False
    py_dow = (d.weekday() + 1) % 7  # Monday=0 → Sunday=0 convention
    dom_ok = (d.day in spec.dom) or (
        spec.dom_last and d.day == calendar.monthrange(d.year, d.month)[1])
    dow_ok = (py_dow in spec.dow) or (spec.dow_last and py_dow == 6)
    # standard cron quirk: when BOTH day fields are restricted, a day
    # matching EITHER fires; `?` marks the unrestricted one
    if spec.dom_any and spec.dow_any:
        return True
    if spec.dom_any:
        return dow_ok
    if spec.dow_any:
        return dom_ok
    return dom_ok or dow_ok


def next_fire(spec: CronSpec, after: dt.datetime) -> dt.datetime:
    """Smallest schedule point STRICTLY after ``after`` (tz preserved).
    Hierarchical search: candidate days (≤ ~4 years ahead — enough for
    any satisfiable dom×month combination), then the sorted time sets."""
    secs = sorted(spec.seconds)
    mins = sorted(spec.minutes)
    hrs = sorted(spec.hours)
    t = after + dt.timedelta(seconds=1)
    t = t.replace(microsecond=0)
    day = t.date()
    for _ in range(1462):  # 4 years of days
        if _day_matches(spec, day):
            floor = (t.time() if day == t.date()
                     else dt.time(0, 0, 0))
            for h in hrs:
                if h < floor.hour:
                    continue
                m_floor = floor.minute if h == floor.hour else 0
                for m in mins:
                    if m < m_floor:
                        continue
                    s_floor = (floor.second
                               if (h, m) == (floor.hour, floor.minute)
                               else 0)
                    for s in secs:
                        if s >= s_floor:
                            return dt.datetime.combine(
                                day, dt.time(h, m, s), tzinfo=t.tzinfo)
        day = day + dt.timedelta(days=1)
    raise ValueError("cron: no schedule point within 4 years")
