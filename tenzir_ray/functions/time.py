"""Time/duration functions (reference: builtins/functions/time.cpp,
duration.cpp — parse/format/round/extract over Arrow timestamp arrays)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def parse_time(arr, fmt: str = "%Y-%m-%dT%H:%M:%S", unit: str = "us"):
    return pc.strptime(arr, format=fmt, unit=unit)


def format_time(arr, fmt: str = "%Y-%m-%dT%H:%M:%S"):
    return pc.strftime(arr, format=fmt)


def since_epoch(arr):
    """timestamp → duration since Unix epoch (reference since_epoch)."""
    unit = arr.type.unit if hasattr(arr.type, "unit") else "ns"
    return pc.cast(pc.cast(arr, pa.int64()), pa.duration(unit))


def from_epoch(arr, unit: str = "s"):
    return pc.cast(pc.cast(arr, pa.int64()), pa.timestamp(unit))


def as_secs(dur):
    return pc.divide(pc.cast(pc.cast(dur, pa.int64()), pa.float64()),
                     {"s": 1.0, "ms": 1e3, "us": 1e6, "ns": 1e9}[dur.type.unit])


def round_time(arr, multiple: int = 1, unit: str = "hour"):
    return pc.round_temporal(arr, multiple=multiple, unit=unit)


def floor_time(arr, multiple: int = 1, unit: str = "hour"):
    return pc.floor_temporal(arr, multiple=multiple, unit=unit)


year = pc.year
month = pc.month
day = pc.day
hour = pc.hour
minute = pc.minute
second = pc.second
day_of_week = pc.day_of_week


# --- duration constructors / extractors (duration.cpp:257-269: the
# std::chrono ratios — months = 2629746 s, years = 31556952 s) ---

_UNIT_NS = {
    "nanoseconds": 1,
    "microseconds": 1_000,
    "milliseconds": 1_000_000,
    "seconds": 1_000_000_000,
    "minutes": 60 * 1_000_000_000,
    "hours": 3_600 * 1_000_000_000,
    "days": 86_400 * 1_000_000_000,
    "weeks": 604_800 * 1_000_000_000,
    "months": 2_629_746 * 1_000_000_000,
    "years": 31_556_952 * 1_000_000_000,
}


def _to_duration(x, unit: str):
    """n → duration("ns"). Integer inputs multiply exactly in int64;
    fractional inputs go through float64 + round (reference
    into<std::chrono::D> semantics)."""
    ns = _UNIT_NS[unit]
    if isinstance(x, int):
        return pa.scalar(x * ns, pa.duration("ns"))
    if isinstance(x, float):
        return pa.scalar(round(x * ns), pa.duration("ns"))
    t = x.type
    if pa.types.is_integer(t):
        out = pc.multiply_checked(pc.cast(x, pa.int64()), ns)
    else:
        out = pc.cast(pc.round(pc.multiply(pc.cast(x, pa.float64()), ns)),
                      pa.int64())
    return pc.cast(out, pa.duration("ns"))


def _from_duration(d, unit: str):
    """duration → fractional count of ``unit`` (count_seconds etc.,
    duration.cpp count<D> — returns double)."""
    ns = _UNIT_NS[unit]
    as_int = pc.cast(pc.cast(d, pa.duration("ns")), pa.int64())
    # safe=False: ns counts near 2^63 lose float precision instead of
    # raising (the double-returning reference count<D> does the same)
    return pc.divide(pc.cast(as_int, pa.float64(), safe=False), float(ns))


def _mk_ctor(unit):
    def ctor(x):
        return _to_duration(x, unit)
    ctor.__name__ = unit
    ctor.__doc__ = f"n → duration of n {unit} (duration.cpp into<>)."
    return ctor


def _mk_count(unit):
    def count(d):
        return _from_duration(d, unit)
    count.__name__ = f"count_{unit}"
    count.__doc__ = \
        f"duration → fractional {unit} count (duration.cpp count<>)."
    return count


years = _mk_ctor("years")
months = _mk_ctor("months")
weeks = _mk_ctor("weeks")
days = _mk_ctor("days")
hours = _mk_ctor("hours")
minutes = _mk_ctor("minutes")
seconds = _mk_ctor("seconds")
milliseconds = _mk_ctor("milliseconds")
microseconds = _mk_ctor("microseconds")
nanoseconds = _mk_ctor("nanoseconds")

count_years = _mk_count("years")
count_months = _mk_count("months")
count_weeks = _mk_count("weeks")
count_days = _mk_count("days")
count_hours = _mk_count("hours")
count_minutes = _mk_count("minutes")
count_seconds = _mk_count("seconds")
count_milliseconds = _mk_count("milliseconds")
count_microseconds = _mk_count("microseconds")
count_nanoseconds = _mk_count("nanoseconds")
