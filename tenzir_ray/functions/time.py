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
