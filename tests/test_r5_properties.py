"""Property tests for the round-5 tail additions: zip_lists against a
pure-Python reference, and cron next_fire invariants."""

import datetime as dt

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

_list_or_none = st.one_of(
    st.none(),
    st.lists(st.integers(min_value=-1000, max_value=1000), max_size=6),
)


def _zip_ref(xs, ys):
    """Row-at-a-time reference implementation of functions/zip.md."""
    out = []
    for x, y in zip(xs, ys):
        if x is None and y is None:
            out.append(None)
            continue
        a = x or []
        b = y or []
        n = max(len(a), len(b))
        out.append([{"left": a[i] if i < len(a) else None,
                     "right": b[i] if i < len(b) else None}
                    for i in range(n)])
    return out


@given(st.lists(st.tuples(_list_or_none, _list_or_none), max_size=30))
@settings(max_examples=60, deadline=None)
def test_zip_lists_matches_reference(pairs):
    from tenzir_ray.functions.lists import zip_lists

    xs = pa.array([p[0] for p in pairs], pa.list_(pa.int64()))
    ys = pa.array([p[1] for p in pairs], pa.list_(pa.int64()))
    got = zip_lists(xs, ys).to_pylist()
    assert got == _zip_ref([p[0] for p in pairs], [p[1] for p in pairs])


_FIELD_STRATS = [
    st.sampled_from(["*", "0", "30", "0-10", "*/5", "1,2,3", "50-5"]),
    st.sampled_from(["*", "0", "59", "0-10", "*/15", "7,8"]),
    st.sampled_from(["*", "0", "23", "9-17", "*/6", "22-2"]),
    st.sampled_from(["*", "?", "1", "28", "1-7", "L", "*/10"]),
    st.sampled_from(["*", "1", "12", "JAN", "MAR-JUN", "1,6,12"]),
    st.sampled_from(["*", "?", "0", "6", "MON-FRI", "SUN", "L"]),
]


@given(st.tuples(*_FIELD_STRATS),
       st.datetimes(min_value=dt.datetime(2020, 1, 1),
                    max_value=dt.datetime(2030, 1, 1)))
@settings(max_examples=80, deadline=None)
def test_cron_next_fire_invariants(fields, after):
    from tenzir_ray.pipelines.cron import next_fire, parse_cron

    spec = parse_cron(" ".join(fields))
    t1 = next_fire(spec, after)
    # strictly in the future, and itself a schedule point: advancing
    # from just before t1 reaches exactly t1 (self-consistency)
    assert t1 > after
    assert next_fire(spec, t1 - dt.timedelta(seconds=1)) == t1
    # monotone: the fire point after t1 is strictly later
    assert next_fire(spec, t1) > t1
    # field membership (when the plain sets constrain them)
    if spec.seconds:
        assert t1.second in spec.seconds
    if spec.minutes:
        assert t1.minute in spec.minutes
    if spec.hours:
        assert t1.hour in spec.hours
    assert t1.month in spec.months
