"""Property obligations for the pcap codec (sources/pcap.py):

- write→parse is the identity on (ts, data) for ARBITRARY payload bytes
  (framing carries opaque bytes; nothing in the payload can corrupt it)
- decapsulate never raises on arbitrary byte strings — garbage decodes
  to nulls/garbage fields, never an exception (the reference's parser
  contract for malformed capture data)
- a valid global header followed by arbitrary tail bytes parses without
  raising and never reads past the buffer

No Ray needed: the kernels are pure batch functions
(``packets_to_pcap_bytes`` is the exact assembly the sink writes)."""

import struct

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from tenzir_ray.sources.pcap import (
    MAGIC_US,
    decapsulate_batch,
    packets_to_pcap_bytes,
    parse_pcap_bytes,
)

_payload = st.binary(min_size=0, max_size=300)
# pcap sec field is uint32; frac < 1e9 in the ns format
_ts = st.tuples(st.integers(0, 2**32 - 1), st.integers(0, 999_999_999))


def _table(pairs) -> pa.Table:
    return pa.table({
        "ts": pa.array([s * 10**9 + f for (s, f), _ in pairs],
                       pa.int64()).cast(pa.timestamp("ns")),
        "data": pa.array([p for _, p in pairs], pa.binary()),
    })


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(_ts, _payload), min_size=1, max_size=20))
def test_roundtrip_arbitrary_payloads(pairs):
    raw = packets_to_pcap_bytes(_table(pairs))
    t = parse_pcap_bytes(raw)
    assert t.num_rows == len(pairs)
    got_ts = t.column("ts").cast(pa.int64()).to_pylist()
    assert got_ts == [s * 10**9 + f for (s, f), _ in pairs]
    assert t.column("data").to_pylist() == [p for _, p in pairs]


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(_ts, _payload), min_size=1, max_size=12))
def test_files_concatenate(pairs):
    """cat a.pcap b.pcap is NOT a valid single pcap (each file has a
    global header) — but our reader of each half must cover all rows:
    split anywhere on a record boundary, parse both, union equals
    whole."""
    mid = max(1, len(pairs) // 2)
    a = packets_to_pcap_bytes(_table(pairs[:mid]))
    b = packets_to_pcap_bytes(_table(pairs[mid:])) \
        if pairs[mid:] else None
    rows = parse_pcap_bytes(a).num_rows
    if b is not None:
        rows += parse_pcap_bytes(b).num_rows
    assert rows == len(pairs)


@settings(max_examples=150, deadline=None)
@given(st.lists(_payload, min_size=0, max_size=8))
def test_decapsulate_never_raises(payloads):
    t = pa.table({"data": pa.array(payloads, pa.binary())})
    d = decapsulate_batch(t)
    assert d.num_rows == len(payloads)
    assert "ip_src" in d.column_names


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=400))
def test_parse_truncated_never_raises(raw_tail):
    head = struct.pack("<IHHiIII", MAGIC_US, 2, 4, 0, 0, 262144, 1)
    t = parse_pcap_bytes(head + raw_tail)
    assert t.num_rows >= 0  # no exception is the property
