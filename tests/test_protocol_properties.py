"""Property tests for the wire-protocol codecs: CRC32C slicing-by-8,
Kafka record batch v2, ZMTP framing, varints."""
from hypothesis import given, settings
from hypothesis import strategies as st


def _crc32c_naive(data: bytes) -> int:
    # independent per-byte reference (the classic table-less bitwise
    # form) to pin the slicing-by-8 implementation
    poly = 0x82F63B78
    crc = 0xFFFFFFFF
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = (crc >> 1) ^ poly if crc & 1 else crc >> 1
    return crc ^ 0xFFFFFFFF


@given(st.binary(max_size=2048))
@settings(max_examples=200, deadline=None)
def test_crc32c_matches_bitwise_reference(data):
    from tenzir_ray.sources.kafka import crc32c

    assert crc32c(data) == _crc32c_naive(data)


@given(st.lists(
    st.tuples(st.one_of(st.none(), st.binary(max_size=64)),
              st.binary(max_size=300)),
    min_size=1, max_size=20),
    st.integers(min_value=0, max_value=2**40))
@settings(max_examples=100, deadline=None)
def test_record_batch_roundtrip_property(records, base):
    from tenzir_ray.sources.kafka import (
        decode_record_batches, encode_record_batch,
    )

    got = decode_record_batches(encode_record_batch(records, base))
    assert [(k, v) for _, k, v in got] == records
    assert [o for o, _, _ in got] == list(range(base, base + len(records)))


@given(st.integers(min_value=-(2**62), max_value=2**62))
@settings(max_examples=300, deadline=None)
def test_varint_zigzag_roundtrip(n):
    from tenzir_ray.sources.kafka import _get_varint, _put_varint

    buf = bytearray()
    _put_varint(buf, n)
    val, pos = _get_varint(bytes(buf), 0)
    assert val == n and pos == len(buf)


@given(st.binary(max_size=4096), st.booleans(), st.booleans())
@settings(max_examples=100, deadline=None)
def test_zmtp_frame_roundtrip(payload, more, command):
    import socket

    from tenzir_ray.sources.mq import _zmtp_recv_frame, _zmtp_send_frame

    a, b = socket.socketpair()
    try:
        _zmtp_send_frame(a, payload, more=more, command=command)
        flags, got = _zmtp_recv_frame(b)
        assert got == payload
        assert bool(flags & 0x01) == more
        assert bool(flags & 0x04) == command
    finally:
        a.close()
        b.close()


_COLUMN = st.one_of(
    st.lists(st.one_of(st.none(), st.booleans()), min_size=3, max_size=3),
    st.lists(st.one_of(st.none(),
                       st.integers(-2**62, 2**62)), min_size=3, max_size=3),
    st.lists(st.floats(allow_nan=True, allow_infinity=True),
             min_size=3, max_size=3),
    st.lists(st.one_of(st.none(), st.text(max_size=20)),
             min_size=3, max_size=3),
)


@given(st.dictionaries(st.text(min_size=1, max_size=8), _COLUMN,
                       min_size=1, max_size=4))
@settings(max_examples=100, deadline=None)
def test_print_tql_never_crashes_and_is_single_line(cols):
    import pyarrow as pa

    from tenzir_ray.sources.printers import print_tql_batch

    t = pa.table(cols)
    lines = print_tql_batch(t).column("line").to_pylist()
    assert len(lines) == t.num_rows
    import re

    for l in lines:
        assert "\n" not in l and l.startswith("{") and l.endswith("}")
        # no bare non-finite tokens in VALUE position (quoted text
        # containing the word "nan" is fine)
        assert not re.search(r":\s(nan|-?inf)\s*[,}]", l)
