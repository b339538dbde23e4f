"""ip/subnet type support (reference type.hpp ip/subnet; subnet_tree LPM)."""

import pyarrow as pa

from tenzir_ray.functions.ip import (
    CidrIndex, ip_parse, ip_print, is_v4, subnet_contains,
)


def test_ip_parse_print_roundtrip_v4():
    ips = ["10.1.2.3", "192.168.0.1", "0.0.0.0", "255.255.255.255"]
    parsed = ip_parse(pa.array(ips))
    assert parsed.type == pa.binary(16)
    assert ip_print(parsed).to_pylist() == ips
    assert is_v4(parsed).to_pylist() == [True] * 4


def test_ip_parse_v6_and_invalid():
    arr = pa.array(["2001:db8::1", "10.0.0.1", "not-an-ip", None])
    parsed = ip_parse(arr)
    assert ip_print(parsed).to_pylist() == ["2001:db8::1", "10.0.0.1", None, None]
    assert is_v4(parsed).to_pylist()[:2] == [False, True]


def test_subnet_contains():
    parsed = ip_parse(pa.array(["10.1.2.3", "10.127.255.255", "10.128.0.0",
                                "192.168.1.1"]))
    assert subnet_contains(parsed, "10.0.0.0/9").to_pylist() == \
        [True, True, False, False]
    assert subnet_contains(parsed, "10.0.0.0/8").to_pylist() == \
        [True, True, True, False]
    # non-octet-aligned prefix
    assert subnet_contains(parsed, "10.1.2.0/31").to_pylist() == \
        [False, False, False, False]
    assert subnet_contains(parsed, "10.1.2.2/31").to_pylist() == \
        [True, False, False, False]


def test_cidr_longest_prefix_match():
    idx = CidrIndex({
        "0.0.0.0/0": "default",
        "10.0.0.0/8": "ten",
        "10.3.0.0/16": "ten-three",
        "10.3.7.0/24": "ten-three-seven",
    })
    ips = ip_parse(pa.array([
        "10.3.7.9", "10.3.1.1", "10.9.9.9", "11.0.0.1"]))
    assert idx.lookup(ips) == [
        "ten-three-seven", "ten-three", "ten", "default"]


def test_cidr_v6_entries():
    idx = CidrIndex({"2001:db8::/32": "doc", "::/0": "any"})
    ips = ip_parse(pa.array(["2001:db8::5", "2001:db9::5", "10.0.0.1"]))
    assert idx.lookup(ips) == ["doc", "any", "any"]


def test_null_ips_never_match():
    """Null ips must not behave as '::' — no ::/0 containment, no LPM
    hit, null print (ADVICE round 2)."""
    parsed = ip_parse(pa.array(["10.0.0.1", None, "0.0.0.0"]))
    assert parsed[1].as_py() is None
    assert subnet_contains(parsed, "::/0").to_pylist() == [True, False, True]
    assert subnet_contains(parsed, "0.0.0.0/0").to_pylist() == \
        [True, False, True]
    idx = CidrIndex({"::/0": "any"})
    assert idx.lookup(parsed) == ["any", None, "any"]
    assert ip_print(parsed).to_pylist() == ["10.0.0.1", None, "0.0.0.0"]
    assert is_v4(parsed).to_pylist() == [True, None, True]


def test_byte_matrix_sliced_offset():
    """_byte_matrix must honor Arrow slice offsets (zero-copy view)."""
    parsed = ip_parse(pa.array(["1.1.1.1", "2.2.2.2", "3.3.3.3"]))
    sliced = parsed.slice(1, 2)
    assert ip_print(sliced).to_pylist() == ["2.2.2.2", "3.3.3.3"]
