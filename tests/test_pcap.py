"""PCAP read/write + decapsulate (sources/pcap.py) — hand-built frames
with known field values, byte-level file fixtures for both byte orders,
and a Ray round-trip."""

import os
import struct

import numpy as np
import pyarrow as pa
import pytest

from tenzir_ray.sources.pcap import (
    MAGIC_NS,
    MAGIC_US,
    decapsulate,
    decapsulate_batch,
    parse_pcap_bytes,
    read_pcap,
    write_pcap,
)


def eth(dst="aa:bb:cc:dd:ee:ff", src="11:22:33:44:55:66",
        etype=0x0800, vlan=None) -> bytes:
    out = bytes.fromhex(dst.replace(":", "")) + \
        bytes.fromhex(src.replace(":", ""))
    if vlan is not None:
        out += struct.pack(">HH", 0x8100, vlan)
    return out + struct.pack(">H", etype)


def ipv4(src="10.0.0.1", dst="192.168.1.2", proto=6, ttl=64,
         payload_len=20, opts=b"") -> bytes:
    ihl = 5 + len(opts) // 4
    total = ihl * 4 + payload_len
    parts = [bytes(map(int, x.split("."))) for x in (src, dst)]
    return struct.pack(">BBHHHBBH", (4 << 4) | ihl, 0, total, 1, 0,
                       ttl, proto, 0) + parts[0] + parts[1] + opts


def tcp(sport=4321, dport=80, flags=0x18, doff=5) -> bytes:
    return struct.pack(">HHIIBBHHH", sport, dport, 1, 2,
                       doff << 4, flags, 8192, 0, 0)


def udp(sport=5353, dport=53, length=8) -> bytes:
    return struct.pack(">HHHH", sport, dport, length, 0)


def pcap_file(packets, magic=MAGIC_US, endian="<") -> bytes:
    out = struct.pack(endian + "IHHiIII", magic, 2, 4, 0, 0, 262144, 1)
    for i, p in enumerate(packets):
        frac = 500 if magic == MAGIC_US else 500_000
        out += struct.pack(endian + "IIII", 1700000000 + i, frac,
                           len(p), len(p)) + p
    return out


TCP_PKT = eth() + ipv4(proto=6) + tcp() + b"PAYLOAD!"
UDP_PKT = eth(etype=0x0800) + ipv4(proto=17, payload_len=16) + \
    udp(length=16) + b"dnsdata!"
VLAN_PKT = eth(vlan=42) + ipv4(src="172.16.0.9", proto=6) + \
    tcp(sport=1111, dport=443, flags=0x02)
ARP_PKT = eth(etype=0x0806) + b"\x00" * 28
OPTS_PKT = eth() + ipv4(proto=6, opts=b"\x01\x01\x01\x01") + \
    tcp(sport=9, dport=10)


def test_parse_pcap_bytes_both_endians_and_precisions():
    for magic, endian in [(MAGIC_US, "<"), (MAGIC_NS, "<"),
                          (MAGIC_US, ">"), (MAGIC_NS, ">")]:
        t = parse_pcap_bytes(pcap_file([TCP_PKT, UDP_PKT], magic, endian))
        assert t.num_rows == 2
        assert t.column("captured_len").to_pylist() == \
            [len(TCP_PKT), len(UDP_PKT)]
        assert t.column("data").to_pylist() == [TCP_PKT, UDP_PKT]
        ns = t.column("ts").cast(pa.int64()).to_pylist()[0]
        assert ns == 1700000000 * 10**9 + 500_000  # both precisions agree


def test_parse_truncated_tail():
    raw = pcap_file([TCP_PKT])
    t = parse_pcap_bytes(raw[:-4])  # capture cut mid-packet
    assert t.num_rows == 1
    assert t.column("captured_len").to_pylist()[0] == len(TCP_PKT) - 4
    assert t.column("original_len").to_pylist()[0] == len(TCP_PKT)


def test_decapsulate_fields():
    t = pa.table({"data": pa.array(
        [TCP_PKT, UDP_PKT, VLAN_PKT, ARP_PKT, OPTS_PKT], pa.binary())})
    d = decapsulate_batch(t)
    assert d.column("ether_src").to_pylist()[0] == "11:22:33:44:55:66"
    assert d.column("ether_dst").to_pylist()[0] == "aa:bb:cc:dd:ee:ff"
    assert d.column("ether_type").to_pylist() == \
        [0x0800, 0x0800, 0x0800, 0x0806, 0x0800]
    assert d.column("vlan").to_pylist() == [None, None, 42, None, None]
    assert d.column("ip_src").to_pylist() == \
        ["10.0.0.1", "10.0.0.1", "172.16.0.9", None, "10.0.0.1"]
    assert d.column("ip_proto").to_pylist() == [6, 17, 6, None, 6]
    assert d.column("src_port").to_pylist() == [4321, 5353, 1111, None, 9]
    assert d.column("dst_port").to_pylist() == [80, 53, 443, None, 10]
    assert d.column("tcp_flags").to_pylist() == [0x18, None, 0x02, None, 0x18]
    # payload offsets: eth14+ip20+tcp20 / eth14+ip20+udp8 / vlan18+ip20+tcp20
    assert d.column("payload_offset").to_pylist() == [54, 42, 58, None, 58]
    assert d.column("payload_len").to_pylist()[0] == len(b"PAYLOAD!")


def test_decapsulate_ipv6():
    import ipaddress
    v6 = eth(etype=0x86DD) + struct.pack(
        ">IHBB", 6 << 28, 8, 17, 64) + \
        ipaddress.IPv6Address("2001:db8::1").packed + \
        ipaddress.IPv6Address("2001:db8::2").packed + udp(length=8)
    d = decapsulate_batch(pa.table({"data": pa.array([v6], pa.binary())}))
    assert d.column("ip_src").to_pylist() == ["2001:db8::1"]
    assert d.column("ip_dst").to_pylist() == ["2001:db8::2"]
    assert d.column("ip_proto").to_pylist() == [17]
    assert d.column("src_port").to_pylist() == [5353]


def test_roundtrip_ray(ray_session, tmp_path):
    import ray.data as rd

    pkts = [TCP_PKT, UDP_PKT, VLAN_PKT] * 40
    ts = [1_700_000_000_000_000_000 + i * 1000 for i in range(len(pkts))]
    ds = rd.from_arrow(pa.table({
        "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("ns")),
        "data": pa.array(pkts, pa.binary()),
    }))
    out = str(tmp_path / "caps")
    write_pcap(ds, out)
    files = [f for f in os.listdir(out) if f.endswith(".pcap")]
    assert files
    back = read_pcap(out).take_all()
    assert len(back) == len(pkts)
    got = sorted((r["ts"], r["data"]) for r in back)
    want = sorted(zip(
        pa.array(ts, pa.int64()).cast(pa.timestamp("ns")).to_pylist(), pkts))
    assert got == want


def test_decapsulate_dataset(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(pa.table({"data": pa.array([TCP_PKT] * 10,
                                                  pa.binary())}))
    d = decapsulate(ds).take_all()
    assert all(r["dst_port"] == 80 for r in d)


def test_pipeline_text_decapsulate(ray_session, tmp_path):
    """`from <uri.pcap> | decapsulate | …` — pcap source dispatch via
    open_uri + the decapsulate planner op."""
    import ray.data as rd

    from tenzir_ray.pipelines import Pipeline
    from tenzir_ray.sources import open_uri

    caps = str(tmp_path / "caps")
    write_pcap(rd.from_arrow(pa.table({
        "ts": pa.array([0] * 30, pa.int64()).cast(pa.timestamp("ns")),
        "data": pa.array([TCP_PKT, UDP_PKT, VLAN_PKT] * 10, pa.binary()),
    })), caps)
    one = os.path.join(caps, sorted(os.listdir(caps))[0])
    src = open_uri(one)
    out = Pipeline.parse(
        "decapsulate | where dst_port == 80 | select ip_src, dst_port"
    ).run(src).take_all()
    assert len(out) == 10
    assert all(r["ip_src"] == "10.0.0.1" for r in out)


def test_empty_and_garbage():
    assert parse_pcap_bytes(b"").num_rows == 0
    with pytest.raises(ValueError):
        parse_pcap_bytes(b"not a pcap file at all........")
    # zero-row decapsulate keeps a typed schema
    d = decapsulate_batch(pa.table({"data": pa.array([], pa.binary())}))
    assert d.num_rows == 0 and "ip_src" in d.column_names


def test_decapsulate_payload_yara_chain(ray_session, tmp_path):
    """decapsulate payload | yara over the payload column — the packet-
    scan composition, end-to-end from pipeline text."""
    import ray.data as rd

    from tenzir_ray.pipelines import Pipeline
    from tenzir_ray.sources.pcap import decapsulate_batch

    evil = eth() + ipv4(proto=6, payload_len=28) + tcp() + b"EVIL_IOC"
    ok = eth() + ipv4(proto=6, payload_len=26) + tcp() + b"benign"
    t = pa.table({"data": pa.array([evil, ok, evil], pa.binary())})
    d = decapsulate_batch(t, emit_payload=True)
    assert d.column("payload").to_pylist() == [b"EVIL_IOC", b"benign",
                                               b"EVIL_IOC"]

    rules = tmp_path / "r.yar"
    rules.write_text(
        'rule ioc {\n    strings:\n        $a = "EVIL_IOC"\n'
        '    condition:\n        $a\n}\n')
    src = rd.from_arrow(t)
    out = Pipeline.parse(
        f"decapsulate payload | yara {rules} payload | select src_port"
    ).run(src).take_all()
    assert len(out) == 2


def test_null_packets_decode_to_nulls():
    t = pa.table({"data": pa.array([TCP_PKT, None, UDP_PKT], pa.binary())})
    d = decapsulate_batch(t)
    assert d.column("ether_src").to_pylist()[1] is None
    assert d.column("ip_src").to_pylist() == ["10.0.0.1", None, "10.0.0.1"]
    assert d.column("src_port").to_pylist() == [4321, None, 5353]


def test_pcap_gz_file(tmp_path, ray_session):
    import gzip

    from tenzir_ray.sources.pcap import packets_to_pcap_bytes

    t = pa.table({
        "ts": pa.array([0, 1000], pa.int64()).cast(pa.timestamp("ns")),
        "data": pa.array([TCP_PKT, UDP_PKT], pa.binary()),
    })
    gz = tmp_path / "caps.pcap.gz"
    gz.write_bytes(gzip.compress(packets_to_pcap_bytes(t)))
    # direct parse sniffs the gzip magic
    assert parse_pcap_bytes(gz.read_bytes()).num_rows == 2
    # and the distributed reader + open_uri dispatch handle it
    from tenzir_ray.sources import open_uri

    assert open_uri(str(gz)).count() == 2


def test_decapsulate_truncated_l4_no_header_leak():
    """A TCP frame truncated before the data-offset byte must NOT emit
    TCP header bytes as payload, and a non-IP frame gets no payload at
    all (ADVICE r03: clamp payload to fully-captured L4 headers)."""
    trunc_tcp = TCP_PKT[:14 + 20 + 10]      # cut inside the TCP header
    t = pa.table({"data": pa.array(
        [TCP_PKT, trunc_tcp, ARP_PKT], pa.binary())})
    d = decapsulate_batch(t, emit_payload=True)
    # full frame unchanged
    assert d.column("payload").to_pylist()[0] == b"PAYLOAD!"
    assert d.column("payload_offset").to_pylist()[0] == 54
    # truncated: offset/len null, payload empty — not header bytes
    assert d.column("payload_offset").to_pylist()[1] is None
    assert d.column("payload_len").to_pylist()[1] is None
    assert d.column("payload").to_pylist()[1] == b""
    # non-IP (ARP): no payload, no offset
    assert d.column("payload_offset").to_pylist()[2] is None
    assert d.column("payload").to_pylist()[2] == b""


def test_decapsulate_icmp_payload_exposed():
    """Review regression: non-TCP/UDP IP protocols (ICMP) expose the
    bytes past the IP header as payload — the tunnel-scan surface."""
    icmp = eth() + ipv4(proto=1, payload_len=12) + b"\x08\x00PINGDATA"
    t = pa.table({"data": pa.array([icmp], pa.binary())})
    d = decapsulate_batch(t, emit_payload=True)
    assert d.column("ip_proto").to_pylist() == [1]
    assert d.column("payload_offset").to_pylist() == [34]  # eth14+ip20
    assert d.column("payload").to_pylist()[0] == b"\x08\x00PINGDATA"
