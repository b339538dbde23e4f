"""PCAP packet-capture format + ``decapsulate`` — from-scratch on the
public classic-pcap file layout (24-byte global header, 16-byte
per-packet record headers; magic 0xa1b2c3d4 µs / 0xa1b23c4d ns, either
byte order) and the public Ethernet/802.1Q/IPv4/IPv6/TCP/UDP header
layouts.

Reference parity (design only, no code): ``formats/pcap.cpp`` (reader/
writer of the same file format) and ``operators/decapsulate.cpp``
(L2-L4 header decode into fields).  Ray-Data shape:

- ``read_pcap(paths)`` — one read task per file via
  ``read_binary_files``; the per-packet framing walk inside a file is
  inherently sequential (each record header states the next offset),
  but files parallelize, and the packet-bytes column is assembled with
  ONE vectorized gather + ``BinaryArray.from_buffers`` (no per-packet
  ``bytes`` copies through Python).
- ``write_pcap(ds, dir)`` — one pcap file per block (partitioned,
  resumable output), headers scattered and payloads moved by numpy
  index arithmetic — no per-packet Python in the assembly.
- ``decapsulate_batch`` — fully vectorized field extraction: every
  header byte is gathered with numpy fancy indexing over the Arrow
  binary column's flat data buffer; VLAN / IHL / TCP data-offset
  shifts are ``np.where`` offset arrays, never a row loop.  (IPv6
  address *strings* are formatted per-row over only the v6 rows —
  rare in web-capture data — everything else is flat numpy.)
"""

from __future__ import annotations

import os
import struct
import uuid

import numpy as np
import pyarrow as pa

MAGIC_US = 0xA1B2C3D4
MAGIC_NS = 0xA1B23C4D

# global header layout: magic, major=2, minor=4, tz, sigfigs, snaplen, link
_GLOBAL_HDR_FMT = "<IHHiIII"


# --------------------------------------------------------------- helpers


def _binary_parts(arr: pa.Array) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(flat uint8 view, per-value starts, per-value lens) of a binary
    array — zero-copy off the Arrow buffers (slice offset honored).
    large_binary offsets are read as int64 DIRECTLY: casting a >2 GiB
    large_binary down to binary overflows its int32 offsets."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    large = pa.types.is_large_binary(arr.type) \
        or pa.types.is_large_string(arr.type)
    bufs = arr.buffers()
    off = np.frombuffer(bufs[1], dtype=np.int64 if large else np.int32,
                        count=len(arr) + 1 + arr.offset)[arr.offset:]
    flat = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None \
        else np.zeros(0, np.uint8)
    starts = off[:-1].astype(np.int64)
    lens = np.diff(off).astype(np.int64)
    return flat, starts, lens


def _gather_ranges(flat: np.ndarray, starts: np.ndarray,
                   lens: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Concatenate ``flat[starts[i]:starts[i]+lens[i]]`` for all i with
    one fancy-index gather. Offsets are int64 — a single capture file
    can exceed 2 GiB of packet bytes, and an int32 cumsum would wrap
    silently into negative offsets."""
    total = int(lens.sum())
    offs = np.zeros(len(lens) + 1, np.int64)
    np.cumsum(lens, out=offs[1:])
    if total == 0:
        return np.zeros(0, np.uint8), offs
    cumexcl = offs[:-1]
    idx = np.repeat(starts - cumexcl, lens) + np.arange(total, dtype=np.int64)
    return flat[idx], offs


def _binary_from_ranges(flat, starts, lens) -> pa.Array:
    """binary array of ``flat[starts[i] : starts[i]+lens[i]]`` built
    straight from (validity, offsets, data) buffers — one gather, no
    per-value ``bytes`` objects. Emits ``binary`` (int32 offsets) below
    the 2 GiB offset limit and ``large_binary`` (int64) above it."""
    values, offs = _gather_ranges(flat, starts, lens)
    if offs[-1] <= np.iinfo(np.int32).max:
        return pa.Array.from_buffers(
            pa.binary(), len(lens),
            [None, pa.py_buffer(offs.astype(np.int32).tobytes()),
             pa.py_buffer(values.tobytes())],
        )
    return pa.Array.from_buffers(
        pa.large_binary(), len(lens),
        [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(values.tobytes())],
    )


def _byte_at(flat, starts, lens, k: int | np.ndarray) -> np.ndarray:
    """Vector of ``data[i][k]`` (0 where short); k may be per-row."""
    pos = starts + k
    ok = lens > k
    out = np.zeros(len(starts), np.uint8)
    if ok.any():
        out[ok] = flat[pos[ok]]
    return out


def _be16_at(flat, starts, lens, k) -> np.ndarray:
    hi = _byte_at(flat, starts, lens, k).astype(np.uint32)
    lo = _byte_at(flat, starts, lens, k + 1).astype(np.uint32)
    return (hi << 8) | lo


def _be32_at(flat, starts, lens, k) -> np.ndarray:
    return (_be16_at(flat, starts, lens, k) << 16) | \
        _be16_at(flat, starts, lens, k + 2)


_DEC = np.array([str(i) for i in range(256)])
_HEX = np.array([f"{i:02x}" for i in range(256)])


def _dotted(a: np.ndarray, b: np.ndarray, c: np.ndarray,
            d: np.ndarray) -> np.ndarray:
    """Vectorized ``a.b.c.d`` strings from four uint8 vectors (LUT +
    np.char concat — no per-row Python)."""
    dot = np.full(len(a), ".")
    return np.char.add(np.char.add(np.char.add(np.char.add(np.char.add(
        np.char.add(_DEC[a], dot), _DEC[b]), dot), _DEC[c]), dot), _DEC[d])


def _mac(flat, starts, lens, k: int) -> np.ndarray:
    """Vectorized ``aa:bb:cc:dd:ee:ff`` strings from 6 bytes at offset k."""
    colon = np.full(len(starts), ":")
    out = _HEX[_byte_at(flat, starts, lens, k)]
    for j in range(1, 6):
        out = np.char.add(np.char.add(out, colon),
                          _HEX[_byte_at(flat, starts, lens, k + j)])
    return out


# ----------------------------------------------------------------- write


def packets_to_pcap_bytes(
    t: pa.Table, ts_col: str = "ts", data_col: str = "data",
    linktype: int = 1, nanos: bool = True,
) -> bytes:
    """One batch of (ts, data) rows → one classic-pcap file image.
    Record headers are filled by 16 column-scatter stores and payload
    bytes move with one vectorized index-copy; no per-packet Python.
    Shared by the distributed sink and the property tests (one
    assembly, no drift)."""
    import pyarrow.compute as pc

    magic = MAGIC_NS if nanos else MAGIC_US
    div = 1 if nanos else 1_000
    flat, starts, lens = _binary_parts(t.column(data_col))
    data_arr = t.column(data_col)
    if isinstance(data_arr, pa.ChunkedArray):
        data_arr = data_arr.combine_chunks()
    if data_arr.null_count:  # null packets write as zero-length records
        lens = np.where(
            pc.is_valid(data_arr).to_numpy(zero_copy_only=False), lens, 0)
    ts = pc.fill_null(t.column(ts_col).cast(pa.timestamp("ns"))
                      .cast(pa.int64()), 0).to_numpy(zero_copy_only=False)
    n = len(lens)
    cumexcl = np.zeros(n, np.int64)
    np.cumsum(lens[:-1], out=cumexcl[1:])
    hdr_pos = 24 + 16 * np.arange(n, dtype=np.int64) + cumexcl
    out = np.empty(24 + 16 * n + int(lens.sum()), np.uint8)
    out[:24] = np.frombuffer(
        struct.pack(_GLOBAL_HDR_FMT, magic, 2, 4, 0, 0, 262_144,
                    linktype), np.uint8)
    hdr = np.empty((n, 16), np.uint8)
    hdr[:, 0:4] = (ts // 1_000_000_000).astype("<u4") \
        .view(np.uint8).reshape(n, 4)
    hdr[:, 4:8] = ((ts % 1_000_000_000) // div).astype("<u4") \
        .view(np.uint8).reshape(n, 4)
    hdr[:, 8:12] = lens.astype("<u4").view(np.uint8).reshape(n, 4)
    hdr[:, 12:16] = hdr[:, 8:12]
    for k in range(16):
        out[hdr_pos + k] = hdr[:, k]
    total = int(lens.sum())
    if total:
        dst = np.repeat(hdr_pos + 16 - cumexcl, lens) \
            + np.arange(total, dtype=np.int64)
        src = np.repeat(starts - cumexcl, lens) \
            + np.arange(total, dtype=np.int64)
        out[dst] = flat[src]
    return out.tobytes()


def write_pcap(ds, path: str, ts_col: str = "ts", data_col: str = "data",
               linktype: int = 1, nanos: bool = True) -> None:
    """Distributed pcap sink: one classic-pcap file per block under
    ``path`` (atomic rename publish — resumable)."""
    os.makedirs(path, exist_ok=True)

    def _write(t: pa.Table) -> pa.Table:
        if t.num_rows:
            payload = packets_to_pcap_bytes(
                t, ts_col=ts_col, data_col=data_col,
                linktype=linktype, nanos=nanos)
            name = os.path.join(path, f"part-{uuid.uuid4().hex}.pcap")
            with open(name + ".tmp", "wb") as f:
                f.write(payload)
            os.rename(name + ".tmp", name)
        return pa.table({"rows": pa.array([t.num_rows], pa.int64())})

    ds.map_batches(_write, batch_format="pyarrow").materialize()


# ------------------------------------------------------------------ read


def parse_pcap_bytes(raw: bytes) -> pa.Table:
    """One pcap file → (ts, captured_len, original_len, data). The
    record-header walk is sequential by format design; the data column
    is assembled with one vectorized gather."""
    if raw[:2] == b"\x1f\x8b":  # gzip-compressed capture (x.pcap.gz)
        import gzip

        raw = gzip.decompress(raw)
    if len(raw) < 24:
        return _empty_packets()
    (magic_le,) = struct.unpack_from("<I", raw, 0)
    (magic_be,) = struct.unpack_from(">I", raw, 0)
    if magic_le in (MAGIC_US, MAGIC_NS):
        endian, magic = "<", magic_le
    elif magic_be in (MAGIC_US, MAGIC_NS):
        endian, magic = ">", magic_be
    else:
        raise ValueError(f"not a pcap file (magic {raw[:4]!r})")
    frac_mul = 1 if magic == MAGIC_NS else 1_000
    rec = struct.Struct(endian + "IIII")
    buf = np.frombuffer(raw, np.uint8)
    secs, fracs, starts, lens, origs = [], [], [], [], []
    off = 24
    n_bytes = len(raw)
    while off + 16 <= n_bytes:
        sec, frac, incl, orig = rec.unpack_from(raw, off)
        off += 16
        incl = min(incl, n_bytes - off)  # truncated tail capture
        secs.append(sec)
        fracs.append(frac)
        starts.append(off)
        lens.append(incl)
        origs.append(orig)
        off += incl
    ts = (np.array(secs, np.int64) * 1_000_000_000
          + np.array(fracs, np.int64) * frac_mul)
    data = _binary_from_ranges(
        buf, np.array(starts, np.int64), np.array(lens, np.int64))
    return pa.table({
        "ts": pa.array(ts).cast(pa.timestamp("ns")),
        "captured_len": pa.array(np.array(lens, np.int64)),
        "original_len": pa.array(np.array(origs, np.int64)),
        "data": data,
    })


def _empty_packets() -> pa.Table:
    return pa.table({
        "ts": pa.array([], pa.timestamp("ns")),
        "captured_len": pa.array([], pa.int64()),
        "original_len": pa.array([], pa.int64()),
        "data": pa.array([], pa.binary()),
    })


def read_pcap(paths):
    """Distributed pcap source: one read task per file (explicit file
    list + pinned block count via
    :func:`~tenzir_ray.sources.formats.resolve_binary_paths`);
    ``.pcap.gz`` members decompress via the magic-byte sniff in
    :func:`parse_pcap_bytes`."""
    import ray.data as rd

    from tenzir_ray.sources.formats import resolve_binary_paths

    def split(t: pa.Table) -> pa.Table:
        parts = [parse_pcap_bytes(raw)
                 for raw in t.column("bytes").to_pylist()]
        # permissive: a >2 GiB member emits large_binary data while
        # smaller siblings emit binary — unify instead of raising
        return pa.concat_tables(parts, promote_options="permissive") \
            if parts else _empty_packets()

    files, n = resolve_binary_paths(paths, (".pcap", ".pcap.gz"))
    if not files:
        return rd.from_arrow(_empty_packets())
    return rd.read_binary_files(files, override_num_blocks=max(1, n)) \
        .map_batches(split, batch_format="pyarrow")


# ----------------------------------------------------------- decapsulate


def decapsulate_batch(t: pa.Table, col: str = "data",
                      keep: bool = False,
                      emit_payload: bool = False) -> pa.Table:
    """Ethernet/802.1Q → IPv4/IPv6 → TCP/UDP field decode, one numpy
    gather per header byte over the whole batch
    (operators/decapsulate.cpp parity). Unknown layers yield nulls.
    ``keep=True`` retains the raw packet column; ``emit_payload=True``
    adds a ``payload`` binary column (the bytes past the L4 header,
    assembled with one vectorized gather) so payload scanners — e.g.
    ``decapsulate payload | yara rules.yar payload`` — compose without
    re-parsing headers."""
    col_arr = t.column(col)
    if isinstance(col_arr, pa.ChunkedArray):
        col_arr = col_arr.combine_chunks()
    flat, starts, lens = _binary_parts(col_arr)
    n = len(starts)
    # null packets must decode to null fields, not to zero-byte frames
    if col_arr.null_count:
        import pyarrow.compute as pc

        row_valid = pc.is_valid(col_arr).to_numpy(zero_copy_only=False)
        lens = np.where(row_valid, lens, 0)
    else:
        row_valid = np.ones(n, dtype=bool)

    ether_dst = _mac(flat, starts, lens, 0)
    ether_src = _mac(flat, starts, lens, 6)
    etype = _be16_at(flat, starts, lens, 12)
    is_vlan = etype == 0x8100
    vlan = np.where(is_vlan, _be16_at(flat, starts, lens, 14) & 0x0FFF, 0)
    etype = np.where(is_vlan, _be16_at(flat, starts, lens, 16), etype)
    l3 = np.where(is_vlan, 18, 14).astype(np.int64)

    is_v4 = etype == 0x0800
    is_v6 = etype == 0x86DD

    ihl = (_byte_at(flat, starts, lens, l3) & 0x0F).astype(np.int64) * 4
    ttl = _byte_at(flat, starts, lens, l3 + 8)
    proto4 = _byte_at(flat, starts, lens, l3 + 9)
    v4src = _dotted(_byte_at(flat, starts, lens, l3 + 12),
                    _byte_at(flat, starts, lens, l3 + 13),
                    _byte_at(flat, starts, lens, l3 + 14),
                    _byte_at(flat, starts, lens, l3 + 15))
    v4dst = _dotted(_byte_at(flat, starts, lens, l3 + 16),
                    _byte_at(flat, starts, lens, l3 + 17),
                    _byte_at(flat, starts, lens, l3 + 18),
                    _byte_at(flat, starts, lens, l3 + 19))

    proto6 = _byte_at(flat, starts, lens, l3 + 6)  # next header (no ext walk)
    hop6 = _byte_at(flat, starts, lens, l3 + 7)

    proto = np.where(is_v4, proto4, np.where(is_v6, proto6, 0))
    l4 = np.where(is_v4, l3 + ihl, l3 + 40).astype(np.int64)
    is_l4 = (is_v4 | is_v6) & np.isin(proto, (6, 17))
    src_port = _be16_at(flat, starts, lens, l4)
    dst_port = _be16_at(flat, starts, lens, l4 + 2)
    is_tcp = is_l4 & (proto == 6)
    tcp_doff = ((_byte_at(flat, starts, lens, l4 + 12) >> 4)
                .astype(np.int64) * 4)
    tcp_flags = _byte_at(flat, starts, lens, l4 + 13)
    # payload only where the FULL relevant header was captured (a frame
    # truncated before l4+12 reads doff=0 and would otherwise emit TCP
    # header bytes as payload; non-IP frames have no payload at all).
    # Non-TCP/UDP IP protocols (ICMP, GRE, …) expose the bytes past the
    # IP header — the classic tunnel/exfil scan surface.
    tcp_ok = is_tcp & (tcp_doff >= 20) & (lens >= l4 + tcp_doff)
    udp_ok = is_l4 & (proto == 17) & (lens >= l4 + 8)
    other_ip = (is_v4 | is_v6) & ~np.isin(proto, (6, 17)) & (lens >= l4)
    pay_ok = tcp_ok | udp_ok | other_ip
    payload_off = np.where(tcp_ok, l4 + tcp_doff,
                           np.where(udp_ok, l4 + 8,
                                    np.where(other_ip, l4, lens)))
    payload_off = np.minimum(payload_off, lens)

    ip_mask = is_v4 | is_v6
    # <U45 so compressed-hex IPv6 strings fit (v4 dotted is <=15 chars)
    ip_src = np.where(is_v4, v4src, "").astype("<U45")
    ip_dst = np.where(is_v4, v4dst, "").astype("<U45")
    if is_v6.any():  # rare rows only; 16-byte groups → compressed hex
        import ipaddress

        for i in np.flatnonzero(is_v6):
            if lens[i] >= l3[i] + 40:
                s = starts[i] + l3[i] + 8
                ip_src[i] = str(ipaddress.IPv6Address(
                    flat[s:s + 16].tobytes()))
                ip_dst[i] = str(ipaddress.IPv6Address(
                    flat[s + 16:s + 32].tobytes()))

    cols = {
        "ether_src": pa.array(ether_src, pa.string(), mask=~row_valid),
        "ether_dst": pa.array(ether_dst, pa.string(), mask=~row_valid),
        "ether_type": pa.array(etype.astype(np.int32), mask=~row_valid),
        "vlan": pa.array(vlan.astype(np.int32), mask=~(is_vlan & row_valid)),
        "ip_src": pa.array(ip_src, pa.string(), mask=~(ip_mask & row_valid)),
        "ip_dst": pa.array(ip_dst, pa.string(), mask=~(ip_mask & row_valid)),
        "ip_ttl": pa.array(np.where(is_v4, ttl, hop6).astype(np.int32),
                           mask=~(ip_mask & row_valid)),
        "ip_proto": pa.array(proto.astype(np.int32),
                             mask=~(ip_mask & row_valid)),
        "src_port": pa.array(src_port.astype(np.int32),
                             mask=~(is_l4 & row_valid)),
        "dst_port": pa.array(dst_port.astype(np.int32),
                             mask=~(is_l4 & row_valid)),
        "tcp_flags": pa.array(tcp_flags.astype(np.int32),
                              mask=~(is_tcp & row_valid)),
        "payload_offset": pa.array(payload_off.astype(np.int64),
                                   mask=~(pay_ok & row_valid)),
        "payload_len": pa.array((lens - payload_off).astype(np.int64),
                                mask=~(pay_ok & row_valid)),
    }
    if emit_payload:
        cols["payload"] = _binary_from_ranges(
            flat, starts + payload_off, lens - payload_off)
    base = {name: t.column(name) for name in t.column_names
            if keep or name != col}
    out = pa.table({**base, **{k: v for k, v in cols.items()}})
    return out.replace_schema_metadata(None) if out.schema.metadata else out


def decapsulate(ds, col: str = "data", keep: bool = False,
                emit_payload: bool = False):
    import functools

    return ds.map_batches(
        functools.partial(decapsulate_batch, col=col, keep=keep,
                          emit_payload=emit_payload),
        batch_format="pyarrow")
