"""IP address / subnet type support.

The reference models ``ip`` as a 16-byte address (v4-mapped) and
``subnet`` as (ip, prefix) — libtenzir/include/tenzir/type.hpp:696-944,
with CIDR-keyed lookup contexts backed by a subnet tree
(builtins/contexts/lookup_table.cpp:221 subnet_tree). Here:

- ip columns are ``fixed_size_binary(16)`` (v4 addresses v4-mapped,
  ``::ffff:a.b.c.d``), parsed/printed vectorized for the v4 hot path
  (numpy byte matrix) with a per-value ``ipaddress`` fallback for v6;
- ``subnet_contains`` is a vectorized byte-prefix compare;
- :class:`CidrIndex` does longest-prefix-match via one ``pc.index_in``
  pass per distinct prefix length (longest first) — the vectorized
  analog of the subnet tree walk.
"""

from __future__ import annotations

import ipaddress
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

#: octets reject leading zeros ('010' is ambiguous octal — ipaddress
#: and the reference both refuse it), so the vectorized path's validity
#: matches the per-value fallback exactly
_OCT = r"(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)"
_V4 = re.compile(rf"^{_OCT}\.{_OCT}\.{_OCT}\.{_OCT}$")
_V4_PREFIX = bytes(10) + b"\xff\xff"


def _ip_bytes(s: str) -> bytes | None:
    try:
        a = ipaddress.ip_address(s)
    except ValueError:
        return None
    if a.version == 4:
        return _V4_PREFIX + a.packed
    return a.packed


def ip_parse(arr) -> pa.Array:
    """string column → fixed_size_binary(16) ip column (null on parse
    failure). The v4 SUBSET of every batch is vectorized (one pandas
    str.extract + numpy byte assembly); only the v6/invalid minority
    goes through the per-value ``ipaddress`` path — one v6 address no
    longer degrades the whole batch."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    import pandas as pd

    s = pd.Series(arr.to_pandas())
    n = len(s)
    if n == 0:
        return pa.array([], pa.binary(16))
    parts = s.str.extract(_V4, expand=True)
    is4 = parts.notna().all(axis=1).to_numpy()
    buf = np.zeros((n, 16), dtype=np.uint8)
    ok = np.zeros(n, dtype=bool)
    if is4.any():
        o = parts.to_numpy()[is4].astype(np.int64)
        octs_ok = (o <= 255).all(axis=1)  # regex guarantees >= 0
        rows = np.flatnonzero(is4)[octs_ok]
        buf[rows, 10:12] = 0xFF
        buf[rows, 12:16] = o[octs_ok].astype(np.uint8)
        ok[rows] = True
    rest = np.flatnonzero(~ok)
    if len(rest):
        vals = s.to_numpy()
        for i in rest:
            v = vals[i]
            b = _ip_bytes(v) if isinstance(v, str) else None
            if b is not None:
                buf[i] = np.frombuffer(b, np.uint8)
                ok[i] = True
    validity = None if ok.all() else \
        pa.py_buffer(np.packbits(ok, bitorder="little").tobytes())
    return pa.FixedSizeBinaryArray.from_buffers(
        pa.binary(16), n, [validity, pa.py_buffer(buf.tobytes())],
        null_count=int((~ok).sum()),
    )


def ip_print(arr) -> pa.Array:
    """fixed_size_binary(16) → canonical string ('a.b.c.d' for v4-mapped).
    Vectorized fast path for all-v4 batches (numpy octet → dotted-quad);
    per-value ``ipaddress`` fallback only for batches containing v6."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    m, valid = _byte_matrix(arr, with_mask=True)
    if not len(m):
        return pa.array([], pa.string())
    v4 = (m[:, :12] == np.frombuffer(_V4_PREFIX, np.uint8)).all(axis=1)
    octs = m[:, 12:16].astype("U3")
    s = octs[:, 0]
    for j in (1, 2, 3):
        s = np.char.add(np.char.add(s, "."), octs[:, j])
    if bool((v4 | ~valid).all()):
        res = pa.array(s, pa.string())
        if not valid.all():
            res = pc.if_else(pa.array(valid), res, pa.scalar(None, pa.string()))
        return res
    # mixed batch: the dotted-quad vector covers v4 rows; only genuine
    # v6 rows take the per-value path
    out = s.astype(object)
    for i in np.flatnonzero(~v4 & valid):
        out[i] = str(ipaddress.IPv6Address(m[i].tobytes()))
    return pa.array(out, pa.string(), mask=~valid)


def _byte_matrix(arr: pa.Array, with_mask: bool = False):
    """(n, 16) uint8 matrix of a fixed_size_binary(16) column, sliced
    zero-copy off the flat Arrow data buffer (nulls zeroed). With
    ``with_mask=True`` also returns the validity bool array so callers
    can distinguish a genuine ``::`` from a null."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        m = np.zeros((0, 16), dtype=np.uint8)
        return (m, np.zeros(0, dtype=bool)) if with_mask else m
    data = np.frombuffer(
        arr.buffers()[1], dtype=np.uint8,
        count=(arr.offset + n) * 16)[arr.offset * 16:].reshape(n, 16)
    valid = np.ones(n, dtype=bool)
    if arr.null_count:
        valid = pc.is_valid(arr).to_numpy(zero_copy_only=False)
        data = data.copy()
        data[~valid] = 0
    return (data, valid) if with_mask else data


def is_v4(arr) -> pa.Array:
    m, valid = _byte_matrix(arr, with_mask=True)
    v4 = (m[:, :12] == np.frombuffer(_V4_PREFIX, np.uint8)).all(axis=1)
    res = pa.array(v4 & valid)
    if not valid.all():
        res = pc.if_else(pa.array(valid), res, pa.scalar(None, pa.bool_()))
    return res


def is_v6(arr) -> pa.Array:
    """True for addresses OUTSIDE the v4-mapped range (reference is_v6 =
    !is_v4 over the 16-byte storage); null in → null out."""
    return pc.invert(is_v4(arr))


def _mask_bytes(prefix_len: int) -> np.ndarray:
    """16-byte mask for a 128-bit prefix length."""
    mask = np.zeros(16, dtype=np.uint8)
    full, rem = divmod(prefix_len, 8)
    mask[:full] = 0xFF
    if full < 16 and rem:
        mask[full] = (0xFF << (8 - rem)) & 0xFF
    return mask


def _parse_cidr(cidr: str) -> tuple[bytes, int]:
    net = ipaddress.ip_network(cidr, strict=False)
    if net.version == 4:
        return _V4_PREFIX + net.network_address.packed, net.prefixlen + 96
    return net.network_address.packed, net.prefixlen


def subnet_contains(arr, cidr: str) -> pa.Array:
    """Vectorized ``ip in subnet`` over a fixed_size_binary(16) column.
    Null ips are NOT contained (a null must not match ``::/0``)."""
    base, plen = _parse_cidr(cidr)
    mask = _mask_bytes(plen)
    want = np.frombuffer(base, np.uint8) & mask
    m, valid = _byte_matrix(arr, with_mask=True)
    return pa.array(((m & mask) == want).all(axis=1) & valid)


class CidrIndex:
    """Longest-prefix-match table: CIDR string → value.

    Build once (broadcast via ``ray.put``); probe a whole ip column with
    one ``pc.index_in`` per distinct prefix length, longest first —
    vectorized LPM without a per-row tree walk."""

    def __init__(self, entries: dict[str, object]):
        by_len: dict[int, tuple[list[bytes], list[object]]] = {}
        for cidr, value in entries.items():
            base, plen = _parse_cidr(cidr)
            mask = _mask_bytes(plen)
            key = (np.frombuffer(base, np.uint8) & mask).tobytes()
            by_len.setdefault(plen, ([], []))
            by_len[plen][0].append(key)
            by_len[plen][1].append(value)
        # longest prefix first — first hit wins; values as an object
        # ndarray so the probe merge is a fancy-index, not a Python loop
        self.levels = []
        for plen, (keys, values) in sorted(by_len.items(), reverse=True):
            vals_np = np.empty(len(values), dtype=object)
            vals_np[:] = values
            self.levels.append(
                (plen, _mask_bytes(plen), pa.array(keys, pa.binary(16)),
                 vals_np))

    def lookup(self, arr) -> list[object | None]:
        """LPM for every ip in a fixed_size_binary(16) column. Fully
        vectorized per level: numpy mask → FixedSizeBinaryArray built
        straight off the byte matrix (no per-row .tobytes()) →
        ``pc.index_in`` → fancy-index merge. Null ips resolve to None."""
        m, valid = _byte_matrix(arr, with_mask=True)
        n = len(m)
        out = np.full(n, None, dtype=object)
        unresolved = valid.copy()
        for _plen, mask, keys, vals_np in self.levels:
            if not unresolved.any():
                break
            masked = np.ascontiguousarray(m & mask)
            probe = pa.FixedSizeBinaryArray.from_buffers(
                pa.binary(16), n, [None, pa.py_buffer(masked.tobytes())])
            idx = pc.index_in(probe, value_set=keys).to_numpy(
                zero_copy_only=False).astype(np.float64)
            hit = unresolved & ~np.isnan(idx)
            if hit.any():
                out[hit] = vals_np[idx[hit].astype(np.int64)]
                unresolved &= ~hit
        return out.tolist()


def enrich_cidr(ds, cidr_map: dict[str, object], key: str,
                out_field: str = "zone"):
    """Enrich with a CIDR-keyed lookup context: LPM of the ``key`` ip
    column (strings or binary16) against a broadcast CidrIndex — the
    analog of enriching against a subnet-keyed lookup-table context
    (lookup_table.cpp:221)."""
    import ray
    from ray.data import Dataset  # noqa: F401

    # the INDEX is built once on the driver and broadcast (ray.put),
    # probed by plain tasks — full parallelism immediately, zero-copy
    # reads of the shared index per worker
    ref = ray.put(CidrIndex(cidr_map))

    def _enrich(t: pa.Table) -> pa.Table:
        index = ray.get(ref)
        col = t.column(key).combine_chunks()
        if not pa.types.is_fixed_size_binary(col.type):
            col = ip_parse(col)
        vals = pa.array(index.lookup(col))
        if out_field in t.column_names:
            t = t.set_column(t.column_names.index(out_field), out_field, vals)
        else:
            t = t.append_column(out_field, vals)
        return t.replace_schema_metadata(None) if t.schema.metadata else t

    return ds.map_batches(_enrich, batch_format="pyarrow")


def geoip_context_from_csv(path: str, network_col: str = "network",
                           value_cols: list[str] | None = None) -> CidrIndex:
    """GeoIP lookup context from a GeoLite2-style CSV (network,geo…):
    the reference ships an mmdb-backed geoip context
    (builtins/contexts/geoip.cpp); with no libmaxminddb in this
    environment, the same enrichment runs off the public CSV form of
    the database through the CIDR longest-prefix-match index. Use with
    :func:`enrich_cidr`-style probing: ``CidrIndex.lookup`` returns the
    selected columns as a dict per ip."""
    import csv

    entries: dict[str, object] = {}
    with open(path, newline="") as f:
        reader = csv.DictReader(f)
        for row in reader:
            net = row.pop(network_col)
            if value_cols:
                entries[net] = {k: row.get(k) for k in value_cols}
            else:
                entries[net] = dict(row)
    return CidrIndex(entries)
