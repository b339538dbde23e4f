"""Network functions: prefix-preserving IP pseudonymization + community id.

- ``pseudonymize``: Crypto-PAn-style prefix-preserving anonymization
  (reference: operators/pseudonymize.cpp:45 / encrypt_cryptopan). Same
  contract as the reference — equal prefixes map to equal prefixes, so
  subnet structure survives — implemented with a keyed HMAC-SHA256 per
  prefix bit instead of the AES-based original (no AES primitive in the
  stdlib); deterministic in the key.
- ``community_id``: the open Community ID flow hash v1 spec
  (sha1 over seed + sorted endpoint tuple; reference
  builtins/functions/community_id.cpp:257) for ip pairs + ports + proto.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import ipaddress
import socket
import struct

import pyarrow as pa


class CryptoPrefix:
    """Prefix-preserving pseudonymizer; build once per actor (the per-bit
    HMAC pads are derived eagerly), apply per batch."""

    def __init__(self, key: bytes = b"tenzir-ray-default-key"):
        self.key = key
        self._cache: dict[str, str] = {}

    def _bit(self, prefix_bits: str) -> int:
        d = hmac.new(self.key, prefix_bits.encode(), hashlib.sha256).digest()
        return d[0] & 1

    def one(self, ip: str) -> str:
        out = self._cache.get(ip)
        if out is not None:
            return out
        addr = ipaddress.ip_address(ip)
        n = 32 if addr.version == 4 else 128
        bits = bin(int(addr))[2:].zfill(n)
        flipped = "".join(
            str(int(b) ^ self._bit(bits[:i])) for i, b in enumerate(bits)
        )
        val = int(flipped, 2)
        out = str(
            ipaddress.IPv4Address(val) if n == 32 else ipaddress.IPv6Address(val)
        )
        self._cache[ip] = out
        return out

    def __call__(self, arr) -> pa.Array:
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        return pa.array(
            [None if v is None else self.one(v) for v in arr.to_pylist()],
            pa.string(),
        )


def pseudonymize(ds, field: str, key: bytes = b"tenzir-ray-default-key"):
    """Dataset stage: actor pool so the HMAC state + LRU cache live once
    per actor (reference runs one cipher per pipeline)."""
    class Stage:
        def __init__(self):
            self.p = CryptoPrefix(key)

        def __call__(self, t: pa.Table) -> pa.Table:
            return t.set_column(
                t.column_names.index(field), field, self.p(t.column(field))
            )

    from ..util import autoscale_pool

    return ds.map_batches(Stage, batch_format="pyarrow",
                          concurrency=autoscale_pool())


def community_id(
    src_ip, dst_ip, src_port, dst_port, proto: int = 6, seed: int = 0
) -> pa.Array:
    """Vectorized-enough Community ID v1 over parallel arrays."""
    def col(x):
        return x.combine_chunks().to_pylist() if isinstance(
            x, (pa.ChunkedArray,)
        ) else (x.to_pylist() if isinstance(x, pa.Array) else list(x))

    out = []
    for s, d, sp, dp in zip(col(src_ip), col(dst_ip), col(src_port), col(dst_port)):
        if s is None or d is None:
            out.append(None)
            continue
        sb = socket.inet_pton(
            socket.AF_INET6 if ":" in s else socket.AF_INET, s)
        db = socket.inet_pton(
            socket.AF_INET6 if ":" in d else socket.AF_INET, d)
        if (sb, sp) > (db, dp):  # canonical order
            sb, db, sp, dp = db, sb, dp, sp
        payload = (
            struct.pack("!H", seed) + sb + db
            + struct.pack("!BBHH", proto, 0, sp, dp)
        )
        out.append("1:" + base64.b64encode(hashlib.sha1(payload).digest()).decode())
    return pa.array(out, pa.string())
