"""Base64 / hex encode-decode (reference: builtins/functions/base64.cpp,
hex.cpp). Python-level loops; edge-path functions, not hot-path."""

from __future__ import annotations

import base64
import binascii

import pyarrow as pa


def _map(arr, fn, out_type):
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return pa.array(
        [None if v.as_py() is None else fn(v.as_py()) for v in arr], out_type
    )


def _as_bytes(v) -> bytes:
    return v.encode() if isinstance(v, str) else v


def encode_base64(arr):
    return _map(arr, lambda v: base64.b64encode(_as_bytes(v)).decode(), pa.string())


def decode_base64(arr):
    return _map(arr, lambda v: base64.b64decode(_as_bytes(v)), pa.binary())


def encode_hex(arr):
    return _map(arr, lambda v: _as_bytes(v).hex(), pa.string())


def decode_hex(arr):
    return _map(arr, lambda v: binascii.unhexlify(_as_bytes(v)), pa.binary())
