"""compress/decompress operators (reference operators/compress.cpp,
decompress.cpp + per-codec variants compress_gzip/zstd/lz4/brotli/bz2).

Standard framed byte streams over binary columns via Arrow's
compressed-stream machinery (gzip/zstd/lz4-frame/brotli/bz2 — the same
codecs the reference exposes). Per-value loops: values are payload-
sized blobs, not hot-path row fields."""

from __future__ import annotations

import pyarrow as pa

CODECS = ("gzip", "zstd", "lz4", "brotli", "bz2")


def _chunked(arr):
    return arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr


def _one_compress(v: bytes, codec: str) -> bytes:
    sink = pa.BufferOutputStream()
    with pa.CompressedOutputStream(sink, codec) as f:
        f.write(v)
    return sink.getvalue().to_pybytes()


def _one_decompress(v: bytes, codec: str) -> bytes:
    with pa.CompressedInputStream(pa.BufferReader(v), codec) as f:
        return f.read()


def compress(arr, codec: str = "zstd") -> pa.Array:
    """binary column → standard ``codec``-framed streams (gzip members,
    zstd frames, lz4 frame format, brotli, bz2)."""
    if codec not in CODECS:
        raise ValueError(f"unknown codec {codec!r} (supported: {CODECS})")
    arr = _chunked(arr)
    return pa.array(
        [None if v is None else
         _one_compress(v.encode() if isinstance(v, str) else v, codec)
         for v in arr.to_pylist()],
        pa.binary())


def decompress(arr, codec: str = "zstd") -> pa.Array:
    if codec not in CODECS:
        raise ValueError(f"unknown codec {codec!r} (supported: {CODECS})")
    arr = _chunked(arr)
    return pa.array(
        [None if v is None else _one_decompress(v, codec)
         for v in arr.to_pylist()],
        pa.binary())
