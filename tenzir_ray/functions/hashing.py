"""Hash functions (reference: libtenzir/builtins/functions/hash.cpp —
md5/sha1/sha2 family; pyarrow.compute has no crypto hashes, so this is a
per-value hashlib loop kept OUT of hot paths; the engine's hot-path hash is
the vectorized pandas siphash in cdc.lake.url_buckets)."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _digest(arr, algo: str) -> pa.Array:
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    out = []
    for v in arr:
        v = v.as_py()
        if v is None:
            out.append(None)
            continue
        if isinstance(v, str):
            v = v.encode()
        out.append(hashlib.new(algo, v).hexdigest())
    return pa.array(out, pa.string())


def hash_md5(arr):
    return _digest(arr, "md5")


def hash_sha1(arr):
    return _digest(arr, "sha1")


def hash_sha224(arr):
    return _digest(arr, "sha224")


def hash_sha256(arr):
    return _digest(arr, "sha256")


def hash_sha384(arr):
    return _digest(arr, "sha384")


def hash_sha512(arr):
    return _digest(arr, "sha512")


def hash_fast64(arr) -> pa.Array:
    """Vectorized non-crypto 64-bit hash (engine-internal; deterministic
    across processes). Tenzir's xxh3 analog without the xxhash dep.
    Null propagates to null (like every _digest function here) — it
    must not hash to one shared constant that groups all null rows."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    h = pd.util.hash_array(arr.to_numpy(zero_copy_only=False))
    out = pa.array(h.astype(np.uint64), pa.uint64())
    if arr.null_count:
        out = pc.if_else(pc.is_valid(arr), out,
                         pa.scalar(None, pa.uint64()))
    return out


def hash_xxh3(arr) -> pa.Array:
    """xxh3 via the ``xxhash`` wheel when present; this container ships
    none, so the absence is LOUD instead of silently substituting an
    incompatible hash (hash_fast64 is the in-repo 64-bit fast hash)."""
    try:
        import xxhash
    except ImportError as e:
        raise NotImplementedError(
            "hash_xxh3 needs the 'xxhash' package (not in this "
            "environment); use hash_fast64 for a fast non-portable "
            "64-bit hash") from e
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return pa.array(
        [None if v is None else xxhash.xxh3_64_intdigest(str(v))
         for v in arr.to_pylist()], pa.uint64())
