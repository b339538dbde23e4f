"""Record (struct) functions — reference builtins/functions/record.cpp
(`merge`, `has`, `get`, field access). Vectorized over struct columns."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def _chunked(arr):
    return arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr


def get(arr, field: str, default=None) -> pa.Array:
    """struct column → child field; missing field → default-filled
    column (the reference's ``get(rec, "f", default)``)."""
    arr = _chunked(arr)
    if field in {f.name for f in arr.type}:
        return pc.struct_field(arr, field)
    return pa.array([default] * len(arr))


def has(arr, field: str) -> pa.Array:
    """True per row iff the struct type carries the field and the value
    is non-null (``rec.has("f")``)."""
    arr = _chunked(arr)
    if field not in {f.name for f in arr.type}:
        return pa.array([False] * len(arr))
    return pc.is_valid(pc.struct_field(arr, field))


def merge(a, b) -> pa.StructArray:
    """Merge two struct columns; right side wins on key conflict
    (record.cpp merge semantics)."""
    a, b = _chunked(a), _chunked(b)
    fields: dict[str, pa.Array] = {}
    for f in a.type:
        fields[f.name] = pc.struct_field(a, f.name)
    for f in b.type:
        fields[f.name] = pc.struct_field(b, f.name)
    return pa.StructArray.from_arrays(
        list(fields.values()), names=list(fields.keys()))


def make(**cols) -> pa.StructArray:
    """Build a struct column from named arrays (TQL record literal)."""
    arrs = [_chunked(c) if isinstance(c, (pa.Array, pa.ChunkedArray))
            else pa.array(c) for c in cols.values()]
    return pa.StructArray.from_arrays(arrs, names=list(cols.keys()))


def keys(arr) -> list[str]:
    """Field names of a struct column's type."""
    return [f.name for f in _chunked(arr).type]
