"""List functions (reference: builtins/functions/list.cpp and the list
duals of where/map at operators/where_map.cpp:265-455)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def length(arr):
    return pc.list_value_length(arr)


def get(arr, i: int):
    return pc.list_element(arr, i)


def first(arr):
    return pc.list_element(arr, 0)


def flatten(arr):
    return pc.list_flatten(arr)


def parent_indices(arr):
    return pc.list_parent_indices(arr)


def distinct(arr) -> pa.Array:
    """Per-row distinct elements. No pc kernel — python fallback."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return pa.array(
        [None if v is None else list(dict.fromkeys(v)) for v in arr.to_pylist()],
        arr.type,
    )


def sort_elements(arr) -> pa.Array:
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return pa.array(
        [None if v is None else sorted(v) for v in arr.to_pylist()], arr.type
    )
