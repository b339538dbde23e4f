"""Enumeration type (reference type.hpp:930-944 ``enumeration_type`` —
named integer categories backed by a small index type).

Arrow analog: ``pa.dictionary(index_type, value_type)``. Categories map
to dictionary values, the per-row integers to dictionary indices. Cast
both ways is native Arrow (``dictionary_encode`` / ``cast(string)``).

Parquet stores dictionary-encoded PAGES regardless, but decodes to the
value type on read unless asked not to — ``read_enum_parquet`` passes
``read_dictionary`` so the column comes back dictionary-typed, which is
what makes the round-trip type-preserving."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def to_enum(arr, categories: list[str] | None = None):
    """string column → dictionary (enumeration) column.

    Without ``categories`` the dictionary is inferred from the data
    (``dictionary_encode``). With a fixed category list the indices are
    positions in that list — the reference's declared enumeration —
    and values outside it become null."""
    if categories is None:
        if isinstance(arr, pa.ChunkedArray):
            return arr.dictionary_encode().combine_chunks()
        return arr.dictionary_encode()
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    cats = pa.array(categories, pa.string())
    idx = pc.index_in(arr, value_set=cats)
    index_type = pa.int8() if len(categories) <= 127 else pa.int32()
    return pa.DictionaryArray.from_arrays(pc.cast(idx, index_type), cats)


def from_enum(arr) -> pa.Array:
    """dictionary column → its value type (decode)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if not pa.types.is_dictionary(arr.type):
        return arr
    return pc.cast(arr, arr.type.value_type)


def enum_categories(arr) -> pa.Array:
    """The category list of a dictionary (enumeration) column."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return arr.dictionary


def write_enum_parquet(table: pa.Table, path: str) -> None:
    import pyarrow.parquet as pq

    pq.write_table(table, path, use_dictionary=True)


def read_enum_parquet(path: str, enum_cols: list[str]) -> pa.Table:
    """Read with ``read_dictionary`` so ``enum_cols`` come back
    dictionary-typed (the type-preserving half of the round-trip)."""
    import pyarrow.parquet as pq

    return pq.read_table(path, read_dictionary=enum_cols)
