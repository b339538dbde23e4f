"""Canonical Arrow schemas + schema-evolution resolution.

Models the reference's dynamic schema system: Tenzir unifies slice schemas
field-by-field, null-promoting missing fields and rejecting incompatible
changes (``unify`` at libtenzir/src/type.cpp:3547-3598; value-level
conversion via ``cast``, libtenzir/include/tenzir/cast.hpp:31-245). Here the
same contract is expressed with ``pyarrow.unify_schemas`` plus an explicit
widen/cast table and a rename alias map (renames are not inferable from
structure, so they are declared — FIXTURES.md §2 epoch E3).

All evolution is resolved *at merge time*: WAL epochs may carry differing
schemas; ``align_table`` rewrites any epoch batch to the current unified
target schema (add columns as null, widen dictionary→string and
int→float/timestamp units via cast, apply aliases).
"""

from __future__ import annotations

import pyarrow as pa

# The authoritative input shape (BASELINE.json input_hint): Common-Crawl-style
# web pages. `text` carries the per-row invariant: final text per url must be
# byte-identical to replaying the log.
PAGES_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("ns")),
        pa.field("html", pa.binary()),
        pa.field("text", pa.string()),
        pa.field("lang", pa.string()),
    ]
)

# Change-event log over `pages` (FIXTURES.md §2). `op` is kept as a plain
# string in the canonical schema; epochs may encode it dictionary-typed.
OPS = ("INSERT", "UPDATE", "DELETE")

WAL_SCHEMA = pa.schema(
    [
        pa.field("lsn", pa.int64()),
        pa.field("op", pa.dictionary(pa.int8(), pa.string())),
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("ns")),
        pa.field("html", pa.binary()),
        pa.field("text", pa.string()),
        pa.field("lang", pa.string()),
    ]
)

# Default rename alias map: epoch E3 renames `text` → `body`; the lake keeps
# the canonical name so the per-url text invariant stays checkable.
DEFAULT_ALIASES: dict[str, str] = {"body": "text"}


def _decay(t: pa.DataType) -> pa.DataType:
    """Strip dictionary encoding (widen enum → its value type)."""
    if pa.types.is_dictionary(t):
        return t.value_type
    return t


def unify_types(a: pa.DataType, b: pa.DataType) -> pa.DataType:
    """Unify two Arrow types, reference semantics (type.cpp:3547-3598):
    null unifies with anything; equal types unify; dictionary widens to its
    value type; numeric widening int→float; timestamps widen to finer unit.
    Raises ``TypeError`` for non-unifiable pairs (reference returns nullopt).
    """
    a, b = _decay(a), _decay(b)
    if a.equals(b):
        return a
    if pa.types.is_null(a):
        return b
    if pa.types.is_null(b):
        return a
    num = lambda t: pa.types.is_integer(t) or pa.types.is_floating(t)
    if num(a) and num(b):
        if pa.types.is_floating(a) or pa.types.is_floating(b):
            return pa.float64()
        if pa.types.is_signed_integer(a) != pa.types.is_signed_integer(b):
            return pa.int64()  # mixed sign widens to signed 64
        return a if a.bit_width >= b.bit_width else b
    if pa.types.is_timestamp(a) and pa.types.is_timestamp(b):
        units = ["s", "ms", "us", "ns"]
        return pa.timestamp(max(a.unit, b.unit, key=units.index))
    if (pa.types.is_large_string(a) and pa.types.is_string(b)) or (
        pa.types.is_string(a) and pa.types.is_large_string(b)
    ):
        return pa.large_string()
    if pa.types.is_list(a) and pa.types.is_list(b):
        return pa.list_(unify_types(a.value_type, b.value_type))
    if pa.types.is_struct(a) and pa.types.is_struct(b):
        fields: dict[str, pa.DataType] = {f.name: f.type for f in a}
        for f in b:
            fields[f.name] = (
                unify_types(fields[f.name], f.type) if f.name in fields else f.type
            )
        return pa.struct([pa.field(n, t) for n, t in fields.items()])
    raise TypeError(f"cannot unify {a} with {b}")


def unify_schemas(
    schemas: list[pa.Schema], aliases: dict[str, str] | None = None
) -> pa.Schema:
    """Field-by-field unification: fields of later schemas are appended
    (null-promoted for earlier data); same-name fields type-unify; alias
    names resolve to their canonical field first.
    """
    aliases = DEFAULT_ALIASES if aliases is None else aliases
    names: list[str] = []
    types: dict[str, pa.DataType] = {}
    for s in schemas:
        for f in s:
            name = aliases.get(f.name, f.name)
            if name in types:
                types[name] = unify_types(types[name], f.type)
            else:
                names.append(name)
                types[name] = _decay(f.type)
    return pa.schema([pa.field(n, types[n]) for n in names])


def align_table(
    table: pa.Table,
    target: pa.Schema,
    aliases: dict[str, str] | None = None,
) -> pa.Table:
    """Rewrite ``table`` to ``target``: apply rename aliases, add missing
    columns as nulls, cast widened columns, order columns per target.
    Extra columns not in ``target`` are preserved (appended after target
    columns) so engine-internal columns survive alignment.
    """
    aliases = DEFAULT_ALIASES if aliases is None else aliases
    renames = {old: new for old, new in aliases.items() if old in table.column_names}
    if renames:
        table = table.rename_columns(
            [renames.get(n, n) for n in table.column_names]
        )
    n = table.num_rows
    cols, fields = [], []
    for f in target:
        if f.name in table.column_names:
            col = table.column(f.name)
            if not _decay(col.type).equals(f.type) or pa.types.is_dictionary(col.type):
                col = col.cast(f.type)
            cols.append(col)
        else:
            cols.append(pa.nulls(n, f.type))
        fields.append(f)
    for name in table.column_names:
        if name not in target.names:
            cols.append(table.column(name))
            fields.append(pa.field(name, table.column(name).type))
    return pa.Table.from_arrays(cols, schema=pa.schema(fields))
