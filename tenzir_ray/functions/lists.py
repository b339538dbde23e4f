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


def _canon_list(arr) -> pa.ListArray:
    """Canonicalize a list array for offset math: Ray blocks are often
    zero-copy SLICES, whose ``.offsets`` are NOT rebased to 0 while
    ``flatten()`` is — mixing them corrupts every kernel below. A
    ``take`` of the identity permutation compacts the array (offset 0,
    dense values)."""
    import numpy as np

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    offs = np.asarray(arr.offsets)
    need = arr.offset != 0 or (len(offs) and offs[0] != 0)
    if not need and arr.null_count:
        # a null slot may still span values in the backing buffer
        # (e.g. from_arrays with a mask): offsets then disagree with
        # flatten(), which DROPS those spans — compact to realign
        nulls = pc.is_null(arr).to_numpy(zero_copy_only=False)
        need = bool(np.any(nulls & (np.diff(offs) > 0)))
    if need:
        arr = arr.take(pa.array(np.arange(len(arr), dtype=np.int64)))
    return arr


def _add_element(arr, value, front: bool) -> pa.Array:
    """Shared append/prepend kernel (builtins/functions/list.cpp): grow
    every list by one element, vectorized — a take-index interleave
    over [flat values ++ n copies of value], no per-row Python."""
    import numpy as np

    arr = _canon_list(arr)
    n = len(arr)
    flat = arr.flatten()
    offs = np.asarray(arr.offsets)
    val_arr = pa.array([value] * n, type=flat.type)
    lengths = np.diff(offs)
    new_offs = offs + np.arange(n + 1)
    idx = np.empty(len(flat) + n, np.int64)
    owner = np.repeat(np.arange(n), lengths)
    if front:
        idx[new_offs[:-1]] = len(flat) + np.arange(n)
        idx[np.arange(len(flat)) + owner + 1] = np.arange(len(flat))
    else:
        idx[new_offs[1:] - 1] = len(flat) + np.arange(n)
        idx[np.arange(len(flat)) + owner] = np.arange(len(flat))
    values = pa.concat_arrays([flat, val_arr]).take(pa.array(idx))
    out = pa.ListArray.from_arrays(pa.array(new_offs, pa.int32()), values)
    if arr.null_count:
        out = pc.if_else(pc.is_valid(arr), out,
                         pa.scalar(None, out.type))
    return out


def append(arr, value) -> pa.Array:
    """list, x → list with x appended (list.cpp append)."""
    return _add_element(arr, value, front=False)


def prepend(arr, value) -> pa.Array:
    """list, x → list with x prepended (list.cpp prepend)."""
    return _add_element(arr, value, front=True)


def map_elements(arr, fn) -> pa.Array:
    """Lambda-over-list, vectorized (where_map.cpp:265-455 `map`): the
    kernel ``fn`` (Array → Array) runs ONCE over the flat element
    values of the whole column; offsets are reused unchanged — no
    per-row or per-element Python."""
    arr = _canon_list(arr)
    out_flat = fn(arr.flatten())
    if isinstance(out_flat, pa.ChunkedArray):
        out_flat = out_flat.combine_chunks()
    out = pa.ListArray.from_arrays(arr.offsets, out_flat)
    if arr.null_count:
        out = pc.if_else(pc.is_valid(arr), out, pa.scalar(None, out.type))
    return out


def filter_elements(arr, fn) -> pa.Array:
    """Lambda-over-list `where` (where_map.cpp:265-455): keep elements
    whose predicate holds. One vectorized mask over the flat values;
    new offsets come from a cumulative-sum gather (kept-before-position
    indexed at the old offsets), so empty lists cost nothing."""
    import numpy as np

    arr = _canon_list(arr)
    flat = arr.flatten()
    mask = fn(flat)
    if isinstance(mask, pa.ChunkedArray):
        mask = mask.combine_chunks()
    if len(mask) == 0:
        mask = pa.array([], pa.bool_())
    # null predicate = drop (SQL WHERE semantics)
    mask = pc.fill_null(mask, False)
    offs = np.asarray(arr.offsets)
    kept_before = np.concatenate(
        [[0], np.cumsum(mask.to_numpy(zero_copy_only=False))])
    new_offs = kept_before[offs].astype(np.int32)
    out = pa.ListArray.from_arrays(pa.array(new_offs, pa.int32()),
                                   flat.filter(mask))
    if arr.null_count:
        out = pc.if_else(pc.is_valid(arr), out, pa.scalar(None, out.type))
    return out


def zip_lists(xs, ys) -> pa.Array:
    """``zip(xs, ys)`` (builtins/functions/zip.cpp; web docs
    functions/zip.md): combine two lists into one list of
    ``{left, right}`` records. Mismatched lengths (or one null side)
    pad the shorter with nulls to the LONGER length; both sides null
    gives a null row. Fully vectorized: one gather per side driven by
    numpy offset math — no per-row Python."""
    import numpy as np

    xs, ys = _canon_list(xs), _canon_list(ys)
    n = len(xs)
    if len(ys) != n:
        raise ValueError("zip: length mismatch between list columns")
    xo = np.asarray(xs.offsets, dtype=np.int64)
    yo = np.asarray(ys.offsets, dtype=np.int64)
    xlen, ylen = np.diff(xo), np.diff(yo)
    xnull = np.asarray(pc.is_null(xs).to_numpy(zero_copy_only=False))
    ynull = np.asarray(pc.is_null(ys).to_numpy(zero_copy_only=False))
    if n:
        xlen = np.where(xnull, 0, xlen)
        ylen = np.where(ynull, 0, ylen)
    mismatched = int(np.count_nonzero(
        (xlen != ylen) & ~xnull & ~ynull)) if n else 0
    if mismatched:
        # functions/zip.md: mismatching lengths fill with nulls AND warn
        # — one diagnostic per batch, never per row
        from tenzir_ray.diagnostics import emit

        emit(f"zip: {mismatched} row(s) with mismatching list lengths "
             "padded with nulls")
    outlen = np.maximum(xlen, ylen)
    out_off = np.concatenate([[0], np.cumsum(outlen)])
    total = int(out_off[-1])
    # output-layout index math is side-independent: hoist it
    pos = np.arange(total, dtype=np.int64) - np.repeat(out_off[:-1], outlen)

    def side(flat: pa.Array, offs, lens):
        # j-th slot of row i reads flat[offs[i] + j] when j < lens[i],
        # else null — expressed as one take with null indices.
        idx = np.repeat(offs[:-1], outlen) + pos
        valid = pos < np.repeat(lens, outlen)
        return flat.take(pa.array(
            np.where(valid, idx, 0), pa.int64(),
            mask=~valid))

    left = side(xs.flatten(), xo, xlen)
    right = side(ys.flatten(), yo, ylen)
    structs = pa.StructArray.from_arrays([left, right], ["left", "right"])
    out = pa.ListArray.from_arrays(
        pa.array(out_off.astype(np.int32), pa.int32()), structs)
    both_null = pa.array(xnull & ynull)
    if pc.any(both_null).as_py():
        out = pc.if_else(both_null, pa.scalar(None, out.type), out)
    return out


def concatenate_lists(xs, ys) -> pa.Array:
    """``concatenate(xs, ys)`` (builtins/functions/list.cpp; web docs
    functions/concatenate.md): per-row list concatenation —
    ``[...xs, ...ys]``. A null side contributes nothing; both null
    gives null. One combined gather over the two flat buffers — no
    per-row Python."""
    import numpy as np

    xs, ys = _canon_list(xs), _canon_list(ys)
    n = len(xs)
    if len(ys) != n:
        raise ValueError("concatenate: length mismatch between columns")
    xo = np.asarray(xs.offsets, dtype=np.int64)
    yo = np.asarray(ys.offsets, dtype=np.int64)
    xlen, ylen = np.diff(xo), np.diff(yo)
    xnull = np.asarray(pc.is_null(xs).to_numpy(zero_copy_only=False))
    ynull = np.asarray(pc.is_null(ys).to_numpy(zero_copy_only=False))
    if n:
        xlen = np.where(xnull, 0, xlen)
        ylen = np.where(ynull, 0, ylen)
    outlen = xlen + ylen
    out_off = np.concatenate([[0], np.cumsum(outlen)])
    total = int(out_off[-1])
    xflat, yflat = xs.flatten(), ys.flatten()
    if xflat.type != yflat.type:
        yflat = yflat.cast(xflat.type)
    combined = pa.concat_arrays([xflat, yflat])
    # slot j of row i reads xflat[xo[i]+j] while j < xlen[i], then
    # yflat[yo[i] + (j - xlen[i])] — one fused index array
    starts = np.repeat(out_off[:-1], outlen)
    pos = np.arange(total, dtype=np.int64) - starts
    in_x = pos < np.repeat(xlen, outlen)
    idx = np.where(
        in_x,
        np.repeat(xo[:-1], outlen) + pos,
        len(xflat) + np.repeat(yo[:-1], outlen)
        + (pos - np.repeat(xlen, outlen)))
    out = pa.ListArray.from_arrays(
        pa.array(out_off.astype(np.int32), pa.int32()),
        combined.take(pa.array(idx, pa.int64())))
    both_null = pa.array(xnull & ynull)
    if pc.any(both_null).as_py():
        out = pc.if_else(both_null, pa.scalar(None, out.type), out)
    return out
