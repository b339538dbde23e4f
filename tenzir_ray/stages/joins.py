"""Temporal joins: as-of join and range (interval) join.

The reference expresses temporal correlation through contexts
(``builtins/contexts/lookup_table.cpp:221-343`` — enrich against a
point-in-time snapshot) and the lake's as-of ``export`` (time travel);
it has no standalone as-of/range join operator. At 100 TB scale a
training-data pipeline needs both as first-class dataset joins (join
events to the latest model-version row, join documents to the crawl
window that produced them), so they are first-class here.

Ray-Data-first design — ONE exchange, no per-key Python:

* both sides are padded to a shared schema (missing columns = nulls,
  Arrow validity bitmaps, near-zero cost), unioned, and shuffled ONCE
  by ``__g = hash(key) & (num_groups-1)`` — a coarse salt group, NOT
  the raw key, so a group holds many keys and one ``map_groups`` call
  processes all of them in single numpy passes (the
  ``connected_components`` idiom, text/graph.py:82).
* inside a group the kernels are pure numpy: one ``np.lexsort`` over
  (key-code, time, side) and one ``np.maximum.accumulate`` carry for
  the as-of match; two cumsum merge-counts plus a bounded
  repeat/arange candidate expansion for the range join. No Python
  loop touches a row or a key.
* skewed keys don't stall a reducer: a hot key shares its coarse
  group with ~(keys/num_groups) others, and the kernel cost is
  O(group rows log group rows) regardless of key distribution.

Partitioning assumption: ``map_groups`` materializes one coarse group
per task, so ``num_groups`` must be sized to the DATA, not just the
cores — (left rows + right rows) / num_groups blocks of the padded
schema must fit a worker's heap (at 100 TB input that means 1e5-1e6
groups, not the default 1024; the default suits ≤ ~1 TB). The exchange
itself ships each row exactly once either way.
"""

from __future__ import annotations

import datetime

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from tenzir_ray.functions.hashing import hash_fast64
from tenzir_ray.util import nometa

_DEFAULT_GROUPS = 1024  # tune >= cluster cores; must be a power of two


def _tol_to_int(tolerance, time_type: pa.DataType) -> int | None:
    """Tolerance → int in the column's storage unit (µs for the usual
    timestamp[us]; raw int for integer time columns)."""
    if tolerance is None:
        return None
    if isinstance(tolerance, (int, np.integer)):
        return int(tolerance)
    if isinstance(tolerance, datetime.timedelta):
        us = int(tolerance / datetime.timedelta(microseconds=1))
    elif isinstance(tolerance, np.timedelta64):
        us = int(tolerance / np.timedelta64(1, "us"))
    else:
        raise TypeError(f"asof_join: bad tolerance {tolerance!r}")
    if pa.types.is_timestamp(time_type):
        unit = {"s": 1_000_000, "ms": 1_000, "us": 1, "ns": 1e-3}[
            time_type.unit]
        return int(us // unit) if unit >= 1 else int(us * 1000)
    raise TypeError(
        "asof_join: a duration tolerance requires a timestamp time "
        "column; pass an integer (raw column units) for "
        f"{time_type} time columns")


def _pad_union(
    left: Dataset, right: Dataset, *,
    by: str, left_on: str | None, right_by: str, right_on: str | None,
    value_cols: list[str], num_groups: int,
    rschema: pa.Schema | None = None,
) -> tuple[Dataset, list[str], list[str], pa.DataType]:
    """Pad both sides to the shared (__side, __g, __k, __t, left cols,
    right value cols) schema and union them. Returns (unioned dataset,
    left column names, output value column names, time type).
    ``left_on``/``right_on`` None (equi-join) fills ``__t`` with zeros.
    ``rschema`` overrides ``right.schema()`` for callers that wrapped
    the right side in a transform (schema() is None on an empty lazy
    dataset)."""
    lschema = left.schema()
    if rschema is None:
        rschema = right.schema()
    # "__ck" is the internal composite-key column — never an output
    lnames = [n for n in lschema.names if n != "__ck"]
    ltypes = dict(zip(lschema.names, lschema.types))
    rtypes = dict(zip(rschema.names, rschema.types))
    for c in (right_by, *([right_on] if right_on else []), *value_cols):
        if c not in rtypes:
            raise ValueError(f"join: right side lacks column {c!r}")
    if by not in ltypes or (left_on and left_on not in ltypes):
        raise ValueError(f"join: left side lacks {by!r}/{left_on!r}")
    # value columns that clash with a left name get a _r suffix
    out_vals = [v if v not in lnames else f"{v}_r" for v in value_cols]
    key_t = ltypes[by]
    time_t = ltypes[left_on] if left_on else pa.int64()
    bad = [c for c, t in {**ltypes,
                          **{v: rtypes[v] for v in value_cols}}.items()
           if t is None]
    if bad:
        # Ray reports None for pandas extension dtypes (e.g. Int64) on
        # pandas-block datasets — every padded column needs a real
        # Arrow type (pa.nulls below); fail with the fix instead of a
        # DataType-expected error deep in a worker
        raise TypeError(
            f"join: columns {bad!r} have unresolved (pandas-extension) "
            "dtypes; build the dataset from Arrow "
            "(ray.data.from_arrow / read_parquet) instead")
    mask = num_groups - 1
    if num_groups & mask:
        raise ValueError("num_groups must be a power of two")

    try:
        key_fill = pa.scalar(0, key_t)
    except (pa.ArrowInvalid, pa.ArrowTypeError, OverflowError):
        key_fill = pa.scalar("", key_t)

    def _key_group(keys: pa.Array) -> pa.Array:
        # fill nulls BEFORE hashing: a null-bearing int64 array reaches
        # numpy as float64 and would hash its valid values differently
        # than the null-free right side (float vs int hash); null rows'
        # groups are overwritten by the caller anyway
        h = hash_fast64(pc.fill_null(keys, key_fill))
        # uint64 — mask BEFORE the int64 cast
        return pc.cast(pc.bit_wise_and(h, pa.scalar(mask, pa.uint64())),
                       pa.int64())

    def _pad_left(t: pa.Table) -> pa.Table:
        n = t.num_rows
        keys = pc.cast(t.column(by), key_t).combine_chunks()
        times = pc.cast(t.column(left_on), pa.int64()).combine_chunks() \
            if left_on else pa.nulls(n, pa.int64()).fill_null(0)
        ok = pc.and_kleene(pc.is_valid(keys), pc.is_valid(times))
        ok_np = ok.to_numpy(zero_copy_only=False)
        # a null key or null time can never match — side 2 rows ride
        # the exchange as passthroughs (kept for how="left", dropped
        # for "inner") with sentinel key/time so the numpy kernels
        # never see a null; spread over groups to avoid a skew pocket
        side = np.where(ok_np, 1, 2).astype(np.int8)
        grp = _key_group(keys).to_numpy(zero_copy_only=False)
        grp = np.where(ok_np, grp, np.arange(n, dtype=np.int64) & mask)
        cols = {
            "__side": pa.array(side),
            "__g": pa.array(grp, pa.int64()),
            "__k": pc.fill_null(keys, key_fill),
            "__t": pc.fill_null(times, 0),
        }
        for c in lnames:
            cols[c] = t.column(c)
        for v, ov in zip(value_cols, out_vals):
            cols[ov] = pa.nulls(n, rtypes[v])
        return nometa(pa.table(cols))

    def _pad_right(t: pa.Table) -> pa.Table:
        keys = pc.cast(t.column(right_by), key_t).combine_chunks()
        times = pc.cast(t.column(right_on), pa.int64()).combine_chunks() \
            if right_on else pa.nulls(t.num_rows, pa.int64()).fill_null(0)
        # null-key / null-time right rows can never match: drop here
        ok = pc.and_kleene(pc.is_valid(keys), pc.is_valid(times))
        sel = pc.fill_null(ok, False)
        t = t.filter(sel)
        keys, times = keys.filter(sel), times.filter(sel)
        n = t.num_rows
        cols = {
            "__side": pa.array(np.zeros(n, np.int8)),
            "__g": _key_group(keys),
            "__k": keys,
            "__t": times,
        }
        for c in lnames:
            cols[c] = pa.nulls(n, ltypes[c])
        for v, ov in zip(value_cols, out_vals):
            cols[ov] = t.column(v)
        return nometa(pa.table(cols))

    lp = left.map_batches(_pad_left, batch_format="pyarrow")
    rp = right.map_batches(_pad_right, batch_format="pyarrow")
    return lp.union(rp), lnames, out_vals, time_t


def _composite_adder(cols: list[str]):
    """Batch transform appending ``__ck``: an injective string encoding
    of a multi-column key (per-column escape of the separator, then one
    vectorized element-wise join). A null in ANY component yields a
    null combined key — composite SQL equality semantics."""
    def _add(t: pa.Table) -> pa.Table:
        parts = []
        for c in cols:
            s = pc.cast(t.column(c), pa.string())
            s = pc.replace_substring(s, "\\", "\\\\")
            s = pc.replace_substring(s, "\x1f", "\\u")
            parts.append(s)
        ck = pc.binary_join_element_wise(*parts, "\x1f")
        return nometa(t.append_column("__ck", ck))

    return _add


def _maybe_composite(left: Dataset, right: Dataset, by, right_by,
                     rschema: pa.Schema | None = None):
    """When ``by`` is a list of columns, rewrite both sides to join on
    the single combined ``__ck`` key (excluded from outputs by
    _pad_union). Returns (left, right, by, right_by, rschema)."""
    if not isinstance(by, (list, tuple)):
        return left, right, by, right_by, rschema
    rb = list(right_by) if right_by else list(by)
    if len(rb) != len(by):
        raise ValueError(
            f"join: right_by {rb!r} must match by {list(by)!r} arity")
    left = left.map_batches(_composite_adder(list(by)),
                            batch_format="pyarrow")
    right = right.map_batches(_composite_adder(rb),
                              batch_format="pyarrow")
    # resolve the schema AFTER the wrap: the pyarrow map_batches forces
    # Arrow blocks, so schema() returns real Arrow types (a pandas-
    # block input would report None for extension/object dtypes) and
    # already includes __ck
    return left, right, "__ck", "__ck", right.schema()


def _codes(k: np.ndarray) -> np.ndarray:
    """Factorize the group's key values (any numpy-comparable dtype —
    int64 keys zero-copy, strings via the object path) to dense int
    codes; one np.unique pass for all keys in the coarse group."""
    _, inv = np.unique(k, return_inverse=True)
    return inv


def asof_join(
    left: Dataset, right: Dataset, *,
    by: str, left_on: str,
    right_by: str | None = None, right_on: str | None = None,
    value_cols: list[str],
    direction: str = "backward",
    tolerance=None,
    how: str = "left",
    ties: tuple[str, str] | None = None,
    num_groups: int = _DEFAULT_GROUPS,
) -> Dataset:
    """For every left row, the single right row with the same key and
    the latest ``right_on`` <= ``left_on`` (``direction="backward"``,
    inclusive — DuckDB ``ASOF JOIN ... ON l.t >= r.t`` semantics) or
    the earliest >= (``"forward"``). ``value_cols`` are gathered from
    the matched right row (null / dropped on no match per ``how``).

    Right rows sharing an exact (key, time) are resolved by ``ties=
    ("max"|"min", <numeric value column>)`` — the matched row is the
    one extremizing that column, decided INSIDE the single-exchange
    kernel (no pre-aggregation shuffle; nulls always lose). Without
    ``ties`` the kernel keeps the last duplicate in sort order, which
    is deterministic only if (key, time) is unique on the right —
    pre-aggregate in that case.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"asof_join: bad direction {direction!r}")
    if how not in ("left", "inner"):
        raise ValueError(f"asof_join: bad how {how!r}")
    if ties is not None and (ties[0] not in ("max", "min")
                             or ties[1] not in value_cols):
        raise ValueError(
            f"asof_join: ties must be ('max'|'min', <one of "
            f"{value_cols}>), got {ties!r}")
    left, right, by, right_by, rschema = _maybe_composite(
        left, right, by, right_by)
    u, lnames, out_vals, time_t = _pad_union(
        left, right, by=by, left_on=left_on, right_by=right_by or by,
        right_on=right_on or left_on, value_cols=value_cols,
        num_groups=num_groups, rschema=rschema)
    tol = _tol_to_int(tolerance, time_t)
    fwd = direction == "forward"
    out_names = lnames + out_vals
    # ties column name AFTER clash-suffix renaming
    tie_out = out_vals[value_cols.index(ties[1])] if ties else None

    def _kernel(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n == 0:
            return nometa(g.select(out_names))
        side = g.column("__side").to_numpy(zero_copy_only=False)
        k = g.column("__k").to_numpy(zero_copy_only=False)
        t = g.column("__t").to_numpy(zero_copy_only=False).astype(
            np.int64, copy=False)
        if fwd:
            t = -t
        codes = _codes(k)
        # right (side 0) sorts before left at equal time → the carry
        # at a left row includes a right row with the exact same time
        # (inclusive match, both directions)
        if tie_out is None:
            order = np.lexsort((side, t, codes))
        else:
            # equal-(key,time) right duplicates: ascending tie value →
            # the carry (max position) lands on the extremal row; left
            # rows get +inf so they still sort after every right row
            # at the same time (inclusive semantics preserved)
            v = pc.cast(g.column(tie_out), pa.float64()).to_numpy(
                zero_copy_only=False).astype(np.float64, copy=True)
            if ties[0] == "min":
                v = -v
            v[np.isnan(v)] = -np.inf  # null tie values always lose
            v[side >= 1] = np.inf
            order = np.lexsort((side, v, t, codes))
        ss, st, sc = side[order], t[order], codes[order]
        pos = np.arange(n, dtype=np.int64)
        carry = np.maximum.accumulate(np.where(ss == 0, pos, -1))
        starts = np.flatnonzero(np.r_[True, sc[1:] != sc[:-1]])
        counts = np.diff(np.r_[starts, n])
        seg_start = np.repeat(starts, counts)
        lmask = ss >= 1  # left rows, incl. null-key passthroughs (2)
        lcarry = carry[lmask]
        valid = (lcarry >= seg_start[lmask]) & (ss[lmask] == 1)
        if tol is not None:
            lc = np.maximum(lcarry, 0)
            dt = st[lmask] - st[lc]
            valid &= dt <= tol
        lrows = order[lmask]  # group-row indices of the left rows
        rrows = order[np.maximum(lcarry, 0)]
        match = np.where(valid, rrows, -1)
        if how == "inner":
            keep = valid
            lrows, match = lrows[keep], match[keep]
        lt = g.select(lnames).take(pa.array(lrows, pa.int64()))
        ridx = pa.array(
            np.where(match >= 0, match, 0), pa.int64(),
            mask=match < 0)  # null index → null value (LEFT gather)
        cols = {c: lt.column(c) for c in lnames}
        for ov in out_vals:
            cols[ov] = g.column(ov).combine_chunks().take(ridx)
        return nometa(pa.table(cols))

    return u.groupby("__g").map_groups(_kernel, batch_format="pyarrow")


def hash_join(
    left: Dataset, right: Dataset, *,
    on: str, right_on: str | None = None,
    value_cols: list[str],
    how: str = "inner",
    num_groups: int = _DEFAULT_GROUPS,
) -> Dataset:
    """Distributed equi-join: each left row pairs with EVERY right row
    of the same key (one-to-many — output can exceed the left count).
    ``value_cols`` are gathered from each matched right row; ``how=
    "left"`` keeps unmatched left rows with null values.

    Same one-exchange design as :func:`asof_join`: both sides padded to
    a shared schema, shuffled once by coarse salt group, matched by a
    per-group numpy segment expansion (factorize → right-segment table
    → repeat/arange gather). Null join keys never match (SQL
    semantics) and ride as passthroughs for ``how="left"``. Prefer the
    broadcast paths (``enrich``/``semi_join``) when one side is small
    enough to ``ray.put`` — this operator is for two LARGE sides."""
    if how not in ("left", "inner"):
        raise ValueError(f"hash_join: bad how {how!r}")
    left, right, on, right_on, rschema = _maybe_composite(
        left, right, on, right_on)
    u, lnames, out_vals, _ = _pad_union(
        left, right, by=on, left_on=None, right_by=right_on or on,
        right_on=None, value_cols=value_cols, num_groups=num_groups,
        rschema=rschema)
    out_names = lnames + out_vals

    def _kernel(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return nometa(g.select(out_names))
        side = g.column("__side").to_numpy(zero_copy_only=False)
        k = g.column("__k").to_numpy(zero_copy_only=False)
        codes = _codes(k)
        lmask = side >= 1  # left rows, incl. null-key passthroughs (2)
        rmask = side == 0
        lrow = np.flatnonzero(lmask)
        rrow = np.flatnonzero(rmask)
        lc, rc = codes[lmask], codes[rmask]
        nl, nr = len(lrow), len(rrow)
        if nr == 0 or nl == 0:
            ml = mr = np.zeros(0, np.int64)
        else:
            rorder = np.argsort(rc, kind="stable")
            rc, rrow = rc[rorder], rrow[rorder]
            rstarts = np.flatnonzero(np.r_[True, rc[1:] != rc[:-1]])
            rcounts = np.diff(np.r_[rstarts, nr])
            seg_of_code = np.full(int(codes.max()) + 1, -1, np.int64)
            seg_of_code[rc[rstarts]] = np.arange(len(rstarts))
            lseg = seg_of_code[lc]
            has = (lseg >= 0) & (side[lmask] == 1)
            lseg0 = np.maximum(lseg, 0)
            cnt = np.where(has, rcounts[lseg0], 0)
            total = int(cnt.sum())
            ml = np.repeat(np.arange(nl), cnt)
            base = np.repeat(np.where(has, rstarts[lseg0], 0), cnt)
            csum = np.r_[0, np.cumsum(cnt)][:-1]
            mr = base + (np.arange(total, dtype=np.int64)
                         - np.repeat(csum, cnt))
        out_l = lrow[ml]
        out_r = rrow[mr] if len(mr) else np.zeros(0, np.int64)
        if how == "left":
            matched = np.zeros(nl, bool)
            matched[ml] = True
            miss = np.flatnonzero(~matched)
            out_l = np.concatenate([out_l, lrow[miss]])
            out_r = np.concatenate(
                [out_r, np.full(len(miss), -1, np.int64)])
        lt = g.select(lnames).take(pa.array(out_l, pa.int64()))
        ridx = pa.array(np.maximum(out_r, 0), pa.int64(), mask=out_r < 0)
        cols = {c: lt.column(c) for c in lnames}
        for ov in out_vals:
            cols[ov] = g.column(ov).combine_chunks().take(ridx)
        return nometa(pa.table(cols))

    return u.groupby("__g").map_groups(_kernel, batch_format="pyarrow")


def range_join(
    left: Dataset, right: Dataset, *,
    by: str, left_on: str,
    right_by: str | None = None,
    right_start: str = "start", right_end: str = "end",
    value_cols: list[str],
    how: str = "inner",
    num_groups: int = _DEFAULT_GROUPS,
) -> Dataset:
    """Interval-containment join: each left row pairs with EVERY right
    row of the same key whose [right_start, right_end] interval
    (inclusive both ends) contains ``left_on``. One-to-many — output
    can exceed the left row count.

    Candidate bounding: within a key segment, a containing interval
    must start in ``[t - Lmax, t]`` where ``Lmax`` is the segment's
    max interval length — both bounds found for ALL left rows at once
    by merge-counting (concat + lexsort + cumsum), then expanded with
    one repeat/arange and filtered on the true end. Worst case
    degenerates only when one key mixes very long and very short
    overlapping intervals (classic interval-join bound).
    """
    if how not in ("left", "inner"):
        raise ValueError(f"range_join: bad how {how!r}")

    def _drop_null_end(t: pa.Table) -> pa.Table:
        # a null-end interval can never contain anything; dropping it
        # here keeps the kernel's end array free of nulls (an Arrow
        # null would poison the numpy int64 view)
        return t.filter(pc.is_valid(t.column(right_end)))

    left, right, by, right_by, rschema = _maybe_composite(
        left, right, by, right_by)
    if rschema is None:
        rschema = right.schema()
    right = right.map_batches(_drop_null_end, batch_format="pyarrow")
    u, lnames, out_vals, _ = _pad_union(
        left, right, by=by, left_on=left_on, right_by=right_by or by,
        right_on=right_start, value_cols=[right_end, *value_cols],
        num_groups=num_groups, rschema=rschema)
    end_col, out_vals = out_vals[0], out_vals[1:]
    out_names = lnames + out_vals

    def _kernel(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return nometa(g.select(out_names))
        side = g.column("__side").to_numpy(zero_copy_only=False)
        k = g.column("__k").to_numpy(zero_copy_only=False)
        t = g.column("__t").to_numpy(zero_copy_only=False).astype(
            np.int64, copy=False)
        codes = _codes(k)
        lmask = side >= 1  # left rows, incl. null-key passthroughs (2)
        rmask = side == 0
        lrow = np.flatnonzero(lmask)
        rrow = np.flatnonzero(rmask)
        lc, lt_ = codes[lmask], t[lmask]
        rc, rs = codes[rmask], t[rmask]
        re_ = pc.cast(
            g.column(end_col), pa.int64()).to_numpy(zero_copy_only=False)[
            rmask].astype(np.int64, copy=False)
        nl, nr = len(lrow), len(rrow)
        if nr == 0 or nl == 0:
            matches = (np.zeros(0, np.int64), np.zeros(0, np.int64))
            lo = hi = np.zeros(nl, np.int64)
            rorder = np.zeros(0, np.int64)
            seg_off = np.zeros(nl, np.int64)
        else:
            rorder = np.lexsort((rs, rc))
            rc, rs, re_, rrow = (rc[rorder], rs[rorder], re_[rorder],
                                 rrow[rorder])
            # per right key-segment Lmax, broadcast to each left row
            rstarts = np.flatnonzero(np.r_[True, rc[1:] != rc[:-1]])
            rcounts = np.diff(np.r_[rstarts, nr])
            lmax = np.maximum.reduceat(re_ - rs, rstarts)
            ncodes = int(codes.max()) + 1
            seg_of_code = np.full(ncodes, -1, np.int64)
            seg_of_code[rc[rstarts]] = np.arange(len(rstarts))
            lseg = seg_of_code[lc]
            has_r = lseg >= 0
            lmax_l = np.where(has_r, lmax[np.maximum(lseg, 0)], 0)
            seg_off = np.where(has_r, rstarts[np.maximum(lseg, 0)], 0)
            seg_cnt = np.where(has_r, rcounts[np.maximum(lseg, 0)], 0)
            # hi: count of right starts <= t within the segment —
            # merge-count: sort right(start) and left(t) together,
            # right first at ties (start == t is a candidate)
            hi = _merge_count(rc, rs, lc, lt_, right_first=True)
            # lo: count of right starts < t - Lmax (can't contain t)
            lo = _merge_count(rc, rs, lc, lt_ - lmax_l, right_first=False)
            has_r &= side[lmask] == 1  # null-key passthroughs: no match
            hi = np.where(has_r, np.minimum(hi, seg_cnt), 0)
            lo = np.minimum(lo, hi)
            cnt = hi - lo
            total = int(cnt.sum())
            lrep = np.repeat(np.arange(nl), cnt)
            base = np.repeat(seg_off + lo, cnt)
            csum = np.r_[0, np.cumsum(cnt)][:-1]
            roff = np.arange(total, dtype=np.int64) - np.repeat(csum, cnt)
            rpos = base + roff
            ok = re_[rpos] >= lt_[lrep]
            matches = (lrep[ok], rpos[ok])

        ml, mr = matches
        out_l = lrow[ml]
        out_r = rrow[mr]
        if how == "left":
            matched = np.zeros(nl, bool)
            matched[ml] = True
            miss = np.flatnonzero(~matched)
            out_l = np.concatenate([out_l, lrow[miss]])
            out_r = np.concatenate(
                [out_r, np.full(len(miss), -1, np.int64)])
        lt = g.select(lnames).take(pa.array(out_l, pa.int64()))
        ridx = pa.array(np.maximum(out_r, 0), pa.int64(), mask=out_r < 0)
        cols = {c: lt.column(c) for c in lnames}
        for ov in out_vals:
            cols[ov] = g.column(ov).combine_chunks().take(ridx)
        return nometa(pa.table(cols))

    return u.groupby("__g").map_groups(_kernel, batch_format="pyarrow")


def _merge_count(
    rc: np.ndarray, rt: np.ndarray, lc: np.ndarray, lq: np.ndarray,
    *, right_first: bool,
) -> np.ndarray:
    """For every left query (lc[i], lq[i]): the number of right rows
    with the same code and time <= lq[i] (``right_first=True``) or
    < lq[i] (``False``) — all queries answered in one concat + lexsort
    + cumsum, no per-key searchsorted. Counts reset at code boundaries
    via the per-segment right-row prefix."""
    nr, nl = len(rc), len(lc)
    code = np.concatenate([rc, lc])
    time = np.concatenate([rt, lq])
    is_r = np.concatenate([np.ones(nr, np.int64), np.zeros(nl, np.int64)])
    tie = is_r if right_first else 1 - is_r
    # right_first: right sorts BEFORE left at equal time → counted
    order = np.lexsort((-tie, time, code))
    sc, sr = code[order], is_r[order]
    cum = np.cumsum(sr)
    starts = np.flatnonzero(np.r_[True, sc[1:] != sc[:-1]])
    counts = np.diff(np.r_[starts, nr + nl])
    # right-count BEFORE this code segment, broadcast per row
    seg_base = np.repeat(cum[starts] - sr[starts], counts)
    within = cum - seg_base
    lpos = order >= nr  # rows that are left queries
    out = np.empty(nl, np.int64)
    out[order[lpos] - nr] = within[lpos]
    return out
