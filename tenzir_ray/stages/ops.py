"""Tenzir operators re-expressed Ray-Data-first.

Each function maps one reference operator (file:line cited per function)
onto the Dataset API: stateless per-batch transforms are ``map_batches``
with ``batch_format="pyarrow"`` and pyarrow.compute kernels; wide ops use
``groupby``/``sort``; lookups broadcast the small side via ``ray.put``.

Predicates/expressions are Python callables ``pa.Table -> pa.Array(bool)``
or ``pa.Table -> pa.Array`` (column builders) — the vectorized analog of
Tenzir's compiled TQL expressions (eval at libtenzir/src/tql2/eval.cpp).
"""

from __future__ import annotations

from typing import Any, Callable, Mapping

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset
from ray.data.aggregate import Count, Max, Mean, Min, Quantile, Std, Sum

from tenzir_ray.util import nometa

Expr = Callable[[pa.Table], pa.Array]


# ------------------------------------------------------------- row-local


def where(ds: Dataset, pred: Expr) -> Dataset:
    """Keep rows where pred is true (operators/where_map.cpp:50-146).
    Vectorized batch filter, not per-row ``ds.filter(fn)``."""
    def _f(t: pa.Table) -> pa.Table:
        m = pred(t)
        if isinstance(m, pa.ChunkedArray):
            m = m.combine_chunks()
        return nometa(t.filter(m))
    return ds.map_batches(_f, batch_format="pyarrow")


def set_(ds: Dataset, **cols: Expr) -> Dataset:
    """Add/overwrite fields from expressions — TQL2 ``set``/assignments
    (builtins/operators/set_select.cpp:16, src/tql2/set.cpp)."""
    def _f(t: pa.Table) -> pa.Table:
        for name, expr in cols.items():
            arr = expr(t)
            if not isinstance(arr, (pa.Array, pa.ChunkedArray)):
                arr = pa.array([arr] * t.num_rows)
            if name in t.column_names:
                t = t.set_column(t.column_names.index(name), name, arr)
            else:
                t = t.append_column(name, arr)
        return nometa(t)
    return ds.map_batches(_f, batch_format="pyarrow")


def select(ds: Dataset, *names: str) -> Dataset:
    """Projection (operators/select.cpp:49)."""
    return ds.select_columns(list(names))


def drop(ds: Dataset, *names: str) -> Dataset:
    """Remove fields (operators/drop.cpp:56)."""
    return ds.drop_columns(list(names))


def rename(ds: Dataset, **new_to_old: str) -> Dataset:
    """rename new=old (operators/rename.cpp:76)."""
    mapping = {old: new for new, old in new_to_old.items()}
    return ds.rename_columns(mapping)


def flatten(ds: Dataset, sep: str = ".") -> Dataset:
    """Nested struct columns → dotted top-level columns
    (operators/flatten.cpp:27)."""
    def _f(t: pa.Table) -> pa.Table:
        while any(pa.types.is_struct(f.type) for f in t.schema):
            cols, names = [], []
            for f in t.schema:
                col = t.column(f.name)
                if pa.types.is_struct(f.type):
                    col = col.combine_chunks()
                    for sub in f.type:
                        names.append(f"{f.name}{sep}{sub.name}")
                        cols.append(pc.struct_field(col, sub.name))
                else:
                    names.append(f.name)
                    cols.append(col)
            t = pa.table(dict(zip(names, cols)))
        return t
    return ds.map_batches(_f, batch_format="pyarrow")


def unflatten(ds: Dataset, sep: str = ".") -> Dataset:
    """Dotted names → nested structs, RECURSIVELY — 'a.b.c' becomes
    struct a{struct b{c}}, so ``unflatten(flatten(ds))`` restores the
    original schema at any depth (operators/unflatten.cpp:25, which
    recurses the same way)."""
    def _build(cols: dict[str, pa.Array]):
        groups: dict[str, dict[str, pa.Array]] = {}
        plain: dict[str, Any] = {}
        for name, col in cols.items():
            if sep in name:
                top, rest = name.split(sep, 1)
                groups.setdefault(top, {})[rest] = col
            else:
                plain[name] = col
        for top, subs in groups.items():
            built = _build(subs)
            plain[top] = pa.StructArray.from_arrays(
                list(built.values()), names=list(built.keys())
            )
        return plain

    def _f(t: pa.Table) -> pa.Table:
        cols = {n: t.column(n).combine_chunks() for n in t.column_names}
        return pa.table(_build(cols))
    return ds.map_batches(_f, batch_format="pyarrow")


def unroll(ds: Dataset, field: str) -> Dataset:
    """One output row per list element — explode (operators/unroll.cpp:201).
    Vectorized: list_parent_indices + take, never a Python row loop."""
    def _f(t: pa.Table) -> pa.Table:
        col = t.column(field).combine_chunks()
        idx = pc.list_parent_indices(col)
        flat = pc.list_flatten(col)
        out = t.drop_columns([field]).take(idx)
        return out.append_column(field, flat)
    return ds.map_batches(_f, batch_format="pyarrow")


def timeshift(ds: Dataset, field: str, delta) -> Dataset:
    """Shift a time field (operators/timeshift.cpp:25)."""
    return set_(ds, **{field: lambda t: pc.add(t.column(field), delta)})


# ------------------------------------------------------- order/position


def sort(ds: Dataset, *keys: str) -> Dataset:
    """Global sort; '-field' for descending (operators/sort.cpp:86-203 —
    reference buffers all input; Ray does a distributed range-partition
    sort instead)."""
    cols = [k.lstrip("-") for k in keys]
    desc = [k.startswith("-") for k in keys]
    return ds.sort(cols, descending=desc)


def head(ds: Dataset, n: int = 10) -> Dataset:
    """First n events (operators/head.cpp:34)."""
    return ds.limit(n)


def _iter_blocks(ds: Dataset):
    """Stream (block_ref, num_rows) pairs via the public ref-bundle
    iterator — the dataset executes with backpressure; refs the caller
    drops are freed by the object store as iteration proceeds (unlike
    ``materialize()``, which pins everything)."""
    for bundle in ds.iter_internal_ref_bundles():
        for ref, meta in zip(bundle.block_refs, bundle.metadata):
            yield ref, int(meta.num_rows)


def _slice_block_task():
    import ray

    @ray.remote
    def _slice_block(block: pa.Table, s: int, e: int) -> pa.Table:
        return block.slice(s, e - s)

    return _slice_block


def tail(ds: Dataset, n: int = 10) -> Dataset:
    """Last n events (operators/tail.cpp:34). Streams block refs keeping
    only a trailing window holding ≥ n rows — earlier blocks' refs are
    dropped as iteration advances, so peak pinned memory is O(n + one
    block), not the dataset."""
    from collections import deque

    import ray.data as rd

    buf: "deque[tuple]" = deque()
    kept = 0
    for ref, cnt in _iter_blocks(ds):
        buf.append((ref, cnt))
        kept += cnt
        while buf and kept - buf[0][1] >= n:
            kept -= buf.popleft()[1]
    if not buf:
        return ds.limit(0)
    excess = max(0, kept - n)
    sl = _slice_block_task()
    refs = []
    for i, (ref, cnt) in enumerate(buf):
        if i == 0 and excess > 0:
            refs.append(sl.remote(ref, excess, cnt))
        else:
            refs.append(ref)
    return rd.from_arrow_refs(refs)


def slice_(ds: Dataset, begin: int, end: int) -> Dataset:
    """Positional range (operators/slice.cpp:28). ``limit(end)`` first —
    Ray's limit pushdown stops producing blocks past ``end`` — then keep
    only the refs of blocks overlapping [begin, end), slicing the edge
    blocks remotely. Nothing before ``begin`` or after ``end`` stays
    pinned."""
    import ray.data as rd

    sl = _slice_block_task()
    out_refs = []
    total = 0
    for ref, cnt in _iter_blocks(ds.limit(end)):
        lo, hi = total, total + cnt
        total = hi
        if hi <= begin or cnt == 0:
            continue  # ref dropped → freed
        s, e = max(0, begin - lo), min(cnt, end - lo)
        out_refs.append(ref if (s == 0 and e == cnt) else sl.remote(ref, s, e))
    if not out_refs:
        return ds.limit(0)
    return rd.from_arrow_refs(out_refs)


def reverse(ds: Dataset) -> Dataset:
    """Reverse total order (operators/reverse.cpp)."""
    return enumerate_(ds, "__pos").sort("__pos", descending=True).drop_columns(["__pos"])


def enumerate_(ds: Dataset, name: str = "index") -> Dataset:
    """Add the index of preceding events (operators/enumerate.cpp:34).
    Ordering-sensitive: per-block start offsets from streamed block
    metadata (row counts only on the driver), then a vectorized arange
    per block in remote tasks. Uses the public ref-bundle iterator, not
    ``materialize()`` + private plan APIs; the output necessarily
    references every input block (enumerate is a full-stream op), but
    blocks are tagged as they arrive, pipelined."""
    import ray

    @ray.remote
    def _tag(block: pa.Table, off: int) -> pa.Table:
        return block.append_column(
            name, pa.array(np.arange(off, off + block.num_rows, dtype=np.int64))
        )

    import ray.data as rd

    tagged = []
    total = 0
    for ref, cnt in _iter_blocks(ds):
        tagged.append(_tag.remote(ref, total))
        total += cnt
    if not tagged:
        return ds
    return rd.from_arrow_refs(tagged)


# ----------------------------------------------------------- aggregation

_AGGS: Mapping[str, Any] = {
    "count": Count, "sum": Sum, "min": Min, "max": Max, "mean": Mean,
    "avg": Mean, "std": Std, "stddev": Std,
}

# Aggregations beyond Ray's native set (reference
# aggregation-functions/*.cpp, SURVEY §2.7): computed per group with
# pyarrow kernels inside map_groups.


def _agg_group_kernel(g: pa.Table, alias: str, fn: str, col: str | None,
                      param=None):
    c = g.column(col) if col else None
    if fn == "count":
        return pa.array([g.num_rows if c is None
                         else int(pc.count(c).as_py())], pa.int64())
    if fn == "count_distinct":
        return pa.array([int(pc.count_distinct(c).as_py())], pa.int64())
    if fn == "distinct":
        vals = pc.unique(c.combine_chunks())
        vals = vals.take(pc.sort_indices(vals))
        return pa.array([vals.to_pylist()])
    if fn == "collect":
        return pa.array([c.to_pylist()])
    if fn == "mode":
        m = pc.mode(c, n=1)
        return pa.array([m[0]["mode"].as_py() if len(m) else None])
    if fn == "first":
        return c.slice(0, 1)
    if fn == "last":
        return c.slice(len(c) - 1, 1)
    if fn == "any":
        return pa.array([bool(pc.any(c).as_py())])
    if fn == "all":
        return pa.array([bool(pc.all(c).as_py())])
    if fn == "median":
        return pa.array([pc.approximate_median(c).as_py()], pa.float64())
    if fn == "quantile":
        # linear interpolation — matches SQL quantile_cont
        q = 0.5 if param is None else float(param)
        return pa.array(
            [pc.quantile(c, q=q, interpolation="linear")[0].as_py()],
            pa.float64())
    if fn in ("variance", "var_samp"):
        # sample variance (ddof=1) — SQL var_samp (quantile.cpp sibling
        # stddev_variance.cpp computes the same accumulator)
        return pa.array([pc.variance(c, ddof=1).as_py()], pa.float64())
    if fn == "stddev_samp":
        return pa.array([pc.stddev(c, ddof=1).as_py()], pa.float64())
    if fn == "value_counts":
        # list<struct{value,count}> sorted by value
        # (mode_value_counts.cpp:172)
        vc = pc.value_counts(c.combine_chunks())
        vc = vc.take(pc.sort_indices(vc.field("values")))
        return pa.array([[
            {"value": v.as_py(), "count": n.as_py()}
            for v, n in zip(vc.field("values"), vc.field("counts"))
        ]])
    if fn in ("once", "sample"):
        # once: the (single) value — warns in the reference if >1 event;
        # sample: first non-null value seen (sample.cpp:33-48). Both
        # reduce to "first non-null" in batch context.
        cc = c.combine_chunks().drop_null()
        return pa.array([cc[0].as_py() if len(cc) else None], c.type)
    if fn in ("sum", "min", "max", "mean", "stddev"):
        k = {"mean": pc.mean, "stddev": pc.stddev,
             "sum": pc.sum, "min": pc.min, "max": pc.max}[fn]
        return pa.array([k(c).as_py()])
    raise ValueError(f"unknown aggregation {fn!r}")


_PARTIAL_FNS = {"count", "sum", "min", "max", "mean"}


def summarize_partial(ds: Dataset, by: list[str] | str,
                      **aggs: tuple[str, str] | str) -> Dataset:
    """Shuffle-free grouped aggregation for algebraic aggregates
    (count/sum/min/max/mean) over LOW-cardinality keys: per-batch
    partials via Arrow's hash group_by, then ONE remote combine task
    over the tiny partial blocks (driver touches refs only). No
    all-to-all exchange, no empty schema-less aggregate partitions —
    the partial/final split the reference's summarize implements by
    hand (operators/summarize.cpp:79-142).

    Partial size is groups × blocks — use only when the group count is
    small (route/type/flag keys); high-cardinality keys need the
    hash-shuffle path in :func:`summarize`."""
    import ray
    import ray.data as rd

    by = [by] if isinstance(by, str) else list(by)
    parsed = []
    for alias, spec in aggs.items():
        if isinstance(spec, str):
            fn, col = spec, None
        else:
            fn, col = spec
        if fn not in _PARTIAL_FNS:
            raise ValueError(f"summarize_partial: {fn!r} is not algebraic")
        parsed.append((alias, fn, col))

    # (partial column name, arrow agg) pairs, deduplicated
    def _partial_specs():
        specs: dict[str, tuple] = {}
        for _alias, fn, col in parsed:
            if fn == "count" and col is None:
                specs["__n"] = ([], "count_all")
            elif fn == "count":
                specs[f"__cnt_{col}"] = (col, "count")
            elif fn == "mean":
                specs[f"__sum_{col}"] = (col, "sum")
                specs[f"__cnt_{col}"] = (col, "count")
            else:
                specs[f"__{fn}_{col}"] = (col, fn)
        return specs

    specs = _partial_specs()

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(by, use_threads=False).aggregate(list(specs.values()))
        # arrow names outputs "<col>_<fn>"; rename to our stable names
        arrow_names = [
            (f"{c}_{f}" if c else "count_all") for c, f in specs.values()]
        cols = {n: g.column(a) for n, a in zip(specs, arrow_names)}
        for b in by:
            cols[b] = g.column(b)
        return pa.table(cols)

    partials = ds.map_batches(partial, batch_format="pyarrow").materialize()
    refs = [r for bundle in partials.iter_internal_ref_bundles()
            for r in bundle.block_refs]
    if not refs:  # empty input: zero blocks → typed empty result
        return rd.from_arrow(pa.table(
            {b: pa.array([], pa.null()) for b in by}
            | {alias: pa.array([], pa.null()) for alias, _f, _c in parsed}))

    merge_fn = {name: (fn if fn in ("min", "max") else "sum")
                for name, (_col, fn) in specs.items()}

    @ray.remote
    def _merge(*blocks):
        import pyarrow as _pa
        # Drop schema-LESS empties first: Ray emits zero-column empty
        # blocks for read tasks that got no files/fragments, and those
        # bypass upstream map_batches UDFs entirely, so they reach the
        # merge unpartialed. Typed empty partials are kept — concat
        # preserves their schema.
        blocks = [b for b in blocks if b.num_columns] or [blocks[0]]
        tb = _pa.concat_tables(blocks, promote_options="permissive")
        if not tb.num_columns:  # every input block was schema-less
            return tb
        g = tb.group_by(by, use_threads=False).aggregate(
            [(name, mf) for name, mf in merge_fn.items()])
        ren = {f"{name}_{mf}": name for name, mf in merge_fn.items()}
        return g.rename_columns([ren.get(c, c) for c in g.column_names])

    @ray.remote
    def _final(tb: pa.Table) -> pa.Table:
        if not tb.num_columns:  # all-schema-less input: typed empty
            return pa.table(
                {b: pa.array([], pa.null()) for b in by}
                | {alias: pa.array([], pa.null())
                   for alias, _f, _c in parsed})
        # input has unique group keys and canonical partial columns
        out = {b: tb.column(b) for b in by}
        for alias, fn, col in parsed:
            if fn == "count":
                out[alias] = tb.column(
                    "__n" if col is None else f"__cnt_{col}")
            elif fn == "mean":
                s = pc.cast(tb.column(f"__sum_{col}"), pa.float64())
                n = pc.cast(tb.column(f"__cnt_{col}"), pa.float64())
                out[alias] = pc.divide(s, n)
            else:
                out[alias] = tb.column(f"__{fn}_{col}")
        return pa.table(out)

    # fan-in-8 merge tree: every task touches ≤ 8 blocks (≤ 8 × distinct
    # groups rows), so high-cardinality keys can't OOM a single combine;
    # only the FINAL result (one row per group) lands in one block.
    while len(refs) > 1:
        refs = [_merge.remote(*refs[i:i + 8])
                for i in range(0, len(refs), 8)]
    return rd.from_arrow_refs([_final.remote(refs[0])])


def summarize(
    ds: Dataset, by: list[str] | str | None,
    order_by: list[str] | None = None,
    combine: str = "hash",
    **aggs: tuple[str, str] | str,
) -> Dataset:
    """Grouped aggregation (operators/summarize.cpp:79-142).

    ``summarize(ds, "k", total=("sum", "x"), n="count")`` →
    groupby(k).aggregate(Sum(x, alias="total"), Count(alias="n")).
    Parametrized aggregations take a 3-tuple: ``q90=("quantile", "x", 0.9)``.
    Ray pre-aggregates per block before the shuffle (hash aggregate), the
    same partial/final split the reference implements by hand.

    ``combine="auto"`` routes all-algebraic aggregations (count/sum/min/
    max/mean) through :func:`summarize_partial` — no all-to-all exchange,
    no empty schema-less aggregate partitions. Right when the group
    count is small (type/flag/route keys, the typical summarize);
    HIGH-cardinality keys should keep ``combine="hash"`` (partial size
    is groups × blocks, reduced in one task).

    Aggregations Ray lacks natively (count_distinct, distinct, collect,
    mode, first/last, any/all, median — reference SURVEY §2.7) fall back
    to a per-group pyarrow kernel via map_groups; ``order_by`` pins
    first/last determinism (the reference relies on stream order, which
    Ray Data does not guarantee)."""
    parsed = []
    for alias, spec in aggs.items():
        if isinstance(spec, str):
            fn, col, param = spec, None, None
        elif len(spec) == 2:
            (fn, col), param = spec, None
        else:
            fn, col, param = spec
        parsed.append((alias, fn, col, param))
    # bare `count` (no column) is excluded from the native path: Ray
    by = [by] if isinstance(by, str) else by
    # 2.49's UNGROUPED Count(on=None) returns 0 even over non-empty
    # datasets (verified on rd.range(10), both ignore_nulls settings);
    # GROUPED bare count works — excluding it there would push every
    # mixed aggregation onto the per-group Python kernel for nothing
    native = all(fn in _AGGS and fn != "median"
                 and not (fn == "count" and col is None and by is None)
                 for _a, fn, col, _p in parsed)
    if combine == "auto" and by is not None and all(
            fn in _PARTIAL_FNS for _a, fn, _c, _p in parsed):
        return summarize_partial(ds, by, **aggs)
    if native:
        specs = []
        for alias, fn, col, _param in parsed:
            cls = _AGGS[fn]
            if fn == "count":
                specs.append(cls(on=col, alias_name=alias)
                             if col else cls(alias_name=alias))
            else:
                specs.append(cls(on=col, alias_name=alias))
        if by is None:
            # whole-stream: Ray's Dataset.aggregate returns a plain
            # dict — wrap it back into a one-row Dataset so the result
            # composes with downstream operators like any other stage
            import ray.data as rd

            res = ds.aggregate(*specs)
            return rd.from_items([res]) if isinstance(res, dict) else res
        return ds.groupby(by).aggregate(*specs)

    def per_group(g: pa.Table) -> pa.Table:
        if order_by:
            g = g.take(pc.sort_indices(
                g, sort_keys=[(c, "ascending") for c in order_by]))
        cols: dict[str, Any] = {k: g.column(k).slice(0, 1) for k in (by or [])}
        for alias, fn, col, param in parsed:
            cols[alias] = _agg_group_kernel(g, alias, fn, col, param)
        return pa.table(cols)

    if by is None:
        # whole-stream: single group via a constant key
        tagged = ds.map_batches(
            lambda t: t.append_column("__g", pa.nulls(t.num_rows, pa.int8())),
            batch_format="pyarrow",
        )
        return tagged.groupby("__g").map_groups(
            lambda g: per_group(g.drop_columns(["__g"])), batch_format="pyarrow"
        )
    return ds.groupby(by).map_groups(per_group, batch_format="pyarrow")


def top(ds: Dataset, field: str, k: int = 10) -> Dataset:
    """Most frequent values (operators/top_rare.cpp:78-100 — rewrites to
    summarize count by x | sort -count | head k)."""
    return (
        ds.groupby(field)
        .aggregate(Count(alias_name="count"))
        .sort("count", descending=True)
        .limit(k)
    )


def rare(ds: Dataset, field: str, k: int = 10) -> Dataset:
    """Least frequent values (top_rare.cpp, ascending)."""
    return (
        ds.groupby(field)
        .aggregate(Count(alias_name="count"))
        .sort("count", descending=False)
        .limit(k)
    )


def deduplicate(
    ds: Dataset, keys: list[str] | str, limit: int = 1,
    order_by: list[str] | None = None,
) -> Dataset:
    """Exact dedup: first ``limit`` rows per key
    (operators/deduplicate.cpp:126-260; the order/distance-dependent modes
    are not carried over — Ray blocks are unordered, so "first" is defined
    by ``order_by`` when determinism matters). Scale shape: the shuffle is
    hash-partitioned on a COARSE salt (key-hash & 1023), so one
    ``map_groups`` call handles ~1/1024 of all distinct keys in one
    vectorized pass (sort by key + ``order_by``, segment by key equality,
    rank-within-segment < limit) — never one Python call per distinct
    key."""
    import pandas as pd

    keys = [keys] if isinstance(keys, str) else keys

    def add_salt(t: pa.Table) -> pa.Table:
        h = np.zeros(t.num_rows, np.uint64)
        for c in keys:
            col = t.column(c).combine_chunks()
            hc = pd.util.hash_array(
                col.to_numpy(zero_copy_only=False)).astype(np.uint64)
            h = h * np.uint64(0x100000001B3) ^ hc
        return nometa(t.append_column(
            "__dd_salt", pa.array((h & np.uint64(1023)).astype(np.int64))))

    def heads(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "__dd_salt" not in g.column_names:
            return g.drop_columns(
                [c for c in ("__dd_salt",) if c in g.column_names])
        sort_keys = [(c, "ascending") for c in keys]
        sort_keys += [(c, "ascending") for c in (order_by or [])
                      if c not in keys]
        g = g.take(pc.sort_indices(g, sort_keys=sort_keys))
        n = g.num_rows
        new = np.zeros(n, bool)
        new[0] = True
        for c in keys:
            a = g.column(c).combine_chunks()
            lo, hi = a.slice(0, n - 1), a.slice(1)
            eq = pc.fill_null(pc.equal(hi, lo), False)
            both_null = pc.and_(pc.is_null(hi), pc.is_null(lo))
            same = pc.or_(eq, both_null).to_numpy(zero_copy_only=False)
            new[1:] |= ~same
        starts = np.flatnonzero(new)
        seg_len = np.diff(np.r_[starts, n])
        rank = np.arange(n) - np.repeat(starts, seg_len)
        return nometa(
            g.filter(pa.array(rank < limit)).drop_columns(["__dd_salt"]))

    return (
        ds.map_batches(add_salt, batch_format="pyarrow")
        .groupby("__dd_salt")
        .map_groups(heads, batch_format="pyarrow")
    )


def taste(ds: Dataset, n: int = 10, by: str | None = None) -> Dataset:
    """First n events per schema/key (operators/taste.cpp:25)."""
    if by is None:
        return ds.limit(n)
    return deduplicate(ds, by, limit=n)


def sample(ds: Dataset, fraction: float, seed: int = 42) -> Dataset:
    """Fixed-rate sampling (operators/sample.cpp — the adaptive rate mode
    collapses to a fixed fraction in batch context)."""
    return ds.random_sample(fraction, seed=seed)


# -------------------------------------------------------------- lookups


def enrich(
    ds: Dataset,
    lookup: dict | "pa.Table",
    key: str,
    fields: dict[str, str] | None = None,
    lookup_key: str | None = None,
    out_field: str = "value",
) -> Dataset:
    """Broadcast lookup join — Tenzir contexts
    (builtins/contexts/lookup_table.cpp:221-343: enrich = LEFT lookup join
    writing values into fields). The small side is ``ray.put`` once and
    read per actor, never re-shipped per batch; probe is a vectorized
    dictionary-index take."""
    import ray

    if isinstance(lookup, pa.Table):
        lk = lookup_key or key
        keys_arr = lookup.column(lk).combine_chunks()
        cols = {
            out: lookup.column(src).combine_chunks()
            for out, src in (fields or {}).items()
        }
    else:
        keys_arr = pa.array(list(lookup.keys()))
        cols = {out_field: pa.array(list(lookup.values()))}
    ref = ray.put((keys_arr, cols))

    # plain tasks, not an actor pool: the probe is stateless
    # (pc.index_in hashes the build side in Arrow C++ per call — cheap
    # relative to a batch) and tasks reach full parallelism immediately;
    # the build side is ray.put ONCE and read zero-copy per worker.
    def _enrich(t: pa.Table) -> pa.Table:
        keys, cols2 = ray.get(ref)
        # pc.index_in: hash probe in Arrow C++ (null index on miss);
        # take with null indices yields null values — the LEFT join.
        probe = t.column(key).combine_chunks()
        if probe.type != keys.type:
            probe = pc.cast(probe, keys.type)
        idx = pc.index_in(probe, value_set=keys)
        for out, vals in cols2.items():
            arr = vals.take(idx)
            if out in t.column_names:
                t = t.set_column(t.column_names.index(out), out, arr)
            else:
                t = t.append_column(out, arr)
        return nometa(t)

    return ds.map_batches(_enrich, batch_format="pyarrow")


def semi_join(ds: Dataset, keys, key: str, anti: bool = False) -> Dataset:
    """Semi/anti join against a broadcast key set (Tenzir expresses these
    as ``where field in ctx`` over a lookup-table context — SURVEY §2.6).
    ``keys`` may be a list/set or a pa.Table column. For huge key sets,
    broadcast a Bloom filter instead (tenzir_ray.state.BloomFilter) and
    re-verify the survivors."""
    import ray

    if isinstance(keys, pa.Table):
        value_set = pc.unique(keys.column(key).combine_chunks())
    elif isinstance(keys, (pa.Array, pa.ChunkedArray)):
        value_set = pc.unique(
            keys.combine_chunks() if isinstance(keys, pa.ChunkedArray) else keys)
    else:
        value_set = pa.array(list(set(keys)))
    ref = ray.put(value_set)

    # stateless filter → plain tasks (full parallelism immediately, no
    # actor-pool ramp); ray.get of the broadcast set is zero-copy from
    # the local object store after the first fetch per worker
    def _filter(t: pa.Table) -> pa.Table:
        vs = ray.get(ref)
        probe = t.column(key).combine_chunks()
        if probe.type != vs.type:
            probe = pc.cast(probe, vs.type)
        mask = pc.is_in(probe, value_set=vs)
        if anti:
            mask = pc.invert(mask)
        return nometa(t.filter(mask))

    return ds.map_batches(_filter, batch_format="pyarrow")


def semi_join_ds(
    ds: Dataset, keys_ds: Dataset, key: str,
    right_key: str | None = None, anti: bool = False,
    num_partitions: int = 32,
) -> Dataset:
    """Distributed semi/anti join when the key side is itself big data —
    Ray's native hash-shuffle join (both sides partitioned by key hash;
    no driver-side key set, no broadcast). Use :func:`semi_join` when the
    key side fits one object (broadcast beats a full-corpus shuffle)."""
    rk = right_key or key
    right = keys_ds.select_columns([rk])
    return ds.join(
        right,
        join_type="left_anti" if anti else "left_semi",
        num_partitions=num_partitions,
        on=(key,),
        right_on=(rk,),
    )


def assert_(ds: Dataset, pred: Expr, warn_limit: int = 10) -> Dataset:
    """Like where but logs dropped rows (where_map.cpp:148 — the
    reference warns per drop; we count per batch and log a bounded
    sample via Python logging)."""
    import logging

    log = logging.getLogger("tenzir_ray.assert")

    def _f(t: pa.Table) -> pa.Table:
        m = pred(t)
        if isinstance(m, pa.ChunkedArray):
            m = m.combine_chunks()
        kept = t.filter(m)
        dropped = t.num_rows - kept.num_rows
        if dropped:
            log.warning("assert dropped %d/%d rows", dropped, t.num_rows)
        return kept

    return ds.map_batches(_f, batch_format="pyarrow")


def move(ds: Dataset, **new_to_old: str) -> Dataset:
    """move a=b: rename + delete source (operators/move.cpp)."""
    return rename(ds, **new_to_old)


def distinct(ds: Dataset, *cols: str) -> Dataset:
    """Whole-stream distinct rows over the given columns (reference:
    summarize distinct / ds.unique). Projection first so only key
    columns ride the shuffle."""
    proj = ds.select_columns(list(cols))
    return deduplicate(proj, list(cols))


def cache(ds: Dataset) -> Dataset:
    """Materialize into the object store for reuse across consumers
    (operators/cache.cpp — node-side keyed result cache; keying is the
    caller's variable binding here)."""
    return ds.materialize()


def repeat(ds: Dataset, n: int) -> Dataset:
    """Replay input n times (operators/repeat.cpp:32); n=0 yields an
    empty stream, not one phantom copy."""
    if n < 0:
        raise ValueError(f"repeat: n must be >= 0, got {n}")
    if n == 0:
        return ds.limit(0)
    out = ds
    for _ in range(n - 1):
        out = out.union(ds)
    return out


def measure(ds: Dataset) -> Dataset:
    """Replace stream with per-batch metrics events
    (operators/measure.cpp:27)."""
    def _f(t: pa.Table) -> pa.Table:
        return pa.table({
            "events": pa.array([t.num_rows], pa.int64()),
            "bytes": pa.array([t.nbytes], pa.int64()),
        })
    return ds.map_batches(_f, batch_format="pyarrow")


def batch(ds: Dataset, n: int) -> Dataset:
    """Rebatch to a target batch size (operators/batch.cpp:33). In Ray the
    knob is map_batches(batch_size=…) on the consuming stage; this
    materializes the boundary explicitly."""
    return ds.map_batches(lambda t: t, batch_format="pyarrow", batch_size=n)


def yield_(ds: Dataset, path: str) -> Dataset:
    """Replace each event with the record(s) at ``path``
    (operators/yield.cpp: `yield dns.answers[]` makes every list
    element its own event). Dotted segments descend structs; ``[]``
    after ANY segment flattens that list there (``conns[].flows[]``
    composes) — list<struct> elements become the new event's columns,
    scalar leaves become a single column named after the last segment.
    Rows where the path is null vanish (the reference yields nothing
    for them)."""
    segs = []
    for raw in path.split("."):
        flat = raw.endswith("[]")
        segs.append((raw[:-2] if flat else raw, flat))

    def fn(t: pa.Table) -> pa.Table:
        col = t.column(segs[0][0])
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if segs[0][1]:
            col = pc.list_flatten(col)
        for name, flat in segs[1:]:
            col = pc.struct_field(col, name)
            if flat:
                col = pc.list_flatten(col)  # drops null/empty parents
        if not segs[-1][1]:
            col = col.filter(pc.is_valid(col))
        if pa.types.is_struct(col.type):
            out = pa.table({
                f.name: pc.struct_field(col, f.name)
                for f in col.type
            })
        else:
            out = pa.table({segs[-1][0]: col})
        return nometa(out)

    return ds.map_batches(fn, batch_format="pyarrow")


def fields_(ds: Dataset) -> Dataset:
    """Replace the stream with one event per FIELD of the input schema
    (operators/fields.cpp introspection): (field, type, nullable)."""
    import ray.data as rd

    schema = ds.schema()
    names = list(schema.names)
    types = [str(t) for t in schema.types]
    base = schema.base_schema if hasattr(schema, "base_schema") else None
    nullable = [bool(base.field(n).nullable) if base is not None else True
                for n in names]
    return rd.from_arrow(pa.table({
        "field": pa.array(names, pa.string()),
        "type": pa.array(types, pa.string()),
        "nullable": pa.array(nullable, pa.bool_()),
    }))


def set_attributes(ds: Dataset, **attrs: str) -> Dataset:
    """Attach key=value attributes to the stream's SCHEMA metadata
    (operators/set_attributes.cpp — the reference stamps type
    attributes like `#index=hash` on the slice schema; here they ride
    ``pa.Schema.metadata``, surviving map stages that preserve metadata
    and parquet round-trips)."""
    kv = {k.encode(): str(v).encode() for k, v in attrs.items()}

    def fn(t: pa.Table) -> pa.Table:
        meta = dict(t.schema.metadata or {})
        meta.update(kv)
        return t.replace_schema_metadata(meta)

    return ds.map_batches(fn, batch_format="pyarrow")


def get_attributes(ds: Dataset) -> Dataset:
    """Replace the stream with one event per schema-metadata attribute
    (operators/get_attributes.cpp)."""
    import ray.data as rd

    def fn(t: pa.Table) -> pa.Table:
        meta = t.schema.metadata or {}
        ks = sorted(meta)
        return pa.table({
            "key": pa.array([k.decode("utf-8", "replace") for k in ks],
                            pa.string()),
            "value": pa.array([meta[k].decode("utf-8", "replace")
                               for k in ks], pa.string()),
        })

    # one block is enough: attributes are schema-level, identical on
    # every block — take the first non-empty answer
    for blk in ds.limit(1).map_batches(fn, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow"):
        return rd.from_arrow(blk)
    return rd.from_arrow(pa.table({"key": pa.array([], pa.string()),
                                   "value": pa.array([], pa.string())}))
