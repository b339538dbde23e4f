"""Windowed aggregation (reference operators/summarize.cpp:100-142 —
``summarize … created_timeout=…`` / ``update_timeout=…`` flush groups on
processing-time timeouts inside a live stream).

Two forms here:

- :func:`summarize_window` — EVENT-time tumbling windows for the batch
  engine: the timestamp column floors to its window start and the window
  joins the group key; one distributed aggregate, no state actor. This
  is the semantics a replayed/batch pipeline needs (processing-time
  flushes are nondeterministic under replay — the reference docs carry
  the same warning).
- :class:`TimeoutSummarize` — the PROCESSING-time streaming form for
  live tails (``Lake.follow``-style epoch loops): an incremental
  partial-aggregate state keyed by group, flushing a group when its
  ``created_timeout`` (age since first event) or ``update_timeout``
  (idle since last event) expires. The clock is injectable so tests are
  deterministic. Feed it batches from one consumer; it is per-stream
  state, like the reference's single-exec summarize operator.
"""

from __future__ import annotations

import time as _time
from typing import Any, Callable

import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset


def window_start(arr, every: str):
    """Floor a timestamp column to its tumbling-window start.
    ``every`` is  '<n><unit>' with unit in s/m/h/d ('6h', '30m', '1d')."""
    n, unit = int(every[:-1]), every[-1]
    unit_name = {"s": "second", "m": "minute", "h": "hour", "d": "day"}[unit]
    return pc.floor_temporal(arr, multiple=n, unit=unit_name)


def _dur_seconds(spec: str) -> int:
    return int(spec[:-1]) * {"s": 1, "m": 60, "h": 3600, "d": 86400}[spec[-1]]


def summarize_window(
    ds: Dataset, time_col: str, every: str,
    by: list[str] | str | None = None,
    window_col: str = "window",
    combine: str = "auto",
    slide: str | None = None,
    **aggs,
) -> Dataset:
    """Event-time windowed aggregation. Tumbling by default: one
    vectorized ``floor_temporal`` per batch adds the window-start
    column, which joins the group key of a single distributed
    summarize. With ``slide`` (a duration dividing ``every``) windows
    HOP: each event contributes to ``every/slide`` overlapping windows —
    implemented by replicating the batch K times with shifted window
    starts (one vectorized subtract per replica, no per-row work), so
    the shuffle carries K× the rows but the aggregation stays a single
    distributed summarize."""
    import datetime

    from tenzir_ray.stages.ops import summarize

    by = [by] if isinstance(by, str) else list(by or [])
    if slide is None:
        def tag(t: pa.Table) -> pa.Table:
            w = window_start(t.column(time_col), every)
            t = t.append_column(window_col, w)
            return t.replace_schema_metadata(None) if t.schema.metadata else t
    else:
        ev_s, sl_s = _dur_seconds(every), _dur_seconds(slide)
        if sl_s <= 0 or ev_s % sl_s:
            raise ValueError(
                f"slide {slide!r} must evenly divide every {every!r}")
        k = ev_s // sl_s

        def tag(t: pa.Table) -> pa.Table:
            # null event times belong to the null-window group ONCE
            # (tumbling parity) — replicating them K times would inflate
            # the null group's aggregates K×
            ts = t.column(time_col)
            nul_mask = pc.is_null(ts)
            has_null = pc.any(nul_mask).as_py()
            live = t.filter(pc.invert(nul_mask)) if has_null else t
            base = window_start(live.column(time_col), slide)
            parts = []
            for j in range(k):
                w = pc.subtract(
                    base, pa.scalar(datetime.timedelta(seconds=j * sl_s)))
                parts.append(live.append_column(
                    window_col, pc.cast(w, base.type)))
            if has_null:
                nul = t.filter(nul_mask)
                parts.append(nul.append_column(
                    window_col, pa.nulls(nul.num_rows, base.type)))
            out = pa.concat_tables(parts)
            return out.replace_schema_metadata(None) \
                if out.schema.metadata else out

    return summarize(ds.map_batches(tag, batch_format="pyarrow"),
                     [window_col] + by, combine=combine, **aggs)


class TimeoutSummarize:
    """Streaming summarize with ``created_timeout`` / ``update_timeout``
    (processing-time) group flushes, for live tail loops.

    State per group: algebraic partials (count/sum/min/max/mean) plus
    created/updated stamps from the injectable ``clock``. ``feed``
    merges a batch and returns whatever groups expired; ``flush``
    drains everything (end of stream)."""

    def __init__(self, by: list[str] | str,
                 aggs: dict[str, tuple[str, str] | str],
                 created_timeout: float | None = None,
                 update_timeout: float | None = None,
                 clock: Callable[[], float] = _time.monotonic):
        self.by = [by] if isinstance(by, str) else list(by)
        self.parsed = []
        for alias, spec in aggs.items():
            fn, col = (spec, None) if isinstance(spec, str) else spec
            if fn not in ("count", "sum", "min", "max", "mean"):
                raise ValueError(f"TimeoutSummarize: {fn!r} not algebraic")
            self.parsed.append((alias, fn, col))
        self.created_timeout = created_timeout
        self.update_timeout = update_timeout
        self.clock = clock
        # key tuple -> {"created": t, "updated": t, "partial": {...}}
        self.state: dict[tuple, dict[str, Any]] = {}

    def _merge_row(self, slot: dict, fn_key: str, fn: str, v) -> None:
        p = slot["partial"]
        if v is None:
            p.setdefault(fn_key, None if fn in ("min", "max") else 0)
            return
        cur = p.get(fn_key)
        if fn in ("count",):
            p[fn_key] = (cur or 0) + v
        elif fn == "sum":
            p[fn_key] = (cur or 0) + v
        elif fn == "min":
            p[fn_key] = v if cur is None else min(cur, v)
        elif fn == "max":
            p[fn_key] = v if cur is None else max(cur, v)

    def feed(self, t: pa.Table) -> pa.Table:
        """Merge one batch (per-batch partials via Arrow's hash
        group_by — the per-row loop only touches GROUPS), then return
        the groups whose timeout expired."""
        now = self.clock()
        if t.num_rows:
            specs: dict[str, tuple] = {}
            for _alias, fn, col in self.parsed:
                if fn == "count" and col is None:
                    specs["__n"] = ([], "count_all")
                elif fn in ("count",):
                    specs[f"__cnt_{col}"] = (col, "count")
                elif fn == "mean":
                    specs[f"__sum_{col}"] = (col, "sum")
                    specs[f"__cnt_{col}"] = (col, "count")
                else:
                    specs[f"__{fn}_{col}"] = (col, fn)
            g = t.group_by(self.by, use_threads=False).aggregate(
                list(specs.values()))
            arrow_names = [
                (f"{c}_{f}" if c else "count_all") for c, f in specs.values()]
            merge_fns = {
                name: ("min" if f == "min" else
                       "max" if f == "max" else "sum")
                for name, (_c, f) in specs.items()
            }
            rows = {n: g.column(a).to_pylist()
                    for n, a in zip(specs, arrow_names)}
            keys = [tuple(vals) for vals in
                    zip(*(g.column(b).to_pylist() for b in self.by))]
            for i, key in enumerate(keys):
                slot = self.state.setdefault(
                    key, {"created": now, "updated": now, "partial": {}})
                slot["updated"] = now
                for name in specs:
                    self._merge_row(slot, name, merge_fns[name],
                                    rows[name][i])
        return self._expired(now)

    def _expired(self, now: float) -> pa.Table:
        out_keys = []
        for key, slot in self.state.items():
            if (self.created_timeout is not None
                    and now - slot["created"] >= self.created_timeout) or \
               (self.update_timeout is not None
                    and now - slot["updated"] >= self.update_timeout):
                out_keys.append(key)
        return self._emit(out_keys)

    def flush(self) -> pa.Table:
        return self._emit(list(self.state))

    def poll(self) -> pa.Table:
        """Timeout check without new data (call between idle polls)."""
        return self._expired(self.clock())

    def _emit(self, keys: list[tuple]) -> pa.Table:
        cols: dict[str, list] = {b: [] for b in self.by}
        for alias, _fn, _col in self.parsed:
            cols[alias] = []
        for key in keys:
            slot = self.state.pop(key)
            for b, v in zip(self.by, key):
                cols[b].append(v)
            p = slot["partial"]
            for alias, fn, col in self.parsed:
                if fn == "count":
                    cols[alias].append(p.get(
                        "__n" if col is None else f"__cnt_{col}", 0))
                elif fn == "mean":
                    n = p.get(f"__cnt_{col}") or 0
                    s = p.get(f"__sum_{col}") or 0
                    cols[alias].append(s / n if n else None)
                else:
                    cols[alias].append(p.get(f"__{fn}_{col}"))
        return pa.table({k: pa.array(v) for k, v in cols.items()}) \
            if keys else pa.table(
                {k: pa.array([], pa.null()) for k in cols})
