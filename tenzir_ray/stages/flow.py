"""Flow control and process-integration operators.

Reference surface: fork.cpp, if.cpp (flow control), shell.cpp (pipe
events through an external command), delay.cpp, throttle.cpp,
assert_throughput.cpp (rate control), sample.cpp (adaptive sampling).
Each is re-expressed on the Dataset API: splits are two filtered
Datasets over a shared cached input, rate control is a single-actor
``map_batches`` stage (state in ``__init__``), and shell is a
per-batch subprocess pipe in an actor pool.
"""

from __future__ import annotations

import time
from typing import Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from tenzir_ray.util import nometa

Expr = Callable[[pa.Table], pa.Array]


# ------------------------------------------------------------------ shell


def _table_to_ndjson(t: pa.Table) -> bytes:
    import json

    out = []
    for row in t.to_pylist():
        out.append(json.dumps(row, separators=(",", ":"), default=str))
    return ("\n".join(out) + "\n").encode() if out else b""


def _ndjson_to_table(data: bytes) -> pa.Table:
    import json

    rows = [json.loads(line) for line in data.decode().splitlines() if line.strip()]
    if not rows:
        return pa.table({})
    keys: list[str] = []
    for r in rows:
        for k in r:
            if k not in keys:
                keys.append(k)
    return pa.table({k: pa.array([r.get(k) for r in rows]) for k in keys})


def shell(
    ds: Dataset,
    command: str,
    format: str = "ndjson",
    column: str = "line",
    concurrency=None,
    batch_size: int | None = 4096,
) -> Dataset:
    """Pipe events through an external command (operators/shell.cpp:
    the reference forks a process per pipeline and streams bytes through
    stdin/stdout; here each batch is piped through one subprocess
    invocation in an actor pool — at scale that is one process per batch
    per worker, amortized by batch_size).

    format="ndjson": rows → JSON lines on stdin, stdout parsed back as
    NDJSON (schema = union of keys). format="lines": the ``column``
    string column is fed as raw lines and stdout lines become the new
    ``column`` values (row count may change — grep-like commands)."""
    import subprocess

    class Shell:
        def __init__(self):
            self.cmd = command

        def __call__(self, t: pa.Table) -> pa.Table:
            if format == "ndjson":
                payload = _table_to_ndjson(t)
            else:
                vals = t.column(column).to_pylist()
                payload = ("\n".join(v for v in vals if v is not None) + "\n").encode()
            proc = subprocess.run(
                self.cmd, shell=True, input=payload,
                stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            )
            # grep exits 1 on "no matches" (silently) — tolerate ONLY
            # that case; every other nonzero rc (including
            # stderr-silent OOM kills and exit(1)-after-partial-output
            # scripts) must fail the batch, not silently drop rows
            if proc.returncode != 0 and not (
                    proc.returncode == 1 and not proc.stderr):
                raise RuntimeError(
                    f"shell {self.cmd!r} failed rc={proc.returncode}: "
                    f"{proc.stderr.decode()[:500]}"
                )
            if format == "ndjson":
                out = _ndjson_to_table(proc.stdout)
                if out.num_columns == 0:
                    # never inject a schema-less zero-column block (the
                    # Ray empty-block artifact): keep the INPUT schema
                    # with zero rows so downstream unification holds
                    return t.schema.empty_table()
                return out
            lines = proc.stdout.decode().splitlines()
            return pa.table({column: pa.array(lines, pa.string())})

    from ..util import autoscale_pool

    return ds.map_batches(
        Shell, batch_format="pyarrow", batch_size=batch_size,
        concurrency=autoscale_pool() if concurrency is None else concurrency,
    )


# ------------------------------------------------------------ fork / if


def fork(ds: Dataset, *branches: Callable[[Dataset], Dataset]) -> list[Dataset]:
    """Run several pipelines over one input (operators/fork.cpp:15 —
    the reference copies the stream into a nested pipeline). The input
    is materialized once into the object store (zero-copy shared by all
    branches) instead of re-executing per consumer."""
    shared = ds.materialize()
    return [b(shared) for b in branches]


def if_(
    ds: Dataset,
    pred: Expr,
    then: Callable[[Dataset], Dataset],
    else_: Callable[[Dataset], Dataset] | None = None,
) -> Dataset:
    """Route rows through one of two pipelines and merge
    (operators/if.cpp:109). Split = two vectorized filters over a shared
    materialized input; merge = union (order not preserved, matching
    Ray's unordered streams)."""
    shared = ds.materialize()

    def _filt(keep: bool):
        def _f(t: pa.Table) -> pa.Table:
            m = pred(t)
            if isinstance(m, pa.ChunkedArray):
                m = m.combine_chunks()
            m = pc.fill_null(m, False)
            return nometa(t.filter(m if keep else pc.invert(m)))
        return _f

    t_branch = then(shared.map_batches(_filt(True), batch_format="pyarrow"))
    f_in = shared.map_batches(_filt(False), batch_format="pyarrow")
    f_branch = else_(f_in) if else_ else f_in
    return t_branch.union(f_branch)


# ------------------------------------------------------- rate control


def delay(
    ds: Dataset, field: str, speed: float = 1.0, start_at_first: bool = True
) -> Dataset:
    """Anchor stream time to wall clock (operators/delay.cpp): release
    each batch no earlier than ``(ts - anchor)/speed`` after the first
    batch. Single-actor stage (concurrency=1) — rate control is
    inherently serial."""

    class Delayer:
        def __init__(self):
            self.t0 = None
            self.anchor = None

        def __call__(self, t: pa.Table) -> pa.Table:
            ts = t.column(field)
            mx = pc.max(ts).as_py()
            if mx is None:
                return t
            if self.anchor is None:
                self.anchor = pc.min(ts).as_py()
                self.t0 = time.monotonic()
            due = (mx - self.anchor).total_seconds() / speed \
                if hasattr(mx - self.anchor, "total_seconds") \
                else (mx - self.anchor) / speed
            wait = due - (time.monotonic() - self.t0)
            while wait > 0:  # pay the FULL debt (chunked, interruptible)
                time.sleep(min(wait, 60.0))
                wait = due - (time.monotonic() - self.t0)
            return t

    return ds.map_batches(Delayer, batch_format="pyarrow", concurrency=1)


def throttle(ds: Dataset, events_per_s: float) -> Dataset:
    """Cap stream rate (operators/throttle.cpp — the reference caps
    bytes/s; events/s is the natural unit for record batches). Token
    bucket in a single actor."""

    class Throttle:
        def __init__(self):
            self.t0 = time.monotonic()
            self.released = 0.0

        def __call__(self, t: pa.Table) -> pa.Table:
            self.released += t.num_rows
            due = self.released / events_per_s
            wait = due - (time.monotonic() - self.t0)
            while wait > 0:  # a single capped sleep under-throttles
                time.sleep(min(wait, 60.0))
                wait = due - (time.monotonic() - self.t0)
            return t

    return ds.map_batches(Throttle, batch_format="pyarrow", concurrency=1)


def assert_throughput(
    ds: Dataset, min_events_per_s: float, window_s: float = 1.0,
    grace_windows: int = 1,
) -> Dataset:
    """Fail the pipeline when throughput drops below a floor
    (operators/assert_throughput.cpp). Measured per wall-clock window in
    a single actor; the first ``grace_windows`` windows are exempt
    (startup)."""

    class Gate:
        def __init__(self):
            self.win_start = time.monotonic()
            self.win_count = 0
            self.windows_seen = 0

        def __call__(self, t: pa.Table) -> pa.Table:
            now = time.monotonic()
            self.win_count += t.num_rows
            elapsed = now - self.win_start
            if elapsed >= window_s:
                rate = self.win_count / elapsed
                self.windows_seen += 1
                if (self.windows_seen > grace_windows
                        and rate < min_events_per_s):
                    raise RuntimeError(
                        f"throughput {rate:.0f} ev/s below floor "
                        f"{min_events_per_s:.0f} ev/s"
                    )
                self.win_start, self.win_count = now, 0
            return t

    return ds.map_batches(Gate, batch_format="pyarrow", concurrency=1)


def sample_adaptive(
    ds: Dataset, target_per_window: int, window_events: int = 65536,
    id_col: str | None = None,
) -> Dataset:
    """Rate-adaptive sampling (operators/sample.cpp:19-84: the reference
    derives a 1-in-f rate from the observed input rate per period). Batch
    analog: per window of ``window_events`` input rows, keep every f-th
    row with f = ceil(window/target) — the keep rate adapts to however
    fast rows actually arrive, deterministic given the stream order (or
    fully deterministic on ``id_col % f == 0`` when provided)."""
    f = max(1, int(np.ceil(window_events / max(1, target_per_window))))

    class Sampler:
        def __init__(self):
            self.seen = 0

        def __call__(self, t: pa.Table) -> pa.Table:
            n = t.num_rows
            if id_col is not None:
                ids = t.column(id_col).combine_chunks().to_numpy(
                    zero_copy_only=False).astype(np.int64)
                return nometa(t.filter(pa.array(ids % f == 0)))
            idx = np.arange(self.seen, self.seen + n)
            self.seen += n
            return nometa(t.take(pa.array(np.flatnonzero(idx % f == 0))))

    return ds.map_batches(Sampler, batch_format="pyarrow", concurrency=1)
