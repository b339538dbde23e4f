"""Property-based proof obligations for the LWW kernel (hypothesis):
the engine's correctness under arbitrary batching/sharding/replay order
reduces to these algebraic properties of lww_reduce."""

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from tenzir_ray.cdc.lake import lww_reduce

_rows = st.lists(
    st.tuples(
        st.integers(0, 8),          # url id (small keyspace → collisions)
        st.integers(0, 5),          # warc_ts
        st.integers(0, 10_000),     # lsn (unique-ified below)
    ),
    min_size=0, max_size=60,
)


def _table(rows):
    # unique lsn (the WAL guarantees it)
    seen, fixed = set(), []
    for u, ts, lsn in rows:
        while lsn in seen:
            lsn += 1
        seen.add(lsn)
        fixed.append((u, ts, lsn))
    return pa.table({
        "url": pa.array([f"u{r[0]}" for r in fixed], pa.string()),
        "warc_ts": pa.array([r[1] for r in fixed], pa.timestamp("ns")),
        "lsn": pa.array([r[2] for r in fixed], pa.int64()),
    })


def _canon(t: pa.Table) -> list[tuple]:
    d = t.to_pydict()
    return sorted(zip(d["url"], d["warc_ts"], d["lsn"]))


def _oracle(t: pa.Table) -> list[tuple]:
    best = {}
    d = t.to_pydict()
    for u, ts, lsn in zip(d["url"], d["warc_ts"], d["lsn"]):
        if u not in best or (ts, lsn) > best[u]:
            best[u] = (ts, lsn)
    return sorted((u, ts, lsn) for u, (ts, lsn) in best.items())


@settings(max_examples=200, deadline=None)
@given(_rows)
def test_reduce_matches_oracle(rows):
    t = _table(rows)
    assert _canon(lww_reduce(t)) == _oracle(t)


@settings(max_examples=100, deadline=None)
@given(_rows)
def test_idempotent(rows):
    t = _table(rows)
    once = lww_reduce(t)
    assert _canon(lww_reduce(once)) == _canon(once)


@settings(max_examples=100, deadline=None)
@given(_rows, st.integers(1, 59))
def test_partial_reduce_equivalence(rows, cut):
    """combiner validity: reduce(reduce(A) ∪ reduce(B)) == reduce(A ∪ B)
    for any split — THE property that makes the per-batch combiner and
    the any-order epoch replay correct."""
    t = _table(rows)
    cut = min(cut, t.num_rows)
    a, b = t.slice(0, cut), t.slice(cut)
    combined = pa.concat_tables([lww_reduce(a), lww_reduce(b)])
    assert _canon(lww_reduce(combined)) == _canon(lww_reduce(t))


@settings(max_examples=100, deadline=None)
@given(_rows, st.randoms())
def test_order_independence(rows, rnd):
    t = _table(rows)
    idx = list(range(t.num_rows))
    rnd.shuffle(idx)
    shuffled = t.take(pa.array(idx, pa.int64()))
    assert _canon(lww_reduce(shuffled)) == _canon(lww_reduce(t))
