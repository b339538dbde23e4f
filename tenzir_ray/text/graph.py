"""Distributed connected components — the transitive-closure primitive
LSH near-dup clustering needs (a ~ b and b ~ c must collapse a, b, c
into ONE component even when a and c share no bucket).

Algorithm: hash-to-min label propagation (Rastogi et al. 2013,
"Finding Connected Components in Map-Reduce in Logarithmic Rounds",
arXiv:1203.5387): the pair set is replaced each round by
``(min(C_v), u)`` and ``(u, min(C_v))`` for every ``u`` in each node's
neighborhood ``C_v`` (self included), converging in O(log d) rounds to
every node paired directly with its component minimum. Each round is
two ``groupby`` shuffles of (int64, int64) pairs; no joins (Ray 2.49
``Dataset.join`` is unreliable — see tests/conftest gotchas) and no
driver-side edge materialization.

Scale design: groups are COARSE — ``x & _SALT_MASK`` buckets, not one
group per node — and each group is processed in one vectorized numpy
pass (``np.lexsort`` + segment boundaries + ``np.minimum.reduceat``),
the same pattern as ``lsh_candidate_pairs.band_reduce``
(text/dedup.py). At 1e9 nodes that is ~1k Python calls per round
instead of 1e9. The dedup kernel also stamps per-node ``f`` (first row
of the node's segment) and ``m`` (the node's current min label) so
that (a) the convergence signature is a plain per-row column sum —
correct even if Ray splits a group's output across blocks — and (b)
the final (node, component) labeling is a filter on ``f``, not a
third shuffle. Convergence: per-node minima are monotone
non-increasing under hash-to-min and the node set is fixed, so two
consecutive rounds with equal (node count, Σ per-node min) mean a
fixpoint.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

_SALT_MASK = 1023  # 1024 coarse groups per round — tune ≥ cluster cores


def _pairs_table(x: np.ndarray, y: np.ndarray) -> pa.Table:
    return pa.table({
        "x": pa.array(x, pa.int64()),
        "y": pa.array(y, pa.int64()),
        "xs": pa.array(x & _SALT_MASK, pa.int64()),
    })


def _empty_dedup() -> pa.Table:
    z = np.zeros(0, np.int64)
    return pa.table({
        "x": pa.array(z, pa.int64()), "y": pa.array(z, pa.int64()),
        "xs": pa.array(z, pa.int64()), "f": pa.array(z, pa.int64()),
        "m": pa.array(z, pa.int64()),
    })


def _sorted_dedup(x: np.ndarray, y: np.ndarray):
    """Sort pairs by (x, y) and drop duplicates — returns (x, y)."""
    order = np.lexsort((y, x))
    x, y = x[order], y[order]
    if len(x):
        keep = np.r_[True, (x[1:] != x[:-1]) | (y[1:] != y[:-1])]
        x, y = x[keep], y[keep]
    return x, y


def connected_components(
    edges: Dataset, a: str = "a", b: str = "b", max_iters: int = 30,
) -> Dataset:
    """(node, component) for every node appearing in ``edges`` —
    ``component`` is the smallest node id in the connected component.
    Deterministic at any parallelism."""
    def symm(t: pa.Table) -> pa.Table:
        xa = pc.cast(t.column(a), pa.int64()).combine_chunks() \
            .to_numpy(zero_copy_only=False)
        xb = pc.cast(t.column(b), pa.int64()).combine_chunks() \
            .to_numpy(zero_copy_only=False)
        return _pairs_table(np.concatenate([xa, xb]),
                            np.concatenate([xb, xa]))

    def htm_round(g: pa.Table) -> pa.Table:
        # one group = one salt slice of nodes; vectorized hash-to-min:
        # add self pairs, sort+dedup, then per node-segment emit
        # (m, u) ∪ (u, m) for the non-min neighbors u (isolated nodes
        # keep their (x, x) self pair).
        if g.num_rows == 0:
            z = np.zeros(0, np.int64)
            return _pairs_table(z, z)
        x = g.column("x").to_numpy(zero_copy_only=False)
        y = g.column("y").to_numpy(zero_copy_only=False)
        xs_u = np.unique(x)
        x, y = _sorted_dedup(np.concatenate([x, xs_u]),
                             np.concatenate([y, xs_u]))
        starts = np.flatnonzero(np.r_[True, x[1:] != x[:-1]])
        counts = np.diff(np.r_[starts, len(x)])
        # y sorted ascending within each x-segment and contains x
        # (self pair), so the segment's first y IS min(ys ∪ {x})
        m = y[starts]
        others_mask = np.ones(len(x), bool)
        others_mask[starts] = False
        others = y[others_mask]
        m_rep = np.repeat(m, counts - 1)
        out_x = np.concatenate([m_rep, others])
        out_y = np.concatenate([others, m_rep])
        iso = counts == 1  # neighborhood was {x} only
        if iso.any():
            xi = x[starts[iso]]
            out_x = np.concatenate([out_x, xi])
            out_y = np.concatenate([out_y, xi])
        # local pre-dedup trims the shuffle (star pairs repeat per node)
        out_x, out_y = _sorted_dedup(out_x, out_y)
        return _pairs_table(out_x, out_y)

    def dedup_pairs(g: pa.Table) -> pa.Table:
        # one group = one salt slice; sort+dedup, then stamp per node
        # segment: f = first-row flag, m = min(ys ∪ {x}) (broadcast to
        # every row so the columns are per-row sums / filters).
        if g.num_rows == 0:
            return _empty_dedup()
        x, y = _sorted_dedup(
            g.column("x").to_numpy(zero_copy_only=False),
            g.column("y").to_numpy(zero_copy_only=False))
        starts = np.flatnonzero(np.r_[True, x[1:] != x[:-1]])
        counts = np.diff(np.r_[starts, len(x)])
        m = np.minimum(np.minimum.reduceat(y, starts), x[starts])
        f = np.zeros(len(x), np.int64)
        f[starts] = 1
        return pa.table({
            "x": pa.array(x, pa.int64()), "y": pa.array(y, pa.int64()),
            "xs": pa.array(x & _SALT_MASK, pa.int64()),
            "f": pa.array(f, pa.int64()),
            "m": pa.array(np.repeat(m, counts) * f, pa.int64()),
        })

    pairs = edges.map_batches(symm, batch_format="pyarrow")
    prev_sig: tuple | None = None
    for _ in range(max_iters):
        # drop the f/m stamps of the previous dedup pass so the htm
        # shuffle exchanges only (x, y, xs)
        pairs = pairs.select_columns(["x", "y", "xs"]).groupby(
            "xs").map_groups(htm_round, batch_format="pyarrow")
        pairs = pairs.groupby("xs").map_groups(
            dedup_pairs, batch_format="pyarrow").materialize()
        # convergence signature: (node count, Σ per-node min) — both
        # plain column sums thanks to the f/m stamps, so correct no
        # matter how Ray slices group output into blocks. Minima are
        # monotone non-increasing, so two equal rounds == fixpoint.
        sig_t = pairs.sum(["f", "m"])
        if not sig_t or sig_t.get("sum(f)") is None:
            # empty edge set: no nodes, nothing to iterate or label
            import ray.data as rd

            return rd.from_arrow(pa.table({
                "node": pa.array([], pa.int64()),
                "component": pa.array([], pa.int64())}))
        sig = (int(sig_t["sum(f)"]), int(sig_t["sum(m)"]))
        if sig == prev_sig:
            break
        prev_sig = sig

    # labels ride the f/m stamps of the final dedup pass: one filter,
    # no third shuffle
    def label(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("f"), 1))
        return pa.table({"node": t.column("x"),
                         "component": t.column("m")})

    return pairs.map_batches(label, batch_format="pyarrow")


def cc_seq(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Sequential union-find oracle (path-halving): node → smallest id
    in its component. Independent of the distributed algorithm."""
    parent: dict[int, int] = {}

    def find(v: int) -> int:
        r = v
        while parent.setdefault(r, r) != r:
            parent[r] = parent[parent[r]]
            r = parent[r]
        return r

    for u, v in edges:
        ru, rv = find(int(u)), find(int(v))
        if ru != rv:
            hi, lo = max(ru, rv), min(ru, rv)
            parent[hi] = lo
    return {v: find(v) for v in list(parent)}
