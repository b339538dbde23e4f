"""Distributed connected components — the transitive-closure primitive
LSH near-dup clustering needs (a ~ b and b ~ c must collapse a, b, c
into ONE component even when a and c share no bucket).

Algorithm: hash-to-min label propagation (Rastogi et al. 2013,
"Finding Connected Components in Map-Reduce in Logarithmic Rounds",
arXiv:1203.5387): the pair set is replaced each round by
``(min(C_v), u)`` and ``(u, min(C_v))`` for every ``u`` in each node's
neighborhood ``C_v`` (self included), converging in O(log d) rounds to
every node paired directly with its component minimum. Each round is
one ``groupby(node)`` + one distinct — both plain Ray Data shuffles of
(int64, int64) pairs; no joins (Ray 2.49 ``Dataset.join`` is unreliable
— see tests/conftest gotchas) and no driver-side edge materialization.
Convergence is detected with a two-scalar aggregate per round (sum and
count of per-node minima — monotone, so two equal consecutive rounds
mean a fixpoint).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset


def _pairs_table(x: np.ndarray, y: np.ndarray) -> pa.Table:
    return pa.table({"x": pa.array(x, pa.int64()),
                     "y": pa.array(y, pa.int64())})


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
        # one group = one node's neighborhood; emit (m, u) ∪ (u, m)
        if g.num_rows == 0:
            return _pairs_table(np.zeros(0, np.int64), np.zeros(0, np.int64))
        x = int(g.column("x")[0].as_py())
        ys = np.unique(np.concatenate([
            g.column("y").to_numpy(zero_copy_only=False),
            np.array([x], np.int64)]))
        m = int(ys[0])
        others = ys[ys != m]
        out_x = np.concatenate([np.full(len(others), m, np.int64), others])
        out_y = np.concatenate([others, np.full(len(others), m, np.int64)])
        if len(others) == 0:  # isolated node: keep the self pair
            out_x, out_y = np.array([x], np.int64), np.array([m], np.int64)
        return _pairs_table(out_x, out_y)

    def dedup_pairs(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _pairs_table(np.zeros(0, np.int64), np.zeros(0, np.int64))
        ys = np.unique(g.column("y").to_numpy(zero_copy_only=False))
        x = np.full(len(ys), int(g.column("x")[0].as_py()), np.int64)
        return _pairs_table(x, ys)

    def block_sig(t: pa.Table) -> pa.Table:
        # after dedup_pairs, every node's rows live in ONE block and are
        # contiguous — per-block (node count, Σ per-node min) sums to
        # the global signature without another shuffle
        if t.num_rows == 0:
            return pa.table({"n": pa.array([0], pa.int64()),
                             "s": pa.array([0], pa.int64())})
        x = t.column("x").to_numpy(zero_copy_only=False)
        y = t.column("y").to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, x[1:] != x[:-1]])
        mins = np.minimum(np.minimum.reduceat(y, starts), x[starts])
        return pa.table({"n": pa.array([len(starts)], pa.int64()),
                         "s": pa.array([int(mins.sum())], pa.int64())})

    pairs = edges.map_batches(symm, batch_format="pyarrow")
    prev_sig: tuple | None = None
    for _ in range(max_iters):
        pairs = pairs.groupby("x").map_groups(
            htm_round, batch_format="pyarrow")
        pairs = pairs.groupby("x").map_groups(
            dedup_pairs, batch_format="pyarrow").materialize()
        # convergence signature: per-node minima are monotone
        # non-increasing under hash-to-min, so (node count, Σ min)
        # stable across one round == fixpoint. One map pass over the
        # materialized pairs + a tiny 2-column sum — no extra shuffle.
        sig_t = pairs.map_batches(block_sig, batch_format="pyarrow") \
            .sum(["n", "s"])
        if not sig_t or sig_t.get("sum(n)") is None:
            # empty edge set: no nodes, nothing to iterate or label
            import ray.data as rd

            return rd.from_arrow(pa.table({
                "node": pa.array([], pa.int64()),
                "component": pa.array([], pa.int64())}))
        sig = (int(sig_t["sum(n)"]), int(sig_t["sum(s)"]))
        if sig == prev_sig:
            break
        prev_sig = sig
    # labels: component = min(y ∪ {x}) per node
    def label(g: pa.Table) -> pa.Table:
        x = int(g.column("x")[0].as_py())
        m = min(int(pc.min(g.column("y")).as_py()), x)
        return pa.table({"node": pa.array([x], pa.int64()),
                         "component": pa.array([m], pa.int64())})

    return pairs.groupby("x").map_groups(label, batch_format="pyarrow")


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
