"""Contexts: shared keyed state updated by one pipeline, probed by others.

Reference semantics (builtins/contexts/lookup_table.cpp:221-343): a named
node-resident hash table with ``update`` (upsert entries), ``enrich``
(LEFT lookup join writing into a field) and snapshot/restore. The Ray
re-expression is a named detached-scope actor; probes SNAPSHOT the table
once per enrich stage (broadcast via ``ray.put``) rather than calling the
actor per batch — an RPC per batch would serialize the pipeline.

Also a pure-Python Bloom filter (reference: dcso_bloom_filter.cpp /
context::create_bloom_filter) usable as a broadcast membership prefilter
for semi/anti joins and partition pruning.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


class _Context:
    """The actor body: a dict with per-key write timestamps (simplified
    timeout model vs the reference's create/write/read timeouts)."""

    def __init__(self):
        self.table: dict = {}

    def update(self, entries: dict) -> int:
        self.table.update(entries)
        return len(self.table)

    def erase(self, keys: list) -> int:
        for k in keys:
            self.table.pop(k, None)
        return len(self.table)

    def reset(self) -> None:
        self.table.clear()

    def snapshot(self) -> dict:
        return dict(self.table)


def ContextActor(name: str):
    """Get-or-create the named context actor (reference:
    context::create). DETACHED lifetime: a named non-detached actor
    dies when its creator's handles drop, so a context populated by
    pipeline A would silently vanish before pipeline B probes it (the
    same reasoning as pubsub's broker actor)."""
    import ray

    try:
        return ray.get_actor(name)
    except ValueError:
        return (
            ray.remote(_Context)
            .options(name=name, lifetime="detached", get_if_exists=True)
            .remote()
        )


def context_enrich(ds, name: str, key: str, out_field: str = "context"):
    """Enrich a Dataset from the named context: one snapshot per stage,
    broadcast to the actor pool (context::enrich analog)."""
    import ray

    import tenzir_ray.stages as ops

    actor = ContextActor(name)
    snapshot: dict = ray.get(actor.snapshot.remote())
    if not snapshot:
        # an empty build side would type its key array as null and make
        # the probe-side cast raise; an empty context enriches with null
        import pyarrow as pa

        def _null_col(t: pa.Table) -> pa.Table:
            t = t.append_column(
                out_field, pa.nulls(t.num_rows, pa.string()))
            return t.replace_schema_metadata(None) \
                if t.schema.metadata else t

        return ds.map_batches(_null_col, batch_format="pyarrow")
    return ops.enrich(ds, snapshot, key=key, out_field=out_field)


def context_save(name: str, path: str) -> int:
    """Persist the named context to disk (reference context::save —
    lookup_table.cpp:137 snapshot machinery persists contexts in the
    node state dir; here: one parquet file of (key, value) rows, values
    pickled only when not Arrow-representable)."""
    import pickle

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    snapshot: dict = ray.get(ContextActor(name).snapshot.remote())
    keys = list(snapshot.keys())
    vals = list(snapshot.values())
    try:
        val_col = pa.array(vals)
        pickled = False
    except (pa.ArrowInvalid, pa.ArrowTypeError, pa.ArrowNotImplementedError):
        val_col = pa.array([pickle.dumps(v) for v in vals], pa.binary())
        pickled = True
    t = pa.table({"key": pa.array(keys), "value": val_col})
    t = t.replace_schema_metadata({b"tenzir_ray.pickled": str(pickled).encode()})
    pq.write_table(t, path)
    return len(keys)


def context_load(name: str, path: str) -> int:
    """Restore a context from :func:`context_save` output
    (context::load analog). Returns the table size after load."""
    import pickle

    import pyarrow.parquet as pq
    import ray

    t = pq.read_table(path)
    pickled = (t.schema.metadata or {}).get(b"tenzir_ray.pickled") == b"True"
    vals = t.column("value").to_pylist()
    if pickled:
        vals = [pickle.loads(v) for v in vals]
    entries = dict(zip(t.column("key").to_pylist(), vals))
    return ray.get(ContextActor(name).update.remote(entries))


def context_inspect(name: str) -> dict:
    """Size + a sample of the named context (context::inspect analog)."""
    import ray

    snapshot: dict = ray.get(ContextActor(name).snapshot.remote())
    sample = dict(list(snapshot.items())[:10])
    return {"name": name, "entries": len(snapshot), "sample": sample}


class BloomFilter:
    """Split Bloom filter over 64-bit element hashes; picklable → cheap to
    broadcast. ``m`` bits, ``k`` hashes derived from double hashing."""

    def __init__(self, capacity: int, fp_rate: float = 0.01,
                 max_bytes: int | None = None):
        m = max(64, int(-capacity * math.log(fp_rate) / (math.log(2) ** 2)))
        if max_bytes is not None:
            # clamp the bit array to a broadcast budget: a smaller m only
            # raises the false-positive rate, never gives wrong answers
            m = min(m, max(64, max_bytes * 8))
        self.m = (m + 63) // 64 * 64
        self.k = max(1, round(self.m / max(1, capacity) * math.log(2)))
        self.bits = np.zeros(self.m // 64, dtype=np.uint64)

    @classmethod
    def with_params(cls, m: int, k: int) -> "BloomFilter":
        """Empty filter with exact (m, k) — every partial filter built in
        parallel workers must share params so bit arrays OR-merge."""
        self = cls.__new__(cls)
        self.m, self.k = m, k
        self.bits = np.zeros(m // 64, dtype=np.uint64)
        return self

    def merge_bits(self, bits: np.ndarray) -> None:
        np.bitwise_or(self.bits, bits, out=self.bits)

    def _positions(self, values) -> np.ndarray:
        h = pd.util.hash_array(np.asarray(values, dtype=object))
        h1 = h % np.uint64(self.m)
        h2 = (h >> np.uint64(33)) | np.uint64(1)
        ks = np.arange(self.k, dtype=np.uint64)
        return (h1[:, None] + ks[None, :] * h2[:, None]) % np.uint64(self.m)

    def add(self, values) -> None:
        pos = self._positions(values).ravel()
        np.bitwise_or.at(
            self.bits, (pos // 64).astype(np.int64),
            np.uint64(1) << (pos % np.uint64(64)),
        )

    def contains(self, values) -> np.ndarray:
        pos = self._positions(values)
        word = self.bits[(pos // 64).astype(np.int64)]
        hit = (word >> (pos % np.uint64(64))) & np.uint64(1)
        return hit.all(axis=1).astype(bool)
