"""Contexts (shared keyed state) and Bloom filter."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from tenzir_ray.state import BloomFilter, ContextActor, context_enrich


def test_context_actor_update_enrich():
    actor = ContextActor("test_ctx_1")
    ray.get(actor.update.remote({1: "alice", 2: "bob"}))
    ray.get(actor.update.remote({2: "bob2", 3: "carol"}))  # upsert
    ds = rd.from_pandas(pd.DataFrame({"user_id": [1, 2, 3, 4]}))
    out = context_enrich(ds, "test_ctx_1", key="user_id", out_field="name")
    got = out.to_pandas().sort_values("user_id")
    assert list(got["name"]) == ["alice", "bob2", "carol", None]
    ray.get(actor.erase.remote([1]))
    assert 1 not in ray.get(actor.snapshot.remote())


def test_bloom_filter():
    bf = BloomFilter(capacity=10_000, fp_rate=0.01)
    members = [f"url{i}" for i in range(5000)]
    bf.add(members)
    assert bf.contains(members).all()
    others = np.array([f"miss{i}" for i in range(5000)], dtype=object)
    fp = bf.contains(others).mean()
    assert fp < 0.05  # ~1% design rate with headroom


def test_bloom_prefilter_semi_join():
    """Bloom as broadcast semi-join prefilter inside map_batches."""
    bf = BloomFilter(capacity=1000)
    keep = {f"k{i}" for i in range(0, 100, 2)}
    bf.add(sorted(keep))
    ref = ray.put(bf)

    def filt(t: pa.Table) -> pa.Table:
        b = ray.get(ref)
        mask = b.contains(np.asarray(t.column("k").to_pylist(), dtype=object))
        return t.filter(pa.array(mask))

    ds = rd.from_items([{"k": f"k{i}"} for i in range(100)])
    out = ds.map_batches(filt, batch_format="pyarrow").to_pandas()
    assert set(out["k"]) >= keep  # no false negatives


def test_context_save_load_roundtrip(ray_session, tmp_path):
    import ray

    from tenzir_ray.state import (
        ContextActor, context_inspect, context_load, context_save,
    )

    actor = ContextActor("persist_me")
    ray.get(actor.update.remote({"a": 1, "b": {"nested": True}, "c": "x"}))
    path = str(tmp_path / "ctx.parquet")
    assert context_save("persist_me", path) == 3

    actor2 = ContextActor("restored")
    assert ray.get(actor2.snapshot.remote()) == {}
    assert context_load("restored", path) == 3
    snap = ray.get(actor2.snapshot.remote())
    assert snap == {"a": 1, "b": {"nested": True}, "c": "x"}
    info = context_inspect("restored")
    assert info["entries"] == 3
