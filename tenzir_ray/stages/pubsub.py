"""publish / subscribe (reference operators/publish.cpp,
subscribe.cpp: named in-process topics connecting pipelines).

A named detached Ray actor buffers published blocks per topic;
``subscribe`` drains from a sequence number (batch semantics — one
finished read per call, with the cursor for the next; the reference's
endless-stream form maps to polling ``subscribe`` like ``Lake.follow``
polls the WAL)."""

from __future__ import annotations

import pyarrow as pa


class _Topic:
    def __init__(self):
        self.blocks: list[pa.Table] = []

    def append(self, t: pa.Table) -> int:
        self.blocks.append(t)
        return len(self.blocks)

    def read(self, from_seq: int = 0) -> tuple[list[pa.Table], int]:
        return self.blocks[from_seq:], len(self.blocks)

    def size(self) -> int:
        return len(self.blocks)


def _topic_actor(topic: str):
    import ray

    name = f"tenzir_ray_topic::{topic}"
    try:
        return ray.get_actor(name)
    except ValueError:
        # detached: the topic must outlive the publishing pipeline's
        # actor handle (named non-detached actors die when the last
        # handle drops)
        return (ray.remote(_Topic)
                .options(name=name, lifetime="detached",
                         get_if_exists=True)
                .remote())


def publish(ds, topic: str) -> int:
    """Publish a Dataset's blocks to the named topic; returns the topic
    sequence number after the append. Blocks stream to the actor as the
    dataset executes (driver touches refs only)."""
    import ray

    actor = _topic_actor(topic)
    seq = 0
    for bundle in ds.iter_internal_ref_bundles():
        for ref in bundle.block_refs:
            seq = ray.get(actor.append.remote(ref))
    return seq


def subscribe(topic: str, from_seq: int = 0):
    """Read the topic's buffered events from ``from_seq``; returns
    ``(dataset, next_seq)`` — pass ``next_seq`` back in to poll for new
    events only."""
    import ray
    import ray.data as rd

    actor = _topic_actor(topic)
    blocks, next_seq = ray.get(actor.read.remote(from_seq))
    if not blocks:
        return rd.from_items([]).limit(0), next_seq
    return rd.from_arrow_refs([ray.put(b) for b in blocks]), next_seq
