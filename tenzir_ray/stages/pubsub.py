"""publish / subscribe (reference operators/publish.cpp,
subscribe.cpp: named in-process topics connecting pipelines).

A named detached Ray actor buffers published blocks per topic as
actor-OWNED object refs: each block ships plasma→actor once and is
re-``ray.put`` so its owner is the detached actor — published data
outlives the publishing driver (refs owned by that driver would die
with it), lives in the object store (shared memory, spillable), is
never retained in the actor heap, and never crosses the driver on
either side. A retention cap bounds the buffer; the oldest blocks are
evicted Kafka-style and ``read`` answers from the trimmed base.

``subscribe`` drains from a sequence number (batch semantics — one
finished read per call, with the cursor for the next; the reference's
endless-stream form maps to polling ``subscribe`` like ``Lake.follow``
polls the WAL)."""

from __future__ import annotations

#: Default per-topic retention (blocks). Oldest evicted beyond this.
TOPIC_RETENTION = 4096


class _Topic:
    def __init__(self, retention: int = TOPIC_RETENTION):
        self.refs: list = []       # actor-OWNED ObjectRefs
        self.base_seq = 0          # seq of refs[0] after eviction
        self.retention = retention

    def append(self, block) -> int:
        """Receives the block value (plasma → here, no driver hop) and
        re-puts it so the OBJECT'S OWNER IS THIS ACTOR: a detached topic
        must outlive the publishing driver, and refs owned by that
        driver would die with it (OwnerDiedError on later subscribes).
        The block transits this heap once and lives on in the object
        store; eviction here releases it."""
        import ray

        self.refs.append(ray.put(block))
        if len(self.refs) > self.retention:
            drop = len(self.refs) - self.retention
            del self.refs[:drop]
            self.base_seq += drop
        return self.base_seq + len(self.refs)

    def read(self, from_seq: int = 0) -> tuple[list, int, int]:
        """→ (wrapped refs from ``max(from_seq, base_seq)``, next_seq,
        base_seq). ``from_seq < base_seq`` means the reader missed
        evicted blocks (it can detect the gap via base_seq)."""
        start = max(0, from_seq - self.base_seq)
        return ([self.refs[start:]], self.base_seq + len(self.refs),
                self.base_seq)

    def size(self) -> int:
        return len(self.refs)


def _topic_actor(topic: str, retention: int = TOPIC_RETENTION):
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
                .remote(retention))


def publish(ds, topic: str) -> int:
    """Publish a Dataset's block REFS to the named topic; returns the
    topic sequence number after the append. Blocks never leave the
    object store — the actor and the driver only handle refs."""
    import ray

    actor = _topic_actor(topic)
    seq = 0
    for bundle in ds.iter_internal_ref_bundles():
        for ref in bundle.block_refs:
            # bare ref → Ray ships the block plasma→actor directly;
            # the actor re-puts it under its own ownership
            seq = ray.get(actor.append.remote(ref))
    return seq


def subscribe(topic: str, from_seq: int = 0):
    """Read the topic's buffered events from ``from_seq``; returns
    ``(dataset, next_seq)`` — pass ``next_seq`` back in to poll for new
    events only. The dataset is built directly over the topic's block
    refs: zero driver-side copies.

    Raises ``LookupError`` when ``from_seq`` predates the retention
    window (events were evicted before this reader polled) — a slow
    consumer must learn about the gap instead of silently skipping it;
    catch it and re-subscribe from the error's ``.base_seq`` to accept
    the loss explicitly."""
    import ray
    import ray.data as rd

    actor = _topic_actor(topic)
    wrapped, next_seq, base = ray.get(actor.read.remote(from_seq))
    if from_seq < base:
        err = LookupError(
            f"subscribe({topic!r}, {from_seq}): events "
            f"[{from_seq}, {base}) were evicted by retention; "
            f"re-subscribe from {base} to accept the gap")
        err.base_seq = base
        raise err
    refs = wrapped[0]
    if not refs:
        return rd.from_items([]).limit(0), next_seq
    return rd.from_arrow_refs(list(refs)), next_seq
