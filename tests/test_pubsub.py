"""publish/subscribe named topics."""

import ray.data as rd

from tenzir_ray.stages.pubsub import publish, subscribe


def test_publish_subscribe_roundtrip(ray_session):
    ds = rd.from_items([{"i": i} for i in range(100)]).repartition(4)
    seq = publish(ds, "topic_a")
    assert seq >= 1
    got, nxt = subscribe("topic_a")
    assert sorted(r["i"] for r in got.take_all()) == list(range(100))

    # incremental: publish more, read only the new events from the cursor
    publish(rd.from_items([{"i": 100}]), "topic_a")
    fresh, nxt2 = subscribe("topic_a", from_seq=nxt)
    assert [r["i"] for r in fresh.take_all()] == [100]
    assert nxt2 == nxt + 1

    empty, nxt3 = subscribe("topic_a", from_seq=nxt2)
    assert empty.count() == 0 and nxt3 == nxt2


def test_topics_are_isolated(ray_session):
    publish(rd.from_items([{"x": 1}]), "topic_b1")
    publish(rd.from_items([{"x": 2}]), "topic_b2")
    a, _ = subscribe("topic_b1")
    b, _ = subscribe("topic_b2")
    assert [r["x"] for r in a.take_all()] == [1]
    assert [r["x"] for r in b.take_all()] == [2]


def test_topic_stores_refs_and_evicts(ray_session):
    """The topic actor holds ObjectRefs (blocks never enter its heap or
    cross the driver) and evicts oldest blocks beyond retention."""
    import ray

    from tenzir_ray.stages.pubsub import _topic_actor

    actor = _topic_actor("topic_refs", retention=5)
    for i in range(8):
        publish(rd.from_items([{"i": i}]), "topic_refs")
    wrapped, next_seq, base = ray.get(actor.read.remote(0))
    refs = wrapped[0]
    assert all(isinstance(r, ray.ObjectRef) for r in refs)
    assert len(refs) == 5 and base == 3 and next_seq == 8
    # a cursor that predates retention must FAIL LOUDLY (review r05):
    # the reader re-subscribes from err.base_seq to accept the gap
    import pytest

    with pytest.raises(LookupError) as ei:
        subscribe("topic_refs")
    assert ei.value.base_seq == 3
    got, nxt = subscribe("topic_refs", ei.value.base_seq)
    assert nxt == 8
    assert sorted(r["i"] for r in got.take_all()) == [3, 4, 5, 6, 7]
