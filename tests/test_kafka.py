"""Kafka wire-protocol connector: record-batch codec, client↔broker
round-trips, distributed produce, offset semantics — all loopback."""
import json

import pytest


def test_crc32c_known_vectors():
    from tenzir_ray.sources.kafka import crc32c

    # RFC 3720 §B.4 test vectors for CRC32C
    assert crc32c(b"") == 0
    assert crc32c(b"\x00" * 32) == 0x8A9136AA
    assert crc32c(b"\xff" * 32) == 0x62A8AB43
    assert crc32c(bytes(range(32))) == 0x46DD794E
    assert crc32c(b"123456789") == 0xE3069283


def test_record_batch_codec_roundtrip():
    from tenzir_ray.sources.kafka import (
        decode_record_batches, encode_record_batch,
    )

    recs = [(b"k0", b"v0"), (None, b"no-key"),
            (b"k2", b"x" * 300), (b"", b"")]
    buf = encode_record_batch(recs, base_offset=17)
    got = decode_record_batches(buf)
    assert [(o, k, v) for o, k, v in got] == [
        (17, b"k0", b"v0"), (18, None, b"no-key"),
        (19, b"k2", b"x" * 300), (20, b"", b"")]
    # two concatenated batches decode as one stream (Fetch returns this)
    buf2 = buf + encode_record_batch([(b"k", b"later")], base_offset=21)
    assert decode_record_batches(buf2)[-1] == (21, b"k", b"later")


def test_record_batch_crc_is_verified():
    from tenzir_ray.sources.kafka import (
        decode_record_batches, encode_record_batch,
    )

    buf = bytearray(encode_record_batch([(b"k", b"value")]))
    buf[-1] ^= 0xFF  # corrupt the payload under the CRC
    with pytest.raises(ValueError, match="CRC32C"):
        decode_record_batches(bytes(buf))


def test_kafka_produce_fetch_roundtrip():
    from tenzir_ray.sources.kafka import KafkaClient, mini_kafka_broker

    _, port = mini_kafka_broker()
    cli = KafkaClient(port=port)
    try:
        base = cli.produce("t", 0, [(b"a", b"1"), (b"b", b"2")])
        assert base == 0
        base2 = cli.produce("t", 0, [(None, b"3")])
        assert base2 == 2  # broker assigns consecutive offsets
        got = cli.fetch("t", 0, 0)
        assert [(o, v) for o, _, v in got] == [(0, b"1"), (1, b"2"),
                                               (2, b"3")]
        # resume from a cursor mid-log
        assert [v for _, _, v in cli.fetch("t", 0, 2)] == [b"3"]
        assert cli.fetch("t", 0, 3) == []  # caught up
        assert cli.list_offsets("t", 0, -2) == 0  # beginning
        assert cli.list_offsets("t", 0, -1) == 3  # end
    finally:
        cli.close()


def test_save_load_kafka_distributed(ray_session):
    import ray.data as rd

    from tenzir_ray.sources.kafka import load_kafka, save_kafka

    _, port = mini_broker()
    rows = [{"id": i, "v": i * 3} for i in range(40)]
    # several blocks → several producer connections (the distributed path)
    ds = rd.from_items(rows).repartition(4)
    n = save_kafka(ds, "events", port=port, key_col="id")
    assert n == 40
    got = load_kafka("events", port=port, offset="beginning")().take_all()
    parsed = sorted(json.loads(r["line"])["id"] for r in got)
    assert parsed == list(range(40))
    assert {r["key"] for r in got} == {str(i) for i in range(40)}
    # offset="end" sees nothing; an absolute offset resumes mid-stream
    assert load_kafka("events", port=port, offset="end")().count() == 0
    tail = load_kafka("events", port=port, offset=38)().take_all()
    assert len(tail) == 2 and sorted(r["offset"] for r in tail) == [38, 39]


def test_save_kafka_key_partitioning(ray_session):
    import ray.data as rd

    from tenzir_ray.sources.kafka import load_kafka, save_kafka

    _, port = mini_broker()
    rows = [{"k": f"user-{i % 5}", "n": i} for i in range(30)]
    save_kafka(rd.from_items(rows), "p", port=port, key_col="k",
               partitions=3)
    per_part = [load_kafka("p", port=port, partition=p)().take_all()
                for p in range(3)]
    assert sum(len(p) for p in per_part) == 30
    # same key always lands in the same partition (hash partitioner)
    for recs in per_part:
        for r in recs:
            keys_here = {x["key"] for x in recs}
            assert r["key"] in keys_here
    seen = {}
    for p, recs in enumerate(per_part):
        for r in recs:
            assert seen.setdefault(r["key"], p) == p


def mini_broker():
    from tenzir_ray.sources.kafka import mini_kafka_broker

    return mini_kafka_broker()


def test_open_uri_kafka_and_zmq_schemes(ray_session):
    """from-style scheme dispatch (reference load_properties schemes):
    kafka://host:port/topic?offset=... and zmq://host:port?filter=..."""
    import threading

    import ray.data as rd

    from tenzir_ray.sources.formats import open_uri
    from tenzir_ray.sources.kafka import save_kafka
    from tenzir_ray.sources.mq import save_zmq

    _, port = mini_broker()
    save_kafka(rd.from_items([{"m": i} for i in range(9)]), "t",
               port=port)
    ds = open_uri(f"kafka://127.0.0.1:{port}/t?offset=beginning")
    assert ds.count() == 9
    assert open_uri(
        f"kafka://127.0.0.1:{port}/t?offset=3").count() == 6

    import socket

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    zport = s.getsockname()[1]
    s.close()

    def pub():
        save_zmq(rd.from_items([{"s": f"x{i}"} for i in range(4)]),
                 f"tcp://127.0.0.1:{zport}",
                 lines_fn=lambda rows: [r["s"] for r in rows])

    th = threading.Thread(target=pub)
    th.start()
    got = open_uri(f"zmq://127.0.0.1:{zport}", max_events=4,
                   idle_timeout=3.0)
    n = got.count()
    th.join()
    assert n == 4


def test_load_kafka_offset_store(ray_session, tmp_path):
    """offset='store' (plugin.cpp:55-65 'store' mode): resume from the
    committed cursor, commit-after-drain (at-least-once)."""
    import ray.data as rd

    from tenzir_ray.sources.kafka import load_kafka, save_kafka

    _, port = mini_broker()
    store = str(tmp_path / "offsets.json")
    save_kafka(rd.from_items([{"m": i} for i in range(6)]), "t",
               port=port)
    first = load_kafka("t", port=port, offset="store",
                       offset_store=store)().take_all()
    assert sorted(r["offset"] for r in first) == list(range(6))
    # nothing new → empty, cursor unchanged
    assert load_kafka("t", port=port, offset="store",
                      offset_store=store)().count() == 0
    # new messages resume exactly after the committed cursor
    save_kafka(rd.from_items([{"m": 99}]), "t", port=port)
    nxt = load_kafka("t", port=port, offset="store",
                     offset_store=store)().take_all()
    assert [r["offset"] for r in nxt] == [6]
