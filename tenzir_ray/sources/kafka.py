"""Kafka connector: wire-protocol client + in-repo loopback broker.

Reference surface: ``plugins/kafka`` (``load_kafka``/``save_kafka`` —
topic, ``offset`` = beginning/end/int, count-bounded drains;
``plugin.cpp:55-65`` offset semantics). The reference links librdkafka;
none is available here, so the PUBLIC Kafka protocol
(https://kafka.apache.org/protocol) is implemented directly:

* classic framing — ``INT32`` size prefix, request header v1
  (api_key, api_version, correlation_id, nullable client_id string),
* **record batch v2** (magic=2) exactly as on the wire: CRC32C
  (Castagnoli, table-driven) over the post-crc region, zigzag varint
  record bodies (timestampDelta/offsetDelta/key/value/headers),
* ``Produce`` v3, ``Fetch`` v4, ``ListOffsets`` v1.

:func:`mini_kafka_broker` is the broker-side dual — an in-memory
(topic, partition) → log server speaking the same frames — so the client
is protocol-tested offline end-to-end (same loopback-double approach as
``mini_amqp_broker`` / ``load_http_server``). Single broker, partition
leadership is trivially local, so ``Metadata`` discovery is unnecessary
and deliberately omitted.

Scale notes: :func:`save_kafka` is DISTRIBUTED — every block opens its
own producer connection from the worker that holds it (Kafka's design
point: many producers, partitioned log) and only ack counts reach the
driver. :func:`load_kafka` is a driver-edge drain like ``load_tcp``:
one consumer = one partition cursor; the scale path fans out one
``load_kafka`` per partition into the WAL tailer (``cdc/wal.py``), which
is exactly the reference's kafka→import deployment shape.
"""
from __future__ import annotations

import struct
import threading

import pyarrow as pa

from tenzir_ray.sources.mq import _recv_exact

# ------------------------------------------------------------------ CRC32C


def _crc32c_tables() -> list[list[int]]:
    """Slicing-by-8 tables (the public technique from Intel's CRC
    paper, as in zlib/kernel implementations): table[0] is the classic
    byte table; table[k][b] pre-advances b by k more zero bytes."""
    poly = 0x82F63B78  # Castagnoli, reflected
    t0 = []
    for i in range(256):
        crc = i
        for _ in range(8):
            crc = (crc >> 1) ^ poly if crc & 1 else crc >> 1
        t0.append(crc)
    tables = [t0]
    for k in range(1, 8):
        prev = tables[k - 1]
        tables.append([(prev[i] >> 8) ^ t0[prev[i] & 0xFF]
                       for i in range(256)])
    return tables


_T = _crc32c_tables()


def crc32c(data: bytes) -> int:
    """CRC32C via slicing-by-8: one loop iteration per 8 input bytes.
    Pure Python is the floor this container allows (no C crc32c
    module); a production build would swap in a compiled kernel."""
    crc = 0xFFFFFFFF
    n8 = len(data) & ~7
    t0, t1, t2, t3, t4, t5, t6, t7 = _T  # t_k = k extra-byte advances
    for i in range(0, n8, 8):
        w = crc ^ int.from_bytes(data[i:i + 4], "little")
        crc = (t7[w & 0xFF] ^ t6[(w >> 8) & 0xFF]
               ^ t5[(w >> 16) & 0xFF] ^ t4[(w >> 24) & 0xFF]
               ^ t3[data[i + 4]] ^ t2[data[i + 5]]
               ^ t1[data[i + 6]] ^ t0[data[i + 7]])
    for b in data[n8:]:
        crc = (crc >> 8) ^ t0[(crc ^ b) & 0xFF]
    return crc ^ 0xFFFFFFFF


# ------------------------------------------------------- varint / zigzag


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _put_varint(out: bytearray, n: int) -> None:
    n = _zigzag(n) & 0xFFFFFFFFFFFFFFFF
    while n >= 0x80:
        out.append((n & 0x7F) | 0x80)
        n >>= 7
    out.append(n)


def _get_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = val = 0
    while True:
        b = buf[pos]
        pos += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return _unzigzag(val), pos
        shift += 7


# ------------------------------------------------- record batch v2 codec


def encode_record_batch(records: list[tuple[bytes | None, bytes]],
                        base_offset: int = 0,
                        first_timestamp: int = 0) -> bytes:
    """Record batch v2: header (61 bytes) + varint-coded records;
    crc = CRC32C(attributes..records), batchLength counts from
    partitionLeaderEpoch."""
    body = bytearray()
    for i, (key, value) in enumerate(records):
        rec = bytearray()
        rec.append(0)  # record attributes
        _put_varint(rec, 0)  # timestampDelta
        _put_varint(rec, i)  # offsetDelta
        if key is None:
            _put_varint(rec, -1)
        else:
            _put_varint(rec, len(key))
            rec += key
        _put_varint(rec, len(value))
        rec += value
        _put_varint(rec, 0)  # headers count
        _put_varint(body, len(rec))
        body += rec
    n = len(records)
    post_crc = (struct.pack(">hiqqqhiI", 0, n - 1, first_timestamp,
                            first_timestamp, -1, -1, -1, n)
                + bytes(body))
    # fields: attributes(2)=0 lastOffsetDelta(4) firstTs(8) maxTs(8)
    #         producerId(8)=-1 producerEpoch(2)=-1 baseSequence(4)=-1
    #         recordCount(4)
    crc = crc32c(post_crc)
    inner = struct.pack(">iBI", 0, 2, crc) + post_crc
    # partitionLeaderEpoch(4)=0 magic(1)=2 crc(4)
    return struct.pack(">qi", base_offset, len(inner)) + inner


def decode_record_batches(buf: bytes) -> list[tuple[int, bytes | None,
                                                    bytes]]:
    """Decode a concatenation of v2 record batches into
    ``(offset, key, value)`` triples, verifying each CRC32C."""
    out: list[tuple[int, bytes | None, bytes]] = []
    pos = 0
    while pos + 12 <= len(buf):
        base_offset, batch_len = struct.unpack_from(">qi", buf, pos)
        pos += 12
        batch = buf[pos:pos + batch_len]
        pos += batch_len
        if len(batch) < batch_len:
            break  # Fetch may truncate the final batch — spec-legal
        _, magic, crc = struct.unpack_from(">iBI", batch, 0)
        if magic != 2:
            raise ValueError(f"record batch magic {magic} != 2")
        if crc32c(batch[9:]) != crc:
            raise ValueError("record batch CRC32C mismatch")
        count = struct.unpack_from(">I", batch, 9 + 36)[0]
        rpos = 9 + 40
        for _ in range(count):
            rlen, rpos = _get_varint(batch, rpos)
            rend = rpos + rlen
            p = rpos + 1  # skip record attributes
            _, p = _get_varint(batch, p)  # timestampDelta
            odelta, p = _get_varint(batch, p)
            klen, p = _get_varint(batch, p)
            key = None if klen < 0 else bytes(batch[p:p + klen])
            p += max(klen, 0)
            vlen, p = _get_varint(batch, p)
            value = bytes(batch[p:p + vlen])
            out.append((base_offset + odelta, key, value))
            rpos = rend
    return out


# ------------------------------------------------------- protocol client


def _kstr(s: str | None) -> bytes:
    if s is None:
        return struct.pack(">h", -1)
    b = s.encode()
    return struct.pack(">h", len(b)) + b


def _kbytes(b: bytes | None) -> bytes:
    if b is None:
        return struct.pack(">i", -1)
    return struct.pack(">i", len(b)) + b


def _read_kstr(buf: bytes, pos: int) -> tuple[str, int]:
    n = struct.unpack_from(">h", buf, pos)[0]
    pos += 2
    if n < 0:
        return "", pos
    return buf[pos:pos + n].decode(), pos + n


class KafkaClient:
    """Minimal synchronous Kafka client: Produce v3 / Fetch v4 /
    ListOffsets v1 over classic INT32-framed requests. One connection,
    correlation-checked responses."""

    API_PRODUCE, API_FETCH, API_LIST_OFFSETS = 0, 1, 2

    def __init__(self, host: str = "127.0.0.1", port: int = 9092, *,
                 client_id: str = "tenzir-ray", timeout: float = 10.0):
        import socket as _socket

        self.sock = _socket.create_connection((host, port), timeout=timeout)
        self.client_id = client_id
        self._corr = 0

    def _call(self, api_key: int, api_version: int, body: bytes) -> bytes:
        self._corr += 1
        header = (struct.pack(">hhi", api_key, api_version, self._corr)
                  + _kstr(self.client_id))
        msg = header + body
        self.sock.sendall(struct.pack(">i", len(msg)) + msg)
        size = struct.unpack(">i", _recv_exact(self.sock, 4))[0]
        resp = _recv_exact(self.sock, size)
        corr = struct.unpack_from(">i", resp, 0)[0]
        if corr != self._corr:
            raise ConnectionError(f"kafka: correlation {corr} != "
                                  f"{self._corr}")
        return resp[4:]

    def produce(self, topic: str, partition: int,
                records: list[tuple[bytes | None, bytes]],
                acks: int = -1) -> int:
        """Produce v3 (one topic, one partition). Returns base_offset."""
        batch = encode_record_batch(records)
        body = (_kstr(None)  # transactional_id
                + struct.pack(">hi", acks, 30000)
                + struct.pack(">i", 1) + _kstr(topic)
                + struct.pack(">i", 1) + struct.pack(">i", partition)
                + _kbytes(batch))
        resp = self._call(self.API_PRODUCE, 3, body)
        pos = 4  # topic array count
        _, pos = _read_kstr(resp, pos)
        pos += 4  # partition array count
        _, err, base = struct.unpack_from(">ihq", resp, pos)
        if err:
            raise RuntimeError(f"kafka produce error {err}")
        return base

    def fetch(self, topic: str, partition: int, offset: int, *,
              max_wait_ms: int = 500, max_bytes: int = 8 << 20
              ) -> list[tuple[int, bytes | None, bytes]]:
        """Fetch v4: returns decoded ``(offset, key, value)`` from
        ``offset`` onward (empty when caught up)."""
        body = (struct.pack(">iiiiB", -1, max_wait_ms, 1, max_bytes, 0)
                + struct.pack(">i", 1) + _kstr(topic)
                + struct.pack(">i", 1)
                + struct.pack(">iqi", partition, offset, max_bytes))
        resp = self._call(self.API_FETCH, 4, body)
        pos = 4 + 4  # throttle + topic count
        _, pos = _read_kstr(resp, pos)
        pos += 4  # partition count
        _, err, _hw, _lso = struct.unpack_from(">ihqq", resp, pos)
        pos += 4 + 2 + 8 + 8
        naborted = struct.unpack_from(">i", resp, pos)[0]
        pos += 4 + max(naborted, 0) * 16  # producerId(8) + firstOffset(8)
        if err:
            raise RuntimeError(f"kafka fetch error {err}")
        rlen = struct.unpack_from(">i", resp, pos)[0]
        pos += 4
        records = resp[pos:pos + max(rlen, 0)]
        return [r for r in decode_record_batches(records)
                if r[0] >= offset]

    def list_offsets(self, topic: str, partition: int,
                     timestamp: int) -> int:
        """ListOffsets v1: ``timestamp`` -2 = beginning, -1 = end."""
        body = (struct.pack(">i", -1)
                + struct.pack(">i", 1) + _kstr(topic)
                + struct.pack(">i", 1)
                + struct.pack(">iq", partition, timestamp))
        resp = self._call(self.API_LIST_OFFSETS, 1, body)
        pos = 4
        _, pos = _read_kstr(resp, pos)
        pos += 4
        _, err, _ts, off = struct.unpack_from(">ihqq", resp, pos)
        if err:
            raise RuntimeError(f"kafka list_offsets error {err}")
        return off

    def close(self) -> None:
        self.sock.close()


# -------------------------------------------------------- loopback broker


def mini_kafka_broker(host: str = "127.0.0.1", port: int = 0):
    """In-repo single-node Kafka broker for offline protocol tests:
    in-memory ``(topic, partition) → [(key, value)]`` logs, offsets are
    list indices. Decodes produced batches (CRC-verified) and re-encodes
    on fetch, so the record-batch codec is exercised on both directions
    of every round-trip. Returns ``(thread, bound_port)``."""
    import socket as _socket

    srv = _socket.socket(_socket.AF_INET, _socket.SOCK_STREAM)
    srv.setsockopt(_socket.SOL_SOCKET, _socket.SO_REUSEADDR, 1)
    srv.bind((host, port))
    srv.listen(128)
    bound = srv.getsockname()[1]

    lock = threading.Lock()
    logs: dict[tuple[str, int], list[tuple[bytes | None, bytes]]] = {}

    def handle(conn) -> None:
        try:
            while True:
                size = struct.unpack(">i", _recv_exact(conn, 4))[0]
                req = _recv_exact(conn, size)
                api, ver, corr = struct.unpack_from(">hhi", req, 0)
                pos = 8
                _, pos = _read_kstr(req, pos)  # client_id
                if api == KafkaClient.API_PRODUCE:
                    pos += 2 + 2 + 4 + 4  # txn-id(null) acks timeout ntopics
                    topic, pos = _read_kstr(req, pos)
                    pos += 4  # npartitions
                    partition = struct.unpack_from(">i", req, pos)[0]
                    pos += 4
                    blen = struct.unpack_from(">i", req, pos)[0]
                    pos += 4
                    recs = decode_record_batches(req[pos:pos + blen])
                    with lock:
                        log = logs.setdefault((topic, partition), [])
                        base = len(log)
                        log.extend((k, v) for _, k, v in recs)
                    body = (struct.pack(">i", 1) + _kstr(topic)
                            + struct.pack(">i", 1)
                            + struct.pack(">ihqq", partition, 0, base, -1)
                            + struct.pack(">i", 0))  # throttle
                elif api == KafkaClient.API_FETCH:
                    pos += 4 + 4 + 4 + 4 + 1 + 4  # replica..isolation ntop
                    topic, pos = _read_kstr(req, pos)
                    pos += 4
                    partition, offset, _mb = struct.unpack_from(
                        ">iqi", req, pos)
                    with lock:
                        log = list(logs.get((topic, partition), []))
                    chunk = log[offset:offset + 10_000]
                    records = (encode_record_batch(chunk, offset)
                               if chunk else b"")
                    body = (struct.pack(">i", 0)  # throttle
                            + struct.pack(">i", 1) + _kstr(topic)
                            + struct.pack(">i", 1)
                            + struct.pack(">ihqq", partition, 0,
                                          len(log), len(log))
                            + struct.pack(">i", 0)  # aborted txns
                            + _kbytes(records))
                elif api == KafkaClient.API_LIST_OFFSETS:
                    pos += 4 + 4  # replica_id ntopics
                    topic, pos = _read_kstr(req, pos)
                    pos += 4
                    partition, ts = struct.unpack_from(">iq", req, pos)
                    with lock:
                        n = len(logs.get((topic, partition), []))
                    off = 0 if ts == -2 else n
                    body = (struct.pack(">i", 1) + _kstr(topic)
                            + struct.pack(">i", 1)
                            + struct.pack(">ihqq", partition, 0, -1, off))
                else:
                    body = struct.pack(">h", 35)  # UNSUPPORTED_VERSION
                resp = struct.pack(">i", corr) + body
                conn.sendall(struct.pack(">i", len(resp)) + resp)
        except (ConnectionError, OSError, struct.error):
            pass
        finally:
            conn.close()

    def accept_loop() -> None:
        # accept until the process exits (daemon thread) — a distributed
        # save_kafka opens one producer connection PER BLOCK, so any
        # fixed accept budget would refuse late blocks
        try:
            while True:
                conn, _ = srv.accept()
                threading.Thread(target=handle, args=(conn,),
                                 daemon=True).start()
        except OSError:
            pass

    th = threading.Thread(target=accept_loop, daemon=True)
    th.start()
    return th, bound


# ---------------------------------------------------- dataset-level ops


def save_kafka(ds, topic: str, *, host: str = "127.0.0.1",
               port: int = 9092, partition_by=None, partitions: int = 1,
               key_col: str | None = None, lines_fn=None,
               records_per_batch: int = 5000) -> int:
    """Kafka sink (reference ``save_kafka``): DISTRIBUTED — each block
    opens a producer connection on the worker holding it and produces
    one v2 record batch per block-partition slice; only ack counts reach
    the driver. Messages are NDJSON rows unless ``lines_fn`` overrides;
    record keys come from ``key_col`` (→ hash-partitioned by key when
    ``partitions > 1``, Kafka's default partitioner semantics)."""
    import json as _json
    import zlib as _zlib

    import pyarrow.compute as _pc

    def _send(t: pa.Table) -> pa.Table:
        rows = t.to_pylist()
        if not rows:
            return pa.table({"docs": pa.array([0], pa.int64())})
        if lines_fn is not None:
            values = [v.encode() if isinstance(v, str) else v
                      for v in lines_fn(rows)]
        else:
            values = [_json.dumps(r, default=str).encode() for r in rows]
        keys = [str(r[key_col]).encode() if key_col else None
                for r in rows]
        by_part: dict[int, list[tuple[bytes | None, bytes]]] = {}
        for k, v in zip(keys, values):
            p = (_zlib.crc32(k) % partitions) if (k and partitions > 1) \
                else 0
            by_part.setdefault(p, []).append((k, v))
        cli = KafkaClient(host, port)
        try:
            for p, recs in sorted(by_part.items()):
                # cap each Produce request (brokers enforce
                # max.request.size ≈1 MiB; real producers batch-split)
                for i in range(0, len(recs), records_per_batch):
                    cli.produce(topic, p, recs[i:i + records_per_batch])
        finally:
            cli.close()
        return pa.table({"docs": pa.array([len(rows)], pa.int64())})

    acks = ds.map_batches(_send, batch_format="pyarrow").materialize()
    return sum(int(_pc.sum(b.column("docs")).as_py() or 0)
               for b in acks.iter_batches(batch_format="pyarrow"))


def load_kafka(topic: str, *, host: str = "127.0.0.1", port: int = 9092,
               partition: int = 0, offset: int | str = "beginning",
               max_events: int = 100_000, max_wait_ms: int = 500,
               offset_store: str | None = None):
    """Kafka source (reference ``load_kafka`` — ``plugin.cpp:55-65``
    offset semantics: ``beginning``/``end``/``store``/absolute int).
    Finite-drain thunk over one partition cursor, returning a Dataset
    with ``line`` (value), ``key`` and ``offset`` columns. Fan out one
    call per partition for the multi-partition scale path.

    ``offset="store"`` resumes from the committed cursor in
    ``offset_store`` (a JSON file keyed by topic/partition — the
    at-least-once commit-after-drain analog of librdkafka's stored
    consumer offsets and of the lake's manifest offsets; written
    atomically AFTER the drain, so a crash replays, never skips)."""
    import json as _json
    import os as _os

    import ray.data as rd

    store_key = f"{topic}/{partition}"

    def drain():
        cli = KafkaClient(host, port)
        try:
            if offset == "store":
                if offset_store is None:
                    raise ValueError(
                        "load_kafka: offset='store' needs offset_store=")
                committed = {}
                if _os.path.exists(offset_store):
                    with open(offset_store) as fh:
                        committed = _json.load(fh)
                cur = int(committed.get(store_key, 0))
            elif offset == "beginning":
                cur = cli.list_offsets(topic, partition, -2)
            elif offset == "end":
                cur = cli.list_offsets(topic, partition, -1)
            else:
                cur = int(offset)
            out = []
            while len(out) < max_events:
                recs = cli.fetch(topic, partition, cur,
                                 max_wait_ms=max_wait_ms)
                if not recs:
                    break
                for off, key, value in recs:
                    out.append({
                        "line": value.decode(errors="replace"),
                        "key": key.decode(errors="replace") if key
                        else None,
                        "offset": off})
                cur = recs[-1][0] + 1
        finally:
            cli.close()
        if offset == "store":
            # commit AFTER the drain (at-least-once): tmp + rename is
            # atomic, a crash before this point replays the window
            committed = {}
            if _os.path.exists(offset_store):
                with open(offset_store) as fh:
                    committed = _json.load(fh)
            committed[store_key] = cur
            tmp = offset_store + ".tmp"
            with open(tmp, "w") as fh:
                _json.dump(committed, fh)
            _os.replace(tmp, offset_store)
        return rd.from_items(out[:max_events])

    return drain
