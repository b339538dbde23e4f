"""Message-queue connectors: ZMTP PUB/SUB, AMQP 0-9-1, SQS, Pub/Sub —
all protocol-level loopback tests, no brokers or network."""
import json
import threading

import pytest


def test_zmq_pub_sub_roundtrip(ray_session):
    import ray.data as rd

    from tenzir_ray.sources.mq import load_zmq, save_zmq

    port = _free_port()
    rows = [{"id": i, "kind": "a" if i % 2 else "b"} for i in range(12)]
    sent = {}

    def pub():
        sent["n"] = save_zmq(rd.from_items(rows),
                             f"tcp://127.0.0.1:{port}")

    th = threading.Thread(target=pub)
    th.start()
    mk = load_zmq(f"tcp://127.0.0.1:{port}", max_events=12,
                  idle_timeout=3.0)
    got = [json.loads(r["line"]) for r in mk().take_all()]
    th.join()
    assert sent["n"] == 12
    assert sorted(g["id"] for g in got) == list(range(12))


def test_zmq_subscribe_filter(ray_session):
    import ray.data as rd

    from tenzir_ray.sources.mq import load_zmq, save_zmq

    port = _free_port()
    # prefix-filterable payloads: the PUB side honors each subscriber's
    # announced prefix, so only "warn" lines arrive
    lines = [f"warn {i}" if i % 3 == 0 else f"info {i}" for i in range(9)]
    sent = {}

    def pub():
        sent["n"] = save_zmq(
            rd.from_items([{"s": l} for l in lines]),
            f"tcp://127.0.0.1:{port}",
            lines_fn=lambda rows: [r["s"] for r in rows])

    th = threading.Thread(target=pub)
    th.start()
    mk = load_zmq(f"tcp://127.0.0.1:{port}", filter=b"warn",
                  max_events=3, idle_timeout=3.0)
    got = [r["line"] for r in mk().take_all()]
    th.join()
    assert got == ["warn 0", "warn 3", "warn 6"]
    assert sent["n"] == 3  # info lines matched no subscriber


def test_zmq_multiple_subscriptions(ray_session):
    """A SUB peer announcing several prefixes gets messages matching ANY
    of them (save_zmq must collect every \\x01 frame, not just one)."""
    import socket

    import ray.data as rd

    from tenzir_ray.sources.mq import (
        _zmtp_greet, _zmtp_ready, _zmtp_recv_frame, _zmtp_send_frame,
        save_zmq,
    )

    port = _free_port()
    lines = ["warn 1", "info 2", "crit 3", "debug 4", "crit 5"]
    sent = {}

    def pub():
        sent["n"] = save_zmq(
            rd.from_items([{"s": l} for l in lines]),
            f"tcp://127.0.0.1:{port}",
            lines_fn=lambda rows: [r["s"] for r in rows])

    th = threading.Thread(target=pub)
    th.start()
    # hand-rolled SUB with two subscription prefixes
    import time

    for _ in range(50):
        try:
            cli = socket.create_connection(("127.0.0.1", port),
                                           timeout=2.0)
            break
        except OSError:
            time.sleep(0.1)
    cli.settimeout(3.0)
    _zmtp_greet(cli)
    _zmtp_ready(cli, "SUB")
    _zmtp_send_frame(cli, b"\x01warn")
    _zmtp_send_frame(cli, b"\x01crit")
    got = []
    try:
        while len(got) < 3:
            flags, msg = _zmtp_recv_frame(cli)
            if not flags & 0x04:
                got.append(msg.decode())
    finally:
        cli.close()
    th.join()
    assert got == ["warn 1", "crit 3", "crit 5"]
    assert sent["n"] == 3


def test_zmq_rejects_incompatible_socket_type():
    import socket
    import struct

    from tenzir_ray.sources.mq import (
        _zmtp_greet, _zmtp_ready, _zmtp_recv_frame, _zmtp_send_frame,
    )

    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]

    def peer():
        conn, _ = srv.accept()
        conn.settimeout(3.0)
        try:
            _zmtp_greet(conn)
            # claim to be a PULL socket — a SUB must refuse to talk to it
            name, val = b"Socket-Type", b"PULL"
            body = (b"\x05READY" + bytes([len(name)]) + name
                    + struct.pack(">I", len(val)) + val)
            _zmtp_send_frame(conn, body, command=True)
            _zmtp_recv_frame(conn)
        except (ConnectionError, OSError):
            pass
        finally:
            conn.close()
            srv.close()

    th = threading.Thread(target=peer)
    th.start()
    cli = socket.create_connection(("127.0.0.1", port), timeout=3.0)
    cli.settimeout(3.0)
    _zmtp_greet(cli)
    with pytest.raises(ConnectionError, match="cannot talk"):
        _zmtp_ready(cli, "SUB")
    cli.close()
    th.join()


def test_amqp_publish_consume_roundtrip(ray_session):
    import ray.data as rd

    from tenzir_ray.sources.mq import load_amqp, mini_amqp_broker, save_amqp

    _, port = mini_amqp_broker(max_connections=2)
    rows = [{"id": i, "v": i * i} for i in range(7)]

    # consumer first (declares + binds the queue), so publishes route
    got_box = {}

    def consume():
        mk = load_amqp(port=port, queue="q1", exchange="amq.direct",
                       routing_key="rk", max_events=7)
        got_box["rows"] = mk().take_all()

    th = threading.Thread(target=consume)
    th.start()
    import time

    time.sleep(0.3)  # let the consumer bind before publishing
    n = save_amqp(rd.from_items(rows), port=port,
                  exchange="amq.direct", routing_key="rk")
    th.join(timeout=10)
    assert n == 7
    got = [json.loads(r["line"]) for r in got_box["rows"]]
    assert sorted(g["id"] for g in got) == list(range(7))
    assert all(g["v"] == g["id"] ** 2 for g in got)


def test_amqp_backlog_then_consume(ray_session):
    """Messages published before any consumer exists queue up (default
    exchange routes by queue name) and flush on Basic.Consume."""
    import ray.data as rd

    from tenzir_ray.sources.mq import (
        AmqpClient, load_amqp, mini_amqp_broker, save_amqp,
    )

    _, port = mini_amqp_broker(max_connections=3)
    # pre-declare the queue so default-exchange routing has a target
    cli = AmqpClient(port=port)
    cli.queue_declare("backlog")
    cli.close()
    n = save_amqp(rd.from_items([{"m": i} for i in range(5)]), port=port,
                  exchange="", routing_key="backlog")
    assert n == 5
    # ask for MORE than the queue holds: the drain must return the
    # partial set after idle_timeout instead of blocking and losing
    # the no-ack'd messages
    mk = load_amqp(port=port, queue="backlog", exchange="",
                   routing_key="backlog", max_events=50,
                   idle_timeout=1.0)
    got = [json.loads(r["line"])["m"] for r in mk().take_all()]
    assert got == [0, 1, 2, 3, 4]  # FIFO preserved through the backlog


def _free_port() -> int:
    import socket

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


class _QueueStub:
    """Loopback HTTP double for SQS (x-amz-json-1.0 dispatch on
    X-Amz-Target) and Pub/Sub (REST :publish/:pull/:acknowledge)."""

    def __init__(self):
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        stub = self

        class H(BaseHTTPRequestHandler):
            def do_POST(self):
                body = self.rfile.read(int(self.headers["Content-Length"]))
                req = json.loads(body)
                target = self.headers.get("X-Amz-Target", "")
                if target.endswith("SendMessageBatch"):
                    stub.msgs.extend(e["MessageBody"]
                                     for e in req["Entries"])
                    out = {"Successful": [{"Id": e["Id"]}
                                          for e in req["Entries"]]}
                elif target.endswith("ReceiveMessage"):
                    cap = int(req.get("MaxNumberOfMessages", 10))
                    take, stub.msgs = stub.msgs[:cap], stub.msgs[cap:]
                    out = {"Messages": [
                        {"Body": m, "ReceiptHandle": f"rh-{i}"}
                        for i, m in enumerate(take)]} if take else {}
                elif target.endswith("DeleteMessageBatch"):
                    stub.deleted += len(req["Entries"])
                    out = {"Successful": [{"Id": e["Id"]}
                                          for e in req["Entries"]]}
                elif self.path.endswith(":publish"):
                    stub.msgs.extend(m["data"] for m in req["messages"])
                    out = {"messageIds": [str(i) for i in
                                          range(len(req["messages"]))]}
                elif self.path.endswith(":pull"):
                    cap = int(req.get("maxMessages", 100))
                    take, stub.msgs = stub.msgs[:cap], stub.msgs[cap:]
                    out = {"receivedMessages": [
                        {"ackId": f"a-{i}", "message": {"data": m}}
                        for i, m in enumerate(take)]} if take else {}
                elif self.path.endswith(":acknowledge"):
                    stub.deleted += len(req["ackIds"])
                    out = {}
                else:
                    self.send_error(404)
                    return
                payload = json.dumps(out).encode()
                self.send_response(200)
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)

            def log_message(self, *a):
                pass

        self.msgs: list[str] = []
        self.deleted = 0
        self.srv = ThreadingHTTPServer(("127.0.0.1", 0), H)
        self.port = self.srv.server_address[1]
        threading.Thread(target=self.srv.serve_forever,
                         daemon=True).start()

    def close(self):
        self.srv.shutdown()


def test_sqs_roundtrip(ray_session):
    import ray.data as rd

    from tenzir_ray.sources.mq import from_sqs, to_sqs

    stub = _QueueStub()
    try:
        url = f"http://127.0.0.1:{stub.port}/queue/test"
        rows = [{"id": i} for i in range(23)]
        n = to_sqs(rd.from_items(rows), url)
        assert n == 23 and len(stub.msgs) == 23
        # a capped take must NOT delete beyond what it returns
        # (ack-then-drop would violate at-least-once)
        mk5 = from_sqs(url, max_events=5, poll_time=0)
        first = mk5().take_all()
        assert len(first) == 5 and stub.deleted == 5
        assert len(stub.msgs) == 18  # the rest still queued
        mk = from_sqs(url, max_events=18, poll_time=0)
        rest = mk().take_all()
        got = sorted(json.loads(r["line"])["id"]
                     for r in first + rest)
        assert got == list(range(23))
        assert stub.deleted == 23  # delete-after-read honored
    finally:
        stub.close()


def test_pubsub_roundtrip(ray_session):
    import ray.data as rd

    from tenzir_ray.sources.mq import (
        from_google_cloud_pubsub, to_google_cloud_pubsub,
    )

    stub = _QueueStub()
    try:
        ep = f"http://127.0.0.1:{stub.port}"
        rows = [{"id": i, "s": f"m{i}"} for i in range(15)]
        n = to_google_cloud_pubsub(rd.from_items(rows), "proj", "topic",
                                   endpoint=ep)
        assert n == 15
        # capped pull must only ack what it returns
        part = from_google_cloud_pubsub("proj", "sub", endpoint=ep,
                                        max_events=4)().take_all()
        assert len(part) == 4 and stub.deleted == 4
        mk = from_google_cloud_pubsub("proj", "sub", endpoint=ep,
                                      max_events=15)
        got = sorted(json.loads(r["line"])["id"]
                     for r in part + mk().take_all())
        assert got == list(range(15))
        assert stub.deleted == 15  # every pull acknowledged
    finally:
        stub.close()
