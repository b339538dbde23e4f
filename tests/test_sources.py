"""Format readers and line parsers."""

import json
import os

import pyarrow as pa
import ray.data as rd

from tenzir_ray.sources import (
    open_uri,
    parse_cef_batch,
    parse_kv_batch,
    parse_syslog_batch,
)


def test_open_uri_dispatch(tmp_path):
    p = tmp_path / "x.ndjson"
    p.write_text('{"a": 1}\n{"a": 2}\n')
    assert sorted(open_uri(str(p)).to_pandas()["a"]) == [1, 2]
    c = tmp_path / "y.csv"
    c.write_text("a,b\n1,x\n2,y\n")
    assert sorted(open_uri(str(c)).to_pandas()["b"]) == ["x", "y"]
    pq = tmp_path / "z.parquet"
    import pyarrow.parquet as paq
    paq.write_table(pa.table({"v": [1, 2, 3]}), pq)
    assert open_uri(str(pq)).count() == 3


def test_open_uri_arrow_filesystem_scheme(tmp_path):
    """Scheme-qualified URIs resolve through pyarrow.fs.from_uri inside
    Ray's readers — the SAME code path s3://, gs:// and az:// take (only
    the filesystem object differs), proven offline with file://."""
    import pyarrow.parquet as paq

    pq = tmp_path / "fs.parquet"
    paq.write_table(pa.table({"v": [1, 2, 3]}), pq)
    assert open_uri(f"file://{pq}").count() == 3
    c = tmp_path / "fs.csv"
    c.write_text("a,b\n1,x\n2,y\n")
    assert sorted(open_uri(f"file://{c}").to_pandas()["b"]) == ["x", "y"]


def test_parse_kv():
    t = pa.table({"text": ['a=1 b="two words" c=x', "a=9"]})
    out = parse_kv_batch(t)
    kv = out.column("kv").to_pylist()
    assert kv[0] == {"a": "1", "b": "two words", "c": "x"}
    assert kv[1]["a"] == "9" and kv[1]["b"] is None


def test_parse_syslog():
    t = pa.table({"text": [
        "<34>Oct 11 22:14:15 mymachine su[230]: 'su root' failed",
        "<165>1 2003-10-11T22:14:15.003Z host.example app 1234 ID47 - BOMmsg",
        "not syslog at all --- ???",
    ]})
    out = parse_syslog_batch(t)
    d = out.to_pylist()
    assert d[0]["facility"] == 4 and d[0]["severity"] == 2
    assert d[0]["host"] == "mymachine" and d[0]["app"] == "su" and d[0]["pid"] == 230
    assert d[1]["app"] == "app" and d[1]["pid"] == 1234
    assert d[2]["host"] is None


def test_parse_cef():
    t = pa.table({"text": [
        "CEF:0|Vendor|Product|1.0|100|Detected a thing|5|src=10.0.0.1 dst=2.1.2.2 msg=hello",
    ]})
    out = parse_cef_batch(t)
    r = out.to_pylist()[0]
    assert r["device_vendor"] == "Vendor" and r["signature_id"] == "100"
    assert r["extension"]["src"] == "10.0.0.1"


def test_parsers_in_pipeline(tmp_path):
    p = tmp_path / "log.txt"
    p.write_text("\n".join(f"user=u{i} n={i}" for i in range(50)))
    ds = open_uri(str(p)).map_batches(parse_kv_batch, batch_format="pyarrow")
    flat = ds.to_pandas()
    assert len(flat) == 50
    assert sorted(d["user"] for d in flat["kv"]) == sorted(f"u{i}" for i in range(50))


def test_parse_grok():
    from tenzir_ray.sources import parse_grok_batch
    t = pa.table({"text": [
        '127.0.0.1 GET /index.html 200 0.043',
        'bad line',
    ]})
    out = parse_grok_batch(
        t, "%{IP:client} %{WORD:method} %{NOTSPACE:path} %{INT:status} %{NUMBER:dur}")
    d = out.to_pylist()
    assert d[0]["client"] == "127.0.0.1" and d[0]["status"] == "200"
    assert d[1]["client"] is None


def test_parse_leef():
    from tenzir_ray.sources import parse_leef_batch
    t = pa.table({"text": [
        "LEEF:1.0|Vendor|Product|1.0|EV42|src=10.0.0.1\tdst=10.0.0.2\tsev=5",
    ]})
    r = parse_leef_batch(t).to_pylist()[0]
    assert r["vendor"] == "Vendor" and r["event_id"] == "EV42"
    assert r["attrs"]["src"] == "10.0.0.1" and r["attrs"]["sev"] == "5"


def test_zeek_tsv(tmp_path):
    from tenzir_ray.sources import parse_zeek_tsv
    p = tmp_path / "conn.log"
    p.write_text(
        "#separator \\x09\n#set_separator\t,\n#empty_field\t(empty)\n"
        "#unset_field\t-\n#path\tconn\n#fields\tts\tuid\tproto\torig_bytes\n"
        "#types\ttime\tstring\tenum\tcount\n"
        "1.5\tC1\ttcp\t100\n2.5\tC2\tudp\t-\n"
    )
    df = parse_zeek_tsv(str(p)).to_pandas()
    df = df[~df["ts"].astype(str).str.startswith("#")]
    assert list(df["uid"]) == ["C1", "C2"]
    assert df["orig_bytes"].iloc[1] is None or str(df["orig_bytes"].iloc[1]) in ("nan", "<NA>", "None")


def test_yaml_and_feather(tmp_path):
    from tenzir_ray.sources import read_feather, read_yaml, write_feather
    y = tmp_path / "x.yaml"
    y.write_text("- {a: 1, b: x}\n- {a: 2, b: y}\n")
    ds = read_yaml(str(y))
    assert sorted(ds.to_pandas()["a"]) == [1, 2]
    f = tmp_path / "x.feather"
    write_feather(ds, str(f))
    back = read_feather(str(f)).to_pandas()
    assert sorted(back["a"]) == [1, 2]


def test_open_uri_gzip(tmp_path):
    import gzip
    p = tmp_path / "z.csv.gz"
    p.write_bytes(gzip.compress(b"a,b\n1,x\n2,y\n"))
    assert sorted(open_uri(str(p)).to_pandas()["a"]) == [1, 2]
    j = tmp_path / "z.jsonl.gz"
    j.write_bytes(gzip.compress(b'{"v": 5}\n{"v": 6}\n'))
    assert sorted(open_uri(str(j)).to_pandas()["v"]) == [5, 6]


def test_parse_json_col():
    from tenzir_ray.functions.parsing import parse_json_col, print_json_col
    import pyarrow.compute as pc
    arr = pa.array(['{"a": 1, "b": "x"}', '{"a": 2}', "not json", None])
    s = parse_json_col(arr)
    assert pc.struct_field(s, "a").to_pylist() == [1, 2, None, None]
    assert pc.struct_field(s, "b").to_pylist() == ["x", None, None, None]
    out = print_json_col(pa.array([{"a": 1}, None]))
    assert out.to_pylist() == ['{"a":1}', None]


def test_routed_json_suricata_style(ray_session):
    """Heterogeneous EVE-style feed: routes get separate per-type schemas
    (multi_series_builder.hpp:283-340 policy_selector)."""
    import json

    import ray.data as rd

    from tenzir_ray.sources.formats import routed_json

    lines = (
        [json.dumps({"event_type": "alert", "severity": i, "sig": f"s{i}"})
         for i in range(10)]
        + [json.dumps({"event_type": "flow", "bytes": i * 100})
           for i in range(7)]
        + [json.dumps({"event_type": "dns", "rrname": "example.org",
                       "rcode": "NOERROR"})]
        + ["not json at all"]
    )
    ds = rd.from_items([{"line": l} for l in lines])
    routed = routed_json(ds, col="line", selector="event_type")
    assert set(routed) == {"alert", "flow", "dns", "_unroutable"}
    alert = routed["alert"]
    assert alert.count() == 10
    assert sorted(alert.schema().names) == ["event_type", "severity", "sig"]
    flow = routed["flow"].take_all()
    assert sorted(r["bytes"] for r in flow) == [i * 100 for i in range(7)]
    assert sorted(routed["dns"].schema().names) == [
        "event_type", "rcode", "rrname"]
    assert routed["_unroutable"].count() == 1


def test_routed_json_malformed_lines(ray_session):
    """Truncated/malformed JSON that still 'looks routable' must land in
    _unroutable, not crash the read (ADVICE round 2); keys with mixed
    numeric types across batches unify by promotion."""
    import ray.data as rd

    from tenzir_ray.sources.formats import routed_json

    lines = [
        '{"event_type": "alert", "x": ',          # truncated
        '{"event_type": "alert", "x": 1}',
        '{"event_type": "alert", "x": 2.5}',      # int→double promotion
        '["event_type", "alert"]',                # JSON but not an object
        '{"other": 1}',                           # lacks selector
        None,
    ]
    ds = rd.from_items([{"line": l} for l in lines])
    routed = routed_json(ds, col="line", selector="event_type")
    assert set(routed) == {"alert", "_unroutable"}
    xs = sorted(r["x"] for r in routed["alert"].take_all())
    assert xs == [1.0, 2.5]
    assert routed["_unroutable"].count() == 4


def test_load_tcp_lines(ray_session):
    import socket
    import threading

    from tenzir_ray.sources.formats import load_tcp

    mk, port = load_tcp(max_events=10)

    def sender():
        c = socket.create_connection(("127.0.0.1", port))
        for i in range(10):
            c.sendall(f"msg {i}\n".encode())
        c.close()

    th = threading.Thread(target=sender)
    th.start()
    ds = mk()
    th.join()
    assert sorted(r["line"] for r in ds.take_all()) == sorted(
        f"msg {i}" for i in range(10))


def test_load_udp_datagrams(ray_session):
    import socket
    import threading

    from tenzir_ray.sources.formats import load_udp

    mk, port = load_udp(max_events=5)

    def sender():
        s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        for i in range(5):
            s.sendto(f"dgram {i}".encode(), ("127.0.0.1", port))
        s.close()

    th = threading.Thread(target=sender)
    th.start()
    ds = mk()
    th.join()
    assert sorted(r["line"] for r in ds.take_all()) == sorted(
        f"dgram {i}" for i in range(5))


def test_load_http_pages_from_serve(ray_session):
    """serve → load_http round-trip with continuation paging
    (operators/http.cpp:423 load_http against serve.cpp's protocol)."""
    import ray.data as rd

    from tenzir_ray.sources.formats import load_http
    from tenzir_ray.stages.serve import serve

    ds = rd.from_items([{"i": i, "tag": f"t{i % 3}"} for i in range(2500)])
    h = serve(ds, default_limit=400)
    try:
        got = load_http(f"http://127.0.0.1:{h.port}/events", limit=400)
        rows = got.take_all()
    finally:
        h.stop()
    assert sorted(r["i"] for r in rows) == list(range(2500))
    assert {r["tag"] for r in rows} == {"t0", "t1", "t2"}


def test_bitz_roundtrip_and_catenation(ray_session, tmp_path):
    """bitz analog: length-framed Arrow IPC batches; files concatenate."""
    import glob
    import ray.data as rd

    from tenzir_ray.sources.formats import read_bitz, write_bitz

    ds = rd.from_items([{"i": i, "s": f"v{i}"} for i in range(500)]) \
        .repartition(4)
    out = str(tmp_path / "bz")
    write_bitz(ds, out)
    files = sorted(glob.glob(out + "/*.bitz"))
    assert len(files) >= 2
    back = read_bitz(out).take_all()
    assert sorted(r["i"] for r in back) == list(range(500))

    # catenation: cat two part files into one -> still a valid stream
    cat = tmp_path / "cat" ; cat.mkdir()
    with open(cat / "all.bitz", "wb") as f:
        for p in files[:2]:
            f.write(open(p, "rb").read())
    n1 = read_bitz(str(files[0])).count() + read_bitz(str(files[1])).count()
    assert read_bitz(str(cat)).count() == n1


def test_load_http_server_push(ray_session):
    """from_http server mode: POSTed NDJSON drains into a Dataset."""
    import threading
    import urllib.request

    from tenzir_ray.sources.formats import load_http_server

    mk, port = load_http_server(max_events=6, idle_timeout=3.0)

    def pusher():
        body = "\n".join('{"i": %d}' % i for i in range(6)).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/", data=body, method="POST")
        urllib.request.urlopen(req)

    th = threading.Thread(target=pusher)
    th.start()
    ds = mk()
    th.join()
    import json as _json

    got = sorted(_json.loads(r["line"])["i"] for r in ds.take_all())
    assert got == list(range(6))


def test_to_opensearch_bulk(ray_session):
    """to_opensearch: rows → _bulk NDJSON action/source pairs POSTed from
    the workers, verified by draining our own loopback ingest server."""
    import json as _json
    import threading

    import ray.data as rd

    from tenzir_ray.sources.formats import load_http_server, to_opensearch

    mk, port = load_http_server(max_events=20, idle_timeout=3.0)
    ds = rd.from_items([{"doc_id": i, "v": i * i} for i in range(10)])

    sent = {}

    def sink():
        sent["n"] = to_opensearch(
            ds, f"http://127.0.0.1:{port}", index="docs", id_col="doc_id")

    th = threading.Thread(target=sink)
    th.start()
    drained = mk()
    th.join()
    assert sent["n"] == 10
    lines = [_json.loads(r["line"]) for r in drained.take_all()]
    actions = [x for x in lines if "index" in x and "_index" in x["index"]]
    docs = [x for x in lines if "doc_id" in x]
    assert len(actions) == 10 and len(docs) == 10
    assert {a["index"]["_id"] for a in actions} == {str(i) for i in range(10)}
    assert sorted(d["v"] for d in docs) == [i * i for i in range(10)]


def test_grok_stock_pattern_library():
    """The standard grok-patterns set ships built-in (reference bundles
    grok-patterns with formats/grok.cpp): stock composite patterns parse
    real-world Apache/syslog/URI lines, nested %{NAME} references
    resolve recursively."""
    from tenzir_ray.sources.formats import compile_grok, parse_grok_batch
    import pyarrow as pa

    apache = ('192.168.1.9 - alice [10/Oct/2000:13:55:36 -0700] '
              '"POST /submit?x=1 HTTP/1.1" 404 512 "-" "curl/8.0"')
    m = compile_grok("%{COMBINEDAPACHELOG}").search(apache)
    assert m and m.group("clientip") == "192.168.1.9"
    assert m.group("verb") == "POST" and m.group("response") == "404"
    assert m.group("agent") == '"curl/8.0"'

    m = compile_grok("%{SYSLOGBASE} %{GREEDYDATA:msg}").search(
        "Oct 11 22:14:15 host-7 sshd[991]: Accepted publickey for bob")
    assert m and m.group("program") == "sshd" and m.group("pid") == "991"
    assert m.group("logsource") == "host-7"

    m = compile_grok("%{TIMESTAMP_ISO8601:ts} %{LOGLEVEL:lvl} "
                     "%{URI:uri}").search(
        "2024-06-01 08:30:00,123+02:00 WARN http://api.example.com/v1/x")
    assert m and m.group("lvl") == "WARN"
    assert m.group("uri") == "http://api.example.com/v1/x"

    # IPv6 + MAC + UUID
    m = compile_grok("%{IP:ip} %{MAC:mac} %{UUID:u}").search(
        "2001:db8::8a2e:370:7334 00-1B-44-11-3A-B7 "
        "123e4567-e89b-12d3-a456-426614174000")
    assert m and m.group("ip") == "2001:db8::8a2e:370:7334"

    # batch path: named captures become columns
    t = pa.table({"text": [apache, "garbage line"]})
    out = parse_grok_batch(t, pattern="%{HTTPD_COMMONLOG}")
    assert out.column("clientip").to_pylist() == ["192.168.1.9", None]
    assert out.column("response").to_pylist() == ["404", None]

    # nesting depth guard fires on a self-referential pattern
    import pytest as _pytest
    with _pytest.raises(ValueError):
        compile_grok("%{LOOP}", extra={"LOOP": "%{LOOP}x"})


def test_to_splunk_hec_and_clickhouse(ray_session):
    """Splunk HEC and ClickHouse HTTP sinks: per-block POSTs verified by
    draining our own loopback ingest server (same offline protocol test
    as the _bulk sink)."""
    import datetime
    import json as _json
    import threading

    import ray.data as rd

    from tenzir_ray.sources.formats import (
        load_http_server, to_clickhouse, to_splunk_hec,
    )

    ts0 = datetime.datetime(2024, 5, 1, tzinfo=datetime.timezone.utc)
    rows = [{"doc_id": i, "v": i * 2,
             "ts": ts0 + datetime.timedelta(seconds=i)} for i in range(8)]

    # --- HEC
    mk, port = load_http_server(max_events=8, idle_timeout=3.0)
    ds = rd.from_items(rows)
    sent = {}

    def hec():
        sent["n"] = to_splunk_hec(
            ds, f"http://127.0.0.1:{port}", token="tok123",
            index="main", time_col="ts")

    th = threading.Thread(target=hec)
    th.start()
    drained = mk()
    th.join()
    assert sent["n"] == 8
    evs = [_json.loads(r["line"]) for r in drained.take_all()]
    assert len(evs) == 8
    assert all(e["index"] == "main" and e["sourcetype"] == "_json"
               for e in evs)
    assert sorted(e["event"]["v"] for e in evs) == [i * 2 for i in range(8)]
    assert abs(min(e["time"] for e in evs) - ts0.timestamp()) < 1

    # --- ClickHouse JSONEachRow
    mk2, port2 = load_http_server(max_events=8, idle_timeout=3.0)

    def ch():
        sent["ch"] = to_clickhouse(
            rd.from_items(rows), f"http://127.0.0.1:{port2}",
            table="events_local")

    th = threading.Thread(target=ch)
    th.start()
    drained2 = mk2()
    th.join()
    assert sent["ch"] == 8
    got = [_json.loads(r["line"]) for r in drained2.take_all()]
    assert sorted(g["doc_id"] for g in got) == list(range(8))

    # table-name sanity guard
    import pytest as _pt
    with _pt.raises(ValueError):
        to_clickhouse(rd.from_items(rows), "http://x", table="t; DROP")


def test_to_fluentbit(ray_session):
    import json as _json
    import threading

    import ray.data as rd

    from tenzir_ray.sources.formats import load_http_server, to_fluentbit

    mk, port = load_http_server(max_events=5, idle_timeout=3.0)
    sent = {}

    def run():
        sent["n"] = to_fluentbit(
            rd.from_items([{"i": i} for i in range(5)]),
            f"http://127.0.0.1:{port}", tag="app.logs")

    th = threading.Thread(target=run)
    th.start()
    drained = mk()
    th.join()
    assert sent["n"] == 5
    got = [_json.loads(r["line"]) for r in drained.take_all()]
    assert sorted(g["i"] for g in got) == list(range(5))


def test_to_snowflake(ray_session):
    """Snowflake SQL-API sink: one statement per chunk, the NDJSON block
    as the single text binding; protocol verified against the loopback
    ingest server (the request body is one JSON line)."""
    import json as _json
    import threading

    import ray.data as rd

    from tenzir_ray.sources.formats import load_http_server, to_snowflake

    mk, port = load_http_server(max_events=1, idle_timeout=3.0)
    sent = {}

    def run():
        sent["n"] = to_snowflake(
            rd.from_items([{"doc_id": i, "v": i * 2} for i in range(6)])
            .repartition(1),  # one block -> exactly one statement POST
            account_url=f"http://127.0.0.1:{port}",
            table="DB.S.EVENTS", token="tok", database="DB",
            schema="S", warehouse="WH")

    th = threading.Thread(target=run)
    th.start()
    drained = mk()
    th.join()
    assert sent["n"] == 6
    reqs = [_json.loads(r["line"]) for r in drained.take_all()]
    assert len(reqs) == 1
    req = reqs[0]
    # statement text is O(columns) and names both columns
    assert req["statement"].startswith('INSERT INTO DB.S.EVENTS ("DOC_ID", "V")')
    assert "SPLIT_TO_TABLE" in req["statement"]
    assert req["database"] == "DB" and req["warehouse"] == "WH"
    # the rows ride in the ONE text binding as NDJSON
    rows = [_json.loads(ln) for ln in
            req["bindings"]["1"]["value"].split("\n")]
    assert sorted(r["doc_id"] for r in rows) == list(range(6))
    assert all(r["v"] == r["doc_id"] * 2 for r in rows)

    # identifier sanity guards
    import pytest as _pt
    with _pt.raises(ValueError):
        to_snowflake(rd.from_items([{"i": 1}]), account_url="http://x",
                     table="t; DROP", token="tok")


def test_from_opensearch_search_after(ray_session):
    """from_opensearch: search_after deep paging against a loopback stub
    serving deterministic pages; the result is the full corpus, typed."""
    import json as _json
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer

    from tenzir_ray.sources.formats import from_opensearch

    docs = [{"doc_id": i, "v": i * 3} for i in range(23)]

    class Stub(BaseHTTPRequestHandler):
        def do_POST(self):
            body = _json.loads(
                self.rfile.read(int(self.headers["Content-Length"])))
            assert body["sort"][0] == {"doc_id": "asc"}
            assert body["sort"][-1] == {"_doc": "asc"}  # tiebreaker
            size = body["size"]
            after = body.get("search_after", [-1])[0]
            page = [d for d in docs if d["doc_id"] > after][:size]
            hits = [{"_source": d, "sort": [d["doc_id"]]} for d in page]
            out = _json.dumps({"hits": {"hits": hits}}).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(out)))
            self.end_headers()
            self.wfile.write(out)

        def log_message(self, *a):  # quiet
            pass

    srv = HTTPServer(("127.0.0.1", 0), Stub)
    port = srv.server_address[1]
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    try:
        ds = from_opensearch(f"http://127.0.0.1:{port}", "docs",
                             sort_field="doc_id", page_size=10)
        got = sorted(ds.take_all(), key=lambda r: r["doc_id"])
        assert [g["doc_id"] for g in got] == list(range(23))
        assert got[7]["v"] == 21
        # exhausting max_pages with a live cursor raises (no silent
        # truncation)
        import pytest as _pt
        with _pt.raises(RuntimeError, match="truncated"):
            from_opensearch(f"http://127.0.0.1:{port}", "docs",
                            sort_field="doc_id", page_size=10,
                            max_pages=1)
    finally:
        srv.shutdown()


def test_hec_naive_timestamps_are_utc(ray_session):
    """Review regression: tz-naive timestamps (the parquet norm) map to
    HEC time as UTC, not the worker's local timezone."""
    import datetime
    import json as _json
    import threading

    import ray.data as rd

    from tenzir_ray.sources.formats import load_http_server, to_splunk_hec

    naive = datetime.datetime(2024, 5, 1, 12, 0, 0)  # no tzinfo
    want = naive.replace(tzinfo=datetime.timezone.utc).timestamp()
    mk, port = load_http_server(max_events=1, idle_timeout=3.0)
    sent = {}

    def run():
        sent["n"] = to_splunk_hec(
            rd.from_items([{"i": 1, "ts": naive}]),
            f"http://127.0.0.1:{port}", token="t", time_col="ts")

    th = threading.Thread(target=run)
    th.start()
    drained = mk()
    th.join()
    evs = [_json.loads(r["line"]) for r in drained.take_all()]
    assert sent["n"] == 1 and evs[0]["time"] == want


def test_to_azure_log_analytics_oauth_loopback(ray_session):
    """Logs-Ingestion protocol test: the sink mints a client-credentials
    token from the (overridden) login endpoint, then POSTs JSON arrays
    to /dataCollectionRules/<dcr>/streams/Custom-<table> with the
    Bearer token — all against a loopback server."""
    import json as _json
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    import ray.data as rd

    from tenzir_ray.sources.formats import to_azure_log_analytics

    got = {"uploads": [], "token_posts": 0}
    lock = threading.Lock()

    class H(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(n)
            if self.path == "/token":
                with lock:
                    got["token_posts"] += 1
                out = _json.dumps({"access_token": "tok-abc",
                                   "expires_in": 3600}).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(out)))
                self.end_headers()
                self.wfile.write(out)
                return
            with lock:
                got["uploads"].append(
                    (self.path, self.headers.get("Authorization"),
                     _json.loads(body)))
            self.send_response(204)
            self.end_headers()

    srv = ThreadingHTTPServer(("127.0.0.1", 0), H)
    port = srv.server_address[1]
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    try:
        rows = [{"doc_id": i, "v": i * 3} for i in range(7)]
        n = to_azure_log_analytics(
            rd.from_items(rows),
            dce=f"http://127.0.0.1:{port}", dcr="dcr-xyz",
            table="MyData", tenant_id="t", client_id="c",
            client_secret="s",
            token_url=f"http://127.0.0.1:{port}/token",
            rows_per_request=3)
        assert n == 7
        assert got["token_posts"] >= 1
        sent = [r for _, _, chunk in got["uploads"] for r in chunk]
        assert sorted(r["v"] for r in sent) == [i * 3 for i in range(7)]
        for path, auth, chunk in got["uploads"]:
            assert path.startswith("/dataCollectionRules/dcr-xyz"
                                   "/streams/Custom-MyData")
            assert "api-version=2023-01-01" in path
            assert auth == "Bearer tok-abc"
            assert len(chunk) <= 3
    finally:
        srv.shutdown()


def test_to_google_secops_loopback(ray_session):
    """Chronicle unstructured-logs protocol test: batchCreate JSON
    bodies chunked under max_request_size, labels/namespace/timestamps
    stamped."""
    import datetime
    import json as _json
    import threading

    import ray.data as rd

    from tenzir_ray.sources.formats import load_http_server, to_google_secops

    ts0 = datetime.datetime(2024, 5, 1, tzinfo=datetime.timezone.utc)
    rows = [{"i": i, "log": f"evt {i}", "ts": ts0} for i in range(6)]
    # one POST per (block, chunk): up to 6 bodies — drain by idle timeout
    mk, port = load_http_server(max_events=20, idle_timeout=3.0)
    sent = {}

    def run():
        sent["n"] = to_google_secops(
            rd.from_items(rows), customer_id="cust-1",
            log_type="BIND_DNS", log_text_col="log",
            access_token="tok", url=f"http://127.0.0.1:{port}",
            timestamp_col="ts", labels={"node": "test"},
            max_request_size=300)

    th = threading.Thread(target=run)
    th.start()
    drained = mk()
    th.join()
    assert sent["n"] == 6
    bodies = [_json.loads(r["line"]) for r in drained.take_all()]
    assert len(bodies) >= 2  # max_request_size forced chunking
    entries = [e for b in bodies for e in b["entries"]]
    assert sorted(e["log_text"] for e in entries) \
        == sorted(f"evt {i}" for i in range(6))
    for b in bodies:
        assert b["customer_id"] == "cust-1"
        assert b["log_type"] == "BIND_DNS"
        assert b["namespace"] == "tenzir"
        assert b["labels"] == [{"key": "node", "value": "test"}]
    assert all("2024-05-01" in e["ts_rfc3339"] for e in entries)


def test_save_email_file_and_smtp(ray_session, tmp_path):
    """save_email: RFC 5322 file saver plus a loopback SMTP delivery."""
    import email
    import socketserver
    import threading

    import ray.data as rd

    from tenzir_ray.sources.formats import save_email

    rows = [{"a": 1, "b": "x"}, {"a": 2, "b": "y"}]
    ds = rd.from_items(rows)

    # --- file path (.eml)
    out = tmp_path / "msg.eml"
    mid = save_email(ds, "user@example.org", endpoint=str(out),
                     from_addr="eng@example.org", subject="report")
    msg = email.message_from_bytes(out.read_bytes())
    assert msg["To"] == "user@example.org"
    assert msg["Subject"] == "report"
    assert msg["Message-ID"] == mid
    body = msg.get_payload()
    assert '"a": 1' in body.replace('": ', '": ') or '"a":1' in body \
        or '"a": 1' in body

    # --- loopback SMTP
    captured = {}

    class SMTPHandler(socketserver.StreamRequestHandler):
        def respond(self, s):
            self.wfile.write((s + "\r\n").encode())

        def handle(self):
            self.respond("220 loopback ESMTP")
            data_mode = False
            lines = []
            while True:
                raw = self.rfile.readline()
                if not raw:
                    break
                line = raw.decode("utf-8", "replace").rstrip("\r\n")
                if data_mode:
                    if line == ".":
                        captured["data"] = "\n".join(lines)
                        data_mode = False
                        self.respond("250 ok")
                    else:
                        lines.append(line)
                    continue
                verb = line.split(" ", 1)[0].upper()
                if verb in ("EHLO", "HELO"):
                    self.respond("250-loopback")
                    self.respond("250 ok")
                elif verb in ("MAIL", "RCPT"):
                    captured.setdefault("envelope", []).append(line)
                    self.respond("250 ok")
                elif verb == "DATA":
                    data_mode = True
                    self.respond("354 go")
                elif verb == "QUIT":
                    self.respond("221 bye")
                    break
                else:
                    self.respond("250 ok")

    srv = socketserver.ThreadingTCPServer(("127.0.0.1", 0), SMTPHandler)
    srv.allow_reuse_address = True
    port = srv.server_address[1]
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    try:
        save_email(ds, "user@example.org",
                   endpoint=f"smtp://127.0.0.1:{port}",
                   from_addr="eng@example.org", subject="smtp report")
        assert any("user@example.org" in e
                   for e in captured["envelope"])
        assert "smtp report" in captured["data"]
        assert '"a"' in captured["data"]
    finally:
        srv.shutdown()


def test_to_amazon_security_lake_layout(ray_session, tmp_path):
    """ASL sink: parquet lands under the Security-Lake custom-source
    partition layout region=/accountId=/eventDay=."""
    import datetime

    import pyarrow.parquet as pq
    import ray.data as rd

    from tenzir_ray.sources.formats import to_amazon_security_lake

    ts0 = datetime.datetime(2024, 5, 1, tzinfo=datetime.timezone.utc)
    rows = [{"i": i, "ts": ts0 + datetime.timedelta(days=i % 2)}
            for i in range(10)]
    base = str(tmp_path / "asl")
    to_amazon_security_lake(rd.from_items(rows), base,
                            region="eu-west-1", account_id="123",
                            time_col="ts")
    t = pq.read_table(base, partitioning="hive")
    assert t.num_rows == 10
    days = set(str(d) for d in t.column("eventDay").to_pylist())
    assert days == {"20240501", "20240502"}
    import glob
    dirs = glob.glob(base + "/region=eu-west-1/accountId=123/eventDay=*")
    assert len(dirs) == 2


def test_load_tcp_tls(ray_session, tmp_path):
    """TLS listen mode (load_tcp.cpp:1049): self-signed server cert,
    ssl client sends NDJSON lines, drain matches."""
    import socket
    import ssl
    import subprocess
    import threading

    from tenzir_ray.sources.formats import load_tcp

    cert = tmp_path / "srv.pem"
    key = tmp_path / "srv.key"
    subprocess.run(
        ["openssl", "req", "-x509", "-newkey", "rsa:2048", "-nodes",
         "-keyout", str(key), "-out", str(cert), "-days", "1",
         "-subj", "/CN=127.0.0.1"],
        check=True, capture_output=True)

    mk, port = load_tcp(max_events=3, idle_timeout=5.0, tls=True,
                        certfile=str(cert), keyfile=str(key))

    def send():
        ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_CLIENT)
        ctx.check_hostname = False
        ctx.verify_mode = ssl.CERT_NONE
        with socket.create_connection(("127.0.0.1", port)) as raw:
            with ctx.wrap_socket(raw) as s:
                s.sendall(b'{"a":1}\n{"a":2}\n{"a":3}\n')

    th = threading.Thread(target=send)
    th.start()
    ds = mk()
    th.join()
    lines = sorted(r["line"] for r in ds.take_all())
    assert lines == ['{"a":1}', '{"a":2}', '{"a":3}']


def test_save_tcp_and_udp_duals(ray_session):
    """save_tcp/save_udp sinks drain back through their load_* duals."""
    import json
    import threading

    import ray.data as rd

    from tenzir_ray.sources.formats import (
        load_tcp, load_udp, save_tcp, save_udp,
    )

    rows = [{"i": i, "s": f"v{i}"} for i in range(9)]

    mk, port = load_tcp(max_events=9, idle_timeout=5.0)
    box = {}

    def drain():
        box["tcp"] = mk().take_all()

    th = threading.Thread(target=drain)
    th.start()
    n = save_tcp(rd.from_items(rows), "127.0.0.1", port)
    th.join()
    assert n == 9
    got = sorted(json.loads(r["line"])["i"] for r in box["tcp"])
    assert got == list(range(9))

    mku, uport = load_udp(max_events=9, idle_timeout=3.0)

    def drain_u():
        box["udp"] = mku().take_all()

    th = threading.Thread(target=drain_u)
    th.start()
    import time

    time.sleep(0.2)  # receiver must be listening before datagrams fly
    nu = save_udp(rd.from_items(rows), "127.0.0.1", uport)
    th.join()
    assert nu == 9
    gotu = sorted(json.loads(r["line"])["i"] for r in box["udp"])
    assert gotu == list(range(9))


def test_save_tcp_tls(ray_session, tmp_path):
    """save_tcp tls=True against load_tcp's TLS listener."""
    import json
    import subprocess
    import threading

    import ray.data as rd

    from tenzir_ray.sources.formats import load_tcp, save_tcp

    cert, key = tmp_path / "srv.pem", tmp_path / "srv.key"
    subprocess.run(
        ["openssl", "req", "-x509", "-newkey", "rsa:2048", "-nodes",
         "-keyout", str(key), "-out", str(cert), "-days", "1",
         "-subj", "/CN=127.0.0.1"],
        check=True, capture_output=True)
    mk, port = load_tcp(max_events=4, idle_timeout=5.0, tls=True,
                        certfile=str(cert), keyfile=str(key))
    box = {}

    def drain():
        box["rows"] = mk().take_all()

    th = threading.Thread(target=drain)
    th.start()
    n = save_tcp(rd.from_items([{"i": i} for i in range(4)]),
                 "127.0.0.1", port, tls=True)
    th.join()
    assert n == 4
    assert sorted(json.loads(r["line"])["i"]
                  for r in box["rows"]) == [0, 1, 2, 3]


def test_from_fluent_bit_source(ray_session):
    """from_fluent_bit ingest endpoint: accepts both fluent-bit http
    output body formats (json array / json_lines)."""
    import json
    import threading
    import urllib.request

    from tenzir_ray.sources.formats import from_fluent_bit

    mk, port = from_fluent_bit(max_events=5, idle_timeout=3.0)
    box = {}

    def drain():
        box["ds"] = mk()

    th = threading.Thread(target=drain)
    th.start()
    # json format: one array per request
    arr = json.dumps([{"k": 1, "tag": "a"}, {"k": 2, "tag": "a"}])
    urllib.request.urlopen(urllib.request.Request(
        f"http://127.0.0.1:{port}/tenzir", data=arr.encode(),
        method="POST"))
    # json_lines format: NDJSON
    nd = "\n".join(json.dumps({"k": i, "extra": True})
                   for i in (3, 4, 5))
    urllib.request.urlopen(urllib.request.Request(
        f"http://127.0.0.1:{port}/tenzir", data=nd.encode(),
        method="POST"))
    th.join(timeout=15)
    rows = box["ds"].take_all()
    assert sorted(r["k"] for r in rows) == [1, 2, 3, 4, 5]
    # key union: both shapes' fields present
    names = set(box["ds"].schema().names)
    assert {"k", "tag", "extra"} <= names
