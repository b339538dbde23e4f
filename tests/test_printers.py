"""Printer duals round-trip through their parsers."""

import pyarrow as pa

from tenzir_ray.sources.formats import (
    parse_cef_batch,
    parse_kv_batch,
    parse_leef_batch,
    parse_syslog_batch,
)
from tenzir_ray.sources.printers import (
    print_cef_batch,
    print_csv_batch,
    print_kv_batch,
    print_leef_batch,
    print_ndjson_batch,
    print_syslog_batch,
    print_zeek_tsv,
    write_lines,
)


def test_ndjson_roundtrip():
    t = pa.table({"a": [1, 2], "b": ["x", "y"]})
    lines = print_ndjson_batch(t).column("line").to_pylist()
    import json

    assert [json.loads(l) for l in lines] == t.to_pylist()


def test_csv_print():
    t = pa.table({"a": [1, 2], "b": ["x", "y"]})
    lines = print_csv_batch(t, include_header=True).column("line").to_pylist()
    assert lines == ['"a","b"', '1,"x"', '2,"y"']


def test_csv_print_embedded_newline():
    """A quoted value with an embedded newline stays ONE record line
    (the parse(print(x))==x contract; splitlines() used to shred it)."""
    t = pa.table({"a": [1, 2], "b": ["x\ny", "plain"]})
    lines = print_csv_batch(t).column("line").to_pylist()
    assert len(lines) == 2
    assert lines[0] == '1,"x\ny"'
    assert lines[1] == '2,"plain"'

    import io

    import pyarrow.csv as pacsv
    back = pacsv.read_csv(
        io.BytesIO(("a,b\n" + "\n".join(lines) + "\n").encode()))
    assert back.column("b").to_pylist() == ["x\ny", "plain"]


def test_kv_roundtrip():
    t = pa.table({"user": ["alice", "bob"], "action": ["login", "drop table"]})
    printed = print_kv_batch(t)
    parsed = parse_kv_batch(printed, col="line")
    kv = parsed.column("kv").to_pylist()
    assert kv == [{"user": "alice", "action": "login"},
                  {"user": "bob", "action": "drop table"}]


def test_syslog_roundtrip():
    t = pa.table({
        "facility": pa.array([4, 10], pa.int32()),
        "severity": pa.array([2, 5], pa.int32()),
        "ts_raw": ["2026-01-02T03:04:05Z", "2026-01-02T03:04:06Z"],
        "host": ["web01", "db02"],
        "app": ["nginx", "postgres"],
        "pid": pa.array([101, None], pa.int32()),
        "msg": ["GET / 200", "checkpoint complete"],
    })
    printed = print_syslog_batch(t)
    parsed = parse_syslog_batch(printed, col="line")
    for f in ("facility", "severity", "host", "app", "msg"):
        assert parsed.column(f).to_pylist() == t.column(f).to_pylist(), f
    assert parsed.column("pid").to_pylist() == [101, None]


def test_cef_roundtrip():
    t = pa.table({
        "cef_version": ["0"], "device_vendor": ["acme"],
        "device_product": ["fw"], "device_version": ["1.2"],
        "signature_id": ["42"], "name": ["port scan"], "severity": ["7"],
        "extension": [{"src": "10.0.0.1", "dst": "10.0.0.2"}],
    })
    printed = print_cef_batch(t)
    parsed = parse_cef_batch(printed, col="line")
    assert parsed.column("device_vendor").to_pylist() == ["acme"]
    assert parsed.column("name").to_pylist() == ["port scan"]
    assert parsed.column("extension").to_pylist() == [
        {"src": "10.0.0.1", "dst": "10.0.0.2"}]


def test_leef_roundtrip():
    t = pa.table({
        "leef_version": ["1.0"], "vendor": ["acme"], "product": ["fw"],
        "version": ["1.2"], "event_id": ["evt7"],
        "attrs": [{"src": "1.2.3.4", "spt": "4242"}],
    })
    printed = print_leef_batch(t)
    parsed = parse_leef_batch(printed, col="line")
    assert parsed.column("vendor").to_pylist() == ["acme"]
    assert parsed.column("event_id").to_pylist() == ["evt7"]
    assert parsed.column("attrs").to_pylist() == [
        {"src": "1.2.3.4", "spt": "4242"}]


def test_zeek_tsv_roundtrip(ray_session, tmp_path):
    from tenzir_ray.sources.formats import parse_zeek_tsv

    t = pa.table({"uid": ["c1", "c2"], "bytes": [100, 200]})
    printed = print_zeek_tsv(t, path="conn")
    f = tmp_path / "conn.log"
    f.write_text("\n".join(printed.column("line").to_pylist()) + "\n")
    parsed = parse_zeek_tsv(str(f)).take_all()
    assert [r["uid"] for r in parsed] == ["c1", "c2"]
    assert [int(r["bytes"]) for r in parsed] == [100, 200]


def test_write_lines(ray_session, tmp_path):
    import ray.data as rd

    ds = rd.from_items([{"line": f"event {i}"} for i in range(100)])
    out = str(tmp_path / "lines")
    write_lines(ds, out)
    import glob

    got = []
    for f in sorted(glob.glob(out + "/*")):
        got += open(f).read().splitlines()
    assert sorted(got) == sorted(f"event {i}" for i in range(100))


def test_write_lines_structural_chars(ray_session, tmp_path):
    """Commas / quotes / JSON braces in the payload pass through verbatim
    (the CSV quoting_style='none' path used to raise ArrowInvalid)."""
    import glob

    import ray.data as rd

    payload = ['{"a":1,"b":"x"}', 'has,comma', 'has"quote', "plain"]
    ds = rd.from_items([{"line": s} for s in payload])
    out = str(tmp_path / "ndjson")
    write_lines(ds, out)
    got = []
    for f in sorted(glob.glob(out + "/*")):
        got += open(f).read().splitlines()
    assert sorted(got) == sorted(payload)


def test_print_lines_verbatim():
    """The `lines` printer (formats/lines.cpp:100-148 contract):
    space-joined non-null values, strings VERBATIM — no CSV quoting,
    commas/quotes untouched; a single string column round-trips."""
    from tenzir_ray.sources.printers import print_lines_batch

    t = pa.table({
        "msg": pa.array(['hello, world', 'has"quote', None, "plain"]),
        "n": pa.array([1, None, 3, 4], pa.int64()),
    })
    got = print_lines_batch(t).column("line").to_pylist()
    assert got == ["hello, world 1", 'has"quote', "3", "plain 4"]
    # single string column → raw passthrough (read_lines dual)
    t1 = pa.table({"line": pa.array(['{"a":1}', "x,y"])})
    assert print_lines_batch(t1).column("line").to_pylist() == \
        ['{"a":1}', "x,y"]


def test_cli_printer_sink(ray_session, tmp_path):
    """`write kv <dir>` lands printer-formatted lines as text files."""
    import glob
    import subprocess
    import sys

    out = str(tmp_path / "kvout")
    r = subprocess.run(
        [sys.executable, "-m", "tenzir_ray",
         "from /root/testdata/sf0.001/events.parquet | where event_id < 3 "
         "| select event_id, event_type | write kv " + out],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-500:]
    lines = []
    for f in glob.glob(out + "/*"):
        lines += open(f).read().splitlines()
    assert sorted(lines)[0].startswith("event_id=0 event_type=")
    assert len(lines) == 3


def test_write_lines_compressed(ray_session, tmp_path):
    """codec= compresses each part file with the matching extension —
    the save-side dual of extension-inferred read compression."""
    import glob
    import gzip

    import ray.data as rd

    payload = [f"line {i}" for i in range(50)]
    ds = rd.from_items([{"line": s} for s in payload])
    out = str(tmp_path / "gz")
    write_lines(ds, out, codec="gzip")
    files = glob.glob(out + "/*.txt.gz")
    assert files
    got = []
    for f in sorted(files):
        got += gzip.open(f, "rt", encoding="utf-8").read().splitlines()
    assert sorted(got) == sorted(payload)


def test_write_tql(ray_session):
    """write_tql compact notation (web/docs/tql2/operators/
    write_tql.md): records as {key: value, …}, one event per line."""
    import ray.data as rd

    from tenzir_ray.pipelines.planner import Pipeline
    from tenzir_ray.sources.printers import print_tql_batch
    import pyarrow as pa

    t = pa.table({"id": [1, 2], "name": ["a", None],
                  "ok": [True, False]})
    lines = print_tql_batch(t).column("line").to_pylist()
    assert lines[0] == '{id: 1, name: "a", ok: true}'
    assert lines[1] == "{id: 2, name: null, ok: false}"
    stripped = print_tql_batch(
        t, strip_null_fields=True).column("line").to_pylist()
    assert stripped[1] == "{id: 2, ok: false}"

    # nested records/lists render in TQL notation
    t2 = pa.table({"e": [{"ip": "10.0.0.1", "ports": [53, 80]}]})
    assert print_tql_batch(t2).column("line").to_pylist()[0] == \
        '{e: {ip: "10.0.0.1", ports: [53, 80]}}'

    # reachable from pipeline text
    ds = rd.from_items([{"x": 5, "y": None}])
    got = Pipeline.parse(
        "write_tql strip_null_fields=true").run(ds).take_all()
    assert got[0]["line"] == "{x: 5}"
