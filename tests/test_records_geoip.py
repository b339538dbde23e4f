"""record functions, geoip CSV context, suricata reader, grammar ops."""

import pyarrow as pa

from tenzir_ray.functions.records import get, has, keys, make, merge


def test_record_make_get_has_keys():
    s = make(a=[1, 2, None], b=["x", "y", "z"])
    assert keys(s) == ["a", "b"]
    assert get(s, "a").to_pylist() == [1, 2, None]
    assert get(s, "missing", default=0).to_pylist() == [0, 0, 0]
    assert has(s, "a").to_pylist() == [True, True, False]
    assert has(s, "nope").to_pylist() == [False, False, False]


def test_record_merge_right_wins():
    a = make(x=[1, 2], y=["a", "b"])
    b = make(y=["A", "B"], z=[9, 8])
    m = merge(a, b)
    assert keys(m) == ["x", "y", "z"]
    assert get(m, "y").to_pylist() == ["A", "B"]


def test_geoip_csv_context(tmp_path):
    from tenzir_ray.functions.ip import geoip_context_from_csv, ip_parse

    f = tmp_path / "geo.csv"
    f.write_text(
        "network,country,city\n"
        "10.0.0.0/8,XX,corp\n"
        "10.3.0.0/16,XX,branch\n"
        "0.0.0.0/0,ZZ,world\n"
    )
    idx = geoip_context_from_csv(str(f))
    ips = ip_parse(pa.array(["10.3.1.1", "10.9.0.1", "8.8.8.8"]))
    got = idx.lookup(ips)
    assert [g["city"] for g in got] == ["branch", "corp", "world"]


def test_read_suricata(ray_session, tmp_path):
    import json

    from tenzir_ray.sources.formats import read_suricata

    f = tmp_path / "eve.json"
    lines = [json.dumps({"event_type": "alert", "sev": i}) for i in range(4)]
    lines += [json.dumps({"event_type": "dns", "rrname": "x.org"})]
    f.write_text("\n".join(lines) + "\n")
    routed = read_suricata(str(f))
    assert routed["alert"].count() == 4
    assert routed["dns"].count() == 1


def test_grammar_new_ops(ray_session):
    import ray.data as rd

    from tenzir_ray.pipelines import Pipeline

    ds = rd.from_items([{"i": i, "g": i % 3} for i in range(100)]).sort("i")
    out = Pipeline.parse("slice 10:20 | enumerate pos").run(ds)
    rows = sorted(out.take_all(), key=lambda r: r["i"])
    assert [r["i"] for r in rows] == list(range(10, 20))
    d = Pipeline.parse("distinct g").run(ds)
    assert sorted(r["g"] for r in d.take_all()) == [0, 1, 2]
    s = Pipeline.parse("shell \"grep 7\"").run(
        rd.from_items([{"line": f"v {i}"} for i in range(20)]))
    assert sorted(r["line"] for r in s.take_all()) == ["v 17", "v 7"]


def test_misc_env_secret_config(tmp_path, monkeypatch):
    from tenzir_ray.functions import misc

    monkeypatch.setenv("MY_TEST_VAR", "42")
    assert misc.env("MY_TEST_VAR") == "42"
    assert misc.env("NOPE_XYZ", "d") == "d"
    misc.load_config({"store": {"path": "/lake"}, "salt": 4})
    assert misc.config("store.path") == "/lake"
    assert misc.config("salt") == 4
    assert misc.config("missing.q", "dflt") == "dflt"
    misc.set_secrets({"token": "abc"})
    assert misc.secret("token") == "abc"
    monkeypatch.setenv("TENZIR_SECRET_APIKEY", "zzz")
    assert misc.secret("apikey") == "zzz"
    import pytest as _pt
    with _pt.raises(KeyError):
        misc.secret("nope")
    f = tmp_path / "cfg.yaml"
    f.write_text("lake-root: /data/lake\nsalt: 8\n")
    misc.load_config(str(f))
    assert misc.config("lake-root") == "/data/lake"


def test_field_level_parsers():
    import pyarrow as pa

    from tenzir_ray.functions.parsing import (
        parse_csv_col, parse_grok_col, parse_kv_col, parse_syslog_col,
    )

    kv = parse_kv_col(pa.array(['a=1 b="x y"', "a=2"]))
    assert kv.to_pylist() == [{"a": "1", "b": "x y"}, {"a": "2", "b": None}]

    sl = parse_syslog_col(pa.array(
        ["<34>1 2026-01-01T00:00:00Z host app 7 - - hello"]))
    row = sl.to_pylist()[0]
    assert row["facility"] == 4 and row["severity"] == 2
    assert row["msg"] == "hello"

    gk = parse_grok_col(pa.array(["GET /x 200"]),
                        "%{WORD:verb} %{NOTSPACE:path} %{INT:code}")
    assert gk.to_pylist() == [{"verb": "GET", "path": "/x", "code": "200"}]

    cs = parse_csv_col(pa.array(["1,foo", "2,bar"]), ["id", "name"])
    assert cs.to_pylist() == [{"id": "1", "name": "foo"},
                              {"id": "2", "name": "bar"}]


def test_ocsf_mapping(ray_session):
    import pyarrow as pa

    import tenzir_ray.stages as ops
    from tenzir_ray.functions.ocsf import to_ocsf, type_uid

    t = pa.table({
        "ts": [1, 2], "orig_h": ["10.0.0.1", "10.0.0.2"],
        "resp_h": ["8.8.8.8", "9.9.9.9"], "resp_p": [53, 443],
        "uid": ["c1", "c2"],
    })
    out = to_ocsf(
        t, "network_activity",
        mapping={"orig_h": "src_endpoint.ip", "resp_h": "dst_endpoint.ip",
                 "resp_p": "dst_endpoint.port"},
        activity_id=1, time_col="ts", severity="low",
    )
    assert out.column("class_uid").to_pylist() == [4001, 4001]
    assert out.column("category_uid")[0].as_py() == 4
    assert out.column("type_uid")[0].as_py() == type_uid("network_activity", 1) == 400101
    assert out.column("severity_id")[0].as_py() == 2
    assert out.column("src_endpoint.ip").to_pylist() == ["10.0.0.1", "10.0.0.2"]
    assert out.column("unmapped.uid").to_pylist() == ["c1", "c2"]
    # dotted paths nest via unflatten
    import ray.data as rd

    nested = ops.unflatten(rd.from_arrow(out), sep=".").take_all()
    assert nested[0]["src_endpoint"]["ip"] == "10.0.0.1"
    assert nested[0]["dst_endpoint"]["port"] == 53


def test_ocsf_builtin_mapping_packages():
    """Per-source OCSF mapping packages + activity/category name tables
    (the reference ships these on top of ocsf.cpp): zeek conn.log and
    suricata EVE records normalize to their classes with stamped names."""
    import pyarrow as pa
    import pytest as _pt

    from tenzir_ray.functions.ocsf import (
        activity_name, category_name, class_name_from_uid, map_to_ocsf,
    )

    zeek = pa.table({
        "ts": [1.0], "uid": ["Cx1"], "id.orig_h": ["10.0.0.1"],
        "id.orig_p": [51000], "id.resp_h": ["1.1.1.1"],
        "id.resp_p": [443], "proto": ["tcp"],
        "orig_bytes": [100], "resp_bytes": [2000],
        "orig_pkts": [3], "resp_pkts": [4], "history": ["ShADad"],
    })
    out = map_to_ocsf(zeek, "zeek.conn", activity_id=6, time_col="ts")
    assert out.column("class_uid")[0].as_py() == 4001
    assert out.column("activity_name")[0].as_py() == "Traffic"
    assert out.column("category_name")[0].as_py() == "Network Activity"
    assert out.column("traffic.bytes_in")[0].as_py() == 2000
    assert out.column("src_endpoint.port")[0].as_py() == 51000
    assert out.column("unmapped.history")[0].as_py() == "ShADad"
    assert out.column("time")[0].as_py() == 1.0

    sur = pa.table({
        "flow_id": [7], "src_ip": ["10.1.1.1"], "dest_ip": ["8.8.8.8"],
        "dns.rrname": ["example.com"], "dns.rrtype": ["A"],
        "dns.rcode": ["NOERROR"],
    })
    out = map_to_ocsf(sur, "suricata.dns", activity_id=1)
    assert out.column("class_uid")[0].as_py() == 4003
    assert out.column("query.hostname")[0].as_py() == "example.com"
    assert out.column("activity_name")[0].as_py() == "Query"

    assert activity_name("authentication", 1) == "Logon"
    assert activity_name("http_activity", 6) == "Post"
    assert activity_name("http_activity", 99) == "Other"
    assert category_name(3) == "Identity & Access Management"
    assert class_name_from_uid(3002) == "authentication"
    with _pt.raises(KeyError):
        map_to_ocsf(zeek, "nonexistent.source")
