"""Introspection sources, compression codecs, reader variants."""

import pyarrow as pa


def test_compress_roundtrip_all_codecs():
    from tenzir_ray.functions.compress import CODECS, compress, decompress

    data = pa.array([b"hello " * 100, None, b""])
    for c in CODECS:
        assert decompress(compress(data, c), c).to_pylist() == data.to_pylist()


def test_files_source(ray_session, tmp_path):
    from tenzir_ray.sources.introspect import files

    (tmp_path / "a.txt").write_text("x" * 10)
    (tmp_path / "sub").mkdir()
    (tmp_path / "sub" / "b.txt").write_text("y" * 20)
    flat = files(str(tmp_path)).take_all()
    assert {r["name"] for r in flat} == {"a.txt", "sub"}
    rec = files(str(tmp_path), recurse=True).take_all()
    names = {r["name"] for r in rec}
    assert "b.txt" in names
    sizes = {r["name"]: r["size"] for r in rec if r["type"] == "file"}
    assert sizes["a.txt"] == 10 and sizes["b.txt"] == 20


def test_processes_source(ray_session):
    from tenzir_ray.sources.introspect import processes

    rows = processes().take_all()
    assert len(rows) > 5
    assert any(r["pid"] == 1 for r in rows)
    me = [r for r in rows if "python" in r["command"]]
    assert me  # at least this interpreter


def test_sockets_source(ray_session):
    from tenzir_ray.sources.introspect import sockets

    rows = sockets().take_all()
    # the Ray cluster always has listening TCP sockets
    assert any(r["proto"] == "tcp" and r["state"] == "LISTEN" for r in rows)


def test_read_tsv_and_zeek_json(ray_session, tmp_path):
    import json

    from tenzir_ray.sources.formats import read_tsv, read_zeek_json

    f = tmp_path / "t.tsv"
    f.write_text("a\tb\n1\tx\n2\ty\n")
    rows = read_tsv(str(f)).take_all()
    assert sorted(r["a"] for r in rows) == [1, 2]

    z = tmp_path / "zeek.log"
    lines = [json.dumps({"_path": "conn", "uid": f"c{i}", "orig_bytes": i})
             for i in range(4)]
    lines += [json.dumps({"_path": "dns", "query": "x.org"})]
    z.write_text("\n".join(lines) + "\n")
    routed = read_zeek_json(str(z))
    assert routed["conn"].count() == 4
    assert routed["dns"].count() == 1


def test_read_gelf(ray_session, tmp_path):
    import json

    from tenzir_ray.sources.formats import read_gelf

    g = tmp_path / "gelf.log"
    recs = [{"version": "1.1", "host": f"h{i}", "short_message": f"m{i}"}
            for i in range(3)]
    g.write_text("\n".join(json.dumps(r) for r in recs) + "\n")
    rows = read_gelf(str(g)).take_all()
    assert sorted(r["host"] for r in rows) == ["h0", "h1", "h2"]


def test_chart_metadata(ray_session):
    import ray.data as rd

    from tenzir_ray.stages.chart import chart_line, chart_spec

    ds = rd.from_items([{"x": i, "y": i * 2} for i in range(10)])
    out = chart_line(ds, x="x", y="y", title="demo")
    batches = list(out.iter_batches(batch_format="pyarrow"))
    spec = chart_spec(batches[0])
    assert spec == {"type": "line", "x": "x", "y": "y", "title": "demo"}
    # data untouched
    assert sum(b.num_rows for b in batches) == 10


def test_metrics_snapshot(ray_session):
    from tenzir_ray.sources.introspect import metrics

    m = metrics()
    assert m["cpus_total"] >= 1
    assert m["object_store_bytes"] > 0


def test_plugins_inventory(ray_session):
    """plugins(): self-maintaining operator/function inventory, and the
    api /plugins route (web docs operators/plugins.md analog)."""
    import ray.data as rd

    from tenzir_ray.pipelines.planner import run_pipeline
    from tenzir_ray.sources.introspect import plugins

    rows = plugins()
    ops = {r["name"] for r in rows if r["kind"] == "operator"}
    fns = {r["name"] for r in rows if r["kind"] == "function"}
    # dispatch arms scraped from the planner source: spot-check core,
    # text-curation and session-4 operators plus function families
    assert {"where", "summarize", "sort", "fork", "sigma", "yara",
            "dedup_minhash", "normalize", "c4", "dsir",
            "asof_join"} <= ops
    assert {"sha256", "url_normalize", "to_int", "in_subnet"} <= fns
    assert len(ops) > 60 and len(fns) > 90

    got = run_pipeline("api /plugins | where kind == \"operator\"",
                       rd.from_items([{"x": 1}])).take_all()
    assert {r["name"] for r in got} == ops
