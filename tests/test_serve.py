"""serve: buffered results over loopback HTTP with paging."""

import json
import urllib.request

import ray.data as rd

from tenzir_ray.stages.serve import serve


def test_serve_pages_and_schema(ray_session):
    ds = rd.from_items([{"i": i, "s": f"r{i}"} for i in range(25)])
    h = serve(ds, default_limit=10)
    try:
        base = f"http://127.0.0.1:{h.port}"
        got, off = [], 0
        while True:
            r = urllib.request.urlopen(f"{base}/events?offset={off}&limit=10")
            body = r.read().decode()
            got += [json.loads(l) for l in body.splitlines() if l]
            nxt = r.headers.get("X-Next-Offset")
            if nxt is None:
                break
            off = int(nxt)
        assert sorted(x["i"] for x in got) == list(range(25))
        sch = json.loads(urllib.request.urlopen(base + "/schema").read())
        assert {c["name"] for c in sch} == {"i", "s"}
    finally:
        h.stop()


def test_serve_spools_and_caps(ray_session, tmp_path):
    """serve never builds a driver-side list of all rows: blocks spool
    to disk, pages come off the memory-mapped spool, and max_rows
    bounds the buffer (X-Truncated advertised)."""
    import glob
    import urllib.request

    import ray.data as rd

    from tenzir_ray.stages.serve import serve

    ds = rd.from_items([{"i": i} for i in range(10_000)]).repartition(8)
    spool = str(tmp_path / "spool")
    import os
    os.makedirs(spool, exist_ok=True)
    h = serve(ds, max_rows=2_500, default_limit=1000, spool_dir=spool)
    try:
        assert h.truncated and h.total_rows == 2_500
        assert glob.glob(spool + "/page-*.arrow")
        seen = 0
        off = 0
        while True:
            r = urllib.request.urlopen(
                f"http://127.0.0.1:{h.port}/events?offset={off}&limit=999")
            body = r.read().decode()
            assert r.headers.get("X-Truncated") == "true"
            rows = [l for l in body.splitlines() if l]
            seen += len(rows)
            nxt = r.headers.get("X-Next-Offset")
            if nxt is None:
                break
            off = int(nxt)
        assert seen == 2_500
    finally:
        h.stop()
    assert not glob.glob(spool + "/page-*.arrow")  # spool removed on stop


def test_load_http_rejects_truncated(ray_session, tmp_path):
    """A truncated serve buffer must not silently yield partial data."""
    import pytest
    import ray.data as rd

    from tenzir_ray.sources.formats import load_http
    from tenzir_ray.stages.serve import serve

    ds = rd.from_items([{"i": i} for i in range(1000)])
    h = serve(ds, max_rows=100)
    try:
        with pytest.raises(ValueError, match="X-Truncated"):
            load_http(f"http://127.0.0.1:{h.port}/events")
        got = load_http(f"http://127.0.0.1:{h.port}/events",
                        allow_truncated=True)
        assert got.count() == 100
    finally:
        h.stop()
