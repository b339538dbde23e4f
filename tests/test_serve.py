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
