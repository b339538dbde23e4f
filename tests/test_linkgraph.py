"""Link-graph extraction + fixed-point PageRank: distributed vs
sequential bit-equality, href spellings, host resolution rules, and
graph edge cases (dangling nodes, multi-edges, empty graph)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from tenzir_ray.text.linkgraph import extract_links, pagerank
from tenzir_ray.text.sequential import extract_links_seq, pagerank_seq

PAGES = [
    ("http://a.example/p1",
     b'<a href="http://b.example/x">b</a> '
     b"<a href='http://b.example/y'>b again (same host, one edge)</a> "
     b'<a href=http://c.example>bare</a>'),
    ("http://b.example/p1",
     b'<a href="/local">rel</a> <a href="#frag">skip</a> '
     b'<a href="mailto:x@y">skip</a> <A HREF="//c.example/z">proto-rel</A>'),
    ("http://c.example/p1", b"no links here"),
    ("http://a.example/p2",
     b'<a href="HTTPS://B.EXAMPLE:8443/q?u=1">case+port</a>'),
    ("", b'<a href="http://nowhere.example">no src host -> dropped</a>'),
    ("http://d.example/p1", None),
]


def _pages_ds(parts=3):
    return rd.from_arrow(pa.table({
        "url": pa.array([u for u, _ in PAGES], pa.string()),
        "html": pa.array([h for _, h in PAGES], pa.binary()),
    })).repartition(parts)


def test_extract_links_matches_sequential():
    got = sorted(
        (r["src_host"], r["dst_host"])
        for r in extract_links(_pages_ds()).take_all())
    exp = sorted(extract_links_seq([u for u, _ in PAGES],
                                   [h for _, h in PAGES]))
    assert got == exp
    assert ("a.example", "b.example") in got      # deduped per page
    assert got.count(("a.example", "b.example")) == 2  # p1 AND p2
    assert ("b.example", "b.example") in got      # relative -> self
    assert ("b.example", "c.example") in got      # protocol-relative
    assert not any(s == "" for s, _ in got)


def test_pagerank_bit_equal_to_sequential():
    edges = extract_links(_pages_ds())
    got = pagerank(edges, iters=15)
    exp = pagerank_seq(extract_links_seq([u for u, _ in PAGES],
                                         [h for _, h in PAGES]),
                       iters=15)
    assert got.to_pydict() == exp.to_pydict()     # bit-exact int64


def test_pagerank_random_graph_bit_equal():
    rng = np.random.default_rng(7)
    hosts = [f"h{i}.example" for i in range(40)]
    pairs = [(hosts[int(a)], hosts[int(b)])
             for a, b in rng.integers(0, 40, size=(300, 2))]
    ds = rd.from_arrow(pa.table({
        "src_host": pa.array([s for s, _ in pairs], pa.string()),
        "dst_host": pa.array([d for _, d in pairs], pa.string()),
    })).repartition(5)
    got = pagerank(ds, iters=10)
    exp = pagerank_seq(pairs, iters=10)
    assert got.to_pydict() == exp.to_pydict()
    # mass conservation within rounding: total stays near 2^30
    total = sum(got.column("rank").to_pylist())
    assert abs(total - (1 << 30)) < (1 << 30) * 0.2


def test_pagerank_dangling_and_empty():
    # b has no out-links: its mass redistributes, ranks stay positive
    ds = rd.from_arrow(pa.table({
        "src_host": pa.array(["a", "a"], pa.string()),
        "dst_host": pa.array(["b", "c"], pa.string()),
    }))
    t = pagerank(ds, iters=8)
    assert set(t.column("host").to_pylist()) == {"a", "b", "c"}
    assert all(r > 0 for r in t.column("rank").to_pylist())

    empty = rd.from_arrow(pa.table({
        "src_host": pa.array([], pa.string()),
        "dst_host": pa.array([], pa.string())}))
    assert pagerank(empty, iters=3).num_rows == 0


def test_pagerank_distributed_loop_bit_equal_to_fast_path():
    """Forcing small_graph_rows=0 exercises the per-iteration
    distributed partial-fold loop; integer arithmetic makes it
    bit-identical to the single-array fast path and the oracle."""
    rng = np.random.default_rng(3)
    hosts = [f"h{i}" for i in range(25)]
    pairs = [(hosts[int(a)], hosts[int(b)])
             for a, b in rng.integers(0, 25, size=(120, 2))]
    ds = rd.from_arrow(pa.table({
        "src_host": pa.array([s for s, _ in pairs], pa.string()),
        "dst_host": pa.array([d for _, d in pairs], pa.string()),
    })).repartition(4)
    slow = pagerank(ds, iters=7, small_graph_rows=0)
    fast = pagerank(ds, iters=7)
    exp = pagerank_seq(pairs, iters=7)
    assert slow.to_pydict() == fast.to_pydict() == exp.to_pydict()


def test_src_userinfo_strip_symmetric():
    """user@h.example as SOURCE collapses to h.example — same rule as
    destinations (review finding: the two sides once disagreed)."""
    ds = rd.from_arrow(pa.table({
        "url": pa.array(["http://user@h.example/p"], pa.string()),
        "html": pa.array(['<a href="http://h.example/x">l</a>'],
                         pa.string()),
    }))
    got = [(r["src_host"], r["dst_host"])
           for r in extract_links(ds).take_all()]
    assert got == [("h.example", "h.example")]
    exp = extract_links_seq(["http://user@h.example/p"],
                            ['<a href="http://h.example/x">l</a>'])
    assert got == exp
