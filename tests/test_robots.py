"""robots.txt parsing + crawl-permission filtering: RFC 9309 rule
semantics, group selection, and the distributed filter vs the
sequential oracle."""

import pyarrow as pa
import ray.data as rd

from tenzir_ray.text.robots import (
    allowed,
    parse_robots,
    robots_filter,
)
from tenzir_ray.text.sequential import robots_seq

BODY_A = """
User-agent: *
Disallow: /private/
Allow: /private/ok*
Disallow: /*.pdf$
"""
BODY_B = """
User-agent: megabot
User-agent: superbot
Disallow: /

User-agent: *
Disallow: /tmp/
"""
ROBOTS = {"a.example": BODY_A, "b.example": BODY_B}


def test_rule_semantics():
    g = parse_robots(BODY_A)
    assert not allowed(g, "/private/x")
    assert allowed(g, "/private/okay")        # longest match: Allow
    assert not allowed(g, "/doc.pdf")         # $ anchor
    assert allowed(g, "/doc.pdfx")
    assert allowed(g, "/open")
    assert allowed(g, "/")                    # no rule matches


def test_group_selection():
    g = parse_robots(BODY_B)
    assert not allowed(g, "/anything", agent="MegaBot/2.1")
    assert not allowed(g, "/x", agent="superbot")
    assert not allowed(g, "/tmp/x", agent="otherbot")
    assert allowed(g, "/x", agent="otherbot")


def test_parse_edge_cases():
    # empty Disallow = allow-all; comments; unknown fields; no groups
    g = parse_robots("User-agent: *\nDisallow:  # nothing\n")
    assert allowed(g, "/anything")
    assert parse_robots(None) == {}
    assert parse_robots("just junk\n") == {}
    assert allowed({}, "/x")


def test_filter_matches_sequential():
    urls = [
        "http://a.example/private/secret",
        "http://a.example/private/okay",
        "http://a.example/file.pdf",
        "http://b.example/tmp/x",
        "http://b.example/fine",
        "http://unknown.example/whatever",
        None,
    ]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(urls)), pa.int64()),
        "url": pa.array(urls, pa.string()),
    })).repartition(3)
    got = [r["url"] for r in
           robots_filter(ds, ROBOTS).sort("doc_id").take_all()]
    exp = robots_seq(urls, ROBOTS)
    # None url → host "", no robots entry → allowed (engine keeps "")
    assert [u for u in got if u] == [u for u in exp if u]
    assert "http://a.example/private/okay" in got
    assert "http://a.example/private/secret" not in got
    assert "http://unknown.example/whatever" in got


def test_filter_agent_and_invert():
    ds = rd.from_arrow(pa.table({
        "url": pa.array(["http://b.example/ok"], pa.string())}))
    assert robots_filter(ds, ROBOTS, agent="megabot").count() == 0
    assert robots_filter(ds, ROBOTS, agent="megabot",
                         invert=True).count() == 1


def test_paths_of_matches_path_of():
    """Vectorized path extraction is byte-equal to the per-url Python
    dual, including the edge shapes where a naive scheme regex diverges
    from split('//', 1)."""
    from tenzir_ray.text.robots import _path_of, _paths_of

    urls = [
        "http://h.example/a/b?q=1#frag",
        "https://h.example",            # bare host → "/"
        "http://h.example/",            # root
        "//h.example/x",                # protocol-relative
        "h.example/x/y",                # scheme-less
        "a/b//c",                       # scheme-less with // in path
        "http://h.example/a//b",        # double slash in path
        "http://h#frag/x",              # '#' before first '/'
        "http://h.example/x#f/g",       # fragment containing '/'
        "",                             # empty
        "http://h.example/%7Euser/%2F", # percent-encoding kept literal
        "ftp://h.example/d",            # other scheme
    ]
    got = list(_paths_of(pa.array(urls, pa.string())))
    want = [_path_of(u) for u in urls]
    assert got == want


def test_vectorized_matcher_matches_allowed():
    """The per-host RE2 rule kernel (longest-match + Allow tie) agrees
    with the sequential allowed() walk on every rule class, including
    the $-anchored and *-wildcard rules."""
    from tenzir_ray.text.robots import _path_of

    urls = [
        f"http://a.example{p}" for p in [
            "/private/x", "/private/okay", "/private/ok", "/doc.pdf",
            "/doc.pdfx", "/deep/doc.pdf", "/", "/open",
        ]
    ] + ["http://b.example/tmp/x", "http://b.example/ok"]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(urls)), pa.int64()),
        "url": pa.array(urls, pa.string()),
    })).repartition(2)
    got = sorted(r["url"] for r in robots_filter(ds, ROBOTS).take_all())
    exp = sorted(robots_seq(urls, ROBOTS))
    assert got == exp
    assert "http://a.example/doc.pdfx" in got      # $ anchor respected
    assert "http://a.example/deep/doc.pdf" not in got  # * wildcard
