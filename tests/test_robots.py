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
