"""HTML extraction + jusText-lite boilerplate removal: the vectorized
Arrow-RE2 kernel vs the per-doc rule chain, the rare-entity fallback
routing, block classification, and malformed-input behavior."""

import pyarrow as pa
import ray.data as rd

from tenzir_ray.text.html import (
    boilerplate_extract,
    boilerplate_text,
    classify_blocks,
    html_extract,
    html_to_text,
)
from tenzir_ray.text.sequential import html_to_text_seq, justext_seq

GOOD_PARA = ("This is the main article text and it has enough words "
             "to be a real paragraph: the quick brown fox jumps over "
             "the lazy dog while we are reading about it, and that is "
             "the whole point of the story they tell.")

PAGES = [
    (0, b"<html><head><title>T</title></head><body>"
        b"<p>Hello &amp; welcome</p></body></html>"),
    (1, b"<p>a<script>var x='<b>not text</b>';</script>b</p>"),
    (2, b"<style>p{}</style><div>block one</div><div>block two</div>"),
    (3, b"<!-- note --><p>kept</p><!-- unterminated"),
    (4, b"<p>A&lt;B&gt;C&quot;D&#39;E&nbsp;F&amp;G</p>"),
    (5, b"<p>rare &eacute; &#233; &#xE9; &unknown; &#0; refs</p>"),
    (6, b"one<br>two<BR/>three"),
    (7, b"  <p>  spaced   out  </p>\r\n\r\n<p>next</p>  "),
    (8, None),
    (9, b""),
    (10, b"no tags at all, just text"),
    (11, "café <p>déjà vu</p>".encode()),
    (12, b"<p>broken <tag never closes"),
    (13, b"<svg><circle r='1'/><text>svg text gone</text></svg>after"),
    (14, b"<P CLASS='x'>case insensitive</P>"),
    (15, b"<p>&amp;lt; decodes ONCE</p>"),
]


def _ds(parts=3):
    ids, pages = zip(*PAGES)
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "html": pa.array(pages, pa.binary())})).repartition(parts)


def test_rules():
    out = {i: html_to_text(h) for i, h in PAGES}
    assert out[0] == "Hello & welcome"      # head (incl. title) removed
    assert out[1] == "a b"                      # script content gone
    assert out[2] == "block one\n\nblock two"
    assert out[3] == "kept"
    assert out[4] == "A<B>C\"D'E F&G"
    assert out[5] == "rare é é é &unknown; &#0; refs"
    assert out[6] == "one\ntwo\nthree"
    assert out[7] == "spaced out\n\nnext"
    assert out[8] == "" and out[9] == ""
    assert out[10] == "no tags at all, just text"
    assert out[11] == "café\ndéjà vu"
    assert out[12] == "broken"                  # unterminated tag → strip
    assert out[13] == "after"                   # svg removed whole
    assert out[14] == "case insensitive"
    assert out[15] == "&lt; decodes ONCE"       # &amp; last, no rescan


def test_engine_matches_sequential_byte_for_byte():
    got = html_extract(_ds()).sort("doc_id").take_all()
    exp = html_to_text_seq([i for i, _ in PAGES], [h for _, h in PAGES])
    assert [(r["doc_id"], r["text"]) for r in got] == list(zip(
        exp.column("doc_id").to_pylist(), exp.column("text").to_pylist()))


def test_string_column_and_drop():
    ds = rd.from_arrow(pa.table({
        "html": pa.array(["<p>x</p>"], pa.string())}))
    got = html_extract(ds, drop_html=True).take_all()
    assert got == [{"text": "x"}]


def test_invalid_utf8_binary():
    ds = rd.from_arrow(pa.table({
        "html": pa.array([b"<p>ok \xff\xfe bytes</p>"], pa.binary())}))
    got = html_extract(ds).take_all()[0]["text"]
    assert got == html_to_text(b"<p>ok \xff\xfe bytes</p>")
    assert "�" in got


def test_classify_blocks():
    page = (
        "<div><a href='/'>home</a> <a href='/x'>about</a></div>"
        f"<p>{GOOD_PARA}</p>"
        "<p>short note here</p>"
        f"<p>{GOOD_PARA} {GOOD_PARA}</p>"
        "<div>no stopwords just nouns verbs adjectives qwert yuiop "
        "asdf ghjkl zxcvb lorem word token gram text page site html "
        "css font color width height margin padding border pixel</div>"
    )
    cls = [c for c, _ in classify_blocks(page)]
    assert cls[0] == "bad"          # nav: link density 1.0
    assert cls[1] == "good"         # long + stopword-dense
    assert cls[2] == "good"         # short, between good neighbors
    assert cls[3] == "good"
    assert cls[4] == "bad"          # long but stopword-free
    txt = boilerplate_text(page)
    assert "short note here" in txt and "home" not in txt
    assert "qwert" not in txt


def test_boilerplate_engine_matches_sequential():
    ids = list(range(6))
    pages = [
        f"<div><a href=x>l1</a><a href=y>l2</a></div><p>{GOOD_PARA}</p>"
        "<p>tail</p>".encode(),
        b"<p>only a tiny page</p>",
        f"<article>{GOOD_PARA}</article>".encode(),
        None,
        b"",
        (f"<p>{GOOD_PARA}</p><div>x</div><p>{GOOD_PARA}</p>").encode(),
    ]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "html": pa.array(pages, pa.binary())})).repartition(2)
    # custom stoplist passed through BOTH paths (regression: justext_seq
    # once dropped **kw, silently reverting the oracle to the default)
    stop = frozenset({"the", "and", "of", "to", "a", "is", "that", "it",
                      "over", "while", "we", "about"})
    got = boilerplate_extract(ds, concurrency=2, stoplist=stop) \
        .sort("doc_id").take_all()
    exp = justext_seq(ids, pages, stoplist=stop)
    assert [(r["doc_id"], r["text"]) for r in got] == list(zip(
        exp.column("doc_id").to_pylist(), exp.column("text").to_pylist()))


def test_extract_idempotent_on_tagless_text():
    # extracting already-extracted text is identity when no '&' or '<'
    # survives (entity decoding is single-scan, not idempotent by spec)
    for _, h in PAGES:
        once = html_to_text(h)
        if "&" not in once and "<" not in once:
            assert html_to_text(once) == once


def test_charset_sniffing():
    from tenzir_ray.text.html import decode_html_bytes

    # valid UTF-8 wins even with a (wrong) declaration
    b = '<meta charset="windows-1252"><p>café</p>'.encode("utf-8")
    assert "café" in decode_html_bytes(b)
    # invalid UTF-8 + declared cp1252 → smart quotes decode
    b = b'<meta charset="windows-1252"><p>\x93quoted\x94 caf\xe9</p>'
    s = decode_html_bytes(b)
    assert "“quoted”" in s and "café" in s
    # declared latin-1
    b = b"<meta http-equiv='Content-Type' content='text/html; " \
        b"charset=ISO-8859-1'><p>caf\xe9</p>"
    assert "café" in decode_html_bytes(b)
    # no declaration, invalid bytes → replacement chars
    assert "�" in decode_html_bytes(b"caf\xe9 plain")


def test_charset_batch_parity():
    pages = [
        b'<meta charset="windows-1252"><p>\x93q\x94 ok</p>',
        b"<p>plain utf8 caf\xc3\xa9</p>",
        b"\xff\xfe garbage",
        None,
    ]
    ds = rd.from_arrow(pa.table({"html": pa.array(pages, pa.binary())}))
    got = [r["text"] for r in html_extract(ds).take_all()]
    assert got == [html_to_text(p) for p in pages]
