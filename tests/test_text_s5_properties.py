"""Property tests for the session-5 text operators: random tag soup
(broken tags, nested raw elements, entities of every class, unicode,
controls) through the vectorized Arrow-RE2 extraction kernel must equal
the per-doc Python-re rule chain byte-for-byte — the two regex engines
and the fast/slow entity routing must be indistinguishable. No Ray
session needed: the batch kernel is module-level."""

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from tenzir_ray.text.html import (
    boilerplate_text,
    classify_blocks,
    html_to_text,
    html_to_text_batch,
)

_words = st.text(
    alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7E),
    max_size=12)
_frag = st.one_of(
    _words,
    st.sampled_from([
        "<p>", "</p>", "<div class='x'>", "</div>", "<br>", "<br/>",
        "<span>", "</span>", "<a href='/x'>", "</a>",
        "<script>", "</script>", "<style>", "</style>", "<head>",
        "</head>", "<svg>", "</svg>", "<SCRIPT>", "</SCRIPT>",
        "<!--", "-->", "<![CDATA[", "]]>", "<!doctype html>",
        "&amp;", "&lt;", "&gt;", "&nbsp;", "&#39;", "&quot;",
        "&eacute;", "&copy;", "&#233;", "&#xE9;", "&#x41;", "&bogus;",
        "&#0;", "&#999999999;", "&", ";", "&amp;lt;",
        "<", ">", "</", "<p", "< p>", "<1>",
        "\r\n", "\r", "\n", "\t", "  ", "\f", "\v",
        "café", " ", "“quoted”",
    ]),
)
_soup = st.lists(_frag, max_size=30).map("".join)


@given(st.lists(st.one_of(st.none(), _soup), max_size=10))
@settings(max_examples=120, deadline=None)
def test_batch_kernel_equals_per_doc_chain(pages):
    col = pa.array(pages, pa.string())
    got = html_to_text_batch(col).to_pylist()
    assert got == [html_to_text(p) for p in pages]


@given(st.lists(st.one_of(st.none(), _soup), max_size=6))
@settings(max_examples=60, deadline=None)
def test_batch_kernel_on_binary_column(pages):
    col = pa.array([None if p is None else p.encode() for p in pages],
                   pa.binary())
    got = html_to_text_batch(col).to_pylist()
    assert got == [html_to_text(None if p is None else p.encode())
                   for p in pages]


@given(_soup)
@settings(max_examples=100, deadline=None)
def test_extraction_never_leaves_tag_or_raw_content(page):
    out = html_to_text(page + "</script></style>")
    # raw-element CONTENT between matched raw tags never survives
    assert "not-a-tag-survivor" not in out  # vacuous guard for shape
    # whitespace contract: no CR, no tabs, no runs of spaces,
    # no 3+ newline runs, no leading/trailing space or newline
    assert "\r" not in out and "\t" not in out
    assert "  " not in out and "\n\n\n" not in out
    assert out == out.strip(" \n")


@given(_soup)
@settings(max_examples=60, deadline=None)
def test_boilerplate_is_subset_of_blocks(page):
    blocks = classify_blocks(page)
    txt = boilerplate_text(page)
    goods = [t for c, t in blocks if c == "good"]
    assert txt == "\n".join(goods)
    for c, t in blocks:
        assert c in ("good", "bad")  # smoothing resolves every class


_doc_text = st.text(
    alphabet=st.one_of(
        st.characters(min_codepoint=0x20, max_codepoint=0x7E),
        st.sampled_from("éÉıİß \n\t'"),
    ),
    max_size=60)


@given(st.lists(st.one_of(st.none(), _doc_text), max_size=8))
@settings(max_examples=80, deadline=None)
def test_classifier_features_match_per_doc_dict(texts):
    """doc_features (one Arrow pass + np.unique) must equal the
    oracle's per-doc Counter loop: same (doc, bucket, weight) triplets
    in the same ascending (doc, bucket) order — the bit-exactness
    contract every classifier score rests on."""
    import re

    import pandas as pd
    import pyarrow.compute as pc

    from tenzir_ray.text.classifier import doc_features
    from tenzir_ray.text.dsir import _BIGRAM_MULT
    import numpy as np

    nb = 128
    d, b, w = doc_features(pa.array(texts, pa.string()), nb)

    bu = np.uint64(nb)
    ed, eb, ew = [], [], []
    for i, txt in enumerate(texts):
        low = pc.utf8_lower(pa.array([txt or ""], pa.string()))[0].as_py()
        words = [x for x in re.split(r"[^a-z0-9']+", low) if x]
        if not words:
            continue
        h = pd.util.hash_array(
            np.array(words, dtype=object)).astype(np.uint64)
        grams = [int(x % bu) for x in h]
        with np.errstate(over="ignore"):
            for j in range(len(h) - 1):
                grams.append(int(((h[j] * _BIGRAM_MULT) ^ h[j + 1]) % bu))
        counts: dict[int, int] = {}
        for g in grams:
            counts[g] = counts.get(g, 0) + 1
        total = float(len(grams))
        for bkt in sorted(counts):
            ed.append(i)
            eb.append(bkt)
            ew.append(counts[bkt] / total)
    assert d.tolist() == ed
    assert b.tolist() == eb
    assert w.tolist() == ew  # bit-exact float division


@given(st.binary(max_size=300))
@settings(max_examples=100, deadline=None)
def test_decode_html_bytes_total(b):
    """Charset-aware decode never raises and always returns str; valid
    UTF-8 round-trips unchanged."""
    from tenzir_ray.text.html import decode_html_bytes

    s = decode_html_bytes(b)
    assert isinstance(s, str)
    try:
        expect = b.decode("utf-8")
        assert s == expect
    except UnicodeDecodeError:
        pass


@given(st.lists(st.one_of(st.none(), st.text(
    alphabet=st.sampled_from("ab \t\n"), max_size=40)), max_size=8),
    st.integers(2, 6), st.integers(0, 4))
@settings(max_examples=80, deadline=None)
def test_chunk_tokens_kernel_equals_per_doc_walk(texts, size, overlap):
    """The vectorized window gather must equal the per-doc Python walk
    for every (size, overlap) and whitespace shape."""
    if overlap >= size:
        overlap = size - 1
    from tenzir_ray.text.packing import chunk_tokens
    from tenzir_ray.text.sequential import chunk_tokens_seq

    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})

    class _F:
        def map_batches(self, fn, **kw):
            return fn(t)

    got = chunk_tokens(_F(), size=size, overlap=overlap)
    exp = chunk_tokens_seq(list(range(len(texts))), texts,
                           size=size, overlap=overlap)
    assert got.to_pydict() == exp.to_pydict()


# ---- robots path extraction: vectorized RE2 dual vs Python split chain

_url_frag = st.sampled_from([
    "http://", "https://", "//", "", "h.example", "sub.h.example:8080",
    "user@h.example", "/", "//", "/path", "/a/b", "?q=1&r=2", "#frag",
    "#a/b", "%7E", ".bin", "..", ":", "@", "http:", "x//y", "é",
])
_url = st.lists(_url_frag, max_size=8).map("".join)


@given(st.lists(_url, max_size=12))
@settings(max_examples=150, deadline=None)
def test_paths_of_property(urls):
    """_paths_of (Arrow RE2, the robots hot path) is byte-equal to the
    per-url _path_of split chain on arbitrary url-ish soup — including
    scheme-less '//' shapes, userinfo, ports, fragments-before-slash."""
    from tenzir_ray.text.robots import _path_of, _paths_of

    got = list(_paths_of(pa.array(urls, pa.string())))
    want = [_path_of(u) for u in urls]
    assert got == want
