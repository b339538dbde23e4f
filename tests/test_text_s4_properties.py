"""Property tests for the session-4 text operators: random corpora
(including unicode, controls and mojibake-shaped noise) through the
distributed kernels must equal the sequential references exactly.

These run WITHOUT Ray datasets where the kernel itself is the property
target (normalize: scalar vs vectorized batch kernel routing; dsir:
gram extraction); Ray-backed end-to-end equality is covered by the
deterministic fixtures in the sibling test files.
"""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

# text with ASCII, Latin-1-ish chars, combining marks, controls,
# zero-width chars, and raw mojibake-alphabet characters
_noise_text = st.text(
    alphabet=st.one_of(
        st.characters(min_codepoint=0x20, max_codepoint=0x7E),
        st.sampled_from("\t\n\r\x00\x07\x7f"),
        st.sampled_from("ÂÃ©¿â€œ"
                        "“–́̈​﻿é"),
    ),
    max_size=80)


@given(st.lists(st.one_of(st.none(), _noise_text), max_size=12))
@settings(max_examples=80, deadline=None)
def test_normalize_batch_kernel_equals_scalar_chain(texts):
    """The vectorized fast/slow routing in normalize_documents' kernel
    must be invisible: batch output == per-doc scalar chain."""
    from tenzir_ray.text.normalize import normalize_text
    from tenzir_ray.text.normalize import normalize_documents

    # drive the inner kernel directly (no Ray session needed): pull it
    # out via the closure the Dataset stage wraps
    import tenzir_ray.text.normalize as mod

    t = pa.table({"text": pa.array(texts, pa.string())})
    # replicate the kernel body through the public Dataset API surface:
    # map_batches isn't needed to test the batch function itself
    kernel_out = None
    class _FakeDs:
        def map_batches(self, fn, **kw):
            nonlocal kernel_out
            kernel_out = fn(t)
            return self
    normalize_documents(_FakeDs())
    got = kernel_out.column("text").to_pylist()
    assert got == [normalize_text(x) for x in texts]


@given(st.lists(st.one_of(st.none(), _noise_text), max_size=12),
       st.booleans())
@settings(max_examples=40, deadline=None)
def test_normalize_collapse_ws_property(texts, collapse):
    from tenzir_ray.text.normalize import normalize_documents, \
        normalize_text

    t = pa.table({"text": pa.array(texts, pa.string())})
    kernel_out = None
    class _FakeDs:
        def map_batches(self, fn, **kw):
            nonlocal kernel_out
            kernel_out = fn(t)
            return self
    normalize_documents(_FakeDs(), collapse_ws=collapse)
    got = kernel_out.column("text").to_pylist()
    assert got == [normalize_text(x, collapse_ws=collapse) for x in texts]


_words_text = st.text(
    alphabet=st.sampled_from("abcdefg '0123456789-,."), max_size=60)


@given(st.lists(st.one_of(st.none(), _words_text), min_size=1,
                max_size=10))
@settings(max_examples=60, deadline=None)
def test_dsir_gram_buckets_equal_sequential_grams(texts):
    """Engine gram extraction (flat Arrow split + vectorized hashing)
    must produce exactly the per-doc gram multisets of the sequential
    tokenizer, doc by doc."""
    import re

    import pandas as pd

    from tenzir_ray.text.dsir import _BIGRAM_MULT, _gram_buckets

    nb = 512
    buckets, docs = _gram_buckets(pa.array(texts, pa.string()), nb)
    got = [sorted(buckets[docs == i].tolist())
           for i in range(len(texts))]

    bu = np.uint64(nb)
    exp = []
    for txt in texts:
        words = [w for w in re.split(r"[^a-z0-9']+", (txt or "").lower())
                 if w]
        if not words:
            exp.append([])
            continue
        h = pd.util.hash_array(
            np.array(words, dtype=object)).astype(np.uint64)
        out = [int(x % bu) for x in h]
        with np.errstate(over="ignore"):
            for i in range(len(h) - 1):
                out.append(int(((h[i] * _BIGRAM_MULT) ^ h[i + 1]) % bu))
        exp.append(sorted(out))
    assert got == exp


_sent_text = st.text(
    alphabet=st.sampled_from("ab .!?\n\"'{}"), max_size=60)


@given(st.lists(st.one_of(st.none(), _sent_text), max_size=10))
@settings(max_examples=60, deadline=None)
def test_c4_masks_equal_sequential_rules(texts):
    """The vectorized line/page filter must agree with the per-doc rule
    loop on arbitrary punctuation soup."""
    import re

    from tenzir_ray.text.c4 import c4_line_page_masks

    cleaned, page = c4_line_page_masks(
        pa.array(texts, pa.string()), min_words=2, min_sentences=1)
    got = list(zip(cleaned.to_pylist(),
                   page.to_pylist()))

    exp = []
    for txt in texts:
        keep = []
        for ln in (txt or "").split("\n"):
            if not re.search(r"[.!?\"']$", ln):
                continue
            if len(re.findall(r"\S+", ln)) < 2:
                continue
            if "javascript" in ln.lower():
                continue
            keep.append(ln)
        pg = "\n".join(keep)
        n_sent = len(re.findall(r"[.!?]\s", pg)) + \
            (1 if re.search(r"[.!?]$", pg) else 0)
        ok = n_sent >= 1 and "{" not in pg and "lorem ipsum" not in pg.lower()
        exp.append((pg, ok))
    assert got == exp


@given(st.lists(st.one_of(st.none(), _noise_text), max_size=10),
       st.booleans())
@settings(max_examples=60, deadline=None)
def test_normalize_is_idempotent(texts, collapse):
    """normalize(normalize(x)) == normalize(x): NFC, control stripping
    and whitespace collapse are idempotent, and a repaired (or
    unrepairable) text must not change again on a second pass."""
    from tenzir_ray.text.normalize import normalize_text

    for x in texts:
        once = normalize_text(x, collapse_ws=collapse)
        assert normalize_text(once, collapse_ws=collapse) == once


@given(st.lists(st.one_of(st.none(), _sent_text), max_size=10))
@settings(max_examples=60, deadline=None)
def test_c4_clean_is_idempotent(texts):
    """Re-cleaning already-cleaned pages must be a no-op: surviving
    lines still pass every line filter and surviving pages every page
    filter."""
    from tenzir_ray.text.c4 import c4_line_page_masks

    cleaned, page = c4_line_page_masks(
        pa.array(texts, pa.string()), min_words=2, min_sentences=1)
    kept = [c for c, p in zip(cleaned.to_pylist(), page.to_pylist()) if p]
    again, page2 = c4_line_page_masks(
        pa.array(kept, pa.string()), min_words=2, min_sentences=1)
    assert again.to_pylist() == kept
    assert all(page2.to_pylist())
