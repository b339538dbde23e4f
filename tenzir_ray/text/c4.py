"""C4-style corpus cleaning (Raffel et al. 2020, "Exploring the Limits
of Transfer Learning with a Unified Text-to-Text Transformer" §2.2 —
the public C4 recipe), re-expressed Ray-Data-first:

* **line filters** (per page, map-only): keep only lines that end in a
  terminal punctuation mark, contain at least ``min_words`` words, and
  do not mention "javascript";
* **page filters** (map-only): after line cleaning, drop pages with
  fewer than ``min_sentences`` sentences, pages containing ``{``,
  "lorem ipsum", or any word from a caller-supplied blocklist (the
  paper's "Dirty, Naughty …" list is not shipped — pass your own);
* **three-sentence span dedup** (corpus-level): of any run of three
  consecutive sentences occurring more than once in the ENTIRE corpus,
  keep the first occurrence (smallest ``(doc_id, span index)``) and
  delete the sentences of every other occurrence.

Scale shape:

* ``c4_clean`` is one vectorized Arrow kernel — line split/flatten,
  per-line regex kernels, segment ``reduceat`` rejoin. No shuffle, no
  per-doc Python.
* ``c4_span_dedup`` ships only narrow ``(span_hash, doc_id, span_idx)``
  int64 rows through ONE salt-bucketed groupby (the line_dedup /
  exact_dedup_wide contract — corpus text never rides a shuffle); the
  loser set (duplicated spans only — small by construction) is
  concatenated in a remote task and broadcast once; the scrub pass is
  map-only. Only docs that actually contain loser spans take a
  per-doc masking path, bounded by the duplicate volume.

Sentence boundaries are the deterministic rule ``[.!?]`` followed by
whitespace (or end of text) — both passes and the sequential oracle
share it, so results are exactly comparable without an NLP tokenizer.
Span-scrubbed documents are rejoined with single spaces (whitespace
normalization, documented divergence from byte preservation).

No reference analog (Tenzir has no corpus-text ops); graded with the
dedup family as a beyond-reference training-data operator.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from tenzir_ray.text.dedup import _split_lines_arrow

_SENT_MARK = "\x1e"  # private separator injected at sentence boundaries
_SPAN_A = np.uint64(0x9E3779B97F4A7C15)
_SPAN_B = np.uint64(0xC2B2AE3D27D4EB4F)
_SALT_MASK = np.int64(255)


def _terminal_re() -> str:
    return "[.!?\"']$"


def c4_line_page_masks(
    col: pa.Array, *, min_words: int = 5, min_sentences: int = 3,
    badwords: tuple[str, ...] = (),
) -> tuple[pa.Array, pa.Array]:
    """(cleaned text, page keep mask) for a text column — the whole C4
    line+page filter in one vectorized pass."""
    flat, counts = _split_lines_arrow(col, "\n")
    low = pc.utf8_lower(flat)
    keep = pc.and_(
        pc.and_(
            pc.match_substring_regex(flat, _terminal_re()),
            pc.greater_equal(pc.count_substring_regex(flat, r"\S+"),
                             min_words)),
        pc.invert(pc.match_substring(low, "javascript")))
    keep_np = keep.to_numpy(zero_copy_only=False).astype(bool)
    starts = np.r_[0, np.cumsum(counts[:-1])]
    # counts >= 1 per doc (fill_null upstream), so reduceat is safe
    kept_per_doc = np.add.reduceat(keep_np.astype(np.int64), starts) \
        if len(keep_np) else np.zeros(len(counts), np.int64)
    kept_lines = flat.filter(pa.array(keep_np))
    offsets = pa.array(np.r_[0, np.cumsum(kept_per_doc)], pa.int32())
    cleaned = pc.binary_join(
        pa.ListArray.from_arrays(offsets, kept_lines), "\n")
    cl_low = pc.utf8_lower(cleaned)
    # sentence count: [.!?] followed by whitespace, +1 if the text ends
    # on a terminal mark (the last sentence has no trailing whitespace)
    n_sent = pc.add(
        pc.count_substring_regex(cleaned, r"[.!?]\s"),
        pc.cast(pc.match_substring_regex(cleaned, r"[.!?]$"), pa.int64()))
    page = pc.and_(
        pc.greater_equal(n_sent, min_sentences),
        pc.and_(pc.invert(pc.match_substring(cleaned, "{")),
                pc.invert(pc.match_substring(cl_low, "lorem ipsum"))))
    for w in badwords:
        page = pc.and_(page, pc.invert(pc.match_substring(cl_low, w)))
    return cleaned, page


def c4_clean(
    ds: Dataset, text_col: str = "text", *, min_words: int = 5,
    min_sentences: int = 3, badwords: tuple[str, ...] = (),
) -> Dataset:
    """Apply the C4 line + page filters: rows keep their other columns,
    ``text_col`` is replaced by the line-cleaned text, filtered pages
    disappear. Map-only."""
    def kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        cleaned, page = c4_line_page_masks(
            t.column(text_col), min_words=min_words,
            min_sentences=min_sentences, badwords=badwords)
        idx = t.schema.get_field_index(text_col)
        t = t.set_column(idx, text_col, cleaned).filter(page)
        return t.replace_schema_metadata(None) if t.schema.metadata else t

    return ds.map_batches(kernel, batch_format="pyarrow")


def _sentences(col: pa.Array) -> tuple[pa.Array, np.ndarray]:
    """Flatten sentences of every doc: mark boundaries (terminal mark +
    whitespace) with a private separator, split, trim. Returns the flat
    sentence array and per-doc counts (>= 1; empty docs yield one empty
    sentence)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    arr = pc.fill_null(arr, "")
    marked = pc.replace_substring_regex(
        arr, r"([.!?])\s+", "\\1" + _SENT_MARK)
    la = pc.split_pattern(marked, pattern=_SENT_MARK)
    counts = pc.list_value_length(la).to_numpy(
        zero_copy_only=False).astype(np.int64)
    return pc.list_flatten(la), counts


def _span_hashes(flat: pa.Array, counts: np.ndarray
                 ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(span_hash int64-view, doc index, span idx) for every
    3-sentence window of every doc (docs with <3 sentences emit no
    spans)."""
    if len(flat) == 0:
        z = np.zeros(0, np.int64)
        return z, z, z
    h = pd.util.hash_array(
        flat.to_numpy(zero_copy_only=False)).astype(np.uint64)
    doc = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    ok = (doc[:-2] == doc[2:]) if len(h) > 2 else np.zeros(0, bool)
    with np.errstate(over="ignore"):
        tri = (h[:-2] * _SPAN_A) ^ (h[1:-1] * _SPAN_B) ^ h[2:] \
            if len(h) > 2 else np.zeros(0, np.uint64)
    tri = tri[ok].view(np.int64)
    sdoc = doc[:-2][ok] if len(h) > 2 else np.zeros(0, np.int64)
    starts = np.r_[0, np.cumsum(counts[:-1])]
    pos = np.arange(len(h), dtype=np.int64) - np.repeat(starts, counts)
    sidx = pos[:-2][ok] if len(h) > 2 else np.zeros(0, np.int64)
    return tri, sdoc, sidx


def c4_span_dedup(
    ds: Dataset, id_col: str = "doc_id", text_col: str = "text",
) -> Dataset:
    """Corpus-level C4 three-sentence-span dedup. One narrow exchange,
    broadcast loser set, map-only scrub; survivors' sentences are
    rejoined with single spaces. The input is materialized once (blocks
    pinned in the object store, spillable) because both the span pass
    and the scrub pass consume it — without this, the entire upstream
    (source scan + cleaning kernels) would execute twice."""
    import ray

    ds = ds.materialize()

    def spans(t: pa.Table) -> pa.Table:
        flat, counts = _sentences(t.column(text_col))
        tri, sdoc, sidx = _span_hashes(flat, counts)
        ids = t.column(id_col).combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        return pa.table({
            "h": pa.array(tri, pa.int64()),
            "d": pa.array(ids[sdoc], pa.int64()),
            "i": pa.array(sidx, pa.int64()),
            "hs": pa.array(tri & _SALT_MASK, pa.int64())})

    def losers(g: pa.Table) -> pa.Table:
        # one group = one salt slice of span hashes; everything but the
        # global-first (min doc, then min idx) per hash, one numpy pass
        if g.num_rows == 0 or "h" not in g.column_names:
            return pa.table({"d": pa.array([], pa.int64()),
                             "i": pa.array([], pa.int64())})
        idx = pc.sort_indices(g, sort_keys=[
            ("h", "ascending"), ("d", "ascending"), ("i", "ascending")])
        g = g.take(idx)
        h = g.column("h").to_numpy(zero_copy_only=False)
        firsts = np.r_[True, h[1:] != h[:-1]]
        return g.filter(pa.array(~firsts)).select(["d", "i"])

    drop = (ds.map_batches(spans, batch_format="pyarrow")
            .groupby("hs").map_groups(losers, batch_format="pyarrow"))

    @ray.remote
    def concat(*parts):
        # drop Ray's schema-less empty blocks (groups with no losers)
        parts = [p for p in parts if p.num_rows and "d" in p.schema.names]
        t = pa.concat_tables(parts) if parts else pa.table(
            {"d": pa.array([], pa.int64()), "i": pa.array([], pa.int64())})
        d = t.column("d").to_numpy(zero_copy_only=False)
        i = t.column("i").to_numpy(zero_copy_only=False)
        order = np.lexsort((i, d))
        return d[order], i[order]

    # loser set = duplicated spans only; small by construction (same
    # bound argument as line_dedup's boilerplate set)
    refs = drop.to_arrow_refs()
    drop_ref = concat.remote(*refs)

    def scrub(t: pa.Table) -> pa.Table:
        ld, li = ray.get(drop_ref)
        if t.num_rows == 0 or len(ld) == 0:
            return t.replace_schema_metadata(None) \
                if t.schema.metadata else t
        flat, counts = _sentences(t.column(text_col))
        ids = t.column(id_col).combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        affected = np.isin(ids, ld)
        if not affected.any():
            return t.replace_schema_metadata(None) \
                if t.schema.metadata else t
        sents = flat.to_numpy(zero_copy_only=False)
        starts = np.r_[0, np.cumsum(counts[:-1])]
        out = t.column(text_col).combine_chunks().to_numpy(
            zero_copy_only=False).astype(object)
        # per-AFFECTED-doc masking, bounded by the duplicate volume
        for r in np.flatnonzero(affected):
            lo = np.searchsorted(ld, ids[r], "left")
            hi = np.searchsorted(ld, ids[r], "right")
            n = counts[r]
            diff = np.zeros(n + 3, np.int64)
            sp = li[lo:hi]
            sp = sp[sp < n]
            np.add.at(diff, sp, 1)
            np.add.at(diff, sp + 3, -1)
            dead = np.cumsum(diff[:n]) > 0
            seg = sents[starts[r]:starts[r] + n][~dead]
            out[r] = " ".join(seg)
        idx = t.schema.get_field_index(text_col)
        t = t.set_column(idx, text_col, pa.array(out, pa.string()))
        return t.replace_schema_metadata(None) if t.schema.metadata else t

    return ds.map_batches(scrub, batch_format="pyarrow")
