"""Text normalization for web-extracted corpora: Unicode NFC, control
character stripping, whitespace collapsing, and deterministic mojibake
repair (the ftfy "UTF-8 decoded as Latin-1" class).

The cleanup every Common-Crawl-style pipeline runs before dedup and
quality scoring — fingerprints and n-gram hashes are byte-sensitive,
so "café" in NFC, NFD and mojibake ("cafÃ©") must collapse to ONE form
first or near-dup recall silently drops.

Rules (applied in this order per document):

1. **mojibake repair**: if the text contains a UTF-8-as-Latin-1 marker
   (``Ã``/``Â``/``â€``-class sequences) and ``encode('latin-1')``
   round-trips to valid UTF-8, replace the text with that decoding —
   repeated up to ``max_fix_rounds`` times (double-encoded text).
   Texts without markers are untouched (no false repairs of real
   Latin-1 prose).
2. **NFC normalization** (``unicodedata.normalize``).
3. **control stripping**: C0/C1 controls and zero-width characters
   removed, except ``\\t`` and ``\\n``; ``\\r\\n``/``\\r`` become
   ``\\n`` first.
4. **whitespace collapse** (optional, off by default): runs of spaces
   and tabs become one space; leading/trailing whitespace per line
   trimmed.

Scale shape: embarrassingly parallel ``map_batches``. The hot path is
vectorized — an Arrow ``is ASCII + marker`` pre-filter routes the
(typically overwhelming) clean-ASCII majority through zero-copy regex
kernels only; the per-doc Python fallback (unicodedata, latin-1 round
trip) runs ONLY for docs that are non-ASCII or carry mojibake markers.
No shuffle, no driver state.

No reference analog (Tenzir has no corpus-text ops); public recipe
(ftfy, Speer 2019; Unicode TR#15). Checked byte-for-byte against
:func:`tenzir_ray.text.sequential.normalize_seq`.
"""

from __future__ import annotations

import re
import unicodedata

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

# Mojibake markers: a UTF-8 lead byte (2-byte 0xC2-0xDF, 3-byte
# 0xE0-0xEF) read as Latin-1/cp1252, followed by a character that
# continuation bytes 0x80-0xBF display as -- either the Latin-1
# block U+0080-U+00BF or the visible cp1252 punctuation for
# 0x80-0x9F (Euro sign, smart quotes, dashes, OE ligatures, ...).
_CONT_VIS = ("\u0080-\u00bf"
             "\u20ac\u201a\u0192\u201e\u2026\u2020\u2021"
             "\u02c6\u2030\u0160\u2039\u0152\u017d"
             "\u2018\u2019\u201c\u201d\u2022\u2013\u2014"
             "\u02dc\u2122\u0161\u203a\u0153\u017e\u0178")
_MOJIBAKE_MARK = re.compile(
    "[\u00c2-\u00df][" + _CONT_VIS + "]"
    "|[\u00e0-\u00ef][" + _CONT_VIS + "]{2}")
# controls except tab/newline; DEL + C1; zero-width chars; BOM
_CTRL_RE = ("[\\x00-\\x08\\x0b-\\x1f\\x7f-\\x9f"
            "\u200b-\u200d\ufeff]")
_WS_RE = r"[ \t]+"


# sloppy cp1252 (the ftfy convention): the five bytes cp1252 leaves
# undefined (0x81 0x8D 0x8F 0x90 0x9D) map to their C1 codepoints,
# so real-world mojibake containing them still round-trips
_SLOPPY_ENC: dict[str, int] = {}
for _b in range(256):
    try:
        _ch = bytes([_b]).decode("cp1252")
    except UnicodeDecodeError:
        _ch = chr(_b)
    _SLOPPY_ENC[_ch] = _b


def _fix_mojibake(s: str, max_rounds: int = 3) -> str:
    for _ in range(max_rounds):
        if not _MOJIBAKE_MARK.search(s):
            return s
        repaired = None
        # latin-1 first (an exact byte inverse), then sloppy cp1252
        # (the web default; 0x80-0x9F as punctuation)
        try:
            repaired = s.encode("latin-1").decode("utf-8")
        except (UnicodeEncodeError, UnicodeDecodeError):
            try:
                raw = bytes(_SLOPPY_ENC[ch] for ch in s)
                repaired = raw.decode("utf-8")
            except (KeyError, UnicodeDecodeError):
                repaired = None
        if repaired is None or repaired == s:
            return s
        s = repaired
    return s

def _normalize_once(s: str, collapse_ws: bool,
                    max_fix_rounds: int) -> str:
    s = _fix_mojibake(s, max_fix_rounds)
    s = unicodedata.normalize("NFC", s)
    s = s.replace("\r\n", "\n").replace("\r", "\n")
    s = re.sub(_CTRL_RE, "", s)
    if collapse_ws:
        s = re.sub(_WS_RE, " ", s)
        s = re.sub(r" ?\n ?", "\n", s)
        s = s.strip(" ")
    return s


def normalize_text(s: str | None, *, collapse_ws: bool = False,
                   max_fix_rounds: int = 3) -> str:
    """One document through the full rule chain, iterated to a
    FIXPOINT (≤8 rounds; clean text stabilizes after one): stripping a
    control/zero-width character can create a new mojibake adjacency
    ("\u00c2\x00\u00a9" → "\u00c2\u00a9" → "\u00a9"), so a single
    pass is not idempotent — and idempotence is the property dedup
    fingerprints downstream rely on. Also the per-doc slow path of the
    batch kernel and the sequential-oracle kernel (both paths share
    ONE implementation of the non-vectorizable steps by design)."""
    if s is None:
        return ""
    for _ in range(8):
        out = _normalize_once(s, collapse_ws, max_fix_rounds)
        if out == s:
            return out
        s = out
    return s


def normalize_documents(
    ds: Dataset, text_col: str = "text", *, collapse_ws: bool = False,
    max_fix_rounds: int = 3,
) -> Dataset:
    """Dataset stage: ``text_col`` replaced by its normalized form.
    ASCII docs without controls ride the vectorized Arrow path; only
    non-ASCII / marker / control docs take the per-doc fallback."""
    def kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        col = t.column(text_col)
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
            else col
        col = pc.fill_null(col, "")
        n_chars = pc.utf8_length(col)
        ascii_mask = pc.equal(n_chars, pc.binary_length(col))
        has_ctrl = pc.match_substring_regex(col, "[\x00-\x08\x0b-\x1f\x7f]")
        fast = pc.and_(ascii_mask, pc.invert(has_ctrl)).to_numpy(
            zero_copy_only=False).astype(bool)
        if collapse_ws:
            fast_col = pc.replace_substring_regex(col, _WS_RE, " ")
            fast_col = pc.replace_substring_regex(fast_col, r" ?\n ?", "\n")
            fast_col = pc.utf8_trim(fast_col, " ")
        else:
            fast_col = col
        out = fast_col.to_numpy(zero_copy_only=False).astype(object)
        slow = np.flatnonzero(~fast)
        for i in slow:
            out[i] = normalize_text(
                col[int(i)].as_py(), collapse_ws=collapse_ws,
                max_fix_rounds=max_fix_rounds)
        idx = t.schema.get_field_index(text_col)
        t = t.set_column(idx, text_col, pa.array(out, pa.string()))
        return t.replace_schema_metadata(None) if t.schema.metadata else t

    return ds.map_batches(kernel, batch_format="pyarrow")
