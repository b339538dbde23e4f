"""HTML → text extraction and jusText-style boilerplate removal for
web corpora: the step between the WARC reader's raw ``html:binary``
pages and every downstream text operator (normalize → dedup → quality).

The lake's CDC invariant keeps the reference tag-strip
(:func:`tenzir_ray.cdc.wal.extract_text` — byte-identical contract);
this module is the RICH extractor a real Common-Crawl pipeline runs
instead: script/style removal, entity decoding, block structure, and
main-content selection.

``html_to_text`` rule chain (deterministic; the spec both the
distributed Arrow-RE2 path and the per-doc sequential oracle implement):

1. bytes input decodes charset-aware (``decode_html_bytes``): strict
   UTF-8 first; if invalid, the page's own ``<meta charset=…>``
   declaration (latin-1/cp1252 family); else UTF-8 with replacement.
2. comments ``<!-- … -->`` removed (non-greedy; unterminated → to end
   of document); ``<![CDATA[ … ]]>`` likewise.
3. raw-text elements removed WHOLE (content and tags): ``script``,
   ``style``, ``noscript``, ``template``, ``svg``, ``head``
   (case-insensitive; unterminated → to end).
4. block-level tags (open or close: p div br li tr h1-h6 ul ol table
   blockquote pre hr section article header footer nav aside main form
   fieldset figure figcaption details summary address dl dt dd thead
   tbody tfoot td th) become ``\\n``; every other tag (including
   ``<!doctype>``) becomes one space; a ``<``-tag that never closes
   consumes to end of document (browser-tokenizer truncation).
5. character references decode: the named HTML5 set (``&name;`` — WITH
   semicolon only, unlike ``html.unescape``'s legacy-without-semicolon
   quirk, so the vectorized and per-doc paths can't diverge) and
   numeric ``&#NNN;`` / ``&#xHH;``; ``&nbsp;`` (and U+00A0 from
   ``&#160;``) decode to a PLAIN SPACE so step 6 collapses them.
6. whitespace normalize: CRLF/CR → LF; runs of space/tab/FF/VT → one
   space; spaces adjacent to newlines dropped; 3+ newlines → exactly
   two (paragraph break); leading/trailing spaces+newlines stripped.

Scale shape: embarrassingly parallel ``map_batches``; steps 2-4 and 6
run as Arrow RE2 kernels over the whole column (zero-copy), step 5 is a
chained ``replace_substring`` for the six dominant entities with a
per-doc fallback ONLY for documents where a ``&…;`` reference survives
the chain. No shuffle, no driver state.

``boilerplate_extract`` (jusText-lite, Pomikálek 2011): the document
splits into blocks at block-level tags; each block gets link density
(visible chars inside ``<a>``), stopword density and length; blocks
classify context-free as good / near-good / short / bad and a
neighbor-smoothing pass resolves the conditional classes — the output
is the good blocks joined by newlines. Per-doc Python bounded by
document size, batch-parallel in an actor pool (classifier tables built
once per actor).

No reference analog (Tenzir has no corpus-level text operators); public
recipes: jusText (Pomikálek, PhD thesis 2011), trafilatura (Barbaresi,
ACL 2021). Oracle-checked byte-for-byte against
:func:`tenzir_ray.text.sequential.html_to_text_seq` /
``justext_seq`` via the driver queries ``html_extract_docs`` and
``boilerplate_docs``.
"""

from __future__ import annotations

import html.entities
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

# ---------------------------------------------------------------- spec
# regex fragments written to mean the same thing to RE2 (Arrow) and to
# Python re: no lookbehind, inline flags only at pattern start.

_RAW_ELEMENTS = ("script", "style", "noscript", "template", "svg", "head")
_BLOCK_TAGS = (
    "p|div|br|li|tr|h[1-6]|ul|ol|table|blockquote|pre|hr|section|article"
    "|header|footer|nav|aside|main|form|fieldset|figure|figcaption"
    "|details|summary|address|dl|dt|dd|thead|tbody|tfoot|td|th"
)

_COMMENT = r"(?s)<!--.*?(-->|$)"
_CDATA = r"(?s)<!\[CDATA\[.*?(\]\]>|$)"
_RAW = (r"(?is)<(?:" + "|".join(_RAW_ELEMENTS) + r")\b[^>]*>"
        r".*?(</(?:" + "|".join(_RAW_ELEMENTS) + r")\b[^>]*>|$)")
_BLOCK = r"(?i)</?(?:" + _BLOCK_TAGS + r")\b[^>]*/?>"
_ANYTAG = r"(?s)<[!/]?[a-zA-Z][^>]*>"
# a tag-like "<" that never closes consumes to end of document (what a
# browser tokenizer does with a truncated page)
_TAILTAG = r"(?s)<[!/]?[a-zA-Z][^>]*$"

# the six entities that dominate real web text — vectorized; &amp; LAST
# (a "&lt;" produced from "&amp;lt;" must NOT decode again, matching a
# single left-to-right scan: the chain sees no literal "&lt;" in
# "&amp;lt;", then &amp;→& yields "&lt;" exactly once).
_COMMON_ENTITIES = [
    ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"),
    ("&nbsp;", " "), ("&amp;", "&"),
]
# any surviving reference routes that document to the per-doc decoder
_ENTITY_LEFT = r"&(#[0-9]+|#[xX][0-9a-fA-F]+|[a-zA-Z][a-zA-Z0-9]{1,31});"
_ENTITY_RE = re.compile(_ENTITY_LEFT)

# html5 table, with-semicolon names only (spec step 5)
_HTML5 = {k[:-1]: v for k, v in html.entities.html5.items()
          if k.endswith(";")}


def _decode_entity(m: re.Match) -> str:
    body = m.group(1)
    if body[0] == "#":
        try:
            cp = int(body[2:], 16) if body[1] in "xX" else int(body[1:])
            ch = chr(cp) if 0 < cp <= 0x10FFFF else m.group(0)
        except (ValueError, OverflowError):
            return m.group(0)
    else:
        ch = _HTML5.get(body, m.group(0))
    return " " if ch == "\xa0" else ch


def decode_entities(s: str) -> str:
    """Spec step 5 on one string (semicolon-terminated refs only)."""
    return _ENTITY_RE.sub(_decode_entity, s)


# compiled Python forms (sequential oracle + per-doc paths)
_P_COMMENT = re.compile(_COMMENT)
_P_CDATA = re.compile(_CDATA)
_P_RAW = re.compile(_RAW)
_P_BLOCK = re.compile(_BLOCK)
_P_ANYTAG = re.compile(_ANYTAG)
_P_TAILTAG = re.compile(_TAILTAG)
_P_HSP = re.compile(r"[ \t\f\v]+")
_P_NLSP = re.compile(r" ?\n ?")
_P_NLRUN = re.compile(r"\n{3,}")
_P_EDGE = re.compile(r"^[ \n]+|[ \n]+$")


def _ws_normalize(s: str) -> str:
    s = s.replace("\r\n", "\n").replace("\r", "\n")
    s = _P_HSP.sub(" ", s)
    s = _P_NLSP.sub("\n", s)
    s = _P_NLRUN.sub("\n\n", s)
    return _P_EDGE.sub("", s)


def html_to_text(doc: bytes | str | None) -> str:
    """One document through the full rule chain (per-doc form — the
    slow path of the batch kernel and the sequential oracle's leaf)."""
    if doc is None:
        return ""
    if isinstance(doc, bytes):
        doc = decode_html_bytes(doc)
    s = _P_COMMENT.sub(" ", doc)
    s = _P_CDATA.sub(" ", s)
    s = _P_RAW.sub(" ", s)
    s = _P_BLOCK.sub("\n", s)
    s = _P_ANYTAG.sub(" ", s)
    s = _P_TAILTAG.sub(" ", s)
    s = decode_entities(s)
    return _ws_normalize(s)


# charset declarations a real crawl actually contains (ordered aliases
# → python codec); anything else falls back to utf-8-with-replacement
_CHARSETS = {
    "utf-8": "utf-8", "utf8": "utf-8",
    "iso-8859-1": "latin-1", "iso8859-1": "latin-1", "latin-1": "latin-1",
    "windows-1252": "cp1252", "cp1252": "cp1252",
}
_META_CHARSET = re.compile(
    rb"""(?is)<meta[^>]+charset\s*=\s*["']?\s*([a-z0-9_\-]+)""")


def decode_html_bytes(b: bytes) -> str:
    """Charset-aware page decode (the order browsers and WARC text
    extractors effectively use): strict UTF-8 → the page's own
    ``<meta charset=…>`` declaration (latin-1/cp1252 family) → UTF-8
    with replacement. Only consulted when the bytes are NOT valid
    UTF-8 — valid UTF-8 always wins regardless of a (frequently wrong)
    declaration, which keeps the vectorized cast fast path and this
    per-doc path in exact agreement (a UTF-8 BOM survives as U+FEFF in
    BOTH paths; normalize strips it downstream)."""
    try:
        return b.decode("utf-8")
    except UnicodeDecodeError:
        pass
    m = _META_CHARSET.search(b[:2048])
    if m:
        codec = _CHARSETS.get(m.group(1).decode("ascii", "ignore").lower())
        if codec and codec != "utf-8":
            return b.decode(codec, "replace")
    return b.decode("utf-8", "replace")


def utf8_string_array(col) -> pa.Array:
    """binary/large_binary → string; the whole-column zero-copy cast
    when every row is valid UTF-8, else per-row charset-aware decode
    (:func:`decode_html_bytes`). Shared by the extraction and
    link-graph kernels; string input passes through."""
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
        else col
    if pa.types.is_binary(col.type) or pa.types.is_large_binary(col.type):
        try:
            col = col.cast(pa.string())
        except pa.ArrowInvalid:
            col = pa.array(
                [None if v is None else decode_html_bytes(v)
                 for v in col.to_pylist()], pa.string())
    return col


def html_to_text_batch(col) -> pa.Array:
    """The full rule chain over a whole column (the batch kernel of
    :func:`html_extract`): Arrow-RE2 for steps 2-4 and 6, the
    six-entity chain for step 5, and the per-doc decoder ONLY for rows
    where an uncommon character reference survives — those rows are
    re-stripped individually (``take``), never the whole column. Null
    input rows yield ``""`` (the per-doc contract)."""
    col = utf8_string_array(col)
    null_mask = pc.is_null(col)
    col = pc.fill_null(col, "")
    s = pc.replace_substring_regex(col, _COMMENT, " ")
    s = pc.replace_substring_regex(s, _CDATA, " ")
    s = pc.replace_substring_regex(s, _RAW, " ")
    s = pc.replace_substring_regex(s, _BLOCK, "\n")
    s = pc.replace_substring_regex(s, _ANYTAG, " ")
    s = pc.replace_substring_regex(s, _TAILTAG, " ")
    for lit, rep in _COMMON_ENTITIES:
        s = pc.replace_substring(s, lit, rep)
    s = pc.replace_substring(s, "\r\n", "\n")
    s = pc.replace_substring(s, "\r", "\n")
    s = pc.replace_substring_regex(s, r"[ \t\f\v]+", " ")
    s = pc.replace_substring_regex(s, r" ?\n ?", "\n")
    s = pc.replace_substring_regex(s, r"\n{3,}", "\n\n")
    s = pc.replace_substring_regex(s, r"^[ \n]+|[ \n]+$", "")
    # rare-entity fallback: decode on the PRE-whitespace string so
    # numeric refs that expand to whitespace (&#10; &#9;) still
    # normalize — rerun steps 5-6 per doc from the tag-stripped form
    left = pc.match_substring_regex(s, _ENTITY_LEFT)
    out = s.to_numpy(zero_copy_only=False).astype(object)
    slow = np.flatnonzero(left.to_numpy(zero_copy_only=False))
    if slow.size:
        base = col.take(pa.array(slow, pa.int64()))
        base = pc.replace_substring_regex(base, _COMMENT, " ")
        base = pc.replace_substring_regex(base, _CDATA, " ")
        base = pc.replace_substring_regex(base, _RAW, " ")
        base = pc.replace_substring_regex(base, _BLOCK, "\n")
        base = pc.replace_substring_regex(base, _ANYTAG, " ")
        base = pc.replace_substring_regex(base, _TAILTAG, " ")
        for j, i in enumerate(slow):
            out[i] = _ws_normalize(decode_entities(base[j].as_py()))
    nm = null_mask.to_numpy(zero_copy_only=False)
    if nm.any():
        out[nm] = ""
    return pa.array(out, pa.string())


def html_extract(
    ds: Dataset, html_col: str = "html", out_col: str = "text", *,
    drop_html: bool = False,
) -> Dataset:
    """Dataset stage: ``out_col`` = extracted text of ``html_col``
    (binary or string). Vectorized Arrow-RE2 end to end; only documents
    with uncommon character references take the per-doc decoder."""
    def kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            # keep the empty-block schema identical to non-empty blocks
            # (append out_col AND honor drop_html) or downstream schema
            # unification breaks on heterogeneous bundles
            if out_col not in t.column_names:
                t = t.append_column(out_col, pa.array([], pa.string()))
            if drop_html and html_col != out_col and \
                    html_col in t.column_names:
                t = t.drop_columns([html_col])
            return t
        arr = html_to_text_batch(t.column(html_col))
        if out_col in t.column_names:
            t = t.set_column(t.schema.get_field_index(out_col),
                             out_col, arr)
        else:
            t = t.append_column(out_col, arr)
        if drop_html and html_col != out_col and \
                html_col in t.column_names:
            t = t.drop_columns([html_col])
        return t.replace_schema_metadata(None) if t.schema.metadata else t

    return ds.map_batches(kernel, batch_format="pyarrow")


# ------------------------------------------------- jusText-lite blocks

_P_A = re.compile(r"(?is)<a\b[^>]*>(.*?)(</a\b[^>]*>|$)")
_DEFAULT_STOPLIST = frozenset({
    "the", "and", "of", "to", "a", "in", "is", "that", "it", "for",
    "was", "with", "as", "his", "on", "be", "at", "by", "had", "not",
    "are", "this", "but", "from", "they", "you", "or", "an", "we",
    "have", "has", "were", "their", "which", "all", "will", "can",
})


def _inline_text(s: str) -> str:
    """Inline (single-block) text: strip tags, decode, collapse to one
    line."""
    s = _P_ANYTAG.sub(" ", s)
    s = _P_TAILTAG.sub(" ", s)
    s = decode_entities(s)
    s = s.replace("\r\n", "\n").replace("\r", "\n").replace("\n", " ")
    s = _P_HSP.sub(" ", s)
    return s.strip(" ")


def classify_blocks(
    doc: bytes | str | None, *,
    stoplist: frozenset = _DEFAULT_STOPLIST,
    max_link_density: float = 0.2, length_low: int = 70,
    length_high: int = 200, stopwords_low: float = 0.30,
    stopwords_high: float = 0.32,
) -> list[tuple[str, str]]:
    """One document → [(class, block_text)] with jusText's context-free
    classes then the neighbor-smoothing pass (Pomikálek 2011 §5;
    deterministic simplification documented in the module docstring):

    context-free: link_density > max_link_density → bad; len <
    length_low → bad if any link chars else short; stop_density ≥
    stopwords_high → good if len > length_high else near-good;
    ≥ stopwords_low → near-good; else bad.

    smoothing: near-good → good iff the nearest non-short neighbor on
    either side is good, else bad; then short → good iff the nearest
    non-short neighbor on either side ended up good, else bad.
    """
    if doc is None:
        return []
    if isinstance(doc, bytes):
        doc = decode_html_bytes(doc)
    s = _P_COMMENT.sub(" ", doc)
    s = _P_CDATA.sub(" ", s)
    s = _P_RAW.sub(" ", s)
    blocks: list[tuple[str, str]] = []  # (class, text)
    for raw in _P_BLOCK.split(s):
        link_chars = sum(len(_inline_text(m.group(1)))
                         for m in _P_A.finditer(raw))
        text = _inline_text(raw)
        n = len(text)
        if n == 0:
            continue
        words = text.split(" ")
        stop = sum(1 for w in words if w.lower() in stoplist)
        stop_density = stop / len(words)
        link_density = link_chars / n
        if link_density > max_link_density:
            cls = "bad"
        elif n < length_low:
            cls = "bad" if link_chars else "short"
        elif stop_density >= stopwords_high:
            cls = "good" if n > length_high else "neargood"
        elif stop_density >= stopwords_low:
            cls = "neargood"
        else:
            cls = "bad"
        blocks.append((cls, text))

    def nearest(i: int, skip: set, classes: list) -> tuple[str, str]:
        prev = nxt = ""
        for j in range(i - 1, -1, -1):
            if classes[j] not in skip:
                prev = classes[j]
                break
        for j in range(i + 1, len(classes)):
            if classes[j] not in skip:
                nxt = classes[j]
                break
        return prev, nxt

    classes = [c for c, _ in blocks]
    for i, c in enumerate(classes):
        if c == "neargood":
            p, x = nearest(i, {"short", "neargood"}, classes)
            classes[i] = "good" if "good" in (p, x) else "bad"
    for i, c in enumerate(classes):
        if c == "short":
            p, x = nearest(i, {"short"}, classes)
            classes[i] = "good" if "good" in (p, x) else "bad"
    return [(c, t) for c, (_, t) in zip(classes, blocks)]


def boilerplate_text(doc: bytes | str | None, **kw) -> str:
    """Good blocks of one document joined by newlines."""
    return "\n".join(t for c, t in classify_blocks(doc, **kw)
                     if c == "good")


class _BoilerplateKernel:
    """Actor-pool batch kernel: per-doc classification with the
    stoplist/thresholds bound once per actor (the per-document loop is
    inherent — block classification is context-sensitive WITHIN a
    document — but documents are independent, so the stage is
    embarrassingly parallel)."""

    def __init__(self, html_col: str, out_col: str, kw: dict):
        self.html_col, self.out_col, self.kw = html_col, out_col, kw
        if "stoplist" in self.kw:
            self.kw["stoplist"] = frozenset(self.kw["stoplist"])

    def __call__(self, t: pa.Table) -> pa.Table:
        col = t.column(self.html_col)
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
            else col
        out = pa.array(
            [boilerplate_text(v, **self.kw) for v in col.to_pylist()],
            pa.string())
        if self.out_col in t.column_names:
            t = t.set_column(t.schema.get_field_index(self.out_col),
                             self.out_col, out)
        else:
            t = t.append_column(self.out_col, out)
        return t.replace_schema_metadata(None) if t.schema.metadata else t


def boilerplate_extract(
    ds: Dataset, html_col: str = "html", out_col: str = "text", *,
    concurrency: int | tuple | None = None, **kw,
) -> Dataset:
    """Dataset stage: jusText-lite main-content extraction of
    ``html_col`` into ``out_col``."""
    return ds.map_batches(
        _BoilerplateKernel, fn_constructor_args=(html_col, out_col, kw),
        batch_format="pyarrow", concurrency=concurrency or (1, 8),
    )
