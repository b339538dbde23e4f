"""URL parsing / normalization — the scalar-function family a
Common-Crawl-style corpus engine needs that the reference lacks (no
url/uri entries exist under web/docs/tql2/functions or
libtenzir/builtins/functions; this extends the §2.4 pattern: vectorized
pyarrow.compute kernels usable inside ``map_batches``).

All kernels are single-pass RE2 via ``pc.extract_regex`` — no per-row
Python. A 100 TB url column parses at Arrow kernel speed and the
canonical form feeds exact dedup / per-host grouping without a second
tokenization pass.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# RFC-3986-ish split for absolute hierarchical URLs. Non-matching rows
# (no "scheme://") yield a null struct; optional components that do not
# participate yield "" (mirrors SQL regexp_extract semantics, so DuckDB
# oracles can replicate component-for-component).
_URL_RE = (
    r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.\-]*)://"
    r"(?P<host>[^/:?#]*)"
    r"(?::(?P<port>[0-9]+))?"
    r"(?P<path>[^?#]*)"
    r"(?:\?(?P<query>[^#]*))?"
    r"(?:#(?P<fragment>.*))?$"
)

_DEFAULT_PORTS = {"http": "80", "https": "443", "ws": "80", "wss": "443",
                  "ftp": "21"}


def url_parse(arr: pa.Array | pa.ChunkedArray) -> pa.StructArray:
    """url strings → struct<scheme, host, port, path, query, fragment>
    (all strings; port "" when absent). Null / non-URL rows → null."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return pc.extract_regex(arr, _URL_RE)


def _field(arr, name: str) -> pa.Array:
    return pc.struct_field(url_parse(arr), name)


def url_scheme(arr) -> pa.Array:
    return _field(arr, "scheme")


def url_host(arr) -> pa.Array:
    return _field(arr, "host")


def url_path(arr) -> pa.Array:
    return _field(arr, "path")


def normalized_host(arr) -> pa.Array:
    """THE host identity every URL gate uses (domain blocklists,
    robots filtering, link-graph nodes): lowercased ``url_host`` with
    any ``user[:pass]@`` userinfo stripped, nulls → "". One shared
    definition so the gates cannot disagree on what a host is (port is
    kept; IDNA normalization is out of scope)."""
    col = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    return pc.replace_substring_regex(
        pc.utf8_lower(pc.fill_null(url_host(pc.fill_null(col, "")), "")),
        "^.*@", "")


def url_query(arr) -> pa.Array:
    return _field(arr, "query")


def url_fragment(arr) -> pa.Array:
    return _field(arr, "fragment")


def port_from_parsed(s: pa.StructArray) -> pa.Array:
    """Port component of a parsed struct as int64; null when absent,
    non-URL, or too long to fit int64 (TRY_CAST semantics — the regex
    port group is unbounded, so a 20-digit 'port' must become null, not
    an ArrowInvalid that aborts the batch)."""
    p = pc.struct_field(s, "port")
    bad = pc.or_(pc.equal(p, ""), pc.greater(pc.utf8_length(p), 18))
    return pc.cast(pc.if_else(bad, pa.nulls(len(p), pa.string()), p),
                   pa.int64())


def url_port(arr) -> pa.Array:
    """Explicit port as int64; null when absent (or non-URL)."""
    return port_from_parsed(url_parse(arr))


def url_normalize(arr) -> pa.Array:
    """Canonical form for dedup/grouping: lowercase scheme + host, strip
    the fragment, drop the scheme's default port, "/" for an empty
    path, keep a non-empty query. Null for non-URL rows."""
    return normalize_from_parsed(url_parse(arr))


def normalize_from_parsed(s: pa.StructArray) -> pa.Array:
    """`url_normalize` over an already-parsed struct — callers needing
    several components parse ONCE and derive everything from the
    struct (one RE2 pass per batch, not one per accessor)."""
    scheme = pc.utf8_lower(pc.struct_field(s, "scheme"))
    host = pc.utf8_lower(pc.struct_field(s, "host"))
    port = pc.struct_field(s, "port")
    path = pc.struct_field(s, "path")
    query = pc.struct_field(s, "query")

    is_default = pa.array([False] * len(port), pa.bool_())
    for sch, dp in _DEFAULT_PORTS.items():
        is_default = pc.or_(is_default, pc.and_(
            pc.equal(scheme, sch), pc.equal(port, dp)))
    drop_port = pc.or_(pc.equal(port, ""), is_default)
    port_part = pc.if_else(
        drop_port, "", pc.binary_join_element_wise(":", port, ""))
    path_part = pc.if_else(pc.equal(path, ""), "/", path)
    query_part = pc.if_else(
        pc.equal(query, ""), "",
        pc.binary_join_element_wise("?", query, ""))
    return pc.binary_join_element_wise(
        scheme, "://", host, port_part, path_part, query_part, "")
