"""WARC (ISO 28500 Web ARChive — the Common-Crawl container format),
from scratch on the public spec: records of ``WARC/1.x`` header lines
terminated by CRLFCRLF, a ``Content-Length``-framed block, and a
CRLFCRLF record separator; ``.warc.gz`` stores one gzip member per
record (members concatenate, so Python's multi-member gzip reader
restores the plain stream).

This is the native ingest container for the engine's north star — a
CDC/upsert lake over Common-Crawl-style web pages keyed by
``(url, warc_ts)``: ``read_warc`` emits exactly that table shape
(url, warc_ts, content_type, payload), ready for the WAL normalize
stage or direct lake ingest.

Ray-Data shape: one read task per file (`read_binary_files`,
task count pinned to file count); the record walk inside a file is
sequential by format design (each Content-Length chains the next
offset), files parallelize; the writer lands one ``.warc.gz`` per
block (partitioned, resumable, atomic rename).
"""

from __future__ import annotations

import gzip
import os
import uuid

import pyarrow as pa

_CRLF2 = b"\r\n\r\n"


def _empty_records() -> pa.Table:
    return pa.table({
        "url": pa.array([], pa.string()),
        "warc_ts": pa.array([], pa.timestamp("ns")),
        "warc_type": pa.array([], pa.string()),
        "content_type": pa.array([], pa.string()),
        "payload": pa.array([], pa.binary()),
    })


def parse_warc_bytes(raw: bytes, http_payload: bool = True) -> pa.Table:
    """One WARC file (plain or multi-member gzip) → (url, warc_ts,
    warc_type, content_type, payload). ``http_payload=True`` strips the
    HTTP response envelope from ``response`` records (the body is the
    page; Common-Crawl WET/WARC consumers want the html, not the
    status line)."""
    if raw[:2] == b"\x1f\x8b":
        raw = gzip.decompress(raw)  # multi-member: one member per record
    urls, tss, types, ctypes, payloads = [], [], [], [], []
    off = 0
    n = len(raw)
    while off < n:
        # skip inter-record CRLFs
        while off < n and raw[off:off + 2] == b"\r\n":
            off += 2
        if off >= n or not raw.startswith(b"WARC/", off):
            break
        hdr_end = raw.find(_CRLF2, off)
        nxt_marker = raw.find(b"\r\nWARC/", off + 5)
        if hdr_end < 0 or (0 <= nxt_marker < hdr_end):
            # malformed record (no header terminator before the next
            # record starts): skip to the next WARC/ marker instead of
            # silently discarding the rest of the file
            if nxt_marker < 0:
                break
            off = nxt_marker + 2
            continue
        fields: dict[str, str] = {}
        for line in raw[off:hdr_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            # WARC/1.1 header values are UTF-8 (real crawls carry
            # non-ASCII target URIs); fall back byte-preserving
            fields[k.strip().lower().decode("utf-8", "surrogateescape")] \
                = v.strip().decode("utf-8", "surrogateescape")
        try:
            length = int(fields.get("content-length", "0"))
        except ValueError:
            # bad Content-Length: this record's block is unmappable —
            # resynchronize at the next record marker, keep the rest
            nxt = raw.find(b"\r\nWARC/", hdr_end)
            if nxt < 0:
                break
            off = nxt + 2
            continue
        block_start = hdr_end + 4
        block = raw[block_start:block_start + length]
        off = block_start + length
        rtype = fields.get("warc-type", "")
        ctype = fields.get("content-type", "")
        if http_payload and rtype == "response" and \
                block[:5] in (b"HTTP/",):
            body_at = block.find(_CRLF2)
            if body_at >= 0:
                block = block[body_at + 4:]
        urls.append(fields.get("warc-target-uri"))
        tss.append(fields.get("warc-date"))
        types.append(rtype)
        ctypes.append(ctype)
        payloads.append(block)
    if not urls:
        return _empty_records()
    import pyarrow.compute as pc

    # WARC/1.1 allows fractional seconds (2017-01-01T00:00:00.123Z):
    # parse the 19-char second-precision prefix, then add the fraction
    # as nanoseconds — pyarrow strptime has no %f, and nulling such
    # records would silently drop spec-conformant crawls. The prefix
    # parse is gated on the WHOLE string matching the spec shape
    # (…Z / ….fffZ): a numeric UTC offset (+05:00) must null like the
    # old strict format did, not silently mis-parse as UTC.
    arr = pa.array(tss, pa.string())
    spec_ok = pc.fill_null(pc.match_substring_regex(
        arr, pattern=r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}"
                     r"(\.\d{1,9})?Z$"), False)
    ts = pc.cast(
        pc.strptime(pc.utf8_slice_codeunits(arr, 0, 19),
                    format="%Y-%m-%dT%H:%M:%S",
                    unit="s", error_is_null=True),
        pa.timestamp("ns"))
    ts = pc.if_else(spec_ok, ts, pa.scalar(None, pa.timestamp("ns")))
    frac = pc.struct_field(
        pc.extract_regex(arr, pattern=r"\.(?P<f>\d{1,9})Z$"), "f")
    if pc.any(pc.is_valid(frac)).as_py():
        digits = pc.utf8_length(frac)
        scale = pc.cast(pc.power(
            pa.scalar(10, pa.int64()),
            pc.cast(pc.subtract(pa.scalar(9), digits), pa.int64())),
            pa.int64())
        ns = pc.fill_null(
            pc.multiply(pc.cast(frac, pa.int64()), scale), 0)
        ts = pc.add(ts, pc.cast(ns, pa.duration("ns")))
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": ts,
        "warc_type": pa.array(types, pa.string()),
        "content_type": pa.array(ctypes, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
    })


def read_warc(paths, http_payload: bool = True):
    """Distributed WARC source: one read task per file; emits the
    engine's native (url, warc_ts, …, payload) page-table shape."""
    import functools

    import ray.data as rd

    def split(t: pa.Table, *, http_payload: bool) -> pa.Table:
        parts = [parse_warc_bytes(raw, http_payload=http_payload)
                 for raw in t.column("bytes").to_pylist()]
        return pa.concat_tables(parts) if parts else _empty_records()

    from tenzir_ray.sources.formats import resolve_binary_paths

    files, n = resolve_binary_paths(paths, (".warc", ".warc.gz"))
    if not files:
        return rd.from_arrow(_empty_records())
    return rd.read_binary_files(
        files, override_num_blocks=max(1, n),
    ).map_batches(functools.partial(split, http_payload=http_payload),
                  batch_format="pyarrow")


def record_bytes(url: str, ts_iso: str, payload: bytes,
                 warc_type: str = "response",
                 content_type: str = "application/http; msgtype=response",
                 http_envelope: bool = True) -> bytes:
    """One WARC record image (spec layout; deterministic record id from
    the url so written files are reproducible)."""
    if http_envelope and warc_type == "response":
        body = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                + b"Content-Length: " + str(len(payload)).encode()
                + b"\r\n\r\n" + payload)
    else:
        body = payload
    rid = uuid.uuid5(uuid.NAMESPACE_URL, url)
    hdr = (f"WARC/1.0\r\n"
           f"WARC-Type: {warc_type}\r\n"
           f"WARC-Target-URI: {url}\r\n"
           f"WARC-Date: {ts_iso}\r\n"
           f"WARC-Record-ID: <urn:uuid:{rid}>\r\n"
           f"Content-Type: {content_type}\r\n"
           f"Content-Length: {len(body)}\r\n\r\n").encode("utf-8")
    return hdr + body + _CRLF2


def write_warc(ds, path: str, url_col: str = "url",
               ts_col: str = "warc_ts", payload_col: str = "payload",
               compress: bool = True) -> None:
    """Distributed WARC sink: one ``.warc[.gz]`` file per block under
    ``path`` (atomic rename publish — resumable). ``.gz`` output is one
    gzip member per record, the Common-Crawl layout that lets readers
    seek to records independently."""
    os.makedirs(path, exist_ok=True)

    def _write(t: pa.Table) -> pa.Table:
        if t.num_rows:
            import pyarrow.compute as pc

            urls = t.column(url_col).to_pylist()
            # WARC-Date is written at 1-second resolution; fractional
            # input timestamps (WARC/1.1, parsed to ns by read_warc)
            # truncate rather than abort the writer
            tss = pc.strftime(
                t.column(ts_col).combine_chunks().cast(
                    pa.timestamp("s"), safe=False),
                format="%Y-%m-%dT%H:%M:%SZ").to_pylist()
            payloads = t.column(payload_col).cast(pa.binary()).to_pylist()
            chunks = []
            for u, ts, p in zip(urls, tss, payloads):
                if u is None:
                    # a record without WARC-Target-URI (e.g. warcinfo
                    # from read_warc) cannot be addressed or LWW-keyed;
                    # skip it rather than uuid5(None)-crash the block
                    continue
                # a null timestamp must not serialize as the literal
                # header "WARC-Date: None"; the epoch is the spec-valid
                # sentinel that round-trips as "oldest possible write"
                rec = record_bytes(u, ts or "1970-01-01T00:00:00Z",
                                   p or b"")
                chunks.append(gzip.compress(rec) if compress else rec)
            ext = ".warc.gz" if compress else ".warc"
            name = os.path.join(path, f"part-{uuid.uuid4().hex}{ext}")
            with open(name + ".tmp", "wb") as f:
                f.write(b"".join(chunks))
            os.rename(name + ".tmp", name)
        return pa.table({"rows": pa.array([t.num_rows], pa.int64())})

    ds.map_batches(_write, batch_format="pyarrow").materialize()
