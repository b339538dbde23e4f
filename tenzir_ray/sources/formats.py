"""Format readers/writers + line parsers.

- ``open_uri``: the reference's ``from``/``to`` scheme+extension dispatch
  (operators/from_to_2.cpp:172-210) — infer format and compression from
  the path, return a Dataset.
- parsers (kv / syslog / cef): Tenzir parser plugins re-expressed as
  vectorized batch functions over a ``line``/``text`` column
  (formats/kv.cpp, formats/syslog.cpp, formats/cef.cpp). Regexes are
  module-level compiled once per worker process.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc


def read_parquet(paths, columns=None, **kw):
    import ray.data as rd

    return rd.read_parquet(paths, columns=columns, **kw)


def read_json(paths, **kw):
    """NDJSON → events (formats/json.cpp ndjson_parser; schema inference
    is Arrow's, the analog of multi_series_builder policy_merge)."""
    import ray.data as rd

    kw.setdefault(
        "file_extensions",
        ["json", "jsonl", "ndjson"]
        + [f"{e}.{c}" for e in ("json", "jsonl", "ndjson")
           for c in ("gz", "br", "zst", "lz4")],
    )
    return rd.read_json(paths, **kw)


def read_csv(paths, **kw):
    import ray.data as rd

    return rd.read_csv(paths, **kw)


def read_lines(paths, **kw):
    """Byte stream split on newline (formats/lines.cpp)."""
    import ray.data as rd

    return rd.read_text(paths, **kw)


def write_parquet(ds, path, **kw):
    return ds.write_parquet(path, **kw)


_EXT_READERS = {
    ".parquet": read_parquet,
    ".json": read_json,
    ".ndjson": read_json,
    ".jsonl": read_json,
    ".csv": read_csv,
    ".tsv": lambda uri, **kw: read_tsv(uri, **kw),
    ".txt": read_lines,
    ".log": read_lines,
    ".bitz": lambda uri, **kw: read_bitz(uri),
    ".pcap": lambda uri, **kw: _read_pcap_uri(uri),
}


def _read_pcap_uri(uri: str):
    from tenzir_ray.sources.pcap import read_pcap

    return read_pcap(uri)


def resolve_binary_paths(paths, suffixes: tuple[str, ...]):
    """Resolve a binary-format source (file path / directory / explicit
    list) to (explicit file list, count). Shared by the pcap/bitz/warc
    readers: an explicit list sidesteps Ray's extension filter (which
    would admit sidecar files like ``manifest.json.gz`` via a bare
    ``gz`` suffix), and pinning ``override_num_blocks`` to the count
    avoids the schema-less empty blocks excess binary-read tasks emit
    (they bypass downstream ``map_batches`` UDFs entirely)."""
    import os as _os

    if isinstance(paths, (list, tuple)):
        return list(paths), len(paths)
    if _os.path.isdir(paths):
        files = sorted(
            _os.path.join(paths, f) for f in _os.listdir(paths)
            if f.endswith(suffixes))
        return files, len(files)
    return [paths], 1


def open_uri(uri: str, **kw):
    """Dispatch on scheme then extension, transparently handling a
    trailing compression suffix (Arrow decompresses .gz/.zst/.bz2 via
    arrow_open_stream_args — reference: from_to_2.cpp extension matching
    + compress_decompress.cpp). Scheme dispatch mirrors the reference's
    ``load_properties().schemes`` registration: ``kafka://host:port/
    topic[?partition=N&offset=beginning|end|N]`` and ``zmq://host:port
    [?filter=prefix]`` drain the MQ connectors into a Dataset."""
    from urllib.parse import parse_qs, urlparse

    if uri.startswith("kafka://"):
        from tenzir_ray.sources.kafka import load_kafka

        u = urlparse(uri)
        q = {k: v[0] for k, v in parse_qs(u.query).items()}
        off = q.get("offset", "beginning")
        return load_kafka(
            u.path.lstrip("/"), host=u.hostname or "127.0.0.1",
            port=u.port or 9092, partition=int(q.get("partition", 0)),
            offset=off if off in ("beginning", "end") else int(off),
            **kw)()
    if uri.startswith("zmq://"):
        from tenzir_ray.sources.mq import load_zmq

        u = urlparse(uri)
        q = {k: v[0] for k, v in parse_qs(u.query).items()}
        host = u.hostname or "127.0.0.1"
        return load_zmq(f"tcp://{host}:{u.port or 5555}",
                        filter=q.get("filter", "").encode(), **kw)()
    base = re.sub(r"\.(gz|zst|zstd|bz2|lz4)$", "", uri)
    for ext, reader in _EXT_READERS.items():
        if base.endswith(ext):
            return reader(uri, **kw)
    raise ValueError(f"cannot infer format from {uri!r}")


# ------------------------------------------------------------- parsers

_KV = re.compile(r'(\w+)=(?:"([^"]*)"|(\S+))')

# RFC3164: <PRI>MMM dd HH:MM:SS host tag[pid]: msg
_SYSLOG_3164 = re.compile(
    r"^(?:<(?P<pri>\d+)>)?"
    r"(?P<ts>[A-Z][a-z]{2}\s+\d{1,2}\s\d{2}:\d{2}:\d{2})\s"
    r"(?P<host>\S+)\s"
    r"(?P<tag>[^\[\s:]+)(?:\[(?P<pid>\d+)\])?:?\s?"
    r"(?P<msg>.*)$"
)

# RFC5424: <PRI>VER TS HOST APP PROCID MSGID SD MSG
_SYSLOG_5424 = re.compile(
    r"^<(?P<pri>\d+)>(?P<ver>\d+)\s(?P<ts>\S+)\s(?P<host>\S+)\s"
    r"(?P<app>\S+)\s(?P<procid>\S+)\s(?P<msgid>\S+)\s"
    r"(?P<sd>-|\[.*?\])\s?(?P<msg>.*)$"
)

_CEF_PREFIX = re.compile(r"^CEF:(\d+)\|")


def parse_kv_batch(t: pa.Table, col: str = "text") -> pa.Table:
    """key=value pairs per line → struct column ``kv`` (formats/kv.cpp).
    Values kept as strings (the reference infers types via the series
    builder; callers cast downstream)."""
    lines = t.column(col).to_pylist()
    parsed = [
        {m.group(1): m.group(2) if m.group(2) is not None else m.group(3)
         for m in _KV.finditer(s)} if s else {}
        for s in lines
    ]
    keys: list[str] = []
    for d in parsed:
        for k in d:
            if k not in keys:
                keys.append(k)
    arrays = {k: pa.array([d.get(k) for d in parsed], pa.string()) for k in keys}
    kv = pa.StructArray.from_arrays(list(arrays.values()), names=list(arrays.keys()))
    return t.append_column("kv", kv)


def parse_syslog_batch(t: pa.Table, col: str = "text") -> pa.Table:
    """RFC5424-then-RFC3164 syslog parsing (formats/syslog.cpp)."""
    lines = t.column(col).to_pylist()
    out = {k: [] for k in
           ("facility", "severity", "ts_raw", "host", "app", "pid", "msg")}
    for s in lines:
        m = _SYSLOG_5424.match(s or "") or _SYSLOG_3164.match(s or "")
        if not m:
            for k in out:
                out[k].append(None)
            continue
        g = m.groupdict()
        pri = int(g["pri"]) if g.get("pri") else None
        out["facility"].append(pri // 8 if pri is not None else None)
        out["severity"].append(pri % 8 if pri is not None else None)
        out["ts_raw"].append(g.get("ts"))
        out["host"].append(g.get("host"))
        out["app"].append(g.get("app") or g.get("tag"))
        out["pid"].append(int(g["pid"]) if g.get("pid") and g["pid"].isdigit()
                          else (int(g["procid"]) if g.get("procid", "").isdigit() else None))
        out["msg"].append(g.get("msg"))
    for name, vals in out.items():
        typ = pa.int32() if name in ("facility", "severity", "pid") else pa.string()
        t = t.append_column(name, pa.array(vals, typ))
    return t


# Back-compat alias: the minimal built-in set from rounds 1-3 is now the
# full standard library (grok_patterns.py); `extra` still overrides.
from tenzir_ray.sources.grok_patterns import GROK_PATTERNS as _GROK_DEFAULT


def compile_grok(pattern: str, extra: dict[str, str] | None = None):
    """Grok pattern → compiled regex with named groups (reference:
    formats/grok.cpp loads the stock grok-patterns library at :837; the
    same standard set ships in :mod:`tenzir_ray.sources.grok_patterns`,
    extensible via ``extra``). ``%{NAME}`` references inside library
    patterns resolve recursively (depth-guarded)."""
    lib = {**_GROK_DEFAULT, **(extra or {})}
    ref = re.compile(r"%\{(\w+)(?::(\w+))?\}")

    def sub(m):
        name, field = m.group(1), m.group(2)
        body = lib[name]
        return f"(?P<{field}>{body})" if field else f"(?:{body})"

    rx = pattern
    for _ in range(12):  # nested library references resolve iteratively
        new = ref.sub(sub, rx)
        if new == rx:
            break
        rx = new
    else:
        raise ValueError(f"grok pattern nests too deep: {pattern!r}")
    return re.compile(rx)


def parse_grok_batch(
    t: pa.Table, pattern: str, col: str = "text",
    extra: dict[str, str] | None = None,
) -> pa.Table:
    """Apply a grok pattern per line; named captures become columns
    (regex compiled once per batch call — wrap in an actor class via
    functools.partial for once-per-actor compilation)."""
    rx = compile_grok(pattern, extra)
    lines = t.column(col).to_pylist()
    fields = list(rx.groupindex)
    cols: dict[str, list] = {f: [] for f in fields}
    for s in lines:
        m = rx.search(s or "")
        for f in fields:
            cols[f].append(m.group(f) if m else None)
    for f in fields:
        t = t.append_column(f, pa.array(cols[f], pa.string()))
    return t


def parse_leef_batch(t: pa.Table, col: str = "text") -> pa.Table:
    """LEEF 1.0/2.0 (reference: formats/leef.cpp): pipe-separated header
    then tab- (or configured-) delimited key=value attributes."""
    lines = t.column(col).to_pylist()
    hdr_names = ["leef_version", "vendor", "product", "version", "event_id"]
    cols: dict[str, list] = {k: [] for k in hdr_names}
    attrs: list[dict] = []
    for s in lines:
        if not s or not s.startswith("LEEF:"):
            for k in hdr_names:
                cols[k].append(None)
            attrs.append({})
            continue
        parts = s.split("|")
        head = parts[0].split(":", 1)[1]
        vals = [head] + parts[1:5]
        for k, v in zip(hdr_names, vals):
            cols[k].append(v)
        rest = parts[5] if len(vals) == 5 and len(parts) > 5 else parts[-1]
        sep = "\t" if "\t" in rest else ("&" if "=" in rest and "&" in rest else "\t")
        d = {}
        for kv in rest.split(sep):
            if "=" in kv:
                k, v = kv.split("=", 1)
                d[k.strip()] = v
        attrs.append(d)
    for k in hdr_names:
        t = t.append_column(k, pa.array(cols[k], pa.string()))
    keys: list[str] = []
    for d in attrs:
        for k in d:
            if k not in keys:
                keys.append(k)
    if keys:
        arrays = [pa.array([d.get(k) for d in attrs], pa.string()) for k in keys]
        t = t.append_column("attrs", pa.StructArray.from_arrays(arrays, names=keys))
    return t


def parse_zeek_tsv(path_or_text, **kw):
    """Zeek TSV logs (reference: formats/zeek_tsv.cpp): '#'-prefixed
    header directives (#fields/#types/#separator), '-' as null. Returns a
    ray Dataset."""
    import ray.data as rd

    import itertools

    with open(path_or_text) as f:
        head = list(itertools.islice(f, 12))
    fields = sep = None
    for line in head:
        if line.startswith("#separator"):
            code = line.split()[1]
            sep = bytes(code, "utf-8").decode("unicode_escape") if "\\" in code else code
        if line.startswith("#fields"):
            fields = line.rstrip("\n").split(sep or "\t")[1:]
    if not fields:
        raise ValueError("not a zeek tsv file (missing #fields)")
    delim = sep or "\t"
    cols = fields

    def split_lines(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        lines = t.column("text")
        mask = pc.invert(pc.starts_with(lines, pattern="#"))
        lines = lines.filter(mask).combine_chunks()
        parts = pc.split_pattern(lines, pattern=delim)
        out = {}
        for i, name in enumerate(cols):
            col = pc.list_element(parts, i) if len(lines) else pa.array([], pa.string())
            col = pc.if_else(
                pc.is_in(col, value_set=pa.array(["-", "(empty)"])),
                pa.scalar(None, pa.string()), col,
            )
            out[name] = col
        return pa.table(out)

    return rd.read_text(path_or_text).map_batches(
        split_lines, batch_format="pyarrow"
    )


def read_yaml(paths) -> "object":
    """YAML documents → Dataset (reference: formats/yaml.cpp). Whole-file
    parse via pyyaml; fine for config-scale inputs."""
    import yaml

    import ray.data as rd

    docs = []
    for p in [paths] if isinstance(paths, str) else paths:
        with open(p) as f:
            for d in yaml.safe_load_all(f):
                if isinstance(d, list):
                    docs.extend(d)
                elif d is not None:
                    docs.append(d)
    return rd.from_items(docs)


def read_feather(paths):
    """Arrow IPC / Feather files → Dataset (reference: formats/feather.cpp
    — also Tenzir's default store format; ours is parquet)."""
    import pyarrow.feather as pf

    import ray.data as rd

    tables = [
        pf.read_table(p) for p in ([paths] if isinstance(paths, str) else paths)
    ]
    return rd.from_arrow(pa.concat_tables(tables, promote_options="permissive"))


def write_feather(ds, path: str) -> None:
    import pyarrow.feather as pf

    chunks = [
        pa.table(b) if not isinstance(b, pa.Table) else b
        for b in ds.iter_batches(batch_format="pyarrow")
    ]
    pf.write_feather(
        pa.concat_tables(chunks, promote_options="permissive"), path
    )


def parse_cef_batch(t: pa.Table, col: str = "text") -> pa.Table:
    """CEF header + extension parsing (formats/cef.cpp): 7 pipe-separated
    header fields, then key=value extensions."""
    lines = t.column(col).to_pylist()
    hdr_names = ["cef_version", "device_vendor", "device_product",
                 "device_version", "signature_id", "name", "severity"]
    cols: dict[str, list] = {k: [] for k in hdr_names}
    exts: list[dict] = []
    for s in lines:
        if not s or not _CEF_PREFIX.match(s):
            for k in hdr_names:
                cols[k].append(None)
            exts.append({})
            continue
        body = s.split("CEF:", 1)[1]
        parts = re.split(r"(?<!\\)\|", body, maxsplit=7)
        for k, v in zip(hdr_names, parts[:7]):
            cols[k].append(v.replace("\\|", "|"))
        ext = parts[7] if len(parts) > 7 else ""
        exts.append({m.group(1): (m.group(2) if m.group(2) is not None else m.group(3))
                     for m in _KV.finditer(ext)})
    for k in hdr_names:
        t = t.append_column(k, pa.array(cols[k], pa.string()))
    keys: list[str] = []
    for d in exts:
        for k in d:
            if k not in keys:
                keys.append(k)
    if keys:
        arrays = [pa.array([d.get(k) for d in exts], pa.string()) for k in keys]
        t = t.append_column("extension",
                            pa.StructArray.from_arrays(arrays, names=keys))
    return t


#: default routed_json staging dirs created this process — cleaned at
#: exit so repeated runs don't accumulate corpus-sized copies in /tmp
_ROUTED_STAGES: list[str] = []


def _cleanup_routed_stages() -> None:
    import shutil

    for d in _ROUTED_STAGES:
        shutil.rmtree(d, ignore_errors=True)


import atexit as _atexit  # noqa: E402

_atexit.register(_cleanup_routed_stages)


def routed_json(ds, col: str = "line", selector: str = "event_type",
                stage_dir: str | None = None):
    """Selector-routed NDJSON parsing: one output Dataset PER value of
    the ``selector`` field, each with its own schema (the union of keys
    observed for that route) — the reference's multi_series_builder
    ``policy_selector`` (multi_series_builder.hpp:283-340, one pass),
    used by the Suricata EVE reader to split a heterogeneous feed by
    ``event_type``.

    SINGLE pass over the raw lines: each line is json.loads'd exactly
    once; the batch is split by route and each per-route slice lands as
    one typed parquet file under ``stage_dir/route=<route>/`` (the same
    file-staged exchange the CDC engine uses for its shuffle). Only a
    schema-sized summary row per (batch, route) reaches the driver. Each
    route's Dataset is then a plain parquet read over its staged files
    with a permissively-unified schema (footer-only metadata reads —
    int→double→string promotion across batches, missing keys → null).

    Returns ``dict[route, Dataset]``; lines that fail to parse, aren't
    JSON objects, or lack the selector land verbatim under
    ``"_unroutable"``. Default staged files (fresh ``/tmp`` dir) are
    removed at interpreter exit; an explicit ``stage_dir`` is the
    caller's to manage."""
    import json
    import os
    import tempfile
    import urllib.parse
    import uuid

    import pyarrow.parquet as pq
    import ray.data as rd

    if stage_dir is None:
        from tenzir_ray.util import local_stage_dir

        stage = local_stage_dir("tenzir_ray_routed_", "routed_json")
        _ROUTED_STAGES.append(stage)  # removed at interpreter exit
    else:
        stage = stage_dir

    def split(t: pa.Table) -> pa.Table:
        by_route: dict[str, list] = {}
        raw: dict[str, list] = {}
        for s in t.column(col).to_pylist():
            d = None
            if s is not None:
                try:
                    d = json.loads(s)
                except (TypeError, ValueError):
                    d = None
            if isinstance(d, dict) and d.get(selector) is not None:
                by_route.setdefault(str(d[selector]), []).append(d)
            else:
                raw.setdefault("_unroutable", []).append(s)
        if raw.get("_unroutable"):
            # one diagnostic per batch (diagnostics.md), not per line
            from tenzir_ray.diagnostics import emit

            emit(f"routed_json: {len(raw['_unroutable'])} line(s) "
                 f"without a usable {selector!r} selector routed to "
                 "_unroutable")
        summary_route, summary_path, summary_rows = [], [], []
        for route, rows in by_route.items():
            keys: list[str] = []
            for r in rows:
                for k in r:
                    if k not in keys:
                        keys.append(k)
            tbl = pa.table(
                {k: pa.array([r.get(k) for r in rows]) for k in keys})
            summary_route.append(route)
            summary_path.append(_stage_write(stage, route, tbl))
            summary_rows.append(len(rows))
        for route, lines in raw.items():
            tbl = pa.table({col: pa.array(lines, pa.string())})
            summary_route.append(route)
            summary_path.append(_stage_write(stage, route, tbl))
            summary_rows.append(len(lines))
        return pa.table({
            "route": pa.array(summary_route, pa.string()),
            "path": pa.array(summary_path, pa.string()),
            "rows": pa.array(summary_rows, pa.int64()),
        })

    def _stage_write(stage: str, route: str, tbl: pa.Table) -> str:
        rdir = os.path.join(
            stage, "route=" + urllib.parse.quote(route, safe=""))
        os.makedirs(rdir, exist_ok=True)
        path = os.path.join(rdir, f"part-{uuid.uuid4().hex}.parquet")
        pq.write_table(tbl, path + ".tmp")
        os.rename(path + ".tmp", path)  # atomic publish → resumable
        return path

    summary = ds.map_batches(split, batch_format="pyarrow").take_all()
    files: dict[str, list[str]] = {}
    for r in summary:
        files.setdefault(r["route"], []).append(r["path"])

    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if \
        ray.is_initialized() else 8
    out: dict[str, "object"] = {}
    for route, paths in files.items():
        paths = sorted(paths)
        uni = pa.unify_schemas([pq.read_schema(p) for p in paths],
                               promote_options="permissive")
        # partitioning=None: the route=<v> dirs are staging layout, not
        # hive partition columns; cap blocks — these are many tiny
        # staged files and per-block overhead dominates otherwise
        out[route] = rd.read_parquet(
            paths, schema=uni, partitioning=None,
            override_num_blocks=max(1, min(len(paths), cpus)))
    return out


def read_suricata(paths, selector: str = "event_type"):
    """Suricata EVE JSON: NDJSON routed by ``event_type`` into per-type
    Datasets with per-type schemas (the reference's suricata plugin is
    exactly multi_series_builder with policy_selector on event_type —
    formats/suricata.cpp). Returns ``dict[event_type, Dataset]``."""
    import ray.data as rd

    lines = rd.read_text(paths).map_batches(
        lambda t: pa.table({"line": t.column("text")}),
        batch_format="pyarrow",
    )
    return routed_json(lines, col="line", selector=selector)


def load_tcp(host: str = "127.0.0.1", port: int = 0,
             max_events: int | None = None, idle_timeout: float = 5.0,
             tls: bool = False, certfile: str | None = None,
             keyfile: str | None = None):
    """TCP line source (operators/load_tcp.cpp): listen, accept one
    connection, read newline-delimited records until EOF / idle timeout,
    return a Dataset of ``line`` rows. Batch-engine semantics: the
    connector drains a finite stream (the reference runs it as an
    endless pipeline; here a WAL-style tail loop would wrap this).
    Returns (dataset, bound_port) when ``port=0`` picks an ephemeral
    port — callers start the listener first, then the sender.

    ``tls=True`` wraps the accepted connection in server-side TLS
    (reference load_tcp.cpp:1049 TLS mode); ``certfile``/``keyfile``
    are the PEM server credentials."""
    import socket

    import ray.data as rd

    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind((host, port))
    srv.listen(1)
    bound = srv.getsockname()[1]
    ssl_ctx = None
    if tls:
        import ssl

        if not certfile:
            raise ValueError("load_tcp: tls=True requires certfile")
        ssl_ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
        ssl_ctx.load_cert_chain(certfile, keyfile)

    def drain() -> list[str]:
        srv.settimeout(idle_timeout)
        conn, _ = srv.accept()
        # accepted sockets do NOT inherit the listener's timeout — set
        # it BEFORE the TLS handshake, or a client that connects but
        # never handshakes blocks the drain forever
        conn.settimeout(idle_timeout)
        if ssl_ctx is not None:
            conn = ssl_ctx.wrap_socket(conn, server_side=True)
            conn.settimeout(idle_timeout)
        buf = b""
        lines: list[str] = []
        try:
            while True:
                chunk = conn.recv(65536)
                if not chunk:
                    break
                buf += chunk
                while b"\n" in buf:
                    line, buf = buf.split(b"\n", 1)
                    lines.append(line.decode(errors="replace"))
                    if max_events and len(lines) >= max_events:
                        return lines
        except socket.timeout:
            pass
        finally:
            conn.close()
            srv.close()
        if buf.strip():
            lines.append(buf.decode(errors="replace"))
        return lines

    return (lambda: rd.from_items([{"line": l} for l in drain()])), bound


def save_tcp(ds, host: str, port: int, *, tls: bool = False,
             cafile: str | None = None, lines_fn=None,
             timeout: float = 10.0) -> int:
    """TCP line sink (operators/save_tcp.md): connect once, stream each
    row as one newline-terminated NDJSON line (``lines_fn`` overrides
    the rendering). ``tls=True`` wraps the connection client-side
    (save_tcp's TLS options); ``cafile=None`` skips verification — the
    loopback-test posture, matching the reference's
    ``skip_peer_verification``. Driver-edge singleton, the write dual
    of ``load_tcp``. Returns lines sent."""
    import json as _json
    import socket as _socket

    sock = _socket.create_connection((host, port), timeout=timeout)
    if tls:
        import ssl as _ssl

        if cafile:
            ctx = _ssl.create_default_context(cafile=cafile)
            ctx.check_hostname = False
        else:
            ctx = _ssl.SSLContext(_ssl.PROTOCOL_TLS_CLIENT)
            ctx.check_hostname = False
            ctx.verify_mode = _ssl.CERT_NONE
        sock = ctx.wrap_socket(sock)
    if lines_fn is None:
        def lines_fn(rows):
            return [_json.dumps(r, default=str) for r in rows]
    sent = 0
    try:
        for batch in ds.iter_batches(batch_format="pyarrow"):
            payload = lines_fn(batch.to_pylist())
            if payload:
                sock.sendall(("\n".join(payload) + "\n").encode())
                sent += len(payload)
    finally:
        sock.close()
    return sent


def save_udp(ds, host: str, port: int, *, lines_fn=None) -> int:
    """UDP datagram sink (operators/save_udp.md): one datagram per row
    — the write dual of ``load_udp`` (syslog-style shippers). Returns
    datagrams sent."""
    import json as _json
    import socket as _socket

    sock = _socket.socket(_socket.AF_INET, _socket.SOCK_DGRAM)
    if lines_fn is None:
        def lines_fn(rows):
            return [_json.dumps(r, default=str) for r in rows]
    sent = 0
    try:
        for batch in ds.iter_batches(batch_format="pyarrow"):
            for line in lines_fn(batch.to_pylist()):
                sock.sendto(line.encode(), (host, port))
                sent += 1
    finally:
        sock.close()
    return sent


def load_udp(host: str = "127.0.0.1", port: int = 0,
             max_events: int | None = None, idle_timeout: float = 2.0):
    """UDP datagram source (operators/load_udp — one record per
    datagram, syslog-style). Same finite-drain semantics as load_tcp."""
    import socket

    import ray.data as rd

    sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    sock.bind((host, port))
    bound = sock.getsockname()[1]

    def drain() -> list[str]:
        sock.settimeout(idle_timeout)
        out: list[str] = []
        try:
            while True:
                data, _ = sock.recvfrom(65536)
                out.append(data.decode(errors="replace").rstrip("\n"))
                if max_events and len(out) >= max_events:
                    break
        except socket.timeout:
            pass
        finally:
            sock.close()
        return out

    return (lambda: rd.from_items([{"line": l} for l in drain()])), bound


def _parse_ndjson_staged(ds, col: str = "line",
                         stage_dir: str | None = None):
    """Distributed tolerant NDJSON parse with key-union typing — the
    single-route core of :func:`routed_json`: each batch json-parses its
    lines once (non-JSON lines fall back to ``{col: line}``), stages a
    key-union parquet file, and only (path, rows) summaries reach the
    driver; the result is a parquet read over the staged files with a
    permissively-unified footer schema."""
    import json
    import os
    import tempfile
    import uuid

    import pyarrow.parquet as pq
    import ray.data as rd

    if stage_dir is None:
        from tenzir_ray.util import local_stage_dir

        stage = local_stage_dir("tenzir_ray_ndjson_", "staged_ndjson")
        _ROUTED_STAGES.append(stage)
    else:
        stage = stage_dir

    def parse_stage(t: pa.Table) -> pa.Table:
        rows = []
        for s in t.column(col).to_pylist():
            d = None
            if s is not None:
                try:
                    d = json.loads(s)
                except (TypeError, ValueError):
                    d = None
            rows.append(d if isinstance(d, dict) else {col: s})
        if not rows:
            return pa.table({"path": pa.array([], pa.string()),
                             "rows": pa.array([], pa.int64())})
        keys: list[str] = []
        for r in rows:
            for k in r:
                if k not in keys:
                    keys.append(k)
        tbl = pa.table({k: pa.array([r.get(k) for r in rows])
                        for k in keys})
        path = os.path.join(stage, f"part-{uuid.uuid4().hex}.parquet")
        pq.write_table(tbl, path + ".tmp")
        os.rename(path + ".tmp", path)
        return pa.table({"path": pa.array([path], pa.string()),
                         "rows": pa.array([tbl.num_rows], pa.int64())})

    summary = ds.map_batches(parse_stage, batch_format="pyarrow").take_all()
    paths = sorted(r["path"] for r in summary)
    if not paths:
        return rd.from_items([]).limit(0)
    uni = pa.unify_schemas([pq.read_schema(p) for p in paths],
                           promote_options="permissive")
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if \
        ray.is_initialized() else 8
    return rd.read_parquet(
        paths, schema=uni, partitioning=None,
        override_num_blocks=max(1, min(len(paths), cpus)))


def load_http(url: str, *, params: dict | None = None,
              next_header: str = "X-Next-Offset",
              offset_param: str = "offset", limit: int | None = None,
              max_pages: int = 100_000, parse: str = "ndjson",
              headers: dict | None = None, timeout: float = 30.0,
              allow_truncated: bool = False,
              stage_dir: str | None = None):
    """HTTP client source (reference operators/http.cpp:423 load_http /
    from_http): GET ``url``, following continuation paging via the
    ``X-Next-Offset`` response header (the protocol :func:`~tenzir_ray.
    stages.serve.serve` speaks) until exhausted. Each page's NDJSON body
    parses into rows; ``parse="lines"`` keeps raw lines.

    A paged HTTP endpoint is an inherently serial BYTE stream (each
    page's cursor comes from the previous response), so the driver loop
    only copies raw page bodies to a local spool — one page in memory
    at a time, no parsing. Parsing/typing then runs distributed: pages
    are read back with ``read_text`` and NDJSON-parsed in ``map_batches``
    through the same file-staged key-union pass ``routed_json`` uses
    (only schema-sized summaries reach the driver). Returns a Dataset."""
    import os
    import tempfile
    import urllib.parse as _up
    import urllib.request as _ur

    import ray.data as rd

    if stage_dir is None:
        from tenzir_ray.util import local_stage_dir

        spool = local_stage_dir("tenzir_ray_http_", "load_http")
        _ROUTED_STAGES.append(spool)  # removed at interpreter exit
    else:
        spool = stage_dir
    paths: list[str] = []
    offset: str | None = None
    for page in range(max_pages):
        q = dict(params or {})
        if offset is not None:
            q[offset_param] = offset
        if limit is not None:
            q["limit"] = limit
        full = url + ("?" + _up.urlencode(q) if q else "")
        req = _ur.Request(full, headers=headers or {})
        with _ur.urlopen(req, timeout=timeout) as resp:
            body = resp.read()
            nxt = resp.headers.get(next_header)
            if resp.headers.get("X-Truncated") == "true" \
                    and not allow_truncated:
                raise ValueError(
                    f"{url} advertises X-Truncated: the server buffer "
                    "capped the result set - raise serve(max_rows=...) "
                    "or pass allow_truncated=True to accept partial "
                    "data")
        if body.strip():
            p = os.path.join(spool, f"page-{page:06d}.txt")
            with open(p + ".tmp", "wb") as f:
                f.write(body)
            os.rename(p + ".tmp", p)
            paths.append(p)
        if nxt is None:
            break
        offset = nxt
    if not paths:
        return rd.from_items([]).limit(0)
    lines = rd.read_text(paths).map_batches(
        lambda t: pa.table({"line": t.column("text")}),
        batch_format="pyarrow")
    if parse == "lines":
        return lines
    return _parse_ndjson_staged(lines, col="line",
                                stage_dir=stage_dir)


def load_http_server(host: str = "127.0.0.1", port: int = 0,
                     max_events: int | None = None,
                     idle_timeout: float = 5.0,
                     stage_dir: str | None = None):
    """HTTP *server* source (reference ``from_http`` server mode,
    operators/http.cpp: listen and ingest pushed events): accept POSTed
    NDJSON bodies on loopback until ``max_events`` or idle timeout —
    the same finite-drain batch semantics as :func:`load_tcp`. Returns
    ``(make_dataset, bound_port)``."""
    import queue
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    import ray.data as rd

    q: "queue.Queue[str]" = queue.Queue()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(n).decode(errors="replace")
            for line in body.splitlines():
                if line.strip():
                    q.put(line)
            self.send_response(204)
            self.end_headers()

    srv = ThreadingHTTPServer((host, port), Handler)
    bound = srv.server_address[1]
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()

    def drain(spool_every: int = 50_000):
        """Drain to a disk spool in ``spool_every``-line part files (at
        most one part buffered in driver memory, never the full feed —
        the bounded-ingest contract serve/load_http follow), then hand
        back a distributed ``read_text`` over the spool."""
        import os
        import queue as _q
        import tempfile

        if stage_dir is None:
            from tenzir_ray.util import local_stage_dir

            spool = local_stage_dir(
                "tenzir_ray_httpsrv_", "load_http_server")
            _ROUTED_STAGES.append(spool)  # removed at interpreter exit
        else:
            spool = stage_dir
        paths: list[str] = []
        buf: list[str] = []
        total = 0

        def flush():
            nonlocal buf
            if not buf:
                return
            p = os.path.join(spool, f"part-{len(paths):06d}.txt")
            with open(p + ".tmp", "w", encoding="utf-8") as f:
                f.write("\n".join(buf) + "\n")
            os.rename(p + ".tmp", p)
            paths.append(p)
            buf = []

        while True:
            try:
                buf.append(q.get(timeout=idle_timeout))
            except _q.Empty:
                break
            total += 1
            if len(buf) >= spool_every:
                flush()
            if max_events and total >= max_events:
                break
        srv.shutdown()
        srv.server_close()
        flush()
        if not paths:
            return rd.from_items([]).limit(0)
        return rd.read_text(paths).map_batches(
            lambda t: pa.table({"line": t.column("text")}),
            batch_format="pyarrow")

    return drain, bound


def write_bitz(ds, path: str) -> None:
    """``bitz`` analog — the reference's internal wire format is a
    self-framed stream of serialized batches (read_bitz.mdx / bitz
    plugin: length-prefixed FlatBuffers-wrapped record batches, built
    for cheap catenation). Here: each frame is ``uint32 LE length`` +
    one Arrow IPC stream holding one batch; one file per block
    (partitioned, resumable), and FILES CONCATENATE — ``cat a b > c``
    is a valid bitz file."""
    import os
    import struct
    import uuid

    os.makedirs(path, exist_ok=True)

    def _write(t: pa.Table) -> pa.Table:
        if t.num_rows:
            sink = pa.BufferOutputStream()
            with pa.ipc.new_stream(sink, t.schema) as w:
                w.write_table(t)
            payload = sink.getvalue().to_pybytes()
            name = os.path.join(path, f"part-{uuid.uuid4().hex}.bitz")
            with open(name + ".tmp", "wb") as f:
                f.write(struct.pack("<I", len(payload)))
                f.write(payload)
            os.rename(name + ".tmp", name)
        return pa.table({"rows": pa.array([t.num_rows], pa.int64())})

    ds.map_batches(_write, batch_format="pyarrow").materialize()


def read_bitz(paths):
    """Read ``bitz`` files (see :func:`write_bitz`): parse the length-
    prefixed frames, one Arrow table per frame. Distributed: one read
    task per file via ``read_binary_files`` + a frame-splitting
    flat-map."""
    import struct

    import ray.data as rd

    def split_frames(t: pa.Table) -> pa.Table:
        out: list[pa.Table] = []
        for raw in t.column("bytes").to_pylist():
            off = 0
            while off + 4 <= len(raw):
                (n,) = struct.unpack_from("<I", raw, off)
                off += 4
                buf = raw[off:off + n]
                off += n
                with pa.ipc.open_stream(pa.py_buffer(buf)) as r:
                    out.append(r.read_all())
        if not out:
            return pa.table({})
        uni = pa.unify_schemas([x.schema for x in out],
                               promote_options="permissive")
        return pa.concat_tables(
            [x.cast(uni) if x.schema != uni else x for x in out],
            promote_options="permissive")

    files, n = resolve_binary_paths(paths, (".bitz",))
    if not files:
        return rd.from_items([])
    return rd.read_binary_files(files, override_num_blocks=max(1, n)) \
        .map_batches(split_frames, batch_format="pyarrow")


def read_tsv(paths, **kw):
    """TSV (read_tsv.mdx) — csv with tab delimiter."""
    import ray.data as rd
    from pyarrow import csv as pacsv

    kw.setdefault("parse_options", pacsv.ParseOptions(delimiter="\t"))
    return rd.read_csv(paths, **kw)


def read_ssv(paths, **kw):
    """Space-separated (read_ssv.mdx)."""
    import ray.data as rd
    from pyarrow import csv as pacsv

    kw.setdefault("parse_options", pacsv.ParseOptions(delimiter=" "))
    return rd.read_csv(paths, **kw)


def read_xsv(paths, delimiter: str, **kw):
    """Generic delimiter-separated (read_xsv.mdx)."""
    import ray.data as rd
    from pyarrow import csv as pacsv

    kw.setdefault("parse_options", pacsv.ParseOptions(delimiter=delimiter))
    return rd.read_csv(paths, **kw)


def read_zeek_json(paths):
    """Zeek JSON-streaming logs (read_zeek_json.mdx): NDJSON routed by
    the ``_path`` field into per-log-type Datasets — the zeek analog of
    the suricata selector route."""
    import ray.data as rd

    lines = rd.read_text(paths).map_batches(
        lambda t: pa.table({"line": t.column("text")}),
        batch_format="pyarrow",
    )
    return routed_json(lines, col="line", selector="_path")


def read_gelf(paths):
    """GELF (read_gelf.mdx): NDJSON of GELF records (version/host/
    short_message/...); NUL-delimited stream chunks are also split."""
    import json as _json

    import ray.data as rd

    def split(t: pa.Table) -> pa.Table:
        rows = []
        for s in t.column("text").to_pylist():
            for part in s.split("\x00"):
                part = part.strip()
                if part:
                    try:
                        rows.append(_json.loads(part))
                    except ValueError:
                        continue
        keys: list[str] = []
        for r in rows:
            for k in r:
                if k not in keys:
                    keys.append(k)
        return pa.table({k: pa.array([r.get(k) for r in rows])
                         for k in keys}) if rows else pa.table({})

    return rd.read_text(paths).map_batches(split, batch_format="pyarrow")




def _http_post_retry(endpoint: str, payload: bytes, *, headers: dict,
                     timeout: float, max_retries: int,
                     validate=None) -> bytes:
    """POST with exponential backoff: 5xx, 429/408 (throttling — the
    responses HEC/OpenSearch/ClickHouse emit under load) and connection
    errors retry; other 4xx does not (a malformed request stays
    malformed). ``validate`` inspects a 2xx body for protocol-level
    per-item failures. Returns the response body. Shared by every HTTP
    sink and by ``from_opensearch``'s paging."""
    import time as _time
    import urllib.error as _ue
    import urllib.request as _ur

    for attempt in range(max_retries + 1):
        try:
            req = _ur.Request(endpoint, data=payload, method="POST",
                              headers=headers)
            with _ur.urlopen(req, timeout=timeout) as resp:
                body = resp.read()
            if validate is not None:
                validate(body)
            return body
        except _ue.HTTPError as e:
            retriable = e.code >= 500 or e.code in (408, 429)
            if not retriable or attempt == max_retries:
                raise
            _time.sleep(0.2 * 2 ** attempt)
        except (_ue.URLError, OSError):
            if attempt == max_retries:
                raise
            _time.sleep(0.2 * 2 ** attempt)
    raise AssertionError("unreachable")


def _ndjson_http_sink(ds, endpoint: str, *, headers: dict,
                      lines_fn, per_request: int,
                      timeout: float, max_retries: int,
                      validate=None) -> int:
    """Shared distributed HTTP-sink shape: each BLOCK's rows serialize
    worker-side via ``lines_fn(rows) -> list[str]``, POST in
    ``per_request``-line chunks with retry/backoff, and only per-block
    ack counts reach the driver. Returns total rows sent."""
    import pyarrow.compute as _pc

    def _send(t: pa.Table) -> pa.Table:
        if t.num_rows:
            lines = lines_fn(t.to_pylist())
            for i in range(0, len(lines), per_request):
                chunk = lines[i:i + per_request]
                _http_post_retry(
                    endpoint, ("\n".join(chunk) + "\n").encode("utf-8"),
                    headers=headers, timeout=timeout,
                    max_retries=max_retries, validate=validate)
        return pa.table({"docs": pa.array([t.num_rows], pa.int64())})

    acks = ds.map_batches(_send, batch_format="pyarrow").materialize()
    return sum(int(_pc.sum(b.column("docs")).as_py() or 0)
               for b in acks.iter_batches(batch_format="pyarrow"))


# ------------------------------------------------- opensearch bulk sink


def to_opensearch(ds, url: str, index: str, id_col: str | None = None,
                  action: str = "index", lines_per_request: int = 5_000,
                  max_retries: int = 3, timeout: float = 30.0):
    """OpenSearch/Elasticsearch-compatible ``_bulk`` sink (reference
    ``to_opensearch`` connector plugin — re-expressed over the public
    bulk REST protocol: NDJSON action+source pairs POSTed to
    ``<url>/_bulk`` with ``application/x-ndjson``).

    Distributed: each BLOCK's rows serialize and POST from the worker
    holding the block — no driver copies, no global collection; requests
    are chunked to ``lines_per_request`` docs and retried with
    exponential backoff on connection errors / 5xx. Only per-block ack
    counts reach the driver. ``id_col`` supplies ``_id`` (idempotent
    re-delivery upserts instead of duplicating — the exactly-once story
    at the sink). Offline-testable against :func:`load_http_server`.

    Returns total docs sent."""
    import json as _json

    endpoint = url.rstrip("/") + "/_bulk"

    def _validate(body: bytes) -> None:
        # 2xx can still carry per-item failures (the bulk API returns
        # 200 with "errors": true for mapping conflicts or per-doc
        # 429s) — surface them, never drop silently
        if not body:
            return
        try:
            parsed = _json.loads(body)
        except ValueError:
            return
        if isinstance(parsed, dict) and parsed.get("errors"):
            bad = [i for i in parsed.get("items", [])
                   if next(iter(i.values()), {})
                   .get("status", 200) >= 300]
            raise RuntimeError(
                f"_bulk accepted the request but rejected "
                f"{len(bad)} item(s); first: "
                f"{bad[0] if bad else parsed}")

    def lines_fn(rows: list[dict]) -> list[str]:
        lines: list[str] = []
        for r in rows:
            meta = {"_index": index}
            if id_col is not None:
                meta["_id"] = str(r[id_col])
            lines.append(_json.dumps({action: meta},
                                     separators=(",", ":")))
            lines.append(_json.dumps(r, separators=(",", ":"),
                                     default=str))
        return lines

    return _ndjson_http_sink(
        ds, endpoint,
        headers={"Content-Type": "application/x-ndjson"},
        lines_fn=lines_fn, per_request=2 * lines_per_request,
        timeout=timeout, max_retries=max_retries, validate=_validate)


# ------------------------------------------- splunk / clickhouse sinks


def to_splunk_hec(ds, url: str, token: str, index: str | None = None,
                  sourcetype: str = "_json", time_col: str | None = None,
                  events_per_request: int = 5_000,
                  max_retries: int = 3, timeout: float = 30.0) -> int:
    """Splunk HTTP Event Collector sink (reference ``to_splunk``
    connector — re-expressed over the public HEC protocol: batched
    ``{"event": …}`` JSON objects POSTed to
    ``/services/collector/event`` with ``Authorization: Splunk <tok>``).

    Distributed like :func:`to_opensearch`: each block serializes and
    POSTs from the worker holding it, chunked and retried; only ack
    counts reach the driver. ``time_col`` (epoch seconds or a
    timestamp column) maps to HEC's ``time`` field so Splunk indexes
    event time, not ingest time. A 2xx body with ``code != 0`` is a
    protocol-level rejection and raises. Offline-testable against
    :func:`load_http_server`. Returns total events sent."""
    import json as _json

    endpoint = url.rstrip("/") + "/services/collector/event"
    headers = {"Authorization": f"Splunk {token}",
               "Content-Type": "application/json"}

    def _validate(body: bytes) -> None:
        if not body:
            return
        try:
            parsed = _json.loads(body)
        except ValueError:
            return
        if isinstance(parsed, dict) and parsed.get("code", 0) != 0:
            raise RuntimeError(f"HEC rejected the batch: {parsed}")

    def lines_fn(rows: list[dict]) -> list[str]:
        import datetime as _dt

        lines = []
        for r in rows:
            ev: dict = {"event": r, "sourcetype": sourcetype}
            if index is not None:
                ev["index"] = index
            if time_col is not None and r.get(time_col) is not None:
                tv = r[time_col]
                if hasattr(tv, "timestamp"):
                    # tz-naive values (the norm for parquet timestamps)
                    # are UTC — .timestamp() on a naive datetime would
                    # apply the WORKER's local timezone
                    if getattr(tv, "tzinfo", None) is None:
                        tv = tv.replace(tzinfo=_dt.timezone.utc)
                    ev["time"] = tv.timestamp()
                else:
                    ev["time"] = float(tv)
            lines.append(_json.dumps(ev, separators=(",", ":"),
                                     default=str))
        return lines

    return _ndjson_http_sink(
        ds, endpoint, headers=headers, lines_fn=lines_fn,
        per_request=events_per_request, timeout=timeout,
        max_retries=max_retries, validate=_validate)


def to_clickhouse(ds, url: str, table: str,
                  rows_per_request: int = 50_000,
                  max_retries: int = 3, timeout: float = 30.0) -> int:
    """ClickHouse sink over its public HTTP interface (reference
    ``to_clickhouse`` connector): NDJSON bodies POSTed to
    ``?query=INSERT INTO <table> FORMAT JSONEachRow``. Distributed
    per block, chunked, retried; returns total rows sent. ClickHouse
    INSERTs are atomic per request, so ``rows_per_request`` is also the
    re-delivery granularity. Offline-testable against
    :func:`load_http_server`."""
    import json as _json
    import urllib.parse as _up

    if not table.replace(".", "").replace("_", "").isalnum():
        raise ValueError(f"suspicious table name {table!r}")
    q = _up.urlencode({"query": f"INSERT INTO {table} FORMAT JSONEachRow"})
    endpoint = url.rstrip("/") + "/?" + q
    headers = {"Content-Type": "application/x-ndjson"}

    def lines_fn(rows: list[dict]) -> list[str]:
        return [_json.dumps(r, separators=(",", ":"), default=str)
                for r in rows]

    return _ndjson_http_sink(
        ds, endpoint, headers=headers, lines_fn=lines_fn,
        per_request=rows_per_request, timeout=timeout,
        max_retries=max_retries)


def from_fluent_bit(host: str = "127.0.0.1", port: int = 0,
                    max_events: int | None = None,
                    idle_timeout: float = 5.0):
    """fluent-bit SOURCE (reference ``from_fluent_bit``): an HTTP
    ingest endpoint fluent-bit's ``http`` output plugin pushes to.
    Accepts both of that plugin's body formats — ``json`` (one JSON
    array per request) and ``json_lines`` (NDJSON) — and parses the
    pushed records with the distributed key-union NDJSON parse.
    Returns ``(make_dataset, bound_port)``; the dataset rows are the
    pushed records (typed columns, key union across events)."""
    import json as _json

    mk, bound = load_http_server(host, port, max_events=max_events,
                                 idle_timeout=idle_timeout)

    def make_dataset():
        lines = mk()

        def split_arrays(t: pa.Table) -> pa.Table:
            # the `json` format posts one ARRAY per request; re-emit
            # its elements as NDJSON lines so one parser serves both
            out: list[str] = []
            for s in t.column("line").to_pylist():
                s = (s or "").strip()
                if s.startswith("["):
                    try:
                        for item in _json.loads(s):
                            out.append(_json.dumps(item))
                        continue
                    except ValueError:
                        pass
                if s:
                    out.append(s)
            return pa.table({"line": pa.array(out, pa.string())})

        lines = lines.map_batches(split_arrays, batch_format="pyarrow")
        return _parse_ndjson_staged(lines, col="line")

    return make_dataset, bound


def to_fluentbit(ds, url: str, tag: str = "tenzir",
                 rows_per_request: int = 10_000,
                 max_retries: int = 3, timeout: float = 30.0) -> int:
    """fluent-bit sink over its HTTP input plugin (reference
    ``to_fluent_bit`` connector): NDJSON bodies POSTed to
    ``<url>/<tag>`` (the tag routes inside fluent-bit; URL-encoded so
    any tag is a valid request target). Same distributed per-block POST
    + retry shape as the other HTTP sinks; returns total rows sent."""
    import json as _json
    import urllib.parse as _up

    endpoint = url.rstrip("/") + "/" + _up.quote(tag.strip("/"), safe="/.")
    headers = {"Content-Type": "application/x-ndjson"}

    def lines_fn(rows: list[dict]) -> list[str]:
        return [_json.dumps(r, separators=(",", ":"), default=str)
                for r in rows]

    return _ndjson_http_sink(
        ds, endpoint, headers=headers, lines_fn=lines_fn,
        per_request=rows_per_request, timeout=timeout,
        max_retries=max_retries)


def to_snowflake(ds, *, account_url: str, table: str, token: str,
                 token_type: str = "OAUTH", database: str | None = None,
                 schema: str | None = None, warehouse: str | None = None,
                 rows_per_request: int = 10_000,
                 max_retries: int = 3, timeout: float = 60.0) -> int:
    """Snowflake sink over the public SQL REST API v2 (reference
    ``to_snowflake``, web/docs/tql2/operators/to_snowflake.md — the
    plugin bulk-ingests via ADBC; the offline-implementable analog is
    ``POST /api/v2/statements``). Each chunk ships as ONE statement
    with ONE text binding — the NDJSON block — unpacked server-side:

        INSERT INTO <table> (c1, c2, ...)
        SELECT v:"c1", v:"c2", ...
        FROM (SELECT PARSE_JSON(t.value) v
              FROM TABLE(SPLIT_TO_TABLE(?, '\\n')) t)

    so column mapping follows the reference's semantics (event fields
    select into same-named table columns; nested values arrive as
    semi-structured VARIANT) and the statement text stays O(columns),
    never O(rows). Distributed per block, chunked, retried; returns
    total rows sent. Offline-testable against
    :func:`load_http_server`."""
    import json as _json

    import pyarrow.compute as _pc

    if not table.replace(".", "").replace("_", "").isalnum():
        raise ValueError(f"suspicious table name {table!r}")
    cols = [f for f in ds.schema().names]
    for c in cols:
        if not c.replace("_", "").isalnum():
            raise ValueError(f"suspicious column name {c!r}")
    col_list = ", ".join(f'"{c.upper()}"' for c in cols)
    sel_list = ", ".join(f'v:"{c}"' for c in cols)
    statement = (
        f"INSERT INTO {table} ({col_list}) SELECT {sel_list} "
        f"FROM (SELECT PARSE_JSON(t.value) v "
        f"FROM TABLE(SPLIT_TO_TABLE(?, '\\n')) t)")
    endpoint = account_url.rstrip("/") + "/api/v2/statements"
    headers = {
        "Content-Type": "application/json",
        "Accept": "application/json",
        "Authorization": f"Bearer {token}",
        "X-Snowflake-Authorization-Token-Type": token_type,
    }
    ctx = {k: v for k, v in (("database", database), ("schema", schema),
                             ("warehouse", warehouse)) if v is not None}

    def _validate(body: bytes) -> None:
        # 2xx with empty body (loopback 204) is fine; a JSON body is
        # checked for the API's error/in-progress markers
        if not body:
            return
        try:
            d = _json.loads(body)
        except ValueError:
            return
        if not isinstance(d, dict):
            return
        state = d.get("sqlState")
        if state and state != "00000":
            raise RuntimeError(
                f"snowflake error {d.get('code')}: {d.get('message')}")
        if d.get("code") == "333334":  # QueryStatus in-progress (async)
            raise RuntimeError(
                "snowflake statement still executing after the request "
                "timeout; raise `timeout` (async polling not supported)")

    def _send(t: pa.Table) -> pa.Table:
        if t.num_rows:
            lines = [_json.dumps(r, separators=(",", ":"), default=str)
                     for r in t.to_pylist()]
            for i in range(0, len(lines), rows_per_request):
                chunk = "\n".join(lines[i:i + rows_per_request])
                body = _json.dumps({
                    "statement": statement,
                    "timeout": int(timeout),
                    **ctx,
                    "bindings": {"1": {"type": "TEXT", "value": chunk}},
                }).encode("utf-8")
                _http_post_retry(endpoint, body, headers=headers,
                                 timeout=timeout,
                                 max_retries=max_retries,
                                 validate=_validate)
        return pa.table({"docs": pa.array([t.num_rows], pa.int64())})

    acks = ds.map_batches(_send, batch_format="pyarrow").materialize()
    return sum(int(_pc.sum(b.column("docs")).as_py() or 0)
               for b in acks.iter_batches(batch_format="pyarrow"))


# ------------------------------- azure / secops / asl / email sinks


_OAUTH_TOKENS: dict = {}  # (token_url, client_id) -> (token, expiry) per worker


def _oauth2_client_credentials(token_url: str, client_id: str,
                               client_secret: str, scope: str,
                               timeout: float, max_retries: int) -> str:
    """OAuth2 client-credentials token, cached per worker process until
    60 s before expiry — one token round-trip per worker, not per
    block."""
    import json as _json
    import time as _time
    import urllib.parse as _up

    # key includes scope and a secret digest: a rotated secret or a
    # second caller with a different resource scope must not be served
    # a cached token minted for the other
    import hashlib as _hl

    key = (token_url, client_id, scope,
           _hl.sha256((client_secret or "").encode()).hexdigest()[:16])
    tok = _OAUTH_TOKENS.get(key)
    if tok and tok[1] > _time.time() + 60:
        return tok[0]
    body = _up.urlencode({
        "grant_type": "client_credentials", "client_id": client_id,
        "client_secret": client_secret, "scope": scope,
    }).encode("ascii")
    resp = _http_post_retry(
        token_url, body,
        headers={"Content-Type": "application/x-www-form-urlencoded"},
        timeout=timeout, max_retries=max_retries)
    d = _json.loads(resp)
    token = d["access_token"]
    _OAUTH_TOKENS[key] = (token, _time.time() + float(
        d.get("expires_in", 3600)))
    return token


def to_azure_log_analytics(ds, *, dce: str, dcr: str, table: str,
                           tenant_id: str = "", client_id: str = "",
                           client_secret: str = "",
                           access_token: str | None = None,
                           token_url: str | None = None,
                           rows_per_request: int = 500,
                           max_retries: int = 3,
                           timeout: float = 30.0) -> int:
    """Azure Log Analytics sink over the public Logs Ingestion API
    (reference ``to_azure_log_analytics`` operator,
    web/docs/tql2/operators/to_azure_log_analytics.md): JSON-array
    bodies POSTed to ``<dce>/dataCollectionRules/<dcr>/streams/
    <Custom-table>?api-version=2023-01-01`` with a Bearer token from
    the AAD client-credentials flow (scope
    ``https://monitor.azure.com/.default``), refreshed automatically
    and cached per worker. ``access_token`` bypasses the flow;
    ``token_url`` overrides the login endpoint (both keep the sink
    offline-testable). Distributed per block like the other HTTP
    sinks; returns total rows sent."""
    import json as _json
    import urllib.parse as _up

    stream = table if table.startswith("Custom-") else f"Custom-{table}"
    endpoint = (f"{dce.rstrip('/')}/dataCollectionRules/{_up.quote(dcr)}"
                f"/streams/{_up.quote(stream)}?api-version=2023-01-01")
    tok_url = token_url or (f"https://login.microsoftonline.com/"
                            f"{_up.quote(tenant_id)}/oauth2/v2.0/token")
    if access_token is None and not (tenant_id and client_id
                                     and client_secret):
        raise ValueError("to_azure_log_analytics: need either "
                         "access_token or tenant_id+client_id+"
                         "client_secret")

    def _send(t: pa.Table) -> pa.Table:
        if t.num_rows:
            token = access_token or _oauth2_client_credentials(
                tok_url, client_id, client_secret,
                "https://monitor.azure.com/.default", timeout,
                max_retries)
            headers = {"Authorization": f"Bearer {token}",
                       "Content-Type": "application/json"}
            rows = t.to_pylist()
            for i in range(0, len(rows), rows_per_request):
                payload = _json.dumps(rows[i:i + rows_per_request],
                                      separators=(",", ":"),
                                      default=str).encode("utf-8")
                _http_post_retry(endpoint, payload, headers=headers,
                                 timeout=timeout,
                                 max_retries=max_retries)
        return pa.table({"docs": pa.array([t.num_rows], pa.int64())})

    acks = ds.map_batches(_send, batch_format="pyarrow").materialize()
    return sum(int(pc.sum(b.column("docs")).as_py() or 0)
               for b in acks.iter_batches(batch_format="pyarrow"))


def to_google_secops(ds, *, customer_id: str, log_type: str,
                     log_text_col: str, access_token: str,
                     url: str | None = None, region: str | None = None,
                     timestamp_col: str | None = None,
                     labels: dict | None = None,
                     namespace: str = "tenzir",
                     max_request_size: int = 1_000_000,
                     max_retries: int = 3, timeout: float = 30.0) -> int:
    """Google SecOps (Chronicle) sink over the public unstructured-logs
    ingestion API (reference ``to_google_secops`` operator,
    web/docs/tql2/operators/to_google_secops.md): batched
    ``unstructuredlogentries:batchCreate`` JSON bodies, each kept under
    ``max_request_size`` bytes. ``region`` prefixes the public
    endpoint; ``url`` overrides it (offline-testable). Auth is a
    ready Bearer ``access_token`` — the service-account JWT signing
    flow needs an RSA library this container does not ship, so token
    minting stays outside (the documented loud-stub policy).
    Distributed per block; returns total log entries sent."""
    import json as _json

    if url is None:
        host = "malachiteingestion-pa.googleapis.com"
        if region:
            host = f"{region}-{host}"
        url = f"https://{host}"
    endpoint = url.rstrip("/") + "/v2/unstructuredlogentries:batchCreate"
    headers = {"Authorization": f"Bearer {access_token}",
               "Content-Type": "application/json"}
    base: dict = {"customer_id": customer_id, "log_type": log_type,
                  "namespace": namespace}
    if labels:
        base["labels"] = [{"key": str(k), "value": str(v)}
                          for k, v in sorted(labels.items())]
    overhead = len(_json.dumps({**base, "entries": []})) + 64

    def _send(t: pa.Table) -> pa.Table:
        if t.num_rows:
            rows = t.to_pylist()
            entries: list[dict] = []
            size = overhead

            def flush():
                nonlocal entries, size
                if entries:
                    payload = _json.dumps(
                        {**base, "entries": entries},
                        separators=(",", ":")).encode("utf-8")
                    _http_post_retry(endpoint, payload, headers=headers,
                                     timeout=timeout,
                                     max_retries=max_retries)
                entries, size = [], overhead

            for r in rows:
                e: dict = {"log_text": str(r[log_text_col])}
                if timestamp_col is not None \
                        and r.get(timestamp_col) is not None:
                    tv = r[timestamp_col]
                    e["ts_rfc3339"] = (
                        tv.isoformat() + ("" if getattr(
                            tv, "tzinfo", None) else "Z")
                        if hasattr(tv, "isoformat") else str(tv))
                sz = len(_json.dumps(e, separators=(",", ":"))) + 1
                if entries and size + sz > max_request_size:
                    flush()
                entries.append(e)
                size += sz
            flush()
        return pa.table({"docs": pa.array([t.num_rows], pa.int64())})

    acks = ds.map_batches(_send, batch_format="pyarrow").materialize()
    return sum(int(pc.sum(b.column("docs")).as_py() or 0)
               for b in acks.iter_batches(batch_format="pyarrow"))


def to_amazon_security_lake(ds, path: str, *, region: str,
                            account_id: str,
                            time_col: str | None = None) -> None:
    """Amazon Security Lake sink (reference ``to_asl`` operator,
    web/docs/tql2/operators/to_asl.md): OCSF events written as parquet
    under ASL's custom-source partition layout
    ``region=<region>/accountId=<id>/eventDay=<YYYYMMDD>/`` — the
    layout Security Lake crawls for custom sources. ``path`` may be a
    local directory or an ``s3://`` URI (Arrow filesystems). The write
    is Ray's distributed partitioned parquet write; ``eventDay``
    derives from ``time_col`` per batch (UTC), or a single literal
    partition when absent."""
    def stamp(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if time_col is not None:
            day = pc.strftime(t.column(time_col), format="%Y%m%d")
        else:
            day = pa.array(["19700101"] * n, pa.string())
        t = t.append_column("region", pa.array([region] * n, pa.string()))
        t = t.append_column("accountId",
                            pa.array([account_id] * n, pa.string()))
        t = t.append_column("eventDay", day)
        return t.replace_schema_metadata(None) if t.schema.metadata else t

    ds.map_batches(stamp, batch_format="pyarrow").write_parquet(
        path, partition_cols=["region", "accountId", "eventDay"])


def save_email(ds, recipient: str, *, endpoint: str = "smtp://localhost:25",
               from_addr: str = "", subject: str = "",
               body_format: str = "ndjson", username: str | None = None,
               password: str | None = None, tls: bool = False,
               mime: bool = False, max_bytes: int = 25_000_000) -> str:
    """Email sink (reference ``save_email`` operator,
    web/docs/tql2/operators/save_email.mdx): render the stream with a
    printer (``ndjson``/``csv``/``lines``) into ONE RFC 5322 message
    and deliver it. ``smtp://host:port`` endpoints send via SMTP
    (optional STARTTLS + auth); any other endpoint (``file://…`` or a
    plain path) saves the ``.eml`` file — the offline path. An email
    is a single bounded document, so this sink intentionally
    materializes the rendered body driver-side, capped at
    ``max_bytes`` (exceeding it raises — send a filtered stream, not
    a corpus). Returns the message id."""
    from email.message import EmailMessage
    from email.utils import make_msgid

    from tenzir_ray.sources.printers import (
        print_csv_batch, print_lines_batch, print_ndjson_batch,
    )

    printers = {"ndjson": print_ndjson_batch, "csv": print_csv_batch,
                "lines": print_lines_batch}
    if body_format not in printers:
        raise ValueError(f"save_email: unknown body_format "
                         f"{body_format!r} (one of {sorted(printers)})")
    rendered = ds.map_batches(printers[body_format],
                              batch_format="pyarrow")
    parts: list[str] = []
    total = 0
    for b in rendered.iter_batches(batch_format="pyarrow"):
        for line in b.column("line").to_pylist():
            total += len(line) + 1
            if total > max_bytes:
                raise ValueError(
                    f"save_email: rendered body exceeds max_bytes="
                    f"{max_bytes}; filter the stream first")
            parts.append(line)
    body = "\n".join(parts) + ("\n" if parts else "")

    msg = EmailMessage()
    msg["To"] = recipient
    msg["From"] = from_addr
    msg["Subject"] = subject
    msg["Message-ID"] = make_msgid()
    if mime:
        subtype = {"ndjson": "json", "csv": "csv",
                   "lines": "plain"}[body_format]
        msg.add_attachment(body.encode("utf-8"),
                           maintype="application" if subtype == "json"
                           else "text",
                           subtype=subtype)
    else:
        msg.set_content(body)

    if endpoint.startswith("smtp://") or endpoint.startswith("smtps://"):
        import smtplib
        import urllib.parse as _up

        u = _up.urlparse(endpoint)
        if endpoint.startswith("smtps://"):
            # smtps = IMPLICIT TLS on connect (default port 465), not
            # cleartext + STARTTLS
            cm = smtplib.SMTP_SSL(u.hostname, u.port or 465, timeout=30)
        else:
            cm = smtplib.SMTP(u.hostname, u.port or 25, timeout=30)
        with cm as s:
            if tls and not endpoint.startswith("smtps://"):
                s.starttls()
            if username is not None:
                s.login(username, password or "")
            s.send_message(msg, from_addr=from_addr or None,
                           to_addrs=[recipient])
    else:
        import os

        p = endpoint[len("file://"):] if endpoint.startswith("file://") \
            else endpoint
        tmp = p + ".tmp"
        with open(tmp, "wb") as f:
            f.write(bytes(msg))
        os.replace(tmp, p)
    return msg["Message-ID"]


def from_opensearch(url: str, index: str, *, query: dict | None = None,
                    sort_field: str = "_doc", page_size: int = 1_000,
                    max_pages: int = 100_000, max_retries: int = 3,
                    timeout: float = 30.0,
                    stage_dir: str | None = None):
    """OpenSearch/Elasticsearch SOURCE over the public ``_search`` +
    ``search_after`` deep-paging protocol (reference ``from_opensearch``
    connector): POST ``<url>/<index>/_search`` with a sort and a
    ``search_after`` cursor, page until a short page. The driver only
    spools each page's ``_source`` docs as NDJSON (one page in memory
    at a time — the bounded-ingest contract load_http follows); parsing
    and typing are distributed via the staged key-union pass.

    ``sort_field`` defaults to ``_doc`` (the protocol's cheap unique
    order; ``_id`` sorting is rejected by modern ES). A non-``_doc``
    field gets a ``_doc`` tiebreaker appended — search_after over a
    non-unique sort value would otherwise skip or repeat documents
    across page boundaries. Page requests go through the shared
    retry/backoff helper (a reset on page 9,999 must not restart a
    10,000-page export); exhausting ``max_pages`` with a live cursor
    raises instead of returning a silently-truncated corpus. Returns a
    Dataset."""
    import json as _json

    import ray.data as rd

    if stage_dir is None:
        from tenzir_ray.util import local_stage_dir

        spool = local_stage_dir("tenzir_ray_oss_", "from_opensearch")
        _ROUTED_STAGES.append(spool)
    else:
        spool = stage_dir
    import os as _os

    endpoint = url.rstrip("/") + f"/{index}/_search"
    sort: list = [{sort_field: "asc"}]
    if sort_field != "_doc":
        sort.append({"_doc": "asc"})  # unique tiebreaker
    cursor = None
    done = False
    paths: list[str] = []
    for page in range(max_pages):
        body: dict = {"size": page_size, "sort": sort,
                      "query": query or {"match_all": {}}}
        if cursor is not None:
            body["search_after"] = cursor
        resp = _http_post_retry(
            endpoint, _json.dumps(body).encode(),
            headers={"Content-Type": "application/json"},
            timeout=timeout, max_retries=max_retries)
        parsed = _json.loads(resp)
        hits = parsed.get("hits", {}).get("hits", [])
        if not hits:
            done = True
            break
        p = _os.path.join(spool, f"page-{page:06d}.ndjson")
        with open(p, "w") as fh:
            for h in hits:
                fh.write(_json.dumps(h.get("_source", {}),
                                     separators=(",", ":")) + "\n")
        paths.append(p)
        cursor = hits[-1].get("sort")
        if len(hits) < page_size or cursor is None:
            done = True
            break
    if not done:
        raise RuntimeError(
            f"from_opensearch: max_pages={max_pages} exhausted with a "
            f"live cursor — the result would be silently truncated; "
            f"raise max_pages or narrow the query")
    if not paths:
        return rd.from_items([]).limit(0)
    lines = rd.read_text(paths).map_batches(
        lambda t: pa.table({"line": t.column("text")}),
        batch_format="pyarrow")
    return _parse_ndjson_staged(lines, col="line", stage_dir=stage_dir)
