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
    ".tsv": read_csv,
    ".txt": read_lines,
    ".log": read_lines,
}


def open_uri(uri: str, **kw):
    """Dispatch on extension, transparently handling a trailing compression
    suffix (Arrow decompresses .gz/.zst/.bz2 via arrow_open_stream_args —
    reference: from_to_2.cpp extension matching + compress_decompress.cpp).
    """
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
