"""Write-side printers: the duals of the parsers in formats.py.

The reference ships printer halves for its formats (formats/*.cpp
printer classes; TQL ``print_csv``/``print_kv``/``write_syslog`` …).
Each printer here is a vectorized-as-possible batch function producing a
string column (default ``line``) from structured columns; every printer
round-trips through its parser (tested), so ``parse(print(x)) == x``.

``write_lines`` lands a string column as plain text files, one file per
block written verbatim by the block's worker (partitioned, resumable
output; no CSV quoting in the path).
"""

from __future__ import annotations

import datetime
import json
import math
import re

import pyarrow as pa


def _col(t: pa.Table, name: str, i: int):
    v = t.column(name)[i].as_py() if name in t.column_names else None
    return v


def print_ndjson_batch(t: pa.Table, out: str = "line",
                       columns: list[str] | None = None) -> pa.Table:
    """rows → compact JSON lines (print_json/write_json dual)."""
    cols = columns or t.column_names
    rows = t.select(cols).to_pylist()
    lines = [json.dumps(r, separators=(",", ":"), default=str) for r in rows]
    return pa.table({out: pa.array(lines, pa.string())})


def print_lines_batch(t: pa.Table, out: str = "line") -> pa.Table:
    """rows → space-joined non-null values, strings VERBATIM (no CSV
    quoting/escaping) — the reference `lines` printer contract
    (formats/lines.cpp:100-148): nulls skipped, scalars printed
    JSON-style. A single-string-column table whose values contain no
    newlines round-trips read_lines exactly; embedded newlines pass
    through verbatim (as in the reference) and will span physical
    lines — `lines` is a lossy format, use ndjson for total
    round-trips."""
    per_col = []
    for name in t.column_names:
        c = t.column(name)
        if pa.types.is_string(c.type) or pa.types.is_large_string(c.type):
            per_col.append(c.to_pylist())
        else:
            per_col.append([
                None if v is None else json.dumps(v, default=str)
                for v in c.to_pylist()])
    lines = [" ".join(x for x in row if x is not None)
             for row in zip(*per_col)]
    return pa.table({out: pa.array(lines, pa.string())})


def print_csv_batch(t: pa.Table, out: str = "line",
                    include_header: bool = False,
                    delimiter: str = ",") -> pa.Table:
    """rows → CSV lines via Arrow's C++ CSV writer (formats/xsv printer
    half). Header emission is per-batch — off by default (emit it once
    host-side when assembling a file)."""
    import io

    import pyarrow.csv as pacsv

    buf = io.BytesIO()
    pacsv.write_csv(
        t, buf,
        write_options=pacsv.WriteOptions(
            include_header=include_header, delimiter=delimiter),
    )
    lines = _split_csv_records(buf.getvalue().decode())
    return pa.table({out: pa.array(lines, pa.string())})


def _split_csv_records(text: str) -> list[str]:
    """Split CSV writer output on *record* boundaries, not raw newlines:
    a '\\n' inside a quoted field (the writer quotes embedded newlines)
    must not start a new record. A fragment belongs to the previous
    record iff the accumulated quote count is odd (RFC4180 doubles
    quotes, so parity is preserved)."""
    fragments = text.split("\n")
    if fragments and fragments[-1] == "":
        fragments.pop()
    records: list[str] = []
    pending: list[str] = []
    open_quotes = 0
    for frag in fragments:
        pending.append(frag)
        open_quotes += frag.count('"')
        if open_quotes % 2 == 0:
            records.append("\n".join(pending))
            pending = []
            open_quotes = 0
    if pending:  # unterminated quote — emit as-is rather than drop data
        records.append("\n".join(pending))
    return records


def _kv_quote(v) -> str:
    s = str(v)
    return f'"{s}"' if (" " in s or "\t" in s) else s


def print_kv_batch(t: pa.Table, out: str = "line",
                   columns: list[str] | None = None) -> pa.Table:
    """rows → ``k=v k2=v2`` lines (formats/kv.cpp printer dual); values
    with spaces are quoted, nulls omitted."""
    cols = columns or t.column_names
    rows = t.select(cols).to_pylist()
    lines = [
        " ".join(f"{k}={_kv_quote(v)}" for k, v in r.items() if v is not None)
        for r in rows
    ]
    return pa.table({out: pa.array(lines, pa.string())})


def print_syslog_batch(t: pa.Table, out: str = "line") -> pa.Table:
    """(facility, severity, ts_raw, host, app, pid, msg) → RFC5424 lines
    (formats/syslog.cpp printer dual; round-trips parse_syslog_batch)."""
    lines = []
    for i in range(t.num_rows):
        fac = _col(t, "facility", i) or 0
        sev = _col(t, "severity", i) or 0
        pri = fac * 8 + sev
        ts = _col(t, "ts_raw", i) or "-"
        host = _col(t, "host", i) or "-"
        app = _col(t, "app", i) or "-"
        pid = _col(t, "pid", i)
        msg = _col(t, "msg", i) or ""
        lines.append(
            f"<{pri}>1 {ts} {host} {app} {pid if pid is not None else '-'} - "
            f"- {msg}"
        )
    return pa.table({out: pa.array(lines, pa.string())})


def print_cef_batch(t: pa.Table, out: str = "line") -> pa.Table:
    """header columns + ``extension`` struct → CEF lines
    (formats/cef.cpp printer dual)."""
    hdr = ["cef_version", "device_vendor", "device_product",
           "device_version", "signature_id", "name", "severity"]
    lines = []
    for i in range(t.num_rows):
        head = "|".join(
            str(_col(t, h, i) if _col(t, h, i) is not None else "")
            .replace("|", "\\|")
            for h in hdr)
        ext = _col(t, "extension", i) or {}
        ext_s = " ".join(f"{k}={_kv_quote(v)}" for k, v in ext.items()
                         if v is not None)
        lines.append(f"CEF:{head}|{ext_s}")
    return pa.table({out: pa.array(lines, pa.string())})


def print_leef_batch(t: pa.Table, out: str = "line") -> pa.Table:
    """header columns + ``attrs`` struct → LEEF lines (formats/leef.cpp
    printer dual; tab-delimited attributes)."""
    lines = []
    for i in range(t.num_rows):
        ver = _col(t, "leef_version", i) or "1.0"
        head = "|".join(
            str(_col(t, h, i) if _col(t, h, i) is not None else "")
            for h in ("vendor", "product", "version", "event_id"))
        attrs = _col(t, "attrs", i) or {}
        attr_s = "\t".join(f"{k}={v}" for k, v in attrs.items()
                           if v is not None)
        lines.append(f"LEEF:{ver}|{head}|{attr_s}")
    return pa.table({out: pa.array(lines, pa.string())})


def print_zeek_tsv(t: pa.Table, path: str = "log", out: str = "line") -> pa.Table:
    """rows → zeek TSV block: #separator/#fields/#types headers + rows
    (formats/zeek-tsv printer dual). Emits the whole batch as one header
    + N data lines."""
    _ZEEK_TYPES = {
        pa.string(): "string", pa.int64(): "int", pa.int32(): "int",
        pa.float64(): "double", pa.bool_(): "bool",
    }
    names = t.column_names
    types = [_ZEEK_TYPES.get(f.type, "string") for f in t.schema]
    lines = [
        "#separator \\x09",
        "#set_separator\t,",
        "#empty_field\t(empty)",
        "#unset_field\t-",
        f"#path\t{path}",
        "#fields\t" + "\t".join(names),
        "#types\t" + "\t".join(types),
    ]
    for r in t.to_pylist():
        lines.append("\t".join(
            "-" if r[n] is None else str(r[n]) for n in names))
    lines.append("#close\t-")
    return pa.table({out: pa.array(lines, pa.string())})


_TQL_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _tql_key(k: str) -> str:
    """Record keys print bare only when they are identifiers; anything
    else ('user name', keys with ':') quotes, or the line is
    unparseable."""
    return k if _TQL_IDENT.match(k) else json.dumps(k)


def _tql_value(v) -> str:
    """One value in TQL literal notation (write_tql.md: records
    ``{key: val}``, double-quoted strings, bare numbers/bools/null,
    unquoted ISO timestamps). Bytes render as an escaped string — the
    blob-literal approximation this engine uses throughout. Non-finite
    floats print ``null`` (TQL has no nan/inf literal; a bare ``nan``
    token would make the whole line unparseable)."""
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return repr(v) if math.isfinite(v) else "null"
    if isinstance(v, int):
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, bytes):
        return json.dumps(v.decode("utf-8", errors="backslashreplace"))
    if isinstance(v, (list, tuple)):
        return "[" + ", ".join(_tql_value(x) for x in v) + "]"
    if isinstance(v, dict):
        return ("{" + ", ".join(f"{_tql_key(k)}: {_tql_value(x)}"
                                for k, x in v.items()) + "}")
    return json.dumps(str(v))


def print_tql_batch(t: pa.Table, out: str = "line", *,
                    strip_null_fields: bool = False) -> pa.Table:
    """rows → compact TQL record notation, one event per line
    (``write_tql compact=true`` — web/docs/tql2/operators/write_tql.md;
    the reference's default pretty/color modes are terminal sugar, the
    compact form is the machine dual)."""
    lines = []
    for r in t.to_pylist():
        items = [(k, v) for k, v in r.items()
                 if not (strip_null_fields and v is None)]
        lines.append("{" + ", ".join(f"{_tql_key(k)}: {_tql_value(v)}"
                                     for k, v in items) + "}")
    return pa.table({out: pa.array(lines, pa.string())})


_CODEC_EXT = {"gzip": ".gz", "zstd": ".zst", "lz4": ".lz4", "bz2": ".bz2",
              "brotli": ".br"}


def write_lines(ds, path: str, column: str = "line",
                codec: str | None = None) -> None:
    """Distributed plain-text writer: one file per block under ``path``
    (resumable, partitioned output — never one giant file). Each block's
    lines are written verbatim by the worker holding the block — no CSV
    writer in the path, so commas / quotes / embedded newlines in the
    payload pass through untouched (they are the line content).
    ``codec`` (gzip/zstd/lz4/bz2/brotli) compresses each part file with
    the matching extension — the save-side dual of the reference's
    extension-inferred compression (operators/from_to_2.cpp:172-210)."""
    import os
    import uuid

    os.makedirs(path, exist_ok=True)
    ext = ".txt" + (_CODEC_EXT[codec] if codec else "")

    def _write_block(t: pa.Table) -> pa.Table:
        if t.num_rows:
            col = t.column(column).cast(pa.string()).to_pylist()
            name = os.path.join(path, f"part-{uuid.uuid4().hex}{ext}")
            tmp = name + ".tmp"
            payload = ("\n".join("" if v is None else v for v in col)
                       + "\n").encode("utf-8")
            if codec:
                sink = pa.output_stream(tmp, compression=codec)
            else:
                sink = pa.output_stream(tmp)
            with sink as f:
                f.write(payload)
            os.rename(tmp, name)  # atomic publish → resumable output
        return pa.table({"rows": pa.array([t.num_rows], pa.int64())})

    # Tiny per-block row counts are the only thing that reaches the driver.
    ds.select_columns([column]).map_batches(
        _write_block, batch_format="pyarrow").materialize()
