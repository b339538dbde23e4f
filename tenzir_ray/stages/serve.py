"""Minimal `serve` (reference: operators/serve.cpp — the pipeline's
results are buffered node-side in a BOUNDED buffer and retrieved over
HTTP in pages).

``serve(ds)`` streams the result ONCE into a disk spool of Arrow IPC
files (bounded by ``max_rows`` — never a driver-side list of all rows)
and exposes it on a loopback HTTP endpoint:

- ``GET /events?offset=O&limit=N`` → NDJSON page + ``X-Next-Offset``
  header (the reference's continuation-token paging); pages are sliced
  from the memory-mapped spool file(s) — only page-size data is ever
  converted to Python;
- ``GET /schema`` → column name/type JSON.

A background thread owns the server; ``ServeHandle.stop()`` shuts it
down and removes the spool. Batch-engine semantics: one finished result
set, not a live stream (the live analog is ``Lake.follow``)."""

from __future__ import annotations

import bisect
import json
import os
import shutil
import tempfile
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import pyarrow as pa
import pyarrow.feather as feather


class ServeHandle:
    def __init__(self, server: ThreadingHTTPServer, thread: threading.Thread,
                 port: int, spool: str, total_rows: int, truncated: bool,
                 owns_spool: bool = True, spool_paths: list | None = None):
        self._server = server
        self._thread = thread
        self.port = port
        self.spool = spool
        self.total_rows = total_rows
        self.truncated = truncated
        self._owns_spool = owns_spool
        self._spool_paths = spool_paths or []

    def stop(self) -> None:
        self._server.shutdown()
        self._thread.join(timeout=5)
        self._server.server_close()
        # a self-created tempdir is removed whole; in a caller-supplied
        # spool_dir only the page files WE wrote are unlinked — any
        # pre-existing files (and the directory) are not ours to delete
        if self._owns_spool:
            shutil.rmtree(self.spool, ignore_errors=True)
        else:
            for pth in self._spool_paths:
                try:
                    os.unlink(pth)
                except OSError:
                    pass


def serve(ds, host: str = "127.0.0.1", port: int = 0,
          default_limit: int = 1000, max_rows: int = 1_000_000,
          spool_dir: str | None = None) -> ServeHandle:
    spool = spool_dir or tempfile.mkdtemp(prefix="tenzir_ray_serve_")
    starts: list[int] = []   # first row index of each spool file
    paths: list[str] = []
    total = 0
    truncated = False
    schema: pa.Schema | None = None
    for i, tbl in enumerate(
            ds.iter_batches(batch_format="pyarrow", batch_size=8192)):
        if schema is None:
            schema = tbl.schema
        if total >= max_rows:
            truncated = True  # buffer cap, as serve.cpp bounds its buffer
            break
        if tbl.num_rows > max_rows - total:
            tbl = tbl.slice(0, max_rows - total)
            truncated = True
        path = os.path.join(spool, f"page-{i:06d}.arrow")
        feather.write_feather(tbl, path, compression="uncompressed")
        starts.append(total)
        paths.append(path)
        total += tbl.num_rows
    if schema is None:
        schema = getattr(ds.schema(), "base_schema", None) or pa.schema([])
    schema_json = [{"name": f.name, "type": str(f.type)} for f in schema]
    total_rows = total

    def page_rows(off: int, lim: int) -> list[dict]:
        out: list[dict] = []
        off = max(0, off)  # a negative offset must not index paths[-1]
        if off >= total_rows or lim <= 0:
            return out
        fi = bisect.bisect_right(starts, off) - 1
        while fi < len(paths) and len(out) < lim:
            t = feather.read_table(paths[fi], memory_map=True)
            local = max(0, off - starts[fi])
            need = lim - len(out)
            out.extend(t.slice(local, need).to_pylist())
            off = starts[fi] + t.num_rows
            fi += 1
        return [
            {k: (v.decode("latin-1") if isinstance(v, bytes) else v)
             for k, v in r.items()}
            for r in out
        ]

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def do_GET(self):
            u = urlparse(self.path)
            if u.path == "/schema":
                body = json.dumps(schema_json).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(body)
                return
            if u.path != "/events":
                self.send_response(404)
                self.end_headers()
                return
            q = parse_qs(u.query)
            try:
                off = int(q.get("offset", ["0"])[0])
                lim = int(q.get("limit", [str(default_limit)])[0])
            except ValueError:
                self.send_response(400)
                self.end_headers()
                self.wfile.write(b"offset/limit must be integers")
                return
            off = max(0, off)  # X-Next-Offset must advance from 0
            page = page_rows(off, lim)
            body = "\n".join(
                json.dumps(r, default=str) for r in page).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/x-ndjson")
            nxt = off + len(page)
            if nxt < total_rows:
                self.send_header("X-Next-Offset", str(nxt))
            if truncated:
                self.send_header("X-Truncated", "true")
            self.end_headers()
            self.wfile.write(body)

    srv = ThreadingHTTPServer((host, port), Handler)
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    return ServeHandle(srv, th, srv.server_address[1], spool, total_rows,
                       truncated, owns_spool=spool_dir is None,
                       spool_paths=paths)
