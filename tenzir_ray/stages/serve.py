"""Minimal `serve` (reference: operators/serve.cpp — the pipeline's
results are buffered node-side and retrieved over HTTP in pages).

``serve(ds)`` materializes the result once and exposes it on a loopback
HTTP endpoint:

- ``GET /events?offset=O&limit=N`` → NDJSON page + ``X-Next-Offset``
  header (the reference's continuation-token paging);
- ``GET /schema`` → column name/type JSON.

A background thread owns the server; ``ServeHandle.stop()`` shuts it
down. Batch-engine semantics: one finished result set, not a live
stream (the live analog is ``Lake.follow``)."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse


class ServeHandle:
    def __init__(self, server: ThreadingHTTPServer, thread: threading.Thread,
                 port: int):
        self._server = server
        self._thread = thread
        self.port = port

    def stop(self) -> None:
        self._server.shutdown()
        self._thread.join(timeout=5)
        self._server.server_close()


def serve(ds, host: str = "127.0.0.1", port: int = 0,
          default_limit: int = 1000) -> ServeHandle:
    rows = [
        {k: (v.decode("latin-1") if isinstance(v, bytes) else v)
         for k, v in r.items()}
        for r in ds.take_all()
    ]
    schema = [{"name": f.name, "type": str(f.type)}
              for f in ds.schema().base_schema] if hasattr(
        ds.schema(), "base_schema") else [
        {"name": n, "type": str(t)} for n, t in
        zip(ds.schema().names, ds.schema().types)]

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def do_GET(self):
            u = urlparse(self.path)
            if u.path == "/schema":
                body = json.dumps(schema).encode()
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
            off = int(q.get("offset", ["0"])[0])
            lim = int(q.get("limit", [str(default_limit)])[0])
            page = rows[off:off + lim]
            body = "\n".join(
                json.dumps(r, default=str) for r in page).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/x-ndjson")
            nxt = off + len(page)
            if nxt < len(rows):
                self.send_header("X-Next-Offset", str(nxt))
            self.end_headers()
            self.wfile.write(body)

    srv = ThreadingHTTPServer((host, port), Handler)
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    return ServeHandle(srv, th, srv.server_address[1])
