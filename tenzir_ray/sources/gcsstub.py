"""In-repo Google Cloud Storage JSON-API loopback server — the GCS dual
of ``s3stub.mini_s3_server`` / ``azurestub.mini_azure_server``.

pyarrow's ``GcsFileSystem(endpoint_override=…)`` speaks the public GCS
JSON API (https://cloud.google.com/storage/docs/json_api) through
google-cloud-cpp; this stub implements the slice the client actually
issues — object metadata GET, ``alt=media`` download with ``Range``
(parquet footers), list-objects with prefix/delimiter paging shape,
the resumable-upload session protocol (POST → session URI → PUT
chunks with ``Content-Range`` → 308/200), object DELETE and bucket
metadata — so ``gs://``-class read/write paths are protocol-tested
offline with no cloud. ``crc32c``/``md5Hash`` metadata are REAL
(reusing the Kafka connector's pure-Python CRC32C) because the client
verifies downloads against them.

Anonymous credentials only (the stub is a test double, not a security
boundary). State is in-memory; buckets auto-create on first write.
"""
from __future__ import annotations

import base64
import hashlib
import json
import re
import struct
import threading
import uuid
from urllib.parse import parse_qs, unquote, urlparse

from tenzir_ray.sources.kafka import crc32c

_CREATED = "2024-01-01T00:00:00.000Z"


@__import__("functools").lru_cache(maxsize=256)
def _hashes(data: bytes) -> tuple[str, str, str]:
    """(etag, md5Hash, crc32c) — content-keyed cache: every ranged GET
    and every list row needs them, and the pure-Python CRC32C pass is
    O(object) per call without it."""
    md5 = hashlib.md5(data)
    return (md5.hexdigest(),
            base64.b64encode(md5.digest()).decode(),
            base64.b64encode(struct.pack(">I", crc32c(data))).decode())


def _obj_meta(bucket: str, name: str, data: bytes,
              custom: dict | None = None) -> dict:
    if custom:
        return {**_obj_meta(bucket, name, data), "metadata": custom}
    return {
        "kind": "storage#object",
        "id": f"{bucket}/{name}/1",
        "name": name,
        "bucket": bucket,
        "generation": "1",
        "metageneration": "1",
        "contentType": "application/octet-stream",
        "storageClass": "STANDARD",
        "size": str(len(data)),
        "etag": _hashes(data)[0],
        "md5Hash": _hashes(data)[1],
        "crc32c": _hashes(data)[2],
        "timeCreated": _CREATED,
        "updated": _CREATED,
        "timeStorageClassUpdated": _CREATED,
    }


def mini_gcs_server(host: str = "127.0.0.1", port: int = 0):
    """Returns ``(server, bound_port, objects)`` where ``objects`` maps
    ``(bucket, name) -> bytes`` for white-box assertions. Call
    ``server.shutdown()`` when done."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    objects: dict[tuple[str, str], bytes] = {}
    # custom key->value object metadata (Arrow marks directory
    # placeholders with {"arrow/gcsfs": "directory"} and classifies by
    # it on stat — dropping it breaks CreateDir)
    metas: dict[tuple[str, str], dict] = {}
    # upload_id -> (bucket, name, bytearray, custom metadata)
    sessions: dict[str, tuple[str, str, bytearray, dict]] = {}
    buckets: set[str] = set()
    lock = threading.Lock()

    class H(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        # ------------------------------------------------ helpers
        def _q(self) -> dict[str, str]:
            q = parse_qs(urlparse(self.path).query,
                         keep_blank_values=True)
            return {k: v[0] for k, v in q.items()}

        def _body(self) -> bytes:
            n = int(self.headers.get("Content-Length") or 0)
            return self.rfile.read(n) if n else b""

        def _reply(self, code: int, body: bytes = b"",
                   headers: dict | None = None) -> None:
            try:
                self.send_response(code)
                for k, v in (headers or {}).items():
                    self.send_header(k, v)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                if body and self.command != "HEAD":
                    self.wfile.write(body)
            except (BrokenPipeError, ConnectionResetError):
                # google-cloud-cpp closes a download stream early once
                # it has the bytes it wanted (it requests full objects
                # and aborts) — routine, not an error; a dead handler
                # thread here poisons the client's connection pool
                self.close_connection = True

        def _json(self, obj: dict, code: int = 200,
                  headers: dict | None = None) -> None:
            self._reply(code, json.dumps(obj).encode(),
                        {"Content-Type": "application/json",
                         **(headers or {})})

        def _error(self, code: int, reason: str = "notFound") -> None:
            self._json({"error": {
                "code": code, "message": reason,
                "errors": [{"reason": reason, "domain": "global",
                            "message": reason}]}}, code)

        # ------------------------------------------------ verbs
        def do_GET(self):
            path = unquote(urlparse(self.path).path)
            q = self._q()
            m = re.fullmatch(
                r"(?:/download)?/storage/v1/b/([^/]+)/o/(.+)", path)
            if m and q.get("alt") == "media":
                self._download(m.group(1), m.group(2))
                return
            if m:
                with lock:
                    data = objects.get((m.group(1), m.group(2)))
                if data is None:
                    self._error(404)
                else:
                    self._json(_obj_meta(
                        m.group(1), m.group(2), data,
                        metas.get((m.group(1), m.group(2)))))
                return
            m = re.fullmatch(r"/storage/v1/b/([^/]+)/o", path)
            if m:
                self._list(m.group(1), q)
                return
            m = re.fullmatch(r"/storage/v1/b/([^/]+)", path)
            if m:
                with lock:
                    known = m.group(1) in buckets
                if known:
                    self._json({
                        "kind": "storage#bucket", "id": m.group(1),
                        "name": m.group(1), "projectNumber": "1",
                        "metageneration": "1", "location": "US",
                        "storageClass": "STANDARD", "etag": "b1",
                        "locationType": "region",
                        "timeCreated": _CREATED, "updated": _CREATED})
                else:
                    self._error(404)
                return
            self._error(404)

        def _download(self, bucket: str, name: str) -> None:
            with lock:
                data = objects.get((bucket, name))
            if data is None:
                self._error(404)
                return
            rng = self.headers.get("Range")
            full = _obj_meta(bucket, name, data)
            base = {
                "x-goog-generation": "1",
                "x-goog-metageneration": "1",
                "x-goog-stored-content-length": str(len(data)),
                "x-goog-stored-content-encoding": "identity",
                "x-goog-hash": (f"crc32c={full['crc32c']},"
                                f"md5={full['md5Hash']}"),
                "Content-Type": "application/octet-stream",
                "Accept-Ranges": "bytes",
                # downloads are one-shot: the client aborts full-object
                # streams once it has the bytes it wanted, and an
                # aborted keep-alive connection poisons curl's pool
                # (next request on it sees "server returned nothing")
                "Connection": "close",
            }
            self.close_connection = True
            if rng:
                m = re.fullmatch(r"bytes=(\d*)-(\d*)", rng.strip())
                if not m:
                    self._error(416, "requestedRangeNotSatisfiable")
                    return
                lo_s, hi_s = m.groups()
                if not lo_s and not hi_s:  # "bytes=-": both empty
                    self._error(416, "requestedRangeNotSatisfiable")
                    return
                lo = int(lo_s) if lo_s else max(
                    0, len(data) - int(hi_s))
                hi = min(int(hi_s), len(data) - 1) if hi_s and lo_s \
                    else len(data) - 1
                if lo > hi or lo >= len(data):
                    self._error(416, "requestedRangeNotSatisfiable")
                    return
                base["Content-Range"] = f"bytes {lo}-{hi}/{len(data)}"
                self._reply(206, data[lo:hi + 1], base)
                return
            self._reply(200, data, base)

        def _list(self, bucket: str, q: dict) -> None:
            prefix = q.get("prefix", "")
            delim = q.get("delimiter", "")
            with lock:
                if bucket not in buckets:
                    self._error(404)
                    return
                listed = sorted(
                    (n, bytes(v), metas.get((bucket, n)))
                    for (b, n), v in objects.items()
                    if b == bucket and n.startswith(prefix))
            items, prefixes = [], []
            for n, data, custom in listed:
                if delim:
                    tail = n[len(prefix):]
                    if delim in tail:
                        p = prefix + tail.split(delim)[0] + delim
                        if p not in prefixes:
                            prefixes.append(p)
                        continue
                items.append(_obj_meta(bucket, n, data, custom))
            out: dict = {"kind": "storage#objects", "items": items}
            if prefixes:
                out["prefixes"] = prefixes
            self._json(out)

        def do_POST(self):
            path = unquote(urlparse(self.path).path)
            q = self._q()
            body = self._body()
            m = re.fullmatch(r"/upload/storage/v1/b/([^/]+)/o", path)
            if m and q.get("uploadType") == "resumable":
                bucket = m.group(1)
                name = q.get("name", "")
                custom: dict = {}
                if body:
                    try:
                        meta = json.loads(body)
                        name = name or meta.get("name", "")
                        custom = meta.get("metadata") or {}
                    except ValueError:
                        pass
                uid = uuid.uuid4().hex
                with lock:
                    buckets.add(bucket)
                    sessions[uid] = (bucket, name, bytearray(), custom)
                host = self.headers.get("Host", "127.0.0.1")
                self._reply(200, b"", {
                    "Location":
                        f"http://{host}/upload/storage/v1/b/{bucket}"
                        f"/o?uploadType=resumable&upload_id={uid}"})
                return
            if m and q.get("uploadType") == "multipart":
                # multipart/related: part 1 = metadata JSON, part 2 =
                # payload; split on the boundary from Content-Type
                bucket = m.group(1)
                ctype = self.headers.get("Content-Type", "")
                bm = re.search(r'boundary="?([^";]+)"?', ctype)
                if not bm:
                    self._error(400, "badRequest")
                    return
                parts = body.split(b"--" + bm.group(1).encode())
                # strip exactly the ONE CRLF that precedes the next
                # boundary — rstrip would eat legitimate trailing
                # '-'/CR/LF payload bytes
                segs = [p.partition(b"\r\n\r\n")[2].removesuffix(
                    b"\r\n") for p in parts if b"\r\n\r\n" in p]
                if len(segs) < 2:
                    self._error(400, "badRequest")
                    return
                meta = json.loads(segs[0] or b"{}")
                name = q.get("name") or meta.get("name", "")
                custom = meta.get("metadata") or {}
                data = segs[1]
                with lock:
                    buckets.add(bucket)
                    objects[(bucket, name)] = data
                    if custom:
                        metas[(bucket, name)] = custom
                    else:
                        metas.pop((bucket, name), None)
                self._json(_obj_meta(bucket, name, data, custom))
                return
            m = re.fullmatch(r"/storage/v1/b", path)
            if m:  # CreateBucket
                try:
                    name = json.loads(body or b"{}").get("name", "")
                except ValueError:
                    name = ""
                with lock:
                    buckets.add(name)
                self._json({"kind": "storage#bucket", "name": name,
                            "id": name, "etag": "b1",
                            "location": "US", "metageneration": "1",
                            "storageClass": "STANDARD",
                            "timeCreated": _CREATED,
                            "updated": _CREATED})
                return
            self._error(404)

        def do_PUT(self):
            q = self._q()
            data = self._body()
            uid = q.get("upload_id")
            if not uid:
                self._error(404)
                return
            with lock:
                sess = sessions.get(uid)
            if sess is None:
                self._error(404)
                return
            bucket, name, buf, custom = sess
            cr = self.headers.get("Content-Range", "")
            # "bytes 0-4/5", "bytes 0-4/*" (more coming), "bytes */5"
            m = re.fullmatch(r"bytes (\*|\d+-\d+)/(\*|\d+)", cr.strip())
            total = None
            if m:
                span, tot = m.groups()
                if span != "*":
                    lo, hi = (int(x) for x in span.split("-"))
                    with lock:
                        if len(buf) < hi + 1:
                            buf.extend(b"\0" * (hi + 1 - len(buf)))
                        buf[lo:hi + 1] = data
                total = None if tot == "*" else int(tot)
            elif data:
                with lock:
                    buf.extend(data)
                total = len(buf)
            else:
                total = len(buf)
            with lock:
                done = total is not None and len(buf) >= total
                if done:
                    objects[(bucket, name)] = bytes(buf)
                    if custom:
                        metas[(bucket, name)] = custom
                    else:
                        metas.pop((bucket, name), None)
                    sessions.pop(uid, None)
                    blob = objects[(bucket, name)]
            if done:
                self._json(_obj_meta(bucket, name, blob, custom))
            else:
                hdrs = {}
                if len(buf):
                    hdrs["Range"] = f"bytes=0-{len(buf) - 1}"
                self._reply(308, b"", hdrs)

        def do_DELETE(self):
            path = unquote(urlparse(self.path).path)
            m = re.fullmatch(r"/storage/v1/b/([^/]+)/o/(.+)", path)
            with lock:
                if m:
                    if objects.pop(
                            (m.group(1), m.group(2)), None) is None:
                        self._error(404)
                        return
                    metas.pop((m.group(1), m.group(2)), None)
                    self._reply(204)
                    return
                m = re.fullmatch(r"/storage/v1/b/([^/]+)", path)
                if m:
                    b = m.group(1)
                    buckets.discard(b)
                    for k in [k for k in objects if k[0] == b]:
                        del objects[k]
                        metas.pop(k, None)
                    self._reply(204)
                    return
            self._error(404)

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer((host, port), H)
    bound = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, bound, objects


def loopback_gcs_fs(port: int):
    """A pyarrow GcsFileSystem pointed at :func:`mini_gcs_server` — pass
    as ``filesystem=`` to ``ray.data.read_parquet``/``write_parquet``
    with plain ``bucket/name`` paths."""
    import datetime

    from pyarrow.fs import GcsFileSystem

    return GcsFileSystem(
        anonymous=True, endpoint_override=f"127.0.0.1:{port}",
        scheme="http",
        retry_time_limit=datetime.timedelta(seconds=5))


from pyarrow.fs import FileSystemHandler as _FileSystemHandler


class _GcsCompatHandler(_FileSystemHandler):
    """pyarrow FileSystemHandler delegating to a GcsFileSystem, except
    ``open_input_file`` returns a seekable whole-object buffer.

    Why: pyarrow 16.1's ``GcsRandomAccessFile.closed()`` reports True
    before any read when the filesystem is re-entered through a PYTHON
    callback layer — exactly what Ray Data's RetryingPyFileSystem wrap
    does to every user filesystem — so ``ray.data.read_parquet(...,
    filesystem=GcsFileSystem(...))`` dies with "I/O operation on closed
    file" regardless of server (the C++-native paths — pq.read_table /
    ds.dataset / write_parquet — are unaffected). The shim trades
    ranged reads for whole-object buffering on open, which is correct
    but not footer-pruned; use it for the Ray path until the upstream
    quirk is fixed, and the plain filesystem everywhere else.
    """

    def __init__(self, inner):
        self._fs = inner

    # identity -------------------------------------------------------
    def get_type_name(self):
        return "gcs-compat"

    def normalize_path(self, path):
        return self._fs.normalize_path(path)

    def __eq__(self, other):
        return isinstance(other, _GcsCompatHandler) and \
            self._fs.equals(other._fs)

    def __ne__(self, other):
        return not self.__eq__(other)

    # info -----------------------------------------------------------
    def get_file_info(self, paths):
        return self._fs.get_file_info(paths)

    def get_file_info_selector(self, selector):
        return self._fs.get_file_info(selector)

    # io -------------------------------------------------------------
    def open_input_stream(self, path):
        return self._fs.open_input_stream(path)

    def open_input_file(self, path):
        import pyarrow as pa

        with self._fs.open_input_stream(path) as s:
            return pa.BufferReader(s.read())

    def open_output_stream(self, path, metadata):
        return self._fs.open_output_stream(path, metadata=metadata)

    def open_append_stream(self, path, metadata):
        raise NotImplementedError("GCS does not support appends")

    # mutation -------------------------------------------------------
    def create_dir(self, path, recursive):
        self._fs.create_dir(path, recursive=recursive)

    def delete_dir(self, path):
        self._fs.delete_dir(path)

    def delete_dir_contents(self, path, missing_dir_ok=False):
        self._fs.delete_dir_contents(path, missing_dir_ok=missing_dir_ok)

    def delete_root_dir_contents(self):
        raise NotImplementedError("refusing to clear a whole bucket")

    def delete_file(self, path):
        self._fs.delete_file(path)

    def move(self, src, dest):
        self._fs.move(src, dest)

    def copy_file(self, src, dest):
        self._fs.copy_file(src, dest)


def gcs_ray_compat_fs(port: int):
    """:func:`loopback_gcs_fs` wrapped for Ray Data (see
    :class:`_GcsCompatHandler` for the pyarrow quirk this works
    around). Pass as ``filesystem=`` to ``ray.data.read_parquet`` /
    ``write_parquet``."""
    from pyarrow.fs import PyFileSystem

    return PyFileSystem(_GcsCompatHandler(loopback_gcs_fs(port)))
