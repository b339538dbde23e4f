"""In-repo S3 REST loopback server — the object-store dual of
``mini_kafka_broker`` / ``mini_amqp_broker`` / ``load_http_server``.

pyarrow's ``S3FileSystem(endpoint_override=…)`` speaks the public S3
REST API (https://docs.aws.amazon.com/AmazonS3/latest/API/); this stub
implements the slice the AWS SDK's filesystem layer actually issues —
HEAD bucket/object, ranged GET (parquet footers read via ``Range:
bytes=…``), simple PUT, the three-call multipart upload (Arrow's
``open_output_stream`` always uploads via Initiate/UploadPart/Complete),
DELETE, ListObjectsV2 with prefix+delimiter, and GetBucketLocation — so
``s3://`` read/write paths are protocol-tested offline with no cloud.

SigV4 ``Authorization`` headers arrive but are not verified (the stub is
a test double, not a security boundary). State is in-memory; buckets
auto-create on first write.
"""
from __future__ import annotations

import hashlib
import threading
from urllib.parse import parse_qs, unquote, urlparse
from xml.sax.saxutils import escape as _esc


def _xml(body: str) -> bytes:
    return ('<?xml version="1.0" encoding="UTF-8"?>' + body).encode()


def _etag(data: bytes) -> str:
    return '"' + hashlib.md5(data).hexdigest() + '"'


def mini_s3_server(host: str = "127.0.0.1", port: int = 0):
    """Returns ``(server, bound_port, objects)`` where ``objects`` maps
    ``(bucket, key) -> bytes`` for white-box assertions. Call
    ``server.shutdown()`` when done."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    objects: dict[tuple[str, str], bytes] = {}
    uploads: dict[str, dict[int, bytes]] = {}
    buckets: set[str] = set()
    lock = threading.Lock()

    class H(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"  # the SDK sends Expect:
        # 100-continue and reuses connections; HTTP/1.1 + exact
        # Content-Length on every response keeps it happy

        # ------------------------------------------------ helpers
        def _bucket_key(self) -> tuple[str, str]:
            path = unquote(urlparse(self.path).path)
            bucket, _, key = path.lstrip("/").partition("/")
            return bucket, key

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
                # a client aborting a download mid-body is routine;
                # a dead handler thread would poison its keep-alive
                self.close_connection = True

        def _not_found(self, what: str = "NoSuchKey") -> None:
            self._reply(404, _xml(
                f"<Error><Code>{what}</Code></Error>"))

        # ------------------------------------------------ verbs
        def do_HEAD(self):
            bucket, key = self._bucket_key()
            with lock:
                if not key:
                    if bucket in buckets:
                        self._reply(200)
                    else:
                        self._not_found("NoSuchBucket")
                    return
                data = objects.get((bucket, key))
            if data is None:
                self._not_found()
                return
            # HEAD: advertise the real object size with no body (the
            # SDK sizes its ranged reads from this)
            self.send_response(200)
            self.send_header("Content-Length", str(len(data)))
            self.send_header("ETag", _etag(data))
            self.send_header("Content-Type", "binary/octet-stream")
            self.send_header("Last-Modified",
                             "Mon, 01 Jan 2024 00:00:00 GMT")
            self.send_header("Accept-Ranges", "bytes")
            self.end_headers()

        def do_GET(self):
            bucket, key = self._bucket_key()
            q = self._q()
            if "location" in q:
                self._reply(200, _xml("<LocationConstraint/>"))
                return
            if not key or "list-type" in q or "prefix" in q:
                self._list(bucket, q)
                return
            with lock:
                data = objects.get((bucket, key))
            if data is None:
                self._not_found()
                return
            rng = self.headers.get("Range")
            if rng and rng.startswith("bytes="):
                lo_s, _, hi_s = rng[len("bytes="):].partition("-")
                if not lo_s and not hi_s:  # "bytes=-": both empty
                    self._reply(416, _xml(
                        "<Error><Code>InvalidRange</Code></Error>"), {
                        "Content-Range": f"bytes */{len(data)}"})
                    return
                lo = int(lo_s) if lo_s else max(
                    0, len(data) - int(hi_s))
                hi = min(int(hi_s), len(data) - 1) if hi_s and lo_s \
                    else len(data) - 1
                if lo > hi or lo >= len(data):
                    # real S3 reports 416 InvalidRange; a 206 with an
                    # empty body would read as truncated-but-ok
                    self._reply(416, _xml(
                        "<Error><Code>InvalidRange</Code></Error>"), {
                        "Content-Range": f"bytes */{len(data)}"})
                    return
                part = data[lo:hi + 1]
                self._reply(206, part, {
                    "ETag": _etag(data),
                    "Content-Range":
                        f"bytes {lo}-{hi}/{len(data)}",
                    "Accept-Ranges": "bytes",
                    "Content-Type": "binary/octet-stream"})
                return
            self._reply(200, data, {
                "ETag": _etag(data), "Accept-Ranges": "bytes",
                "Content-Type": "binary/octet-stream"})

        def _list(self, bucket: str, q: dict) -> None:
            prefix = q.get("prefix", "")
            delim = q.get("delimiter", "")
            with lock:
                if bucket not in buckets:
                    self._not_found("NoSuchBucket")
                    return
                # snapshot sizes+etags in the SAME critical section —
                # a concurrent DELETE between list and index would
                # KeyError otherwise
                listed = sorted(
                    (k, len(v), _etag(v)) for (b, k), v in
                    objects.items()
                    if b == bucket and k.startswith(prefix))
            contents, prefixes = [], []
            for k, size, etag in listed:
                if delim:
                    tail = k[len(prefix):]
                    if delim in tail:
                        p = prefix + tail.split(delim)[0] + delim
                        if p not in prefixes:
                            prefixes.append(p)
                        continue
                contents.append((k, size, etag))
            body = ["<ListBucketResult>",
                    f"<Name>{_esc(bucket)}</Name>",
                    f"<Prefix>{_esc(prefix)}</Prefix>",
                    "<IsTruncated>false</IsTruncated>",
                    f"<KeyCount>{len(contents)}</KeyCount>"]
            for k, size, etag in contents:
                body.append(
                    f"<Contents><Key>{_esc(k)}</Key>"
                    f"<Size>{size}</Size>"
                    "<LastModified>2024-01-01T00:00:00.000Z"
                    "</LastModified>"
                    f"<ETag>{etag}</ETag>"
                    "<StorageClass>STANDARD</StorageClass>"
                    "</Contents>")
            for p in prefixes:
                body.append(f"<CommonPrefixes><Prefix>{_esc(p)}"
                            "</Prefix></CommonPrefixes>")
            body.append("</ListBucketResult>")
            self._reply(200, _xml("".join(body)),
                        {"Content-Type": "application/xml"})

        def do_PUT(self):
            bucket, key = self._bucket_key()
            q = self._q()
            data = self._body()
            with lock:
                buckets.add(bucket)
                if not key:
                    self._reply(200)  # CreateBucket
                    return
                if "partNumber" in q and "uploadId" in q:
                    uploads.setdefault(q["uploadId"], {})[
                        int(q["partNumber"])] = data
                    self._reply(200, b"", {"ETag": _etag(data)})
                    return
                objects[(bucket, key)] = data
            self._reply(200, b"", {"ETag": _etag(data)})

        def do_POST(self):
            bucket, key = self._bucket_key()
            q = self._q()
            body = self._body()
            if "uploads" in q:  # InitiateMultipartUpload
                import uuid as _uuid

                uid = f"up-{_uuid.uuid4().hex}"  # unique under
                # concurrency — a len()-derived id would collide when
                # two workers initiate for the same key (task retries)
                with lock:
                    buckets.add(bucket)
                    uploads[uid] = {}
                self._reply(200, _xml(
                    f"<InitiateMultipartUploadResult>"
                    f"<Bucket>{_esc(bucket)}</Bucket>"
                    f"<Key>{_esc(key)}</Key>"
                    f"<UploadId>{uid}</UploadId>"
                    f"</InitiateMultipartUploadResult>"),
                    {"Content-Type": "application/xml"})
                return
            if "uploadId" in q:  # CompleteMultipartUpload
                with lock:
                    parts = uploads.pop(q["uploadId"], None)
                    if parts is not None:
                        blob = b"".join(parts[i]
                                        for i in sorted(parts))
                        objects[(bucket, key)] = blob
                if parts is None:
                    # unknown/already-consumed id: real S3 says
                    # NoSuchUpload — overwriting with b"" would
                    # truncate the object on a Complete retry
                    self._not_found("NoSuchUpload")
                    return
                self._reply(200, _xml(
                    f"<CompleteMultipartUploadResult>"
                    f"<Bucket>{_esc(bucket)}</Bucket>"
                    f"<Key>{_esc(key)}</Key>"
                    f"<ETag>{_etag(blob)}</ETag>"
                    f"</CompleteMultipartUploadResult>"),
                    {"Content-Type": "application/xml"})
                return
            self._reply(400, _xml("<Error><Code>BadRequest"
                                  "</Code></Error>"))

        def do_DELETE(self):
            bucket, key = self._bucket_key()
            q = self._q()
            with lock:
                if "uploadId" in q:  # AbortMultipartUpload
                    uploads.pop(q["uploadId"], None)
                elif key:
                    objects.pop((bucket, key), None)
                else:
                    buckets.discard(bucket)
            self._reply(204)

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer((host, port), H)
    bound = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, bound, objects


def loopback_s3_fs(port: int, *, access_key: str = "test",
                   secret_key: str = "test"):
    """A pyarrow S3FileSystem pointed at :func:`mini_s3_server` — pass
    as ``filesystem=`` to ``ray.data.read_parquet``/``write_parquet``
    with plain ``bucket/key`` paths."""
    from pyarrow.fs import S3FileSystem

    return S3FileSystem(access_key=access_key, secret_key=secret_key,
                        endpoint_override=f"http://127.0.0.1:{port}",
                        scheme="http", allow_bucket_creation=True,
                        allow_bucket_deletion=True)
