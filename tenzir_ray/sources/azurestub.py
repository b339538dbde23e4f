"""In-repo Azure Blob Storage REST loopback server — the Azure dual of
``s3stub.mini_s3_server``.

pyarrow's ``AzureFileSystem(blob_storage_authority=…)`` speaks the
public Azure Blob REST API (the Azurite-emulator URL style:
``/{account}/{container}/{blob}``); this stub implements the slice
azure-sdk-for-cpp's filesystem layer actually issues — the
``?action=getAccessControl`` HNS probe (answered 400 → flat
namespace), List Blobs (hierarchy + flat, XML), Get/Put Blob, ranged
GET (parquet footers via ``x-ms-range``), the Put Block / Put Block
List pair (Arrow's output stream uploads through it), Get Blob
Properties, Create/Delete Container and Delete Blob — so ``abfs://``-
class read/write paths are protocol-tested offline with no cloud.

SharedKey ``Authorization`` headers arrive but are not verified (the
stub is a test double, not a security boundary). State is in-memory;
containers auto-create on first write.
"""
from __future__ import annotations

import hashlib
import re
import threading
from urllib.parse import parse_qs, unquote, urlparse
from xml.sax.saxutils import escape as _esc

# Azurite's well-known devstore account key (public constant).
DEV_ACCOUNT = "devstoreaccount1"
DEV_KEY = ("Eby8vdM02xNOcqFlqUwJPLlmEtlCDXJ1OUzFT50uSRZ6IFsuFq2UVErCz4"
           "I6tq/K1SZFPTOtr/KBHBeksoGMGw==")
_MODIFIED = "Mon, 01 Jan 2024 00:00:00 GMT"
# Get Container Properties: azure-sdk-for-cpp's parser map::at's these
# (an absent one aborts the client process) — the Azurite header set
_CONTAINER_HDRS = {
    "ETag": '"c"', "Last-Modified": _MODIFIED,
    "x-ms-lease-status": "unlocked",
    "x-ms-lease-state": "available",
    "x-ms-has-immutability-policy": "false",
    "x-ms-has-legal-hold": "false",
    "x-ms-default-encryption-scope": "$account-encryption-key",
    "x-ms-deny-encryption-scope-override": "false",
    "x-ms-immutable-storage-with-versioning-enabled": "false",
}


def _etag(data: bytes) -> str:
    return '"' + hashlib.md5(data).hexdigest() + '"'


def mini_azure_server(host: str = "127.0.0.1", port: int = 0,
                      account: str = DEV_ACCOUNT):
    """Returns ``(server, bound_port, blobs)`` where ``blobs`` maps
    ``(container, name) -> bytes`` for white-box assertions. Call
    ``server.shutdown()`` when done."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    blobs: dict[tuple[str, str], bytes] = {}
    # staged blocks: (container, name) -> {block_id: bytes}
    blocks: dict[tuple[str, str], dict[str, bytes]] = {}
    containers: set[str] = set()
    lock = threading.Lock()

    class H(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        # ------------------------------------------------ helpers
        def _parts(self) -> tuple[str, str]:
            """(container, blob-name) from /{account}/{container}/{…}."""
            path = unquote(urlparse(self.path).path).lstrip("/")
            acct, _, rest = path.partition("/")
            if acct != account:
                rest = path  # tolerate authority-style account hosts
            container, _, name = rest.partition("/")
            return container, name

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
                self.send_header("x-ms-version", "2022-11-02")
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

        def _error(self, code: int, ms_code: str) -> None:
            if self.command == "HEAD":
                # a declared XML body on a HEAD error aborts the
                # azure-sdk response parser; errors ride the header
                self._reply(code, b"", {"x-ms-error-code": ms_code})
                return
            body = (f'<?xml version="1.0" encoding="utf-8"?>'
                    f"<Error><Code>{ms_code}</Code>"
                    f"<Message>{ms_code}</Message></Error>").encode()
            self._reply(code, body, {
                "x-ms-error-code": ms_code,
                "Content-Type": "application/xml"})

        # ------------------------------------------------ verbs
        def do_HEAD(self):
            q = self._q()
            container, name = self._parts()
            if "action" in q:
                # DataLake-Gen2 probe on a flat-namespace account —
                # Azurite answers 400; azure-sdk reads it as "HNS off".
                # MUST be body-less with no Content-Type: an XML error
                # body declared on this HEAD makes the SDK's response
                # parser abort the whole process ("Failed to parse xml")
                self._reply(400, b"", {
                    "x-ms-error-code": "HierarchicalNamespaceNotEnabled"})
                return
            with lock:
                if not name:
                    if container in containers:
                        self._reply(200, b"", _CONTAINER_HDRS)
                    else:
                        self._error(404, "ContainerNotFound")
                    return
                data = blobs.get((container, name))
            if data is None:
                self._error(404, "BlobNotFound")
                return
            self.send_response(200)
            self.send_header("x-ms-version", "2022-11-02")
            self.send_header("Content-Length", str(len(data)))
            self.send_header("Content-Type", "application/octet-stream")
            self.send_header("ETag", _etag(data))
            self.send_header("Last-Modified", _MODIFIED)
            self.send_header("x-ms-blob-type", "BlockBlob")
            self.send_header("x-ms-creation-time", _MODIFIED)
            self.send_header("x-ms-lease-status", "unlocked")
            self.send_header("x-ms-lease-state", "available")
            self.send_header("x-ms-server-encrypted", "true")
            self.send_header("Accept-Ranges", "bytes")
            self.end_headers()

        def do_GET(self):
            q = self._q()
            container, name = self._parts()
            if q.get("comp") == "list":
                self._list(container, q)
                return
            if not name and q.get("restype") == "container":
                # Get Container Properties arrives as GET too
                with lock:
                    known = container in containers
                if known:
                    self._reply(200, b"", _CONTAINER_HDRS)
                else:
                    self._error(404, "ContainerNotFound")
                return
            with lock:
                data = blobs.get((container, name))
            if data is None:
                self._error(404, "BlobNotFound")
                return
            rng = self.headers.get("x-ms-range") or \
                self.headers.get("Range")
            base = {"ETag": _etag(data), "Last-Modified": _MODIFIED,
                    "x-ms-blob-type": "BlockBlob",
                    "x-ms-creation-time": _MODIFIED,
                    "x-ms-lease-status": "unlocked",
                    "x-ms-lease-state": "available",
                    "x-ms-server-encrypted": "true",
                    "Accept-Ranges": "bytes",
                    "Content-Type": "application/octet-stream"}
            if rng:
                m = re.fullmatch(r"bytes=(\d*)-(\d*)", rng.strip())
                if not m or m.group(0) == "bytes=-" or not any(m.groups()):
                    self._error(416, "InvalidRange")
                    return
                lo_s, hi_s = m.groups()
                lo = int(lo_s) if lo_s else max(
                    0, len(data) - int(hi_s))
                hi = min(int(hi_s), len(data) - 1) if hi_s and lo_s \
                    else len(data) - 1
                if lo > hi or lo >= len(data):
                    self._error(416, "InvalidRange")
                    return
                part = data[lo:hi + 1]
                base["Content-Range"] = f"bytes {lo}-{hi}/{len(data)}"
                self._reply(206, part, base)
                return
            self._reply(200, data, base)

        def _list(self, container: str, q: dict) -> None:
            prefix = q.get("prefix", "")
            delim = q.get("delimiter", "")
            with lock:
                if container not in containers:
                    self._error(404, "ContainerNotFound")
                    return
                listed = sorted(
                    (n, len(v), _etag(v)) for (c, n), v in blobs.items()
                    if c == container and n.startswith(prefix))
            items, prefixes = [], []
            for n, size, etag in listed:
                if delim:
                    tail = n[len(prefix):]
                    if delim in tail:
                        p = prefix + tail.split(delim)[0] + delim
                        if p not in prefixes:
                            prefixes.append(p)
                        continue
                items.append((n, size, etag))
            body = ['<?xml version="1.0" encoding="utf-8"?>',
                    f'<EnumerationResults ServiceEndpoint="http://x/"'
                    f' ContainerName="{_esc(container)}">',
                    f"<Prefix>{_esc(prefix)}</Prefix>",
                    f"<Delimiter>{_esc(delim)}</Delimiter>",
                    "<Blobs>"]
            for n, size, etag in items:
                body.append(
                    f"<Blob><Name>{_esc(n)}</Name><Properties>"
                    f"<Last-Modified>{_MODIFIED}</Last-Modified>"
                    f"<Etag>{etag}</Etag>"
                    f"<Content-Length>{size}</Content-Length>"
                    "<Content-Type>application/octet-stream"
                    "</Content-Type>"
                    "<BlobType>BlockBlob</BlobType>"
                    "<LeaseStatus>unlocked</LeaseStatus>"
                    "<LeaseState>available</LeaseState>"
                    "<ServerEncrypted>true</ServerEncrypted>"
                    "</Properties></Blob>")
            for p in prefixes:
                body.append(f"<BlobPrefix><Name>{_esc(p)}</Name>"
                            "</BlobPrefix>")
            body.append("</Blobs><NextMarker/></EnumerationResults>")
            self._reply(200, "".join(body).encode(), {
                "Content-Type": "application/xml"})

        def do_PUT(self):
            q = self._q()
            container, name = self._parts()
            data = self._body()
            comp = q.get("comp")
            with lock:
                if not name:
                    containers.add(container)  # Create Container
                    self._reply(201, b"", {
                        "ETag": '"c"', "Last-Modified": _MODIFIED})
                    return
                containers.add(container)
                if comp == "lease":
                    # Arrow's DeleteFile acquires a blob lease first;
                    # grant every request (single-writer test double)
                    action = (self.headers.get("x-ms-lease-action")
                              or "acquire").lower()
                    hdrs = {"ETag": '"l"', "Last-Modified": _MODIFIED}
                    if action == "acquire":
                        hdrs["x-ms-lease-id"] = \
                            "00000000-0000-0000-0000-00000000abba"
                        self._reply(201, b"", hdrs)
                    else:  # release / break / renew / change
                        self._reply(200, b"", hdrs)
                    return
                if comp == "block":
                    bid = q.get("blockid", "")
                    blocks.setdefault((container, name), {})[bid] = data
                    # the SDK's Put Block parser hard-requires this
                    # header (map::at aborts the process without it)
                    self._reply(201, b"", {
                        "x-ms-request-server-encrypted": "true"})
                    return
                if comp == "blocklist":
                    staged = blocks.pop((container, name), {})
                    ids = re.findall(
                        rb"<(?:Latest|Committed|Uncommitted)>"
                        rb"\s*([^<]+?)\s*</", data)
                    try:
                        blob = b"".join(
                            staged[i.decode()] for i in ids)
                    except KeyError:
                        self._error(400, "InvalidBlockList")
                        return
                    blobs[(container, name)] = blob
                    self._reply(201, b"", {
                        "ETag": _etag(blob), "Last-Modified": _MODIFIED,
                        "x-ms-request-server-encrypted": "true"})
                    return
                # Put Blob (x-ms-blob-type: BlockBlob)
                blobs[(container, name)] = data
            self._reply(201, b"", {
                "ETag": _etag(data), "Last-Modified": _MODIFIED,
                "x-ms-request-server-encrypted": "true"})

        def do_DELETE(self):
            container, name = self._parts()
            with lock:
                if name:
                    if blobs.pop((container, name), None) is None:
                        self._error(404, "BlobNotFound")
                        return
                else:
                    containers.discard(container)
                    for k in [k for k in blobs if k[0] == container]:
                        del blobs[k]
            self._reply(202, b"", {"x-ms-delete-type-permanent": "true"})

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer((host, port), H)
    bound = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, bound, blobs


def loopback_azure_fs(port: int, *, account: str = DEV_ACCOUNT,
                      key: str = DEV_KEY):
    """A pyarrow AzureFileSystem pointed at :func:`mini_azure_server` —
    pass as ``filesystem=`` to ``ray.data.read_parquet``/
    ``write_parquet`` with plain ``container/blob`` paths."""
    from pyarrow.fs import AzureFileSystem

    return AzureFileSystem(
        account, account_key=key,
        blob_storage_authority=f"127.0.0.1:{port}",
        dfs_storage_authority=f"127.0.0.1:{port}",
        blob_storage_scheme="http", dfs_storage_scheme="http")

