"""FTP connector: stdlib ``ftplib`` client + an in-repo loopback FTP
server (RFC 959, PASV mode) — reference ``load_ftp``/``save_ftp``
(web/docs/tql2/operators/load_ftp.md: URL-addressed byte streams).

The loopback server implements the slice ftplib actually issues —
USER/PASS, SYST, TYPE I, PASV with a fresh ephemeral data listener per
transfer, NLST/RETR/STOR, CWD/PWD, QUIT — over an in-memory
``{path: bytes}`` store, so the client is protocol-tested offline
(same loopback-double posture as the HTTP/S3/AMQP/Kafka peers).
"""
from __future__ import annotations

import threading


def load_ftp(path: str, *, host: str = "127.0.0.1", port: int = 21,
             user: str = "anonymous", password: str = "",
             timeout: float = 10.0):
    """Fetch one file over FTP and return a finite-drain thunk yielding
    a Dataset of ``line`` rows (the byte stream split on newlines —
    compose with read_* for structured formats)."""
    import ftplib
    import io

    import ray.data as rd

    def drain():
        cli = ftplib.FTP()
        cli.connect(host, port, timeout=timeout)
        cli.login(user, password)
        buf = io.BytesIO()
        try:
            cli.retrbinary(f"RETR {path}", buf.write)
        finally:
            cli.quit()
        text = buf.getvalue().decode(errors="replace")
        return rd.from_items(
            [{"line": l} for l in text.splitlines()])

    return drain


def save_ftp(ds, path: str, *, host: str = "127.0.0.1", port: int = 21,
             user: str = "anonymous", password: str = "",
             lines_fn=None, timeout: float = 10.0) -> int:
    """Render rows as NDJSON (or ``lines_fn``) and STOR the byte stream
    to ``path``. Driver-edge singleton (one control connection), the
    write dual of :func:`load_ftp`. Returns lines sent."""
    import ftplib
    import io
    import json as _json

    if lines_fn is None:
        def lines_fn(rows):
            return [_json.dumps(r, default=str) for r in rows]
    chunks: list[str] = []
    for batch in ds.iter_batches(batch_format="pyarrow"):
        chunks.extend(lines_fn(batch.to_pylist()))
    payload = ("\n".join(chunks) + "\n").encode() if chunks else b""
    cli = ftplib.FTP()
    cli.connect(host, port, timeout=timeout)
    cli.login(user, password)
    try:
        cli.storbinary(f"STOR {path}", io.BytesIO(payload))
    finally:
        cli.quit()
    return len(chunks)


def mini_ftp_server(host: str = "127.0.0.1", port: int = 0):
    """Returns ``(server_socket, bound_port, files)`` where ``files``
    maps path → bytes. Each PASV opens a one-shot ephemeral data
    listener, as real servers do."""
    import socket as _socket

    srv = _socket.socket(_socket.AF_INET, _socket.SOCK_STREAM)
    srv.setsockopt(_socket.SOL_SOCKET, _socket.SO_REUSEADDR, 1)
    srv.bind((host, port))
    srv.listen(16)
    bound = srv.getsockname()[1]

    files: dict[str, bytes] = {}
    lock = threading.Lock()

    def serve(conn) -> None:
        rfile = conn.makefile("rb")

        def send(line: str) -> None:
            conn.sendall((line + "\r\n").encode())

        data_srv: list = [None]  # pending PASV listener

        def open_data():
            d, data_srv[0] = data_srv[0], None
            if d is None:
                raise RuntimeError("no PASV before transfer")
            dconn, _ = d.accept()
            d.close()
            return dconn

        send("220 tenzir-ray mini FTP")
        cwd = "/"
        try:
            while True:
                raw = rfile.readline()
                if not raw:
                    return
                line = raw.decode(errors="replace").rstrip("\r\n")
                cmd, _, arg = line.partition(" ")
                cmd = cmd.upper()
                if cmd == "USER":
                    send("331 password please")
                elif cmd == "PASS":
                    send("230 logged in")
                elif cmd in ("SYST",):
                    send("215 UNIX Type: L8")
                elif cmd in ("TYPE", "NOOP", "OPTS"):
                    send("200 ok")
                elif cmd == "PWD":
                    send(f'257 "{cwd}"')
                elif cmd == "CWD":
                    cwd = arg or "/"
                    send("250 ok")
                elif cmd == "PASV":
                    d = _socket.socket(_socket.AF_INET,
                                       _socket.SOCK_STREAM)
                    d.bind((host, 0))
                    d.listen(1)
                    d.settimeout(10.0)
                    data_srv[0] = d
                    p = d.getsockname()[1]
                    h = host.replace(".", ",")
                    send(f"227 Entering Passive Mode "
                         f"({h},{p >> 8},{p & 0xFF})")
                elif cmd == "NLST":
                    send("150 here it comes")
                    dconn = open_data()
                    with lock:
                        names = sorted(files)
                    dconn.sendall(
                        "".join(n + "\r\n" for n in names).encode())
                    dconn.close()
                    send("226 done")
                elif cmd == "RETR":
                    with lock:
                        data = files.get(arg)
                    if data is None:
                        send("550 no such file")
                        continue
                    send("150 opening data connection")
                    dconn = open_data()
                    dconn.sendall(data)
                    dconn.close()
                    send("226 transfer complete")
                elif cmd == "STOR":
                    send("150 ok, send it")
                    dconn = open_data()
                    buf = b""
                    while True:
                        chunk = dconn.recv(65536)
                        if not chunk:
                            break
                        buf += chunk
                    dconn.close()
                    with lock:
                        files[arg] = buf
                    send("226 stored")
                elif cmd == "QUIT":
                    send("221 bye")
                    return
                else:
                    send(f"502 {cmd} not implemented")
        except (ConnectionError, OSError):
            pass
        finally:
            conn.close()

    def accept_loop() -> None:
        try:
            while True:
                conn, _ = srv.accept()
                threading.Thread(target=serve, args=(conn,),
                                 daemon=True).start()
        except OSError:
            pass

    threading.Thread(target=accept_loop, daemon=True).start()
    return srv, bound, files
