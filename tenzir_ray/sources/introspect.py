"""Host-introspection sources (reference operators: files.md,
processes.md, sockets.md, nics.md, version.md, diagnostics.md — each
emits system state as an event stream).

Pure-/proc + os.scandir implementations (no psutil in this
environment); each returns a small in-memory Dataset — these are
driver-side metadata sources by nature, not distributed scans."""

from __future__ import annotations

import os
import time


def files(path: str, recurse: bool = False):
    """Directory listing as events (operators/files.md): one row per
    entry with name/size/mtime/type."""
    import ray.data as rd

    rows = []

    def scan(d: str):
        try:
            with os.scandir(d) as it:
                for e in it:
                    try:
                        st = e.stat(follow_symlinks=False)
                    except OSError:
                        continue
                    rows.append({
                        "path": e.path,
                        "name": e.name,
                        "type": "dir" if e.is_dir(follow_symlinks=False)
                                else ("symlink" if e.is_symlink() else "file"),
                        "size": int(st.st_size),
                        "mtime": float(st.st_mtime),
                    })
                    if recurse and e.is_dir(follow_symlinks=False):
                        scan(e.path)
        except OSError:
            pass

    scan(path)
    return rd.from_items(rows) if rows else rd.from_items(
        [{"path": path, "name": "", "type": "empty", "size": 0,
          "mtime": 0.0}]).limit(0)


def processes():
    """Running processes as events (operators/processes.md) — /proc scan:
    pid, command, state, rss pages, started-seconds-ago."""
    import ray.data as rd

    hertz = os.sysconf("SC_CLK_TCK")
    try:
        with open("/proc/uptime") as f:
            uptime = float(f.read().split()[0])
    except OSError:
        uptime = 0.0
    rows = []
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat") as f:
                st = f.read()
            comm = st[st.index("(") + 1:st.rindex(")")]
            rest = st[st.rindex(")") + 2:].split()
            rows.append({
                "pid": int(pid),
                "command": comm,
                "state": rest[0],
                "ppid": int(rest[1]),
                "rss_pages": int(rest[21]),
                "age_s": max(0.0, uptime - int(rest[19]) / hertz),
            })
        except (OSError, ValueError, IndexError):
            continue
    return rd.from_items(rows)


_TCP_STATES = {
    "01": "ESTABLISHED", "02": "SYN_SENT", "03": "SYN_RECV",
    "04": "FIN_WAIT1", "05": "FIN_WAIT2", "06": "TIME_WAIT",
    "07": "CLOSE", "08": "CLOSE_WAIT", "09": "LAST_ACK",
    "0A": "LISTEN", "0B": "CLOSING",
}


def _hex_addr(a: str) -> tuple[str, int]:
    ip_hex, port_hex = a.split(":")
    b = bytes.fromhex(ip_hex)
    ip = ".".join(str(x) for x in reversed(b)) if len(b) == 4 else ip_hex
    return ip, int(port_hex, 16)


def sockets():
    """Open TCP/UDP sockets as events (operators/sockets.md) —
    /proc/net/tcp + /proc/net/udp."""
    import ray.data as rd

    rows = []
    for proto, path in (("tcp", "/proc/net/tcp"), ("udp", "/proc/net/udp")):
        try:
            with open(path) as f:
                lines = f.read().splitlines()[1:]
        except OSError:
            continue
        for line in lines:
            p = line.split()
            if len(p) < 4:
                continue
            lip, lport = _hex_addr(p[1])
            rip, rport = _hex_addr(p[2])
            rows.append({
                "proto": proto,
                "local_ip": lip, "local_port": lport,
                "remote_ip": rip, "remote_port": rport,
                "state": _TCP_STATES.get(p[3], p[3]) if proto == "tcp"
                         else "",
            })
    return rd.from_items(rows)


def version() -> dict:
    """Engine/runtime version event (operators/version.md)."""
    import platform

    import pyarrow
    import ray

    return {
        "engine": "tenzir_ray",
        "ray": ray.__version__,
        "pyarrow": pyarrow.__version__,
        "python": platform.python_version(),
        "platform": platform.platform(),
        "ts": time.time(),
    }


def metrics() -> dict:
    """Engine/cluster metrics snapshot as one event (operators/metrics.md
    — the reference emits per-component metric streams; the data-plane
    metrics live in ``Lake.lineage()``, this is the node/cluster view)."""
    import ray

    total = ray.cluster_resources() if ray.is_initialized() else {}
    avail = ray.available_resources() if ray.is_initialized() else {}
    return {
        "ts": time.time(),
        "cpus_total": float(total.get("CPU", 0.0)),
        "cpus_available": float(avail.get("CPU", 0.0)),
        "object_store_bytes": float(total.get("object_store_memory", 0.0)),
        "object_store_available": float(avail.get("object_store_memory", 0.0)),
        "memory_bytes": float(total.get("memory", 0.0)),
    }


def openapi() -> dict:
    """OpenAPI spec of this engine's HTTP surface as one event
    (operators/openapi.md — the reference dumps its REST API spec).
    Documents the `serve` spool endpoints (stages/serve.py) and the
    push-ingest endpoints (sources/formats.py load_http_server /
    from_fluent_bit), the only HTTP servers this engine runs."""
    spec = {
        "openapi": "3.0.0",
        "info": {"title": "tenzir_ray", "version": "1.0"},
        "paths": {
            "/events": {
                "get": {
                    "summary": "page served events as NDJSON",
                    "parameters": [
                        {"name": "offset", "in": "query",
                         "schema": {"type": "integer"}},
                        {"name": "limit", "in": "query",
                         "schema": {"type": "integer"}},
                    ],
                    "responses": {"200": {
                        "description": "NDJSON page; X-Next-Offset "
                                       "header carries the cursor"}},
                }
            },
            "/schema": {
                "get": {
                    "summary": "column name/type map of the served result",
                    "responses": {"200": {"description": "JSON schema"}},
                }
            },
            "/ingest": {
                "post": {
                    "summary": "push events (json / ndjson body) into a "
                               "load_http_server source",
                    "responses": {"200": {"description": "accepted"}},
                }
            },
        },
    }
    import json

    return {"spec": json.dumps(spec, sort_keys=True),
            "paths": sorted(spec["paths"]), "version": "3.0.0"}


def plugins():
    """Operator + expression-function inventory (the `plugins` /
    `show plugins` analog, web docs operators/plugins.md): one row per
    pipeline-text operator (scraped from the planner's dispatch via
    ``ast`` — self-maintaining, no hand-kept list) and one per
    whitelisted expression function. Returns a list of
    {name, kind} dicts sorted by (kind, name)."""
    import ast as _ast
    import inspect

    from tenzir_ray.pipelines import planner as _p

    ops: set[str] = set()
    tree = _ast.parse(inspect.getsource(_p))
    for node in _ast.walk(tree):
        # `if op == "name"` / `if op in ("a", "b")` dispatch arms
        if not isinstance(node, _ast.Compare):
            continue
        left = node.left
        if not (isinstance(left, _ast.Name) and left.id == "op"):
            continue
        cmp = node.comparators[0]
        if isinstance(cmp, _ast.Constant) and isinstance(cmp.value, str):
            ops.add(cmp.value)
        elif isinstance(cmp, (_ast.Tuple, _ast.List)):
            ops.update(e.value for e in cmp.elts
                       if isinstance(e, _ast.Constant)
                       and isinstance(e.value, str))
    rows = [{"name": n, "kind": "operator"} for n in ops]
    rows += [{"name": n, "kind": "function"}
             for n in _p._expr_funcs()]
    return sorted(rows, key=lambda r: (r["kind"], r["name"]))
