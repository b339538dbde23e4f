"""Misc functions: env / secret / config (reference
builtins/functions/env.cpp, secret resolution in
libtenzir/src/secret_resolution.cpp, config access).

``secret`` resolves from an explicit store (dict or file) with an
environment fallback — there is no external secret manager in this
environment; the call-shape matches the reference so pipelines port.
"""

from __future__ import annotations

import json
import os

_CONFIG: dict = {}
_SECRETS: dict = {}


def env(name: str, default: str | None = None) -> str | None:
    """Environment variable lookup (functions/env.cpp)."""
    return os.environ.get(name, default)


def load_config(path_or_dict) -> dict:
    """Load engine config (the reference's tenzir.yaml analog — JSON/YAML
    file or dict); values become available via :func:`config`."""
    global _CONFIG
    if isinstance(path_or_dict, dict):
        _CONFIG = dict(path_or_dict)
    else:
        with open(path_or_dict) as f:
            text = f.read()
        try:
            _CONFIG = json.loads(text)
        except json.JSONDecodeError:
            import re

            # minimal flat YAML (key: value) fallback — no yaml lib needed
            cfg = {}
            for line in text.splitlines():
                m = re.match(r"^(\w[\w.-]*):\s*(.+?)\s*$", line)
                if m:
                    cfg[m.group(1)] = m.group(2).strip("'\"")
            _CONFIG = cfg
    return _CONFIG


def config(key: str, default=None):
    """Dotted-path config lookup over the loaded config. A flat key
    stored verbatim (the flat-YAML fallback keeps 'a.b: v' as one key)
    wins over the nested descent."""
    if isinstance(_CONFIG, dict) and key in _CONFIG:
        return _CONFIG[key]
    cur = _CONFIG
    for part in key.split("."):
        if not isinstance(cur, dict) or part not in cur:
            return default
        cur = cur[part]
    return cur


def set_secrets(store: dict) -> None:
    global _SECRETS
    _SECRETS = dict(store)


def secret(name: str) -> str:
    """Secret resolution: explicit store first, then ``TENZIR_SECRET_<NAME>``
    env var (secret_resolution.cpp — the reference consults the platform
    store; the env form is its documented local fallback)."""
    if name in _SECRETS:
        return _SECRETS[name]
    v = os.environ.get(f"TENZIR_SECRET_{name.upper()}")
    if v is None:
        raise KeyError(f"unknown secret {name!r}")
    return v


def type_of(arr) -> "pa.Array":
    """Arrow type name of the column, one constant string per row
    (reference type_of; our runtime type system IS Arrow's)."""
    import pyarrow as pa

    return pa.array([str(arr.type)] * len(arr), pa.string())


def type_id(arr) -> "pa.Array":
    """Stable numeric id of the column's Arrow type (reference
    type_id)."""
    import pyarrow as pa

    return pa.array([arr.type.id] * len(arr), pa.int64())
