"""Path / file functions (reference builtins/functions/path.cpp:133
``file_name``/``parent_dir``; file_contents.cpp:108 ``file_contents``).

All column functions are vectorized pyarrow regex/conditional kernels —
no per-row Python."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def _chunked(arr):
    return arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr


def file_name(arr) -> pa.Array:
    """Last path component ('/a/b/c.json' → 'c.json')."""
    return pc.replace_substring_regex(_chunked(arr), r"^.*/", "")


def parent_dir(arr) -> pa.Array:
    """Directory part ('/a/b/c.json' → '/a/b'; 'x' → '.'; '/x' → '/')."""
    arr = _chunked(arr)
    has_slash = pc.match_substring_regex(arr, "/")
    trimmed = pc.replace_substring_regex(arr, r"/[^/]*$", "")
    rooted = pc.if_else(pc.equal(trimmed, ""), pa.scalar("/"), trimmed)
    return pc.if_else(has_slash, rooted, pa.scalar("."))


def file_stem(arr) -> pa.Array:
    """File name without its last extension ('c.tar.gz' → 'c.tar')."""
    return pc.replace_substring_regex(file_name(arr), r"\.[^.]*$", "")


def file_extension(arr) -> pa.Array:
    """Last extension including the dot ('' when none)."""
    name = file_name(arr)
    has = pc.match_substring_regex(name, r"\.[^.]*$")
    ext = pc.replace_substring_regex(name, r"^.*(\.[^.]*)$", r"\1")
    return pc.if_else(has, ext, pa.scalar(""))


def file_contents(path: str, binary: bool = False):
    """Whole-file read as a scalar (reference file_contents.cpp:108 —
    a config/seed helper, not a data-plane source; use the format
    readers for data)."""
    mode = "rb" if binary else "r"
    with open(path, mode) as f:
        return f.read()
