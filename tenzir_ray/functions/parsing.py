"""Field-level parse/print function variants (reference:
web/docs/tql2/functions/parse_*.mdx / print_*.mdx — parse_json, parse_kv,
parse_csv etc. usable inside expressions; impls ride the same parser
machinery as the operators)."""

from __future__ import annotations

import json

import pyarrow as pa


def parse_json_col(arr, fields: list[str] | None = None) -> pa.Array:
    """JSON-string column → struct column. With ``fields``, only those
    keys are extracted (projection at parse time — the cheap path);
    without, the union of observed keys becomes the struct schema
    (multi_series_builder merge-policy analog)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    parsed: list[dict | None] = []
    for s in arr.to_pylist():
        if s is None:
            parsed.append(None)
            continue
        try:
            v = json.loads(s)
            parsed.append(v if isinstance(v, dict) else {"value": v})
        except (json.JSONDecodeError, TypeError):
            parsed.append(None)
    if fields is None:
        seen: list[str] = []
        for d in parsed:
            if d:
                for k in d:
                    if k not in seen:
                        seen.append(k)
        fields = seen
    cols = [
        pa.array([None if d is None else d.get(f) for d in parsed])
        for f in fields
    ]
    mask = pa.array([d is None for d in parsed], pa.bool_())
    return pa.StructArray.from_arrays(cols, names=fields, mask=mask)


def print_json_col(arr) -> pa.Array:
    """struct column → compact JSON strings (print_json dual)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return pa.array(
        [
            None if v is None else json.dumps(v, separators=(",", ":"),
                                              default=str)
            for v in arr.to_pylist()
        ],
        pa.string(),
    )
