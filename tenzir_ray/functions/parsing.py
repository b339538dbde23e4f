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


def _one_col(arr) -> "pa.Table":
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return pa.table({"__x": arr})


def parse_kv_col(arr) -> pa.Array:
    """key=value string column → struct column (field-level parse_kv)."""
    from tenzir_ray.sources.formats import parse_kv_batch

    return parse_kv_batch(_one_col(arr), col="__x").column("kv").combine_chunks()


def parse_syslog_col(arr) -> pa.Array:
    """syslog string column → struct {facility, severity, ts_raw, host,
    app, pid, msg} (field-level parse_syslog)."""
    t = None
    from tenzir_ray.sources.formats import parse_syslog_batch

    t = parse_syslog_batch(_one_col(arr), col="__x").drop_columns(["__x"])
    return pa.StructArray.from_arrays(
        [t.column(n).combine_chunks() for n in t.column_names],
        names=t.column_names)


def parse_grok_col(arr, pattern: str) -> pa.Array:
    """grok over a string column → struct of named captures."""
    from tenzir_ray.sources.formats import parse_grok_batch

    t = parse_grok_batch(_one_col(arr), pattern, col="__x").drop_columns(["__x"])
    return pa.StructArray.from_arrays(
        [t.column(n).combine_chunks() for n in t.column_names],
        names=t.column_names)


def parse_csv_col(arr, columns: list[str], delimiter: str = ",") -> pa.Array:
    """CSV-line string column → struct with the given field names
    (field-level parse_csv; values stay strings)."""
    import pyarrow.compute as pc

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    parts = pc.split_pattern(arr, pattern=delimiter)
    # fixed-size slices pad missing fields with null, so ragged rows
    # (fewer fields than declared columns) yield null instead of
    # crashing the batch on an out-of-bounds list_element; the .values
    # child (NOT list_flatten, which drops null parents and misaligns)
    # keeps one slot per input row
    cols = []
    for i in range(len(columns)):
        if not len(arr):
            cols.append(pa.array([], pa.string()))
            continue
        ls = pc.list_slice(parts, i, i + 1, return_fixed_size_list=True)
        if isinstance(ls, pa.ChunkedArray):
            ls = ls.combine_chunks()
        cols.append(ls.values)
    return pa.StructArray.from_arrays(cols, names=columns)


def parse_tsv_col(arr, columns: list[str]) -> pa.Array:
    """field-level parse_tsv (xsv family, formats/xsv.cpp)."""
    return parse_csv_col(arr, columns, delimiter="\t")


def parse_ssv_col(arr, columns: list[str]) -> pa.Array:
    """field-level parse_ssv (space-separated, formats/xsv.cpp)."""
    return parse_csv_col(arr, columns, delimiter=" ")


def parse_xsv_col(arr, columns: list[str], delimiter: str) -> pa.Array:
    """field-level parse_xsv with an explicit separator."""
    return parse_csv_col(arr, columns, delimiter=delimiter)


def parse_yaml_col(arr) -> pa.Array:
    """YAML string column → struct column (field-level parse_yaml,
    formats/yaml.cpp). Per-value safe_load is inherent to YAML; rows
    that fail to parse or aren't mappings become null."""
    import yaml

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    out = []
    for s in arr.to_pylist():
        d = None
        if s is not None:
            try:
                v = yaml.safe_load(s)
                d = v if isinstance(v, dict) else None
            except yaml.YAMLError:
                d = None
        out.append(d)
    return pa.array(out)


def print_yaml_col(arr) -> pa.Array:
    """struct column → single-document YAML strings (print_yaml dual)."""
    import yaml

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return pa.array(
        [None if v is None
         else yaml.safe_dump(v, sort_keys=False, default_flow_style=False)
         for v in arr.to_pylist()],
        pa.string())


def _struct_to_table(arr) -> pa.Table:
    import pyarrow.compute as pc

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return pa.table({f.name: pc.struct_field(arr, f.name)
                     for f in arr.type})


def print_kv_col(arr) -> pa.Array:
    """struct column → k=v lines (field-level print_kv dual; delegates
    to the round-trip-tested batch printer)."""
    from tenzir_ray.sources.printers import print_kv_batch

    return print_kv_batch(_struct_to_table(arr)).column("line") \
        .combine_chunks()


def print_csv_col(arr, delimiter: str = ",") -> pa.Array:
    """struct column → CSV record strings (field-level print_csv)."""
    from tenzir_ray.sources.printers import print_csv_batch

    return print_csv_batch(_struct_to_table(arr), delimiter=delimiter) \
        .column("line").combine_chunks()


def print_ndjson_col(arr) -> pa.Array:
    """struct column → compact JSON strings (print_ndjson alias of
    print_json)."""
    return print_json_col(arr)


def print_tsv_col(arr) -> pa.Array:
    """struct column → TSV record strings (print_tsv)."""
    return print_csv_col(arr, delimiter="\t")


def print_ssv_col(arr) -> pa.Array:
    """struct column → space-separated record strings (print_ssv)."""
    return print_csv_col(arr, delimiter=" ")


def print_xsv_col(arr, delimiter: str) -> pa.Array:
    """struct column → x-separated record strings (print_xsv)."""
    return print_csv_col(arr, delimiter=delimiter)


def parse_cef_col(arr) -> pa.Array:
    """CEF string column → struct (field-level parse_cef)."""
    from tenzir_ray.sources.formats import parse_cef_batch

    t = parse_cef_batch(_one_col(arr), col="__x").drop_columns(["__x"])
    return pa.StructArray.from_arrays(
        [t.column(n).combine_chunks() for n in t.column_names],
        names=t.column_names)


def parse_leef_col(arr) -> pa.Array:
    """LEEF string column → struct (field-level parse_leef)."""
    from tenzir_ray.sources.formats import parse_leef_batch

    t = parse_leef_batch(_one_col(arr), col="__x").drop_columns(["__x"])
    return pa.StructArray.from_arrays(
        [t.column(n).combine_chunks() for n in t.column_names],
        names=t.column_names)
