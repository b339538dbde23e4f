"""chart_* operators (reference operators/chart_line.cpp & friends:
they attach chart rendering metadata to the stream for the platform UI;
the events themselves pass through unchanged).

Here the chart spec rides Arrow schema metadata (``tenzir_ray.chart``)
on every batch — any downstream sink/UI can pick it up; data is
untouched."""

from __future__ import annotations

import json

import pyarrow as pa


def _chart(ds, kind: str, **spec):
    meta_val = json.dumps({"type": kind, **spec}).encode()

    def attach(t: pa.Table) -> pa.Table:
        md = dict(t.schema.metadata or {})
        md[b"tenzir_ray.chart"] = meta_val
        return t.replace_schema_metadata(md)

    return ds.map_batches(attach, batch_format="pyarrow")


def chart_line(ds, x: str, y: "str | list[str]", **opts):
    return _chart(ds, "line", x=x, y=y, **opts)


def chart_area(ds, x: str, y: "str | list[str]", **opts):
    return _chart(ds, "area", x=x, y=y, **opts)


def chart_bar(ds, x: str, y: "str | list[str]", **opts):
    return _chart(ds, "bar", x=x, y=y, **opts)


def chart_pie(ds, name: str, value: str, **opts):
    return _chart(ds, "pie", name=name, value=value, **opts)


def chart_spec(t: pa.Table) -> dict | None:
    """Read back the chart spec a chart_* operator attached (sink-side)."""
    md = t.schema.metadata or {}
    raw = md.get(b"tenzir_ray.chart")
    return json.loads(raw) if raw else None
