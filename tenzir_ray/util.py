"""Small shared helpers."""

from __future__ import annotations

import pyarrow as pa


def nometa(t: pa.Table) -> pa.Table:
    """Strip schema-level metadata (zero-copy).

    Parquet files written by pandas/pyarrow carry a ``pandas`` metadata
    blob in the schema; pyarrow schemas with metadata are unhashable
    (``hash(schema)`` raises on the dict), which defeats Ray Data's
    schema-dedup (``unify_schemas`` logs "Failed to hash the schemas"
    per bundle). Stripping metadata at our batch boundaries keeps every
    block's schema hashable and identical across the pipeline.
    """
    return t.replace_schema_metadata(None) if t.schema.metadata else t
