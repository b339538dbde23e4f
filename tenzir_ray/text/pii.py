"""PII redaction for training-data curation: scrub emails, IPv4
addresses and phone numbers from a text column with typed replacement
tokens, fully vectorized (`pyarrow.compute.replace_substring_regex`,
RE2 — the same engine DuckDB uses, so the patterns below are
oracle-portable verbatim).

Reference analog: Tenzir redacts via `replace_regex` / `pseudonymize`
(libtenzir/builtins/functions/string.cpp, operators/pseudonymize.cpp:45);
this module packages the common curation recipe (C4/CCNet-style PII
scrubbing) as one stateless batch stage.

Scale notes: stateless `map_batches`, zero-copy Arrow in/out, no
shuffle, no state — at 100 TB this runs embarrassingly parallel at
read parallelism. Patterns are applied in a FIXED order (email →
phone → ipv4) so overlapping matches resolve deterministically
(an email's host part may look like a dotted quad; scrubbing emails
first keeps `<EMAIL>` atomic).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

# (kind, RE2 pattern, replacement token) — order matters; see module doc.
# Patterns avoid lookaround (RE2 has none) so they run identically in
# Arrow and DuckDB.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+\d{1,3}[ \-]\d{1,4}[ \-]\d{3,9}", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]


def redact_pii_batch(
    t: pa.Table,
    text_col: str = "text",
    out_col: str | None = None,
    kinds: tuple[str, ...] = ("email", "phone", "ipv4"),
    count: bool = True,
) -> pa.Table:
    """Per-batch kernel: chained RE2 replace over the text column.
    With ``count=True`` also emits ``n_<kind>`` int64 match counts
    (taken BEFORE redaction, so counts reflect the original text)."""
    col = t.column(text_col)
    out = t
    redacted = col
    for kind, pattern, token in PII_PATTERNS:
        if kind not in kinds:
            continue
        if count:
            # count against the ORIGINAL column, not the progressively
            # redacted text — otherwise an IP inside an already-replaced
            # email host is never counted and counts become
            # pattern-order-dependent
            n = pc.count_substring_regex(col, pattern)
            out = out.append_column(f"n_{kind}", pc.cast(n, pa.int64()))
        redacted = pc.replace_substring_regex(redacted, pattern, token)
    name = out_col or text_col
    if name in out.column_names:
        out = out.set_column(out.column_names.index(name), name, redacted)
    else:
        out = out.append_column(name, redacted)
    return out.replace_schema_metadata(None) if out.schema.metadata else out


def redact_pii(
    ds: Dataset,
    text_col: str = "text",
    out_col: str | None = None,
    kinds: tuple[str, ...] = ("email", "phone", "ipv4"),
    count: bool = True,
) -> Dataset:
    """Dataset-level PII scrub: stateless vectorized batch stage."""
    return ds.map_batches(
        redact_pii_batch,
        fn_kwargs={"text_col": text_col, "out_col": out_col,
                   "kinds": kinds, "count": count},
        batch_format="pyarrow",
    )
