"""OCSF normalization (reference: the `ocsf` TQL module —
libtenzir/builtins/functions/ocsf.cpp category/class/type_uid helpers
plus the ocsf mapping packages). Public OCSF 1.x schema constants.

``to_ocsf`` renames mapped source columns to their OCSF attribute
paths (dotted — pair with ``stages.unflatten`` for nested structs),
stamps the class/category/type uids and severity, and parks everything
unmapped under ``unmapped.<col>`` — the same shape Tenzir's mapping
packages emit.
"""

from __future__ import annotations

import pyarrow as pa

# class name → (class_uid, category_uid) — OCSF 1.x (public schema).
OCSF_CLASSES: dict[str, tuple[int, int]] = {
    "file_system_activity": (1001, 1),
    "process_activity": (1007, 1),
    "security_finding": (2001, 2),
    "authentication": (3002, 3),
    "network_activity": (4001, 4),
    "http_activity": (4002, 4),
    "dns_activity": (4003, 4),
    "smb_activity": (4006, 4),
    "ssh_activity": (4007, 4),
    "email_activity": (4009, 4),
}

_SEVERITY = {"informational": 1, "low": 2, "medium": 3, "high": 4,
             "critical": 5, "fatal": 6}


def class_uid(name: str) -> int:
    return OCSF_CLASSES[name][0]


def category_uid(name: str) -> int:
    return OCSF_CLASSES[name][1]


def type_uid(name: str, activity_id: int) -> int:
    """type_uid = class_uid * 100 + activity_id (OCSF spec)."""
    return OCSF_CLASSES[name][0] * 100 + activity_id


def severity_id(name_or_id) -> int:
    if isinstance(name_or_id, int):
        return name_or_id
    return _SEVERITY.get(str(name_or_id).lower(), 0)


def to_ocsf(
    t: pa.Table,
    ocsf_class: str,
    mapping: dict[str, str],
    activity_id: int = 0,
    time_col: str | None = None,
    severity: "str | int" = "informational",
) -> pa.Table:
    """Map an event table to an OCSF class: ``mapping`` is
    source-column → OCSF attribute path (dotted); unmapped columns land
    under ``unmapped.<col>``; class_uid / category_uid / type_uid /
    activity_id / severity_id are stamped per the public schema."""
    cuid, cat = OCSF_CLASSES[ocsf_class]
    n = t.num_rows
    out: dict[str, object] = {}
    for col in t.column_names:
        if col == time_col:
            out["time"] = t.column(col)
        elif col in mapping:
            out[mapping[col]] = t.column(col)
        else:
            out[f"unmapped.{col}"] = t.column(col)
    out["class_uid"] = pa.array([cuid] * n, pa.int32())
    out["category_uid"] = pa.array([cat] * n, pa.int32())
    out["activity_id"] = pa.array([activity_id] * n, pa.int32())
    out["type_uid"] = pa.array([cuid * 100 + activity_id] * n, pa.int64())
    out["severity_id"] = pa.array([severity_id(severity)] * n, pa.int32())
    out["metadata.version"] = pa.array(["1.1.0"] * n, pa.string())
    return pa.table(out)
