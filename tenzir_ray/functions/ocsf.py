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

# category_uid → category name (OCSF 1.x public schema)
OCSF_CATEGORIES: dict[int, str] = {
    1: "System Activity",
    2: "Findings",
    3: "Identity & Access Management",
    4: "Network Activity",
    5: "Discovery",
    6: "Application Activity",
}

# per-class activity_id → activity name (OCSF 1.x public schema; 0 =
# Unknown and 99 = Other exist for every class and are defaulted)
OCSF_ACTIVITIES: dict[str, dict[int, str]] = {
    "file_system_activity": {
        1: "Create", 2: "Read", 3: "Update", 4: "Delete", 5: "Rename",
        6: "Set Attributes", 7: "Get Attributes", 8: "Set Security",
        9: "Get Security", 10: "Encrypt", 11: "Decrypt", 12: "Mount",
        13: "Unmount", 14: "Open",
    },
    "process_activity": {1: "Launch", 2: "Terminate", 3: "Open",
                         4: "Inject", 5: "Set User ID"},
    "security_finding": {1: "Generate", 2: "Update", 3: "Close"},
    "authentication": {1: "Logon", 2: "Logoff",
                       3: "Authentication Ticket", 4: "Service Ticket"},
    "network_activity": {1: "Open", 2: "Close", 3: "Reset", 4: "Fail",
                         5: "Refuse", 6: "Traffic"},
    "http_activity": {1: "Connect", 2: "Delete", 3: "Get", 4: "Head",
                      5: "Options", 6: "Post", 7: "Put", 8: "Trace"},
    "dns_activity": {1: "Query", 2: "Response", 6: "Traffic"},
    "smb_activity": {1: "File Supersede", 2: "File Open",
                     3: "File Create", 4: "File Open If",
                     5: "File Overwrite", 6: "File Overwrite If"},
    "ssh_activity": {1: "Open", 2: "Close", 3: "Reset", 4: "Fail",
                     5: "Refuse"},
    "email_activity": {1: "Send", 2: "Receive", 3: "Scan"},
}

# Built-in source → OCSF mapping packages (the reference ships these as
# per-source mapping packages on top of ocsf.cpp): source column →
# dotted OCSF attribute path, plus the target class. Field names follow
# the public Zeek conn.log / Suricata EVE schemas.
OCSF_MAPPINGS: dict[str, tuple[str, dict[str, str]]] = {
    "zeek.conn": ("network_activity", {
        "id.orig_h": "src_endpoint.ip", "id.orig_p": "src_endpoint.port",
        "id.resp_h": "dst_endpoint.ip", "id.resp_p": "dst_endpoint.port",
        "proto": "connection_info.protocol_name",
        "orig_bytes": "traffic.bytes_out",
        "resp_bytes": "traffic.bytes_in",
        "orig_pkts": "traffic.packets_out",
        "resp_pkts": "traffic.packets_in",
        "duration": "duration", "uid": "metadata.uid",
    }),
    "zeek.dns": ("dns_activity", {
        "id.orig_h": "src_endpoint.ip", "id.resp_h": "dst_endpoint.ip",
        "query": "query.hostname", "qtype_name": "query.type",
        "rcode_name": "rcode", "answers": "answers",
        "uid": "metadata.uid",
    }),
    "zeek.http": ("http_activity", {
        "id.orig_h": "src_endpoint.ip", "id.resp_h": "dst_endpoint.ip",
        "method": "http_request.http_method",
        "host": "http_request.url.hostname",
        "uri": "http_request.url.path",
        "status_code": "http_response.code",
        "user_agent": "http_request.user_agent",
        "uid": "metadata.uid",
    }),
    "suricata.flow": ("network_activity", {
        "src_ip": "src_endpoint.ip", "src_port": "src_endpoint.port",
        "dest_ip": "dst_endpoint.ip", "dest_port": "dst_endpoint.port",
        "proto": "connection_info.protocol_name",
        "flow.bytes_toserver": "traffic.bytes_out",
        "flow.bytes_toclient": "traffic.bytes_in",
        "flow.pkts_toserver": "traffic.packets_out",
        "flow.pkts_toclient": "traffic.packets_in",
        "flow_id": "metadata.uid",
    }),
    "suricata.dns": ("dns_activity", {
        "src_ip": "src_endpoint.ip", "dest_ip": "dst_endpoint.ip",
        "dns.rrname": "query.hostname", "dns.rrtype": "query.type",
        "dns.rcode": "rcode", "flow_id": "metadata.uid",
    }),
    "suricata.alert": ("security_finding", {
        "src_ip": "src_endpoint.ip", "dest_ip": "dst_endpoint.ip",
        "alert.signature": "finding.title",
        "alert.signature_id": "finding.uid",
        "alert.category": "finding.types",
        "alert.severity": "severity_raw", "flow_id": "metadata.uid",
    }),
}


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


def activity_name(ocsf_class: str, activity_id: int) -> str:
    if activity_id == 0:
        return "Unknown"
    if activity_id == 99:
        return "Other"
    return OCSF_ACTIVITIES.get(ocsf_class, {}).get(activity_id, "Other")


def category_name(uid: int) -> str:
    return OCSF_CATEGORIES.get(uid, "Uncategorized")


def class_name_from_uid(uid: int) -> str | None:
    for name, (cuid, _cat) in OCSF_CLASSES.items():
        if cuid == uid:
            return name
    return None


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
    out["class_name"] = pa.array([ocsf_class] * n, pa.string())
    out["category_name"] = pa.array([category_name(cat)] * n, pa.string())
    out["activity_name"] = pa.array(
        [activity_name(ocsf_class, activity_id)] * n, pa.string())
    out["metadata.version"] = pa.array(["1.1.0"] * n, pa.string())
    return pa.table(out)


def map_to_ocsf(
    t: pa.Table,
    source: str,
    activity_id: int = 0,
    time_col: str | None = None,
    severity: "str | int" = "informational",
) -> pa.Table:
    """Apply a BUILT-IN mapping package (``OCSF_MAPPINGS`` key, e.g.
    ``"zeek.conn"`` or ``"suricata.dns"``): the per-source rendering of
    the reference's ocsf mapping packages. Source columns absent from
    the table are simply unused; extra columns land in ``unmapped.*``."""
    if source not in OCSF_MAPPINGS:
        raise KeyError(
            f"no built-in OCSF mapping for {source!r}; "
            f"known: {sorted(OCSF_MAPPINGS)}")
    ocsf_class, mapping = OCSF_MAPPINGS[source]
    return to_ocsf(t, ocsf_class, mapping, activity_id=activity_id,
                   time_col=time_col, severity=severity)
