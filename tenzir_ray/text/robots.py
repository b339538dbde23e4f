"""robots.txt (RFC 9309) parsing and crawl-permission filtering — the
politeness gate of a crawl pipeline: given each host's robots.txt
capture (Common Crawl ships these as a separate WARC subset), keep only
the pages a compliant crawler for a given user-agent was allowed to
fetch.

Semantics implemented (RFC 9309 §2):

* groups: one or more ``User-agent:`` lines followed by
  ``Allow:``/``Disallow:`` rules; the group matched is the LONGEST
  user-agent token that is a case-insensitive substring-prefix match of
  the product token, falling back to ``*``; multiple groups for the
  same agent merge.
* rule match: path-prefix with ``*`` (any chars) and ``$`` (end
  anchor); percent-encoding is compared literally (both sides as-is).
* precedence: the LONGEST matching rule wins; on equal length, Allow
  wins. An empty ``Disallow:`` means allow-all. No matching group →
  allowed.

Scale shape: the robots table is HOST-sized (the small side — one
body per host), broadcast once via ``ray.put`` as compiled rule lists;
pages stream through a task-pool ``map_batches`` that resolves each
row's host group via a per-batch ``np.unique`` (web batches repeat
hosts heavily) and matches paths against the host's compiled
alternation. No shuffle.

No reference analog; public spec: RFC 9309, the Google robots.txt
parser documentation. Oracle-checked ``robots_filter_docs`` vs
:func:`tenzir_ray.text.sequential.robots_seq`.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset


def _rule_regex(path_pattern: str) -> re.Pattern:
    """RFC 9309 rule → anchored regex: ``*`` = ``.*``, trailing ``$``
    = end anchor, everything else literal; match is from path start."""
    anchored = path_pattern.endswith("$")
    if anchored:
        path_pattern = path_pattern[:-1]
    parts = [re.escape(p) for p in path_pattern.split("*")]
    rx = "^" + ".*".join(parts)
    if anchored:
        rx += "$"
    return re.compile(rx)


def parse_robots(content: str | bytes | None
                 ) -> dict[str, list[tuple[int, bool, re.Pattern]]]:
    """robots.txt body → {user-agent-token(lower): [(rule_len, allow,
    compiled)]} with same-agent groups merged. ``rule_len`` is the raw
    pattern length (the RFC's specificity measure)."""
    if content is None:
        return {}
    if isinstance(content, bytes):
        content = content.decode("utf-8", "replace")
    groups: dict[str, list[tuple[int, bool, re.Pattern]]] = {}
    agents: list[str] = []
    saw_rule = True  # a UA line after rules starts a NEW agent set
    for raw in content.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if saw_rule:
                agents = []
                saw_rule = False
            agents.append(value.lower())
            for a in agents:
                groups.setdefault(a, [])
        elif field in ("allow", "disallow"):
            saw_rule = True
            if not agents:
                continue
            if not value:
                continue  # empty rule is a no-op (empty Disallow =
                # allow-all; empty Allow allows nothing new)
            rule = (len(value), field == "allow", _rule_regex(value))
            for a in agents:
                groups.setdefault(a, []).append(rule)
        else:
            saw_rule = True  # sitemap/crawl-delay etc. end the UA set
    return groups


def _group_for(groups: dict, agent: str) -> list | None:
    """RFC group selection: longest UA token that prefix-matches the
    agent (case-insensitive), else ``*``, else None."""
    agent = agent.lower()
    best, best_len = None, -1
    for token, rules in groups.items():
        if token != "*" and agent.startswith(token) and \
                len(token) > best_len:
            best, best_len = rules, len(token)
    if best is not None:
        return best
    return groups.get("*")


def allowed(groups: dict, path: str, agent: str = "*") -> bool:
    """Is ``path`` fetchable for ``agent`` under parsed ``groups``?
    Longest-match wins; ties go to Allow; no group/rule → allowed."""
    rules = _group_for(groups, agent)
    if not rules:
        return True
    best_len, best_allow = -1, True
    for rlen, allow, rx in rules:
        if rx.match(path):
            if rlen > best_len or (rlen == best_len and allow):
                best_len, best_allow = rlen, allow
    return best_allow


def _path_of(url: str) -> str:
    """Path+query of a url (the robots matching target); bare host →
    '/'."""
    rest = url.split("//", 1)[-1]
    i = rest.find("/")
    if i < 0:
        return "/"
    return rest[i:].split("#", 1)[0] or "/"


#: per-worker-process parse cache keyed by broadcast-ref hex — a plain
#: closure dict would be re-serialized EMPTY into every task, re-parsing
#: the whole host→rules table once per block instead of once per worker
_PARSED_CACHE: dict[str, dict] = {}


def _paths_of(col: pa.Array) -> np.ndarray:
    """Vectorized dual of :func:`_path_of` over a url column — pinned
    byte-equal by test_robots (including scheme-less urls with ``//`` in
    the path, where a naive scheme-prefix regex diverges from
    ``split("//", 1)``)."""
    rest = pc.replace_substring_regex(
        col, r"(?s)^.*?//", "", max_replacements=1)
    path = pc.replace_substring_regex(
        rest, r"^[^/]*", "", max_replacements=1)
    path = pc.replace_substring_regex(
        path, r"(?s)#.*$", "", max_replacements=1)
    path = pc.if_else(pc.equal(path, ""), pa.scalar("/"), path)
    return path.to_numpy(zero_copy_only=False)


def robots_filter(
    ds: Dataset, robots: dict[str, str | bytes] | "object",
    url_col: str = "url", *, agent: str = "*", invert: bool = False,
) -> Dataset:
    """Keep rows whose url a compliant ``agent`` may fetch under its
    host's robots.txt. ``robots`` maps host (lower) → robots.txt body
    (or a ``ray.ObjectRef`` to such a dict — broadcast once, parsed
    once per worker process and cached). Hosts without an entry are
    allowed. ``invert=True`` keeps the FORBIDDEN rows (audit mode).

    Matching is vectorized per unique host: each of the host's (few)
    rules runs once over that host's path sub-array as an anchored RE2
    kernel, with longest-match/Allow-tie precedence folded in numpy —
    no per-row Python on the hot path (a rule whose escape sequence RE2
    rejects falls back to the per-path Python matcher for that host)."""
    import ray

    from tenzir_ray.functions.url import normalized_host

    ref = robots if isinstance(robots, ray.ObjectRef) else ray.put(robots)
    key = ref.hex()

    def kernel(t: pa.Table) -> pa.Table:
        parsed = _PARSED_CACHE.get(key)
        if parsed is None:
            raw = ray.get(ref)
            parsed = {h.lower(): parse_robots(b) for h, b in raw.items()}
            _PARSED_CACHE.clear()
            _PARSED_CACHE[key] = parsed
        col = t.column(url_col)
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
            else col
        col = pc.fill_null(col, "")
        hosts = normalized_host(col).to_numpy(zero_copy_only=False)
        paths = _paths_of(col)
        ok = np.ones(t.num_rows, bool)
        uniq, inv = np.unique(hosts, return_inverse=True)
        for ui, h in enumerate(uniq):
            groups = parsed.get(h)
            if not groups:
                continue
            rules = _group_for(groups, agent)
            if not rules:
                continue
            rows = np.flatnonzero(inv == ui)
            sub = pa.array(paths[rows], pa.string())
            k = len(rows)
            best_len = np.full(k, -1, np.int64)
            best_allow = np.ones(k, bool)
            try:
                # rule order mirrors allowed(): update on strictly-longer
                # match, or equal-length Allow (the RFC tie rule)
                for rlen, allow, rx in rules:
                    hit = pc.match_substring_regex(sub, rx.pattern) \
                        .to_numpy(zero_copy_only=False)
                    upd = hit & ((rlen > best_len)
                                 | ((rlen == best_len) & allow))
                    best_allow = np.where(upd, allow, best_allow)
                    best_len = np.where(upd, rlen, best_len)
            except pa.ArrowInvalid:
                best_allow = np.array(
                    [allowed(groups, p, agent) for p in paths[rows]],
                    bool)
            ok[rows] = best_allow
        keep = ~ok if invert else ok
        out = t.filter(pa.array(keep))
        return out.replace_schema_metadata(None) \
            if out.schema.metadata else out

    return ds.map_batches(kernel, batch_format="pyarrow")
