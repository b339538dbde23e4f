"""Mini-YARA matcher (reference: operators/yara.cpp — the reference
links libyara; this environment has none, so a from-scratch matcher for
the core rule surface: ``strings`` with text / regex / hex patterns and
``nocase``/``ascii`` modifiers, ``condition`` with and/or/not,
``any of them`` / ``all of them`` / ``N of them`` and ``$id``
references. Enough to run typical IOC-scan rules over binary or text
payload columns; rules are compiled once per actor).

Rule source format (the YARA subset)::

    rule ExampleRule {
        strings:
            $a = "malicious"
            $b = /ev[i1]l/ nocase
            $h = { DE AD BE EF }
        condition:
            $a or ($b and $h)
    }
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

_RULE = re.compile(
    r"rule\s+(?P<name>\w+)\s*\{(?P<body>.*?)\n\}", re.DOTALL)
_STR = re.compile(
    r"\$(?P<id>\w+)\s*=\s*"
    r"(?P<val>\"(?:[^\"\\]|\\.)*\"|/(?:[^/\\]|\\.)+/|\{[^}]*\})"
    r"(?P<mods>(?:[ \t]+\w+)*)")
_N_OF = re.compile(r"\b(\d+|any|all)\s+of\s+them\b")


class CompiledRule:
    def __init__(self, name: str, patterns: dict[str, "re.Pattern[bytes]"],
                 condition: str):
        self.name = name
        self.patterns = patterns
        self.condition = condition

    def match(self, data: bytes) -> bool:
        hits = {sid: bool(p.search(data)) for sid, p in self.patterns.items()}
        return _eval_condition(self.condition, hits)


def _compile_pattern(val: str, mods: list[str]) -> "re.Pattern[bytes]":
    flags = re.IGNORECASE if "nocase" in mods else 0
    if val.startswith('"'):
        body = val[1:-1].encode().decode("unicode_escape").encode("latin-1")
        return re.compile(re.escape(body), flags)
    if val.startswith("/"):
        return re.compile(val[1:-1].encode(), flags)
    # hex string { DE AD ?? EF } — ?? wildcards one byte
    toks = val[1:-1].split()
    rx = b"".join(b"." if t == "??" else re.escape(bytes([int(t, 16)]))
                  for t in toks)
    return re.compile(rx, re.DOTALL)


def _eval_condition(cond: str, hits: dict[str, bool]) -> bool:
    c = cond.strip()
    n_true = sum(hits.values())

    def n_of(m: "re.Match[str]") -> str:
        q = m.group(1)
        if q == "any":
            return str(n_true >= 1)
        if q == "all":
            return str(n_true == len(hits))
        return str(n_true >= int(q))

    c = _N_OF.sub(n_of, c)
    for sid, v in hits.items():
        c = re.sub(r"\$" + re.escape(sid) + r"\b", str(v), c)
    c = re.sub(r"\band\b", " and ", c)
    c = re.sub(r"\bor\b", " or ", c)
    c = re.sub(r"\bnot\b", " not ", c)
    if not re.fullmatch(r"[\sTrueFalseandornot()]+", c):
        raise ValueError(f"unsupported yara condition: {cond!r}")
    return bool(eval(c, {"__builtins__": {}}, {}))  # noqa: S307 — sanitized


def compile_rules(source: str) -> list[CompiledRule]:
    rules = []
    for m in _RULE.finditer(source):
        body = m.group("body")
        cond_m = re.search(r"condition:\s*(?P<c>.+?)\s*$", body,
                           re.DOTALL)
        if not cond_m:
            raise ValueError(f"rule {m.group('name')} has no condition")
        patterns = {}
        for sm in _STR.finditer(body.split("condition:")[0]):
            mods = sm.group("mods").split()
            patterns[sm.group("id")] = _compile_pattern(sm.group("val"), mods)
        rules.append(CompiledRule(m.group("name"), patterns,
                                  cond_m.group("c").strip()))
    if not rules:
        raise ValueError("no yara rules found in source")
    return rules


def yara_match(ds, rules_source: str, col: str = "data"):
    """Scan a binary/string column with YARA rules; rows matching no rule
    are dropped, matches land in ``yara_rules`` (operators/yara.cpp
    emits per-match events; one row per input row here). Rules compile
    once per actor."""
    import ray

    src_ref = ray.put(rules_source)

    class Matcher:
        def __init__(self):
            self.rules = compile_rules(ray.get(src_ref))

        def __call__(self, t: pa.Table) -> pa.Table:
            col_arr = t.column(col).combine_chunks()
            vals = col_arr.to_pylist()
            names: list[list[str] | None] = []
            mask = np.zeros(len(vals), dtype=bool)
            for i, v in enumerate(vals):
                if v is None:
                    names.append(None)
                    continue
                data = v.encode() if isinstance(v, str) else v
                hit = [r.name for r in self.rules if r.match(data)]
                names.append(hit)
                mask[i] = bool(hit)
            out = t.append_column(
                "yara_rules", pa.array(names, pa.list_(pa.string()))
            ).filter(pa.array(mask))
            return out.replace_schema_metadata(None) \
                if out.schema.metadata else out

    return ds.map_batches(Matcher, batch_format="pyarrow",
                          concurrency=(1, 4))
