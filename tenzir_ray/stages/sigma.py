"""Mini Sigma rule engine: compile detection rules → vectorized filters.

Reference: plugins/sigma (1353 LoC) streams Sigma YAML rules and compiles
them to expression filters over events. This is the batch-engine core of
that: a useful subset of the public Sigma spec —

- ``detection.<selection>``: mapping of ``field[|modifier]`` → value or
  list-of-values (list = OR); supported modifiers: ``contains``,
  ``startswith``, ``endswith``, ``re``.
- ``detection.condition``: boolean combination of selection names with
  ``and`` / ``or`` / ``not`` / ``1 of them`` / ``all of them``.

``compile_rule`` returns a ``pa.Table -> BooleanArray`` predicate usable
with :func:`tenzir_ray.stages.ops.where`; ``sigma_match`` tags each row
with the names of matching rules (the reference emits matches as events).
"""

from __future__ import annotations

import re
from typing import Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

Predicate = Callable[[pa.Table], pa.ChunkedArray]


_NUM_MODS = {"lt": pc.less, "lte": pc.less_equal,
             "gt": pc.greater, "gte": pc.greater_equal}


def _field_match(t: pa.Table, field_spec: str, value) -> pa.ChunkedArray:
    field, _, mod = field_spec.partition("|")
    if field not in t.column_names:
        return pa.chunked_array([pa.array([False] * t.num_rows)])
    col = t.column(field)
    if mod in _NUM_MODS:
        # numeric comparison modifiers (sigma spec lt/lte/gt/gte) —
        # compare on the native column type, not the string cast
        vals = value if isinstance(value, list) else [value]
        masks = [pc.fill_null(_NUM_MODS[mod](col, v), False) for v in vals]
        out = masks[0]
        for m in masks[1:]:
            out = pc.or_kleene(out, m)
        return pc.fill_null(out, False)
    if not pa.types.is_string(col.type):
        col = col.cast(pa.string())
    vals = value if isinstance(value, list) else [value]
    masks = []
    for v in vals:
        v = str(v)
        # Sigma value matching is CASE-INSENSITIVE by default (spec
        # §value matching); only the `re` modifier is case-sensitive
        if mod == "contains":
            masks.append(pc.match_substring(col, pattern=v,
                                            ignore_case=True))
        elif mod == "startswith":
            masks.append(pc.starts_with(col, pattern=v, ignore_case=True))
        elif mod == "endswith":
            masks.append(pc.ends_with(col, pattern=v, ignore_case=True))
        elif mod == "re":
            masks.append(pc.match_substring_regex(col, pattern=v))
        elif mod == "":
            # Sigma wildcards * and ? in plain equality values
            if "*" in v or "?" in v:
                rx = "^" + re.escape(v).replace("\\*", ".*").replace("\\?", ".") + "$"
                masks.append(pc.match_substring_regex(
                    col, pattern=rx, ignore_case=True))
            else:
                masks.append(pc.equal(pc.utf8_lower(col), v.lower()))
        else:
            raise ValueError(f"unsupported sigma modifier {mod!r}")
    out = masks[0]
    for m in masks[1:]:
        out = pc.or_kleene(out, m)
    return pc.fill_null(out, False)


def _selection_pred(sel: dict) -> Predicate:
    def pred(t: pa.Table):
        out = None
        for field_spec, value in sel.items():
            m = _field_match(t, field_spec, value)
            out = m if out is None else pc.and_kleene(out, m)
        if out is None:
            return pa.chunked_array([pa.array([True] * t.num_rows)])
        return out

    return pred


_TOKEN = re.compile(r"\(|\)|\band\b|\bor\b|\bnot\b|[\w*]+")


def compile_rule(rule: dict) -> Predicate:
    """Sigma rule dict (parsed YAML) → row predicate."""
    detection = rule["detection"]
    condition = detection.get("condition", "selection")
    sels = {
        k: _selection_pred(v)
        for k, v in detection.items()
        if k != "condition"
    }

    tokens = _TOKEN.findall(condition)
    # rewrite "1 of them" / "all of them"
    expr_parts: list[str] = []
    i = 0
    while i < len(tokens):
        if tokens[i] in ("1", "all") and i + 2 < len(tokens) and tokens[i + 1] == "of":
            names = list(sels) if tokens[i + 2] in ("them", "*") else [
                n for n in sels if re.fullmatch(
                    tokens[i + 2].replace("*", ".*"), n)
            ]
            joiner = " or " if tokens[i] == "1" else " and "
            # zero matching selections must compile to a vacuous-false
            # group, not the syntax error "()"
            expr_parts.append(
                "(" + (joiner.join(names) or "__sigma_none__") + ")")
            i += 3
            continue
        expr_parts.append(tokens[i])
        i += 1

    def _tr(tok: str) -> str:
        if tok in ("(", ")"):
            return tok
        if tok in ("and", "or", "not"):
            return {"and": "&", "or": "|", "not": "~"}[tok]
        return f"__m[{tok!r}]"

    py_expr = " ".join(_tr(tok) for tok in _TOKEN.findall(" ".join(expr_parts))) \
        if expr_parts else "".join(())
    # note: expr_parts may already contain parenthesized joins; re-tokenize
    # so names inside them are translated uniformly
    if not py_expr:
        py_expr = "__m['selection']"

    def _np_mask(m) -> np.ndarray:
        m = pc.fill_null(m, False)
        if isinstance(m, pa.ChunkedArray):
            m = m.combine_chunks()
        return m.to_numpy(zero_copy_only=False).astype(bool)

    def pred(t: pa.Table):
        masks = {name: _np_mask(p(t)) for name, p in sels.items()}
        masks["__sigma_none__"] = np.zeros(t.num_rows, dtype=bool)
        return pa.array(eval(py_expr, {"__builtins__": {}}, {"__m": masks}))

    return pred


def _match_table(t: pa.Table, preds: dict[str, Predicate]) -> pa.Table:
    """Shared match body: filter to rows hitting ≥1 rule, tag with the
    matching rule names in ``sigma_rules``."""
    hits = {name: np.asarray(p(t)) for name, p in preds.items()}
    any_hit = np.zeros(t.num_rows, dtype=bool)
    for m in hits.values():
        any_hit |= m
    names = [
        [n for n, m in hits.items() if m[i]] for i in np.flatnonzero(any_hit)
    ]
    out = t.filter(pa.array(any_hit))
    return out.append_column(
        "sigma_rules", pa.array(names, pa.list_(pa.string()))
    )


def sigma_match(ds, rules: dict[str, dict]):
    """Tag each row with the list of matching rule names; rows matching no
    rule are dropped (the reference emits sigma matches as a new event
    stream). Rules are compiled once per actor (__init__)."""
    import ray

    rules_ref = ray.put(rules)

    class Matcher:
        def __init__(self):
            self.preds = {
                name: compile_rule(r) for name, r in ray.get(rules_ref).items()
            }

        def __call__(self, t: pa.Table) -> pa.Table:
            return _match_table(t, self.preds)

    from ..util import autoscale_pool

    return ds.map_batches(Matcher, batch_format="pyarrow",
                          concurrency=autoscale_pool())


def load_rules_dir(rules_dir: str) -> dict[str, dict]:
    """Parse every ``*.yml``/``*.yaml`` under ``rules_dir`` (sorted, so
    rule naming is deterministic) into a name → rule-dict mapping."""
    import glob
    import os

    import yaml

    rules: dict[str, dict] = {}
    paths = sorted(
        glob.glob(os.path.join(rules_dir, "**", "*.yml"), recursive=True)
        + glob.glob(os.path.join(rules_dir, "**", "*.yaml"), recursive=True))
    for p in paths:
        stem = os.path.splitext(os.path.basename(p))[0]
        with open(p) as fh:
            docs = [d for d in yaml.safe_load_all(fh) if d]
        for i, d in enumerate(docs):
            name = d.get("title", f"{stem}:{i}")
            if name in rules:
                # two files sharing a title must BOTH compile — a silent
                # dict collision drops detection coverage invisibly
                name = f"{name} ({stem}:{i})"
            rules[name] = d
    return rules


class SigmaDirMatcher:
    """Rule-DIRECTORY matcher with hot-reload (plugins/sigma's rule-dir
    watch): every batch, a cheap mtime scan of the directory detects
    added/changed/removed rule files and recompiles only then — a live
    tail (``Lake.follow`` → ``sigma``) picks up rule edits without
    re-creating the stage. Per-actor state; each actor converges on the
    same rule set on its next batch."""

    def __init__(self, rules_dir: str):
        self.rules_dir = rules_dir
        self._snap: tuple | None = None
        self.preds: dict[str, Predicate] = {}
        self._maybe_reload()

    def _scan(self) -> tuple:
        import glob
        import os

        ents = []
        for pat in ("*.yml", "*.yaml"):
            for p in glob.glob(os.path.join(self.rules_dir, "**", pat),
                               recursive=True):
                try:
                    ents.append((p, os.stat(p).st_mtime_ns))
                except OSError:
                    continue  # racing delete
        return tuple(sorted(ents))

    def _maybe_reload(self) -> None:
        snap = self._scan()
        if snap != self._snap:
            self._snap = snap
            self.preds = {
                name: compile_rule(r)
                for name, r in load_rules_dir(self.rules_dir).items()
            }

    def __call__(self, t: pa.Table) -> pa.Table:
        self._maybe_reload()
        return _match_table(t, self.preds)


def sigma_match_dir(ds, rules_dir: str):
    """Like :func:`sigma_match`, but rules live in a directory and hot
    reload on mtime change (reference rule-dir watch)."""
    from ..util import autoscale_pool

    return ds.map_batches(
        SigmaDirMatcher,
        fn_constructor_kwargs={"rules_dir": rules_dir},
        batch_format="pyarrow", concurrency=autoscale_pool())
