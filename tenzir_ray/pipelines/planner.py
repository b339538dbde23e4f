"""A small TQL-flavored pipeline language over ray.data.Dataset.

Re-expresses the reference's pipeline front-end (parse → compile →
optimize → execute, libtenzir/src/tql2/exec.cpp:304-423) at the scale a
Python/Ray engine needs: one operator per line, piped top-to-bottom,
compiled to the stage functions in :mod:`tenzir_ray.stages`.

Supported operators (reference file cited in OPS below)::

    where <expr>                 select c1, c2        drop c1, c2
    rename new=old, ...          set name = <expr>    extend name = <expr>
    sort [-]col[, [-]col]        head [n]             tail [n]
    taste [n]                    unroll field         flatten
    deduplicate key[, key]       top field            rare field
    summarize out=agg(col)[, ...] by k1[, k2]         limit n
    distinct c1[, c2]            reverse              enumerate [name]
    slice a:b                    sample f|p%          batch n
    repeat n                     measure              shell "cmd"

Expressions are Python syntax evaluated over pyarrow.dataset field
expressions (``l_quantity > 45 and l_discount < 0.1`` →
``(field("l_quantity") > 45) & (field("l_discount") < 0.1)``) — the
vectorized analog of TQL2 expression eval (src/tql2/eval.cpp). ``and``/
``or``/``not`` are rewritten to ``&``/``|``/``~``.

The compiled plan pushes ``where`` directly into a pyarrow Expression
filter per batch (zero-copy mask) — the analog of the reference's
predicate pushdown (``optimize``, pipeline.hpp:302-373).
"""

from __future__ import annotations

import ast
import re

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
from ray.data import Dataset

import tenzir_ray.stages as ops

class _BoolRewrite(ast.NodeTransformer):
    """``a and b`` → ``(a) & (b)`` etc. — pyarrow Expressions overload the
    bitwise operators, and AST-level rewriting keeps precedence right."""

    def visit_BoolOp(self, node):
        self.generic_visit(node)
        op = ast.BitAnd() if isinstance(node.op, ast.And) else ast.BitOr()
        out = node.values[0]
        for v in node.values[1:]:
            out = ast.BinOp(left=out, op=op, right=v)
        return out

    def visit_UnaryOp(self, node):
        self.generic_visit(node)
        if isinstance(node.op, ast.Not):
            return ast.UnaryOp(op=ast.Invert(), operand=node.operand)
        return node


def compile_expr(src: str):
    """Python-syntax expression → pyarrow.dataset.Expression. Column names
    are pre-resolved from the AST to field expressions (an eval-time
    ``__missing__`` hook would also intercept pyarrow's internal
    ``__import__`` lookups and crash); calls/attributes are rejected."""
    tree = ast.parse(src, mode="eval")
    tree = _BoolRewrite().visit(tree)
    env: dict = {}

    class _Consts(ast.NodeTransformer):
        # literals → pre-built scalar Expressions, so mixed-direction
        # arithmetic like ``1 - field`` resolves through Expression ops
        # (int.__sub__(Expression) is NotImplemented and Expression has
        # no __rsub__).
        def visit_Constant(self, node):
            key = f"__c{len(env)}"
            env[key] = pads.scalar(node.value)
            return ast.Name(id=key, ctx=ast.Load())

    tree = ast.fix_missing_locations(_Consts().visit(tree))
    for node in ast.walk(tree):  # guard: only safe node types
        if isinstance(node, (ast.Call, ast.Attribute)):
            raise ValueError(f"unsupported expression construct in {src!r}")
        if isinstance(node, ast.Name) and node.id not in env:
            env[node.id] = pads.field(node.id)
    # NB: pyarrow's scalar inference imports `decimal` through the active
    # builtins — an empty __builtins__ makes Expression construction abort
    # the process. Calls/attributes are already rejected above, so exposing
    # __import__ is not reachable from the expression itself.
    return eval(
        compile(tree, "<expr>", "eval"),
        {"__builtins__": {"__import__": __import__, "True": True,
                          "False": False, "None": None}},
        env,
    )


def expr_columns(src: str) -> list[str]:
    """Column names referenced by an expression (AST names that aren't
    literals) — used to widen the scan projection for pushed filters."""
    tree = ast.parse(src, mode="eval")
    return sorted({n.id for n in ast.walk(tree)
                   if isinstance(n, ast.Name)
                   and n.id not in ("True", "False", "None")})


def _apply_expr_filter(ds: Dataset, expr) -> Dataset:
    return ds.map_batches(
        lambda t: t.filter(expr), batch_format="pyarrow"
    )


def _apply_expr_project(ds: Dataset, name: str, expr) -> Dataset:
    def _f(t: pa.Table) -> pa.Table:
        cols = {n: pads.field(n) for n in t.column_names}
        cols[name] = expr
        return pads.dataset(t).to_table(columns=cols)

    return ds.map_batches(_f, batch_format="pyarrow")


_SUMMARIZE = re.compile(
    r"^(?P<aggs>.+?)(?:\s+by\s+(?P<by>[\w,\s]+))?$", re.DOTALL
)
_AGG = re.compile(r"(\w+)\s*=\s*(\w+)\((\s*[\w*]*\s*)\)")


class Pipeline:
    """A parsed pipeline; apply with ``run(ds)``, or start the text with
    ``from <path>`` and call ``run()`` — the planner then pushes leading
    ``where``/``select`` operators INTO the read (``read_parquet(filter=…,
    columns=…)``), the analog of the reference's ``optimize()`` pass
    (libtenzir/include/tenzir/pipeline.hpp:302-373): predicates prune row
    groups and the projection prunes columns before anything leaves
    storage."""

    def __init__(self, steps, source=None, source_filter=None,
                 source_columns=None):
        self.steps = steps
        self.source = source
        self.source_filter = source_filter
        self.source_columns = source_columns

    @classmethod
    def parse(cls, text: str) -> "Pipeline":
        raw = []
        for seg in cls.split_ops(text):
            op, _, rest = seg.partition(" ")
            raw.append((op, rest.strip()))
        source = filt = cols = None
        filt_cols: set[str] = set()
        i = 0
        if raw and raw[0][0] == "from":
            source = raw[0][1]
            i = 1
            # pushdown: fold every leading where into the scan filter,
            # and the first select into the scan projection. Filter-only
            # columns ride the scan (the filter binds against the scan
            # schema) and are dropped right after the read.
            while i < len(raw):
                op, rest = raw[i]
                if op == "where":
                    e = compile_expr(rest)
                    filt = e if filt is None else filt & e
                    filt_cols.update(expr_columns(rest))
                    i += 1
                elif op == "select" and cols is None:
                    cols = [c.strip() for c in rest.split(",") if c.strip()]
                    i += 1
                else:
                    break
        steps = [cls._compile_step(op, rest) for op, rest in raw[i:]]
        extra = sorted(filt_cols - set(cols)) if cols else []
        if extra:
            scan_cols = cols + extra
            steps.insert(0, lambda ds: ds.drop_columns(extra))
        else:
            scan_cols = cols
        return cls(steps, source=source, source_filter=filt,
                   source_columns=scan_cols)

    def source_plan(self):
        """(path, filter expression, projected columns) — what the scan
        will be asked to do; None fields mean no pushdown of that kind."""
        return self.source, self.source_filter, self.source_columns

    def open_source(self) -> Dataset:
        if self.source is None:
            raise ValueError("pipeline has no `from` source")
        import pyarrow.parquet as pq
        import ray.data as rd

        schema = pq.read_schema(self.source).remove_metadata()
        if self.source_columns:
            schema = pa.schema([schema.field(c) for c in self.source_columns])
        return rd.read_parquet(
            self.source,
            columns=self.source_columns,
            schema=schema,
            filter=self.source_filter,
        )

    @staticmethod
    def split_ops(text: str) -> list[str]:
        """Operator segments: newline- and ``|``-separated (TQL writes
        one-liners as ``op | op | op``); ``//`` comments stripped."""
        out = []
        for raw in text.strip().splitlines():
            line = raw.split("//")[0].strip()
            for seg in line.split("|"):
                seg = seg.strip()
                if seg:
                    out.append(seg)
        return out

    @staticmethod
    def _compile_step(op: str, rest: str):
        csv = lambda s: [c.strip() for c in s.split(",") if c.strip()]
        if op == "where":
            expr = compile_expr(rest)
            return lambda ds: _apply_expr_filter(ds, expr)
        if op == "select":
            cols = csv(rest)
            return lambda ds: ds.select_columns(cols)
        if op == "drop":
            cols = csv(rest)
            return lambda ds: ds.drop_columns(cols)
        if op == "rename":
            pairs = dict(p.split("=", 1) for p in csv(rest))
            mapping = {old.strip(): new.strip() for new, old in pairs.items()}
            return lambda ds: ds.rename_columns(mapping)
        if op in ("set", "extend"):
            name, _, expr_src = rest.partition("=")
            expr = compile_expr(expr_src.strip())
            name = name.strip()
            return lambda ds: _apply_expr_project(ds, name, expr)
        if op == "sort":
            keys = csv(rest)
            return lambda ds: ops.sort(ds, *keys)
        if op == "head":
            n = int(rest or 10)
            return lambda ds: ds.limit(n)
        if op == "limit":
            n = int(rest)
            return lambda ds: ds.limit(n)
        if op == "tail":
            n = int(rest or 10)
            return lambda ds: ops.tail(ds, n)
        if op == "taste":
            n = int(rest or 10)
            return lambda ds: ops.taste(ds, n)
        if op == "unroll":
            f = rest.strip()
            return lambda ds: ops.unroll(ds, f)
        if op == "flatten":
            return lambda ds: ops.flatten(ds)
        if op == "deduplicate":
            keys = csv(rest)
            return lambda ds: ops.deduplicate(ds, keys)
        if op == "top":
            f = rest.strip()
            return lambda ds: ops.top(ds, f)
        if op == "rare":
            f = rest.strip()
            return lambda ds: ops.rare(ds, f)
        if op == "summarize":
            m = _SUMMARIZE.match(rest)
            aggs: dict = {}
            for alias, fn, col in _AGG.findall(m.group("aggs")):
                col = col.strip()
                if fn == "count" and col in ("", "*"):
                    aggs[alias] = "count"
                else:
                    aggs[alias] = (fn, col)
            by = csv(m.group("by")) if m.group("by") else None
            return lambda ds: ops.summarize(ds, by, **aggs)
        if op == "distinct":
            cols2 = csv(rest)
            return lambda ds: ops.distinct(ds, *cols2)
        if op == "reverse":
            return lambda ds: ops.reverse(ds)
        if op == "enumerate":
            name = rest.strip() or "index"
            return lambda ds: ops.enumerate_(ds, name)
        if op == "slice":
            a, _, b = rest.partition(":")
            lo, hi = int(a), int(b)
            return lambda ds: ops.slice_(ds, lo, hi)
        if op == "sample":
            frac = float(rest.rstrip("%")) / (100.0 if rest.endswith("%") else 1.0)
            return lambda ds: ops.sample(ds, frac)
        if op == "batch":
            n = int(rest)
            return lambda ds: ops.batch(ds, n)
        if op == "repeat":
            n = int(rest)
            return lambda ds: ops.repeat(ds, n)
        if op == "measure":
            return lambda ds: ops.measure(ds)
        if op == "shell":
            cmd = rest.strip().strip('"')
            return lambda ds: ops.shell(ds, cmd)
        if op == "pass":
            return lambda ds: ds
        raise ValueError(f"unknown operator {op!r}")

    def run(self, ds: Dataset | None = None) -> Dataset:
        if ds is None:
            ds = self.open_source()
        for step in self.steps:
            ds = step(ds)
        return ds


def run_pipeline(text: str, ds: Dataset) -> Dataset:
    return Pipeline.parse(text).run(ds)
