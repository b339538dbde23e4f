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
    window 6h [slide=30m] ts n=count() by k
    sigma rules.yml|rules-dir/   parse_kv col
    parse_syslog|cef|leef col    parse_grok col "pat"
    enrich key=c, table=f.parquet, field=v, out=name[, table_key=c2]
    join table=f.parquet, key=c, value="v1|v2" [, table_key= how=]
         // multi-col specs ("a|b") must be quoted: bare | splits ops
    export <lake_root> [, at=<epoch>] [, columns="c1|c2"]  // lake source
    import <lake_root>, wal=<dir>            // apply WAL epochs
    diff <lake_root> [, from=<e>] [, to=<e>] // CDC changefeed source
    replicate <dst_root>, from=<src_root>    // lake→replica sync
    publish <topic>              subscribe <topic>   // topic actors
    context::update <name>, key=c, value=v   // named-context family
    context::enrich <name>, key=c [, out=f]  context::reset <name>
    asof_join table=f.parquet, key=c, on=t, value="v1|v2"
              [, table_key= table_on= direction= tolerance=N[smhd]
                 how= ties=max:col|min:col]
    range_join table=f.parquet, key=c, on=t, start=s, end=e,
               value="v1|v2"
               [, table_key= how=]
    move new=old, ...            unflatten [sep]      assert <expr>
    timeshift field [-]N[smhd]   delay field [speed]  throttle rate
    yara rules.yar [col]         python [num_cpus=c] [concurrency=n] "code"
    quality [text_col]           dedup_exact [text_col]
    dedup_minhash [id= text= ngram= num_perm= bands= cc=]
    semdedup [threshold= clusters= id= vec=]
    scrub_passages [ngram= min_docs= id= text=]
    normalize [text_col] [collapse_ws]   // NFC + mojibake repair
    c4 [text= min_words= min_sentences= span_dedup= id=]
    dsir target=f.parquet, k=N [, text= id= buckets= seed=]
    dedup_ingest store=<dir>, epoch=N [, mode=exact|minhash id= text=]
    cap <n> by <key> order_by <col> [desc|asc]
    let $name = <const>              // substitutes into later operators
    if <expr> { <pipe> } [else { <pipe> }]   fork { <pipe> }
    every <N[smhd]> [rounds=K] { <pipe> }
    cron "<sec min hour dom month dow>" [rounds=K] { <pipe> }
    api </openapi|/version|/metrics|/plugins|/processes|/sockets|/files/dir>
    diagnostics [severity]       // retained engine diagnostics
    group <key>[, <key>…] { <pipe> }  // per-group Arrow-table program
    yield <path[.sub][[]]>       fields

Expressions support `x in [..]` / `x not in [..]` (pushes into the scan
as Expression.isin when call-free) and ternary `a if cond else b`
(compiles to one pc.if_else kernel), matching TQL2's range and
conditional expressions (language/expressions.md).

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

import numpy as np
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


class _InRewrite(ast.NodeTransformer):
    """``x in [a, b]`` / ``x not in [...]`` → ``__isin(x, key)`` with
    the literal value list stashed in ``env`` (TQL2 range operations —
    language/expressions.md §Range Operations). Only literal lists are
    accepted: `in` must stay scan-pushdown-safe."""

    def __init__(self, env: dict):
        self.env = env

    def visit_Compare(self, node):
        self.generic_visit(node)
        if len(node.ops) != 1 or not isinstance(
                node.ops[0], (ast.In, ast.NotIn)):
            return node
        seq = node.comparators[0]
        if not isinstance(seq, (ast.List, ast.Tuple)) or not all(
                isinstance(e, ast.Constant) for e in seq.elts):
            raise ValueError(
                "`in` needs a literal list on the right-hand side")
        key = f"__lst{len(self.env)}"
        self.env[key] = [e.value for e in seq.elts]
        # NOT IN must stay null-propagating (SQL/TQL: null NOT IN (…)
        # is null → dropped by where) — a bare ~is_in would KEEP nulls
        fname = ("__notin" if isinstance(node.ops[0], ast.NotIn)
                 else "__isin")
        return ast.Call(func=ast.Name(id=fname, ctx=ast.Load()),
                        args=[node.left, ast.Name(id=key, ctx=ast.Load())],
                        keywords=[])


def compile_expr(src: str):
    """Python-syntax expression → pyarrow.dataset.Expression. Column names
    are pre-resolved from the AST to field expressions (an eval-time
    ``__missing__`` hook would also intercept pyarrow's internal
    ``__import__`` lookups and crash); calls/attributes are rejected
    (except the internal ``__isin`` that ``in``-operator rewriting
    emits — pads ``Expression.isin`` pushes into row-group pruning)."""
    tree = ast.parse(src, mode="eval")
    tree = _BoolRewrite().visit(tree)
    env: dict = {}
    tree = ast.fix_missing_locations(_InRewrite(env).visit(tree))
    env["__isin"] = lambda f, values: f.isin(values)
    env["__notin"] = lambda f, values: ~f.isin(values) & f.is_valid()

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
        if isinstance(node, ast.Call) and not (
                isinstance(node.func, ast.Name)
                and node.func.id in ("__isin", "__notin")):
            raise ValueError(f"unsupported expression construct in {src!r}")
        if isinstance(node, ast.Attribute):
            raise ValueError(f"unsupported expression construct in {src!r}")
        if isinstance(node, ast.Compare) and len(node.ops) > 1:
            raise ValueError(
                f"chained comparison in {src!r} - write "
                "'(a < x) and (x < b)'")
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


class _Arr:
    """Wrapper giving Arrow arrays Python operator syntax inside
    expressions (Arrow arrays don't overload comparisons): every operator
    maps to the pyarrow.compute kernel. Mixed array/scalar operands work
    because pc kernels broadcast scalars."""

    __slots__ = ("a",)

    def __init__(self, a):
        self.a = a


def _u(v):
    return v.a if isinstance(v, _Arr) else v


def _op(kernel):
    return lambda self, other: _Arr(kernel(self.a, _u(other)))


def _rop(kernel):
    return lambda self, other: _Arr(kernel(_u(other), self.a))


for _name, _k in [("gt", pc.greater), ("ge", pc.greater_equal),
                  ("lt", pc.less), ("le", pc.less_equal),
                  ("eq", pc.equal), ("ne", pc.not_equal),
                  ("add", pc.add), ("sub", pc.subtract),
                  ("mul", pc.multiply), ("truediv", pc.divide),
                  ("mod", lambda a, b: _floor_mod(a, b)),
                  ("and", pc.and_), ("or", pc.or_)]:
    setattr(_Arr, f"__{_name}__", _op(_k))
for _name, _k in [("radd", pc.add), ("rsub", pc.subtract),
                  ("rmul", pc.multiply), ("rtruediv", pc.divide)]:
    setattr(_Arr, f"__{_name}__", _rop(_k))
_Arr.__invert__ = lambda self: _Arr(pc.invert(self.a))
_Arr.__neg__ = lambda self: _Arr(pc.negate(self.a))


def _arr_bool(self):
    # Python's chained-comparison/short-circuit machinery calls bool()
    # on intermediate results; defaulting to True silently drops the
    # first leg of `a < x < b`. Refuse loudly (the compiler also rejects
    # chained comparisons up front).
    raise TypeError(
        "array expression used in a boolean context - write "
        "'(a < x) and (x < b)' instead of a chained comparison")


_Arr.__bool__ = _arr_bool


def _floor_mod(a, b):
    """Python floor-mod semantics for % (pc.divide truncates for ints,
    which flips the sign for negative dividends). Float64 intermediate:
    exact for |values| < 2^53."""
    af = pc.cast(a, pa.float64()) if not isinstance(a, (int, float)) else a
    bf = pc.cast(b, pa.float64()) if not isinstance(b, (int, float)) else b
    m = pc.subtract(af, pc.multiply(pc.floor(pc.divide(af, bf)), bf))
    atype = getattr(a, "type", None)
    if atype is not None and pa.types.is_integer(atype) and \
            isinstance(b, int):
        return pc.cast(m, atype)
    return m


def _expr_funcs() -> dict:
    """TQL expression function registry (the reference evaluates its
    function library inside expressions — libtenzir/src/tql2/eval.cpp:
    19-24, 153 function docs). Every entry is array-level: it takes
    Arrow arrays / Python scalars and returns an Arrow array, so calls
    compose with operators through :class:`_Arr`."""
    from tenzir_ray.functions import (
        encoding as E, enumtype as EN, hashing as H, lists as L,
        misc as M, parsing as P, path as PATH, strings as S, time as T,
        url as U,
    )
    from tenzir_ray.functions import ip as _ipm
    from tenzir_ray.functions.ip import ip_parse, ip_print, subnet_contains

    return {
        # strings (pyarrow kernels / functions.strings)
        "upper": pc.utf8_upper, "lower": pc.utf8_lower,
        "trim": pc.utf8_trim_whitespace, "capitalize": pc.utf8_capitalize,
        "length": pc.utf8_length,
        "starts_with": S.starts_with, "ends_with": S.ends_with,
        "contains": pc.match_substring, "replace": S.replace,
        "match_regex": S.match_regex, "split": S.split, "join": S.join,
        "pad_start": S.pad_start, "pad_end": S.pad_end,
        # math
        "round": pc.round, "abs": pc.abs, "sqrt": pc.sqrt,
        "floor": pc.floor, "ceil": pc.ceil, "exp": pc.exp, "ln": pc.ln,
        "log10": pc.log10, "power": pc.power,
        # time
        "year": pc.year, "month": pc.month, "day": pc.day,
        "hour": pc.hour, "minute": pc.minute, "second": pc.second,
        "format_time": T.format_time, "parse_time": T.parse_time,
        "since_epoch": T.since_epoch, "from_epoch": T.from_epoch,
        "floor_time": T.floor_time, "round_time": T.round_time,
        # duration constructors / extractors (duration.cpp:257-269)
        "years": T.years, "months": T.months, "weeks": T.weeks,
        "days": T.days, "hours": T.hours, "minutes": T.minutes,
        "seconds": T.seconds, "milliseconds": T.milliseconds,
        "count_years": T.count_years, "count_months": T.count_months,
        "count_weeks": T.count_weeks, "count_days": T.count_days,
        "count_hours": T.count_hours, "count_minutes": T.count_minutes,
        "count_seconds": T.count_seconds,
        # casts
        "to_int": lambda a: pc.cast(a, pa.int64()),
        "to_float": lambda a: pc.cast(a, pa.float64()),
        "to_string": lambda a: pc.cast(a, pa.string()),
        # hashing / encoding
        "md5": H.hash_md5, "sha1": H.hash_sha1, "sha256": H.hash_sha256,
        "sha512": H.hash_sha512, "hash": H.hash_fast64,
        "encode_base64": E.encode_base64, "decode_base64": E.decode_base64,
        "encode_hex": E.encode_hex, "decode_hex": E.decode_hex,
        # parsing / records / lists / conditionals
        "parse_json": P.parse_json_col,
        "get": lambda s, k: pc.struct_field(s, k),
        "list_length": pc.list_value_length,
        "list_get": pc.list_element,
        "if_else": pc.if_else, "coalesce": pc.coalesce,
        "otherwise": pc.coalesce,  # `foo else fallback` spelling
        "is_null": pc.is_null,
        "isin": lambda a, values: pc.is_in(
            a, value_set=pa.array(list(values))),
        "notin": lambda a, values: pc.and_(
            pc.invert(pc.is_in(a, value_set=pa.array(list(values)))),
            pc.is_valid(a)),
        # network
        "ip": ip_parse, "ip_str": ip_print, "in_subnet": subnet_contains,
        "is_v4": _ipm.is_v4, "is_v6": _ipm.is_v6,
        # lists / yaml / typing
        "append": L.append, "prepend": L.prepend,
        "zip": L.zip_lists,
        "concatenate": L.concatenate_lists,
        # lambda-over-list (where_map.cpp:265-455): the element expr is
        # a STRING compiled once and evaluated over the flat values
        "list_map": lambda xs, expr: L.map_elements(
            _u(xs), _element_fn(expr)),
        "list_where": lambda xs, expr: L.filter_elements(
            _u(xs), _element_fn(expr)),
        # the reference's own names for the list lambdas (where_map.cpp)
        "map": lambda xs, expr: L.map_elements(_u(xs), _element_fn(expr)),
        "where": lambda xs, expr: L.filter_elements(
            _u(xs), _element_fn(expr)),
        "parse_yaml": P.parse_yaml_col, "print_yaml": P.print_yaml_col,
        "type_of": M.type_of, "type_id": M.type_id,
        # path/file (builtins/functions/path.cpp)
        "file_name": PATH.file_name, "parent_dir": PATH.parent_dir,
        "file_stem": PATH.file_stem, "file_extension": PATH.file_extension,
        # enumeration type (type.hpp:930-944)
        "to_enum": EN.to_enum, "from_enum": EN.from_enum,
        # url (web-corpus extension; no reference analog)
        "url_host": U.url_host, "url_scheme": U.url_scheme,
        "url_path": U.url_path, "url_query": U.url_query,
        "url_port": U.url_port, "url_normalize": U.url_normalize,
        # string concat (variadic)
        "concat": lambda *a: pc.binary_join_element_wise(*a, ""),
        # whitelist placeholder — rebound per batch inside the eval env
        # (needs the batch row count; see compile_array_expr.fn)
        "random": lambda: None,
    }


def expr_has_calls(src: str) -> bool:
    """True when the expression needs the array-eval path: function
    calls, or operators pads Expressions lack (modulo)."""
    return any(
        isinstance(n, (ast.Call, ast.IfExp))  # ternary → if_else kernel
        or (isinstance(n, ast.BinOp) and isinstance(n.op, ast.Mod))
        for n in ast.walk(ast.parse(src.strip(), mode="eval")))


def compile_array_expr(src: str):
    """Expression WITH function calls → ``fn(pa.Table) -> pa.Array``.
    Names bind to table columns (wrapped for operator support), call
    targets resolve against the whitelisted registry only; attributes
    and keyword args are rejected. The pads-Expression path
    (:func:`compile_expr`) stays the scan-pushdown form; this one covers
    the full function library it can't express."""
    funcs = _expr_funcs()
    src = src.strip()
    tree = ast.parse(src, mode="eval")
    tree = _BoolRewrite().visit(tree)

    class _Sugar(ast.NodeTransformer):
        # TQL2 syntax sugar (language/expressions.md): `x in [..]` /
        # `x not in [..]` → isin(); `a if cond else b` → if_else()
        def visit_Compare(self, node):
            self.generic_visit(node)
            if len(node.ops) != 1 or not isinstance(
                    node.ops[0], (ast.In, ast.NotIn)):
                return node
            # NOT IN propagates nulls (SQL/TQL where-semantics)
            fname = ("notin" if isinstance(node.ops[0], ast.NotIn)
                     else "isin")
            return ast.Call(
                func=ast.Name(id=fname, ctx=ast.Load()),
                args=[node.left, node.comparators[0]], keywords=[])

        def visit_IfExp(self, node):
            self.generic_visit(node)
            return ast.Call(
                func=ast.Name(id="if_else", ctx=ast.Load()),
                args=[node.test, node.body, node.orelse], keywords=[])

    tree = ast.fix_missing_locations(_Sugar().visit(tree))

    class _Calls(ast.NodeTransformer):
        def visit_Call(self, node):
            self.generic_visit(node)
            if not isinstance(node.func, ast.Name) \
                    or node.func.id not in funcs:
                raise ValueError(
                    f"unknown function in expression {src!r}")
            if node.keywords:
                raise ValueError("keyword args not supported in "
                                 f"expression {src!r}")
            node.func = ast.Name(id=f"__fn_{node.func.id}", ctx=ast.Load())
            return node

    tree = ast.fix_missing_locations(_Calls().visit(tree))
    for node in ast.walk(tree):
        if isinstance(node, ast.Attribute):
            raise ValueError(f"unsupported construct in {src!r}")
        if isinstance(node, ast.Compare) and len(node.ops) > 1:
            raise ValueError(
                f"chained comparison in {src!r} - write "
                "'(a < x) and (x < b)'")
    col_names = {n.id for n in ast.walk(tree)
                 if isinstance(n, ast.Name) and not n.id.startswith("__fn_")
                 and n.id not in ("True", "False", "None")}
    code = compile(tree, "<expr>", "eval")

    def _wrap(f):
        return lambda *args: _Arr(f(*[_u(a) for a in args]))

    fenv = {f"__fn_{k}": _wrap(v) for k, v in funcs.items()}

    def fn(t: pa.Table):
        env = dict(fenv)
        # row-context functions: need the batch length, not an input
        # array (builtins/functions/random.cpp — uniform [0,1) per event)
        env["__fn_random"] = lambda: _Arr(pa.array(
            __import__("numpy").random.random(t.num_rows)))
        for n in col_names:
            env[n] = _Arr(t.column(n))
        # NB: __import__ stays reachable for pyarrow's internal scalar
        # inference (decimal import through builtins — see compile_expr)
        out = eval(code, {"__builtins__": {"__import__": __import__,
                                           "True": True, "False": False,
                                           "None": None}}, env)
        return _u(out)

    return fn


def expr_columns(src: str) -> list[str]:
    """Column names referenced by an expression (AST names that aren't
    literals) — used to widen the scan projection for pushed filters."""
    tree = ast.parse(src, mode="eval")
    return sorted({n.id for n in ast.walk(tree)
                   if isinstance(n, ast.Name)
                   and n.id not in ("True", "False", "None")})


def _element_fn(src: str):
    """Element-lambda compiler for ``list_map``/``list_where``: the
    expression's free names (conventionally ``x``) all bind to the FLAT
    element array, so the lambda evaluates once per batch — reuses the
    whitelisted array-expression compiler, never per-element Python."""
    if not isinstance(src, str):
        return src  # already a callable (Python-API use)
    fn = compile_array_expr(src)
    tree = ast.parse(src.strip(), mode="eval")
    called = {n.func.id for n in ast.walk(tree)
              if isinstance(n, ast.Call) and isinstance(n.func, ast.Name)}
    names = sorted({n.id for n in ast.walk(tree)
                    if isinstance(n, ast.Name) and n.id not in called
                    and n.id not in ("True", "False", "None")}) or ["x"]

    def f(flat: pa.Array) -> pa.Array:
        return fn(pa.table({n: flat for n in names}))

    return f


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


def _parse_aggs(aggs_text: str) -> list[tuple[str, str, str]]:
    """Parse 'alias=fn(col), …' and FAIL LOUDLY on any segment the
    grammar cannot express (dotted/quoted columns, fn args) — findall
    alone silently drops unparsed specs, yielding a result missing
    columns with no diagnostic."""
    specs = _AGG.findall(aggs_text)
    segments = [p.strip() for p in aggs_text.split(",") if p.strip()]
    if len(specs) != len(segments):
        matched = {f"{a}={f}" for a, f, _c in specs}
        bad = [seg for seg in segments
               if not any(seg.replace(" ", "").startswith(m)
                          for m in matched)] or segments
        raise ValueError(
            f"summarize: cannot parse aggregate spec {bad[0]!r} "
            "(expected alias=fn(column) with a plain identifier column)")
    return specs


def _key_spec(raw: str) -> str | list[str]:
    """`key=a` → "a"; `key="a|b"` → ["a", "b"] (composite join key —
    the spec must be QUOTED because a bare | separates operators)."""
    parts = [p.strip() for p in raw.strip().strip("\"'").split("|")]
    return parts if len(parts) > 1 else parts[0]


def _read_parquet_clean(path: str, columns: list[str] | None = None,
                        filter=None) -> Dataset:
    """Lazy parquet read with a metadata-free schema (pandas metadata
    in the file footer makes block schemas unhashable and defeats Ray's
    schema dedup downstream). Directory / glob / URI sources raise
    OSError from the single-footer read_schema probe and SKIP the
    hygiene pass — read_parquet resolves them natively, at the cost of
    whatever footer metadata the files carry."""
    import pyarrow.parquet as pq
    import ray.data as rd

    try:
        schema = pq.read_schema(path).remove_metadata()
    except OSError:
        return rd.read_parquet(path, columns=columns, filter=filter)
    if columns:
        schema = pa.schema([schema.field(c) for c in columns])
    return rd.read_parquet(path, columns=columns, schema=schema,
                           filter=filter)


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

    @staticmethod
    def _scheduled_block(op: str, rest: str, m, rounds_text):
        """Shared tail of the `every`/`cron` grammar: validate rounds,
        take the `{ … }` block, parse the subpipeline."""
        rounds = int(rounds_text or 1)
        if rounds < 1:
            raise ValueError(f"{op}: rounds must be >= 1, got {rounds}")
        inner, j = Pipeline._take_block(rest, m.end() - 1)
        if rest[j:].strip():
            raise ValueError(
                f"{op}: unexpected trailing {rest[j:].strip()!r}")
        return Pipeline.parse(inner), rounds

    @staticmethod
    def _run_rounds(sub: "Pipeline", rounds: int, wait, ds):
        """Run the block once per round — ``wait(r)`` blocks until the
        round's schedule point — and union the rounds' outputs. A
        `from` inside the block re-opens its source each round, picking
        up newly-arrived data."""
        outs = []
        for r in range(rounds):
            wait(r)
            outs.append(sub.run(None if sub.source else ds))
        out = outs[0]
        for o in outs[1:]:
            out = out.union(o)
        return out

    @staticmethod
    def _quote_escaped(s: str, i: int) -> bool:
        """True when the quote at ``s[i]`` is escaped — an ODD number of
        consecutive backslashes precedes it (``"a\\\\"`` ends the string:
        the two backslashes escape each other, not the quote)."""
        n = 0
        j = i - 1
        while j >= 0 and s[j] == "\\":
            n += 1
            j -= 1
        return n % 2 == 1

    @staticmethod
    def _subst_lets(seg: str, bindings: dict[str, str]) -> str:
        """Substitute ``$name`` let-bindings OUTSIDE string literals only
        — ``set s = "$cut USD"`` keeps its literal dollar text."""
        out: list[str] = []
        in_str: str | None = None
        i = 0
        while i < len(seg):
            ch = seg[i]
            if in_str:
                out.append(ch)
                if ch == in_str and not Pipeline._quote_escaped(seg, i):
                    in_str = None
                i += 1
                continue
            if ch in "\"'":
                in_str = ch
                out.append(ch)
                i += 1
                continue
            if ch == "$":
                m = re.match(r"\$(\w+)", seg[i:])
                if m and m.group(1) in bindings:
                    out.append(bindings[m.group(1)])
                    i += m.end()
                    continue
            out.append(ch)
            i += 1
        return "".join(out)

    @classmethod
    def parse(cls, text: str) -> "Pipeline":
        raw = []
        bindings: dict[str, str] = {}
        for seg in cls.split_ops(text):
            if bindings:
                seg = cls._subst_lets(seg, bindings)
            op, _, rest = seg.partition(" ")
            if op == "let":
                # `let $name = <const-expr>` (tql2/parser.cpp let_stmt):
                # constants substitute into every later operator's text —
                # so a `where x > $min` still pushes into the scan. A
                # non-literal RHS substitutes verbatim (column aliases).
                name, eq, rhs = rest.partition("=")
                name, rhs = name.strip(), rhs.strip()
                if not eq or not name.startswith("$") or not rhs:
                    raise ValueError(
                        f"let: expected `let $name = <expr>`, got {seg!r}")
                try:
                    bindings[name[1:]] = repr(ast.literal_eval(rhs))
                except (ValueError, SyntaxError):
                    bindings[name[1:]] = rhs
                continue
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
                if op == "where" and not expr_has_calls(rest):
                    # call-free predicates push into the scan; function
                    # calls evaluate per batch after the read
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
        return _read_parquet_clean(
            self.source, columns=self.source_columns,
            filter=self.source_filter)

    @staticmethod
    def split_ops(text: str) -> list[str]:
        """Operator segments: newline- and ``|``-separated (TQL writes
        one-liners as ``op | op | op``); ``//`` comments stripped. Brace
        blocks (``if … { … } else { … }``, ``fork { … }``) and quoted
        strings are kept whole — splitting only happens at depth 0
        outside quotes (tql2/parser.cpp tokenizes the same way)."""
        out: list[str] = []
        buf: list[str] = []
        depth = 0
        in_str: str | None = None
        s = text
        i = 0
        while i < len(s):
            ch = s[i]
            if in_str:
                buf.append(ch)
                if ch == in_str and not Pipeline._quote_escaped(s, i):
                    in_str = None
                i += 1
                continue
            if ch in "\"'":
                in_str = ch
                buf.append(ch)
                i += 1
                continue
            if ch == "/" and i + 1 < len(s) and s[i + 1] == "/" \
                    and (i == 0 or s[i - 1] in " \t\n|{("):
                # a comment only at start-of-token: the '//' inside an
                # unquoted URI (s3://…, https://…) is NOT a comment
                while i < len(s) and s[i] != "\n":
                    i += 1
                continue
            if ch == "{":
                depth += 1
            elif ch == "}":
                depth -= 1
                if depth < 0:
                    raise ValueError("unbalanced '}' in pipeline text")
            if ch in "\n|" and depth == 0:
                seg = "".join(buf).strip()
                if seg:
                    out.append(seg)
                buf = []
                i += 1
                continue
            buf.append(ch)
            i += 1
        if depth != 0:
            raise ValueError("unbalanced '{' in pipeline text")
        seg = "".join(buf).strip()
        if seg:
            out.append(seg)
        return out

    @staticmethod
    def _take_block(s: str, start: int) -> tuple[str, int]:
        """``s[start]`` must be ``{``; returns (inner text, index after
        the matching ``}``). Quote-aware like :meth:`split_ops` — a
        brace inside a string literal must not change the depth."""
        depth = 0
        in_str: str | None = None
        j = start
        while j < len(s):
            ch = s[j]
            if in_str:
                if ch == in_str and not Pipeline._quote_escaped(s, j):
                    in_str = None
            elif ch in "\"'":
                in_str = ch
            elif ch == "{":
                depth += 1
            elif ch == "}":
                depth -= 1
                if depth == 0:
                    return s[start + 1:j], j + 1
            j += 1
        raise ValueError("unbalanced braces in pipeline block")

    @classmethod
    def _compile_table_steps(cls, text: str) -> list:
        """Compile a ``group { … }`` block into Arrow Table→Table steps —
        the vectorized per-group program run inside ONE ``map_groups``
        call (never a nested Dataset inside a Ray task). Supports the
        per-group-meaningful operator subset; anything else raises."""
        steps = []
        for seg in cls.split_ops(text):
            op, _, rest = seg.partition(" ")
            rest = rest.strip()
            steps.append(cls._compile_table_step(op, rest))
        return steps

    @staticmethod
    def _compile_table_step(op: str, rest: str):
        csv = lambda s: [c.strip() for c in s.split(",") if c.strip()]
        if op == "where":
            fn = compile_array_expr(rest)
            return lambda t: t.filter(fn(t))
        if op == "select":
            cols = csv(rest)
            return lambda t: t.select(cols)
        if op == "drop":
            cols = csv(rest)
            return lambda t: t.drop_columns(cols)
        if op == "rename":
            pairs = dict(p.split("=", 1) for p in csv(rest))
            mapping = {old.strip(): new.strip() for new, old in pairs.items()}
            return lambda t: t.rename_columns(
                [mapping.get(c, c) for c in t.column_names])
        if op in ("set", "extend"):
            name, _, expr_src = rest.partition("=")
            name = name.strip()
            fn = compile_array_expr(expr_src.strip())

            def _set(t: pa.Table, name=name, fn=fn) -> pa.Table:
                arr = fn(t)
                if not isinstance(arr, (pa.Array, pa.ChunkedArray)):
                    arr = pa.array([arr] * t.num_rows)
                if name in t.column_names:
                    return t.set_column(
                        t.column_names.index(name), name, arr)
                return t.append_column(name, arr)

            return _set
        if op == "sort":
            keys = [(k.lstrip("-"),
                     "descending" if k.startswith("-") else "ascending")
                    for k in csv(rest)]
            return lambda t: t.take(pc.sort_indices(t, sort_keys=keys))
        if op in ("head", "limit"):
            n = int(rest or 10)
            return lambda t: t.slice(0, n)
        if op == "tail":
            n = int(rest or 10)
            return lambda t: t.slice(max(0, t.num_rows - n))
        if op == "slice":
            a, _, b = rest.partition(":")
            lo, hi = int(a), int(b)
            return lambda t: t.slice(lo, max(0, hi - lo))
        if op == "reverse":
            return lambda t: t.take(
                pa.array(np.arange(t.num_rows - 1, -1, -1)))
        if op == "enumerate":
            name = rest.strip() or "index"
            return lambda t: t.append_column(
                name, pa.array(np.arange(t.num_rows, dtype=np.int64)))
        if op == "distinct":
            cols = csv(rest)
            return lambda t: t.group_by(cols).aggregate([])
        if op == "pass":
            return lambda t: t
        if op == "summarize":
            m = _SUMMARIZE.match(rest)
            # TQL aggregate names → pyarrow hash-aggregate names (same
            # aliases ops.summarize accepts at top level, so the same
            # pipeline text works inside and outside group blocks)
            fn_map = {"avg": "mean", "std": "stddev",
                      "median": "approximate_median",
                      "collect": "list"}
            aggs = []  # (alias, arrow result name, (target, fn))
            for alias, fn, col in _parse_aggs(m.group("aggs")):
                col = col.strip()
                fn = fn_map.get(fn, fn)
                if fn == "count" and col in ("", "*"):
                    aggs.append((alias, "count_all", ([], "count_all")))
                else:
                    aggs.append((alias, f"{col}_{fn}", (col, fn)))
            by = csv(m.group("by")) if m.group("by") else []

            def _summ(t: pa.Table, aggs=aggs, by=by) -> pa.Table:
                if not by:
                    # constant key → one output row, Arrow types kept
                    t = t.append_column(
                        "__g", pa.array(np.zeros(t.num_rows, np.int8)))
                    g = t.group_by("__g").aggregate([a[2] for a in aggs])
                    keep: list = []
                else:
                    g = t.group_by(by).aggregate([a[2] for a in aggs])
                    keep = list(by)
                g = g.select(keep + [a[1] for a in aggs])
                return g.rename_columns(keep + [a[0] for a in aggs])

            return _summ
        raise ValueError(
            f"operator {op!r} is not supported inside a group block")

    @staticmethod
    def _compile_step(op: str, rest: str):
        csv = lambda s: [c.strip() for c in s.split(",") if c.strip()]

        def _kv(s: str, what: str) -> dict:
            """key=value option list, space- or comma-separated."""
            out: dict = {}
            for p in s.replace(",", " ").split():
                k, eq, v = p.partition("=")
                if not eq:
                    raise ValueError(
                        f"{what}: expected key=value options, got {p!r}")
                out[k.strip()] = v.strip()
            return out
        if op == "if":
            # `if <expr> { <pipe> } [else { <pipe> }]` (operators/if.cpp:
            # 109-618) — rows matching the predicate flow through the
            # then-branch, the rest through the else-branch (or pass
            # unchanged), outputs merged. Branches are full subpipelines.
            b = rest.find("{")
            if b < 0:
                raise ValueError(f"if: expected '{{' in {rest!r}")
            pred_src = rest[:b].strip()
            then_text, j = Pipeline._take_block(rest, b)
            tail = rest[j:].strip()
            else_text = None
            if tail:
                if not tail.startswith("else"):
                    raise ValueError(f"if: unexpected trailing {tail!r}")
                t2 = tail[len("else"):].strip()
                if not t2.startswith("{"):
                    raise ValueError("if: expected '{' after else")
                else_text, j2 = Pipeline._take_block(t2, 0)
                if t2[j2:].strip():
                    raise ValueError(
                        f"if: unexpected trailing {t2[j2:].strip()!r}")
            pred = compile_array_expr(pred_src)
            then_p = Pipeline.parse(then_text)
            else_p = Pipeline.parse(else_text) \
                if else_text is not None else None
            from tenzir_ray.stages.flow import if_

            return lambda ds: if_(
                ds, pred, then_p.run, else_p.run if else_p else None)
        if op == "fork":
            # `fork { <pipe> }` (operators/fork.cpp:15): the stream is
            # copied into the subpipeline; with no sink inside the block
            # the fork's output merges back into the main stream.
            b = rest.find("{")
            if b < 0 or rest[:b].strip():
                raise ValueError(f"fork: expected `fork {{ … }}`, "
                                 f"got {rest!r}")
            inner, j = Pipeline._take_block(rest, b)
            if rest[j:].strip():
                raise ValueError(
                    f"fork: unexpected trailing {rest[j:].strip()!r}")
            sub = Pipeline.parse(inner)
            from tenzir_ray.stages.flow import fork as _fork

            def _step(ds, sub=sub):
                main, branch = _fork(ds, lambda d: d, sub.run)
                return main.union(branch)

            return _step
        if op == "group":
            # `group <key>[, <key>…] { <pipe> }` (operators/group.cpp:
            # 23-118 — partition the stream by key and run the block
            # once per group; group outputs union). Ray-Data-first this
            # is ONE hash shuffle (`groupby(keys)`) and a vectorized
            # Arrow-table program per group — the block compiles to
            # Table→Table steps (no nested datasets inside tasks), so
            # only block-expressible operators are allowed inside.
            b = rest.find("{")
            if b < 0:
                raise ValueError(f"group: expected '{{' in {rest!r}")
            keys = csv(rest[:b])
            if not keys:
                raise ValueError("group: expected at least one key field")
            inner, j = Pipeline._take_block(rest, b)
            if rest[j:].strip():
                raise ValueError(
                    f"group: unexpected trailing {rest[j:].strip()!r}")
            tsteps = Pipeline._compile_table_steps(inner)

            def _kernel(g: pa.Table, tsteps=tsteps, keys=keys) -> pa.Table:
                # Ray emits zero-column blocks for empty partitions
                # (known artifact) — they must not reach the block steps
                if g.num_rows == 0 or keys[0] not in g.column_names:
                    return g
                for st in tsteps:
                    g = st(g)
                return g.replace_schema_metadata(None) \
                    if g.schema.metadata else g

            return lambda ds: ds.groupby(keys).map_groups(
                _kernel, batch_format="pyarrow")
        if op == "where":
            if expr_has_calls(rest):
                fn = compile_array_expr(rest)
                return lambda ds: ds.map_batches(
                    lambda t: t.filter(fn(t)), batch_format="pyarrow")
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
            name = name.strip()
            if expr_has_calls(expr_src):
                fn = compile_array_expr(expr_src.strip())

                def _proj(t: pa.Table, name=name, fn=fn) -> pa.Table:
                    arr = fn(t)
                    if name in t.column_names:
                        t = t.set_column(
                            t.column_names.index(name), name, arr)
                    else:
                        t = t.append_column(name, arr)
                    return t.replace_schema_metadata(None) \
                        if t.schema.metadata else t

                return lambda ds: ds.map_batches(
                    _proj, batch_format="pyarrow")
            expr = compile_expr(expr_src.strip())
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
            # trailing ``using hash|partial|auto`` picks the combine
            # strategy; default auto (TQL summarize keys are typically
            # low-cardinality type/route/flag fields — high-cardinality
            # grouping should say ``using hash``)
            combine = "auto"
            mm = re.search(r"\s+using\s+(hash|partial|auto)\s*$", rest)
            if mm:
                combine = mm.group(1)
                rest = rest[:mm.start()]
            m = _SUMMARIZE.match(rest)
            aggs: dict = {}
            for alias, fn, col in _parse_aggs(m.group("aggs")):
                col = col.strip()
                if fn == "count" and col in ("", "*"):
                    aggs[alias] = "count"
                else:
                    aggs[alias] = (fn, col)
            by = csv(m.group("by")) if m.group("by") else None
            if combine == "partial":
                return lambda ds: ops.summarize_partial(ds, by, **aggs)
            return lambda ds: ops.summarize(ds, by, combine=combine,
                                            **aggs)
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
        if op == "move":
            pairs = dict(p.split("=", 1) for p in csv(rest))
            mapping = {new.strip(): old.strip() for new, old in pairs.items()}
            return lambda ds: ops.move(ds, **mapping)
        if op == "unflatten":
            sep = rest.strip() or "."
            return lambda ds: ops.unflatten(ds, sep)
        if op == "assert":
            fn = compile_array_expr(rest.strip())
            return lambda ds: ops.assert_(ds, fn)
        if op == "every":
            # `every <N[smhd]> [rounds=K] { <pipe> }`
            # (operators/every_cron.cpp:49 — run the block on a
            # schedule). The block re-runs each round — a `from` inside
            # it re-opens the source, picking up newly-arrived data —
            # and rounds' outputs union. `rounds=` bounds the schedule
            # (the reference runs until cancelled; a batch engine needs
            # a horizon — Lake.follow is the unbounded analog).
            import time as _time

            m = re.match(r"(?P<dur>\d+(?:\.\d+)?)(?P<u>[smhd])"
                         r"(?:\s+rounds=(?P<r>\d+))?\s*\{", rest)
            if not m:
                raise ValueError(
                    f"every: expected `every <N[smhd]> [rounds=K] "
                    f"{{ … }}`, got {rest!r}")
            secs = float(m.group("dur")) * {"s": 1, "m": 60, "h": 3600,
                                            "d": 86400}[m.group("u")]
            sub, rounds = Pipeline._scheduled_block(
                "every", rest, m, m.group("r"))

            def _wait_every(r: int, secs=secs):
                if r:
                    _time.sleep(secs)

            return lambda ds: Pipeline._run_rounds(
                sub, rounds, _wait_every, ds)
        if op == "cron":
            # `cron "<6-field expr>" [rounds=K] { <pipe> }`
            # (operators/every_cron.cpp:56; web docs operators/cron.md).
            # Scheduled analog of `every`: each round waits for the next
            # cron fire point, then runs the block; rounds' outputs
            # union. `rounds=` bounds the schedule (the reference runs
            # until cancelled; a batch engine needs a horizon).
            import datetime as _dt
            import time as _time

            from tenzir_ray.pipelines.cron import next_fire, parse_cron

            m = re.match(r'"([^"]+)"(?:\s+rounds=(?P<r>\d+))?\s*\{', rest)
            if not m:
                raise ValueError(
                    f'cron: expected `cron "<expr>" [rounds=K] '
                    f'{{ … }}`, got {rest!r}')
            spec = parse_cron(m.group(1))  # parse errors surface now
            sub, rounds = Pipeline._scheduled_block(
                "cron", rest, m, m.group("r"))

            def _wait_cron(r: int, spec=spec):
                now = _dt.datetime.now()
                wait = (next_fire(spec, now) - now).total_seconds()
                if wait > 0:
                    _time.sleep(wait)

            return lambda ds: Pipeline._run_rounds(
                sub, rounds, _wait_cron, ds)
        if op == "api":
            # `api <path>` (operators/api.cpp; web docs operators/api.md
            # — query the node's REST API from a pipeline). The engine's
            # API surface is its introspection endpoints; the response
            # becomes the event stream, replacing any piped input (the
            # reference's `api` is a source).
            path = rest.strip().strip('"').strip("/")

            def _api(ds, path=path):
                import ray.data as rd

                from tenzir_ray.sources import introspect as I

                one_row = {"openapi": I.openapi, "version": I.version,
                           "metrics": I.metrics}
                if path in one_row:
                    return rd.from_items([one_row[path]()])
                if path in ("processes", "sockets"):
                    return getattr(I, path)()
                if path == "plugins":
                    return rd.from_items(I.plugins())
                if path == "files" or path.startswith("files/"):
                    _, _, d = path.partition("/")
                    return I.files("/" + d if d else "/")
                raise ValueError(
                    f"api: unknown endpoint /{path} (have /openapi "
                    f"/version /metrics /plugins /processes /sockets "
                    f"/files/<dir>)")

            return _api
        if op == "diagnostics":
            # `diagnostics [severity]` (operators/diagnostics.md retro
            # mode): the engine's retained diagnostic events become the
            # stream, replacing any piped input
            sev = rest.strip() or None

            def _diag(ds, sev=sev):
                from tenzir_ray.diagnostics import diagnostics as d

                return d(sev)

            return _diag
        if op in ("set-attributes", "set_attributes"):
            # set-attributes key=value, … (operators/set_attributes.cpp)
            kv = _kv(rest, "set-attributes")
            return lambda ds: ops.set_attributes(ds, **kv)
        if op in ("get-attributes", "get_attributes"):
            return lambda ds: ops.get_attributes(ds)
        if op == "yield":
            # yield <path[.sub][[]]> (operators/yield.cpp): the record(s)
            # at path become the new events
            path = rest.strip()
            return lambda ds: ops.yield_(ds, path)
        if op == "fields":
            # fields (operators/fields.cpp): one event per input field
            return lambda ds: ops.fields_(ds)
        if op == "timeshift":
            # timeshift <field> <[-]N[smhd]> (operators/timeshift.cpp)
            import datetime

            field, _, spec = rest.strip().partition(" ")
            spec = spec.strip()
            sign = -1 if spec.startswith("-") else 1
            spec = spec.lstrip("+-")
            unit = {"s": "seconds", "m": "minutes", "h": "hours",
                    "d": "days"}[spec[-1]]
            delta = sign * datetime.timedelta(**{unit: int(spec[:-1])})
            return lambda ds: ops.timeshift(ds, field, delta)
        if op == "delay":
            # delay <time_field> [speed] (operators/delay.cpp)
            from tenzir_ray.stages.flow import delay as _delay

            field, _, speed = rest.strip().partition(" ")
            return lambda ds: _delay(ds, field,
                                     speed=float(speed.strip() or 1.0))
        if op == "throttle":
            # throttle <events_per_s> (operators/throttle.cpp)
            from tenzir_ray.stages.flow import throttle as _throttle

            rate = float(rest.strip())
            return lambda ds: _throttle(ds, rate)
        if op == "decapsulate":
            # decapsulate [col] [payload] — Ethernet/802.1Q/IPv4/IPv6/
            # TCP/UDP field decode over a packet-bytes column
            # (operators/decapsulate.cpp); `payload` adds the bytes past
            # the L4 header as a column for downstream scanners (yara)
            from tenzir_ray.sources.pcap import decapsulate

            parts = rest.split()
            emit = "payload" in parts
            cols = [p for p in parts if p != "payload"]
            return lambda ds: decapsulate(ds, col=cols[0] if cols
                                          else "data", emit_payload=emit)
        if op == "yara":
            # yara <rules-file> [col] — mini-YARA scan (plugins/yara)
            from tenzir_ray.stages.yara import yara_match

            path, _, col = rest.strip().partition(" ")
            with open(path.strip().strip('"')) as fh:
                src = fh.read()
            return lambda ds: yara_match(ds, src, col.strip() or "data")
        if op == "enrich":
            # enrich key=<col>, table=<path.parquet>, field=<lookup col>,
            # out=<name>[, table_key=<col in table>] — the lookup-table
            # context enrichment (lookup_table.cpp:221-343) from TQL text
            kv = dict(p.split("=", 1) for p in csv(rest))
            import pyarrow.parquet as pq

            lookup = pq.read_table(kv["table"].strip()) \
                .replace_schema_metadata(None)
            key = kv["key"].strip()
            out = kv.get("out", "value").strip()
            fields = {out: kv["field"].strip()} if "field" in kv else None
            table_key = kv.get("table_key", key).strip()
            return lambda ds: ops.enrich(
                ds, lookup, key=key, fields=fields, lookup_key=table_key,
                out_field=out)
        if op == "export":
            # export <lake_root> [, at=<epoch>] [, columns=c1|c2] —
            # SOURCE: merge-on-read lake state (Lake.read, one merge
            # task per partition, optional as-of time travel +
            # projection pushdown; operators/export.cpp:47-67)
            name, _, params = rest.partition(",")
            root = name.strip().strip("\"'")
            if not root:
                raise ValueError("export: missing lake root")
            kv = dict(p.split("=", 1) for p in csv(params)) if \
                params.strip() else {}
            at = int(kv["at"]) if "at" in kv else None
            cols = [c.strip() for c in
                    kv["columns"].strip().strip("\"'").split("|")] \
                if "columns" in kv else None

            def _export(ds, _root=root, _at=at, _cols=cols):
                from tenzir_ray.cdc import Lake

                return Lake(_root).read(as_of_epoch=_at, columns=_cols)

            return _export
        if op == "diff":
            # diff <lake_root>, from=<epoch> [, to=<epoch>] — SOURCE:
            # CDC changefeed between two committed snapshots (Lake.diff,
            # cdc/lake.py — Delta-Lake table_changes analog): one row
            # per url whose LWW survivor changed, to-side columns plus
            # `change` ∈ {insert, update, delete}. `from=none` (or
            # omitted) = bootstrap all-inserts feed; `to` defaults to
            # the latest committed epoch.
            name, _, params = rest.partition(",")
            root = name.strip().strip("\"'")
            if not root:
                raise ValueError("diff: missing lake root")
            kv = dict(p.split("=", 1) for p in csv(params)) if \
                params.strip() else {}
            bad = set(kv) - {"from", "to", "columns"}
            if bad:
                raise ValueError(f"diff: unknown operand(s) {sorted(bad)}")
            frm_s = kv.get("from", "none").strip().lower()
            try:
                frm = None if frm_s in ("none", "null") else int(frm_s)
                to = int(kv["to"]) if "to" in kv else None
            except ValueError:
                raise ValueError(
                    "diff: from=/to= must be integer epochs (or from=none)"
                ) from None
            cols = [c.strip() for c in
                    kv["columns"].strip().strip("\"'").split("|")] \
                if "columns" in kv else None

            def _diff(ds, _root=root, _frm=frm, _to=to, _cols=cols):
                from tenzir_ray.cdc import Lake

                return Lake(_root).diff(_frm, _to, columns=_cols)

            return _diff
        if op == "replicate":
            # replicate <dst_lake_root>, from=<src_lake_root> — sync a
            # replica lake off the source's committed epochs
            # (Lake.replicate_from); emits the per-epoch sync summaries
            name, _, params = rest.partition(",")
            dst_root = name.strip().strip("\"'")
            kv = dict(p.split("=", 1) for p in csv(params)) if \
                params.strip() else {}
            if not dst_root or "from" not in kv:
                raise ValueError(
                    "replicate: need `replicate <dst_root>, from=<src_root>`")
            bad = set(kv) - {"from"}
            if bad:
                raise ValueError(
                    f"replicate: unknown operand(s) {sorted(bad)}")
            src_root = kv["from"].strip().strip("\"'")

            def _replicate(ds, _dst=dst_root, _src=src_root):
                import ray.data as rd

                from tenzir_ray.cdc import Lake

                rows = Lake(_dst).replicate_from(Lake(_src))
                if not rows:  # already converged: empty typed stream
                    return rd.from_arrow(pa.table({
                        "epoch": pa.array([], pa.int64()),
                        "events": pa.array([], pa.int64()),
                        "skipped": pa.array([], pa.bool_())}))
                return rd.from_items([
                    {"epoch": r["epoch"],
                     "events": int(r.get("events", 0)),
                     "skipped": bool(r.get("skipped", False))}
                    for r in rows])

            return _replicate
        if op == "import":
            # import <lake_root>, wal=<dir> — apply a WAL directory's
            # pending epochs into the lake (CLI `lake apply` analog);
            # emits the per-epoch commit summaries as the stream
            name, _, params = rest.partition(",")
            root = name.strip().strip("\"'")
            kv = dict(p.split("=", 1) for p in csv(params)) if \
                params.strip() else {}
            if not root or "wal" not in kv:
                raise ValueError(
                    "import: need `import <lake_root>, wal=<dir>`")
            wal = kv["wal"].strip().strip("\"'")

            def _import(ds, _root=root, _wal=wal):
                import ray.data as rd

                from tenzir_ray.cdc import Lake

                rows = Lake(_root).apply_wal(_wal)
                return rd.from_items([
                    {k: r[k] for k in ("epoch", "events")}
                    for r in rows])

            return _import
        if op == "publish":
            # publish <topic> — forward the stream to the named topic
            # actor (stages/pubsub.py); pass-through so a pipeline can
            # both publish and keep processing. Materializes once so
            # the published refs and the returned dataset are the same
            # execution.
            topic = rest.strip().strip("\"'")
            if not topic:
                raise ValueError("publish: missing topic")

            def _publish(ds, _topic=topic):
                from tenzir_ray.stages.pubsub import publish as _pub

                mat = ds.materialize()
                _pub(mat, _topic)
                return mat

            return _publish
        if op == "subscribe":
            # subscribe <topic> — SOURCE: replaces the upstream with
            # the topic's buffered events (operators/subscribe.cpp)
            topic = rest.strip().strip("\"'")
            if not topic:
                raise ValueError("subscribe: missing topic")

            def _subscribe(ds, _topic=topic):
                from tenzir_ray.stages.pubsub import subscribe as _sub

                out, _seq = _sub(_topic)
                return out

            return _subscribe
        if op.startswith("context::"):
            # context::update <name>, key=<col>, value=<col>
            # context::enrich <name>, key=<col> [, out=<field>]
            # context::reset <name>  — the named-context actor family
            # (builtins/contexts/lookup_table.cpp) from TQL text.
            # update streams (key,value) pairs into the actor from the
            # workers as the batch flows through (pass-through, lazy —
            # the update lands when the pipeline executes).
            verb = op[len("context::"):]
            name, _, params = rest.partition(",")
            name = name.strip().strip("\"'")
            if not name:
                raise ValueError(f"context::{verb}: missing context name")
            kv = dict(p.split("=", 1) for p in csv(params)) if \
                params.strip() else {}
            if verb == "update":
                try:
                    key, val = kv["key"].strip(), kv["value"].strip()
                except KeyError as e:
                    raise ValueError(
                        f"context::update: missing {e.args[0]}= "
                        "operand") from None

                class _Upd:
                    """Actor handle resolved once per worker (not per
                    batch); the blocking ack keeps update-then-read
                    pipelines correct — contexts are small-side by
                    design, so the single-actor serialization is the
                    documented contract, not a bottleneck."""

                    def __init__(self):
                        from tenzir_ray.state.context import ContextActor

                        self._actor = ContextActor(name)

                    def __call__(self, t: pa.Table) -> pa.Table:
                        import ray as _ray

                        _ray.get(self._actor.update.remote(dict(zip(
                            t.column(key).to_pylist(),
                            t.column(val).to_pylist()))))
                        return t

                # materialize so the updates LAND at this step's place
                # in the pipeline — a lazy map_batches would execute
                # AFTER an eager downstream context::enrich snapshot
                return lambda ds: ds.map_batches(
                    _Upd, batch_format="pyarrow",
                    concurrency=(1, 4)).materialize()
            if verb == "enrich":
                if "key" not in kv:
                    raise ValueError(
                        "context::enrich: missing key= operand")
                key = kv["key"].strip()
                out = kv.get("out", "context").strip()

                def _enr(ds, _n=name, _k=key, _o=out):
                    from tenzir_ray.state.context import context_enrich

                    return context_enrich(ds, _n, key=_k, out_field=_o)

                return _enr
            if verb == "reset":
                def _rst(ds, _n=name):
                    import ray as _ray

                    from tenzir_ray.state.context import ContextActor

                    _ray.get(ContextActor(_n).reset.remote())
                    return ds

                return _rst
            raise ValueError(f"context:: unknown verb {verb!r} "
                             "(have update/enrich/reset)")
        if op == "join":
            # join table=<path.parquet>, key=<col>, value=<c1|c2>
            #   [, table_key=<col>] [, how=inner|left] — distributed
            # equi-join (stages/joins.py hash_join); for a SMALL right
            # side prefer `enrich` (broadcast, no shuffle)
            from tenzir_ray.stages.joins import hash_join

            kv = dict(p.split("=", 1) for p in csv(rest))
            try:
                path = kv["table"].strip().strip('"')
                key = _key_spec(kv["key"])
                vals = [v.strip() for v in
                        kv["value"].strip().strip("\"'").split("|")]
            except KeyError as e:
                raise ValueError(f"join: missing required operand "
                                 f"{e.args[0]}=") from None
            how = kv.get("how", "inner").strip()
            if how not in ("left", "inner"):
                raise ValueError(f"join: bad how={how!r}")
            table_key = _key_spec(kv["table_key"]) if "table_key" in kv \
                else key
            return lambda ds: hash_join(
                ds, _read_parquet_clean(path), on=key,
                right_on=table_key, value_cols=vals, how=how)
        if op in ("asof_join", "range_join"):
            # asof_join table=<path.parquet>, key=<col>, on=<time col>,
            #   value=<c1|c2> [, table_key=] [, table_on=]
            #   [, direction=backward|forward] [, tolerance=<Nd|Nh|Nm|Ns>]
            #   [, how=left|inner]
            # range_join table=<path.parquet>, key=<col>, on=<time col>,
            #   start=<col>, end=<col>, value=<c1|c2> [, table_key=]
            #   [, how=inner|left]
            # The right side is a parquet table read lazily at apply
            # time (stages/joins.py; value lists are |-separated
            # because csv() splits the operand list on commas).
            import datetime as _dt

            from tenzir_ray.stages.joins import asof_join, range_join
            from tenzir_ray.stages.window import _dur_seconds

            kv = dict(p.split("=", 1) for p in csv(rest))
            try:
                path = kv["table"].strip().strip('"')
                key = _key_spec(kv["key"])
                on = kv["on"].strip()
                vals = [v.strip() for v in kv["value"].split("|")]
                if op == "range_join":
                    start, end = kv["start"].strip(), kv["end"].strip()
            except KeyError as e:
                raise ValueError(f"{op}: missing required operand "
                                 f"{e.args[0]}=") from None
            table_key = _key_spec(kv["table_key"]) if "table_key" in kv \
                else key
            how = kv.get("how", "left" if op == "asof_join"
                          else "inner").strip()
            if how not in ("left", "inner"):
                raise ValueError(f"{op}: bad how={how!r}")
            if op == "asof_join":
                direction = kv.get("direction", "backward").strip()
                if direction not in ("backward", "forward"):
                    raise ValueError(
                        f"asof_join: bad direction={direction!r}")
                tol = kv.get("tolerance", "").strip()
                # a duration tolerance (60s/5m/…) presumes a TIMESTAMP
                # time column; a bare integer is raw column units —
                # int columns must use the latter (a duration would be
                # silently reinterpreted as microseconds, joins.py
                # _tol_to_int)
                tol = (int(tol) if tol.isdigit() else _dt.timedelta(
                    seconds=_dur_seconds(tol))) if tol else None
                ties = kv.get("ties", "").strip()  # ties=max:col
                if ties:
                    mode, _, tcol = ties.partition(":")
                    ties = (mode.strip(), tcol.strip())
                return lambda ds: asof_join(
                    ds, _read_parquet_clean(path), by=key, left_on=on,
                    right_by=table_key,
                    right_on=kv.get("table_on", on).strip(),
                    value_cols=vals, direction=direction,
                    tolerance=tol, how=how, ties=ties or None)
            return lambda ds: range_join(
                ds, _read_parquet_clean(path), by=key, left_on=on,
                right_by=table_key, right_start=start,
                right_end=end, value_cols=vals, how=how)
        if op in ("parse_kv", "parse_syslog", "parse_cef", "parse_leef"):
            from tenzir_ray.sources import formats as _fmt

            batch_fn = {
                "parse_kv": _fmt.parse_kv_batch,
                "parse_syslog": _fmt.parse_syslog_batch,
                "parse_cef": _fmt.parse_cef_batch,
                "parse_leef": _fmt.parse_leef_batch,
            }[op]
            col = rest.strip() or "line"
            return lambda ds: ds.map_batches(
                lambda t: batch_fn(t, col=col), batch_format="pyarrow")
        if op == "window":
            # window <every> [slide=<dur>] <time_col> <alias>=<agg>(col)
            #        [, ...] [by k1, k2] — event-time windowed summarize,
            # tumbling by default, hopping with slide=
            # (operators/summarize.cpp:100-142 batch form)
            from tenzir_ray.stages.window import summarize_window

            every, _, spec = rest.strip().partition(" ")
            spec = spec.strip()
            slide = None
            if spec.startswith("slide="):
                sl, _, spec = spec.partition(" ")
                slide = sl[len("slide="):]
            time_col, _, spec = spec.strip().partition(" ")
            m = _SUMMARIZE.match(spec.strip())
            aggs: dict = {}
            for alias, fn, col in _parse_aggs(m.group("aggs")):
                col = col.strip()
                aggs[alias] = "count" if fn == "count" and \
                    col in ("", "*") else (fn, col)
            by = csv(m.group("by")) if m.group("by") else None
            return lambda ds: summarize_window(
                ds, time_col, every, by=by, slide=slide, **aggs)
        if op == "sigma":
            # sigma <rules.yml | rules-dir/> — a YAML file (one document
            # or a stream; rules compile once per actor) or a rule
            # DIRECTORY, which hot-reloads on mtime change per batch
            # (plugins/sigma rule-dir watch)
            import os as _os

            import yaml

            from tenzir_ray.stages.sigma import sigma_match, sigma_match_dir

            path = rest.strip().strip('"')
            if _os.path.isdir(path):
                return lambda ds: sigma_match_dir(ds, path)
            with open(path) as fh:
                docs = [d for d in yaml.safe_load_all(fh) if d]
            rules = {
                d.get("title", f"rule{i}"): d for i, d in enumerate(docs)
            }
            return lambda ds: sigma_match(ds, rules)
        if op == "parse_grok":
            from tenzir_ray.sources import formats as _fmt

            col, _, pat = rest.strip().partition(" ")
            pat = pat.strip().strip('"')
            return lambda ds: ds.map_batches(
                lambda t: _fmt.parse_grok_batch(t, pat, col=col),
                batch_format="pyarrow")
        if op == "quality":
            # quality [text_col] — fused lang-id / quality-score /
            # token-count actor-pool stage (text/quality.py)
            from tenzir_ray.text.quality import analyze_documents

            col = rest.strip() or "text"
            return lambda ds: analyze_documents(ds, text_col=col)
        if op == "dedup_exact":
            # dedup_exact [text_col] — corpus exact dedup by content hash
            from tenzir_ray.text.dedup import exact_dedup

            col = rest.strip() or "text"
            return lambda ds: exact_dedup(ds, text_col=col)
        if op == "dedup_minhash":
            # dedup_minhash [id=doc_id] [text=text] [ngram=3]
            #   [num_perm=64] [bands=16] [cc=true] — MinHash-LSH
            # near-dup removal; cc=true keeps ONE survivor per
            # TRANSITIVE duplicate component (union-find semantics via
            # distributed connected components) instead of the one-hop
            # min-label rule
            kv = _kv(rest, "dedup_minhash")
            from tenzir_ray.text.dedup import (
                minhash_cc_dedup, minhash_lsh_dedup,
            )

            fn = minhash_cc_dedup \
                if kv.get("cc", "").lower() in ("1", "true", "yes") \
                else minhash_lsh_dedup
            return lambda ds: fn(
                ds, id_col=kv.get("id", "doc_id").strip(),
                text_col=kv.get("text", "text").strip(),
                ngram=int(kv.get("ngram", 3)),
                num_perm=int(kv.get("num_perm", 64)),
                bands=int(kv.get("bands", 16)))
        if op == "semdedup":
            # semdedup [threshold=0.95] [clusters=8] [id=vec_id]
            #   [vec=embedding] — semantic dedup (Abbas et al. 2023)
            kv = _kv(rest, "semdedup")
            from tenzir_ray.text.ann import semdedup

            return lambda ds: semdedup(
                ds, n_clusters=int(kv.get("clusters", 8)),
                threshold=float(kv.get("threshold", 0.95)),
                id_col=kv.get("id", "vec_id").strip(),
                vec_col=kv.get("vec", "embedding").strip())
        if op == "scrub_passages":
            # scrub_passages [ngram=8] [min_docs=2] [id=doc_id]
            #   [text=text] — cross-doc duplicated-passage removal
            kv = _kv(rest, "scrub_passages")
            from tenzir_ray.text.passages import scrub_passages

            return lambda ds: scrub_passages(
                ds, id_col=kv.get("id", "doc_id").strip(),
                text_col=kv.get("text", "text").strip(),
                ngram=int(kv.get("ngram", 8)),
                min_docs=int(kv.get("min_docs", 2)))
        if op == "dedup_ingest":
            # dedup_ingest store=<dir>, epoch=<n> [, mode=exact|minhash]
            #   [, id=doc_id] [, text=text] — incremental dedup AT
            # INGEST against the persistent survivor store
            # (text/incremental.py); exact = content hash, minhash =
            # banded LSH near-dup
            from tenzir_ray.text.incremental import (
                incremental_exact_dedup,
                incremental_minhash_dedup,
            )

            kv = dict(p.split("=", 1) for p in csv(rest))
            try:
                root = kv["store"].strip().strip('"')
                ep = int(kv["epoch"])
            except KeyError as e:
                raise ValueError("dedup_ingest: missing required operand "
                                 f"{e.args[0]}=") from None
            mode = kv.get("mode", "exact").strip().lower()
            if mode not in ("exact", "minhash"):
                raise ValueError(f"dedup_ingest: bad mode={mode!r}")
            idc = kv.get("id", "doc_id").strip()
            col = kv.get("text", "text").strip()
            if mode == "exact":
                return lambda ds: incremental_exact_dedup(
                    ds, root, ep, id_col=idc, text_col=col)
            return lambda ds: incremental_minhash_dedup(
                ds, root, ep, id_col=idc, text_col=col)
        if op == "dsir":
            # dsir target=<path.parquet>, k=<n> [, text=] [, id=]
            #   [, buckets=4096] [, seed=1234|none] — DSIR importance
            # resampling toward the target corpus (text/dsir.py); the
            # target rides the same lazily-read table= spelling as the
            # temporal joins
            from tenzir_ray.text.dsir import dsir_select

            kv = dict(p.split("=", 1) for p in csv(rest))
            try:
                path = kv["target"].strip().strip('"')
                k = int(kv["k"])
            except KeyError as e:
                raise ValueError("dsir: missing required operand "
                                 f"{e.args[0]}=") from None
            seed_s = kv.get("seed", "1234").strip().lower()
            seed = None if seed_s in ("none", "off") else int(seed_s)
            return lambda ds: dsir_select(
                ds, _read_parquet_clean(path), k,
                text_col=kv.get("text", "text").strip(),
                id_col=kv.get("id", "doc_id").strip(),
                num_buckets=int(kv.get("buckets", 4096)),
                gumbel_seed=seed)
        if op == "normalize":
            # normalize [text_col] [collapse_ws] — NFC + control strip
            # + mojibake repair (text/normalize.py)
            from tenzir_ray.text.normalize import normalize_documents

            parts = rest.split()
            collapse = "collapse_ws" in parts
            cols = [p for p in parts if p != "collapse_ws"]
            if len(cols) > 1:
                raise ValueError(
                    "normalize syntax: normalize [text_col] [collapse_ws]")
            col = cols[0] if cols else "text"
            return lambda ds: normalize_documents(
                ds, text_col=col, collapse_ws=collapse)
        if op == "robots":
            # robots table=<parquet(host,body)> [agent=*] [url=url]
            #   [invert] — RFC 9309 crawl-permission filter
            # (text/robots.py); the host→robots.txt table is the small
            # side, read at compose time and broadcast
            from tenzir_ray.text.robots import robots_filter

            parts0 = rest.split()
            inv = "invert" in parts0
            kv = _kv(" ".join(p for p in parts0 if p != "invert"),
                     "robots")
            try:
                path = kv["table"].strip().strip('"')
            except KeyError:
                raise ValueError(
                    "robots: missing required operand table=") from None
            import pyarrow.parquet as _pq

            rt = _pq.read_table(path, columns=["host", "body"])
            bodies = dict(zip(
                (h.lower() for h in rt.column("host").to_pylist()),
                rt.column("body").to_pylist()))
            return lambda ds: robots_filter(
                ds, bodies, url_col=kv.get("url", "url").strip(),
                agent=kv.get("agent", "*").strip(), invert=inv)
        if op == "chunk":
            # chunk [size=256] [overlap=32] [text=text] [id=doc_id] —
            # overlapping token-window chunking for retrieval/RAG prep
            # (text/packing.py chunk_tokens)
            from tenzir_ray.text.packing import chunk_tokens

            kv = _kv(rest, "chunk")
            return lambda ds: chunk_tokens(
                ds, text_col=kv.get("text", "text").strip(),
                id_col=kv.get("id", "doc_id").strip(),
                size=int(kv.get("size", 256)),
                overlap=int(kv.get("overlap", 32)))
        if op == "url_filter":
            # url_filter [block="a.com|b.com"] [block_file=<path>]
            #   [pattern=<re2>] [url=url] [invert] — domain-suffix +
            # url-regex filtering (text/curation.py url_filter, the
            # UT1/FineWeb gate); block_file is one domain per line
            from tenzir_ray.text.curation import url_filter

            parts0 = rest.split()
            inv = "invert" in parts0
            kv = _kv(" ".join(p for p in parts0 if p != "invert"),
                     "url_filter")
            domains: list[str] = []
            if "block" in kv:
                domains += [d for d in
                            kv["block"].strip('"').split("|") if d]
            if "block_file" in kv:
                with open(kv["block_file"].strip('"')) as f:
                    # strip once, then comment-check: an INDENTED
                    # '# comment' line must not become a blocklist entry
                    lines = (ln.strip() for ln in f)
                    domains += [ln for ln in lines
                                if ln and not ln.startswith("#")]
            pat = kv.get("pattern", "").strip('"') or None
            if not domains and not pat:
                raise ValueError("url_filter: need block=, block_file= "
                                 "or pattern=")
            return lambda ds: url_filter(
                ds, url_col=kv.get("url", "url").strip(),
                block_domains=domains, block_url_re=pat, invert=inv)
        if op == "extract_links":
            # extract_links [html=html] [url=url] — (url, html) pages →
            # (src_host, dst_host) edges (text/linkgraph.py)
            from tenzir_ray.text.linkgraph import extract_links

            kv = _kv(rest, "extract_links")
            return lambda ds: extract_links(
                ds, html_col=kv.get("html", "html").strip(),
                url_col=kv.get("url", "url").strip())
        if op == "pagerank":
            # pagerank [iters=20] — fixed-point host PageRank over a
            # (src_host, dst_host) edge stream; emits (host, rank)
            from tenzir_ray.text.linkgraph import pagerank

            kv = _kv(rest, "pagerank")
            iters = int(kv.get("iters", 20))

            def _pr(ds, iters=iters):
                import ray.data as _rd
                return _rd.from_arrow(pagerank(ds, iters=iters))
            return _pr
        if op == "quality_classify":
            # quality_classify target=<path.parquet> [text=] [buckets=]
            #   [epochs=] [max_sample=] — fastText/CCNet-style quality
            # scoring (text/classifier.py): train wiki-vs-crawl style
            # logistic regression with the TARGET corpus as positives
            # and a bounded sample of the input as negatives, then
            # score the input map-only
            from tenzir_ray.text.classifier import (
                classifier_score,
                classifier_train,
            )

            kv = _kv(rest, "quality_classify")
            try:
                path = kv["target"].strip().strip('"')
            except KeyError:
                raise ValueError("quality_classify: missing required "
                                 "operand target=") from None
            col = kv.get("text", "text").strip()
            nb = int(kv.get("buckets", 4096))
            ep = int(kv.get("epochs", 30))
            ms = int(kv.get("max_sample", 20000))

            def _qc(ds, path=path, col=col, nb=nb, ep=ep, ms=ms):
                model = classifier_train(
                    _read_parquet_clean(path), ds, text_col=col,
                    num_buckets=nb, epochs=ep, max_sample=ms)
                return classifier_score(ds, model, text_col=col)
            return _qc
        if op == "html_extract":
            # html_extract [html=html] [out=text] [drop_html] — rich
            # HTML→text (comments/script/style removal, block structure,
            # entity decode, ws normalize; text/html.py, Arrow-RE2
            # vectorized)
            from tenzir_ray.text.html import html_extract

            parts = rest.split()
            drop = "drop_html" in parts
            kv = dict(p.split("=", 1) for p in parts if "=" in p)
            return lambda ds: html_extract(
                ds, html_col=kv.get("html", "html").strip(),
                out_col=kv.get("out", "text").strip(), drop_html=drop)
        if op == "boilerplate":
            # boilerplate [html=html] [out=text] — jusText-lite
            # main-content extraction (text/html.py, actor pool)
            from tenzir_ray.text.html import boilerplate_extract

            kv = _kv(rest, "boilerplate")
            return lambda ds: boilerplate_extract(
                ds, html_col=kv.get("html", "html").strip(),
                out_col=kv.get("out", "text").strip())
        if op == "c4":
            # c4 [text=text] [min_words=5] [min_sentences=3]
            #   [span_dedup=false] [id=doc_id] — C4 line/page filters,
            #   optionally + corpus-level 3-sentence-span dedup
            kv = _kv(rest, "c4")
            from tenzir_ray.text.c4 import c4_clean, c4_span_dedup

            col = kv.get("text", "text").strip()
            mw = int(kv.get("min_words", 5))
            ms = int(kv.get("min_sentences", 3))
            span = kv.get("span_dedup", "").lower() in ("1", "true", "yes")
            idc = kv.get("id", "doc_id").strip()

            def _c4(ds, col=col, mw=mw, ms=ms, span=span, idc=idc):
                out = c4_clean(ds, text_col=col, min_words=mw,
                               min_sentences=ms)
                return c4_span_dedup(out, id_col=idc, text_col=col) \
                    if span else out
            return _c4
        if op == "cap":
            # cap <n> by <key> order_by <col> [desc|asc] [id <col>] —
            # per-key quota (text/curation.py cap_per_key). Tie-break id
            # defaults to the order_by column so generic tables (no
            # doc_id) work out of the box.
            from tenzir_ray.text.curation import cap_per_key

            m = re.match(
                r"^\s*(\d+)\s+by\s+(\S+)\s+order_by\s+(\S+)"
                r"(?:\s+(desc|asc))?(?:\s+id\s+(\S+))?\s*$",
                rest)
            if not m:
                raise ValueError(
                    "cap syntax: cap <n> by <key> order_by <col> "
                    "[desc|asc] [id <col>]")
            return lambda ds: cap_per_key(
                ds, m.group(2), int(m.group(1)), m.group(3),
                descending=(m.group(4) or "desc") == "desc",
                id_col=m.group(5) or m.group(3))
        if op.startswith("read_") or op.startswith("write_"):
            return Pipeline._compile_format_op(op, rest)
        if op.startswith(("compress_", "decompress_")):
            # compress_<codec> [col] / decompress_<codec> [col]
            # (operators/compress_*.mdx): the reference compresses the
            # BYTE STREAM between write_* and save; the batch-engine
            # analog is per-record compression of a string/binary
            # column (default `line`, i.e. right after a write_* step).
            from tenzir_ray.functions.compress import compress, decompress

            kind, _, codec = op.partition("_")
            col = rest.strip() or "line"
            fn = compress if kind == "compress" else decompress

            def _codec_step(t: pa.Table, _fn=fn, _codec=codec,
                            _col=col) -> pa.Table:
                arr = t[_col]
                if isinstance(arr, pa.ChunkedArray):
                    arr = arr.combine_chunks()
                if pa.types.is_string(arr.type) or \
                        pa.types.is_large_string(arr.type):
                    arr = arr.cast(pa.binary())
                return t.set_column(t.schema.get_field_index(_col), _col,
                                    _fn(arr, _codec))

            return lambda ds: ds.map_batches(_codec_step,
                                             batch_format="pyarrow")
        if op == "python":
            # per-batch Python UDF (operators/python.cpp — venv+Arrow-IPC
            # subprocess there, trivially native here: the code runs over
            # a pandas DataFrame named `df`). Optional leading
            # num_cpus=/concurrency= knobs are the engine's placement
            # analog of local/remote (pipeline.hpp:123-128): explicit
            # per-stage resources + an actor pool when concurrency is
            # given (code compiled ONCE per actor in __init__).
            rest = rest.strip()
            opts: dict = {}
            m = re.match(
                r"^((?:(?:num_cpus|concurrency)=\S+\s+)+)", rest)
            if m:
                for kv in m.group(1).split():
                    k, _, v = kv.partition("=")
                    opts[k] = float(v) if k == "num_cpus" else int(v)
                rest = rest[m.end():]
            code_src = rest.strip().strip('"')

            class _PyUDF:
                def __init__(self, src: str = code_src):
                    self._code = compile(src, "<python-op>", "exec")

                def __call__(self, df):
                    ns = {"df": df}
                    exec(self._code, ns)
                    return ns["df"]

            if opts:
                kwargs = {"batch_format": "pandas",
                          "concurrency": int(opts.get("concurrency", 2))}
                if "num_cpus" in opts:
                    kwargs["num_cpus"] = opts["num_cpus"]
                return lambda ds: ds.map_batches(_PyUDF, **kwargs)
            udf = _PyUDF()
            return lambda ds: ds.map_batches(udf, batch_format="pandas")
        raise ValueError(f"unknown operator {op!r}")

    @staticmethod
    def _compile_format_op(op: str, rest: str):
        """``read_<fmt>`` / ``write_<fmt>`` in pipeline text (reference
        ``web/docs/tql2/operators/read_*.mdx`` / ``write_*.mdx``):
        ``read_*`` parses a string column (default ``line``) into event
        columns and REPLACES the event, ``write_*`` prints events into a
        single ``line`` column — the in-pipeline duals of the ``from``/
        ``to`` dispatch. Options are space-separated ``key=value``
        (``col=``, ``columns=a,b,c``, ``delimiter=``, ``header=``,
        ``pattern=`` for grok). Formats whose structure lives at file
        scope (parquet/feather/pcap/zeek full logs) stay with ``from``;
        this family covers line-record formats."""
        import shlex

        # shlex keeps quoted values whole: pattern="%{WORD:u} %{NUMBER:n}"
        # and delimiter=" " must survive tokenization intact
        opts: dict[str, str] = {}
        pos: list[str] = []
        for p in shlex.split(rest):
            k, eq, v = p.partition("=")
            if eq:
                opts[k.strip()] = v
            else:
                pos.append(p)
        kind, _, fmt = op.partition("_")
        fmt = {"json": "ndjson"}.get(fmt, fmt)
        col = opts.get("col", "line")
        from tenzir_ray.functions import parsing as _pf
        from tenzir_ray.sources import formats as _fmt
        from tenzir_ray.sources import printers as _pr

        def _struct_to_table(mk_struct):
            """string col → struct parser, struct fields become the
            event columns (parse replaces the stream, as in read_*)."""
            def step(t: pa.Table) -> pa.Table:
                s = mk_struct(t[col])
                if isinstance(s, pa.ChunkedArray):
                    s = s.combine_chunks()
                return pa.table(
                    {f.name: s.field(i)
                     for i, f in enumerate(s.type)}) if len(s.type) \
                    else pa.table({col: t[col]})
            return lambda ds: ds.map_batches(step, batch_format="pyarrow")

        if kind == "read":
            if fmt == "ndjson":
                return lambda ds: _fmt._parse_ndjson_staged(ds, col=col)
            if fmt == "lines":
                return lambda ds: ds
            if fmt in ("csv", "tsv", "ssv", "xsv"):
                columns = [c for c in opts.get("columns", "").split(",")
                           if c]
                if not columns:
                    raise ValueError(
                        f"{op}: columns=a,b,c is required (a byte-stream "
                        "header does not exist at column scope)")
                delim = {"csv": ",", "tsv": "\t", "ssv": " "}.get(
                    fmt, opts.get("delimiter", ","))
                if fmt == "xsv" and "delimiter" not in opts:
                    raise ValueError("read_xsv: delimiter= is required")

                def csv_step(t: pa.Table, _cols=tuple(columns),
                             _d=delim) -> pa.Table:
                    # stdlib csv for RFC-4180 quoting/escaping (the
                    # write_csv dual quotes strings); the vectorized
                    # no-quote splitter stays on parse_csv (field
                    # function) and the Arrow reader owns `from *.csv`
                    import csv as _csv
                    import io as _io

                    vals = t[col].to_pylist()
                    # a decompress_* step upstream leaves binary values
                    text = "\n".join(
                        v.decode() if isinstance(v, bytes) else v
                        for v in vals if v is not None)
                    out: dict[str, list] = {c: [] for c in _cols}
                    for rec in _csv.reader(_io.StringIO(text),
                                           delimiter=_d):
                        for i, c in enumerate(_cols):
                            out[c].append(rec[i] if i < len(rec)
                                          else None)
                    return pa.table(
                        {c: pa.array(v, pa.string())
                         for c, v in out.items()})

                return lambda ds: ds.map_batches(csv_step,
                                                 batch_format="pyarrow")
            if fmt == "yaml":
                return _struct_to_table(_pf.parse_yaml_col)
            if fmt == "grok":
                pat = opts.get("pattern") or (pos[-1] if pos else "")
                if not pat:
                    raise ValueError("read_grok: pattern= is required")
                return lambda ds: ds.map_batches(
                    lambda t: _fmt.parse_grok_batch(t, pat, col=col),
                    batch_format="pyarrow")
            batch_parsers = {
                "kv": _fmt.parse_kv_batch,
                "syslog": _fmt.parse_syslog_batch,
                "cef": _fmt.parse_cef_batch,
                "leef": _fmt.parse_leef_batch,
            }
            if fmt in batch_parsers:
                fn = batch_parsers[fmt]
                return lambda ds: ds.map_batches(
                    lambda t: fn(t, col=col), batch_format="pyarrow")
            raise ValueError(f"{op}: unsupported read format {fmt!r}")

        # ---- write_* → a single `line` string column
        import functools as _ft

        if fmt == "yaml":
            def yaml_step(t: pa.Table) -> pa.Table:
                s = pa.StructArray.from_arrays(
                    [t[c].combine_chunks() if
                     isinstance(t[c], pa.ChunkedArray) else t[c]
                     for c in t.column_names],
                    names=t.column_names)
                return pa.table({"line": _pf.print_yaml_col(s)})
            return lambda ds: ds.map_batches(yaml_step,
                                             batch_format="pyarrow")
        if opts.get("header", "false") == "true":
            # a header is a ONCE-per-stream artifact; this operator runs
            # per BLOCK, which would interleave a header per block into
            # the line stream. The CLI `write csv <path>` sink emits it
            # host-side when assembling the file.
            raise ValueError(
                f"{op}: header=true is a sink-level concern "
                "(once per stream, not per block) — use the CLI "
                "`write csv <path>` which emits it host-side")
        printers = {
            "ndjson": _pr.print_ndjson_batch,
            "lines": _pr.print_lines_batch,
            "tql": _ft.partial(
                _pr.print_tql_batch,
                strip_null_fields=(
                    opts.get("strip_null_fields",
                             opts.get("strip", "false")) == "true")),
            "kv": _pr.print_kv_batch,
            "syslog": _pr.print_syslog_batch,
            "cef": _pr.print_cef_batch,
            "leef": _pr.print_leef_batch,
            "zeek_tsv": _pr.print_zeek_tsv,
            "csv": _ft.partial(
                _pr.print_csv_batch,
                delimiter=opts.get("delimiter", ",")),
            "tsv": _ft.partial(_pr.print_csv_batch, delimiter="\t"),
            "ssv": _ft.partial(_pr.print_csv_batch, delimiter=" "),
            "xsv": _ft.partial(
                _pr.print_csv_batch,
                delimiter=opts.get("delimiter", ",")),
        }
        if fmt not in printers:
            raise ValueError(f"{op}: unsupported write format {fmt!r}")
        fn = printers[fmt]
        return lambda ds: ds.map_batches(lambda t: fn(t),
                                         batch_format="pyarrow")

    def run(self, ds: Dataset | None = None) -> Dataset:
        if ds is None:
            ds = self.open_source()
        for step in self.steps:
            ds = step(ds)
        return ds


def run_pipeline(text: str, ds: Dataset) -> Dataset:
    return Pipeline.parse(text).run(ds)
