"""Property-based checks for the round-4 kernels: distributed connected
components vs union-find, Arrow-native top-n-per-key vs a pandas oracle,
and the vectorized YARA condition evaluator vs its scalar twin."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


# --------------------------------------------------------- CC vs union-find

@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(
    st.tuples(st.integers(0, 40), st.integers(0, 40)),
    min_size=1, max_size=60))
def test_connected_components_random_graphs(ray_session, edges):
    import ray.data as rd

    from tenzir_ray.text.graph import cc_seq, connected_components

    t = pa.table({"a": pa.array([e[0] for e in edges], pa.int64()),
                  "b": pa.array([e[1] for e in edges], pa.int64())})
    out = connected_components(rd.from_arrow(t).repartition(3)).to_pandas()
    got = dict(zip(out["node"], out["component"]))
    assert got == cc_seq(edges)


# --------------------------------------------- top-n per key vs pandas

@settings(max_examples=50, deadline=None)
@given(
    st.lists(st.tuples(
        st.sampled_from(["a", "b", "c", None]),     # key (nullable)
        st.integers(-5, 5),                          # order_by
    ), min_size=0, max_size=40),
    st.integers(1, 4),                               # n
    st.booleans(),                                   # descending
)
def test_top_n_table_matches_pandas(rows, n, descending):
    from tenzir_ray.text.curation import _top_n_table

    t = pa.table({
        "k": pa.array([r[0] for r in rows], pa.string()),
        "o": pa.array([r[1] for r in rows], pa.int64()),
        "doc_id": pa.array(range(len(rows)), pa.int64()),
    })
    got = _top_n_table(t, "k", n, "o", descending, "doc_id").to_pandas()
    df = t.to_pandas()
    want = (df.sort_values(["o", "doc_id"],
                           ascending=[not descending, True],
                           kind="mergesort")
            .groupby("k", sort=False, dropna=False).head(n))
    assert sorted(got["doc_id"]) == sorted(want["doc_id"])


# ------------------------------------- yara condition scalar == vector

_COND_LEAF = st.sampled_from(["$a", "$b", "$c", "any of them",
                              "all of them", "2 of them"])


def _cond_tree(depth: int):
    if depth == 0:
        return _COND_LEAF
    sub = _cond_tree(depth - 1)
    return st.one_of(
        _COND_LEAF,
        st.tuples(sub, st.sampled_from(["and", "or"]), sub)
        .map(lambda x: f"({x[0]} {x[1]} {x[2]})"),
        sub.map(lambda s: f"(not {s})"),
    )


@settings(max_examples=80, deadline=None)
@given(_cond_tree(2),
       st.lists(st.tuples(st.booleans(), st.booleans(), st.booleans()),
                min_size=1, max_size=16))
def test_yara_condition_vector_matches_scalar(cond, rows):
    from tenzir_ray.stages.yara import (
        _eval_condition, _eval_condition_vector,
    )

    masks = {
        "a": np.array([r[0] for r in rows]),
        "b": np.array([r[1] for r in rows]),
        "c": np.array([r[2] for r in rows]),
    }
    vec = _eval_condition_vector(cond, masks, len(rows))
    for i in range(len(rows)):
        hits = {k: bool(v[i]) for k, v in masks.items()}
        assert bool(vec[i]) == _eval_condition(cond, hits), (cond, i)


# -------------------------------- tokenizer round-trip with blocks

@settings(max_examples=60, deadline=None)
@given(st.lists(st.sampled_from([
    "where x > 1", "head 3", 'set s = "a|b{c}"',
    "if x > 2 { head 1 } else { head 2 }",
    "fork { where x > 0 | head 1 }",
    "sort x",
]), min_size=1, max_size=5),
    st.sampled_from(["\n", " | "]))
def test_split_ops_roundtrip(segs, joiner):
    from tenzir_ray.pipelines.planner import Pipeline

    text = joiner.join(segs)
    out = Pipeline.split_ops(text)
    # every segment survives whole (braces and quoted '|'/'{' intact)
    assert out == segs
    # and the whole text still parses
    Pipeline.parse(text)
