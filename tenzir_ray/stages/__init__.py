"""Tenzir operator-parity layer over ray.data.Dataset (SURVEY.md §2)."""

from tenzir_ray.stages.flow import (
    assert_throughput,
    delay,
    fork,
    if_,
    sample_adaptive,
    shell,
    throttle,
)
from tenzir_ray.stages.chart import (
    chart_area, chart_bar, chart_line, chart_pie, chart_spec,
)
from tenzir_ray.stages.joins import asof_join, hash_join, range_join
from tenzir_ray.stages.pubsub import publish, subscribe
from tenzir_ray.stages.serve import serve
from tenzir_ray.stages.yara import compile_rules as yara_compile_rules
from tenzir_ray.stages.yara import yara_match
from tenzir_ray.stages.window import TimeoutSummarize, summarize_window
from tenzir_ray.stages.ops import (
    assert_,
    batch,
    cache,
    distinct,
    deduplicate,
    drop,
    enrich,
    enumerate_,
    fields_,
    get_attributes,
    flatten,
    head,
    measure,
    rare,
    rename,
    repeat,
    reverse,
    sample,
    move,
    select,
    semi_join,
    semi_join_ds,
    set_,
    set_attributes,
    slice_,
    sort,
    summarize,
    summarize_partial,
    tail,
    taste,
    timeshift,
    top,
    unflatten,
    unroll,
    where,
    yield_,
)

__all__ = [
    "where", "select", "drop", "rename", "set_", "summarize",
    "summarize_partial", "summarize_window", "TimeoutSummarize", "sort",
    "head", "tail", "slice_", "deduplicate", "top", "rare", "enumerate_",
    "unroll", "flatten", "unflatten", "enrich", "taste", "timeshift",
    "sample", "reverse", "semi_join", "semi_join_ds", "asof_join",
    "range_join", "hash_join", "repeat", "measure",
    "batch",
    "assert_", "move", "distinct", "cache", "yield_", "fields_",
    "set_attributes", "get_attributes",
    "shell", "fork", "if_", "delay", "throttle", "assert_throughput",
    "sample_adaptive", "yara_match", "yara_compile_rules", "serve",
    "publish", "subscribe", "chart_line", "chart_area", "chart_bar",
    "chart_pie", "chart_spec",
]
