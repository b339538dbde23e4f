"""Tenzir operator-parity layer over ray.data.Dataset (SURVEY.md §2)."""

from tenzir_ray.stages.ops import (
    batch,
    deduplicate,
    drop,
    enrich,
    enumerate_,
    flatten,
    head,
    measure,
    rare,
    rename,
    repeat,
    reverse,
    sample,
    select,
    semi_join,
    set_,
    slice_,
    sort,
    summarize,
    tail,
    taste,
    timeshift,
    top,
    unflatten,
    unroll,
    where,
)

__all__ = [
    "where", "select", "drop", "rename", "set_", "summarize", "sort",
    "head", "tail", "slice_", "deduplicate", "top", "rare", "enumerate_",
    "unroll", "flatten", "unflatten", "enrich", "taste", "timeshift",
    "sample", "reverse", "semi_join", "repeat", "measure", "batch",
]
