"""Mini Sigma rule engine over Datasets."""

import pandas as pd
import pyarrow as pa
import ray.data as rd
import yaml

from tenzir_ray.stages.sigma import compile_rule, sigma_match

RULE_YAML = """
title: Suspicious purchase spike
detection:
  selection:
    event_type: purchase
  high:
    event_type|startswith: pur
  condition: selection and high
"""

WILDCARD_RULE = {
    "detection": {
        "sel": {"path|contains": "admin", "method": ["POST", "PUT"]},
        "condition": "sel",
    }
}


def _tbl():
    return pa.table({
        "event_type": ["purchase", "view", "purchase", "error"],
        "path": ["/x", "/admin/y", "/admin/z", "/admin/q"],
        "method": ["POST", "GET", "PUT", "POST"],
    })


def test_compile_rule_condition_logic():
    rule = yaml.safe_load(RULE_YAML)
    mask = compile_rule(rule)(_tbl())
    assert mask.to_pylist() == [True, False, True, False]


def test_modifiers_and_value_lists():
    mask = compile_rule(WILDCARD_RULE)(_tbl())
    assert mask.to_pylist() == [False, False, True, True]


def test_wildcard_equality():
    rule = {"detection": {"s": {"path": "/admin/*"}, "condition": "s"}}
    mask = compile_rule(rule)(_tbl())
    assert mask.to_pylist() == [False, True, True, True]


def test_one_of_them():
    rule = {
        "detection": {
            "a": {"event_type": "error"},
            "b": {"method": "PUT"},
            "condition": "1 of them",
        }
    }
    mask = compile_rule(rule)(_tbl())
    assert mask.to_pylist() == [False, False, True, True]


def test_not_and_missing_field():
    rule = {
        "detection": {
            "a": {"event_type": "purchase"},
            "b": {"no_such_field": "x"},
            "condition": "a and not b",
        }
    }
    mask = compile_rule(rule)(_tbl())
    assert mask.to_pylist() == [True, False, True, False]


def test_sigma_match_dataset():
    rules = {
        "purchases": yaml.safe_load(RULE_YAML),
        "admin_writes": WILDCARD_RULE,
    }
    ds = rd.from_arrow(_tbl())
    out = sigma_match(ds, rules).to_pandas()
    assert len(out) == 3  # rows 0, 2, 3 match something
    tagged = {tuple(sorted(r)) for r in out["sigma_rules"]}
    assert ("admin_writes", "purchases") in tagged or ("purchases",) in tagged
    row2 = out[out["method"] == "PUT"].iloc[0]
    assert sorted(row2["sigma_rules"]) == ["admin_writes", "purchases"]
