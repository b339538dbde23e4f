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


def test_sigma_dir_hot_reload(tmp_path, ray_session):
    """Rule-directory matcher (plugins/sigma rule-dir watch): rules load
    from every yml in the dir, and an edited/added rule file is picked
    up on the next batch without re-creating the stage."""
    import time

    import pyarrow as pa
    import ray.data as rd

    from tenzir_ray.stages.sigma import SigmaDirMatcher, sigma_match_dir

    d = tmp_path / "rules"
    d.mkdir()
    (d / "a.yml").write_text(
        "title: errs\ndetection:\n  sel:\n    event_type: error\n"
        "  condition: sel\n")
    t = pa.table({"event_type": ["error", "click", "purchase"],
                  "v": [1, 2, 3]})

    m = SigmaDirMatcher(str(d))
    out = m(t)
    assert out.column("event_type").to_pylist() == ["error"]
    assert out.column("sigma_rules").to_pylist() == [["errs"]]

    # add a second rule file; mtime scan picks it up on the next call
    time.sleep(0.01)
    (d / "b.yaml").write_text(
        "title: clicks\ndetection:\n  sel:\n    event_type: click\n"
        "  condition: sel\n")
    out = m(t)
    assert sorted(out.column("event_type").to_pylist()) == ["click", "error"]

    # edit the first rule in place (same path, new mtime/content)
    time.sleep(0.01)
    (d / "a.yml").write_text(
        "title: errs\ndetection:\n  sel:\n    event_type: purchase\n"
        "  condition: sel\n")
    out = m(t)
    assert sorted(out.column("event_type").to_pylist()) == \
        ["click", "purchase"]

    # dataset stage + planner `sigma <dir>` dispatch
    ds = rd.from_arrow(t)
    assert sigma_match_dir(ds, str(d)).count() == 2
    from tenzir_ray.pipelines.planner import run_pipeline

    assert run_pipeline(f"sigma {d}", ds).count() == 2


def test_sigma_dir_duplicate_titles_both_compile(tmp_path):
    """Review regression: two rule files sharing a title must BOTH
    match (no silent dict collision)."""
    import pyarrow as pa

    from tenzir_ray.stages.sigma import SigmaDirMatcher

    d = tmp_path / "rules"
    d.mkdir()
    (d / "a.yml").write_text(
        "title: Suspicious\ndetection:\n  sel:\n    event_type: error\n"
        "  condition: sel\n")
    (d / "b.yml").write_text(
        "title: Suspicious\ndetection:\n  sel:\n    event_type: click\n"
        "  condition: sel\n")
    t = pa.table({"event_type": ["error", "click", "view"]})
    out = SigmaDirMatcher(str(d))(t)
    assert sorted(out.column("event_type").to_pylist()) == \
        ["click", "error"]
