"""Package system (libtenzir/src/package.cpp:274-302,
include/tenzir/package.hpp:61-196): YAML bundles of pipelines +
contexts with typed inputs, install-time substitution, and
restart-on-error."""

import pytest

from tenzir_ray.pipelines import Package

SF = "/root/testdata/sf0.001"

PKG_YAML = f"""
id: demo-pkg
name: Demo package
author: tests
description: suspicious-event triage bundle
inputs:
  threshold:
    type: string
    description: quantity cutoff
    default: "45"
  table:
    type: string
    default: "{SF}/lineitem.parquet"
pipelines:
  big-items:
    name: Big items
    definition: |
      from {{{{ inputs.table }}}}
      where l_quantity > {{{{ inputs.threshold }}}}
      select l_orderkey, l_quantity
    restart-on-error: false
  flaky:
    definition: |
      head 3
    restart-on-error: 50ms
  disabled-one:
    definition: |
      head 1
    disabled: true
contexts:
  watchlist:
    type: lookup-table
    description: known-bad ids
examples:
  - name: usage
    description: run big-items
    definition: "package run big-items"
"""


@pytest.fixture(scope="module")
def pkg(tmp_path_factory):
    p = tmp_path_factory.mktemp("pkg") / "package.yaml"
    p.write_text(PKG_YAML)
    return Package.load(str(p))


def test_parse_shape(pkg):
    assert pkg.id == "demo-pkg" and pkg.name == "Demo package"
    assert set(pkg.inputs) == {"threshold", "table"}
    assert set(pkg.pipelines) == {"big-items", "flaky", "disabled-one"}
    assert pkg.pipelines["flaky"].restart_on_error == pytest.approx(0.05)
    assert pkg.pipelines["big-items"].restart_on_error is None
    assert pkg.contexts["watchlist"].type == "lookup-table"
    assert len(pkg.examples) == 1


def test_install_and_run(pkg, ray_session):
    inst = pkg.install()
    assert sorted(inst.pipeline_specs) == ["big-items", "flaky"]
    assert "disabled-one" not in inst.pipeline_specs
    assert inst.context_names == ["watchlist"]
    got = inst.run("big-items").to_pandas()
    assert (got["l_quantity"] > 45).all()
    # input override re-parameterizes the compiled definition
    inst2 = pkg.install(inputs={"threshold": "49"})
    got2 = inst2.run("big-items").to_pandas()
    assert (got2["l_quantity"] > 49).all()
    assert len(got2) < len(got)
    info = inst.info()
    assert info["id"] == "demo-pkg" and "big-items" in info["pipelines"]


def test_missing_input_and_unknown_override(pkg):
    import copy

    p2 = copy.deepcopy(pkg)
    p2.inputs["threshold"].default = None
    with pytest.raises(ValueError, match="has no value"):
        p2.install()
    with pytest.raises(ValueError, match="unknown input override"):
        pkg.install(inputs={"nope": "1"})


def test_undeclared_input_reference(tmp_path):
    y = tmp_path / "bad.yaml"
    y.write_text(
        "id: x\nname: x\npipelines:\n  p:\n    definition: "
        '"from {{ inputs.missing }}"\n')
    with pytest.raises(ValueError, match="undeclared input"):
        Package.load(str(y)).install()


def test_restart_on_error_retries(pkg, ray_session, monkeypatch):
    """A failing packaged pipeline with restart-on-error retries on the
    configured delay, then surfaces the error."""
    import tenzir_ray.pipelines.package as pk

    inst = pkg.install()
    calls = {"n": 0}

    class Boom:
        def run(self, ds=None):
            calls["n"] += 1
            raise RuntimeError("boom")

    inst.compiled["flaky"] = Boom()
    slept = []
    monkeypatch.setattr(pk.time, "sleep", lambda s: slept.append(s))
    with pytest.raises(RuntimeError, match="boom"):
        inst.run("flaky", max_restarts=2)
    assert calls["n"] == 3           # 1 try + 2 restarts
    assert slept == [0.05, 0.05]     # the 50ms delay


def test_restart_duration_spellings():
    from tenzir_ray.pipelines.package import _parse_restart

    assert _parse_restart(True) == 60.0
    assert _parse_restart(False) is None
    assert _parse_restart(None) is None
    assert _parse_restart("2m") == 120.0
    assert _parse_restart("500ms") == 0.5
    assert _parse_restart(7) == 7.0
    with pytest.raises(ValueError):
        _parse_restart(-1)
