"""Flow control, shell, rate control, and ordered-op tests."""

import time

import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data as rd

import tenzir_ray.stages as ops


def _items(n=100):
    return rd.from_items([{"i": i, "s": f"row-{i}"} for i in range(n)])


def test_shell_lines_grep(ray_session):
    ds = rd.from_items([{"line": f"ln {i}"} for i in range(50)])
    out = ops.shell(ds, "grep '4'", format="lines")
    got = sorted(r["line"] for r in out.take_all())
    want = sorted(f"ln {i}" for i in range(50) if "4" in str(i))
    assert got == want


def test_shell_ndjson_passthrough(ray_session):
    ds = _items(20)
    out = ops.shell(ds, "cat", format="ndjson")
    got = sorted(r["i"] for r in out.take_all())
    assert got == list(range(20))


def test_shell_error_raises(ray_session):
    ds = _items(5)
    with pytest.raises(Exception):
        ops.shell(ds, "no_such_command_xyz", format="ndjson").count()


def test_fork_two_branches(ray_session):
    ds = _items(100)
    a, b = ops.fork(
        ds,
        lambda d: ops.where(d, lambda t: pc.less(t["i"], 10)),
        lambda d: ops.where(d, lambda t: pc.greater_equal(t["i"], 90)),
    )
    assert a.count() == 10 and b.count() == 10


def test_if_routes_and_merges(ray_session):
    ds = _items(100)
    out = ops.if_(
        ds,
        lambda t: pc.less(t["i"], 50),
        then=lambda d: ops.set_(d, tag=lambda t: pa.array(["lo"] * t.num_rows)),
        else_=lambda d: ops.set_(d, tag=lambda t: pa.array(["hi"] * t.num_rows)),
    )
    rows = out.take_all()
    assert len(rows) == 100
    assert all((r["tag"] == "lo") == (r["i"] < 50) for r in rows)


def test_throttle_caps_rate(ray_session):
    ds = _items(200)
    t0 = time.monotonic()
    ops.throttle(ds, events_per_s=1000).count()
    assert time.monotonic() - t0 >= 0.15  # 200 rows at 1k/s ≥ 0.2s nominal


def test_assert_throughput_passes_when_fast(ray_session):
    ds = _items(1000)
    assert ops.assert_throughput(ds, min_events_per_s=1.0).count() == 1000


def test_sample_adaptive_rate(ray_session):
    ds = _items(1000)
    out = ops.sample_adaptive(ds, target_per_window=100, window_events=1000,
                              id_col="i")
    got = out.count()
    assert got == 100  # every 10th id


def test_tail_streaming(ray_session):
    ds = rd.from_items([{"i": i} for i in range(1000)]).repartition(20)
    ds = ds.sort("i")
    got = sorted(r["i"] for r in ops.tail(ds, 7).take_all())
    assert got == list(range(993, 1000))


def test_slice_limit_pushdown(ray_session):
    ds = rd.from_items([{"i": i} for i in range(1000)]).repartition(10).sort("i")
    got = sorted(r["i"] for r in ops.slice_(ds, 100, 110).take_all())
    assert got == list(range(100, 110))


def test_enumerate_public_api(ray_session):
    ds = rd.from_items([{"i": i} for i in range(257)]).repartition(5).sort("i")
    out = ops.enumerate_(ds, "pos")
    rows = out.take_all()
    assert sorted(r["pos"] for r in rows) == list(range(257))
    assert all(r["pos"] == r["i"] for r in rows)


def test_new_aggregations(ray_session):
    import numpy as np

    vals = [float(v) for v in range(1, 101)]
    ds = rd.from_items([{"g": i % 2, "v": v, "i": i}
                        for i, v in enumerate(vals)])
    out = ops.summarize(
        ds, "g", order_by=["i"],
        q=("quantile", "v", 0.5),
        var=("variance", "v"),
        first=("once", "v"),
        vc=("value_counts", "g"),
        n="count",
    ).take_all()
    by_g = {r["g"]: r for r in out}
    g0 = [v for i, v in enumerate(vals) if i % 2 == 0]
    assert by_g[0]["q"] == pytest.approx(np.quantile(g0, 0.5))
    assert by_g[0]["var"] == pytest.approx(np.var(g0, ddof=1))
    assert by_g[0]["first"] == 1.0
    assert by_g[0]["vc"] == [{"value": 0, "count": 50}]
    assert by_g[0]["n"] == 50
