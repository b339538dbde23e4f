"""Windowed aggregation (summarize timeout/window flush analog,
operators/summarize.cpp:100-142)."""

import pyarrow as pa
import ray.data as rd

from tenzir_ray.stages.window import TimeoutSummarize, summarize_window


def test_summarize_window_tumbling(ray_session):
    import datetime as dt

    base = dt.datetime(2026, 1, 1)
    rows = [{"ts": base + dt.timedelta(minutes=37 * i), "k": "a" if i % 2 else "b",
             "v": float(i)} for i in range(40)]
    out = summarize_window(
        rd.from_items(rows), "ts", "1h", by="k",
        n="count", s=("sum", "v")).take_all()
    # independent dict-based expectation
    exp = {}
    for r in rows:
        w = r["ts"].replace(minute=0, second=0, microsecond=0)
        slot = exp.setdefault((w, r["k"]), [0, 0.0])
        slot[0] += 1
        slot[1] += r["v"]
    got = {(r["window"], r["k"]): [r["n"], r["s"]] for r in out}
    assert got == exp


def test_timeout_summarize_flushes():
    clock = [0.0]
    ts = TimeoutSummarize(
        "k", {"n": "count", "s": ("sum", "v"), "mn": ("min", "v"),
              "avg": ("mean", "v")},
        created_timeout=10.0, update_timeout=4.0, clock=lambda: clock[0])

    t1 = pa.table({"k": ["a", "a", "b"], "v": [1.0, 2.0, 5.0]})
    assert ts.feed(t1).num_rows == 0
    clock[0] = 3.0
    t2 = pa.table({"k": ["a"], "v": [3.0]})          # refreshes only 'a'
    assert ts.feed(t2).num_rows == 0
    clock[0] = 6.9                     # b idle 6.9s > 4s; a idle 3.9s < 4s
    out = ts.poll()
    assert out.to_pylist() == [{"k": "b", "n": 1, "s": 5.0, "mn": 5.0,
                                "avg": 5.0}]
    clock[0] = 10.5                                   # a created 10.5s ago
    out2 = ts.poll()
    assert out2.to_pylist() == [{"k": "a", "n": 3, "s": 6.0, "mn": 1.0,
                                 "avg": 2.0}]
    assert ts.flush().num_rows == 0


def test_timeout_summarize_flush_drains():
    ts = TimeoutSummarize("k", {"n": "count"}, update_timeout=100.0)
    ts.feed(pa.table({"k": ["x", "y", "x"]}))
    got = sorted(ts.flush().to_pylist(), key=lambda r: r["k"])
    assert got == [{"k": "x", "n": 2}, {"k": "y", "n": 1}]


def test_window_operator_in_tql(ray_session):
    import datetime as dt

    import ray.data as rd

    from tenzir_ray.pipelines import Pipeline

    base = dt.datetime(2026, 3, 1)
    rows = [{"ts": base + dt.timedelta(minutes=50 * i), "k": "a" if i % 2
             else "b", "v": i} for i in range(30)]
    out = Pipeline.parse(
        "window 2h ts n=count(*), s=sum(v) by k").run(
        rd.from_items(rows)).take_all()
    assert sum(r["n"] for r in out) == 30
    assert {r["k"] for r in out} == {"a", "b"}
    assert all(r["window"].minute == 0 and r["window"].hour % 2 == 0
               for r in out)


def test_sliding_window(ray_session):
    """Hopping windows (slide= dividing every=): each event lands in
    every/slide overlapping windows; totals match a per-window filter
    oracle, and the pipeline-text spelling agrees."""
    import datetime

    import pyarrow as pa
    import ray.data as rd

    from tenzir_ray.pipelines.planner import run_pipeline
    from tenzir_ray.stages.window import summarize_window

    base = datetime.datetime(2024, 1, 1)
    rows = [{"ts": base + datetime.timedelta(minutes=m), "v": float(m)}
            for m in range(0, 120, 7)]  # 18 events over 2 h
    t = pa.table({
        "ts": pa.array([r["ts"] for r in rows], pa.timestamp("ns")),
        "v": pa.array([r["v"] for r in rows]),
    })
    ds = rd.from_arrow(t)
    out = summarize_window(ds, "ts", "1h", slide="30m",
                           n="count", sv=("sum", "v")).to_pandas()
    out = out.sort_values("window").reset_index(drop=True)
    # oracle: every 30m start covering ≥1 event, sum over [w, w+1h)
    import pandas as pd
    df = pd.DataFrame(rows)
    want = {}
    for k in range(-1, 5):
        w = base + datetime.timedelta(minutes=30 * k)
        sel = df[(df["ts"] >= w) &
                 (df["ts"] < w + datetime.timedelta(hours=1))]
        if len(sel):
            want[w] = (len(sel), sel["v"].sum())
    assert len(out) == len(want)
    for _, r in out.iterrows():
        w = r["window"].to_pydatetime()
        assert (r["n"], r["sv"]) == want[w]
    # each event counted every/slide = 2 times in total
    assert out["n"].sum() == 2 * len(rows)

    # pipeline text spelling
    out2 = run_pipeline("window 1h slide=30m ts n=count(), sv=sum(v)",
                        ds).to_pandas()
    assert sorted(out2["n"]) == sorted(out["n"])

    # slide must divide every
    import pytest as _pt
    with _pt.raises(ValueError):
        summarize_window(ds, "ts", "1h", slide="25m", n="count")


def test_sliding_window_null_ts_counted_once(ray_session):
    """Review regression: null event times land in the null-window group
    ONCE under slide=, matching tumbling (not K replicas)."""
    import datetime

    import pyarrow as pa
    import ray.data as rd

    from tenzir_ray.stages.window import summarize_window

    base = datetime.datetime(2024, 1, 1)
    t = pa.table({
        "ts": pa.array([base, base, None, None], pa.timestamp("ns")),
        "v": [1.0, 2.0, 10.0, 20.0],
    })
    ds = rd.from_arrow(t)
    out = summarize_window(ds, "ts", "1h", slide="30m",
                           n="count", sv=("sum", "v")).to_pandas()
    nul = out[out["window"].isna()]
    assert len(nul) == 1
    assert int(nul["n"].iloc[0]) == 2 and float(nul["sv"].iloc[0]) == 30.0
    live = out[out["window"].notna()]
    assert int(live["n"].sum()) == 4  # 2 events x K=2 windows
