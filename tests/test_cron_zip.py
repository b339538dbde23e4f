"""Round-5 tail additions: cron schedules, zip/random functions, and
the openapi introspection source."""

import datetime as dt

import pyarrow as pa
import pytest

from tenzir_ray.pipelines.cron import next_fire, parse_cron

BASE = dt.datetime(2026, 8, 19, 12, 30, 15)  # a Wednesday


def test_cron_every_second():
    assert next_fire(parse_cron("* * * * * *"), BASE) == \
        BASE + dt.timedelta(seconds=1)


def test_cron_step_and_dow_range():
    # every 10th minute Mon-Fri (cron.md's example, seconds pinned to 0)
    got = next_fire(parse_cron("0 */10 * * * MON-FRI"), BASE)
    assert got == dt.datetime(2026, 8, 19, 12, 40, 0)
    # Saturday/Sunday skipped: from Friday 23:59:59 → Monday 00:00
    fri_night = dt.datetime(2026, 8, 21, 23, 59, 59)
    got = next_fire(parse_cron("0 0 0 ? * MON-FRI"), fri_night)
    assert got == dt.datetime(2026, 8, 24, 0, 0, 0)


def test_cron_question_and_nth():
    got = next_fire(parse_cron("0 0 9 ? * MON"), BASE)
    assert got == dt.datetime(2026, 8, 24, 9, 0, 0)
    assert got.weekday() == 0


def test_cron_last_day_of_month():
    got = next_fire(parse_cron("30 5 0 L * ?"), BASE)
    assert got == dt.datetime(2026, 8, 31, 0, 5, 30)
    # February of a leap year
    feb = dt.datetime(2028, 2, 1)
    assert next_fire(parse_cron("0 0 0 L * ?"), feb).day == 29


def test_cron_month_literal_and_rollover():
    got = next_fire(parse_cron("0 0 0 1 JAN *"), BASE)
    assert got == dt.datetime(2027, 1, 1, 0, 0, 0)


def test_cron_wrap_around_range():
    # hour range 22-2 wraps midnight
    spec = parse_cron("0 0 22-2 * * *")
    assert next_fire(spec, BASE).hour == 22
    late = dt.datetime(2026, 8, 19, 23, 30, 0)
    assert next_fire(spec, late) == dt.datetime(2026, 8, 20, 0, 0, 0)


def test_cron_both_day_fields_restricted_fires_on_either():
    # standard quirk: dom=15 OR dow=MON (neither is `?`)
    spec = parse_cron("0 0 0 15 * MON")
    got = next_fire(spec, BASE)  # Wed Aug 19 → Mon Aug 24 < Sep 15
    assert got == dt.datetime(2026, 8, 24, 0, 0, 0)


def test_cron_rejects_bad_specs():
    for bad in ["* * * * *",            # 5 fields
                "* * * * * MON#2",      # nth-weekday unsupported
                "* * * 15W * *",        # nearest-weekday unsupported
                "99 * * * * *",         # out of range
                "* * * * FOO *"]:       # bad literal
        with pytest.raises(ValueError):
            parse_cron(bad)


def test_cron_operator_in_pipeline_text(ray_session):
    import ray.data as rd

    from tenzir_ray.pipelines.planner import run_pipeline

    ds = rd.from_arrow(pa.table({"x": [1, 2, 3]}))
    # fires every second — two rounds ≈ 2 s wall, outputs union
    out = run_pipeline('cron "* * * * * *" rounds=2 { where x > 1 }', ds)
    assert out.count() == 4
    # parse errors surface at plan time, not first run
    with pytest.raises(ValueError):
        run_pipeline('cron "bad expr" { pass }', ds)


def test_zip_lists_semantics():
    from tenzir_ray.functions.lists import zip_lists

    xs = pa.array([[1, 2], [5], None, None, [7, 8, 9]])
    ys = pa.array([[3, 4], None, [6], None, [10]])
    out = zip_lists(xs, ys).to_pylist()
    assert out[0] == [{"left": 1, "right": 3}, {"left": 2, "right": 4}]
    # one-sided null pads with nulls to the longer length
    assert out[1] == [{"left": 5, "right": None}]
    assert out[2] == [{"left": None, "right": 6}]
    assert out[3] is None  # both null → null
    assert out[4] == [{"left": 7, "right": 10},
                      {"left": 8, "right": None},
                      {"left": 9, "right": None}]


def test_zip_and_random_in_expressions():
    from tenzir_ray.pipelines.planner import compile_array_expr

    t = pa.table({"xs": [[1, 2], [5]], "ys": [[3, 4], [6, 7]],
                  "v": [1.0, 2.0]})
    z = compile_array_expr("zip(xs, ys)")(t).to_pylist()
    assert z[1] == [{"left": 5, "right": 6}, {"left": None, "right": 7}]
    r = compile_array_expr("random()")(t)
    assert len(r) == 2 and all(0.0 <= x < 1.0 for x in r.to_pylist())
    # composes with arithmetic and column refs
    rv = compile_array_expr("random() * 0 + v")(t).to_pylist()
    assert rv == [1.0, 2.0]


def test_openapi_source():
    import json

    from tenzir_ray.sources import openapi

    row = openapi()
    spec = json.loads(row["spec"])
    assert spec["openapi"] == "3.0.0"
    assert set(row["paths"]) == {"/events", "/schema", "/ingest"}
    assert "/events" in spec["paths"]


def test_api_operator(ray_session):
    import ray.data as rd

    from tenzir_ray.pipelines.planner import run_pipeline

    ds = rd.from_arrow(pa.table({"x": [1]}))
    rows = run_pipeline('api "/openapi" | select version, paths',
                        ds).take_all()
    assert rows[0]["version"] == "3.0.0"
    v = run_pipeline("api /version", ds).take_all()[0]
    assert v["engine"] == "tenzir_ray"
    with pytest.raises(ValueError):
        run_pipeline("api /nope", ds)


def test_api_operator_files(ray_session, tmp_path):
    import ray.data as rd

    (tmp_path / "a.txt").write_text("x")
    ds = rd.from_arrow(pa.table({"x": [1]}))
    from tenzir_ray.pipelines.planner import run_pipeline

    rows = run_pipeline(f"api files{tmp_path}", ds).take_all()
    assert any(r["name"] == "a.txt" for r in rows)


def test_diagnostics_store_and_operator(ray_session):
    import ray.data as rd

    from tenzir_ray import diagnostics as dg
    from tenzir_ray.functions.lists import zip_lists
    from tenzir_ray.pipelines.planner import run_pipeline

    dg.clear()
    # zip with mismatched lengths emits one warning per batch
    zip_lists(pa.array([[1, 2, 3]]), pa.array([[4]]))
    dg.emit("boom", severity="error", pipeline_id="p1")
    # fire-and-forget appends race the read; poll briefly
    import time as _t

    rows = []
    for _ in range(50):
        rows = dg.diagnostics().take_all()
        if len(rows) >= 2:
            break
        _t.sleep(0.1)
    msgs = {r["severity"] for r in rows}
    assert "warning" in msgs and "error" in msgs
    assert any("mismatching list lengths" in r["message"] for r in rows)
    # severity filter + pipeline-text operator
    ds = rd.from_arrow(pa.table({"x": [1]}))
    errs = run_pipeline("diagnostics error", ds).take_all()
    assert len(errs) == 1 and errs[0]["pipeline_id"] == "p1"
    assert errs[0]["rendered"] == "error: boom"
    dg.clear()
    assert run_pipeline("diagnostics", ds).count() == 0


def test_in_operator_and_ternary_in_pipelines(ray_session):
    import ray.data as rd

    from tenzir_ray.pipelines.planner import Pipeline, run_pipeline

    ds = rd.from_arrow(pa.table({
        "x": [1, 2, 3, 4], "s": ["a", "b", "c", "d"]}))
    out = run_pipeline("where x in [2, 4]", ds).take_all()
    assert sorted(r["x"] for r in out) == [2, 4]
    out = run_pipeline("where s not in ['a', 'd']", ds).take_all()
    assert sorted(r["s"] for r in out) == ["b", "c"]
    out = run_pipeline("set t = 'hi' if x > 2 else 'lo'", ds).take_all()
    assert [r["t"] for r in sorted(out, key=lambda r: r["x"])] == \
        ["lo", "lo", "hi", "hi"]
    # a leading `where … in …` pushes into the scan as an isin filter
    p = Pipeline.parse("from /root/testdata/sf0.001/events.parquet\n"
                       "where event_type in ['click', 'view']")
    _, filt, _ = p.source_plan()
    assert filt is not None and "is_in" in str(filt)
    assert p.run().count() == 398
    # non-literal RHS fails loudly
    with pytest.raises(ValueError):
        run_pipeline("where x in [s]", ds)


def test_cron_star_step_day_field_is_unrestricted():
    # vixie star flag: `*/1` in dom counts as `*` for the
    # either-day-field quirk — fires Mondays only, not every day
    spec = parse_cron("0 0 0 */1 * MON")
    got = next_fire(spec, BASE)  # Wed Aug 19
    assert got == dt.datetime(2026, 8, 24, 0, 0, 0)


def test_scheduled_rounds_zero_rejected():
    from tenzir_ray.pipelines.planner import Pipeline

    for text in ['cron "* * * * * *" rounds=0 { pass }',
                 "every 0s rounds=0 { pass }"]:
        with pytest.raises(ValueError):
            Pipeline.parse(text)


def test_not_in_drops_nulls(ray_session):
    import ray.data as rd

    from tenzir_ray.pipelines.planner import run_pipeline

    ds = rd.from_arrow(pa.table({"s": ["a", "b", None]}))
    # SQL NOT IN semantics: null rows drop from BOTH in and not-in
    kept = run_pipeline("where s not in ['a', 'd']", ds).take_all()
    assert [r["s"] for r in kept] == ["b"]
    kept = run_pipeline("where s in ['a', 'd']", ds).take_all()
    assert [r["s"] for r in kept] == ["a"]


def test_not_in_pushdown_drops_nulls(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from tenzir_ray.pipelines.planner import Pipeline

    p = str(tmp_path / "t.parquet")
    pq.write_table(pa.table({"s": ["a", "b", None]}), p)
    out = Pipeline.parse(f"from {p}\nwhere s not in ['a']").run()
    assert [r["s"] for r in out.take_all()] == ["b"]


def test_zip_lists_masked_null_spans():
    # ListArray whose null slot still spans backing values (from_arrays
    # with a mask): offsets disagree with flatten() — must not misindex
    from tenzir_ray.functions.lists import zip_lists

    m = pa.ListArray.from_arrays(
        pa.array([0, 2, 4], pa.int32()), pa.array([1, 2, 3, 4]),
        mask=pa.array([True, False]))
    out = zip_lists(m, pa.array([[9, 9], [8, 8]])).to_pylist()
    assert out == [[{"left": None, "right": 9}, {"left": None, "right": 9}],
                   [{"left": 3, "right": 8}, {"left": 4, "right": 8}]]


def test_api_unknown_files_prefix_rejected(ray_session):
    import ray.data as rd

    from tenzir_ray.pipelines.planner import run_pipeline

    ds = rd.from_arrow(pa.table({"x": [1]}))
    with pytest.raises(ValueError):
        run_pipeline("api /filesystem", ds)


def test_concatenate_lists():
    from tenzir_ray.functions.lists import concatenate_lists

    xs = pa.array([[1, 2], [5], None, None, []])
    ys = pa.array([[3, 4], None, [6], None, [7]])
    out = concatenate_lists(xs, ys).to_pylist()
    assert out == [[1, 2, 3, 4], [5], [6], None, [7]]
    # in expressions
    from tenzir_ray.pipelines.planner import compile_array_expr

    t = pa.table({"a": [[1], [2]], "b": [[9], []]})
    got = compile_array_expr("concatenate(a, b)")(t).to_pylist()
    assert got == [[1, 9], [2]]
