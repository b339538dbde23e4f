"""Operator parity layer vs duckdb/pandas oracles on the driver testdata."""

import duckdb
import pandas as pd
import pyarrow.compute as pc
import pytest
import ray.data as rd

import tenzir_ray.stages as ops

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def lineitem():
    return rd.read_parquet(f"{SF}/lineitem.parquet")


@pytest.fixture(scope="module")
def events():
    return rd.read_parquet(f"{SF}/events.parquet")


def sql(q: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in ["lineitem", "events", "orders", "customer", "nation", "documents"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con.sql(q).df()


def test_where_select(lineitem):
    out = ops.select(
        ops.where(lineitem, lambda t: pc.greater(t["l_quantity"], 45.0)),
        "l_orderkey", "l_quantity",
    ).to_pandas()
    want = sql("SELECT l_orderkey, l_quantity FROM lineitem WHERE l_quantity > 45")
    assert len(out) == len(want)
    assert sorted(out["l_orderkey"]) == sorted(want["l_orderkey"])


def test_set_and_rename(lineitem):
    ds = ops.set_(lineitem, revenue=lambda t: pc.multiply(
        t["l_extendedprice"], pc.subtract(1.0, t["l_discount"])))
    ds = ops.rename(ds, rev="revenue")
    got = ds.limit(5).to_pandas()
    assert "rev" in got.columns
    r0 = got.iloc[0]
    assert abs(r0["rev"] - r0["l_extendedprice"] * (1 - r0["l_discount"])) < 1e-9


def test_summarize_q1(lineitem):
    out = ops.summarize(
        lineitem,
        ["l_returnflag", "l_linestatus"],
        sum_qty=("sum", "l_quantity"),
        avg_price=("mean", "l_extendedprice"),
        n="count",
    ).to_pandas().sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)
    want = sql("""
        SELECT l_returnflag, l_linestatus, sum(l_quantity) sum_qty,
               avg(l_extendedprice) avg_price, count(*) n
        FROM lineitem GROUP BY 1,2 ORDER BY 1,2""")
    pd.testing.assert_frame_equal(
        out[["l_returnflag", "l_linestatus"]], want[["l_returnflag", "l_linestatus"]])
    assert (abs(out["sum_qty"] - want["sum_qty"]) < 1e-6).all()
    assert (out["n"] == want["n"]).all()


def test_sort_head_tail(events):
    top5 = ops.head(ops.sort(events, "-value"), 5).to_pandas()
    want = sql("SELECT * FROM events ORDER BY value DESC LIMIT 5")
    assert list(top5["event_id"]) == list(want["event_id"])
    t = ops.tail(ops.sort(events, "value"), 3).to_pandas()
    assert list(t["value"]) == list(want["value"].iloc[:3][::-1])


def test_top_rare(events):
    got = ops.top(events, "event_type", 3).to_pandas()
    want = sql("""SELECT event_type, count(*)::BIGINT count FROM events
                  GROUP BY 1 ORDER BY count DESC LIMIT 3""")
    assert list(got["count"]) == list(want["count"])
    got_r = ops.rare(events, "event_type", 2).to_pandas()
    want_r = sql("""SELECT event_type, count(*)::BIGINT count FROM events
                    GROUP BY 1 ORDER BY count ASC LIMIT 2""")
    assert list(got_r["count"]) == list(want_r["count"])


def test_deduplicate(events):
    got = ops.deduplicate(events, "user_id", order_by=["ts", "event_id"]).to_pandas()
    want = sql("""SELECT * FROM events QUALIFY
                  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) = 1""")
    assert len(got) == len(want)
    assert sorted(got["event_id"]) == sorted(want["event_id"])


def test_enumerate_slice(events):
    srt = ops.sort(events, "event_id")
    sl = ops.slice_(srt, 10, 15).to_pandas()
    assert list(sl["event_id"]) == list(range(10, 15))


def test_unroll():
    ds = rd.read_parquet(f"{SF}/embeddings.parquet").limit(10)
    out = ops.unroll(ds, "embedding").to_pandas()
    want = sql(f"""SELECT vec_id, unnest(embedding) e
                   FROM '{SF}/embeddings.parquet' LIMIT 1000""")
    dim = len(out) // 10
    assert len(out) == 10 * dim


def test_flatten_unflatten(events):
    nested = ops.unflatten(
        ops.rename(events, **{"u.id": "user_id", "u.type": "event_type"}),
        sep=".",
    )
    assert "u" in nested.schema().names
    flat = ops.flatten(nested).to_pandas()
    assert "u.id" in flat.columns


def test_enrich(events):
    import pyarrow.parquet as pq
    # broadcast small-side lookup: user_id → constant label via dict
    lookup = {i: f"u{i}" for i in range(200)}
    out = ops.enrich(events, lookup, key="user_id", out_field="label").to_pandas()
    hit = out[out["user_id"] < 200]
    assert (hit["label"] == hit["user_id"].map(lambda i: f"u{i}")).all()


def test_reverse(events):
    fwd = ops.sort(events, "event_id").limit(4).to_pandas()
    rev = ops.head(ops.reverse(ops.sort(events, "event_id")), 4).to_pandas()
    assert list(rev["event_id"]) == list(
        sql("SELECT event_id FROM events ORDER BY event_id DESC LIMIT 4")["event_id"])


def test_summarize_extended(events):
    got = ops.summarize(
        events, "event_type",
        users=("count_distinct", "user_id"),
        md=("mode", "user_id"),
        mx=("max", "value"),
    ).to_pandas().sort_values("event_type").reset_index(drop=True)
    want = sql("""SELECT event_type, count(DISTINCT user_id) users,
                  mode(user_id) md, max(value) mx
                  FROM events GROUP BY 1 ORDER BY 1""")
    assert list(got["users"]) == list(want["users"])
    assert list(got["md"]) == list(want["md"])
    assert (abs(got["mx"] - want["mx"]) < 1e-9).all()


def test_summarize_whole_stream_extended(events):
    got = ops.summarize(
        events, None, users=("count_distinct", "user_id"), n="count",
    ).to_pandas()
    want = sql("SELECT count(DISTINCT user_id) users, count(*) n FROM events")
    assert got["users"].iloc[0] == want["users"].iloc[0]
    assert got["n"].iloc[0] == want["n"].iloc[0]


def test_summarize_first_last_collect(events):
    got = ops.summarize(
        events, "event_type", order_by=["ts", "event_id"],
        first_id=("first", "event_id"),
        last_id=("last", "event_id"),
        ids=("collect", "event_id"),
    ).to_pandas()
    want = sql("""SELECT event_type,
                  first(event_id ORDER BY ts, event_id) first_id,
                  last(event_id ORDER BY ts, event_id) last_id,
                  count(*) n
                  FROM events GROUP BY 1""")
    m = got.merge(want, on="event_type")
    assert (m["first_id_x"] == m["first_id_y"]).all()
    assert (m["last_id_x"] == m["last_id_y"]).all()
    assert (m["ids"].map(len) == m["n"]).all()


def test_semi_anti_join(events):
    keep = set(range(0, 50))
    got = ops.semi_join(events, keep, key="user_id").to_pandas()
    want = sql("SELECT * FROM events WHERE user_id < 50")
    assert len(got) == len(want)
    got_a = ops.semi_join(events, keep, key="user_id", anti=True).to_pandas()
    want_a = sql("SELECT * FROM events WHERE user_id >= 50")
    assert len(got_a) == len(want_a)


def test_repeat_measure_batch(events):
    n = events.count()
    assert ops.repeat(events, 3).count() == 3 * n
    m = ops.measure(events).to_pandas()
    assert m["events"].sum() == n and (m["bytes"] > 0).all()
    assert ops.batch(events, 100).count() == n


def test_assert_move_distinct_cache(events):
    import pyarrow.compute as pc2
    kept = ops.assert_(events, lambda t: pc2.less(t["user_id"], 10**9)).count()
    assert kept == events.count()
    mv = ops.move(events, uid="user_id")
    assert "uid" in mv.schema().names and "user_id" not in mv.schema().names
    d = ops.distinct(events, "event_type").to_pandas()
    assert sorted(d["event_type"]) == sorted(
        sql("SELECT DISTINCT event_type FROM events")["event_type"])
    c = ops.cache(ops.where(events, lambda t: pc2.greater(t["value"], 0.0)))
    assert c.count() == c.count()  # second consume hits the materialized set


def test_summarize_partial_matches_hash_path(events):
    """Shuffle-free partial/combine aggregate ≡ the hash-shuffle path
    for algebraic aggregates (count/sum/min/max/mean)."""
    a = ops.summarize(
        events, "event_type", n="count", s=("sum", "user_id"),
        mn=("min", "value"), mx=("max", "value"), avg=("mean", "value"),
    ).to_pandas().sort_values("event_type").reset_index(drop=True)
    b = ops.summarize_partial(
        events, "event_type", n="count", s=("sum", "user_id"),
        mn=("min", "value"), mx=("max", "value"), avg=("mean", "value"),
    ).to_pandas().sort_values("event_type").reset_index(drop=True)
    import pandas.testing as pdt
    pdt.assert_frame_equal(a[sorted(a.columns)], b[sorted(b.columns)],
                           check_dtype=False, atol=1e-9)


def test_summarize_partial_rejects_holistic():
    import pytest

    with pytest.raises(ValueError):
        ops.summarize_partial(None, "k", m=("median", "x"))


def test_hll_count_distinct(ray_session):
    import numpy as np
    import ray.data as rd

    from tenzir_ray.stages.sketch import (
        hll_count_distinct,
        hll_count_distinct_seq,
        hll_estimate,
        hll_registers,
    )

    rng = np.random.default_rng(5)
    vals = rng.integers(0, 20_000, size=60_000)  # ~19k distinct
    exact = len(np.unique(vals))
    ds = rd.from_items([{"v": int(x)} for x in vals]).repartition(8)
    est = hll_count_distinct(ds, "v", p=12)
    # distributed == sequential (deterministic, order-free max-merge)
    assert est == hll_count_distinct_seq(vals, p=12)
    # within ~5 standard errors of exact (1.04/sqrt(4096) ~ 1.6%)
    assert abs(est - exact) / exact < 0.08
    # register fold is order-insensitive and mergeable
    a = hll_registers(vals[:30_000], 12)
    b = hll_registers(vals[30_000:], 12)
    merged = np.maximum(a, b)
    assert int(round(hll_estimate(merged))) == est


def test_yield_and_fields(ray_session):
    """yield (operators/yield.cpp): the record(s) at a path become the
    new events, with [] flattening lists; fields (operators/fields.cpp):
    one event per input field."""
    import pyarrow as pa
    import ray.data as rd

    import tenzir_ray.stages as ops
    from tenzir_ray.pipelines.planner import run_pipeline

    t = pa.table({
        "id": [1, 2, 3],
        "dns": pa.array(
            [{"query": "a.com",
              "answers": [{"ip": "1.1.1.1", "ttl": 60},
                          {"ip": "2.2.2.2", "ttl": 30}]},
             {"query": "b.com", "answers": []},
             None],
            pa.struct([
                ("query", pa.string()),
                ("answers", pa.list_(pa.struct([("ip", pa.string()),
                                                ("ttl", pa.int64())]))),
            ])),
    })
    ds = rd.from_arrow(t)

    # yield a struct path: its fields become the event columns
    out = ops.yield_(ds, "dns").to_pandas()
    assert list(out["query"]) == ["a.com", "b.com"]  # null row vanished

    # yield a list path with []: one event per element
    out = ops.yield_(ds, "dns.answers[]").to_pandas()
    assert list(out["ip"]) == ["1.1.1.1", "2.2.2.2"]
    assert list(out["ttl"]) == [60, 30]

    # scalar leaf keeps the last segment as the column name
    out = ops.yield_(ds, "dns.query").to_pandas()
    assert list(out["query"]) == ["a.com", "b.com"]

    # pipeline text + fields introspection
    out = run_pipeline("yield dns.answers[] | sort ttl", ds).to_pandas()
    assert list(out["ttl"]) == [30, 60]
    f = run_pipeline("fields", ds).to_pandas()
    assert set(f["field"]) == {"id", "dns"}
    assert "struct" in f.set_index("field")["type"]["dns"]


def test_set_get_attributes(ray_session):
    """Schema-metadata attributes (set_attributes/get_attributes.cpp):
    stamped on every block's schema, readable back as events, and they
    survive a parquet round-trip."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    import tenzir_ray.stages as ops
    from tenzir_ray.pipelines.planner import run_pipeline

    ds = rd.from_arrow(pa.table({"x": [1, 2, 3]}))
    tagged = ops.set_attributes(ds, index="hash", tier="hot")
    got = ops.get_attributes(tagged).to_pandas()
    assert dict(zip(got["key"], got["value"])) == \
        {"index": "hash", "tier": "hot"}

    # pipeline text spelling (reference dashes)
    out = run_pipeline("set-attributes index=hash | get-attributes",
                       ds).to_pandas()
    assert list(out["key"]) == ["index"]

    # untagged stream → empty attribute set
    assert ops.get_attributes(ds).count() == 0


def test_yield_mid_path_list(ray_session):
    """`[]` mid-path composes: conns[].flows[] explodes both levels."""
    import pyarrow as pa
    import ray.data as rd

    import tenzir_ray.stages as ops

    flow = pa.struct([("bytes", pa.int64())])
    conn = pa.struct([("cid", pa.int64()), ("flows", pa.list_(flow))])
    t = pa.table({
        "host": ["h1", "h2"],
        "conns": pa.array(
            [[{"cid": 1, "flows": [{"bytes": 10}, {"bytes": 20}]},
              {"cid": 2, "flows": [{"bytes": 30}]}],
             []],
            pa.list_(conn)),
    })
    out = ops.yield_(rd.from_arrow(t), "conns[].flows[]").to_pandas()
    assert sorted(out["bytes"]) == [10, 20, 30]
    # mid-path flatten then struct descend without trailing []
    out2 = ops.yield_(rd.from_arrow(t), "conns[].cid").to_pandas()
    assert sorted(out2["cid"]) == [1, 2]
