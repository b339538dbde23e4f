"""asof_join / range_join (stages/joins.py): handcrafted edge cases +
randomized comparison against DuckDB ASOF JOIN / inequality join."""

import datetime

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from tenzir_ray.stages.joins import asof_join, hash_join, range_join


def _df(ds) -> pd.DataFrame:
    return ds.to_pandas()


def _left():
    return rd.from_arrow(pa.table({
        "k": [1, 1, 1, 2, 2, 3],
        "t": [5, 10, 20, 7, 1, 4],
        "payload": ["a", "b", "c", "d", "e", "f"],
    }))


def _right():
    return rd.from_arrow(pa.table({
        "k": [1, 1, 2, 4],
        "t": [5, 15, 6, 1],
        "v": [100, 200, 300, 400],
    }))


def test_asof_backward_basic():
    out = _df(asof_join(
        _left(), _right(), by="k", left_on="t", value_cols=["v"],
        num_groups=4,
    )).sort_values(["k", "t"]).reset_index(drop=True)
    # k=1: t=5 matches right t=5 (inclusive tie), t=10 -> t=5,
    # t=20 -> t=15; k=2: t=7 -> t=6, t=1 -> none; k=3: no right rows
    assert list(out["k"]) == [1, 1, 1, 2, 2, 3]
    assert list(out["t"]) == [5, 10, 20, 1, 7, 4]
    assert list(out["v"].fillna(-1).astype(int)) == [
        100, 100, 200, -1, 300, -1]


def test_asof_inner_and_forward():
    inner = _df(asof_join(
        _left(), _right(), by="k", left_on="t", value_cols=["v"],
        how="inner", num_groups=4))
    assert len(inner) == 4 and inner["v"].notna().all()
    fwd = _df(asof_join(
        _left(), _right(), by="k", left_on="t", value_cols=["v"],
        direction="forward", num_groups=4,
    )).sort_values(["k", "t"]).reset_index(drop=True)
    # k=1: t=5 -> 5 (tie), 10 -> 15, 20 -> none; k=2: 1 -> 6, 7 -> none
    assert list(fwd["v"].fillna(-1).astype(int)) == [
        100, 200, -1, 300, -1, -1]


def test_asof_tolerance():
    out = _df(asof_join(
        _left(), _right(), by="k", left_on="t", value_cols=["v"],
        tolerance=3, num_groups=4,
    )).sort_values(["k", "t"]).reset_index(drop=True)
    # k=1 t=10: nearest earlier right is t=5, dt=5 > 3 -> no match
    assert list(out["v"].fillna(-1).astype(int)) == [
        100, -1, -1, -1, 300, -1]


def test_asof_null_keys_and_times():
    left = rd.from_arrow(pa.table({
        "k": pa.array([1, None, 1], pa.int64()),
        "t": pa.array([10, 10, None], pa.int64()),
        "payload": ["a", "b", "c"],
    }))
    out = _df(asof_join(
        left, _right(), by="k", left_on="t", value_cols=["v"],
        num_groups=4,
    )).sort_values("payload").reset_index(drop=True)
    assert len(out) == 3  # left join keeps null-key/null-time rows
    assert list(out["v"].fillna(-1).astype(int)) == [100, -1, -1]
    inner = _df(asof_join(
        left, _right(), by="k", left_on="t", value_cols=["v"],
        how="inner", num_groups=4))
    assert list(inner["payload"]) == ["a"]


def test_asof_string_keys_and_name_clash():
    left = rd.from_arrow(pa.table({
        "k": ["x", "y", "x"], "t": [3, 3, 1], "v": [7, 8, 9]}))
    right = rd.from_arrow(pa.table({
        "k": ["x", "z"], "t": [2, 2], "v": [50, 60]}))
    out = _df(asof_join(
        left, right, by="k", left_on="t", value_cols=["v"],
        num_groups=4,
    )).sort_values(["k", "t"]).reset_index(drop=True)
    assert "v_r" in out.columns  # clash suffix
    assert list(out["v"]) == [9, 7, 8]
    assert list(out["v_r"].fillna(-1).astype(int)) == [-1, 50, -1]


def test_asof_vs_duckdb_randomized():
    rng = np.random.default_rng(42)
    nl, nr = 4000, 1500
    lk = rng.integers(0, 60, nl)
    lt = rng.integers(0, 10_000, nl)
    rk = rng.integers(0, 70, nr)
    rt = rng.integers(0, 10_000, nr)
    # unique (key, time) on the right — the documented contract
    rdf = pd.DataFrame({"k": rk, "t": rt}).drop_duplicates(["k", "t"])
    rdf["v"] = rng.integers(0, 1_000_000, len(rdf))
    ldf = pd.DataFrame({"k": lk, "t": lt, "i": np.arange(nl)})
    out = _df(asof_join(
        rd.from_pandas(ldf), rd.from_pandas(rdf),
        by="k", left_on="t", value_cols=["v"], num_groups=16,
    )).sort_values("i").reset_index(drop=True)
    con = duckdb.connect()
    con.register("l", ldf)
    con.register("r", rdf)
    want = con.sql(
        "SELECT l.i, r.v FROM l ASOF LEFT JOIN r "
        "ON l.k = r.k AND l.t >= r.t ORDER BY l.i").df()
    got = out["v"].astype("float64").fillna(-1).to_numpy()
    exp = want["v"].astype("float64").fillna(-1).to_numpy()
    assert np.array_equal(got, exp)


def test_asof_timestamp_and_timedelta_tolerance():
    base = datetime.datetime(2024, 1, 1)
    left = rd.from_arrow(pa.table({
        "k": [1, 1],
        "t": pa.array([base + datetime.timedelta(hours=h)
                       for h in (1, 10)], pa.timestamp("us")),
    }))
    right = rd.from_arrow(pa.table({
        "k": [1],
        "t": pa.array([base], pa.timestamp("us")),
        "v": [5],
    }))
    out = _df(asof_join(
        left, right, by="k", left_on="t", value_cols=["v"],
        tolerance=datetime.timedelta(hours=2), num_groups=4))
    assert sorted(out["v"].fillna(-1).astype(int)) == [-1, 5]


def test_range_join_basic_and_overlap():
    left = rd.from_arrow(pa.table({
        "k": [1, 1, 2], "t": [5, 30, 5], "i": [0, 1, 2]}))
    right = rd.from_arrow(pa.table({
        "k": [1, 1, 1, 2],
        "s": [0, 4, 20, 9],
        "e": [10, 6, 25, 12],
        "w": [10, 20, 30, 40],
    }))
    out = _df(range_join(
        left, right, by="k", left_on="t", right_start="s",
        right_end="e", value_cols=["w"], num_groups=4))
    # t=5 in [0,10] and [4,6]; t=30 in none; t=5 (k=2) not in [9,12]
    assert sorted(out["w"]) == [10, 20]
    lout = _df(range_join(
        left, right, by="k", left_on="t", right_start="s",
        right_end="e", value_cols=["w"], how="left", num_groups=4))
    assert len(lout) == 4  # 2 matches + 2 unmatched passthroughs
    assert lout["w"].isna().sum() == 2


def test_range_join_vs_duckdb_randomized():
    rng = np.random.default_rng(7)
    nl, nr = 3000, 800
    ldf = pd.DataFrame({
        "k": rng.integers(0, 40, nl),
        "t": rng.integers(0, 5_000, nl),
        "i": np.arange(nl),
    })
    s = rng.integers(0, 5_000, nr)
    rdf = pd.DataFrame({
        "k": rng.integers(0, 45, nr),
        "s": s,
        "e": s + rng.integers(0, 400, nr),
        "w": rng.integers(0, 10_000, nr),
    })
    out = _df(range_join(
        rd.from_pandas(ldf), rd.from_pandas(rdf),
        by="k", left_on="t", right_start="s", right_end="e",
        value_cols=["w"], num_groups=16))
    con = duckdb.connect()
    con.register("l", ldf)
    con.register("r", rdf)
    want = con.sql(
        "SELECT l.i, r.w FROM l JOIN r ON l.k = r.k "
        "AND l.t BETWEEN r.s AND r.e").df()
    got = out[["i", "w"]].sort_values(["i", "w"]).reset_index(drop=True)
    exp = want.sort_values(["i", "w"]).reset_index(drop=True)
    assert len(got) == len(exp)
    assert np.array_equal(got["i"].to_numpy(), exp["i"].to_numpy())
    assert np.array_equal(
        got["w"].astype(np.int64).to_numpy(),
        exp["w"].astype(np.int64).to_numpy())


def test_range_join_empty_right_and_null_end():
    left = rd.from_arrow(pa.table({"k": [1], "t": [5], "i": [0]}))
    empty = rd.from_arrow(pa.table({
        "k": pa.array([], pa.int64()), "s": pa.array([], pa.int64()),
        "e": pa.array([], pa.int64()), "w": pa.array([], pa.int64())}))
    out = _df(range_join(
        left, empty, by="k", left_on="t", right_start="s",
        right_end="e", value_cols=["w"], how="left", num_groups=4))
    assert len(out) == 1 and out["w"].isna().all()
    nullend = rd.from_arrow(pa.table({
        "k": [1, 1], "s": [0, 0],
        "e": pa.array([None, 10], pa.int64()), "w": [1, 2]}))
    out2 = _df(range_join(
        left, nullend, by="k", left_on="t", right_start="s",
        right_end="e", value_cols=["w"], num_groups=4))
    assert list(out2["w"]) == [2]  # null-end interval dropped


def test_joins_from_pipeline_text(tmp_path):
    import pyarrow.parquet as pq

    from tenzir_ray.pipelines import Pipeline

    right = pa.table({
        "k": [1, 1, 2], "t": [5, 15, 6],
        "s": [5, 15, 6], "e": [9, 18, 7],
        "v": [100, 200, 300]})
    path = tmp_path / "right.parquet"
    pq.write_table(right, path)
    left = rd.from_arrow(pa.table({
        "k": [1, 1, 2, 3], "t": [6, 16, 6, 1], "i": [0, 1, 2, 3]}))

    p = Pipeline.parse(
        f"asof_join table={path}, key=k, on=t, value=v")
    out = _df(p.run(left)).sort_values("i")
    assert list(out["v"].fillna(-1).astype(int)) == [100, 200, 300, -1]

    p = Pipeline.parse(
        f"asof_join table={path}, key=k, on=t, value=v, "
        "direction=forward, tolerance=60, how=inner")
    out = _df(p.run(left)).sort_values("i")
    assert list(out["v"].astype(int)) == [200, 300]

    with pytest.raises(ValueError, match="missing required operand"):
        Pipeline.parse(f"range_join table={path}, key=k, on=t, value=v")
    with pytest.raises(ValueError, match="bad direction"):
        Pipeline.parse(
            f"asof_join table={path}, key=k, on=t, value=v, direction=up")

    p = Pipeline.parse(
        f"range_join table={path}, key=k, on=t, start=s, end=e, value=v")
    out = _df(p.run(left)).sort_values("i")
    assert list(out["v"].astype(int)) == [100, 200, 300]


def test_asof_duration_tolerance_on_int_column_raises():
    with pytest.raises((Exception,), match="raw column units"):
        _df(asof_join(
            _left(), _right(), by="k", left_on="t", value_cols=["v"],
            tolerance=datetime.timedelta(seconds=5), num_groups=4))


def test_asof_ties_max_min_single_exchange():
    left = rd.from_arrow(pa.table({"k": [1, 1], "t": [10, 3]}))
    # three right rows share (k=1, t=5); one has a null tie value
    right = rd.from_arrow(pa.table({
        "k": [1, 1, 1, 1],
        "t": [5, 5, 5, 2],
        "v": pa.array([7.0, None, 30.0, 99.0], pa.float64())}))
    mx = _df(asof_join(
        left, right, by="k", left_on="t", value_cols=["v"],
        ties=("max", "v"), num_groups=4)).sort_values("t")
    assert list(mx["v"]) == [99.0, 30.0]  # t=3 -> t=2 (v=99); t=10 -> max of the t=5 ties
    mn = _df(asof_join(
        left, right, by="k", left_on="t", value_cols=["v"],
        ties=("min", "v"), num_groups=4)).sort_values("t")
    assert list(mn["v"]) == [99.0, 7.0]  # nulls lose for min too
    with pytest.raises(ValueError, match="ties"):
        asof_join(left, right, by="k", left_on="t", value_cols=["v"],
                  ties=("sum", "v"), num_groups=4)


def test_hash_join_basic_left_and_nulls():
    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 2, None], pa.int64()),
        "i": [0, 1, 2, 3]}))
    right = rd.from_arrow(pa.table({
        "k": pa.array([2, 2, 3, None], pa.int64()),
        "v": [10, 20, 30, 40]}))
    inner = _df(hash_join(
        left, right, on="k", value_cols=["v"], num_groups=4))
    # k=2 matches both right rows for each of the two left rows
    assert sorted(zip(inner["i"], inner["v"])) == [
        (1, 10), (1, 20), (2, 10), (2, 20)]
    louter = _df(hash_join(
        left, right, on="k", value_cols=["v"], how="left", num_groups=4))
    assert len(louter) == 6  # 4 pairs + unmatched i=0 and null-key i=3
    assert louter["v"].isna().sum() == 2


def test_hash_join_vs_duckdb_randomized():
    rng = np.random.default_rng(11)
    nl, nr = 3000, 1200
    ldf = pd.DataFrame({
        "k": rng.integers(0, 300, nl), "i": np.arange(nl)})
    rdf = pd.DataFrame({
        "k": rng.integers(0, 350, nr),
        "v": rng.integers(0, 100_000, nr)})
    out = _df(hash_join(
        rd.from_pandas(ldf), rd.from_pandas(rdf),
        on="k", value_cols=["v"], num_groups=16))
    con = duckdb.connect()
    con.register("l", ldf)
    con.register("r", rdf)
    want = con.sql("SELECT l.i, r.v FROM l JOIN r USING (k)").df()
    got = out[["i", "v"]].sort_values(["i", "v"]).reset_index(drop=True)
    exp = want.sort_values(["i", "v"]).reset_index(drop=True)
    assert len(got) == len(exp)
    assert np.array_equal(got["i"].to_numpy(), exp["i"].to_numpy())
    assert np.array_equal(got["v"].to_numpy(np.int64),
                          exp["v"].to_numpy(np.int64))


def test_hash_join_from_pipeline_text(tmp_path):
    import pyarrow.parquet as pq

    from tenzir_ray.pipelines import Pipeline

    pq.write_table(
        pa.table({"ck": [1, 2], "seg": ["A", "B"]}),
        tmp_path / "cust.parquet")
    left = rd.from_arrow(pa.table({"k": [1, 1, 3], "i": [0, 1, 2]}))
    p = Pipeline.parse(
        f"join table={tmp_path}/cust.parquet, key=k, table_key=ck, "
        "value=seg, how=left")
    out = _df(p.run(left)).sort_values("i")
    assert list(out["seg"].fillna("-")) == ["A", "A", "-"]


def test_asof_ties_from_pipeline_text(tmp_path):
    import pyarrow.parquet as pq

    from tenzir_ray.pipelines import Pipeline

    pq.write_table(pa.table({
        "k": [1, 1], "t": [5, 5], "v": [7.0, 30.0]}),
        tmp_path / "r.parquet")
    left = rd.from_arrow(pa.table({"k": [1], "t": [9]}))
    p = Pipeline.parse(
        f"asof_join table={tmp_path}/r.parquet, key=k, on=t, "
        "value=v, ties=max:v")
    assert list(_df(p.run(left))["v"]) == [30.0]


@pytest.mark.parametrize("seed", [3, 17, 91])
def test_joins_with_nulls_vs_duckdb(seed):
    rng = np.random.default_rng(seed)
    nl, nr = 800, 400

    def _null_mask(n, p):
        return rng.random(n) < p

    lk = rng.integers(0, 25, nl).astype("float64")
    lk[_null_mask(nl, 0.1)] = np.nan
    lt = rng.integers(0, 1000, nl).astype("float64")
    lt[_null_mask(nl, 0.1)] = np.nan
    ldf = pd.DataFrame({
        "k": pd.array(lk, dtype="Int64"),
        "t": pd.array(lt, dtype="Int64"),
        "i": np.arange(nl)})
    rk = rng.integers(0, 30, nr).astype("float64")
    rk[_null_mask(nr, 0.1)] = np.nan
    rdf = pd.DataFrame({
        "k": pd.array(rk, dtype="Int64"),
        "t": rng.integers(0, 1000, nr),
        "v": rng.integers(0, 10_000, nr)})
    rdf = rdf.drop_duplicates(["k", "t"])  # asof contract

    con = duckdb.connect()
    con.register("l", ldf)
    con.register("r", rdf)

    lds = rd.from_arrow(pa.Table.from_pandas(ldf))
    rds = rd.from_arrow(pa.Table.from_pandas(rdf))
    out = _df(asof_join(
        lds, rds, by="k", left_on="t", value_cols=["v"], num_groups=8,
    )).sort_values("i")
    want = con.sql(
        "SELECT l.i, r.v FROM l ASOF LEFT JOIN r "
        "ON l.k = r.k AND l.t >= r.t ORDER BY l.i").df()
    # DuckDB's ASOF sorts NULL times last, so a NULL l.t matches the
    # key's greatest right time — an implementation artifact; the
    # engine pins SQL comparison semantics (NULL never matches), so
    # compare only non-null-t rows and assert the engine's nulls
    tnull = ldf["t"].isna().to_numpy()
    assert out.loc[tnull, "v"].isna().all()
    assert np.array_equal(
        out.loc[~tnull, "v"].astype("float64").fillna(-1).to_numpy(),
        want.loc[~tnull, "v"].astype("float64").fillna(-1).to_numpy())

    hout = _df(hash_join(
        lds, rds, on="k", value_cols=["v"], num_groups=8))
    hwant = con.sql("SELECT l.i, r.v FROM l JOIN r USING (k)").df()
    got = hout[["i", "v"]].sort_values(["i", "v"]).reset_index(drop=True)
    exp = hwant.sort_values(["i", "v"]).reset_index(drop=True)
    assert len(got) == len(exp)
    assert np.array_equal(got["i"].to_numpy(np.int64),
                          exp["i"].to_numpy(np.int64))
    assert np.array_equal(got["v"].to_numpy(np.int64),
                          exp["v"].to_numpy(np.int64))


def test_multi_key_joins_vs_duckdb():
    rng = np.random.default_rng(23)
    nl, nr = 2000, 700
    ldf = pd.DataFrame({
        "a": rng.integers(0, 12, nl),
        "b": rng.choice(["x", "y", "z"], nl),
        "t": rng.integers(0, 2000, nl),
        "i": np.arange(nl)})
    rdf = pd.DataFrame({
        "a": rng.integers(0, 14, nr),
        "b": rng.choice(["x", "y", "w"], nr),
        "t": rng.integers(0, 2000, nr),
        "v": rng.integers(0, 100_000, nr),
    }).drop_duplicates(["a", "b", "t"])
    con = duckdb.connect()
    con.register("l", ldf)
    con.register("r", rdf)
    lds, rds = rd.from_pandas(ldf), rd.from_pandas(rdf)

    out = _df(hash_join(
        lds, rds, on=["a", "b"], value_cols=["v"], num_groups=8))
    want = con.sql("SELECT l.i, r.v FROM l JOIN r USING (a, b)").df()
    got = out[["i", "v"]].sort_values(["i", "v"]).reset_index(drop=True)
    exp = want.sort_values(["i", "v"]).reset_index(drop=True)
    assert len(got) == len(exp)
    assert np.array_equal(got["v"].to_numpy(np.int64),
                          exp["v"].to_numpy(np.int64))
    assert "__ck" not in out.columns

    aout = _df(asof_join(
        lds, rds, by=["a", "b"], left_on="t", value_cols=["v"],
        num_groups=8)).sort_values("i")
    awant = con.sql(
        "SELECT l.i, r.v FROM l ASOF LEFT JOIN r "
        "ON l.a = r.a AND l.b = r.b AND l.t >= r.t ORDER BY l.i").df()
    assert np.array_equal(
        aout["v"].astype("float64").fillna(-1).to_numpy(),
        awant["v"].astype("float64").fillna(-1).to_numpy())
    assert "__ck" not in aout.columns


def test_multi_key_join_from_pipeline_text(tmp_path):
    import pyarrow.parquet as pq

    from tenzir_ray.pipelines import Pipeline

    pq.write_table(pa.table({
        "a": [1, 1], "b": ["x", "y"], "v": [10, 20]}),
        tmp_path / "r.parquet")
    left = rd.from_arrow(pa.table({
        "a": [1, 1, 2], "b": ["x", "y", "x"], "i": [0, 1, 2]}))
    p = Pipeline.parse(
        f'join table={tmp_path}/r.parquet, key="a|b", value=v')
    out = _df(p.run(left)).sort_values("i")
    assert list(out["v"]) == [10, 20]
