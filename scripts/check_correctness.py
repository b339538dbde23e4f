"""Local stand-in for the driver's correctness gate: run every queries()
entry at a given sf, compare with oracle_sql() via DuckDB (row count,
column names, order-insensitive values)."""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object and len(df) and isinstance(df[c].iloc[0], (list, np.ndarray)):
            df[c] = df[c].map(lambda v: tuple(np.asarray(v).tolist()))
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(name: str, got: pd.DataFrame, want: pd.DataFrame) -> str:
    if len(got) != len(want):
        return f"ROWS {len(got)} != {len(want)}"
    if sorted(got.columns) != sorted(want.columns):
        return f"COLS {sorted(got.columns)} != {sorted(want.columns)}"
    g, w = canon(got), canon(want)
    for c in g.columns:
        gv, wv = g[c], w[c]
        if np.issubdtype(gv.dtype, np.floating) or np.issubdtype(wv.dtype, np.floating):
            ok = np.allclose(
                gv.astype(float).fillna(-9e99), wv.astype(float).fillna(-9e99),
                rtol=1e-9, atol=1e-9,
            )
        else:
            try:
                ok = gv.astype(str).equals(wv.astype(str))
            except Exception:
                ok = list(gv) == list(wv)
        if not ok:
            bad = (gv.astype(str) != wv.astype(str))
            i = int(np.argmax(bad.to_numpy())) if bad.any() else 0
            return f"VALUES col={c} row{i}: {gv.iloc[i]!r} != {wv.iloc[i]!r}"
    return "OK"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:] or None
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as m

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, sql = m.queries(), m.oracle_sql()
    fails = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"{name:22s} ERROR {type(e).__name__}: {e}")
            fails += 1
            continue
        if name not in sql:
            print(f"{name:22s} rows-only: {len(got)} rows, cols={list(got.columns)[:6]}")
            continue
        want = con.sql(sql[name]).df()
        v = compare(name, got, want)
        print(f"{name:22s} {v}")
        if v != "OK":
            fails += 1
    ray.shutdown()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
