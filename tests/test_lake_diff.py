"""Lake.diff changefeed suite: net insert/update/delete between two
committed snapshots, checked against an in-test pandas reference built
directly from the raw WAL parquet (independent of both the engine and
tenzir_ray/cdc/oracle.py)."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tenzir_ray.cdc.lake import Lake, TimeTravelHorizonError
from tenzir_ray.cdc.wal import WalSpec, generate_wal, list_epochs

SPEC = WalSpec(
    n_events=4000, n_urls=600, n_epochs=6, seed=13,
    epoch_add_title=3, epoch_widen_lang=4, epoch_rename_text=5,
)


def _wal_frame(wal_dir: str) -> pd.DataFrame:
    """All WAL events, epoch-tagged, rename folded (body→text)."""
    frames = []
    for e, files in list_epochs(wal_dir):
        for f in files:
            t = pq.read_table(f)
            t = t.rename_columns(
                ["text" if n == "body" else n for n in t.column_names]
            )
            df = t.to_pandas()
            df["epoch"] = e
            frames.append(df)
    return pd.concat(frames, ignore_index=True)


def _survivors(events: pd.DataFrame, horizon: int | None) -> pd.DataFrame:
    """Per-url LWW survivor (max (warc_ts, lsn)) over epochs <= horizon."""
    d = events if horizon is None else events[events["epoch"] <= horizon]
    d = d.sort_values(["warc_ts", "lsn"]).groupby("url").tail(1)
    return d.set_index("url")


def _ref_diff(wal_dir: str, frm: int | None, to: int) -> pd.DataFrame:
    events = _wal_frame(wal_dir)
    sa = (_survivors(events, frm) if frm is not None
          else events.iloc[0:0].set_index("url"))
    sb = _survivors(events, to)
    rows = []
    for url, b in sb.iterrows():
        a = sa.loc[url] if url in sa.index else None
        a_live = a is not None and str(a["op"]) != "DELETE"
        b_live = str(b["op"]) != "DELETE"
        if b_live and not a_live:
            change = "insert"
        elif b_live and a_live and (
            (a["warc_ts"], a["lsn"]) != (b["warc_ts"], b["lsn"])
        ):
            change = "update"
        elif not b_live and a_live:
            change = "delete"
        else:
            continue
        rows.append({"url": url, "change": change,
                     "warc_ts": b["warc_ts"], "text": b["text"]})
    return (pd.DataFrame(rows, columns=["url", "change", "warc_ts", "text"])
            .sort_values("url").reset_index(drop=True))


@pytest.fixture(scope="module")
def lake_and_wal(tmp_path_factory):
    root = tmp_path_factory.mktemp("lake_diff")
    wal = str(root / "wal")
    generate_wal(wal, SPEC)
    lake = Lake(str(root / "lake"), partitions=4, salt=2)
    lake.apply_wal(wal)
    return lake, wal


@pytest.mark.parametrize("frm,to", [(2, 5), (3, 4), (None, 4)])
def test_diff_matches_reference(lake_and_wal, frm, to):
    lake, wal = lake_and_wal
    got = (lake.diff(frm, to).to_pandas()
           .sort_values("url").reset_index(drop=True))
    want = _ref_diff(wal, frm, to)
    assert len(got) == len(want)
    assert list(got["url"]) == list(want["url"])
    assert list(got["change"]) == list(want["change"])
    pd.testing.assert_series_equal(
        got["warc_ts"], want["warc_ts"], check_names=False)
    ga = got["text"].where(got["text"].notna(), None)
    wa = want["text"].where(want["text"].notna(), None)
    assert list(ga) == list(wa)
    if frm is not None:
        assert set(got["change"]) >= {"insert", "update"}  # non-trivial
    else:
        assert set(got["change"]) == {"insert"}  # bootstrap feed


def test_diff_empty_window(lake_and_wal):
    lake, _ = lake_and_wal
    assert lake.diff(5, 5).count() == 0


def test_diff_bootstrap_equals_read(lake_and_wal):
    """diff(None) is the all-inserts bootstrap feed: exactly the live
    state, every row an insert."""
    lake, _ = lake_and_wal
    got = lake.diff(None).to_pandas()
    assert set(got["change"]) == {"insert"}
    live = lake.read_table()
    assert sorted(got["url"]) == sorted(live.column("url").to_pylist())


def test_diff_default_to_latest(lake_and_wal):
    lake, _ = lake_and_wal
    a = (lake.diff(2).to_pandas().sort_values("url")
         .reset_index(drop=True))
    b = (lake.diff(2, 5).to_pandas().sort_values("url")
         .reset_index(drop=True))
    assert list(a["url"]) == list(b["url"])
    assert list(a["change"]) == list(b["change"])


def test_diff_column_projection(lake_and_wal):
    """columns= pushes the projection into the scan: output is exactly
    url + requested + change, and the classification (rows + change
    labels) is identical to the unprojected diff."""
    lake, _ = lake_and_wal
    full = (lake.diff(2, 5).to_pandas()
            .sort_values("url").reset_index(drop=True))
    slim = (lake.diff(2, 5, columns=["lang"]).to_pandas()
            .sort_values("url").reset_index(drop=True))
    assert list(slim.columns) == ["url", "lang", "change"]
    assert list(slim["url"]) == list(full["url"])
    assert list(slim["change"]) == list(full["change"])
    la = slim["lang"].where(slim["lang"].notna(), None)
    lb = full["lang"].where(full["lang"].notna(), None)
    assert list(la) == list(lb)
    with pytest.raises(ValueError, match="unknown column"):
        lake.diff(2, 5, columns=["nope"])
    # naming the documented output column is allowed, not an error
    ok = lake.diff(2, 5, columns=["lang", "change"]).schema()
    assert ok.names == ["url", "lang", "change"]


def test_diff_schema_evolution_columns(lake_and_wal):
    """Window spans the widen+rename: output carries the unified to-side
    schema (title present, text not body) plus the change column."""
    lake, _ = lake_and_wal
    t = lake.diff(2, 5).schema()
    names = set(t.names)
    assert "change" in names and "title" in names
    assert "text" in names and "body" not in names
    assert not names & {"lsn", "op", "epoch_rec"}


def test_follow_changes_feed_replays_to_state(tmp_path):
    """Live changefeed contract: epochs landing over time yield diffs
    whose sequential application (insert/update → upsert, delete →
    remove) reconstructs exactly the lake's final live state."""
    import shutil
    import threading
    import time as _t

    wal = str(tmp_path / "wal")
    staging = str(tmp_path / "staging")
    generate_wal(staging, WalSpec(
        n_events=3000, n_urls=400, n_epochs=4, seed=9))
    eps = list_epochs(staging)
    os.makedirs(wal, exist_ok=True)

    def feed():
        for e, files in eps:
            src = os.path.dirname(files[0])
            tmp = os.path.join(wal, ".tmp-" + os.path.basename(src))
            shutil.copytree(src, tmp)
            os.rename(tmp, os.path.join(wal, os.path.basename(src)))
            _t.sleep(0.3)

    t = threading.Thread(target=feed)
    t.start()
    lake = Lake(str(tmp_path / "lake"), partitions=4, salt=1)
    state: dict[str, tuple] = {}
    unset = object()
    first = unset
    for frm, to, ds in lake.follow_changes(
            wal, poll_interval=0.2, idle_rounds=8):
        if first is unset:
            first = frm
        df = ds.to_pandas()
        for r in df.itertuples(index=False):
            if r.change == "delete":
                state.pop(r.url, None)
            else:
                state[r.url] = (r.warc_ts, r.text)
    t.join()
    assert first is None  # fresh lake: first feed is the bootstrap
    assert lake.committed_epochs() == {0, 1, 2, 3}
    live = lake.read_table()
    assert sorted(state) == sorted(live.column("url").to_pylist())
    want = dict(zip(live.column("url").to_pylist(),
                    zip(live.column("warc_ts").to_pandas(),
                        live.column("text").to_pylist())))
    assert state == want


def test_follow_changes_late_sealed_epoch_not_dropped(tmp_path):
    """A lower-numbered epoch sealing AFTER a higher one was committed
    must still have its changes emitted (diff_epochs window semantics —
    an interval diff(from,to) would yield an empty feed and the
    consumer's replica would silently diverge)."""
    import shutil

    wal_src = str(tmp_path / "staging")
    generate_wal(wal_src, WalSpec(
        n_events=3000, n_urls=400, n_epochs=3, seed=11))
    eps = dict(list_epochs(wal_src))
    wal = str(tmp_path / "wal")
    os.makedirs(wal, exist_ok=True)

    def land(e):
        src = os.path.dirname(eps[e][0])
        shutil.copytree(src, os.path.join(wal, os.path.basename(src)))

    lake = Lake(str(tmp_path / "lake"), partitions=4, salt=1)
    state: dict[str, tuple] = {}

    def consume(gen_round):
        for frm, to, ds in gen_round:
            df = ds.to_pandas()
            for r in df.itertuples(index=False):
                if r.change == "delete":
                    state.pop(r.url, None)
                else:
                    state[r.url] = (r.warc_ts, r.text)

    land(0)
    land(2)  # epoch 2 seals BEFORE epoch 1
    consume(lake.follow_changes(wal, poll_interval=0.05, idle_rounds=2))
    assert lake.committed_epochs() == {0, 2}
    land(1)  # the late epoch
    feeds = list(lake.follow_changes(wal, poll_interval=0.05,
                                     idle_rounds=2))
    assert len(feeds) == 1
    frm, to, ds = feeds[0]
    late = ds.to_pandas()
    assert len(late) > 0  # the late epoch's changes ARE emitted
    for r in late.itertuples(index=False):
        if r.change == "delete":
            state.pop(r.url, None)
        else:
            state[r.url] = (r.warc_ts, r.text)

    live = lake.read_table()
    assert sorted(state) == sorted(live.column("url").to_pylist())
    want = dict(zip(live.column("url").to_pylist(),
                    zip(live.column("warc_ts").to_pandas(),
                        live.column("text").to_pylist())))
    assert state == want


def test_diff_past_compaction_horizon_raises(tmp_path):
    wal = str(tmp_path / "wal")
    generate_wal(wal, WalSpec(n_events=2000, n_urls=300, n_epochs=4, seed=5))
    lake = Lake(str(tmp_path / "lake"), partitions=2, salt=1)
    lake.apply_wal(wal)
    lake.compact(gc_before_epoch=None)  # base now covers every epoch
    with pytest.raises(TimeTravelHorizonError):
        lake.diff(1, 3)
