"""Sequential pandas oracle: replay a WAL to final state.

Intentionally the dumbest possible implementation (row-at-a-time dict
replay, total lsn order) — the engine's distributed, order-free LWW result
must equal this byte-for-byte (per-url `text` invariant)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from tenzir_ray.cdc.wal import list_epochs


def _replay_state(
    wal_dir: str, aliases: dict[str, str] | None = None,
    max_epoch: int | None = None,
) -> tuple[dict[str, dict], list[str]]:
    """Row-at-a-time LWW replay of epochs ``<= max_epoch``: the per-url
    survivor dict (full event row + ``__deleted`` flag) and the unified
    column order.  Shared kernel of :func:`replay_wal` and
    :func:`diff_wal`."""
    aliases = {"body": "text"} if aliases is None else aliases
    frames = []
    for _e, files in list_epochs(wal_dir):
        if max_epoch is not None and _e > max_epoch:
            continue
        for f in files:
            t = pq.read_table(f)
            t = t.rename_columns(
                [aliases.get(n, n) for n in t.column_names]
            )
            df = t.to_pandas(types_mapper=None)
            frames.append(df)
    all_cols: list[str] = []
    for df in frames:
        for c in df.columns:
            if c not in all_cols:
                all_cols.append(c)
    state: dict[str, dict] = {}
    for df in frames:
        df = df.reindex(columns=all_cols)
        for row in df.sort_values("lsn").itertuples(index=False):
            d = dict(zip(all_cols, row))
            cur = state.get(d["url"])
            key = (d["warc_ts"], d["lsn"])
            if cur is not None and (cur["warc_ts"], cur["lsn"]) >= key:
                continue
            if str(d["op"]) == "DELETE":
                state[d["url"]] = {**d, "__deleted": True}
            else:
                state[d["url"]] = {**d, "__deleted": False}
    return state, all_cols


def replay_wal(
    wal_dir: str, aliases: dict[str, str] | None = None,
    max_epoch: int | None = None,
) -> pd.DataFrame:
    """``max_epoch`` replays only epochs ``<= max_epoch`` (the sequential
    dual of the lake's ``as_of_epoch`` time-travel read)."""
    state, all_cols = _replay_state(wal_dir, aliases, max_epoch)
    rows = [v for v in state.values() if not v["__deleted"]]
    out = pd.DataFrame(rows, columns=all_cols + ["__deleted"]).drop(
        columns=["__deleted", "lsn", "op"], errors="ignore"
    )
    return out.sort_values("url").reset_index(drop=True)


def diff_wal(
    wal_dir: str, from_epoch: int | None, to_epoch: int | None = None,
    aliases: dict[str, str] | None = None,
) -> pd.DataFrame:
    """Sequential dual of :meth:`Lake.diff`: the net change between the
    LWW state after epochs ``<= from_epoch`` and after ``<= to_epoch``.

    One row per url whose survivor changed, carrying the ``to``-side
    survivor's columns plus ``change`` ∈ {insert, update, delete}:

    - ``insert``: live at ``to``, absent-or-deleted at ``from``;
    - ``update``: live at both, with a different winning
      ``(warc_ts, lsn)`` — the CDC notion of change (a re-crawl that
      rewrote identical bytes is still an update event);
    - ``delete``: tombstone won at ``to`` over a live ``from`` row (the
      row carries the delete event's url/warc_ts, payload nulls).

    ``from_epoch=None`` diffs against the empty lake (all-inserts
    changefeed)."""
    sa, _ = (_replay_state(wal_dir, aliases, from_epoch)
             if from_epoch is not None else ({}, []))
    sb, all_cols = _replay_state(wal_dir, aliases, to_epoch)
    rows = []
    for url, b in sb.items():
        a = sa.get(url)
        a_live = a is not None and not a["__deleted"]
        b_live = not b["__deleted"]
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
        rows.append({**b, "change": change})
    out = pd.DataFrame(
        rows, columns=all_cols + ["change", "__deleted"]
    ).drop(columns=["__deleted", "lsn", "op"], errors="ignore")
    return out.sort_values("url").reset_index(drop=True)
