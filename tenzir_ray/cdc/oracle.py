"""Sequential pandas oracle: replay a WAL to final state.

Intentionally the dumbest possible implementation (row-at-a-time dict
replay, total lsn order) — the engine's distributed, order-free LWW result
must equal this byte-for-byte (per-url `text` invariant)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from tenzir_ray.cdc.wal import list_epochs


def replay_wal(
    wal_dir: str, aliases: dict[str, str] | None = None,
    max_epoch: int | None = None,
) -> pd.DataFrame:
    """``max_epoch`` replays only epochs ``<= max_epoch`` (the sequential
    dual of the lake's ``as_of_epoch`` time-travel read)."""
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
    rows = [v for v in state.values() if not v["__deleted"]]
    out = pd.DataFrame(rows, columns=all_cols + ["__deleted"]).drop(
        columns=["__deleted", "lsn", "op"], errors="ignore"
    )
    return out.sort_values("url").reset_index(drop=True)
