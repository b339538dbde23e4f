"""LSM-style base+delta Parquet lake with exactly-once epoch commits.

Re-imagines the reference's import→index→active-partition→store path
(libtenzir/src/importer.cpp:35-106, src/index.cpp:70-152,
src/active_partition.cpp:150-175) as a Ray-Data-native hash-partitioned
upsert pipeline:

    read_parquet(wal epoch) → map_batches(normalize + partial-LWW combine,
    batch_format="pyarrow") → groupby(bucket) → per-bucket writer task that
    LWW-reduces, writes ``delta-e{epoch}-b{bucket}.parquet`` + an atomic
    commit manifest → tiny manifest Dataset back to the driver.

Design decisions (and the reference mechanism they re-express):

- **Exactly-once** via per-bucket idempotent commit manifests written with
  write-temp + ``os.replace`` and skipped when present — the marker replay
  protocol of partition transforms (src/index.cpp:119-145). Ray task
  retries re-enter the writer and no-op.
- **Partitioning + salting**: ``bucket = hash(url) % (P * salt)`` and
  ``partition_id = bucket // salt`` — one partition's epoch work is split
  across ``salt`` independent writer tasks while every url still maps to
  exactly one bucket (LWW dedup stays complete per url). The reference has
  no skew handling (per-schema routing, src/index.cpp:74-77); this is the
  explicit salt-based skew splitting the north rule demands.
- **Hot-single-url skew** is absorbed *before* the shuffle: the normalize
  stage partially LWW-reduces every batch (keep max ``(warc_ts, lsn)`` per
  url per batch) — a combiner, valid because LWW-max is associative,
  commutative and idempotent. A url with 10^6 updates in an epoch crosses
  the shuffle as ~one row per input block.
- **Order independence**: no stage relies on arrival order; convergence
  comes from the total order ``(warc_ts, lsn)`` — unlike the reference's
  ordered pull-based dataflow (src/execution_node.cpp:47-75), Ray Data
  blocks are unordered and replay in any epoch order converges.
- **Schema evolution** resolved at merge time via
  :mod:`tenzir_ray.cdc.schema` (reference ``unify``, type.cpp:3547).
- **Compaction** (reference ``rebuild``, builtins/commands/rebuild.cpp)
  merges base ⊕ deltas per partition into a new ``base-e{upto}.parquet``
  (atomic rename), after which deltas with ``epoch <= upto`` are dead and
  garbage-collected; tombstones older than the GC horizon are physically
  dropped (disk_monitor analog, src/disk_monitor.cpp:241).
"""

from __future__ import annotations

import glob
import json
import os
import re
import time
from base64 import b64decode, b64encode
from functools import partial

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from tenzir_ray.cdc.schema import DEFAULT_ALIASES, align_table, unify_schemas
from tenzir_ray.cdc.wal import list_epochs

ENGINE_COLS = ("lsn", "op", "epoch_rec")
_BUCKET = "__bucket"
_EPOCH = "__epoch"
_HASH = "__h"


class ReplicaLagError(RuntimeError):
    """A replica already committed an epoch whose siblings the source
    has since compacted away — incremental catch-up is impossible
    (the Kafka consumer-off-the-retention-window analog); re-bootstrap
    a fresh replica."""


class TimeTravelHorizonError(ValueError):
    """Requested ``as_of_epoch`` precedes the compaction/GC horizon: the
    per-epoch deltas needed to reconstruct that state were folded into a
    newer base and garbage-collected (time travel is bounded by the newest
    base's covered epoch, like any LSM lake without version-retaining
    snapshots)."""


# ---------------------------------------------------------------- kernels


def url_buckets(url: pa.ChunkedArray | pa.Array, n_buckets: int) -> np.ndarray:
    """Deterministic hash bucket per url (stable across processes: pandas
    siphash with the fixed default key)."""
    if isinstance(url, pa.ChunkedArray):
        url = url.combine_chunks()
    h = pd.util.hash_array(url.to_numpy(zero_copy_only=False))
    return (h % np.uint64(n_buckets)).astype(np.int32)


def lww_reduce(t: pa.Table, key: str = "url", within: str | None = None) -> pa.Table:
    """Keep, per key (optionally per ``within`` sub-stream, e.g. epoch),
    the row with max ``(warc_ts, lsn)``. Vectorized: sort ascending then
    keep each key's last row. Associative/commutative/idempotent → usable
    both as per-batch combiner and final reducer (reference analog:
    deduplicate, operators/deduplicate.cpp:126-260, inverted to keep the
    *latest* writer).

    Sorts by the 64-bit key hash first (int compares ≈2× cheaper than
    string compares; the hash is reused as the shuffle bucket), with the
    string key as tiebreak so hash collisions stay adjacent; the keep-last
    boundary test is exact — collisions fall back to comparing the
    (rare) hash-equal neighbor strings."""
    if t.num_rows <= 1:
        return t
    added_hash = _HASH not in t.column_names
    if added_hash:
        t = t.append_column(
            _HASH, pa.array(_key_hashes(t.column(key)).view(np.int64))
        )
    kept = _lww_survivor_indices(t, key, within)
    t = t.take(pa.array(kept))
    return t.drop_columns([_HASH]) if added_hash else t


def _lww_survivor_indices(t: pa.Table, key: str,
                          within: str | None = None) -> np.ndarray:
    """The shared LWW kernel: row indices of each key's max
    ``(warc_ts, lsn)`` row, computed entirely in index space on the
    narrow key columns (``t`` must already carry the ``_HASH`` column).
    The multi-KB payload is never gathered here — callers compose the
    returned indices with whatever final permutation they need and
    gather ONCE."""
    keys = ([(within, "ascending")] if within else []) + [
        (_HASH, "ascending"), (key, "ascending"),
        ("warc_ts", "ascending"), ("lsn", "ascending"),
    ]
    idx = pc.sort_indices(t, sort_keys=keys).to_numpy()
    h = t.column(_HASH).combine_chunks().to_numpy()[idx]
    keep = np.empty(len(h), dtype=bool)
    keep[-1] = True
    np.not_equal(h[1:], h[:-1], out=keep[:-1])
    if within:
        w = t.column(within).combine_chunks().to_numpy(
            zero_copy_only=False)[idx]
        np.logical_or(keep[:-1], w[1:] != w[:-1], out=keep[:-1])
    # exact boundaries under hash collisions: hash-equal neighbors are
    # usually same-url duplicates (re-crawls) — compare them vectorized,
    # promoting the rare genuinely-colliding different-url pair back to
    # a boundary (single-column gather of the neighbors only)
    same = np.flatnonzero(~keep[:-1])
    if len(same):
        urls = t.column(key).combine_chunks()
        left = urls.take(pa.array(idx[same]))
        right = urls.take(pa.array(idx[same + 1]))
        differs = pc.fill_null(pc.not_equal(left, right), True).to_numpy(
            zero_copy_only=False
        )
        keep[same[differs]] = True
    return idx[keep]


def _lww_reduce_url_sorted(t: pa.Table, key: str = "url") -> pa.Table:
    """:func:`lww_reduce` fused with the final sort-by-``key``, in ONE
    payload gather: both permutations are computed on the narrow key
    columns only (sort_indices never moves the multi-KB html/text
    payload), survivors are composed index-wise, and the full table is
    ``take``-n once at the end. Output is byte-identical to
    ``lww_reduce(t)`` + sort-by-``key`` (survivor urls are unique, so
    the final order is fully determined); the ``_HASH`` engine column
    is dropped. The hot kernel of :func:`_write_one` — at 6M events the
    second full-payload gather was ~15% of the reduce stage."""
    if t.num_rows <= 1:
        return t.drop_columns([_HASH]) if _HASH in t.column_names else t
    if _HASH not in t.column_names:
        t = t.append_column(
            _HASH, pa.array(_key_hashes(t.column(key)).view(np.int64))
        )
    kept = _lww_survivor_indices(t, key)
    order = pc.sort_indices(
        t.column(key).combine_chunks().take(pa.array(kept))).to_numpy()
    out = t.take(pa.array(kept[order]))
    return out.drop_columns([_HASH])


def _key_hashes(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return pd.util.hash_array(col.to_numpy(zero_copy_only=False))


_EPOCH_RE = re.compile(r"epoch=(\d+)")

# Engine-side text extraction (the parse step of the CDC pipeline —
# Tenzir's read_*/parser stage analog, plugin.hpp:430). The per-url
# byte-identical-text invariant is *defined* by this kernel.
from tenzir_ray.cdc.wal import extract_text_column as _extract_text_col


def _normalize_batch(
    t: pa.Table, *, target: pa.Schema, aliases: dict[str, str], n_buckets: int,
    epoch: int | None = None, extract: bool = True,
    raw_counts: dict | None = None,
) -> pa.Table:
    """Stateless map_batches stage: derive epoch (from the WAL segment
    path when batches mix epochs), align to the unified target schema,
    partially LWW-combine per (epoch, url) — the combiner that absorbs
    hot-single-url skew before the shuffle — and tag the shuffle bucket.

    The combine is scoped per epoch so every delta file is byte-identical
    to single-epoch application (deterministic lake layout under any
    batching/resume pattern)."""
    if epoch is None:
        # a block has a handful of DISTINCT segment paths but one path
        # string per row — regex the dictionary, broadcast via codes
        enc = t.column("path").combine_chunks().dictionary_encode()
        ep_u = np.fromiter(
            (int(_EPOCH_RE.search(p).group(1))
             for p in enc.dictionary.to_pylist()),
            np.int64, count=len(enc.dictionary),
        )
        epochs = ep_u[enc.indices.to_numpy(zero_copy_only=False)]
        t = t.drop_columns(["path"])
    else:
        epochs = np.full(t.num_rows, epoch, np.int64)
    if "epoch_rec" in t.column_names:
        # RESERVED engine column (epoch-of-record): present when the
        # input is another lake's delta/base files (replication) —
        # dropped and recomputed from THIS apply's epoch label, never
        # treated as producer data
        t = t.drop_columns(["epoch_rec"])
    t = align_table(t, target, aliases)
    t = t.append_column(_EPOCH, pa.array(epochs))
    # key hash added once here: reused by the combiner's sort, the bucket
    # assignment below, and (via the stage files) the reducer's final sort
    h = _key_hashes(t.column("url"))
    buckets = (h % np.uint64(n_buckets)).astype(np.int32)
    t = t.append_column(_HASH, pa.array(h.view(np.int64)))
    t = t.append_column(_BUCKET, pa.array(buckets))
    if raw_counts is not None:  # pre-combine event volume per (bucket, epoch)
        key = buckets.astype(np.int64) << np.int64(32) | epochs
        uniq, counts = np.unique(key, return_counts=True)
        for k, c in zip(uniq, counts):
            raw_counts[(int(k >> 32), int(k & 0xFFFFFFFF))] = int(c)
    t = lww_reduce(t, within=_EPOCH)  # combine BEFORE parse: don't extract losers
    if extract and "html" in t.column_names and "text" in t.column_names:
        t = t.set_column(
            t.column_names.index("text"), "text", _extract_text_col(t.column("html"))
        )
    return t


def _is_delete(t: pa.Table) -> pa.ChunkedArray:
    return pc.equal(t.column("op"), pa.scalar("DELETE"))


# ---------------------------------------------------------- bucket writer


def _manifest_path(root: str, epoch: int, bucket: int) -> str:
    return os.path.join(root, "_manifest", f"e{epoch:05d}-b{bucket:05d}.json")


def _atomic_write(path: str, data: bytes) -> None:
    tmp = f"{path}.tmp.{os.getpid()}.{time.monotonic_ns()}"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def _write_one(group: pa.Table, *, root: str, epoch: int, bucket: int,
               salt: int, events_in: int | None = None) -> dict:
    """Write one (epoch, bucket) delta + its atomic idempotent manifest.
    Re-entry (Ray task retry / crash resume) sees the committed manifest
    and no-ops — the marker replay protocol (index.cpp:119-145)."""
    t0 = time.perf_counter()
    pid = bucket // salt
    mpath = _manifest_path(root, epoch, bucket)
    if os.path.exists(mpath):  # committed by an earlier attempt → no-op
        with open(mpath, "rb") as f:
            return json.load(f)
    n_in = group.num_rows if events_in is None else events_in
    # LWW + url sort fused into one payload gather (reuses staged __h)
    group = _lww_reduce_url_sorted(group)
    pdir = os.path.join(root, f"p={pid:04d}")
    os.makedirs(pdir, exist_ok=True)
    fname = f"delta-e{epoch:05d}-b{bucket:05d}.parquet"
    fpath = os.path.join(pdir, fname)
    tmp = f"{fpath}.tmp.{os.getpid()}.{time.monotonic_ns()}"
    pq.write_table(group, tmp, compression="zstd", compression_level=3)
    os.replace(tmp, fpath)
    wall = time.perf_counter() - t0
    manifest = {
        "partition_id": pid,
        "bucket": bucket,
        "epoch": epoch,
        "max_lsn": int(pc.max(group.column("lsn")).as_py()),
        "files": [f"p={pid:04d}/{fname}"],
        "num_rows": group.num_rows,
        "num_tombstones": int(pc.sum(_is_delete(group)).as_py() or 0),
        "min_url": str(group.column("url")[0].as_py()),
        "max_url": str(group.column("url")[-1].as_py()),
        "events_in": n_in,
        "wall_s": wall,
        "events_per_s": n_in / wall if wall > 0 else 0.0,
    }
    _atomic_write(mpath, json.dumps(manifest).encode())
    return manifest


# Stage-file format: transient per-bucket spill written once per map task
# and read once per reduce — Arrow IPC ("feather", lz4) skips parquet
# encode/decode entirely; "parquet" (snappy) trades CPU for fewer tmpfs
# bytes. Switchable for measurement.
_STAGE_FORMAT = os.environ.get("TENZIR_RAY_STAGE_FORMAT", "feather")

_META_SCHEMA = pa.schema([
    pa.field("bucket", pa.int32()),
    pa.field("epoch", pa.int64()),
    pa.field("path", pa.string()),
    pa.field("raw_rows", pa.int64()),
    pa.field("rows", pa.int64()),
])


def _map_stage_batch(
    t: pa.Table, *, target: pa.Schema, aliases: dict[str, str],
    n_buckets: int, extract: bool, stage_dir: str,
) -> pa.Table:
    """The fused map-side stage: normalize + combine + extract + stage
    write, emitting one (bucket, epoch, path, raw_rows, rows) metadata row
    per (bucket, epoch) touched. ``raw_rows`` counts PRE-combine events so
    lineage reports true input volume (the combiner may collapse a hot url
    thousandsfold — exactly the signal hot_buckets() needs to see)."""
    t = _normalize_batch(
        t, target=target, aliases=aliases, n_buckets=n_buckets,
        extract=extract, raw_counts=(raw := {}),
    )
    if t.num_rows == 0:
        return _META_SCHEMA.empty_table()
    t = t.take(pc.sort_indices(
        t, sort_keys=[(_BUCKET, "ascending"), (_EPOCH, "ascending")]))
    b = t.column(_BUCKET).combine_chunks().to_numpy()
    ep = t.column(_EPOCH).combine_chunks().to_numpy()
    key = b.astype(np.int64) << np.int64(32) | ep
    bounds = np.flatnonzero(np.diff(key)) + 1
    starts = np.concatenate([[0], bounds])
    ends = np.concatenate([bounds, [len(b)]])
    uniq = os.getpid(), time.monotonic_ns()
    rows = {k: [] for k in ("bucket", "epoch", "path", "raw_rows", "rows")}
    # one stage file per bucket (all its epochs together; the reducer
    # re-splits) — fewer files than per-(bucket, epoch)
    cur_path = {}
    for s, e in zip(starts, ends):
        bucket, epoch = int(b[s]), int(ep[s])
        if bucket not in cur_path:
            bdir = os.path.join(stage_dir, f"b{bucket:05d}")
            os.makedirs(bdir, exist_ok=True)
            cur_path[bucket] = os.path.join(
                bdir, f"s-{uniq[0]}-{uniq[1]}.parquet")
        rows["bucket"].append(bucket)
        rows["epoch"].append(epoch)
        rows["path"].append(cur_path[bucket])
        rows["raw_rows"].append(raw.get((bucket, epoch), e - s))
        rows["rows"].append(e - s)
    # write per-bucket slices (contiguous after the sort)
    bb = np.flatnonzero(np.diff(b)) + 1
    bstarts = np.concatenate([[0], bb])
    bends = np.concatenate([bb, [len(b)]])
    for s, e in zip(bstarts, bends):
        sub = t.slice(s, e - s).drop_columns([_BUCKET])
        if _STAGE_FORMAT == "feather":
            from pyarrow import feather as _ft

            _ft.write_feather(sub, cur_path[int(b[s])],
                              compression="lz4", version=2)
        else:
            pq.write_table(sub, cur_path[int(b[s])], compression="snappy")
    return pa.table(rows, schema=_META_SCHEMA)


def _reduce_bucket(
    group: pa.Table, *, root: str, salt: int, stage_schema: pa.Schema | None = None
) -> pa.Table:
    """Reduce one bucket: read its stage files, split per epoch, LWW-reduce
    and commit each (epoch, bucket) delta + manifest. ``raw_rows`` from the
    metadata rows carries true (pre-combine) event volume into lineage."""
    if group.num_rows == 0 or "bucket" not in group.column_names:
        # Ray emits zero-column blocks for empty hash partitions (known
        # artifact) — nothing to reduce; return an empty MANIFEST-shaped
        # table so downstream concat/groupby schema unification holds
        return _manifest_table({
            "partition_id": 0, "bucket": 0, "epoch": 0, "max_lsn": 0,
            "files": [], "num_rows": 0, "num_tombstones": 0,
            "min_url": "", "max_url": "", "events_in": 0,
            "wall_s": 0.0, "events_per_s": 0.0,
        }).slice(0, 0)
    bucket = int(group.column("bucket")[0].as_py())
    files = sorted(set(group.column("path").to_pylist()))
    raw_per_epoch: dict[int, int] = {}
    for e, r in zip(group.column("epoch").to_pylist(),
                    group.column("raw_rows").to_pylist()):
        raw_per_epoch[int(e)] = raw_per_epoch.get(int(e), 0) + int(r)
    # one dataset scan over all staged pieces (not a read_table per file —
    # at scale a bucket has one piece per map task). The explicit schema
    # null-fills leftovers from a crashed earlier run whose target schema
    # was narrower (pre-evolution).
    t = pads.dataset(files, schema=stage_schema,
                     format="feather" if _STAGE_FORMAT == "feather"
                     else "parquet").to_table()
    epochs = pc.unique(t.column(_EPOCH)).to_pylist()
    out = []
    for e in sorted(epochs):
        sub = t.filter(pc.equal(t.column(_EPOCH), e))
        # epoch-of-record persists in the delta (engine column): drives
        # tombstone GC horizons at compaction (disk_monitor analog)
        sub = sub.set_column(
            sub.column_names.index(_EPOCH), "epoch_rec", sub.column(_EPOCH)
        )
        out.append(
            _manifest_table(
                _write_one(sub, root=root, epoch=int(e), bucket=bucket,
                           salt=salt, events_in=raw_per_epoch.get(int(e), 0))
            )
        )
    return pa.concat_tables(out)


def _manifest_table(m: dict) -> pa.Table:
    return pa.table(
        {
            "partition_id": pa.array([m["partition_id"]], pa.int32()),
            "bucket": pa.array([m["bucket"]], pa.int32()),
            "epoch": pa.array([m["epoch"]], pa.int64()),
            "max_lsn": pa.array([m["max_lsn"]], pa.int64()),
            "files": pa.array([m["files"]], pa.list_(pa.string())),
            "num_rows": pa.array([m["num_rows"]], pa.int64()),
            "num_tombstones": pa.array([m["num_tombstones"]], pa.int64()),
            "min_url": pa.array([m["min_url"]], pa.string()),
            "max_url": pa.array([m["max_url"]], pa.string()),
            "events_in": pa.array([m.get("events_in", 0)], pa.int64()),
            "wall_s": pa.array([m["wall_s"]], pa.float64()),
            "events_per_s": pa.array([m["events_per_s"]], pa.float64()),
        }
    )


# ------------------------------------------------------- partition merge


def _live_files(
    root: str, pid: int, as_of: int | None = None
) -> tuple[list[str], int]:
    """(live files, base-covered epoch). Base ``base-e{upto}.parquet`` covers
    all deltas with epoch <= upto; those are dead (GC'able).

    With ``as_of`` set, returns the file set reconstructing the state after
    applying epochs ``<= as_of`` (time travel): the newest base covering
    ``upto <= as_of`` plus deltas in ``(upto, as_of]``. Raises
    :class:`TimeTravelHorizonError` when every surviving base covers past
    ``as_of`` — the needed deltas were compacted away."""
    pdir = os.path.join(root, f"p={pid:04d}")

    def _epoch_of(path: str) -> int:
        return int(os.path.basename(path)[len("base-e"):-len(".parquet")])

    # NUMERIC sort: the 5-digit zero padding overflows at epoch 100000,
    # where lexical order would pin 'latest' to epoch 99999 forever
    bases = sorted(glob.glob(os.path.join(pdir, "base-e*.parquet")),
                   key=_epoch_of)

    upto = -1
    files: list[str] = []
    if as_of is not None:
        eligible = [b for b in bases if _epoch_of(b) <= as_of]
        if not eligible and bases:
            raise TimeTravelHorizonError(
                f"partition {pid}: state as of epoch {as_of} is before the "
                f"compaction horizon (newest base covers epoch "
                f"{_epoch_of(bases[-1])})"
            )
        bases = eligible
    if bases:
        best = bases[-1]
        upto = _epoch_of(best)
        files.append(best)
    for f in sorted(glob.glob(os.path.join(pdir, "delta-e*.parquet"))):
        e = int(os.path.basename(f).split("-")[1][1:])
        if e > upto and (as_of is None or e <= as_of):
            files.append(f)
    return files, upto


def _read_schema(schema: pa.Schema) -> pa.Schema:
    """Stored data schema + persisted engine column (epoch-of-record)."""
    if "epoch_rec" in schema.names:
        return schema
    return schema.append(pa.field("epoch_rec", pa.int64()))


def _read_files(
    files: list[str], schema: pa.Schema, filter=None,
    columns: list[str] | None = None,
) -> pa.Table | None:
    """Scan an explicit lake-file list under the unified read schema.
    Older files lack later-added columns → filled with nulls by the
    pyarrow dataset reader (merge-time evolution). ``columns`` projects
    at the scan: only the requested columns leave storage (parquet
    column pruning — at 100 TB an `export | select` must not decode the
    html payload column it never returns)."""
    if not files:
        return None
    return pads.dataset(
        files, schema=_read_schema(schema), format="parquet"
    ).to_table(filter=filter, columns=columns)


def _read_partition(
    root: str, pid: int, schema: pa.Schema, filter=None,
    as_of: int | None = None, columns: list[str] | None = None,
) -> pa.Table | None:
    files, _ = _live_files(root, pid, as_of=as_of)
    return _read_files(files, schema, filter=filter, columns=columns)


#: columns the LWW merge itself consumes even when the caller projects
#: them away: key, order pair, and the tombstone marker.
_MERGE_COLS = ("url", "warc_ts", "lsn", "op")


def _merge_partition(
    batch: pa.Table, *, root: str, schema: pa.Schema, with_tombstones: bool,
    keep_engine_cols: bool, as_of: int | None = None,
    columns: list[str] | None = None,
) -> pa.Table:
    """Merge-on-read for the partition ids in ``batch`` (reference analog:
    export's retro partition fan-in, operators/export.cpp:47-67). No global
    shuffle: a url lives in exactly one partition, so per-partition LWW is
    globally correct. ``as_of`` reads the historical state after epochs
    ``<= as_of`` (bounded by the compaction horizon). ``columns`` prunes
    the scan to the requested columns plus the merge-required set
    (key/order/tombstone), and the output carries exactly ``columns``."""
    scan_cols = None
    if columns is not None:
        # explicit projection wins: the output is exactly `columns`
        # (put lsn/op in `columns` to keep engine fields), the scan
        # additionally reads only what the LWW merge consumes
        scan_cols = list(columns) + [
            c for c in _MERGE_COLS if c not in columns]
    out: list[pa.Table] = []
    for pid in batch.column("pid").to_pylist():
        t = _read_partition(root, int(pid), schema, as_of=as_of,
                            columns=scan_cols)
        if t is None or t.num_rows == 0:
            continue
        t = lww_reduce(t)
        if not with_tombstones:
            t = t.filter(pc.invert(_is_delete(t)))
        if columns is not None:
            t = t.select(columns)
        elif not keep_engine_cols:
            t = t.drop_columns([c for c in ENGINE_COLS if c in t.column_names])
        out.append(t)
    if not out:
        if columns is not None:
            empty = pa.schema([_read_schema(schema).field(c)
                               for c in columns])
        else:
            empty = schema if keep_engine_cols else pa.schema(
                [f for f in schema if f.name not in ENGINE_COLS]
            )
        return empty.empty_table()
    return pa.concat_tables(out, promote_options="permissive")


def _file_epoch(path: str) -> int:
    """Epoch a lake file covers: ``base-e{upto}`` / ``delta-e{epoch}-b*``."""
    name = os.path.basename(path)
    if name.startswith("base-e"):
        return int(name[len("base-e"):-len(".parquet")])
    return int(name.split("-")[1][1:])


def _diff_partition(
    batch: pa.Table, *, root: str, schema_a: pa.Schema | None,
    schema_b: pa.Schema, from_epoch: int | None, to_epoch: int,
    window_epochs: frozenset | None = None,
    columns: list[str] | None = None,
) -> pa.Table:
    """Changefeed for the partition ids in ``batch``: net survivor change
    between the LWW states as-of ``from_epoch`` and as-of ``to_epoch``
    (Delta-Lake-CDF analog over the reference's retro export,
    operators/export.cpp:47-67).

    Scale shape: NO shuffle — a url lives in exactly one partition, so
    per-partition diff is globally correct. Candidate urls come from the
    window's delta files only (epochs in ``(from, to]``); both horizon
    reads are parquet-filter-pushdown restricted to those candidates, so
    unchanged urls never leave storage. Only when compaction folded part
    of the window into a base does the candidate set widen to that base's
    urls (correct, just less pruned).

    ``window_epochs`` switches from the interval window ``(from, to]`` to
    an explicit committed-epoch SET: the change attributed to exactly
    those epochs' deltas — the pre-state is the live file set MINUS the
    window's delta files, which stays well-defined when a lower epoch
    seals after a higher one was already committed (an interval diff
    cannot express that pre-state)."""
    rs = _read_schema(schema_b)
    out_cols = None
    scan_b = None
    if columns is not None:
        # projection pushdown: output = url + requested + change; the B
        # scan additionally reads only what classification consumes
        # (key/order/tombstone) — a `diff | select url, lang` never
        # decodes the html payload column it doesn't return
        out_cols = ["url"] + [c for c in columns
                              if c not in ("url", "change")] + ["change"]
        scan_b = list(dict.fromkeys(
            [c for c in out_cols if c != "change"]
            + [c for c in _MERGE_COLS]))
        empty = pa.schema(
            [rs.field(c) for c in out_cols if c != "change"]
        ).append(pa.field("change", pa.string()))
    else:
        empty = pa.schema(
            [f for f in rs if f.name not in ENGINE_COLS]
        ).append(pa.field("change", pa.string()))
    frm = -1 if from_epoch is None else from_epoch
    out: list[pa.Table] = []
    for pid in batch.column("pid").to_pylist():
        pid = int(pid)
        files_b, upto = _live_files(root, pid, as_of=to_epoch)
        if window_epochs is not None:
            if upto >= 0 and min(window_epochs) <= upto:
                raise TimeTravelHorizonError(
                    f"partition {pid}: epoch(s) "
                    f"{sorted(e for e in window_epochs if e <= upto)} were "
                    f"compacted into base-e{upto} — their pre-state is gone"
                )
            window = [f for f in files_b if _file_epoch(f) in window_epochs
                      and not os.path.basename(f).startswith("base-e")]
        else:
            window = [f for f in files_b if _file_epoch(f) > frm]
        if not window:
            continue
        cand = pads.dataset(
            window, schema=_read_schema(schema_b), format="parquet"
        ).to_table(columns=["url"])
        if cand.num_rows == 0:
            continue
        filt = pads.field("url").isin(pc.unique(cand.column("url")))
        b = _read_partition(root, pid, schema_b, filter=filt,
                            as_of=to_epoch, columns=scan_b)
        if b is None or b.num_rows == 0:
            continue
        b = lww_reduce(b)
        # the A side only drives CLASSIFICATION (live/survivor-pair):
        # scan just key/order/tombstone — the from-horizon's payload
        # bytes are never needed, at any projection
        a_cols = list(_MERGE_COLS)
        a = None
        if window_epochs is not None:
            # pre-state = live files minus the window's deltas
            a = _read_files([f for f in files_b if f not in set(window)],
                            schema_b, filter=filt, columns=a_cols)
            if a is not None and a.num_rows:
                a = lww_reduce(a)
        elif from_epoch is not None and schema_a is not None:
            # horizon check: raises TimeTravelHorizonError when the
            # from-state was compacted away — diff needs both horizons
            a = _read_partition(root, pid, schema_a, filter=filt,
                                as_of=from_epoch, columns=a_cols)
            if a is not None and a.num_rows:
                a = lww_reduce(a)
        b_live = pc.invert(_is_delete(b)).combine_chunks().to_numpy(
            zero_copy_only=False)
        n = b.num_rows
        a_live = np.zeros(n, dtype=bool)
        same_pair = np.zeros(n, dtype=bool)
        if a is not None and a.num_rows:
            idx = pc.index_in(b.column("url").combine_chunks(),
                              value_set=a.column("url").combine_chunks())
            v = pc.is_valid(idx).to_numpy(zero_copy_only=False)
            ai = idx.fill_null(0).to_numpy(zero_copy_only=False).astype(
                np.int64)[v]
            a_del = _is_delete(a).combine_chunks().to_numpy(
                zero_copy_only=False)
            a_live[v] = ~a_del[ai]
            a_ts = a.column("warc_ts").combine_chunks().to_numpy(
                zero_copy_only=False)
            b_ts = b.column("warc_ts").combine_chunks().to_numpy(
                zero_copy_only=False)
            a_lsn = a.column("lsn").combine_chunks().to_numpy(
                zero_copy_only=False)
            b_lsn = b.column("lsn").combine_chunks().to_numpy(
                zero_copy_only=False)
            same_pair[v] = (a_ts[ai] == b_ts[v]) & (a_lsn[ai] == b_lsn[v])
        ins = b_live & ~a_live
        upd = b_live & a_live & ~same_pair
        dele = ~b_live & a_live
        mask = ins | upd | dele
        if not mask.any():
            continue
        change = np.full(n, "", dtype=object)
        change[ins], change[upd], change[dele] = "insert", "update", "delete"
        t = b.append_column("change", pa.array(change, pa.string()))
        t = t.filter(pa.array(mask))
        if out_cols is not None:
            t = t.select(out_cols)
        else:
            t = t.drop_columns(
                [c for c in ENGINE_COLS if c in t.column_names])
        out.append(t)
    if not out:
        return empty.empty_table()
    return pa.concat_tables(out, promote_options="permissive")


def _compact_partition(
    batch: pa.Table, *, root: str, schema: pa.Schema, gc_before_epoch: int | None
) -> pa.Table:
    """Compact the partition ids in ``batch``: LWW-merge base⊕deltas into a
    new base, atomic-rename commit, then GC dead files. Tombstones with
    epoch-of-record older than the horizon are physically dropped; pass
    ``gc_before_epoch=None`` to drop all (horizon passed)."""
    rows = []
    for pid in batch.column("pid").to_pylist():
        pid = int(pid)
        files, old_upto = _live_files(root, pid)
        deltas = [f for f in files if os.path.basename(f).startswith("delta-")]
        if not files:
            continue
        upto = max(
            [int(os.path.basename(f).split("-")[1][1:]) for f in deltas],
            default=old_upto,
        )
        t = _read_partition(root, pid, schema)
        t = lww_reduce(t)
        # GC horizon: tombstones recorded before the horizon epoch have
        # protected every straggler replay they ever needed to — drop
        # them physically; newer tombstones stay in the base to keep
        # hiding any not-yet-compacted older version (disk_monitor
        # retention analog, src/disk_monitor.cpp:241). None ⇒ horizon
        # fully passed, all tombstones dead.
        if gc_before_epoch is None:
            dead = _is_delete(t)
        else:
            dead = pc.and_(
                _is_delete(t),
                pc.less(
                    pc.fill_null(t.column("epoch_rec"), gc_before_epoch),
                    gc_before_epoch,
                ),
            )
        n_dead = int(pc.sum(dead).as_py() or 0)
        if not deltas and n_dead == 0:
            continue  # base-only partition with nothing to fold or GC
        if n_dead:
            t = t.filter(pc.invert(dead))
        t = t.take(pc.sort_indices(t, sort_keys=[("url", "ascending")]))
        pdir = os.path.join(root, f"p={pid:04d}")
        fpath = os.path.join(pdir, f"base-e{upto:05d}.parquet")
        tmp = f"{fpath}.tmp.{os.getpid()}.{time.monotonic_ns()}"
        pq.write_table(t, tmp, compression="zstd", compression_level=3)
        os.replace(tmp, fpath)
        # GC: everything the new base covers is dead; safe to delete after
        # the rename (a crash in between leaves dead-but-ignored files that
        # the next compaction sweeps — marker-replay analog, index.cpp:143).
        for f in glob.glob(os.path.join(pdir, "delta-e*.parquet")):
            if int(os.path.basename(f).split("-")[1][1:]) <= upto:
                os.remove(f)
        for f in glob.glob(os.path.join(pdir, "base-e*.parquet")):
            if f != fpath:
                os.remove(f)
        rows.append({"pid": pid, "base_epoch": upto, "rows": t.num_rows})
    if not rows:
        return pa.table({"pid": pa.array([], pa.int32()),
                         "base_epoch": pa.array([], pa.int64()),
                         "rows": pa.array([], pa.int64())})
    return pa.table({
        "pid": pa.array([r["pid"] for r in rows], pa.int32()),
        "base_epoch": pa.array([r["base_epoch"] for r in rows], pa.int64()),
        "rows": pa.array([r["rows"] for r in rows], pa.int64()),
    })


# ------------------------------------------------------------------ Lake


class Lake:
    """A hash-partitioned LSM Parquet lake applying a WAL exactly once.

    Layout::

        root/
          _config.json                  # P, salt, aliases (immutable)
          _manifest/e{e}-b{b}.json      # per-bucket commit record
          _manifest/e{e}.done          # epoch fully applied marker
          _manifest/schema-e{e}.json    # unified schema after epoch e
          p={pid}/base-e{upto}.parquet  # compacted base (covers e<=upto)
          p={pid}/delta-e{e}-b{b}.parquet
    """

    def __init__(self, root: str, partitions: int = 8, salt: int = 2,
                 aliases: dict[str, str] | None = None, extract: bool = True,
                 stage_dir: str | None = None):
        self.root = root
        cfg_path = os.path.join(root, "_config.json")
        if os.path.exists(cfg_path):
            with open(cfg_path) as f:
                cfg = json.load(f)
            self.P = cfg["partitions"]
            self.salt = cfg["salt"]
            self.aliases = cfg["aliases"]
            self.extract = cfg.get("extract", True)
        else:
            os.makedirs(os.path.join(root, "_manifest"), exist_ok=True)
            self.P = partitions
            self.salt = salt
            self.aliases = dict(DEFAULT_ALIASES if aliases is None else aliases)
            self.extract = extract
            _atomic_write(
                cfg_path,
                json.dumps(
                    {"partitions": self.P, "salt": self.salt,
                     "aliases": self.aliases, "extract": self.extract}
                ).encode(),
            )
        self.G = self.P * self.salt
        # Transient exchange staging. NOT part of durable lake state; safe
        # to lose between runs. Medium is resolved per apply (see
        # _select_stage_dir): single-node → node-local tmpfs; multi-node →
        # the lake root's own filesystem (cluster-visible), because a
        # reduce task on another node cannot read a map node's /dev/shm.
        self._stage_dir_override = stage_dir
        self.stage_dir = self._select_stage_dir()

    def _select_stage_dir(self) -> str:
        from ..util import exchange_stage_dir

        if self._stage_dir_override is not None:
            return self._stage_dir_override
        return exchange_stage_dir(
            os.path.join(self.root, "_stage"),
            local_subdir=os.path.join(
                "tenzir_ray_stage", self.root.strip("/").replace("/", "_")),
        )

    # -------------------------------------------------- schema tracking

    def schema(self, as_of_epoch: int | None = None) -> pa.Schema | None:
        """Latest unified schema committed to the lake (None if empty).
        With ``as_of_epoch``, the schema as committed at that epoch — a
        time-travel read reproduces the narrower historical schema before
        later add/widen/rename evolution."""
        paths = sorted(
            glob.glob(os.path.join(self.root, "_manifest",
                                   "schema-e*.json")),
            # numeric: lexical order breaks past the 5-digit padding
            key=lambda p: int(
                os.path.basename(p)[len("schema-e"):-len(".json")]))
        if as_of_epoch is not None:
            paths = [
                p for p in paths
                if int(os.path.basename(p)[len("schema-e"):-len(".json")])
                <= as_of_epoch
            ]
        if not paths:
            return None
        with open(paths[-1]) as f:
            return pa.ipc.read_schema(pa.py_buffer(b64decode(json.load(f)["schema"])))

    def _commit_schema(self, epoch: int, schema: pa.Schema) -> None:
        path = os.path.join(self.root, "_manifest", f"schema-e{epoch:05d}.json")
        if not os.path.exists(path):
            _atomic_write(
                path,
                json.dumps(
                    {"schema": b64encode(schema.serialize().to_pybytes()).decode()}
                ).encode(),
            )

    # ------------------------------------------------------ commit state

    def committed_epochs(self) -> set[int]:
        return {
            int(os.path.basename(p)[1:-5])
            for p in glob.glob(os.path.join(self.root, "_manifest", "e*.done"))
        }

    def _epoch_done(self, epoch: int) -> bool:
        return os.path.exists(
            os.path.join(self.root, "_manifest", f"e{epoch:05d}.done")
        )

    # ----------------------------------------------------------- ingest

    def apply_epochs(self, epochs: list[tuple[int, list[str]]]) -> list[dict]:
        """Apply a batch of WAL epochs end-to-end (tail → upsert → commit)
        through ONE shuffle: every pending epoch's rows are normalized,
        bucket-tagged and exchanged together, and the per-bucket writer
        splits them back into per-(epoch, bucket) delta files + manifests.
        This amortizes the all-to-all exchange over the whole tail instead
        of paying one barrier per epoch (the reference pays none because it
        is single-machine; at cluster scale the batched exchange is the
        difference between N barriers and 1).

        Idempotent: committed epochs are skipped driver-side; a crash
        mid-batch resumes from bucket manifests (writer no-ops per
        committed (epoch, bucket))."""
        import ray.data as rd

        results = [
            {"epoch": e, "skipped": True, "events": 0}
            for e, _ in epochs
            if self._epoch_done(e)
        ]
        pending = [(e, files) for e, files in epochs
                   if files and not self._epoch_done(e)]
        if not pending:
            return results
        t0 = time.perf_counter()
        prev = self.schema()
        running: pa.Schema | None = prev  # unify of everything <= e
        per_epoch_schema: dict[int, pa.Schema] = {}
        footer_schemas: dict[str, pa.Schema] = {}  # one read per footer
        for e, files in pending:
            # every segment footer, not files[0] only: a column appearing
            # mid-epoch must land in the epoch's unified schema; the
            # chain folds INCREMENTALLY (unify is a join — associative),
            # not O(epochs^2) re-unifications of the whole prefix
            for f in files:
                s0 = pq.read_schema(f)
                if "epoch_rec" in s0.names:  # reserved (see _normalize_batch)
                    s0 = s0.remove(s0.get_field_index("epoch_rec"))
                footer_schemas[f] = s0
            running = unify_schemas(
                ([running] if running is not None else [])
                + [footer_schemas[f] for f in files], self.aliases)
            s = running
            if self.extract and "html" in s.names and "text" not in s.names:
                # the parse stage PRODUCES text: declare it even when the
                # producer ships only raw html
                s = s.insert(s.get_field_index("html") + 1,
                             pa.field("text", pa.string()))
            per_epoch_schema[e] = s
        target = per_epoch_schema[pending[-1][0]]
        # One read over every pending segment (epoch recovered from the
        # segment path) so the whole tail flows through a single exchange.
        # Blocks are sized to ~64 MiB in-memory: Ray's default heuristic
        # splits small WAL segments into ~1k-row blocks, and per-block
        # fixed costs then dominate the shuffle (measured 10×).
        all_files = [f for _e, fs in pending for f in fs]
        on_disk = sum(os.path.getsize(f) for f in all_files)
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        # ~64 MiB in-memory blocks, rounded UP to a whole number of waves
        # so the map stage ends balanced (57 blocks on 32 cpus = a half-idle
        # second wave; 64 = two full waves).
        ideal = max(1, int(on_disk * 3 / (64 << 20)) + 1)
        waves = max(1, -(-ideal // cpus))
        blocks = min(waves * cpus, 16 * cpus)
        # Explicit RAW schema (union of the pending epochs' footers):
        # every block decodes to identical plain types — without it the
        # reader emits some blocks with dictionary-encoded string
        # columns and some plain (schema-divergence churn per bundle),
        # and Ray re-unifies schemas per block. Skipped when a rename
        # alias's old and new name would both land in the union (the
        # align stage must see only the raw names per epoch).
        raw_union = None
        try:
            # Unify over EVERY pending segment file, not one sample per
            # epoch: a column appearing mid-epoch would otherwise be
            # absent from the explicit read schema and its data silently
            # dropped. Footer reads are metadata-only; above a file-count
            # cap fall back to per-file inference (slower, never lossy).
            if len(all_files) <= 256:
                # reuse the footers already read for the evolution chain
                # (each footer is a remote round-trip on object storage)
                raw = [footer_schemas[f].remove_metadata()
                       for f in all_files]
            else:
                raise OSError("too many segment footers to sample")
            raw_union = pa.unify_schemas(raw, promote_options="permissive")
            if any(o in raw_union.names and n in raw_union.names
                   for o, n in self.aliases.items()):
                raw_union = None
        except (pa.ArrowInvalid, pa.ArrowTypeError, OSError):
            raw_union = None
        ds = rd.read_parquet(
            all_files, include_paths=True, override_num_blocks=blocks,
            **({"schema": raw_union} if raw_union is not None else {}),
        )
        # file-staged exchange: payload → per-bucket stage files; only
        # (bucket, epoch, path, counts) metadata rides the Ray shuffle
        # (see the comment block above _stage_batch for why). Medium is
        # re-resolved here — Ray is up, so the node count is known and a
        # multi-node cluster stages to the lake root FS, not /dev/shm.
        self.stage_dir = stage_dir = self._select_stage_dir()
        meta = ds.map_batches(
            partial(
                _map_stage_batch,
                target=target,
                aliases=self.aliases,
                n_buckets=self.G,
                extract=self.extract,
                stage_dir=stage_dir,
            ),
            batch_format="pyarrow",
        )
        stage_schema = target.append(pa.field(_EPOCH, pa.int64())).append(
            pa.field(_HASH, pa.int64())
        )
        manifests = meta.groupby("bucket").map_groups(
            partial(_reduce_bucket, root=self.root, salt=self.salt,
                    stage_schema=stage_schema),
            batch_format="pyarrow",
        )
        mrows = manifests.take_all()  # tiny: ≤ G × epochs rows
        # all (epoch, bucket) manifests committed → stage files are dead
        # (leftovers from a crash are harmless: re-staged rows are LWW
        # duplicates, and committed (epoch, bucket) pairs no-op)
        import shutil

        shutil.rmtree(stage_dir, ignore_errors=True)
        wall = time.perf_counter() - t0
        by_epoch: dict[int, list] = {}
        for r in mrows:
            by_epoch.setdefault(int(r["epoch"]), []).append(r)
        for e, _files in pending:
            # schema-evolution chain committed per epoch (unify of ≤ e)
            self._commit_schema(e, per_epoch_schema[e])
            _atomic_write(
                os.path.join(self.root, "_manifest", f"e{e:05d}.done"),
                json.dumps({"epoch": e, "buckets": len(by_epoch.get(e, []))}).encode(),
            )
            events = int(sum(r["events_in"] for r in by_epoch.get(e, [])))
            results.append(
                {
                    "epoch": e,
                    "skipped": False,
                    "events": events,
                    "wall_s": wall / len(pending),
                    "events_per_s": events / wall * len(pending) if wall else 0.0,
                    "buckets": len(by_epoch.get(e, [])),
                }
            )
        return sorted(results, key=lambda r: r["epoch"])

    def apply_epoch(self, epoch: int, files: list[str]) -> dict:
        """Apply one WAL epoch (single-epoch form of :meth:`apply_epochs`)."""
        return self.apply_epochs([(epoch, files)])[0]

    def apply_wal(self, wal_dir: str) -> list[dict]:
        """Tail the WAL directory: apply every uncommitted SEALED epoch,
        batched through one shuffle (resume point = the commit
        manifests, Kafka-offset analog). Unsealed or still-empty epoch
        dirs are left alone — marking a mid-write epoch done would
        silently skip its late segments forever (producers write parts
        first, seal last; dirs without any seal convention are treated
        as sealed for compatibility with externally staged WALs)."""
        listed = [(e, files) for e, files in list_epochs(wal_dir) if files]
        uses_seals = any(
            os.path.exists(os.path.join(os.path.dirname(files[0]),
                                        "_sealed"))
            for _e, files in listed)
        epochs = [
            (e, files) for e, files in listed
            if not uses_seals or os.path.exists(
                os.path.join(os.path.dirname(files[0]), "_sealed"))
        ]
        return self.apply_epochs(epochs)

    def ingest_warc(self, warc_dir: str, epoch: int) -> dict:
        """Ingest a directory of WARC files (a crawl snapshot) as ONE
        INSERT-only WAL epoch — the north-star loop closed end-to-end:
        Common-Crawl container → change events keyed by (url, warc_ts) →
        LWW upsert. Re-crawls land as later epochs; pages whose
        ``warc_ts`` advanced win LWW, unchanged urls stay.

        Deterministic: ``lsn`` is a pure hash of (url, warc_ts), so the
        same snapshot replays to the same state from any worker layout.
        Idempotent: the staging conversion overwrites its own directory
        and :meth:`apply_epoch` skips epochs whose commit manifests
        exist. Distributed end-to-end — the WARC decode and the WAL
        conversion run as one streaming map per file; nothing rows
        through the driver."""
        import shutil

        import ray.data as rd  # noqa: F401  (ensures Ray Data is up)

        from tenzir_ray.sources.warc import read_warc

        if self._epoch_done(epoch):
            return {"epoch": epoch, "skipped": True, "events": 0}
        # path carries `epoch=N`: the apply stage derives each row's
        # epoch from its segment path (same contract as WAL segments)
        stage = os.path.join(self.root, "_ingest", "warc",
                             f"epoch={epoch:06d}")
        shutil.rmtree(stage, ignore_errors=True)
        os.makedirs(stage, exist_ok=True)

        def to_events(t: pa.Table) -> pa.Table:
            # responses with a parseable url AND date only: a null
            # warc_ts would sort after every real timestamp in the LWW
            # reduce (malformed record permanently beating re-crawls)
            # and its NaN would poison the lsn hash
            t = t.filter(pc.and_(
                pc.equal(t.column("warc_type"), "response"),
                pc.and_(pc.is_valid(t.column("url")),
                        pc.is_valid(t.column("warc_ts")))))
            url = t.column("url")
            ts = t.column("warc_ts")
            h = _key_hashes(url).astype(np.uint64)
            # WARC/1.1 dates may carry fractional seconds
            # (sources/warc.py parses them to ns); second-truncation IS
            # the intended lsn-key semantics, so allow the lossy cast
            tsec = pc.cast(
                ts.combine_chunks().cast(
                    pa.timestamp("s"), safe=False),
                pa.int64()).to_numpy(zero_copy_only=False) \
                .astype(np.uint64)
            lsn = ((h ^ (tsec * np.uint64(0x9E3779B97F4A7C15)))
                   >> np.uint64(1)).astype(np.int64)  # 63-bit, positive
            return pa.table({
                "lsn": pa.array(lsn),
                "op": pa.array(["INSERT"] * t.num_rows, pa.string()),
                "url": url,
                "warc_ts": pc.cast(ts, pa.timestamp("ns")),
                "html": t.column("payload"),
            })

        read_warc(warc_dir).map_batches(
            to_events, batch_format="pyarrow").write_parquet(stage)
        files = sorted(glob.glob(os.path.join(stage, "*.parquet")))
        if not files:
            return {"epoch": epoch, "skipped": True, "events": 0}
        return self.apply_epoch(epoch, files)

    def _replica_horizon(self) -> int:
        """Lowest epoch whose state this lake can materialize. Normally
        tracked implicitly by base files; a REPLICA of a compacted
        source has no base of its own, so replication records the
        absorbed range here (``_manifest/_horizon``)."""
        try:
            with open(os.path.join(self.root, "_manifest",
                                   "_horizon")) as f:
                return int(f.read())
        except (FileNotFoundError, ValueError):
            return -1

    def _check_horizon(self, as_of: int | None) -> None:
        hz = self._replica_horizon()
        if as_of is not None and as_of < hz:
            raise TimeTravelHorizonError(
                f"state as of epoch {as_of} predates this replica's "
                f"replicated-base horizon (epoch {hz})")

    def _live_files_by_epoch(self) -> dict[int, list[str]]:
        """All live files across partitions, grouped by the epoch they
        replicate under: ``delta-e{e}`` → e, ``base-e{upto}`` → upto
        (a base stands in for every epoch it absorbed)."""
        out: dict[int, list[str]] = {}
        for p in range(self.P):
            files, _upto = _live_files(self.root, p)
            for f in files:
                out.setdefault(_file_epoch(f), []).append(f)
        return out

    def replicate_from(self, src: "Lake") -> list[dict]:
        """Incremental lake→replica CDC sync: apply every epoch committed
        in ``src`` but not yet here, using src's own live base/delta
        parquet as the WAL segments (Debezium-replica / cross-region
        follower analog; no reference dual — Tenzir nodes don't
        replicate stores).

        Correct by LWW idempotence: delta rows are the epoch's
        survivors, and re-applying any subset converges to the same
        state, so retries, crashes and overlapping syncs are all safe.
        Exactly-once via THIS lake's commit manifests — a crash mid-sync
        resumes from the first uncommitted epoch; re-running after
        convergence is a no-op. A src base file replicates under its
        covering epoch (src compaction collapses below-horizon epochs
        into one bootstrap apply); epochs absorbed by a base commit here
        as zero-event markers AFTER the batch apply succeeds, so a crash
        mid-sync never claims epochs whose data is absent. A source
        BASE only replicates onto a replica with no commits at or below
        its covering epoch (fresh bootstrap): compaction may have GC'd
        the tombstones that would mask older replica state, and a
        replica that committed an epoch the source later folded past has
        unreachable siblings — both shapes raise
        :class:`ReplicaLagError` (the Kafka
        consumer-off-the-retention-window analog) — re-bootstrap a
        fresh replica. A
        fresh replica (no commits) adopts the source's aliases/extract
        config; a non-fresh config mismatch raises. Replicated rows
        already carry the source's final ``text``, so extraction is
        skipped during the apply (also preserves a src ``extract=False``
        producer-text contract). Scale shape: file COPIES never happen —
        segments are symlink-staged under the cluster-visible stage dir
        and stream through the same single-exchange apply path as a WAL
        tail. Caveat: the symlinks point at src's LIVE files — if src
        compaction GCs them mid-sync the apply fails (cleanly retryable:
        manifests make the re-run resume); pause src auto-compaction
        around a sync to avoid the race."""
        import shutil

        src_done = src.committed_epochs()
        pend = sorted(src_done - self.committed_epochs())
        if not pend:
            return []
        mine_done = self.committed_epochs()
        if not mine_done:
            # fresh replica adopts the source's data-shaping config —
            # a silent aliases/extract mismatch would diverge the state
            if (self.aliases != src.aliases
                    or self.extract != src.extract):
                self.aliases = dict(src.aliases)
                self.extract = src.extract
                _atomic_write(
                    os.path.join(self.root, "_config.json"),
                    json.dumps({"partitions": self.P, "salt": self.salt,
                                "aliases": self.aliases,
                                "extract": self.extract}).encode(),
                )
        elif self.aliases != src.aliases:
            raise ValueError(
                "replicate_from: replica aliases differ from source — "
                "create the replica with the source's config")
        by_epoch = src._live_files_by_epoch()
        # epochs with a base file in their list: a base absorbs every
        # epoch <= its covering label
        base_uptos = sorted(
            e for e, fs in by_epoch.items()
            if any(os.path.basename(f).startswith("base-e") for f in fs))
        # a base may only land on a replica holding NO commits at or
        # below its covering epoch: src compaction may have GC'd the
        # tombstones, so overlaying a base on older partial state would
        # silently resurrect deleted rows
        for u in base_uptos:
            if u in pend and any(m <= u for m in mine_done):
                raise ReplicaLagError(
                    f"source base covering epoch {u} must replicate onto "
                    f"a replica with no commits <= {u} (its tombstones "
                    f"may be compacted away) — this replica already "
                    f"committed {sorted(m for m in mine_done if m <= u)}; "
                    f"re-bootstrap a fresh replica")
        results: list[dict] = []
        # stage under the cluster-aware exchange dir (NOT a driver-local
        # mkdtemp): on a multi-node cluster the apply's read tasks run on
        # other nodes and must see the symlinks
        stage = os.path.join(
            self.stage_dir, f"replicate-{os.getpid()}-{time.monotonic_ns()}")
        os.makedirs(stage, exist_ok=True)
        try:
            batch: list[tuple[int, list[str]]] = []
            absorbed: list[int] = []
            for e in pend:
                files = by_epoch.get(e)
                if not files:
                    # data lives in a src base; safe ONLY if that base is
                    # part of THIS sync (its covering epoch is pending) —
                    # otherwise the replica already committed the covering
                    # epoch from deltas and the absorbed rows are
                    # unreachable: it lagged past src's retention
                    covering = next((u for u in base_uptos
                                     if u >= e and u in pend), None)
                    if covering is None:
                        raise ReplicaLagError(
                            f"epoch {e}'s data was compacted into a "
                            f"source base whose covering epoch is already "
                            f"committed on this replica — the replica "
                            f"lagged past the source's retention; "
                            f"re-bootstrap a fresh replica")
                    absorbed.append(e)
                    continue
                # stage as epoch=N/ symlinks: the apply path recovers
                # each row's epoch from its segment path (mixed-epoch
                # single-exchange batching), and lake file names don't
                # carry the epoch= marker it looks for
                edir = os.path.join(stage, f"epoch={e}")
                os.makedirs(edir, exist_ok=True)
                links = []
                for i, f in enumerate(files):
                    ln = os.path.join(edir, f"seg{i:05d}.parquet")
                    os.symlink(os.path.abspath(f), ln)
                    links.append(ln)
                batch.append((e, links))
            if batch:
                # replicated rows already carry src's final text —
                # skip re-extraction during this apply (idempotent when
                # src extracted; REQUIRED when src.extract=False)
                old_extract, self.extract = self.extract, False
                try:
                    results.extend(self.apply_epochs(batch))
                finally:
                    self.extract = old_extract
            # absorbed markers AFTER the batch apply: a crash above
            # leaves them uncommitted and the next sync re-pends them
            for e in absorbed:
                s_hist = src.schema(as_of_epoch=e)
                if s_hist is not None:
                    self._commit_schema(e, s_hist)
                _atomic_write(
                    os.path.join(self.root, "_manifest",
                                 f"e{e:05d}.done"),
                    json.dumps({"epoch": e, "buckets": 0,
                                "absorbed": True}).encode(),
                )
                results.append({"epoch": e, "skipped": True, "events": 0})
            if absorbed:
                # replica time-travel horizon: states at/below the
                # absorbed range predate the replicated base and must
                # raise, not silently read empty (the replica has no
                # base file of its own for _live_files to notice)
                hz = max(absorbed) + 1
                cur = self._replica_horizon()
                if hz > cur:
                    _atomic_write(os.path.join(
                        self.root, "_manifest", "_horizon"),
                        str(hz).encode())
            results.sort(key=lambda r: r["epoch"])
        finally:
            shutil.rmtree(stage, ignore_errors=True)
        return results

    def _pending_epochs(self, wal_dir: str) -> list[tuple[int, list[str]]]:
        """Sealed, not-yet-committed WAL epochs (shared by the follow
        loops). A just-mkdir'd epoch has no parts yet; producers write
        parts first, seal last (or rename the whole dir atomically)."""
        return [
            (e, files) for e, files in list_epochs(wal_dir)
            if files
            and not self._epoch_done(e)
            and os.path.exists(
                os.path.join(os.path.dirname(files[0]), "_sealed")
            )
        ]

    def follow(self, wal_dir: str, poll_interval: float = 1.0,
               idle_rounds: int | None = None,
               compact_every: int | None = None):
        """Continuous tail: poll the WAL dir, apply new epochs as their
        segments appear, optionally auto-compacting — the ``every {…}`` /
        live-import loop of the reference (operators/every_cron.cpp,
        importer 'live' path). Yields one result list per non-empty apply;
        stops after ``idle_rounds`` consecutive empty polls (None = run
        forever; tests pass a bound)."""
        idle = 0
        applied_batches = 0
        while idle_rounds is None or idle < idle_rounds:
            pending = self._pending_epochs(wal_dir)
            if not pending:
                idle += 1
                time.sleep(poll_interval)
                continue
            idle = 0
            results = self.apply_epochs(pending)
            applied_batches += 1
            if compact_every and applied_batches % compact_every == 0:
                self.maybe_compact()
            yield results

    def follow_changes(self, wal_dir: str, poll_interval: float = 1.0,
                       idle_rounds: int | None = None,
                       compact_every: int | None = None):
        """Continuous CHANGEFEED tail: like :meth:`follow`, but after each
        non-empty apply yields ``(from_epoch, to_epoch, Dataset)`` — the
        net insert/update/delete feed that apply produced
        (:meth:`diff` over the window), which is what a downstream CDC
        consumer subscribes to (changes, not state). ``from_epoch`` is the
        newest epoch committed before the apply (None on the first —
        the bootstrap all-inserts feed). The feed itself is computed
        with :meth:`diff_epochs` over exactly the epochs this apply
        committed, so a lower-numbered epoch sealing AFTER a higher one
        was committed still has its changes emitted (an interval
        diff(from, to) would silently drop them).

        The yielded Dataset is lazy: when ``compact_every`` is set,
        consume it before advancing the generator — the next step's
        auto-compaction may fold the feed's window into a base."""
        idle = 0
        applied_batches = 0
        while idle_rounds is None or idle < idle_rounds:
            pending = self._pending_epochs(wal_dir)
            if not pending:
                idle += 1
                time.sleep(poll_interval)
                continue
            idle = 0
            before = self.committed_epochs()
            frm = max(before) if before else None
            results = self.apply_epochs(pending)
            new = {r["epoch"] for r in results}
            to = max(new | before)
            yield frm, to, self.diff_epochs(new, to_epoch=to)
            applied_batches += 1
            if compact_every and applied_batches % compact_every == 0:
                self.maybe_compact()

    # ------------------------------------------------------------- read

    def read(self, with_tombstones: bool = False, keep_engine_cols: bool = False,
             as_of_epoch: int | None = None, columns: list[str] | None = None):
        """Merge-on-read state as a Ray Dataset: one merge task per
        partition, no global shuffle (url → exactly one partition).

        ``as_of_epoch`` time-travels to the state after applying epochs
        ``<= as_of_epoch`` (the historical schema included). Bounded by the
        compaction horizon — reading past it raises
        :class:`TimeTravelHorizonError` (reference analog: retro export
        scans whatever partitions the catalog retains,
        operators/export.cpp:47-67; the LSM here retains exactly
        base-horizon..head).

        ``columns`` pushes the projection into the per-partition parquet
        scan (plus the merge-required key/order/tombstone set) — an
        `export | select url, lang` never decodes the html payload."""
        import ray.data as rd

        self._check_horizon(as_of_epoch)
        schema = self.schema(as_of_epoch=as_of_epoch)
        if schema is None:
            raise ValueError("empty lake" if as_of_epoch is None else
                             f"no epoch <= {as_of_epoch} committed")
        ds = rd.from_items([{"pid": p} for p in range(self.P)])
        return ds.map_batches(
            partial(
                _merge_partition,
                root=self.root,
                schema=schema,
                with_tombstones=with_tombstones,
                keep_engine_cols=keep_engine_cols,
                as_of=as_of_epoch,
                columns=columns,
            ),
            batch_format="pyarrow",
            batch_size=1,
        )

    def read_table(self, **kw) -> pa.Table:
        """Small-scale convenience: full merged state as one Arrow table."""
        as_of = kw.get("as_of_epoch")
        self._check_horizon(as_of)
        schema = self.schema(as_of_epoch=as_of)
        if schema is None:
            raise ValueError("empty lake")
        batch = pa.table({"pid": pa.array(range(self.P), pa.int32())})
        return _merge_partition(
            batch, root=self.root, schema=schema,
            with_tombstones=kw.get("with_tombstones", False),
            keep_engine_cols=kw.get("keep_engine_cols", False),
            as_of=as_of,
            columns=kw.get("columns"),
        )

    def diff(self, from_epoch: int | None, to_epoch: int | None = None,
             columns: list[str] | None = None):
        """CDC changefeed between two committed snapshots (Delta-Lake
        ``table_changes`` analog): one row per url whose LWW survivor
        changed between the state as-of ``from_epoch`` and as-of
        ``to_epoch`` (default: latest committed epoch), carrying the
        ``to``-side survivor's columns plus ``change`` ∈
        {insert, update, delete}.

        - ``insert``: live at ``to``, absent-or-tombstoned at ``from``;
        - ``update``: live at both with a different winning
          ``(warc_ts, lsn)`` — the CDC notion of change;
        - ``delete``: tombstone won at ``to`` over a live ``from`` row
          (the row carries the delete event's url/warc_ts, payload null).

        ``from_epoch=None`` diffs against the empty lake (all-inserts
        bootstrap feed). One task per partition, no shuffle; candidate
        urls are pruned to the window's delta files and both horizon
        reads are filter-pushdown restricted to them — at 100 TB a
        quiet-epoch diff touches only the changed rows' row groups.
        ``columns`` pushes a projection into the scan (output =
        url + columns + change; the from-horizon always reads only the
        key/order/tombstone set). Raises
        :class:`TimeTravelHorizonError` when either horizon was
        compacted away (sequential dual: ``cdc.oracle.diff_wal``)."""
        import ray.data as rd

        if to_epoch is None:
            done = self.committed_epochs()
            if not done:
                raise ValueError("empty lake")
            to_epoch = max(done)
        schema_b = self.schema(as_of_epoch=to_epoch)
        if schema_b is None:
            raise ValueError(f"no epoch <= {to_epoch} committed")
        schema_a = (self.schema(as_of_epoch=from_epoch)
                    if from_epoch is not None else None)
        self._check_horizon(from_epoch)
        self._check_horizon(to_epoch)
        if columns is not None:
            known = set(_read_schema(schema_b).names) | {"change"}
            bad = [c for c in columns if c not in known]
            if bad:
                raise ValueError(f"diff: unknown column(s) {bad}")
        # eager horizon validation (metadata-only: one dir glob per
        # partition) — a compacted-away horizon (either end) raises HERE
        # with a clean TimeTravelHorizonError instead of surfacing as a
        # RayTaskError from inside a task at consume time
        for p in range(self.P):
            _live_files(self.root, p, as_of=to_epoch)
            if from_epoch is not None:
                _live_files(self.root, p, as_of=from_epoch)
        ds = rd.from_items([{"pid": p} for p in range(self.P)])
        return ds.map_batches(
            partial(
                _diff_partition,
                root=self.root,
                schema_a=schema_a,
                schema_b=schema_b,
                from_epoch=from_epoch,
                to_epoch=to_epoch,
                columns=columns,
            ),
            batch_format="pyarrow",
            batch_size=1,
        )

    def diff_epochs(self, epochs, to_epoch: int | None = None):
        """Changefeed attributable to an explicit committed epoch SET:
        the net insert/update/delete between the live state WITHOUT those
        epochs' delta files and the state with them. Order-independent —
        this stays well-defined when a lower-numbered epoch seals after a
        higher one was already committed, where the interval form
        :meth:`diff` cannot express the pre-state. Same output contract
        and scale shape as :meth:`diff`."""
        import ray.data as rd

        epochs = frozenset(int(e) for e in epochs)
        if not epochs:
            raise ValueError("diff_epochs: empty epoch set")
        committed = self.committed_epochs()
        missing = epochs - committed
        if missing:
            raise ValueError(
                f"diff_epochs: epoch(s) {sorted(missing)} not committed")
        if to_epoch is None:
            to_epoch = max(committed)
        self._check_horizon(min(epochs))
        schema_b = self.schema(as_of_epoch=to_epoch)
        # eager horizon validation (metadata-only): a window epoch folded
        # into a base has no recoverable pre-state
        for p in range(self.P):
            _files, upto = _live_files(self.root, p, as_of=to_epoch)
            if upto >= 0 and min(epochs) <= upto:
                raise TimeTravelHorizonError(
                    f"partition {p}: epoch(s) "
                    f"{sorted(e for e in epochs if e <= upto)} were "
                    f"compacted into base-e{upto}"
                )
        ds = rd.from_items([{"pid": p} for p in range(self.P)])
        return ds.map_batches(
            partial(
                _diff_partition,
                root=self.root,
                schema_a=None,
                schema_b=schema_b,
                from_epoch=None,
                to_epoch=to_epoch,
                window_epochs=epochs,
            ),
            batch_format="pyarrow",
            batch_size=1,
        )

    # ------------------------------------------------------- compaction

    def maybe_compact(self, max_deltas: int = 8,
                      gc_before_epoch: int | None = None):
        """Auto-compaction trigger: compact only partitions whose live
        delta count exceeds ``max_deltas`` (reference: rebuild selects
        undersized partitions <0.8× capacity on a 2 h cadence,
        builtins/commands/rebuild.cpp:90-92, defaults.hpp:227 — here the
        trigger is delta-stack depth, the LSM read-amplification metric)."""
        hot = [
            p for p in range(self.P)
            if len([
                f for f in _live_files(self.root, p)[0]
                if os.path.basename(f).startswith("delta-")
            ]) > max_deltas
        ]
        if not hot:
            return []
        return self.compact(gc_before_epoch=gc_before_epoch, pids=hot)

    def compact(self, gc_before_epoch: int | None = None,
                pids: list[int] | None = None):
        """Merge deltas into new per-partition bases; GC dead files and
        tombstones (see _compact_partition). Returns per-partition stats."""
        import ray.data as rd

        schema = self.schema()
        if schema is None:
            return []
        ds = rd.from_items(
            [{"pid": p} for p in (range(self.P) if pids is None else pids)]
        )
        out = ds.map_batches(
            partial(
                _compact_partition,
                root=self.root,
                schema=schema,
                gc_before_epoch=gc_before_epoch,
            ),
            batch_format="pyarrow",
            batch_size=1,
        )
        return out.take_all()

    # ----------------------------------------------------------- lookup

    def lookup(self, urls: list[str], as_of_epoch: int | None = None) -> pa.Table:
        """Point lookup of live rows for the given urls — the `export` /
        `lookup` fast path (reference: catalog-pruned partition selection,
        libtenzir/src/index.cpp:893-1030). Pruning is structural: a url's
        partition is ``hash(url) % G // salt``, so only those partitions'
        files are opened, with an ``isin`` row filter pushed into the
        parquet scan. ``as_of_epoch`` looks up the historical state."""
        schema = self.schema(as_of_epoch=as_of_epoch)
        if schema is None:
            raise ValueError("empty lake")
        h = _key_hashes(pa.array(urls, pa.string())).astype(np.uint64)
        pids = sorted({int(b) // self.salt for b in h % np.uint64(self.G)})
        flt = pads.field("url").isin(urls)
        out = []
        for pid in pids:
            t = _read_partition(self.root, pid, schema, filter=flt,
                                as_of=as_of_epoch)
            if t is None or t.num_rows == 0:
                continue
            t = lww_reduce(t)
            t = t.filter(pc.invert(_is_delete(t)))
            out.append(t.drop_columns(
                [c for c in ENGINE_COLS if c in t.column_names]))
        if not out:
            return pa.schema(
                [f for f in schema if f.name not in ENGINE_COLS]
            ).empty_table()
        return pa.concat_tables(out, promote_options="permissive")

    # -------------------------------------------------- skew diagnostics

    def hot_buckets(self, factor: float = 4.0) -> list[dict]:
        """Buckets whose per-epoch event volume exceeds ``factor`` × the
        median — the detection half of salt-based skew splitting (the
        mitigation half is (a) the per-batch LWW combiner, which collapses
        hot single urls before the exchange, and (b) raising ``salt`` for
        a new lake generation to split hot partitions across more writer
        tasks)."""
        lin = self.lineage()
        if lin.num_rows == 0:
            return []
        df = lin.select(["bucket", "epoch", "events_in"]).to_pandas()
        med = max(1.0, float(df["events_in"].median()))
        hot = df[df["events_in"] > factor * med]
        return [
            {"bucket": int(r.bucket), "epoch": int(r.epoch),
             "events_in": int(r.events_in), "x_median": float(r.events_in / med)}
            for r in hot.itertuples()
        ]

    # ---------------------------------------------------------- lineage

    def lineage(self) -> pa.Table:
        """All commit manifests as one table (per-partition lineage +
        throughput metrics; reference analog: operator metrics,
        pipeline.hpp:183-262)."""
        rows = []
        for p in sorted(
            glob.glob(os.path.join(self.root, "_manifest", "e*-b*.json"))
        ):
            with open(p) as f:
                rows.append(json.load(f))
        if not rows:
            return _manifest_table(
                {
                    "partition_id": 0, "bucket": 0, "epoch": 0, "max_lsn": 0,
                    "files": [], "num_rows": 0, "num_tombstones": 0,
                    "min_url": "", "max_url": "", "wall_s": 0.0,
                    "events_per_s": 0.0,
                }
            ).slice(0, 0)
        return pa.concat_tables([_manifest_table(r) for r in rows])

    def partitions(self) -> pa.Table:
        """Catalog-style partition inventory (operators/partitions.cpp —
        the reference lists every partition with schema, event count and
        size): one row per lake data file with its partition, kind
        (base/delta), epoch coverage, bucket, rows and on-disk bytes.
        Metadata-only: parquet footers + stat(), no data reads."""
        rows = {k: [] for k in ("partition_id", "kind", "epoch", "bucket",
                                "path", "num_rows", "bytes")}
        for p in sorted(glob.glob(os.path.join(self.root, "p=*", "*.parquet"))):
            name = os.path.basename(p)
            pid = int(os.path.basename(os.path.dirname(p)).split("=")[1])
            if name.startswith("base-e"):
                kind, epoch, bucket = "base", int(
                    name[len("base-e"):].split(".")[0].split("-")[0]), -1
            elif name.startswith("delta-e"):
                kind = "delta"
                bits = name[len("delta-e"):].split(".")[0].split("-b")
                epoch, bucket = int(bits[0]), int(bits[1])
            else:
                continue
            rows["partition_id"].append(pid)
            rows["kind"].append(kind)
            rows["epoch"].append(epoch)
            rows["bucket"].append(bucket)
            rows["path"].append(p)
            rows["num_rows"].append(pq.read_metadata(p).num_rows)
            rows["bytes"].append(os.path.getsize(p))
        return pa.table({
            "partition_id": pa.array(rows["partition_id"], pa.int32()),
            "kind": pa.array(rows["kind"], pa.string()),
            "epoch": pa.array(rows["epoch"], pa.int64()),
            "bucket": pa.array(rows["bucket"], pa.int32()),
            "path": pa.array(rows["path"], pa.string()),
            "num_rows": pa.array(rows["num_rows"], pa.int64()),
            "bytes": pa.array(rows["bytes"], pa.int64()),
        })

    def schemas(self) -> pa.Table:
        """Schema-evolution history (operators/schemas.cpp analog): one
        row per (schema-commit epoch, field) with the field's type — the
        unified schema as committed after each epoch."""
        rows = {k: [] for k in ("epoch", "field", "type")}
        for p in sorted(glob.glob(
                os.path.join(self.root, "_manifest", "schema-e*.json"))):
            e = int(os.path.basename(p)[len("schema-e"):-len(".json")])
            with open(p) as f:
                s = pa.ipc.read_schema(
                    pa.py_buffer(b64decode(json.load(f)["schema"])))
            for fld in s:
                rows["epoch"].append(e)
                rows["field"].append(fld.name)
                rows["type"].append(str(fld.type))
        return pa.table({
            "epoch": pa.array(rows["epoch"], pa.int64()),
            "field": pa.array(rows["field"], pa.string()),
            "type": pa.array(rows["type"], pa.string()),
        })
