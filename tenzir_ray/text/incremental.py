"""Incremental MinHash-LSH dedup at ingest.

The batch dedup family (:mod:`tenzir_ray.text.dedup`) recomputes the
whole corpus's signatures per run. A CDC-style ingest pipeline instead
sees the corpus one epoch at a time and must answer "is this new page a
near-dup of anything ALREADY ingested?" without touching old text. This
module keeps a persistent **signature store** — the banded MinHash keys
of every *surviving* document, one parquet file set per committed epoch
— and dedups each incoming epoch against it:

- a new doc is dropped iff it shares any LSH band bucket with a
  prior-epoch survivor, OR its within-epoch one-hop min-label
  representative (:func:`tenzir_ray.text.dedup.lsh_candidate_pairs`
  semantics) has a smaller id;
- only the epoch's survivors enter the store (RefinedWeb-style: dropped
  docs never index), so the store grows with the UNIQUE corpus, not the
  raw stream;
- epoch commits are atomic (tmp dir + rename + ``.done`` marker) and
  idempotent: re-applying a committed epoch recomputes the same drop
  decision from the same ``< epoch`` store prefix and no-ops the append
  — the same marker-replay contract as the lake's manifests.

Scale shape: document text is shingled once per epoch (map-only); only
narrow ``(doc, band, band_key)`` int64 rows are materialized, shuffled
(salt-bucketed band_reduce) or stored. The store is scanned streaming
with a broadcast membership probe sized by the NEW epoch (epochs are
bounded by construction in a CDC tail; the store — corpus-sized — never
rides a shuffle and is never collected). No reference analog (Tenzir
has no corpus-text ops); the incremental shape mirrors its
deduplicate operator's persistent suppression state
(deduplicate.cpp:126-260) re-expressed over a parquet store.
"""

from __future__ import annotations

import glob
import os
import shutil
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
from ray.data import Dataset

from tenzir_ray.text.dedup import _minhash_batch, anti_filter_ids

#: golden-ratio multiplier fusing (band, band_key) into one uint64 probe
#: key (wrapping arithmetic; identical expression in the sequential
#: oracle — a fused collision is a 2^-64-per-pair event, same risk class
#: as the shingle hashes themselves)
_FUSE = np.uint64(0x9E3779B97F4A7C15)

_SIG_SCHEMA = pa.schema([
    pa.field("doc", pa.int64()),
    pa.field("band", pa.int64()),
    pa.field("band_key", pa.int64()),
])


def fuse_band_keys(band: np.ndarray, band_key: np.ndarray) -> np.ndarray:
    """(band, band_key) → one int64 probe key (wrapping uint64 mix)."""
    fused = band_key.astype(np.int64).view(np.uint64) ^ (
        band.astype(np.uint64) * _FUSE)
    return fused.view(np.int64)


class SignatureStore:
    """Persistent banded-signature store: ``root/e{epoch:05d}/*.parquet``
    per committed epoch plus an ``e{epoch:05d}.done`` marker. Readers see
    only committed epochs; a crashed append leaves an unmarked tmp dir
    that the next attempt replaces. Subclasses override ``SCHEMA`` for
    other key shapes (:class:`HashStore`)."""

    SCHEMA = _SIG_SCHEMA

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _dir(self, epoch: int) -> str:
        return os.path.join(self.root, f"e{epoch:05d}")

    def _marker(self, epoch: int) -> str:
        return os.path.join(self.root, f"e{epoch:05d}.done")

    def committed(self, epoch: int) -> bool:
        return os.path.exists(self._marker(epoch))

    def epochs(self) -> list[int]:
        return sorted(
            int(os.path.basename(m)[1:-5])
            for m in glob.glob(os.path.join(self.root, "e*.done"))
        )

    def files(self, before_epoch: int | None = None) -> list[str]:
        """Parquet files of every committed epoch ``< before_epoch``."""
        out: list[str] = []
        for e in self.epochs():
            if before_epoch is not None and e >= before_epoch:
                continue
            out.extend(sorted(glob.glob(
                os.path.join(self._dir(e), "*.parquet"))))
        return out

    def append(self, epoch: int, sigs: pa.Table) -> bool:
        """Atomically commit one epoch's survivor signatures; no-op
        (returns False) when the epoch is already committed."""
        if self.committed(epoch):
            return False
        tmp = f"{self._dir(epoch)}.tmp.{os.getpid()}.{time.monotonic_ns()}"
        os.makedirs(tmp, exist_ok=True)
        pq.write_table(sigs.cast(self.SCHEMA),
                       os.path.join(tmp, "part-000.parquet"))
        shutil.rmtree(self._dir(epoch), ignore_errors=True)
        os.replace(tmp, self._dir(epoch))
        with open(self._marker(epoch) + ".tmp", "w") as f:
            f.write(str(sigs.num_rows))
        os.replace(self._marker(epoch) + ".tmp", self._marker(epoch))
        return True


def incremental_minhash_dedup(
    ds_new: Dataset, store: SignatureStore | str, epoch: int,
    id_col: str = "doc_id", text_col: str = "text",
    num_perm: int = 64, bands: int = 16, ngram: int = 3,
    seed: int = 1337, max_broadcast_bytes: int | None = None,
) -> Dataset:
    """Dedup one incoming epoch against the signature store (and within
    itself), commit the survivors' signatures, and return the surviving
    rows of ``ds_new``.

    The epoch's band rows are computed once (vectorized
    :func:`_minhash_batch` shingling) and cached as a narrow
    materialized dataset; the store scan ships only MATCHED rows back
    (a broadcast ``pc.is_in`` probe against the new epoch's fused key
    set — epoch-sized, not store-sized). Docs with null text have no
    bands and always survive (consistent with the batch family)."""
    import functools

    import ray
    import ray.data as rd
    from ray.data.aggregate import Min

    if isinstance(store, str):
        store = SignatureStore(store)

    banded = ds_new.map_batches(
        functools.partial(
            _minhash_batch, id_col=id_col, text_col=text_col,
            num_perm=num_perm, bands=bands, ngram=ngram, seed=seed),
        batch_format="pyarrow",
        batch_size=1024,
    ).materialize()  # narrow (3 × int64 × bands/doc); consumed 4×

    # banded is materialized, so its block refs are free to enumerate;
    # the three narrow follow-ups (fused-key extraction, store-hit doc
    # drops, survivor-signature filter) run as raw per-block Ray tasks
    # on those refs — zero extra Dataset executions per epoch (each one
    # used to cost a full pipeline-execution round trip)
    banded_refs = [r for b in banded.iter_internal_ref_bundles()
                   for r in b.block_refs]

    @ray.remote
    def _fused_of_block(t: pa.Table) -> pa.Array:
        if t.num_rows == 0 or "band" not in t.column_names:
            return pa.array([], pa.int64())
        f = fuse_band_keys(
            t.column("band").to_numpy(zero_copy_only=False),
            t.column("band_key").to_numpy(zero_copy_only=False))
        return pa.array(np.unique(f), pa.int64())

    @ray.remote
    def _concat_unique(*arrs) -> pa.Array:
        parts = [a.to_numpy(zero_copy_only=False) for a in arrs if len(a)]
        if not parts:
            return pa.array([], pa.int64())
        return pa.array(np.unique(np.concatenate(parts)), pa.int64())

    new_keys_ref = _concat_unique.remote(
        *[_fused_of_block.remote(r) for r in banded_refs])

    # ---- store probe: which of the new epoch's buckets already exist?
    # One raw read task per store file (parquet footer + narrow int64
    # columns), each probing against the broadcast epoch key set — the
    # store is scanned streaming, never collected.
    store_files = store.files(before_epoch=epoch)
    if store_files:
        @ray.remote
        def _probe_file(path: str, keys: pa.Array) -> pa.Array:
            t = pq.read_table(path, columns=["band", "band_key"])
            if t.num_rows == 0:
                return pa.array([], pa.int64())
            f = fuse_band_keys(
                t.column("band").to_numpy(zero_copy_only=False),
                t.column("band_key").to_numpy(zero_copy_only=False))
            hit = pc.is_in(pa.array(f, pa.int64()), value_set=keys)
            return pa.array(
                np.unique(f[hit.to_numpy(zero_copy_only=False)]),
                pa.int64())

        matched_ref = _concat_unique.remote(
            *[_probe_file.remote(p, new_keys_ref) for p in store_files])
    else:
        matched_ref = None

    # ---- within-epoch one-hop min-label (salt-bucketed band_reduce)
    def add_salt(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "band_key" not in t.column_names:
            return pa.table({
                "doc": pa.array([], pa.int64()),
                "band": pa.array([], pa.int64()),
                "band_key": pa.array([], pa.int64()),
                "bk_salt": pa.array([], pa.int64())})
        return t.append_column(
            "bk_salt", pc.bit_wise_and(t.column("band_key"), 255))

    def band_reduce(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"doc": pa.array([], pa.int64()),
                             "rep": pa.array([], pa.int64())})
        keys = g.column("band_key").to_numpy(zero_copy_only=False)
        docs = g.column("doc").to_numpy(zero_copy_only=False)
        order = np.lexsort((docs, keys))
        k, d = keys[order], docs[order]
        starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        bucket_min = np.minimum.reduceat(d, starts)
        rep = np.repeat(bucket_min, np.diff(np.r_[starts, len(k)]))
        return pa.table({"doc": pa.array(d, pa.int64()),
                         "rep": pa.array(rep, pa.int64())})

    reps = (banded.map_batches(add_salt, batch_format="pyarrow")
            .groupby(["band", "bk_salt"])
            .map_groups(band_reduce, batch_format="pyarrow")
            .groupby("doc").aggregate(Min(on="rep", alias_name="rep")))

    def to_drops(t: pa.Table) -> pa.Table:
        # native aggregates emit zero-column blocks for empty partitions
        if "doc" not in t.column_names:
            return pa.table({"__drop_id": pa.array([], pa.int64())})
        t = t.filter(pc.less(t.column("rep"), t.column("doc")))
        return pa.table({"__drop_id": pc.cast(t.column("doc"), pa.int64())})

    within_drops = reps.map_batches(to_drops, batch_format="pyarrow")

    @ray.remote
    def _store_drops_block(t: pa.Table, matched: pa.Array) -> pa.Array:
        # docs sharing ANY bucket with a prior-epoch survivor
        if t.num_rows == 0 or "band" not in t.column_names \
                or len(matched) == 0:
            return pa.array([], pa.int64())
        f = fuse_band_keys(
            t.column("band").to_numpy(zero_copy_only=False),
            t.column("band_key").to_numpy(zero_copy_only=False))
        hit = pc.is_in(pa.array(f, pa.int64()), value_set=matched)
        docs = t.column("doc").to_numpy(zero_copy_only=False)
        return pa.array(
            np.unique(docs[hit.to_numpy(zero_copy_only=False)]),
            pa.int64())

    store_drop_refs = ([] if matched_ref is None else
                       [_store_drops_block.remote(r, matched_ref)
                        for r in banded_refs])

    # drop ids are needed twice (survivor filter + signature commit):
    # assemble ONCE in a remote task — the driver only holds the ref.
    # The set is epoch-bounded (ids of this epoch's dropped docs only).
    # Only the within-epoch min-label pass is a Dataset execution (it
    # carries the one shuffle); the store-hit drops arrive as raw task
    # results on the same concat.
    @ray.remote
    def _concat_ids(n_blocks: int, *parts_in) -> pa.Table:
        blocks, arrs = parts_in[:n_blocks], parts_in[n_blocks:]
        parts = [b.column("__drop_id").combine_chunks().to_numpy(
            zero_copy_only=False) for b in blocks
            if b.num_rows and "__drop_id" in b.column_names]
        parts += [a.to_numpy(zero_copy_only=False) for a in arrs if len(a)]
        ids = (np.unique(np.concatenate(parts)) if parts
               else np.zeros(0, np.int64))
        return pa.table({"__drop_id": pa.array(ids, pa.int64())})

    drop_refs = [r for b in within_drops.iter_internal_ref_bundles()
                 for r in b.block_refs]
    drop_ids_ref = _concat_ids.remote(
        len(drop_refs), *drop_refs, *store_drop_refs)

    # ---- commit survivors' signatures (idempotent per epoch); the
    # per-block filter and the concat + parquet write are raw remote
    # tasks against the materialized banded blocks and the
    # (cluster-shared, like the lake root) store filesystem
    if not store.committed(epoch):
        @ray.remote
        def _survivor_sigs_block(t: pa.Table, drop_t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "doc" not in t.column_names:
                return _SIG_SCHEMA.empty_table()
            vs = drop_t.column("__drop_id").combine_chunks()
            keep = pc.invert(pc.is_in(
                t.column("doc").combine_chunks(), value_set=vs))
            return t.filter(keep).select(
                ["doc", "band", "band_key"]).cast(_SIG_SCHEMA)

        @ray.remote
        def _commit(root: str, e: int, *blocks) -> bool:
            tabs = [b for b in blocks if b.num_rows]
            sigs = (pa.concat_tables(tabs) if tabs
                    else _SIG_SCHEMA.empty_table())
            return SignatureStore(root).append(e, sigs)

        sig_refs = [_survivor_sigs_block.remote(r, drop_ids_ref)
                    for r in banded_refs]
        ray.get(_commit.remote(store.root, epoch, *sig_refs))

    drops_ds = rd.from_arrow_refs([drop_ids_ref])
    return anti_filter_ids(ds_new, drops_ds, id_col, "__drop_id",
                           max_broadcast_bytes=max_broadcast_bytes)


_HASH_SCHEMA = pa.schema([pa.field("h", pa.int64())])


class HashStore(SignatureStore):
    """Persistent content-hash store (one int64 per surviving document)
    — the exact-dedup analog of the banded signature store, same atomic
    epoch-commit/marker contract."""

    SCHEMA = _HASH_SCHEMA


def incremental_exact_dedup(
    ds_new: Dataset, store: HashStore | str, epoch: int,
    id_col: str = "doc_id", text_col: str = "text",
    max_broadcast_bytes: int | None = None,
) -> Dataset:
    """Exact content dedup AT INGEST: drop a new document iff its
    64-bit content hash was seen in any PRIOR committed epoch, or a
    smaller-id document of the SAME epoch shares it; append the
    survivors' hashes as this epoch's store segment (atomic,
    idempotent — replaying a committed epoch recomputes the same drop
    decision from the same ``< epoch`` store prefix and no-ops the
    append). The production-default dedup-at-ingest: RefinedWeb-style,
    dropped docs never index, the store grows with the UNIQUE corpus.

    Scale shape: document text is hashed once (map-only); only
    ``(h, id)`` int64 pairs are materialized or exchanged. The store is
    probed file-by-file in parallel remote tasks against a broadcast
    epoch key set (epoch-sized, not store-sized); matched keys shipped
    back are bounded by the epoch. Null text hashes like a value (all
    null docs are mutual duplicates), matching the batch family's
    ``exact_dedup`` grouping semantics."""
    import pandas as pd
    import ray

    from tenzir_ray.text.dedup import anti_filter_ids

    if isinstance(store, str):
        store = HashStore(store)

    def project(t: pa.Table) -> pa.Table:
        col = t.column(text_col).combine_chunks()
        h = pd.util.hash_array(
            col.to_numpy(zero_copy_only=False)).view(np.int64)
        return pa.table({
            "h": pa.array(h, pa.int64()),
            "hs": pa.array(h & np.int64(1023), pa.int64()),
            id_col: t.column(id_col).combine_chunks()})

    proj = ds_new.map_batches(
        project, batch_format="pyarrow").materialize()  # 3×int64/doc
    proj_refs = [r for b in proj.iter_internal_ref_bundles()
                 for r in b.block_refs]

    @ray.remote
    def _keys_of_block(t: pa.Table) -> pa.Array:
        if t.num_rows == 0 or "h" not in t.schema.names:
            return pa.array([], pa.int64())
        return pa.array(np.unique(
            t.column("h").to_numpy(zero_copy_only=False)), pa.int64())

    @ray.remote
    def _concat_unique(*arrs) -> pa.Array:
        vals = [a.to_numpy(zero_copy_only=False) for a in arrs if len(a)]
        if not vals:
            return pa.array([], pa.int64())
        return pa.array(np.unique(np.concatenate(vals)), pa.int64())

    new_keys_ref = _concat_unique.remote(
        *[_keys_of_block.remote(r) for r in proj_refs])

    store_files = store.files(before_epoch=epoch)
    if store_files:
        @ray.remote
        def _probe_file(path: str, keys: pa.Array) -> pa.Array:
            t = pq.read_table(path, columns=["h"])
            if t.num_rows == 0:
                return pa.array([], pa.int64())
            col = t.column("h").combine_chunks()
            hit = pc.is_in(col, value_set=keys)
            return pa.array(np.unique(
                col.to_numpy(zero_copy_only=False)[
                    hit.to_numpy(zero_copy_only=False)]), pa.int64())

        matched_ref = _concat_unique.remote(
            *[_probe_file.remote(p, new_keys_ref) for p in store_files])
    else:
        matched_ref = None

    # within-epoch: every id but the min per hash (salt-sliced segment
    # pass — the exact_dedup_wide losers kernel)
    def losers(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "h" not in g.column_names:
            return pa.table({id_col: pa.array([], pa.int64())})
        g = g.take(pc.sort_indices(g, sort_keys=[
            ("h", "ascending"), (id_col, "ascending")]))
        h = g.column("h").to_numpy(zero_copy_only=False)
        firsts = np.r_[True, h[1:] != h[:-1]]
        return g.filter(pa.array(~firsts)).select([id_col])

    drops = proj.groupby("hs").map_groups(losers, batch_format="pyarrow")
    # executes the one narrow shuffle; its blocks and the store-hit
    # task results feed a single remote concat -- the driver holds only
    # a ref (the minhash variant's _concat_ids contract: no corpus- or
    # drop-set-sized rows ever cross the driver)
    drops_refs = [r for b in drops.iter_internal_ref_bundles()
                  for r in b.block_refs]

    if matched_ref is not None:
        @ray.remote
        def _store_hit_ids(t: pa.Table, matched: pa.Array) -> pa.Table:
            if t.num_rows == 0 or "h" not in t.schema.names \
                    or len(matched) == 0:
                return pa.table({id_col: pa.array([], pa.int64())})
            hit = pc.is_in(t.column("h").combine_chunks(),
                           value_set=matched)
            return t.filter(hit).select([id_col])

        store_hit_refs = [_store_hit_ids.remote(r, matched_ref)
                          for r in proj_refs]
    else:
        store_hit_refs = []

    @ray.remote
    def _concat_ids(n_blocks: int, *parts) -> pa.Table:
        blocks, hits = parts[:n_blocks], parts[n_blocks:]
        arrs = [b.column(id_col).combine_chunks().to_numpy(
            zero_copy_only=False) for b in blocks
            if b.num_rows and id_col in b.schema.names]
        arrs += [t.column(id_col).combine_chunks().to_numpy(
            zero_copy_only=False) for t in hits if t.num_rows]
        ids = (np.unique(np.concatenate(arrs)) if arrs
               else np.zeros(0, np.int64))
        return pa.table({"__drop_id": pa.array(ids, pa.int64())})

    drop_ids_ref = _concat_ids.remote(
        len(drops_refs), *drops_refs, *store_hit_refs)

    # survivor hashes -> this epoch's store segment (idempotent); the
    # per-block filter and the parquet append run as remote tasks
    # against the (cluster-shared, like the lake root) store filesystem
    if not store.committed(epoch):
        @ray.remote
        def _survivor_hashes(t: pa.Table, drop_t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "h" not in t.schema.names:
                return _HASH_SCHEMA.empty_table()
            vs = drop_t.column("__drop_id").combine_chunks()
            live = pc.invert(pc.is_in(
                t.column(id_col).combine_chunks(), value_set=vs))
            h = t.filter(live).column("h").to_numpy(zero_copy_only=False)
            return pa.table({"h": pa.array(np.unique(h), pa.int64())})

        @ray.remote
        def _commit(root: str, e: int, *tabs) -> bool:
            tabs = [t for t in tabs if t.num_rows]
            return HashStore(root).append(
                e, pa.concat_tables(tabs) if tabs
                else _HASH_SCHEMA.empty_table())

        ray.get(_commit.remote(
            store.root, epoch,
            *[_survivor_hashes.remote(r, drop_ids_ref)
              for r in proj_refs]))

    import ray.data as rd

    return anti_filter_ids(
        ds_new, rd.from_arrow_refs([drop_ids_ref]), id_col, "__drop_id",
        max_broadcast_bytes=max_broadcast_bytes)



def compact_store(store: SignatureStore | str, before_epoch: int,
                  files_per_output: int = 64) -> int:
    """Merge every committed epoch segment ``< before_epoch`` into the
    LOWEST merged epoch's directory — the dedup-store analog of the
    lake's ``compact()``: without it, a long-running ingest probes one
    file set per epoch forever (1e5 epochs → 1e5 probe tasks per new
    epoch). Returns the number of input files merged (0 = nothing to
    do).

    Semantics: probing is row-set-preserving (the merged files hold the
    union of the merged epochs' rows; probe hit sets are unique-ed
    downstream, so no row-level dedup is needed), so every FUTURE epoch
    sees exactly the same drop decisions. What compaction gives up is
    consistent REPLAY of epochs ``< before_epoch`` — the same finality
    contract as lake compaction: compact only below the oldest epoch
    that might still need crash-resume, i.e. anything below the current
    head is safe.

    Crash safety — additive, no directory renames: merged part files
    are written into the base epoch's dir under fresh names FIRST; the
    captured pre-existing files and the merged-away epochs (marker,
    then dir) are removed only afterwards. A crash at ANY point leaves
    either extra duplicate rows (probe-harmless) or leftover epochs
    whose rows are duplicated in the merged parts — a re-run converges.
    Merging runs in remote tasks (no store data crosses the driver;
    the store filesystem is cluster-shared, like the lake root)."""
    import ray

    if isinstance(store, str):
        store = SignatureStore(store)
    epochs = [e for e in store.epochs() if e < before_epoch]
    if len(epochs) <= 1:
        return 0
    files = store.files(before_epoch)
    if len(files) <= 1:
        return 0
    base = min(epochs)

    @ray.remote
    def _merge(paths: list, out_path: str) -> int:
        t = pa.concat_tables([pq.read_table(p) for p in paths])
        tmp = f"{out_path}.tmp.{os.getpid()}"
        pq.write_table(t, tmp)
        os.replace(tmp, out_path)  # never expose a half-written part
        return t.num_rows

    nonce = f"{os.getpid()}-{time.monotonic_ns()}"
    futs = []
    for i in range(0, len(files), files_per_output):
        futs.append(_merge.remote(
            files[i:i + files_per_output],
            os.path.join(store._dir(base),
                         f"compact-{nonce}-{i // files_per_output:05d}"
                         ".parquet")))
    total_rows = sum(ray.get(futs))
    with open(store._marker(base) + ".tmp", "w") as f:
        f.write(str(total_rows))
    os.replace(store._marker(base) + ".tmp", store._marker(base))
    # merged parts are durable -- now drop the inputs: first the
    # pre-existing files of the base epoch, then the other epochs
    # (marker before dir: an unmarked dir is invisible to readers)
    for p in files:
        if os.path.dirname(p) == store._dir(base):
            try:
                os.remove(p)
            except FileNotFoundError:
                pass
    for e in epochs:
        if e == base:
            continue
        try:
            os.remove(store._marker(e))
        except FileNotFoundError:
            pass
        shutil.rmtree(store._dir(e), ignore_errors=True)
    return len(files)
