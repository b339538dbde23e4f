"""Deduplication at scale: exact, MinHash-LSH, SimHash, n-gram Jaccard.

All stages are vectorized ``map_batches`` + one keyed shuffle; nothing
materializes the corpus driver-side. Scale notes per function.
"""

from __future__ import annotations

import functools
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

_WORD = re.compile(r"\w+", re.UNICODE)

# Universal-hash parameters for minhash permutations (fixed seed →
# deterministic across processes and runs).
_MERSENNE = np.uint64((1 << 61) - 1)


@functools.lru_cache(maxsize=8)
def _perm_params(num_perm: int, seed: int = 1337) -> tuple[np.ndarray, np.ndarray]:
    """Permutation constants derived once per process (actor), not per
    batch — deterministic (fixed seed) so every worker agrees. Distinct
    seeds give independent permutation families (multi-probe LSH)."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def _token_ngrams(text: str, n: int) -> set[bytes]:
    toks = _WORD.findall(text.lower())
    if len(toks) < n:
        return {(" ".join(toks)).encode()} if toks else set()
    return {" ".join(toks[i : i + n]).encode() for i in range(len(toks) - n + 1)}


#: Fixed per-position odd multipliers for combining token hashes into
#: shingle hashes (seeded once → identical in every process/worker).
_POS_MULT = np.random.default_rng(7331).integers(
    1, 1 << 63, size=64, dtype=np.uint64) | np.uint64(1)


def _combine_windows(th: np.ndarray, n: int) -> np.ndarray:
    """Hashes of all length-``n`` sliding windows over a token-hash
    array: XOR of position-multiplied token hashes (wrapping uint64
    arithmetic), deduped. Shorter-than-``n`` inputs yield one combined
    hash; empty inputs one zero hash — the vectorized replacement for
    hashing joined n-gram strings (no per-window Python string work)."""
    if th.size == 0:
        return np.zeros(1, dtype=np.uint64)
    k = min(n, th.size)
    length = th.size - k + 1
    acc = np.zeros(length, dtype=np.uint64)
    for j in range(k):
        acc ^= th[j:j + length] * _POS_MULT[j]
    return np.unique(acc)


def _shingle_hashes(text: str, n: int) -> np.ndarray:
    """Stable 64-bit hashes of word n-gram shingles (token hashes
    combined per window; the leaf primitive shared by the distributed
    paths and the sequential verification oracles)."""
    toks = _WORD.findall(text.lower())
    if not toks:
        return np.zeros(1, dtype=np.uint64)
    th = pd.util.hash_array(np.array(toks, dtype=object))
    return _combine_windows(th, n)


def _shingle_hashes_batch(col, ngram: int) -> tuple[np.ndarray, np.ndarray]:
    """Whole-column :func:`_shingle_hashes`: ALL docs' sliding windows
    in one vectorized pass — full n-wide windows via one global
    XOR-combine with doc-boundary masking, one all-token window for
    shorter-than-n docs, one zero hash for token-less docs, per-doc
    sorted-unique via one lexsort. Returns (flat shingle hashes in doc
    order, per-doc shingle counts, every count >= 1) — value-identical
    to calling ``_shingle_hashes`` per document."""
    from tenzir_ray.text.lm import _token_hashes_batch

    th_all, counts = _token_hashes_batch(col)
    D = counts.size
    W = th_all.size
    doc_of_tok = np.repeat(np.arange(D, dtype=np.int64), counts)
    tok_starts = np.r_[0, np.cumsum(counts[:-1])]
    pos = np.arange(W, dtype=np.int64) - np.repeat(tok_starts, counts)
    parts_doc: list[np.ndarray] = []
    parts_val: list[np.ndarray] = []
    L = W - ngram + 1
    if L > 0:
        acc = np.zeros(L, np.uint64)
        for j in range(ngram):
            acc ^= th_all[j:j + L] * _POS_MULT[j]
        ok = counts[doc_of_tok[:L]] - pos[:L] >= ngram
        parts_doc.append(doc_of_tok[:L][ok])
        parts_val.append(acc[ok])
    short = (counts > 0) & (counts < ngram)
    if short.any():
        m = short[doc_of_tok]
        vals = th_all[m] * _POS_MULT[pos[m]]
        sstarts = np.r_[0, np.cumsum(counts[short][:-1])]
        parts_doc.append(np.flatnonzero(short).astype(np.int64))
        parts_val.append(np.bitwise_xor.reduceat(vals, sstarts))
    if (counts == 0).any():
        parts_doc.append(np.flatnonzero(counts == 0).astype(np.int64))
        parts_val.append(np.zeros(int((counts == 0).sum()), np.uint64))
    sdoc = np.concatenate(parts_doc)
    sval = np.concatenate(parts_val)
    order = np.lexsort((sval, sdoc))
    sdoc, sval = sdoc[order], sval[order]
    keep = np.r_[True, (sdoc[1:] != sdoc[:-1]) | (sval[1:] != sval[:-1])]
    sdoc, sval = sdoc[keep], sval[keep]
    return sval, np.bincount(sdoc, minlength=D).astype(np.int64)


# ------------------------------------------------------ drop-set filter

#: Above this estimated drop-set size, dedup finalization switches from
#: a single broadcast Arrow array to the bucketed path automatically.
DROP_BROADCAST_CAP = 256 << 20


def _bucket_of(ids: np.ndarray, buckets: int) -> np.ndarray:
    return (pd.util.hash_array(ids) % np.uint64(buckets)).astype(np.int64)


def anti_filter_ids(
    ds: Dataset, drops: Dataset, id_col: str, drop_col: str,
    max_broadcast_bytes: int | None = None, buckets: int = 64,
    cache_buckets: int = 8, stage_dir: str | None = None,
    concurrency: int | tuple | None = None,
) -> Dataset:
    """Drop every row of ``ds`` whose ``id_col`` appears in ``drops``'s
    ``drop_col`` — the shared finalizer of the dedup family, auto-scaled
    by drop-set size (estimated from block METADATA, no execution):

    - **small** (≤ cap, default 256 MiB): drop ids concatenated into one
      Arrow array in a REMOTE task (driver touches refs only), broadcast,
      one vectorized ``pc.is_in`` per batch. Right up to a few hundred MB.
    - **large**: no single object above the cap is ever put. Drop ids are
      hash-bucketed into staged parquet files (the repo's file-staged
      exchange) by parallel tasks that each also build a partial Bloom
      filter clamped to the cap; partials OR-merge in a fan-in-8 tree.
      The probe is an ACTOR-pool stage: Bloom prefilter per batch (zero
      bucket reads for clean batches), then exact ``pc.is_in`` against
      only the touched bucket files, LRU-cached per actor (worker memory
      ≤ cache_buckets/buckets of the drop set). Bloom false positives
      only cost an extra bucket check — results stay exact.

    The reference's deduplicate operator holds its suppression state in
    one process (deduplicate.cpp:126-260); this is the distributed
    re-expression of the same contract.
    """
    import ray

    cap = DROP_BROADCAST_CAP if max_broadcast_bytes is None \
        else max_broadcast_bytes
    bundles = list(drops.iter_internal_ref_bundles())
    refs = [r for b in bundles for r in b.block_refs]
    est_bytes = sum((m.size_bytes or 0) for b in bundles for m in b.metadata)
    est_rows = sum((m.num_rows or 0) for b in bundles for m in b.metadata)

    if est_bytes <= cap:
        @ray.remote
        def _concat_ids(*blocks) -> pa.Array:
            tabs = [b.select([drop_col]) for b in blocks if b.num_rows]
            if not tabs:
                return pa.array([], pa.int64())
            return pa.concat_tables(tabs).column(drop_col).combine_chunks()

        drop_ref = _concat_ids.remote(*refs)

        def survivors(t: pa.Table) -> pa.Table:
            vs = ray.get(drop_ref)
            if len(vs) == 0:
                return t
            probe = t.column(id_col).combine_chunks()
            if probe.type != vs.type:
                probe = pc.cast(probe, vs.type)
            keep = pc.invert(pc.is_in(probe, value_set=vs))
            out = t.filter(keep)
            return out.replace_schema_metadata(None) \
                if out.schema.metadata else out

        return ds.map_batches(survivors, batch_format="pyarrow")

    # ---- large path: bucketed staged files + capped Bloom prefilter
    import os
    import tempfile
    import uuid

    import pyarrow.parquet as pq

    from tenzir_ray.state.context import BloomFilter

    if stage_dir is None:
        from tenzir_ray.util import local_stage_dir

        stage = local_stage_dir("tenzir_ray_drops_", "anti_filter_ids")
    else:
        stage = stage_dir
    proto = BloomFilter(capacity=max(64, est_rows), max_bytes=cap)
    m_bits, k_hash = proto.m, proto.k

    @ray.remote
    def _stage_block(block: pa.Table) -> np.ndarray:
        bl = BloomFilter.with_params(m_bits, k_hash)
        if block.num_rows:
            ids = block.column(drop_col).combine_chunks() \
                .to_numpy(zero_copy_only=False)
            bl.add(ids)
            bks = _bucket_of(ids, buckets)
            order = np.argsort(bks, kind="stable")
            sbks = bks[order]
            starts = np.flatnonzero(np.r_[True, sbks[1:] != sbks[:-1]])
            bounds = np.r_[starts, len(sbks)]
            for s, e in zip(bounds[:-1], bounds[1:]):
                bdir = os.path.join(stage, f"bucket={sbks[s]}")
                os.makedirs(bdir, exist_ok=True)
                path = os.path.join(bdir, f"part-{uuid.uuid4().hex}.parquet")
                tbl = pa.table({drop_col: pa.array(ids[order[s:e]])})
                pq.write_table(tbl, path + ".tmp")
                os.rename(path + ".tmp", path)
        return bl.bits

    @ray.remote
    def _or_bits(*parts: np.ndarray) -> np.ndarray:
        acc = parts[0].copy()
        for p in parts[1:]:
            np.bitwise_or(acc, p, out=acc)
        return acc

    bit_refs = [_stage_block.remote(r) for r in refs]
    while len(bit_refs) > 1:  # fan-in-8 OR-merge tree
        bit_refs = [_or_bits.remote(*bit_refs[i:i + 8])
                    for i in range(0, len(bit_refs), 8)]
    bloom_bits_ref = bit_refs[0]

    class _BucketedDropFilter:
        def __init__(self):
            self.bloom = BloomFilter.with_params(m_bits, k_hash)
            self.bloom.merge_bits(ray.get(bloom_bits_ref))
            from collections import OrderedDict
            self._cache: "OrderedDict[int, object]" = OrderedDict()

        def _bucket_ids(self, b: int):
            if b in self._cache:
                self._cache.move_to_end(b)
                return self._cache[b]
            bdir = os.path.join(stage, f"bucket={b}")
            if not os.path.isdir(bdir):
                arr = pa.array([], pa.int64())
            else:
                parts = [pq.read_table(os.path.join(bdir, f))
                         for f in os.listdir(bdir)
                         if f.endswith(".parquet")]
                arr = pa.concat_tables(parts).column(drop_col) \
                    .combine_chunks() if parts else pa.array([], pa.int64())
            self._cache[b] = arr
            while len(self._cache) > cache_buckets:
                self._cache.popitem(last=False)
            return arr

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = t.column(id_col).combine_chunks() \
                .to_numpy(zero_copy_only=False)
            if not len(ids):
                return t
            sus = self.bloom.contains(ids)
            if not sus.any():
                return t
            sus_idx = np.flatnonzero(sus)
            sus_ids = ids[sus_idx]
            bks = _bucket_of(sus_ids, buckets)
            drop_mask = np.zeros(len(ids), dtype=bool)
            for b in np.unique(bks):
                barr = self._bucket_ids(int(b))
                if not len(barr):
                    continue
                sel = bks == b
                probe = pa.array(sus_ids[sel])
                if probe.type != barr.type:
                    probe = pc.cast(probe, barr.type)
                hits = pc.is_in(probe, value_set=barr) \
                    .to_numpy(zero_copy_only=False)
                drop_mask[sus_idx[sel][hits]] = True
            out = t.filter(pa.array(~drop_mask))
            return out.replace_schema_metadata(None) \
                if out.schema.metadata else out

    if concurrency is None:
        # never an actor pool that swallows the whole (small) cluster —
        # a fixed pool of size == CPUs starves the upstream read tasks
        cpus = int(ray.cluster_resources().get("CPU", 8))
        concurrency = (1, max(2, cpus // 2))
    return ds.map_batches(_BucketedDropFilter, batch_format="pyarrow",
                          concurrency=concurrency)


# ---------------------------------------------------------------- exact


def exact_dedup(ds: Dataset, text_col: str = "text", keep_by: str | None = None) -> Dataset:
    """Exact dedup by content hash: vectorized hash column per batch →
    hash-partitioned ``groupby`` → first row per group. The groupby is the
    only shuffle and moves rows already reduced to one per (hash, row).
    At 100 TB, project to (hash, id) first and semi-join survivors if rows
    are wide; here rows ride the shuffle directly."""
    def add_hash(t: pa.Table) -> pa.Table:
        col = t.column(text_col).combine_chunks()
        h = pd.util.hash_array(col.to_numpy(zero_copy_only=False))
        t = t.append_column("__h", pa.array(h.astype(np.uint64)))
        # coarse salt groups (the band_reduce pattern): one map_groups
        # call handles ~1/1024 of all hashes in one vectorized pass —
        # never one Python call per distinct document
        t = t.append_column("__hs", pa.array(
            (h.astype(np.uint64) & np.uint64(1023)).astype(np.int64)))
        return t.replace_schema_metadata(None) if t.schema.metadata else t

    def first_per_hash(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "__h" not in g.column_names:
            return g.drop_columns(
                [c for c in ("__h", "__hs") if c in g.column_names])
        keys = [("__h", "ascending")]
        if keep_by:
            keys.append((keep_by, "ascending"))
        g = g.take(pc.sort_indices(g, sort_keys=keys))
        h = g.column("__h").to_numpy(zero_copy_only=False)
        firsts = np.r_[True, h[1:] != h[:-1]]
        return g.filter(pa.array(firsts)).drop_columns(["__h", "__hs"])

    return (
        ds.map_batches(add_hash, batch_format="pyarrow")
        .groupby("__hs")
        .map_groups(first_per_hash, batch_format="pyarrow")
    )


def exact_dedup_wide(
    ds: Dataset, text_col: str = "text", id_col: str = "doc_id",
    max_broadcast_bytes: int | None = None,
) -> Dataset:
    """Exact dedup for WIDE rows (multi-KB documents): the full rows
    never ride a shuffle. Only a narrow ``(hash, id)`` projection is
    hash-partitioned; losers (every id but the min per hash) form the
    drop set, applied via :func:`anti_filter_ids` — one broadcast
    ``pc.is_in`` below the size cap, the Bloom-prefiltered bucketed
    exact filter above it (auto-selected from drop-set metadata)."""
    def project(t: pa.Table) -> pa.Table:
        col = t.column(text_col).combine_chunks()
        h = pd.util.hash_array(col.to_numpy(zero_copy_only=False))
        return pa.table({
            "__h": pa.array(h.astype(np.uint64)),
            "__hs": pa.array(
                (h.astype(np.uint64) & np.uint64(1023)).astype(np.int64)),
            id_col: t.column(id_col).combine_chunks(),
        })

    def losers(g: pa.Table) -> pa.Table:
        # one group = one salt slice of hashes; all but the min id per
        # hash-segment, in one vectorized pass (band_reduce pattern)
        if g.num_rows == 0 or "__h" not in g.column_names:
            return (g.select([id_col]) if id_col in g.column_names
                    else pa.table({id_col: pa.array([], pa.int64())}))
        g = g.take(pc.sort_indices(g, sort_keys=[
            ("__h", "ascending"), (id_col, "ascending")]))
        h = g.column("__h").to_numpy(zero_copy_only=False)
        firsts = np.r_[True, h[1:] != h[:-1]]
        return g.filter(pa.array(~firsts)).select([id_col])

    drops = (
        ds.map_batches(project, batch_format="pyarrow")
        .groupby("__hs")
        .map_groups(losers, batch_format="pyarrow")
    )
    return anti_filter_ids(ds, drops, id_col, id_col,
                           max_broadcast_bytes=max_broadcast_bytes)


# ------------------------------------------------------ line-level dedup


def _split_lines_arrow(col, delim: str) -> tuple[pa.Array, np.ndarray]:
    """Flatten every doc's lines: one Arrow ``split_pattern`` over the
    whole column → (flat line StringArray, per-doc counts). Nulls
    become ``""`` (→ one empty line, same as ``(t or "").split``), so
    every doc contributes >=1 line and reassembly preserves row
    count."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    arr = pc.fill_null(arr, "")
    la = pc.split_pattern(arr, pattern=delim)
    counts = pc.list_value_length(la).to_numpy(
        zero_copy_only=False).astype(np.int64)
    return pc.list_flatten(la), counts


def chunk_lines(ds: Dataset, text_col: str = "text", width: int = 5,
                word_delim: str = " ", line_delim: str = "\n") -> Dataset:
    """Rewrap each document into lines of ``width`` words — the line
    structure :func:`line_dedup` operates on for corpora whose text has
    no newlines (the common shape after HTML extraction collapses
    whitespace). Pure per-batch transform, no shuffle."""
    def rewrap(t: pa.Table) -> pa.Table:
        # vectorized: split all docs' words in one Arrow kernel, pick
        # the separator AFTER each word (line_delim every `width`-th,
        # "" after a doc's last word), concat and rejoin per doc —
        # no per-doc Python
        if t.num_rows == 0:
            return t
        flat, counts = _split_lines_arrow(t.column(text_col), word_delim)
        total = len(flat)
        starts = np.r_[0, np.cumsum(counts[:-1])]
        pos = np.arange(total) - np.repeat(starts, counts)
        sep = np.where((pos + 1) % width == 0, line_delim,
                       word_delim).astype(object)
        sep[np.cumsum(counts) - 1] = ""  # counts >= 1 per doc
        glued = pc.binary_join_element_wise(
            flat, pa.array(sep, pa.string()), "")
        offsets = pa.array(np.r_[0, np.cumsum(counts)], pa.int32())
        out = pc.binary_join(
            pa.ListArray.from_arrays(offsets, glued), "")
        idx = t.schema.get_field_index(text_col)
        t = t.set_column(idx, text_col, out)
        return t.replace_schema_metadata(None) if t.schema.metadata else t

    return ds.map_batches(rewrap, batch_format="pyarrow")


def line_dedup(
    ds: Dataset, id_col: str = "doc_id", text_col: str = "text",
    max_df: int = 1, min_chars: int = 0, delim: str = "\n",
) -> Dataset:
    """Corpus-level boilerplate-line removal (the RefinedWeb/CCNet
    pattern): a line that occurs in more than ``max_df`` DISTINCT
    documents (nav menus, cookie banners, footers) is deleted from every
    document; each doc's surviving lines are rejoined in order. Lines
    shorter than ``min_chars`` are exempt (never counted, never dropped).

    Scale shape — the corpus never rides a shuffle:

    1. per-batch partial document frequencies: lines are 64-bit hashed
       (one vectorized ``pd.util.hash_array`` per batch), deduped
       within-doc, counted per batch → a narrow ``(h, n)`` table
       (16 B/row) is the ONLY thing entering the ``groupby("h").sum``
       exchange;
    2. the over-threshold hash set is concatenated in a REMOTE task
       (driver holds a ref) — boilerplate sets are tiny by construction
       (a line must repeat across docs to qualify);
    3. one broadcast ``np.isin`` per batch scrubs the lines and rejoins.

    No reference analog (Tenzir has no corpus-level text ops); the
    distributed shape mirrors exact_dedup_wide's narrow-projection +
    broadcast-filter contract."""
    import ray

    def partial_df(t: pa.Table) -> pa.Table:
        flat_arr, counts = _split_lines_arrow(t.column(text_col), delim)
        flat = flat_arr.to_numpy(zero_copy_only=False)
        if flat.size == 0:
            return pa.table({"h": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        # int64 bit-view of the uint64 line hash: keys above 2^63 would
        # overflow Ray's native aggregate into pickled-object blocks
        h = pd.util.hash_array(flat).view(np.int64)
        doc_idx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        if min_chars:
            lens = pc.utf8_length(flat_arr).to_numpy(
                zero_copy_only=False).astype(np.int64)
            mask = lens >= min_chars
            h, doc_idx = h[mask], doc_idx[mask]
        if h.size == 0:
            return pa.table({"h": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        # distinct (doc, line-hash) pairs → per-batch partial df
        pairs = np.unique(np.stack([doc_idx, h], axis=1), axis=0)
        uniq, cnt = np.unique(pairs[:, 1], return_counts=True)
        return pa.table({"h": pa.array(uniq, pa.int64()),
                         "n": pa.array(cnt.astype(np.int64))})

    df = (ds.map_batches(partial_df, batch_format="pyarrow")
          .groupby("h").sum("n"))

    @ray.remote
    def _common(*blocks) -> np.ndarray:
        hs = []
        for b in blocks:
            if not b.num_rows:
                continue
            keep = pc.greater(b.column("sum(n)"), pa.scalar(max_df))
            hs.append(b.filter(keep).column("h").combine_chunks()
                      .to_numpy(zero_copy_only=False))
        if not hs:
            return np.array([], dtype=np.int64)
        return np.concatenate(hs).astype(np.int64)

    bundles = list(df.iter_internal_ref_bundles())
    refs = [r for b in bundles for r in b.block_refs]
    common_ref = _common.remote(*refs)

    def scrub(t: pa.Table) -> pa.Table:
        vs = ray.get(common_ref)
        if vs.size == 0 or t.num_rows == 0:
            return t
        flat_arr, counts = _split_lines_arrow(t.column(text_col), delim)
        flat = flat_arr.to_numpy(zero_copy_only=False)
        h = pd.util.hash_array(flat).view(np.int64)
        keep = ~np.isin(h, vs)
        if min_chars:
            lens = pc.utf8_length(flat_arr).to_numpy(
                zero_copy_only=False).astype(np.int64)
            keep |= lens < min_chars
        # vectorized reassembly: filter the kept lines, rebuild per-doc
        # list offsets from segment sums, one binary_join — no per-doc
        # Python loop
        starts = np.r_[0, np.cumsum(counts[:-1])]
        kept_counts = np.add.reduceat(keep.astype(np.int64), starts)
        offsets = pa.array(np.r_[0, np.cumsum(kept_counts)], pa.int32())
        kept_lines = flat_arr.filter(pa.array(keep))
        out = pc.binary_join(
            pa.ListArray.from_arrays(offsets, kept_lines), delim)
        idx = t.schema.get_field_index(text_col)
        t = t.set_column(idx, text_col, out)
        return t.replace_schema_metadata(None) if t.schema.metadata else t

    return ds.map_batches(scrub, batch_format="pyarrow")


# --------------------------------------------------------------- minhash


def minhash_lsh_candidates(
    ds: Dataset, id_col: str = "doc_id", text_col: str = "text",
    num_perm: int = 64, bands: int = 16, ngram: int = 3,
    seed: int = 1337,
) -> Dataset:
    """Near-dup candidate groups via MinHash-LSH: per-batch signatures in
    an actor pool (permutations compiled once), explode to band rows,
    coarse ``groupby(band, salt(band_key))`` — docs sharing any band
    bucket are candidates. Returns (band, band_key, docs:list) groups
    with >1 doc. One map_groups call per (band, salt) slice, all bucket
    segments inside it built in one vectorized numpy pass (the
    ``lsh_candidate_pairs.band_reduce`` pattern — never one Python call
    per bucket)."""
    import functools

    banded = ds.map_batches(
        functools.partial(
            _minhash_batch, id_col=id_col, text_col=text_col,
            num_perm=num_perm, bands=bands, ngram=ngram, seed=seed,
        ),
        batch_format="pyarrow",
        batch_size=1024,  # bounds the (num_perm × shingles) work matrix
    )

    def add_salt(t: pa.Table) -> pa.Table:
        return t.append_column(
            "bk_salt", pc.bit_wise_and(t.column("band_key"), 255))

    def collect(g: pa.Table) -> pa.Table:
        empty = pa.table({"band": pa.array([], pa.int64()),
                          "band_key": pa.array([], pa.int64()),
                          "docs": pa.array([], pa.list_(pa.int64()))})
        if g.num_rows == 0:
            return empty
        keys = g.column("band_key").to_numpy(zero_copy_only=False)
        docs = g.column("doc").to_numpy(zero_copy_only=False)
        order = np.lexsort((docs, keys))
        k, d = keys[order], docs[order]
        starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        counts = np.diff(np.r_[starts, len(k)])
        sel = counts >= 2
        if not sel.any():
            return empty
        sel_starts, sel_counts = starts[sel], counts[sel]
        total = int(sel_counts.sum())
        # gather each kept segment's doc ids contiguously
        seg_base = np.repeat(sel_starts, sel_counts)
        seg_off = np.arange(total) - np.repeat(
            np.cumsum(sel_counts) - sel_counts, sel_counts)
        values = d[seg_base + seg_off]
        offsets = np.r_[0, np.cumsum(sel_counts)]
        docs_arr = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), pa.array(values, pa.int64()))
        band = int(g.column("band")[0].as_py())
        return pa.table({
            "band": pa.array(np.full(int(sel.sum()), band, np.int64)),
            "band_key": pa.array(k[sel_starts], pa.int64()),
            "docs": docs_arr,
        })

    return (
        banded.map_batches(add_salt, batch_format="pyarrow")
        .groupby(["band", "bk_salt"])
        .map_groups(collect, batch_format="pyarrow")
    )


def _minhash_batch(t: pa.Table, *, id_col, text_col, num_perm, bands,
                   ngram, seed: int = 1337,
                   band_offset: int = 0) -> pa.Table:
    """Batch-vectorized minhash banding: shingles of ALL docs are hashed
    in one ``hash_array`` call, all permutations applied as one
    ``(P, total_shingles)`` modular matmul, and per-doc minima taken with
    ``np.minimum.reduceat`` over the doc segments — ~10× the per-doc-loop
    throughput. Memory is P × total_shingles × 8B, so keep map_batches
    ``batch_size`` ≲ 1k docs."""
    a, b = _perm_params(num_perm, seed)
    r = num_perm // bands
    from tenzir_ray.text.lm import _token_hashes_batch

    tt = t.filter(pc.is_valid(t.column(text_col)))
    if tt.num_rows == 0:
        return pa.table({"doc": pa.array([], pa.int64()),
                         "band": pa.array([], pa.int64()),
                         "band_key": pa.array([], pa.int64())})
    doc_ids = tt.column(id_col).to_numpy(
        zero_copy_only=False).astype(np.int64)
    sh, scounts = _shingle_hashes_batch(tt.column(text_col), ngram)
    starts = np.r_[0, np.cumsum(scounts[:-1])]
    v = (a[:, None] * sh[None, :] + b[:, None]) % _MERSENNE  # (P, S)
    sigs = np.minimum.reduceat(v, starts, axis=1)  # (P, D)
    sigs = sigs.T[:, : bands * r].reshape(len(doc_ids), bands, r)  # (D, bands, r)
    # band key = same XOR-multiplier combine as shingles (no per-band
    # tobytes loop); bit-reinterpret to int64 for Arrow
    acc = np.zeros(sigs.shape[:2], dtype=np.uint64)
    for l in range(r):
        acc ^= sigs[:, :, l].astype(np.uint64) * _POS_MULT[l]
    keys = np.ascontiguousarray(acc.reshape(-1)).view(np.int64)
    return pa.table({
        "doc": pa.array(np.repeat(np.array(doc_ids, np.int64), bands)),
        "band": pa.array(np.tile(
            np.arange(band_offset, band_offset + bands, dtype=np.int64),
            len(doc_ids))),
        "band_key": pa.array(keys, pa.int64()),
    })


def jaccard(a: str, b: str, ngram: int = 3) -> float:
    sa, sb = _token_ngrams(a, ngram), _token_ngrams(b, ngram)
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(1, len(sa | sb))


def lsh_candidate_pairs(
    ds: Dataset, id_col: str = "doc_id", text_col: str = "text",
    num_perm: int = 64, bands: int = 16, ngram: int = 3,
    seeds: tuple[int, ...] = (1337,),
) -> Dataset:
    """(doc, rep) candidate pairs from banded MinHash-LSH: one row per
    (doc, bucket) with ``rep`` = the smallest doc id in that bucket
    (singleton buckets yield (doc, doc), so every doc appears). The
    shared front half of :func:`minhash_lsh_dedup` (one-hop min-label)
    and :func:`minhash_components` (true transitive closure)."""
    import functools

    # multi-probe: independent permutation families union their band
    # rows; per-seed band indices are offset so buckets never collide
    # across probes. Candidate pairs (hence drops) are a SUPERSET of any
    # single probe's — recall rises with each seed, cost is linear.
    probes = []
    for pi, seed in enumerate(seeds):
        probes.append(ds.map_batches(
            functools.partial(
                _minhash_batch, id_col=id_col, text_col=text_col,
                num_perm=num_perm, bands=bands, ngram=ngram, seed=seed,
                band_offset=pi * bands,
            ),
            batch_format="pyarrow",
            batch_size=1024,
        ))
    banded = probes[0]
    for p in probes[1:]:
        banded = banded.union(p)

    def add_salt(t: pa.Table) -> pa.Table:
        salt = pc.bit_wise_and(t.column("band_key"), 255)
        return t.append_column("bk_salt", salt)

    def band_reduce(g: pa.Table) -> pa.Table:
        # one group = one (band, salt) slice; vectorized bucket-min:
        # sort by band_key, segment boundaries, min doc per segment,
        # broadcast back with repeat — no per-bucket Python
        if g.num_rows == 0:
            return pa.table({"doc": pa.array([], pa.int64()),
                             "rep": pa.array([], pa.int64())})
        keys = g.column("band_key").to_numpy()
        docs = g.column("doc").to_numpy()
        order = np.lexsort((docs, keys))
        k, d = keys[order], docs[order]
        starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        bucket_min = np.minimum.reduceat(d, starts)
        rep = np.repeat(bucket_min, np.diff(np.r_[starts, len(k)]))
        return pa.table({"doc": pa.array(d, pa.int64()),
                         "rep": pa.array(rep, pa.int64())})

    return (
        banded.map_batches(add_salt, batch_format="pyarrow")
        .groupby(["band", "bk_salt"])
        .map_groups(band_reduce, batch_format="pyarrow")
    )


def minhash_components(
    ds: Dataset, id_col: str = "doc_id", text_col: str = "text",
    num_perm: int = 64, bands: int = 16, ngram: int = 3,
    seeds: tuple[int, ...] = (1337,), max_iters: int = 30,
) -> Dataset:
    """(node, component) duplicate-CLUSTER labels with true
    transitive-closure semantics: a ~ b and b ~ c put a, b, c in one
    component even when a and c never share a bucket — the union-find
    step of the RefinedWeb/SlimPajama MinHash pipelines, run as
    hash-to-min label propagation (:mod:`tenzir_ray.text.graph`) over
    the LSH candidate pairs. One-hop :func:`minhash_lsh_dedup` keeps a
    chain's middle links; this collapses whole chains."""
    from tenzir_ray.text.graph import connected_components

    pairs = lsh_candidate_pairs(
        ds, id_col=id_col, text_col=text_col, num_perm=num_perm,
        bands=bands, ngram=ngram, seeds=seeds)
    return connected_components(pairs, a="doc", b="rep",
                                max_iters=max_iters)


def minhash_cc_dedup(
    ds: Dataset, id_col: str = "doc_id", text_col: str = "text",
    num_perm: int = 64, bands: int = 16, ngram: int = 3,
    seeds: tuple[int, ...] = (1337,),
    max_broadcast_bytes: int | None = None,
) -> Dataset:
    """Near-dup dedup keeping ONE survivor (the min id) per transitive
    duplicate component — the strict union-find dual of
    :func:`minhash_lsh_dedup`."""
    comp = minhash_components(ds, id_col=id_col, text_col=text_col,
                              num_perm=num_perm, bands=bands, ngram=ngram,
                              seeds=seeds)

    def to_drops(t: pa.Table) -> pa.Table:
        if "node" not in t.column_names:
            return pa.table({"__drop_id": pa.array([], pa.int64()),
                             "__rep": pa.array([], pa.int64())})
        t = t.filter(pc.invert(pc.equal(t.column("node"),
                                        t.column("component"))))
        return pa.table({"__drop_id": pc.cast(t.column("node"), pa.int64()),
                         "__rep": pc.cast(t.column("component"), pa.int64())})

    drops = comp.map_batches(to_drops, batch_format="pyarrow")
    return anti_filter_ids(ds, drops, id_col, "__drop_id",
                           max_broadcast_bytes=max_broadcast_bytes)


def minhash_lsh_dedup(
    ds: Dataset, id_col: str = "doc_id", text_col: str = "text",
    num_perm: int = 64, bands: int = 16, ngram: int = 3,
    verify_threshold: float | None = None,
    max_broadcast_bytes: int | None = None,
    seeds: tuple[int, ...] = (1337,),
    verify_max_task_bytes: int = 256 << 20,
) -> Dataset:
    """Full near-dup dedup: LSH candidates → union into duplicate sets via
    min-label (each doc keeps the min candidate-group id it ever sees) →
    drop non-minimal members via a distributed anti-join. Optional exact
    n-gram Jaccard verification of candidate pairs (verify_threshold)
    before dropping.

    Min-label resolution is JOIN-FREE and fully vectorized: band rows
    are salted by ``band_key`` (so one group is ~1/256th of a band — no
    whole-corpus groups at scale) and reduced with one numpy
    lexsort + ``minimum.reduceat`` per group (bucket_min broadcast back
    to members in the same kernel); per-doc min is a native Ray hash
    aggregate. The final filter broadcasts the drop-id set — assembled
    in a REMOTE task, never on the driver — and applies one vectorized
    ``pc.is_in`` per batch: the corpus itself never rides any shuffle.
    Above ``max_broadcast_bytes`` (default 256 MiB) the finalizer
    auto-switches to :func:`anti_filter_ids`'s Bloom-prefiltered
    bucketed exact filter — no single broadcast object above the cap.
    With ``verify_threshold``, candidate pairs are verified in tasks
    bucketed by hash(rep) so no single task's text working set exceeds
    ``verify_max_task_bytes``. Returns the surviving rows."""
    import ray
    from ray.data.aggregate import Min

    pairs = lsh_candidate_pairs(
        ds, id_col=id_col, text_col=text_col, num_perm=num_perm,
        bands=bands, ngram=ngram, seeds=seeds)
    reps = pairs.groupby("doc").aggregate(Min(on="rep", alias_name="rep"))

    def to_drops(t: pa.Table) -> pa.Table:
        # native aggregates emit zero-column blocks for empty partitions
        if "doc" not in t.column_names:
            return pa.table({"__drop_id": pa.array([], pa.int64()),
                             "__rep": pa.array([], pa.int64())})
        t = t.filter(pc.invert(pc.equal(t.column("doc"), t.column("rep"))))
        return pa.table({"__drop_id": pc.cast(t.column("doc"), pa.int64()),
                         "__rep": pc.cast(t.column("rep"), pa.int64())})

    drops = reps.map_batches(to_drops, batch_format="pyarrow")

    if verify_threshold is None:
        # auto-scaled finalizer: broadcast pc.is_in below the size cap,
        # Bloom-prefiltered bucketed exact filter above it
        return anti_filter_ids(ds, drops, id_col, "__drop_id",
                               max_broadcast_bytes=max_broadcast_bytes)

    drop_refs = [r for b in drops.iter_internal_ref_bundles()
                 for r in b.block_refs]
    # exact n-gram Jaccard verification of every (doc, rep) candidate
    # pair before dropping — LSH can collide dissimilar docs. The
    # pair set and its texts are candidate-sized (small fraction of
    # the corpus): fetch candidate texts with one broadcast id
    # filter, verify in one remote task. Driver touches refs only.
    @ray.remote
    def _concat_pairs(*blocks) -> pa.Table:
        tabs = [b for b in blocks if b.num_rows]
        if not tabs:
            return pa.table({"__drop_id": pa.array([], pa.int64()),
                             "__rep": pa.array([], pa.int64())})
        return pa.concat_tables(tabs).combine_chunks()

    pairs_ref = _concat_pairs.remote(*drop_refs)

    @ray.remote
    def _cand_ids(pairs: pa.Table) -> pa.Array:
        return pc.unique(pa.chunked_array([
            pairs.column("__drop_id"), pairs.column("__rep")]))

    cand_ref = _cand_ids.remote(pairs_ref)

    def cand_texts(t: pa.Table) -> pa.Table:
        vs = ray.get(cand_ref)
        keep = pc.is_in(pc.cast(t.column(id_col).combine_chunks(),
                                pa.int64()), value_set=vs)
        out = t.filter(keep).select([id_col, text_col])
        return out.replace_schema_metadata(None) \
            if out.schema.metadata else out

    text_bundles = list(ds.map_batches(cand_texts, batch_format="pyarrow")
                        .iter_internal_ref_bundles())
    text_refs = [r for b in text_bundles for r in b.block_refs]
    # Bucketed exact verification (VERDICT r03 #4): a single verify task
    # holding EVERY candidate's text caps out one worker's heap at scale.
    # Pairs are bucketed by hash(rep) — a drop appears in exactly one
    # pair (per-doc Min), so each bucket's text working set is disjoint
    # up to reps — and each bucket task materializes only ITS ids' texts
    # (blocks are plasma-shared; the is_in filter runs before pylist).
    # Bucket count auto-scales so per-task text volume stays under
    # verify_max_task_bytes.
    try:
        cand_bytes = sum(int(b.size_bytes()) for b in text_bundles)
    except Exception:
        cand_bytes = 0
    n_vbuckets = max(1, -(-cand_bytes // max(1, verify_max_task_bytes)))

    @ray.remote
    def _verify_bucket(pairs: pa.Table, b: int, nb: int,
                       *text_blocks) -> pa.Array:
        if nb > 1:
            rep = pairs.column("__rep").to_numpy().astype(np.uint64)
            h = rep * np.uint64(0x9E3779B97F4A7C15)  # wrapping fibhash
            pairs = pairs.filter(pa.array((h % np.uint64(nb)).astype(
                np.int64) == b))
        if pairs.num_rows == 0:
            return pa.array([], pa.int64())
        need = pc.unique(pa.chunked_array([
            pairs.column("__drop_id"), pairs.column("__rep")]))
        # shingle every candidate doc ONCE in a single vectorized batch
        # pass (hash Jaccard == n-gram Jaccard up to 64-bit collisions;
        # the sequential oracle uses the same hashes). Missing ids act
        # like empty docs, whose shingle set is the {0} sentinel — so a
        # (missing, missing) pair scores 1.0, matching the old
        # "both-empty-sets" special case.
        subs = []
        for blk in text_blocks:
            ids = pc.cast(blk.column(id_col).combine_chunks(), pa.int64())
            sub = blk.filter(pc.is_in(ids, value_set=need))
            if sub.num_rows:
                subs.append(pa.table({
                    "id": pc.cast(sub.column(id_col), pa.int64()),
                    "text": sub.column(text_col),
                }))
        if subs:
            sub = pa.concat_tables(subs).combine_chunks()
            ids_np = sub.column("id").to_numpy(zero_copy_only=False)
            sh, cnt = _shingle_hashes_batch(sub.column("text"), ngram)
        else:
            ids_np = np.zeros(0, np.int64)
            sh, cnt = np.zeros(0, np.uint64), np.zeros(0, np.int64)
        need_np = pc.cast(need, pa.int64()).to_numpy(zero_copy_only=False)
        missing = np.setdiff1d(need_np, ids_np)
        if missing.size:
            ids_np = np.r_[ids_np, missing]
            sh = np.r_[sh, np.zeros(missing.size, np.uint64)]
            cnt = np.r_[cnt, np.ones(missing.size, np.int64)]
        order = np.argsort(ids_np, kind="stable")
        sorted_ids = ids_np[order]
        starts = np.r_[0, np.cumsum(cnt[:-1])]
        d = pairs.column("__drop_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        r = pairs.column("__rep").to_numpy(
            zero_copy_only=False).astype(np.int64)
        pos_d = order[np.searchsorted(sorted_ids, d)]
        pos_r = order[np.searchsorted(sorted_ids, r)]
        nd, nr = cnt[pos_d], cnt[pos_r]
        # score all pairs with one gather + lexsort per bounded slice:
        # per-doc hash lists are unique, so |A ∩ B| = adjacent-equal
        # count inside each pair's combined list. Slicing bounds the
        # gathered matrix (a hub rep re-gathers its hashes per pair).
        tot = nd + nr
        csum = np.cumsum(tot)
        cap = 1 << 25  # 32M hashes ≈ 256 MiB gathered per slice
        cuts = np.searchsorted(
            csum, np.arange(cap, int(csum[-1]) + cap, cap), side="left")
        bounds = np.unique(np.clip(np.r_[0, cuts + 1, len(tot)],
                                   0, len(tot)))
        keep_parts = []
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            snd, snr = nd[lo:hi], nr[lo:hi]
            P = hi - lo

            def gather(idx_pos, n):
                base = np.repeat(starts[idx_pos], n)
                off = np.arange(int(n.sum()), dtype=np.int64) \
                    - np.repeat(np.cumsum(n) - n, n)
                return sh[base + off]

            tags = np.r_[np.repeat(np.arange(P, dtype=np.int64), snd),
                         np.repeat(np.arange(P, dtype=np.int64), snr)]
            vals = np.r_[gather(pos_d[lo:hi], snd),
                         gather(pos_r[lo:hi], snr)]
            o = np.lexsort((vals, tags))
            tags, vals = tags[o], vals[o]
            dup = (tags[1:] == tags[:-1]) & (vals[1:] == vals[:-1])
            inter = np.bincount(tags[1:][dup], minlength=P)
            union = snd + snr - inter
            jacv = inter / np.maximum(1, union)
            keep_parts.append(d[lo:hi][jacv >= verify_threshold])
        keep = np.unique(np.concatenate(keep_parts)) if keep_parts \
            else np.zeros(0, np.int64)
        return pa.array(keep, pa.int64())

    drop_refs_v = [
        _verify_bucket.remote(pairs_ref, b, n_vbuckets, *text_refs)
        for b in range(n_vbuckets)
    ]

    def survivors(t: pa.Table) -> pa.Table:
        parts = [p for p in ray.get(drop_refs_v) if len(p)]
        vs = pa.concat_arrays(parts) if parts else pa.array([], pa.int64())
        if len(vs) == 0:
            return t
        probe = t.column(id_col).combine_chunks()
        if probe.type != vs.type:
            probe = pc.cast(probe, vs.type)
        keep = pc.invert(pc.is_in(probe, value_set=vs))
        out = t.filter(keep)
        return out.replace_schema_metadata(None) if out.schema.metadata else out

    return ds.map_batches(survivors, batch_format="pyarrow")


# --------------------------------------------------------------- simhash


def simhash_batch(
    t: pa.Table, *, id_col: str = "doc_id", text_col: str = "text", ngram: int = 2
) -> pa.Table:
    """64-bit SimHash per document: sign-sum of shingle-hash bit vectors
    (bit b of the fingerprint = majority of shingle-hash bit b; null
    docs fingerprint 0). Whole batch in one vectorized pass: flat
    shingles from :func:`_shingle_hashes_batch`, per-doc bit sums via
    64 segment reduceats — no per-document Python."""
    col = t.column(text_col)
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
    out = np.zeros(t.num_rows, dtype=np.uint64)
    if valid.any():
        sh, scounts = _shingle_hashes_batch(
            col.filter(pa.array(valid)), ngram)
        starts = np.r_[0, np.cumsum(scounts[:-1])]
        fp = np.zeros(scounts.size, np.uint64)
        for b in range(64):
            bit = ((sh >> np.uint64(b)) & np.uint64(1)).astype(np.int64)
            score = 2 * np.add.reduceat(bit, starts) - scounts
            fp |= (score > 0).astype(np.uint64) << np.uint64(b)
        out[valid] = fp
    return pa.table({id_col: t.column(id_col),
                     "simhash": pa.array(out, pa.uint64())})


_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (byte-LUT; numpy<2 has no bitwise_count)."""
    return _POP8[np.ascontiguousarray(x).view(np.uint8)
                 .reshape(*x.shape, 8)].sum(axis=-1).astype(np.int64)


def simhash_near_dedup(
    ds: Dataset, id_col: str = "doc_id", text_col: str = "text",
    k: int = 3, ngram: int = 2, max_broadcast_bytes: int | None = None,
) -> Dataset:
    """Banded Hamming-distance-≤k SimHash near-dup removal.

    The 64 signature bits split into ``k+1`` bands; by pigeonhole, ANY
    pair within Hamming distance ≤ k agrees exactly on at least one
    band, so the band ``groupby`` finds every qualifying pair — banding
    here is EXACT (zero recall loss), unlike probabilistic MinHash-LSH.
    Within each (band, band_value) bucket the full signatures verify
    pairwise with one vectorized XOR-popcount matrix; a doc is dropped
    iff some LOWER-id doc sits within distance k (the deterministic,
    oracle-checkable rule shared with embedding_dedup). Finalization
    goes through :func:`anti_filter_ids` (broadcast below the cap,
    Bloom-bucketed above it).

    Bucket sizes: random corpora spread across 2^(64/(k+1)) band values;
    duplicate clusters concentrate — the in-bucket O(b²) verify is the
    same locality/size tradeoff as embedding_dedup's in-bucket pass."""
    import functools

    from ray.data.aggregate import Min

    sigs = ds.map_batches(
        functools.partial(simhash_batch, id_col=id_col, text_col=text_col,
                          ngram=ngram),
        batch_format="pyarrow",
    )
    n_bands = k + 1
    bounds = np.linspace(0, 64, n_bands + 1).astype(np.int64)

    def to_bands(t: pa.Table) -> pa.Table:
        sh = t.column("simhash").to_numpy().astype(np.uint64)
        ids = t.column(id_col).to_numpy()
        parts = []
        for b in range(n_bands):
            lo, hi = int(bounds[b]), int(bounds[b + 1])
            w = hi - lo
            mask = np.uint64(2**64 - 1) if w >= 64 else \
                np.uint64((1 << w) - 1)
            # band index folded into the top bits (free for n_bands>1:
            # band values are ≤ 32 bits wide) → ONE groupby key; the
            # single-band k=0 case keeps the raw 64-bit value
            v = (sh >> np.uint64(lo)) & mask
            if n_bands > 1:
                v = v | (np.uint64(b) << np.uint64(58))
            parts.append(v)
        vals = np.concatenate(parts) if parts else np.empty(0, np.uint64)
        return pa.table({
            id_col: pa.array(np.tile(ids, n_bands)),
            "simhash": pa.array(np.tile(sh, n_bands), pa.uint64()),
            "band_val": pa.array(vals.view(np.int64), pa.int64()),
        })

    def bucket_pairs(g: pa.Table) -> pa.Table:
        empty = pa.table({"__drop_id": pa.array([], pa.int64()),
                          "__rep": pa.array([], pa.int64())})
        if g.num_rows < 2:
            return empty
        ids = g.column(id_col).to_numpy()
        sh = g.column("simhash").to_numpy().astype(np.uint64)
        order = np.argsort(ids, kind="stable")
        ids, sh = ids[order], sh[order]
        close = _popcount64(sh[:, None] ^ sh[None, :]) <= k
        lower = np.tril(close, k=-1)       # pairs (i, j<i)
        has = lower.any(axis=1)
        if not has.any():
            return empty
        firstj = lower.argmax(axis=1)      # min qualifying id (sorted)
        return pa.table({
            "__drop_id": pa.array(ids[has].astype(np.int64)),
            "__rep": pa.array(ids[firstj[has]].astype(np.int64)),
        })

    pairs = (
        sigs.map_batches(to_bands, batch_format="pyarrow")
        .groupby("band_val")
        .map_groups(bucket_pairs, batch_format="pyarrow")
    )
    # dedupe across bands (a pair can collide in several bands)
    uniq = pairs.groupby("__drop_id").aggregate(
        Min(on="__rep", alias_name="__rep"))

    def norm(t: pa.Table) -> pa.Table:
        if "__drop_id" not in t.column_names:  # empty aggregate partition
            return pa.table({"__drop_id": pa.array([], pa.int64()),
                             "__rep": pa.array([], pa.int64())})
        return pa.table({
            "__drop_id": pc.cast(t.column("__drop_id"), pa.int64()),
            "__rep": pc.cast(t.column("__rep"), pa.int64()),
        })

    drops = uniq.map_batches(norm, batch_format="pyarrow")
    return anti_filter_ids(ds, drops, id_col, "__drop_id",
                           max_broadcast_bytes=max_broadcast_bytes)


def simhash_dedup(
    ds: Dataset, id_col: str = "doc_id", text_col: str = "text", ngram: int = 2
) -> Dataset:
    """Exact-simhash dedup (Hamming distance 0): groupby simhash, keep min
    id. The distance-≤k form is :func:`simhash_near_dedup` (banded
    Hamming with pigeonhole-exact recall)."""
    import functools

    sigs = ds.map_batches(
        functools.partial(simhash_batch, id_col=id_col, text_col=text_col, ngram=ngram),
        batch_format="pyarrow",
    )

    def add_salt(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "simhash" not in t.column_names:
            return t
        s = t.column("simhash").to_numpy(zero_copy_only=False)
        # coarse salt groups (band_reduce pattern): one map_groups call
        # handles ~1/1024 of all distinct simhashes in one vectorized
        # pass — never one Python call per distinct signature
        return t.append_column("__ss", pa.array(
            (s.view(np.uint64) & np.uint64(1023)).astype(np.int64)))

    def first_per_sig(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "__ss" not in g.column_names:
            return g.drop_columns(
                [c for c in ("__ss",) if c in g.column_names])
        g = g.take(pc.sort_indices(g, sort_keys=[
            ("simhash", "ascending"), (id_col, "ascending")]))
        s = g.column("simhash").to_numpy(zero_copy_only=False)
        firsts = np.r_[True, s[1:] != s[:-1]]
        return g.filter(pa.array(firsts)).drop_columns(["__ss"])

    return (
        sigs.map_batches(add_salt, batch_format="pyarrow")
        .groupby("__ss")
        .map_groups(first_per_sig, batch_format="pyarrow")
    )


# ------------------------------------------------------- recall metric


def minhash_lsh_recall(
    ds: Dataset, id_col: str = "doc_id", text_col: str = "text",
    threshold: float = 0.8, num_perm: int = 64, bands: int = 16,
    ngram: int = 3, sample: int = 512,
    seeds: tuple[int, ...] = (1337, 7331, 990001),
) -> dict:
    """Measured LSH candidate recall on a corpus sample: what fraction of
    TRUE near-dup pairs (exact n-gram Jaccard ≥ threshold) collide in at
    least one band — per probe seed, and cumulatively as probes union
    (multi-probe). Deliberately a driver-side sample diagnostic (O(s²)
    exact Jaccard ground truth); use it to choose (num_perm, bands,
    seeds) before a full run, not inside one.

    Returns ``{"true_pairs": n, "recall_per_seed": [...],
    "recall_cumulative": [...], "sample": s}``."""
    rows = ds.limit(sample).take_all()
    ids = [r[id_col] for r in rows]
    texts = [r[text_col] for r in rows]
    grams = [_token_ngrams(t or "", ngram) for t in texts]

    true_pairs: set[tuple] = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            gi, gj = grams[i], grams[j]
            if not gi and not gj:
                continue
            jac = len(gi & gj) / max(1, len(gi | gj))
            if jac >= threshold:
                true_pairs.add((min(ids[i], ids[j]), max(ids[i], ids[j])))

    t = pa.table({id_col: pa.array(ids), text_col: pa.array(texts)})
    caught_union: set[tuple] = set()
    per_seed, cumulative = [], []
    for seed in seeds:
        banded = _minhash_batch(
            t, id_col=id_col, text_col=text_col, num_perm=num_perm,
            bands=bands, ngram=ngram, seed=seed)
        buckets: dict[tuple, list] = {}
        for d, b, k in zip(banded.column("doc").to_pylist(),
                           banded.column("band").to_pylist(),
                           banded.column("band_key").to_pylist()):
            buckets.setdefault((b, k), []).append(d)
        caught: set[tuple] = set()
        for docs in buckets.values():
            if len(docs) < 2:
                continue
            docs = sorted(set(docs))
            for x in range(len(docs)):
                for y in range(x + 1, len(docs)):
                    caught.add((docs[x], docs[y]))
        per_seed.append(
            len(caught & true_pairs) / len(true_pairs) if true_pairs
            else 1.0)
        caught_union |= caught
        cumulative.append(
            len(caught_union & true_pairs) / len(true_pairs) if true_pairs
            else 1.0)
    return {
        "true_pairs": len(true_pairs),
        "recall_per_seed": [round(r, 4) for r in per_seed],
        "recall_cumulative": [round(r, 4) for r in cumulative],
        "sample": len(ids),
    }
