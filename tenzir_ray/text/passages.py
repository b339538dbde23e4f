"""Corpus-level repeated-passage detection: the scale path to
ExactSubstr-style substring dedup (Lee et al., "Deduplicating Training
Data Makes Language Models Better") re-expressed Ray-Data-first.

Instead of a corpus-wide suffix array (which needs the whole corpus
co-resident), documents are fingerprinted with **winnowing** (Schleimer
et al., SIGMOD'03): hash every word ``ngram``, then keep only the
minimum hash of each sliding window of ``window`` consecutive n-gram
positions. The winnowing guarantee: any passage of at least
``window + ngram - 1`` tokens shared verbatim by two documents shares at
least one selected fingerprint — so counting fingerprint document
frequencies finds every long repeated passage while shuffling only
~``1/window`` of the corpus' n-gram positions, and only as narrow
``(hash, count)`` rows.

Scale shape (mirrors line_dedup's contract — the corpus never rides a
shuffle):

1. per-batch partial document frequencies of winnowed fingerprints →
   a 16 B/row ``(h, n)`` table is the ONLY exchange input;
2. ``groupby(h).sum`` keeps hashes seen in ≥ ``min_docs`` distinct
   docs; the hot set concatenates in a REMOTE task (driver holds a
   ref) — it contains only fingerprints of passages that actually
   repeat across documents;
3. one broadcast ``np.isin`` per batch scores each document's
   repeated-passage coverage.

No reference analog (Tenzir has no corpus-level text ops).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from tenzir_ray.text.dedup import _WORD, _POS_MULT


def _position_hashes(text: str, n: int) -> np.ndarray:
    """64-bit hash of the word n-gram STARTING at each token position
    (positional — NOT deduped, unlike dedup._shingle_hashes)."""
    import pandas as pd

    toks = _WORD.findall(text.lower())
    if not toks:
        return np.zeros(0, dtype=np.uint64)
    th = pd.util.hash_array(np.array(toks, dtype=object))
    k = min(n, th.size)
    length = th.size - k + 1
    acc = np.zeros(length, dtype=np.uint64)
    for j in range(k):
        acc ^= th[j:j + length] * _POS_MULT[j]
    return acc


def doc_fingerprints(text: str, ngram: int = 8, window: int = 4) -> np.ndarray:
    """Winnowed fingerprint set of one document: distinct window-minima
    over the positional n-gram hashes. Shared leaf of the distributed
    path and the sequential verification oracle."""
    ph = _position_hashes(text, ngram)
    if ph.size == 0:
        return np.zeros(0, dtype=np.uint64)
    w = min(window, ph.size)
    mins = np.lib.stride_tricks.sliding_window_view(ph, w).min(axis=1)
    return np.unique(mins)


def repeated_passages(
    ds: Dataset, id_col: str = "doc_id", text_col: str = "text",
    ngram: int = 8, window: int = 4, min_docs: int = 2,
    concurrency=(1, 8),
) -> Dataset:
    """Score every document's repeated-passage coverage: the fraction of
    its winnowed fingerprints that occur in at least ``min_docs``
    distinct documents corpus-wide. Emits ``n_fingerprints``,
    ``n_repeated`` and ``repeated_fraction`` per document — the signal
    used to drop near-boilerplate documents or route them to passage-
    level scrubbing."""
    import ray

    def partial_df(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pylist()
        parts = [doc_fingerprints(x or "", ngram, window) for x in texts]
        flat = np.concatenate(parts) if parts else np.zeros(0, np.uint64)
        if flat.size == 0:
            return pa.table({"h": pa.array([], pa.uint64()),
                             "n": pa.array([], pa.int64())})
        uniq, counts = np.unique(flat, return_counts=True)
        return pa.table({"h": pa.array(uniq),
                         "n": pa.array(counts.astype(np.int64))})

    df = (ds.map_batches(partial_df, batch_format="pyarrow")
            .groupby("h").sum("n"))

    @ray.remote
    def _hot(*blocks) -> np.ndarray:
        hs = []
        for b in blocks:
            if not b.num_rows:
                continue
            keep = pc.greater_equal(b.column("sum(n)"),
                                    pa.scalar(min_docs))
            hs.append(b.filter(keep).column("h").combine_chunks()
                      .to_numpy(zero_copy_only=False))
        if not hs:
            return np.array([], dtype=np.uint64)
        return np.sort(np.concatenate(hs).astype(np.uint64))

    bundles = list(df.iter_internal_ref_bundles())
    refs = [r for b in bundles for r in b.block_refs]
    hot_ref = _hot.remote(*refs)

    class _Score:
        def __init__(self):
            self.hot = ray.get(hot_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            texts = t.column(text_col).to_pylist()
            n_fp = np.zeros(len(texts), np.int64)
            n_hot = np.zeros(len(texts), np.int64)
            for i, x in enumerate(texts):
                fps = doc_fingerprints(x or "", ngram, window)
                n_fp[i] = fps.size
                if fps.size and self.hot.size:
                    idx = np.searchsorted(self.hot, fps)
                    idx[idx == self.hot.size] = 0
                    n_hot[i] = int(np.count_nonzero(self.hot[idx] == fps))
            frac = np.where(n_fp > 0, n_hot / np.maximum(n_fp, 1), 0.0)
            out = t.select([id_col])
            out = out.append_column("n_fingerprints", pa.array(n_fp))
            out = out.append_column("n_repeated", pa.array(n_hot))
            out = out.append_column("repeated_fraction", pa.array(frac))
            return out

    return ds.map_batches(
        _Score, batch_format="pyarrow", concurrency=concurrency)


def repeated_passages_seq(
    doc_ids: list, texts: list, ngram: int = 8, window: int = 4,
    min_docs: int = 2,
) -> pa.Table:
    """Sequential verification oracle: plain-Python Counter over per-doc
    fingerprint sets (shares only the ``doc_fingerprints`` leaf with
    the distributed path)."""
    from collections import Counter

    per_doc = [set(int(h) for h in doc_fingerprints(t or "", ngram, window))
               for t in texts]
    df = Counter()
    for fps in per_doc:
        df.update(fps)
    hot = {h for h, c in df.items() if c >= min_docs}
    rows = sorted(
        (did, len(fps), len(fps & hot),
         (len(fps & hot) / len(fps)) if fps else 0.0)
        for did, fps in zip(doc_ids, per_doc))
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "n_fingerprints": pa.array([r[1] for r in rows], pa.int64()),
        "n_repeated": pa.array([r[2] for r in rows], pa.int64()),
        "repeated_fraction": pa.array([r[3] for r in rows], pa.float64()),
    })
