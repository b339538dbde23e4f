"""Corpus-trained unigram language-model scoring — the CCNet-style
quality signal (Wenzek et al. 2019 score Common-Crawl text with a
KenLM model and keep the low-perplexity tail; with no model artifacts
in this container, the honest in-container analog is a unigram LM
trained ON the corpus itself, distributed end-to-end).

No reference analog (Tenzir has no corpus-level text ops). Distributed
shape — the same two-pass contract as ``line_dedup``:

1. **Train** (one keyed aggregate over 16 B/token-type rows): per-batch
   ``np.unique`` token-hash counts → ``groupby(h).sum(n)`` → one remote
   task ranks types by ``(count desc, hash asc)``, keeps the top
   ``vocab_size``, converts to log2-probabilities over the FULL corpus
   token total, and leaves the model in plasma. Only distinct-type
   partial counts ride the shuffle, never tokens.
2. **Score** (map-only): each task binary-searches its docs' token
   hashes against the broadcast model; per-doc bits/token =
   mean(−log2 p), OOV tokens priced at count-1 probability
   (−log2(1/total)). The corpus never moves.

Tokens are identified by their 64-bit hash everywhere (collisions merge
types identically in the distributed path and the sequential oracle —
`lm_score_seq` shares only the tokenize+hash leaf)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from tenzir_ray.text.quality import _WORD


def _token_hashes(text: str | None) -> np.ndarray:
    """lowercased word tokens → uint64 hashes (one per token, in doc
    order)."""
    if not text:
        return np.zeros(0, np.uint64)
    toks = _WORD.findall(text.lower())
    if not toks:
        return np.zeros(0, np.uint64)
    return pd.util.hash_array(np.asarray(toks, dtype=object))


def _token_hashes_batch(col) -> tuple[np.ndarray, np.ndarray]:
    """Whole-column tokenize+hash: (flat uint64 hashes in doc order,
    per-doc token counts) — value-identical to per-doc
    :func:`_token_hashes` (ONE ``hash_array`` call instead of one per
    doc). ASCII fast path: Arrow ``utf8_lower`` + RE2
    ``split_pattern_regex`` ("[^a-z0-9_]+" == Python ``\\w+`` on
    lowered ASCII); any batch with non-ASCII text falls back to the
    per-doc Unicode regex (RE2 char classes are ASCII-only)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    arr = pc.fill_null(arr, "")
    n = len(arr)
    ascii_only = pc.all(pc.equal(
        pc.utf8_length(arr), pc.binary_length(arr))).as_py()
    if not ascii_only:
        parts = [_token_hashes(x) for x in arr.to_pylist()]
        counts = np.fromiter((p.size for p in parts), np.int64, count=n)
        flat = (np.concatenate(parts) if parts
                else np.zeros(0, np.uint64))
        return flat, counts
    la = pc.split_pattern_regex(pc.utf8_lower(arr), pattern="[^a-z0-9_]+")
    per_doc = pc.list_value_length(la).to_numpy(
        zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(la)
    doc = np.repeat(np.arange(n, dtype=np.int64), per_doc)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    flat, doc = flat.filter(pa.array(keep)), doc[keep]
    counts = np.bincount(doc, minlength=n).astype(np.int64)
    if len(flat) == 0:
        return np.zeros(0, np.uint64), counts
    toks = flat.to_numpy(zero_copy_only=False)
    return pd.util.hash_array(toks), counts


def lm_train(ds: Dataset, text_col: str = "text",
             vocab_size: int = 65536):
    """Train the unigram LM; returns an ObjectRef to the plasma-held
    model ``(sorted_h int64, logp float64, total)`` — pass it straight
    to :func:`lm_score`."""
    import ray

    def partial(t: pa.Table) -> pa.Table:
        flat, _ = _token_hashes_batch(t.column(text_col))
        if flat.size == 0:
            return pa.table({"h": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        uniq, cnt = np.unique(flat, return_counts=True)
        # int64 bit-view: uint64 keys above 2^63 overflow Ray's native
        # aggregate into pickled-object blocks (see text/dedup.py)
        return pa.table({"h": pa.array(uniq.view(np.int64), pa.int64()),
                         "n": pa.array(cnt.astype(np.int64))})

    counts = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("h").sum("n"))

    @ray.remote
    def _model(*blocks):
        hs, ns = [], []
        for b in blocks:
            if not b.num_rows:
                continue
            hs.append(b.column("h").combine_chunks()
                      .to_numpy(zero_copy_only=False).astype(np.int64))
            ns.append(b.column("sum(n)").combine_chunks()
                      .to_numpy(zero_copy_only=False).astype(np.int64))
        if not hs:
            return (np.zeros(0, np.int64), np.zeros(0, np.float64), 0)
        h = np.concatenate(hs)
        n = np.concatenate(ns)
        total = int(n.sum())
        # deterministic top-V cut: count desc, hash asc tie-break
        order = np.lexsort((h, -n))[:vocab_size]
        keep_h, keep_n = h[order], n[order]
        s = np.argsort(keep_h)
        logp = np.log2(keep_n[s].astype(np.float64)) - np.log2(total)
        return (keep_h[s], logp, total)

    bundles = list(counts.iter_internal_ref_bundles())
    refs = [r for b in bundles for r in b.block_refs]
    return _model.remote(*refs)


def lm_score(ds: Dataset, model_ref, text_col: str = "text",
             id_col: str = "doc_id",
             out_col: str = "lm_bits_per_token") -> Dataset:
    """Per-doc bits/token under the trained model (lower = more
    in-distribution, the CCNet keep signal). Empty docs score null."""
    import ray

    def score(t: pa.Table) -> pa.Table:
        vocab_h, logp, total = ray.get(model_ref)
        flat, counts = _token_hashes_batch(t.column(text_col))
        th = flat.view(np.int64)
        # elementwise bits for ALL tokens at once (identical values to
        # _lm1_doc_bits, which is elementwise up to the final mean)
        oov_logp = -np.log2(total) if total > 0 else 0.0
        if vocab_h.size and th.size:
            idx = np.searchsorted(vocab_h, th)
            idx[idx == vocab_h.size] = 0
            hit = vocab_h[idx] == th
            bits = np.where(hit, -logp[idx], -oov_logp)
        else:
            bits = np.full(th.size, -oov_logp)
        starts = np.r_[0, np.cumsum(counts[:-1])] if counts.size else counts
        vals = [None if c == 0 else float(np.mean(bits[s:s + c]))
                for s, c in zip(starts, counts)]
        out = t.select([id_col])
        return out.append_column(out_col, pa.array(vals, pa.float64()))

    return ds.map_batches(score, batch_format="pyarrow")


def _lm1_doc_bits(th: np.ndarray, vocab_h: np.ndarray, logp: np.ndarray,
                  total: int) -> float:
    """bits/token of one doc under the unigram model — the ONE shared
    scoring kernel (distributed + sequential oracle run this exact
    float path, so results are bit-identical)."""
    oov_logp = -np.log2(total) if total > 0 else 0.0
    if vocab_h.size:
        idx = np.searchsorted(vocab_h, th)
        idx[idx == vocab_h.size] = 0
        hit = vocab_h[idx] == th
        bits = np.where(hit, -logp[idx], -oov_logp)
    else:
        bits = np.full(th.size, -oov_logp)
    return float(np.mean(bits))


def lm_score_seq(doc_ids: list, texts: list,
                 vocab_size: int = 65536) -> pa.Table:
    """Sequential verification oracle: one-pass dict fold over the same
    token hashes (shares only the tokenize+hash leaf)."""
    from collections import Counter

    c: Counter = Counter()
    per_doc = []
    for x in texts:
        th = _token_hashes(x).view(np.int64)
        per_doc.append(th)
        for v in th.tolist():
            c[v] += 1
    total = sum(c.values())
    top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_size]
    top.sort(key=lambda kv: kv[0])
    vocab_h = np.array([k for k, _ in top], np.int64)
    logp = np.log2(np.array([v for _, v in top], np.float64)) \
        - np.log2(total) if top else np.zeros(0, np.float64)
    scores = [None if th.size == 0
              else _lm1_doc_bits(th, vocab_h, logp, total)
              for th in per_doc]
    return pa.table({
        "doc_id": pa.array(doc_ids, pa.int64()),
        "lm_bits_per_token": pa.array(scores, pa.float64()),
    })


# ------------------------------------------------- bigram stupid backoff

_BI_MULT = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio odd constant


def _bigram_keys(th: np.ndarray) -> np.ndarray:
    """uint64 token hashes (doc order) → uint64 bigram keys
    ``(h_prev * M) ^ h_cur`` (wrapping); length n-1."""
    if th.size < 2:
        return np.zeros(0, np.uint64)
    return (th[:-1] * _BI_MULT) ^ th[1:]


def lm2_train(ds: Dataset, text_col: str = "text",
              vocab_size: int = 65536, bigram_vocab: int | None = None):
    """Train the bigram stupid-backoff LM (Brants et al. 2007 'Large
    language models in machine translation'): one pass emits BOTH
    unigram and bigram hashed counts (``kind`` column keeps the key
    spaces disjoint through a single keyed aggregate); one remote task
    ranks each kind by (count desc, hash asc), keeps the top V / 4·V,
    and leaves ``(uni_h, uni_cnt, bi_h, bi_cnt, total)`` in plasma."""
    import ray

    bigram_vocab = bigram_vocab or vocab_size * 4

    def partial(t: pa.Table) -> pa.Table:
        flat, counts = _token_hashes_batch(t.column(text_col))
        # within-doc bigrams only: global pairwise combine, then drop
        # the positions whose pair crosses a doc boundary
        if flat.size >= 2:
            bk_all = (flat[:-1] * _BI_MULT) ^ flat[1:]
            ends = np.cumsum(counts)
            last_of_doc = np.zeros(flat.size, bool)
            last_of_doc[ends[counts > 0] - 1] = True
            bk = bk_all[~last_of_doc[:-1]]
        else:
            bk = np.zeros(0, np.uint64)
        def counted(flat_arr):
            if flat_arr.size == 0:
                return np.zeros(0, np.int64), np.zeros(0, np.int64)
            u, c = np.unique(flat_arr, return_counts=True)
            return u.view(np.int64), c.astype(np.int64)
        uh, un = counted(flat)
        bh, bn = counted(bk)
        return pa.table({
            "kind": pa.array([1] * uh.size + [2] * bh.size, pa.int8()),
            "h": pa.array(np.concatenate([uh, bh]), pa.int64()),
            "n": pa.array(np.concatenate([un, bn]), pa.int64()),
        })

    counts = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(["kind", "h"]).sum("n"))

    @ray.remote
    def _model(*blocks):
        ks, hs, ns = [], [], []
        for b in blocks:
            if not b.num_rows:
                continue
            ks.append(b.column("kind").combine_chunks()
                      .to_numpy(zero_copy_only=False).astype(np.int8))
            hs.append(b.column("h").combine_chunks()
                      .to_numpy(zero_copy_only=False).astype(np.int64))
            ns.append(b.column("sum(n)").combine_chunks()
                      .to_numpy(zero_copy_only=False).astype(np.int64))
        if not hs:
            z = np.zeros(0, np.int64)
            return (z, z, z, z, 0)
        k = np.concatenate(ks)
        h = np.concatenate(hs)
        n = np.concatenate(ns)

        def top(kind, cap):
            m = k == kind
            hh, nn = h[m], n[m]
            order = np.lexsort((hh, -nn))[:cap]
            hh, nn = hh[order], nn[order]
            s = np.argsort(hh)
            return hh[s], nn[s]

        uni_h, uni_cnt = top(1, vocab_size)
        total = int(n[k == 1].sum())
        bi_h, bi_cnt = top(2, bigram_vocab)
        return (uni_h, uni_cnt, bi_h, bi_cnt, total)

    bundles = list(counts.iter_internal_ref_bundles())
    refs = [r for b in bundles for r in b.block_refs]
    return _model.remote(*refs)


def _lm2_doc_bits(th_u: np.ndarray, uni_h, uni_cnt, bi_h, bi_cnt,
                  total: int) -> float:
    """bits/token of one doc under the stupid-backoff model — the ONE
    shared scoring kernel (distributed + sequential run this exact
    float path, so results are bit-identical)."""
    th = th_u.view(np.int64)
    oov_bits = np.log2(total) if total > 0 else 0.0
    if uni_h.size:
        idx = np.searchsorted(uni_h, th)
        idx[idx == uni_h.size] = 0
        u_hit = uni_h[idx] == th
        u_cnt = np.where(u_hit, uni_cnt[np.minimum(idx, uni_h.size - 1)], 1)
        u_bits = np.where(u_hit,
                          np.log2(total) - np.log2(u_cnt.astype(np.float64)),
                          oov_bits)
    else:
        u_hit = np.zeros(th.size, bool)
        u_cnt = np.ones(th.size, np.int64)
        u_bits = np.full(th.size, oov_bits)
    bits = u_bits.copy()
    if th.size > 1 and bi_h.size:
        bk = _bigram_keys(th_u).view(np.int64)
        bidx = np.searchsorted(bi_h, bk)
        bidx[bidx == bi_h.size] = 0
        b_hit = bi_h[bidx] == bk
        # conditional bits need the PREFIX unigram count too
        use = b_hit & u_hit[:-1]
        b_cnt = bi_cnt[np.minimum(bidx, bi_h.size - 1)].astype(np.float64)
        cond = np.log2(u_cnt[:-1].astype(np.float64)) - np.log2(b_cnt)
        backoff = -np.log2(0.4) + u_bits[1:]
        bits[1:] = np.where(use, cond, backoff)
    elif th.size > 1:
        bits[1:] = -np.log2(0.4) + u_bits[1:]
    return float(np.mean(bits))


def lm2_score(ds: Dataset, model_ref, text_col: str = "text",
              id_col: str = "doc_id",
              out_col: str = "lm2_bits_per_token") -> Dataset:
    """Per-doc bits/token under the bigram stupid-backoff model; empty
    docs score null. Map-only: the model is one plasma read per task."""
    import ray

    def score(t: pa.Table) -> pa.Table:
        uni_h, uni_cnt, bi_h, bi_cnt, total = ray.get(model_ref)
        flat, counts = _token_hashes_batch(t.column(text_col))
        th = flat.view(np.int64)
        # elementwise replication of _lm2_doc_bits over the flat token
        # stream (identical values; only the final mean is per-doc)
        oov_bits = np.log2(total) if total > 0 else 0.0
        if uni_h.size and th.size:
            idx = np.searchsorted(uni_h, th)
            idx[idx == uni_h.size] = 0
            u_hit = uni_h[idx] == th
            u_cnt = np.where(
                u_hit, uni_cnt[np.minimum(idx, uni_h.size - 1)], 1)
            u_bits = np.where(
                u_hit, np.log2(total) - np.log2(u_cnt.astype(np.float64)),
                oov_bits)
        else:
            u_hit = np.zeros(th.size, bool)
            u_cnt = np.ones(th.size, np.int64)
            u_bits = np.full(th.size, oov_bits)
        bits = u_bits.copy()
        if th.size:
            first = np.zeros(flat.size, bool)
            nz = counts > 0
            starts_all = np.r_[0, np.cumsum(counts)[:-1]]
            first[starts_all[nz]] = True
            rest = np.flatnonzero(~first)  # doc-local position >= 1
            if rest.size:
                prev = rest - 1  # same doc by construction
                if bi_h.size:
                    bk = ((flat[prev] * _BI_MULT) ^ flat[rest]) \
                        .view(np.int64)
                    bidx = np.searchsorted(bi_h, bk)
                    bidx[bidx == bi_h.size] = 0
                    b_hit = bi_h[bidx] == bk
                    use = b_hit & u_hit[prev]
                    b_cnt = bi_cnt[np.minimum(bidx, bi_h.size - 1)] \
                        .astype(np.float64)
                    cond = np.log2(u_cnt[prev].astype(np.float64)) \
                        - np.log2(b_cnt)
                    backoff = -np.log2(0.4) + u_bits[rest]
                    bits[rest] = np.where(use, cond, backoff)
                else:
                    bits[rest] = -np.log2(0.4) + u_bits[rest]
        starts = np.r_[0, np.cumsum(counts[:-1])] if counts.size else counts
        vals = [None if c == 0 else float(np.mean(bits[s:s + c]))
                for s, c in zip(starts, counts)]
        out = t.select([id_col])
        return out.append_column(out_col, pa.array(vals, pa.float64()))

    return ds.map_batches(score, batch_format="pyarrow")


def lm2_score_seq(doc_ids: list, texts: list, vocab_size: int = 65536,
                  bigram_vocab: int | None = None) -> pa.Table:
    """Sequential verification oracle: Counter fold over the same hash
    streams (shares the tokenize/hash/bigram-combine leaves and the
    per-doc scoring kernel; the corpus-wide COUNTING is independent)."""
    from collections import Counter

    bigram_vocab = bigram_vocab or vocab_size * 4
    uc: Counter = Counter()
    bc: Counter = Counter()
    per_doc = []
    for x in texts:
        th = _token_hashes(x)
        per_doc.append(th)
        for v in th.view(np.int64).tolist():
            uc[v] += 1
        for v in _bigram_keys(th).view(np.int64).tolist():
            bc[v] += 1

    def top(c: Counter, cap):
        t = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:cap]
        t.sort(key=lambda kv: kv[0])
        return (np.array([k for k, _ in t], np.int64),
                np.array([v for _, v in t], np.int64))

    uni_h, uni_cnt = top(uc, vocab_size)
    bi_h, bi_cnt = top(bc, bigram_vocab)
    total = sum(uc.values())
    scores = [None if th.size == 0 else _lm2_doc_bits(
        th, uni_h, uni_cnt, bi_h, bi_cnt, total) for th in per_doc]
    return pa.table({
        "doc_id": pa.array(doc_ids, pa.int64()),
        "lm2_bits_per_token": pa.array(scores, pa.float64()),
    })
