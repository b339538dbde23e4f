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


def _acc_hashes(th: np.ndarray, n: int) -> np.ndarray:
    """Positional n-gram hashes for every n-gram start (XOR-multiplier
    combine) — the shared leaf of winnowed detection and per-position
    removal."""
    if th.size == 0:
        return np.zeros(0, dtype=np.uint64)
    k = min(n, th.size)
    length = th.size - k + 1
    acc = np.zeros(length, dtype=np.uint64)
    for j in range(k):
        acc ^= th[j:j + length] * _POS_MULT[j]
    return acc


def _fps_from_token_hashes(th: np.ndarray, n: int, w: int) -> np.ndarray:
    """Winnowed fingerprints from one document's token-hash array:
    positional n-gram hashes, then window-of-``w`` minima, deduped."""
    acc = _acc_hashes(th, n)
    if acc.size == 0:
        return acc
    w = min(w, acc.size)
    mins = np.lib.stride_tricks.sliding_window_view(acc, w).min(axis=1)
    return np.unique(mins)


def _hot_hash_ref(df: Dataset, min_docs: int):
    """(h, sum(n)) aggregate Dataset → object ref of the sorted int64
    hot-hash array (total count >= ``min_docs``), concatenated in a
    REMOTE task — the driver only ever holds the ref; scoring tasks
    read it zero-copy from plasma."""
    import ray

    @ray.remote
    def _hot(*blocks) -> np.ndarray:
        hs = []
        for b in blocks:
            if not b.num_rows:
                continue
            keep = pc.greater_equal(b.column("sum(n)"), pa.scalar(min_docs))
            hs.append(b.filter(keep).column("h").combine_chunks()
                      .to_numpy(zero_copy_only=False))
        if not hs:
            return np.array([], dtype=np.int64)
        return np.sort(np.concatenate(hs).astype(np.int64))

    bundles = list(df.iter_internal_ref_bundles())
    refs = [r for b in bundles for r in b.block_refs]
    return _hot.remote(*refs)


def doc_fingerprints(text: str, ngram: int = 8, window: int = 4) -> np.ndarray:
    """Winnowed fingerprint set of one document: distinct window-minima
    over the positional n-gram hashes. Shared leaf of the distributed
    path and the sequential verification oracle."""
    import pandas as pd

    toks = _WORD.findall((text or "").lower())
    if not toks:
        return np.zeros(0, dtype=np.uint64)
    th = pd.util.hash_array(np.array(toks, dtype=object))
    return _fps_from_token_hashes(th, ngram, window)


def _batch_fingerprints(col, ngram: int, window: int) \
        -> list[np.ndarray]:
    """Per-doc fingerprint arrays for a whole batch: one vectorized
    tokenize+hash pass over the column (``_token_hashes_batch``),
    then per-doc window-min on array views — identical results to
    per-doc :func:`doc_fingerprints`."""
    from tenzir_ray.text.lm import _token_hashes_batch

    th_all, counts = _token_hashes_batch(col)
    out, pos = [], 0
    for c in counts:
        out.append(_fps_from_token_hashes(th_all[pos:pos + c],
                                          ngram, window))
        pos += c
    return out


def repeated_passages(
    ds: Dataset, id_col: str = "doc_id", text_col: str = "text",
    ngram: int = 8, window: int = 4, min_docs: int = 2,
) -> Dataset:
    """Score every document's repeated-passage coverage: the fraction of
    its winnowed fingerprints that occur in at least ``min_docs``
    distinct documents corpus-wide. Emits ``n_fingerprints``,
    ``n_repeated`` and ``repeated_fraction`` per document — the signal
    used to drop near-boilerplate documents or route them to passage-
    level scrubbing."""
    import ray

    def partial_df(t: pa.Table) -> pa.Table:
        parts = _batch_fingerprints(t.column(text_col), ngram, window)
        flat = np.concatenate(parts) if parts else np.zeros(0, np.uint64)
        if flat.size == 0:
            return pa.table({"h": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        uniq, counts = np.unique(flat, return_counts=True)
        # int64 BIT VIEW of the uint64 hash: values above 2^63 would
        # overflow Ray's native aggregate into pickled-object key
        # blocks (type-unstable, slow); the signed view is a bijection
        # so grouping/membership are unchanged
        return pa.table({"h": pa.array(uniq.view(np.int64), pa.int64()),
                         "n": pa.array(counts.astype(np.int64))})

    df = (ds.map_batches(partial_df, batch_format="pyarrow")
            .groupby("h").sum("n"))
    hot_ref = _hot_hash_ref(df, min_docs)

    def score(t: pa.Table) -> pa.Table:
        # plain task (no actor pool): the hot array is a single plasma
        # object, so per-task ray.get is a zero-copy shared-memory read
        hot = ray.get(hot_ref)
        parts = _batch_fingerprints(t.column(text_col), ngram, window)
        n_fp = np.fromiter((p.size for p in parts), np.int64,
                           count=len(parts))
        flat = np.concatenate(parts) if parts else np.zeros(0, np.uint64)
        flat_i = flat.view(np.int64)  # same bit-view as the hot set
        n_hot = np.zeros(len(parts), np.int64)
        if flat.size and hot.size:
            idx = np.searchsorted(hot, flat_i)
            idx[idx == hot.size] = 0
            hit = (hot[idx] == flat_i).astype(np.int64)
            starts = np.zeros(len(parts), np.int64)
            np.cumsum(n_fp[:-1], out=starts[1:])
            # reduceat over NON-EMPTY docs' starts only: empty docs
            # contribute no flat elements, so consecutive non-empty
            # starts delimit exactly the non-empty segments (clamping
            # empty trailing starts instead would truncate the last
            # real segment)
            nz = n_fp > 0
            n_hot[nz] = np.add.reduceat(hit, starts[nz])
        frac = np.where(n_fp > 0, n_hot / np.maximum(n_fp, 1), 0.0)
        out = t.select([id_col])
        out = out.append_column("n_fingerprints", pa.array(n_fp))
        out = out.append_column("n_repeated", pa.array(n_hot))
        out = out.append_column("repeated_fraction", pa.array(frac))
        return out

    return ds.map_batches(score, batch_format="pyarrow")


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


# ------------------------------------------------------- passage removal


def _tok_spans(text: str) -> tuple[list[str], list[tuple[int, int]]]:
    """(lowercased tokens, char spans) from the ORIGINAL text — spans
    index the original string so removal is a verbatim char-range cut
    (no re-join drift from lowercasing length changes)."""
    toks, spans = [], []
    for m in _WORD.finditer(text or ""):
        toks.append(m.group().lower())
        spans.append(m.span())
    return toks, spans


def scrub_passages(
    ds: Dataset, id_col: str = "doc_id", text_col: str = "text",
    ngram: int = 8, min_docs: int = 2, out_col: str = "text_scrubbed",
) -> Dataset:
    """Cross-document duplicated-passage REMOVAL (the act-on-it dual of
    :func:`repeated_passages` detection; ExactSubstr removal from Lee et
    al. 2021 re-expressed Ray-Data-first): cut from each document every
    char span whose tokens are covered by an n-gram occurring in
    ``>= min_docs`` distinct documents corpus-wide.

    Two phases, corpus never rides a shuffle:

    1. per-batch per-doc-distinct n-gram hash counts → 16 B ``(h, n)``
       rows are the only exchange; ``groupby(h).sum`` → hot set (hashes
       in >= min_docs docs) concatenated in a remote task and broadcast
       (plasma ref, zero-copy per task). Unlike detection this counts
       ALL n-gram positions, not winnowed minima — removal needs exact
       per-position coverage (the same volume class as line_dedup's
       exchange: one narrow row per distinct n-gram).
    2. one broadcast ``searchsorted`` pass per batch: a token is covered
       iff any hot n-gram spans it (difference-array + cumsum, no
       per-token loop); maximal covered runs are cut from the ORIGINAL
       string by char span, leaving surrounding text verbatim.

    Emits ``out_col`` plus n_tokens / n_removed_tokens per document."""
    import ray

    def partial_df(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pylist()
        import pandas as pd

        tok_lists = [_tok_spans(x)[0] for x in texts]
        flat = np.array([x for tk in tok_lists for x in tk], dtype=object)
        th_all = pd.util.hash_array(flat) if flat.size \
            else np.zeros(0, np.uint64)
        parts, pos = [], 0
        for tk in tok_lists:
            parts.append(np.unique(_acc_hashes(
                th_all[pos:pos + len(tk)], ngram)))
            pos += len(tk)
        flat_h = np.concatenate(parts) if parts else np.zeros(0, np.uint64)
        if flat_h.size == 0:
            return pa.table({"h": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        uniq, counts = np.unique(flat_h, return_counts=True)
        # int64 bit-view keeps Ray's native aggregate on the fast path
        return pa.table({"h": pa.array(uniq.view(np.int64), pa.int64()),
                         "n": pa.array(counts.astype(np.int64))})

    df = (ds.map_batches(partial_df, batch_format="pyarrow")
            .groupby("h").sum("n"))
    hot_ref = _hot_hash_ref(df, min_docs)

    def scrub(t: pa.Table) -> pa.Table:
        import pandas as pd

        hot = ray.get(hot_ref)
        texts = t.column(text_col).to_pylist()
        parsed = [_tok_spans(x) for x in texts]
        flat = np.array([x for tk, _ in parsed for x in tk], dtype=object)
        th_all = pd.util.hash_array(flat) if flat.size \
            else np.zeros(0, np.uint64)
        outs, n_tok, n_rem = [], [], []
        pos = 0
        for (toks, spans), text in zip(parsed, texts):
            L = len(toks)
            th = th_all[pos:pos + L]
            pos += L
            if L == 0 or hot.size == 0:
                outs.append(text)
                n_tok.append(L)
                n_rem.append(0)
                continue
            acc = _acc_hashes(th, ngram).view(np.int64)
            idx = np.searchsorted(hot, acc)
            idx[idx == hot.size] = 0
            hot_start = hot[idx] == acc
            k = min(ngram, L)
            # difference array: +1 at each hot n-gram start, -1 past its
            # end; cumsum > 0 = token covered by some hot n-gram
            diff = np.zeros(L + 1, np.int64)
            starts = np.flatnonzero(hot_start)
            np.add.at(diff, starts, 1)
            np.add.at(diff, starts + k, -1)
            covered = np.cumsum(diff[:-1]) > 0
            if not covered.any():
                outs.append(text)
                n_tok.append(L)
                n_rem.append(0)
                continue
            # maximal covered runs → verbatim char-range cuts
            edges = np.flatnonzero(np.diff(
                np.concatenate(([0], covered.view(np.int8), [0]))))
            pieces, cur = [], 0
            for r0, r1 in zip(edges[::2], edges[1::2]):
                pieces.append(text[cur:spans[r0][0]])
                cur = spans[r1 - 1][1]
            pieces.append(text[cur:])
            outs.append("".join(pieces))
            n_tok.append(L)
            n_rem.append(int(covered.sum()))
        # transform semantics: CARRY the input columns (a removal stage
        # must compose with downstream stages needing source/lang/etc.)
        out = t.append_column(out_col, pa.array(outs, pa.string()))
        out = out.append_column("n_tokens", pa.array(n_tok, pa.int64()))
        out = out.append_column("n_removed_tokens",
                                pa.array(n_rem, pa.int64()))
        return out.replace_schema_metadata(None) if out.schema.metadata \
            else out

    return ds.map_batches(scrub, batch_format="pyarrow")


def scrub_passages_seq(
    doc_ids: list, texts: list, ngram: int = 8, min_docs: int = 2,
) -> pa.Table:
    """Sequential verification oracle for :func:`scrub_passages`:
    one-document/one-position-at-a-time reimplementation (pure-Python
    integer arithmetic for the n-gram hash combine; shares only the
    tokenizer and the hash leaf)."""
    import pandas as pd

    MASK = (1 << 64) - 1
    per_doc = []
    for x in texts:
        toks, spans = _tok_spans(x or "")
        th = (pd.util.hash_array(np.array(toks, dtype=object))
              if toks else np.zeros(0, np.uint64))
        per_doc.append((toks, spans, th))

    def ngrams_of(th) -> list[int]:
        L = len(th)
        if L == 0:
            return []
        k = min(ngram, L)
        out = []
        for j in range(L - k + 1):  # one position at a time
            h = 0
            for jj in range(k):
                h ^= (int(th[j + jj]) * int(_POS_MULT[jj])) & MASK
            out.append(h)
        return out

    from collections import Counter

    df = Counter()
    for _toks, _spans, th in per_doc:
        df.update(set(ngrams_of(th)))
    hot = {h for h, c in df.items() if c >= min_docs}

    out_text, out_ntok, out_nrem = [], [], []
    for (toks, spans, th), text in zip(per_doc, texts):
        text = text or ""
        L = len(toks)
        grams = ngrams_of(th)
        k = min(ngram, L)
        covered = [False] * L
        for j, h in enumerate(grams):
            if h in hot:
                for p in range(j, min(j + k, L)):
                    covered[p] = True
        if not any(covered):
            out_text.append(text)
            out_ntok.append(L)
            out_nrem.append(0)
            continue
        pieces, cur, p = [], 0, 0
        while p < L:
            if covered[p]:
                q = p
                while q + 1 < L and covered[q + 1]:
                    q += 1
                pieces.append(text[cur:spans[p][0]])
                cur = spans[q][1]
                p = q + 1
            else:
                p += 1
        pieces.append(text[cur:])
        out_text.append("".join(pieces))
        out_ntok.append(L)
        out_nrem.append(sum(covered))
    order = np.argsort(np.asarray(doc_ids))
    return pa.table({
        "doc_id": pa.array([doc_ids[i] for i in order], pa.int64()),
        "text_scrubbed": pa.array([out_text[i] for i in order], pa.string()),
        "n_tokens": pa.array([out_ntok[i] for i in order], pa.int64()),
        "n_removed_tokens": pa.array([out_nrem[i] for i in order],
                                     pa.int64()),
    })
