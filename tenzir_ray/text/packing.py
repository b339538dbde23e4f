"""Sequence packing for pretraining data prep: concatenate tokenized
documents into fixed-length training sequences (the step between
tokenization and batch assembly; cf. T5 / GPT-3 data pipelines — public
practice: greedy document concatenation with an EOS separator, long
documents split at ``max_len``).

Scale shape: packing is order-dependent, so a corpus-global greedy pack
would serialize. Instead documents are packed within explicit
``id // group_size`` ranges — deterministic at ANY parallelism (the
group key is a pure function of the id, not of batch boundaries), each
group packs independently in one ``map_groups`` task, and the only
shuffle is the group-key exchange of already-tokenized rows. Sequence
ids are (pack_group, seq_in_group) pairs, so output is globally
addressable without coordination.

No reference analog (Tenzir has no training-data ops).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset


def _pack_group(
    ids: list, tok_lists: list, max_len: int, eos_id: int | None
) -> list[tuple[list, list, int, int]]:
    """Concat-and-chunk packing of one group (vectorized-adjacent doc
    walk; the sequential oracle re-derives the same semantics from a
    one-token-at-a-time stream). Returns
    [(input_ids, doc_ids, n_tokens, n_docs), ...]."""
    order = np.argsort(np.asarray(ids))
    seqs: list[tuple[list, list, int, int]] = []
    cur: list = []
    cur_docs: list = []
    for i in order:
        toks = list(tok_lists[i])
        if eos_id is not None:
            toks.append(eos_id)
        did = ids[i]
        # split over-long documents at max_len boundaries
        while len(cur) + len(toks) > max_len:
            room = max_len - len(cur)
            if room > 0:
                cur.extend(toks[:room])
                if did not in cur_docs:
                    cur_docs.append(did)
                toks = toks[room:]
            seqs.append((cur, cur_docs, len(cur), len(cur_docs)))
            cur, cur_docs = [], []
        if toks:
            cur.extend(toks)
            if did not in cur_docs:
                cur_docs.append(did)
    if cur:
        seqs.append((cur, cur_docs, len(cur), len(cur_docs)))
    return seqs


def pack_sequences(
    ds: Dataset, max_len: int = 2048, id_col: str = "doc_id",
    tokens_col: str = "tokens", group_size: int = 1024,
    eos_id: int | None = None,
) -> Dataset:
    """Pack tokenized documents into training sequences (concat-and-
    chunk, GPT-style): within each ``id // group_size`` range, document
    token lists concatenate in ascending ``id_col`` order (``eos_id``
    appended per doc when given) and chop into ``max_len`` windows —
    every sequence is exactly ``max_len`` tokens except the last of
    each group; documents cross sequence boundaries. Emits one row per
    sequence: ``(pack_group, seq_in_group, input_ids, doc_ids,
    n_tokens, n_docs)``."""
    def add_group(t: pa.Table) -> pa.Table:
        # numpy floor_divide, NOT pc.divide: Arrow integer division
        # truncates toward zero, which would disagree with the
        # documented `id // group_size` contract (and the oracle) on
        # negative ids
        ids = t.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        g = np.floor_divide(ids, np.int64(group_size))
        t = t.append_column("pack_group", pa.array(g, pa.int64()))
        return t.replace_schema_metadata(None) if t.schema.metadata else t

    def pack(t: pa.Table) -> pa.Table:
        grp = int(t.column("pack_group")[0].as_py())
        ids = t.column(id_col).to_pylist()
        toks = t.column(tokens_col).to_pylist()
        seqs = _pack_group(ids, toks, max_len, eos_id)
        return pa.table({
            "pack_group": pa.array([grp] * len(seqs), pa.int64()),
            "seq_in_group": pa.array(range(len(seqs)), pa.int64()),
            "input_ids": pa.array([s[0] for s in seqs],
                                  pa.list_(pa.int64())),
            "doc_ids": pa.array([s[1] for s in seqs],
                                pa.list_(pa.int64())),
            "n_tokens": pa.array([s[2] for s in seqs], pa.int64()),
            "n_docs": pa.array([s[3] for s in seqs], pa.int64()),
        })

    return ds.map_batches(add_group, batch_format="pyarrow") \
        .groupby("pack_group").map_groups(pack, batch_format="pyarrow")


def pack_sequences_seq(
    doc_ids: list, tok_lists: list, max_len: int = 2048,
    group_size: int = 1024, eos_id: int | None = None,
) -> pa.Table:
    """Sequential verification oracle: independent one-token-at-a-time
    reimplementation (no shared packing kernel) — a token stream per
    group with doc markers, chopped into ``max_len`` windows."""
    by_group: dict[int, list[tuple[int, list]]] = {}
    for did, toks in zip(doc_ids, tok_lists):
        by_group.setdefault(int(did) // group_size, []).append(
            (int(did), list(toks)))
    rows = []
    for g in sorted(by_group):
        # flat (token, doc) stream in ascending doc order
        stream: list[tuple[int, int]] = []
        for did, toks in sorted(by_group[g]):
            for tk in toks:
                stream.append((int(tk), did))
            if eos_id is not None:
                stream.append((int(eos_id), did))
        j = 0
        for s in range(0, len(stream), max_len):
            win = stream[s:s + max_len]
            seq, docs = [], []
            for tk, did in win:  # one token at a time
                seq.append(tk)
                if not docs or docs[-1] != did:
                    docs.append(did)
            rows.append((g, j, seq, docs, len(seq), len(docs)))
            j += 1
    return pa.table({
        "pack_group": pa.array([r[0] for r in rows], pa.int64()),
        "seq_in_group": pa.array([r[1] for r in rows], pa.int64()),
        "input_ids": pa.array([r[2] for r in rows], pa.list_(pa.int64())),
        "doc_ids": pa.array([r[3] for r in rows], pa.list_(pa.int64())),
        "n_tokens": pa.array([r[4] for r in rows], pa.int64()),
        "n_docs": pa.array([r[5] for r in rows], pa.int64()),
    })


def hash_token_ids(
    ds: Dataset, text_col: str = "text", out_col: str = "tokens",
    vocab: int = 50_000,
) -> Dataset:
    """Deterministic stand-in tokenizer: word → stable 64-bit hash mod
    ``vocab`` (the packing pipeline is tokenizer-agnostic; real BPE ids
    plug into the same ``tokens`` column). Batch-flat hashing — one
    ``hash_array`` call per batch, no per-token Python hashing."""
    import pandas as pd

    from tenzir_ray.text.dedup import _WORD

    def tok(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pylist()
        tok_lists = [_WORD.findall((x or "").lower()) for x in texts]
        flat = np.array([w for tl in tok_lists for w in tl], dtype=object)
        h = (pd.util.hash_array(flat) % np.uint64(vocab)).astype(np.int64) \
            if flat.size else np.zeros(0, np.int64)
        lens = np.fromiter((len(tl) for tl in tok_lists), np.int64,
                           count=len(tok_lists))
        offsets = np.zeros(len(lens) + 1, np.int64)
        np.cumsum(lens, out=offsets[1:])
        arr = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                       pa.array(h, pa.int64()))
        t = t.append_column(out_col, arr)
        return t.replace_schema_metadata(None) if t.schema.metadata else t

    return ds.map_batches(tok, batch_format="pyarrow")


def chunk_tokens(
    ds: Dataset, text_col: str = "text", id_col: str = "doc_id", *,
    size: int = 256, overlap: int = 32,
) -> Dataset:
    """Overlapping token-window chunking — retrieval/RAG prep (the dual
    of packing: packing concatenates docs for training, chunking splits
    docs for indexing). Each document's whitespace tokens emit windows
    of ``size`` tokens at stride ``size − overlap``; the final window
    is the tail remainder (never duplicated when the doc fits one
    window). Chunk text re-joins tokens with single spaces — chunking
    normalizes whitespace BY DESIGN (byte-exact with the sequential
    oracle).

    Output: (id_col, chunk_idx, n_tokens, text) — one row per window,
    globally addressable without coordination.

    Scale shape: one ``map_batches`` kernel, zero shuffle. The whole
    batch tokenizes in ONE Arrow pass (``utf8_split_whitespace``);
    window gather indices are pure numpy arithmetic over the flat token
    buffer, and chunk strings materialize with a single
    ``pc.binary_join`` over a reconstructed ListArray — no per-chunk
    Python."""
    stride = size - overlap
    if stride <= 0:
        raise ValueError("chunk_tokens: overlap must be < size")

    def kernel(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        col = t.column(text_col)
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
            else col
        lists = pc.utf8_split_whitespace(pc.fill_null(col, ""))
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        # drop empty tokens (leading/trailing/repeated whitespace)
        flat0 = lists.flatten()
        keep = pc.not_equal(flat0, "").to_numpy(zero_copy_only=False)
        lens0 = pc.list_value_length(lists).to_numpy(
            zero_copy_only=False).astype(np.int64)
        doc_of = np.repeat(np.arange(len(lens0)), lens0)
        flat = flat0.filter(pa.array(keep))
        doc_of = doc_of[keep]
        n_tok = np.bincount(doc_of, minlength=len(lens0)).astype(np.int64)
        starts = np.zeros(len(lens0), np.int64)
        np.cumsum(n_tok[:-1], out=starts[1:]) if len(lens0) > 1 else None
        # windows per doc: ceil((n - overlap) / stride) for n>size else 1
        n_win = np.where(
            n_tok <= size, (n_tok > 0).astype(np.int64),
            (n_tok - overlap + stride - 1) // stride)
        total = int(n_win.sum())
        if total == 0:
            return pa.table({
                id_col: pa.array([], t.column(id_col).type),
                "chunk_idx": pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
                "text": pa.array([], pa.string()),
            })
        win_doc = np.repeat(np.arange(len(lens0)), n_win)
        win_idx = np.arange(total) - np.repeat(
            np.cumsum(n_win) - n_win, n_win)
        w_start = starts[win_doc] + win_idx * stride
        w_end = np.minimum(w_start + size,
                           starts[win_doc] + n_tok[win_doc])
        w_len = w_end - w_start
        # gather indices for every window token, then one ListArray
        gather = np.repeat(w_start, w_len) + (
            np.arange(int(w_len.sum()))
            - np.repeat(np.cumsum(w_len) - w_len, w_len))
        taken = flat.take(pa.array(gather, pa.int64()))
        offsets = np.zeros(total + 1, np.int32)
        np.cumsum(w_len, out=offsets[1:])
        chunk_lists = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), taken.cast(pa.string()))
        texts = pc.binary_join(chunk_lists, " ")
        ids = t.column(id_col).combine_chunks() \
            if isinstance(t.column(id_col), pa.ChunkedArray) \
            else t.column(id_col)
        return pa.table({
            id_col: ids.take(pa.array(win_doc, pa.int64())),
            "chunk_idx": pa.array(win_idx, pa.int64()),
            "n_tokens": pa.array(w_len, pa.int64()),
            "text": texts.cast(pa.string()),
        })

    return ds.map_batches(kernel, batch_format="pyarrow")
