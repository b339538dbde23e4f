"""Byte-pair-encoding tokenizer: distributed train + tokenize.

The training-data-pipeline ask beyond regex token counting: a real BPE
merge table learned from the corpus and applied distributed.

- :func:`bpe_train` — word frequencies are gathered DISTRIBUTED
  (per-batch Arrow hash partials, one remote combine — the
  ``summarize_partial`` shape), then the merge loop runs driver-side
  over the word-frequency dict: BPE merge selection is inherently
  sequential (each merge depends on the previous), and the dict is
  vocabulary-sized (≤ a few hundred K words), not corpus-sized.
  Deterministic: ties break lexicographically.
- :func:`bpe_tokenize` — the merge table broadcasts via ``ray.put``
  once; an actor-pool stage applies it per batch with a per-actor word
  cache (Zipf: a few thousand distinct words cover most of a batch, so
  amortized cost is one dict hit per word occurrence).

Reference anchor: Tenzir has no BPE; this is a beyond-reference
LLM-pipeline operator (brief: "token counting … BPE"). Algorithm is the
public Sennrich et al. 2016 merge procedure.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

_WORD = re.compile(r"\w+|[^\w\s]", re.UNICODE)

#: end-of-word marker (keeps merges from crossing word boundaries)
_EOW = "\u0001"  # unprintable sentinel: never occurs in words


def _tokenize_batch(col, lowercase: bool) -> tuple[pa.Array, "np.ndarray"]:
    """Whole-column BPE pre-tokenize: (flat word/punct tokens in doc
    order, per-doc token counts) — value-identical to per-doc
    ``_WORD.findall`` (``\\w+|[^\\w\\s]``). ASCII fast path: pad every
    punct char with spaces via one RE2 replace, then
    ``utf8_split_whitespace``; non-ASCII batches fall back to the
    per-doc Unicode regex (RE2 ``\\w`` is ASCII-only)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    arr = pc.fill_null(arr, "")
    n = len(arr)
    ascii_only = pc.all(pc.equal(
        pc.utf8_length(arr), pc.binary_length(arr))).as_py()
    if ascii_only and n:
        # \x0b and \x1c-\x1f are whitespace to Python's \s but not to
        # RE2/Arrow — batches containing them must take the per-doc
        # path or tokenization would depend on batch composition
        ctl = pc.any(pc.match_substring_regex(
            arr, "[\x0b\x1c-\x1f]")).as_py()
        ascii_only = not ctl
    if not ascii_only:
        per_doc = [_WORD.findall(x.lower() if lowercase else x)
                   for x in arr.to_pylist()]
        counts = np.fromiter((len(p) for p in per_doc), np.int64, count=n)
        flat = pa.array([w for p in per_doc for w in p], pa.string())
        return flat, counts
    if lowercase:
        arr = pc.utf8_lower(arr)
    padded = pc.replace_substring_regex(
        arr, pattern=r"([^\w\s])", replacement=r" \1 ")
    la = pc.utf8_split_whitespace(padded)
    per = pc.list_value_length(la).to_numpy(
        zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(la)
    doc = np.repeat(np.arange(n, dtype=np.int64), per)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    return (flat.filter(pa.array(keep)),
            np.bincount(doc[keep], minlength=n).astype(np.int64))


def _word_counts_distributed(ds: Dataset, text_col: str,
                             lowercase: bool) -> dict[str, int]:
    import ray

    def partial(t: pa.Table) -> pa.Table:
        flat, _ = _tokenize_batch(t.column(text_col), lowercase)
        if len(flat) == 0:
            return pa.table({"word": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        vc = pc.value_counts(flat)
        return pa.table({"word": vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    partials = ds.map_batches(partial, batch_format="pyarrow").materialize()
    refs = [r for b in partials.iter_internal_ref_bundles()
            for r in b.block_refs]
    if not refs:  # empty corpus
        return {}

    @ray.remote
    def combine(*blocks) -> pa.Table:
        # blocks are always typed (even 0-row), so concat keeps schema
        # and an all-empty corpus yields an empty (not crashing) result
        tb = pa.concat_tables(blocks)
        g = tb.group_by("word", use_threads=False).aggregate([("n", "sum")])
        return g

    g = ray.get(combine.remote(*refs))
    return dict(zip(g.column("word").to_pylist(),
                    g.column("n_sum").to_pylist()))


def bpe_train(ds: Dataset, text_col: str = "text", num_merges: int = 256,
              lowercase: bool = True,
              max_words: int | None = 200_000) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus. Returns the
    ordered merge list (the model). ``max_words`` keeps the driver-side
    frequency dict bounded (most-frequent words carry almost all pair
    mass under Zipf)."""
    counts = _word_counts_distributed(ds, text_col, lowercase)
    if max_words is not None and len(counts) > max_words:
        keep = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        counts = dict(keep[:max_words])
    # indexed incremental trainer (subword-nmt style): a merge touches
    # only the words CONTAINING the merged pair; pair counts update
    # exactly, and the argmax comes from a lazy-invalidation heap whose
    # (-count, pair) entries reproduce the naive full-recount
    # tie-break (max count, then lexicographic pair) bit-for-bit.
    import heapq
    from collections import defaultdict

    agg: dict[tuple[str, ...], int] = {}
    for w, n in counts.items():
        sym = tuple(w) + (_EOW,)
        agg[sym] = agg.get(sym, 0) + n
    entries: list[list] = [[list(s), n] for s, n in agg.items()]

    pair_n: dict[tuple[str, str], int] = defaultdict(int)
    where: dict[tuple[str, str], set[int]] = defaultdict(set)
    for wi, (sym, n) in enumerate(entries):
        for i in range(len(sym) - 1):
            p = (sym[i], sym[i + 1])
            pair_n[p] += n
            where[p].add(wi)
    heap = [(-c, p) for p, c in pair_n.items()]
    heapq.heapify(heap)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        best = None
        while heap:
            negc, p = heapq.heappop(heap)
            if pair_n.get(p, 0) == -negc:  # fresh entry
                best = p
                break
        if best is None or pair_n[best] < 2:
            break
        merges.append(best)
        merged = best[0] + best[1]
        touched: set[tuple[str, str]] = set()
        for wi in where.pop(best, ()):  # may hold stale indices
            sym, n = entries[wi]
            out = []
            i = 0
            hit = False
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == best[0] \
                        and sym[i + 1] == best[1]:
                    out.append(merged)
                    i += 2
                    hit = True
                else:
                    out.append(sym[i])
                    i += 1
            if not hit:  # stale where entry
                continue
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                pair_n[p] -= n
                touched.add(p)
            for i in range(len(out) - 1):
                p = (out[i], out[i + 1])
                pair_n[p] += n
                where[p].add(wi)
                touched.add(p)
            entries[wi][0] = out
        del pair_n[best]
        touched.discard(best)
        for p in touched:
            if pair_n.get(p, 0) <= 0:
                pair_n.pop(p, None)
            else:
                heapq.heappush(heap, (-pair_n[p], p))
    return merges


def bpe_encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges to one word (lowest-rank pair first — the standard
    greedy BPE application)."""
    sym = list(word) + [_EOW]
    while len(sym) > 1:
        best_rank, best_i = None, None
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        sym[best_i:best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return [s[:-len(_EOW)] if s.endswith(_EOW) else s
            for s in sym if s != _EOW]


def bpe_tokenize(ds: Dataset, merges: list[tuple[str, str]],
                 text_col: str = "text", out_col: str = "bpe_n_tokens",
                 lowercase: bool = True,
                 concurrency: int | tuple | None = None) -> Dataset:
    """Append the BPE token COUNT per document (the training-data
    metric). Merge table broadcast once; per-actor word→len cache."""
    import ray

    merges_ref = ray.put(list(merges))

    class Tokenizer:
        def __init__(self):
            ms = ray.get(merges_ref)
            self.ranks = {tuple(m): i for i, m in enumerate(ms)}
            self.cache: dict[str, int] = {}

        def _count_word(self, w: str) -> int:
            n = self.cache.get(w)
            if n is None:
                n = len(bpe_encode_word(w, self.ranks))
                if len(self.cache) < 500_000:
                    self.cache[w] = n
            return n

        def __call__(self, t: pa.Table) -> pa.Table:
            # vectorized: tokenize the whole batch at once, encode each
            # DISTINCT word once (per-actor cache), then the per-doc
            # count is one bincount over the code stream
            flat, counts = _tokenize_batch(t.column(text_col), lowercase)
            if len(flat):
                enc = pc.dictionary_encode(flat)
                vocab = enc.dictionary.to_pylist()
                wlen = np.fromiter((self._count_word(w) for w in vocab),
                                   np.int64, count=len(vocab))
                codes = enc.indices.to_numpy(
                    zero_copy_only=False).astype(np.int64)
                doc = np.repeat(np.arange(t.num_rows, dtype=np.int64),
                                counts)
                out = np.bincount(doc, weights=wlen[codes],
                                  minlength=t.num_rows).astype(np.int64)
            else:
                out = np.zeros(t.num_rows, np.int64)
            t = t.append_column(out_col, pa.array(out, pa.int64()))
            return t.replace_schema_metadata(None) \
                if t.schema.metadata else t

    from ..util import autoscale_pool

    return ds.map_batches(Tokenizer, batch_format="pyarrow",
                          concurrency=autoscale_pool()
                          if concurrency is None else concurrency)
