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

import pyarrow as pa
from ray.data import Dataset

_WORD = re.compile(r"\w+|[^\w\s]", re.UNICODE)

#: end-of-word marker (keeps merges from crossing word boundaries)
_EOW = "\u0001"  # unprintable sentinel: never occurs in words


def _word_counts_distributed(ds: Dataset, text_col: str,
                             lowercase: bool) -> dict[str, int]:
    import ray

    def partial(t: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for txt in t.column(text_col).to_pylist():
            if not txt:
                continue
            if lowercase:
                txt = txt.lower()
            for w in _WORD.findall(txt):
                counts[w] = counts.get(w, 0) + 1
        return pa.table({
            "word": pa.array(list(counts), pa.string()),
            "n": pa.array(list(counts.values()), pa.int64()),
        })

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
    # word → tuple of current symbols
    words: dict[tuple[str, ...], int] = {}
    for w, n in counts.items():
        sym = tuple(w) + (_EOW,)
        words[sym] = words.get(sym, 0) + n

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, n in words.items():
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                pairs[p] = pairs.get(p, 0) + n
        if not pairs:
            break
        # deterministic: max count, then lexicographic pair
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break
        merges.append(best)
        merged = best[0] + best[1]
        new_words: dict[tuple[str, ...], int] = {}
        for sym, n in words.items():
            out = []
            i = 0
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == best[0] \
                        and sym[i + 1] == best[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            t = tuple(out)
            new_words[t] = new_words.get(t, 0) + n
        words = new_words
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
            out = []
            for txt in t.column(text_col).to_pylist():
                if not txt:
                    out.append(0)
                    continue
                if lowercase:
                    txt = txt.lower()
                out.append(sum(self._count_word(w)
                               for w in _WORD.findall(txt)))
            t = t.append_column(out_col, pa.array(out, pa.int64()))
            return t.replace_schema_metadata(None) \
                if t.schema.metadata else t

    from ..util import autoscale_pool

    return ds.map_batches(Tokenizer, batch_format="pyarrow",
                          concurrency=autoscale_pool()
                          if concurrency is None else concurrency)
