"""Text analysis for training-data curation: language id, quality scoring,
token counting, document fingerprinting. One fused, vectorized
``map_batches`` stage (regexes and stopword tables compiled once per actor).
"""

from __future__ import annotations

import re
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

# Tiny per-language stopword profiles for the n-gram/stopword heuristic
# language id (public-knowledge word lists, heavily truncated).
_LANG_STOPWORDS: dict[str, set[str]] = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for",
           "was", "with", "as", "his", "on", "be", "at", "by", "had", "not",
           "are", "this", "but", "from", "they"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "den",
           "von", "zu", "sich", "des", "auf", "für", "im", "dem", "sie",
           "auch", "werden", "eine", "als", "aus", "wird", "bei"},
    "fr": {"le", "la", "les", "de", "des", "et", "est", "un", "une", "que",
           "en", "du", "dans", "qui", "au", "pour", "pas", "sur", "ce",
           "il", "sont", "avec", "plus", "par", "mais"},
    "es": {"el", "la", "los", "de", "y", "es", "un", "una", "que", "en",
           "del", "las", "se", "por", "con", "para", "su", "al", "lo",
           "como", "más", "pero", "sus", "le", "ya"},
    "pt": {"o", "a", "os", "de", "e", "um", "uma", "que", "não", "para",
           "do", "da", "em", "com", "as", "se", "por", "dos", "como",
           "mas", "foi", "ao", "das", "tem", "seu"},
    "it": {"il", "la", "di", "e", "che", "un", "una", "per", "non", "sono",
           "in", "del", "le", "si", "con", "della", "dei", "come", "più",
           "anche", "nel", "alla", "gli", "lo", "ha"},
    "nl": {"de", "het", "een", "en", "van", "is", "dat", "op", "te",
           "niet", "zijn", "voor", "met", "die", "aan", "er", "maar",
           "om", "ook", "als", "dan", "bij", "nog", "naar", "uit"},
    "sv": {"och", "att", "det", "som", "en", "på", "är", "av", "för",
           "med", "den", "till", "inte", "om", "ett", "han", "var",
           "jag", "sig", "från", "vi", "så", "kan", "när", "har"},
    "pl": {"i", "w", "na", "z", "do", "się", "nie", "jest", "że", "to",
           "jak", "po", "co", "tak", "za", "od", "ale", "przez", "być",
           "dla", "już", "czy", "tylko", "może", "przy"},
    "tr": {"bir", "ve", "bu", "da", "de", "için", "ile", "olarak", "çok",
           "daha", "gibi", "kadar", "sonra", "ama", "var", "en", "ne",
           "o", "ki", "değil", "olan", "her", "iki", "ise", "mi"},
}

# Unicode-script detection for non-Latin scripts: (lo, hi, lang) —
# checked before stopword voting (a CJK/Cyrillic/… text never matches
# Latin stopwords). Hiragana/katakana distinguish ja from zh; hangul
# marks ko. Public Unicode block ranges.
_SCRIPT_RANGES: list[tuple[int, int, str]] = [
    (0x3040, 0x30FF, "ja"),    # hiragana + katakana (checked before Han)
    (0x4E00, 0x9FFF, "zh"),    # CJK unified ideographs
    (0xAC00, 0xD7AF, "ko"),    # hangul syllables
    (0x0400, 0x04FF, "ru"),    # cyrillic
    (0x0600, 0x06FF, "ar"),    # arabic
    (0x0590, 0x05FF, "he"),    # hebrew
    (0x0370, 0x03FF, "el"),    # greek
    (0x0900, 0x097F, "hi"),    # devanagari
    (0x0E00, 0x0E7F, "th"),    # thai
]

_TOKEN = re.compile(r"[A-Za-zÀ-ɏ]+|\d+|[^\sA-Za-z\d]", re.UNICODE)
_WORD = re.compile(r"\w+", re.UNICODE)
_PUNCT = re.compile(r"[^\w\s]", re.UNICODE)


class DocumentAnalyzer:
    """Actor-pool stage: per-document language id, quality metrics, token
    count (BPE-ish regex), rolling-hash fingerprint. Setup in __init__
    (once per actor); ``__call__`` is a per-document loop — inherent to
    tokenization-style analysis (regex findall per text), with the
    numeric reductions vectorized across the batch at the end."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.token = _TOKEN
        self.word = _WORD
        self.punct = _PUNCT
        self.profiles = {k: frozenset(v) for k, v in _LANG_STOPWORDS.items()}

    def _lang_of(self, words: list[str], text: str = "") -> str:
        # non-Latin scripts first: count script hits over a char sample
        sample = text[:400]
        if sample:
            counts: dict[str, int] = {}
            other = 0
            for ch in sample:
                cp = ord(ch)
                if cp < 0x300:
                    continue
                for lo, hi, lang in _SCRIPT_RANGES:
                    if lo <= cp <= hi:
                        counts[lang] = counts.get(lang, 0) + 1
                        break
                else:
                    other += 1
            if counts:
                lang, n = max(counts.items(), key=lambda kv: kv[1])
                # ja texts mix kana + Han: any kana wins over Han
                if "ja" in counts and lang == "zh":
                    lang = "ja"
                if n >= max(3, len(sample) // 20):
                    return lang
        if not words:
            return "und"
        ws = set(words[:200])
        best, score = "und", 0
        for lang, stop in self.profiles.items():
            s = len(ws & stop)
            if s > score:
                best, score = lang, s
        return best

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t.column(self.text_col).to_pylist()
        n = len(texts)
        n_chars = np.zeros(n, np.int64)
        n_tokens = np.zeros(n, np.int64)
        n_words = np.zeros(n, np.int64)
        punct_ratio = np.zeros(n, np.float64)
        stop_ratio = np.zeros(n, np.float64)
        mean_word_len = np.zeros(n, np.float64)
        langs: list[str] = []
        fingerprints = np.zeros(n, np.uint64)
        all_stop = frozenset().union(*self.profiles.values())
        for i, txt in enumerate(texts):
            if not txt:
                langs.append("und")
                continue
            n_chars[i] = len(txt)
            low = txt.lower()
            words = self.word.findall(low)
            n_words[i] = len(words)
            n_tokens[i] = len(self.token.findall(txt))
            n_punct = len(self.punct.findall(txt))
            punct_ratio[i] = n_punct / max(1, len(txt))
            if words:
                stop_ratio[i] = sum(w in all_stop for w in words) / len(words)
                mean_word_len[i] = sum(map(len, words)) / len(words)
            langs.append(self._lang_of(words, txt))
            # rolling-hash fingerprint over the word sequence (order-aware,
            # whitespace-normalization-invariant). crc32 per word, NOT
            # Python hash() — hash() is per-process randomized
            # (PYTHONHASHSEED) and would make fingerprints differ across
            # Ray workers.
            h = 1469598103934665603
            for w in words:
                h = (h * 1099511628211 + zlib.crc32(w.encode())) \
                    & 0xFFFFFFFFFFFFFFFF
            fingerprints[i] = np.uint64(h)
        qual = (
            np.clip(n_words / 100.0, 0, 1) * 0.4
            + np.clip(stop_ratio * 4.0, 0, 1) * 0.3
            + (1.0 - np.clip(punct_ratio * 5.0, 0, 1)) * 0.3
        )
        out = t
        for name, arr in [
            ("n_chars_m", pa.array(n_chars)),
            ("n_tokens", pa.array(n_tokens)),
            ("n_words", pa.array(n_words)),
            ("punct_ratio", pa.array(punct_ratio)),
            ("stopword_ratio", pa.array(stop_ratio)),
            ("mean_word_len", pa.array(mean_word_len)),
            ("lang_pred", pa.array(langs, pa.string())),
            ("fingerprint", pa.array(fingerprints, pa.uint64())),
            ("quality", pa.array(qual)),
        ]:
            out = out.append_column(name, arr)
        return out.replace_schema_metadata(None) if out.schema.metadata else out


def analyze_documents(
    ds: Dataset, text_col: str = "text", concurrency=None, batch_size: int = 1024
) -> Dataset:
    """Fused text-analysis stage as an actor pool (regexes compiled once
    per actor; batch size modest because documents are wide)."""
    from ..util import autoscale_pool

    return ds.map_batches(
        DocumentAnalyzer,
        fn_constructor_kwargs={"text_col": text_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=autoscale_pool() if concurrency is None else concurrency,
    )


# Gopher repetition-filter thresholds (Rae et al. 2021, "Scaling
# Language Models: ... Gopher", appendix A1 — public). A document is
# kept when EVERY signal is at or below its threshold.
GOPHER_THRESHOLDS: dict[str, float] = {
    "dup_line_frac": 0.30,
    "dup_line_char_frac": 0.20,
    "top_2gram_char_frac": 0.20,
    "top_3gram_char_frac": 0.18,
    "top_4gram_char_frac": 0.16,
    "dup_5gram_char_frac": 0.15,
    "dup_6gram_char_frac": 0.14,
    "dup_7gram_char_frac": 0.13,
    "dup_8gram_char_frac": 0.12,
    "dup_9gram_char_frac": 0.11,
    "dup_10gram_char_frac": 0.10,
}


class RepetitionAnalyzer:
    """Actor-pool stage computing the Gopher repetition signals per
    document:

    * ``dup_line_frac`` / ``dup_line_char_frac`` — fraction of lines
      (resp. line characters) that are repeats of an earlier identical
      line (newline-split, stripped, empty lines ignored).
    * ``top_{2,3,4}gram_char_frac`` — fraction of word-characters
      covered by all occurrences of the single most frequent n-gram
      (only when it occurs ≥2×; occurrences may overlap, so the value
      is clipped to 1.0). Ties broken lexicographically for
      determinism.
    * ``dup_{5..10}gram_char_frac`` — fraction of word-characters
      covered by ANY occurrence of an n-gram that occurs ≥2× (each
      character counted once — position-marking, the public
      DataTrove/NeMo-Curator convention).
    * ``gopher_keep`` — all signals within ``GOPHER_THRESHOLDS``.

    All fractions are ratios of exact integer counts, so the float64
    results are bit-deterministic across workers. The per-document loop
    is inherent (n-gram counting per text); the batch assembly is
    columnar. No shuffle, no driver state — embarrassingly parallel at
    any scale."""

    TOP_NS = (2, 3, 4)
    DUP_NS = (5, 6, 7, 8, 9, 10)

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    @staticmethod
    def _doc_signals(text: str) -> dict[str, float]:
        from collections import Counter

        sig = {k: 0.0 for k in GOPHER_THRESHOLDS}
        if text:
            lines = [ln.strip() for ln in text.split("\n")]
            lines = [ln for ln in lines if ln]
            if lines:
                lc = Counter(lines)
                dups = {ln: c for ln, c in lc.items() if c > 1}
                sig["dup_line_frac"] = sum(c - 1 for c in dups.values()) / len(lines)
                tot_lc = sum(len(ln) for ln in lines)
                if tot_lc:
                    sig["dup_line_char_frac"] = sum(
                        (c - 1) * len(ln) for ln, c in dups.items()) / tot_lc
            words = text.split()
            wlen = np.array([len(w) for w in words], np.int64)
            total = int(wlen.sum())
            if total:
                for n in RepetitionAnalyzer.TOP_NS:
                    if len(words) < n:
                        break
                    grams = list(zip(*(words[i:] for i in range(n))))
                    cnt = Counter(grams)
                    c, g = max(((c, g) for g, c in cnt.items()))
                    if c >= 2:
                        sig[f"top_{n}gram_char_frac"] = min(
                            1.0, c * sum(len(w) for w in g) / total)
                for n in RepetitionAnalyzer.DUP_NS:
                    if len(words) < n:
                        break
                    grams = list(zip(*(words[i:] for i in range(n))))
                    cnt = Counter(grams)
                    mask = np.zeros(len(words), bool)
                    for i, g in enumerate(grams):
                        if cnt[g] >= 2:
                            mask[i:i + n] = True
                    sig[f"dup_{n}gram_char_frac"] = int(wlen[mask].sum()) / total
        return sig

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t.column(self.text_col).to_pylist()
        cols: dict[str, list[float]] = {k: [] for k in GOPHER_THRESHOLDS}
        keep: list[bool] = []
        for txt in texts:
            sig = self._doc_signals(txt or "")
            ok = True
            for k, v in sig.items():
                cols[k].append(v)
                if v > GOPHER_THRESHOLDS[k]:
                    ok = False
            keep.append(ok)
        out = t
        for k, vals in cols.items():
            out = out.append_column(k, pa.array(vals, pa.float64()))
        out = out.append_column("gopher_keep", pa.array(keep, pa.bool_()))
        return out.replace_schema_metadata(None) if out.schema.metadata else out


def repetition_signals(
    ds: Dataset, text_col: str = "text", concurrency=None, batch_size: int = 512
) -> Dataset:
    """Gopher repetition signals + keep decision as an actor-pool stage."""
    from ..util import autoscale_pool

    return ds.map_batches(
        RepetitionAnalyzer,
        fn_constructor_kwargs={"text_col": text_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=autoscale_pool() if concurrency is None else concurrency,
    )


def token_count_batch(t: pa.Table, text_col: str = "text") -> pa.Table:
    """Cheap whitespace+regex token count (zero-copy Arrow kernel) —
    the stateless fast path when only counts are needed."""
    counts = pc.count_substring_regex(t.column(text_col), r"\S+")
    counts = pc.cast(pc.fill_null(counts, 0), pa.int64())
    t = t.append_column("n_tokens_ws", counts)
    return t.replace_schema_metadata(None) if t.schema.metadata else t
