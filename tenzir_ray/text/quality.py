"""Text analysis for training-data curation: language id, quality scoring,
token counting, document fingerprinting. One fused, vectorized
``map_batches`` stage (regexes and stopword tables compiled once per actor).
"""

from __future__ import annotations

import re
import zlib

import numpy as np
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


def _pow_mod64(base: int, e: np.ndarray) -> np.ndarray:
    """Vectorized ``base ** e (mod 2**64)`` by binary exponentiation
    (wrapping uint64 arithmetic; ~log2(max e) passes)."""
    result = np.ones(e.size, np.uint64)
    b = int(base) & 0xFFFFFFFFFFFFFFFF  # python-int squaring: no
    ee = e.astype(np.uint64)            # numpy scalar-overflow warnings
    emax = int(e.max()) if e.size else 0
    bit = 0
    while (1 << bit) <= emax:
        sel = ((ee >> np.uint64(bit)) & np.uint64(1)) == 1
        result[sel] *= np.uint64(b)
        b = (b * b) & 0xFFFFFFFFFFFFFFFF
        bit += 1
    return result


class DocumentAnalyzer:
    """Actor-pool stage: per-document language id, quality metrics, token
    count (BPE-ish regex), rolling-hash fingerprint. Setup in __init__
    (once per actor). ``__call__`` runs ONE vectorized pass for ASCII
    documents (Arrow regex counts + split, stopword membership via
    dictionary ``is_in``, and the FNV-1a-style rolling fingerprint
    linearized to ``B·m^k + Σ crc32(w_i)·m^(k-1-i) mod 2^64`` so it
    reduces to a segment sum); non-ASCII documents take the per-doc
    Unicode path (script-range language id needs codepoints anyway)."""

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

    _FNV_BASIS = 1469598103934665603
    _FNV_MULT = 1099511628211

    def _doc_row(self, txt: str) -> tuple:
        """Per-doc fallback (non-ASCII texts): identical metrics via the
        original sequential path."""
        all_stop = self._all_stop
        low = txt.lower()
        words = self.word.findall(low)
        n_tok = len(self.token.findall(txt))
        n_punct = len(self.punct.findall(txt))
        stop = sum(w in all_stop for w in words) / len(words) if words else 0.0
        mwl = sum(map(len, words)) / len(words) if words else 0.0
        # rolling-hash fingerprint over the word sequence (order-aware,
        # whitespace-normalization-invariant). crc32 per word, NOT
        # Python hash() — hash() is per-process randomized
        # (PYTHONHASHSEED) and would make fingerprints differ across
        # Ray workers.
        h = self._FNV_BASIS
        for w in words:
            h = (h * self._FNV_MULT + zlib.crc32(w.encode())) \
                & 0xFFFFFFFFFFFFFFFF
        return (len(txt), n_tok, len(words), n_punct / max(1, len(txt)),
                stop, mwl, self._lang_of(words, txt), h)

    def __call__(self, t: pa.Table) -> pa.Table:
        n = t.num_rows
        col = t.column(self.text_col)
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        col = pc.fill_null(col, "")
        n_chars = pc.utf8_length(col).to_numpy(
            zero_copy_only=False).astype(np.int64) if n else np.zeros(0, np.int64)
        n_tokens = np.zeros(n, np.int64)
        n_words = np.zeros(n, np.int64)
        punct_ratio = np.zeros(n, np.float64)
        stop_ratio = np.zeros(n, np.float64)
        mean_word_len = np.zeros(n, np.float64)
        langs = np.full(n, "und", dtype=object)
        fingerprints = np.zeros(n, np.uint64)
        if not hasattr(self, "_all_stop"):
            self._all_stop = frozenset().union(*self.profiles.values())
            self._lang_names = list(self.profiles)
            self._all_stop_arr = pa.array(sorted(self._all_stop))
            self._lang_arrs = {k: pa.array(sorted(v))
                               for k, v in self.profiles.items()}
        if n:
            byte_len = pc.binary_length(col).to_numpy(
                zero_copy_only=False).astype(np.int64)
            is_ascii = n_chars == byte_len
            # \x0b and \x1c-\x1f: whitespace to Python's \s, not to
            # RE2/Arrow — route those docs through the per-doc path so
            # metrics don't depend on which path a doc takes
            ctl = pc.match_substring_regex(
                col, "[\x0b\x1c-\x1f]").to_numpy(zero_copy_only=False)
            is_ascii = is_ascii & ~ctl.astype(bool)
            vec = is_ascii & (n_chars > 0)  # empty docs keep the zeros/"und"
            if vec.any():
                self._vector_pass(col, np.flatnonzero(vec), n_tokens,
                                  n_words, punct_ratio, stop_ratio,
                                  mean_word_len, langs, fingerprints)
            for i in np.flatnonzero(~is_ascii & (n_chars > 0)):
                (n_chars[i], n_tokens[i], n_words[i], punct_ratio[i],
                 stop_ratio[i], mean_word_len[i], langs[i],
                 fingerprints[i]) = self._doc_row(col[int(i)].as_py())
        qual = (
            np.clip(n_words / 100.0, 0, 1) * 0.4
            + np.clip(stop_ratio * 4.0, 0, 1) * 0.3
            + (1.0 - np.clip(punct_ratio * 5.0, 0, 1)) * 0.3
        )
        return self._assemble(t, n_chars, n_tokens, n_words, punct_ratio,
                              stop_ratio, mean_word_len, langs,
                              fingerprints, qual)

    def _vector_pass(self, col: pa.Array, idx: np.ndarray, n_tokens,
                     n_words, punct_ratio, stop_ratio, mean_word_len,
                     langs, fingerprints) -> None:
        """One Arrow/numpy pass over the non-empty ASCII docs at
        positions ``idx`` — scatters results into the output arrays."""
        sub = col.take(pa.array(idx, pa.int64()))
        D = len(idx)
        chars = pc.utf8_length(sub).to_numpy(
            zero_copy_only=False).astype(np.int64)
        n_tokens[idx] = pc.count_substring_regex(
            sub, self.token.pattern).to_numpy(zero_copy_only=False)
        n_punct = pc.count_substring_regex(
            sub, r"[^\w\s]").to_numpy(zero_copy_only=False)
        punct_ratio[idx] = n_punct / np.maximum(1, chars)
        # words of ALL docs in one split (== \w+ findall on lowered
        # ASCII), with per-doc segments
        la = pc.split_pattern_regex(pc.utf8_lower(sub),
                                    pattern="[^a-z0-9_]+")
        per = pc.list_value_length(la).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(la)
        doc = np.repeat(np.arange(D, dtype=np.int64), per)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat, doc = flat.filter(pa.array(keep)), doc[keep]
        counts = np.bincount(doc, minlength=D).astype(np.int64)
        n_words[idx] = counts
        wlen = pc.utf8_length(flat).to_numpy(
            zero_copy_only=False).astype(np.int64)
        nz = counts > 0
        safe = np.maximum(1, counts)
        mwl = np.bincount(doc, weights=wlen, minlength=D) / safe
        mean_word_len[idx[nz]] = mwl[nz]
        acc = np.zeros(D, np.uint64)
        if len(flat):
            enc = pc.dictionary_encode(
                flat.combine_chunks() if isinstance(flat, pa.ChunkedArray)
                else flat)
            vocab = enc.dictionary
            codes = enc.indices.to_numpy(
                zero_copy_only=False).astype(np.int64)
            # stopword ratio: every occurrence counts
            all_mask = pc.is_in(vocab, value_set=self._all_stop_arr) \
                .to_numpy(zero_copy_only=False)
            stop_ratio[idx[nz]] = (np.bincount(
                doc, weights=all_mask[codes], minlength=D) / safe)[nz]
            # language vote: DISTINCT words among the first 200 per doc,
            # argmax over profiles in dict order (strict >, ties earlier)
            pos = np.arange(doc.size) - np.repeat(
                np.r_[0, np.cumsum(counts[:-1])], counts)
            head = pos < 200
            pairs = np.unique(
                doc[head] * np.int64(len(vocab)) + codes[head])
            pdoc, pcode = pairs // len(vocab), pairs % len(vocab)
            scores = np.zeros((len(self._lang_names), D), np.int64)
            for li, lang in enumerate(self._lang_names):
                m = pc.is_in(vocab, value_set=self._lang_arrs[lang]) \
                    .to_numpy(zero_copy_only=False)
                scores[li] = np.bincount(
                    pdoc, weights=m[pcode], minlength=D)
            best = np.argmax(scores, axis=0)  # first max == dict order
            hit = scores[best, np.arange(D)] > 0
            lang_arr = np.array(self._lang_names, object)[best]
            langs[idx[hit]] = lang_arr[hit]
            # rolling fingerprint, linearized: B·m^k + Σ crc·m^(k-1-pos)
            crc = np.fromiter(
                (zlib.crc32(w.encode()) for w in vocab.to_pylist()),
                np.uint64, count=len(vocab))
            weights = _pow_mod64(self._FNV_MULT, counts[doc] - 1 - pos)
            term = crc[codes] * weights  # wrapping uint64
            starts_nz = np.r_[0, np.cumsum(counts[:-1])][nz]
            acc[nz] = np.add.reduceat(term, starts_nz)
        fingerprints[idx] = (np.uint64(self._FNV_BASIS)
                             * _pow_mod64(self._FNV_MULT, counts)) + acc

    @staticmethod
    def _assemble(t, n_chars, n_tokens, n_words, punct_ratio, stop_ratio,
                  mean_word_len, langs, fingerprints, qual) -> pa.Table:
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
    results are bit-deterministic across workers. The whole batch is
    processed in one vectorized pass: words/lines are identified
    EXACTLY via ``dictionary_encode`` (no hash collisions), n-gram
    identity via a chained int64 pairing over the code sequence, and
    per-document aggregation via segment ops (``bincount`` /
    ``reduceat``) — no per-document Python. Word/line splitting uses
    Arrow's Unicode-whitespace kernels, which agree with Python
    ``str.split()`` / ``str.strip()`` everywhere except the exotic
    U+001C..1F separators (Python-only whitespace). No shuffle, no
    driver state — embarrassingly parallel at any scale."""

    TOP_NS = (2, 3, 4)
    DUP_NS = (5, 6, 7, 8, 9, 10)

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    @staticmethod
    def _line_signals(col: pa.Array, n_docs: int) -> tuple[np.ndarray, np.ndarray]:
        """(dup_line_frac, dup_line_char_frac) per doc: split on literal
        newline, strip, drop empties, exact-count repeats per doc."""
        la = pc.split_pattern(col, pattern="\n")
        per_doc = pc.list_value_length(la).to_numpy(zero_copy_only=False)
        flat = pc.utf8_trim_whitespace(pc.list_flatten(la))
        ldoc = np.repeat(np.arange(n_docs, dtype=np.int64),
                         per_doc.astype(np.int64))
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat, ldoc = flat.filter(pa.array(keep)), ldoc[keep]
        dup_frac = np.zeros(n_docs)
        dup_char = np.zeros(n_docs)
        if len(flat) == 0:
            return dup_frac, dup_char
        llen = pc.utf8_length(flat).to_numpy(
            zero_copy_only=False).astype(np.int64)
        enc = flat.combine_chunks() if isinstance(flat, pa.ChunkedArray) else flat
        code = pc.dictionary_encode(enc).indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        key = (ldoc << 32) | code  # codes < 2^32 by construction
        order = np.argsort(key, kind="stable")
        sk = key[order]
        starts = np.flatnonzero(np.r_[True, sk[1:] != sk[:-1]])
        counts = np.diff(np.r_[starts, len(sk)])
        gdoc = ldoc[order][starts]
        glen = llen[order][starts]
        extra = np.maximum(counts - 1, 0).astype(np.float64)
        n_lines = np.bincount(ldoc, minlength=n_docs).astype(np.float64)
        tot_lc = np.bincount(ldoc, weights=llen, minlength=n_docs)
        num = np.bincount(gdoc, weights=extra, minlength=n_docs)
        cnum = np.bincount(gdoc, weights=extra * glen, minlength=n_docs)
        nz = n_lines > 0
        dup_frac[nz] = num[nz] / n_lines[nz]
        cz = tot_lc > 0
        dup_char[cz] = cnum[cz] / tot_lc[cz]
        return dup_frac, dup_char

    def __call__(self, t: pa.Table) -> pa.Table:
        n_docs = t.num_rows
        sig: dict[str, np.ndarray] = {}
        col = t.column(self.text_col)
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        col = pc.fill_null(col, "")
        sig["dup_line_frac"], sig["dup_line_char_frac"] = (
            self._line_signals(col, n_docs) if n_docs else
            (np.zeros(0), np.zeros(0)))

        # ---- word stream: exact codes + lexicographic ranks -----------
        wa = pc.utf8_split_whitespace(col)
        per_doc = pc.list_value_length(wa).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(wa)
        wdoc = np.repeat(np.arange(n_docs, dtype=np.int64), per_doc)
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(nonempty))  # edge empties, like .split()
        wdoc = wdoc[nonempty]
        W = len(flat)
        wcount = np.bincount(wdoc, minlength=n_docs).astype(np.int64)
        wlen = (pc.utf8_length(flat).to_numpy(zero_copy_only=False)
                .astype(np.int64) if W else np.zeros(0, np.int64))
        total = np.bincount(wdoc, weights=wlen, minlength=n_docs)
        for n in (*self.TOP_NS, *self.DUP_NS):
            sig_name = (f"top_{n}gram_char_frac" if n in self.TOP_NS
                        else f"dup_{n}gram_char_frac")
            sig[sig_name] = np.zeros(n_docs)
        if W:
            enc = pc.dictionary_encode(
                flat.combine_chunks() if isinstance(flat, pa.ChunkedArray)
                else flat)
            code = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            vocab = len(enc.dictionary)
            # rank[c] = position of word c in byte-wise (== code-point)
            # sorted vocab order — exact tuple-lexicographic tie-breaks
            sidx = pc.sort_indices(enc.dictionary).to_numpy(
                zero_copy_only=False)
            rank = np.empty(vocab, np.int64)
            rank[sidx] = np.arange(vocab)
            cw = np.r_[0, np.cumsum(wlen)]  # char-prefix; windows never
            doc_start = np.r_[0, np.cumsum(wcount)]  # cross doc bounds
            pos = np.arange(W) - np.repeat(doc_start[:-1], wcount)
            room = wcount[wdoc] - pos  # words available from here on
            gram = code.copy()  # n=1 gram id per position
            for n in range(2, self.DUP_NS[-1] + 1):
                # chained exact pairing: id covers words [i, i+n)
                upto = W - n + 1
                if upto <= 0:
                    break
                packed = gram[:upto] * vocab + code[n - 1:]
                _, gram = np.unique(packed, return_inverse=True)
                valid = np.flatnonzero(room[:upto] >= n)
                if valid.size == 0:
                    continue
                key = wdoc[valid] * np.int64(upto + 1) + gram[valid]
                order = np.argsort(key, kind="stable")
                sk = key[order]
                starts = np.flatnonzero(np.r_[True, sk[1:] != sk[:-1]])
                counts = np.diff(np.r_[starts, valid.size])
                cnt = np.empty(valid.size, np.int64)
                cnt[order] = np.repeat(counts, counts)
                vdoc = wdoc[valid]
                seg = np.flatnonzero(np.r_[True, vdoc[1:] != vdoc[:-1]])
                if n in self.TOP_NS:
                    maxc = np.maximum.reduceat(cnt, seg)
                    maxc_pos = np.repeat(maxc, np.diff(np.r_[seg, valid.size]))
                    cand = np.flatnonzero((cnt == maxc_pos) & (maxc_pos >= 2))
                    if cand.size:
                        p = valid[cand]
                        # lexicographically largest tied gram per doc:
                        # np.lexsort, primary key last
                        keys = tuple(rank[code[p + k]]
                                     for k in range(n - 1, -1, -1))
                        o2 = np.lexsort((*keys, vdoc[cand]))
                        sdoc = vdoc[cand][o2]
                        last = np.flatnonzero(
                            np.r_[sdoc[1:] != sdoc[:-1], True])
                        win = p[o2][last]
                        d = sdoc[last]
                        charlen = cw[win + n] - cw[win]
                        sig[f"top_{n}gram_char_frac"][d] = np.minimum(
                            1.0, cnt[cand][o2][last] * charlen / total[d])
                else:
                    dup = valid[cnt >= 2]
                    if dup.size:
                        delta = np.zeros(W + 1, np.int64)
                        np.add.at(delta, dup, 1)
                        np.add.at(delta, dup + n, -1)
                        cov = np.cumsum(delta)[:W] > 0
                        covered = np.bincount(
                            wdoc, weights=wlen * cov, minlength=n_docs)
                        nz = total > 0
                        sig[f"dup_{n}gram_char_frac"][nz] = (
                            covered[nz] / total[nz])

        keep = np.ones(n_docs, bool)
        out = t
        for k in GOPHER_THRESHOLDS:
            keep &= sig[k] <= GOPHER_THRESHOLDS[k]
            out = out.append_column(k, pa.array(sig[k], pa.float64()))
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
