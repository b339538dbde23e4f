"""Sequential reference implementations for verification.

Single-threaded, row-at-a-time (or per-doc-loop) re-implementations of
the distributed text-dedup pipelines, sharing only the leaf hash
primitives with the engine. The distributed result must equal these
byte-for-byte — any partitioning, shuffle-ordering, or dedup-resolution
bug in the Ray path shows up as a mismatch. Used by the driver-oracle
precomputed-expected tables (``__ray_entry__``) and by pytest.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from tenzir_ray.text.dedup import (
    _MERSENNE,
    _perm_params,
    _POS_MULT,
    _shingle_hashes,
)


def simhash_seq(doc_ids: list, texts: list, ngram: int = 2) -> pa.Table:
    """Sequential SimHash dedup: per-doc 64-bit sign-sum fingerprint,
    keep the min doc_id per fingerprint. Plain-Python bit counting — no
    numpy packbits trick shared with the engine kernel."""
    best: dict[int, int] = {}
    for i, txt in zip(doc_ids, texts):
        if txt is None:
            continue
        sh = _shingle_hashes(txt, ngram)
        counts = [0] * 64
        for h in sh.tolist():
            for b in range(64):
                if (h >> b) & 1:
                    counts[b] += 1
        n = len(sh)
        sim = 0
        for b in range(64):
            # +1 per set bit, -1 per clear bit; strictly positive → 1
            if 2 * counts[b] - n > 0:
                sim |= 1 << b
        if sim not in best or i < best[sim]:
            best[sim] = i
    out = sorted((v, k) for k, v in best.items())
    return pa.table({
        "doc_id": pa.array([d for d, _ in out], pa.int64()),
        "simhash": pa.array([s for _, s in out], pa.uint64()),
    })


def _simhash_one(txt: str | None, ngram: int) -> int:
    """One doc's 64-bit SimHash, plain-Python bit counting (None → 0,
    matching the engine's simhash_batch zero-signature for null text)."""
    if txt is None:
        return 0
    sh = _shingle_hashes(txt, ngram)
    counts = [0] * 64
    for h in sh.tolist():
        for b in range(64):
            if (h >> b) & 1:
                counts[b] += 1
    n = len(sh)
    sim = 0
    for b in range(64):
        if 2 * counts[b] - n > 0:
            sim |= 1 << b
    return sim


def simhash_near_seq(doc_ids: list, texts: list, k: int = 3,
                     ngram: int = 2) -> pa.Table:
    """Sequential banded-Hamming oracle: survivors of the
    drop-iff-any-lower-id-within-distance-k rule, via the plain O(n²)
    pairwise popcount (banding is pigeonhole-exact, so the band-free
    quadratic rule is the same set)."""
    order = sorted(range(len(doc_ids)), key=lambda i: doc_ids[i])
    sigs = [(doc_ids[i], _simhash_one(texts[i], ngram)) for i in order]
    keep: list[int] = []
    for idx, (i, s) in enumerate(sigs):
        # rule: drop i iff ANY lower-id doc (kept or dropped) is within k
        if not any(bin(s ^ s2).count("1") <= k for _j, s2 in sigs[:idx]):
            keep.append(i)
    return pa.table({"doc_id": pa.array(sorted(keep), pa.int64())})


def minhash_dedup_seq(
    doc_ids: list, texts: list,
    num_perm: int = 64, bands: int = 16, ngram: int = 3,
    verify_threshold: float | None = None,
) -> list[int]:
    """Sequential MinHash-LSH dedup: per-doc signature (one doc at a
    time), band buckets in a plain dict, min-label resolution, survivors
    = docs equal to their own representative. With ``verify_threshold``,
    a candidate is only dropped when its exact n-gram Jaccard similarity
    to its representative reaches the threshold (set-arithmetic here,
    independent of the engine's remote-task verifier). Returns surviving
    ids."""
    a, b = _perm_params(num_perm)
    r = num_perm // bands
    buckets: dict[tuple, list] = {}
    all_ids: list[int] = []
    for i, txt in zip(doc_ids, texts):
        if txt is None:
            all_ids.append(i)
            continue
        all_ids.append(i)
        sh = _shingle_hashes(txt, ngram)
        v = (a[:, None] * sh[None, :] + b[:, None]) % _MERSENNE
        sig = v.min(axis=1)
        for band in range(bands):
            seg = sig[band * r:(band + 1) * r].astype(np.uint64)
            acc = np.bitwise_xor.reduce(seg * _POS_MULT[:r])
            key = (band, int(np.array([acc], np.uint64).view(np.int64)[0]))
            buckets.setdefault(key, []).append(i)
    rep: dict[int, int] = {}
    for docs in buckets.values():
        if len(docs) < 2:
            continue
        m = min(docs)
        for d in docs:
            rep[d] = min(rep.get(d, d), m)
    if verify_threshold is None:
        return [i for i in all_ids if rep.get(i, i) == i]
    txt = dict(zip(doc_ids, texts))

    def jac(x: str, y: str) -> float:
        # shingle-hash Jaccard (matches the engine's vectorized
        # verifier; == n-gram Jaccard up to 64-bit collisions; empty
        # docs are the {0} sentinel, so empty-vs-empty scores 1.0)
        hx, hy = _shingle_hashes(x, ngram), _shingle_hashes(y, ngram)
        inter = np.intersect1d(hx, hy, assume_unique=True).size
        return inter / max(1, hx.size + hy.size - inter)

    return [
        i for i in all_ids
        if rep.get(i, i) == i
        or jac(txt.get(i) or "", txt.get(rep[i]) or "") < verify_threshold
    ]


def incremental_minhash_dedup_seq(
    doc_ids: list, texts: list, epochs: list,
    num_perm: int = 64, bands: int = 16, ngram: int = 3,
    seed: int = 1337,
) -> list[tuple[int, int]]:
    """Sequential oracle for
    :func:`tenzir_ray.text.incremental.incremental_minhash_dedup`:
    epochs processed in order with a plain-dict signature store. A doc
    is dropped iff it shares a fused (band, band_key) bucket with a
    PRIOR-epoch survivor, or the min doc id over its within-epoch
    buckets is smaller than itself; only survivors' keys enter the
    store. Returns [(epoch, doc_id), ...] of survivors."""
    a, b = _perm_params(num_perm, seed)
    r = num_perm // bands
    fuse = np.uint64(0x9E3779B97F4A7C15)

    def keys_of(txt):
        if txt is None:
            return []
        sh = _shingle_hashes(txt, ngram)
        v = (a[:, None] * sh[None, :] + b[:, None]) % _MERSENNE
        sig = v.min(axis=1)
        out = []
        for band in range(bands):
            seg = sig[band * r:(band + 1) * r].astype(np.uint64)
            acc = np.bitwise_xor.reduce(seg * _POS_MULT[:r])
            fused = np.array([acc ^ (np.uint64(band) * fuse)],
                             np.uint64).view(np.int64)
            out.append(int(fused[0]))
        return out

    by_epoch: dict[int, list] = {}
    for i, txt, e in zip(doc_ids, texts, epochs):
        by_epoch.setdefault(int(e), []).append((int(i), txt))
    store: set[int] = set()
    survivors: list[tuple[int, int]] = []
    for e in sorted(by_epoch):
        keys = {i: keys_of(txt) for i, txt in by_epoch[e]}
        bmin: dict[int, int] = {}
        for i, ks in keys.items():
            for k in ks:
                bmin[k] = min(bmin.get(k, i), i)
        ep_surv = [
            i for i, ks in keys.items()
            if not any(k in store for k in ks)
            and not any(bmin[k] < i for k in ks)
        ]
        for i in sorted(ep_surv):
            survivors.append((e, i))
            store.update(keys[i])
    return survivors


def kmeans_assign_seq(
    doc_ids: list, vectors: "np.ndarray",
    n_lists: int = 8, iters: int = 5, seed: int = 11,
) -> pa.Table:
    """Sequential k-means clustering: deterministic kmeans_cosine over
    the id-sorted corpus, then one-vector-at-a-time argmax assignment.
    Verifies the distributed ivf_build assign pass as a first-class
    clustering op."""
    from tenzir_ray.text.ann import _normalize, kmeans_cosine

    order = np.argsort(np.asarray(doc_ids))
    ids_sorted = [doc_ids[i] for i in order]
    m = _normalize(np.asarray(vectors, dtype=np.float32))[order]
    cents = kmeans_cosine(m, n_lists, iters, seed)
    clusters = []
    for i in range(len(m)):  # one vector at a time
        clusters.append(int(np.argmax(cents @ m[i])))
    return pa.table({
        "vec_id": pa.array(ids_sorted, pa.int64()),
        "cluster": pa.array(clusters, pa.int32()),
    })


def ivf_ann_seq(
    doc_ids: list, vectors: "np.ndarray", queries: "np.ndarray",
    n_lists: int = 8, k: int = 5, n_probe: int = 4,
    iters: int = 5, seed: int = 11,
) -> pa.Table:
    """Sequential IVF ANN: same deterministic k-means (shared
    kmeans_cosine over the id-sorted sample = the full id-sorted corpus
    at verification scale), then one-vector-at-a-time assignment and a
    per-query linear scan over probed lists with an explicit candidate
    sort. Verifies the distributed assign + partition-pruned search."""
    from tenzir_ray.text.ann import _normalize, kmeans_cosine

    order = np.argsort(np.asarray(doc_ids))
    ids_sorted = [doc_ids[i] for i in order]
    m = _normalize(np.asarray(vectors, dtype=np.float32))[order]
    cents = kmeans_cosine(m, n_lists, iters, seed)
    lists = []
    for i in range(len(m)):  # one vector at a time
        lists.append(int(np.argmax(cents @ m[i])))
    qn = _normalize(np.asarray(queries, dtype=np.float32))
    out_q, out_id, out_cos = [], [], []
    for qi in range(len(qn)):
        probed = set(np.argsort(-(cents @ qn[qi]))[:n_probe].tolist())
        cands = []
        for i in range(len(m)):
            if lists[i] in probed:
                cands.append((float(m[i] @ qn[qi]), ids_sorted[i]))
        cands.sort(key=lambda p: (-p[0], p[1]))
        for cos, did in cands[:k]:
            out_q.append(qi)
            out_id.append(did)
            out_cos.append(cos)
    return pa.table({
        "query": pa.array(out_q, pa.int32()),
        "vec_id": pa.array(out_id, pa.int64()),
        "cosine": pa.array(out_cos, pa.float64()),
    })


def bpe_seq(doc_ids: list, texts: list, num_merges: int = 64,
            lowercase: bool = True) -> pa.Table:
    """Sequential BPE reference: word counts in one pass, the Sennrich
    merge loop, then per-doc greedy tokenization - all plain Python,
    independent of the distributed implementation (which must match it
    exactly: word-count partials, broadcast merge table, per-actor
    caches all under test). Tie-break: max count, then lexicographic."""
    import re as _re

    word_re = _re.compile(r"\w+|[^\w\s]", _re.UNICODE)
    eow = "\u0001"

    counts: dict[str, int] = {}
    for txt in texts:
        if not txt:
            continue
        if lowercase:
            txt = txt.lower()
        for w in word_re.findall(txt):
            counts[w] = counts.get(w, 0) + 1

    words: dict[tuple, int] = {}
    for w, n in counts.items():
        sym = tuple(w) + (eow,)
        words[sym] = words.get(sym, 0) + n
    merges = []
    for _ in range(num_merges):
        pairs: dict[tuple, int] = {}
        for sym, n in words.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] = \
                    pairs.get((sym[i], sym[i + 1]), 0) + n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break
        merges.append(best)
        nw: dict[tuple, int] = {}
        for sym, n in words.items():
            out, i = [], 0
            while i < len(sym):
                if i < len(sym) - 1 and (sym[i], sym[i + 1]) == best:
                    out.append(sym[i] + sym[i + 1])
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            nw[tuple(out)] = nw.get(tuple(out), 0) + n
        words = nw

    ranks = {m: i for i, m in enumerate(merges)}

    def count_word(w: str) -> int:
        sym = list(w) + [eow]
        while len(sym) > 1:
            br, bi = None, None
            for i in range(len(sym) - 1):
                r = ranks.get((sym[i], sym[i + 1]))
                if r is not None and (br is None or r < br):
                    br, bi = r, i
            if bi is None:
                break
            sym[bi:bi + 2] = [sym[bi] + sym[bi + 1]]
        return len([s for s in sym if s != eow])

    out = []
    for txt in texts:
        if not txt:
            out.append(0)
            continue
        t = txt.lower() if lowercase else txt
        out.append(sum(count_word(w) for w in word_re.findall(t)))
    order = sorted(range(len(doc_ids)), key=lambda i: doc_ids[i])
    return pa.table({
        "doc_id": pa.array([doc_ids[i] for i in order], pa.int64()),
        "bpe_n_tokens": pa.array([out[i] for i in order], pa.int64()),
    })


def gopher_seq(doc_ids: list, texts: list) -> pa.Table:
    """Sequential Gopher repetition signals (quality.RepetitionAnalyzer
    semantics), pure-Python dict/list implementation — no numpy masking,
    no Counter-free-ride on the engine code. Same integer-ratio
    definitions, so floats must match bit-for-bit."""
    from tenzir_ray.text.quality import GOPHER_THRESHOLDS

    names = list(GOPHER_THRESHOLDS)
    rows: list[dict] = []
    for did, txt in zip(doc_ids, texts):
        sig = dict.fromkeys(names, 0.0)
        txt = txt or ""
        lines = [s for s in (ln.strip() for ln in txt.split("\n")) if s]
        if lines:
            seen: dict[str, int] = {}
            for ln in lines:
                seen[ln] = seen.get(ln, 0) + 1
            rep = sum(c - 1 for c in seen.values() if c > 1)
            sig["dup_line_frac"] = rep / len(lines)
            tot = sum(len(ln) for ln in lines)
            if tot:
                sig["dup_line_char_frac"] = sum(
                    (c - 1) * len(ln) for ln, c in seen.items() if c > 1) / tot
        words = txt.split()
        total = sum(len(w) for w in words)
        if total:
            for n in (2, 3, 4):
                if len(words) < n:
                    break
                cnt: dict[tuple, int] = {}
                for i in range(len(words) - n + 1):
                    g = tuple(words[i:i + n])
                    cnt[g] = cnt.get(g, 0) + 1
                best = max((c, g) for g, c in cnt.items())
                if best[0] >= 2:
                    frac = best[0] * sum(len(w) for w in best[1]) / total
                    sig[f"top_{n}gram_char_frac"] = frac if frac < 1.0 else 1.0
            for n in (5, 6, 7, 8, 9, 10):
                if len(words) < n:
                    break
                cnt = {}
                for i in range(len(words) - n + 1):
                    g = tuple(words[i:i + n])
                    cnt[g] = cnt.get(g, 0) + 1
                covered: set[int] = set()
                for i in range(len(words) - n + 1):
                    if cnt[tuple(words[i:i + n])] >= 2:
                        covered.update(range(i, i + n))
                sig[f"dup_{n}gram_char_frac"] = (
                    sum(len(words[j]) for j in covered) / total)
        row = {"doc_id": did, **sig}
        row["gopher_keep"] = all(sig[k] <= GOPHER_THRESHOLDS[k] for k in names)
        rows.append(row)
    rows.sort(key=lambda r: r["doc_id"])
    cols: dict[str, list] = {"doc_id": [r["doc_id"] for r in rows]}
    for k in names:
        cols[k] = [r[k] for r in rows]
    cols["gopher_keep"] = [r["gopher_keep"] for r in rows]
    schema = [("doc_id", pa.int64())] + [(k, pa.float64()) for k in names] \
        + [("gopher_keep", pa.bool_())]
    return pa.table({k: pa.array(v, t) for (k, t), v in
                     zip(schema, cols.values())})


def semdedup_seq(
    doc_ids: list, vectors: "np.ndarray", n_clusters: int = 8,
    threshold: float = 0.95, iters: int = 5, seed: int = 11,
) -> pa.Table:
    """Sequential SemDeDup: same deterministic kmeans_cosine (over the
    id-sorted corpus = the distributed sample at verification scale),
    then one-vector-at-a-time assignment and a per-cluster
    one-pair-at-a-time prune in (centroid-sim asc, id asc) order —
    keeps the paper's low-centroid-similarity "edge" examples."""
    from tenzir_ray.text.ann import _normalize, kmeans_cosine

    order = np.argsort(np.asarray(doc_ids))
    ids_sorted = [doc_ids[i] for i in order]
    m = _normalize(np.asarray(vectors, dtype=np.float32))[order]
    cents = kmeans_cosine(m, n_clusters, iters, seed)
    assign = []
    for i in range(len(m)):  # one vector at a time
        assign.append(int(np.argmax(cents @ m[i])))
    out_id, out_cl = [], []
    for cl in range(n_clusters):
        members = [i for i in range(len(m)) if assign[i] == cl]
        # (centroid-sim asc, id asc); float64 sort key to match the
        # distributed prune's rounding-hardened ordering
        members.sort(key=lambda i: (
            float(m[i].astype(np.float64) @ cents[cl].astype(np.float64)),
            ids_sorted[i]))
        # drop i iff ANY earlier-ordered member is >= threshold similar
        # (same deterministic rule as the distributed kernel and
        # embedding_dedup; differs from greedy keep-survivors only on
        # similarity chains)
        for pos, i in enumerate(members):
            dup = False
            for j in members[:pos]:  # one pair at a time
                if float(m[i] @ m[j]) >= threshold:
                    dup = True
                    break
            if not dup:
                out_id.append(ids_sorted[i])
                out_cl.append(cl)
    return pa.table({
        "vec_id": pa.array(out_id, pa.int64()),
        "sem_cluster": pa.array(out_cl, pa.int32()),
    })


def dsir_seq(doc_ids: list, texts: list, target_texts: list, k: int,
             num_buckets: int = 4096, gumbel_seed: int | None = 1234
             ) -> pa.Table:
    """Sequential DSIR (Xie et al. 2023): per-doc Python loop over
    hashed unigram+bigram buckets, dict-accumulated models, top-k by
    score + deterministic Gumbel. Shares only the leaf hash primitives
    (``pd.util.hash_array``, splitmix64 Gumbel) with the engine —
    tokenization, counting, model fit and selection are re-derived
    one document at a time."""
    import re

    from tenzir_ray.text.dsir import _BIGRAM_MULT, _gumbel_of_ids

    b = num_buckets
    # uint64 modulus: np.uint64 % python-int promotes to float64 under
    # numpy 1.x and destroys the bucket — keep everything uint64
    bu = np.uint64(num_buckets)

    def grams(txt: str | None) -> list[int]:
        # engine lowercases with Arrow utf8_lower (simple case mapping);
        # Python str.lower() diverges on special casing (U+0130) -- use
        # the same primitive so gram multisets match exactly
        low = pc.utf8_lower(pa.array([txt or ""]))[0].as_py()
        words = [w for w in re.split(r"[^a-z0-9']+", low) if w]
        if not words:
            return []
        h = pd.util.hash_array(
            np.array(words, dtype=object)).astype(np.uint64)
        out = [int(x % bu) for x in h]
        with np.errstate(over="ignore"):
            for i in range(len(h) - 1):
                out.append(int(((h[i] * _BIGRAM_MULT) ^ h[i + 1]) % bu))
        return out

    raw_grams = [grams(t) for t in texts]

    def model(gram_lists) -> np.ndarray:
        counts: dict[int, int] = {}
        for gl in gram_lists:
            for g in gl:
                counts[g] = counts.get(g, 0) + 1
        vec = np.zeros(b, np.int64)
        for g, c in counts.items():
            vec[g] = c
        return np.log((vec + 1.0) / (vec.sum() + b))

    lr = model(grams(t) for t in target_texts) - model(raw_grams)
    keyed = []
    for i, (d, gl) in enumerate(zip(doc_ids, raw_grams)):
        s = np.float64(0.0)
        for g in gl:
            s = s + lr[g]
        key = float(s)
        if gumbel_seed is not None:
            key = float(s + _gumbel_of_ids(
                np.array([d], np.int64), gumbel_seed)[0])
        keyed.append((key, d, float(s)))
    keyed.sort(key=lambda x: -x[0])
    top = sorted(keyed[:k], key=lambda x: x[1])
    return pa.table({
        "doc_id": pa.array([d for _, d, _ in top], pa.int64()),
        "dsir_score": pa.array([s for _, _, s in top], pa.float64())})


def c4_seq(doc_ids: list, texts: list, *, min_words: int = 5,
           min_sentences: int = 3, badwords: tuple = (),
           span_dedup: bool = True) -> pa.Table:
    """Sequential C4 cleaning (Raffel et al. 2020 §2.2): per-doc Python
    loops over the same line/page/span rules as the engine (terminal
    punctuation, min words, javascript, brace / lorem-ipsum / blocklist
    pages, global 3-sentence-span dedup keeping the first occurrence).
    Shares only the leaf sentence-hash primitive."""
    import re

    from tenzir_ray.text.c4 import _SPAN_A, _SPAN_B

    # the engine's kernels are RE2/Arrow: \s is ASCII-only and
    # lowercasing is Arrow utf8_lower (simple Unicode case mapping, no
    # special casing) -- pin the SAME semantics here so the comparison
    # is exact on non-ASCII text (NBSP, Turkish dotted I)
    _ws = "[ \\t\\n\\r\\f\\v]"
    _nws = "[^ \\t\\n\\r\\f\\v]"

    def _low(s):
        return pc.utf8_lower(pa.array([s]))[0].as_py()

    cleaned: list[tuple] = []
    for d, txt in zip(doc_ids, texts):
        lines = (txt or "").split("\n")
        keep = []
        for ln in lines:
            if not re.search(r"[.!?\"']$", ln):
                continue
            if len(re.findall(_nws + "+", ln)) < min_words:
                continue
            if "javascript" in _low(ln):
                continue
            keep.append(ln)
        page = "\n".join(keep)
        low = _low(page)
        n_sent = len(re.findall("[.!?]" + _ws, page)) + \
            (1 if re.search(r"[.!?]$", page) else 0)
        if n_sent < min_sentences or "{" in page or "lorem ipsum" in low:
            continue
        if any(w in low for w in badwords):
            continue
        cleaned.append((d, page))

    if not span_dedup:
        return pa.table({
            "doc_id": pa.array([d for d, _ in cleaned], pa.int64()),
            "text": pa.array([t for _, t in cleaned], pa.string())})

    def sents(page: str) -> list[str]:
        return re.sub("([.!?])" + _ws + "+", "\\1\x1e", page).split("\x1e")

    seen: set[int] = set()
    drops: dict[int, list[int]] = {}
    for d, page in cleaned:
        ss = sents(page)
        h = pd.util.hash_array(
            np.array(ss, dtype=object)).astype(np.uint64)
        with np.errstate(over="ignore"):
            for i in range(len(ss) - 2):
                tri = int((h[i] * _SPAN_A) ^ (h[i + 1] * _SPAN_B)
                          ^ h[i + 2])
                if tri in seen:
                    drops.setdefault(d, []).append(i)
                else:
                    seen.add(tri)

    out_d, out_t = [], []
    for d, page in cleaned:
        if d not in drops:
            out_d.append(d)
            out_t.append(page)
            continue
        ss = sents(page)
        dead = [False] * len(ss)
        for i in drops[d]:
            for j in range(i, min(i + 3, len(ss))):
                dead[j] = True
        out_d.append(d)
        out_t.append(" ".join(s for s, x in zip(ss, dead) if not x))
    return pa.table({"doc_id": pa.array(out_d, pa.int64()),
                     "text": pa.array(out_t, pa.string())})


def normalize_seq(doc_ids: list, texts: list, *,
                  collapse_ws: bool = False) -> pa.Table:
    """Sequential text normalization: one document at a time through
    the scalar rule chain (:func:`tenzir_ray.text.normalize
    .normalize_text` — shared by design: the rules ARE the per-doc
    spec; what this oracle verifies is the distributed kernel's
    vectorized fast path and its ASCII/marker routing, where the bugs
    would live)."""
    from tenzir_ray.text.normalize import normalize_text

    return pa.table({
        "doc_id": pa.array(list(doc_ids), pa.int64()),
        "text": pa.array(
            [normalize_text(t, collapse_ws=collapse_ws) for t in texts],
            pa.string())})


def incremental_exact_dedup_seq(
    doc_ids: list, texts: list, epochs: list,
) -> list[tuple[int, int]]:
    """Sequential oracle for
    :func:`tenzir_ray.text.incremental.incremental_exact_dedup`:
    epochs processed in order with a plain-set hash store; within an
    epoch, ascending doc id order (min id per content hash wins). A doc
    is dropped iff its hash is in the store or already seen this epoch;
    only survivors' hashes enter the store. Returns [(epoch, doc_id)]
    of survivors. Shares only the leaf content hash
    (``pd.util.hash_array``)."""
    by_epoch: dict[int, list] = {}
    for i, txt, e in zip(doc_ids, texts, epochs):
        by_epoch.setdefault(int(e), []).append((int(i), txt))
    store: set[int] = set()
    out: list[tuple[int, int]] = []
    for e in sorted(by_epoch):
        rows = sorted(by_epoch[e])
        hashes = pd.util.hash_array(
            np.array([t for _, t in rows], dtype=object)).view(np.int64)
        seen: set[int] = set()
        epoch_surv: set[int] = set()
        for (i, _), h in zip(rows, hashes.tolist()):
            if h in store or h in seen:
                continue
            seen.add(h)
            epoch_surv.add(h)
            out.append((e, i))
        store |= epoch_surv
    return out


def html_to_text_seq(doc_ids: list, htmls: list) -> pa.Table:
    """Sequential oracle for :func:`tenzir_ray.text.html.html_extract`:
    one document at a time through the per-doc rule chain
    (``html_to_text`` — Python ``re``; the distributed path runs the
    same spec as Arrow-RE2 column kernels, so any kernel/fallback
    divergence shows up as a byte mismatch)."""
    from tenzir_ray.text.html import html_to_text

    return pa.table({
        "doc_id": pa.array([int(i) for i in doc_ids], pa.int64()),
        "text": pa.array([html_to_text(h) for h in htmls], pa.string()),
    })


def justext_seq(doc_ids: list, htmls: list, **kw) -> pa.Table:
    """Sequential oracle for
    :func:`tenzir_ray.text.html.boilerplate_extract`: per-doc
    jusText-lite main-content selection (good blocks joined by
    newlines)."""
    from tenzir_ray.text.html import boilerplate_text

    return pa.table({
        "doc_id": pa.array([int(i) for i in doc_ids], pa.int64()),
        "text": pa.array([boilerplate_text(h, **kw) for h in htmls],
                         pa.string()),
    })


def classifier_seq(doc_ids: list, texts: list, pos_texts: list,
                   neg_texts: list, num_buckets: int = 4096,
                   epochs: int = 50, lr: float = 2.0, l2: float = 1e-4,
                   ) -> pa.Table:
    """Sequential oracle for the fastText-style quality classifier
    (text/classifier.py): per-doc dict-accumulated hashed-gram features
    (same leaf hash primitives as dsir_seq; tokenization and counting
    re-derived one document at a time), the SAME driver-side
    ``logreg_fit`` (training is driver-side pure numpy in the engine
    too — the distributed surface this oracle checks is featurization
    and scoring), and per-doc scoring accumulated in ascending bucket
    order (the engine's float-determinism contract)."""
    from tenzir_ray.text.classifier import logreg_fit
    from tenzir_ray.text.dsir import _BIGRAM_MULT

    bu = np.uint64(num_buckets)

    def grams(txt) -> list[int]:
        import re as _re
        low = pc.utf8_lower(pa.array([txt or ""], pa.string()))[0].as_py()
        words = [w for w in _re.split(r"[^a-z0-9']+", low) if w]
        if not words:
            return []
        h = pd.util.hash_array(
            np.array(words, dtype=object)).astype(np.uint64)
        out = [int(x % bu) for x in h]
        with np.errstate(over="ignore"):
            for i in range(len(h) - 1):
                out.append(int(((h[i] * _BIGRAM_MULT) ^ h[i + 1]) % bu))
        return out

    def sparse(doc_texts) -> tuple[list, list, list]:
        ds_, bs_, ws_ = [], [], []
        for i, txt in enumerate(doc_texts):
            gl = grams(txt)
            if not gl:
                continue
            counts: dict[int, int] = {}
            for g in gl:
                counts[g] = counts.get(g, 0) + 1
            total = float(len(gl))
            for bkt in sorted(counts):
                ds_.append(i)
                bs_.append(bkt)
                ws_.append(counts[bkt] / total)
        return ds_, bs_, ws_

    dp, bp, wp = sparse(pos_texts)
    dn, bn, wn = sparse(neg_texts)
    n_pos = len(pos_texts)
    d = np.array(dp + [i + n_pos for i in dn], np.int64)
    b = np.array(bp + bn, np.int64)
    w = np.array(wp + wn, np.float64)
    labels = np.zeros(n_pos + len(neg_texts), np.float64)
    labels[:n_pos] = 1.0
    weights, bias = logreg_fit(d, b, w, labels, num_buckets,
                               epochs=epochs, lr=lr, l2=l2)

    scores, flags = [], []
    for txt in texts:
        gl = grams(txt)
        s = 0.0
        if gl:
            counts: dict[int, int] = {}
            for g in gl:
                counts[g] = counts.get(g, 0) + 1
            total = float(len(gl))
            for bkt in sorted(counts):
                s += (counts[bkt] / total) * weights[bkt]
        z = bias + s
        scores.append(z)
        flags.append(z > 0.0)
    return pa.table({
        "doc_id": pa.array([int(i) for i in doc_ids], pa.int64()),
        "quality_score": pa.array(scores, pa.float64()),
        "is_quality": pa.array(flags, pa.bool_()),
    })


def extract_links_seq(urls: list, htmls: list) -> list[tuple[str, str]]:
    """Sequential oracle for
    :func:`tenzir_ray.text.linkgraph.extract_links`: per-page href
    findall with the shared compiled pattern, per-page dedup, sorted
    emission — one page at a time."""
    from tenzir_ray.functions.url import url_host
    from tenzir_ray.text.linkgraph import _HREF, _host_of_links

    out: list[tuple[str, str]] = []
    for u, h in zip(urls, htmls):
        if h is None:
            continue
        if isinstance(h, bytes):
            # SAME charset-aware decode as the engine's shared
            # utf8_string_array path — plain utf-8/replace would turn a
            # <meta charset> cp1252 byte inside an href into U+FFFD and
            # break engine/oracle host parity
            from tenzir_ray.text.html import decode_html_bytes

            h = decode_html_bytes(h)
        src = url_host(pa.array([u or ""], pa.string()))[0].as_py()
        src = (src or "").lower().split("@")[-1]  # userinfo strip
        if not src or "href" not in h.lower():
            continue
        hrefs = [m.group(2) or m.group(3) or m.group(4) or ""
                 for m in _HREF.finditer(h)]
        for dst in sorted(_host_of_links(src, hrefs)):
            out.append((src, dst))
    return out


def pagerank_seq(edge_pairs: list, damping_num: int = 85,
                 damping_den: int = 100, iters: int = 20) -> pa.Table:
    """Sequential fixed-point PageRank over [(src, dst)] pairs: plain
    dict arithmetic, same integer spec (floor-divided contributions,
    rational damping, dangling mass redistributed) — bit-identical to
    the distributed fold because int64 addition is order-free."""
    scale = 1 << 30
    hosts = sorted({h for p in edge_pairs for h in p})
    n = len(hosts)
    if n == 0:
        return pa.table({"host": pa.array([], pa.string()),
                         "rank": pa.array([], pa.int64())})
    outdeg = {h: 0 for h in hosts}
    for s, _ in edge_pairs:
        outdeg[s] += 1
    rank = {h: scale // n for h in hosts}
    base = (scale * (damping_den - damping_num) // damping_den) // n
    for _ in range(iters):
        acc = {h: 0 for h in hosts}
        for s, d in edge_pairs:
            acc[d] += rank[s] // outdeg[s]
        dangling = sum(rank[h] for h in hosts if outdeg[h] == 0)
        extra = dangling // n
        rank = {h: base + (acc[h] + extra) * damping_num // damping_den
                for h in hosts}
    order = sorted(hosts, key=lambda h: (-rank[h], h))
    return pa.table({
        "host": pa.array(order, pa.string()),
        "rank": pa.array([rank[h] for h in order], pa.int64()),
    })


def chunk_tokens_seq(doc_ids: list, texts: list, size: int = 256,
                     overlap: int = 32) -> pa.Table:
    """Sequential oracle for
    :func:`tenzir_ray.text.packing.chunk_tokens`: per-doc Python
    whitespace split and window walk (re-derived one document at a
    time; shares nothing with the vectorized gather)."""
    stride = size - overlap
    ids_out, idx_out, n_out, txt_out = [], [], [], []
    for i, txt in zip(doc_ids, texts):
        toks = (txt or "").split()
        if not toks:
            continue
        if len(toks) <= size:
            wins = [0]
        else:
            wins = list(range(0, len(toks) - overlap, stride))
            # match the engine's ceil((n-overlap)/stride) window count
            wins = wins[: (len(toks) - overlap + stride - 1) // stride]
        for ci, st in enumerate(wins):
            w = toks[st:st + size]
            ids_out.append(int(i))
            idx_out.append(ci)
            n_out.append(len(w))
            txt_out.append(" ".join(w))
    return pa.table({
        "doc_id": pa.array(ids_out, pa.int64()),
        "chunk_idx": pa.array(idx_out, pa.int64()),
        "n_tokens": pa.array(n_out, pa.int64()),
        "text": pa.array(txt_out, pa.string()),
    })


def robots_seq(urls: list, robots: dict, agent: str = "*") -> list[str]:
    """Sequential oracle for
    :func:`tenzir_ray.text.robots.robots_filter`: one url at a time
    through the shared RFC 9309 parse/match spec functions (the
    distributed surface under test is the broadcast + unique-host batch
    plumbing). Returns the allowed urls in input order."""
    from tenzir_ray.text.robots import _path_of, allowed, parse_robots

    parsed = {h.lower(): parse_robots(b) for h, b in robots.items()}
    out = []
    for u in urls:
        host = (u or "").split("//", 1)[-1].split("/", 1)[0] \
            .split("?", 1)[0].split("@")[-1].split(":", 1)[0].lower()
        groups = parsed.get(host)
        if not groups or allowed(groups, _path_of(u or ""), agent):
            out.append(u)
    return out
