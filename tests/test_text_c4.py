"""C4 cleaning: engine line/page filters + corpus-level 3-sentence-span
dedup vs the sequential per-doc reference, plus each rule in isolation."""

import pyarrow as pa
import ray.data as rd

from tenzir_ray.text.c4 import c4_clean, c4_span_dedup
from tenzir_ray.text.sequential import c4_seq

GOOD = "alpha beta gamma delta ends here."      # 6 words, terminal .
DOCS = [
    # survives: three well-formed sentences on three lines
    (0, "one two three four five six.\n"
        "seven eight nine ten eleven twelve!\n"
        "thirteen fourteen fifteen sixteen seventeen?"),
    # line without terminal punctuation dropped -> page under min_sentences
    (1, "no terminal punctuation on this line\n" + GOOD),
    # short line dropped, page keeps 3 sentences
    (2, "tiny line.\n" + GOOD + "\n" + GOOD.replace("alpha", "omega")
        + "\n" + GOOD.replace("alpha", "zeta")),
    # javascript line dropped
    (3, "please enable javascript to continue here.\n"
        + GOOD + "\n" + GOOD.replace("alpha", "omega")
        + "\n" + GOOD.replace("alpha", "zeta")),
    # page with brace dropped entirely
    (4, GOOD + "\n" + GOOD.replace("alpha", "omega")
        + "\ncode sample with brace { inside it."),
    # lorem ipsum page dropped
    (5, GOOD + "\nlorem ipsum dolor sit amet consectetur adipiscing.\n"
        + GOOD.replace("alpha", "omega")),
    # empty / null docs dropped
    (6, ""),
    (7, None),
]
# span-dup pair: doc 8 repeats doc 0's three sentences (one line each)
DOCS.append((8, DOCS[0][1] + "\nunique closing sentence number one ok."))


def _ds(rows, parts=3):
    ids, texts = zip(*rows)
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string())})).repartition(parts)


def _run(rows, **kw):
    out = c4_span_dedup(c4_clean(_ds(rows), **kw)).sort("doc_id").take_all()
    return [(r["doc_id"], r["text"]) for r in out]


def test_engine_matches_sequential_byte_for_byte():
    got = _run(DOCS)
    exp = c4_seq([d for d, _ in DOCS], [t for _, t in DOCS])
    assert got == list(zip(exp.column("doc_id").to_pylist(),
                           exp.column("text").to_pylist()))


def test_rules_fire_as_intended():
    kept = dict(_run(DOCS))
    assert 0 in kept and set(kept) == {0, 2, 3, 8}
    # doc 1 lost its unpunctuated line -> under 3 sentences -> dropped
    # docs 4 (brace), 5 (lorem ipsum), 6/7 (empty) dropped
    assert "tiny line." not in kept[2]
    assert "javascript" not in kept[3]
    # doc 8's copied 3-sentence span was scrubbed; its unique tail stays
    assert kept[8] == "unique closing sentence number one ok."


def test_badwords_page_filter():
    rows = [(0, GOOD + "\n" + GOOD.replace("alpha", "omega")
             + "\n" + GOOD.replace("alpha", "zeta"))]
    assert _run(rows) and not _run(rows, badwords=("gamma",))


def test_batchsize_invariance():
    a = _run(DOCS)
    out = c4_span_dedup(c4_clean(_ds(DOCS, parts=1))) \
        .sort("doc_id").take_all()
    assert a == [(r["doc_id"], r["text"]) for r in out]


def test_span_dedup_keeps_global_first_across_docs():
    s3 = ("first sentence of the block here. "
          "second sentence of the block here. "
          "third sentence of the block here.")
    rows = [(10, s3 + " tail sentence unique to ten."),
            (20, s3 + " tail sentence unique to twenty.")]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([d for d, _ in rows], pa.int64()),
        "text": pa.array([t for _, t in rows], pa.string())}))
    out = {r["doc_id"]: r["text"]
           for r in c4_span_dedup(ds).sort("doc_id").take_all()}
    assert out[10].startswith("first sentence")
    # doc 20 keeps only what the duplicated span did not cover
    assert "first sentence" not in out[20]
    assert "tail sentence unique to twenty." in out[20]


def test_randomized_corpus_matches_sequential():
    """200 docs of seeded random sentences with heavy duplication: the
    distributed clean+span-dedup result must equal the sequential
    reference byte-for-byte (exercises cross-batch span collisions,
    overlapping spans and whole-doc scrubs)."""
    import numpy as np

    rng = np.random.RandomState(0)
    vocab = ["alpha", "beta", "gamma", "delta", "omega", "sigma"]
    sents = [" ".join(rng.choice(vocab, 5)) + "." for _ in range(30)]
    rows = []
    for d in range(200):
        n = rng.randint(1, 8)
        body = "\n".join(sents[i] for i in rng.randint(0, 30, n))
        rows.append((d, body if d % 29 else None))
    got = _run(rows)
    exp = c4_seq([d for d, _ in rows], [t for _, t in rows])
    assert got == list(zip(exp.column("doc_id").to_pylist(),
                           exp.column("text").to_pylist()))


def test_nbsp_whitespace_matches_engine_semantics():
    """RE2 \\s is ASCII-only: NBSP after a period is NOT a sentence
    boundary in the engine; the sequential reference must agree (the
    review repro: engine dropped the page, seq kept it)."""
    good = "alpha beta gamma delta ends here."
    doc = good + "\u00a0" + good.replace("alpha", "omega") \
        + "\u00a0" + good.replace("alpha", "zeta")
    rows = [(0, doc)]
    got = _run(rows)
    exp = c4_seq([0], [doc])
    assert got == list(zip(exp.column("doc_id").to_pylist(),
                           exp.column("text").to_pylist()))
    # and the pinned semantics: one NBSP-glued sentence -> page dropped
    assert got == []
