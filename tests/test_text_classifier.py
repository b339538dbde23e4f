"""fastText-style hashed-gram quality classifier: distributed
featurize/score vs the per-doc sequential oracle, determinism contract,
and edge cases (empty docs, nulls, single-class degenerate input)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from tenzir_ray.text.classifier import (
    classifier_score,
    classifier_train,
    doc_features,
    logreg_fit,
)
from tenzir_ray.text.sequential import classifier_seq

POS = [
    "the cat sat on the mat and the dog sat by the door",
    "it was the best of times and it was the worst of times",
    "we hold these truths to be self evident that all are equal",
    "the quick brown fox jumps over the lazy dog every day",
]
NEG = [
    "zzz qqq www buy now click here free offer",
    "qqq zzz kkk xxx yyy www limited deal",
    "click click buy buy free free now now",
    "xxx yyy zzz qqq www kkk jjj",
]
SCORE_DOCS = [
    (0, "the cat and the dog sat by the best door"),
    (1, "click here for the free offer zzz"),
    (2, "qqq www zzz buy now"),
    (3, ""),
    (4, None),
    (5, "it was the quick fox we hold equal"),
]


def _ds(rows, cols=("doc_id", "text"), parts=3):
    return rd.from_arrow(pa.table({
        cols[0]: pa.array([r[0] for r in rows], pa.int64()),
        cols[1]: pa.array([r[1] for r in rows], pa.string()),
    })).repartition(parts)


def test_engine_matches_sequential_bit_for_bit():
    pos = _ds(list(enumerate(POS)), parts=2)
    neg = _ds(list(enumerate(NEG)), parts=2)
    model = classifier_train(pos, neg, num_buckets=512, epochs=40)
    got = classifier_score(_ds(SCORE_DOCS), model) \
        .sort("doc_id").take_all()
    exp = classifier_seq(
        [i for i, _ in SCORE_DOCS], [t for _, t in SCORE_DOCS],
        POS, NEG, num_buckets=512, epochs=40)
    assert [r["quality_score"] for r in got] == \
        exp.column("quality_score").to_pylist()   # bit-exact floats
    assert [r["is_quality"] for r in got] == \
        exp.column("is_quality").to_pylist()


def test_separates_the_classes():
    model = classifier_train(_ds(list(enumerate(POS))),
                             _ds(list(enumerate(NEG))),
                             num_buckets=512, epochs=60)
    out = {r["doc_id"]: r for r in
           classifier_score(_ds(SCORE_DOCS), model).take_all()}
    assert out[0]["is_quality"] and out[5]["is_quality"]
    assert not out[1]["is_quality"] and not out[2]["is_quality"]
    # gram-less docs score exactly the bias
    assert out[3]["quality_score"] == out[4]["quality_score"] \
        == float(model["bias"])


def test_doc_features_normalized_and_sorted():
    col = pa.array(["b b a", None, "", "c"], pa.string())
    d, b, w = doc_features(col, 64)
    assert list(d) == sorted(d.tolist())
    # doc 0: 3 unigrams + 2 bigrams = 5 grams; weights sum to 1
    np.testing.assert_allclose(w[d == 0].sum(), 1.0)
    np.testing.assert_allclose(w[d == 3].sum(), 1.0)
    assert set(d.tolist()) == {0, 3}
    for doc in (0, 3):
        bb = b[d == doc]
        assert list(bb) == sorted(bb.tolist())


def test_logreg_fit_degenerate_single_class():
    d = np.array([0, 1], np.int64)
    b = np.array([1, 2], np.int64)
    w = np.array([1.0, 1.0])
    weights, bias = logreg_fit(d, b, w, np.ones(2), 16, epochs=5)
    assert np.isfinite(weights).all() and np.isfinite(bias)
    assert bias > 0  # all-positive labels push the bias up


def test_max_sample_caps_the_pull():
    pos = _ds([(i, "good words the and of") for i in range(50)])
    neg = _ds([(i, "zzz qqq") for i in range(50)])
    m = classifier_train(pos, neg, num_buckets=64, max_sample=10,
                         epochs=5)
    assert m["n_pos"] == 10 and m["n_neg"] == 10
