"""DSIR importance resampling: distributed engine vs the sequential
per-doc reference, plus the edge cases the kernel must not fumble
(nulls/empties, bigram doc boundaries, no-gumbel mode, model sanity)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from tenzir_ray.text.dsir import (
    _gram_buckets,
    dsir_score,
    dsir_select,
    fit_gram_counts,
    log_ratio,
)
from tenzir_ray.text.sequential import dsir_seq

TARGET = [
    "the quick brown fox jumps over the lazy dog",
    "a quick brown fox and a lazy dog walk home",
    "quick foxes and lazy dogs are a classic pair",
]
RAW = [
    "the quick brown fox jumps over the lazy dog again",   # target-like
    "stock market closes higher on tech rally today",
    "a lazy dog naps while the quick fox runs by",         # target-like
    "parliament passed the budget after a long debate",
    "quick brown foxes chase lazy dogs at dawn",           # target-like
    "rainfall totals broke records across the region",
    "",                                                    # empty doc
    None,                                                  # null doc
]
IDS = list(range(len(RAW)))


def _raw_ds():
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(IDS, pa.int64()),
        "text": pa.array(RAW, pa.string())})).repartition(3)


def _target_ds():
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(TARGET)), pa.int64()),
        "text": pa.array(TARGET, pa.string())}))


def test_engine_matches_sequential_bit_for_bit():
    k = 4
    got = dsir_select(_raw_ds(), _target_ds(), k, num_buckets=512) \
        .select_columns(["doc_id", "dsir_score"]).sort("doc_id").take_all()
    exp = dsir_seq(IDS, RAW, TARGET, k, num_buckets=512)
    assert [r["doc_id"] for r in got] == exp.column("doc_id").to_pylist()
    # float scores must be IDENTICAL (same IEEE add order by design)
    assert [r["dsir_score"] for r in got] == \
        exp.column("dsir_score").to_pylist()


def test_target_like_docs_outrank_without_noise():
    p = fit_gram_counts(_target_ds(), num_buckets=512)
    q = fit_gram_counts(_raw_ds(), num_buckets=512)
    scored = dsir_score(_raw_ds(), log_ratio(p, q), num_buckets=512,
                        gumbel_seed=None)
    rows = {r["doc_id"]: r["dsir_score"] for r in scored.take_all()}
    target_like = {0, 2, 4}
    off_target = {1, 3, 5}
    assert min(rows[d] for d in target_like) > \
        max(rows[d] for d in off_target)
    # gumbel_seed=None → key IS the score
    for r in scored.take_all():
        assert r["dsir_key"] == r["dsir_score"]


def test_empty_and_null_docs_score_zero():
    p = fit_gram_counts(_target_ds(), num_buckets=512)
    q = fit_gram_counts(_raw_ds(), num_buckets=512)
    scored = dsir_score(_raw_ds(), log_ratio(p, q), num_buckets=512,
                        gumbel_seed=None)
    rows = {r["doc_id"]: r["dsir_score"] for r in scored.take_all()}
    assert rows[6] == 0.0 and rows[7] == 0.0


def test_bigrams_do_not_cross_doc_boundaries():
    # two docs; the cross-boundary pair ("beta","gamma") must not fire
    col = pa.array(["alpha beta", "gamma delta"])
    buckets, docs = _gram_buckets(col, 1 << 20)
    col2 = pa.array(["alpha beta gamma delta"])
    b2, _ = _gram_buckets(col2, 1 << 20)
    # single doc has 4 unigrams + 3 bigrams; the pair of docs has
    # 4 unigrams + 2 bigrams — one fewer (the boundary bigram)
    assert len(b2) == 7 and len(buckets) == 6
    assert sorted(docs.tolist()) == [0, 0, 0, 1, 1, 1]


def test_counts_are_batchsize_invariant():
    a = fit_gram_counts(_raw_ds(), num_buckets=256)
    b = fit_gram_counts(_raw_ds().repartition(7), num_buckets=256)
    assert np.array_equal(a, b)
    assert a.sum() > 0


def test_select_k_larger_than_corpus_keeps_all():
    got = dsir_select(_raw_ds(), _target_ds(), 100, num_buckets=256)
    assert got.count() == len(RAW)


def test_mismatched_logratio_length_rejected():
    with pytest.raises(ValueError, match="num_buckets"):
        dsir_score(_raw_ds(), np.zeros(8), num_buckets=16)


def test_turkish_dotted_i_matches_engine_lowercase():
    """Arrow utf8_lower maps U+0130 without special casing; the
    sequential tokenizer must use the same primitive (review repro:
    str.lower() split the token in two)."""
    raw = RAW[:6] + ["\u0130stanbul gezisi notlar\u0131 burada", None]
    ids = list(range(len(raw)))
    got = dsir_select(
        rd.from_arrow(pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(raw, pa.string())})),
        _target_ds(), len(raw), num_buckets=512) \
        .select_columns(["doc_id", "dsir_score"]).sort("doc_id").take_all()
    exp = dsir_seq(ids, raw, TARGET, len(raw), num_buckets=512)
    assert [(r["doc_id"], r["dsir_score"]) for r in got] == \
        list(zip(exp.column("doc_id").to_pylist(),
                 exp.column("dsir_score").to_pylist()))
