"""Approximate-nearest-neighbor similarity search over embedding columns.

Baseline: brute-force cosine top-k — the query matrix is broadcast once
(``ray.put``) and each batch does one numpy matmul against it. Scale path:
LSH-bucketed search (random-hyperplane signs partition the corpus; only
matching buckets are scanned).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset


def _to_matrix(col, dtype=np.float32) -> np.ndarray:
    """list<float> column → (n, d) matrix, zero-copy-ish."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(dtype)
    n = len(col)
    return flat.reshape(n, -1) if n else flat.reshape(0, 0)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def ann_cosine_topk(
    ds: Dataset,
    queries: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dtype=np.float32,
) -> "pa.Table":
    """Brute-force cosine top-k: per-batch matmul against the broadcast
    query matrix emits each batch's local top-k per query (k rows/query
    per batch — the partial top-k combiner), then a final driver-side
    reduction over the tiny partials. No full-corpus materialization."""
    import ray

    qn = _normalize(np.asarray(queries, dtype=dtype))
    qref = ray.put(qn)

    class Scorer:
        def __init__(self):
            self.q = ray.get(qref)  # (Q, d), broadcast once per actor

        def __call__(self, t: pa.Table) -> pa.Table:
            m = _normalize(_to_matrix(t.column(vec_col), dtype))
            ids = t.column(id_col).to_numpy()
            sims = m @ self.q.T  # (n, Q)
            kk = min(k, sims.shape[0])
            top = np.argpartition(-sims, kk - 1, axis=0)[:kk]  # (kk, Q)
            qidx = np.repeat(np.arange(sims.shape[1]), kk)
            didx = top.T.reshape(-1)
            return pa.table({
                "query": pa.array(qidx, pa.int32()),
                id_col: pa.array(ids[didx]),
                "cosine": pa.array(sims[didx, qidx].astype(np.float64), pa.float64()),
            })

    partials = ds.map_batches(Scorer, batch_format="pyarrow", concurrency=(1, 8))
    # final exact reduction over ≤ (k × Q × n_batches) rows — tiny
    chunks = list(partials.iter_batches(batch_format="pyarrow"))
    if not chunks:
        chunks = [pa.table(
            {"query": pa.array([], pa.int32()), id_col: pa.array([]),
             "cosine": pa.array([], pa.float64())})]
    t = pa.concat_tables([pa.table(c) if not isinstance(c, pa.Table) else c
                          for c in chunks])
    import pyarrow.compute as pc

    out_chunks = []
    for q in range(qn.shape[0]):
        sub = t.filter(pc.equal(t.column("query"), q))
        sub = sub.take(pc.sort_indices(
            sub, sort_keys=[("cosine", "descending"), (id_col, "ascending")]))
        out_chunks.append(sub.slice(0, k))
    return pa.concat_tables(out_chunks) if out_chunks else t


def lsh_bucket_batch(
    t: pa.Table, *, planes: np.ndarray, vec_col: str = "embedding"
) -> pa.Table:
    """Scale path: random-hyperplane LSH bucket id per vector. Bucket the
    corpus once (write partitioned by bucket); queries probe only their
    own bucket (+neighbors for recall)."""
    m = _normalize(_to_matrix(t.column(vec_col)))
    signs = (m @ planes.T) > 0  # (n, P)
    bucket = np.zeros(m.shape[0], dtype=np.int64)
    for i in range(planes.shape[0]):
        bucket = (bucket << 1) | signs[:, i]
    return t.append_column("ann_bucket", pa.array(bucket, pa.int64()))
