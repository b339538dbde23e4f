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


def make_planes(dim: int, n_planes: int = 8, seed: int = 97) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).astype(np.float32)


def embedding_dedup(
    ds: Dataset,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 6,
    seed: int = 97,
) -> Dataset:
    """Embedding-cosine near-duplicate removal: LSH-bucket the corpus
    (random hyperplanes — cosine-similar vectors land in the same sign
    bucket with high probability), then one exact pairwise-cosine pass
    *within* each bucket via ``groupby(ann_bucket).map_groups`` (the only
    shuffle; bucket sizes ≈ n/2^planes keep the quadratic check local),
    dropping every row whose cosine to a lower-id survivor ≥ threshold.

    Like all sign-LSH methods, pairs split across buckets are missed —
    raise recall by unioning over several plane seeds (multi-probe)."""
    import functools

    import pyarrow.compute as pc

    dim = len(ds.take(1)[0][vec_col])
    planes = make_planes(dim, n_planes, seed)

    bucketed = ds.map_batches(
        functools.partial(lsh_bucket_batch, planes=planes, vec_col=vec_col),
        batch_format="pyarrow",
    )

    def dedup_bucket(g: pa.Table) -> pa.Table:
        g = g.take(pc.sort_indices(g, sort_keys=[(id_col, "ascending")]))
        m = _normalize(_to_matrix(g.column(vec_col)))
        sims = m @ m.T
        np.fill_diagonal(sims, 0.0)
        drop = np.zeros(len(m), dtype=bool)
        for i in range(len(m)):
            if drop[i]:
                continue
            drop |= (np.arange(len(m)) > i) & (sims[i] >= threshold)
        return g.filter(pa.array(~drop)).drop_columns(["ann_bucket"])

    return bucketed.groupby("ann_bucket").map_groups(
        dedup_bucket, batch_format="pyarrow"
    )


# ------------------------------------------------------------------ IVF


def ivf_build(
    ds: Dataset, n_lists: int = 16, id_col: str = "vec_id",
    vec_col: str = "embedding", iters: int = 5, seed: int = 11,
) -> tuple[np.ndarray, Dataset]:
    """IVF index build: k-means centroids trained on a driver-side sample
    (small — centroids are the only global state), then one vectorized
    assign pass over the corpus adding ``ivf_list``. Returns (centroids,
    assigned Dataset); persist with ``write_parquet(partition_cols=
    ["ivf_list"])`` so searches open only their probed lists' files."""
    sample = ds.limit(max(2000, 50 * n_lists))
    sm = _normalize(_to_matrix(
        pa.concat_tables(
            [pa.table(b) if not isinstance(b, pa.Table) else b
             for b in sample.iter_batches(batch_format="pyarrow")]
        ).column(vec_col)
    ))
    rng = np.random.default_rng(seed)
    cents = sm[rng.choice(len(sm), size=min(n_lists, len(sm)), replace=False)]
    for _ in range(iters):
        assign = (sm @ cents.T).argmax(axis=1)
        for c in range(len(cents)):
            members = sm[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cents[c] = v / n

    import ray

    cref = ray.put(cents)

    class Assign:
        def __init__(self):
            self.c = ray.get(cref)

        def __call__(self, t: pa.Table) -> pa.Table:
            m = _normalize(_to_matrix(t.column(vec_col)))
            lists = (m @ self.c.T).argmax(axis=1).astype(np.int32)
            return t.append_column("ivf_list", pa.array(lists))

    return cents, ds.map_batches(Assign, batch_format="pyarrow",
                                 concurrency=(1, 8))


def ivf_search(
    assigned: Dataset, centroids: np.ndarray, queries: np.ndarray,
    k: int = 10, n_probe: int = 4, id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pa.Table:
    """IVF search: per query, scan only the ``n_probe`` nearest lists — a
    vectorized filter inside the same brute-force scorer (the probed-list
    mask plays the role of opening only those partitions' files at scale).
    """
    import pyarrow.compute as pc

    qn = _normalize(np.asarray(queries, dtype=np.float32))
    probe = np.argsort(-(qn @ centroids.T), axis=1)[:, :n_probe]  # (Q, n_probe)
    import ray

    ref = ray.put((qn, probe))

    class Scorer:
        def __init__(self):
            self.q, self.probe = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            m = _normalize(_to_matrix(t.column(vec_col)))
            ids = t.column(id_col).to_numpy()
            lists = t.column("ivf_list").to_numpy()
            sims = m @ self.q.T  # (n, Q)
            # mask out rows not in the query's probed lists
            allowed = np.zeros_like(sims, dtype=bool)
            for qi in range(self.q.shape[0]):
                allowed[:, qi] = np.isin(lists, self.probe[qi])
            sims = np.where(allowed, sims, -2.0)
            kk = min(k, sims.shape[0])
            top = np.argpartition(-sims, kk - 1, axis=0)[:kk]
            qidx = np.repeat(np.arange(sims.shape[1]), kk)
            didx = top.T.reshape(-1)
            keep = sims[didx, qidx] > -2.0
            return pa.table({
                "query": pa.array(qidx[keep], pa.int32()),
                id_col: pa.array(ids[didx][keep]),
                "cosine": pa.array(
                    sims[didx, qidx][keep].astype(np.float64), pa.float64()),
            })

    partials = assigned.map_batches(Scorer, batch_format="pyarrow",
                                    concurrency=(1, 8))
    chunks = [pa.table(c) if not isinstance(c, pa.Table) else c
              for c in partials.iter_batches(batch_format="pyarrow")]
    if not chunks:
        return pa.table({"query": pa.array([], pa.int32()),
                         id_col: pa.array([]),
                         "cosine": pa.array([], pa.float64())})
    t = pa.concat_tables(chunks)
    out = []
    for q in range(qn.shape[0]):
        sub = t.filter(pc.equal(t.column("query"), q))
        sub = sub.take(pc.sort_indices(
            sub, sort_keys=[("cosine", "descending"), (id_col, "ascending")]))
        out.append(sub.slice(0, k))
    return pa.concat_tables(out)
