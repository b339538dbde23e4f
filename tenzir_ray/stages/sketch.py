"""Mergeable sketches for whole-stream statistics without shuffles.

Exact ``count_distinct`` ships every distinct value through a keyed
exchange; at 10^10-row scale the distinct set itself can exceed worker
memory. HyperLogLog replaces that with a fixed 2^p-byte register array
per batch, OR-merged (elementwise max) in a remote task — the corpus
never rides a shuffle and the driver only ever sees one scalar.

The estimate is DETERMINISTIC given the input multiset (hash → max-rank
registers commute and are order-free), so the distributed result is
byte-comparable to a sequential one-value-at-a-time reimplementation —
the same verification contract as the dedup family.

No reference analog (Tenzir's count_distinct materializes a sorted set,
count_distinct.cpp); this is the documented scale path beyond it.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset


def _clz64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros over uint64 (x==0 → 63)."""
    x = x.copy()
    r = np.zeros(x.shape, dtype=np.uint8)
    for s in (32, 16, 8, 4, 2, 1):
        m = x < (np.uint64(1) << np.uint64(64 - s))
        r[m] += np.uint8(s)
        x[m] = x[m] << np.uint64(s)
    return r


def hll_registers(values: np.ndarray, p: int) -> np.ndarray:
    """Fold hashed values into a fresh 2^p register array (uint8)."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if values.size == 0:
        return regs
    h = pd.util.hash_array(values)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    w = h << np.uint64(p)
    rank = np.where(w == 0, np.uint8(64 - p + 1),
                    np.minimum(_clz64(w) + 1, 64 - p + 1)).astype(np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimator with small-range linear counting."""
    m = regs.size
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(
        m, 0.7213 / (1 + 1.079 / m))
    est = alpha * m * m / np.sum(np.float64(2.0) ** -regs.astype(np.float64))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


def hll_count_distinct(ds: Dataset, col: str, p: int = 12) -> int:
    """Approximate distinct count of ``col`` (relative error
    ~1.04/sqrt(2^p); p=12 → ~1.6%). Per-batch register fold →
    elementwise-max merge in ONE remote task over block refs (registers
    are 2^p bytes regardless of input size); nothing but 4 KiB register
    rows leave the workers."""
    import ray

    def fold(t: pa.Table) -> pa.Table:
        # drop nulls BEFORE numpy conversion: a nullable int column
        # otherwise converts to float64-with-NaN, whose hashes diverge
        # from the oracle's and would count null as a distinct value
        vals = t.column(col).combine_chunks().drop_null().to_numpy(
            zero_copy_only=False)
        regs = hll_registers(vals, p)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    partials = ds.map_batches(fold, batch_format="pyarrow")

    @ray.remote
    def merge(*blocks) -> int:
        acc = np.zeros(1 << p, dtype=np.uint8)
        for b in blocks:
            if b.num_rows == 0 or "regs" not in b.column_names:
                continue  # zero-column empty blocks bypass map_batches
            for buf in b.column("regs").to_pylist():
                np.maximum(acc, np.frombuffer(buf, dtype=np.uint8), out=acc)
        return int(round(hll_estimate(acc)))

    refs = [r for bundle in partials.iter_internal_ref_bundles()
            for r in bundle.block_refs]
    return ray.get(merge.remote(*refs))


def hll_count_distinct_seq(values: list, p: int = 12) -> int:
    """Sequential oracle: one value at a time into the same registers
    (shares only the leaf fold/estimate kernels). Must equal the
    distributed estimate exactly — max-merge is order-free."""
    values = [v for v in values if v is not None]  # fold drops nulls too
    arr = np.asarray(values)
    if arr.dtype.kind in "USO":  # match the Arrow to_numpy object dtype
        arr = arr.astype(object)
    regs = np.zeros(1 << p, dtype=np.uint8)
    for i in range(len(arr)):  # one at a time
        np.maximum(regs, hll_registers(arr[i:i + 1], p), out=regs)
    return int(round(hll_estimate(regs)))
