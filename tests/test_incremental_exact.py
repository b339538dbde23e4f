"""Incremental EXACT dedup at ingest (text/incremental.py
incremental_exact_dedup): engine vs the sequential epoch loop, replay
idempotence, null-text grouping, and the survivors-only hash store."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from tenzir_ray.text.incremental import HashStore, incremental_exact_dedup
from tenzir_ray.text.sequential import incremental_exact_dedup_seq


def _corpus(seed: int = 3, n_epochs: int = 3, per_epoch: int = 25):
    rng = np.random.default_rng(seed)
    base = [f"document body number {i} with shared words" for i in range(12)]
    ids, texts, epochs = [], [], []
    did = 0
    for e in range(n_epochs):
        for _ in range(per_epoch):
            if rng.random() < 0.6:      # exact repeat (within/cross epoch)
                texts.append(base[int(rng.integers(len(base)))])
            else:
                texts.append(f"unique text {did} epoch {e}")
            ids.append(did)
            epochs.append(e)
            did += 1
    texts[4] = None
    texts[30] = None  # second null in a later epoch: must be dropped
    return ids, texts, epochs


def _run_engine(store_root, ids, texts, epochs):
    surv = []
    store = HashStore(str(store_root))
    for e in sorted(set(epochs)):
        sel = [i for i, ep in zip(range(len(ids)), epochs) if ep == e]
        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array([ids[i] for i in sel], pa.int64()),
            "text": pa.array([texts[i] for i in sel], pa.string())}))
        out = incremental_exact_dedup(ds, store, e)
        surv.extend((e, r["doc_id"]) for r in out.take_all())
    return sorted(surv)


def test_matches_sequential_across_epochs(ray_session, tmp_path):
    ids, texts, epochs = _corpus()
    got = _run_engine(tmp_path / "s", ids, texts, epochs)
    exp = sorted(incremental_exact_dedup_seq(ids, texts, epochs))
    assert got == exp
    # sanity: the cross-epoch repeats actually fired
    assert len(got) < len(ids)


def test_replay_is_idempotent(ray_session, tmp_path):
    ids, texts, epochs = _corpus(seed=9)
    a = _run_engine(tmp_path / "s", ids, texts, epochs)
    # replay epoch 1 against the now-committed store: same survivors,
    # store unchanged
    store = HashStore(str(tmp_path / "s"))
    files_before = store.files()
    sel = [i for i, ep in enumerate(epochs) if ep == 1]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([ids[i] for i in sel], pa.int64()),
        "text": pa.array([texts[i] for i in sel], pa.string())}))
    out = incremental_exact_dedup(ds, store, 1)
    replay = sorted((1, r["doc_id"]) for r in out.take_all())
    assert replay == [s for s in a if s[0] == 1]
    assert store.files() == files_before


def test_null_texts_are_mutual_duplicates(ray_session, tmp_path):
    ids, texts, epochs = _corpus()
    surv_ids = {d for _, d in _run_engine(tmp_path / "s2", ids, texts,
                                          epochs)}
    assert 4 in surv_ids      # first null survives
    assert 30 not in surv_ids  # later null is its duplicate


def test_store_holds_survivor_hashes_only(ray_session, tmp_path):
    ids, texts, epochs = _corpus(seed=5)
    surv = _run_engine(tmp_path / "s", ids, texts, epochs)
    store = HashStore(str(tmp_path / "s"))
    stored = pa.concat_tables(
        [pq.read_table(f) for f in store.files()])
    # one hash per surviving doc, all distinct across the whole store
    assert stored.num_rows == len(surv)
    h = stored.column("h").to_numpy(zero_copy_only=False)
    assert len(np.unique(h)) == len(h)


def test_compact_store_preserves_future_drop_decisions(ray_session,
                                                       tmp_path):
    from tenzir_ray.text.incremental import compact_store

    ids, texts, epochs = _corpus(seed=11, n_epochs=4)
    # control: all 4 epochs, no compaction
    control = _run_engine(tmp_path / "a", ids, texts, epochs)
    # compacted: epochs 0-2, compact, then epoch 3
    store = HashStore(str(tmp_path / "b"))
    for e in (0, 1, 2):
        sel = [i for i, ep in enumerate(epochs) if ep == e]
        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array([ids[i] for i in sel], pa.int64()),
            "text": pa.array([texts[i] for i in sel], pa.string())}))
        incremental_exact_dedup(ds, store, e).take_all()
    merged = compact_store(store, before_epoch=3)
    assert merged >= 3          # three epoch segments went in
    assert store.epochs() == [0]  # one merged segment remains
    assert len(store.files(before_epoch=3)) >= 1
    sel = [i for i, ep in enumerate(epochs) if ep == 3]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([ids[i] for i in sel], pa.int64()),
        "text": pa.array([texts[i] for i in sel], pa.string())}))
    out = sorted((3, r["doc_id"]) for r in
                 incremental_exact_dedup(ds, store, 3).take_all())
    assert out == [s for s in control if s[0] == 3]
    # idempotent: nothing left to merge
    assert compact_store(store, before_epoch=3) == 0


def test_compact_store_minhash_variant(ray_session, tmp_path):
    """Same contract over the banded SignatureStore."""
    import shutil as _sh

    from tenzir_ray.text import SignatureStore, incremental_minhash_dedup
    from tenzir_ray.text.incremental import compact_store

    rng = np.random.default_rng(2)
    words = [f"w{i}" for i in range(100)]
    base = [" ".join(rng.choice(words, 30)) for _ in range(10)]

    def epoch_ds(e, lo):
        txts = [base[i % 10] if i % 2 else f"fresh {e} {i} " +
                " ".join(rng.choice(words, 25)) for i in range(12)]
        return rd.from_arrow(pa.table({
            "doc_id": pa.array(range(lo, lo + 12), pa.int64()),
            "text": pa.array(txts, pa.string())}))

    # survivor decisions depend only on the FIXED base texts (odd
    # indices are base repeats; even indices carry a unique "fresh e i"
    # prefix and always survive), so the random tails need not match
    # between the two runs
    def run(root, compact_at):
        _sh.rmtree(root, ignore_errors=True)
        store = SignatureStore(str(root))
        out = []
        for e in range(4):
            if e == compact_at:
                compact_store(store, before_epoch=e)
            surv = incremental_minhash_dedup(
                epoch_ds(e, e * 12), store, e)
            out.extend((e, r["doc_id"]) for r in surv.take_all())
        return sorted(out)

    a = run(tmp_path / "x", compact_at=None)
    b = run(tmp_path / "y", compact_at=3)
    assert a == b


def test_store_cli(ray_session, tmp_path, capsys):
    """`store epochs` / `store compact` CLI over a HashStore."""
    import json as _json

    from tenzir_ray.__main__ import main

    ids, texts, epochs = _corpus(seed=13)
    _run_engine(tmp_path / "s", ids, texts, epochs)
    root = str(tmp_path / "s")
    assert main(["store", "epochs", "--store", root]) == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l]
    assert [_json.loads(l)["epoch"] for l in lines] == [0, 1, 2]
    assert main(["store", "compact", "--store", root]) == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["before_epoch"] == 2 and out["merged_files"] >= 2
    store = HashStore(root)
    assert store.epochs() == [0, 2]
