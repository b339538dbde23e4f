"""Incremental MinHash dedup at ingest (text/incremental.py): engine vs
the independent sequential epoch loop, replay idempotence, and the
survivors-only signature-store contract."""

import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data as rd

from tenzir_ray.text import SignatureStore, incremental_minhash_dedup
from tenzir_ray.text.sequential import incremental_minhash_dedup_seq


def _corpus(seed: int = 7, n_epochs: int = 3, per_epoch: int = 30):
    rng = np.random.default_rng(seed)
    words = [f"w{i}" for i in range(300)]
    base = [" ".join(rng.choice(words, 40)) for _ in range(per_epoch)]
    ids, texts, epochs = [], [], []
    did = 0
    for e in range(n_epochs):
        for b in base:
            if rng.random() < 0.5:  # near/exact repeat of a base doc
                texts.append(b + (f" extra{e}" if rng.random() < 0.3
                                  else ""))
            else:  # fresh doc
                texts.append(" ".join(rng.choice(words, 40)))
            ids.append(did)
            epochs.append(e)
            did += 1
    texts[5] = None  # null text: no bands, always survives
    return ids, texts, epochs


def _epoch_table(ids, texts, epochs, e) -> pa.Table:
    sel = [k for k in range(len(ids)) if epochs[k] == e]
    return pa.table({
        "doc_id": pa.array([ids[k] for k in sel], pa.int64()),
        "text": pa.array([texts[k] for k in sel], pa.string()),
    })


@pytest.fixture()
def store(tmp_path):
    root = str(tmp_path / "sigstore")
    shutil.rmtree(root, ignore_errors=True)
    return SignatureStore(root)


def test_matches_sequential_across_epochs(ray_session, store):
    ids, texts, epochs = _corpus()
    want = incremental_minhash_dedup_seq(ids, texts, epochs)
    got = []
    for e in sorted(set(epochs)):
        surv = incremental_minhash_dedup(
            rd.from_arrow(_epoch_table(ids, texts, epochs, e)), store, e)
        got += [(e, int(x)) for x in surv.to_pandas()["doc_id"]]
    assert sorted(got) == sorted(want)
    # cross-epoch dups really exist (the test would be vacuous otherwise)
    assert len(got) < len(ids)
    # null-text doc survives
    assert (0, 5) in got


def test_replay_is_idempotent(ray_session, store):
    ids, texts, epochs = _corpus(seed=11)
    first = {}
    for e in sorted(set(epochs)):
        surv = incremental_minhash_dedup(
            rd.from_arrow(_epoch_table(ids, texts, epochs, e)), store, e)
        first[e] = sorted(int(x) for x in surv.to_pandas()["doc_id"])
    # re-apply a committed mid-stream epoch: same survivors, store
    # unchanged (append no-ops on the .done marker)
    files_before = store.files()
    surv = incremental_minhash_dedup(
        rd.from_arrow(_epoch_table(ids, texts, epochs, 1)), store, 1)
    assert sorted(int(x) for x in surv.to_pandas()["doc_id"]) == first[1]
    assert store.files() == files_before


def test_store_holds_survivor_signatures_only(ray_session, store):
    ids, texts, epochs = _corpus(seed=13)
    survivors = set()
    for e in sorted(set(epochs)):
        surv = incremental_minhash_dedup(
            rd.from_arrow(_epoch_table(ids, texts, epochs, e)), store, e)
        survivors |= {int(x) for x in surv.to_pandas()["doc_id"]}
    stored = set()
    for f in store.files():
        stored |= set(pq.read_table(f, columns=["doc"])
                      .column("doc").to_pylist())
    # dropped docs never index; null-text docs have no bands to store
    assert stored <= survivors
    assert store.epochs() == sorted(set(epochs))
