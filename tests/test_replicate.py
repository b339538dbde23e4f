"""Lake→replica CDC replication: incremental sync off the source's
committed epochs using its own base/delta files as WAL segments.
Convergence is byte-exact (LWW idempotence), resumable (replica
manifests), and survives source compaction (base bootstrap + absorbed
markers)."""

import os

import pandas as pd
import pyarrow as pa
import pytest

from tenzir_ray.cdc.lake import Lake
from tenzir_ray.cdc.wal import WalSpec, generate_wal, list_epochs

SPEC = WalSpec(
    n_events=4000, n_urls=600, n_epochs=5, seed=21,
    epoch_add_title=2, epoch_widen_lang=3, epoch_rename_text=4,
)


def _state(lake: Lake) -> pd.DataFrame:
    return (lake.read_table().to_pandas()
            .sort_values("url").reset_index(drop=True))


def _assert_same_state(a: Lake, b: Lake):
    sa, sb = _state(a), _state(b)
    assert list(sa.columns) == list(sb.columns)
    pd.testing.assert_frame_equal(sa, sb)


@pytest.fixture(scope="module")
def src_wal(tmp_path_factory):
    root = tmp_path_factory.mktemp("replicate")
    wal = str(root / "wal")
    generate_wal(wal, SPEC)
    return str(root), wal


def test_full_then_incremental_sync(src_wal, tmp_path):
    root, wal = src_wal
    eps = list_epochs(wal)
    src = Lake(str(tmp_path / "src"), partitions=4, salt=2)
    dst = Lake(str(tmp_path / "dst"), partitions=4, salt=2)

    # first two epochs land, replica syncs
    src.apply_epochs([(e, fs) for e, fs in eps[:2]])
    r1 = dst.replicate_from(src)
    assert [r["epoch"] for r in r1] == [0, 1]
    _assert_same_state(src, dst)

    # the rest land (including the schema evolution), replica catches up
    src.apply_epochs([(e, fs) for e, fs in eps[2:]])
    r2 = dst.replicate_from(src)
    assert [r["epoch"] for r in r2] == [2, 3, 4]
    _assert_same_state(src, dst)
    assert dst.schema().names == src.schema().names
    # historical schema chain replicated too (as-of read works)
    assert dst.read(as_of_epoch=1).count() > 0

    # converged: another sync is a no-op
    assert dst.replicate_from(src) == []


def test_sync_after_source_compaction(src_wal, tmp_path):
    root, wal = src_wal
    eps = list_epochs(wal)
    src = Lake(str(tmp_path / "src"), partitions=4, salt=2)
    src.apply_epochs(eps)
    src.compact()  # fold everything below the head into bases

    dst = Lake(str(tmp_path / "dst"), partitions=4, salt=2)
    res = dst.replicate_from(src)
    # every src epoch is committed on the replica (absorbed ones as
    # zero-event markers) and the live state is byte-equal
    assert dst.committed_epochs() == src.committed_epochs()
    assert any(r.get("skipped") for r in res)
    _assert_same_state(src, dst)
    assert dst.replicate_from(src) == []


def test_replay_safety_partial_sync_resume(src_wal, tmp_path):
    """Exactly-once: a replica that already committed a prefix resumes
    from the first missing epoch; re-applying overlapping rows is
    LWW-idempotent."""
    root, wal = src_wal
    eps = list_epochs(wal)
    src = Lake(str(tmp_path / "src"), partitions=4, salt=2)
    src.apply_epochs(eps)

    dst = Lake(str(tmp_path / "dst"), partitions=4, salt=2)
    # simulate a crash-interrupted earlier sync: epochs 0-1 committed
    dst.apply_epochs([(e, fs) for e, fs in eps[:2]])
    res = dst.replicate_from(src)
    assert [r["epoch"] for r in res] == [2, 3, 4]
    _assert_same_state(src, dst)


def test_replica_lag_past_retention_raises(src_wal, tmp_path):
    """A replica that committed a HIGHER epoch before a lower one was
    folded into the source's base cannot catch up incrementally — it
    must get a clean ReplicaLagError (the silent path produced a
    permanently diverged replica claiming convergence)."""
    from tenzir_ray.cdc.lake import ReplicaLagError

    root, wal = src_wal
    eps = list_epochs(wal)
    src = Lake(str(tmp_path / "src"), partitions=4, salt=2)
    src.apply_epochs(eps[:4])
    src.compact()  # 0..3 folded into base-e03
    src.apply_epochs([eps[4]])  # epoch 4 delta above the base

    dst = Lake(str(tmp_path / "dst"), partitions=4, salt=2)
    # replica got epochs 0,1,3 from its own tail, never epoch 2 —
    # epoch 2's rows live only inside base-e03, whose covering epoch
    # the replica ALREADY committed: unrecoverable incrementally
    dst.apply_epochs([eps[0], eps[1], eps[3]])
    with pytest.raises(ReplicaLagError):
        dst.replicate_from(src)

    # a replica merely BEHIND (commits below the base, no gap) must
    # also re-bootstrap: the src base may have GC'd the tombstones that
    # would mask the replica's stale rows (overlaying it would
    # resurrect deleted urls)
    dst2 = Lake(str(tmp_path / "dst2"), partitions=4, salt=2)
    dst2.apply_epochs([eps[0], eps[1]])
    with pytest.raises(ReplicaLagError):
        dst2.replicate_from(src)

    # a FRESH replica bootstraps from the same mixed base+delta source
    dst3 = Lake(str(tmp_path / "dst3"), partitions=4, salt=2)
    dst3.replicate_from(src)
    _assert_same_state(src, dst3)
    assert dst3.committed_epochs() == src.committed_epochs()


def test_replica_horizon_guards_time_travel(src_wal, tmp_path):
    """After a compacted-source bootstrap the replica must refuse
    time-travel below the replicated base (it used to return a silent
    empty state) and refuse diffs across that boundary (they came back
    as a wrong all-inserts feed)."""
    from tenzir_ray.cdc.lake import TimeTravelHorizonError

    root, wal = src_wal
    eps = list_epochs(wal)
    src = Lake(str(tmp_path / "src"), partitions=4, salt=2)
    src.apply_epochs(eps)
    src.compact()
    dst = Lake(str(tmp_path / "dst"), partitions=4, salt=2)
    dst.replicate_from(src)

    with pytest.raises(TimeTravelHorizonError):
        dst.read_table(as_of_epoch=1)
    with pytest.raises(TimeTravelHorizonError):
        dst.diff(1, 4)
    # head state and head diff still work
    assert dst.read_table().num_rows == src.read_table().num_rows
    assert set(dst.diff(None).to_pandas()["change"]) == {"insert"}


def test_replica_partition_count_may_differ(src_wal, tmp_path):
    """The replica re-buckets by its own partitioning — a follower with
    different P still converges to the same logical state."""
    root, wal = src_wal
    eps = list_epochs(wal)
    src = Lake(str(tmp_path / "src"), partitions=4, salt=2)
    src.apply_epochs(eps)
    dst = Lake(str(tmp_path / "dst"), partitions=2, salt=1)
    dst.replicate_from(src)
    _assert_same_state(src, dst)
