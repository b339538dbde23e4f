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
