"""Hard crash-resume: SIGKILL a worker process mid-apply, resume in a new
process, final state must equal the uninterrupted oracle (north-rule
crash-resume suite, the real-signal version of the marker-removal tests).
"""

import os
import signal
import subprocess
import sys
import textwrap
import time

import pandas as pd

from tenzir_ray.cdc.lake import Lake
from tenzir_ray.cdc.wal import WalSpec, generate_wal
from tests.oracle import replay_wal

_APPLY = textwrap.dedent(
    """
    import sys
    import ray
    ray.init(address="local", num_cpus=2, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    from tenzir_ray.cdc.lake import Lake
    lake = Lake(sys.argv[2], partitions=4, salt=2)
    lake.apply_wal(sys.argv[1])
    print("APPLY_DONE", flush=True)
    """
)


def test_sigkill_mid_apply_then_resume(tmp_path):
    wal = str(tmp_path / "wal")
    generate_wal(wal, WalSpec(n_events=30_000, n_urls=3_000, n_epochs=5, seed=21))
    lake_dir = str(tmp_path / "lake")
    script = tmp_path / "apply.py"
    script.write_text(_APPLY)

    env = dict(os.environ, PYTHONPATH="/root/repo")
    proc = subprocess.Popen(
        [sys.executable, str(script), wal, lake_dir],
        env=env, cwd="/root/repo",
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
    )
    # wait until real progress exists (first bucket manifests), then KILL
    manifest_dir = os.path.join(lake_dir, "_manifest")
    deadline = time.time() + 120
    killed = False
    while time.time() < deadline:
        if proc.poll() is not None:
            break  # finished before we could kill — fall through, still valid
        n = len(os.listdir(manifest_dir)) if os.path.isdir(manifest_dir) else 0
        if n >= 3:
            proc.send_signal(signal.SIGKILL)
            killed = True
            break
        time.sleep(0.05)
    proc.wait(timeout=60)

    # resume in THIS process (fresh Lake object, manifests are the truth)
    lake = Lake(lake_dir)
    results = lake.apply_wal(wal)
    assert len(results) == 5
    got = lake.read_table().to_pandas().sort_values("url").reset_index(drop=True)
    want = replay_wal(wal)
    assert list(got["url"]) == list(want["url"])
    assert list(got["text"]) == list(want["text"])  # byte-identical invariant
    # paranoia: a second resume is a complete no-op
    assert all(r["skipped"] for r in lake.apply_wal(wal))
    if killed:
        # at least some work predated the kill and was NOT redone wrongly
        assert lake.committed_epochs() == {0, 1, 2, 3, 4}
