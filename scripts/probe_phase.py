"""Cheap host-phase probe: EP-control efficiency 8 vs 32 CPUs.

The sandbox host drifts between calm and degraded phases (documented in
BASELINE.md).  The full ``bench.py --scaling`` protocol is expensive
(~10 min); this probe runs ONLY the embarrassingly-parallel control (one
independent zstd-write/read task per CPU, zero coordination) at 8 and at
32 CPUs in fresh subprocesses and reports the host-ceiling efficiency.
Run the full protocol only when this prints eff >= 0.6 (calm phase).
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

CHILD = r"""
import os, sys, time
import ray
ncpu = int(sys.argv[1])
ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
         logging_level="ERROR")

@ray.remote(num_cpus=1)
def one_task(seed: int) -> float:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    rng = np.random.default_rng(seed)
    n = 60_000
    payload = rng.integers(65, 90, size=(n, 1024), dtype=np.uint8)
    t = pa.table({
        "k": pa.array(rng.integers(0, 1 << 40, n)),
        "html": pa.array([payload[i].tobytes() for i in range(n)],
                         pa.binary()),
    })
    path = f"/dev/shm/ep_probe_{seed}_{os.getpid()}.parquet"
    total = 0
    for _ in range(2):
        pq.write_table(t, path, compression="zstd", compression_level=3)
        total += pq.read_table(path).num_rows
    os.remove(path)
    return float(total)

# warm the worker pool so startup cost stays out of the measurement
ray.get([one_task.remote(1000 + i) for i in range(ncpu)])
t0 = time.perf_counter()
ray.get([one_task.remote(i) for i in range(ncpu)])
print(time.perf_counter() - t0)
ray.shutdown()
"""


def one(ncpu: int) -> float:
    out = subprocess.run(
        [sys.executable, "-c", CHILD, str(ncpu)],
        capture_output=True, text=True, cwd=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))),
        env={**os.environ, "RAY_DEDUP_LOGS": "0"},
    )
    if out.returncode != 0 or not out.stdout.strip():
        raise RuntimeError(
            f"probe child (num_cpus={ncpu}) failed rc={out.returncode}: "
            f"{out.stderr.strip()[-800:]}")
    return float(out.stdout.strip().splitlines()[-1])


def main() -> dict:
    # interleave A/B to straddle short noise bursts
    lo = [one(8)]
    hi = [one(32)]
    lo.append(one(8))
    hi.append(one(32))
    # one task per CPU at each level → perfect hardware gives equal
    # walls; eff = wall8/wall32 (same formula as bench.py's ep ceiling)
    eff = min(lo) / min(hi)
    res = {
        "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "ep_8_s": [round(x, 2) for x in lo],
        "ep_32_s": [round(x, 2) for x in hi],
        "host_ceiling_ep_efficiency": round(eff, 3),
        "calm": eff >= 0.6,
    }
    print(json.dumps(res))
    return res


if __name__ == "__main__":
    main()
