"""Small shared helpers."""

from __future__ import annotations

import os

import pyarrow as pa


def cluster_is_multinode() -> bool:
    """True when the connected Ray cluster spans more than one alive node.

    Used to decide whether node-local media (/dev/shm, local tmp) can
    carry a staged exchange: a reduce task on another node cannot read a
    map node's tmpfs, so multi-node exchanges must stage to storage every
    node sees. ``TENZIR_RAY_FORCE_MULTINODE=1`` forces the multi-node
    answer (test hook; also the safe override for a cluster whose nodes()
    view lags, e.g. during autoscaling).
    """
    if os.environ.get("TENZIR_RAY_FORCE_MULTINODE", "") == "1":
        return True
    try:
        import ray

        if not ray.is_initialized():
            return False
        return sum(1 for n in ray.nodes() if n.get("Alive")) > 1
    except Exception:
        return False


def autoscale_pool(hi_min: int = 4) -> tuple[int, int]:
    """Actor-pool bounds that scale with the cluster: ``(1, max(hi_min,
    cluster CPUs))``. Resolve at pipeline-BUILD time (call sites pass
    ``concurrency=None`` defaults and call this lazily), never at import —
    Ray may not be up yet. A hard-coded ``(1, 4)`` cap starves a 32-cpu
    node and any larger cluster."""
    cpus = 8
    try:
        import ray

        if ray.is_initialized():
            cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        pass
    return (1, max(hi_min, cpus))


def local_stage_dir(prefix: str, what: str,
                    hint: str = "pass stage_dir= on a cluster-visible "
                                "filesystem") -> str:
    """``tempfile.mkdtemp`` guarded for single-node use: staged files
    under /tmp are node-local, so any path where one process writes and
    Ray tasks elsewhere read must refuse loudly on a multi-node cluster
    instead of failing with unreadable paths mid-pipeline."""
    import tempfile

    if cluster_is_multinode():
        raise ValueError(
            f"{what}: default /tmp staging is node-local; on a "
            f"multi-node cluster {hint}")
    return tempfile.mkdtemp(prefix=prefix)


def exchange_stage_dir(shared_dir: str, *, local_subdir: str) -> str:
    """Pick the staging medium for a file-staged exchange.

    Single node → node-local tmpfs (``/dev/shm/<local_subdir>``, the same
    medium Ray's object store uses — the measured fast path). Multi-node
    (or no tmpfs) → ``shared_dir``, a path on cluster-visible storage
    (the lake root's filesystem: NFS/object store on a real cluster), so
    any reduce task can read any map task's stage files.
    """
    if not cluster_is_multinode() and os.path.isdir("/dev/shm"):
        return os.path.join("/dev/shm", local_subdir)
    return shared_dir


def nometa(t: pa.Table) -> pa.Table:
    """Strip schema-level metadata (zero-copy).

    Parquet files written by pandas/pyarrow carry a ``pandas`` metadata
    blob in the schema; pyarrow schemas with metadata are unhashable
    (``hash(schema)`` raises on the dict), which defeats Ray Data's
    schema-dedup (``unify_schemas`` logs "Failed to hash the schemas"
    per bundle). Stripping metadata at our batch boundaries keeps every
    block's schema hashable and identical across the pipeline.
    """
    return t.replace_schema_metadata(None) if t.schema.metadata else t
