"""Re-export: the sequential WAL replay oracle lives in
tenzir_ray.cdc.oracle so the driver-facing precomputed-expected-table
path (__ray_entry__) can use the same single-threaded reference."""

from tenzir_ray.cdc.oracle import replay_wal

__all__ = ["replay_wal"]
