"""CDC engine core: WAL → hash-partitioned LWW upsert → LSM Parquet lake."""

from tenzir_ray.cdc.lake import Lake
from tenzir_ray.cdc.wal import generate_wal, list_epochs

__all__ = ["Lake", "generate_wal", "list_epochs"]
