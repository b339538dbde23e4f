"""tenzir_ray — a Ray-Data-native CDC / incremental-ingest engine.

A from-scratch re-imagination of the Tenzir streaming pipeline engine
(reference: /root/reference, kkpan11/tenzir) as a binlog-style CDC tailer
over Common-Crawl-style web pages:

- ``tenzir_ray.cdc``    — the engine core: WAL generation/tailing, hash
  partitioning with skew-aware salting, LWW upsert apply into an LSM-style
  base+delta Parquet lake, exactly-once commit manifests, compaction with
  tombstone GC, merge-on-read queries, crash-resume from checkpoints.
- ``tenzir_ray.stages`` — Tenzir operator parity layer (where/select/
  summarize/sort/dedup/enrich/…) expressed over ``ray.data.Dataset``.
- ``tenzir_ray.functions`` — vectorized scalar function library
  (string/time/hash/encoding kernels over Arrow batches).
- ``tenzir_ray.sources`` — format readers/writers (parquet/json/csv/lines/
  kv/syslog) following Tenzir's loader/parser split.
- ``tenzir_ray.text``   — large-scale training-data ops: exact & near
  dedup (MinHash-LSH, SimHash), language id, quality scoring, token
  counting, fingerprinting, ANN similarity search.

Everything is Ray-Data-first: Datasets of Arrow blocks, ``map_batches``
with ``batch_format="pyarrow"``, actor pools for stateful stages, and
explicit partitioning for every wide step. No module in this package calls
``ray.init()``; session ownership lives with the caller (bench.py, CLI,
test fixtures).
"""

__version__ = "0.1.0"
