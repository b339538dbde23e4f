"""CLI: one-shot pipeline execution — the ``tenzir "pipeline"`` analog
(reference exec path: tenzir/tenzir.cpp:56-130 →
libtenzir/builtins/commands/exec.cpp; our compile path is
tenzir_ray.pipelines.planner).

Usage::

    python -m tenzir_ray 'from F.parquet | where x > 1 | select a, b'
    python -m tenzir_ray 'from F.csv | top event_type | write csv OUT_DIR'
    python -m tenzir_ray 'from F.parquet | … | write kv OUT_DIR'   # printer sinks:
    # write syslog|cef|leef|kv|ndjson|lines <dir> land format lines as text files

``from <uri>`` loads via extension dispatch (parquet/json/csv/lines, with
.gz/.zst handled by Arrow); the final ``write json|csv|parquet [path]``
sinks to a directory, or NDJSON on stdout when omitted (the reference's
implicit ``write json to stdout``, src/exec_pipeline.cpp:155-210).
"""

from __future__ import annotations

import argparse
import json
import sys


def _lake_main(args) -> int:
    """``lake`` subcommands: operate the CDC engine from the shell
    (apply/follow ≈ tenzir-node import; read/lookup ≈ export; compact ≈
    rebuild; lineage ≈ metrics/partitions introspection)."""
    from tenzir_ray.cdc import Lake

    lake = Lake(args.lake, partitions=args.partitions, salt=args.salt)
    if args.lake_cmd == "apply":
        for r in lake.apply_wal(args.wal):
            print(json.dumps(r))
    elif args.lake_cmd == "ingest-warc":
        print(json.dumps(lake.ingest_warc(args.warc, epoch=args.epoch),
                         default=str))
    elif args.lake_cmd == "follow":
        for results in lake.follow(
            args.wal, poll_interval=args.poll, idle_rounds=args.idle_rounds,
            compact_every=2,
        ):
            for r in results:
                print(json.dumps(r), flush=True)
    elif args.lake_cmd == "read":
        t = lake.read_table(as_of_epoch=args.as_of, columns=args.columns)
        for row in t.slice(0, args.limit or t.num_rows).to_pylist():
            print(json.dumps(row, default=repr))
    elif args.lake_cmd == "lookup":
        for row in lake.lookup(args.urls, as_of_epoch=args.as_of).to_pylist():
            print(json.dumps(row, default=repr))
    elif args.lake_cmd == "compact":
        print(json.dumps(lake.compact(), default=str))
    elif args.lake_cmd == "lineage":
        for row in lake.lineage().to_pylist():
            print(json.dumps(row, default=str))
    elif args.lake_cmd == "partitions":
        for row in lake.partitions().to_pylist():
            print(json.dumps(row, default=str))
    elif args.lake_cmd == "schemas":
        for row in lake.schemas().to_pylist():
            print(json.dumps(row, default=str))
    return 0


def _store_main(args) -> int:
    """``store`` subcommands: inspect/compact an incremental-dedup
    store (text/incremental.py) from the shell."""
    from tenzir_ray.text.incremental import SignatureStore, compact_store

    store = SignatureStore(args.store)  # layout-compatible with HashStore
    if args.store_cmd == "epochs":
        for e in store.epochs():
            print(json.dumps({
                "epoch": e, "files": len(store.files(e + 1))
                - len(store.files(e))}))
    elif args.store_cmd == "compact":
        before = args.before_epoch
        if before is None:
            eps = store.epochs()
            before = eps[-1] if eps else 0
        merged = compact_store(store, before_epoch=before)
        print(json.dumps({"merged_files": merged,
                          "before_epoch": before}))
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="tenzir_ray")
    sub = ap.add_subparsers(dest="cmd")
    lk = sub.add_parser("lake", help="operate a CDC lake")
    lk.add_argument("lake_cmd", choices=[
        "apply", "ingest-warc", "follow", "read", "lookup", "compact",
        "lineage", "partitions", "schemas"])
    lk.add_argument("--lake", required=True)
    lk.add_argument("--wal")
    lk.add_argument("--warc", help="WARC directory for ingest-warc")
    lk.add_argument("--epoch", type=int, default=0,
                    help="epoch number for ingest-warc (a crawl snapshot "
                         "= one INSERT-only epoch)")
    lk.add_argument("--partitions", type=int, default=8)
    lk.add_argument("--salt", type=int, default=2)
    lk.add_argument("--poll", type=float, default=1.0)
    lk.add_argument("--idle-rounds", type=int, default=None)
    lk.add_argument("--limit", type=int, default=None)
    lk.add_argument("--num-cpus", type=int, default=8)
    lk.add_argument("--urls", nargs="+", default=[])
    lk.add_argument("--as-of", type=int, default=None, dest="as_of",
                    help="time-travel: state after epochs <= N "
                         "(bounded by the compaction horizon)")
    lk.add_argument("--columns", nargs="+", default=None,
                    help="project the read: only these columns (plus the "
                         "merge-required key/order/tombstone set) are "
                         "decoded from parquet")

    st = sub.add_parser("store", help="operate a dedup ingest store")
    st.add_argument("store_cmd", choices=["epochs", "compact"])
    st.add_argument("--store", required=True,
                    help="store root (HashStore/SignatureStore layout)")
    st.add_argument("--before-epoch", type=int, default=None,
                    dest="before_epoch",
                    help="compact: merge committed epochs < N "
                         "(default: everything below the newest)")
    st.add_argument("--num-cpus", type=int, default=8)

    exe = sub.add_parser("exec", help="run a pipeline (default)")
    exe.add_argument("pipeline")
    exe.add_argument("--num-cpus", type=int, default=8)
    exe.add_argument("--limit", type=int, default=None)

    argv = list(sys.argv[1:] if argv is None else argv)
    if argv and argv[0] not in ("lake", "store", "exec", "-h", "--help"):
        argv = ["exec"] + argv  # bare pipeline string → exec
    args = ap.parse_args(argv)

    import ray

    # shut down only a session WE started (tests drive main() inside a
    # long-lived fixture session that must survive the call)
    owns_ray = not ray.is_initialized()
    if owns_ray:
        ray.init(
            address="local", num_cpus=args.num_cpus,
            include_dashboard=False, logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    if args.cmd in ("store", "lake"):
        rc = _store_main(args) if args.cmd == "store" else _lake_main(args)
        if owns_ray:
            ray.shutdown()
        return rc

    from tenzir_ray.pipelines import Pipeline
    from tenzir_ray.sources import open_uri

    segs = Pipeline.split_ops(args.pipeline)
    if not segs or not segs[0].startswith("from "):
        print("error: pipeline must start with `from <uri>`", file=sys.stderr)
        return 2
    sink = None
    if segs and segs[-1].startswith(("write ", "to ")):
        sink = segs.pop()
    uri = segs[0][len("from "):].strip()
    if uri == "-":
        # stdin → events (the reference's `load stdin | read <fmt>`,
        # src/exec_pipeline.cpp). An optional leading `read <fmt>`
        # segment picks the parser; default ndjson. The byte stream is
        # spooled to a tmp file so every existing reader (and Arrow's
        # block-splitting parallel parse) applies unchanged — a console
        # pipe is inherently a single driver-side stream.
        import tempfile

        body = segs[1:]
        fmt = "ndjson"
        if body and body[0].startswith("read "):
            fmt = body.pop(0)[len("read "):].strip()
        ext = {"json": ".ndjson", "ndjson": ".ndjson", "jsonl": ".ndjson",
               "csv": ".csv", "tsv": ".tsv", "lines": ".txt",
               "parquet": ".parquet", "bitz": ".bitz"}.get(fmt)
        if ext is None:
            print(f"error: unknown stdin format {fmt!r}", file=sys.stderr)
            return 2
        import atexit
        import os

        import ray.data as rd

        tmp = tempfile.NamedTemporaryFile(
            suffix=ext, prefix="tenzir_ray_stdin_", delete=False)
        tmp.write(sys.stdin.buffer.read())
        tmp.close()
        atexit.register(lambda p=tmp.name: os.path.exists(p)
                        and os.unlink(p))
        src = rd.from_items([]) if os.path.getsize(tmp.name) == 0 \
            else open_uri(tmp.name)
        ds = Pipeline.parse("\n".join(body)).run(src)
    elif uri.startswith("lake:"):
        # export from a CDC lake (`from lake:<dir> | …`): merge-on-read
        # as the source; a LEADING select pushes its projection into the
        # column-pruned partition scan (html never decoded unless asked)
        from tenzir_ray.cdc import Lake

        body = segs[1:]
        columns = None
        if body and body[0].startswith("select "):
            columns = [c.strip() for c in
                       body.pop(0)[len("select "):].split(",") if c.strip()]
        src = Lake(uri[len("lake:"):]).read(columns=columns)
        ds = Pipeline.parse("\n".join(body)).run(src)
    elif uri.endswith(".parquet"):
        # parquet: let the planner keep `from` so leading where/select
        # push into the scan (filter + projection at the read)
        ds = Pipeline.parse("\n".join(segs)).run()
    elif not uri == "-":
        ds = Pipeline.parse("\n".join(segs[1:])).run(open_uri(uri))

    if sink:
        parts = sink.split()
        fmt = parts[1] if parts[0] == "write" else "parquet"
        path = parts[-1] if len(parts) > 2 or parts[0] == "to" else None
        if path is None:
            # `write <fmt>` with no path → stdout (the reference's
            # `write <fmt> | save stdout`): stream printer lines
            # batch-by-batch, never materializing the result
            if fmt in ("syslog", "cef", "leef", "kv", "ndjson", "csv",
                       "lines", "json", "tql"):
                import functools

                from tenzir_ray.sources import printers as pr

                printer = {
                    "syslog": pr.print_syslog_batch,
                    "cef": pr.print_cef_batch,
                    "leef": pr.print_leef_batch, "kv": pr.print_kv_batch,
                    "ndjson": pr.print_ndjson_batch,
                    "json": pr.print_ndjson_batch,
                    "tql": pr.print_tql_batch,
                    "csv": functools.partial(pr.print_csv_batch,
                                             include_header=False),
                    "lines": pr.print_lines_batch,
                }[fmt]
                lines_ds = ds.map_batches(printer, batch_format="pyarrow")
                if fmt == "csv" and ds.schema() is not None:
                    # schema() is None for an empty from_items([]) (empty
                    # stdin) — no rows, no header
                    print(",".join(ds.schema().names))
                for b in lines_ds.iter_batches(batch_format="pyarrow"):
                    if b.num_rows:
                        sys.stdout.write(
                            "\n".join(b.column("line").to_pylist()) + "\n")
            else:
                print(f"error: sink format {fmt!r} needs a path",
                      file=sys.stderr)
                if owns_ray:
                    ray.shutdown()
                return 2
            if owns_ray:
                ray.shutdown()
            return 0
        if fmt == "parquet":
            ds.write_parquet(path)
        elif fmt == "csv":
            ds.write_csv(path)
        elif fmt == "json":
            ds.write_json(path)
        elif fmt == "pcap":
            # packet sink: (ts, data) rows → classic-pcap part files
            from tenzir_ray.sources.pcap import write_pcap

            write_pcap(ds, path)
        elif fmt in ("syslog", "cef", "leef", "kv", "ndjson", "lines",
                     "tql"):
            # printer sinks: rows → format lines → distributed text files
            from tenzir_ray.sources import printers as pr

            printer = {
                "syslog": pr.print_syslog_batch, "cef": pr.print_cef_batch,
                "leef": pr.print_leef_batch, "kv": pr.print_kv_batch,
                "ndjson": pr.print_ndjson_batch,
                "tql": pr.print_tql_batch,
                "lines": pr.print_lines_batch,
            }[fmt]
            # extension-inferred save-side compression (`write kv out.gz`
            # — the reference's to "x.json.gz" dual, from_to_2.cpp:172)
            codec = next((c for c, e in pr._CODEC_EXT.items()
                          if path.endswith(e)), None)
            pr.write_lines(
                ds.map_batches(printer, batch_format="pyarrow"), path,
                codec=codec)
        else:
            print(f"error: unknown sink format {fmt!r}", file=sys.stderr)
            return 2
    else:
        # default stdout sink: NDJSON, streamed per printed BATCH (the
        # distributed printer renders lines worker-side; the driver only
        # concatenates) — bounded driver memory on any input size
        from tenzir_ray.sources import printers as pr

        if args.limit is not None:
            ds = ds.limit(args.limit)
        lines_ds = ds.map_batches(pr.print_ndjson_batch,
                                  batch_format="pyarrow")
        for b in lines_ds.iter_batches(batch_format="pyarrow"):
            if b.num_rows:
                sys.stdout.write(
                    "\n".join(b.column("line").to_pylist()) + "\n")
    if owns_ray:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
