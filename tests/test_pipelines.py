"""Mini-TQL pipeline front-end vs duckdb oracles."""

import duckdb
import pandas as pd
import pytest
import ray.data as rd

from tenzir_ray.pipelines import Pipeline

SF = "/root/testdata/sf0.001"


def sql(q):
    con = duckdb.connect()
    for t in ["lineitem", "events"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con.sql(q).df()


@pytest.fixture(scope="module")
def lineitem():
    return rd.read_parquet(f"{SF}/lineitem.parquet")


def test_where_select_head(lineitem):
    p = Pipeline.parse("""
        where l_quantity > 45 and l_discount < 0.05
        select l_orderkey, l_quantity
    """)
    got = p.run(lineitem).to_pandas()
    want = sql("SELECT l_orderkey, l_quantity FROM lineitem WHERE l_quantity > 45 AND l_discount < 0.05")
    assert sorted(got["l_orderkey"]) == sorted(want["l_orderkey"])


def test_set_and_summarize(lineitem):
    p = Pipeline.parse("""
        set revenue = l_extendedprice * (1 - l_discount)
        summarize total=sum(revenue), n=count(*) by l_returnflag
        sort l_returnflag
    """)
    got = p.run(lineitem).to_pandas()
    want = sql("""SELECT l_returnflag, sum(l_extendedprice*(1-l_discount)) total,
                  count(*) n FROM lineitem GROUP BY 1 ORDER BY 1""")
    assert list(got["l_returnflag"]) == list(want["l_returnflag"])
    assert (abs(got["total"] - want["total"]) < 1e-6).all()
    assert list(got["n"]) == list(want["n"])


def test_sort_head_tql(lineitem):
    p = Pipeline.parse("""
        sort -l_extendedprice, l_orderkey, l_linenumber
        head 5
        select l_orderkey, l_extendedprice
    """)
    got = p.run(lineitem).to_pandas()
    want = sql("""SELECT l_orderkey, l_extendedprice FROM lineitem
                  ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 5""")
    assert list(got["l_orderkey"]) == list(want["l_orderkey"])


def test_rename_drop(lineitem):
    p = Pipeline.parse("""
        rename qty=l_quantity
        select l_orderkey, qty
    """)
    got = p.run(lineitem).to_pandas()
    assert list(got.columns) == ["l_orderkey", "qty"]


def test_top(lineitem):
    got = Pipeline.parse("top l_returnflag").run(lineitem).to_pandas()
    want = sql("""SELECT l_returnflag, count(*)::BIGINT count FROM lineitem
                  GROUP BY 1 ORDER BY 2 DESC""")
    assert list(got["count"]) == list(want["count"])[:len(got)]


def test_bad_operator():
    with pytest.raises(ValueError):
        Pipeline.parse("frobnicate x")


def test_expr_guard():
    with pytest.raises(ValueError):
        Pipeline.parse("where __import__('os').system('true')")


def test_pipe_separated_one_liner(lineitem):
    got = Pipeline.parse(
        "where l_quantity > 49 | select l_orderkey, l_quantity | head 5"
    ).run(lineitem).to_pandas()
    assert (got["l_quantity"] > 49).all() and len(got) == 5


def test_cli_end_to_end(tmp_path):
    import json as J
    import subprocess, sys
    out = subprocess.run(
        [sys.executable, "-m", "tenzir_ray",
         "from /root/testdata/sf0.001/events.parquet | top event_type",
         "--num-cpus", "2"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-500:]
    rows = [J.loads(l) for l in out.stdout.strip().splitlines()]
    assert len(rows) == 5 and rows[0]["count"] >= rows[-1]["count"]
    bad = subprocess.run(
        [sys.executable, "-m", "tenzir_ray", "where x > 1"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert bad.returncode == 2 and "from" in bad.stderr


def test_cli_lake_subcommands(tmp_path):
    import json as J
    import subprocess, sys
    from tenzir_ray.cdc.wal import WalSpec, generate_wal
    wal = str(tmp_path / "wal")
    generate_wal(wal, WalSpec(n_events=2000, n_urls=300, n_epochs=2, seed=13))
    env = dict(__import__("os").environ, PYTHONPATH="/root/repo")
    base = [sys.executable, "-m", "tenzir_ray", "lake"]
    lake = str(tmp_path / "lake")
    r = subprocess.run(base + ["apply", "--lake", lake, "--wal", wal,
                               "--partitions", "2", "--num-cpus", "2"],
                       capture_output=True, text=True, cwd="/root/repo", env=env)
    assert r.returncode == 0, r.stderr[-400:]
    assert len(r.stdout.strip().splitlines()) == 2  # one line per epoch
    r2 = subprocess.run(base + ["read", "--lake", lake, "--limit", "3",
                                "--num-cpus", "2"],
                        capture_output=True, text=True, cwd="/root/repo", env=env)
    rows = [J.loads(l) for l in r2.stdout.strip().splitlines()]
    assert len(rows) == 3 and "url" in rows[0]
    r3 = subprocess.run(base + ["lineage", "--lake", lake, "--num-cpus", "2"],
                        capture_output=True, text=True, cwd="/root/repo", env=env)
    assert all("events_per_s" in l for l in r3.stdout.strip().splitlines())


def test_from_pushdown_plan_and_result(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from tenzir_ray.pipelines import Pipeline

    path = str(tmp_path / "t.parquet")
    pq.write_table(
        pa.table({"a": list(range(100)), "b": [i * 2 for i in range(100)],
                  "c": ["x"] * 100}), path)
    p = Pipeline.parse(f"""
        from {path}
        where a > 90
        select a, b
        sort a
    """)
    src, filt, cols = p.source_plan()
    assert src == path and cols == ["a", "b"] and filt is not None
    out = p.run()
    # projection happened at the scan: the dataset never had column c
    assert out.schema().names == ["a", "b"]
    rows = out.take_all()
    assert [r["a"] for r in rows] == list(range(91, 100))


def test_from_pushdown_filter_on_unprojected_column(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tenzir_ray.pipelines import Pipeline

    path = str(tmp_path / "t2.parquet")
    pq.write_table(pa.table({"a": list(range(20)), "k": [i % 2 for i in range(20)]}), path)
    p = Pipeline.parse(f"from {path} | where k == 1 | select a")
    out = p.run()
    assert sorted(r["a"] for r in out.take_all()) == list(range(1, 20, 2))


def test_tql_expression_functions(ray_session):
    """Function calls in expressions (tql2/eval.cpp analog): whitelist
    registry, nesting, composition with operators."""
    import ray.data as rd

    from tenzir_ray.pipelines import Pipeline

    ds = rd.from_items([
        {"s": "Hello World", "x": 2.345, "n": 7},
        {"s": "bye", "x": 10.5, "n": 3},
    ])
    out = Pipeline.parse(
        'where contains(s, "o") | set u = upper(s) '
        '| set r = round(x * (1 - 0.1), 2) | set l = to_int(length(s))'
    ).run(ds).take_all()
    assert out == [{"s": "Hello World", "x": 2.345, "n": 7,
                    "u": "HELLO WORLD", "r": 2.11, "l": 11}]

    # unknown function / attribute access rejected
    import pytest

    with pytest.raises(ValueError):
        Pipeline.parse("set y = __import__(s)").run(ds)
    with pytest.raises(ValueError):
        Pipeline.parse("set y = s.upper()").run(ds)


def test_tql_where_with_calls_not_pushed(tmp_path, ray_session):
    """A leading where WITH calls must not fold into the scan filter."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tenzir_ray.pipelines import Pipeline

    p = tmp_path / "t.parquet"
    pq.write_table(pa.table({"s": ["abc", "xbc", "aq"]}), p)
    pipe = Pipeline.parse(
        f'from {p} | where starts_with(s, "a") | set u = upper(s)')
    _, filt, _ = pipe.source_plan()
    assert filt is None
    got = sorted(r["u"] for r in pipe.run().take_all())
    assert got == ["ABC", "AQ"]


def test_tql_enrich_and_parse_ops(tmp_path, ray_session):
    """enrich + parse_* reachable from pipeline text."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from tenzir_ray.pipelines import Pipeline

    ctx = tmp_path / "ctx.parquet"
    pq.write_table(pa.table({"k": [1, 2], "zone": ["a", "b"]}), ctx)
    ds = rd.from_items([{"n": 1}, {"n": 2}, {"n": 9}])
    out = Pipeline.parse(
        f"enrich key=n, table={ctx}, field=zone, out=zone, table_key=k"
    ).run(ds).take_all()
    assert sorted((r["n"], r["zone"]) for r in out) == \
        [(1, "a"), (2, "b"), (9, None)]

    logs = rd.from_items([{"line": "user=alice action=login"}])
    kv = Pipeline.parse("parse_kv line").run(logs).take_all()
    assert kv[0]["kv"] == {"user": "alice", "action": "login"}


def test_tql_sigma_operator(tmp_path, ray_session):
    """sigma reachable from pipeline text (rules from a YAML file)."""
    import ray.data as rd

    from tenzir_ray.pipelines import Pipeline

    rules = tmp_path / "rules.yml"
    rules.write_text(
        "title: high_sev\n"
        "detection:\n"
        "  selection:\n"
        "    level: critical\n"
        "  condition: selection\n"
        "---\n"
        "title: bad_user\n"
        "detection:\n"
        "  selection:\n"
        "    user: mallory\n"
        "  condition: selection\n"
    )
    ds = rd.from_items([
        {"level": "critical", "user": "alice"},
        {"level": "info", "user": "mallory"},
        {"level": "info", "user": "bob"},
    ])
    out = Pipeline.parse(f"sigma {rules}").run(ds).take_all()
    got = {r["user"]: r["sigma_rules"] for r in out}
    assert got == {"alice": ["high_sev"], "mallory": ["bad_user"]}


def test_tql_chained_comparison_rejected(ray_session):
    """bool(_Arr) would silently drop the first leg of `a < x < b`;
    both expression compilers must reject chained comparisons."""
    import ray.data as rd

    from tenzir_ray.pipelines import Pipeline

    ds = rd.from_items([{"x": "abcd"}])
    with pytest.raises(ValueError, match="chained"):
        Pipeline.parse("where 3 < length(x) < 5").run(ds)
    with pytest.raises(ValueError, match="chained"):
        Pipeline.parse("where 1 < x < 5").run(ds)


def test_tql_floor_mod_semantics(ray_session):
    """% follows Python floor-mod (negative dividends included)."""
    import ray.data as rd

    from tenzir_ray.pipelines import Pipeline

    ds = rd.from_items([{"n": -7}, {"n": 7}, {"n": -3}])
    out = Pipeline.parse("set m = n % 3").run(ds).take_all()
    assert sorted((r["n"], r["m"]) for r in out) == \
        [(-7, 2), (-3, 0), (7, 1)]


def test_tql_summarize_using_hash(ray_session):
    import ray.data as rd

    from tenzir_ray.pipelines import Pipeline

    ds = rd.from_items([{"k": i % 2, "v": i} for i in range(10)])
    a = sorted(Pipeline.parse("summarize n=count(*), s=sum(v) by k")
               .run(ds).take_all(), key=lambda r: r["k"])
    b = sorted(Pipeline.parse(
        "summarize n=count(*), s=sum(v) by k using hash")
        .run(ds).take_all(), key=lambda r: r["k"])
    assert a == b


def test_tql_move_unflatten_assert_timeshift(ray_session, tmp_path):
    import pyarrow as pa

    ds = rd.from_items([
        {"a": 1, "u.x": 10, "ts": pd.Timestamp("2024-01-01 00:00:00")},
        {"a": 2, "u.x": 20, "ts": pd.Timestamp("2024-01-01 01:00:00")},
    ])
    p = Pipeline.parse("""
        move b=a
        unflatten
        assert b < 10
        timeshift ts 2h
    """)
    out = p.run(ds).to_pandas().sort_values("b").reset_index(drop=True)
    assert list(out.columns.sort_values()) == ["b", "ts", "u"]
    assert out["b"].tolist() == [1, 2]
    assert out["u"].tolist() == [{"x": 10}, {"x": 20}]
    assert out["ts"].iloc[0] == pd.Timestamp("2024-01-01 02:00:00")

    # assert drops rows failing the predicate (with a logged warning)
    p2 = Pipeline.parse("assert a > 1")
    out2 = p2.run(rd.from_items([{"a": 1}, {"a": 2}])).to_pandas()
    assert out2["a"].tolist() == [2]


def test_tql_throttle_and_yara(ray_session, tmp_path):
    rules = tmp_path / "r.yar"
    rules.write_text('''
rule hit {
  strings:
    $a = "needle"
  condition:
    $a
}
''')
    ds = rd.from_items([
        {"data": "has a needle inside"},
        {"data": "nothing here"},
    ])
    p = Pipeline.parse(f"yara {rules} data\nselect data")
    out = p.run(ds).to_pandas()
    assert out["data"].tolist() == ["has a needle inside"]

    p3 = Pipeline.parse("throttle 100000")
    assert p3.run(rd.from_items([{"a": i} for i in range(5)])).count() == 5


def test_cli_stdin_formats_and_stdout_printers(tmp_path):
    import subprocess, sys
    base = [sys.executable, "-m", "tenzir_ray"]
    # stdin csv -> kv on stdout
    r = subprocess.run(
        base + ["from - | read csv | where a >= 2 | write kv",
                "--num-cpus", "2"],
        input="a,b\n1,x\n2,y\n3,z\n", capture_output=True, text=True,
        cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-500:]
    assert sorted(r.stdout.strip().splitlines()) == ["a=2 b=y", "a=3 b=z"]
    # stdin ndjson (default) -> csv on stdout, RFC4180 quoting intact
    r = subprocess.run(
        base + ["from - | set b = a * 10 | write csv", "--num-cpus", "2"],
        input='{"a":1,"t":"hi, there"}\n{"a":2,"t":"yo"}\n',
        capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-500:]
    lines = r.stdout.strip().splitlines()
    assert lines[0] == "a,t,b" and '1,"hi, there",10' in lines
    # stdin tsv parses with tab delimiter
    r = subprocess.run(
        base + ["from - | read tsv | write ndjson", "--num-cpus", "2"],
        input="a\tb\n5\tq\n", capture_output=True, text=True,
        cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-500:]
    assert r.stdout.strip() == '{"a":5,"b":"q"}'
    # unknown stdin format fails loudly
    r = subprocess.run(base + ["from - | read pcapng | write kv"],
                       input="", capture_output=True, text=True,
                       cwd="/root/repo")
    assert r.returncode == 2 and "unknown stdin format" in r.stderr
    # empty stdin → empty output, exit 0 (no ArrowInvalid crash)
    r = subprocess.run(base + ["from - | write ndjson", "--num-cpus", "2"],
                       input="", capture_output=True, text=True,
                       cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-500:]
    assert r.stdout.strip() == ""
    # write lines = verbatim strings (no CSV quoting), round-trips
    r = subprocess.run(
        base + ["from - | read lines | write lines", "--num-cpus", "2"],
        input='hello, world\nhas"quote\n', capture_output=True, text=True,
        cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-500:]
    assert sorted(r.stdout.strip().splitlines()) == \
        ['has"quote', "hello, world"]


def test_python_operator(ray_session):
    """`python "code"` per-batch UDF (operators/python.cpp analog) with
    optional per-stage placement knobs (the local/remote analog)."""
    import ray.data as rd

    from tenzir_ray.pipelines import Pipeline

    ds = rd.from_items([{"a": i} for i in range(12)])
    out = Pipeline.parse(
        'python "df[\'b\'] = df.a * 3"\nwhere b >= 9').run(ds).to_pandas()
    assert sorted(out["b"]) == [9 + 3 * i for i in range(9)]
    # actor-pool path: code compiled once per actor, explicit resources
    out2 = Pipeline.parse(
        'python num_cpus=0.5 concurrency=2 "df = df[df.a % 3 == 0]"'
    ).run(ds).to_pandas()
    assert sorted(out2["a"]) == [0, 3, 6, 9]


def test_tql_curation_operators(ray_session):
    """quality / dedup_exact / cap / scrub_passages / semdedup reachable
    from pipeline text."""
    import numpy as np
    import pyarrow as pa

    from tenzir_ray.pipelines.planner import run_pipeline

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(8), pa.int64()),
        "source": pa.array(["a", "a", "a", "b", "b", "b", "b", "b"]),
        "text": pa.array([
            "the quick brown fox jumps over the lazy dog again today",
            "the quick brown fox jumps over the lazy dog again today",
            "completely different text body number three here now",
            "yet another unique document four with more words",
            "fifth document text goes here with its own words",
            "sixth unique body of text for the cap test run",
            "seventh unique body of text for the cap test run two",
            "eighth unique body of text for the cap test run three",
        ]),
    }))

    out = run_pipeline("dedup_exact text", docs).to_pandas()
    assert len(out) == 7  # one exact dup dropped

    out = run_pipeline("quality text", docs).to_pandas()
    assert {"doc_id", "lang"} <= set(out.columns) or len(out.columns) > 2

    out = run_pipeline("cap 2 by source order_by doc_id asc", docs) \
        .to_pandas()
    assert len(out) == 4
    assert sorted(out["doc_id"]) == [0, 1, 3, 4]

    out = run_pipeline("scrub_passages ngram=4 min_docs=2 text=text",
                       docs).to_pandas()
    assert "text_scrubbed" in out.columns

    emb = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(20), pa.int64()),
        "embedding": pa.array(
            [list(map(float, np.sin(np.arange(8) + i))) for i in range(10)]
            * 2, pa.list_(pa.float32())),
    }))
    out = run_pipeline("semdedup threshold=0.99 clusters=2", emb) \
        .to_pandas()
    assert len(out) == 10  # exact-duplicate vectors collapsed


def test_cli_lake_source(ray_session, tmp_path, capsys):
    """`from lake:<dir> | select … | …` — export straight from the lake
    with the projection pushed into the column-pruned scan."""
    import pyarrow as pa
    import ray.data as rd

    from tenzir_ray.cdc import Lake
    from tenzir_ray.sources.warc import write_warc
    from tenzir_ray.__main__ import main

    crawl = str(tmp_path / "crawl")
    rows = pa.table({
        "url": pa.array([f"https://p{i}.example/" for i in range(12)]),
        "warc_ts": pa.array([1_760_000_000] * 12, pa.int64())
        .cast(pa.timestamp("s")).cast(pa.timestamp("ns")),
        "payload": pa.array([f"<p>t{i % 3}</p>".encode()
                             for i in range(12)], pa.binary()),
    })
    write_warc(rd.from_arrow(rows), crawl)
    lake_dir = str(tmp_path / "lake")
    Lake(lake_dir, partitions=2, salt=1).ingest_warc(crawl, epoch=0)

    rc = main([f"from lake:{lake_dir} | select url, text | "
               "summarize n=count() by text | sort text"])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    import json as _json

    got = [_json.loads(line) for line in out]
    assert [g["n"] for g in got] == [4, 4, 4]
    assert [g["text"] for g in got] == ["t0", "t1", "t2"]


def test_tql_let_if_fork_blocks(ray_session):
    """TQL2 language constructs in pipeline TEXT (tql2/parser.cpp,
    operators/if.cpp, operators/fork.cpp): `let` constants substitute
    into later operators (including scan pushdown), `if/else` routes
    rows through branch subpipelines and merges, `fork` copies the
    stream through a block and unions it back."""
    import pyarrow as pa
    import ray.data as rd

    from tenzir_ray.pipelines.planner import Pipeline, run_pipeline

    t = pa.table({"x": list(range(20)),
                  "y": [float(i % 4) for i in range(20)]})
    ds = rd.from_arrow(t)

    # let + if/else: rows split on a bound constant, branches transform
    out = run_pipeline(
        """
        let $cut = 10
        if x >= $cut {
          set side = 1 | select x, side
        } else {
          set side = 0 | select x, side
        }
        sort x
        """, ds).to_pandas()
    assert list(out["side"]) == [0] * 10 + [1] * 10

    # if without else: non-matching rows pass through unchanged
    out2 = run_pipeline("if x < 3 { set y = 99.0 }\nsort x", ds).to_pandas()
    assert list(out2["y"][:3]) == [99.0] * 3
    assert list(out2["y"][3:]) == [float(i % 4) for i in range(3, 20)]

    # fork: main ∪ branch (20 + 5 matching rows)
    n = run_pipeline("fork { where x < 5 }", ds).count()
    assert n == 25

    # let pushes into the scan filter (pushdown survives substitution)
    p2 = Pipeline.parse("""
        let $m = 7
        from /tmp/whatever.parquet
        where x > $m
    """)
    # `let` precedes `from`: where folded into the scan filter
    src, filt, cols = p2.source_plan()
    assert src == "/tmp/whatever.parquet" and filt is not None

    # nested blocks tokenize as one segment
    segs = Pipeline.split_ops(
        "if a { if b { head 1 } else { head 2 } } | sort x")
    assert len(segs) == 2 and segs[1] == "sort x"


def test_cli_stdout_streams_large_input(tmp_path):
    """Path-less sinks stream per printed BATCH through the driver (no
    iter_rows row-at-a-time, no full materialization): a >100K-row input
    round-trips byte-exactly through the default NDJSON stdout sink and
    through `write ndjson`, with --limit honored dataset-side."""
    import json as _json
    import subprocess, sys

    import pyarrow as pa
    import pyarrow.parquet as pq

    n = 120_000
    src = str(tmp_path / "big.parquet")
    pq.write_table(pa.table({
        "i": pa.array(range(n), pa.int64()),
        "s": pa.array([f"v{i % 97}" for i in range(n)]),
    }), src)
    base = [sys.executable, "-m", "tenzir_ray"]

    r = subprocess.run(base + [f"from {src} | write ndjson",
                               "--num-cpus", "4"],
                       capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-500:]
    lines = r.stdout.strip().splitlines()
    assert len(lines) == n
    rows = sorted((_json.loads(l)["i"] for l in lines))
    assert rows[0] == 0 and rows[-1] == n - 1

    # default sink (no write op) + --limit
    r = subprocess.run(base + [f"from {src} | sort i", "--limit", "5",
                               "--num-cpus", "4"],
                       capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-500:]
    got = [_json.loads(l) for l in r.stdout.strip().splitlines()]
    assert [g["i"] for g in got] == [0, 1, 2, 3, 4]

    # a path-needing format without a path fails loudly
    r = subprocess.run(base + [f"from {src} | head 1 | write parquet"],
                       capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 2 and "needs a path" in r.stderr


def test_tql_every_block(ray_session, tmp_path):
    """`every <dur> rounds=K { pipe }` (operators/every_cron.cpp): the
    block re-runs each round — a `from` inside re-opens the source and
    sees newly-arrived files — and round outputs union."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from tenzir_ray.pipelines.planner import run_pipeline

    t = pa.table({"x": [1, 2, 3]})
    ds = rd.from_arrow(t)
    # over the piped input: 3 rounds x 3 rows
    out = run_pipeline("every 0s rounds=3 { where x > 0 }", ds)
    assert out.count() == 9

    # with an inner source: each round re-opens the file
    p = str(tmp_path / "src.parquet")
    pq.write_table(t, p)
    out = run_pipeline(
        f"every 0s rounds=2 {{ from {p} | where x >= 2 }}", ds)
    assert out.count() == 4


def test_tql_dedup_minhash_cc(ray_session):
    """`dedup_minhash cc=true` in pipeline text = transitive-closure
    survivors (one per duplicate component)."""
    import pyarrow as pa
    import ray.data as rd

    from tenzir_ray.pipelines.planner import run_pipeline
    from tenzir_ray.text import minhash_cc_dedup

    base = ("the quick brown fox jumps over the lazy dog and runs far "
            "into the deep green forest tonight under a pale moon")
    rows = [{"doc_id": i,
             "text": base + f" t{i % 2}" if i % 4 == 0 and i
             else " ".join(f"w{i}x{j}" for j in range(25))}
            for i in range(30)]
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    got = sorted(r["doc_id"] for r in run_pipeline(
        "dedup_minhash cc=true", ds).take_all())
    want = sorted(r["doc_id"] for r in
                  minhash_cc_dedup(ds, "doc_id", "text").take_all())
    assert got == want and len(got) < 30


def test_tql_brace_inside_string_block(ray_session):
    """Review regression: a brace inside a string literal within an
    if/else block must not mis-scope the block."""
    import pyarrow as pa
    import ray.data as rd

    from tenzir_ray.pipelines.planner import run_pipeline

    ds = rd.from_arrow(pa.table({"x": [1, 2, 3]}))
    out = run_pipeline(
        'if x > 1 { set note = "}" } else { set note = "ok" }\nsort x',
        ds).to_pandas()
    assert list(out["note"]) == ["ok", "}", "}"]


def test_group_block_head_per_key(ray_session):
    """`group key { sort | head | set }` (operators/group.cpp:23-118):
    top-2 per key with a computed column, vs a window-function oracle."""
    got = Pipeline.parse(
        f"from {SF}/events.parquet\n"
        "select event_id, event_type, value\n"
        "group event_type { sort value, event_id | head 2 "
        "| set v2 = value * 2 }"
    ).run().to_pandas().sort_values(["event_type", "value"]).reset_index(drop=True)
    want = sql("""
        SELECT event_id, event_type, value, value * 2 AS v2 FROM events
        QUALIFY row_number() OVER (
            PARTITION BY event_type ORDER BY value, event_id) <= 2
        ORDER BY event_type, value
    """)
    pd.testing.assert_frame_equal(got[want.columns], want)


def test_group_block_summarize_by(ray_session):
    """summarize inside a group block keeps the key via `by` and matches
    a plain GROUP BY."""
    got = Pipeline.parse(
        f"from {SF}/events.parquet\n"
        "group event_type { summarize n=count(), sv=sum(value) "
        "by event_type }"
    ).run().to_pandas().sort_values("event_type").reset_index(drop=True)
    want = sql("""
        SELECT event_type, count(*) AS n, sum(value) AS sv
        FROM events GROUP BY event_type ORDER BY event_type
    """)
    got["sv"] = got["sv"].round(6); want["sv"] = want["sv"].round(6)
    pd.testing.assert_frame_equal(got[want.columns], want)


def test_group_block_rejects_unsupported_op():
    with pytest.raises(ValueError, match="not supported inside a group"):
        Pipeline.parse("group k { shell cat }")


def test_group_block_summarize_tql_aggregate_aliases(ray_session):
    """Review r05: avg/std/median work inside group blocks exactly like
    at top level (TQL names map to pyarrow hash-aggregate names)."""
    got = Pipeline.parse(
        f"from {SF}/events.parquet\n"
        "group event_type { summarize n=count(), m=avg(value) "
        "by event_type }"
    ).run().to_pandas().sort_values("event_type").reset_index(drop=True)
    want = sql("""
        SELECT event_type, count(*) AS n, avg(value) AS m
        FROM events GROUP BY event_type ORDER BY event_type
    """)
    got["m"] = got["m"].round(6); want["m"] = want["m"].round(6)
    pd.testing.assert_frame_equal(got[want.columns], want)


def test_let_not_substituted_inside_string_literal(ray_session):
    """ADVICE r04: `$name` inside a quoted literal must stay literal."""
    import pyarrow as pa

    from tenzir_ray.pipelines.planner import run_pipeline

    ds = rd.from_arrow(pa.table({"x": [1, 2, 3]}))
    out = run_pipeline(
        'let $cut = 2\nset s = "$cut USD"\nwhere x >= $cut\nsort x',
        ds).to_pandas()
    assert list(out["x"]) == [2, 3]
    assert set(out["s"]) == {"$cut USD"}


def test_string_ending_in_escaped_backslash_tokenizes(ray_session):
    """ADVICE r04: a literal ending in an escaped backslash ("a\\\\")
    must close the string — the following ops still parse."""
    import pyarrow as pa

    from tenzir_ray.pipelines.planner import run_pipeline

    ds = rd.from_arrow(pa.table({"x": [1, 2, 3]}))
    out = run_pipeline('set s = "a\\\\"\nwhere x > 1\nsort x',
                       ds).to_pandas()
    assert list(out["x"]) == [2, 3]
    assert set(out["s"]) == {"a\\"}


def test_read_write_format_ops(ray_session):
    """read_*/write_* in pipeline text (web/docs/tql2/operators/
    read_*.mdx, write_*.mdx): in-pipeline parse/print duals."""
    import json

    import ray.data as rd

    from tenzir_ray.pipelines.planner import Pipeline

    rows = [{"a": i, "b": f"t{i % 3}"} for i in range(10)]
    ds = rd.from_items(rows)

    # events → ndjson lines → events again (write/read duality)
    lines = Pipeline.parse("write_ndjson").run(ds).take_all()
    assert sorted(json.loads(r["line"])["a"] for r in lines) == list(
        range(10))
    back = Pipeline.parse("write_ndjson | read_ndjson").run(ds)
    got = sorted(r["a"] for r in back.take_all())
    assert got == list(range(10))

    # csv dual needs declared columns on the read side
    csv_back = Pipeline.parse(
        "write_csv | read_csv columns=a,b").run(ds).take_all()
    assert sorted(int(r["a"]) for r in csv_back) == list(range(10))
    assert {r["b"] for r in csv_back} == {"t0", "t1", "t2"}

    # kv round-trip
    kv_back = Pipeline.parse("write_kv | read_kv col=line").run(ds)
    assert kv_back.count() == 10

    # syslog print produces one line per event
    sys_lines = Pipeline.parse("write_syslog").run(ds).take_all()
    assert len(sys_lines) == 10 and all("line" in r for r in sys_lines)


def test_compress_ops_in_pipeline(ray_session):
    """compress_<codec>/decompress_<codec> planner ops: per-record
    column compression (the batch analog of the stream codecs)."""
    import ray.data as rd

    from tenzir_ray.pipelines.planner import Pipeline

    rows = [{"a": i, "s": "payload-" * 20 + str(i)} for i in range(6)]
    ds = rd.from_items(rows)
    out = Pipeline.parse(
        "write_ndjson | compress_zstd | decompress_zstd | read_ndjson"
    ).run(ds)
    assert sorted(r["a"] for r in out.take_all()) == list(range(6))

    # gzip too, and unknown codec is loud
    out2 = Pipeline.parse("write_ndjson | compress_gzip").run(ds)
    import gzip

    blobs = [r["line"] for r in out2.take_all()]
    assert all(gzip.decompress(b).startswith(b"{") for b in blobs)

    import pytest as _pytest

    with _pytest.raises(Exception):
        Pipeline.parse("write_ndjson | compress_nope").run(ds).count()


def test_read_grok_and_xsv_validation(ray_session):
    import ray.data as rd

    from tenzir_ray.pipelines.planner import Pipeline

    ds = rd.from_items([{"line": "alice 42"}])
    got = Pipeline.parse(
        'read_grok pattern="%{WORD:user} %{NUMBER:n}"').run(ds).take_all()
    # BOTH captures must survive — a whitespace tokenizer would silently
    # truncate the quoted pattern after the first %{...}
    assert got[0]["user"] == "alice"
    assert int(got[0]["n"]) == 42

    import pytest as _pytest

    with _pytest.raises(ValueError, match="columns="):
        Pipeline.parse("read_csv")
    with _pytest.raises(ValueError, match="delimiter="):
        Pipeline.parse("read_xsv columns=a,b")


def test_more_format_ops_dispatch(ray_session):
    """The full read_*/write_* family is reachable from pipeline text:
    syslog/cef parse duals, tsv/ssv/yaml printers, lz4/bz2 codecs."""
    import ray.data as rd

    from tenzir_ray.pipelines.planner import Pipeline

    rows = [{"a": i, "b": f"w{i}"} for i in range(5)]
    ds = rd.from_items(rows)

    # syslog print → parse round-trip keeps the row count
    back = Pipeline.parse("write_syslog | read_syslog").run(ds)
    assert back.count() == 5

    # CEF: real CEF lines parse into prefix+extension fields
    cef = rd.from_items([{
        "line": "CEF:0|V|P|1.0|42|probe|5|src=10.0.0.1 dst=10.0.0.2"}])
    got = Pipeline.parse("read_cef").run(cef).take_all()
    assert got and len(got) == 1

    # tsv/ssv printers produce one line per row; yaml too
    for fmt in ("write_tsv", "write_ssv", "write_yaml"):
        lines = Pipeline.parse(fmt).run(ds).take_all()
        assert len(lines) >= 5  # yaml may be multi-line per event

    # every Arrow codec round-trips per record
    for codec in ("lz4", "bz2", "brotli"):
        out = Pipeline.parse(
            f"write_ndjson | compress_{codec} | decompress_{codec} "
            "| read_ndjson").run(ds)
        assert sorted(r["a"] for r in out.take_all()) == list(range(5))


def test_pubsub_and_context_from_text(lineitem):
    import uuid

    import pyarrow as pa
    import ray.data as rd

    from tenzir_ray.pipelines import Pipeline

    # unique names per run: topic/context actors are detached and
    # would accumulate state across reruns in one Ray session
    topic = f"tql_text_topic_{uuid.uuid4().hex[:8]}"
    ctx = f"tql_ctx_{uuid.uuid4().hex[:8]}"
    src = rd.from_arrow(pa.table({
        "k": [1, 2, 3], "v": ["a", "b", "c"], "x": [10, 20, 30]}))
    # publish passes through and lands the stream on the topic
    out = Pipeline.parse(f"publish {topic}").run(src).to_pandas()
    assert len(out) == 3
    back = Pipeline.parse(f"subscribe {topic} | select k, x") \
        .run(rd.from_items([{"dummy": 0}])).to_pandas()
    assert sorted(back["k"]) == [1, 2, 3]

    # context family: update from one stream, enrich another — the
    # update step materializes in place, so chaining works in order
    chained = Pipeline.parse(
        f"context::update {ctx}, key=k, value=v | "
        f"context::enrich {ctx}, key=k, out=label").run(src).to_pandas()
    assert sorted(chained["label"]) == ["a", "b", "c"]
    enriched = Pipeline.parse(
        f"context::enrich {ctx}, key=k, out=label").run(
        rd.from_arrow(pa.table({"k": [2, 9]}))).to_pandas()
    got = dict(zip(enriched["k"], enriched["label"]))
    assert got[2] == "b" and pd.isna(got[9])
    Pipeline.parse(f"context::reset {ctx}").run(src).materialize()
    wiped = Pipeline.parse(
        f"context::enrich {ctx}, key=k, out=label").run(
        rd.from_arrow(pa.table({"k": [2]}))).to_pandas()
    assert wiped["label"].isna().all()

    with pytest.raises(ValueError, match="missing value="):
        Pipeline.parse(f"context::update {ctx}, key=k")
    with pytest.raises(ValueError, match="missing context name"):
        Pipeline.parse("context::reset")


def test_lake_import_export_from_text(tmp_path):
    import ray.data as rd

    from tenzir_ray.cdc import generate_wal
    from tenzir_ray.cdc.wal import WalSpec
    from tenzir_ray.pipelines import Pipeline

    wal = tmp_path / "wal"
    lake = tmp_path / "lake"
    generate_wal(str(wal), WalSpec(
        n_events=2000, n_urls=300, n_epochs=2, seed=5))
    dummy = rd.from_items([{"dummy": 0}])

    applied = Pipeline.parse(
        f"import {lake}, wal={wal}").run(dummy).to_pandas()
    assert list(applied["epoch"]) == [0, 1]
    assert applied["events"].sum() == 2000

    state = Pipeline.parse(
        f'export {lake}, columns="url|lang" | head 5').run(
        dummy).to_pandas()
    assert len(state) == 5
    assert "url" in state.columns and "lang" in state.columns
    # as-of time travel from text
    old = Pipeline.parse(f"export {lake}, at=0").run(dummy)
    assert old.count() > 0

    with pytest.raises(ValueError, match="missing lake root"):
        Pipeline.parse("export")
    with pytest.raises(ValueError, match="wal="):
        Pipeline.parse(f"import {lake}")


def test_lake_replicate_from_text(tmp_path):
    """`replicate <dst>, from=<src>` — replica sync from pipeline text."""
    import ray.data as rd

    from tenzir_ray.cdc import Lake, generate_wal
    from tenzir_ray.cdc.wal import WalSpec
    from tenzir_ray.pipelines import Pipeline

    wal = tmp_path / "wal"
    src = tmp_path / "src"
    dst = tmp_path / "dst"
    generate_wal(str(wal), WalSpec(
        n_events=2000, n_urls=300, n_epochs=2, seed=5))
    dummy = rd.from_items([{"dummy": 0}])
    Pipeline.parse(f"import {src}, wal={wal}").run(dummy).to_pandas()

    synced = Pipeline.parse(
        f"replicate {dst}, from={src}").run(dummy).to_pandas()
    assert list(synced["epoch"]) == [0, 1]
    assert Lake(str(dst)).read_table().num_rows == \
        Lake(str(src)).read_table().num_rows
    # converged → empty typed stream
    again = Pipeline.parse(
        f"replicate {dst}, from={src}").run(dummy).to_pandas()
    assert len(again) == 0

    with pytest.raises(ValueError, match="from="):
        Pipeline.parse(f"replicate {dst}")


def test_lake_diff_from_text(tmp_path):
    """`diff <lake>, from=0` — CDC changefeed source from pipeline text."""
    import ray.data as rd

    from tenzir_ray.cdc import generate_wal
    from tenzir_ray.cdc.wal import WalSpec
    from tenzir_ray.pipelines import Pipeline

    wal = tmp_path / "wal"
    lake_root = tmp_path / "lake"
    generate_wal(str(wal), WalSpec(
        n_events=2000, n_urls=300, n_epochs=3, seed=5))
    dummy = rd.from_items([{"dummy": 0}])
    Pipeline.parse(f"import {lake_root}, wal={wal}").run(dummy).to_pandas()

    feed = Pipeline.parse(
        f"diff {lake_root}, from=0, to=2").run(dummy).to_pandas()
    assert len(feed) > 0
    assert set(feed["change"]) <= {"insert", "update", "delete"}
    # bootstrap feed (from omitted) = full live state as inserts
    boot = Pipeline.parse(f"diff {lake_root} | head 5").run(
        dummy).to_pandas()
    assert set(boot["change"]) == {"insert"}

    with pytest.raises(ValueError, match="missing lake root"):
        Pipeline.parse("diff")
    with pytest.raises(ValueError, match="integer epochs"):
        Pipeline.parse(f"diff {lake_root}, from=abc")
    with pytest.raises(ValueError, match="unknown operand"):
        Pipeline.parse(f"diff {lake_root}, since=2")


def test_normalize_and_c4_from_text(ray_session):
    """normalize / c4 reachable from pipeline text (session-4 ops)."""
    import pyarrow as pa

    from tenzir_ray.pipelines.planner import run_pipeline
    from tenzir_ray.text.normalize import normalize_text

    moj = "cafÃ© was here"
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(3), pa.int64()),
        "text": pa.array([moj, "étude body", "  plain  text  "]),
    }))
    out = run_pipeline("normalize text", docs).sort("doc_id").take_all()
    assert out[0]["text"] == "café was here"
    assert out[1]["text"] == normalize_text("étude body")
    assert out[2]["text"] == "  plain  text  "  # no collapse by default
    out = run_pipeline("normalize collapse_ws", docs) \
        .sort("doc_id").take_all()
    assert out[2]["text"] == "plain text"

    good = "alpha beta gamma delta ends here."
    pages = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(2), pa.int64()),
        "text": pa.array([
            good + "\n" + good.replace("alpha", "omega")
            + "\n" + good.replace("alpha", "zeta"),
            "no terminal punctuation line\nshort.",
        ]),
    }))
    out = run_pipeline("c4 min_words=5 min_sentences=3", pages).take_all()
    assert [r["doc_id"] for r in out] == [0]
    out2 = run_pipeline("c4 span_dedup=true", pages).take_all()
    assert [r["doc_id"] for r in out2] == [0]


def test_dsir_from_text(ray_session, tmp_path):
    """dsir reachable from pipeline text, equal to the API call."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tenzir_ray.pipelines.planner import run_pipeline
    from tenzir_ray.text.dsir import dsir_select

    target = pa.table({"text": pa.array(
        ["quick brown fox runs", "lazy dog sleeps well"])})
    tpath = tmp_path / "target.parquet"
    pq.write_table(target, tpath)
    raw = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(4), pa.int64()),
        "text": pa.array([
            "quick brown fox and lazy dog",
            "stock market closed higher today",
            "the fox runs while the dog sleeps",
            "parliament passed the budget bill",
        ])}))
    got = run_pipeline(
        f"dsir target={tpath}, k=2, buckets=256", raw) \
        .select_columns(["doc_id"]).sort("doc_id").take_all()
    exp = dsir_select(
        raw, rd.read_parquet(str(tpath)), 2, num_buckets=256) \
        .select_columns(["doc_id"]).sort("doc_id").take_all()
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in exp]
    assert len(got) == 2


def test_dedup_ingest_from_text(ray_session, tmp_path):
    """dedup_ingest reachable from pipeline text: two epochs through a
    persistent store, cross-epoch exact duplicate dropped."""
    import pyarrow as pa

    from tenzir_ray.pipelines.planner import run_pipeline

    store = tmp_path / "hs"
    e0 = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["same body text here", "unique zero text"])}))
    e1 = rd.from_arrow(pa.table({
        "doc_id": pa.array([2, 3], pa.int64()),
        "text": pa.array(["same body text here", "unique one text"])}))
    s0 = run_pipeline(f"dedup_ingest store={store}, epoch=0", e0).take_all()
    s1 = run_pipeline(f"dedup_ingest store={store}, epoch=1", e1).take_all()
    assert sorted(r["doc_id"] for r in s0) == [0, 1]
    assert sorted(r["doc_id"] for r in s1) == [3]  # 2 is a store dup


def test_html_ops_from_text(ray_session):
    """html_extract / boilerplate reachable from pipeline text
    (session-5 ops), equal to the API calls."""
    import pyarrow as pa

    from tenzir_ray.pipelines.planner import run_pipeline
    from tenzir_ray.text.html import boilerplate_text, html_to_text

    good = ("This is the kind of paragraph that has plenty of the "
            "common function words in it, and it keeps going on about "
            "the topic for long enough that the classifier can see it "
            "is a real block of prose written for a person to read.")
    pages = [
        b"<p>a &amp; b</p><script>no()</script>",
        f'<div><a href="/">nav</a></div><p>{good}</p>'.encode(),
    ]
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(2), pa.int64()),
        "html": pa.array(pages, pa.binary()),
    }))
    out = run_pipeline("html_extract drop_html", docs) \
        .sort("doc_id").take_all()
    assert [r["text"] for r in out] == [html_to_text(p) for p in pages]
    assert "html" not in out[0]

    out = run_pipeline("boilerplate out=main", docs) \
        .sort("doc_id").take_all()
    assert [r["main"] for r in out] == [boilerplate_text(p)
                                        for p in pages]
    assert "nav" not in out[1]["main"] and good in out[1]["main"]


def test_quality_classify_from_text(ray_session, tmp_path):
    """quality_classify reachable from pipeline text (CCNet shape:
    target corpus = positives, the input itself = negatives)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tenzir_ray.pipelines.planner import run_pipeline

    target = tmp_path / "target.parquet"
    pq.write_table(pa.table({"text": pa.array([
        "the cat sat on the mat and the dog sat by the door",
        "it was the best of times and it was the worst of times",
        "we hold these truths to be self evident that all are equal",
    ])}), str(target))
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["the cat and the dog sat by the best door",
                          "zzz qqq www kkk jjj xxx"]),
    }))
    out = run_pipeline(
        f'quality_classify target="{target}", buckets=256, epochs=40',
        docs).sort("doc_id").take_all()
    assert out[0]["quality_score"] > out[1]["quality_score"]
    assert set(out[0]) == {"doc_id", "text", "quality_score",
                           "is_quality"}


def test_linkgraph_from_text(ray_session):
    """extract_links | pagerank reachable from pipeline text."""
    import pyarrow as pa

    from tenzir_ray.pipelines.planner import run_pipeline
    from tenzir_ray.text.sequential import pagerank_seq

    docs = rd.from_arrow(pa.table({
        "url": pa.array(["http://a.x/1", "http://b.x/1"], pa.string()),
        "html": pa.array(['<a href="http://b.x/p">l</a>',
                          '<a href="http://a.x/p">l</a>'], pa.string()),
    }))
    out = run_pipeline("extract_links | pagerank iters=6", docs) \
        .take_all()
    exp = pagerank_seq([("a.x", "b.x"), ("b.x", "a.x")], iters=6)
    assert [(r["host"], r["rank"]) for r in out] == list(zip(
        exp.column("host").to_pylist(), exp.column("rank").to_pylist()))


def test_url_filter_from_text(ray_session, tmp_path):
    """url_filter reachable from pipeline text: inline blocklist,
    block_file, pattern, and invert (allowlist) mode."""
    import pyarrow as pa

    from tenzir_ray.pipelines.planner import run_pipeline

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(4), pa.int64()),
        "url": pa.array([
            "http://ads.bad.example/x",       # suffix-blocked
            "http://good.example/casino/y",   # pattern-blocked
            "http://good.example/ok",
            "http://bad.example/z",           # exact-blocked
        ], pa.string()),
    }))
    out = run_pipeline(
        'url_filter block="bad.example", pattern="/casino/"', docs) \
        .take_all()
    assert [r["doc_id"] for r in out] == [2]

    bl = tmp_path / "ut1.txt"
    bl.write_text("# comment\nbad.example\n")
    out = run_pipeline(f'url_filter block_file="{bl}"', docs).take_all()
    assert sorted(r["doc_id"] for r in out) == [1, 2]

    out = run_pipeline('url_filter block="bad.example" invert', docs) \
        .take_all()
    assert sorted(r["doc_id"] for r in out) == [0, 3]


def test_chunk_from_text(ray_session):
    """chunk reachable from pipeline text, equal to the sequential
    window walk."""
    import pyarrow as pa

    from tenzir_ray.pipelines.planner import run_pipeline
    from tenzir_ray.text.sequential import chunk_tokens_seq

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["one two three four five six seven",
                          "  just   two  "], pa.string()),
    })).repartition(2)
    out = run_pipeline("chunk size=4, overlap=1", docs) \
        .sort(["doc_id", "chunk_idx"]).take_all()
    exp = chunk_tokens_seq([1, 2],
                           ["one two three four five six seven",
                            "  just   two  "], size=4, overlap=1)
    assert [(r["doc_id"], r["chunk_idx"], r["n_tokens"], r["text"])
            for r in out] == list(zip(
        exp.column("doc_id").to_pylist(),
        exp.column("chunk_idx").to_pylist(),
        exp.column("n_tokens").to_pylist(),
        exp.column("text").to_pylist()))


def test_robots_from_text(ray_session, tmp_path):
    """robots reachable from pipeline text (host→body parquet table)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tenzir_ray.pipelines.planner import run_pipeline

    rt = tmp_path / "robots.parquet"
    pq.write_table(pa.table({
        "host": pa.array(["x.example"], pa.string()),
        "body": pa.array(["User-agent: *\nDisallow: /no/\n"],
                         pa.string()),
    }), str(rt))
    docs = rd.from_arrow(pa.table({
        "url": pa.array(["http://x.example/no/1", "http://x.example/ok",
                         "http://other.example/no/2"], pa.string()),
    }))
    out = run_pipeline(f'robots table="{rt}"', docs).take_all()
    assert sorted(r["url"] for r in out) == [
        "http://other.example/no/2", "http://x.example/ok"]
