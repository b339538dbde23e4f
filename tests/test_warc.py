"""WARC reader/writer (sources/warc.py) — spec-layout fixtures, gzip
multi-member files, HTTP envelope stripping, Ray round-trip."""

import gzip

import pyarrow as pa

from tenzir_ray.sources.warc import (
    parse_warc_bytes,
    read_warc,
    record_bytes,
    write_warc,
)


def test_record_layout_and_parse():
    rec = record_bytes("http://a.example/x", "2026-01-02T03:04:05Z",
                       b"<html>hi</html>")
    assert rec.startswith(b"WARC/1.0\r\nWARC-Type: response\r\n")
    t = parse_warc_bytes(rec)
    assert t.num_rows == 1
    assert t.column("url").to_pylist() == ["http://a.example/x"]
    assert t.column("payload").to_pylist() == [b"<html>hi</html>"]
    ts = t.column("warc_ts").cast(pa.int64()).to_pylist()[0]
    import datetime

    want = int(datetime.datetime(2026, 1, 2, 3, 4, 5,
                                 tzinfo=datetime.timezone.utc).timestamp())
    assert ts == want * 10**9


def test_http_envelope_optional():
    rec = record_bytes("http://b.example/", "2026-01-01T00:00:00Z", b"BODY")
    raw = parse_warc_bytes(rec, http_payload=False)
    assert raw.column("payload").to_pylist()[0].startswith(b"HTTP/1.1 200")
    stripped = parse_warc_bytes(rec, http_payload=True)
    assert stripped.column("payload").to_pylist() == [b"BODY"]


def test_multi_record_and_gzip_members():
    recs = [record_bytes(f"http://x.example/{i}",
                         "2026-01-01T00:00:00Z",
                         f"page {i}".encode()) for i in range(5)]
    plain = b"".join(recs)
    t = parse_warc_bytes(plain)
    assert t.num_rows == 5
    # Common-Crawl layout: one gzip member per record, concatenated
    gz = b"".join(gzip.compress(r) for r in recs)
    t2 = parse_warc_bytes(gz)
    assert t2.num_rows == 5
    assert t2.column("url").to_pylist() == \
        [f"http://x.example/{i}" for i in range(5)]


def test_non_response_records_kept():
    meta = record_bytes("http://m.example/", "2026-01-01T00:00:00Z",
                        b"k: v", warc_type="warcinfo",
                        content_type="application/warc-fields",
                        http_envelope=False)
    t = parse_warc_bytes(meta)
    assert t.column("warc_type").to_pylist() == ["warcinfo"]
    assert t.column("payload").to_pylist() == [b"k: v"]


def test_garbage_and_truncation():
    assert parse_warc_bytes(b"").num_rows == 0
    assert parse_warc_bytes(b"not a warc").num_rows == 0
    rec = record_bytes("http://t.example/", "2026-01-01T00:00:00Z",
                       b"0123456789")
    t = parse_warc_bytes(rec[:len(rec) - 20])  # cut inside the block
    assert t.num_rows == 1  # truncated block returned short, no crash


def test_roundtrip_ray(ray_session, tmp_path):
    import ray.data as rd

    rows = pa.table({
        "url": pa.array([f"https://s{i}.example.com/p" for i in range(60)]),
        "warc_ts": pa.array([1_760_000_000 + i for i in range(60)],
                            pa.int64()).cast(pa.timestamp("s"))
        .cast(pa.timestamp("ns")),
        "payload": pa.array([f"<html>{i}</html>".encode()
                             for i in range(60)], pa.binary()),
    })
    out = str(tmp_path / "warcs")
    write_warc(rd.from_arrow(rows), out)
    back = read_warc(out).take_all()
    assert len(back) == 60
    got = sorted((r["url"], r["payload"]) for r in back)
    want = sorted(zip(rows.column("url").to_pylist(),
                      rows.column("payload").to_pylist()))
    assert got == want
    # the emitted shape is the engine's native page table
    assert {"url", "warc_ts", "payload"} <= set(back[0].keys())


def test_ingest_warc_crawl_recrawl(ray_session, tmp_path):
    """Crawl snapshot -> lake epoch 0; re-crawl with later warc_ts for a
    subset -> epoch 1; merged state serves the latest text per url, and
    re-ingesting a committed epoch is a no-op (exactly-once)."""
    import ray.data as rd

    from tenzir_ray.cdc import Lake

    def crawl(dirname, pages, base_ts):
        rows = pa.table({
            "url": pa.array([u for u, _ in pages]),
            "warc_ts": pa.array([base_ts] * len(pages), pa.int64())
            .cast(pa.timestamp("s")).cast(pa.timestamp("ns")),
            "payload": pa.array([b for _, b in pages], pa.binary()),
        })
        out = str(tmp_path / dirname)
        write_warc(rd.from_arrow(rows), out)
        return out

    pages0 = [(f"https://w{i}.example.com/", f"<p>v0 page {i}</p>".encode())
              for i in range(40)]
    crawl0 = crawl("c0", pages0, 1_760_000_000)
    # re-crawl: 10 urls changed, 1 new
    pages1 = [(u, b.replace(b"v0", b"v1")) for u, b in pages0[:10]]
    pages1.append(("https://new.example.com/", b"<p>brand new</p>"))
    crawl1 = crawl("c1", pages1, 1_760_086_400)

    lake = Lake(str(tmp_path / "lake"), partitions=4, salt=1)
    r0 = lake.ingest_warc(crawl0, epoch=0)
    assert r0["events"] == 40
    r1 = lake.ingest_warc(crawl1, epoch=1)
    assert r1["events"] == 11

    state = lake.read_table()
    assert state.num_rows == 41
    by_url = {r["url"]: r for r in state.to_pylist()}
    assert "v1" in by_url["https://w3.example.com/"]["text"]
    assert "v0" in by_url["https://w20.example.com/"]["text"]
    assert "brand new" in by_url["https://new.example.com/"]["text"]

    # exactly-once: re-ingest of a committed epoch is skipped
    again = lake.ingest_warc(crawl1, epoch=1)
    assert again.get("skipped") is True
    assert lake.read_table().num_rows == 41


def test_utf8_target_uri():
    rec = record_bytes("https://例え.example/パス", "2026-01-01T00:00:00Z",
                       b"x")
    t = parse_warc_bytes(rec)
    assert t.column("url").to_pylist() == ["https://例え.example/パス"]


def test_ingest_warc_drops_dateless_records(ray_session, tmp_path):
    """A record with a malformed WARC-Date must not enter the lake (its
    null warc_ts would win LWW forever)."""
    import gzip

    from tenzir_ray.cdc import Lake
    from tenzir_ray.sources.warc import record_bytes

    good = record_bytes("https://ok.example/", "2026-01-01T00:00:00Z",
                        b"<p>good</p>")
    bad = record_bytes("https://bad.example/", "NOT-A-DATE", b"<p>bad</p>")
    d = tmp_path / "crawl"
    d.mkdir()
    (d / "part-0.warc.gz").write_bytes(gzip.compress(good)
                                       + gzip.compress(bad))
    lake = Lake(str(tmp_path / "lake"), partitions=2, salt=1)
    r = lake.ingest_warc(str(d), epoch=0)
    assert r["events"] == 1
    urls = lake.read_table().column("url").to_pylist()
    assert urls == ["https://ok.example/"]


def test_warc_fractional_seconds_and_resync():
    """ADVICE r03: WARC/1.1 fractional-second dates must parse (not null
    out and get filtered), and a record with a bad Content-Length or a
    missing header terminator skips to the next record instead of
    silently truncating the rest of the file."""
    from tenzir_ray.sources.warc import parse_warc_bytes, record_bytes

    good1 = record_bytes("https://a.example/", "2017-01-01T00:00:00.123Z",
                         b"<p>a</p>")
    good2 = record_bytes("https://b.example/", "2017-01-01T00:00:01Z",
                         b"<p>b</p>")
    t = parse_warc_bytes(good1 + good2)
    assert t.num_rows == 2
    tss = t.column("warc_ts").to_pylist()
    assert tss[0] is not None and tss[0].microsecond == 123000
    assert tss[1] is not None and tss[1].microsecond == 0

    # bad Content-Length in the middle: later records still parse
    bad = good1.replace(b"Content-Length: ", b"Content-Length: oops", 1)
    t = parse_warc_bytes(bad + good2)
    assert t.column("url").to_pylist() == ["https://b.example/"]

    # header missing its CRLFCRLF terminator before the next record
    broken = good1.split(b"\r\n\r\n")[0]  # header only, no terminator
    t = parse_warc_bytes(broken + b"\r\n" + good2)
    assert t.column("url").to_pylist() == ["https://b.example/"]


def test_warc_numeric_offset_nulls_not_misparses():
    """Review regression: a WARC-Date with a numeric UTC offset must be
    NULL (like the old strict parser), not silently treated as UTC."""
    from tenzir_ray.sources.warc import parse_warc_bytes, record_bytes

    r = record_bytes("https://o.example/", "2017-01-01T12:00:00+05:00",
                     b"<p>x</p>")
    t = parse_warc_bytes(r)
    assert t.num_rows == 1 and t.column("warc_ts").to_pylist() == [None]
