"""Object-store path: pyarrow S3FileSystem against the in-repo S3 REST
loopback server — multipart upload, ranged GET, ListObjectsV2 — plus
distributed Ray Data read/write through it."""


def test_pyarrow_s3_roundtrip_and_ranged_reads():
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyarrow.fs import FileSelector

    from tenzir_ray.sources.s3stub import loopback_s3_fs, mini_s3_server

    srv, port, objects = mini_s3_server()
    try:
        fs = loopback_s3_fs(port)
        t = pa.table({"a": list(range(1000)),
                      "b": [f"s{i}" for i in range(1000)]})
        # Arrow's S3 output stream is the multipart-upload path
        pq.write_table(t, "bkt/d/p0.parquet", filesystem=fs)
        assert ("bkt", "d/p0.parquet") in objects
        # footer-first parquet open = ranged GETs against the stub
        back = pq.read_table("bkt/d/p0.parquet", filesystem=fs)
        assert back.equals(t)
        # column pruning still goes through (separate ranged reads)
        only_a = pq.read_table("bkt/d/p0.parquet", filesystem=fs,
                               columns=["a"])
        assert only_a.column_names == ["a"]
        infos = fs.get_file_info(FileSelector("bkt/d/"))
        assert [i.path for i in infos] == ["bkt/d/p0.parquet"]
        fs.delete_file("bkt/d/p0.parquet")
        assert ("bkt", "d/p0.parquet") not in objects
    finally:
        srv.shutdown()


def test_ray_data_reads_and_writes_s3(ray_session):
    import ray.data as rd

    from tenzir_ray.sources.s3stub import loopback_s3_fs, mini_s3_server

    srv, port, objects = mini_s3_server()
    try:
        fs = loopback_s3_fs(port)
        rows = [{"id": i, "v": i * 7} for i in range(500)]
        # distributed write: every block PUTs from its own worker
        rd.from_items(rows).repartition(4).write_parquet(
            "bkt/out", filesystem=fs)
        written = [k for (b, k) in objects if b == "bkt"]
        assert len(written) >= 1
        back = rd.read_parquet("bkt/out", filesystem=fs)
        got = sorted(r["id"] for r in back.take_all())
        assert got == list(range(500))
        # predicate+projection pushdown path against the stub
        pruned = rd.read_parquet("bkt/out", filesystem=fs,
                                 columns=["v"])
        assert pruned.schema().names == ["v"]
        assert pruned.count() == 500
    finally:
        srv.shutdown()


def test_s3_stub_edge_cases():
    """Multipart retry safety, invalid ranges, XML-metachar keys."""
    import urllib.request

    import pyarrow as pa
    import pyarrow.parquet as pq

    from tenzir_ray.sources.s3stub import loopback_s3_fs, mini_s3_server

    srv, port, objects = mini_s3_server()
    try:
        fs = loopback_s3_fs(port)
        t = pa.table({"a": [1, 2, 3]})
        # keys with XML metacharacters list correctly
        pq.write_table(t, "bkt/a&b<c.parquet", filesystem=fs)
        from pyarrow.fs import FileSelector

        infos = fs.get_file_info(FileSelector("bkt/"))
        assert [i.path for i in infos] == ["bkt/a&b<c.parquet"]
        assert pq.read_table("bkt/a&b<c.parquet",
                             filesystem=fs).equals(t)

        # a Complete retry with a consumed uploadId must NOT truncate
        # the object: it 404s (NoSuchUpload)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/bkt/a%26b%3Cc.parquet"
            "?uploadId=up-gone", data=b"", method="POST")
        try:
            urllib.request.urlopen(req)
            raise AssertionError("expected 404 NoSuchUpload")
        except urllib.error.HTTPError as e:
            assert e.code == 404
        assert len(objects[("bkt", "a&b<c.parquet")]) > 0

        # range beyond EOF → 416, not a truncated 206
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/bkt/a%26b%3Cc.parquet",
            headers={"Range": "bytes=999999-1000000"})
        try:
            urllib.request.urlopen(req)
            raise AssertionError("expected 416")
        except urllib.error.HTTPError as e:
            assert e.code == 416
    finally:
        srv.shutdown()
