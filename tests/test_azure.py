"""Object-store path: pyarrow AzureFileSystem against the in-repo Azure
Blob REST loopback server — Put Block/Put Block List uploads, ranged
GET, hierarchy listing, lease-guarded delete — plus distributed Ray
Data read/write through it."""


def test_pyarrow_azure_roundtrip_and_ranged_reads():
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyarrow.fs import FileSelector

    from tenzir_ray.sources.azurestub import (
        loopback_azure_fs, mini_azure_server)

    srv, port, blobs = mini_azure_server()
    try:
        fs = loopback_azure_fs(port)
        fs.create_dir("cont", recursive=False)
        t = pa.table({"a": list(range(1000)),
                      "b": [f"s{i}" for i in range(1000)]})
        # Arrow's Azure output stream is the Put Block / Block List path
        pq.write_table(t, "cont/d/p0.parquet", filesystem=fs)
        assert ("cont", "d/p0.parquet") in blobs
        # footer-first parquet open = ranged GETs against the stub
        back = pq.read_table("cont/d/p0.parquet", filesystem=fs)
        assert back.equals(t)
        only_a = pq.read_table("cont/d/p0.parquet", filesystem=fs,
                               columns=["a"])
        assert only_a.column_names == ["a"]
        infos = fs.get_file_info(FileSelector("cont/d/"))
        assert [i.path for i in infos] == ["cont/d/p0.parquet"]
        # delete acquires a blob lease first (stub grants every lease)
        fs.delete_file("cont/d/p0.parquet")
        assert ("cont", "d/p0.parquet") not in blobs
    finally:
        srv.shutdown()


def test_ray_data_reads_and_writes_azure(ray_session):
    import ray.data as rd

    from tenzir_ray.sources.azurestub import (
        loopback_azure_fs, mini_azure_server)

    srv, port, blobs = mini_azure_server()
    try:
        fs = loopback_azure_fs(port)
        fs.create_dir("cont", recursive=False)
        rows = [{"id": i, "v": i * 7} for i in range(500)]
        # distributed write: every block uploads from its own worker
        rd.from_items(rows).repartition(4).write_parquet(
            "cont/out", filesystem=fs)
        written = [n for (c, n) in blobs
                   if c == "cont" and n.endswith(".parquet")]
        assert len(written) >= 1
        back = rd.read_parquet("cont/out", filesystem=fs)
        got = sorted(r["id"] for r in back.take_all())
        assert got == list(range(500))
        pruned = rd.read_parquet("cont/out", filesystem=fs,
                                 columns=["v"])
        assert pruned.schema().names == ["v"]
        assert pruned.count() == 500
    finally:
        srv.shutdown()
