"""Enumeration (dictionary) type + path/file functions
(reference type.hpp:930-944; builtins/functions/path.cpp)."""

import glob
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from tenzir_ray.functions.enumtype import (
    enum_categories,
    from_enum,
    read_enum_parquet,
    to_enum,
    write_enum_parquet,
)
from tenzir_ray.functions.path import (
    file_contents,
    file_extension,
    file_name,
    file_stem,
    parent_dir,
)


def test_enum_roundtrip_and_categories():
    arr = pa.chunked_array([["red", "green", "red"], ["blue", None]])
    e = to_enum(arr)
    assert pa.types.is_dictionary(e.type)
    assert from_enum(e).to_pylist() == ["red", "green", "red", "blue", None]
    assert sorted(enum_categories(e).to_pylist()) == ["blue", "green", "red"]

    # declared category list: fixed indices, unknowns → null
    e2 = to_enum(pa.array(["hi", "lo", "mid", "??"]), ["lo", "mid", "hi"])
    assert e2.indices.to_pylist() == [2, 0, 1, None]
    assert e2.type.index_type == pa.int8()
    assert from_enum(e2).to_pylist() == ["hi", "lo", "mid", None]


def test_enum_parquet_roundtrip_preserves_type(tmp_path):
    t = pa.table({"id": [1, 2, 3],
                  "color": to_enum(pa.array(["r", "g", "r"]))})
    p = str(tmp_path / "e.parquet")
    write_enum_parquet(t, p)
    back = read_enum_parquet(p, ["color"])
    assert pa.types.is_dictionary(back.schema.field("color").type)
    assert from_enum(back.column("color")).to_pylist() == ["r", "g", "r"]


def test_enum_unify_schemas():
    d = pa.dictionary(pa.int8(), pa.string())
    s1 = pa.schema([("k", pa.int64()), ("e", d)])
    s2 = pa.schema([("k", pa.int64()), ("e", d), ("x", pa.float64())])
    uni = pa.unify_schemas([s1, s2], promote_options="permissive")
    assert pa.types.is_dictionary(uni.field("e").type)


def test_enum_column_through_lake(ray_session, tmp_path):
    """A WAL epoch carrying a dictionary-typed column ingests through
    the lake's schema-evolution path; values survive the round-trip
    (parquet decodes dictionary pages to the value type on read — the
    documented type decay; re-encode with to_enum/read_enum_parquet)."""
    from tenzir_ray.cdc import Lake, generate_wal
    from tenzir_ray.cdc.wal import WalSpec, list_epochs

    wal = str(tmp_path / "wal")
    generate_wal(wal, WalSpec(n_events=800, n_urls=150, n_epochs=2, seed=5))
    # rewrite the last epoch's files with an extra dict-typed column
    epochs = list_epochs(wal)
    for f in epochs[-1][1]:
        t = pq.read_table(f)
        lang = pc.cast(pc.multiply(
            pc.cast(pc.equal(pc.bit_wise_and(t["lsn"], 1), 1), pa.int8()),
            pa.scalar(1, pa.int8())), pa.int8())
        cat = to_enum(pc.if_else(pc.equal(lang, 1),
                                 pa.scalar("odd"), pa.scalar("even")))
        pq.write_table(t.append_column("parity", cat), f)
    lake = Lake(str(tmp_path / "lake"), partitions=4, salt=1)
    lake.apply_wal(wal)
    out = lake.read_table()
    assert "parity" in out.column_names
    vals = set(pc.drop_null(out.column("parity")).to_pylist())
    assert vals <= {"odd", "even"} and vals


def test_path_functions():
    paths = pa.array([
        "/logs/app/run.json", "/a/b/c.tar.gz", "rel.txt", "noext",
        "/rooted", "dir/sub/", None,
    ])
    assert file_name(paths).to_pylist() == [
        "run.json", "c.tar.gz", "rel.txt", "noext", "rooted", "", None]
    assert parent_dir(paths).to_pylist() == [
        "/logs/app", "/a/b", ".", ".", "/", "dir/sub", None]
    assert file_stem(paths).to_pylist() == [
        "run", "c.tar", "rel", "noext", "rooted", "", None]
    assert file_extension(paths).to_pylist() == [
        ".json", ".gz", ".txt", "", "", "", None]


def test_file_contents(tmp_path):
    p = tmp_path / "x.txt"
    p.write_text("hello\nworld\n")
    assert file_contents(str(p)) == "hello\nworld\n"
    assert file_contents(str(p), binary=True) == b"hello\nworld\n"


def test_path_funcs_in_tql(ray_session):
    import ray.data as rd

    from tenzir_ray.pipelines import Pipeline

    ds = rd.from_items([{"p": "/data/x/yy.parquet"}])
    out = Pipeline.parse(
        "set f = file_name(p) | set d = parent_dir(p) "
        "| set e = file_extension(p)").run(ds).take_all()
    assert out[0]["f"] == "yy.parquet" and out[0]["d"] == "/data/x"
    assert out[0]["e"] == ".parquet"


def test_url_functions():
    from tenzir_ray.functions.url import (
        url_host, url_normalize, url_parse, url_port, url_scheme,
    )

    a = pa.array([
        "https://Ex.COM:443/path/x?q=1#frag",   # default port + fragment
        "http://A.B:8080/p",                    # explicit port kept
        "http://a.b:80",                        # default port, empty path
        "wss://H/ws",                           # ws family default-less
        "notaurl",
        None,
    ])
    assert url_normalize(a).to_pylist() == [
        "https://ex.com/path/x?q=1", "http://a.b:8080/p", "http://a.b/",
        "wss://h/ws", None, None]
    assert url_port(a).to_pylist() == [443, 8080, 80, None, None, None]
    assert url_host(a).to_pylist() == ["Ex.COM", "A.B", "a.b", "H",
                                       None, None]
    assert url_scheme(a).to_pylist() == ["https", "http", "http", "wss",
                                         None, None]
    s = url_parse(a)
    assert pc.struct_field(s, "fragment").to_pylist()[0] == "frag"


def test_url_funcs_in_tql(ray_session):
    import ray.data as rd

    from tenzir_ray.pipelines import Pipeline

    ds = rd.from_items([{"u": "https://WWW.Foo.org:443/a?x=1#top"}])
    out = Pipeline.parse(
        "set h = url_host(u) | set c = url_normalize(u) "
        "| set p = url_port(u)").run(ds).take_all()
    assert out[0]["h"] == "WWW.Foo.org"
    assert out[0]["c"] == "https://www.foo.org/a?x=1"
    assert out[0]["p"] == 443
