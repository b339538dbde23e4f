"""Long-tail scalar functions: duration constructors/extractors
(std::chrono ratios, duration.cpp:257-269), is_v6, list append/prepend,
xsv/yaml field parse variants, type_of/type_id."""

import pyarrow as pa
import pytest

from tenzir_ray.functions import time as T
from tenzir_ray.functions.ip import ip_parse, is_v4, is_v6
from tenzir_ray.functions.lists import append, prepend
from tenzir_ray.functions.misc import type_id, type_of
from tenzir_ray.functions.parsing import (
    parse_ssv_col,
    parse_tsv_col,
    parse_yaml_col,
    print_yaml_col,
)


def test_duration_ctors_and_counts():
    d = T.hours(pa.array([2, 3]))
    assert d.type == pa.duration("ns")
    assert T.count_minutes(d).to_pylist() == [120.0, 180.0]
    # chrono ratios: months = 2629746 s, years = 31556952 s
    assert T.count_seconds(T.months(pa.array([1]))).to_pylist() == [2629746.0]
    assert T.count_seconds(T.years(pa.array([1]))).to_pylist() == [31556952.0]
    # fractional input + scalar form
    assert T.count_hours(T.days(pa.array([1.5]))).to_pylist() == [36.0]
    assert T.seconds(90).value == 90 * 10**9
    # round trip n -> duration -> n
    assert T.count_weeks(T.weeks(pa.array([5]))).to_pylist() == [5.0]


def test_is_v6():
    ips = ip_parse(pa.array(["10.0.0.1", "2001:db8::1", None]))
    assert is_v4(ips).to_pylist() == [True, False, None]
    assert is_v6(ips).to_pylist() == [False, True, None]


def test_list_append_prepend():
    a = pa.array([[1, 2], [3], [], None], pa.list_(pa.int64()))
    assert append(a, 9).to_pylist() == [[1, 2, 9], [3, 9], [9], None]
    assert prepend(a, 0).to_pylist() == [[0, 1, 2], [0, 3], [0], None]
    s = pa.array([["x"], []], pa.list_(pa.string()))
    assert append(s, "z").to_pylist() == [["x", "z"], ["z"]]


def test_xsv_yaml_field_variants():
    assert parse_tsv_col(pa.array(["1\t2"]), ["a", "b"]).to_pylist() == \
        [{"a": "1", "b": "2"}]
    assert parse_ssv_col(pa.array(["x y"]), ["a", "b"]).to_pylist() == \
        [{"a": "x", "b": "y"}]
    st = parse_yaml_col(pa.array(["a: 1\nb: x", "not: [valid", None]))
    assert st.to_pylist() == [{"a": 1, "b": "x"}, None, None]
    back = print_yaml_col(st).to_pylist()
    assert back[0] == "a: 1\nb: x\n" and back[1] is None


def test_type_of_id():
    a = pa.array([1, 2])
    assert type_of(a).to_pylist() == ["int64", "int64"]
    assert type_id(a).to_pylist()[0] == pa.int64().id


def test_hash_xxh3_loud_absence():
    from tenzir_ray.functions.hashing import hash_xxh3
    try:
        import xxhash  # noqa: F401
        pytest.skip("xxhash present")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        hash_xxh3(pa.array(["x"]))


def test_list_map_where_kernels():
    import pyarrow.compute as pc

    from tenzir_ray.functions.lists import filter_elements, map_elements

    a = pa.array([[1, 2, 3], [4], [], None], pa.list_(pa.int64()))
    assert map_elements(a, lambda f: pc.multiply(f, 10)).to_pylist() == \
        [[10, 20, 30], [40], [], None]
    assert filter_elements(a, lambda f: pc.greater(f, 1)).to_pylist() == \
        [[2, 3], [4], [], None]


def test_list_lambdas_in_tql(ray_session):
    import ray.data as rd

    from tenzir_ray.pipelines import Pipeline

    ds = rd.from_items([{"xs": [1.0, 2.25, 3.5]}])
    out = Pipeline.parse(
        'set d = list_map(xs, "round(x * 2, 1)") '
        '| set big = list_where(xs, "x > 2")').run(ds).take_all()
    assert out[0]["d"] == [2.0, 4.5, 7.0]
    assert out[0]["big"] == [2.25, 3.5]


def test_field_level_print_duals():
    from tenzir_ray.functions.parsing import (
        parse_kv_col,
        print_csv_col,
        print_kv_col,
        print_ndjson_col,
    )

    s = pa.array([{"a": 1, "b": "x y"}, {"a": 2, "b": "q"}])
    kv = print_kv_col(s).to_pylist()
    assert kv == ['a=1 b="x y"', "a=2 b=q"]
    # kv round-trips through its parser dual
    back = parse_kv_col(pa.array(kv)).to_pylist()
    assert [r["b"] for r in back] == ["x y", "q"]
    assert print_csv_col(s).to_pylist() == ['1,"x y"', '2,"q"']
    import json

    assert [json.loads(x) for x in print_ndjson_col(s).to_pylist()] == \
        s.to_pylist()
