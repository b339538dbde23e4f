"""Network kernels: prefix-preserving pseudonymization + community id."""

import pandas as pd
import pyarrow as pa
import ray.data as rd

from tenzir_ray.functions.network import CryptoPrefix, community_id, pseudonymize


def test_prefix_preserving():
    p = CryptoPrefix(b"k1")
    a, b = p.one("10.1.2.3"), p.one("10.1.2.99")     # /24 shared
    c = p.one("192.168.0.1")
    # shared 24-bit prefix preserved in output
    ab = lambda s: "".join(bin(int(x))[2:].zfill(8) for x in s.split("."))
    assert ab(a)[:24] == ab(b)[:24]
    assert ab(a)[:8] != ab(c)[:8] or a.split(".")[0] != c.split(".")[0]
    # deterministic in key; different key → different mapping
    assert CryptoPrefix(b"k1").one("10.1.2.3") == a
    assert CryptoPrefix(b"k2").one("10.1.2.3") != a
    # v6 path works
    assert ":" in CryptoPrefix(b"k1").one("2001:db8::1")


def test_pseudonymize_stage():
    ds = rd.from_pandas(pd.DataFrame({"ip": ["10.0.0.1", "10.0.0.2", None]}))
    out = pseudonymize(ds, "ip", key=b"k").to_pandas()
    assert out["ip"].iloc[:2].notna().all() and out["ip"].iloc[2] is None
    assert set(out["ip"].iloc[:2]) != {"10.0.0.1", "10.0.0.2"}


def test_community_id_known_vector():
    # Community ID v1 spec test vector (public docs):
    # 128.232.110.120:34855 -> 66.35.250.204:80 tcp → 1:LQU9qZlK+B5F3KDmev6m5PMibrg=
    got = community_id(
        pa.array(["128.232.110.120"]), pa.array(["66.35.250.204"]),
        pa.array([34855]), pa.array([80]), proto=6, seed=0,
    )
    assert got.to_pylist() == ["1:LQU9qZlK+B5F3KDmev6m5PMibrg="]
    # symmetric: direction does not matter
    rev = community_id(
        pa.array(["66.35.250.204"]), pa.array(["128.232.110.120"]),
        pa.array([80]), pa.array([34855]), proto=6, seed=0,
    )
    assert rev.to_pylist() == got.to_pylist()
