"""Property-based obligations for the url kernels (hypothesis), in the
style of test_lww_properties: normalization is idempotent, component
split reassembles to the canonical form, and hosts/schemes never leak
structural characters."""

import pyarrow as pa
import pyarrow.compute as pc
from hypothesis import given, settings
from hypothesis import strategies as st

from tenzir_ray.functions.url import url_normalize, url_parse

_scheme = st.sampled_from(["http", "https", "HTTP", "ftp", "wss"])
_host = st.from_regex(r"[A-Za-z0-9][A-Za-z0-9.\-]{0,20}", fullmatch=True)
_port = st.one_of(st.none(), st.integers(1, 65535))
_path = st.from_regex(r"(/[A-Za-z0-9._~\-]{0,8}){0,4}", fullmatch=True)
_query = st.one_of(st.none(),
                   st.from_regex(r"[A-Za-z0-9=&_\-]{0,16}", fullmatch=True))
_frag = st.one_of(st.none(),
                  st.from_regex(r"[A-Za-z0-9\-]{0,8}", fullmatch=True))


@st.composite
def urls(draw):
    s = draw(_scheme)
    h = draw(_host)
    p = draw(_port)
    pth = draw(_path)
    q = draw(_query)
    f = draw(_frag)
    u = f"{s}://{h}"
    if p is not None:
        u += f":{p}"
    u += pth
    if q is not None:
        u += f"?{q}"
    if f is not None:
        u += f"#{f}"
    return u


@settings(max_examples=100, deadline=None)
@given(st.lists(urls(), min_size=1, max_size=20))
def test_normalize_idempotent(us):
    a = pa.array(us, pa.string())
    once = url_normalize(a)
    twice = url_normalize(once)
    assert once.to_pylist() == twice.to_pylist()


@settings(max_examples=100, deadline=None)
@given(st.lists(urls(), min_size=1, max_size=20))
def test_parse_components_reassemble(us):
    a = pa.array(us, pa.string())
    s = url_parse(a)
    canon = url_normalize(a).to_pylist()
    scheme = pc.utf8_lower(pc.struct_field(s, "scheme")).to_pylist()
    host = pc.utf8_lower(pc.struct_field(s, "host")).to_pylist()
    for u, c, sch, h in zip(us, canon, scheme, host):
        assert c is not None, u
        assert c.startswith(f"{sch}://{h}"), (u, c)
        assert "#" not in c  # fragment always stripped
        # structural chars never leak into host
        assert not set(h) & set("/?#:")


@settings(max_examples=100, deadline=None)
@given(st.lists(st.text(max_size=30), min_size=1, max_size=20))
def test_garbage_never_crashes(xs):
    a = pa.array(xs, pa.string())
    out = url_normalize(a).to_pylist()
    parsed = url_parse(a)
    assert len(out) == len(xs) and parsed is not None
