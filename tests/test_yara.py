"""Mini-YARA matcher (operators/yara.cpp subset, no libyara)."""

import pyarrow as pa
import pytest
import ray.data as rd

from tenzir_ray.stages.yara import compile_rules, yara_match

RULES = """
rule Beacon {
    strings:
        $a = "beacon"
        $b = /c2[.-]server/ nocase
    condition:
        $a or $b
}

rule HexMagic {
    strings:
        $h = { 4D 5A ?? 00 }
    condition:
        all of them
}
"""


def test_compile_and_match_text():
    rules = compile_rules(RULES)
    assert [r.name for r in rules] == ["Beacon", "HexMagic"]
    assert rules[0].match(b"a beacon here")
    assert rules[0].match(b"C2-SERVER callback")
    assert not rules[0].match(b"benign")
    assert rules[1].match(b"\x4d\x5a\x99\x00 rest")
    assert not rules[1].match(b"\x4d\x5a\x99\x01")


def test_n_of_them():
    src = """
rule Two {
    strings:
        $x = "aa"
        $y = "bb"
        $z = "cc"
    condition:
        2 of them
}
"""
    r = compile_rules(src)[0]
    assert r.match(b"aa bb")
    assert not r.match(b"aa only")


def test_yara_match_dataset(ray_session):
    rows = [
        {"i": 0, "data": b"a beacon transmission"},
        {"i": 1, "data": b"nothing to see"},
        {"i": 2, "data": b"\x4d\x5a\x07\x00 PE header"},
        {"i": 3, "data": b"C2.server ping"},
    ]
    ds = rd.from_items(rows)
    out = sorted(yara_match(ds, RULES, col="data").take_all(),
                 key=lambda r: r["i"])
    assert [r["i"] for r in out] == [0, 2, 3]
    assert out[0]["yara_rules"] == ["Beacon"]
    assert out[1]["yara_rules"] == ["HexMagic"]
    assert out[2]["yara_rules"] == ["Beacon"]


def test_bad_condition_rejected():
    with pytest.raises(ValueError):
        compile_rules("""
rule Evil {
    strings:
        $a = "x"
    condition:
        __import__
}
""")[0].match(b"x")


def test_yara_nonascii_and_hex_on_binary(ray_session):
    """Review regression: patterns with bytes >= 0x80 must match on
    binary columns (the Arrow kernel path UTF-8-re-encodes str needles,
    so such patterns take the per-value path)."""
    import pyarrow as pa
    import ray.data as rd

    from tenzir_ray.stages.yara import compile_rules, yara_match

    src = """
rule HighBytes {
    strings:
        $h = { DE AD BE EF }
        $t = "café"
    condition:
        $h or $t
}
"""
    rules = compile_rules(src)
    payloads = [b"xx\xde\xad\xbe\xefyy", "café au lait".encode(),
                b"nothing here"]
    # scalar and vectorized paths agree
    scalar = [any(r.match(p) for r in rules) for p in payloads]
    assert scalar == [True, True, False]
    t = pa.table({"data": pa.array(payloads, pa.binary())})
    out = yara_match(rd.from_arrow(t), src, col="data").take_all()
    assert len(out) == 2


def test_nocase_is_ascii_only_on_string_columns(ray_session):
    """ADVICE r04: YARA nocase folds ASCII only — U+212A KELVIN SIGN
    must NOT match a nocase 'k' on the vectorized string path, while
    ASCII K/k must; literal and regex patterns agree with the scalar
    fallback."""
    import pyarrow as pa
    import ray.data as rd

    from tenzir_ray.stages.yara import compile_rules, yara_match

    src = """
rule kelvin {
    strings:
        $a = "kelvin" nocase
    condition:
        any of them
}
"""
    vals = ["say KELVIN now", "say kElViN now", "say Kelvin now",
            "nothing"]
    t = pa.table({"data": pa.array(vals, pa.string())})
    out = yara_match(rd.from_arrow(t), src, col="data").take_all()
    got = sorted(r["data"] for r in out)
    assert got == ["say KELVIN now", "say kElViN now"]

    # scalar path agrees (bytes + re.IGNORECASE is ASCII-only too)
    rules = compile_rules(src)
    scalar = [any(r.match(v.encode("utf-8")) for r in rules)
              for v in vals]
    assert scalar == [True, True, False, False]

    # nocase REGEX routes to the ASCII fallback and stays ASCII-only
    src2 = """
rule kelvin_rx {
    strings:
        $a = /kel+vin/ nocase
    condition:
        any of them
}
"""
    out2 = yara_match(rd.from_arrow(t), src2, col="data").take_all()
    assert sorted(r["data"] for r in out2) \
        == ["say KELVIN now", "say kElViN now"]
