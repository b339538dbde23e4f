"""Lossless WebP (VP8L) codec: round-trips steering every decoder path,
the 2D distance-code table's structural invariants, container handling,
and the corpus-scale never-crash contract through ImageDecoder."""

import numpy as np
import pyarrow as pa
import pytest

from tenzir_ray.text.webp import (
    _PLANE_CODES,
    _lz77_prefix,
    _lz77_value,
    decode_webp,
    encode_webp_lossless,
)


def _expected(px: np.ndarray) -> np.ndarray:
    """What decode should return for an encoded (h, w, c) input."""
    src = px if px.ndim == 3 else px[:, :, None]
    c = src.shape[2]
    if c == 1:
        return np.repeat(src, 3, axis=2)
    if c == 2:
        return np.concatenate(
            [np.repeat(src[:, :, :1], 3, axis=2), src[:, :, 1:]], axis=2)
    return src


def _roundtrip(px, **kw):
    got, w, h, c = decode_webp(encode_webp_lossless(px, **kw))
    exp = _expected(px)
    assert (h, w) == px.shape[:2]
    assert c == exp.shape[2]
    np.testing.assert_array_equal(got, exp)


def test_webp_plain_and_channels():
    rng = np.random.default_rng(3)
    for shape in ((13, 17, 3), (9, 9, 4), (6, 5, 2), (8, 11), (1, 1, 3)):
        _roundtrip(rng.integers(0, 256, size=shape, dtype=np.uint8))


def test_webp_all_predictor_modes():
    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, size=(13, 18, 3), dtype=np.uint8)
    for mode in range(14):
        _roundtrip(px, predictor=mode, transform_bits=3)


def test_webp_transform_combinations():
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(12, 19, 4), dtype=np.uint8)
    _roundtrip(px, subtract_green=True)
    _roundtrip(px, color_mult=(23, 200, 7))
    _roundtrip(px, subtract_green=True, color_mult=(130, 5, 77),
               predictor=11, transform_bits=2)


def test_webp_palette_all_packings():
    rng = np.random.default_rng(11)
    # packing widths: 2 colors → 1 bit, ≤4 → 2, ≤16 → 4, else none
    for ncol in (2, 3, 4, 5, 16, 17, 200):
        pal = rng.integers(0, 256, size=(ncol, 3), dtype=np.uint8)
        idx = rng.integers(0, ncol, size=(11, 23))
        _roundtrip(pal[idx].astype(np.uint8), palette=True)


def test_webp_cache_and_lz77():
    rng = np.random.default_rng(13)
    stripes = np.repeat(
        rng.integers(0, 256, size=(4, 31, 3), dtype=np.uint8), 5, axis=0)
    _roundtrip(stripes, cache_bits=6)
    _roundtrip(stripes, lz77_dists=(31,))   # vertical → 2D plane code 1
    _roundtrip(stripes, lz77_dists=(1,))    # horizontal → plane code 2
    _roundtrip(stripes, lz77_dists=(97,))   # unmapped → raw dist+120
    _roundtrip(stripes, cache_bits=4, lz77_dists=(1, 31))
    flat = np.full((40, 40, 3), 99, np.uint8)  # one giant run
    _roundtrip(flat, lz77_dists=(1,))


def test_plane_code_table_invariants():
    """The 120-entry 2D distance-code table must be a permutation of
    {y∈0..7} × {x∈-8..7} minus the 8 non-causal (y=0, x≥0) cells,
    ordered by nondecreasing y²+x² with ties y-descending and -x
    before +x — the spec's construction."""
    pairs = [((b >> 4), (b & 0x0F) - 8) for b in _PLANE_CODES]
    assert len(pairs) == 120 and len(set(pairs)) == 120
    assert all(0 <= y <= 7 and -8 <= x <= 7 for y, x in pairs)
    assert not any(y == 0 and x >= 0 for y, x in pairs)
    keys = [(y * y + x * x, -y, (abs(x), x > 0)) for y, x in pairs]
    assert keys == sorted(keys)


def test_lz77_prefix_inverse():
    class _FakeReader:
        def __init__(self, v):
            self.v = v

        def bits(self, k):
            return self.v & ((1 << k) - 1)

    for v in list(range(1, 70)) + [255, 256, 1000, 4096, 1 << 19]:
        sym, nb, ev = _lz77_prefix(v)
        assert _lz77_value(sym, _FakeReader(ev)) == v


def test_webp_container_errors():
    rng = np.random.default_rng(17)
    good = encode_webp_lossless(
        rng.integers(0, 256, size=(6, 6, 3), dtype=np.uint8))
    with pytest.raises(ValueError):
        decode_webp(b"RIFF\x00\x00\x00\x00WAVE")
    # lossy VP8 chunk stays a loud stub
    lossy = good.replace(b"VP8L", b"VP8 ", 1)
    with pytest.raises(NotImplementedError):
        decode_webp(lossy)
    with pytest.raises((ValueError, NotImplementedError)):
        decode_webp(good[:20])  # truncated payload


def test_webp_through_image_decoder_stage():
    from tenzir_ray.text.multimodal import ImageDecoder

    rng = np.random.default_rng(19)
    px = rng.integers(0, 256, size=(7, 9, 3), dtype=np.uint8)
    good = encode_webp_lossless(px, predictor=11, cache_bits=3)
    bad = [good[: len(good) // 2]]
    for off in range(12, min(len(good), 60)):
        b = bytearray(good)
        b[off] ^= 0xFF
        bad.append(bytes(b))
    t = pa.table({"image": pa.array([good] + bad, pa.binary())})
    out = ImageDecoder()(t)  # corrupt rows must null, never raise
    oks = out.column("img_ok").to_pylist()
    assert oks[0] is True
    got = np.frombuffer(
        out.column("pixels").to_pylist()[0], np.uint8).reshape(7, 9, 3)
    np.testing.assert_array_equal(got, px)


def test_webp_dimension_limit_is_loud():
    """14-bit VP8L header fields: oversize inputs must raise, not
    silently wrap (review finding)."""
    with pytest.raises(ValueError):
        encode_webp_lossless(np.zeros((1, 16385, 3), np.uint8))
    with pytest.raises(ValueError):
        encode_webp_lossless(np.zeros((16385, 1, 3), np.uint8))


def test_webp_meta_prefix_groups():
    """Meta-prefix entropy image: two Huffman groups by tile-column
    parity — exercises the decoder's per-tile group lookup, alone and
    composed with transforms."""
    rng = np.random.default_rng(23)
    for shape, mb in (((13, 37, 3), 2), ((20, 20, 4), 3), ((9, 50, 3), 2)):
        _roundtrip(rng.integers(0, 256, size=shape, dtype=np.uint8),
                   meta_bits=mb)
    _roundtrip(rng.integers(0, 256, size=(14, 33, 3), dtype=np.uint8),
               subtract_green=True, predictor=7, meta_bits=2)
    with pytest.raises(ValueError):  # literal-only encoder restriction
        encode_webp_lossless(np.zeros((4, 4, 3), np.uint8), meta_bits=2,
                             cache_bits=3)
