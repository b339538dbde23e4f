"""QOI / TGA / TIFF codecs: encoder-dual round-trips steering every
decoder path, hand-crafted buffers for the paths the encoders never
emit (TGA bottom-up + 16-bit, TIFF big-endian / predictor / palette /
WhiteIsZero), dispatcher integration, and the corpus-scale
never-crash contract through ImageDecoder."""

import struct

import numpy as np
import pyarrow as pa
import pytest

from tenzir_ray.text.multimodal import ImageDecoder, _decode_payload
from tenzir_ray.text.raster import (
    _packbits_decode,
    _packbits_encode,
    _tiff_lzw_decode,
    _tiff_lzw_encode,
    decode_qoi,
    decode_tga,
    decode_tiff,
    encode_qoi,
    encode_tga,
    encode_tiff,
    is_tga,
)


def _gradient(h, w, c, seed=0):
    """Smooth image: exercises QOI DIFF/LUMA ops and RLE runs."""
    y, x = np.mgrid[0:h, 0:w]
    base = ((x + y) % 256).astype(np.uint8)
    px = np.stack([(base + 7 * k) % 256 for k in range(c)], axis=-1)
    return px.astype(np.uint8)


# ---------------------------------------------------------------------------
# QOI


def test_qoi_roundtrip_shapes():
    rng = np.random.default_rng(11)
    for shape in ((13, 17, 3), (9, 9, 4), (1, 1, 3), (5, 64, 4)):
        px = rng.integers(0, 256, shape, dtype=np.uint8)
        got, w, h, c = decode_qoi(encode_qoi(px))
        assert (h, w, c) == shape
        np.testing.assert_array_equal(got, px)


def test_qoi_op_coverage():
    # constant image → RUN ops (incl. the 62-run split)
    flat = np.full((4, 40, 3), 200, np.uint8)
    got, *_ = decode_qoi(encode_qoi(flat))
    np.testing.assert_array_equal(got, flat)
    # smooth gradient → DIFF/LUMA ops
    grad = _gradient(12, 19, 3)
    got, *_ = decode_qoi(encode_qoi(grad))
    np.testing.assert_array_equal(got, grad)
    # alternating two colors → INDEX ops
    pal = np.zeros((2, 32, 3), np.uint8)
    pal[:, 1::2] = (10, 250, 3)
    got, *_ = decode_qoi(encode_qoi(pal))
    np.testing.assert_array_equal(got, pal)
    # alpha changes → RGBA ops
    rng = np.random.default_rng(5)
    rgba = rng.integers(0, 256, (6, 7, 4), dtype=np.uint8)
    got, w, h, c = decode_qoi(encode_qoi(rgba))
    assert c == 4
    np.testing.assert_array_equal(got, rgba)


def test_qoi_gray_input_promotes():
    g = _gradient(5, 6, 1)[:, :, 0]
    got, w, h, c = decode_qoi(encode_qoi(g))
    assert (h, w, c) == (5, 6, 3)
    np.testing.assert_array_equal(got, np.stack([g] * 3, -1))


def test_qoi_corrupt_is_loud():
    good = encode_qoi(_gradient(4, 4, 3))
    with pytest.raises(ValueError):
        decode_qoi(good[:-8])  # missing end marker
    with pytest.raises(ValueError):
        decode_qoi(good[:10])
    with pytest.raises(ValueError):
        decode_qoi(b"qoif" + b"\x00" * 18)  # zero dimensions
    # truncated op stream, end marker re-attached
    with pytest.raises(ValueError):
        decode_qoi(good[: len(good) // 2] + b"\x00" * 7 + b"\x01")


# ---------------------------------------------------------------------------
# TGA


def test_tga_roundtrip_all_types():
    rng = np.random.default_rng(21)
    for c in (1, 3, 4):
        for rle in (False, True):
            px = rng.integers(0, 256, (11, 7, c), dtype=np.uint8)
            buf = encode_tga(px, rle=rle)
            assert is_tga(buf)
            got, w, h, cc = decode_tga(buf)
            assert (h, w, cc) == (11, 7, c)
            np.testing.assert_array_equal(got, px.reshape(11, 7, c))


def test_tga_rle_runs_and_literals():
    px = np.zeros((3, 200, 3), np.uint8)
    px[:, 50:120] = (9, 8, 7)            # long run (>128, split packets)
    px[1, ::2] = (1, 2, 3)               # literal-heavy row
    got, *_ = decode_tga(encode_tga(px, rle=True))
    np.testing.assert_array_equal(got, px)


def test_tga_bottom_up_and_16bit():
    # hand-crafted uncompressed type-2, 16-bit, bottom-up (desc=0)
    w, h = 3, 2
    vals = np.array([[0x7C00, 0x03E0, 0x001F],
                     [0x7FFF, 0x0000, 0x4210]], np.uint16)
    header = struct.pack("<BBBHHBHHHHBB", 0, 0, 2, 0, 0, 0, 0, 0, w, h, 16, 0)
    buf = header + vals.tobytes() + b"\x00" * 8 + b"TRUEVISION-XFILE.\x00"
    got, gw, gh, c = decode_tga(buf)
    assert (gw, gh, c) == (w, h, 3)
    # bottom-up: file row 0 is the image's bottom row
    np.testing.assert_array_equal(got[1], [[255, 0, 0], [0, 255, 0], [0, 0, 255]])
    np.testing.assert_array_equal(got[0], [[255, 255, 255], [0, 0, 0],
                                           [132, 132, 132]])


def test_tga_corrupt_is_loud():
    good = encode_tga(_gradient(5, 5, 3), rle=True)
    with pytest.raises(ValueError):
        decode_tga(good[:10])
    with pytest.raises(ValueError):
        decode_tga(good[:30])  # truncated RLE stream
    bad = bytearray(good)
    bad[2] = 1  # color-mapped type unsupported
    with pytest.raises(ValueError):
        decode_tga(bytes(bad))


# ---------------------------------------------------------------------------
# TIFF


def test_tiff_roundtrip_compressions():
    rng = np.random.default_rng(31)
    for c in (1, 3, 4):
        for comp in ("none", "packbits", "lzw"):
            px = rng.integers(0, 256, (9, 13, c), dtype=np.uint8)
            got, w, h, cc = decode_tiff(encode_tiff(px, compression=comp))
            assert (h, w, cc) == (9, 13, c)
            np.testing.assert_array_equal(got, px)


def test_tiff_multi_strip():
    # tall thin image forces several strips through the encoder heuristic
    px = _gradient(400, 16, 3)
    buf = encode_tiff(px, compression="packbits")
    got, w, h, c = decode_tiff(buf)
    np.testing.assert_array_equal(got, px)


def test_tiff_lzw_early_change_and_clear():
    # enough distinct content to push the code width past 9 bits and
    # (at 4094 entries) force a mid-stream CLEAR
    rng = np.random.default_rng(41)
    data = bytes(rng.integers(0, 256, 60_000, dtype=np.uint8))
    enc = _tiff_lzw_encode(data)
    assert _tiff_lzw_decode(enc, len(data)) == data
    # highly repetitive data exercises the KwKwK (code == len(table)) path
    rep = b"abcabcabcabc" * 500
    assert _tiff_lzw_decode(_tiff_lzw_encode(rep), len(rep)) == rep


def test_packbits_roundtrip():
    for data in (b"", b"x", b"aaaaab", bytes(range(256)) * 3,
                 b"a" * 300 + bytes(range(40)) + b"z" * 129):
        assert _packbits_decode(_packbits_encode(data), len(data)) == data


def _craft_tiff(bo, entries, strip_data, extra=b""):
    """Minimal single-IFD TIFF with inline-or-overflow tag values."""
    fmt = {3: "H", 4: "I"}
    ifd_off = 8 + len(strip_data)
    n = len(entries)
    overflow_base = ifd_off + 2 + n * 12 + 4
    overflow = bytearray()
    ifd = struct.pack(bo + "H", n)
    for tag, typ, values in sorted(entries):
        size = {3: 2, 4: 4}[typ] * len(values)
        packed = struct.pack(bo + fmt[typ] * len(values), *values)
        if size <= 4:
            val = packed + b"\x00" * (4 - size)
        else:
            val = struct.pack(bo + "I", overflow_base + len(overflow))
            overflow += packed
        ifd += struct.pack(bo + "HHI", tag, typ, len(values)) + val
    ifd += struct.pack(bo + "I", 0)
    magic = struct.pack(bo + "2sHI", b"II" if bo == "<" else b"MM", 42,
                        ifd_off)
    return magic + strip_data + ifd + bytes(overflow) + extra


def test_tiff_big_endian_and_predictor():
    # 2x4 gray, predictor 2 (horizontal differencing), big-endian
    row0 = np.array([10, 5, 251, 3], np.uint8)     # deltas mod 256
    row1 = np.array([100, 200, 200, 56], np.uint8)
    strip = row0.tobytes() + row1.tobytes()
    buf = _craft_tiff(">", [
        (256, 4, [4]), (257, 4, [2]), (258, 3, [8]), (259, 3, [1]),
        (262, 3, [1]), (273, 4, [8]), (277, 3, [1]), (278, 4, [2]),
        (279, 4, [len(strip)]), (317, 3, [2]),
    ], strip)
    got, w, h, c = decode_tiff(buf)
    assert (w, h, c) == (4, 2, 1)
    np.testing.assert_array_equal(
        got[:, :, 0], np.cumsum([row0, row1], axis=1).astype(np.uint8))


def test_tiff_white_is_zero_and_palette():
    strip = bytes([0, 128, 255, 64])
    buf = _craft_tiff("<", [
        (256, 4, [4]), (257, 4, [1]), (258, 3, [8]), (259, 3, [1]),
        (262, 3, [0]), (273, 4, [8]), (277, 3, [1]), (278, 4, [1]),
        (279, 4, [4]),
    ], strip)
    got, *_ = decode_tiff(buf)
    np.testing.assert_array_equal(got[0, :, 0], [255, 127, 0, 191])

    # palette: 16-bit colormap entries scale down by /257
    cmap = [0] * 768
    cmap[1] = 65535            # R of index 1
    cmap[256 + 2] = 32896      # G of index 2 → 128
    strip = bytes([1, 2, 0])
    buf = _craft_tiff("<", [
        (256, 4, [3]), (257, 4, [1]), (258, 3, [8]), (259, 3, [1]),
        (262, 3, [3]), (273, 4, [8]), (277, 3, [1]), (278, 4, [1]),
        (279, 4, [3]), (320, 3, cmap),
    ], strip)
    got, w, h, c = decode_tiff(buf)
    assert c == 3
    np.testing.assert_array_equal(
        got[0], [[255, 0, 0], [0, 128, 0], [0, 0, 0]])


def test_tiff_corrupt_is_loud():
    good = encode_tiff(_gradient(6, 6, 3))
    with pytest.raises(ValueError):
        decode_tiff(good[:6])
    with pytest.raises(ValueError):
        decode_tiff(b"II\x2b\x00" + good[4:])  # bad magic
    # missing required tag: strip offsets
    buf = _craft_tiff("<", [(256, 4, [2]), (257, 4, [1])], b"\x00\x00")
    with pytest.raises(ValueError):
        decode_tiff(buf)
    # unsupported compression id
    bad = _craft_tiff("<", [
        (256, 4, [2]), (257, 4, [1]), (259, 3, [7]), (273, 4, [8]),
        (277, 3, [1]), (279, 4, [2]),
    ], b"\x00\x00")
    with pytest.raises(ValueError):
        decode_tiff(bad)


# ---------------------------------------------------------------------------
# ICO/CUR


def test_ico_roundtrip_dib_and_png():
    from tenzir_ray.text.multimodal import encode_ico

    rng = np.random.default_rng(51)
    for c in (3, 4):
        px = rng.integers(0, 256, (11, 7, c), dtype=np.uint8)
        got, w, h, gc = _decode_payload(encode_ico(px))
        assert (h, w, gc) == (11, 7, c)
        np.testing.assert_array_equal(got, px)
    # PNG-compressed entry routes through the PNG decoder
    px = rng.integers(0, 256, (9, 9, 3), dtype=np.uint8)
    got, w, h, gc = _decode_payload(encode_ico(px, png=True))
    np.testing.assert_array_equal(got, px)
    # 256-wide entries encode as width byte 0
    wide = rng.integers(0, 256, (2, 256, 3), dtype=np.uint8)
    got, w, h, gc = _decode_payload(encode_ico(wide))
    assert (w, h) == (256, 2)
    np.testing.assert_array_equal(got, wide)


def test_ico_picks_largest_entry_and_corrupt():
    from tenzir_ray.text.multimodal import encode_ico

    rng = np.random.default_rng(52)
    small = rng.integers(0, 256, (4, 4, 3), dtype=np.uint8)
    big = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    # hand-stitch a two-entry directory from two single-entry files
    a, b = encode_ico(small), encode_ico(big)
    da, db = a[22:], b[22:]
    hdr = b"\x00\x00\x01\x00\x02\x00"
    ea = struct.pack("<BBBBHHII", 4, 4, 0, 0, 1, 24, len(da), 38)
    eb = struct.pack("<BBBBHHII", 8, 8, 0, 0, 1, 24, len(db), 38 + len(da))
    got, w, h, c = _decode_payload(hdr + ea + eb + da + db)
    assert (w, h) == (8, 8)
    np.testing.assert_array_equal(got, big)

    with pytest.raises(ValueError):
        _decode_payload(b"\x00\x00\x01\x00\x01\x00" + b"\x00" * 16)
    bad = bytearray(a)
    bad[14] = 0xFF  # entry size overruns the file
    with pytest.raises(ValueError):
        _decode_payload(bytes(bad))


# ---------------------------------------------------------------------------
# dispatcher + stage integration


def test_raw_tga_beats_cur_magic():
    # a raw truecolor TGA starts 00 00 02 00 — byte-identical to the
    # CUR magic. The footer check must win or TGA payloads break.
    px = _gradient(7, 5, 3)
    buf = encode_tga(px, rle=False)
    assert buf[:4] == b"\x00\x00\x02\x00"
    got, w, h, c = _decode_payload(buf)
    np.testing.assert_array_equal(got, px)


def test_dispatcher_routes_new_formats():
    px = _gradient(8, 9, 3)
    for buf in (encode_qoi(px), encode_tga(px), encode_tiff(px)):
        got, w, h, c = _decode_payload(buf)
        assert (h, w) == (8, 9)
        np.testing.assert_array_equal(got[:, :, :3], px)


def test_image_decoder_stage_mixed_new_formats(ray_session):
    import ray

    px = _gradient(10, 10, 3)
    rows = [
        {"id": 0, "image": encode_qoi(px)},
        {"id": 1, "image": encode_tga(px, rle=True)},
        {"id": 2, "image": encode_tiff(px, compression="lzw")},
        {"id": 3, "image": b"qoif" + b"\xff" * 30},     # corrupt QOI
        {"id": 4, "image": b"II*\x00" + b"\x00" * 40},  # corrupt TIFF
    ]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    out = ds.map_batches(ImageDecoder(keep_pixels=False), batch_size=5,
                         batch_format="pyarrow").to_pandas()
    out = out.sort_values("id").reset_index(drop=True)
    assert out["img_ok"].tolist() == [True, True, True, False, False]
    assert out["img_width"].tolist()[:3] == [10, 10, 10]
