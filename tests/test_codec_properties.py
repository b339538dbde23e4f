"""Property obligations for the image/audio codecs (text/multimodal.py,
text/jpeg.py):

- PNG encode→decode is the identity on ARBITRARY uint8 pixel arrays of
  every channel count (lossless codec, any dimensions ≥ 1)
- GIF LZW encode→decode is the identity on arbitrary index streams
  (including runs that grow the dictionary across width boundaries)
- JPEG encode→decode stays within a quantization-error bound on
  arbitrary pixels at high quality, for every sampling mode, and is
  near-exact on constant images (DC-only blocks)
- ImageDecoder never raises on arbitrary byte strings — garbage decodes
  to img_ok=False rows, never an exception (the corpus-scale contract)
- FLAC encode→decode is the identity on arbitrary int16 PCM for every
  encoder knob, and AudioFeatures survives arbitrary fLaC-tagged bytes

No Ray needed: the codecs are pure functions; ImageDecoder is a plain
callable over an Arrow table."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from tenzir_ray.text.jpeg import decode_jpeg, encode_jpeg
from tenzir_ray.text.multimodal import (
    ImageDecoder,
    _decode_payload,
    _gif_lzw_decode,
    encode_png,
)

_dims = st.tuples(st.integers(1, 24), st.integers(1, 24))


@given(dims=_dims, c=st.sampled_from([1, 2, 3, 4]),
       seed=st.integers(0, 2**31 - 1))
@settings(max_examples=40, deadline=None)
def test_png_roundtrip_is_identity(dims, c, seed):
    h, w = dims
    px = np.random.default_rng(seed).integers(
        0, 256, size=(h, w, c), dtype=np.uint8)
    got, gw, gh, gc = _decode_payload(encode_png(px))
    assert (gw, gh, gc) == (w, h, c)
    np.testing.assert_array_equal(got, px)


@given(data=st.binary(min_size=0, max_size=400),
       min_code=st.integers(2, 8))
@settings(max_examples=60, deadline=None)
def test_gif_lzw_roundtrip_is_identity(data, min_code):
    from tests.test_multimodal import _gif_lzw_encode

    idx = bytes(b % (1 << min_code) for b in data)
    out = _gif_lzw_decode(_gif_lzw_encode(idx, min_code), min_code,
                          len(idx))
    assert bytes(out) == idx


@given(dims=_dims, seed=st.integers(0, 2**31 - 1),
       samp=st.sampled_from([False, True, (2, 1), (1, 2)]))
@settings(max_examples=25, deadline=None)
def test_jpeg_roundtrip_error_bound(dims, seed, samp):
    h, w = dims
    px = np.random.default_rng(seed).integers(
        0, 256, size=(h, w, 3), dtype=np.uint8)
    got, gw, gh, gc = decode_jpeg(encode_jpeg(px, 97, subsample=samp))
    assert (gw, gh, gc) == (w, h, 3)
    if samp is False:
        # random noise is the worst case for DCT quantization
        assert np.abs(got.astype(int) - px.astype(int)).max() <= 64
    else:
        # chroma is box-averaged, so RGB error on random noise is
        # unbounded-ish by design; LUMA is never subsampled — bound it
        def luma(a):
            f = a.astype(np.float64)
            return (0.299 * f[:, :, 0] + 0.587 * f[:, :, 1]
                    + 0.114 * f[:, :, 2])

        assert np.abs(luma(got) - luma(px)).max() <= 64


@given(dims=_dims, val=st.integers(0, 255))
@settings(max_examples=25, deadline=None)
def test_jpeg_constant_image_near_exact(dims, val):
    h, w = dims
    px = np.full((h, w, 3), val, np.uint8)
    got, *_ = decode_jpeg(encode_jpeg(px, 95))
    assert np.abs(got.astype(int) - px.astype(int)).max() <= 2


@given(dims=_dims, seed=st.integers(0, 2**31 - 1),
       samp=st.sampled_from([False, True, (2, 1)]),
       ri=st.sampled_from([0, 2, 5]), q=st.integers(20, 97))
@settings(max_examples=30, deadline=None)
def test_jpeg_progressive_equals_baseline(dims, seed, samp, ri, q):
    """The progressive scan script re-encodes the SAME quantized
    coefficients, so its decode must be bit-identical to baseline —
    on arbitrary pixels, sampling modes, restart intervals, quality."""
    h, w = dims
    px = np.random.default_rng(seed).integers(
        0, 256, size=(h, w, 3), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(px, q, subsample=samp,
                                   restart_interval=ri))
    prog = decode_jpeg(encode_jpeg(px, q, subsample=samp,
                                   restart_interval=ri, progressive=True))
    np.testing.assert_array_equal(base[0], prog[0])
    assert base[1:] == prog[1:]


@given(dims=_dims, depth=st.sampled_from([1, 2, 4]),
       seed=st.integers(0, 2**31 - 1), interlace=st.booleans())
@settings(max_examples=30, deadline=None)
def test_png_sub_byte_roundtrip(dims, depth, seed, interlace):
    from tests.test_multimodal import (
        _adam7_interlace,
        _build_png_deep,
        _pack_rows_subbyte,
    )

    h, w = dims
    vals = np.random.default_rng(seed).integers(
        0, 1 << depth, size=(h, w), dtype=np.uint8)
    raw = (_adam7_interlace(vals[:, :, None], depth) if interlace
           else _pack_rows_subbyte(vals, depth))
    got, gw, gh, gc = _decode_payload(
        _build_png_deep(raw, w, h, 0, depth, interlace=int(interlace)))
    assert (gw, gh, gc) == (w, h, 1)
    np.testing.assert_array_equal(
        got[:, :, 0], vals * (255 // ((1 << depth) - 1)))


@given(dims=_dims, c=st.sampled_from([1, 2, 3, 4]),
       seed=st.integers(0, 2**31 - 1),
       sg=st.booleans(), pred=st.sampled_from([None] + list(range(14))),
       cache=st.sampled_from([0, 4]), lz=st.booleans())
@settings(max_examples=40, deadline=None)
def test_webp_lossless_roundtrip_is_identity(dims, c, seed, sg, pred,
                                             cache, lz):
    from tenzir_ray.text.webp import decode_webp, encode_webp_lossless

    h, w = dims
    px = np.random.default_rng(seed).integers(
        0, 256, size=(h, w, c), dtype=np.uint8)
    buf = encode_webp_lossless(px, subtract_green=sg, predictor=pred,
                               cache_bits=cache,
                               lz77_dists=(1, w) if lz else ())
    got, gw, gh, gc = decode_webp(buf)
    assert (gw, gh) == (w, h)
    if c == 1:
        exp = np.repeat(px, 3, axis=2)
    elif c == 2:
        exp = np.concatenate(
            [np.repeat(px[:, :, :1], 3, axis=2), px[:, :, 1:]], axis=2)
    else:
        exp = px
    np.testing.assert_array_equal(got, exp)


@given(buf=st.binary(min_size=0, max_size=200),
       prefix=st.sampled_from([b"", b"\x89PNG\r\n\x1a\n", b"GIF89a",
                               b"\xff\xd8", b"BM", b"P6", b"FAKE",
                               b"RIFF\x20\x00\x00\x00WEBPVP8L",
                               b"\x00\x00\x01\x00", b"\x00\x00\x02\x00"]))
@settings(max_examples=120, deadline=None)
def test_image_decoder_never_raises(buf, prefix):
    t = pa.table({"image": pa.array([prefix + buf], pa.binary())})
    out = ImageDecoder()(t)  # must not raise
    assert out.num_rows == 1


@given(n=st.integers(0, 700), ch=st.integers(1, 2),
       seed=st.integers(0, 2**31 - 1),
       bs=st.sampled_from([192, 256, 577, 4096]),
       knobs=st.sampled_from([{}, {"use_lpc": True}, {"rice2": True},
                              {"partition_order": 3},
                              {"stereo": "independent"}]))
@settings(max_examples=50, deadline=None)
def test_flac_roundtrip_is_identity(n, ch, seed, bs, knobs):
    from tenzir_ray.text.flac import decode_flac, encode_flac

    rng = np.random.default_rng(seed)
    # mix of smooth and noisy content so every predictor/escape path
    # gets a turn across examples
    base = (4000 * np.sin(np.arange(n)[:, None] / 9.0)
            + rng.integers(-2000, 2000, (n, ch))).astype(np.int64)
    x = np.clip(base, -32768, 32767)
    _, _, out = decode_flac(encode_flac(x, 16000, block_size=bs, **knobs))
    np.testing.assert_array_equal(out, x)


@given(buf=st.binary(min_size=0, max_size=300))
@settings(max_examples=120, deadline=None)
def test_audio_features_never_raises_on_corrupt_flac(buf):
    from tenzir_ray.text.multimodal import AudioFeatures

    t = pa.table({"audio": pa.array([b"fLaC" + buf], pa.binary())})
    out = AudioFeatures()(t)  # corrupt stream → null row, never a crash
    assert out.num_rows == 1


@given(dims=_dims, c=st.sampled_from([3, 4]),
       seed=st.integers(0, 2**31 - 1), smooth=st.booleans())
@settings(max_examples=40, deadline=None)
def test_qoi_roundtrip_is_identity(dims, c, seed, smooth):
    from tenzir_ray.text.raster import decode_qoi, encode_qoi

    h, w = dims
    rng = np.random.default_rng(seed)
    if smooth:  # gradients steer DIFF/LUMA/RUN ops
        yy, xx = np.mgrid[0:h, 0:w]
        px = np.stack([(xx + yy + k * 5) % 256 for k in range(c)],
                      -1).astype(np.uint8)
    else:
        px = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
    got, gw, gh, gc = decode_qoi(encode_qoi(px))
    assert (gw, gh, gc) == (w, h, c)
    np.testing.assert_array_equal(got, px)


@given(dims=_dims, c=st.sampled_from([1, 3, 4]),
       seed=st.integers(0, 2**31 - 1), rle=st.booleans())
@settings(max_examples=40, deadline=None)
def test_tga_roundtrip_is_identity(dims, c, seed, rle):
    from tenzir_ray.text.raster import decode_tga, encode_tga

    h, w = dims
    px = np.random.default_rng(seed).integers(
        0, 256, size=(h, w, c), dtype=np.uint8)
    got, gw, gh, gc = decode_tga(encode_tga(px, rle=rle))
    assert (gw, gh, gc) == (w, h, c)
    np.testing.assert_array_equal(got, px.reshape(h, w, c))


@given(dims=_dims, c=st.sampled_from([1, 3, 4]),
       seed=st.integers(0, 2**31 - 1),
       comp=st.sampled_from(["none", "packbits", "lzw"]))
@settings(max_examples=40, deadline=None)
def test_tiff_roundtrip_is_identity(dims, c, seed, comp):
    from tenzir_ray.text.raster import decode_tiff, encode_tiff

    h, w = dims
    px = np.random.default_rng(seed).integers(
        0, 256, size=(h, w, c), dtype=np.uint8)
    got, gw, gh, gc = decode_tiff(encode_tiff(px, compression=comp))
    assert (gw, gh, gc) == (w, h, c)
    np.testing.assert_array_equal(got, px.reshape(h, w, c))


@given(buf=st.binary(min_size=0, max_size=200),
       prefix=st.sampled_from([b"qoif", b"II*\x00", b"MM\x00*"]),
       footer=st.booleans())
@settings(max_examples=100, deadline=None)
def test_image_decoder_never_raises_on_raster_garbage(buf, prefix, footer):
    payload = prefix + buf
    if footer:  # also fuzz the TGA footer-dispatch path
        payload = buf + b"\x00" * 8 + b"TRUEVISION-XFILE.\x00"
    t = pa.table({"image": pa.array([payload], pa.binary())})
    out = ImageDecoder()(t)  # must not raise
    assert out.num_rows == 1


@given(n=st.integers(1, 600), ch=st.integers(1, 2),
       seed=st.integers(0, 2**31 - 1),
       variant=st.sampled_from([("pcm", 16), ("pcm", 24), ("pcm", 32),
                                ("sowt", None), ("fl32", None),
                                ("fl64", None)]))
@settings(max_examples=50, deadline=None)
def test_aiff_roundtrip_error_bound(n, ch, seed, variant):
    from tenzir_ray.text.multimodal import _decode_aiff, encode_aiff

    rng = np.random.default_rng(seed)
    x = rng.uniform(-0.999, 0.999, (n, ch)).astype(np.float32)
    kind, bits = variant
    if kind == "pcm":
        buf = encode_aiff(x, 8000, bits=bits)
        tol = 2.0 / (1 << (bits - 1))
    else:
        buf = encode_aiff(x, 8000, compression=kind)
        tol = {"sowt": 1 / 32768, "fl32": 0.0, "fl64": 1e-7}[kind]
    rate, got = _decode_aiff(buf)
    assert rate == 8000
    np.testing.assert_allclose(got, x.mean(axis=1), atol=tol + 1e-7)


@given(buf=st.binary(min_size=0, max_size=300),
       form=st.sampled_from([b"AIFF", b"AIFC"]))
@settings(max_examples=100, deadline=None)
def test_audio_features_never_raises_on_corrupt_aiff(buf, form):
    from tenzir_ray.text.multimodal import AudioFeatures

    payload = b"FORM" + len(buf).to_bytes(4, "big") + form + buf
    t = pa.table({"audio": pa.array([payload], pa.binary())})
    out = AudioFeatures()(t)  # corrupt stream → null row, never a crash
    assert out.num_rows == 1
