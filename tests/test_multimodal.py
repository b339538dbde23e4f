"""Multimodal plumbing: binary payload columns through actor-pool stages.

The codecs are deterministic fakes (container libs not available) — these
tests pin the REAL parts: schema in/out, actor batching, null/undecodable
handling, frame explosion layout."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from tenzir_ray.text.multimodal import (
    ImageDecoder,
    ImageFeatures,
    ImageResizer,
    _decode_audio,
    decode_images,
    encode_fake_image,
    sample_video_frames,
)


def _image_ds(n=20):
    rows = [
        {"id": i, "image": encode_fake_image(16 + i, 8 + i, 3, seed=i)}
        for i in range(n)
    ]
    rows.append({"id": n, "image": None})
    rows.append({"id": n + 1, "image": b"\x89PNG..."})  # real format → stub skips
    return rd.from_items(rows)


def test_decode_images_pipeline():
    out = decode_images(_image_ds(), batch_size=8, concurrency=2).to_pandas()
    ok = out[out["img_ok"]]
    assert len(ok) == 20
    assert (ok["img_width"] == 16 + ok["id"]).all()
    assert (ok["img_height"] == 8 + ok["id"]).all()
    bad = out[~out["img_ok"]]
    assert len(bad) == 2 and bad["pixels"].isna().all()


def test_resize_and_features_chain():
    ds = decode_images(_image_ds(6), batch_size=4, concurrency=2)
    ds = ds.map_batches(ImageResizer, fn_constructor_kwargs={"out_w": 4, "out_h": 4},
                        batch_format="pyarrow", batch_size=4, concurrency=2)
    ds = ds.map_batches(ImageFeatures, batch_format="pyarrow", batch_size=4,
                        concurrency=2)
    out = ds.to_pandas()
    ok = out[out["img_ok"]]
    assert all(len(b) == 4 * 4 * 3 for b in ok["pixels_resized"])
    assert all(len(f) == 6 for f in ok["img_features"])  # mean+std per channel
    f = np.array(list(ok["img_features"].iloc[0]))
    assert ((f >= 0) & (f <= 1)).all()


def test_decoder_deterministic():
    d = ImageDecoder()
    t = pa.table({"image": [encode_fake_image(8, 8, 3, seed=1)] * 2})
    a, b = d(t), d(t)
    assert a.column("pixels").to_pylist() == b.column("pixels").to_pylist()


def test_video_frame_sampling():
    frame = encode_fake_image(4, 4, 1, seed=7)
    video = frame * 25  # 25 identical fake frames
    ds = rd.from_items([{"vid": 0, "video": video}, {"vid": 1, "video": None}])
    out = ds.map_batches(
        lambda t: sample_video_frames(t, payload_col="video", every_n=10),
        batch_format="pyarrow",
    ).to_pandas()
    assert list(out["frame_idx"]) == [0, 10, 20]
    assert (out["vid"] == 0).all()
    assert all(bytes(f)[:4] == b"FAKE" for f in out["frame"])


def test_real_codec_clearly_stubbed():
    # MP4 and Matroska demux for real since round 5 — a malformed box
    # tree / EBML run is a loud ValueError; unknown containers (FLV)
    # remain NotImplementedError
    with pytest.raises(ValueError):
        sample_video_frames(
            pa.table({"video": [b"\x00\x00\x00 ftypmp42..."]}),
            payload_col="video")
    with pytest.raises(ValueError):
        sample_video_frames(
            pa.table({"video": [b"\x1aE\xdf\xa3 webm-ish bytes"]}),
            payload_col="video")
    with pytest.raises(NotImplementedError):
        sample_video_frames(
            pa.table({"video": [b"FLV\x01\x05 flash video"]}),
            payload_col="video")


def test_audio_features(ray_session):
    import numpy as np
    import ray.data as rd

    from tenzir_ray.text.multimodal import (
        AudioFeatures, encode_fake_audio, extract_audio_features,
    )

    rows = [{"aid": i, "audio": encode_fake_audio(16000 + i * 100, seed=i)}
            for i in range(20)]
    ds = rd.from_items(rows)
    out = extract_audio_features(ds, batch_size=8, concurrency=(1, 2))
    got = sorted(out.take_all(), key=lambda r: r["aid"])
    assert all(r["audio_ok"] for r in got)
    assert got[0]["sample_rate"] == 16000
    assert abs(got[0]["duration_s"] - 1.0) < 0.01
    assert 0.1 < got[0]["audio_rms"] < 0.5


def test_audio_compressed_codec_clearly_stubbed():
    import pyarrow as pa
    import pytest as _pt

    from tenzir_ray.text.multimodal import AudioFeatures

    # MP3 PCM decode stays a stub, but since round 5 the stage emits
    # metadata-only rows (or ok=False for unparseable frames) instead
    # of raising; Ogg vorbis/opus likewise get metadata rows
    # (test_ogg.py) — AAC remains a loud NotImplementedError stub
    t = pa.table({"audio": pa.array([b"ID3\x04...mp3 frames"], pa.binary())})
    out = AudioFeatures()(t)
    assert out.column("audio_ok").to_pylist() == [False]
    with _pt.raises(NotImplementedError):
        AudioFeatures()(pa.table({"audio": pa.array(
            [b"ADIF\x00 aac-ish payload"], pa.binary())}))


def test_real_wav_and_bmp_ppm_decode():
    """Uncompressed containers decode for REAL (pure numpy — no codec
    libs needed): RIFF/WAVE PCM, BMP (BI_RGB), binary PPM/PGM."""
    import struct

    import numpy as np
    import pyarrow as pa

    from tenzir_ray.text.multimodal import (
        AudioFeatures, ImageDecoder, _decode_payload,
    )

    # --- WAV: 16-bit stereo PCM, 0.5 s @ 8 kHz sine
    rate, n = 8000, 4000
    tgrid = np.arange(n) / rate
    mono = (np.sin(2 * np.pi * 440 * tgrid) * 12000).astype(np.int16)
    stereo = np.repeat(mono, 2).tobytes()
    fmt = struct.pack("<HHIIHH", 1, 2, rate, rate * 4, 4, 16)
    wav = (b"RIFF" + struct.pack("<I", 36 + len(stereo)) + b"WAVE"
           + b"fmt " + struct.pack("<I", len(fmt)) + fmt
           + b"data" + struct.pack("<I", len(stereo)) + stereo)
    out = AudioFeatures()(pa.table({"audio": pa.array([wav], pa.binary())}))
    assert out.column("audio_ok").to_pylist() == [True]
    assert out.column("sample_rate").to_pylist() == [rate]
    assert abs(out.column("duration_s")[0].as_py() - 0.5) < 1e-6
    assert abs(out.column("audio_rms")[0].as_py()
               - 12000 / 32768 / np.sqrt(2)) < 0.01

    # --- BMP: 3x2 24-bit bottom-up with row padding
    w, h = 3, 2
    rgb = np.arange(w * h * 3, dtype=np.uint8).reshape(h, w, 3)
    stride = (w * 3 + 3) & ~3
    rows = b""
    for y in range(h - 1, -1, -1):  # bottom-up, BGR
        row = rgb[y][:, ::-1].tobytes()
        rows += row + b"\x00" * (stride - len(row))
    bmp = (b"BM" + struct.pack("<IHHI", 54 + len(rows), 0, 0, 54)
           + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows),
                         2835, 2835, 0, 0) + rows)
    px, dw, dh, dc = _decode_payload(bmp)
    assert (dw, dh, dc) == (w, h, 3)
    assert np.array_equal(px, rgb)

    # --- PPM with a comment line
    ppm = b"P6\n# a comment\n3 2\n255\n" + rgb.tobytes()
    px2, dw2, dh2, dc2 = _decode_payload(ppm)
    assert (dw2, dh2, dc2) == (w, h, 3) and np.array_equal(px2, rgb)
    # PGM gray
    pgm = b"P5 2 2 255\n" + bytes([0, 64, 128, 255])
    px3, dw3, dh3, dc3 = _decode_payload(pgm)
    assert (dw3, dh3, dc3) == (2, 2, 1) and px3[1, 1, 0] == 255

    # 16-bit PGM/PPM: big-endian samples reduce to the top byte
    s16 = np.array([[0, 0x1234], [0xABCD, 0xFFFF]], np.uint16)
    pgm16 = b"P5 2 2 65535\n" + s16.astype(">u2").tobytes()
    px4, dw4, dh4, dc4 = _decode_payload(pgm16)
    assert (dw4, dh4, dc4) == (2, 2, 1)
    np.testing.assert_array_equal(px4[:, :, 0], (s16 >> 8).astype(np.uint8))
    rgb16 = np.repeat(s16[:, :, None], 3, axis=2)
    ppm16 = b"P6 2 2 65535\n" + rgb16.astype(">u2").tobytes()
    px5, dw5, dh5, dc5 = _decode_payload(ppm16)
    assert (dw5, dh5, dc5) == (2, 2, 3)
    np.testing.assert_array_equal(px5, (rgb16 >> 8).astype(np.uint8))

    # ImageDecoder stage consumes them alongside FAKE/null rows
    t = pa.table({"image": pa.array([bmp, ppm, None, b"\x89PNG..."],
                                    pa.binary())})
    d = ImageDecoder()(t)
    assert d.column("img_ok").to_pylist() == [True, True, False, False]
    assert d.column("img_width").to_pylist() == [3, 3, None, None]


def test_corrupt_containers_null_not_crash():
    """Review regression: corrupt/truncated containers must null the
    row (ok=False), not kill the stage; compressed codecs still raise
    loudly; 8-bit BMPs map through their palette."""
    import struct

    import numpy as np
    import pyarrow as pa
    import pytest as _pt

    from tenzir_ray.text.multimodal import (
        AudioFeatures, ImageDecoder, _decode_payload,
    )

    # corrupt images: junk after magic, truncated pixel data
    trunc_bmp = (b"BM" + struct.pack("<IHHI", 200, 0, 0, 54)
                 + struct.pack("<IiiHHIIiiII", 40, 100, 100, 1, 24, 0,
                               0, 0, 0, 0, 0) + b"\x01\x02")
    t = pa.table({"image": pa.array(
        [b"BM" + b"\x00" * 10, trunc_bmp, b"P6 bogus"], pa.binary())})
    d = ImageDecoder()(t)
    assert d.column("img_ok").to_pylist() == [False, False, False]

    # corrupt audio: empty, short, malformed RIFF → null rows
    t = pa.table({"audio": pa.array([b"", b"RI", b"RIFF....JUNK"],
                                    pa.binary())})
    out = AudioFeatures()(t)
    assert out.column("audio_ok").to_pylist() == [False, False, False]
    # MP3-looking payload without a parseable frame: metadata decode
    # fails soft (ok=False row); non-MP3 compressed codecs stay loud
    out2 = AudioFeatures()(pa.table({"audio": pa.array(
        [b"ID3\x04tag"], pa.binary())}))
    assert out2.column("audio_ok").to_pylist() == [False]
    # truncated FLAC: the real codec raises ValueError → soft-fail row
    out3 = AudioFeatures()(pa.table({"audio": pa.array(
        [b"fLaC\x00\x00\x00\x22"], pa.binary())}))
    assert out3.column("audio_ok").to_pylist() == [False]
    # Ogg with a non-FLAC codec stays loud at the PCM level...
    from tenzir_ray.text.ogg import mux_ogg

    vorbis_id = (b"\x01vorbis" + b"\x00" * 4 + bytes([2])
                 + (44100).to_bytes(4, "little") + b"\x00" * 13 + b"\x01")
    ogg_vorbis = mux_ogg([vorbis_id], [0])
    with _pt.raises(NotImplementedError):
        _decode_audio(ogg_vorbis)
    # ...but AudioFeatures gives it a REAL metadata row (MP3 policy)
    out4 = AudioFeatures()(pa.table({"audio": pa.array(
        [ogg_vorbis], pa.binary())}))
    assert out4.column("audio_ok").to_pylist() == [True]
    assert out4.column("sample_rate").to_pylist() == [44100]
    # corrupt Ogg page (bad CRC) → soft-fail row
    out5 = AudioFeatures()(pa.table({"audio": pa.array(
        [b"OggS\x00\x02" + b"\x00" * 30], pa.binary())}))
    assert out5.column("audio_ok").to_pylist() == [False]

    # paletted 8-bit BMP: indices map through the (inverted) palette
    w = h = 2
    pal = b"".join(bytes([255 - i, 255 - i, 255 - i, 0])
                   for i in range(256))
    stride = (w + 3) & ~3
    rows = b""
    for y in (1, 0):  # bottom-up
        rows += bytes([y * 2, y * 2 + 1]) + b"\x00" * (stride - w)
    data_off = 14 + 40 + len(pal)
    bmp8 = (b"BM" + struct.pack("<IHHI", data_off + len(rows), 0, 0,
                                data_off)
            + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, len(rows),
                          0, 0, 256, 0) + pal + rows)
    px, dw, dh, dc = _decode_payload(bmp8)
    assert (dw, dh, dc) == (2, 2, 3)
    assert px[0, 0, 0] == 255 and px[1, 1, 0] == 252  # inverted ramp


# ------------------------------------------------------------------ PNG


def _png_filter_rows(px: np.ndarray, ftypes: list[int]) -> bytes:
    """Forward-filter pixels per RFC 2083 §6 (the easy direction,
    implemented independently in the test) and build raw scanlines."""
    h, w, c = px.shape
    rows = px.reshape(h, w * c).astype(np.int16)
    out = bytearray()
    prior = np.zeros(w * c, np.int16)
    for y in range(h):
        row, f = rows[y], ftypes[y]
        left = np.roll(row, c)
        left[:c] = 0
        up = prior
        ul = np.roll(prior, c)
        ul[:c] = 0
        if f == 0:
            filt = row
        elif f == 1:
            filt = row - left
        elif f == 2:
            filt = row - up
        elif f == 3:
            filt = row - ((left + up) >> 1)
        else:  # paeth
            p = left + up - ul
            pa_, pb, pc_ = np.abs(p - left), np.abs(p - up), np.abs(p - ul)
            pred = np.where((pa_ <= pb) & (pa_ <= pc_), left,
                            np.where(pb <= pc_, up, ul))
            filt = row - pred
        out += bytes([f]) + (filt % 256).astype(np.uint8).tobytes()
        prior = row
    return bytes(out)


def _build_png(raw: bytes, w: int, h: int, ctype: int,
               plte: bytes | None = None) -> bytes:
    import struct as _s
    import zlib

    def chunk(typ, data):
        return (_s.pack(">I", len(data)) + typ + data
                + _s.pack(">I", zlib.crc32(typ + data)))

    png = b"\x89PNG\r\n\x1a\n"
    png += chunk(b"IHDR", _s.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0))
    if plte is not None:
        png += chunk(b"PLTE", plte)
    png += chunk(b"IDAT", zlib.compress(raw))
    png += chunk(b"IEND", b"")
    return png


def test_png_all_filter_types_roundtrip():
    from tenzir_ray.text.multimodal import _decode_payload

    rng = np.random.default_rng(7)
    for c, ctype in ((1, 0), (2, 4), (3, 2), (4, 6)):
        px = rng.integers(0, 256, size=(5, 4, c), dtype=np.uint8)
        raw = _png_filter_rows(px, [0, 1, 2, 3, 4])
        got, w, h, ch = _decode_payload(_build_png(raw, 4, 5, ctype))
        assert (w, h, ch) == (4, 5, c)
        np.testing.assert_array_equal(got.reshape(5, 4, c), px)


def test_png_encoder_decoder_roundtrip():
    from tenzir_ray.text.multimodal import _decode_payload, encode_png

    rng = np.random.default_rng(11)
    for c in (1, 2, 3, 4):
        px = rng.integers(0, 256, size=(7, 3, c), dtype=np.uint8)
        got, w, h, ch = _decode_payload(encode_png(px))
        assert (w, h, ch) == (3, 7, c)
        np.testing.assert_array_equal(got, px)


def test_png_palette_and_stubs():
    from tenzir_ray.text.multimodal import _decode_payload

    # palette: index i -> (i, 255-i, 7)
    idx = np.array([[0, 1], [2, 3]], np.uint8)[:, :, None]
    plte = b"".join(bytes([i, 255 - i, 7]) for i in range(4))
    raw = _png_filter_rows(idx, [0, 0])
    got, w, h, c = _decode_payload(_build_png(raw, 2, 2, 3, plte=plte))
    assert (w, h, c) == (2, 2, 3)
    assert got[0, 1].tolist() == [1, 254, 7]
    assert got[1, 1].tolist() == [3, 252, 7]

    # 1x1 interlaced and 16-bit streams decode for real since round 5
    import struct as _s
    import zlib

    def chunk(typ, data):
        return (_s.pack(">I", len(data)) + typ + data
                + _s.pack(">I", zlib.crc32(typ + data)))

    sig = b"\x89PNG\r\n\x1a\n"
    interlaced = (sig + chunk(
        b"IHDR", _s.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 1))
        + chunk(b"IDAT", zlib.compress(b"\x00\x2a")) + chunk(b"IEND", b""))
    got, w, h, c = _decode_payload(interlaced)
    assert (w, h, c) == (1, 1, 1) and got[0, 0, 0] == 0x2A
    deep = (sig + chunk(
        b"IHDR", _s.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"\x00\xab\xcd")) + chunk(b"IEND", b""))
    got, w, h, c = _decode_payload(deep)
    assert (w, h, c) == (1, 1, 1) and got[0, 0, 0] == 0xAB


def _build_png_deep(raw: bytes, w: int, h: int, ctype: int, depth: int,
                    interlace: int = 0, plte: bytes | None = None) -> bytes:
    import struct as _s
    import zlib

    def chunk(typ, data):
        return (_s.pack(">I", len(data)) + typ + data
                + _s.pack(">I", zlib.crc32(typ + data)))

    png = b"\x89PNG\r\n\x1a\n"
    png += chunk(b"IHDR",
                 _s.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace))
    if plte is not None:
        png += chunk(b"PLTE", plte)
    png += chunk(b"IDAT", zlib.compress(raw))
    png += chunk(b"IEND", b"")
    return png


def _pack_rows_subbyte(vals: np.ndarray, depth: int) -> bytes:
    """Bit-pack (h, w) sample values MSB-first into filter-0 scanlines
    — independent test-side forward direction."""
    h, w = vals.shape
    out = bytearray()
    for y in range(h):
        bits = ((vals[y][:, None] >> np.arange(depth - 1, -1, -1)) & 1)
        out += b"\x00" + np.packbits(bits.ravel().astype(np.uint8)).tobytes()
    return bytes(out)


def test_png_sub_byte_gray_depths():
    from tenzir_ray.text.multimodal import _decode_payload

    rng = np.random.default_rng(23)
    for depth in (1, 2, 4):
        vals = rng.integers(0, 1 << depth, size=(5, 7), dtype=np.uint8)
        png = _build_png_deep(_pack_rows_subbyte(vals, depth), 7, 5, 0, depth)
        got, w, h, c = _decode_payload(png)
        assert (w, h, c) == (7, 5, 1)
        scale = 255 // ((1 << depth) - 1)
        np.testing.assert_array_equal(got[:, :, 0], vals * scale)


def test_png_sub_byte_palette():
    from tenzir_ray.text.multimodal import _decode_payload

    rng = np.random.default_rng(29)
    plte = bytes(rng.integers(0, 256, size=48, dtype=np.uint8))
    lut = np.frombuffer(plte, np.uint8).reshape(16, 3)
    for depth in (2, 4):
        idx = rng.integers(0, 1 << depth, size=(4, 5), dtype=np.uint8)
        png = _build_png_deep(_pack_rows_subbyte(idx, depth), 5, 4, 3,
                              depth, plte=plte)
        got, w, h, c = _decode_payload(png)
        assert (w, h, c) == (5, 4, 3)
        np.testing.assert_array_equal(got, lut[idx])


def test_png_16bit_keeps_top_byte():
    from tenzir_ray.text.multimodal import _decode_payload

    rng = np.random.default_rng(31)
    for ch, ctype in ((1, 0), (3, 2), (4, 6)):
        px16 = rng.integers(0, 1 << 16, size=(3, 4, ch), dtype=np.uint16)
        rows = b"".join(
            b"\x00" + px16[y].astype(">u2").tobytes() for y in range(3))
        got, w, h, c = _decode_payload(_build_png_deep(rows, 4, 3, ctype, 16))
        assert (w, h, c) == (4, 3, ch)
        np.testing.assert_array_equal(got, (px16 >> 8).astype(np.uint8))


def _adam7_interlace(px: np.ndarray, depth: int = 8) -> bytes:
    """Test-side Adam7 forward pass: serialize the seven pass
    sub-images in spec order, each with its own filtered scanlines."""
    passes = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
    out = bytearray()
    for x0, y0, dx, dy in passes:
        sub = px[y0::dy, x0::dx]
        if sub.shape[0] == 0 or sub.shape[1] == 0:
            continue
        if depth == 8:
            ftypes = [i % 5 for i in range(sub.shape[0])]
            out += _png_filter_rows(np.ascontiguousarray(sub), ftypes)
        else:
            out += _pack_rows_subbyte(sub[:, :, 0], depth)
    return bytes(out)


def test_png_adam7_roundtrip():
    from tenzir_ray.text.multimodal import _decode_payload

    rng = np.random.default_rng(37)
    # 10x9 exercises every pass; 3x2 exercises empty-pass skipping.
    for (hh, ww) in ((9, 10), (2, 3)):
        for c, ctype in ((1, 0), (3, 2), (4, 6)):
            px = rng.integers(0, 256, size=(hh, ww, c), dtype=np.uint8)
            png = _build_png_deep(_adam7_interlace(px), ww, hh, ctype, 8,
                                  interlace=1)
            got, w, h, ch = _decode_payload(png)
            assert (w, h, ch) == (ww, hh, c)
            np.testing.assert_array_equal(got, px)


def test_png_adam7_sub_byte():
    from tenzir_ray.text.multimodal import _decode_payload

    rng = np.random.default_rng(41)
    vals = rng.integers(0, 4, size=(9, 11), dtype=np.uint8)
    png = _build_png_deep(_adam7_interlace(vals[:, :, None], 2), 11, 9, 0,
                          2, interlace=1)
    got, w, h, c = _decode_payload(png)
    assert (w, h, c) == (11, 9, 1)
    np.testing.assert_array_equal(got[:, :, 0], vals * 85)


def test_png_through_decoder_stage():
    from tenzir_ray.text.multimodal import ImageDecoder, encode_png

    rng = np.random.default_rng(3)
    pngs = [encode_png(rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8))
            for _ in range(4)]
    t = pa.table({"image": pa.array(pngs, pa.binary())})
    out = ImageDecoder()(t)
    assert out.column("img_ok").to_pylist() == [True] * 4
    assert out.column("img_width").to_pylist() == [5] * 4
    assert out.column("img_height").to_pylist() == [6] * 4
    assert out.column("img_channels").to_pylist() == [3] * 4


# ----------------------------------------------------------- WAV formats


def _wav(fmt: int, bits: int, data: bytes, rate=8000, nch=1) -> bytes:
    import struct as _s
    fmtc = _s.pack("<HHIIHH", fmt, nch, rate, rate * nch * bits // 8,
                   nch * bits // 8, bits)
    body = (b"fmt " + _s.pack("<I", len(fmtc)) + fmtc
            + b"data" + _s.pack("<I", len(data)) + data)
    return b"RIFF" + _s.pack("<I", 4 + len(body)) + b"WAVE" + body


def test_wav_float_and_g711():
    from tenzir_ray.text.multimodal import _decode_wav

    # IEEE float 32/64 pass through
    x = np.array([0.5, -0.25, 0.0], np.float32)
    r, got = _decode_wav(_wav(3, 32, x.tobytes()))
    np.testing.assert_allclose(got, x)
    r, got = _decode_wav(_wav(3, 64, x.astype(np.float64).tobytes()))
    np.testing.assert_allclose(got, x)

    # µ-law anchor codes from G.711 (Sun reference table):
    #   0x00 → -32124, 0x80 → +32124, 0xFF → 0
    r, got = _decode_wav(_wav(7, 8, bytes([0x00, 0x80, 0xFF])))
    np.testing.assert_allclose(
        got * 32768.0, [-32124.0, 32124.0, 0.0])

    # A-law anchors: 0x55 → -8, 0xD5 → +8, 0x2A → -32256, 0xAA → +32256
    r, got = _decode_wav(_wav(6, 8, bytes([0x55, 0xD5, 0x2A, 0xAA])))
    np.testing.assert_allclose(
        got * 32768.0, [-8.0, 8.0, -32256.0, 32256.0])

    # EXTENSIBLE wrapper resolves through the SubFormat tag
    import struct as _s
    sub = _s.pack("<H", 3) + b"\x00\x00" + b"\x00" * 12
    fmtc = _s.pack("<HHIIHH", 0xFFFE, 1, 8000, 32000, 4, 32) \
        + _s.pack("<H", 22) + _s.pack("<HI", 32, 0x4) + sub[:16]
    data = np.array([0.125], np.float32).tobytes()
    body = (b"fmt " + _s.pack("<I", len(fmtc)) + fmtc
            + b"data" + _s.pack("<I", len(data)) + data)
    buf = b"RIFF" + _s.pack("<I", 4 + len(body)) + b"WAVE" + body
    r, got = _decode_wav(buf)
    np.testing.assert_allclose(got, [0.125])

    # unknown compressed format stays a loud stub
    with pytest.raises(NotImplementedError):
        _decode_wav(_wav(0x55, 8, b"\x00\x00"))  # MP3-in-WAV


# ------------------------------------------------------------------ AIFF


def test_aiff_roundtrip_all_variants():
    from tenzir_ray.text.multimodal import _decode_aiff, encode_aiff

    rng = np.random.default_rng(7)
    x = (rng.standard_normal(400) * 0.3).clip(-0.999, 0.999) \
        .astype(np.float32)
    # plain AIFF PCM at every depth (quantization error bound = 1 LSB)
    for bits in (8, 16, 24, 32):
        rate, got = _decode_aiff(encode_aiff(x, 8000, bits=bits))
        assert rate == 8000
        np.testing.assert_allclose(got, x, atol=2.0 / (1 << (bits - 1)))
    # AIFC: byte-swapped 16-bit, big-endian floats
    for comp, tol in (("sowt", 1 / 32768), ("fl32", 0), ("fl64", 1e-7)):
        rate, got = _decode_aiff(encode_aiff(x, 44100, compression=comp))
        assert rate == 44100
        np.testing.assert_allclose(got, x, atol=tol)
    # G.711 inside AIFC: round-trip within segment quantization (~6%)
    for comp in ("alaw", "ulaw"):
        rate, got = _decode_aiff(encode_aiff(x, 8000, compression=comp))
        np.testing.assert_allclose(got, x, atol=0.05)
    # stereo averages to mono
    st = np.stack([x, -x], -1)
    rate, got = _decode_aiff(encode_aiff(st, 8000, bits=16))
    np.testing.assert_allclose(got, np.zeros_like(x), atol=1 / 32768)


def test_g711_encoders_invert_tables():
    from tenzir_ray.text.multimodal import (
        _ALAW_TABLE, _ULAW_TABLE, _alaw_encode, _ulaw_encode)

    codes = np.arange(256, dtype=np.uint8)
    # A-law: every code's decoded value encodes back to itself
    np.testing.assert_array_equal(_alaw_encode(_ALAW_TABLE), codes)
    # µ-law: 0x7F and 0xFF both decode to 0; the encoder picks 0xFF
    enc = _ulaw_encode(_ULAW_TABLE)
    assert enc[0x7F] == 0xFF
    mask = codes != 0x7F
    np.testing.assert_array_equal(enc[mask], codes[mask])


def test_aiff_f80_and_corrupt():
    import struct

    from tenzir_ray.text.multimodal import (
        _decode_aiff, _f80_pack, _f80_unpack, encode_aiff)

    for v in (8000.0, 44100.0, 48000.0, 22050.5, 1.0, 0.0):
        assert _f80_unpack(_f80_pack(v)) == v
    good = encode_aiff(np.zeros(10, np.float32), 8000)
    with pytest.raises(ValueError):
        _decode_aiff(good[:20])            # truncated chunk
    with pytest.raises(ValueError):
        _decode_aiff(b"FORM\x00\x00\x00\x04JUNK")
    with pytest.raises(ValueError):        # SSND without COMM
        _decode_aiff(b"FORM" + struct.pack(">I", 16) + b"AIFF"
                     + b"SSND" + struct.pack(">I", 8) + b"\x00" * 8)
    # unknown AIFC compression stays a loud stub
    bad = encode_aiff(np.zeros(4, np.float32), 8000, compression="sowt") \
        .replace(b"sowt", b"ima4")
    with pytest.raises(NotImplementedError):
        _decode_aiff(bad)


def test_aiff_through_audio_features():
    from tenzir_ray.text.multimodal import AudioFeatures, encode_aiff

    x = np.sin(np.linspace(0, 40 * np.pi, 8000)).astype(np.float32) * 0.5
    t = pa.table({"audio": pa.array(
        [encode_aiff(x, 8000, bits=16),
         encode_aiff(x, 8000, compression="ulaw")], pa.binary())})
    out = AudioFeatures()(t)
    assert out.column("audio_ok").to_pylist() == [True, True]
    assert out.column("sample_rate").to_pylist() == [8000, 8000]
    assert abs(out.column("duration_s")[0].as_py() - 1.0) < 0.01


# ------------------------------------------------------------------ GIF


def _gif_lzw_encode(idx: bytes, min_code: int) -> bytes:
    """Independent forward GIF-LZW encoder (test-side reference):
    hash-dict, CLEAR first, EOI last, width grows with the table."""
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    out, cur, nbits = bytearray(), 0, 0
    width = min_code + 1

    def emit(code):
        nonlocal cur, nbits
        cur |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(cur & 0xFF)
            cur >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    nxt = eoi + 1
    emit(clear)
    s = b""
    for ch in idx:
        s2 = s + bytes([ch])
        if s2 in table:
            s = s2
            continue
        emit(table[s])
        table[s2] = nxt
        nxt += 1
        if nxt - 1 == (1 << width) and width < 12:
            width += 1
        if nxt >= 4096:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            nxt = eoi + 1
            width = min_code + 1
        s = bytes([ch])
    if s:
        emit(table[s])
    emit(eoi)
    if nbits:
        out.append(cur & 0xFF)
    return bytes(out)


def _build_gif(idx: np.ndarray, pal: np.ndarray, interlaced=False,
               animated=False) -> bytes:
    import struct as _s

    h, w = idx.shape
    n = len(pal)
    depth = max(1, int(np.ceil(np.log2(n))))
    min_code = max(2, depth)
    gct = pal.astype(np.uint8).tobytes() + b"\x00" * ((2 << (depth - 1)) * 3 - n * 3) \
        if n == (1 << depth) else pal.astype(np.uint8).tobytes()
    gif = b"GIF89a" + _s.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0) + gct
    if animated:  # NETSCAPE looping extension, then a GCE per frame
        gif += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
        gif += b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    rows = idx
    if interlaced:
        order = np.concatenate([np.arange(0, h, 8), np.arange(4, h, 8),
                                np.arange(2, h, 4), np.arange(1, h, 2)])
        rows = idx[order]
    data = _gif_lzw_encode(rows.astype(np.uint8).tobytes(), min_code)
    gif += _s.pack("<BHHHHB", 0x2C, 0, 0, w, h,
                   0x40 if interlaced else 0) + bytes([min_code])
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        gif += bytes([len(chunk)]) + chunk
    gif += b"\x00"
    if animated:  # second (different) frame: decoder must return frame 1
        gif += b"\x21\xf9\x04\x00\x00\x00\x00\x00"
        data2 = _gif_lzw_encode(
            ((rows + 1) % len(pal)).astype(np.uint8).tobytes(), min_code)
        gif += _s.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0) + bytes([min_code])
        for i in range(0, len(data2), 255):
            chunk = data2[i:i + 255]
            gif += bytes([len(chunk)]) + chunk
        gif += b"\x00"
    return gif + b"\x3b"


def test_gif_roundtrip():
    from tenzir_ray.text.multimodal import _decode_payload

    rng = np.random.default_rng(13)
    pal = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, size=(9, 7), dtype=np.uint8)
    for interlaced in (False, True):
        got, w, h, c = _decode_payload(_build_gif(idx, pal,
                                                  interlaced=interlaced))
        assert (w, h, c) == (7, 9, 3)
        np.testing.assert_array_equal(got, pal[idx])

    # repetitive data exercises real dictionary growth
    idx2 = np.tile(np.arange(8, dtype=np.uint8), (32, 16))[:, :100]
    got, w, h, c = _decode_payload(_build_gif(idx2, pal))
    np.testing.assert_array_equal(got, pal[idx2])

    # animated: first frame wins
    got, w, h, c = _decode_payload(_build_gif(idx, pal, animated=True))
    np.testing.assert_array_equal(got, pal[idx])


# ----------------------------------------------------------------- JPEG


def _smooth_rgb(h, w, seed=0):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([xx * 255 // max(w - 1, 1),
                     yy * 255 // max(h - 1, 1),
                     (xx + yy) * 255 // max(h + w - 2, 1)],
                    -1).astype(np.uint8)


def test_jpeg_roundtrip_444():
    from tenzir_ray.text.jpeg import decode_jpeg, encode_jpeg

    # flat blocks survive near-exactly (DC-only)
    flat = np.full((16, 24, 3), [120, 64, 200], np.uint8)
    got, w, h, c = decode_jpeg(encode_jpeg(flat, 95))
    assert (w, h, c) == (24, 16, 3)
    assert np.abs(got.astype(int) - flat.astype(int)).max() <= 1

    # smooth gradients within tight quantization error, odd dimensions
    px = _smooth_rgb(33, 47)
    got, w, h, c = decode_jpeg(encode_jpeg(px, 90))
    assert (w, h, c) == (47, 33, 3)
    assert np.abs(got.astype(int) - px.astype(int)).max() <= 6

    # grayscale single-component scan
    g = px[:, :, 1]
    got, w, h, c = decode_jpeg(encode_jpeg(g, 90))
    assert (w, h, c) == (47, 33, 1)
    assert np.abs(got[:, :, 0].astype(int) - g.astype(int)).max() <= 4


def test_jpeg_420_and_restarts():
    from tenzir_ray.text.jpeg import decode_jpeg, encode_jpeg

    px = _smooth_rgb(31, 45)
    got, w, h, c = decode_jpeg(encode_jpeg(px, 90, subsample=True))
    assert (w, h, c) == (45, 31, 3)
    assert np.abs(got.astype(int) - px.astype(int)).max() <= 12

    got, w, h, c = decode_jpeg(
        encode_jpeg(px, 90, subsample=True, restart_interval=2))
    assert np.abs(got.astype(int) - px.astype(int)).max() <= 12

    got, w, h, c = decode_jpeg(encode_jpeg(px, 90, restart_interval=3))
    assert np.abs(got.astype(int) - px.astype(int)).max() <= 6


def test_jpeg_progressive_roundtrip_and_dispatch():
    from tenzir_ray.text.jpeg import decode_jpeg, encode_jpeg
    from tenzir_ray.text.multimodal import ImageDecoder, _decode_payload

    # progressive decodes BIT-IDENTICALLY to baseline (same quantized
    # coefficients, different scan layering) across shapes/subsampling
    rng = np.random.default_rng(43)
    for hh, ww, nc in ((16, 16, 3), (17, 13, 3), (23, 9, 1)):
        for samp in (False, True):
            if nc == 1 and samp:
                continue
            px = rng.integers(0, 256, size=(hh, ww, nc), dtype=np.uint8)
            base = decode_jpeg(encode_jpeg(px, 80, subsample=samp))
            prog = decode_jpeg(
                encode_jpeg(px, 80, subsample=samp, progressive=True))
            np.testing.assert_array_equal(base[0], prog[0])
            assert base[1:] == prog[1:]

    # restart markers inside progressive scans (reset pred + EOB run)
    px = _smooth_rgb(31, 45)
    base = decode_jpeg(encode_jpeg(px, 90, subsample=True))
    prog = decode_jpeg(encode_jpeg(px, 90, subsample=True,
                                   restart_interval=2, progressive=True))
    np.testing.assert_array_equal(base[0], prog[0])

    # flat image: long EOB runs spanning many blocks
    flat = np.full((64, 48, 3), 200, np.uint8)
    np.testing.assert_array_equal(
        decode_jpeg(encode_jpeg(flat, progressive=True))[0],
        decode_jpeg(encode_jpeg(flat))[0])

    # a baseline file mislabeled SOF2 has an illegal progressive scan
    # header (Ss=0, Se=63) — rejected loudly
    buf = bytearray(encode_jpeg(_smooth_rgb(16, 16), 90))
    i = bytes(buf).index(b"\xff\xc0")
    buf[i + 1] = 0xC2
    with pytest.raises(ValueError):
        decode_jpeg(bytes(buf))

    # dispatcher routes FFD8 and the actor stage decodes a mixed batch
    px = _smooth_rgb(12, 10)
    got, w, h, c = _decode_payload(encode_jpeg(px, 95))
    assert (w, h, c) == (10, 12, 3)
    t = pa.table({"image": pa.array(
        [encode_jpeg(px, 90), encode_jpeg(px, 90, subsample=True),
         encode_jpeg(px, 90, progressive=True)],
        pa.binary())})
    out = ImageDecoder()(t)
    assert out.column("img_ok").to_pylist() == [True, True, True]
    assert out.column("img_width").to_pylist() == [10, 10, 10]


def test_corrupt_compressed_payloads_null_not_crash():
    """The review's fuzz findings: corrupt PNG/JPEG/GIF rows must set
    img_ok=False, never kill the decode stage."""
    from tenzir_ray.text.jpeg import encode_jpeg
    from tenzir_ray.text.multimodal import ImageDecoder, encode_png

    rng = np.random.default_rng(17)
    png = encode_png(rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8))
    jpg = encode_jpeg(_smooth_rgb(8, 8), 90)
    prog = encode_jpeg(_smooth_rgb(8, 8), 90, progressive=True)
    pal = rng.integers(0, 256, size=(4, 3), dtype=np.uint8)
    gif = _build_gif(np.zeros((4, 4), np.uint8), pal)

    bad = []
    for base in (png, jpg, prog, gif):
        bad.append(base[: len(base) // 2])          # truncation
        bad.append(base[:-7])                       # tail truncation
        for off in range(8, min(len(base), 64)):    # bit flips
            b = bytearray(base)
            b[off] ^= 0xFF
            bad.append(bytes(b))
    # SOS-before-SOF and missing-table JPEGs (review findings)
    i = jpg.index(b"\xff\xc0")
    bad.append(jpg[:i] + jpg[jpg.index(b"\xff\xda"):])
    t = pa.table({"image": pa.array(bad, pa.binary())})
    out = ImageDecoder()(t)  # must not raise
    oks = out.column("img_ok").to_pylist()
    assert len(oks) == len(bad)
    # valid payloads survive alongside
    t2 = pa.table({"image": pa.array([png, jpg, gif] + bad[:5],
                                     pa.binary())})
    out2 = ImageDecoder()(t2)
    assert out2.column("img_ok").to_pylist()[:3] == [True, True, True]


def test_jpeg_422_and_vertical_subsampling():
    from tenzir_ray.text.jpeg import decode_jpeg, encode_jpeg

    px = _smooth_rgb(29, 43)
    for samp in ((2, 1), (1, 2)):
        got, w, h, c = decode_jpeg(encode_jpeg(px, 90, subsample=samp))
        assert (w, h, c) == (43, 29, 3)
        assert np.abs(got.astype(int) - px.astype(int)).max() <= 12


def _gif_frame_block(idx: np.ndarray, min_code: int, left=0, top=0,
                     lct: np.ndarray | None = None,
                     transp: int | None = None, disposal: int = 0) -> bytes:
    import struct as _s

    h, w = idx.shape
    out = b""
    gp = (disposal << 2) | (1 if transp is not None else 0)
    out += bytes([0x21, 0xF9, 0x04, gp, 0, 0, transp or 0, 0])
    lpack = 0
    if lct is not None:
        depth = max(1, int(np.ceil(np.log2(len(lct)))))
        lpack = 0x80 | (depth - 1)
    out += _s.pack("<BHHHHB", 0x2C, left, top, w, h, lpack)
    if lct is not None:
        out += lct.astype(np.uint8).tobytes()
    data = _gif_lzw_encode(idx.astype(np.uint8).tobytes(), min_code)
    out += bytes([min_code])
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out += bytes([len(chunk)]) + chunk
    return out + b"\x00"


def test_gif_animation_composition_and_frame_sampling():
    """Multi-frame GIF: sub-rectangle frames, transparency and disposal
    compose on the logical-screen canvas; sample_video_frames emits
    every n-th composed frame as a decodable payload."""
    import struct as _s

    from tenzir_ray.text.multimodal import (
        ImageDecoder, _gif_frames, sample_video_frames,
    )

    pal = np.array([[10, 10, 10], [200, 0, 0], [0, 200, 0], [0, 0, 200]],
                   np.uint8)
    gif = b"GIF89a" + _s.pack("<HHBBB", 6, 4, 0x80 | 1, 0, 0) \
        + pal.tobytes()
    # frame 0: full canvas of color 1
    gif += _gif_frame_block(np.full((4, 6), 1, np.uint8), 2)
    # frame 1: 2x2 patch of color 2 at (2,1), disposal 3 (restore prev)
    gif += _gif_frame_block(np.full((2, 2), 2, np.uint8), 2,
                            left=2, top=1, disposal=3)
    # frame 2: 2x3 patch at (0,0), color 3 with index 0 transparent holes
    patch = np.array([[3, 0, 3], [0, 3, 0]], np.uint8)
    gif += _gif_frame_block(patch, 2, transp=0)
    gif += b"\x3b"

    frames = dict(_gif_frames(gif))
    assert sorted(frames) == [0, 1, 2]
    np.testing.assert_array_equal(frames[0], pal[np.full((4, 6), 1)])
    exp1 = pal[np.full((4, 6), 1)].copy()
    exp1[1:3, 2:4] = pal[2]
    np.testing.assert_array_equal(frames[1], exp1)
    # disposal 3 restored frame 0's canvas before frame 2 drew
    exp2 = pal[np.full((4, 6), 1)].copy()
    mask = patch != 0
    exp2[0:2, 0:3][mask] = pal[3]
    np.testing.assert_array_equal(frames[2], exp2)

    # frame sampling every 2nd frame → 0 and 2, decodable payloads
    t = pa.table({"video": pa.array([gif], pa.binary()),
                  "vid": pa.array([7], pa.int64())})
    s = sample_video_frames(t, payload_col="video", every_n=2)
    assert s.column("frame_idx").to_pylist() == [0, 2]
    assert s.column("vid").to_pylist() == [7, 7]
    d = ImageDecoder(payload_col="frame")(s)
    assert d.column("img_ok").to_pylist() == [True, True]
    assert d.column("img_width").to_pylist() == [6, 6]
    got2 = np.frombuffer(d.column("pixels")[1].as_py(),
                         np.uint8).reshape(4, 6, 3)
    np.testing.assert_array_equal(got2, exp2)


def test_jpeg_non_interleaved_sequential_scans():
    """T.81 allows baseline files with one non-interleaved scan per
    component; the general scan walker must decode them identically
    to the single interleaved scan (same coefficients)."""
    from tenzir_ray.text.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(47)
    for shape in ((17, 13, 3), (23, 9, 1)):
        for samp in (False, True):
            if shape[2] == 1 and samp:
                continue
            px = rng.integers(0, 256, size=shape, dtype=np.uint8)
            a = decode_jpeg(encode_jpeg(px, 85, subsample=samp))
            b = decode_jpeg(encode_jpeg(px, 85, subsample=samp,
                                        separate_scans=True,
                                        restart_interval=3))
            np.testing.assert_array_equal(a[0], b[0])
            assert a[1:] == b[1:]
