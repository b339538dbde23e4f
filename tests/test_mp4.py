"""ISO-BMFF demux + MJPEG muxer dual + MP3 frame-header parsing."""

import numpy as np
import pyarrow as pa
import pytest

from tenzir_ray.text.jpeg import decode_jpeg, encode_jpeg
from tenzir_ray.text.mp4 import (
    demux_mp4,
    mp4_video_frames,
    mux_mjpeg_mp4,
    parse_mp3,
)


def _mjpeg(n=8, w=24, h=16, seed=7, **kw):
    rng = np.random.default_rng(seed)
    frames = [encode_jpeg(rng.integers(0, 256, size=(h, w, 3),
                                       dtype=np.uint8), 90)
              for _ in range(n)]
    return frames, mux_mjpeg_mp4(frames, w, h, **kw)


def test_mux_demux_roundtrip():
    frames, mp4 = _mjpeg(n=12, fps=6, keyframe_every=3)
    info = demux_mp4(mp4)
    assert info["brand"] == "isom"
    (tr,) = info["tracks"]
    assert tr["handler"] == "vide" and tr["codec"] == "jpeg"
    assert (tr["width"], tr["height"]) == (24, 16)
    assert tr["timescale"] == 6 and tr["duration"] == 12
    assert len(tr["samples"]) == 12
    for i, (off, size, dts, key) in enumerate(tr["samples"]):
        assert mp4[off: off + size] == frames[i]
        assert dts == i
        assert key == (i % 3 == 0)


def test_frame_iterator_decodes_via_jpeg_codec():
    frames, mp4 = _mjpeg(n=5, fps=10)
    out = list(mp4_video_frames(mp4))
    assert [f[0] for f in out] == list(range(5))
    assert abs(out[3][1] - 0.3) < 1e-9  # dts seconds
    for i, (_idx, _dts, _key, sample, codec) in enumerate(out):
        assert codec == "jpeg"
        np.testing.assert_array_equal(decode_jpeg(sample)[0],
                                      decode_jpeg(frames[i])[0])


def test_multi_chunk_stsc_resolution():
    """Hand-build stbl tables with a non-trivial stsc run list: chunks
    1-2 hold 3 samples each, chunk 3 holds the remaining 2."""
    from tenzir_ray.text.mp4 import _resolve_samples

    tr = {"stts": [(8, 5)], "stsc": [(1, 3, 1), (3, 2, 1)],
          "stsz": [10, 11, 12, 13, 14, 15, 16, 17],
          "stco": [100, 200, 300], "stss": {1, 4}}
    samples = _resolve_samples(tr)
    assert [s[0] for s in samples] == [100, 110, 121, 200, 213, 227,
                                       300, 316]
    assert [s[2] for s in samples] == [0, 5, 10, 15, 20, 25, 30, 35]
    assert [s[3] for s in samples] == [True, False, False, True,
                                       False, False, False, False]


def test_sample_video_frames_mp4_and_errors():
    from tenzir_ray.text.multimodal import (
        _decode_payload,
        sample_video_frames,
    )

    frames, mp4 = _mjpeg(n=12)
    t = pa.table({"vid": pa.array([1]), "video": pa.array([mp4],
                                                          pa.binary())})
    out = sample_video_frames(t, payload_col="video", every_n=4)
    assert out.column("frame_idx").to_pylist() == [0, 4, 8]
    px, w, h, c = _decode_payload(out.column("frame").to_pylist()[0])
    np.testing.assert_array_equal(px, decode_jpeg(frames[0])[0])

    # a non-MJPEG codec demuxes but refuses pixel decode loudly
    avc = mp4.replace(b"jpeg", b"avc1", 1)
    t2 = pa.table({"video": pa.array([avc], pa.binary())})
    with pytest.raises(NotImplementedError):
        sample_video_frames(t2, payload_col="video")

    with pytest.raises(ValueError):
        demux_mp4(b"\x00\x00\x00\x08free")  # no ftyp
    with pytest.raises(ValueError):
        demux_mp4(mp4[:40])  # truncated box tree


def _mp3_frame(kbps=128, sr_idx=0, ver=3, layer_bits=1, pad=0,
               mode=0) -> bytes:
    br_idx = {128: 9, 160: 10, 32: 1}[kbps]
    h = (0xFFE00000 | (ver << 19) | (layer_bits << 17) | (br_idx << 12)
         | (sr_idx << 10) | (pad << 9) | (mode << 6))
    sr = (44100, 48000, 32000)[sr_idx]
    size = 144 * kbps * 1000 // sr + pad
    return h.to_bytes(4, "big") + b"\x00" * (size - 4)


def test_parse_mp3():
    body = b"".join(_mp3_frame() for _ in range(40))
    id3 = b"ID3\x04\x00\x00\x00\x00\x00\x0a" + b"\x00" * 10
    meta = parse_mp3(id3 + body + b"TAG" + b"\x00" * 125)
    assert meta["version"] == 1 and meta["layer"] == 3
    assert meta["bitrate_kbps"] == 128 and meta["sample_rate"] == 44100
    assert meta["channels"] == 2 and meta["n_frames"] == 40
    assert abs(meta["duration_s"] - 40 * 1152 / 44100) < 1e-3

    # padded frames change sizes, mono mode detected
    mono = b"".join(_mp3_frame(pad=i % 2, mode=3) for i in range(9))
    m2 = parse_mp3(mono)
    assert m2["channels"] == 1 and m2["n_frames"] == 9

    with pytest.raises(ValueError):
        parse_mp3(b"not audio at all")
    with pytest.raises(ValueError):
        parse_mp3(_mp3_frame()[:30])  # truncated single frame


def test_audio_features_mp3_metadata():
    """AudioFeatures emits real sample_rate/duration for MP3 payloads
    (frame-header walk) with null waveform features."""
    from tenzir_ray.text.multimodal import AudioFeatures, encode_fake_audio

    mp3 = b"".join(_mp3_frame() for _ in range(20))
    wav = encode_fake_audio(1600, sample_rate=8000, seed=3)
    t = pa.table({"audio": pa.array([mp3, wav, b"\xff\xe0 bogus"],
                                    pa.binary())})
    out = AudioFeatures()(t)
    assert out.column("audio_ok").to_pylist() == [True, True, False]
    assert out.column("sample_rate").to_pylist()[0] == 44100
    assert abs(out.column("duration_s").to_pylist()[0]
               - 20 * 1152 / 44100) < 1e-3
    assert out.column("audio_rms").to_pylist()[0] is None
    assert out.column("audio_rms").to_pylist()[1] is not None


def test_parse_mp3_tolerates_sync_looking_trailing_garbage():
    """Trailing bytes that match the 11-bit sync but carry invalid
    fields (free bitrate, reserved samplerate) must not void the
    already-parsed frames (review finding)."""
    body = b"".join(_mp3_frame() for _ in range(7))
    meta = parse_mp3(body + b"\xff\xfb\x00\x00garbage")
    assert meta["n_frames"] == 7
