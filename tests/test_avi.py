"""AVI (RIFF) demuxer: mux/demux round-trips for MJPEG and
uncompressed-DIB streams, idx1 keyframe flags, DIB pixel duals,
frame sampling through the shared video stage, and the loud-stub /
never-crash contracts."""

import struct

import numpy as np
import pyarrow as pa
import pytest

from tenzir_ray.text.avi import (
    avi_video_frames,
    demux_avi,
    dib_to_rgb,
    mux_avi,
    rgb_to_dib,
)
from tenzir_ray.text.jpeg import decode_jpeg, encode_jpeg
from tenzir_ray.text.multimodal import sample_video_frames


def _frames_px(n, w, h, seed=0):
    out = []
    for f in range(n):
        yy, xx = np.mgrid[0:h, 0:w]
        out.append(np.stack([(xx * 11 + f * 17 + seed) % 256,
                             (yy * 7 + f * 3) % 256,
                             np.full((h, w), f % 256)], -1).astype(np.uint8))
    return out


def test_mux_demux_mjpeg_roundtrip():
    w, h = 14, 10
    px = _frames_px(5, w, h)
    jpegs = [encode_jpeg(p, 90) for p in px]
    buf = mux_avi(jpegs, w, h, fps=8, keyframe_every=2)
    info = demux_avi(buf)
    assert (info["width"], info["height"]) == (w, h)
    assert info["codec"] == "jpeg"
    assert info["fps"] == 8.0
    assert len(info["samples"]) == 5
    # sample bytes are the exact muxed JPEGs; idx1 keyframe cadence holds
    for i, (off, size, key) in enumerate(info["samples"]):
        assert buf[off:off + size] == jpegs[i]
        assert key == (i % 2 == 0)


def test_avi_frame_iterator_decodes_via_jpeg():
    w, h = 9, 7
    px = _frames_px(3, w, h)
    buf = mux_avi([encode_jpeg(p, 95) for p in px], w, h, fps=4)
    for i, pts, key, sample, codec in avi_video_frames(buf):
        assert codec == "jpeg" and key
        assert pts == pytest.approx(i / 4.0)
        got, gw, gh, c = decode_jpeg(sample)
        assert (gw, gh) == (w, h)


def test_dib_pixel_duals_and_raw_stream():
    # odd width exercises the 4-byte stride padding
    px = _frames_px(4, 5, 6, seed=3)
    for p in px:
        np.testing.assert_array_equal(dib_to_rgb(rgb_to_dib(p), 5, 6), p)
    buf = mux_avi([rgb_to_dib(p) for p in px], 5, 6, fps=2, codec="DIB ")
    info = demux_avi(buf)
    assert info["codec"] == "raw"
    got = [dib_to_rgb(buf[o:o + s], 5, 6) for o, s, _ in info["samples"]]
    for g, p in zip(got, px):
        np.testing.assert_array_equal(g, p)


def test_sample_video_frames_avi_both_codecs():
    w, h = 8, 6
    px = _frames_px(6, w, h)
    mj = mux_avi([encode_jpeg(p, 92) for p in px], w, h, fps=6)
    raw = mux_avi([rgb_to_dib(p) for p in px], w, h, fps=6, codec="DIB ")
    t = pa.table({"vid": pa.array([0, 1], pa.int64()),
                  "video": pa.array([mj, raw], pa.binary())})
    out = sample_video_frames(t, payload_col="video", every_n=3)
    # 2 videos × frames {0, 3}
    assert out.column("frame_idx").to_pylist() == [0, 3, 0, 3]
    # the raw-DIB rows round-trip exactly through the FAKE re-emission
    for row in range(2, 4):
        frame = out.column("frame")[row].as_py()
        fw, fh, fc = struct.unpack("<HHB", frame[4:9])
        assert (fw, fh, fc) == (w, h, 3)
        got = np.frombuffer(frame[9:], np.uint8).reshape(fh, fw, fc)
        np.testing.assert_array_equal(got, px[(row - 2) * 3])


def test_avi_unknown_codec_stays_loud():
    # mux with an H.264 fourcc: demux works, pixel decode raises
    buf = mux_avi([b"\x00\x01\x02"], 4, 4, fps=1, codec="H264")
    assert demux_avi(buf)["codec"] == "H264"
    t = pa.table({"video": pa.array([buf], pa.binary())})
    with pytest.raises(NotImplementedError):
        sample_video_frames(t, payload_col="video", every_n=1)


def test_avi_corrupt_is_loud():
    good = mux_avi([b"xx"], 2, 2, fps=1, codec="MJPG")
    with pytest.raises(ValueError):
        demux_avi(b"RIFF\x04\x00\x00\x00AVI ")   # no streams
    with pytest.raises(ValueError):
        demux_avi(good[:30])                     # truncated hdrl
    with pytest.raises(ValueError):
        demux_avi(b"RIFF\x00\x00\x00\x00WAVE")   # not an AVI
    with pytest.raises(ValueError):
        dib_to_rgb(b"\x00" * 4, 10, 10)          # truncated DIB frame
