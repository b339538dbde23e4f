"""Matroska/WebM demuxer: EBML varints, mux/demux round-trips, all
three block lacing modes (hand-built blocks), MJPEG + V_UNCOMPRESSED
decode through the shared video stage, and loud-stub / never-crash
contracts."""

import struct

import numpy as np
import pyarrow as pa
import pytest

from tenzir_ray.text.jpeg import decode_jpeg, encode_jpeg
from tenzir_ray.text.mkv import (
    _el,
    _el_uint,
    _read_vint,
    demux_mkv,
    mkv_video_frames,
    mux_mjpeg_mkv,
)
from tenzir_ray.text.multimodal import sample_video_frames


def _frames_px(n, w, h, seed=0):
    out = []
    for f in range(n):
        yy, xx = np.mgrid[0:h, 0:w]
        out.append(np.stack([(xx * 9 + f * 13 + seed) % 256,
                             (yy * 5 + f * 7) % 256,
                             np.full((h, w), (f * 3) % 256)],
                            -1).astype(np.uint8))
    return out


def test_vint_widths():
    # 1..8 byte varints, value and marker forms
    assert _read_vint(b"\x81", 0, keep_marker=False) == (1, 1)
    assert _read_vint(b"\x81", 0, keep_marker=True) == (0x81, 1)
    assert _read_vint(b"\x40\x02", 0, keep_marker=False) == (2, 2)
    assert _read_vint(b"\x1aE\xdf\xa3", 0, keep_marker=True) == \
        (0x1A45DFA3, 4)
    with pytest.raises(ValueError):
        _read_vint(b"\x00", 0, keep_marker=False)
    with pytest.raises(ValueError):
        _read_vint(b"\x40", 0, keep_marker=False)  # truncated body


def test_mux_demux_mjpeg_roundtrip():
    w, h = 13, 9
    px = _frames_px(4, w, h)
    jpegs = [encode_jpeg(p, 90) for p in px]
    buf = mux_mjpeg_mkv(jpegs, w, h, fps=5)
    info = demux_mkv(buf)
    assert info["doctype"] == "matroska"
    assert (info["width"], info["height"]) == (w, h)
    assert info["codec"] == "jpeg"
    assert info["duration_s"] == pytest.approx(4 / 5)
    assert len(info["samples"]) == 4
    for i, (off, size, pts, key) in enumerate(info["samples"]):
        assert buf[off:off + size] == jpegs[i]
        assert key
        assert pts == pytest.approx(i / 5, abs=1e-3)
    for i, pts, key, sample, codec in mkv_video_frames(buf):
        got, gw, gh, c = decode_jpeg(sample)
        assert (gw, gh) == (w, h)


def _block_track1(payload: bytes, flags: int, extra: bytes = b"") -> bytes:
    return _el(0xA3, b"\x81" + struct.pack(">h", 0) + bytes([flags])
               + extra + payload)


def _wrap_segment(cluster_body: bytes, codec=b"V_MJPEG") -> bytes:
    header = _el(0x1A45DFA3, _el(0x4282, b"matroska"))
    info = _el(0x1549A966, _el_uint(0x2AD7B1, 1_000_000))
    video = _el(0xE0, _el_uint(0xB0, 4) + _el_uint(0xBA, 3))
    track = _el(0xAE, _el_uint(0xD7, 1) + _el_uint(0x83, 1)
                + _el(0x86, codec) + video)
    cluster = _el(0x1F43B675, _el_uint(0xE7, 0) + cluster_body)
    return header + _el(0x18538067, info + _el(0x1654AE6B, track)
                        + cluster)


def test_all_lacing_modes():
    frames = [b"aa", b"bbbb", b"c"]
    # Xiph lacing: sizes 2, 4 coded, last implicit
    xiph = _block_track1(b"".join(frames), 0x80 | 0x02,
                         extra=bytes([2, 2, 4]))
    # EBML lacing: first absolute (2), delta +2 → 4, last implicit
    #   delta +2 at width 1 is stored as 2 + 63 = 65 (0x40|0x41 vint)
    ebml = _block_track1(b"".join(frames), 0x80 | 0x06,
                         extra=bytes([2]) + b"\x82" + bytes([0x80 | 65]))
    # fixed lacing: 3 equal frames
    fixed = _block_track1(b"xx" + b"yy" + b"zz", 0x80 | 0x04,
                          extra=bytes([2]))
    info = demux_mkv(_wrap_segment(xiph + ebml + fixed))
    got = [(s, sz) for s, sz, _p, _k in info["samples"]]
    assert len(got) == 9
    buf = _wrap_segment(xiph + ebml + fixed)
    payloads = [buf[o:o + s] for o, s, _p, _k in demux_mkv(buf)["samples"]]
    assert payloads[:3] == frames
    assert payloads[3:6] == frames
    assert payloads[6:] == [b"xx", b"yy", b"zz"]


def test_truncated_lacing_is_loud():
    # Xiph lacing whose 255-run size coding runs past the block end:
    # 2 frames declared, first size is an unterminated 255-run.
    xiph = _block_track1(b"", 0x80 | 0x02, extra=bytes([1, 255, 255]))
    with pytest.raises(ValueError, match="Xiph"):
        demux_mkv(_wrap_segment(xiph))
    # lace-count byte missing entirely (block ends right after flags)
    empty = _block_track1(b"", 0x80 | 0x02, extra=b"")
    with pytest.raises(ValueError, match="lace count"):
        demux_mkv(_wrap_segment(empty))
    # EBML lacing whose size vint body overruns the block: 3 frames,
    # first-size vint claims 2 bytes but only 1 remains in the block.
    ebml = _block_track1(b"", 0x80 | 0x06, extra=bytes([2, 0x40]))
    with pytest.raises(ValueError):
        demux_mkv(_wrap_segment(ebml))
    # EBML delta vint that would read past the block into the payload
    # of a SIBLING element must raise, not silently mis-frame.
    sib = _block_track1(b"", 0x80 | 0x06, extra=bytes([2, 0x81]))
    tail = _block_track1(b"pp", 0x80)
    with pytest.raises(ValueError, match="EBML lacing"):
        demux_mkv(_wrap_segment(sib + tail))


def test_sample_video_frames_mkv_mjpeg_and_raw():
    w, h = 8, 6
    px = _frames_px(4, w, h)
    mj = mux_mjpeg_mkv([encode_jpeg(p, 92) for p in px], w, h, fps=4)
    raw = mux_mjpeg_mkv([p.tobytes() for p in px], w, h, fps=4,
                        codec_id="V_UNCOMPRESSED")
    t = pa.table({"vid": pa.array([0, 1], pa.int64()),
                  "video": pa.array([mj, raw], pa.binary())})
    out = sample_video_frames(t, payload_col="video", every_n=2)
    assert out.column("frame_idx").to_pylist() == [0, 2, 0, 2]
    # raw frames round-trip exactly
    for row, fidx in ((2, 0), (3, 2)):
        frame = out.column("frame")[row].as_py()
        fw, fh, fc = struct.unpack("<HHB", frame[4:9])
        got = np.frombuffer(frame[9:], np.uint8).reshape(fh, fw, fc)
        np.testing.assert_array_equal(got, px[fidx])


def test_mkv_vp8_stays_loud():
    buf = mux_mjpeg_mkv([b"\x00\x01"], 4, 4, fps=1, codec_id="V_VP8")
    assert demux_mkv(buf)["codec"] == "V_VP8"
    t = pa.table({"video": pa.array([buf], pa.binary())})
    with pytest.raises(NotImplementedError):
        sample_video_frames(t, payload_col="video", every_n=1)


def test_mkv_corrupt_is_loud():
    good = mux_mjpeg_mkv([b"xx"], 2, 2)
    with pytest.raises(ValueError):
        demux_mkv(b"\x1aE\xdf\xa3")            # header only, truncated
    with pytest.raises(ValueError):
        demux_mkv(good[:-3])                   # element overruns parent
    with pytest.raises(ValueError):
        demux_mkv(b"RIFF....AVI ")             # wrong magic
    # audio-only file: metadata comes back, video frame iter raises
    header = _el(0x1A45DFA3, _el(0x4282, b"matroska"))
    track = _el(0xAE, _el_uint(0xD7, 1) + _el_uint(0x83, 2)
                + _el(0x86, b"A_OPUS")
                + _el(0xE1, _el(0xB5, struct.pack(">f", 48000.0))))
    seg = _el(0x18538067, _el(0x1654AE6B, track))
    m = demux_mkv(header + seg)
    assert m["codec"] == "A_OPUS" and m["sample_rate"] == 48000.0
    with pytest.raises(ValueError):
        list(mkv_video_frames(header + seg))
