"""AVI (RIFF) demuxing in pure stdlib + numpy.

The second real video container next to MP4 (reference: the video
pipelines its `from file ... read` operators feed — this repo treats
video as opaque binary + typed metadata, SURVEY §2 multimodal row).
AVI is a pure chunk container with no entropy coding of its own:
``RIFF('AVI ') → LIST(hdrl: avih + LIST(strl: strh/strf)…) →
LIST(movi: 'NNdc'/'NNdb' chunks) → idx1``. Motion-JPEG streams
(``MJPG``) decode end-to-end through :mod:`tenzir_ray.text.jpeg`;
uncompressed DIB streams (``BI_RGB``, the 'db' chunks) decode here
directly (bottom-up BGR rows, 4-byte stride padding) — so AVI has
both an entropy-coded and an entropy-free real decode path.
:func:`mux_avi` is the test-side dual: a minimal valid single-stream
AVI with an idx1 index.

Other FourCCs demux fine but raise at pixel decode (no codec libs in
this environment), matching the MP4 path's loud-stub policy.
"""

from __future__ import annotations

import struct

import numpy as np

_CODEC_BY_FOURCC = {
    b"MJPG": "jpeg", b"mjpg": "jpeg", b"dmb1": "jpeg",
    b"DIB ": "raw", b"\x00\x00\x00\x00": "raw", b"RGB ": "raw",
}


def _chunks(buf: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_size) over a RIFF chunk run."""
    pos = start
    while pos + 8 <= end:
        cid = buf[pos:pos + 4]
        size = struct.unpack_from("<I", buf, pos + 4)[0]
        if pos + 8 + size > end:
            raise ValueError("AVI: chunk overruns its parent")
        yield cid, pos + 8, size
        pos += 8 + size + (size & 1)  # word-aligned


def demux_avi(buf: bytes) -> dict:
    """Parse headers + the movi run → stream metadata and video
    sample locations. Returns ``{width, height, fps, codec,
    samples: [(offset, size, keyframe), …]}`` for the FIRST video
    stream (same shape as :func:`tenzir_ray.text.mp4.demux_mp4`'s
    per-track info)."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
        raise ValueError("not an AVI")
    riff_end = min(len(buf), 8 + struct.unpack_from("<I", buf, 4)[0])

    width = height = 0
    fps = 0.0
    codec = None
    vstream = None           # index of the first 'vids' stream
    stream_no = 0
    movi: tuple[int, int] | None = None
    idx1: list[tuple[bytes, int, int, int]] = []

    def parse_hdrl(start: int, end: int) -> None:
        nonlocal width, height, fps, codec, vstream, stream_no
        for cid, off, size in _chunks(buf, start, end):
            if cid != b"LIST" or buf[off:off + 4] != b"strl":
                continue
            fcc_type = fcc_handler = None
            scale = rate = 0
            bi_comp = None
            for scid, soff, ssize in _chunks(buf, off + 4, off + size):
                if scid == b"strh" and ssize >= 32:
                    fcc_type = buf[soff:soff + 4]
                    fcc_handler = buf[soff + 4:soff + 8]
                    scale, rate = struct.unpack_from("<II", buf, soff + 20)
                elif scid == b"strf" and ssize >= 40 \
                        and fcc_type == b"vids":
                    w, h = struct.unpack_from("<ii", buf, soff + 4)
                    bi_comp = buf[soff + 16:soff + 20]
                    width, height = abs(w), abs(h)
            if fcc_type == b"vids" and vstream is None:
                vstream = stream_no
                fps = rate / scale if scale else 0.0
                key = bi_comp if bi_comp and bi_comp in _CODEC_BY_FOURCC \
                    else fcc_handler
                codec = _CODEC_BY_FOURCC.get(
                    key or b"", (key or b"????").decode("latin1").strip()
                    or "raw")
            stream_no += 1

    for cid, off, size in _chunks(buf, 12, riff_end):
        if cid == b"LIST":
            ltype = buf[off:off + 4]
            if ltype == b"hdrl":
                parse_hdrl(off + 4, off + size)
            elif ltype == b"movi":
                movi = (off + 4, off + size)
        elif cid == b"idx1":
            for e in range(size // 16):
                ckid, flags, coff, csize = struct.unpack_from(
                    "<4sIII", buf, off + e * 16)
                idx1.append((ckid, flags, coff, csize))

    if vstream is None or movi is None:
        raise ValueError("AVI: no video stream or movi list")
    prefix = b"%02d" % vstream

    # keyframe flags from idx1 when present (AVIIF_KEYFRAME = 0x10);
    # MJPEG/DIB frames are all-intra so default to keyframe otherwise
    keyflags: list[bool] = [bool(f & 0x10) for ckid, f, _o, _s in idx1
                            if ckid[:2] == prefix and ckid[2:4] in
                            (b"dc", b"db")]
    samples = []
    i = 0
    for ckid, coff, csize in _chunks(buf, movi[0], movi[1]):
        if ckid[:2] == prefix and ckid[2:4] in (b"dc", b"db"):
            key = keyflags[i] if i < len(keyflags) else True
            samples.append((coff, csize, key))
            i += 1
    return {"width": width, "height": height, "fps": fps,
            "codec": codec, "samples": samples}


def dib_to_rgb(sample: bytes, width: int, height: int,
               bpp: int = 24) -> np.ndarray:
    """Uncompressed AVI 'db' frame (bottom-up BGR, 4-byte-padded row
    stride) → (h, w, 3) RGB uint8."""
    if bpp not in (24, 32):
        raise ValueError(f"DIB {bpp}-bit frames unsupported")
    nb = bpp // 8
    stride = (width * nb + 3) & ~3
    if len(sample) < stride * height:
        raise ValueError("DIB frame truncated")
    rows = np.frombuffer(sample, np.uint8,
                         stride * height).reshape(height, stride)
    px = rows[:, : width * nb].reshape(height, width, nb)
    # flip bottom-up rows, reorder BGR(A) → RGB (alpha dropped)
    return np.ascontiguousarray(px[::-1][:, :, [2, 1, 0]])


def avi_video_frames(buf: bytes):
    """Yield (index, pts_seconds, keyframe, sample_bytes, codec) for
    the first video stream — API parity with
    :func:`tenzir_ray.text.mp4.mp4_video_frames`."""
    info = demux_avi(buf)
    spf = 1.0 / info["fps"] if info["fps"] else 0.0
    for i, (off, size, key) in enumerate(info["samples"]):
        yield i, i * spf, key, buf[off:off + size], info["codec"]


# -------------------------------------------------------------- muxer


def _chunk(cid: bytes, body: bytes) -> bytes:
    return cid + struct.pack("<I", len(body)) \
        + body + (b"\x00" if len(body) & 1 else b"")


def _list(ltype: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", ltype + body)


def rgb_to_dib(px: np.ndarray) -> bytes:
    """(h, w, 3) RGB → bottom-up BGR DIB frame bytes (stride padded
    to 4), the inverse of :func:`dib_to_rgb`."""
    px = np.asarray(px, np.uint8)
    h, w, _ = px.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)
    return rows.tobytes()


def mux_avi(frames: list[bytes], width: int, height: int,
            fps: int = 10, codec: str = "MJPG",
            keyframe_every: int = 1) -> bytes:
    """Minimal valid single-stream AVI (the test-side dual of
    :func:`demux_avi`): hdrl + movi + idx1. ``codec="MJPG"`` marks
    'dc' chunks of JPEG bytes; ``codec="DIB "`` marks 'db' chunks of
    bottom-up BGR frames (see :func:`rgb_to_dib`)."""
    if not frames:
        raise ValueError("no frames")
    n = len(frames)
    fourcc = codec.encode().ljust(4)[:4]
    is_raw = fourcc in (b"DIB ", b"RGB ")
    tag = b"00db" if is_raw else b"00dc"
    max_size = max(len(f) for f in frames)

    avih = struct.pack("<IIIIIIIIIIIIII",
                       1_000_000 // fps, max_size * fps, 0, 0x10,  # HASINDEX
                       n, 0, 1, max_size, width, height, 0, 0, 0, 0)
    strh = (b"vids" + fourcc
            + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n,
                          max_size, 0xFFFFFFFF, 0)
            + struct.pack("<4H", 0, 0, width, height))
    bi_comp = b"\x00\x00\x00\x00" if is_raw else fourcc
    strf = struct.pack("<IiiHH", 40, width,
                       height if not is_raw else height, 1, 24) \
        + bi_comp + struct.pack("<IiiII", width * height * 3, 0, 0, 0, 0)
    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh)
                         + _chunk(b"strf", strf)))

    movi_body = b"movi"
    idx = b""
    for i, f in enumerate(frames):
        # idx1 offsets are relative to the 'movi' fourcc position
        off = len(movi_body)
        movi_body += _chunk(tag, f)
        flags = 0x10 if i % keyframe_every == 0 else 0
        idx += struct.pack("<4sIII", tag, flags, off, len(f))
    movi = _chunk(b"LIST", movi_body)
    idx1 = _chunk(b"idx1", idx)

    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body
