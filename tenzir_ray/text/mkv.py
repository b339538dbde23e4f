"""Matroska / WebM (EBML) demuxing in pure stdlib.

EBML is a formulaic varint-framed tree (RFC 8794) — no tabulated
entropy data — so the container walks for real: header validation,
Segment → Info (timestamp scale, duration) / Tracks (codec id, video
dims, audio rate) / Cluster (timestamp + SimpleBlock / BlockGroup)
resolution, with all three block lacing modes (Xiph, fixed, EBML).
``V_MJPEG`` tracks decode end-to-end through
:mod:`tenzir_ray.text.jpeg`; ``V_UNCOMPRESSED`` frames pass through
raw. VP8/VP9/AV1/H.264 (and Vorbis/Opus audio) demux fine but raise
at pixel/PCM decode — the repo-wide loud-stub policy for codecs whose
specs are mostly tabulated coder data. :func:`mux_mjpeg_mkv` is the
test-side dual: a minimal valid single-track Matroska file.
"""

from __future__ import annotations

import struct

_CODEC_IDS = {
    "V_MJPEG": "jpeg",
    "V_UNCOMPRESSED": "raw",
}


def _read_vint(buf: bytes, pos: int, keep_marker: bool) -> tuple[int, int]:
    """EBML variable-width integer at ``pos`` → (value, next_pos)."""
    if pos >= len(buf):
        raise ValueError("EBML: truncated varint")
    first = buf[pos]
    if first == 0:
        raise ValueError("EBML: invalid varint marker")
    length = 8 - first.bit_length() + 1
    if pos + length > len(buf):
        raise ValueError("EBML: truncated varint body")
    val = first if keep_marker else first & ((1 << (8 - length)) - 1)
    for i in range(1, length):
        val = (val << 8) | buf[pos + i]
    return val, pos + length


def _elements(buf: bytes, start: int, end: int):
    """Yield (element_id, body_start, body_end) over an EBML run."""
    pos = start
    while pos < end:
        eid, pos = _read_vint(buf, pos, keep_marker=True)
        size, pos = _read_vint(buf, pos, keep_marker=False)
        if pos + size > end:
            raise ValueError("EBML: element overruns its parent")
        yield eid, pos, pos + size
        pos += size


def _uint(buf: bytes, s: int, e: int) -> int:
    return int.from_bytes(buf[s:e], "big")


def _float(buf: bytes, s: int, e: int) -> float:
    n = e - s
    if n == 4:
        return struct.unpack(">f", buf[s:e])[0]
    if n == 8:
        return struct.unpack(">d", buf[s:e])[0]
    raise ValueError("EBML: bad float width")


def demux_mkv(buf: bytes) -> dict:
    """Parse a Matroska/WebM stream → ``{doctype, timescale_ns,
    duration_s, width, height, codec, samples: [(offset, size,
    pts_s, keyframe), …]}`` for the FIRST video track (audio-only
    files report the first audio track's codec/rate with no
    samples)."""
    if buf[:4] != b"\x1aE\xdf\xa3":
        raise ValueError("not an EBML/Matroska stream")
    doctype = "matroska"
    segment = None
    for eid, s, e in _elements(buf, 0, len(buf)):
        if eid == 0x1A45DFA3:  # EBML header
            for hid, hs, he in _elements(buf, s, e):
                if hid == 0x4282:  # DocType
                    doctype = buf[hs:he].rstrip(b"\x00").decode(
                        "latin1", "replace")
        elif eid == 0x18538067:  # Segment
            segment = (s, e)
            break
    if segment is None:
        raise ValueError("Matroska: no Segment element")

    timescale = 1_000_000  # default: 1 ms ticks
    duration_ticks = None
    video_track = None
    track_info: dict = {}
    clusters: list[tuple[int, int]] = []

    for eid, s, e in _elements(buf, *segment):
        if eid == 0x1549A966:  # Info
            for iid, is_, ie in _elements(buf, s, e):
                if iid == 0x2AD7B1:
                    timescale = _uint(buf, is_, ie)
                elif iid == 0x4489:
                    duration_ticks = _float(buf, is_, ie)
        elif eid == 0x1654AE6B:  # Tracks
            for tid, ts, te in _elements(buf, s, e):
                if tid != 0xAE:  # TrackEntry
                    continue
                num = ttype = None
                codec = ""
                w = h = rate = channels = None
                for fid, fs, fe in _elements(buf, ts, te):
                    if fid == 0xD7:
                        num = _uint(buf, fs, fe)
                    elif fid == 0x83:
                        ttype = _uint(buf, fs, fe)
                    elif fid == 0x86:
                        codec = buf[fs:fe].rstrip(b"\x00").decode(
                            "latin1", "replace")
                    elif fid == 0xE0:  # Video
                        for vid, vs, ve in _elements(buf, fs, fe):
                            if vid == 0xB0:
                                w = _uint(buf, vs, ve)
                            elif vid == 0xBA:
                                h = _uint(buf, vs, ve)
                    elif fid == 0xE1:  # Audio
                        for aid, as_, ae in _elements(buf, fs, fe):
                            if aid == 0xB5:
                                rate = _float(buf, as_, ae)
                            elif aid == 0x9F:
                                channels = _uint(buf, as_, ae)
                if ttype == 1 and video_track is None:
                    video_track = num
                    track_info = {"codec": _CODEC_IDS.get(codec, codec),
                                  "width": w or 0, "height": h or 0}
                elif ttype == 2 and video_track is None and not track_info:
                    track_info = {"codec": codec, "sample_rate": rate,
                                  "channels": channels}
        elif eid == 0x1F43B675:  # Cluster
            clusters.append((s, e))

    samples: list[tuple[int, int, float, bool]] = []
    if video_track is not None:
        for cs, ce in clusters:
            cluster_ts = 0
            for cid, bs, be in _elements(buf, cs, ce):
                if cid == 0xE7:  # cluster Timestamp
                    cluster_ts = _uint(buf, bs, be)
                elif cid == 0xA3:  # SimpleBlock
                    samples += _parse_block(buf, bs, be, video_track,
                                            cluster_ts, timescale,
                                            simple=True)
                elif cid == 0xA0:  # BlockGroup
                    for gid, gs, ge in _elements(buf, bs, be):
                        if gid == 0xA1:  # Block
                            samples += _parse_block(
                                buf, gs, ge, video_track, cluster_ts,
                                timescale, simple=False)
    out = {"doctype": doctype, "timescale_ns": timescale,
           "duration_s": (duration_ticks * timescale / 1e9
                          if duration_ticks else None),
           "samples": samples}
    out.update(track_info or {"codec": None})
    return out


def _parse_block(buf: bytes, s: int, e: int, want_track: int,
                 cluster_ts: int, timescale: int,
                 simple: bool) -> list[tuple[int, int, float, bool]]:
    track, pos = _read_vint(buf, s, keep_marker=False)
    if track != want_track:
        return []
    if pos + 3 > e:
        raise ValueError("Matroska: truncated block header")
    rel_ts = struct.unpack(">h", buf[pos:pos + 2])[0]
    flags = buf[pos + 2]
    pos += 3
    key = bool(flags & 0x80) if simple else True
    pts = (cluster_ts + rel_ts) * timescale / 1e9
    lacing = (flags >> 1) & 0x3
    if lacing == 0:  # no lacing: one frame
        return [(pos, e - pos, pts, key)]
    if pos >= e:
        raise ValueError("Matroska: truncated lace count")
    nframes = buf[pos] + 1
    pos += 1
    sizes: list[int] = []
    if lacing == 2:  # fixed-size
        total = e - pos
        if total % nframes:
            raise ValueError("Matroska: uneven fixed lacing")
        sizes = [total // nframes] * nframes
    elif lacing == 1:  # Xiph: 255-run coded sizes for all but the last
        for _ in range(nframes - 1):
            sz = 0
            while True:
                if pos >= e:
                    raise ValueError("Matroska: truncated Xiph lacing")
                b = buf[pos]
                pos += 1
                sz += b
                if b != 255:
                    break
            sizes.append(sz)
        sizes.append(e - pos - sum(sizes))
    else:  # EBML lacing: first absolute, rest signed vint deltas
        first, pos = _read_vint(buf, pos, keep_marker=False)
        if pos > e:
            raise ValueError("Matroska: truncated EBML lacing")
        sizes.append(first)
        for _ in range(nframes - 2):
            raw_start = pos
            delta, pos = _read_vint(buf, pos, keep_marker=False)
            if pos > e:
                raise ValueError("Matroska: truncated EBML lacing")
            # signed: subtract the mid-range bias for the vint width
            width = pos - raw_start
            delta -= (1 << (7 * width - 1)) - 1
            sizes.append(sizes[-1] + delta)
        if nframes > 1:
            sizes.append(e - pos - sum(sizes))
    out = []
    for sz in sizes:
        if sz < 0 or pos + sz > e:
            raise ValueError("Matroska: lacing overruns block")
        out.append((pos, sz, pts, key))
        pos += sz
    return out


def mkv_video_frames(buf: bytes):
    """Yield (index, pts_seconds, keyframe, sample_bytes, codec) for
    the first video track — API parity with
    :func:`tenzir_ray.text.mp4.mp4_video_frames`."""
    info = demux_mkv(buf)
    if not info.get("samples") and info.get("width") is None:
        raise ValueError("Matroska: no video track")
    for i, (off, size, pts, key) in enumerate(info["samples"]):
        yield i, pts, key, buf[off:off + size], info["codec"]


# -------------------------------------------------------------- muxer


def _vint_id(eid: int) -> bytes:
    return eid.to_bytes((eid.bit_length() + 7) // 8, "big")


def _vint_size(n: int) -> bytes:
    for width in range(1, 9):
        if n < (1 << (7 * width)) - 1:
            return ((1 << (7 * width)) | n).to_bytes(width, "big")
    raise ValueError("EBML size too large")


def _el(eid: int, body: bytes) -> bytes:
    return _vint_id(eid) + _vint_size(len(body)) + body


def _el_uint(eid: int, v: int) -> bytes:
    return _el(eid, v.to_bytes(max(1, (v.bit_length() + 7) // 8), "big"))


def mux_mjpeg_mkv(frames: list[bytes], width: int, height: int,
                  fps: int = 10, codec_id: str = "V_MJPEG") -> bytes:
    """Minimal valid single-video-track Matroska (the test-side dual
    of :func:`demux_mkv`): EBML header + Segment(Info, Tracks, one
    Cluster of SimpleBlocks, one per frame, all keyframes)."""
    if not frames:
        raise ValueError("no frames")
    header = _el(0x1A45DFA3,
                 _el_uint(0x4286, 1) + _el_uint(0x42F7, 1)
                 + _el_uint(0x42F2, 4) + _el_uint(0x42F3, 8)
                 + _el(0x4282, b"matroska")
                 + _el_uint(0x4287, 4) + _el_uint(0x4285, 2))
    info = _el(0x1549A966,
               _el_uint(0x2AD7B1, 1_000_000)
               + _el(0x4489, struct.pack(">d", len(frames) * 1000 / fps)))
    video = _el(0xE0, _el_uint(0xB0, width) + _el_uint(0xBA, height))
    track = _el(0xAE, _el_uint(0xD7, 1) + _el_uint(0x73C5, 1)
                + _el_uint(0x83, 1) + _el(0x86, codec_id.encode())
                + video)
    tracks = _el(0x1654AE6B, track)
    blocks = b""
    for i, f in enumerate(frames):
        ts = int(i * 1000 / fps)
        body = b"\x81" + struct.pack(">h", ts) + b"\x80" + f
        blocks += _el(0xA3, body)
    cluster = _el(0x1F43B675, _el_uint(0xE7, 0) + blocks)
    segment = _el(0x18538067, info + tracks + cluster)
    return header + segment
