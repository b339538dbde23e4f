"""ISO-BMFF (MP4) demuxing + MP3 frame parsing in pure stdlib.

Video DECODE of arithmetic-coded codecs (H.264/HEVC/VP9/AV1) is
impossible without codec libraries — but DEMUXING is plain structure:
this module walks the box tree (ISO/IEC 14496-12), reconstructs the
per-sample layout from the stbl tables (stsd/stts/stsc/stsz/stco/
co64/stss), and hands each sample's bytes + timestamp + keyframe flag
to the caller. For Motion-JPEG tracks (``jpeg`` sample entries) every
sample IS a baseline/progressive JPEG, so the in-repo
:mod:`tenzir_ray.text.jpeg` decoder turns frame-sampling into REAL
end-to-end video decode with no codec library. Other codecs demux
fine and raise the documented loud stub at pixel-decode time.

:func:`mux_mjpeg_mp4` is the test-side dual: a minimal valid
single-track MJPEG muxer (ftyp + mdat + moov) whose output any
standards-compliant player accepts.

:func:`parse_mp3` walks MPEG audio frame headers (ID3v2-aware) and
returns stream metadata (version/layer/bitrate/sample-rate/duration)
— the full polyphase-filterbank decode stays a loud stub, but corpus
pipelines get duration/bitrate stats for MP3 payloads for real.
"""

from __future__ import annotations

import struct

# ------------------------------------------------------------ demuxer

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _boxes(buf: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) for each box in [start, end)."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", buf, pos)
        typ = buf[pos + 4: pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize
            (size,) = struct.unpack_from(">Q", buf, pos + 8)
            body = pos + 16
        elif size == 0:  # to end of enclosing box
            size = end - pos
        if size < 8 or pos + size > end:
            raise ValueError("malformed MP4 box")
        yield typ, body, pos + size
        pos += size


def _fullbox(buf: bytes, pos: int) -> tuple[int, int, int]:
    """(version, flags, payload_start)."""
    v = buf[pos]
    flags = int.from_bytes(buf[pos + 1: pos + 4], "big")
    return v, flags, pos + 4


def demux_mp4(buf: bytes) -> dict:
    """Parse the box tree → {"brand", "tracks": [...]}; each track has
    handler/codec/width/height/timescale/duration and a resolved
    ``samples`` list of (offset, size, dts, keyframe)."""
    if len(buf) < 12 or buf[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF file")
    brand = buf[8:12].decode("latin-1")
    tracks: list[dict] = []
    cur: dict | None = None

    def walk(start: int, end: int) -> None:
        nonlocal cur
        for typ, b, e in _boxes(buf, start, end):
            if typ in _CONTAINERS:
                if typ == b"trak":
                    cur = {"handler": None, "codec": None, "width": None,
                           "height": None, "timescale": None,
                           "duration": None, "stts": [], "stsc": [],
                           "stsz": None, "stco": [], "stss": None}
                    tracks.append(cur)
                walk(b, e)
                continue
            if cur is None:
                continue
            if typ == b"mdhd":
                v, _f, p = _fullbox(buf, b)
                if v == 1:
                    cur["timescale"], cur["duration"] = struct.unpack_from(
                        ">IQ", buf, p + 16)
                else:
                    cur["timescale"], cur["duration"] = struct.unpack_from(
                        ">II", buf, p + 8)
            elif typ == b"hdlr":
                _v, _f, p = _fullbox(buf, b)
                cur["handler"] = buf[p + 4: p + 8].decode("latin-1")
            elif typ == b"stsd":
                _v, _f, p = _fullbox(buf, b)
                (n,) = struct.unpack_from(">I", buf, p)
                if n >= 1:
                    cur["codec"] = buf[p + 8: p + 12].decode("latin-1")
                    # visual sample entry: width/height at offset 24
                    # into the entry body (after 6 reserved + 2 dref +
                    # 16 pre_defined/reserved)
                    if cur["handler"] == "vide" and e - (p + 12) >= 28:
                        cur["width"], cur["height"] = struct.unpack_from(
                            ">HH", buf, p + 12 + 24)
            elif typ == b"stts":
                _v, _f, p = _fullbox(buf, b)
                (n,) = struct.unpack_from(">I", buf, p)
                cur["stts"] = [struct.unpack_from(">II", buf, p + 4 + 8 * i)
                               for i in range(n)]
            elif typ == b"stsc":
                _v, _f, p = _fullbox(buf, b)
                (n,) = struct.unpack_from(">I", buf, p)
                cur["stsc"] = [
                    struct.unpack_from(">III", buf, p + 4 + 12 * i)
                    for i in range(n)]
            elif typ == b"stsz":
                _v, _f, p = _fullbox(buf, b)
                uniform, n = struct.unpack_from(">II", buf, p)
                if uniform:
                    cur["stsz"] = (uniform, n)
                else:
                    cur["stsz"] = [struct.unpack_from(
                        ">I", buf, p + 8 + 4 * i)[0] for i in range(n)]
            elif typ in (b"stco", b"co64"):
                _v, _f, p = _fullbox(buf, b)
                (n,) = struct.unpack_from(">I", buf, p)
                fmt, w = (">I", 4) if typ == b"stco" else (">Q", 8)
                cur["stco"] = [struct.unpack_from(
                    fmt, buf, p + 4 + w * i)[0] for i in range(n)]
            elif typ == b"stss":
                _v, _f, p = _fullbox(buf, b)
                (n,) = struct.unpack_from(">I", buf, p)
                cur["stss"] = {struct.unpack_from(
                    ">I", buf, p + 4 + 4 * i)[0] for i in range(n)}

    for typ, b, e in _boxes(buf, 0, len(buf)):
        if typ == b"moov":
            walk(b, e)
    for tr in tracks:
        tr["samples"] = _resolve_samples(tr)
        for k in ("stts", "stsc", "stsz", "stco", "stss"):
            del tr[k]
    return {"brand": brand, "tracks": tracks}


def _resolve_samples(tr: dict) -> list[tuple[int, int, int, bool]]:
    """stbl tables → [(byte_offset, size, dts_ticks, keyframe)]."""
    if tr["stsz"] is None or not tr["stco"]:
        return []
    if isinstance(tr["stsz"], tuple):
        uniform, n = tr["stsz"]
        sizes = [uniform] * n
    else:
        sizes = tr["stsz"]
    n = len(sizes)
    # per-sample timestamps from the (count, delta) run-length table
    dts, t = [], 0
    for count, delta in tr["stts"]:
        for _ in range(count):
            if len(dts) == n:
                break
            dts.append(t)
            t += delta
    while len(dts) < n:
        dts.append(t)
    # chunk mapping: stsc runs give samples-per-chunk between
    # first_chunk boundaries (1-based, sorted)
    runs = tr["stsc"] or [(1, n, 1)]
    n_chunks = len(tr["stco"])
    per_chunk = []
    for i, (first, spc, _sdi) in enumerate(runs):
        last = runs[i + 1][0] - 1 if i + 1 < len(runs) else n_chunks
        per_chunk.extend([spc] * (last - first + 1))
    sync = tr["stss"]
    out = []
    si = 0
    for ci, chunk_off in enumerate(tr["stco"]):
        off = chunk_off
        for _ in range(per_chunk[ci] if ci < len(per_chunk) else 0):
            if si >= n:
                break
            key = sync is None or (si + 1) in sync
            out.append((off, sizes[si], dts[si], key))
            off += sizes[si]
            si += 1
    return out


def mp4_video_frames(buf: bytes):
    """Yield (index, dts_seconds, keyframe, sample_bytes, codec) for
    the first video track."""
    info = demux_mp4(buf)
    for tr in info["tracks"]:
        if tr["handler"] != "vide":
            continue
        ts = tr["timescale"] or 1
        for i, (off, size, dts, key) in enumerate(tr["samples"]):
            if off + size > len(buf):
                raise ValueError("MP4 sample beyond file end")
            yield i, dts / ts, key, buf[off: off + size], tr["codec"]
        return
    raise ValueError("MP4 contains no video track")


# -------------------------------------------------------------- muxer


def _box(typ: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + typ + body


def _full(typ: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _box(typ, bytes([version]) + flags.to_bytes(3, "big") + body)


def mux_mjpeg_mp4(frames: list[bytes], width: int, height: int,
                  fps: int = 10, keyframe_every: int = 1) -> bytes:
    """Minimal valid single-track Motion-JPEG MP4 (the test-side dual
    of :func:`demux_mp4`): ftyp + mdat + moov, one chunk, uniform
    frame duration, ``jpeg`` visual sample entries."""
    n = len(frames)
    if n == 0:
        raise ValueError("no frames")
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200)
                + b"isomiso2mp41")
    mdat_payload = b"".join(frames)
    mdat = _box(b"mdat", mdat_payload)
    data_off = len(ftyp) + 8  # offset of the single chunk
    timescale = fps
    duration = n  # one tick per frame

    entry = (b"\x00" * 6 + struct.pack(">H", 1)          # dref index
             + b"\x00" * 16
             + struct.pack(">HH", width, height)
             + struct.pack(">II", 0x480000, 0x480000)    # 72 dpi
             + b"\x00" * 4 + struct.pack(">H", 1)        # frame count
             + b"\x00" * 32                              # compressor
             + struct.pack(">Hh", 24, -1))               # depth, ct
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1)
                 + _box(b"jpeg", entry))
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, 1))
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
    stsz = _full(b"stsz", 0, 0, struct.pack(">II", 0, n)
                 + b"".join(struct.pack(">I", len(f)) for f in frames))
    stco = _full(b"stco", 0, 0, struct.pack(">II", 1, data_off))
    keys = [i + 1 for i in range(n) if i % keyframe_every == 0]
    stss = _full(b"stss", 0, 0, struct.pack(">I", len(keys))
                 + b"".join(struct.pack(">I", k) for k in keys))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco + stss)
    url = _full(b"url ", 0, 1, b"")
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + url)
    dinf = _box(b"dinf", dref)
    vmhd = _full(b"vmhd", 0, 1, b"\x00" * 8)
    minf = _box(b"minf", vmhd + dinf + stbl)
    hdlr = _full(b"hdlr", 0, 0, b"\x00" * 4 + b"vide" + b"\x00" * 12
                 + b"VideoHandler\x00")
    mdhd = _full(b"mdhd", 0, 0, struct.pack(
        ">IIIIHH", 0, 0, timescale, duration, 0x55C4, 0))
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(b"tkhd", 0, 7, struct.pack(">IIII", 0, 0, 1, 0)
                 + struct.pack(">I", duration) + b"\x00" * 16
                 + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0,
                               0, 0, 0x40000000)
                 + struct.pack(">II", width << 16, height << 16))
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _full(b"mvhd", 0, 0, struct.pack(">IIII", 0, 0, timescale,
                                            duration)
                 + struct.pack(">IH", 0x10000, 0x100) + b"\x00" * 10
                 + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0,
                               0, 0, 0x40000000)
                 + b"\x00" * 24 + struct.pack(">I", 2))
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


# ---------------------------------------------------------------- MP3

#: bitrate (kbps) tables indexed [is_v1][layer-1][idx-1]
_MP3_BITRATES = {
    (1, 1): (32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384,
             416, 448),
    (1, 2): (32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256,
             320, 384),
    (1, 3): (32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
             256, 320),
    (0, 1): (32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192,
             224, 256),
    (0, 2): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    (0, 3): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}
_MP3_RATES = {3: (44100, 48000, 32000),      # MPEG-1
              2: (22050, 24000, 16000),      # MPEG-2
              0: (11025, 12000, 8000)}       # MPEG-2.5


def parse_mp3(buf: bytes) -> dict:
    """Walk MPEG audio frame headers → stream metadata. Skips a
    leading ID3v2 tag; tolerates trailing garbage after the last whole
    frame. Raises ValueError if no valid frame sequence is found."""
    pos = 0
    if buf[:3] == b"ID3" and len(buf) >= 10:
        sz = ((buf[6] & 0x7F) << 21) | ((buf[7] & 0x7F) << 14) \
            | ((buf[8] & 0x7F) << 7) | (buf[9] & 0x7F)
        pos = 10 + sz
    n_frames = 0
    total_s = 0.0
    first = None
    while pos + 4 <= len(buf):
        h = struct.unpack_from(">I", buf, pos)[0]
        if (h >> 21) & 0x7FF != 0x7FF:
            if n_frames:
                break  # trailing tag/garbage after valid frames
            raise ValueError("no MP3 frame sync")
        ver_bits = (h >> 19) & 3    # 0=2.5, 2=MPEG2, 3=MPEG1
        layer = 4 - ((h >> 17) & 3)  # 1..3
        br_idx = (h >> 12) & 0xF
        sr_idx = (h >> 10) & 3
        pad = (h >> 9) & 1
        if ver_bits == 1 or layer == 4 or br_idx in (0, 0xF) \
                or sr_idx == 3:
            if n_frames:
                break  # sync-looking trailing garbage after real frames
            raise ValueError("invalid MP3 frame header")
        is_v1 = 1 if ver_bits == 3 else 0
        kbps = _MP3_BITRATES[(is_v1, layer)][br_idx - 1]
        sr = _MP3_RATES[ver_bits][sr_idx]
        if layer == 1:
            size = (12 * kbps * 1000 // sr + pad) * 4
            spf = 384
        else:
            coef = 144 if (is_v1 or layer == 2) else 72
            size = coef * kbps * 1000 // sr + pad
            spf = 1152 if (is_v1 or layer == 2) else 576
        if first is None:
            first = {"version": {3: 1, 2: 2, 0: 2.5}[ver_bits],
                     "layer": layer, "bitrate_kbps": kbps,
                     "sample_rate": sr,
                     "channels": 1 if ((h >> 6) & 3) == 3 else 2}
        if pos + size > len(buf):
            break  # truncated final frame
        n_frames += 1
        total_s += spf / sr
        pos += size
    if not n_frames or first is None:
        raise ValueError("no complete MP3 frame")
    return {**first, "n_frames": n_frames,
            "duration_s": round(total_s, 6)}
