"""QOI / TGA / TIFF raster codecs in pure numpy + stdlib.

Three more real image containers whose specs are fully formulaic (no
tabulated entropy-coder data), each with an encoder dual so tests can
assert exact lossless round-trips:

- **QOI** (qoiformat.org, the complete 1.0 spec): RGB/RGBA/INDEX/
  DIFF/LUMA/RUN ops over the 64-slot ``(3r+5g+7b+11a) % 64`` color
  table; inherently serial per-pixel state, so the walk is a tight
  Python loop over a pre-decoded op stream (same policy as the
  GIF/FLAC entropy walks).
- **TGA** (Truevision TGA 2.0): types 2/3/10/11 (truecolor +
  grayscale, raw + RLE), 8/16/24/32-bit pixels, both vertical origins;
  RLE packets decode via numpy repeat over a packet scan. TGA has no
  leading magic, so dispatch keys on the TGA 2.0 ``TRUEVISION-XFILE.``
  footer (the encoder always writes it).
- **TIFF** (baseline 6.0, both byte orders): IFD tag walk, strips,
  compressions 1 (none), 5 (LZW with MSB-first codes + early change —
  note: NOT the GIF LZW variant), 32773 (PackBits), horizontal
  differencing predictor 2, photometrics 0/1/2/3 (palette), 8-bit
  samples, multi-strip images; the encoder writes uncompressed or
  PackBits strips.

All three return the ``(pixels HxWxC uint8, w, h, c)`` tuple the
multimodal ``_decode_payload`` dispatcher expects and raise
``ValueError`` on corrupt input (corpus-scale contract: bad payloads
become null rows, never crashes).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# QOI


def decode_qoi(buf: bytes) -> tuple[np.ndarray, int, int, int]:
    if len(buf) < 22 or buf[:4] != b"qoif":
        raise ValueError("not a QOI stream")
    w, h = struct.unpack(">II", buf[4:12])
    channels, colorspace = buf[12], buf[13]
    if channels not in (3, 4) or colorspace > 1:
        raise ValueError("QOI: bad header")
    npx = w * h
    if not npx or npx > 64_000_000:
        raise ValueError("QOI: bad dimensions")
    if buf[-8:] != b"\x00" * 7 + b"\x01":
        raise ValueError("QOI: missing end marker")
    data = buf[14:-8]
    out = np.empty((npx, 4), np.uint8)
    index = [(0, 0, 0, 0)] * 64
    px = (0, 0, 0, 255)
    pos = 0
    i = 0
    n = len(data)
    while i < npx:
        if pos >= n:
            raise ValueError("QOI: truncated stream")
        b0 = data[pos]
        pos += 1
        if b0 == 0xFE:  # RGB
            if pos + 3 > n:
                raise ValueError("QOI: truncated RGB op")
            px = (data[pos], data[pos + 1], data[pos + 2], px[3])
            pos += 3
        elif b0 == 0xFF:  # RGBA
            if pos + 4 > n:
                raise ValueError("QOI: truncated RGBA op")
            px = (data[pos], data[pos + 1], data[pos + 2], data[pos + 3])
            pos += 4
        else:
            tag = b0 >> 6
            if tag == 0:  # INDEX
                px = index[b0 & 0x3F]
            elif tag == 1:  # DIFF
                px = ((px[0] + ((b0 >> 4) & 3) - 2) & 255,
                      (px[1] + ((b0 >> 2) & 3) - 2) & 255,
                      (px[2] + (b0 & 3) - 2) & 255, px[3])
            elif tag == 2:  # LUMA
                if pos >= n:
                    raise ValueError("QOI: truncated LUMA op")
                dg = (b0 & 0x3F) - 32
                b1 = data[pos]
                pos += 1
                px = ((px[0] + dg + (b1 >> 4) - 8) & 255,
                      (px[1] + dg) & 255,
                      (px[2] + dg + (b1 & 0xF) - 8) & 255, px[3])
            else:  # RUN
                run = (b0 & 0x3F) + 1
                if i + run > npx:
                    raise ValueError("QOI: run overflows image")
                out[i:i + run] = px
                i += run
                continue
        index[(px[0] * 3 + px[1] * 5 + px[2] * 7 + px[3] * 11) % 64] = px
        out[i] = px
        i += 1
    pixels = out.reshape(h, w, 4)
    if channels == 3:
        pixels = pixels[:, :, :3]
    return np.ascontiguousarray(pixels), w, h, channels


def encode_qoi(px: np.ndarray, colorspace: int = 0) -> bytes:
    px = np.asarray(px, np.uint8)
    if px.ndim == 2:
        px = np.stack([px] * 3, -1)
    h, w, c = px.shape
    if c not in (3, 4):
        raise ValueError("QOI encodes 3- or 4-channel pixels")
    out = bytearray(b"qoif" + struct.pack(">II", w, h)
                    + bytes([c, colorspace]))
    flat = px.reshape(-1, c)
    if c == 3:
        flat = np.concatenate(
            [flat, np.full((len(flat), 1), 255, np.uint8)], 1)
    index = [(0, 0, 0, 0)] * 64
    prev = (0, 0, 0, 255)
    run = 0
    for row in flat:
        cur = (int(row[0]), int(row[1]), int(row[2]), int(row[3]))
        if cur == prev:
            run += 1
            if run == 62:
                out.append(0xC0 | (run - 1))
                run = 0
            continue
        if run:
            out.append(0xC0 | (run - 1))
            run = 0
        slot = (cur[0] * 3 + cur[1] * 5 + cur[2] * 7 + cur[3] * 11) % 64
        if index[slot] == cur:
            out.append(slot)
        elif cur[3] == prev[3]:
            dr = (cur[0] - prev[0] + 128) % 256 - 128
            dg = (cur[1] - prev[1] + 128) % 256 - 128
            db = (cur[2] - prev[2] + 128) % 256 - 128
            if -2 <= dr <= 1 and -2 <= dg <= 1 and -2 <= db <= 1:
                out.append(0x40 | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2))
            elif -32 <= dg <= 31 and -8 <= dr - dg <= 7 and -8 <= db - dg <= 7:
                out.append(0x80 | (dg + 32))
                out.append(((dr - dg + 8) << 4) | (db - dg + 8))
            else:
                out += bytes([0xFE, cur[0], cur[1], cur[2]])
        else:
            out += bytes([0xFF, cur[0], cur[1], cur[2], cur[3]])
        index[slot] = cur
        prev = cur
    if run:
        out.append(0xC0 | (run - 1))
    out += b"\x00" * 7 + b"\x01"
    return bytes(out)


# ---------------------------------------------------------------------------
# TGA

_TGA_FOOTER = b"TRUEVISION-XFILE.\x00"


def is_tga(buf: bytes) -> bool:
    return len(buf) > 44 and buf[-18:] == _TGA_FOOTER


def _tga_expand(raw: np.ndarray, bpp: int, w: int, h: int):
    if bpp == 8:
        return raw.reshape(h, w, 1), 1
    if bpp == 16:  # ARRRRRGG GGGBBBBB little-endian
        v = raw.view("<u2").astype(np.uint16).reshape(h, w)
        r = ((v >> 10) & 31).astype(np.uint8)
        g = ((v >> 5) & 31).astype(np.uint8)
        b = (v & 31).astype(np.uint8)
        scale = lambda x: ((x.astype(np.uint16) * 255 + 15) // 31).astype(np.uint8)  # noqa: E731
        return np.stack([scale(r), scale(g), scale(b)], -1), 3
    if bpp == 24:
        bgr = raw.reshape(h, w, 3)
        return bgr[:, :, ::-1], 3
    if bpp == 32:
        bgra = raw.reshape(h, w, 4)
        return bgra[:, :, [2, 1, 0, 3]], 4
    raise ValueError(f"TGA: unsupported depth {bpp}")


def decode_tga(buf: bytes) -> tuple[np.ndarray, int, int, int]:
    if len(buf) < 18:
        raise ValueError("TGA: truncated header")
    idlen, cmap_type, img_type = buf[0], buf[1], buf[2]
    w, h = struct.unpack("<HH", buf[12:16])
    bpp, desc = buf[16], buf[17]
    if cmap_type != 0 or img_type not in (2, 3, 10, 11):
        raise ValueError(f"TGA: unsupported type {img_type}/{cmap_type}")
    if not w or not h or w * h > 64_000_000:
        raise ValueError("TGA: bad dimensions")
    nbytes_px = bpp // 8
    if bpp not in (8, 16, 24, 32):
        raise ValueError(f"TGA: unsupported depth {bpp}")
    need = w * h * nbytes_px
    pos = 18 + idlen
    if img_type in (2, 3):  # uncompressed
        raw = np.frombuffer(buf, np.uint8, count=need, offset=pos) \
            if len(buf) >= pos + need else None
        if raw is None:
            raise ValueError("TGA: truncated pixel data")
    else:  # RLE: scan packets, then one vectorized repeat
        chunks = []
        got = 0
        while got < need:
            if pos >= len(buf):
                raise ValueError("TGA: truncated RLE stream")
            hdr = buf[pos]
            pos += 1
            count = (hdr & 0x7F) + 1
            if hdr & 0x80:  # run packet: one pixel repeated
                end = pos + nbytes_px
                if end > len(buf):
                    raise ValueError("TGA: truncated RLE run")
                one = np.frombuffer(buf, np.uint8, nbytes_px, pos)
                chunks.append(np.tile(one, count))
                pos = end
            else:  # raw packet
                end = pos + count * nbytes_px
                if end > len(buf):
                    raise ValueError("TGA: truncated RLE literals")
                chunks.append(np.frombuffer(
                    buf, np.uint8, count * nbytes_px, pos))
                pos = end
            got += count * nbytes_px
        raw = np.concatenate(chunks)[:need]
        if len(raw) < need:
            raise ValueError("TGA: RLE underflow")
    pixels, c = _tga_expand(raw, bpp, w, h)
    if not desc & 0x20:  # bottom-up origin (bit 5 clear)
        pixels = pixels[::-1]
    return np.ascontiguousarray(pixels), w, h, c


def encode_tga(px: np.ndarray, rle: bool = True) -> bytes:
    px = np.asarray(px, np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, c = px.shape
    if c == 1:
        body_px = px
        img_type, bpp, alpha_bits = 3, 8, 0
    elif c == 3:
        body_px = px[:, :, ::-1]
        img_type, bpp, alpha_bits = 2, 24, 0
    elif c == 4:
        body_px = px[:, :, [2, 1, 0, 3]]
        img_type, bpp, alpha_bits = 2, 32, 8
    else:
        raise ValueError("TGA encodes 1/3/4-channel pixels")
    flat = body_px.reshape(-1, c)
    if rle:
        img_type += 8
        out = bytearray()
        i = 0
        n = len(flat)
        while i < n:
            # measure the run of identical pixels at i (capped at 128)
            j = i + 1
            while j < n and j - i < 128 and np.array_equal(flat[j], flat[i]):
                j += 1
            if j - i >= 2:
                out.append(0x80 | (j - i - 1))
                out += flat[i].tobytes()
                i = j
            else:
                # literal packet: until the next run of ≥2 (capped at 128)
                k = i + 1
                while k < n and k - i < 128 and not (
                        k + 1 < n and np.array_equal(flat[k], flat[k + 1])):
                    k += 1
                out.append(k - i - 1)
                out += flat[i:k].tobytes()
                i = k
        body = bytes(out)
    else:
        body = flat.tobytes()
    header = struct.pack("<BBBHHBHHHHBB", 0, 0, img_type, 0, 0, 0,
                         0, 0, w, h, bpp, 0x20 | alpha_bits)  # top-down
    return header + body + b"\x00" * 8 + _TGA_FOOTER


# ---------------------------------------------------------------------------
# TIFF

_TIFF_TAGS = {256: "width", 257: "height", 258: "bits", 259: "compression",
              262: "photometric", 273: "strip_offsets", 277: "spp",
              278: "rows_per_strip", 279: "strip_counts", 317: "predictor",
              320: "colormap"}
_TIFF_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def _tiff_lzw_decode(data: bytes, expected: int) -> bytes:
    """TIFF-variant LZW: MSB-first bit packing, 9→12-bit codes with
    EARLY CHANGE (width bumps one code sooner than GIF), ClearCode 256,
    EOI 257."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    table: list[bytes] = []

    def reset():
        nonlocal table, width
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9

    width = 9
    reset()
    acc = 0
    nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            nbits -= width
            code = (acc >> nbits) & ((1 << width) - 1)
            if code == CLEAR:
                reset()
                prev = None
                continue
            if code == EOI:
                return bytes(out)
            if prev is None:
                if code >= len(table):
                    raise ValueError("TIFF LZW: bad first code")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("TIFF LZW: code out of range")
            out += entry
            prev = entry
            # early change: widen when the NEXT code would not fit
            if len(table) + 1 >= (1 << width) and width < 12:
                width += 1
            if len(out) > expected:
                raise ValueError("TIFF LZW: output overflow")
    return bytes(out)


def _tiff_lzw_encode(data: bytes) -> bytes:
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = 0
    nbits = 0
    width = 9

    def emit(code):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)
        acc &= (1 << nbits) - 1

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    nxt = 258
    emit(CLEAR)
    cur = b""
    for byte in data:
        cand = cur + bytes([byte])
        if cand in table:
            cur = cand
            continue
        emit(table[cur])
        table[cand] = nxt
        nxt += 1
        # early change: widen when the next code to be WRITTEN needs it
        if nxt + 1 > (1 << width) and width < 12:
            width += 1
        if nxt >= 4094:
            emit(CLEAR)
            table = {bytes([i]): i for i in range(256)}
            nxt = 258
            width = 9
        cur = bytes([byte])
    if cur:
        emit(table[cur])
    emit(EOI)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    pos = 0
    n = len(data)
    while pos < n and len(out) < expected:
        hdr = data[pos]
        pos += 1
        if hdr < 128:  # literal
            end = pos + hdr + 1
            if end > n:
                raise ValueError("PackBits: truncated literals")
            out += data[pos:end]
            pos = end
        elif hdr > 128:  # run of 257-hdr copies
            if pos >= n:
                raise ValueError("PackBits: truncated run")
            out += bytes([data[pos]]) * (257 - hdr)
            pos += 1
        # hdr == 128: no-op
    if len(out) < expected:
        raise ValueError("PackBits: underflow")
    return bytes(out[:expected])


def _packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        j = i + 1
        while j < n and j - i < 128 and data[j] == data[i]:
            j += 1
        if j - i >= 2:
            out.append(257 - (j - i))
            out.append(data[i])
            i = j
        else:
            k = i + 1
            while k < n and k - i < 128 and not (
                    k + 1 < n and data[k] == data[k + 1]):
                k += 1
            out.append(k - i - 1)
            out += data[i:k]
            i = k
    return bytes(out)


def decode_tiff(buf: bytes) -> tuple[np.ndarray, int, int, int]:
    if len(buf) < 8 or buf[:2] not in (b"II", b"MM"):
        raise ValueError("not a TIFF stream")
    bo = "<" if buf[:2] == b"II" else ">"
    magic, ifd_off = struct.unpack(bo + "HI", buf[2:8])
    if magic != 42:
        raise ValueError("TIFF: bad magic")

    def read_entry(off):
        tag, typ, count = struct.unpack(bo + "HHI", buf[off:off + 8])
        size = _TIFF_TYPE_SIZE.get(typ)
        if size is None:
            return tag, None
        total = size * count
        raw = buf[off + 8:off + 12] if total <= 4 else None
        if raw is None:
            (voff,) = struct.unpack(bo + "I", buf[off + 8:off + 12])
            raw = buf[voff:voff + total]
        if len(raw) < total:
            raise ValueError("TIFF: truncated tag value")
        fmt = {1: "B", 3: "H", 4: "I"}.get(typ)
        if fmt is None:
            return tag, None
        return tag, list(struct.unpack(bo + fmt * count, raw[:total]))

    if ifd_off + 2 > len(buf):
        raise ValueError("TIFF: truncated IFD")
    (nent,) = struct.unpack(bo + "H", buf[ifd_off:ifd_off + 2])
    tags = {}
    for e in range(nent):
        off = ifd_off + 2 + e * 12
        if off + 12 > len(buf):
            raise ValueError("TIFF: truncated IFD entry")
        tag, val = read_entry(off)
        name = _TIFF_TAGS.get(tag)
        if name and val is not None:
            tags[name] = val

    try:
        w, h = tags["width"][0], tags["height"][0]
        offsets, counts = tags["strip_offsets"], tags["strip_counts"]
    except KeyError as e:
        raise ValueError(f"TIFF: missing required tag {e}") from None
    comp = tags.get("compression", [1])[0]
    photo = tags.get("photometric", [1])[0]
    spp = tags.get("spp", [1])[0]
    bits = tags.get("bits", [8])
    predictor = tags.get("predictor", [1])[0]
    rps = tags.get("rows_per_strip", [h])[0] or h
    if any(b != 8 for b in bits):
        raise ValueError("TIFF: only 8-bit samples supported")
    if photo not in (0, 1, 2, 3):
        raise ValueError(f"TIFF: unsupported photometric {photo}")
    if not w or not h or w * h > 64_000_000:
        raise ValueError("TIFF: bad dimensions")

    rows = []
    row_bytes = w * spp
    for s, (off, cnt) in enumerate(zip(offsets, counts)):
        strip = buf[off:off + cnt]
        if len(strip) < cnt:
            raise ValueError("TIFF: truncated strip")
        nrows = min(rps, h - s * rps)
        expected = nrows * row_bytes
        if comp == 1:
            if len(strip) < expected:
                raise ValueError("TIFF: strip underflow")
            raw = strip[:expected]
        elif comp == 5:
            raw = _tiff_lzw_decode(strip, expected)[:expected]
            if len(raw) < expected:
                raise ValueError("TIFF: LZW strip underflow")
        elif comp == 32773:
            raw = _packbits_decode(strip, expected)
        else:
            raise ValueError(f"TIFF: unsupported compression {comp}")
        arr = np.frombuffer(raw, np.uint8).reshape(nrows, w, spp)
        if predictor == 2:
            arr = np.cumsum(arr.astype(np.uint16), axis=1).astype(np.uint8)
        rows.append(arr)
    px = np.concatenate(rows)
    if px.shape[0] != h:
        raise ValueError("TIFF: strip rows do not cover the image")
    if photo == 0:  # WhiteIsZero
        px = 255 - px
    elif photo == 3:  # palette
        cmap = tags.get("colormap")
        if not cmap or len(cmap) != 3 * 256:
            raise ValueError("TIFF: bad or missing colormap")
        lut = (np.array(cmap, np.uint32).reshape(3, 256).T // 257) \
            .astype(np.uint8)
        px = lut[px[:, :, 0]]
        spp = 3
    c = px.shape[2]
    return np.ascontiguousarray(px), w, h, c


def encode_tiff(px: np.ndarray, compression: str = "packbits") -> bytes:
    px = np.asarray(px, np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, c = px.shape
    if c not in (1, 3, 4):
        raise ValueError("TIFF encodes 1/3/4-channel pixels")
    comp_id = {"none": 1, "packbits": 32773, "lzw": 5}[compression]
    rps = max(1, min(h, 8192 // max(1, w * c // 8) or h))
    strips = []
    for y0 in range(0, h, rps):
        raw = px[y0:y0 + rps].tobytes()
        if comp_id == 32773:
            strips.append(_packbits_encode(raw))
        elif comp_id == 5:
            strips.append(_tiff_lzw_encode(raw))
        else:
            strips.append(raw)
    photometric = 1 if c == 1 else 2

    # layout: header(8) | strip data | IFD | tag values
    data_off = 8
    offsets = []
    pos = data_off
    for s in strips:
        offsets.append(pos)
        pos += len(s)
    ifd_off = pos + (pos & 1)

    entries = []  # (tag, type, count, value_bytes_or_int)

    def add(tag, typ, values):
        entries.append((tag, typ, values))

    add(256, 4, [w])
    add(257, 4, [h])
    add(258, 3, [8] * c)
    add(259, 3, [comp_id])
    add(262, 3, [photometric])
    add(273, 4, offsets)
    add(277, 3, [c])
    add(278, 4, [rps])
    add(279, 4, [len(s) for s in strips])
    entries.sort()

    fmt = {3: "H", 4: "I"}
    overflow = bytearray()
    ifd = struct.pack("<H", len(entries))
    overflow_base = ifd_off + 2 + len(entries) * 12 + 4
    for tag, typ, values in entries:
        size = _TIFF_TYPE_SIZE[typ] * len(values)
        packed = struct.pack("<" + fmt[typ] * len(values), *values)
        if size <= 4:
            val = packed + b"\x00" * (4 - size)
        else:
            val = struct.pack("<I", overflow_base + len(overflow))
            overflow += packed
        ifd += struct.pack("<HHI", tag, typ, len(values)) + val
    ifd += struct.pack("<I", 0)  # no next IFD

    out = bytearray(struct.pack("<2sHI", b"II", 42, ifd_off))
    for s in strips:
        out += s
    out += b"\x00" * (ifd_off - len(out))
    out += ifd + overflow
    return bytes(out)
