"""WebP LOSSLESS (VP8L) in pure numpy + stdlib — no codec library.

Decoder implements the full VP8L bitstream spec (the "WebP Lossless
Bitstream Specification", as shipped in libwebp): LSB-first bit
reading, canonical prefix codes (simple and code-length-coded normal
codes, single-symbol codes read zero bits), all four transforms
(predictor with the 14 spatial modes, cross-color, subtract-green,
color-indexing with sub-byte pixel packing), meta-prefix entropy
images, color cache, and LZ77 backward references with the 120-entry
2D distance-code mapping. Per-symbol Python loops are inherent —
prefix symbols are sequentially dependent — and bounded by the pixel
count, like the GIF/JPEG decoders in this package.

The encoder is the test-side dual: it emits VALID (not size-optimal)
streams using flat-length canonical codes, and can be steered to
exercise every decoder path — subtract-green, any single predictor
mode, a cross-color multiplier block, palette indexing (with packing),
color-cache hits, and LZ77 run references (both raw `dist+120` codes
and 2D plane codes). Lossless: encode→decode is the identity on
arbitrary uint8 pixels.

Lossy WebP (VP8) needs a boolean arithmetic decoder + loop filter and
stays a loud ``NotImplementedError`` stub, as does AVIF.

Reference for parity: libwebp src/dec/vp8l_dec.c (decode structure),
src/utils/huffman_utils.c (canonical tables), and the bitstream spec
in libwebp's doc/webp-lossless-bitstream-spec.txt.
"""

from __future__ import annotations

import struct

import numpy as np

# ------------------------------------------------------------- bit I/O


class _LsbReader:
    """LSB-first bit reader (VP8L convention, like DEFLATE)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def bits(self, k: int) -> int:
        while self.n < k:
            if self.pos >= len(self.data):
                raise ValueError("truncated VP8L stream")
            self.acc |= self.data[self.pos] << self.n
            self.pos += 1
            self.n += 8
        v = self.acc & ((1 << k) - 1)
        self.acc >>= k
        self.n -= k
        return v

    def bit(self) -> int:
        return self.bits(1)


class _LsbWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, width: int) -> None:
        self.acc |= (value & ((1 << width) - 1)) << self.n
        self.n += width
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def flush(self) -> bytes:
        if self.n:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.n = 0
        return bytes(self.out)


# ------------------------------------------------------- prefix codes


class _CanonCode:
    """Canonical prefix code from per-symbol code lengths. Codes are
    read MSB-first bit by bit (while scalars are LSB-first — that's
    the VP8L convention). A code with exactly one used symbol reads
    ZERO bits (libwebp huffman_utils.c special case)."""

    def __init__(self, lengths):
        syms = [(ln, s) for s, ln in enumerate(lengths) if ln > 0]
        if not syms:
            raise ValueError("empty prefix code")
        syms.sort()
        self.single = syms[0][1] if len(syms) == 1 else None
        if self.single is not None:
            # a one-symbol code reads/writes ZERO bits (libwebp special
            # case) — but keep the declared length for serialization
            self.codes = {self.single: (0, 0)}
            self.decl_length = syms[0][0]
            return
        self.mincode = {}
        self.maxcode = {}
        self.symbols = {}
        self.codes = {}  # symbol -> (code, length), for the encoder
        code = 0
        prev_len = 0
        for ln, s in syms:
            code <<= (ln - prev_len)
            prev_len = ln
            if ln not in self.mincode:
                self.mincode[ln] = code
                self.symbols[ln] = []
            self.maxcode[ln] = code
            self.symbols[ln].append(s)
            self.codes[s] = (code, ln)
            code += 1

    def decode(self, rd: _LsbReader) -> int:
        if self.single is not None:
            return self.single
        code, ln = 0, 0
        while True:
            code = (code << 1) | rd.bit()
            ln += 1
            if ln > 15:
                raise ValueError("invalid VP8L prefix code")
            if ln in self.mincode and \
                    self.mincode[ln] <= code <= self.maxcode[ln]:
                return self.symbols[ln][code - self.mincode[ln]]


#: order in which code-length-code lengths are stored (spec §6.2.2)
_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12,
             13, 14, 15)


def _read_code(rd: _LsbReader, alphabet: int) -> _CanonCode:
    """Read one prefix code: simple (1-2 symbols) or normal
    (code-length-coded, with 16/17/18 repeats, optional max-symbol)."""
    if rd.bit():  # simple
        num_symbols = rd.bit() + 1
        first_8bit = rd.bit()
        lengths = [0] * alphabet
        s0 = rd.bits(8 if first_8bit else 1)
        if s0 >= alphabet:
            raise ValueError("simple-code symbol out of range")
        lengths[s0] = 1
        if num_symbols == 2:
            s1 = rd.bits(8)
            if s1 >= alphabet:
                raise ValueError("simple-code symbol out of range")
            lengths[s1] = 1
        return _CanonCode(lengths)
    num_cl = 4 + rd.bits(4)
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[_CL_ORDER[i]] = rd.bits(3)
    cl_code = _CanonCode(cl_lengths)
    if rd.bit():  # use max-symbol cap
        length_nbits = 2 + 2 * rd.bits(3)
        max_symbol = 2 + rd.bits(length_nbits)
    else:
        max_symbol = alphabet
    lengths = [0] * alphabet
    symbol = 0
    prev_len = 8  # spec default
    while symbol < alphabet:
        if max_symbol == 0:
            break
        max_symbol -= 1
        cl = cl_code.decode(rd)
        if cl < 16:
            lengths[symbol] = cl
            symbol += 1
            if cl:
                prev_len = cl
        else:
            extra, base, use_prev = {16: (2, 3, True), 17: (3, 3, False),
                                     18: (7, 11, False)}[cl]
            repeat = base + rd.bits(extra)
            fill = prev_len if use_prev else 0
            if symbol + repeat > alphabet:
                raise ValueError("code-length repeat overflows alphabet")
            for _ in range(repeat):
                lengths[symbol] = fill
                symbol += 1
    return _CanonCode(lengths)


# -------------------------------------------------- LZ77 prefix values


def _lz77_value(sym: int, rd: _LsbReader) -> int:
    """Prefix-coded length/distance value (spec §5.2.2)."""
    if sym < 4:
        return sym + 1
    extra = (sym - 2) >> 1
    offset = (2 + (sym & 1)) << extra
    return offset + rd.bits(extra) + 1


def _lz77_prefix(v: int) -> tuple[int, int, int]:
    """Inverse of :func:`_lz77_value`: value → (symbol, n_extra, extra)."""
    x = v - 1
    if x < 4:
        return x, 0, 0
    n = x.bit_length() - 1
    if x < (3 << (n - 1)):
        return 2 * n, n - 1, x - (1 << n)
    return 2 * n + 1, n - 1, x - (3 << (n - 1))


#: the 120 2D distance codes as (yoffset<<4 | (xoffset+8)) bytes, in
#: spec order — nondecreasing y²+x², ties y-descending, -x before +x
#: (structure asserted by tests/test_webp.py)
_PLANE_CODES = bytes([
    0x18, 0x07, 0x17, 0x19, 0x28, 0x06, 0x27, 0x29, 0x16, 0x1A,
    0x26, 0x2A, 0x38, 0x05, 0x37, 0x39, 0x15, 0x1B, 0x36, 0x3A,
    0x25, 0x2B, 0x48, 0x04, 0x47, 0x49, 0x14, 0x1C, 0x35, 0x3B,
    0x46, 0x4A, 0x24, 0x2C, 0x58, 0x45, 0x4B, 0x34, 0x3C, 0x03,
    0x57, 0x59, 0x13, 0x1D, 0x56, 0x5A, 0x23, 0x2D, 0x44, 0x4C,
    0x55, 0x5B, 0x33, 0x3D, 0x68, 0x02, 0x67, 0x69, 0x12, 0x1E,
    0x66, 0x6A, 0x22, 0x2E, 0x54, 0x5C, 0x43, 0x4D, 0x65, 0x6B,
    0x32, 0x3E, 0x78, 0x01, 0x77, 0x79, 0x53, 0x5D, 0x11, 0x1F,
    0x64, 0x6C, 0x42, 0x4E, 0x76, 0x7A, 0x21, 0x2F, 0x75, 0x7B,
    0x31, 0x3F, 0x63, 0x6D, 0x52, 0x5E, 0x00, 0x74, 0x7C, 0x41,
    0x4F, 0x10, 0x20, 0x62, 0x6E, 0x30, 0x73, 0x7D, 0x51, 0x5F,
    0x40, 0x72, 0x7E, 0x61, 0x6F, 0x50, 0x71, 0x7F, 0x60, 0x70,
])


def _plane_code_to_distance(xsize: int, code: int) -> int:
    if code > len(_PLANE_CODES):
        return code - len(_PLANE_CODES)
    b = _PLANE_CODES[code - 1]
    yoff, xoff = b >> 4, (b & 0x0F) - 8
    dist = yoff * xsize + xoff
    return dist if dist >= 1 else 1


def _distance_to_plane_code(xsize: int) -> dict[int, int]:
    """distance → smallest 2D plane code, for the encoder."""
    out: dict[int, int] = {}
    for i, b in enumerate(_PLANE_CODES):
        d = (b >> 4) * xsize + (b & 0x0F) - 8
        if d >= 1 and d not in out:
            out[d] = i + 1
    return out


# --------------------------------------------------- pixel arithmetic


def _sub_size(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


def _add_px(a: int, b: int) -> int:
    """Per-channel uint8 addition of two ARGB words (mod 256)."""
    return ((((a & 0x00FF00FF) + (b & 0x00FF00FF)) & 0x00FF00FF)
            | (((a & 0xFF00FF00) + (b & 0xFF00FF00)) & 0xFF00FF00))


def _sub_px(a: int, b: int) -> int:
    """Per-channel uint8 subtraction (mod 256): each lane is biased by
    256 before subtracting so borrows never cross lanes."""
    lo = (((a & 0x00FF00FF) | 0x01000100) - (b & 0x00FF00FF)) & 0x00FF00FF
    hi = ((((a >> 8) & 0x00FF00FF) | 0x01000100)
          - ((b >> 8) & 0x00FF00FF)) & 0x00FF00FF
    return lo | (hi << 8)


def _avg2(a: int, b: int) -> int:
    """Per-channel floor average (SWAR, exact)."""
    return (((a ^ b) & 0xFEFEFEFE) >> 1) + (a & b)


def _select(t: int, left: int, tl: int) -> int:
    pa_minus_pb = 0
    for sh in (24, 16, 8, 0):
        ac, bc, cc = (t >> sh) & 0xFF, (left >> sh) & 0xFF, (tl >> sh) & 0xFF
        pa_minus_pb += abs(bc - cc) - abs(ac - cc)
    return t if pa_minus_pb <= 0 else left


def _clamp_add_sub_full(left: int, t: int, tl: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        v = ((left >> sh) & 0xFF) + ((t >> sh) & 0xFF) - ((tl >> sh) & 0xFF)
        out |= max(0, min(255, v)) << sh
    return out


def _clamp_add_sub_half(left: int, t: int, tl: int) -> int:
    ave = _avg2(left, t)
    out = 0
    for sh in (24, 16, 8, 0):
        a, b = (ave >> sh) & 0xFF, (tl >> sh) & 0xFF
        v = a + int((a - b) / 2)  # C-style truncation toward zero
        out |= max(0, min(255, v)) << sh
    return out


def _predict(mode: int, left: int, t: int, tl: int, tr: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return left
    if mode == 2:
        return t
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return _avg2(_avg2(left, tr), t)
    if mode == 6:
        return _avg2(left, tl)
    if mode == 7:
        return _avg2(left, t)
    if mode == 8:
        return _avg2(tl, t)
    if mode == 9:
        return _avg2(t, tr)
    if mode == 10:
        return _avg2(_avg2(left, tl), _avg2(t, tr))
    if mode == 11:
        return _select(t, left, tl)
    if mode == 12:
        return _clamp_add_sub_full(left, t, tl)
    if mode == 13:
        return _clamp_add_sub_half(left, t, tl)
    raise ValueError(f"invalid predictor mode {mode}")


def _s8(v: int) -> int:
    return v - 256 if v >= 128 else v


def _ct_delta(pred: int, color: int) -> int:
    """(int8)pred * (int8)color >> 5, arithmetic shift."""
    return (_s8(pred) * _s8(color)) >> 5


# ------------------------------------------------------------ decoder


def _decode_pixels(rd, xs, ys, groups, meta, meta_w, hbits, cache_bits):
    """The spatially-coded image main loop (spec §5): literals, LZ77
    backward references, color-cache hits."""
    n = xs * ys
    argb = np.zeros(n, np.uint32)
    cache = [0] * (1 << cache_bits) if cache_bits else None
    cache_shift = 32 - cache_bits if cache_bits else 0
    pos = 0
    group = groups[0]
    while pos < n:
        if meta is not None:
            y, x = divmod(pos, xs)
            group = groups[int(meta[(y >> hbits) * meta_w
                                    + (x >> hbits)])]
        g_code, r_code, b_code, a_code, d_code = group
        s = g_code.decode(rd)
        if s < 256:  # literal
            red = r_code.decode(rd)
            blue = b_code.decode(rd)
            alpha = a_code.decode(rd)
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            argb[pos] = px
            if cache is not None:
                cache[(0x1E35A7BD * px & 0xFFFFFFFF) >> cache_shift] = px
            pos += 1
        elif s < 256 + 24:  # LZ77 backward reference
            length = _lz77_value(s - 256, rd)
            dist_code = _lz77_value(d_code.decode(rd), rd)
            dist = _plane_code_to_distance(xs, dist_code)
            if dist > pos or pos + length > n:
                raise ValueError("VP8L backward reference out of range")
            for _ in range(length):
                px = int(argb[pos - dist])
                argb[pos] = px
                if cache is not None:
                    cache[(0x1E35A7BD * px & 0xFFFFFFFF)
                          >> cache_shift] = px
                pos += 1
        else:  # color-cache hit
            if cache is None:
                raise ValueError("cache symbol without color cache")
            idx = s - 256 - 24
            if idx >= len(cache):
                raise ValueError("color-cache index out of range")
            argb[pos] = cache[idx]
            pos += 1
    return argb


def _inverse_predictor(res: np.ndarray, modes: np.ndarray, bits: int,
                       xs: int, ys: int) -> np.ndarray:
    out = np.zeros(xs * ys, np.uint32)
    mw = _sub_size(xs, bits)
    for y in range(ys):
        row = y * xs
        for x in range(xs):
            i = row + x
            if y == 0:
                pred = 0xFF000000 if x == 0 else int(out[i - 1])
            elif x == 0:
                pred = int(out[i - xs])
            else:
                mode = (int(modes[(y >> bits) * mw + (x >> bits)])
                        >> 8) & 0xFF
                # TR at the last column wraps to this row's first pixel
                # (libwebp memory layout: upper[x+1] == row start)
                pred = _predict(mode, int(out[i - 1]), int(out[i - xs]),
                                int(out[i - xs - 1]), int(out[i - xs + 1]))
            out[i] = _add_px(int(res[i]), pred)
    return out


def _s8v(a: np.ndarray) -> np.ndarray:
    """uint8-valued int array → signed-int8 values (vectorized)."""
    a = a.astype(np.int32)
    return np.where(a >= 128, a - 256, a)


def _inverse_color(img: np.ndarray, cts: np.ndarray, bits: int,
                   xs: int, ys: int) -> np.ndarray:
    """Vectorized cross-color inverse: the transform is
    pixel-independent given the tile multipliers (unlike the
    predictor, which is genuinely sequential)."""
    im = img.reshape(ys, xs)
    mw = _sub_size(xs, bits)
    tile = cts.reshape(-1, mw)[
        (np.arange(ys) >> bits)[:, None], np.arange(xs) >> bits]
    g2r = _s8v(tile & 0xFF)
    g2b = _s8v((tile >> 8) & 0xFF)
    r2b = _s8v((tile >> 16) & 0xFF)
    green = _s8v((im >> 8) & 0xFF)
    red = (((im >> 16) & 0xFF).astype(np.int32)
           + ((g2r * green) >> 5)) & 0xFF
    blue = ((im & 0xFF).astype(np.int32) + ((g2b * green) >> 5)
            + ((r2b * _s8v(red)) >> 5)) & 0xFF
    out = (im & np.uint32(0xFF00FF00)) | (red.astype(np.uint32) << 16) \
        | blue.astype(np.uint32)
    return out.ravel().astype(np.uint32)


def _inverse_subtract_green(img: np.ndarray) -> np.ndarray:
    g = (img >> 8) & 0xFF
    r = (((img >> 16) & 0xFF) + g) & 0xFF
    b = ((img & 0xFF) + g) & 0xFF
    return ((img & 0xFF00FF00) | (r << 16) | b).astype(np.uint32)


def _inverse_palette(img: np.ndarray, palette: np.ndarray, pbits: int,
                     xs: int, ys: int) -> np.ndarray:
    """Index → color, unpacking sub-byte packed pixels (LSB-first
    within the green byte, libwebp ColorIndexInverseTransform)."""
    n_colors = len(palette)
    if pbits:
        per = 1 << pbits
        bpp = 8 >> pbits
        mask = (1 << bpp) - 1
        packed_w = _sub_size(xs, pbits)
        g = (img.reshape(ys, packed_w) >> 8) & 0xFF
        xcol = np.arange(xs)
        shift = (bpp * (xcol % per)).astype(np.uint32)
        idx = ((g[:, xcol >> pbits] >> shift) & mask).ravel()
    else:
        idx = (img >> 8) & 0xFF
    if int(idx.max(initial=0)) >= n_colors:
        raise ValueError("palette index out of range")
    return palette[idx.astype(np.int64)]


def _decode_image_stream(rd: _LsbReader, xs: int, ys: int,
                         level0: bool) -> np.ndarray:
    transforms = []
    if level0:
        seen = set()
        while rd.bit():
            ttype = rd.bits(2)
            if ttype in seen:
                raise ValueError("duplicate VP8L transform")
            seen.add(ttype)
            if ttype == 3:  # color indexing
                n_colors = rd.bits(8) + 1
                pbits = 0 if n_colors > 16 else \
                    1 if n_colors > 4 else 2 if n_colors > 2 else 3
                pal_deltas = _decode_image_stream(rd, n_colors, 1, False)
                # palette entries are component-wise deltas (spec §4.4)
                pal = np.zeros(n_colors, np.uint32)
                prev = 0
                for i in range(n_colors):
                    prev = _add_px(prev, int(pal_deltas[i]))
                    pal[i] = prev
                transforms.append(("palette", xs, pal, pbits))
                if pbits:
                    xs = _sub_size(xs, pbits)
            elif ttype in (0, 1):
                bits = rd.bits(3) + 2
                sub = _decode_image_stream(
                    rd, _sub_size(xs, bits), _sub_size(ys, bits), False)
                transforms.append(
                    ("predictor" if ttype == 0 else "color", xs, sub, bits))
            else:  # subtract green
                transforms.append(("subgreen", xs))
    cache_bits = 0
    if rd.bit():
        cache_bits = rd.bits(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("invalid color-cache size")
    meta = None
    meta_w = hbits = 0
    ngroups = 1
    if level0 and rd.bit():  # meta prefix codes (entropy image)
        hbits = rd.bits(3) + 2
        meta_w = _sub_size(xs, hbits)
        ent = _decode_image_stream(rd, meta_w, _sub_size(ys, hbits), False)
        meta = ((ent >> 8) & 0xFFFF).astype(np.int64)
        ngroups = int(meta.max()) + 1
    green_alpha = 256 + 24 + ((1 << cache_bits) if cache_bits else 0)
    groups = []
    for _ in range(ngroups):
        groups.append((_read_code(rd, green_alpha), _read_code(rd, 256),
                       _read_code(rd, 256), _read_code(rd, 256),
                       _read_code(rd, 40)))
    img = _decode_pixels(rd, xs, ys, groups, meta, meta_w, hbits,
                         cache_bits)
    for t in reversed(transforms):
        if t[0] == "palette":
            _, full_xs, pal, pbits = t
            img = _inverse_palette(img, pal, pbits, full_xs, ys)
            xs = full_xs
        elif t[0] == "predictor":
            img = _inverse_predictor(img, t[2], t[3], t[1], ys)
        elif t[0] == "color":
            img = _inverse_color(img, t[2], t[3], t[1], ys)
        else:
            img = _inverse_subtract_green(img)
    return img


def decode_webp(buf: bytes) -> tuple[np.ndarray, int, int, int]:
    """RIFF walk → VP8L payload → pixels. Lossy VP8 and AVIF stay loud
    stubs (arithmetic-coded; codec libs absent from this container)."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"WEBP":
        raise ValueError("not a WebP")
    pos = 12
    payload = None
    while pos + 8 <= len(buf):
        tag = buf[pos:pos + 4]
        (ln,) = struct.unpack_from("<I", buf, pos + 4)
        data = buf[pos + 8: pos + 8 + ln]
        if tag == b"VP8L":
            payload = data
            break
        if tag == b"VP8 ":
            raise NotImplementedError(
                "lossy WebP (VP8) needs a boolean arithmetic decoder — "
                "not available in this environment; VP8L (lossless) "
                "decodes")
        pos += 8 + ln + (ln & 1)  # chunks pad to even size
    if payload is None:
        raise ValueError("WebP contains no VP8L chunk")
    rd = _LsbReader(payload)
    if rd.bits(8) != 0x2F:
        raise ValueError("bad VP8L signature")
    w = rd.bits(14) + 1
    h = rd.bits(14) + 1
    alpha_hint = rd.bit()
    if rd.bits(3) != 0:
        raise ValueError("unknown VP8L version")
    argb = _decode_image_stream(rd, w, h, True)
    a = ((argb >> 24) & 0xFF).astype(np.uint8)
    r = ((argb >> 16) & 0xFF).astype(np.uint8)
    g = ((argb >> 8) & 0xFF).astype(np.uint8)
    b = (argb & 0xFF).astype(np.uint8)
    if alpha_hint:
        px = np.stack([r, g, b, a], axis=-1).reshape(h, w, 4)
        return px, w, h, 4
    px = np.stack([r, g, b], axis=-1).reshape(h, w, 3)
    return px, w, h, 3


# ------------------------------------------------------------ encoder
#
# Test-side dual: VALID (not size-optimal) streams. Every prefix code
# is either simple (1-2 symbols) or a flat-length canonical code, so
# the decoder's table reconstruction is what round-trips exercise.


def _put_code(bw: _LsbWriter, code: int, length: int) -> None:
    """Emit a prefix code MSB-first, one bit at a time (the decoder
    reads code bits individually from the LSB-first stream)."""
    for j in range(length - 1, -1, -1):
        bw.put((code >> j) & 1, 1)


def _rle_lengths(lengths) -> list[tuple[int, int, int]]:
    """DEFLATE-style RLE of a code-length array into code-length-code
    tokens (symbol, n_extra_bits, extra_value), covering the WHOLE
    alphabet (the decoder reads until the alphabet is full)."""
    tokens: list[tuple[int, int, int]] = []
    prev = 8  # decoder's default prev_code_len
    i, n = 0, len(lengths)
    while i < n:
        v = lengths[i]
        j = i
        while j < n and lengths[j] == v:
            j += 1
        run = j - i
        if v == 0:
            while run >= 11:
                take = min(run, 138)
                tokens.append((18, 7, take - 11))
                run -= take
            while run >= 3:
                take = min(run, 10)
                tokens.append((17, 3, take - 3))
                run -= take
            while run:
                tokens.append((0, 0, 0))
                run -= 1
        else:
            if v != prev:
                tokens.append((v, 0, 0))
                run -= 1
                prev = v
            while run >= 3:
                take = min(run, 6)
                tokens.append((16, 2, take - 3))
                run -= take
            while run:
                tokens.append((v, 0, 0))
                run -= 1
        i = j
    return tokens


def _flat_code(freqs: dict[int, int], alphabet: int) -> _CanonCode:
    """Flat-length canonical code over the used symbols (valid for any
    used-count ≤ 2^L; incomplete codes are fine — only emitted symbols
    are ever decoded)."""
    used = sorted(s for s, f in freqs.items() if f)
    if not used:
        used = [0]  # never-decoded placeholder (e.g. distance code)
    lengths = [0] * alphabet
    bits = max(1, (len(used) - 1).bit_length())
    for s in used:
        lengths[s] = 1 if len(used) == 1 else bits
    return _CanonCode(lengths)


def _write_code(bw: _LsbWriter, code: _CanonCode, alphabet: int) -> None:
    """Serialize one prefix code: simple form when its symbols fit,
    else the normal code-length-coded form."""
    used = sorted(code.codes)
    if len(used) <= 2 and used[-1] < 256:
        bw.put(1, 1)  # simple
        bw.put(len(used) - 1, 1)
        s0 = used[0]
        if s0 <= 1:
            bw.put(0, 1)
            bw.put(s0, 1)
        else:
            bw.put(1, 1)
            bw.put(s0, 8)
        if len(used) == 2:
            bw.put(used[1], 8)
        return
    lengths = [0] * alphabet
    if code.single is not None:  # zero-bit code, but serialized length
        lengths[code.single] = code.decl_length
    else:
        for s, (_c, ln) in code.codes.items():
            lengths[s] = ln
    tokens = _rle_lengths(lengths)
    cl_used = sorted({t[0] for t in tokens})
    if len(cl_used) == 1:  # pad: a 1-symbol cl-code would read 0 bits
        cl_used.append(0 if cl_used[0] != 0 else 1)
        cl_used.sort()
    cl_bits = max(1, (len(cl_used) - 1).bit_length())
    cl_lengths = [0] * 19
    for s in cl_used:
        cl_lengths[s] = cl_bits
    cl_code = _CanonCode(cl_lengths)
    num_cl = max(4, 1 + max(i for i, s in enumerate(_CL_ORDER)
                            if cl_lengths[s]))
    bw.put(0, 1)  # normal
    bw.put(num_cl - 4, 4)
    for i in range(num_cl):
        bw.put(cl_lengths[_CL_ORDER[i]], 3)
    bw.put(0, 1)  # no max-symbol cap
    for sym, nb, ev in tokens:
        c, ln = cl_code.codes[sym]
        _put_code(bw, c, ln)
        if nb:
            bw.put(ev, nb)


def _plan_tokens(argb: np.ndarray, xs: int, cache_bits: int,
                 lz77_dists: tuple[int, ...]):
    """Single deterministic pass producing the symbol plan (shared by
    the frequency count and the emission)."""
    n = len(argb)
    cache = [0] * (1 << cache_bits) if cache_bits else None
    shift = 32 - cache_bits if cache_bits else 0
    plane_map = _distance_to_plane_code(xs)
    tokens = []
    pos = 0
    vals = [int(v) for v in argb]
    while pos < n:
        matched = False
        for d in lz77_dists:
            if d < 1 or d > pos:
                continue
            ln = 0
            while pos + ln < n and ln < 4096 \
                    and vals[pos + ln] == vals[pos + ln - d]:
                ln += 1
            if ln >= 3:
                tokens.append(("copy", ln, plane_map.get(d, d + 120)))
                if cache is not None:
                    for k in range(ln):
                        px = vals[pos + k]
                        cache[(0x1E35A7BD * px & 0xFFFFFFFF) >> shift] = px
                pos += ln
                matched = True
                break
        if matched:
            continue
        px = vals[pos]
        if cache is not None:
            idx = (0x1E35A7BD * px & 0xFFFFFFFF) >> shift
            if cache[idx] == px:
                tokens.append(("cache", idx))
                pos += 1
                continue
            cache[idx] = px
        tokens.append(("lit", (px >> 24) & 0xFF, (px >> 16) & 0xFF,
                       (px >> 8) & 0xFF, px & 0xFF))
        pos += 1
    return tokens


def _write_body(bw: _LsbWriter, argb: np.ndarray, xs: int,
                cache_bits: int = 0,
                lz77_dists: tuple[int, ...] = ()) -> None:
    """Prefix codes + spatially-coded pixels (the part after the
    cache-bit/meta-bit header fields)."""
    tokens = _plan_tokens(argb, xs, cache_bits, lz77_dists)
    green_alpha = 256 + 24 + ((1 << cache_bits) if cache_bits else 0)
    freqs = [dict() for _ in range(5)]  # green/red/blue/alpha/dist

    def bump(i, s):
        freqs[i][s] = freqs[i].get(s, 0) + 1

    for t in tokens:
        if t[0] == "lit":
            _, a, r, g, b = t
            bump(0, g)
            bump(1, r)
            bump(2, b)
            bump(3, a)
        elif t[0] == "copy":
            bump(0, 256 + _lz77_prefix(t[1])[0])
            bump(4, _lz77_prefix(t[2])[0])
        else:
            bump(0, 256 + 24 + t[1])
    codes = [_flat_code(freqs[0], green_alpha), _flat_code(freqs[1], 256),
             _flat_code(freqs[2], 256), _flat_code(freqs[3], 256),
             _flat_code(freqs[4], 40)]
    for i, c in enumerate(codes):
        _write_code(bw, c, green_alpha if i == 0 else (40 if i == 4
                                                       else 256))
    for t in tokens:
        if t[0] == "lit":
            _, a, r, g, b = t
            _put_code(bw, *codes[0].codes[g])
            _put_code(bw, *codes[1].codes[r])
            _put_code(bw, *codes[2].codes[b])
            _put_code(bw, *codes[3].codes[a])
        elif t[0] == "copy":
            _, length, dist_code = t
            lsym, lnb, lev = _lz77_prefix(length)
            _put_code(bw, *codes[0].codes[256 + lsym])
            if lnb:
                bw.put(lev, lnb)
            dsym, dnb, dev = _lz77_prefix(dist_code)
            _put_code(bw, *codes[4].codes[dsym])
            if dnb:
                bw.put(dev, dnb)
        else:
            _put_code(bw, *codes[0].codes[256 + 24 + t[1]])


def _write_substream(bw: _LsbWriter, argb: np.ndarray, xs: int) -> None:
    """A sub-resolution image stream: no transforms, no meta codes —
    just [cache bit = 0][codes][pixels]."""
    bw.put(0, 1)
    _write_body(bw, argb, xs)


def _write_body_meta(bw: _LsbWriter, argb: np.ndarray, xs: int, ys: int,
                     meta_bits: int) -> None:
    """All-literal body with a meta-prefix entropy image: two Huffman
    groups assigned by tile-column parity (exercises the decoder's
    per-tile group lookup). The entropy image itself is a substream
    whose (red<<8 | green) channels carry the group index."""
    mw, mh = _sub_size(xs, meta_bits), _sub_size(ys, meta_bits)
    tile_idx = (np.arange(mw * mh, dtype=np.uint32) % mw) % 2
    _write_substream(bw, (tile_idx << 8).astype(np.uint32), mw)
    groups = [[dict() for _ in range(5)] for _ in range(2)]
    vals = [int(v) for v in argb]
    gsel = []
    for pos, px in enumerate(vals):
        y, x = divmod(pos, xs)
        gi = int(tile_idx[(y >> meta_bits) * mw + (x >> meta_bits)])
        gsel.append(gi)
        f = groups[gi]
        for i, s in ((0, (px >> 8) & 0xFF), (1, (px >> 16) & 0xFF),
                     (2, px & 0xFF), (3, (px >> 24) & 0xFF)):
            f[i][s] = f[i].get(s, 0) + 1
    all_codes = []
    for f in groups:
        codes = [_flat_code(f[0], 256 + 24), _flat_code(f[1], 256),
                 _flat_code(f[2], 256), _flat_code(f[3], 256),
                 _flat_code(f[4], 40)]
        for i, c in enumerate(codes):
            _write_code(bw, c, (256 + 24) if i == 0 else
                        (40 if i == 4 else 256))
        all_codes.append(codes)
    for pos, px in enumerate(vals):
        codes = all_codes[gsel[pos]]
        _put_code(bw, *codes[0].codes[(px >> 8) & 0xFF])
        _put_code(bw, *codes[1].codes[(px >> 16) & 0xFF])
        _put_code(bw, *codes[2].codes[px & 0xFF])
        _put_code(bw, *codes[3].codes[(px >> 24) & 0xFF])


def _fwd_predict(argb: np.ndarray, mode: int, bits: int, xs: int,
                 ys: int) -> np.ndarray:
    """Forward predictor residuals with the decoder's edge rules."""
    res = np.empty_like(argb)
    for y in range(ys):
        row = y * xs
        for x in range(xs):
            i = row + x
            if y == 0:
                pred = 0xFF000000 if x == 0 else int(argb[i - 1])
            elif x == 0:
                pred = int(argb[i - xs])
            else:
                pred = _predict(mode, int(argb[i - 1]), int(argb[i - xs]),
                                int(argb[i - xs - 1]),
                                int(argb[i - xs + 1]))
            res[i] = _sub_px(int(argb[i]), pred)
    return res


def encode_webp_lossless(px: np.ndarray, *, subtract_green: bool = False,
                         predictor: int | None = None,
                         color_mult: tuple[int, int, int] | None = None,
                         palette: bool = False, cache_bits: int = 0,
                         lz77_dists: tuple[int, ...] = (),
                         transform_bits: int = 4,
                         meta_bits: int | None = None) -> bytes:
    """Encode (h, w) or (h, w, c∈{1,2,3,4}) uint8 → lossless WebP.
    The keyword switches steer which decoder paths the stream uses;
    ``color_mult`` is (green_to_red, green_to_blue, red_to_blue) bytes;
    ``palette`` is exclusive with the other transforms."""
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, c = px.shape
    if c not in (1, 2, 3, 4):
        raise ValueError("1-4 channels only")
    if palette and (subtract_green or predictor is not None or color_mult):
        raise ValueError("palette is exclusive with other transforms")
    if not (1 <= w <= 16384 and 1 <= h <= 16384):
        raise ValueError("VP8L dimensions are 14-bit (1..16384)")
    f = px.astype(np.uint32)
    if c == 1:
        a, r, g, b = np.full_like(f[:, :, 0], 255), f[:, :, 0], \
            f[:, :, 0], f[:, :, 0]
    elif c == 2:
        a, r, g, b = f[:, :, 1], f[:, :, 0], f[:, :, 0], f[:, :, 0]
    elif c == 3:
        a, r, g, b = np.full_like(f[:, :, 0], 255), f[:, :, 0], \
            f[:, :, 1], f[:, :, 2]
    else:
        a, r, g, b = f[:, :, 3], f[:, :, 0], f[:, :, 1], f[:, :, 2]
    argb = ((a << 24) | (r << 16) | (g << 8) | b).ravel()
    has_alpha = c in (2, 4)

    bw = _LsbWriter()
    bw.put(0x2F, 8)
    bw.put(w - 1, 14)
    bw.put(h - 1, 14)
    bw.put(1 if has_alpha else 0, 1)
    bw.put(0, 3)
    xs = w
    tb = transform_bits
    if palette:
        colors: list[int] = []
        index_of: dict[int, int] = {}
        for v in argb:
            v = int(v)
            if v not in index_of:
                index_of[v] = len(colors)
                colors.append(v)
        if len(colors) > 256:
            raise ValueError("more than 256 colors — palette impossible")
        idx = np.array([index_of[int(v)] for v in argb], np.uint32)
        nc = len(colors)
        pbits = 0 if nc > 16 else 1 if nc > 4 else 2 if nc > 2 else 3
        bw.put(1, 1)
        bw.put(3, 2)
        bw.put(nc - 1, 8)
        deltas = np.empty(nc, np.uint32)
        prev = 0
        for i, col in enumerate(colors):
            deltas[i] = _sub_px(col, prev)
            prev = col
        _write_substream(bw, deltas, nc)
        if pbits:
            per = 1 << pbits
            bpp = 8 >> pbits
            packed_w = _sub_size(w, pbits)
            packed = np.zeros(packed_w * h, np.uint32)
            for y in range(h):
                for x in range(w):
                    packed[y * packed_w + (x >> pbits)] |= \
                        int(idx[y * w + x]) << (bpp * (x % per) + 8)
            argb = packed
            xs = packed_w
        else:
            argb = (idx << 8).astype(np.uint32)
    else:
        if subtract_green:
            bw.put(1, 1)
            bw.put(2, 2)
            gch = (argb >> 8) & 0xFF
            rr = (((argb >> 16) & 0xFF) - gch) & 0xFF
            bb = ((argb & 0xFF) - gch) & 0xFF
            argb = ((argb & 0xFF00FF00) | (rr << 16) | bb).astype(np.uint32)
        if color_mult is not None:
            g2r, g2b, r2b = color_mult
            bw.put(1, 1)
            bw.put(1, 2)
            bw.put(tb - 2, 3)
            mw, mh = _sub_size(xs, tb), _sub_size(h, tb)
            ct = (r2b << 16) | (g2b << 8) | g2r
            _write_substream(bw, np.full(mw * mh, ct, np.uint32), mw)
            out = np.empty_like(argb)
            for i, v in enumerate(argb):
                v = int(v)
                gch = (v >> 8) & 0xFF
                rr = (v >> 16) & 0xFF
                sr = (rr - _ct_delta(g2r, gch)) & 0xFF
                sb = ((v & 0xFF) - _ct_delta(g2b, gch)
                      - _ct_delta(r2b, rr)) & 0xFF
                out[i] = (v & 0xFF00FF00) | (sr << 16) | sb
            argb = out
        if predictor is not None:
            bw.put(1, 1)
            bw.put(0, 2)
            bw.put(tb - 2, 3)
            mw, mh = _sub_size(xs, tb), _sub_size(h, tb)
            _write_substream(
                bw, np.full(mw * mh, predictor << 8, np.uint32), mw)
            argb = _fwd_predict(argb, predictor, tb, xs, h)
    bw.put(0, 1)  # end of transforms
    if cache_bits:
        bw.put(1, 1)
        bw.put(cache_bits, 4)
    else:
        bw.put(0, 1)
    if meta_bits is not None:
        if cache_bits or lz77_dists:
            raise ValueError("meta_bits is literal-only in this encoder")
        bw.put(1, 1)
        bw.put(meta_bits - 2, 3)
        _write_body_meta(bw, argb, xs, h, meta_bits)
    else:
        bw.put(0, 1)  # no meta prefix codes
        _write_body(bw, argb, xs, cache_bits, lz77_dists)
    payload = bw.flush()
    vp8l = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        vp8l += b"\x00"
    riff = b"WEBP" + vp8l
    return b"RIFF" + struct.pack("<I", len(riff)) + riff
