"""Sequential AND progressive JPEG (ITU-T T.81 / JFIF) in pure numpy
+ stdlib.

No codec library: the decoder parses DQT/SOF/DHT/DRI/SOS segments,
entropy-decodes every scan with canonical Huffman tables reconstructed
from the file's own DHT segments (per-symbol Python loop — inherent:
Huffman symbols are sequentially dependent — bounded by the image's
coefficient count), accumulates coefficients across scans, then
dequantizes, inverse-zigzags and IDCTs ALL blocks in one batched
einsum, upsamples chroma by ``np.repeat`` and converts YCbCr→RGB
vectorized. Supports 8-bit sequential (SOF0/SOF1, single- or
multi-scan, interleaved or not) and PROGRESSIVE (SOF2: spectral
selection + successive approximation — DC/AC first/refinement scans,
EOB runs, point transform, per T.81 §G.2), 1 or 3 components, sampling
factors up to 2×2 (covers 4:4:4, 4:2:2, 4:2:0), restart markers in
any scan. Arithmetic coding, 12-bit, lossless and hierarchical raise
``NotImplementedError``.

The encoder is the test-side dual: standard Annex-K quantization
tables scaled by IJG quality, batched forward DCT, and SIMPLE valid
canonical Huffman tables (all DC categories at 4 bits, all AC
run/size + EOB-run symbols at 8 bits — ~2× bigger files than optimal,
irrelevant here) so the general decoder's table reconstruction is what
the round-trip exercises. ``progressive=True`` emits a full
successive-approximation scan script over the SAME coefficients, so
baseline and progressive encodings decode bit-identically. Lossy:
round-trips match within quantization error, exact-ish on flat blocks.
"""

from __future__ import annotations

import struct

import numpy as np

# ----------------------------------------------------------- constants

#: Annex K.1 luminance quantization table (row-major 8×8)
_QT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], np.float64)

#: Annex K.2 chrominance quantization table
_QT_CHR = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], np.float64)


def _zigzag() -> np.ndarray:
    """The 64-entry zigzag permutation: zig[k] = row-major index of the
    k-th coefficient in zigzag order."""
    out = []
    for s in range(15):
        cells = [(i, s - i) for i in range(max(0, s - 7), min(s, 7) + 1)]
        if s % 2 == 0:
            cells = cells[::-1]  # even diagonals run bottom-left → top-right
        out.extend(i * 8 + j for i, j in cells)
    return np.array(out, np.int64)


_ZIG = _zigzag()
_INV_ZIG = np.argsort(_ZIG)

_DCT = np.array([[np.cos((2 * n + 1) * k * np.pi / 16)
                  * (np.sqrt(1 / 8) if k == 0 else 0.5)
                  for n in range(8)] for k in range(8)])


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    q = max(1, min(100, quality))
    scale = 5000 / q if q < 50 else 200 - 2 * q
    def sc(t):
        return np.clip(np.floor((t * scale + 50) / 100), 1, 255)
    return sc(_QT_LUM), sc(_QT_CHR)


# ----------------------------------------------------------- bit I/O


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, width: int):
        if width == 0:
            return
        self.acc = (self.acc << width) | (value & ((1 << width) - 1))
        self.n += width
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self):
        if self.n:
            self.put(0x7F, 8 - self.n)  # pad with 1-bits per spec


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 unstuffing;
    stops at any non-stuffing marker (caller handles RSTn)."""

    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self):
        b = self.buf[self.pos]
        if b == 0xFF:
            nxt = self.buf[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                raise _MarkerHit(0xFF00 | nxt)
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, w: int) -> int:
        v = 0
        for _ in range(w):
            v = (v << 1) | self.bit()
        return v

    def align_to_marker(self) -> int:
        """Skip to the next marker (for RST handling)."""
        self.n = 0
        while self.buf[self.pos] != 0xFF or self.buf[self.pos + 1] == 0x00:
            self.pos += 1
        m = 0xFF00 | self.buf[self.pos + 1]
        self.pos += 2
        return m


class _MarkerHit(Exception):
    def __init__(self, marker: int):
        self.marker = marker


# ------------------------------------------------------------ huffman


class _HuffTable:
    """Canonical Huffman decoder from a DHT (BITS, HUFFVAL) spec —
    min/max code per length, per T.81 F.2.2.3."""

    def __init__(self, bits: list[int], vals: bytes):
        self.vals = vals
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code, k = 0, 0
        for ln in range(1, 17):
            n = bits[ln - 1]
            if n:
                self.valptr[ln] = k
                self.mincode[ln] = code
                code += n
                k += n
                self.maxcode[ln] = code - 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code, ln = 0, 0
        while True:
            code = (code << 1) | br.bit()
            ln += 1
            if ln > 16:
                raise ValueError("invalid Huffman code")
            if self.maxcode[ln] >= code >= self.mincode[ln]:
                return self.vals[self.valptr[ln] + code - self.mincode[ln]]


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 sign extension of a t-bit magnitude."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


# ------------------------------------------------------------ decoder


def decode_jpeg(buf: bytes) -> tuple[np.ndarray, int, int, int]:
    """Decode a baseline-sequential (SOF0/SOF1) or PROGRESSIVE (SOF2)
    JPEG → (pixels uint8 (h, w, c), w, h, c).

    Coefficients accumulate across scans in per-component block-grid
    raster order; sequential scans fill blocks whole, progressive scans
    layer spectral bands and successive-approximation bits (T.81 §G.2:
    DC/AC × first/refine, EOB runs, point transform). One batched IDCT
    renders everything at EOI."""
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffTable] = {}  # (class, id)
    comps = None  # list of (cid, h, v, tq)
    w = h = None
    restart_interval = 0
    progressive = False
    coef = grids = None
    hmax = vmax = mcux = mcuy = 0
    got_scan = False
    while pos < len(buf):
        if buf[pos] != 0xFF:
            pos += 1
            continue
        marker = buf[pos + 1]
        if marker == 0xFF:  # fill byte before a marker
            pos += 1
            continue
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        seg_len = struct.unpack_from(">H", buf, pos)[0]
        seg = buf[pos + 2: pos + seg_len]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit DQT unsupported")
                qt[tq] = np.frombuffer(
                    seg, np.uint8, 64, p + 1).astype(np.float64)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1: p + 17])
                nv = sum(bits)
                huff[(tc, th)] = _HuffTable(bits, seg[p + 17: p + 17 + nv])
                p += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 prog.
            progressive = marker == 0xC2
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG unsupported")
            comps = []
            for i in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * i)
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            # per component: coefficient store in block-grid raster
            # order (zigzag within each block), shared by every scan
            grids = [(mcux * c[1], mcuy * c[2]) for c in comps]
            coef = [np.zeros((gw * gh, 64), np.int32) for gw, gh in grids]
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"lossless/arithmetic/hierarchical JPEG "
                f"(SOF marker 0xFF{marker:02X})")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS
            if comps is None:
                raise ValueError("SOS before SOF")
            pos = _decode_sos(buf, pos + seg_len, seg, comps, coef, grids,
                              huff, w, h, hmax, vmax, mcux, mcuy,
                              restart_interval, progressive)
            got_scan = True
            continue
        pos += seg_len
    if not got_scan:
        raise ValueError("JPEG contains no scan")
    return _render(coef, w, h, comps, qt, grids, hmax, vmax)


def _block_seq(br, blk, dcht, acht, pred):
    """Sequential full-spectrum block decode (T.81 F.2.2)."""
    t = dcht.decode(br)
    if t > 11:
        raise ValueError(f"invalid DC category {t}")
    diff = _extend(br.bits(t), t) if t else 0
    pred += diff
    blk[0] = pred
    k = 1
    while k < 64:
        rs = acht.decode(br)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC index overflow")
        blk[k] = _extend(br.bits(s), s)
        k += 1
    return pred


def _block_dc_first(br, blk, dcht, pred, al):
    """Progressive DC first scan: baseline DC diff, point-shifted."""
    t = dcht.decode(br)
    if t > 11:
        raise ValueError(f"invalid DC category {t}")
    diff = _extend(br.bits(t), t) if t else 0
    pred += diff
    blk[0] = pred << al
    return pred


def _block_ac_first(br, blk, acht, ss, se, al, eobrun):
    """Progressive AC first scan for one band (T.81 G.2.2): run/size
    symbols plus EOB runs spanning blocks."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = acht.decode(br)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r != 15:
                eobrun = (1 << r) - 1
                if r:
                    eobrun += br.bits(r)
                break
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("AC index overflow")
        blk[k] = _extend(br.bits(s), s) << al
        k += 1
    return eobrun


def _block_ac_refine(br, blk, acht, ss, se, al, eobrun):
    """Progressive AC refinement (T.81 G.1.2.3): one correction bit per
    already-nonzero coefficient, newly-significant coefficients arrive
    as ±1·2^Al; runs count only zero-history positions."""
    p1, m1 = 1 << al, -(1 << al)
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = acht.decode(br)
            r, s = rs >> 4, rs & 0x0F
            if s:
                if s != 1:
                    raise ValueError("invalid AC refinement size")
                val = p1 if br.bit() else m1
            else:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.bits(r)
                    break
                val = 0  # ZRL: skip 16 zero-history positions
            while k <= se:
                if blk[k]:
                    if br.bit() and not (blk[k] & p1):
                        blk[k] += p1 if blk[k] >= 0 else m1
                else:
                    r -= 1
                    if r < 0:
                        break
                k += 1
            if s and k <= se:
                blk[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:  # correction bits for the tail of this block
            if blk[k]:
                if br.bit() and not (blk[k] & p1):
                    blk[k] += p1 if blk[k] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _decode_sos(buf, pos, seg, comps, coef, grids, huff, w, h,
                hmax, vmax, mcux, mcuy, restart_interval, progressive):
    """Entropy-decode one scan into the coefficient stores; returns the
    buffer position of the next marker after the scan data."""
    ns = seg[0]
    scan = []  # (comp index, dc table id, ac table id)
    for i in range(ns):
        cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
        ci = next((j for j, c in enumerate(comps) if c[0] == cs), None)
        if ci is None:
            raise ValueError(f"SOS component {cs} not in SOF")
        scan.append((ci, tt >> 4, tt & 0x0F))
    ss, se, a = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
    ah, al = a >> 4, a & 0x0F
    if not progressive:
        ss, se, ah, al = 0, 63, 0, 0
    if ss > se or se > 63:
        raise ValueError("bad spectral selection")
    if progressive and ss == 0 and se != 0:
        raise ValueError("progressive DC scan must have Se=0")
    if progressive and ss > 0 and ns != 1:
        raise ValueError("progressive AC scan must be single-component")
    need_dc = ss == 0 and ah == 0
    need_ac = se > 0
    for ci, tdc, tac in scan:
        if (need_dc and (0, tdc) not in huff) or \
                (need_ac and (1, tac) not in huff):
            raise ValueError("scan references a missing Huffman table")
    if ns > 1:
        n_units = mcux * mcuy
    else:
        # non-interleaved: only the blocks covering actual samples
        ci = scan[0][0]
        _, ch, cv, _tq = comps[ci]
        cw = -(-(w * ch) // hmax)   # component sample dimensions
        chh = -(-(h * cv) // vmax)
        nbx, nby = -(-cw // 8), -(-chh // 8)
        n_units = nbx * nby
    br = _BitReader(buf, pos)
    pred = [0] * len(comps)
    eobrun = 0
    u = 0
    try:
        while u < n_units:
            if restart_interval and u and u % restart_interval == 0:
                m = br.align_to_marker()
                if not 0xFFD0 <= m <= 0xFFD7:
                    raise ValueError(f"expected RST, got {m:04x}")
                pred = [0] * len(comps)
                eobrun = 0
            if ns > 1:
                my, mx = divmod(u, mcux)
                for ci, tdc, tac in scan:
                    _, ch, cv, _tq = comps[ci]
                    gw = grids[ci][0]
                    for by in range(cv):
                        for bx in range(ch):
                            blk = coef[ci][(my * cv + by) * gw
                                           + (mx * ch + bx)]
                            if not progressive:
                                pred[ci] = _block_seq(
                                    br, blk, huff[(0, tdc)],
                                    huff[(1, tac)], pred[ci])
                            elif ah == 0:
                                pred[ci] = _block_dc_first(
                                    br, blk, huff[(0, tdc)], pred[ci], al)
                            else:
                                if br.bit():
                                    blk[0] = blk[0] | (1 << al)
            else:
                ci, tdc, tac = scan[0]
                by, bx = divmod(u, nbx)
                blk = coef[ci][by * grids[ci][0] + bx]
                if not progressive:
                    pred[ci] = _block_seq(br, blk, huff[(0, tdc)],
                                          huff[(1, tac)], pred[ci])
                elif ss == 0:
                    if ah == 0:
                        pred[ci] = _block_dc_first(
                            br, blk, huff[(0, tdc)], pred[ci], al)
                    elif br.bit():
                        blk[0] = blk[0] | (1 << al)
                elif ah == 0:
                    eobrun = _block_ac_first(
                        br, blk, huff[(1, tac)], ss, se, al, eobrun)
                else:
                    eobrun = _block_ac_refine(
                        br, blk, huff[(1, tac)], ss, se, al, eobrun)
            u += 1
    except _MarkerHit as mh:
        if not (mh.marker == 0xFFD9 and u >= n_units):
            if not 0xFFD0 <= mh.marker <= 0xFFD7:
                raise ValueError(
                    f"unexpected marker 0x{mh.marker:04X} mid-scan")
    # skip padding bits / trailing RSTs to the next marker
    p = br.pos
    while p + 1 < len(buf):
        if buf[p] == 0xFF and buf[p + 1] != 0x00 \
                and not 0xD0 <= buf[p + 1] <= 0xD7:
            break
        p += 1
    return p


def _render(coef, w, h, comps, qt, grids, hmax, vmax):
    """Dequantize + inverse-zigzag + batched IDCT + chroma upsample +
    color convert, from block-grid-raster coefficient stores."""
    planes = []
    for ci, (cid, ch, cv, tq) in enumerate(comps):
        if tq not in qt:
            raise ValueError("missing quantization table")
        gw, gh = grids[ci]
        c = coef[ci].astype(np.float64) * qt[tq][None, :]
        sq = c[:, _INV_ZIG].reshape(-1, 8, 8)
        pix = np.einsum("ki,nij,lj->nkl", _DCT.T, sq, _DCT.T,
                        optimize=True) + 128.0
        plane = pix.reshape(gh, gw, 8, 8).transpose(0, 2, 1, 3) \
            .reshape(gh * 8, gw * 8)
        # upsample to full MCU grid resolution
        if ch < hmax:
            plane = np.repeat(plane, hmax // ch, axis=1)
        if cv < vmax:
            plane = np.repeat(plane, vmax // cv, axis=0)
        planes.append(plane[: h, : w])
    if len(planes) == 1:
        px = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return px[:, :, None], w, h, 1
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    px = np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255
                 ).astype(np.uint8)
    return px, w, h, 3


# ------------------------------------------------------------ encoder

# simple valid canonical tables: 12 DC categories at 4 bits; the 162
# standard AC run/size symbols at 8 bits (Kraft 162/256 < 1, all-ones
# code unused) — suboptimal size, trivially correct
_DC_BITS = [0, 0, 0, 12] + [0] * 12
_DC_VALS = bytes(range(12))
_AC_SYMBOLS = bytes(
    [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 11)])
_AC_BITS = [0] * 7 + [len(_AC_SYMBOLS)] + [0] * 8


def _canonical_codes(bits: list[int], vals: bytes) -> dict[int, tuple[int, int]]:
    codes, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return codes


_DC_CODES = _canonical_codes(_DC_BITS, _DC_VALS)
_AC_CODES = _canonical_codes(_AC_BITS, _AC_SYMBOLS)

# progressive AC table: the 162 standard run/size symbols PLUS the
# EOB-run symbols (nbits<<4 for nbits 1..14); 176 symbols at 8 bits,
# Kraft 176/256 < 1 — still trivially valid
_ACP_SYMBOLS = _AC_SYMBOLS + bytes(n << 4 for n in range(1, 15))
_ACP_BITS = [0] * 7 + [len(_ACP_SYMBOLS)] + [0] * 8
_ACP_CODES = _canonical_codes(_ACP_BITS, _ACP_SYMBOLS)


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _block_coefs(plane: np.ndarray, q: np.ndarray,
                 bw: int, bh: int) -> np.ndarray:
    """Pad a plane to (bh×8, bw×8), batched forward DCT + quantize →
    (bh*bw, 64) int32 coefficients in zigzag order, block row-major."""
    h, w = plane.shape
    p = np.pad(plane, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge")
    b = p.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    f = np.einsum("ki,nij,lj->nkl", _DCT, b - 128.0, _DCT, optimize=True)
    qc = np.round(f.reshape(-1, 64) / q[None, :]).astype(np.int32)
    return qc[:, _ZIG]


def _encode_block(bwr: _BitWriter, blk: np.ndarray, pred: int) -> int:
    diff = int(blk[0]) - pred
    t = _category(diff)
    code, ln = _DC_CODES[t]
    bwr.put(code, ln)
    if t:
        bwr.put(diff if diff > 0 else diff + (1 << t) - 1, t)
    run = 0
    nz = np.flatnonzero(blk[1:])
    last = nz[-1] + 1 if nz.size else 0
    for k in range(1, last + 1):
        v = int(blk[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = _AC_CODES[0xF0]
            bwr.put(code, ln)
            run -= 16
        s = _category(v)
        code, ln = _AC_CODES[(run << 4) | s]
        bwr.put(code, ln)
        bwr.put(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        code, ln = _AC_CODES[0x00]
        bwr.put(code, ln)
    return int(blk[0])


# ------------------------------------------------- progressive encoder


def _emit_eobrun(bwr: _BitWriter, codes, st: dict) -> None:
    """Flush a pending EOB run + its buffered correction bits."""
    n = st["eobrun"]
    if n:
        nbits = n.bit_length() - 1
        code, ln = codes[nbits << 4]
        bwr.put(code, ln)
        if nbits:
            bwr.put(n, nbits)  # low nbits bits encode n - 2^nbits
        st["eobrun"] = 0
    for b in st["bebits"]:
        bwr.put(b, 1)
    st["bebits"] = []


def _enc_dc_first(bwr: _BitWriter, blk: np.ndarray, pred: int,
                  al: int) -> int:
    v = int(blk[0]) >> al  # arithmetic shift, like the decoder's <<
    diff = v - pred
    t = _category(diff)
    code, ln = _DC_CODES[t]
    bwr.put(code, ln)
    if t:
        bwr.put(diff if diff > 0 else diff + (1 << t) - 1, t)
    return v


def _enc_ac_first(bwr: _BitWriter, codes, blk: np.ndarray, ss: int,
                  se: int, al: int, st: dict) -> None:
    r = 0
    for k in range(ss, se + 1):
        v = int(blk[k])
        t = v >> al if v >= 0 else -((-v) >> al)  # truncate toward 0
        if t == 0:
            r += 1
            continue
        while r > 15:
            _emit_eobrun(bwr, codes, st)
            code, ln = codes[0xF0]
            bwr.put(code, ln)
            r -= 16
        s = _category(t)
        _emit_eobrun(bwr, codes, st)
        code, ln = codes[(r << 4) | s]
        bwr.put(code, ln)
        bwr.put(t if t > 0 else t + (1 << s) - 1, s)
        r = 0
    if r:
        st["eobrun"] += 1
        if st["eobrun"] == 0x7FFF:
            _emit_eobrun(bwr, codes, st)


def _enc_ac_refine(bwr: _BitWriter, codes, blk: np.ndarray, ss: int,
                   se: int, al: int, st: dict) -> None:
    """T.81 G.1.2.3 encoder: runs count zero-history positions only;
    correction bits for already-nonzero coefficients are buffered and
    emitted after the next significant symbol (or ride the EOB run)."""
    absv = [abs(int(blk[k])) >> al for k in range(ss, se + 1)]
    eob = ss - 1  # position of the last NEWLY-significant coefficient
    for i, t in enumerate(absv):
        if t == 1:
            eob = ss + i
    r = 0
    brbits: list[int] = []
    for k in range(ss, se + 1):
        t = absv[k - ss]
        if t == 0:
            r += 1
            continue
        while r > 15 and k <= eob:
            _emit_eobrun(bwr, codes, st)
            code, ln = codes[0xF0]
            bwr.put(code, ln)
            r -= 16
            for b in brbits:
                bwr.put(b, 1)
            brbits = []
        if t > 1:  # previously significant: one correction bit
            brbits.append(t & 1)
            continue
        _emit_eobrun(bwr, codes, st)
        code, ln = codes[(r << 4) | 1]
        bwr.put(code, ln)
        bwr.put(1 if int(blk[k]) > 0 else 0, 1)
        r = 0
        for b in brbits:
            bwr.put(b, 1)
        brbits = []
    if r or brbits:
        st["eobrun"] += 1
        st["bebits"].extend(brbits)
        if st["eobrun"] == 0x7FFF:
            _emit_eobrun(bwr, codes, st)


def _progressive_scans(qcoefs, grids, nc, mcux, mcuy, w, h, hmax, vmax,
                       restart_interval):
    """Emit a standard-shape progressive scan script exercising every
    scan kind: DC first (Al=1, interleaved) → per-component AC first in
    two spectral bands (Al=2) → two AC refinement passes (2→1→0) → DC
    refine. Returns [(sos_body, entropy_bytes)]."""
    ri = restart_interval
    scans: list[tuple[bytes, bytes]] = []
    dctab = [0 if i == 0 else 1 for i in range(nc)]
    actab = [0 if i == 0 else 1 for i in range(nc)]

    def dc_scan(ah: int, al: int) -> None:
        bwr = _BitWriter()
        pred = [0] * nc
        for mcu in range(mcux * mcuy):
            if ri and mcu and mcu % ri == 0:
                bwr.flush()
                bwr.out += bytes([0xFF,
                                  0xD0 + ((mcu // ri - 1) % 8)])
                pred = [0] * nc
            my, mx = divmod(mcu, mcux)
            for ci in range(nc):
                gw, _gh, sh, sv = grids[ci]
                for by in range(sv):
                    for bx in range(sh):
                        blk = qcoefs[ci][(my * sv + by) * gw
                                         + (mx * sh + bx)]
                        if ah == 0:
                            pred[ci] = _enc_dc_first(bwr, blk,
                                                     pred[ci], al)
                        else:
                            bwr.put((int(blk[0]) >> al) & 1, 1)
        bwr.flush()
        sos = bytes([nc]) + b"".join(
            bytes([i + 1, dctab[i] << 4]) for i in range(nc))
        sos += bytes([0, 0, (ah << 4) | al])
        scans.append((sos, bytes(bwr.out)))

    def ac_scan(ci: int, ss: int, se: int, ah: int, al: int) -> None:
        gw, _gh, sh, sv = grids[ci]
        cw, chh = -(-(w * sh) // hmax), -(-(h * sv) // vmax)
        nbx, nby = -(-cw // 8), -(-chh // 8)
        bwr = _BitWriter()
        st = {"eobrun": 0, "bebits": []}
        for u in range(nbx * nby):
            if ri and u and u % ri == 0:
                _emit_eobrun(bwr, _ACP_CODES, st)
                bwr.flush()
                bwr.out += bytes([0xFF, 0xD0 + ((u // ri - 1) % 8)])
            by, bx = divmod(u, nbx)
            blk = qcoefs[ci][by * gw + bx]
            if ah == 0:
                _enc_ac_first(bwr, _ACP_CODES, blk, ss, se, al, st)
            else:
                _enc_ac_refine(bwr, _ACP_CODES, blk, ss, se, al, st)
        _emit_eobrun(bwr, _ACP_CODES, st)
        bwr.flush()
        sos = bytes([1, ci + 1, actab[ci], ss, se, (ah << 4) | al])
        scans.append((sos, bytes(bwr.out)))

    dc_scan(0, 1)
    for ci in range(nc):
        ac_scan(ci, 1, 5, 0, 2)
        ac_scan(ci, 6, 63, 0, 2)
    for ci in range(nc):
        ac_scan(ci, 1, 63, 2, 1)
    for ci in range(nc):
        ac_scan(ci, 1, 63, 1, 0)
    dc_scan(1, 0)
    return scans


def encode_jpeg(px: np.ndarray, quality: int = 90,
                subsample: bool | tuple[int, int] = False,
                restart_interval: int = 0,
                progressive: bool = False,
                separate_scans: bool = False) -> bytes:
    """Encode (h, w) or (h, w, 1|3) uint8 → baseline JFIF bytes.
    ``subsample`` sets the luma sampling factors: ``True`` = (2, 2)
    (4:2:0), or an explicit ``(sh, sv)`` with each in {1, 2} —
    (2, 1) is 4:2:2; chroma is box-averaged down by the same factors.
    ``restart_interval`` emits DRI + RSTn markers every N scan units.
    ``progressive`` emits SOF2 with a full successive-approximation
    scan script (see :func:`_progressive_scans`) — same coefficients,
    so baseline and progressive encodings decode identically.
    ``separate_scans`` emits one NON-INTERLEAVED sequential scan per
    component (ns=1, each over its own block grid) instead of the
    single interleaved scan — again coefficient-identical."""
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, nc = px.shape
    if nc not in (1, 3):
        raise ValueError("1 or 3 channels only")
    qlum, qchr = _quality_tables(quality)
    ysamp = (2, 2) if subsample is True else \
        (tuple(subsample) if subsample else (1, 1))
    if any(s not in (1, 2) for s in ysamp):
        raise ValueError("sampling factors must be 1 or 2")
    sub = ysamp != (1, 1) and nc == 3
    if nc == 3:
        f = px.astype(np.float64)
        y = 0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]
        cb = 128.0 - 0.168736 * f[:, :, 0] - 0.331264 * f[:, :, 1] \
            + 0.5 * f[:, :, 2]
        cr = 128.0 + 0.5 * f[:, :, 0] - 0.418688 * f[:, :, 1] \
            - 0.081312 * f[:, :, 2]
        if sub:
            fx, fy = ysamp
            h2, w2 = -(-h // fy) * fy, -(-w // fx) * fx
            cb = np.pad(cb, ((0, h2 - h), (0, w2 - w)), mode="edge")
            cr = np.pad(cr, ((0, h2 - h), (0, w2 - w)), mode="edge")
            cb = cb.reshape(h2 // fy, fy, w2 // fx, fx).mean(axis=(1, 3))
            cr = cr.reshape(h2 // fy, fy, w2 // fx, fx).mean(axis=(1, 3))
        planes = [y, cb, cr]
        qts = [qlum, qchr, qchr]
        tsel = [0, 1, 1]
        samp = [ysamp, (1, 1), (1, 1)] if sub else [(1, 1)] * 3
    else:
        planes = [px[:, :, 0].astype(np.float64)]
        qts = [qlum]
        tsel = [0]
        samp = [(1, 1)]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    grids, qcoefs = [], []
    for plane, q, (sh, sv) in zip(planes, qts, samp):
        gw, gh = mcux * sh, mcuy * sv
        qcoefs.append(_block_coefs(plane, q, gw, gh))
        grids.append((gw, gh, sh, sv))

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = b"\xff\xd8"
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, b"\x00" + qlum.astype(np.uint8)[_ZIG].tobytes())
    if nc == 3:
        out += seg(0xFFDB, b"\x01" + qchr.astype(np.uint8)[_ZIG].tobytes())
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i in range(nc):
        sh, sv = samp[i]
        sof += struct.pack(">BBB", i + 1, (sh << 4) | sv, tsel[i])
    out += seg(0xFFC2 if progressive else 0xFFC0, sof)
    ac_bits, ac_syms = (_ACP_BITS, _ACP_SYMBOLS) if progressive \
        else (_AC_BITS, _AC_SYMBOLS)
    out += seg(0xFFC4, b"\x00" + bytes(_DC_BITS) + _DC_VALS)
    out += seg(0xFFC4, b"\x10" + bytes(ac_bits) + ac_syms)
    if nc == 3:
        out += seg(0xFFC4, b"\x01" + bytes(_DC_BITS) + _DC_VALS)
        out += seg(0xFFC4, b"\x11" + bytes(ac_bits) + ac_syms)
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))

    if progressive:
        for sos, data in _progressive_scans(
                qcoefs, grids, nc, mcux, mcuy, w, h, hmax, vmax,
                restart_interval):
            out += seg(0xFFDA, sos) + data
        return out + b"\xff\xd9"

    if separate_scans:
        # one non-interleaved sequential scan per component (T.81
        # allows it in baseline; scan units = the component's own
        # sample-covering blocks, not the padded MCU grid)
        for ci, qc in enumerate(qcoefs):
            gw, _gh, sh, sv = grids[ci]
            cw, chh = -(-(w * sh) // hmax), -(-(h * sv) // vmax)
            nbx, nby = -(-cw // 8), -(-chh // 8)
            bwr = _BitWriter()
            pred = 0
            for u in range(nbx * nby):
                if restart_interval and u and u % restart_interval == 0:
                    bwr.flush()
                    bwr.out += bytes([
                        0xFF, 0xD0 + ((u // restart_interval - 1) % 8)])
                    pred = 0
                by, bx = divmod(u, nbx)
                pred = _encode_block(bwr, qc[by * gw + bx], pred)
            bwr.flush()
            sos = bytes([1, ci + 1, 0x00 if ci == 0 else 0x11, 0, 63, 0])
            out += seg(0xFFDA, sos) + bytes(bwr.out)
        return out + b"\xff\xd9"

    bwr = _BitWriter()
    pred = [0] * len(planes)
    for mcu in range(mcux * mcuy):
        if restart_interval and mcu and mcu % restart_interval == 0:
            bwr.flush()  # byte-align with 1-bits
            bwr.out += bytes([0xFF, 0xD0 + ((mcu // restart_interval - 1)
                                            % 8)])
            pred = [0] * len(planes)
        my, mx = divmod(mcu, mcux)
        for ci, qc in enumerate(qcoefs):
            gw, _gh, sh, sv = grids[ci]
            for by in range(sv):
                for bx in range(sh):
                    bi = (my * sv + by) * gw + (mx * sh + bx)
                    pred[ci] = _encode_block(bwr, qc[bi], pred[ci])
    bwr.flush()
    sos = bytes([nc])
    for i in range(nc):
        sos += bytes([i + 1, 0x00 if i == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += seg(0xFFDA, sos)
    out += bytes(bwr.out) + b"\xff\xd9"
    return out
