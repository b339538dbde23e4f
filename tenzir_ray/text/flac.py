"""FLAC codec (decode + encode) in pure numpy + stdlib — no codec libs.

Everything FLAC needs is formulaic (RFC 9639 / the xiph spec): CRC-8
(poly 0x07) and CRC-16 (poly 0x8005) frame checksums, extended-UTF-8
frame numbers, Rice/Golomb residual coding with per-partition
parameters and raw-bits escapes, the four FIXED polynomial predictors,
quantized-LPC prediction, stereo decorrelation (left/side, right/side,
mid/side), wasted-bits shifting and an MD5 integrity hash over the raw
PCM — so unlike MP3/VP8 (whose spec consists largely of tabulated
Huffman/probability data that cannot be reproduced reliably from
memory) a from-scratch implementation here is *bit-faithful*, and the
encoder dual lets tests assert exact lossless round-trips:
``decode(encode(pcm)) == pcm`` sample-for-sample, with the STREAMINFO
MD5 verified on decode.

Decoder coverage: 8/12/16/20/24-bit streams, 1-8 channels, all four
channel assignments, constant/verbatim/fixed(0-4)/LPC(1-32) subframes,
both residual coding methods (4-bit Rice + 5-bit Rice2), any partition
order, escape partitions, wasted bits, fixed and variable blocking
strategies, and short final frames.  FIXED-predictor restoration is
vectorized as iterated ``np.cumsum`` (the inverse of the n-th finite
difference); Rice decoding is a tight scalar bit walk (inherently
serial — each code's length depends on the previous decode), same
policy as the JPEG/GIF entropy coders in this tree.

Like the other real codecs here this feeds the actor-pool multimodal
stages (`tenzir_ray.text.multimodal.AudioFeatures`) via the
``_decode_audio`` magic dispatch; the reference ships audio bytes
around as opaque blobs only, so this is beyond-reference capability
for training-data pipelines.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_MAGIC = b"fLaC"

# ---------------------------------------------------------------------------
# CRCs (table-driven; tables generated from the polynomial at import)

def _make_crc8_table() -> list[int]:
    tbl = []
    for byte in range(256):
        c = byte
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
        tbl.append(c)
    return tbl


def _make_crc16_table() -> list[int]:
    tbl = []
    for byte in range(256):
        c = byte << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
        tbl.append(c)
    return tbl


_CRC8 = _make_crc8_table()
_CRC16 = _make_crc16_table()


def _crc8(data) -> int:
    c = 0
    for b in data:
        c = _CRC8[c ^ b]
    return c


def _crc16(data) -> int:
    c = 0
    for b in data:
        c = (_CRC16[((c >> 8) ^ b) & 0xFF] ^ (c << 8)) & 0xFFFF
    return c


# ---------------------------------------------------------------------------
# Bit I/O

class _BitReader:
    __slots__ = ("buf", "pos", "nbits")

    def __init__(self, buf: bytes, pos_bits: int = 0):
        self.buf = buf
        self.pos = pos_bits
        self.nbits = len(buf) * 8

    def read(self, n: int) -> int:
        pos = self.pos
        end = pos + n
        if end > self.nbits:
            raise ValueError("FLAC: truncated bitstream")
        self.pos = end
        b0 = pos >> 3
        b1 = (end + 7) >> 3
        val = int.from_bytes(self.buf[b0:b1], "big")
        return (val >> ((b1 << 3) - end)) & ((1 << n) - 1)

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def read_unary(self) -> int:
        """Count zero bits up to the terminating one bit."""
        buf = self.buf
        pos = self.pos
        byte_i = pos >> 3
        bit_i = pos & 7
        count = 0
        nbytes = len(buf)
        while True:
            if byte_i >= nbytes:
                raise ValueError("FLAC: truncated unary code")
            cur = buf[byte_i] & (0xFF >> bit_i)
            if cur:
                first_one = 8 - cur.bit_length()
                count += first_one - bit_i
                self.pos = (byte_i << 3) + first_one + 1
                return count
            count += 8 - bit_i
            byte_i += 1
            bit_i = 0

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, val: int, n: int) -> None:
        self.acc = (self.acc << n) | (val & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zero bits then the terminating one

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bit_length(self) -> int:
        return len(self.out) * 8 + self.nbits


# ---------------------------------------------------------------------------
# Extended UTF-8 frame/sample numbers (up to 36 bits, 7 bytes)

def _utf8_encode(v: int) -> bytes:
    if v < 0x80:
        return bytes([v])
    for nbytes, limit in ((2, 1 << 11), (3, 1 << 16), (4, 1 << 21),
                          (5, 1 << 26), (6, 1 << 31), (7, 1 << 36)):
        if v < limit:
            out = bytearray()
            for i in range(nbytes - 1):
                out.append(0x80 | (v & 0x3F))
                v >>= 6
            first_bits = 8 - nbytes - 1  # payload bits in the lead byte
            lead = (0xFF << (first_bits + 1)) & 0xFF
            out.append(lead | (v & ((1 << first_bits) - 1)))
            return bytes(reversed(out))
    raise ValueError("FLAC: frame number exceeds 36 bits")


def _utf8_decode(br: _BitReader) -> int:
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    # count leading one bits
    n = 0
    mask = 0x80
    while mask and (b0 & mask):
        n += 1
        mask >>= 1
    if n == 1 or n > 7:
        raise ValueError("FLAC: invalid UTF-8 coded number")
    v = b0 & (0xFF >> (n + 1)) if n < 7 else 0
    for _ in range(n - 1):
        b = br.read(8)
        if (b & 0xC0) != 0x80:
            raise ValueError("FLAC: invalid UTF-8 continuation byte")
        v = (v << 6) | (b & 0x3F)
    return v


# ---------------------------------------------------------------------------
# Decoder

_BLOCKSIZE_CODES = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                    13: 8192, 14: 16384, 15: 32768}
_RATE_CODES = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
               6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000,
               11: 96000}
_BPS_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24}


def _read_residual(br: _BitReader, blocksize: int, order: int) -> np.ndarray:
    method = br.read(2)
    if method > 1:
        raise ValueError("FLAC: reserved residual coding method")
    pbits = 4 + method           # Rice parameter width (4 or 5 bits)
    escape = (1 << pbits) - 1
    porder = br.read(4)
    nparts = 1 << porder
    if blocksize % nparts:
        raise ValueError("FLAC: block size not divisible by partitions")
    psize = blocksize >> porder
    if psize <= order and nparts > 1 or psize < order:
        raise ValueError("FLAC: partition smaller than predictor order")
    out = np.empty(blocksize - order, np.int64)
    filled = 0
    read_unary = br.read_unary
    read = br.read
    for p in range(nparts):
        n = psize - order if p == 0 else psize
        k = read(pbits)
        if k == escape:
            raw_bits = read(5)
            if raw_bits == 0:
                out[filled:filled + n] = 0
            else:
                sign = 1 << (raw_bits - 1)
                full = 1 << raw_bits
                for i in range(filled, filled + n):
                    v = read(raw_bits)
                    out[i] = v - full if v >= sign else v
        elif k == 0:
            for i in range(filled, filled + n):
                u = read_unary()
                out[i] = (u >> 1) ^ -(u & 1)
        else:
            for i in range(filled, filled + n):
                u = (read_unary() << k) | read(k)
                out[i] = (u >> 1) ^ -(u & 1)
        filled += n
    return out


def _fixed_restore(order: int, warmup: np.ndarray, res: np.ndarray) -> np.ndarray:
    """Invert the order-n finite-difference predictor with iterated
    cumulative sums (vectorized; no per-sample Python loop)."""
    if order == 0:
        return res.copy()
    diffs = [warmup.astype(np.int64)]
    for _ in range(order):
        diffs.append(np.diff(diffs[-1]))
    x = res.astype(np.int64)
    for lvl in range(order, 0, -1):
        x = diffs[lvl - 1][-1] + np.cumsum(x)
    return np.concatenate([warmup, x])


def _lpc_restore(warmup: np.ndarray, res: np.ndarray,
                 coefs: list[int], shift: int) -> np.ndarray:
    order = len(coefs)
    sig = warmup.astype(np.int64).tolist()
    append = sig.append
    rc = list(reversed(coefs))  # rc[j] multiplies sig[i-order+j]
    for e in res.tolist():
        base = len(sig) - order
        acc = 0
        for j in range(order):
            acc += rc[j] * sig[base + j]
        append(e + (acc >> shift))
    return np.asarray(sig, np.int64)


def _read_subframe(br: _BitReader, blocksize: int, bps: int) -> np.ndarray:
    if br.read(1):
        raise ValueError("FLAC: subframe header padding bit set")
    ftype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.read_unary() + 1
    eff = bps - wasted
    if eff <= 0:
        raise ValueError("FLAC: wasted bits exceed sample depth")
    if ftype == 0:  # CONSTANT
        v = br.read_signed(eff)
        out = np.full(blocksize, v, np.int64)
    elif ftype == 1:  # VERBATIM
        out = np.empty(blocksize, np.int64)
        for i in range(blocksize):
            out[i] = br.read_signed(eff)
    elif 8 <= ftype <= 12:  # FIXED order 0-4
        order = ftype - 8
        if order > blocksize:
            raise ValueError("FLAC: predictor order exceeds block size")
        warm = np.array([br.read_signed(eff) for _ in range(order)], np.int64)
        res = _read_residual(br, blocksize, order)
        out = _fixed_restore(order, warm, res)
    elif ftype >= 32:  # LPC order 1-32
        order = (ftype & 31) + 1
        if order > blocksize:
            raise ValueError("FLAC: predictor order exceeds block size")
        warm = np.array([br.read_signed(eff) for _ in range(order)], np.int64)
        prec = br.read(4) + 1
        if prec == 16:
            raise ValueError("FLAC: invalid LPC precision code")
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("FLAC: negative LPC shift")
        coefs = [br.read_signed(prec) for _ in range(order)]
        res = _read_residual(br, blocksize, order)
        out = _lpc_restore(warm, res, coefs, shift)
    else:
        raise ValueError(f"FLAC: reserved subframe type {ftype}")
    if wasted:
        out <<= wasted
    return out


def decode_flac(buf: bytes, check_md5: bool = True):
    """Decode a FLAC stream → ``(sample_rate, bits_per_sample, samples)``
    with ``samples`` an int32 array of shape ``(n, channels)``.  Raises
    ``ValueError`` on corrupt/truncated input (CRC-8, CRC-16, and — for
    byte-aligned depths — the STREAMINFO MD5 are all verified)."""
    if buf[:4] != _MAGIC:
        raise ValueError("not a FLAC stream")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(buf):
            raise ValueError("FLAC: truncated metadata block header")
        head = buf[pos]
        length = int.from_bytes(buf[pos + 1:pos + 4], "big")
        last, btype = head & 0x80, head & 0x7F
        body = buf[pos + 4:pos + 4 + length]
        if len(body) < length:
            raise ValueError("FLAC: truncated metadata block")
        if btype == 0:  # STREAMINFO
            if length != 34:
                raise ValueError("FLAC: bad STREAMINFO length")
            packed = int.from_bytes(body[10:18], "big")
            info = {
                "min_block": struct.unpack(">H", body[0:2])[0],
                "max_block": struct.unpack(">H", body[2:4])[0],
                "rate": packed >> 44,
                "channels": ((packed >> 41) & 0x7) + 1,
                "bps": ((packed >> 36) & 0x1F) + 1,
                "total": packed & ((1 << 36) - 1),
                "md5": body[18:34],
            }
        pos += 4 + length
        if last:
            break
    if info is None:
        raise ValueError("FLAC: missing STREAMINFO")
    if not info["rate"]:
        raise ValueError("FLAC: zero sample rate")

    channels = info["channels"]
    chans: list[np.ndarray] = [np.empty(0, np.int64) for _ in range(channels)]
    decoded = 0
    total = info["total"]
    br = _BitReader(buf, pos * 8)
    while (total and decoded < total) or (
            not total and br.pos + 16 <= br.nbits):
        hdr_start = br.pos >> 3
        sync = br.read(14)
        if sync != 0x3FFE:
            raise ValueError("FLAC: lost frame sync")
        if br.read(1):
            raise ValueError("FLAC: reserved frame header bit set")
        br.read(1)  # blocking strategy (only affects number semantics)
        bs_code = br.read(4)
        rate_code = br.read(4)
        chan_code = br.read(4)
        bps_code = br.read(3)
        if br.read(1):
            raise ValueError("FLAC: reserved frame header bit set")
        _utf8_decode(br)  # frame/sample number (positions are implied)
        if bs_code == 0:
            raise ValueError("FLAC: reserved block size code")
        elif bs_code == 6:
            blocksize = br.read(8) + 1
        elif bs_code == 7:
            blocksize = br.read(16) + 1
        else:
            blocksize = _BLOCKSIZE_CODES[bs_code]
        if rate_code == 0:
            pass
        elif rate_code == 12:
            br.read(8)
        elif rate_code in (13, 14):
            br.read(16)
        elif rate_code == 15:
            raise ValueError("FLAC: invalid sample rate code")
        bps = info["bps"] if bps_code == 0 else _BPS_CODES.get(bps_code)
        if bps is None:
            raise ValueError("FLAC: reserved sample size code")
        hdr_end = br.pos >> 3
        if _crc8(buf[hdr_start:hdr_end]) != br.read(8):
            raise ValueError("FLAC: frame header CRC-8 mismatch")

        if chan_code < 8:
            nsub = chan_code + 1
            if nsub != channels:
                raise ValueError("FLAC: channel count mismatch")
            subs = [_read_subframe(br, blocksize, bps) for _ in range(nsub)]
        elif chan_code in (8, 9, 10):
            if channels != 2:
                raise ValueError("FLAC: stereo decorrelation on non-stereo")
            extra0 = 1 if chan_code == 9 else 0
            extra1 = 0 if chan_code == 9 else 1
            s0 = _read_subframe(br, blocksize, bps + extra0)
            s1 = _read_subframe(br, blocksize, bps + extra1)
            if chan_code == 8:      # left/side
                subs = [s0, s0 - s1]
            elif chan_code == 9:    # side/right
                subs = [s1 + s0, s1]
            else:                   # mid/side
                mid2 = (s0 << 1) | (s1 & 1)
                subs = [(mid2 + s1) >> 1, (mid2 - s1) >> 1]
        else:
            raise ValueError("FLAC: reserved channel assignment")
        br.align()
        frame_end = br.pos >> 3
        if _crc16(buf[hdr_start:frame_end]) != br.read(16):
            raise ValueError("FLAC: frame CRC-16 mismatch")
        for c in range(channels):
            chans[c] = np.concatenate([chans[c], subs[c]])
        decoded += blocksize

    samples = np.stack(chans, axis=1)
    if total:
        if decoded < total:
            raise ValueError("FLAC: stream ends before total_samples")
        samples = samples[:total]
    bps = info["bps"]
    if check_md5 and info["md5"] != b"\x00" * 16 and bps % 8 == 0:
        if hashlib.md5(_pcm_bytes(samples, bps)).digest() != info["md5"]:
            raise ValueError("FLAC: MD5 mismatch (decoded PCM corrupt)")
    return info["rate"], bps, samples.astype(np.int32)


def _pcm_bytes(samples: np.ndarray, bps: int) -> bytes:
    """Interleaved little-endian signed PCM as hashed by STREAMINFO MD5
    (byte-aligned depths only, matching the reference ``flac`` tool)."""
    flat = samples.astype("<i4")
    if bps == 8:
        return flat.astype(np.int8).tobytes()
    if bps == 16:
        return flat.astype("<i2").tobytes()
    if bps == 24:
        return flat.view(np.uint8).reshape(-1, 4)[:, :3].tobytes()
    if bps == 32:
        return flat.tobytes()
    raise ValueError(f"FLAC: no byte-aligned PCM layout for {bps}-bit")


def decode_flac_audio(buf: bytes) -> tuple[int, np.ndarray]:
    """`_decode_audio`-shaped adapter: FLAC bytes → (rate, mono float32
    in [-1, 1)), channels mean-downmixed like the WAV path."""
    rate, bps, samples = decode_flac(buf)
    x = samples.astype(np.float32) / float(1 << (bps - 1))
    return rate, x.mean(axis=1) if x.shape[1] > 1 else x[:, 0]


# ---------------------------------------------------------------------------
# Encoder

_RATE_TO_CODE = {v: k for k, v in _RATE_CODES.items()}
_BPS_TO_CODE = {v: k for k, v in _BPS_CODES.items()}
_BS_TO_CODE = {v: k for k, v in _BLOCKSIZE_CODES.items()}


def _zigzag(e: np.ndarray) -> np.ndarray:
    return ((e << 1) ^ (e >> 63)).astype(np.uint64)


def _best_rice_param(z: np.ndarray, pbits: int = 4):
    """Exact-bit-cost Rice parameter: cost(k) = n*(k+1) + sum(z >> k)."""
    n = len(z)
    if n == 0:
        return 0, 0
    best_k, best_cost = 0, None
    for k in range(min(30, int(z.max()).bit_length() + 1) + 1):
        cost = n * (k + 1) + int((z >> np.uint64(k)).sum())
        if best_cost is None or cost < best_cost:
            best_k, best_cost = k, cost
    escape = (1 << pbits) - 1
    return (best_k, best_cost) if best_k < escape else (escape, None)


def _raw_bits_needed(e: np.ndarray) -> int:
    if len(e) == 0:
        return 0
    lo, hi = int(e.min()), int(e.max())
    need = max(hi.bit_length() + 1, (-lo - 1).bit_length() + 1 if lo < 0 else 1)
    return max(1, need)


def _write_residual(bw: _BitWriter, res: np.ndarray, blocksize: int,
                    order: int, partition_order: int,
                    rice2: bool = False) -> None:
    while partition_order > 0 and (
            blocksize % (1 << partition_order)
            or (blocksize >> partition_order) <= order):
        partition_order -= 1
    pbits = 5 if rice2 else 4
    bw.write(1 if rice2 else 0, 2)   # coding method: Rice / Rice2
    bw.write(partition_order, 4)
    psize = blocksize >> partition_order
    filled = 0
    for p in range(1 << partition_order):
        n = psize - order if p == 0 else psize
        part = res[filled:filled + n]
        filled += n
        z = _zigzag(part)
        k, cost = _best_rice_param(z, pbits)
        raw = _raw_bits_needed(part)
        if cost is None or cost > n * (raw + 1):
            bw.write((1 << pbits) - 1, pbits)   # escape: raw samples
            bw.write(raw, 5)
            for v in part.tolist():
                bw.write(v, raw)
            continue
        bw.write(k, pbits)
        if k == 0:
            for u in z.tolist():
                bw.write_unary(u)
        else:
            for u in z.tolist():
                bw.write_unary(u >> k)
                bw.write(u, k)


def _lpc_coefs(sig: np.ndarray, order: int, precision: int = 12):
    """Levinson-Durbin on the autocorrelation, then uniform quantization
    to `precision`-bit integers with a power-of-two shift."""
    x = sig.astype(np.float64)
    x = x - x.mean()
    n = len(x)
    if n <= order or not np.any(x):
        return None
    ac = np.array([np.dot(x[:n - lag], x[lag:]) for lag in range(order + 1)])
    if ac[0] == 0:
        return None
    err = ac[0]
    a = np.zeros(order)
    for i in range(order):
        acc = ac[i + 1] - np.dot(a[:i], ac[1:i + 1][::-1])
        k = acc / err
        a[:i] = a[:i] - k * a[:i][::-1]
        a[i] = k
        err *= (1 - k * k)
        if err <= 0:
            return None
    cmax = np.abs(a).max()
    if cmax == 0 or not np.isfinite(cmax):
        return None
    shift = precision - 1 - max(0, int(np.floor(np.log2(cmax))) + 1)
    shift = max(1, min(15, shift))
    q = np.clip(np.round(a * (1 << shift)),
                -(1 << (precision - 1)), (1 << (precision - 1)) - 1)
    q = q.astype(np.int64)
    if not q.any():
        return None
    return q, shift


def _lpc_residual(sig: np.ndarray, q: np.ndarray, shift: int) -> np.ndarray:
    order = len(q)
    s = sig.astype(np.int64)
    pred = np.convolve(s, q)[order - 1:len(s) - 1] >> shift
    return s[order:] - pred


def _encode_subframe(bw: _BitWriter, sig: np.ndarray, bps: int,
                     partition_order: int, use_lpc: bool,
                     lpc_order: int, rice2: bool = False) -> None:
    n = len(sig)
    sig = sig.astype(np.int64)
    # wasted bits: shared trailing zeros across all samples
    orval = int(np.bitwise_or.reduce(sig)) if n else 0
    wasted = min((orval & -orval).bit_length() - 1, bps - 1) if orval else 0
    if wasted > 0:
        work = sig >> wasted
    else:
        wasted = 0
        work = sig
    eff = bps - wasted

    def header(ftype: int) -> None:
        bw.write(0, 1)
        bw.write(ftype, 6)
        if wasted:
            bw.write(1, 1)
            bw.write_unary(wasted - 1)
        else:
            bw.write(0, 1)

    if n and int(work.min()) == int(work.max()):
        header(0)
        bw.write(int(work[0]), eff)
        return

    candidates = []  # (est_bits, ftype, order, residual, extra)
    for order in range(0, min(4, n - 1) + 1):
        res = np.diff(work, n=order) if order else work
        z = _zigzag(res[: len(res)])
        k, cost = _best_rice_param(z)
        est = (cost if cost is not None
               else len(res) * (_raw_bits_needed(res) + 1)) + order * eff + 10
        candidates.append((est, 8 + order, order, res, None))
    if use_lpc and n > lpc_order * 2:
        lp = _lpc_coefs(work, lpc_order)
        if lp is not None:
            q, shift = lp
            res = _lpc_residual(work, q, shift)
            z = _zigzag(res)
            k, cost = _best_rice_param(z)
            est = (cost if cost is not None
                   else len(res) * (_raw_bits_needed(res) + 1))
            est += lpc_order * eff + 9 + lpc_order * 12 + 10
            candidates.append((est, 32 + lpc_order - 1, lpc_order, res,
                               (q, shift)))
    est, ftype, order, res, extra = min(candidates, key=lambda c: c[0])
    if est >= n * eff:  # VERBATIM is cheaper
        header(1)
        for v in work.tolist():
            bw.write(v, eff)
        return
    header(ftype)
    for v in work[:order].tolist():
        bw.write(v, eff)
    if extra is not None:
        q, shift = extra
        bw.write(12 - 1, 4)          # precision 12
        bw.write(shift, 5)
        for c in q.tolist():
            bw.write(int(c), 12)
    _write_residual(bw, res, n, order, partition_order, rice2)


def encode_flac(samples: np.ndarray, sample_rate: int, bps: int = 16,
                block_size: int = 4096, stereo: str = "auto",
                partition_order: int = 2, use_lpc: bool = False,
                lpc_order: int = 8, rice2: bool = False,
                _parts: bool = False):
    """Encode integer PCM → a spec-compliant FLAC stream.

    ``samples``: int array, shape ``(n,)`` or ``(n, channels)``, values
    in the signed `bps`-bit range.  ``stereo``: ``auto`` (per-frame
    cheapest of independent/left-side/right-side/mid-side, real FLAC
    behavior), or pin one of ``independent | left-side | right-side |
    mid-side`` (2-channel input only).  Lossless by construction —
    ``decode_flac(encode_flac(x)) == x`` exactly.
    """
    x = np.asarray(samples)
    if x.ndim == 1:
        x = x[:, None]
    if x.ndim != 2 or x.shape[1] < 1 or x.shape[1] > 8:
        raise ValueError("samples must be (n,) or (n, channels≤8)")
    if bps not in (8, 16, 24):
        raise ValueError("encoder supports 8/16/24-bit PCM")
    lim = 1 << (bps - 1)
    x = x.astype(np.int64)
    if x.size and (x.min() < -lim or x.max() >= lim):
        raise ValueError(f"samples exceed signed {bps}-bit range")
    nsamples, channels = x.shape
    if stereo != "auto" and channels != 2 and stereo != "independent":
        raise ValueError("stereo decorrelation requires 2 channels")
    if not 0 < block_size <= 65536:
        raise ValueError("block size out of range")

    frame_list: list[bytes] = []
    frame_no = 0
    for start in range(0, max(nsamples, 1), block_size):
        blk = x[start:start + block_size]
        bs = len(blk)
        if bs == 0:
            break
        bw = _BitWriter()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)
        bw.write(0, 1)                        # fixed blocking strategy
        bs_code = _BS_TO_CODE.get(bs)
        bw.write(bs_code if bs_code else 7, 4)
        rate_code = _RATE_TO_CODE.get(sample_rate)
        if rate_code is None:
            rate_code = 13 if sample_rate < 65536 else (
                14 if sample_rate // 10 < 65536 and sample_rate % 10 == 0
                else 0)
        bw.write(rate_code, 4)

        mode = stereo
        if channels == 2 and stereo == "auto":
            left, right = blk[:, 0], blk[:, 1]
            side = left - right
            mid = (left + right) >> 1
            def _cost(sig):
                z = _zigzag(np.diff(sig, n=2) if len(sig) > 2 else sig)
                _, c = _best_rice_param(z)
                return c if c is not None else len(sig) * _raw_bits_needed(sig)
            cl, cr, cs, cm = (_cost(left), _cost(right),
                              _cost(side), _cost(mid))
            mode = min((("independent", cl + cr), ("left-side", cl + cs),
                        ("right-side", cr + cs), ("mid-side", cm + cs)),
                       key=lambda kv: kv[1])[0]
        elif stereo == "auto":
            mode = "independent"

        if mode == "independent":
            bw.write(channels - 1, 4)
            subs = [(blk[:, c], bps) for c in range(channels)]
        elif mode == "left-side":
            bw.write(8, 4)
            subs = [(blk[:, 0], bps), (blk[:, 0] - blk[:, 1], bps + 1)]
        elif mode == "right-side":
            bw.write(9, 4)
            subs = [(blk[:, 0] - blk[:, 1], bps + 1), (blk[:, 1], bps)]
        elif mode == "mid-side":
            bw.write(10, 4)
            subs = [((blk[:, 0] + blk[:, 1]) >> 1, bps),
                    (blk[:, 0] - blk[:, 1], bps + 1)]
        else:
            raise ValueError(f"unknown stereo mode {mode!r}")

        bw.write(_BPS_TO_CODE[bps], 3)
        bw.write(0, 1)
        for b in _utf8_encode(frame_no):
            bw.write(b, 8)
        if not bs_code:
            bw.write(bs - 1, 16)
        if rate_code == 13:
            bw.write(sample_rate, 16)
        elif rate_code == 14:
            bw.write(sample_rate // 10, 16)
        if bw.nbits:  # header fields always sum to whole bytes
            raise RuntimeError("FLAC encoder: unaligned frame header")
        bw.write(_crc8(bw.out), 8)
        for sig, sub_bps in subs:
            _encode_subframe(bw, sig, sub_bps, partition_order,
                             use_lpc, lpc_order, rice2)
        bw.align()
        bw.write(_crc16(bw.out), 16)
        frame_list.append(bytes(bw.out))
        frame_no += 1

    md5 = hashlib.md5(_pcm_bytes(x, bps)).digest()
    packed = (sample_rate << 44) | ((channels - 1) << 41) | \
             ((bps - 1) << 36) | (nsamples & ((1 << 36) - 1))
    streaminfo = (struct.pack(">HH", block_size, block_size)
                  + b"\x00" * 6  # min/max frame size unknown
                  + packed.to_bytes(8, "big") + md5)
    header = bytes([0x80]) + len(streaminfo).to_bytes(3, "big") + streaminfo
    if _parts:  # Ogg-FLAC mapping needs (native header, per-frame packets)
        return _MAGIC + header, frame_list
    return _MAGIC + header + b"".join(frame_list)
