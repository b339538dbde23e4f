"""FLAC codec tests: exact lossless round-trips through every encoder
path (stereo modes, Rice/Rice2, escape partitions, LPC, wasted bits,
odd block sizes, 8/24-bit), integrity-check behavior under corruption,
and the multimodal-stage integration."""

import numpy as np
import pyarrow as pa
import pytest

from tenzir_ray.text.flac import (
    decode_flac, decode_flac_audio, encode_flac,
)


def _tone(n, seed=0, amp=3000, noise=50):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    x = amp * np.sin(t / 17.0) + amp / 4 * np.sin(t / 3.1)
    return (x + rng.integers(-noise, noise + 1, n)).astype(np.int64)


def test_mono_roundtrip_and_compression():
    x = _tone(9000)
    buf = encode_flac(x, 16000)
    rate, bps, out = decode_flac(buf)
    assert (rate, bps) == (16000, 16)
    assert out.shape == (9000, 1)
    assert np.array_equal(out[:, 0], x)
    assert len(buf) < 0.7 * 2 * len(x)  # actually compresses tonal PCM


def test_stereo_modes_roundtrip():
    L = _tone(5000, seed=1)
    R = (L * 9) // 10 + _tone(5000, seed=2, amp=0, noise=40)
    st = np.stack([L, R], 1)
    sizes = {}
    for mode in ("independent", "left-side", "right-side", "mid-side"):
        buf = encode_flac(st, 44100, stereo=mode)
        _, _, out = decode_flac(buf)
        assert np.array_equal(out, st), mode
        sizes[mode] = len(buf)
    # correlated channels: every decorrelated mode beats independent
    assert max(sizes["left-side"], sizes["right-side"],
               sizes["mid-side"]) < sizes["independent"]
    # auto picks one of the cheap modes
    auto = encode_flac(st, 44100)
    _, _, out = decode_flac(auto)
    assert np.array_equal(out, st)
    assert len(auto) <= sizes["independent"]


def test_block_sizes_and_short_tail():
    x = _tone(10_000, seed=3)
    for bs in (192, 576, 1000, 4096, 8192):
        buf = encode_flac(x, 48000, block_size=bs)
        _, _, out = decode_flac(buf)
        assert np.array_equal(out[:, 0], x), bs


def test_many_frames_utf8_numbers():
    # >127 frames forces multi-byte extended-UTF-8 frame numbers
    x = _tone(40_000, seed=4)
    buf = encode_flac(x, 8000, block_size=192)
    _, _, out = decode_flac(buf)
    assert np.array_equal(out[:, 0], x)


def test_rice2_high_magnitude_residuals():
    # 24-bit noise: optimal Rice parameter ≥ 15, so 4-bit Rice must
    # escape while 5-bit Rice2 can code it — streams differ, both exact
    rng = np.random.default_rng(5)
    x = rng.integers(-(1 << 23), 1 << 23, 6000)
    b1 = encode_flac(x, 96000, bps=24)
    b2 = encode_flac(x, 96000, bps=24, rice2=True)
    for buf in (b1, b2):
        _, bps, out = decode_flac(buf)
        assert bps == 24
        assert np.array_equal(out[:, 0], x)


def test_escape_partition_mixed_signal():
    # smooth everywhere except one wild partition: the fixed predictor
    # still wins overall, and the wild partition escapes to raw bits
    x = _tone(4096, seed=6)
    rng = np.random.default_rng(7)
    x[1024:2048] = rng.integers(-30000, 30000, 1024)
    buf = encode_flac(x, 16000, partition_order=2)
    _, _, out = decode_flac(buf)
    assert np.array_equal(out[:, 0], x)


def test_lpc_beats_fixed_on_ar_process():
    # AR(8) process: LPC whitens it, polynomial predictors cannot —
    # the smaller use_lpc stream proves the LPC subframe was chosen
    rng = np.random.default_rng(8)
    coef = np.array([1.8, -1.2, 0.5, -0.3, 0.2, -0.15, 0.1, -0.05])
    x = np.zeros(12_000)
    e = rng.normal(0, 40, 12_000)
    for i in range(8, len(x)):
        x[i] = np.dot(coef, x[i - 8:i][::-1]) + e[i]
    x = np.clip(x, -32000, 32000).astype(np.int64)
    b_fixed = encode_flac(x, 16000)
    b_lpc = encode_flac(x, 16000, use_lpc=True)
    for buf in (b_fixed, b_lpc):
        _, _, out = decode_flac(buf)
        assert np.array_equal(out[:, 0], x)
    assert len(b_lpc) < len(b_fixed)


def test_wasted_bits():
    x = _tone(4000, seed=9)
    shifted = x * 8             # 3 shared trailing zero bits
    spoiled = shifted + 1       # no shared trailing zeros
    b_w = encode_flac(shifted, 8000)
    b_s = encode_flac(spoiled, 8000)
    _, _, out = decode_flac(b_w)
    assert np.array_equal(out[:, 0], shifted)
    # wasted-bit shifting keeps the stream as small as the unshifted
    # signal's; without it the residuals would be 8x larger
    assert len(b_w) < len(b_s)


def test_bit_depths_and_multichannel():
    x = _tone(3000, seed=10)
    x8 = x // 256
    buf = encode_flac(x8, 8000, bps=8)
    rate, bps, out = decode_flac(buf)
    assert bps == 8 and np.array_equal(out[:, 0], x8)
    x24 = x * 200
    buf = encode_flac(x24, 192000, bps=24)
    rate, bps, out = decode_flac(buf)
    assert (rate, bps) == (192000, 24)
    assert np.array_equal(out[:, 0], x24)
    # 3 channels force independent coding
    tri = np.stack([x, x // 2, -x], 1)
    _, _, out = decode_flac(encode_flac(tri, 22050))
    assert np.array_equal(out, tri)


def test_constant_and_empty():
    const = np.full(5000, -123, np.int64)
    buf = encode_flac(const, 44100)
    _, _, out = decode_flac(buf)
    assert np.array_equal(out[:, 0], const)
    assert len(buf) < 200  # constant subframes are a few bytes/frame
    _, _, out = decode_flac(encode_flac(np.zeros((0, 2), np.int64), 8000))
    assert out.shape == (0, 2)


def test_nonstandard_sample_rate_survives():
    x = _tone(2000, seed=11)
    for rate in (11025, 12345, 123450, 65536):
        r, _, out = decode_flac(encode_flac(x, rate))
        assert r == rate
        assert np.array_equal(out[:, 0], x)


def test_input_validation():
    with pytest.raises(ValueError):
        encode_flac(np.array([40000]), 8000, bps=16)  # out of range
    with pytest.raises(ValueError):
        encode_flac(np.zeros((4, 9), np.int64), 8000)  # 9 channels
    with pytest.raises(ValueError):
        encode_flac(np.zeros(4, np.int64), 8000, bps=12)  # not byte-aligned
    with pytest.raises(ValueError):
        decode_flac(b"not flac at all")


def test_bit_flips_never_silently_corrupt():
    x = _tone(2500, seed=12)
    buf = bytearray(encode_flac(x, 16000, block_size=1000))
    flips = 0
    for off in range(0, len(buf), 37):
        for bit in (0x01, 0x40):
            bad = bytes(buf[:off]) + bytes([buf[off] ^ bit]) + bytes(buf[off + 1:])
            try:
                _, _, out = decode_flac(bad)
            except ValueError:
                flips += 1
                continue
            # undetectable only if the flip landed in dead bytes
            # (unused STREAMINFO fields): output must still be exact
            assert np.array_equal(out[:, 0], x)
    assert flips > 20  # CRCs catch the overwhelming majority


def test_truncation_raises():
    x = _tone(3000, seed=13)
    buf = encode_flac(x, 16000)
    for cut in (3, 20, 41, len(buf) // 2, len(buf) - 3):
        with pytest.raises(ValueError):
            decode_flac(buf[:cut])


def test_md5_integrity_check():
    x = _tone(2000, seed=14)
    buf = bytearray(encode_flac(x, 16000))
    # STREAMINFO MD5 lives at bytes 26..42 of the stream
    buf[30] ^= 0xFF
    with pytest.raises(ValueError, match="MD5"):
        decode_flac(bytes(buf))
    # an all-zero MD5 means "unset" and skips the check
    buf[26:42] = b"\x00" * 16
    _, _, out = decode_flac(bytes(buf))
    assert np.array_equal(out[:, 0], x)


def test_decode_audio_dispatch_matches_wav():
    from tenzir_ray.text.multimodal import _decode_audio

    x = _tone(4000, seed=15)
    flac_rate, flac_mono = _decode_audio(encode_flac(x, 16000))
    assert flac_rate == 16000
    np.testing.assert_allclose(
        flac_mono, x.astype(np.float32) / 32768.0, atol=1e-7)
    # stereo downmix mirrors the WAV path (channel mean)
    st = np.stack([x, -x], 1)
    _, mono = decode_flac_audio(encode_flac(st, 8000))
    np.testing.assert_allclose(mono, 0.0, atol=1e-7)


def test_audio_features_stage_with_flac():
    from tenzir_ray.text.multimodal import AudioFeatures

    x = _tone(8000, seed=16)
    wav_rms = float(np.sqrt(np.mean((x / 32768.0) ** 2)))
    t = pa.table({
        "aid": pa.array([0, 1], pa.int64()),
        "audio": pa.array([encode_flac(x, 16000),
                           encode_flac(x, 16000, use_lpc=True)],
                          pa.binary()),
    })
    out = AudioFeatures()(t)
    assert out.column("audio_ok").to_pylist() == [True, True]
    assert out.column("sample_rate").to_pylist() == [16000, 16000]
    for rms in out.column("audio_rms").to_pylist():
        assert abs(rms - wav_rms) < 1e-6
    for dur in out.column("duration_s").to_pylist():
        assert abs(dur - 0.5) < 1e-9
