"""Ogg container: page CRC + packet reassembly, id-header metadata for
all four mapped codecs, the real Ogg-FLAC PCM path (lossless through
text/flac.py), muxer duals, and the never-crash contract."""

import struct

import numpy as np
import pyarrow as pa
import pytest

from tenzir_ray.text.ogg import (
    _ogg_crc,
    decode_ogg_flac,
    encode_ogg_flac,
    mux_ogg,
    ogg_packets,
    parse_ogg,
)


def _vorbis_id(channels=2, rate=44100):
    return (b"\x01vorbis" + struct.pack("<I", 0) + bytes([channels])
            + struct.pack("<IiiI", rate, 0, 0, 0) + b"\x00\x01")


def test_ogg_crc_known_vector():
    # CRC of 'OggS' header bytes with a zeroed checksum field must be
    # self-consistent: mux → demux verifies it end-to-end
    buf = mux_ogg([b"hello", b"world"], [0, 1])
    got = [p for p, _ in ogg_packets(buf)]
    assert got == [b"hello", b"world"]
    # flipping one payload byte breaks the page CRC loudly
    bad = bytearray(buf)
    bad[-1] ^= 0x01
    with pytest.raises(ValueError, match="CRC"):
        list(ogg_packets(bytes(bad)))


def test_ogg_large_packet_lacing():
    # > 255-byte and exact-multiple-of-255 packets span many segments
    pkts = [b"x" * 300, b"y" * 510, b"z"]
    buf = mux_ogg(pkts, [0, 1, 2])
    assert [p for p, _ in ogg_packets(buf)] == pkts


def test_parse_ogg_vorbis_opus_speex():
    v = mux_ogg([_vorbis_id(2, 44100)], [44100 * 3])
    m = parse_ogg(v)
    assert (m["codec"], m["channels"], m["sample_rate"]) == \
        ("vorbis", 2, 44100)
    assert m["duration_s"] == pytest.approx(3.0)

    opus = (b"OpusHead\x01" + bytes([1]) + struct.pack("<H", 312)
            + struct.pack("<I", 48000) + b"\x00\x00\x00")
    m = parse_ogg(mux_ogg([opus], [48000 + 312]))
    assert (m["codec"], m["channels"]) == ("opus", 1)
    assert m["duration_s"] == pytest.approx(1.0)

    speex = (b"Speex   " + b"\x00" * 28 + struct.pack("<I", 16000)
             + b"\x00" * 8 + struct.pack("<I", 1) + b"\x00" * 8)
    m = parse_ogg(mux_ogg([speex], [16000 * 2]))
    assert (m["codec"], m["sample_rate"]) == ("speex", 16000)
    assert m["duration_s"] == pytest.approx(2.0)


def test_ogg_flac_lossless_roundtrip():
    rng = np.random.default_rng(9)
    x = np.clip(3000 * np.sin(np.arange(700) / 7.0)
                + rng.integers(-500, 500, 700), -32768, 32767) \
        .astype(np.int64)
    buf = encode_ogg_flac(x, 16000, block_size=256)
    m = parse_ogg(buf)
    assert (m["codec"], m["sample_rate"], m["channels"]) == \
        ("flac", 16000, 1)
    assert m["duration_s"] == pytest.approx(700 / 16000)
    rate, got = decode_ogg_flac(buf)
    assert rate == 16000
    np.testing.assert_allclose(got * 32768.0, x, atol=0.5)


def test_ogg_flac_stereo_and_knobs():
    rng = np.random.default_rng(10)
    st = np.clip(rng.integers(-8000, 8000, (400, 2)), -32768, 32767) \
        .astype(np.int64)
    buf = encode_ogg_flac(st, 8000, block_size=192, stereo="mid-side")
    rate, got = decode_ogg_flac(buf)
    # channels average to mono through decode_flac_audio
    np.testing.assert_allclose(got * 32768.0, st.mean(axis=1), atol=0.51)


def test_ogg_through_audio_features():
    from tenzir_ray.text.multimodal import AudioFeatures

    x = (8000 * np.sin(np.arange(1600) / 5.0)).astype(np.int64)
    rows = [encode_ogg_flac(x, 8000),                 # real PCM decode
            mux_ogg([_vorbis_id(1, 22050)], [22050]),  # metadata only
            b"OggS" + b"\xff" * 40]                   # corrupt page
    out = AudioFeatures()(pa.table({"audio": pa.array(rows, pa.binary())}))
    assert out.column("audio_ok").to_pylist() == [True, True, False]
    assert out.column("sample_rate").to_pylist() == [8000, 22050, None]
    assert out.column("audio_rms")[0].as_py() > 0
    assert out.column("audio_rms")[1].as_py() is None


def test_ogg_corrupt_is_loud():
    good = encode_ogg_flac(np.zeros(16, np.int64), 8000)
    with pytest.raises(ValueError):
        list(ogg_packets(good[:40]))         # truncated page
    with pytest.raises(ValueError):
        parse_ogg(mux_ogg([b"mystery!"], [0]))  # unknown codec header
    with pytest.raises(ValueError):
        decode_ogg_flac(mux_ogg([_vorbis_id()], [0]))  # not FLAC
