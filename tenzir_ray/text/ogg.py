"""Ogg container (RFC 3533) demuxing in pure stdlib + numpy.

Ogg is a pure page/packet framing layer with no entropy coding of its
own: ``OggS`` pages carry a segment-lacing table; packets are the
concatenation of segments (a 255-byte segment continues the packet, a
shorter one ends it). This module walks pages with full CRC-32
verification (the Ogg polynomial 0x04C11DB7, unreflected, zero init),
reassembles packets for the first logical stream, and:

- parses the identification header of **Vorbis**, **Opus**, **Speex**
  and **Ogg-FLAC** streams → codec / channels / sample-rate /
  duration metadata (granule positions are PCM sample counts for
  Vorbis+FLAC and 48 kHz ticks for Opus);
- **fully decodes Ogg-FLAC to PCM**: the mapping's packets are native
  FLAC metadata blocks and frames, so reassembly + last-block-flag
  repair feeds :mod:`tenzir_ray.text.flac` end-to-end — a real PCM
  path for an Ogg container with no codec library;
- provides the muxer dual :func:`encode_ogg_flac` (and the low-level
  :func:`mux_ogg`) so tests can assert exact lossless round-trips.

Vorbis/Opus/Speex PCM decode needs MDCT/CELT codebooks (tabulated
entropy data) — those stay loud stubs per the repo-wide codec policy.
"""

from __future__ import annotations

import struct

import numpy as np


def _make_ogg_crc_table() -> np.ndarray:
    poly = 0x04C11DB7
    tab = np.zeros(256, np.uint32)
    for i in range(256):
        r = i << 24
        for _ in range(8):
            r = ((r << 1) ^ poly if r & 0x80000000 else r << 1) & 0xFFFFFFFF
        tab[i] = r
    return tab


_CRC_TABLE = _make_ogg_crc_table()


def _ogg_crc(data: bytes) -> int:
    """CRC-32/MPEG-2 style (unreflected, init 0, no final xor) — the
    Ogg page checksum."""
    crc = 0
    tab = _CRC_TABLE
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ int(tab[((crc >> 24) ^ b) & 0xFF])
    return crc


def ogg_pages(buf: bytes):
    """Yield (header_type, granule, serial, seq, segments) per page,
    CRC-verified."""
    pos = 0
    n = len(buf)
    while pos + 27 <= n:
        if buf[pos:pos + 4] != b"OggS":
            raise ValueError("Ogg: lost page sync")
        if buf[pos + 4] != 0:
            raise ValueError("Ogg: unsupported stream structure version")
        htype = buf[pos + 5]
        granule, serial, seq, crc = struct.unpack_from("<qIII", buf, pos + 6)
        nsegs = buf[pos + 26]
        lace = buf[pos + 27:pos + 27 + nsegs]
        if len(lace) < nsegs:
            raise ValueError("Ogg: truncated lacing table")
        body_len = sum(lace)
        body_start = pos + 27 + nsegs
        if body_start + body_len > n:
            raise ValueError("Ogg: truncated page body")
        page = bytearray(buf[pos:body_start + body_len])
        page[22:26] = b"\x00" * 4
        if _ogg_crc(bytes(page)) != crc:
            raise ValueError("Ogg: page CRC mismatch")
        segs = []
        off = body_start
        for ln in lace:
            segs.append((buf[off:off + ln], ln))
            off += ln
        yield htype, granule, serial, seq, segs
        pos = body_start + body_len


def ogg_packets(buf: bytes):
    """Reassemble packets of the FIRST logical stream; yields
    (packet_bytes, granule_of_closing_page)."""
    serial0 = None
    partial = bytearray()
    for htype, granule, serial, _seq, segs in ogg_pages(buf):
        if serial0 is None:
            serial0 = serial
        if serial != serial0:
            continue  # multiplexed second stream: skip
        if partial and not (htype & 0x01):
            partial = bytearray()  # unterminated previous packet: drop
        for seg, ln in segs:
            partial += seg
            if ln < 255:  # packet boundary
                yield bytes(partial), granule
                partial = bytearray()
    # an unterminated trailing packet (truncated stream) is dropped


def parse_ogg(buf: bytes) -> dict:
    """First-stream metadata: ``{codec, channels, sample_rate,
    duration_s}``. Duration comes from the last page's granule
    position (PCM samples for vorbis/flac/speex, 48 kHz ticks minus
    pre-skip for opus)."""
    first = None
    last_granule = 0
    for pkt, granule in ogg_packets(buf):
        if first is None:
            first = pkt
        if granule > 0:
            last_granule = granule
    if first is None:
        raise ValueError("Ogg: no packets")
    if first[:7] == b"\x01vorbis":
        if len(first) < 30:
            raise ValueError("Ogg: short vorbis id header")
        channels = first[11]
        rate = struct.unpack_from("<I", first, 12)[0]
        codec = "vorbis"
        dur = last_granule / rate if rate else None
    elif first[:8] == b"OpusHead":
        if len(first) < 19:
            raise ValueError("Ogg: short OpusHead")
        channels = first[9]
        preskip = struct.unpack_from("<H", first, 10)[0]
        rate = struct.unpack_from("<I", first, 12)[0]  # input rate
        codec = "opus"
        dur = max(last_granule - preskip, 0) / 48000.0
    elif first[:8] == b"Speex   ":
        if len(first) < 56:
            raise ValueError("Ogg: short Speex header")
        rate = struct.unpack_from("<I", first, 36)[0]
        channels = struct.unpack_from("<I", first, 48)[0]
        codec = "speex"
        dur = last_granule / rate if rate else None
    elif first[:5] == b"\x7fFLAC":
        if len(first) < 51 or first[9:13] != b"fLaC":
            raise ValueError("Ogg: malformed FLAC mapping header")
        streaminfo = first[17:51]  # after fLaC + 4-byte block header
        packed = int.from_bytes(streaminfo[10:18], "big")
        rate = packed >> 44
        channels = ((packed >> 41) & 0x7) + 1
        codec = "flac"
        dur = last_granule / rate if rate else None
    else:
        raise ValueError("Ogg: unrecognized codec id header")
    if not rate or not channels:
        raise ValueError("Ogg: bad id header fields")
    return {"codec": codec, "channels": int(channels),
            "sample_rate": int(rate), "duration_s": dur}


def decode_ogg_flac(buf: bytes) -> tuple[int, np.ndarray]:
    """Ogg-FLAC → (sample_rate, float32 mono waveform): rebuild the
    native FLAC stream from the mapping's packets (first packet =
    ``0x7F FLAC maj min nheaders(2BE) fLaC <STREAMINFO block>``;
    the next ``nheaders`` packets are metadata blocks; the rest are
    frames), repair the metadata last-block flags, and hand the
    result to :func:`tenzir_ray.text.flac.decode_flac_audio`."""
    from tenzir_ray.text.flac import decode_flac_audio

    pkts = ogg_packets(buf)
    try:
        first, _ = next(pkts)
    except StopIteration:
        raise ValueError("Ogg: empty stream") from None
    if first[:5] != b"\x7fFLAC" or first[9:13] != b"fLaC":
        raise ValueError("not an Ogg-FLAC stream")
    nheaders = struct.unpack_from(">H", first, 7)[0]
    meta = [bytearray(first[13:])]  # STREAMINFO block (header + body)
    frames = []
    for i, (pkt, _g) in enumerate(pkts):
        if i < nheaders:
            meta.append(bytearray(pkt))
        else:
            frames.append(pkt)
    # repair last-block flags: only the final metadata block sets bit 7
    for j, blk in enumerate(meta):
        if not blk:
            raise ValueError("Ogg-FLAC: empty metadata packet")
        blk[0] = (blk[0] & 0x7F) | (0x80 if j == len(meta) - 1 else 0)
    native = b"fLaC" + b"".join(bytes(b) for b in meta) + b"".join(frames)
    return decode_flac_audio(native)


# -------------------------------------------------------------- muxer


def mux_ogg(packets: list[bytes], granules: list[int],
            serial: int = 0x6F676754) -> bytes:
    """Pack packets into Ogg pages (one packet per page — legal and
    simplest; 255-segment lacing handles packets ≥ 64 KiB), with BOS
    on the first page and EOS on the last."""
    if not packets or len(packets) != len(granules):
        raise ValueError("packets/granules mismatch")
    out = bytearray()
    for i, (pkt, granule) in enumerate(zip(packets, granules)):
        lace = []
        rest = len(pkt)
        while rest >= 255:
            lace.append(255)
            rest -= 255
        lace.append(rest)  # final short (possibly 0) segment ends it
        if len(lace) > 255:
            raise ValueError("packet too large for a single page")
        htype = (0x02 if i == 0 else 0) | (0x04 if i == len(packets) - 1
                                           else 0)
        header = (b"OggS\x00" + bytes([htype])
                  + struct.pack("<qIII", granule, serial, i, 0)
                  + bytes([len(lace)]) + bytes(lace))
        page = header + pkt
        crc = _ogg_crc(page)
        out += page[:22] + struct.pack("<I", crc) + page[26:]
    return bytes(out)


def encode_ogg_flac(samples: np.ndarray, sample_rate: int,
                    **flac_kwargs) -> bytes:
    """Encoder dual of :func:`decode_ogg_flac`: native FLAC header +
    frames from :func:`tenzir_ray.text.flac.encode_flac`, wrapped per
    the Ogg-FLAC mapping (version 1.0, zero extra header packets)."""
    from tenzir_ray.text.flac import encode_flac

    header, frames = encode_flac(samples, sample_rate, _parts=True,
                                 **flac_kwargs)
    # header = b"fLaC" + STREAMINFO block (last-block flag already set)
    first = b"\x7fFLAC\x01\x00" + struct.pack(">H", 0) + header
    x = np.asarray(samples)
    nsamples = x.shape[0] if x.ndim else 0
    block = flac_kwargs.get("block_size", 4096)
    packets = [first] + frames
    granules = [0] + [min((i + 1) * block, nsamples)
                      for i in range(len(frames))]
    return mux_ogg(packets, granules)
