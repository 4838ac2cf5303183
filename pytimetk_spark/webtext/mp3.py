"""MPEG audio (MP3) frame-header walker — metadata without MDCT decode.

Same layered split as video (webtext/mp4.py): the FRAME layer of an MP3
stream — sync words, version/layer, bitrate and sample-rate indices,
padding, frame lengths, ID3v2 skip — is a pure public byte format
(ISO/IEC 11172-3) and gives sample rate, channel mode, frame count,
exact duration and average bitrate by walking headers; the MDCT/huffman
sample decode (the layer needing ffmpeg) stays stubbed. Duration and
rate are what a crawl pipeline filters on; samples go to a decode stage.

Walks up to every frame (they're a few hundred bytes each) — O(n_frames)
pure-python but each step is constant work on a 4-byte header.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

# bitrate kbps tables: [version_group][layer][index]; index 0 = free, 15 bad
_BITRATE_V1 = {
    1: [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    2: [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    3: [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
}
_BITRATE_V2 = {
    1: [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    2: [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    3: [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}
_SAMPLE_RATE = {3: [44100, 48000, 32000], 2: [22050, 24000, 16000],
                0: [11025, 12000, 8000]}  # version bits -> rates
_SAMPLES_PER_FRAME = {  # [version_group][layer]
    1: {1: 384, 2: 1152, 3: 1152},
    2: {1: 384, 2: 1152, 3: 576},
}


@dataclass
class Mp3Info:
    sample_rate: int
    n_channels: int
    n_frames: int
    duration_sec: float
    bitrate_kbps_avg: float
    layer: int
    version: str


def _id3v2_size(blob: bytes) -> int:
    if blob[:3] != b"ID3" or len(blob) < 10:
        return 0
    b = blob[6:10]
    return 10 + ((b[0] << 21) | (b[1] << 14) | (b[2] << 7) | b[3])


def _parse_mp3_impl(blob: bytes) -> Mp3Info | None:
    """Walk MPEG audio frames -> Mp3Info, or None if no coherent frame
    sequence is found (needs >= 2 consecutive valid frames to avoid
    false syncs in arbitrary binary)."""
    pos = _id3v2_size(blob)
    n = len(blob)
    # find first sync that chains into a second valid frame
    start = None
    scan_limit = min(n - 4, pos + 65536)
    while pos <= scan_limit:
        hdr = _frame(blob, pos)
        if hdr is not None:
            nxt = _frame(blob, pos + hdr[0])
            if nxt is not None:
                start = pos
                break
        pos += 1
    if start is None:
        return None
    pos = start
    n_frames = 0
    total_bits = 0
    total_samples = 0
    rate = ch = layer = 0
    version = ""
    while pos + 4 <= n:
        hdr = _frame(blob, pos)
        if hdr is None:
            break
        flen, frate, fch, flayer, fver, fbitrate, spf = hdr
        n_frames += 1
        total_bits += fbitrate * 1000 * spf // frate if frate else 0
        total_samples += spf
        rate, ch, layer, version = frate, fch, flayer, fver
        pos += flen
    if n_frames == 0 or rate == 0:
        return None
    dur = total_samples / rate
    return Mp3Info(
        sample_rate=rate,
        n_channels=ch,
        n_frames=n_frames,
        duration_sec=dur,
        bitrate_kbps_avg=(total_bits / dur / 1000.0) if dur else 0.0,
        layer=layer,
        version=version,
    )


def _frame(blob: bytes, pos: int):
    """Validate a frame header at pos -> (frame_len, rate, channels,
    layer, version, bitrate_kbps, samples_per_frame) or None."""
    if pos + 4 > len(blob):
        return None
    b0, b1, b2, b3 = blob[pos : pos + 4]
    if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
        return None
    ver_bits = (b1 >> 3) & 0x03  # 0=v2.5, 2=v2, 3=v1 (1=reserved)
    layer_bits = (b1 >> 1) & 0x03  # 3=L1, 2=L2, 1=L3 (0=reserved)
    if ver_bits == 1 or layer_bits == 0:
        return None
    layer = 4 - layer_bits
    br_idx = (b2 >> 4) & 0x0F
    sr_idx = (b2 >> 2) & 0x03
    if br_idx in (0, 15) or sr_idx == 3:
        return None
    padding = (b2 >> 1) & 0x01
    ch_mode = (b3 >> 6) & 0x03
    vgroup = 1 if ver_bits == 3 else 2
    bitrate = (_BITRATE_V1 if vgroup == 1 else _BITRATE_V2)[layer][br_idx]
    rate = _SAMPLE_RATE[ver_bits][sr_idx]
    spf = _SAMPLES_PER_FRAME[vgroup][layer]
    if layer == 1:
        flen = (12 * bitrate * 1000 // rate + padding) * 4
    else:
        flen = spf // 8 * bitrate * 1000 // rate + padding
    if flen < 4:
        return None
    version = {3: "MPEG1", 2: "MPEG2", 0: "MPEG2.5"}[ver_bits]
    return (flen, rate, 2 if ch_mode != 3 else 1, layer, version,
            bitrate, spf)


def _frame_header_bytes(version_bits: int, layer: int, br_idx: int,
                        sr_idx: int, padding: int, mono: bool) -> bytes:
    """Assemble a header (test fixtures use this to synthesize streams)."""
    layer_bits = 4 - layer
    b1 = 0xE0 | (version_bits << 3) | (layer_bits << 1) | 1
    b2 = (br_idx << 4) | (sr_idx << 2) | (padding << 1)
    b3 = (0xC0 if mono else 0x00)
    return bytes([0xFF, b1, b2, b3])


def synthesize_mp3_stream(n_frames: int, version_bits: int = 3,
                          layer: int = 3, br_idx: int = 9, sr_idx: int = 0,
                          mono: bool = False, id3: bool = False) -> bytes:
    """Deterministic valid frame chain (header + zero payload per frame)
    for differential tests — same in-module-fixture pattern as the
    synthetic BMP/WAV generators."""
    hdr = _frame_header_bytes(version_bits, layer, br_idx, sr_idx, 0, mono)
    info = _frame(hdr + b"\x00" * 8, 0)
    assert info is not None
    flen = info[0]
    frame = hdr + b"\x00" * (flen - 4)
    out = b""
    if id3:
        body = b"\x00" * 100
        out += b"ID3\x04\x00\x00" + bytes(
            [(len(body) >> 21) & 0x7F, (len(body) >> 14) & 0x7F,
             (len(body) >> 7) & 0x7F, len(body) & 0x7F]
        ) + body
    return out + frame * n_frames


def parse_mp3_info(blob: bytes) -> Mp3Info | None:
    """Total wrapper: malformed/truncated input -> None, never an
    exception escaping into a Spark task."""
    try:
        return _parse_mp3_impl(blob)
    except (IndexError, KeyError, ValueError, ZeroDivisionError,
            RecursionError, struct.error, MemoryError):
        return None
