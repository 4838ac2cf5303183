"""AAC ADTS frame-header walker — metadata without the MDCT codec.

Same layered split as MP3 (webtext/mp3.py) and MP4 (webtext/mp4.py):
the ADTS TRANSPORT layer (ISO/IEC 14496-3 / 13818-7) — 0xFFF syncwords,
profile, sampling-frequency index, channel configuration, 13-bit frame
lengths, optional CRC, raw-data-block counts — is a pure public byte
format and yields sample rate, channels, frame count, exact duration
and average bitrate by walking headers. The AAC filterbank/huffman
sample decode (the layer needing ffmpeg) stays stubbed. Duration and
rate are what a crawl pipeline filters on; samples go to a decode
stage.

Walks every frame: O(n_frames) pure python, constant work per 7/9-byte
header (same boundary as the MP3 walker).
"""

from __future__ import annotations

import struct

from dataclasses import dataclass

# sampling_frequency_index -> Hz (indices 13-14 reserved, 15 explicit)
_SAMPLE_RATES = [96000, 88200, 64000, 48000, 44100, 32000, 24000, 22050,
                 16000, 12000, 11025, 8000, 7350]
_PROFILES = ["Main", "LC", "SSR", "LTP"]


@dataclass
class AacInfo:
    sample_rate: int
    n_channels: int
    n_frames: int
    duration_sec: float
    bitrate_kbps_avg: float
    profile: str
    mpeg_version: int  # 2 or 4


# ID3v2 skip is shared with the MP3 walker (same container prefix)
from pytimetk_spark.webtext.mp3 import _id3v2_size  # noqa: E402


def _frame(blob: bytes, pos: int):
    """Validate an ADTS header at pos -> (frame_len, rate, channels,
    profile_idx, mpeg_version, n_blocks) or None."""
    if pos + 7 > len(blob):
        return None
    b = blob
    if b[pos] != 0xFF or (b[pos + 1] & 0xF6) != 0xF0:
        return None  # syncword 0xFFF + layer must be 00
    mpeg2 = (b[pos + 1] >> 3) & 1
    profile = b[pos + 2] >> 6
    sf_idx = (b[pos + 2] >> 2) & 0x0F
    if sf_idx >= len(_SAMPLE_RATES):
        return None
    ch_cfg = ((b[pos + 2] & 1) << 2) | (b[pos + 3] >> 6)
    if ch_cfg == 0:
        return None  # PCE-defined layouts: out of walker scope
    channels = 8 if ch_cfg == 7 else ch_cfg  # cfg 7 = 7.1 (8 ch)
    flen = ((b[pos + 3] & 0x03) << 11) | (b[pos + 4] << 3) | (b[pos + 5] >> 5)
    protection_absent = b[pos + 1] & 1
    min_len = 7 if protection_absent else 9
    if flen < min_len:
        return None
    n_blocks = (b[pos + 6] & 0x03) + 1
    return (flen, _SAMPLE_RATES[sf_idx], channels, profile,
            2 if mpeg2 else 4, n_blocks)


def _parse_aac_impl(blob: bytes) -> AacInfo | None:
    """Walk ADTS frames -> AacInfo, or None if no coherent frame chain
    exists (needs >= 2 consecutive valid frames to reject false syncs
    in arbitrary binary)."""
    pos = _id3v2_size(blob)
    n = len(blob)
    start = None
    scan_limit = min(n - 7, pos + 65536)
    while pos <= scan_limit:
        hdr = _frame(blob, pos)
        if hdr is not None and _frame(blob, pos + hdr[0]) is not None:
            start = pos
            break
        pos += 1
    if start is None:
        return None
    pos = start
    n_frames = 0
    total_bytes = 0
    total_samples = 0
    rate = ch = prof = ver = 0
    while pos + 7 <= n:
        hdr = _frame(blob, pos)
        if hdr is None:
            break
        flen, rate, ch, prof, ver, n_blocks = hdr
        n_frames += 1
        total_bytes += flen
        total_samples += 1024 * n_blocks
        pos += flen
    if n_frames == 0 or rate == 0:
        return None
    dur = total_samples / rate
    return AacInfo(
        sample_rate=rate,
        n_channels=ch,
        n_frames=n_frames,
        duration_sec=dur,
        bitrate_kbps_avg=(total_bytes * 8 / dur / 1000.0) if dur else 0.0,
        profile=_PROFILES[prof],
        mpeg_version=ver,
    )


def synthesize_adts_stream(
    n_frames: int,
    sf_idx: int = 4,
    channels: int = 2,
    profile: int = 1,
    payload_size: int = 200,
    mpeg2: bool = False,
    with_crc: bool = False,
    n_blocks: int = 1,
) -> bytes:
    """Deterministic valid ADTS chain (test fixture): each frame is a
    real 7/9-byte header plus a counter-patterned payload."""
    out = bytearray()
    hdr_len = 9 if with_crc else 7
    flen = hdr_len + payload_size
    for i in range(n_frames):
        h = bytearray(7)
        h[0] = 0xFF
        h[1] = 0xF0 | ((1 if mpeg2 else 0) << 3) | (0 if with_crc else 1)
        h[2] = (profile << 6) | (sf_idx << 2) | ((channels >> 2) & 1)
        h[3] = ((channels & 0x03) << 6) | ((flen >> 11) & 0x03)
        h[4] = (flen >> 3) & 0xFF
        h[5] = ((flen & 0x07) << 5) | 0x1F  # buffer fullness high bits
        h[6] = (0x3F << 2) | (n_blocks - 1)
        out += h
        if with_crc:
            out += bytes(2)  # CRC field (walker skips, not validated)
        out += bytes((i + j) & 0xFF for j in range(payload_size))
    return bytes(out)


def parse_aac_info(blob: bytes) -> AacInfo | None:
    """Total wrapper: malformed/truncated input -> None, never an
    exception escaping into a Spark task."""
    try:
        return _parse_aac_impl(blob)
    except (IndexError, KeyError, ValueError, ZeroDivisionError,
            RecursionError, struct.error, MemoryError):
        return None
