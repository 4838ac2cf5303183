"""FLAC STREAMINFO and Ogg (Opus/Vorbis) metadata walkers.

Completes the audio metadata tier (webtext/mp3.py, webtext/aac.py):
both formats expose exact stream geometry at the CONTAINER layer — no
entropy decode needed — via public specs (xiph.org FLAC format,
RFC 3533 Ogg framing, RFC 7845 Ogg-Opus, Vorbis I spec):

* FLAC: the mandatory first metadata block (STREAMINFO, 34 bytes)
  carries sample rate, channels, bit depth and total samples directly.
* Ogg: page headers carry absolute granule positions; duration is the
  last page's granule (minus Opus pre-skip, at the fixed 48 kHz Opus
  granule rate; at the stream sample rate for Vorbis), channels/rate
  come from the codec ID header on the first page.

Sample-level stats stay NULL (they need the actual codec — same
boundary as MP3/AAC). O(n_pages) walk, constant work per header.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass


@dataclass
class AudioStreamInfo:
    codec: str  # "flac" | "opus" | "vorbis"
    sample_rate: int
    n_channels: int
    duration_sec: float
    total_samples: int  # at sample_rate (0 if the stream is unfinalized)
    bits_per_sample: int  # 0 where the container doesn't expose it


def _parse_flac_impl(blob: bytes) -> AudioStreamInfo | None:
    """'fLaC' magic + STREAMINFO (block type 0, always first)."""
    if blob[:4] != b"fLaC" or len(blob) < 4 + 4 + 34:
        return None
    btype = blob[4] & 0x7F
    blen = int.from_bytes(blob[5:8], "big")
    if btype != 0 or blen < 34:
        return None
    si = blob[8:42]
    rate = (si[10] << 12) | (si[11] << 4) | (si[12] >> 4)
    channels = ((si[12] >> 1) & 0x07) + 1
    bits = (((si[12] & 1) << 4) | (si[13] >> 4)) + 1
    total = ((si[13] & 0x0F) << 32) | struct.unpack_from(">I", si, 14)[0]
    if rate == 0:
        return None
    return AudioStreamInfo(
        codec="flac",
        sample_rate=rate,
        n_channels=channels,
        duration_sec=total / rate,
        total_samples=total,
        bits_per_sample=bits,
    )


def _ogg_pages(blob: bytes):
    """Yield (granule, payload_first_bytes) per Ogg page."""
    pos = 0
    n = len(blob)
    while pos + 27 <= n:
        if blob[pos : pos + 4] != b"OggS" or blob[pos + 4] != 0:
            break
        granule = struct.unpack_from("<q", blob, pos + 6)[0]
        nseg = blob[pos + 26]
        seg_table = blob[pos + 27 : pos + 27 + nseg]
        body = pos + 27 + nseg
        size = sum(seg_table)
        yield granule, blob[body : body + min(size, 64)]
        pos = body + size


def _parse_ogg_impl(blob: bytes) -> AudioStreamInfo | None:
    """Walk Ogg pages: codec ID header on the first page, duration from
    the last non-(-1) granule position."""
    if blob[:4] != b"OggS":
        return None
    codec = None
    rate = channels = 0
    preskip = 0
    granule_rate = 0
    last_granule = -1
    n_pages = 0
    for granule, head in _ogg_pages(blob):
        n_pages += 1
        if n_pages == 1:
            if head[:8] == b"OpusHead" and len(head) >= 16:
                codec = "opus"
                channels = head[9]
                preskip = struct.unpack_from("<H", head, 10)[0]
                # the ORIGINAL input rate (informational); granules are
                # fixed 48 kHz regardless (RFC 7845 §4)
                rate = struct.unpack_from("<I", head, 12)[0] or 48000
                granule_rate = 48000
            elif head[:7] == b"\x01vorbis" and len(head) >= 16:
                codec = "vorbis"
                channels = head[11]
                rate = struct.unpack_from("<I", head, 12)[0]
                granule_rate = rate
            else:
                return None
        if granule >= 0:
            last_granule = max(last_granule, granule)
    if codec is None or channels == 0 or granule_rate == 0:
        return None
    if codec == "opus":
        samples_48k = max(last_granule - preskip, 0)
        dur = samples_48k / 48000.0
        total = int(round(dur * rate))
    else:
        dur = max(last_granule, 0) / granule_rate
        total = max(last_granule, 0)
    return AudioStreamInfo(
        codec=codec,
        sample_rate=rate,
        n_channels=channels,
        duration_sec=dur,
        total_samples=total,
        bits_per_sample=0,
    )


# -- test-fixture synthesizers (deterministic, spec-shaped) -------------


def synthesize_flac(rate=44100, channels=2, bits=16,
                    total_samples=441000) -> bytes:
    si = bytearray(34)
    struct.pack_into(">HH", si, 0, 4096, 4096)  # block sizes
    si[10] = (rate >> 12) & 0xFF
    si[11] = (rate >> 4) & 0xFF
    si[12] = ((rate & 0x0F) << 4) | (((channels - 1) & 0x07) << 1) | (
        ((bits - 1) >> 4) & 1)
    si[13] = (((bits - 1) & 0x0F) << 4) | ((total_samples >> 32) & 0x0F)
    struct.pack_into(">I", si, 14, total_samples & 0xFFFFFFFF)
    return b"fLaC" + bytes([0x80]) + len(si).to_bytes(3, "big") + bytes(si)


def _ogg_page(granule: int, payload: bytes, seq: int,
              header_type: int = 0) -> bytes:
    segs = []
    rem = len(payload)
    while rem >= 255:
        segs.append(255)
        rem -= 255
    segs.append(rem)
    hdr = b"OggS" + bytes([0, header_type])
    hdr += struct.pack("<q", granule)
    hdr += struct.pack("<IIi", 1, seq, 0)  # serial, seq, crc (unchecked)
    hdr += bytes([len(segs)]) + bytes(segs)
    return hdr + payload


def synthesize_ogg_opus(duration_sec=2.5, channels=2, preskip=312,
                        input_rate=48000, n_pages=4) -> bytes:
    head = b"OpusHead" + bytes([1, channels]) + struct.pack(
        "<H", preskip) + struct.pack("<I", input_rate) + bytes(3)
    out = bytearray(_ogg_page(-1, head, 0, header_type=2))
    out += _ogg_page(-1, b"OpusTags\x00\x00\x00\x00\x00\x00\x00\x00", 1)
    total_granule = preskip + int(round(duration_sec * 48000))
    for i in range(n_pages):
        g = (total_granule * (i + 1)) // n_pages
        out += _ogg_page(g, bytes(50), 2 + i,
                         header_type=4 if i == n_pages - 1 else 0)
    return bytes(out)


def synthesize_ogg_vorbis(duration_sec=1.25, channels=1,
                          rate=22050, n_pages=3) -> bytes:
    head = b"\x01vorbis" + bytes(4) + bytes([channels]) + struct.pack(
        "<I", rate) + bytes(16)
    out = bytearray(_ogg_page(-1, head, 0, header_type=2))
    total = int(round(duration_sec * rate))
    for i in range(n_pages):
        g = (total * (i + 1)) // n_pages
        out += _ogg_page(g, bytes(40), 1 + i,
                         header_type=4 if i == n_pages - 1 else 0)
    return bytes(out)


def parse_flac_info(blob: bytes) -> AudioStreamInfo | None:
    """Total wrapper: malformed/truncated input -> None, never an
    exception escaping into a Spark task."""
    try:
        return _parse_flac_impl(blob)
    except (IndexError, KeyError, ValueError, ZeroDivisionError,
            RecursionError, struct.error, MemoryError):
        return None


def parse_ogg_info(blob: bytes) -> AudioStreamInfo | None:
    """Total wrapper: malformed/truncated input -> None, never an
    exception escaping into a Spark task."""
    try:
        return _parse_ogg_impl(blob)
    except (IndexError, KeyError, ValueError, ZeroDivisionError,
            RecursionError, struct.error, MemoryError):
        return None
