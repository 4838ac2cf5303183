"""Pure-python GIF decoder (first frame).

Third compressed web-image format in the REAL decode tier (after JPEG,
webtext/jpeg.py, and PNG, webtext/png.py). GIF is LZW over palette
indices — fully decodable without external codecs (public spec:
GIF87a/GIF89a, CompuServe 1989/1990).

Supported: global/local color tables, interlaced and non-interlaced
frames, GIF89a graphic-control transparency (composited over white).
Returns the FIRST frame as HxWx3 uint8 RGB — multimodal feature
extraction treats animations like stills (same convention as thumbnail
pipelines). Returns None for malformed streams.

Performance shape: LZW is an inherently sequential code stream (a
Python loop over codes, with numpy for palette expansion / interlace
reorder / compositing). Runs per blob inside mapInPandas — same
amortization boundary as the JPEG/PNG/BMP/WAV decoders. At true
100-TB image volume this per-symbol Python loop is the CPU
bottleneck: this module is the SWAP-FOR-NATIVE-CODEC boundary — keep
the mapInPandas batch plumbing and replace only ``decode_gif`` with a
native library (PIL/libgif) where the deployment image has one.
"""

from __future__ import annotations

import struct

import numpy as np


def _decode_gif_impl(blob: bytes) -> np.ndarray | None:
    """Decode a GIF blob -> HxWx3 uint8 RGB (first frame), else None."""
    if blob[:6] not in (b"GIF87a", b"GIF89a") or len(blob) < 13:
        return None
    sw, sh, packed, bg, _ar = struct.unpack_from("<HHBBB", blob, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        size = 2 << (packed & 0x07)
        gct = np.frombuffer(blob, np.uint8, size * 3, pos).reshape(-1, 3)
        pos += size * 3
    transparent: int | None = None
    n = len(blob)
    while pos < n:
        b0 = blob[pos]
        pos += 1
        if b0 == 0x3B:  # trailer
            return None
        if b0 == 0x21:  # extension
            label = blob[pos]
            pos += 1
            if label == 0xF9 and blob[pos] >= 4:  # graphic control
                flags = blob[pos + 1]
                if flags & 0x01:
                    transparent = blob[pos + 4]
            while pos < n and blob[pos] != 0:  # skip sub-blocks
                pos += 1 + blob[pos]
            pos += 1
            continue
        if b0 != 0x2C:  # not an image descriptor
            return None
        left, top, w, h, ipacked = struct.unpack_from("<HHHHB", blob, pos)
        pos += 9
        ct = gct
        if ipacked & 0x80:
            size = 2 << (ipacked & 0x07)
            ct = np.frombuffer(blob, np.uint8, size * 3, pos).reshape(-1, 3)
            pos += size * 3
        if ct is None or w == 0 or h == 0:
            return None
        interlaced = bool(ipacked & 0x40)
        min_code = blob[pos]
        pos += 1
        data = bytearray()
        while pos < n and blob[pos] != 0:
            cnt = blob[pos]
            data += blob[pos + 1 : pos + 1 + cnt]
            pos += 1 + cnt
        idx = _lzw_decode(bytes(data), min_code, w * h)
        if idx is None:
            return None
        idx = np.asarray(idx[: w * h], np.int32)
        if idx.size < w * h:  # truncated stream: pad with background
            idx = np.pad(idx, (0, w * h - idx.size), constant_values=bg)
        grid = idx.reshape(h, w)
        if interlaced:
            out = np.empty_like(grid)
            order = np.concatenate(
                [np.arange(0, h, 8), np.arange(4, h, 8),
                 np.arange(2, h, 4), np.arange(1, h, 2)]
            )
            out[order] = grid
            grid = out
        grid = np.clip(grid, 0, len(ct) - 1)
        rgb = ct[grid].astype(np.float64)
        if transparent is not None:
            mask = (grid == transparent)[..., None]
            rgb = np.where(mask, 255.0, rgb)  # composite over white
        return rgb.astype(np.uint8)
    return None


def _lzw_decode(data: bytes, min_code: int, max_pixels: int) -> list | None:
    """GIF-variant LZW: variable code width starting at min_code+1,
    CLEAR resets the table, EOI terminates."""
    clear = 1 << min_code
    eoi = clear + 1
    out: list[int] = []
    table: list[list[int]] = []

    def reset():
        nonlocal table, width, next_code
        table = [[i] for i in range(clear)] + [[], []]
        width = min_code + 1
        next_code = eoi + 1

    width = 0
    next_code = 0
    reset()
    acc = 0
    nbits = 0
    prev: list[int] | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                reset()
                prev = None
                continue
            if code == eoi:
                return out
            if prev is None:
                if code >= len(table):
                    return None
                entry = table[code]
            elif code < next_code:
                entry = table[code]
                table.append(prev + [entry[0]])
                next_code += 1
            elif code == next_code:  # KwKwK case
                entry = prev + [prev[0]]
                table.append(entry)
                next_code += 1
            else:
                return None
            out.extend(entry)
            prev = entry
            if next_code == (1 << width) and width < 12:
                width += 1
            if len(out) >= max_pixels:
                return out
    return out


def decode_gif(blob: bytes) -> np.ndarray | None:
    """Total wrapper: one corrupt blob in a crawl shard must fall to
    the None/stub path, never kill a Spark task — truncated or
    malformed streams surface as parser exceptions in the impl."""
    try:
        return _decode_gif_impl(blob)
    except (IndexError, KeyError, ValueError, ZeroDivisionError,
            RecursionError, struct.error, MemoryError):
        return None
