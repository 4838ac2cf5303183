"""Header-only image geometry probe — dims/format without decoding.

The filter-before-decode step: at crawl scale you drop tiny icons and
select resolution bands BEFORE paying any entropy decode. Every
format's dimensions live in a fixed-offset or first-chunk header:
JPEG SOFn markers, PNG IHDR, GIF logical screen descriptor, BMP
BITMAPINFOHEADER, PPM text header, WebP VP8L header bits / lossy-VP8
keyframe header / VP8X canvas — including formats whose PIXEL decode
is stubbed (lossy VP8): geometry is still real.

``image_stream_info`` surfaces it as a Spark operator; per-blob python
cost is a few dozen byte reads (vs. the full decode's entropy loop).
"""

from __future__ import annotations

import re
import struct
from collections.abc import Iterator


def _parse_image_dims_impl(blob: bytes) -> dict | None:
    """-> {format, width, height, n_channels} or None if unrecognized."""
    n = len(blob)
    if n >= 10 and blob[0] == 0xFF and blob[1] == 0xD8:
        return _jpeg_dims(blob)
    if blob[:8] == b"\x89PNG\r\n\x1a\n" and n >= 26:
        w, h = struct.unpack_from(">II", blob, 16)
        color = blob[25]
        ch = {0: 1, 2: 3, 3: 3, 4: 2, 6: 4}.get(color, 3)
        return {"format": "png", "width": w, "height": h, "n_channels": ch}
    if blob[:6] in (b"GIF87a", b"GIF89a") and n >= 10:
        w, h = struct.unpack_from("<HH", blob, 6)
        return {"format": "gif", "width": w, "height": h, "n_channels": 3}
    if blob[:2] == b"BM" and n >= 26:
        w, h = struct.unpack_from("<ii", blob, 18)
        return {"format": "bmp", "width": abs(w), "height": abs(h),
                "n_channels": 3}
    if blob[:2] == b"P6":
        m = re.match(rb"P6\s+(?:#[^\n]*\n\s*)*(\d+)\s+(\d+)", blob[:256])
        if m:
            return {"format": "ppm", "width": int(m.group(1)),
                    "height": int(m.group(2)), "n_channels": 3}
        return None
    if blob[:4] == b"RIFF" and blob[8:12] == b"WEBP" and n >= 30:
        return _webp_dims(blob)
    if n >= 12 and blob[4:8] == b"ftyp" and blob[8:12] in (
        b"avif", b"avis", b"heic", b"heix", b"mif1"
    ):
        return _heif_dims(blob)
    if blob[:4] in (b"II*\x00", b"MM\x00*"):
        return _tiff_dims(blob)
    return None


def _jpeg_dims(blob: bytes) -> dict | None:
    pos = 2
    n = len(blob)
    while pos + 4 <= n:
        if blob[pos] != 0xFF:
            return None
        marker = blob[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9 or marker == 0xDA:
            return None  # hit entropy data with no SOF
        seglen = struct.unpack_from(">H", blob, pos)[0]
        if marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                      0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            if pos + 8 > n:
                return None
            h, w = struct.unpack_from(">HH", blob, pos + 3)
            nc = blob[pos + 7]
            sub = {0xC0: "baseline", 0xC2: "progressive"}.get(marker, "ext")
            return {"format": f"jpeg-{sub}", "width": w, "height": h,
                    "n_channels": nc}
        pos += seglen
    return None


def _webp_dims(blob: bytes) -> dict | None:
    pos = 12
    n = len(blob)
    while pos + 8 <= n:
        fourcc = blob[pos : pos + 4]
        size = int.from_bytes(blob[pos + 4 : pos + 8], "little")
        body = pos + 8
        if fourcc == b"VP8L" and body + 5 <= n and blob[body] == 0x2F:
            bits = int.from_bytes(blob[body + 1 : body + 5], "little")
            w = (bits & 0x3FFF) + 1
            h = ((bits >> 14) & 0x3FFF) + 1
            alpha = (bits >> 28) & 1
            return {"format": "webp-lossless", "width": w, "height": h,
                    "n_channels": 4 if alpha else 3}
        if fourcc == b"VP8 " and body + 10 <= n:
            from pytimetk_spark.webtext.videoprobe import parse_vp8_keyframe

            got = parse_vp8_keyframe(blob[body : body + size])
            if got:
                return {"format": "webp-lossy", "width": got["width"],
                        "height": got["height"], "n_channels": 3}
            return None
        if fourcc == b"VP8X" and body + 10 <= n:
            w = int.from_bytes(blob[body + 4 : body + 7], "little") + 1
            h = int.from_bytes(blob[body + 7 : body + 10], "little") + 1
            return {"format": "webp-extended", "width": w, "height": h,
                    "n_channels": 4}
        pos = body + size + (size & 1)
    return None


def _heif_dims(blob: bytes) -> dict | None:
    """AVIF/HEIC: ISO BMFF meta/iprp/ipco walk to the 'ispe' (image
    spatial extents) property — dims without touching the AV1/HEVC
    payload. Reuses the MP4 box walker."""
    from pytimetk_spark.webtext.mp4 import _boxes

    fmt = "avif" if blob[8:12] in (b"avif", b"avis") else "heic"

    def find_ispe(s, e, depth=0):
        if depth > 8:  # crafted deep nesting must not blow the stack
            return None
        for bt, bs, be in _boxes(blob, s, e):
            if bt == b"ispe" and be - bs >= 12:
                w, h = struct.unpack_from(">II", blob, bs + 4)
                return w, h
            if bt in (b"meta", b"iprp", b"ipco"):
                # meta is a FULL box: 4-byte version/flags before children
                got = find_ispe(bs + (4 if bt == b"meta" else 0), be,
                                depth + 1)
                if got:
                    return got
        return None

    got = find_ispe(0, len(blob))
    if not got:
        return None
    return {"format": fmt, "width": got[0], "height": got[1],
            "n_channels": 3}


def _tiff_dims(blob: bytes) -> dict | None:
    """TIFF: first IFD walk for tags 256/257 (ImageWidth/Length)."""
    bo = "<" if blob[:2] == b"II" else ">"
    ifd_off = struct.unpack_from(bo + "I", blob, 4)[0]
    if ifd_off + 2 > len(blob):
        return None
    n_tags = struct.unpack_from(bo + "H", blob, ifd_off)[0]
    w = h = None
    for i in range(n_tags):
        e = ifd_off + 2 + 12 * i
        if e + 12 > len(blob):
            return None
        tag, typ = struct.unpack_from(bo + "HH", blob, e)
        if typ == 3:  # SHORT
            val = struct.unpack_from(bo + "H", blob, e + 8)[0]
        elif typ == 4:  # LONG
            val = struct.unpack_from(bo + "I", blob, e + 8)[0]
        else:
            continue
        if tag == 256:
            w = val
        elif tag == 257:
            h = val
    if w is None or h is None:
        return None
    return {"format": "tiff", "width": w, "height": h, "n_channels": 3}


def image_stream_info(df, binary_col: str, id_col: str = "doc_id"):
    """Spark operator: header-only probe -> (id, n_bytes, format,
    width, height, n_channels, megapixels); NULL row for unrecognized
    bytes (total over a crawl shard)."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("megapixels", T.DoubleType()),
    ])

    def probe(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for i, blob in zip(pdf["__id__"], pdf["__bin__"]):
                blob = bytes(blob or b"")
                got = parse_image_dims(blob) or {}
                w, h = got.get("width"), got.get("height")
                rows.append((
                    int(i), len(blob), got.get("format"), w, h,
                    got.get("n_channels"),
                    (w * h / 1e6) if w and h else None,
                ))
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    src = df.select(F.col(id_col).alias("__id__"),
                    F.col(binary_col).alias("__bin__"))
    return src.mapInPandas(probe, schema=schema)


def parse_image_dims(blob: bytes) -> dict | None:
    """Total wrapper: malformed/truncated input -> None, never an
    exception escaping into a Spark task."""
    try:
        return _parse_image_dims_impl(blob)
    except (IndexError, KeyError, ValueError, ZeroDivisionError,
            RecursionError, struct.error, MemoryError):
        return None
