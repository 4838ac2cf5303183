"""Pure-python WebP-lossless (VP8L) decoder.

Fourth compressed web-image format in the REAL decode tier. VP8L
(the lossless half of WebP; spec: "WebP Lossless Bitstream Specification",
Google, RFC-style public document) is canonical-prefix-coded ARGB with
LZ77 backward references, a color cache, and four invertible transforms
(predictor, color, subtract-green, color-indexing). All of it is plain
bit-stream + integer work — no DCT, no external codec — so a
dependency-free decode is complete, not a subset.

Supported: the full VP8L feature set — meta-prefix partitioning, all
five prefix-code classes, color cache, LZ77 with the 120-entry
neighbor distance map, and all four transforms (recursively decoded
sub-images). Lossy VP8 chunks (``VP8 `` fourcc) route to the keyframe
decoder in ``webtext/vp8.py`` (RFC 6386 intra codec, r6). NOT handled:
animated/extended containers beyond a plain VP8L/VP8 chunk; those
return None for the stub fallback.

Performance shape: the entropy loop is sequential python per symbol
(same boundary as the JPEG Huffman and GIF LZW loops); transforms are
per-pixel but the images a crawl feature-extractor touches are
thumbnails. Runs per blob inside mapInPandas. At true 100-TB image
volume the per-symbol Python loop is the CPU bottleneck: this module
is the SWAP-FOR-NATIVE-CODEC boundary — keep the mapInPandas batch
plumbing and replace only ``decode_webp`` with a native library
(libwebp/PIL) where the deployment image has one.
"""

from __future__ import annotations

import struct

import numpy as np


class _Bits:
    """LSB-first bit reader over the VP8L data stream."""

    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            if self.pos >= len(self.data):
                return v  # zero-fill past end (truncated stream)
            if (self.data[self.pos] >> self.bit) & 1:
                v |= 1 << i
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
        return v


class _Prefix:
    """Canonical prefix code built from per-symbol code lengths
    (deterministic VP8L assignment), decoded MSB-first per code."""

    __slots__ = ("lookup", "single")

    def __init__(self, lengths: list[int]):
        self.single = None
        nz = [(l, s) for s, l in enumerate(lengths) if l > 0]
        if len(nz) == 1:
            self.single = nz[0][1]
            self.lookup = {}
            return
        # canonical: sort by (length, symbol); assign increasing codes
        self.lookup = {}
        code = 0
        prev_len = 0
        for l, s in sorted(nz):
            code <<= l - prev_len
            self.lookup[(l, code)] = s
            code += 1
            prev_len = l

    def decode(self, br: _Bits) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for length in range(1, 16):
            code = (code << 1) | br.read(1)
            sym = self.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid VP8L prefix code")


_CLCL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]

# LZ77 distance map: the first 120 distance prefix values address a 2D
# neighborhood of the current pixel, ordered by closeness (spec appendix;
# transcribed — encoder fixtures in tests share this table, so round-trip
# tests are self-consistent even where transcription could drift):
_DIST_MAP = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
]


def _read_prefix_code(br: _Bits, alphabet_size: int) -> _Prefix:
    """One prefix code: 'simple' (1-2 symbols) or code-length-coded."""
    if br.read(1):  # simple
        n_sym = br.read(1) + 1
        first_bits = 8 if br.read(1) else 1
        lengths = [0] * alphabet_size
        s0 = br.read(first_bits)
        if n_sym == 1:
            lengths[s0] = 1
            return _Prefix(lengths)
        s1 = br.read(8)
        lengths[s0] = 1
        lengths[s1] = 1
        return _Prefix(lengths)
    # code-length code
    n_codes = br.read(4) + 4
    clcl = [0] * 19
    for i in range(n_codes):
        clcl[_CLCL_ORDER[i]] = br.read(3)
    cl_code = _Prefix(clcl)
    # optional max-symbol limit
    if br.read(1):
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev_len = 8
    i = 0
    while i < alphabet_size and max_symbol > 0:
        max_symbol -= 1
        sym = cl_code.decode(br)
        if sym < 16:
            lengths[i] = sym
            i += 1
            if sym:
                prev_len = sym
        elif sym == 16:
            for _ in range(3 + br.read(2)):
                if i < alphabet_size:
                    lengths[i] = prev_len
                    i += 1
        elif sym == 17:
            i += 3 + br.read(3)
        else:  # 18
            i += 11 + br.read(7)
    return _Prefix(lengths)


class _Group:
    __slots__ = ("g", "r", "b", "a", "d")

    def __init__(self, br: _Bits, cache_bits: int):
        self.g = _read_prefix_code(br, 256 + 24 + (1 << cache_bits if cache_bits else 0))
        self.r = _read_prefix_code(br, 256)
        self.b = _read_prefix_code(br, 256)
        self.a = _read_prefix_code(br, 256)
        self.d = _read_prefix_code(br, 40)


def _lz77_extra(code: int, br: _Bits) -> int:
    """Length/distance prefix value -> actual value (spec 4.2.2)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _decode_entropy_image(
    br: _Bits, w: int, h: int, allow_meta: bool
) -> np.ndarray:
    """The core VP8L 'spatially-coded image' decoder -> (h, w, 4) uint8
    ARGB. Used for the main image AND (recursively, with allow_meta
    False) for transform/meta sub-images."""
    # EVERY entropy-coded image starts with the color-cache-info bit —
    # including meta-prefix and transform sub-images (RFC 9649 §5 /
    # libwebp DecodeImageStream); skipping it for sub-images desyncs
    # the stream on real encoder output.
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
    cache = (
        np.zeros((1 << cache_bits, 4), np.uint8) if cache_bits else None
    )
    meta = None
    meta_bits = 0
    n_groups = 1
    if allow_meta and br.read(1):
        meta_bits = br.read(3) + 2
        mw = (w + (1 << meta_bits) - 1) >> meta_bits
        mh = (h + (1 << meta_bits) - 1) >> meta_bits
        meta = _decode_entropy_image(br, mw, mh, False)
        n_groups = int(
            (meta[:, :, 1].astype(np.int64) << 8 | meta[:, :, 2]).max()
        ) + 1
    groups = [_Group(br, cache_bits) for _ in range(n_groups)]

    out = np.zeros((h, w, 4), np.uint8)  # A,R,G,B
    pos = 0
    total = w * h
    flat = out.reshape(-1, 4)
    while pos < total:
        if meta is not None:
            y, x = divmod(pos, w)
            m = meta[y >> meta_bits, x >> meta_bits]
            gi = (int(m[1]) << 8) | int(m[2])
            grp = groups[gi]
        else:
            grp = groups[0]
        s = grp.g.decode(br)
        if s < 256:  # literal: green, then r, b, a
            g = s
            r = grp.r.decode(br)
            b = grp.b.decode(br)
            a = grp.a.decode(br)
            flat[pos] = (a, r, g, b)
            if cache is not None:
                _cache_insert(cache, cache_bits, a, r, g, b)
            pos += 1
        elif s < 256 + 24:  # LZ77 backward reference
            length = _lz77_extra(s - 256, br)
            dcode = grp.d.decode(br)
            dist_prefix = _lz77_extra(dcode, br)
            if dist_prefix > 120:
                dist = dist_prefix - 120
            else:
                dx, dy = _DIST_MAP[dist_prefix - 1]
                dist = dy * w + dx
                if dist < 1:
                    dist = 1
            for _ in range(length):
                if pos >= total or pos - dist < 0:
                    break
                flat[pos] = flat[pos - dist]
                if cache is not None:
                    a, r, g, b = flat[pos]
                    _cache_insert(cache, cache_bits, a, r, g, b)
                pos += 1
        else:  # color cache hit
            idx = s - 256 - 24
            flat[pos] = cache[idx]
            pos += 1
    return out


def _cache_insert(cache, cache_bits, a, r, g, b):
    argb = (int(a) << 24) | (int(r) << 16) | (int(g) << 8) | int(b)
    key = ((argb * 0x1E35A7BD) & 0xFFFFFFFF) >> (32 - cache_bits)
    cache[key] = (a, r, g, b)


def _decode_webp_impl(blob: bytes) -> np.ndarray | None:
    """Decode RIFF/WEBP -> HxWx3 uint8 RGB. VP8L chunks decode here
    (alpha composited over white); lossy ``VP8 `` chunks route to the
    keyframe decoder in ``webtext/vp8.py``. None for extended-animation
    containers without either chunk / non-WebP."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"WEBP" or len(blob) < 21:
        return None
    pos = 12
    vp8l = None
    n = len(blob)
    while pos + 8 <= n:
        fourcc = blob[pos : pos + 4]
        size = int.from_bytes(blob[pos + 4 : pos + 8], "little")
        if fourcc == b"VP8L":
            vp8l = blob[pos + 8 : pos + 8 + size]
            break
        if fourcc == b"VP8 ":
            from pytimetk_spark.webtext.vp8 import decode_vp8_rgb

            return decode_vp8_rgb(blob[pos + 8 : pos + 8 + size])
        pos += 8 + size + (size & 1)
    if vp8l is None or not vp8l or vp8l[0] != 0x2F:
        return None
    br = _Bits(vp8l[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha-used hint
    if br.read(3) != 0:  # version must be 0
        return None

    # transforms, LIFO application order
    transforms = []
    xsize = w
    while br.read(1):
        ttype = br.read(2)
        if ttype == 0:  # predictor
            bits = br.read(3) + 2
            tw = (xsize + (1 << bits) - 1) >> bits
            th = (h + (1 << bits) - 1) >> bits
            sub = _decode_entropy_image(br, tw, th, False)
            transforms.append(("pred", bits, sub))
        elif ttype == 1:  # color transform
            bits = br.read(3) + 2
            tw = (xsize + (1 << bits) - 1) >> bits
            th = (h + (1 << bits) - 1) >> bits
            sub = _decode_entropy_image(br, tw, th, False)
            transforms.append(("color", bits, sub))
        elif ttype == 2:  # subtract green
            transforms.append(("subg", 0, None))
        else:  # color indexing (palette)
            n_colors = br.read(8) + 1
            pal = _decode_entropy_image(br, n_colors, 1, False)
            # palette entries are delta-coded per channel (spec 4.2.4)
            pal = np.cumsum(pal.astype(np.int64), axis=1).astype(np.int64)
            pal = (pal & 0xFF).astype(np.uint8)
            width_bits = (
                3 if n_colors <= 2 else 2 if n_colors <= 4
                else 1 if n_colors <= 16 else 0
            )
            transforms.append(("palette", width_bits, pal))
            if width_bits:
                xsize = (xsize + (1 << width_bits) - 1) >> width_bits

    img = _decode_entropy_image(br, xsize, h, True)

    for ttype, bits, sub in reversed(transforms):
        if ttype == "subg":
            g = img[:, :, 2].astype(np.int32)
            img[:, :, 1] = ((img[:, :, 1].astype(np.int32) + g) & 0xFF).astype(np.uint8)
            img[:, :, 3] = ((img[:, :, 3].astype(np.int32) + g) & 0xFF).astype(np.uint8)
        elif ttype == "palette":
            img = _apply_palette(img, bits, sub, w)
        elif ttype == "color":
            img = _inverse_color_transform(img, bits, sub)
        elif ttype == "pred":
            img = _inverse_predictor(img, bits, sub)

    a = img[:, :, 0].astype(np.float64) / 255.0
    rgb = img[:, :, 1:4].astype(np.float64)
    out = rgb * a[..., None] + 255.0 * (1 - a[..., None])
    return np.clip(out, 0, 255).astype(np.uint8)


def _apply_palette(img, width_bits, pal, full_w):
    h = img.shape[0]
    pal_rgba = pal[0]  # (n_colors, 4) ARGB
    if width_bits == 0:
        idx = img[:, :, 2].astype(np.int64)
        idx = np.clip(idx, 0, pal_rgba.shape[0] - 1)
        return pal_rgba[idx]
    per = 1 << width_bits  # pixels packed per green byte
    bw = 8 >> width_bits  # bits per index
    g = img[:, :, 2].astype(np.int64)  # (h, packed_w)
    unpacked = np.zeros((h, full_w), np.int64)
    for k in range(per):
        cols = np.arange(g.shape[1]) * per + k
        valid = cols < full_w
        unpacked[:, cols[valid]] = (g[:, valid] >> (k * bw)) & ((1 << bw) - 1)
    unpacked = np.clip(unpacked, 0, pal_rgba.shape[0] - 1)
    return pal_rgba[unpacked]


def _cdelta(t: int, c: int) -> int:
    """Color-transform delta: signed t (int8) times signed c, >> 5."""
    t8 = t - 256 if t >= 128 else t
    c8 = c - 256 if c >= 128 else c
    return (t8 * c8) >> 5


def _inverse_color_transform(img, bits, sub):
    h, w = img.shape[:2]
    out = img.astype(np.int32)
    for y in range(h):
        srow = sub[y >> bits]
        for x in range(w):
            e = srow[x >> bits]
            g2r = int(e[3])   # blue channel stores green_to_red
            g2b = int(e[2])   # green channel stores green_to_blue
            r2b = int(e[1])   # red channel stores red_to_blue
            g = int(out[y, x, 2])
            r = (int(out[y, x, 1]) + _cdelta(g2r, g)) & 0xFF
            b = (int(out[y, x, 3]) + _cdelta(g2b, g) + _cdelta(r2b, r)) & 0xFF
            out[y, x, 1] = r
            out[y, x, 3] = b
    return out.astype(np.uint8)


def _inverse_predictor(img, bits, sub):
    h, w = img.shape[:2]
    out = img.astype(np.int32)

    def px(y, x):
        return out[y, x]

    def avg2(a, b):
        return (a + b) >> 1

    for y in range(h):
        srow = sub[y >> bits]
        for x in range(w):
            if y == 0 and x == 0:
                pred = np.array([255, 0, 0, 0], np.int32)
            elif y == 0:
                pred = px(0, x - 1)
            elif x == 0:
                pred = px(y - 1, 0)
            else:
                mode = int(srow[x >> bits][2])  # green = predictor mode
                L = px(y, x - 1)
                T = px(y - 1, x)
                TL = px(y - 1, x - 1)
                # right edge: the element after upper[w-1] in libwebp's
                # contiguous ARGB buffer is the CURRENT row's first pixel
                # (already decoded) — normative-in-practice behavior
                TR = px(y - 1, x + 1) if x + 1 < w else px(y, 0)
                if mode == 0:
                    pred = np.array([255, 0, 0, 0], np.int32)
                elif mode == 1:
                    pred = L
                elif mode == 2:
                    pred = T
                elif mode == 3:
                    pred = TR
                elif mode == 4:
                    pred = TL
                elif mode == 5:
                    pred = avg2(avg2(L, TR), T)
                elif mode == 6:
                    pred = avg2(L, TL)
                elif mode == 7:
                    pred = avg2(L, T)
                elif mode == 8:
                    pred = avg2(TL, T)
                elif mode == 9:
                    pred = avg2(T, TR)
                elif mode == 10:
                    pred = avg2(avg2(L, TL), avg2(T, TR))
                elif mode == 11:  # select
                    pl = np.abs(T - TL).sum()
                    pt = np.abs(L - TL).sum()
                    pred = L if pl < pt else T
                elif mode == 12:  # clamp add subtract full
                    pred = np.clip(L + T - TL, 0, 255)
                else:  # 13: clamp add subtract half (C-truncating /2)
                    half = avg2(L, T)
                    delta = half - TL
                    pred = np.clip(
                        half + np.trunc(delta / 2).astype(np.int32), 0, 255
                    )
            out[y, x] = (out[y, x] + pred) & 0xFF
    return out.astype(np.uint8)


def decode_webp(blob: bytes) -> np.ndarray | None:
    """Decode a WebP container: VP8L (lossless, this module) or lossy
    VP8 keyframes (``webtext/vp8.py``). Total wrapper: one corrupt blob
    in a crawl shard must fall to the None/stub path, never kill a
    Spark task — truncated or malformed streams surface as parser
    exceptions in the impls."""
    try:
        return _decode_webp_impl(blob)
    except (IndexError, KeyError, ValueError, ZeroDivisionError,
            RecursionError, struct.error, MemoryError):
        return None


# back-compat name (pre-r6, when only the lossless half decoded)
decode_webp_lossless = decode_webp
