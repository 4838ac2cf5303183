"""Reference VP8L (WebP-lossless) ENCODER for differential tests.

Mirrors tests/jpeg_ref.py: an in-tests encoder that produces real
spec-conformant bitstreams so pytimetk_spark.webtext.webp can be tested
as a round-trip without PIL/libwebp in the environment.

Scope: literal coding with canonical prefix codes emitted through the
full code-length-code machinery (incl. 17/18 zero-run symbols), simple
1/2-symbol codes, LZ77 dist=1 run coding, color cache, meta-prefix
partitioning (multiple code groups), and all four transforms
(subtract-green, predictor, color transform, color-indexing/palette).

Codes are *balanced* (every used symbol gets the same length) rather
than frequency-optimal — valid per spec (any Kraft-satisfying canonical
lengths decode), hugely simpler, and compression ratio is irrelevant
for tests. Canonical assignment matches the decoder: sort by
(length, symbol), increasing codes, MSB-first.
"""

from __future__ import annotations

import numpy as np

from pytimetk_spark.webtext.webp import _CLCL_ORDER


class _W:
    """LSB-first bit writer (VP8L stream order)."""

    def __init__(self):
        self.bits = []

    def put(self, v: int, n: int):
        for i in range(n):
            self.bits.append((v >> i) & 1)

    def put_code(self, code: int, length: int):
        # prefix codes are written MSB-first
        for i in range(length - 1, -1, -1):
            self.bits.append((code >> i) & 1)

    def tobytes(self) -> bytes:
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for j, bit in enumerate(self.bits[i: i + 8]):
                b |= bit << j
            out.append(b)
        return bytes(out)


def _canon(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (length, code), canonical per the decoder's _Prefix.
    A single-symbol code decodes with ZERO bits consumed (the decoder's
    `single` fast path), so it gets (0, 0) here."""
    nz = [(l, s) for s, l in enumerate(lengths) if l > 0]
    if len(nz) == 1:
        return {nz[0][1]: (0, 0)}
    out = {}
    code = 0
    prev = 0
    for l, s in sorted(nz):
        code <<= l - prev
        out[s] = (l, code)
        code += 1
        prev = l
    return out


def _balanced_lengths(used, alphabet: int) -> list[int]:
    lengths = [0] * alphabet
    used = sorted(used) or [0]
    L = 1 if len(used) == 1 else max(1, (len(used) - 1).bit_length())
    for s in used:
        lengths[s] = L
    return lengths


def _emit_prefix_code(w: _W, lengths: list[int], alphabet: int):
    used = [s for s, l in enumerate(lengths) if l > 0]
    if 1 <= len(used) <= 2 and all(s < 256 for s in used):
        w.put(1, 1)                 # simple code
        w.put(len(used) - 1, 1)     # num_symbols - 1
        s0 = used[0]
        if len(used) == 1 and s0 <= 1:
            w.put(0, 1)             # first symbol in 1 bit
            w.put(s0, 1)
        else:
            w.put(1, 1)             # first symbol in 8 bits
            w.put(s0, 8)
            if len(used) == 2:
                w.put(used[1], 8)
        return
    w.put(0, 1)  # code-length-coded
    # RLE the length array into code-length symbols (raw lengths + 17/18
    # zero runs; no 16-repeat — balanced codes rarely benefit)
    seq = []  # (cl_symbol, extra_value, extra_bits)
    i = 0
    while i < alphabet:
        if lengths[i] == 0:
            j = i
            while j < alphabet and lengths[j] == 0:
                j += 1
            run = j - i
            while run > 0:
                if run >= 11:
                    k = min(run, 138)
                    seq.append((18, k - 11, 7))
                    run -= k
                elif run >= 3:
                    k = min(run, 10)
                    seq.append((17, k - 3, 3))
                    run -= k
                else:
                    seq.append((0, 0, 0))
                    run -= 1
            i = j
        else:
            seq.append((lengths[i], 0, 0))
            i += 1
    cl_used = sorted({s for s, _, _ in seq})
    cl_lengths = _balanced_lengths(cl_used, 19)
    n_codes = max(4, max(_CLCL_ORDER.index(s) for s in cl_used) + 1)
    w.put(n_codes - 4, 4)
    for p in range(n_codes):
        w.put(cl_lengths[_CLCL_ORDER[p]], 3)
    w.put(0, 1)  # no explicit max-symbol limit; runs cover the tail
    codes = _canon(cl_lengths)
    for s, extra, eb in seq:
        l, c = codes[s]
        w.put_code(c, l)
        if eb:
            w.put(extra, eb)


def _len_to_lz77_code(L: int) -> tuple[int, int, int]:
    """length/distance value -> (prefix_code, extra_value, extra_bits)."""
    if L <= 4:
        return L - 1, 0, 0
    for code in range(4, 24):
        extra = (code - 2) >> 1
        off = (2 + (code & 1)) << extra
        if off + 1 <= L <= off + (1 << extra):
            return code, L - 1 - off, extra
    raise ValueError(f"lz77 value {L} out of range")


def _cache_key(a, r, g, b, cache_bits):
    argb = (int(a) << 24) | (int(r) << 16) | (int(g) << 8) | int(b)
    return ((argb * 0x1E35A7BD) & 0xFFFFFFFF) >> (32 - cache_bits)


def _tokenize(flat: np.ndarray, cache_bits: int, lz77: bool):
    """Pixel stream -> [(start_pos, kind, payload)] with decoder-identical
    cache mutation. kinds: 'lit' (a,r,g,b) | 'cache' idx | 'lz' length."""
    toks = []
    total = len(flat)
    cache_valid = np.zeros(1 << cache_bits, bool) if cache_bits else None
    cache = np.zeros((1 << cache_bits, 4), np.int32) if cache_bits else None

    def insert(px):
        if cache is None:
            return
        k = _cache_key(px[0], px[1], px[2], px[3], cache_bits)
        cache[k] = px
        cache_valid[k] = True

    i = 0
    while i < total:
        if lz77 and i > 0:
            run = 0
            while (i + run < total and run < 4096
                   and np.array_equal(flat[i + run], flat[i - 1])):
                run += 1
            if run >= 3:
                toks.append((i, "lz", run))
                for k in range(run):
                    insert(flat[i + k])
                i += run
                continue
        px = flat[i]
        if cache is not None:
            k = _cache_key(px[0], px[1], px[2], px[3], cache_bits)
            if cache_valid[k] and np.array_equal(cache[k], px):
                toks.append((i, "cache", int(k)))
                i += 1
                continue
        toks.append((i, "lit", tuple(int(v) for v in px)))
        insert(px)
        i += 1
    return toks


def _encode_entropy_image(
    w: _W,
    img: np.ndarray,
    read_cache: bool = True,
    read_meta: bool = False,
    cache_bits: int = 0,
    lz77: bool = False,
    meta_bits: int = 0,
    group_of=None,
):
    """Encode an (h, w, 4) uint8 ARGB array as a spatially-coded image.

    Every nesting level reads the color-cache bit (spec behavior);
    read_meta is True only for the main image. group_of(y, x) -> group
    index when meta partitioning is on.
    """
    h, wd = img.shape[:2]
    if read_cache:
        if cache_bits:
            w.put(1, 1)
            w.put(cache_bits, 4)
        else:
            w.put(0, 1)
    n_groups = 1
    if read_meta:
        if meta_bits:
            w.put(1, 1)
            w.put(meta_bits - 2, 3)
            mw = (wd + (1 << meta_bits) - 1) >> meta_bits
            mh = (h + (1 << meta_bits) - 1) >> meta_bits
            gidx = np.zeros((mh, mw), np.int64)
            for my in range(mh):
                for mx in range(mw):
                    gidx[my, mx] = group_of(my << meta_bits, mx << meta_bits)
            mimg = np.zeros((mh, mw, 4), np.uint8)
            mimg[..., 1] = (gidx >> 8).astype(np.uint8)
            mimg[..., 2] = (gidx & 0xFF).astype(np.uint8)
            _encode_entropy_image(w, mimg, read_cache=True,
                                  read_meta=False)
            n_groups = int(gidx.max()) + 1
        else:
            w.put(0, 1)

    flat = img.reshape(-1, 4).astype(np.int32)
    toks = _tokenize(flat, cache_bits, lz77)

    def tok_group(pos):
        if not meta_bits:
            return 0
        y, x = divmod(pos, wd)
        return group_of(y, x)

    green_alpha = 256 + 24 + ((1 << cache_bits) if cache_bits else 0)
    used = [
        {"g": set(), "r": set(), "b": set(), "a": set(), "d": set()}
        for _ in range(n_groups)
    ]
    for pos, kind, payload in toks:
        u = used[tok_group(pos)]
        if kind == "lit":
            a, r, g, b = payload
            u["g"].add(g)
            u["r"].add(r)
            u["b"].add(b)
            u["a"].add(a)
        elif kind == "lz":
            code, _, _ = _len_to_lz77_code(payload)
            u["g"].add(256 + code)
            u["d"].add(1)  # distance prefix value 2 == previous pixel
        else:
            u["g"].add(256 + 24 + payload)

    groups = []
    for u in used:
        lengths = {
            "g": _balanced_lengths(u["g"], green_alpha),
            "r": _balanced_lengths(u["r"], 256),
            "b": _balanced_lengths(u["b"], 256),
            "a": _balanced_lengths(u["a"], 256),
            "d": _balanced_lengths(u["d"], 40),
        }
        for key in ("g", "r", "b", "a", "d"):
            _emit_prefix_code(w, lengths[key], len(lengths[key]))
        groups.append({k: _canon(v) for k, v in lengths.items()})

    for pos, kind, payload in toks:
        gc = groups[tok_group(pos)]
        if kind == "lit":
            a, r, g, b = payload
            for key, sym in (("g", g), ("r", r), ("b", b), ("a", a)):
                l, c = gc[key][sym]
                w.put_code(c, l)
        elif kind == "lz":
            code, extra, eb = _len_to_lz77_code(payload)
            l, c = gc["g"][256 + code]
            w.put_code(c, l)
            if eb:
                w.put(extra, eb)
            l, c = gc["d"][1]
            w.put_code(c, l)
        else:
            l, c = gc["g"][256 + 24 + payload]
            w.put_code(c, l)


def _forward_subtract_green(img):
    out = img.astype(np.int32)
    g = out[:, :, 2]
    out[:, :, 1] = (out[:, :, 1] - g) & 0xFF
    out[:, :, 3] = (out[:, :, 3] - g) & 0xFF
    return out.astype(np.uint8)


def _forward_predictor(img, bits):
    """Residuals for the constant mode=2 (pixel above) predictor; edge
    rows/cols follow the decoder's fixed edge rules."""
    h, w = img.shape[:2]
    src = img.astype(np.int32)
    out = np.zeros_like(src)
    for y in range(h):
        for x in range(w):
            if y == 0 and x == 0:
                pred = np.array([255, 0, 0, 0], np.int32)
            elif y == 0:
                pred = src[0, x - 1]
            elif x == 0:
                pred = src[y - 1, 0]
            else:
                pred = src[y - 1, x]  # mode 2 = T
            out[y, x] = (src[y, x] - pred) & 0xFF
    tw = (w + (1 << bits) - 1) >> bits
    th = (h + (1 << bits) - 1) >> bits
    sub = np.zeros((th, tw, 4), np.uint8)
    sub[:, :, 2] = 2  # green channel carries the mode
    return out.astype(np.uint8), sub


def _forward_color_transform(img, bits, g2r, g2b, r2b):
    """Residuals for a CONSTANT color transform (one element for every
    tile). Deltas mirror the decoder: signed int8 * signed int8 >> 5."""

    def cdelta(t, c):
        t8 = t - 256 if t >= 128 else t
        c8 = np.where(c >= 128, c - 256, c)
        return (t8 * c8) >> 5

    out = img.astype(np.int32)
    g = out[:, :, 2].copy()
    r_orig = out[:, :, 1].copy()  # the r->b term uses the ORIGINAL red
    out[:, :, 1] = (r_orig - cdelta(g2r, g)) & 0xFF
    out[:, :, 3] = (out[:, :, 3] - cdelta(g2b, g) - cdelta(r2b, r_orig)) & 0xFF
    h, w = img.shape[:2]
    tw = (w + (1 << bits) - 1) >> bits
    th = (h + (1 << bits) - 1) >> bits
    sub = np.zeros((th, tw, 4), np.uint8)
    sub[:, :, 3] = g2r  # blue channel stores green_to_red
    sub[:, :, 2] = g2b  # green channel stores green_to_blue
    sub[:, :, 1] = r2b  # red channel stores red_to_blue
    return out.astype(np.uint8), sub


def _palette_encode(img):
    """img -> (packed ARGB image, delta-coded palette, width_bits)."""
    h, w = img.shape[:2]
    flat = img.reshape(-1, 4)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    n = len(colors)
    if n > 256:
        raise ValueError("palette transform needs <= 256 colors")
    idx = inverse.reshape(h, w).astype(np.int64)
    width_bits = 3 if n <= 2 else 2 if n <= 4 else 1 if n <= 16 else 0
    if width_bits:
        per = 1 << width_bits
        bw = 8 >> width_bits
        pw = (w + per - 1) // per
        packed = np.zeros((h, pw), np.int64)
        for k in range(per):
            cols = np.arange(pw) * per + k
            valid = cols < w
            packed[:, valid] |= idx[:, cols[valid]] << (k * bw)
        pimg = np.zeros((h, pw, 4), np.uint8)
        pimg[:, :, 2] = packed.astype(np.uint8)
    else:
        pimg = np.zeros((h, w, 4), np.uint8)
        pimg[:, :, 2] = idx.astype(np.uint8)
    # palette rows are delta-coded per channel in the stream
    pal = colors.astype(np.int64)
    deltas = pal.copy()
    deltas[1:] = (pal[1:] - pal[:-1]) & 0xFF
    pal_img = deltas.astype(np.uint8).reshape(1, n, 4)
    return pimg, pal_img, width_bits


def encode_vp8l(
    rgb: np.ndarray,
    alpha: np.ndarray | None = None,
    subtract_green: bool = False,
    predictor_bits: int = 0,
    color_bits: int = 0,
    color_deltas: tuple[int, int, int] = (0, 0, 0),
    palette: bool = False,
    cache_bits: int = 0,
    lz77: bool = False,
    meta_bits: int = 0,
    group_of=None,
) -> bytes:
    """(h, w, 3) uint8 RGB [+ (h, w) alpha] -> RIFF/WEBP/VP8L bytes."""
    h, w = rgb.shape[:2]
    img = np.zeros((h, w, 4), np.uint8)  # ARGB channel order
    img[:, :, 0] = 255 if alpha is None else alpha
    img[:, :, 1:4] = rgb

    bw = _W()
    bw.put(w - 1, 14)
    bw.put(h - 1, 14)
    bw.put(0 if alpha is None else 1, 1)
    bw.put(0, 3)  # version

    # stream order == forward application order (decoder inverts LIFO)
    if subtract_green:
        bw.put(1, 1)
        bw.put(2, 2)
        img = _forward_subtract_green(img)
    if color_bits:
        bw.put(1, 1)
        bw.put(1, 2)
        bw.put(color_bits - 2, 3)
        img, sub = _forward_color_transform(img, color_bits, *color_deltas)
        _encode_entropy_image(bw, sub, read_cache=True)
    if predictor_bits:
        bw.put(1, 1)
        bw.put(0, 2)
        bw.put(predictor_bits - 2, 3)
        img, sub = _forward_predictor(img, predictor_bits)
        _encode_entropy_image(bw, sub, read_cache=True)
    if palette:
        bw.put(1, 1)
        bw.put(3, 2)
        img, pal_img, _wb = _palette_encode(img)
        bw.put(pal_img.shape[1] - 1, 8)
        _encode_entropy_image(bw, pal_img, read_cache=True)
    bw.put(0, 1)  # no more transforms

    _encode_entropy_image(
        bw, img, read_cache=True, read_meta=True,
        cache_bits=cache_bits, lz77=lz77,
        meta_bits=meta_bits, group_of=group_of,
    )

    payload = b"\x2f" + bw.tobytes()
    chunk = b"VP8L" + len(payload).to_bytes(4, "little") + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + len(riff).to_bytes(4, "little") + riff
