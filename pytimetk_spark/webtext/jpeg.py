"""Pure-numpy baseline JPEG (JFIF subset) decoder.

Moves the dominant real-web image format into the REAL decode tier of
``decode_image_batch`` (reference analogue: pytimetk has no image path —
this belongs to the engine-mandate multimodal surface; see
webtext/multimodal.py). Public-spec implementation: ITU-T T.81 baseline
sequential DCT, Huffman entropy coding, 8-bit precision.

Supported: SOI/APP*/COM/DQT/DHT/SOF0/DRI/SOS/EOI streams, 1-component
(grayscale) and 3-component (YCbCr) images, sampling factors 1-2 per axis
(covers 4:4:4, 4:2:2, 4:2:0), restart markers. NOT supported (returns
None so callers can stub or raise): progressive (SOF2), arithmetic
coding, 12-bit precision, 4-component CMYK.

Performance shape: header/Huffman parsing is a per-blob Python loop
(entropy decoding is inherently sequential), but the IDCT — the numeric
bulk — is ONE einsum over all of a component's blocks, and dequantize /
level-shift / color-convert are whole-image numpy ops. Decode runs per
file inside mapInPandas, so the Python overhead amortizes per blob, the
same boundary as the BMP/WAV decoders.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan order: index i of the scan -> (row, col) flattened offset
_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# 8x8 IDCT basis: A[u, x] = 0.5 * c(u) * cos((2x+1) u pi / 16)
_A = np.zeros((8, 8))
for _u in range(8):
    _cu = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _A[_u, _x] = 0.5 * _cu * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


class _Huff:
    """Canonical Huffman table from a DHT segment: (length, code) -> sym."""

    __slots__ = ("lookup", "max_len")

    def __init__(self, counts: list[int], symbols: bytes):
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                self.lookup[(length, code)] = symbols[k]
                code += 1
                k += 1
            code <<= 1
        self.max_len = 16


class _BitReader:
    """Entropy-coded segment reader: 0xFF00 byte-stuffing unstuffed,
    RSTn markers surfaced via ``restart()``, EOI/next-marker terminates."""

    __slots__ = ("data", "pos", "bitbuf", "bitcnt", "_marker")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.bitcnt = 0
        self._marker: int | None = None

    def _fill(self) -> bool:
        d = self.data
        if self.pos >= len(d):
            return False
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:  # restart marker: stop fill here
                self._marker = nxt
                return False
            else:  # EOI or another marker: end of scan
                self._marker = nxt
                return False
        else:
            self.pos += 1
        self.bitbuf = (self.bitbuf << 8) | b
        self.bitcnt += 8
        return True

    def bit(self) -> int:
        if self.bitcnt == 0 and not self._fill():
            return 0  # pad past the end (T.81 F.2.2.5 allows 1-fill; 0 ok
            # for our bounded use since EOB terminates blocks)
        self.bitcnt -= 1
        return (self.bitbuf >> self.bitcnt) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def decode(self, table: _Huff) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bit()
            sym = table.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG huffman code")

    def restart(self) -> None:
        """Byte-align and consume an RSTn marker."""
        self.bitbuf = 0
        self.bitcnt = 0
        d = self.data
        # skip to the marker we already saw, or scan forward to it
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                self._marker = None
                return
            self.pos += 1
        self._marker = None


def _extend(v: int, t: int) -> int:
    """T.81 F.12: map t raw bits to the signed coefficient value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_baseline_jpeg(blob: bytes) -> np.ndarray | None:
    """Decode a baseline JFIF blob -> HxWx3 uint8 RGB (grayscale
    broadcast to 3 channels). Returns None for non-JPEG or unsupported
    variants (progressive, 12-bit, CMYK) so callers can fall back."""
    if len(blob) < 4 or blob[0] != 0xFF or blob[1] != 0xD8:
        return None
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _Huff] = {}
    huff_ac: dict[int, _Huff] = {}
    frame = None  # (h, w, comps) where comps = [(cid, hs, vs, tq)]
    restart_interval = 0
    n = len(blob)
    while pos + 4 <= n:
        if blob[pos] != 0xFF:
            return None
        marker = blob[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI before SOS
            return None
        seglen = struct.unpack_from(">H", blob, pos)[0]
        seg_end = pos + seglen
        body = blob[pos + 2 : seg_end]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    return None  # 16-bit tables: out of baseline-8 scope
                tbl = np.zeros(64)
                tbl[_ZIGZAG] = np.frombuffer(body[i + 1 : i + 65], np.uint8)
                qt[tq] = tbl.reshape(8, 8)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                counts = list(body[i + 1 : i + 17])
                nsym = sum(counts)
                syms = bytes(body[i + 17 : i + 17 + nsym])
                (huff_dc if tc == 0 else huff_ac)[th] = _Huff(counts, syms)
                i += 17 + nsym
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = body[0], *struct.unpack_from(">HH", body, 1), body[5]
            if prec != 8 or nc not in (1, 3):
                return None
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            if any(not (1 <= hs <= 2 and 1 <= vs <= 2) for _, hs, vs, _ in comps):
                return None
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            return None  # progressive / extended / arithmetic: unsupported
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:  # SOS -> entropy-coded data follows
            if frame is None:
                return None
            ns = body[0]
            scan_tables = {}
            for c in range(ns):
                cs, td_ta = body[1 + 2 * c], body[2 + 2 * c]
                scan_tables[cs] = (td_ta >> 4, td_ta & 0x0F)
            return _decode_scan(
                blob, seg_end, frame, scan_tables, qt, huff_dc, huff_ac,
                restart_interval,
            )
        pos = seg_end
    return None


def _decode_scan(blob, pos, frame, scan_tables, qt, huff_dc, huff_ac,
                 restart_interval):
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h
    rdr = _BitReader(blob, pos)

    # per component: coefficient store (blocks_y, blocks_x, 64) zigzag order
    stores = []
    for _, hs, vs, _tq in comps:
        by, bx = mcus_y * vs, mcus_x * hs
        stores.append(np.zeros((by, bx, 64), dtype=np.int32))
    pred = [0] * len(comps)

    mcu_index = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                rdr.restart()
                pred = [0] * len(comps)
            for ci, (cid, hs, vs, _tq) in enumerate(comps):
                td, ta = scan_tables[cid]
                dc_tbl, ac_tbl = huff_dc[td], huff_ac[ta]
                for v in range(vs):
                    for u in range(hs):
                        coef = stores[ci][my * vs + v, mx * hs + u]
                        t = rdr.decode(dc_tbl)
                        pred[ci] += _extend(rdr.bits(t), t)
                        coef[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = rdr.decode(ac_tbl)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:  # ZRL: 16 zeros
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                break
                            coef[k] = _extend(rdr.bits(s), s)
                            k += 1
            mcu_index += 1

    # numeric bulk, whole-component vectorized: dequant -> de-zigzag ->
    # batched IDCT (one einsum) -> level shift -> plane assembly
    planes = []
    for ci, (_cid, hs, vs, tq) in enumerate(comps):
        by, bx, _ = stores[ci].shape
        dq = stores[ci].astype(np.float64)
        blocks = np.zeros((by, bx, 64))
        blocks[:, :, _ZIGZAG] = dq
        blocks = blocks.reshape(by, bx, 8, 8) * qt[tq]
        # f = A^T F A for every block
        spatial = np.einsum("ux,yzuv,vt->yzxt", _A, blocks, _A)
        plane = spatial.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8) + 128.0
        # upsample to full-frame resolution (nearest, the standard cheap
        # JFIF reconstruction) then crop
        ry, rx = vmax // vs, hmax // hs
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        y = np.clip(planes[0], 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=-1)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)
