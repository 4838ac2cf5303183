"""Minimal baseline-JPEG ENCODER (test fixture only).

Synthesizes valid ITU-T T.81 baseline JFIF streams so the decoder in
pytimetk_spark/webtext/jpeg.py can be differentially tested without PIL.
Uses simple CUSTOM canonical Huffman tables (all DC symbols at one code
length, all AC symbols at another) — poor compression, but any valid DHT
is a legal stream and exercises the decoder's canonical-table builder
harder than the Annex K defaults would.
"""

from __future__ import annotations

import struct

import numpy as np

from pytimetk_spark.webtext.jpeg import _A, _ZIGZAG

# canonical tables: DC = 12 symbols (cat 0-11) @ 5 bits, AC = 162 RS
# symbols @ 9 bits (count < 2^9 so the prefix code is valid)
_DC_SYMS = list(range(12))
_AC_SYMS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
assert len(_AC_SYMS) == 162


def _canon(symbols: list[int], length: int) -> dict[int, tuple[int, int]]:
    return {sym: (length, i) for i, sym in enumerate(symbols)}


_DC_CODES = _canon(_DC_SYMS, 5)
_AC_CODES = _canon(_AC_SYMS, 9)


def _dht(tc: int, th: int, symbols: list[int], length: int) -> bytes:
    counts = [0] * 16
    counts[length - 1] = len(symbols)
    body = bytes([(tc << 4) | th]) + bytes(counts) + bytes(symbols)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | code
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def align(self) -> None:  # pad with 1s to byte boundary (T.81)
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _encode_block(bw: _BitWriter, coef_zz: np.ndarray, pred: int) -> int:
    dc = int(coef_zz[0])
    diff = dc - pred
    t = _category(diff)
    bw.write(*reversed(_DC_CODES[t]))
    if t:
        bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    k = 1
    zero_run = 0
    for k in range(1, 64):
        v = int(coef_zz[k])
        if v == 0:
            zero_run += 1
            continue
        while zero_run > 15:
            bw.write(*reversed(_AC_CODES[0xF0]))  # ZRL
            zero_run -= 16
        s = _category(v)
        bw.write(*reversed(_AC_CODES[(zero_run << 4) | s]))
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        zero_run = 0
    if zero_run:
        bw.write(*reversed(_AC_CODES[0x00]))  # EOB
    return dc


def _fdct_quant(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """plane (H8, W8) -> zigzag coefficient array (by, bx, 64)."""
    h8, w8 = plane.shape
    by, bx = h8 // 8, w8 // 8
    blocks = plane.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3) - 128.0
    f = np.einsum("ux,yzxt,vt->yzuv", _A, blocks, _A)
    flat = np.round(f / q).astype(np.int32).reshape(by, bx, 64)
    # zigzag: scan position i holds flat (row-major) offset _ZIGZAG[i]
    return flat[:, :, _ZIGZAG]


def _pad_to(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
    h, w = plane.shape
    ph = (mh - h % mh) % mh
    pw = (mw - w % mw) % mw
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


def encode_baseline_jpeg(
    rgb: np.ndarray,
    quant: int = 1,
    subsample: bool = False,
    restart_interval: int = 0,
    grayscale: bool = False,
) -> bytes:
    """RGB (H,W,3) uint8 -> baseline JFIF bytes. quant = flat quantizer
    value (1 = near-lossless). subsample=True -> 4:2:0 chroma."""
    rgb = rgb.astype(np.float64)
    h, w = rgb.shape[:2]
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    q = np.full((8, 8), float(quant))

    if grayscale:
        comps = [(1, 1, 1, 0)]
        planes = [y]
    elif subsample:
        comps = [(1, 2, 2, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
        cb_p = _pad_to(cb, 16, 16)
        cr_p = _pad_to(cr, 16, 16)
        ds = lambda p: p.reshape(p.shape[0] // 2, 2, p.shape[1] // 2, 2).mean(
            axis=(1, 3)
        )
        planes = [y, ds(cb_p), ds(cr_p)]
    else:
        comps = [(1, 1, 1, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
        planes = [y, cb, cr]

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h

    # coefficients per component
    coefs = []
    for (cid, hs, vs, tq), plane in zip(comps, planes):
        target_h, target_w = mcus_y * vs * 8, mcus_x * hs * 8
        p = np.pad(
            plane,
            ((0, target_h - plane.shape[0]), (0, target_w - plane.shape[1])),
            mode="edge",
        )
        coefs.append(_fdct_quant(p, q))

    # headers
    out = bytearray(b"\xff\xd8")  # SOI
    jfif = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", len(jfif) + 2) + jfif
    zz_q = np.empty(64, dtype=np.uint8)
    zz_q[:] = q.reshape(64)[_ZIGZAG]
    for tq in sorted({c[3] for c in comps}):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + bytes(zz_q)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(comps)])
    for cid, hs, vs, tq in comps:
        sof += bytes([cid, (hs << 4) | vs, tq])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht(0, 0, _DC_SYMS, 5) + _dht(1, 0, _AC_SYMS, 9)
    if len(comps) > 1:
        out += _dht(0, 1, _DC_SYMS, 5) + _dht(1, 1, _AC_SYMS, 9)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([len(comps)])
    for i, (cid, *_rest) in enumerate(comps):
        t = 0 if i == 0 else 1
        sos += bytes([cid, (t << 4) | t])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    # entropy-coded data, MCU interleaved
    bw = _BitWriter()
    pred = [0] * len(comps)
    mcu_index = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                bw.align()
                bw.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                pred = [0] * len(comps)
            for ci, (cid, hs, vs, tq) in enumerate(comps):
                for v in range(vs):
                    for u in range(hs):
                        blk = coefs[ci][my * vs + v, mx * hs + u]
                        pred[ci] = _encode_block(bw, blk, pred[ci])
            mcu_index += 1
    bw.align()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# progressive AC alphabet adds the EOBn symbols ((r<<4)|0 for r<15)
_AC_SYMS_PROG = [(r << 4) | s for r in range(16) for s in range(11)]
_AC_CODES_PROG = _canon(_AC_SYMS_PROG, 9)


class _ProgWriter(_BitWriter):
    """Bit writer with progressive-scan state: pending EOB runs and
    buffered correction bits (mirrors libjpeg's jcphuff emit order —
    EOBn symbol + its extra bits, then the buffered refinement bits)."""

    def __init__(self):
        super().__init__()
        self.eobrun = 0
        self.corr = []

    def emit_eobrun(self):
        if self.eobrun > 0:
            r = self.eobrun.bit_length() - 1
            self.write(*reversed(_AC_CODES_PROG[r << 4]))
            if r:
                self.write(self.eobrun - (1 << r), r)
            self.eobrun = 0
        for bit in self.corr:
            self.write(bit, 1)
        self.corr = []


def _encode_dc_scan(bw, coefs, comps, idxs, mcus_y, mcus_x, ah, al,
                    preds):
    """DC scan: interleaved over all of idxs' blocks (first: diffs of
    dc>>al; refinement: bit al of each dc)."""
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci in idxs:
                _cid, hs, vs, _tq = comps[ci]
                for v in range(vs):
                    for u in range(hs):
                        dc = int(coefs[ci][my * vs + v, mx * hs + u, 0])
                        if ah == 0:
                            val = dc >> al  # arithmetic shift, T.81 A.4
                            diff = val - preds[ci]
                            preds[ci] = val
                            t = _category(diff)
                            bw.write(*reversed(_DC_CODES[t]))
                            if t:
                                bw.write(
                                    diff if diff >= 0
                                    else diff + (1 << t) - 1, t)
                        else:
                            bw.write((dc >> al) & 1, 1)


def _encode_ac_first(bw, block_zz, ss, se, al):
    """First AC scan for one block: run-length + EOBn coding of the
    point-transformed (trunc toward zero) band coefficients."""
    k = ss
    zero_run = 0
    wrote = False
    for k in range(ss, se + 1):
        v = int(block_zz[k])
        v = (abs(v) >> al) * (1 if v >= 0 else -1)  # trunc toward zero
        if v == 0:
            zero_run += 1
            continue
        bw.emit_eobrun()
        while zero_run > 15:
            bw.write(*reversed(_AC_CODES_PROG[0xF0]))
            zero_run -= 16
        s = _category(v)
        bw.write(*reversed(_AC_CODES_PROG[(zero_run << 4) | s]))
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        zero_run = 0
        wrote = True
    if zero_run or not wrote:
        bw.eobrun += 1
        if bw.eobrun == 0x7FFF:
            bw.emit_eobrun()


def _encode_ac_refine(bw, block_zz, ss, se, al):
    """Refinement AC scan for one block (libjpeg jcphuff structure:
    newly-nonzero coefs get a run symbol + sign bit; already-nonzero
    coefs passed over contribute buffered correction bits)."""
    absvals = [abs(int(block_zz[k])) >> al for k in range(ss, se + 1)]
    eob = 0  # index AFTER last newly-significant coef, relative to ss
    for i, t in enumerate(absvals):
        if t == 1:
            eob = i + 1
    r = 0
    pend = []  # correction bits accumulated since last emitted symbol
    for i, t in enumerate(absvals):
        if t == 0:
            r += 1
            continue
        while r > 15 and i < eob:
            bw.emit_eobrun()
            bw.write(*reversed(_AC_CODES_PROG[0xF0]))
            r -= 16
            for bit in pend:
                bw.write(bit, 1)
            pend = []
        if t > 1:  # history coef: correction bit only
            pend.append(t & 1)
            continue
        bw.emit_eobrun()
        bw.write(*reversed(_AC_CODES_PROG[(r << 4) | 1]))
        bw.write(1 if int(block_zz[ss + i]) >= 0 else 0, 1)
        for bit in pend:
            bw.write(bit, 1)
        pend = []
        r = 0
    if r > 0 or pend:
        bw.eobrun += 1
        bw.corr.extend(pend)
        if bw.eobrun == 0x7FFF or len(bw.corr) > 900:
            bw.emit_eobrun()


def encode_progressive_jpeg(
    rgb: np.ndarray,
    quant: int = 1,
    subsample: bool = False,
    grayscale: bool = False,
    al: int = 1,
    split_band: bool = False,
) -> bytes:
    """RGB -> progressive (SOF2) JFIF bytes. Scan script: interleaved
    DC first at Al=al, DC refinements down to 0, then per-component AC
    first scans at Al=al (optionally split into two spectral bands) and
    matching AC refinements — the same shape libjpeg's default
    progression uses, exercising every decoder path (EOBn runs, ZRL,
    correction bits, interleaved + non-interleaved grids)."""
    rgb = rgb.astype(np.float64)
    h, w = rgb.shape[:2]
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    q = np.full((8, 8), float(quant))

    if grayscale:
        comps = [(1, 1, 1, 0)]
        planes = [y]
    elif subsample:
        comps = [(1, 2, 2, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
        cb_p = _pad_to(cb, 16, 16)
        cr_p = _pad_to(cr, 16, 16)
        ds = lambda p: p.reshape(
            p.shape[0] // 2, 2, p.shape[1] // 2, 2).mean(axis=(1, 3))
        planes = [y, ds(cb_p), ds(cr_p)]
    else:
        comps = [(1, 1, 1, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
        planes = [y, cb, cr]

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    coefs = []
    for (cid, hs, vs, tq), plane in zip(comps, planes):
        th, tw = mcus_y * vs * 8, mcus_x * hs * 8
        p = np.pad(plane, ((0, th - plane.shape[0]),
                           (0, tw - plane.shape[1])), mode="edge")
        coefs.append(_fdct_quant(p, q))

    out = bytearray(b"\xff\xd8")
    jfif = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", len(jfif) + 2) + jfif
    zz_q = np.empty(64, dtype=np.uint8)
    zz_q[:] = q.reshape(64)[_ZIGZAG]
    for tq in sorted({c[3] for c in comps}):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + bytes(zz_q)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(comps)])
    for cid, hs, vs, tq in comps:
        sof += bytes([cid, (hs << 4) | vs, tq])
    out += b"\xff\xc2" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht(0, 0, _DC_SYMS, 5) + _dht(1, 0, _AC_SYMS_PROG, 9)
    if len(comps) > 1:
        out += _dht(0, 1, _DC_SYMS, 5) + _dht(1, 1, _AC_SYMS_PROG, 9)

    def sos(comp_specs, ss, se, ah, a_l):
        seg = bytes([len(comp_specs)])
        for cid, t in comp_specs:
            seg += bytes([cid, (t << 4) | t])
        seg += bytes([ss, se, (ah << 4) | a_l])
        return b"\xff\xda" + struct.pack(">H", len(seg) + 2) + seg

    # non-interleaved block grid dims per component (T.81 A.2.2)
    def grid(ci):
        _cid, hs, vs, _tq = comps[ci]
        cw = (w * hs + hmax - 1) // hmax
        chh = (h * vs + vmax - 1) // vmax
        return (chh + 7) // 8, (cw + 7) // 8

    all_specs = [(c[0], 0 if i == 0 else 1) for i, c in enumerate(comps)]
    idxs = list(range(len(comps)))

    # scan 1: DC first (interleaved), then DC refinements
    out += sos(all_specs, 0, 0, 0, al)
    bw = _BitWriter()
    _encode_dc_scan(bw, coefs, comps, idxs, mcus_y, mcus_x, 0, al,
                    [0] * len(comps))
    bw.align()
    out += bw.out
    for a in range(al, 0, -1):
        out += sos(all_specs, 0, 0, a, a - 1)
        bw = _BitWriter()
        _encode_dc_scan(bw, coefs, comps, idxs, mcus_y, mcus_x, a, a - 1,
                        [0] * len(comps))
        bw.align()
        out += bw.out

    bands = [(1, 5), (6, 63)] if split_band else [(1, 63)]
    for ci in range(len(comps)):
        tbl = 0 if ci == 0 else 1
        bh, bwid = grid(ci)
        for ss, se in bands:
            out += sos([(comps[ci][0], tbl)], ss, se, 0, al)
            pw = _ProgWriter()
            for unit in range(bh * bwid):
                by, bx = divmod(unit, bwid)
                _encode_ac_first(pw, coefs[ci][by, bx], ss, se, al)
            pw.emit_eobrun()
            pw.align()
            out += pw.out
    for ci in range(len(comps)):
        tbl = 0 if ci == 0 else 1
        bh, bwid = grid(ci)
        for ss, se in bands:
            for a in range(al, 0, -1):
                out += sos([(comps[ci][0], tbl)], ss, se, a, a - 1)
                pw = _ProgWriter()
                for unit in range(bh * bwid):
                    by, bx = divmod(unit, bwid)
                    _encode_ac_refine(pw, coefs[ci][by, bx], ss, se, a - 1)
                pw.emit_eobrun()
                pw.align()
                out += pw.out
    out += b"\xff\xd9"
    return bytes(out)
