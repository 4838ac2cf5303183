"""Pure-numpy JPEG (JFIF subset) decoder: baseline AND progressive.

Moves the dominant real-web image format into the REAL decode tier of
``decode_image_batch`` (reference analogue: pytimetk has no image path —
this belongs to the engine-mandate multimodal surface; see
webtext/multimodal.py). Public-spec implementation: ITU-T T.81 baseline
sequential DCT (SOF0) and progressive DCT (SOF2) with spectral
selection + successive approximation, Huffman entropy coding, 8-bit
precision.

Supported: SOI/APP*/COM/DQT/DHT/SOF0/SOF2/DRI/SOS/EOI streams,
1-component (grayscale) and 3-component (YCbCr) images, sampling
factors 1-2 per axis (covers 4:4:4, 4:2:2, 4:2:0), restart markers;
progressive scans may be interleaved DC (first + refinement) and
per-component AC bands (first with EOB-run coding + refinement
correction bits, T.81 G.1.2 / G.2). NOT supported (returns None so
callers can stub or raise): arithmetic coding, 12-bit precision,
hierarchical (SOF3+), 4-component CMYK.

Performance shape: header/Huffman parsing is a per-blob Python loop
(entropy decoding is inherently sequential), but the IDCT — the numeric
bulk — is ONE einsum over all of a component's blocks, and dequantize /
level-shift / color-convert are whole-image numpy ops. Decode runs per
file inside mapInPandas, so the Python overhead amortizes per blob, the
same boundary as the BMP/WAV decoders. At true 100-TB image volume the
per-symbol Huffman loop is the CPU bottleneck: this module is the
SWAP-FOR-NATIVE-CODEC boundary — keep the mapInPandas batch plumbing
and replace only ``decode_jpeg`` with a native library (libjpeg-turbo/
PIL) where the deployment image has one.
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


def _decode_jpeg_impl(blob: bytes) -> np.ndarray | None:
    """Decode a baseline (SOF0) or progressive (SOF2) JFIF blob ->
    HxWx3 uint8 RGB (grayscale broadcast to 3 channels). Returns None
    for non-JPEG or unsupported variants (arithmetic, 12-bit, CMYK) so
    callers can fall back."""
    if len(blob) < 4 or blob[0] != 0xFF or blob[1] != 0xD8:
        return None
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _Huff] = {}
    huff_ac: dict[int, _Huff] = {}
    frame = None  # (h, w, comps) where comps = [(cid, hs, vs, tq)]
    restart_interval = 0
    progressive = False
    stores = None  # progressive: persistent per-component coef arrays
    n = len(blob)
    while pos + 4 <= n:
        if blob[pos] != 0xFF:
            return None
        marker = blob[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI: done (progressive) or no SOS at all
            break
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
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
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
            progressive = marker == 0xC2
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            return None  # extended / lossless / arithmetic: unsupported
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:  # SOS -> entropy-coded data follows
            if frame is None:
                return None
            ns = body[0]
            scan_comps = []
            scan_tables = {}
            for c in range(ns):
                cs, td_ta = body[1 + 2 * c], body[2 + 2 * c]
                scan_comps.append(cs)
                scan_tables[cs] = (td_ta >> 4, td_ta & 0x0F)
            if not progressive:
                return _decode_scan(
                    blob, seg_end, frame, scan_tables, qt, huff_dc,
                    huff_ac, restart_interval,
                )
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ah_al = body[3 + 2 * ns]
            ah, al = ah_al >> 4, ah_al & 0x0F
            if stores is None:
                stores = _make_stores(frame)
            pos = _decode_progressive_scan(
                blob, seg_end, frame, scan_comps, scan_tables, stores,
                huff_dc, huff_ac, restart_interval, ss, se, ah, al,
            )
            if pos is None:
                return None
            continue
        pos = seg_end
    if progressive and stores is not None:
        h, w, comps = frame
        hmax = max(c[1] for c in comps)
        vmax = max(c[2] for c in comps)
        return _reconstruct(stores, comps, qt, h, w, hmax, vmax)
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

    return _reconstruct(stores, comps, qt, h, w, hmax, vmax)


def _make_stores(frame):
    """Persistent zigzag-order coefficient arrays, one per component,
    sized to the padded interleaved-MCU grid (non-interleaved scans walk
    the smaller ceil(comp_dim/8) sub-grid of the same arrays)."""
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    return [
        np.zeros((mcus_y * vs, mcus_x * hs, 64), dtype=np.int32)
        for _, hs, vs, _tq in comps
    ]


def _reconstruct(stores, comps, qt, h, w, hmax, vmax):
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


def _decode_progressive_scan(blob, pos, frame, scan_comps, scan_tables,
                             stores, huff_dc, huff_ac, restart_interval,
                             ss, se, ah, al):
    """Decode one progressive scan into the persistent coefficient
    stores (T.81 G.2): interleaved DC scans (first Ah=0 with <<Al point
    transform, refinement one bit per block) and single-component AC
    band scans (first with EOB-run coding, refinement with correction
    bits). Returns the blob position of the marker terminating the
    scan, or None on malformed input."""
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    rdr = _BitReader(blob, pos)
    eobrun = 0
    p1 = 1 << al

    def refine_nonzero(coef, k):
        """Append a correction bit to an already-nonzero coefficient."""
        if rdr.bit() and not (coef[k] & p1):
            coef[k] += p1 if coef[k] >= 0 else -p1

    if ss == 0:  # DC scan (always covers se==0; interleaved if ns>1)
        if se != 0:
            return None
        idxs = [ci for ci, c in enumerate(comps) if c[0] in scan_comps]
        pred = [0] * len(comps)
        nunits = 0
        interleaved = len(idxs) > 1
        if interleaved:
            units = []
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    units.append((my, mx))
        for unit in range(
            mcus_y * mcus_x if interleaved
            else _blocks_y(h, comps[idxs[0]][2], vmax)
            * _blocks_x(w, comps[idxs[0]][1], hmax)
        ):
            if (restart_interval and nunits
                    and nunits % restart_interval == 0):
                rdr.restart()
                pred = [0] * len(comps)
            if interleaved:
                my, mx = units[unit]
                for ci in idxs:
                    _cid, hs, vs, _tq = comps[ci]
                    td = scan_tables[comps[ci][0]][0]
                    for v in range(vs):
                        for u in range(hs):
                            coef = stores[ci][my * vs + v, mx * hs + u]
                            if ah == 0:
                                t = rdr.decode(huff_dc[td])
                                pred[ci] += _extend(rdr.bits(t), t)
                                coef[0] = pred[ci] << al
                            elif rdr.bit():
                                coef[0] |= p1
            else:
                ci = idxs[0]
                bw = _blocks_x(w, comps[ci][1], hmax)
                by, bx = divmod(unit, bw)
                coef = stores[ci][by, bx]
                td = scan_tables[comps[ci][0]][0]
                if ah == 0:
                    t = rdr.decode(huff_dc[td])
                    pred[ci] += _extend(rdr.bits(t), t)
                    coef[0] = pred[ci] << al
                elif rdr.bit():
                    coef[0] |= p1
            nunits += 1
    else:  # AC band scan: exactly one component, non-interleaved
        if len(scan_comps) != 1:
            return None
        ci = next(i for i, c in enumerate(comps) if c[0] == scan_comps[0])
        _cid, hs, vs, _tq = comps[ci]
        ta = scan_tables[scan_comps[0]][1]
        ac_tbl = huff_ac[ta]
        bw = _blocks_x(w, hs, hmax)
        bh = _blocks_y(h, vs, vmax)
        for unit in range(bh * bw):
            if (restart_interval and unit
                    and unit % restart_interval == 0):
                rdr.restart()
                eobrun = 0
            by, bx = divmod(unit, bw)
            coef = stores[ci][by, bx]
            if ah == 0:  # first AC scan for this band
                if eobrun > 0:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = rdr.decode(ac_tbl)
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r == 15:  # ZRL
                            k += 16
                            continue
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += rdr.bits(r)
                        break
                    k += r
                    if k > se:
                        break
                    coef[k] = _extend(rdr.bits(s), s) << al
                    k += 1
            else:  # AC refinement (T.81 G.1.2.3 / libjpeg structure)
                k = ss
                if eobrun == 0:
                    while k <= se:
                        rs = rdr.decode(ac_tbl)
                        r, s = rs >> 4, rs & 0x0F
                        newval = 0
                        if s == 0:
                            if r < 15:  # EOBn: run starts after this blk
                                eobrun = 1 << r
                                if r:
                                    eobrun += rdr.bits(r)
                                break
                            # r == 15: pass 16 zero-history positions
                        else:  # s must be 1: one newly-nonzero coef
                            newval = p1 if rdr.bit() else -p1
                        # advance over r zero-history coefs, emitting
                        # correction bits for nonzero ones passed over
                        while k <= se:
                            if coef[k] != 0:
                                refine_nonzero(coef, k)
                            else:
                                if r == 0:
                                    break
                                r -= 1
                            k += 1
                        if newval and k <= se:
                            coef[k] = newval
                        k += 1
                if eobrun > 0:
                    while k <= se:  # EOB span still refines nonzeros
                        if coef[k] != 0:
                            refine_nonzero(coef, k)
                        k += 1
                    eobrun -= 1

    # byte-align; report the terminating marker position to the caller
    d = blob
    p = rdr.pos
    while p + 1 < len(d) and not (
        d[p] == 0xFF and d[p + 1] not in (0x00,) and not (
            0xD0 <= d[p + 1] <= 0xD7)
    ):
        p += 1
    return p


def _blocks_x(w, hs, hmax):
    """Non-interleaved block count: ceil(ceil(w*hs/hmax)/8), T.81 A.2.2."""
    cw = (w * hs + hmax - 1) // hmax
    return (cw + 7) // 8


def _blocks_y(h, vs, vmax):
    ch = (h * vs + vmax - 1) // vmax
    return (ch + 7) // 8


def decode_jpeg(blob: bytes) -> np.ndarray | None:
    """Total wrapper: one corrupt blob in a crawl shard must fall to
    the None/stub path, never kill a Spark task — truncated or
    malformed streams surface as parser exceptions in the impl."""
    try:
        return _decode_jpeg_impl(blob)
    except (IndexError, KeyError, ValueError, ZeroDivisionError,
            RecursionError, struct.error, MemoryError):
        return None


# back-compat alias: the original entry point was baseline-only
decode_baseline_jpeg = decode_jpeg
