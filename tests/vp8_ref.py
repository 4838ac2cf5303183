"""Independent in-test VP8 keyframe ENCODER (RFC 6386) — differential
fixture generator for pytimetk_spark/webtext/vp8.py, in the same spirit
as tests/webp_ref.py (VP8L) and tests/jpeg_ref.py.

The encoder takes explicit per-macroblock intra modes and explicit
QUANTIZED coefficient levels (no forward DCT / rate control — fixtures
choose levels directly) and emits a spec-layout keyframe bitstream:
boolean arithmetic coder with carry propagation, frame header, mode
records, token partition(s) with full context bookkeeping (above/left
nonzero flags, prev-token contexts, band tables, no-EOB-after-zero tree
entry). Probability tables are imported FROM the decoder module so
round-trips exercise the mechanics bit-exactly (see the module
docstring's transcription caveat).

The expected-pixel model reuses the decoder's transform/predictor
primitives (unit-tested separately against float DCT references) but
re-implements the reconstruction DRIVER — borders, subblock order,
Y2 distribution, cropping — independently.
"""

from __future__ import annotations

import numpy as np

from pytimetk_spark.webtext.vp8 import (
    AC_QLOOKUP,
    B_PRED,
    BMODE_TREE,
    CAT1,
    CAT_BASES,
    CAT_PROBS,
    COEF_BANDS,
    COEF_TREE,
    COEF_UPDATE_PROBS,
    DC_QLOOKUP,
    DEFAULT_COEF_PROBS,
    EOB_TOKEN,
    KF_BMODE_PROB,
    KF_UV_MODE_PROB,
    KF_YMODE_PROB,
    KF_YMODE_TREE,
    MODE_TO_BMODE,
    UV_MODE_TREE,
    ZERO_TOKEN,
    ZIGZAG,
    _Quant,
    idct4x4,
    iwht4x4,
    predict_16x16,
    predict_8x8,
    predict_b,
)


class BoolEncoder:
    """RFC 6386 §7.2 reference boolean encoder (carry-propagating)."""

    def __init__(self):
        self.out = bytearray()
        self.range = 255
        self.bottom = 0
        self.bit_count = 24

    def _carry(self):
        i = len(self.out) - 1
        while i >= 0 and self.out[i] == 255:
            self.out[i] = 0
            i -= 1
        assert i >= 0, "carry out of stream start"
        self.out[i] += 1

    def write_bool(self, prob: int, val: int):
        split = 1 + (((self.range - 1) * prob) >> 8)
        if val:
            self.bottom += split
            if self.bottom > 0xFFFFFFFF:
                self._carry()
                self.bottom &= 0xFFFFFFFF
            self.range -= split
        else:
            self.range = split
        while self.range < 128:
            self.range <<= 1
            if self.bottom & (1 << 31):
                self._carry()
            self.bottom = (self.bottom << 1) & 0xFFFFFFFF
            self.bit_count -= 1
            if self.bit_count == 0:
                self.out.append((self.bottom >> 24) & 0xFF)
                self.bottom &= (1 << 24) - 1
                self.bit_count = 8

    def write_literal(self, n: int, v: int):
        for i in reversed(range(n)):
            self.write_bool(128, (v >> i) & 1)

    def write_signed(self, n: int, v: int):
        self.write_literal(n, abs(v))
        self.write_bool(128, 1 if v < 0 else 0)

    def write_tree(self, tree, probs, value: int, start: int = 0):
        for pidx, bit in _tree_path(tree, value, start):
            self.write_bool(probs[pidx], bit)

    def flush(self) -> bytes:
        for _ in range(32):
            if self.bottom & (1 << 31):
                self._carry()
            self.bottom = (self.bottom << 1) & 0xFFFFFFFF
            self.bit_count -= 1
            if self.bit_count == 0:
                self.out.append((self.bottom >> 24) & 0xFF)
                self.bottom &= (1 << 24) - 1
                self.bit_count = 8
        return bytes(self.out)


def _tree_path(tree, value, start=0):
    """(prob_index, bit) decisions leading to leaf ``value``."""
    target = -value - 1

    def walk(i, path):
        for bit in (0, 1):
            nxt = tree[i + bit]
            if nxt == target:
                return path + [(i >> 1, bit)]
            if nxt > 0:
                r = walk(nxt, path + [(i >> 1, bit)])
                if r is not None:
                    return r
        return None

    path = walk(start, [])
    assert path is not None, f"value {value} unreachable from node {start}"
    return path


def _token_for(mag: int) -> int:
    if mag <= 4:
        return mag  # ZERO..FOUR share the value
    for tok in (CAT1, CAT1 + 1, CAT1 + 2, CAT1 + 3, CAT1 + 4):
        if mag < CAT_BASES[tok + 1]:
            return tok
    return CAT1 + 5  # CAT6


def _encode_block_tokens(be, probs, plane, first_coeff, ctx, levels):
    """Mirror of the decoder's token loop; returns the nz flag."""
    zz = [int(levels[ZIGZAG[c]]) for c in range(16)]
    last = -1
    for c in range(first_coeff, 16):
        if zz[c] != 0:
            last = c
    prev_zero = False
    c = first_coeff
    while c <= last:
        val = zz[c]
        mag = abs(val)
        tok = _token_for(mag) if mag else ZERO_TOKEN
        band_probs = probs[plane][COEF_BANDS[c]][ctx]
        be.write_tree(COEF_TREE, band_probs, tok, start=2 if prev_zero else 0)
        if mag == 0:
            ctx = 0
            prev_zero = True
            c += 1
            continue
        prev_zero = False
        if tok >= CAT1:
            extra = mag - CAT_BASES[tok]
            cps = CAT_PROBS[tok]
            for i, pr in enumerate(cps):
                be.write_bool(pr, (extra >> (len(cps) - 1 - i)) & 1)
        be.write_bool(128, 1 if val < 0 else 0)
        ctx = 1 if mag == 1 else 2
        c += 1
    if last < 15:
        band_probs = probs[plane][COEF_BANDS[min(c, 15)]][ctx]
        be.write_tree(COEF_TREE, band_probs, EOB_TOKEN,
                      start=2 if prev_zero else 0)
    return last >= first_coeff


class MBSpec:
    """One macroblock's encode spec: intra modes + quantized levels.

    ``y_levels``: 16 arrays of 16 ints (raster coeff order). For
    non-B_PRED modes index 0 of each y block MUST be 0 (the DC travels
    in ``y2_levels`` via the WHT). ``bmodes``: 16 ints, only for B_PRED.
    """

    def __init__(self, ymode, uv_mode, y_levels=None, u_levels=None,
                 v_levels=None, y2_levels=None, bmodes=None):
        z16 = lambda: [np.zeros(16, np.int64) for _ in range(16)]  # noqa: E731
        z4 = lambda: [np.zeros(16, np.int64) for _ in range(4)]  # noqa: E731
        self.ymode = ymode
        self.uv_mode = uv_mode
        self.y_levels = y_levels if y_levels is not None else z16()
        self.u_levels = u_levels if u_levels is not None else z4()
        self.v_levels = v_levels if v_levels is not None else z4()
        self.y2_levels = (y2_levels if y2_levels is not None
                          else np.zeros(16, np.int64))
        self.bmodes = bmodes if bmodes is not None else [0] * 16


def _mb_all_zero(mb) -> bool:
    return (
        all(not np.any(lv) for lv in mb.y_levels)
        and all(not np.any(lv) for lv in mb.u_levels)
        and all(not np.any(lv) for lv in mb.v_levels)
        and (mb.ymode == B_PRED or not np.any(mb.y2_levels))
    )


def encode_vp8_keyframe(w, h, mbs, y_ac_qi=4, deltas=(0, 0, 0, 0, 0),
                        prob_updates=None, use_skip=False, prob_skip=200,
                        n_parts=1):
    """``mbs``: list of MBSpec in raster order, ceil(w/16)*ceil(h/16)
    entries. Returns the raw VP8 keyframe bitstream (``VP8 `` payload).
    ``use_skip`` codes mb_no_coeff_skip=1 and skips token coding for
    all-zero macroblocks; ``n_parts`` in {1,2,4,8} splits token coding
    across partitions by mb-row (RFC 6386 §9.5)."""
    mb_w, mb_h = (w + 15) // 16, (h + 15) // 16
    assert len(mbs) == mb_w * mb_h
    assert n_parts in (1, 2, 4, 8)

    probs = [
        [[list(node) for node in ctx3] for ctx3 in band]
        for band in DEFAULT_COEF_PROBS
    ]
    prob_updates = prob_updates or {}
    for (i, j, k, l), v in prob_updates.items():
        probs[i][j][k][l] = v

    # ---- first partition: header + mode records
    be = BoolEncoder()
    be.write_literal(1, 0)  # color_space
    be.write_literal(1, 0)  # clamping
    be.write_bool(128, 0)   # segmentation_enabled
    be.write_literal(1, 0)  # filter_type
    be.write_literal(6, 0)  # loop_filter_level
    be.write_literal(3, 0)  # sharpness
    be.write_bool(128, 0)   # lf_adj_enable
    be.write_literal(2, {1: 0, 2: 1, 4: 2, 8: 3}[n_parts])
    be.write_literal(7, y_ac_qi)
    for d in deltas:
        if d:
            be.write_bool(128, 1)
            be.write_signed(4, d)
        else:
            be.write_bool(128, 0)
    be.write_bool(128, 1)   # refresh_entropy_probs
    for i in range(4):
        for j in range(8):
            for k in range(3):
                for l in range(11):
                    if (i, j, k, l) in prob_updates:
                        be.write_bool(COEF_UPDATE_PROBS[i][j][k][l], 1)
                        be.write_literal(8, prob_updates[(i, j, k, l)])
                    else:
                        be.write_bool(COEF_UPDATE_PROBS[i][j][k][l], 0)
    be.write_bool(128, 1 if use_skip else 0)  # mb_no_coeff_skip
    if use_skip:
        be.write_literal(8, prob_skip)

    tes = [BoolEncoder() for _ in range(n_parts)]  # token partitions

    above_y_nz = np.zeros((mb_w, 4), bool)
    above_u_nz = np.zeros((mb_w, 2), bool)
    above_v_nz = np.zeros((mb_w, 2), bool)
    above_y2_nz = np.zeros(mb_w, bool)
    above_bmodes = [[0] * 4 for _ in range(mb_w)]

    for mb_y in range(mb_h):
        te = tes[mb_y % n_parts]
        left_y_nz = np.zeros(4, bool)
        left_u_nz = np.zeros(2, bool)
        left_v_nz = np.zeros(2, bool)
        left_y2_nz = False
        left_bmodes = [0] * 4
        for mb_x in range(mb_w):
            mb = mbs[mb_y * mb_w + mb_x]
            skip = 1 if (use_skip and _mb_all_zero(mb)) else 0
            if use_skip:
                be.write_bool(prob_skip, skip)
            be.write_tree(KF_YMODE_TREE, KF_YMODE_PROB, mb.ymode)
            if mb.ymode == B_PRED:
                for sb in range(16):
                    r, c = divmod(sb, 4)
                    above_m = (mb.bmodes[sb - 4] if r > 0
                               else above_bmodes[mb_x][c])
                    left_m = (mb.bmodes[sb - 1] if c > 0 else left_bmodes[r])
                    be.write_tree(BMODE_TREE, KF_BMODE_PROB[above_m][left_m],
                                  mb.bmodes[sb])
                eff_bmodes = list(mb.bmodes)
            else:
                eff_bmodes = [MODE_TO_BMODE[mb.ymode]] * 16
            be.write_tree(UV_MODE_TREE, KF_UV_MODE_PROB, mb.uv_mode)
            above_bmodes[mb_x] = eff_bmodes[12:16]
            left_bmodes = [eff_bmodes[3], eff_bmodes[7],
                           eff_bmodes[11], eff_bmodes[15]]

            has_y2 = mb.ymode != B_PRED
            if skip:
                # mirror the decoder's context reset for skipped MBs
                left_y_nz[:] = False
                above_y_nz[mb_x, :] = False
                left_u_nz[:] = False
                above_u_nz[mb_x, :] = False
                left_v_nz[:] = False
                above_v_nz[mb_x, :] = False
                if has_y2:
                    left_y2_nz = False
                    above_y2_nz[mb_x] = False
                continue
            if has_y2:
                ctx = int(above_y2_nz[mb_x]) + int(left_y2_nz)
                nz = _encode_block_tokens(te, probs, 1, 0, ctx, mb.y2_levels)
                above_y2_nz[mb_x] = left_y2_nz = nz
            y_plane = 0 if has_y2 else 3
            first = 1 if has_y2 else 0
            for sb in range(16):
                r, c = divmod(sb, 4)
                if has_y2:
                    assert mb.y_levels[sb][0] == 0, "DC must ride in Y2"
                ctx = int(above_y_nz[mb_x, c]) + int(left_y_nz[r])
                nz = _encode_block_tokens(te, probs, y_plane, first, ctx,
                                          mb.y_levels[sb])
                above_y_nz[mb_x, c] = left_y_nz[r] = nz
            for sb in range(4):
                r, c = divmod(sb, 2)
                ctx = int(above_u_nz[mb_x, c]) + int(left_u_nz[r])
                nz = _encode_block_tokens(te, probs, 2, 0, ctx,
                                          mb.u_levels[sb])
                above_u_nz[mb_x, c] = left_u_nz[r] = nz
            for sb in range(4):
                r, c = divmod(sb, 2)
                ctx = int(above_v_nz[mb_x, c]) + int(left_v_nz[r])
                nz = _encode_block_tokens(te, probs, 2, 0, ctx,
                                          mb.v_levels[sb])
                above_v_nz[mb_x, c] = left_v_nz[r] = nz

    first_part = be.flush()
    parts = [t.flush() for t in tes]
    tag = (0 | (0 << 1) | (1 << 4) | (len(first_part) << 5))
    header = tag.to_bytes(3, "little") + b"\x9d\x01\x2a"
    header += (w & 0x3FFF).to_bytes(2, "little")
    header += (h & 0x3FFF).to_bytes(2, "little")
    sizes = b"".join(
        len(p).to_bytes(3, "little") for p in parts[:-1]
    )
    return header + first_part + sizes + b"".join(parts)


def wrap_webp(vp8_payload: bytes) -> bytes:
    """RIFF/WEBP container around a raw ``VP8 `` chunk payload."""
    chunk = b"VP8 " + len(vp8_payload).to_bytes(4, "little") + vp8_payload
    if len(vp8_payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + (4 + len(chunk)).to_bytes(4, "little") + b"WEBP" + chunk


# --------------------------------------------------------------------------
# Expected-pixel model: independent reconstruction DRIVER (borders,
# subblock order, Y2 distribution, right-edge above-right rule, crop)
# over the decoder's unit-tested transform/predictor primitives.


def expected_planes(w, h, mbs, y_ac_qi=4, deltas=(0, 0, 0, 0, 0)):
    mb_w, mb_h = (w + 15) // 16, (h + 15) // 16
    q = _Quant(y_ac_qi, *deltas)
    Y = np.full((mb_h * 16 + 1, mb_w * 16 + 5), 127, np.int64)
    U = np.full((mb_h * 8 + 1, mb_w * 8 + 1), 127, np.int64)
    V = np.full((mb_h * 8 + 1, mb_w * 8 + 1), 127, np.int64)
    Y[1:, 0] = 129
    U[1:, 0] = 129
    V[1:, 0] = 129

    def deq(levels, dc, ac):
        f = np.full(16, ac, np.int64)
        f[0] = dc
        return (np.asarray(levels, np.int64) * f).reshape(4, 4)

    for mb_y in range(mb_h):
        for mb_x in range(mb_w):
            mb = mbs[mb_y * mb_w + mb_x]
            has_y2 = mb.ymode != B_PRED
            y0, x0 = mb_y * 16 + 1, mb_x * 16 + 1
            if has_y2:
                dcs = iwht4x4(deq(mb.y2_levels, q.y2dc, q.y2ac)).reshape(16)
                pred = predict_16x16(
                    mb.ymode, Y[y0 - 1, x0 : x0 + 16],
                    Y[y0 : y0 + 16, x0 - 1], Y[y0 - 1, x0 - 1],
                    mb_y > 0, mb_x > 0)
                for sb in range(16):
                    r, c = divmod(sb, 4)
                    co = deq(mb.y_levels[sb], q.y1dc, q.y1ac)
                    co[0, 0] = int(dcs[sb])
                    res = idct4x4(co)
                    Y[y0 + 4 * r : y0 + 4 * r + 4,
                      x0 + 4 * c : x0 + 4 * c + 4] = np.clip(
                        pred[4 * r : 4 * r + 4, 4 * c : 4 * c + 4] + res,
                        0, 255)
            else:
                for sb in range(16):
                    r, c = divmod(sb, 4)
                    by, bx = y0 + 4 * r, x0 + 4 * c
                    a = Y[by - 1, bx : bx + 4]
                    ar = (Y[y0 - 1, x0 + 16 : x0 + 20] if c == 3
                          else Y[by - 1, bx + 4 : bx + 8])
                    res = idct4x4(deq(mb.y_levels[sb], q.y1dc, q.y1ac))
                    pred = predict_b(mb.bmodes[sb], a, ar,
                                     Y[by : by + 4, bx - 1],
                                     Y[by - 1, bx - 1])
                    Y[by : by + 4, bx : bx + 4] = np.clip(pred + res, 0, 255)
            cy0, cx0 = mb_y * 8 + 1, mb_x * 8 + 1
            for levels, buf in ((mb.u_levels, U), (mb.v_levels, V)):
                pred = predict_8x8(
                    mb.uv_mode, buf[cy0 - 1, cx0 : cx0 + 8],
                    buf[cy0 : cy0 + 8, cx0 - 1], buf[cy0 - 1, cx0 - 1],
                    mb_y > 0, mb_x > 0)
                for sb in range(4):
                    r, c = divmod(sb, 2)
                    res = idct4x4(deq(levels[sb], q.uvdc, q.uvac))
                    buf[cy0 + 4 * r : cy0 + 4 * r + 4,
                        cx0 + 4 * c : cx0 + 4 * c + 4] = np.clip(
                        pred[4 * r : 4 * r + 4, 4 * c : 4 * c + 4] + res,
                        0, 255)
        Y[mb_y * 16 + 1 : mb_y * 16 + 17, mb_w * 16 + 1 :] = Y[
            mb_y * 16 + 1 : mb_y * 16 + 17, mb_w * 16 : mb_w * 16 + 1
        ]

    return {
        "y": Y[1 : h + 1, 1 : w + 1].astype(np.uint8),
        "u": U[1 : (h + 1) // 2 + 1, 1 : (w + 1) // 2 + 1].astype(np.uint8),
        "v": V[1 : (h + 1) // 2 + 1, 1 : (w + 1) // 2 + 1].astype(np.uint8),
        "width": w,
        "height": h,
    }
