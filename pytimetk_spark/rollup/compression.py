"""Gorilla-style compression codecs (public algorithm: Pelkonen et al.,
"Gorilla: A Fast, Scalable, In-Memory Time Series Database", VLDB 2015).

- ``encode_timestamps`` / ``decode_timestamps``: delta-of-delta with the
  paper's variable-length buckets ('0' | '10'+7b | '110'+9b | '1110'+12b |
  '1111'+64b — we widen the escape to 64 bits since web-crawl gaps can
  exceed 2^31 seconds only pathologically, but correctness first).
- ``encode_gorilla`` / ``decode_gorilla``: float64 XOR compression with
  leading/trailing-zero window reuse.

These are pure-numpy/python kernels executed INSIDE Arrow grouped-map UDFs
(one call per (url, partition) value stream) — the bit-twiddling is
per-block sequential by nature, so it belongs in the Python worker; the
distribution/shuffle strategy lives in rollup/tiers.py. Exact round-trip
is asserted by tests (NaNs round-trip bit-exactly too).

The reference (pytimetk) has no compression; this implements the
north-rule mandate (BASELINE.json: "Gorilla XOR + delta-of-delta").
"""

from __future__ import annotations

import numpy as np

_MAGIC_TS = 0xA1  # single-byte format tags
_MAGIC_VAL = 0xA2


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int) -> None:
        if bits == 0:
            return
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def getvalue(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            return bytes(self.buf) + bytes([(self.acc << pad) & 0xFF])
        return bytes(self.buf)


class _BitReader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read(self, bits: int) -> int:
        out = 0
        remaining = bits
        while remaining > 0:
            byte_i, bit_i = divmod(self.pos, 8)
            avail = 8 - bit_i
            take = min(avail, remaining)
            chunk = (self.data[byte_i] >> (avail - take)) & ((1 << take) - 1)
            out = (out << take) | chunk
            self.pos += take
            remaining -= take
        return out


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v < 0 else v << 1


def _unzigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def encode_timestamps(ts_seconds: np.ndarray) -> bytes:
    """Delta-of-delta encode int64 epoch seconds (must be sorted)."""
    ts = np.asarray(ts_seconds, dtype=np.int64)
    n = len(ts)
    w = _BitWriter()
    w.write(_MAGIC_TS, 8)
    w.write(n, 32)
    if n == 0:
        return w.getvalue()
    w.write(int(ts[0]) & ((1 << 64) - 1), 64)
    if n == 1:
        return w.getvalue()
    first_delta = int(ts[1]) - int(ts[0])
    w.write(_zigzag(first_delta), 64)
    prev_delta = first_delta
    for i in range(2, n):
        delta = int(ts[i]) - int(ts[i - 1])
        dod = delta - prev_delta
        prev_delta = delta
        if dod == 0:
            w.write(0b0, 1)
        elif -63 <= dod <= 64:
            w.write(0b10, 2)
            w.write(dod + 63, 7)
        elif -255 <= dod <= 256:
            w.write(0b110, 3)
            w.write(dod + 255, 9)
        elif -2047 <= dod <= 2048:
            w.write(0b1110, 4)
            w.write(dod + 2047, 12)
        else:
            w.write(0b1111, 4)
            w.write(_zigzag(dod), 64)
    return w.getvalue()


def decode_timestamps(blob: bytes) -> np.ndarray:
    r = _BitReader(blob)
    magic = r.read(8)
    if magic != _MAGIC_TS:
        raise ValueError(f"bad timestamp block magic: {magic:#x}")
    n = r.read(32)
    out = np.empty(n, dtype=np.int64)
    if n == 0:
        return out
    first = r.read(64)
    if first >= 1 << 63:
        first -= 1 << 64
    out[0] = first
    if n == 1:
        return out
    delta = _unzigzag(r.read(64))
    out[1] = out[0] + delta
    for i in range(2, n):
        if r.read(1) == 0:
            dod = 0
        else:
            if r.read(1) == 0:
                dod = r.read(7) - 63
            elif r.read(1) == 0:
                dod = r.read(9) - 255
            elif r.read(1) == 0:
                dod = r.read(12) - 2047
            else:
                dod = _unzigzag(r.read(64))
        delta += dod
        out[i] = out[i - 1] + delta
    return out


def encode_gorilla(values: np.ndarray) -> bytes:
    """XOR-encode float64 values (Gorilla §4.1.2)."""
    vals = np.asarray(values, dtype=np.float64)
    bits = vals.view(np.uint64)
    n = len(vals)
    w = _BitWriter()
    w.write(_MAGIC_VAL, 8)
    w.write(n, 32)
    if n == 0:
        return w.getvalue()
    prev = int(bits[0])
    w.write(prev, 64)
    prev_lead, prev_mean = 65, 0  # invalid window forces re-emission
    for i in range(1, n):
        cur = int(bits[i])
        xor = prev ^ cur
        prev = cur
        if xor == 0:
            w.write(0b0, 1)
            continue
        lead = 64 - xor.bit_length()
        trail = (xor & -xor).bit_length() - 1
        if lead > 31:
            lead = 31  # 5-bit field limit, same clamp as the paper
        meaningful = 64 - lead - trail
        if (
            prev_lead <= lead
            and (64 - prev_lead - prev_mean) <= trail
            and prev_mean > 0
        ):
            # reuse the previous window ('10')
            w.write(0b10, 2)
            shift = 64 - prev_lead - prev_mean
            w.write(xor >> shift, prev_mean)
        else:
            w.write(0b11, 2)
            w.write(lead, 5)
            w.write(meaningful - 1, 6)  # 1..64 stored as 0..63
            w.write(xor >> trail, meaningful)
            prev_lead, prev_mean = lead, meaningful
    return w.getvalue()


def decode_gorilla(blob: bytes) -> np.ndarray:
    r = _BitReader(blob)
    magic = r.read(8)
    if magic != _MAGIC_VAL:
        raise ValueError(f"bad value block magic: {magic:#x}")
    n = r.read(32)
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out.view(np.float64)
    prev = r.read(64)
    out[0] = prev
    lead, mean = 0, 0
    for i in range(1, n):
        if r.read(1) == 0:
            out[i] = prev
            continue
        if r.read(1) == 0:  # '10' reuse window
            xor = r.read(mean) << (64 - lead - mean)
        else:  # '11' new window
            lead = r.read(5)
            mean = r.read(6) + 1
            xor = r.read(mean) << (64 - lead - mean)
        prev ^= xor
        out[i] = prev
    return out.view(np.float64)
