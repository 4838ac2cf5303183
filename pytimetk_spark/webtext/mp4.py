"""ISO BMFF (MP4) container parser — real frame SAMPLING without a codec.

Video frame work splits into two layers: (1) the container — which byte
ranges are samples, their timestamps, which are sync samples (keyframes),
what codec they carry — and (2) the codec bitstream (H.264/H.265/VP9...).
Layer (1) is a pure public-spec byte format (ISO/IEC 14496-12) and is
fully implemented here; layer (2) genuinely needs ffmpeg/pyav and stays a
documented stub in ``sample_video_frames(decode=True)``.

That split is what a 100-TB crawl pipeline actually wants: keyframe
payload extraction at a target cadence is container work (this module),
and the extracted encoded payloads are what gets shipped to a GPU decode
stage — the Spark side never needs the pixels.

Supported: moov/trak/mdia/minf/stbl hierarchies, mvhd/tkhd/mdhd v0+v1,
hdlr, stsd (codec fourcc), stts (decode timestamps), stsz/stz2-less
fixed+table sizes, stsc chunk runs, stco/co64 chunk offsets, stss sync
table (absent table => every sample is sync, per spec). Fragmented MP4
(moof) returns None — out of scope.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


@dataclass
class Mp4Track:
    handler: str = ""
    codec: str = ""
    width: float = 0.0
    height: float = 0.0
    timescale: int = 0
    sample_sizes: np.ndarray = field(default_factory=lambda: np.zeros(0, np.int64))
    sample_offsets: np.ndarray = field(default_factory=lambda: np.zeros(0, np.int64))
    sample_ts: np.ndarray = field(default_factory=lambda: np.zeros(0, np.float64))
    sync_samples: np.ndarray | None = None  # 0-based indices; None = all
    codec_config: tuple[str, bytes] | None = None  # (avcC/hvcC/..., bytes)

    @property
    def n_samples(self) -> int:
        return int(self.sample_sizes.size)

    @property
    def duration_sec(self) -> float:
        return float(self.sample_ts[-1]) if self.sample_ts.size else 0.0


@dataclass
class Mp4Info:
    duration_sec: float = 0.0
    tracks: list[Mp4Track] = field(default_factory=list)

    def video_track(self) -> Mp4Track | None:
        for t in self.tracks:
            if t.handler == "vide":
                return t
        return None


def _boxes(blob: bytes, start: int, end: int):
    pos = start
    n = min(end, len(blob))
    while pos + 8 <= n:
        size, btype = struct.unpack_from(">I4s", blob, pos)
        hdr = 8
        if size == 1:
            if pos + 16 > n:
                return
            size = struct.unpack_from(">Q", blob, pos + 8)[0]
            hdr = 16
        elif size == 0:
            size = n - pos
        if size < hdr or pos + size > n:
            return
        yield btype, pos + hdr, pos + size
        pos += size


def _parse_mp4_impl(blob: bytes) -> Mp4Info | None:
    """Parse an unfragmented MP4 -> Mp4Info, or None if not ISO BMFF /
    fragmented / malformed."""
    if len(blob) < 12:
        return None
    head = set()
    moov = None
    for btype, s, e in _boxes(blob, 0, len(blob)):
        head.add(btype)
        if btype == b"moov":
            moov = (s, e)
        if btype == b"moof":  # fragmented: sample tables live in moofs
            return None
    if b"ftyp" not in head or moov is None:
        return None
    info = Mp4Info()
    for btype, s, e in _boxes(blob, *moov):
        if btype == b"mvhd":
            ver = blob[s]
            if ver == 1:  # creation/modification are 64-bit
                ts = struct.unpack_from(">I", blob, s + 20)[0]
                dur = struct.unpack_from(">Q", blob, s + 24)[0]
            else:
                ts, dur = struct.unpack_from(">II", blob, s + 12)
            if ts:
                info.duration_sec = dur / ts
        elif btype == b"trak":
            trk = _parse_trak(blob, s, e)
            if trk is not None:
                info.tracks.append(trk)
    return info


def _parse_trak(blob: bytes, s: int, e: int) -> Mp4Track | None:
    trk = Mp4Track()
    stbl = None
    for btype, bs, be in _boxes(blob, s, e):
        if btype == b"tkhd":
            ver = blob[bs]
            off = bs + (96 if ver == 1 else 84) - 8
            if off + 8 <= be:
                w, h = struct.unpack_from(">II", blob, off)
                trk.width, trk.height = w / 65536.0, h / 65536.0
        elif btype == b"mdia":
            for mb, ms, me in _boxes(blob, bs, be):
                if mb == b"mdhd":
                    ver = blob[ms]
                    trk.timescale = struct.unpack_from(
                        ">I", blob, ms + (20 if ver == 1 else 12)
                    )[0]
                elif mb == b"hdlr":
                    trk.handler = blob[ms + 8 : ms + 12].decode(
                        "ascii", "replace"
                    )
                elif mb == b"minf":
                    for nb, ns, ne in _boxes(blob, ms, me):
                        if nb == b"stbl":
                            stbl = (ns, ne)
    if stbl is None or trk.timescale == 0:
        return None
    _parse_stbl(blob, trk, *stbl)
    return trk


def _parse_stbl(blob: bytes, trk: Mp4Track, s: int, e: int) -> None:
    stts = None
    stsc = None
    stco = None
    for btype, bs, be in _boxes(blob, s, e):
        if btype == b"stsd":
            cnt = struct.unpack_from(">I", blob, bs + 4)[0]
            if cnt >= 1 and bs + 16 <= be:
                trk.codec = blob[bs + 12 : bs + 16].decode("ascii", "replace")
                # full VisualSampleEntry (86 bytes) carries child boxes
                # (avcC/hvcC/vpcC codec config) after the fixed fields
                entry_s = bs + 8
                entry_size = struct.unpack_from(">I", blob, entry_s)[0]
                if entry_size >= 86 + 8 and entry_s + entry_size <= be:
                    for ct, cs, ce in _boxes(
                        blob, entry_s + 86, entry_s + entry_size
                    ):
                        if ct in (b"avcC", b"hvcC", b"vpcC", b"av1C"):
                            trk.codec_config = (
                                ct.decode("ascii"), blob[cs:ce]
                            )
        elif btype == b"stts":
            n = struct.unpack_from(">I", blob, bs + 4)[0]
            stts = np.frombuffer(blob, ">u4", n * 2, bs + 8).reshape(n, 2)
        elif btype == b"stsz":
            fixed, n = struct.unpack_from(">II", blob, bs + 4)
            if fixed:
                trk.sample_sizes = np.full(n, fixed, np.int64)
            else:
                trk.sample_sizes = np.frombuffer(
                    blob, ">u4", n, bs + 12
                ).astype(np.int64)
        elif btype == b"stsc":
            n = struct.unpack_from(">I", blob, bs + 4)[0]
            stsc = np.frombuffer(blob, ">u4", n * 3, bs + 8).reshape(n, 3)
        elif btype == b"stco":
            n = struct.unpack_from(">I", blob, bs + 4)[0]
            stco = np.frombuffer(blob, ">u4", n, bs + 8).astype(np.int64)
        elif btype == b"co64":
            n = struct.unpack_from(">I", blob, bs + 4)[0]
            stco = np.frombuffer(blob, ">u8", n, bs + 8).astype(np.int64)
        elif btype == b"stss":
            n = struct.unpack_from(">I", blob, bs + 4)[0]
            trk.sync_samples = (
                np.frombuffer(blob, ">u4", n, bs + 8).astype(np.int64) - 1
            )
    ns = trk.n_samples
    # decode timestamps from stts run-lengths. stts counts are attacker-
    # controlled: clip each run so the expanded delta array never exceeds
    # the stsz-derived sample count — a crafted count=2^31 entry would
    # otherwise force a multi-GB np.repeat before the [:ns] truncation.
    if stts is not None and ns:
        runs = stts[:, 0].astype(np.int64)
        remaining = np.maximum(
            ns - np.concatenate([[0], np.cumsum(runs)[:-1]]), 0
        )
        deltas = np.repeat(
            stts[:, 1].astype(np.int64), np.minimum(runs, remaining)
        )[:ns]
        dts = np.concatenate([[0], np.cumsum(deltas)[:-1]])
        trk.sample_ts = dts / float(trk.timescale)
    # per-sample file offsets from stsc runs + chunk offsets
    if stco is not None and stsc is not None and ns:
        offsets = np.empty(ns, np.int64)
        si = 0
        n_chunks = stco.size
        for run in range(stsc.shape[0]):
            first = int(stsc[run, 0]) - 1
            per = int(stsc[run, 1])
            last = (
                int(stsc[run + 1, 0]) - 1
                if run + 1 < stsc.shape[0]
                else n_chunks
            )
            for chunk in range(first, last):
                base = int(stco[chunk])
                for _ in range(per):
                    if si >= ns:
                        break
                    offsets[si] = base
                    base += int(trk.sample_sizes[si])
                    si += 1
        trk.sample_offsets = offsets[:si] if si < ns else offsets
        if si < ns:  # inconsistent tables: trim to what is addressable
            trk.sample_sizes = trk.sample_sizes[:si]
            trk.sample_ts = trk.sample_ts[:si]


def extract_keyframes(
    blob: bytes, every_n_seconds: float = 1.0
) -> list[tuple[int, float, str, bytes]] | None:
    """Container-level frame sampling: for each target timestamp
    (0, step, 2*step, ...) pick the nearest SYNC sample at-or-before it
    and return (sample_idx, ts_sec, codec, encoded_payload_bytes).
    Deduplicates (one row per chosen sample). None if not parseable."""
    info = parse_mp4(blob)
    if info is None:
        return None
    trk = info.video_track()
    if trk is None or trk.n_samples == 0 or trk.sample_offsets.size == 0:
        return None
    sync = (
        trk.sync_samples
        if trk.sync_samples is not None
        else np.arange(trk.n_samples, dtype=np.int64)
    )
    sync = sync[(sync >= 0) & (sync < trk.sample_ts.size)]
    if sync.size == 0:
        return None
    sync_ts = trk.sample_ts[sync]
    dur = trk.duration_sec
    targets = np.arange(0.0, max(dur, every_n_seconds), every_n_seconds)
    picks = np.searchsorted(sync_ts, targets, side="right") - 1
    picks = np.unique(picks[picks >= 0])
    out = []
    n = len(blob)
    for p in picks:
        si = int(sync[p])
        off = int(trk.sample_offsets[si])
        size = int(trk.sample_sizes[si])
        if off + size > n:
            continue
        out.append(
            (si, float(trk.sample_ts[si]), trk.codec, blob[off : off + size])
        )
    return out or None


def parse_mp4(blob: bytes) -> Mp4Info | None:
    """Total wrapper: malformed/truncated input -> None, never an
    exception escaping into a Spark task."""
    try:
        return _parse_mp4_impl(blob)
    except (IndexError, KeyError, ValueError, ZeroDivisionError,
            RecursionError, struct.error, MemoryError):
        return None
