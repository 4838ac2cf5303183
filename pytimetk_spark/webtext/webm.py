"""WebM / Matroska (EBML) container parser — frame sampling sans codec.

Same two-layer split as MP4 (webtext/mp4.py): the CONTAINER layer —
EBML element walking, track metadata, cluster timestamps, SimpleBlock /
BlockGroup keyframe flags, encoded payload byte ranges — is a pure
public byte format (RFC 8794 EBML + the Matroska/WebM specs) and is
fully implemented here; the codec bitstream layer (VP8/VP9/AV1 pixel
decode, Opus/Vorbis samples) needs ffmpeg and stays the documented
stub in ``sample_video_frames(decode=True)``.

Supported: EBML header + Segment walking, Info (TimestampScale,
Duration), Tracks (track number/type, CodecID, video PixelWidth/
PixelHeight, audio SamplingFrequency/Channels), Clusters with
SimpleBlocks (keyframe flag bit) and BlockGroups (keyframe = absence
of ReferenceBlock), EBML lacing ignored beyond the first frame (the
keyframe path — video tracks don't lace). Unknown-size elements
(streamed Matroska) return None — out of scope.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field


@dataclass
class WebmTrack:
    number: int = 0
    track_type: int = 0  # 1 = video, 2 = audio
    codec: str = ""
    width: int = 0
    height: int = 0
    sample_rate: float = 0.0
    channels: int = 0


@dataclass
class WebmInfo:
    timestamp_scale_ns: int = 1_000_000
    duration_sec: float = 0.0
    tracks: list[WebmTrack] = field(default_factory=list)
    # video keyframes: (ts_sec, payload bytes)
    keyframes: list[tuple[float, bytes]] = field(default_factory=list)
    n_video_blocks: int = 0  # ALL video frames (keyframes + deltas)

    def video_track(self) -> WebmTrack | None:
        for t in self.tracks:
            if t.track_type == 1:
                return t
        return None


def _vint(blob: bytes, pos: int, keep_marker: bool):
    """Read an EBML variable-length integer at pos -> (value, new_pos),
    or None on truncation/unknown-size. IDs keep the length marker bit;
    sizes strip it."""
    if pos >= len(blob):
        return None
    first = blob[pos]
    if first == 0:
        return None
    length = 8 - first.bit_length() + 1
    if pos + length > len(blob):
        return None
    v = first if keep_marker else first & ((1 << (8 - length)) - 1)
    for i in range(1, length):
        v = (v << 8) | blob[pos + i]
    if not keep_marker:
        # all-ones payload = "unknown size" (streaming): unsupported
        if v == (1 << (7 * length)) - 1:
            return None
    return v, pos + length


def _uint(payload: bytes) -> int:
    v = 0
    for b in payload:
        v = (v << 8) | b
    return v


def _float(payload: bytes) -> float:
    if len(payload) == 4:
        return struct.unpack(">f", payload)[0]
    if len(payload) == 8:
        return struct.unpack(">d", payload)[0]
    return 0.0


def _elements(blob: bytes, pos: int, end: int):
    """Yield (element_id, payload_start, payload_end) inside a master."""
    while pos < end:
        got = _vint(blob, pos, keep_marker=True)
        if got is None:
            return
        eid, pos = got
        got = _vint(blob, pos, keep_marker=False)
        if got is None:
            return
        size, pos = got
        pe = pos + size
        if pe > end:
            return
        yield eid, pos, pe
        pos = pe


def _parse_webm_impl(blob: bytes) -> WebmInfo | None:
    """Parse an EBML/Matroska/WebM blob -> WebmInfo, or None if it is
    not EBML or carries no Segment."""
    if blob[:4] != b"\x1a\x45\xdf\xa3":
        return None
    info = WebmInfo()
    segment = None
    for eid, s, e in _elements(blob, 0, len(blob)):
        if eid == 0x18538067:  # Segment
            segment = (s, e)
            break
    if segment is None:
        return None
    duration_units = 0.0
    video_track_no = None
    for eid, s, e in _elements(blob, segment[0], segment[1]):
        if eid == 0x1549A966:  # Info
            for i2, s2, e2 in _elements(blob, s, e):
                if i2 == 0x2AD7B1:
                    info.timestamp_scale_ns = _uint(blob[s2:e2]) or 1_000_000
                elif i2 == 0x4489:
                    duration_units = _float(blob[s2:e2])
        elif eid == 0x1654AE6B:  # Tracks
            for i2, s2, e2 in _elements(blob, s, e):
                if i2 != 0xAE:  # TrackEntry
                    continue
                trk = WebmTrack()
                for i3, s3, e3 in _elements(blob, s2, e2):
                    if i3 == 0xD7:
                        trk.number = _uint(blob[s3:e3])
                    elif i3 == 0x83:
                        trk.track_type = _uint(blob[s3:e3])
                    elif i3 == 0x86:
                        trk.codec = blob[s3:e3].decode("ascii", "replace")
                    elif i3 == 0xE0:  # Video settings
                        for i4, s4, e4 in _elements(blob, s3, e3):
                            if i4 == 0xB0:
                                trk.width = _uint(blob[s4:e4])
                            elif i4 == 0xBA:
                                trk.height = _uint(blob[s4:e4])
                    elif i3 == 0xE1:  # Audio settings
                        for i4, s4, e4 in _elements(blob, s3, e3):
                            if i4 == 0xB5:
                                trk.sample_rate = _float(blob[s4:e4])
                            elif i4 == 0x9F:
                                trk.channels = _uint(blob[s4:e4])
                info.tracks.append(trk)
                if trk.track_type == 1 and video_track_no is None:
                    video_track_no = trk.number
        elif eid == 0x1F43B675:  # Cluster
            cluster_ts = 0
            for i2, s2, e2 in _elements(blob, s, e):
                if i2 == 0xE7:  # cluster Timestamp
                    cluster_ts = _uint(blob[s2:e2])
                elif i2 == 0xA3:  # SimpleBlock
                    _collect_block(blob, s2, e2, video_track_no,
                                   cluster_ts, info,
                                   keyframe=None)
                elif i2 == 0xA0:  # BlockGroup
                    blk = None
                    has_ref = False
                    for i3, s3, e3 in _elements(blob, s2, e2):
                        if i3 == 0xA1:
                            blk = (s3, e3)
                        elif i3 == 0xFB:
                            has_ref = True
                    if blk is not None:
                        _collect_block(blob, blk[0], blk[1],
                                       video_track_no, cluster_ts, info,
                                       keyframe=not has_ref)
    info.duration_sec = (
        duration_units * info.timestamp_scale_ns / 1e9
    )
    if not info.duration_sec and info.keyframes:
        info.duration_sec = info.keyframes[-1][0]
    return info


def _collect_block(blob, s, e, video_track_no, cluster_ts, info,
                   keyframe):
    """Parse a (Simple)Block header; append video keyframes."""
    got = _vint(blob, s, keep_marker=False)
    if got is None:
        return
    track_no, pos = got
    if pos + 3 > e:
        return
    rel_ts = struct.unpack_from(">h", blob, pos)[0]
    flags = blob[pos + 2]
    pos += 3
    if keyframe is None:  # SimpleBlock: keyframe bit in flags
        keyframe = bool(flags & 0x80)
    if (flags >> 1) & 0x03:  # laced: payload starts after lace headers;
        return  # video keyframes are never laced in practice — skip
    if video_track_no is not None and track_no != video_track_no:
        return
    info.n_video_blocks += 1
    if not keyframe:
        return
    ts = (cluster_ts + rel_ts) * info.timestamp_scale_ns / 1e9
    info.keyframes.append((ts, blob[pos:e]))


def extract_keyframes_webm(
    blob: bytes, every_n_seconds: float = 1.0
) -> list[tuple[int, float, str, bytes]] | None:
    """WebM twin of mp4.extract_keyframes: nearest keyframe at-or-before
    each cadence target -> (idx, ts_sec, codec, payload), deduplicated.
    None if not parseable / no video keyframes."""
    import numpy as np

    info = parse_webm(blob)
    if info is None or not info.keyframes:
        return None
    trk = info.video_track()
    codec = trk.codec if trk is not None else ""
    kts = np.array([t for t, _ in info.keyframes])
    order = np.argsort(kts, kind="stable")
    kts = kts[order]
    dur = max(info.duration_sec, float(kts[-1]))
    targets = np.arange(0.0, max(dur, every_n_seconds), every_n_seconds)
    picks = np.searchsorted(kts, targets, side="right") - 1
    picks = np.unique(picks[picks >= 0])
    out = []
    for p in picks:
        oi = int(order[p])
        ts, payload = info.keyframes[oi]
        out.append((oi, float(ts), codec, payload))
    return out or None


def parse_webm(blob: bytes) -> WebmInfo | None:
    """Total wrapper: malformed/truncated input -> None, never an
    exception escaping into a Spark task."""
    try:
        return _parse_webm_impl(blob)
    except (IndexError, KeyError, ValueError, ZeroDivisionError,
            RecursionError, struct.error, MemoryError):
        return None
