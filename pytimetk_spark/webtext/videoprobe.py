"""Codec-bitstream header probes: H.264 SPS, VP8/VP9 keyframe headers.

Extends the container layer (webtext/mp4.py, webtext/webm.py) one level
down WITHOUT needing a pixel codec: the parameter-set / keyframe-header
portions of these bitstreams are pure spec arithmetic — exp-Golomb
coding for H.264 SPS (ITU-T H.264 §7.3.2.1), plain bit fields for the
VP8 uncompressed keyframe header (RFC 6386 §9.1) and the VP9
uncompressed frame header (VP9 bitstream spec §6.2) — no entropy
models or trained probability tables involved (which is exactly why
the full VP8/H.264 PIXEL decode stays a stub: those need ~2k trained
constants plus ffmpeg-scale machinery).

What a 100-TB crawl pipeline gets from this layer: true coded
width/height (container-declared dims lie on anamorphic/cropped
streams), profile and bit depth — the fields used to filter/route
video blobs BEFORE shipping payloads to a GPU decode stage.
``video_stream_info`` surfaces it as a Spark operator over MP4 and
WebM binary columns.
"""

from __future__ import annotations

from collections.abc import Iterator


class _Bits:
    """MSB-first bit reader with optional H.264 emulation-prevention
    (00 00 03 -> 00 00) already stripped by the caller."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def u(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.data[self.pos >> 3] if (self.pos >> 3) < len(
                self.data) else 0
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def ue(self) -> int:  # exp-Golomb unsigned
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 32:
                raise ValueError("bad exp-golomb")
        return (1 << zeros) - 1 + self.u(zeros)

    def se(self) -> int:  # exp-Golomb signed
        k = self.ue()
        return (k + 1) // 2 if k & 1 else -(k // 2)


def _strip_emulation(nal: bytes) -> bytes:
    out = bytearray()
    zeros = 0
    for b in nal:
        if zeros >= 2 and b == 3:
            zeros = 0
            continue  # emulation prevention byte
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


_HIGH_PROFILES = {100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139,
                  134, 135}


def parse_h264_sps(nal: bytes) -> dict | None:
    """Parse an H.264 sequence parameter set NAL (with or without the
    1-byte NAL header) -> profile/level/chroma/bit depth/coded dims."""
    if not nal:
        return None
    if (nal[0] & 0x1F) == 7:  # NAL header present
        nal = nal[1:]
    br = _Bits(_strip_emulation(nal))
    try:
        profile_idc = br.u(8)
        br.u(8)  # constraint flags + reserved
        level_idc = br.u(8)
        br.ue()  # seq_parameter_set_id
        chroma_format_idc = 1
        bit_depth = 8
        if profile_idc in _HIGH_PROFILES:
            chroma_format_idc = br.ue()
            if chroma_format_idc == 3:
                br.u(1)  # separate_colour_plane_flag
            bit_depth = br.ue() + 8
            br.ue()  # bit_depth_chroma_minus8
            br.u(1)  # qpprime_y_zero_transform_bypass
            if br.u(1):  # seq_scaling_matrix_present
                n_lists = 8 if chroma_format_idc != 3 else 12
                for i in range(n_lists):
                    if br.u(1):
                        size = 16 if i < 6 else 64
                        last, nxt = 8, 8
                        for _ in range(size):
                            if nxt != 0:
                                nxt = (last + br.se()) & 0xFF
                            last = nxt if nxt else last
        br.ue()  # log2_max_frame_num_minus4
        poc_type = br.ue()
        if poc_type == 0:
            br.ue()
        elif poc_type == 1:
            br.u(1)
            br.se()
            br.se()
            for _ in range(br.ue()):
                br.se()
        br.ue()  # max_num_ref_frames
        br.u(1)  # gaps_in_frame_num_allowed
        pw_mbs = br.ue() + 1
        ph_units = br.ue() + 1
        frame_mbs_only = br.u(1)
        if not frame_mbs_only:
            br.u(1)  # mb_adaptive_frame_field
        br.u(1)  # direct_8x8_inference
        crop_l = crop_r = crop_t = crop_b = 0
        if br.u(1):  # frame_cropping_flag
            crop_l, crop_r, crop_t, crop_b = (br.ue(), br.ue(), br.ue(),
                                              br.ue())
    except (ValueError, IndexError):
        return None
    sub_w = 1 if chroma_format_idc == 3 else 2
    sub_h = 2 if chroma_format_idc == 1 else 1
    if chroma_format_idc == 0:
        sub_w = sub_h = 1
    crop_x = sub_w
    crop_y = sub_h * (2 - frame_mbs_only)
    width = pw_mbs * 16 - crop_x * (crop_l + crop_r)
    height = (2 - frame_mbs_only) * ph_units * 16 - crop_y * (
        crop_t + crop_b)
    return {
        "profile_idc": profile_idc,
        "level_idc": level_idc,
        "chroma_format_idc": chroma_format_idc,
        "bit_depth": bit_depth,
        "width": width,
        "height": height,
    }


def parse_avcc(avcc: bytes) -> dict | None:
    """AVCDecoderConfigurationRecord -> parsed first SPS."""
    if len(avcc) < 7 or avcc[0] != 1:
        return None
    n_sps = avcc[5] & 0x1F
    pos = 6
    for _ in range(n_sps):
        if pos + 2 > len(avcc):
            return None
        ln = int.from_bytes(avcc[pos : pos + 2], "big")
        pos += 2
        sps = avcc[pos : pos + ln]
        pos += ln
        got = parse_h264_sps(sps)
        if got is not None:
            return got
    return None


def parse_vp8_keyframe(payload: bytes) -> dict | None:
    """VP8 uncompressed keyframe header (RFC 6386 §9.1): 3-byte frame
    tag + 9D 01 2A start code + 14-bit dims with scaling hints."""
    if len(payload) < 10:
        return None
    tag = int.from_bytes(payload[0:3], "little")
    if tag & 1:  # interframe
        return None
    if payload[3:6] != b"\x9d\x01\x2a":
        return None
    w = int.from_bytes(payload[6:8], "little")
    h = int.from_bytes(payload[8:10], "little")
    return {
        "width": w & 0x3FFF,
        "height": h & 0x3FFF,
        "profile": (tag >> 1) & 0x07,
        "bit_depth": 8,
    }


def parse_vp9_keyframe(payload: bytes) -> dict | None:
    """VP9 uncompressed frame header up to frame_size (spec §6.2):
    frame marker, profile bits, sync code, color config, 16-bit dims."""
    br = _Bits(payload)
    try:
        if br.u(2) != 2:  # frame_marker
            return None
        profile = br.u(1) | (br.u(1) << 1)
        if profile == 3:
            br.u(1)  # reserved
        if br.u(1):  # show_existing_frame
            return None
        frame_type = br.u(1)
        br.u(1)  # show_frame
        br.u(1)  # error_resilient
        if frame_type != 0:
            return None  # not a keyframe
        if br.u(24) != 0x498342:  # sync code
            return None
        bit_depth = 8
        if profile >= 2:
            bit_depth = 12 if br.u(1) else 10
        color_space = br.u(3)
        if color_space != 7:  # != CS_RGB
            br.u(1)  # color_range
            if profile in (1, 3):
                br.u(2)  # subsampling_x/y
                br.u(1)  # reserved
        elif profile in (1, 3):
            br.u(1)  # reserved
        width = br.u(16) + 1
        height = br.u(16) + 1
    except IndexError:
        return None
    return {
        "width": width,
        "height": height,
        "profile": profile,
        "bit_depth": bit_depth,
    }


def probe_video_blob(blob: bytes) -> dict | None:
    """One blob -> container + codec + declared and coded geometry."""
    from pytimetk_spark.webtext.mp4 import parse_mp4
    from pytimetk_spark.webtext.webm import parse_webm

    info = parse_mp4(blob)
    if info is not None:
        trk = info.video_track()
        if trk is None:
            return None
        coded = None
        if trk.codec_config is not None and trk.codec_config[0] == "avcC":
            coded = parse_avcc(trk.codec_config[1])
        n_sync = (
            trk.sync_samples.size if trk.sync_samples is not None
            else trk.n_samples
        )
        dur = trk.duration_sec
        return {
            "container": "mp4",
            "codec": trk.codec,
            "width": int(trk.width),
            "height": int(trk.height),
            "coded_width": coded["width"] if coded else None,
            "coded_height": coded["height"] if coded else None,
            "profile": str(coded["profile_idc"]) if coded else None,
            "bit_depth": coded["bit_depth"] if coded else None,
            "duration_sec": dur,
            "n_keyframes": int(n_sync),
            "fps_avg": trk.n_samples / dur if dur else 0.0,
        }
    winfo = parse_webm(blob)
    if winfo is not None:
        trk = winfo.video_track()
        if trk is None:
            return None
        coded = None
        if winfo.keyframes:
            payload = winfo.keyframes[0][1]
            if trk.codec == "V_VP8":
                coded = parse_vp8_keyframe(payload)
            elif trk.codec == "V_VP9":
                coded = parse_vp9_keyframe(payload)
            elif trk.codec == "V_AV1":
                coded = parse_av1_seq_header(payload)
        dur = winfo.duration_sec
        nkf = len(winfo.keyframes)
        return {
            "container": "webm",
            "codec": trk.codec,
            "width": trk.width,
            "height": trk.height,
            "coded_width": coded["width"] if coded else None,
            "coded_height": coded["height"] if coded else None,
            "profile": str(coded["profile"]) if coded else None,
            "bit_depth": coded["bit_depth"] if coded else None,
            "duration_sec": dur,
            "n_keyframes": nkf,
            "fps_avg": winfo.n_video_blocks / dur if dur else 0.0,
        }
    return None


def video_stream_info(df, binary_col: str, id_col: str = "doc_id"):
    """Spark operator: probe MP4/WebM blobs -> per-doc stream metadata
    (declared + bitstream-coded geometry, profile, bit depth, duration,
    keyframe count). Unparseable blobs yield a NULL-codec row instead
    of failing the batch — probing a crawl shard must be total."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("container", T.StringType()),
        T.StructField("codec", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("coded_width", T.IntegerType()),
        T.StructField("coded_height", T.IntegerType()),
        T.StructField("profile", T.StringType()),
        T.StructField("bit_depth", T.IntegerType()),
        T.StructField("duration_sec", T.DoubleType()),
        T.StructField("n_keyframes", T.IntegerType()),
        T.StructField("fps_avg", T.DoubleType()),
    ])

    def probe(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for i, blob in zip(pdf["__id__"], pdf["__bin__"]):
                blob = bytes(blob or b"")
                got = probe_video_blob(blob) or {}
                rows.append((
                    int(i), len(blob),
                    got.get("container"), got.get("codec"),
                    got.get("width"), got.get("height"),
                    got.get("coded_width"), got.get("coded_height"),
                    got.get("profile"), got.get("bit_depth"),
                    got.get("duration_sec"), got.get("n_keyframes"),
                    got.get("fps_avg"),
                ))
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    src = df.select(F.col(id_col).alias("__id__"),
                    F.col(binary_col).alias("__bin__"))
    return src.mapInPandas(probe, schema=schema)


def parse_av1_seq_header(payload: bytes) -> dict | None:
    """Walk AV1 OBUs to the sequence header and read max frame
    geometry (AV1 bitstream spec §5.5): profile, still-picture flags,
    operating points, then frame_width/height_bits and the max dims.
    Streams carrying timing/decoder-model info in the header (rare in
    web files) return None rather than misparse."""
    pos = 0
    n = len(payload)
    while pos < n:
        b0 = payload[pos]
        if b0 & 0x80:
            return None  # forbidden bit
        obu_type = (b0 >> 3) & 0x0F
        ext = (b0 >> 2) & 1
        has_size = (b0 >> 1) & 1
        pos += 1 + (1 if ext else 0)
        size = None
        if has_size:  # leb128
            size = 0
            shift = 0
            while pos < n:
                byte = payload[pos]
                pos += 1
                size |= (byte & 0x7F) << shift
                shift += 7
                if not byte & 0x80:
                    break
        if obu_type == 1:  # OBU_SEQUENCE_HEADER
            br = _Bits(payload[pos:] if size is None
                       else payload[pos : pos + size])
            try:
                profile = br.u(3)
                br.u(1)  # still_picture
                reduced = br.u(1)
                if reduced:
                    br.u(5)  # seq_level_idx_0
                else:
                    if br.u(1):  # timing_info_present: out of scope
                        return None
                    br.u(1)  # initial_display_delay_present (assumed 0
                    # downstream; real streams with it set also carry
                    # per-op delays we'd misparse — they always pair
                    # with decoder model info which we reject above)
                    op_cnt = br.u(5) + 1
                    for _ in range(op_cnt):
                        br.u(12)  # operating_point_idc
                        level = br.u(5)
                        if level > 7:
                            br.u(1)  # seq_tier
                wbits = br.u(4) + 1
                hbits = br.u(4) + 1
                width = br.u(wbits) + 1
                height = br.u(hbits) + 1
            except IndexError:
                return None
            return {"width": width, "height": height, "profile": profile,
                    "bit_depth": 8 if profile < 2 else 10}
        if size is None:
            return None  # can't skip an unsized non-seq OBU
        pos += size
    return None
