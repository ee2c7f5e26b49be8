"""Stdlib-only video container metadata: ISO BMFF (MP4/MOV) box walking
and AVI RIFF headers. Frame DECODE genuinely requires a video library
(H.264/VP9 entropy coding) and is out of scope — but the metadata that
drives the 100 TB planning decisions (dimensions, duration, frame count
→ which frame indices to sample BEFORE decode) parses with ``struct``
alone, completing the image (imagecodec) / audio (audiocodec) / video
metadata triple.
"""

from __future__ import annotations

import struct

__all__ = ["sniff_format", "parse_video_header"]


def sniff_format(data: bytes) -> str | None:
    if len(data) >= 12 and data[4:8] == b"ftyp":
        return "mp4"
    if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        return "avi"
    if data[:4] == b"\x1a\x45\xdf\xa3":
        return "mkv"
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    return None


def _iter_boxes(data: bytes, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        size, btype = struct.unpack(">I4s", data[pos : pos + 8])
        if size == 1:  # 64-bit extended size
            if pos + 16 > end:
                return
            size = struct.unpack(">Q", data[pos + 8 : pos + 16])[0]
            body = pos + 16
        else:
            body = pos + 8
        if size < 8:
            return
        yield btype, body, min(pos + size, end)
        pos += size


def _mp4_header(data: bytes):
    width = height = None
    duration_s = None
    n_frames = None
    for btype, body, bend in _iter_boxes(data, 0, len(data)):
        if btype != b"moov":
            continue
        for b2, o2, e2 in _iter_boxes(data, body, bend):
            if b2 == b"mvhd":
                ver = data[o2]
                if ver == 1:
                    scale, dur = struct.unpack(">IQ", data[o2 + 20 : o2 + 32])
                else:
                    scale, dur = struct.unpack(">II", data[o2 + 12 : o2 + 20])
                if scale:
                    duration_s = dur / scale
            elif b2 == b"trak":
                for b3, o3, e3 in _iter_boxes(data, o2, e2):
                    if b3 == b"tkhd":
                        # width/height are 16.16 fixed point at the box tail
                        w_fx, h_fx = struct.unpack(">II", data[e3 - 8 : e3])
                        w, h = w_fx >> 16, h_fx >> 16
                        if w and h:
                            width, height = w, h
                    elif b3 == b"mdia":
                        # walk to stbl/stsz for the sample (frame) count
                        for b4, o4, e4 in _iter_boxes(data, o3, e3):
                            if b4 != b"minf":
                                continue
                            for b5, o5, e5 in _iter_boxes(data, o4, e4):
                                if b5 != b"stbl":
                                    continue
                                for b6, o6, e6 in _iter_boxes(data, o5, e5):
                                    if b6 == b"stsz":
                                        cnt = struct.unpack(
                                            ">I", data[o6 + 8 : o6 + 12]
                                        )[0]
                                        if cnt:
                                            n_frames = max(n_frames or 0, cnt)
    return width, height, duration_s, n_frames


def _avi_header(data: bytes):
    # RIFF 'AVI ' → LIST hdrl → avih: microsec/frame, total frames, w, h
    pos = 12
    while pos + 8 <= len(data):
        cid, size = struct.unpack("<4sI", data[pos : pos + 8])
        body = pos + 8
        if cid == b"LIST" and data[body : body + 4] == b"hdrl":
            inner = body + 4
            while inner + 8 <= body + size:
                c2, s2 = struct.unpack("<4sI", data[inner : inner + 8])
                if c2 == b"avih":
                    o = inner + 8
                    usec_pf, _, _, _, frames = struct.unpack(
                        "<IIIII", data[o : o + 20]
                    )
                    w, h = struct.unpack("<II", data[o + 32 : o + 40])
                    dur = frames * usec_pf / 1e6 if usec_pf else None
                    return w or None, h or None, dur, frames or None
                inner += 8 + s2 + (s2 & 1)
        pos += 8 + size + (size & 1)
    return None, None, None, None


# ------------------------------------------------------------------ #
# Matroska / EBML (public spec: varint IDs + sizes, master elements)
# ------------------------------------------------------------------ #

_MKV_SEGMENT = 0x18538067
_MKV_INFO = 0x1549A966
_MKV_TIMECODE_SCALE = 0x2AD7B1
_MKV_DURATION = 0x4489
_MKV_TRACKS = 0x1654AE6B
_MKV_TRACK_ENTRY = 0xAE
_MKV_TRACK_TYPE = 0x83
_MKV_VIDEO = 0xE0
_MKV_PIXEL_W = 0xB0
_MKV_PIXEL_H = 0xBA


def _ebml_id(data: bytes, pos: int) -> tuple[int, int]:
    """EBML element ID: length from leading zeros, marker bits KEPT."""
    first = data[pos]
    for n in range(1, 5):
        if first & (0x100 >> n):
            return int.from_bytes(data[pos : pos + n], "big"), pos + n
    raise ValueError("corrupt EBML: bad element id")


def _ebml_size(data: bytes, pos: int) -> tuple[int | None, int]:
    """EBML data size: marker bit STRIPPED; all-ones = unknown size."""
    first = data[pos]
    for n in range(1, 9):
        if first & (0x100 >> n):
            raw = int.from_bytes(data[pos : pos + n], "big")
            raw &= (1 << (7 * n)) - 1
            unknown = raw == (1 << (7 * n)) - 1
            return (None if unknown else raw), pos + n
    raise ValueError("corrupt EBML: bad size")


def _ebml_walk(data: bytes, start: int, end: int):
    pos = start
    while pos < end:
        try:
            eid, pos = _ebml_id(data, pos)
            size, pos = _ebml_size(data, pos)
        except (IndexError, ValueError):
            return
        body_end = end if size is None else min(pos + size, end)
        yield eid, pos, body_end
        if size is None:
            return  # unknown-size element runs to the end
        pos = body_end


def _ebml_uint(data: bytes, start: int, end: int) -> int:
    return int.from_bytes(data[start:end], "big")


def _ebml_float(data: bytes, start: int, end: int) -> float:
    n = end - start
    if n == 4:
        return struct.unpack(">f", data[start:end])[0]
    if n == 8:
        return struct.unpack(">d", data[start:end])[0]
    return float(_ebml_uint(data, start, end))


def _mkv_header(data: bytes):
    width = height = None
    duration_s = None
    scale_ns = 1_000_000  # TimecodeScale default: 1 ms
    duration_tc = None
    for eid, body, bend in _ebml_walk(data, 0, len(data)):
        if eid != _MKV_SEGMENT:
            continue
        for e2, o2, e2end in _ebml_walk(data, body, bend):
            if e2 == _MKV_INFO:
                for e3, o3, e3end in _ebml_walk(data, o2, e2end):
                    if e3 == _MKV_TIMECODE_SCALE:
                        scale_ns = _ebml_uint(data, o3, e3end)
                    elif e3 == _MKV_DURATION:
                        duration_tc = _ebml_float(data, o3, e3end)
            elif e2 == _MKV_TRACKS:
                for e3, o3, e3end in _ebml_walk(data, o2, e2end):
                    if e3 != _MKV_TRACK_ENTRY:
                        continue
                    is_video = False
                    vw = vh = None
                    for e4, o4, e4end in _ebml_walk(data, o3, e3end):
                        if e4 == _MKV_TRACK_TYPE:
                            is_video = _ebml_uint(data, o4, e4end) == 1
                        elif e4 == _MKV_VIDEO:
                            for e5, o5, e5end in _ebml_walk(data, o4, e4end):
                                if e5 == _MKV_PIXEL_W:
                                    vw = _ebml_uint(data, o5, e5end)
                                elif e5 == _MKV_PIXEL_H:
                                    vh = _ebml_uint(data, o5, e5end)
                    if is_video and vw and width is None:
                        width, height = vw, vh
    if duration_tc is not None:
        duration_s = duration_tc * scale_ns / 1e9
    return width, height, duration_s, None  # frame count needs a demux


def _gif_header(data: bytes):
    """Animated-GIF metadata WITHOUT decoding: logical-screen dims from
    the header; frame count and total delay from a block walk that skips
    color tables and LZW sub-blocks by their declared lengths — the
    planning pass stays O(block count), no entropy decode."""
    sw, sh = struct.unpack("<HH", data[6:10])
    pos = 13
    if data[10] & 0x80:
        pos += 3 * (2 << (data[10] & 0x07))
    n_frames, delay_cs = 0, 0
    try:
        while pos < len(data):
            block = data[pos]
            pos += 1
            if block == 0x3B:
                break
            if block == 0x21:
                label = data[pos]
                pos += 1
                if label == 0xF9 and data[pos] >= 4:
                    delay_cs += struct.unpack(
                        "<H", data[pos + 2 : pos + 4]
                    )[0]
                while data[pos] != 0:
                    pos += 1 + data[pos]
                pos += 1
                continue
            if block != 0x2C:
                break
            fpacked = data[pos + 8]
            pos += 9
            if fpacked & 0x80:
                pos += 3 * (2 << (fpacked & 0x07))
            pos += 1  # LZW min code size
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
            n_frames += 1
    except IndexError:
        pass  # truncated tail: report what the walk reached
    return sw, sh, (delay_cs / 100.0) if delay_cs else None, n_frames or None


def parse_video_header(data: bytes):
    """(format, width, height, duration_s, n_frames) from container
    headers alone — MP4/MOV (moov/mvhd/tkhd/stsz box walk), AVI (avih),
    Matroska/MKV (EBML varint walk: Segment → Info TimecodeScale/
    Duration, Tracks → video TrackEntry PixelWidth/Height; frame count
    needs a full demux, so it stays None), and animated GIF (block walk
    sums GCE delays and counts image descriptors, skipping LZW data by
    declared sub-block lengths — no decode)."""
    fmt = sniff_format(data)
    if fmt == "mp4":
        return (fmt, *_mp4_header(data))
    if fmt == "avi":
        return (fmt, *_avi_header(data))
    if fmt == "mkv":
        return (fmt, *_mkv_header(data))
    if fmt == "gif":
        return (fmt, *_gif_header(data))
    raise ValueError("unrecognized video payload")


# ------------------------------------------------------------------ #
# MJPEG-in-AVI demux + mux: the one container+codec combination whose
# frames are FULLY decodable in this environment — each '..dc' chunk is
# a complete baseline/progressive JPEG, so the existing jpegcodec turns
# them into pixels with no external library. This is what upgrades
# video from metadata-only to frame-level perceptual dedup.
# ------------------------------------------------------------------ #


def extract_mjpeg_frames(data: bytes) -> list[tuple[int, bytes]]:
    """Demux an AVI payload into its MJPEG frames.

    Walks RIFF → LIST 'movi' and returns ``(frame_index, jpeg_bytes)``
    for every video chunk (id ``##dc``/``##db``) whose payload starts
    with a JPEG SOI marker. Non-JPEG video chunks (a compressed codec —
    cinepak, H.264 in AVI, ...) raise ``NotImplementedError``: their
    entropy coding genuinely needs a video library, and silently
    skipping them would make near-dup results depend on codec mix.
    Non-video chunks (audio ``##wb``, index ``idx1``) are ignored.
    """
    if sniff_format(data) != "avi":
        raise ValueError("not an AVI payload")
    frames: list[tuple[int, bytes]] = []
    # frame index lives OUTSIDE the LIST walks: a file with several movi
    # LISTs (or 'rec ' grouping LISTs inside movi — interleave hints for
    # 1:1 CD-ROM reads) numbers its frames continuously; a per-LIST reset
    # would alias indices and silently corrupt per-frame-index banding.
    idx = 0

    def walk(start: int, end: int) -> None:
        nonlocal idx
        inner = start
        while inner + 8 <= end:
            c2, s2 = struct.unpack("<4sI", data[inner : inner + 8])
            body = inner + 8
            if c2 == b"LIST" and data[body : body + 4] == b"rec ":
                walk(body + 4, min(body + s2, end))
            elif c2[2:4] in (b"dc", b"db"):
                payload = data[body : body + s2]
                if payload[:2] != b"\xff\xd8":
                    raise NotImplementedError(
                        f"AVI video chunk {c2!r} is not MJPEG "
                        "(no JPEG SOI); compressed video codecs "
                        "need an external library"
                    )
                frames.append((idx, payload))
                idx += 1
            inner = body + s2 + (s2 & 1)

    pos = 12
    while pos + 8 <= len(data):
        cid, size = struct.unpack("<4sI", data[pos : pos + 8])
        body = pos + 8
        if cid == b"LIST" and data[body : body + 4] == b"movi":
            walk(body + 4, min(body + size, len(data)))
        pos += 8 + size + (size & 1)
    return frames


def build_avi_mjpeg(
    width: int, height: int, frames: list[bytes], fps: int = 10
) -> bytes:
    """Mux JPEG frames into a minimal spec-shaped MJPEG AVI (RIFF →
    hdrl[avih + strl[strh 'vids'/'MJPG' + strf BITMAPINFOHEADER]] +
    movi['00dc' chunks]) — the fixture/side of extract_mjpeg_frames, and
    a real writer for pipelines that re-emit sampled clips. Every chunk
    is even-padded per RIFF."""
    for f in frames:
        if f[:2] != b"\xff\xd8":
            raise ValueError("build_avi_mjpeg frames must be JPEG payloads")
    usec_pf = 1_000_000 // max(1, fps)
    n = len(frames)
    avih = b"avih" + struct.pack(
        "<I14I", 56, usec_pf, 0, 0, 0x10, n, 0, 1, 0, width, height, 0, 0, 0, 0
    )
    strh = b"strh" + struct.pack(
        "<I", 56
    ) + b"vidsMJPG" + struct.pack(
        # flags, priority, language, initial_frames, scale, rate, start,
        # length, suggested_buf, quality (-1), sample_size, rcFrame
        "<IHHIIIIIIII4H", 0, 0, 0, 0, 1, fps, 0, n, 0, 0xFFFFFFFF, 0,
        0, 0, width, height,
    )
    # cksize(40) AND biSize(40) are SEPARATE fields: 'strf' + 4-byte RIFF
    # chunk size + 40-byte BITMAPINFOHEADER whose first dword is biSize.
    # (The r8 writer packed one 40 doing double duty — an external parser
    # reading cksize=40 then overran the strl LIST by 4 bytes.)
    strf = b"strf" + struct.pack("<I", 40) + struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG", width * height * 3, 0, 0, 0, 0
    )
    strl = b"LIST" + struct.pack("<I", 4 + len(strh) + len(strf)) + b"strl" + strh + strf
    hdrl = b"LIST" + struct.pack("<I", 4 + len(avih) + len(strl)) + b"hdrl" + avih + strl
    movi = bytearray(b"movi")
    for f in frames:
        movi += b"00dc" + struct.pack("<I", len(f)) + f
        if len(f) & 1:
            movi += b"\x00"
    movi_chunk = b"LIST" + struct.pack("<I", len(movi)) + bytes(movi)
    body = b"AVI " + hdrl + movi_chunk
    return b"RIFF" + struct.pack("<I", len(body)) + body


# ------------------------------------------------------------------ #
# MJPEG-in-MP4: ISO BMFF keeps frames in mdat and describes them via the
# stbl sample tables ('jpeg' VisualSampleEntry in stsd; sizes in stsz;
# chunk offsets in stco/co64; samples-per-chunk runs in stsc). Each
# sample is a complete JPEG, so the same jpegcodec decodes it — video
# perceptual dedup's second real container, reusing the existing box
# walker (_iter_boxes).
# ------------------------------------------------------------------ #

_MP4_JPEG_FORMATS = (b"jpeg", b"mjpa", b"mjpb", b"MJPG", b"mjpg")


def _mp4_video_samples(data: bytes) -> list[tuple[int, int]] | None:
    """(offset, size) per sample for the first VIDEO track, or None when
    no video track exists. Raises NotImplementedError for non-MJPEG video
    sample entries (H.264/VP9/... need an external library)."""
    for btype, body, bend in _iter_boxes(data, 0, len(data)):
        if btype != b"moov":
            continue
        for b2, o2, e2 in _iter_boxes(data, body, bend):
            if b2 != b"trak":
                continue
            samples = _trak_video_samples(data, o2, e2)
            if samples is not None:
                return samples
    return None


def _trak_video_samples(data: bytes, start: int, end: int):
    is_video = False
    stbl = None
    for b3, o3, e3 in _iter_boxes(data, start, end):
        if b3 != b"mdia":
            continue
        for b4, o4, e4 in _iter_boxes(data, o3, e3):
            if b4 == b"hdlr":
                is_video = data[o4 + 8 : o4 + 12] == b"vide"
            elif b4 == b"minf":
                for b5, o5, e5 in _iter_boxes(data, o4, e4):
                    if b5 == b"stbl":
                        stbl = (o5, e5)
    if not is_video or stbl is None:
        return None
    fmt = None
    sizes: list[int] = []
    chunk_offsets: list[int] = []
    stsc: list[tuple[int, int]] = []  # (first_chunk, samples_per_chunk)
    for b6, o6, e6 in _iter_boxes(data, *stbl):
        if b6 == b"stsd":
            n_entries = struct.unpack(">I", data[o6 + 4 : o6 + 8])[0]
            if n_entries:
                fmt = data[o6 + 12 : o6 + 16]
        elif b6 == b"stsz":
            fixed, cnt = struct.unpack(">II", data[o6 + 4 : o6 + 12])
            if fixed:
                sizes = [fixed] * cnt
            else:
                sizes = list(
                    struct.unpack(f">{cnt}I", data[o6 + 12 : o6 + 12 + 4 * cnt])
                )
        elif b6 in (b"stco", b"co64"):
            cnt = struct.unpack(">I", data[o6 + 4 : o6 + 8])[0]
            w = 4 if b6 == b"stco" else 8
            f = "I" if b6 == b"stco" else "Q"
            chunk_offsets = list(
                struct.unpack(f">{cnt}{f}", data[o6 + 8 : o6 + 8 + w * cnt])
            )
        elif b6 == b"stsc":
            cnt = struct.unpack(">I", data[o6 + 4 : o6 + 8])[0]
            for i in range(cnt):
                fc, spc, _sdi = struct.unpack(
                    ">III", data[o6 + 8 + 12 * i : o6 + 20 + 12 * i]
                )
                stsc.append((fc, spc))
    if fmt is None:
        return None
    if fmt not in _MP4_JPEG_FORMATS:
        raise NotImplementedError(
            f"MP4 video sample entry {fmt!r} is not MJPEG; compressed "
            "video codecs need an external library"
        )
    # expand stsc runs: entry i applies from its first_chunk (1-based)
    # until the next entry's first_chunk
    out: list[tuple[int, int]] = []
    si = 0
    for ci, coff in enumerate(chunk_offsets, start=1):
        spc = 0
        for fc, n in stsc:
            if fc <= ci:
                spc = n
            else:
                break
        pos = coff
        for _ in range(spc):
            if si >= len(sizes):
                break
            out.append((pos, sizes[si]))
            pos += sizes[si]
            si += 1
    return out


def _extract_mjpeg_frames_mp4(data: bytes) -> list[tuple[int, bytes]]:
    samples = _mp4_video_samples(data)
    if samples is None:
        raise ValueError("MP4 payload has no video track")
    frames: list[tuple[int, bytes]] = []
    for idx, (off, size) in enumerate(samples):
        payload = data[off : off + size]
        if payload[:2] != b"\xff\xd8":
            raise NotImplementedError(
                "MP4 video sample is not a JPEG (no SOI); compressed "
                "video codecs need an external library"
            )
        frames.append((idx, payload))
    return frames


def extract_frames(data: bytes) -> list[tuple[int, bytes]]:
    """Container-dispatching demux into ``(frame_index, image_bytes)``
    where each payload is a complete single-image stream the
    ``imagecodec`` dispatcher decodes: JPEG for MJPEG in AVI (RIFF movi
    walk) or MP4 (stbl sample tables), and Netpbm P6 for animated GIF
    (r9). GIF is codec and container in one: frames are delta-composed
    (transparency + disposal against the running canvas), so
    reconstruction MUST happen here in the demux hop —
    ``gifcodec.decode_frames`` renders every canvas, and the frames are
    re-wrapped as P6 (a header prepend, no re-encode) to keep the
    per-frame contract. Honest cost note: unlike the MJPEG walks, GIF
    frame SAMPLING cannot skip decode work — every block must compose
    to know any later canvas. Everything else raises — ValueError for
    unknown containers, NotImplementedError for compressed video
    codecs."""
    fmt = sniff_format(data)
    if fmt == "avi":
        return extract_mjpeg_frames(data)
    if fmt == "mp4":
        return _extract_mjpeg_frames_mp4(data)
    if fmt == "gif":
        import numpy as np

        from kapacitor_spark.dataprep import gifcodec, imagecodec

        w, h, frames = gifcodec.decode_frames(data)
        arrs = [
            np.frombuffer(f, dtype=np.uint8).reshape(h, w, 3) for f in frames
        ]
        # GIF carries no colorspace tag; a CLIP whose every canvas has
        # R==G==B everywhere is grayscale — emit P5 so single-channel
        # pipelines see the same channel count as gray MJPEG clips. The
        # decision is per-clip, never per-frame: one solid-color frame
        # inside a color clip must NOT flip channel counts mid-clip
        # (downstream dhash_expr assumes one channel count per corpus).
        gray = all(
            (a[..., 0] == a[..., 1]).all() and (a[..., 1] == a[..., 2]).all()
            for a in arrs
        )
        if gray:
            return [
                (i, imagecodec.encode_ppm(w, h, a[..., 0].tobytes(), 1))
                for i, a in enumerate(arrs)
            ]
        return [
            (i, imagecodec.encode_ppm(w, h, f, channels=3))
            for i, f in enumerate(frames)
        ]
    raise ValueError(f"unsupported video container: {fmt!r}")


def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + btype + body


def build_mp4_mjpeg(
    width: int, height: int, frames: list[bytes], fps: int = 10
) -> bytes:
    """Mux JPEG frames into a minimal spec-shaped MJPEG MP4: ftyp + mdat
    (frames back-to-back) + moov with a single 'vide' track whose stsd
    carries a 'jpeg' VisualSampleEntry and whose stsz/stsc/stco map one
    sample per chunk at absolute file offsets (mdat precedes moov so the
    offsets are known when stco is written). The fixture side of
    _extract_mjpeg_frames_mp4 and a real writer for re-emitted clips."""
    for f in frames:
        if f[:2] != b"\xff\xd8":
            raise ValueError("build_mp4_mjpeg frames must be JPEG payloads")
    n = len(frames)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    mdat = _box(b"mdat", b"".join(frames))
    offsets = []
    pos = len(ftyp) + 8
    for f in frames:
        offsets.append(pos)
        pos += len(f)
    matrix = struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
    timescale, duration = max(1, fps), n
    mvhd = _box(
        b"mvhd",
        b"\x00\x00\x00\x00" + struct.pack(">II", 0, 0)
        + struct.pack(">II", timescale, duration)
        + struct.pack(">i", 0x00010000) + struct.pack(">h", 0x0100)
        + b"\x00" * 10 + matrix + b"\x00" * 24 + struct.pack(">I", 2),
    )
    tkhd = _box(
        b"tkhd",
        b"\x00\x00\x00\x03" + struct.pack(">II", 0, 0)
        + struct.pack(">II", 1, 0) + struct.pack(">I", duration)
        + b"\x00" * 8 + struct.pack(">hhhh", 0, 0, 0, 0) + matrix
        + struct.pack(">II", width << 16, height << 16),
    )
    mdhd = _box(
        b"mdhd",
        b"\x00\x00\x00\x00" + struct.pack(">II", 0, 0)
        + struct.pack(">II", timescale, duration)
        + struct.pack(">Hh", 0x55C4, 0),  # language 'und'
    )
    hdlr = _box(
        b"hdlr",
        b"\x00\x00\x00\x00" + struct.pack(">I", 0) + b"vide"
        + b"\x00" * 12 + b"VideoHandler\x00",
    )
    entry = (
        struct.pack(">I", 86) + b"jpeg" + b"\x00" * 6 + struct.pack(">H", 1)
        + struct.pack(">HH", 0, 0) + b"\x00" * 12
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + struct.pack(">I", 0) + struct.pack(">H", 1)
        + b"\x00" * 32 + struct.pack(">Hh", 24, -1)
    )
    stsd = _box(b"stsd", b"\x00\x00\x00\x00" + struct.pack(">I", 1) + entry)
    stts = _box(
        b"stts", b"\x00\x00\x00\x00" + struct.pack(">III", 1, n, 1)
    )
    stsc = _box(
        b"stsc", b"\x00\x00\x00\x00" + struct.pack(">IIII", 1, 1, 1, 1)
    )
    stsz = _box(
        b"stsz",
        b"\x00\x00\x00\x00" + struct.pack(">II", 0, n)
        + struct.pack(f">{n}I", *[len(f) for f in frames]),
    )
    stco = _box(
        b"stco",
        b"\x00\x00\x00\x00" + struct.pack(">I", n)
        + struct.pack(f">{n}I", *offsets),
    )
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    vmhd = _box(b"vmhd", b"\x00\x00\x00\x01" + b"\x00" * 8)
    dref = _box(
        b"dref",
        b"\x00\x00\x00\x00" + struct.pack(">I", 1)
        + _box(b"url ", b"\x00\x00\x00\x01"),
    )
    dinf = _box(b"dinf", dref)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


__all__ += [
    "extract_mjpeg_frames",
    "build_avi_mjpeg",
    "extract_frames",
    "build_mp4_mjpeg",
]
