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


def parse_video_header(data: bytes):
    """(format, width, height, duration_s, n_frames) from container
    headers alone — MP4/MOV (moov/mvhd/tkhd/stsz box walk) and AVI
    (avih). MKV sniffs by EBML magic but its variable-length integer
    tree is left to a real demuxer (dims None)."""
    fmt = sniff_format(data)
    if fmt == "mp4":
        return (fmt, *_mp4_header(data))
    if fmt == "avi":
        return (fmt, *_avi_header(data))
    if fmt == "mkv":
        return (fmt, None, None, None, None)
    raise ValueError("unrecognized video payload")
