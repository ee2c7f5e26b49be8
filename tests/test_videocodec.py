"""Video container metadata (stdlib-only): hand-built minimal MP4 and
AVI headers parse to (dims, duration, frame count) — the inputs the
frame-sampling planner needs before any decode."""

import os
import struct
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kapacitor_spark.dataprep import videocodec as vc


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I4s", 8 + len(payload), btype) + payload


def _minimal_mp4(w=640, h=360, scale=1000, dur=2500, frames=60) -> bytes:
    ftyp = _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    mvhd = _box(
        b"mvhd",
        b"\x00" + b"\x00" * 3          # version 0 + flags
        + b"\x00" * 8                   # ctime/mtime
        + struct.pack(">II", scale, dur)
        + b"\x00" * 80,
    )
    tkhd = _box(
        b"tkhd",
        b"\x00" + b"\x00" * 3
        + b"\x00" * 72                 # up to the fixed-point dims
        + struct.pack(">II", w << 16, h << 16),
    )
    stsz = _box(b"stsz", b"\x00" * 4 + struct.pack(">II", 0, frames))
    stbl = _box(b"stbl", stsz)
    minf = _box(b"minf", stbl)
    mdia = _box(b"mdia", minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + moov


def _minimal_avi(w=320, h=240, usec_pf=40000, frames=100) -> bytes:
    avih = (
        struct.pack("<IIIII", usec_pf, 0, 0, 0, frames)
        + struct.pack("<III", 0, 0, 0)
        + struct.pack("<II", w, h)
        + b"\x00" * 16
    )
    avih_chunk = b"avih" + struct.pack("<I", len(avih)) + avih
    hdrl = b"LIST" + struct.pack("<I", 4 + len(avih_chunk)) + b"hdrl" + avih_chunk
    return b"RIFF" + struct.pack("<I", 4 + len(hdrl)) + b"AVI " + hdrl


def test_mp4_header():
    data = _minimal_mp4()
    assert vc.sniff_format(data) == "mp4"
    fmt, w, h, dur, frames = vc.parse_video_header(data)
    assert (fmt, w, h, frames) == ("mp4", 640, 360, 60)
    assert dur == pytest.approx(2.5)


def test_avi_header():
    data = _minimal_avi()
    fmt, w, h, dur, frames = vc.parse_video_header(data)
    assert (fmt, w, h, frames) == ("avi", 320, 240, 100)
    assert dur == pytest.approx(4.0)


def test_mkv_sniff_and_unknown():
    fmt, w, h, dur, frames = vc.parse_video_header(b"\x1a\x45\xdf\xa3junk")
    assert fmt == "mkv" and w is None
    with pytest.raises(ValueError):
        vc.parse_video_header(b"not a video")


def test_header_drives_frame_sampling(spark):
    """The 100 TB contract: container metadata (no decode) feeds
    sample_frames' explode plan — frame indices chosen declaratively
    from parsed n_frames."""
    from pyspark.sql import functions as F

    from kapacitor_spark.dataprep.multimodal import sample_frames
    from kapacitor_spark.dataprep.videocodec import parse_video_header

    payloads = [(1, bytearray(_minimal_mp4(frames=25))),
                (2, bytearray(_minimal_avi(frames=7)))]
    df = spark.createDataFrame(payloads, "doc_id long, payload binary")

    @F.udf("long")
    def n_frames_of(b):
        return parse_video_header(bytes(b))[4]

    vid = df.withColumn("n_frames", n_frames_of("payload"))
    out = sample_frames(vid, "n_frames", every=10).select("doc_id", "frame_idx")
    got = {}
    for r in out.collect():
        got.setdefault(r["doc_id"], []).append(r["frame_idx"])
    assert sorted(got[1]) == [0, 10, 20]
    assert sorted(got[2]) == [0]


# ------------------------------------------------------------------ #
# Matroska / EBML
# ------------------------------------------------------------------ #


def _ebml_encode_id(eid):
    n = (eid.bit_length() + 7) // 8
    return eid.to_bytes(n, "big")


def _ebml_encode_size(size):
    # 1-byte form when it fits (marker 0x80), else 2-byte (0x4000)
    if size < 0x7F:
        return bytes([0x80 | size])
    return (0x4000 | size).to_bytes(2, "big")


def _ebml_el(eid, payload):
    return _ebml_encode_id(eid) + _ebml_encode_size(len(payload)) + payload


def _build_mkv(width=640, height=360, scale_ns=1_000_000, duration_tc=2500.0):
    import struct as st

    from kapacitor_spark.dataprep import videocodec as vc

    video = _ebml_el(vc._MKV_PIXEL_W, width.to_bytes(2, "big")) + _ebml_el(
        vc._MKV_PIXEL_H, height.to_bytes(2, "big")
    )
    track = _ebml_el(vc._MKV_TRACK_TYPE, b"\x01") + _ebml_el(vc._MKV_VIDEO, video)
    tracks = _ebml_el(vc._MKV_TRACK_ENTRY, track)
    info = _ebml_el(
        vc._MKV_TIMECODE_SCALE, scale_ns.to_bytes(3, "big")
    ) + _ebml_el(vc._MKV_DURATION, st.pack(">d", duration_tc))
    segment = _ebml_el(vc._MKV_INFO, info) + _ebml_el(vc._MKV_TRACKS, tracks)
    ebml_head = b"\x1a\x45\xdf\xa3" + _ebml_encode_size(0)
    return ebml_head + _ebml_el(vc._MKV_SEGMENT, segment)


def test_mkv_header_parses():
    data = _build_mkv()
    fmt, w, h, dur, n = vc.parse_video_header(data)
    assert (fmt, w, h) == ("mkv", 640, 360)
    assert dur == pytest.approx(2.5)  # 2500 ticks at 1 ms
    assert n is None  # frame count needs a demux — honest


def test_mkv_audio_only_track_ignored():
    from kapacitor_spark.dataprep import videocodec as vc

    track = _ebml_el(vc._MKV_TRACK_TYPE, b"\x02")  # audio
    tracks = _ebml_el(vc._MKV_TRACK_ENTRY, track)
    segment = _ebml_el(vc._MKV_TRACKS, tracks)
    data = b"\x1a\x45\xdf\xa3" + _ebml_encode_size(0) + _ebml_el(
        vc._MKV_SEGMENT, segment
    )
    fmt, w, h, dur, n = vc.parse_video_header(data)
    assert (fmt, w, h, dur, n) == ("mkv", None, None, None, None)


def test_mkv_custom_timecode_scale():
    data = _build_mkv(scale_ns=500_000, duration_tc=1000.0)
    fmt, w, h, dur, n = vc.parse_video_header(data)
    assert dur == pytest.approx(0.5)


# ------------------------------------------------------------------ #
# MJPEG-in-AVI demux/mux + frame-level perceptual dedup (r8)
# ------------------------------------------------------------------ #


def _jpeg_frame(seed: str, w: int = 16, h: int = 16) -> bytes:
    import hashlib

    from kapacitor_spark.dataprep import jpegcodec

    pix = b"".join(
        hashlib.md5(f"{seed}:{j}".encode()).digest() for j in range(w * h // 16)
    )
    return jpegcodec.encode(w, h, pix, channels=1, quality=90)


def test_avi_mjpeg_mux_demux_roundtrip():
    from kapacitor_spark.dataprep import videocodec

    frames = [_jpeg_frame(f"f{i}") for i in range(4)]
    avi = videocodec.build_avi_mjpeg(16, 16, frames, fps=8)
    fmt, w, h, dur, n = videocodec.parse_video_header(avi)
    assert (fmt, w, h, n) == ("avi", 16, 16, 4)
    assert abs(dur - 0.5) < 1e-6
    got = videocodec.extract_mjpeg_frames(avi)
    assert [i for i, _ in got] == [0, 1, 2, 3]
    assert [b for _, b in got] == frames  # byte-exact, even with odd-length padding


def test_avi_non_mjpeg_chunk_raises():
    import struct

    from kapacitor_spark.dataprep import videocodec

    frames = [_jpeg_frame("x")]
    avi = bytearray(videocodec.build_avi_mjpeg(16, 16, frames))
    # corrupt the frame payload's SOI: now it's a "compressed codec" chunk
    soi = avi.find(b"\xff\xd8", 100)
    avi[soi:soi + 2] = b"\x00\x00"
    import pytest as _pytest

    with _pytest.raises(NotImplementedError, match="MJPEG"):
        videocodec.extract_mjpeg_frames(bytes(avi))
    with _pytest.raises(ValueError):
        videocodec.extract_mjpeg_frames(b"RIFF\x00\x00\x00\x00WAVE")


def test_extract_video_frames_samples_before_decode(spark):
    from kapacitor_spark.dataprep import videocodec
    from kapacitor_spark.dataprep.multimodal import extract_video_frames

    frames = [_jpeg_frame(f"s{i}") for i in range(6)]
    avi = videocodec.build_avi_mjpeg(16, 16, frames, fps=10)
    df = spark.createDataFrame([(1, bytearray(avi))], "doc_id long, payload binary")
    got = extract_video_frames(df, every=2).orderBy("frame_idx").collect()
    assert [r["frame_idx"] for r in got] == [0, 2, 4]
    assert [bytes(r["frame"]) for r in got] == [frames[0], frames[2], frames[4]]


def test_video_dhash_near_dup_majority(spark):
    """Three clips: A and B share 3 of 5 frames (majority → pair),
    C shares only 1 of 5 with A (1 ≤ 2.5 → no pair)."""
    from kapacitor_spark.dataprep import videocodec
    from kapacitor_spark.dataprep.multimodal import video_dhash_near_dup

    sh = [_jpeg_frame(f"shared{i}") for i in range(3)]
    mk = lambda seeds: videocodec.build_avi_mjpeg(
        16, 16, [s if isinstance(s, bytes) else _jpeg_frame(s) for s in seeds]
    )
    a = mk([sh[0], sh[1], sh[2], "a3", "a4"])
    b = mk([sh[0], sh[1], sh[2], "b3", "b4"])
    c = mk([sh[0], "c1", "c2", "c3", "c4"])
    df = spark.createDataFrame(
        [(1, bytearray(a)), (2, bytearray(b)), (3, bytearray(c))],
        "doc_id long, payload binary",
    )
    got = {
        (r["id_a"], r["id_b"]): (r["agree_frames"], r["total_frames"])
        for r in video_dhash_near_dup(df, width=16, height=16).collect()
    }
    assert got == {(1, 2): (3, 5)}


def test_video_dhash_survives_reencode(spark):
    """The point of PERCEPTUAL frame hashing: a re-encoded copy (quality
    90 → 75, different bytes, same content) still pairs with the
    original — exact payload hashing never catches this."""
    import hashlib

    from kapacitor_spark.dataprep import jpegcodec, videocodec
    from kapacitor_spark.dataprep.multimodal import video_dhash_near_dup

    pix = [
        b"".join(hashlib.md5(f"re{i}:{j}".encode()).digest() for j in range(16))
        for i in range(3)
    ]
    v1 = videocodec.build_avi_mjpeg(
        16, 16, [jpegcodec.encode(16, 16, p, channels=1, quality=90) for p in pix]
    )
    v2 = videocodec.build_avi_mjpeg(
        16, 16, [jpegcodec.encode(16, 16, p, channels=1, quality=75) for p in pix]
    )
    assert v1 != v2
    df = spark.createDataFrame(
        [(10, bytearray(v1)), (20, bytearray(v2))], "doc_id long, payload binary"
    )
    got = video_dhash_near_dup(df, width=16, height=16, max_hamming=6).collect()
    assert [(r["id_a"], r["id_b"], r["total_frames"]) for r in got] == [(10, 20, 3)]


def test_mp4_mjpeg_mux_demux_roundtrip():
    from kapacitor_spark.dataprep import videocodec

    frames = [_jpeg_frame(f"m{i}") for i in range(5)]
    mp4 = videocodec.build_mp4_mjpeg(16, 16, frames, fps=10)
    fmt, w, h, dur, n = videocodec.parse_video_header(mp4)
    assert (fmt, w, h, n) == ("mp4", 16, 16, 5)
    assert abs(dur - 0.5) < 1e-6
    got = videocodec.extract_frames(mp4)
    assert [i for i, _ in got] == [0, 1, 2, 3, 4]
    assert [b for _, b in got] == frames  # byte-exact via stsz/stco offsets


def test_extract_frames_dispatches_and_rejects():
    import pytest

    from kapacitor_spark.dataprep import videocodec

    frames = [_jpeg_frame(f"d{i}") for i in range(2)]
    avi = videocodec.build_avi_mjpeg(16, 16, frames)
    mp4 = videocodec.build_mp4_mjpeg(16, 16, frames)
    assert [b for _, b in videocodec.extract_frames(avi)] == frames
    assert [b for _, b in videocodec.extract_frames(mp4)] == frames
    with pytest.raises(ValueError):
        videocodec.extract_frames(b"\x1a\x45\xdf\xa3 not mjpeg-capable")
    # an H.264-style sample entry must raise, not silently skip
    bad = bytearray(mp4)
    i = bad.find(b"jpeg", 16)  # the stsd entry format (skip ftyp brands)
    bad[i : i + 4] = b"avc1"
    with pytest.raises(NotImplementedError):
        videocodec.extract_frames(bytes(bad))


def test_avi_strf_chunk_walks_externally():
    """Spec shape: an external parser walking strl by DECLARED chunk
    sizes must land exactly on the LIST end and read a 40-byte
    BITMAPINFOHEADER whose biSize dword is present (the r8 writer
    overloaded one 40 as both cksize and biSize, overrunning by 4)."""
    import struct

    from kapacitor_spark.dataprep import videocodec

    avi = videocodec.build_avi_mjpeg(32, 8, [_jpeg_frame("s", 32, 8)], fps=5)
    # find LIST strl inside LIST hdrl
    pos = 12
    strl = None
    while pos + 8 <= len(avi):
        cid, size = struct.unpack("<4sI", avi[pos : pos + 8])
        if cid == b"LIST" and avi[pos + 8 : pos + 12] == b"hdrl":
            inner = pos + 12
            while inner + 8 <= pos + 8 + size:
                c2, s2 = struct.unpack("<4sI", avi[inner : inner + 8])
                if c2 == b"LIST" and avi[inner + 8 : inner + 12] == b"strl":
                    strl = (inner + 12, inner + 8 + s2)
                inner += 8 + s2 + (s2 & 1)
        pos += 8 + size + (size & 1)
    assert strl is not None
    walked = {}
    p, end = strl
    while p + 8 <= end:
        c, s = struct.unpack("<4sI", avi[p : p + 8])
        walked[c] = avi[p + 8 : p + 8 + s]
        p += 8 + s + (s & 1)
    assert p == end  # declared sizes consume the LIST exactly
    assert set(walked) == {b"strh", b"strf"}
    bih = walked[b"strf"]
    assert len(bih) == 40
    bi_size, w, h, planes, depth, comp = struct.unpack("<IiiHH4s", bih[:20])
    assert (bi_size, w, h, planes, depth, comp) == (40, 32, 8, 1, 24, b"MJPG")


def test_multiple_movi_and_rec_lists_index_continuously():
    import struct

    from kapacitor_spark.dataprep import videocodec

    frames = [_jpeg_frame(f"r{i}") for i in range(4)]

    def chunk(f):
        return b"00dc" + struct.pack("<I", len(f)) + f + (b"\x00" if len(f) & 1 else b"")

    # movi #1: frame0 + LIST 'rec '(frame1); movi #2: frame2, frame3
    rec = b"rec " + chunk(frames[1])
    movi1 = b"movi" + chunk(frames[0]) + b"LIST" + struct.pack("<I", len(rec)) + rec
    movi2 = b"movi" + chunk(frames[2]) + chunk(frames[3])
    body = (
        b"AVI "
        + b"LIST" + struct.pack("<I", len(movi1)) + movi1
        + b"LIST" + struct.pack("<I", len(movi2)) + movi2
    )
    avi = b"RIFF" + struct.pack("<I", len(body)) + body
    got = videocodec.extract_mjpeg_frames(avi)
    assert [i for i, _ in got] == [0, 1, 2, 3]  # no per-LIST reset
    assert [b for _, b in got] == frames


def test_video_dhash_mixed_containers(spark):
    """The same clip re-encoded at different JPEG quality in DIFFERENT
    containers (AVI vs MP4) must still pair — the demux dispatch is
    per-row inside one Arrow hop."""
    import hashlib

    from kapacitor_spark.dataprep import jpegcodec, videocodec
    from kapacitor_spark.dataprep.multimodal import video_dhash_near_dup

    pix = [
        b"".join(hashlib.md5(f"mx{i}:{j}".encode()).digest() for j in range(16))
        for i in range(3)
    ]
    avi = videocodec.build_avi_mjpeg(
        16, 16, [jpegcodec.encode(16, 16, p, channels=1, quality=90) for p in pix]
    )
    mp4 = videocodec.build_mp4_mjpeg(
        16, 16, [jpegcodec.encode(16, 16, p, channels=1, quality=75) for p in pix]
    )
    df = spark.createDataFrame(
        [(1, bytearray(avi)), (2, bytearray(mp4))], "doc_id long, payload binary"
    )
    got = video_dhash_near_dup(df, width=16, height=16, max_hamming=6).collect()
    assert [(r["id_a"], r["id_b"], r["total_frames"]) for r in got] == [(1, 2, 3)]


def test_extract_frames_gif_animation():
    """Animated GIF is the third fully-decodable container (r9): the
    demux composes canvases (gifcodec.decode_frames) and emits Netpbm
    payloads the imagecodec dispatcher decodes — P5 when the canvas is
    grayscale, P6 otherwise."""
    import numpy as np

    from kapacitor_spark.dataprep import gifcodec, imagecodec, videocodec

    rng = np.random.RandomState(5)
    gray = [rng.randint(0, 256, (16, 16, 1), dtype=np.uint8).tobytes()
            for _ in range(3)]
    gif = gifcodec.encode_frames(16, 16, gray, channels=1)
    assert videocodec.sniff_format(gif) == "gif"
    got = videocodec.extract_frames(gif)
    assert [i for i, _ in got] == [0, 1, 2]
    for (_, payload), orig in zip(got, gray):
        w, h, c, pix = imagecodec.decode(payload)
        assert (w, h, c) == (16, 16, 1) and pix == orig
    color = [rng.randint(0, 256, (8, 8, 3), dtype=np.uint8).tobytes()
             for _ in range(2)]
    gif_c = gifcodec.encode_frames(8, 8, color, channels=3)
    for (_, payload), orig in zip(videocodec.extract_frames(gif_c), color):
        w, h, c, pix = imagecodec.decode(payload)
        assert (w, h, c) == (8, 8, 3) and pix == orig


def test_video_dhash_gif_vs_mjpeg_container(spark):
    """A GIF clip built from the JPEG-decoded pixels of an MJPEG clip
    must pair with it — cross-codec perceptual agreement, Hamming 0 on
    every co-sampled frame."""
    import hashlib

    from kapacitor_spark.dataprep import gifcodec, jpegcodec, videocodec
    from kapacitor_spark.dataprep.multimodal import video_dhash_near_dup

    pix = [
        b"".join(hashlib.md5(f"gm{i}:{j}".encode()).digest() for j in range(16))
        for i in range(3)
    ]
    jpegs = [jpegcodec.encode(16, 16, p, channels=1, quality=90) for p in pix]
    avi = videocodec.build_avi_mjpeg(16, 16, jpegs)
    gif = gifcodec.encode_frames(
        16, 16, [jpegcodec.decode(j)[3] for j in jpegs], channels=1
    )
    df = spark.createDataFrame(
        [(1, bytearray(avi)), (2, bytearray(gif))], "doc_id long, payload binary"
    )
    got = video_dhash_near_dup(df, width=16, height=16, max_hamming=6).collect()
    assert [(r["id_a"], r["id_b"], r["agree_frames"], r["total_frames"])
            for r in got] == [(1, 2, 3, 3)]


def test_parse_video_header_gif_no_decode():
    """GIF metadata comes from a block walk that never touches LZW data:
    dims, frame count, and summed GCE delay."""
    import numpy as np

    from kapacitor_spark.dataprep import gifcodec, videocodec

    rng = np.random.RandomState(9)
    frames = [rng.randint(0, 256, (4, 6, 1), dtype=np.uint8).tobytes()
              for _ in range(5)]
    gif = gifcodec.encode_frames(6, 4, frames, channels=1,
                                 delays=[10, 10, 10, 10, 10])
    fmt, w, h, dur, n = videocodec.parse_video_header(gif)
    assert (fmt, w, h, n) == ("gif", 6, 4, 5)
    assert abs(dur - 0.5) < 1e-9


def test_gif_channel_decision_is_per_clip():
    """A color clip containing one solid (R==G==B) frame must emit ALL
    frames as P6 — a per-frame grayscale decision would flip channel
    counts mid-clip and break fixed-channel dHash pipelines."""
    import numpy as np

    from kapacitor_spark.dataprep import gifcodec, imagecodec, videocodec

    rng = np.random.RandomState(21)
    solid = np.full((4, 4, 3), 7, dtype=np.uint8).tobytes()  # gray frame
    color = rng.randint(0, 256, (4, 4, 3), dtype=np.uint8).tobytes()
    gif = gifcodec.encode_frames(4, 4, [solid, color], channels=3)
    decoded = [imagecodec.decode(p) for _, p in videocodec.extract_frames(gif)]
    assert [c for _, _, c, _ in decoded] == [3, 3]
    # an all-gray clip still collapses to P5
    gray = [np.full((4, 4, 3), v, dtype=np.uint8).tobytes() for v in (3, 9)]
    gif2 = gifcodec.encode_frames(4, 4, gray, channels=3)
    decoded2 = [imagecodec.decode(p) for _, p in videocodec.extract_frames(gif2)]
    assert [c for _, _, c, _ in decoded2] == [1, 1]


def test_injected_decoder_seam_end_to_end(spark):
    """CODECS.md scope line (r10): a FOREIGN container format the
    built-in walks reject flows through video_dhash_near_dup when the
    caller injects its decoder — the permanent boundary for lossy
    codecs (H.264/VP9...): the runtime supplies the decode, this repo
    supplies the identical Spark plumbing (Arrow hop, frame sampling,
    per-frame dHash, banding, majority vote).

    The planted 'codec': payload = b'TOYV' + width + height + raw gray
    frames; two clips share frame content (near-dup), one differs."""
    import numpy as np
    from pyspark.sql import Row

    from kapacitor_spark.dataprep import videocodec
    from kapacitor_spark.dataprep.multimodal import video_dhash_near_dup

    W = H = 16
    rng = np.random.RandomState(5)
    base = [rng.randint(0, 256, (H, W), dtype=np.uint8) for _ in range(3)]
    other = [rng.randint(0, 256, (H, W), dtype=np.uint8) for _ in range(3)]

    def toy_encode(frames):
        out = b"TOYV" + struct.pack("<HH", W, H)
        for f in frames:
            out += f.tobytes()
        return out

    # near-dup of base: flip one pixel by 1 in each frame
    tweaked = [f.copy() for f in base]
    for f in tweaked:
        f[0, 0] ^= 1
    clips = [
        (1, toy_encode(base)),
        (2, toy_encode(tweaked)),
        (3, toy_encode(other)),
    ]
    # the built-in walk rejects the foreign container
    with pytest.raises(ValueError, match="unsupported video container"):
        videocodec.extract_frames(clips[0][1])

    def toy_decoder(payload: bytes):
        assert payload[:4] == b"TOYV"
        w, h = struct.unpack("<HH", payload[4:8])
        body = payload[8:]
        fsize = w * h
        for i in range(len(body) // fsize):
            raw = body[i * fsize : (i + 1) * fsize]
            yield i, b"P5\n%d %d\n255\n" % (w, h) + raw  # Netpbm re-wrap

    df = spark.createDataFrame(
        [Row(doc_id=i, payload=bytearray(p)) for i, p in clips]
    )
    pairs = video_dhash_near_dup(
        df, width=W, height=H, channels=1, max_hamming=6, decode_fn=toy_decoder
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (1, 2) in got
    assert all(3 not in p for p in got)
    row = next(r for r in pairs if (r["id_a"], r["id_b"]) == (1, 2))
    assert row["total_frames"] == 3 and row["agree_frames"] == 3
