"""The worked ffmpeg decode_fn binding (VERDICT r10 #6): the PPM stream
splitter standalone, the full CLI contract against a stub binary in
every container, and — when a real ffmpeg exists on this box — an
actual H.264 clip decoded through the seam."""

import os
import shutil
import stat
import subprocess

import pytest

from kapacitor_spark.dataprep.decoders import ffmpeg_decode_fn, split_ppm_stream


def _p6(w, h, rgb, comment=False):
    hdr = b"P6\n"
    if comment:
        hdr += b"# made by a test\n"
    hdr += b"%d %d\n255\n" % (w, h)
    return hdr + bytes(rgb) * (w * h)


def test_split_ppm_stream_multiframe_and_comments():
    frames = [
        _p6(4, 3, (10, 20, 30)),
        _p6(2, 2, (200, 0, 0), comment=True),
        _p6(4, 3, (1, 2, 3)),
    ]
    got = split_ppm_stream(b"".join(frames))
    assert got == frames


def test_split_ppm_stream_16bit_maxval():
    f = b"P6\n2 1\n65535\n" + b"\x01\x02" * 6  # 2 bytes/sample
    assert split_ppm_stream(f * 2) == [f, f]


def test_split_ppm_stream_errors():
    with pytest.raises(ValueError, match="magic"):
        split_ppm_stream(b"P5\n1 1\n255\n\x00")
    with pytest.raises(ValueError, match="truncated"):
        split_ppm_stream(_p6(4, 4, (9, 9, 9))[:-5])


@pytest.fixture()
def stub_ffmpeg(tmp_path):
    """A stand-in honoring ffmpeg's CLI contract for the seam: read the
    clip from stdin, write concatenated P6 frames to stdout. The frame
    file encodes two solid-color 8x8 frames."""
    frames = _p6(8, 8, (250, 250, 250)) + _p6(8, 8, (5, 5, 5))
    fpath = tmp_path / "frames.bin"
    fpath.write_bytes(frames)
    script = tmp_path / "stub-ffmpeg"
    script.write_text(f"#!/bin/sh\ncat > /dev/null\ncat {fpath}\n")
    script.chmod(script.stat().st_mode | stat.S_IEXEC)
    return str(script), frames


def test_ffmpeg_decode_fn_contract_via_stub(stub_ffmpeg):
    binary, frames = stub_ffmpeg
    fn = ffmpeg_decode_fn(binary=binary)
    got = list(fn(b"any-compressed-clip-bytes"))
    assert [i for i, _ in got] == [0, 1]
    assert b"".join(f for _, f in got) == frames
    assert all(f.startswith(b"P6") for _, f in got)


def test_ffmpeg_decode_fn_missing_binary_raises():
    fn = ffmpeg_decode_fn(binary="definitely-not-a-binary-xyz")
    with pytest.raises(RuntimeError, match="decode_fn seam"):
        list(fn(b"payload"))


def test_ffmpeg_decode_fn_through_video_dedup(spark, stub_ffmpeg):
    """The binding drives the REAL operator: video_dhash_near_dup with
    decode_fn=ffmpeg_decode_fn(stub) — the exact one-argument change a
    production image with a real ffmpeg would make (CODECS.md)."""
    from pyspark.sql import Row

    from kapacitor_spark.dataprep.multimodal import video_dhash_near_dup

    binary, _ = stub_ffmpeg
    # stub decodes every clip to the same frames -> all pairs near-dup;
    # what this pins is the seam plumbing (subprocess inside the Arrow
    # hop, P6 re-wrap accepted by decode_full, frame-index join keys)
    df = spark.createDataFrame(
        [Row(doc_id=i, payload=bytearray(b"clip-%d" % i)) for i in (1, 2, 3)]
    )
    pairs = video_dhash_near_dup(
        df, width=8, height=8, channels=1, max_hamming=6,
        decode_fn=ffmpeg_decode_fn(binary=binary),
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert got == {(1, 2), (1, 3), (2, 3)}
    assert all(r["agree_frames"] == r["total_frames"] == 2 for r in pairs)


@pytest.mark.skipif(
    shutil.which("ffmpeg") is None,
    reason="no ffmpeg on this box — the stub test above pins the contract",
)
def test_ffmpeg_decode_fn_real_h264(tmp_path):
    """Against a REAL ffmpeg: synthesize an H.264 clip (testsrc) and
    decode it through the seam — non-toy frames, a codec the stdlib
    layer declares permanently out of scope."""
    clip = tmp_path / "clip.mp4"
    subprocess.run(
        ["ffmpeg", "-v", "error", "-f", "lavfi",
         "-i", "testsrc=duration=1:size=64x64:rate=4",
         # faststart: moov atom first, so the clip demuxes from pipe:0
         "-pix_fmt", "yuv420p", "-c:v", "libx264",
         "-movflags", "+faststart", str(clip)],
        check=True,
    )
    fn = ffmpeg_decode_fn()
    got = list(fn(clip.read_bytes()))
    assert len(got) == 4
    for i, (idx, frame) in enumerate(got):
        assert idx == i and frame.startswith(b"P6")
        assert b"64 64" in frame[:32]
