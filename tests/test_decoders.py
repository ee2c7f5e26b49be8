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


def _wav_fixture(freq=440.0, frames=4000):
    import numpy as np

    from kapacitor_spark.dataprep.audiocodec import encode_wav

    t = np.arange(frames) / 8000.0
    return encode_wav(0.5 * np.sin(2 * np.pi * freq * t), 8000)


def _pipe_style(wav: bytes) -> bytes:
    """Corrupt the sizes the way a non-seekable ffmpeg pipe leaves them."""
    out = bytearray(wav)
    out[4:8] = b"\xff\xff\xff\xff"
    i = wav.index(b"data")
    out[i + 4:i + 8] = b"\xff\xff\xff\xff"
    return bytes(out)


def test_fix_wav_stream_sizes_repairs_pipe_output():
    from kapacitor_spark.dataprep.audiocodec import decode_audio
    from kapacitor_spark.dataprep.decoders import fix_wav_stream_sizes

    wav = _wav_fixture()
    broken = _pipe_style(wav)
    # (the stdlib parser happens to clamp the placeholders itself; the
    # fixer guarantees the repaired bytes are ALSO valid for strict
    # parsers and re-serialization)
    fixed = fix_wav_stream_sizes(broken)
    assert fixed[4:8] == (len(wav) - 8).to_bytes(4, "little")
    i = wav.index(b"data")
    assert fixed[i + 4:i + 8] == wav[i + 4:i + 8]  # true data size restored
    ch, rate, samples = decode_audio(fixed)
    ch0, rate0, samples0 = decode_audio(wav)
    assert (ch, rate) == (ch0, rate0) and (samples == samples0).all()
    with pytest.raises(ValueError, match="RIFF"):
        fix_wav_stream_sizes(b"not a wav at all")


@pytest.fixture()
def stub_ffmpeg_audio(tmp_path):
    """Audio stand-in for the CLI contract: reads the 'compressed' clip
    from stdin, writes pipe-style WAV (placeholder sizes) to stdout —
    exactly what a real non-seekable ffmpeg emits."""
    broken = _pipe_style(_wav_fixture())
    fpath = tmp_path / "out.wav"
    fpath.write_bytes(broken)
    script = tmp_path / "stub-ffmpeg-audio"
    script.write_text(f"#!/bin/sh\ncat > /dev/null\ncat {fpath}\n")
    script.chmod(script.stat().st_mode | stat.S_IEXEC)
    return str(script)


def test_ffmpeg_transcode_audio_through_audio_dedup(spark, stub_ffmpeg_audio):
    """The audio leg of the seam drives the REAL operator:
    audio_dhash_near_dup(decode_fn=ffmpeg_transcode_audio_fn(stub)) —
    pipe-size fixup + transcode happen inside the Arrow decode hop."""
    from pyspark.sql import Row

    from kapacitor_spark.dataprep.decoders import ffmpeg_transcode_audio_fn
    from kapacitor_spark.dataprep.multimodal import audio_dhash_near_dup

    df = spark.createDataFrame(
        [Row(doc_id=i, payload=bytearray(b"mp3ish-%d" % i)) for i in (1, 2, 3)]
    )
    pairs = audio_dhash_near_dup(
        df, decode_fn=ffmpeg_transcode_audio_fn(binary=stub_ffmpeg_audio),
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert got == {(1, 2), (1, 3), (2, 3)}
    assert all(r["hamming"] == 0 for r in pairs)


def test_ffmpeg_transcode_image_through_image_dedup(spark, stub_ffmpeg):
    """The IMAGE leg of the seam drives the real operator:
    image_dhash_near_dup(decode_fn=ffmpeg_transcode_image_fn(stub)) —
    foreign still formats transcode to PPM inside the Arrow decode hop
    (the stub emits the video fixture; the first frame is the image)."""
    from pyspark.sql import Row

    from kapacitor_spark.dataprep.decoders import ffmpeg_transcode_image_fn
    from kapacitor_spark.dataprep.multimodal import image_dhash_near_dup

    binary, _ = stub_ffmpeg
    df = spark.createDataFrame(
        [Row(doc_id=i, payload=bytearray(b"webp-ish-%d" % i)) for i in (1, 2)]
    )
    pairs = image_dhash_near_dup(
        df, width=8, height=8, fake=False,
        decode_fn=ffmpeg_transcode_image_fn(binary=binary),
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(1, 2)}
    assert all(r["hamming"] == 0 for r in pairs)


@pytest.mark.skipif(
    shutil.which("ffmpeg") is None,
    reason="no ffmpeg on this box — the stub tests above pin the contract",
)
def test_ffmpeg_transcode_audio_real_mp3(tmp_path):
    """Against a REAL ffmpeg: synthesize an MP3 sine and transcode it
    through the seam into the stdlib WAV decoder."""
    import numpy as np

    from kapacitor_spark.dataprep.audiocodec import decode_audio
    from kapacitor_spark.dataprep.decoders import ffmpeg_transcode_audio_fn

    clip = tmp_path / "tone.mp3"
    enc = subprocess.run(
        ["ffmpeg", "-v", "error", "-f", "lavfi",
         "-i", "sine=frequency=440:duration=0.5:sample_rate=8000",
         str(clip)],
        capture_output=True,
    )
    if enc.returncode != 0:
        pytest.skip(f"ffmpeg lacks an mp3 encoder: {enc.stderr[:120]!r}")
    wav = ffmpeg_transcode_audio_fn()(clip.read_bytes())
    ch, rate, samples = decode_audio(wav)
    assert ch == 1 and rate == 8000 and len(samples) > 3000
    x = samples.reshape(-1).astype(float) / 32768.0
    # a 440 Hz tone dominates: zero-crossing rate ~= 2 * f / rate
    zc = int(((x[:-1] * x[1:]) < 0).sum())
    assert abs(zc / (len(x) / 8000.0) - 880) < 90


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
