"""Worked lossy-codec bindings for the ``decode_fn`` seam (CODECS.md).

The multimodal operators take a caller-injected
``decode_fn(payload: bytes) -> iterable[(frame_idx, image_bytes)]`` for
codecs the stdlib-only layer does not implement (H.264/VP8/VP9/HEVC...).
This module is the WORKED EXAMPLE of wiring a real decoder through that
seam: :func:`ffmpeg_decode_fn` shells out to an ``ffmpeg`` binary
(public CLI contract: ``-i pipe:0 -f image2pipe -vcodec ppm pipe:1``),
whose output is a concatenation of binary Netpbm P6 frames — one of the
formats ``multimodal.decode_full`` already reads — so

    video_dhash_near_dup(df, W, H, decode_fn=ffmpeg_decode_fn())

runs the full near-dup pipeline over H.264/VP9/... clips with NO other
change. No hard dependency: nothing here imports ffmpeg at module load;
the binary is probed only when the returned callable first runs, and a
missing binary raises a clear RuntimeError naming the seam.

The PPM stream splitter is pure and tested standalone; the subprocess
contract is tested end-to-end against a stub binary in every container
and against a real ffmpeg when one is present
(tests/test_decoders.py)."""

from __future__ import annotations

import shutil
import subprocess
from typing import Callable, Iterable, Iterator


def split_ppm_stream(data: bytes) -> list[bytes]:
    """Split a concatenation of binary Netpbm P6 images (ffmpeg's
    ``image2pipe -vcodec ppm`` output) into the individual frames.

    Header grammar per the published Netpbm spec: ``P6``, then width,
    height, maxval as whitespace-separated ASCII decimals with ``#``
    comments allowed between tokens, then ONE whitespace byte, then
    ``width*height*3`` binary bytes (6 per pixel when maxval > 255)."""
    frames: list[bytes] = []
    pos = 0
    n = len(data)
    while pos < n:
        if data[pos:pos + 2] != b"P6":
            raise ValueError(
                f"PPM stream: expected 'P6' magic at offset {pos}, got "
                f"{data[pos:pos + 2]!r}"
            )
        cur = pos + 2
        vals: list[int] = []
        while len(vals) < 3:
            while cur < n and data[cur:cur + 1].isspace():
                cur += 1
            if data[cur:cur + 1] == b"#":
                while cur < n and data[cur] not in (0x0A, 0x0D):
                    cur += 1
                continue
            start = cur
            while cur < n and data[cur:cur + 1].isdigit():
                cur += 1
            if cur == start:
                raise ValueError(f"PPM stream: bad header near offset {cur}")
            vals.append(int(data[start:cur]))
        cur += 1  # the single whitespace byte after maxval
        w, h, maxval = vals
        body = w * h * 3 * (2 if maxval > 255 else 1)
        end = cur + body
        if end > n:
            raise ValueError(
                f"PPM stream: truncated frame at offset {pos} "
                f"(need {body} body bytes, have {n - cur})"
            )
        frames.append(data[pos:end])
        pos = end
    return frames


def fix_wav_stream_sizes(data: bytes) -> bytes:
    """Repair the RIFF and ``data`` chunk sizes of a WAV produced on a
    non-seekable pipe (ffmpeg writes 0xFFFFFFFF placeholders when it
    cannot seek back) so strict parsers read it. Walks the chunk list;
    any chunk whose declared size runs past the buffer is clamped to the
    remaining bytes."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    out = bytearray(data)
    out[4:8] = (len(data) - 8).to_bytes(4, "little")
    pos = 12
    while pos + 8 <= len(out):
        size = int.from_bytes(out[pos + 4:pos + 8], "little")
        avail = len(out) - (pos + 8)
        if size > avail:
            out[pos + 4:pos + 8] = avail.to_bytes(4, "little")
            size = avail
        pos += 8 + size + (size & 1)
    return bytes(out)


def ffmpeg_transcode_audio_fn(
    binary: str = "ffmpeg",
    extra_args: Iterable[str] = (),
    timeout: float = 120.0,
) -> Callable[[bytes], bytes]:
    """An audio ``decode_fn`` for :func:`multimodal.decode_audio_batch` /
    ``audio_dhash_near_dup`` backed by an ffmpeg CLI binary: transcodes
    ANY codec the binary supports (MP3, AAC, OGG/Vorbis, Opus...) to
    16-bit PCM WAV — the format the stdlib ``audiocodec`` already
    decodes — inside the same Arrow hop. Pipe-written WAV sizes are
    repaired (:func:`fix_wav_stream_sizes`) before they reach the strict
    parser. No hard dependency: the binary is probed at call time."""

    def transcode(payload: bytes) -> bytes:
        if shutil.which(binary) is None:
            raise RuntimeError(
                f"decode_fn seam: ffmpeg binary {binary!r} not found — "
                "perceptual audio codecs need a caller-supplied decoder "
                "(CODECS.md scope line)"
            )
        proc = subprocess.run(
            [binary, "-v", "error", "-i", "pipe:0", *extra_args,
             "-f", "wav", "-acodec", "pcm_s16le", "pipe:1"],
            input=payload, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, timeout=timeout,
        )
        if proc.returncode != 0:
            raise RuntimeError(
                f"{binary} failed (rc={proc.returncode}): "
                f"{proc.stderr.decode(errors='replace')[:500]}"
            )
        return fix_wav_stream_sizes(proc.stdout)

    return transcode


def ffmpeg_transcode_image_fn(
    binary: str = "ffmpeg",
    extra_args: Iterable[str] = (),
    timeout: float = 120.0,
) -> Callable[[bytes], bytes]:
    """A single-image ``decode_fn`` for ``multimodal.decode_full`` /
    ``image_{d,p}hash_near_dup``: ffmpeg decodes stills through the same
    image2pipe contract as video — this takes the first (only) frame as
    the transcoded payload. Covers the formats the stdlib codecs
    declare out of scope (lossy WebP, arithmetic JPEG, HEIC/AVIF...)."""
    frames = ffmpeg_decode_fn(binary, extra_args, timeout)

    def transcode(payload: bytes) -> bytes:
        for _, frame in frames(payload):
            return frame
        raise RuntimeError("ffmpeg produced no frames for image payload")

    return transcode


def ffmpeg_decode_fn(
    binary: str = "ffmpeg",
    extra_args: Iterable[str] = (),
    timeout: float = 120.0,
) -> Callable[[bytes], Iterator[tuple[int, bytes]]]:
    """A ``decode_fn`` for :func:`multimodal.extract_video_frames` backed
    by an ffmpeg CLI binary — decodes ANY codec/container the binary
    supports (H.264, VP8/VP9, HEVC, AV1...) to Netpbm P6 frames.

    ``extra_args`` ride between input and output (e.g.
    ``("-vf", "select=not(mod(n\\,5))", "-vsync", "vfr")`` for in-decoder
    frame sampling — cheaper than decoding everything and letting the
    operator's ``every`` drop rows). The callable runs INSIDE the Arrow
    hop on executors, so ``binary`` must be on every executor's PATH (or
    be an absolute path on a shared image)."""

    def decode(payload: bytes) -> Iterator[tuple[int, bytes]]:
        if shutil.which(binary) is None:
            raise RuntimeError(
                f"decode_fn seam: ffmpeg binary {binary!r} not found — "
                "lossy video codecs need a caller-supplied decoder "
                "(CODECS.md scope line)"
            )
        proc = subprocess.run(
            [binary, "-v", "error", "-i", "pipe:0", *extra_args,
             "-f", "image2pipe", "-vcodec", "ppm", "pipe:1"],
            input=payload, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, timeout=timeout,
        )
        if proc.returncode != 0:
            raise RuntimeError(
                f"{binary} failed (rc={proc.returncode}): "
                f"{proc.stderr.decode(errors='replace')[:500]}"
            )
        for i, frame in enumerate(split_ppm_stream(proc.stdout)):
            yield i, frame

    return decode
