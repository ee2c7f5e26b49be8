"""Stdlib-only audio codec: RIFF/WAVE PCM parsing for the multimodal
audio path. Like imagecodec (PNG/BMP/PNM), WAV needs nothing beyond
``struct`` — header metadata parses without touching samples, and 8/16/
32-bit integer + 32-bit float PCM decode to normalized float samples.
Compressed codecs (MP3/AAC/OGG) genuinely need external libraries and
raise ``NotImplementedError`` at decode time (their container headers
still sniff).

All sample output is float64 in [-1, 1], channel-interleaved exactly as
stored; ``to_mono`` averages channels and ``resample_nearest`` is the
numpy stride-gather twin of imagecodec.resize_nearest.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "sniff_format",
    "parse_wav_header",
    "decode_wav",
    "encode_wav",
    "to_mono",
    "resample_nearest",
]


def sniff_format(data: bytes) -> str | None:
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    if data[:3] == b"ID3" or data[:2] in (b"\xff\xfb", b"\xff\xf3", b"\xff\xf2"):
        return "mp3"
    if data[:4] == b"OggS":
        return "ogg"
    if data[:4] == b"fLaC":
        return "flac"
    return None


def _chunks(data: bytes):
    pos = 12
    while pos + 8 <= len(data):
        cid, size = struct.unpack("<4sI", data[pos : pos + 8])
        yield cid, pos + 8, size
        pos += 8 + size + (size & 1)  # RIFF chunks pad to even


def parse_wav_header(data: bytes):
    """(channels, sample_rate, bits_per_sample, n_frames, audio_format)
    from the fmt/data chunks — header-only, no sample decode."""
    if sniff_format(data) != "wav":
        raise ValueError("not a RIFF/WAVE payload")
    fmt = None
    n_data = 0
    for cid, off, size in _chunks(data):
        if cid == b"fmt ":
            audio_format, channels, rate = struct.unpack("<HHI", data[off : off + 8])
            bits = struct.unpack("<H", data[off + 14 : off + 16])[0]
            fmt = (audio_format, channels, rate, bits)
        elif cid == b"data":
            n_data = size
    if fmt is None:
        raise ValueError("WAV missing fmt chunk")
    audio_format, channels, rate, bits = fmt
    frame_bytes = channels * (bits // 8)
    n_frames = n_data // frame_bytes if frame_bytes else 0
    return channels, rate, bits, n_frames, audio_format


def decode_wav(data: bytes) -> tuple[int, int, np.ndarray]:
    """(channels, sample_rate, float64 samples in [-1, 1], shape
    (n_frames, channels)). PCM 8/16/32-bit int and 32-bit float."""
    channels, rate, bits, n_frames, audio_format = parse_wav_header(data)
    raw = b""
    for cid, off, size in _chunks(data):
        if cid == b"data":
            raw = data[off : off + size]
            break
    if audio_format == 1:  # integer PCM
        if bits == 8:
            arr = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128) / 128.0
        elif bits == 16:
            arr = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
        elif bits == 32:
            arr = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
        else:
            raise NotImplementedError(f"{bits}-bit integer PCM")
    elif audio_format == 3 and bits == 32:  # IEEE float
        arr = np.frombuffer(raw, dtype="<f4").astype(np.float64)
    else:
        raise NotImplementedError(
            f"WAV audio format {audio_format}/{bits}-bit (PCM int 8/16/32 "
            "and float32 supported; compressed codecs need an audio library)"
        )
    usable = (len(arr) // channels) * channels
    return channels, rate, arr[:usable].reshape(-1, channels)


def encode_wav(
    samples: np.ndarray, sample_rate: int, bits: int = 16
) -> bytes:
    """float [-1,1] (n_frames, channels) → 16-bit PCM RIFF/WAVE bytes
    (round-trip tests + resample re-encode)."""
    if samples.ndim == 1:
        samples = samples[:, None]
    if bits != 16:
        raise NotImplementedError("encode_wav emits 16-bit PCM")
    pcm = np.clip(np.round(samples * 32767.0), -32768, 32767).astype("<i2")
    raw = pcm.tobytes()
    channels = samples.shape[1]
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate, channels * 2, 16)
    out = b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(raw)) + b"WAVE"
    out += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(raw)) + raw
    return out


def to_mono(samples: np.ndarray) -> np.ndarray:
    """Average channels → (n_frames,) mono."""
    return samples.mean(axis=1) if samples.ndim == 2 else samples


def resample_nearest(samples: np.ndarray, n_out: int) -> np.ndarray:
    """Nearest-frame resample to ``n_out`` frames (index gather — the
    audio twin of imagecodec.resize_nearest; swap in polyphase filtering
    via an audio library for production fidelity)."""
    n_in = samples.shape[0]
    if n_in == 0 or n_out <= 0:
        return samples[:0]
    idx = (np.arange(n_out) * n_in) // n_out
    return samples[idx]
