"""Stdlib-only audio codec: RIFF/WAVE parsing for the multimodal audio
path. Like imagecodec (PNG/BMP/PNM), WAV needs nothing beyond ``struct``
— header metadata parses without touching samples; 8/16/32-bit integer
and 32-bit float PCM decode to normalized float samples; and the three
published COMPRESSED WAV codecs decode too: G.711 µ-law (format 7),
G.711 A-law (format 6) — both vectorized as 256-entry numpy lookup
tables built from the standard formulas — and IMA ADPCM (format 0x11,
block-structured 4-bit differential with the published 89-step table).
Perceptual codecs (MP3/AAC/OGG) genuinely need external libraries and
raise ``NotImplementedError`` at decode time (their container headers
still sniff).

All sample output is float64 in [-1, 1], channel-interleaved exactly as
stored; ``to_mono`` averages channels and ``resample_nearest`` is the
numpy stride-gather twin of imagecodec.resize_nearest. FLAC (lossless,
fully specified) decodes via the ``flaccodec`` sibling through
:func:`decode_audio`; only the perceptual codecs (MP3/AAC/OGG) remain
external-library territory.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "sniff_format",
    "parse_wav_header",
    "decode_wav",
    "decode_audio",
    "encode_wav",
    "to_mono",
    "resample_nearest",
]


def decode_audio(data: bytes):
    """Format-dispatching decode: RIFF/WAVE via :func:`decode_wav`, FLAC
    via the lossless ``flaccodec``; MP3/OGG raise (perceptual codecs need
    an audio library). Returns (channels, sample_rate, float64 samples)."""
    fmt = sniff_format(data)
    if fmt == "wav":
        return decode_wav(data)
    if fmt == "flac":
        from kapacitor_spark.dataprep import flaccodec

        return flaccodec.decode(data)
    if fmt in ("mp3", "ogg"):
        raise NotImplementedError(
            f"{fmt} decode requires an audio library not present in this "
            "container (header sniff still works)"
        )
    raise ValueError("unrecognized audio payload")


# ------------------------------------------------------------------ #
# G.711 µ-law / A-law (the classic Sun reference formulas)
# ------------------------------------------------------------------ #


def _ulaw_decode_table() -> np.ndarray:
    out = np.empty(256, dtype=np.int32)
    for code in range(256):
        u = ~code & 0xFF
        sign = u & 0x80
        exp = (u >> 4) & 0x07
        mant = u & 0x0F
        mag = (((mant << 3) + 0x84) << exp) - 0x84
        out[code] = -mag if sign else mag
    return out


def _alaw_decode_table() -> np.ndarray:
    out = np.empty(256, dtype=np.int32)
    for code in range(256):
        a = code ^ 0x55
        sign = a & 0x80
        exp = (a >> 4) & 0x07
        mant = a & 0x0F
        t = mant << 4
        if exp == 0:
            t += 8
        else:
            t = (t + 0x108) << (exp - 1)
        out[code] = t if sign else -t
    return out


_ULAW_TABLE = _ulaw_decode_table()
_ALAW_TABLE = _alaw_decode_table()


_SEG_UEND = np.array([0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF])
_SEG_AEND = np.array([0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF])


def ulaw_encode(pcm16: np.ndarray) -> np.ndarray:
    """int16 → µ-law bytes (the canonical Sun/ITU linear2ulaw: 14-bit
    domain, bias 33, segment-end search) — vectorized."""
    x = pcm16.astype(np.int32) >> 2
    mask = np.where(x < 0, 0x7F, 0xFF)
    mag = np.minimum(np.where(x < 0, -x, x), 8159) + 33
    seg = np.searchsorted(_SEG_UEND, mag, side="left")
    s7 = np.minimum(seg, 7)
    uval = np.where(seg >= 8, 0x7F, (s7 << 4) | ((mag >> (s7 + 1)) & 0x0F))
    return ((uval ^ mask) & 0xFF).astype(np.uint8)


def alaw_encode(pcm16: np.ndarray) -> np.ndarray:
    """int16 → A-law bytes (Sun/ITU linear2alaw: 13-bit domain, negative
    values fold as -x-1, segments 0/1 share a shift) — vectorized."""
    x = pcm16.astype(np.int32) >> 3
    mask = np.where(x >= 0, 0xD5, 0x55)
    mag = np.where(x >= 0, x, -x - 1)
    seg = np.searchsorted(_SEG_AEND, mag, side="left")
    shift = np.where(seg < 2, 1, np.minimum(seg, 7))
    aval = np.where(
        seg >= 8, 0x7F, (np.minimum(seg, 7) << 4) | ((mag >> shift) & 0x0F)
    )
    return ((aval ^ mask) & 0xFF).astype(np.uint8)


# ------------------------------------------------------------------ #
# IMA ADPCM (WAV format 0x11) — published step/index tables
# ------------------------------------------------------------------ #

_IMA_INDEX = np.array(
    [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32
)
_IMA_STEP = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
], dtype=np.int32)


def _ima_decode_nibbles(nibbles, pred, index):
    """Walk one channel's nibble stream from (pred, index)."""
    out = np.empty(len(nibbles), dtype=np.int32)
    for i, nib in enumerate(nibbles):
        step = int(_IMA_STEP[index])
        diff = step >> 3
        if nib & 1:
            diff += step >> 2
        if nib & 2:
            diff += step >> 1
        if nib & 4:
            diff += step
        if nib & 8:
            diff = -diff
        pred = max(-32768, min(32767, pred + diff))
        index = max(0, min(88, index + int(_IMA_INDEX[nib])))
        out[i] = pred
    return out, pred, index


def _decode_ima_adpcm(raw: bytes, channels: int, block_align: int) -> np.ndarray:
    """All blocks → interleaved int16 frames (spec block layout: 4-byte
    per-channel headers, then 4-byte nibble groups round-robin across
    channels; low nibble first)."""
    frames = []
    # include a trailing PARTIAL block: real encoders commonly end with a
    # short final block whose samples must not be dropped
    for boff in range(0, len(raw), block_align):
        block = raw[boff : boff + block_align]
        if len(block) < 4 * channels:
            break
        chans = []
        for c in range(channels):
            pred, index = struct.unpack_from("<hB", block, c * 4)
            chans.append({"pred": pred, "index": min(index, 88), "out": [pred]})
        pos = 4 * channels
        while pos + 4 * channels <= len(block):
            for c in range(channels):
                group = block[pos + c * 4 : pos + c * 4 + 4]
                nibs = []
                for b in group:
                    nibs.append(b & 0x0F)
                    nibs.append(b >> 4)
                dec, chans[c]["pred"], chans[c]["index"] = _ima_decode_nibbles(
                    nibs, chans[c]["pred"], chans[c]["index"]
                )
                chans[c]["out"].extend(int(v) for v in dec)
            pos += 4 * channels
        n = min(len(ch["out"]) for ch in chans)
        blk = np.empty((n, channels), dtype=np.int32)
        for c in range(channels):
            blk[:, c] = chans[c]["out"][:n]
        frames.append(blk)
    if not frames:
        return np.empty((0, channels), dtype=np.int32)
    return np.concatenate(frames)


def ima_adpcm_encode_mono(pcm16: np.ndarray, block_frames: int = 505) -> tuple[bytes, int]:
    """Mono int16 → IMA ADPCM blocks. Returns (raw, block_align); the
    standard layout (4-byte header + nibbles, 505 samples per 256-byte
    block at the default)."""
    # nibble payload rounds to 4-byte groups per spec
    block_align = 4 + ((block_frames - 1 + 7) // 8) * 4
    out = bytearray()
    x = pcm16.astype(np.int32)
    # seed the step index from the first delta — otherwise the adaptive
    # step spends ~10 samples climbing from 7 and the block head rings
    first_delta = int(abs(x[1] - x[0])) if len(x) > 1 else 0
    index = int(np.searchsorted(_IMA_STEP, max(first_delta, 7)).clip(0, 88))
    pos = 0
    while pos < len(x):
        chunk = x[pos : pos + block_frames]
        pos += block_frames
        pred = int(chunk[0])
        out += struct.pack("<hBB", pred, index, 0)
        nibs = []
        for v in chunk[1:]:
            step = int(_IMA_STEP[index])
            diff = int(v) - pred
            nib = 0
            if diff < 0:
                nib = 8
                diff = -diff
            if diff >= step:
                nib |= 4
                diff -= step
            if diff >= step >> 1:
                nib |= 2
                diff -= step >> 1
            if diff >= step >> 2:
                nib |= 1
            # reconstruct exactly as the decoder will
            d = step >> 3
            if nib & 1:
                d += step >> 2
            if nib & 2:
                d += step >> 1
            if nib & 4:
                d += step
            if nib & 8:
                d = -d
            pred = max(-32768, min(32767, pred + d))
            index = max(0, min(88, index + int(_IMA_INDEX[nib])))
            nibs.append(nib)
        # pad to full 4-byte groups
        payload_nibbles = ((block_align - 4) * 2)
        nibs.extend([0] * (payload_nibbles - len(nibs)))
        for i in range(0, len(nibs), 2):
            out.append((nibs[i + 1] << 4) | nibs[i])
    return bytes(out), block_align


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
    from the fmt/data/fact chunks — header-only, no sample decode.
    n_frames honors the fact chunk (mandatory for compressed formats);
    for IMA ADPCM without one it derives from the block layout."""
    if sniff_format(data) != "wav":
        raise ValueError("not a RIFF/WAVE payload")
    fmt = None
    n_data = 0
    fact_frames = None
    for cid, off, size in _chunks(data):
        if cid == b"fmt ":
            audio_format, channels, rate = struct.unpack("<HHI", data[off : off + 8])
            block_align = struct.unpack("<H", data[off + 12 : off + 14])[0]
            bits = struct.unpack("<H", data[off + 14 : off + 16])[0]
            fmt = (audio_format, channels, rate, bits, block_align)
        elif cid == b"data":
            n_data = size
        elif cid == b"fact" and size >= 4:
            fact_frames = struct.unpack("<I", data[off : off + 4])[0]
    if fmt is None:
        raise ValueError("WAV missing fmt chunk")
    audio_format, channels, rate, bits, block_align = fmt
    if fact_frames is not None:
        n_frames = fact_frames
    elif audio_format == 0x11 and block_align:
        spb = ((block_align - 4 * channels) * 2) // channels + 1
        n_frames = (n_data // block_align) * spb
    else:
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
        elif bits == 24:
            # 3-byte little-endian frames: widen to int32 via a zero pad
            # byte then scale (sign extension falls out of the <i4 view)
            b3 = np.frombuffer(raw[: len(raw) - len(raw) % 3], dtype=np.uint8)
            b3 = b3.reshape(-1, 3)
            padded = np.zeros((b3.shape[0], 4), dtype=np.uint8)
            padded[:, 1:] = b3
            arr = (
                padded.view("<i4")[:, 0].astype(np.float64) / 2147483648.0
            )
        elif bits == 32:
            arr = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
        else:
            raise NotImplementedError(f"{bits}-bit integer PCM")
    elif audio_format == 3 and bits == 32:  # IEEE float
        arr = np.frombuffer(raw, dtype="<f4").astype(np.float64)
    elif audio_format == 7:  # G.711 µ-law — one vectorized table gather
        arr = _ULAW_TABLE[np.frombuffer(raw, dtype=np.uint8)].astype(np.float64) / 32768.0
    elif audio_format == 6:  # G.711 A-law
        arr = _ALAW_TABLE[np.frombuffer(raw, dtype=np.uint8)].astype(np.float64) / 32768.0
    elif audio_format == 0x11:  # IMA ADPCM (block-structured)
        block_align = 0
        for cid, off, size in _chunks(data):
            if cid == b"fmt ":
                block_align = struct.unpack("<H", data[off + 12 : off + 14])[0]
        pcm = _decode_ima_adpcm(raw, channels, block_align)
        pcm = pcm[:n_frames]  # fact chunk truncates block padding
        return channels, rate, pcm.astype(np.float64) / 32768.0
    else:
        raise NotImplementedError(
            f"WAV audio format {audio_format}/{bits}-bit (PCM int 8/16/32, "
            "float32, G.711 µ-law/A-law, and IMA ADPCM supported; "
            "perceptual codecs need an audio library)"
        )
    usable = (len(arr) // channels) * channels
    return channels, rate, arr[:usable].reshape(-1, channels)


def encode_wav(
    samples: np.ndarray, sample_rate: int, bits: int = 16, codec: str = "pcm16"
) -> bytes:
    """float [-1,1] (n_frames, channels) → RIFF/WAVE bytes. ``codec``:
    ``pcm16`` (default), ``ulaw`` / ``alaw`` (G.711), or ``ima_adpcm``
    (mono). Compressed encodes carry the mandatory fact chunk."""
    if samples.ndim == 1:
        samples = samples[:, None]
    if bits != 16:
        raise NotImplementedError("encode_wav quantizes to 16-bit")
    pcm = np.clip(np.round(samples * 32767.0), -32768, 32767).astype("<i2")
    channels = samples.shape[1]
    n_frames = samples.shape[0]
    fact = b""
    if codec == "pcm16":
        audio_format, sample_bits = 1, 16
        raw = pcm.tobytes()
        block_align = channels * 2
    elif codec in ("ulaw", "alaw"):
        audio_format = 7 if codec == "ulaw" else 6
        sample_bits = 8
        enc = ulaw_encode if codec == "ulaw" else alaw_encode
        raw = enc(pcm.reshape(-1)).tobytes()
        block_align = channels
        fact = b"fact" + struct.pack("<II", 4, n_frames)[:8]
    elif codec == "ima_adpcm":
        if channels != 1:
            raise NotImplementedError("ima_adpcm encode is mono")
        audio_format, sample_bits = 0x11, 4
        raw, block_align = ima_adpcm_encode_mono(pcm.reshape(-1))
        fact = b"fact" + struct.pack("<II", 4, n_frames)[:8]
    else:
        raise ValueError(f"unknown codec {codec!r}")
    byte_rate = sample_rate * block_align
    fmt = struct.pack(
        "<HHIIHH", audio_format, channels, sample_rate, byte_rate,
        block_align, sample_bits,
    )
    if audio_format == 0x11:
        # cbSize + wSamplesPerBlock extension the spec requires
        spb = ((block_align - 4) * 2) + 1
        fmt += struct.pack("<HH", 2, spb)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt + fact
    body += b"data" + struct.pack("<I", len(raw)) + raw
    if len(raw) & 1:
        body += b"\x00"  # RIFF even padding
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


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
