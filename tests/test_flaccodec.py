"""FLAC codec (dataprep/flaccodec.py): lossless round-trip laws plus
hand-built frames exercising the decoder features the encoder doesn't
emit — CONSTANT and LPC subframes, stereo decorrelation modes, Rice
escape partitions, and multi-partition residuals."""

import os
import struct
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kapacitor_spark.dataprep import flaccodec as FL
from kapacitor_spark.dataprep.flaccodec import _BitWriter, _crc8, _crc16


def _quant(sig, bits=16):
    return np.clip(np.round(sig * ((1 << (bits - 1)) - 1)),
                   -(1 << (bits - 1)), (1 << (bits - 1)) - 1).astype(np.int64)


@pytest.mark.parametrize("channels", [1, 2])
def test_lossless_roundtrip(channels):
    t = np.arange(9000) / 8000.0
    cols = [0.6 * np.sin(2 * np.pi * 440 * t), 0.25 * np.cos(2 * np.pi * 97 * t)]
    sig = np.stack(cols[:channels], axis=1)
    data = FL.encode(sig, 8000, bits=16)
    ch, sr, out = FL.decode(data)
    assert (ch, sr) == (channels, 8000)
    want = _quant(sig) / 32768.0
    assert out.shape == want.shape
    assert np.array_equal(out, want)  # bit-exact


def test_compresses_smooth_signals():
    t = np.arange(20000) / 8000.0
    sig = (0.5 * np.sin(2 * np.pi * 300 * t))[:, None]
    data = FL.encode(sig, 8000)
    assert len(data) < 0.8 * sig.size * 2  # beats raw PCM16


def test_noise_still_roundtrips():
    rng = np.random.default_rng(0)
    sig = rng.uniform(-0.9, 0.9, (5000, 1))
    data = FL.encode(sig, 16000)
    ch, sr, out = FL.decode(data)
    assert np.array_equal(out, _quant(sig) / 32768.0)


def test_not_flac_raises():
    with pytest.raises(ValueError):
        FL.decode(b"RIFFxxxxWAVE")


# ------------------------------------------------------------------ #
# hand-built frames (decoder-only features)
# ------------------------------------------------------------------ #


def _streaminfo(channels, rate, bits, total, block_size=16):
    si = bytearray()
    si += struct.pack(">HH", block_size, block_size)
    si += b"\x00\x00\x00" * 2
    packed = (rate << 44) | ((channels - 1) << 41) | ((bits - 1) << 36) | total
    si += packed.to_bytes(8, "big")
    si += bytes(16)
    return b"fLaC" + bytes([0x80]) + len(si).to_bytes(3, "big") + bytes(si)


def _frame_header(bs, channels_code, rate=8000, bits_code=4):
    hdr = _BitWriter()
    hdr.write(0b11111111111110, 14)
    hdr.write(0, 2)
    hdr.write(7, 4)  # 16-bit blocksize field
    hdr.write(4, 4)  # 8 kHz
    hdr.write(channels_code, 4)
    hdr.write(bits_code, 3)
    hdr.write(0, 1)
    hdr.write(0, 8)  # frame number 0
    hdr.write(bs - 1, 16)
    hdr.align()
    raw = bytes(hdr.out)
    return raw + bytes([_crc8(raw)])


def _write_verbatim(bw, values, bps):
    bw.write(0, 1)
    bw.write(1, 6)
    bw.write(0, 1)
    for v in values:
        bw.write(int(v), bps)


def _finish_frame(header, body_bw):
    body_bw.align()
    fbytes = header + bytes(body_bw.out)
    return fbytes + _crc16(fbytes).to_bytes(2, "big")


def _decode_built(payload, channels, bits=16, total=0):
    data = _streaminfo(channels, 8000, bits, total) + payload
    return FL.decode(data)


def test_constant_subframe():
    bs = 16
    hdr = _frame_header(bs, channels_code=0)
    bw = _BitWriter()
    bw.write(0, 1)
    bw.write(0, 6)  # CONSTANT
    bw.write(0, 1)
    bw.write(-1234 & 0xFFFF, 16)
    ch, sr, out = _decode_built(_finish_frame(hdr, bw), 1, total=bs)
    assert np.all(out[:, 0] == -1234 / 32768.0)


def test_lpc_order1_matches_fixed1():
    """LPC with coef=[1], shift=0 predicts a[i-1] — identical to FIXED
    order 1, so a known ramp reconstructs exactly."""
    bs = 12
    samples = np.arange(100, 100 + bs, dtype=np.int64) * 3
    resid = samples[1:] - samples[:-1]
    hdr = _frame_header(bs, channels_code=0)
    bw = _BitWriter()
    bw.write(0, 1)
    bw.write(32, 6)  # LPC order 1 (100000 | (order-1))
    bw.write(0, 1)
    bw.write(int(samples[0]), 16)  # warmup
    bw.write(14, 4)  # precision 15 bits
    bw.write(0, 5)   # shift 0
    bw.write(1, 15)  # coefficient 1
    bw.write(0, 2)   # 4-bit params
    bw.write(0, 4)   # partition order 0
    bw.write(2, 4)   # rice param 2
    for r in resid:
        z = (int(r) << 1) ^ (int(r) >> 63)
        bw.write_unary(z >> 2)
        bw.write(z & 3, 2)
    ch, sr, out = _decode_built(_finish_frame(hdr, bw), 1, total=bs)
    assert np.array_equal((out[:, 0] * 32768).astype(np.int64), samples)


@pytest.mark.parametrize("mode", ["left_side", "right_side", "mid_side"])
def test_stereo_decorrelation(mode):
    bs = 8
    rng = np.random.default_rng(3)
    L = rng.integers(-2000, 2000, bs).astype(np.int64)
    R = rng.integers(-2000, 2000, bs).astype(np.int64)
    side = L - R
    if mode == "left_side":
        code, ch0, ch1, bps1 = 8, L, side, 17
        bps0 = 16
    elif mode == "right_side":
        code, ch0, ch1, bps1 = 9, side, R, 16
        bps0 = 17
    else:
        mid = (L + R) >> 1
        code, ch0, ch1, bps1 = 10, mid, side, 17
        bps0 = 16
    hdr = _frame_header(bs, channels_code=code)
    bw = _BitWriter()
    _write_verbatim(bw, ch0, bps0)
    _write_verbatim(bw, ch1, bps1)
    ch, sr, out = _decode_built(_finish_frame(hdr, bw), 2, total=bs)
    got = (out * 32768).astype(np.int64)
    assert np.array_equal(got[:, 0], L)
    assert np.array_equal(got[:, 1], R)


def test_rice_escape_partition():
    """param 0b1111 escapes to raw n-bit residuals."""
    bs = 6
    order = 1
    samples = np.array([5, 9, 2, -7, 40, 41], dtype=np.int64)
    resid = samples[1:] - samples[:-1]
    hdr = _frame_header(bs, channels_code=0)
    bw = _BitWriter()
    bw.write(0, 1)
    bw.write(8 + order, 6)  # FIXED order 1
    bw.write(0, 1)
    bw.write(int(samples[0]), 16)
    bw.write(0, 2)
    bw.write(0, 4)
    bw.write(0xF, 4)  # escape
    bw.write(8, 5)    # 8-bit raw residuals
    for r in resid:
        bw.write(int(r) & 0xFF, 8)
    ch, sr, out = _decode_built(_finish_frame(hdr, bw), 1, total=bs)
    assert np.array_equal((out[:, 0] * 32768).astype(np.int64), samples)


def test_multi_partition_five_bit_params():
    """Partition order 2 (4 partitions) with 5-bit Rice parameters."""
    bs = 16
    order = 0
    rng = np.random.default_rng(9)
    samples = rng.integers(-50, 50, bs).astype(np.int64)
    hdr = _frame_header(bs, channels_code=0)
    bw = _BitWriter()
    bw.write(0, 1)
    bw.write(8 + order, 6)  # FIXED order 0 (residual = samples)
    bw.write(0, 1)
    bw.write(1, 2)   # 5-bit params
    bw.write(2, 4)   # partition order 2 → 4 partitions of 4
    for p in range(4):
        bw.write(3, 5)  # param 3
        for r in samples[p * 4 : (p + 1) * 4]:
            z = (int(r) << 1) ^ (int(r) >> 63)
            bw.write_unary(z >> 3)
            bw.write(z & 7, 3)
    ch, sr, out = _decode_built(_finish_frame(hdr, bw), 1, total=bs)
    assert np.array_equal((out[:, 0] * 32768).astype(np.int64), samples)


def test_decode_audio_batch_routes_flac(spark):
    from kapacitor_spark.dataprep.multimodal import decode_audio_batch

    t = np.arange(800) / 8000.0
    sig = (0.4 * np.sin(2 * np.pi * 440 * t))[:, None]
    payload = FL.encode(sig, 8000)
    df = spark.createDataFrame([(1, payload)], "doc_id long, payload binary")
    r = decode_audio_batch(df, mono=True).collect()[0]
    assert r["audio_format"] == "flac"
    assert (r["channels"], r["sample_rate"], r["n_frames"]) == (1, 8000, 800)
    want = _quant(sig)[:, 0] / 32768.0
    assert np.allclose(np.array(r["samples"]), want, atol=1e-7)


def test_crc_verification_catches_corruption():
    """Frame CRCs are VERIFIED, not skipped: flipping a bit in the frame
    header or in the audio payload raises instead of decoding garbage."""
    t = np.arange(1000) / 8000.0
    sig = (0.5 * np.sin(2 * np.pi * 440 * t))[:, None]
    data = bytearray(FL.encode(sig, 8000))
    # find the first frame (after fLaC + streaminfo block: 4 + 4 + 34)
    frame_start = 4 + 4 + 34
    assert data[frame_start] == 0xFF
    hdr_corrupt = bytearray(data)
    hdr_corrupt[frame_start + 4] ^= 0x01  # header byte
    with pytest.raises(ValueError, match="CRC"):
        FL.decode(bytes(hdr_corrupt))
    body_corrupt = bytearray(data)
    body_corrupt[frame_start + 40] ^= 0x40  # audio payload byte
    with pytest.raises(ValueError, match="CRC|corrupt"):
        FL.decode(bytes(body_corrupt))
