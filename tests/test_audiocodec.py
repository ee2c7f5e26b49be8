"""Real (stdlib-only) audio codec: WAV PCM round-trips, header parsing,
mono/resample, and the Spark decode_audio_batch / extract_audio_features
path with real samples."""

import math
import os
import struct
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kapacitor_spark.dataprep import audiocodec as ac


def _sine(freq, rate=8000, seconds=0.01, channels=1):
    t = np.arange(int(rate * seconds)) / rate
    s = np.sin(2 * math.pi * freq * t)
    return np.stack([s] * channels, axis=1)


def test_wav_roundtrip_16bit():
    s = _sine(440, channels=2)
    data = ac.encode_wav(s, 8000)
    assert ac.sniff_format(data) == "wav"
    ch, rate, bits, n_frames, fmt = ac.parse_wav_header(data)
    assert (ch, rate, bits, n_frames, fmt) == (2, 8000, 16, s.shape[0], 1)
    ch2, rate2, out = ac.decode_wav(data)
    assert (ch2, rate2) == (2, 8000)
    assert out.shape == s.shape
    # encode scales by 32767, decode by 32768 (the PCM convention), so the
    # round-trip error is quantization + one part in 32768 of amplitude
    assert np.abs(out - s).max() < 1.0 / 10000


def test_wav_8bit_and_float32():
    s = _sine(100, seconds=0.005)
    # hand-build an 8-bit PCM file
    pcm8 = np.clip(np.round(s.reshape(-1) * 127 + 128), 0, 255).astype(np.uint8)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    raw = pcm8.tobytes()
    data = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(raw)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(raw)) + raw
    )
    _, _, out = ac.decode_wav(data)
    # 8-bit step is 1/128; the +128 bias rounding makes worst case ~1.5 steps
    assert np.abs(out.reshape(-1) - s.reshape(-1)).max() < 1.5 / 128
    # float32 PCM (audio_format 3)
    f32 = s.reshape(-1).astype("<f4").tobytes()
    fmtf = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    dataf = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmtf) + 8 + len(f32)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmtf)) + fmtf
        + b"data" + struct.pack("<I", len(f32)) + f32
    )
    _, _, outf = ac.decode_wav(dataf)
    assert np.abs(outf.reshape(-1) - s.reshape(-1)).max() < 1e-6


def test_mono_and_resample():
    s = np.stack([np.ones(10), -np.ones(10)], axis=1)
    assert np.all(ac.to_mono(s) == 0.0)
    r = ac.resample_nearest(np.arange(10, dtype=float)[:, None], 5)
    assert r.reshape(-1).tolist() == [0.0, 2.0, 4.0, 6.0, 8.0]


def test_compressed_sniff_and_decode_refusal():
    assert ac.sniff_format(b"ID3\x04rest") == "mp3"
    assert ac.sniff_format(b"OggSjunk") == "ogg"
    assert ac.sniff_format(b"fLaCjunk") == "flac"
    with pytest.raises(ValueError, match="RIFF"):
        ac.decode_wav(b"OggSjunk")


def test_decode_audio_batch_spark(spark):
    """decode_audio_batch: REAL WAV decode inside mapInPandas — metadata,
    mono mixdown, in-hop resampling — then JVM-side RMS/zero-crossing
    features with the known analytics of a sine wave."""
    from kapacitor_spark.dataprep.multimodal import (
        decode_audio_batch, extract_audio_features,
    )

    rate, seconds, freq = 8000, 0.05, 440
    wav = ac.encode_wav(_sine(freq, rate, seconds, channels=2), rate)
    df = spark.createDataFrame([(1, bytearray(wav))], "doc_id long, payload binary")
    out = decode_audio_batch(df, target_frames=200).drop("payload")
    r = extract_audio_features(out).collect()[0]
    assert (r["channels"], r["sample_rate"]) == (2, rate)
    assert r["n_frames"] == int(rate * seconds)
    assert r["audio_format"] == "wav"
    assert len(r["samples"]) == 200
    # a full-scale sine has RMS 1/sqrt(2); zero crossings ≈ 2*freq*seconds
    # scaled by the resample ratio
    assert abs(r["rms"] - 1 / math.sqrt(2)) < 0.02
    expected_zc = 2 * freq * seconds
    assert abs(r["zero_crossings"] - expected_zc) <= 4


# ------------------------------------------------------------------ #
# compressed WAV codecs: G.711 µ-law / A-law + IMA ADPCM
# ------------------------------------------------------------------ #


def test_g711_tables_match_audioop_exhaustively():
    """Both directions, all values: decode tables over all 256 codes and
    encoders over every int16, bit-for-bit against CPython's audioop
    (present through 3.12) — an independent reference implementation."""
    audioop = pytest.importorskip("audioop")
    import numpy as np

    codes = np.arange(256, dtype=np.uint8)
    assert np.array_equal(
        ac._ULAW_TABLE[codes],
        np.frombuffer(audioop.ulaw2lin(codes.tobytes(), 2), dtype=np.int16),
    )
    assert np.array_equal(
        ac._ALAW_TABLE[codes],
        np.frombuffer(audioop.alaw2lin(codes.tobytes(), 2), dtype=np.int16),
    )
    x = np.arange(-32768, 32768, dtype=np.int16)
    assert np.array_equal(
        ac.ulaw_encode(x),
        np.frombuffer(audioop.lin2ulaw(x.tobytes(), 2), dtype=np.uint8),
    )
    assert np.array_equal(
        ac.alaw_encode(x),
        np.frombuffer(audioop.lin2alaw(x.tobytes(), 2), dtype=np.uint8),
    )


@pytest.mark.parametrize("codec,tol", [("ulaw", 0.02), ("alaw", 0.02),
                                       ("ima_adpcm", 0.08)])
def test_compressed_wav_roundtrip(codec, tol):
    import numpy as np

    t = np.arange(2000) / 8000.0
    sig = (0.6 * np.sin(2 * np.pi * 440 * t)
           + 0.2 * np.sin(2 * np.pi * 1000 * t))[:, None]
    data = ac.encode_wav(sig, 8000, codec=codec)
    ch, rate, out = ac.decode_wav(data)
    assert (ch, rate) == (1, 8000)
    assert out.shape[0] == 2000  # fact chunk truncates block padding
    assert float(np.abs(out - sig).max()) < tol


def test_compressed_wav_headers():
    import numpy as np

    sig = np.zeros((100, 1))
    for codec, fmt_code, bits in [("ulaw", 7, 8), ("alaw", 6, 8),
                                  ("ima_adpcm", 0x11, 4)]:
        data = ac.encode_wav(sig, 8000, codec=codec)
        channels, rate, b, n_frames, audio_format = ac.parse_wav_header(data)
        assert (channels, rate, b, audio_format) == (1, 8000, bits, fmt_code)
        assert n_frames == 100  # from the fact chunk


def test_stereo_ulaw_roundtrip():
    import numpy as np

    t = np.arange(500) / 8000.0
    sig = np.stack([np.sin(2 * np.pi * 440 * t),
                    np.cos(2 * np.pi * 220 * t)], axis=1) * 0.5
    data = ac.encode_wav(sig, 8000, codec="ulaw")
    ch, rate, out = ac.decode_wav(data)
    assert (ch, out.shape) == (2, (500, 2))
    assert float(np.abs(out - sig).max()) < 0.02


def test_perceptual_codecs_still_raise():
    import struct as st

    fake = (b"RIFF" + st.pack("<I", 36) + b"WAVE"
            + b"fmt " + st.pack("<I", 16)
            + st.pack("<HHIIHH", 85, 1, 8000, 8000, 1, 0)  # MP3-in-WAV
            + b"data" + st.pack("<I", 0))
    with pytest.raises(NotImplementedError, match="audio library"):
        ac.decode_wav(fake)


def test_pcm24_wav_decode():
    """24-bit PCM: 3-byte LE frames widen with sign extension."""
    import numpy as np
    import struct as st

    samples = [0x000001, 0x7FFFFF, -0x800000, -1]
    raw = b"".join(
        (v & 0xFFFFFF).to_bytes(3, "little") for v in samples
    )
    fmt = st.pack("<HHIIHH", 1, 1, 8000, 8000 * 3, 3, 24)
    data = (b"RIFF" + st.pack("<I", 4 + 8 + len(fmt) + 8 + len(raw)) + b"WAVE"
            + b"fmt " + st.pack("<I", len(fmt)) + fmt
            + b"data" + st.pack("<I", len(raw)) + raw)
    ch, rate, out = ac.decode_wav(data)
    want = np.array(samples, dtype=np.float64) / (1 << 23)
    assert ch == 1 and rate == 8000
    assert np.allclose(out[:, 0], want, atol=1e-12)


def test_ima_adpcm_trailing_partial_block_not_dropped():
    """Real encoders end with a short final block; its samples must
    decode (the truncation this pins dropped up to 504 frames)."""
    import numpy as np
    import struct as st

    t = np.arange(505 + 9) / 8000.0
    sig = 0.3 * np.sin(2 * np.pi * 300 * t)
    pcm = np.clip(np.round(sig * 32767), -32768, 32767).astype(np.int16)
    raw, ba = ac.ima_adpcm_encode_mono(pcm)
    # trim the padded second block to header + ONE 4-byte nibble group
    short = raw[:ba] + raw[ba : ba + 8]
    out = ac._decode_ima_adpcm(short, 1, ba)
    assert out.shape[0] == 505 + 9  # 505 + header sample + 8 nibbles
    err = np.abs(out[:, 0] - pcm[: out.shape[0]].astype(np.int32))
    assert err.max() < 3000  # tracks the signal, not silence


def test_audio_dhash_known_bits(spark):
    """A monotonically louder clip (bucket energies strictly increasing)
    hashes to all-ones; its reverse to all-zeros."""
    from pyspark.sql import functions as F

    from kapacitor_spark.dataprep.multimodal import audio_dhash_expr

    inc = [((i // 2) + 1) / 128.0 for i in range(130)]
    dec = list(reversed(inc))
    df = spark.createDataFrame(
        [(1, inc), (2, dec)], "doc_id long, samples array<float>"
    )
    out = {
        r["doc_id"]: r["h"]
        for r in df.select(
            "doc_id", audio_dhash_expr("samples", 2).alias("h")
        ).collect()
    }
    assert out[1] == -1
    assert out[2] == 0


def test_audio_dhash_near_dup_planted(spark):
    """End-to-end on real 8-bit WAV payloads: a one-sample edit must pair
    with its original (<=2 flipped bits); an unrelated clip must not."""
    import random
    import struct as st

    from kapacitor_spark.dataprep.multimodal import audio_dhash_near_dup

    n = 130
    hdr = (
        b"RIFF" + st.pack("<I", 36 + n) + b"WAVE"
        + b"fmt " + st.pack("<IHHIIHH", 16, 1, 1, 8000, 8000, 1, 8)
        + b"data" + st.pack("<I", n)
    )
    rng = random.Random(5)
    clip = bytes(rng.randrange(256) for _ in range(n))
    edited = bytearray(clip)
    edited[64] = (edited[64] + 128) % 256
    other = bytes(rng.randrange(256) for _ in range(n))
    df = spark.createDataFrame(
        [(1, hdr + clip), (2, hdr + bytes(edited)), (3, hdr + other)],
        "doc_id long, payload binary",
    )
    pairs = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in audio_dhash_near_dup(df, bucket_size=2, max_hamming=6).collect()
    }
    assert {(a, b) for a, b, _ in pairs} == {(1, 2)}
    assert all(h <= 2 for _, _, h in pairs)
