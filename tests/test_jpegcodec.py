"""Baseline JPEG codec (dataprep/jpegcodec.py): encode/decode round-trip
laws, restart markers, progressive (SOF2) scan-type coverage, and the
routing through imagecodec.decode / parse_header."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kapacitor_spark.dataprep import imagecodec, jpegcodec


def _gradient(w, h):
    x = np.linspace(0, 255, w)[None, :, None]
    y = np.linspace(0, 255, h)[:, None, None]
    return np.clip(
        np.concatenate([x + 0 * y, y + 0 * x, (x + y) / 2], axis=2), 0, 255
    ).astype(np.uint8)


@pytest.mark.parametrize("value", [0, 1, 63, 128, 130, 254, 255])
def test_flat_gray_roundtrip_exact(value):
    """A flat block is DC-only; with the quality-90 DC quantizer ≤ 8 the
    dequantization error is < 0.5 gray levels, so the lossy round-trip is
    EXACT — the property the oracle-gated multimodal_decode JPEG branch
    relies on."""
    w, h = 16, 8
    img = np.full((h, w, 1), value, dtype=np.uint8)
    data = jpegcodec.encode(w, h, img.tobytes(), channels=1, quality=90)
    w2, h2, c2, pix = jpegcodec.decode(data)
    assert (w2, h2, c2) == (w, h, 1)
    arr = np.frombuffer(pix, dtype=np.uint8).reshape(h, w, 1)
    assert np.array_equal(arr, img)


@pytest.mark.parametrize("w,h", [(8, 8), (24, 17), (33, 40), (7, 5)])
def test_rgb_gradient_roundtrip_close(w, h):
    img = _gradient(w, h)
    data = jpegcodec.encode(w, h, img.tobytes(), channels=3, quality=95)
    w2, h2, c2, pix = jpegcodec.decode(data)
    assert (w2, h2, c2) == (w, h, 3)
    arr = np.frombuffer(pix, dtype=np.uint8).reshape(h, w, 3)
    err = np.abs(arr.astype(int) - img.astype(int))
    assert err.mean() < 3 and err.max() <= 16


def test_noise_roundtrip_bounded():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (16, 24, 3), dtype=np.uint8)
    data = jpegcodec.encode(24, 16, img.tobytes(), channels=3, quality=95)
    _, _, _, pix = jpegcodec.decode(data)
    arr = np.frombuffer(pix, dtype=np.uint8).reshape(16, 24, 3)
    err = np.abs(arr.astype(int) - img.astype(int))
    assert err.mean() < 8 and err.max() <= 48  # noise is JPEG's worst case


def test_restart_interval_roundtrip():
    """DRI + RSTn: DC predictors reset at each restart; the decoded image
    must be identical to the no-restart encode of the same pixels."""
    img = _gradient(40, 33)
    plain = jpegcodec.encode(40, 33, img.tobytes(), channels=3, quality=92)
    with_rst = jpegcodec.encode(
        40, 33, img.tobytes(), channels=3, quality=92, restart_interval=3
    )
    assert b"\xff\xdd" in with_rst and b"\xff\xdd" not in plain
    _, _, _, p1 = jpegcodec.decode(plain)
    _, _, _, p2 = jpegcodec.decode(with_rst)
    assert p1 == p2


def test_quality_monotonicity():
    """Higher quality → error no worse (on a fixed smooth image)."""
    img = _gradient(32, 32)
    errs = []
    for q in (30, 60, 90):
        data = jpegcodec.encode(32, 32, img.tobytes(), channels=3, quality=q)
        _, _, _, pix = jpegcodec.decode(data)
        arr = np.frombuffer(pix, dtype=np.uint8).reshape(32, 32, 3)
        errs.append(np.abs(arr.astype(int) - img.astype(int)).mean())
    assert errs[0] >= errs[1] >= errs[2]


def test_truncated_and_corrupt_raise():
    img = np.full((8, 8, 1), 50, dtype=np.uint8)
    data = jpegcodec.encode(8, 8, img.tobytes(), channels=1)
    with pytest.raises(ValueError):
        jpegcodec.decode(b"\x00\x01\x02")
    with pytest.raises(ValueError):
        jpegcodec.decode(data[: len(data) // 2])


def test_imagecodec_routes_jpeg():
    """sniff → parse_header dims → full decode all agree through the
    imagecodec front door (the path multimodal decode_full uses)."""
    img = _gradient(24, 9)
    data = jpegcodec.encode(24, 9, img.tobytes(), channels=3, quality=90)
    assert imagecodec.sniff_format(data) == "jpeg"
    fmt, w, h = imagecodec.parse_header(data)
    assert (fmt, w, h) == ("jpeg", 24, 9)
    w2, h2, c2, pix = imagecodec.decode(data)
    assert (w2, h2, c2) == (24, 9, 3) and len(pix) == 24 * 9 * 3


def test_hypothesis_style_random_images_decode_to_right_shape():
    rng = np.random.default_rng(5)
    for _ in range(10):
        w = int(rng.integers(1, 50))
        h = int(rng.integers(1, 50))
        ch = int(rng.choice([1, 3]))
        img = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
        data = jpegcodec.encode(w, h, img.tobytes(), channels=ch, quality=85)
        w2, h2, c2, pix = jpegcodec.decode(data)
        assert (w2, h2, c2) == (w, h, ch)
        assert len(pix) == w * h * ch


# ------------------------------------------------------------------ #
# progressive (SOF2)
# ------------------------------------------------------------------ #


@pytest.mark.parametrize("shape,ch,q", [((8, 8), 1, 90), ((17, 24), 3, 95),
                                        ((40, 33), 3, 75), ((5, 3), 3, 90)])
def test_progressive_decodes_identically_to_baseline(shape, ch, q):
    """The four-scan-group progressive stream (DC first/refine + AC
    first/refine per component) must reconstruct EXACTLY the same pixels
    as the baseline encode of the same quantized coefficients — the
    coefficient stores are identical by construction, so any byte diff
    is a scan-decoding bug."""
    rng = np.random.default_rng(sum(shape))
    img = rng.integers(0, 256, (*shape, ch), dtype=np.uint8)
    base = jpegcodec.encode(shape[1], shape[0], img.tobytes(), channels=ch,
                            quality=q)
    prog = jpegcodec.encode(shape[1], shape[0], img.tobytes(), channels=ch,
                            quality=q, progressive=True)
    assert b"\xff\xc2" in prog and b"\xff\xc2" not in base
    wb, hb, cb, pb = jpegcodec.decode(base)
    wp, hp, cp, pp = jpegcodec.decode(prog)
    assert (wb, hb, cb) == (wp, hp, cp) == (shape[1], shape[0], ch)
    assert pb == pp


def test_progressive_flat_gray_exact():
    img = np.full((16, 16, 1), 131, dtype=np.uint8)
    prog = jpegcodec.encode(16, 16, img.tobytes(), channels=1, quality=90,
                            progressive=True)
    w, h, c, pix = jpegcodec.decode(prog)
    assert np.array_equal(
        np.frombuffer(pix, dtype=np.uint8).reshape(16, 16, 1), img
    )


def test_progressive_gradient_close():
    img = _gradient(32, 24)
    prog = jpegcodec.encode(32, 24, img.tobytes(), channels=3, quality=95,
                            progressive=True)
    _, _, _, pix = jpegcodec.decode(prog)
    arr = np.frombuffer(pix, dtype=np.uint8).reshape(24, 32, 3)
    err = np.abs(arr.astype(int) - img.astype(int))
    assert err.mean() < 3 and err.max() <= 16


def test_progressive_sparse_blocks_exercise_eob_and_zrl():
    """Mostly-flat image with isolated spikes: AC bands are mostly empty
    (EOB-heavy) with long zero runs before spikes (ZRL in the refinement
    scan's span logic)."""
    img = np.full((40, 48, 1), 100, dtype=np.uint8)
    img[4, 44] = 255
    img[25, 3] = 0
    img[33, 33] = 180
    base = jpegcodec.encode(48, 40, img.tobytes(), channels=1, quality=85)
    prog = jpegcodec.encode(48, 40, img.tobytes(), channels=1, quality=85,
                            progressive=True)
    assert jpegcodec.decode(base)[3] == jpegcodec.decode(prog)[3]


def test_arithmetic_coded_still_raises():
    img = np.full((8, 8, 1), 99, dtype=np.uint8)
    data = bytearray(jpegcodec.encode(8, 8, img.tobytes(), channels=1))
    idx = data.find(b"\xff\xc0")
    data[idx + 1] = 0xC9  # arithmetic sequential
    with pytest.raises(NotImplementedError):
        jpegcodec.decode(bytes(data))
