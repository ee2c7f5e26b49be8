"""WebP-lossless codec (dataprep/webpcodec.py): literal round-trip laws
plus hand-crafted VP8L streams that exercise every decoder feature the
literal-only encoder doesn't emit — LZ77 backrefs, the color cache,
subtract-green / predictor / color-indexing transforms — all with
expected pixels computed independently in the test."""

import os
import struct
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kapacitor_spark.dataprep import imagecodec, webpcodec
from kapacitor_spark.dataprep.webpcodec import (
    _BitWriter,
    _build_lengths,
    _canonical_codes,
    _write_code_lengths,
)


def _rt(img, ch):
    h, w = img.shape[:2]
    data = webpcodec.encode(w, h, img.tobytes(), channels=ch)
    w2, h2, c2, pix = webpcodec.decode(data)
    return (w2, h2, c2), np.frombuffer(pix, dtype=np.uint8).reshape(h2, w2, c2), data


@pytest.mark.parametrize("shape,ch", [((1, 4), 3), ((9, 13), 3), ((33, 47), 3),
                                      ((5, 6), 4), ((20, 20), 1)])
def test_literal_roundtrip_lossless(shape, ch):
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (*shape, ch), dtype=np.uint8)
    if ch == 4:
        img[..., 3] = rng.integers(200, 256, shape, dtype=np.uint8)
    dims, arr, data = _rt(img, ch)
    assert data[:4] == b"RIFF" and data[8:12] == b"WEBP"
    want = img if ch != 1 else np.repeat(img, 3, axis=2)
    assert dims == (shape[1], shape[0], want.shape[2])
    assert np.array_equal(arr, want)


def test_lossy_vp8_raises():
    fake = b"RIFF" + struct.pack("<I", 16) + b"WEBP" + b"VP8 " + struct.pack("<I", 0)
    with pytest.raises(NotImplementedError, match="libwebp"):
        webpcodec.decode(fake)
    with pytest.raises(ValueError):
        webpcodec.decode(b"nope")


def test_imagecodec_header_still_sniffs():
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    data = webpcodec.encode(2, 2, img.tobytes())
    assert imagecodec.sniff_format(data) == "webp"


# ------------------------------------------------------------------ #
# hand-crafted streams
# ------------------------------------------------------------------ #


def _vp8l_header(bw, w, h):
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)


def _wrap(bw):
    payload = b"\x2f" + bw.flush()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def _emit_sym(bw, codes, v):
    if len(codes) == 1:
        return
    c, n = codes[int(v)]
    for shift in range(n - 1, -1, -1):
        bw.write((c >> shift) & 1, 1)


def _plane_codes(bw, values, alphabet):
    freq = [0] * alphabet
    for v in values:
        freq[int(v)] += 1
    lengths = _build_lengths(freq)
    _write_code_lengths(bw, lengths)
    return _canonical_codes(lengths)


def test_lz77_backref_decodes():
    """1x8 alternating two colors: two literals + one backref (length 6,
    linear distance 2 → dist value 122 = prefix 13 + 5 extra bits)."""
    P = (10, 200, 30)
    Q = (99, 5, 250)
    bw = _BitWriter()
    _vp8l_header(bw, 8, 1)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no cache (spec order: cache before meta)
    bw.write(0, 1)  # no meta-prefix
    gcodes = _plane_codes(bw, [P[1], Q[1], 256 + 4], 256 + 24)  # 260 = len-6 prefix 4
    rcodes = _plane_codes(bw, [P[0], Q[0]], 256)
    bcodes = _plane_codes(bw, [P[2], Q[2]], 256)
    acodes = _plane_codes(bw, [255], 256)
    dcodes = _plane_codes(bw, [13], 40)
    for px in (P, Q):
        _emit_sym(bw, gcodes, px[1])
        _emit_sym(bw, rcodes, px[0])
        _emit_sym(bw, bcodes, px[2])
        _emit_sym(bw, acodes, 255)
    _emit_sym(bw, gcodes, 256 + 4)  # length prefix 4: v = 4 + extra + 1
    bw.write(1, 1)  # extra → length 6
    _emit_sym(bw, dcodes, 13)  # dist prefix 13: v = 96 + extra + 1
    bw.write(25, 5)  # extra → v=122 → linear distance 2
    w, h, c, pix = webpcodec.decode(_wrap(bw))
    arr = np.frombuffer(pix, dtype=np.uint8).reshape(1, 8, 3)
    want = np.array([[P, Q, P, Q, P, Q, P, Q]], dtype=np.uint8)
    assert np.array_equal(arr, want)


def test_color_cache_hit_decodes():
    """Literal P, literal Q, then a color-cache reference back to P."""
    P = (1, 2, 3)
    Q = (200, 100, 50)
    cache_bits = 4
    px_argb = (255 << 24) | (P[0] << 16) | (P[1] << 8) | P[2]
    idx = ((0x1E35A7BD * px_argb) >> (32 - cache_bits)) & ((1 << cache_bits) - 1)
    bw = _BitWriter()
    _vp8l_header(bw, 3, 1)
    bw.write(0, 1)  # no transforms
    bw.write(1, 1)  # cache present (spec order: cache before meta)
    bw.write(cache_bits, 4)
    bw.write(0, 1)  # no meta-prefix
    alpha = 256 + 24 + (1 << cache_bits)
    gcodes = _plane_codes(bw, [P[1], Q[1], 256 + 24 + idx], alpha)
    rcodes = _plane_codes(bw, [P[0], Q[0]], 256)
    bcodes = _plane_codes(bw, [P[2], Q[2]], 256)
    acodes = _plane_codes(bw, [255], 256)
    dcodes = _plane_codes(bw, [0], 40)
    del dcodes
    for px in (P, Q):
        _emit_sym(bw, gcodes, px[1])
        _emit_sym(bw, rcodes, px[0])
        _emit_sym(bw, bcodes, px[2])
        _emit_sym(bw, acodes, 255)
    _emit_sym(bw, gcodes, 256 + 24 + idx)
    w, h, c, pix = webpcodec.decode(_wrap(bw))
    arr = np.frombuffer(pix, dtype=np.uint8).reshape(1, 3, 3)
    assert np.array_equal(arr, np.array([[P, Q, P]], dtype=np.uint8))


def _emit_literal_image(bw, rgba_rows, sub=False):
    """Write a no-transform entropy image body for (h,w,4) uint8 rows.
    Transform sub-images (``sub=True``) carry no meta-prefix bit."""
    flat = rgba_rows.reshape(-1, 4)
    bw.write(0, 1)  # no cache (spec order: cache precedes meta)
    if not sub:
        bw.write(0, 1)  # no meta-prefix
    gcodes = _plane_codes(bw, flat[:, 1], 256 + 24)
    rcodes = _plane_codes(bw, flat[:, 0], 256)
    bcodes = _plane_codes(bw, flat[:, 2], 256)
    acodes = _plane_codes(bw, flat[:, 3], 256)
    _plane_codes(bw, [0], 40)
    for px in flat:
        _emit_sym(bw, gcodes, px[1])
        _emit_sym(bw, rcodes, px[0])
        _emit_sym(bw, bcodes, px[2])
        _emit_sym(bw, acodes, px[3])


def test_subtract_green_transform():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (4, 5, 3), dtype=np.uint8)
    sub = img.astype(np.int32).copy()
    sub[..., 0] = (sub[..., 0] - sub[..., 1]) % 256  # r -= g
    sub[..., 2] = (sub[..., 2] - sub[..., 1]) % 256  # b -= g
    rgba = np.concatenate(
        [sub.astype(np.uint8), np.full((4, 5, 1), 255, np.uint8)], axis=2
    )
    bw = _BitWriter()
    _vp8l_header(bw, 5, 4)
    bw.write(1, 1)  # transform present
    bw.write(2, 2)  # subtract-green
    bw.write(0, 1)  # no more transforms
    _emit_literal_image(bw, rgba)
    w, h, c, pix = webpcodec.decode(_wrap(bw))
    assert np.array_equal(
        np.frombuffer(pix, dtype=np.uint8).reshape(4, 5, 3), img
    )


def test_predictor_transform_L_mode():
    """One predictor tile, mode 1 (= left): residual row decodes back to
    a running byte-sum. First pixel adds the 0xFF000000 black predictor,
    row-0 pixels use L implicitly."""
    # target image row: running sums of residuals
    resid = np.array(
        [[(5, 7, 9), (1, 2, 3), (10, 20, 30), (100, 50, 25)]], dtype=np.uint8
    )
    want = np.cumsum(resid.astype(np.int64), axis=1) % 256
    rgba = np.concatenate(
        [resid, np.full((1, 4, 1), 0, np.uint8)], axis=2
    )  # alpha residual 0... first pixel's alpha adds 0xFF from black pred
    bw = _BitWriter()
    _vp8l_header(bw, 4, 1)
    bw.write(1, 1)  # transform present
    bw.write(0, 2)  # predictor
    bw.write(2, 3)  # size_bits = 4 → one 16x16 tile covers 4x1
    # tile sub-image: 1 pixel, mode 1 in green channel
    tile = np.array([[[0, 1, 0, 0]]], dtype=np.uint8)  # r,g,b,a → argb g=1
    _emit_literal_image(bw, tile, sub=True)
    bw.write(0, 1)  # no more transforms
    _emit_literal_image(bw, rgba)
    w, h, c, pix = webpcodec.decode(_wrap(bw))
    arr = np.frombuffer(pix, dtype=np.uint8).reshape(1, 4, 3)
    assert np.array_equal(arr, want.astype(np.uint8))


def test_color_indexing_packed_palette():
    """2-color palette → width_bits 3 → 8 pixels packed per green byte."""
    C0 = (10, 20, 30)
    C1 = (200, 210, 220)
    pattern = [0, 1, 1, 0, 1, 0, 0, 1]
    bw = _BitWriter()
    _vp8l_header(bw, 8, 1)
    bw.write(1, 1)  # transform present
    bw.write(3, 2)  # color indexing
    bw.write(2 - 1, 8)  # n_colors - 1
    # palette image (2 pixels, DELTA-coded: second = C1 - C0 per channel)
    p0 = np.array([[C0[0], C0[1], C0[2], 255]], dtype=np.int64)
    d1 = (np.array([[C1[0], C1[1], C1[2], 255]]) - p0) % 256
    pal_img = np.stack([p0[0], d1[0]]).reshape(1, 2, 4).astype(np.uint8)
    _emit_literal_image(bw, pal_img, sub=True)
    bw.write(0, 1)  # no more transforms
    # packed index image: width ceil(8/8) = 1 pixel; indices in green,
    # LSB-first within the byte
    packed = 0
    for k, bit in enumerate(pattern):
        packed |= bit << k
    idx_img = np.array([[[0, packed, 0, 255]]], dtype=np.uint8)
    _emit_literal_image(bw, idx_img)
    w, h, c, pix = webpcodec.decode(_wrap(bw))
    arr = np.frombuffer(pix, dtype=np.uint8).reshape(1, 8, 3)
    want = np.array([[C0 if b == 0 else C1 for b in pattern]], dtype=np.uint8)
    assert np.array_equal(arr, want)


def test_color_indexing_delta_overflow_wraps_per_channel():
    """Palette deltas add componentwise mod 256 — a packed cumsum would
    carry a blue-channel overflow into green (the bug class this pins)."""
    C0 = (40, 60, 200)
    C1 = (45, 61, 44)  # blue 200 + delta 100 → 300 wraps to 44
    bw = _BitWriter()
    _vp8l_header(bw, 4, 1)
    bw.write(1, 1)
    bw.write(3, 2)
    bw.write(2 - 1, 8)
    d1 = [(C1[i] - C0[i]) % 256 for i in range(3)]
    pal_img = np.array(
        [[[C0[0], C0[1], C0[2], 255], [d1[0], d1[1], d1[2], 0]]], dtype=np.uint8
    )
    _emit_literal_image(bw, pal_img, sub=True)
    bw.write(0, 1)
    pattern = [0, 1, 0, 1]
    packed_lo = pattern[0] | (pattern[1] << 2) | (pattern[2] << 4) | (pattern[3] << 6)
    # n_colors=2 → width_bits 3 → 8 px/byte, but only 4 pixels used
    packed = pattern[0] | (pattern[1] << 1) | (pattern[2] << 2) | (pattern[3] << 3)
    idx_img = np.array([[[0, packed, 0, 255]]], dtype=np.uint8)
    _emit_literal_image(bw, idx_img)
    w, h, c, pix = webpcodec.decode(_wrap(bw))
    arr = np.frombuffer(pix, dtype=np.uint8).reshape(1, 4, 3)
    want = np.array([[C0, C1, C0, C1]], dtype=np.uint8)
    assert np.array_equal(arr, want)
    del packed_lo


def test_full_alphabet_plane_roundtrips():
    """A plane using all 256 byte values once gives every symbol the same
    Huffman length → a single-symbol code-length code, which costs 0 bits
    per length on the wire (the encoder desync this pins)."""
    vals = np.arange(256, dtype=np.uint8).reshape(16, 16)
    img = np.stack([vals, np.zeros_like(vals), np.full_like(vals, 7)], axis=-1)
    data = webpcodec.encode(16, 16, img.tobytes(), channels=3)
    w, h, c, pix = webpcodec.decode(data)
    assert np.array_equal(np.frombuffer(pix, dtype=np.uint8).reshape(16, 16, 3), img)


def test_build_lengths_always_complete():
    """Length-limited codes must be COMPLETE (Σ2^-l == 1) — libwebp
    rejects under-full tables. Fibonacci-ish frequencies force deep trees
    that the 15-bit clamp then has to redistribute exactly."""
    fib = [1, 1]
    while len(fib) < 24:
        fib.append(fib[-1] + fib[-2])
    freqs = [0] * 300
    for i, f in enumerate(fib):
        freqs[i] = f
    lengths = _build_lengths(freqs, max_len=15)
    nz = [l for l in lengths if l]
    assert max(nz) <= 15
    from fractions import Fraction

    assert sum(Fraction(1, 1 << l) for l in nz) == 1


def test_random_images_roundtrip_fuzz():
    rng = np.random.default_rng(17)
    for _ in range(8):
        w = int(rng.integers(1, 40))
        h = int(rng.integers(1, 40))
        ch = int(rng.choice([1, 3, 4]))
        img = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
        if ch == 4:
            img[..., 3] = rng.integers(1, 255, (h, w), dtype=np.uint8)
        data = webpcodec.encode(w, h, img.tobytes(), channels=ch)
        w2, h2, c2, pix = webpcodec.decode(data)
        want = img if ch != 1 else np.repeat(img, 3, axis=2)
        assert (w2, h2) == (w, h)
        arr = np.frombuffer(pix, dtype=np.uint8).reshape(h, w, c2)
        assert np.array_equal(arr[..., : want.shape[2]], want)
