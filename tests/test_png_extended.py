"""Extended PNG decode (imagecodec.py): palette (incl. sub-byte packing
and tRNS alpha), 16-bit downconversion, sub-byte grayscale scaling, and
Adam7 interlace — all against hand-built chunk streams with expectations
computed independently in the test."""

import os
import struct
import sys
import zlib

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kapacitor_spark.dataprep import imagecodec as ic


def _chunk(typ, payload):
    return (
        struct.pack(">I", len(payload)) + typ + payload
        + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
    )


def _png(w, h, depth, color_type, raw_scanlines, extra_chunks=(), interlace=0):
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, interlace)
    out = ic.PNG_SIG + _chunk(b"IHDR", ihdr)
    for c in extra_chunks:
        out += c
    out += _chunk(b"IDAT", zlib.compress(raw_scanlines))
    return out + _chunk(b"IEND", b"")


def test_palette_8bit():
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # R, G, B
    rows = b"\x00" + bytes([0, 1, 2, 1])  # filter 0 + 4 indices
    data = _png(4, 1, 8, 3, rows, extra_chunks=[_chunk(b"PLTE", pal)])
    w, h, c, pix = ic.decode(data)
    arr = np.frombuffer(pix, dtype=np.uint8).reshape(1, 4, 3)
    want = np.array([[[255, 0, 0], [0, 255, 0], [0, 0, 255], [0, 255, 0]]],
                    dtype=np.uint8)
    assert (w, h, c) == (4, 1, 3) and np.array_equal(arr, want)


def test_palette_2bit_packed_with_trns():
    pal = bytes([10, 10, 10, 20, 20, 20, 30, 30, 30, 40, 40, 40])
    trns = bytes([255, 128])  # entry 1 half-transparent; 2,3 default 255
    # 5 pixels at 2bpp MSB-first: indices 0,1,2,3,1 → bytes 00|01|10|11, 01|...
    packed = bytes([0b00011011, 0b01000000])
    rows = b"\x00" + packed
    data = _png(5, 1, 2, 3, rows,
                extra_chunks=[_chunk(b"PLTE", pal), _chunk(b"tRNS", trns)])
    w, h, c, pix = ic.decode(data)
    arr = np.frombuffer(pix, dtype=np.uint8).reshape(1, 5, 4)
    assert (w, h, c) == (5, 1, 4)
    assert arr[0, 0].tolist() == [10, 10, 10, 255]
    assert arr[0, 1].tolist() == [20, 20, 20, 128]
    assert arr[0, 2].tolist() == [30, 30, 30, 255]
    assert arr[0, 3].tolist() == [40, 40, 40, 255]
    assert arr[0, 4].tolist() == [20, 20, 20, 128]


def test_gray_1bit_scales_to_full_range():
    # 8 pixels: 10110010 → 255,0,255,255,0,0,255,0
    rows = b"\x00" + bytes([0b10110010])
    data = _png(8, 1, 1, 0, rows)
    w, h, c, pix = ic.decode(data)
    arr = np.frombuffer(pix, dtype=np.uint8)
    assert arr.tolist() == [255, 0, 255, 255, 0, 0, 255, 0]


def test_16bit_rgb_keeps_high_byte():
    px = struct.pack(">HHH", 0xABCD, 0x1234, 0xFF00)
    rows = b"\x00" + px
    data = _png(1, 1, 16, 2, rows)
    w, h, c, pix = ic.decode(data)
    assert list(pix) == [0xAB, 0x12, 0xFF]


def test_adam7_interlaced_rgb_roundtrip():
    """Build an interlaced PNG by splitting a known image into Adam7
    passes (filter 0 rows) and check the deinterlaced decode equals it."""
    rng = np.random.default_rng(5)
    w, h = 11, 9
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    raw = bytearray()
    for x0, y0, dx, dy in ic._ADAM7:
        sub = img[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        for row in sub:
            raw += b"\x00" + row.tobytes()
    data = _png(w, h, 8, 2, bytes(raw), interlace=1)
    w2, h2, c2, pix = ic.decode(data)
    arr = np.frombuffer(pix, dtype=np.uint8).reshape(h, w, 3)
    assert (w2, h2, c2) == (w, h, 3)
    assert np.array_equal(arr, img)


def test_adam7_interlaced_palette():
    pal = bytes([0, 0, 0, 255, 255, 255])
    w, h = 5, 5
    img_idx = (np.indices((h, w)).sum(axis=0) % 2).astype(np.uint8)
    raw = bytearray()
    for x0, y0, dx, dy in ic._ADAM7:
        sub = img_idx[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        for row in sub:
            raw += b"\x00" + row.tobytes()
    data = _png(w, h, 8, 3, bytes(raw),
                extra_chunks=[_chunk(b"PLTE", pal)], interlace=1)
    w2, h2, c2, pix = ic.decode(data)
    arr = np.frombuffer(pix, dtype=np.uint8).reshape(h, w, 3)
    want = np.stack([img_idx * 255] * 3, axis=-1)
    assert np.array_equal(arr, want)


def test_bad_depth_and_interlace_raise():
    rows = b"\x00" + bytes(3)
    with pytest.raises(ValueError):
        ic.decode(_png(1, 1, 3, 2, rows))
    with pytest.raises(ValueError):
        ic.decode(_png(1, 1, 8, 2, rows, interlace=2))
