"""GIF codec (dataprep/gifcodec.py): lossless LZW round-trip laws,
interlacing, sub-screen frame composition, table-overflow stress, and
routing through imagecodec."""

import os
import struct
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kapacitor_spark.dataprep import gifcodec, imagecodec


def _roundtrip(img, interlace=False):
    h, w, ch = img.shape
    data = gifcodec.encode(w, h, img.tobytes(), channels=ch, interlace=interlace)
    w2, h2, c2, pix = gifcodec.decode(data)
    assert (w2, h2, c2) == (w, h, 3)
    return np.frombuffer(pix, dtype=np.uint8).reshape(h, w, 3), data


@pytest.mark.parametrize("interlace", [False, True])
def test_rgb_roundtrip_lossless(interlace):
    rng = np.random.default_rng(1)
    img = (rng.integers(0, 4, (13, 17, 3)) * 80).astype(np.uint8)
    arr, _ = _roundtrip(img, interlace=interlace)
    assert np.array_equal(arr, img)


def test_grayscale_256_colors_roundtrip():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (64, 64, 1), dtype=np.uint8)
    arr, _ = _roundtrip(img)
    assert np.array_equal(arr, np.repeat(img, 3, axis=2))


def test_long_runs_exercise_table_overflow():
    """300x200 two-color stripes: LZW strings grow until the 12-bit table
    fills and the encoder emits CLEAR — decode must resync exactly."""
    img = np.zeros((200, 300, 3), dtype=np.uint8)
    img[::2] = 255
    arr, data = _roundtrip(img)
    assert np.array_equal(arr, img)
    assert len(data) < 200 * 300  # actually compressed


def test_high_entropy_roundtrip():
    """Worst-case incompressible indices still round-trip exactly (table
    churns constantly)."""
    rng = np.random.default_rng(3)
    img = np.repeat(rng.integers(0, 256, (97, 53, 1), dtype=np.uint8), 3, axis=2)
    arr, _ = _roundtrip(img)
    assert np.array_equal(arr, img)


def test_too_many_colors_raises():
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    assert len(np.unique(img.reshape(-1, 3), axis=0)) > 256
    with pytest.raises(ValueError, match="quantize"):
        gifcodec.encode(32, 32, img.tobytes(), channels=3)


def test_subscreen_frame_composes_on_background():
    """A frame smaller than the logical screen paints onto the background
    color at its (left, top) offset — hand-built GIF, not our encoder."""
    inner = np.full((2, 3, 3), 200, dtype=np.uint8)
    frame = gifcodec.encode(3, 2, inner.tobytes(), channels=3)
    # rewrite: screen 5x4, image descriptor at (1,1); palette color 0 is
    # the background. Our encoder's palette: [200,200,200] only → index 0
    # is 200 — craft a 2-color palette instead.
    pal = bytes([10, 20, 30, 200, 200, 200])  # bg, fg
    idx = bytes([1] * 6)
    lzw = gifcodec._lzw_encode(idx, 2)
    data = (
        b"GIF89a" + struct.pack("<HH", 5, 4) + bytes([0x80, 0, 0]) + pal
        + b"\x2c" + struct.pack("<HHHH", 1, 1, 3, 2) + b"\x00" + bytes([2])
        + bytes([len(lzw)]) + lzw + b"\x00\x3b"
    )
    w, h, c, pix = gifcodec.decode(data)
    arr = np.frombuffer(pix, dtype=np.uint8).reshape(4, 5, 3)
    assert (w, h, c) == (5, 4, 3)
    assert arr[0, 0].tolist() == [10, 20, 30]  # background
    assert arr[1, 1].tolist() == [200, 200, 200]  # frame content
    assert arr[2, 3].tolist() == [200, 200, 200]
    assert arr[3, 4].tolist() == [10, 20, 30]
    del frame


def test_gce_extension_skipped():
    """89a graphic-control extensions (and any other extension) are walked
    over without disturbing the image decode."""
    img = np.full((3, 3, 3), 66, dtype=np.uint8)
    data = bytearray(gifcodec.encode(3, 3, img.tobytes(), channels=3))
    desc = data.find(b"\x2c")
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    data2 = bytes(data[:desc]) + gce + bytes(data[desc:])
    w, h, c, pix = gifcodec.decode(data2)
    assert np.array_equal(
        np.frombuffer(pix, dtype=np.uint8).reshape(3, 3, 3), img
    )


def test_corrupt_raises():
    with pytest.raises(ValueError):
        gifcodec.decode(b"NOTGIF")
    img = np.full((4, 4, 3), 5, dtype=np.uint8)
    data = gifcodec.encode(4, 4, img.tobytes(), channels=3)
    with pytest.raises(ValueError):
        gifcodec.decode(data[:20])  # truncated before any image block


def test_imagecodec_routes_gif():
    img = (np.indices((6, 7)).sum(axis=0)[..., None] % 4 * 60).astype(np.uint8)
    rgb = np.repeat(img, 3, axis=2)
    data = gifcodec.encode(7, 6, rgb.tobytes(), channels=3)
    assert imagecodec.sniff_format(data) == "gif"
    assert imagecodec.parse_header(data) == ("gif", 7, 6)
    w, h, c, pix = imagecodec.decode(data)
    assert (w, h, c) == (7, 6, 3)
    assert np.array_equal(np.frombuffer(pix, dtype=np.uint8).reshape(6, 7, 3), rgb)


def test_local_color_table_overrides_global():
    """A frame-local color table takes precedence over the global one."""
    g_pal = bytes([1, 1, 1, 2, 2, 2])       # global: dark colors
    l_pal = bytes([250, 0, 0, 0, 250, 0])   # local: vivid colors
    idx = bytes([0, 1, 1, 0])
    lzw = gifcodec._lzw_encode(idx, 2)
    data = (
        b"GIF89a" + struct.pack("<HH", 4, 1) + bytes([0x80, 0, 0]) + g_pal
        + b"\x2c" + struct.pack("<HHHH", 0, 0, 4, 1)
        + bytes([0x80])  # local color table flag, size 2
        + l_pal + bytes([2])
        + bytes([len(lzw)]) + lzw + b"\x00\x3b"
    )
    w, h, c, pix = gifcodec.decode(data)
    arr = np.frombuffer(pix, dtype=np.uint8).reshape(1, 4, 3)
    assert arr[0, 0].tolist() == [250, 0, 0]
    assert arr[0, 1].tolist() == [0, 250, 0]


def test_subscreen_background_uses_global_table():
    """The background color index addresses the GLOBAL color table even
    when the frame carries a local one."""
    g_pal = bytes([11, 22, 33, 90, 90, 90])   # global: bg = entry 0
    l_pal = bytes([200, 0, 0, 0, 200, 0])     # local: frame colors
    idx = bytes([1, 1])
    lzw = gifcodec._lzw_encode(idx, 2)
    data = (
        b"GIF89a" + struct.pack("<HH", 3, 1) + bytes([0x80, 0, 0]) + g_pal
        + b"\x2c" + struct.pack("<HHHH", 0, 0, 2, 1)
        + bytes([0x80]) + l_pal + bytes([2])
        + bytes([len(lzw)]) + lzw + b"\x00\x3b"
    )
    w, h, c, pix = gifcodec.decode(data)
    arr = np.frombuffer(pix, dtype=np.uint8).reshape(1, 3, 3)
    assert arr[0, 0].tolist() == [0, 200, 0]   # frame, local table
    assert arr[0, 2].tolist() == [11, 22, 33]  # background, GLOBAL table


# --------------------------------------------------------------------- #
# animation (r9)
# --------------------------------------------------------------------- #


def test_animation_roundtrip_global_palette():
    """decode_frames(encode_frames(f)) == f — grayscale frames share one
    global table (union ≤ 256 colors)."""
    rng = np.random.RandomState(11)
    frames = [rng.randint(0, 256, (8, 10, 1), dtype=np.uint8).tobytes()
              for _ in range(4)]
    data = gifcodec.encode_frames(10, 8, frames, channels=1, delays=[4, 4, 4, 4])
    assert data[10] & 0x80, "expected a global color table"
    w, h, out = gifcodec.decode_frames(data)
    assert (w, h, len(out)) == (10, 8, 4)
    expected = [
        np.repeat(np.frombuffer(f, dtype=np.uint8).reshape(8, 10, 1), 3, axis=2)
        .tobytes()
        for f in frames
    ]
    assert out == expected


def test_animation_roundtrip_local_palettes():
    """When the union of colors exceeds 256 the writer falls back to a
    local color table per frame — still lossless."""
    rng = np.random.RandomState(12)
    frames = [rng.randint(0, 256, (6, 6, 3), dtype=np.uint8).tobytes()
              for _ in range(8)]
    data = gifcodec.encode_frames(6, 6, frames, channels=3)
    assert not (data[10] & 0x80), "expected NO global color table"
    w, h, out = gifcodec.decode_frames(data)
    assert out == frames
    # still-image decode() shows the first frame identically
    assert gifcodec.decode(data)[3] == out[0]


def _gce(disposal, transparent=None):
    packed = (disposal & 7) << 2 | (1 if transparent is not None else 0)
    return (b"\x21\xf9\x04" + bytes([packed]) + b"\x00\x00"
            + bytes([transparent or 0]) + b"\x00")


def _img(left, top, fw, fh, indices):
    body = b"\x2c" + struct.pack("<HHHH", left, top, fw, fh) + b"\x00\x02"
    lzw = gifcodec._lzw_encode(bytes(indices), 2)
    sub = bytearray()
    for i in range(0, len(lzw), 255):
        sub += bytes([len(lzw[i:i + 255])]) + lzw[i:i + 255]
    return body + bytes(sub) + b"\x00"


_PAL4 = bytes([0, 0, 0, 255, 0, 0, 0, 255, 0, 0, 0, 255])  # k,R,G,B


def test_animation_disposal_background_and_transparency():
    """Disposal 2 restores the block region to the background color;
    a transparent index shows the prior canvas through."""
    hdr = b"GIF89a" + struct.pack("<HH", 4, 2) + bytes([0x80 | 1, 1, 0]) + _PAL4
    data = (hdr
            + _gce(2) + _img(0, 0, 4, 2, [2] * 8)            # green, dispose->bg
            + _gce(0, transparent=0) + _img(1, 1, 2, 1, [3, 0])  # blue + hole
            + b"\x3b")
    w, h, out = gifcodec.decode_frames(data)
    f1 = np.frombuffer(out[0], dtype=np.uint8).reshape(2, 4, 3)
    assert (f1 == [0, 255, 0]).all()
    f2 = np.frombuffer(out[1], dtype=np.uint8).reshape(2, 4, 3)
    assert f2[1, 1].tolist() == [0, 0, 255]    # drawn pixel
    assert f2[1, 2].tolist() == [255, 0, 0]    # transparent -> bg (red) shows
    assert f2[0, 0].tolist() == [255, 0, 0]    # region outside block = bg


def test_animation_disposal_restore_previous():
    """Disposal 3 restores the region to the pre-frame canvas."""
    hdr = b"GIF89a" + struct.pack("<HH", 4, 2) + bytes([0x80 | 1, 1, 0]) + _PAL4
    data = (hdr
            + _gce(3) + _img(0, 0, 1, 1, [3])       # blue top-left, restore after
            + _gce(0) + _img(0, 0, 4, 2, [0] * 8)   # full black
            + b"\x3b")
    w, h, out = gifcodec.decode_frames(data)
    f1 = np.frombuffer(out[0], dtype=np.uint8).reshape(2, 4, 3)
    assert f1[0, 0].tolist() == [0, 0, 255]
    assert f1[0, 1].tolist() == [255, 0, 0]  # untouched canvas = bg red
    f2 = np.frombuffer(out[1], dtype=np.uint8).reshape(2, 4, 3)
    assert (f2 == 0).all()


def test_animation_gce_governs_single_block():
    """A Graphic Control Extension applies to exactly one rendering
    block: the next block renders with defaults (no transparency)."""
    hdr = b"GIF89a" + struct.pack("<HH", 2, 1) + bytes([0x80 | 1, 0, 0]) + _PAL4
    data = (hdr
            + _gce(0, transparent=1) + _img(0, 0, 2, 1, [1, 2])  # red hole, green
            + _img(0, 0, 2, 1, [1, 1])                            # plain red
            + b"\x3b")
    w, h, out = gifcodec.decode_frames(data)
    f1 = np.frombuffer(out[0], dtype=np.uint8).reshape(1, 2, 3)
    assert f1[0, 0].tolist() == [0, 0, 0]    # transparent idx 1 -> black bg
    assert f1[0, 1].tolist() == [0, 255, 0]
    f2 = np.frombuffer(out[1], dtype=np.uint8).reshape(1, 2, 3)
    assert f2[0, 0].tolist() == [255, 0, 0]  # idx 1 now renders normally


def test_animation_block_outside_screen_is_tolerated():
    """An image block placed past the logical screen clamps to an empty
    region — the frame still emits the untouched canvas instead of a
    numpy broadcast error."""
    hdr = b"GIF89a" + struct.pack("<HH", 4, 2) + bytes([0x80 | 1, 1, 0]) + _PAL4
    data = hdr + _gce(0) + _img(0, 5, 2, 2, [2, 2, 2, 2]) + b"\x3b"
    w, h, out = gifcodec.decode_frames(data)
    f1 = np.frombuffer(out[0], dtype=np.uint8).reshape(2, 4, 3)
    assert (f1 == [255, 0, 0]).all()  # canvas stays background red
