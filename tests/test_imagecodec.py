"""Real (stdlib-only) image codec: PNG/BMP/PNM decode, header parsing for
JPEG/GIF, nearest resize — plus the multimodal operators' ``fake=False``
paths end-to-end through Spark with real pixels."""

import os
import struct
import sys
import zlib

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kapacitor_spark.dataprep import imagecodec as ic


def _pix(w, h, ch, seed=7):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=w * h * ch, dtype=np.uint8).tobytes()


# ------------------------------------------------------------------ #
# PNG
# ------------------------------------------------------------------ #


@pytest.mark.parametrize("ch", [1, 2, 3, 4])
def test_png_roundtrip(ch):
    w, h = 5, 4
    pixels = _pix(w, h, ch)
    data = ic.encode_png(w, h, pixels, channels=ch)
    assert ic.sniff_format(data) == "png"
    assert ic.parse_header(data) == ("png", w, h)
    rw, rh, rch, rpix = ic.decode(data)
    assert (rw, rh, rch) == (w, h, ch)
    assert rpix == pixels


def _forward_filter(ftype, row, prev, bpp):
    """Apply the PNG forward filter (encoder side) so the decoder's
    reconstruction of filters 1-4 is tested against known pixels."""
    out = bytearray(len(row))
    for x in range(len(row)):
        a = row[x - bpp] if x >= bpp else 0
        b = prev[x]
        c = prev[x - bpp] if x >= bpp else 0
        if ftype == 1:
            pred = a
        elif ftype == 2:
            pred = b
        elif ftype == 3:
            pred = (a + b) >> 1
        else:  # paeth
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
        out[x] = (row[x] - pred) & 0xFF
    return bytes(out)


@pytest.mark.parametrize("ftype", [1, 2, 3, 4])
def test_png_filter_reconstruction(ftype):
    w, h, ch = 6, 3, 3
    pixels = _pix(w, h, ch, seed=ftype)
    stride = w * ch
    rows = [pixels[y * stride : (y + 1) * stride] for y in range(h)]
    raw = b""
    prev = bytes(stride)
    for row in rows:
        raw += bytes([ftype]) + _forward_filter(ftype, row, prev, ch)
        prev = row

    def chunk(typ, payload):
        return (
            struct.pack(">I", len(payload)) + typ + payload
            + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    data = (
        ic.PNG_SIG + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
    )
    assert ic.decode(data)[3] == pixels


# ------------------------------------------------------------------ #
# BMP / PNM / headers
# ------------------------------------------------------------------ #


def test_bmp_roundtrip_with_row_padding():
    w, h = 3, 2  # 9-byte rows pad to 12
    pixels = _pix(w, h, 3)
    data = ic.encode_bmp(w, h, pixels)
    assert ic.parse_header(data) == ("bmp", w, h)
    rw, rh, rch, rpix = ic.decode(data)
    assert (rw, rh, rch) == (w, h, 3)
    assert rpix == pixels


@pytest.mark.parametrize("ch", [1, 3])
def test_pnm_roundtrip(ch):
    w, h = 4, 3
    pixels = _pix(w, h, ch)
    data = ic.encode_ppm(w, h, pixels, channels=ch)
    fmt = "ppm" if ch == 3 else "pgm"
    assert ic.parse_header(data) == (fmt, w, h)
    assert ic.decode(data) == (w, h, ch, pixels)


def test_pnm_header_comments():
    data = b"P5\n# a comment\n 2 # inline\n2\n255\n" + bytes(4)
    assert ic.decode(data) == (2, 2, 1, bytes(4))


def test_jpeg_header_dims_and_scanless_decode_fails():
    sof = struct.pack(">BBHBHHB", 0xFF, 0xC0, 11, 8, 31, 47, 1)
    data = b"\xff\xd8\xff\xe0\x00\x04aa" + sof + b"\xff\xd9"
    assert ic.parse_header(data) == ("jpeg", 47, 31)
    # baseline JPEG decodes for real now (test_jpegcodec.py); this
    # header-only stub has no scan data and must fail loudly, not
    # fabricate pixels
    with pytest.raises(ValueError):
        ic.decode(data)


def test_gif_header_dims():
    data = b"GIF89a" + struct.pack("<HH", 12, 34) + b"\x00" * 10
    assert ic.parse_header(data) == ("gif", 12, 34)


def test_resize_nearest_2x_upsample():
    # 2x2 gray image; 4x4 nearest should replicate each pixel into 2x2
    pixels = bytes([10, 20, 30, 40])
    out = np.frombuffer(
        ic.resize_nearest(pixels, 2, 2, 1, 4, 4), dtype=np.uint8
    ).reshape(4, 4)
    assert out.tolist() == [
        [10, 10, 20, 20], [10, 10, 20, 20],
        [30, 30, 40, 40], [30, 30, 40, 40],
    ]


# ------------------------------------------------------------------ #
# Spark fake=False paths
# ------------------------------------------------------------------ #


def _payload_df(spark):
    rows = [
        (1, ic.encode_png(3, 2, _pix(3, 2, 3), channels=3)),
        (2, ic.encode_bmp(2, 2, _pix(2, 2, 3, seed=2))),
        (3, ic.encode_ppm(2, 3, _pix(2, 3, 1, seed=3), channels=1)),
    ]
    return spark.createDataFrame(rows, "doc_id long, payload binary")


def test_decode_full_real(spark):
    from kapacitor_spark.dataprep.multimodal import decode_full

    out = {
        r["doc_id"]: r
        for r in decode_full(_payload_df(spark), fake=False).collect()
    }
    assert (out[1]["width"], out[1]["height"], out[1]["format"]) == (3, 2, "png")
    assert (out[2]["width"], out[2]["height"], out[2]["format"]) == (2, 2, "bmp")
    assert (out[3]["width"], out[3]["height"], out[3]["format"]) == (2, 3, "pgm")
    # real pixels, really decoded
    exp = [x / 255.0 for x in _pix(3, 2, 3)]
    assert out[1]["pixels"] == pytest.approx(exp)
    assert len(out[3]["pixels"]) == 2 * 3 * 1


def test_dhash_expr_known_bits(spark):
    """A 9x8 gradient image (every row strictly increasing) must hash to
    all-ones (-1 as a signed long); its row-reversed twin to all-zeros."""
    from pyspark.sql import functions as F

    from kapacitor_spark.dataprep.multimodal import dhash_expr

    inc = [c / 255.0 for r in range(8) for c in range(9)]
    dec = [(8 - c) / 255.0 for r in range(8) for c in range(9)]
    df = spark.createDataFrame(
        [(1, inc), (2, dec)], "doc_id long, pixels array<float>"
    )
    out = {
        r["doc_id"]: r["h"]
        for r in df.select("doc_id", dhash_expr("pixels", 9, 8).alias("h")).collect()
    }
    assert out[1] == -1  # all 64 gradient bits set
    assert out[2] == 0


def test_dhash_small_edit_flips_few_bits(spark):
    """Perturbing one interior pixel flips at most 2 dHash bits (its left
    and right comparison); an unrelated image sits ~32 bits away."""
    import random

    from kapacitor_spark.dataprep.multimodal import dhash_expr

    rng = random.Random(7)
    base = [rng.randrange(256) / 255.0 for _ in range(72)]
    edited = list(base)
    edited[4 * 9 + 3] = (base[4 * 9 + 3] * 255 + 128) % 256 / 255.0
    other = [rng.randrange(256) / 255.0 for _ in range(72)]
    df = spark.createDataFrame(
        [(1, base), (2, edited), (3, other)], "doc_id long, pixels array<float>"
    )
    hs = {
        r["doc_id"]: r["h"]
        for r in df.select("doc_id", dhash_expr("pixels", 9, 8).alias("h")).collect()
    }
    assert bin((hs[1] ^ hs[2]) & ((1 << 64) - 1)).count("1") <= 2
    assert bin((hs[1] ^ hs[3]) & ((1 << 64) - 1)).count("1") > 10


def test_image_dhash_near_dup_planted(spark):
    """End-to-end: real PGM payloads, a planted re-encode-with-edit pair
    must surface and the unrelated image must not pair with anything."""
    from kapacitor_spark.dataprep.multimodal import image_dhash_near_dup

    import random

    rng = random.Random(13)
    pix = bytes(rng.randrange(256) for _ in range(72))
    edited = bytearray(pix)
    edited[20] = (edited[20] + 128) % 256
    other = bytes(rng.randrange(256) for _ in range(72))
    hdr = b"P5\n9 8\n255\n"
    df = spark.createDataFrame(
        [(1, hdr + pix), (2, hdr + bytes(edited)), (3, hdr + other)],
        "doc_id long, payload binary",
    )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in image_dhash_near_dup(df, width=9, height=8, max_hamming=6).collect()
    }
    assert pairs == {(1, 2)}


def test_attach_metadata_real_includes_jpeg_dims(spark):
    from kapacitor_spark.dataprep.multimodal import attach_binary_metadata

    sof = struct.pack(">BBHBHHB", 0xFF, 0xC0, 11, 8, 31, 47, 1)
    jpeg = b"\xff\xd8\xff\xe0\x00\x04aa" + sof + b"\xff\xd9"
    df = spark.createDataFrame([(9, jpeg)], "doc_id long, payload binary")
    r = attach_binary_metadata(df, fake=False).collect()[0]
    assert (r["format"], r["width"], r["height"]) == ("jpeg", 47, 31)
    assert r["size_bytes"] == len(jpeg)


def test_resize_real_roundtrips_through_png(spark):
    from kapacitor_spark.dataprep.multimodal import resize_image_batch

    out = resize_image_batch(
        _payload_df(spark), width=4, height=4, fake=False
    ).collect()
    assert all((r["width"], r["height"]) == (4, 4) for r in out)
    for r in out:
        w, h, ch, pix = ic.decode(bytes(r["payload"]))
        assert (w, h) == (4, 4)
        assert len(pix) == 16 * ch


def test_decode_image_batch_raises_only_for_entropy_coded(spark):
    """Lossy WebP (VP8 arithmetic coding) stays out of scope — lossless
    VP8L, baseline JPEG, and GIF all decode for real now."""
    from kapacitor_spark.dataprep.multimodal import decode_image_batch

    webp = b"RIFF\x0c\x00\x00\x00WEBPVP8 \x04\x00\x00\x00rest"
    df = spark.createDataFrame([(1, webp)], "doc_id long, payload binary")
    with pytest.raises(Exception, match="libwebp"):
        decode_image_batch(df, fake=False).collect()


def test_decode_image_batch_decodes_real_jpeg(spark):
    from kapacitor_spark.dataprep import jpegcodec
    from kapacitor_spark.dataprep.multimodal import decode_image_batch

    img = np.full((8, 8, 1), 77, dtype=np.uint8)
    payload = jpegcodec.encode(8, 8, img.tobytes(), channels=1, quality=90)
    df = spark.createDataFrame([(1, payload)], "doc_id long, payload binary")
    rows = decode_image_batch(df, fake=False).collect()
    assert len(rows) == 1
    pix = rows[0]["pixels"]
    assert len(pix) == 64 and all(abs(p - 77 / 255.0) < 1e-6 for p in pix)


def test_bmp_8bit_palette_uncompressed():
    import struct as st

    pal = b"".join(bytes([b, g, r, 0]) for r, g, b in
                   [(255, 0, 0), (0, 255, 0), (0, 0, 255)])
    pal += bytes(4 * 253)
    # 3x2 indices, rows padded to 4 bytes, BOTTOM-UP storage
    rows = bytes([2, 1, 0, 0]) + bytes([0, 1, 2, 0])  # bottom row first
    pix_off = 14 + 40 + len(pal)
    header = st.pack("<2sIHHI", b"BM", pix_off + len(rows), 0, 0, pix_off)
    info = st.pack("<IiiHHIIiiII", 40, 3, 2, 1, 8, 0, len(rows), 0, 0, 256, 0)
    data = header + info + pal + rows
    w, h, c, pix = ic.decode(data)
    arr = np.frombuffer(pix, dtype=np.uint8).reshape(2, 3, 3)
    assert (w, h, c) == (3, 2, 3)
    assert arr[0].tolist() == [[255, 0, 0], [0, 255, 0], [0, 0, 255]]  # top row
    assert arr[1].tolist() == [[0, 0, 255], [0, 255, 0], [255, 0, 0]]


def test_bmp_rle8():
    import struct as st

    pal = bytes(4 * 256)
    pal = bytearray(pal)
    for i, (r, g, b) in enumerate([(9, 9, 9), (200, 100, 50)]):
        pal[4 * i : 4 * i + 4] = bytes([b, g, r, 0])
    # 5x2 image: bottom row = run of 5 index-1; EOL; top row = absolute
    # run [0,1,0] + encoded run 2x index 1; EOL; EOB
    rle = bytes([5, 1, 0, 0,          # run 5x'1', end of line
                 0, 3, 0, 1, 0, 0,    # absolute run 3 bytes (padded to word)
                 2, 1,                # run 2x'1'
                 0, 0, 0, 1])         # EOL, EOB
    pix_off = 14 + 40 + len(pal)
    header = st.pack("<2sIHHI", b"BM", pix_off + len(rle), 0, 0, pix_off)
    info = st.pack("<IiiHHIIiiII", 40, 5, 2, 1, 8, 1, len(rle), 0, 0, 256, 0)
    data = header + info + bytes(pal) + rle
    w, h, c, pix = ic.decode(data)
    arr = np.frombuffer(pix, dtype=np.uint8).reshape(2, 5, 3)
    A, B = [9, 9, 9], [200, 100, 50]
    assert arr[1].tolist() == [B, B, B, B, B]          # bottom row
    assert arr[0].tolist() == [A, B, A, B, B]          # top row


def test_phash_invariances_and_rederivation(spark):
    """pHash: gain/offset invariant (positive scaling moves all AC
    coefficients and their median together; offsets land only in the
    excluded DC), and the numpy matmul DCT equals an independent pure-
    Python cosine-sum rederivation."""
    import math
    import random

    from kapacitor_spark.dataprep.multimodal import phash_batch

    rng = random.Random(17)
    w = h = 9, 8
    pix = [rng.random() for _ in range(72)]
    scaled = [p * 3.5 + 0.2 for p in pix]
    df = spark.createDataFrame(
        [(1, pix), (2, scaled)], "doc_id long, pixels array<double>"
    )
    out = {
        r["doc_id"]: r["phash"]
        for r in phash_batch(df, width=9, height=8).collect()
    }
    assert out[1] == out[2]

    # independent rederivation: nearest-resample to 32x32, DCT-II by
    # explicit cosine sums, 8x8 block, median threshold over AC
    n, keep = 32, 8
    ry = [(i * 8) // n for i in range(n)]
    rx = [(i * 9) // n for i in range(n)]
    small = [[pix[ry[r] * 9 + rx[c]] for c in range(n)] for r in range(n)]

    def c(k):
        return math.sqrt((1.0 if k == 0 else 2.0) / n)

    coef = {}
    for u in range(keep):
        for v in range(keep):
            s = 0.0
            for r in range(n):
                for cc in range(n):
                    s += (
                        small[r][cc]
                        * math.cos(math.pi * (2 * r + 1) * u / (2 * n))
                        * math.cos(math.pi * (2 * cc + 1) * v / (2 * n))
                    )
            coef[(u, v)] = c(u) * c(v) * s
    block = [coef[(u, v)] for u in range(keep) for v in range(keep)]
    ac = sorted(block[1:])
    med = ac[31]  # 63 AC coefficients -> single middle element
    sig = 0
    for j, val in enumerate(block[1:]):
        if val > med:
            sig |= 1 << j
    if sig >= 1 << 63:
        sig -= 1 << 64
    assert out[1] == sig


def test_image_phash_near_dup_planted(spark):
    """End-to-end pHash near-dup on real PGM payloads: a one-pixel edit
    pairs with its original; an unrelated image does not."""
    import random

    from kapacitor_spark.dataprep.multimodal import image_phash_near_dup

    rng = random.Random(23)
    pix = bytes(rng.randrange(256) for _ in range(72))
    edited = bytearray(pix)
    edited[30] = (edited[30] + 96) % 256
    other = bytes(rng.randrange(256) for _ in range(72))
    hdr = b"P5\n9 8\n255\n"
    df = spark.createDataFrame(
        [(1, hdr + pix), (2, hdr + bytes(edited)), (3, hdr + other)],
        "doc_id long, payload binary",
    )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in image_phash_near_dup(
            df, width=9, height=8, max_hamming=10
        ).collect()
    }
    assert pairs == {(1, 2)}


def test_phash_keep_guard(spark):
    """keep > 8 would pack more than 64 AC bits into the LongType hash —
    refused at entry instead of silently corrupting signatures."""
    import pytest as _pytest

    from kapacitor_spark.dataprep.multimodal import phash_batch

    df = spark.createDataFrame([(1, [0.0] * 16)], "doc_id long, pixels array<float>")
    with _pytest.raises(ValueError, match="keep"):
        phash_batch(df, width=4, height=4, channels=1, keep=9)
