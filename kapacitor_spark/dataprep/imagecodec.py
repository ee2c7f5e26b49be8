"""Stdlib-only image codec for the multimodal dataprep path.

The container has no imaging libraries (PIL/opencv), but a large share of
real-world image bytes are decodable with nothing beyond ``zlib``/``struct``
— PNG (deflate + per-row filters; gray/RGB/palette incl. sub-byte
packing and tRNS alpha, 16-bit high-byte downconversion, Adam7
interlace), uncompressed BMP, the Netpbm
formats, huffman-coded JPEG — baseline AND progressive — (via the
``jpegcodec`` sibling: canonical Huffman + IDCT in numpy, Annex-G
spectral selection / successive approximation), GIF (via ``gifcodec``:
variable-width LZW, interlace, color tables), and lossless WebP (via
``webpcodec``: full VP8L). This module routes them all, so the
multimodal operators' ``fake=False`` paths produce REAL pixels in this
container; only lossy WebP (and arithmetic-coded JPEG) still raise
``NotImplementedError`` at full-decode time.

All decoders return interleaved uint8 rows ``(width, height, channels,
pixel_bytes)``; pixel order is HWC (row-major, channels innermost).
Per-pixel work is numpy-vectorized where the format allows; PNG's Sub
filter is a per-lane cumsum, and the inherently sequential Average/Paeth
rows run as plain-int Python loops (~10x faster than per-step numpy at
byte-lane widths; a fully-Paeth 512x512 RGB decodes in ~0.2 s). Payload
decode always runs inside an Arrow-batched mapInPandas worker, never on
the driver.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = [
    "sniff_format",
    "parse_header",
    "decode",
    "encode_png",
    "encode_ppm",
    "encode_bmp",
    "resize_nearest",
]

PNG_SIG = b"\x89PNG\r\n\x1a\n"


# --------------------------------------------------------------------- #
# sniffing + header-only metadata (cheap: no pixel decode)
# --------------------------------------------------------------------- #


def sniff_format(data: bytes) -> str | None:
    """Magic-byte format sniff. Returns None for unknown payloads."""
    if data.startswith(PNG_SIG):
        return "png"
    if data.startswith(b"BM"):
        return "bmp"
    if data.startswith(b"P6"):
        return "ppm"
    if data.startswith(b"P5"):
        return "pgm"
    if data.startswith(b"\xff\xd8\xff"):
        return "jpeg"
    if data.startswith(b"GIF87a") or data.startswith(b"GIF89a"):
        return "gif"
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        return "webp"
    return None


def _pnm_header(data: bytes):
    """Parse 'P5|P6 <w> <h> <maxval>' allowing comments/whitespace.
    Returns (width, height, maxval, pixel_offset)."""
    pos = 2
    vals = []
    while len(vals) < 3:
        # skip whitespace and '#' comments
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if pos < len(data) and data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PNM header")
        vals.append(int(data[start:pos]))
    return vals[0], vals[1], vals[2], pos + 1  # single whitespace after maxval


def _jpeg_dims(data: bytes):
    """Scan JPEG markers for the SOFn frame header (dims live there)."""
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        seg_len = struct.unpack(">H", data[pos + 2 : pos + 4])[0]
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            h, w = struct.unpack(">HH", data[pos + 5 : pos + 9])
            return w, h
        pos += 2 + seg_len
    return None, None


def parse_header(data: bytes):
    """(format, width, height) from the header bytes alone — the cheap
    metadata pass (attach_binary_metadata). Dims are None when the format
    is unknown or its header isn't parseable without a full decode."""
    fmt = sniff_format(data)
    try:
        if fmt == "png":
            w, h = struct.unpack(">II", data[16:24])
            return fmt, w, h
        if fmt == "bmp":
            w, h = struct.unpack("<ii", data[18:26])
            return fmt, w, abs(h)
        if fmt in ("ppm", "pgm"):
            w, h, _, _ = _pnm_header(data)
            return fmt, w, h
        if fmt == "jpeg":
            w, h = _jpeg_dims(data)
            return fmt, w, h
        if fmt == "gif":
            w, h = struct.unpack("<HH", data[6:10])
            return fmt, w, h
    except (struct.error, ValueError, IndexError):
        return fmt, None, None
    return fmt, None, None


# --------------------------------------------------------------------- #
# full decode
# --------------------------------------------------------------------- #


def _png_unfilter(raw: bytes, stride: int, h: int, left: int) -> np.ndarray:
    """Undo per-row PNG filters over ``h`` scanlines of ``stride`` bytes;
    ``left`` is the byte distance to the left reference (max(1, bpp//8)
    per the spec — sub-byte depths filter with distance 1)."""
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    prev_list = None  # plain-int twin, built lazily for filters 3/4 only
    pos = 0
    npos = -(-stride // left)  # pixel positions along a row (invariant)
    pad = npos * left - stride

    def lanes(arr):
        if pad:
            arr = np.concatenate([arr, np.zeros(pad, dtype=np.uint8)])
        return arr.reshape(npos, left)

    for y in range(h):
        ftype = raw[pos]
        row = np.frombuffer(raw[pos + 1 : pos + 1 + stride], dtype=np.uint8).copy()
        pos += 1 + stride
        if ftype == 0:  # None
            cur = row
        elif ftype == 2:  # Up (vectorized; uint8 add wraps mod 256)
            cur = row + prev
        elif ftype == 1:  # Sub: out[x] = in[x] + out[x-left] is a running
            # sum per byte lane — one vectorized cumsum mod 256
            cur = (
                np.cumsum(lanes(row).astype(np.int64), axis=0) % 256
            ).astype(np.uint8).reshape(-1)[:stride]
        elif ftype == 3:  # Average: inherently sequential — plain-int loop
            # beats per-step numpy ~5x at byte-lane widths
            cl = row.tolist()  # true Python ints (np scalars are ~10x slower)
            pv = prev_list if prev_list is not None else prev.tolist()
            for x in range(stride):
                lv = cl[x - left] if x >= left else 0
                cl[x] = (cl[x] + ((lv + pv[x]) >> 1)) & 0xFF
            cur = np.frombuffer(bytes(cl), dtype=np.uint8)
        elif ftype == 4:  # Paeth: same sequential plain-int loop
            cl = row.tolist()
            pv = prev_list if prev_list is not None else prev.tolist()
            for x in range(stride):
                a = cl[x - left] if x >= left else 0
                b = pv[x]
                c = pv[x - left] if x >= left else 0
                p = a + b - c
                pa = p - a if p >= a else a - p
                pb = p - b if p >= b else b - p
                pc = p - c if p >= c else c - p
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cl[x] = (cl[x] + pred) & 0xFF
            cur = np.frombuffer(bytes(cl), dtype=np.uint8)
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = cur
        prev = out[y]
        # keep the plain-int twin only while sequential filters are in
        # play; fully-vectorized rows skip the O(stride) conversion
        prev_list = cl if ftype in (3, 4) else None
    return out


_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
# Adam7 passes: (x0, y0, dx, dy)
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _png_rows_to_samples(rows: np.ndarray, w: int, depth: int, nch: int) -> np.ndarray:
    """(h, stride) filtered bytes → (h, w, nch) uint8 raw samples
    (palette indices stay indices; 16-bit keeps the high byte)."""
    h = rows.shape[0]
    if depth == 8:
        return rows[:, : w * nch].reshape(h, w, nch)
    if depth == 16:
        return rows[:, : w * nch * 2].reshape(h, w * nch, 2)[:, :, 0].reshape(
            h, w, nch
        )
    # 1/2/4-bit (gray or palette → single channel), MSB-first packing
    per = 8 // depth
    mask = (1 << depth) - 1
    cols = [
        (rows >> (8 - depth * (k + 1))) & mask for k in range(per)
    ]
    unpacked = np.stack(cols, axis=-1).reshape(h, -1)[:, :w]
    return unpacked[..., None]


def _decode_png(data: bytes):
    pos = 8
    idat = []
    w = h = None
    bit_depth = color_type = interlace = None
    palette = None
    trns = None
    while pos + 8 <= len(data):
        ln, typ = struct.unpack(">I4s", data[pos : pos + 8])
        chunk = data[pos + 8 : pos + 8 + ln]
        if typ == b"IHDR":
            w, h, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", chunk
            )
        elif typ == b"PLTE":
            palette = np.frombuffer(chunk, dtype=np.uint8).reshape(-1, 3)
        elif typ == b"tRNS":
            trns = np.frombuffer(chunk, dtype=np.uint8)
        elif typ == b"IDAT":
            idat.append(chunk)
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if w is None:
        raise ValueError("PNG missing IHDR")
    nch = _PNG_CHANNELS.get(color_type)
    if nch is None:
        raise NotImplementedError(f"PNG color type {color_type}")
    if bit_depth not in (1, 2, 4, 8, 16):
        raise ValueError(f"bad PNG bit depth {bit_depth}")
    if bit_depth < 8 and color_type not in (0, 3):
        raise ValueError("sub-byte depth is only valid for gray/palette PNG")
    bits_pp = nch * bit_depth
    left = max(1, bits_pp // 8)
    raw = zlib.decompress(b"".join(idat))
    if not interlace:
        stride = (w * bits_pp + 7) // 8
        rows = _png_unfilter(raw, stride, h, left)
        samples = _png_rows_to_samples(rows, w, bit_depth, nch)
    elif interlace == 1:  # Adam7
        samples = np.zeros((h, w, nch), dtype=np.uint8)
        at = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            stride = (pw * bits_pp + 7) // 8
            need = ph * (1 + stride)
            rows = _png_unfilter(raw[at : at + need], stride, ph, left)
            at += need
            samples[y0::dy, x0::dx] = _png_rows_to_samples(
                rows, pw, bit_depth, nch
            )
    else:
        raise ValueError(f"bad PNG interlace method {interlace}")
    if color_type == 3:
        if palette is None:
            raise ValueError("palette PNG missing PLTE")
        idx = samples[..., 0]
        rgb = palette[np.minimum(idx, len(palette) - 1)]
        if trns is not None:
            alpha = np.full(256, 255, dtype=np.uint8)
            alpha[: len(trns)] = trns
            out = np.dstack([rgb, alpha[np.minimum(idx, 255)]])
            return w, h, 4, np.ascontiguousarray(out).tobytes()
        return w, h, 3, np.ascontiguousarray(rgb).tobytes()
    if color_type == 0 and bit_depth < 8:
        # scale sub-byte gray samples to full range
        samples = (
            samples.astype(np.uint16) * 255 // ((1 << bit_depth) - 1)
        ).astype(np.uint8)
    return w, h, nch, np.ascontiguousarray(samples).tobytes()


def _bmp_palette(data: bytes, info_size: int, colors_used: int) -> np.ndarray:
    """Color table right after the info header: BGRA quads → (n, 3) RGB."""
    n = colors_used or 256
    start = 14 + info_size
    quads = np.frombuffer(data[start : start + 4 * n], dtype=np.uint8).reshape(
        -1, 4
    )
    return quads[:, [2, 1, 0]]  # BGR(A) → RGB


def _bmp_rle8(data: bytes, pix_off: int, w: int, h: int) -> np.ndarray:
    """Microsoft RLE8: (count, value) runs; escapes 0=EOL, 1=EOB,
    2=delta, n≥3=absolute run padded to word. Rows are BOTTOM-UP."""
    out = np.zeros((h, w), dtype=np.uint8)
    x = y = 0  # y counts from the bottom row
    pos = pix_off
    while pos + 1 < len(data) and y < h:
        cnt, val = data[pos], data[pos + 1]
        pos += 2
        if cnt > 0:
            out[y, x : min(x + cnt, w)] = val
            x = min(x + cnt, w)
        elif val == 0:  # end of line
            x, y = 0, y + 1
        elif val == 1:  # end of bitmap
            break
        elif val == 2:  # delta
            x = min(x + data[pos], w)
            y += data[pos + 1]
            pos += 2
        else:  # absolute run
            n = val
            run = np.frombuffer(data[pos : pos + n], dtype=np.uint8)
            out[y, x : min(x + n, w)] = run[: max(0, min(x + n, w) - x)]
            x = min(x + n, w)
            pos += n + (n & 1)  # word-aligned
    return out[::-1]  # bottom-up → top-down


def _decode_bmp(data: bytes):
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (pix_off,) = struct.unpack("<I", data[10:14])
    (info_size,) = struct.unpack("<I", data[14:18])
    w, h_signed = struct.unpack("<ii", data[18:26])
    (bpp,) = struct.unpack("<H", data[28:30])
    (compression,) = struct.unpack("<I", data[30:34])
    colors_used = struct.unpack("<I", data[46:50])[0] if info_size >= 36 else 0
    h = abs(h_signed)
    if bpp == 8:
        pal = _bmp_palette(data, info_size, colors_used)
        if compression == 1:  # RLE8
            idx = _bmp_rle8(data, pix_off, w, h)
            if h_signed < 0:
                idx = idx[::-1]  # top-down files store rows in order
        elif compression == 0:
            row_stride = (w + 3) & ~3
            idx = np.frombuffer(
                data[pix_off : pix_off + row_stride * h], dtype=np.uint8
            ).reshape(h, row_stride)[:, :w]
            if h_signed > 0:
                idx = idx[::-1]
        else:
            raise NotImplementedError(f"BMP compression {compression}")
        rgb = pal[np.minimum(idx, len(pal) - 1)]
        return w, h, 3, np.ascontiguousarray(rgb).tobytes()
    if compression != 0:
        raise NotImplementedError("compressed BMP")
    if bpp not in (24, 32):
        raise NotImplementedError(f"{bpp}-bit BMP (8/24/32 supported)")
    bytes_pp = bpp // 8
    row_stride = (w * bytes_pp + 3) & ~3
    arr = np.frombuffer(
        data[pix_off : pix_off + row_stride * h], dtype=np.uint8
    ).reshape(h, row_stride)[:, : w * bytes_pp].reshape(h, w, bytes_pp)
    if h_signed > 0:  # bottom-up storage
        arr = arr[::-1]
    rgb = arr[:, :, [2, 1, 0]]  # BGR(A) → RGB, alpha dropped
    return w, h, 3, np.ascontiguousarray(rgb).tobytes()


def _decode_pnm(data: bytes):
    channels = 3 if data[:2] == b"P6" else 1
    w, h, maxval, off = _pnm_header(data)
    if maxval > 255:
        raise NotImplementedError("16-bit PNM")
    n = w * h * channels
    pix = data[off : off + n]
    if len(pix) < n:
        raise ValueError("truncated PNM pixel data")
    return w, h, channels, pix


def decode(data: bytes):
    """Full pixel decode → (width, height, channels, uint8 HWC bytes).
    PNG/BMP/PNM decode here; JPEG (baseline + progressive), GIF, and
    lossless WebP route to their sibling codecs. Only lossy VP8 and
    arithmetic-coded JPEG raise NotImplementedError (header metadata via
    parse_header still works)."""
    fmt = sniff_format(data)
    if fmt == "png":
        return _decode_png(data)
    if fmt == "bmp":
        return _decode_bmp(data)
    if fmt in ("ppm", "pgm"):
        return _decode_pnm(data)
    if fmt == "jpeg":
        from kapacitor_spark.dataprep import jpegcodec

        return jpegcodec.decode(data)
    if fmt == "gif":
        from kapacitor_spark.dataprep import gifcodec

        return gifcodec.decode(data)
    if fmt == "webp":
        from kapacitor_spark.dataprep import webpcodec

        # lossless VP8L decodes; lossy VP8 raises NotImplementedError there
        return webpcodec.decode(data)
    raise ValueError("unrecognized image payload")


# --------------------------------------------------------------------- #
# encode (round-trip tests + resize re-encode)
# --------------------------------------------------------------------- #


def encode_png(w: int, h: int, pixels: bytes, channels: int = 3) -> bytes:
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    stride = w * channels
    raw = b"".join(
        b"\x00" + pixels[y * stride : (y + 1) * stride] for y in range(h)
    )

    def chunk(typ: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + typ
            + payload
            + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def encode_ppm(w: int, h: int, pixels: bytes, channels: int = 3) -> bytes:
    magic = b"P6" if channels == 3 else b"P5"
    return magic + f"\n{w} {h}\n255\n".encode() + pixels


def encode_bmp(w: int, h: int, pixels: bytes) -> bytes:
    """24-bit uncompressed BMP from RGB HWC bytes (bottom-up rows)."""
    rgb = np.frombuffer(pixels, dtype=np.uint8).reshape(h, w, 3)
    bgr = rgb[::-1, :, [2, 1, 0]]
    row_stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, row_stride), dtype=np.uint8)
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    pix = rows.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(pix), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix), 2835, 2835, 0, 0)
    return header + info + pix


def resize_nearest(
    pixels: bytes, w: int, h: int, channels: int, new_w: int, new_h: int
) -> bytes:
    """Nearest-neighbor resize over the uint8 HWC buffer (numpy gather)."""
    arr = np.frombuffer(pixels, dtype=np.uint8).reshape(h, w, channels)
    ys = (np.arange(new_h) * h) // new_h
    xs = (np.arange(new_w) * w) // new_w
    return np.ascontiguousarray(arr[ys][:, xs]).tobytes()
