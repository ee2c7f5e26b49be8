"""GIF codec, stdlib + numpy only (GIF87a/89a, published spec).

GIF's entropy coding is LZW — fully specified and implementable without
any external library. This closes the last common still-image gap in the
multimodal dataprep path:

- ``decode(data) -> (w, h, 3, rgb_bytes)``: first frame of GIF87a/89a —
  global/local color tables, interlaced images (deinterlaced), frames
  smaller than the logical screen composed onto the background color,
  variable-width LZW up to 12 bits with CLEAR/EOI handling.
- ``encode(w, h, pixels, channels, interlace=False) -> bytes``: builds a
  palette from the distinct colors (≤256, else raises — quantization is
  a modeling choice, not a codec concern) and LZW-compresses. Lossless:
  decode(encode(img)) == img exactly, which the round-trip tests pin.

Animation is out of scope by design (the dataprep contract is one pixel
tensor per payload; multi-frame media goes through the video path's
frame sampling instead).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode", "encode"]

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


# --------------------------------------------------------------------- #
# LZW
# --------------------------------------------------------------------- #


def _lzw_decode(data: bytes, min_code_size: int, expected: int) -> bytes:
    """Variable-width GIF LZW (spec appendix): codes LSB-first."""
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    acc = 0
    nbits = 0
    prev: bytes | None = None
    pos = 0
    while len(out) < expected:
        while nbits < code_size:
            if pos >= len(data):
                # tolerant: some encoders omit the explicit EOI
                return bytes(out[:expected])
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt GIF: LZW code out of range")
        if prev is not None and len(table) >= (1 << code_size) and code_size < 12:
            code_size += 1
        out += entry
        prev = entry
    return bytes(out[:expected])


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """Standard GIF LZW compressor (dict rebuild on 12-bit overflow)."""
    clear = 1 << min_code_size
    end = clear + 1

    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, size: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    code_size = min_code_size + 1
    emit(clear, code_size)
    w = b""
    for b in indices:
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        emit(table[w], code_size)
        table[wk] = next_code
        next_code += 1
        if next_code > (1 << code_size):
            if code_size < 12:
                code_size += 1
            else:
                emit(clear, code_size)
                table = {bytes([i]): i for i in range(clear)}
                next_code = end + 1
                code_size = min_code_size + 1
        w = bytes([b])
    if w:
        emit(table[w], code_size)
    emit(end, code_size)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# --------------------------------------------------------------------- #
# decode
# --------------------------------------------------------------------- #


def decode(data: bytes):
    """First frame of a GIF as ``(w, h, 3, rgb_bytes)``."""
    try:
        return _decode(data)
    except (struct.error, IndexError) as e:
        raise ValueError(f"corrupt GIF: truncated ({e})") from e


def _decode(data: bytes):
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw, sh = struct.unpack("<HH", data[6:10])
    packed, bg_index, _aspect = data[10], data[11], data[12]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: skip sub-blocks
            pos += 1  # label
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"corrupt GIF: unknown block 0x{block:02x}")
        left, top, fw, fh = struct.unpack("<HHHH", data[pos : pos + 8])
        fpacked = data[pos + 8]
        pos += 9
        lct = gct
        if fpacked & 0x80:
            n = 2 << (fpacked & 0x07)
            lct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
            pos += 3 * n
        if lct is None:
            raise ValueError("corrupt GIF: no color table")
        interlaced = bool(fpacked & 0x40)
        min_code_size = data[pos]
        pos += 1
        chunks = []
        while data[pos] != 0:
            ln = data[pos]
            chunks.append(data[pos + 1 : pos + 1 + ln])
            pos += 1 + ln
        pos += 1
        idx = np.frombuffer(
            _lzw_decode(b"".join(chunks), min_code_size, fw * fh), dtype=np.uint8
        )
        if len(idx) < fw * fh:
            raise ValueError("corrupt GIF: truncated image data")
        rows = idx.reshape(fh, fw)
        if interlaced:
            out_rows = np.empty_like(rows)
            src = 0
            for start, step in _INTERLACE_PASSES:
                n_rows = len(range(start, fh, step))
                out_rows[start::step] = rows[src : src + n_rows]
                src += n_rows
            rows = out_rows
        frame = lct[np.minimum(rows, len(lct) - 1)]
        if (left, top, fw, fh) == (0, 0, sw, sh):
            rgb = frame
        else:
            # the background color index refers to the GLOBAL color table
            # (spec logical-screen descriptor), not the frame's local one
            bg_table = gct if gct is not None else lct
            bg = bg_table[min(bg_index, len(bg_table) - 1)]
            rgb = np.tile(bg, (sh, sw, 1)).astype(np.uint8)
            rgb[top : top + fh, left : left + fw] = frame
        return sw, sh, 3, np.ascontiguousarray(rgb).tobytes()
    raise ValueError("corrupt GIF: no image descriptor")


# --------------------------------------------------------------------- #
# encode
# --------------------------------------------------------------------- #


def encode(
    w: int, h: int, pixels: bytes, channels: int = 3, interlace: bool = False
) -> bytes:
    """Lossless GIF from HWC uint8 pixels with ≤256 distinct colors."""
    arr = np.frombuffer(pixels, dtype=np.uint8).reshape(h, w, channels)
    if channels == 1:
        arr = np.repeat(arr, 3, axis=2)
    elif channels != 3:
        raise ValueError("GIF encode supports 1 or 3 channels")
    flat = arr.reshape(-1, 3)
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(
            f"GIF needs ≤256 distinct colors, got {len(palette)} — quantize first"
        )
    bits = max(1, int(len(palette) - 1).bit_length())
    table_size = 1 << bits
    pal = np.zeros((table_size, 3), dtype=np.uint8)
    pal[: len(palette)] = palette
    rows = inverse.astype(np.uint8).reshape(h, w)
    if interlace:
        ordered = np.concatenate(
            [rows[start::step] for start, step in _INTERLACE_PASSES]
        )
    else:
        ordered = rows
    min_code_size = max(2, bits)
    lzw = _lzw_encode(ordered.tobytes(), min_code_size)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (bits - 1), 0, 0])  # GCT flag + size, bg 0, aspect 0
    out += pal.tobytes()
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h)
    out += bytes([0x40 if interlace else 0x00])
    out += bytes([min_code_size])
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)
