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
- ``decode_frames(data) -> (w, h, [rgb_bytes, ...])``: the FULL GIF89a
  animation model (r9) — every rendering block composed onto the
  logical-screen canvas with Graphic Control Extension semantics:
  transparency (transparent-index pixels show the prior canvas
  through), and disposal methods 0/1 (leave), 2 (restore region to
  background color) and 3 (restore region to the pre-frame canvas).
  Each emitted frame is the canvas snapshot after that block renders —
  what a viewer displays. The canvas starts as the global-table
  background color (black when the stream has no global table); the
  output is RGB, so "transparent background" deliberately resolves to
  that concrete color — deterministic, and documented here rather than
  hidden.
- ``encode_frames(w, h, frames, ...) -> bytes``: animated GIF89a writer
  (full-screen frames, per-frame GCE with delay + disposal, global
  palette when the union of colors fits 256 else per-frame local
  tables, optional NETSCAPE2.0 loop block) — the mux side for fixtures
  and re-emitted clips; decode_frames(encode_frames(f)) == f exactly.

Single-frame ``decode`` stays the dataprep still-image contract (one
pixel tensor per payload); multi-frame GIFs enter the video path via
``videocodec.extract_frames``, which dispatches to ``decode_frames``.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode", "encode", "decode_frames", "encode_frames"]

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
        left, top, fw, fh, lct, rows, pos = _image_block(data, pos, gct)
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


def _image_block(data: bytes, pos: int, gct):
    """Parse one image descriptor (``pos`` just past the 0x2C
    separator): (left, top, fw, fh, color_table, index_rows, newpos),
    with interlace already resolved to display order."""
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
    return left, top, fw, fh, lct, rows, pos


# --------------------------------------------------------------------- #
# animation
# --------------------------------------------------------------------- #


def decode_frames(data: bytes):
    """Full animation decode: ``(w, h, [rgb_bytes per rendered frame])``.

    Composes every rendering block onto the logical-screen canvas under
    GIF89a Graphic Control semantics (transparency shows the prior
    canvas through; disposal 2 restores the block region to the
    background color, disposal 3 to the pre-frame canvas). Each output
    frame is the post-render canvas — what a viewer displays."""
    try:
        return _decode_frames(data)
    except (struct.error, IndexError) as e:
        raise ValueError(f"corrupt GIF: truncated ({e})") from e


def _decode_frames(data: bytes):
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw, sh = struct.unpack("<HH", data[6:10])
    packed, bg_index = data[10], data[11]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    bg = (
        gct[min(bg_index, len(gct) - 1)]
        if gct is not None
        else np.zeros(3, dtype=np.uint8)
    )
    canvas = np.tile(bg, (sh, sw, 1)).astype(np.uint8)
    frames: list[bytes] = []
    disposal, transparent = 0, None
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = data[pos]
            pos += 1
            if label == 0xF9 and data[pos] >= 4:  # Graphic Control
                gce = data[pos + 1 : pos + 1 + data[pos]]
                disposal = (gce[0] >> 2) & 0x07
                transparent = gce[3] if (gce[0] & 0x01) else None
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"corrupt GIF: unknown block 0x{block:02x}")
        left, top, fw, fh, lct, rows, pos = _image_block(data, pos, gct)
        # clip to the logical screen (spec: blocks must fit; be tolerant —
        # a block fully outside clamps to an empty region, still emitting
        # the canvas snapshot rather than raising a numpy broadcast error)
        fh_c, fw_c = max(0, min(fh, sh - top)), max(0, min(fw, sw - left))
        region = canvas[top : top + fh_c, left : left + fw_c]
        saved = region.copy() if disposal == 3 else None
        if fh_c and fw_c:
            rows = rows[:fh_c, :fw_c]
            pix = lct[np.minimum(rows, len(lct) - 1)]
            if transparent is not None:
                mask = rows != transparent
                region[mask] = pix[mask]
            else:
                region[:] = pix
        frames.append(np.ascontiguousarray(canvas).tobytes())
        if disposal == 2:
            region[:] = bg
        elif disposal == 3:
            region[:] = saved
        disposal, transparent = 0, None  # a GCE governs ONE block
    if not frames:
        raise ValueError("corrupt GIF: no image descriptor")
    return sw, sh, frames


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


def _pal_block(palette: np.ndarray) -> tuple[bytes, int]:
    """Pad a (n≤256, 3) palette to a power-of-two GIF color table."""
    bits = max(1, int(len(palette) - 1).bit_length())
    pal = np.zeros((1 << bits, 3), dtype=np.uint8)
    pal[: len(palette)] = palette
    return pal.tobytes(), bits


def _pal_indices(arr: np.ndarray, palette: np.ndarray) -> bytes:
    """Map HWC RGB pixels to indices into ``palette`` (must cover all)."""
    key = (
        (arr[..., 0].astype(np.int32) << 16)
        | (arr[..., 1].astype(np.int32) << 8)
        | arr[..., 2].astype(np.int32)
    ).ravel()
    pkey = (
        (palette[:, 0].astype(np.int32) << 16)
        | (palette[:, 1].astype(np.int32) << 8)
        | palette[:, 2].astype(np.int32)
    )
    order = np.argsort(pkey)
    found = order[np.searchsorted(pkey[order], key)]
    return found.astype(np.uint8).tobytes()


def encode_frames(
    w: int,
    h: int,
    frames: list[bytes],
    channels: int = 3,
    delays: list[int] | None = None,
    disposal: int = 1,
    loop: int | None = 0,
) -> bytes:
    """Animated GIF89a from full-screen HWC uint8 frames.

    One global color table when the union of colors across frames fits
    256, else a local table per frame (a single frame over 256 distinct
    colors raises, as in :func:`encode`). ``delays`` are per-frame
    hundredths of a second (default 0); ``disposal`` applies to every
    frame (1 = leave — the right choice for full-screen frames);
    ``loop`` adds the NETSCAPE2.0 block (0 = forever, None = omit).
    Lossless: decode_frames(encode_frames(f)) == f exactly."""
    if not frames:
        raise ValueError("encode_frames needs at least one frame")
    arrs = []
    for f in frames:
        a = np.frombuffer(f, dtype=np.uint8).reshape(h, w, channels)
        if channels == 1:
            a = np.repeat(a, 3, axis=2)
        elif channels != 3:
            raise ValueError("GIF encode supports 1 or 3 channels")
        arrs.append(a)
    union = np.unique(np.concatenate([a.reshape(-1, 3) for a in arrs]), axis=0)
    use_global = len(union) <= 256

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    if use_global:
        table, gbits = _pal_block(union)
        out += bytes([0x80 | (gbits - 1), 0, 0])
        out += table
    else:
        out += bytes([0x00, 0, 0])
    if loop is not None:
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01" + struct.pack("<H", loop) + b"\x00"
    delays = list(delays) if delays is not None else []
    if len(delays) > len(arrs):
        raise ValueError(f"{len(delays)} delays for {len(arrs)} frames")
    delays += [0] * (len(arrs) - len(delays))  # short list: pad, don't drop
    for a, delay in zip(arrs, delays):
        out += (
            b"\x21\xf9\x04"
            + bytes([(disposal & 0x07) << 2])
            + struct.pack("<H", delay)
            + b"\x00\x00"
        )
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h)
        if use_global:
            out += b"\x00"
            mcs = max(2, gbits)
            indices = _pal_indices(a, union)
        else:
            pal = np.unique(a.reshape(-1, 3), axis=0)
            if len(pal) > 256:
                raise ValueError(
                    f"GIF needs ≤256 distinct colors per frame, got {len(pal)}"
                )
            table, bits = _pal_block(pal)
            out += bytes([0x80 | (bits - 1)]) + table
            mcs = max(2, bits)
            indices = _pal_indices(a, pal)
        out += bytes([mcs])
        lzw = _lzw_encode(indices, mcs)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)
