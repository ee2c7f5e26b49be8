"""WebP-lossless (VP8L) codec, stdlib + numpy only.

The VP8L bitstream is a published spec (the "WebP Lossless Bitstream
Specification"): LSB-first bit packing, canonical prefix codes described
by code lengths (DEFLATE-style, with the 19-symbol code-length code and
16/17/18 repeat ops), LZ77 backward references with a 2D distance map,
an optional color cache, meta-prefix tiling, and four reversible
transforms (predictor, color, subtract-green, color-indexing). All of
that is implementable on ``struct`` + numpy, which closes the WebP gap
for LOSSLESS files:

- ``decode(data)`` → ``(w, h, channels, rgb(a)_bytes)`` for VP8L
  payloads: all four transforms, color cache, meta-prefix groups, LZ77.
  Lossy VP8 (and mixed/animated containers) still raise
  ``NotImplementedError`` — boolean-arithmetic-coded DCT belongs to
  libwebp.
- ``encode(w, h, pixels, channels)``: a valid literal-only VP8L stream
  (no transforms, no LZ77, no cache; real per-channel canonical Huffman
  codes built from symbol frequencies). Lossless round-trip — pinned by
  the tests — and decodable by any compliant WebP decoder.

Entropy decode walks bits in Python (same trade as jpegcodec: payload
decode always runs inside Arrow-batched ``mapInPandas`` workers).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode", "encode"]


# --------------------------------------------------------------------- #
# bit io (VP8L is LSB-first)
# --------------------------------------------------------------------- #


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            if self.pos >= len(self.data):
                raise ValueError("corrupt VP8L: out of data")
            self.acc |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        v = self.acc & ((1 << n) - 1)
        self.acc >>= n
        self.nbits -= n
        return v


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int):
        self.acc |= (value & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


# --------------------------------------------------------------------- #
# canonical prefix codes
# --------------------------------------------------------------------- #

_CLCL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]


class _Prefix:
    """Canonical prefix decoder from code lengths (spec: same canonical
    assignment as DEFLATE, codes read MSB-first within the LSB-first
    stream — i.e. bit-by-bit tree walk)."""

    __slots__ = ("fast", "single")

    def __init__(self, lengths):
        nz = [(l, s) for s, l in enumerate(lengths) if l > 0]
        if not nz:
            raise ValueError("corrupt VP8L: empty prefix code")
        if len(nz) == 1:
            self.single = nz[0][1]
            self.fast = None
            return
        self.single = None
        # canonical codes: sort by (length, symbol)
        code = 0
        prev_len = 0
        table: dict[tuple[int, int], int] = {}
        for l, s in sorted(nz):
            code <<= l - prev_len
            prev_len = l
            table[(l, code)] = s
            code += 1
        self.fast = table

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        l = 0
        table = self.fast
        while True:
            code = (code << 1) | br.read(1)
            l += 1
            if (l, code) in table:
                return table[(l, code)]
            if l > 15:
                raise ValueError("corrupt VP8L: bad prefix code")


def _read_code_lengths(br: _BitReader, num_symbols: int) -> list[int]:
    """Spec 'Decoding of the Code Length Code'."""
    simple = br.read(1)
    lengths = [0] * num_symbols
    if simple:
        n = br.read(1) + 1
        first_8 = br.read(1)
        s0 = br.read(8 if first_8 else 1)
        lengths[s0] = 1
        if n == 2:
            s1 = br.read(8)
            lengths[s1] = 1
        return lengths
    num_cl = br.read(4) + 4
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[_CLCL_ORDER[i]] = br.read(3)
    cl_code = _Prefix(cl_lengths)
    max_symbol = num_symbols
    if br.read(1):  # use length
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    # read lengths
    prev = 8
    i = 0
    while i < num_symbols:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        sym = cl_code.read(br)
        if sym < 16:
            lengths[i] = sym
            i += 1
            if sym:
                prev = sym
        elif sym == 16:
            rep = 3 + br.read(2)
            for _ in range(rep):
                if i < num_symbols:
                    lengths[i] = prev
                    i += 1
        elif sym == 17:
            i += 3 + br.read(3)
        else:  # 18
            i += 11 + br.read(7)
    return lengths


def _build_lengths(freqs: list[int], max_len: int = 15) -> list[int]:
    """Length-limited canonical Huffman lengths (package-merge-lite: plain
    Huffman, then clamp + Kraft fixup — fine for encoder use)."""
    import heapq

    syms = [s for s, f in enumerate(freqs) if f > 0]
    if not syms:
        return [0] * len(freqs)
    if len(syms) == 1:
        out = [0] * len(freqs)
        out[syms[0]] = 1
        return out
    heap = [(freqs[s], id([s]), [s]) for s in syms]
    heapq.heapify(heap)
    depth = {s: 0 for s in syms}
    while len(heap) > 1:
        f1, _, g1 = heapq.heappop(heap)
        f2, _, g2 = heapq.heappop(heap)
        for s in g1 + g2:
            depth[s] += 1
        merged = g1 + g2
        heapq.heappush(heap, (f1 + f2, id(merged), merged))
    lengths = [0] * len(freqs)
    for s, d in depth.items():
        lengths[s] = min(d, max_len)

    # Exact integer Kraft correction after clamping: a COMPLETE code
    # (sum 2^-l == 1) is required — compliant decoders (libwebp's
    # BuildHuffmanTable) reject under-full tables, and over-full ones are
    # not prefix-free. Work in units of 2^-max_len.
    target = 1 << max_len

    def units():
        return sum(1 << (max_len - lengths[s]) for s in syms)

    while units() > target:
        # lengthen the deepest symbol that can still grow
        cand = max((s for s in syms if lengths[s] < max_len),
                   key=lambda s: lengths[s])
        lengths[cand] += 1
    deficit = target - units()
    while deficit > 0:
        # shorten the symbol with the largest gain (2^(max-l)) that fits;
        # gain 1 always exists after clamping (some symbol sits at max_len),
        # so the greedy power-of-two fill terminates exactly
        cand = min(
            (s for s in syms
             if lengths[s] > 1 and (1 << (max_len - lengths[s])) <= deficit),
            key=lambda s: lengths[s],
        )
        lengths[cand] -= 1
        deficit = target - units()
    return lengths


def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    code = 0
    prev = 0
    out = {}
    for l, s in sorted((l, s) for s, l in enumerate(lengths) if l > 0):
        code <<= l - prev
        prev = l
        out[s] = (code, l)
        code += 1
    return out


def _write_code_lengths(bw: _BitWriter, lengths: list[int]):
    """Emit a prefix-code definition: the spec's SIMPLE form for ≤2
    symbols (single-symbol codes cost 0 bits per symbol — matching what
    decoders read), else the code-length code with every length written
    literally (no repeats — simple and always valid)."""
    nz = [s for s, l in enumerate(lengths) if l > 0]
    if len(nz) <= 2 and all(s < 256 for s in nz):
        bw.write(1, 1)  # simple
        bw.write(len(nz) - 1, 1)
        bw.write(1, 1)  # first symbol in 8 bits
        bw.write(nz[0], 8)
        if len(nz) == 2:
            bw.write(nz[1], 8)
        return
    bw.write(0, 1)  # not simple
    cl_freq = [0] * 19
    for l in lengths:
        cl_freq[l] += 1
    cl_lengths = _build_lengths(cl_freq, max_len=7)
    # write all 19 code-length-code lengths in order (num_cl = 19)
    bw.write(19 - 4, 4)
    for sym in _CLCL_ORDER:
        bw.write(cl_lengths[sym], 3)
    bw.write(0, 1)  # no max_symbol trick
    codes = _canonical_codes(cl_lengths)
    if len(codes) > 1:  # a single-symbol cl code costs 0 bits per length
        for l in lengths:
            c, n = codes[l]
            # prefix codes are written MSB-first (mirror of the reader walk)
            for shift in range(n - 1, -1, -1):
                bw.write((c >> shift) & 1, 1)


# --------------------------------------------------------------------- #
# decode
# --------------------------------------------------------------------- #


def _read_prefix_groups(br: _BitReader, n_groups: int, cache_bits: int):
    groups = []
    for _ in range(n_groups):
        codes = []
        for ci, alpha_size in enumerate(
            (256 + 24 + (1 << cache_bits if cache_bits else 0), 256, 256, 256, 40)
        ):
            lengths = _read_code_lengths(br, alpha_size)
            codes.append(_Prefix(lengths))
        groups.append(codes)
    return groups


def _lz77_extra(br: _BitReader, prefix: int) -> int:
    if prefix < 4:
        return prefix + 1
    extra = (prefix - 2) >> 1
    offset = (2 + (prefix & 1)) << extra
    return offset + br.read(extra) + 1


_DIST_MAP = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (8, 5),
    (6, 7), (-6, 7), (7, 6), (-7, 6), (8, 6), (8, 7), (7, 7), (-7, 7),
]


def _plane_dist(code: int, xsize: int) -> int:
    if code > 120:
        return code - 120
    dx, dy = _DIST_MAP[code - 1]
    d = dy * xsize + dx
    return max(d, 1)


def _decode_entropy_image(br: _BitReader, w: int, h: int, allow_meta: bool):
    """Spec 'Decoding Image Data' → (h, w) uint32 ARGB array."""
    cache_bits = 0
    meta_prefix = None
    meta_bits = 0
    # spec order (and libwebp DecodeImageStream): color-cache-info FIRST,
    # then the meta-prefix bit inside the prefix-code section
    if br.read(1):  # color cache
        cache_bits = br.read(4)
        if not (1 <= cache_bits <= 11):
            raise ValueError("corrupt VP8L: bad color cache size")
    if allow_meta and br.read(1):  # meta-prefix present
        meta_bits = br.read(3) + 2
        mw = _subsample(w, meta_bits)
        mh = _subsample(h, meta_bits)
        meta_prefix = _decode_entropy_image(br, mw, mh, allow_meta=False)
    if meta_prefix is not None:
        n_groups = int(((meta_prefix >> 8) & 0xFFFF).max()) + 1
    else:
        n_groups = 1
    groups = _read_prefix_groups(br, n_groups, cache_bits)
    cache = [0] * (1 << cache_bits) if cache_bits else None

    n = w * h
    out = np.zeros(n, dtype=np.uint32)
    pos = 0
    group = groups[0]

    def cache_insert(px):
        if cache is not None:
            cache[(0x1E35A7BD * int(px)) >> (32 - cache_bits) & ((1 << cache_bits) - 1)] = int(px)

    while pos < n:
        if meta_prefix is not None:
            x, y = pos % w, pos // w
            gi = int(meta_prefix[y >> meta_bits, x >> meta_bits])
            group = groups[(gi >> 8) & 0xFFFF]
        g = group[0].read(br)
        if g < 256:  # literal
            r = group[1].read(br)
            b = group[2].read(br)
            a = group[3].read(br)
            px = (a << 24) | (r << 16) | (g << 8) | b
            out[pos] = px
            cache_insert(px)
            pos += 1
        elif g < 256 + 24:  # LZ77 backref
            length = _lz77_extra(br, g - 256)
            dist_code = group[4].read(br)
            dist = _plane_dist(_lz77_extra(br, dist_code), w)
            if dist > pos or pos + length > n:
                raise ValueError("corrupt VP8L: bad backref")
            for _ in range(length):
                out[pos] = out[pos - dist]
                cache_insert(out[pos])
                pos += 1
        else:  # color-cache index
            if cache is None:
                raise ValueError("corrupt VP8L: cache hit without cache")
            out[pos] = cache[g - 256 - 24]
            pos += 1
    return out.reshape(h, w)


def _subsample(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


# ---- transforms (applied inverse, in reverse order) ------------------ #


def _inv_subtract_green(img: np.ndarray) -> np.ndarray:
    g = (img >> 8) & 0xFF
    r = (((img >> 16) & 0xFF) + g) & 0xFF
    b = ((img & 0xFF) + g) & 0xFF
    return (img & np.uint32(0xFF00FF00)) | (r << 16) | b


def _inv_color_transform(img: np.ndarray, tiles: np.ndarray, bits: int) -> np.ndarray:
    h, w = img.shape

    def s8(v):
        return v - 256 if v >= 128 else v

    rows = img.astype(np.int64).tolist()  # plain ints: ~10x faster walk
    tile_rows = [[int(v) for v in tr] for tr in tiles.tolist()]
    for y in range(h):
        trow = tile_rows[y >> bits]
        cur = rows[y]
        for x in range(w):
            t = trow[x >> bits]
            # ColorTransformElement packing (spec/libwebp): green_to_red
            # in the BLUE byte, green_to_blue in GREEN, red_to_blue in RED
            g2r = s8(t & 0xFF)
            g2b = s8((t >> 8) & 0xFF)
            r2b = s8((t >> 16) & 0xFF)
            px = cur[x]
            a = (px >> 24) & 0xFF
            r = (px >> 16) & 0xFF
            g = (px >> 8) & 0xFF
            b = px & 0xFF
            g_s = g - 256 if g >= 128 else g
            r = (r + ((g2r * g_s) >> 5)) & 0xFF
            r_s = r - 256 if r >= 128 else r
            b = (b + ((g2b * g_s) >> 5) + ((r2b * r_s) >> 5)) & 0xFF
            cur[x] = (a << 24) | (r << 16) | (g << 8) | b
    return np.array(rows, dtype=np.uint32)


def _avg2(a, b):
    return (
        ((((a ^ b) & 0xFEFEFEFE) >> 1) + (a & b)) & 0xFFFFFFFF
    )


def _inv_predictor(img: np.ndarray, tiles: np.ndarray, bits: int) -> np.ndarray:
    h, w = img.shape
    # plain-int rows: numpy scalar arithmetic is ~10x slower in the
    # inherently sequential prediction walk
    rows = img.astype(np.int64).tolist()
    tile_rows = [[int(v) for v in tr] for tr in tiles.tolist()]

    def add(a, b):
        return (
            (((a >> 24) + (b >> 24)) & 0xFF) << 24
            | (((a >> 16) + (b >> 16)) & 0xFF) << 16
            | (((a >> 8) + (b >> 8)) & 0xFF) << 8
            | ((a + b) & 0xFF)
        )

    def clamp_add_sub_full(c1, c2, c3):
        res = 0
        for sh in (24, 16, 8, 0):
            v = ((c1 >> sh) & 0xFF) + ((c2 >> sh) & 0xFF) - ((c3 >> sh) & 0xFF)
            v = 0 if v < 0 else (255 if v > 255 else v)
            res |= v << sh
        return res

    prev_row = None
    for y in range(h):
        cur = rows[y]
        trow = tile_rows[y >> bits]
        for x in range(w):
            if y == 0 and x == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = cur[x - 1]  # L
            elif x == 0:
                pred = prev_row[x]  # T
            else:
                mode = (trow[x >> bits] >> 8) & 0xFF
                L = cur[x - 1]
                T = prev_row[x]
                TL = prev_row[x - 1]
                # flattened addressing: TR = data[pos - width + 1]; at the
                # last column that lands on the CURRENT row's first pixel
                TR = prev_row[x + 1] if x + 1 < w else cur[0]
                if mode == 0:
                    pred = 0xFF000000
                elif mode == 1:
                    pred = L
                elif mode == 2:
                    pred = T
                elif mode == 3:
                    pred = TR
                elif mode == 4:
                    pred = TL
                elif mode == 5:
                    pred = _avg2(_avg2(L, TR), T)
                elif mode == 6:
                    pred = _avg2(L, TL)
                elif mode == 7:
                    pred = _avg2(L, T)
                elif mode == 8:
                    pred = _avg2(TL, T)
                elif mode == 9:
                    pred = _avg2(T, TR)
                elif mode == 10:
                    pred = _avg2(_avg2(L, TL), _avg2(T, TR))
                elif mode == 11:  # Select (libwebp: ties go to TOP)
                    pl = pt = 0  # pl = Σ|T-TL| (cost of L), pt = Σ|L-TL|
                    for sh in (24, 16, 8, 0):
                        pv = ((L >> sh) & 0xFF) + ((T >> sh) & 0xFF) - ((TL >> sh) & 0xFF)
                        pl += abs(pv - ((L >> sh) & 0xFF))
                        pt += abs(pv - ((T >> sh) & 0xFF))
                    pred = T if pt <= pl else L
                elif mode == 12:
                    pred = clamp_add_sub_full(L, T, TL)
                elif mode == 13:
                    av = _avg2(L, T)
                    res = 0
                    for sh in (24, 16, 8, 0):
                        a_ = (av >> sh) & 0xFF
                        tl_ = (TL >> sh) & 0xFF
                        d = a_ - tl_
                        # C integer division truncates toward zero (spec
                        # ClampAddSubtractHalf), unlike >>1 which floors
                        v = a_ + int(d / 2)
                        v = 0 if v < 0 else (255 if v > 255 else v)
                        res |= v << sh
                    pred = res
                else:
                    raise ValueError(f"corrupt VP8L: predictor mode {mode}")
            cur[x] = add(cur[x], pred)
        prev_row = cur
    return np.array(rows, dtype=np.uint32)


def decode(data: bytes):
    """Decode a WebP payload. Lossless (VP8L) → real pixels; lossy VP8 /
    animation raise NotImplementedError."""
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP payload")
    pos = 12
    while pos + 8 <= len(data):
        cid, size = struct.unpack("<4sI", data[pos : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"VP8L":
            return _decode_vp8l(body)
        if cid in (b"VP8 ", b"VP8X", b"ANIM", b"ANMF"):
            raise NotImplementedError(
                "lossy/extended WebP (VP8 arithmetic coding) requires "
                "libwebp; only lossless VP8L decodes here"
            )
        pos += 8 + size + (size & 1)
    raise ValueError("corrupt WebP: no image chunk")


def _decode_vp8l(body: bytes):
    if not body or body[0] != 0x2F:
        raise ValueError("corrupt VP8L: bad signature")
    br = _BitReader(body[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    _alpha_hint = br.read(1)
    version = br.read(3)
    if version != 0:
        raise ValueError(f"corrupt VP8L: version {version}")
    # transforms
    transforms = []
    xsize = w
    while br.read(1):
        ttype = br.read(2)
        if ttype in (0, 1):  # predictor / color
            bits = br.read(3) + 2
            tw, th = _subsample(xsize, bits), _subsample(h, bits)
            tiles = _decode_entropy_image(br, tw, th, allow_meta=False)
            transforms.append((ttype, bits, tiles))
        elif ttype == 2:  # subtract green
            transforms.append((2, None, None))
        else:  # color indexing (palette)
            n_colors = br.read(8) + 1
            pal = _decode_entropy_image(br, n_colors, 1, allow_meta=False)[0]
            # palette is delta-coded PER CHANNEL (componentwise mod-256
            # addition — a packed cumsum would carry across channel bytes)
            ch = np.stack(
                [(pal >> s) & 0xFF for s in (24, 16, 8, 0)], axis=0
            ).astype(np.int64)
            ch = np.cumsum(ch, axis=1) % 256
            pal = (
                (ch[0] << 24) | (ch[1] << 16) | (ch[2] << 8) | ch[3]
            ).astype(np.uint32)
            width_bits = 0 if n_colors > 16 else (1 if n_colors > 4 else (2 if n_colors > 2 else 3))
            transforms.append((3, (width_bits, pal), None))
            xsize = _subsample(xsize, width_bits)
    img = _decode_entropy_image(br, xsize, h, allow_meta=True)
    # apply inverse transforms in reverse order
    for t in reversed(transforms):
        if t[0] == 0:
            img = _inv_predictor(img, t[2], t[1])
        elif t[0] == 1:
            img = _inv_color_transform(img, t[2], t[1])
        elif t[0] == 2:
            img = _inv_subtract_green(img)
        else:
            width_bits, pal = t[1]
            img = _apply_color_indexing(img, pal, width_bits, w)
    a = (img >> 24) & 0xFF
    r = (img >> 16) & 0xFF
    g = (img >> 8) & 0xFF
    b = img & 0xFF
    if bool((a != 255).any()):
        rgba = np.stack([r, g, b, a], axis=-1).astype(np.uint8)
        return w, h, 4, rgba.tobytes()
    rgb = np.stack([r, g, b], axis=-1).astype(np.uint8)
    return w, h, 3, rgb.tobytes()


def _apply_color_indexing(img: np.ndarray, pal: np.ndarray, width_bits: int, full_w: int):
    h = img.shape[0]
    idx = (img >> 8) & 0xFF  # green channel holds the index
    if width_bits:
        per = 1 << width_bits  # packed pixels per green byte
        bits = 8 >> width_bits
        cols = []
        for k in range(per):
            cols.append((idx >> (k * bits)) & ((1 << bits) - 1))
        unpacked = np.stack(cols, axis=-1).reshape(h, -1)[:, :full_w]
        idx = unpacked
    idx = np.minimum(idx, len(pal) - 1)
    return pal[idx]


# --------------------------------------------------------------------- #
# encode (literal-only VP8L)
# --------------------------------------------------------------------- #


def encode(w: int, h: int, pixels: bytes, channels: int = 3) -> bytes:
    """Literal-only lossless VP8L stream (real canonical Huffman per
    channel, no transforms/LZ77/cache)."""
    arr = np.frombuffer(pixels, dtype=np.uint8).reshape(h, w, channels)
    if channels == 1:
        r = g = b = arr[..., 0]
        a = np.full_like(r, 255)
    elif channels == 3:
        r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
        a = np.full_like(r, 255)
    elif channels == 4:
        r, g, b, a = arr[..., 0], arr[..., 1], arr[..., 2], arr[..., 3]
    else:
        raise ValueError("webp encode supports 1/3/4 channels")

    bw = _BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if channels == 4 else 0, 1)
    bw.write(0, 3)  # version
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no color cache (spec order: cache before meta)
    bw.write(0, 1)  # no meta-prefix

    planes = {"g": g.reshape(-1), "r": r.reshape(-1), "b": b.reshape(-1), "a": a.reshape(-1)}
    # green alphabet is 256+24 (no cache)
    gfreq = [0] * (256 + 24)
    for v, c in zip(*np.unique(planes["g"], return_counts=True)):
        gfreq[int(v)] = int(c)
    codes = {}
    for name, alpha in (("g", gfreq),):
        lengths = _build_lengths(alpha)
        _write_code_lengths(bw, lengths)
        codes["g"] = _canonical_codes(lengths)
    for name in ("r", "b", "a"):
        freq = [0] * 256
        for v, c in zip(*np.unique(planes[name], return_counts=True)):
            freq[int(v)] = int(c)
        lengths = _build_lengths(freq)
        _write_code_lengths(bw, lengths)
        codes[name] = _canonical_codes(lengths)
    # distance code: single-symbol simple code (never used)
    bw.write(1, 1)  # simple
    bw.write(0, 1)  # num_symbols - 1 = 0
    bw.write(0, 1)  # 1-bit symbol
    bw.write(0, 1)  # symbol 0

    def emit(sym_codes, v):
        if len(sym_codes) == 1:
            return  # trivial code: 0 bits on the wire
        c, n = sym_codes[int(v)]
        for shift in range(n - 1, -1, -1):
            bw.write((c >> shift) & 1, 1)

    gs, rs, bs, as_ = planes["g"], planes["r"], planes["b"], planes["a"]
    for i in range(len(gs)):
        emit(codes["g"], gs[i])
        emit(codes["r"], rs[i])
        emit(codes["b"], bs[i])
        emit(codes["a"], as_[i])
    payload = b"\x2f" + bw.flush()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
