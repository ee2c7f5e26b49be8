"""JPEG codec, stdlib + numpy only (ITU-T T.81): baseline sequential
AND huffman-progressive.

The container has no imaging libraries, but huffman-coded JPEG is a
published spec: canonical Huffman entropy coding, 8x8 DCT blocks,
zigzag + quantization, optional 4:2:0/4:2:2 chroma subsampling, restart
markers, and — for progressive files (Annex G) — spectral selection,
successive approximation (DC/AC first + refinement scans with EOB
runs), and non-interleaved AC scans. This module implements

- ``decode(data) -> (w, h, channels, pixel_bytes)`` for baseline
  (SOF0/SOF1) and progressive (SOF2) DCT JPEGs: gray and YCbCr, any
  sampling factors up to 2x2, DRI/RSTn restart intervals. Quant +
  Huffman tables are read from the file's own DQT/DHT markers, so
  real-world files decode. Only arithmetic-coded and lossless/
  hierarchical processes raise ``NotImplementedError``.
- ``encode(w, h, pixels, channels, quality, progressive=...)``:
  baseline 4:4:4 (or grayscale) with quality-scaled Annex-K tables, or
  a four-scan-group progressive stream (DC first Al=1, DC refine,
  per-component AC first Al=1, per-component AC refine) that exercises
  every Annex-G scan type; either form decodes identically.

Entropy decode walks bits in Python (canonical mincode/maxcode per the
spec's DECODE procedure) while dequant + IDCT + color transform are
numpy-vectorized over all blocks at once. Fine for the Arrow-batched
``mapInPandas`` workers this feeds — never driver-side, never per-row
Python in a scan.

JPEG is lossy: round-trip tests assert closeness (small mean error at
high quality), plus exactness on DC-only flat blocks where the math is
integral end to end.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode", "encode"]

# --------------------------------------------------------------------- #
# shared constants (published in T.81)
# --------------------------------------------------------------------- #

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)
UNZIGZAG = np.argsort(ZIGZAG)

# Annex K.1/K.2 quantization tables (natural order, row-major)
QUANT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
QUANT_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# standard Huffman tables: (BITS[1..16], HUFFVAL)
DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
DC_CHROM = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
AC_CHROM = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)

# 8x8 DCT-II orthonormal basis: row k of _DCT is the k-th cosine basis
_k = np.arange(8)
_DCT = np.cos((2 * _k[None, :] + 1) * _k[:, None] * np.pi / 16) * 0.5
_DCT[0, :] *= 1 / np.sqrt(2)


def _fdct2(blocks: np.ndarray) -> np.ndarray:
    """Forward 2-D DCT over (n, 8, 8) blocks."""
    return _DCT @ blocks @ _DCT.T


def _idct2(blocks: np.ndarray) -> np.ndarray:
    """Inverse 2-D DCT over (n, 8, 8) blocks."""
    return _DCT.T @ blocks @ _DCT


# --------------------------------------------------------------------- #
# canonical Huffman (spec procedures GENERATE_SIZE_TABLE etc.)
# --------------------------------------------------------------------- #


def _canonical_codes(bits, vals):
    """(code, size) per symbol in HUFFVAL order."""
    sizes = []
    for l, n in enumerate(bits, start=1):
        sizes.extend([l] * n)
    codes = []
    code = 0
    prev = sizes[0] if sizes else 0
    for s in sizes:
        code <<= s - prev
        prev = s
        codes.append(code)
        code += 1
    return dict(zip(vals, zip(codes, sizes)))


class _HuffDecoder:
    """Table-driven DECODE: one 16-bit lookahead indexes a LUT mapping to
    (symbol, code length) — one lookup per symbol instead of a bit walk.
    The LUT builds lazily from the canonical (code, size) assignment."""

    def __init__(self, bits, vals):
        self.vals = vals
        self.bits = bits
        self.lut = None

    def _build(self):
        lut = [0] * (1 << 16)
        code = 0
        k = 0
        for l in range(1, 17):
            for _ in range(self.bits[l - 1]):
                sym = self.vals[k]
                k += 1
                base = code << (16 - l)
                packed = (sym << 5) | l
                lut[base : base + (1 << (16 - l))] = [packed] * (1 << (16 - l))
                code += 1
            code <<= 1
        self.lut = lut

    def decode(self, br) -> int:
        if self.lut is None:
            self._build()
        packed = self.lut[br.peek16()]
        ln = packed & 31
        if ln == 0:
            raise ValueError("corrupt JPEG: invalid huffman code")
        br.consume(ln)
        return packed >> 5


class _BitReader:
    """Entropy-coded segment reader: un-stuffs 0xFF00, pauses at markers
    (restart handling re-syncs), and pads past the scan end with 1-bits
    exactly like the encoder's byte padding — a buffered design so the
    LUT decoder can always peek 16 bits."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.padded = 0  # pad bits appended (corruption indicator)

    def _fill(self, need: int):
        while self.nbits < need:
            if self.pos < len(self.data):
                b = self.data[self.pos]
                if b == 0xFF:
                    nxt = (
                        self.data[self.pos + 1]
                        if self.pos + 1 < len(self.data) else 0
                    )
                    if nxt == 0x00:
                        self.pos += 2  # stuffed byte
                    else:
                        # marker: stop consuming; pad like end-of-scan
                        self.acc = (self.acc << 8) | 0xFF
                        self.nbits += 8
                        self.padded += 8
                        continue
                else:
                    self.pos += 1
                self.acc = (self.acc << 8) | b
                self.nbits += 8
            else:
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                self.padded += 8
        # ALWAYS trim to nbits: consumed bits above nbits are garbage,
        # and leaving them makes acc an ever-growing bigint (O(n²) decode)
        self.acc &= (1 << self.nbits) - 1

    def peek16(self) -> int:
        self._fill(16)
        return (self.acc >> (self.nbits - 16)) & 0xFFFF

    def consume(self, n: int):
        self.nbits -= n
        if self.padded and self.nbits < self.padded:
            raise ValueError("corrupt JPEG: out of entropy data")

    def read_bit(self) -> int:
        self._fill(1)
        self.nbits -= 1
        if self.padded and self.nbits < self.padded:
            raise ValueError("corrupt JPEG: out of entropy data")
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill(n)
        self.nbits -= n
        if self.padded and self.nbits < self.padded:
            raise ValueError("corrupt JPEG: out of entropy data")
        return (self.acc >> self.nbits) & ((1 << n) - 1)

    def align_to_marker(self):
        """Skip to just past the next marker (for RSTn)."""
        self.nbits = 0
        self.padded = 0
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and self.data[self.pos + 1] != 0x00:
                marker = self.data[self.pos + 1]
                self.pos += 2
                return marker
            self.pos += 1
        raise ValueError("corrupt JPEG: expected restart marker")


def _extend(v: int, n: int) -> int:
    """Spec EXTEND: map the n-bit magnitude to its signed value."""
    if n == 0:
        return 0
    return v if v >= (1 << (n - 1)) else v - (1 << n) + 1


# --------------------------------------------------------------------- #
# decoder
# --------------------------------------------------------------------- #


def decode(data: bytes):
    """Decode a baseline JPEG to ``(w, h, channels, pixel_bytes)`` —
    HWC uint8, RGB for 3-component files, grayscale for 1-component."""
    if not data.startswith(b"\xff\xd8"):
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffDecoder] = {}
    huff_ac: dict[int, _HuffDecoder] = {}
    restart_interval = 0
    frame = None
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("corrupt JPEG: expected marker")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may pad a marker
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        seglen = struct.unpack(">H", data[pos : pos + 2])[0]
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if pq:
                    tbl = np.frombuffer(seg[p : p + 128], dtype=">u2").astype(np.int64)
                    p += 128
                else:
                    tbl = np.frombuffer(seg[p : p + 64], dtype=np.uint8).astype(np.int64)
                    p += 64
                qt[tq] = tbl[UNZIGZAG]  # store natural order
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = list(seg[p + 17 : p + 17 + n])
                (huff_ac if tc else huff_dc)[th] = _HuffDecoder(bits, vals)
                p += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/SOF1 baseline, SOF2 progressive
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG supported")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps, "progressive": marker == 0xC2}
            if frame["progressive"]:
                prog = _ProgressiveState(frame)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD,
                        0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline-sequential and huffman-progressive JPEG "
                "(SOF0/SOF1/SOF2) supported"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("corrupt JPEG: SOS before SOF")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i : 3 + 2 * i]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append({**comp, "td": tdta >> 4, "ta": tdta & 0xF})
            if not frame["progressive"]:
                return _decode_scan(
                    data, pos + seglen, frame, scan, qt, huff_dc, huff_ac,
                    restart_interval,
                )
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            pos = prog.decode_scan(
                data, pos + seglen, scan, huff_dc, huff_ac,
                restart_interval, ss, se, ahal >> 4, ahal & 0xF,
            )
            continue
        pos += seglen
    if frame is not None and frame.get("progressive"):
        return prog.reconstruct(qt)
    raise ValueError("corrupt JPEG: no scan found")


def _decode_scan(data, pos, frame, scan, qt, huff_dc, huff_ac, dri):
    w, h = frame["w"], frame["h"]
    hmax = max(c["h"] for c in scan)
    vmax = max(c["v"] for c in scan)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    br = _BitReader(data, pos)
    # coefficient stores: per component, (blocks_y, blocks_x, 8, 8)
    stores = []
    for c in scan:
        by, bx = mcuy * c["v"], mcux * c["h"]
        stores.append(np.zeros((by, bx, 64), dtype=np.int32))
    pred = [0] * len(scan)
    n_mcu = mcux * mcuy
    for m in range(n_mcu):
        if dri and m and m % dri == 0:
            marker = br.align_to_marker()
            if not (0xD0 <= marker <= 0xD7):
                raise ValueError("corrupt JPEG: bad restart marker")
            pred = [0] * len(scan)
        my, mx = divmod(m, mcux)
        for ci, c in enumerate(scan):
            for v in range(c["v"]):
                for hh in range(c["h"]):
                    blk = stores[ci][my * c["v"] + v, mx * c["h"] + hh]
                    # DC
                    t = huff_dc[c["td"]].decode(br)
                    diff = _extend(br.receive(t), t)
                    pred[ci] += diff
                    blk[0] = pred[ci]
                    # AC
                    k = 1
                    while k < 64:
                        rs = huff_ac[c["ta"]].decode(br)
                        r, s = rs >> 4, rs & 0xF
                        if s == 0:
                            if r == 15:
                                k += 16  # ZRL
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("corrupt JPEG: AC index overflow")
                        blk[k] = _extend(br.receive(s), s)
                        k += 1
    return _reconstruct(stores, scan, qt, w, h, hmax, vmax)


def _reconstruct(stores, comps, qt, w, h, hmax, vmax):
    """Coefficient stores → pixels: dequantize + un-zigzag + vectorized
    IDCT per component, chroma upsample, YCbCr→RGB."""
    planes = []
    for ci, c in enumerate(comps):
        coefs = stores[ci].reshape(-1, 64) * qt[c["tq"]][ZIGZAG][None, :]
        nat = np.zeros_like(coefs)
        nat[:, ZIGZAG] = coefs  # zigzag index k lives at natural ZIGZAG[k]
        blocks = _idct2(nat.reshape(-1, 8, 8).astype(np.float64)) + 128.0
        by, bx = stores[ci].shape[:2]
        plane = (
            blocks.reshape(by, bx, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(by * 8, bx * 8)
        )
        # upsample to full MCU grid resolution
        if c["h"] != hmax or c["v"] != vmax:
            plane = np.repeat(
                np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1
            )
        planes.append(plane[: h, : w])
    if len(planes) == 1:
        gray = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return w, h, 1, gray.tobytes()
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)
    return w, h, 3, rgb.tobytes()


# --------------------------------------------------------------------- #
# progressive decoding (T.81 Annex G, huffman-coded)
# --------------------------------------------------------------------- #


class _ProgressiveState:
    """Coefficient accumulator across a progressive file's scans."""

    def __init__(self, frame):
        self.frame = frame
        w, h = frame["w"], frame["h"]
        self.hmax = max(c["h"] for c in frame["comps"])
        self.vmax = max(c["v"] for c in frame["comps"])
        self.mcux = -(-w // (8 * self.hmax))
        self.mcuy = -(-h // (8 * self.vmax))
        self.stores = {}
        self.bdims = {}
        for c in frame["comps"]:
            by, bx = self.mcuy * c["v"], self.mcux * c["h"]
            self.stores[c["id"]] = np.zeros((by, bx, 64), dtype=np.int32)
            # non-interleaved scans iterate the component's OWN block grid
            cw = -(-w * c["h"] // self.hmax)
            chh = -(-h * c["v"] // self.vmax)
            self.bdims[c["id"]] = (-(-chh // 8), -(-cw // 8))

    def decode_scan(self, data, pos, scan, huff_dc, huff_ac, dri, ss, se, ah, al):
        br = _BitReader(data, pos)
        if ss == 0:
            self._dc_scan(br, scan, huff_dc, dri, ah, al)
        else:
            if len(scan) != 1:
                raise ValueError("corrupt JPEG: progressive AC scan must be "
                                 "single-component")
            self._ac_scan(br, scan[0], huff_ac, dri, ss, se, ah, al)
        # skip to just before the next non-RST marker
        p = br.pos
        while p + 1 < len(data):
            if data[p] == 0xFF and data[p + 1] not in (0x00, 0xFF):
                if 0xD0 <= data[p + 1] <= 0xD7:
                    p += 2
                    continue
                return p
            p += 1
        return p

    def _dc_scan(self, br, scan, huff_dc, dri, ah, al):
        pred = {c["id"]: 0 for c in scan}
        n_mcu = self.mcux * self.mcuy
        single = len(scan) == 1
        if single:
            bh, bw = self.bdims[scan[0]["id"]]
            n_units = bh * bw
        else:
            n_units = n_mcu
        for m in range(n_units):
            if dri and m and m % dri == 0:
                marker = br.align_to_marker()
                if not (0xD0 <= marker <= 0xD7):
                    raise ValueError("corrupt JPEG: bad restart marker")
                pred = {c["id"]: 0 for c in scan}
            if single:
                c = scan[0]
                my, mx = divmod(m, bw)
                self._dc_block(br, self.stores[c["id"]][my, mx], c, pred,
                               huff_dc, ah, al)
            else:
                my, mx = divmod(m, self.mcux)
                for c in scan:
                    for v in range(c["v"]):
                        for hh in range(c["h"]):
                            blk = self.stores[c["id"]][
                                my * c["v"] + v, mx * c["h"] + hh
                            ]
                            self._dc_block(br, blk, c, pred, huff_dc, ah, al)

    @staticmethod
    def _dc_block(br, blk, c, pred, huff_dc, ah, al):
        if ah == 0:  # first DC scan: diffs of the point-transformed value
            t = huff_dc[c["td"]].decode(br)
            diff = _extend(br.receive(t), t)
            pred[c["id"]] += diff
            blk[0] = pred[c["id"]] << al
        else:  # refinement: one bit per block
            if br.read_bit():
                blk[0] |= 1 << al

    def _ac_scan(self, br, c, huff_ac, dri, ss, se, ah, al):
        bh, bw = self.bdims[c["id"]]
        store = self.stores[c["id"]]
        eobrun = 0
        for m in range(bh * bw):
            if dri and m and m % dri == 0:
                marker = br.align_to_marker()
                if not (0xD0 <= marker <= 0xD7):
                    raise ValueError("corrupt JPEG: bad restart marker")
                eobrun = 0
            my, mx = divmod(m, bw)
            blk = store[my, mx]
            if ah == 0:
                eobrun = self._ac_first(br, blk, huff_ac[c["ta"]], ss, se,
                                        al, eobrun)
            else:
                eobrun = self._ac_refine(br, blk, huff_ac[c["ta"]], ss, se,
                                         al, eobrun)

    @staticmethod
    def _ac_first(br, blk, ac, ss, se, al, eobrun):
        """G.1.2.2: first pass over a spectral band."""
        if eobrun > 0:
            return eobrun - 1
        k = ss
        while k <= se:
            rs = ac.decode(br)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r == 15:
                    k += 16  # ZRL
                    continue
                eobrun = (1 << r) - 1
                if r:
                    eobrun += br.receive(r)
                return eobrun
            k += r
            if k > se:
                raise ValueError("corrupt JPEG: AC index overflow")
            blk[k] = _extend(br.receive(s), s) << al
            k += 1
        return 0

    @staticmethod
    def _ac_refine(br, blk, ac, ss, se, al, eobrun):
        """G.1.2.3: correction-bit pass (libjpeg decode_mcu_AC_refine
        semantics — every nonzero-history coefficient crossed by a run or
        an EOB span reads one refinement bit)."""
        p1 = 1 << al
        m1 = -1 << al

        def correct(k_):
            if br.read_bit() and (abs(int(blk[k_])) & p1) == 0:
                blk[k_] += p1 if blk[k_] >= 0 else m1

        k = ss
        if eobrun == 0:
            while k <= se:
                rs = ac.decode(br)
                r, s = rs >> 4, rs & 0xF
                newval = 0
                if s == 0:
                    if r < 15:
                        # NOTE: unlike the first pass, the refinement
                        # EOBRUN includes the CURRENT block — its
                        # remaining history coefficients still read
                        # correction bits below
                        eobrun = 1 << r
                        if r:
                            eobrun += br.receive(r)
                        break
                    # r == 15: ZRL — skip 16 zero-history coefficients
                else:
                    if s != 1:
                        raise ValueError("corrupt JPEG: bad refinement size")
                    newval = p1 if br.read_bit() else m1
                while k <= se:
                    if blk[k] != 0:
                        correct(k)
                    else:
                        if r == 0:
                            if newval:
                                blk[k] = newval
                            k += 1
                            break
                        r -= 1
                    k += 1
        if eobrun > 0:
            while k <= se:
                if blk[k] != 0:
                    correct(k)
                k += 1
            eobrun -= 1
        return eobrun

    def reconstruct(self, qt):
        comps = self.frame["comps"]
        stores = [self.stores[c["id"]] for c in comps]
        return _reconstruct(
            stores, comps, qt, self.frame["w"], self.frame["h"],
            self.hmax, self.vmax,
        )


# --------------------------------------------------------------------- #
# encoder (baseline 4:4:4, quality-scaled Annex-K tables)
# --------------------------------------------------------------------- #


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, size: int):
        self.acc = (self.acc << size) | (code & ((1 << size) - 1))
        self.nbits += size
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality curve: 50 → base table, 100 → all-ones."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base * scale + 50) // 100
    return np.clip(q, 1, 255)


def _magnitude(v: int) -> tuple[int, int]:
    """(size, code-bits) for a signed coefficient per spec CSIZE."""
    if v == 0:
        return 0, 0
    a = abs(v)
    n = a.bit_length()
    return n, (v if v > 0 else v + (1 << n) - 1)


def _enc_ac_first(bwr, blk, ac, ss, se, al):
    """Progressive AC first pass (G.1.2.2 encoder): run/size over the
    point-transformed band, EOB0 terminating trailing zeros."""
    run = 0
    for k in range(ss, se + 1):
        v = int(blk[k])
        t = abs(v) >> al
        if t == 0:
            run += 1
            continue
        while run > 15:
            code, size = ac[0xF0]
            bwr.write(code, size)
            run -= 16
        s, bits = _magnitude(t if v > 0 else -t)
        code, size = ac[(run << 4) | s]
        bwr.write(code, size)
        bwr.write(bits, s)
        run = 0
    if run > 0:
        code, size = ac[0x00]
        bwr.write(code, size)


def _enc_ac_refine(bwr, blk, ac, ss, se, al):
    """Progressive AC refinement encoder, built as a direct simulation of
    the decoder's crossing spans: each emitted symbol is followed by
    exactly the correction bits the decoder will read while crossing to
    that symbol's landing position (history coefficients in the span, in
    positional order)."""
    # classify band positions: H=history (bit), N=newly significant, Z=zero
    kinds = {}
    hbit = {}
    npos = []
    for k in range(ss, se + 1):
        t = abs(int(blk[k])) >> al
        if t == 0:
            kinds[k] = "Z"
        elif t == 1:
            kinds[k] = "N"
            npos.append(k)
        else:
            kinds[k] = "H"
            hbit[k] = t & 1

    def emit_bits(lo, hi):
        for k in range(lo, hi + 1):
            if kinds[k] == "H":
                bwr.write(hbit[k], 1)

    cur = ss
    for kn in npos:
        zcount = sum(1 for k in range(cur, kn) if kinds[k] == "Z")
        while zcount > 15:
            # position of the 16th zero after cur — the decoder's ZRL span
            seen = 0
            for k in range(cur, kn):
                if kinds[k] == "Z":
                    seen += 1
                    if seen == 16:
                        p16 = k
                        break
            code, size = ac[0xF0]
            bwr.write(code, size)
            emit_bits(cur, p16)
            cur = p16 + 1
            zcount -= 16
        code, size = ac[(zcount << 4) | 1]
        bwr.write(code, size)
        bwr.write(1 if int(blk[kn]) > 0 else 0, 1)
        emit_bits(cur, kn)  # kn itself is the landing zero; no bit there
        cur = kn + 1
    if cur <= se:  # anything left (zeros and/or history) → EOB0 span
        code, size = ac[0x00]
        bwr.write(code, size)
        emit_bits(cur, se)


def encode(
    w: int,
    h: int,
    pixels: bytes,
    channels: int = 3,
    quality: int = 90,
    restart_interval: int = 0,
    progressive: bool = False,
) -> bytes:
    """Encode HWC uint8 pixels as a JPEG: baseline sequential by default
    (4:4:4, or single-component grayscale), or huffman-PROGRESSIVE
    (SOF2) with four spectral-selection + successive-approximation
    scans: DC first (Al=1), DC refine, per-component AC 1-63 first
    (Al=1), per-component AC refine — so every Annex-G scan type is
    exercised. ``restart_interval`` > 0 emits DRI and RSTn markers
    every that many MCUs (baseline only)."""
    img = np.frombuffer(pixels, dtype=np.uint8).reshape(h, w, channels).astype(
        np.float64
    )
    if channels == 3:
        r, g, b = img[..., 0], img[..., 1], img[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
    elif channels == 1:
        planes = [img[..., 0]]
    else:
        raise ValueError("JPEG encode supports 1 or 3 channels")
    qlum = _scaled_quant(QUANT_LUM, quality)
    qchrom = _scaled_quant(QUANT_CHROM, quality)
    qtabs = [qlum] + ([qchrom] if channels == 3 else [])

    enc_dc = [_canonical_codes(*DC_LUM), _canonical_codes(*DC_CHROM)]
    enc_ac = [_canonical_codes(*AC_LUM), _canonical_codes(*AC_CHROM)]

    bw = _BitWriter()
    pred = [0] * channels
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = []
    for p in planes:
        pp = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
        padded.append(pp)
    # quantized zigzag coefficients per plane, then interleave per MCU
    zz = []
    for ci, p in enumerate(padded):
        blocks = (
            p.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3) - 128.0
        )
        coef = _fdct2(blocks.reshape(-1, 8, 8))
        q = qtabs[min(ci, 1)].reshape(8, 8).astype(np.float64)
        quant = np.round(coef / q).astype(np.int64).reshape(-1, 64)
        zz.append(quant[:, ZIGZAG].reshape(ph // 8, pw // 8, 64))
    if progressive:
        if restart_interval:
            raise ValueError("progressive encode does not emit restart intervals")
        return _assemble_progressive(
            w, h, channels, qtabs, zz, ph, pw, enc_dc, enc_ac
        )
    mcu_index = 0
    for myx in range(ph // 8):
        for mxx in range(pw // 8):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                bw.flush()
                n = (mcu_index // restart_interval - 1) % 8
                bw.out += bytes([0xFF, 0xD0 + n])
                pred = [0] * channels
            mcu_index += 1
            for ci in range(channels):
                blk = zz[ci][myx, mxx]
                t = min(ci, 1)
                dc, ac = enc_dc[t], enc_ac[t]
                diff = int(blk[0]) - pred[ci]
                pred[ci] = int(blk[0])
                s, bits = _magnitude(diff)
                code, size = dc[s]
                bw.write(code, size)
                if s:
                    bw.write(bits, s)
                run = 0
                last_nz = max(np.nonzero(blk[1:])[0], default=-1)
                for k in range(1, 64):
                    v = int(blk[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, size = ac[0xF0]  # ZRL
                        bw.write(code, size)
                        run -= 16
                    s, bits = _magnitude(v)
                    code, size = ac[(run << 4) | s]
                    bw.write(code, size)
                    bw.write(bits, s)
                    run = 0
                if last_nz < 62:  # trailing zeros -> EOB
                    code, size = ac[0x00]
                    bw.write(code, size)
    bw.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    # APP0 JFIF
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + struct.pack(
        ">HH", 1, 1
    ) + b"\x00\x00"
    # DQT (tables are kept in natural order; the wire format is zigzag)
    for tq, tbl in enumerate(qtabs):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq])
        out += bytes(int(x) for x in tbl[ZIGZAG])
    # SOF0
    nf = channels
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * nf, 8, h, w, nf)
    for ci in range(nf):
        out += bytes([ci + 1, 0x11, min(ci, 1)])
    # DHT
    tables = [(0x00, DC_LUM), (0x10, AC_LUM)]
    if channels == 3:
        tables += [(0x01, DC_CHROM), (0x11, AC_CHROM)]
    for tid, (bits, vals) in tables:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals)) + bytes([tid])
        out += bytes(bits) + bytes(vals)
    # DRI
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nf, nf)
    for ci in range(nf):
        td = min(ci, 1)
        out += bytes([ci + 1, (td << 4) | td])
    out += b"\x00\x3f\x00"
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _assemble_progressive(w, h, channels, qtabs, zz, ph, pw, enc_dc, enc_ac):
    """Emit the SOF2 container with four scan groups (see encode())."""
    AL = 1
    nb_y, nb_x = ph // 8, pw // 8
    scans = []  # (sos_bytes, entropy_bytes)

    def sos_header(comp_ids, ss, se, ah, al):
        ns = len(comp_ids)
        out = bytearray(b"\xff\xda" + struct.pack(">HB", 6 + 2 * ns, ns))
        for ci in comp_ids:
            td = min(ci, 1)
            out += bytes([ci + 1, (td << 4) | td])
        out += bytes([ss, se, (ah << 4) | al])
        return bytes(out)

    # scan 1: interleaved DC first (Al=AL) — arithmetic-shift point transform
    bw = _BitWriter()
    pred = [0] * channels
    for my in range(nb_y):
        for mx in range(nb_x):
            for ci in range(channels):
                dcv = int(zz[ci][my, mx][0]) >> AL
                diff = dcv - pred[ci]
                pred[ci] = dcv
                s, bits = _magnitude(diff)
                code, size = enc_dc[min(ci, 1)][s]
                bw.write(code, size)
                if s:
                    bw.write(bits, s)
    bw.flush()
    scans.append((sos_header(list(range(channels)), 0, 0, 0, AL), bytes(bw.out)))

    # scan 2: interleaved DC refinement (Ah=AL, Al=0): one bit per block
    bw = _BitWriter()
    for my in range(nb_y):
        for mx in range(nb_x):
            for ci in range(channels):
                bw.write(int(zz[ci][my, mx][0]) & 1, 1)
    bw.flush()
    scans.append((sos_header(list(range(channels)), 0, 0, AL, 0), bytes(bw.out)))

    # per-component AC first then AC refinement (non-interleaved by spec)
    for ci in range(channels):
        bw = _BitWriter()
        for my in range(nb_y):
            for mx in range(nb_x):
                _enc_ac_first(bw, zz[ci][my, mx], enc_ac[min(ci, 1)], 1, 63, AL)
        bw.flush()
        scans.append((sos_header([ci], 1, 63, 0, AL), bytes(bw.out)))
    for ci in range(channels):
        bw = _BitWriter()
        for my in range(nb_y):
            for mx in range(nb_x):
                _enc_ac_refine(bw, zz[ci][my, mx], enc_ac[min(ci, 1)], 1, 63, 0)
        bw.flush()
        scans.append((sos_header([ci], 1, 63, AL, 0), bytes(bw.out)))

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + struct.pack(
        ">HH", 1, 1
    ) + b"\x00\x00"
    for tq, tbl in enumerate(qtabs):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq])
        out += bytes(int(x) for x in tbl[ZIGZAG])
    nf = channels
    out += b"\xff\xc2" + struct.pack(">HBHHB", 8 + 3 * nf, 8, h, w, nf)
    for ci in range(nf):
        out += bytes([ci + 1, 0x11, min(ci, 1)])
    tables = [(0x00, DC_LUM), (0x10, AC_LUM)]
    if channels == 3:
        tables += [(0x01, DC_CHROM), (0x11, AC_CHROM)]
    for tid, (bits, vals) in tables:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals)) + bytes([tid])
        out += bytes(bits) + bytes(vals)
    for sos, payload in scans:
        out += sos + payload
    out += b"\xff\xd9"
    return bytes(out)
