"""Baseline JPEG codec — pure stdlib + numpy, no image libs.

Closes the last feasible piece of the pixel-decode surface the
reference covers via cv2/Pillow (`core/pipelines/loaders/
image_loader.py:20-31` loads real pixels for every format): baseline
sequential DCT, 8-bit JPEG is decoded for REAL here — marker parse,
DQT/DHT/SOF0/SOS, canonical Huffman entropy decode with DC prediction
and AC run-length, dequantize, inverse zigzag, float IDCT, level
shift — for greyscale AND 3-component YCbCr colour at any sampling
(the generic MCU loop handles 4:4:4, 4:2:2 and 4:2:0; chroma is
replication-upsampled, JFIF YCbCr→RGB) — and PROGRESSIVE (SOF2)
decode: spectral selection + successive approximation, DC/AC first
and refinement scans, EOB runs.  Also decoded for real: extended
sequential 12-bit (SOF1), Adobe CMYK/YCCK 4-component frames,
lossless (SOF3, Annex H — this file), and arithmetic frames both
sequential (SOF9) and progressive (SOF10) — ``jpeg_arith``.  Only
hierarchical modes remain the loudly-marked stub.

The matching encoder exists so the sandbox (which has no image
libraries to produce fixtures) can generate REAL JPEG payloads whose
decode is pinned by checksum: standard Annex K quantization + Huffman
tables (luminance and chrominance), byte stuffing, edge-replication
padding, greyscale / colour 4:4:4 / colour 4:2:0 modes.  DCT ∘
quantize is lossy, so round-trips assert bounded pixel error plus an
EXACT md5 on the decoded bytes (determinism: all arithmetic is IEEE
double + fixed rounding).

Spark-side plumbing is unchanged: `multimodal.decode_image_pixels`
dispatches here per-row inside the same Arrow-batched UDFs.
"""

from __future__ import annotations

import math
import struct

import numpy as np

# Decode-size guard (mirrors multimodal/tiff): a ~150-byte crafted SOF
# declaring 65500×65500 must return None BEFORE the per-block coef lists
# / uint8 planes are allocated, not MemoryError after — the allocation
# itself can trip the OS OOM killer and take down an executor.
_MAX_PIXELS = 1 << 26

# ---------------------------------------------------------------------
# Constants: zigzag order + ITU-T T.81 Annex K luminance tables
# ---------------------------------------------------------------------

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

QT_LUM = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]

QT_CHROM = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

# (BITS counts for code lengths 1..16, HUFFVAL) — Annex K.3
DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
DC_CHROM_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROM_VALS = list(range(12))
AC_CHROM_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROM_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _canonical_codes(bits: list[int], vals: list[int]):
    """(val → (code, length)) canonical Huffman assignment (T.81 C.2)."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_tree(bits: list[int], vals: list[int]):
    """((length, code) → val) lookup for decoding."""
    return {(l, c): v for v, (c, l) in _canonical_codes(bits, vals).items()}


# 8×8 DCT basis (orthonormal): row k of _DCT_M is the k-th cosine basis
_DCT_M = np.array(
    [
        [
            math.sqrt((1.0 if u == 0 else 2.0) / 8.0)
            * math.cos((2 * x + 1) * u * math.pi / 16.0)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def _fdct(block: np.ndarray) -> np.ndarray:
    return _DCT_M @ block @ _DCT_M.T


def _idct(coef: np.ndarray) -> np.ndarray:
    return _DCT_M.T @ coef @ _DCT_M


def _category(v: int) -> int:
    return 0 if v == 0 else int(v).bit_length() if v > 0 else int(-v).bit_length()


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def byte_align(self) -> None:
        """Pad to a byte boundary with 1-bits (pre-restart-marker)."""
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)

    def flush(self) -> bytes:
        self.byte_align()
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            # stuffed byte: FF 00 → literal FF (markers never occur
            # mid-scan in baseline single-scan data)
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1
            else:
                raise ValueError(f"unexpected marker 0xFF{nxt:02X} in scan")
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bits(self, k: int) -> int:
        while self.n < k:
            self._fill()
        v = (self.acc >> (self.n - k)) & ((1 << k) - 1)
        self.n -= k
        self.acc &= (1 << self.n) - 1
        return v


def _receive_extend(r: "_BitReader", s: int) -> int:
    """T.81 F.2.2.1: read an s-bit magnitude, sign-extend."""
    if s == 0:
        return 0
    v = r.bits(s)
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


# ---------------------------------------------------------------------
# Encoder (fixture generator — real JPEG output)
# ---------------------------------------------------------------------


_LUM_DC = _canonical_codes(DC_LUM_BITS, DC_LUM_VALS)
_LUM_AC = _canonical_codes(AC_LUM_BITS, AC_LUM_VALS)
_CHR_DC = _canonical_codes(DC_CHROM_BITS, DC_CHROM_VALS)
_CHR_AC = _canonical_codes(AC_CHROM_BITS, AC_CHROM_VALS)


def _encode_quantized(
    out: _BitWriter,
    zz: list[int],
    prev_dc: int,
    dc_codes,
    ac_codes,
) -> int:
    """Entropy-code one quantized block (zigzag order): DC difference
    vs *prev_dc* (pass 0 for the differential-frame PRED=0 rule), AC
    run-length with ZRL/EOB.  The single sequential-Huffman coder
    behind the baseline AND hierarchical encoders; returns the new DC
    predictor (zz[0])."""
    diff = zz[0] - prev_dc
    s = _category(diff)
    c, l = dc_codes[s]
    out.write(c, l)
    if s:
        out.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
    for k in range(1, last_nz + 1):
        v = zz[k]
        if v == 0:
            run += 1
            continue
        while run >= 16:
            c, l = ac_codes[0xF0]  # ZRL
            out.write(c, l)
            run -= 16
        s = _category(v)
        c, l = ac_codes[(run << 4) | s]
        out.write(c, l)
        out.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        c, l = ac_codes[0x00]  # EOB
        out.write(c, l)
    return zz[0]


def _encode_block(
    out: _BitWriter,
    block: np.ndarray,
    qt: np.ndarray,
    prev_dc: int,
    dc_codes,
    ac_codes,
    center: float = 128.0,
) -> int:
    """FDCT + quantize + entropy-code one 8×8 sample block; returns the
    new DC predictor."""
    q = np.rint(_fdct(block - center) / qt).astype(int).reshape(64)
    zz = [int(q[i]) for i in ZIGZAG]
    return _encode_quantized(out, zz, prev_dc, dc_codes, ac_codes)


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body


def _pad_plane(plane: np.ndarray, bh: int, bw: int) -> np.ndarray:
    """Edge-replicate a component plane up to (bh*8, bw*8)."""
    return np.pad(
        plane,
        ((0, bh * 8 - plane.shape[0]), (0, bw * 8 - plane.shape[1])),
        mode="edge",
    )


def _headers(
    w: int,
    h: int,
    comps: list[tuple[int, int, int, int]],
    sof_marker: int = 0xC0,
    with_sos: bool = True,
) -> bytes:
    """SOI..(SOS) header bytes for *comps* = [(cid, h_samp, v_samp,
    tq)]; *sof_marker* picks the frame type (0xC0 baseline, 0xC2
    progressive), *with_sos* appends the baseline single-scan SOS."""
    ncomp = len(comps)
    app0 = _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    dqt = _seg(0xDB, bytes([0x00]) + bytes(QT_LUM[i] for i in ZIGZAG))
    dht = _seg(
        0xC4, bytes([0x00]) + bytes(DC_LUM_BITS) + bytes(DC_LUM_VALS)
    ) + _seg(0xC4, bytes([0x10]) + bytes(AC_LUM_BITS) + bytes(AC_LUM_VALS))
    sos_comps = bytes([comps[0][0], 0x00])
    if ncomp == 3:
        dqt += _seg(0xDB, bytes([0x01]) + bytes(QT_CHROM[i] for i in ZIGZAG))
        dht += _seg(
            0xC4, bytes([0x01]) + bytes(DC_CHROM_BITS) + bytes(DC_CHROM_VALS)
        ) + _seg(
            0xC4, bytes([0x11]) + bytes(AC_CHROM_BITS) + bytes(AC_CHROM_VALS)
        )
        sos_comps += bytes([comps[1][0], 0x11, comps[2][0], 0x11])
    sof_body = struct.pack(">BHHB", 8, h, w, ncomp) + b"".join(
        bytes([cid, (hs << 4) | vs, tq]) for cid, hs, vs, tq in comps
    )
    sof0 = _seg(sof_marker, sof_body)
    out = b"\xff\xd8" + app0 + dqt + sof0 + dht
    if with_sos:
        out += _seg(0xDA, bytes([ncomp]) + sos_comps + bytes([0, 63, 0]))
    return out


def encode_gray_jpeg(
    px: bytes, w: int, h: int, restart_interval: int = 0
) -> bytes:
    """8-bit greyscale pixels (row-major) → baseline JFIF JPEG using
    the Annex K luminance tables.  Deterministic: float64 DCT + round
    half-to-even quantization.  *restart_interval* > 0 emits DRI and
    an RSTn marker (cycling 0-7) every that many MCUs, resetting the
    DC predictor — the layout real encoders use for error resilience."""
    img = np.frombuffer(px, dtype=np.uint8).reshape(h, w).astype(np.float64)
    bw, bh = (w + 7) // 8, (h + 7) // 8
    padded = _pad_plane(img, bh, bw)
    qt = np.array(QT_LUM, dtype=np.float64).reshape(8, 8)
    out = _BitWriter()
    prev_dc = 0
    unit = 0
    rst = 0
    for by in range(bh):
        for bx in range(bw):
            if restart_interval and unit and unit % restart_interval == 0:
                out.byte_align()
                out.buf += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                prev_dc = 0
            prev_dc = _encode_block(
                out,
                padded[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8],
                qt,
                prev_dc,
                _LUM_DC,
                _LUM_AC,
            )
            unit += 1
    hdr = _headers(w, h, [(1, 1, 1, 0)], with_sos=False)
    if restart_interval:
        hdr += _seg(0xDD, restart_interval.to_bytes(2, "big"))
    hdr += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return hdr + out.flush() + b"\xff\xd9"


def _rgb_to_ycbcr(px: bytes, w: int, h: int):
    rgb = np.frombuffer(px, dtype=np.uint8).reshape(h, w, 3).astype(np.float64)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return y, cb, cr


def encode_rgb_jpeg(
    px: bytes, w: int, h: int, subsample: bool = False
) -> bytes:
    """8-bit interleaved RGB → baseline JFIF YCbCr JPEG; 4:4:4 by
    default, 4:2:0 with *subsample* (chroma = 2×2 box mean)."""
    y, cb, cr = _rgb_to_ycbcr(px, w, h)
    qt_l = np.array(QT_LUM, dtype=np.float64).reshape(8, 8)
    qt_c = np.array(QT_CHROM, dtype=np.float64).reshape(8, 8)
    out = _BitWriter()
    if not subsample:
        bw, bh = (w + 7) // 8, (h + 7) // 8
        planes = [
            (_pad_plane(y, bh, bw), qt_l, _LUM_DC, _LUM_AC),
            (_pad_plane(cb, bh, bw), qt_c, _CHR_DC, _CHR_AC),
            (_pad_plane(cr, bh, bw), qt_c, _CHR_DC, _CHR_AC),
        ]
        preds = [0, 0, 0]
        for by in range(bh):
            for bx in range(bw):
                for ci, (pl, qt, dct, act) in enumerate(planes):
                    preds[ci] = _encode_block(
                        out,
                        pl[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8],
                        qt,
                        preds[ci],
                        dct,
                        act,
                    )
        comps = [(1, 1, 1, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
    else:
        mx, my = (w + 15) // 16, (h + 15) // 16
        ypl = _pad_plane(y, my * 2, mx * 2)
        # chroma: 2×2 box mean of the padded luma-res plane, then the
        # half-res planes are exactly (my*8, mx*8)
        def down(p: np.ndarray) -> np.ndarray:
            p = _pad_plane(p, my * 2, mx * 2)
            return (
                p[0::2, 0::2] + p[1::2, 0::2] + p[0::2, 1::2] + p[1::2, 1::2]
            ) / 4.0

        cbd, crd = down(cb), down(cr)
        preds = [0, 0, 0]
        for byy in range(my):
            for bxx in range(mx):
                for v in range(2):
                    for hh in range(2):
                        r0, c0 = (byy * 2 + v) * 8, (bxx * 2 + hh) * 8
                        preds[0] = _encode_block(
                            out, ypl[r0:r0 + 8, c0:c0 + 8], qt_l,
                            preds[0], _LUM_DC, _LUM_AC,
                        )
                preds[1] = _encode_block(
                    out, cbd[byy * 8:(byy + 1) * 8, bxx * 8:(bxx + 1) * 8],
                    qt_c, preds[1], _CHR_DC, _CHR_AC,
                )
                preds[2] = _encode_block(
                    out, crd[byy * 8:(byy + 1) * 8, bxx * 8:(bxx + 1) * 8],
                    qt_c, preds[2], _CHR_DC, _CHR_AC,
                )
        comps = [(1, 2, 2, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
    return _headers(w, h, comps) + out.flush() + b"\xff\xd9"


# Extended-precision Huffman tables (12-bit frames need DC categories
# up to 15 and AC sizes up to 14 — beyond the Annex K 8-bit tables).
# Flat fixture tables: DC 15×len-5 + 1×len-6 (the all-ones len-5 code
# stays reserved as a longer-code prefix, T.81 C.2), AC all 226
# symbols at len 8 (EOB, every (run, size 1-14), ZRL) — canonical
# codes 0..225, prefix-free, none all-ones.
_EXT_DC_BITS = [0, 0, 0, 0, 15, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_EXT_DC_VALS = list(range(16))
_EXT_AC_VALS = (
    [0x00]
    + [(run << 4) | s for run in range(16) for s in range(1, 15)]
    + [0xF0]
)
_EXT_AC_BITS = [0, 0, 0, 0, 0, 0, 0, len(_EXT_AC_VALS),
                0, 0, 0, 0, 0, 0, 0, 0]
_EXT_DC = _canonical_codes(_EXT_DC_BITS, _EXT_DC_VALS)
_EXT_AC = _canonical_codes(_EXT_AC_BITS, _EXT_AC_VALS)


def encode_gray12_jpeg(samples, w: int, h: int) -> bytes:
    """12-bit greyscale (sequence of ints 0-4095, row-major) →
    extended sequential (SOF1) JPEG: 16-bit DQT entries (Pq=1, same
    Annex K luminance values) and the extended Huffman tables above.
    The fixture side of the 12-bit decode path; decode reduces to the
    high 8 bits (the 16-bit lossless convention)."""
    img = np.asarray(list(samples), dtype=np.float64).reshape(h, w)
    if img.min() < 0 or img.max() > 4095:
        raise ValueError("12-bit samples must be in 0..4095")
    bw, bh = (w + 7) // 8, (h + 7) // 8
    padded = _pad_plane(img, bh, bw)
    qt = np.array(QT_LUM, dtype=np.float64).reshape(8, 8)
    out = _BitWriter()
    prev_dc = 0
    for by in range(bh):
        for bx in range(bw):
            prev_dc = _encode_block(
                out,
                padded[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8],
                qt,
                prev_dc,
                _EXT_DC,
                _EXT_AC,
                center=2048.0,
            )
    app0 = _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    dqt = _seg(
        0xDB,
        bytes([0x10])
        + b"".join(QT_LUM[i].to_bytes(2, "big") for i in ZIGZAG),
    )
    dht = _seg(
        0xC4,
        bytes([0x00]) + bytes(_EXT_DC_BITS) + bytes(_EXT_DC_VALS),
    ) + _seg(
        0xC4,
        bytes([0x10]) + bytes(_EXT_AC_BITS) + bytes(_EXT_AC_VALS),
    )
    sof = _seg(0xC1, struct.pack(">BHHB", 12, h, w, 1) + bytes([1, 0x11, 0]))
    sos = _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return (
        b"\xff\xd8" + app0 + dqt + sof + dht + sos
        + out.flush() + b"\xff\xd9"
    )


def encode_cmyk_jpeg(
    px: bytes, w: int, h: int, ycck: bool = False
) -> bytes:
    """8-bit interleaved CMYK ink values (w*h*4, non-inverted) →
    Adobe APP14 4-component baseline JPEG.  Stored samples follow the
    Adobe convention (inverted: 255−ink); with *ycck* the inverted
    CMY channels additionally ride the YCbCr transform (APP14
    transform flag 2), the layout print-oriented encoders emit."""
    cmyk = (
        np.frombuffer(px, dtype=np.uint8)
        .reshape(h, w, 4)
        .astype(np.float64)
    )
    inv = 255.0 - cmyk  # Adobe stored values
    if ycck:
        r, g, bch = inv[..., 0], inv[..., 1], inv[..., 2]
        p0 = 0.299 * r + 0.587 * g + 0.114 * bch
        p1 = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * bch
        p2 = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * bch
    else:
        p0, p1, p2 = inv[..., 0], inv[..., 1], inv[..., 2]
    p3 = inv[..., 3]
    bw, bh = (w + 7) // 8, (h + 7) // 8
    qt = np.array(QT_LUM, dtype=np.float64).reshape(8, 8)
    planes = [_pad_plane(p, bh, bw) for p in (p0, p1, p2, p3)]
    out = _BitWriter()
    preds = [0, 0, 0, 0]
    for by in range(bh):
        for bx in range(bw):
            for ci, pl in enumerate(planes):
                preds[ci] = _encode_block(
                    out,
                    pl[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8],
                    qt,
                    preds[ci],
                    _LUM_DC,
                    _LUM_AC,
                )
    app14 = _seg(
        0xEE,
        b"Adobe" + bytes([0, 100, 0, 0, 0, 0, 2 if ycck else 0]),
    )
    dqt = _seg(0xDB, bytes([0x00]) + bytes(QT_LUM[i] for i in ZIGZAG))
    dht = _seg(
        0xC4, bytes([0x00]) + bytes(DC_LUM_BITS) + bytes(DC_LUM_VALS)
    ) + _seg(0xC4, bytes([0x10]) + bytes(AC_LUM_BITS) + bytes(AC_LUM_VALS))
    sof = _seg(
        0xC0,
        struct.pack(">BHHB", 8, h, w, 4)
        + b"".join(bytes([cid, 0x11, 0]) for cid in (1, 2, 3, 4)),
    )
    sos = _seg(
        0xDA,
        bytes([4])
        + b"".join(bytes([cid, 0x00]) for cid in (1, 2, 3, 4))
        + bytes([0, 63, 0]),
    )
    return (
        b"\xff\xd8" + app14 + dqt + sof + dht + sos
        + out.flush() + b"\xff\xd9"
    )


# ---------------------------------------------------------------------
# Decoder (the real surface)
# ---------------------------------------------------------------------


def decode_jpeg(b: bytes) -> tuple[int, int, str, bytes] | None:
    """Baseline sequential JPEG → (w, h, 'L'|'RGB', pixels).

    Handles 1-component greyscale and 3-component YCbCr at any
    sampling factors (4:4:4 / 4:2:2 / 4:2:0 via the generic MCU loop),
    restart markers included; extended sequential (SOF1) frames with
    12-bit precision (16-bit DQT entries, extended Huffman categories,
    output reduced to the high 8 bits — the 16-bit lossless
    convention); and 4-component Adobe CMYK/YCCK (APP14 transform
    flag, inverted-sample convention, converted to RGB).  None when
    the payload is not a JPEG this path covers (hierarchical /
    arith-progressive) — the caller falls through to its loud stub.
    Progressive (SOF2) frames route to ``_decode_progressive`` —
    spectral selection AND successive approximation, DC/AC first +
    refinement scans, EOB runs; sequential arithmetic (SOF9) frames
    to ``jpeg_arith.decode_arith_jpeg`` (QM-coder, T.81 Annex D/F).

    Malformed/truncated payloads return None rather than raising: at
    corpus scale one corrupt blob must not fail a whole Arrow batch
    (fuzz-pinned — truncations, bit flips and splices of every valid
    fixture).
    """
    try:
        return _decode_jpeg_checked(b)
    except (IndexError, KeyError, ValueError, ZeroDivisionError,
            struct.error):
        return None


def _decode_jpeg_checked(b: bytes) -> tuple[int, int, str, bytes] | None:
    if b[:2] != b"\xff\xd8":
        return None
    qts: dict[int, list[int]] = {}
    dc_trees: dict[int, dict] = {}
    ac_trees: dict[int, dict] = {}
    w = h = None
    prec = 8
    adobe: int | None = None  # APP14 color-transform flag
    comps: list[tuple[int, int, int, int]] = []  # (cid, hs, vs, tq)
    sel: dict[int, tuple[int, int]] = {}  # cid → (dc_sel, ac_sel)
    dri = 0
    pos = 2
    n = len(b)
    scan_off = None
    while pos + 4 <= n:
        if b[pos] != 0xFF:
            return None
        marker = b[pos + 1]
        if marker == 0xD9:  # EOI before scan
            return None
        ln = int.from_bytes(b[pos + 2:pos + 4], "big")
        body = b[pos + 4:pos + 2 + ln]
        if marker == 0xDB:
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq == 0:
                    tbl = list(body[i + 1:i + 65])
                    i += 65
                elif pq == 1:  # 16-bit entries (12-bit frames)
                    raw = body[i + 1:i + 129]
                    tbl = [
                        int.from_bytes(raw[2 * k:2 * k + 2], "big")
                        for k in range(64)
                    ]
                    i += 129
                else:
                    return None
                inv = [0] * 64
                for k, z in enumerate(ZIGZAG):
                    inv[z] = tbl[k]
                qts[tq] = inv
        elif marker == 0xEE and body[:5] == b"Adobe" and len(body) >= 12:
            adobe = body[11]
        elif marker == 0xC4:
            _parse_dht(body, dc_trees, ac_trees)
        elif marker == 0xDD:
            dri = int.from_bytes(body[0:2], "big")
        elif marker in (0xC0, 0xC1):
            # baseline OR extended sequential (SOF1): the decoding
            # process is identical — SOF1 just legalizes 12-bit
            # precision and the larger Huffman categories the generic
            # tree walk already handles
            prec = body[0]
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            ncomp = body[5]
            if prec not in (8, 12) or ncomp not in (1, 3, 4):
                return None
            if ncomp == 4 and prec != 8:
                return None  # 12-bit CMYK: out of scope
            if not w or not h or w * h > _MAX_PIXELS:
                return None  # dimension bomb / degenerate frame
            for c in range(ncomp):
                cid = body[6 + 3 * c]
                samp = body[7 + 3 * c]
                tq = body[8 + 3 * c]
                comps.append((cid, samp >> 4, samp & 0x0F, tq))
        elif marker == 0xC2:
            return _decode_progressive(b)  # progressive frame
        elif marker == 0xC3:
            return _decode_lossless(b)  # lossless predictive frame
        elif marker == 0xC9:
            from .jpeg_arith import decode_arith_jpeg

            return decode_arith_jpeg(b)  # sequential arithmetic frame
        elif marker == 0xCA:
            from .jpeg_arith import decode_arith_progressive

            return decode_arith_progressive(b)  # progressive arithmetic
        elif marker == 0xDE:
            from .jpeg_hier import decode_hier_jpeg

            return decode_hier_jpeg(b)  # hierarchical pyramid (Annex J)
        elif marker in (0xC5, 0xC6, 0xC7,
                        0xCB, 0xCD, 0xCE, 0xCF):
            return None  # differential frames outside a DHP hierarchy
        elif marker == 0xDA:
            ns = body[0]
            if ns != len(comps) or ns == 0:
                return None  # multi-scan baseline not supported
            for c in range(ns):
                cid = body[1 + 2 * c]
                sel[cid] = (body[2 + 2 * c] >> 4, body[2 + 2 * c] & 0x0F)
            scan_off = pos + 2 + ln
            break
        pos += 2 + ln
    if scan_off is None or w is None or not comps:
        return None
    if len(comps) == 1:
        # T.81 A.2.2: a single-component scan is NON-interleaved — the
        # MCU is one 8×8 data unit and the declared sampling factors
        # do not shape the scan geometry (a grey JPEG with h/v=2
        # factors still stores ceil(w/8)×ceil(h/8) blocks in order)
        comps = [(comps[0][0], 1, 1, comps[0][3])]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax < 1 or vmax < 1:
        return None
    mx = (w + 8 * hmax - 1) // (8 * hmax)
    my = (h + 8 * vmax - 1) // (8 * vmax)
    # sampling factors run to 15: bound the PADDED plane, not just w*h
    if (mx * hmax * 8) * (my * vmax * 8) > (_MAX_PIXELS << 2):
        return None
    end = b.rfind(b"\xff\xd9")
    if end < scan_off:
        return None
    scan = b[scan_off:end]

    planes = []
    tables = []
    for cid, hs, vs, tq in comps:
        qt = qts.get(tq)
        if cid not in sel or qt is None:
            return None
        dc_tree = dc_trees.get(sel[cid][0])
        ac_tree = ac_trees.get(sel[cid][1])
        if dc_tree is None or ac_tree is None:
            return None
        planes.append(
            np.empty(
                (my * vs * 8, mx * hs * 8),
                dtype=np.uint8 if prec == 8 else np.uint16,
            )
        )
        tables.append(
            (np.array(qt, dtype=np.float64).reshape(8, 8), dc_tree, ac_tree)
        )
    center = float(1 << (prec - 1))
    vmax_sample = (1 << prec) - 1

    # restart-interval segmentation: RSTn markers byte-align the stream
    # and reset every DC predictor
    segments = []
    if dri:
        seg_start = 0
        i = 0
        while i < len(scan) - 1:
            if scan[i] == 0xFF and 0xD0 <= scan[i + 1] <= 0xD7:
                segments.append(scan[seg_start:i])
                seg_start = i + 2
                i += 2
            else:
                i += 1
        segments.append(scan[seg_start:])
    else:
        segments = [scan]

    r = _BitReader(segments[0])
    seg_idx = 0

    def read_huff(tree) -> int:
        code, length = 0, 0
        while length <= 16:
            code = (code << 1) | r.bits(1)
            length += 1
            v = tree.get((length, code))
            if v is not None:
                return v
        raise ValueError("bad Huffman code")

    def decode_block(ci: int, prev_dc: int, by: int, bx: int) -> int:
        qarr, dc_tree, ac_tree = tables[ci]
        zz = [0] * 64
        s = read_huff(dc_tree)
        prev_dc += _receive_extend(r, s)
        zz[0] = prev_dc
        k = 1
        while k < 64:
            rs = read_huff(ac_tree)
            rr, s = rs >> 4, rs & 0x0F
            if s == 0:
                if rr == 15:
                    k += 16  # ZRL
                    continue
                break  # EOB
            k += rr
            if k > 63:
                raise ValueError("AC run past block end")
            zz[k] = _receive_extend(r, s)
            k += 1
        coef = np.zeros(64, dtype=np.float64)
        for kk, z in enumerate(ZIGZAG):
            coef[z] = zz[kk]
        block = _idct(coef.reshape(8, 8) * qarr) + center
        planes[ci][by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] = np.clip(
            np.rint(block), 0, vmax_sample
        ).astype(planes[ci].dtype)
        return prev_dc

    preds = [0] * len(comps)
    mcu_count = 0
    try:
        for myy in range(my):
            for mxx in range(mx):
                if dri and mcu_count and mcu_count % dri == 0:
                    seg_idx += 1
                    if seg_idx >= len(segments):
                        raise ValueError("missing restart segment")
                    r = _BitReader(segments[seg_idx])
                    preds = [0] * len(comps)
                for ci, (_, hs, vs, _) in enumerate(comps):
                    for v in range(vs):
                        for hh in range(hs):
                            preds[ci] = decode_block(
                                ci, preds[ci], myy * vs + v, mxx * hs + hh
                            )
                mcu_count += 1
    except (IndexError, ValueError):
        return None

    return _finish_planes(
        comps, planes, w, h, hmax, vmax, prec=prec, adobe=adobe
    )


# name kept from the grey-only first cut; now the general entry point
decode_gray_jpeg = decode_jpeg


# ---------------------------------------------------------------------
# Progressive JPEG (SOF2): spectral selection + successive approximation
# ---------------------------------------------------------------------


def _finish_planes(comps, planes, w, h, hmax, vmax, prec=8, adobe=None):
    """Shared reconstruction tail: upsample + JFIF YCbCr→RGB (or crop
    the single greyscale plane).

    *prec* = 12 reduces samples to 8-bit by truncating the low nibble
    AFTER the color transform (the high-byte convention the 16-bit
    lossless path already uses).  Four components are Adobe CMYK:
    *adobe* is the APP14 transform flag (2 = YCCK → undo the YCbCr
    transform on the first three channels first); with an Adobe
    marker the stored values are INVERTED per the Adobe convention,
    so RGB = stored_CMY × stored_K / 255; without one, plain CMYK:
    RGB = (255−C) × (255−K) / 255."""
    if len(comps) == 1:
        p = planes[0][:h, :w]
        if prec != 8:
            p = (p >> (prec - 8)).astype(np.uint8)
        return w, h, "L", p.tobytes()
    full = []
    for ci, (_, hs, vs, _) in enumerate(comps):
        p = planes[ci].astype(np.float64)
        p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        full.append(p[:h, :w])
    center = float(1 << (prec - 1))
    top = float((1 << prec) - 1)

    def ycc_to_rgb(y, cb, cr):
        rr = y + 1.402 * (cr - center)
        gg = y - 0.344136 * (cb - center) - 0.714136 * (cr - center)
        bb = y + 1.772 * (cb - center)
        return rr, gg, bb

    if len(comps) == 3:
        rr, gg, bb = ycc_to_rgb(*full)
        chans = [np.clip(np.rint(c), 0, top) for c in (rr, gg, bb)]
        if prec != 8:
            chans = [
                np.floor(c).astype(np.uint16) >> (prec - 8) for c in chans
            ]
        rgb = np.stack(chans, axis=-1).astype(np.uint8)
        return w, h, "RGB", rgb.tobytes()
    # 4 components: Adobe CMYK / YCCK (8-bit only — enforced upstream)
    c0, c1, c2, kk = full
    if adobe == 2:  # YCCK: CMY channels carried as YCbCr
        c0, c1, c2 = (
            np.clip(c, 0.0, 255.0) for c in ycc_to_rgb(c0, c1, c2)
        )
    if adobe is not None:  # Adobe files store inverted CMYK
        rr = c0 * kk / 255.0
        gg = c1 * kk / 255.0
        bb = c2 * kk / 255.0
    else:
        rr = (255.0 - c0) * (255.0 - kk) / 255.0
        gg = (255.0 - c1) * (255.0 - kk) / 255.0
        bb = (255.0 - c2) * (255.0 - kk) / 255.0
    rgb = np.stack(
        [np.clip(np.rint(c), 0, 255) for c in (rr, gg, bb)], axis=-1
    ).astype(np.uint8)
    return w, h, "RGB", rgb.tobytes()


def _parse_dht(body: bytes, dc_trees: dict, ac_trees: dict) -> None:
    """One DHT segment into the class-0 / class-1 tree dicts — the
    single implementation behind every decoder's marker walk (review
    r6: this loop had grown five hand-rolled copies)."""
    i = 0
    while i < len(body):
        tc, th = body[i] >> 4, body[i] & 0x0F
        bits = list(body[i + 1:i + 17])
        cnt = sum(bits)
        vals = list(body[i + 17:i + 17 + cnt])
        (ac_trees if tc else dc_trees)[th] = _decode_tree(bits, vals)
        i += 17 + cnt


def _parse_dqt(body: bytes, qts: dict) -> bool:
    """One DQT segment into *qts* (natural order) — the 8-bit-only
    form shared by the multi-scan decoders (SOF2 here, SOF9/SOF10 in
    ``jpeg_arith``); False on 16-bit entries those paths reject."""
    i = 0
    while i < len(body):
        pq, tq = body[i] >> 4, body[i] & 0x0F
        if pq != 0:
            return False
        tbl = list(body[i + 1:i + 65])
        inv = [0] * 64
        for k, z in enumerate(ZIGZAG):
            inv[z] = tbl[k]
        qts[tq] = inv
        i += 65
    return True


def _parse_frame_header(body: bytes):
    """SOF body → (w, h, comps, hmax, vmax, mx, my), applying the
    shared 8-bit / component-count / dimension-bomb guards; None when
    rejected.  Single-component frames normalize to 1×1 sampling
    (T.81 A.2.2).  One implementation for SOF2/SOF9/SOF10 so a guard
    fix can never diverge between the entropy paths."""
    prec = body[0]
    h = int.from_bytes(body[1:3], "big")
    w = int.from_bytes(body[3:5], "big")
    ncomp = body[5]
    if prec != 8 or ncomp not in (1, 3):
        return None
    comps = []
    for c in range(ncomp):
        cid = body[6 + 3 * c]
        samp = body[7 + 3 * c]
        comps.append((cid, samp >> 4, samp & 0x0F, body[8 + 3 * c]))
    if ncomp == 1:
        comps = [(comps[0][0], 1, 1, comps[0][3])]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax < 1 or vmax < 1:
        return None
    if not w or not h or w * h > _MAX_PIXELS:
        return None  # dimension bomb / degenerate frame
    mx = (w + 8 * hmax - 1) // (8 * hmax)
    my = (h + 8 * vmax - 1) // (8 * vmax)
    # padded coef grid (15× samp factors) must stay bounded too
    if (mx * hmax * 8) * (my * vmax * 8) > (_MAX_PIXELS << 2):
        return None
    return w, h, comps, hmax, vmax, mx, my


def _alloc_prog_coefs(comps, w, h, hmax, vmax, mx, my):
    """Zeroed per-component coefficient grids (padded interleaved
    coverage) + true block dims (non-interleaved scan coverage) for
    the progressive decoders."""
    coefs, cdims = [], []
    for cid, hs, vs, tq in comps:
        # interleaved coverage (mx*hs) always ≥ the non-interleaved
        # ceil(cw/8); allocate the larger
        coefs.append(
            [[[0] * 64 for _ in range(mx * hs)] for _ in range(my * vs)]
        )
        cw = (w * hs + hmax - 1) // hmax
        ch = (h * vs + vmax - 1) // vmax
        cdims.append(((ch + 7) // 8, (cw + 7) // 8))
    return coefs, cdims


def _entropy_end(b: bytes, start: int) -> int:
    """Index of the first real marker (not stuffing, not RSTn) after
    *start* — the end of a scan's entropy-coded data."""
    i = start
    n = len(b)
    while i < n - 1:
        if b[i] == 0xFF and b[i + 1] != 0x00 and not (
            0xD0 <= b[i + 1] <= 0xD7
        ):
            return i
        i += 1
    return n


class _ScanReader:
    """Bit reader over entropy data with RSTn handling: crossing a
    restart marker byte-aligns and signals the caller to reset DC
    predictors and the EOB run."""

    def __init__(self, data: bytes) -> None:
        self.segments = []
        seg_start = 0
        i = 0
        while i < len(data) - 1:
            if data[i] == 0xFF and 0xD0 <= data[i + 1] <= 0xD7:
                self.segments.append(data[seg_start:i])
                seg_start = i + 2
                i += 2
            else:
                i += 1
        self.segments.append(data[seg_start:])
        self.idx = 0
        self.r = _BitReader(self.segments[0])

    def restart(self) -> None:
        self.idx += 1
        if self.idx >= len(self.segments):
            raise ValueError("missing restart segment")
        self.r = _BitReader(self.segments[self.idx])

    def bits(self, k: int) -> int:
        return self.r.bits(k)

    def huff(self, tree) -> int:
        code, length = 0, 0
        while length <= 16:
            code = (code << 1) | self.r.bits(1)
            length += 1
            v = tree.get((length, code))
            if v is not None:
                return v
        raise ValueError("bad Huffman code")


def _prog_ac_first(sr, tree, coef, Ss, Se, Al, eobrun):
    """AC first scan for one block (T.81 G.1.2.2): returns new eobrun."""
    if eobrun > 0:
        return eobrun - 1
    k = Ss
    while k <= Se:
        rs = sr.huff(tree)
        rr, s = rs >> 4, rs & 0x0F
        if s == 0:
            if rr != 15:
                run = 1 << rr
                if rr:
                    run += sr.bits(rr)
                return run - 1  # this block is part of the run
            k += 16  # ZRL
            continue
        k += rr
        if k > Se:
            raise ValueError("AC run past band end")
        coef[k] = _receive_extend(sr.r, s) << Al
        k += 1
    return 0


def _prog_ac_refine(sr, tree, coef, Ss, Se, Al, eobrun):
    """AC refinement scan for one block (T.81 G.1.2.3, the libjpeg
    decode_mcu_AC_refine shape): returns new eobrun."""
    p1 = 1 << Al
    k = Ss
    if eobrun == 0:
        while k <= Se:
            rs = sr.huff(tree)
            rr, s = rs >> 4, rs & 0x0F
            if s:
                if s != 1:
                    raise ValueError("bad refinement size")
                newval = p1 if sr.bits(1) else -p1
            else:
                if rr != 15:
                    eobrun = 1 << rr
                    if rr:
                        eobrun += sr.bits(rr)
                    break
                newval = 0  # ZRL
            while k <= Se:
                c = coef[k]
                if c != 0:
                    if sr.bits(1) and (abs(c) & p1) == 0:
                        coef[k] = c + (p1 if c > 0 else -p1)
                else:
                    if rr == 0:
                        break
                    rr -= 1
                k += 1
            if newval:
                if k > Se:
                    raise ValueError("refinement run past band end")
                coef[k] = newval
            k += 1
    if eobrun > 0:
        while k <= Se:
            c = coef[k]
            if c != 0:
                if sr.bits(1) and (abs(c) & p1) == 0:
                    coef[k] = c + (p1 if c > 0 else -p1)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_progressive(b: bytes) -> tuple[int, int, str, bytes] | None:
    """Progressive (SOF2) JPEG: multiple scans refine per-component
    DCT coefficient arrays — DC first/refinement, AC spectral bands
    with EOB runs, successive-approximation refinement — then one
    dequantize+IDCT reconstruction."""
    qts: dict[int, list[int]] = {}
    dc_trees: dict[int, dict] = {}
    ac_trees: dict[int, dict] = {}
    w = h = None
    comps: list[tuple[int, int, int, int]] = []
    coefs: list = []
    cdims: list[tuple[int, int]] = []  # per-comp (block_h, block_w)
    hmax = vmax = 1
    mx = my = 0
    dri = 0
    pos = 2
    n = len(b)
    saw_eoi = False
    while pos + 2 <= n:
        if b[pos] != 0xFF:
            return None
        marker = b[pos + 1]
        if marker == 0xD9:
            saw_eoi = True
            break
        if 0xD0 <= marker <= 0xD8 or marker == 0x01:
            pos += 2
            continue
        ln = int.from_bytes(b[pos + 2:pos + 4], "big")
        body = b[pos + 4:pos + 2 + ln]
        if marker == 0xDB:
            if not _parse_dqt(body, qts):
                return None
        elif marker == 0xC4:
            _parse_dht(body, dc_trees, ac_trees)
        elif marker == 0xDD:
            dri = int.from_bytes(body[0:2], "big")
        elif marker == 0xC2:
            if comps:
                return None  # one frame only
            hdr = _parse_frame_header(body)
            if hdr is None:
                return None
            w, h, comps, hmax, vmax, mx, my = hdr
            coefs, cdims = _alloc_prog_coefs(comps, w, h, hmax, vmax,
                                             mx, my)
        elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            return None  # mixed/other frame types
        elif marker == 0xDA:
            if not comps:
                return None
            ns = body[0]
            scomps = []
            for c in range(ns):
                cid = body[1 + 2 * c]
                td, ta = body[2 + 2 * c] >> 4, body[2 + 2 * c] & 0x0F
                ci = next(
                    (i for i, cc in enumerate(comps) if cc[0] == cid), None
                )
                if ci is None:
                    return None
                scomps.append((ci, td, ta))
            Ss, Se = body[1 + 2 * ns], body[2 + 2 * ns]
            Ah = body[3 + 2 * ns] >> 4
            Al = body[3 + 2 * ns] & 0x0F
            data_start = pos + 2 + ln
            data_end = _entropy_end(b, data_start)
            _prog_scan(
                b[data_start:data_end], scomps, Ss, Se, Ah, Al,
                comps, coefs, cdims, dc_trees, ac_trees, mx, my, dri,
            )
            pos = data_end
            continue
        pos += 2 + ln
    if w is None or not comps or not saw_eoi:
        return None
    return _reconstruct_progressive(comps, coefs, qts, mx, my, w, h,
                                    hmax, vmax)


def _reconstruct_progressive(comps, coefs, qts, mx, my, w, h, hmax, vmax):
    """Dequantize + IDCT every accumulated coefficient block, then the
    shared upsample/color tail — used by both the Huffman (SOF2) and
    arithmetic (SOF10, ``jpeg_arith``) progressive decoders."""
    planes = []
    for ci, (cid, hs, vs, tq) in enumerate(comps):
        qt = qts.get(tq)
        if qt is None:
            return None
        qarr = np.array(qt, dtype=np.float64).reshape(8, 8)
        plane = np.empty((my * vs * 8, mx * hs * 8), dtype=np.uint8)
        for by in range(my * vs):
            for bx in range(mx * hs):
                zz = coefs[ci][by][bx]
                coef = np.zeros(64, dtype=np.float64)
                for kk, z in enumerate(ZIGZAG):
                    coef[z] = zz[kk]
                block = _idct(coef.reshape(8, 8) * qarr) + 128.0
                plane[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] = np.clip(
                    np.rint(block), 0, 255
                ).astype(np.uint8)
        planes.append(plane)
    return _finish_planes(comps, planes, w, h, hmax, vmax)


def _prog_scan(
    data, scomps, Ss, Se, Ah, Al, comps, coefs, cdims,
    dc_trees, ac_trees, mx, my, dri,
):
    """Decode one progressive scan into the coefficient arrays."""
    sr = _ScanReader(data)
    is_dc = Ss == 0
    if is_dc and Se != 0:
        raise ValueError("DC scan with Se != 0")
    if not is_dc and len(scomps) != 1:
        raise ValueError("AC scan must be single-component")
    preds = [0] * len(scomps)
    eobrun = 0
    unit = 0  # MCUs (interleaved) or blocks (non-interleaved)

    def maybe_restart():
        nonlocal eobrun, preds, unit
        if dri and unit and unit % dri == 0:
            sr.restart()
            preds = [0] * len(scomps)
            eobrun = 0

    if is_dc and len(scomps) > 1:
        # interleaved DC scan over the full MCU grid
        for myy in range(my):
            for mxx in range(mx):
                maybe_restart()
                for si, (ci, td, _) in enumerate(scomps):
                    _, hs, vs, _ = comps[ci]
                    for v in range(vs):
                        for hh in range(hs):
                            coef = coefs[ci][myy * vs + v][mxx * hs + hh]
                            if Ah == 0:
                                s = sr.huff(dc_trees[td])
                                preds[si] += _receive_extend(sr.r, s)
                                coef[0] = preds[si] << Al
                            else:
                                coef[0] |= sr.bits(1) << Al
                unit += 1
        return
    # non-interleaved: one component, block-raster over its own dims
    ci, td, ta = scomps[0]
    cbh, cbw = cdims[ci]
    for by in range(cbh):
        for bx in range(cbw):
            maybe_restart()
            coef = coefs[ci][by][bx]
            if is_dc:
                if Ah == 0:
                    s = sr.huff(dc_trees[td])
                    preds[0] += _receive_extend(sr.r, s)
                    coef[0] = preds[0] << Al
                else:
                    coef[0] |= sr.bits(1) << Al
            elif Ah == 0:
                eobrun = _prog_ac_first(
                    sr, ac_trees[ta], coef, Ss, Se, Al, eobrun
                )
            else:
                eobrun = _prog_ac_refine(
                    sr, ac_trees[ta], coef, Ss, Se, Al, eobrun
                )
            unit += 1


# ---------------------------------------------------------------------
# Progressive encoder (fixture generator): the libjpeg-style script —
# DC first/refine + per-component AC spectral bands with successive
# approximation, including the AC-refinement correction-bit emitter.
# ---------------------------------------------------------------------


# progressive AC scans need EOBn (n ≥ 1) symbols the baseline Annex-K
# tables do not define; emit a flat custom table (every (run, size)
# with size ≤ 10 at code length 8 — canonical and Kraft-valid) like
# real progressive encoders ship per-scan optimized tables
_PROG_AC_SYMS = [(r << 4) | s for r in range(16) for s in range(11)]
_PROG_AC_BITS = [0, 0, 0, 0, 0, 0, 0, len(_PROG_AC_SYMS), 0, 0, 0, 0, 0, 0, 0, 0]
_PROG_AC = _canonical_codes(_PROG_AC_BITS, _PROG_AC_SYMS)


class _ProgAcState:
    """Per-scan EOB-run accumulator with buffered correction bits."""

    def __init__(self, out: _BitWriter, ac_codes) -> None:
        self.out = out
        self.ac = ac_codes
        self.eobrun = 0
        self.pending: list[int] = []

    def flush_eob(self) -> None:
        if self.eobrun > 0:
            nbits = self.eobrun.bit_length() - 1
            c, l = self.ac[nbits << 4]
            self.out.write(c, l)
            if nbits:
                self.out.write(self.eobrun - (1 << nbits), nbits)
            self.eobrun = 0
        for bit in self.pending:
            self.out.write(bit, 1)
        self.pending = []


def _quantized_blocks(plane: np.ndarray, qt: np.ndarray, bh: int, bw: int):
    """Zigzag-order int coefficient lists for every 8×8 block."""
    padded = _pad_plane(plane, bh, bw)
    out = []
    for by in range(bh):
        row = []
        for bx in range(bw):
            q = np.rint(
                _fdct(padded[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] - 128.0)
                / qt
            ).astype(int).reshape(64)
            row.append([int(q[i]) for i in ZIGZAG])
        out.append(row)
    return out


def _enc_dc_first(out, blocks_iter, dc_codes, Al):
    pred = 0
    for zz in blocks_iter:
        v = zz[0] >> Al  # DC point transform is an arithmetic shift
        diff = v - pred
        pred = v
        s = _category(diff)
        c, l = dc_codes[s]
        out.write(c, l)
        if s:
            out.write(diff if diff > 0 else diff + (1 << s) - 1, s)


def _enc_dc_refine(out, blocks_iter, Al):
    for zz in blocks_iter:
        out.write((zz[0] >> Al) & 1, 1)


def _pt_ac(v: int, Al: int) -> int:
    """AC point transform: magnitude shift (truncation toward zero)."""
    return (abs(v) >> Al) * (1 if v >= 0 else -1)


def _enc_ac_first(out, blocks_iter, ac_codes, Ss, Se, Al):
    st = _ProgAcState(out, ac_codes)
    for zz in blocks_iter:
        vals = [_pt_ac(zz[k], Al) for k in range(Ss, Se + 1)]
        if not any(vals):
            st.eobrun += 1
            if st.eobrun == 0x7FFF:
                st.flush_eob()
            continue
        st.flush_eob()
        run = 0
        last_nz = max(i for i, v in enumerate(vals) if v)
        for i in range(last_nz + 1):
            v = vals[i]
            if v == 0:
                run += 1
                continue
            while run >= 16:
                c, l = ac_codes[0xF0]
                out.write(c, l)
                run -= 16
            s = _category(v)
            c, l = ac_codes[(run << 4) | s]
            out.write(c, l)
            out.write(v if v > 0 else v + (1 << s) - 1, s)
            run = 0
        if last_nz < len(vals) - 1:
            st.eobrun += 1
            if st.eobrun == 0x7FFF:
                st.flush_eob()
    st.flush_eob()


def _enc_ac_refine(out, blocks_iter, ac_codes, Ss, Se, Al):
    """The correction-bit emitter, written as an explicit simulation of
    the DECODER's crossing semantics (T.81 G.1.2.3): every emitted
    symbol advances the decoder across a positional range, and the
    correction bits for already-nonzero coefficients inside exactly
    that range follow the symbol; trailing content folds into the
    accumulated EOB run with its bits pending."""
    st = _ProgAcState(out, ac_codes)
    band = range(Ss, Se + 1)
    for zz in blocks_iter:
        temp = [abs(zz[k]) >> Al for k in band]
        # last position that JUST becomes visible at this precision
        eob = -1
        for i, t in enumerate(temp):
            if t == 1:
                eob = i
        if eob < 0:
            # no symbols for this block: whole band rides the EOB run;
            # the decoder will read one bit per nonzero-history coef
            st.eobrun += 1
            st.pending.extend(t & 1 for t in temp if t > 1)
            if st.eobrun == 0x7FFF:
                st.flush_eob()
            continue
        cursor = 0  # first band index the decoder has not yet crossed
        run = 0     # unconsumed zero-history positions before the target
        for i, t in enumerate(temp[: eob + 1]):
            if t == 0:
                run += 1
                continue
            if t > 1:
                continue  # crossed (and bit-emitted) when consumed below
            # newly-nonzero at i: emit ZRLs while >15 zeros remain,
            # each consuming 16 zero-history positions from the cursor
            while run > 15:
                st.flush_eob()
                c, l = ac_codes[0xF0]
                out.write(c, l)
                z = 0
                j = cursor
                while z < 16:
                    if temp[j] > 1:
                        out.write(temp[j] & 1, 1)
                    else:
                        z += 1
                    j += 1
                cursor = j
                run -= 16
            st.flush_eob()
            c, l = ac_codes[(run << 4) | 1]
            out.write(c, l)
            out.write(1 if zz[Ss + i] >= 0 else 0, 1)
            for j in range(cursor, i):
                if temp[j] > 1:
                    out.write(temp[j] & 1, 1)
            cursor = i + 1
            run = 0
        if cursor < len(temp):
            # decoder needs an EOB to finish this block; its bits cover
            # the nonzero-history coefs from the cursor to the band end
            st.eobrun += 1
            st.pending.extend(
                temp[j] & 1 for j in range(cursor, len(temp)) if temp[j] > 1
            )
            if st.eobrun == 0x7FFF:
                st.flush_eob()
    st.flush_eob()


def encode_progressive_jpeg(
    px: bytes,
    w: int,
    h: int,
    color: bool = False,
    subsample: bool = False,
    dc_restart: int = 0,
) -> bytes:
    """Progressive JFIF JPEG (SOF2) with a libjpeg-style scan script —
    DC first (Al=1) → per-component AC bands 1-5 and 6-63 at Al=2 →
    two AC refinement passes (Al=1 then 0) → DC refinement — so a
    decoder must exercise spectral selection AND successive
    approximation in both directions.  *subsample* = colour 4:2:0
    (2×2-box-mean chroma, 4-Y-block MCUs).  *dc_restart* > 0 emits
    DRI + RSTn markers every that many MCUs in the DC-first scan
    (redefining DRI to 0 afterwards, per-scan DRI being legal).  Same
    quantized coefficients as the matching baseline encoder, so
    progressive decode must equal baseline decode exactly (modulo
    padding blocks outside the raster, which the crop removes)."""
    qt_l = np.array(QT_LUM, dtype=np.float64).reshape(8, 8)
    qt_c = np.array(QT_CHROM, dtype=np.float64).reshape(8, 8)
    if color and subsample:
        mx, my = (w + 15) // 16, (h + 15) // 16
        y, cb, cr = _rgb_to_ycbcr(px, w, h)

        def down(p):
            p = _pad_plane(p, my * 2, mx * 2)
            return (
                p[0::2, 0::2] + p[1::2, 0::2] + p[0::2, 1::2] + p[1::2, 1::2]
            ) / 4.0

        planes = [
            _quantized_blocks(_pad_plane(y, my * 2, mx * 2), qt_l, my * 2, mx * 2),
            _quantized_blocks(down(cb), qt_c, my, mx),
            _quantized_blocks(down(cr), qt_c, my, mx),
        ]
        comps = [(1, 2, 2, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
        dc_tabs = [_LUM_DC, _CHR_DC, _CHR_DC]
        dc_sel = [0, 1, 1]
        ac_sel = [0, 1, 1]
        # true component dims (non-interleaved AC-scan coverage)
        cdims = [
            ((h + 7) // 8, (w + 7) // 8),
            (((h + 1) // 2 + 7) // 8, ((w + 1) // 2 + 7) // 8),
            (((h + 1) // 2 + 7) // 8, ((w + 1) // 2 + 7) // 8),
        ]
    elif color:
        bw0, bh0 = (w + 7) // 8, (h + 7) // 8
        mx, my = bw0, bh0
        y, cb, cr = _rgb_to_ycbcr(px, w, h)
        planes = [
            _quantized_blocks(y, qt_l, bh0, bw0),
            _quantized_blocks(cb, qt_c, bh0, bw0),
            _quantized_blocks(cr, qt_c, bh0, bw0),
        ]
        comps = [(1, 1, 1, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
        dc_tabs = [_LUM_DC, _CHR_DC, _CHR_DC]
        dc_sel = [0, 1, 1]
        ac_sel = [0, 1, 1]
        cdims = [(bh0, bw0)] * 3
    else:
        bw0, bh0 = (w + 7) // 8, (h + 7) // 8
        mx, my = bw0, bh0
        img = np.frombuffer(px, dtype=np.uint8).reshape(h, w).astype(
            np.float64
        )
        planes = [_quantized_blocks(img, qt_l, bh0, bw0)]
        comps = [(1, 1, 1, 0)]
        dc_tabs = [_LUM_DC]
        dc_sel = [0]
        ac_sel = [0]
        cdims = [(bh0, bw0)]

    def ac_blocks(ci):
        cbh, cbw = cdims[ci]
        for by in range(cbh):
            for bx in range(cbw):
                yield planes[ci][by][bx]

    def sos(scomp_sel, Ss, Se, Ah, Al):
        body = bytes([len(scomp_sel)])
        for cid, td, ta in scomp_sel:
            body += bytes([cid, (td << 4) | ta])
        return _seg(0xDA, body + bytes([Ss, Se, (Ah << 4) | Al]))

    out = bytearray()
    out += _headers(w, h, comps, sof_marker=0xC2, with_sos=False)
    # redefine the AC tables with the EOBn-capable flat table
    out += _seg(
        0xC4, bytes([0x10]) + bytes(_PROG_AC_BITS) + bytes(_PROG_AC_SYMS)
    )
    if color:
        out += _seg(
            0xC4, bytes([0x11]) + bytes(_PROG_AC_BITS) + bytes(_PROG_AC_SYMS)
        )

    # scan 1: DC first, interleaved over the MCU grid, Al=1, optional
    # restart markers (DRI applies to this scan, then redefined to 0)
    if dc_restart:
        out += _seg(0xDD, dc_restart.to_bytes(2, "big"))
    bw_ = _BitWriter()
    preds = [0] * len(comps)
    unit = 0
    rst = 0
    for myy in range(my):
        for mxx in range(mx):
            if dc_restart and unit and unit % dc_restart == 0:
                bw_.byte_align()
                bw_.buf += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                preds = [0] * len(comps)
            for ci in range(len(comps)):
                _, hs, vs, _ = comps[ci]
                for v in range(vs):
                    for hh in range(hs):
                        zz = planes[ci][myy * vs + v][mxx * hs + hh]
                        val = zz[0] >> 1
                        diff = val - preds[ci]
                        preds[ci] = val
                        scat = _category(diff)
                        c, l = dc_tabs[ci][scat]
                        bw_.write(c, l)
                        if scat:
                            bw_.write(
                                diff if diff > 0
                                else diff + (1 << scat) - 1,
                                scat,
                            )
            unit += 1
    out += sos(
        [(comps[ci][0], dc_sel[ci], 0) for ci in range(len(comps))],
        0, 0, 0, 1,
    )
    out += bw_.flush()
    if dc_restart:
        out += _seg(0xDD, (0).to_bytes(2, "big"))  # no restarts below
    # per-component AC first scans: bands 1-5 then 6-63 at Al=2
    for ci in range(len(comps)):
        for (ss, se) in ((1, 5), (6, 63)):
            bw_ = _BitWriter()
            _enc_ac_first(bw_, ac_blocks(ci), _PROG_AC, ss, se, 2)
            out += sos([(comps[ci][0], 0, ac_sel[ci])], ss, se, 0, 2)
            out += bw_.flush()
    # AC refinement passes: Ah=2→Al=1, then Ah=1→Al=0
    for (ah, al) in ((2, 1), (1, 0)):
        for ci in range(len(comps)):
            bw_ = _BitWriter()
            _enc_ac_refine(bw_, ac_blocks(ci), _PROG_AC, 1, 63, al)
            out += sos([(comps[ci][0], 0, ac_sel[ci])], 1, 63, ah, al)
            out += bw_.flush()
    # DC refinement: Ah=1, Al=0 (interleaved; no Huffman, pure bits)
    bw_ = _BitWriter()
    for myy in range(my):
        for mxx in range(mx):
            for ci in range(len(comps)):
                _, hs, vs, _ = comps[ci]
                for v in range(vs):
                    for hh in range(hs):
                        bw_.write(planes[ci][myy * vs + v][mxx * hs + hh][0] & 1, 1)
    out += sos(
        [(comps[ci][0], dc_sel[ci], 0) for ci in range(len(comps))],
        0, 0, 1, 0,
    )
    out += bw_.flush()
    return bytes(out) + b"\xff\xd9"


# ---------------------------------------------------------------------
# Lossless JPEG (SOF3, ITU-T T.81 Annex H) — Huffman predictive coding
# ---------------------------------------------------------------------
# The last JPEG process the wild still ships that is stdlib-feasible:
# medical/scientific archives (DICOM) and some raw-photo pipelines use
# process 14.  No DCT: each sample is predicted from its decoded
# neighbours (7 selectable predictors) and the difference is coded
# with DC-style Huffman categories (SSSS 0-16, category 16 = 32768
# with no extra bits), all arithmetic modulo 2^16.  Colour components
# are stored as-is (the lossless process defines no YCbCr transform;
# 3-component files are RGB in practice).

# canonical Huffman table covering every difference category 0-16
# (the baseline Annex K DC table stops at 11 — enough for 8-bit
# samples, not for 16-bit): 17 symbols, lengths 4..6 — valid canonical
# set with no all-ones code
_LL_DC_BITS = [0, 0, 0, 8, 8, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_LL_DC_VALS = list(range(17))
_LL_DC = _canonical_codes(_LL_DC_BITS, _LL_DC_VALS)
_LL_DC_TREE = _decode_tree(_LL_DC_BITS, _LL_DC_VALS)


def _ll_predict(a: int, b_: int, c: int, x: int, y: int, sel: int,
                default: int) -> int:
    """T.81 H.1: prediction for the sample at (x, y).  Position rules
    override the selection: the scan's first sample takes the default
    (2^(P-Pt-1)), the rest of the first line predicts from Ra, the
    first column predicts from Rb."""
    if y == 0:
        return default if x == 0 else a
    if x == 0:
        return b_
    if sel == 1:
        return a
    if sel == 2:
        return b_
    if sel == 3:
        return c
    if sel == 4:
        return a + b_ - c
    if sel == 5:
        return a + ((b_ - c) >> 1)
    if sel == 6:
        return b_ + ((a - c) >> 1)
    return (a + b_) >> 1  # sel == 7


def encode_lossless_jpeg(
    px,
    w: int,
    h: int,
    mode: str = "L",
    predictor: int = 1,
    precision: int = 8,
    point_transform: int = 0,
    restart_interval: int = 0,
) -> bytes:
    """Lossless (SOF3) JPEG fixture encoder.  *px*: bytes (or any int
    sequence) of w*h samples for mode 'L', or w*h*3 interleaved for
    mode 'RGB'; samples must fit *precision* bits.  *point_transform*
    (Al) drops that many low bits — decode returns samples shifted
    back up, so only Pt=0 round-trips exactly.  *restart_interval*
    emits RSTn every that many samples-per-component and resets
    prediction (next sample takes the scan-start default)."""
    assert 2 <= precision <= 16 and 1 <= predictor <= 7
    ncomp = 3 if mode == "RGB" else 1
    pt = point_transform
    default = 1 << (precision - pt - 1)
    comps = [
        [int(px[i * ncomp + ci]) >> pt for i in range(w * h)]
        for ci in range(ncomp)
    ]
    out = _BitWriter()
    rst = 0
    reset_next = False
    prev_rows = [[default] * w for _ in range(ncomp)]
    cur_rows = [[0] * w for _ in range(ncomp)]
    body = bytearray()
    n_since_rst = 0
    for y in range(h):
        for x in range(w):
            if (
                restart_interval
                and n_since_rst == restart_interval
            ):
                body += out.flush()
                out = _BitWriter()
                body += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                n_since_rst = 0
                reset_next = True
            for ci in range(ncomp):
                plane = comps[ci]
                sx = plane[y * w + x]
                if reset_next:
                    pred = default
                else:
                    a = cur_rows[ci][x - 1] if x > 0 else 0
                    b_ = prev_rows[ci][x]
                    c = prev_rows[ci][x - 1] if x > 0 else 0
                    pred = _ll_predict(a, b_, c, x, y, predictor, default)
                d = ((sx - pred + 32768) & 0xFFFF) - 32768
                if d == -32768:
                    code, ln = _LL_DC[16]
                    out.write(code, ln)
                else:
                    s = _category(d)
                    code, ln = _LL_DC[s]
                    out.write(code, ln)
                    if s:
                        out.write(
                            d if d >= 0 else d + (1 << s) - 1, s
                        )
                cur_rows[ci][x] = sx
            reset_next = False
            n_since_rst += 1
        for ci in range(ncomp):
            prev_rows[ci], cur_rows[ci] = cur_rows[ci], prev_rows[ci]
    body += out.flush()

    hdr = b"\xff\xd8"
    sof = bytes([precision]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof += bytes([ncomp])
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0])
    hdr += _seg(0xC3, sof)
    dht = bytes([0x00]) + bytes(_LL_DC_BITS) + bytes(_LL_DC_VALS)
    hdr += _seg(0xC4, dht)
    if restart_interval:
        hdr += _seg(0xDD, restart_interval.to_bytes(2, "big"))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([predictor, 0, pt])  # Ss=predictor, Se=0, Ah<<4|Al
    hdr += _seg(0xDA, sos)
    return hdr + bytes(body) + b"\xff\xd9"


def _decode_lossless(b: bytes) -> tuple[int, int, str, bytes] | None:
    """SOF3 frame → (w, h, 'L'|'RGB', pixels).  Precision 2-16 (P>8
    reduces to the high byte, the PNG-16 convention); interleaved
    multi-component scans require Hi=Vi=1 (the only layout lossless
    encoders emit).  Restart markers reset prediction.  Any
    malformation returns None via the shared no-raise contract."""
    dc_trees: dict[int, dict] = {}
    w = h = None
    prec = 0
    comps: list[tuple[int, int]] = []  # (cid, dc_table)
    sel: dict[int, int] = {}
    dri = 0
    pred_sel = 1
    pt = 0
    pos = 2
    n = len(b)
    scan_off = None
    while pos + 4 <= n:
        if b[pos] != 0xFF:
            return None
        marker = b[pos + 1]
        if marker == 0xD9:
            return None
        ln = int.from_bytes(b[pos + 2:pos + 4], "big")
        body = b[pos + 4:pos + 2 + ln]
        if marker == 0xC4:
            _parse_dht(body, dc_trees, {})  # class-1 tables unused
        elif marker == 0xDD:
            dri = int.from_bytes(body[0:2], "big")
        elif marker == 0xC3:
            prec = body[0]
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            ncomp = body[5]
            if not (2 <= prec <= 16) or ncomp not in (1, 3):
                return None
            if not w or not h or w * h > _MAX_PIXELS:
                return None
            for c in range(ncomp):
                cid = body[6 + 3 * c]
                samp = body[7 + 3 * c]
                if samp != 0x11 and ncomp > 1:
                    return None  # interleaved lossless needs 1x1
                comps.append((cid, 0))
        elif marker == 0xDA:
            ns = body[0]
            if ns != len(comps) or ns == 0:
                return None
            for c in range(ns):
                cid = body[1 + 2 * c]
                sel[cid] = body[2 + 2 * c] >> 4
            pred_sel = body[1 + 2 * ns]
            pt = body[3 + 2 * ns] & 0x0F
            scan_off = pos + 2 + ln
            break
        pos += 2 + ln
    if scan_off is None or w is None or not comps:
        return None
    if not (1 <= pred_sel <= 7) or pt >= prec:
        return None
    trees = []
    for cid, _ in comps:
        if cid not in sel or sel[cid] not in dc_trees:
            return None
        trees.append(dc_trees[sel[cid]])

    end = b.rfind(b"\xff\xd9")
    if end < scan_off:
        return None
    scan = b[scan_off:end]
    segments = []
    if dri:
        seg_start = 0
        i = 0
        while i < len(scan) - 1:
            if scan[i] == 0xFF and 0xD0 <= scan[i + 1] <= 0xD7:
                segments.append(scan[seg_start:i])
                seg_start = i + 2
                i += 2
            else:
                i += 1
        segments.append(scan[seg_start:])
    else:
        segments = [scan]

    ncomp = len(comps)
    default = 1 << (prec - pt - 1)
    mask = (1 << (prec - pt)) - 1
    r = _BitReader(segments[0])
    seg_idx = 0

    def read_huff(tree) -> int:
        code, length = 0, 0
        while length <= 16:
            code = (code << 1) | r.bits(1)
            length += 1
            v = tree.get((length, code))
            if v is not None:
                return v
        raise ValueError("bad Huffman code")

    prev_rows = [[default] * w for _ in range(ncomp)]
    cur_rows = [[0] * w for _ in range(ncomp)]
    planes = [bytearray(w * h) for _ in range(ncomp)]
    reset_next = False
    n_since_rst = 0
    try:
        for y in range(h):
            for x in range(w):
                if dri and n_since_rst == dri:
                    seg_idx += 1
                    if seg_idx >= len(segments):
                        raise ValueError("missing restart segment")
                    r = _BitReader(segments[seg_idx])
                    n_since_rst = 0
                    reset_next = True
                for ci in range(ncomp):
                    s = read_huff(trees[ci])
                    if s > 16:
                        raise ValueError("bad category")
                    if s == 16:
                        d = 32768
                    else:
                        d = _receive_extend(r, s)
                    if reset_next:
                        pred = default
                    else:
                        a = cur_rows[ci][x - 1] if x > 0 else 0
                        b_ = prev_rows[ci][x]
                        c = prev_rows[ci][x - 1] if x > 0 else 0
                        pred = _ll_predict(
                            a, b_, c, x, y, pred_sel, default
                        )
                    val = ((pred + d) & 0xFFFF) & mask
                    cur_rows[ci][x] = val
                    full = val << pt
                    planes[ci][y * w + x] = (
                        full if prec <= 8 else full >> (prec - 8)
                    ) & 0xFF
                reset_next = False
                n_since_rst += 1
            for ci in range(ncomp):
                prev_rows[ci], cur_rows[ci] = cur_rows[ci], prev_rows[ci]
    except (IndexError, ValueError):
        return None

    if ncomp == 1:
        return w, h, "L", bytes(planes[0])
    out = bytearray(w * h * 3)
    for ci in range(3):
        out[ci::3] = planes[ci]
    return w, h, "RGB", bytes(out)
