"""Arithmetic-coded JPEG (ITU-T T.81 QM-coder): sequential SOF9
(Annex D/F) AND progressive SOF10 (Annex G.2).

Closes the last declared image stub (`multimodal.decode_image_pixels`
routed arithmetic frames to the loud NotImplementedError path; the
reference loads every format via cv2/Pillow —
`core/pipelines/loaders/image_loader.py:20-31`).  DCT frames with
arithmetic entropy coding now decode for REAL: the adaptive binary
QM-coder with the standard 113-state probability-estimation machine,
the DC difference model (sign + magnitude-category tree + magnitude
bits, conditioned on the previous difference via the DAC L/U bounds)
and the AC model (per-index EOB/significance decisions,
fixed-probability sign, low/high magnitude bands split at Kx) —
greyscale and 3-component YCbCr at 4:4:4 / 4:2:0, restart intervals
included.  The progressive process (SOF10) layers the SOF2 scan
structure on the same coder: spectral-selection AC bands, successive
approximation with fixed-bin DC correction bits and the
EOB/significance/correction AC-refinement contexts, statistics reset
per scan and per restart.

Two deliberate asymmetries vs the Huffman codec in ``jpeg.py``:

- The fixture ENCODER keeps the code register C as an arbitrary-
  precision int and emits bytes only at flush, so carry propagation
  is exact by construction (no byte-stack/carry logic to get wrong).
  Fixtures are small; O(bits²) worst-case cost is microseconds there.
  The DECODER — the corpus-facing surface — is a streaming mirror
  with small fixed-width registers.
- Quantization is IDENTICAL to the Huffman path (same Annex K tables,
  same rint), so the decoded pixels of an arithmetic encode must be
  byte-equal to the baseline decode of the same source image — the
  cross-codec equality test
  (``test_arith_jpeg_equals_huffman_and_survives_fuzz`` in
  ``tests/test_operators.py``).

Conformance caveat (same posture as the G4 fax codec): the sandbox
has no external arithmetic-JPEG producer, so validation is internal —
coder-level round-trip properties, cross-codec pixel equality, and
fuzz.  The state table transcribes the public standard's Table D.3;
encoder and decoder share it, so internal consistency holds
regardless.

Entropy-coded-segment conventions (shared with the Huffman path):
0xFF data bytes are followed by a stuffed 0x00; RSTn markers byte-
align, re-initialize the coder AND all statistics areas; past-the-end
reads supply zero bits.
"""

from __future__ import annotations

import struct

import numpy as np

from .jpeg import (
    QT_CHROM,
    QT_LUM,
    ZIGZAG,
    _alloc_prog_coefs,
    _entropy_end,
    _fdct,
    _finish_planes,
    _idct,
    _pad_plane,
    _parse_dqt,
    _parse_frame_header,
    _quantized_blocks,
    _reconstruct_progressive,
    _rgb_to_ycbcr,
    _seg,
)

# ---------------------------------------------------------------------
# QM-coder probability estimation state machine — T.81 Table D.3
# ---------------------------------------------------------------------
# (Qe, next-index-after-MPS, next-index-after-LPS, switch-MPS).  Entry
# 113 is the non-adaptive "fixed" state (Qe ≈ 0.35, self-looping, no
# switch) used for AC sign decisions.

_ARITH_TAB: list[tuple[int, int, int, int]] = [
    (0x5A1D, 1, 1, 1),
    (0x2586, 2, 14, 0),
    (0x1114, 3, 16, 0),
    (0x080B, 4, 18, 0),
    (0x03D8, 5, 20, 0),
    (0x01DA, 6, 23, 0),
    (0x00E5, 7, 25, 0),
    (0x006F, 8, 28, 0),
    (0x0036, 9, 30, 0),
    (0x001A, 10, 33, 0),
    (0x000D, 11, 35, 0),
    (0x0006, 12, 9, 0),
    (0x0003, 13, 10, 0),
    (0x0001, 13, 12, 0),
    (0x5A7F, 15, 15, 1),
    (0x3F25, 16, 36, 0),
    (0x2CF2, 17, 38, 0),
    (0x207C, 18, 39, 0),
    (0x17B9, 19, 40, 0),
    (0x1182, 20, 42, 0),
    (0x0CEF, 21, 43, 0),
    (0x09A1, 22, 45, 0),
    (0x072F, 23, 46, 0),
    (0x055C, 24, 48, 0),
    (0x0406, 25, 49, 0),
    (0x0303, 26, 51, 0),
    (0x0240, 27, 52, 0),
    (0x01B1, 28, 54, 0),
    (0x0144, 29, 56, 0),
    (0x00F5, 30, 57, 0),
    (0x00B7, 31, 59, 0),
    (0x008A, 32, 60, 0),
    (0x0068, 33, 62, 0),
    (0x004E, 34, 63, 0),
    (0x003B, 35, 32, 0),
    (0x002C, 9, 33, 0),
    (0x5AE1, 37, 37, 1),
    (0x484C, 38, 64, 0),
    (0x3A0D, 39, 65, 0),
    (0x2EF1, 40, 67, 0),
    (0x261F, 41, 68, 0),
    (0x1F33, 42, 69, 0),
    (0x19A8, 43, 70, 0),
    (0x1518, 44, 72, 0),
    (0x1177, 45, 73, 0),
    (0x0E74, 46, 74, 0),
    (0x0BFB, 47, 75, 0),
    (0x09F8, 48, 77, 0),
    (0x0861, 49, 78, 0),
    (0x0706, 50, 79, 0),
    (0x05CD, 51, 48, 0),
    (0x04DE, 52, 50, 0),
    (0x040F, 53, 50, 0),
    (0x0363, 54, 51, 0),
    (0x02D4, 55, 52, 0),
    (0x025C, 56, 53, 0),
    (0x01F8, 57, 54, 0),
    (0x01A4, 58, 55, 0),
    (0x0160, 59, 56, 0),
    (0x0125, 60, 57, 0),
    (0x00F6, 61, 58, 0),
    (0x00CB, 62, 59, 0),
    (0x00AB, 63, 61, 0),
    (0x008F, 32, 61, 0),
    (0x5B12, 65, 65, 1),
    (0x4D04, 66, 80, 0),
    (0x412C, 67, 81, 0),
    (0x37D8, 68, 82, 0),
    (0x2FE8, 69, 83, 0),
    (0x293C, 70, 84, 0),
    (0x2379, 71, 86, 0),
    (0x1EDF, 72, 87, 0),
    (0x1AA9, 73, 87, 0),
    (0x174E, 74, 72, 0),
    (0x1424, 75, 72, 0),
    (0x119C, 76, 74, 0),
    (0x0F6B, 77, 74, 0),
    (0x0D51, 78, 75, 0),
    (0x0BB6, 79, 77, 0),
    (0x0A40, 48, 77, 0),
    (0x5832, 81, 80, 1),
    (0x4D1C, 82, 88, 0),
    (0x438E, 83, 89, 0),
    (0x3A4D, 84, 90, 0),
    (0x3289, 85, 91, 0),
    (0x2DF4, 86, 92, 0),
    (0x2888, 87, 93, 0),
    (0x2481, 71, 86, 0),
    (0x5570, 89, 88, 1),
    (0x4CA9, 90, 95, 0),
    (0x44D9, 91, 96, 0),
    (0x3E22, 92, 97, 0),
    (0x3824, 93, 99, 0),
    (0x32B4, 94, 99, 0),
    (0x2E17, 86, 93, 0),
    (0x56A8, 96, 95, 1),
    (0x4F46, 97, 101, 0),
    (0x47E5, 98, 102, 0),
    (0x41CF, 99, 103, 0),
    (0x3C3D, 100, 104, 0),
    (0x375E, 93, 99, 0),
    (0x5231, 102, 105, 0),
    (0x4C0F, 103, 106, 0),
    (0x4639, 104, 107, 0),
    (0x415E, 99, 103, 0),
    (0x5627, 106, 105, 1),
    (0x50E7, 107, 108, 0),
    (0x4B85, 103, 109, 0),
    (0x5597, 109, 110, 0),
    (0x504F, 107, 111, 0),
    (0x5A10, 111, 110, 1),
    (0x5522, 109, 112, 0),
    (0x59EB, 111, 112, 1),
    (0x5A1D, 113, 113, 0),  # fixed (non-adaptive) bin
]

_FIXED_BIN = 113

# statistics-area sizes (per table destination, T.81 F.1.4.4)
_DC_STAT_BINS = 64
_AC_STAT_BINS = 256

# default conditioning (T.81 F.1.4.4.1.4 / table defaults)
_DEFAULT_L = 0
_DEFAULT_U = 1
_DEFAULT_KX = 5


# ---------------------------------------------------------------------
# Coder core
# ---------------------------------------------------------------------
# Interval convention (matches the standard's conditional-exchange
# flowcharts): after A -= Qe the BOTTOM slice (size A) codes the MPS
# and the TOP slice (size Qe) the LPS, swapped when A < Qe.  The
# probability state adapts only on renormalization events; the MPS
# fast path (A still ≥ 0x8000) leaves the state untouched.
#
# A context is one byte in a stats bytearray: low 7 bits = state
# index, top bit = current MPS sense.


class ArithEncoder:
    """QM encoder with an exact big-int code register (see module
    docstring for why that is the right fixture-side trade)."""

    def __init__(self) -> None:
        self.a = 0x10000
        self.c = 0
        self.shifts = 0

    def encode(self, stats: bytearray, i: int, bit: int) -> None:
        sv = stats[i]
        qe, nmps, nlps, sw = _ARITH_TAB[sv & 0x7F]
        mps = sv >> 7
        a = self.a - qe
        if bit == mps:
            if a >= 0x8000:
                self.a = a
                return
            if a < qe:  # conditional exchange: MPS takes the top slice
                self.c += a
                a = qe
            stats[i] = (mps << 7) | nmps
        else:
            if a >= qe:  # LPS takes the top slice
                self.c += a
                a = qe
            # else conditional exchange: LPS keeps the bottom (size a)
            if sw:
                mps ^= 1
            stats[i] = (mps << 7) | nlps
        while a < 0x8000:
            a <<= 1
            self.c <<= 1
            self.shifts += 1
        self.a = a

    def flush(self) -> bytes:
        """Close the interval: pick the code point in [C, C+A) with
        the most trailing zero bits, emit it MSB-first with 0xFF→
        0xFF00 stuffing, dropping trailing zero bytes (the decoder
        feeds zero bits past the end)."""
        total_bits = self.shifts + 16
        lo, hi = self.c, self.c + self.a
        x = hi - 1
        t = 0
        while t < total_bits and ((x >> (t + 1)) << (t + 1)) >= lo:
            t += 1
        x = (x >> t) << t
        nbytes = (total_bits + 7) // 8
        x <<= nbytes * 8 - total_bits
        raw = x.to_bytes(nbytes, "big").rstrip(b"\x00")
        out = bytearray()
        for byte in raw:
            out.append(byte)
            if byte == 0xFF:
                out.append(0x00)
        return bytes(out)


class ArithDecoder:
    """Streaming QM decoder over one entropy-coded segment (RSTn
    boundaries are split off by the caller).  Small fixed-width
    registers; invariant cd < a holds throughout, so values stay
    below 2^17."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self._bitbuf = 0
        self._bitn = 0
        self.a = 0x10000
        cd = 0
        for _ in range(16):
            cd = (cd << 1) | self._next_bit()
        self.cd = cd

    def _next_byte(self) -> int:
        d = self.data
        p = self.pos
        if p >= len(d):
            return 0  # past the segment: zero bits forever
        b = d[p]
        self.pos = p + 1
        if b == 0xFF:
            if self.pos < len(d) and d[self.pos] == 0x00:
                self.pos += 1  # stuffed zero byte → literal 0xFF
                return 0xFF
            # marker inside a pre-split segment: treat as end of data
            self.pos = len(d)
            return 0
        return b

    def _next_bit(self) -> int:
        if self._bitn == 0:
            self._bitbuf = self._next_byte()
            self._bitn = 8
        self._bitn -= 1
        return (self._bitbuf >> self._bitn) & 1

    def decode(self, stats: bytearray, i: int) -> int:
        a = self.a
        cd = self.cd
        while a < 0x8000:
            a <<= 1
            cd = (cd << 1) | self._next_bit()
        sv = stats[i]
        qe, nmps, nlps, sw = _ARITH_TAB[sv & 0x7F]
        mps = sv >> 7
        a -= qe
        if cd < a:
            bit = mps
            if a < 0x8000:  # renormalization → adapt
                if a < qe:  # exchanged: bottom slice is the LPS
                    bit = mps ^ 1
                    if sw:
                        mps ^= 1
                    stats[i] = (mps << 7) | nlps
                else:
                    stats[i] = (mps << 7) | nmps
        else:
            cd -= a
            if a < qe:  # exchanged: top slice is the MPS
                bit = mps
                stats[i] = (mps << 7) | nmps
            else:
                bit = mps ^ 1
                if sw:
                    mps ^= 1
                stats[i] = (mps << 7) | nlps
            a = qe
        self.a = a
        self.cd = cd
        return bit


# ---------------------------------------------------------------------
# Statistical models (T.81 F.1.4) — encoder and decoder are exact
# mirrors of one decision sequence; comments describe the shared
# sequence once, on the decoder.
# ---------------------------------------------------------------------


def _dc_ctx_update(m: int, sign: int, lb: int, ub: int) -> int:
    """Classify this difference's magnitude MSB for the NEXT block's
    conditioning context: 0 = zero/small, 4/8 = small ±, 12/16 =
    large ± (4 bins per class)."""
    if m < ((1 << lb) >> 1):
        return 0
    if m > ((1 << ub) >> 1):
        return 12 + 4 * sign
    return 4 + 4 * sign


def _decode_dc(
    dec: ArithDecoder, stats: bytearray, ctx: int, lb: int, ub: int
) -> tuple[int, int]:
    """One DC difference → (diff, next conditioning context).

    Sequence: S0 "diff nonzero?" at *ctx*; sign at ctx+1; magnitude
    tree — first decision ("|diff| ≥ 2?") on the SP/SN bin (ctx+2+
    sign), further doublings on bins 20, 21, …; magnitude bits all on
    the single bin 14 past where the tree stopped."""
    if dec.decode(stats, ctx) == 0:
        return 0, 0
    sign = dec.decode(stats, ctx + 1)
    st = ctx + 2 + sign
    m = 0
    if dec.decode(stats, st):
        m = 1
        st = 20
        while dec.decode(stats, st):
            m <<= 1
            if m == 0x8000:
                raise ValueError("DC magnitude overflow")
            st += 1
    nctx = _dc_ctx_update(m, sign, lb, ub)
    v = m
    st += 14
    while m > 1:
        m >>= 1
        if dec.decode(stats, st):
            v |= m
    v += 1
    return (-v if sign else v), nctx


def _encode_dc(
    enc: ArithEncoder,
    stats: bytearray,
    ctx: int,
    diff: int,
    lb: int,
    ub: int,
) -> int:
    if diff == 0:
        enc.encode(stats, ctx, 0)
        return 0
    enc.encode(stats, ctx, 1)
    sign = 1 if diff < 0 else 0
    enc.encode(stats, ctx + 1, sign)
    f = (-diff if sign else diff) - 1
    st = ctx + 2 + sign
    m = 0
    if f == 0:
        enc.encode(stats, st, 0)
    else:
        enc.encode(stats, st, 1)
        m = 1
        st = 20
        while (m << 1) <= f:
            enc.encode(stats, st, 1)
            m <<= 1
            st += 1
        enc.encode(stats, st, 0)
    nctx = _dc_ctx_update(m, sign, lb, ub)
    st += 14
    mm = m
    while mm > 1:
        mm >>= 1
        enc.encode(stats, st, 1 if f & mm else 0)
    return nctx


def _decode_ac_band(
    dec: ArithDecoder,
    stats: bytearray,
    fixed: bytearray,
    kx: int,
    zz: list[int],
    ss: int,
    se: int,
    al: int,
) -> None:
    """AC coefficients of the zigzag band [*ss*, *se*] into *zz*
    (values point-transform-shifted left by *al* — the sequential
    case is the full band at al=0).

    Per index k: EOB decision at 3(k-1); significance at 3(k-1)+1
    (zeros walk the run forward); sign on the fixed bin; magnitude —
    two decisions on 3(k-1)+2, then doublings in the shared band
    (189 for k ≤ Kx, 217 above); magnitude bits on band+14."""
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if dec.decode(stats, st):
            break  # EOB
        while dec.decode(stats, st + 1) == 0:
            st += 3
            k += 1
            if k > se:
                raise ValueError("AC run past band end")
        sign = dec.decode(fixed, 0)
        st += 2
        m = 0
        if dec.decode(stats, st):
            m = 1
            if dec.decode(stats, st):
                m = 2
                st = 189 if k <= kx else 217
                while dec.decode(stats, st):
                    m <<= 1
                    if m == 0x8000:
                        raise ValueError("AC magnitude overflow")
                    st += 1
        v = m
        st += 14
        while m > 1:
            m >>= 1
            if dec.decode(stats, st):
                v |= m
        v += 1
        zz[k] = (-v if sign else v) << al
        k += 1


def _decode_ac_block(
    dec: ArithDecoder, stats: bytearray, fixed: bytearray, kx: int
) -> list[int]:
    """63 AC coefficients in zigzag order (index 1..63 of the
    returned 64-list; [0] stays 0) — the full band at shift 0."""
    zz = [0] * 64
    _decode_ac_band(dec, stats, fixed, kx, zz, 1, 63, 0)
    return zz


def _encode_ac_band(
    enc: ArithEncoder,
    stats: bytearray,
    fixed: bytearray,
    kx: int,
    vals: list[int],
    ss: int,
    se: int,
) -> None:
    """Mirror of ``_decode_ac_band``'s decision sequence over the
    zigzag band [*ss*, *se*] — *vals* holds the (already point-
    transformed) coefficients indexed by zigzag position."""
    ke = max((k for k in range(ss, se + 1) if vals[k]), default=ss - 1)
    k = ss
    while k <= ke:
        st = 3 * (k - 1)
        enc.encode(stats, st, 0)  # not EOB
        while vals[k] == 0:
            enc.encode(stats, st + 1, 0)
            st += 3
            k += 1
        enc.encode(stats, st + 1, 1)
        v = vals[k]
        sign = 1 if v < 0 else 0
        enc.encode(fixed, 0, sign)
        f = (-v if sign else v) - 1
        st += 2
        if f == 0:
            enc.encode(stats, st, 0)
            m = 0
        elif f == 1:
            enc.encode(stats, st, 1)
            enc.encode(stats, st, 0)
            m = 1
        else:
            enc.encode(stats, st, 1)
            enc.encode(stats, st, 1)
            m = 2
            st = 189 if k <= kx else 217
            while (m << 1) <= f:
                enc.encode(stats, st, 1)
                m <<= 1
                st += 1
            enc.encode(stats, st, 0)
        st += 14
        mm = m
        while mm > 1:
            mm >>= 1
            enc.encode(stats, st, 1 if f & mm else 0)
        k += 1
    if ke < se:
        enc.encode(stats, 3 * ke, 1)  # EOB decision at index ke+1


def _encode_ac_block(
    enc: ArithEncoder,
    stats: bytearray,
    fixed: bytearray,
    kx: int,
    zz: list[int],
) -> None:
    _encode_ac_band(enc, stats, fixed, kx, zz, 1, 63)


# ---------------------------------------------------------------------
# Encoder (fixture generator — real SOF9 output)
# ---------------------------------------------------------------------


class _ArithScanState:
    """Per-scan coding state: one coder + fresh statistics areas and
    contexts (recreated from scratch at every restart marker)."""

    def __init__(self, n_dc_tables: int, n_ac_tables: int) -> None:
        self.enc = ArithEncoder()
        self.dc_stats = [bytearray(_DC_STAT_BINS) for _ in range(n_dc_tables)]
        self.ac_stats = [bytearray(_AC_STAT_BINS) for _ in range(n_ac_tables)]
        self.fixed = bytearray([_FIXED_BIN])


def _quantize(block: np.ndarray, qt: np.ndarray) -> list[int]:
    q = np.rint(_fdct(block - 128.0) / qt).astype(int).reshape(64)
    return [int(q[i]) for i in ZIGZAG]


def _arith_headers(
    w: int,
    h: int,
    comps: list[tuple[int, int, int, int]],
    conditioning: tuple[int, int, int],
    restart_interval: int,
) -> bytes:
    lb, ub, kx = conditioning
    ncomp = len(comps)
    app0 = _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    dqt = _seg(0xDB, bytes([0x00]) + bytes(QT_LUM[i] for i in ZIGZAG))
    dac = bytes([0x00, (ub << 4) | lb, 0x10, kx])
    if ncomp == 3:
        dqt += _seg(0xDB, bytes([0x01]) + bytes(QT_CHROM[i] for i in ZIGZAG))
        dac += bytes([0x01, (ub << 4) | lb, 0x11, kx])
    sof_body = struct.pack(">BHHB", 8, h, w, ncomp) + b"".join(
        bytes([cid, (hs << 4) | vs, tq]) for cid, hs, vs, tq in comps
    )
    out = b"\xff\xd8" + app0 + dqt + _seg(0xC9, sof_body) + _seg(0xCC, dac)
    if restart_interval:
        out += _seg(0xDD, restart_interval.to_bytes(2, "big"))
    sos = bytes([ncomp, comps[0][0], 0x00])
    if ncomp == 3:
        sos += bytes([comps[1][0], 0x11, comps[2][0], 0x11])
    out += _seg(0xDA, sos + bytes([0, 63, 0]))
    return out


def encode_arith_jpeg(
    px: bytes,
    w: int,
    h: int,
    mode: str = "L",
    subsample: bool = False,
    restart_interval: int = 0,
    conditioning: tuple[int, int, int] = (_DEFAULT_L, _DEFAULT_U, _DEFAULT_KX),
) -> bytes:
    """Pixels → SOF9 arithmetic JFIF JPEG.  *px* row-major bytes
    (w*h for mode 'L', w*h*3 interleaved for 'RGB'); 4:4:4 by
    default, 4:2:0 with *subsample* (2×2 box-mean chroma, matching
    ``encode_rgb_jpeg``); *restart_interval* emits RSTn every that
    many MCUs (coder + statistics + DC predictors all reset);
    *conditioning* = (L, U, Kx), written to the DAC segment."""
    lb, ub, kx = conditioning
    if mode == "L":
        img = (
            np.frombuffer(px, dtype=np.uint8)
            .reshape(h, w)
            .astype(np.float64)
        )
        bw, bh = (w + 7) // 8, (h + 7) // 8
        plane = _pad_plane(img, bh, bw)
        qt = np.array(QT_LUM, dtype=np.float64).reshape(8, 8)
        mcus = [
            [(0, plane[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8], qt)]
            for by in range(bh)
            for bx in range(bw)
        ]
        comps = [(1, 1, 1, 0)]
        comp_tables = [(0, 0)]  # (dc table, ac table) per component
        n_tables = 1
    else:
        y, cb, cr = _rgb_to_ycbcr(px, w, h)
        qt_l = np.array(QT_LUM, dtype=np.float64).reshape(8, 8)
        qt_c = np.array(QT_CHROM, dtype=np.float64).reshape(8, 8)
        if not subsample:
            bw, bh = (w + 7) // 8, (h + 7) // 8
            planes = [
                (_pad_plane(y, bh, bw), qt_l, 0),
                (_pad_plane(cb, bh, bw), qt_c, 1),
                (_pad_plane(cr, bh, bw), qt_c, 1),
            ]
            mcus = [
                [
                    (ci, pl[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8], qt)
                    for ci, (pl, qt, _) in enumerate(planes)
                ]
                for by in range(bh)
                for bx in range(bw)
            ]
            comps = [(1, 1, 1, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
        else:
            mx, my = (w + 15) // 16, (h + 15) // 16
            ypl = _pad_plane(y, my * 2, mx * 2)

            def down(p: np.ndarray) -> np.ndarray:
                p = _pad_plane(p, my * 2, mx * 2)
                return (
                    p[0::2, 0::2]
                    + p[1::2, 0::2]
                    + p[0::2, 1::2]
                    + p[1::2, 1::2]
                ) / 4.0

            cbd, crd = down(cb), down(cr)
            mcus = []
            for byy in range(my):
                for bxx in range(mx):
                    units = []
                    for v in range(2):
                        for hh in range(2):
                            r0 = (byy * 2 + v) * 8
                            c0 = (bxx * 2 + hh) * 8
                            units.append(
                                (0, ypl[r0:r0 + 8, c0:c0 + 8], qt_l)
                            )
                    units.append(
                        (
                            1,
                            cbd[byy * 8:(byy + 1) * 8,
                                bxx * 8:(bxx + 1) * 8],
                            qt_c,
                        )
                    )
                    units.append(
                        (
                            2,
                            crd[byy * 8:(byy + 1) * 8,
                                bxx * 8:(bxx + 1) * 8],
                            qt_c,
                        )
                    )
                    mcus.append(units)
            comps = [(1, 2, 2, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
        comp_tables = [(0, 0), (1, 1), (1, 1)]
        n_tables = 2

    body = bytearray()
    state = _ArithScanState(n_tables, n_tables)
    preds = [0] * len(comps)
    dc_ctx = [0] * len(comps)
    rst = 0
    for unit, mcu in enumerate(mcus):
        if restart_interval and unit and unit % restart_interval == 0:
            body += state.enc.flush()
            body += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) % 8
            state = _ArithScanState(n_tables, n_tables)
            preds = [0] * len(comps)
            dc_ctx = [0] * len(comps)
        for ci, block, qt in mcu:
            dct, act = comp_tables[ci]
            zz = _quantize(block, qt)
            dc_ctx[ci] = _encode_dc(
                state.enc, state.dc_stats[dct], dc_ctx[ci],
                zz[0] - preds[ci], lb, ub,
            )
            preds[ci] = zz[0]
            _encode_ac_block(
                state.enc, state.ac_stats[act], state.fixed, kx, zz
            )
    body += state.enc.flush()
    hdr = _arith_headers(w, h, comps, conditioning, restart_interval)
    return hdr + bytes(body) + b"\xff\xd9"


# ---------------------------------------------------------------------
# Decoder (the corpus-facing surface)
# ---------------------------------------------------------------------


def _parse_dac(body: bytes, dc_cond: dict, ac_cond: dict) -> bool:
    """One DAC segment (arithmetic conditioning) into the per-table
    dicts — shared by the SOF9 and SOF10 decoders; False on
    out-of-range L/U/Kx values."""
    i = 0
    while i + 1 < len(body):
        tc, tb = body[i] >> 4, body[i] & 0x0F
        val = body[i + 1]
        if tc == 0:
            lb, ub = val & 0x0F, val >> 4
            if not (0 <= lb <= ub <= 15):
                return False
            dc_cond[tb] = (lb, ub)
        else:
            if not 1 <= val <= 63:
                return False
            ac_cond[tb] = val
        i += 2
    return True


def decode_arith_jpeg(b: bytes) -> tuple[int, int, str, bytes] | None:
    """SOF9 frame → (w, h, 'L'|'RGB', pixels); None for anything this
    path does not cover (12-bit, CMYK) or malformed payloads, via the
    shared no-raise contract in ``decode_jpeg``."""
    qts: dict[int, list[int]] = {}
    dc_cond: dict[int, tuple[int, int]] = {}
    ac_cond: dict[int, int] = {}
    w = h = None
    comps: list[tuple[int, int, int, int]] = []
    sel: dict[int, tuple[int, int]] = {}
    dri = 0
    pos = 2
    n = len(b)
    scan_off = None
    while pos + 4 <= n:
        if b[pos] != 0xFF:
            return None
        marker = b[pos + 1]
        if marker == 0xD9:
            return None
        if marker == 0x01 or 0xD0 <= marker <= 0xD8:
            pos += 2  # standalone marker (TEM / stray RSTn): no length
            continue
        ln = int.from_bytes(b[pos + 2:pos + 4], "big")
        body = b[pos + 4:pos + 2 + ln]
        if marker == 0xDB:
            if not _parse_dqt(body, qts):
                return None
        elif marker == 0xCC:  # DAC: arithmetic conditioning
            if not _parse_dac(body, dc_cond, ac_cond):
                return None
        elif marker == 0xDD:
            dri = int.from_bytes(body[0:2], "big")
        elif marker == 0xC9:
            hdr = _parse_frame_header(body)
            if hdr is None:
                return None
            w, h, comps, hmax, vmax, mx, my = hdr
        elif marker == 0xDA:
            ns = body[0]
            if ns != len(comps) or ns == 0:
                return None
            for c in range(ns):
                cid = body[1 + 2 * c]
                sel[cid] = (body[2 + 2 * c] >> 4, body[2 + 2 * c] & 0x0F)
            scan_off = pos + 2 + ln
            break
        pos += 2 + ln
    if scan_off is None or w is None or not comps:
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
        dct, act = sel[cid]
        planes.append(np.empty((my * vs * 8, mx * hs * 8), dtype=np.uint8))
        tables.append(
            (
                np.array(qt, dtype=np.float64).reshape(8, 8),
                dct,
                act,
                dc_cond.get(dct, (_DEFAULT_L, _DEFAULT_U)),
                ac_cond.get(act, _DEFAULT_KX),
            )
        )

    segments = _split_rst_segments(scan) if dri else [scan]

    n_dc = max(t[1] for t in tables) + 1
    n_ac = max(t[2] for t in tables) + 1

    def fresh_state():
        return (
            ArithDecoder(segments[seg_idx]),
            [bytearray(_DC_STAT_BINS) for _ in range(n_dc)],
            [bytearray(_AC_STAT_BINS) for _ in range(n_ac)],
            bytearray([_FIXED_BIN]),
        )

    seg_idx = 0
    dec, dc_stats, ac_stats, fixed = fresh_state()
    preds = [0] * len(comps)
    dc_ctx = [0] * len(comps)
    mcu_count = 0
    try:
        for myy in range(my):
            for mxx in range(mx):
                if dri and mcu_count and mcu_count % dri == 0:
                    seg_idx += 1
                    if seg_idx >= len(segments):
                        raise ValueError("missing restart segment")
                    dec, dc_stats, ac_stats, fixed = fresh_state()
                    preds = [0] * len(comps)
                    dc_ctx = [0] * len(comps)
                for ci, (_, hs, vs, _) in enumerate(comps):
                    qarr, dct, act, (lb, ub), kx = tables[ci]
                    for v in range(vs):
                        for hh in range(hs):
                            diff, dc_ctx[ci] = _decode_dc(
                                dec, dc_stats[dct], dc_ctx[ci], lb, ub
                            )
                            preds[ci] += diff
                            zz = _decode_ac_block(
                                dec, ac_stats[act], fixed, kx
                            )
                            zz[0] = preds[ci]
                            coef = np.zeros(64, dtype=np.float64)
                            for kk, z in enumerate(ZIGZAG):
                                coef[z] = zz[kk]
                            block = _idct(coef.reshape(8, 8) * qarr) + 128.0
                            by, bx = myy * vs + v, mxx * hs + hh
                            planes[ci][
                                by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8
                            ] = np.clip(np.rint(block), 0, 255).astype(
                                np.uint8
                            )
                mcu_count += 1
    except (IndexError, ValueError):
        return None

    return _finish_planes(comps, planes, w, h, hmax, vmax)


# ---------------------------------------------------------------------
# Progressive arithmetic JPEG (SOF10, T.81 Annex G.2)
# ---------------------------------------------------------------------
# The progressive scan structure (spectral selection + successive
# approximation, multi-scan coefficient accumulation) is the SOF2 one;
# the entropy layer is the QM coder above.  Annex G.2's scan-type
# models: DC first scans reuse the sequential DC model on point-
# transformed values; DC refinement codes one correction bit per block
# on the non-adaptive fixed bin; AC first scans are the sequential AC
# model restricted to the band; AC refinement walks the band with
# EOB-decision / newly-nonzero-significance / correction-bit contexts
# (3 per index, same stats layout as the first scans) plus the fixed
# bin for new signs.  Statistics and the coder reset at every scan
# start and every restart marker.


def _split_rst_segments(scan: bytes) -> list[bytes]:
    """Split one scan's entropy data at RSTn markers (stuffed 0xFF
    bytes are always followed by 0x00, so FF Dx is a real marker)."""
    segments = []
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
    return segments


def _arith_prog_scan(
    data, scomps, Ss, Se, Ah, Al, comps, coefs, cdims,
    dc_cond, ac_cond, mx, my, dri,
):
    """Decode one progressive-arithmetic scan into the coefficient
    arrays (decision sequences documented on the helpers; this walks
    blocks in the same interleaved/non-interleaved order as the
    Huffman ``_prog_scan``)."""
    is_dc = Ss == 0
    if is_dc and Se != 0:
        raise ValueError("DC scan with Se != 0")
    if not is_dc and len(scomps) != 1:
        raise ValueError("AC scan must be single-component")
    segments = _split_rst_segments(data) if dri else [data]
    seg_idx = 0

    def fresh_state():
        return (
            ArithDecoder(segments[seg_idx]),
            {},  # dc table id -> stats bytearray
            {},  # ac table id -> stats bytearray
            bytearray([_FIXED_BIN]),
        )

    dec, dc_stats, ac_stats, fixed = fresh_state()
    preds = [0] * len(scomps)
    dc_ctx = [0] * len(scomps)
    unit = 0

    def maybe_restart():
        nonlocal dec, dc_stats, ac_stats, fixed, preds, dc_ctx, seg_idx
        if dri and unit and unit % dri == 0:
            seg_idx += 1
            if seg_idx >= len(segments):
                raise ValueError("missing restart segment")
            dec, dc_stats, ac_stats, fixed = fresh_state()
            preds = [0] * len(scomps)
            dc_ctx = [0] * len(scomps)

    def dc_block(si, td, coef):
        if Ah == 0:
            lb, ub = dc_cond.get(td, (_DEFAULT_L, _DEFAULT_U))
            stats = dc_stats.setdefault(td, bytearray(_DC_STAT_BINS))
            diff, dc_ctx[si] = _decode_dc(dec, stats, dc_ctx[si], lb, ub)
            preds[si] += diff
            coef[0] = preds[si] << Al
        else:
            coef[0] |= dec.decode(fixed, 0) << Al

    if is_dc and len(scomps) > 1:
        # interleaved DC scan over the full MCU grid
        for myy in range(my):
            for mxx in range(mx):
                maybe_restart()
                for si, (ci, td, _) in enumerate(scomps):
                    _, hs, vs, _ = comps[ci]
                    for v in range(vs):
                        for hh in range(hs):
                            dc_block(
                                si, td,
                                coefs[ci][myy * vs + v][mxx * hs + hh],
                            )
                unit += 1
        return
    # non-interleaved: one component, block-raster over its own dims
    ci, td, ta = scomps[0]
    cbh, cbw = cdims[ci]
    kx = ac_cond.get(ta, _DEFAULT_KX)
    for by in range(cbh):
        for bx in range(cbw):
            maybe_restart()
            coef = coefs[ci][by][bx]
            if is_dc:
                dc_block(0, td, coef)
            elif Ah == 0:
                stats = ac_stats.setdefault(ta, bytearray(_AC_STAT_BINS))
                _decode_ac_band(dec, stats, fixed, kx, coef, Ss, Se, Al)
            else:
                stats = ac_stats.setdefault(ta, bytearray(_AC_STAT_BINS))
                _decode_ac_refine(dec, stats, fixed, coef, Ss, Se, Al)
            unit += 1


def _decode_ac_refine(
    dec: ArithDecoder,
    stats: bytearray,
    fixed: bytearray,
    coef: list[int],
    ss: int,
    se: int,
    al: int,
) -> None:
    """AC successive-approximation refinement (T.81 G.2): per band
    index — an EOB decision at 3(k-1) once past the previous stage's
    last nonzero (kex); then a run of zero-history positions each
    answering a significance decision at st+1 (st advancing by 3),
    previously-nonzero positions answering a correction-bit decision
    at st+2 (st frozen), new signs on the fixed bin."""
    p1 = 1 << al
    m1 = -p1
    kex = se
    while kex > 0 and coef[kex] == 0:
        kex -= 1
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if k > kex and dec.decode(stats, st):
            break  # EOB
        while True:
            c = coef[k]
            if c:
                if dec.decode(stats, st + 2):
                    coef[k] = c + (p1 if c > 0 else m1)
                break
            if dec.decode(stats, st + 1):
                coef[k] = m1 if dec.decode(fixed, 0) else p1
                break
            st += 3
            k += 1
            if k > se:
                raise ValueError("refinement run past band end")
        k += 1


def _encode_ac_refine(
    enc: ArithEncoder,
    stats: bytearray,
    fixed: bytearray,
    zz: list[int],
    ss: int,
    se: int,
    al: int,
) -> None:
    """Exact mirror of ``_decode_ac_refine``: temp is the magnitude at
    the current precision (abs then shift — truncation toward zero);
    temp > 1 means nonzero history (correction bit = temp's low bit),
    temp == 1 newly nonzero, temp == 0 still insignificant."""
    temp = [0] * (se + 1)
    for k in range(ss, se + 1):
        temp[k] = abs(zz[k]) >> al
    ke = se
    while ke >= ss and temp[ke] == 0:
        ke -= 1
    kex = ke
    while kex >= ss and temp[kex] >> 1 == 0:
        kex -= 1
    k = ss
    while k <= ke:
        st = 3 * (k - 1)
        if k > kex:
            enc.encode(stats, st, 0)  # not EOB yet
        while True:
            t = temp[k]
            if t:
                if t > 1:
                    enc.encode(stats, st + 2, t & 1)
                else:
                    enc.encode(stats, st + 1, 1)
                    enc.encode(fixed, 0, 1 if zz[k] < 0 else 0)
                break
            enc.encode(stats, st + 1, 0)
            st += 3
            k += 1
        k += 1
    if k <= se:
        enc.encode(stats, 3 * (k - 1), 1)  # EOB


def decode_arith_progressive(b: bytes) -> tuple[int, int, str, bytes] | None:
    """SOF10 frame → (w, h, 'L'|'RGB', pixels); None for anything this
    path does not cover, via the shared no-raise contract in
    ``decode_jpeg`` (scan-level errors raise ValueError and are caught
    there)."""
    qts: dict[int, list[int]] = {}
    dc_cond: dict[int, tuple[int, int]] = {}
    ac_cond: dict[int, int] = {}
    w = h = None
    comps: list[tuple[int, int, int, int]] = []
    coefs: list = []
    cdims: list[tuple[int, int]] = []
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
        elif marker == 0xCC:  # DAC (may be redefined between scans)
            if not _parse_dac(body, dc_cond, ac_cond):
                return None
        elif marker == 0xDD:
            dri = int.from_bytes(body[0:2], "big")
        elif marker == 0xCA:
            if comps:
                return None  # one frame only
            hdr = _parse_frame_header(body)
            if hdr is None:
                return None
            w, h, comps, hmax, vmax, mx, my = hdr
            coefs, cdims = _alloc_prog_coefs(comps, w, h, hmax, vmax,
                                             mx, my)
        elif marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9,
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
            _arith_prog_scan(
                b[data_start:data_end], scomps, Ss, Se, Ah, Al,
                comps, coefs, cdims, dc_cond, ac_cond, mx, my, dri,
            )
            pos = data_end
            continue
        pos += 2 + ln
    if w is None or not comps or not saw_eoi:
        return None
    return _reconstruct_progressive(comps, coefs, qts, mx, my, w, h,
                                    hmax, vmax)


def encode_arith_progressive_jpeg(
    px: bytes,
    w: int,
    h: int,
    mode: str = "L",
    subsample: bool = False,
    dc_restart: int = 0,
    conditioning: tuple[int, int, int] = (_DEFAULT_L, _DEFAULT_U, _DEFAULT_KX),
) -> bytes:
    """Pixels → SOF10 progressive-arithmetic JFIF JPEG with the same
    libjpeg-style scan script as ``encode_progressive_jpeg`` — DC
    first (Al=1, optional restart markers) → per-component AC bands
    1-5 and 6-63 at Al=2 → two AC refinement passes (Al=1 then 0) →
    DC refinement — so the decoder must exercise spectral selection
    AND successive approximation through the QM coder.  Quantization
    is shared with every other JPEG encoder here, so the decode must
    be byte-equal to the baseline decode of the same source."""
    lb, ub, kx = conditioning
    qt_l = np.array(QT_LUM, dtype=np.float64).reshape(8, 8)
    qt_c = np.array(QT_CHROM, dtype=np.float64).reshape(8, 8)
    color = mode != "L"
    if color and subsample:
        mx, my = (w + 15) // 16, (h + 15) // 16
        y, cb, cr = _rgb_to_ycbcr(px, w, h)

        def down(p):
            p = _pad_plane(p, my * 2, mx * 2)
            return (
                p[0::2, 0::2] + p[1::2, 0::2] + p[0::2, 1::2] + p[1::2, 1::2]
            ) / 4.0

        planes = [
            _quantized_blocks(
                _pad_plane(y, my * 2, mx * 2), qt_l, my * 2, mx * 2
            ),
            _quantized_blocks(down(cb), qt_c, my, mx),
            _quantized_blocks(down(cr), qt_c, my, mx),
        ]
        comps = [(1, 2, 2, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
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
        cdims = [(bh0, bw0)] * 3
    else:
        bw0, bh0 = (w + 7) // 8, (h + 7) // 8
        mx, my = bw0, bh0
        img = np.frombuffer(px, dtype=np.uint8).reshape(h, w).astype(
            np.float64
        )
        planes = [_quantized_blocks(img, qt_l, bh0, bw0)]
        comps = [(1, 1, 1, 0)]
        cdims = [(bh0, bw0)]
    comp_tables = [(0, 0), (1, 1), (1, 1)][: len(comps)]
    n_tables = 2 if color else 1

    # headers: SOI, APP0, DQT(s), SOF10, DAC
    app0 = _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    dqt = _seg(0xDB, bytes([0x00]) + bytes(QT_LUM[i] for i in ZIGZAG))
    dac = bytes([0x00, (ub << 4) | lb, 0x10, kx])
    if color:
        dqt += _seg(0xDB, bytes([0x01]) + bytes(QT_CHROM[i] for i in ZIGZAG))
        dac += bytes([0x01, (ub << 4) | lb, 0x11, kx])
    sof_body = struct.pack(">BHHB", 8, h, w, len(comps)) + b"".join(
        bytes([cid, (hs << 4) | vs, tq]) for cid, hs, vs, tq in comps
    )
    out = bytearray(
        b"\xff\xd8" + app0 + dqt + _seg(0xCA, sof_body) + _seg(0xCC, dac)
    )

    def sos(scomp_sel, Ss, Se, Ah, Al):
        body = bytes([len(scomp_sel)])
        for cid, td, ta in scomp_sel:
            body += bytes([cid, (td << 4) | ta])
        return _seg(0xDA, body + bytes([Ss, Se, (Ah << 4) | Al]))

    def mcu_blocks():
        """(ci, zz) in interleaved MCU order."""
        for myy in range(my):
            for mxx in range(mx):
                for ci, (_, hs, vs, _) in enumerate(comps):
                    for v in range(vs):
                        for hh in range(hs):
                            yield ci, planes[ci][myy * vs + v][mxx * hs + hh]

    def ac_blocks(ci):
        cbh, cbw = cdims[ci]
        for by in range(cbh):
            for bx in range(cbw):
                yield planes[ci][by][bx]

    # scan 1: DC first, interleaved, Al=1, optional restart markers
    # (DRI applies to this scan, then redefined to 0)
    if dc_restart:
        out += _seg(0xDD, dc_restart.to_bytes(2, "big"))
    out += sos(
        [(comps[ci][0], comp_tables[ci][0], 0) for ci in range(len(comps))],
        0, 0, 0, 1,
    )
    state = _ArithScanState(n_tables, n_tables)
    preds = [0] * len(comps)
    dc_ctx = [0] * len(comps)
    unit = 0
    rst = 0
    blocks_per_mcu = sum(hs * vs for _, hs, vs, _ in comps)
    for bi, (ci, zz) in enumerate(mcu_blocks()):
        if (dc_restart and bi and bi % (dc_restart * blocks_per_mcu) == 0):
            out += state.enc.flush()
            out += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) % 8
            state = _ArithScanState(n_tables, n_tables)
            preds = [0] * len(comps)
            dc_ctx = [0] * len(comps)
        val = zz[0] >> 1  # DC point transform: arithmetic shift
        dct = comp_tables[ci][0]
        dc_ctx[ci] = _encode_dc(
            state.enc, state.dc_stats[dct], dc_ctx[ci],
            val - preds[ci], lb, ub,
        )
        preds[ci] = val
        unit += 1
    out += state.enc.flush()
    if dc_restart:
        out += _seg(0xDD, (0).to_bytes(2, "big"))

    def pt_ac(v: int, al: int) -> int:
        return (abs(v) >> al) * (1 if v >= 0 else -1)

    # per-component AC first scans: bands 1-5 then 6-63 at Al=2
    for ci in range(len(comps)):
        act = comp_tables[ci][1]
        for (ss_, se_) in ((1, 5), (6, 63)):
            out += sos([(comps[ci][0], 0, act)], ss_, se_, 0, 2)
            state = _ArithScanState(n_tables, n_tables)
            for zz in ac_blocks(ci):
                vals = [0] * 64
                for k in range(ss_, se_ + 1):
                    vals[k] = pt_ac(zz[k], 2)
                _encode_ac_band(
                    state.enc, state.ac_stats[act], state.fixed, kx,
                    vals, ss_, se_,
                )
            out += state.enc.flush()
    # AC refinement passes: Ah=2→Al=1, then Ah=1→Al=0
    for (ah, al) in ((2, 1), (1, 0)):
        for ci in range(len(comps)):
            act = comp_tables[ci][1]
            out += sos([(comps[ci][0], 0, act)], 1, 63, ah, al)
            state = _ArithScanState(n_tables, n_tables)
            for zz in ac_blocks(ci):
                _encode_ac_refine(
                    state.enc, state.ac_stats[act], state.fixed,
                    zz, 1, 63, al,
                )
            out += state.enc.flush()
    # DC refinement: Ah=1, Al=0 (interleaved, fixed-bin bits)
    out += sos(
        [(comps[ci][0], comp_tables[ci][0], 0) for ci in range(len(comps))],
        0, 0, 1, 0,
    )
    state = _ArithScanState(n_tables, n_tables)
    for ci, zz in mcu_blocks():
        state.enc.encode(state.fixed, 0, zz[0] & 1)
    out += state.enc.flush()
    return bytes(out) + b"\xff\xd9"
