"""Hierarchical JPEG (T.81 Annex J) — pure stdlib + numpy.

Closes the last stdlib-feasible JPEG stub (the reference loads every
JPEG flavour through cv2/Pillow — `core/pipelines/loaders/
image_loader.py:20-31`): a DHP-headed multi-frame pyramid decodes for
REAL here.  Supported hierarchy shape — the one hierarchical JPEG was
actually designed for (J.1: progressive pyramidal transmission):

- ``DHP`` declares the full-resolution geometry;
- the first frame is NON-differential sequential DCT (SOF0/SOF1) at a
  reduced resolution;
- each following frame is preceded by ``EXP`` (expand the reference by
  2 horizontally and/or vertically, J.1.1.2 bilinear interpolation)
  and codes a DIFFERENTIAL sequential DCT frame (SOF5) — IDCT output
  added to the expanded reference, no level shift;
- an optional final DIFFERENTIAL LOSSLESS frame (SOF7) codes the
  per-sample residual exactly, making the decoded pyramid BYTE-EQUAL
  to the source image (the test oracle: no external producer needed).

Scope is greyscale (single-component) and 4:4:4 YCbCr COLOUR
hierarchies (every frame codes all components as interleaved
one-block MCUs); subsampled-colour pyramids and progressive/
arithmetic hierarchical frames return None through the shared
no-raise contract, like every other unsupported layout.

Two reconstruction conventions T.81 leaves to closed-loop agreement
(both encoder and decoder here apply the same rule, so round-trips
are exact regardless):

- EXP interpolation rounds half UP: ``out[2i+1] = (in[i] + in[i+1]
  + 1) >> 1`` with the trailing odd sample replicated — the J.1.1.2
  filter shape;
- every frame's reconstruction (non-differential and differential
  alike) is clamped to [0, 255] before becoming the next reference,
  per the output-precision rule.

DC coefficients in differential frames are coded WITHOUT prediction
(PRED = 0, T.81 F.2.1.3.1): the differential signal is already a
difference, so each block's DC is sent directly.
"""

from __future__ import annotations

import struct

import numpy as np

from .jpeg import (
    _CHR_AC,
    _CHR_DC,
    _LL_DC,
    _LL_DC_BITS,
    _LL_DC_VALS,
    _LUM_AC,
    _LUM_DC,
    _MAX_PIXELS,
    AC_CHROM_BITS,
    AC_CHROM_VALS,
    AC_LUM_BITS,
    AC_LUM_VALS,
    DC_CHROM_BITS,
    DC_CHROM_VALS,
    DC_LUM_BITS,
    DC_LUM_VALS,
    QT_CHROM,
    QT_LUM,
    ZIGZAG,
    _BitWriter,
    _category,
    _encode_quantized,
    _parse_dht,
    _parse_dqt,
    _entropy_end,
    _fdct,
    _finish_planes,
    _idct,
    _pad_plane,
    _receive_extend,
    _rgb_to_ycbcr,
    _ScanReader,
    _seg,
)

def _qt_natural() -> np.ndarray:
    """Annex K luminance table (stored natural-order in ``jpeg``) as
    the float 8×8 the DCT kernels take."""
    return np.array(QT_LUM, dtype=np.float64).reshape(8, 8)


# ---------------------------------------------------------------------
# Reference expansion (EXP, J.1.1.2)
# ---------------------------------------------------------------------


def _expand(ref: np.ndarray, eh: int, ev: int, fh: int, fw: int) -> np.ndarray:
    """Upsample *ref* by 2 horizontally (*eh*) / vertically (*ev*) with
    the J.1.1.2 bilinear filter (even output = input sample, odd =
    rounded mean of the straddling pair, trailing edge replicated),
    then crop to the next frame's (*fh*, *fw*) — the inverse of the
    ceil-halving pyramid, so fw ∈ {2W-1, 2W} and fh ∈ {2H-1, 2H}."""
    a = ref.astype(np.int32)
    if eh:
        h_, w_ = a.shape
        wide = np.empty((h_, 2 * w_), dtype=np.int32)
        wide[:, 0::2] = a
        nxt = np.concatenate([a[:, 1:], a[:, -1:]], axis=1)
        wide[:, 1::2] = (a + nxt + 1) >> 1
        a = wide
    if ev:
        h_, w_ = a.shape
        tall = np.empty((2 * h_, w_), dtype=np.int32)
        tall[0::2] = a
        nxt = np.concatenate([a[1:], a[-1:]], axis=0)
        tall[1::2] = (a + nxt + 1) >> 1
        a = tall
    if a.shape[0] < fh or a.shape[1] < fw:
        raise ValueError("EXP does not reach the next frame's geometry")
    return a[:fh, :fw]


# ---------------------------------------------------------------------
# Sequential DCT frame kernels (shared non-differential / differential)
# ---------------------------------------------------------------------


def _seq_decode_planes(
    scan: bytes,
    w: int,
    h: int,
    tables: list[tuple[np.ndarray, dict, dict]],
    dri: int,
    differential: bool,
) -> list[np.ndarray]:
    """One sequential-DCT scan → int32 plane (h, w) per component.
    Components are interleaved per MCU (one 8×8 block each — the
    4:4:4 geometry this module supports; a single component is the
    degenerate case with an identical bitstream).  Non-differential
    blocks get the +128 level shift; differential blocks are the raw
    rounded IDCT values (signed).  Restart markers byte-align and
    reset every DC predictor."""
    bw, bh = (w + 7) // 8, (h + 7) // 8
    planes = [
        np.empty((bh * 8, bw * 8), dtype=np.int32) for _ in tables
    ]
    sr = _ScanReader(scan)
    preds = [0] * len(tables)
    unit = 0
    for by in range(bh):
        for bx in range(bw):
            if dri and unit and unit % dri == 0:
                sr.restart()
                preds = [0] * len(tables)
            for ci, (qt, dc_tree, ac_tree) in enumerate(tables):
                s = sr.huff(dc_tree)
                if s > 15:
                    raise ValueError("bad DC category")
                d = _receive_extend(sr, s)
                if differential:
                    dc = d  # PRED = 0 in differential frames (F.2.1.3.1)
                else:
                    preds[ci] += d
                    dc = preds[ci]
                zz = [0] * 64
                zz[0] = dc
                k = 1
                while k < 64:
                    rs = sr.huff(ac_tree)
                    rr, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if rr == 15:
                            k += 16  # ZRL
                            continue
                        break  # EOB
                    k += rr
                    if k > 63:
                        raise ValueError("AC run past block end")
                    zz[k] = _receive_extend(sr, s)
                    k += 1
                coef = np.zeros(64, dtype=np.float64)
                for kk, z in enumerate(ZIGZAG):
                    coef[z] = zz[kk]
                block = _idct(coef.reshape(8, 8) * qt)
                if not differential:
                    block = block + 128.0
                planes[ci][
                    by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8
                ] = np.rint(block).astype(np.int32)
            unit += 1
    return [p[:h, :w] for p in planes]


def _seq_encode_planes(
    targets: list[np.ndarray],
    enc_tables: list[tuple[np.ndarray, dict, dict]],
    differential: bool,
    restart_interval: int = 0,
) -> tuple[bytes, list[np.ndarray]]:
    """Encode one int32 plane per component as one interleaved-MCU
    sequential-DCT scan; returns (entropy bytes incl. RSTn markers,
    the decoder-identical int32 reconstruction per component) — the
    closed loop the differential pyramid needs: the encoder's running
    reference is EXACTLY what the decoder will rebuild.
    *enc_tables* = [(qt, dc_codes, ac_codes)] per component."""
    h, w = targets[0].shape
    bw, bh = (w + 7) // 8, (h + 7) // 8
    padded = [
        _pad_plane(t.astype(np.float64), bh, bw) for t in targets
    ]
    recons = [
        np.empty((bh * 8, bw * 8), dtype=np.int32) for _ in targets
    ]
    out = _BitWriter()
    body = bytearray()
    preds = [0] * len(targets)
    unit = 0
    rst = 0
    center = 0.0 if differential else 128.0
    for by in range(bh):
        for bx in range(bw):
            if restart_interval and unit and unit % restart_interval == 0:
                body += out.flush()
                out = _BitWriter()
                body += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                preds = [0] * len(targets)
            for ci, (qt, dc_codes, ac_codes) in enumerate(enc_tables):
                block = padded[ci][
                    by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8
                ]
                q = np.rint(_fdct(block - center) / qt).astype(np.int64)
                zz = [int(q.reshape(64)[z]) for z in ZIGZAG]
                # differential frames code DC directly (PRED = 0): feed
                # the shared coder a zero predictor, discard its output
                preds[ci] = _encode_quantized(
                    out, zz, 0 if differential else preds[ci],
                    dc_codes, ac_codes,
                )
                # decoder-mirror reconstruction of this block
                deq = np.zeros(64, dtype=np.float64)
                for kk, z in enumerate(ZIGZAG):
                    deq[z] = zz[kk]
                recons[ci][
                    by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8
                ] = np.rint(
                    _idct(deq.reshape(8, 8) * qt) + center
                ).astype(np.int32)
            unit += 1
    body += out.flush()
    return bytes(body), [r[:h, :w] for r in recons]


# ---------------------------------------------------------------------
# Differential lossless frame kernels (SOF7, exact final correction)
# ---------------------------------------------------------------------


def _ll_diff_decode(
    scan: bytes, w: int, h: int, trees: list[dict], dri: int
) -> list[np.ndarray]:
    """Differential lossless scan → int32 diff plane (h, w) per
    component (interleaved per sample position, the T.81 H.2 order; a
    single component is the identical-bitstream degenerate case).
    Values are category/extend-coded residuals (category 16 = the
    -32768 special case, mirroring the SOF3 path); no prediction — the
    reference IS the prediction in differential frames."""
    sr = _ScanReader(scan)
    diffs = [np.empty((h, w), dtype=np.int32) for _ in trees]
    unit = 0
    for y in range(h):
        for x in range(w):
            if dri and unit and unit % dri == 0:
                sr.restart()
            for ci, tree in enumerate(trees):
                s = sr.huff(tree)
                if s > 16:
                    raise ValueError("bad category")
                d = 32768 if s == 16 else _receive_extend(sr, s)
                diffs[ci][y, x] = d
            unit += 1
    return diffs


def _ll_diff_encode(
    diffs: list[np.ndarray], restart_interval: int = 0
) -> bytes:
    """Encode int32 residual planes as one differential lossless scan
    (category/extend with the 17-symbol lossless table, components
    interleaved per sample position)."""
    out = _BitWriter()
    body = bytearray()
    rst = 0
    unit = 0
    h, w = diffs[0].shape
    for y in range(h):
        for x in range(w):
            if restart_interval and unit and unit % restart_interval == 0:
                body += out.flush()
                out = _BitWriter()
                body += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
            for diff in diffs:
                d = ((int(diff[y, x]) + 32768) & 0xFFFF) - 32768
                if d == -32768:
                    c, ln = _LL_DC[16]
                    out.write(c, ln)
                else:
                    s = _category(d)
                    c, ln = _LL_DC[s]
                    out.write(c, ln)
                    if s:
                        out.write(d if d >= 0 else d + (1 << s) - 1, s)
            unit += 1
    body += out.flush()
    return bytes(body)


# ---------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------


def decode_hier_jpeg(b: bytes) -> tuple[int, int, str, bytes] | None:
    """Hierarchical (DHP) JPEG → (w, h, 'L', pixels) or None under the
    shared no-raise contract (one corrupt blob must never fail a whole
    Arrow batch)."""
    try:
        return _decode_hier_checked(b)
    except (IndexError, KeyError, ValueError, ZeroDivisionError,
            struct.error):
        return None


def _decode_hier_checked(b: bytes) -> tuple[int, int, str, bytes] | None:
    if b[:2] != b"\xff\xd8":
        return None
    qts: dict[int, list[int]] = {}  # natural order (_parse_dqt)
    dc_trees: dict[int, dict] = {}
    ac_trees: dict[int, dict] = {}
    dri = 0
    W = H = None            # full-resolution geometry from DHP
    dhp_cids: list[int] = []
    refs: list[np.ndarray] | None = None  # one per DHP component
    pend_eh = pend_ev = 0   # EXP flags awaiting the next frame
    # current frame: (kind, diff, fh, fw, [(cid, tq)…])
    cur: tuple[str, bool, int, int, list[tuple[int, int]]] | None = None
    pos = 2
    n = len(b)
    while pos + 2 <= n:
        if b[pos] != 0xFF:
            return None
        marker = b[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if pos + 4 > n:
            return None
        ln = int.from_bytes(b[pos + 2:pos + 4], "big")
        body = b[pos + 4:pos + 2 + ln]
        if marker == 0xDB:
            if not _parse_dqt(body, qts):
                return None  # 16-bit tables: 12-bit out of scope
        elif marker == 0xC4:
            _parse_dht(body, dc_trees, ac_trees)
        elif marker == 0xDD:
            dri = int.from_bytes(body[0:2], "big")
        elif marker == 0xDE:  # DHP — full-resolution frame header
            if W is not None:
                return None  # one hierarchy per stream
            prec = body[0]
            H = int.from_bytes(body[1:3], "big")
            W = int.from_bytes(body[3:5], "big")
            ncomp = body[5]
            if prec != 8 or ncomp not in (1, 3):
                return None  # deep / CMYK hierarchies out of scope
            if not W or not H or W * H > _MAX_PIXELS:
                return None
            dhp_cids = [body[6 + 3 * c] for c in range(ncomp)]
        elif marker == 0xDF:  # EXP — expand reference before next frame
            eh, ev = body[0] >> 4, body[0] & 0x0F
            if eh > 1 or ev > 1 or refs is None:
                return None
            pend_eh, pend_ev = eh, ev
        elif marker in (0xC0, 0xC1, 0xC5, 0xC7):
            if W is None:
                return None  # differential/pyramid frames need DHP
            prec = body[0]
            fh = int.from_bytes(body[1:3], "big")
            fw = int.from_bytes(body[3:5], "big")
            ncomp = body[5]
            if prec != 8 or ncomp != len(dhp_cids):
                return None
            if not fw or not fh or fw > W or fh > H:
                return None
            fcomps = []
            for c in range(ncomp):
                cid = body[6 + 3 * c]
                samp = body[7 + 3 * c]
                if samp != 0x11 and ncomp > 1:
                    return None  # subsampled colour pyramids: stub
                fcomps.append((cid, body[8 + 3 * c]))
            if [cid for cid, _ in fcomps] != dhp_cids:
                return None  # every frame codes the DHP component set
            kind = "ll" if marker == 0xC7 else "seq"
            differential = marker in (0xC5, 0xC7)
            cur = (kind, differential, fh, fw, fcomps)
        elif marker in (0xC2, 0xC3, 0xC6, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE,
                        0xCF):
            return None  # progressive/arith/lossless-first hier frames
        elif marker == 0xDA:
            if cur is None:
                return None
            kind, differential, fh, fw, fcomps = cur
            ns = body[0]
            if ns != len(fcomps):
                return None  # one interleaved scan per frame
            sel = {}
            for c in range(ns):
                sel[body[1 + 2 * c]] = (
                    body[2 + 2 * c] >> 4, body[2 + 2 * c] & 0x0F
                )
            al = body[3 + 2 * ns] & 0x0F
            scan_start = pos + 2 + ln
            scan_end = _entropy_end(b, scan_start)
            scan = b[scan_start:scan_end]
            # apply any pending expansion now that frame geometry is known
            if pend_eh or pend_ev:
                refs = [
                    _expand(r, pend_eh, pend_ev, fh, fw) for r in refs
                ]
                pend_eh = pend_ev = 0
            if differential:
                if refs is None or refs[0].shape != (fh, fw):
                    return None
            elif refs is not None:
                return None  # only the first frame is non-differential
            if kind == "seq":
                tables = []
                for cid, tq in fcomps:
                    if cid not in sel:
                        return None
                    td, ta = sel[cid]
                    dc_tree = dc_trees.get(td)
                    ac_tree = ac_trees.get(ta)
                    qt_nat = qts.get(tq)
                    if dc_tree is None or ac_tree is None or qt_nat is None:
                        return None
                    tables.append((
                        np.array(qt_nat, dtype=np.float64).reshape(8, 8),
                        dc_tree,
                        ac_tree,
                    ))
                planes = _seq_decode_planes(
                    scan, fw, fh, tables, dri, differential
                )
                if differential:
                    refs = [
                        np.clip(r + p, 0, 255)
                        for r, p in zip(refs, planes)
                    ]
                else:
                    refs = [np.clip(p, 0, 255) for p in planes]
            else:  # differential lossless correction
                if al != 0:
                    return None  # point-transformed correction: no exactness
                trees = []
                for cid, _ in fcomps:
                    if cid not in sel or sel[cid][0] not in dc_trees:
                        return None
                    trees.append(dc_trees[sel[cid][0]])
                diffs = _ll_diff_decode(scan, fw, fh, trees, dri)
                # mod-2^16 residual arithmetic reduced to the 8-bit
                # output lattice (== one & 0xFF for two's-complement)
                refs = [(r + d) & 0xFF for r, d in zip(refs, diffs)]
            cur = None
            pos = scan_end
            continue
        pos += 2 + ln
    if refs is None or W is None:
        return None
    if refs[0].shape != (H, W):
        return None  # pyramid never reached the DHP geometry
    planes8 = [
        np.clip(r, 0, 255).astype(np.uint8) for r in refs
    ]
    comps = [(cid, 1, 1, 0) for cid in dhp_cids]
    return _finish_planes(comps, planes8, W, H, 1, 1)


# ---------------------------------------------------------------------
# Encoder (fixture generator — real hierarchical JPEG output)
# ---------------------------------------------------------------------


def _box_down(a: np.ndarray) -> np.ndarray:
    """Ceil-halving 2×2 box-mean downsample (edge-replicated to even
    dims first).  The downsampling filter is an encoder free choice in
    T.81 (only EXP's upsampling is normative)."""
    h, w = a.shape
    if h & 1:
        a = np.concatenate([a, a[-1:]], axis=0)
    if w & 1:
        a = np.concatenate([a, a[:, -1:]], axis=1)
    a = a.astype(np.int32)
    return (
        a[0::2, 0::2] + a[0::2, 1::2] + a[1::2, 0::2] + a[1::2, 1::2] + 2
    ) >> 2


def encode_hier_gray_jpeg(
    px: bytes,
    w: int,
    h: int,
    levels: int = 3,
    lossless_final: bool = True,
    restart_interval: int = 0,
) -> bytes:
    """8-bit greyscale pixels → hierarchical JFIF JPEG: SOF0 base
    frame at 1/2^(levels-1) scale, EXP+SOF5 differential refinements
    back to full resolution, and (by default) a final SOF7
    differential-lossless correction that makes decode return the
    source EXACTLY — the strongest oracle a self-generated fixture can
    carry.  *restart_interval* exercises RSTn handling in every frame
    kind."""
    assert levels >= 1
    img = np.frombuffer(px, dtype=np.uint8).reshape(h, w).astype(np.int32)
    targets = [img]
    for _ in range(levels - 1):
        targets.append(_box_down(targets[-1]))
    targets.reverse()  # smallest first
    qt = _qt_natural()

    dqt = _seg(0xDB, bytes([0x00]) + bytes(QT_LUM[i] for i in ZIGZAG))
    dht = (
        _seg(0xC4, bytes([0x00]) + bytes(DC_LUM_BITS) + bytes(DC_LUM_VALS))
        + _seg(0xC4, bytes([0x10]) + bytes(AC_LUM_BITS) + bytes(AC_LUM_VALS))
        + _seg(0xC4, bytes([0x01]) + bytes(_LL_DC_BITS) + bytes(_LL_DC_VALS))
    )
    dhp = _seg(0xDE, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    out = b"\xff\xd8" + dhp + dqt + dht
    if restart_interval:
        out += _seg(0xDD, restart_interval.to_bytes(2, "big"))

    def sof(marker: int, fh: int, fw: int) -> bytes:
        return _seg(
            marker,
            struct.pack(">BHHB", 8, fh, fw, 1) + bytes([1, 0x11, 0]),
        )

    def sos(td_ta: int, se: int) -> bytes:
        # [Ns=1, Cs=1, Td<<4|Ta, Ss, Se, Ah<<4|Al]: Se=63 for DCT
        # scans, 0 for the lossless correction (whose Ss=0 means "no
        # predictor — differential")
        return _seg(0xDA, bytes([1, 1, td_ta, 0, se, 0]))

    enc_tables = [(qt, _LUM_DC, _LUM_AC)]
    ref: np.ndarray | None = None
    for li, target in enumerate(targets):
        fh, fw = target.shape
        if li == 0:
            scan, recons = _seq_encode_planes(
                [target], enc_tables, differential=False,
                restart_interval=restart_interval,
            )
            out += sof(0xC0, fh, fw) + sos(0x00, 63) + scan
            ref = np.clip(recons[0], 0, 255)
        else:
            ph, pw = ref.shape
            eh, ev = int(fw > pw), int(fh > ph)
            if eh or ev:
                out += _seg(0xDF, bytes([(eh << 4) | ev]))
                ref = _expand(ref, eh, ev, fh, fw)
            diff = target - ref
            scan, recons = _seq_encode_planes(
                [diff], enc_tables, differential=True,
                restart_interval=restart_interval,
            )
            out += sof(0xC5, fh, fw) + sos(0x00, 63) + scan
            ref = np.clip(ref + recons[0], 0, 255)
    if lossless_final:
        resid = img - ref
        scan = _ll_diff_encode([resid], restart_interval=restart_interval)
        out += sof(0xC7, h, w) + sos(0x10, 0) + scan
    return out + b"\xff\xd9"


def encode_hier_rgb_jpeg(
    px: bytes,
    w: int,
    h: int,
    levels: int = 3,
    lossless_final: bool = True,
    restart_interval: int = 0,
) -> bytes:
    """Interleaved RGB pixels → COLOUR hierarchical JFIF JPEG (YCbCr
    4:4:4 — every frame codes all three components as interleaved
    one-block MCUs; Y takes the Annex K luminance tables, Cb/Cr the
    chrominance ones).  The pipeline is the greyscale pyramid per
    component: SOF0 base frame, EXP+SOF5 differential refinements,
    optional SOF7 lossless correction — with the correction the
    decoded YCbCr planes equal the encoder's INTEGER YCbCr source
    exactly, so the RGB output is the deterministic JFIF inverse
    transform of those planes (test oracle: computed independently)."""
    assert levels >= 1
    y, cb, cr = _rgb_to_ycbcr(px, w, h)
    srcs = [
        np.clip(np.rint(p), 0, 255).astype(np.int32) for p in (y, cb, cr)
    ]
    pyramids = []
    for s in srcs:
        levels_k = [s]
        for _ in range(levels - 1):
            levels_k.append(_box_down(levels_k[-1]))
        levels_k.reverse()
        pyramids.append(levels_k)

    qt_l = _qt_natural()
    qt_c = np.array(QT_CHROM, dtype=np.float64).reshape(8, 8)
    enc_tables = [
        (qt_l, _LUM_DC, _LUM_AC),
        (qt_c, _CHR_DC, _CHR_AC),
        (qt_c, _CHR_DC, _CHR_AC),
    ]

    dqt = _seg(0xDB, bytes([0x00]) + bytes(QT_LUM[i] for i in ZIGZAG))
    dqt += _seg(0xDB, bytes([0x01]) + bytes(QT_CHROM[i] for i in ZIGZAG))
    dht = (
        _seg(0xC4, bytes([0x00]) + bytes(DC_LUM_BITS) + bytes(DC_LUM_VALS))
        + _seg(0xC4, bytes([0x10]) + bytes(AC_LUM_BITS) + bytes(AC_LUM_VALS))
        + _seg(
            0xC4, bytes([0x01]) + bytes(DC_CHROM_BITS) + bytes(DC_CHROM_VALS)
        )
        + _seg(
            0xC4, bytes([0x11]) + bytes(AC_CHROM_BITS) + bytes(AC_CHROM_VALS)
        )
        + _seg(0xC4, bytes([0x02]) + bytes(_LL_DC_BITS) + bytes(_LL_DC_VALS))
    )
    comp_specs = bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1])
    dhp = _seg(0xDE, struct.pack(">BHHB", 8, h, w, 3) + comp_specs)
    out = b"\xff\xd8" + dhp + dqt + dht
    if restart_interval:
        out += _seg(0xDD, restart_interval.to_bytes(2, "big"))

    def sof(marker: int, fh: int, fw: int) -> bytes:
        return _seg(
            marker, struct.pack(">BHHB", 8, fh, fw, 3) + comp_specs
        )

    def sos(dct: bool) -> bytes:
        if dct:  # Y → tables 0, Cb/Cr → tables 1
            body = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
        else:    # lossless correction: every comp uses DC table 2
            body = bytes([3, 1, 0x20, 2, 0x20, 3, 0x20, 0, 0, 0])
        return _seg(0xDA, body)

    refs: list[np.ndarray] | None = None
    for li in range(levels):
        targets = [pyr[li] for pyr in pyramids]
        fh, fw = targets[0].shape
        if li == 0:
            if levels == 1:
                # single-frame hierarchy: quantize the FLOAT YCbCr
                # planes exactly like encode_rgb_jpeg 4:4:4, so the
                # envelope oracle (hier(1) == plain baseline colour,
                # byte-equal) holds; the int sources still anchor the
                # lossless correction below
                targets = [y, cb, cr]
            scan, recons = _seq_encode_planes(
                targets, enc_tables, differential=False,
                restart_interval=restart_interval,
            )
            out += sof(0xC0, fh, fw) + sos(True) + scan
            refs = [np.clip(r, 0, 255) for r in recons]
        else:
            ph, pw = refs[0].shape
            eh, ev = int(fw > pw), int(fh > ph)
            if eh or ev:
                out += _seg(0xDF, bytes([(eh << 4) | ev]))
                refs = [_expand(r, eh, ev, fh, fw) for r in refs]
            diffs = [t - r for t, r in zip(targets, refs)]
            scan, recons = _seq_encode_planes(
                diffs, enc_tables, differential=True,
                restart_interval=restart_interval,
            )
            out += sof(0xC5, fh, fw) + sos(True) + scan
            refs = [
                np.clip(r + rec, 0, 255) for r, rec in zip(refs, recons)
            ]
    if lossless_final:
        resids = [s - r for s, r in zip(srcs, refs)]
        scan = _ll_diff_encode(resids, restart_interval=restart_interval)
        out += sof(0xC7, h, w) + sos(False) + scan
    return out + b"\xff\xd9"
