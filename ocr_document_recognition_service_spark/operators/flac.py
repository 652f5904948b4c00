"""FLAC lossless audio codec — pure stdlib + numpy.

Narrows the perceptual-audio stub to genuinely-perceptual codecs
(mp3/ogg): FLAC is LOSSLESS, fully specified in public documents (the
xiph.org format spec / RFC 9639), and integer-exact — so it decodes
for real here with no external library, the same posture as the
JPEG/TIFF/G.711/ADPCM stack.  Coverage is the classic 8-24-bit
surface; the 32-bit depth RFC 9639 added (and depths like 4-7 bits
STREAMINFO can express) REJECT cleanly to the stub tier rather than
decode (the reference loads audio through
soundfile/ffmpeg — `core/pipelines/loaders/image_loader.py:20-31` is the
loader-stage contract this mirrors for audio payloads).

Decoder surface:

- STREAMINFO metadata (and skip of every other metadata block);
- frame headers: both blocking strategies, all block-size / sample-
  rate / sample-size codes (8/12/16/20/24-bit), CRC-8 verified;
- subframes: CONSTANT, VERBATIM, FIXED orders 0-4, LPC orders 1-32
  (quantized-coefficient integer prediction with arithmetic shift);
- residuals: 4-bit (method 0) and 5-bit (method 1) Rice parameters,
  any partition order, escape partitions (raw n-bit, incl. n=0);
- wasted bits; inter-channel decorrelation: left/side, right/side,
  mid/side (side channel carries bps+1 bits);
- frame CRC-16 verified; STREAMINFO's unencoded-PCM md5 verified when
  present (non-zero) — corrupt streams reject rather than emit wrong
  samples.

The fixture encoder mirrors the decoder's integer prediction exactly
(FLAC prediction is defined on integers, so unlike the DCT codecs no
closed-loop reconstruction is even needed): decode(encode(pcm)) is
BYTE-EQUAL to the source PCM, and the STREAMINFO md5 the encoder
stamps doubles as an in-stream oracle the decoder re-derives.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

_SAMPLE_RATES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}

_SAMPLE_SIZES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24}

_SAMPLE_RATE_CODES = {v: k for k, v in _SAMPLE_RATES.items()}
_BLOCK_SIZE_CODES = {192: 1, 576: 2, 1152: 3, 2304: 4, 4608: 5,
                     256: 8, 512: 9, 1024: 10, 2048: 11, 4096: 12,
                     8192: 13, 16384: 14, 32768: 15}

_MAX_SAMPLES = 1 << 26  # decode-size guard, same policy as the images


def _crc_table(poly: int, width: int) -> list[int]:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    table = []
    for byte in range(256):
        crc = byte << (width - 8)
        for _ in range(8):
            crc = ((crc << 1) ^ poly) if crc & top else (crc << 1)
        table.append(crc & mask)
    return table


_CRC8_TABLE = _crc_table(0x07, 8)      # x^8 + x^2 + x + 1
_CRC16_TABLE = _crc_table(0x8005, 16)  # x^16 + x^15 + x^2 + 1


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = _CRC8_TABLE[crc ^ b]
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = _CRC16_TABLE[((crc >> 8) ^ b) & 0xFF] ^ ((crc << 8) & 0xFFFF)
    return crc


class _Bits:
    """MSB-first bit reader (FLAC's bit order throughout)."""

    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, k: int) -> int:
        v = 0
        while k:
            if self.byte >= len(self.data):
                raise ValueError("bitstream exhausted")
            avail = 8 - self.bit
            take = min(k, avail)
            cur = self.data[self.byte]
            v = (v << take) | (
                (cur >> (avail - take)) & ((1 << take) - 1)
            )
            self.bit += take
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
            k -= take
        return v

    def signed(self, k: int) -> int:
        v = self.read(k)
        return v - (1 << k) if v >= (1 << (k - 1)) else v

    def unary(self) -> int:
        """FLAC unary: n zero bits terminated by a one bit."""
        n = 0
        while self.read(1) == 0:
            n += 1
            if n > 1 << 24:
                raise ValueError("unary run overflow")
        return n

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.byte += 1


class _BitsOut:
    """MSB-first bit writer."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, v: int, k: int) -> None:
        self.acc = (self.acc << k) | (v & ((1 << k) - 1))
        self.n += k
        while self.n >= 8:
            self.buf.append((self.acc >> (self.n - 8)) & 0xFF)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def unary(self, n: int) -> None:
        while n >= 32:
            self.write(0, 32)
            n -= 32
        self.write(1, n + 1)  # n zeros then the terminating one

    def align(self) -> None:
        if self.n:
            self.write(0, 8 - self.n)

    def bytes(self) -> bytes:
        self.align()
        return bytes(self.buf)


def _utf8_number(r: _Bits) -> int:
    """FLAC's UTF-8-style coded number (frame/sample index, ≤ 36
    bits / 7 bytes)."""
    first = r.read(8)
    if first < 0x80:
        return first
    n = 0
    probe = first
    while probe & 0x40:
        n += 1
        probe <<= 1
    if n < 1 or n > 6:
        raise ValueError("bad UTF-8 number prefix")
    v = first & (0x3F >> n)
    for _ in range(n):
        c = r.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("bad UTF-8 continuation")
        v = (v << 6) | (c & 0x3F)
    return v


def _utf8_encode(v: int) -> bytes:
    if v < 0x80:
        return bytes([v])
    out = []
    # byte count: n continuation bytes carry 6 bits each, the lead
    # byte carries (6 - n) payload bits
    n = 1
    while v >> (6 * n) >= (1 << (6 - n)) and n < 6:
        n += 1
    lead = (0xFF << (7 - n)) & 0xFF | (v >> (6 * n))
    out.append(lead)
    for i in range(n - 1, -1, -1):
        out.append(0x80 | ((v >> (6 * i)) & 0x3F))
    return bytes(out)


# ---------------------------------------------------------------------
# Residual coding (Rice / escape partitions)
# ---------------------------------------------------------------------


def _read_residual(
    r: _Bits, block_size: int, pred_order: int
) -> list[int]:
    method = r.read(2)
    if method > 1:
        raise ValueError("reserved residual method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    order = r.read(4)
    nparts = 1 << order
    if block_size % nparts or block_size >> order <= 0:
        raise ValueError("bad partition order")
    res: list[int] = []
    for p in range(nparts):
        n = (block_size >> order) - (pred_order if p == 0 else 0)
        if n < 0:
            raise ValueError("partition shorter than predictor order")
        param = r.read(pbits)
        if param == escape:
            raw = r.read(5)
            if raw:
                res.extend(r.signed(raw) for _ in range(n))
            else:
                res.extend([0] * n)
        else:
            for _ in range(n):
                q = r.unary()
                u = (q << param) | r.read(param) if param else q
                res.append((u >> 1) ^ -(u & 1))  # zigzag fold
    return res


def _write_residual(
    w: _BitsOut,
    res: list[int],
    block_size: int,
    pred_order: int,
    order: int = 0,
    method: int = 0,
    escape_raw: int | None = None,
) -> None:
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    w.write(method, 2)
    w.write(order, 4)
    nparts = 1 << order
    assert block_size % nparts == 0
    assert (block_size >> order) >= pred_order, (
        "first partition shorter than the predictor order"
    )
    idx = 0
    for p in range(nparts):
        n = (block_size >> order) - (pred_order if p == 0 else 0)
        part = res[idx:idx + n]
        idx += n
        if escape_raw is not None:
            w.write(escape, pbits)
            w.write(escape_raw, 5)
            for v in part:
                w.write(v, escape_raw)
            continue
        # smallest Rice parameter that keeps every quotient sane
        folded = [((v << 1) if v >= 0 else ((-v) << 1) - 1) for v in part]
        best = 0
        for param in range(escape):
            if all(u >> param <= 40 for u in folded):
                best = param
                break
        else:
            best = escape - 1
        w.write(best, pbits)
        for u in folded:
            w.unary(u >> best)
            if best:
                w.write(u & ((1 << best) - 1), best)


# ---------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------


def _pack_pcm(samples: np.ndarray, bits: int) -> bytes:
    """Decoded samples → little-endian interleaved PCM bytes (the
    layout STREAMINFO's md5 is defined over).  24-bit packs through an
    int32 view with every 4th byte dropped — vectorized, no per-sample
    Python loop."""
    width = (bits + 7) // 8
    if width == 3:
        quads = np.frombuffer(
            samples.astype("<i4").tobytes(), dtype=np.uint8
        ).reshape(-1, 4)
        return quads[:, :3].tobytes()
    return samples.astype("<i1" if width == 1 else "<i2").tobytes()


def decode_flac(
    b: bytes,
) -> tuple[int, int, int, np.ndarray] | None:
    """FLAC stream → ``(sample_rate, channels, bits, samples)`` with
    *samples* an int32 array of shape (n, channels), or None under the
    shared no-raise contract (corrupt/truncated/foreign payloads must
    not fail an Arrow batch — CRC-8/CRC-16/md5 mismatches reject)."""
    try:
        full = _decode_flac_checked(b)
    except (IndexError, KeyError, ValueError, ZeroDivisionError,
            struct.error, OverflowError):
        return None
    return None if full is None else full[:4]


def _decode_flac_checked(
    b: bytes,
) -> tuple[int, int, int, np.ndarray] | None:
    if b[:4] != b"fLaC":
        return None
    pos = 4
    info = None
    while pos + 4 <= len(b):
        hdr = b[pos]
        last = hdr & 0x80
        btype = hdr & 0x7F
        ln = int.from_bytes(b[pos + 1:pos + 4], "big")
        body = b[pos + 4:pos + 4 + ln]
        if btype == 0:  # STREAMINFO
            if len(body) != 34:
                return None
            r = _Bits(body)
            r.read(16)  # min block size
            r.read(16)  # max block size
            r.read(24)  # min frame size
            r.read(24)  # max frame size
            rate = r.read(20)
            channels = r.read(3) + 1
            bits = r.read(5) + 1
            total = r.read(36)
            md5 = body[18:34]
            info = (rate, channels, bits, total, md5)
        elif btype == 127:
            return None  # invalid block type
        pos += 4 + ln
        if last:
            break
    if info is None or pos > len(b):
        return None
    rate, channels, bits, total, md5 = info
    if not rate or channels > 8 or bits not in (8, 12, 16, 20, 24):
        return None
    if total > _MAX_SAMPLES:
        return None

    out: list[np.ndarray] = []
    got = 0
    while pos < len(b):
        frame, consumed = _decode_frame(b, pos, rate, channels, bits)
        if frame is None:
            return None
        out.append(frame)
        got += frame.shape[0]
        if got > _MAX_SAMPLES:
            return None
        pos += consumed
        if total and got >= total:
            break  # tolerate trailing bytes (appended tags, padding)
    samples = (
        np.concatenate(out) if out
        else np.empty((0, channels), dtype=np.int32)
    )
    if total and samples.shape[0] < total:
        return None  # truncated stream: frames missing
    if total:
        samples = samples[:total]
    raw = _pack_pcm(samples, bits)
    if md5 != b"\x00" * 16:
        if hashlib.md5(raw).digest() != md5:
            return None  # decoded PCM disagrees with the stream's oracle
    return rate, channels, bits, samples, raw


def _decode_frame(
    b: bytes, pos: int, rate0: int, channels0: int, bits0: int
) -> tuple[np.ndarray | None, int]:
    r = _Bits(b, pos)
    if r.read(14) != 0x3FFE:
        return None, 0
    r.read(1)  # reserved
    r.read(1)  # blocking strategy
    bs_code = r.read(4)
    sr_code = r.read(4)
    ch_code = r.read(4)
    ss_code = r.read(3)
    r.read(1)  # reserved
    _utf8_number(r)
    if bs_code == 0:
        raise ValueError("reserved block size code")
    if bs_code == 1:
        block_size = 192
    elif 2 <= bs_code <= 5:
        block_size = 576 << (bs_code - 2)
    elif bs_code == 6:
        block_size = r.read(8) + 1
    elif bs_code == 7:
        block_size = r.read(16) + 1
    else:
        block_size = 256 << (bs_code - 8)
    if sr_code == 0:
        pass  # from STREAMINFO
    elif sr_code in _SAMPLE_RATES:
        if _SAMPLE_RATES[sr_code] != rate0:
            raise ValueError("frame sample rate disagrees")
    elif sr_code == 12:
        r.read(8)
    elif sr_code in (13, 14):
        r.read(16)
    else:
        raise ValueError("invalid sample rate code")
    if ch_code <= 7:
        channels = ch_code + 1
        assignment = "indep"
    elif ch_code == 8:
        channels, assignment = 2, "left_side"
    elif ch_code == 9:
        channels, assignment = 2, "right_side"
    elif ch_code == 10:
        channels, assignment = 2, "mid_side"
    else:
        raise ValueError("reserved channel assignment")
    if channels != channels0:
        raise ValueError("frame channel count disagrees")
    if ss_code == 0:
        bits = bits0
    elif ss_code in _SAMPLE_SIZES:
        bits = _SAMPLE_SIZES[ss_code]
        if bits != bits0:
            raise ValueError("frame sample size disagrees")
    else:
        raise ValueError("reserved sample size code")
    r.align()
    header_crc = b[pos:r.byte]
    crc = r.read(8)
    if _crc8(header_crc) != crc:
        raise ValueError("frame header CRC-8 mismatch")

    chans: list[list[int]] = []
    for ci in range(channels):
        sbps = bits
        if (assignment == "left_side" and ci == 1) or (
            assignment == "right_side" and ci == 0
        ) or (assignment == "mid_side" and ci == 1):
            sbps += 1  # the side channel carries one extra bit
        chans.append(_decode_subframe(r, block_size, sbps))
    r.align()
    footer_crc = b[pos:r.byte]
    crc16 = r.read(16)
    if _crc16(footer_crc) != crc16:
        raise ValueError("frame CRC-16 mismatch")

    a = np.array(chans, dtype=np.int64)
    if assignment == "left_side":
        left, side = a[0], a[1]
        a = np.stack([left, left - side])
    elif assignment == "right_side":
        side, right = a[0], a[1]
        a = np.stack([side + right, right])
    elif assignment == "mid_side":
        mid, side = a[0], a[1]
        m = (mid << 1) | (side & 1)
        a = np.stack([(m + side) >> 1, (m - side) >> 1])
    # a CRC-consistent stream can still declare residuals that push
    # samples outside the bit depth (md5 may legally be unset) — wrong
    # samples must reject, and int32 must never wrap silently
    lim = 1 << (bits - 1)
    if a.size and (a.min() < -lim or a.max() >= lim):
        raise ValueError("decoded samples exceed the declared bit depth")
    return a.T.astype(np.int32), r.byte - pos


def _decode_subframe(r: _Bits, block_size: int, bps: int) -> list[int]:
    if r.read(1):
        raise ValueError("subframe pad bit set")
    stype = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = 1 + r.unary()
    eff = bps - wasted
    if eff <= 0:
        raise ValueError("wasted bits exhaust the sample size")
    if stype == 0:  # CONSTANT
        v = r.signed(eff)
        samples = [v] * block_size
    elif stype == 1:  # VERBATIM
        samples = [r.signed(eff) for _ in range(block_size)]
    elif 8 <= stype <= 12:  # FIXED order 0-4
        order = stype - 8
        samples = [r.signed(eff) for _ in range(order)]
        res = _read_residual(r, block_size, order)
        coefs = _FIXED_COEFS[order]
        lim = 1 << (bps + 4)  # predictor-state bound: a crafted frame
        for i, e in enumerate(res):  # must fail fast, not grow bignums
            pred = sum(
                c * samples[order + i - 1 - j] for j, c in enumerate(coefs)
            )
            v = pred + e
            if not -lim <= v < lim:
                raise ValueError("fixed prediction diverged")
            samples.append(v)
    elif stype >= 32:  # LPC order 1-32
        order = stype - 31
        if order > block_size:
            raise ValueError("LPC order exceeds block size")
        samples = [r.signed(eff) for _ in range(order)]
        precision = r.read(4) + 1
        if precision == 16:
            raise ValueError("invalid qlp precision")
        shift = r.signed(5)
        if shift < 0:
            raise ValueError("negative qlp shift")
        coefs = [r.signed(precision) for _ in range(order)]
        res = _read_residual(r, block_size, order)
        lim = 1 << (bps + 4)  # same fail-fast divergence bound
        for e in res:
            pred = sum(
                c * samples[-1 - j] for j, c in enumerate(coefs)
            ) >> shift
            v = pred + e
            if not -lim <= v < lim:
                raise ValueError("LPC prediction diverged")
            samples.append(v)
    else:
        raise ValueError("reserved subframe type")
    if len(samples) != block_size:
        raise ValueError("subframe sample count mismatch")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def decode_flac_stats(
    b: bytes,
) -> tuple[int, int, int, int, float, float, float, str, str] | None:
    """The ``decode_wav_samples`` 9-tuple contract for FLAC payloads:
    ``(rate, channels, bits, n_frames, duration_sec, peak, rms,
    sample_md5, 'flac')`` with peak/rms normalized to full scale and
    *sample_md5* over the DECODED little-endian interleaved PCM (the
    same bytes STREAMINFO's md5 certifies, recomputed from the actual
    decode).  None for undecodable payloads."""
    try:
        full = _decode_flac_checked(b)
    except (IndexError, KeyError, ValueError, ZeroDivisionError,
            struct.error, OverflowError):
        return None
    if full is None:
        return None
    rate, channels, bits, samples, raw = full
    n = samples.shape[0]
    x = samples.astype(np.float64).reshape(-1)
    full_scale = float(1 << (bits - 1))
    peak = float(np.max(np.abs(x)) / full_scale) if x.size else 0.0
    rms = float(np.sqrt(np.mean(x * x)) / full_scale) if x.size else 0.0
    return (
        rate, channels, bits, n, n / rate, peak, rms,
        hashlib.md5(raw).hexdigest(), "flac",
    )


# ---------------------------------------------------------------------
# Encoder (fixture generator — real FLAC output)
# ---------------------------------------------------------------------


def encode_flac(
    samples,
    sample_rate: int,
    bits: int = 16,
    block_size: int = 1024,
    subframe: str = "fixed",
    fixed_order: int = 2,
    channel_mode: str = "indep",
    lpc_coefs: tuple[int, ...] = (3, -3, 1),
    lpc_shift: int = 1,
    partition_order: int = 0,
    rice2: bool = False,
    escape_raw: int | None = None,
    wasted_bits: int = 0,
) -> bytes:
    """PCM → FLAC stream.  *samples*: (n, channels) int array (or 1-D
    for mono), values fitting *bits* (8/12/16/20/24).  Knobs exist to
    exercise every decoder path: subframe ``constant`` / ``verbatim``
    / ``fixed`` (order 0-4) / ``lpc``; ``channel_mode`` ``indep`` /
    ``left_side`` / ``right_side`` / ``mid_side`` (stereo only);
    Rice method 0/1 (*rice2*), *partition_order*, escape partitions
    (*escape_raw* bit width — caller guarantees residuals fit);
    *wasted_bits* (samples must have that many low zero bits).
    Prediction is integer-exact, so decode returns the source PCM
    byte-equal; STREAMINFO carries the true PCM md5."""
    a = np.asarray(samples, dtype=np.int64)
    if a.ndim == 1:
        a = a[:, None]
    n, channels = a.shape
    assert 1 <= channels <= 8 and bits in (8, 12, 16, 20, 24)
    assert channel_mode == "indep" or channels == 2
    lim = 1 << (bits - 1)
    assert a.min() >= -lim and a.max() < lim, "samples exceed bit depth"
    if wasted_bits:
        assert (a & ((1 << wasted_bits) - 1)).sum() == 0

    # STREAMINFO (md5 of the little-endian interleaved source PCM)
    width = (bits + 7) // 8
    if width == 3:
        raw = b"".join(
            int(v).to_bytes(3, "little", signed=True)
            for v in a.reshape(-1).tolist()
        )
    else:
        raw = a.astype("<i1" if width == 1 else "<i2").tobytes()
    si = _BitsOut()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(channels - 1, 3)
    si.write(bits - 1, 5)
    si.write(n, 36)
    info = si.bytes() + hashlib.md5(raw).digest()
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + len(info).to_bytes(3, "big") + info

    method = 1 if rice2 else 0
    frame_no = 0
    for start in range(0, n, block_size):
        blk = a[start:start + block_size]
        bs = blk.shape[0]
        porder = partition_order if bs % (1 << partition_order) == 0 else 0

        if channel_mode == "indep":
            chans = [(blk[:, c], bits) for c in range(channels)]
            ch_code = channels - 1
        elif channel_mode == "left_side":
            chans = [(blk[:, 0], bits), (blk[:, 0] - blk[:, 1], bits + 1)]
            ch_code = 8
        elif channel_mode == "right_side":
            chans = [(blk[:, 0] - blk[:, 1], bits + 1), (blk[:, 1], bits)]
            ch_code = 9
        else:  # mid_side
            chans = [((blk[:, 0] + blk[:, 1]) >> 1, bits),
                     (blk[:, 0] - blk[:, 1], bits + 1)]
            ch_code = 10

        w = _BitsOut()
        w.write(0x3FFE, 14)
        w.write(0, 1)
        w.write(0, 1)  # fixed-blocksize strategy
        # natural codes when the geometry has one (what external
        # encoders emit — keeps those decoder branches honest), the
        # explicit 16-bit form otherwise
        bs_code = _BLOCK_SIZE_CODES.get(bs, 7)
        sr_code = _SAMPLE_RATE_CODES.get(sample_rate, 0)
        w.write(bs_code, 4)
        w.write(sr_code, 4)
        w.write(ch_code, 4)
        ss_code = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6}[bits]
        w.write(ss_code, 3)
        w.write(0, 1)
        for byte in _utf8_encode(frame_no):
            w.write(byte, 8)
        if bs_code == 7:
            w.write(bs - 1, 16)
        hdr = w.bytes()
        hdr += bytes([_crc8(hdr)])

        body = _BitsOut()
        for vec, sbps in chans:
            _encode_subframe(
                body, [int(v) for v in vec.tolist()], bs, sbps,
                subframe, fixed_order, lpc_coefs, lpc_shift,
                porder, method, escape_raw, wasted_bits,
            )
        frame = hdr + body.bytes()
        frame += _crc16(frame).to_bytes(2, "big")
        out += frame
        frame_no += 1
    return bytes(out)


def _encode_subframe(
    w: _BitsOut,
    vec: list[int],
    bs: int,
    sbps: int,
    subframe: str,
    fixed_order: int,
    lpc_coefs: tuple[int, ...],
    lpc_shift: int,
    porder: int,
    method: int,
    escape_raw: int | None,
    wasted_bits: int,
) -> None:
    eff = sbps - wasted_bits
    vals = [v >> wasted_bits for v in vec] if wasted_bits else vec

    kind = subframe
    if kind == "constant" and any(v != vals[0] for v in vals):
        kind = "verbatim"  # constant requires a constant block

    def header(stype: int) -> None:
        w.write(0, 1)
        w.write(stype, 6)
        if wasted_bits:
            w.write(1, 1)
            w.unary(wasted_bits - 1)
        else:
            w.write(0, 1)

    if kind == "constant":
        header(0)
        w.write(vals[0], eff)
        return
    if kind == "verbatim":
        header(1)
        for v in vals:
            w.write(v, eff)
        return
    if kind == "fixed":
        order = min(fixed_order, bs)
        header(8 + order)
        for v in vals[:order]:
            w.write(v, eff)
        coefs = _FIXED_COEFS[order]
        res = [
            vals[i] - sum(c * vals[i - 1 - j] for j, c in enumerate(coefs))
            for i in range(order, bs)
        ]
        _write_residual(w, res, bs, order, porder, method, escape_raw)
        return
    # LPC
    order = len(lpc_coefs)
    assert 1 <= order <= 32 and order <= bs
    header(32 + order - 1)
    for v in vals[:order]:
        w.write(v, eff)
    precision = 15
    w.write(precision - 1, 4)
    w.write(lpc_shift, 5)
    for c in lpc_coefs:
        w.write(c, precision)
    res = [
        vals[i]
        - (sum(c * vals[i - 1 - j] for j, c in enumerate(lpc_coefs))
           >> lpc_shift)
        for i in range(order, bs)
    ]
    _write_residual(w, res, bs, order, porder, method, escape_raw)
