"""CCITT Group 4 (ITU-T T.6) two-dimensional MMR codec — pure stdlib.

G4 is THE compression scanned faxes and bilevel document scans arrive
in (TIFF Compression=4) — precisely the payload class an OCR ingest
meets; the reference loads such scans through cv2
(core/pipelines/loaders/image_loader.py:20-31).  This closes the last
stdlib-feasible gap in the pixel-decode surface: T.6 is a pure bit
algorithm (no DSP), implemented here from the public spec.

Coding model (T.6 §2.2): each line is coded against the line above
(reference line; an imaginary all-white line above row 0) in terms of
*changing elements* — positions where the colour flips:

- a0: reference position on the coding line (starts just left of the
  line), with its current colour; a1 = next coding-line change; a2 =
  the one after.
- b1: first reference-line change right of a0 whose NEW colour is
  opposite to a0's colour (same new colour as a1); b2 = the next
  reference-line change after b1.
- Pass mode (0001): b2 lies left of a1 — jump a0 under b2.
- Vertical modes (V0=1, VR1=011, VR2=000011, VR3=0000011, VL1=010,
  VL2=000010, VL3=0000010): a1 = b1 + d, d in -3..3.
- Horizontal mode (001 + M(a0a1) + M(a1a2)): two run lengths in the
  one-dimensional T.4 modified-Huffman alphabet (per-colour
  terminating codes 0-63, per-colour make-ups 64-1728, shared extended
  make-ups 1792-2560).
- EOFB (000000000001 ×2) terminates the block.

Both directions are implemented from the same single table source (the
decoder tree is built from the encoder table), with a deterministic
encoder so the sandbox — which has no image libraries — can generate
real G4 fixtures whose decode is checksum-pinned.  Round-trips exercise
every terminating code and every make-up boundary; external
conformance vectors can't be run in this container (no Pillow/libtiff),
which the tests note explicitly.

Malformed input returns None (no-raise decode contract shared with the
other codecs): exhausted bits, non-monotone transitions, impossible
vertical offsets and extension codes all reject, and the per-line work
is bounded by the declared width so crafted input cannot loop.
"""

from __future__ import annotations

from bisect import bisect_right

# ---------------------------------------------------------------------
# ITU-T T.4 modified-Huffman run-length alphabet (public spec tables)
# ---------------------------------------------------------------------

# run length -> (code value, code bit-length); MSB-first
WHITE_CODES: dict[int, tuple[int, int]] = {
    0: (0b00110101, 8), 1: (0b000111, 6), 2: (0b0111, 4), 3: (0b1000, 4),
    4: (0b1011, 4), 5: (0b1100, 4), 6: (0b1110, 4), 7: (0b1111, 4),
    8: (0b10011, 5), 9: (0b10100, 5), 10: (0b00111, 5), 11: (0b01000, 5),
    12: (0b001000, 6), 13: (0b000011, 6), 14: (0b110100, 6),
    15: (0b110101, 6), 16: (0b101010, 6), 17: (0b101011, 6),
    18: (0b0100111, 7), 19: (0b0001100, 7), 20: (0b0001000, 7),
    21: (0b0010111, 7), 22: (0b0000011, 7), 23: (0b0000100, 7),
    24: (0b0101000, 7), 25: (0b0101011, 7), 26: (0b0010011, 7),
    27: (0b0100100, 7), 28: (0b0011000, 7), 29: (0b00000010, 8),
    30: (0b00000011, 8), 31: (0b00011010, 8), 32: (0b00011011, 8),
    33: (0b00010010, 8), 34: (0b00010011, 8), 35: (0b00010100, 8),
    36: (0b00010101, 8), 37: (0b00010110, 8), 38: (0b00010111, 8),
    39: (0b00101000, 8), 40: (0b00101001, 8), 41: (0b00101010, 8),
    42: (0b00101011, 8), 43: (0b00101100, 8), 44: (0b00101101, 8),
    45: (0b00000100, 8), 46: (0b00000101, 8), 47: (0b00001010, 8),
    48: (0b00001011, 8), 49: (0b01010010, 8), 50: (0b01010011, 8),
    51: (0b01010100, 8), 52: (0b01010101, 8), 53: (0b00100100, 8),
    54: (0b00100101, 8), 55: (0b01011000, 8), 56: (0b01011001, 8),
    57: (0b01011010, 8), 58: (0b01011011, 8), 59: (0b01001010, 8),
    60: (0b01001011, 8), 61: (0b00110010, 8), 62: (0b00110011, 8),
    63: (0b00110100, 8),
    # make-up codes
    64: (0b11011, 5), 128: (0b10010, 5), 192: (0b010111, 6),
    256: (0b0110111, 7), 320: (0b00110110, 8), 384: (0b00110111, 8),
    448: (0b01100100, 8), 512: (0b01100101, 8), 576: (0b01101000, 8),
    640: (0b01100111, 8), 704: (0b011001100, 9), 768: (0b011001101, 9),
    832: (0b011010010, 9), 896: (0b011010011, 9), 960: (0b011010100, 9),
    1024: (0b011010101, 9), 1088: (0b011010110, 9),
    1152: (0b011010111, 9), 1216: (0b011011000, 9),
    1280: (0b011011001, 9), 1344: (0b011011010, 9),
    1408: (0b011011011, 9), 1472: (0b010011000, 9),
    1536: (0b010011001, 9), 1600: (0b010011010, 9), 1664: (0b011000, 6),
    1728: (0b010011011, 9),
}

BLACK_CODES: dict[int, tuple[int, int]] = {
    0: (0b0000110111, 10), 1: (0b010, 3), 2: (0b11, 2), 3: (0b10, 2),
    4: (0b011, 3), 5: (0b0011, 4), 6: (0b0010, 4), 7: (0b00011, 5),
    8: (0b000101, 6), 9: (0b000100, 6), 10: (0b0000100, 7),
    11: (0b0000101, 7), 12: (0b0000111, 7), 13: (0b00000100, 8),
    14: (0b00000111, 8), 15: (0b000011000, 9), 16: (0b0000010111, 10),
    17: (0b0000011000, 10), 18: (0b0000001000, 10),
    19: (0b00001100111, 11), 20: (0b00001101000, 11),
    21: (0b00001101100, 11), 22: (0b00000110111, 11),
    23: (0b00000101000, 11), 24: (0b00000010111, 11),
    25: (0b00000011000, 11), 26: (0b000011001010, 12),
    27: (0b000011001011, 12), 28: (0b000011001100, 12),
    29: (0b000011001101, 12), 30: (0b000001101000, 12),
    31: (0b000001101001, 12), 32: (0b000001101010, 12),
    33: (0b000001101011, 12), 34: (0b000011010010, 12),
    35: (0b000011010011, 12), 36: (0b000011010100, 12),
    37: (0b000011010101, 12), 38: (0b000011010110, 12),
    39: (0b000011010111, 12), 40: (0b000001101100, 12),
    41: (0b000001101101, 12), 42: (0b000011011010, 12),
    43: (0b000011011011, 12), 44: (0b000001010100, 12),
    45: (0b000001010101, 12), 46: (0b000001010110, 12),
    47: (0b000001010111, 12), 48: (0b000001100100, 12),
    49: (0b000001100101, 12), 50: (0b000001010010, 12),
    51: (0b000001010011, 12), 52: (0b000000100100, 12),
    53: (0b000000110111, 12), 54: (0b000000111000, 12),
    55: (0b000000100111, 12), 56: (0b000000101000, 12),
    57: (0b000001011000, 12), 58: (0b000001011001, 12),
    59: (0b000000101011, 12), 60: (0b000000101100, 12),
    61: (0b000001011010, 12), 62: (0b000001100110, 12),
    63: (0b000001100111, 12),
    # make-up codes
    64: (0b0000001111, 10), 128: (0b000011001000, 12),
    192: (0b000011001001, 12), 256: (0b000001011011, 12),
    320: (0b000000110011, 12), 384: (0b000000110100, 12),
    448: (0b000000110101, 12), 512: (0b0000001101100, 13),
    576: (0b0000001101101, 13), 640: (0b0000001001010, 13),
    704: (0b0000001001011, 13), 768: (0b0000001001100, 13),
    832: (0b0000001001101, 13), 896: (0b0000001110010, 13),
    960: (0b0000001110011, 13), 1024: (0b0000001110100, 13),
    1088: (0b0000001110101, 13), 1152: (0b0000001110110, 13),
    1216: (0b0000001110111, 13), 1280: (0b0000001010010, 13),
    1344: (0b0000001010011, 13), 1408: (0b0000001010100, 13),
    1472: (0b0000001010101, 13), 1536: (0b0000001011010, 13),
    1600: (0b0000001011011, 13), 1664: (0b0000001100100, 13),
    1728: (0b0000001100101, 13),
}

# extended make-ups, shared by both colours (T.4 Table 3)
EXT_CODES: dict[int, tuple[int, int]] = {
    1792: (0b00000001000, 11), 1856: (0b00000001100, 11),
    1920: (0b00000001101, 11), 1984: (0b000000010010, 12),
    2048: (0b000000010011, 12), 2112: (0b000000010100, 12),
    2176: (0b000000010101, 12), 2240: (0b000000010110, 12),
    2304: (0b000000010111, 12), 2368: (0b000000011100, 12),
    2432: (0b000000011101, 12), 2496: (0b000000011110, 12),
    2560: (0b000000011111, 12),
}

_RUN_CODES = (
    {**WHITE_CODES, **EXT_CODES},  # colour 0 = white
    {**BLACK_CODES, **EXT_CODES},  # colour 1 = black
)

# decoder trees built from the SAME tables: (bits, code) -> run length
_RUN_TREES = tuple(
    {(n, c): run for run, (c, n) in table.items()} for table in _RUN_CODES
)

# two-dimensional mode codes
_MODE_CODES = {
    "P": (0b0001, 4),
    "H": (0b001, 3),
    0: (0b1, 1),
    1: (0b011, 3),
    2: (0b000011, 6),
    3: (0b0000011, 7),
    -1: (0b010, 3),
    -2: (0b000010, 6),
    -3: (0b0000010, 7),
}
_MODE_TREE = {(n, c): m for m, (c, n) in _MODE_CODES.items()}
_EOFB = (0b000000000001000000000001, 24)


class _BitWriter:
    def __init__(self) -> None:
        self._acc = 0
        self._n = 0
        self._out = bytearray()

    def put(self, code: int, nbits: int) -> None:
        self._acc = (self._acc << nbits) | code
        self._n += nbits
        while self._n >= 8:
            self._out.append((self._acc >> (self._n - 8)) & 0xFF)
            self._n -= 8
            self._acc &= (1 << self._n) - 1

    def byte_align(self) -> None:
        """Zero-pad to the next byte boundary (TIFF Compression=2 rows
        each begin on a byte boundary)."""
        if self._n:
            self._out.append((self._acc << (8 - self._n)) & 0xFF)
            self._acc = self._n = 0

    def flush(self) -> bytes:
        self.byte_align()
        return bytes(self._out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self._d = data
        self._pos = 0  # bit position

    def bit(self) -> int:
        p = self._pos
        if p >> 3 >= len(self._d):
            raise ValueError("bit stream exhausted")
        self._pos = p + 1
        return (self._d[p >> 3] >> (7 - (p & 7))) & 1

    def byte_align(self) -> None:
        self._pos = (self._pos + 7) & ~7


def _read_mode(br: _BitReader):
    """Next 2-D mode, or 'EOFB' at block end; extension codes reject."""
    code, n = 0, 0
    while n < 7:
        code = (code << 1) | br.bit()
        n += 1
        m = _MODE_TREE.get((n, code))
        if m is not None:
            return m
    # 7 bits, no match: either 0000000... (EOFB prefix) or 0000001
    # (extension — unsupported)
    if code == 0b0000001:
        raise ValueError("T.6 extension code")
    # consume up to the full 24-bit EOFB; tolerate the byte-aligned
    # zero padding some writers insert before it
    zeros = n - 1  # current run of zeros after the leading bit pattern
    if code != 0:
        raise ValueError("bad mode code")
    while True:
        bval = br.bit()
        if bval == 1:
            break
        zeros += 1
        if zeros > 64:
            raise ValueError("runaway zero fill")
    return "EOFB"


def _read_run(br: _BitReader, color: int, limit: int) -> int:
    """One MH run: zero or more make-ups then a terminating code.
    *limit* (the line width) bounds both the total and the number of
    chained make-ups — a legal run can chain ~limit/2560 max-length
    make-ups (wide ledger/panorama scans), while corrupt input that
    never terminates is cut off."""
    tree = _RUN_TREES[color]
    total = 0
    for _ in range(limit // 2560 + 2):
        code, n = 0, 0
        while n < 14:
            code = (code << 1) | br.bit()
            n += 1
            run = tree.get((n, code))
            if run is not None:
                break
        else:
            raise ValueError("bad run code")
        total += run
        if total > limit:
            raise ValueError("run exceeds line width")
        if run < 64:  # terminating code ends the run
            return total
    raise ValueError("make-up chain too long")


def _b1b2(ref: list[int], a0: int, color: int, w: int) -> tuple[int, int]:
    """b1/b2 per T.6: first reference change right of a0 whose NEW
    colour is opposite a0's colour (ref transition i flips to black
    iff i is even — lines start white), and the change after it;
    both default to w."""
    i = bisect_right(ref, a0)
    if (i % 2 == 0) != (color == 0):
        i += 1
    b1 = ref[i] if i < len(ref) else w
    b2 = ref[i + 1] if i + 1 < len(ref) else w
    return b1, b2


def _line_to_runs(cur: list[int], w: int, row: bytearray) -> None:
    """Materialize a transitions list as 0/1 bytes into *row*."""
    color = 0
    prev = 0
    for t in cur:
        if t > prev and color:
            for k in range(prev, min(t, w)):
                row[k] = 1
        prev = t
        color ^= 1
        if prev >= w:
            return
    if color:
        for k in range(prev, w):
            row[k] = 1


def _decode_2d_line(br: _BitReader, ref: list[int], w: int) -> list[int]:
    """One two-dimensional coded line (shared by T.6 and T.4 2-D /
    MR) → transitions list.  Raises ValueError on malformation; work is
    bounded at w+2 coding ops (each op strictly advances a0)."""
    cur: list[int] = []
    a0 = -1
    color = 0
    ops = 0
    while a0 < w:
        ops += 1
        if ops > w + 2:
            raise ValueError("no legal line needs more ops")
        b1, b2 = _b1b2(ref, a0, color, w)
        m = _read_mode(br)
        if m == "EOFB":
            raise ValueError("terminator/EOL inside a line")
        if m == "P":
            if b2 <= a0:
                raise ValueError("pass does not advance")
            a0 = b2
        elif m == "H":
            r1 = _read_run(br, color, w)
            r2 = _read_run(br, 1 - color, w)
            a1 = (a0 if a0 > 0 else 0) + r1
            a2 = a1 + r2
            if a2 > w or (cur and a1 <= cur[-1]):
                raise ValueError("non-monotone horizontal")
            cur.append(a1)
            cur.append(a2)
            a0 = a2
        else:  # vertical, m = a1 - b1 in -3..3
            a1 = b1 + m
            if a1 < 0 or a1 > w or (cur and a1 <= cur[-1]):
                raise ValueError("non-monotone vertical")
            cur.append(a1)
            a0 = a1
            color ^= 1
    return cur


def _decode_mh_line(br: _BitReader, w: int) -> list[int]:
    """One one-dimensional modified-Huffman line (T.4 1-D) →
    transitions list.  Runs alternate white/black starting white and
    must sum to exactly *w*; a zero run is legal only first (a line
    that starts black).  Raises ValueError on malformation."""
    cur: list[int] = []
    pos = 0
    color = 0
    for _ in range(w + 2):
        if pos >= w:
            return cur
        run = _read_run(br, color, w - pos)
        if run == 0 and cur:
            raise ValueError("zero run after the first")
        pos += run
        cur.append(pos)
        color ^= 1
    raise ValueError("line never reaches width")


def g4_decode(data: bytes, w: int, h: int) -> bytes | None:
    """T.6 bit stream → *w*×*h* bytes (1 = black), or None on any
    malformation.  Work is bounded: ≤ w+2 coding ops per line (each op
    strictly advances a0), h lines, then EOFB/padding is ignored."""
    if w <= 0 or h <= 0:
        return None
    try:
        br = _BitReader(data)
        out = bytearray(w * h)
        ref: list[int] = []  # imaginary all-white line above row 0
        for y in range(h):
            cur = _decode_2d_line(br, ref, w)
            _line_to_runs(cur, w, memoryview(out)[y * w:(y + 1) * w])
            ref = [t for t in cur if t < w]
        return bytes(out)
    except (ValueError, IndexError):
        return None


def _read_eol(br: _BitReader) -> None:
    """Consume one T.4 EOL (000000000001), tolerating leading fill
    zeros (T4Options byte-alignment); ≥11 zeros then a 1."""
    zeros = 0
    while True:
        if br.bit():
            break
        zeros += 1
        if zeros > 64:
            raise ValueError("runaway fill before EOL")
    if zeros < 11:
        raise ValueError("bad EOL")


def g3_1d_decode(data: bytes, w: int, h: int) -> bytes | None:
    """TIFF Compression=2 ("CCITT modified Huffman RLE"): every row is
    an independent 1-D MH line, no EOLs, each row byte-aligned.
    → *w*×*h* bytes (1 = black), or None on malformation."""
    if w <= 0 or h <= 0:
        return None
    try:
        br = _BitReader(data)
        out = bytearray(w * h)
        for y in range(h):
            br.byte_align()
            cur = _decode_mh_line(br, w)
            _line_to_runs(cur, w, memoryview(out)[y * w:(y + 1) * w])
        return bytes(out)
    except (ValueError, IndexError):
        return None


def g3_decode(
    data: bytes, w: int, h: int, two_d: bool = False
) -> bytes | None:
    """CCITT Group 3 / ITU-T T.4 (TIFF Compression=3): every line is
    preceded by an EOL (fill-tolerant); with *two_d* (T4Options bit 0)
    a tag bit after each EOL selects 1-D MH (1) or 2-D MR (0) coding
    for that line — MR shares T.6's mode alphabet minus pass-through
    to EOFB.  → *w*×*h* bytes (1 = black), or None on malformation."""
    if w <= 0 or h <= 0:
        return None
    try:
        br = _BitReader(data)
        out = bytearray(w * h)
        ref: list[int] = []
        for y in range(h):
            _read_eol(br)
            if two_d:
                if br.bit():
                    cur = _decode_mh_line(br, w)
                else:
                    cur = _decode_2d_line(br, ref, w)
            else:
                cur = _decode_mh_line(br, w)
            _line_to_runs(cur, w, memoryview(out)[y * w:(y + 1) * w])
            ref = [t for t in cur if t < w]
        return bytes(out)
    except (ValueError, IndexError):
        return None


def _emit_run(bw: _BitWriter, n: int, color: int) -> None:
    table = _RUN_CODES[color]
    while n >= 2624:  # chain max-length make-ups for very long runs
        code, bits = table[2560]
        bw.put(code, bits)
        n -= 2560
    if n >= 64:
        makeup = (n // 64) * 64
        code, bits = table[makeup]
        bw.put(code, bits)
        n -= makeup
    code, bits = table[n]
    bw.put(code, bits)


def _transitions(row: bytes, w: int) -> list[int]:
    """Colour-change positions of a pixel row (nonzero = black);
    strictly increasing, all < w, starting colour white."""
    return [
        x
        for x in range(w)
        if (x == 0 and row[0]) or (x > 0 and bool(row[x]) != bool(row[x - 1]))
    ]


def _encode_2d_line(
    bw: _BitWriter, cur: list[int], ref: list[int], w: int
) -> None:
    """One two-dimensional coded line (shared by T.6 and T.4 2-D).
    Mode choice follows the spec's coding procedure (pass when
    b2 < a1, vertical within ±3, else horizontal)."""
    a0 = -1
    color = 0
    while a0 < w:
        b1, b2 = _b1b2(ref, a0, color, w)
        j = bisect_right(cur, a0)
        a1 = cur[j] if j < len(cur) else w
        if b2 < a1:
            code, bits = _MODE_CODES["P"]
            bw.put(code, bits)
            a0 = b2
        elif abs(a1 - b1) <= 3:
            code, bits = _MODE_CODES[a1 - b1]
            bw.put(code, bits)
            a0 = a1
            color ^= 1
        else:
            a2 = cur[j + 1] if j + 1 < len(cur) else w
            code, bits = _MODE_CODES["H"]
            bw.put(code, bits)
            _emit_run(bw, a1 - (a0 if a0 > 0 else 0), color)
            _emit_run(bw, a2 - a1, 1 - color)
            a0 = a2


def _encode_mh_line(bw: _BitWriter, cur: list[int], w: int) -> None:
    """One one-dimensional MH line from a transitions list: runs
    alternate white/black starting white (a line starting black gets a
    zero-length white run, as T.4 prescribes) and sum to *w*."""
    prev = 0
    color = 0
    for t in cur:
        _emit_run(bw, t - prev, color)
        prev = t
        color ^= 1
    _emit_run(bw, w - prev, color)


def g4_encode(pixels: bytes, w: int, h: int) -> bytes:
    """*w*×*h* bytes (nonzero = black) → T.6 stream + EOFB,
    byte-padded."""
    bw = _BitWriter()
    ref: list[int] = []
    for y in range(h):
        cur = _transitions(pixels[y * w:(y + 1) * w], w)
        _encode_2d_line(bw, cur, ref, w)
        ref = cur
    bw.put(*_EOFB)
    return bw.flush()


def g3_1d_encode(pixels: bytes, w: int, h: int) -> bytes:
    """*w*×*h* bytes (nonzero = black) → TIFF Compression=2 stream:
    independent MH rows, each beginning on a byte boundary, no EOLs."""
    bw = _BitWriter()
    for y in range(h):
        _encode_mh_line(bw, _transitions(pixels[y * w:(y + 1) * w], w), w)
        bw.byte_align()
    return bw.flush()


_EOL = (0b000000000001, 12)


def g3_encode(
    pixels: bytes, w: int, h: int, two_d: bool = False, k: int = 4
) -> bytes:
    """*w*×*h* bytes (nonzero = black) → T.4 / Group 3 stream (TIFF
    Compression=3): EOL before every line; with *two_d*, a tag bit per
    line and a 1-D key line every *k* lines (fax K-factor — bounds
    error propagation on a real wire) with MR-coded lines between.  No
    RTC trailer, per TIFF practice (strips end after the last line)."""
    bw = _BitWriter()
    ref: list[int] = []
    for y in range(h):
        bw.put(*_EOL)
        cur = _transitions(pixels[y * w:(y + 1) * w], w)
        if two_d:
            one_d = y % max(k, 1) == 0
            bw.put(1 if one_d else 0, 1)
            if one_d:
                _encode_mh_line(bw, cur, w)
            else:
                _encode_2d_line(bw, cur, ref, w)
        else:
            _encode_mh_line(bw, cur, w)
        ref = cur
    return bw.flush()
