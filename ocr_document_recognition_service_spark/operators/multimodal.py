"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns exactly like ``html``
does in the pages table.  The Spark-side plumbing — schema, format
sniffing, Arrow batch shape, partition behavior — is real and tested.
Header metadata (PNG/GIF/JPEG/BMP dims, WAV chunks) is REAL stdlib
parsing; ``decode_image_pixels`` REALLY decodes uncompressed 24-bit
BMP, 8-bit PNG (grey/RGB/paletted; zlib IDAT + filter reversal + PLTE
lookup) JPEG — baseline, progressive (SOF2, spectral selection +
successive approximation) AND lossless (SOF3, T.81 Annex H predictive,
r6), grey + YCbCr colour at any sampling, see ``operators.jpeg`` —
GIF (LZW + palette, interlace) and TIFF (``operators.tiff``: strips,
PackBits/TIFF-LZW, predictor 2, all four photometrics, bilevel
packed-bits AND CCITT G3 (T.4 MH/MR) + G4 (T.6 MMR) fax
(``operators.g4fax``) — the scanned-document formats the reference's
OCR loaders ingest) with stdlib+numpy alone, and flips to Pillow for
everything else when importable (import-try gate); Adam7-interlaced
and 16-bit PNG (high-byte reduction) decode for real too.  WAV
PCM8/PCM16 samples decode for real (duration/peak/RMS/md5, r6), and
MJPEG-in-AVI frames decode for real through the repo's own JPEG stack
(r6); sequential arithmetic-coded JPEG (SOF9) decodes for real via
the QM-coder in ``operators.jpeg_arith`` (r6), and 12-bit (SOF1,
16-bit DQT) and Adobe CMYK/YCCK JPEG decode for real too (r6).
G.711 mu-law/A-law and IMA ADPCM WAV audio decode for real via
``operators.audio`` (r6), and progressive-arithmetic (SOF10) and
HIERARCHICAL (Annex J, ``operators.jpeg_hier`` — greyscale AND
4:4:4 colour pyramids) JPEG join the decoded set (r6) — every T.81
coding mode now decodes for real.  Only formats beyond all paths
(subsampled-colour hierarchical JPEG, compressed-codec video like
H.264/VP9/AV1, perceptual audio codecs like mp3/ogg — FLAC is
lossless and decodes for real via ``operators/flac.py``, r6) remain
the loudly-marked
``NotImplementedError``/deterministic-fake stub — the one concession
to this container having no image/audio libs.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

# magic-byte prefixes → format label, as native expressions (no UDF)
_MAGICS = [
    ("89504e47", "png"),
    ("ffd8ff", "jpeg"),
    ("47494638", "gif"),
    ("25504446", "pdf"),
    ("52494646", "riff"),  # wav/avi container
    ("494433", "mp3"),
    ("424d", "bmp"),
    ("49492a00", "tiff"),
    ("4d4d002a", "tiff"),
]


def media_format_col(col: str = "payload") -> F.Column:
    """Format sniff by magic bytes — JVM-side, codegen-friendly."""
    h = F.lower(F.hex(F.substring(F.col(col), 1, 4)))
    expr = F.lit("unknown")
    for magic, label in reversed(_MAGICS):
        expr = F.when(h.startswith(magic.lower()), F.lit(label)).otherwise(expr)
    return expr


def media_meta(df: DataFrame, col: str = "payload") -> DataFrame:
    return df.withColumn("n_bytes", F.length(F.col(col))).withColumn(
        "format", media_format_col(col)
    )


IMAGE_META_TYPE = StructType(
    [
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("mode", StringType(), True),
        StructField("decoder", StringType(), True),
    ]
)


def _try_pillow():
    try:
        from PIL import Image  # noqa: F401

        return Image
    except Exception:
        return None


def _fake_dims(payload: bytes) -> tuple[int, int]:
    """Deterministic fake: dimensions derived from the content hash —
    stable across runs/partitions, so downstream plumbing is testable."""
    h = hashlib.md5(payload).digest()
    return 64 + h[0] % 192, 64 + h[1] % 192


_PNG_MODES = {0: "L", 2: "RGB", 3: "P", 4: "LA", 6: "RGBA"}
_JPEG_MODES = {1: "L", 3: "RGB", 4: "CMYK"}
# SOF0..SOF15 minus DHT(C4)/JPG(C8)/DAC(CC), per ITU T.81 B.2.2
_JPEG_SOF = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


def parse_image_header(b: bytes) -> tuple[int, int, str] | None:
    """(width, height, mode) from header bytes alone — pure stdlib, no
    image library.  PNG IHDR / GIF logical screen descriptor / JPEG SOF
    frame header; None for other formats or malformed headers."""
    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 26 and b[12:16] == b"IHDR":
        w = int.from_bytes(b[16:20], "big")
        h = int.from_bytes(b[20:24], "big")
        mode = _PNG_MODES.get(b[25])
        if w and h and mode:
            return w, h, mode
        return None
    if b[:2] == b"BM" and len(b) >= 34:
        w = int.from_bytes(b[18:22], "little", signed=True)
        h = abs(int.from_bytes(b[22:26], "little", signed=True))
        bpp = int.from_bytes(b[28:30], "little")
        mode = {24: "RGB", 32: "RGBA", 8: "P", 1: "1"}.get(bpp)
        return (w, h, mode) if w > 0 and h and mode else None
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        w = int.from_bytes(b[6:8], "little")
        h = int.from_bytes(b[8:10], "little")
        return (w, h, "P") if w and h else None
    if b[:3] == b"\xff\xd8\xff":
        i = 2
        n = len(b)
        while i + 9 < n:
            if b[i] != 0xFF:  # desynced — not a valid marker stream
                return None
            marker = b[i + 1]
            if marker == 0xFF:  # fill byte
                i += 1
                continue
            if 0xD0 <= marker <= 0xD9:  # standalone RST/SOI/EOI
                i += 2
                continue
            seg_len = int.from_bytes(b[i + 2:i + 4], "big")
            if marker in _JPEG_SOF:
                h = int.from_bytes(b[i + 5:i + 7], "big")
                w = int.from_bytes(b[i + 7:i + 9], "big")
                mode = _JPEG_MODES.get(b[i + 9], "RGB")
                return (w, h, mode) if w and h else None
            if seg_len < 2:
                return None
            i += 2 + seg_len
        return None
    return None


def decode_image_meta(df: DataFrame, col: str = "payload") -> DataFrame:
    """Arrow-batched image metadata decode.

    PNG/GIF/JPEG dimensions come from REAL header parsing (stdlib, see
    ``parse_image_header``, ``decoder='header'``); Pillow handles other
    formats when importable; the deterministic fake (``decoder='stub'``)
    remains only for formats neither path can read.  Pixel extraction
    is intentionally NOT implemented in the sandbox — see
    ``decode_image_pixels``.
    """

    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf(IMAGE_META_TYPE)
    def decode(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        pil = _try_pillow()
        for payloads in batches:
            rows = []
            for p in payloads:
                if p is None:
                    rows.append((None, None, None, None))
                    continue
                b = bytes(p)
                hdr = parse_image_header(b)
                if hdr is not None:
                    rows.append((*hdr, "header"))
                    continue
                if pil is not None:
                    import io

                    try:
                        with pil.open(io.BytesIO(b)) as im:
                            rows.append((im.width, im.height, im.mode, "pillow"))
                            continue
                    except Exception:
                        pass
                w, h = _fake_dims(b)
                rows.append((w, h, "RGB", "stub"))
            yield pd.DataFrame(rows, columns=["width", "height", "mode", "decoder"])

    return df.withColumn("image_meta", decode(F.col(col)))


AUDIO_META_TYPE = StructType(
    [
        StructField("sample_rate", IntegerType(), True),
        StructField("channels", IntegerType(), True),
        StructField("bits", IntegerType(), True),
        StructField("n_samples", IntegerType(), True),
        StructField("duration_sec", DoubleType(), True),
        StructField("peak", DoubleType(), True),
        StructField("rms", DoubleType(), True),
        StructField("sample_md5", StringType(), True),
        StructField("decoder", StringType(), True),
    ]
)


def parse_wav(
    b: bytes,
) -> tuple[int, int, int, int, int, int, int, int] | None:
    """Full RIFF/WAVE chunk walk — pure stdlib, no audio library.
    Returns ``(sample_rate, channels, bits, n_samples, audio_format,
    data_off, data_len, block_align)`` where ``data_off``/``data_len``
    locate the data chunk's bytes actually PRESENT in the payload (a
    declared size past the end of a truncated payload is clipped).
    ``n_samples`` is the FRAME count: bytes/block for sample-per-block
    formats, block geometry clipped to the ``fact`` chunk for IMA
    ADPCM (whose final block is writer-padded).  None for non-WAV or
    malformed payloads."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    pos, n = 12, len(b)
    fmt = None
    data_off = data_size = fact_samples = None
    while pos + 8 <= n:
        cid = b[pos:pos + 4]
        size = int.from_bytes(b[pos + 4:pos + 8], "little")
        body = b[pos + 8:pos + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            audio_format = int.from_bytes(body[0:2], "little")
            channels = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            block_align = int.from_bytes(body[12:14], "little")
            bits = int.from_bytes(body[14:16], "little")
            fmt = (rate, channels, bits, block_align, audio_format)
        elif cid == b"fact" and len(body) >= 4:
            # true frame count for block/compressed formats (the data
            # area over-counts: final ADPCM block is writer-padded)
            fact_samples = int.from_bytes(body[0:4], "little")
        elif cid == b"data":
            data_off = pos + 8
            data_size = min(size, n - data_off)
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data_size is None:
        return None
    rate, channels, bits, block_align, audio_format = fmt
    if not (rate and channels and bits and block_align):
        return None
    if audio_format == 0x11:
        # IMA ADPCM: block_align covers many frames — count from block
        # geometry, then clip to the fact chunk's true frame count
        from . import audio as _audio

        if block_align < 8 * channels or block_align % (4 * channels):
            return None
        n_samples = _audio.ima_frame_count(data_size, channels, block_align)
        if fact_samples is not None:
            n_samples = min(n_samples, fact_samples)
    else:
        n_samples = data_size // block_align
        if fact_samples is not None and audio_format != 1:
            n_samples = min(n_samples, fact_samples)
    return (
        rate,
        channels,
        bits,
        n_samples,
        audio_format,
        data_off,
        data_size,
        block_align,
    )


def parse_wav_header(b: bytes) -> tuple[int, int, int, int] | None:
    """(sample_rate, channels, bits, n_samples) — header-only view of
    ``parse_wav`` kept for callers that don't need sample access."""
    full = parse_wav(b)
    return None if full is None else full[:4]


def decode_wav_samples(
    b: bytes,
    parsed: tuple[int, int, int, int, int, int, int, int] | None = None,
) -> tuple[int, int, int, int, float, float, float, str, str] | None:
    """Real sample decode over the data chunk ``parse_wav`` locates:
    ``(rate, channels, bits, n_frames, duration_sec, peak, rms,
    sample_md5, codec)``, or None when the payload's samples are not
    decodable here (non-WAV, IEEE-float WAV, exotic bit depths,
    perceptual codecs — those stay header-only).  Decoded formats:
    PCM8/PCM16 (``codec='pcm'``), G.711 mu-law/A-law (``'ulaw'`` /
    ``'alaw'``) and IMA ADPCM (``'adpcm'`` — block-lockstep numpy, see
    ``operators/audio.py``).  peak/rms are normalized to full scale in
    [0, 1]; n_frames/duration reflect the samples actually present
    (truncated payloads clip; ADPCM writer-padding clips to the fact
    chunk).  ``sample_md5`` certifies the decode: raw data bytes for
    PCM (decode is identity modulo dtype), DECODED int16-LE bytes for
    the compressed codecs.  *parsed* lets a caller that already ran
    ``parse_wav`` skip the second chunk walk (the batched UDF hot
    loop).  Analog of the reference's loader-stage contract
    (core/pipelines/loaders/image_loader.py:20-31) for the audio
    modality: decode-on-ingest, emit per-item stats."""
    import numpy as np

    from . import audio as _audio

    full = parse_wav(b) if parsed is None else parsed
    if full is None:
        return None
    (rate, channels, bits, n_samples, audio_format,
     data_off, data_len, block_align) = full
    if audio_format == 1 and bits in (8, 16):
        block = channels * bits // 8
        n_frames = data_len // block
        raw = b[data_off:data_off + n_frames * block]
        if bits == 16:
            x = np.frombuffer(raw, dtype="<i2").astype(np.float64)
            full_scale = 32768.0
        else:
            x = np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0
            full_scale = 128.0
        md5 = hashlib.md5(raw).hexdigest()
        codec = "pcm"
    elif audio_format in (6, 7) and bits == 8:
        # G.711: one byte per sample per channel, table decode to
        # int16; n_samples carries parse_wav's fact-chunk clip (fact
        # is authoritative for non-PCM WAV — writers pad data chunks),
        # so stats/md5 must not include the padding either
        n_frames = min(data_len // channels, n_samples)
        raw = b[data_off:data_off + n_frames * channels]
        dec = _audio.g711_decode(raw, "alaw" if audio_format == 6 else "ulaw")
        x = dec.astype(np.float64)
        full_scale = 32768.0
        md5 = hashlib.md5(dec.astype("<i2").tobytes()).hexdigest()
        codec = "alaw" if audio_format == 6 else "ulaw"
    elif audio_format == 0x11 and bits == 4:
        frames = _audio.ima_adpcm_decode(
            b[data_off:data_off + data_len], channels, block_align
        )
        if frames is None:
            return None
        frames = frames[:n_samples]  # fact-chunk clip of writer padding
        n_frames = frames.shape[0]
        x = frames.astype(np.float64).reshape(-1)
        full_scale = 32768.0
        md5 = hashlib.md5(frames.astype("<i2").tobytes()).hexdigest()
        codec = "adpcm"
    else:
        return None
    if x.size:
        peak = float(np.max(np.abs(x)) / full_scale)
        rms = float(np.sqrt(np.mean(x * x)) / full_scale)
    else:
        peak = rms = 0.0
    return (
        rate,
        channels,
        bits,
        n_frames,
        n_frames / rate,
        peak,
        rms,
        md5,
        codec,
    )


def synthetic_wav_payload(i: int) -> bytes:
    """Deterministic minimal WAV: valid RIFF/fmt/data chunks, junk
    samples — exercises the real sample-decode paths.  Variants:
    PCM16 (default), IEEE-float format 3 (``i % 8 == 6``, header-only
    downstream), G.711 mu-law / A-law and IMA ADPCM (``i % 11 in
    (7, 9, 10)`` — junk PCM16 run through the repo's own encoders, so
    decode is real), PCM8 (``i % 5 == 4``)."""
    import numpy as np

    from . import audio as _audio

    rate = (8000, 16000, 44100)[i % 3]
    channels = 1 + i % 2
    n_samples = 100 + (i * 37) % 900
    audio_format, bits = 1, 16
    if i % 8 == 6:
        audio_format, bits = 3, 32
    elif i % 11 == 7:
        audio_format, bits = 7, 8  # G.711 mu-law
    elif i % 11 == 9:
        audio_format, bits = 6, 8  # G.711 A-law
    elif i % 11 == 10:
        audio_format, bits = 0x11, 4  # IMA ADPCM
    elif i % 5 == 4:
        bits = 8
    def junk(n_bytes: int) -> bytes:
        return (hashlib.md5(str(i).encode()).digest()
                * (n_bytes // 16 + 1))[:n_bytes]

    fact = b""
    if audio_format in (6, 7, 0x11):
        # junk PCM16 run through the repo's own encoders — real decode
        pcm16 = np.frombuffer(
            junk(n_samples * channels * 2), dtype="<i2"
        ).reshape(n_samples, channels)
        if audio_format == 0x11:
            block = 36 * channels  # 4-byte header + 8 data words per ch
            data = _audio.ima_adpcm_encode(pcm16, channels, block)
            fact = (b"fact" + (4).to_bytes(4, "little")
                    + n_samples.to_bytes(4, "little"))
        else:
            block = channels
            data = _audio.g711_encode(
                pcm16.reshape(-1), "alaw" if audio_format == 6 else "ulaw"
            )
    else:
        block = channels * bits // 8
        data = junk(n_samples * block)
    fmt = (
        audio_format.to_bytes(2, "little")
        + channels.to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + (rate * block).to_bytes(4, "little")
        + block.to_bytes(2, "little")
        + bits.to_bytes(2, "little")
    )
    if audio_format == 0x11:
        # cbSize + wSamplesPerBlock extension the IMA mapping specifies
        spb = _audio.ima_samples_per_block(block, channels)
        fmt += (2).to_bytes(2, "little") + spb.to_bytes(2, "little")
    body = (
        b"WAVE"
        + b"fmt "
        + len(fmt).to_bytes(4, "little")
        + fmt
        + fact
        + b"data"
        + len(data).to_bytes(4, "little")
        + data
    )
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def synthetic_flac_payload(i: int) -> bytes:
    """Deterministic FLAC fixture via the repo's own encoder
    (``operators/flac.py`` — decode is REAL and byte-exact): junk-
    derived PCM rotated through subframe kinds (verbatim / constant /
    fixed orders / LPC), stereo decorrelation modes, Rice method 1,
    partitioned residuals and 8/16-bit depths."""
    import numpy as np

    from . import flac as _flac

    n = 300 + (i * 53) % 700
    seed = hashlib.md5(f"flac{i}".encode()).digest()
    raw = (seed * (n * 4 // 16 + 1))[:n * 4]
    base = np.frombuffer(raw, dtype="<i2").astype(np.int64)
    # cumsum makes the junk LPC-predictable enough to exercise the
    # small-residual Rice paths; modulo keeps 16-bit range
    mono = (np.cumsum(base[:n] % 997) % 60000) - 30000
    rate = (8000, 22050, 44100)[i % 3]
    variant = i % 6
    if variant == 0:
        return _flac.encode_flac(mono, rate, subframe="verbatim")
    if variant == 1:
        return _flac.encode_flac(
            np.full(n, int(mono[0]), dtype=np.int64), rate,
            subframe="constant",
        )
    if variant == 2:
        return _flac.encode_flac(
            mono, rate, subframe="fixed", fixed_order=i % 5,
            partition_order=2, block_size=256,
        )
    if variant == 3:
        return _flac.encode_flac(
            np.clip(mono // 256, -128, 127), rate, bits=8,
            subframe="lpc", rice2=True,
        )
    stereo = np.stack([mono, (mono * 3) // 4 + (i % 50)], axis=1)
    # NOT i % 3: the stereo variants are i % 6 in (4, 5), which pins
    # i % 3 to (1, 2) and would make left_side unreachable (review)
    mode = ("left_side", "right_side", "mid_side")[(i + i // 6) % 3]
    return _flac.encode_flac(
        stereo, rate, channel_mode=mode,
        subframe="fixed" if variant == 4 else "lpc",
    )


def decode_audio_meta(df: DataFrame, col: str = "payload") -> DataFrame:
    """Arrow-batched audio decode, four tiers:

    - ``decoder in ('pcm', 'ulaw', 'alaw', 'adpcm')`` — real WAV sample
      decode (numpy over the data chunk; G.711 table gather, IMA ADPCM
      block-lockstep — see ``operators/audio.py``): duration,
      full-scale peak/RMS, sample md5;
    - ``decoder='flac'`` — real FLAC decode (``operators/flac.py``:
      all subframe/residual/stereo-decorrelation forms, CRC + md5
      verified), same stats contract;
    - ``decoder='header'`` — WAV whose samples we don't decode (IEEE
      float, exotic bit depths): header fields only;
    - ``decoder='stub'`` — remaining non-WAV audio (mp3/ogg are
      PERCEPTUAL codecs needing a library absent from this container):
      deterministic fake fields, clearly marked (see
      ``decode_image_pixels`` for the stub policy).
    """
    from .flac import decode_flac_stats
    from pyspark.sql.pandas.functions import pandas_udf

    cols = [
        "sample_rate", "channels", "bits", "n_samples",
        "duration_sec", "peak", "rms", "sample_md5", "decoder",
    ]

    @pandas_udf(AUDIO_META_TYPE)
    def decode(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        for payloads in batches:
            rows = []
            for p in payloads:
                if p is None:
                    rows.append((None,) * 9)
                    continue
                b = bytes(p)
                # ONE chunk walk per row: decode_wav_samples reuses it
                # (header-tier rows used to re-parse — review finding)
                full = parse_wav(b)
                if full is not None:
                    dec = decode_wav_samples(b, parsed=full)
                    if dec is not None:
                        rows.append(dec)  # 9-tuple ends with its codec
                    else:
                        rows.append(
                            (*full[:4], None, None, None, None, "header")
                        )
                    continue
                if b[:4] == b"fLaC":
                    dec = decode_flac_stats(b)
                    if dec is not None:
                        rows.append(dec)
                        continue
                h = hashlib.md5(b).digest()
                rows.append(
                    (
                        8000 * (1 + h[0] % 6), 1 + h[1] % 2, 16,
                        100 + h[2], None, None, None, None, "stub",
                    )
                )
            yield pd.DataFrame(rows, columns=cols)

    return df.withColumn("audio_meta", decode(F.col(col)))


FRAME_SCHEMA = (
    "url string, frame_idx int, src_frame int, frame binary, "
    "n_bytes long, width int, height int, decoder string"
)


def parse_avi_mjpeg(b: bytes) -> list[tuple[int, int]] | None:
    """(offset, size) of every stream-0 video chunk (``00dc``/``00db``)
    in a RIFF/AVI container — pure stdlib byte walk, nested ``rec ``
    LISTs included.  None for non-AVI or malformed payloads; an AVI
    with an empty movi LIST yields ``[]``."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        return None

    frames: list[tuple[int, int]] = []
    # explicit stack, not recursion: a crafted payload of nested LIST
    # headers must exhaust the walk, not the interpreter stack (a
    # RecursionError would fail the whole Arrow batch — review finding)
    stack: list[tuple[int, int, bool]] = [(12, len(b), False)]
    while stack:
        pos, end, in_movi = stack.pop()
        while pos + 8 <= end:
            cid = b[pos:pos + 4]
            size = int.from_bytes(b[pos + 4:pos + 8], "little")
            body_end = min(pos + 8 + size, end)
            nxt = pos + 8 + size + (size & 1)  # chunks are word-aligned
            if cid == b"LIST" and body_end - pos >= 12:
                sub = b[pos + 8:pos + 12]
                # resume the parent after this LIST, then descend
                stack.append((nxt, end, in_movi))
                pos, end = pos + 12, body_end
                in_movi = in_movi or sub in (b"movi", b"rec ")
                continue
            if in_movi and cid[:2] == b"00" and cid[2:4] in (b"dc", b"db"):
                frames.append((pos + 8, body_end - (pos + 8)))
            pos = nxt
    return frames


_MOV_TOP_ATOMS = frozenset(
    (b"ftyp", b"moov", b"mdat", b"free", b"skip", b"wide", b"pnot")
)
_MOV_MAX_SAMPLES = 1 << 20  # crafted sample tables must stay bounded


def _mov_atoms(b: bytes, pos: int, end: int):
    """Yield ``(type, body_start, body_end)`` for the QuickTime atoms
    in ``b[pos:end]`` — 32-bit sizes, the 64-bit extended-size form
    (size==1) and the to-end-of-enclosure form (size==0)."""
    while pos + 8 <= end:
        size = int.from_bytes(b[pos:pos + 4], "big")
        typ = b[pos + 4:pos + 8]
        hdr = 8
        if size == 1:
            if pos + 16 > end:
                return
            size = int.from_bytes(b[pos + 8:pos + 16], "big")
            hdr = 16
        elif size == 0:
            size = end - pos
        if size < hdr:
            return  # malformed: would not advance
        yield typ, pos + hdr, min(pos + size, end)
        pos += size


def _mov_descend(b: bytes, pos: int, end: int,
                 path: tuple[bytes, ...]) -> tuple[int, int] | None:
    """Follow a container-atom *path* (e.g. mdia→minf→stbl), returning
    the final atom's body span."""
    for want in path:
        found = None
        for typ, s, e in _mov_atoms(b, pos, end):
            if typ == want:
                found = (s, e)
                break
        if found is None:
            return None
        pos, end = found
    return pos, end


def parse_mov_mjpeg(b: bytes) -> list[tuple[int, int]] | None:
    """(offset, size) of every sample of the first Motion-JPEG video
    track in a QuickTime/MOV (or ISO-BMFF) container — the full
    sample-table walk: ``stsd`` picks the track whose codec fourcc is
    ``jpeg``/``mjpa`` (Motion-JPEG A frames are JFIF), ``stco``/
    ``co64`` give chunk file-offsets, ``stsc`` maps samples to chunks
    (run-length form), ``stsz`` sizes each sample.  None for payloads
    that are not MOV-shaped or hold no MJPEG track (an H.264 mp4 walks
    cleanly to None — the honest stub path downstream)."""
    if len(b) < 12 or b[4:8] not in _MOV_TOP_ATOMS:
        return None
    moov = None
    for typ, s, e in _mov_atoms(b, 0, len(b)):
        if typ == b"moov":
            moov = (s, e)
            break
    if moov is None:
        return None
    for typ, s, e in _mov_atoms(b, *moov):
        if typ != b"trak":
            continue
        span = _mov_descend(b, s, e, (b"mdia", b"minf", b"stbl"))
        if span is None:
            continue
        tabs = {
            t: (s2, e2)
            for t, s2, e2 in _mov_atoms(b, *span)
            if t in (b"stsd", b"stsz", b"stco", b"co64", b"stsc")
        }
        if b"stsd" not in tabs or b"stsz" not in tabs:
            continue
        ds, de = tabs[b"stsd"]
        # stsd: ver/flags + entry count, then entries (size + fourcc)
        if de - ds < 16 or b[ds + 12:ds + 16] not in (b"jpeg", b"mjpa"):
            continue
        zs, ze = tabs[b"stsz"]
        if ze - zs < 12:
            continue
        uniform = int.from_bytes(b[zs + 4:zs + 8], "big")
        n_samples = int.from_bytes(b[zs + 8:zs + 12], "big")
        if not 0 < n_samples <= _MOV_MAX_SAMPLES:
            continue
        if uniform:
            sizes = [uniform] * n_samples
        else:
            if ze - zs < 12 + 4 * n_samples:
                continue
            sizes = [
                int.from_bytes(b[zs + 12 + 4 * i:zs + 16 + 4 * i], "big")
                for i in range(n_samples)
            ]
        if b"co64" in tabs:
            cs, ce = tabs[b"co64"]
            width = 8
        elif b"stco" in tabs:
            cs, ce = tabs[b"stco"]
            width = 4
        else:
            continue
        n_chunks = int.from_bytes(b[cs + 4:cs + 8], "big")
        if ce - cs < 8 + width * n_chunks:
            continue
        offsets = [
            int.from_bytes(
                b[cs + 8 + width * i:cs + 8 + width * (i + 1)], "big"
            )
            for i in range(n_chunks)
        ]
        # stsc runs: (first_chunk 1-based, samples_per_chunk); absent
        # table (or QT writers' common degenerate case) = 1 per chunk
        runs = [(1, 1)]
        if b"stsc" in tabs:
            ss, se_ = tabs[b"stsc"]
            n_runs = int.from_bytes(b[ss + 4:ss + 8], "big")
            if se_ - ss >= 8 + 12 * n_runs and n_runs:
                runs = [
                    (
                        int.from_bytes(
                            b[ss + 8 + 12 * i:ss + 12 + 12 * i], "big"
                        ),
                        int.from_bytes(
                            b[ss + 12 + 12 * i:ss + 16 + 12 * i], "big"
                        ),
                    )
                    for i in range(n_runs)
                ]
        samples: list[tuple[int, int]] = []
        si = 0
        run_i = 0
        for chunk_i in range(1, n_chunks + 1):
            while run_i + 1 < len(runs) and runs[run_i + 1][0] <= chunk_i:
                run_i += 1
            off = offsets[chunk_i - 1]
            for _ in range(runs[run_i][1]):
                if si >= n_samples:
                    break
                size = sizes[si]
                if 0 < size and off + size <= len(b):
                    samples.append((off, size))
                off += size
                si += 1
        if samples:
            return samples
        # a JPEG-fourcc trak whose offsets all fall outside the file
        # (dead preview track, truncated-and-remuxed mdat) yields zero
        # samples — keep scanning later traks like any malformed table
    return None


def extract_avi_frames(
    b: bytes, n_frames: int
) -> list[tuple[int, int, int, str, bytes]] | None:
    """Up to *n_frames* evenly-sampled REAL decoded frames from a
    Motion-JPEG payload in either container this path parses — RIFF/
    AVI (``parse_avi_mjpeg``) or QuickTime/MOV (``parse_mov_mjpeg``) —
    as ``(src_frame, width, height, mode, pixels)`` per sampled frame,
    decoded by the repo's own baseline-JPEG stack (``operators.jpeg``).
    None when the payload is neither container or holds no decodable
    MJPEG frames."""
    offs = parse_avi_mjpeg(b)
    if offs is None:
        offs = parse_mov_mjpeg(b)
    if not offs:
        return None
    total = len(offs)
    take = min(n_frames, total)
    if take == 1:
        idxs = [0]
    else:
        idxs = sorted(
            {round(k * (total - 1) / (take - 1)) for k in range(take)}
        )
    out = []
    for src in idxs:
        off, size = offs[src]
        try:
            w, h, mode, px = decode_image_pixels(b[off:off + size])
        except Exception:
            continue  # one torn frame must not kill the payload
        out.append((src, w, h, mode, px))
    return out or None


def synthetic_avi_payload(
    i: int, n_src_frames: int = 10, w: int = 24, h: int = 16
) -> bytes:
    """Deterministic MJPEG-in-AVI fixture: real baseline JPEGs (the
    repo's own encoder) in ``00dc`` chunks inside a movi LIST, with a
    minimal hdrl — enough container structure for any MJPEG-aware
    reader, fully decodable by ``extract_avi_frames``."""
    from . import jpeg as _jpeg

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + len(body).to_bytes(4, "little") + body + (
            b"\x00" if len(body) & 1 else b""
        )

    frames = []
    for k in range(n_src_frames):
        px = bytes(
            (x * 7 + y * 13 + i * 29 + k * 41) % 256
            for y in range(h)
            for x in range(w)
        )
        frames.append(chunk(b"00dc", _jpeg.encode_gray_jpeg(px, w, h)))
    avih = (
        (40000).to_bytes(4, "little")          # usec per frame (25 fps)
        + b"\x00" * 12
        + n_src_frames.to_bytes(4, "little")   # total frames
        + b"\x00" * 4
        + (1).to_bytes(4, "little")            # streams
        + b"\x00" * 4
        + w.to_bytes(4, "little")
        + h.to_bytes(4, "little")
        + b"\x00" * 16
    )
    hdrl = b"hdrl" + chunk(b"avih", avih)
    movi = b"movi" + b"".join(frames)
    body = b"AVI " + chunk(b"LIST", hdrl) + chunk(b"LIST", movi)
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def synthetic_mov_payload(
    i: int, n_src_frames: int = 10, w: int = 24, h: int = 16
) -> bytes:
    """Deterministic MJPEG-in-MOV fixture: real baseline JPEGs (the
    repo's own encoder) as samples in an ``mdat`` atom, indexed by a
    full QuickTime sample table — ``stsd`` (fourcc ``jpeg``), ``stsz``
    size table, a two-run ``stsc`` (first chunk holds 4 samples, the
    second the rest — exercising the run-length map), and ``stco`` or
    the 64-bit ``co64`` (odd *i*) chunk offsets."""
    from . import jpeg as _jpeg

    def atom(typ: bytes, body: bytes) -> bytes:
        return (8 + len(body)).to_bytes(4, "big") + typ + body

    frames = []
    for k in range(n_src_frames):
        px = bytes(
            # same ramp as synthetic_avi_payload: the same (i, k) frame
            # in either container decodes byte-equal (cross-container
            # parity oracle in tests)
            (x * 7 + y * 13 + i * 29 + k * 41) % 256
            for y in range(h)
            for x in range(w)
        )
        frames.append(_jpeg.encode_gray_jpeg(px, w, h))
    sizes = [len(f) for f in frames]
    ftyp = atom(b"ftyp", b"qt  " + (0).to_bytes(4, "big") + b"qt  ")
    mdat = atom(b"mdat", b"".join(frames))
    base = len(ftyp) + 8  # first sample starts after the mdat header
    split = min(4, n_src_frames)
    chunk_offs = [base]
    if n_src_frames > split:
        chunk_offs.append(base + sum(sizes[:split]))
    stsd_entry = (86).to_bytes(4, "big") + b"jpeg" + b"\x00" * 78
    stsd = atom(
        b"stsd",
        (0).to_bytes(4, "big") + (1).to_bytes(4, "big") + stsd_entry,
    )
    stsz = atom(
        b"stsz",
        (0).to_bytes(4, "big") + (0).to_bytes(4, "big")
        + n_src_frames.to_bytes(4, "big")
        + b"".join(s.to_bytes(4, "big") for s in sizes),
    )
    runs = [(1, split, 1)]
    if n_src_frames > split:
        runs.append((2, n_src_frames - split, 1))
    stsc = atom(
        b"stsc",
        (0).to_bytes(4, "big") + len(runs).to_bytes(4, "big")
        + b"".join(
            fc.to_bytes(4, "big") + spc.to_bytes(4, "big")
            + di.to_bytes(4, "big")
            for fc, spc, di in runs
        ),
    )
    width = 8 if i % 2 else 4
    stco = atom(
        b"co64" if width == 8 else b"stco",
        (0).to_bytes(4, "big") + len(chunk_offs).to_bytes(4, "big")
        + b"".join(o.to_bytes(width, "big") for o in chunk_offs),
    )
    stbl = atom(b"stbl", stsd + stsz + stsc + stco)
    moov = atom(b"moov", atom(b"trak", atom(b"mdia", atom(b"minf", stbl))))
    return ftyp + mdat + moov


def sample_video_frames(
    df: DataFrame,
    n_frames: int = 4,
    url_col: str = "url",
    col: str = "payload",
) -> DataFrame:
    """Video frame sampling: one output row per sampled frame via
    ``mapInPandas`` (Arrow batches, partition passthrough — the fan-out
    shape a real decoder needs at 100 TB: frames explode WITHIN a
    partition, no shuffle).

    Motion-JPEG decodes for REAL (``decoder='mjpeg'``) from BOTH
    containers it ships in — RIFF/AVI (``00dc`` chunk walk) and
    QuickTime/MOV (full ``stsd``/``stsz``/``stsc``/``stco``/``co64``
    sample-table walk) — evenly-sampled frames through the repo's own
    baseline-JPEG decode; ``frame`` carries raw row-major pixels with
    ``src_frame``/``width``/``height`` populated.  Compressed-codec
    containers (H.264 mp4 / mkv / vp9 need a codec library absent
    from this container) keep the deterministic content-hash fake
    with ``decoder='stub'``; a full backend (PyAV/ffmpeg) slots in
    beside ``extract_avi_frames`` without touching the Spark plan."""
    import hashlib as _hl

    def _frames_of(payload: bytes) -> list[bytes]:
        return [
            _hl.md5(payload + bytes([k])).digest() * 4 for k in range(n_frames)
        ]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "url": [], "frame_idx": [], "src_frame": [], "frame": [],
                "n_bytes": [], "width": [], "height": [], "decoder": [],
            }

            def emit(url, k, src, fr, w, h, dec):
                out["url"].append(url)
                out["frame_idx"].append(k)
                out["src_frame"].append(src)
                out["frame"].append(fr)
                out["n_bytes"].append(len(fr))
                out["width"].append(w)
                out["height"].append(h)
                out["decoder"].append(dec)

            for url, payload in zip(pdf[url_col], pdf[col]):
                if payload is None:
                    continue
                b = bytes(payload)
                real = extract_avi_frames(b, n_frames)
                if real is not None:
                    for k, (src, w, h, _mode, px) in enumerate(real):
                        emit(url, k, src, px, w, h, "mjpeg")
                    continue
                for k, fr in enumerate(_frames_of(b)):
                    emit(url, k, None, fr, None, None, "stub")
            res = pd.DataFrame(out)
            for c in ("src_frame", "width", "height"):
                # nullable Int32: stub rows carry None and a plain int
                # column would silently float-ify under Arrow
                res[c] = pd.array(out[c], dtype="Int32")
            yield res

    return df.select(url_col, col).mapInPandas(gen, schema=FRAME_SCHEMA)


def synthetic_image_payload(i: int) -> bytes:
    """Deterministic tiny PNG/GIF/JPEG blobs — VALID headers (parsed by
    ``parse_image_header``), junk bodies — so the real header-decode
    path is exercisable without any image library in the sandbox."""
    w, h = 16 + (i * 7) % 240, 16 + (i * 13) % 240
    kind = i % 3
    if kind == 0:  # PNG: signature + IHDR chunk (crc not validated)
        ihdr = (
            w.to_bytes(4, "big")
            + h.to_bytes(4, "big")
            + bytes([8, 6, 0, 0, 0])  # bit depth 8, RGBA
        )
        return (
            b"\x89PNG\r\n\x1a\n"
            + (13).to_bytes(4, "big")
            + b"IHDR"
            + ihdr
            + b"\x00" * 4
        )
    if kind == 1:  # GIF89a logical screen descriptor
        return (
            b"GIF89a"
            + w.to_bytes(2, "little")
            + h.to_bytes(2, "little")
            + b"\xf7\x00\x00;"
        )
    # JPEG: SOI + APP0(JFIF) + SOF0 + EOI
    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + b"\x00" * 9
    sof0 = (
        b"\xff\xc0"
        + (17).to_bytes(2, "big")
        + b"\x08"
        + h.to_bytes(2, "big")
        + w.to_bytes(2, "big")
        + b"\x03"
        + b"\x01\x11\x00\x02\x11\x01\x03\x11\x01"
    )
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_unfilter(raw: bytes, w: int, h: int, bpp: int) -> bytes:
    """Reverse PNG row filters (0=None 1=Sub 2=Up 3=Average 4=Paeth,
    RFC 2083 §6) over decompressed IDAT scanlines."""
    stride = w * bpp
    out = bytearray()
    prev = bytes(stride)
    pos = 0
    for _ in range(h):
        f = raw[pos]
        pos += 1
        row = bytearray(raw[pos:pos + stride])
        pos += stride
        if f == 1:
            for i in range(bpp, stride):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif f == 2:
            for i in range(stride):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif f == 3:
            for i in range(stride):
                a = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:
            for i in range(stride):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[i] = (row[i] + pr) & 0xFF
        elif f != 0:
            raise ValueError(f"bad PNG filter byte {f}")
        out += row
        prev = bytes(row)
    return bytes(out)


# decode-size guard: one crafted header (or an LZW/zlib bomb) must not
# OOM an executor — 2^26 pixels (= 192 MB RGB) is far beyond any sane
# web/scan image and far below the harm threshold
_MAX_PIXELS = 1 << 26


# Adam7 interlace passes: (x0, y0, dx, dy)
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _adam7_dims(w: int, h: int):
    """Non-empty (pass_index, wp, hp) sub-image dims for Adam7."""
    out = []
    for p, (x0, y0, dx, dy) in enumerate(_ADAM7):
        wp = (w - x0 + dx - 1) // dx
        hp = (h - y0 + dy - 1) // dy
        if wp > 0 and hp > 0:
            out.append((p, wp, hp))
    return out


_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
_PNG_OUT_MODE = {0: "L", 2: "RGB", 4: "LA", 6: "RGBA"}


def _decode_png(b: bytes) -> tuple[int, int, str, bytes] | None:
    """8- or 16-bit PNG, colour types 0 (grey → 'L'), 2 (truecolour
    RGB), 3 (palette + PLTE lookup → 'RGB', 8-bit only per spec),
    4 (grey+alpha → 'LA') and 6 (RGBA), non-interlaced OR Adam7
    interlaced, pure stdlib (zlib IDAT inflate + the five filter
    reversals per scanline/sub-image).  16-bit samples are reduced to
    their high byte (the standard 16→8 reduction) so the output is
    always one byte per sample — a REAL decode with a documented
    precision reduction, not a stub.  None if the payload is not a
    PNG this path can read — including crafted payloads whose zlib
    stream is valid but whose filter bytes are not (same no-raise
    contract as decode_jpeg)."""
    try:
        return _decode_png_checked(b)
    except (ValueError, IndexError):
        return None


def _decode_png_checked(b: bytes) -> tuple[int, int, str, bytes] | None:
    import zlib

    if b[:8] != _PNG_SIG:
        return None
    pos, n = 8, len(b)
    w = h = ctype = None
    interlace = 0
    ok = False
    idat = bytearray()
    plte = b""
    while pos + 8 <= n:
        ln = int.from_bytes(b[pos:pos + 4], "big")
        cid = b[pos + 4:pos + 8]
        body = b[pos + 8:pos + 8 + ln]
        if cid == b"IHDR" and len(body) >= 13:
            w = int.from_bytes(body[0:4], "big")
            h = int.from_bytes(body[4:8], "big")
            depth = body[8]
            ctype = body[9]
            interlace = body[12]
            # bit depth 8/16 (16 not for palette, per spec), colour
            # type 0/2/3/4/6, filter method 0, interlace none/Adam7
            ok = (
                ctype in (0, 2, 3, 4, 6)
                and body[11] == 0
                and interlace in (0, 1)
                and (depth == 8 or (depth == 16 and ctype != 3))
            )
        elif cid == b"PLTE":
            plte = body
        elif cid == b"IDAT":
            idat += body
        elif cid == b"IEND":
            break
        pos += 12 + ln  # len + type + body + crc
    if not (ok and w and h and idat):
        return None
    if w * h > _MAX_PIXELS:
        return None
    if ctype == 3 and (not plte or len(plte) % 3):
        return None
    bpp = _PNG_CHANNELS[ctype] * (depth // 8)
    expected = (
        h * (w * bpp + 1)
        if interlace == 0
        else sum(hp * (wp * bpp + 1) for _, wp, hp in _adam7_dims(w, h))
    )
    try:
        # bounded inflate: a zlib bomb cannot expand past the raster
        raw = zlib.decompressobj().decompress(bytes(idat), expected + 1)
    except zlib.error:
        return None
    if len(raw) != expected:
        return None
    if interlace == 0:
        px = _png_unfilter(raw, w, h, bpp)
    else:
        # Adam7: seven independently-filtered sub-images, scattered
        # back onto the full raster
        passes = _adam7_dims(w, h)
        full = bytearray(w * h * bpp)
        off = 0
        for p, wp, hp in passes:
            x0, y0, dx, dy = _ADAM7[p]
            sub_len = hp * (wp * bpp + 1)
            sub = _png_unfilter(raw[off:off + sub_len], wp, hp, bpp)
            off += sub_len
            for sy in range(hp):
                y = y0 + sy * dy
                for sx in range(wp):
                    x = x0 + sx * dx
                    s = (sy * wp + sx) * bpp
                    d = (y * w + x) * bpp
                    full[d:d + bpp] = sub[s:s + bpp]
        px = bytes(full)
    if depth == 16:
        px = px[0::2]  # big-endian samples → high byte (16→8 reduction)
    if ctype != 3:
        return w, h, _PNG_OUT_MODE[ctype], px
    # palette indices → RGB triples via PLTE
    n_entries = len(plte) // 3
    if any(i >= n_entries for i in px):
        return None
    out = bytearray(len(px) * 3)
    for k, i in enumerate(px):
        out[3 * k:3 * k + 3] = plte[3 * i:3 * i + 3]
    return w, h, "RGB", bytes(out)


# backwards-compat alias (pre-r4 name, grey-only then)
_decode_png_gray = _decode_png


def _decode_bmp(b: bytes) -> tuple[int, int, str, bytes] | None:
    """Uncompressed 24-bit BI_RGB BMP → (w, h, 'RGB', pixels top-down),
    pure stdlib.  None for anything else."""
    if b[:2] != b"BM" or len(b) < 54:
        return None
    off = int.from_bytes(b[10:14], "little")
    w = int.from_bytes(b[18:22], "little", signed=True)
    h = int.from_bytes(b[22:26], "little", signed=True)
    bpp = int.from_bytes(b[28:30], "little")
    comp = int.from_bytes(b[30:34], "little")
    if comp != 0 or bpp != 24 or w <= 0 or h == 0:
        return None
    if w * abs(h) > _MAX_PIXELS:
        return None
    top_down, hh = h < 0, abs(h)
    stride = (w * 3 + 3) & ~3
    rows = range(hh) if top_down else range(hh - 1, -1, -1)
    px = bytearray()
    for r in rows:
        start = off + r * stride
        row = b[start:start + w * 3]
        if len(row) < w * 3:
            return None
        out = bytearray(row)  # BGR on disk → RGB out, swapped in C
        out[0::3], out[2::3] = row[2::3], row[0::3]
        px += out
    return w, hh, "RGB", bytes(px)


def _px_stream(i: int, n: int) -> bytes:
    """Deterministic pseudo-pixel bytes (md5 counter stream)."""
    out = bytearray()
    k = 0
    while len(out) < n:
        out += hashlib.md5(f"px:{i}:{k}".encode()).digest()
        k += 1
    return bytes(out[:n])


def synthetic_bmp_payload(i: int, w: int = 13, h: int = 7) -> bytes:
    """Valid uncompressed 24-bit BMP (bottom-up, 4-byte row padding)
    with deterministic pixels — a REAL encode, so decode round-trips."""
    stride = (w * 3 + 3) & ~3
    rgb = _px_stream(i, w * h * 3)
    body = bytearray()
    for r in range(h - 1, -1, -1):  # bottom-up storage
        row = bytearray()
        for c in range(w):
            p = (r * w + c) * 3
            row += bytes((rgb[p + 2], rgb[p + 1], rgb[p]))  # store BGR
        row += b"\x00" * (stride - w * 3)
        body += row
    info = (
        (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(body).to_bytes(4, "little")
        + b"\x00" * 16
    )
    off = 14 + len(info)
    hdr = (
        b"BM"
        + (off + len(body)).to_bytes(4, "little")
        + b"\x00" * 4
        + off.to_bytes(4, "little")
    )
    return bytes(hdr + info + body)


def _png_forward_filter(px: bytes, w: int, h: int, bpp: int) -> bytes:
    """Forward-filter raw pixel rows with filter type = row % 5 —
    exercises every reversal branch in ``_png_unfilter`` on decode."""
    stride = w * bpp
    raw = bytearray()
    prev = bytes(stride)
    for r in range(h):
        row = px[r * stride:(r + 1) * stride]
        f = r % 5
        raw.append(f)
        for c in range(stride):
            a = row[c - bpp] if c >= bpp else 0
            b_ = prev[c]
            cc = prev[c - bpp] if c >= bpp else 0
            if f == 0:
                v = row[c]
            elif f == 1:
                v = (row[c] - a) & 0xFF
            elif f == 2:
                v = (row[c] - b_) & 0xFF
            elif f == 3:
                v = (row[c] - ((a + b_) >> 1)) & 0xFF
            else:
                p = a + b_ - cc
                pa, pb, pc = abs(p - a), abs(p - b_), abs(p - cc)
                pr = a if (pa <= pb and pa <= pc) else (b_ if pb <= pc else cc)
                v = (row[c] - pr) & 0xFF
            raw.append(v)
        prev = row
    return bytes(raw)


def _png_chunk(cid: bytes, body: bytes) -> bytes:
    import struct
    import zlib

    return (
        len(body).to_bytes(4, "big")
        + cid
        + body
        + struct.pack(">I", zlib.crc32(cid + body))
    )


def synthetic_gray_png_payload(i: int, w: int = 11, h: int = 10) -> bytes:
    """Valid 8-bit greyscale PNG with deterministic pixels, row filter
    type = row % 5 (forward-filtered), real zlib IDAT — exercises every
    filter-reversal branch in ``_png_unfilter`` on round-trip."""
    import zlib

    raw = _png_forward_filter(_px_stream(i, w * h), w, h, 1)
    ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, 0, 0, 0, 0])
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def synthetic_rgb_png_payload(i: int, w: int = 9, h: int = 8) -> bytes:
    """Valid 8-bit truecolour (type 2) PNG, forward-filtered rows,
    deterministic pixels — decode round-trips to the generator RGB."""
    import zlib

    raw = _png_forward_filter(_px_stream(i, w * h * 3), w, h, 3)
    ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, 2, 0, 0, 0])
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def synthetic_interlaced_png_payload(
    i: int, w: int = 11, h: int = 10, ctype: int = 0
) -> bytes:
    """Valid Adam7-interlaced 8-bit PNG (grey ctype=0 or RGB ctype=2)
    with deterministic pixels; each sub-image forward-filtered with
    rotating filter types — decode must reassemble the exact raster."""
    import zlib

    bpp = 3 if ctype == 2 else 1
    px = _px_stream(i, w * h * bpp)
    raw = bytearray()
    for p, wp, hp in _adam7_dims(w, h):
        x0, y0, dx, dy = _ADAM7[p]
        sub = bytearray()
        for sy in range(hp):
            y = y0 + sy * dy
            for sx in range(wp):
                x = x0 + sx * dx
                s = (y * w + x) * bpp
                sub += px[s:s + bpp]
        raw += _png_forward_filter(bytes(sub), wp, hp, bpp)
    ihdr = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + bytes([8, ctype, 0, 0, 1])
    )
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def synthetic_palette_png_payload(
    i: int, w: int = 10, h: int = 9, n_colors: int = 16
) -> tuple[bytes, bytes]:
    """Valid 8-bit paletted (type 3) PNG with a deterministic PLTE and
    index raster; returns (payload, expected_rgb_pixels) so tests can
    assert the palette-mapped decode exactly."""
    import zlib

    plte = _px_stream(10_000 + i, 3 * n_colors)
    idx = bytes(x % n_colors for x in _px_stream(i, w * h))
    raw = _png_forward_filter(idx, w, h, 1)
    ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, 3, 0, 0, 0])
    payload = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"PLTE", plte)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    expected = b"".join(plte[3 * k:3 * k + 3] for k in idx)
    return payload, expected


def decode_image_pixels(payload: bytes) -> tuple[int, int, str, bytes]:
    """Real pixel decode for the formats the sandbox can read with the
    stdlib alone — uncompressed 24-bit BMP and 8-bit PNG in greyscale,
    truecolour-RGB, or paletted form (zlib IDAT + filter reversal +
    PLTE lookup) — then Pillow when importable.
    Returns (width, height, mode, pixel_bytes row-major top-down);
    GIF decodes for real (LZW + colour table, 4-pass interlace), and
    TIFF too (strips, none/PackBits/TIFF-LZW compression, predictor,
    WhiteIsZero/grey/RGB/palette, AND bilevel scans — packed bits and
    CCITT G4/T.6 MMR fax via ``operators.g4fax`` — ``operators.tiff``);
    JPEG too — baseline AND progressive (SOF2),
    greyscale and 3-component YCbCr at 4:4:4 / 4:2:2 / 4:2:0, restart
    markers included (``operators.jpeg``: marker parse, canonical
    Huffman entropy decode incl. progressive first/refinement scans,
    dequantize, IDCT, chroma upsample); LOSSLESS (SOF3) JPEG decodes
    for real (r6: T.81 Annex H predictive coding, all 7 predictors,
    restarts, 2-16 bit); ARITHMETIC JPEG decodes for real too — both
    sequential (SOF9) and progressive (SOF10) — via the
    ``operators.jpeg_arith`` QM-coder (T.81 Annex D/F/G.2), as do
    12-bit extended sequential (SOF1), Adobe CMYK/YCCK frames, and
    HIERARCHICAL (DHP) greyscale and 4:4:4-colour pyramids — SOF0 base + EXP-expanded
    SOF5 differential refinements + SOF7 lossless correction
    (``operators.jpeg_hier``, T.81 Annex J) — all r6; raises
    NotImplementedError only for formats none of those paths cover
    (subsampled-colour hierarchical JPEG, non-MJPEG video …), the
    remaining loudly-marked stub surface."""
    b = bytes(payload)
    out = _decode_bmp(b) or _decode_png(b) or _decode_gif(b)
    if out is None:
        from . import jpeg as _jpeg
        from . import tiff as _tiff

        out = _jpeg.decode_jpeg(b) or _tiff.decode_tiff(b)
    if out is not None:
        return out
    pil = _try_pillow()
    if pil is not None:
        import io

        try:
            with pil.open(io.BytesIO(b)) as im:
                return im.width, im.height, im.mode, im.tobytes()
        except Exception:
            # header-only/truncated payloads Pillow cannot parse fall
            # through to the documented contract below
            pass
    raise NotImplementedError(
        "pixel decode beyond BMP/PNG/GIF/TIFF (incl. G3/G4 fax)/JPEG "
        "(baseline/progressive/lossless/arithmetic-sequential+"
        "progressive/12-bit/CMYK/hierarchical grey+4:4:4-colour) "
        "requires Pillow/cv2 (subsampled-colour hierarchical JPEG, "
        "non-MJPEG video); "
        "install on the cluster and this same call decodes every format"
    )


PIXEL_STATS_TYPE = StructType(
    [
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("mode", StringType(), True),
        StructField("pixel_md5", StringType(), True),
        StructField("decoder", StringType(), True),
    ]
)


def decode_pixel_stats(df: DataFrame, col: str = "payload") -> DataFrame:
    """Arrow-batched REAL pixel decode over a binary column: the full
    BMP/PNG/JPEG stack (``decode_image_pixels``) runs inside the same
    pandas-UDF shape as extraction, emitting per-row (width, height,
    mode, md5(pixels)) — pixels hashed rather than carried so the
    exchanged row stays narrow.  Rows no decoder covers report
    decoder='stub' instead of failing the batch (the skip-with-log
    policy, observable by counting)."""
    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf(PIXEL_STATS_TYPE)
    def decode(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        for payloads in batches:
            rows = []
            for p in payloads:
                if p is None:
                    rows.append((None, None, None, None, None))
                    continue
                try:
                    w, h, mode, px = decode_image_pixels(bytes(p))
                    rows.append(
                        (w, h, mode, hashlib.md5(px).hexdigest(), "native")
                    )
                except NotImplementedError:
                    rows.append((None, None, None, None, "stub"))
                except Exception:
                    # defense-in-depth: one corrupt blob must never
                    # fail the whole Arrow batch (decoders are fuzz-
                    # hardened to return None, but a decoder bug
                    # should degrade to an observable row, not a
                    # task failure at corpus scale)
                    rows.append((None, None, None, None, "error"))
            yield pd.DataFrame(
                rows,
                columns=["width", "height", "mode", "pixel_md5", "decoder"],
            )

    return df.withColumn("pixel_stats", decode(F.col(col)))


# ---------------------------------------------------------------------
# GIF pixel decode: LZW + palette (87a/89a, first frame, interlace)
# ---------------------------------------------------------------------


def _gif_lzw_decode(data: bytes, min_code_size: int, limit: int) -> bytes:
    """GIF-flavour LZW: variable-width codes, CLEAR/EOI, early code-
    width growth; stops after *limit* output bytes (the raster size)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    # bit stream, LSB-first within each byte (GIF convention)
    acc = 0
    nbits = 0
    pos = 0

    def init_table():
        return {i: bytes([i]) for i in range(clear)}

    table = init_table()
    next_code = eoi + 1
    width = min_code_size + 1
    prev: bytes | None = None
    while len(out) < limit:
        while nbits < width:
            if pos >= len(data):
                return bytes(out)  # truncated stream: best effort
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = init_table()
            next_code = eoi + 1
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code in table:
            entry = table[code]
        elif code == next_code:
            entry = prev + prev[:1]
        else:
            raise ValueError("bad LZW code")
        out += entry
        if prev is not None and next_code < 4096:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
    return bytes(out[:limit])


_GIF_INTERLACE_PASSES = [(0, 8), (4, 8), (2, 4), (1, 2)]


def _decode_gif(b: bytes) -> tuple[int, int, str, bytes] | None:
    """First frame of an 87a/89a GIF → (w, h, 'RGB', pixels): LZW
    decompression + colour-table lookup, 4-pass interlace reassembly.
    Same no-raise contract as the other decoders."""
    try:
        return _decode_gif_checked(b)
    except (IndexError, KeyError, ValueError):
        return None


def _decode_gif_checked(b: bytes) -> tuple[int, int, str, bytes] | None:
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    sw = int.from_bytes(b[6:8], "little")
    sh = int.from_bytes(b[8:10], "little")
    flags = b[10]
    gct = b""
    pos = 13
    if flags & 0x80:
        n = 2 ** ((flags & 0x07) + 1)
        gct = b[pos:pos + 3 * n]
        pos += 3 * n
    while pos < len(b):
        blk = b[pos]
        if blk == 0x3B:  # trailer
            return None  # no image block seen
        if blk == 0x21:  # extension: label + sub-blocks
            pos += 2
            while b[pos] != 0:
                pos += 1 + b[pos]
            pos += 1
            continue
        if blk != 0x2C:
            return None
        # image descriptor: only frames covering the whole logical
        # screen are claimed (sub-rectangle/composited animation
        # frames would need screen placement — stub path instead, so
        # dims always agree with parse_image_header)
        left = int.from_bytes(b[pos + 1:pos + 3], "little")
        top = int.from_bytes(b[pos + 3:pos + 5], "little")
        iw = int.from_bytes(b[pos + 5:pos + 7], "little")
        ih = int.from_bytes(b[pos + 7:pos + 9], "little")
        iflags = b[pos + 9]
        pos += 10
        if (left, top) != (0, 0) or (iw, ih) != (sw, sh):
            return None
        if iw * ih > _MAX_PIXELS:
            return None
        ct = gct
        if iflags & 0x80:  # local colour table
            n = 2 ** ((iflags & 0x07) + 1)
            ct = b[pos:pos + 3 * n]
            pos += 3 * n
        if not ct or iw == 0 or ih == 0:
            return None
        min_code = b[pos]
        pos += 1
        if not 2 <= min_code <= 11:
            return None
        lzw = bytearray()
        while b[pos] != 0:
            ln = b[pos]
            lzw += b[pos + 1:pos + 1 + ln]
            pos += 1 + ln
        idx = _gif_lzw_decode(bytes(lzw), min_code, iw * ih)
        if len(idx) < iw * ih:
            return None  # truncated stream: reject, never fabricate
        n_colors = len(ct) // 3
        if any(i >= n_colors for i in idx):
            return None
        if iflags & 0x40:  # interlaced: reorder rows via the 4 passes
            rows = [idx[r * iw:(r + 1) * iw] for r in range(ih)]
            out_rows: list[bytes | None] = [None] * ih
            src = 0
            for start, step in _GIF_INTERLACE_PASSES:
                for r in range(start, ih, step):
                    out_rows[r] = rows[src]
                    src += 1
            idx = b"".join(out_rows)  # type: ignore[arg-type]
        px = bytearray(iw * ih * 3)
        for k, i in enumerate(idx):
            px[3 * k:3 * k + 3] = ct[3 * i:3 * i + 3]
        return iw, ih, "RGB", bytes(px)
    return None


def _gif_lzw_encode(idx: bytes, min_code_size: int) -> bytes:
    """Real GIF LZW compression (string table, early width growth)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0
    width = min_code_size + 1

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear)
    run = b""
    for byte in idx:
        cand = run + bytes([byte])
        if cand in table:
            run = cand
            continue
        emit(table[run])
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            # the decoder's FIRST code after a clear assigns nothing,
            # so its table lags the encoder's by one: grow the emit
            # width one assignment later than the decoder grows its
            # read width (i.e. when next_code passes 2^width)
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        run = bytes([byte])
    if run:
        emit(table[run])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def synthetic_gif_payload(
    i: int, w: int = 14, h: int = 11, n_colors: int = 16,
    interlaced: bool = False,
) -> tuple[bytes, bytes]:
    """Valid GIF89a with a deterministic palette + LZW-compressed index
    raster (optionally interlaced); returns (payload, expected_rgb)."""
    plte = _px_stream(20_000 + i, 3 * n_colors)
    idx = bytes(x % n_colors for x in _px_stream(i, w * h))
    expected = b"".join(plte[3 * k:3 * k + 3] for k in idx)
    store = idx
    if interlaced:
        order = []
        for start, step in _GIF_INTERLACE_PASSES:
            order.extend(range(start, h, step))
        store = b"".join(idx[r * w:(r + 1) * w] for r in order)
    min_code = max(2, (n_colors - 1).bit_length())
    lzw = _gif_lzw_encode(store, min_code)
    ctbits = max(1, (n_colors - 1).bit_length()) - 1
    ct_n = 2 ** (ctbits + 1)
    ct = plte + b"\x00" * (3 * ct_n - len(plte))
    hdr = (
        b"GIF89a"
        + w.to_bytes(2, "little") + h.to_bytes(2, "little")
        + bytes([0x80 | ctbits, 0, 0])
        + ct
    )
    desc = (
        b"\x2c" + b"\x00" * 4
        + w.to_bytes(2, "little") + h.to_bytes(2, "little")
        + bytes([0x40 if interlaced else 0x00])
        + bytes([min_code])
    )
    body = b""
    for k in range(0, len(lzw), 255):
        chunk = lzw[k:k + 255]
        body += bytes([len(chunk)]) + chunk
    return hdr + desc + body + b"\x00" + b"\x3b", expected
