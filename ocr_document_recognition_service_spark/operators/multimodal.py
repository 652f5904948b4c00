"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns exactly like ``html``
does in the pages table.  The Spark-side plumbing — schema, format
sniffing, Arrow batch shape, partition behavior — is real and tested;
the actual pixel/sample decode is STUBBED (no image/audio libs in this
container): ``decode_image_meta`` emits a deterministic fake when no
backend is importable, and raises ``NotImplementedError`` if asked to
produce real pixels.  On a cluster, installing Pillow flips the same
UDF to real decoding (import-try gate).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
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
        StructField("decoder", StringType(), True),
    ]
)


def parse_wav_header(b: bytes) -> tuple[int, int, int, int] | None:
    """(sample_rate, channels, bits, n_samples) from RIFF/WAVE chunk
    headers — pure stdlib byte walking, no audio library.  None for
    non-WAV or malformed payloads."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    pos, n = 12, len(b)
    fmt = None
    data_size = None
    while pos + 8 <= n:
        cid = b[pos:pos + 4]
        size = int.from_bytes(b[pos + 4:pos + 8], "little")
        body = b[pos + 8:pos + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            channels = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            block_align = int.from_bytes(body[12:14], "little")
            bits = int.from_bytes(body[14:16], "little")
            fmt = (rate, channels, bits, block_align)
        elif cid == b"data":
            data_size = size
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data_size is None:
        return None
    rate, channels, bits, block_align = fmt
    if not (rate and channels and bits and block_align):
        return None
    return rate, channels, bits, data_size // block_align


def synthetic_wav_payload(i: int) -> bytes:
    """Deterministic minimal WAV: valid RIFF/fmt/data chunks, junk
    samples — exercises the real header-decode path."""
    rate = (8000, 16000, 44100)[i % 3]
    channels = 1 + i % 2
    bits = 16
    block = channels * bits // 8
    n_samples = 100 + (i * 37) % 900
    data = (hashlib.md5(str(i).encode()).digest() * (n_samples * block // 16 + 1))[
        : n_samples * block
    ]
    fmt = (
        (1).to_bytes(2, "little")
        + channels.to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + (rate * block).to_bytes(4, "little")
        + block.to_bytes(2, "little")
        + bits.to_bytes(2, "little")
    )
    body = (
        b"WAVE"
        + b"fmt "
        + len(fmt).to_bytes(4, "little")
        + fmt
        + b"data"
        + len(data).to_bytes(4, "little")
        + data
    )
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def decode_audio_meta(df: DataFrame, col: str = "payload") -> DataFrame:
    """Arrow-batched audio metadata decode: real WAV header parse
    (``decoder='header'``); other formats get the deterministic fake
    (``decoder='stub'``) — sample/waveform decode needs an audio
    backend absent from this container (see ``decode_image_pixels``
    for the stub policy)."""
    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf(AUDIO_META_TYPE)
    def decode(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        for payloads in batches:
            rows = []
            for p in payloads:
                if p is None:
                    rows.append((None, None, None, None, None))
                    continue
                hdr = parse_wav_header(bytes(p))
                if hdr is not None:
                    rows.append((*hdr, "header"))
                    continue
                h = hashlib.md5(bytes(p)).digest()
                rows.append(
                    (8000 * (1 + h[0] % 6), 1 + h[1] % 2, 16, 100 + h[2], "stub")
                )
            yield pd.DataFrame(
                rows,
                columns=["sample_rate", "channels", "bits", "n_samples", "decoder"],
            )

    return df.withColumn("audio_meta", decode(F.col(col)))


FRAME_SCHEMA = (
    "url string, frame_idx int, frame binary, n_bytes long, decoder string"
)


def sample_video_frames(
    df: DataFrame,
    n_frames: int = 4,
    url_col: str = "url",
    col: str = "payload",
) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame
    via ``mapInPandas`` (Arrow batches, partition passthrough — the
    fan-out shape a real decoder needs at 100 TB: frames explode
    WITHIN a partition, no shuffle).  No video backend exists in this
    container, so frame bytes are a deterministic content-hash fake
    with ``decoder='stub'``; a real backend (PyAV/ffmpeg) replaces the
    body of ``_frames_of`` without touching the Spark plan."""
    import hashlib as _hl

    def _frames_of(payload: bytes) -> list[bytes]:
        return [
            _hl.md5(payload + bytes([k])).digest() * 4 for k in range(n_frames)
        ]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"url": [], "frame_idx": [], "frame": [], "n_bytes": [], "decoder": []}
            for url, payload in zip(pdf[url_col], pdf[col]):
                if payload is None:
                    continue
                for k, fr in enumerate(_frames_of(bytes(payload))):
                    out["url"].append(url)
                    out["frame_idx"].append(k)
                    out["frame"].append(fr)
                    out["n_bytes"].append(len(fr))
                    out["decoder"].append("stub")
            yield pd.DataFrame(out)

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


def decode_image_pixels(*_args, **_kwargs):
    """Real pixel decode — requires an image backend not present in this
    container.  The Spark plumbing above (schema, batching, partition
    passthrough) is the tested surface; this call is the marked stub."""
    raise NotImplementedError(
        "pixel decode requires Pillow/cv2; install on the cluster and "
        "extend decode_image_meta's UDF body"
    )
