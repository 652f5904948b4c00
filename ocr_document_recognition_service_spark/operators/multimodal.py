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


def decode_image_meta(df: DataFrame, col: str = "payload") -> DataFrame:
    """Arrow-batched image metadata 'decode'.

    Uses Pillow when importable; otherwise emits the deterministic fake
    with ``decoder='stub'``.  Pixel extraction is intentionally NOT
    implemented in the sandbox — see ``decode_image_pixels``.
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


def decode_image_pixels(*_args, **_kwargs):
    """Real pixel decode — requires an image backend not present in this
    container.  The Spark plumbing above (schema, batching, partition
    passthrough) is the tested surface; this call is the marked stub."""
    raise NotImplementedError(
        "pixel decode requires Pillow/cv2; install on the cluster and "
        "extend decode_image_meta's UDF body"
    )
