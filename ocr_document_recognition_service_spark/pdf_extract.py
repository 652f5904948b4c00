"""Layout-aware PDF block parse (SURVEY §2.4, "PDF side of the graft").

The reference rasterizes PDFs and re-detects text boxes
(``core/pipelines/loaders/image_loader.py:33-43``); its dataset tooling
generates PDFs by laying text into a page box (``datasets/
wiki_parser_to_pdf.py:49-71``, page 595×842, font 12, avg char width =
0.6·font — constants we reuse).  Here we consume PDF **text blocks with
coordinates** directly and order them with the reference's layout
algebra (L1 corner canonicalization → L2 deskew → L3 row-banded
reading-order bubble sort).

No PDF library exists in the sandbox (SURVEY §7.5), so this module
pins a deterministic *uncompressed* mini-PDF profile that our corpus
generator emits and this parser reads:

    BT a b c d x y Tm (text) Tj ET

one text block per BT/ET pair, ``Tm`` carrying the full placement
matrix (rotation included), string bytes UTF-8 with ``\\``/``(``/``)``
escaped.  A real-PDF backend (PyMuPDF ``page.get_text("blocks")``)
drops in behind the same ``pdf_blocks()`` signature on a cluster.
"""

from __future__ import annotations

import math
import re
from typing import Iterable

from .layout import Quad, reading_order

PAGE_W = 595.0
PAGE_H = 842.0
FONT_SIZE = 12.0
CHAR_W = FONT_SIZE * 0.6  # avg char width rule, wiki_parser_to_pdf.py:33

PDF_MAGIC = b"%PDF"

_TJ_RE = re.compile(
    rb"BT\s+"
    rb"(-?[\d.]+)\s+(-?[\d.]+)\s+(-?[\d.]+)\s+(-?[\d.]+)\s+"
    rb"(-?[\d.]+)\s+(-?[\d.]+)\s+Tm\s+"
    rb"\((.*?)(?<!\\)\)\s*Tj\s+"
    rb"ET",
    re.DOTALL,
)


def _escape(text: str) -> bytes:
    b = text.encode("utf-8")
    return b.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")


def _unescape(raw: bytes) -> str:
    raw = raw.replace(b"\\)", b")").replace(b"\\(", b"(").replace(b"\\\\", b"\\")
    return raw.decode("utf-8", errors="replace")


def is_pdf(payload: bytes) -> bool:
    """F5 format dispatch: magic-byte sniff replacing the reference's
    file-extension check (image_loader.py:24-28)."""
    return payload[:4] == PDF_MAGIC


def build_pdf(
    blocks: Iterable[tuple[float, float, str]],
    angle: float = 0.0,
    page: tuple[float, float] = (PAGE_W, PAGE_H),
) -> bytes:
    """Serialize blocks into the pinned mini-PDF profile.

    *blocks* are ``(x, y, text)`` with (x, y) the block's top-left in
    IMAGE coordinates (y down from page top); *angle* rotates the whole
    document about the page center (uniform skew — exercises L2).
    Emission order is whatever the caller supplies (the generator
    shuffles it; reading order must be recovered by the parser).
    """
    w_pg, h_pg = page
    ca, sa = math.cos(angle), math.sin(angle)
    cx, cy = w_pg / 2.0, h_pg / 2.0
    lines: list[bytes] = []
    for ox, oy, text in blocks:
        h = FONT_SIZE
        # baseline-left of the block in image coords, then doc rotation
        bx, by = ox, oy + h
        rx = ca * (bx - cx) - sa * (by - cy) + cx
        ry = sa * (bx - cx) + ca * (by - cy) + cy
        # to PDF coords (y up) + text-space basis under the same rotation
        x_pdf, y_pdf = rx, h_pg - ry
        a, b, c, d = ca, -sa, sa, ca
        lines.append(
            b"BT %.4f %.4f %.4f %.4f %.4f %.4f Tm (%s) Tj ET"
            % (a, b, c, d, x_pdf, y_pdf, _escape(text))
        )
    stream = b"\n".join(lines)
    return b"\n".join(
        [
            b"%PDF-1.4",
            b"%\xe2\xe3\xcf\xd3",
            b"1 0 obj<</Type/Catalog/Pages 2 0 R>>endobj",
            b"2 0 obj<</Type/Pages/Kids[3 0 R]/Count 1>>endobj",
            b"3 0 obj<</Type/Page/Parent 2 0 R/MediaBox[0 0 %d %d]"
            b"/Contents 4 0 R>>endobj" % (int(w_pg), int(h_pg)),
            b"4 0 obj<</Length %d>>stream" % len(stream),
            stream,
            b"endstream",
            b"endobj",
            b"trailer<</Root 1 0 R>>",
            b"%%EOF",
        ]
    )


def pdf_blocks(
    payload: bytes, page: tuple[float, float] = (PAGE_W, PAGE_H)
) -> list[tuple[Quad, str]]:
    """Parse text blocks: ``(quad in image coords [TL,TR,BR,BL], text)``.

    The quad is reconstructed from the Tm matrix and the pinned glyph
    metrics (w = CHAR_W·len, h = FONT_SIZE) — the parser never sees the
    generator's pre-rotation layout, so deskew/reading order genuinely
    recover it.
    """
    _, h_pg = page
    out: list[tuple[Quad, str]] = []
    for m in _TJ_RE.finditer(payload):
        a, b, c, d, x, y = (float(m.group(i)) for i in range(1, 7))
        text = _unescape(m.group(7))
        w = CHAR_W * len(text)
        h = FONT_SIZE
        # text-space corners (y up): BL,BR,TR,TL
        corners_ts = [(0.0, 0.0), (w, 0.0), (w, h), (0.0, h)]
        quad_img: list[tuple[float, float]] = []
        for u, v in corners_ts:
            px = a * u + c * v + x
            py = b * u + d * v + y
            quad_img.append((px, h_pg - py))
        bl, br, tr, tl = quad_img
        out.append(([tl, tr, br, bl], text))
    return out


def extract_pdf_text(payload: bytes) -> list[str]:
    """Block texts in reading order (L1–L3), cleaned by the caller."""
    blocks = pdf_blocks(payload)
    if not blocks:
        return []
    order = reading_order([q for q, _ in blocks])
    return [blocks[i][1] for i in order]
