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
pins a deterministic mini-PDF profile that our corpus generator emits
and this parser reads.  Content streams hold

    BT a b c d x y Tm (text) Tj ET

one text block per BT/ET pair, ``Tm`` carrying the full placement
matrix (rotation included), string bytes UTF-8 with ``\\``/``(``/``)``
escaped.  Documents may be **multi-page** (catalog → pages → Kids,
one content stream per page, reading order restored per page then
concatenated in Kids order) and streams may be **FlateDecode**
compressed (stdlib ``zlib`` — the compression real Common-Crawl PDFs
carry; the reference reads those via fitz rasterization,
image_loader.py:33-43).  A real-PDF backend (PyMuPDF
``page.get_text("blocks")``) drops in behind the same ``pdf_blocks()``
signature on a cluster.
"""

from __future__ import annotations

import math
import re
import zlib
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


def _page_stream(
    blocks: Iterable[tuple[float, float, str]],
    angle: float,
    page: tuple[float, float],
) -> bytes:
    """Serialize one page's blocks into a BT/Tm/Tj content stream."""
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
    return b"\n".join(lines)


def _deflate_collides(z: bytes) -> bool:
    """True if deflate output could confuse the tolerant parser: test
    the ACTUAL parser regexes (_OBJ_HDR_RE matches any whitespace
    separators, e.g. b'7\\n0\\nobj'; _KIDS_RE/_CONTENTS_RE inject
    phantom structure), not just space-separated literals."""
    return bool(
        _OBJ_HDR_RE.search(z)
        or _KIDS_RE.search(z)
        or _CONTENTS_RE.search(z)
        or b"endstream" in z
        or b"endobj" in z
    )


def _clean_deflate(data: bytes) -> bytes:
    """zlib-compress, re-trying compression levels in the
    (astronomically unlikely) case the deflate bytes collide with a PDF
    structural pattern the tolerant parser scans for; as the last
    resort, store uncompressed-deflate (level 0 emits stored blocks of
    the literal stream — which the caller already guarantees is free of
    structural collisions, since it generated it)."""
    for lvl in (6, 9, 1, 2, 3, 4, 5, 7, 8, 0):
        z = zlib.compress(data, lvl)
        if not _deflate_collides(z):
            return z
    return z


def build_pdf_pages(
    pages: list[list[tuple[float, float, str]]],
    angle: float = 0.0,
    page: tuple[float, float] = (PAGE_W, PAGE_H),
    compress: bool = False,
) -> bytes:
    """Serialize a multi-page document in the mini-PDF profile.

    Each entry of *pages* is one page's ``(x, y, text)`` blocks (image
    coordinates, emission order arbitrary — reading order must be
    recovered per page).  *compress* FlateDecode-compresses every
    content stream (stdlib zlib).  Object layout: 1 = catalog,
    2 = pages, then per page i: 3+2i = page, 4+2i = contents.
    """
    w_pg, h_pg = page
    n = len(pages)
    kid_refs = b" ".join(b"%d 0 R" % (3 + 2 * i) for i in range(n))
    objs: list[bytes] = [
        b"1 0 obj<</Type/Catalog/Pages 2 0 R>>endobj",
        b"2 0 obj<</Type/Pages/Kids[%s]/Count %d>>endobj" % (kid_refs, n),
    ]
    for i, blocks in enumerate(pages):
        stream = _page_stream(blocks, angle, page)
        filt = b""
        if compress:
            stream = _clean_deflate(stream)
            filt = b"/Filter/FlateDecode"
        objs.append(
            b"%d 0 obj<</Type/Page/Parent 2 0 R/MediaBox[0 0 %d %d]"
            b"/Contents %d 0 R>>endobj"
            % (3 + 2 * i, int(w_pg), int(h_pg), 4 + 2 * i)
        )
        objs.append(
            b"%d 0 obj<</Length %d%s>>stream" % (4 + 2 * i, len(stream), filt)
        )
        objs.append(stream)
        objs.append(b"endstream")
        objs.append(b"endobj")
    return b"\n".join(
        [
            b"%PDF-1.4",
            b"%\xe2\xe3\xcf\xd3",
            *objs,
            b"trailer<</Root 1 0 R>>",
            b"%%EOF",
        ]
    )


def build_pdf(
    blocks: Iterable[tuple[float, float, str]],
    angle: float = 0.0,
    page: tuple[float, float] = (PAGE_W, PAGE_H),
    compress: bool = False,
) -> bytes:
    """Single-page convenience wrapper over ``build_pdf_pages`` —
    byte-identical to the round-1 uncompressed profile when
    ``compress=False`` (frozen corpus compatibility)."""
    return build_pdf_pages(
        [list(blocks)], angle=angle, page=page, compress=compress
    )


_OBJ_HDR_RE = re.compile(rb"(\d+)\s+0\s+obj")
_KIDS_RE = re.compile(rb"/Kids\s*\[([^\]]{0,10000})\]")
_REF_RE = re.compile(rb"(\d+)\s+0\s+R")
_CONTENTS_RE = re.compile(rb"/Contents\s+(\d+)\s+0\s+R")
_STREAM_HDR_RE = re.compile(rb"<<(.{0,2000}?)>>\s*stream\r?\n", re.DOTALL)
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)")


def _objects(payload: bytes) -> dict[int, bytes]:
    """num → body for every top-level ``N 0 obj``; bodies extend to the
    next object header (robust to binary stream data — stream extents
    are then sliced by ``/Length``, never by ``endobj`` search)."""
    hdrs = list(_OBJ_HDR_RE.finditer(payload))
    objs: dict[int, bytes] = {}
    for i, m in enumerate(hdrs):
        end = hdrs[i + 1].start() if i + 1 < len(hdrs) else len(payload)
        objs.setdefault(int(m.group(1)), payload[m.end():end])
    return objs


def _stream_data(body: bytes) -> bytes | None:
    """Content-stream bytes of one object, FlateDecode'd if declared.
    A corrupt deflate stream raises (zlib.error) — surfaced by the
    caller as an extraction error row, never swallowed."""
    m = _STREAM_HDR_RE.search(body)
    if not m:
        return None
    d, start = m.group(1), m.end()
    lm = _LENGTH_RE.search(d)
    if lm:
        data = body[start:start + int(lm.group(1))]
    else:
        end = body.rfind(b"endstream")
        data = body[start:end if end != -1 else len(body)].rstrip(b"\r\n")
    if b"FlateDecode" in d:
        data = zlib.decompress(data)
    return data


def _page_streams(payload: bytes) -> list[bytes] | None:
    """Per-page content streams in Kids order, or None when the payload
    has no parseable page tree (bare-stream legacy profile)."""
    km = _KIDS_RE.search(payload)
    if not km:
        return None
    objs = _objects(payload)
    streams: list[bytes] = []
    for rm in _REF_RE.finditer(km.group(1)):
        kid = objs.get(int(rm.group(1)))
        if kid is None:
            continue
        cm = _CONTENTS_RE.search(kid)
        if cm is None:
            continue
        body = objs.get(int(cm.group(1)))
        if body is None:
            continue
        data = _stream_data(body)
        if data is not None:
            streams.append(data)
    return streams or None


def _stream_blocks(
    stream: bytes, page: tuple[float, float]
) -> list[tuple[Quad, str]]:
    """Text blocks of ONE content stream (see ``pdf_blocks``)."""
    _, h_pg = page
    out: list[tuple[Quad, str]] = []
    for m in _TJ_RE.finditer(stream):
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


def pdf_pages(
    payload: bytes, page: tuple[float, float] = (PAGE_W, PAGE_H)
) -> list[list[tuple[Quad, str]]]:
    """Blocks per page, pages in Kids order.  Payloads without a page
    tree parse as one page over the raw bytes (legacy bare profile)."""
    streams = _page_streams(payload)
    if streams is None:
        return [_stream_blocks(payload, page)]
    return [_stream_blocks(s, page) for s in streams]


def pdf_blocks(
    payload: bytes, page: tuple[float, float] = (PAGE_W, PAGE_H)
) -> list[tuple[Quad, str]]:
    """Parse text blocks: ``(quad in image coords [TL,TR,BR,BL], text)``
    — all pages flattened in page order.

    The quad is reconstructed from the Tm matrix and the pinned glyph
    metrics (w = CHAR_W·len, h = FONT_SIZE) — the parser never sees the
    generator's pre-rotation layout, so deskew/reading order genuinely
    recover it.
    """
    return [b for pg in pdf_pages(payload, page) for b in pg]


def extract_pdf_text(payload: bytes) -> list[str]:
    """Block texts in reading order: L1–L3 recovered WITHIN each page
    (deskew/median stats are per-page), pages concatenated in document
    order.  Cleaned by the caller."""
    texts: list[str] = []
    for blocks in pdf_pages(payload):
        if not blocks:
            continue
        order = reading_order([q for q, _ in blocks])
        texts.extend(blocks[i][1] for i in order)
    return texts
