"""Pure-Python single-document reference extractor — the ORACLE.

Defines byte-identical truth for the whole engine (SURVEY §7.1 step 2):
golden texts are generated from this module once and frozen; pytest
asserts that the Spark pipeline reproduces them byte-for-byte per url,
including through the salted/split skew path.

Stage order per document (mirrors the reference pipeline
loader→detector→postprocessor→recognizer, ``core/pipelines/run.py:27-41``,
re-expressed for web pages):

1. format dispatch by magic bytes (F5) — ``%PDF`` vs HTML;
2. decode (HTML: charset sniff §1.4; PDF: pinned mini-PDF profile);
3. block candidates (HTML: DOM walk + boilerpipe scoring D1/D3;
   PDF: coordinate blocks + L1–L3 reading order);
4. per-block whitespace cleanup (F4);
5. language = given ``lang`` or majority vote over block text (R6);
6. per-script normalization (R3–R7);
7. join non-empty blocks with ``\\n``.

Errors never propagate (the reference swallows per-stage exceptions,
``base.py:37-41`` — an anti-pattern): here they surface as
``text=None`` + an ``error`` string, countable in lineage.
"""

from __future__ import annotations

from dataclasses import dataclass

from . import charsets, html_extract, pdf_extract


@dataclass(frozen=True)
class ExtractResult:
    text: str | None
    n_blocks: int
    lang: str | None  # language actually used for normalization
    error: str | None = None


def _finalize(blocks: list[str], lang: str | None) -> ExtractResult:
    blocks = [b for b in blocks if b]
    used = lang if lang in charsets.LANGS else charsets.detect_language(
        " ".join(blocks)
    )
    normed = [charsets.normalize_text(b, used) for b in blocks]
    normed = [b for b in (t.strip() for t in normed) if b]
    return ExtractResult(text="\n".join(normed), n_blocks=len(normed), lang=used)


# Hard payload cap: a single row above this is a data error, not skew
# (skew up to the cap is handled by salting).  At 100 TB a handful of
# pathological multi-GB "pages" must become error rows, not OOMs.
MAX_PAYLOAD_BYTES = 64 * 1024 * 1024


def extract_document(
    payload: bytes | None,
    lang: str | None,
    max_bytes: int = MAX_PAYLOAD_BYTES,
) -> ExtractResult:
    """Extract main content from one page payload (HTML or PDF bytes)."""
    if payload is None or len(payload) == 0:
        return ExtractResult(text="", n_blocks=0, lang=lang)
    if max_bytes and len(payload) > max_bytes:
        return ExtractResult(
            text=None,
            n_blocks=0,
            lang=lang,
            error=f"PayloadTooLarge: {len(payload)} > {max_bytes} bytes",
        )
    try:
        if pdf_extract.is_pdf(payload):
            blocks = [
                html_extract.clean_text(t)
                for t in pdf_extract.extract_pdf_text(payload)
            ]
        else:
            blocks = html_extract.extract_html_text(
                html_extract.sniff_decode(payload)
            )
        return _finalize(blocks, lang)
    except Exception as exc:  # surfaced, never swallowed (§4 error handling)
        return ExtractResult(
            text=None, n_blocks=0, lang=lang, error=f"{type(exc).__name__}: {exc}"
        )


# ---------------------------------------------------------------------------
# Salt-split support (SURVEY §4 "Skew handling", §7.1 step 5).
# Oversized HTML payloads are split at top-level block boundaries; each
# chunk extracts independently; chunks re-join with "\n".  Because every
# feature in html_extract is block-local, split ∘ extract ∘ join is
# byte-identical to unsplit extraction — asserted by tests.
# ---------------------------------------------------------------------------

# Cut only after paragraph/heading closes: these never occur inside the
# boilerplate containers our model recognizes, so chunk boundaries can't
# sever a boiler scope.  </li>/</div> are deliberately NOT markers.
_SPLIT_MARKERS = (b"</p>", b"</h1>", b"</h2>", b"</h3>")


def split_html(raw: bytes, target_bytes: int) -> list[bytes]:
    """Split raw HTML into ~target_bytes chunks at safe block boundaries.

    A cut happens only immediately after a block close marker, so no
    block (or boilerplate container) is ever severed.  PDF payloads are
    never split (document-global deskew/median stats, L2/L3); non-UTF-8
    documents are never split (chunks 1+ would lose the ``meta charset``
    declaration sniffed in chunk 0).
    """
    if len(raw) <= target_bytes or pdf_extract.is_pdf(raw):
        return [raw]
    m = html_extract._CHARSET_RE.search(raw[:2048])
    if m and m.group(1).lower() not in (b"utf-8", b"utf8"):
        return [raw]
    chunks: list[bytes] = []
    start = 0
    n = len(raw)
    while n - start > target_bytes:
        # find the closest marker at/after the target cut point
        cut = -1
        for marker in _SPLIT_MARKERS:
            pos = raw.find(marker, start + target_bytes)
            if pos != -1:
                end = pos + len(marker)
                if cut == -1 or end < cut:
                    cut = end
        if cut == -1:
            break
        chunks.append(raw[start:cut])
        start = cut
    chunks.append(raw[start:])
    return chunks


def extract_document_split(
    payload: bytes | None,
    lang: str | None,
    target_bytes: int,
    max_bytes: int = MAX_PAYLOAD_BYTES,
) -> ExtractResult:
    """Oracle for the salted path: split, extract per chunk, re-join.
    Payloads above the hard cap short-circuit to the error row (the
    pipeline routes them away from the split branch the same way)."""
    if (
        payload is None
        or len(payload) == 0
        or (max_bytes and len(payload) > max_bytes)
        or pdf_extract.is_pdf(payload)
    ):
        return extract_document(payload, lang, max_bytes=max_bytes)
    parts = split_html(payload, target_bytes)
    if len(parts) == 1:
        return extract_document(payload, lang)
    # Language must be decided once per document (chunks may skew the
    # vote): use the given lang, else vote over the full payload.
    if lang not in charsets.LANGS:
        full = html_extract.extract_html_text(html_extract.sniff_decode(payload))
        lang = charsets.detect_language(" ".join(b for b in full if b))
    results = [extract_document(p, lang) for p in parts]
    err = next((r.error for r in results if r.error), None)
    if err:
        return ExtractResult(text=None, n_blocks=0, lang=lang, error=err)
    texts = [r.text for r in results if r.text]
    return ExtractResult(
        text="\n".join(texts),
        n_blocks=sum(r.n_blocks for r in results),
        lang=lang,
    )
