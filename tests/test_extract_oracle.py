"""Oracle extractor tests: HTML, PDF, encoding, splitting (SURVEY §5.2)."""

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_document_recognition_service_spark import (
    charsets,
    extract_one,
    gen_pages,
    html_extract,
    pdf_extract,
)


def test_boilerplate_is_stripped():
    html = (
        b"<html><head><meta charset='utf-8'><title>t</title></head><body>"
        b"<nav><ul><li><a href='/'>home link</a></li></ul></nav>"
        b"<div class='content'><h1>Main title</h1>"
        b"<p>real content words here</p></div>"
        b"<footer>copyright footer text</footer></body></html>"
    )
    res = extract_one.extract_document(html, "en")
    assert res.text == "Main title\nreal content words here"
    assert res.n_blocks == 2


def test_link_farm_dropped_by_density():
    html = (
        b"<body><p><a href='/a'>one</a> <a href='/b'>two</a> "
        b"<a href='/c'>three</a></p><p>plain words stay here</p></body>"
    )
    res = extract_one.extract_document(html, "en")
    assert res.text == "plain words stay here"


def test_empty_body_yields_empty_not_dropped():
    # reference bug analog: easy_ocr.py:49-52 silently drops empty crops;
    # we keep the row with empty text (SURVEY §2.5 R2).
    res = extract_one.extract_document(b"<html><body></body></html>", "ru")
    assert res.text == "" and res.n_blocks == 0 and res.error is None


def test_none_payload():
    res = extract_one.extract_document(None, "en")
    assert res.text == "" and res.error is None


def test_payload_cap_yields_error_row():
    big = b"<body><p>" + b"x " * 100 + b"</p></body>"
    ok = extract_one.extract_document(big, "en")
    assert ok.error is None and ok.text
    capped = extract_one.extract_document(big, "en", max_bytes=64)
    assert capped.text is None and capped.n_blocks == 0
    assert capped.error and capped.error.startswith("PayloadTooLarge")


def test_malformed_html_no_crash():
    res = extract_one.extract_document(b"<body><p>alpha beta <b>gamma", "en")
    assert res.error is None
    assert "alpha beta gamma" in res.text


def test_meta_charset_cp1251_decoded():
    body = "<html><head><meta charset=\"windows-1251\"></head><body><p>привет мир слово</p></body></html>"
    res = extract_one.extract_document(body.encode("windows-1251"), "ru")
    assert res.text == "привет мир слово"


def test_whitespace_collapse_f4():
    html = b"<body><p>a\n  b\r\n c   d</p></body>"
    assert extract_one.extract_document(html, "en").text == "a b c d"


def test_homoglyph_normalization_in_en_doc():
    html = "<body><p>Сache and Тoken words</p></body>".encode()
    assert extract_one.extract_document(html, "en").text == "Cache and Token words"


def test_null_lang_detected_ru():
    html = "<body><p>привет мир ёлка дерево слово</p></body>".encode()
    res = extract_one.extract_document(html, None)
    assert res.lang == "ru"


def test_pdf_reading_order_row_major():
    blocks = [
        (40.0, 100.0, "third row"),
        (40.0, 40.0, "first block"),
        (300.0, 40.0, "second block"),
        (300.0, 70.0, "after left"),
        (40.0, 70.0, "left first"),
    ]
    payload = pdf_extract.build_pdf(blocks)
    res = extract_one.extract_document(payload, "en")
    assert res.text == "first block\nsecond block\nleft first\nafter left\nthird row"


def test_pdf_rotated_recovers_order():
    blocks = [
        (40.0, 40.0, "alpha one"),
        (300.0, 40.0, "beta two"),
        (40.0, 80.0, "gamma three"),
    ]
    payload = pdf_extract.build_pdf(blocks, angle=0.1)
    res = extract_one.extract_document(payload, "en")
    assert res.text == "alpha one\nbeta two\ngamma three"


def test_pdf_flate_roundtrip_matches_uncompressed():
    """FlateDecode streams must extract byte-identically to the
    uncompressed serialization of the same layout."""
    pages = [
        [(40.0, 40.0, "alpha one"), (300.0, 40.0, "beta two")],
        [(40.0, 40.0, "page two start"), (40.0, 80.0, "page two end")],
    ]
    for angle in (0.0, 0.08):
        plain = pdf_extract.build_pdf_pages(pages, angle=angle, compress=False)
        flate = pdf_extract.build_pdf_pages(pages, angle=angle, compress=True)
        assert len(flate) != len(plain)
        a = extract_one.extract_document(plain, "en")
        b = extract_one.extract_document(flate, "en")
        assert a.error is None and b.error is None
        assert a == b
        assert a.text == "alpha one\nbeta two\npage two start\npage two end"


def test_pdf_multipage_reading_order_is_per_page():
    """Reading order must be recovered WITHIN each page, pages
    concatenated in Kids order — a global sort would interleave rows
    of different pages that share y coordinates."""
    pages = [
        [(300.0, 40.0, "p1 right"), (40.0, 40.0, "p1 left")],
        [(300.0, 40.0, "p2 right"), (40.0, 40.0, "p2 left")],
        [(40.0, 40.0, "p3 only")],
    ]
    payload = pdf_extract.build_pdf_pages(pages, compress=True)
    res = extract_one.extract_document(payload, "en")
    assert res.text == "p1 left\np1 right\np2 left\np2 right\np3 only"
    assert res.n_blocks == 5


def test_pdf_corrupt_flate_stream_is_error_row():
    payload = pdf_extract.build_pdf_pages(
        [[(40.0, 40.0, "will be corrupted")]], compress=True
    )
    broken = payload.replace(b"stream\n", b"stream\n\x00\x01\x02", 1)
    res = extract_one.extract_document(broken, "en")
    assert res.text is None
    assert res.error and "error" in res.error.lower()


def test_pdf_legacy_uncompressed_profile_still_parses():
    """Round-1 serialization (build_pdf, compress=False) must keep
    parsing identically through the new structured page-tree path."""
    blocks = [(40.0, 40.0, "first block"), (300.0, 40.0, "second block")]
    payload = pdf_extract.build_pdf(blocks)
    assert b"FlateDecode" not in payload
    got = pdf_extract.pdf_blocks(payload)
    assert [t for _, t in got] == ["first block", "second block"]
    assert extract_one.extract_document(payload, "en").text == (
        "first block\nsecond block"
    )


def test_pdf_escapes_roundtrip():
    blocks = [(40.0, 40.0, r"paren (x) back\slash close)")]
    payload = pdf_extract.build_pdf(blocks)
    got = pdf_extract.pdf_blocks(payload)
    assert got[0][1] == r"paren (x) back\slash close)"


def test_split_invariance_whole_corpus(corpus_rows):
    """Split ∘ extract ∘ join == extract, for every row, two thresholds
    (SURVEY §7.4 hard part #1/#4)."""
    n_chunked = 0
    for r in corpus_rows:
        base = extract_one.extract_document(r["html"], r["lang"])
        for tgt in (8 * 1024, 64 * 1024):
            if len(extract_one.split_html(r["html"], tgt)) > 1:
                n_chunked += 1
            sp = extract_one.extract_document_split(r["html"], r["lang"], tgt)
            assert sp.text == base.text, r["url"]
            assert sp.lang == base.lang
    assert n_chunked >= 3  # skew rows exist and actually split


def _split_equals_unsplit(html: bytes, lang: str, tgt: int) -> int:
    """Assert split ∘ extract ∘ join == extract; return chunk count."""
    base = extract_one.extract_document(html, lang)
    sp = extract_one.extract_document_split(html, lang, tgt)
    assert sp.text == base.text
    assert sp.n_blocks == base.n_blocks
    return len(extract_one.split_html(html, tgt))


def test_split_never_cuts_open_boiler_scope():
    """ADVICE r1 (medium): a >target_bytes boilerplate container full of
    </p> closes used to get cut mid-scope, so the next chunk's fresh
    parser classified boiler text as content.  Safe-cut scanner must
    refuse those points and still match the unsplit oracle."""
    para = b"<p>" + b"spam nav words here " * 40 + b"</p>"
    boiler = b"<div class='comment'>" + para * 60 + b"</div>"
    html = (
        b"<body><p>real opening content words</p>"
        + boiler
        + b"<p>real closing content words</p></body>"
    )
    tgt = 4 * 1024
    assert len(boiler) > 4 * tgt  # the boiler scope spans many targets
    n = _split_equals_unsplit(html, "en", tgt)
    assert n >= 1  # may or may not split — byte identity is the contract
    res = extract_one.extract_document_split(html, "en", tgt)
    assert "spam nav words" not in (res.text or "")


def test_split_never_cuts_open_nav_and_anchor_scope():
    nav_para = b"<p>menu item words " * 30 + b"</p>"
    html = (
        b"<body><p>intro content words</p><nav>"
        + nav_para * 40
        + b"</nav><p>after nav content words</p>"
        + b"<a href='/x'><p>"
        + b"anchor text words " * 400
        + b"</p>trailing anchor text</a>"
        + b"<p>final real content words</p></body>"
    )
    for tgt in (2 * 1024, 8 * 1024):
        _split_equals_unsplit(html, "en", tgt)
    res = extract_one.extract_document_split(html, "en", 2 * 1024)
    assert "menu item" not in (res.text or "")
    assert "anchor text" not in (res.text or "")  # link-density drop


def test_split_never_cuts_inside_comment_or_script():
    """Literal </p> bytes inside a comment or a script rawtext body are
    not real close tags; the old byte-search would cut there."""
    comment = b"<!-- " + b"</p> fake close " * 600 + b"-->"
    script = b"<script>var s='" + b"</p>" * 2000 + b"';</script>"
    html = (
        b"<body><p>first real content words</p>"
        + comment
        + script
        + b"<p>second real content words</p>"
        + b"<p>filler words here </p>" * 200
        + b"</body>"
    )
    for tgt in (1024, 4 * 1024):
        n = _split_equals_unsplit(html, "en", tgt)
    assert n >= 2  # the filler tail still provides safe cut points


def test_split_cuts_still_happen_on_plain_documents():
    html = b"<body>" + b"<p>plain real content words</p>" * 500 + b"</body>"
    n = _split_equals_unsplit(html, "en", 2 * 1024)
    assert n > 3  # scanner isn't so conservative it never splits


def test_corpus_golden_hash_frozen(corpus_rows):
    """Freeze the whole-corpus extraction output — any semantic drift in
    parser/normalizer/layout breaks this hash (byte-identity contract).

    Regeneration history (ONLY on deliberate semantic change; recompute
    as md5 of the \\x01-joined extracted texts over corpus_rows):
    - r1  d66b8ef0f99228a88bb74bf754de06ff  initial freeze
    - r2  92b03af0a63420dbeb6e1b9718dbf135  generator emits FlateDecode
          + multi-page PDF variants (gen_pages._build_pdf); HTML rows
          and uncompressed single-page parses are byte-unchanged
    """
    joined = "\x01".join(
        extract_one.extract_document(r["html"], r["lang"]).text or ""
        for r in corpus_rows
    )
    digest = hashlib.md5(joined.encode("utf-8")).hexdigest()
    assert digest == "92b03af0a63420dbeb6e1b9718dbf135"


@settings(max_examples=60, deadline=None)
@given(st.text(alphabet=charsets.VOCAB_MULTI + " \n\t", max_size=400))
def test_clean_text_idempotent(s):
    once = html_extract.clean_text(s)
    assert html_extract.clean_text(once) == once


def test_extraction_deterministic(corpus_rows):
    for r in corpus_rows[:40]:
        a = extract_one.extract_document(r["html"], r["lang"])
        b = extract_one.extract_document(r["html"], r["lang"])
        assert a == b
    # generator itself is deterministic row-by-row
    again = list(gen_pages.gen_rows(40, seed=42))
    for r1, r2 in zip(corpus_rows[:40], again):
        assert r1 == r2


@settings(max_examples=80, deadline=None)
@given(
    st.integers(1, 6),  # rows
    st.integers(1, 3),  # cols
    st.floats(-0.12, 0.12, allow_nan=False),  # doc skew angle
    st.integers(0, 2**30),  # shuffle seed
)
def test_pdf_layout_roundtrip_property(n_rows, n_cols, angle, shuf_seed):
    """Random grid layouts, shuffled emission, uniform skew: the parser
    + L1–L3 ordering must always recover row-major reading order."""
    import random as _r

    blocks = []
    expect = []
    for r in range(n_rows):
        y = 60.0 + r * 40.0
        for c in range(n_cols):
            text = f"r{r}c{c} words"
            blocks.append((40.0 + c * 170.0, y, text))
            expect.append(text)
    shuffled = blocks[:]
    _r.Random(shuf_seed).shuffle(shuffled)
    payload = pdf_extract.build_pdf(shuffled, angle=angle)
    res = extract_one.extract_document(payload, "en")
    assert res.error is None
    assert res.text == "\n".join(expect)


@settings(max_examples=120, deadline=None)
@given(st.data())
def test_split_invariance_property_adversarial(data):
    """Random documents stacked from adversarial pieces (boiler scopes
    holding block closes, anchors wrapping paragraphs, comments/scripts
    containing fake closes, malformed tails), random split targets:
    split ∘ extract ∘ join must ALWAYS equal unsplit extraction."""
    rng_words = ["alpha", "beta", "gamma", "delta", "words", "here"]

    def para(d, n=None):
        k = n or d.draw(st.integers(2, 12))
        ws = [d.draw(st.sampled_from(rng_words)) for _ in range(k)]
        return f"<p>{' '.join(ws)}</p>".encode()

    def piece(d):
        kind = d.draw(st.integers(0, 7))
        if kind == 0:
            return para(d)
        if kind == 1:  # boiler container full of block closes
            return (
                b"<nav>" + b"".join(para(d) for _ in range(d.draw(st.integers(1, 6)))) + b"</nav>"
            )
        if kind == 2:  # attr-raised boiler
            return (
                b"<div class='sidebar'>" + para(d) + para(d) + b"</div>"
            )
        if kind == 3:  # anchor wrapping paragraphs (open <a> across closes)
            return b"<a href='/x'>" + para(d) + b"trailing link text</a>"
        if kind == 4:  # comment with fake closes
            return b"<!-- " + b"</p></h1> " * d.draw(st.integers(1, 10)) + b"-->"
        if kind == 5:  # script rawtext with fake closes
            return b"<script>var s='" + b"</p>" * d.draw(st.integers(1, 10)) + b"';</script>"
        if kind == 6:  # heading
            return ("<h2>%s title words</h2>" % d.draw(st.sampled_from(rng_words))).encode()
        # malformed fragment (unclosed tags)
        return b"<div><p>dangling " + d.draw(st.sampled_from(rng_words)).encode()

    n_pieces = data.draw(st.integers(3, 25))
    html = b"<body>" + b"".join(piece(data) for _ in range(n_pieces)) + b"</body>"
    tgt = data.draw(st.sampled_from([64, 256, 1024]))
    lang = data.draw(st.sampled_from(["en", None]))
    base = extract_one.extract_document(html, lang)
    sp = extract_one.extract_document_split(html, lang, tgt)
    assert sp.text == base.text
    assert sp.n_blocks == base.n_blocks
    assert sp.lang == base.lang


def test_metaless_cp1251_detected_by_heuristic():
    """A cp1251 page with NO meta charset must decode via the
    deterministic legacy-encoding heuristic (chardet analog)."""
    body = "<html><head><title>т</title></head><body><p>привет мир слово дерево</p></body></html>"
    raw = body.encode("windows-1251")
    assert html_extract._CHARSET_RE.search(raw) is None
    assert html_extract.detect_legacy_encoding(raw) == "windows-1251"
    res = extract_one.extract_document(raw, "ru")
    assert res.text == "привет мир слово дерево"
    # valid UTF-8 without meta is untouched (strict decode wins)
    utf = "<body><p>привет мир слово дерево</p></body>".encode()
    assert extract_one.extract_document(utf, "ru").text == "привет мир слово дерево"
    # ascii-only no-meta: nothing to detect
    assert html_extract.detect_legacy_encoding(b"<p>plain</p>") == "utf-8"


def test_metaless_non_utf8_is_never_split():
    body = "<body>" + "<p>привет мир слово дерево</p>" * 500 + "</body>"
    raw = body.encode("windows-1251")
    assert len(raw) > 4096
    assert extract_one.split_html(raw, 4096) == [raw]
    base = extract_one.extract_document(raw, "ru")
    sp = extract_one.extract_document_split(raw, "ru", 4096)
    assert sp.text == base.text


def test_corpus_contains_metaless_cp1251_rows(corpus_rows):
    n = sum(
        1
        for r in corpus_rows
        if not pdf_extract.is_pdf(r["html"])
        and html_extract._CHARSET_RE.search(r["html"][:2048]) is None
        and html_extract.detect_legacy_encoding(r["html"]) == "windows-1251"
    )
    assert n >= 1  # the engineered variant exists and round-trips


def test_metaless_latin1_not_misdetected_as_cp1251():
    """Undeclared latin-1/cp1252 pages share the 0xC0-0xFF band with
    cp1251 Cyrillic, but their accents occur ISOLATED inside ASCII
    words — the adjacency discriminator must route them to
    UTF-8-with-replacement, never Cyrillic mojibake."""
    body = (
        "<html><body><p>Le café préféré de Noël, déjà vu, très tôt, "
        "señora, über, fête, garçon, âme, così</p></body></html>"
    )
    raw = body.encode("latin-1")
    assert html_extract.detect_legacy_encoding(raw) == "utf-8"
    text = html_extract.sniff_decode(raw)
    # ASCII skeleton preserved; no Cyrillic letters introduced
    assert "caf" in text and "Le" in text
    assert not any("Ѐ" <= ch <= "ӿ" for ch in text)

    # and real metaless cp1251 (high-byte RUNS) still detects
    ru = "<html><body><p>привет мир это русский текст</p></body></html>"
    assert (
        html_extract.detect_legacy_encoding(ru.encode("windows-1251"))
        == "windows-1251"
    )
