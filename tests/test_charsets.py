"""Charset algebra tests (SURVEY §2.5 R3–R7, §5.2 item 2)."""

from ocr_document_recognition_service_spark import charsets


def test_homoglyph_map_is_24_entries_and_bijective_pairs():
    # reference duplicate_map has 24 entries (ctc_decoder.py:11-36)
    assert len(charsets.HOMOGLYPH_MAP) == 24
    assert len(charsets.HOMOGLYPH_SRC) == len(charsets.HOMOGLYPH_DST) == 24
    # every source is Cyrillic, every target Latin
    for src, dst in charsets.HOMOGLYPH_MAP.items():
        assert "Ѐ" <= src <= "ӿ"
        assert dst.isascii()


def test_vocab_union_matches_reference_construction():
    # VOCAB_MULTI = sorted(en ∪ ru ∪ kz) + specials (ctc_decoder.py:58-66)
    letters = set(charsets.LANG_DEFS["en"]) | set(charsets.LANG_DEFS["ru"]) | set(
        charsets.LANG_DEFS["kk"]
    )
    assert charsets.VOCAB_MULTI == "".join(sorted(letters)) + charsets.SPECIAL_VOCAB_CHARS
    # no duplicate indices
    assert len(charsets.CHAR_TO_IDX) == len(charsets.VOCAB_MULTI)


def test_group_idxs_partition_membership():
    for lang in charsets.LANGS:
        for idx in charsets.GROUP_IDXS[lang]:
            assert charsets.VOCAB_MULTI[idx] in charsets.LANG_DEFS[lang]


def test_common_group_pinned_semantics():
    # common = chars in >1 language AFTER homoglyph normalization —
    # the commented-out intent at ctc_decoder.py:53-57, pinned (R7).
    assert "a" in charsets.COMMON_CHARS  # en + normalized ru 'а'
    assert "г" in charsets.COMMON_CHARS  # ru + kk share plain Cyrillic
    assert "ә" not in charsets.COMMON_CHARS  # kk-only
    assert "ё" not in charsets.COMMON_CHARS  # ru-only (kk def has no ё)
    assert "z" not in charsets.COMMON_CHARS  # en-only, no homoglyph twin


def test_normalize_en_maps_cyrillic_homoglyphs_to_latin():
    # "Тoken" with Cyrillic Т in an English doc → Latin T
    assert charsets.normalize_text("Тoken", "en") == "Token"
    assert charsets.normalize_text("Сache Мodel", "en") == "Cache Model"


def test_normalize_ru_keeps_latin_common_chars():
    # Latin homoglyph chars are in COMMON (normalized ru covers them)
    assert charsets.normalize_text("Tекст", "ru") == "Tекст"


def test_normalize_drops_foreign_script_and_noise():
    assert charsets.normalize_text("a§b€c中", "en") == "abc"
    # kk-specific letters dropped in a ru document
    assert charsets.normalize_text("қазақ", "ru") == "аза"


def test_normalize_preserves_specials_and_whitespace():
    s = 'x (1), [2]; "y"!\nz'
    assert charsets.normalize_text(s, "en") == s


def test_detect_language_majority_vote_and_tie_order():
    assert charsets.detect_language("hello world") == "en"
    assert charsets.detect_language("привет мир ёлка") == "ru"
    assert charsets.detect_language("әліпби қазақша") == "kk"
    # empty text → all zero → pinned tie-break order: en first
    assert charsets.detect_language("") == "en"


def test_normalize_idempotent():
    for lang in charsets.LANGS:
        s = "Тoken привет әліпби 123 (x)"
        once = charsets.normalize_text(s, lang)
        assert charsets.normalize_text(once, lang) == once
