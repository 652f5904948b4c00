"""Per-script character algebra (SURVEY §2.5 R3–R7).

Re-expresses, from scratch, the reference's charset semantics:

- the 24-entry Cyrillic→Latin homoglyph ("visual duplicate") map
  (reference ``core/utils/ctc_decoder.py:11-36``),
- per-language alphabets en/ru/kz (``core/utils/ctc_decoder.py:38-42``;
  the input table uses ISO code ``kk`` for Kazakh — aliased here),
- the multi-language vocab union + per-language index groups
  (``core/utils/ctc_decoder.py:44-75``),
- the *pinned* definition of the "common" group: characters present in
  more than one language after homoglyph normalization.  The reference
  reads ``group_indices["common"]`` (``ctc_decoder.py:108``) but never
  defines it (construction commented out at ``ctc_decoder.py:57``) —
  a latent KeyError on a dead code path.  We pin the commented intent
  and test it (SURVEY §2.5 R7).

Everything here is import-time static data: at Spark level these become
broadcast literals compiled into ``translate``/``regexp_replace``
expressions and the extraction kernel's normalization tables.
"""

from __future__ import annotations

from collections import Counter

# --- Homoglyph map: Cyrillic letters visually identical to Latin ones.
# (reference duplicate_map, core/utils/ctc_decoder.py:11-36)
HOMOGLYPH_MAP: dict[str, str] = {
    "А": "A", "а": "a",
    "В": "B", "в": "b",
    "Е": "E", "е": "e",
    "К": "K", "к": "k",
    "М": "M", "м": "m",
    "Н": "H", "н": "h",
    "О": "O", "о": "o",
    "Р": "P", "р": "p",
    "С": "C", "с": "c",
    "Т": "T", "т": "t",
    "У": "Y", "у": "y",
    "Х": "X", "х": "x",
}

# Source/target strings for Spark's native translate() (SURVEY §2.9).
HOMOGLYPH_SRC: str = "".join(HOMOGLYPH_MAP.keys())
HOMOGLYPH_DST: str = "".join(HOMOGLYPH_MAP.values())

# --- Special (language-independent) characters appended to the vocab
# (reference SPECIAL_VOCAB_CHARS, core/utils/ctc_decoder.py:9)
SPECIAL_VOCAB_CHARS: str = '0123456789!$#()?-.,:;@%&*+=[]{}"'

# --- Per-language alphabets (reference lang_defs, ctc_decoder.py:38-42).
# Keys use the input table's ISO codes: kk == the reference's "kz".
LANG_DEFS: dict[str, str] = {
    "en": "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz",
    "ru": "АБВГДЕЁЖЗИЙКЛМНОПРСТУФХЦЧШЩЪЫЬЭЮЯабвгдеёжзийклмнопрстуфхцчшщъыьэюя",
    "kk": (
        "ӘІҢҒҮҰҚӨҺәіңғүұқөһ"
        "АБВГДЕЖЗИЙКЛМНОПРСТУФХЦЧШЩЪЫЬЭЮЯ"
        "абвгдежзийклмнопрстуфхцчшщъыьэюя"
    ),
}

LANGS: tuple[str, ...] = ("en", "ru", "kk")  # vote order pinned (R6 tie-break)


def _norm(chars: str) -> set[str]:
    """Homoglyph-normalize a charset (ctc_decoder.py:45-48 semantics)."""
    return {HOMOGLYPH_MAP.get(c, c) for c in chars}


# Per-language normalized charsets and char→lang membership counts
# (ctc_decoder.py:50-54).
NORM_CHARS_BY_LANG: dict[str, set[str]] = {l: _norm(a) for l, a in LANG_DEFS.items()}

_char_lang_count: Counter[str] = Counter()
for _chars in NORM_CHARS_BY_LANG.values():
    for _c in _chars:
        _char_lang_count[_c] += 1

# Pinned "common" group: chars in >1 language after normalization
# (the commented-out intent at ctc_decoder.py:53-57).
COMMON_CHARS: frozenset[str] = frozenset(
    c for c, n in _char_lang_count.items() if n > 1
)

# Raw (un-normalized) per-language groups — mirrors en_only/ru_only/kz_only
# at ctc_decoder.py:58-60 (which, as shipped, are the full raw alphabets).
GROUP_CHARS: dict[str, frozenset[str]] = {
    lang: frozenset(LANG_DEFS[lang]) for lang in LANGS
}

# Multi-language vocab: sorted union of the three alphabets + specials
# (ctc_decoder.py:62-66).
VOCAB_MULTI: str = (
    "".join(sorted(GROUP_CHARS["en"] | GROUP_CHARS["ru"] | GROUP_CHARS["kk"]))
    + SPECIAL_VOCAB_CHARS
)

CHAR_TO_IDX: dict[str, int] = {c: i for i, c in enumerate(VOCAB_MULTI)}

GROUP_IDXS: dict[str, frozenset[int]] = {
    lang: frozenset(CHAR_TO_IDX[c] for c in chars)
    for lang, chars in GROUP_CHARS.items()
}

# Characters the extractor always passes through unchanged: block joiner
# and in-block separator survive normalization.
_PASSTHROUGH: frozenset[str] = frozenset(" \n")

# Allowed output charset per language = own alphabet ∪ common ∪ specials
# ∪ passthrough (masked-decode analog, ctc_decoder.py:103-115: output is
# restricted to common ∪ detected language).
ALLOWED_BY_LANG: dict[str, frozenset[str]] = {
    lang: frozenset(LANG_DEFS[lang])
    | COMMON_CHARS
    | frozenset(SPECIAL_VOCAB_CHARS)
    | _PASSTHROUGH
    for lang in LANGS
}

import re as _re


def _build_lang_norm(lang: str):
    """(single-pass replacer, disallowed-char regex) for *lang*.

    Semantics: map homoglyphs whose Latin counterpart is allowed but
    whose Cyrillic form is not; delete every other disallowed char.
    Because every homoglyph source is itself disallowed, BOTH steps
    touch exactly the disallowed chars — so one ``drop_re.sub`` with a
    table-lookup replacer equals the old translate-then-delete pair,
    while doing work proportional to the number of DISALLOWED chars
    (usually a handful) instead of a full-string translate (profiled:
    str.translate was ~6% of the kernel).
    """
    allowed = ALLOWED_BY_LANG[lang]
    table = {
        src: dst
        for src, dst in HOMOGLYPH_MAP.items()
        if src not in allowed and dst in allowed
    }
    cls = "".join(_re.escape(c) for c in sorted(allowed))
    drop_re = _re.compile(f"[^{cls}]")

    def repl(m: "_re.Match[str]", _get=table.get) -> str:
        return _get(m.group(), "")

    return repl, drop_re


_LANG_NORM = {lang: _build_lang_norm(lang) for lang in LANGS}


def normalize_text(text: str, lang: str) -> str:
    """Per-script output normalization (masked-decode analog, R7).

    Keeps characters allowed for *lang* (own alphabet ∪ common ∪
    SPECIAL_VOCAB_CHARS ∪ space/newline); maps disallowed homoglyphs to
    their allowed Latin counterpart; drops everything else.  Pinned,
    deterministic, order-preserving.
    """
    repl, drop_re = _LANG_NORM.get(lang, _LANG_NORM["en"])
    if drop_re.search(text) is None:
        # no disallowed char ⇒ nothing to map or drop — the common
        # clean-text fast path
        return text
    return drop_re.sub(repl, text)


def detect_language(text: str, prefix_chars: int = 256) -> str:
    """Majority-vote language detection (R6 analog of
    ``MaskedCTCDecoder.detect_language``, ctc_decoder.py:90-101).

    Counts membership of the first *prefix_chars* characters in each
    language's raw alphabet group; returns the argmax, ties broken by
    the pinned order en, ru, kk (the reference's ``max(..., key=get)``
    over insertion-ordered ``["en","ru","kz"]``).
    """
    counts = {lang: 0 for lang in LANGS}
    for c in text[:prefix_chars]:
        for lang in LANGS:
            if c in GROUP_CHARS[lang]:
                counts[lang] += 1
    return max(counts, key=counts.get)  # type: ignore[arg-type]
