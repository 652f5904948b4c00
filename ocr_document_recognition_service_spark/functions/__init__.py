"""Scalar-function helpers shared by plans (SURVEY §2.9)."""

from pyspark.sql import functions as F

from ..charsets import HOMOGLYPH_DST, HOMOGLYPH_SRC


def homoglyph_latinize(col) -> "F.Column":
    """R3 homoglyph normalization as native translate (ctc_decoder.py:11-36)."""
    return F.translate(col, HOMOGLYPH_SRC, HOMOGLYPH_DST)


def whitespace_norm(col) -> "F.Column":
    """F4 whitespace cleanup (clean_text, wiki_parser_to_pdf.py:22-26)."""
    return F.trim(F.regexp_replace(col, r"\s+", " "))


def norm_fingerprint(col) -> "F.Column":
    """Canonical md5 fingerprint over normalized text."""
    return F.md5(F.lower(whitespace_norm(homoglyph_latinize(col))))
