"""Scalar text functions (SURVEY.md §2.3 T1–T5) as pure Column expressions.

Everything here stays inside whole-stage codegen — no Python in the hot path.
Semantics follow the reference exactly (citations inline); the pure-Python
twin lives in ``tests/reference_impl.py``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ocr_spark import config

# Cyrillic char classes. The reference uses TWO subtly different counts:
#  * ocr_service._detect_language (ocr_service.py:650): lowercases first,
#    then counts 'а'<=c<='я' — NOTE: 'ё' (U+0451) is OUTSIDE that range.
#  * pdf_processor per-line counts (pdf_processor.py:304,:436): counts
#    'а'<=c.lower()<='я' OR c in the full alphabet incl 'ё' → effectively
#    [а-яё] on the lowered char.
_CYR_NO_YO = "а-я"
_CYR_WITH_YO = "а-яё"


def _count_chars(col: Column, char_class: str) -> Column:
    """Number of characters of ``col`` inside the regex class (JVM-side)."""
    return F.length(col) - F.length(F.regexp_replace(col, f"[{char_class}]", ""))


def normalize_text(col: Column) -> Column:
    """T1 (metrics_calculator.py:280-302): lower, collapse \\s+ to ' ', strip."""
    collapsed = F.regexp_replace(F.lower(F.coalesce(col, F.lit(""))), r"(?U)\s+", " ")
    return F.regexp_replace(collapsed, r"^ | $", "")


def py_strip(col: Column) -> Column:
    """Python ``str.strip()`` (all whitespace kinds, unlike Spark trim)."""
    return F.regexp_replace(F.coalesce(col, F.lit("")), r"(?U)^\s+|\s+$", "")


def split_words(col: Column) -> Column:
    """T2 (metrics_calculator.py:304-321): normalize then split on spaces.

    Returns an empty array for empty text (Python ``"".split() == []``).
    """
    norm = normalize_text(col)
    return F.when(norm == "", F.array().cast("array<string>")).otherwise(F.split(norm, " "))


def char_set(col: Column) -> Column:
    """Distinct characters of the *normalized* text (set semantics of
    metrics_calculator.py:171-173; includes the space character)."""
    norm = normalize_text(col)
    return F.array_distinct(F.filter(F.split(norm, ""), lambda c: c != ""))


def word_set(col: Column) -> Column:
    """Distinct normalized words (metrics_calculator.py:209-210)."""
    return F.array_distinct(split_words(col))


def cyrillic_count(col: Column, include_yo: bool = True) -> Column:
    """Script char count on the lowered text (pdf variant includes 'ё',
    ocr variant does not — see module docstring)."""
    cls = _CYR_WITH_YO if include_yo else _CYR_NO_YO
    return _count_chars(F.lower(F.coalesce(col, F.lit(""))), cls)


def latin_count(col: Column) -> Column:
    return _count_chars(F.lower(F.coalesce(col, F.lit(""))), "a-z")


def detect_language_ocr(col: Column) -> Column:
    """T4, ocr_service.py:632-662: 'ru' / 'en' / 'mixed' / 'unknown'.

    Empty or null text → 'unknown' is only produced by the reference when the
    input *list* is empty; a present-but-empty string gives cyr==lat==0 →
    'mixed'. We mirror that: null → 'unknown', else compare counts.
    """
    cyr = cyrillic_count(col, include_yo=False)
    lat = latin_count(col)
    return (
        F.when(col.isNull(), F.lit("unknown"))
        .when(cyr > lat, F.lit("ru"))
        .when(lat > cyr, F.lit("en"))
        .otherwise(F.lit("mixed"))
    )


def line_language(col: Column) -> Column:
    """Per-line language of the PDF path (pdf_processor.py:789-797):
    'ru' if cyr>lat and cyr>0; 'en' if lat>cyr and lat>0; else 'mixed'."""
    cyr = cyrillic_count(col, include_yo=True)
    lat = latin_count(col)
    return (
        F.when((cyr > lat) & (cyr > 0), F.lit("ru"))
        .when((lat > cyr) & (lat > 0), F.lit("en"))
        .otherwise(F.lit("mixed"))
    )


def text_quality_score(col: Column) -> Column:
    """T5 (ocr_service.py:154-168): 2*cyr_ratio + word_density + 0.5*length_score.

    cyr follows the reference's exact quirk: ``'а'<=ch.lower()<='я' or ch
    in 'ёй'`` — the literal check is on the UNLOWERED char, so lowercase
    'ё' counts but uppercase 'Ё' does NOT ('й' is inside а-я either way).
    num_alpha counts Unicode letters; words = whitespace tokens containing
    a letter; word_density = #words / max(1, len/25); length_score =
    min(len/1000, 1). Returns 0.0 for empty / letterless text.
    """
    c = F.coalesce(col, F.lit(""))
    # Python ch.isalpha() over our corpora = Unicode letters; [а-яёa-z] on
    # lowered text covers ru/en (the only alphabets the reference handles).
    num_alpha = _count_chars(F.lower(c), "а-яёa-z")
    cyr = cyrillic_count(c, include_yo=False) + _count_chars(c, "ё")
    cyr_ratio = cyr / F.greatest(F.lit(1), num_alpha)
    # words with at least one letter
    toks = F.filter(
        F.split(py_strip(c), r"(?U)\s+"),
        lambda w: w.rlike("[а-яёА-ЯЁa-zA-Z]"),
    )
    word_density = F.size(toks) / F.greatest(F.lit(1.0), F.length(c) / F.lit(25.0))
    length_score = F.least(F.length(c) / F.lit(1000.0), F.lit(1.0))
    score = F.lit(2.0) * cyr_ratio + word_density + F.lit(0.5) * length_score
    return F.when((c == "") | (num_alpha == 0), F.lit(0.0)).otherwise(score)


def correct_ocr_errors(col: Column) -> Column:
    """T3 (ocr_service.py:317-373): sequential literal replaces.

    The reference's "second pass" over mixed-script words
    (ocr_service.py:358-369) is provably a no-op: it re-applies only the
    single-char mappings, all of which pass 1 already applied globally, so
    ``fixed_word == word`` always. This implementation is therefore exactly
    equivalent with just the first pass (the pure-Python twin makes the
    same reduction; fuzz parity covers both against mixed-script inputs).

    Multi-char word fixes must run in dict insertion order; single-char maps
    compose into one translate(). The reference applies char maps and word
    maps in one interleaved dict loop, but since the single-char sources
    never overlap the multi-char sources' outputs *in dict order preceding
    them*, we replicate exactly by applying replacements strictly in
    insertion order (chars first in the dict, then words — matching
    ocr_service.py:329-346 literal order).
    """
    out = F.coalesce(col, F.lit(""))
    # single-char corrections in dict order == one translate (no overlap
    # between sources; translate applies simultaneously which equals
    # sequential here because no correction output is another's input
    # within the char map... except chains like 'a'->'а' (latin->cyr) which
    # never re-trigger since outputs are Cyrillic and inputs Latin/digits).
    src = "".join(config.OCR_CHAR_CORRECTIONS.keys())
    dst = "".join(config.OCR_CHAR_CORRECTIONS.values())
    out = F.translate(out, src, dst)
    for wrong, right in config.OCR_WORD_CORRECTIONS.items():
        # after translate, latin-letter patterns like 'TOO' can no longer
        # appear; the reference has the same dead branches (its char pass
        # precedes word entries in dict order). Apply anyway for parity
        # with mixed remnants.
        out = F.replace(out, F.lit(wrong), F.lit(right))
    return out
