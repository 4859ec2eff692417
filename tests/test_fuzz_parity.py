"""Seeded fuzz parity: a corpus of adversarial strings through the Spark
expression stack must match the pure-Python reference twin value-for-value.

Complements the hand-picked golden cases: whitespace zoo, mixed scripts,
regex metacharacters, empties, long runs, lone surrogate-adjacent chars.
One Spark job per function family (not per example) keeps this fast.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from ocr_spark import config
from ocr_spark.functions import fields as FX
from ocr_spark.functions import metrics as M
from ocr_spark.functions import text as T
from tests import reference_impl as R

_WORD_POOL = [
    "hello", "WORLD", "ПрИвЕт", "мир", "ёжик", "data", "1234", "12.03.2021",
    "a", "я", "e-mail", "x@y.zz", "+7(999)123-45-67", "©", "copyright", "…",
    "<a href=x>link</a>", "tab\tsep", "№5", "ООО", "OOO", "Тест", "(скобки)",
    "99,5", "руб.", "стр.", "Page", "of", "1.", "2.", "ДОГОВОР", "AGREEMENT",
]
_SPACERS = [" ", "  ", "\t", "\n", "\r\n", "   ", "   \n\t "]


def _gen_text(rng: random.Random) -> str:
    n = rng.randint(0, 12)
    parts = []
    for _ in range(n):
        parts.append(rng.choice(_WORD_POOL))
        parts.append(rng.choice(_SPACERS))
    s = "".join(parts)
    if rng.random() < 0.15:
        s = rng.choice(["", " ", "\n\t", s.upper(), s * 3])
    return s


@pytest.fixture(scope="module")
def fuzz_pairs(spark):
    rng = random.Random(20260816)
    rows = []
    for i in range(300):
        a = _gen_text(rng)
        b = a if rng.random() < 0.2 else _gen_text(rng)
        rows.append((i, a, b))
    return rows, spark.createDataFrame(rows, "id long, a string, b string")


def test_fuzz_metrics_parity(fuzz_pairs):
    rows, df = fuzz_pairs
    a, b = F.col("a"), F.col("b")
    out = {
        r["id"]: r
        for r in df.select(
            "id",
            M.cer(a, b).alias("cer"),
            M.wer(a, b).alias("wer"),
            M.normalized_levenshtein(a, b).alias("nl"),
            M.exact_match(a, b).alias("em"),
        ).collect()
    }
    for i, x, y in rows:
        assert out[i]["cer"] == pytest.approx(R.cer(x, y), abs=1e-12), (i, x, y)
        assert out[i]["wer"] == pytest.approx(R.wer(x, y), abs=1e-12), (i, x, y)
        assert out[i]["nl"] == pytest.approx(R.normalized_levenshtein(x, y), abs=1e-12)
        assert out[i]["em"] == R.exact_match(x, y), (i, x, y)


def test_fuzz_text_parity(fuzz_pairs):
    rows, df = fuzz_pairs
    a = F.col("a")
    out = {
        r["id"]: r
        for r in df.select(
            "id",
            T.normalize_text(a).alias("norm"),
            T.line_language(a).alias("lang"),
            T.text_quality_score(a).alias("q"),
            T.correct_ocr_errors(a).alias("corr"),
        ).collect()
    }
    for i, x, _ in rows:
        assert out[i]["norm"] == R.normalize_text(x), (i, repr(x))
        assert out[i]["lang"] == R.line_language(x), (i, repr(x))
        assert out[i]["q"] == pytest.approx(R.text_quality_score(x), abs=1e-12), (i, repr(x))
        assert out[i]["corr"] == R.correct_ocr_errors(x), (i, repr(x))


def test_fuzz_field_extraction_parity(fuzz_pairs):
    rows, df = fuzz_pairs
    cols = [FX.extract_field(F.col("a"), f).alias(f) for f in config.DEFAULT_FIELDS]
    out = {r["id"]: r for r in df.select("id", *cols).collect()}
    for i, x, _ in rows:
        want = R.extract_fields(x)
        got = {f: out[i][f] for f in config.DEFAULT_FIELDS if out[i][f] is not None}
        # reference drops blank values (F4); mirror that for the comparison
        got = {k: v for k, v in got.items() if v.strip()}
        assert got == want, (i, repr(x))


def test_reference_second_pass_is_noop(fuzz_pairs):
    """Literal transcription of the reference's TWO-pass correction
    (ocr_service.py:317-373) equals the one-pass reduction both the engine
    and the golden twin use — the mixed-word pass provably changes nothing."""
    import re

    corrections = dict(config.OCR_CHAR_CORRECTIONS)
    corrections.update(config.OCR_WORD_CORRECTIONS)

    def two_pass(text: str) -> str:
        corrected = text
        for wrong, right in corrections.items():
            corrected = corrected.replace(wrong, right)
        for word in re.findall(r"\b[a-zA-Zа-яё]+\b", corrected):
            if any("a" <= c.lower() <= "z" for c in word) and any(
                "а" <= c <= "я" or c in "ёЁ" or "А" <= c <= "Я" for c in word
            ):
                fixed = word
                for lat, cyr in corrections.items():
                    if len(lat) == 1 and len(cyr) == 1:
                        fixed = fixed.replace(lat, cyr)
                corrected = corrected.replace(word, fixed)
        return corrected

    rows, _df = fuzz_pairs
    extra = ["watафж mix", "TOOл", "aгc 6еда l1ne ПрИвЕт hello-мир", "kиt"]
    for t in [x for _, x, _ in rows] + extra:
        assert two_pass(t) == R.correct_ocr_errors(t), repr(t)
