"""Text analysis for large-scale training-data pipelines: language-ID,
quality scoring, token counting, document fingerprinting.

All pure Column expressions (whole-stage codegen); every op has an exact
DuckDB-SQL twin in __spark_entry__.oracle_sql() — hash math is md5-prefix /
integer-polynomial based specifically so both engines agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ocr_spark import config
from ocr_spark.functions.text import py_strip, text_quality_score  # noqa: F401  (re-export)

FNV_MOD = 1_000_000_007  # polynomial-hash modulus (fits all folds in int64)
CHAR_BASE = 131
WORD_BASE = 31


def words_of(text: Column) -> Column:
    """Whitespace tokens of the lowered text (empty array for blank)."""
    s = py_strip(F.lower(F.coalesce(text, F.lit(""))))
    return F.when(s == "", F.array().cast("array<string>")).otherwise(F.split(s, r"(?U)\s+"))


def language_id(text: Column) -> Column:
    """Stopword-profile language ID: the language whose function-word list
    hits the most tokens wins; ties break alphabetically ('und' when no
    profile hits at all). Deterministic, n-gram-free heuristic in the
    spirit of the reference's script-count detector (ocr_service.py:632)."""
    w = words_of(text)
    scores = []
    for lang in sorted(config.LANGID_STOPWORDS):
        sw = config.LANGID_STOPWORDS[lang]
        arr = F.array(*[F.lit(x) for x in sw])
        score = F.size(F.filter(w, lambda t: F.array_contains(arr, t)))
        scores.append(F.struct(score.alias("score"), F.lit(lang).alias("lang")))
    # array_max on struct = lexicographic (score, lang) max → highest score,
    # ties broken by LAST lang alphabetically; invert via reverse compare:
    best = F.array_max(
        F.array(
            *[
                F.struct(
                    s["score"].alias("score"),
                    # invert lang for tie-break: max on (score, -lang) ==
                    # alphabetically-first lang among ties. Simpler: since
                    # langs are distinct fixed strings, map each to a rank
                    # DESC so larger rank = earlier alphabetically.
                    F.lit(len(scores) - i).alias("rank"),
                    s["lang"].alias("lang"),
                )
                for i, s in enumerate(scores)
            ]
        )
    )
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def token_count_ws(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(words_of(text))


def token_count_bpe(text: Column) -> Column:
    """BPE-ish sub-token count: runs of word chars or single punctuation
    (the classic GPT-2-style pre-tokenizer shape, ASCII form)."""
    return F.size(
        F.regexp_extract_all(F.coalesce(text, F.lit("")), F.lit(r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]"), 0)
    )


def char_hash(word: Column) -> Column:
    """Polynomial char hash: fold ascii codes, base 131 mod 1e9+7.
    Integer-exact in any engine."""
    chars = F.filter(F.split(word, ""), lambda c: c != "")
    return F.aggregate(
        chars, F.lit(0).cast("long"), lambda acc, c: (acc * CHAR_BASE + F.ascii(c)) % FNV_MOD
    )


def fingerprint(text: Column) -> Column:
    """Document fingerprint: rolling polynomial hash over word hashes
    (Karp–Rabin style), base 31 mod 1e9+7."""
    return F.aggregate(
        words_of(text),
        F.lit(0).cast("long"),
        lambda acc, w: (acc * WORD_BASE + char_hash(w)) % FNV_MOD,
    )


def quality_features(text: Column) -> dict[str, Column]:
    """Boilerpipe-ish quality features: length, word stats, punct/stopword
    ratios, plus the reference's composite score (T5)."""
    t = F.coalesce(text, F.lit(""))
    w = words_of(t)
    n_words = F.size(w)
    n_chars = F.length(t)
    punct = F.length(t) - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    en_sw = F.array(*[F.lit(x) for x in config.LANGID_STOPWORDS["en"]])
    stop = F.size(F.filter(w, lambda x: F.array_contains(en_sw, x)))
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "avg_word_len": F.when(n_words > 0, (F.aggregate(w, F.lit(0), lambda a, x: a + F.length(x))).cast("double") / n_words).otherwise(F.lit(0.0)),
        "punct_ratio": F.when(n_chars > 0, punct.cast("double") / n_chars).otherwise(F.lit(0.0)),
        "stopword_ratio": F.when(n_words > 0, stop.cast("double") / n_words).otherwise(F.lit(0.0)),
        "quality_score": text_quality_score(t),
    }
