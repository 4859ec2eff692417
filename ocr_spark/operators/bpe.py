"""Distributed BPE (byte-pair-encoding) vocabulary training and
tokenization — the tokenizer-fitting step of a training-data pipeline,
done at corpus scale the way it must be done at 100 TB:

1. ONE corpus-scale shuffle builds the word-frequency vocabulary
   (``groupBy(word).count()``).  Everything after that operates on the
   VOCAB table (bounded by distinct-word count, ~10^6–10^7 for web text
   regardless of corpus size), never on the corpus again — this is the
   classic Sennrich et al. 2016 observation that BPE trains on the word
   histogram, not the token stream.
2. Each merge iteration is a vocab-scale aggregation: explode adjacent
   symbol pairs weighted by word frequency, map-side-combined groupBy on
   the pair, global top-1 via TakeOrdered (``orderBy().limit(1)`` — no
   single-reducer sort).  The one driver-side ``collect()`` per iteration
   fetches a SINGLE row (the winning pair) — model-state fetch, the same
   pattern as the IVF codebook (similarity.py), not a data collect.
3. The merge itself is a map-only string replace over the vocab.

Symbol strings use a framed representation so that literal
``replace()`` (left-to-right, non-overlapping in both the JVM and
DuckDB) implements EXACTLY the leftmost-greedy BPE merge:

    word "abc"  →  ␟a␟␟b␟␟c␟        (␟ = U+001F unit separator)
    merge (a,b) →  replace("␟a␟␟b␟", "␟ab␟")  →  ␟ab␟␟c␟

Every symbol is framed by single separators; BETWEEN symbols the
separator is doubled.  A merge pattern ``␟L␟␟R␟`` therefore (a) can only
match complete symbols — ``L`` a suffix or ``R`` a prefix of a longer
symbol never matches, because symbols contain no separator — and
(b) consumes one of the two separators between R and the next symbol,
leaving the next symbol's own frame intact, so consecutive occurrences
merge exactly as the leftmost-greedy scan does ("aaaa" + merge(a,a) →
"␟aa␟␟aa␟", two merges, not one).  DuckDB's ``replace`` has identical
semantics, which is what makes the unrolled SQL oracle bit-exact
(``__spark_entry__.oracle_sql()['bpe_train' | 'bpe_tokens']``).

Within-word BPE without an end-of-word marker (the GPT-2-style shape);
pre-tokenization is :func:`ocr_spark.operators.textstats.words_of`
(lowered whitespace tokens) so vocabulary and token counts compose with
every other operator in this engine.  Words containing U+001F itself are
excluded from the vocabulary (framing guard, applied identically in the
oracle); no realistic corpus contains the unit-separator control char.

The reference repo has no tokenizer-training path; this implements the
public Sennrich/Gage algorithm for the north_star's training-data
pipeline tier, not reference code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ocr_spark.operators.textstats import words_of

SEP = "\x1f"

_MERGE_SCHEMA = T.StructType(
    [
        T.StructField("merge_rank", T.IntegerType(), False),
        T.StructField("lhs", T.StringType(), False),
        T.StructField("rhs", T.StringType(), False),
        T.StructField("pair_count", T.LongType(), False),
    ]
)


def sym_init(word):
    """Framed initial symbol string of a (non-empty, SEP-free) word:
    ``␟c1␟␟c2␟␟…␟␟cn␟``.  Built with a single regexp pass — '(.)' matches
    one code point in both Java regex and RE2, so multi-byte characters
    are one symbol in both engines."""
    body = F.regexp_replace(word, "(.)", "$1" + SEP + SEP)
    return F.concat(F.lit(SEP), F.substring(body, 1, F.length(body) - 1))


def word_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq, sym): the word-frequency vocabulary with initial
    (character) symbol strings.  The ONLY corpus-scale stage of BPE
    training — one shuffle keyed on the word."""
    return (
        docs.select(F.explode(words_of(F.col(text_col))).alias("word"))
        .filter(~F.col("word").contains(SEP))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
        .withColumn("sym", sym_init(F.col("word")))
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """(lhs, rhs, cnt): adjacent-symbol pair counts weighted by word
    frequency.  Vocab-scale explode + map-side-combined groupBy."""
    inner = F.substring(F.col("sym"), 2, F.length("sym") - 2)
    syms = F.split(inner, SEP + SEP)
    n = F.size(syms)
    pairs = F.zip_with(
        F.slice(syms, 1, n - 1),
        F.slice(syms, 2, n - 1),
        lambda a, b: F.struct(a.alias("lhs"), b.alias("rhs")),
    )
    return (
        vocab.select(F.explode(pairs).alias("p"), "freq")
        .groupBy(F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs"))
        .agg(F.sum("freq").alias("cnt"))
    )


def merge_pattern(lhs: str, rhs: str) -> tuple[str, str]:
    """(search, replacement) literal strings implementing merge (lhs, rhs)
    on the framed representation."""
    return (SEP + lhs + SEP + SEP + rhs + SEP, SEP + lhs + rhs + SEP)


def bpe_train(
    docs: DataFrame, num_merges: int, text_col: str = "text"
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Learn ``num_merges`` BPE merges over ``docs[text_col]``.

    Returns ``(merges, vocab)`` where ``merges`` is the ordered list of
    ``(merge_rank, lhs, rhs, pair_count)`` (rank starts at 1; ties on
    count break on (lhs, rhs) lexicographic — fully deterministic) and
    ``vocab`` is the final (word, freq, sym) DataFrame with all merges
    applied — i.e. the word → subword-segmentation map, ready for
    :func:`bpe_token_stats`-style joins.

    Stops early if the corpus runs out of pairs (all words reduced to a
    single symbol); callers that need exactly ``num_merges`` (the oracle
    twin unrolls a fixed count) should size it below the corpus capacity.

    Iteration cost: each round re-derives the vocab from the previous
    round's PERSISTED frame (one map-only replace), so total work is
    linear in rounds, not quadratic; the superseded cache is released as
    soon as its successor is materialized.
    """
    merges: list[tuple[int, str, str, int]] = []
    prev: DataFrame | None = None
    cur = word_vocab(docs, text_col).persist()
    for k in range(num_merges):
        best = (
            _pair_counts(cur)
            .orderBy(F.desc("cnt"), F.asc("lhs"), F.asc("rhs"))
            .limit(1)
            .collect()
        )
        if prev is not None:
            prev.unpersist(False)
        if not best:
            break
        b = best[0]
        merges.append((k + 1, b["lhs"], b["rhs"], int(b["cnt"])))
        search, repl = merge_pattern(b["lhs"], b["rhs"])
        prev, cur = cur, cur.withColumn(
            "sym", F.replace(F.col("sym"), F.lit(search), F.lit(repl))
        ).persist()
    return merges, cur


def bpe_merges_df(
    spark: SparkSession, docs: DataFrame, num_merges: int, text_col: str = "text"
) -> DataFrame:
    """The learned merge table as a DataFrame:
    (merge_rank, lhs, rhs, pair_count)."""
    merges, vocab = bpe_train(docs, num_merges, text_col)
    vocab.unpersist(False)
    return spark.createDataFrame(merges, _MERGE_SCHEMA)


def bpe_token_stats(
    docs: DataFrame,
    num_merges: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenize the corpus with a vocabulary trained on it and report
    per-document (doc_id, n_words, n_tokens, n_chars).

    Tokenization REUSES the training output: the final vocab already
    holds every distinct word's merged segmentation, so applying the
    tokenizer is a words→vocab equi-join (vocab-sized build side — AQE
    picks broadcast when it fits; at web scale a 10^7-row vocab shuffles,
    still corpus-vs-vocab, never corpus-vs-corpus), NOT a re-scan of the
    corpus through ``num_merges`` replace passes.  Token count per word =
    symbol count of the merged string = occurrences of the doubled
    separator + 1.

    The trained vocab stays persisted (it is both the training output and
    the join build side); it is vocab-scale and evaluating the returned
    frame reads it from cache rather than replaying the merge chain."""
    _, vocab = bpe_train(docs, num_merges, text_col)
    n_sub = (
        F.length("sym") - F.length(F.replace(F.col("sym"), F.lit(SEP + SEP), F.lit(SEP))) + 1
    ).cast("long")
    tok = vocab.select("word", n_sub.alias("n_sub"), F.length("word").cast("long").alias("wlen"))
    dw = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(words_of(F.col(text_col))).alias("word")
    ).filter(~F.col("word").contains(SEP))
    agg = (
        dw.join(tok, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("n_sub").cast("long").alias("n_tokens"),
            F.sum("wlen").cast("long").alias("n_chars"),
        )
    )
    out = (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_words", F.lit(0)).cast("long").alias("n_words"),
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("n_chars", F.lit(0)).cast("long").alias("n_chars"),
        )
    )
    return out
