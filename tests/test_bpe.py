"""Distributed BPE training/tokenization (operators/bpe.py) vs a pure-
Python reference implementation of Sennrich-style leftmost-greedy BPE."""

from __future__ import annotations

import random
from collections import Counter

from pyspark.sql import functions as F

from ocr_spark.operators.bpe import (
    SEP,
    bpe_merges_df,
    bpe_token_stats,
    bpe_train,
    merge_pattern,
)


# --------------------------------------------------------------------------
# pure-Python reference: word-histogram BPE, leftmost-greedy merge,
# tie-break (count DESC, lhs ASC, rhs ASC)
# --------------------------------------------------------------------------


def _py_merge(syms: tuple[str, ...], lhs: str, rhs: str) -> tuple[str, ...]:
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == lhs and syms[i + 1] == rhs:
            out.append(lhs + rhs)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def py_bpe(texts: list[str], num_merges: int):
    """Returns (merges, vocab) — merges as [(rank, lhs, rhs, count)],
    vocab as {word: tuple_of_symbols}."""
    words: Counter[str] = Counter()
    for t in texts:
        words.update((t or "").lower().split())
    vocab = {w: tuple(w) for w in words}
    merges = []
    for k in range(num_merges):
        pairs: Counter[tuple[str, str]] = Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += words[w]
        if not pairs:
            break
        (lhs, rhs), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((k + 1, lhs, rhs, cnt))
        vocab = {w: _py_merge(s, lhs, rhs) for w, s in vocab.items()}
    return merges, vocab


def _spark_vocab_syms(vocab_df) -> dict[str, tuple[str, ...]]:
    return {
        r["word"]: tuple(r["sym"][1:-1].split(SEP + SEP))
        for r in vocab_df.collect()
    }


# --------------------------------------------------------------------------
# tests
# --------------------------------------------------------------------------


def test_sennrich_example_merge_sequence(spark):
    text = (
        "low low low low low lower lower newest newest newest "
        "newest newest newest widest widest widest"
    )
    docs = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    merges, vocab = bpe_train(docs, 6)
    assert merges == [
        (1, "e", "s", 9),
        (2, "es", "t", 9),
        (3, "l", "o", 7),
        (4, "lo", "w", 7),
        (5, "e", "w", 6),
        (6, "ew", "est", 6),
    ]
    segs = _spark_vocab_syms(vocab)
    assert segs["low"] == ("low",)
    assert segs["newest"] == ("n", "ewest")
    assert segs["widest"] == ("w", "i", "d", "est")
    vocab.unpersist(False)


def test_consecutive_runs_merge_leftmost_greedy(spark):
    # "aaaa" must become (aa, aa) after merge (a, a) — the framed-replace
    # boundary property; a naive single-separator replace merges only once.
    docs = spark.createDataFrame([(1, "aaaa aaa")], ["doc_id", "text"])
    merges, vocab = bpe_train(docs, 1)
    assert merges == [(1, "a", "a", 5)]  # 3 pairs in aaaa + 2 in aaa
    segs = _spark_vocab_syms(vocab)
    assert segs["aaaa"] == ("aa", "aa")
    assert segs["aaa"] == ("aa", "a")
    vocab.unpersist(False)


def test_merge_pattern_cannot_match_partial_symbols():
    search, repl = merge_pattern("b", "c")
    framed_ab_c = SEP + "ab" + SEP + SEP + "c" + SEP  # symbols (ab, c)
    assert search not in framed_ab_c  # 'b' is not a complete symbol here
    framed_b_c = SEP + "b" + SEP + SEP + "c" + SEP
    assert framed_b_c.replace(search, repl) == SEP + "bc" + SEP


def test_random_corpora_match_python_reference(spark):
    rng = random.Random(407)
    for trial in range(3):
        texts = [
            " ".join(
                "".join(rng.choice("abc") for _ in range(rng.randint(1, 6)))
                for _ in range(rng.randint(1, 12))
            )
            for _ in range(8)
        ]
        ref_merges, ref_vocab = py_bpe(texts, 10)
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
        )
        merges, vocab = bpe_train(docs, 10)
        assert merges == ref_merges, f"trial {trial}: merge tables differ"
        assert _spark_vocab_syms(vocab) == ref_vocab, f"trial {trial}"
        vocab.unpersist(False)


def test_early_stop_when_no_pairs_remain(spark):
    docs = spark.createDataFrame([(1, "a b c a b")], ["doc_id", "text"])
    df = bpe_merges_df(spark, docs, 5)
    assert df.count() == 0  # all words are single symbols: nothing to merge
    assert df.columns == ["merge_rank", "lhs", "rhs", "pair_count"]


def test_token_stats_counts_and_null_docs(spark):
    docs = spark.createDataFrame(
        [(1, "aaaa aaa bb"), (2, None), (3, "   ")], ["doc_id", "text"]
    )
    rows = {
        r["doc_id"]: r
        for r in bpe_token_stats(docs, 2).collect()  # merges: (a,a) then (aa,a)|(b,b)
    }
    ref_merges, ref_vocab = py_bpe(["aaaa aaa bb"], 2)
    exp_tokens = sum(len(ref_vocab[w]) for w in "aaaa aaa bb".split())
    assert rows[1]["n_words"] == 3
    assert rows[1]["n_tokens"] == exp_tokens
    assert rows[1]["n_chars"] == 9
    for d in (2, 3):
        assert rows[d]["n_words"] == 0
        assert rows[d]["n_tokens"] == 0
        assert rows[d]["n_chars"] == 0


def test_tokens_never_exceed_chars_on_fixture(spark, sf_dir=None):
    docs = spark.createDataFrame(
        [(i, f"doc {i} body with repeated repeated words {i % 3}") for i in range(20)],
        ["doc_id", "text"],
    )
    out = bpe_token_stats(docs, 4)
    bad = out.filter(
        (F.col("n_tokens") > F.col("n_chars")) | (F.col("n_tokens") < F.col("n_words"))
    )
    assert bad.count() == 0


def test_segmentation_roundtrip_lossless(spark):
    """Detokenization is exact by construction: stripping the separator
    from every vocab entry's merged segmentation reconstructs the original
    word, for every word, at any merge count — the decode half of the
    tokenizer contract."""
    from pyspark.sql import functions as F

    from ocr_spark.operators.bpe import SEP, bpe_train

    docs = spark.createDataFrame(
        [(i, f"low lower lowest newer newest wide widest word{i}") for i in range(8)],
        "doc_id long, text string",
    )
    for n_merges in (0, 3, 12):
        _, vocab = bpe_train(docs, n_merges)
        bad = (
            vocab.select("word", F.replace(F.col("sym"), F.lit(SEP), F.lit("")).alias("joined"))
            .filter(F.col("joined") != F.col("word"))
            .count()
        )
        vocab.unpersist(False)
        assert bad == 0, f"lossy segmentation at {n_merges} merges"
