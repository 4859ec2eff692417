"""Deduplication operators for training-data pipelines.

Five strategies, all DataFrame-native:

- exact           hash-groupBy on text (one shuffle, partial agg)
- minhash LSH     shingle → K minhashes → banded bucket join (the scale
                  path: candidate generation is equi-join on band keys,
                  never an all-pairs product)
- simhash         64→60-bit sign-vector hash, bucket by prefix
- n-gram Jaccard  shingle-inverted-index join + set Jaccard verify
- embedding       quantized-integer cosine (bit-exact across engines);
                  all-pairs at small SF, LSH-bucketed in similarity.py at scale

Hashing is md5-prefix / integer-polynomial everywhere so the DuckDB oracle
reproduces results exactly (no engine-private hash functions).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ocr_spark import config
from ocr_spark.operators.textstats import words_of

# --- shingling ---------------------------------------------------------------


def shingles(text: Column, k: int = config.SHINGLE_SIZE) -> Column:
    """Distinct word k-gram shingles of the lowered text."""
    w = words_of(text)
    n = F.size(w)
    # sequence(1, 0) would generate a DESCENDING [1, 0] — guard short texts
    idx = F.when(n >= k, F.sequence(F.lit(1), n - (k - 1))).otherwise(
        F.array().cast("array<int>")
    )
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(w, (i + j).cast("int")) for j in range(k)]),
    )
    return F.array_distinct(grams)


def _md5_int(c: Column, salt: int) -> Column:
    """First 8 md5 hex digits of (salt:value) as a bigint — engine-neutral."""
    return F.conv(F.substring(F.md5(F.concat(F.lit(f"{salt}:"), c)), 1, 8), 16, 10).cast("long")


# --- exact dedup -------------------------------------------------------------


def dedup_exact(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup: keep the min-id representative per identical text.

    One hash-aggregate shuffle on md5(text) — never shuffles the full text.
    Returns (doc_id, keep boolean, group_size).
    """
    h = F.md5(F.coalesce(F.col(text_col), F.lit("")))
    w = Window.partitionBy(h)
    return docs.select(
        F.col(id_col),
        (F.col(id_col) == F.min(id_col).over(w)).alias("keep"),
        F.count(F.lit(1)).over(w).cast("long").alias("group_size"),
    )


# --- minhash + LSH -----------------------------------------------------------


def minhash_signature(text: Column, num_hashes: int = config.MINHASH_NUM_HASHES) -> Column:
    """K minhashes: min over shingles of md5(k || shingle) prefix-int.

    Built as ONE nested higher-order expression (transform over the hash
    index k, inner transform over shingles) instead of K unrolled
    aggregations — the unrolled form blows past the JVM 64KB method limit
    and silently drops the whole stage out of whole-stage codegen.
    """
    sh = shingles(text)

    def md5_int_dyn(s: Column, k: Column) -> Column:
        h = F.md5(F.concat(k.cast("string"), F.lit(":"), s))
        return F.conv(F.substring(h, 1, 8), 16, 10).cast("long")

    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda k: F.coalesce(
            F.array_min(F.transform(sh, lambda s: md5_int_dyn(s, k))),
            F.lit(-1).cast("long"),
        ),
    )


def minhash_bands(signature: Column, band_size: int = config.MINHASH_BAND_SIZE,
                  num_hashes: int = config.MINHASH_NUM_HASHES) -> Column:
    """LSH band keys: concat each band's minhashes into one string key."""
    bands = []
    for b in range(num_hashes // band_size):
        parts = [F.element_at(signature, b * band_size + i + 1).cast("string") for i in range(band_size)]
        bands.append(F.concat_ws("_", F.lit(str(b)), *parts))
    return F.array(*bands)


def dedup_minhash_lsh(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """MinHash-LSH near-dup pairs, verified with exact shingle Jaccard.

    Plan shape (the 100 TB story): per-doc signatures are narrow; candidate
    generation explodes band keys and self-joins on the band key (equi-join,
    broadcast-able bucket index at low collision rates, AQE-skew-safe);
    only candidates compute the exact Jaccard.
    Returns (a_id, b_id, jaccard) with a_id < b_id, jaccard >= threshold.
    """
    base = docs.select(F.col(id_col).alias("id"), shingles(F.col(text_col)).alias("sh"))

    # Signature via explode + 16-way min hash-aggregate instead of the
    # array-lambda form: md5 stays inside whole-stage codegen (higher-order
    # lambdas are interpreted row-at-a-time and ~50× slower here), and the
    # partial+final min-agg shuffles only (id, 16 longs) per document.
    ex = base.select("id", F.explode("sh").alias("s"))
    num_hashes = config.MINHASH_NUM_HASHES
    sig = ex.groupBy("id").agg(
        *[F.min(_md5_int(F.col("s"), k)).alias(f"h{k}") for k in range(num_hashes)]
    )
    band_keys = []
    for b in range(num_hashes // config.MINHASH_BAND_SIZE):
        parts = [
            F.coalesce(F.col(f"h{b * config.MINHASH_BAND_SIZE + i}"), F.lit(-1)).cast("string")
            for i in range(config.MINHASH_BAND_SIZE)
        ]
        band_keys.append(F.concat_ws("_", F.lit(str(b)), *parts))
    banded = sig.select("id", F.explode(F.array(*band_keys)).alias("band"))
    left = banded.alias("l")
    right = banded.alias("r")
    # dedupe candidate id-pairs FIRST (ints only), and only then attach the
    # shingle arrays — shuffling wide arrays through dropDuplicates is the
    # expensive anti-pattern.
    cand_ids = (
        left.join(right, (F.col("l.band") == F.col("r.band")) & (F.col("l.id") < F.col("r.id")))
        .select(F.col("l.id").alias("a_id"), F.col("r.id").alias("b_id"))
        .dropDuplicates(["a_id", "b_id"])
    )
    cand = (
        cand_ids.join(base.select(F.col("id").alias("a_id"), F.col("sh").alias("sh_a")), "a_id")
        .join(base.select(F.col("id").alias("b_id"), F.col("sh").alias("sh_b")), "b_id")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    jac = F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))
    return (
        cand.select("a_id", "b_id", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= jaccard_threshold)
    )


# --- n-gram Jaccard (inverted-index join) ------------------------------------


def dedup_ngram_jaccard(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    jaccard_threshold: float = 0.1,
) -> DataFrame:
    """All near-dup pairs by exact shingle Jaccard, candidates from an
    inverted shingle index (join on shingle — no cross product)."""
    base = docs.select(F.col(id_col).alias("id"), shingles(F.col(text_col)).alias("sh"))
    inv = base.select("id", F.size("sh").alias("n"), F.explode("sh").alias("s"))
    l, r = inv.alias("l"), inv.alias("r")
    pair_inter = (
        l.join(r, (F.col("l.s") == F.col("r.s")) & (F.col("l.id") < F.col("r.id")))
        .groupBy(F.col("l.id").alias("a_id"), F.col("r.id").alias("b_id"))
        .agg(
            F.count(F.lit(1)).alias("inter"),
            F.first("l.n").alias("n_a"),
            F.first("r.n").alias("n_b"),
        )
    )
    jac = F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter"))
    return (
        pair_inter.select("a_id", "b_id", jac.cast("double").alias("jaccard"))
        .filter(F.col("jaccard") >= jaccard_threshold)
    )


# --- simhash -----------------------------------------------------------------

SIMHASH_BITS = 60  # 15 md5 hex digits → exact int64, engine-neutral


def _word_hash60(w: Column) -> Column:
    return F.conv(F.substring(F.md5(w), 1, 15), 16, 10).cast("long")


def simhash(text: Column) -> Column:
    """60-bit SimHash over distinct words: bit b of the result is 1 iff the
    sum over words of ±1 (word-hash bit b) is positive."""
    w = F.array_distinct(words_of(text))
    hashes = F.transform(w, _word_hash60)

    def vote(b: int):
        # shiftright's bit count must be a Python int (fixed 60-bit loop)
        return F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )

    out = F.lit(0).cast("long")
    for b in range(SIMHASH_BITS):
        out = out + F.when(vote(b) > 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))
    return out


def dedup_simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                  prefix_bits: int = 16) -> DataFrame:
    """SimHash signatures + coarse bucketing by the top prefix bits
    (candidate near-dups share a bucket). Returns (doc_id, simhash, bucket)."""
    sh = simhash(F.col(text_col))
    return docs.select(
        F.col(id_col),
        sh.alias("simhash"),
        F.shiftright(sh, SIMHASH_BITS - prefix_bits).alias("bucket"),
    )


# --- embedding cosine near-dup ------------------------------------------------


def quantized_cosine_pandas(a: Column, b: Column, scale: int = 1000) -> Column:
    """Arrow-vectorized twin of :func:`quantized_cosine` (numpy int64 math;
    ~100× faster than the interpreted higher-order-function form on wide
    pair sets). Agrees with the expression form on every value our corpora
    produce; the one theoretical divergence is doubles ADJACENT to a .5 tie
    (floor(m+0.5) vs BigDecimal HALF_UP — the Math.round(0.49999999999999994)
    class), which quantized inputs never hit.

    Rounding is half-away-from-zero to match Spark's HALF_UP round and
    DuckDB's round() — numpy's own round() is banker's and would differ on
    exact .5 ties. Null or length-mismatched vector pairs yield 0.0, the
    same degradation as the expression form (null propagation → otherwise).
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _cos(va: pd.Series, vb: pd.Series) -> pd.Series:
        la = np.array([len(x) if x is not None else -1 for x in va])
        lb = np.array([len(x) if x is not None else -2 for x in vb])
        valid = (la >= 0) & (la == lb) & (la > 0)
        out = np.zeros(len(va), dtype=np.float64)

        def quant(rows):
            m = np.stack([np.asarray(x, dtype=np.float64) for x in rows]) * scale
            return np.where(m >= 0, np.floor(m + 0.5), np.ceil(m - 0.5)).astype(np.int64)

        # stack requires a uniform width → process one vector length at a time
        for dim in np.unique(la[valid]):
            mask = valid & (la == dim)
            idx = np.flatnonzero(mask)
            qa = quant(va.iloc[idx])
            qb = quant(vb.iloc[idx])
            dot = (qa * qb).sum(axis=1)
            na = (qa * qa).sum(axis=1)
            nb = (qb * qb).sum(axis=1)
            with np.errstate(divide="ignore", invalid="ignore"):
                c = dot / (np.sqrt(na.astype(np.float64)) * np.sqrt(nb.astype(np.float64)))
            out[idx] = np.where((na > 0) & (nb > 0), c, 0.0)
        return pd.Series(out)

    return _cos(a, b)


def quantized_cosine(a: Column, b: Column, scale: int = 1000) -> Column:
    """Cosine over integer-quantized vectors (round(x*scale)): dot and norms
    are exact int64 sums (order-independent), so Spark and DuckDB agree to
    the last bit; only the final sqrt/division is floating."""
    qa = F.transform(a, lambda x: F.round(x.cast("double") * scale).cast("long"))
    qb = F.transform(b, lambda x: F.round(x.cast("double") * scale).cast("long"))
    dot = F.aggregate(F.zip_with(qa, qb, lambda x, y: x * y), F.lit(0).cast("long"), lambda s, v: s + v)
    na = F.aggregate(F.transform(qa, lambda x: x * x), F.lit(0).cast("long"), lambda s, v: s + v)
    nb = F.aggregate(F.transform(qb, lambda x: x * x), F.lit(0).cast("long"), lambda s, v: s + v)
    return F.when(
        (na > 0) & (nb > 0), dot.cast("double") / (F.sqrt(na.cast("double")) * F.sqrt(nb.cast("double")))
    ).otherwise(F.lit(0.0))


def dedup_embedding_cosine(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Near-dup pairs by quantized cosine >= threshold.

    All-pairs form (correct at any SF; fine to sf0.1). The scale path
    replaces the cross join with the sign-LSH buckets of similarity.py —
    same verify expression on a tiny candidate set.
    """
    l = emb.select(F.col(id_col).alias("a_id"), F.col(vec_col).alias("va"))
    r = emb.select(F.col(id_col).alias("b_id"), F.col(vec_col).alias("vb"))
    pairs = l.join(r, F.col("a_id") < F.col("b_id"))
    cos = quantized_cosine_pandas(F.col("va"), F.col("vb"))
    return pairs.select("a_id", "b_id", F.round(cos, 6).alias("cosine")).filter(
        F.col("cosine") >= threshold
    )
