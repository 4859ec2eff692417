"""Approximate-nearest-neighbor search over embedding columns.

Two strategies:
- brute-force top-k (baseline; exact): candidate join + window rank.
  At 100 TB this is only sane for small query sets against a broadcast
  query table — which is exactly how it's written (queries are the small
  side; Catalyst broadcasts them, the big corpus never shuffles).
- sign-LSH (random-hyperplane) buckets: H deterministic pseudo-random
  hyperplanes → H-bit signature → equi-join on bucket → exact re-rank
  inside buckets. The scale path: candidates per query ≈ corpus / 2^H.

All math is integer-quantized (see dedup.quantized_cosine) so the DuckDB
oracle agrees bit-for-bit; the hyperplanes are integer-hash ±1 matrices —
no RNG state, reproducible everywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ocr_spark.operators.dedup import quantized_cosine, quantized_cosine_pandas

LSH_PLANES = 8
_HASH_A = 1103515245
_HASH_B = 12345


def _plane_sign(plane: Column, dim: Column) -> Column:
    """Deterministic ±1 entry of hyperplane matrix: LCG parity of (plane, dim)."""
    v = ((plane * 131 + dim) * _HASH_A + _HASH_B) % 65536
    return F.when(v % 2 == 0, F.lit(1)).otherwise(F.lit(-1))


def lsh_signature(vec: Column, planes: int = LSH_PLANES, scale: int = 1000) -> Column:
    """H-bit sign signature: bit h = 1 iff dot(vec, plane_h) > 0 (quantized)."""
    q = F.transform(vec, lambda x: F.round(x.cast("double") * scale).cast("long"))
    bits = []
    for h in range(planes):
        dot = F.aggregate(
            F.zip_with(
                q,
                F.sequence(F.lit(0).cast("long"), F.size(q).cast("long") - 1),
                lambda x, j: x * _plane_sign(F.lit(h), j),
            ),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(dot > 0, F.lit(1 << h)).otherwise(F.lit(0)))
    sig = bits[0]
    for b in bits[1:]:
        sig = sig + b
    return sig.cast("int")


def topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k by quantized cosine. The query side is the small one —
    mark it broadcast so the corpus scan never shuffles."""
    q = F.broadcast(
        queries.select(F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = q.crossJoin(c).filter(F.col("query_id") != F.col("neighbor_id")).select(
        "query_id",
        "neighbor_id",
        F.round(quantized_cosine_pandas(F.col("qv"), F.col("cv")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    planes: int = LSH_PLANES,
) -> DataFrame:
    """ANN top-k: bucket both sides by sign-LSH signature, equi-join on the
    bucket, exact re-rank inside. Recall < 1.0 by design; deterministic."""
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(vec_col).alias("qv"),
            lsh_signature(F.col(vec_col), planes).alias("bucket"),
        )
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        lsh_signature(F.col(vec_col), planes).alias("bucket"),
    )
    scored = q.join(c, "bucket").filter(F.col("query_id") != F.col("neighbor_id")).select(
        "query_id",
        "neighbor_id",
        F.round(quantized_cosine_pandas(F.col("qv"), F.col("cv")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )
