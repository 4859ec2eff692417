"""Hot-shingle skew evidence for dedup_ngram_jaccard (BENCH.md).

Adversarial corpus: every document shares one boilerplate sentence (its
3-gram shingles appear in ALL N docs — the classic stopword/footer case)
plus unique content. The raw inverted-index join pays f² candidate pairs
per hot shingle (≈ N²·n_hot total); prefix filtering sorts shingles by
global document frequency and indexes only each doc's rare prefix, so the
hot shingles never enter the index and candidate volume collapses to the
true near-dup neighborhoods.

Usage: python tools/ngram_skew_bench.py [n_docs] [threshold]
Prints candidate-pair counts and wall time for both shapes; the RESULT
sets are asserted identical (prefix filtering is exact).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    threshold = float(sys.argv[2]) if len(sys.argv) > 2 else 0.2

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ocr_spark.operators.dedup import dedup_ngram_jaccard, shingle_hashes_pandas
    from ocr_spark.session import get_spark

    spark = get_spark("ngram-skew", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    # adversarial corpus: a shared boilerplate sentence (hot shingles in
    # EVERY doc) + a 40-token body drawn from the doc's FAMILY (id//4) seed
    # with 4 member-specific tokens — so family members are true near-dups
    # and unrelated docs share ONLY the boilerplate (J ≈ 0.08 < t)
    boiler = "all rights reserved by the example corporation footer text"
    fam = (F.col("id") / 4).cast("long")
    fam_body = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(39)),
            lambda j: F.concat(F.lit("t"), ((fam * 131 + j * 17) % 99991).cast("string")),
        ),
        " ",
    )
    member_tail = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(3)),
            lambda j: F.concat(F.lit("m"), ((F.col("id") * 7 + j) % 99991).cast("string")),
        ),
        " ",
    )
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit(boiler + " "), fam_body, F.lit(" "), member_tail).alias("text"),
    )

    base = docs.select(
        "doc_id", shingle_hashes_pandas(F.col("text")).alias("hv")
    ).select("doc_id", F.size("hv").alias("n"), "hv")
    inv = base.select("doc_id", "n", F.explode("hv").alias("h"))

    # raw inverted index: candidate pairs = sum over shingles of df·(df-1)/2
    t0 = time.time()
    raw_cands = (
        inv.alias("l")
        .join(inv.alias("r"), (F.col("l.h") == F.col("r.h")) & (F.col("l.doc_id") < F.col("r.doc_id")))
        .select(F.col("l.doc_id"), F.col("r.doc_id"))
        .dropDuplicates()
        .count()
    )
    t_raw = time.time() - t0

    # prefix-filtered index (the production path inside dedup_ngram_jaccard)
    dfreq = inv.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("doc_id").orderBy(F.col("df").asc(), F.col("h").asc())
    plen = F.col("n") - F.ceil(F.lit(threshold) * F.col("n") - F.lit(1e-9)).cast("int") + 1
    pref = (
        inv.join(F.broadcast(dfreq), "h")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= plen)
        .select("doc_id", "n", "h", "rn")
    )
    size_ok = (F.lit(threshold) * F.col("l.n") <= F.col("r.n") + F.lit(1e-9)) & (
        F.lit(threshold) * F.col("r.n") <= F.col("l.n") + F.lit(1e-9)
    )
    t0 = time.time()
    pref_cands = (
        pref.alias("l")
        .join(
            pref.alias("r"),
            (F.col("l.h") == F.col("r.h"))
            & (F.col("l.doc_id") < F.col("r.doc_id"))
            & size_ok,
        )
        .select(F.col("l.doc_id"), F.col("r.doc_id"))
        .dropDuplicates()
        .count()
    )
    t_pref = time.time() - t0

    # + PPJoin positional filter (the production path): best-case overlap
    # from the match positions must reach α = ceil(t(|A|+|B|)/(1+t))
    ubound = 1 + F.least(F.col("l.n") - F.col("l.rn"), F.col("r.n") - F.col("r.rn"))
    alpha = F.ceil(
        F.lit(threshold / (1.0 + threshold)) * (F.col("l.n") + F.col("r.n")) - F.lit(1e-9)
    )
    t0 = time.time()
    pos_cands = (
        pref.alias("l")
        .join(
            pref.alias("r"),
            (F.col("l.h") == F.col("r.h"))
            & (F.col("l.doc_id") < F.col("r.doc_id"))
            & size_ok
            & (ubound >= alpha),
        )
        .select(F.col("l.doc_id"), F.col("r.doc_id"))
        .dropDuplicates()
        .count()
    )
    t_pos = time.time() - t0

    # exactness: the full operator's result is the ground truth either way
    t0 = time.time()
    true_pairs = dedup_ngram_jaccard(docs, jaccard_threshold=threshold).count()
    t_full = time.time() - t0

    print(
        f"n_docs={n_docs} t={threshold}\n"
        f"raw inverted index:   {raw_cands:>12,} candidate pairs  [{t_raw:.1f}s]\n"
        f"prefix-filtered:      {pref_cands:>12,} candidate pairs  [{t_pref:.1f}s]\n"
        f"+ positional (PPJoin):{pos_cands:>12,} candidate pairs  [{t_pos:.1f}s]\n"
        f"true pairs (J>={threshold}): {true_pairs:>9,}  [full operator {t_full:.1f}s]\n"
        f"candidate reduction:  {raw_cands / max(pref_cands, 1):,.0f}x prefix, "
        f"{raw_cands / max(pos_cands, 1):,.0f}x prefix+positional"
    )


if __name__ == "__main__":
    main()
