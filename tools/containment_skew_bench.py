"""Document-frequency-cap evidence for dedup_containment (BENCH.md).

Adversarial corpus: every document shares one boilerplate sentence (hot
shingles in ALL N docs — the cookie-banner case), every 10th document is
additionally QUOTED inside a wrapper document. An uncapped inverted
index pays ≈ N²·n_hot candidate pairs from the boilerplate alone; with
the cap, ubiquitous shingles never enter the index and candidates
collapse to the true quote pairs (a pair is missed only if every shared
shingle is corpus-ubiquitous — the wrapped docs share their whole body,
so recall of the quote class is unaffected).

Usage: python tools/containment_skew_bench.py [n_docs] [max_df]
Prints candidate volumes and wall time for capped vs uncapped shapes;
the capped RESULT must contain every true quote pair.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    max_df = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    from pyspark.sql import functions as F

    from ocr_spark.operators.dedup import (
        dedup_containment,
        release_feature_caches,
        shingle_hashes_pandas,
    )
    from ocr_spark.session import get_spark

    spark = get_spark("cont-skew", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    boiler = "this site uses cookies accept our terms and privacy policy now"
    rows = []
    for i in range(n_docs):
        body = " ".join(f"w{i}x{j}" for j in range(25))
        rows.append((i, f"{body} {boiler}"))
        if i % 10 == 0:
            rows.append((100000 + i, f"portal header junk {body} {boiler} footer junk links"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    n_quotes = sum(1 for i in range(n_docs) if i % 10 == 0)

    # candidate volume of the raw (uncapped) inverted index — count only,
    # never verified (that is the blowup being demonstrated)
    base = docs.select(
        "doc_id", shingle_hashes_pandas(F.col("text")).alias("hv")
    ).filter(F.size("hv") > 0)
    ex = base.select("doc_id", F.explode("hv").alias("h"))
    t0 = time.time()
    raw_cands = (
        ex.alias("l")
        .join(ex.alias("r"), (F.col("l.h") == F.col("r.h")) & (F.col("l.doc_id") < F.col("r.doc_id")))
        .select("l.doc_id", "r.doc_id")
        .distinct()
        .count()
    )
    t_raw = time.time() - t0

    hot = ex.groupBy("h").agg(F.count(F.lit(1)).alias("df")).filter(F.col("df") > max_df).select("h")
    cold = ex.join(F.broadcast(hot), "h", "left_anti")
    t0 = time.time()
    cap_cands = (
        cold.alias("l")
        .join(cold.alias("r"), (F.col("l.h") == F.col("r.h")) & (F.col("l.doc_id") < F.col("r.doc_id")))
        .select("l.doc_id", "r.doc_id")
        .distinct()
        .count()
    )
    t_cap = time.time() - t0

    t0 = time.time()
    pairs = dedup_containment(docs, threshold=0.9, max_df=max_df).collect()
    t_full = time.time() - t0
    release_feature_caches()
    got_quotes = {(r["a_id"], r["b_id"]) for r in pairs}
    want_quotes = {(i, 100000 + i) for i in range(n_docs) if i % 10 == 0}
    missed = want_quotes - got_quotes
    assert not missed, f"df cap lost true quote pairs: {sorted(missed)[:5]}"

    print(
        f"containment df-cap bench: N={n_docs} (+{n_quotes} wrappers), cap={max_df}\n"
        f"  raw inverted index:   {raw_cands:>12,} candidate pairs  [{t_raw:.1f}s]\n"
        f"  df-capped index:      {cap_cands:>12,} candidate pairs  [{t_cap:.1f}s]\n"
        f"  full operator:        {len(pairs):,} verified pairs in {t_full:.1f}s "
        f"(all {n_quotes} true quote pairs recovered)\n"
        f"  reduction: {raw_cands / max(cap_cands, 1):,.0f}x"
    )


if __name__ == "__main__":
    main()
