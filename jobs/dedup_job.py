"""spark-submit entry point for corpus deduplication (training-data path).

    python tools/make_package.py
    spark-submit --master local[32] --py-files dist/ocr_spark.zip \\
        jobs/dedup_job.py --input .../documents.parquet --output /tmp/dedup_out \\
        --mode exact --buckets 16

Modes:
  exact     keep the min-id representative of every identical text
            (dedup_exact); writes the KEPT documents
  minhash   additionally drop near-duplicates: MinHash-LSH pairs at
            --threshold, greedy keep-lowest-id within each pair

Resumable exactly like extract_job: hash-bucketed writes with a commit
manifest (ocr_spark.plans.checkpoint); re-run the same command after a
kill to process only uncommitted buckets.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="documents parquet (doc_id, text)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--mode", choices=("exact", "minhash"), default="exact")
    ap.add_argument("--threshold", type=float, default=0.8, help="minhash Jaccard threshold")
    ap.add_argument("--buckets", type=int, default=16)
    ap.add_argument("--fail-after", type=int, default=None, help="fault injection (tests)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from ocr_spark.operators.dedup import dedup_exact, dedup_minhash_lsh
    from ocr_spark.plans.checkpoint import run_checkpointed

    spark = SparkSession.builder.appName("ocr-spark-dedup").getOrCreate()
    docs = spark.read.parquet(args.input).select("doc_id", "text")

    # The keep/drop decision is GLOBAL (duplicates land in different hash
    # buckets), so it is computed over the full corpus; only the WRITE is
    # bucketed for resume. The loser set is a deterministic function of the
    # input, so a resumed run recomputes the identical set and uncommitted
    # buckets stay consistent with committed ones.
    exact_losers = dedup_exact(docs).filter(~F.col("keep")).select("doc_id")
    losers = exact_losers
    if args.mode == "minhash":
        kept = docs.join(exact_losers, "doc_id", "left_anti")
        pairs = dedup_minhash_lsh(kept, jaccard_threshold=args.threshold)
        # greedy: within every near-dup pair the higher id loses
        near_losers = pairs.select(F.col("b_id").alias("doc_id")).distinct()
        losers = exact_losers.unionByName(near_losers).distinct()

    def transform(part):
        return part.join(losers, "doc_id", "left_anti")

    summary = run_checkpointed(
        spark,
        docs,
        args.output,
        transform,
        num_buckets=args.buckets,
        input_lineage=args.input,
        fail_after=args.fail_after,
    )
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
