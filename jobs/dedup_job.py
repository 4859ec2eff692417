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
  minhash-cc  cluster-level near-dup dedup: connected components over the
            LSH pair graph, keep one canonical (min id) per component
            (transitive: A~B, B~C drops both B and C)

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
    ap.add_argument("--mode", choices=("exact", "minhash", "minhash-cc"), default="exact")
    ap.add_argument("--threshold", type=float, default=0.8, help="minhash Jaccard threshold")
    ap.add_argument("--buckets", type=int, default=16)
    ap.add_argument("--fail-after", type=int, default=None, help="fault injection (tests)")
    ap.add_argument("--format", choices=("parquet", "orc", "jsonl", "csv", "warc"), default="parquet",
                    help="input corpus format (jsonl/csv quarantine malformed records)")
    args = ap.parse_args()

    import os

    from pyspark.sql import SparkSession

    from ocr_spark.operators.dedup import corpus_dedup_losers
    from ocr_spark.plans.checkpoint import materialize_once, run_checkpointed
    from ocr_spark.sources import jsonl as J

    spark = SparkSession.builder.appName("ocr-spark-dedup").getOrCreate()
    docs = J.load_documents(spark, args.input, args.format).select("doc_id", "text")
    if args.format == "warc":
        # heavy Python parse chain: materialize once so neither the loser
        # computation nor the per-bucket loop re-parses the archives
        docs = materialize_once(
            spark, docs, os.path.join(args.output, "_ingest"),
            meta={"stage": "warc_ingest", "input": args.input},
        )

    # The keep/drop decision is GLOBAL (duplicates land in different hash
    # buckets), so it is computed over the full corpus — EXACTLY ONCE:
    # materialized to _losers before the bucket loop. Unmaterialized, the
    # per-bucket transform would re-execute the whole LSH pipeline once per
    # bucket (~16× at --buckets 16); the parquet read-back also pins the
    # resume contract to the originally committed loser set.
    losers = materialize_once(
        spark,
        corpus_dedup_losers(docs, mode=args.mode, threshold=args.threshold),
        os.path.join(args.output, "_losers"),
        meta={"mode": args.mode, "threshold": args.threshold, "input": args.input},
    )
    from ocr_spark.operators.dedup import release_feature_caches

    release_feature_caches()  # the losers parquet replaces the live plan

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
        job_params={"mode": args.mode, "threshold": args.threshold},
    )
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
