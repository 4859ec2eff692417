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

Incremental drops: every run writes `_index` — the minhash index of its
kept corpus. The NEXT crawl drop passes it back with `--against`:

    spark-submit ... jobs/dedup_job.py --input drop2.parquet \
        --output /tmp/drop2 --mode minhash-cc --against /tmp/drop1/_index

and dedups the new drop within itself AND against everything previously
committed — without re-reading a byte of old corpus text (equal, by
pinned test, to a full re-dedup with old docs winning every tie). The
run's own `_index` then contains old ∪ new-kept, so drops chain.
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
    ap.add_argument("--against", default=None,
                    help="path to a previous run's _index: dedup this drop "
                         "against the already-committed corpus (old docs "
                         "always win) without re-reading its text")
    ap.add_argument("--write-index", action="store_true",
                    help="export _index (the kept corpus's minhash index, "
                         "O(total shingles)) for a future --against run; "
                         "implied by --against so chains continue")
    args = ap.parse_args()

    import os

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

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
    from ocr_spark.operators.dedup import (
        dedup_losers_incremental,
        minhash_index,
        release_feature_caches,
    )

    if args.against:
        old_index = spark.read.parquet(args.against)
        new_index = materialize_once(
            spark, minhash_index(docs), os.path.join(args.output, "_new_index"),
            meta={"stage": "new_index", "input": args.input},
        )
        release_feature_caches()
        losers = materialize_once(
            spark,
            dedup_losers_incremental(
                new_index, old_index, mode=args.mode, threshold=args.threshold
            ).select(F.col("id").alias("doc_id")),
            os.path.join(args.output, "_losers"),
            meta={"mode": args.mode, "threshold": args.threshold,
                  "input": args.input, "against": args.against},
        )
    else:
        losers = materialize_once(
            spark,
            corpus_dedup_losers(docs, mode=args.mode, threshold=args.threshold),
            os.path.join(args.output, "_losers"),
            meta={"mode": args.mode, "threshold": args.threshold, "input": args.input},
        )
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
        job_params={"mode": args.mode, "threshold": args.threshold,
                    "against": args.against},
    )

    # the chainable index of everything committed so far: this drop's kept
    # docs (old ∪ new when --against) — the NEXT drop's --against input.
    # Opt-in (--write-index): the index is O(total shingles), wasted cost
    # and storage for a one-shot run; --against implies it so chains
    # continue. With --against the new drop's index is already
    # materialized: reuse it (anti-join the losers) instead of
    # re-shingling the kept output.
    write_index = args.write_index or bool(args.against)
    if not write_index:
        print(json.dumps(summary))
        return
    if args.against:
        kept_index = spark.read.parquet(args.against).unionByName(
            new_index.join(losers.select(F.col("doc_id").alias("id")), "id", "left_anti")
        )
    else:
        kept_index = minhash_index(
            spark.read.parquet(os.path.join(args.output, "bucket=*"))
        )
    materialize_once(
        spark, kept_index, os.path.join(args.output, "_index"),
        meta={"stage": "index", "input": args.input, "against": args.against,
              "mode": args.mode, "threshold": args.threshold},
    )
    release_feature_caches()
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
