"""spark-submit entry point for the extraction pipeline (north_rule).

Usage (the packaged form a real cluster runs):

    python tools/make_package.py
    spark-submit --master local[32] --py-files dist/ocr_spark.zip \\
        jobs/extract_job.py --input /root/testdata/sf0.01/documents.parquet \\
        --output /tmp/extract_out --buckets 16

The job is resumable: re-running with the same --output resumes at the
last committed bucket (see ocr_spark.plans.checkpoint).
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="documents parquet (flat text or span corpus), or a "
                    "WARC directory with --format warc")
    ap.add_argument("--format", choices=("parquet", "warc"), default="parquet",
                    help="warc: crawled pages enter as the interleaved span "
                    "corpus via sources/warc.warc_span_corpus (html_to_spans "
                    "behind the 200-OK selection)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--buckets", type=int, default=16)
    ap.add_argument("--keep-boilerplate", action="store_true")
    ap.add_argument("--interleave-gate", action="store_true",
                    help="drop documents failing the OBELICS-shape interleave "
                         "gate (spans.interleave_keep_expr) before extraction — "
                         "one per-row boolean filter, no join, no extra pass")
    ap.add_argument("--fail-after", type=int, default=None, help="fault injection (tests)")
    ap.add_argument("--output-format", choices=("parquet", "jsonl"), default="parquet",
                    help="bucket output format (jsonl = the reference's JSON response shape)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from ocr_spark.pipeline import extract_documents
    from ocr_spark.plans.checkpoint import run_checkpointed
    from ocr_spark.plans.derived import span_corpus

    spark = SparkSession.builder.appName("ocr-spark-extract").getOrCreate()
    if args.format == "warc":
        from ocr_spark.sources.warc import read_warc, warc_span_corpus

        docs = warc_span_corpus(read_warc(spark, args.input))
    else:
        docs = spark.read.parquet(args.input)
        if "spans" not in docs.columns:  # flat text table → derive spans
            docs = span_corpus(docs)

    if args.interleave_gate:
        from ocr_spark.operators.spans import interleave_keep_expr

        docs = docs.filter(interleave_keep_expr())

    summary = run_checkpointed(
        spark,
        docs,
        args.output,
        lambda d: extract_documents(d, drop_boilerplate=not args.keep_boilerplate),
        num_buckets=args.buckets,
        input_lineage=args.input,
        fail_after=args.fail_after,
        output_format=args.output_format,
    )
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
