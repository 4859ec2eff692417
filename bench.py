#!/usr/bin/env python
"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Each query is fully materialized through the `noop` sink — a bare count()
would let Catalyst prune every expensive column and time nothing.

Extra env:
  SPARK_GRAFT_SCALE   replicate the flagship corpus N× (scaling runs need
                      enough work per core; default 1)
  SPARK_GRAFT_QUERIES comma list to restrict (default: headline set)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "extract_documents",
    "spans_assemble",
    "metrics_pairwise",
    "metrics_rollup",
    "fields_extract",
    "field_metrics",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "ann_topk_bruteforce",
    "ann_topk_lsh",
    "layout_flags",
    "layout_boxes",
    "token_stats",
    "events_windowed",
    "sessionize",
    "media_decode",
]


def materialize(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    scale = int(os.environ.get("SPARK_GRAFT_SCALE", "1"))
    only = os.environ.get("SPARK_GRAFT_QUERIES")
    names = only.split(",") if only else HEADLINE

    from pyspark.sql import functions as F

    from ocr_spark.pipeline import extract_documents
    from ocr_spark.plans import entry_queries as EQ
    from ocr_spark.plans.derived import span_corpus
    from ocr_spark.session import get_spark

    spark = get_spark(
        "ocr-spark-bench", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8)
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    if scale > 1:
        reps = spark.range(scale).select(F.col("id").alias("rep"))
        n_docs_base = docs.count()
        docs = docs.crossJoin(F.broadcast(reps)).withColumn(
            "doc_id", F.col("doc_id") + F.col("rep") * n_docs_base
        ).drop("rep")
    corpus = span_corpus(docs)

    # flagship: end-to-end extraction throughput (docs/sec, spans/sec)
    n_docs = docs.count()
    n_spans = corpus.select(F.sum(F.size("spans"))).collect()[0][0]
    warm = extract_documents(corpus)  # one warm-up pass amortizes JVM/codegen
    materialize(warm.limit(64))
    flagship_sec = materialize(extract_documents(corpus))

    per_query: dict[str, float] = {"flagship_extract": round(flagship_sec, 3)}
    for name in names:
        if name == "extract_documents" and scale > 1:
            continue  # already measured as flagship at scale
        fn = EQ.QUERIES[name]
        per_query[name] = round(materialize(fn(spark, sf_dir)), 3)

    total = sum(per_query.values())
    sf = sf_dir.rstrip("/").split("sf")[-1]
    out = {
        "metric": "headline_queries_total_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": per_query,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": cpus,
        "scale": scale,
        "flagship": {
            "n_docs": n_docs,
            "n_spans": int(n_spans),
            "sec": round(flagship_sec, 3),
            "docs_per_sec": round(n_docs / flagship_sec, 1),
            "spans_per_sec": round(n_spans / flagship_sec, 1),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
