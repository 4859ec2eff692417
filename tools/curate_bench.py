"""End-to-end curation throughput: run the FULL curate job (every stage
on) over the sf documents table and print docs/sec for the whole pass.

The per-query bench (bench.py) times each operator in isolation; this
measures the integrated pipeline a data team actually submits — fix-text
→ minhash-cc dedup → line dedup → decontamination → LM filter →
classifier filter → Gopher gate → language filter → blocklist → domain
gate → PII → temperature mix → packing — including the materialized
global decisions and the bucketed, resumable writes.

    python tools/curate_bench.py [sf_dir] [buckets] [scale]

``scale`` replicates the documents table N× (suffixed ids) so the
per-bucket fixed overhead amortizes — at sf0.1's raw 5,000 docs the job
is all scheduling, which says nothing about throughput at crawl scale.
Gopher's word-count floor is tuned to the synthetic corpus's doc length
(min_words=20; the published 50 rejects the whole table — the knob a
real deployment tunes for its document mix).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    buckets = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    scale = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import functions as F

    from jobs.curate_job import run_curate
    from ocr_spark.session import get_spark

    spark = get_spark(
        "curate-bench", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8)
    )
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="curate_bench_")
    try:
        base = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
        # TRUE holdout for decontamination: the eval set is a disjoint
        # slice of base documents whose entire replica family is excluded
        # from the training corpus — drawing eval from the replicated
        # corpus itself would make every survivor a genuine leak and the
        # decon stage would (correctly) zero the output
        ev_docs = base.filter(F.col("doc_id") % 20 == 7)
        docs = base.filter(F.col("doc_id") % 20 != 7)
        if scale > 1:
            n_base = base.count()
            reps = spark.range(scale).select(F.col("id").alias("rep"))
            # vary the text per replica: near-dup families (the realistic
            # crawl shape — the dedup stage earns its keep), not byte-dups
            docs = (
                docs.crossJoin(F.broadcast(reps))
                .select(
                    (F.col("doc_id") + F.col("rep") * n_base).alias("doc_id"),
                    F.concat(
                        F.coalesce(F.col("text"), F.lit("")),
                        F.lit(" replica marker "),
                        F.col("rep").cast("string"),
                        F.lit(" of this corpus copy"),
                    ).alias("text"),
                )
            )
        n_docs = docs.count()
        inp = os.path.join(work, "in.parquet")
        docs.repartition(max(cpus, 8)).write.parquet(inp)  # input prep, outside the timer

        ev = os.path.join(work, "eval.parquet")
        ev_docs.write.parquet(ev)

        out = os.path.join(work, "cur")
        t0 = time.time()
        summary = run_curate(
            spark,
            inp,
            out,
            dedup_mode="minhash-cc",
            threshold=0.8,
            langs=("en", "ru"),
            num_buckets=buckets,
            line_dedup=True,
            blocklist=("casino", "xxx"),
            blocked_domains=("spamsite.com",),
            decon_eval=ev,
            decon_format="parquet",
            lm_max_bits=12.0,
            mix_cap=1_000_000,
            pack_seq_len=2048,
            do_fix_text=True,
            # tuned to the synthetic corpus's document mix: 54-word median
            # (published 50-word floor rejects half) and contract-style text
            # that lacks the paper's 8 English function words entirely
            gopher_overrides={"min_words": 20, "min_stopwords_present": 0},
            substr_k=8,
        )
        wall = time.time() - t0
        kept = spark.read.parquet(os.path.join(out, "bucket=*")).count()
        print(json.dumps({
            "metric": "curation_docs_per_sec",
            "value": round(n_docs / wall, 1),
            "unit": "docs/sec",
            "n_docs": n_docs,
            "kept_docs": kept,
            "wall_sec": round(wall, 2),
            "buckets": buckets,
            "cpus": cpus,
            "stages": "fix-text,minhash-cc,line-dedup,substr-dedup,decon,lm,"
                      "gopher,lang,blocklist,domains,pii,mix,pack",
            "summary": {k: v for k, v in summary.items()
                        if k in ("buckets_done", "buckets_skipped",
                                 "packed_docs", "packed_sequences", "mix_kept_docs")},
        }))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
