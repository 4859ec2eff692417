"""spark-submit entry point for embedding-index build + ANN queries.

    python tools/make_package.py
    spark-submit --master local[32] --py-files dist/ocr_spark.zip \\
        jobs/ann_job.py --input .../embeddings.parquet --output /tmp/ann \\
        --k 5 --queries 20

One resumable pass over an embeddings table (vec_id, embedding):

  1. model  — train the PQ codebooks (m per-subspace integer Lloyd
              chains) and commit them to ``_model`` (the m×k_sub×sub-int
              artifact), OR load a previous run's model with ``--model``
              so codes stay ADC-comparable across crawl drops (the ANN
              counterpart of dedup_job's ``--against`` index chain).
  2. codes  — encode the corpus against the (frozen) model in one map
              pass; committed to ``_codes`` (vec_id, codes — 4 bits per
              subspace, the 64×-smaller searchable representation).
  3. results — optional: answer the ANN-suite queries (vectors with id <
              ``--queries``) by ADC shortlist + exact re-rank, committed
              to ``_results`` (query_id, neighbor_id, dist_sq, rank).

Every stage is a materialize_once commit (parameter-fingerprinted):
re-running the same command after a kill reuses the committed artifacts
byte-for-byte; changing m/k_sub/iters against a committed model refuses
instead of silently mixing models.
"""

from __future__ import annotations

import argparse
import json
import os


def run_ann(
    spark,
    input_path: str,
    output_dir: str,
    k: int = 5,
    n_queries: int = 20,
    rerank: int = 8,
    m: int | None = None,
    k_sub: int | None = None,
    n_iters: int | None = None,
    model_path: str | None = None,
    input_format: str = "parquet",
) -> dict:
    from pyspark.sql import functions as F

    from ocr_spark.operators import similarity as SIM
    from ocr_spark.plans.checkpoint import materialize_once

    mm = m or SIM.PQ_M
    ks = k_sub or SIM.PQ_KSUB
    it = n_iters or SIM.PQ_ITERS

    emb = (
        spark.read.orc(input_path)
        if input_format == "orc"
        else spark.read.parquet(input_path)
    )

    if model_path:
        codebooks = SIM.pq_load_codebooks(spark.read.parquet(model_path))
        if len(codebooks) != mm or len(codebooks[0]) != ks:
            raise ValueError(
                f"--model has m={len(codebooks)}, k_sub={len(codebooks[0])} "
                f"but this run asked for m={mm}, k_sub={ks}"
            )
        model_df = materialize_once(
            spark,
            SIM.pq_codebooks_df(spark, codebooks),
            os.path.join(output_dir, "_model"),
            meta={"stage": "model", "m": mm, "k_sub": ks, "iters": it,
                  "source": model_path},
        )
    else:
        base = emb.select(
            "vec_id", SIM._qvec(F.col("embedding"), 1000).alias("q")
        ).filter(F.col("q").isNotNull())
        first = base.orderBy("vec_id").limit(1).collect()
        if not first:
            raise ValueError(f"no vectors in {input_path}")
        dim = len(first[0]["q"])
        codebooks = SIM.pq_train(
            base.filter(F.size("q") == dim).persist(), mm, ks, it, dim
        )
        model_df = materialize_once(
            spark,
            SIM.pq_codebooks_df(spark, codebooks),
            os.path.join(output_dir, "_model"),
            meta={"stage": "model", "m": mm, "k_sub": ks, "iters": it,
                  "source": input_path},
        )
    codebooks = SIM.pq_load_codebooks(model_df)  # committed bytes win

    codes = materialize_once(
        spark,
        SIM.pq_encode(emb, codebooks),
        os.path.join(output_dir, "_codes"),
        meta={"stage": "codes", "m": mm, "k_sub": ks, "input": input_path},
    )
    summary = {"model_rows": model_df.count(), "coded_vectors": codes.count()}

    if n_queries:
        results = materialize_once(
            spark,
            SIM.pq_topk(
                emb, k=k, m=mm, k_sub=ks, n_iters=it,
                n_queries=n_queries, rerank=rerank,
            ),
            os.path.join(output_dir, "_results"),
            meta={"stage": "results", "k": k, "n_queries": n_queries,
                  "rerank": rerank, "input": input_path},
        )
        summary["result_rows"] = results.count()
    return summary


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="embeddings parquet (vec_id, embedding)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--queries", type=int, default=20,
                    help="answer top-k for vectors with id < N (0 = skip)")
    ap.add_argument("--rerank", type=int, default=8)
    ap.add_argument("--m", type=int, default=None, help="PQ subspaces")
    ap.add_argument("--k-sub", type=int, default=None, help="centroids per subspace")
    ap.add_argument("--iters", type=int, default=None, help="Lloyd rounds")
    ap.add_argument("--model", default=None,
                    help="path to a previous run's _model: encode against "
                         "the frozen codebooks (codes stay comparable "
                         "across drops) instead of retraining")
    ap.add_argument("--format", choices=("parquet", "orc"), default="parquet")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("ocr-spark-ann").getOrCreate()
    summary = run_ann(
        spark, args.input, args.output, k=args.k, n_queries=args.queries,
        rerank=args.rerank, m=args.m, k_sub=args.k_sub, n_iters=args.iters,
        model_path=args.model, input_format=args.format,
    )
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
