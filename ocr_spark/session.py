"""SparkSession factory tuned for the extraction engine.

Scale posture (local[32] here; 1000-executor cluster in production):
- Arrow enabled: every Python-side stage is a vectorized pandas/Arrow UDF,
  never per-row Python (north_rule).
- AQE on: runtime coalescing of the span-assembly shuffle and skew-join
  splitting come for free.
- ANSI off: the engine keeps the reference's total-function semantics
  (a bad row yields null/0.0 columns, never a task-failing exception —
  graceful degradation per ocr_service.py:149-152).  All expressions are
  still written with explicit zero-division guards so they also run
  correctly under a caller-provided ANSI session.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "ocr-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER", "local[*]")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
        # Throughput collector + a large heap: the string-heavy span stages
        # allocate hard, and at 32 threads the default G1/8g setup loses
        # ~45% throughput to allocation stalls (measured via
        # tools/scaling_bench.py: 63k -> 92k docs/s switching to ParallelGC)
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        # InferFiltersFromGenerate duplicates the whole span-construction
        # expression into a pre-shuffle size()>0 filter (seen in
        # tools/explain_audit.py) — the corpus never has empty span arrays,
        # so that inferred filter is pure recompute overhead
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
    )
    if shuffle_partitions is not None:
        builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
