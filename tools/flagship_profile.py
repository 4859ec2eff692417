#!/usr/bin/env python
"""Decompose the 16→32 flagship scaling residual: stragglers vs task-time
inflation (round-4 verdict task #7).

Runs the flagship extraction at one parallelism level, then reads per-stage
task metrics from the Spark UI REST API (localhost:4040): per-stage
executorRunTime sum, task count, and task-duration quantiles. Comparing two
levels answers the judge's question directly:

  * If SUM(task time) INFLATES at 32 cores vs 16 on identical input, each
    task is individually slower — memory bandwidth / SMT / host steal, a
    platform ceiling no plan change fixes.
  * If the sum is flat but wall grows, the tail (p95/max vs median) shows
    stragglers — a plan/balance problem (salting, partition count).

Usage: python tools/flagship_profile.py [cpus] [scale] [sf_dir]
Prints one JSON line: wall, docs/sec, and per-stage {tasks, run_time_sum,
quantiles}; plus aggregate sum_task_sec and straggler ratios.
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request


def _api(path: str):
    with urllib.request.urlopen(f"http://localhost:4040/api/v1{path}", timeout=10) as r:
        return json.loads(r.read())


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    scale = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

    sys.path.insert(0, ".")
    import os

    from ocr_spark.pipeline import extract_documents
    from ocr_spark.session import get_spark

    spark = get_spark(
        f"flagship-profile-{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    sf_tag = sf_dir.rstrip("/").split("/")[-1]
    corpus_dir = os.environ.get(
        "SPARK_GRAFT_CORPUS_DIR", f"/tmp/ocr_bench_corpus_{sf_tag}_x{scale}"
    )
    if not os.path.exists(os.path.join(corpus_dir, "_SUCCESS")):
        raise SystemExit(f"run bench.py once at scale={scale} to build {corpus_dir}")
    corpus = spark.read.parquet(corpus_dir)
    n_docs = corpus.count()

    flagship = extract_documents(corpus)
    # warm pass (JIT, codegen, page cache), then the measured pass
    flagship.write.format("noop").mode("overwrite").save()
    stages_before = {s["stageId"] for s in _api(f"/applications/{_app()}/stages")}
    t0 = time.time()
    flagship.write.format("noop").mode("overwrite").save()
    wall = time.time() - t0

    stages = [
        s
        for s in _api(f"/applications/{_app()}/stages?status=complete")
        if s["stageId"] not in stages_before
    ]
    per_stage = []
    sum_task_ms = 0
    for s in sorted(stages, key=lambda s: s["stageId"]):
        # use the stage's OWN attempt id (a retried stage completes as
        # attempt 1+ — hardcoding 0 would 404 after the measured run), and
        # tolerate a missing summary rather than dying post-measurement
        attempt = s.get("attemptId", 0)
        try:
            q = _api(
                f"/applications/{_app()}/stages/{s['stageId']}/{attempt}/taskSummary"
                "?quantiles=0.05,0.5,0.95,1.0"
            )
        except Exception:
            q = {}
        dur = q.get("duration", [0, 0, 0, 0])
        sum_task_ms += s["executorRunTime"]
        per_stage.append(
            {
                "stage": s["stageId"],
                "name": s["name"].split(" ")[0],
                "tasks": s["numCompleteTasks"],
                "run_time_sec": round(s["executorRunTime"] / 1000, 2),
                "task_sec_p05_p50_p95_max": [round(x / 1000, 3) for x in dur],
            }
        )
    out = {
        "cpus": cpus,
        "scale": scale,
        "n_docs": n_docs,
        "wall_sec": round(wall, 3),
        "docs_per_sec": round(n_docs / wall, 1),
        "sum_task_sec": round(sum_task_ms / 1000, 2),
        "mean_task_concurrency": round(sum_task_ms / 1000 / wall, 2),
        "stages": per_stage,
    }
    print(json.dumps(out))


_APP = None


def _app() -> str:
    global _APP
    if _APP is None:
        _APP = _api("/applications")[0]["id"]
    return _APP


if __name__ == "__main__":
    main()
