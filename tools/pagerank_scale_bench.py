"""Iterative-operator scaling evidence: PageRank at two parallelism
levels (BENCH.md). The flagship scaling table measures the one-pass
extraction pipeline; this measures the OTHER plan family — an iterative
job whose per-round cost is two shuffles — on a synthesized graph big
enough to be data-bound rather than scheduler-bound.

Graph shape (deterministic expressions, no RNG): N nodes; every node
links to one of 100 hubs (power-law in-degree head), to its div-2 parent
(tree spine), and every 3rd node forward — ~3N edges.

Usage: python tools/pagerank_scale_bench.py [n_nodes] [iters] [lo] [hi]
Each level runs in its own JVM (spark-submit-equivalent isolation) and
keeps the best of 2 passes.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, ".")

_CHILD = """
import json, sys, time
sys.path.insert(0, ".")
from pyspark.sql import functions as F
from ocr_spark.operators.graph import pagerank
from ocr_spark.session import get_spark

n, iters, cpus = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
spark = get_spark("pr-scale", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8))
spark.sparkContext.setLogLevel("ERROR")
ids = spark.range(n).select(F.col("id").alias("doc_id")).repartition(64)
e1 = ids.select(F.col("doc_id").alias("src"), (F.col("doc_id") % 100).alias("dst"))
e2 = ids.select(F.col("doc_id").alias("src"), F.expr("doc_id div 2").alias("dst"))
e3 = ids.filter(F.col("doc_id") % 3 == 0).select(
    F.col("doc_id").alias("src"), (F.col("doc_id") + 1).alias("dst"))
edges = e1.unionByName(e2).unionByName(e3)
best = None
for _ in range(2):
    t0 = time.time()
    out = pagerank(edges, n_iters=iters)
    cnt = out.count()
    w = time.time() - t0
    best = min(best or w, w)
print(json.dumps({"nodes": cnt, "sec": round(best, 2)}))
"""


def run(cpus: int, n: int, iters: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", _CHILD, str(n), str(iters), str(cpus)],
        capture_output=True, text=True, timeout=3600,
        env=dict(os.environ, PYTHONPATH="."),
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    lo = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    hi = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    n_edges = 3 * n  # ~exact: N hubs + N parents + N/3 forwards, pre-distinct
    r_lo = run(lo, n, iters)
    r_hi = run(hi, n, iters)
    eff = (r_lo["sec"] / r_hi["sec"]) / (hi / lo)
    print(json.dumps({
        "metric": f"pagerank_scaling_{lo}_to_{hi}",
        "value": round(eff, 3),
        "unit": "ratio",
        "n_nodes": n, "n_edges_approx": n_edges, "iters": iters,
        f"local{lo}_sec": r_lo["sec"], f"local{hi}_sec": r_hi["sec"],
        f"edges_per_sec_local{hi}": round(n_edges * iters / r_hi["sec"]),
    }))


if __name__ == "__main__":
    main()
