"""Scaling-efficiency evidence (north_rule: ≥0.8 from N to 4N executors).

No real cluster exists in this sandbox, so the same flagship job runs at two
parallelism levels — local[8] and local[32] — on the same (replicated)
input, in separate JVMs. Efficiency = (thr_32 / thr_8) / (32 / 8).

Usage: python tools/scaling_bench.py [scale] [sf_dir]
Prints one JSON line and a markdown table snippet for BENCH.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys


def run(cpus: int, scale: int, sf_dir: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_SCALE=str(scale),
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_QUERIES="none",
    )
    out = subprocess.run(
        [sys.executable, "bench.py"], env=env, capture_output=True, text=True, timeout=3600
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    lo = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    hi = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    # The sandbox VM shows multi-x wall-clock swings from host-level CPU
    # steal; alternate the two configs and keep each one's best pass so a
    # noisy window hits both configs equally instead of biasing one.
    reps = int(os.environ.get("SPARK_GRAFT_SCALING_REPS", "2"))
    runs_lo, runs_hi = [], []
    for _ in range(reps):
        runs_lo.append(run(lo, scale, sf_dir))
        runs_hi.append(run(hi, scale, sf_dir))
    r_lo = max(runs_lo, key=lambda r: r["flagship"]["docs_per_sec"])
    r_hi = max(runs_hi, key=lambda r: r["flagship"]["docs_per_sec"])
    t_lo, t_hi = r_lo["flagship"], r_hi["flagship"]
    eff = (t_hi["docs_per_sec"] / t_lo["docs_per_sec"]) / (hi / lo)
    result = {
        "metric": f"scaling_efficiency_{lo}_to_{hi}",
        "value": round(eff, 3),
        "unit": "ratio",
        "sf": r_lo["sf"],
        "scale": scale,
        "n_docs": t_lo["n_docs"],
        "n_spans": t_lo["n_spans"],
        f"local{lo}": {"sec": t_lo["sec"], "docs_per_sec": t_lo["docs_per_sec"],
                   "spans_per_sec": t_lo["spans_per_sec"]},
        f"local{hi}": {"sec": t_hi["sec"], "docs_per_sec": t_hi["docs_per_sec"],
                    "spans_per_sec": t_hi["spans_per_sec"]},
    }
    print(json.dumps(result))
    print()
    print("| parallelism | wall (s) | docs/sec | spans/sec |")
    print("|---|---|---|---|")
    print(f"| local[{lo}] | {t_lo['sec']} | {t_lo['docs_per_sec']} | {t_lo['spans_per_sec']} |")
    print(f"| local[{hi}] | {t_hi['sec']} | {t_hi['docs_per_sec']} | {t_hi['spans_per_sec']} |")
    print(f"\nscaling efficiency {lo}→{hi}: **{eff:.3f}**")


if __name__ == "__main__":
    main()
