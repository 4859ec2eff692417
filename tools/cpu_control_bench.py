"""Pure-CPU control for the scaling-efficiency argument (BENCH.md).

Runs K independent Python worker processes (zero Spark, zero shuffles, zero
shared memory beyond the OS) each executing the same fixed numeric kernel,
and reports per-core efficiency vs a single process.  If THIS number decays
at high K, the host is not delivering K clean vCPUs (steal / SMT /
memory-bandwidth contention) and no Spark plan property can beat it — the
control is the ceiling any 8→32 measurement on this VM must be read against.

Usage: python tools/cpu_control_bench.py [K ...]   (default: 1 2 8 16 32)
Prints one JSON line:
  {"metric": "cpu_control_per_core_efficiency", "per_k": {K: eff, ...}, ...}
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

# ~1s of work on an unloaded core: integer + float mix resembling hash/
# metric kernels (no numpy so the control measures cores, not BLAS threads)
N = 4_000_000


def kernel(_: int) -> float:
    t0 = time.time()
    acc = 0
    x = 1.0
    for i in range(N):
        acc = (acc * 1103515245 + i) & 0x7FFFFFFF
        x = x * 1.0000001 + (acc & 0xFF) * 1e-9
    return time.time() - t0


def measure(k: int, reps: int = 3) -> float:
    """Best-of-reps mean per-process kernel seconds at K concurrent procs."""
    best = float("inf")
    for _ in range(reps):
        with mp.Pool(processes=k) as pool:
            times = pool.map(kernel, range(k))
        best = min(best, sum(times) / len(times))
    return best


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [1, 2, 8, 16, 32]
    if 1 not in ks:
        ks = [1] + ks
    secs = {k: measure(k) for k in ks}
    base = secs[1]
    out = {
        "metric": "cpu_control_per_core_efficiency",
        "unit": "ratio_vs_1proc",
        "kernel_n": N,
        "sec_per_proc": {str(k): round(s, 3) for k, s in secs.items()},
        "per_k": {str(k): round(base / secs[k], 3) for k in ks},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
