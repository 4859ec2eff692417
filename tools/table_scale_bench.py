"""Table-layout maintenance cost evidence: CoW work is proportional to
the HIT fraction, never the table.

Builds a many-file table, then measures

- a narrow copy-on-write DELETE: files rewritten vs total files, and
  wall time vs a naive full-table rewrite of the same logical result —
  at 100 TB the naive path rewrites everything, the CoW path only the
  files whose [min, max] straddle the predicate;
- manifest scan planning: files actually read for a narrow key-range
  scan vs the full file count (range clustering), and — after a z-order
  compaction — files read for a predicate on the SECOND clustered
  column, which single-column range clustering cannot skip at all.

Usage: python tools/table_scale_bench.py [n_rows] [n_files]
Prints one JSON line and a markdown snippet for BENCH.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark.sql import functions as F

    from ocr_spark.plans import table as TBL
    from ocr_spark.session import get_spark

    spark = get_spark()
    base = f"/tmp/ocr_spark_table_scale_{spark.sparkContext.applicationId}"
    shutil.rmtree(base, ignore_errors=True)

    docs = (
        spark.range(n_rows)
        .select(
            F.col("id").alias("doc_id"),
            F.md5(F.col("id").cast("string")).alias("text"),
            ((F.col("id") * 2654435761) % 1000).alias("views"),
            F.concat(F.lit("l"), (F.col("id") % 4).cast("string")).alias("lang"),
        )
        .persist()
    )
    docs.count()

    path = os.path.join(base, "t")
    t0 = time.monotonic()
    m0 = TBL.write_partitioned(
        docs, path, partition_cols=("lang",), stats_col="doc_id",
        n_range_files=n_files,
    )
    t_write = time.monotonic() - t0
    total_files = len(m0["files"])

    # --- CoW delete of a ~0.5% contiguous key slice --------------------
    lo, hi = n_rows // 2, n_rows // 2 + n_rows // 200
    t0 = time.monotonic()
    m1 = TBL.delete_where(
        spark, path, f"doc_id BETWEEN {lo} AND {hi}",
        candidate_ranges={"doc_id": (lo, hi)},
    )
    t_cow = time.monotonic() - t0
    rewritten = len([f for f in m1["files"] if f["path"] not in
                     {g["path"] for g in m0["files"]}])
    carried = len(m1["files"]) - rewritten

    # naive comparison: full rewrite of the same logical result
    naive_path = os.path.join(base, "naive")
    t0 = time.monotonic()
    TBL.write_partitioned(
        TBL.scan_pruned(spark, path).filter(~F.col("doc_id").between(lo, hi)),
        naive_path,
        partition_cols=("lang",), stats_col="doc_id", n_range_files=n_files,
    )
    t_naive = time.monotonic() - t0

    # --- scan planning: files read for a narrow range ------------------
    m = TBL.read_manifest(path)
    narrow = TBL.prune_files(m, lo=1000, hi=1000 + n_rows // 100)
    # z-order: prune on the SECOND dimension
    TBL.compact(spark, path, n_range_files=n_files,
                cluster_by=("doc_id", "views"))
    mz = TBL.read_manifest(path)
    z_narrow = TBL.prune_files(mz, ranges={"views": (0, 49)})

    out = {
        "metric": "table_maintenance_scale",
        "n_rows": n_rows,
        "files_total": total_files,
        "write_sec": round(t_write, 2),
        "cow_delete": {
            "hit_fraction_rows": round((hi - lo + 1) / n_rows, 4),
            "files_rewritten": rewritten,
            "files_carried_by_reference": carried,
            "rewrite_fraction_files": round(rewritten / total_files, 4),
            "sec": round(t_cow, 2),
        },
        "naive_full_rewrite_sec": round(t_naive, 2),
        "cow_speedup_vs_naive": round(t_naive / t_cow, 2) if t_cow else None,
        "scan_planning": {
            "narrow_range_files_read": len(narrow),
            "zorder_second_dim_files_read": len(z_narrow),
            "zorder_files_total": len(mz["files"]),
        },
    }
    print(json.dumps(out))
    print()
    print("| rows | files | CoW delete (0.5% rows) | naive rewrite | "
          "range-scan files | z-order 2nd-dim files |")
    print("|---|---|---|---|---|---|")
    print(
        f"| {n_rows:,} | {total_files} | {rewritten}/{total_files} files, "
        f"{t_cow:.1f}s | {t_naive:.1f}s | {len(narrow)}/{total_files} | "
        f"{len(z_narrow)}/{len(mz['files'])} |"
    )
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
