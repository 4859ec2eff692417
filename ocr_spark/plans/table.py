"""Partitioned corpus-table layout with snapshot manifests — the
table-format leg of the north rule ("over Iceberg tables …
partitioning / shuffle / skew handled explicitly"), built from open
primitives the sandbox has (no Iceberg runtime jar; BASELINE.md records
that de-scope, plans/checkpoint.py holds the resumable-commit protocol):

- **Hive-style partition directories** (`partitionBy`) give Catalyst
  PARTITION PRUNING: a `lang = 'en'` predicate never lists, opens, or
  schedules the other languages' directories (`.explain` shows it under
  ``PartitionFilters``).  At 10^12 documents this is the difference
  between touching 1/N of the table and touching all of it.
- **Range-clustered files** (`repartitionByRange`` on the stats column
  before the write) make every data file cover a narrow, near-disjoint
  slice of that column — the precondition for file skipping.
- **A snapshot manifest** (one JSON per commit, file-level min/max stats
  and row counts — the job Iceberg manifests and parquet footers do)
  enables FILE SKIPPING: a range predicate on the stats column selects
  only overlapping files before Spark ever lists the directory.  The
  manifest is committed atomically (write-temp + rename) so readers see
  either the previous snapshot or the new one, never a partial table.

Scale shape: the stats pass is one aggregation keyed on
``input_file_name()`` (#groups = #files, not #rows); the manifest is
file-count-sized, held driver-side exactly like Iceberg's snapshot list.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_DIR = "_snapshot"
MANIFEST_NAME = "manifest.json"


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: tuple[str, ...] = ("lang",),
    stats_col: str = "doc_id",
    n_range_files: int = 8,
) -> dict:
    """Write ``df`` as a hive-partitioned, range-clustered parquet table
    and commit a snapshot manifest.  Returns the manifest dict.

    ``repartitionByRange(stats_col)`` assigns each write task a
    near-disjoint slice of the stats column, so each file's [min, max]
    is narrow and the manifest can actually skip files; a plain write
    would give every file the full value range and skip nothing."""
    (
        df.repartitionByRange(n_range_files, F.col(stats_col))
        .write.mode("overwrite")
        .partitionBy(*partition_cols)
        .parquet(path)
    )
    spark = df.sparkSession
    stats = (
        spark.read.parquet(path)
        .select(
            F.input_file_name().alias("file"),
            F.col(stats_col).alias("s"),
            *[F.col(c).cast("string").alias(c) for c in partition_cols],
        )
        .groupBy("file", *partition_cols)
        .agg(
            F.min("s").alias("min"),
            F.max("s").alias("max"),
            F.count(F.lit(1)).alias("rows"),
        )
        .collect()
    )
    manifest = {
        "format_version": 1,
        "root": path,
        "stats_col": stats_col,
        "partition_cols": list(partition_cols),
        "files": sorted(
            (
                {
                    "path": r["file"],
                    "partition": {c: r[c] for c in partition_cols},
                    "min": r["min"],
                    "max": r["max"],
                    "rows": int(r["rows"]),
                }
                for r in stats
            ),
            key=lambda f: f["path"],
        ),
    }
    commit_manifest(path, manifest)
    return manifest


def commit_manifest(path: str, manifest: dict) -> None:
    """Atomic snapshot commit: write-temp + rename (os.replace is atomic
    on POSIX) — a concurrent reader sees the old snapshot or the new one,
    never a torn file."""
    d = os.path.join(path, MANIFEST_DIR)
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, MANIFEST_NAME + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(d, MANIFEST_NAME))


def read_manifest(path: str) -> dict:
    with open(os.path.join(path, MANIFEST_DIR, MANIFEST_NAME)) as fh:
        return json.load(fh)


def prune_files(
    manifest: dict,
    lo=None,
    hi=None,
    partition_eq: dict[str, str] | None = None,
) -> list[dict]:
    """Manifest-side planning: the file entries whose partition values
    match ``partition_eq`` and whose [min, max] stats overlap [lo, hi].
    Pure driver-side metadata work, like Iceberg's scan planning."""
    out = []
    for f in manifest["files"]:
        if partition_eq and any(
            f["partition"].get(c) != v for c, v in partition_eq.items()
        ):
            continue
        if lo is not None and f["max"] is not None and f["max"] < lo:
            continue
        if hi is not None and f["min"] is not None and f["min"] > hi:
            continue
        out.append(f)
    return out


def scan_pruned(
    spark: SparkSession,
    path: str,
    lo=None,
    hi=None,
    partition_eq: dict[str, str] | None = None,
) -> DataFrame:
    """Read the table through the manifest: partition + file-range
    pruning happens BEFORE Spark lists anything, then the residual
    predicate is re-applied (stats bound files, they don't filter rows).
    ``basePath`` keeps the hive partition columns in the schema."""
    manifest = read_manifest(path)
    files = [f["path"] for f in prune_files(manifest, lo, hi, partition_eq)]
    if not files:
        return spark.read.option("basePath", path).parquet(path).filter(F.lit(False))
    df = spark.read.option("basePath", path).parquet(*files)
    sc = manifest["stats_col"]
    if lo is not None:
        df = df.filter(F.col(sc) >= lo)
    if hi is not None:
        df = df.filter(F.col(sc) <= hi)
    for c, v in (partition_eq or {}).items():
        df = df.filter(F.col(c) == v)
    return df
