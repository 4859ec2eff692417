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
    return refresh_manifest(df.sparkSession, path, partition_cols, stats_col)


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


# ---------------------------------------------------------------------------
# streaming ingestion (Structured Streaming → table layout)
# ---------------------------------------------------------------------------

BATCH_COL = "ingest_batch"


def _stat_files(
    spark: SparkSession,
    read_path: str,
    base_path: str,
    partition_cols: tuple[str, ...],
    stats_col: str,
) -> list[dict]:
    """File-level min/max/rows under ``read_path`` — one aggregation keyed
    on input_file_name() (#groups = #files, not #rows); the collect is
    file-count-sized, the same driver-side footprint as Iceberg's
    manifest list."""
    stats = (
        spark.read.option("basePath", base_path)
        .parquet(read_path)
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
    return [
        {
            "path": r["file"],
            "partition": {c: r[c] for c in partition_cols},
            "min": r["min"],
            "max": r["max"],
            "rows": int(r["rows"]),
        }
        for r in stats
    ]


def _commit_files(
    path: str,
    files: list[dict],
    partition_cols: tuple[str, ...],
    stats_col: str,
) -> dict:
    manifest = {
        "format_version": 1,
        "root": path,
        "stats_col": stats_col,
        "partition_cols": list(partition_cols),
        "files": sorted(files, key=lambda f: f["path"]),
    }
    commit_manifest(path, manifest)
    return manifest


def refresh_manifest(
    spark: SparkSession,
    path: str,
    partition_cols: tuple[str, ...] = ("lang",),
    stats_col: str = "doc_id",
) -> dict:
    """Rebuild and atomically commit the snapshot manifest from the files
    currently on disk.  Full-table pass — used by the batch writer and as
    a repair tool; streaming commits use the incremental merge in
    append_batch instead."""
    files = _stat_files(spark, path, path, partition_cols, stats_col)
    return _commit_files(path, files, partition_cols, stats_col)


def append_batch(
    df: DataFrame,
    path: str,
    batch_id: int,
    partition_cols: tuple[str, ...] = ("lang",),
    stats_col: str = "doc_id",
    n_range_files: int = 4,
) -> dict:
    """Commit one microbatch into the table: the batch writes to its OWN
    hive directory (``ingest_batch=<id>/``, overwrite mode), so a
    replayed batch — foreachBatch is at-least-once — overwrites its
    previous attempt instead of duplicating rows; the manifest rebuild
    afterwards is idempotent by construction. This is the same
    replace-not-append discipline as Iceberg's streaming commits, done
    with directory granularity. A streaming table's root must not be
    shared with a plain write_partitioned table (the extra hive level
    would break partition discovery).

    The manifest update is INCREMENTAL: only the new batch directory is
    statted, and its entries replace any prior entries under the same
    batch id in the previous snapshot — O(batch) per commit, not
    O(table), so commit cost stays flat as the table grows."""
    batch_dir = os.path.join(path, f"{BATCH_COL}={int(batch_id)}")
    (
        df.repartitionByRange(n_range_files, F.col(stats_col))
        .write.mode("overwrite")
        .partitionBy(*partition_cols)
        .parquet(batch_dir)
    )
    new_files = _stat_files(df.sparkSession, batch_dir, path, partition_cols, stats_col)
    marker = f"/{BATCH_COL}={int(batch_id)}/"
    try:
        prev = [f for f in read_manifest(path)["files"] if marker not in f["path"]]
    except FileNotFoundError:
        prev = []
    return _commit_files(path, prev + new_files, partition_cols, stats_col)


def stream_to_table(
    stream_df: DataFrame,
    path: str,
    checkpoint_dir: str,
    partition_cols: tuple[str, ...] = ("lang",),
    stats_col: str = "doc_id",
):
    """Structured-Streaming sink into the table layout: every microbatch
    is an append_batch commit (idempotent per batch id) followed by an
    atomic manifest swap, so a reader planning through scan_pruned sees
    each microbatch all-or-nothing. Returns the DataStreamWriter —
    caller picks the trigger and calls .start()."""

    def _commit(batch_df: DataFrame, batch_id: int) -> None:
        append_batch(batch_df, path, batch_id, partition_cols, stats_col)

    return stream_df.writeStream.foreachBatch(_commit).option(
        "checkpointLocation", checkpoint_dir
    )
