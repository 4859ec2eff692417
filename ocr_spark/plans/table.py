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
- **Snapshot history + time travel**: every commit also lands as
  ``_snapshot/manifest-<id>.json``; data files are immutable and only
  ever ADDED (each commit writes into its own top-level
  ``file_group=<g>`` hive directory), so any prior snapshot stays
  byte-readable until `expire_snapshots` garbage-collects it — the same
  append-only-files / replace-metadata contract Iceberg commits keep.
- **Copy-on-write row-level changes** (`delete_where`, `merge_upsert`):
  only the files that actually contain affected rows are rewritten into
  a new file group; untouched files are carried by reference in the new
  manifest.  At 10^12 documents a 0.01% delete rewrites 0.01% of files.
- **Compaction** (`compact`): rewrites the current snapshot into few
  range-clustered files in one new group — the small-file antidote for
  streaming-ingested tables — without disturbing older snapshots.

Scale shape: the stats pass is one aggregation keyed on
``input_file_name()`` (#groups = #files, not #rows); every manifest is
file-count-sized, held driver-side exactly like Iceberg's snapshot
list; commit cost is O(files written by the commit), never O(table).

NOTE: the contract read path is `scan_pruned` (manifest-planned).  A
raw `spark.read.parquet(root)` is only equivalent on a table that has
never been rewritten — after a delete/merge/compact it would also list
dead file groups that only older snapshots reference.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_DIR = "_snapshot"
MANIFEST_NAME = "manifest.json"  # HEAD copy (always the latest snapshot)
HEAD_NAME = "HEAD"
GROUP_COL = "file_group"
# back-compat alias: streaming microbatches land as file_group=batch-<id>
BATCH_COL = GROUP_COL


def _local(p: str) -> str:
    """input_file_name() URIs → local paths ('file:///tmp/x' → '/tmp/x')."""
    return p.split("://", 1)[-1] if "://" in p else p


# ---------------------------------------------------------------------------
# snapshot commit protocol
# ---------------------------------------------------------------------------


def commit_manifest(path: str, manifest: dict) -> dict:
    """Atomic snapshot commit: assign the next snapshot id, write the
    numbered history manifest, then write-temp + rename the HEAD copy
    (os.replace is atomic on POSIX) — a concurrent reader sees the old
    snapshot or the new one, never a torn file."""
    d = os.path.join(path, MANIFEST_DIR)
    os.makedirs(d, exist_ok=True)
    parent = _head_id(path)
    sid = 0 if parent is None else parent + 1
    manifest = dict(manifest)
    manifest["snapshot_id"] = sid
    manifest["parent_id"] = parent
    body = json.dumps(manifest, indent=1, sort_keys=True)
    with open(os.path.join(d, f"manifest-{sid}.json"), "w") as fh:
        fh.write(body)
    tmp = os.path.join(d, MANIFEST_NAME + ".tmp")
    with open(tmp, "w") as fh:
        fh.write(body)
    os.replace(tmp, os.path.join(d, MANIFEST_NAME))
    htmp = os.path.join(d, HEAD_NAME + ".tmp")
    with open(htmp, "w") as fh:
        fh.write(str(sid))
    os.replace(htmp, os.path.join(d, HEAD_NAME))
    return manifest


def _head_id(path: str) -> int | None:
    try:
        with open(os.path.join(path, MANIFEST_DIR, HEAD_NAME)) as fh:
            return int(fh.read().strip())
    except FileNotFoundError:
        return None


def read_manifest(path: str, snapshot_id: int | None = None) -> dict:
    """The HEAD snapshot, or — time travel — any retained snapshot id."""
    name = MANIFEST_NAME if snapshot_id is None else f"manifest-{snapshot_id}.json"
    with open(os.path.join(path, MANIFEST_DIR, name)) as fh:
        return json.load(fh)


def snapshots(path: str) -> list[dict]:
    """Commit log, oldest first: id, parent, operation, file/row counts."""
    d = os.path.join(path, MANIFEST_DIR)
    out = []
    for name in sorted(os.listdir(d)):
        if not (name.startswith("manifest-") and name.endswith(".json")):
            continue
        with open(os.path.join(d, name)) as fh:
            m = json.load(fh)
        out.append(
            {
                "snapshot_id": m["snapshot_id"],
                "parent_id": m.get("parent_id"),
                "operation": m.get("operation", "unknown"),
                "files": len(m["files"]),
                "rows": sum(f["rows"] for f in m["files"]),
            }
        )
    return sorted(out, key=lambda s: s["snapshot_id"])


# ---------------------------------------------------------------------------
# file-group writer + stats
# ---------------------------------------------------------------------------


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


def _write_group(
    df: DataFrame,
    path: str,
    group: str,
    partition_cols: tuple[str, ...],
    stats_col: str,
    n_range_files: int,
) -> list[dict]:
    """Write ``df`` as the data files of ONE commit, under its own
    ``file_group=<group>`` hive directory (overwrite WITHIN the group
    only — other groups, i.e. other snapshots' files, are immutable).
    Returns the manifest entries for the new files; empty input commits
    no files."""
    if GROUP_COL in df.columns:
        df = df.drop(GROUP_COL)
    if df.isEmpty():
        return []
    gdir = os.path.join(path, f"{GROUP_COL}={group}")
    (
        df.repartitionByRange(n_range_files, F.col(stats_col))
        .write.mode("overwrite")
        .partitionBy(*partition_cols)
        .parquet(gdir)
    )
    return _stat_files(df.sparkSession, gdir, path, partition_cols, stats_col)


def _commit_files(
    path: str,
    files: list[dict],
    partition_cols: tuple[str, ...],
    stats_col: str,
    operation: str,
) -> dict:
    return commit_manifest(
        path,
        {
            "format_version": 2,
            "root": path,
            "stats_col": stats_col,
            "partition_cols": list(partition_cols),
            "operation": operation,
            "files": sorted(files, key=lambda f: f["path"]),
        },
    )


def _next_group(path: str) -> str:
    head = _head_id(path)
    return f"s{0 if head is None else head + 1}"


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: tuple[str, ...] = ("lang",),
    stats_col: str = "doc_id",
    n_range_files: int = 8,
) -> dict:
    """Write ``df`` as a hive-partitioned, range-clustered parquet table
    and commit a snapshot manifest.  Returns the manifest dict.  On an
    existing table this is a REPLACE commit: the new snapshot lists only
    the new file group; prior snapshots keep their (untouched) files
    until `expire_snapshots`.

    ``repartitionByRange(stats_col)`` assigns each write task a
    near-disjoint slice of the stats column, so each file's [min, max]
    is narrow and the manifest can actually skip files; a plain write
    would give every file the full value range and skip nothing."""
    files = _write_group(
        df, path, _next_group(path), partition_cols, stats_col, n_range_files
    )
    return _commit_files(path, files, partition_cols, stats_col, "overwrite")


# ---------------------------------------------------------------------------
# scan planning
# ---------------------------------------------------------------------------


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
    snapshot_id: int | None = None,
) -> DataFrame:
    """Read the table through the manifest: partition + file-range
    pruning happens BEFORE Spark lists anything, then the residual
    predicate is re-applied (stats bound files, they don't filter rows).
    ``basePath`` keeps the hive partition columns in the schema.
    ``snapshot_id`` time-travels to any retained snapshot — data files
    are immutable, so an old manifest's file list is still exact."""
    manifest = read_manifest(path, snapshot_id)
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


def _read_files(spark: SparkSession, path: str, files: list[str]) -> DataFrame:
    return spark.read.option("basePath", path).parquet(*files)


# ---------------------------------------------------------------------------
# row-level changes (copy-on-write) and maintenance
# ---------------------------------------------------------------------------


def delete_where(spark: SparkSession, path: str, cond) -> dict:
    """Copy-on-write row delete: find the files that actually contain
    matching rows (one file-count-sized aggregation), rewrite ONLY those
    files' survivors into a new file group, carry every untouched file
    by reference.  ``cond`` is a Column or a SQL string.  A predicate
    touching 0.01% of files rewrites 0.01% of the table — the other
    99.99% of a 10^12-row table is pure metadata."""
    cond = F.expr(cond) if isinstance(cond, str) else cond
    m = read_manifest(path)
    all_files = [f["path"] for f in m["files"]]
    if not all_files:
        return m
    hit = {
        r["f"]
        for r in _read_files(spark, path, all_files)
        .filter(cond)
        .select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    }
    if not hit:
        return m  # nothing matched: no new snapshot, HEAD unchanged
    survivors = _read_files(spark, path, sorted(hit)).filter(~cond)
    new_files = _write_group(
        survivors,
        path,
        _next_group(path),
        tuple(m["partition_cols"]),
        m["stats_col"],
        n_range_files=max(1, len(hit) // 2),
    )
    kept = [f for f in m["files"] if f["path"] not in hit]
    return _commit_files(
        path, kept + new_files, tuple(m["partition_cols"]), m["stats_col"], "delete"
    )


def merge_upsert(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key_col: str | None = None,
) -> dict:
    """MERGE INTO (copy-on-write): rows of ``updates`` whose key exists
    in the table REPLACE the stored row; unmatched keys are INSERTED.
    Only files containing a matched key are rewritten; the update set
    joins against the table on the key (AQE picks broadcast when the
    update set is small — the common upsert shape — and falls back to a
    shuffle join for crawl-sized updates).  ``updates`` must carry the
    table's full logical schema (partition columns included)."""
    m = read_manifest(path)
    key = key_col or m["stats_col"]
    pcols = tuple(m["partition_cols"])
    all_files = [f["path"] for f in m["files"]]
    updates = updates.drop(GROUP_COL) if GROUP_COL in updates.columns else updates
    keys = updates.select(key).distinct()
    if all_files:
        # pin input_file_name() at scan time, BEFORE the join — evaluated
        # after a join it can come back empty (the row's scan context is
        # gone once the probe side is exchanged/broadcast)
        cur = _read_files(spark, path, all_files).select(
            F.col(key), F.input_file_name().alias("f")
        )
        hit = {
            r["f"]
            for r in cur.join(keys, key, "left_semi")
            .select("f")
            .distinct()
            .collect()
        }
    else:
        hit = set()
    # survivors of rewritten files (their non-matched rows) + every update
    # row (matched = replacement, unmatched = insert) form the new group
    parts = [updates]
    if hit:
        parts.append(
            _read_files(spark, path, sorted(hit))
            .drop(GROUP_COL)
            .join(keys, key, "left_anti")
        )
    fresh = parts[0] if len(parts) == 1 else parts[0].unionByName(parts[1])
    new_files = _write_group(
        fresh,
        path,
        _next_group(path),
        pcols,
        m["stats_col"],
        n_range_files=max(2, len(hit)),
    )
    kept = [f for f in m["files"] if f["path"] not in hit]
    return _commit_files(path, kept + new_files, pcols, m["stats_col"], "merge")


def compact(
    spark: SparkSession,
    path: str,
    n_range_files: int = 4,
) -> dict:
    """Rewrite the CURRENT snapshot into ``n_range_files`` range-clustered
    files per partition in one new group — the small-file antidote after
    many streaming microbatch commits.  Values are untouched (pytest
    asserts byte-equality); older snapshots still reference the original
    files, so time travel across the compaction keeps working."""
    m = read_manifest(path)
    all_files = [f["path"] for f in m["files"]]
    if not all_files:
        return m
    df = _read_files(spark, path, all_files)
    new_files = _write_group(
        df, path, _next_group(path), tuple(m["partition_cols"]),
        m["stats_col"], n_range_files,
    )
    return _commit_files(
        path, new_files, tuple(m["partition_cols"]), m["stats_col"], "compact"
    )


def expire_snapshots(path: str, keep_last: int = 1) -> dict:
    """Garbage-collect history: keep the newest ``keep_last`` snapshots,
    drop older manifest files, and physically delete data files no
    retained snapshot references (Iceberg's expire_snapshots +
    remove_orphan_files in one).  Pure driver-side filesystem work —
    the live set is the union of the kept manifests' file lists."""
    d = os.path.join(path, MANIFEST_DIR)
    sids = sorted(
        int(n[len("manifest-"):-len(".json")])
        for n in os.listdir(d)
        if n.startswith("manifest-") and n.endswith(".json")
    )
    keep = set(sids[-max(1, keep_last):])
    live: set[str] = set()
    for sid in keep:
        live.update(_local(f["path"]) for f in read_manifest(path, sid)["files"])
    removed_files = 0
    for root, _dirs, names in os.walk(path):
        if os.path.basename(root) == MANIFEST_DIR:
            continue
        for n in names:
            p = os.path.join(root, n)
            if n.endswith(".parquet") and p not in live:
                os.remove(p)
                removed_files += 1
    # a file group with zero live files left is dead — remove it whole
    # (including its _SUCCESS marker); partially-live groups keep theirs
    import shutil

    for n in os.listdir(path):
        gdir = os.path.join(path, n)
        if not (n.startswith(f"{GROUP_COL}=") and os.path.isdir(gdir)):
            continue
        if not any(p.startswith(gdir + os.sep) for p in live):
            shutil.rmtree(gdir)
    # sweep emptied partition subdirectories bottom-up
    for root, dirs, names in sorted(os.walk(path), key=lambda t: -len(t[0])):
        if root != path and os.path.basename(root) != MANIFEST_DIR:
            if not os.listdir(root):
                os.rmdir(root)
    removed_manifests = 0
    for sid in sids:
        if sid not in keep:
            os.remove(os.path.join(d, f"manifest-{sid}.json"))
            removed_manifests += 1
    return {"removed_files": removed_files, "removed_manifests": removed_manifests}


# ---------------------------------------------------------------------------
# streaming ingestion (Structured Streaming → table layout)
# ---------------------------------------------------------------------------


def refresh_manifest(
    spark: SparkSession,
    path: str,
    partition_cols: tuple[str, ...] = ("lang",),
    stats_col: str = "doc_id",
) -> dict:
    """Rebuild and atomically commit the snapshot manifest from ALL files
    currently on disk.  Full-table repair pass for a table whose
    manifest was lost — NOT for rewritten tables (it would resurrect
    dead file groups); normal commits are incremental."""
    files = _stat_files(spark, path, path, partition_cols, stats_col)
    return _commit_files(path, files, partition_cols, stats_col, "refresh")


def append_batch(
    df: DataFrame,
    path: str,
    batch_id: int,
    partition_cols: tuple[str, ...] = ("lang",),
    stats_col: str = "doc_id",
    n_range_files: int = 4,
) -> dict:
    """Commit one microbatch into the table: the batch writes to its OWN
    file group (``file_group=batch-<id>/``, overwrite mode), so a
    replayed batch — foreachBatch is at-least-once — overwrites its
    previous attempt instead of duplicating rows; the manifest merge
    afterwards replaces any prior entries under the same batch id.
    This is the same replace-not-append discipline as Iceberg's
    streaming commits, done with directory granularity.

    The manifest update is INCREMENTAL: only the new batch group is
    statted — O(batch) per commit, not O(table), so commit cost stays
    flat as the table grows."""
    group = f"batch-{int(batch_id)}"
    new_files = _write_group(
        df, path, group, partition_cols, stats_col, n_range_files
    )
    marker = f"/{GROUP_COL}={group}/"
    try:
        prev = [f for f in read_manifest(path)["files"] if marker not in f["path"]]
    except FileNotFoundError:
        prev = []
    return _commit_files(path, prev + new_files, partition_cols, stats_col, "append")


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
