"""Bucketed tables: co-located, shuffle-free joins for recurring keys.

At 100 TB the same join keys recur across every pipeline run — corpus ⋈
dedup index, corpus ⋈ quality features, corpus ⋈ embedding table, all on
``doc_id``. A plain SortMergeJoin shuffles BOTH sides on every run; at a
10^12-row corpus that is the dominant cost of each incremental pass.
Spark-native bucketing (``bucketBy`` + ``saveAsTable``) pays that shuffle
ONCE at write time: both tables hash-partition their files into the same
N buckets on the join key, Catalyst sees the matching output partitioning
(HashPartitioning over the bucket columns) and plans the join with NO
Exchange on either side — bucket i of the left joins bucket i of the
right, task-local.

This is deliberately the catalog/bucketing mechanism Spark already has,
not a hand-scheduled union of per-bucket joins: the whole point of the
Spark-first design is that declaring the layout (bucket spec in the
catalog) lets the optimizer elide the shuffle everywhere the key is
reused — joins, aggregations (``groupBy(key)`` over a bucketed table also
plans without an Exchange), and semi-join filters alike.

Sizing notes for the 1000-executor case:
- Pick ``buckets`` ≈ total cores × small-integer multiple, and keep it
  IDENTICAL across the tables that join; mismatched bucket counts fall
  back to a shuffle of the smaller side (Spark 4 can coalesce compatible
  multiples, but identical is the predictable contract).
- ``.repartition(buckets, key)`` before the write keeps it to one file
  per bucket per write; without it every write task emits a file per
  bucket it touches (tasks × buckets small files — a metadata bomb at
  scale).
- ``sortBy(key)`` makes each bucket file key-sorted so the join's sort
  phase can stream off disk instead of re-sorting.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    buckets: int = 16,
    key: str = "doc_id",
    sort: bool = True,
) -> None:
    """Write ``df`` as an external parquet table bucketed on ``key``.

    The one write-time shuffle (``repartition``) is the cost this layout
    amortizes: every later join/groupBy on ``key`` against an
    equally-bucketed table plans with no Exchange."""
    w = (
        df.repartition(buckets, key)
        .write.mode("overwrite")
        .option("path", path)
        .bucketBy(buckets, key)
    )
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def physical_plan(df: DataFrame) -> str:
    """The formatted physical plan as a string (for shuffle audits)."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def exchange_count(df: DataFrame) -> int:
    """Number of SHUFFLE Exchange operators in the physical plan.

    BroadcastExchange is deliberately not counted: replicating a small
    side is the cheap alternative to a shuffle, not the cost this module
    exists to remove (and on truly small sides Catalyst rightly prefers
    it over the bucketed SortMergeJoin)."""
    return sum(
        1
        for line in physical_plan(df).splitlines()
        if "Exchange" in line
        and "BroadcastExchange" not in line
        and "ReusedExchange" not in line
    )


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    key: str = "doc_id",
    how: str = "inner",
) -> DataFrame:
    """Join two equally-bucketed catalog tables on their bucket key —
    plans shuffle-free (assert with ``exchange_count`` in tests)."""
    return spark.table(left_table).join(spark.table(right_table), key, how)
