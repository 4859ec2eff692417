"""Bucketed co-located joins: the write-time shuffle is the ONLY shuffle.

The scale claim under test: two tables bucketed identically on the join
key plan their join with zero Exchange operators, while the same join
over plain parquet shuffles both sides. Values must be identical either
way — bucketing is a layout contract, never a semantics change.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_spark.plans.bucketed import (
    bucketed_join,
    exchange_count,
    write_bucketed,
)


def _corpus(spark, n=500):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("document text "), F.col("id")).alias("text"),
    )


def _features(spark, n=500):
    return spark.range(0, n, 2).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).cast("int").alias("score"),
    )


@pytest.fixture
def no_broadcast(spark):
    """Emulate at-scale join sides: a 10^12-row corpus never broadcasts,
    so force the SortMergeJoin path the claim is about."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


@pytest.fixture
def bucketed_pair(spark, tmp_path):
    write_bucketed(_corpus(spark), "t_corpus_b", str(tmp_path / "corpus"), buckets=8)
    write_bucketed(_features(spark), "t_feat_b", str(tmp_path / "feat"), buckets=8)
    yield "t_corpus_b", "t_feat_b"
    spark.sql("DROP TABLE IF EXISTS t_corpus_b")
    spark.sql("DROP TABLE IF EXISTS t_feat_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_pair, tmp_path, no_broadcast):
    left, right = bucketed_pair
    j = bucketed_join(spark, left, right)
    assert exchange_count(j) == 0, "bucketed join must plan shuffle-free"

    # negative control: the same join over plain parquet shuffles
    _corpus(spark).write.parquet(str(tmp_path / "plain_c"))
    _features(spark).write.parquet(str(tmp_path / "plain_f"))
    plain = spark.read.parquet(str(tmp_path / "plain_c")).join(
        spark.read.parquet(str(tmp_path / "plain_f")), "doc_id"
    )
    assert exchange_count(plain) >= 1

    # layout is value-invisible
    got = sorted((r["doc_id"], r["score"]) for r in j.collect())
    want = sorted((r["doc_id"], r["score"]) for r in plain.collect())
    assert got == want and len(got) == 250


def test_bucketed_groupby_has_no_exchange(spark, bucketed_pair):
    left, _ = bucketed_pair
    agg = spark.table(left).groupBy("doc_id").agg(F.count("*").alias("n"))
    assert exchange_count(agg) == 0, "groupBy on the bucket key must not shuffle"
    assert agg.count() == 500


def test_bucketed_write_is_one_file_per_bucket(spark, tmp_path):
    import glob

    write_bucketed(_corpus(spark), "t_files_b", str(tmp_path / "c"), buckets=8)
    try:
        files = glob.glob(str(tmp_path / "c" / "*.parquet"))
        # repartition(buckets, key) before the write: one file per bucket,
        # not tasks × buckets (the small-file metadata bomb at scale)
        assert len(files) == 8
    finally:
        spark.sql("DROP TABLE IF EXISTS t_files_b")


def test_mismatched_bucket_counts_fall_back_to_shuffle(spark, tmp_path, no_broadcast):
    write_bucketed(_corpus(spark), "t_b8", str(tmp_path / "b8"), buckets=8)
    write_bucketed(_features(spark), "t_b5", str(tmp_path / "b5"), buckets=5)
    try:
        j = bucketed_join(spark, "t_b8", "t_b5")
        # 5 is not a divisor/multiple of 8 — Spark must shuffle at least
        # one side; the join still returns correct rows
        assert exchange_count(j) >= 1
        assert j.count() == 250
    finally:
        spark.sql("DROP TABLE IF EXISTS t_b8")
        spark.sql("DROP TABLE IF EXISTS t_b5")
