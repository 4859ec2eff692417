"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship extraction pipeline (SURVEY.md §3.1 →
ocr_spark.pipeline.extract_documents) on the sf0.001 corpus; ``queries()`` /
``oracle_sql()`` expose every implemented operator from SURVEY.md §2 with
DuckDB twins (see ocr_spark/plans/entry_queries.py for the full inventory
and the Spark↔DuckDB parity rules).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ocr_spark.pipeline import extract_documents
from ocr_spark.plans import entry_queries
from ocr_spark.plans.derived import span_corpus


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: interleaved span corpus → classify → salted assembly →
    document features (one wide row per document)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return extract_documents(span_corpus(docs))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(entry_queries.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(entry_queries.ORACLES)
