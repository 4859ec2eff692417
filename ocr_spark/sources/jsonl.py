"""JSONL corpus source/sink — the interchange format most external
document corpora arrive in (one JSON object per line).

Reference analog: the service accepts uploads one request at a time
(main.py:72); a Spark engine instead ingests bulk line-delimited JSON.
Robustness contract mirrors validate_upload's (F5): malformed lines are
QUARANTINED to a side column, never an exception — at 10^12 documents a
single truncated line must not kill the job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOC_SCHEMA = "doc_id long, text string"


def write_jsonl(docs: DataFrame, path: str, partitions: int | None = None) -> None:
    """Write (doc_id, text) as newline-delimited JSON via Spark's native
    JSON writer (escaping and unicode handled by the engine). Default
    keeps the input's partitioning — every core writes; pass
    ``partitions=1`` only when a single output file is genuinely needed
    (tiny fixtures), since that serializes the whole write through one
    task."""
    out = docs.select("doc_id", "text")
    if partitions:
        out = out.coalesce(partitions)
    out.write.mode("overwrite").json(path)


def read_documents_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Read a documents JSONL corpus with an EXPLICIT schema (schema
    inference at corpus scale is an extra full pass) in PERMISSIVE mode:
    malformed lines land in ``corrupt_record`` with null fields, valid
    lines have it null. Callers route ``corrupt_record IS NOT NULL`` to a
    reject sink, like validate_upload's quarantine column."""
    df = (
        spark.read.schema(DOC_SCHEMA + ", _corrupt_record string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    return df.withColumnRenamed("_corrupt_record", "corrupt_record")


def split_quarantine(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(valid_rows, quarantined_raw_lines) — the F5-style routing.

    The parsed frame is cached first: Spark disallows a query whose only
    referenced column from a raw JSON scan is the internal corrupt-record
    column (QUERY_ONLY_CORRUPT_RECORD_COLUMN), and caching the full parse
    is the documented workaround — it also means the file is parsed once
    for both sides of the split."""
    df = df.cache()
    valid = df.filter(F.col("corrupt_record").isNull()).drop("corrupt_record")
    bad = df.filter(F.col("corrupt_record").isNotNull()).select(
        F.col("corrupt_record").alias("raw_line")
    )
    return valid, bad


def load_documents(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    log_quarantine: bool = False,
    html_extractor: str = "boilerpipe",
    respect_noindex: bool = False,
) -> DataFrame:
    """Job-facing loader: ``parquet`` reads as-is; ``jsonl``/``csv`` read
    with the quarantine schema and return only valid rows, LAZILY — no
    cache, no load-time count, so the corpus is first materialized by the
    job's own first pass (at 10^12 documents an eager corpus-wide cache +
    count here would be a blocking full scan spilled to executor disk
    before any real work starts). ``log_quarantine=True`` adds one extra
    counting pass and prints the reject total; jobs that want the
    quarantined raw LINES call read_documents_jsonl/split_quarantine
    directly."""
    if fmt == "parquet":
        return spark.read.parquet(path)
    if fmt == "orc":
        # columnar like parquet (typed, self-describing, no quarantine
        # path needed) — Spark-native reader, same lazy contract
        return spark.read.orc(path)
    if fmt in ("jsonl", "csv"):
        reader = read_documents_jsonl if fmt == "jsonl" else read_documents_csv
        df = reader(spark, path)
        valid = df.filter(F.col("corrupt_record").isNull()).drop("corrupt_record")
        if log_quarantine:
            # doc_id rides along so the scan is not a corrupt-column-only
            # query (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — no cache needed.
            n_bad = (
                df.select("doc_id", "corrupt_record")
                .filter(F.col("corrupt_record").isNotNull())
                .count()
            )
            if n_bad:
                print(f"{fmt} ingest: quarantined {n_bad} malformed records from {path}")
        return valid
    if fmt == "warc":
        from ocr_spark.sources.warc import read_warc, warc_documents

        # web-archive ingest: 200-OK text/html responses, boilerplate
        # stripped (``html_extractor``: boilerpipe | readability |
        # justext), robots-meta noindex pages optionally excluded;
        # malformed records are quarantined inside the parser (error rows
        # are simply not responses), matching the lazy no-count contract
        return warc_documents(
            read_warc(spark, path),
            extractor=html_extractor,
            respect_noindex=respect_noindex,
        )
    raise ValueError(f"unknown input format {fmt!r}")


def write_csv(docs: DataFrame, path: str, partitions: int | None = None) -> None:
    """Write (doc_id, text) as RFC-4180-quoted CSV with a header. Document
    text embeds quotes/newlines routinely — quoteAll + escaped quotes keep
    the file parseable by the multiLine reader below. Partitioning default
    as in :func:`write_jsonl` (keep the input's; don't serialize)."""
    out = docs.select("doc_id", "text")
    if partitions:
        out = out.coalesce(partitions)
    (
        out.write.mode("overwrite")
        .option("header", "true")
        .option("quoteAll", "true")
        .option("escape", '"')
        .csv(path)
    )


def read_documents_csv(spark: SparkSession, path: str) -> DataFrame:
    """CSV twin of :func:`read_documents_jsonl`: explicit schema,
    ``multiLine`` (quoted newlines inside text fields), PERMISSIVE with a
    quarantine column. Same split_quarantine routing applies."""
    df = (
        spark.read.schema(DOC_SCHEMA + ", _corrupt_record string")
        .option("header", "true")
        .option("multiLine", "true")
        .option("quote", '"')
        .option("escape", '"')
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
    )
    return df.withColumnRenamed("_corrupt_record", "corrupt_record")
