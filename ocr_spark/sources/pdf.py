"""PDF sources (SURVEY.md §2.1 S2–S5) over binary document columns.

The reference shells out to PyPDF2 / pdf2image+poppler per request
(pdf_processor.py:168-184, :259-290). Here:

- S5 sniffer        pure Column expression over (path, content) — magic
                    bytes '%PDF' or extension (pdf_processor.py:1011-1035)
- S2 direct text    Arrow-batched UDF using pypdf when importable; this
                    container has no pypdf → the stage raises a clear
                    NotImplementedError at first batch, with the Spark-side
                    plumbing (schema, explode, page ordering) real
- S3 rasterizer     poppler is a process boundary the sandbox lacks —
                    explicit stub
- S4 metadata       same pypdf gate as S2

The page-exploded schema feeds the same span pipeline as HTML text: one
row per page → per-page column analysis → A4 order-preserving concat.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

try:  # optional dependency gate (not installed in this sandbox)
    import pypdf  # type: ignore

    HAVE_PYPDF = True
except ImportError:
    pypdf = None
    HAVE_PYPDF = False

PAGES_SCHEMA = "doc_id long, page_number int, text string"
META_SCHEMA = (
    "doc_id long, pages int, title string, author string, subject string, "
    "creator string, producer string"
)


def is_pdf(path: Column, content: Column) -> Column:
    """S5 (pdf_processor.py:1011-1035): extension OR %PDF magic bytes."""
    by_ext = F.lower(F.coalesce(path, F.lit(""))).endswith(".pdf")
    magic = F.substring(content, 1, 4) == F.lit(b"%PDF")
    return by_ext | F.coalesce(magic, F.lit(False))


def extract_pages(docs: DataFrame, id_col: str = "doc_id", content_col: str = "content") -> DataFrame:
    """S2: per-page direct text via pypdf, one output row per page.

    Executor-side import gate: on hosts without pypdf the task fails with an
    actionable error instead of silently returning empties.
    """

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not HAVE_PYPDF:
            raise NotImplementedError(
                "pypdf is not installed on this executor; install it or route "
                "these documents to the OCR branch (pipeline.route_documents)"
            )
        import io

        for pdf in batches:
            out = {"doc_id": [], "page_number": [], "text": []}
            for rid, content in zip(pdf[id_col].tolist(), pdf[content_col].tolist()):
                try:
                    reader = pypdf.PdfReader(io.BytesIO(content))
                    for i, page in enumerate(reader.pages, start=1):
                        out["doc_id"].append(int(rid))
                        out["page_number"].append(i)
                        out["text"].append(page.extract_text() or "")
                except Exception:  # graceful degradation (§4): bad doc → no rows
                    continue
            yield pd.DataFrame(out)

    return docs.select(F.col(id_col), F.col(content_col)).mapInPandas(process, PAGES_SCHEMA)


def concat_pages(pages: DataFrame) -> DataFrame:
    """A4 (pdf_processor.py:104-139): order-preserving page concat — sort
    INSIDE the aggregation, never relying on partition order."""
    return pages.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("page_number").alias("p"), F.col("text").alias("t")))
                ),
                lambda s: s["t"],
            ),
            "\n",
        ).alias("all_text"),
        F.count(F.lit(1)).cast("int").alias("total_pages"),
    )


ALLOWED_EXTENSIONS = (".jpg", ".jpeg", ".png", ".bmp", ".tiff", ".pdf")
MAX_IMAGE_BYTES = 10 * 1024 * 1024
MAX_PDF_BYTES = 50 * 1024 * 1024


def validate_upload(df: DataFrame, path_col: str = "path", content_col: str = "content") -> DataFrame:
    """F5 (main.py:87-104): extension allowlist + size caps — but as a
    quarantine COLUMN (ok, reject_reason), never an exception: bad rows are
    routed to a reject side-output instead of failing a 10^12-doc job."""
    path = F.lower(F.coalesce(F.col(path_col), F.lit("")))
    n = F.coalesce(F.length(F.col(content_col)), F.lit(0))
    ext_ok = F.lit(False)
    for ext in ALLOWED_EXTENSIONS:
        ext_ok = ext_ok | path.endswith(ext)
    is_pdf_ext = path.endswith(".pdf")
    too_big = F.when(is_pdf_ext, n > MAX_PDF_BYTES).otherwise(n > MAX_IMAGE_BYTES)
    reason = (
        F.when(~ext_ok, F.lit("unsupported_extension"))
        .when(n == 0, F.lit("empty_file"))
        .when(too_big, F.lit("file_too_large"))
    )
    return df.withColumn("reject_reason", reason).withColumn(
        "ok", F.col("reject_reason").isNull()
    )


def pages_with_columns(pages: DataFrame) -> DataFrame:
    """Per-page PageData rows (main.py:51-56): page text + detected columns
    via the text-path analyzer — the per-page stage of
    pdf_processor.extract_text_with_pages_and_columns (pdf_processor.py:43-166)."""
    from ocr_spark.operators.layout import analyze_text_columns

    cols = analyze_text_columns(F.col("text"))
    return pages.select(
        "doc_id",
        F.col("page_number"),
        "text",
        cols.alias("columns"),
        F.size(cols).cast("int").alias("columns_count"),
        (F.size(cols) > 1).alias("has_multiple_columns"),
    )


def rasterize_stub(*_a, **_k):
    """S3: pdf→image needs poppler (process boundary); not present here."""
    raise NotImplementedError(
        "pdf rasterization requires pdf2image/poppler; wire convert_from_bytes "
        "into an Arrow UDF following sources/pdf.extract_pages's shape"
    )
