"""PDF sources (SURVEY.md §2.1 S2–S5) over binary document columns.

The reference shells out to PyPDF2 / pdf2image+poppler per request
(pdf_processor.py:168-184, :259-290). Here:

- S5 sniffer        pure Column expression over (path, content) — magic
                    bytes '%PDF' or extension (pdf_processor.py:1011-1035)
- S2 direct text    Arrow-batched UDF: pypdf when importable; otherwise a
                    built-in minimal reader that parses uncompressed AND
                    /FlateDecode content streams (Tj operators, stdlib
                    zlib) — enough for the vendored deterministic fixtures
                    (sources/pdf_fixture) and real-world Flate PDFs; other
                    filters raise an actionable error naming pypdf
- S3 rasterizer     poppler is a process boundary the sandbox lacks —
                    explicit stub
- S4 metadata       same reader pair as S2 (trailer /Info dictionary)

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


import re as _re

_OBJ_RE = _re.compile(rb"(\d+) 0 obj(.*?)endobj", _re.DOTALL)
_TJ_RE = _re.compile(rb"\(((?:[^()\\]|\\.)*)\)\s*Tj")


def _pdf_unescape(raw: bytes) -> str:
    return (
        raw.replace(b"\\(", b"(").replace(b"\\)", b")").replace(b"\\\\", b"\\")
    ).decode("latin-1")


def _minipdf_objects(data: bytes) -> dict[int, bytes]:
    return {int(m.group(1)): m.group(2) for m in _OBJ_RE.finditer(data)}


def _content_stream_bytes(content_obj: bytes) -> bytes:
    """Decoded bytes of one content-stream object.

    The stream is sliced by its /Length entry when present (binary Flate
    data may contain any delimiter bytes, so the `endstream` scan is only
    the fallback for length-less writers). /FlateDecode streams — what
    virtually every real-world PDF writes (reference path
    pdf_processor.py:168-184 via PyPDF2) — inflate with stdlib zlib; any
    other filter (DCT, LZW, ASCII85, …) raises the actionable pypdf
    boundary error."""
    sm = _re.search(rb"stream\r?\n", content_obj)
    if sm is None:
        return b""
    head = content_obj[: sm.start()]
    data = content_obj[sm.end() :]
    lm = _re.search(rb"/Length\s+(\d+)", head)
    if lm:
        data = data[: int(lm.group(1))]
    else:
        em = _re.search(rb"\r?\nendstream", data)
        data = data[: em.start()] if em else data
    fm = _re.search(rb"/Filter\s*(?:\[\s*)?/(\w+)", head)
    if fm:
        if fm.group(1) == b"FlateDecode":
            import zlib

            data = zlib.decompress(data)
        else:
            raise NotImplementedError(
                f"unsupported PDF stream filter /{fm.group(1).decode()}: "
                "install pypdf for general PDFs (the built-in reader handles "
                "uncompressed and /FlateDecode streams)"
            )
    return data


def _minipdf_pages(data: bytes) -> list[str]:
    """Per-page text of a PDF with uncompressed or /FlateDecode content
    streams, in page-tree order (the /Kids array). Other filters raise —
    that's the pypdf/poppler boundary, named explicitly."""
    objs = _minipdf_objects(data)
    kids_m = _re.search(rb"/Kids\s*\[(.*?)\]", data, _re.DOTALL)
    if not kids_m:
        raise ValueError("no /Kids page tree")
    page_ids = [int(x) for x in _re.findall(rb"(\d+) 0 R", kids_m.group(1))]
    pages = []
    for pid in page_ids:
        page_obj = objs[pid]
        cm = _re.search(rb"/Contents\s+(\d+) 0 R", page_obj)
        if not cm:
            pages.append("")
            continue
        stream = _content_stream_bytes(objs[int(cm.group(1))])
        chunks = _TJ_RE.findall(stream)
        pages.append("\n".join(_pdf_unescape(c) for c in chunks))
    return pages


def _minipdf_info(data: bytes) -> dict[str, str | None]:
    objs = _minipdf_objects(data)
    out: dict[str, str | None] = {}
    im = _re.search(rb"/Info\s+(\d+) 0 R", data)
    info_obj = objs.get(int(im.group(1)), b"") if im else b""
    for key in ("Title", "Author", "Subject", "Creator", "Producer"):
        m = _re.search(rb"/" + key.encode() + rb"\s*\(((?:[^()\\]|\\.)*)\)", info_obj)
        out[key.lower()] = _pdf_unescape(m.group(1)) if m else None
    return out


def extract_pages(docs: DataFrame, id_col: str = "doc_id", content_col: str = "content") -> DataFrame:
    """S2: per-page direct text (pdf_processor.py:168-184), one output row
    per page. Uses pypdf when installed; falls back to the built-in
    uncompressed-stream reader (module docstring) otherwise."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        for pdf in batches:
            out = {"doc_id": [], "page_number": [], "text": []}
            for rid, content in zip(pdf[id_col].tolist(), pdf[content_col].tolist()):
                try:
                    if HAVE_PYPDF:
                        reader = pypdf.PdfReader(io.BytesIO(content))
                        texts = [p.extract_text() or "" for p in reader.pages]
                    else:
                        texts = _minipdf_pages(bytes(content))
                except NotImplementedError:
                    raise  # dependency boundary — fail loud, never silently empty
                except Exception:  # graceful degradation (§4): bad doc → no rows
                    continue
                for i, text in enumerate(texts, start=1):
                    out["doc_id"].append(int(rid))
                    out["page_number"].append(i)
                    out["text"].append(text)
            yield pd.DataFrame(out)

    return docs.select(F.col(id_col), F.col(content_col)).mapInPandas(process, PAGES_SCHEMA)


def extract_metadata(docs: DataFrame, id_col: str = "doc_id", content_col: str = "content") -> DataFrame:
    """S4: document metadata (pdf_processor.py:222-257) — page count plus
    the trailer /Info fields, via the same reader pair as extract_pages."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        cols = ("title", "author", "subject", "creator", "producer")
        for pdf in batches:
            out: dict[str, list] = {"doc_id": [], "pages": []}
            for c in cols:
                out[c] = []
            for rid, content in zip(pdf[id_col].tolist(), pdf[content_col].tolist()):
                try:
                    if HAVE_PYPDF:
                        reader = pypdf.PdfReader(io.BytesIO(content))
                        meta = reader.metadata or {}
                        info = {c: getattr(meta, c, None) for c in cols}
                        n_pages = len(reader.pages)
                    else:
                        info = _minipdf_info(bytes(content))
                        n_pages = len(_minipdf_pages(bytes(content)))
                except NotImplementedError:
                    raise
                except Exception:
                    continue
                out["doc_id"].append(int(rid))
                out["pages"].append(n_pages)
                for c in cols:
                    out[c].append(info.get(c))
            yield pd.DataFrame(out)

    return docs.select(F.col(id_col), F.col(content_col)).mapInPandas(process, META_SCHEMA)


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


def synth_pdf_docs(spark, n: int = 40) -> DataFrame:
    """Deterministic fixture corpus: n docs, doc i has 1 + i % 4 pages of
    real PDF bytes (sources/pdf_fixture.synth_pdf_bytes), built inside the
    plan via an Arrow-batched UDF — no driver-side byte assembly.

    Odd doc_ids are written /FlateDecode-compressed, even ones raw, so
    every consumer of this corpus (pdf_pages/pdf_fulltext/pdf_process and
    their oracles) exercises BOTH reader paths on every run — compression
    never changes the extracted text, only the bytes."""
    from pyspark.sql.functions import pandas_udf

    from ocr_spark.sources.pdf_fixture import synth_pdf_bytes

    @pandas_udf("binary")
    def gen(ids: pd.Series, pages: pd.Series) -> pd.Series:
        return pd.Series(
            [
                synth_pdf_bytes(int(i), int(p), compress=bool(int(i) % 2))
                for i, p in zip(ids, pages)
            ]
        )

    base = spark.range(n).select(
        F.col("id").alias("doc_id"), (1 + F.col("id") % 4).cast("int").alias("n_pages")
    )
    return base.select("doc_id", gen("doc_id", "n_pages").alias("content"))


RASTER_W = 120
RASTER_LINE_H = 10
RASTER_MARGIN = 2
RASTER_BAND_ROWS = 3
_HASH_MOD = 1_000_000_007


def _line_hash(line: str) -> int:
    """textstats.char_hash twin (base-131 ascii fold, mod 1e9+7)."""
    h = 0
    for ch in line:
        h = (h * 131 + ord(ch)) % _HASH_MOD
    return h


def render_page_array(text: str, width: int = RASTER_W):
    """Deterministic page raster: one dark horizontal band per text line on
    a white page — the same band structure operators/image.synth_image_array
    uses, so the deterministic OCR engine (and the DuckDB oracle) can
    predict every box. Band darkness is a function of the line's char hash,
    making conf values text-dependent and exactly computable in SQL."""
    import numpy as np

    lines = [ln for ln in (text or "").split("\n") if ln.strip() != ""]
    height = 8 + RASTER_LINE_H * max(len(lines), 1)  # 4px top/bottom margins
    img = np.full((height, width), 255, dtype=np.uint8)
    for i, line in enumerate(lines):
        dark = 30 + _line_hash(line) % 50
        y0 = 4 + RASTER_LINE_H * i
        img[y0 : y0 + RASTER_BAND_ROWS, RASTER_MARGIN : width - RASTER_MARGIN] = dark
    return img


def rasterize_pages(pages: DataFrame, width: int = RASTER_W) -> DataFrame:
    """S3: page → image for the OCR fallback branch (pdf_processor.py:259-290,
    dpi=300 via pdf2image/poppler in the reference).

    poppler is a native process boundary this environment lacks, so the
    rasterizer renders the page's extracted TEXT deterministically
    (render_page_array) — the Spark plumbing (schema, mapInPandas batch
    shape, downstream OCR scan contract) is the real thing, and swapping in
    `pdf2image.convert_from_bytes` is a one-function change here."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_b in batches:
            out = {"doc_id": [], "page_number": [], "data": [], "width": [], "height": []}
            for rid, pno, text in zip(
                pdf_b["doc_id"].tolist(), pdf_b["page_number"].tolist(), pdf_b["text"].tolist()
            ):
                img = render_page_array(text, width)
                out["doc_id"].append(int(rid))
                out["page_number"].append(int(pno))
                out["data"].append(img.tobytes())
                out["width"].append(img.shape[1])
                out["height"].append(img.shape[0])
            yield pd.DataFrame(out)

    return pages.mapInPandas(
        process, "doc_id long, page_number int, data binary, width int, height int"
    )


PAGE_PACK = 1_000_000  # max pages representable in a packed (doc, page) key


def pack_image_id(doc_id: Column, page_number: Column) -> Column:
    """Packed image key for the per-page OCR stages: doc_id*PAGE_PACK + page.

    Real PDFs routinely exceed 1,000 pages, so the multiplier is 10^6 —
    and the guard is explicit: a page number outside [0, PAGE_PACK) raises
    instead of silently bleeding into the next doc_id when unpacked. At
    10^12 docs the packed key tops out near 10^18, inside int64."""
    return F.when(
        (page_number >= 0) & (page_number < PAGE_PACK),
        doc_id.cast("long") * PAGE_PACK + page_number,
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"page_number outside packing range [0, {PAGE_PACK}): "),
                page_number.cast("string"),
            )
        ).cast("long")
    )


def unpack_image_id(image_id: Column) -> tuple[Column, Column]:
    """Inverse of :func:`pack_image_id` → (doc_id, page_number) columns.

    The quotient goes through decimal, not double, division: packed keys
    reach ~10^18 at corpus scale and float64 loses integer exactness past
    2^53."""
    page = F.pmod(image_id, F.lit(PAGE_PACK))
    doc = ((image_id - page).cast("decimal(38,0)") / PAGE_PACK).cast("long")
    return doc, page.cast("int")


def rasterize_stub(*_a, **_k):
    """Real-PDF rasterization needs poppler (process boundary); use
    rasterize_pages (text-band renderer) in this environment."""
    raise NotImplementedError(
        "pdf rasterization requires pdf2image/poppler; wire convert_from_bytes "
        "into sources/pdf.rasterize_pages's mapInPandas shape"
    )
