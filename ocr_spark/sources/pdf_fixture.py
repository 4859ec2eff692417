"""Deterministic minimal PDF fixtures — real, spec-valid bytes for the S2/S4
direct-text path (reference pdf_processor.py:168-184, :222-257) without any
native dependency.

``synth_pdf_bytes`` hand-assembles a multi-page PDF 1.4 file: catalog, page
tree, one UNCOMPRESSED content stream per page (``BT … (text) Tj ET``), a
Type1 font object, an Info dictionary, and a byte-accurate xref table — so
strict parsers (pypdf) and the built-in fallback reader both accept it.
Everything is derived from (doc_id, n_pages); the same bytes are produced on
every engine, which is what lets the DuckDB oracle predict the extracted
text without parsing PDFs itself.
"""

from __future__ import annotations


def page_text(doc_id: int, page_number: int) -> str:
    """The canonical fixture text of one page (1-based page numbers)."""
    return f"Page {page_number} of doc {doc_id}"


def doc_title(doc_id: int) -> str:
    return f"Doc {doc_id}"


PDF_AUTHOR = "ocr-spark-synth"
PDF_PRODUCER = "ocr_spark.sources.pdf_fixture"


def synth_pdf_bytes(doc_id: int, n_pages: int, compress: bool = False) -> bytes:
    """A complete n_pages-page PDF with deterministic text and metadata.

    ``compress=True`` writes each content stream /FlateDecode-compressed
    (stdlib zlib level 9 — deterministic bytes on every platform), the way
    virtually every real-world PDF writer does; False keeps the raw
    ``BT … Tj ET`` stream. Both forms carry an exact /Length, so readers
    never have to delimiter-scan binary data."""
    if n_pages < 1:
        raise ValueError("n_pages must be >= 1")
    import zlib
    objects: list[bytes] = []

    # object numbers: 1 catalog, 2 pages, 3 font, 4 info,
    # then per page p (0-based): 5+2p page, 6+2p content
    kids = " ".join(f"{5 + 2 * p} 0 R" for p in range(n_pages))
    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objects.append(f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode())
    objects.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    objects.append(
        (
            f"<< /Title ({doc_title(doc_id)}) /Author ({PDF_AUTHOR}) "
            f"/Producer ({PDF_PRODUCER}) >>"
        ).encode()
    )
    for p in range(n_pages):
        objects.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Contents {6 + 2 * p} 0 R "
                f"/Resources << /Font << /F1 3 0 R >> >> >>"
            ).encode()
        )
        content = f"BT /F1 12 Tf 72 720 Td ({page_text(doc_id, p + 1)}) Tj ET".encode()
        if compress:
            z = zlib.compress(content, 9)
            objects.append(
                b"<< /Length %d /Filter /FlateDecode >>\nstream\n%s\nendstream"
                % (len(z), z)
            )
        else:
            objects.append(
                b"<< /Length %d >>\nstream\n%s\nendstream" % (len(content), content)
            )

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]  # object 0 is the free head
    for i, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_pos = len(out)
    out += f"xref\n0 {len(objects) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objects) + 1} /Root 1 0 R /Info 4 0 R >>\n"
        f"startxref\n{xref_pos}\n%%EOF\n"
    ).encode()
    return bytes(out)
