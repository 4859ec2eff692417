"""Deterministic synthetic interleaved text+media document corpus.

Shape is exactly ``BASELINE.json.input_hint``:

    documents(doc_id: string,
              spans: array<struct<kind:string, text:string,
                                  media_ref:string, offset:int>>)

- ``kind`` ∈ {'text', 'media'}; media spans carry ``media_ref`` stubs
  (``img://{doc_id}/{n}``) and null text; text spans carry null media_ref.
- ``offset`` is strictly increasing with irregular gaps — the authoritative
  span order (FIXTURES.md §1).
- Long-tail size distribution: most docs have O(10) spans, a configurable
  set of mega-documents has O(10^4–10^5) spans to exercise salted assembly.
- Content mixes ru/en contract lines (the reference's own fixture text,
  test_columns.py:24-47), field-bearing lines (demo.py:69-85 style),
  plain prose, and boilerplate-like nav/footer/link spans for the
  main-content-extraction stage.

Seeded numpy → pyarrow parquet; no Spark needed, no external data.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SPAN_TYPE = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)
SCHEMA = pa.schema([("doc_id", pa.string()), ("spans", pa.list_(SPAN_TYPE))])

# content pools -------------------------------------------------------------
CONTENT_LINES = [
    "ДОГОВОР № IC-45-2022 на оказание услуг",
    "AGREEMENT № IC-45-2022 for provision of services",
    "г. Алматы, регистрационный номер 540725",
    "Almaty city, registration number 540725",
    "1. ПРЕДМЕТ ДОГОВОРА изложен ниже",
    "1. SUBJECT OF THE AGREEMENT is set out below",
    "ИСПОЛНИТЕЛЬ обязуется оказать услуги в полном объеме",
    "The CONTRACTOR shall provide the services in full",
    "ЗАКАЗЧИК принимает и оплачивает услуги",
    "The CUSTOMER accepts and pays for the services",
    "2. УСЛОВИЯ оплаты и порядок расчетов",
    "2. TERMS of payment and settlement procedure",
    "Настоящий договор вступает в силу с момента подписания",
    "This agreement enters into force upon signature",
    "Стороны несут ответственность согласно законодательству",
    "The parties are liable in accordance with the law",
    "ФИО: Иванов Иван Иванович, Дата рождения: 01.01.1990",
    "Заказчик: Петров Петр Петрович, Сумма: 100000 руб",
    "Имя: Сидоров Сидор, Телефон: +7(999)123-45-67",
    "Email: sidor@example.com, Дата: 15.03.2023",
    "Паспорт: 1234 567890, ИНН: 1234567890",
    "Адрес: г. Москва, ул. Ленина, д. 1",
    "Общая стоимость работ составляет 1500,75 руб",
    "The total cost of work amounts to 1500.75",
    "Документ подготовлен в двух экземплярах",
    "The document is prepared in two copies",
]
BOILERPLATE_LINES = [
    '<a href="/home">Home</a> | <a href="/about">About</a> | <a href="/contact">Contact</a>',
    "© 2022 Example Corp. All rights reserved",
    "Cookie settings and privacy preferences",
    "Privacy policy applies to this document portal",
    "Terms of use | Sitemap | <a href=\"/help\">Help</a>",
    'Read more: <a href="/doc/123">full text</a>',
    "Navigation menu",
    "Skip to content",
    'Share <a href="/s/fb">Fb</a> <a href="/s/tw">Tw</a> <a href="/s/vk">VK</a>',
    "Home | Docs | FAQ",
]


def make_spans(rng: np.random.RandomState, doc_id: str, n_spans: int) -> list[dict]:
    """Build one document's interleaved span list (deterministic)."""
    spans = []
    offset = 0
    media_n = 0
    for _ in range(n_spans):
        offset += int(rng.randint(1, 10))
        roll = rng.rand()
        if roll < 0.12:
            spans.append(
                {"kind": "media", "text": None,
                 "media_ref": f"img://{doc_id}/{media_n}", "offset": offset}
            )
            media_n += 1
        elif roll < 0.40:
            spans.append(
                {"kind": "text",
                 "text": BOILERPLATE_LINES[rng.randint(0, len(BOILERPLATE_LINES))],
                 "media_ref": None, "offset": offset}
            )
        else:
            spans.append(
                {"kind": "text",
                 "text": CONTENT_LINES[rng.randint(0, len(CONTENT_LINES))],
                 "media_ref": None, "offset": offset}
            )
    return spans


def generate_docs(
    n_docs: int,
    seed: int = 42,
    mega_docs: int = 0,
    mega_spans: int = 20_000,
) -> list[dict]:
    """Deterministic document list; the first ``mega_docs`` docs are
    mega-documents (skew drivers for the salted assembly)."""
    rng = np.random.RandomState(seed)
    docs = []
    for i in range(n_docs):
        doc_id = f"doc-{i:08d}"
        if i < mega_docs:
            n_spans = mega_spans
        else:
            # long-tail: lognormal around ~15 spans, capped
            n_spans = int(min(np.exp(rng.normal(2.7, 0.8)), 500)) + 1
        docs.append({"doc_id": doc_id, "spans": make_spans(rng, doc_id, n_spans)})
    return docs


def write_corpus(
    path: str,
    n_docs: int,
    seed: int = 42,
    mega_docs: int = 0,
    mega_spans: int = 20_000,
    rows_per_file: int = 50_000,
) -> str:
    """Write the corpus as (possibly multi-file) parquet directory."""
    os.makedirs(path, exist_ok=True)
    docs = generate_docs(n_docs, seed=seed, mega_docs=mega_docs, mega_spans=mega_spans)
    for start in range(0, len(docs), rows_per_file):
        chunk = docs[start : start + rows_per_file]
        table = pa.Table.from_pylist(chunk, schema=SCHEMA)
        pq.write_table(table, os.path.join(path, f"part-{start:08d}.parquet"))
    return path
