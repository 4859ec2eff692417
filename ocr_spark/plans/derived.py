"""Deterministic derived tables for the driver's correctness gate.

The driver compares each ``__spark_entry__.queries()[name]`` (PySpark) against
``oracle_sql()[name]`` (DuckDB) on the same parquet tables. The testdata
``documents`` table is flat text, while the engine's canonical input is the
``input_hint`` span shape — so every query derives its input *deterministically
and engine-neutrally* from the shared tables: each derived table below exists
twice, as a Spark builder and as a DuckDB CTE string, built from the exact same
integer/string arithmetic (no RNG, no time, no engine-private hashing).

Spark/DuckDB parity rules used throughout (verified by tools/driver_sim.py):
- md5 hex prefix → int: Spark ``conv(substr(md5(x),1,k),16,10)`` ==
  DuckDB ``('0x'||substr(md5(x),1,k))::BIGINT``;
- integer `%`, `//`, string concat of BIGINT casts agree;
- float math is division/sqrt-only on identical operands → bit-identical;
  sums that must be order-independent use exact binary fractions (k/64) or
  integer micro-units.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ocr_spark.functions.text import py_strip

# ---------------------------------------------------------------------------
# loading the driver's parquet tables
# ---------------------------------------------------------------------------

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Read a driver table, spread across the cluster.

    The testdata tables are single small parquet files (one row group), so
    Spark scans them as ONE partition and every downstream per-row stage
    runs on one core. An explicit repartition (AQE does not coalesce
    user-specified numbers) restores the parallelism a real many-file
    100 TB table would have natively; the shuffled volume is tiny here.
    """
    df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    return df.repartition(spark.sparkContext.defaultParallelism)


# ---------------------------------------------------------------------------
# 1. metric pairs: (doc_id, extracted, ground_truth)
# ---------------------------------------------------------------------------
# doc_id%10==0 → identical; %10==1 → empty extracted; else three literal
# word-level corruptions (sequential replace, same order in both engines).


def pairs(docs: DataFrame) -> DataFrame:
    t = F.col("text")
    corrupted = F.replace(
        F.replace(F.replace(t, F.lit("table"), F.lit("tabel")), F.lit("value"), F.lit("vaIue")),
        F.lit("scan"),
        F.lit("sca n"),
    )
    extracted = (
        F.when(F.col("doc_id") % 10 == 0, t)
        .when(F.col("doc_id") % 10 == 1, F.lit(""))
        .otherwise(corrupted)
    )
    return docs.select("doc_id", extracted.alias("extracted"), t.alias("ground_truth"))


SQL_PAIRS = """
pairs AS (
  SELECT doc_id,
         CASE WHEN doc_id % 10 = 0 THEN text
              WHEN doc_id % 10 = 1 THEN ''
              ELSE replace(replace(replace(text, 'table', 'tabel'),
                                   'value', 'vaIue'),
                           'scan', 'sca n')
         END AS extracted,
         text AS ground_truth
  FROM documents
)"""


# ---------------------------------------------------------------------------
# 2. span corpus: input_hint shape (doc_id, spans array<struct<kind,text,media_ref,offset>>)
# ---------------------------------------------------------------------------
# Lines of 8 words; every (doc_id+i)%5==2 line is a media span; every
# (doc_id+i)%7==3 text line gets a 'copyright ' prefix (boilerplate marker);
# offset = i*16.

SPAN_WORDS_PER_LINE = 8
SPAN_OFFSET_STRIDE = 16


def span_corpus(docs: DataFrame) -> DataFrame:
    """The canonical interleaved text+media corpus, derived from `documents`.

    The word array materializes as a column before the per-line transform
    reads it: Catalyst does not CSE through lambdas, so an inline `w`
    would re-run the split once per line — O(n²)/doc on mega-documents
    (tools/megadoc_fold_bench.py's class)."""
    d0 = docs.select(
        "doc_id", F.split(py_strip(F.col("text")), r"\s+").alias("_sw")
    )
    w = F.col("_sw")
    n_lines = ((F.size(w) + 7) / 8).cast("int")
    idx = F.when(n_lines > 0, F.sequence(F.lit(0), n_lines - 1)).otherwise(
        F.array().cast("array<int>")
    )

    def mk_span(i: Column) -> Column:
        wtxt = F.array_join(F.slice(w, i * 8 + 1, 8), " ")
        is_media = (F.col("doc_id") + i) % 5 == 2
        is_marker = (F.col("doc_id") + i) % 7 == 3
        kind = F.when(is_media, F.lit("media")).otherwise(F.lit("text"))
        stext = F.when(is_media, F.lit("")).otherwise(
            F.when(is_marker, F.concat(F.lit("copyright "), wtxt)).otherwise(wtxt)
        )
        ref = F.when(
            is_media,
            F.concat(F.lit("ref-"), F.col("doc_id").cast("string"), F.lit("-"), i.cast("string")),
        ).otherwise(F.lit(""))
        return F.struct(
            kind.alias("kind"),
            stext.alias("text"),
            ref.alias("media_ref"),
            (i * SPAN_OFFSET_STRIDE).cast("int").alias("offset"),
        )

    return d0.select("doc_id", F.transform(idx, mk_span).alias("spans"))


SQL_SPAN_CORPUS = """
span_w AS (
  SELECT doc_id, regexp_split_to_array(regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+') AS ws
  FROM documents
),
span_rows AS (
  SELECT doc_id, i,
         CASE WHEN (doc_id + i) % 5 = 2 THEN 'media' ELSE 'text' END AS kind,
         CASE WHEN (doc_id + i) % 5 = 2 THEN ''
              WHEN (doc_id + i) % 7 = 3 THEN 'copyright ' || array_to_string(ws[i*8+1 : i*8+8], ' ')
              ELSE array_to_string(ws[i*8+1 : i*8+8], ' ')
         END AS text,
         CASE WHEN (doc_id + i) % 5 = 2 THEN 'ref-' || doc_id::VARCHAR || '-' || i::VARCHAR
              ELSE '' END AS media_ref,
         (i * 16)::INT AS "offset"
  FROM span_w, UNNEST(range(((len(ws) + 7) // 8)::BIGINT)) AS t(i)
)"""


# ---------------------------------------------------------------------------
# 3. field docs: structured ru/en documents for T6–T13
# ---------------------------------------------------------------------------
# Lines are dropped per doc_id residues so extraction exercises the
# absent-field path too. All digits derive from doc_id.


def _fd_lpad(c: Column, n: int) -> Column:
    return F.lpad(c.cast("string"), n, "0")


def field_docs(docs: DataFrame) -> DataFrame:
    d = F.col("doc_id")
    lines = [
        F.lit("Имя: Иван Петров"),
        F.concat(
            F.lit("Дата: "),
            (d % 28 + 1).cast("string"),
            F.lit("."),
            (d % 12 + 1).cast("string"),
            F.lit(".20"),
            _fd_lpad(d % 100, 2),
        ),
        F.when(
            d % 4 != 1,
            F.concat(F.lit("Телефон: +7 (905) 12"), (d % 10).cast("string"), F.lit("-45-67")),
        ),
        F.when(
            d % 5 != 2,
            F.concat(F.lit("Email: User"), d.cast("string"), F.lit("@Example.COM")),
        ),
        F.concat(F.lit("Адрес: г. Москва, ул. Ленина, д. "), (d % 99 + 1).cast("string")),
        F.when(
            d % 3 != 1,
            F.concat(F.lit("Паспорт: 45"), _fd_lpad(d % 100, 2), F.lit(" 12345"), (d % 10).cast("string")),
        ),
        F.concat(F.lit("ИНН: 77123456"), _fd_lpad(d % 10000, 4)),
        F.concat(F.lit("Сумма: 1234"), (d % 10).cast("string"), F.lit(",5"), (d % 10).cast("string"), F.lit(" руб.")),
    ]
    return docs.select("doc_id", F.concat_ws("\n", *lines).alias("ftext"))


SQL_FIELD_DOCS = """
field_docs AS (
  SELECT doc_id,
         concat_ws(chr(10),
           'Имя: Иван Петров',
           'Дата: ' || (doc_id % 28 + 1)::VARCHAR || '.' || (doc_id % 12 + 1)::VARCHAR
                    || '.20' || lpad((doc_id % 100)::VARCHAR, 2, '0'),
           CASE WHEN doc_id % 4 != 1
                THEN 'Телефон: +7 (905) 12' || (doc_id % 10)::VARCHAR || '-45-67' END,
           CASE WHEN doc_id % 5 != 2
                THEN 'Email: User' || doc_id::VARCHAR || '@Example.COM' END,
           'Адрес: г. Москва, ул. Ленина, д. ' || (doc_id % 99 + 1)::VARCHAR,
           CASE WHEN doc_id % 3 != 1
                THEN 'Паспорт: 45' || lpad((doc_id % 100)::VARCHAR, 2, '0')
                     || ' 12345' || (doc_id % 10)::VARCHAR END,
           'ИНН: 77123456' || lpad((doc_id % 10000)::VARCHAR, 4, '0'),
           'Сумма: 1234' || (doc_id % 10)::VARCHAR || ',5' || (doc_id % 10)::VARCHAR || ' руб.'
         ) AS ftext
  FROM documents
)"""


# ---------------------------------------------------------------------------
# 4. dedup docs: injected exact-dup groups and near-dup families
# ---------------------------------------------------------------------------

_NEAR_BASE = (
    "shared base text alpha beta gamma delta epsilon zeta eta theta iota kappa "
    "lambda mu nu xi omicron pi rho sigma tau upsilon"
)


def dedup_docs(docs: DataFrame) -> DataFrame:
    d = F.col("doc_id")
    text = (
        F.when(d % 7 == 0, F.concat(F.lit("dup text block number "), (d % 3).cast("string")))
        .when(
            d % 11 == 0,
            F.concat(
                F.lit(_NEAR_BASE),
                F.when(d % 2 == 0, F.lit(" one extra tail")).otherwise(F.lit(" two other tail")),
            ),
        )
        .otherwise(F.col("text"))
    )
    return docs.select("doc_id", text.alias("text"))


SQL_DEDUP_DOCS = f"""
dedup_docs AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN 'dup text block number ' || (doc_id % 3)::VARCHAR
              WHEN doc_id % 11 = 0 THEN '{_NEAR_BASE}' ||
                   CASE WHEN doc_id % 2 = 0 THEN ' one extra tail' ELSE ' two other tail' END
              ELSE text END AS text
  FROM documents
)"""


# ---------------------------------------------------------------------------
# 5. layout docs: bilingual side-by-side / alternating / plain texts
# ---------------------------------------------------------------------------
# doc_id%3==0 → 12 alternating ru/en keyword lines (W8 side-by-side fires);
# doc_id%3==1 → 6 alternating plain ru/en lines (W5/W6 language split fires);
# doc_id%3==2 → plain single-language text (no columns).

_SBS_RU = ["ДОГОВОР на оказание услуг", "ИСПОЛНИТЕЛЬ выполняет работы",
           "ЗАКАЗЧИК оплачивает услуги", "СТОРОНА несет ответственность",
           "УСЛОВИЯ оплаты и сроки", "УСЛУГИ оказываются качественно"]
_SBS_EN = ["AGREEMENT for services", "CONTRACTOR performs the works",
           "CUSTOMER pays for services", "PARTY bears responsibility",
           "TERMS of payment and deadlines", "SERVICES are rendered properly"]
_ALT_RU = ["привет мир строка", "русский текст тут", "ещё одна строка"]
_ALT_EN = ["hello world line", "english text here", "one more line"]


def layout_docs(docs: DataFrame) -> DataFrame:
    d = F.col("doc_id")
    sbs_lines = []
    for ru, en in zip(_SBS_RU, _SBS_EN):
        sbs_lines.extend([F.lit(ru), F.lit(en)])
    alt_lines = []
    for ru, en in zip(_ALT_RU, _ALT_EN):
        alt_lines.extend([F.lit(ru), F.lit(en)])
    ltext = (
        F.when(d % 3 == 0, F.concat_ws("\n", *sbs_lines))
        .when(d % 3 == 1, F.concat_ws("\n", *alt_lines))
        .otherwise(F.col("text"))
    )
    return docs.select("doc_id", ltext.alias("ltext"))


def _sql_lines(lines: list[str]) -> str:
    return " || chr(10) || ".join("'" + ln + "'" for ln in lines)


_SBS_ALL = [x for pair in zip(_SBS_RU, _SBS_EN) for x in pair]
_ALT_ALL = [x for pair in zip(_ALT_RU, _ALT_EN) for x in pair]

SQL_LAYOUT_DOCS = f"""
layout_docs AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN {_sql_lines(_SBS_ALL)}
              WHEN doc_id % 3 = 1 THEN {_sql_lines(_ALT_ALL)}
              ELSE text END AS ltext
  FROM documents
)"""


# ---------------------------------------------------------------------------
# 6. OCR boxes: geometry-path input (doc_id, boxes array<struct<cx,cy,text,conf>>)
# ---------------------------------------------------------------------------
# Even doc_ids are two-column (bimodal cx), odd are single-cluster; conf uses
# exact binary fractions (k/64) so float sums are order-independent; every
# third box is Cyrillic so the language-split path also exercises.

BOX_IMAGE_WIDTH = 1000.0


def boxes(docs: DataFrame) -> DataFrame:
    d = F.col("doc_id")
    n_b = (d % 5 + 6).cast("int")
    idx = F.sequence(F.lit(0), n_b - 1)

    def mk_box(i: Column) -> Column:
        two_col = d % 2 == 0
        cx = F.when(
            two_col,
            F.when(i % 2 == 0, (100 + i * 3).cast("double")).otherwise((700 + i * 3).cast("double")),
        ).otherwise((50 + (i * 37) % 400).cast("double"))
        cy = ((i * 13) % 200).cast("double")
        conf = (F.lit(16.0) + ((i * 7) % 10).cast("double") * 4) / 64.0
        btext = F.when(
            i % 3 == 0, F.concat(F.lit("строка "), i.cast("string"))
        ).otherwise(F.concat(F.lit("line "), i.cast("string")))
        return F.struct(cx.alias("cx"), cy.alias("cy"), btext.alias("text"), conf.alias("conf"))

    return docs.select("doc_id", F.transform(idx, mk_box).alias("boxes"))


SQL_BOXES_ROWS = """
box_rows AS (
  SELECT doc_id, i,
         CASE WHEN doc_id % 2 = 0
              THEN CASE WHEN i % 2 = 0 THEN (100 + i*3)::DOUBLE ELSE (700 + i*3)::DOUBLE END
              ELSE (50 + (i*37) % 400)::DOUBLE END AS cx,
         ((i*13) % 200)::DOUBLE AS cy,
         CASE WHEN i % 3 = 0 THEN 'строка ' || i::VARCHAR ELSE 'line ' || i::VARCHAR END AS text,
         (16.0 + ((i*7) % 10)::DOUBLE * 4) / 64.0 AS conf
  FROM documents, UNNEST(range((doc_id % 5 + 6)::BIGINT)) AS t(i)
)"""


# ---------------------------------------------------------------------------
# 7. OCR-corrupted text for T3 correction parity
# ---------------------------------------------------------------------------


def ocr_corrupt_docs(docs: DataFrame) -> DataFrame:
    d = F.col("doc_id")
    ctext = F.concat(
        F.lit("AoroBop c OOO TecT: "),
        F.when(d % 2 == 0, F.lit("Cropon oMnaния")).otherwise(F.lit("peructp 6aHK")),
        F.lit(" N9 "),
        (d % 100).cast("string"),
    )
    return docs.select("doc_id", ctext.alias("ctext"))


SQL_OCR_CORRUPT_DOCS = """
ocr_docs AS (
  SELECT doc_id,
         'AoroBop c OOO TecT: ' ||
         CASE WHEN doc_id % 2 = 0 THEN 'Cropon oMnaния' ELSE 'peructp 6aHK' END ||
         ' N9 ' || (doc_id % 100)::VARCHAR AS ctext
  FROM documents
)"""


# ---------------------------------------------------------------------------
# 8. host docs: multi-line pages with per-host template lines
# ---------------------------------------------------------------------------
# Every page of a host carries its nav header and copyright footer; a
# cookie banner appears on ~2/3 of pages (above the 0.5 template
# threshold), a promo line on ~1/7 (below it — must survive); the body is
# the first two 8-word chunks of the document's own text (never repeats
# across pages). Exercises both sides of the frequency threshold.


def host_docs(docs: DataFrame) -> DataFrame:
    d = F.col("doc_id")
    w = F.split(py_strip(F.col("text")), r"\s+")
    lines = F.array(
        F.concat(F.lit("home | about | "), F.col("source")),
        F.when(d % 3 != 1, F.lit("This site uses cookies to improve your experience")),
        F.array_join(F.slice(w, 1, 8), " "),
        F.array_join(F.slice(w, 9, 8), " "),
        F.when(d % 7 == 0, F.concat(F.lit("promo of the week at "), F.col("source"))),
        F.concat(F.lit("copyright 2022 "), F.col("source")),
    )
    htext = F.concat_ws(
        "\n", F.filter(lines, lambda x: x.isNotNull() & (F.trim(x) != ""))
    )
    return docs.select("doc_id", "source", htext.alias("htext"))


SQL_HOST_DOCS = """
host_w AS (
  SELECT doc_id, source,
         regexp_split_to_array(regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+') AS ws
  FROM documents
),
host_docs AS (
  SELECT doc_id, source,
         array_to_string(list_filter([
           'home | about | ' || source,
           CASE WHEN doc_id % 3 != 1 THEN 'This site uses cookies to improve your experience' END,
           array_to_string(ws[1:8], ' '),
           array_to_string(ws[9:16], ' '),
           CASE WHEN doc_id % 7 = 0 THEN 'promo of the week at ' || source END,
           'copyright 2022 ' || source
         ], x -> x IS NOT NULL AND trim(x) != ''), chr(10)) AS htext
  FROM host_w
)"""
