"""Span-sequence equality (the BASELINE.json correctness gate):
(kind, text, media_ref, order) per document must be byte-equal to the
pure-Python golden, including mega-documents crossing salt chunks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_spark.pipeline import extract_documents
from ocr_spark.sources import corpus
from tests import reference_impl as ref


@pytest.fixture(scope="module")
def docs():
    # 120 docs, 2 mega-docs (5k spans) so assembly crosses many salt chunks
    return corpus.generate_docs(120, seed=7, mega_docs=2, mega_spans=5000)


@pytest.fixture(scope="module")
def spark_result(spark, docs, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("corpus"))
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.Table.from_pylist(docs, schema=corpus.SCHEMA), path + "/part-0.parquet"
    )
    df = spark.read.parquet(path)
    # tiny salt chunk so even normal docs span multiple chunks
    out = extract_documents(df, salt_chunk=64)
    return {r["doc_id"]: r for r in out.collect()}


@pytest.fixture(scope="module")
def golden(docs):
    return {d["doc_id"]: ref.extract_document(d) for d in docs}


def test_all_docs_present(spark_result, golden):
    assert set(spark_result) == set(golden)


def test_span_sequence_equality(spark_result, golden):
    for doc_id, want in golden.items():
        got = [
            (s["kind"], s["text"], s["media_ref"], s["order"])
            for s in spark_result[doc_id]["spans"]
        ]
        expect = [
            (s["kind"], s["text"], s["media_ref"], s["order"]) for s in want["spans"]
        ]
        assert got == expect, f"span mismatch in {doc_id}"


def test_extracted_text_and_fields(spark_result, golden):
    for doc_id, want in golden.items():
        assert spark_result[doc_id]["extracted_text"] == want["extracted_text"], doc_id
        assert spark_result[doc_id]["structured_data"] == want["structured_data"], doc_id
        assert spark_result[doc_id]["columns_count"] == want["columns_count"], doc_id


def test_mega_doc_crosses_chunks(spark_result, golden):
    mega = "doc-00000000"
    assert golden[mega]["n_spans"] > 1000
    assert spark_result[mega]["n_spans"] == golden[mega]["n_spans"]


def test_assembly_plan_has_two_aggregates(spark, docs, tmp_path_factory):
    """The salted assembly must be a two-phase aggregation (partial skew
    defusal), visible as two ObjectHashAggregate pairs in the plan."""
    path = str(tmp_path_factory.mktemp("corpus_plan"))
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.Table.from_pylist(docs[:5], schema=corpus.SCHEMA), path + "/p.parquet"
    )
    df = spark.read.parquet(path)
    plan = extract_documents(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") >= 2  # salt shuffle + doc_id shuffle


# --- language runs over interleaved spans -------------------------------------


def test_span_language_runs_segments_and_media_transparent(spark):
    from ocr_spark.operators.spans import span_language_runs

    docs = spark.createDataFrame(
        [
            ("1", [("text", "hello english words", None, 0),
                   ("media", None, "img://1/0", 16),       # transparent
                   ("text", "more english here", None, 32),
                   ("text", "привет русский текст", None, 48),
                   ("text", "ещё русская строка", None, 64),
                   ("text", "back to english", None, 80)]),
            ("2", [("media", None, "img://2/0", 0)]),       # media-only doc
        ],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    out = [r for r in span_language_runs(docs).collect()]
    runs = sorted([r for r in out if r.doc_id == "1"], key=lambda r: r.run_id)
    assert [(r.lang, r.n_spans) for r in runs] == [("en", 2), ("ru", 2), ("en", 1)]
    # the media span did not break the first run
    assert runs[0].text == "hello english words more english here"
    assert runs[0].first_offset == 0 and runs[0].last_offset == 32
    assert runs[1].text == "привет русский текст ещё русская строка"
    # media-only doc yields no runs
    assert not [r for r in out if r.doc_id == "2"]


def test_spans_to_markdown_interleave_and_counts(spark):
    from ocr_spark.operators.spans import spans_to_markdown

    docs = spark.createDataFrame(
        [
            ("1", [("text", "first para", None, 0),
                   ("media", None, "img://1/0", 16),
                   ("text", "second para", None, 32),
                   ("text", "", None, 48)]),          # empty text skipped
            ("2", [("media", None, None, 0)]),         # null ref -> empty parens
            ("3", []),
        ],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    out = {r.doc_id: r for r in spans_to_markdown(docs).collect()}
    assert out["1"].markdown == "first para\n\n![media](img://1/0)\n\nsecond para"
    assert out["1"].n_text == 3 and out["1"].n_media == 1
    assert out["2"].markdown == "![media]()" and out["2"].n_media == 1
    assert out["3"].markdown == "" and out["3"].n_text == 0
