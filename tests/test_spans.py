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


def test_filter_spans_quality_rules_and_media_runs(spark):
    from ocr_spark.operators.spans import filter_spans_quality

    docs = spark.createDataFrame(
        [
            # kept text / dropped short / blocklist / brace; media-run adjacency
            ("1", [("text", "a good long paragraph here", None, 0),
                   ("media", None, "img://1/0", 16),      # next to kept text -> kept
                   ("text", "too short", None, 32),        # < 3 words -> dropped
                   ("media", None, "img://1/1", 48),       # neighbours: dropped + dropped -> dropped
                   ("text", "all rights reserved footer text", None, 64),  # blocklist
                   ("text", "code {x: 1} fragment inline", None, 80)]),    # braces
            # a media RUN between a dropped and a kept text span -> kept
            ("2", [("text", "ok", None, 0),                # dropped (short)
                   ("media", None, "img://2/0", 16),
                   ("media", None, "img://2/1", 32),
                   ("text", "this paragraph clearly survives the gate", None, 48)]),
            # media-only document: no non-media neighbour ever -> all dropped
            ("3", [("media", None, "img://3/0", 0)]),
        ],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    out = filter_spans_quality(docs)
    rows = sorted(out.collect(), key=lambda r: (r.doc_id, r.ord))
    d1 = [(r.kind, r.text, r.media_ref, r.ord) for r in rows if r.doc_id == "1"]
    assert d1 == [
        ("text", "a good long paragraph here", None, 0),
        ("media", None, "img://1/0", 1),
    ]
    d2 = [(r.kind, r.media_ref, r.ord) for r in rows if r.doc_id == "2"]
    assert d2 == [
        ("media", "img://2/0", 0),
        ("media", "img://2/1", 1),
        ("text", None, 2),
    ]
    assert not [r for r in rows if r.doc_id == "3"]


def test_filter_spans_quality_terminal_punct_opt(spark):
    from ocr_spark.operators.spans import filter_spans_quality

    docs = spark.createDataFrame(
        [("1", [("text", "ends with a period.", None, 0),
                ("text", "no terminal punctuation here", None, 16)])],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    texts = [r.text for r in
             filter_spans_quality(docs, require_terminal_punct=True).collect()]
    assert texts == ["ends with a period."]


# --- coalesce_spans ----------------------------------------------------------


def py_coalesce(spans, joiner="\n"):
    """Golden: canonical sort, drop blank text, merge adjacent text runs."""
    ordered = sorted(
        spans, key=lambda s: (s["offset"], s["kind"], s["text"], s["media_ref"])
    )
    kept = [s for s in ordered if s["kind"] == "media" or s["text"].strip() != ""]
    out = []
    for s in kept:
        if s["kind"] == "text" and out and out[-1]["kind"] == "text":
            out[-1] = {**out[-1], "text": out[-1]["text"] + joiner + s["text"]}
        else:
            out.append({k: s[k] for k in ("kind", "text", "media_ref")})
    return [
        (s["kind"], s["text"], s["media_ref"], i) for i, s in enumerate(out)
    ]


def _span(kind, text, ref, off):
    return {"kind": kind, "text": text, "media_ref": ref, "offset": off}


_COALESCE_DOCS = [
    # fragmented text around media, blanks interleaved
    (
        1,
        [
            _span("text", "a", "", 0),
            _span("text", "  ", "", 16),
            _span("text", "b", "", 32),
            _span("media", "", "ref-1", 48),
            _span("text", "", "", 64),
            _span("text", "c", "", 80),
            _span("text", "d", "", 96),
        ],
    ),
    # all spans blank -> empty sequence
    (2, [_span("text", " ", "", 0), _span("text", "", "", 16)]),
    # media-only, refs preserved verbatim, including adjacent media
    (3, [_span("media", "", "r1", 0), _span("media", "", "r2", 16)]),
    # out-of-order offsets + duplicate offset tie (media before text)
    (
        4,
        [
            _span("text", "z", "", 32),
            _span("media", "", "m", 16),
            _span("text", "y", "", 16),
            _span("text", "x", "", 0),
        ],
    ),
    (5, []),
]


def _coalesce_df(spark):
    return spark.createDataFrame(
        _COALESCE_DOCS,
        "doc_id long, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )


def _rows(df):
    return {
        r.doc_id: [(s["kind"], s["text"], s["media_ref"], s["order"]) for s in r.spans]
        for r in df.collect()
    }


def test_coalesce_spans_matches_golden(spark):
    from ocr_spark.operators.spans import coalesce_spans

    got = _rows(coalesce_spans(_coalesce_df(spark)))
    for doc_id, spans in _COALESCE_DOCS:
        assert got[doc_id] == py_coalesce(spans), doc_id


def test_coalesce_spans_big_path_equals_small_path(spark):
    from ocr_spark.operators.spans import coalesce_spans

    df = _coalesce_df(spark)
    small = _rows(coalesce_spans(df))  # all docs under threshold
    big = _rows(coalesce_spans(df, big_doc_spans=0))  # force windowed path
    assert small == big


def test_coalesce_spans_custom_joiner(spark):
    from ocr_spark.operators.spans import coalesce_spans

    df = spark.createDataFrame(
        [(9, [_span("text", "a", "", 0), _span("text", "b", "", 16)])],
        "doc_id long, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    got = _rows(coalesce_spans(df, joiner=" "))
    assert got[9] == [("text", "a b", "", 0)]


# --- truncate_spans ----------------------------------------------------------


def test_truncate_spans_budget_and_accounting(spark):
    from ocr_spark.operators.spans import truncate_spans

    span_t = "doc_id long, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
    docs = spark.createDataFrame(
        [
            # costs: 3 ("one two three"), 256 (media), 2, 2 -> cum 3,259,261,263
            (
                1,
                [
                    ("text", "one two three", "", 0),
                    ("media", "", "ref-m", 16),
                    ("text", "four five", "", 32),
                    ("text", "six seven", "", 48),
                ],
            ),
            # first media span fits exactly once; the second overflows
            (2, [("media", "", "big", 0), ("media", "", "big2", 16)]),
            # punctuation tokens: "a, b" = 3
            (3, [("text", "a, b", "", 0)]),
            (4, []),
        ],
        span_t,
    )
    got = {}
    for r in truncate_spans(docs, max_tokens=261, media_tokens=256).collect():
        got.setdefault(r.doc_id, []).append(
            (r.kind, r.text, r.media_ref, r.ord, r.span_tokens)
        )
    assert got[1] == [
        ("text", "one two three", "", 0, 3),
        ("media", "", "ref-m", 1, 256),
        ("text", "four five", "", 2, 2),
    ]  # cum 263 > 261 drops the last span only
    assert got[2] == [("media", "", "big", 0, 256)]
    assert 4 not in got
    assert got[3] == [("text", "a, b", "", 0, 3)]


def test_truncate_spans_orders_by_offset_before_cutting(spark):
    from ocr_spark.operators.spans import truncate_spans

    span_t = "doc_id long, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
    docs = spark.createDataFrame(
        [
            (7, [("text", "tail words beyond", "", 32), ("text", "head", "", 0)]),
            # the FIRST span already exceeds the budget -> no rows at all
            (8, [("text", "two words", "", 0), ("text", "x", "", 16)]),
        ],
        span_t,
    )
    rows = truncate_spans(docs, max_tokens=1).collect()
    got = [(r.text, r.ord) for r in rows]
    assert got == [("head", 0)]  # the offset-0 span wins the budget
    assert not [r for r in rows if r.doc_id == 8]


def test_span_kind_transitions_counts_and_milli(spark):
    from ocr_spark.operators.spans import span_kind_transitions

    span_t = "doc_id long, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
    docs = spark.createDataFrame(
        [
            # doc 1: text media text  -> BOS>t, t>m, m>t, t>EOS
            (
                1,
                [
                    ("text", "a", "", 0),
                    ("media", "", "r1", 16),
                    ("text", "b", "", 32),
                ],
            ),
            # doc 2 (offsets shuffled on purpose): text text -> BOS>t, t>t, t>EOS
            (2, [("text", "d", "", 16), ("text", "c", "", 0)]),
            (3, []),  # contributes nothing
        ],
        span_t,
    )
    got = {
        (r.src_kind, r.dst_kind): (r.n, r.p_milli)
        for r in span_kind_transitions(docs).collect()
    }
    assert got == {
        ("BOS", "text"): (2, 1000),
        ("text", "media"): (1, 250),  # 4 outgoing from text
        ("media", "text"): (1, 1000),
        ("text", "text"): (1, 250),
        ("text", "EOS"): (2, 500),
    }


def test_filter_interleaved_docs_features_and_gate(spark):
    from ocr_spark.operators.spans import filter_interleaved_docs

    span_t = "doc_id long, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
    five_words = "w1 w2 w3 w4 w5"
    docs = spark.createDataFrame(
        [
            # keeper: 1 media among 3 spans, 10 words, run 1
            (
                1,
                [
                    ("text", five_words, "", 0),
                    ("media", "", "r", 16),
                    ("text", five_words, "", 32),
                ],
            ),
            # no media -> rejected
            (2, [("text", five_words, "", 0), ("text", five_words, "", 16)]),
            # media run of 5 (> 4) -> rejected; also media-majority
            (
                3,
                [("media", "", f"r{i}", i * 16) for i in range(5)]
                + [("text", five_words + " " + five_words, "", 80)],
            ),
            # too few words -> rejected
            (4, [("text", "w1 w2", "", 0), ("media", "", "r", 16)]),
            (5, []),  # excluded entirely
        ],
        span_t,
    )
    rows = {r.doc_id: r for r in filter_interleaved_docs(docs).collect()}
    assert set(rows) == {1, 2, 3, 4}
    r1 = rows[1]
    assert (r1.n_spans, r1.n_text, r1.n_media, r1.words, r1.max_media_run) == (
        3,
        2,
        1,
        10,
        1,
    )
    assert r1.keep is True
    assert rows[2].keep is False and rows[2].n_media == 0
    assert rows[3].keep is False and rows[3].max_media_run == 5
    assert rows[4].keep is False and rows[4].words == 2


def test_filter_interleaved_media_run_orders_by_offset(spark):
    """Run detection must follow offset order, not array order."""
    from ocr_spark.operators.spans import filter_interleaved_docs

    span_t = "doc_id long, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
    # array order interleaves; offset order groups media at the front
    docs = spark.createDataFrame(
        [
            (
                1,
                [
                    ("media", "", "a", 0),
                    ("text", "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10", "", 48),
                    ("media", "", "b", 16),
                    ("media", "", "c", 32),
                ],
            )
        ],
        span_t,
    )
    r = filter_interleaved_docs(docs).collect()[0]
    assert r.max_media_run == 3
    assert r.keep is False  # media-majority (3*2 > 4)


def test_interleave_keep_expr_equals_filter_verdict(spark):
    """The per-row gating expression must agree with the auditable
    DataFrame form on every document, including empty span arrays
    (expr: False; DataFrame form: excluded)."""
    from ocr_spark.operators.spans import filter_interleaved_docs, interleave_keep_expr

    span_t = "doc_id long, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
    five = "w1 w2 w3 w4 w5"
    docs = spark.createDataFrame(
        [
            (1, [("text", five, "", 0), ("media", "", "r", 16), ("text", five, "", 32)]),
            (2, [("text", five, "", 0)]),
            (3, [("media", "", f"r{i}", i * 16) for i in range(6)] + [("text", five + " " + five, "", 96)]),
            (4, []),
        ],
        span_t,
    )
    via_df = {
        r.doc_id: r.keep for r in filter_interleaved_docs(docs).collect()
    }
    via_expr = {
        r.doc_id: r.k
        for r in docs.select("doc_id", interleave_keep_expr().alias("k")).collect()
    }
    assert via_expr == {1: True, 2: False, 3: False, 4: False}
    for doc_id, k in via_df.items():
        assert via_expr[doc_id] == k


def test_extract_job_interleave_gate(spark, tmp_path, monkeypatch):
    """--interleave-gate drops gate-failing documents before extraction;
    without it they extract normally."""
    import sys

    from jobs import extract_job

    span_t = "doc_id long, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
    ten = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    docs = spark.createDataFrame(
        [
            (1, [("text", ten, "", 0), ("media", "", "r", 16), ("text", ten, "", 32)]),
            (2, [("text", ten, "", 0), ("text", ten, "", 16)]),  # no media
        ],
        span_t,
    )
    src = str(tmp_path / "src")
    docs.write.parquet(src)

    def run(out, *extra):
        argv = ["extract_job.py", "--input", src, "--output", out, "--buckets", "2", *extra]
        monkeypatch.setattr(sys, "argv", argv)
        extract_job.main()
        return {r.doc_id for r in spark.read.parquet(out + "/bucket=*").select("doc_id").collect()}

    assert run(str(tmp_path / "gated"), "--interleave-gate") == {1}
    assert run(str(tmp_path / "plain")) == {1, 2}
