"""WARC source: record framing, gzip members, quarantine, corpus view."""

import zlib

import pytest
from pyspark.sql import functions as F

import ocr_spark.sources.warc as W


def _parsed(spark, n_docs=24, n_files=4):
    return W.parse_warc_records(W.synth_warc_files(spark, n_docs, n_files))


def test_roundtrip_plain_and_gzip(spark):
    parsed = _parsed(spark).cache()
    try:
        assert parsed.filter(F.col("error").isNotNull()).count() == 0
        resp = W.responses(parsed)
        rows = {r["target_uri"]: r for r in resp.collect()}
        assert len(rows) == 24  # every doc exactly once, across both codecs
        for i in (0, 1, 3, 22):  # even file=plain, odd file=gz, 404 doc, tail
            r = rows[W.warc_uri(i)]
            assert r["html"] == W.warc_html(i)
            assert r["http_status"] == (404 if W.is_not_found(i) else 200)
            assert r["http_content_type"] == "text/html; charset=utf-8"
            assert r["warc_date"] == W.warc_date(i)
    finally:
        parsed.unpersist()


def test_non_response_records_skipped_but_parsed(spark):
    parsed = _parsed(spark).cache()
    try:
        by_type = {
            r["warc_type"]: r["n"]
            for r in parsed.groupBy("warc_type").agg(F.count("*").alias("n")).collect()
        }
        assert by_type["warcinfo"] == 4  # one per file
        assert by_type["response"] == 24
        assert by_type["request"] == 6  # docs 0,4,8,12,16,20
        assert W.responses(parsed).count() == 24
    finally:
        parsed.unpersist()


def test_gunzip_members_concatenated():
    members = [b"alpha", b"beta", b"gamma"]
    blob = b"".join(zlib.compress(m, 6, wbits=31) for m in members)
    assert W.gunzip_members(blob) == b"alphabetagamma"


def test_truncated_record_quarantined_not_fatal():
    good = W.synth_warc_file(0, [2, 8], compress=False)
    # cut into the middle of the LAST record's body: earlier records must
    # still parse, the tail must become exactly one error row
    rows_full = list(W.parse_warc_bytes("f", good))
    cut = W.parse_warc_bytes("f", good[: len(good) - 40])
    rows = list(cut)
    errs = [r for r in rows if r.get("error")]
    assert len(errs) == 1 and "content-length" in errs[0]["error"]
    assert len(rows) == len(rows_full)  # same framing, tail quarantined


def test_corrupt_gzip_quarantined():
    rows = list(W.parse_warc_bytes("f", b"\x1f\x8b broken not gzip"))
    assert len(rows) == 1 and rows[0]["error"].startswith("gzip:")


def test_bad_version_line_resync():
    a, b = W.synth_warc_file(0, [2], False), W.synth_warc_file(0, [8], False)
    blob = a + b"JUNK-not-a-record\r\n\r\n" + b
    rows = list(W.parse_warc_bytes("f", blob))
    errs = [r for r in rows if r.get("error")]
    # junk quarantined, records on BOTH sides of it parsed
    assert len(errs) == 1
    uris = {r.get("target_uri") for r in rows if r.get("warc_type") == "response"}
    assert uris == {W.warc_uri(2), W.warc_uri(8)}


def test_read_warc_and_corpus_view(spark, tmp_path):
    for f in range(2):
        name = f"crawl-{f:04d}.warc" + (".gz" if f % 2 else "")
        (tmp_path / name).write_bytes(
            W.synth_warc_file(f, range(f, 12, 2), bool(f % 2))
        )
    docs = W.warc_documents(W.read_warc(spark, str(tmp_path))).cache()
    try:
        got = docs.collect()
        # 12 docs minus the 404 (doc 3): boilerplate-stripped main text
        assert len(got) == 11
        assert all(r["doc_id"] is not None for r in got)
        assert len({r["doc_id"] for r in got}) == 11  # xxhash64(uri) unique
        texts = [r["text"] for r in got]
        assert all("paragraph" in t for t in texts)  # content kept
        assert all("Home" not in t for t in texts)  # nav boiler stripped
    finally:
        docs.unpersist()


def test_load_documents_warc_format(spark, tmp_path):
    from ocr_spark.sources.jsonl import load_documents

    (tmp_path / "c.warc").write_bytes(W.synth_warc_file(0, range(6), False))
    df = load_documents(spark, str(tmp_path), fmt="warc")
    assert set(df.columns) == {"doc_id", "text"}
    assert df.count() == 5  # doc 3 is the 404


def test_fixture_html_matches_oracle_reconstruction(spark):
    """The SQL twin in entry_queries reconstructs warc_html byte-for-byte."""
    import duckdb

    from ocr_spark.plans.entry_queries import _N_WARC_DOCS, _SQL_WARC_HTML

    got = duckdb.sql(
        f"SELECT doc_id, {_SQL_WARC_HTML} AS html "
        f"FROM range({_N_WARC_DOCS}) t(doc_id) ORDER BY doc_id"
    ).fetchall()
    assert len(got) == _N_WARC_DOCS
    for i, html in got:
        assert html == W.warc_html(i), f"doc {i} diverges"


def test_warc_stream_matches_batch(spark, tmp_path):
    """Continuous crawl ingestion: files dropped across micro-batches
    produce exactly the batch parse's corpus view."""
    import ocr_spark.sources.warc as W

    drop = tmp_path / "drop"
    drop.mkdir()
    (drop / "crawl-0000.warc").write_bytes(W.synth_warc_file(0, range(0, 12, 2), False))
    stream = W.warc_documents(W.read_warc_stream(spark, str(drop)))
    q = (
        stream.writeStream.format("memory")
        .queryName("warc_docs_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        n1 = spark.sql("SELECT count(*) n FROM warc_docs_stream").collect()[0]["n"]
        # second drop, incl. the gzip codec, lands in a later micro-batch
        (drop / "crawl-0001.warc.gz").write_bytes(
            W.synth_warc_file(1, range(1, 12, 2), True)
        )
        q.processAllAvailable()
        got = spark.table("warc_docs_stream").collect()
    finally:
        q.stop()
    batch = W.warc_documents(W.read_warc(spark, str(drop))).collect()
    assert 0 < n1 < len(got)
    assert {(r["doc_id"], r["text"]) for r in got} == {
        (r["doc_id"], r["text"]) for r in batch
    }


def _http_record(doc_id, http_bytes):
    return W._record(
        [
            ("WARC-Type", "response"),
            ("WARC-Record-ID", f"<urn:ocr-spark:rec:{doc_id}>"),
            ("WARC-Date", W.warc_date(doc_id)),
            ("WARC-Target-URI", W.warc_uri(doc_id)),
            ("Content-Type", "application/http;msgtype=response"),
        ],
        http_bytes,
    )


def test_chunked_transfer_encoding_decoded():
    body = W.warc_html(2).encode()
    mid = len(body) // 2
    chunked = (
        f"{mid:x}\r\n".encode() + body[:mid] + b"\r\n"
        + f"{len(body) - mid:x}\r\n".encode() + body[mid:] + b"\r\n0\r\n\r\n"
    )
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Transfer-Encoding: chunked\r\n\r\n" + chunked
    )
    rows = list(W.parse_warc_bytes("f", _http_record(2, http)))
    assert len(rows) == 1 and rows[0].get("error") is None
    assert rows[0]["payload"] == body


def test_content_encoding_gzip_decoded():
    body = W.warc_html(5).encode()
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Content-Encoding: gzip\r\n\r\n" + zlib.compress(body, 6, wbits=31)
    )
    rows = list(W.parse_warc_bytes("f", _http_record(5, http)))
    assert rows[0].get("error") is None and rows[0]["payload"] == body


def test_charset_transcoded_to_utf8():
    text = "<html><body><p>café résumé</p></body></html>"
    http = (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: text/html; charset=iso-8859-1\r\n\r\n"
        + text.encode("iso-8859-1")
    )
    rows = list(W.parse_warc_bytes("f", _http_record(6, http)))
    assert rows[0]["payload"] == text.encode("utf-8")


def test_corrupt_gzip_member_salvages_prefix():
    recs = [W._warcinfo_record(0), W._response_record(2), W._response_record(8)]
    members = [zlib.compress(r, 6, wbits=31) for r in recs]
    members[-1] = members[-1][:10] + b"\x00\x00\x00\x00" + members[-1][14:]
    rows = list(W.parse_warc_bytes("f", b"".join(members)))
    # the two intact members' records survive; corruption is one error row
    ok = [r for r in rows if not r.get("error")]
    errs = [r for r in rows if r.get("error")]
    assert {r.get("warc_type") for r in ok} >= {"warcinfo", "response"}
    assert any(r.get("target_uri") == W.warc_uri(2) for r in ok)
    assert len(errs) == 1 and errs[0]["error"].startswith("gzip:")


def test_http_error_keeps_framing():
    bad_http = b"NOT-HTTP garbage without a status line\r\n\r\nbody"
    blob = _http_record(3, bad_http) + W._response_record(8)
    rows = list(W.parse_warc_bytes("f", blob))
    assert len(rows) == 2  # no fabricated records from a resync scan
    assert rows[0]["error"].startswith("http:")
    assert rows[0]["target_uri"] == W.warc_uri(3)  # provenance preserved
    assert rows[1].get("error") is None and rows[1]["target_uri"] == W.warc_uri(8)


def test_xhtml_and_case_insensitive_content_type(spark):
    body = W.warc_html(1).encode()
    recs = b"".join(
        _http_record(i, f"HTTP/1.1 200 OK\r\nContent-Type: {ct}\r\n\r\n".encode() + body)
        for i, ct in ((20, "Text/HTML; charset=utf-8"), (21, "application/xhtml+xml"))
    )
    files = spark.createDataFrame([("f.warc", bytearray(recs))],
                                  "file_name string, content binary")
    docs = W.warc_documents(W.parse_warc_records(files))
    assert docs.count() == 2


def test_warc_documents_readability_extractor(spark, tmp_path):
    """extractor="readability" runs the Arc90 scorer over the same corpus
    view: content paragraphs kept, nav/footer boiler dropped, same stable
    doc ids as the boilerpipe path; an unknown extractor refuses."""
    import pytest as _pytest

    (tmp_path / "c.warc").write_bytes(W.synth_warc_file(0, range(6), False))
    parsed = W.read_warc(spark, str(tmp_path))
    rb = {r["doc_id"]: r["text"]
          for r in W.warc_documents(parsed, extractor="readability").collect()}
    bp = {r["doc_id"]: r["text"] for r in W.warc_documents(parsed).collect()}
    assert set(rb) == set(bp)  # same docs, same xxhash64(uri) keys
    assert all("paragraph" in t for t in rb.values())
    assert all("Home" not in t and "(c) 2026" not in t for t in rb.values())
    with _pytest.raises(ValueError, match="unknown HTML extractor"):
        W.warc_documents(parsed, extractor="nope")


def test_load_documents_warc_readability(spark, tmp_path):
    from ocr_spark.sources.jsonl import load_documents

    (tmp_path / "c.warc").write_bytes(W.synth_warc_file(0, range(6), False))
    df = load_documents(spark, str(tmp_path), fmt="warc",
                        html_extractor="readability")
    assert set(df.columns) == {"doc_id", "text"}
    assert df.count() == 5  # doc 3 is the 404


def test_warc_documents_justext_extractor(spark, tmp_path):
    """extractor="justext" runs the stopword-density classifier over the
    same corpus view with the same stable doc ids. The synthetic pages'
    prose is deliberately stopword-free (greek-letter filler), so jusText —
    the precision-oriented family member — rejects every paragraph: empty
    text, never chrome. Real crawl prose (stopword density >= 0.30) is
    covered by the html_justext oracle + fuzz suites."""
    (tmp_path / "c.warc").write_bytes(W.synth_warc_file(0, range(6), False))
    parsed = W.read_warc(spark, str(tmp_path))
    jt = {r["doc_id"]: r["text"]
          for r in W.warc_documents(parsed, extractor="justext").collect()}
    bp = {r["doc_id"]: r["text"] for r in W.warc_documents(parsed).collect()}
    assert set(jt) == set(bp)  # same docs, same xxhash64(uri) keys
    assert all("Home" not in t and "(c) 2026" not in t for t in jt.values())
    assert all(t == "" for t in jt.values())


def _html_response(body: str) -> bytes:
    b = body.encode()
    return (
        f"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        f"Content-Length: {len(b)}\r\n\r\n"
    ).encode() + b


def test_warc_documents_respect_noindex(spark, tmp_path):
    """respect_noindex drops robots-meta noindex (and 'none') pages at
    corpus ingest, before extraction; the default keeps them."""
    content = (
        "<html><body><div><p>"
        + " ".join(f"genuine content word{i} flows here and" for i in range(8))
        + "</p></div></body></html>"
    )
    recs = (
        _http_record(1, _html_response(content))
        + _http_record(
            2,
            _html_response(
                '<meta name="robots" content="noindex">' + content
            ),
        )
        + _http_record(
            3,
            _html_response("<META CONTENT='none' NAME='robots'>" + content),
        )
        + _http_record(
            4,
            _html_response(
                "<meta name='robots' content='nofollow'>" + content
            ),
        )
    )
    d = tmp_path / "drop"
    d.mkdir()
    (d / "a.warc").write_bytes(recs)

    parsed = W.read_warc(spark, str(d))
    default_ids = {r["doc_id"] for r in W.warc_documents(parsed).collect()}
    assert len(default_ids) == 4
    kept = {
        r["doc_id"]
        for r in W.warc_documents(parsed, respect_noindex=True).collect()
    }
    import pyspark.sql.functions as F

    uri_ids = {
        i: spark.range(1).select(F.xxhash64(F.lit(W.warc_uri(i)))).first()[0]
        for i in (1, 2, 3, 4)
    }
    # noindex (2) and none (3) drop; plain (1) and nofollow-only (4) stay
    assert kept == {uri_ids[1], uri_ids[4]}


def test_warc_span_corpus_bridge(spark, tmp_path):
    """The interleaved corpus view shares warc_documents' selection
    contract (same 200-OK gate, same stable doc_id) but emits the
    canonical span shape — and its text spans fuse to the SAME main text
    the flat boilerpipe view extracts."""
    (tmp_path / "c.warc").write_bytes(W.synth_warc_file(0, range(6), False))
    parsed = W.read_warc(spark, str(tmp_path))
    spans = W.warc_span_corpus(parsed).collect()
    flat = {r["doc_id"]: r["text"] for r in W.warc_documents(parsed).collect()}
    assert len(spans) == 5  # the 404 never enters
    for r in spans:
        assert r["doc_id"] in flat
        assert all(s["kind"] == "text" for s in r["spans"])  # fixture has no imgs
        assert [s["offset"] for s in r["spans"]] == [
            i * 16 for i in range(len(r["spans"]))
        ]
        fused = "\n".join(s["text"] for s in r["spans"])
        assert fused == flat[r["doc_id"]]


def test_extract_job_warc_end_to_end(spark, tmp_path, monkeypatch):
    """The FLAGSHIP extraction job runs directly on a crawled WARC drop
    (--format warc): pages enter as the interleaved span corpus and come
    out as assembled documents with features — the full crawl→extract
    path in one spark-submit surface."""
    import sys as _sys

    from jobs import extract_job

    wdir = tmp_path / "crawl"
    wdir.mkdir()
    (wdir / "a.warc").write_bytes(W.synth_warc_file(0, range(6), False))
    out = tmp_path / "out"
    argv = ["extract_job.py", "--input", str(wdir), "--format", "warc",
            "--output", str(out), "--buckets", "2"]
    monkeypatch.setattr(_sys, "argv", argv)
    extract_job.main()

    got = spark.read.parquet(str(out) + "/bucket=*")
    rows = got.collect()
    assert len(rows) == 5  # the 404 never enters
    assert "extracted_text" in got.columns
    assert all(r["extracted_text"] for r in rows)
    assert all("paragraph" in r["extracted_text"] for r in rows)
