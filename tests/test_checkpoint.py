"""Resumable checkpoint-manifest runner (ocr_spark/plans/checkpoint.py).

north_rule requirements under test: per-partition lineage + row/byte
metrics in a commit manifest; a killed job resumes exactly at the last
committed state; resumed output equals a single uninterrupted run.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from ocr_spark.pipeline import extract_documents
from ocr_spark.plans.checkpoint import committed_buckets, config_fingerprint, run_checkpointed
from ocr_spark.plans.derived import span_corpus


@pytest.fixture()
def docs(spark):
    rows = [(i, f"word{i} alpha beta gamma delta epsilon zeta eta theta iota " * 3) for i in range(40)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _run(spark, docs, out, **kw):
    return run_checkpointed(
        spark, span_corpus(docs), str(out), extract_documents,
        num_buckets=4, input_lineage="unit-test", **kw,
    )


def test_full_run_commits_all_buckets(spark, docs, tmp_path):
    out = tmp_path / "full"
    summary = _run(spark, docs, out)
    assert summary == {
        "buckets_total": 4, "buckets_run": 4, "buckets_skipped": 0,
        "rows": 40, "bytes": summary["bytes"],
    }
    assert summary["bytes"] > 0
    recs = committed_buckets(str(out))
    assert sorted(recs) == [0, 1, 2, 3]
    for rec in recs.values():
        assert rec["status"] == "committed"
        assert rec["input"] == "unit-test"
        assert rec["n_rows"] >= 0 and rec["n_bytes"] > 0
        assert rec["config_fingerprint"] == config_fingerprint()
        assert rec["wall_sec"] >= 0


def test_killed_job_resumes_at_last_commit(spark, docs, tmp_path):
    out = tmp_path / "resume"
    with pytest.raises(RuntimeError, match="injected failure"):
        _run(spark, docs, out, fail_after=2)
    assert len(committed_buckets(str(out))) == 2

    summary = _run(spark, docs, out)  # resume
    assert summary["buckets_run"] == 2
    assert summary["buckets_skipped"] == 2
    assert summary["rows"] == 40

    # resumed output == uninterrupted output (span-sequence equality)
    ref = tmp_path / "ref"
    _run(spark, docs, ref)
    got = spark.read.parquet(str(out / "bucket=*")).select(
        "doc_id", F.to_json("spans").alias("s")
    ).collect()
    want = spark.read.parquet(str(ref / "bucket=*")).select(
        "doc_id", F.to_json("spans").alias("s")
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_resume_is_noop_when_complete(spark, docs, tmp_path):
    out = tmp_path / "noop"
    _run(spark, docs, out)
    summary = _run(spark, docs, out)
    assert summary["buckets_run"] == 0
    assert summary["buckets_skipped"] == 4


def test_torn_manifest_record_is_uncommitted(spark, docs, tmp_path):
    out = tmp_path / "torn"
    _run(spark, docs, out)
    # simulate a crash mid-commit: truncate one record
    path = str(out / "_manifest" / "2.json")
    with open(path, "w") as f:
        f.write('{"bucket": 2, "status": "comm')
    assert sorted(committed_buckets(str(out))) == [0, 1, 3]
    summary = _run(spark, docs, out)
    assert summary["buckets_run"] == 1  # only the torn bucket re-ran


def _dedup_docs(spark):
    # 30 unique texts, 10 exact dups of doc 0-9, plus 5 near-dups (one word
    # appended) of docs 0-4 — enough for both the exact and minhash paths
    rows = [(i, f"unique{i} alpha beta gamma delta epsilon zeta eta " * 4) for i in range(30)]
    rows += [(100 + i, rows[i][1]) for i in range(10)]  # exact dups
    rows += [(200 + i, rows[i][1] + " tail") for i in range(5)]  # near dups
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dedup_losers_materialized_once_and_buckets_scan_parquet(spark, tmp_path):
    """The corpus-wide loser set (the full MinHash-LSH pipeline in minhash
    mode) must execute ONCE per job, not once per bucket: after
    materialize_once, the per-bucket transform's plan joins against a
    parquet SCAN — no Arrow/pandas UDF stage (the LSH signature pass) may
    appear in it."""
    from ocr_spark.operators.dedup import corpus_dedup_losers
    from ocr_spark.plans.checkpoint import materialize_once

    docs = _dedup_docs(spark)
    out = tmp_path / "dedup"
    meta = {"mode": "minhash", "threshold": 0.5}
    losers_path = str(out / "_losers")
    losers = materialize_once(
        spark, corpus_dedup_losers(docs, "minhash", 0.5), losers_path, meta
    )
    # the global decision: all 10 exact dups + the 5 near-dup higher ids
    assert sorted(r["doc_id"] for r in losers.collect()) == list(range(100, 110)) + list(
        range(200, 205)
    )

    # per-bucket transform plan: parquet scan, no Python/Arrow eval stage
    transform = lambda part: part.join(losers, "doc_id", "left_anti")  # noqa: E731
    plan = transform(docs)._jdf.queryExecution().executedPlan().toString()
    assert "parquet" in plan.lower()
    for marker in ("ArrowEvalPython", "FlatMapGroupsInPandas", "BatchEvalPython", "EvalPython"):
        assert marker not in plan, f"bucket transform re-executes the LSH pipeline: {marker}"

    # resume: a second materialize_once must NOT recompute (bytes untouched)
    mtime = os.path.getmtime(os.path.join(losers_path, "_SUCCESS"))
    again = materialize_once(
        spark, corpus_dedup_losers(docs, "minhash", 0.5), losers_path, meta
    )
    assert os.path.getmtime(os.path.join(losers_path, "_SUCCESS")) == mtime
    assert again.count() == 15

    # mismatched parameters refuse the stale side input
    with pytest.raises(RuntimeError, match="different parameters"):
        materialize_once(
            spark, corpus_dedup_losers(docs, "minhash", 0.8), losers_path,
            {"mode": "minhash", "threshold": 0.8},
        )

    # end-to-end: bucketed write against the materialized set == global dedup
    summary = run_checkpointed(
        spark, docs, str(out), transform, num_buckets=4, input_lineage="unit-test"
    )
    assert summary["rows"] == 30
    kept = spark.read.parquet(str(out / "bucket=*"))
    assert sorted(r["doc_id"] for r in kept.collect()) == list(range(30))


def test_config_change_refuses_resume(spark, docs, tmp_path):
    out = tmp_path / "cfg"
    _run(spark, docs, out)
    path = str(out / "_manifest" / "0.json")
    rec = json.load(open(path))
    rec["config_fingerprint"] = "stale"
    json.dump(rec, open(path, "w"))
    with pytest.raises(RuntimeError, match="different pipeline config"):
        _run(spark, docs, out)


def test_bucket_scheme_change_refuses_resume(spark, docs, tmp_path):
    """Re-running with a different num_buckets or id_col must refuse:
    old pmod buckets are incompatible — skipping them silently loses the
    rows hashed to buckets that no longer exist."""
    out = tmp_path / "scheme"
    _run(spark, docs, out)
    with pytest.raises(RuntimeError, match="num_buckets=4 but this run uses 8"):
        run_checkpointed(
            spark, span_corpus(docs), str(out), extract_documents,
            num_buckets=8, input_lineage="unit-test",
        )
    with pytest.raises(RuntimeError, match="id_col"):
        run_checkpointed(
            spark, span_corpus(docs).withColumnRenamed("doc_id", "docid"),
            str(out), extract_documents, num_buckets=4, id_col="docid",
            input_lineage="unit-test",
        )


def test_dedup_cc_mode_drops_transitive_chain(spark):
    """minhash-cc is the cluster-level semantics: in a chain A~B~C where
    A~C never forms an LSH pair, pairwise mode can keep a doc whose
    near-dup was dropped; cc mode keeps exactly one doc per component.

    The corpus is a pre-searched deterministic construction (md5 minhash is
    seedless): B = 120 distinct words, A/C overlap B on opposite 85-word
    ends -> exact shingle Jaccard 0.542/0.542/0.255, LSH pairs exactly
    {(A,B),(B,C)} at threshold 0.5."""
    from ocr_spark.operators.dedup import corpus_dedup_losers, dedup_minhash_lsh

    m = [f"w2x{i}" for i in range(120)]
    a_uni = [f"a2u{i}" for i in range(35)]
    c_uni = [f"c2u{i}" for i in range(35)]
    a = " ".join(m[:85] + a_uni)
    b = " ".join(m)
    c = " ".join(m[35:] + c_uni)
    docs = spark.createDataFrame([(1, a), (2, b), (3, c)], "doc_id long, text string")

    pairs = {
        (r["a_id"], r["b_id"])
        for r in dedup_minhash_lsh(docs, jaccard_threshold=0.5).collect()
    }
    # the premise: a chain through doc 2, no direct 1~3 pair
    assert pairs == {(1, 2), (2, 3)}

    pairwise = {r["doc_id"] for r in corpus_dedup_losers(docs, "minhash", 0.5).collect()}
    cc = {r["doc_id"] for r in corpus_dedup_losers(docs, "minhash-cc", 0.5).collect()}
    assert pairwise == {2, 3}
    assert cc == {2, 3}  # same here, but via one component {1,2,3}

    # the distinguishing shape: relabel so the chain's middle doc has the
    # HIGHEST id -- pairs become (1,4),(3,4), no direct 1~3 pair
    docs2 = spark.createDataFrame([(1, a), (4, b), (3, c)], "doc_id long, text string")
    pairwise2 = {r["doc_id"] for r in corpus_dedup_losers(docs2, "minhash", 0.5).collect()}
    cc2 = {r["doc_id"] for r in corpus_dedup_losers(docs2, "minhash-cc", 0.5).collect()}
    assert pairwise2 == {4}  # keeps 1 AND 3 -- both near-dups of dropped 4
    assert cc2 == {3, 4}  # one canonical (1) for the whole component


def test_dedup_job_rejects_unknown_mode(spark):
    from ocr_spark.operators.dedup import corpus_dedup_losers

    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="unknown dedup mode"):
        corpus_dedup_losers(docs, "bogus")


def test_string_doc_ids_flagship_and_resume(spark, docs, tmp_path):
    """input_hint contract: doc_id is a STRING in the graded table shape.
    The span pipeline and the bucketed checkpoint runner must both accept
    string keys (bucket = pmod(hash(id)) works on any orderable type)."""
    corpus = span_corpus(docs).withColumn(
        "doc_id", F.concat(F.lit("doc-"), F.col("doc_id").cast("string"))
    )
    out = extract_documents(corpus)
    assert out.schema["doc_id"].dataType.simpleString() == "string"
    assert out.count() == 40

    d = tmp_path / "strids"
    summary = run_checkpointed(
        spark, corpus, str(d), extract_documents, num_buckets=4, input_lineage="t"
    )
    assert summary["rows"] == 40
    kept = spark.read.parquet(str(d / "bucket=*")).select("doc_id").collect()
    assert sorted(r["doc_id"] for r in kept) == sorted(f"doc-{i}" for i in range(40))


def _curate_docs(spark):
    """40 quality docs (unique words + English stopwords), 5 near-dups of
    docs 0-4, 5 repetition-spam docs, 2 exact dups of doc 0."""
    import random

    rnd = random.Random(3)
    sw = ["the", "and", "of", "to", "in", "is", "was", "for"]
    rows = []
    for i in range(40):
        words = []
        for j in range(70):
            words.append(f"w{i}x{j}" if j % 3 else rnd.choice(sw))
        rows.append((i, " ".join(words)))
    rows += [(100 + i, rows[i][1] + " tail") for i in range(5)]      # near dups
    rows += [(200 + i, "spam ham jam " * 30) for i in range(5)]      # fails gopher
    rows += [(300, rows[0][1]), (301, rows[0][1])]                   # exact dups
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_curate_job_end_to_end_and_resume(spark, tmp_path):
    from jobs.curate_job import run_curate

    docs = _curate_docs(spark)
    inp = str(tmp_path / "in.parquet")
    docs.write.parquet(inp)

    out = tmp_path / "cur"
    with pytest.raises(RuntimeError, match="injected failure"):
        run_curate(spark, inp, str(out), dedup_mode="minhash-cc",
                   threshold=0.5, langs=("en",), num_buckets=4, fail_after=2)
    summary = run_curate(spark, inp, str(out), dedup_mode="minhash-cc",
                         threshold=0.5, langs=("en",), num_buckets=4)
    assert summary["buckets_skipped"] == 2  # resumed, not recomputed

    got = spark.read.parquet(str(out / "bucket=*"))
    ids = sorted(r["doc_id"] for r in got.select("doc_id").collect())
    # near-dup/exact-dup losers (100-104, 300, 301) and spam (200-204) gone
    assert ids == list(range(40))
    row = got.filter(F.col("doc_id") == 0).first()
    assert row["lang"] == "en" and row["n_words"] >= 50 and row["n_redactions"] == 0

    # uninterrupted run == resumed run (same kept set, same texts)
    ref = tmp_path / "ref"
    run_curate(spark, inp, str(ref), dedup_mode="minhash-cc",
               threshold=0.5, langs=("en",), num_buckets=4)
    want = spark.read.parquet(str(ref / "bucket=*"))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_curate_job_line_dedup(spark, tmp_path):
    from jobs.curate_job import run_curate

    docs = _curate_docs(spark)
    # inject a line shared by the first three quality docs
    docs = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") < 3,
            F.concat(F.lit("the shared cookie banner line\n"), F.col("text")),
        ).otherwise(F.col("text")),
    )
    inp = str(tmp_path / "in2.parquet")
    docs.write.parquet(inp)
    out = tmp_path / "cur2"
    run_curate(spark, inp, str(out), dedup_mode="exact", langs=("en",),
               num_buckets=4, line_dedup=True)
    got = spark.read.parquet(str(out / "bucket=*"))
    texts = {r["doc_id"]: r["text"] for r in got.select("doc_id", "text").collect()}
    n_with_banner = sum("shared cookie banner" in t for t in texts.values())
    assert n_with_banner == 1  # canonical occurrence only (doc 0)
    assert "shared cookie banner" in texts[0]


def test_curate_job_blocklist(spark, tmp_path):
    from jobs.curate_job import run_curate

    docs = _curate_docs(spark)
    docs = docs.withColumn(
        "text",
        F.when(F.col("doc_id") == 5, F.concat(F.col("text"), F.lit(" casino"))).otherwise(
            F.col("text")
        ),
    )
    inp = str(tmp_path / "in3.parquet")
    docs.write.parquet(inp)
    out = tmp_path / "cur3"
    run_curate(spark, inp, str(out), dedup_mode="exact", langs=("en",),
               num_buckets=4, blocklist=("casino",))
    ids = sorted(
        r["doc_id"] for r in spark.read.parquet(str(out / "bucket=*")).select("doc_id").collect()
    )
    assert 5 not in ids and 4 in ids and 6 in ids


def test_curate_job_decontaminate_and_pack(spark, tmp_path):
    from jobs.curate_job import run_curate

    docs = _curate_docs(spark)
    inp = str(tmp_path / "in4.parquet")
    docs.write.parquet(inp)
    # eval corpus = doc 6's text verbatim plus an unrelated doc
    ev_text = docs.filter(F.col("doc_id") == 6).first()["text"]
    ev = spark.createDataFrame(
        [(9000, ev_text), (9001, "nothing in common here at all")],
        "doc_id long, text string",
    )
    evp = str(tmp_path / "eval.parquet")
    ev.write.parquet(evp)

    out = tmp_path / "cur4"
    summary = run_curate(spark, inp, str(out), dedup_mode="exact", langs=("en",),
                         num_buckets=4, decon_eval=evp, pack_seq_len=64,
                         pack_shards=2)
    got = spark.read.parquet(str(out / "bucket=*"))
    ids = sorted(r["doc_id"] for r in got.select("doc_id").collect())
    assert 6 not in ids and 5 in ids and 7 in ids  # only the leaked doc dropped

    packed = spark.read.parquet(str(out / "_packed"))
    assert sorted(r["doc_id"] for r in packed.select("doc_id").collect()) == ids
    assert summary["packed_docs"] == len(ids)
    assert summary["packed_sequences"] >= 1
    pos = {}
    for r in sorted(packed.collect(), key=lambda r: (r["shard"], r["doc_id"])):
        assert r["tok_start"] == pos.get(r["shard"], 0)  # contiguous per shard
        pos[r["shard"]] = r["tok_start"] + r["n_tokens"]


def test_curate_resume_refuses_changed_filters(spark, tmp_path):
    """Changing --langs (or any transform-semantics parameter) between a
    crash and its resume must refuse: committed buckets would keep the old
    filters while fresh ones applied the new."""
    from jobs.curate_job import run_curate

    docs = _curate_docs(spark)
    inp = str(tmp_path / "in4.parquet")
    docs.write.parquet(inp)
    out = tmp_path / "cur4"
    with pytest.raises(RuntimeError, match="injected failure"):
        run_curate(spark, inp, str(out), dedup_mode="exact", langs=("en",),
                   num_buckets=4, fail_after=2)
    with pytest.raises(RuntimeError, match="different pipeline config"):
        run_curate(spark, inp, str(out), dedup_mode="exact", langs=("en", "ru"),
                   num_buckets=4)
    # unchanged parameters resume fine
    summary = run_curate(spark, inp, str(out), dedup_mode="exact", langs=("en",),
                         num_buckets=4)
    assert summary["buckets_skipped"] == 2


def test_curate_job_jsonl_input(spark, tmp_path):
    """End-to-end curation from a JSONL corpus with a malformed line."""
    import os

    from jobs.curate_job import run_curate
    from ocr_spark.sources import jsonl as J

    docs = _curate_docs(spark)
    inp = str(tmp_path / "in.jsonl")
    J.write_jsonl(docs, inp)
    with open(os.path.join(inp, "junk.json"), "w") as f:
        f.write('{"doc_id": 999, "tex\n')
    out = tmp_path / "cur_jl"
    summary = run_curate(spark, inp, str(out), dedup_mode="minhash-cc", threshold=0.5,
                         langs=("en",), num_buckets=4, input_format="jsonl")
    ids = sorted(
        r["doc_id"] for r in spark.read.parquet(str(out / "bucket=*")).select("doc_id").collect()
    )
    assert ids == list(range(40)) and summary["rows"] == 40  # junk line never crashes


def test_jsonl_output_format_and_resume_guard(spark, docs, tmp_path):
    """run_checkpointed can emit line-delimited JSON per bucket (the
    reference's response shape); a resume in the OTHER format refuses."""
    out = tmp_path / "jl_out"
    summary = run_checkpointed(
        spark, span_corpus(docs), str(out), extract_documents,
        num_buckets=4, input_lineage="t", output_format="jsonl",
    )
    assert summary["rows"] == 40
    back = spark.read.json(str(out / "bucket=*"))
    assert back.count() == 40 and "doc_id" in back.columns
    with pytest.raises(RuntimeError, match="committed as jsonl"):
        run_checkpointed(
            spark, span_corpus(docs), str(out), extract_documents,
            num_buckets=4, input_lineage="t", output_format="parquet",
        )


def test_curate_job_keeps_non_english_corpora(spark, tmp_path):
    """Regression: the Gopher stop-word / alpha-word rules are English-
    specific; applied unconditionally they drop EVERY Russian document
    (zero English stopwords, ~0% [A-Za-z] words) before the --langs ru
    filter even runs. The gate must be language-aware."""
    import random

    from jobs.curate_job import run_curate

    rnd = random.Random(7)
    sw_ru = ["что", "это", "как", "для", "при", "или", "его", "там"]
    rows = []
    for i in range(12):
        words = []
        for j in range(70):
            words.append(f"сло{i}во{j}" if j % 3 else rnd.choice(sw_ru))
        rows.append((i, " ".join(words)))
    # a Russian repetition-spam doc must STILL fail the neutral rules
    rows.append((100, "спам спам спам " * 30))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    inp = str(tmp_path / "ru.parquet")
    docs.write.parquet(inp)

    out = tmp_path / "cur_ru"
    run_curate(spark, inp, str(out), dedup_mode="exact", langs=("ru",),
               num_buckets=2)
    got = spark.read.parquet(str(out / "bucket=*"))
    ids = sorted(r["doc_id"] for r in got.select("doc_id").collect())
    assert ids == list(range(12))  # quality Russian docs kept, spam dropped
    assert {r["lang"] for r in got.select("lang").collect()} == {"ru"}


def test_curate_decon_rejects_empty_eval_parse(spark, tmp_path):
    """--decon-eval in the wrong format parses to zero valid rows; the job
    must refuse loudly rather than run a no-op decontamination."""
    import pytest as _pytest

    from jobs.curate_job import run_curate

    docs = _curate_docs(spark)
    inp = str(tmp_path / "in.parquet")
    docs.write.parquet(inp)
    # eval set written as parquet but declared jsonl → every "line" quarantined
    ev = str(tmp_path / "eval.parquet")
    docs.limit(3).write.parquet(ev)

    with _pytest.raises(ValueError, match="zero valid rows"):
        run_curate(spark, inp, str(tmp_path / "o"), dedup_mode="exact",
                   num_buckets=2, decon_eval=ev, input_format="parquet",
                   decon_format="jsonl")


def test_curate_job_domain_gate(spark, tmp_path):
    from jobs.curate_job import run_curate

    docs = _curate_docs(spark)
    docs = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") == 7,
            F.concat(F.col("text"), F.lit(" see https://m.badsite.example/x")),
        ).otherwise(F.col("text")),
    )
    inp = str(tmp_path / "in_dom.parquet")
    docs.write.parquet(inp)
    out = tmp_path / "cur_dom"
    run_curate(spark, inp, str(out), dedup_mode="exact", langs=("en",),
               num_buckets=4, blocked_domains=("badsite.example",))
    ids = sorted(
        r["doc_id"] for r in spark.read.parquet(str(out / "bucket=*")).select("doc_id").collect()
    )
    assert 7 not in ids and 6 in ids and 8 in ids


def test_curate_job_lm_filter_and_mix(spark, tmp_path):
    from jobs.curate_job import run_curate
    from ocr_spark.operators.textstats import lm_surprisal, temperature_sample

    docs = _curate_docs(spark)
    inp = str(tmp_path / "in_lm.parquet")
    docs.write.parquet(inp)

    # expected LM scores over the exact-deduped corpus (300/301 are the
    # exact-dup losers); threshold = a mid quantile so both sides are
    # non-empty among the docs that survive the other gates
    deduped = docs.filter(~F.col("doc_id").isin([300, 301]))
    scores = {r["doc_id"]: r["avg_bits"] for r in lm_surprisal(deduped).collect()}
    survivors = [i for i in list(range(40)) + list(range(100, 105))]
    mid = sorted(scores[i] for i in survivors)[len(survivors) // 2]
    expected = sorted(i for i in survivors if scores[i] <= mid)
    assert 0 < len(expected) < len(survivors)  # the gate actually splits

    out = tmp_path / "cur_lm"
    summary = run_curate(
        spark, inp, str(out), dedup_mode="exact", langs=("en",), num_buckets=4,
        lm_max_bits=mid, mix_cap=15, pack_seq_len=128,
    )
    got = spark.read.parquet(str(out / "bucket=*"))
    assert sorted(r["doc_id"] for r in got.select("doc_id").collect()) == expected
    assert (out / "_lm_losers").exists()

    # mixing: _mix holds the seeded per-language decision over the
    # committed survivors, and packing packs EXACTLY the mixed-in docs
    mix = spark.read.parquet(str(out / "_mix"))
    want_mix = {
        r["doc_id"]: r["kept"]
        for r in temperature_sample(got, "lang", cap=15).collect()
    }
    got_mix = {r["doc_id"]: r["kept"] for r in mix.collect()}
    assert got_mix == want_mix
    n_kept = sum(got_mix.values())
    assert 0 < n_kept < len(got_mix)  # cap=15 over ~20+ en docs downsamples
    assert summary["mix_kept_docs"] == n_kept
    assert summary["packed_docs"] == n_kept
    packed_ids = {
        r["doc_id"]
        for r in spark.read.parquet(str(out / "_packed")).select("doc_id").collect()
    }
    assert packed_ids == {d for d, k in got_mix.items() if k}


def test_curate_job_dsir_selection(spark, tmp_path):
    """--dsir-target + --dsir-min-avg-bits: docs less target-like than the
    threshold drop, the loser set materializes once, and the stage composes
    with the downstream gates."""
    from jobs.curate_job import run_curate
    from ocr_spark.operators.dedup import release_feature_caches
    from ocr_spark.operators.textstats import dsir_importance

    docs = _curate_docs(spark)
    inp = str(tmp_path / "in_dsir.parquet")
    docs.write.parquet(inp)
    # target = the vocabulary of docs 0-9 (a "curated" slice)
    target = docs.filter(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 1000).alias("doc_id"), "text"
    )
    tgt_path = str(tmp_path / "dsir_target.parquet")
    target.write.parquet(tgt_path)

    # expected scores over the exact-deduped corpus: 300/301 (dups of 0)
    # AND 201-204 (the spam rows are identical, 200 is canonical) lose.
    # Unlike the LM filter, DSIR's weights are global (the q-model totals
    # cover every doc), so the reference pool must match the job's exactly.
    deduped = docs.filter(~F.col("doc_id").isin([300, 301, 201, 202, 203, 204]))
    scores = {
        r["doc_id"]: r["avg_bits"]
        for r in dsir_importance(deduped, spark.read.parquet(tgt_path)).collect()
    }
    release_feature_caches()
    survivors = list(range(40)) + list(range(100, 105))
    mid = sorted(scores[i] for i in survivors)[len(survivors) // 2]
    expected = sorted(i for i in survivors if scores[i] >= mid)
    assert 0 < len(expected) < len(survivors)  # the gate actually splits
    # the target-vocabulary docs are the target-like side
    assert all(scores[i] >= mid for i in range(10))

    out = tmp_path / "cur_dsir"
    summary = run_curate(
        spark, inp, str(out), dedup_mode="exact", langs=("en",), num_buckets=4,
        dsir_target=tgt_path, dsir_min_avg_bits=mid,
    )
    got = spark.read.parquet(str(out / "bucket=*"))
    assert sorted(r["doc_id"] for r in got.select("doc_id").collect()) == expected
    assert (out / "_dsir_losers").exists()
    assert summary["buckets_total"] == 4


def test_curate_job_dsir_target_without_threshold_is_loud(spark, tmp_path):
    from jobs.curate_job import run_curate

    docs = _curate_docs(spark)
    inp = str(tmp_path / "in_dsir2.parquet")
    docs.write.parquet(inp)
    with pytest.raises(ValueError, match="dsir-min-avg-bits"):
        run_curate(spark, inp, str(tmp_path / "cur_dsir2"), dedup_mode="exact",
                   num_buckets=4, dsir_target=inp)


def test_curate_job_fix_text_dedups_styled_twins(spark, tmp_path):
    from jobs.curate_job import run_curate

    docs = _curate_docs(spark)
    # doc 310 = doc 1's text with typographic quotes/dashes — an exact dup
    # only AFTER repair
    base = docs.filter(F.col("doc_id") == 1).first()["text"]
    styled = "“" + base.replace(" the ", " the – ", 1) + "”"
    plain = '"' + base.replace(" the ", " the - ", 1) + '"'
    extra = spark.createDataFrame([(310, styled), (311, plain)], "doc_id long, text string")
    inp = str(tmp_path / "in_fix.parquet")
    docs.union(extra).write.parquet(inp)

    out = tmp_path / "cur_fix"
    run_curate(spark, inp, str(out), dedup_mode="exact", langs=("en",),
               num_buckets=4, do_fix_text=True)
    got = spark.read.parquet(str(out / "bucket=*"))
    ids = {r["doc_id"] for r in got.select("doc_id").collect()}
    # exactly one of the styled/plain twins survives, and its text is repaired
    assert len(ids & {310, 311}) == 1
    kept = got.filter(F.col("doc_id").isin([310, 311])).first()
    assert "“" not in kept["text"] and "–" not in kept["text"]

    # without repair both twins survive (they hash differently)
    out2 = tmp_path / "cur_nofix"
    run_curate(spark, inp, str(out2), dedup_mode="exact", langs=("en",),
               num_buckets=4)
    ids2 = {r["doc_id"] for r in
            spark.read.parquet(str(out2 / "bucket=*")).select("doc_id").collect()}
    assert {310, 311} <= ids2


def test_curate_job_classifier_filter(spark, tmp_path):
    from jobs.curate_job import run_curate
    from ocr_spark.operators.textstats import classifier_score

    docs = _curate_docs(spark)
    inp = str(tmp_path / "in_cls.parquet")
    docs.write.parquet(inp)

    # trained weights: every bucket a quality doc uses gets +1000, so docs
    # score positive iff their words hash into the weighted buckets; give
    # weight only to doc 0-19's vocabulary
    from ocr_spark.operators.textstats import CLS_BUCKETS, CLS_WEIGHT_A  # noqa: F401
    import hashlib

    def bucket(w):
        return int(hashlib.md5(f"cls-v1:{w}".encode()).hexdigest()[:12], 16) % CLS_BUCKETS

    favored = set()
    for r in docs.filter(F.col("doc_id") < 20).collect():
        for w in r["text"].lower().split():
            favored.add(bucket(w))
    wdf = spark.createDataFrame([(b, 1000) for b in sorted(favored)],
                                "bucket long, weight long")
    wpath = str(tmp_path / "weights.parquet")
    wdf.write.parquet(wpath)

    out = tmp_path / "cur_cls"
    run_curate(spark, inp, str(out), dedup_mode="exact", langs=("en",),
               num_buckets=4, cls_weights_path=wpath, cls_min_score=0.0005)
    ids = sorted(r["doc_id"] for r in
                 spark.read.parquet(str(out / "bucket=*")).select("doc_id").collect())
    # expected: survivors of the other gates whose classifier score clears
    # the bar — docs 0-19 fully favored; 20-39 share only stopword buckets
    scored = {r["doc_id"]: r["score"]
              for r in classifier_score(docs, weights=wdf).collect()}
    want = sorted(i for i in list(range(40)) + list(range(100, 105))
                  if i not in (300, 301) and scored[i] >= 0.0005)
    assert ids == want
    assert set(range(20)) <= set(ids)          # favored docs survive
    assert len(set(range(20, 40)) & set(ids)) < 20  # most unfavored drop


def test_curate_job_refuses_stale_side_inputs_on_fix_text_toggle(spark, tmp_path):
    """fix_text participates in every side-input meta: a run that died
    before ANY bucket committed (where run_checkpointed's fingerprint
    guard has nothing to check) must still refuse to reuse a loser set
    computed on unrepaired text."""
    from jobs.curate_job import run_curate

    docs = _curate_docs(spark)
    inp = str(tmp_path / "in_tg.parquet")
    docs.write.parquet(inp)
    out = tmp_path / "cur_tg"
    with pytest.raises(RuntimeError, match="injected failure"):
        run_curate(spark, inp, str(out), dedup_mode="exact", langs=("en",),
                   num_buckets=4, fail_after=0)  # _losers committed, 0 buckets
    with pytest.raises(RuntimeError, match="different parameters"):
        run_curate(spark, inp, str(out), dedup_mode="exact", langs=("en",),
                   num_buckets=4, do_fix_text=True)


def test_curate_job_refuses_stale_packed_on_mix_toggle(spark, tmp_path):
    """_packed records mix participation: adding --mix-cap to a finished
    run must not silently reuse a packing layout that includes documents
    the mixer would drop."""
    from jobs.curate_job import run_curate

    docs = _curate_docs(spark)
    inp = str(tmp_path / "in_mx.parquet")
    docs.write.parquet(inp)
    out = tmp_path / "cur_mx"
    run_curate(spark, inp, str(out), dedup_mode="exact", langs=("en",),
               num_buckets=4, pack_seq_len=128)
    with pytest.raises(RuntimeError, match="different parameters"):
        run_curate(spark, inp, str(out), dedup_mode="exact", langs=("en",),
                   num_buckets=4, pack_seq_len=128, mix_cap=15)


def test_curate_job_cls_weights_without_threshold_is_loud(spark, tmp_path):
    from jobs.curate_job import run_curate

    docs = _curate_docs(spark)
    inp = str(tmp_path / "in_cw.parquet")
    docs.write.parquet(inp)
    with pytest.raises(ValueError, match="cls-min-score"):
        run_curate(spark, inp, str(tmp_path / "cur_cw"), dedup_mode="exact",
                   num_buckets=4, cls_weights_path=inp)


def test_curate_job_substr_dedup(spark, tmp_path):
    from jobs.curate_job import run_curate

    docs = _curate_docs(spark)
    # inject an 8-token boilerplate sentence into docs 2 and 3 (doc 2's
    # occurrence is canonical; doc 3's must be deleted)
    boiler = "shared promotional footer sentence appears twice across documents"
    docs = docs.withColumn(
        "text",
        F.when(F.col("doc_id").isin([2, 3]),
               F.concat(F.col("text"), F.lit(" " + boiler))).otherwise(F.col("text")),
    )
    inp = str(tmp_path / "in_ss.parquet")
    docs.write.parquet(inp)
    out = tmp_path / "cur_ss"
    run_curate(spark, inp, str(out), dedup_mode="exact", langs=("en",),
               num_buckets=4, substr_k=8)
    texts = {r["doc_id"]: r["text"] for r in
             spark.read.parquet(str(out / "bucket=*")).select("doc_id", "text").collect()}
    assert (out / "_substr_marks").exists()
    assert "promotional footer" in texts[2]      # canonical occurrence kept
    assert "promotional footer" not in texts[3]  # duplicate deleted
    # untouched docs pass through byte-identical (not re-tokenized)
    orig = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert texts[10] == orig[10]  # no marks, no URL/PII: byte-identical


def test_curate_job_substr_marks_align_after_line_dedup(spark, tmp_path):
    """Substr marks are TOKEN POSITIONS into the text the transform
    rewrites — and line dedup rewrites that text first. Marks built on the
    raw text would stamp shifted windows in every doc that lost a line
    (the dup window survives, innocent tokens die); this pins the
    composition: marks are computed over the line-deduped view."""
    from jobs.curate_job import run_curate

    tail1 = " ".join(f"left{c}" for c in "abcdefghijklmnop")
    tail2 = " ".join(f"right{c}" for c in "abcdefghijklmnop")
    rows = [
        # docs 1 and 2 share a duplicated LINE (doc 1's copy canonical)
        # and, after it, a duplicated 4-token WINDOW (doc 1's canonical).
        (1, "header line one\nalpha beta gamma delta " + tail1),
        (2, "header line one\nalpha beta gamma delta " + tail2),
        (3, " ".join(f"solo{c}" for c in "abcdefghijklmnopqrst")),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    inp = str(tmp_path / "in_la.parquet")
    docs.write.parquet(inp)
    out = tmp_path / "cur_la"
    run_curate(
        spark, inp, str(out), dedup_mode="exact", num_buckets=2,
        line_dedup=True, substr_k=4,
        gopher_overrides={
            "min_words": 1, "min_stopwords_present": 0,
            "max_top_2gram_char_frac": 1.0, "max_top_3gram_char_frac": 1.0,
            "max_top_4gram_char_frac": 1.0, "max_dup_line_char_frac": 1.0,
        },
    )
    texts = {r["doc_id"]: r["text"] for r in
             spark.read.parquet(str(out / "bucket=*")).select("doc_id", "text").collect()}
    # doc 2 lost the dup line (3 tokens) THEN the dup window, which sits at
    # token 0 of the line-deduped text. Misaligned (raw-text) marks would
    # instead delete tokens 3-6 and leave "alpha beta gamma delta" alive.
    assert texts[2] == tail2
    assert "alpha beta gamma delta" in texts[1]  # canonical occurrence kept
    assert "header line one" in texts[1]         # canonical line kept


def test_curate_job_report(spark, tmp_path):
    """--report composes the sketch/report primitives over the COMMITTED
    survivors: totals, exact length quantiles, HLL distinct-content
    estimate — one materialize_once-pinned row."""
    from jobs.curate_job import run_curate

    docs = _curate_docs(spark)
    inp = str(tmp_path / "in_rp.parquet")
    docs.write.parquet(inp)
    out = tmp_path / "cur_rp"
    summary = run_curate(spark, inp, str(out), dedup_mode="exact", langs=("en",),
                         num_buckets=4, report=True)
    rep = summary["report"]
    assert (out / "_report" / "_SUCCESS").exists()
    kept = spark.read.parquet(str(out / "bucket=*"))
    n = kept.count()
    assert rep["n_docs"] == n and n > 0
    assert 0 < rep["p50_chars"] <= rep["p90_chars"] <= rep["p99_chars"]
    assert rep["n_tokens"] > rep["n_docs"]  # docs have many words
    # every kept text is unique post-dedup → the HLL estimate sits near n
    assert abs(rep["distinct_text_est"] - n) / n < 0.2
    # the content digest matches an independent recomputation over the
    # committed survivors (order-independent, so partitioning is free)
    from ocr_spark.operators.textstats import corpus_digest

    assert rep["content_digest"] == corpus_digest(kept.repartition(5)).first()["digest"]


def test_dedup_job_incremental_against_prior_index(spark, tmp_path):
    """Two chained drops: drop 2 passes drop 1's _index via against= and
    must drop exact/near dups of ALREADY-COMMITTED docs without re-reading
    drop 1's text; its own _index chains (old ∪ new kept)."""
    import subprocess
    import sys

    env = dict(os.environ, PYTHONPATH="/root/repo")
    docs1 = _dedup_docs(spark)
    in1 = str(tmp_path / "drop1.parquet")
    docs1.write.parquet(in1)
    out1 = str(tmp_path / "out1")
    r1 = subprocess.run(
        [sys.executable, "jobs/dedup_job.py", "--input", in1, "--output", out1,
         "--mode", "minhash", "--threshold", "0.5", "--buckets", "2",
         "--write-index"],
        capture_output=True, text=True, cwd="/root/repo", env=env,
    )
    assert r1.returncode == 0, r1.stderr[-2000:]
    assert os.path.exists(os.path.join(out1, "_index", "_SUCCESS"))
    kept1 = spark.read.parquet(out1 + "/bucket=*")
    n1 = kept1.count()

    # drop 2: one exact dup of a committed doc, one near dup, one fresh
    base1 = {r["doc_id"]: r["text"] for r in docs1.collect()}
    rows2 = [
        (900, base1[5]),          # exact dup of committed doc 5
        # near dup of committed doc 6: UPPER-cased → different md5 (not an
        # exact dup) but identical lowered shingles → Jaccard 1.0, so the
        # LSH banding is GUARANTEED to collide (a drifted-text fixture sat
        # in the ~8% no-band-collision zone and made the test flaky)
        (901, base1[6].upper()),
        (902, "genuinely new content with twelve fresh words appearing here only once"),
    ]
    in2 = str(tmp_path / "drop2.parquet")
    spark.createDataFrame(rows2, "doc_id long, text string").write.parquet(in2)
    out2 = str(tmp_path / "out2")
    r2 = subprocess.run(
        [sys.executable, "jobs/dedup_job.py", "--input", in2, "--output", out2,
         "--mode", "minhash", "--threshold", "0.5", "--buckets", "2",
         "--against", os.path.join(out1, "_index")],
        capture_output=True, text=True, cwd="/root/repo", env=env,
    )
    assert r2.returncode == 0, r2.stderr[-2000:]
    kept2 = sorted(r["doc_id"] for r in spark.read.parquet(out2 + "/bucket=*").collect())
    assert kept2 == [902]
    # the chained index covers old ∪ new kept
    idx2 = spark.read.parquet(os.path.join(out2, "_index"))
    assert idx2.count() == n1 + 1


def test_curate_job_incremental_against_prior_index(spark, tmp_path):
    """Curation drop 2 against drop 1's _index: committed content never
    re-admitted even when drop 2's copy differs only by case; the new
    _index chains over the survivors' PRE-redaction text."""
    from jobs.curate_job import run_curate

    docs = _curate_docs(spark)
    in1 = str(tmp_path / "cin1.parquet")
    docs.write.parquet(in1)
    out1 = tmp_path / "cout1"
    run_curate(spark, in1, str(out1), dedup_mode="minhash", threshold=0.5,
               langs=("en",), num_buckets=2, write_index=True)
    kept1 = spark.read.parquet(str(out1 / "bucket=*"))
    assert (out1 / "_index" / "_SUCCESS").exists()
    n_idx1 = spark.read.parquet(str(out1 / "_index")).count()
    assert n_idx1 == kept1.count()

    base = {r["doc_id"]: r["text"] for r in docs.collect()}
    rows2 = [
        (900, base[5].upper()),   # same shingles as committed doc 5 → drop
        (901, " ".join(f"fresh{c} lexicon garden window morning" for c in "abcdefgh")),
    ]
    in2 = str(tmp_path / "cin2.parquet")
    spark.createDataFrame(rows2, "doc_id long, text string").write.parquet(in2)
    out2 = tmp_path / "cout2"
    run_curate(spark, in2, str(out2), dedup_mode="minhash", threshold=0.5,
               langs=(), num_buckets=2,
               gopher_overrides={"min_words": 1, "min_stopwords_present": 0,
                                 "max_top_2gram_char_frac": 1.0,
                                 "max_top_3gram_char_frac": 1.0,
                                 "max_top_4gram_char_frac": 1.0,
                                 "max_dup_line_char_frac": 1.0},
               against=str(out1 / "_index"))
    kept2 = sorted(r["doc_id"] for r in spark.read.parquet(str(out2 / "bucket=*")).collect())
    assert kept2 == [901]
    assert spark.read.parquet(str(out2 / "_index")).count() == n_idx1 + 1


def test_curate_job_fuzzy_decontamination_tier(spark, tmp_path):
    """--decon-fuzzy extends the exact tier: a doc whose text is a light
    EDIT of an eval doc (every shared n-gram run shorter than the exact
    probe needs) survives exact decontamination but is dropped by the
    fuzzy tier; clean docs survive both."""
    from jobs.curate_job import run_curate

    docs = _curate_docs(spark)
    # doc 6 edited: change every 13th word — no 13 consecutive original
    # words remain (kills every exact 13-gram, GPT-3 appendix C's n),
    # while ~10/13 of word-3-gram shingles survive → Jaccard ≈ 0.6
    words = docs.filter(F.col("doc_id") == 6).first()["text"].split()
    edited = " ".join(
        w if i % 13 else f"ed{i}" for i, w in enumerate(words)
    )
    ev = spark.createDataFrame(
        [(9000, edited), (9001, "nothing in common here at all")],
        "doc_id long, text string",
    )
    evp = str(tmp_path / "eval_f.parquet")
    ev.write.parquet(evp)
    inp = str(tmp_path / "in_f.parquet")
    docs.write.parquet(inp)

    # exact tier only: doc 6 survives (no 13-gram of the eval doc
    # appears verbatim anywhere in the corpus)
    out1 = tmp_path / "cur_exact"
    run_curate(spark, inp, str(out1), dedup_mode="exact", langs=("en",),
               num_buckets=2, decon_eval=evp, decon_n=13)
    ids1 = {r["doc_id"] for r in
            spark.read.parquet(str(out1 / "bucket=*")).select("doc_id").collect()}
    assert 6 in ids1

    # + fuzzy tier: doc 6 drops, its neighbors survive
    out2 = tmp_path / "cur_fuzzy"
    summary = run_curate(spark, inp, str(out2), dedup_mode="exact", langs=("en",),
                         num_buckets=2, decon_eval=evp, decon_n=13,
                         decon_fuzzy=0.5)
    ids2 = {r["doc_id"] for r in
            spark.read.parquet(str(out2 / "bucket=*")).select("doc_id").collect()}
    assert 6 not in ids2 and 5 in ids2 and 7 in ids2
    assert ids1 - ids2 == {6}
    assert summary["buckets_run"] == 2
    with open(str(out2 / "_contaminated") + ".meta.json") as f:
        assert json.load(f)["fuzzy"] == 0.5


def test_curate_job_shuffle_shards_layout(spark, tmp_path):
    """--shuffle-shards writes the deterministic trainer layout over the
    final survivors: every kept doc appears exactly once with a (shard,
    position) that is stable across re-runs; a new seed reorders."""
    from jobs.curate_job import run_curate

    docs = _curate_docs(spark)
    inp = str(tmp_path / "in_s.parquet")
    docs.write.parquet(inp)

    out = tmp_path / "cur_sh"
    summary = run_curate(spark, inp, str(out), dedup_mode="exact",
                         langs=("en",), num_buckets=2, shuffle_shards_n=4)
    kept = {r["doc_id"] for r in
            spark.read.parquet(str(out / "bucket=*")).select("doc_id").collect()}
    sh = spark.read.parquet(str(out / "_shards")).collect()
    assert {r["doc_id"] for r in sh} == kept
    assert summary["shuffled_docs"] == len(kept)
    assert {r["shard"] for r in sh} <= set(range(4))
    for shard in {r["shard"] for r in sh}:
        pos = sorted(r["position"] for r in sh if r["shard"] == shard)
        assert pos == list(range(len(pos)))

    # identical re-run (fresh dir) commits the identical layout
    out2 = tmp_path / "cur_sh2"
    run_curate(spark, inp, str(out2), dedup_mode="exact",
               langs=("en",), num_buckets=2, shuffle_shards_n=4)
    sh2 = spark.read.parquet(str(out2 / "_shards")).collect()
    key = lambda rows: sorted((r["doc_id"], r["shard"], r["position"]) for r in rows)
    assert key(sh2) == key(sh)

    # new epoch seed: same docs, different layout
    out3 = tmp_path / "cur_sh3"
    run_curate(spark, inp, str(out3), dedup_mode="exact",
               langs=("en",), num_buckets=2, shuffle_shards_n=4,
               shuffle_seed="shuffle-v1:epoch2")
    sh3 = spark.read.parquet(str(out3 / "_shards")).collect()
    assert {r["doc_id"] for r in sh3} == kept and key(sh3) != key(sh)


def test_curate_job_compress_gate(spark, tmp_path):
    """--compress-min-ratio drops template spam inside the bucketed
    transform: a doc that zlib-compresses below the bar disappears, prose
    survives, and the gate participates in the resume fingerprint."""
    from jobs.curate_job import run_curate

    prose = ("the quick brown fox jumps over the lazy dog and keeps moving "
             "through fresh words in every clause without repeating itself "
             "so that the compressor finds no structure to exploit at all ")
    rows = [(i, prose + f"unique tail {i} " + prose) for i in range(20)]
    rows += [(100 + i, "spam spam spam " * 120) for i in range(5)]
    inp = str(tmp_path / "docs.parquet")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(inp)

    out = tmp_path / "cur_z"
    run_curate(spark, inp, str(out), dedup_mode="exact", langs=("en",),
               num_buckets=2, compress_min_ratio=0.30)
    ids = {r["doc_id"] for r in
           spark.read.parquet(str(out / "bucket=*")).select("doc_id").collect()}
    assert ids and all(i < 100 for i in ids)

    # changed gate => changed fingerprint: a resume with a different ratio
    # must refuse rather than mix gate semantics across buckets
    import pytest as _pt
    with _pt.raises(Exception, match="fingerprint|params|refus"):
        run_curate(spark, inp, str(out), dedup_mode="exact", langs=("en",),
                   num_buckets=2, compress_min_ratio=0.50)


def test_curate_job_sentence_redact_decontamination(spark, tmp_path):
    """--decon-sentence-redact: a doc sharing one sentence with the eval
    set keeps its clean sentences (redacted text flows through the rest of
    the pipeline); a fully-leaked doc still drops; clean docs untouched."""
    from jobs.curate_job import run_curate

    leaked = ("The secret benchmark passage appears right here word for "
              "word in the training document today.")
    # every body word distinct → no repeated n-gram can trip gopher's
    # top-k-gram gates; >=50 words clears min_words even after redaction
    prose = ("The quiet maple forest holds seventeen distinct bird species "
             "and every spring that wide valley fills with fresh melting "
             "water which brings young foxes out to hunt along shallow "
             "creek banks while older animals rest beneath warm granite "
             "ledges watching pale clouds drift past tall peaks until dusk "
             "settles over meadows where deer graze quietly near cold "
             "streams flowing toward distant farms. ")
    rows = [(i, prose + f"Unique closing remark number {i} ends this note.")
            for i in range(12)]
    rows.append((50, prose + leaked))                     # partial leak
    rows.append((51, leaked))                             # full leak
    inp = str(tmp_path / "docs.parquet")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(inp)
    ev = str(tmp_path / "eval.parquet")
    spark.createDataFrame([(900, leaked)], "doc_id long, text string") \
        .write.parquet(ev)

    out = tmp_path / "cur_sr"
    run_curate(spark, inp, str(out), dedup_mode="exact", langs=("en",),
               num_buckets=2, decon_eval=ev, decon_sentence_redact=True)
    kept = {r["doc_id"]: r["text"] for r in
            spark.read.parquet(str(out / "bucket=*")).collect()}
    assert 51 not in kept                 # fully leaked → dropped
    assert 50 in kept                     # salvaged
    assert "secret benchmark" not in kept[50]
    assert "quiet maple forest" in kept[50]
    assert 0 in kept and "number 0" in kept[0]


def test_curate_job_c4_clean_and_token_budgets(spark, tmp_path):
    """--c4-clean scrubs bad lines / kills brace pages before the quality
    gate; --token-budgets admits docs per language until the token budget
    is exhausted and downstream packing sees only the admitted docs."""
    from jobs.curate_job import run_curate

    prose = ("The quiet maple forest holds seventeen distinct bird species "
             "and every spring that wide valley fills with fresh melting "
             "water which brings young foxes out to hunt along shallow "
             "creek banks while older animals rest beneath warm granite "
             "ledges watching pale clouds drift past tall peaks until dusk "
             "settles over meadows where deer graze quietly near cold "
             "streams flowing toward distant farms. One. Two. Three. Four.")
    rows = [(i, f"{prose} Unique closing remark number {i} ends this note.")
            for i in range(10)]
    rows.append((90, prose + "\nPlease enable javascript to view the page."))
    rows.append((91, prose + "\nconst cfg = { broken: true };"))  # brace kill
    inp = str(tmp_path / "docs.parquet")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(inp)

    out = tmp_path / "cur_c4b"
    summary = run_curate(spark, inp, str(out), dedup_mode="exact",
                         langs=("en",), num_buckets=2, c4_clean=True,
                         token_budgets={"en": 300}, pack_seq_len=64)
    kept = {r["doc_id"]: r["text"] for r in
            spark.read.parquet(str(out / "bucket=*")).collect()}
    assert 91 not in kept                          # brace page killed
    assert 90 in kept and "javascript" not in kept[90]
    # budget: per-language admitted token sum stays within the budget
    assert summary["budget_kept_tokens"]["en"] <= 300
    assert 0 < summary["budget_kept_docs"] < len(kept)
    admitted = set(r["doc_id"] for r in
                   spark.read.parquet(str(out / "_budget"))
                   .filter("kept").collect())
    packed = set(r["doc_id"] for r in
                 spark.read.parquet(str(out / "_packed")).collect())
    assert packed <= admitted                      # trainer stream ⊆ budget


def test_curate_job_host_templates(spark, tmp_path):
    """--host-template-frac: a per-host boilerplate line drops EVERYWHERE
    (not all-but-canonical like --line-dedup), a sub-threshold line
    survives, and composing with --line-dedup keeps canonical slots
    aligned (the index is built over the template-cleaned view)."""
    from jobs.curate_job import run_curate

    docs = _curate_docs(spark)
    # hostA = quality docs 0-19, hostB = 20-39: hostA pages all carry a nav
    # line; docs 0-2 also share a cross-host quote (line-dedup fodder);
    # doc 5 alone carries a rare promo line (below the 0.5 threshold)
    docs = docs.withColumn(
        "source",
        F.when(F.col("doc_id") < 20, F.lit("hostA")).otherwise(F.lit("hostB")),
    ).withColumn(
        "text",
        F.concat(
            F.when(F.col("doc_id") < 20, F.lit("hostA nav bar line\n")).otherwise(F.lit("")),
            F.when(F.col("doc_id") < 3, F.lit("famous shared quote line\n")).otherwise(F.lit("")),
            F.when(F.col("doc_id") == 5, F.lit("rare promo line\n")).otherwise(F.lit("")),
            F.col("text"),
        ),
    )
    inp = str(tmp_path / "in_ht.parquet")
    docs.write.parquet(inp)
    out = tmp_path / "cur_ht"
    run_curate(spark, inp, str(out), dedup_mode="exact", langs=("en",),
               num_buckets=4, line_dedup=True, host_template_frac=0.5)
    got = spark.read.parquet(str(out / "bucket=*"))
    texts = {r["doc_id"]: r["text"] for r in got.select("doc_id", "text").collect()}
    # template: every hostA occurrence gone, including doc 0's
    assert not any("hostA nav bar" in t for t in texts.values())
    # sub-threshold promo survives
    assert "rare promo line" in texts[5]
    # line dedup still keeps exactly one canonical quote occurrence —
    # and it must be doc 0's (canonical slots computed post-template-strip)
    n_quote = sum("famous shared quote" in t for t in texts.values())
    assert n_quote == 1 and "famous shared quote" in texts[0]


def test_curate_job_host_templates_requires_column(spark, tmp_path):
    from jobs.curate_job import run_curate

    docs = _curate_docs(spark)  # no source column
    inp = str(tmp_path / "in_ht2.parquet")
    docs.write.parquet(inp)
    with pytest.raises(ValueError, match="host-template-frac needs"):
        run_curate(spark, inp, str(tmp_path / "cur_ht2"), dedup_mode="exact",
                   langs=("en",), num_buckets=4, host_template_frac=0.5)
