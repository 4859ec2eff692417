"""spark-submit entry point: end-to-end training-corpus curation.

One resumable job composing the pipeline a 100 TB pretraining-data pass
actually runs, in the canonical order (cheap row-local filters after the
one global decision, so rejected docs never pay the later stages twice):

  0. text repair        — (--fix-text) ftfy-lite normalization (control
                          chars, typographic quotes/dashes, NBSP, blank
                          runs) BEFORE dedup, so two spellings of the
                          same page hash equal
  1. near-dup removal   — corpus-wide loser set (exact / minhash /
                          minhash-cc), computed ONCE and materialized
  1b. line dedup        — (--line-dedup) cross-document repeated-line
                          removal via a second materialized global index
                          (line_md5 → canonical occurrence)
  1b2. substr dedup     — (--substr-k N) exact repeated-substring removal
                          (Lee et al. 2021 ExactSubstr): every N-token
                          window repeated anywhere survives only at its
                          canonical occurrence; the marks table is a
                          materialized global decision like the line index
  1c. decontamination   — (--decon-eval PATH) drop training docs sharing
                          any word n-gram with the eval corpus; the
                          contaminated-id set is the third global
                          decision, materialized once. With
                          --decon-sentence-redact the exact tier instead
                          REDACTS the contaminated sentences and keeps the
                          doc (fully-leaked docs still drop)
  1h. C4 line cleanup   — (--c4-clean) the published C4 line-shape
                          filters (terminal punct, >=3 words, javascript
                          lines) + page kills (lorem ipsum, curly brace,
                          <5 sentences), applied first in the bucketed
                          transform; later stages see the cleaned text
  2. quality gate       — Gopher rules (repetition + shape)
  3. language filter    — stopword-profile language ID against --langs
  4. blocklist gate     — (--blocklist a,b,c) whole-word term filter
                          (applied to the RAW text, before redaction)
  1d. LM quality filter — (--lm-max-bits X) drop docs whose average
                          bigram surprisal under the corpus-trained LM
                          exceeds X bits (the CCNet perplexity-filter
                          shape); the model/score pass is the fourth
                          global decision, materialized once
  1f. DSIR selection   — (--dsir-target PATH --dsir-min-avg-bits X)
                          importance selection (Xie 2023): drop docs whose
                          hashed-n-gram distribution is less target-like
                          than X bits/feature; fifth materialized global
                          decision
  1e. classifier filter — (--cls-weights PATH --cls-min-score X) drop
                          docs scoring below X under a trained
                          hashed-feature linear classifier (the
                          FineWeb-Edu/DCLM model-filter shape); doc-local
                          once the broadcast weights load, so it runs
                          inside the bucketed transform
  1g. compression gate  — (--compress-min-ratio X) drop docs whose zlib
                          ratio falls below X (too compressible =
                          template spam); doc-local, inside the bucketed
                          transform
  4b. domain gate       — (--blocked-domains a.com,b.net) drop docs whose
                          in-text URLs hit a blocked domain or subdomain
  5. PII redaction      — URL/email/IP/phone → typed tokens
  5b. temperature mix   — (--mix-cap N) post-pass over the committed
                          survivors: per-language sqrt-rate downsampling
                          (τ=0.5 mixing) decided by the seeded doc hash,
                          written to _mix; packing then packs only the
                          mixed-in docs
  5c. token budgets     — (--token-budgets en=N,ru=M) post-pass over the
                          (mixed-in) survivors: per-language token-budget
                          selection in seeded-hash order written to
                          _budget; pack/shuffle/publish see only the
                          admitted docs
  6. sequence packing   — (--pack-seq-len N) post-pass over the committed
                          survivors: concat-and-chunk layout (doc →
                          training-sequence spans) written to _packed,
                          materialize-once so a resumed job reuses it
  6b. trainer shuffle   — (--shuffle-shards N) deterministic global
                          shuffle layout over the final survivors:
                          (doc_id, shard, position) written to _shards;
                          a new epoch is a new --shuffle-seed
  7. corpus report      — (--report) one-row statistics artifact over the
                          committed survivors (doc/token totals, exact
                          length quantiles, small-range-corrected HLL
                          distinct-content estimate) written to _report

    python tools/make_package.py
    spark-submit --master local[32] --py-files dist/ocr_spark.zip \\
        jobs/curate_job.py --input .../documents.parquet --output /tmp/cur \\
        --dedup minhash-cc --threshold 0.8 --langs en,ru --buckets 16

Stages 2-5 are doc-local (their groupBys key on doc_id), so they run
inside the per-bucket transform and resume for free; the dedup, line
and contamination decisions are global, each materialized under the
output dir exactly once (resume-pinned, parameter-fingerprinted).
Output rows: (doc_id, lang, text = redacted, n_words, n_redactions);
with --pack-seq-len, ``_packed`` additionally holds (doc_id, shard,
n_tokens, tok_start, seq_start, seq_end, crosses_boundary) over the
REDACTED text — the token stream a trainer would actually see.
"""

from __future__ import annotations

import argparse
import json


def curate_transform(part, langs, line_index=None, blocklist=(), blocked_domains=(),
                     cls_weights=None, cls_min_score=None, gopher_overrides=None,
                     substr_marks_df=None, substr_k=50,
                     compress_min_ratio=None, c4_clean=False,
                     ht_index=None, host_col="source"):
    """Bucket-local stages 1b-5: C4 line cleanup -> line dedup ->
    language ID -> quality gate (language-aware: English-only Gopher
    rules gate only en docs) -> language filter -> blocklist + domain
    gates (raw text) -> PII redaction (last)."""
    from pyspark.sql import functions as F

    from ocr_spark.operators.dedup import apply_line_dedup
    from ocr_spark.operators.textstats import (
        blocklist_flag,
        domain_flag,
        gopher_quality,
        language_id,
        pii_scrub,
    )

    if c4_clean:
        # the published C4 order: line-shape filters on the raw page first
        # (terminal punctuation, >=3 words, javascript lines; lorem-ipsum/
        # curly-brace/min-sentence page kills). Doc-local, so it rides the
        # bucketed transform; later stages (incl. line dedup — cleaned
        # lines are verbatim trimmed raw lines, so the global index still
        # matches) see the cleaned text.
        from ocr_spark.operators.textstats import c4_line_filters

        c4 = c4_line_filters(F.col("text"))
        part = part.filter(c4["c4_pass"]).withColumn("text", c4["clean_text"])
    if ht_index is not None:
        # site-boilerplate removal BEFORE line dedup: content-keyed
        # (host, md5(trim(line))), so it composes position-independently;
        # the line index was computed over the template-cleaned view so
        # canonical (doc, pos) slots line up
        from ocr_spark.operators.dedup import apply_host_templates

        part = apply_host_templates(part, ht_index, host_col=host_col).drop(
            "n_template_removed"
        )
    if line_index is not None:
        part = apply_line_dedup(part, line_index)
    if substr_marks_df is not None:
        from ocr_spark.operators.textstats import apply_substr_dedup

        part = apply_substr_dedup(part, substr_marks_df, k=substr_k)
    if cls_min_score is not None:
        # doc-local (per-doc hash + broadcast weights): no global decision,
        # so it rides the bucketed transform and resumes for free
        from ocr_spark.operators.textstats import classifier_score

        good = classifier_score(part, weights=cls_weights).filter(
            F.col("score") >= cls_min_score
        ).select("doc_id")
        part = part.join(good, "doc_id")
    if compress_min_ratio is not None:
        # doc-local like the classifier gate (one mapInPandas pass, no
        # global state) so it rides the bucketed transform and resumes free
        from ocr_spark.operators.textstats import compression_ratio

        incompressible = compression_ratio(part).filter(
            F.col("zlib_ratio_micro") >= int(compress_min_ratio * 1_000_000)
        ).select("doc_id")
        part = part.join(incompressible, "doc_id")
    # language first: the Gopher stop-word / alpha-word rules are
    # English-specific, so the gate must know each doc's language or a
    # --langs ru / de / fr corpus is silently wiped out at stage 2.
    part = part.withColumn("lang", language_id(F.col("text")))
    q = (
        gopher_quality(part, lang_col="lang", **(gopher_overrides or {}))
        .filter(F.col("quality_pass"))
        .select("doc_id", "n_words")
    )
    kept = part.join(q, "doc_id")
    if langs:
        kept = kept.filter(F.col("lang").isin(list(langs)))
    if blocklist:
        kept = kept.filter(~blocklist_flag(F.col("text"), tuple(blocklist))["blocked"])
    if blocked_domains:
        # on the RAW text like the term gate — pii_scrub replaces every
        # URL with <URL> in the final select, which would blind this stage
        kept = kept.filter(
            ~domain_flag(F.col("text"), tuple(blocked_domains))["blocked"]
        )
    p = pii_scrub(F.col("text"))
    return kept.select(
        "doc_id",
        "lang",
        p["redacted"].alias("text"),
        "n_words",
        (p["n_url"] + p["n_email"] + p["n_ip"] + p["n_phone"]).alias("n_redactions"),
    )


def run_curate(
    spark,
    input_path: str,
    output_dir: str,
    dedup_mode: str = "minhash-cc",
    threshold: float = 0.8,
    langs: tuple[str, ...] = (),
    num_buckets: int = 16,
    fail_after: int | None = None,
    line_dedup: bool = False,
    host_template_frac: float | None = None,
    host_col: str = "source",
    host_template_min_docs: int = 5,
    blocklist: tuple[str, ...] = (),
    blocked_domains: tuple[str, ...] = (),
    input_format: str = "parquet",
    html_extractor: str = "boilerpipe",
    respect_noindex: bool = False,
    decon_eval: str | None = None,
    decon_format: str | None = None,
    decon_n: int = 5,
    decon_fuzzy: float | None = None,
    decon_sentence_redact: bool = False,
    pack_seq_len: int | None = None,
    pack_shards: int = 8,
    shuffle_shards_n: int | None = None,
    shuffle_seed: str = "shuffle-v1",
    lm_max_bits: float | None = None,
    dsir_target: str | None = None,
    dsir_target_format: str | None = None,
    dsir_min_avg_bits: float | None = None,
    mix_cap: int | None = None,
    do_fix_text: bool = False,
    cls_weights_path: str | None = None,
    cls_min_score: float | None = None,
    compress_min_ratio: float | None = None,
    gopher_overrides: dict | None = None,
    substr_k: int | None = None,
    c4_clean: bool = False,
    token_budgets: dict[str, int] | None = None,
    report: bool = False,
    against: str | None = None,
    write_index: bool = False,
    publish_table: str | None = None,
) -> dict:
    import os

    from pyspark.sql import functions as F

    from ocr_spark.operators.dedup import corpus_dedup_losers, dup_line_index
    from ocr_spark.operators.textstats import (
        decontaminate,
        dsir_importance,
        lm_surprisal,
        pack_sequences,
        substr_marks,
        temperature_sample,
    )
    from ocr_spark.plans.checkpoint import materialize_once, run_checkpointed
    from ocr_spark.sources import jsonl as J

    loaded = J.load_documents(
        spark, input_path, input_format, html_extractor=html_extractor,
        respect_noindex=respect_noindex,
    )
    keep_cols = ["doc_id", "text"]
    if host_template_frac is not None:
        if host_col not in loaded.columns:
            raise ValueError(
                f"--host-template-frac needs a {host_col!r} column on the "
                f"input (got {loaded.columns}) — pass --host-col or drop "
                "the stage; guessing a host would silently template-strip "
                "across unrelated sites"
            )
        keep_cols.append(host_col)
    docs = loaded.select(*keep_cols)
    if do_fix_text:
        # repair FIRST: dedup/LM/line hashing must see the normalized
        # bytes or two spellings of one page ("…" vs "...") never collide.
        # A narrow projection (no shuffle) — it rides every later pass.
        from ocr_spark.operators.textstats import fix_text

        docs = docs.select(
            *[c for c in keep_cols if c != "text"],
            fix_text(F.col("text"))["fixed"].alias("text"),
        )
    if input_format == "warc":
        # the warc chain (gunzip + record framing + boilerplate strip) is
        # a heavy Python pass; unmaterialized, the bucketed runner and
        # every global side input would re-parse every archive per bucket.
        # Parquet/jsonl/csv scans are cheap JVM reads and stay lazy.
        docs = materialize_once(
            spark, docs, os.path.join(output_dir, "_ingest"),
            meta={"stage": "warc_ingest", "input": input_path, "fix_text": do_fix_text,
                  "respect_noindex": respect_noindex},
        )
    if against:
        # incremental drop: dedup against the previously committed corpus
        # via its saved minhash index (old text never re-read, old docs
        # always win) — same contract as jobs/dedup_job.py --against
        from ocr_spark.operators.dedup import dedup_losers_incremental, minhash_index

        new_index = materialize_once(
            spark, minhash_index(docs), os.path.join(output_dir, "_new_index"),
            meta={"stage": "new_index", "input": input_path, "fix_text": do_fix_text},
        )
        losers = materialize_once(
            spark,
            dedup_losers_incremental(
                new_index, spark.read.parquet(against),
                mode=dedup_mode, threshold=threshold,
            ).select(F.col("id").alias("doc_id")),
            os.path.join(output_dir, "_losers"),
            meta={"mode": dedup_mode, "threshold": threshold, "input": input_path,
                  "fix_text": do_fix_text, "against": against},
        )
    else:
        losers = materialize_once(
            spark,
            corpus_dedup_losers(docs, mode=dedup_mode, threshold=threshold),
            os.path.join(output_dir, "_losers"),
            meta={"mode": dedup_mode, "threshold": threshold, "input": input_path,
                  "fix_text": do_fix_text},
        )
    from ocr_spark.operators.dedup import release_feature_caches

    release_feature_caches()  # the losers parquet replaces the live plan
    ht_index = None
    if host_template_frac is not None:
        # global decision like the loser set: the per-host line frequency
        # spans buckets, computed over the DEDUPED corpus (a near-dup
        # flood must not vote its own boilerplate past the threshold)
        from ocr_spark.operators.dedup import apply_host_templates, host_template_index

        ht_index = materialize_once(
            spark,
            host_template_index(
                docs.join(losers, "doc_id", "left_anti"),
                host_col=host_col,
                min_frac=host_template_frac,
                min_docs=host_template_min_docs,
            ),
            os.path.join(output_dir, "_host_templates"),
            meta={"stage": "host_templates", "input": input_path,
                  "mode": dedup_mode, "threshold": threshold,
                  "fix_text": do_fix_text, "frac": host_template_frac,
                  "min_docs": host_template_min_docs, "host_col": host_col},
        )
    line_index = None
    if line_dedup:
        # global like the loser set: the canonical-occurrence decision
        # spans buckets, so it materializes once over the DEDUPED corpus
        # (losers removed first — a dropped document must not claim a
        # line's canonical slot). With host templates on, the index is
        # built over the TEMPLATE-CLEANED view: apply_line_dedup keys on
        # (canonical_doc_id, canonical_pos), and template removal shifts
        # line positions — built raw, every doc that lost a template line
        # would see its canonical slots misaligned.
        pre_l = docs.join(losers, "doc_id", "left_anti")
        if ht_index is not None:
            pre_l = apply_host_templates(pre_l, ht_index, host_col=host_col).drop(
                "n_template_removed"
            )
        line_index = materialize_once(
            spark,
            dup_line_index(pre_l),
            os.path.join(output_dir, "_dup_lines"),
            meta={"stage": "line_dedup", "input": input_path, "mode": dedup_mode,
                  "threshold": threshold, "fix_text": do_fix_text,
                  "host_templates": host_template_frac},
        )

    substr_marks_df = None
    if substr_k:
        # global like the line index: a window's canonical occurrence may
        # live in any bucket, so the marks table spans buckets and
        # materializes once over the DEDUPED corpus (a dropped near-dup
        # must not claim a window's canonical slot). Crucially the marks
        # are TOKEN POSITIONS into the text the bucketed transform will
        # rewrite — and curate_transform applies line dedup BEFORE substr
        # dedup — so with --line-dedup the marks must be computed over the
        # line-deduped view: built on the raw text they'd stamp shifted
        # windows in every doc that lost a line (the dup window survives
        # and innocent tokens die).
        pre = docs.join(losers, "doc_id", "left_anti")
        if ht_index is not None:
            from ocr_spark.operators.dedup import apply_host_templates as _aht

            pre = _aht(pre, ht_index, host_col=host_col).drop("n_template_removed")
        if line_index is not None:
            from ocr_spark.operators.dedup import apply_line_dedup

            pre = apply_line_dedup(pre, line_index)
        substr_marks_df = materialize_once(
            spark,
            substr_marks(pre, k=substr_k),
            os.path.join(output_dir, "_substr_marks"),
            meta={"stage": "substr_dedup", "k": substr_k, "input": input_path,
                  "mode": dedup_mode, "threshold": threshold,
                  "fix_text": do_fix_text, "line_dedup": line_dedup,
                  "host_templates": host_template_frac},
        )

    contaminated = None
    redactions = None
    if decon_eval:
        # global decision #3: the eval grams span buckets. Computed over
        # the DEDUPED corpus (fewer docs to probe) and materialized so a
        # 16-bucket run builds the broadcast probe once, not 16×.
        # the eval corpus has its OWN format (--decon-format): benchmark
        # sets routinely arrive as parquet next to a jsonl training crawl,
        # and parsing parquet bytes as jsonl quarantines every "line" —
        # decontamination silently becomes a no-op. The empty-eval guard
        # below turns that class of mistake into a loud failure.
        ev = J.load_documents(
            spark, decon_eval, decon_format or input_format
        ).select("doc_id", "text")
        # limit(1).collect(), not count(): count() prunes every data column
        # so a jsonl scan would reference ONLY the corrupt-record column,
        # which Spark refuses (QUERY_ONLY_CORRUPT_RECORD_COLUMN)
        if not ev.limit(1).collect():
            raise ValueError(
                f"decontamination eval corpus at {decon_eval} parsed to zero "
                f"valid rows (format {decon_format or input_format!r}) — wrong "
                "--decon-format? refusing to run a no-op decontamination"
            )
        redactions = None
        if decon_sentence_redact:
            # salvage tier: the EXACT-gram hits redact sentences instead of
            # dropping docs — the side table carries (doc_id, clean_text)
            # for contaminated docs only (leak-scale, not corpus-scale);
            # fully-leaked docs surface as clean_text = '' and drop in the
            # bucketed transform
            from ocr_spark.operators.textstats import decontaminate_sentences

            redactions = materialize_once(
                spark,
                decontaminate_sentences(
                    docs.join(losers, "doc_id", "left_anti"), ev, n=decon_n
                )
                .filter(F.col("n_contaminated") > 0)
                .select("doc_id", "clean_text"),
                os.path.join(output_dir, "_redactions"),
                meta={"stage": "decon_redact", "eval": decon_eval, "n": decon_n,
                      "mode": dedup_mode, "threshold": threshold,
                      "input": input_path, "fix_text": do_fix_text},
            )
            dec = spark.createDataFrame([], "doc_id long")  # exact tier drops nothing
        else:
            dec = (
                decontaminate(docs.join(losers, "doc_id", "left_anti"), ev, n=decon_n)
                .filter(F.col("contaminated"))
                .select("doc_id")
            )
        if decon_fuzzy is not None:
            # fuzzy tier: ALSO drop near-dups of eval docs (paraphrased
            # leakage the exact n-gram probe misses); same eval corpus,
            # broadcast index, corpus never self-joins
            from ocr_spark.operators.dedup import decontaminate_fuzzy

            dec = dec.unionByName(
                decontaminate_fuzzy(
                    docs.join(losers, "doc_id", "left_anti"),
                    ev,
                    jaccard_threshold=decon_fuzzy,
                )
                .filter(F.col("leaked"))
                .select("doc_id")
            ).distinct()
        contaminated = materialize_once(
            spark,
            dec,
            os.path.join(output_dir, "_contaminated"),
            meta={"stage": "decontaminate", "eval": decon_eval, "n": decon_n,
                  "fuzzy": decon_fuzzy,
                  "mode": dedup_mode, "threshold": threshold, "input": input_path,
                  "fix_text": do_fix_text},
        )

    lm_losers = None
    if lm_max_bits is not None:
        # global decision #4: the bigram model's counts span buckets. The
        # model trains on the DEDUPED corpus (a near-dup cluster would
        # otherwise vote its own bigrams "predictable" and smuggle junk
        # under the threshold), and the scored loser ids materialize once.
        lm_losers = materialize_once(
            spark,
            lm_surprisal(docs.join(losers, "doc_id", "left_anti"))
            .filter(F.col("avg_bits") > lm_max_bits)
            .select("doc_id"),
            os.path.join(output_dir, "_lm_losers"),
            meta={"stage": "lm_filter", "max_bits": lm_max_bits,
                  "mode": dedup_mode, "threshold": threshold, "input": input_path,
                  "fix_text": do_fix_text},
        )
        release_feature_caches()  # the losers parquet replaces the gram cache

    dsir_losers = None
    if dsir_target:
        if dsir_min_avg_bits is None:
            raise ValueError(
                "--dsir-target was given without --dsir-min-avg-bits: the "
                "DSIR stage is gated on the threshold, so the target corpus "
                "would load and silently never select anything — pass "
                "--dsir-min-avg-bits (or drop the target)"
            )
        # global decision #5: DSIR importance selection (Xie 2023) — keep
        # docs whose hashed-n-gram distribution looks at least
        # dsir_min_avg_bits/feature more like the TARGET corpus than like
        # the raw pool. Both bucket models span the corpus, so the scored
        # loser ids materialize once; scoring runs on the DEDUPED pool for
        # the same reason as the LM filter (a near-dup cluster would
        # inflate its own raw-model probability and shift its own ratio).
        tgt = J.load_documents(
            spark, dsir_target, dsir_target_format or input_format
        ).select("doc_id", "text")
        if not tgt.limit(1).collect():
            raise ValueError(
                f"DSIR target corpus at {dsir_target} parsed to zero valid "
                f"rows (format {dsir_target_format or input_format!r}) — "
                "wrong --dsir-target-format? refusing a no-op selection"
            )
        dsir_losers = materialize_once(
            spark,
            dsir_importance(docs.join(losers, "doc_id", "left_anti"), tgt)
            .filter(F.col("avg_bits") < dsir_min_avg_bits)
            .select("doc_id"),
            os.path.join(output_dir, "_dsir_losers"),
            meta={"stage": "dsir", "target": dsir_target,
                  "min_avg_bits": dsir_min_avg_bits,
                  "mode": dedup_mode, "threshold": threshold,
                  "input": input_path, "fix_text": do_fix_text},
        )
        release_feature_caches()  # the losers parquet replaces the feature cache

    if cls_weights_path and cls_min_score is None:
        raise ValueError(
            "--cls-weights was given without --cls-min-score: the classifier "
            "stage is gated on the threshold, so the weights would load and "
            "silently never be applied — pass --cls-min-score (or drop the "
            "weights)"
        )
    cls_weights = (
        spark.read.parquet(cls_weights_path) if cls_weights_path else None
    )

    def transform(part):
        part = part.join(losers, "doc_id", "left_anti")
        if redactions is not None:
            part = (
                part.join(redactions, "doc_id", "left")
                .withColumn("text", F.coalesce(F.col("clean_text"), F.col("text")))
                .drop("clean_text")
                .filter(F.col("text") != "")
            )
        if contaminated is not None:
            part = part.join(contaminated, "doc_id", "left_anti")
        if lm_losers is not None:
            part = part.join(lm_losers, "doc_id", "left_anti")
        if dsir_losers is not None:
            part = part.join(dsir_losers, "doc_id", "left_anti")
        return curate_transform(part, langs, line_index, blocklist, blocked_domains,
                                cls_weights, cls_min_score, gopher_overrides,
                                substr_marks_df, substr_k or 50,
                                compress_min_ratio, c4_clean,
                                ht_index, host_col)

    summary = run_checkpointed(
        spark,
        docs,
        output_dir,
        transform,
        num_buckets=num_buckets,
        input_lineage=input_path,
        fail_after=fail_after,
        job_params={
            "dedup_mode": dedup_mode,
            "threshold": threshold,
            "langs": list(langs),
            "line_dedup": line_dedup,
            "host_template_frac": host_template_frac,
            "host_col": host_col,
            "blocklist": list(blocklist),
            "blocked_domains": list(blocked_domains),
            "html_extractor": html_extractor,
            "decon_eval": decon_eval,
            "decon_n": decon_n,
            "decon_fuzzy": decon_fuzzy,
            "decon_sentence_redact": decon_sentence_redact,
            "lm_max_bits": lm_max_bits,
            "dsir_target": dsir_target,
            "dsir_min_avg_bits": dsir_min_avg_bits,
            "fix_text": do_fix_text,
            "cls_weights": cls_weights_path,
            "cls_min_score": cls_min_score,
            "compress_min_ratio": compress_min_ratio,
            "gopher_overrides": gopher_overrides,
            "substr_k": substr_k,
            "c4_clean": c4_clean,
            "against": against,
        },
    )

    if report:
        # post-pass over the committed survivors, like mix/pack: one row of
        # corpus statistics a data team reads before training. Composes the
        # engine's sketch/report primitives — exact length quantiles (rank
        # statistics, no approx_percentile) and an HLL estimate of DISTINCT
        # text payloads (content diversity after all the dedup stages) —
        # and pins the result with materialize_once so a resumed job
        # reports the bytes it actually committed.
        from ocr_spark.operators.dedup import hll_estimate, hll_registers
        from ocr_spark.operators.textstats import length_quantiles, token_count_ws

        kept = spark.read.parquet(os.path.join(output_dir, "bucket=*"))
        totals = kept.agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(token_count_ws(F.col("text")).cast("long")).cast("long").alias("n_tokens"),
        )
        lq = length_quantiles(kept).agg(
            *[
                F.max(F.when(F.col("q") == q, F.col("n_chars")))
                .cast("long")
                .alias(f"p{int(q * 100)}_chars")
                for q in (0.5, 0.9, 0.99)
            ]
        )
        distinct_est = hll_estimate(
            hll_registers(
                kept.select(F.md5(F.coalesce(F.col("text"), F.lit(""))).alias("v")), "v"
            ),
            small_range_correct=True,  # reports need the linear-counting fix
        ).select(F.col("estimate").alias("distinct_text_est"))
        # order-independent content digest: two runs (or a resumed run)
        # committed byte-identical survivor corpora iff this matches
        from ocr_spark.operators.textstats import corpus_digest

        digest = corpus_digest(kept).select(F.col("digest").alias("content_digest"))
        rep = materialize_once(
            spark,
            totals.crossJoin(lq).crossJoin(distinct_est).crossJoin(digest),
            os.path.join(output_dir, "_report"),
            meta={"stage": "report", "input": input_path, "fix_text": do_fix_text},
        )
        summary = dict(summary)
        summary["report"] = {k: v for k, v in rep.first().asDict().items()}

    mixed_kept = None
    if mix_cap:
        # mixing is a post-pass like packing: the per-language counts are
        # over the FINAL survivors, which only the committed output knows.
        # The decision itself is the seeded doc hash, so _mix is stable
        # across resumes; materialize_once pins it regardless.
        kept = spark.read.parquet(os.path.join(output_dir, "bucket=*"))
        mixed = materialize_once(
            spark,
            temperature_sample(kept, "lang", cap=mix_cap),
            os.path.join(output_dir, "_mix"),
            meta={"stage": "mix", "cap": mix_cap, "input": input_path,
                  "fix_text": do_fix_text},
        )
        mixed_kept = mixed.filter(F.col("kept")).select("doc_id")
        summary = dict(summary)
        summary["mix_kept_docs"] = mixed_kept.count()

    if token_budgets:
        # per-language TOKEN budgets over the final (mixed-in) survivors —
        # the trainer's "N tokens of en, M of ru" mixture. Decided by the
        # seeded doc hash like _mix, so _budget is stable across resumes;
        # downstream stages (pack/shuffle/publish) see only the docs the
        # budget admitted, exactly like the mixer's contract.
        from ocr_spark.operators.textstats import budget_sample

        kept = spark.read.parquet(os.path.join(output_dir, "bucket=*"))
        if mixed_kept is not None:
            kept = kept.join(mixed_kept, "doc_id")
        bsel = materialize_once(
            spark,
            budget_sample(kept, token_budgets, source_col="lang"),
            os.path.join(output_dir, "_budget"),
            meta={"stage": "budget", "budgets": dict(sorted(token_budgets.items())),
                  "input": input_path, "mix_cap": mix_cap, "fix_text": do_fix_text},
        )
        budget_kept = bsel.filter(F.col("kept"))
        summary = dict(summary)
        summary["budget_kept_docs"] = budget_kept.count()
        summary["budget_kept_tokens"] = {
            r["source"]: r["toks"]
            for r in budget_kept.groupBy("source")
            .agg(F.sum("n_tokens").cast("long").alias("toks"))
            .collect()
        }
        # downstream survivor set = budget-admitted docs (already ⊆ mix)
        mixed_kept = budget_kept.select("doc_id")

    if pack_seq_len:
        # packing is a LAYOUT over the final survivors, so it must see the
        # committed output (post-redaction text = the trainer's stream).
        # materialize_once gives resumed jobs the identical layout bytes.
        # With --mix-cap, "survivors" means the mixed-in docs: the trainer
        # never sees a doc the mixer dropped, so it must not occupy tokens.
        kept = spark.read.parquet(os.path.join(output_dir, "bucket=*"))
        if mixed_kept is not None:
            kept = kept.join(mixed_kept, "doc_id")
        packed = materialize_once(
            spark,
            pack_sequences(kept, seq_len=pack_seq_len, num_shards=pack_shards),
            os.path.join(output_dir, "_packed"),
            meta={"stage": "pack", "seq_len": pack_seq_len, "shards": pack_shards,
                  "input": input_path, "mix_cap": mix_cap, "fix_text": do_fix_text},
        )
        summary = dict(summary)
        summary["packed_docs"] = packed.count()
        summary["packed_sequences"] = int(
            packed.groupBy("shard")
            .agg(F.max(F.col("tok_start") + F.col("n_tokens")).alias("toks"))
            .agg(
                F.sum(F.expr(f"(toks + {pack_seq_len} - 1) div {pack_seq_len}"))
            )
            .first()[0]
            or 0
        )
    if shuffle_shards_n:
        # trainer-shuffle layout over the final (mixed-in) survivors:
        # deterministic (shard, position) per doc_id — the global shuffle
        # a trainer would otherwise do with an RNG; a resumed job or a
        # re-run at any cluster size commits the identical layout, and a
        # new epoch is a new --shuffle-seed
        from ocr_spark.operators.textstats import shuffle_shards

        kept = spark.read.parquet(os.path.join(output_dir, "bucket=*"))
        if mixed_kept is not None:
            kept = kept.join(mixed_kept, "doc_id")
        shards = materialize_once(
            spark,
            shuffle_shards(
                kept.select("doc_id"), n_shards=shuffle_shards_n,
                seed=shuffle_seed,
            ),
            os.path.join(output_dir, "_shards"),
            meta={"stage": "shuffle", "n_shards": shuffle_shards_n,
                  "seed": shuffle_seed, "input": input_path,
                  "mix_cap": mix_cap, "fix_text": do_fix_text},
        )
        summary = dict(summary)
        summary["shuffled_docs"] = shards.count()
    if publish_table:
        # publish the final survivors as the consumable table layout
        # (plans/table.py): hive-partitioned by lang, range-clustered by
        # doc_id, file-level min/max stats in an atomically-renamed
        # snapshot manifest. Overwrite-mode data write + atomic manifest
        # swap make re-publish idempotent: a reader holds the previous
        # snapshot until the new one is fully committed. With --mix-cap
        # the published table contains only the mixed-in docs — same
        # survivors contract as packing.
        from ocr_spark.plans.table import write_partitioned

        kept = spark.read.parquet(os.path.join(output_dir, "bucket=*"))
        if mixed_kept is not None:
            kept = kept.join(mixed_kept, "doc_id")
        manifest = write_partitioned(
            kept, publish_table, partition_cols=("lang",), stats_col="doc_id"
        )
        summary = dict(summary)
        summary["published"] = {
            "path": publish_table,
            "files": len(manifest["files"]),
            "rows": int(sum(f["rows"] for f in manifest["files"])),
        }

    # chainable dedup index for the NEXT drop: the survivors' ids with
    # their PRE-redaction (post fix-text) content — the output text is
    # PII-redacted, and the next drop arrives raw, so indexing redacted
    # bytes would silently stop matching any document containing PII.
    # Opt-in (write_index / implied by against): O(total shingles) is
    # wasted cost and storage for a one-shot curation.
    if write_index or against:
        from ocr_spark.operators.dedup import minhash_index

        survivor_ids = spark.read.parquet(
            os.path.join(output_dir, "bucket=*")
        ).select("doc_id")
        kept_index = minhash_index(docs.join(survivor_ids, "doc_id"))
        if against:
            kept_index = spark.read.parquet(against).unionByName(kept_index)
        materialize_once(
            spark, kept_index, os.path.join(output_dir, "_index"),
            meta={"stage": "index", "input": input_path, "against": against,
                  "mode": dedup_mode, "threshold": threshold,
                  "fix_text": do_fix_text},
        )
        release_feature_caches()
    return summary


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="documents parquet (doc_id, text)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--dedup", choices=("exact", "minhash", "minhash-cc"), default="minhash-cc")
    ap.add_argument("--threshold", type=float, default=0.8)
    ap.add_argument("--langs", default="", help="comma-separated allowlist; empty = keep all")
    ap.add_argument("--buckets", type=int, default=16)
    ap.add_argument("--fail-after", type=int, default=None, help="fault injection (tests)")
    ap.add_argument("--host-template-frac", type=float, default=None, metavar="FRAC",
                    help="per-host template-line removal: a line on >= FRAC of a "
                         "host's pages (hosts with >= --host-template-min-docs "
                         "pages) drops everywhere; needs --host-col on the input")
    ap.add_argument("--host-col", default="source",
                    help="host/site column for --host-template-frac (default: source)")
    ap.add_argument("--host-template-min-docs", type=int, default=5)
    ap.add_argument("--line-dedup", action="store_true",
                    help="also drop cross-document repeated lines (C4-style)")
    ap.add_argument("--blocklist", default="",
                    help="comma-separated blocked terms (whole-word); empty = off")
    ap.add_argument("--blocked-domains", default="",
                    help="comma-separated blocked URL domains (subdomains match); "
                         "empty = off")
    ap.add_argument("--format", choices=("parquet", "orc", "jsonl", "csv", "warc"), default="parquet",
                    help="input corpus format (jsonl/csv quarantine malformed records)")
    ap.add_argument("--decon-eval", default=None,
                    help="eval/benchmark corpus path; drops training docs sharing "
                         "any --decon-n-gram with it")
    ap.add_argument("--decon-format", choices=("parquet", "orc", "jsonl", "csv"), default=None,
                    help="format of --decon-eval (default: same as --format)")
    ap.add_argument("--html-extractor",
                    choices=("boilerpipe", "readability", "justext"),
                    default="boilerpipe",
                    help="main-content extractor for --format warc ingest")
    ap.add_argument("--respect-noindex", action="store_true",
                    help="drop pages whose robots meta says noindex (or"
                         " none) at --format warc ingest, before"
                         " extraction — the corpus-entry hygiene rule")
    ap.add_argument("--decon-sentence-redact", action="store_true",
                    help="redact contaminated SENTENCES (exact-gram tier) "
                         "instead of dropping whole docs; fully-leaked docs "
                         "still drop")
    ap.add_argument("--decon-fuzzy", type=float, default=None, metavar="JACCARD",
                    help="also drop near-dups of eval docs at this MinHash "
                         "Jaccard threshold (fuzzy decontamination tier)")
    ap.add_argument("--decon-n", type=int, default=5)
    ap.add_argument("--pack-seq-len", type=int, default=None,
                    help="also write the concat-and-chunk packing layout to _packed")
    ap.add_argument("--shuffle-shards", type=int, default=None, metavar="N",
                    help="also write the deterministic trainer-shuffle "
                         "(shard, position) layout to _shards")
    ap.add_argument("--shuffle-seed", default="shuffle-v1",
                    help="epoch seed for --shuffle-shards")
    ap.add_argument("--pack-shards", type=int, default=8)
    ap.add_argument("--dsir-target", default=None,
                    help="curated target corpus for DSIR importance "
                         "selection (Xie 2023); requires --dsir-min-avg-bits")
    ap.add_argument("--dsir-target-format", choices=("parquet", "orc", "jsonl", "csv"),
                    default=None, help="target corpus format (default: --format)")
    ap.add_argument("--dsir-min-avg-bits", type=float, default=None,
                    help="drop docs whose avg integer-bit DSIR log ratio vs "
                         "the target is below this")
    ap.add_argument("--lm-max-bits", type=float, default=None,
                    help="drop docs whose avg bigram surprisal under the "
                         "corpus-trained LM exceeds this (CCNet-style filter)")
    ap.add_argument("--mix-cap", type=int, default=None,
                    help="temperature-0.5 language mixing: buckets above this "
                         "doc count downsample at sqrt-rate (written to _mix)")
    ap.add_argument("--c4-clean", action="store_true",
                    help="C4 line-shape cleanup (terminal-punct/>=3-word/"
                         "javascript line filters; lorem-ipsum, curly-brace "
                         "and <5-sentence page kills) before the quality gate")
    ap.add_argument("--token-budgets", default=None, metavar="L=N,L2=M",
                    help="per-language TOKEN budgets over the final survivors "
                         "(e.g. en=3000000,ru=800000): docs taken in seeded-"
                         "hash order until each budget is exhausted (written "
                         "to _budget); languages absent from the list drop")
    ap.add_argument("--fix-text", action="store_true",
                    help="ftfy-lite text repair before any hashing/dedup")
    ap.add_argument("--cls-weights", default=None,
                    help="parquet of trained (bucket, weight) classifier "
                         "rows; omit to use the demo weight formula")
    ap.add_argument("--cls-min-score", type=float, default=None,
                    help="drop docs scoring below this under the hashed "
                         "linear classifier")
    ap.add_argument("--compress-min-ratio", type=float, default=None,
                    metavar="RATIO",
                    help="drop docs whose zlib compression ratio falls "
                         "below RATIO (too compressible = template spam); "
                         "e.g. 0.30")
    ap.add_argument("--substr-k", type=int, default=None,
                    help="exact repeated-substring removal: delete every "
                         "N-token window repeated anywhere in the corpus "
                         "except its canonical occurrence")
    ap.add_argument("--against", default=None,
                    help="path to a previous curate/dedup run's _index: "
                         "dedup this drop against the committed corpus "
                         "(old docs always win) without re-reading its text")
    ap.add_argument("--write-index", action="store_true",
                    help="export _index for a future --against run "
                         "(implied by --against)")
    ap.add_argument("--publish-table", default=None,
                    help="also publish the survivors as a hive-partitioned "
                         "(lang), range-clustered (doc_id) parquet table "
                         "with a min/max snapshot manifest at this path")
    ap.add_argument("--report", action="store_true",
                    help="write a one-row corpus statistics report to "
                         "_report (doc/token totals, exact length "
                         "quantiles, HLL distinct-content estimate)")
    ap.add_argument("--gopher", default=None,
                    help="JSON dict of gopher_quality threshold overrides, "
                         "e.g. '{\"min_words\": 20}' (published defaults "
                         "otherwise; part of the resume fingerprint)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("ocr-spark-curate").getOrCreate()
    summary = run_curate(
        spark,
        args.input,
        args.output,
        dedup_mode=args.dedup,
        threshold=args.threshold,
        langs=tuple(x for x in args.langs.split(",") if x),
        num_buckets=args.buckets,
        fail_after=args.fail_after,
        line_dedup=args.line_dedup,
        host_template_frac=args.host_template_frac,
        host_col=args.host_col,
        host_template_min_docs=args.host_template_min_docs,
        blocklist=tuple(x for x in args.blocklist.split(",") if x),
        blocked_domains=tuple(x for x in args.blocked_domains.split(",") if x),
        input_format=args.format,
        html_extractor=args.html_extractor,
        respect_noindex=args.respect_noindex,
        decon_eval=args.decon_eval,
        decon_format=args.decon_format,
        decon_n=args.decon_n,
        decon_fuzzy=args.decon_fuzzy,
        decon_sentence_redact=args.decon_sentence_redact,
        pack_seq_len=args.pack_seq_len,
        pack_shards=args.pack_shards,
        shuffle_shards_n=args.shuffle_shards,
        shuffle_seed=args.shuffle_seed,
        lm_max_bits=args.lm_max_bits,
        dsir_target=args.dsir_target,
        dsir_target_format=args.dsir_target_format,
        dsir_min_avg_bits=args.dsir_min_avg_bits,
        mix_cap=args.mix_cap,
        do_fix_text=args.fix_text,
        cls_weights_path=args.cls_weights,
        cls_min_score=args.cls_min_score,
        compress_min_ratio=args.compress_min_ratio,
        gopher_overrides=json.loads(args.gopher) if args.gopher else None,
        substr_k=args.substr_k,
        c4_clean=args.c4_clean,
        token_budgets=(
            {k: int(v) for k, v in
             (kv.split("=", 1) for kv in args.token_budgets.split(","))}
            if args.token_budgets else None
        ),
        report=args.report,
        against=args.against,
        write_index=args.write_index,
        publish_table=args.publish_table,
    )
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
