"""Span pipeline core (north_rule): tokenize/classify → salted assembly.

Stage 1 — tokenize/classify (NARROW, JVM expressions):
    explode the span array → one row per span; compute per-span features
    (language, word count, link density, boilerplate flag). Exploding puts
    span-level work on span-level rows, so a 10^6-span mega-document is
    balanced across tasks instead of being one giant array in one row.

Stage 2 — span assembly (the one SHUFFLE, salted):
    groupBy(doc_id, salt) where salt = floor(offset / SPAN_SALT_CHUNK)
    pre-aggregates offset-contiguous chunks — a mega-document spreads over
    many reducers (AQE cannot split a skewed aggregation, so we salt
    explicitly, SURVEY.md §4). The cheap second groupBy(doc_id) merges the
    few pre-sorted chunks per document: chunks are sorted by salt and
    flattened — no re-sort of individual spans.

Boilerplate classifier (main-content extraction, Boilerpipe-style
NumWords/LinkDensity rules — Kohlschütter et al., WSDM 2010 — made
deterministic):
    a text span is boilerplate iff
      - its link density (chars inside <a …>…</a> tags / total chars) is
        > BOILERPLATE_MAX_LINK_DENSITY, or
      - it matches a nav/footer marker pattern (©, 'all rights reserved',
        cookie/privacy/menu prefixes), or
      - it has fewer than BOILERPLATE_MIN_WORDS words AND contains a link.
    media spans are never boilerplate (they are content by definition).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ocr_spark import config
from ocr_spark.functions.text import py_strip

_LINK_RE = r"<a[^>]*>.*?</a>"

_OUT_SPAN_TYPE = "array<struct<kind:string,text:string,media_ref:string,order:int>>"


def link_density(text: Column) -> Column:
    """Chars inside anchor tags / total chars (0.0 for empty)."""
    t = F.coalesce(text, F.lit(""))
    link_chars = F.aggregate(
        F.regexp_extract_all(t, F.lit(_LINK_RE), 0),
        F.lit(0),
        lambda acc, m: acc + F.length(m),
    )
    return F.when(F.length(t) > 0, link_chars.cast("double") / F.length(t)).otherwise(F.lit(0.0))


def word_count(text: Column) -> Column:
    s = py_strip(text)
    return F.when(s == "", F.lit(0)).otherwise(F.size(F.split(s, r"(?U)\s+")))


def is_boilerplate(text: Column) -> Column:
    """Deterministic Boilerpipe-style rule set (module docstring)."""
    ld = link_density(text)
    wc = word_count(text)
    marker = py_strip(text).rlike(config.BOILERPLATE_MARKER_PATTERN)
    return (
        (ld > config.BOILERPLATE_MAX_LINK_DENSITY)
        | marker
        | ((wc < config.BOILERPLATE_MIN_WORDS) & (ld > 0.0))
    )


def classify_spans(docs: DataFrame) -> DataFrame:
    """Stage 1: explode + per-span features. Narrow — no shuffle.

    Input:  (doc_id, spans array<struct<kind,text,media_ref,offset>>)
    Output: (doc_id, kind, text, media_ref, offset, is_boilerplate)
    """
    exploded = docs.select("doc_id", F.explode("spans").alias("span")).select(
        "doc_id", "span.kind", "span.text", "span.media_ref", "span.offset"
    )
    return exploded.withColumn(
        "is_boilerplate",
        F.when(F.col("kind") == "media", F.lit(False)).otherwise(is_boilerplate(F.col("text"))),
    )


def assemble_spans(
    classified: DataFrame,
    drop_boilerplate: bool = True,
    salt_chunk: int = config.SPAN_SALT_CHUNK,
    big_doc_spans: int | None = config.BIG_DOC_SPANS,
) -> DataFrame:
    """Stage 2: reassembly into ordered span sequences — hybrid salting.

    Output: (doc_id, spans array<struct<kind,text,media_ref,order>>)
    with order = 0-based rank of offset among the document's kept spans —
    the span-sequence-equality contract (kind, text, media_ref, order).

    Skew strategy (measured in tools/skew_bench.py): the salted two-phase
    aggregation costs a second full-data shuffle (~3× overhead on normal
    corpora) but is the only thing keeping a 10^6+-span mega-document from
    owning one reducer (2.1× faster at 3M spans, and an OOM-guard beyond).
    So documents are routed by span count: normal docs take the single
    groupBy path, only docs above ``big_doc_spans`` take the salted path.
    The big-doc id set is long-tail by definition → broadcastable; the
    count pre-pass shuffles one (doc_id, n) row per document.
    Set ``big_doc_spans=None`` to force everything through the salted path.

    Cost model: the hybrid re-evaluates the upstream (scan+classify) for
    the count pass and each branch — cheaper than the extra full-data
    shuffle when upstream is parquet scan + expressions (measured, 2.5×),
    but if upstream is an EXPENSIVE Arrow-UDF stage (OCR, image decode),
    persist/checkpoint the classified frame first, or pass
    ``big_doc_spans=None`` to keep the single-scan two-shuffle plan.
    """
    kept = classified.filter(~F.col("is_boilerplate")) if drop_boilerplate else classified

    if big_doc_spans is not None:
        counts = kept.groupBy("doc_id").agg(F.count(F.lit(1)).alias("__n"))
        big_ids = counts.filter(F.col("__n") > big_doc_spans).select(
            "doc_id", F.lit(True).alias("__big")
        )
        flagged = kept.join(F.broadcast(big_ids), "doc_id", "left")
        small = _assemble_single_phase(flagged.filter(F.col("__big").isNull()).drop("__big"))
        big = _assemble_salted(flagged.filter(F.col("__big")).drop("__big"), salt_chunk)
        return small.unionByName(big)
    return _assemble_salted(kept, salt_chunk)


def _assemble_single_phase(kept: DataFrame) -> DataFrame:
    """One shuffle: groupBy(doc_id) + sort inside the aggregation. Tie
    order for duplicate offsets is the full (offset, kind, text, media_ref)
    tuple — identical to the chunked path."""
    merged = kept.groupBy("doc_id").agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("offset").alias("offset"),
                    F.col("kind").alias("kind"),
                    F.col("text").alias("text"),
                    F.col("media_ref").alias("media_ref"),
                )
            )
        ).alias("ordered")
    )
    return merged.select(
        "doc_id",
        F.transform(
            F.col("ordered"),
            lambda s, i: F.struct(
                s["kind"].alias("kind"),
                s["text"].alias("text"),
                s["media_ref"].alias("media_ref"),
                i.cast("int").alias("order"),
            ),
        ).cast(_OUT_SPAN_TYPE).alias("spans"),
    )


def _assemble_salted(kept: DataFrame, salt_chunk: int) -> DataFrame:
    chunked = (
        kept.withColumn("salt", (F.col("offset") / F.lit(salt_chunk)).cast("long"))
        .groupBy("doc_id", "salt")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("offset").alias("offset"),
                        F.col("kind").alias("kind"),
                        F.col("text").alias("text"),
                        F.col("media_ref").alias("media_ref"),
                    )
                )
            ).alias("chunk")
        )
    )

    merged = chunked.groupBy("doc_id").agg(
        F.flatten(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("salt").alias("salt"), F.col("chunk").alias("chunk"))),
                    lambda a, b: F.when(a["salt"] < b["salt"], F.lit(-1))
                    .when(a["salt"] > b["salt"], F.lit(1))
                    .otherwise(F.lit(0)),
                ),
                lambda s: s["chunk"],
            )
        ).alias("ordered")
    )

    return merged.select(
        "doc_id",
        F.transform(
            F.col("ordered"),
            lambda s, i: F.struct(
                s["kind"].alias("kind"),
                s["text"].alias("text"),
                s["media_ref"].alias("media_ref"),
                i.cast("int").alias("order"),
            ),
        ).cast(_OUT_SPAN_TYPE).alias("spans"),
    )


def span_language_runs(
    docs: DataFrame, id_col: str = "doc_id", spans_col: str = "spans"
) -> DataFrame:
    """Language segmentation of interleaved documents: contiguous runs of
    same-language TEXT spans (per-span language from the pdf-path line
    heuristic, functions.text.line_language) become segments — the
    multilingual-curation unit (per-segment language filters, translation-
    pair mining, per-language token budgets) for corpora where documents
    interleave languages mid-stream. Media spans are transparent: they
    neither carry a language nor break a run.

    Plan: explode → per-span language (pure expressions) → gaps-and-
    islands with two per-document windows (lag-change flag, running sum) —
    window keys are doc-level, so skew follows document size, which the
    corpus's mega-doc handling already bounds upstream.

    Returns (doc_id, run_id, lang, n_spans, first_offset, last_offset,
    text = space-joined run text)."""
    from ocr_spark.functions.text import line_language

    rows = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(spans_col).alias("s")
    ).select(
        "doc_id",
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.offset").alias("offset"),
    )
    txt = rows.filter(F.col("kind") != "media").withColumn(
        "lang", line_language(F.col("text"))
    )
    w = Window.partitionBy("doc_id").orderBy("offset")
    flagged = txt.withColumn(
        "chg",
        F.when(
            F.lag("lang").over(w).isNull() | (F.lag("lang").over(w) != F.col("lang")),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn(
        "run_id",
        F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
    )
    return flagged.groupBy("doc_id", "run_id").agg(
        # every span in a run shares lang by construction; min() is the
        # deterministic pick (first() is order-dependent after a shuffle)
        F.min("lang").alias("lang"),
        F.count(F.lit(1)).cast("long").alias("n_spans"),
        F.min("offset").cast("long").alias("first_offset"),
        F.max("offset").cast("long").alias("last_offset"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("offset", "text"))),
                lambda s: s["text"],
            ),
        ).alias("text"),
    )


def spans_to_markdown(
    docs: DataFrame, id_col: str = "doc_id", spans_col: str = "spans"
) -> DataFrame:
    """Render interleaved documents as markdown — the trainer/reader
    export format for the extraction pipeline's output: text spans become
    paragraphs (blank-line separated), media spans become image links
    (``![media](ref)``) at their exact interleave position, so the
    document reads top-to-bottom exactly as extracted. Pure array
    expressions over the span array — no explode, no shuffle; ordering is
    the spans' own offset order (assembly already sorted them).

    Returns (doc_id, markdown, n_text, n_media)."""
    spans = F.col(spans_col)
    sorted_spans = F.array_sort(
        F.transform(
            spans,
            lambda s: F.struct(
                s["offset"].alias("offset"),
                s["kind"].alias("kind"),
                s["text"].alias("text"),
                s["media_ref"].alias("media_ref"),
            ),
        )
    )
    rendered = F.transform(
        sorted_spans,
        lambda s: F.when(
            s["kind"] == "media",
            F.concat(F.lit("!["), s["kind"], F.lit("]("),
                     F.coalesce(s["media_ref"], F.lit("")), F.lit(")")),
        ).otherwise(F.coalesce(s["text"], F.lit(""))),
    )
    n_of = lambda k: F.size(F.filter(spans, lambda s: s["kind"] == k))  # noqa: E731
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.array_join(F.filter(rendered, lambda t: t != ""), "\n\n").alias("markdown"),
        n_of("text").cast("long").alias("n_text"),
        F.size(F.filter(spans, lambda s: s["kind"] == "media")).cast("long").alias("n_media"),
    )


# --- span-level quality gate (C4 line rules on the interleaved shape) --------

# C4's line-level blocklist (Raffel 2020 §2.2: "javascript", boilerplate
# notices) plus the lorem-ipsum rule; applied per SPAN so one bad
# paragraph never condemns the whole interleaved document
C4_SPAN_BLOCKLIST_RE = (
    r"(?i)javascript|lorem ipsum|all rights reserved|copyright"
)
TERMINAL_PUNCT_RE = r'[.!?"]\s*$'


def filter_spans_quality(
    docs: DataFrame,
    id_col: str = "doc_id",
    spans_col: str = "spans",
    min_words: int = 3,
    require_terminal_punct: bool = False,
) -> DataFrame:
    """Span-level quality gate on the interleaved corpus: C4's line rules
    (>= min_words words, no curly braces — code/JSON fragments, none of the
    blocklist phrases, optionally terminal punctuation) applied per TEXT
    span, dropping failing spans WITHOUT flattening the document — the
    clean-in-place complement to document-level ``c4_filters``. Media spans
    carry no text to judge; a media RUN (consecutive media spans) survives
    iff the nearest text span on either side of the run survived — the same
    keep policy ``boilerplate.html_to_spans`` uses at extraction time, so a
    figure illustrating a kept paragraph stays and a gallery stranded in
    dropped boilerplate goes. Surviving spans re-rank densely.

    Plan shape: pure array expressions per row — span classification is one
    transform, run adjacency is TWO LINEAR ``F.aggregate`` folds (forward /
    backward nearest-non-media state, the jusText scan discipline: features
    materialize once as columns, folds read them, nothing re-evaluates per
    element), then one posexplode. No join, no shuffle; skew is bounded by
    document size like every span operator.

    Returns exploded kept spans (doc_id, kind, text, media_ref, ord)."""
    spans = F.col(spans_col)
    ss = F.array_sort(
        F.transform(
            spans,
            lambda s: F.struct(
                s["offset"].alias("offset"),
                s["kind"].alias("kind"),
                s["text"].alias("text"),
                s["media_ref"].alias("media_ref"),
            ),
        )
    )

    def passes(t: Column) -> Column:
        t = F.coalesce(t, F.lit(""))
        ok = (
            (word_count(t) >= min_words)
            & ~t.rlike(r"[{}]")
            & ~t.rlike(C4_SPAN_BLOCKLIST_RE)
        )
        if require_terminal_punct:
            ok = ok & t.rlike(TERMINAL_PUNCT_RE)
        return ok

    # cls: 2 = media, 1 = kept text, 0 = dropped text — over the
    # MATERIALIZED ss column, so classification runs once per span
    cls = F.transform(
        F.col("ss"),
        lambda s: F.when(s["kind"] == "media", F.lit(2))
        .when(passes(s["text"]), F.lit(1))
        .otherwise(F.lit(0)),
    )

    def scan_nearest(cls_col: Column) -> Column:
        """prefix array: state of the nearest non-media element BEFORE
        each position (-1 when none) — one linear fold."""
        init = F.struct(
            F.array().cast("array<int>").alias("arr"), F.lit(-1).alias("last")
        )
        return F.aggregate(
            cls_col,
            init,
            lambda acc, c: F.struct(
                F.concat(acc["arr"], F.array(acc["last"])).alias("arr"),
                F.when(c != 2, c).otherwise(acc["last"]).alias("last"),
            ),
            lambda acc: acc["arr"],
        )

    d1 = docs.select(F.col(id_col).alias("doc_id"), ss.alias("ss")).select(
        "doc_id", "ss", cls.alias("cls")
    )
    d2 = d1.select(
        "doc_id",
        "ss",
        "cls",
        scan_nearest(F.col("cls")).alias("prev"),
        F.reverse(scan_nearest(F.reverse(F.col("cls")))).alias("nxt"),
    )
    keep = F.transform(
        F.col("ss"),
        lambda s, i: F.when(F.col("cls")[i] == 1, F.lit(True))
        .when(
            (F.col("cls")[i] == 2)
            & ((F.col("prev")[i] == 1) | (F.col("nxt")[i] == 1)),
            F.lit(True),
        )
        .otherwise(F.lit(False)),
    )
    kept = F.filter(
        F.zip_with(F.col("ss"), keep, lambda s, k: F.when(k, s)),
        lambda x: x.isNotNull(),
    )
    return d2.select("doc_id", F.posexplode(kept).alias("ord", "s")).select(
        "doc_id",
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"),
        F.col("ord").cast("long").alias("ord"),
    )


def coalesce_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    spans_col: str = "spans",
    joiner: str = "\n",
    big_doc_spans: int | None = config.BIG_DOC_SPANS,
) -> DataFrame:
    """Span-sequence normalization for the interleaved shape: drop
    whitespace-only text spans, merge runs of ADJACENT text spans into one
    span (texts joined by ``joiner``, media_ref of the first), keep media
    spans as-is, reindex order 0..n-1 — the canonicalization pass between
    an extractor (whose DOM walk emits fragmented text nodes) and
    everything downstream that assumes one span per content block
    (packing, dedup, markdown render).

    Input:  (id_col, spans array<struct<kind,text,media_ref,offset>>)
    Output: (id_col, spans array<struct<kind,text,media_ref,order>>)

    Canonical span order is (offset, kind, text, media_ref) — the same
    total order as :func:`assemble_spans`' tie rule.

    Plan: hybrid on ``size(spans)``, routed NARROWLY (the array length is
    already in the row — no count pre-pass, unlike assemble_spans):

    - normal docs: one expression chain per row — array_sort → filter →
      linear fold (F.aggregate) that either appends a span or replaces the
      accumulator's tail with the concatenated text span. ZERO shuffle;
      the fold's slice+concat tail-rewrite is O(runs·spans) element copies
      per doc, fine below the routing threshold.
    - mega-docs (> ``big_doc_spans`` spans): the quadratic fold and the
      one-giant-array row are exactly what to avoid, so they explode to
      span rows, window over (doc_id | order by the canonical key) marks
      text-run starts (lag(kind)), a running sum assigns run ids, one
      groupBy(doc_id, run) merges each run, and the existing
      single-phase assembly rebuilds the array. The per-doc window puts a
      mega-doc on one task for the flag pass — linear work, the same
      bound as its final array materialization.

    Both paths produce identical sequences (pytest crosses them on the
    same input). Duplicate (offset, kind, text, media_ref) tuples are
    merged in canonical order on both paths."""
    spans = F.coalesce(
        F.col(spans_col),
        F.array().cast(
            "array<struct<kind:string,text:string,media_ref:string,offset:int>>"
        ),
    )
    n_spans = F.size(spans)

    # --- small path: pure expressions, no shuffle --------------------------
    ordered = F.sort_array(
        F.transform(
            spans,
            lambda s: F.struct(
                s["offset"].alias("offset"),
                s["kind"].alias("kind"),
                s["text"].alias("text"),
                s["media_ref"].alias("media_ref"),
            ),
        )
    )
    kept_arr = F.filter(
        ordered,
        lambda s: (s["kind"] == "media") | (py_strip(s["text"]) != ""),
    )
    merged_arr = F.aggregate(
        kept_arr,
        F.array().cast("array<struct<kind:string,text:string,media_ref:string>>"),
        lambda acc, s: F.when(
            (s["kind"] == "text")
            & (F.size(acc) > 0)
            & (F.element_at(acc, -1)["kind"] == "text"),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(
                    F.struct(
                        F.lit("text").alias("kind"),
                        F.concat(
                            F.element_at(acc, -1)["text"], F.lit(joiner), s["text"]
                        ).alias("text"),
                        F.element_at(acc, -1)["media_ref"].alias("media_ref"),
                    )
                ),
            ),
        ).otherwise(
            F.concat(
                acc,
                F.array(
                    F.struct(
                        s["kind"].alias("kind"),
                        s["text"].alias("text"),
                        s["media_ref"].alias("media_ref"),
                    )
                ),
            )
        ),
    )
    out_spans = F.transform(
        merged_arr,
        lambda s, i: F.struct(
            s["kind"].alias("kind"),
            s["text"].alias("text"),
            s["media_ref"].alias("media_ref"),
            i.cast("int").alias("order"),
        ),
    ).cast(_OUT_SPAN_TYPE)

    if big_doc_spans is None:
        return docs.select(F.col(id_col).alias("doc_id"), out_spans.alias("spans"))

    small = docs.filter(n_spans <= big_doc_spans).select(
        F.col(id_col).alias("doc_id"), out_spans.alias("spans")
    )

    # --- big path: explode + window + run merge -----------------------------
    big_docs = docs.filter(n_spans > big_doc_spans).select(
        F.col(id_col).alias("doc_id")
    )
    ex = (
        docs.filter(n_spans > big_doc_spans)
        .select(F.col(id_col).alias("doc_id"), F.explode(spans_col).alias("s"))
        .select("doc_id", "s.kind", "s.text", "s.media_ref", "s.offset")
        .filter((F.col("kind") == "media") | (py_strip(F.col("text")) != ""))
    )
    w = Window.partitionBy("doc_id").orderBy("offset", "kind", "text", "media_ref")
    runs = (
        ex.withColumn(
            "__st",
            F.when(
                (F.col("kind") == "media")
                | F.lag("kind").over(w).isNull()
                | (F.lag("kind").over(w) == "media"),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn(
            "__run",
            F.sum("__st").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    grouped = (
        runs.groupBy("doc_id", "__run")
        .agg(
            F.min("kind").alias("kind"),
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("offset").alias("offset"),
                        F.col("text").alias("text"),
                        F.col("media_ref").alias("media_ref"),
                    )
                )
            ).alias("__parts"),
        )
        .select(
            "doc_id",
            "kind",
            F.array_join(
                F.transform(F.col("__parts"), lambda p: p["text"]), joiner
            ).alias("text"),
            F.col("__parts")[0]["media_ref"].alias("media_ref"),
            F.col("__parts")[0]["offset"].alias("offset"),
        )
    )
    # a mega-doc whose spans ALL drop still owes an empty-sequence row
    # (the small path emits one; explode would silently lose the doc)
    big = big_docs.join(_assemble_single_phase(grouped), "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("spans"), F.array().cast(_OUT_SPAN_TYPE)).alias("spans"),
    )
    return small.unionByName(big)


def truncate_spans(
    docs: DataFrame,
    max_tokens: int = 2048,
    media_tokens: int = 256,
    id_col: str = "doc_id",
    spans_col: str = "spans",
) -> DataFrame:
    """Context-window truncation at SPAN granularity on the interleaved
    shape: keep the canonical-ordered prefix of spans whose cumulative
    token cost fits ``max_tokens``, drop the tail whole — no mid-span cut
    (a torn sentence, or an image whose budget was charged but whose
    tokens never arrive, is worse than a slightly shorter document).
    Token accounting is pack_interleaved's: text spans cost their BPE-ish
    sub-token count, media spans a fixed ``media_tokens`` budget.

    One narrow expression chain per document: sort the spans array by the
    canonical (offset, kind, text, media_ref) key, one LINEAR fold
    carries (running total, kept-prefix length) — the running total is
    monotone, so the kept count is a prefix property and never needs a
    second pass — then slice. No explode, no shuffle.

    Returns exploded kept spans with their cost:
    (doc_id, kind, text, media_ref, ord, span_tokens). Documents whose
    FIRST span already exceeds the budget emit no rows."""
    from ocr_spark.operators.textstats import token_count_bpe

    spans = F.coalesce(
        F.col(spans_col),
        F.array().cast(
            "array<struct<kind:string,text:string,media_ref:string,offset:int>>"
        ),
    )
    ordered = F.sort_array(
        F.transform(
            spans,
            lambda s: F.struct(
                s["offset"].alias("offset"),
                s["kind"].alias("kind"),
                s["text"].alias("text"),
                s["media_ref"].alias("media_ref"),
            ),
        )
    )

    def cost(s):
        return (
            F.when(s["kind"] == "text", token_count_bpe(s["text"]).cast("long"))
            .otherwise(F.lit(int(media_tokens)).cast("long"))
        )

    kept_n = F.aggregate(
        ordered,
        F.struct(
            F.lit(0).cast("long").alias("cum"), F.lit(0).cast("int").alias("n")
        ),
        lambda acc, s: F.struct(
            (acc["cum"] + cost(s)).alias("cum"),
            (
                acc["n"]
                + F.when(acc["cum"] + cost(s) <= max_tokens, 1).otherwise(0)
            ).cast("int").alias("n"),
        ),
        lambda acc: acc["n"],
    )
    kept = F.slice(ordered, 1, kept_n)
    out = F.transform(
        kept,
        lambda s, i: F.struct(
            s["kind"].alias("kind"),
            s["text"].alias("text"),
            s["media_ref"].alias("media_ref"),
            i.cast("long").alias("ord"),
            cost(s).alias("span_tokens"),
        ),
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(out).alias("s"))
        .select(
            "doc_id", "s.kind", "s.text", "s.media_ref", "s.ord", "s.span_tokens"
        )
    )


def span_kind_transitions(
    docs: DataFrame,
    id_col: str = "doc_id",
    spans_col: str = "spans",
) -> DataFrame:
    """Corpus-level span-KIND transition statistics over the interleave
    order — the Markov profile of how text and media alternate (the
    text→image→text rhythm an interleaved training mix is tuned against,
    cf. OBELICS, Laurençon et al. 2023 §3). Each document contributes the
    adjacent-kind pairs of its canonically ordered span sequence, with BOS
    / EOS sentinels so document boundaries count as transitions too.

    Plan shape: per row, one sort + one zip_with of the kinds array with
    its own shift builds the pair list — narrow, no explode until pairs
    exist, skew bounded by document size. The ONLY shuffle is the final
    groupBy over (src_kind, dst_kind): at most (k+2)^2 groups for k span
    kinds, so the aggregation is all map-side partials into a handful of
    reducer rows, and the per-src window runs on that tiny result.
    Documents with an empty span array contribute nothing.

    Returns (src_kind, dst_kind, n, p_milli) — p_milli the integer-exact
    floor((n*1000)/total outgoing from src): milli-probabilities stay
    BIGINT, never IEEE, so the row is engine-portable by construction."""
    spans = F.col(spans_col)
    kinds = F.transform(
        F.array_sort(
            F.transform(
                spans,
                lambda s: F.struct(
                    s["offset"].alias("offset"), s["kind"].alias("kind")
                ),
            )
        ),
        lambda s: s["kind"],
    )
    ks = F.concat(F.array(F.lit("BOS")), kinds, F.array(F.lit("EOS")))
    pairs = F.zip_with(
        F.slice(ks, 1, F.size(ks) - 1),
        F.slice(ks, 2, F.size(ks) - 1),
        lambda a, b: F.struct(a.alias("src_kind"), b.alias("dst_kind")),
    )
    cnt = (
        docs.filter(F.size(spans) > 0)
        .select(F.explode(pairs).alias("p"))
        .groupBy(
            F.col("p.src_kind").alias("src_kind"),
            F.col("p.dst_kind").alias("dst_kind"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return cnt.select(
        "src_kind",
        "dst_kind",
        "n",
        F.expr("(n * 1000L) DIV sum(n) OVER (PARTITION BY src_kind)")
        .cast("long")
        .alias("p_milli"),
    )


# OBELICS-shape interleaved document gate (Laurençon et al. 2023 §3.3's
# spirit, deterministic constants): a document is a useful interleaved
# training example iff it has at least one media span but is not a gallery
# (media count / density capped), no long uninterrupted media run, and
# enough actual text to ground the media.
INTERLEAVE_MAX_MEDIA = 32
INTERLEAVE_MAX_MEDIA_RUN = 4
INTERLEAVE_MIN_WORDS = 10


def _interleave_features(ss: Column) -> dict[str, Column]:
    """(n_spans, n_media, words, max_media_run) off a sorted
    (offset, kind, text) struct array — works on a materialized column or
    a bind_once-bound lambda variable alike."""
    n_spans = F.size(ss).cast("long")
    n_media = F.size(F.filter(ss, lambda s: s["kind"] == "media")).cast("long")
    words = F.aggregate(
        ss,
        F.lit(0).cast("long"),
        lambda acc, s: acc
        + F.when(s["kind"] == "media", F.lit(0)).otherwise(
            word_count(s["text"]).cast("long")
        ),
    )
    run = F.aggregate(
        ss,
        F.struct(
            F.lit(0).cast("long").alias("cur"), F.lit(0).cast("long").alias("best")
        ),
        lambda acc, s: F.struct(
            F.when(s["kind"] == "media", acc["cur"] + 1)
            .otherwise(F.lit(0).cast("long"))
            .alias("cur"),
            F.greatest(
                acc["best"],
                F.when(s["kind"] == "media", acc["cur"] + 1).otherwise(
                    F.lit(0).cast("long")
                ),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    return {"n_spans": n_spans, "n_media": n_media, "words": words, "max_media_run": run}


def _interleave_keep(
    f: dict[str, Column], max_media: int, max_media_run: int, min_words: int
) -> Column:
    return (
        (f["n_media"] >= 1)
        & (f["n_media"] <= max_media)
        & (f["max_media_run"] <= max_media_run)
        & (f["words"] >= min_words)
        & (f["n_media"] * 2 <= f["n_spans"])
    )


def _sorted_spans(spans: Column) -> Column:
    return F.array_sort(
        F.transform(
            spans,
            lambda s: F.struct(
                s["offset"].alias("offset"),
                s["kind"].alias("kind"),
                s["text"].alias("text"),
            ),
        )
    )


def interleave_keep_expr(
    spans_col: str = "spans",
    max_media: int = INTERLEAVE_MAX_MEDIA,
    max_media_run: int = INTERLEAVE_MAX_MEDIA_RUN,
    min_words: int = INTERLEAVE_MIN_WORDS,
) -> Column:
    """:func:`filter_interleaved_docs`'s keep verdict as ONE per-row
    boolean expression — the gating form a pipeline uses in a filter()
    with no join and no second pass over the corpus (extract_job
    --interleave-gate). The sorted span array is bind_once-bound so the
    sort never re-runs per fold. Empty span arrays gate to False."""
    from ocr_spark.operators.textstats import bind_once

    def keep(ss: Column) -> Column:
        f = _interleave_features(ss)
        return (f["n_spans"] > 0) & _interleave_keep(
            f, max_media, max_media_run, min_words
        )

    return bind_once(_sorted_spans(F.col(spans_col)), keep)


def filter_interleaved_docs(
    docs: DataFrame,
    id_col: str = "doc_id",
    spans_col: str = "spans",
    max_media: int = INTERLEAVE_MAX_MEDIA,
    max_media_run: int = INTERLEAVE_MAX_MEDIA_RUN,
    min_words: int = INTERLEAVE_MIN_WORDS,
) -> DataFrame:
    """Document-level interleave gate: per-doc structural features plus the
    keep verdict, computed WITHOUT dropping rows so the reject reasons stay
    auditable (the curation report reads the flags; the pipeline filters on
    `keep`). keep := 1 <= n_media <= max_media AND the longest consecutive
    media run <= max_media_run AND total text words >= min_words AND media
    spans are at most half of all spans (2*n_media <= n_spans).

    Plan shape: everything is per-row array expressions over the sorted
    kinds — counts via filter/size, words via one aggregate fold of
    word_count, the longest media run via one linear (cur, best) fold. NO
    shuffle, no explode, no join; a mega-document costs its own array
    length and nothing else. Documents with empty span arrays are excluded
    (they are not interleaved documents at all).

    Returns (doc_id, n_spans, n_text, n_media, words, max_media_run, keep).
    """
    spans = F.col(spans_col)
    d = docs.filter(F.size(spans) > 0).select(
        F.col(id_col).alias("doc_id"), _sorted_spans(spans).alias("ss")
    )
    f = _interleave_features(F.col("ss"))
    out = d.select(
        "doc_id",
        f["n_spans"].alias("n_spans"),
        (f["n_spans"] - f["n_media"]).alias("n_text"),
        f["n_media"].alias("n_media"),
        f["words"].alias("words"),
        f["max_media_run"].alias("max_media_run"),
    )
    return out.select(
        "*",
        _interleave_keep(
            {
                "n_spans": F.col("n_spans"),
                "n_media": F.col("n_media"),
                "words": F.col("words"),
                "max_media_run": F.col("max_media_run"),
            },
            max_media,
            max_media_run,
            min_words,
        ).alias("keep"),
    )
