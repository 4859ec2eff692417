"""Physical-plan audit: prints .explain('formatted') for the flagship and
headline queries and flags plan smells (missing broadcast on small sides,
cartesian products, row-at-a-time Python UDFs in the hot path, scans that
read every column).

Usage: python tools/explain_audit.py [query ...]
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout

sys.path.insert(0, ".")

SMELLS = (
    ("CartesianProduct", "cartesian product (unbounded pair blowup)"),
    ("BroadcastNestedLoopJoin", "nested-loop join (theta-join materializing pair rows)"),
    ("BatchEvalPython", "row-at-a-time Python UDF in the plan"),
    ("SortMergeJoin", "sort-merge join — check whether a broadcast was possible"),
)

# reviewed flags: smell hits that are intentional plan shapes, with why
ACCEPTED = {
    ("ann_topk_bruteforce", "BroadcastNestedLoopJoin"): (
        "bounded num_blocks×1 crossJoin: corpus blocks × the single "
        "collect_list-folded query-matrix row (blocked GEMM), not a pair "
        "blowup — row count equals the block count"
    ),
    ("top_terms", "BroadcastNestedLoopJoin"): (
        "bounded N×1 crossJoin: the per-(doc,term) tf table × the single "
        "broadcast n_docs aggregate row — attaches one scalar, row count "
        "unchanged"
    ),
    ("dsir_score", "SortMergeJoin"): (
        "the final docs LEFT JOIN per_doc scores on doc_id: both sides are "
        "corpus-sized, so a keyed shuffle join is the correct strategy — "
        "broadcast is impossible at scale by definition"
    ),
    ("dsir_score", "BroadcastNestedLoopJoin"): (
        "bounded B×1 crossJoin: the dense DSIR_BUCKETS-row model table × "
        "the single broadcast totals row — attaches two scalars to a "
        "16384-row table"
    ),
    ("lm_stupid_backoff", "BroadcastNestedLoopJoin"): (
        "bounded V×1 crossJoin: the distinct-probe-trigram table × the "
        "single broadcast n0 total-count row — attaches one scalar, row "
        "count unchanged (the top_terms shape)"
    ),
    ("lm_stupid_backoff", "SortMergeJoin"): (
        "model-table joins: distinct probe trigrams against the t3/c2/b2/"
        "c1/u1 count tables (all vocabulary-sized — broadcast impossible "
        "for an open-vocabulary model by definition), plus the final docs "
        "LEFT JOIN per-doc scores on doc_id (both corpus-sized — the "
        "dsir_score shape); every SMJ moves count rows, never text"
    ),
    ("host_stats", "SortMergeJoin"): (
        "the out-degree ⟕⟖ in-degree FULL OUTER join on host: Spark cannot "
        "broadcast a full-outer join, and both sides are host-level "
        "aggregates (one row per host — already orders of magnitude below "
        "the corpus), so the SMJ sorts the host table, not the crawl"
    ),
    ("crawl_diff", "SortMergeJoin"): (
        "the old-drop ⟕⟖ new-drop FULL OUTER join on url: Spark cannot "
        "broadcast a full-outer join, and both sides are drop-sized (url, "
        "md5) digest tables — the SMJ moves 40-byte rows, never page bodies "
        "(digests are computed map-side before the shuffle)"
    ),
    ("bitext_mine", "BroadcastNestedLoopJoin"): (
        "the two topk_bruteforce blocked GEMMs inside the miner: bounded "
        "num_blocks×1 crossJoin of corpus blocks × the one folded "
        "query-matrix row (the ann_topk_bruteforce shape), twice"
    ),
    ("dedup_eval", "SortMergeJoin"): (
        "pair_prf's truth ⟕⟖ prediction FULL OUTER joins on (a_id, b_id): "
        "Spark cannot broadcast a full-outer join, and both sides are "
        "candidate-pair digests keyed identically — the SMJ sorts pair "
        "ids, never documents (plus the PPJoin/band joins already "
        "reviewed under their own queries)"
    ),
    ("graph_triangles", "SortMergeJoin"): (
        "the designed edge-key shuffles of the oriented-wedge formulation: "
        "degree attach, wedge self-join on the low endpoint, and closure "
        "join — all keyed on edges of a crawl-scale graph, where broadcast "
        "is impossible by definition and the (degree, id) orientation "
        "already caps the join fan-out at O(√m) per key"
    ),
    ("doremi_mix", "BroadcastNestedLoopJoin"): (
        "bounded D×1 crossJoins: the domain table (a handful of rows) × "
        "the single broadcast totals row, then × the one normalization-"
        "fold row — attaches scalars, row count unchanged"
    ),
    ("doremi_mix", "SortMergeJoin"): (
        "lm_surprisal's internal model joins (vocabulary-sized, broadcast "
        "impossible for an open vocabulary) plus the docs→scores doc_id "
        "join — the lm_stupid_backoff/dsir_score shape"
    ),
    ("hard_negatives", "BroadcastNestedLoopJoin"): (
        "the blocked GEMM's bounded num_blocks×1 crossJoin (the "
        "ann_topk_bruteforce shape) with the same-group mask applied "
        "inside the kernel"
    ),
    ("label_outliers", "BroadcastNestedLoopJoin"): (
        "two bounded crossJoins: the 1-row dim guard, and the L-row "
        "centroid table (one row per label) against the corpus — attaches "
        "a handful of centroid vectors, the broadcast is by construction"
    ),
    ("label_outliers", "SortMergeJoin"): (
        "the final own-distance ⨝ best-other-distance assembly on vec_id: "
        "both sides are corpus-sized per-row score tables keyed "
        "identically — broadcast impossible at scale by definition"
    ),
    ("tfidf_terms", "BroadcastNestedLoopJoin"): (
        "bounded N×1 crossJoin: the per-(doc, term) tf table × the single "
        "broadcast n_docs row (the top_terms shape)"
    ),
    ("cooccur_ppmi", "BroadcastNestedLoopJoin"): (
        "bounded P×1 crossJoin: the pair-count table × the single "
        "broadcast total-mass row — attaches one scalar"
    ),
    ("vocab_coverage", "BroadcastNestedLoopJoin"): (
        "bounded crossJoins on the count-VALUE domain: 4 target rows × "
        "the (distinct count values) cumulative table × the 1-row total — "
        "all orders of magnitude below the vocabulary by design"
    ),
    ("curate_decisions", "SortMergeJoin"): (
        "the four per-doc stage outputs joined on doc_id: every side is "
        "corpus-sized (one decision row per document), so keyed shuffle "
        "joins are the correct strategy; each stage's internal plan is "
        "reviewed under its own query"
    ),
    ("dedup_eval_embedding", "SortMergeJoin"): (
        "pair_prf's truth ⟕⟖ prediction FULL OUTER join on (a_id, b_id) "
        "(the dedup_eval shape: un-broadcastable by join type, pair-digest "
        "rows only) plus the LSH candidate equi-joins reviewed under "
        "dedup_embedding_lsh"
    ),
    ("search_hybrid_rrf", "SortMergeJoin"): (
        "rrf_fuse's FULL OUTER join of the two top-k ranker outputs: Spark "
        "cannot broadcast a full-outer join at all, and both inputs are "
        "already k-row lists from their own TakeOrdered — the SMJ sorts "
        "2k rows, not the corpus"
    ),
}

AUDIT = [
    "extract_documents",
    "bitext_mine",
    "dedup_eval",
    "graph_triangles",
    "doremi_mix",
    "hard_negatives",
    "label_outliers",
    "keyword_tags",
    "minhash_band_plan",
    "tfidf_terms",
    "cooccur_ppmi",
    "vocab_coverage",
    "ngram_novelty",
    "curate_decisions",
    "dedup_eval_embedding",
    "ngram_overlap",
    "spans_assemble",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_embedding",
    "ann_topk_bruteforce",
    "ann_topk_lsh",
    "metrics_pairwise",
    "layout_boxes",
    "html_extract",
    "pdf_process",
    "ann_topk_ivf",
    "top_terms",
    "gopher_quality",
    "pii_scrub",
    "audio_chunks",
    "media_integrity",
    "media_orphans",
    "media_captions",
    "html_links",
    "host_graph",
    "anchor_texts",
    "compress_ratio",
    "langid_model",
    "host_stats",
    "ccnet_tiers",
    "sentences",
    "sentence_windows",
    "decontaminate_sentences",
    "corpus_digest",
    "upload_validate",
    "warc_html_extract",
    "lm_surprisal",
    "url_dedup",
    "temperature_mix",
    "classifier_score",
    "chunk_docs",
    "dedup_substr",
    "bloom_membership",
    "dsir_score",
    "dedup_semantic",
    "pagerank",
    "hll_distinct",
    "cms_heavy_hitters",
    "events_asof",
    "search_topk",
    "events_range_join",
    "length_quantiles",
    "events_rollup",
    "dedup_containment",
    "pack_interleaved",
    "html_readability",
    "html_justext",
    "shuffle_shards",
    "table_stats_agg",
    "table_bloom_lookup",
    "search_hybrid_rrf",
    "pack_tokenized",
    "c4_filters",
    "budget_mix",
    "page_directives",
    "robots_rules",
    "robots_gate",
    "robots_sitemaps",
    "sitemap_entries",
    "crawl_frontier",
    "hits_scores",
    "feed_entries",
    "feed_links",
    "html_meta",
    "extract_ensemble",
    "html_justext_multi",
    "lang_mismatch",
    "html_spans",
    "feed_dates",
    "robots_delay",
    "frontier_schedule",
    "html_tables",
    "html_headings",
    "html_sections",
    "jsonld_blocks",
    "dedup_spans",
    "host_templates",
    "crawl_diff",
    "stitch_pages",
    "fields_spans",
    "pii_scrub_spans",
    "html_markdown",
    "span_lang_runs",
    "spans_quality_filter",
    "html_cetr",
    "lm_stupid_backoff",
    "trustrank",
    "lpa_communities",
    "kcore_nodes",
    "graph_walks",
    "spans_coalesce",
    "winnow_fps",
    "decontaminate_spans",
    "spans_truncate",
    "span_transitions",
    "interleave_gate",
    # winnow_pairs excluded like dedup_clusters: derive_df_cap executes its
    # histogram collapse at plan-construction time
    # ann_topk_pq excluded like dedup_clusters: codebook training executes
    # its bounded rounds at plan-construction time

    # dedup_clusters is excluded: connected components EXECUTES its
    # distributed loop at plan-construction time, so "explaining" it runs
    # the job; its per-round plan is the audited join+agg shape.
]


def plan_of(spark, name: str, sf_dir: str = "/root/testdata/sf0.001") -> str:
    from ocr_spark.plans import entry_queries as EQ

    df = EQ.QUERIES[name](spark, sf_dir)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def unaccepted_smells(name: str, plan: str) -> list[str]:
    """The smell hits for ``name`` that are NOT in the reviewed ACCEPTED
    registry — the regression contract tests/test_plan_smells.py enforces."""
    out = []
    for needle, msg in SMELLS:
        if needle in plan and (name, needle) not in ACCEPTED:
            out.append(f"{needle}: {msg}")
    return out


def main() -> None:
    only = sys.argv[1:]
    from ocr_spark.session import get_spark

    spark = get_spark("explain-audit", master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    for name in only or AUDIT:
        plan = plan_of(spark, name)
        print(f"{'=' * 70}\n## {name}\n{plan}")
        for needle, msg in SMELLS:
            if needle in plan:
                why = ACCEPTED.get((name, needle))
                if why:
                    print(f"  ok (reviewed) [{name}]: {needle} — {why}")
                else:
                    print(f"  !! SMELL [{name}]: {msg}")
        n_codegen = plan.count("WholeStageCodegen")
        n_pandas = (
            plan.count("ArrowEvalPython")
            + plan.count("MapInPandas")
            + plan.count("FlatMapGroupsInPandas")
        )
        print(f"  [{name}] codegen-spans={n_codegen} arrow-stages={n_pandas}")


if __name__ == "__main__":
    main()
