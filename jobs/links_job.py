"""spark-submit entry point for the link-graph pipeline: crawl pages →
per-link rows → host link graph → pagerank host ranking + anchor-text
corpus.

Usage:

    spark-submit --master local[32] --py-files dist/ocr_spark.zip \\
        jobs/links_job.py --input /data/crawl --format warc \\
        --output /tmp/links_out

Outputs under --output:
    links/        (doc_id, url, anchor, src_host, dst_host, internal) —
                  resumable hash-buckets (re-run the same command after a
                  crash; committed buckets are never recomputed)
    links_canonical/  (same columns; only with --canonicalize) — the
                  post-hygiene canonical-URL link view
    host_graph/   (src_host, dst_host, n_links)
    host_rank/    (host, rank_units)
    anchors/      (dst_host, anchor, n_links, rank)
    feeds/        (doc_id, feed_url, feed_type) — only with
                  --discover-feeds: RSS/Atom autodiscovery fetch list

The three derived tables are aggregations over the committed links output
— orders of magnitude smaller than extraction — so they recompute from
the bucket parquet on every run rather than carrying their own
checkpoints; extraction (the crawl-scale pass) is the resumable stage.

Crawl hygiene (optional) applies between the committed extraction and the
derived tables, so a policy change never invalidates the expensive stage:
``--robots <parquet of (host, body)>`` drops link targets the robots.txt
rules disallow for ``--agent`` (links.robots_rules/robots_gate, gating
DISTINCT urls then a semi join back), and ``--honor-nofollow`` drops all
outlinks of pages whose robots meta says nofollow
(links.page_directives). The summary reports n_links_dropped_hygiene.
``--canonicalize`` rewrites every link URL to its canonical form
(links.url_canonicalize: lowercase scheme/host, default port / userinfo /
fragment / tracking-param removal, dot-segment resolution, sorted query)
and recomputes dst_host/internal from it, BEFORE the hygiene gates — so
the robots DISTINCT gate and the downstream frontier seen-set diff key on
one URL per resource instead of re-fetching every utm-tagged alias.

Parquet input must carry (doc_id, base_uri, html); WARC input derives
(xxhash64(target_uri), target_uri, payload) from 200-OK text/html
responses, the same corpus-view keying as sources/warc.warc_documents.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--format", choices=("warc", "parquet"), default="warc")
    ap.add_argument("--buckets", type=int, default=16)
    ap.add_argument("--top-anchors", type=int, default=3)
    ap.add_argument("--rank-iters", type=int, default=3)
    ap.add_argument(
        "--robots",
        default=None,
        help="parquet of (host, body) robots.txt bodies; link targets the"
        " rules disallow for --agent are dropped from the derived tables",
    )
    ap.add_argument("--agent", default="ocrbot")
    ap.add_argument(
        "--honor-nofollow",
        action="store_true",
        help="drop ALL outlinks of pages whose robots meta says nofollow",
    )
    ap.add_argument(
        "--canonicalize",
        action="store_true",
        help="canonicalize link URLs (and recompute dst_host/internal) "
             "before the hygiene gates",
    )
    ap.add_argument("--fail-after", type=int, default=None, help="fault injection (tests)")
    ap.add_argument(
        "--discover-feeds",
        action="store_true",
        help="also write feeds/ — RSS/Atom autodiscovery links per page "
        "(links.feed_links), the fetch list for the feed half of crawl "
        "discovery",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from ocr_spark.operators.links import (
        anchor_texts,
        extract_links,
        host_edges,
        page_directives,
        ranked_hosts,
        robots_gate,
        robots_rules,
    )
    from ocr_spark.plans.checkpoint import run_checkpointed

    spark = SparkSession.builder.appName("ocr-spark-links").getOrCreate()

    if args.format == "warc":
        from ocr_spark.sources.warc import read_warc, responses

        ct = F.lower(F.coalesce(F.col("http_content_type"), F.lit("")))
        pages = (
            responses(read_warc(spark, args.input))
            .filter(
                (F.col("http_status") == 200)
                & (ct.startswith("text/html") | ct.startswith("application/xhtml+xml"))
            )
            .select(
                F.xxhash64("target_uri").alias("doc_id"),
                F.col("target_uri").alias("base_uri"),
                F.col("html"),
            )
        )
    else:
        pages = spark.read.parquet(args.input)

    summary = run_checkpointed(
        spark,
        pages,
        args.output + "/links",
        extract_links,
        num_buckets=args.buckets,
        input_lineage=args.input,
        fail_after=args.fail_after,
        job_params={"stage": "links-v1"},
    )

    links = spark.read.parquet(args.output + "/links/bucket=*")
    if args.canonicalize:
        from ocr_spark.operators.links import url_canonicalize

        links = (
            links.withColumn("url", url_canonicalize(F.col("url")))
            .withColumn(
                "dst_host",
                F.lower(
                    F.regexp_extract(
                        F.col("url"),
                        r"^(?i)https?://(?:[^/?#]*@)?([^/?#]*)",
                        1,
                    )
                ),
            )
            .withColumn("internal", F.col("dst_host") == F.col("src_host"))
        )
    n_raw = links.count()

    # Crawl hygiene happens BETWEEN the committed extraction and the
    # derived tables: the resumable links/ buckets stay a complete record
    # of what the crawl contains (policy changes never invalidate the
    # expensive stage), while the graph/rank/anchor outputs honor robots
    # and nofollow. Both filters are link-table-sized, never crawl-sized.
    if args.honor_nofollow:
        nf = (
            page_directives(pages)
            .filter(F.col("nofollow"))
            .select("doc_id")
        )
        links = links.join(nf, "doc_id", "left_anti")
    if args.robots:
        robots = spark.read.parquet(args.robots)
        rules = robots_rules(robots, args.agent)
        allowed = (
            robots_gate(
                links.select(F.col("url").alias("u"), "url").distinct(),
                rules,
                id_col="u",
            )
            .filter(F.col("allowed"))
            .select("url")
        )
        links = links.join(allowed, "url", "semi")

    if args.canonicalize:
        # the canonical post-hygiene link table, for frontier builders and
        # dedup consumers (links/ stays the raw committed record)
        links.write.mode("overwrite").parquet(args.output + "/links_canonical")
        links = spark.read.parquet(args.output + "/links_canonical")

    edges = host_edges(links)
    edges.write.mode("overwrite").parquet(args.output + "/host_graph")
    ranked_hosts(edges, n_iters=args.rank_iters).write.mode("overwrite").parquet(
        args.output + "/host_rank"
    )
    anchor_texts(links, k=args.top_anchors).write.mode("overwrite").parquet(
        args.output + "/anchors"
    )
    if args.discover_feeds:
        # one extra narrow pass over the SAME committed pages — discovery
        # output is page-table-sized, so it recomputes like the other
        # derived tables rather than carrying its own checkpoint
        from ocr_spark.operators.links import feed_links

        feeds = feed_links(pages)
        feeds.write.mode("overwrite").parquet(args.output + "/feeds")
        summary["n_feed_links"] = feeds.count()

    summary["n_links"] = links.count()
    summary["n_links_dropped_hygiene"] = n_raw - summary["n_links"]
    summary["n_host_edges"] = edges.count()
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
