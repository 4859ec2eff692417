"""Hyperlink extraction and the host link graph — the bridge from crawled
HTML to graph-shaped curation signals (anchor-text corpora, link-based
host ranking a la Common Crawl's host-level webgraph).

``extract_links`` parses anchors out of raw HTML with the same regex
discipline as the boilerplate family (no parser library; pure Column
expressions, exact DuckDB twin) and resolves each href against the page's
base URI using a documented RFC 3986 SUBSET:

  * absolute (``http://``/``https://``) hrefs pass through,
  * protocol-relative (``//host/...``) inherit the base scheme,
  * root-relative (``/...``) resolve against the base host,
  * everything else resolves against the base path's directory
    (NO ``..``/``.`` segment normalization — at corpus scale dot-segment
    links are rare and a normalizer belongs in url_canonicalize),
  * fragment-only, ``javascript:``, ``mailto:``, ``data:`` and ``tel:``
    hrefs are dropped; fragments are stripped from resolved URLs.

Scale shape: extraction is one narrow pass (transform over
regexp_extract_all + explode — no shuffle, no Python); ``host_edges`` is
a single (src_host, dst_host) aggregation whose map-side partials absorb
the per-page link fan-out, and its output feeds ``operators/graph.pagerank``
directly for link-based host ranking.

The reference repo has no crawl path (it is an OCR/PDF service); this
module implements the web-corpus requirement from public pipeline designs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ocr_spark.functions.text import py_strip

ANCHOR_FULL_RE = r"(?is)<a\b[^>]*>.*?</a>"
_HREF_DQ_RE = r'(?i)\bhref\s*=\s*"([^"]*)"'
_HREF_SQ_RE = r"(?i)\bhref\s*=\s*'([^']*)'"
_A_SHELL_RE = r"(?is)^<a\b[^>]*>|</a>$"
_TAG_RE = r"(?s)<[^>]*>"
_SKIP_RE = r"(?i)^(?:#|javascript:|mailto:|data:|tel:)"


def _base_parts(base: Column) -> tuple[Column, Column, Column]:
    """(scheme, host, directory) of a base URI; directory always ends in
    '/' ('/' when the base has no path)."""
    scheme = F.lower(F.regexp_extract(base, r"^(?i)(https?)://", 1))
    host = F.lower(F.regexp_extract(base, r"^(?i)https?://([^/?#]*)", 1))
    path = F.regexp_extract(base, r"^(?i)https?://[^/?#]*([^?#]*)", 1)
    d = F.regexp_replace(path, r"[^/]*$", "")
    return scheme, host, F.when(d == "", F.lit("/")).otherwise(d)


def _resolve(href: Column, scheme: Column, host: Column, dirp: Column) -> Column:
    url = (
        F.when(href.rlike(r"^(?i)https?://"), href)
        .when(href.startswith("//"), F.concat(scheme, F.lit(":"), href))
        .when(
            href.startswith("/"),
            F.concat(scheme, F.lit("://"), host, href),
        )
        .otherwise(F.concat(scheme, F.lit("://"), host, dirp, href))
    )
    return F.regexp_replace(url, r"(?s)#.*$", "")


def extract_links(
    docs: DataFrame,
    base_col: str = "base_uri",
    html_col: str = "html",
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per kept anchor: (doc_id, url, anchor, src_host, dst_host,
    internal). ``anchor`` is the tag-stripped, whitespace-trimmed anchor
    text; ``internal`` marks same-host links."""
    scheme, src_host, dirp = _base_parts(F.coalesce(F.col(base_col), F.lit("")))
    anchors = F.regexp_extract_all(
        F.coalesce(F.col(html_col), F.lit("")), F.lit(ANCHOR_FULL_RE), 0
    )

    def link(a: Column) -> Column:
        dq = F.regexp_extract(a, _HREF_DQ_RE, 1)
        sq = F.regexp_extract(a, _HREF_SQ_RE, 1)
        href = py_strip(F.when(dq != "", dq).otherwise(sq))
        text = py_strip(
            F.regexp_replace(F.regexp_replace(a, _A_SHELL_RE, ""), _TAG_RE, "")
        )
        return F.struct(href.alias("href"), text.alias("anchor"))

    kept = F.filter(
        F.transform(anchors, link),
        lambda l: (l["href"] != "") & ~l["href"].rlike(_SKIP_RE),
    )
    rows = docs.select(
        F.col(id_col).alias("doc_id"),
        scheme.alias("__scheme"),
        src_host.alias("src_host"),
        dirp.alias("__dir"),
        F.explode(kept).alias("l"),
    )
    url = _resolve(
        F.col("l.href"), F.col("__scheme"), F.col("src_host"), F.col("__dir")
    )
    dst_host = F.lower(
        F.regexp_extract(url, r"^(?i)https?://(?:[^/?#]*@)?([^/?#]*)", 1)
    )
    return rows.select(
        "doc_id",
        url.alias("url"),
        F.col("l.anchor").alias("anchor"),
        "src_host",
        dst_host.alias("dst_host"),
        (dst_host == F.col("src_host")).alias("internal"),
    )


META_ROBOTS_RE = (
    r"(?is)<meta\b[^>]*\bname\s*=\s*[\"']robots[\"'][^>]*>"
)
LINK_CANONICAL_RE = r"(?is)<link\b[^>]*\brel\s*=\s*[\"']canonical[\"'][^>]*>"
_CONTENT_DQ_RE = r'(?i)\bcontent\s*=\s*"([^"]*)"'
_CONTENT_SQ_RE = r"(?i)\bcontent\s*=\s*'([^']*)'"


def page_directives(
    docs: DataFrame,
    base_col: str = "base_uri",
    html_col: str = "html",
    id_col: str = "doc_id",
) -> DataFrame:
    """Crawl-hygiene page directives — the two signals a crawl pipeline
    honors before a page may enter the corpus: the robots meta tag
    (``noindex`` / ``nofollow``; ``none`` means both, and across multiple
    robots metas the most restrictive directive wins — the documented
    union semantics) and ``rel=canonical`` (the syndication/pagination
    dedup signal: copies collapse onto the canonical URL, resolved against
    the page base with the same RFC-subset resolver as
    :func:`extract_links`). Attribute order inside the tags is free and
    both quote styles parse, same as the anchor scanner.

    One narrow pass of regexp/array expressions — the corpus never
    shuffles. Returns (doc_id, noindex, nofollow, canonical_url,
    canonical_is_self); ``canonical_url`` is '' when the page declares
    none, ``canonical_is_self`` when it resolves to the page's own
    (fragment-stripped) base URI."""
    html = F.coalesce(F.col(html_col), F.lit(""))
    metas = F.regexp_extract_all(html, F.lit(META_ROBOTS_RE), 0)

    def content_of(tag: Column) -> Column:
        dq = F.regexp_extract(tag, _CONTENT_DQ_RE, 1)
        sq = F.regexp_extract(tag, _CONTENT_SQ_RE, 1)
        return F.lower(F.when(dq != "", dq).otherwise(sq))

    def has_directive(word: str) -> Column:
        return F.exists(
            metas,
            lambda m: content_of(m).rlike(rf"\b(?:{word}|none)\b"),
        )

    canon_tag = F.regexp_extract(html, LINK_CANONICAL_RE, 0)
    dq = F.regexp_extract(canon_tag, _HREF_DQ_RE, 1)
    sq = F.regexp_extract(canon_tag, _HREF_SQ_RE, 1)
    href = py_strip(F.when(dq != "", dq).otherwise(sq))
    base = F.coalesce(F.col(base_col), F.lit(""))
    scheme, host, dirp = _base_parts(base)
    canon = F.when(href == "", F.lit("")).otherwise(
        _resolve(href, scheme, host, dirp)
    )
    self_uri = F.regexp_replace(base, r"(?s)#.*$", "")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        has_directive("noindex").alias("noindex"),
        has_directive("nofollow").alias("nofollow"),
        canon.alias("canonical_url"),
        ((canon != "") & (canon == self_uri)).alias("canonical_is_self"),
    )


def host_edges(links: DataFrame) -> DataFrame:
    """(src_host, dst_host, n_links) host-level link graph from
    :func:`extract_links` output — one aggregation, map-side combined;
    feeds ``graph.pagerank(edges, src_col='src_host',
    dst_col='dst_host')`` for link-based host ranking."""
    return links.groupBy("src_host", "dst_host").agg(
        F.count(F.lit(1)).cast("long").alias("n_links")
    )


def ranked_hosts(edges: DataFrame, n_iters: int = 3) -> DataFrame:
    """Link-based host ranking end-to-end: hosts map through xxhash64
    surrogates (pagerank's integer-id contract; collision odds are
    negligible at any real host count), rank over the edge table, then the
    host names join back → (host, rank_units)."""
    from ocr_spark.operators.graph import pagerank

    e = edges.select(
        F.xxhash64("src_host").alias("src"), F.xxhash64("dst_host").alias("dst")
    )
    names = (
        edges.select(F.col("src_host").alias("host"))
        .unionByName(edges.select(F.col("dst_host").alias("host")))
        .distinct()
        .select(F.xxhash64("host").alias("node"), "host")
    )
    return pagerank(e, n_iters=n_iters).join(names, "node").select(
        "host", "rank_units"
    )


def anchor_texts(links: DataFrame, k: int = 3) -> DataFrame:
    """Anchor-text corpus (the classic link-based relevance signal — anchor
    strings describe the TARGET page better than its own boilerplate): the
    top-``k`` distinct anchor strings per destination host, ranked by link
    count with a deterministic (count desc, anchor asc) tie-break.

    Plan: (dst_host, anchor) counts pre-aggregate map-side (the Zipf head
    of repeated nav anchors collapses before the shuffle), then one
    window rank per host — two shuffles total, both on dst_host-rooted
    keys. Output: (dst_host, anchor, n_links, rank)."""
    counts = (
        links.filter(py_strip(F.col("anchor")) != "")
        .groupBy("dst_host", "anchor")
        .agg(F.count(F.lit(1)).cast("long").alias("n_links"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("dst_host").orderBy(
        F.col("n_links").desc(), F.col("anchor").asc()
    )
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def host_stats(edges: DataFrame) -> DataFrame:
    """Per-host degree audit over the host graph — the spam-shape signals
    link-based curation keys on (link farms: huge out-degree, tiny
    in-degree; parked clusters: reciprocal self-links): out_hosts /
    in_hosts (distinct neighbours), out_links / in_links (edge weights),
    and self_links.

    Plan: two aggregations over the (already host-level, so tiny relative
    to the corpus) edge table, full-outer-joined on host — no corpus
    access at all."""
    out = edges.groupBy(F.col("src_host").alias("host")).agg(
        F.count(F.lit(1)).cast("long").alias("out_hosts"),
        F.sum("n_links").cast("long").alias("out_links"),
        F.sum(F.when(F.col("src_host") == F.col("dst_host"), F.col("n_links")).otherwise(F.lit(0)))
        .cast("long")
        .alias("self_links"),
    )
    inn = edges.groupBy(F.col("dst_host").alias("host")).agg(
        F.count(F.lit(1)).cast("long").alias("in_hosts"),
        F.sum("n_links").cast("long").alias("in_links"),
    )
    return out.join(inn, "host", "full_outer").select(
        "host",
        F.coalesce(F.col("out_hosts"), F.lit(0)).cast("long").alias("out_hosts"),
        F.coalesce(F.col("out_links"), F.lit(0)).cast("long").alias("out_links"),
        F.coalesce(F.col("in_hosts"), F.lit(0)).cast("long").alias("in_hosts"),
        F.coalesce(F.col("in_links"), F.lit(0)).cast("long").alias("in_links"),
        F.coalesce(F.col("self_links"), F.lit(0)).cast("long").alias("self_links"),
    )
