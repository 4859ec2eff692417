"""Hyperlink extraction + host graph — operators/links."""

from __future__ import annotations

from ocr_spark.operators import links as LK


def _rows(spark, base, html):
    df = spark.createDataFrame(
        [(1, base, html)], "doc_id long, base_uri string, html string"
    )
    return LK.extract_links(df).collect()


def test_resolution_subset(spark):
    base = "https://www.site.example/a/b/page.html"
    rows = _rows(
        spark,
        base,
        '<a href="https://other.example/x">abs</a>'
        '<a href="//cdn.example/y.js">proto</a>'
        '<a href="/root.html">root</a>'
        '<a href="rel.html">rel</a>'
        '<a href="rel.html#frag">relfrag</a>',
    )
    by_anchor = {r["anchor"]: r for r in rows}
    assert by_anchor["abs"]["url"] == "https://other.example/x"
    assert by_anchor["proto"]["url"] == "https://cdn.example/y.js"
    assert by_anchor["root"]["url"] == "https://www.site.example/root.html"
    assert by_anchor["rel"]["url"] == "https://www.site.example/a/b/rel.html"
    # fragment stripped after resolution
    assert by_anchor["relfrag"]["url"] == "https://www.site.example/a/b/rel.html"
    assert by_anchor["abs"]["internal"] is False
    assert by_anchor["rel"]["internal"] is True
    assert all(r["src_host"] == "www.site.example" for r in rows)


def test_skips_and_quoting(spark):
    rows = _rows(
        spark,
        "http://h.example/",
        '<a href="#top">frag</a><a href="mailto:a@b">mail</a>'
        '<a href="JavaScript:void(0)">js</a><a href="tel:+1">tel</a>'
        '<a href="data:text/plain,x">data</a><a>none</a><a href="">empty</a>'
        "<a href='single.html'>sq</a>"
        '<a href=" spaced.html ">sp</a>'
        '<a href="/ok">Keep <b>bold</b> text</a>',
    )
    by_anchor = {r["anchor"]: r for r in rows}
    assert set(by_anchor) == {"sq", "sp", "Keep bold text"}
    # http base keeps its scheme on relative resolution
    assert by_anchor["sq"]["url"] == "http://h.example/single.html"
    # href whitespace trimmed before resolution
    assert by_anchor["sp"]["url"] == "http://h.example/spaced.html"


def test_base_without_path_and_null_html(spark):
    rows = _rows(spark, "https://h.example", '<a href="x.html">r</a>')
    assert rows[0]["url"] == "https://h.example/x.html"
    df = spark.createDataFrame(
        [(1, None, None)], "doc_id long, base_uri string, html string"
    )
    assert LK.extract_links(df).count() == 0


def test_host_edges_feed_pagerank(spark):
    """The host graph is a valid pagerank edge table end-to-end: hosts
    linked by many pages outrank hosts linked by few."""
    pages = []
    for i in range(12):
        pages.append(
            (
                i,
                f"https://src{i % 4}.example/p/{i}",
                '<a href="https://hub.example/x">hub</a>'
                + ('<a href="https://rare.example/y">rare</a>' if i == 0 else ""),
            )
        )
    df = spark.createDataFrame(pages, "doc_id long, base_uri string, html string")
    edges = LK.host_edges(LK.extract_links(df))
    got = {
        (r["src_host"], r["dst_host"]): r["n_links"] for r in edges.collect()
    }
    assert got[("src0.example", "hub.example")] == 3
    assert got[("src0.example", "rare.example")] == 1
    ranks = {
        r["host"]: r["rank_units"] for r in LK.ranked_hosts(edges).collect()
    }
    assert ranks["hub.example"] > ranks["rare.example"]


def test_anchor_texts_ranking(spark):
    pages = [
        (1, "https://a.example/", '<a href="https://t.example/x">Best page</a>'
            '<a href="https://t.example/x">Best page</a>'
            '<a href="https://t.example/y">Also good</a>'
            '<a href="https://t.example/z">Zlast</a>'
            '<a href="https://t.example/w">Another one</a>'
            '<a href="https://t.example/v">   </a>'),   # blank anchor excluded
    ]
    df = spark.createDataFrame(pages, "doc_id long, base_uri string, html string")
    rows = LK.anchor_texts(LK.extract_links(df), k=3).collect()
    got = [(r["rank"], r["anchor"], r["n_links"]) for r in sorted(rows, key=lambda r: r["rank"])]
    # count desc first, then anchor asc among the 1-count ties; only k=3 kept
    assert got == [(1, "Best page", 2), (2, "Also good", 1), (3, "Another one", 1)]


def test_links_job_end_to_end_and_resume(spark, tmp_path, monkeypatch):
    """links_job over a synthetic WARC drop: resumable extraction buckets,
    then host graph / host rank / anchor corpus derived tables."""
    import sys as _sys

    from ocr_spark.sources import warc as W
    from jobs import links_job

    wdir = tmp_path / "crawl"
    wdir.mkdir()
    (wdir / "a.warc").write_bytes(W.synth_warc_file(0, range(8), False))
    out = tmp_path / "out"

    argv = ["links_job.py", "--input", str(wdir), "--output", str(out),
            "--buckets", "4"]
    monkeypatch.setattr(_sys, "argv", argv)
    links_job.main()

    links = spark.read.parquet(str(out / "links" / "bucket=*"))
    # every 200-OK page contributes its two nav links (Home, Links)
    n_pages = links.select("doc_id").distinct().count()
    assert n_pages > 0 and links.count() == 2 * n_pages
    assert spark.read.parquet(str(out / "host_graph")).count() > 0
    ranks = spark.read.parquet(str(out / "host_rank"))
    assert ranks.count() == ranks.select("host").distinct().count() > 0
    anchors = {r["anchor"] for r in
               spark.read.parquet(str(out / "anchors")).collect()}
    assert anchors == {"Home", "Links"}

    # resume: a second run recomputes nothing in the extraction stage
    monkeypatch.setattr(_sys, "argv", argv)
    import io as _io
    from contextlib import redirect_stdout as _rs
    buf = _io.StringIO()
    with _rs(buf):
        links_job.main()
    import json as _json
    summary = _json.loads([l for l in buf.getvalue().splitlines()
                           if l.startswith("{")][-1])
    assert summary["buckets_run"] == 0 and summary["buckets_skipped"] == 4


def test_links_stream_equals_batch(spark, tmp_path):
    """extract_links is stateless per page, so it composes unchanged onto
    the streaming WARC source: continuous crawl drops yield the same link
    rows as a batch read of the same archives."""
    from pyspark.sql import functions as F

    from ocr_spark.sources import warc as W

    def pages(parsed):
        ct = F.lower(F.coalesce(F.col("http_content_type"), F.lit("")))
        return (
            W.responses(parsed)
            .filter((F.col("http_status") == 200) & ct.startswith("text/html"))
            .select(
                F.xxhash64("target_uri").alias("doc_id"),
                F.col("target_uri").alias("base_uri"),
                F.col("html"),
            )
        )

    drop = tmp_path / "drop"
    drop.mkdir()
    (drop / "c0.warc").write_bytes(W.synth_warc_file(0, range(0, 10, 2), False))
    stream = LK.extract_links(pages(W.read_warc_stream(spark, str(drop))))
    q = (
        stream.writeStream.format("memory")
        .queryName("links_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        (drop / "c1.warc.gz").write_bytes(W.synth_warc_file(1, range(1, 10, 2), True))
        q.processAllAvailable()
        got = spark.table("links_stream").collect()
    finally:
        q.stop()
    batch = LK.extract_links(pages(W.read_warc(spark, str(drop)))).collect()
    key = lambda r: (r["doc_id"], r["url"], r["anchor"])
    assert sorted(map(key, got)) == sorted(map(key, batch)) != []


def test_host_stats_degree_audit(spark):
    """Link-farm shape: big out-degree / no in-links; sink host: the
    reverse; self-links counted separately; link-count weights summed."""
    pages = [
        (1, "https://farm.example/a",
         "".join(f'<a href="https://t{i}.example/x">t</a>' for i in range(6))
         + '<a href="https://farm.example/b">self</a>'
         + '<a href="https://farm.example/c">self2</a>'),
        (2, "https://t0.example/p", '<a href="https://t1.example/y">one</a>'),
    ]
    df = spark.createDataFrame(pages, "doc_id long, base_uri string, html string")
    stats = {r["host"]: r for r in
             LK.host_stats(LK.host_edges(LK.extract_links(df))).collect()}
    farm = stats["farm.example"]
    assert farm["out_hosts"] == 7          # 6 targets + itself
    assert farm["out_links"] == 8          # 6 + 2 self links
    assert farm["self_links"] == 2
    assert farm["in_hosts"] == 1 and farm["in_links"] == 2  # only itself
    sink = stats["t1.example"]
    assert sink["out_hosts"] == 0 and sink["in_hosts"] == 2


def test_page_directives_robots_and_canonical(spark):
    """Robots meta parses both quote styles / attr orders, 'none' implies
    both directives, multiple metas union (most restrictive wins);
    rel=canonical resolves relative hrefs against the base and
    self-canonical pages flag as such."""
    pages = [
        (1, "https://ex.com/a/b/page1.html",
         '<meta name="robots" content="noindex, nofollow">'
         '<link rel="canonical" href="https://ex.com/a/b/page1.html">'),
        (2, "https://ex.com/a/page2.html",
         "<meta content='nofollow' name='robots'>"
         "<link href='canon.html' rel='canonical'>"),
        (3, "https://ex.com/page3.html", "<p>no directives at all</p>"),
        (4, "https://ex.com/page4.html",
         '<meta name="robots" content="noindex">'
         '<meta name="robots" content="nofollow">'),
        (5, "https://ex.com/page5.html",
         "<META NAME='robots' CONTENT='none'>"),
        (6, "https://ex.com/page6.html#frag",
         '<link rel="canonical" href="/page6.html">'),
    ]
    df = spark.createDataFrame(pages, "doc_id long, base_uri string, html string")
    got = {r["doc_id"]: r for r in LK.page_directives(df).collect()}
    assert got[1]["noindex"] and got[1]["nofollow"]
    assert got[1]["canonical_is_self"]
    assert not got[2]["noindex"] and got[2]["nofollow"]
    assert got[2]["canonical_url"] == "https://ex.com/a/canon.html"
    assert not got[2]["canonical_is_self"]
    assert not got[3]["noindex"] and not got[3]["nofollow"]
    assert got[3]["canonical_url"] == "" and not got[3]["canonical_is_self"]
    assert got[4]["noindex"] and got[4]["nofollow"]      # union of two metas
    assert got[5]["noindex"] and got[5]["nofollow"]      # none => both
    assert got[6]["canonical_url"] == "https://ex.com/page6.html"
    assert got[6]["canonical_is_self"]                   # fragment stripped


ROBOTS_BODY = """# preamble comment
Disallow: /before-any-group
User-agent: alpha\r
User-agent: OCRBot\r
Disallow: /a/b    # trailing comment
Allow: /a/b/c
Disallow:

User-agent: beta
Disallow: /
Sitemap: https://ex.com/map1.xml
sitemap: https://ex.com/map2.xml
SITEMAP:
"""


def test_robots_rules_groups_and_agent_selection(spark):
    """UA runs share rules; a later UA line starts a new group; exact-agent
    groups suppress star groups; empty-value and before-any-group rules
    drop; comments and CRLF strip; directive names are case-insensitive."""
    df = spark.createDataFrame([("ex.com", ROBOTS_BODY)], "host string, body string")
    rules = sorted(
        (r["block_id"], r["allow"], r["path"])
        for r in LK.robots_rules(df, "ocrbot").collect()
    )
    # the shared alpha/OCRBot run: /a/b disallow (comment stripped), /a/b/c
    # allow; the empty Disallow and the pre-group rule are gone; beta's
    # deny-all group does not apply to ocrbot.
    assert rules == [(1, False, "/a/b"), (1, True, "/a/b/c")]
    # an agent with no exact group falls back to... no star group here.
    assert LK.robots_rules(df, "nobody").count() == 0
    # star fallback when no exact group names the agent.
    star = spark.createDataFrame(
        [("s.com", "User-agent: *\nDisallow: /x\nUser-agent: a\nDisallow: /y")],
        "host string, body string",
    )
    got = [(r["allow"], r["path"]) for r in LK.robots_rules(star, "zz").collect()]
    assert got == [(False, "/x")]


def test_robots_gate_longest_match_and_ties(spark):
    """Longest path prefix wins; Allow beats Disallow at equal length; no
    matching rule or no robots row at all means allowed; matching is on
    path+query with the fragment stripped; bare host path is '/'."""
    robots = spark.createDataFrame(
        [
            (
                "ex.com",
                "User-agent: *\nDisallow: /a\nAllow: /a/b\n"
                "Allow: /t\nDisallow: /t\nDisallow: /q?x=",
            )
        ],
        "host string, body string",
    )
    rules = LK.robots_rules(robots, "ocrbot")
    urls = spark.createDataFrame(
        [
            (1, "https://ex.com/a/zzz"),          # blocked by /a
            (2, "https://ex.com/a/b/c"),          # longer Allow wins
            (3, "https://ex.com/t/page"),         # tie -> Allow wins
            (4, "https://ex.com/q?x=1"),          # query participates
            (5, "https://ex.com/free#frag"),      # no rule matches
            (6, "https://other.com/a/zzz"),       # host without robots
            (7, "https://EX.com/a/zzz"),          # host case-folds
        ],
        "doc_id long, url string",
    )
    got = {r["doc_id"]: r for r in LK.robots_gate(urls, rules).collect()}
    assert not got[1]["allowed"] and got[1]["matched_len"] == 2
    assert got[2]["allowed"] and got[2]["matched_len"] == 4
    assert got[3]["allowed"] and got[3]["matched_len"] == 2
    assert not got[4]["allowed"]
    assert got[5]["allowed"] and got[5]["matched_len"] == 0
    assert got[6]["allowed"] and got[6]["matched_len"] == 0
    assert not got[7]["allowed"]


def test_robots_sitemaps(spark):
    """Sitemap lines are group-independent, case-insensitive, and an
    empty value drops."""
    df = spark.createDataFrame([("ex.com", ROBOTS_BODY)], "host string, body string")
    got = sorted(r["sitemap_url"] for r in LK.robots_sitemaps(df).collect())
    assert got == ["https://ex.com/map1.xml", "https://ex.com/map2.xml"]


def test_sitemap_entries(spark):
    """urlset and sitemapindex children parse with kind tags; loc-less
    blocks drop; whitespace-padded locs trim; the five XML entities decode
    with &amp; last; priority parses to exact milli-units (NULL when absent
    or malformed, >3 fraction digits truncate); lastmod stays a raw string."""
    x0 = (
        '<urlset><url><loc> https://a.example/p?x=1&amp;y=2 </loc>'
        "<lastmod>2026-01-02</lastmod><priority>0.8</priority></url>"
        "<url><loc>https://a.example/bare</loc></url>"
        "<url><loc>https://a.example/full</loc><priority>1.0</priority></url>"
        "<url><loc>https://a.example/bad</loc><priority>high</priority></url>"
        "<url><loc>https://a.example/trunc</loc><priority>0.98765</priority></url>"
        "<url><loc>&amp;lt;keep&amp;gt;</loc></url>"
        "<url><priority>0.5</priority></url></urlset>"
    )
    x1 = (
        "<sitemapindex><sitemap><loc>https://b.example/s1.xml</loc>"
        "<lastmod>2026-02-03T04:05:06Z</lastmod></sitemap>"
        "<sitemap><loc>https://b.example/s2.xml</loc></sitemap></sitemapindex>"
    )
    df = spark.createDataFrame(
        [("https://a.example/sm.xml", x0), ("https://b.example/sm.xml", x1)],
        "sitemap_url string, xml string",
    )
    rows = LK.sitemap_entries(df).collect()
    by_loc = {r["loc"]: r for r in rows}
    assert len(rows) == 8  # the loc-less block dropped
    assert by_loc["https://a.example/p?x=1&y=2"]["priority_milli"] == 800
    assert by_loc["https://a.example/p?x=1&y=2"]["lastmod"] == "2026-01-02"
    assert by_loc["https://a.example/bare"]["priority_milli"] is None
    assert by_loc["https://a.example/bare"]["lastmod"] == ""
    assert by_loc["https://a.example/full"]["priority_milli"] == 1000
    assert by_loc["https://a.example/bad"]["priority_milli"] is None
    assert by_loc["https://a.example/trunc"]["priority_milli"] == 987
    assert "&lt;keep&gt;" in by_loc  # &amp; decoded last
    assert by_loc["https://b.example/s1.xml"]["kind"] == "sitemap"
    assert by_loc["https://b.example/s1.xml"]["lastmod"] == "2026-02-03T04:05:06Z"
    assert all(r["kind"] == "url" for r in rows if "a.example" in r["sitemap_url"])


def test_links_job_crawl_hygiene(spark, tmp_path, monkeypatch):
    """--robots drops disallowed link targets and --honor-nofollow drops
    all outlinks of nofollow pages — both between the committed extraction
    and the derived tables, so the links/ buckets stay complete."""
    import sys as _sys
    import json as _json
    import io as _io
    from contextlib import redirect_stdout as _rs

    from jobs import links_job

    pages = [
        (1, "https://h1.example/a.html",
         '<a href="/keep">K1</a><a href="/blocked/x">B</a>'),
        (2, "https://h1.example/b.html",
         '<meta name="robots" content="nofollow">'
         '<a href="/keep">K2</a><a href="/also">A</a>'),
        (3, "https://h2.example/c.html",
         '<a href="/blocked/x">FreeHost</a>'),
    ]
    pdir = tmp_path / "pages"
    spark.createDataFrame(
        pages, "doc_id long, base_uri string, html string"
    ).write.parquet(str(pdir))
    rdir = tmp_path / "robots"
    spark.createDataFrame(
        [("h1.example", "User-agent: *\nDisallow: /blocked/")],
        "host string, body string",
    ).write.parquet(str(rdir))
    out = tmp_path / "out"

    argv = ["links_job.py", "--input", str(pdir), "--output", str(out),
            "--format", "parquet", "--buckets", "2",
            "--robots", str(rdir), "--honor-nofollow"]
    monkeypatch.setattr(_sys, "argv", argv)
    buf = _io.StringIO()
    with _rs(buf):
        links_job.main()
    summary = _json.loads([l for l in buf.getvalue().splitlines()
                           if l.startswith("{")][-1])

    # the committed extraction keeps everything: 5 links
    raw = spark.read.parquet(str(out / "links" / "bucket=*"))
    assert raw.count() == 5
    # doc 2's two outlinks dropped (nofollow); doc 1's /blocked/x dropped
    # (robots on h1); doc 3's /blocked/x survives (h2 has no robots row)
    assert summary["n_links"] == 2
    assert summary["n_links_dropped_hygiene"] == 3
    anchors = {r["anchor"] for r in
               spark.read.parquet(str(out / "anchors")).collect()}
    assert anchors == {"K1", "FreeHost"}


def test_crawl_frontier_composition(spark):
    """Frontier = sitemap URLs (max priority across sitemaps, non-http
    locs excluded) gated through robots, minus the seen set, top-k per
    host by (priority desc NULLS LAST, url)."""
    entries = spark.createDataFrame(
        [
            ("s1", "url", "https://h1.example/a", "", 300),
            ("s2", "url", "https://h1.example/a", "", 900),   # max wins
            ("s1", "url", "https://h1.example/b", "", None),  # nulls last
            ("s1", "url", "https://h1.example/c", "", 500),
            ("s1", "url", "https://h1.example/seen", "", 999),
            ("s1", "url", "https://h1.example/blocked/x", "", 999),
            ("s1", "sitemap", "https://h1.example/child.xml", "", None),
            ("s1", "url", "not-a-url", "", 100),
            ("s1", "url", "https://h2.example/only", "", None),
        ],
        "sitemap_url string, kind string, loc string, lastmod string,"
        " priority_milli long",
    )
    robots = spark.createDataFrame(
        [("h1.example", "User-agent: *\nDisallow: /blocked/")],
        "host string, body string",
    )
    rules = LK.robots_rules(robots, "ocrbot")
    seen = spark.createDataFrame(
        [("https://h1.example/seen",)], "url string"
    )
    got = [
        (r["host"], r["url"], r["priority_milli"], r["fetch_rank"])
        for r in LK.crawl_frontier(entries, rules, seen, k=2)
        .orderBy("host", "fetch_rank")
        .collect()
    ]
    assert got == [
        ("h1.example", "https://h1.example/a", 900, 1),
        ("h1.example", "https://h1.example/c", 500, 2),
        ("h2.example", "https://h2.example/only", None, 1),
    ]


def _canon(spark, urls):
    import pyspark.sql.functions as F

    df = spark.createDataFrame([(u,) for u in urls], "url string")
    out = df.select("url", LK.url_canonicalize(F.col("url")).alias("c"))
    return {r["url"]: r["c"] for r in out.collect()}


def test_url_canonicalize_subset(spark):
    got = _canon(
        spark,
        [
            "HTTPS://Site.Example:443/a/b/../c/./pg.html?utm_source=x&b=2&a=1#f",
            "http://USER:pw@Host7.example:80//x/y/",
            "https://h.example",
            "http://h.example:8080/a?&&z=1&y=2&",
            "HTTP://A.EXAMPLE/%7EUser/./x",
            "  https://h.example/x#y  ",
            "about.html",
            "mailto:a@b.c",
        ],
    )
    # scheme/host lowercase, default port + fragment + utm_* dropped,
    # dot segments resolved, query sorted
    assert (
        got["HTTPS://Site.Example:443/a/b/../c/./pg.html?utm_source=x&b=2&a=1#f"]
        == "https://site.example/a/c/pg.html?a=1&b=2"
    )
    # userinfo stripped, :80 dropped, duplicate slashes and trailing / kept
    assert got["http://USER:pw@Host7.example:80//x/y/"] == "http://host7.example//x/y/"
    assert got["https://h.example"] == "https://h.example/"
    # non-default port kept; empty params dropped; params sorted bytewise
    assert got["http://h.example:8080/a?&&z=1&y=2&"] == "http://h.example:8080/a?y=2&z=1"
    # path case (incl. percent-escapes) preserved
    assert got["HTTP://A.EXAMPLE/%7EUser/./x"] == "http://a.example/%7EUser/x"
    assert got["  https://h.example/x#y  "] == "https://h.example/x"
    # non-http(s) inputs pass through trimmed
    assert got["about.html"] == "about.html"
    assert got["mailto:a@b.c"] == "mailto:a@b.c"


def _rfc_remove_dot_segments(path: str) -> str:
    """Literal RFC 3986 §5.2.4 — the fuzz reference."""
    inp, out = path, []
    while inp:
        if inp.startswith("../"):
            inp = inp[3:]
        elif inp.startswith("./"):
            inp = inp[2:]
        elif inp.startswith("/./"):
            inp = "/" + inp[3:]
        elif inp == "/.":
            inp = "/"
        elif inp.startswith("/../"):
            inp = "/" + inp[4:]
            if out:
                out.pop()
        elif inp == "/..":
            inp = "/"
            if out:
                out.pop()
        elif inp in (".", ".."):
            inp = ""
        else:
            i = inp.find("/", 1)
            seg, inp = (inp, "") if i < 0 else (inp[:i], inp[i:])
            out.append(seg)
    return "".join(out)


def test_url_canonicalize_dot_segments_fuzz(spark):
    """Random dot-segment paths (nesting ≤ DOT_SEGMENT_PASSES) must match
    the literal RFC algorithm."""
    import random

    rng = random.Random(403)
    paths = []
    for _ in range(300):
        n = rng.randint(1, LK.DOT_SEGMENT_PASSES)
        segs = [rng.choice(["a", "bb", "c7", ".", "..", ".h", "..x"]) for _ in range(n)]
        paths.append("/" + "/".join(segs) + rng.choice(["", "/"]))
    urls = [f"https://h.example{p}" for p in paths]
    got = _canon(spark, urls)
    for p, u in zip(paths, urls):
        want = _rfc_remove_dot_segments(p) or "/"
        assert got[u] == f"https://h.example{want}", (p, got[u], want)


def test_links_job_canonicalize(spark, tmp_path, monkeypatch):
    """--canonicalize: derived tables key on canonical URLs (utm-tagged /
    default-port / unsorted-query aliases collapse), links/ stays raw."""
    import sys as _sys

    from jobs import links_job

    pages = spark.createDataFrame(
        [
            (
                1,
                "https://a.example/d/page.html",
                '<a href="HTTPS://B.Example:443/x?utm_source=s&b=1&a=2#f">one</a>'
                '<a href="https://b.example/x?a=2&b=1">two</a>',
            )
        ],
        "doc_id long, base_uri string, html string",
    )
    src = tmp_path / "pages"
    pages.write.parquet(str(src))
    out = tmp_path / "out"
    argv = [
        "links_job.py", "--input", str(src), "--output", str(out),
        "--format", "parquet", "--buckets", "2", "--canonicalize",
    ]
    monkeypatch.setattr(_sys, "argv", argv)
    links_job.main()

    raw = spark.read.parquet(str(out / "links" / "bucket=*"))
    assert raw.select("url").distinct().count() == 2  # committed record raw
    canon = spark.read.parquet(str(out / "links_canonical"))
    urls = {r["url"] for r in canon.collect()}
    assert urls == {"https://b.example/x?a=2&b=1"}  # aliases collapsed
    assert canon.count() == 2  # rows kept, keys merged
    assert {r["dst_host"] for r in canon.collect()} == {"b.example"}


def test_feed_entries_rss_and_atom(spark):
    """RSS items and Atom entries parse to one row per entry: RSS link is
    element text (whitespace-trimmed, entities decoded, &amp; last); the
    Atom link is the first <link> with no rel or rel=alternate (rel=self
    skipped, attribute case free, both quote styles); published is the raw
    pubDate/updated string; linkless children drop; feed-level title/link
    elements outside item/entry blocks never leak into rows."""
    rss = (
        "<rss><channel><title>Chan</title><link>https://a.example/</link>"
        "<item><title>Post &amp; one</title>"
        "<link> https://a.example/p?x=1&amp;y=2 </link>"
        "<pubDate>Mon, 02 Jan 2026 03:04:05 GMT</pubDate></item>"
        "<item><link>https://a.example/bare</link></item>"
        "<item><title>no link</title></item>"
        "<Item><title>Esc &amp;lt;t&amp;gt;</title>"
        "<link>https://a.example/esc</link></Item></channel></rss>"
    )
    atom = (
        '<feed><title>Feed</title><link rel="self" href="https://b.example/f.xml"/>'
        '<entry><title>One</title><link rel="self" href="https://b.example/self1"/>'
        '<link rel="alternate" href="https://b.example/e1"/>'
        "<updated>2026-02-03T04:05:06Z</updated></entry>"
        "<entry><title>Two</title><link href='https://b.example/e2'/></entry>"
        '<entry><title>UC</title><link REL=\'ALTERNATE\' HREF="https://b.example/uc"/></entry>'
        "<entry><title>orphan</title></entry></feed>"
    )
    df = spark.createDataFrame(
        [("https://a.example/feed.xml", rss), ("https://b.example/feed.xml", atom)],
        "feed_url string, xml string",
    )
    rows = LK.feed_entries(df).collect()
    by_loc = {r["loc"]: r for r in rows}
    assert len(rows) == 6  # two linkless children dropped
    r1 = by_loc["https://a.example/p?x=1&y=2"]
    assert (r1["kind"], r1["title"]) == ("rss", "Post & one")
    assert r1["published"] == "Mon, 02 Jan 2026 03:04:05 GMT"
    assert by_loc["https://a.example/bare"]["title"] == ""
    assert by_loc["https://a.example/esc"]["title"] == "Esc &lt;t&gt;"
    a1 = by_loc["https://b.example/e1"]
    assert (a1["kind"], a1["published"]) == ("atom", "2026-02-03T04:05:06Z")
    assert "https://b.example/self1" not in by_loc  # rel=self never chosen
    assert by_loc["https://b.example/e2"]["title"] == "Two"
    assert by_loc["https://b.example/uc"]["kind"] == "atom"


def test_feed_links_autodiscovery(spark):
    """<link rel=alternate type=application/(rss|atom)+xml> hrefs resolve
    against the page base; stylesheet/rel=me/non-feed-type links are
    decoys; uppercase tag and attribute names parse; pages with no feed
    links yield no rows."""
    h0 = (
        '<link rel="alternate" type="application/rss+xml" title="R" '
        'href="/feeds/all.rss">'
        '<link rel="stylesheet" type="text/css" href="/s.css">'
        "<LINK TYPE='application/atom+xml' REL='alternate' HREF='atom.xml'>"
        "<link rel='me' type='application/rss+xml' href='/no.rss'>"
        '<link rel="alternate" type="application/json" href="/f.json">'
    )
    df = spark.createDataFrame(
        [
            (1, "https://a.example/dir/page.html", h0),
            (2, "https://b.example/x.html", "<p>no feeds</p>"),
        ],
        "doc_id long, base_uri string, html string",
    )
    rows = LK.feed_links(df).collect()
    got = {(r["feed_url"], r["feed_type"]) for r in rows}
    assert got == {
        ("https://a.example/feeds/all.rss", "rss"),
        ("https://a.example/dir/atom.xml", "atom"),
    }
    assert all(r["doc_id"] == 1 for r in rows)


def test_web_date_iso_formats_and_ranges(spark):
    """ISO 8601, RFC 822 pubDate, and 'Month D, YYYY' all normalize to
    YYYY-MM-DD; out-of-range months/days and unrecognized strings yield
    ''; single-digit days pad; ISO wins when multiple formats appear."""
    cases = [
        ("2026-03-04T05:06:07Z", "2026-03-04"),
        ("2026-03-04", "2026-03-04"),
        ("Mon, 02 Jan 2026 03:04:05 GMT", "2026-01-02"),
        ("2 jan 2026", "2026-01-02"),
        ("January 2, 2026", "2026-01-02"),
        ("SEPTEMBER 30 2025", "2025-09-30"),
        ("2026-13-04", ""),  # month out of range
        ("2026-00-10", ""),
        ("45 Jan 2026", ""),  # day out of range
        ("yesterday", ""),
        ("", ""),
        (None, ""),
        ("2026-05-06 or Mon, 02 Jan 2026", "2026-05-06"),  # ISO precedence
    ]
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, c[0]) for i, c in enumerate(cases)], "i long, s string"
    )
    got = {
        r["i"]: r["d"]
        for r in df.select("i", LK.web_date_iso(F.col("s")).alias("d")).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, cases[i], got[i])


def test_links_job_discover_feeds(spark, tmp_path, monkeypatch):
    """--discover-feeds writes the feeds/ fetch list from the same
    committed pages (parquet input carrying autodiscovery links), and the
    summary reports n_feed_links."""
    import sys as _sys

    from jobs import links_job
    from pyspark.sql import functions as F  # noqa: F401

    pages = spark.createDataFrame(
        [
            (
                1,
                "https://a.example/dir/p.html",
                '<link rel="alternate" type="application/rss+xml" '
                'href="/all.rss"><a href="/x">x</a>',
            ),
            (2, "https://b.example/q.html", "<a href='/y'>y</a>"),
        ],
        "doc_id long, base_uri string, html string",
    )
    pdir = tmp_path / "pages"
    pages.write.parquet(str(pdir))
    out = tmp_path / "out"
    argv = [
        "links_job.py", "--input", str(pdir), "--format", "parquet",
        "--output", str(out), "--buckets", "2", "--discover-feeds",
    ]
    monkeypatch.setattr(_sys, "argv", argv)
    import io as _io
    import json as _json
    from contextlib import redirect_stdout as _rs

    buf = _io.StringIO()
    with _rs(buf):
        links_job.main()
    summary = _json.loads(
        [l for l in buf.getvalue().splitlines() if l.startswith("{")][-1]
    )
    feeds = spark.read.parquet(str(out / "feeds")).collect()
    assert summary["n_feed_links"] == 1 == len(feeds)
    assert feeds[0]["feed_url"] == "https://a.example/all.rss"
    assert feeds[0]["feed_type"] == "rss"


def test_robots_crawl_delay_group_semantics(spark):
    """Exact-agent group beats star (star's larger delay loses); multiple
    applicable groups take the conservative MAX; fractional seconds
    truncate to exact milli-units; malformed and absent values are NULL;
    comments strip before parsing."""
    rows = [
        ("a", "User-agent: *\nCrawl-delay: 2.0019\nDisallow: /x"),
        ("b", "User-agent: ocrbot\nCrawl-delay: 1.5\n\nUser-agent: *\nCrawl-delay: 9"),
        ("c", "User-agent: *\nCrawl-delay: fast"),
        ("d", "User-agent: *\nDisallow: /y"),
        ("e", "User-agent: ocrbot\nCrawl-delay: 1\nUser-agent: ocrbot # dup\nCrawl-delay: 3"),
        ("f", "Crawl-delay: 7"),  # before any group: invalid, dropped
    ]
    df = spark.createDataFrame(rows, "host string, body string")
    got = {
        r["host"]: r["delay_millis"]
        for r in LK.robots_crawl_delay(df, "ocrbot").collect()
    }
    assert got == {"a": 2001, "b": 1500, "c": None, "d": None,
                   "e": 3000, "f": None}


def test_frontier_schedule_timeline(spark):
    """fetch_at = (rank-1) x effective delay; hosts with no declared
    delay take the default; declared hosts use theirs."""
    frontier = spark.createDataFrame(
        [
            ("a.example", "https://a.example/1", 1),
            ("a.example", "https://a.example/2", 2),
            ("b.example", "https://b.example/1", 1),
            ("b.example", "https://b.example/2", 2),
        ],
        "host string, url string, fetch_rank long",
    )
    delays = spark.createDataFrame(
        [("a.example", 2500)], "host string, delay_millis long"
    )
    got = {
        (r["host"], r["fetch_rank"]): (r["delay_millis"], r["fetch_at_millis"])
        for r in LK.frontier_schedule(frontier, delays).collect()
    }
    assert got[("a.example", 1)] == (2500, 0)
    assert got[("a.example", 2)] == (2500, 2500)
    assert got[("b.example", 1)] == (1000, 0)  # default politeness
    assert got[("b.example", 2)] == (1000, 1000)


# --- crawl snapshot diff ------------------------------------------------------


def test_crawl_diff_all_statuses(spark):
    from ocr_spark.operators.links import crawl_diff

    old = spark.createDataFrame(
        [
            ("u/keep", "same body"),
            ("u/edit", "old body"),
            ("u/gone", "was here"),
            ("u/dup", "zz"),  # within-drop URL repeat: min-md5 canonical
            ("u/dup", "aa"),
        ],
        "url string, text string",
    )
    new = spark.createDataFrame(
        [
            ("u/keep", "same body"),
            ("u/edit", "new body"),
            ("u/born", "fresh page"),
            ("u/dup", "aa"),
        ],
        "url string, text string",
    )
    out = {r.url: r for r in crawl_diff(old, new).collect()}
    assert out["u/keep"].status == "unchanged"
    assert out["u/edit"].status == "changed"
    assert out["u/gone"].status == "removed" and out["u/gone"].new_md5 is None
    assert out["u/born"].status == "added" and out["u/born"].old_md5 is None
    # min-digest canonicalization: md5("aa") < md5("zz") picks "aa" -> unchanged
    import hashlib

    lo = min(hashlib.md5(b"aa").hexdigest(), hashlib.md5(b"zz").hexdigest())
    assert out["u/dup"].old_md5 == lo
    assert out["u/dup"].status == (
        "unchanged" if lo == hashlib.md5(b"aa").hexdigest() else "changed"
    )
    assert len(out) == 5


def test_crawl_diff_null_text_and_empty_drop(spark):
    from ocr_spark.operators.links import crawl_diff

    old = spark.createDataFrame([("u/n", None)], "url string, text string")
    new = spark.createDataFrame([], "url string, text string")
    out = crawl_diff(old, new).collect()
    assert len(out) == 1 and out[0].status == "removed"
    # null body digests as empty string, never raises
    assert out[0].old_md5 is not None


# --- paginated-article stitching ----------------------------------------------


def test_stitch_paginated_query_and_path_forms(spark):
    from ocr_spark.operators.links import stitch_paginated

    rows = [
        # query-param series: bare page 1 (other param survives in the key)
        (1, "https://a.example/art/7?id=7", "part one"),
        (2, "https://a.example/art/7?id=7&page=2", "part two"),
        (3, "https://a.example/art/7?id=7&page=3", "part three"),
        # path series, pages out of crawl order + a missing middle page
        (10, "https://b.example/post/page/3", "tail"),
        (11, "https://b.example/post", "head"),
        # solo page
        (20, "https://c.example/solo", "alone"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, text string")
    out = {r.series_key: r for r in stitch_paginated(df).collect()}
    a = out["https://a.example/art/7?id=7"]
    assert a.root_doc_id == 1 and a.n_parts == 3
    assert a.full_text == "part one\npart two\npart three"
    assert (a.first_page, a.last_page) == (1, 3)
    b = out["https://b.example/post"]
    assert b.root_doc_id == 11 and b.n_parts == 2
    assert b.full_text == "head\ntail" and b.last_page == 3
    c = out["https://c.example/solo"]
    assert c.n_parts == 1 and c.full_text == "alone" and c.first_page == 1


def test_stitch_paginated_duplicate_fetch_and_empty_text(spark):
    from ocr_spark.operators.links import stitch_paginated

    rows = [
        (5, "https://d.example/x?page=2", "kept"),
        (9, "https://d.example/x?page=2", "later refetch loses"),
        (6, "https://d.example/x", ""),  # empty page-1 text skipped in join
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, text string")
    r = stitch_paginated(df).collect()
    assert len(r) == 1
    assert r[0].root_doc_id == 6 and r[0].n_parts == 2
    assert r[0].full_text == "kept"
