"""Seeded fuzz parity for the HTML boilerplate extractor: random adversarial
HTML through the Spark expression pipeline must match the DuckDB oracle —
the same comparison the driver's correctness gate runs, on nastier inputs
than the wrapped documents corpus (nested containers, stray close tags,
anchors straddling word-count thresholds, unicode whitespace, tag soup)."""

from __future__ import annotations

import random

import duckdb
import pytest

from ocr_spark.operators.boilerplate import extract_html_documents
from ocr_spark.plans.entry_queries import _sql_html_extract

_WORDS = [
    "data", "pipeline", "spark", "слово", "текст", "ёж", "x1", "NO", "the",
    "quick", "brown", "fox", "jumps", "über", "naïve",
]
_TAGS_OPEN = ["<div>", "<div class='x'>", "<ul>", "<ol>", "<table>", "<section>", "<nav>"]
_TAGS_CLOSE = ["</div>", "</ul>", "</ol>", "</table>", "</section>", "</nav>"]
_SEP = ["<p>", "</p>", "<br>", "<br/>", "<h2>", "</h2>", "<li>", "</li>", "<tr>", "<td>"]
_WS = [" ", "  ", "\t", "\n", " ", "　"]


def _words(rng: random.Random, n: int) -> str:
    return rng.choice(_WS).join(rng.choice(_WORDS) for _ in range(n))


def _gen_html(rng: random.Random) -> str:
    out = []
    for _ in range(rng.randint(0, 14)):
        roll = rng.random()
        if roll < 0.22:
            out.append(rng.choice(_TAGS_OPEN))
        elif roll < 0.38:
            out.append(rng.choice(_TAGS_CLOSE))  # may be unbalanced — fine
        elif roll < 0.55:
            out.append(rng.choice(_SEP))
        elif roll < 0.72:
            # plain text block, word counts clustered on the classifier's
            # 4/16/17/40 thresholds
            out.append(_words(rng, rng.choice([0, 1, 4, 5, 15, 16, 17, 18, 40, 41, 60])))
        else:
            # anchor-bearing block with tunable link density
            total = rng.choice([3, 5, 10, 20])
            in_anchor = rng.randint(0, total)
            out.append(
                _words(rng, total - in_anchor)
                + f" <a href='/{rng.randint(0, 9)}'>"
                + _words(rng, in_anchor)
                + "</a>"
            )
        if rng.random() < 0.3:
            out.append(rng.choice(_WS))
    return "".join(out)


def _py_boilerpipe(html: str):
    """Linear-time pure-Python twin of operators/boilerplate — used where
    the DuckDB oracle's per-block depth slice (quadratic in tag count)
    would make pathological-HTML parity checks impractically slow."""
    import re

    block_re = re.compile(
        r"</?(?:p|div|br|h[1-6]|li|ul|ol|table|tr|td|article|section|"
        r"header|footer|nav)\b[^>]*>",
        re.I,
    )
    open_re = re.compile(r"^<(?:div|ul|ol|table|article|section|header|footer|nav)\b", re.I)
    close_re = re.compile(r"^</(?:div|ul|ol|table|article|section|header|footer|nav)\b", re.I)
    anchor_re = re.compile(r"<a\b[^>]*>(.*?)</a>", re.I | re.S)
    tag_re = re.compile(r"<[^>]*>", re.S)

    html = html or ""
    parts = block_re.split(html)
    tags = block_re.findall(html)
    depth, blocks = 0, []
    for i, p in enumerate(parts):
        if i > 0:
            t = tags[i - 1]
            depth += 1 if open_re.match(t) else (-1 if close_re.match(t) else 0)
        text = tag_re.sub("", p).strip()
        if text == "":
            continue
        anchor = "".join(tag_re.sub("", a) for a in anchor_re.findall(p))
        ld = min(len(anchor) / len(text), 1.0) if text else 0.0
        blocks.append({"text": text, "n_words": len(text.split()), "ld": ld, "depth": depth})

    def feat(j, f, default):
        return blocks[j][f] if 0 <= j < len(blocks) else default

    flags = []
    for j in range(len(blocks)):
        if feat(j, "ld", 0.0) <= 0.333333:
            if feat(j - 1, "ld", 0.0) <= 0.555556:
                if feat(j, "n_words", 0) <= 16:
                    ok = feat(j - 1, "n_words", 0) > 4 if feat(j + 1, "n_words", 0) <= 15 else True
                else:
                    ok = True
            else:
                ok = feat(j + 1, "n_words", 0) > 17 if feat(j, "n_words", 0) <= 40 else True
        else:
            ok = False
        flags.append(ok)
    main = "\n".join(b["text"] for b, f in zip(blocks, flags) if f)
    return (
        main,
        len(blocks),
        sum(flags),
        max((b["depth"] for b in blocks), default=0),
        sum(len(b["text"]) for b, f in zip(blocks, flags) if not f),
    )


def test_pathological_html_depth_stays_linear(spark):
    """A doc with thousands of boundary tags (the 100×-scale-up HTML the
    per-block slice-sum was quadratic on): correct output, sane wall time.
    The quadratic form evaluated ~2·(2n)² interpreted rlike lambdas per doc
    (~10⁸ at n=3000 — minutes); the prefix-sum form does one regex pair per
    tag."""
    import time

    n = 3000
    body = "".join(
        f"<div>word {'w ' * 19}</div>" if i % 7 else f"<div><a href='/x'>link {i}</a></div>"
        for i in range(n)
    )
    docs = [(i, f"<section>{body}</section>") for i in range(4)]
    df = spark.createDataFrame(docs, "doc_id long, html string")
    t0 = time.monotonic()
    got = {
        r["doc_id"]: (
            r["main_text"], r["n_blocks"], r["n_content_blocks"], r["max_depth"], r["boiler_chars"]
        )
        for r in extract_html_documents(df).collect()
    }
    wall = time.monotonic() - t0
    want = _py_boilerpipe(docs[0][1])
    assert all(v == want for v in got.values())
    assert want[1] == n and want[3] == 2
    assert wall < 60, f"pathological-HTML extraction took {wall:.1f}s — depth likely quadratic again"


@pytest.mark.parametrize("seed", [20260817])
def test_fuzz_html_extract_matches_duckdb_oracle(spark, seed):
    rng = random.Random(seed)
    rows = [(i, _gen_html(rng)) for i in range(150)]
    rows += [(150, ""), (151, None), (152, "<a>only a link</a>"), (153, "no tags at all")]

    df = spark.createDataFrame(rows, "doc_id long, html string")
    got = {
        r["doc_id"]: (
            r["main_text"], r["n_blocks"], r["n_content_blocks"], r["max_depth"], r["boiler_chars"]
        )
        for r in extract_html_documents(df).collect()
    }

    con = duckdb.connect()
    con.execute("CREATE TABLE fuzz_html(doc_id BIGINT, html VARCHAR)")
    con.executemany("INSERT INTO fuzz_html VALUES (?, ?)", rows)
    sql = _sql_html_extract("SELECT doc_id, coalesce(html, '') AS html FROM fuzz_html")
    want = {r[0]: (r[1], r[2], r[3], r[4], r[5]) for r in con.execute(sql).fetchall()}

    assert set(got) == set(want)
    mismatches = [(k, got[k], want[k]) for k in got if got[k] != want[k]]
    assert not mismatches, mismatches[:3]


# --- Readability fuzz parity -------------------------------------------------

_RB_CLASSES = [
    "article", "content", "entry", "main", "post", "story",          # positive
    "sidebar", "comment", "footer", "widget", "promo", "related",    # negative
    "xyz", "wrapper", "",                                            # neutral
]


def _gen_html_readability(rng: random.Random) -> str:
    """Adversarial HTML for the Readability scorer: classed/id'd containers
    (double-quoted, as the extractor matches), nested structures, stray
    closes, script/style/comment decoys, and paragraphs straddling the
    25-char scoring minimum and the /100 length-bonus steps."""
    out = []
    for _ in range(rng.randint(0, 16)):
        roll = rng.random()
        if roll < 0.2:
            cls = rng.choice(_RB_CLASSES)
            idv = rng.choice(_RB_CLASSES)
            attrs = ""
            if cls:
                attrs += f' class="{cls}"'
            if rng.random() < 0.4 and idv:
                attrs += f' id="{idv}"'
            out.append(f"<{rng.choice(['div', 'section', 'table'])}{attrs}>")
        elif roll < 0.34:
            out.append(rng.choice(_TAGS_CLOSE))
        elif roll < 0.42:
            out.append(rng.choice(_SEP))
        elif roll < 0.5:
            out.append(
                rng.choice(
                    [
                        "<script>var d = '<div><p>decoy, decoy</p></div>';</script>",
                        "<style>.x { color: red; }</style>",
                        "<!-- <div><p>ghost, ghost</p></div> -->",
                    ]
                )
            )
        elif roll < 0.75:
            # text with comma density and char counts around 25 and 100
            n = rng.choice([2, 4, 5, 6, 18, 20, 22, 40])
            words = _words(rng, n)
            if rng.random() < 0.5:
                words = words.replace(" ", ", ", rng.randint(1, 3))
            out.append(words)
        else:
            total = rng.choice([4, 10, 24])
            in_anchor = rng.randint(0, total)
            out.append(
                _words(rng, total - in_anchor)
                + f' <a href="/{rng.randint(0, 9)}">'
                + _words(rng, in_anchor)
                + "</a>"
            )
        if rng.random() < 0.25:
            out.append(rng.choice(_WS))
    return "".join(out)


@pytest.mark.parametrize("seed", [20260818])
def test_fuzz_readability_matches_duckdb_oracle(spark, seed):
    from ocr_spark.operators.boilerplate import readability_extract
    from ocr_spark.plans.entry_queries import _sql_readability

    rng = random.Random(seed)
    rows = [(i, _gen_html_readability(rng)) for i in range(150)]
    rows += [
        (150, ""),
        (151, None),
        (152, '<div class="content"><a href="/x">only a link</a></div>'),
        (153, "no tags at all but long enough, with a comma, to score points"),
        (154, "</div></div><div><p>stray closes before, commas, a real container "
              "with enough length</p></div>"),
    ]

    df = spark.createDataFrame(rows, "doc_id long, html string")
    cols = ("main_text", "top_candidate", "top_score", "n_candidates", "n_selected")
    got = {r["doc_id"]: tuple(r[c] for c in cols)
           for r in readability_extract(df).collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE fuzz_html(doc_id BIGINT, html VARCHAR)")
    con.executemany("INSERT INTO fuzz_html VALUES (?, ?)", rows)
    sql = _sql_readability("SELECT doc_id, coalesce(html, '') AS html FROM fuzz_html")
    want = {r[0]: tuple(r[1:]) for r in con.execute(sql).fetchall()}

    assert set(got) == set(want)
    mismatches = [(k, got[k], want[k]) for k in got if got[k] != want[k]]
    assert not mismatches, mismatches[:3]
