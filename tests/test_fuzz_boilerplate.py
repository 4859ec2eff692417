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
