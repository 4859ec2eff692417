"""HTML boilerplate strip (Boilerpipe NumWordsRules) — operators/boilerplate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_spark.operators import boilerplate as BP


def _extract(spark, html):
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    return BP.extract_html_documents(df).first()


def _blocks(spark, html):
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    return df.select(BP.html_blocks(F.col("html")).alias("b")).first()["b"]


LONG_P = (
    "<p>This paragraph carries a comfortably large number of genuinely "
    "meaningful words so that any shallow text feature classifier will "
    "count well past the sixteen word threshold used by the tree.</p>"
)


def test_block_segmentation_and_features(spark):
    html = '<div><p>Hello world</p><p>Visit <a href="/x">our links page</a> now</p></div>'
    b = _blocks(spark, html)
    assert [x["text"] for x in b] == ["Hello world", "Visit our links page now"]
    assert [x["n_words"] for x in b] == [2, 5]
    # anchor text "our links page" = 14 chars of 24-char text
    assert b[1]["link_density"] == pytest.approx(14 / 24)
    assert [x["depth"] for x in b] == [1, 1]


def test_tag_depth_tracks_nesting(spark):
    html = "<div>top<div><ul><li>deep item text</li></ul></div>after</div>"
    b = _blocks(spark, html)
    by_text = {x["text"]: x["depth"] for x in b}
    assert by_text["top"] == 1
    assert by_text["deep item text"] == 3  # div > div > ul
    assert by_text["after"] == 1  # back out of the inner div/ul


def test_classifier_drops_nav_and_footer_keeps_body(spark):
    html = (
        '<div class="nav"><a>Home</a> <a>About</a> <a>Contact</a></div>'
        + "<div>" + LONG_P + LONG_P + "</div>"
        + '<div class="footer"><a>All rights reserved forever</a></div>'
    )
    r = _extract(spark, html)
    assert r["n_blocks"] == 4
    assert r["n_content_blocks"] == 2
    assert "meaningful words" in r["main_text"]
    assert "Home" not in r["main_text"]
    assert "rights reserved" not in r["main_text"]
    assert r["boiler_chars"] > 0


def test_short_isolated_text_is_boilerplate(spark):
    r = _extract(spark, "<p>tiny snippet</p>")
    assert r["n_content_blocks"] == 0 and r["main_text"] == ""


def test_short_block_between_long_neighbors_is_content(spark):
    # curr<=16 words but next>15 words → CONTENT by the tree
    html = LONG_P + "<p>short bridge sentence</p>" + LONG_P
    r = _extract(spark, html)
    assert r["n_content_blocks"] == 3
    assert "short bridge sentence" in r["main_text"]


def test_high_link_density_is_always_boilerplate(spark):
    html = "<p><a>Every single word of this long enough block lives inside one anchor tag and therefore scores full link density</a></p>"
    r = _extract(spark, html)
    assert r["n_content_blocks"] == 0


def test_null_and_empty_html(spark):
    df = spark.createDataFrame([(1, None), (2, "")], "doc_id long, html string")
    rows = {r["doc_id"]: r for r in BP.extract_html_documents(df).collect()}
    for i in (1, 2):
        assert rows[i]["n_blocks"] == 0
        assert rows[i]["main_text"] == ""
        assert rows[i]["boiler_chars"] == 0
