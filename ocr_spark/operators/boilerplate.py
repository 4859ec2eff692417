"""HTML main-content extraction via DOM text-density heuristics — the
Boilerpipe/Readability family (north_star: link-density, tag-depth,
block-fusion), as pure Column expressions with an exact DuckDB twin.

Pipeline (Kohlschütter, Fankhauser, Nejdl — "Boilerplate Detection using
Shallow Text Features", WSDM 2010):

1. **Block segmentation** — split the HTML on block-level tag boundaries
   (p/div/br/h1-6/li/ul/ol/table/tr/td/article/section/header/footer/nav).
   Inline markup (<a>, <b>, <span>) stays inside its block.
2. **Per-block shallow features** — tag-stripped text, word count, anchor-
   text link density, and tag depth (running open-minus-close count of the
   container tags before the block — the "structural depth" feature).
3. **Classification** — the published NumWordsRulesClassifier decision
   tree over (prev, curr, next) word counts and (prev, curr) link
   densities. No model file, no training: the tree IS the classifier.
4. **Block fusion** — adjacent content blocks merge into the main text
   (newline-joined, in document order).

Everything is a higher-order Column expression (no UDF, no parser
library): at 10^12 documents this runs inside whole-stage codegen on the
exploded corpus, and the DuckDB oracle replays every step bit-for-bit
(`__spark_entry__.oracle_sql()['html_extract']`).

The reference repo has no HTML path (it is an OCR/PDF service); this
module implements the north_star's HTML-boilerplate requirement from the
public Boilerpipe algorithm, not from reference code.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ocr_spark.functions.text import py_strip

# block-level boundary tags; (?i) works identically in Java regex and RE2
BLOCK_TAG_RE = (
    r"(?i)</?(?:p|div|br|h[1-6]|li|ul|ol|table|tr|td|article|section|"
    r"header|footer|nav)\b[^>]*>"
)
# container tags that contribute to tag depth (+1 open / -1 close);
# p/br/h*/li/tr/td are leaf-ish separators and stay depth-neutral
_DEPTH_OPEN_RE = r"(?i)^<(?:div|ul|ol|table|article|section|header|footer|nav)\b"
_DEPTH_CLOSE_RE = r"(?i)^</(?:div|ul|ol|table|article|section|header|footer|nav)\b"
_ANCHOR_RE = r"(?is)<a\b[^>]*>(.*?)</a>"
_TAG_RE = r"(?s)<[^>]*>"

# NumWordsRulesClassifier thresholds (Kohlschütter et al., WSDM 2010;
# boilerpipe NumWordsRulesClassifier.java — public algorithm constants)
_CURR_LD_MAX = 0.333333
_PREV_LD_MAX = 0.555556


def _word_count(text: Column) -> Column:
    s = py_strip(text)
    return F.when(s == "", F.lit(0)).otherwise(F.size(F.split(s, r"(?U)\s+")))


def html_blocks(html: Column) -> Column:
    """Array of per-block feature structs:
    (text, n_words, link_density, depth) — empty blocks dropped, document
    order preserved."""
    h = F.coalesce(html, F.lit(""))
    parts = F.split(h, BLOCK_TAG_RE)
    tags = F.regexp_extract_all(h, F.lit(BLOCK_TAG_RE), 0)

    # running depth computed ONCE per document: each boundary tag's ±1/0
    # delta is evaluated a single time (one rlike pair per tag, not per
    # tag×block), then folded into a prefix-sum array. The fold appends one
    # int per step — flat int copies, no re-evaluated lambdas — so
    # pathological HTML (10⁴+ boundary tags) stays linear in regex work
    # where the per-block slice-sum form was quadratic.
    deltas = F.transform(
        tags,
        lambda t: F.when(t.rlike(_DEPTH_OPEN_RE), F.lit(1))
        .when(t.rlike(_DEPTH_CLOSE_RE), F.lit(-1))
        .otherwise(F.lit(0)),
    )
    # prefix[i] (0-based) = depth before block i; prefix has n_tags+1
    # entries — exactly as many as `parts`, so it zips with the blocks.
    # It is passed to zip_with as an ARGUMENT (evaluated once per document),
    # never referenced inside a lambda body, where higher-order functions
    # re-evaluate the whole subtree per element.
    prefix = F.aggregate(
        deltas,
        F.array(F.lit(0)),
        lambda acc, d: F.concat(acc, F.array(F.element_at(acc, -1) + d)),
    )

    def block_struct(part: Column, depth: Column) -> Column:
        text = py_strip(F.regexp_replace(part, _TAG_RE, ""))
        anchor_text = F.array_join(
            F.transform(
                F.regexp_extract_all(part, F.lit(_ANCHOR_RE), 1),
                lambda a: F.regexp_replace(a, _TAG_RE, ""),
            ),
            "",
        )
        ld = F.when(
            F.length(text) > 0,
            F.least(F.length(anchor_text).cast("double") / F.length(text), F.lit(1.0)),
        ).otherwise(F.lit(0.0))
        return F.struct(
            text.alias("text"),
            _word_count(text).alias("n_words"),
            ld.alias("link_density"),
            depth.alias("depth"),
        )

    all_blocks = F.zip_with(parts, prefix, lambda p, d: block_struct(p, d))
    return F.filter(all_blocks, lambda b: b["text"] != "")


def classify_blocks(blocks: Column) -> Column:
    """NumWordsRulesClassifier over (prev, curr, next) — returns a boolean
    array aligned with ``blocks`` (true = main content).

    Tree (WSDM 2010):
      curr.ld <= 1/3:
        prev.ld <= 0.5556:
          curr.words <= 16: next.words <= 15: (prev.words <= 4 → BOILER,
                                               else CONTENT)
                            else CONTENT
          else CONTENT
        else: curr.words <= 40: (next.words <= 17 → BOILER, else CONTENT)
              else CONTENT
      else BOILER

    Out-of-range neighbors count as empty blocks (0 words, 0 density).

    Neighbor access is SHIFTED-ZIP, not indexed lookup: an earlier form
    did ``F.get(blocks, i±1)`` inside the transform lambda, and a lambda
    body re-evaluates every non-lambda-variable subtree per ELEMENT —
    O(n²) in block count once ``blocks`` is a real expression. Here
    ``blocks`` appears only as zip_with/slice ARGUMENTS, each evaluated
    once per row."""
    n = F.size(blocks)
    pad = F.struct(
        F.lit("").alias("text"),
        F.lit(0).alias("n_words"),
        F.lit(0.0).alias("link_density"),
        F.lit(0).alias("depth"),
    )
    # blocks shifted right/left by one, padded with the empty block
    prev = F.when(n == 0, blocks).otherwise(
        F.concat(F.array(pad), F.slice(blocks, 1, n - 1))
    )
    nxt = F.when(n == 0, blocks).otherwise(
        F.concat(F.slice(blocks, 2, n - 1), F.array(pad))
    )
    curr_prev = F.zip_with(
        blocks, prev, lambda c, p: F.struct(c.alias("c"), p.alias("p"))
    )

    def decide(cp: Column, nx: Column) -> Column:
        curr_w = cp["c"]["n_words"]
        curr_ld = cp["c"]["link_density"]
        prev_w = cp["p"]["n_words"]
        prev_ld = cp["p"]["link_density"]
        next_w = nx["n_words"]
        return F.when(
            curr_ld <= _CURR_LD_MAX,
            F.when(
                prev_ld <= _PREV_LD_MAX,
                F.when(
                    curr_w <= 16,
                    F.when(next_w <= 15, prev_w > 4).otherwise(F.lit(True)),
                ).otherwise(F.lit(True)),
            ).otherwise(
                F.when(curr_w <= 40, next_w > 17).otherwise(F.lit(True))
            ),
        ).otherwise(F.lit(False))

    return F.zip_with(curr_prev, nxt, decide)


def extract_main_content(html: Column) -> dict[str, Column]:
    """Full pipeline → dict of output columns:
    main_text (fused content blocks), n_blocks, n_content_blocks,
    max_depth, boiler_chars (chars classified away)."""
    blocks = html_blocks(html)
    flags = classify_blocks(blocks)
    zipped = F.zip_with(blocks, flags, lambda b, f: F.struct(b.alias("b"), f.alias("keep")))
    content = F.filter(zipped, lambda z: z["keep"])
    main_text = F.array_join(F.transform(content, lambda z: z["b"]["text"]), "\n")
    boiler = F.filter(zipped, lambda z: ~z["keep"])
    return {
        "main_text": main_text,
        "n_blocks": F.size(blocks),
        "n_content_blocks": F.size(content),
        "max_depth": F.coalesce(
            F.array_max(F.transform(blocks, lambda b: b["depth"])), F.lit(0)
        ),
        "boiler_chars": F.coalesce(
            F.aggregate(
                boiler, F.lit(0), lambda acc, z: acc + F.length(z["b"]["text"])
            ),
            F.lit(0),
        ),
    }


def extract_html_documents(docs: DataFrame, html_col: str = "html", id_col: str = "doc_id") -> DataFrame:
    """DataFrame surface: (doc_id, main_text, n_blocks, n_content_blocks,
    max_depth, boiler_chars)."""
    cols = extract_main_content(F.col(html_col))
    return docs.select(
        F.col(id_col),
        cols["main_text"].alias("main_text"),
        cols["n_blocks"].cast("int").alias("n_blocks"),
        cols["n_content_blocks"].cast("int").alias("n_content_blocks"),
        cols["max_depth"].cast("int").alias("max_depth"),
        cols["boiler_chars"].cast("long").alias("boiler_chars"),
    )
