"""Metric operators vs pure-Python golden on the reference's own fixture
pairs (FIXTURES.md §2, verbatim from test_api.py:157-183 / demo.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from ocr_spark.functions import metrics as M
from tests import reference_impl as ref

# FIXTURES.md §2 golden pairs (reference test_api.py:157-183, demo.py:21-46,
# demo.py:106-122) + extra edge cases.
PAIRS = [
    ("m1", "Иван Иванов 01.01.2023", "Иван Иванов 01.01.2023"),
    ("m2", "Ивн Ивнов 01.01.202", "Иван Иванов 01.01.2023"),
    ("m3", "Иван Петров 01.01.2023", "Иван Иванов 01.01.2023"),
    ("m4", "Иван 01.01.2023", "Иван Иванов 01.01.2023"),
    ("m5", "Иван Иванов Петрович 01.01.2023", "Иван Иванов 01.01.2023"),
    ("m6", "Ив@н Ив#нов 01.01.2O23 +7(999)123-45-67", "Иван Иванов 01.01.2023 +7(999)123-45-67"),
    ("m7", "Ивн Ивнов 01.01.202 +7(999)123-45-6", "Иван Иванов 01.01.2023 +7(999)123-45-67"),
    ("m8", "Петр Петр0в 02.02.2023", "Петр Петров 02.02.2023"),
    ("m9", "Сидр С1др0в 03.03.2023", "Сидр Сидров 03.03.2023"),
    ("m10", "", "Иван Иванов 01.01.2023"),
    ("m11", "Иван Иванов", ""),
    ("m12", "  ", "  "),
    ("m13", "hello world", "HELLO WORLD"),
    ("m14", "a  b\t c\nd", "a b c d"),
    ("m15", "totally different text", "совершенно другой текст"),
]

METRIC_KEYS = [
    "cer", "wer", "normalized_levenshtein", "exact_match",
    "char_precision", "char_recall", "char_f1",
    "word_precision", "word_recall", "word_f1",
]


@pytest.fixture(scope="module")
def result_rows(spark):
    df = spark.createDataFrame(PAIRS, "case_id string, extracted string, ground_truth string")
    cols = M.all_metrics(F.col("extracted"), F.col("ground_truth"))
    out = df.select("case_id", *[c.alias(k) for k, c in cols.items()])
    return {r["case_id"]: r.asDict() for r in out.collect()}


@pytest.mark.parametrize("case_id,extracted,ground_truth", PAIRS)
def test_metrics_match_reference(result_rows, case_id, extracted, ground_truth):
    expected = ref.all_metrics(extracted, ground_truth)
    got = result_rows[case_id]
    for k in METRIC_KEYS:
        assert math.isclose(got[k], expected[k], rel_tol=1e-12, abs_tol=1e-12), (
            f"{case_id}.{k}: spark={got[k]} expected={expected[k]}"
        )


def test_corpus_rollup(spark):
    df = spark.createDataFrame(PAIRS, "case_id string, extracted string, ground_truth string")
    cols = M.all_metrics(F.col("extracted"), F.col("ground_truth"))
    per_doc = df.select(*[c.alias(k) for k, c in cols.items()])
    row = M.corpus_rollup(per_doc).collect()[0]
    exp = [ref.all_metrics(e, g) for _, e, g in PAIRS]
    assert math.isclose(row["average_cer"], sum(m["cer"] for m in exp) / len(exp), rel_tol=1e-12)
    assert math.isclose(row["average_wer"], sum(m["wer"] for m in exp) / len(exp), rel_tol=1e-12)
    exact_pct = 100.0 * sum(1 for m in exp if m["exact_match"] == 1.0) / len(exp)
    assert math.isclose(row["exact_match_percentage"], exact_pct, rel_tol=1e-12)


def test_noise_metrics_aliases(spark):
    df = spark.createDataFrame([PAIRS[1]], "case_id string, extracted string, ground_truth string")
    cols = M.noise_metrics(F.col("extracted"), F.col("ground_truth"))
    row = df.select(*[c.alias(k) for k, c in cols.items()]).collect()[0]
    assert row["noise_cer"] == row["cer"]
    assert row["noise_wer"] == row["wer"]
