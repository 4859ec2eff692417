"""Mega-document linearity regression gate (tools/megadoc_fold_bench.py's
class, in-suite): every audited per-row fold must cost ~the same on
many-short and few-long corpora of equal total volume. A quadratic
regression (an expression re-evaluated inside a higher-order-function
lambda, or per-element substr char indexing) shows up as a wall-clock
ratio proportional to the 40× per-document size gap — the four kills this
round measured 21–62× here while staying invisible at sf0.1.

The limit is deliberately loose (6× vs the observed ~1×) so host-steal
noise on sub-second cells never flakes the suite; a real quadratic is
an order of magnitude past it."""

from __future__ import annotations

import time

import pytest

from tools.megadoc_fold_bench import SHAPE_LONG, SHAPE_SHORT, make_corpus, ops, text_docs

RATIO_LIMIT = 6.0


@pytest.fixture(scope="module")
def corpora(spark):
    short = make_corpus(spark, *SHAPE_SHORT).persist()
    long_ = make_corpus(spark, *SHAPE_LONG).persist()
    ts, tl = text_docs(spark, short).persist(), text_docs(spark, long_).persist()
    short.count(), long_.count(), ts.count(), tl.count()
    yield (short, ts), (long_, tl)
    for df in (short, long_, ts, tl):
        df.unpersist()


def _time(fn, spark, corpus, tdocs) -> float:
    best = float("inf")
    for _ in range(2):  # best-of-2 against host steal
        t0 = time.monotonic()
        fn(spark, corpus, tdocs).write.format("noop").mode("overwrite").save()
        best = min(best, time.monotonic() - t0)
    return best


def test_folds_stay_linear_in_document_size(spark, corpora):
    (short, ts), (long_, tl) = corpora
    bad = {}
    for name, fn in ops().items():
        s = _time(fn, spark, short, ts)
        l = _time(fn, spark, long_, tl)
        if l / max(s, 1e-9) > RATIO_LIMIT:
            bad[name] = round(l / s, 1)
    assert not bad, f"quadratic-in-doc-size suspects (long/short ratio): {bad}"
