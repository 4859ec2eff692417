"""Streaming span assembly — the reference's per-document dataflow as a
custom stateful Structured Streaming operator (SURVEY.md §2.9).

Spans for a document may arrive across many micro-batches (a crawler
emitting pages, an OCR fleet emitting boxes). State per ``doc_id``
accumulates (kind, text, media_ref, offset) tuples; the ordered sequence
(the same span-sequence contract as the batch pipeline: order = rank of
offset among kept spans) is emitted when either

- a finalize marker arrives (a span with kind='eof'), or
- the group times out (no new spans for ``FLUSH_MS``) — the crash-safe
  flush for documents whose producer died mid-stream.

Boilerplate spans are dropped with the SAME rule as the batch path
(operators/spans.is_boilerplate), applied batch-side as a plain filter so
the stateful operator only ever stores kept spans. The batch twin of this
operator is operators/spans.assemble_spans; the test suite checks the two
produce identical sequences on the same input.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ocr_spark.operators.spans import is_boilerplate

FLUSH_MS = 30_000

OUT_SCHEMA = (
    "doc_id long, spans array<struct<kind:string,text:string,media_ref:string,order:int>>, "
    "finalized boolean"
)
STATE_SCHEMA = (
    "kinds array<string>, texts array<string>, refs array<string>, offsets array<long>"
)


def _emit(doc_id: int, kinds, texts, refs, offsets, finalized: bool) -> pd.DataFrame:
    # Tie-break duplicate offsets by the full tuple — identical to the batch
    # twin's sort_array over (offset, kind, text, media_ref) structs. Arrival
    # index would be nondeterministic across micro-batch boundaries/retries.
    # Spark's ascending struct ordering puts null fields FIRST; mirror that
    # with (is-not-null, value) sub-keys.
    def _nf(v):  # null-first ordering of an optional string, Spark-style
        return (v is not None, v if v is not None else "")

    order = sorted(
        range(len(offsets)),
        key=lambda i: (offsets[i], _nf(kinds[i]), _nf(texts[i]), _nf(refs[i])),
    )
    spans = [
        {"kind": kinds[i], "text": texts[i], "media_ref": refs[i], "order": rank}
        for rank, i in enumerate(order)
    ]
    return pd.DataFrame({"doc_id": [doc_id], "spans": [spans], "finalized": [finalized]})


def _assemble_group(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    (doc_id,) = key
    kinds, texts, refs, offsets = ([], [], [], []) if not state.exists else [
        list(x) for x in state.get
    ]
    saw_eof = False
    for pdf in pdfs:
        for kind, text, ref, off in zip(
            pdf["kind"].tolist(), pdf["text"].tolist(), pdf["media_ref"].tolist(), pdf["offset"].tolist()
        ):
            if kind == "eof":
                saw_eof = True
                continue
            kinds.append(kind)
            texts.append(text)
            refs.append(ref)
            offsets.append(int(off))
    if saw_eof:
        yield _emit(int(doc_id), kinds, texts, refs, offsets, True)
        state.remove()
    elif state.hasTimedOut:
        if offsets:
            yield _emit(int(doc_id), kinds, texts, refs, offsets, False)
        state.remove()
    else:
        state.update((kinds, texts, refs, offsets))
        state.setTimeoutDuration(FLUSH_MS)


def assemble_spans_stream(span_rows: DataFrame) -> DataFrame:
    """Input (streaming): (doc_id, kind, text, media_ref, offset) rows.
    Output (append): (doc_id, spans, finalized) — one row per assembled doc."""
    kept = span_rows.filter(
        (F.col("kind") == "eof")
        | (F.col("kind") == "media")
        | ~is_boilerplate(F.col("text"))
    )
    return kept.groupBy("doc_id").applyInPandasWithState(
        _assemble_group,
        OUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.ProcessingTimeTimeout,
    )
