"""Never-crash / always-quarantine fuzz for the WARC parser: at crawl
scale every corruption mode WILL occur; the contract is error rows, not
exceptions (sources/warc.parse_warc_bytes docstring)."""

from hypothesis import given, settings
from hypothesis import strategies as st

import ocr_spark.sources.warc as W


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=400))
def test_garbage_never_raises(blob):
    rows = list(W.parse_warc_bytes("f", blob))
    for r in rows:
        assert r.get("error") is not None or r.get("warc_type") is not None


@settings(max_examples=150, deadline=None)
@given(st.data())
def test_single_byte_mutation_quarantines_not_crashes(data):
    base = W.synth_warc_file(0, [2, 8, 14], compress=False)
    idx = data.draw(st.integers(0, len(base) - 1))
    b = data.draw(st.integers(0, 255))
    mutated = base[:idx] + bytes([b]) + base[idx + 1 :]
    rows = list(W.parse_warc_bytes("f", mutated))  # must not raise
    assert rows  # a mutated archive never parses to silence
    errs = [r for r in rows if r.get("error")]
    # no SILENT record loss: a flip inside header/body bytes corrupts that
    # one record's data in place (same row count), while any framing
    # damage that swallows records must leave an error row behind
    n_base = len(list(W.parse_warc_bytes("f", base)))
    assert errs or len(rows) == n_base


@settings(max_examples=80, deadline=None)
@given(st.integers(0, 10_000), st.integers(1, 64))
def test_truncation_always_quarantines_tail(seed, cut):
    base = W.synth_warc_file(seed % 4, [seed % 30, 31 + seed % 30], compress=False)
    trunc = base[: max(1, len(base) - cut)]
    rows = list(W.parse_warc_bytes("f", trunc))
    assert rows
    # the cut record (if the cut landed mid-record) must be an error row,
    # and parsing must have terminated without raising
    for r in rows:
        assert r.get("error") is not None or r.get("warc_type") is not None
