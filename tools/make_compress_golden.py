"""Golden parquet for the compress_ratio query's DuckDB oracle.

zlib is not expressible as a portable SQL string, so (like the image
kernels) the oracle reads a COMMITTED golden parquet regenerated here
driver-side in pure stdlib Python — same zlib level, same deterministic
synthetic corpus (`textstats.synth_compress_text`), zero Spark. The
hash-green driver row then proves the Spark side (mapInPandas batch
shape → zlib → integer micro-ratio) reproduces these numbers on every
partition layout; staleness is guarded by
tests/test_training_ops.py::test_compress_golden_fresh.

Usage: python tools/make_compress_golden.py   (rewrites tests/golden/compress_ratio.parquet)
"""

from __future__ import annotations

import os
import sys
import zlib

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ocr_spark.operators.textstats import (  # noqa: E402
    COMPRESS_LEVEL,
    COMPRESS_MIN_RATIO_MICRO,
    synth_compress_text,
)

N_DOCS = 400


def golden_rows(n: int = N_DOCS) -> list[dict]:
    rows = []
    for i in range(n):
        raw = synth_compress_text(i).encode("utf-8")
        nb = len(raw)
        nz = len(zlib.compress(raw, COMPRESS_LEVEL))
        ratio = (nz * 1_000_000) // nb if nb else 1_000_000
        rows.append(
            {
                "doc_id": i,
                "n_bytes": nb,
                "n_zlib_bytes": nz,
                "zlib_ratio_micro": ratio,
                "too_repetitive": ratio < COMPRESS_MIN_RATIO_MICRO,
            }
        )
    return rows


SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("n_bytes", pa.int64()),
        ("n_zlib_bytes", pa.int64()),
        ("zlib_ratio_micro", pa.int64()),
        ("too_repetitive", pa.bool_()),
    ]
)


def main() -> None:
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests",
        "golden",
        "compress_ratio.parquet",
    )
    pq.write_table(pa.Table.from_pylist(golden_rows(), schema=SCHEMA), out)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
