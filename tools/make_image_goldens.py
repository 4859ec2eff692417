"""Golden parquet files for the binary-out image queries' DuckDB oracles.

CLAHE/Otsu/Gauss kernels are not expressible as a portable SQL string, so
the oracle for `image_preprocess` / `image_denoise` / `image_enhance_text`
/ `image_resize` reads a COMMITTED golden parquet instead
(`read_parquet(...)` is legal oracle SQL). The goldens are produced here
driver-side in pure numpy — same kernels, zero Spark — over the same
deterministic synthetic corpus the queries use, and checked into
tests/golden/.

What the resulting hash-green rows then prove: the Spark side (binary
decode → mapInPandas batch shape → kernel → re-encode → checksum columns)
reproduces the kernel output byte-for-byte on every partition layout.
Kernel CORRECTNESS against the reference chain is carried by the pytest
byte-parity goldens in tests/test_image.py; staleness of these files is
caught by tests/test_image.py::test_image_golden_parquets_fresh, which
regenerates in memory and compares.

Usage: python tools/make_image_goldens.py   (rewrites tests/golden/*.parquet)
"""

from __future__ import annotations

import hashlib
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ocr_spark.operators.image import (  # noqa: E402
    denoise_array,
    enhance_text_quality_array,
    phash_array,
    preprocess_array,
    resize_nearest_array,
    synth_image_array,
    synth_near_dup_array,
)

# must mirror plans/entry_queries._IMG_N/_IMG_W/_IMG_H and the query params
N, W, H = 64, 48, 32
NDUP_N, NDUP_BASE = 60, 20  # mirror q_image_dedup_phash
PREPROCESS_FLOOR = 256
RESIZE_W, RESIZE_H = 24, 16

GOLDEN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "golden"
)


def _md5(img: np.ndarray) -> str:
    return hashlib.md5(img.tobytes()).hexdigest()


def golden_tables() -> dict[str, pa.Table]:
    """One table per query, columns exactly matching the query output."""
    ids = list(range(N))
    imgs = [synth_image_array(i, W, H) for i in ids]
    pre = [preprocess_array(img, floor=PREPROCESS_FLOOR) for img in imgs]
    den = [denoise_array(img, "auto") for img in imgs]
    enh = [enhance_text_quality_array(img) for img in imgs]
    res = [resize_nearest_array(img, RESIZE_W, RESIZE_H) for img in imgs]

    def checksum_table(outs: list[np.ndarray]) -> pa.Table:
        return pa.table(
            {
                "image_id": pa.array(ids, pa.int64()),
                "n_bytes": pa.array([o.size for o in outs], pa.int64()),
                "data_md5": pa.array([_md5(o) for o in outs], pa.string()),
            }
        )

    ndup = [synth_near_dup_array(i, NDUP_BASE, W, H) for i in range(NDUP_N)]
    return {
        "image_phash": pa.table(
            {
                "image_id": pa.array(list(range(NDUP_N)), pa.int64()),
                "phash": pa.array([phash_array(im) for im in ndup], pa.int64()),
            }
        ),
        "image_preprocess": checksum_table(pre),
        "image_denoise": checksum_table(den),
        "image_enhance_text": checksum_table(enh),
        "image_resize": pa.table(
            {
                "image_id": pa.array(ids, pa.int64()),
                "width": pa.array([o.shape[1] for o in res], pa.int64()),
                "height": pa.array([o.shape[0] for o in res], pa.int64()),
                "data_md5": pa.array([_md5(o) for o in res], pa.string()),
            }
        ),
    }


def main() -> None:
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name, table in golden_tables().items():
        path = os.path.join(GOLDEN_DIR, f"{name}.parquet")
        pq.write_table(table, path)
        print(f"wrote {path} ({table.num_rows} rows)")


if __name__ == "__main__":
    main()
