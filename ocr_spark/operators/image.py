"""Image preprocessing / noise operators (SURVEY.md §2.8 I1–I10) as
Arrow-batched UDFs over binary image columns.

The reference runs OpenCV per document (ocr_service.py:237-288,
noise_handler.py:81-360). Here every operator is a vectorized
``mapInPandas`` stage over a `binary` image column carrying raw grayscale
bytes + (width, height) metadata — the canonical multimodal-column shape.
The math is pure numpy (this container has no cv2/PIL):

- I1  decode            bytes → HxW uint8 array (shape from metadata;
                        bad/truncated bytes → white 100x100 stub,
                        ocr_service.py:230-235 behavior)
- I2  preprocess        contrast-scale (α=1.2, β=10, saturating — cv2
                        convertScaleAbs) → 3x3 Gaussian blur → Otsu
                        threshold → invert-if-dark (ocr_service.py:237-288)
- I7  noise_level       std(gray)/255 clamped to 1 (noise_handler.py:186-211)
- I8  noise_stats       level, mean, contrast=std/mean, shape, pixels
                        (noise_handler.py:327-360)
- I9  sharpen           3x3 kernel [[0,-1,0],[-1,5,-1],[0,-1,0]]
                        (noise_handler.py:288-305)

True codec decode (JPEG/PNG) needs PIL/cv2 and is stubbed behind
``real_decode_stub`` in operators/media.py; everything downstream of the
decoded array — schema, batching, partitioning — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

GAUSS_3X3 = np.array([[1, 2, 1], [2, 4, 2], [1, 2, 1]], dtype=np.float64) / 16.0
SHARPEN_3X3 = np.array([[0, -1, 0], [-1, 5, -1], [0, -1, 0]], dtype=np.float64)

STATS_SCHEMA = (
    "image_id long, noise_level double, mean_intensity double, contrast double, "
    "height int, width int, pixel_count long"
)
PROCESSED_SCHEMA = "image_id long, data binary, width int, height int"


# --- decode (I1) ------------------------------------------------------------


def decode_gray(data: bytes | None, width: int, height: int) -> np.ndarray:
    """bytes → HxW uint8; failure → 100x100 white stub (ocr_service.py:230)."""
    if data is None or width <= 0 or height <= 0 or len(data) != width * height:
        return np.full((100, 100), 255, dtype=np.uint8)
    return np.frombuffer(data, dtype=np.uint8).reshape(height, width)


# --- kernels ----------------------------------------------------------------


def conv2d_reflect(img: np.ndarray, kernel: np.ndarray) -> np.ndarray:
    """3x3 convolution with edge replication (cv2 BORDER_REPLICATE)."""
    p = np.pad(img.astype(np.float64), 1, mode="edge")
    out = np.zeros_like(img, dtype=np.float64)
    for dy in range(3):
        for dx in range(3):
            out += kernel[dy, dx] * p[dy : dy + img.shape[0], dx : dx + img.shape[1]]
    return out


def contrast_scale(img: np.ndarray, alpha: float = 1.2, beta: float = 10.0) -> np.ndarray:
    """cv2.convertScaleAbs: saturating |α·x + β| rounded half-away."""
    v = np.abs(alpha * img.astype(np.float64) + beta)
    return np.clip(np.floor(v + 0.5), 0, 255).astype(np.uint8)


def otsu_threshold(img: np.ndarray) -> int:
    """Classic Otsu over the 256-bin histogram; returns the threshold."""
    hist = np.bincount(img.ravel(), minlength=256).astype(np.float64)
    total = img.size
    sum_all = (np.arange(256) * hist).sum()
    sum_b = 0.0
    w_b = 0.0
    best, best_t = -1.0, 0
    for t in range(256):
        w_b += hist[t]
        if w_b == 0:
            continue
        w_f = total - w_b
        if w_f == 0:
            break
        sum_b += t * hist[t]
        m_b = sum_b / w_b
        m_f = (sum_all - sum_b) / w_f
        var = w_b * w_f * (m_b - m_f) ** 2
        if var > best:
            best, best_t = var, t
    return best_t


def preprocess_array(img: np.ndarray) -> np.ndarray:
    """I2 core chain: contrast → Gaussian(3x3) → Otsu binarize → invert-if-dark."""
    x = contrast_scale(img)
    x = np.clip(np.floor(conv2d_reflect(x, GAUSS_3X3) + 0.5), 0, 255).astype(np.uint8)
    t = otsu_threshold(x)
    b = np.where(x > t, np.uint8(255), np.uint8(0))
    if b.mean() < 127:  # mostly dark → invert (ocr_service.py:276-280)
        b = 255 - b
    return b


def sharpen_array(img: np.ndarray) -> np.ndarray:
    """I9: 3x3 sharpen with saturation."""
    return np.clip(np.floor(conv2d_reflect(img, SHARPEN_3X3) + 0.5), 0, 255).astype(np.uint8)


def noise_level_array(img: np.ndarray) -> float:
    """I7: std/255 clamped to 1.0."""
    return min(float(img.std()) / 255.0, 1.0)


# --- Spark surface ----------------------------------------------------------


def _map_images(fn):
    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                img = decode_gray(r["data"], r["width"], r["height"])
                out.append(fn(int(r["image_id"]), img))
            yield pd.DataFrame(out)

    return process


def noise_stats(images: DataFrame) -> DataFrame:
    """I7+I8 over (image_id, data, width, height)."""

    def one(image_id: int, img: np.ndarray) -> dict:
        # exact integer sums → float only at the final division/sqrt, so the
        # DuckDB oracle reproduces every bit (np.mean/np.std use pairwise
        # float summation and would drift in the last ulp)
        n = int(img.size)
        sx = int(img.astype(np.int64).sum())
        sxx = int((img.astype(np.int64) ** 2).sum())
        mean = sx / n
        std = float(np.sqrt((n * sxx - sx * sx) / (float(n) * n)))
        return {
            "image_id": image_id,
            "noise_level": min(std / 255.0, 1.0),
            "mean_intensity": mean,
            "contrast": std / mean if mean > 0 else 0.0,
            "height": img.shape[0],
            "width": img.shape[1],
            "pixel_count": n,
        }

    return images.mapInPandas(_map_images(one), STATS_SCHEMA)


def _encode(image_id: int, img: np.ndarray) -> dict:
    return {
        "image_id": image_id,
        "data": img.tobytes(),
        "width": img.shape[1],
        "height": img.shape[0],
    }


def preprocess(images: DataFrame) -> DataFrame:
    """I2 as a mapInPandas stage (binary in → binary out)."""
    return images.mapInPandas(
        _map_images(lambda i, img: _encode(i, preprocess_array(img))), PROCESSED_SCHEMA
    )


def sharpen(images: DataFrame) -> DataFrame:
    """I9 as a mapInPandas stage."""
    return images.mapInPandas(
        _map_images(lambda i, img: _encode(i, sharpen_array(img))), PROCESSED_SCHEMA
    )


# --- deterministic synthetic image source -----------------------------------


def synth_images(spark: SparkSession, n: int = 64, width: int = 48, height: int = 32) -> DataFrame:
    """Seeded grayscale 'scans': per-image LCG noise + horizontal dark text
    bands — enough structure for Otsu/noise ops to behave like real scans.
    Deterministic (no RNG state), so tests and oracles can re-derive it.
    """
    rows = []
    for i in range(n):
        img = synth_image_array(i, width, height)
        rows.append((i, bytearray(img.tobytes()), width, height))
    return spark.createDataFrame(rows, "image_id long, data binary, width int, height int")


def synth_image_array(seed: int, width: int = 48, height: int = 32) -> np.ndarray:
    idx = np.arange(width * height, dtype=np.int64)
    lcg = (seed * 1103515245 + idx * 12345 + 6789) % 251  # 0..250 noise
    img = (200 + (lcg % 40) - 20).astype(np.int64)  # light background ±20
    img = img.reshape(height, width)
    for band in range(2 + seed % 3):  # dark "text lines"
        y0 = (3 + band * (height // 4)) % max(height - 3, 1)
        img[y0 : y0 + 2, 2 : width - 2] = 30 + (seed % 50)
    return np.clip(img, 0, 255).astype(np.uint8)
