"""Image/noise operators (SURVEY.md §2.8) — Spark plumbing + numpy math."""

from __future__ import annotations

import numpy as np
import pytest

from ocr_spark.operators import image as I


@pytest.fixture(scope="module")
def images(spark):
    return I.synth_images(spark, n=12)


def test_decode_roundtrip():
    img = I.synth_image_array(7)
    assert I.decode_gray(img.tobytes(), 48, 32).tolist() == img.tolist()


def test_decode_failure_stub():
    out = I.decode_gray(b"short", 48, 32)
    assert out.shape == (100, 100) and (out == 255).all()
    assert I.decode_gray(None, 48, 32).shape == (100, 100)


def test_noise_stats_matches_numpy(spark, images):
    rows = {r["image_id"]: r for r in I.noise_stats(images).collect()}
    assert len(rows) == 12
    for i in range(12):
        img = I.synth_image_array(i)
        r = rows[i]
        assert r["noise_level"] == pytest.approx(min(img.std() / 255.0, 1.0))
        assert r["mean_intensity"] == pytest.approx(img.mean())
        assert r["contrast"] == pytest.approx(img.std() / img.mean())
        assert (r["height"], r["width"], r["pixel_count"]) == (32, 48, 32 * 48)


def test_preprocess_binarizes(spark, images):
    # floor=64 keeps the fixtures small; the upscale PATH still runs
    # (48x32 < 64) — the reference-exact floor=3000 logic is identical
    out = {r["image_id"]: r for r in I.preprocess(images, floor=64).collect()}
    for i in range(12):
        arr = I.decode_gray(bytes(out[i]["data"]), out[i]["width"], out[i]["height"])
        vals = set(np.unique(arr).tolist())
        assert vals <= {0, 255}
        assert arr.mean() >= 127  # invert-if-dark guarantees light background
        # matches the pure-numpy chain exactly
        want = I.preprocess_array(I.synth_image_array(i), floor=64)
        assert arr.tolist() == want.tolist()


def test_upscale_floor_scales_smaller_side_to_floor():
    img = I.synth_image_array(3)  # 32x48
    up = I.upscale_floor(img, floor=96)
    # scale = max(96/32, 96/48) = 3 → 96x144
    assert up.shape == (96, 144)
    # already large enough → untouched (same object semantics not required)
    assert I.upscale_floor(up, floor=96).shape == up.shape


def test_lanczos_resize_identity_and_flat():
    img = I.synth_image_array(5)
    assert I.lanczos_resize(img, *img.shape).tolist() == img.tolist()  # identity
    flat = np.full((10, 10), 77, dtype=np.uint8)
    assert (I.lanczos_resize(flat, 25, 30) == 77).all()  # flat stays flat


def test_preprocess_full_chain_order():
    """The chain must equal the hand-applied reference order
    (ocr_service.py:238-285): upscale→contrast→gauss→CLAHE(16)→otsu→invert→close."""
    img = I.synth_image_array(1)
    x = I.upscale_floor(img, 64)
    x = I.contrast_scale(x)
    x = np.clip(np.floor(I.conv2d_replicate(x, I.GAUSS_3X3) + 0.5), 0, 255).astype(np.uint8)
    x = I.clahe(x, clip_limit=2.0, tiles=16)
    t = I.otsu_threshold(x)
    b = np.where(x > t, np.uint8(255), np.uint8(0))
    if b.mean() < 127:
        b = 255 - b
    b = I._minmax2(b, np.max)
    b = I._minmax2(b, np.min)
    assert I.preprocess_array(img, floor=64).tolist() == b.tolist()


def test_remove_artifacts_drops_small_components():
    img = np.zeros((20, 20), dtype=np.uint8)
    img[2:6, 2:6] = 255        # 16 px — kept
    img[10, 10] = 255          # 1 px — dropped
    img[15, 15] = img[16, 16] = img[17, 17] = 255  # 3 px diagonal (8-conn) — dropped
    out = I.remove_artifacts_array(img, min_size=10)
    assert (out[2:6, 2:6] == 255).all()
    assert out[10, 10] == 0 and out[15, 15] == 0
    # 8-connectivity: an L of 10 diagonal+straight pixels is ONE component
    img2 = np.zeros((20, 20), dtype=np.uint8)
    for i in range(10):
        img2[i, i] = 255
    assert (I.remove_artifacts_array(img2, min_size=10)[range(10), range(10)] == 255).all()


def test_remove_artifacts_binarizes_output():
    img = np.zeros((8, 8), dtype=np.uint8)
    img[0:4, 0:4] = 120  # nonzero counts as foreground, output is 255
    out = I.remove_artifacts_array(img, min_size=10)
    assert (out[0:4, 0:4] == 255).all() and set(np.unique(out)) <= {0, 255}


def test_enhance_text_quality_chain(spark, images):
    out = {r["image_id"]: r for r in I.enhance_text(images).collect()}
    for i in (0, 5):
        arr = I.decode_gray(bytes(out[i]["data"]), out[i]["width"], out[i]["height"])
        want = I.enhance_text_quality_array(I.synth_image_array(i))
        assert arr.tolist() == want.tolist()
        assert set(np.unique(arr)) <= {0, 255}


def test_otsu_separates_bimodal():
    img = np.array([[10] * 50 + [240] * 50], dtype=np.uint8)
    t = I.otsu_threshold(img)
    assert 10 <= t < 240


def test_sharpen_identity_on_flat():
    flat = np.full((8, 8), 100, dtype=np.uint8)
    assert (I.sharpen_array(flat) == flat).all()


def test_sharpen_boosts_edges(spark, images):
    out = {r["image_id"]: r for r in I.sharpen(images).collect()}
    img0 = I.synth_image_array(0)
    got = I.decode_gray(bytes(out[0]["data"]), out[0]["width"], out[0]["height"])
    assert got.tolist() == I.sharpen_array(img0).tolist()


def test_median3_removes_salt_pepper():
    img = np.full((10, 10), 128, dtype=np.uint8)
    img[4, 4] = 255
    img[6, 2] = 0
    out = I.median3(img)
    assert (out == 128).all()


def test_clahe_preserves_flat_image_brightness():
    flat = np.full((32, 48), 100, dtype=np.uint8)
    out = I.clahe(flat)
    assert out.shape == flat.shape
    assert len(np.unique(out)) == 1  # flat in → flat out


def test_clahe_stretches_low_contrast():
    img = I.synth_image_array(3)
    low = (img // 4 + 96).astype(np.uint8)  # squeeze contrast
    out = I.clahe(low)
    assert out.std() > low.std()  # contrast enhanced


def test_adaptive_threshold_binary():
    img = I.synth_image_array(2)
    out = I.adaptive_gaussian_threshold(img)
    assert set(np.unique(out).tolist()) <= {0, 255}


def test_denoise_dispatch_paths_differ():
    img = I.synth_image_array(4)
    auto = I.denoise_array(img, "auto")
    gauss = I.denoise_array(img, "gaussian")
    sp = I.denoise_array(img, "salt_pepper")
    assert set(np.unique(auto).tolist()) <= {0, 255}  # auto ends binarized
    assert gauss.shape == sp.shape == img.shape
    assert not np.array_equal(gauss, sp)


def test_denoise_spark_stage(spark, images):
    out = {r["image_id"]: r for r in I.denoise(images, "auto").collect()}
    want = I.denoise_array(I.synth_image_array(1), "auto")
    got = I.decode_gray(bytes(out[1]["data"]), out[1]["width"], out[1]["height"])
    assert got.tolist() == want.tolist()


def test_rotation_candidates_exact():
    img = I.synth_image_array(9)
    cands = I.rotation_candidates(img)
    assert [a for a, _ in cands] == [0, 90, 180, 270]
    assert np.array_equal(cands[2][1], img[::-1, ::-1])  # 180 = flip both
    assert cands[1][1].shape == (48, 32)


def test_resize_nearest_shapes_and_determinism():
    img = I.synth_image_array(8)
    small = I.resize_nearest_array(img, 24, 16)
    assert small.shape == (16, 24)
    assert np.array_equal(small, I.resize_nearest_array(img, 24, 16))
    # identity resize is exact
    assert np.array_equal(I.resize_nearest_array(img, 48, 32), img)


def test_extract_features_hist_sums_to_pixels(spark, images):
    rows = {r["image_id"]: r for r in I.extract_features(images).collect()}
    for i in range(12):
        r = rows[i]
        assert sum(r[f"h{b}"] for b in range(16)) == r["pixel_count"] == 32 * 48
        img = I.synth_image_array(i)
        assert r["mean_intensity"] == pytest.approx(img.astype("int64").sum() / img.size)


def test_rotate_arbitrary_identity_and_flat():
    img = I.synth_image_array(2)
    assert I.rotate_arbitrary(img, 0).tolist() == img.tolist()
    assert I.rotate_arbitrary(img, 360).tolist() == img.tolist()
    flat = np.full((16, 16), 90, dtype=np.uint8)
    assert (I.rotate_arbitrary(flat, 17.3) == 90).all()  # replicate border keeps flat flat


def test_detect_skew_angle_recovers_rotation():
    # a clean band image: aligned → 0; rotated by -6° → detector says +6
    img = I.synth_image_array(4)
    assert I.detect_skew_angle(img) == 0
    rot = I.rotate_arbitrary(img, -6)
    assert I.detect_skew_angle(rot) == 6
    # and the correction visibly restores the row profile
    fixed = I.rotate_arbitrary(rot, 6)
    var = lambda x: float(((x.mean(axis=1) - x.mean()) ** 2).mean())
    assert var(fixed) > var(rot)


def test_adaptive_mean_threshold_binary_and_differs_from_gaussian():
    img = I.synth_image_array(6)
    amt = I.adaptive_mean_threshold(img)
    agt = I.adaptive_gaussian_threshold(img)
    assert set(np.unique(amt).tolist()) <= {0, 255}
    assert amt.shape == img.shape
    assert not np.array_equal(amt, agt)  # mean(15,10) vs gaussian(11,2) windows
    # flat image thresholds to all-white (x > mean - c everywhere)
    flat = np.full((20, 20), 80, dtype=np.uint8)
    assert (I.adaptive_mean_threshold(flat) == 255).all()


def test_image_golden_parquets_fresh():
    """The committed tests/golden/*.parquet oracle files (read by the
    image_preprocess/denoise/enhance_text/resize DuckDB oracles) match an
    in-memory regeneration — catches kernel or fixture drift without Spark."""
    import os
    import sys

    import pyarrow.parquet as pq

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "tools"))
    try:
        from make_image_goldens import GOLDEN_DIR, golden_tables
    finally:
        sys.path.pop(0)

    for name, fresh in golden_tables().items():
        path = os.path.join(GOLDEN_DIR, f"{name}.parquet")
        assert os.path.exists(path), f"missing golden {path}; run tools/make_image_goldens.py"
        committed = pq.read_table(path)
        assert committed.equals(fresh), f"stale golden {name}; run tools/make_image_goldens.py"


def test_phash_banded_pairs_equal_brute_force(spark):
    """The banded equi-join finds EXACTLY the all-pairs hamming set
    (pigeonhole recall guarantee is exact, not probabilistic), at
    several thresholds; pHash is invariant to the small perturbations
    the near-dup corpus applies and separates distinct bases."""
    import numpy as np

    from ocr_spark.operators.image import (
        dedup_phash_pairs,
        phash_array,
        synth_near_dup_array,
        synth_near_dup_images,
    )

    n, n_base = 60, 20
    imgs = synth_near_dup_images(spark, n=n, n_base=n_base)
    hs = [phash_array(synth_near_dup_array(i, n_base)) for i in range(n)]

    for thr in (1, 3, 6):
        exp = sorted(
            (i, j, bin(hs[i] ^ hs[j]).count("1"))
            for i in range(n)
            for j in range(i + 1, n)
            if bin(hs[i] ^ hs[j]).count("1") <= thr
        )
        got = sorted(
            (r["id_a"], r["id_b"], r["hamming"])
            for r in dedup_phash_pairs(imgs, max_hamming=thr).collect()
        )
        assert got == exp

    # same-base generations collapse, distinct bases stay apart (thr=3)
    pairs = {(a, b) for a, b, _ in got if True}
    same = {(i, j) for i in range(n) for j in range(i + 1, n) if i % n_base == j % n_base}
    got3 = {
        (r["id_a"], r["id_b"])
        for r in dedup_phash_pairs(imgs, max_hamming=3).collect()
    }
    assert got3 == same

    # brightness-shift invariance: pHash ignores a uniform +20 offset
    base = synth_near_dup_array(0, n_base)
    shifted = np.clip(base.astype(np.int64) + 20, 0, 255).astype(np.uint8)
    assert bin(phash_array(base) ^ phash_array(shifted)).count("1") <= 2
