"""Fast optimise/denoise vs slow oracles (FIXTURES.md §5 rows 3-4).

The reference ships its own slow/fast pairs (optimiser.pyx:22-146 vs
153-429) as the testing precedent; these tests mirror that."""

import numpy as np
import pytest

from archive_pdf_tools_spark.kernels.optimise import (
    fast_mask_denoise, fast_mask_denoise_slow, optimise_gray2,
    optimise_gray_slow, optimise_rgb2, optimise_rgb_slow)


def _rng(seed):
    return np.random.default_rng(seed)


@pytest.mark.parametrize("h,w,n_size,density", [
    (16, 16, 3, 0.3),
    (16, 16, 10, 0.3),
    (64, 64, 3, 0.1),
    (64, 64, 10, 0.5),
    (8, 8, 3, 0.0),    # no mask pixels -> FIR empty, IIR-only + zero fill
    (8, 8, 3, 1.0),    # all-mask -> image unchanged
    (1, 1, 3, 0.5),
    (5, 40, 10, 0.2),
])
def test_optimise_gray_fast_matches_slow(h, w, n_size, density):
    rng = _rng(h * 100 + w + n_size)
    mask = (rng.random((h, w)) < density)
    img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    fast = optimise_gray2(mask, img, n_size)
    slow = optimise_gray_slow(mask, img, n_size)
    np.testing.assert_array_equal(fast, slow)


@pytest.mark.parametrize("h,w,n_size", [(16, 16, 3), (32, 24, 10), (7, 9, 3)])
def test_optimise_rgb_fast_matches_slow(h, w, n_size):
    rng = _rng(h * 7 + w * 3 + n_size)
    mask = (rng.random((h, w)) < 0.25)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    fast = optimise_rgb2(mask, img, n_size)
    slow = optimise_rgb_slow(mask, img, n_size)
    np.testing.assert_array_equal(fast, slow)


def test_optimise_all_mask_is_identity():
    rng = _rng(3)
    img = rng.integers(0, 256, size=(12, 12), dtype=np.uint8)
    mask = np.ones((12, 12), dtype=bool)
    np.testing.assert_array_equal(optimise_gray2(mask, img, 3), img)


def test_optimise_no_mask_zero_fill_top_left():
    """val_count == 0 at (0,0) with empty mask -> 0 (optimiser.pyx:267-269)."""
    img = np.full((6, 6), 99, dtype=np.uint8)
    mask = np.zeros((6, 6), dtype=bool)
    out = optimise_gray2(mask, img, 3)
    assert out[0, 0] == 0


@pytest.mark.parametrize("h,w,density,mincnt,n_size", [
    (12, 12, 0.1, 4, 2),
    (12, 12, 0.5, 4, 2),
    (30, 40, 0.3, 4, 2),
    (30, 40, 0.9, 4, 2),    # dense: feedback chains matter
    (64, 64, 0.05, 4, 2),   # sparse noise
    (20, 20, 0.4, 2, 1),
    (4, 4, 0.5, 4, 2),      # smaller than 2*n+1: untouched
])
def test_denoise_fast_matches_slow(h, w, density, mincnt, n_size):
    rng = _rng(h * 31 + w + int(density * 10))
    mask = (rng.random((h, w)) < density)
    fast = fast_mask_denoise(mask, mincnt, n_size)
    slow = fast_mask_denoise_slow(mask, mincnt, n_size)
    np.testing.assert_array_equal(fast, slow)


def test_denoise_isolated_pixel_removed_cluster_kept():
    mask = np.zeros((12, 12), dtype=bool)
    mask[6, 6] = True                 # isolated
    mask[2:5, 2:5] = True             # 3x3 cluster: every pixel has 8 nbrs
    out = fast_mask_denoise(mask, 4, 2)
    assert not out[6, 6]
    assert out[3, 3]


def test_denoise_exact_mincnt_boundary():
    # A pixel with exactly mincnt neighbours survives ((cnt-1) >= mincnt).
    mask = np.zeros((9, 9), dtype=bool)
    mask[4, 4] = True
    mask[3, 3] = mask[3, 5] = mask[5, 3] = mask[5, 5] = True  # 4 nbrs
    out = fast_mask_denoise(mask, 4, 2)
    assert out[4, 4]


@pytest.mark.parametrize("chans", [None, 3])
def test_optimise_batch_matches_single(chans):
    from archive_pdf_tools_spark.kernels.optimise import (
        optimise_gray2_batch, optimise_rgb2_batch)

    rng = _rng(77)
    B, h, w = 6, 24, 32
    masks = rng.random((B, h, w)) < 0.2
    if chans is None:
        imgs = rng.integers(0, 256, (B, h, w), dtype=np.uint8)
        for n in (3, 10):
            got = optimise_gray2_batch(masks, imgs, n)
            for i in range(B):
                np.testing.assert_array_equal(
                    got[i], optimise_gray2(masks[i], imgs[i], n))
    else:
        imgs = rng.integers(0, 256, (B, h, w, 3), dtype=np.uint8)
        for n in (3, 10):
            got = optimise_rgb2_batch(masks, imgs, n)
            for i in range(B):
                np.testing.assert_array_equal(
                    got[i], optimise_rgb2(masks[i], imgs[i], n))


def test_denoise_batch_matches_single():
    from archive_pdf_tools_spark.kernels.optimise import (
        fast_mask_denoise_batch)

    rng = _rng(31)
    for density in (0.05, 0.3, 0.9):
        masks = rng.random((5, 20, 24)) < density
        got = fast_mask_denoise_batch(masks, 4, 2)
        for i in range(5):
            np.testing.assert_array_equal(
                got[i], fast_mask_denoise(masks[i], 4, 2))
