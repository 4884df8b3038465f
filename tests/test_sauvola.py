"""Golden tests: fast vectorized Sauvola vs the slow per-pixel oracle.

Mirrors FIXTURES.md §5 row 1: sizes including tiny and window-larger-than-
image, k in {0.34, 0.1, -0.2}, R=128.
"""

import numpy as np
import pytest

from archive_pdf_tools_spark.kernels.sauvola import (
    sauvola_mask, sauvola_mask_slow, threshold_image)


def _rng(seed):
    return np.random.default_rng(seed)


CASES = [
    # (h, w, window, k)
    (1, 1, 3, 0.34),
    (5, 7, 3, 0.34),
    (7, 5, 15, 0.34),
    (20, 30, 15, 0.1),
    (51, 51, 51, 0.34),
    (40, 60, 51, 0.34),     # window taller/wider than one dim
    (30, 30, 51, 0.1),      # window larger than image (ww < 2w-1 holds @59>51? no: 51 <= 59 ok)
    (64, 48, 13, -0.2),     # negative-k branch (sauvola.pyx:148-152)
    (33, 40, 7, 0.0),       # k == 0 boundary goes through the k>=0 branch
]


@pytest.mark.parametrize("h,w,window,k", CASES)
def test_fast_matches_slow(h, w, window, k):
    img = _rng(h * 1000 + w * 10 + window).integers(0, 256, size=(h, w),
                                                    dtype=np.uint8)
    fast = sauvola_mask(img, window, window, k, 128.0)
    slow = sauvola_mask_slow(img, window, window, k, 128.0)
    np.testing.assert_array_equal(fast, slow)


def test_flat_image_no_ink():
    img = np.full((20, 20), 200, dtype=np.uint8)
    assert not sauvola_mask(img, 15, 15, 0.34, 128.0).any()


def test_black_on_white_detects_ink():
    img = np.full((60, 60), 235, dtype=np.uint8)
    img[20:40, 20:40] = 10
    mask = threshold_image(img, dpi=None, k=0.34)
    # Ink region dominated by True, margins False.
    assert mask[25:35, 25:35].mean() > 0.9
    assert mask[:10, :10].mean() < 0.05


def test_window_forced_odd_from_dpi():
    img = _rng(7).integers(0, 256, size=(40, 40), dtype=np.uint8)
    # dpi=200 -> window 50 -> forced odd 51 (mrc.py:72-75)
    got = threshold_image(img, dpi=200)
    want = sauvola_mask(img, 51, 51, 0.34, 128.0)
    np.testing.assert_array_equal(got, want)


def test_integer_division_semantics_matter():
    """A case engineered so float-division Sauvola would differ: verify we
    use C-truncated integer mean/variance like the reference."""
    img = np.array([[0, 1], [1, 2]], dtype=np.uint8)
    fast = sauvola_mask(img, 3, 3, 0.34, 128.0)
    slow = sauvola_mask_slow(img, 3, 3, 0.34, 128.0)
    np.testing.assert_array_equal(fast, slow)
