"""Property-based fast==slow kernel equivalence (hypothesis).

The parameterized golden tests pin specific cases; these search the input
space for divergence — sizes, windows, densities, and k signs are all
drawn randomly.  Deadlines are disabled (the slow oracles are O(n^2))."""

import numpy as np
from hypothesis import given, settings, strategies as st

from archive_pdf_tools_spark.kernels.optimise import (
    fast_mask_denoise, fast_mask_denoise_slow, optimise_gray2,
    optimise_gray_slow)
from archive_pdf_tools_spark.kernels.sauvola import (
    sauvola_mask, sauvola_mask_slow)

SMALL = {"max_examples": 25, "deadline": None}


@st.composite
def image_and_window(draw):
    h = draw(st.integers(1, 24))
    w = draw(st.integers(1, 24))
    seed = draw(st.integers(0, 2**31))
    img = np.random.default_rng(seed).integers(0, 256, (h, w), np.uint8)
    window = draw(st.integers(1, 2 * w - 1)) if w > 1 else 1
    k = draw(st.sampled_from([0.34, 0.1, 0.0, -0.2, 1.5]))
    return img, window, k


@settings(**SMALL)
@given(image_and_window())
def test_sauvola_property(args):
    img, window, k = args
    np.testing.assert_array_equal(
        sauvola_mask(img, window, window, k, 128.0),
        sauvola_mask_slow(img, window, window, k, 128.0))


@st.composite
def mask_image(draw):
    h = draw(st.integers(1, 20))
    w = draw(st.integers(1, 20))
    seed = draw(st.integers(0, 2**31))
    density = draw(st.floats(0.0, 1.0))
    rng = np.random.default_rng(seed)
    mask = rng.random((h, w)) < density
    img = rng.integers(0, 256, (h, w), np.uint8)
    n = draw(st.sampled_from([1, 3, 10]))
    return mask, img, n


@settings(**SMALL)
@given(mask_image())
def test_optimise_property(args):
    mask, img, n = args
    np.testing.assert_array_equal(optimise_gray2(mask, img, n),
                                  optimise_gray_slow(mask, img, n))


@settings(**SMALL)
@given(mask_image())
def test_denoise_property(args):
    mask, _img, _n = args
    np.testing.assert_array_equal(fast_mask_denoise(mask, 4, 2),
                                  fast_mask_denoise_slow(mask, 4, 2))
