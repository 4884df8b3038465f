"""HQ-page flag parsing (F6, recode.py:657-675) and downsample (C23)."""

import numpy as np

from archive_pdf_tools_spark.kernels.pages import (
    downsample_box, parse_hq_pages)


def test_hq_pages_reference_semantics():
    # 1-indexed positives, negatives from the end, out-of-range ignored.
    assert parse_hq_pages("1,2", 4) == [True, True, False, False]
    assert parse_hq_pages("-1,-2", 4) == [False, False, True, True]
    # the reference's docstring case: 1,2,3,4,-4,-3,-2,-1 on a 3-pager
    assert parse_hq_pages("1,2,3,4,-4,-3,-2,-1", 3) == [True, True, True]
    assert parse_hq_pages(None, 3) == [False, False, False]
    # 0 stays index 0 (only i > 0 decrements)
    assert parse_hq_pages("0", 3) == [True, False, False]


def test_downsample_exact_factor():
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    out, warned = downsample_box(img, 2)
    assert not warned
    assert out.shape == (4, 4)
    # top-left 2x2 block: (0+1+8+9)//4 = 4
    assert out[0, 0] == 4


def test_downsample_rgb_and_too_small():
    img = np.full((6, 6, 3), 90, dtype=np.uint8)
    out, warned = downsample_box(img, 3)
    assert out.shape == (2, 2, 3) and not warned
    assert (out == 90).all()
    tiny = np.zeros((2, 2), dtype=np.uint8)
    out, warned = downsample_box(tiny, 3)
    assert warned and out.shape == (2, 2)   # unchanged + warning


def test_downsample_non_divisible():
    img = np.arange(70, dtype=np.uint8).reshape(7, 10)
    out, warned = downsample_box(img, 3)
    assert out.shape == (2, 3) and not warned
