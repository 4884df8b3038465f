"""C8 partial blurs, C22 mode normalization, S2 image extraction."""

import numpy as np

from archive_pdf_tools_spark.corpus.pdfgen import build_pdf
from archive_pdf_tools_spark.kernels.blur import (
    normalize_mode, partial_blur, partial_boxblur, uniform_filter)
from archive_pdf_tools_spark.sources.pdf_meta import extract_page_images


def test_uniform_filter_constant_preserved():
    img = np.full((10, 12), 77.0, dtype=np.float32)
    out = uniform_filter(img, 5)
    np.testing.assert_allclose(out, 77.0, rtol=1e-6)


def test_uniform_filter_box_mean_interior():
    img = np.zeros((9, 9), dtype=np.float64)
    img[4, 4] = 25.0
    out = uniform_filter(img, 5)
    assert abs(out[4, 4] - 1.0) < 1e-9    # 25 spread over 5x5
    assert abs(out[0, 0]) < 1e-9


def test_partial_blur_restores_mask_pixels_and_spreads():
    img = np.full((20, 20), 200, dtype=np.uint8)
    img[8:12, 8:12] = 10                      # dark ink
    mask = np.zeros((20, 20), dtype=bool)
    mask[8:12, 8:12] = True
    out = partial_blur(mask, img, sigma=3)
    np.testing.assert_array_equal(out[mask], img[mask])   # restored
    # non-mask pixels near the ink pulled towards ink value
    assert out[7, 10] < 200


def test_partial_boxblur_gray_and_rgb():
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    mask = rng.random((16, 16)) < 0.3
    out = partial_boxblur(mask, img, size=5)
    np.testing.assert_array_equal(out[mask], img[mask])
    rgb = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    out3 = partial_boxblur(mask, rgb, size=5)
    np.testing.assert_array_equal(out3[mask], rgb[mask])


def test_normalize_mode():
    rgba = np.zeros((4, 4, 4), dtype=np.uint8)
    rgba[..., 3] = 255
    arr, mode = normalize_mode(rgba, "RGBA")
    assert mode == "RGB" and arr.shape == (4, 4, 3)
    la = np.zeros((4, 4, 2), dtype=np.uint8)
    arr, mode = normalize_mode(la, "LA")
    assert mode == "L" and arr.shape == (4, 4)
    pal = np.arange(256 * 3, dtype=np.uint8).reshape(256, 3) % 256
    p = np.full((3, 3), 7, dtype=np.uint8)
    arr, mode = normalize_mode(p, "P", palette=pal)
    assert mode == "RGB" and (arr[0, 0] == pal[7]).all()


def test_extract_page_images_roundtrip():
    rng = np.random.default_rng(6)
    gray = rng.integers(0, 256, (10, 20), dtype=np.uint8)
    rgb = rng.integers(0, 256, (6, 8, 3), dtype=np.uint8)
    pdf = build_pdf([{"width": 612, "height": 792, "images": [
        {"w": 20, "h": 10, "gray": True, "data": gray.tobytes()},
        {"w": 8, "h": 6, "gray": False, "data": rgb.tobytes()},
    ], "text": "x"}])
    images = extract_page_images(pdf, 0)
    assert len(images) == 2
    np.testing.assert_array_equal(images[0][1], gray)
    np.testing.assert_array_equal(images[1][1], rgb)
