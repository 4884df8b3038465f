"""Golden slow-oracle test (FIXTURES.md §4-§5).

Runs the full media extraction path twice on small pages: once with the
fast vectorized kernels, once with the slow per-pixel oracles patched in
(the reference's own slow/fast pair precedent, optimiser.pyx:22-146), and
asserts identical span output — including the content hashes of mask/fg/bg,
i.e. bit-exact segmentation.
"""

import numpy as np
import pytest

import archive_pdf_tools_spark.kernels.mrc as mrc_mod
from archive_pdf_tools_spark.corpus.rasters import (
    make_media_ref, page_spec)
from archive_pdf_tools_spark.kernels.optimise import (
    fast_mask_denoise_slow, optimise_gray_slow, optimise_rgb_slow)
from archive_pdf_tools_spark.kernels.sauvola import sauvola_mask_slow
from archive_pdf_tools_spark.operators.extract import extract_one


def _slow_threshold_image(img, dpi, k=0.34):
    window_size = 51
    if dpi is not None:
        window_size = int(dpi / 4)
        if window_size % 2 == 0:
            window_size += 1
    return sauvola_mask_slow(img, window_size, window_size, k, 128.0)


def _tiny_media_refs(max_pixels=128 * 96, want=6):
    refs = []
    i = 0
    while len(refs) < want and i < 4000:
        ref = make_media_ref(f"doc_{i:06d}", i % 7, i * 131 + 17)
        spec = page_spec(ref)
        if spec["w"] * spec["h"] <= max_pixels and not spec["bitonal"]:
            refs.append(ref)
        i += 1
    assert len(refs) == want
    return refs


@pytest.mark.parametrize("ref", _tiny_media_refs())
def test_media_extraction_fast_equals_slow_oracle(monkeypatch, ref):
    fast = extract_one("media", "", ref)

    monkeypatch.setattr(mrc_mod, "threshold_image", _slow_threshold_image)
    monkeypatch.setattr(mrc_mod, "fast_mask_denoise",
                        lambda m, mincnt, n: fast_mask_denoise_slow(m, mincnt, n))
    monkeypatch.setattr(mrc_mod, "optimise_gray2", optimise_gray_slow)
    monkeypatch.setattr(mrc_mod, "optimise_rgb2", optimise_rgb_slow)
    slow = extract_one("media", "", ref)

    assert fast[0] == slow[0]      # spans incl. mask/fg/bg content hashes
    assert fast[2] == slow[2]      # warnings


def test_media_ref_hash_is_deterministic():
    ref = _tiny_media_refs(want=1)[0]
    a = extract_one("media", "", ref)
    b = extract_one("media", "", ref)
    assert a[0] == b[0]


def test_spec_regeneration_stable():
    ref = make_media_ref("doc_000001", 3, 12345)
    s1, s2 = page_spec(ref), page_spec(ref)
    assert s1 == s2
