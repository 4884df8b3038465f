"""Recode compression knobs — the reference recode_pdf CLI surface
(``bin/recode_pdf:95-190``) re-expressed as ``recode_document`` /
``recode_to_pdf`` options: image modes 0-3 (``recode.py:546-563,
679-716``), ``--mrc-image-format jpeg``, ``--mask-compression ccitt``,
``--grayscale-pdf`` (``recode.py:360-364``), ``--bw-pdf``
(``force_1bit_output``, ``recode.py:400-430``), ``--hq-pages``
(``recode.py:366,402-409``), ``-D/--dpi`` and ``--downsample``.

Every assertion is a full-circle re-read through the engine's OWN
reader + codecs (``sources/pdf_meta.py``) — structure, stream
byte-identity for passthrough, mask bit-exactness for CCITT."""

from __future__ import annotations

import re

import numpy as np
import pytest

from archive_pdf_tools_spark.corpus.hocrgen import synth_hocr
from archive_pdf_tools_spark.kernels.jpegcodec import encode_baseline
from archive_pdf_tools_spark.kernels.tiffcodec import encode_tiff
from archive_pdf_tools_spark.operators.recode import recode_document
from archive_pdf_tools_spark.sources.pdf_meta import (_Reader,
                                                      _stream_data,
                                                      extract_page_images,
                                                      parse_pdf)


def _raster(rgb=True):
    img = np.full((48, 64), 232, np.uint8)
    img[8:16, 6:58] = 22
    if rgb:
        img = np.stack([img, 255 - img, np.roll(img, 2, 1)],
                       axis=-1).astype(np.uint8)
    return img


def _hocr():
    h = synth_hocr("mode test alpha beta", words_per_page=4)
    return h.encode() if isinstance(h, str) else h


def _tiff_pages(rgb=True):
    return [(0, encode_tiff(_raster(rgb), compression="lzw"))]


def test_mrc_jpeg_format():
    """--mrc-image-format jpeg: bg/fg are /DCTDecode streams the
    engine's own JPEG decoder reads back near the components."""
    pdf, _, _ = recode_document(_tiff_pages(), _hocr(),
                                mrc_image_format="jpeg")
    meta = parse_pdf(pdf)
    assert [i["format"] for i in meta["pages"][0]["images"]] \
        == ["JPEG", "JPEG"]
    imgs = extract_page_images(pdf, 0)
    assert len(imgs) == 2
    for _xref, arr in imgs:
        assert arr.dtype == np.uint8 and arr.ndim == 3


def test_mrc_ccitt_mask_bit_exact():
    """--mask-compression ccitt: the /SMask is a /CCITTFaxDecode
    XObject whose decoded bits equal the JBIG2 default's bit-exactly
    (same wire polarity, ink = sample 1)."""
    from archive_pdf_tools_spark.kernels.ccittcodec import decode_g3
    from archive_pdf_tools_spark.kernels.jbig2codec import decode_jbig2

    # no hOCR: the threshold mask picks up the dark stripe, so the
    # mask is non-trivial (the synth hOCR's bboxes don't overlap this
    # tiny raster and would leave it empty)
    pdf_j, _, _ = recode_document(_tiff_pages(rgb=False), None)
    pdf_c, _, _ = recode_document(_tiff_pages(rgb=False), None,
                                  mask_compression="ccitt")

    def smask(pdf, want_filter):
        rd = _Reader(pdf)
        meta = parse_pdf(pdf)
        fg_xref = meta["pages"][0]["images"][1]["xref"]
        _b, fdict = rd.obj(fg_xref)
        mid = int(re.search(rb"/SMask\s+(\d+)\s+\d+\s+R",
                            fdict).group(1))
        mb, mdict = rd.obj(mid)
        assert want_filter in mdict
        raw = _stream_data(mb, mdict, rd._decrypter(mid))
        if want_filter == b"/CCITTFaxDecode":
            mw = int(re.search(rb"/Columns\s+(\d+)", mdict).group(1))
            mh = int(re.search(rb"/Rows\s+(\d+)", mdict).group(1))
            assert b"/K -1" in mdict
            return decode_g3(raw, mw, mh, k=-1)
        return decode_jbig2(raw, b"")

    bits_j = smask(pdf_j, b"/JBIG2Decode")
    bits_c = smask(pdf_c, b"/CCITTFaxDecode")
    # both encode the INVERTED mask (ink = bit 0 under each filter's
    # default decode sense) — identical wire bitmaps
    assert np.array_equal(bits_j, bits_c)
    assert bits_c.any() and not bits_c.all()


def test_hq_pages_higher_fidelity():
    """--hq-pages: the flagged page re-encodes at a finer 9/7 step and
    full-resolution fg/bg — more bytes, lower bg error vs the source."""
    pages = _tiff_pages()
    pdf_lo, _, _ = recode_document(pages, _hocr())
    pdf_hq, _, _ = recode_document(pages, _hocr(), hq_pages="1")
    assert len(pdf_hq) > len(pdf_lo)

    src = _raster()

    def bg_mae(pdf):
        (_x, bg), _ = extract_page_images(pdf, 0)
        if bg.shape != src.shape:  # downsampled: compare at bg scale
            from archive_pdf_tools_spark.kernels.pages import (
                downsample_box)
            ref = downsample_box(src, src.shape[0] / bg.shape[0])[0]
        else:
            ref = src
        return float(np.mean(np.abs(bg.astype(int) - ref.astype(int))))

    # HQ bg is full-resolution (no downsample) — shape proves the
    # downsample skip; fidelity proves the step change
    (_x, bg_hq), _ = extract_page_images(pdf_hq, 0)
    assert bg_hq.shape == src.shape
    assert bg_mae(pdf_hq) <= bg_mae(pdf_lo) + 1.0

    # out-of-range indices are silently ignored (recode.py:667-672)
    pdf_ig, _, _ = recode_document(pages, _hocr(), hq_pages="7,-9")
    assert pdf_ig == pdf_lo


def test_grayscale_pdf():
    """--grayscale-pdf: RGB input converts via special_gray_convert
    before the pipeline — every image XObject is DeviceGray."""
    pdf, _, _ = recode_document(_tiff_pages(rgb=True), _hocr(),
                                grayscale=True)
    imgs = extract_page_images(pdf, 0)
    assert len(imgs) == 2
    for _xref, arr in imgs:
        assert arr.ndim == 2


def test_bw_pdf_mask_is_sole_image():
    """--bw-pdf: one 1-bit image per page, ink where the MRC mask has
    text, under both mask codecs."""
    from archive_pdf_tools_spark.kernels.mrc import mrc_mask_phase

    src = _raster(rgb=False)
    words_mask, _d, _w = mrc_mask_phase(src, [])
    assert (words_mask != 0).any()
    for codec, filt in (("jbig2", b"/JBIG2Decode"),
                        ("ccitt", b"/CCITTFaxDecode")):
        pdf, n_pages, _ = recode_document(
            _tiff_pages(rgb=False), None, bw=True,
            mask_compression=codec)
        assert n_pages == 1
        meta = parse_pdf(pdf)
        page = meta["pages"][0]
        assert page["n_images"] == 1
        rd = _Reader(pdf)
        xref = page["images"][0]["xref"]
        _b, d = rd.obj(xref)
        assert filt in d and b"/BitsPerComponent 1" in d
        imgs = extract_page_images(pdf, 0)
        assert len(imgs) == 1
        arr = imgs[0][1]
        # reader returns 8-bit gray; ink (mask=1) must be BLACK
        ink_frac = float((arr < 128).mean())
        want = float((words_mask != 0).mean())
        assert abs(ink_frac - want) < 0.05


def test_pixmap_mode_flat_image():
    """--image-mode 1: one flat continuous-tone image per page, text
    layer preserved."""
    for fmt, want in (("jp2", "JPEG2000"), ("jpeg", "JPEG")):
        pdf, _, n_lines = recode_document(
            _tiff_pages(), _hocr(), image_mode=1, mrc_image_format=fmt)
        meta = parse_pdf(pdf)
        page = meta["pages"][0]
        assert page["n_images"] == 1
        assert page["images"][0]["format"] == want
        assert page["has_text"] and n_lines > 0
        (_x, arr), = extract_page_images(pdf, 0)
        assert arr.shape == _raster().shape


def test_passthrough_inserts_source_stream_verbatim():
    """--image-mode 0 with a JPEG page file: the PDF's image stream is
    the SOURCE BYTES, no re-encode (fast_insert_image,
    pdfhacks.py:106-177)."""
    blob = encode_baseline(_raster(), quality=92)
    pdf, _, _ = recode_document([(0, blob)], _hocr(), image_mode=0)
    meta = parse_pdf(pdf)
    page = meta["pages"][0]
    assert page["n_images"] == 1
    rd = _Reader(pdf)
    xref = page["images"][0]["xref"]
    b, d = rd.obj(xref)
    assert b"/DCTDecode" in d
    assert _stream_data(b, d, rd._decrypter(xref)) == blob

    # non-embeddable page files (TIFF) degrade to the pixmap re-encode
    pdf2, _, _ = recode_document(_tiff_pages(), _hocr(), image_mode=0)
    assert parse_pdf(pdf2)["pages"][0]["images"][0]["format"] \
        == "JPEG2000"


def test_skip_mode_text_only():
    """--image-mode 3: no image XObjects, text layer only."""
    pdf, n_pages, n_lines = recode_document(_tiff_pages(), _hocr(),
                                            image_mode=3)
    meta = parse_pdf(pdf)
    assert n_pages == 1 and n_lines > 0
    assert meta["pages"][0]["n_images"] == 0
    assert meta["pages"][0]["has_text"]
    assert extract_page_images(pdf, 0) == []


def test_dpi_and_downsample():
    """-D scales the MediaBox (72/dpi points per pixel); --downsample
    shrinks every raster before processing."""
    pdf72, _, _ = recode_document(_tiff_pages(), None)
    pdf150, _, _ = recode_document(_tiff_pages(), None, dpi=150)
    w72 = parse_pdf(pdf72)["pages"][0]["width"]
    w150 = parse_pdf(pdf150)["pages"][0]["width"]
    assert abs(w72 - 64.0) < 0.01
    assert abs(w150 - 64 * 72.0 / 150) < 0.01

    pdf_ds, _, _ = recode_document(_tiff_pages(), None, downsample=2)
    (_x, bg), (_y, fg) = extract_page_images(pdf_ds, 0)
    assert max(bg.shape[0], fg.shape[0]) <= 24  # 48/2 (bg further /3)


def test_unknown_option_fails_at_plan_time(spark):
    """A typo'd knob fails in recode_to_pdf BEFORE any job runs."""
    import pandas as pd

    from archive_pdf_tools_spark.operators.recode import recode_to_pdf

    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": ["d"], "page_idx": [0],
        "image": [bytearray(b"x")]}))
    with pytest.raises(TypeError, match="unknown recode option"):
        recode_to_pdf(df, image_mode=1, mask_compresion="ccitt")


def test_operator_knobs_flow_to_executors(spark):
    """The grouped UDF honors the knobs: a bw ccitt run over the
    operator produces 1-image CCITT pages."""
    import pandas as pd

    from archive_pdf_tools_spark.operators.recode import recode_to_pdf

    rows = []
    for d in range(2):
        rows.append({"doc_id": f"doc{d}", "page_idx": 0,
                     "image": bytearray(encode_tiff(_raster(),
                                                    compression="lzw"))})
    df = spark.createDataFrame(
        pd.DataFrame(rows),
        schema="doc_id string, page_idx int, image binary")
    out = {r["doc_id"]: r for r in
           recode_to_pdf(df, bw=True,
                         mask_compression="ccitt").collect()}
    assert len(out) == 2
    for r in out.values():
        assert r["error"] is None
        meta = parse_pdf(bytes(r["pdf"]))
        assert meta["pages"][0]["n_images"] == 1
        rd = _Reader(bytes(r["pdf"]))
        _b, d = rd.obj(meta["pages"][0]["images"][0]["xref"])
        assert b"/CCITTFaxDecode" in d
