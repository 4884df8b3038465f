"""MRC PDF sink (kernels/pdfsink.py + operators/recode.py) — the
reference's END PRODUCT (``recode.py:595-716``): imagestack + hOCR in,
MRC PDF out.  The evidence model is the full circle through the
engine's OWN reader: the emitted PDF parses (page tree, two JPEG2000
images per page, text detected), the JBIG2 /SMask round-trips the
mask bit-exactly, fg/bg decode through the JP2 codec at their
downsampled dims, and the embedded text ops equal the textlayer
kernel's byte stream."""

import re
import zlib

import numpy as np
import pytest

from archive_pdf_tools_spark.kernels.mrc import create_mrc_components
from archive_pdf_tools_spark.kernels.pdfsink import (
    build_mrc_pdf, page_labels_pdf)
from archive_pdf_tools_spark.sources.pdf_meta import (
    _Reader, _stream_data, extract_page_images, parse_pdf)


def _word_data(text="hello world", y0=10, y1=16):
    words = [{"text": w, "bbox": [8 + 30 * i, y0, 36 + 30 * i, y1],
              "fontsize": 8, "confidence": 95, "writing_direction": 1}
             for i, w in enumerate(text.split())]
    return [{"lines": [{"words": words, "bbox": [8, y0, 70, y1],
                        "baseline": [0, 0]}], "bbox": [8, y0, 70, y1]}]


def _page_raster(k=0, rgb=False):
    img = np.full((60, 80), 230, np.uint8)
    img[10 + k:16 + k, 8:70] = 15
    if rgb:
        img = np.stack([img, img, np.minimum(img + 10, 255)],
                       axis=-1).astype(np.uint8)
    return img


def _smask_bits(pdf, fg_xref):
    from archive_pdf_tools_spark.kernels.jbig2codec import decode_jbig2
    rd = _Reader(pdf)
    _b, fdict = rd.obj(fg_xref)
    m = re.search(rb"/SMask\s+(\d+)\s+\d+\s+R", fdict)
    assert m, "fg image must carry an /SMask"
    mid = int(m.group(1))
    mb, mdict = rd.obj(mid)
    assert b"/JBIG2Decode" in mdict and b"/BitsPerComponent 1" in mdict
    raw = _stream_data(mb, mdict, rd._decrypter(mid))
    return decode_jbig2(raw, b"")


def test_full_circle_single_page():
    from archive_pdf_tools_spark.kernels.jp2codec import decode_jp2
    from archive_pdf_tools_spark.kernels.textlayer import (
        render_text_layer)

    img = _page_raster()
    words = _word_data()
    res = create_mrc_components(img, words)
    tl = render_text_layer(words, 80.0, 60.0, 72.0)
    pdf = build_mrc_pdf([{"mask": res.mask, "fg": res.foreground,
                          "bg": res.background,
                          "text_ops": tl.text_ops}])
    meta = parse_pdf(pdf)
    p0 = meta["pages"][0]
    assert meta["n_pages"] == 1 and p0["n_images"] == 2
    assert [i["format"] for i in p0["images"]] == ["JPEG2000"] * 2
    assert p0["has_text"]
    assert p0["width"] == 80.0 and p0["height"] == 60.0
    # decoded fg/bg come back at full dims through our own reader
    imgs = dict(extract_page_images(pdf, 0))
    assert all(a.shape == (60, 80) for a in imgs.values())
    # mask round-trips bit-exactly through the /SMask link — in
    # SMASK POLARITY: viewers map JBIG2 bit 1 (black) to gray 0 =
    # alpha 0, so TEXT pixels are encoded as bit 0 (the reference's
    # implicit wire polarity via its white-text mask PNG + jbig2enc)
    fg_xref = p0["images"][1]["xref"]
    bits = _smask_bits(pdf, fg_xref)
    assert np.array_equal(bits == 0, res.mask != 0)
    # the embedded content stream carries the EXACT textlayer bytes
    rd = _Reader(pdf)
    cid = int(re.search(rb"/Contents\s+(\d+)\s+\d+\s+R",
                        rd.obj(p0["oid"])[1]).group(1))
    cb, cd = rd.obj(cid)
    ops = _stream_data(cb, cd, rd._decrypter(cid))
    assert tl.text_ops in ops
    # and the fg/bg streams decode through the JP2 codec directly
    for k in (0, 1):
        xr = p0["images"][k]["xref"]
        b, d = rd.obj(xr)
        assert decode_jp2(_stream_data(b, d, rd._decrypter(xr))
                          ).shape == (60, 80)


def test_downsampled_components_and_rgb():
    """fg/bg may be stored at reduced resolution (the reference's
    compression flags) — dict dims follow the codec header and the
    mask stays full-size."""
    img = _page_raster(rgb=True)
    res = create_mrc_components(img, _word_data(), fg_downsample=2,
                                bg_downsample=2)
    pdf = build_mrc_pdf([{"mask": res.mask, "fg": res.foreground,
                          "bg": res.background}])
    p0 = parse_pdf(pdf)["pages"][0]
    dims = {(i["width"], i["height"]) for i in p0["images"]}
    assert dims == {(40, 30)}
    assert {i["mode"] for i in p0["images"]} == {"RGB"}
    bits = _smask_bits(pdf, p0["images"][1]["xref"])
    assert bits.shape == (60, 80)           # mask full size
    assert np.array_equal(bits == 0, res.mask != 0)


def test_multipage_and_page_labels():
    pages = []
    masks = []
    for k in range(3):
        res = create_mrc_components(_page_raster(k), [])
        masks.append(res.mask)
        pages.append({"mask": res.mask, "fg": res.foreground,
                      "bg": res.background})
    pages[0]["page_labels"] = page_labels_pdf([None, 1, 2])
    pdf = build_mrc_pdf(pages)
    meta = parse_pdf(pdf)
    assert meta["n_pages"] == 3
    # catalog carries the /PageLabels number tree: an unnumbered run
    # then decimal numbering starting at 1 on page index 1
    assert b"/PageLabels << /Nums [0 << >> 1 << /S /D /St 1 >>] >>" \
        in pdf
    for k in range(3):
        p = meta["pages"][k]
        bits = _smask_bits(pdf, p["images"][1]["xref"])
        assert np.array_equal(bits == 0, masks[k] != 0), k


def test_page_labels_series_shapes():
    assert page_labels_pdf([1, 2, 3]) == \
        b"<< /Nums [0 << /S /D /St 1 >>] >>"
    assert page_labels_pdf([None, None, 5, 6, 9]) == \
        b"<< /Nums [0 << >> 2 << /S /D /St 5 >> 4 << /S /D /St 9 >>] >>"


def test_recode_operator_end_to_end(spark):
    """The cluster operator: imagestack rows -> one MRC PDF per doc;
    a poison doc degrades to a NULL pdf row with the error string."""
    from archive_pdf_tools_spark.corpus.hocrgen import synth_hocr
    from archive_pdf_tools_spark.kernels.tiffcodec import encode_tiff
    from archive_pdf_tools_spark.operators.recode import recode_to_pdf

    rows = []
    for d in range(2):
        for p in range(2):
            blob = encode_tiff(_page_raster(2 * d + p),
                               compression="lzw")
            rows.append((f"doc{d}", p, bytearray(blob), None))
    hocr = synth_hocr("alpha beta gamma delta", words_per_page=2)
    hraw = hocr.encode() if isinstance(hocr, str) else hocr
    rows[0] = (rows[0][0], rows[0][1], rows[0][2], bytearray(hraw))
    rows.append(("bad", 0, bytearray(b"not an image"), None))
    df = spark.createDataFrame(
        rows, "doc_id string, page_idx int, image binary, hocr binary")
    out = {r["doc_id"]: r for r in recode_to_pdf(df).collect()}
    assert set(out) == {"doc0", "doc1", "bad"}
    for d in ("doc0", "doc1"):
        r = out[d]
        assert r["error"] is None and r["n_pages"] == 2
        meta = parse_pdf(bytes(r["pdf"]))
        assert meta["n_pages"] == 2
        assert all(p["n_images"] == 2 for p in meta["pages"])
    assert out["doc0"]["n_text_lines"] > 0      # hOCR text layer
    assert out["doc0"]["pdf"] is not None
    assert parse_pdf(bytes(out["doc0"]["pdf"]))["pages"][0]["has_text"]
    bad = out["bad"]
    assert bad["pdf"] is None and "TiffError" in bad["error"]


def test_sink_input_validation():
    with pytest.raises(ValueError, match="2-D"):
        build_mrc_pdf([{"mask": np.zeros((4, 4, 3)), "fg": 0, "bg": 0}])
