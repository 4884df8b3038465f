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


# ---- round 8: PDF/A + XMP + UA + outlines -----------------------------

def _catalog(pdf):
    from archive_pdf_tools_spark.sources.pdf_meta import _Reader
    rd = _Reader(pdf)
    return rd, rd.obj(rd.root_id())[1]


def _mrc_pages(n=2):
    mask = np.zeros((40, 56), np.uint8)
    mask[8:16, 6:50] = 1
    gray = np.full((40, 56), 210, np.uint8)
    return [{"mask": mask, "bg": gray, "fg": 255 - gray}
            for _ in range(n)]


def test_icc_profile_is_valid_and_derived():
    """The sRGB OutputIntent profile: structurally valid ICC v2 (header
    size, acsp signature, in-bounds tag table), the DERIVED primaries
    sum to the D50 white point (the matrix-profile invariant), and the
    tone curve is the published sRGB EOTF (monotone, correct
    endpoints, linear-segment value spot-checked)."""
    import struct

    from archive_pdf_tools_spark.kernels.iccsrgb import srgb_icc_profile

    p = srgb_icc_profile()
    assert struct.unpack(">I", p[:4])[0] == len(p)
    assert p[36:40] == b"acsp"
    assert p[12:16] == b"mntr" and p[16:20] == b"RGB "
    n = struct.unpack(">I", p[128:132])[0]
    tags = {}
    for i in range(n):
        sig, off, ln = struct.unpack(">4sII", p[132 + 12 * i:144 + 12 * i])
        assert off + ln <= len(p)
        tags[sig] = (off, ln)
    for req in (b"desc", b"wtpt", b"cprt", b"rXYZ", b"gXYZ", b"bXYZ",
                b"rTRC", b"gTRC", b"bTRC"):
        assert req in tags, req

    def xyz(sig):
        off, _ = tags[sig]
        return np.array(struct.unpack(">3i", p[off + 8:off + 20])) / 65536.0

    # matrix-profile invariant: R+G+B = white point (D50)
    total = xyz(b"rXYZ") + xyz(b"gXYZ") + xyz(b"bXYZ")
    assert np.allclose(total, xyz(b"wtpt"), atol=2e-4)
    # D50 white from its published chromaticity
    assert np.allclose(xyz(b"wtpt"), [0.9642, 1.0, 0.8252], atol=2e-4)

    off, ln = tags[b"rTRC"]
    cnt = struct.unpack(">I", p[off + 8:off + 12])[0]
    curve = np.frombuffer(p[off + 12:off + 12 + 2 * cnt], dtype=">u2")
    assert curve[0] == 0 and curve[-1] == 65535
    assert np.all(np.diff(curve.astype(np.int64)) >= 0)
    # sRGB linear segment: c=1/1023 (well under 0.04045) -> c/12.92
    c = 1.0 / (cnt - 1)
    assert abs(curve[1] / 65535.0 - c / 12.92) < 1e-4


def test_pdfa_catalog_and_xmp():
    from archive_pdf_tools_spark.kernels.pdfsink import build_mrc_pdf
    from archive_pdf_tools_spark.sources.pdf_meta import _stream_data

    pdf = build_mrc_pdf(_mrc_pages(), metadata={
        "title": "T<&>le", "author": "A", "keywords": "https://x"},
        lang="en")
    rd, cat = _catalog(pdf)
    for key in (b"/OutputIntents", b"/Metadata", b"/StructTreeRoot",
                b"/MarkInfo", b"/ViewerPreferences", b"/Lang"):
        assert key in cat, key
    mid = int(re.search(rb"/Metadata\s+(\d+)\s+\d+\s+R", cat).group(1))
    mb, md = rd.obj(mid)
    assert b"/FlateDecode" not in md       # PDF/A: metadata unfiltered
    xmp = _stream_data(mb, md)
    assert b"<pdfaid:part>3</pdfaid:part>" in xmp
    assert b"<pdfaid:conformance>B</pdfaid:conformance>" in xmp
    assert b"T&lt;&amp;&gt;le" in xmp      # escaped title
    assert b"https://x" in xmp
    # docinfo in the trailer
    m = re.search(rb"/Info\s+(\d+)\s+\d+\s+R", pdf)
    assert m
    _, info = rd.obj(int(m.group(1)))
    assert b"/CreationDate (D:20200101000000Z)" in info
    assert b"/Title (T<&>le)" in info

    # determinism: identical input -> identical bytes (the pin contract)
    again = build_mrc_pdf(_mrc_pages(), metadata={
        "title": "T<&>le", "author": "A", "keywords": "https://x"},
        lang="en")
    assert again == pdf

    # opt-out keeps the plain catalog
    plain = build_mrc_pdf(_mrc_pages(), pdfa=False, ua=False)
    _, cat2 = _catalog(plain)
    assert b"/OutputIntents" not in cat2
    assert b"/StructTreeRoot" not in cat2


def test_ua_structure_tree_linkage():
    """Every page carries /StructParents k; the ParentTree maps k to
    [the page's /Figure StructElem]; the elem points back at the page
    and at the root (ISO 32000 §14.7 — the spec-correct linkage, a
    documented fix of the reference's attr-object Nums entries)."""
    from archive_pdf_tools_spark.kernels.pdfsink import build_mrc_pdf
    from archive_pdf_tools_spark.sources.pdf_meta import parse_pdf

    pdf = build_mrc_pdf(_mrc_pages(3))
    rd, cat = _catalog(pdf)
    root_id = int(re.search(
        rb"/StructTreeRoot\s+(\d+)\s+\d+\s+R", cat).group(1))
    _, rootd = rd.obj(root_id)
    ptree = int(re.search(rb"/ParentTree\s+(\d+)\s+\d+\s+R",
                          rootd).group(1))
    _, ptd = rd.obj(ptree)
    kid = int(re.search(rb"/Kids\s*\[\s*(\d+)", ptd).group(1))
    _, kd = rd.obj(kid)
    nums = re.findall(rb"(\d+)\s+(\d+)\s+0\s+R", kd.split(b"/Nums")[1])
    assert [int(a) for a, _b in nums] == [0, 1, 2]
    meta = parse_pdf(pdf)
    for k, (_sp, arr_id) in enumerate(nums):
        arr = rd.body(int(arr_id))
        elem_id = int(re.search(rb"(\d+)\s+0\s+R", arr).group(1))
        _, ed = rd.obj(elem_id)
        assert b"/S /Figure" in ed
        assert (b"/P %d 0 R" % root_id) in ed
        page_oid = meta["pages"][k]["oid"]
        assert (b"/Pg %d 0 R" % page_oid) in ed
        _, pd = rd.obj(page_oid)
        assert (b"/StructParents %d" % k) in pd


def test_outline_tree_nesting_and_counts():
    from archive_pdf_tools_spark.kernels.pdfsink import build_mrc_pdf

    pdf = build_mrc_pdf(_mrc_pages(4), outline=[
        (1, "Front", 0), (1, "Chapter 1", 1), (2, "Sec 1.1", 1),
        (2, "Sec 1.2", 2), (1, "Chapter 2", 3)])
    rd, cat = _catalog(pdf)
    oid = int(re.search(rb"/Outlines\s+(\d+)\s+\d+\s+R", cat).group(1))
    _, od = rd.obj(oid)
    assert b"/Count 5" in od             # all open
    first = int(re.search(rb"/First\s+(\d+)", od).group(1))
    last = int(re.search(rb"/Last\s+(\d+)", od).group(1))
    _, fd = rd.obj(first)
    assert b"/Title (Front)" in fd and b"/Prev" not in fd
    nxt = int(re.search(rb"/Next\s+(\d+)", fd).group(1))
    _, ch1 = rd.obj(nxt)
    assert b"/Title (Chapter 1)" in ch1 and b"/Count 2" in ch1
    c_first = int(re.search(rb"/First\s+(\d+)", ch1).group(1))
    c_last = int(re.search(rb"/Last\s+(\d+)", ch1).group(1))
    _, s11 = rd.obj(c_first)
    _, s12 = rd.obj(c_last)
    assert b"/Title (Sec 1.1)" in s11
    assert (b"/Next %d 0 R" % c_last) in s11
    assert (b"/Prev %d 0 R" % c_first) in s12
    assert (b"/Parent %d 0 R" % nxt) in s11
    _, ch2 = rd.obj(last)
    assert b"/Title (Chapter 2)" in ch2 and b"/Next" not in ch2
    # dest pages resolve
    from archive_pdf_tools_spark.sources.pdf_meta import parse_pdf
    meta = parse_pdf(pdf)
    want_oid = meta["pages"][3]["oid"]
    assert (b"/Dest [%d 0 R /XYZ null null null]" % want_oid) in ch2


def test_recode_document_scandata_toc_and_labels():
    """scandata XML -> outlines + /PageLabels in the finished MRC PDF
    (write_pdf_toc + write_page_labels parity, driven through the
    per-doc recode kernel)."""
    from archive_pdf_tools_spark.kernels.tiffcodec import encode_tiff
    from archive_pdf_tools_spark.operators.recode import recode_document

    img = np.full((32, 44), 200, np.uint8)
    img[8:14, 6:38] = 30
    pages = [(p, encode_tiff(img, compression="packbits"))
             for p in range(3)]
    scandata = """<book><pageData>
      <page leafNum="0"><addToAccessFormats>true</addToAccessFormats>
        <pageNumber>7</pageNumber>
        <pageType title="Title Page" level="1">Title</pageType></page>
      <page leafNum="1"><addToAccessFormats>true</addToAccessFormats>
        <pageNumber>8</pageNumber></page>
      <page leafNum="2"><addToAccessFormats>true</addToAccessFormats>
        <pageNumber>9</pageNumber>
        <pageType title="Index" level="1">Index</pageType></page>
    </pageData></book>"""
    pdf, n_pages, _ = recode_document(pages, None, scandata=scandata,
                                      metadata={"title": "Book"},
                                      lang="en")
    assert n_pages == 3
    rd, cat = _catalog(pdf)
    assert b"/Outlines" in cat
    assert b"/PageLabels" in cat
    m = re.search(rb"/PageLabels\s*<<\s*/Nums\s*\[(.*?)\]", cat, re.S)
    assert m and b"/S /D /St 7" in m.group(0)
    oid = int(re.search(rb"/Outlines\s+(\d+)\s+\d+\s+R", cat).group(1))
    _, od = rd.obj(oid)
    assert b"/Count 2" in od
    first = int(re.search(rb"/First\s+(\d+)", od).group(1))
    _, fd = rd.obj(first)
    assert b"/Title (Title Page)" in fd


def test_recode_operator_scandata_column(spark):
    """The cluster operator carries scandata per doc: its TOC becomes
    the output PDF's /Outlines and its page numbers the /PageLabels —
    the operator-surface twin of the kernel-level test above."""
    from archive_pdf_tools_spark.kernels.tiffcodec import encode_tiff
    from archive_pdf_tools_spark.operators.recode import recode_to_pdf

    img = np.full((30, 42), 205, np.uint8)
    img[8:14, 6:36] = 35
    sd = """<book><pageData>
      <page leafNum="0"><addToAccessFormats>true</addToAccessFormats>
        <pageNumber>5</pageNumber>
        <pageType title="Start" level="1">T</pageType></page>
      <page leafNum="1"><addToAccessFormats>true</addToAccessFormats>
        <pageNumber>6</pageNumber></page>
    </pageData></book>"""
    rows = [("d0", 0, bytearray(encode_tiff(img, compression="lzw")),
             None, bytearray(sd.encode())),
            ("d0", 1, bytearray(encode_tiff(img, compression="lzw")),
             None, None),
            ("d1", 0, bytearray(encode_tiff(img, compression="lzw")),
             None, None)]
    df = spark.createDataFrame(
        rows, "doc_id string, page_idx int, image binary, "
              "hocr binary, scandata binary")
    out = {r["doc_id"]: r for r in recode_to_pdf(df).collect()}
    rd, cat = _catalog(bytes(out["d0"]["pdf"]))
    assert b"/Outlines" in cat and b"/PageLabels" in cat
    assert b"/S /D /St 5" in cat.split(b"/PageLabels")[1][:120]
    rd1, cat1 = _catalog(bytes(out["d1"]["pdf"]))
    assert b"/Outlines" not in cat1            # no scandata: no TOC
