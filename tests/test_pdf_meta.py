"""PDF byte-stream parsing (S2/S3): fixture PDFs built by corpus/pdfgen,
parsed by sources/pdf_meta, field-for-field."""

import numpy as np
import pytest

from archive_pdf_tools_spark.corpus.pdfgen import build_pdf, synth_pdf
from archive_pdf_tools_spark.sources.pdf_meta import (
    parse_pdf, pdf_metadata)


def _fixture_pdf():
    img_gray = {"w": 20, "h": 10, "gray": True, "data": bytes(200)}
    img_rgb = {"w": 8, "h": 8, "gray": False, "data": bytes(192)}
    return build_pdf([
        {"width": 612, "height": 792, "rotate": 0,
         "images": [img_gray], "text": "hello"},
        {"width": 595, "height": 842, "rotate": 90,
         "images": [img_gray, img_rgb], "text": None},
        {"width": 612, "height": 792, "images": [], "text": "only text"},
    ])


def test_parse_pdf_pages_and_images():
    meta = parse_pdf(_fixture_pdf())
    assert meta["n_pages"] == 3
    p0, p1, p2 = meta["pages"]
    assert (p0["width"], p0["height"]) == (612, 792)
    assert p0["rotate"] == 0 and p1["rotate"] == 90
    assert p0["n_images"] == 1 and p1["n_images"] == 2 and p2["n_images"] == 0
    assert p0["has_text"] is True
    assert p1["has_text"] is False
    assert p2["has_text"] is True
    im = p0["images"][0]
    assert (im["width"], im["height"], im["mode"], im["format"]) == \
        (20, 10, "L", "FLATE")
    assert p1["images"][1]["mode"] == "RGB"


def test_recommended_format_precedence():
    meta = parse_pdf(_fixture_pdf())
    assert meta["recommended_format"] == "RGB"   # RGB > gray (A8)
    gray_only = build_pdf([{"width": 612, "height": 792, "images": [
        {"w": 4, "h": 4, "gray": True, "data": bytes(16)}], "text": None}])
    assert parse_pdf(gray_only)["recommended_format"] == "GRAYSCALE"
    no_img = build_pdf([{"width": 612, "height": 792, "images": [],
                         "text": "t"}])
    assert parse_pdf(no_img)["recommended_format"] == "NONE"


def test_scale_estimate_default_and_value():
    no_img = build_pdf([{"width": 612, "height": 792, "images": [],
                         "text": "t"}])
    assert parse_pdf(no_img)["scale"] == round(300 / 72, 6)  # A9 default
    big = build_pdf([{"width": 100, "height": 100, "images": [
        {"w": 400, "h": 200, "gray": True, "data": bytes(80000)}],
        "text": None}])
    assert parse_pdf(big)["scale"] == 4.0     # max(400/100, 200/100)


def test_synth_pdfs_roundtrip():
    for seed in range(8):
        blob = synth_pdf(seed)
        meta = parse_pdf(blob)
        assert meta["n_pages"] >= 1
        for page in meta["pages"]:
            assert page["width"] > 0 and page["height"] > 0


def test_pdf_metadata_spark(spark):
    rows = [(f"pdf_{i}", bytearray(synth_pdf(i))) for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id string, pdf binary")
    out = pdf_metadata(df)
    got = out.collect()
    assert all(r["parse_error"] is None for r in got)
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i in range(4):
        want = parse_pdf(synth_pdf(i))
        rows_i = sorted(by_doc[f"pdf_{i}"], key=lambda r: r["page_idx"])
        assert len(rows_i) == want["n_pages"]
        assert rows_i[0]["recommended_format"] == want["recommended_format"]
        for r, p in zip(rows_i, want["pages"]):
            assert r["n_images"] == p["n_images"]
            assert r["has_text"] == p["has_text"]


def test_broken_pdf_reports_error(spark):
    df = spark.createDataFrame([("bad", bytearray(b"not a pdf"))],
                               "doc_id string, pdf binary")
    row = pdf_metadata(df).head()
    assert row["parse_error"] is not None
    assert row["page_idx"] == -1


def test_modern_xref_stream_parity():
    """PDF 1.5 form (xref stream + /ObjStm) parses to identical metadata
    as the classic table form of the same logical document."""
    for seed in range(12):
        classic = parse_pdf(synth_pdf(seed, modern=False))
        modern = parse_pdf(synth_pdf(seed, modern=True))
        assert classic == modern


def test_modern_form_really_is_modern():
    blob = synth_pdf(3, modern=True)
    assert b"/ObjStm" in blob and b"/XRef" in blob
    assert b"\ntrailer" not in blob
    classic = synth_pdf(3, modern=False)
    assert b"trailer" in classic and b"/ObjStm" not in classic


def test_png_predictor_unfilter():
    """PNG Up/Sub/Paeth-filtered xref rows decode to the raw rows."""
    from archive_pdf_tools_spark.sources.pdf_meta import _png_unpredict

    rows = [bytes([1, 0, 0, 0, i, 0, 0]) for i in range(1, 6)]
    raw = b"".join(rows)
    row_len = 7
    # encode with PNG Up (filter type 2): out = cur - prev
    enc = bytearray()
    prev = bytes(row_len)
    for r in rows:
        enc += bytes([2]) + bytes((c - p) & 0xFF for c, p in zip(r, prev))
        prev = r
    assert _png_unpredict(bytes(enc), 12, row_len) == raw
    # filter None round-trips trivially
    enc0 = b"".join(bytes([0]) + r for r in rows)
    assert _png_unpredict(enc0, 10, row_len) == raw
    # TIFF predictor 2
    enc2 = bytearray()
    for r in rows:
        acc = bytearray(r)
        for i in range(len(acc) - 1, 0, -1):
            acc[i] = (acc[i] - acc[i - 1]) & 0xFF
        enc2 += acc
    assert _png_unpredict(bytes(enc2), 2, row_len) == raw


def test_incremental_update_prev_chain():
    """A /Prev-chained incremental update: the newest section wins."""
    import re as _re

    base = synth_pdf(1, modern=False)
    # append an updated catalog-less section that re-points object 1
    # (first image or content) -- easiest honest check: append an update
    # that adds a brand-new object and chains /Prev to the old xref.
    old_startxref = int(_re.findall(rb"startxref\s+(\d+)", base)[-1])
    root = int(_re.findall(rb"/Root (\d+) 0 R", base)[-1])
    size = int(_re.findall(rb"/Size (\d+)", base)[-1])
    new_oid = size
    out = bytearray(base)
    obj_off = len(out)
    out += b"%d 0 obj\n<< /Type /Fluff >>\nendobj\n" % new_oid
    xref_pos = len(out)
    out += b"xref\n%d 1\n%010d 00000 n \n" % (new_oid, obj_off)
    out += (b"trailer\n<< /Size %d /Root %d 0 R /Prev %d >>\n"
            b"startxref\n%d\n%%%%EOF\n"
            % (size + 1, root, old_startxref, xref_pos))
    meta_base = parse_pdf(base)
    meta_upd = parse_pdf(bytes(out))
    assert meta_upd == meta_base          # document content unchanged


def test_incremental_update_free_entry_tombstones():
    """An incremental update that FREES an object must shadow the older
    section's in-use entry (newest-section-wins): the freed object is
    gone, not resurrected by setdefault from the /Prev section."""
    import re as _re

    from archive_pdf_tools_spark.sources.pdf_meta import _Reader

    base = synth_pdf(2, modern=False)
    old_startxref = int(_re.findall(rb"startxref\s+(\d+)", base)[-1])
    root = int(_re.findall(rb"/Root (\d+) 0 R", base)[-1])
    size = int(_re.findall(rb"/Size (\d+)", base)[-1])
    victim = 1                              # first object (an image/content)
    out = bytearray(base)
    xref_pos = len(out)
    out += b"xref\n%d 1\n0000000000 00001 f \n" % victim
    out += (b"trailer\n<< /Size %d /Root %d 0 R /Prev %d >>\n"
            b"startxref\n%d\n%%%%EOF\n"
            % (size, root, old_startxref, xref_pos))

    rd = _Reader(bytes(out))
    assert not rd.has(victim)               # tombstone shadows the old entry
    with pytest.raises(Exception):
        rd.body(victim)
    assert _Reader(base).has(victim)        # and the base doc still has it


def test_dct_image_metadata_from_sof_header():
    """JPEG (/DCTDecode) image streams: dims + mode come from the SOF
    frame header (metadata-without-decode), including when the XObject
    dict disagrees with the codec data."""
    from archive_pdf_tools_spark.corpus.pdfgen import synth_jpeg
    from archive_pdf_tools_spark.sources.pdf_meta import _jpeg_sof

    assert _jpeg_sof(synth_jpeg(33, 21, gray=True)) == (33, 21, 1)
    assert _jpeg_sof(synth_jpeg(40, 50, gray=False)) == (40, 50, 3)
    assert _jpeg_sof(b"not a jpeg") is None

    # 0xFF fill bytes before a marker are legal (ISO 10918-1 B.1.1.2):
    # pad every marker in a valid stream and the SOF walk must re-sync
    clean = synth_jpeg(33, 21, gray=True)
    padded = clean[:2]
    i = 2
    while i < len(clean):
        if clean[i] == 0xFF and i + 1 < len(clean) and clean[i + 1] != 0x00:
            padded += b"\xff\xff\xff"      # three fill bytes, then marker
            padded += clean[i:i + 2]
            seg_len = int.from_bytes(clean[i + 2:i + 4], "big")
            if clean[i + 1] == 0xDA:       # SOS: stop padding, copy rest
                padded += clean[i + 2:]
                break
            padded += clean[i + 2:i + 2 + seg_len]
            i += 2 + seg_len
        else:
            padded += clean[i:i + 1]
            i += 1
    assert _jpeg_sof(bytes(padded)) == (33, 21, 1)

    blob = build_pdf([{"width": 612, "height": 792, "images": [
        {"w": 33, "h": 21, "gray": True, "dct": True,
         "data": synth_jpeg(33, 21, gray=True)}], "text": None}])
    im = parse_pdf(blob)["pages"][0]["images"][0]
    assert (im["width"], im["height"], im["mode"], im["format"]) == \
        (33, 21, "L", "JPEG")

    # dict says 99x99 RGB; SOF says 33x21 gray -> SOF wins
    lying = build_pdf([{"width": 612, "height": 792, "images": [
        {"w": 99, "h": 99, "gray": False, "dct": True,
         "data": synth_jpeg(33, 21, gray=True)}], "text": None}])
    im = parse_pdf(lying)["pages"][0]["images"][0]
    assert (im["width"], im["height"], im["mode"]) == (33, 21, "L")


def test_synth_pdf_mixes_in_dct_images():
    fmts = set()
    for seed in range(16):
        for page in parse_pdf(synth_pdf(seed))["pages"]:
            fmts.update(im["format"] for im in page["images"])
    assert "JPEG" in fmts and "FLATE" in fmts


def test_jpx_image_metadata_from_jp2_header():
    """JPEG 2000 (/JPXDecode) image streams: dims + mode come from the
    JP2 ihdr box (or a raw codestream's SIZ segment) — header-only, no
    decode."""
    from archive_pdf_tools_spark.corpus.pdfgen import synth_jp2
    from archive_pdf_tools_spark.sources.pdf_meta import _jp2_dims

    assert _jp2_dims(synth_jp2(33, 21, gray=True)) == (33, 21, 1)
    assert _jp2_dims(synth_jp2(40, 50, gray=False)) == (40, 50, 3)
    assert _jp2_dims(b"not jp2") is None

    # raw J2K codestream: SOC + SIZ with offsets
    siz = (b"\xff\x4f" + b"\xff\x51" + (38).to_bytes(2, "big")
           + (0).to_bytes(2, "big")
           + (45).to_bytes(4, "big") + (35).to_bytes(4, "big")   # Xsiz Ysiz
           + (5).to_bytes(4, "big") + (5).to_bytes(4, "big")     # XOsiz YOsiz
           + bytes(16)                                           # tile grid
           + (3).to_bytes(2, "big"))                             # Csiz
    assert _jp2_dims(siz) == (40, 30, 3)

    lying = build_pdf([{"width": 612, "height": 792, "images": [
        {"w": 99, "h": 99, "gray": False, "jpx": True,
         "data": synth_jp2(33, 21, gray=True)}], "text": None}])
    im = parse_pdf(lying)["pages"][0]["images"][0]
    assert (im["width"], im["height"], im["mode"], im["format"]) == \
        (33, 21, "L", "JPEG2000")


def test_synth_pdf_mixes_in_jpx_images():
    fmts = set()
    for seed in range(24):
        for page in parse_pdf(synth_pdf(seed))["pages"]:
            fmts.update(im["format"] for im in page["images"])
    assert {"JPEG", "JPEG2000", "FLATE"} <= fmts


def test_hybrid_xrefstm_overrides_classic_free_entries():
    """ISO 32000-1 §7.5.8.4 hybrid-reference file: the classic table
    marks an objstm-resident object FREE (for pre-1.5 readers) while the
    /XRefStm stream supplies its real type-2 entry — the stream entry
    must win, not the table's tombstone."""
    import zlib

    from archive_pdf_tools_spark.sources.pdf_meta import _Reader

    base = synth_pdf(4, modern=False)
    import re as _re
    old_startxref = int(_re.findall(rb"startxref\s+(\d+)", base)[-1])
    root = int(_re.findall(rb"/Root (\d+) 0 R", base)[-1])
    size = int(_re.findall(rb"/Size (\d+)", base)[-1])

    objstm_oid, hidden_oid, xstm_oid = size, size + 1, size + 2
    out = bytearray(base)

    hidden_body = b"<< /Type /Fluff >>"
    header = b"%d 0" % hidden_oid
    payload = header + b"\n" + hidden_body
    z = zlib.compress(payload)
    objstm_pos = len(out)
    out += (b"%d 0 obj\n<< /Type /ObjStm /N 1 /First %d "
            b"/Filter /FlateDecode /Length %d >>\nstream\n"
            % (objstm_oid, len(header) + 1, len(z))
            + z + b"\nendstream\nendobj\n")

    # xref stream: type-1 rows for objstm + itself, type-2 for hidden
    xstm_pos = len(out)
    rows = bytearray()
    rows += bytes([1]) + objstm_pos.to_bytes(4, "big") + (0).to_bytes(2, "big")
    rows += bytes([2]) + objstm_oid.to_bytes(4, "big") + (0).to_bytes(2, "big")
    rows += bytes([1]) + xstm_pos.to_bytes(4, "big") + (0).to_bytes(2, "big")
    zr = zlib.compress(bytes(rows))
    out += (b"%d 0 obj\n<< /Type /XRef /Size %d /W [1 4 2] "
            b"/Index [%d 3] /Root %d 0 R /Filter /FlateDecode "
            b"/Length %d >>\nstream\n"
            % (xstm_oid, size + 3, objstm_oid, root, len(zr))
            + zr + b"\nendstream\nendobj\n")

    # classic incremental table: hidden object marked FREE (§7.5.8.4),
    # trailer points at the stream via /XRefStm
    xref_pos = len(out)
    out += b"xref\n%d 1\n0000000000 00001 f \n" % hidden_oid
    out += (b"trailer\n<< /Size %d /Root %d 0 R /Prev %d /XRefStm %d >>\n"
            b"startxref\n%d\n%%%%EOF\n"
            % (size + 3, root, old_startxref, xstm_pos, xref_pos))

    rd = _Reader(bytes(out))
    assert rd.has(hidden_oid), "XRefStm entry must beat the classic free row"
    assert b"/Fluff" in rd.body(hidden_oid)
    # and the document still parses identically
    assert parse_pdf(bytes(out)) == parse_pdf(base)


def test_lossless_jpeg_images_decode_through_the_pdf_path():
    """/DCTDecode streams carrying the lossless process (SOF3) decode
    through extract_page_images since round 7: 8-bit planes pass
    through exactly, >8-bit precision downshifts into the engine's
    8-bit raster pipeline by the SOF-declared precision, and 2/4-
    component lossless frames (no raster mapping) stay metadata-only
    without failing the page."""
    import numpy as np

    from archive_pdf_tools_spark.corpus.pdfgen import build_pdf
    from archive_pdf_tools_spark.kernels.jpegcodec import encode_lossless
    from archive_pdf_tools_spark.sources.pdf_meta import (
        _jpeg_precision, extract_page_images, parse_pdf)

    rng = np.random.default_rng(75)

    def page(data, w, h, gray):
        return build_pdf([{"width": 612, "height": 792, "images": [
            {"w": w, "h": h, "gray": gray, "dct": True, "data": data}],
            "text": "x"}])

    # 8-bit gray and RGB: exact pixels out
    g8 = rng.integers(0, 256, (14, 19), dtype=np.uint8)
    pdf = page(encode_lossless(g8, predictor=4), 19, 14, True)
    meta = parse_pdf(pdf)
    im = meta["pages"][0]["images"][0]
    assert (im["width"], im["height"], im["mode"]) == (19, 14, "L")
    arr = dict(extract_page_images(pdf, 0, meta=meta))[im["xref"]]
    assert np.array_equal(arr, g8)

    rgb = rng.integers(0, 256, (10, 12, 3), dtype=np.uint8)
    pdf = page(encode_lossless(rgb, predictor=1, interleave=False),
               12, 10, False)
    meta = parse_pdf(pdf)
    im = meta["pages"][0]["images"][0]
    arr = dict(extract_page_images(pdf, 0, meta=meta))[im["xref"]]
    assert np.array_equal(arr, rgb)

    # 16-bit: downshift by precision-8 into uint8
    g16 = rng.integers(0, 65536, (9, 9), dtype=np.uint16)
    data = encode_lossless(g16, predictor=2)
    assert _jpeg_precision(data) == 16
    pdf = page(data, 9, 9, True)
    meta = parse_pdf(pdf)
    im = meta["pages"][0]["images"][0]
    arr = dict(extract_page_images(pdf, 0, meta=meta))[im["xref"]]
    assert arr.dtype == np.uint8
    assert np.array_equal(arr, (g16 >> 8).astype(np.uint8))

    # 12-bit: downshift by 4
    g12 = rng.integers(0, 4096, (8, 8), dtype=np.uint16)
    data = encode_lossless(g12, predictor=7, precision=12)
    assert _jpeg_precision(data) == 12
    pdf = page(data, 8, 8, True)
    meta = parse_pdf(pdf)
    arr = dict(extract_page_images(pdf, 0, meta=meta))[
        meta["pages"][0]["images"][0]["xref"]]
    assert np.array_equal(arr, (g12 >> 4).astype(np.uint8))

    # 4-component lossless: metadata-only, page-level decode survives
    c4 = rng.integers(0, 256, (6, 6, 4), dtype=np.uint8)
    pdf = page(encode_lossless(c4, predictor=3), 6, 6, False)
    meta = parse_pdf(pdf)
    assert dict(extract_page_images(pdf, 0, meta=meta)) == {}

    # precision probe degrades to 8 on garbage
    assert _jpeg_precision(b"not a jpeg") == 8


def test_ccitt_decode_array_accepts_real_numbers():
    """/Decode [1.0 0.0] (reals are legal PDF numbers) must flip the
    sample sense exactly like /Decode [1 0] — before r7 the
    integer-only regex silently ignored it (review finding)."""
    import numpy as np

    from archive_pdf_tools_spark.corpus.pdfgen import build_pdf
    from archive_pdf_tools_spark.kernels.ccittcodec import encode_g4
    from archive_pdf_tools_spark.sources.pdf_meta import (
        extract_page_images, parse_pdf)

    rng = np.random.default_rng(48)
    w, h = 28, 14
    bm = (rng.random((h, w)) < 0.35).astype(np.uint8)
    ink = np.where(bm != 0, 0, 255)
    pdf = build_pdf([{"width": 612, "height": 792, "images": [
        {"w": w, "h": h, "gray": True, "ccitt": True, "ccitt_k": -1,
         "ccitt_black1": True, "data": encode_g4(bm)}],
        "text": "x"}])
    assert b"/Decode [1 0]" in pdf
    # same byte length (xref offsets must not move): reals with the
    # space after /Decode dropped, both legal PDF syntax
    float_pdf = pdf.replace(b"/Decode [1 0]", b"/Decode[1. 0]")

    def run(blob):
        meta = parse_pdf(blob)
        im = meta["pages"][0]["images"][0]
        return dict(extract_page_images(blob, 0, meta=meta))[im["xref"]]

    assert np.array_equal(run(float_pdf), run(pdf))
    assert np.array_equal(run(float_pdf), ink)
    # out-of-range endpoints fall back to identity, never crash
    weird = pdf.replace(b"/Decode [1 0]", b"/Decode [3 7]")
    assert np.array_equal(run(weird), 255 - ink)


# ---------------------------------------------------------------- links


def _link_fixture_pdf(**kw):
    """Two pages with /Link URI annotations: page 0 inline /A + inline
    /Annots, page 1 indirect /A + indirect /Annots array (pdfgen
    alternates both wire shapes by index)."""
    img = {"w": 12, "h": 8, "gray": True, "data": bytes(96)}
    return build_pdf([
        {"width": 612, "height": 792, "images": [img], "text": "one",
         "links": [{"uri": "https://example.org/a",
                    "rect": [10, 20, 110, 36]},
                   {"uri": "https://example.org/b(c)",
                    "rect": [10, 40, 110, 56]}]},
        {"width": 595, "height": 842, "images": [], "text": None,
         "links": [{"uri": "https://example.org/d",
                    "rect": [50.5, 60, 150.5, 76]}]},
    ], **kw)


def test_parse_pdf_hyperlinks():
    """S3 hyperlink capture (reference analyse() `hyperlinks`,
    bin/pdf-metadata-json:367-380): URI + /Rect, over inline and
    indirect /A actions and /Annots arrays."""
    meta = parse_pdf(_link_fixture_pdf())
    p0, p1 = meta["pages"]
    assert [ln["uri"] for ln in p0["links"]] == [
        "https://example.org/a", "https://example.org/b(c)"]
    assert p0["links"][0]["bbox"] == [10.0, 20.0, 110.0, 36.0]
    assert p0["links"][1]["bbox"] == [10.0, 40.0, 110.0, 56.0]
    assert [ln["uri"] for ln in p1["links"]] == ["https://example.org/d"]
    assert p1["links"][0]["bbox"] == [50.5, 60.0, 150.5, 76.0]
    assert all(ln["xref"] > 0 for ln in p0["links"] + p1["links"])


@pytest.mark.parametrize("enc", ["rc4", "aes"])
def test_parse_pdf_hyperlinks_encrypted(enc):
    """Link URI strings in an encrypted classic-xref file are
    per-object encrypted strings — the parse must decrypt them."""
    pdf = _link_fixture_pdf(encrypt=enc, encrypt_password=b"")
    meta = parse_pdf(pdf)
    p0, p1 = meta["pages"]
    assert [ln["uri"] for ln in p0["links"]] == [
        "https://example.org/a", "https://example.org/b(c)"]
    assert [ln["uri"] for ln in p1["links"]] == ["https://example.org/d"]


def test_parse_pdf_inherited_page_attributes():
    """ISO 32000-1 §7.7.3.4: /MediaBox, /Rotate and /Resources on the
    /Pages tree node apply to descendant pages."""
    img0 = {"w": 16, "h": 10, "gray": True, "data": bytes(160)}
    img1 = {"w": 8, "h": 8, "gray": False, "data": bytes(192)}
    pdf = build_pdf([
        {"width": 612, "height": 792, "images": [img0], "text": "t",
         "inherit": True},
        {"width": 612, "height": 792, "images": [img1], "text": None,
         "inherit": True},
    ], inherit_rotate=270)
    meta = parse_pdf(pdf)
    assert meta["n_pages"] == 2
    for p in meta["pages"]:
        assert (p["width"], p["height"]) == (612, 792)
        assert p["rotate"] == 270
        # the shared XObject dict means every page sees both images
        assert p["n_images"] == 2
    dims = {(im["width"], im["height"])
            for im in meta["pages"][0]["images"]}
    assert dims == {(16, 10), (8, 8)}


def test_page_override_beats_inherited_rotate():
    """A page's own /Rotate overrides the tree node's."""
    pdf = build_pdf([
        {"width": 612, "height": 792, "images": [], "text": "a",
         "inherit": True},
        {"width": 612, "height": 792, "images": [], "text": "b",
         "rotate": 90},
    ], inherit_rotate=180)
    meta = parse_pdf(pdf)
    assert meta["pages"][0]["rotate"] == 180
    assert meta["pages"][1]["rotate"] == 90
