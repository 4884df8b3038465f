"""recompress_pdf: the bin/compress-pdf-images product — image XObjects
swapped for MRC bg/fg/mask inside the EXISTING document, text layer and
structure preserved, old image bytes garbage-collected."""

import re

import numpy as np
import pytest

from archive_pdf_tools_spark.corpus.hocrgen import synth_hocr
from archive_pdf_tools_spark.corpus.pdfgen import synth_pdf
from archive_pdf_tools_spark.kernels.pdfrewrite import recompress_pdf
from archive_pdf_tools_spark.sources.pdf_meta import (
    PdfError, _Reader, _stream_data, extract_page_images,
    extract_text_strings, _get_ref, parse_pdf)


def _hocr(i):
    h = synth_hocr(f"doc {i} alpha beta", words_per_page=4)
    return h.encode() if isinstance(h, str) else h


def _page_text(pdf, meta, pidx):
    rd = _Reader(pdf)
    page = meta["pages"][pidx]
    cid = _get_ref(rd.obj(page["oid"])[1], b"/Contents")
    body, d = rd.obj(cid)
    return [s for s in extract_text_strings(_stream_data(body, d))
            if s.strip()]


@pytest.mark.parametrize("i", [1, 2, 3, 10])
def test_recompress_full_circle(i):
    pdf = synth_pdf(i)
    meta_in = parse_pdf(pdf)
    r = recompress_pdf(pdf, _hocr(i))
    meta_out = parse_pdf(r.pdf)

    assert meta_out["n_pages"] == meta_in["n_pages"]
    assert r.n_images > 0 and r.skipped == 0
    rd = _Reader(r.pdf)
    for p_in, p_out in zip(meta_in["pages"], meta_out["pages"]):
        # text layer preserved: the exact shown strings survive
        assert p_out["has_text"] == p_in["has_text"]
        if p_in["has_text"]:
            assert _page_text(r.pdf, meta_out, p_out["page_idx"]) == \
                _page_text(pdf, meta_in, p_in["page_idx"])
        # every recompressed image became a decodable bg/fg pair
        got = extract_page_images(r.pdf, p_out["page_idx"],
                                  meta=meta_out, rd=rd)
        orig = extract_page_images(pdf, p_in["page_idx"], meta=meta_in)
        assert len(got) == 2 * len(orig)
        # fg carries a JBIG2 /SMask
        n_fg = 0
        for im in p_out["images"]:
            if re.search(rb"/SMask\s+\d+", rd.obj(im["xref"])[1]):
                n_fg += 1
        assert n_fg == len(orig)


def test_recompress_drops_old_image_bytes():
    """The old image XObject numbers become FREE xref entries in the
    output (the garbage-collection half of doc.save(garbage=2))."""
    pdf = synth_pdf(1)
    meta_in = parse_pdf(pdf)
    old_imgs = {im["xref"] for pg in meta_in["pages"]
                for im in pg["images"]}
    r = recompress_pdf(pdf, None)
    assert r.n_images == len(old_imgs)
    rd_out = _Reader(r.pdf)
    for oid in old_imgs:
        e = rd_out.entries.get(oid)
        assert e is None or e[0] == 0, f"old image {oid} still live"
    assert len(r.pdf) > 0


@pytest.mark.parametrize("i", [0, 7])   # every 7th fixture: encrypted
def test_recompress_decrypts_and_rewrites(i):
    """Encrypted inputs produce ordinary UNENCRYPTED recompressed
    PDFs: no /Encrypt in the output, the /Encrypt object's slot freed,
    text strings equal the decrypted originals, every image a
    decodable bg/fg pair."""
    pdf = synth_pdf(i)
    meta_in = parse_pdf(pdf)
    rd_in = _Reader(pdf)
    assert rd_in.crypt is not None       # fixture really is encrypted
    r = recompress_pdf(pdf, _hocr(i))
    rd_out = _Reader(r.pdf)
    assert rd_out.crypt is None
    assert b"/Encrypt" not in r.pdf[r.pdf.rfind(b"trailer"):]
    meta_out = parse_pdf(r.pdf)
    assert meta_out["n_pages"] == meta_in["n_pages"]
    for p_in, p_out in zip(meta_in["pages"], meta_out["pages"]):
        assert p_out["has_text"] == p_in["has_text"]
        if p_in["has_text"]:
            assert _page_text(r.pdf, meta_out, p_out["page_idx"]) == \
                _enc_page_text(pdf, meta_in, p_in["page_idx"])
        got = extract_page_images(r.pdf, p_out["page_idx"],
                                  meta=meta_out, rd=rd_out)
        orig = extract_page_images(pdf, p_in["page_idx"],
                                   meta=meta_in, rd=rd_in)
        assert len(got) == 2 * len(orig)


def _enc_page_text(pdf, meta, pidx):
    rd = _Reader(pdf)
    page = meta["pages"][pidx]
    cid = _get_ref(rd.obj(page["oid"])[1], b"/Contents")
    body, d = rd.obj(cid)
    return [s for s in extract_text_strings(
        _stream_data(body, d, rd._decrypter(cid))) if s.strip()]


def test_recompress_password_protected():
    from archive_pdf_tools_spark.corpus.pdfgen import build_pdf

    pg = [{"width": 612, "height": 792, "images": [],
           "text": "secret text"}]
    enc = build_pdf(pg, encrypt="aes256", encrypt_password=b"pw")
    with pytest.raises(PdfError):          # wrong password still fails
        recompress_pdf(enc, None)
    r = recompress_pdf(enc, None, password=b"pw")
    meta = parse_pdf(r.pdf)
    assert _page_text(r.pdf, meta, 0) == ["secret text"]


def test_recompress_operator_and_checkpoint(spark, tmp_path):
    from archive_pdf_tools_spark.operators.pdfcomp import (
        recompress_pdfs, run_recompress_checkpoint)

    rows = [(f"d{i}", bytearray(synth_pdf(i)),
             _hocr(i) if i % 2 else None) for i in range(4)]
    df = spark.createDataFrame(
        rows, "doc_id string, pdf binary, hocr binary")
    out = {r["doc_id"]: r for r in recompress_pdfs(df).collect()}
    assert len(out) == 4
    for d in ("d0", "d1", "d2", "d3"):   # d0 encrypted: decrypts now
        r = out[d]
        assert r["error"] is None
        meta = parse_pdf(bytes(r["pdf"]))
        assert meta["n_pages"] == r["n_pages"]

    man = run_recompress_checkpoint(spark, df, str(tmp_path / "o"),
                                    shards=2)
    assert sorted(man["committed_shards"]) == [0, 1]
    got = spark.read.parquet(str(tmp_path / "o" / "pdfs"))
    assert got.count() == 4
    mx = spark.read.parquet(str(tmp_path / "o" / "metrics"))
    agg = mx.groupBy().sum("doc_count", "error_count").collect()[0]
    assert agg[0] == 4 and agg[1] == 0


def _manual_array_contents_pdf():
    """Minimal classic-xref PDF whose page draws text (part 1) and an
    image under a CTM split ACROSS two content parts (the /Contents
    array form, ISO 32000 §7.8.2)."""
    import zlib

    img = np.full((40, 60), 200, np.uint8)
    img[10:20, 10:50] = 40
    raw = zlib.compress(img.tobytes())
    p1 = b"BT /F1 12 Tf 72 700 Td (hello split) Tj ET\nq 120 0 0 80 36 500 cm"
    p2 = b"/Im0 Do Q"
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792]"
        b" /Resources << /XObject << /Im0 4 0 R >>"
        b" /Font << /F1 7 0 R >> >>"
        b" /Contents [5 0 R 6 0 R] >>",
        b"<< /Type /XObject /Subtype /Image /Width 60 /Height 40"
        b" /ColorSpace /DeviceGray /BitsPerComponent 8"
        b" /Filter /FlateDecode /Length " + str(len(raw)).encode()
        + b" >>\nstream\n" + raw + b"\nendstream",
        b"<< /Length " + str(len(p1)).encode() + b" >>\nstream\n"
        + p1 + b"\nendstream",
        b"<< /Length " + str(len(p2)).encode() + b" >>\nstream\n"
        + p2 + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.5\n")
    offs = []
    for i, body in enumerate(objs, 1):
        offs.append(len(out))
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref = len(out)
    out += b"xref\n0 %d\n0000000000 65535 f \n" % (len(objs) + 1)
    for o in offs:
        out += b"%010d 00000 n \n" % o
    out += (b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n"
            b"%%%%EOF\n" % (len(objs) + 1, xref))
    return bytes(out)


def test_recompress_contents_array():
    """A page whose /Contents is an ARRAY of parts (the draw op split
    across parts) recompresses: parts merge into one stream, the image
    becomes a decodable bg/fg pair, the text survives, and the old
    parts + image are garbage-collected."""
    pdf = _manual_array_contents_pdf()
    meta_in = parse_pdf(pdf)
    assert meta_in["pages"][0]["n_images"] == 1
    r = recompress_pdf(pdf, None)
    assert r.n_images == 1 and r.skipped == 0
    meta_out = parse_pdf(r.pdf)
    assert meta_out["n_pages"] == 1
    assert meta_out["pages"][0]["has_text"]
    assert _page_text(r.pdf, meta_out, 0) == ["hello split"]
    got = extract_page_images(r.pdf, 0, meta=meta_out)
    assert len(got) == 2                       # bg + fg decode
    rd = _Reader(r.pdf)
    # old image (4) and both old content parts (5, 6) are free slots
    for oid in (4, 5, 6):
        e = rd.entries.get(oid)
        assert e is None or e[0] == 0, oid


# ------------------------------------------------ links + inheritance


def _links_of(meta):
    return sorted((p["page_idx"], ln["uri"], tuple(ln["bbox"]))
                  for p in meta["pages"] for ln in p["links"])


def test_recompress_preserves_link_annotations():
    """/Annots live outside the content stream; keeping original
    object numbers through the rewrite must carry every link
    (uri + /Rect) into the output unchanged — the reference's
    `hyperlinks` field survives its recompression the same way."""
    from archive_pdf_tools_spark.corpus.pdfgen import build_pdf

    img = {"w": 24, "h": 16, "gray": True, "data": bytes(24 * 16)}
    pdf = build_pdf([
        {"width": 612, "height": 792, "images": [img], "text": "one",
         "links": [{"uri": "https://example.org/keep",
                    "rect": [10, 20, 110, 36]},
                   {"uri": "https://example.org/two",
                    "rect": [10, 40, 110, 56]}]},
        {"width": 595, "height": 842, "images": [], "text": None,
         "links": [{"uri": "https://example.org/other",
                    "rect": [50.5, 60, 150.5, 76]}]},
    ])
    want = _links_of(parse_pdf(pdf))
    assert len(want) == 3
    r = recompress_pdf(pdf, None)
    assert r.n_images == 1
    assert _links_of(parse_pdf(r.pdf)) == want


def test_recompress_preserves_links_through_decryption():
    """Encrypted input -> plain output: URIs decrypt and re-emit."""
    from archive_pdf_tools_spark.corpus.pdfgen import build_pdf

    img = {"w": 16, "h": 12, "gray": True, "data": bytes(192)}
    pdf = build_pdf([
        {"width": 612, "height": 792, "images": [img], "text": "t",
         "links": [{"uri": "https://example.org/enc",
                    "rect": [5, 5, 99, 21]}]}],
        encrypt="aes", encrypt_password=b"")
    r = recompress_pdf(pdf, None)
    got = _links_of(parse_pdf(r.pdf))
    assert got == [(0, "https://example.org/enc", (5.0, 5.0, 99.0, 21.0))]


def test_recompress_inherited_shared_resources():
    """Inherited /Resources (ISO 32000-1 §7.7.3.4): the pages share
    ONE XObject dict.  Every image must still be recompressed exactly
    once, the old bytes collected, sibling pages left painting their
    own bg/fg pairs, and the inherited /Rotate preserved."""
    from archive_pdf_tools_spark.corpus.pdfgen import build_pdf

    rng = np.random.default_rng(11)

    def img(w, h):
        return {"w": w, "h": h, "gray": True,
                "data": rng.integers(0, 256, w * h,
                                     dtype=np.uint8).tobytes()}

    pdf = build_pdf([
        {"width": 612, "height": 792, "images": [img(40, 30)],
         "text": "p0", "inherit": True,
         "links": [{"uri": "https://example.org/i",
                    "rect": [8, 8, 88, 24]}]},
        {"width": 612, "height": 792, "images": [img(32, 24)],
         "text": None, "inherit": True},
    ], inherit_rotate=90)
    meta_in = parse_pdf(pdf)
    old_imgs = {im["xref"] for pg in meta_in["pages"]
                for im in pg["images"]}
    assert len(old_imgs) == 2                  # shared dict, 2 images

    r = recompress_pdf(pdf, None)
    assert (r.n_images, r.skipped) == (2, 0)
    meta_out = parse_pdf(r.pdf)
    rd_out = _Reader(r.pdf)
    for oid in old_imgs:                       # old bytes collected
        e = rd_out.entries.get(oid)
        assert e is None or e[0] == 0, f"old image {oid} still live"
    for pidx in (0, 1):
        p = meta_out["pages"][pidx]
        assert p["rotate"] == 90
        # shared dict now holds the 4 new objects (2 bg + 2 fg); all
        # decodable through the engine's own reader
        got = extract_page_images(r.pdf, pidx, meta=meta_out, rd=rd_out)
        assert len(got) == 4
        assert all(a.size > 0 for _x, a in got)
    assert _links_of(meta_out) == _links_of(meta_in)


def test_recompress_same_image_drawn_on_two_pages():
    """One image object referenced AND drawn from two pages (classic
    per-page dicts pointing at the same oid): both pages must end up
    painting their own MRC pair and the shared original must drop only
    after the second replacement."""
    from archive_pdf_tools_spark.corpus.pdfgen import build_pdf

    rng = np.random.default_rng(13)
    data = rng.integers(0, 256, 40 * 30, dtype=np.uint8).tobytes()
    img = {"w": 40, "h": 30, "gray": True, "data": data}
    pdf = build_pdf([
        {"width": 612, "height": 792, "images": [img], "text": "a"},
        {"width": 612, "height": 792, "images": [img], "text": None},
    ])
    meta_in = parse_pdf(pdf)
    xrefs = [im["xref"] for pg in meta_in["pages"]
             for im in pg["images"]]
    r = recompress_pdf(pdf, None)
    assert r.skipped == 0
    assert r.n_images == len(xrefs)
    meta_out = parse_pdf(r.pdf)
    rd_out = _Reader(r.pdf)
    for oid in set(xrefs):
        e = rd_out.entries.get(oid)
        assert e is None or e[0] == 0
    for pidx in (0, 1):
        got = extract_page_images(r.pdf, pidx, meta=meta_out,
                                  rd=rd_out)
        assert len(got) == 2 and all(a.size > 0 for _x, a in got)


def test_referenced_but_not_drawn_entry_stripped():
    """An image object referenced from one page's resources but DRAWN
    only on another page: after the drawing page's replacement drops
    the object, the non-drawing page's name entry must be stripped too
    — a dict entry pointing at a freed xref slot makes the engine's
    own re-read reject the document."""
    import zlib

    rng = np.random.default_rng(17)
    raster = rng.integers(0, 256, (30, 40), dtype=np.uint8)
    img_stream = zlib.compress(raster.tobytes())
    ops1 = b"q 40 0 0 30 10 10 cm /Im9 Do Q"
    ops0 = b"BT ET"                        # references Im9, never draws

    bodies = {}
    bodies[1] = (b"<< /Type /XObject /Subtype /Image /Width 40 "
                 b"/Height 30 /BitsPerComponent 8 /ColorSpace "
                 b"/DeviceGray /Filter /FlateDecode /Length "
                 + str(len(img_stream)).encode() + b" >>\nstream\n"
                 + img_stream + b"\nendstream")
    bodies[2] = (b"<< /Length " + str(len(ops0)).encode()
                 + b" >>\nstream\n" + ops0 + b"\nendstream")
    bodies[3] = (b"<< /Length " + str(len(ops1)).encode()
                 + b" >>\nstream\n" + ops1 + b"\nendstream")
    bodies[4] = (b"<< /Type /Page /Parent 6 0 R /MediaBox [0 0 612 792]"
                 b" /Resources << /XObject << /Im9 1 0 R >> >>"
                 b" /Contents 2 0 R >>")
    bodies[5] = (b"<< /Type /Page /Parent 6 0 R /MediaBox [0 0 612 792]"
                 b" /Resources << /XObject << /Im9 1 0 R >> >>"
                 b" /Contents 3 0 R >>")
    bodies[6] = b"<< /Type /Pages /Kids [4 0 R 5 0 R] /Count 2 >>"
    bodies[7] = b"<< /Type /Catalog /Pages 6 0 R >>"

    out = bytearray(b"%PDF-1.4\n")
    offsets = {}
    for k in range(1, 8):
        offsets[k] = len(out)
        out += b"%d 0 obj\n" % k + bodies[k] + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 8\n0000000000 65535 f \n"
    for k in range(1, 8):
        out += b"%010d 00000 n \n" % offsets[k]
    out += (b"trailer\n<< /Size 8 /Root 7 0 R >>\nstartxref\n"
            + str(xref_at).encode() + b"\n%%EOF\n")
    pdf = bytes(out)

    meta_in = parse_pdf(pdf)               # sanity: both pages see ImS
    assert [p["n_images"] for p in meta_in["pages"]] == [1, 1]

    r = recompress_pdf(pdf, None)
    assert (r.n_images, r.skipped) == (1, 0)
    # re-read must succeed — the dangling '/Im9 1 0 R' on page 0 would
    # raise PdfError here before the fix
    meta_out = parse_pdf(r.pdf)
    rd_out = _Reader(r.pdf)
    e = rd_out.entries.get(1)
    assert e is None or e[0] == 0          # old image freed
    # page 0 resources no longer reference the freed object
    assert meta_out["pages"][0]["n_images"] == 0
    got = extract_page_images(r.pdf, 1, meta=meta_out, rd=rd_out)
    assert len(got) == 2 and all(a.size > 0 for _x, a in got)


def test_shared_dict_undecodable_image_counts_skipped_once():
    """One undecodable image in an inherited/shared resources dict must
    count into RecompressResult.skipped ONCE, not once per page."""
    from archive_pdf_tools_spark.corpus.pdfgen import build_pdf

    rng = np.random.default_rng(19)
    good = {"w": 32, "h": 24, "gray": True,
            "data": rng.integers(0, 256, 32 * 24,
                                 dtype=np.uint8).tobytes()}
    # a JPX image whose header parses (dims from the ihdr box) but
    # whose codestream is truncated: metadata sees it, decode fails
    from archive_pdf_tools_spark.kernels.jp2codec import encode_jp2

    jp2 = encode_jp2(np.full((16, 16), 128, np.uint8))
    bad = {"w": 16, "h": 16, "gray": True, "jpx": True,
           "data": jp2[:len(jp2) // 2]}
    pages = [
        {"width": 612, "height": 792, "images": [good], "text": "a",
         "inherit": True},
        {"width": 612, "height": 792, "images": [bad], "text": None,
         "inherit": True},
        {"width": 612, "height": 792, "images": [], "text": None,
         "inherit": True},
    ]
    pdf = build_pdf(pages)
    r = recompress_pdf(pdf, None)
    assert r.skipped == 1
    assert r.n_images == 1
