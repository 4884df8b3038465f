"""Imagestack front door (operators/imagestack.py): per-page TIFF
files -> per-doc ordered spans — the reference's PRIMARY input shape
(``recode.py:595-597``: image stack + hOCR, position = page index)."""

import numpy as np
import pytest

from archive_pdf_tools_spark.kernels.tiffcodec import encode_tiff
from archive_pdf_tools_spark.operators.imagestack import (
    decode_page_image, imagestack_to_spans)


def _page(seed: int, gray: bool = True) -> bytes:
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (24, 32), dtype=np.uint8)
    if not gray:
        img = np.stack([img, 255 - img, np.roll(img, 3, 1)], axis=-1)
    return encode_tiff(img, compression="lzw" if gray else "packbits")


def test_decode_page_image_dispatch():
    """Magic-based dispatch: TIFF, JPEG, JP2, PNG and PNM page files
    all decode; junk raises the typed error."""
    from archive_pdf_tools_spark.kernels.jp2codec import encode_jp2
    from archive_pdf_tools_spark.kernels.jpegcodec import encode_baseline
    from archive_pdf_tools_spark.kernels.pngcodec import encode_png
    from archive_pdf_tools_spark.kernels.pnmcodec import encode_pnm
    from archive_pdf_tools_spark.kernels.tiffcodec import TiffError
    rng = np.random.default_rng(8)
    img = rng.integers(0, 256, (16, 24), dtype=np.uint8)
    assert np.array_equal(
        decode_page_image(encode_tiff(img, compression="lzw")), img)
    assert np.array_equal(decode_page_image(encode_jp2(img)), img)
    assert decode_page_image(encode_baseline(img)).shape == img.shape
    assert np.array_equal(decode_page_image(encode_png(img)), img)
    assert np.array_equal(decode_page_image(encode_pnm(img)), img)
    rgb = rng.integers(0, 256, (16, 24, 3), dtype=np.uint8)
    assert np.array_equal(decode_page_image(encode_pnm(rgb)), rgb)
    # PNG alpha lands on the MRC raster contract: RGBA -> RGB,
    # gray+alpha -> gray (PIL convert semantics, mrc.py:361)
    rgba = np.dstack([rgb, img[:, :, None] // 2 + 1])
    dec = decode_page_image(encode_png(rgba))
    assert dec.shape == (16, 24, 3) and np.array_equal(dec, rgb)
    ga = np.dstack([img, 255 - img])
    dec = decode_page_image(encode_png(ga))
    assert dec.shape == (16, 24) and np.array_equal(dec, img)
    with pytest.raises(TiffError, match="unrecognized"):
        decode_page_image(b"\x00\x01\x02junk")


def test_imagestack_to_spans_order_and_poison(spark):
    """Pages assemble in page_idx order regardless of row order, each
    page emits one content-addressed media span, and a corrupt page
    poisons only ITS document (stack_error span, batch survives)."""
    rows = []
    for d in range(3):
        for p in range(3):
            blob = _page(10 * d + p, gray=(d + p) % 2 == 0)
            if d == 2 and p == 1:
                blob = blob[:10]             # corrupt mid-doc page
            rows.append((f"doc{d}", p, bytearray(blob)))
    rows.reverse()                           # row order != page order
    df = spark.createDataFrame(
        rows, "doc_id string, page_idx int, image binary")
    out = {r["doc_id"]: r["spans"]
           for r in imagestack_to_spans(df, hocr_col=None).collect()}
    assert set(out) == {"doc0", "doc1", "doc2"}
    for d in ("doc0", "doc1"):
        spans = out[d]
        media = [s for s in spans if s["kind"] == "media"]
        assert len(media) == 3
        # offsets strictly ordered and refs name ascending pages
        assert [s["offset"] for s in spans] == list(range(len(spans)))
        assert [m["media_ref"].split("/p")[1].split("#")[0]
                for m in media] == ["0", "1", "2"]
        # content-addressed: mask/fg/bg hashes present
        assert all("#mrc=" in m["media_ref"] for m in media)
    bad = out["doc2"]
    assert len(bad) == 1 and bad[0]["kind"] == "stack_error"


def test_imagestack_multipage_tiff_doc(spark):
    """A doc whose single row carries page_idx=-1 and a MULTI-PAGE
    TIFF expands through the next-IFD chain — same span contract,
    pages in chain order — alongside ordinary per-page docs."""
    from archive_pdf_tools_spark.kernels.tiffcodec import (
        encode_tiff_multi)
    rng = np.random.default_rng(12)
    imgs = [rng.integers(0, 256, (18, 26), dtype=np.uint8)
            for _ in range(3)]
    book = encode_tiff_multi(imgs, compression="lzw")
    rows = [("multi", -1, bytearray(book)),
            ("plain", 0, bytearray(_page(77)))]
    df = spark.createDataFrame(
        rows, "doc_id string, page_idx int, image binary")
    out = {r["doc_id"]: r["spans"]
           for r in imagestack_to_spans(df, hocr_col=None).collect()}
    media = [s for s in out["multi"] if s["kind"] == "media"]
    assert [m["media_ref"].split("/p")[1].split("#")[0]
            for m in media] == ["0", "1", "2"]
    assert len([s for s in out["plain"] if s["kind"] == "media"]) == 1


def test_imagestack_zip_item_doc(spark):
    """A page_idx=-1 row carrying the archival ``*_tif.zip`` item
    (``bin/pdf-to-imagestack:33-58`` writes ``<id>_tif/<id>_NNNN.tif``
    entries; ``recode.py:597`` reads pages back via sorted(glob)):
    pages assemble in LEXICOGRAPHIC entry order regardless of archive
    insertion order, mixed page formats dispatch by magic, directory/
    dotfile entries are skipped, and a non-zip/corrupt item poisons
    only its own doc."""
    import io
    import zipfile

    from archive_pdf_tools_spark.kernels.pngcodec import encode_png
    rng = np.random.default_rng(21)
    imgs = [rng.integers(0, 256, (18, 26), dtype=np.uint8)
            for _ in range(3)]
    bio = io.BytesIO()
    with zipfile.ZipFile(bio, "w") as zf:
        zf.writestr("it_tif/", b"")                   # dir entry
        # inserted OUT of page order; names define the order
        zf.writestr("it_tif/it_0002.tif",
                    encode_tiff(imgs[2], compression="lzw"))
        zf.writestr("it_tif/it_0000.tif",
                    encode_tiff(imgs[0], compression="packbits"))
        zf.writestr("it_tif/it_0001.png", encode_png(imgs[1]))
        zf.writestr("it_tif/.DS_Store", b"junk")      # dotfile
    rows = [("zipdoc", -1, bytearray(bio.getvalue())),
            ("baddoc", -1, bytearray(b"PK\x03\x04corrupt"))]
    df = spark.createDataFrame(
        rows, "doc_id string, page_idx int, image binary")
    out = {r["doc_id"]: r["spans"]
           for r in imagestack_to_spans(df, hocr_col=None).collect()}
    media = [s for s in out["zipdoc"] if s["kind"] == "media"]
    assert [m["media_ref"].split("/p")[1].split("#")[0]
            for m in media] == ["0", "1", "2"]
    # page content follows entry-name order: re-derive the refs
    from archive_pdf_tools_spark.kernels.mrc import create_mrc_components
    from archive_pdf_tools_spark.operators.extract import _sha12
    for k, img in enumerate(imgs):
        res = create_mrc_components(img, [])
        assert media[k]["media_ref"].endswith(
            f"#mrc={_sha12(res.mask)}-{_sha12(res.foreground)}-"
            f"{_sha12(res.background)}"), k
    bad = out["baddoc"]
    assert len(bad) == 1 and bad[0]["kind"] == "stack_error"
    assert "zip" in bad[0]["text"].lower()


def test_imagestack_zip_inflate_cap_and_laziness():
    """Review-finding pins: (a) an entry declaring an over-cap
    uncompressed size raises the typed error (poisons one doc) instead
    of inflating; (b) entries inflate ONE AT A TIME — resident memory
    is bounded by a single page, not the archive's total uncompressed
    size (a 1000x-deflatable multi-GB stack must not materialize)."""
    import io
    import zipfile

    from archive_pdf_tools_spark.kernels.tiffcodec import TiffError
    from archive_pdf_tools_spark.operators.imagestack import (
        _ZIP_ENTRY_CAP, _zip_open, _zip_read)

    bio = io.BytesIO()
    with zipfile.ZipFile(bio, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("a_tif/a_0000.bin", b"\x00" * 4096)
    blob = bytearray(bio.getvalue())
    # forge the central-directory uncompressed size over the cap
    big = (_ZIP_ENTRY_CAP + 1).to_bytes(4, "little")
    cd = blob.rindex(b"PK\x01\x02")
    blob[cd + 24:cd + 28] = big
    zf2, infos = _zip_open(bytes(blob))
    assert infos[0].file_size > _ZIP_ENTRY_CAP
    with pytest.raises(TiffError, match="inflate cap"):
        _zip_read(zf2, infos[0])
    # laziness: opening a many-entry archive inflates nothing — reads
    # happen per entry, on demand
    bio = io.BytesIO()
    with zipfile.ZipFile(bio, "w", zipfile.ZIP_DEFLATED) as zf:
        for k in range(50):
            zf.writestr(f"b_tif/b_{k:04d}.bin", b"\x07" * 100_000)
    zf3, infos = _zip_open(bio.getvalue())
    assert len(infos) == 50
    assert _zip_read(zf3, infos[7]) == b"\x07" * 100_000


def test_imagestack_hocr_text_lines(spark):
    """With hOCR attached, accepted MRC text lines appear before the
    page's media span — the flagship imagestack+hOCR pairing."""
    from archive_pdf_tools_spark.corpus.hocrgen import synth_hocr
    # a page whose raster has real dark strokes so hOCR lines accept
    img = np.full((60, 80), 255, np.uint8)
    img[10:14, 5:70] = 20
    blob = encode_tiff(img, compression="g4", bilevel=True)
    hocr = synth_hocr("alpha beta gamma delta", words_per_page=4)
    df = spark.createDataFrame(
        [("d0", 0, bytearray(blob), hocr)],
        "doc_id string, page_idx int, image binary, hocr string")
    spans = imagestack_to_spans(df).collect()[0]["spans"]
    kinds = [s["kind"] for s in spans]
    assert kinds[-1] == "media"
    assert spans[-1]["media_ref"].startswith("stack://d0/p0#mrc=")
