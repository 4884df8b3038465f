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
