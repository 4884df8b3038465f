"""epub-to-pdf front door (the reference's bin/epub-to-pdf surface):
container/OPF/ncx parse, text pagination, TOC -> /Outlines, external
links kept as /Link annotations, internal (named) links skipped and
counted — full circle through the engine's own PDF reader."""

import re

import numpy as np
import pytest

from archive_pdf_tools_spark.corpus.epubgen import build_epub, synth_epub
from archive_pdf_tools_spark.sources.epub import (
    EpubError, epub_to_pdf, epubs_to_pdf, parse_epub)
from archive_pdf_tools_spark.sources.pdf_meta import _Reader, parse_pdf


def _outline_count(pdf: bytes) -> int:
    rd = _Reader(pdf)
    m = re.search(rb"/Root\s+(\d+)", pdf[pdf.rfind(b"trailer"):])
    cat = rd.obj(int(m.group(1)))[1]
    mo = re.search(rb"/Outlines\s+(\d+)\s+\d+\s+R", cat)
    if not mo:
        return 0
    mc = re.search(rb"/Count\s+(\d+)", rd.obj(int(mo.group(1)))[1])
    return int(mc.group(1)) if mc else 0


def test_parse_epub_structure():
    ep = build_epub(
        [{"title": "One", "paras": ["alpha beta gamma"],
          "ext_links": [("https://x.example/a", "link a")],
          "int_links": ["ch1.xhtml#top"]},
         {"title": "Two", "paras": ["delta epsilon"]}],
        metadata={"title": "T", "author": "A", "language": "en"})
    doc = parse_epub(ep)
    assert doc["metadata"] == {"title": "T", "author": "A",
                               "language": "en"}
    assert [c["title"] for c in doc["chapters"]] == ["One", "Two"]
    assert doc["chapters"][0]["blocks"][0] == "One"   # h1 is a block
    assert "alpha beta gamma" in doc["chapters"][0]["blocks"]
    assert doc["chapters"][0]["links"] == [("https://x.example/a",
                                            "link a")]
    assert doc["skipped_links"] == 1                 # the internal one
    assert [(l, t) for l, t, _c in doc["toc"]] == [(1, "One"),
                                                   (2, "Two")]


def test_epub_to_pdf_full_circle():
    """Links, TOC, metadata and text survive into the PDF and read
    back through the engine's own parser."""
    ep = synth_epub(1)
    want = parse_epub(ep)
    pdf, st = epub_to_pdf(ep)
    meta = parse_pdf(pdf)
    assert meta["n_pages"] == st["n_pages"] >= len(want["chapters"])
    assert all(p["has_text"] for p in meta["pages"])
    uris = [ln["uri"] for p in meta["pages"] for ln in p["links"]]
    assert sorted(uris) == sorted(
        u for ch in want["chapters"] for u, _t in ch["links"])
    assert st["ext_links"] == len(uris)
    assert st["skipped_links"] == want["skipped_links"] > 0
    assert _outline_count(pdf) == st["toc_count"] > 0
    assert b"(Book 1)" in pdf or b"Book 1" in pdf   # docinfo title


def test_epub_toc_fallback_without_ncx():
    ep = build_epub([{"title": "Solo", "paras": ["text " * 30]}],
                    ncx=False)
    pdf, st = epub_to_pdf(ep)
    assert st["toc_count"] == 1                     # spine fallback
    assert _outline_count(pdf) == 1


def test_epub_long_chapter_paginates():
    paras = ["word " * 200 for _ in range(6)]
    ep = build_epub([{"title": "Long", "paras": paras}])
    pdf, st = epub_to_pdf(ep)
    assert st["n_pages"] > 1
    meta = parse_pdf(pdf)
    assert meta["n_pages"] == st["n_pages"]


def test_epub_errors_are_typed():
    with pytest.raises(EpubError):
        parse_epub(b"not a zip at all")
    with pytest.raises(EpubError):
        epub_to_pdf(b"PK\x03\x04broken")


def test_epubs_to_pdf_operator(spark):
    rows = [(f"b{i}", bytearray(synth_epub(i))) for i in range(3)]
    rows.append(("bad", bytearray(b"garbage")))
    df = spark.createDataFrame(rows, "doc_id string, epub binary")
    got = {r["doc_id"]: r for r in epubs_to_pdf(df).collect()}
    assert len(got) == 4
    for i in range(3):
        r = got[f"b{i}"]
        assert r["error"] is None and r["n_pages"] > 0
        assert parse_pdf(bytes(r["pdf"]))["n_pages"] == r["n_pages"]
    assert got["bad"]["error"] is not None
    assert got["bad"]["pdf"] is None
