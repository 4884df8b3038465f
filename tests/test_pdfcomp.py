"""Entry point 2 (pdfcomp) — composed recode-existing-PDF dataflow."""

import numpy as np


def _fixture(doc_id="d0", w=64, h=48, modern=False):
    from archive_pdf_tools_spark.corpus.hocrgen import hocr_from_pages
    from archive_pdf_tools_spark.corpus.pdfgen import build_pdf

    rng = np.random.default_rng(42)
    img = np.full((h, w), 235, dtype=np.uint8)
    img[4:16, 4:w // 2 - 2] = 30
    img[4:16, w // 2 + 2:w - 4] = 25
    img = np.clip(img.astype(np.int16) + rng.integers(-6, 7, (h, w)),
                  0, 255).astype(np.uint8)
    pdf = build_pdf([{"width": 612, "height": 792,
                      "images": [{"w": w, "h": h, "gray": True,
                                  "data": img.tobytes()}],
                      "text": "t"}], modern=modern)
    words = [{"text": "lorem", "bbox": [4, 4, w // 2 - 2, 16],
              "confidence": 96.0, "fontsize": 8.0, "writing_direction": 0},
             {"text": "ipsum", "bbox": [w // 2 + 2, 4, w - 4, 16],
              "confidence": 92.0, "fontsize": 8.0, "writing_direction": 0}]
    hocr = hocr_from_pages([{
        "page": {"w": w, "h": h, "dpi": None, "scan_res": None},
        "paragraphs": [{"lines": [{"bbox": [4, 4, w - 4, 16],
                                   "baseline": [0.0, 0.0],
                                   "words": words}]}]}])
    return pdf, hocr, img


def test_recode_matches_direct_kernels(spark):
    """Operator rows == direct parse->decode->MRC invocation."""
    import hashlib

    import pandas as pd

    from archive_pdf_tools_spark.kernels.mrc import create_mrc_components
    from archive_pdf_tools_spark.operators.pdfcomp import (
        recode_existing_pdfs)
    from archive_pdf_tools_spark.sources.hocr import (
        iter_pages, page_word_data)
    from archive_pdf_tools_spark.sources.pdf_meta import extract_page_images

    pdf, hocr, _ = _fixture()
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": ["d0"], "pdf": [bytearray(pdf)],
                      "hocr": [hocr]}))
    (row,) = recode_existing_pdfs(df).collect()
    assert row["error"] is None and row["accepted_lines"] == 1

    words = page_word_data(next(iter_pages(hocr)))
    ((xref, raster),) = extract_page_images(pdf, 0)
    res = create_mrc_components(raster, words)
    want = hashlib.sha1(
        np.ascontiguousarray(res.foreground).tobytes()).hexdigest()[:12]
    assert row["xref"] == xref
    assert row["fg_sha"] == want
    assert row["est_bytes"] < row["orig_bytes"]


def test_recode_modern_equals_classic(spark):
    import pandas as pd

    from archive_pdf_tools_spark.operators.pdfcomp import (
        recode_existing_pdfs)

    pc, hocr, _ = _fixture(modern=False)
    pm, _, _ = _fixture(modern=True)
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": ["classic", "modern"],
        "pdf": [bytearray(pc), bytearray(pm)],
        "hocr": [hocr, hocr]}))
    rows = {r["doc_id"]: r for r in recode_existing_pdfs(df).collect()}
    a, b = rows["classic"], rows["modern"]
    assert (a["mask_sha"], a["fg_sha"], a["bg_sha"]) == \
           (b["mask_sha"], b["fg_sha"], b["bg_sha"])


def test_recode_poison_doc_survives(spark):
    import pandas as pd

    from archive_pdf_tools_spark.operators.pdfcomp import (
        recode_existing_pdfs)

    pdf, hocr, _ = _fixture()
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": ["ok", "bad"],
        "pdf": [bytearray(pdf), bytearray(b"junk")],
        "hocr": [hocr, "<html"]}))
    rows = {r["doc_id"]: r for r in recode_existing_pdfs(df).collect()}
    assert rows["ok"]["error"] is None
    assert rows["bad"]["error"] is not None


def test_extract_text_strings_escapes_and_tj():
    from archive_pdf_tools_spark.sources.pdf_meta import extract_text_strings

    ops = (b"BT (hello) Tj ET BT (a\\(b\\)c) Tj ET "
           b"BT [ (wor) -20 (ld) ] TJ ET "
           b"BT (oct\\101l) Tj ET (ignored, no show op)")
    assert extract_text_strings(ops) == ["hello", "a(b)c", "wor", "ld",
                                         "octAl"]


def test_pdfs_to_spans_text_and_media(spark):
    """PDF front door: content-stream text becomes text spans in page
    order; raw/Flate images become content-addressed media spans."""
    import numpy as np

    from archive_pdf_tools_spark.corpus.pdfgen import build_pdf
    from archive_pdf_tools_spark.operators.pdfcomp import pdfs_to_spans

    img = {"w": 16, "h": 12, "gray": True,
           "data": np.full(192, 200, dtype=np.uint8).tobytes()}
    blob = build_pdf([
        {"width": 612, "height": 792, "images": [], "text": "first page"},
        {"width": 612, "height": 792, "images": [img], "text": "second"},
    ])
    df = spark.createDataFrame([("d0", bytearray(blob))],
                               "doc_id string, pdf binary")
    rows = pdfs_to_spans(df, hocr_col=None).collect()
    assert len(rows) == 1
    spans = [s.asDict() for s in rows[0]["spans"]]
    texts = [s["text"] for s in spans if s["kind"] == "text"]
    assert texts == ["first page", "second"]
    media = [s for s in spans if s["kind"] == "media"]
    assert len(media) == 1
    assert media[0]["media_ref"].startswith("pdf://d0/p1/x")
    assert "#mrc=" in media[0]["media_ref"]
    assert [s["offset"] for s in spans] == list(range(len(spans)))


def test_pdfs_to_spans_poison_doc_emits_error_span(spark):
    """A document whose PDF bytes crash the parser must stay observable:
    one pdf_error span naming the exception, never a silently-empty
    span list (same failure contract as the HTML front door)."""
    from archive_pdf_tools_spark.corpus.pdfgen import build_pdf
    from archive_pdf_tools_spark.operators.pdfcomp import pdfs_to_spans

    good = build_pdf([{"width": 612, "height": 792, "images": [],
                       "text": "fine"}])
    # valid header, truncated xref -> parse_pdf raises
    poison = good[:40]
    df = spark.createDataFrame(
        [("ok", bytearray(good)), ("bad", bytearray(poison))],
        "doc_id string, pdf binary")
    rows = {r["doc_id"]: [s.asDict() for s in r["spans"]]
            for r in pdfs_to_spans(df, hocr_col=None).collect()}
    assert [s["text"] for s in rows["ok"] if s["kind"] == "text"] == ["fine"]
    assert len(rows["bad"]) == 1
    err = rows["bad"][0]
    assert err["kind"] == "pdf_error" and err["text"]


def test_run_pdf_checkpoint_resume(spark, tmp_path):
    import pandas as pd

    from archive_pdf_tools_spark.corpus.pdfgen import synth_pdf
    from archive_pdf_tools_spark.operators.pdfcomp import run_pdf_checkpoint

    def gen(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": [f"p{int(i):03d}" for i in pdf["id"].values],
                "pdf": [synth_pdf(int(i)) for i in pdf["id"].values]})

    docs = spark.range(0, 10).repartition(2).mapInPandas(
        gen, schema="doc_id string, pdf binary")
    out = str(tmp_path / "pdfcp")
    m = run_pdf_checkpoint(spark, docs, out, shards=4, stop_after_shards=2)
    assert len(m["committed_shards"]) == 2
    m = run_pdf_checkpoint(spark, docs, out, shards=4)
    assert m["committed_shards"] == [0, 1, 2, 3]
    spans = spark.read.parquet(f"{out}/spans")
    assert spans.count() == 10
    assert spans.select("doc_id").distinct().count() == 10


def test_extract_text_strings_review_cases():
    """Cases from review: invalid octal escapes must not crash (spec:
    drop the backslash), strings between two TJ arrays are NOT shown,
    hex strings and line continuations are handled."""
    from archive_pdf_tools_spark.sources.pdf_meta import extract_text_strings

    # \8 and \9 are not octal: backslash dropped, char kept
    assert extract_text_strings(b"(bad\\8esc) Tj") == ["bad8esc"]
    assert extract_text_strings(b"(x\\9) Tj") == ["x9"]
    # a string consumed by Td between two TJ arrays is never shown
    ops = b"[ (a) ] TJ (x) 5 0 Td [ (b) ] TJ"
    assert extract_text_strings(ops) == ["a", "b"]
    # hex strings shown by Tj; whitespace inside hex; odd length pads 0
    assert extract_text_strings(b"<4869 2 1> Tj") == ["Hi!"]
    # line continuation inside a literal
    assert extract_text_strings(b"(ab\\\ncd) Tj") == ["abcd"]
    # ' and " show the last string operand
    assert extract_text_strings(b"(q) ' 1 2 (w) \"") == ["q", "w"]
    # strings consumed by non-show operators are dropped
    assert extract_text_strings(b"(name) Tf (shown) Tj") == ["shown"]


def test_extract_text_strings_never_raises_on_garbage():
    """Crash-safety fuzz: the tokenizer and codec header parsers must
    tolerate arbitrary bytes (content streams in the wild are hostile;
    a parser exception would vaporize the whole document through the
    poison-doc guard)."""
    import random

    from archive_pdf_tools_spark.sources.pdf_meta import (
        _jp2_dims, _jpeg_sof, extract_text_strings)

    rng = random.Random(7)
    for _ in range(400):
        blob = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 160)))
        extract_text_strings(blob)
        _jp2_dims(blob)
        _jpeg_sof(blob)
    parts = [b"(", b")", b"\\", b"[", b"]", b"TJ", b"Tj", b"'", b'"', b"<",
             b">", b"<<", b">>", b"/Name", b"12", b"-3.5", b"Td", b"%c\n",
             b" ", b"\x00", b"(nested(paren))", b"\\8", b"\\101", b"\\\n"]
    for _ in range(400):
        blob = b" ".join(rng.choice(parts)
                         for _ in range(rng.randrange(0, 40)))
        extract_text_strings(blob)
