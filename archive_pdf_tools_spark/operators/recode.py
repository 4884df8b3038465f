"""Recode operator: imagestack rows -> finished MRC PDFs.

This is the reference engine's whole purpose as one cluster operator
(``recode.py:595-716`` ``recode(...)``: imagestack + hOCR in, MRC
PDF out): pages decode through the engine's codecs, MRC-decompose,
re-encode (JBIG2 mask + JPEG2000 fg/bg), get an invisible text layer,
and assemble into one PDF per document (``kernels/pdfsink.py``).

Scale shape: identical to the other front doors — ONE shuffle (the
per-doc regroup), every page decode / MRC / encode / assembly step
inside the grouped UDF, no driver-side state.  Output rows are
(doc_id, pdf binary, n_pages, n_text_lines); a poison document
degrades to a NULL pdf with the error recorded, never a failed task.
"""

from __future__ import annotations

import numpy as np

__all__ = ["recode_to_pdf", "recode_document",
           "run_recode_checkpoint"]

OUTPUT_DDL = ("doc_id string, pdf binary, n_pages int, "
              "n_text_lines int, error string")


def recode_document(pages: list, hocr, fg_downsample=3,
                    bg_downsample=3, ppi: float = 72.0,
                    scandata=None, metadata: dict | None = None,
                    lang: str | None = None):
    """[(page_idx, image bytes)] sorted + optional hOCR markup ->
    (pdf bytes, n_pages, n_text_lines).  The per-doc kernel the
    grouped UDF runs; also the local single-process runner.

    ``scandata``: the document's scandata XML (string/bytes) — its TOC
    becomes the PDF outline tree and its page-number labels the
    ``/PageLabels`` number tree (``write_pdf_toc`` +
    ``write_page_labels``, ``pdfhacks.py:211-238``, wired
    ``recode.py:719-727`` in the reference).  ``metadata``/``lang``
    flow to the sink's docinfo/XMP//Lang."""
    from ..kernels.mrc import create_mrc_components
    from ..kernels.pdfsink import build_mrc_pdf, page_labels_pdf
    from ..kernels.textlayer import render_text_layer
    from ..sources.hocr import iter_pages, page_word_data
    from .imagestack import expand_item_pages

    word_data_by_page: dict[int, list] = {}
    if hocr:
        for idx, hp in enumerate(iter_pages(hocr)):
            word_data_by_page[idx] = page_word_data(hp)

    outline = None
    page_labels = None
    if scandata is not None:
        from ..kernels.pagenumbers import parse_series
        from ..sources.scandata import parse_scandata
        if isinstance(scandata, (bytes, bytearray)):
            scandata = bytes(scandata).decode("utf-8", "replace")
        sd = parse_scandata(scandata)
        outline = [(t["level"], t["title"], t["accessible_page"])
                   for t in sd["toc"]] or None
        if sd["page_numbers"]:
            from ..kernels.pagenumbers import ARABIC
            runs, _ok = parse_series(sd["page_numbers"])
            vals: list = []
            for run in runs:          # decimal runs label; others blank
                if run["type"] == ARABIC:
                    vals.extend(run["values_numeric"])
                else:
                    vals.extend([None] * len(run["values"]))
            page_labels = page_labels_pdf(vals)

    pages, decode = expand_item_pages(pages)
    sink_pages = []
    n_lines = 0
    for pidx, payload in pages:
        raster = decode(payload, pidx)
        words = word_data_by_page.get(int(pidx), [])
        res = create_mrc_components(
            raster, words, fg_downsample=fg_downsample,
            bg_downsample=bg_downsample)
        text_ops = b""
        if words:
            h, w = raster.shape[:2]
            # textlayer expects PAGE dims in PDF POINTS (extract.py
            # passes page_geometry output) — scale pixels by 72/ppi
            # so text placement tracks the MediaBox (review finding)
            tl = render_text_layer(words, w * 72.0 / ppi,
                                   h * 72.0 / ppi, ppi)
            text_ops = tl.text_ops
            n_lines += len(tl.lines)
        sink_pages.append({"mask": res.mask, "fg": res.foreground,
                           "bg": res.background, "ppi": ppi,
                           "text_ops": text_ops})
    # callers with a pre-parsed series may still attach labels via
    # sink_pages[0]["page_labels"]; scandata (above) wins if given
    if page_labels is not None and sink_pages:
        sink_pages[0]["page_labels"] = page_labels
    pdf = build_mrc_pdf(sink_pages, metadata=metadata,
                        outline=outline, lang=lang)
    return pdf, len(sink_pages), n_lines


def recode_to_pdf(df, image_col: str = "image",
                  hocr_col: str | None = "hocr",
                  scandata_col: str | None = "scandata",
                  fg_downsample=3, bg_downsample=3):
    """(doc_id, page_idx, image binary[, hocr][, scandata]) ->
    (doc_id, pdf, n_pages, n_text_lines, error) — one finished MRC PDF
    per document.  Same input contract as ``imagestack_to_spans``
    (pages assemble in page_idx order; hOCR/scandata on any row);
    scandata supplies the TOC outline + /PageLabels."""
    import pandas as pd

    has_hocr = hocr_col is not None and hocr_col in df.columns
    has_sd = scandata_col is not None and scandata_col in df.columns

    def _first(pdf_rows, col):
        hv = pdf_rows[col].dropna()
        return hv.iloc[0] if len(hv) else None

    def one_doc(pdf_rows: pd.DataFrame) -> pd.DataFrame:
        doc_id = pdf_rows["doc_id"].iloc[0]
        hocr = _first(pdf_rows, hocr_col) if has_hocr else None
        sd = _first(pdf_rows, scandata_col) if has_sd else None
        pages = sorted(zip(pdf_rows["page_idx"].values,
                           pdf_rows[image_col].values),
                       key=lambda t: int(t[0]))
        try:
            pdf, n_pages, n_lines = recode_document(
                pages, hocr, fg_downsample=fg_downsample,
                bg_downsample=bg_downsample, scandata=sd)
            err = None
        except Exception as exc:  # noqa: BLE001 — poison-doc guard
            pdf, n_pages, n_lines = None, 0, 0
            err = f"{type(exc).__name__}: {exc}"[:200]
        return pd.DataFrame({
            "doc_id": [doc_id],
            "pdf": [bytearray(pdf) if pdf is not None else None],
            "n_pages": [np.int32(n_pages)],
            "n_text_lines": [np.int32(n_lines)],
            "error": [err]})

    cols = ["doc_id", "page_idx", image_col] + (
        [hocr_col] if has_hocr else []) + (
        [scandata_col] if has_sd else [])
    return (df.select(*cols).groupBy("doc_id")
            .applyInPandas(one_doc, schema=OUTPUT_DDL))


def run_recode_checkpoint(spark, df, out_dir: str,
                          shards: int = 16,
                       stop_after_shards: int | None = None,
                       hocr_col: str | None = "hocr") -> dict:
    """Sharded snapshot commits for the PDF recode sink — the shared
    ``checkpoint.run_sharded`` protocol (same crash-safety layout as
    the spans front doors): finished PDFs land in
    ``<out>/pdfs/shard=k`` with a per-shard metrics row (doc / page /
    error counts, total output bytes)."""
    import os

    from pyspark.sql import functions as F

    from .checkpoint import run_sharded

    def write_shard(shard_df, k: int):
        out = recode_to_pdf(shard_df, hocr_col=hocr_col).persist()
        try:
            out.write.mode("overwrite").parquet(
                os.path.join(out_dir, "pdfs", f"shard={k}"))
            (out.select(
                F.count("*").alias("doc_count"),
                F.sum("n_pages").alias("page_count"),
                F.sum(F.length("pdf")).alias("pdf_bytes"),
                F.sum(F.col("error").isNotNull().cast("long"))
                 .alias("error_count"))
             .withColumn("shard", F.lit(k))
             .write.mode("overwrite").parquet(
                 os.path.join(out_dir, "metrics", f"shard={k}")))
        finally:
            out.unpersist()

    return run_sharded(df, out_dir, shards, write_shard,
                       stop_after_shards=stop_after_shards)
