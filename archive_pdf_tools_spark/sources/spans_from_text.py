"""Adapter: plain-text documents table -> interleaved spans table.

The driver testdata ``documents`` table is (doc_id, text, lang, source,
n_chars); the engine's input contract is the interleaved
``(doc_id, spans)`` shape (BASELINE.json input_hint).  This source lays
the real text out as a deterministic hOCR-like page (fixed-metric font:
lines of up to 8 words, 20 px line height, 10 px per character — the
fixture counterpart of an OCR engine's word boxes) and interleaves a
seeded media span for every third document, so the flagship pipeline can
run end-to-end on the driver's own parquet.

Pure column-level construction would be possible but the payload is JSON;
one vectorized UDF keeps it simple and the shape is built JVM-side with
``from_json`` exactly like the synthetic source.
"""

from __future__ import annotations

import json
from typing import Iterable, Iterator

import pandas as pd

from .corpus_source import SPANS_JSON_SCHEMA
from ..corpus.rasters import make_media_ref

__all__ = ["documents_to_spans", "layout_text"]

LINE_H = 20
CHAR_W = 10
WORDS_PER_LINE = 8
PAGE_W = 1000


def layout_text(text: str, max_words: int = 400) -> str:
    """Deterministic hOCR-like payload for a prose string."""
    return json.dumps(layout_payload(text, max_words),
                      ensure_ascii=False, sort_keys=True)


def layout_payload(text: str, max_words: int = 400) -> dict:
    """``layout_text`` before serialization — for consumers that feed
    the dict straight to a renderer (``corpus.hocrgen.synth_hocr``)
    without paying the dumps/loads round trip."""
    words = text.split()[:max_words]
    lines = []
    y = 10
    for i in range(0, len(words), WORDS_PER_LINE):
        chunk = words[i:i + WORDS_PER_LINE]
        x = 10
        wrecs = []
        for w in chunk:
            ww = max(CHAR_W, len(w) * CHAR_W)
            wrecs.append({"text": w, "bbox": [x, y, x + ww, y + LINE_H],
                          "confidence": 95.0, "fontsize": 12.0,
                          "writing_direction": 0})
            x += ww + CHAR_W
        lines.append({"bbox": [10, y, x, y + LINE_H],
                      "baseline": [0.0, 0.0], "words": wrecs})
        y += LINE_H + 6
    page_h = max(y + 10, 100)
    return {
        "page": {"w": PAGE_W, "h": page_h, "dpi": 300, "scan_res": None},
        "paragraphs": [{"lines": lines}] if lines else [],
    }


def _convert(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for doc_id, text in zip(pdf["doc_id"].values, pdf["text"].values):
            doc_key = f"tdoc_{int(doc_id):08d}"
            spans = [{"kind": "text", "text": layout_text(text or ""),
                      "media_ref": "", "offset": 0}]
            if int(doc_id) % 3 == 0:
                spans.append({"kind": "media", "text": "",
                              "media_ref": make_media_ref(doc_key, 1,
                                                          int(doc_id)),
                              "offset": 1})
            rows.append((doc_key, json.dumps(spans, ensure_ascii=False)))
        yield pd.DataFrame(rows, columns=["doc_id", "spans_json"])


def documents_to_spans(documents_df):
    """documents (doc_id, text, ...) -> (doc_id, spans) interleaved."""
    from pyspark.sql import functions as F

    raw = documents_df.select("doc_id", "text").mapInPandas(
        _convert, schema="doc_id string, spans_json string")
    return raw.select(
        "doc_id", F.from_json("spans_json", SPANS_JSON_SCHEMA).alias("spans"))
