"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship extraction pipeline on a synthetic interleaved
corpus (the BASELINE.json input_hint table shape, generated executor-side
— no external data); ``queries``/``oracle_sql`` expose every implemented
operator from SURVEY.md §2 (80 queries, 75 DuckDB-oracle-paired —
the first 50 registry entries are all oracle-paired and uniquely
informative; the tail is double-covered/raw rows, each annotated with
the in-window row that covers it —
including the extraction pipeline itself via span-sequence digests, the
checkpoint/resume protocol, and the media/PDF fixture queries via pinned
value-table oracles, see ``archive_pdf_tools_spark/pinned_sql.py``) plus
the training-data-pipeline function library (dedup incl. banded LSH and
connected-component clustering / ANN similarity with self-verifying
recall rows / text analysis incl. winnowing + BPE-ish token counts /
multimodal plumbing / hOCR + PDF front doors).  The implementations live
in ``archive_pdf_tools_spark`` (see that package's module docstrings for
reference citations).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: load /root/testdata/sf0.001 documents parquet, adapt it
    to the interleaved (doc_id, spans) input shape, run the extraction
    pipeline, return the flattened ordered spans.  Driver checks rows>0
    and schema stability."""
    from pyspark.sql import functions as F

    from archive_pdf_tools_spark.plans import run_extraction
    from archive_pdf_tools_spark.sources import load_table
    from archive_pdf_tools_spark.sources.spans_from_text import (
        documents_to_spans)

    raw = load_table(spark, "/root/testdata/sf0.001", "documents").limit(64)
    docs = documents_to_spans(raw)
    out, _metrics = run_extraction(docs, with_metrics=False)
    return out.select("doc_id", F.inline("spans"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from archive_pdf_tools_spark.queries import QUERIES

    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from archive_pdf_tools_spark.queries import QUERIES

    return {name: sql for name, (_fn, sql) in QUERIES.items()
            if sql is not None}
