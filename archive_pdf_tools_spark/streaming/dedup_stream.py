"""Streaming incremental deduplication.

A continuous-ingest training-data pipeline must drop a document the
moment its (normalized-text) fingerprint has been seen in ANY earlier
micro-batch — batch dedup re-scans the corpus, streaming dedup carries
the seen-set as operator state.  This is the idiomatic Structured
Streaming shape: a JVM-side fingerprint column + ``dropDuplicates`` on
it, whose key state lives in the state store and survives restarts via
the checkpoint (so re-running the query continues deduplicating against
everything already admitted).

State sizing at scale: one state-store row per distinct fingerprint
(16-byte md5 + key overhead).  For bounded state under true infinite
streams, pass ``within`` to use ``dropDuplicatesWithinWatermark`` —
dedup then only guarantees uniqueness inside the watermark horizon
(the standard trade; exact global dedup over 10^12 docs is a batch
anti-join against the fingerprint table, ``functions/dedup.py``).
"""

from __future__ import annotations

from ..functions.textstats import fingerprint

__all__ = ["stream_dedup", "DOCS_SCHEMA_DDL"]

DOCS_SCHEMA_DDL = ("doc_id bigint, text string, lang string, "
                   "source string, n_chars bigint")


def stream_dedup(stream_df, ts_col: str | None = None,
                 within: str | None = None):
    """documents stream -> first-seen documents only (+ ``fp`` column).

    ``within``: optional watermark delay (e.g. ``"1 hour"``); requires
    ``ts_col``.  Without it the seen-set is exact and unbounded."""
    out = stream_df.withColumn("fp", fingerprint("text"))
    if within is not None:
        if ts_col is None:
            raise ValueError("within= requires ts_col=")
        return (out.withWatermark(ts_col, within)
                .dropDuplicatesWithinWatermark(["fp"]))
    return out.dropDuplicates(["fp"])
