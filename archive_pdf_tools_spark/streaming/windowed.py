"""Watermarked windowed aggregation over an event stream.

The reference is batch-only; this is the idiomatic continuous version of
its stage-timing summary (A1, ``recode.py:237-262``): per event-type
tumbling-window counts/averages with a watermark bounding late data.
Late rows beyond the watermark are dropped by the engine; the state store
holds only open windows — the standard unbounded-stream memory contract.
"""

from __future__ import annotations

__all__ = ["windowed_event_stats"]


def windowed_event_stats(events_stream, window: str = "10 minutes",
                         watermark: str = "20 minutes"):
    """streaming (ts timestamp, event_type string, value double) ->
    streaming windowed stats; append-mode compatible."""
    from pyspark.sql import functions as F

    return (events_stream
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", window).alias("win"),
                     F.col("event_type").alias("stage"))
            .agg(F.count("*").alias("n"),
                 F.round(F.sum("value"), 2).alias("total_ms"),
                 F.round(F.avg("value"), 4).alias("avg_ms"))
            .select(F.col("win.start").alias("win_start"),
                    F.col("win.end").alias("win_end"),
                    "stage", "n", "total_ms", "avg_ms"))
