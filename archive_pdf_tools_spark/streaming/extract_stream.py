"""Streaming extraction: continuously ingest new document files and emit
extracted spans, exactly-once per micro-batch.

The reference is batch-only (SURVEY.md §2.5: no streaming exists there);
this is the idiomatic Spark continuous-ingest shape for the same
semantics: a parquet-directory (or Iceberg) stream source feeding the
*identical* batch DAG through ``foreachBatch`` — the batch operators are
reused verbatim, so batch/stream parity is structural, not re-implemented.
Checkpointing (offsets + batch id) comes from Structured Streaming; the
per-doc output is still deterministic because extraction is a pure
function of the row.
"""

from __future__ import annotations

import os

from ..operators.extract import (OUTPUT_SCHEMA_DDL, extract_spans,
                                 partition_metrics, reassemble)

__all__ = ["stream_extraction", "stream_imagestack"]


def stream_extraction(spark, in_path: str, out_dir: str,
                      checkpoint_dir: str | None = None,
                      trigger_available_now: bool = True,
                      num_partitions: int | None = None):
    """Start the streaming extraction query; returns the StreamingQuery.

    ``in_path``: directory of parquet files in the documents schema; new
    files are picked up per micro-batch.  Output spans append to
    ``out_dir/spans`` and metrics to ``out_dir/metrics``.
    """
    if checkpoint_dir is None:
        checkpoint_dir = os.path.join(out_dir, "_stream_checkpoint")

    stream = (spark.readStream
              .schema(OUTPUT_SCHEMA_DDL)
              .parquet(in_path))

    def process_batch(batch_df, batch_id: int):
        extracted = extract_spans(batch_df, num_partitions=num_partitions)
        extracted.persist()
        try:
            (reassemble(extracted).write.mode("append")
             .parquet(os.path.join(out_dir, "spans")))
            (partition_metrics(extracted).write.mode("append")
             .parquet(os.path.join(out_dir, "metrics")))
        finally:
            extracted.unpersist()

    writer = (stream.writeStream
              .foreachBatch(process_batch)
              .option("checkpointLocation", checkpoint_dir))
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_imagestack(spark, in_path: str, out_dir: str,
                      checkpoint_dir: str | None = None,
                      trigger_available_now: bool = True,
                      hocr_col: str | None = "hocr"):
    """Streaming imagestack ingest: continuously pick up new
    (doc_id, page_idx, image[, hocr]) parquet files — scanner output
    landing as pages — and emit per-doc ordered spans, exactly-once
    per micro-batch through the same foreachBatch reuse of the BATCH
    operator (``operators/imagestack.py``), so batch/stream parity is
    structural.

    Caveat the batch front door shares: one micro-batch must carry a
    document's complete page set (a doc split across batches would
    emit partial span rows per batch) — land files per-document, the
    archival ``*_tif.zip`` item shape."""
    from ..operators.imagestack import imagestack_to_spans

    if checkpoint_dir is None:
        checkpoint_dir = os.path.join(out_dir, "_stream_checkpoint")
    schema = "doc_id string, page_idx int, image binary" + (
        f", {hocr_col} binary" if hocr_col else "")
    stream = spark.readStream.schema(schema).parquet(in_path)

    def process_batch(batch_df, batch_id: int):
        (imagestack_to_spans(batch_df, hocr_col=hocr_col)
         .write.mode("append")
         .parquet(os.path.join(out_dir, "spans")))

    writer = (stream.writeStream
              .foreachBatch(process_batch)
              .option("checkpointLocation", checkpoint_dir))
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
