"""Watermarked windowed aggregation + stateful run tracking."""

import os
from datetime import datetime

import pytest


def test_windowed_event_stats(spark, tmp_path):
    from archive_pdf_tools_spark.streaming.windowed import (
        windowed_event_stats)

    in_dir = str(tmp_path / "ev")
    rows = [
        (datetime(2024, 1, 1, 0, 1), "click", 10.0),
        (datetime(2024, 1, 1, 0, 4), "click", 20.0),
        (datetime(2024, 1, 1, 0, 12), "click", 30.0),
        (datetime(2024, 1, 1, 0, 13), "error", 5.0),
    ]
    spark.createDataFrame(rows, "ts timestamp, event_type string, "
                          "value double").write.parquet(in_dir)

    stream = (spark.readStream
              .schema("ts timestamp, event_type string, value double")
              .parquet(in_dir))
    out_dir = str(tmp_path / "out")
    q = (windowed_event_stats(stream)
         .writeStream.format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", str(tmp_path / "cp"))
         .outputMode("append")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r["win_start"].minute, r["stage"]): (r["n"], r["total_ms"])
           for r in spark.read.parquet(out_dir).collect()}
    # Append mode emits only windows closed by the watermark: the final
    # event at 00:13 puts the watermark at 23:53 -> no window is closed in
    # a single batch; a second batch with later data closes the first one.
    later = [(datetime(2024, 1, 1, 0, 40), "click", 1.0)]
    spark.createDataFrame(later, "ts timestamp, event_type string, "
                          "value double").write.mode("append").parquet(in_dir)
    q = (windowed_event_stats(stream)
         .writeStream.format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", str(tmp_path / "cp"))
         .outputMode("append")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r["win_start"].minute, r["stage"]): (r["n"], r["total_ms"])
           for r in spark.read.parquet(out_dir).collect()}
    assert got[(0, "click")] == (2, 30.0)
    assert got[(10, "click")] == (1, 30.0)
    assert got[(10, "error")] == (1, 5.0)


def test_track_page_runs_across_batches(spark, tmp_path):
    from archive_pdf_tools_spark.streaming.stateful import track_page_runs

    in_dir = str(tmp_path / "labels")
    os.makedirs(in_dir)
    schema = "doc_id string, offset int, label string"
    # batch 1: arabic run 1..3 then invalid
    spark.createDataFrame(
        [("d1", 0, "1"), ("d1", 1, "2"), ("d1", 2, "3"), ("d1", 3, None)],
        schema).coalesce(1).write.mode("append").parquet(in_dir)

    out_dir = str(tmp_path / "runs")
    cp = str(tmp_path / "cp")

    def run_stream():
        stream = spark.readStream.schema(schema).parquet(in_dir)
        q = (track_page_runs(stream)
             .writeStream.format("parquet")
             .option("path", out_dir)
             .option("checkpointLocation", cp)
             .outputMode("append")
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    run_stream()
    got1 = [(r["start"], r["run_type"], r["run_len"], r["first_value"])
            for r in spark.read.parquet(out_dir).collect()]
    assert got1 == [(0, "Arabic", 3, 1)]      # arabic run closed by invalid

    # batch 2 (new file -> new micro-batch, state carried): invalid
    # continues, then arabic restarts at 7
    spark.createDataFrame(
        [("d1", 4, None), ("d1", 5, "7"), ("d1", 6, "8"), ("d1", 7, "10")],
        schema).coalesce(1).write.mode("append").parquet(in_dir)
    run_stream()
    got2 = sorted((r["start"], r["run_type"], r["run_len"], r["first_value"])
                  for r in spark.read.parquet(out_dir).collect())
    # invalid run (offsets 3-4) closed by '7'; arabic 7,8 closed by the
    # non-consecutive 10; run [10,...] still open in state
    assert (3, "Invalid", 2, -1) in got2
    assert (5, "Arabic", 2, 7) in got2
    assert len(got2) == 3


def test_stream_dedup_across_batches_and_restarts(spark, tmp_path):
    """The seen-fingerprint state must persist across micro-batches AND
    query restarts (checkpointed state store): a duplicate arriving in a
    later run is dropped, a new doc is admitted."""
    from archive_pdf_tools_spark.streaming.dedup_stream import (
        DOCS_SCHEMA_DDL, stream_dedup)

    in_dir = str(tmp_path / "docs")
    out_dir = str(tmp_path / "kept")
    cp = str(tmp_path / "cp")

    def run_once():
        stream = spark.readStream.schema(DOCS_SCHEMA_DDL).parquet(in_dir)
        q = (stream_dedup(stream)
             .writeStream.format("parquet")
             .option("path", out_dir)
             .option("checkpointLocation", cp)
             .outputMode("append")
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    batch1 = [(1, "alpha beta gamma", "en", "s", 16),
              (2, "delta epsilon", "en", "s", 13),
              (3, "Alpha  Beta   GAMMA", "en", "s", 19)]  # dup of 1 (norm)
    spark.createDataFrame(batch1, DOCS_SCHEMA_DDL).write.parquet(in_dir)
    run_once()
    kept1 = sorted(r["doc_id"] for r in spark.read.parquet(out_dir).collect())
    # within one micro-batch the surviving member of a dup group is
    # partition-order dependent; the guarantee is one-per-fingerprint
    assert len(kept1) == 2 and 2 in kept1 and (1 in kept1) != (3 in kept1)

    batch2 = [(4, "delta epsilon", "en", "s", 13),      # dup of 2, prior run
              (5, "zeta eta theta", "en", "s", 14)]     # new
    spark.createDataFrame(batch2, DOCS_SCHEMA_DDL).write.mode(
        "append").parquet(in_dir)
    run_once()
    kept2 = sorted(r["doc_id"] for r in spark.read.parquet(out_dir).collect())
    assert kept2 == sorted(kept1 + [5])


def test_stream_near_dups_across_batches(spark, tmp_path):
    """A near-dup arriving in a LATER micro-batch must pair against the
    bucket members stored in the checkpointed state."""
    from archive_pdf_tools_spark.streaming.dedup_stream import (
        DOCS_SCHEMA_DDL, NEAR_DUP_OUTPUT, stream_near_dups)

    in_dir = str(tmp_path / "docs")
    out_dir = str(tmp_path / "pairs")
    cp = str(tmp_path / "cp")
    base = ("the quick brown fox jumps over the lazy dog and runs through "
            "wide golden fields while evening light settles on far hills")
    near = base.replace("golden", "amber")          # one-token change
    other = ("completely different content about spark shuffles and "
             "arrow batches flowing between executors under pressure")

    def run_once():
        stream = spark.readStream.schema(DOCS_SCHEMA_DDL).parquet(in_dir)
        q = (stream_near_dups(stream, sim_tau=0.5)
             .writeStream.format("parquet")
             .option("path", out_dir)
             .option("checkpointLocation", cp)
             .outputMode("append")
             .trigger(availableNow=True).start())
        q.awaitTermination(180)

    spark.createDataFrame(
        [(1, base, "en", "s", len(base)), (2, other, "en", "s", len(other))],
        DOCS_SCHEMA_DDL).write.parquet(in_dir)
    run_once()
    assert spark.read.schema(NEAR_DUP_OUTPUT).parquet(out_dir).count() == 0

    spark.createDataFrame(
        [(3, near, "en", "s", len(near))],
        DOCS_SCHEMA_DDL).write.mode("append").parquet(in_dir)
    run_once()
    rows = spark.read.parquet(out_dir).collect()
    pairs = {(r["doc_a"], r["doc_b"]) for r in rows}
    assert pairs == {("1", "3")}
    assert all(r["est_jaccard"] >= 0.5 for r in rows)

    # exact duplicate of doc 2 arriving in a third batch
    spark.createDataFrame(
        [(4, other, "en", "s", len(other))],
        DOCS_SCHEMA_DDL).write.mode("append").parquet(in_dir)
    run_once()
    rows = spark.read.parquet(out_dir).collect()
    pairs = {(r["doc_a"], r["doc_b"]) for r in rows}
    assert ("2", "4") in pairs
    exact = [r for r in rows if (r["doc_a"], r["doc_b"]) == ("2", "4")]
    assert all(r["est_jaccard"] == 1.0 for r in exact)


def test_scrub_pii_works_on_streams(spark, tmp_path):
    """scrub_pii is stateless column work, so the identical operator
    composes into Structured Streaming unchanged — the streamed output
    must equal the batch output row for row."""
    from archive_pdf_tools_spark.functions.pipeline import scrub_pii

    in_dir = str(tmp_path / "docs")
    rows = [(0, "mail a@b.io and 10.0.0.1"),
            (1, "call +4930123456 now"),
            (2, "clean text only")]
    spark.createDataFrame(rows, "doc_id bigint, text string") \
        .write.parquet(in_dir)

    batch = {r["doc_id"]: (r["scrubbed"], r["n_email"], r["n_ip"],
                           r["n_phone"])
             for r in scrub_pii(spark.read.parquet(in_dir)).collect()}

    stream = (spark.readStream.schema("doc_id bigint, text string")
              .parquet(in_dir))
    out_dir = str(tmp_path / "out")
    q = (scrub_pii(stream)
         .writeStream.format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", str(tmp_path / "cp"))
         .outputMode("append")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    streamed = {r["doc_id"]: (r["scrubbed"], r["n_email"], r["n_ip"],
                              r["n_phone"])
                for r in spark.read.parquet(out_dir).collect()}
    assert streamed == batch
    assert streamed[0][0] == "mail <email> and <ip>"
    assert streamed[1][0] == "call <phone> now"
