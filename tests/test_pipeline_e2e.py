"""End-to-end: Spark extraction pipeline == single-process local runner.

The per-row invariant is span-sequence equality on
(kind, text, media_ref, order) — FIXTURES.md §4.
"""

import pytest

from archive_pdf_tools_spark.corpus.generate import make_documents
from archive_pdf_tools_spark.operators.extract import (
    extract_document_local, extract_spans, partition_metrics, reassemble)

N_DOCS = 24


@pytest.fixture(scope="module")
def corpus():
    return make_documents(N_DOCS, max_spans=30)


@pytest.fixture(scope="module")
def golden(corpus):
    return {d["doc_id"]: extract_document_local(d)["spans"] for d in corpus}


@pytest.fixture(scope="module")
def input_df(spark, corpus):
    from archive_pdf_tools_spark.operators.extract import OUTPUT_SCHEMA_DDL
    rows = [(d["doc_id"],
             [(s["kind"], s["text"], s["media_ref"], s["offset"])
              for s in d["spans"]]) for d in corpus]
    return spark.createDataFrame(rows, schema=OUTPUT_SCHEMA_DDL)


def test_spark_matches_local_runner(spark, input_df, golden):
    out = reassemble(extract_spans(input_df, num_partitions=8))
    got = {r["doc_id"]: [s.asDict() for s in r["spans"]]
           for r in out.collect()}
    assert set(got) == set(golden)
    for doc_id in golden:
        assert got[doc_id] == golden[doc_id], doc_id


def test_output_offsets_contiguous(spark, input_df):
    out = reassemble(extract_spans(input_df, num_partitions=8))
    for row in out.collect():
        offsets = [s["offset"] for s in row["spans"]]
        assert offsets == list(range(len(offsets)))


def test_partitioning_invariance(spark, input_df, golden):
    """Same result at a different parallelism (order is data, not
    partition order)."""
    out = reassemble(extract_spans(input_df, num_partitions=3))
    got = {r["doc_id"]: [s.asDict() for s in r["spans"]]
           for r in out.collect()}
    for doc_id in golden:
        assert got[doc_id] == golden[doc_id]


def test_metrics_cover_every_page(spark, input_df, corpus):
    extracted = extract_spans(input_df, num_partitions=8)
    m = partition_metrics(extracted).collect()
    total_pages = sum(len(d["spans"]) for d in corpus)
    assert sum(r["page_count"] for r in m) == total_pages
    assert sum(r["doc_count"] for r in m) >= N_DOCS  # docs may span partitions
    assert all(r["kernel_ms"] >= 0 for r in m)


def test_skip_and_stop_after_match_local(spark, input_df, corpus):
    """F1/F2 pipeline options: skip offsets then stop-after, identical to
    the local runner's sequential semantics (recode.py:114-121)."""
    from archive_pdf_tools_spark.plans import run_extraction

    skip = {1, 3}
    out, _ = run_extraction(input_df, num_partitions=6,
                            with_metrics=False, skip_offsets=skip,
                            stop_after=4)
    got = {r["doc_id"]: [s.asDict() for s in r["spans"]]
           for r in out.collect()}
    for doc in corpus:
        want = extract_document_local(doc, skip_offsets=skip, stop_after=4)
        if want["spans"] or doc["spans"]:
            assert got[doc["doc_id"]] == want["spans"], doc["doc_id"]


def test_poison_row_does_not_kill_job(spark):
    """Malformed payloads become empty pages with an error marker in the
    metrics table; healthy rows are unaffected."""
    from pyspark.sql import functions as F

    from archive_pdf_tools_spark.operators.extract import (
        OUTPUT_SCHEMA_DDL, extract_spans, partition_metrics, reassemble)

    rows = [
        ("ok", [("text", '{"page": {"w": 800, "h": 1000, "dpi": 300, '
                 '"scan_res": null}, "paragraphs": []}', "", 0)]),
        ("poison", [("text", "{not json", "", 0),
                    ("text", None, "", 1)]),
    ]
    df = spark.createDataFrame(rows, schema=OUTPUT_SCHEMA_DDL)
    extracted = extract_spans(df, num_partitions=2).cache()
    out = {r["doc_id"]: r["spans"] for r in reassemble(extracted).collect()}
    assert set(out) == {"ok", "poison"}
    assert out["poison"] == []            # empty, not crashed
    warn_kinds = set()
    for r in partition_metrics(extracted).collect():
        warn_kinds.update(r["warning_kinds"])
    assert any(w.startswith("extract-error:") for w in warn_kinds)
    extracted.unpersist()


def test_arrow_batch_size_invariance(spark, input_df, golden):
    """The shape-grouped batched media path must produce identical output
    regardless of how Arrow slices the batches."""
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "3")
        out = reassemble(extract_spans(input_df, num_partitions=5))
        got = {r["doc_id"]: [s.asDict() for s in r["spans"]]
               for r in out.collect()}
        for doc_id in golden:
            assert got[doc_id] == golden[doc_id], doc_id
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
