"""Skew handling: one 1500-page document among one-page documents must
spread across partitions (page-level salting), and the result must equal
the local runner's output regardless."""

import json

import pytest
from pyspark.sql import functions as F

from archive_pdf_tools_spark.operators.extract import OUTPUT_SCHEMA_DDL


def _payload():
    return json.dumps({
        "page": {"w": 1000, "h": 1400, "dpi": 300, "scan_res": None},
        "paragraphs": [{"lines": [{
            "bbox": [10, 10, 400, 40], "baseline": [0.0, 0.0],
            "words": [{"text": "w", "bbox": [10, 10, 40, 40],
                       "confidence": 90.0, "fontsize": 10.0,
                       "writing_direction": 0}]}]}]})


@pytest.fixture(scope="module")
def skewed_df(spark):
    big = ("doc_big", [("text", _payload(), "", i) for i in range(1500)])
    smalls = [(f"doc_s{i:03d}", [("text", _payload(), "", 0)])
              for i in range(50)]
    return spark.createDataFrame([big] + smalls, schema=OUTPUT_SCHEMA_DDL)


def test_salting_spreads_heavy_doc(spark, skewed_df):
    P = 16
    exploded = skewed_df.select("doc_id", F.inline("spans"))
    # Mirrors operators/extract.py: raw 64-bit hash, not hash % P (a
    # P-valued salt would leave ~1/e of the partitions empty).
    salted = exploded.repartition(P, F.xxhash64("doc_id", "offset"))
    sizes = (salted.groupBy(F.spark_partition_id().alias("pid"))
             .count().collect())
    counts = [r["count"] for r in sizes]
    assert len(counts) == P                      # heavy doc hits all parts
    mean = sum(counts) / len(counts)
    assert max(counts) < 2 * mean, counts        # no partition hot spot


def test_skewed_output_correct(spark, skewed_df):
    from archive_pdf_tools_spark.plans import run_extraction
    out, _ = run_extraction(skewed_df, num_partitions=16,
                            with_metrics=False)
    rows = {r["doc_id"]: r["spans"] for r in out.collect()}
    assert len(rows["doc_big"]) == 1500
    offsets = [s["offset"] for s in rows["doc_big"]]
    assert offsets == list(range(1500))          # order survived the spread
    assert all(len(rows[f"doc_s{i:03d}"]) == 1 for i in range(50))
