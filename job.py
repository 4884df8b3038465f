#!/usr/bin/env python
"""Cluster job entry point.

Deployment shape required by the north rule::

    zip -r engine.zip archive_pdf_tools_spark
    spark-submit --py-files engine.zip job.py \
        --input  <documents table path (parquet dir / Iceberg table)> \
        --output <output dir> [--shards 64] [--resume] [--synthetic N]

Runs the extraction pipeline with sharded snapshot checkpointing
(``operators/checkpoint.py``); re-running after a failure resumes from
the last committed shard (plus a doc-level anti-join when ``--resume``).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="documents table path (parquet)")
    ap.add_argument("--input-format", choices=("spans", "hocr", "html",
                                               "pdf", "imagestack"),
                    default="spans",
                    help="'spans' = interleaved (doc_id, spans) table; "
                         "'hocr' = (doc_id, hocr markup [, dpi]) table, "
                         "parsed executor-side via sources/hocr.py; "
                         "'html' = (doc_id, html) table, main content "
                         "extracted via sources/htmlmain.py; "
                         "'pdf' = (doc_id, pdf binary [, hocr]) table, "
                         "recoded to spans via operators/pdfcomp.py "
                         "(the bin/pdfcomp entry point as a cluster job); "
                         "'imagestack' = (doc_id, page_idx, image "
                         "binary [, hocr]) table of TIFF/JP2/JPEG/PNG/"
                         "PNM page files (page_idx = -1: the whole "
                         "*_tif.zip item or a multi-page TIFF), the "
                         "reference's primary input shape "
                         "(operators/imagestack.py)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--shards", type=int, default=64)
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument("--synthetic", type=int, default=None,
                    help="generate N synthetic docs instead of --input")
    ap.add_argument("--pdf-password", default="",
                    help="user or owner password for encrypted PDF "
                         "inputs (--input-format pdf); one corpus-wide "
                         "password, per-doc failures degrade to "
                         "pdf_error spans")
    ap.add_argument("--output-format", default="spans",
                    choices=("spans", "pdf"),
                    help="'spans' = the interleaved spans table; "
                         "'pdf' = one finished MRC PDF per document, "
                         "committed via the same sharded checkpoint: "
                         "with --input-format imagestack a NEW PDF is "
                         "assembled (operators/recode.py -> "
                         "kernels/pdfsink.py: JP2 bg + JP2 fg through "
                         "a JBIG2 /SMask + invisible text layer); "
                         "with --input-format pdf the EXISTING PDFs "
                         "are recompressed in place (kernels/"
                         "pdfrewrite.py: image XObjects swapped for "
                         "MRC bg/fg/mask, text layer preserved — the "
                         "bin/compress-pdf-images entry point)")
    ap.add_argument("--native-codecs", action="store_true",
                    help="swap contract-verified native image decoders "
                         "(Pillow etc., kernels/registry.py) in on "
                         "every executor; absent libraries or a "
                         "failed oracle suite leave the built-ins")
    args = ap.parse_args(argv)
    if args.output_format == "pdf":
        if args.input_format not in ("imagestack", "pdf"):
            ap.error("--output-format pdf requires --input-format "
                     "imagestack (recode) or pdf (recompress)")
        if args.synthetic or not args.input:
            ap.error("--output-format pdf needs a real --input table "
                     "(--synthetic generates interleaved span docs, "
                     "not page images)")

    import os as _os

    from pyspark.sql import SparkSession

    builder = (SparkSession.builder
               .appName("archive-pdf-tools-spark-extract")
               .config("spark.sql.adaptive.enabled", "true")
               .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                       "64"))
    if args.native_codecs:
        # registry.py honors this at import in every python worker
        _os.environ["SPARK_GRAFT_NATIVE_CODECS"] = "1"
        builder = builder.config(
            "spark.executorEnv.SPARK_GRAFT_NATIVE_CODECS", "1")
    spark = builder.getOrCreate()
    if args.native_codecs:
        # the env hook already ran the (contract-verifying) swap at
        # registry import — report its record, don't verify twice
        from archive_pdf_tools_spark.kernels import registry
        print(json.dumps({"native_codecs_swapped":
                          registry.ENV_SWAPPED}))

    from archive_pdf_tools_spark.operators.checkpoint import run_with_checkpoint
    from archive_pdf_tools_spark.sources import synthetic_documents

    if args.synthetic:
        docs = synthetic_documents(spark, n_docs=args.synthetic,
                                   num_partitions=args.partitions)
    elif args.input:
        docs = spark.read.parquet(args.input)
        if args.input_format == "imagestack":
            if args.output_format == "pdf":
                from archive_pdf_tools_spark.operators.recode import (
                    run_recode_checkpoint)
                manifest = run_recode_checkpoint(spark, docs,
                                                 args.output,
                                                 shards=args.shards)
            else:
                from archive_pdf_tools_spark.operators.imagestack import (
                    run_imagestack_checkpoint)
                manifest = run_imagestack_checkpoint(spark, docs,
                                                     args.output,
                                                     shards=args.shards)
            print(json.dumps(manifest))
            spark.stop()
            return
        if args.input_format == "pdf":
            if args.output_format == "pdf":
                # Recompress: the MRC-recoded PDF itself is the
                # product (bin/compress-pdf-images as a cluster job).
                from archive_pdf_tools_spark.operators.pdfcomp import (
                    run_recompress_checkpoint)
                manifest = run_recompress_checkpoint(
                    spark, docs, args.output, shards=args.shards,
                    password=args.pdf_password)
                print(json.dumps(manifest))
                spark.stop()
                return
            # The conversion IS the extraction for PDFs (content-stream
            # text + MRC-recoded images): shard-committed directly.
            from archive_pdf_tools_spark.operators.pdfcomp import (
                run_pdf_checkpoint)
            manifest = run_pdf_checkpoint(
                spark, docs, args.output, shards=args.shards,
                password=args.pdf_password)
            print(json.dumps(manifest))
            spark.stop()
            return
        if args.input_format == "hocr":
            from archive_pdf_tools_spark.sources.hocr import hocr_documents
            docs = hocr_documents(
                docs, dpi_col="dpi" if "dpi" in docs.columns else None)
        elif args.input_format == "html":
            from archive_pdf_tools_spark.sources.htmlmain import (
                html_documents)
            docs = html_documents(docs, payloads=True)
    else:
        ap.error("one of --input / --synthetic is required")

    manifest = run_with_checkpoint(spark, docs, args.output,
                                   shards=args.shards,
                                   num_partitions=args.partitions)
    print(json.dumps(manifest))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
