"""Sharded snapshot checkpoint / resume.

The north rule requires resumability with per-partition lineage.  On a
real deployment the output table is Iceberg and each shard commit is an
atomic snapshot append; here the same protocol is implemented over a
parquet directory with an atomically-renamed JSON manifest (one entry per
committed shard) — the mechanism (commit manifest + anti-join restart) is
identical, only the catalog differs.  The reference analogue is its
``report_every`` chunking + temp-file staging (``recode.py:494-525,
633-635``).

Protocol:

* input docs are split into ``shards`` by ``pmod(xxhash64(doc_id), shards)``
  — deterministic, independent of partitioning;
* each shard runs the extraction DAG and writes
  ``out_dir/spans/shard=K/`` and ``out_dir/metrics/shard=K/``;
* the manifest is rewritten via temp-file + ``os.replace`` (atomic on
  POSIX) after each shard — a crash mid-shard leaves at most one
  uncommitted shard directory, which is overwritten on resume;
* ``resume_filter`` additionally supports doc-level anti-join against
  whatever output already exists (belt-and-braces restart).
"""

from __future__ import annotations

import json
import os
import tempfile

from .extract import extract_spans, partition_metrics, reassemble

__all__ = ["run_sharded", "run_with_checkpoint", "read_manifest",
           "resume_filter"]


def _manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest.json")


def read_manifest(out_dir: str) -> dict:
    path = _manifest_path(out_dir)
    if not os.path.exists(path):
        return {"committed_shards": [], "shards": None}
    with open(path) as fh:
        return json.load(fh)


def _write_manifest(out_dir: str, manifest: dict) -> None:
    os.makedirs(out_dir, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=out_dir, prefix="_manifest", suffix=".tmp")
    with os.fdopen(fd, "w") as fh:
        json.dump(manifest, fh)
    os.replace(tmp, _manifest_path(out_dir))


def run_spans_checkpoint(df, out_dir: str, shards: int, to_spans,
                         stop_after_shards: int | None = None) -> dict:
    """Shard-commit protocol for front doors whose shard output IS a
    spans table: ``to_spans(shard_df) -> (doc_id, spans)`` DataFrame,
    written to ``<out>/spans/shard=k`` plus a small metrics row —
    shared by the PDF and imagestack front doors so the
    crash-safety-critical layout lives in one place."""
    import os

    from pyspark.sql import functions as F

    def write_shard(shard_df, k: int):
        out = to_spans(shard_df).persist()
        try:
            out.write.mode("overwrite").parquet(
                os.path.join(out_dir, "spans", f"shard={k}"))
            (out.select(F.count("*").alias("doc_count"),
                        F.sum(F.size("spans")).alias("span_count"))
             .withColumn("shard", F.lit(k))
             .write.mode("overwrite").parquet(
                 os.path.join(out_dir, "metrics", f"shard={k}")))
        finally:
            out.unpersist()

    return run_sharded(df, out_dir, shards, write_shard,
                       stop_after_shards=stop_after_shards)


def run_sharded(documents_df, out_dir: str, shards: int,
                write_shard, stop_after_shards: int | None = None) -> dict:
    """The shared shard-commit protocol: deterministic doc->shard
    assignment (``pmod(xxhash64(doc_id), shards)``), one ``write_shard``
    callback per uncommitted shard, atomic manifest rewrite after each —
    a crash mid-shard leaves at most one uncommitted directory, which is
    overwritten on resume.  ``write_shard(shard_df, k)`` owns what a
    shard means (extraction, PDF recode, ...); the crash-safety-critical
    commit bookkeeping lives in exactly one place.

    ``stop_after_shards``: stop after committing that many shards THIS
    run (a deterministic stand-in for a mid-job kill, used by the
    resume fixtures)."""
    from pyspark.sql import functions as F

    manifest = read_manifest(out_dir)
    if manifest["shards"] not in (None, shards):
        raise ValueError(
            f"existing checkpoint used shards={manifest['shards']}, "
            f"requested {shards}")
    manifest["shards"] = shards
    committed = set(manifest["committed_shards"])

    shard_col = F.pmod(F.xxhash64("doc_id"), F.lit(shards))
    done_this_run = 0
    for k in range(shards):
        if k in committed:
            continue
        if stop_after_shards is not None and done_this_run >= stop_after_shards:
            break
        write_shard(documents_df.where(shard_col == k), k)
        committed.add(k)
        manifest["committed_shards"] = sorted(committed)
        _write_manifest(out_dir, manifest)
        done_this_run += 1
    return manifest


def run_with_checkpoint(spark, documents_df, out_dir: str, shards: int = 16,
                        num_partitions: int | None = None,
                        stop_after_shards: int | None = None) -> dict:
    """Run extraction shard-by-shard with snapshot commits; returns the
    manifest.  Safe to call again after a crash — committed shards are
    skipped."""
    from pyspark.sql import functions as F

    def write_shard(shard_df, k: int):
        extracted = extract_spans(shard_df, num_partitions=num_partitions)
        extracted.persist()
        try:
            reassemble(extracted).write.mode("overwrite").parquet(
                os.path.join(out_dir, "spans", f"shard={k}"))
            partition_metrics(extracted).withColumn(
                "shard", F.lit(k)).write.mode("overwrite").parquet(
                os.path.join(out_dir, "metrics", f"shard={k}"))
        finally:
            extracted.unpersist()

    return run_sharded(documents_df, out_dir, shards, write_shard,
                       stop_after_shards=stop_after_shards)


def resume_filter(documents_df, output_spans_df):
    """Doc-level anti-join restart: documents not yet present in the
    committed output (SURVEY.md §4 checkpoint/resume)."""
    return documents_df.join(output_spans_df.select("doc_id"),
                             on="doc_id", how="left_anti")
