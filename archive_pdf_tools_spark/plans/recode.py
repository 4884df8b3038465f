"""The flagship dataflow: the reference's ``recode()`` two-pass pipeline
(``recode.py:562-796``) as one declarative DAG.

The reference iterates hOCR twice (text pass + image pass) in one process;
here both passes are a single explode -> kernel -> regroup plan and the
engine parallelizes across pages.  See ``operators/extract.py`` for the
stage semantics and ``operators/checkpoint.py`` for the snapshot/resume
variant.
"""

from __future__ import annotations

from ..operators.extract import extract_spans, partition_metrics, reassemble

__all__ = ["run_extraction"]


def run_extraction(documents_df, num_partitions: int | None = None,
                   with_metrics: bool = True, skip_offsets=None,
                   stop_after: int | None = None):
    """documents (doc_id, spans) -> (output_df, metrics_df | None).

    ``skip_offsets``/``stop_after`` mirror the reference's scandata page
    skipping and --stop-after (``recode.py:114-121``)."""
    extracted = extract_spans(documents_df, num_partitions=num_partitions,
                              skip_offsets=skip_offsets,
                              stop_after=stop_after)
    out = reassemble(extracted)
    metrics = partition_metrics(extracted) if with_metrics else None
    return out, metrics
